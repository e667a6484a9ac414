"""NER mention detection: gazetteer matching over extracted article text.

An actor-pool ``map_batches`` stage: the matcher (one compiled
alternation over all alias surfaces, longest-first) is built ONCE per
actor in ``__init__`` from the broadcast :class:`KGResources`; each
``__call__`` scans a batch. At gazetteer sizes beyond ~10^5 surfaces the
alternation would be replaced by an Aho-Corasick automaton shipped the
same way — the stage shape (broadcast resource + actor pool) is the
scale-relevant part.

Output: ``mentions(url, surface, norm, begin, etype)``.
"""

from __future__ import annotations

import re

import pyarrow as pa

from .resources import KGResources, resolve

MENTIONS_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("surface", pa.string()),
        ("norm", pa.string()),
        ("begin", pa.int64()),
        ("etype", pa.string()),
    ]
)


def build_matcher(surfaces) -> re.Pattern:
    """One alternation, longest surface first so the longest match wins
    at each position; hard word boundaries on both sides."""
    alts = sorted(surfaces, key=len, reverse=True)
    pattern = "|".join(re.escape(s) for s in alts)
    return re.compile(f"(?<![A-Za-z0-9])(?:{pattern})(?![A-Za-z0-9])", re.IGNORECASE)


class MentionDetector:
    def __init__(self, resources):
        res: KGResources = resolve(resources)
        self.alias = res.alias
        self.etype = res.etype
        self.matcher = build_matcher(res.alias.keys())

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls_out, surfaces, norms, begins, etypes = [], [], [], [], []
        urls = batch["url"].to_pylist()
        texts = batch["text"].to_pylist()
        for url, text in zip(urls, texts):
            if not text:
                continue
            for m in self.matcher.finditer(text):
                surface = m.group(0)
                norm = surface.lower()
                candidates = self.alias.get(norm)
                if not candidates:
                    continue
                types = {self.etype[c] for c in candidates}
                urls_out.append(url)
                surfaces.append(surface)
                norms.append(norm)
                begins.append(m.start())
                etypes.append(types.pop() if len(types) == 1 else "mixed")
        return pa.table(
            {
                "url": pa.array(urls_out, pa.string()),
                "surface": pa.array(surfaces, pa.string()),
                "norm": pa.array(norms, pa.string()),
                "begin": pa.array(begins, pa.int64()),
                "etype": pa.array(etypes, pa.string()),
            }
        )


def detect_mentions(texts_ds, resources_ref, *, concurrency=(1, 8), batch_size: int = 128):
    """articles(url, text) → mentions. Actor pool: gazetteer loaded once
    per actor (SURVEY.md §7.2)."""
    return texts_ds.map_batches(
        MentionDetector,
        fn_constructor_kwargs={"resources": resources_ref},
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency,
    )
