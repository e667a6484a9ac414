"""NER mention detection: gazetteer matching over extracted article text.

An actor-pool ``map_batches`` stage: the matcher is built ONCE per
actor in ``__init__`` from the broadcast :class:`KGResources`; each
``__call__`` scans a batch.

Two interchangeable matchers with BIT-IDENTICAL semantics (leftmost
match first; at a position the longest boundary-valid surface wins;
scanning resumes at match end; ``[A-Za-z0-9]`` hard boundaries;
case-insensitive):

* :func:`build_matcher` — one compiled regex alternation, longest
  surface first. Scan cost grows with the alternative count (sre has
  no automaton construction), so it degrades past ~10^4 surfaces.
* :class:`ACMatcher` — an Aho-Corasick automaton over the lowercased
  surfaces: goto/fail/output built once per actor (O(total surface
  chars)), scan O(text + matches) independent of gazetteer size — the
  web-scale path for 10^5+ surface gazetteers
  (BENCH/ner_stress_r4*.json). Requires an ASCII gazetteer and a
  length-preserving ``str.lower`` on the document (both checked; any
  violation falls back to the regex path per doc / per gazetteer), so
  the two paths cannot silently diverge on exotic Unicode case pairs.

``MentionDetector`` picks the automaton automatically when the
gazetteer is ASCII (tests/test_kg.py crossover asserts bit-identity on
the sf0.01 corpus); ``matcher_impl='regex'|'ac'`` forces a path.

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


_ALNUM = frozenset(
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789"
)


class ACMatcher:
    """Aho-Corasick automaton with the regex path's exact semantics.

    Build: trie over lowercased surfaces (`goto` as one dict per state,
    keyed by char), BFS failure links, output lists merged through the
    failure chain at build time (each state stores the LENGTHS of every
    surface ending there, longest first). Scan: one transition per
    character; every boundary-valid occurrence is collected, then the
    leftmost-longest non-overlapping subset is selected — precisely
    what ``finditer`` over a longest-first alternation yields (at equal
    start, more characters always wins; scanning resumes at match end).

    Memory is O(total trie nodes) — ~1 dict per distinct prefix char.
    In production a compiled automaton (e.g. pyahocorasick, absent in
    this container) drops both constant factors; the stage shape
    (broadcast gazetteer, per-actor build) is unchanged.
    """

    def __init__(self, surfaces):
        surfaces = [s for s in surfaces if s]
        if not all(s.isascii() for s in surfaces):
            raise ValueError("ACMatcher requires an ASCII gazetteer — "
                             "use the regex path for non-ASCII surfaces")
        trans: list[dict] = [{}]
        lengths: list[list[int]] = [[]]
        for s in surfaces:
            st = 0
            for ch in s.lower():
                nxt = trans[st].get(ch)
                if nxt is None:
                    trans.append({})
                    lengths.append([])
                    nxt = len(trans) - 1
                    trans[st][ch] = nxt
                st = nxt
            if len(s) not in lengths[st]:
                lengths[st].append(len(s))
        # BFS failure links; merge output lengths through the chain
        from collections import deque

        fail = [0] * len(trans)
        q = deque(trans[0].values())
        while q:
            st = q.popleft()
            for ch, nxt in trans[st].items():
                q.append(nxt)
                f = fail[st]
                while f and ch not in trans[f]:
                    f = fail[f]
                fail[nxt] = trans[f].get(ch, 0) if trans[f].get(ch, 0) != nxt else 0
            if lengths[fail[st]]:
                lengths[st] = sorted(set(lengths[st]) | set(lengths[fail[st]]),
                                     reverse=True)
            else:
                lengths[st].sort(reverse=True)
        self._trans, self._fail, self._lengths = trans, fail, lengths

    def finditer(self, text: str):
        """Yield (start, end) in ``finditer`` order, or None when this
        text needs the regex fallback (non-length-preserving lower)."""
        low = text.lower()
        if len(low) != len(text):
            return None
        trans, fail, lengths = self._trans, self._fail, self._lengths
        n = len(low)
        found: list[tuple[int, int]] = []  # (start, -len) sortable
        st = 0
        for j in range(n):
            ch = low[j]
            nxt = trans[st].get(ch)
            while nxt is None and st:
                st = fail[st]
                nxt = trans[st].get(ch)
            st = nxt if nxt is not None else 0
            lens = lengths[st]
            if lens:
                for L in lens:
                    start = j + 1 - L
                    if start > 0 and text[start - 1] in _ALNUM:
                        continue
                    if j + 1 < n and text[j + 1] in _ALNUM:
                        continue
                    found.append((start, -L))
        found.sort()
        out = []
        pos = 0
        for start, neg in found:
            if start >= pos:
                out.append((start, start - neg))
                pos = start - neg
        return out


class MentionDetector:
    def __init__(self, resources, matcher_impl: str = "auto"):
        res: KGResources = resolve(resources)
        self.alias = res.alias
        self.etype = res.etype
        use_ac = matcher_impl == "ac" or (
            matcher_impl == "auto"
            and all(s.isascii() for s in res.alias.keys())
        )
        self.ac = ACMatcher(res.alias.keys()) if use_ac else None
        # the regex path stays as the per-doc fallback for texts whose
        # lowercase is not length-preserving (exotic Unicode case pairs)
        self.matcher = None if use_ac else build_matcher(res.alias.keys())

    def _spans(self, text: str):
        if self.ac is not None:
            spans = self.ac.finditer(text)
            if spans is not None:
                return spans
            if self.matcher is None:
                self.matcher = build_matcher(self.alias.keys())
        return [m.span() for m in self.matcher.finditer(text)]

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls_out, surfaces, norms, begins, etypes = [], [], [], [], []
        urls = batch["url"].to_pylist()
        texts = batch["text"].to_pylist()
        for url, text in zip(urls, texts):
            if not text:
                continue
            for s, e in self._spans(text):
                surface = text[s:e]
                norm = surface.lower()
                candidates = self.alias.get(norm)
                if not candidates:
                    continue
                types = {self.etype[c] for c in candidates}
                urls_out.append(url)
                surfaces.append(surface)
                norms.append(norm)
                begins.append(s)
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
