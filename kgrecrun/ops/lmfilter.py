"""CCNet-style language-model quality filter, integer-exact.

The CCNet pipeline scores every document with an n-gram LM trained on a
reference corpus and drops the high-perplexity tail. This is that
operator with the repo's determinism contract applied: true perplexity
is ``exp(-mean ln P)`` — a transcendental whose last ulp differs across
libm builds (the BM25 lesson, ops/rank.py) — so the score keeps the LM
*shape* but replaces ``-ln P(w|prev)`` with the scaled-integer inverse
probability under add-one smoothing:

    c1(prev)          = Σ_w c2(prev, w)          [bigram-context count]
    surprise_fp(p, w) = (S·(c1(p)+V)) // (c2(p,w)+1)        [S = 10^6]
    score_fp(doc)     = (Σ_bigrams surprise_fp) // n_bigrams

Monotone per-token in ``-ln P`` (rare continuations score high, like
perplexity), floor-evaluated in int64, so the score is bit-equal
across engines and any reduce order. Docs with <2 tokens score 0 and
are kept (no evidence either way — never drop on no signal).

Two phases, both streaming:

1. **train**: map-side bigram/unigram Counter partials per block →
   one reduce → the model table. The model must fit a broadcast — the
   same bounded-small-side contract as the NER gazetteer and the
   decontamination benchmark; ``max_model_rows`` is a LOUD bound
   (raise, never silently truncate — a capped model would silently
   change every downstream score).
2. **score**: model dicts `ray.put` once; scoring is one stateless
   vectorized map over the corpus (docs never shuffle).

Tokenizer: ``ascii_words(lower(text))`` — shared verbatim with the SQL
oracle's ``regexp_split_to_array(trim(lower(text)), '\\s+')``.
"""

from __future__ import annotations

from collections import Counter

import pyarrow as pa

from ..textnorm import ascii_words

SCALE = 10**6


def _doc_bigrams(text: str | None):
    toks = ascii_words((text or "").lower())
    return list(zip(toks, toks[1:])), toks


def train_bigram_model(ds, *, text_col: str = "text",
                       max_model_rows: int = 2_000_000):
    """corpus → ({(prev, w): c2}, {prev: c1}, vocab_size). One pass of
    block partials + a single driver reduce; raises if the model would
    exceed ``max_model_rows`` distinct bigrams (broadcast bound)."""

    def partial(batch: pa.Table) -> pa.Table:
        c2: Counter = Counter()
        vocab: set[str] = set()
        for t in batch[text_col].to_pylist():
            bigrams, toks = _doc_bigrams(t)
            c2.update(bigrams)
            vocab.update(toks)
        # bigram rows (w non-null) + vocab rows (w null) in one table
        prevs = [p for p, _ in c2] + sorted(vocab)
        ws = [w for _, w in c2] + [None] * len(vocab)
        cs = [c2[k] for k in c2] + [0] * len(vocab)
        return pa.table({
            "prev": pa.array(prevs, pa.string()),
            "w": pa.array(ws, pa.string()),
            "c": pa.array(cs, pa.int64()),
        })

    # Combiner partials per block, a SECOND distributed combine level
    # (16-way repartition of the model-bounded partial rows, group_by
    # within each), then a vectorized pyarrow group_by on the driver.
    # Measured lessons baked in: a Python dict reduce on the driver is
    # linear in blocks × model and got SLOWER at 32 cpus than 8; a full
    # Dataset groupby pays a sort exchange for a model-sized result and
    # lost to the driver reduce by 2×; without the second level the
    # driver pull itself (blocks × model rows) was the scaling ceiling.
    # Driver memory after the combine is 16 × model rows — the train
    # phase is CCNet's bounded offline step (score is the scale path);
    # for an unbounded corpus, train on a sample.
    import ray

    ncpu = max(1, int(ray.cluster_resources().get("CPU", 8)))
    parts = pa.concat_tables(list(
        ds.repartition(ncpu)  # split-based coalesce, no exchange:
        # one saturated partial per cpu instead of per input block, so
        # the driver pulls ncpu × model rows, not blocks × model
        .map_batches(partial, batch_format="pyarrow", batch_size=None)
        .iter_batches(batch_format="pyarrow")))
    agg = parts.group_by(["prev", "w"]).aggregate([("c", "sum")])
    if agg.num_rows > max_model_rows:
        raise ValueError(
            f"bigram model exceeds max_model_rows={max_model_rows} "
            "(a silently capped model would change every score); "
            "raise the bound or train on a sample")
    c2: dict = {}
    vocab: set[str] = set()
    for p, w, c in zip(agg["prev"].to_pylist(), agg["w"].to_pylist(),
                       agg["c_sum"].to_pylist()):
        if w is None:
            vocab.add(p)
        else:
            c2[(p, w)] = c
    c1: Counter = Counter()
    for (p, _w), c in c2.items():
        c1[p] += c
    return dict(c2), dict(c1), len(vocab)


def lm_quality_scores(ds, *, text_col: str = "text",
                      id_col: str = "doc_id",
                      threshold_fp: int | None = None,
                      max_model_rows: int = 2_000_000,
                      concurrency=(1, 32)):
    """Train on the corpus, then score it: → Dataset (doc_id,
    n_bigrams, score_fp[, keep]). ``keep`` (1/0, score ≤ threshold)
    appears when a threshold is given — the CCNet filter verdict."""
    import ray

    c2, c1, v = train_bigram_model(ds, text_col=text_col,
                                   max_model_rows=max_model_rows)
    model_ref = ray.put((c2, c1, v))

    class Score:
        """Vectorized scorer: tokens map to ids by one searchsorted
        over the model's token set (tokens outside it — including
        vocab-only tokens that never open a bigram — hit the sentinel
        id, whose c1 is 0: identical math to a dict miss); bigrams
        encode as prev_id·(n+1)+w_id and look up precomputed surprise
        values by a second searchsorted. All int64, so the scores are
        bit-equal to the scalar formula for any input."""

        def __init__(self):
            import numpy as np

            c2, c1, self.v = ray.get(model_ref)
            toks = sorted({p for p, _ in c2} | {w for _, w in c2})
            self.tok_arr = np.asarray(toks)
            self.n = len(toks)
            tid = {t: i for i, t in enumerate(toks)}
            self.c1_arr = np.zeros(self.n + 1, dtype=np.int64)
            for t, c in c1.items():
                self.c1_arr[tid[t]] = c
            enc = np.array(
                [tid[p] * (self.n + 1) + tid[w] for p, w in c2],
                dtype=np.int64)
            sur = np.array(
                [(SCALE * (c1[p] + self.v)) // (c + 1)
                 for (p, w), c in c2.items()], dtype=np.int64)
            order = np.argsort(enc)
            self.keys = enc[order]
            self.vals = sur[order]

        def __call__(self, batch: pa.Table) -> pa.Table:
            import numpy as np

            texts = batch[text_col].to_pylist()
            toks_per_doc = [ascii_words((t or "").lower()) for t in texts]
            cnts = np.array([len(tk) for tk in toks_per_doc],
                            dtype=np.int64)
            big_cnt = np.maximum(cnts - 1, 0)
            total_b = int(big_cnt.sum())
            if total_b == 0:
                sums = np.zeros(len(texts), dtype=np.int64)
            else:
                flat = np.asarray(
                    [w for tk in toks_per_doc for w in tk])
                if self.n:
                    idx = np.searchsorted(self.tok_arr, flat)
                    probe = np.minimum(idx, self.n - 1)
                    ids = np.where(self.tok_arr[probe] == flat,
                                   probe, self.n).astype(np.int64)
                else:
                    ids = np.full(flat.shape, 0, dtype=np.int64)
                starts = np.concatenate(
                    ([0], np.cumsum(cnts)[:-1]))
                boffs = np.concatenate(
                    ([0], np.cumsum(big_cnt)[:-1]))
                within = np.arange(total_b) - np.repeat(boffs, big_cnt)
                pi = np.repeat(starts, big_cnt) + within
                prev_ids = ids[pi]
                bkeys = prev_ids * (self.n + 1) + ids[pi + 1]
                if self.keys.size:
                    pos = np.searchsorted(self.keys, bkeys)
                    probe = np.minimum(pos, self.keys.size - 1)
                    known = self.keys[probe] == bkeys
                    sur = np.where(known, self.vals[probe],
                                   SCALE * (self.c1_arr[prev_ids]
                                            + self.v))
                else:
                    sur = SCALE * (self.c1_arr[prev_ids] + self.v)
                # reduceat only over docs WITH bigrams: an empty doc's
                # offset can equal total_b, and clipping it would split
                # the previous doc's segment (caught by the
                # hand-computed test)
                nz = big_cnt > 0
                part = np.add.reduceat(sur, boffs[nz])
                sums = np.zeros(len(cnts), dtype=np.int64)
                sums[nz] = part
            score = np.where(big_cnt > 0,
                             sums // np.maximum(big_cnt, 1), 0)
            cols = {
                id_col: batch[id_col],
                "n_bigrams": pa.array(big_cnt, type=pa.int64()),
                "score_fp": pa.array(score, type=pa.int64()),
            }
            if threshold_fp is not None:
                cols["keep"] = pa.array(
                    (score <= threshold_fp).astype(np.int64),
                    type=pa.int64())
            return pa.table(cols)

    return ds.map_batches(Score, batch_format="pyarrow",
                          concurrency=concurrency)
