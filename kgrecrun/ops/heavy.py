"""Heavy hitters: terms with global frequency > n/k, found WITHOUT a
full-vocabulary shuffle.

The classic two-pass candidate/verify scheme (Misra–Gries-style space
bound with an exact output):

1. **Candidate scan** — each block emits the terms that are locally
   heavy (``local_cnt · k > block_tokens``) plus one sentinel row
   carrying the block's token total. Pigeonhole soundness: if a term's
   global count · k > n, then in at least one block its local count · k
   exceeds that block's token count (otherwise summing the per-block
   inequalities bounds the global count at n/k). So the candidate union
   is a superset of the true heavy hitters, at most k rows per block.
2. **Exact verify** — the candidate set (≤ k · num_blocks rows, tiny)
   is broadcast once via ``ray.put``; a second pass counts ONLY the
   candidates per block, a ``groupby(term).sum`` over ≤ |candidates|
   rows per block folds globally, and the exact ``cnt · k > n`` filter
   produces the final answer.

The full term→count shuffle that ``term_stats`` pays (vocabulary-order
rows) is replaced by two candidate-order exchanges — the right shape
when you want only the head of the distribution out of a 100-TB
corpus. Output is EXACT (the sketch only prunes), so the DuckDB
oracle is a plain GROUP BY / HAVING.

Tokenization routes through textnorm.ascii_words — identical to the
oracle's RE2 ``\\s+`` split (see textnorm module docstring).
"""

from __future__ import annotations

from collections import Counter

import pyarrow as pa

from ..textnorm import ascii_words

_SENTINEL = "\x00__block_total__"


def heavy_hitters(ds, *, text_col: str = "text", k: int = 100):
    """→ Dataset (term, cnt) for every term with cnt · k > total_tokens.

    ``k`` bounds both the output size (< k rows by definition) and the
    per-block candidate emission. Driver state: the candidate list
    (≤ k · num_blocks (term, cnt) rows) — NOT the vocabulary.
    """
    import ray

    def candidates(batch: pa.Table) -> pa.Table:
        cnt: Counter = Counter()
        for t in batch[text_col].to_pylist():
            cnt.update(ascii_words((t or "").lower()))
        n_block = sum(cnt.values())
        heavy = [w for w, c in cnt.items() if c * k > n_block]
        return pa.table({
            "term": pa.array(sorted(heavy) + [_SENTINEL], pa.string()),
            "n_block": pa.array([0] * len(heavy) + [n_block], pa.int64()),
        })

    cand = ds.map_batches(
        candidates, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()
    # candidate-order driver collection: ≤ k+1 rows per block
    cand_tbl = pa.concat_tables(
        list(cand.iter_batches(batch_format="pyarrow", batch_size=None))
        or [pa.table({"term": pa.array([], pa.string()),
                      "n_block": pa.array([], pa.int64())})]
    )
    terms = set(cand_tbl["term"].to_pylist()) - {_SENTINEL}
    n_total = sum(
        nb for t, nb in zip(cand_tbl["term"].to_pylist(),
                            cand_tbl["n_block"].to_pylist())
        if t == _SENTINEL
    )
    cand_ref = ray.put(terms)

    def exact_counts(batch: pa.Table) -> pa.Table:
        cset = ray.get(cand_ref)
        cnt: Counter = Counter()
        for t in batch[text_col].to_pylist():
            for w in ascii_words((t or "").lower()):
                if w in cset:
                    cnt[w] += 1
        ws = sorted(cnt)
        return pa.table({
            "term": pa.array(ws, pa.string()),
            "c": pa.array([cnt[w] for w in ws], pa.int64()),
        })

    agg = (
        ds.map_batches(exact_counts, batch_format="pyarrow",
                       zero_copy_batch=True)
        .groupby("term")
        .sum("c")
    )

    def finish(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        b = batch.rename_columns(["term", "cnt"])
        return b.filter(pc.greater(pc.multiply(b["cnt"], k), n_total))

    return agg.map_batches(finish, batch_format="pyarrow")
