"""Sequence packing: assign documents to token-budgeted training shards.

Training-data writers want shards of ~equal token counts in a stable
document order. ``shard_id = exclusive_prefix_tokens // budget`` over
doc_id order — a distributed prefix sum, done scale-style:

1. coarse ranges: ``range_id = doc_id // range_size`` (no data
   dependence, any worker computes it);
2. one small ``groupby(range).sum`` produces per-range token totals —
   the ONLY driver-collected state, bounded at corpus_size/range_size
   rows (10^12 docs at range_size 2^20 → ~10^6 rows ≈ 16 MB), from
   which the driver computes exclusive per-range offsets and
   broadcasts them;
3. one ``groupby(range).map_groups`` sorts each range by doc_id and
   emits ``(offset[range] + local exclusive cumsum) // budget``.

Two narrow shuffles of (id, n_tokens); document text never moves.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def pack_by_token_budget(tokens_ds, *, budget: int = 1 << 14,
                         range_size: int = 1 << 20,
                         id_col: str = "doc_id", tokens_col: str = "n_tokens"):
    """(doc_id, n_tokens) → (doc_id, n_tokens, shard_id) where shard_id
    = (sum of n_tokens of all LOWER doc_ids) // budget. Deterministic,
    resumable, and equal to the SQL window
    ``(SUM(n) OVER (ORDER BY id) - n) // budget``."""
    import ray

    from ..kg.resources import broadcast, resolve

    def tag_range(batch: pa.Table) -> pa.Table:
        ids = pc.cast(batch[id_col], pa.int64())
        return pa.table({
            "range_id": pc.cast(pc.divide(ids, range_size), pa.int64()),
            id_col: ids,
            tokens_col: pc.cast(batch[tokens_col], pa.int64()),
        })

    # materialize: `ranged` feeds BOTH the per-range totals below and
    # the final groupby-assign — without it the whole upstream
    # (tokenization included) executes twice. Narrow (range_id, id,
    # n_tokens) rows, object-store resident / spillable.
    ranged = tokens_ds.map_batches(tag_range, batch_format="pyarrow",
                                   zero_copy_batch=True).materialize()

    # per-range totals → exclusive offsets (bounded driver aggregate)
    totals: dict[int, int] = {}
    for b in ranged.groupby("range_id").sum(tokens_col).iter_batches(
        batch_format="pyarrow"
    ):
        b = b.rename_columns(["range_id", "total"])
        totals.update(zip(b["range_id"].to_pylist(), b["total"].to_pylist()))
    offsets: dict[int, int] = {}
    acc = 0
    for r in sorted(totals):
        offsets[r] = acc
        acc += totals[r]
    try:
        offsets_ref = broadcast(offsets)
    except Exception:
        offsets_ref = offsets

    def assign(group: pa.Table) -> pa.Table:
        off = resolve(offsets_ref)
        order = pc.sort_indices(group, sort_keys=[(id_col, "ascending")])
        g = group.take(order)
        ntok = g[tokens_col].to_numpy(zero_copy_only=False)
        prior = off[g["range_id"][0].as_py()] + np.concatenate(
            ([0], np.cumsum(ntok)[:-1])
        )
        return pa.table({
            id_col: g[id_col],
            tokens_col: g[tokens_col],
            "shard_id": pa.array((prior // budget).astype(np.int64), pa.int64()),
        })

    return ranged.groupby("range_id").map_groups(assign, batch_format="pyarrow")
