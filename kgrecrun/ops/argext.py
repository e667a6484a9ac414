"""Per-group arg-extreme (SQL ``arg_max`` / ``arg_min`` / ``ROW_NUMBER()
= 1``): keep each key's single winning ROW under a lexicographic order,
deterministically.

Scale shape (the repo-standard two-stage reduce):

1. **Map-side combiner** — inside each input block, one vectorized
   lexsort + segment-boundary mask keeps exactly one candidate row per
   key per block, so the shuffle carries ≤ 1 row/key/block no matter
   how many rows a key has.
2. **One bucketed groupby** — candidates are grouped by
   ``hash(key) % n_buckets`` (dispatch capped at ``n_buckets``, never
   per key; per-key ``map_groups`` would be one Python call per user /
   part — pathological at 10^5+ keys) and the same sweep elects the
   global winner for every key in the bucket at once.

The winner is unique as long as ``order_cols`` ends in a tie-breaking
unique column (callers pass e.g. ``event_id`` / ``l_suppkey`` last), so
output is bit-identical across block layouts and parallelism levels.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

N_BUCKETS = 256


def _winners(t: pa.Table, key: str, sort_keys: list[tuple[str, str]]) -> pa.Table:
    """One row per distinct ``key``: the first row of each key segment
    after a (key, *order) lexsort — vectorized, no per-key dispatch."""
    if t.num_rows == 0:
        return t
    order = pc.sort_indices(t, sort_keys=[(key, "ascending"), *sort_keys])
    s = t.take(order)
    k = s[key].combine_chunks()
    import numpy as np

    kv = k.to_numpy(zero_copy_only=False)
    first = np.ones(len(kv), dtype=bool)
    first[1:] = kv[1:] != kv[:-1]
    return s.filter(pa.array(first))


def group_arg_extreme(ds, *, key: str, order_cols: list[tuple[str, str]],
                      n_buckets: int = N_BUCKETS):
    """Per-``key`` winning row under ``order_cols`` (list of
    ``(column, "ascending"|"descending")``, applied lexicographically —
    argmin via ascending, argmax via descending; append a unique column
    for a deterministic tie-break). All columns of ``ds`` ride along.
    """
    from ..kg.unionfind import hash_bucket

    def local(batch: pa.Table) -> pa.Table:
        w = _winners(batch, key, order_cols)
        return w.append_column(
            "__bucket", hash_bucket(w[key].combine_chunks(), n_buckets)
        )

    def global_(group: pa.Table) -> pa.Table:
        return _winners(group, key, order_cols).drop_columns(["__bucket"])

    return (
        ds.map_batches(local, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__bucket")
        .map_groups(global_, batch_format="pyarrow")
    )
