"""Distinct set operations between two Datasets (SQL ``INTERSECT`` /
``EXCEPT``): which key tuples appear on both sides / only on the left.

Scale shape: each side applies a per-batch DISTINCT combiner before
anything moves (a key occurring 10^6 times in a block ships once), then
both sides union into ONE bucketed shuffle — ``hash(key) % n_buckets``
caps group dispatch at ``n_buckets`` for any key cardinality — and an
Arrow ``group_by(keys).aggregate(min/max(side))`` inside each bucket
decides membership vectorized:

* intersect → keys with ``min(side)=0 and max(side)=1``
* except    → keys with ``max(side)=0`` (left-only)

Exchange volume ≤ distinct-keys × blocks rows of key columns only; no
payload ships. Multi-column keys bucket on the XOR of the per-column
hash buckets so a skewed first column cannot collapse the bucketing.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

N_BUCKETS = 256


def _bucket_multi(t: pa.Table, keys: list[str], n_buckets: int) -> pa.Array:
    from ..kg.unionfind import hash_bucket

    acc = None
    for k in keys:
        b = hash_bucket(t[k].combine_chunks(), n_buckets)
        bv = b.to_numpy(zero_copy_only=False).astype(np.int64)
        # decorrelate columns so xor of equal buckets doesn't zero out
        acc = bv if acc is None else (acc * 31 + bv) % n_buckets
    return pa.array((acc % n_buckets).astype(np.int32), pa.int32())


def set_op(left_ds, right_ds, *, keys: list[str], op: str,
           n_buckets: int = N_BUCKETS):
    """``op``: "intersect" | "except" (both DISTINCT, SQL bag-free
    semantics). Output columns = ``keys``. Both sides must carry
    exactly the key columns (project upstream)."""
    if op not in ("intersect", "except"):
        raise ValueError("op must be 'intersect' or 'except'")

    def tag(side: int):
        def f(batch: pa.Table) -> pa.Table:
            d = batch.select(keys).group_by(keys).aggregate([])
            return d.append_column(
                "__side", pa.nulls(d.num_rows, pa.int8()).fill_null(side)
            ).append_column("__bucket", _bucket_multi(d, keys, n_buckets))

        return f

    def decide(group: pa.Table) -> pa.Table:
        agg = group.group_by(keys).aggregate(
            [("__side", "min"), ("__side", "max")]
        ).rename_columns([*keys, "mn", "mx"])
        if op == "intersect":
            keep = pc.and_(pc.equal(agg["mn"], 0), pc.equal(agg["mx"], 1))
        else:
            keep = pc.equal(agg["mx"], 0)
        return agg.filter(keep).select(keys)

    tagged = left_ds.map_batches(
        tag(0), batch_format="pyarrow", zero_copy_batch=True
    ).union(right_ds.map_batches(tag(1), batch_format="pyarrow"))
    return tagged.groupby("__bucket").map_groups(decide, batch_format="pyarrow")
