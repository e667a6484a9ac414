"""Distributed semi-join and anti-join as first-class operators.

Ray Data's native ``join`` covers inner/outer equi-joins; existence
filtering (EXISTS / NOT EXISTS) is cheaper than a full join because the
probe side never ships payload — only the key — and the output carries
no right-side columns. Two execution strategies:

* **cogroup** (default, both sides large): tag each side, union, ONE
  hash shuffle on the key, and per-group emit the left rows iff a right
  row is (semi) / is not (anti) present. No driver state, no broadcast;
  scales to any key cardinality.
* **broadcast** (`broadcast_threshold`): when the right side's DISTINCT
  keys fit comfortably in the object store, collect them once
  (``ray.put``) and filter map-side with ``pc.is_in`` — zero shuffles.
  The caller opts in by passing a threshold because only the caller
  knows the key-domain bound; the operator probes the distinct count
  first and falls back to cogroup above it.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def _cogroup_exists(left_ds, right_ds, key: str, *, keep_if_exists: bool):
    """EXISTS/NOT-EXISTS via ONE bucketed cogroup shuffle: keys hash
    into ~256 buckets and a vectorized acero left-semi/left-anti join
    runs inside each bucket — group dispatch stays at n_buckets
    regardless of key cardinality (a per-key ``groupby(key).map_groups``
    would cost one Python call per distinct customer/url). The right
    side ships only per-batch-distinct keys (the semi-join combiner)."""
    from .cogroup import bucket_join

    return bucket_join(
        left_ds,
        right_ds.select_columns([key]),
        key=key,
        join_type="left semi" if keep_if_exists else "left anti",
        right_distinct=True,
    )


def _distinct_keys(right_ds, key: str):
    def pre(batch: pa.Table) -> pa.Table:
        return batch.select([key]).group_by([key]).aggregate([])

    return right_ds.map_batches(pre, batch_format="pyarrow").groupby(key).count()


def _broadcast_filter(left_ds, keys: pa.Array, *, key: str, keep_if_in: bool):
    import ray

    keys_ref = ray.put(keys)

    def filt(batch: pa.Table) -> pa.Table:
        mask = pc.is_in(batch[key], value_set=ray.get(keys_ref))
        if not keep_if_in:
            mask = pc.invert(mask)
        return batch.filter(mask)

    return left_ds.map_batches(filt, batch_format="pyarrow", zero_copy_batch=True)


def _try_broadcast_keys(left_ds, right_ds, key: str, threshold: int):
    """Distinct right keys as one Arrow array if ≤ threshold, else None.
    The collection is bounded by the caller's threshold by construction."""
    if threshold <= 0:
        return None
    distinct = _distinct_keys(right_ds, key).materialize()
    if distinct.count() > threshold:
        return None
    key_type = left_ds.schema().types[left_ds.schema().names.index(key)]
    chunks = [b[key] for b in distinct.iter_batches(batch_format="pyarrow")]
    return pa.chunked_array(chunks or [pa.array([], key_type)]).combine_chunks()


def broadcast_lookup(left_ds, right_table: pa.Table, key: str, *,
                     right_key: str | None = None,
                     columns: list[str] | None = None):
    """Map-side dimension join: ``right_table`` (a SMALL driver-side
    Arrow table — nation/region/customer-name scale) is put in the
    object store ONCE and every batch attaches its columns via a
    vectorized Arrow hash join. Zero shuffles; the left side streams.
    Use Ray Data's native ``Dataset.join`` when the right side is big.
    """
    import ray

    rk = right_key or key
    cols = columns or [c for c in right_table.column_names if c != rk]
    small = right_table.select([rk, *cols])
    if rk != key:
        small = small.rename_columns([key, *cols])
    ref = ray.put(small)

    def attach(batch: pa.Table) -> pa.Table:
        dim = ray.get(ref)
        return batch.join(dim, keys=[key], join_type="left outer")

    return left_ds.map_batches(attach, batch_format="pyarrow", zero_copy_batch=True)


def semi_join(left_ds, right_ds, key: str, *, broadcast_threshold: int = 0):
    """left rows whose ``key`` EXISTS in right. ``broadcast_threshold``:
    if > 0 and right's distinct keys are at most that many, use the
    zero-shuffle broadcast path."""
    keys = _try_broadcast_keys(left_ds, right_ds, key, broadcast_threshold)
    if keys is not None:
        return _broadcast_filter(left_ds, keys, key=key, keep_if_in=True)
    return _cogroup_exists(left_ds, right_ds, key, keep_if_exists=True)


def anti_join(left_ds, right_ds, key: str, *, broadcast_threshold: int = 0):
    """left rows whose ``key`` does NOT EXIST in right (NOT EXISTS)."""
    keys = _try_broadcast_keys(left_ds, right_ds, key, broadcast_threshold)
    if keys is not None:
        return _broadcast_filter(left_ds, keys, key=key, keep_if_in=False)
    return _cogroup_exists(left_ds, right_ds, key, keep_if_exists=False)
