"""Skew-aware aggregation: two-phase salted groupby.

A straight ``groupby(key)`` sends every row of a hot key to one
reducer — at web scale a head entity ("United States") can be 10^6×
the median and that reducer becomes the job. The standard fix
(SURVEY.md §4.2): salt the key with a deterministic shard id, aggregate
``(key, salt)`` partials, then aggregate the ≤S partials per key.
Phase-1 reducers see at most ``1/S`` of a hot key; phase 2 touches only
``distinct_keys × S`` rows, independent of row skew.

Used for count/sum-style aggregates (decomposable); the same shape
salts LSH band keys in blocking (band, hash(id) % S).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def salted_count_sum(ds, key: str, *, sum_col: str | None = None, salts: int = 16,
                     count_name: str = "n", sum_name: str = "total",
                     partial_blocks: int | None = None):
    """→ Dataset(key, n[, total]): COUNT(*) (+ SUM(sum_col)) per key via
    a salted two-phase shuffle. Output equals an unsalted groupby —
    verified against a plain SQL GROUP BY oracle.

    ``partial_blocks``: coalesce the batch-local partials into this many
    blocks before the shuffles. Ray's sort-groupby cost scales with
    block COUNT, and after the local pre-agg each block holds at most
    keys×salts tiny rows — at moderate key cardinality, 64 near-empty
    blocks cost 2× more than 8 full ones (measured at sf0.1: 6.6 s →
    3.3 s). Leave ``None`` when distinct keys are huge enough that the
    partials themselves are big."""

    def phase1_local(batch: pa.Table) -> pa.Table:
        # deterministic salt from the row's key hash + row position so a
        # single-key batch still spreads over shards
        n = batch.num_rows
        salt = pc.cast(
            pc.bit_wise_and(
                pa.array(range(n), pa.int64()), pa.scalar(salts - 1, pa.int64())
            ),
            pa.int64(),
        )
        cols = {key: batch[key], "_salt": salt, "_one": pa.array([1] * n, pa.int64())}
        if sum_col is not None:
            cols["_val"] = pc.cast(batch[sum_col], pa.int64())
        t = pa.table(cols)
        aggs = [("_one", "sum")] + ([("_val", "sum")] if sum_col is not None else [])
        g = t.group_by([key, "_salt"]).aggregate(aggs)
        names = [key, "_salt", "_n"] + (["_v"] if sum_col is not None else [])
        return g.rename_columns(names)

    pre = ds.map_batches(phase1_local, batch_format="pyarrow", zero_copy_batch=True)
    if partial_blocks is not None:
        pre = pre.repartition(partial_blocks)

    # phase 1 shuffle: key × salt — a hot key spreads over `salts` groups
    p1 = pre.groupby([key, "_salt"]).sum(["_n"] + (["_v"] if sum_col is not None else []))

    def strip_salt(batch: pa.Table) -> pa.Table:
        names = [key, "_salt", "_n"] + (["_v"] if sum_col is not None else [])
        b = batch.rename_columns(names)
        return b.drop_columns(["_salt"])

    partials = p1.map_batches(strip_salt, batch_format="pyarrow")

    # phase 2: ≤ salts rows per key
    p2 = partials.groupby(key).sum(["_n"] + (["_v"] if sum_col is not None else []))

    def finish(batch: pa.Table) -> pa.Table:
        names = [key, count_name] + ([sum_name] if sum_col is not None else [])
        return batch.rename_columns(names)

    return p2.map_batches(finish, batch_format="pyarrow")


def skew_join(left_ds, right_ds, *, key: str, hot_mult: float = 8.0,
              hot_cap: int = 4096, n_buckets: int = 256,
              hot_keys: pa.Array | list | None = None,
              detect_rows: int | None = None,
              left_schema: pa.Schema | None = None,
              right_schema: pa.Schema | None = None):
    """Skew-resilient INNER equi-join — the hot-key hybrid: a straight
    hash join sends every row of a head key to ONE reducer, so a
    "United States"-scale entity serializes the whole exchange. This
    operator routes the head and the tail differently, with output
    identical to a plain join regardless of which keys land hot:

    1. Exact left key counts via a map-side combiner (the shuffle
       carries one (key, n) row per distinct-key-per-block, never data
       rows).
    2. HOT = keys with n ≥ hot_mult × mean(n), capped at the hot_cap
       largest (a Zipf head is tiny by definition; the cap bounds the
       driver state by construction — routing, never correctness,
       depends on the cut).
    3. Right rows for hot keys broadcast ONCE (``ray.put``) and join
       map-side inside each left batch — the hot key never shuffles.
       DIMENSION CONTRACT: right multiplicity per hot key must be
       broadcast-small (catalog/dimension shape); at 100 TB a hot key
       with a huge right side needs upstream salting instead.
    4. Cold rows take the ordinary bucketed cogroup join (ONE shuffle,
       dispatch capped at n_buckets).

    Detection cost controls (routing-only — a missed hot key simply
    routes cold, output unchanged): ``hot_keys`` skips detection
    entirely (the caller knows the head — a dictionary of hot
    entities, yesterday's detection output); ``detect_rows`` counts
    over only the first N left rows (a head key is visible in any
    sample by definition), bounding the detection scan to a constant
    instead of a full extra pass over the left side.
    """
    import ray

    from .cogroup import _arrow_schema, bucket_join

    ls = left_schema or _arrow_schema(left_ds.schema())
    rs = right_schema or _arrow_schema(right_ds.schema())
    out_cols = list(ls.names) + [n for n in rs.names if n != key]

    if hot_keys is None:
        def pre(b: pa.Table) -> pa.Table:
            t = b.select([key]).group_by(key).aggregate([([], "count_all")])
            return t.rename_columns([key, "n_local"])

        detect_src = (left_ds.limit(detect_rows) if detect_rows
                      else left_ds)
        # materialize: the counts table is NARROW (one row per distinct
        # left key, object-store-resident) and feeds BOTH the mean
        # computation and the hot filter below — without this the
        # detection scan would run twice.
        counts = (detect_src.map_batches(pre, batch_format="pyarrow",
                                         zero_copy_batch=True)
                  .groupby(key).sum("n_local")
                  .map_batches(lambda b: b.rename_columns([key, "n"]),
                               batch_format="pyarrow")
                  .materialize())
        stats = counts.aggregate(ray.data.aggregate.Sum("n"),
                                 ray.data.aggregate.Count())
        total = stats.get("sum(n)") or 0
        n_keys = stats.get("count()") or 0
        if not n_keys:
            return bucket_join(left_ds, right_ds, key=key, join_type="inner",
                               n_buckets=n_buckets, left_schema=ls,
                               right_schema=rs)
        thresh = hot_mult * (total / n_keys)
        hot_rows = (counts.filter(expr=f"n >= {thresh}")
                    .sort("n", descending=True).limit(hot_cap)
                    .take_all())
        hot_keys = [r[key] for r in hot_rows]
    hot_keys = pa.array(list(hot_keys), ls.field(key).type)

    if len(hot_keys) == 0:
        return bucket_join(left_ds, right_ds, key=key, join_type="inner",
                           n_buckets=n_buckets, left_schema=ls,
                           right_schema=rs)
    hot_ref = ray.put(hot_keys)

    def side(ds, keep_hot: bool):
        def filt(batch: pa.Table) -> pa.Table:
            if not batch.num_rows:
                return batch
            mask = pc.is_in(batch[key], value_set=ray.get(hot_ref))
            return batch.filter(mask if keep_hot else pc.invert(mask))

        return ds.map_batches(filt, batch_format="pyarrow",
                              zero_copy_batch=True)

    # hot dimension slice -> one driver-side Arrow table (contract above)
    hot_dim_batches = list(side(right_ds, True)
                           .iter_batches(batch_format="pyarrow"))
    hot_dim = (pa.concat_tables(hot_dim_batches) if hot_dim_batches
               else rs.empty_table())
    if hot_dim.num_rows:
        k_idx = hot_dim.column_names.index(key)
        hot_dim = hot_dim.set_column(
            k_idx, key, pc.cast(hot_dim[key], ls.field(key).type))
    dim_ref = ray.put(hot_dim)

    def hot_join(batch: pa.Table) -> pa.Table:
        if not batch.num_rows:
            return pa.table({c: [] for c in out_cols})
        out = batch.join(ray.get(dim_ref), keys=[key], join_type="inner")
        return out.select(out_cols)

    hot_out = side(left_ds, True).map_batches(
        hot_join, batch_format="pyarrow", zero_copy_batch=True)
    cold_out = bucket_join(side(left_ds, False), side(right_ds, False),
                           key=key, join_type="inner", n_buckets=n_buckets,
                           left_schema=ls, right_schema=rs)
    reorder = lambda b: b.select(out_cols)  # noqa: E731
    return hot_out.union(
        cold_out.map_batches(reorder, batch_format="pyarrow"))
