"""Generic bucket-cogroup join: the repo's standard answer to "join or
cogroup two Datasets on a key whose cardinality is corpus-order".

Ray Data's ``groupby(key).map_groups`` dispatches ONE Python call per
distinct key — pathological at 10^5+ keys (one interpreter round-trip
and one ``pa.table`` allocation per customer / url / content-hash).
This module instead tags both sides, unions them, groups by
``hash(key) % n_buckets`` (ONE shuffle, dispatch capped at n_buckets
regardless of key cardinality) and runs a vectorized Arrow acero join
inside each bucket. Same exchange volume as a hash join; no driver
state; holds at any key cardinality as long as one BUCKET's rows fit a
worker (size ``n_buckets`` to the cluster; salt hot keys upstream).

Used by: semi/anti joins (ops/joins.py), the crawl url-cogroups
(extract/crawl.py), exact-dedup label application and the minhash
candidate-signature attach (ops/dedup.py).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

N_BUCKETS = 256

_JOIN_TYPES = ("inner", "left outer", "full outer", "left semi", "left anti")


def _arrow_schema(ds_schema) -> pa.Schema:
    return pa.schema(list(zip(ds_schema.names, ds_schema.types)))


def bucket_join(
    left_ds,
    right_ds,
    *,
    key: str,
    join_type: str = "inner",
    n_buckets: int = N_BUCKETS,
    left_schema: pa.Schema | None = None,
    right_schema: pa.Schema | None = None,
    right_distinct: bool = False,
    left_agg_sum: list[str] | None = None,
):
    """Join two Datasets on ``key`` via ONE bucketed cogroup shuffle.

    ``join_type``: "inner" | "left outer" | "full outer" | "left semi"
    | "left anti" (acero semantics; semi/anti output only left columns,
    full outer coalesces the key). Non-key
    column names must be disjoint across the two sides. The right key
    is cast to the left key's Arrow type. ``right_distinct`` applies a
    per-batch distinct to the right side before the shuffle — the right
    combiner for semi/anti joins, where only key presence matters.

    Pass ``left_schema``/``right_schema`` when a side may arrive as
    empty schemaless blocks (Ray loses the schema of all-empty
    Datasets).

    ``left_agg_sum``: treat the left side as map-side PARTIALS — the
    named int columns are summed per key inside each bucket before the
    join (all partials of a key hash to the same bucket, so the global
    sum is exact). This fuses an aggregate-then-join (two all-to-all
    exchanges) into the join's single shuffle.
    """
    if join_type not in _JOIN_TYPES:
        raise ValueError(f"join_type must be one of {_JOIN_TYPES}")
    ls = left_schema or _arrow_schema(left_ds.schema())
    rs = right_schema or _arrow_schema(right_ds.schema())
    l_payload = [n for n in ls.names if n != key]
    r_payload = [n for n in rs.names if n != key]
    exists_only = join_type in ("left semi", "left anti")
    if exists_only:
        r_payload = []
    clash = set(l_payload) & set(r_payload)
    if clash:
        raise ValueError(f"column collision across join sides: {sorted(clash)}")
    if left_agg_sum and set(l_payload) != set(left_agg_sum):
        raise ValueError(
            "left_agg_sum must name every non-key left column; left has "
            f"{l_payload}, got {left_agg_sum}")
    key_type = ls.field(key).type

    out_fields = [(key, key_type)] + [(n, ls.field(n).type) for n in l_payload]
    if not exists_only:
        out_fields += [(n, rs.field(n).type) for n in r_payload]
    out_schema = pa.schema(out_fields)
    pref = [f"__r_{n}" for n in r_payload]

    from ..kg.unionfind import hash_bucket

    def tag_left(batch: pa.Table) -> pa.Table:
        k = batch[key].combine_chunks()
        cols = {
            "__bucket": hash_bucket(k, n_buckets),
            "__side": pa.nulls(batch.num_rows, pa.int8()).fill_null(0),
            key: k,
        }
        for n in l_payload:
            cols[n] = batch[n]
        for n, p in zip(r_payload, pref):
            cols[p] = pa.nulls(batch.num_rows, rs.field(n).type)
        return pa.table(cols)

    def tag_right(batch: pa.Table) -> pa.Table:
        t = batch
        if exists_only:
            t = t.select([key])
        if right_distinct:
            t = t.group_by(list(t.column_names)).aggregate([])
        k = pc.cast(t[key].combine_chunks(), key_type)
        cols = {
            "__bucket": hash_bucket(k, n_buckets),
            "__side": pa.nulls(t.num_rows, pa.int8()).fill_null(1),
            key: k,
        }
        for n in l_payload:
            cols[n] = pa.nulls(t.num_rows, ls.field(n).type)
        for n, p in zip(r_payload, pref):
            cols[p] = t[n]
        return pa.table(cols)

    def join_bucket(group: pa.Table) -> pa.Table:
        side = group["__side"]
        lt = group.filter(pc.equal(side, 0)).select([key, *l_payload])
        if left_agg_sum:
            lt = (lt.group_by(key)
                  .aggregate([(c, "sum") for c in left_agg_sum])
                  .rename_columns([key, *left_agg_sum]))
        rt = (
            group.filter(pc.equal(side, 1))
            .select([key, *pref])
            .rename_columns([key, *r_payload])
        )
        if right_distinct and rt.num_rows:
            # The pre-shuffle distinct is per-batch only; the same right
            # row can arrive from several blocks, and a left-outer join
            # would then multiply matching left rows. Finish the
            # distinct per bucket (all copies of a key land here).
            rt = rt.group_by(rt.column_names).aggregate([])
        if lt.num_rows == 0:
            if join_type == "full outer" and rt.num_rows:
                padded = rt
                for n in l_payload:
                    padded = padded.append_column(
                        n, pa.nulls(rt.num_rows, ls.field(n).type)
                    )
                return padded.select(out_schema.names).cast(out_schema)
            return out_schema.empty_table()
        if rt.num_rows == 0:
            if join_type == "left anti":
                return lt.cast(pa.schema(out_fields[: 1 + len(l_payload)]))
            if join_type in ("left outer", "full outer"):
                padded = lt
                for n in r_payload:
                    padded = padded.append_column(
                        n, pa.nulls(lt.num_rows, rs.field(n).type)
                    )
                return padded.cast(out_schema)
            return out_schema.empty_table()
        joined = lt.join(rt, keys=[key], join_type=join_type)
        return joined.select(out_schema.names).cast(out_schema)

    tagged = left_ds.map_batches(
        tag_left, batch_format="pyarrow", zero_copy_batch=True
    ).union(right_ds.map_batches(tag_right, batch_format="pyarrow"))
    return tagged.groupby("__bucket").map_groups(join_bucket, batch_format="pyarrow")
