"""Keyed table diff — the data-regression / snapshot-comparison op a
pipeline CI runs between two versions of a table: which keys were
ADDED, REMOVED, or CHANGED (same key, different payload)? Unchanged
rows are dropped (they are the bulk; the diff is the small output).

Scale shape: each side reduces map-side to (key, row-signature md5-8)
— payloads never shuffle, wide rows cost 16 B on the wire; ONE
bucketed cogroup joins the two signature streams full-outer and a
vectorized compare classifies every key. Assumes ``key`` is unique per
side (snapshot semantics); duplicate keys raise loudly rather than
producing a quietly wrong diff.
"""

from __future__ import annotations

import hashlib

import pyarrow as pa
import pyarrow.compute as pc


def _signatures(batch: pa.Table, key: str, cols: list[str]) -> pa.Table:
    sig_src = [pc.cast(batch[c], pa.string()).combine_chunks()
               for c in cols]
    sigs = []
    for i in range(batch.num_rows):
        parts = "|".join(
            "" if s[i].as_py() is None else s[i].as_py() for s in sig_src)
        sigs.append(int.from_bytes(
            hashlib.md5(parts.encode("utf-8")).digest()[:8],
            "little") & 0x7FFFFFFFFFFFFFFF)
    return pa.table({
        key: batch[key],
        "sig": pa.array(sigs, pa.int64()),
    })


def table_diff(left_ds, right_ds, *, key: str, cols: list[str],
               n_buckets: int = 256):
    """Diff ``right_ds`` (new snapshot) against ``left_ds`` (old):
    → Dataset (key, status) with status ∈ {'added', 'removed',
    'changed'}; unchanged keys are omitted. ``cols`` are the payload
    columns compared (string-cast, null-safe)."""
    from ..kg.unionfind import hash_bucket

    def tag(side: int):
        def f(batch: pa.Table) -> pa.Table:
            t = _signatures(batch, key, cols)
            return pa.table({
                "__bucket": hash_bucket(t[key].combine_chunks(),
                                        n_buckets),
                key: t[key],
                "sig": t["sig"],
                "__side": pa.nulls(t.num_rows, pa.int8()).fill_null(side),
            })
        return f

    tagged = left_ds.map_batches(tag(0), batch_format="pyarrow",
                                 zero_copy_batch=True).union(
        right_ds.map_batches(tag(1), batch_format="pyarrow",
                             zero_copy_batch=True))

    out_schema = pa.schema([(key, pa.int64()), ("status", pa.string())])

    def classify(group: pa.Table) -> pa.Table:
        side = group["__side"]
        lt = group.filter(pc.equal(side, 0)).select([key, "sig"])
        rt = (group.filter(pc.equal(side, 1)).select([key, "sig"])
              .rename_columns([key, "sig_r"]))
        for side_t, name in ((lt, "left"), (rt, "right")):
            keys_col = side_t[key]
            if len(keys_col) != len(pc.unique(keys_col.combine_chunks())):
                raise ValueError(
                    f"table_diff: duplicate {key} on the {name} side — "
                    f"snapshots must be key-unique")
        j = lt.join(rt, keys=[key], join_type="full outer")
        sig_l, sig_r = j["sig"], j["sig_r"]
        status = pc.if_else(
            pc.is_null(sig_l), pa.scalar("added"),
            pc.if_else(pc.is_null(sig_r), pa.scalar("removed"),
                       pc.if_else(pc.not_equal(sig_l, sig_r),
                                  pa.scalar("changed"),
                                  pa.scalar(""))))
        out = pa.table({key: j[key], "status": status})
        return out.filter(pc.not_equal(out["status"], "")).cast(out_schema)

    return tagged.groupby("__bucket").map_groups(
        classify, batch_format="pyarrow")
