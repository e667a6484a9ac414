"""Data profiling: per-column (n_rows, n_null, n_distinct) over any
table in one read — the schema-drift / data-quality audit an ingestion
pipeline runs before trusting a new corpus drop.

Scale shape:

* counts — each block emits ONE (col, n_rows, n_null) partial row per
  column (constant size); a native groupby-sum folds them.
* exact distinct — each block emits its per-column DISTINCT values as
  (col, vh) hash rows (``pc.unique`` per column, md5-8-byte hash of the
  string form; the block combiner caps rows at block-distinct, so
  low-cardinality columns ship almost nothing); one native
  (col, vh)-keyed distinct + a (col)-keyed count gives exact
  ``COUNT(DISTINCT col)``. High-cardinality columns ship one narrow
  16-byte row per distinct value per block — the exact-answer floor;
  use ``approx_distinct`` (ops/stats.py) when an estimate suffices.

Values never leave the block in raw form (a text column ships hashes,
not text). Nulls are excluded from distinct, SQL-style. Output:
(column, n_rows, n_null, n_distinct) — one row per profiled column,
bit-identical across layouts.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _value_hashes(arr: pa.Array) -> np.ndarray:
    """Distinct non-null values of ``arr`` → int64 hashes (md5-8 of the
    Arrow string form; injective per distinct value within a column)."""
    u = pc.unique(arr.combine_chunks() if isinstance(arr, pa.ChunkedArray)
                  else arr)
    u = u.drop_null()
    if len(u) == 0:
        return np.empty(0, dtype=np.int64)
    s = pc.cast(u, pa.string())
    return np.fromiter(
        (int.from_bytes(hashlib.md5(v.encode("utf-8")).digest()[:8],
                        "little") & 0x7FFFFFFFFFFFFFFF
         for v in s.to_pylist()),
        dtype=np.int64, count=len(s))


def profile_table(ds, *, columns: list[str] | None = None):
    """Profile ``columns`` (default: all) of ``ds``; returns a Dataset
    (column, n_rows, n_null, n_distinct), one row per column."""
    cols = columns or list(ds.schema().names)

    def count_partial(batch: pa.Table) -> pa.Table:
        names, rows, nulls = [], [], []
        for c in cols:
            names.append(c)
            rows.append(batch.num_rows)
            nulls.append(batch[c].null_count)
        return pa.table({
            "column": pa.array(names, pa.string()),
            "n_rows": pa.array(rows, pa.int64()),
            "n_null": pa.array(nulls, pa.int64()),
        })

    counts = (ds.map_batches(count_partial, batch_format="pyarrow",
                             zero_copy_batch=True)
              .groupby("column").sum(["n_rows", "n_null"])
              .map_batches(lambda b: b.rename_columns(
                  ["column", "n_rows", "n_null"]), batch_format="pyarrow"))

    def distinct_partial(batch: pa.Table) -> pa.Table:
        names, hs = [], []
        for c in cols:
            vh = _value_hashes(batch[c])
            names.extend([c] * len(vh))
            hs.append(vh)
        return pa.table({
            "column": pa.array(names, pa.string()),
            "vh": pa.array(np.concatenate(hs) if hs else
                           np.empty(0, np.int64)),
        })

    distinct = (ds.map_batches(distinct_partial, batch_format="pyarrow",
                               zero_copy_batch=True)
                .groupby(["column", "vh"]).count()
                .map_batches(lambda b: (
                    b.rename_columns(["column", "vh", "c"])
                    .select(["column"])), batch_format="pyarrow")
                .groupby("column").count()
                .map_batches(lambda b: b.rename_columns(
                    ["column", "n_distinct"]), batch_format="pyarrow"))

    from .cogroup import bucket_join

    out = bucket_join(
        counts, distinct, key="column", join_type="left outer",
        n_buckets=8,
        left_schema=pa.schema([("column", pa.string()),
                               ("n_rows", pa.int64()),
                               ("n_null", pa.int64())]),
        right_schema=pa.schema([("column", pa.string()),
                                ("n_distinct", pa.int64())]),
    )
    return out.map_batches(
        lambda b: pa.table({
            "column": b["column"],
            "n_rows": b["n_rows"],
            "n_null": b["n_null"],
            "n_distinct": b["n_distinct"].combine_chunks().fill_null(0),
        }), batch_format="pyarrow")
