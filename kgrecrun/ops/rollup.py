"""Multi-level (ROLLUP-style) aggregation: (k1, k2), (k1), and grand
total from ONE pass over the data.

The leaf level pays the only real shuffle (batch-local combiner first,
as everywhere); each coarser level re-aggregates the previous level's
already-tiny result, so rollup costs the same as the finest groupby
plus epsilon. Rolled-up key columns are emitted as NULL, matching SQL
``GROUP BY ROLLUP(k1, k2)`` row-for-row.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


# below this many leaf rows the coarser grouping sets are computed
# driver-side from the (already materialized, bounded) leaf table —
# each Ray groupby costs ~1-3 s of fixed sort overhead, pure waste on a
# days x types result; above it the distributed re-aggregation runs
ROLLUP_DRIVER_THRESHOLD = 100_000


def rollup_count_sum(ds, k1: str, k2: str, *, value_col: str,
                     count_name: str = "n", sum_name: str = "total",
                     driver_threshold: int = ROLLUP_DRIVER_THRESHOLD,
                     _extra_sets: bool = False):
    """→ Dataset(k1, k2, count_name, sum_name) with the three ROLLUP
    levels: (k1,k2) leaves, (k1, NULL) subtotals, (NULL, NULL) grand
    total. ``value_col`` must already be an exact-summable int64."""
    schema = pa.schema(
        [
            (k1, pa.string()),
            (k2, pa.string()),
            (count_name, pa.int64()),
            (sum_name, pa.int64()),
        ]
    )

    def pre(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                k1: batch[k1],
                k2: batch[k2],
                "_v": pc.cast(batch[value_col], pa.int64()),
                "_one": pa.nulls(batch.num_rows, pa.int64()).fill_null(1),
            }
        )
        g = t.group_by([k1, k2]).aggregate([("_one", "sum"), ("_v", "sum")])
        return g.rename_columns([k1, k2, "_n", "_s"])

    leaf = (
        ds.map_batches(pre, batch_format="pyarrow")
        .groupby([k1, k2])
        .sum(["_n", "_s"])
        .map_batches(
            lambda b: b.rename_columns([k1, k2, count_name, sum_name]),
            batch_format="pyarrow",
        )
    )
    leaf = leaf.materialize()  # tiny (distinct key pairs); feeds 3 outputs

    if leaf.count() <= driver_threshold:
        return _coarse_levels_driver(
            leaf, k1, k2, count_name=count_name, sum_name=sum_name,
            schema=schema, extra_sets=_extra_sets,
        )

    def as_out(batch: pa.Table, *, null_k2: bool, null_k1: bool) -> pa.Table:
        n = batch.num_rows
        return pa.table(
            {
                k1: pa.nulls(n, pa.string()) if null_k1 else batch[k1],
                k2: pa.nulls(n, pa.string()) if null_k2 else batch[k2],
                count_name: batch[count_name],
                sum_name: batch[sum_name],
            },
            schema=schema,
        )

    sub = (
        leaf.groupby(k1)
        .sum([count_name, sum_name])
        .map_batches(
            lambda b: as_out(
                b.rename_columns([k1, count_name, sum_name]).append_column(
                    k2, pa.nulls(b.num_rows, pa.string())
                ),
                null_k2=True,
                null_k1=False,
            ),
            batch_format="pyarrow",
        )
    )

    def to_grand(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "_g": pa.nulls(batch.num_rows, pa.int8()).fill_null(0),
                count_name: batch[count_name],
                sum_name: batch[sum_name],
            }
        )

    grand = (
        leaf.map_batches(to_grand, batch_format="pyarrow")
        .groupby("_g")
        .sum([count_name, sum_name])
        .map_batches(
            lambda b: as_out(
                b.rename_columns(["_g", count_name, sum_name])
                .drop_columns(["_g"])
                .append_column(k1, pa.nulls(b.num_rows, pa.string()))
                .append_column(k2, pa.nulls(b.num_rows, pa.string())),
                null_k2=True,
                null_k1=True,
            ),
            batch_format="pyarrow",
        )
    )

    leaves = leaf.map_batches(
        lambda b: as_out(b, null_k2=False, null_k1=False), batch_format="pyarrow"
    )
    out = leaves.union(sub).union(grand)
    if _extra_sets:
        # CUBE's extra grouping set (NULL, k2): one more re-aggregation
        # of the tiny leaf result, same epsilon cost as the subtotals
        sub2 = (
            leaf.groupby(k2)
            .sum([count_name, sum_name])
            .map_batches(
                lambda b: as_out(
                    b.rename_columns([k2, count_name, sum_name]).append_column(
                        k1, pa.nulls(b.num_rows, pa.string())
                    ),
                    null_k2=False,
                    null_k1=True,
                ),
                batch_format="pyarrow",
            )
        )
        out = out.union(sub2)
    return out


def cube_count_sum(ds, k1: str, k2: str, *, value_col: str,
                   count_name: str = "n", sum_name: str = "total"):
    """SQL ``GROUP BY CUBE(k1, k2)``: the ROLLUP levels plus the
    (NULL, k2) grouping set — still ONE data shuffle (the leaf); every
    coarser set re-aggregates the tiny leaf table."""
    return rollup_count_sum(ds, k1, k2, value_col=value_col,
                            count_name=count_name, sum_name=sum_name,
                            _extra_sets=True)


def _coarse_levels_driver(leaf, k1: str, k2: str, *, count_name: str,
                          sum_name: str, schema: pa.Schema,
                          extra_sets: bool):
    """Coarser grouping sets computed in-process from the materialized
    leaf (bounded by ``driver_threshold`` rows by the caller's check):
    one vectorized Arrow group_by per set instead of one Ray groupby's
    fixed sort cost per set. Output identical to the distributed path."""
    import ray
    import ray.data

    tables = [t for t in ray.get(leaf.to_arrow_refs())
              if count_name in t.column_names]
    if not tables:
        return leaf  # empty input -> empty result (SQL semantics)
    t = pa.concat_tables([tb.combine_chunks() for tb in tables])

    def agg(keys: list[str], null_cols: list[str]) -> pa.Table:
        if keys:
            g = t.group_by(keys).aggregate(
                [(count_name, "sum"), (sum_name, "sum")]
            ).rename_columns([*keys, count_name, sum_name])
        else:
            g = pa.table({
                count_name: pa.array([pc.sum(t[count_name]).as_py() or 0], pa.int64()),
                sum_name: pa.array([pc.sum(t[sum_name]).as_py() or 0], pa.int64()),
            })
        for c in null_cols:
            g = g.append_column(c, pa.nulls(g.num_rows, pa.string()))
        return g.select(schema.names).cast(schema)

    parts = [
        t.select(schema.names).cast(schema),     # leaves
        agg([k1], [k2]),                         # (k1, NULL)
        agg([], [k1, k2]),                       # grand total
    ]
    if extra_sets:
        parts.append(agg([k2], [k1]))            # (NULL, k2) for CUBE
    return ray.data.from_arrow(pa.concat_tables(parts))
