"""CDC / changelog merge (lakehouse MERGE, SCD type-1): apply a stream
of keyed change records (upserts + deletes) to a base snapshot and emit
the latest state per key — the compaction step of an incremental
ingestion pipeline.

Semantics: per key, the winning record is the change with the highest
``(ts, seq)`` (``seq`` is the unique tie-break — a change id); base
rows act as changes older than every real change. If the winner is a
delete, the key is absent from the output; keys never touched by a
change pass through from base; insert-by-change (key absent from base)
works the same way.

Scale shape: ONE bucketed exchange total — base and changelog are
tagged into a common narrow layout in ``map_batches``, the per-key
winner election reuses :func:`group_arg_extreme` (map-side combiner
keeps ≤ 1 row/key/block, one ``n_buckets``-capped groupby elects
winners), and deletes are dropped with a vectorized filter. No
broadcast of either side; both may be corpus-order.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from .argext import group_arg_extreme


def apply_changelog(base_ds, changes_ds, *, key: str, value_cols: list[str],
                    ts_col: str, seq_col: str, op_col: str,
                    delete_op: str = "delete"):
    """Merge ``changes_ds`` into ``base_ds``.

    ``base_ds``: (key, *value_cols). ``changes_ds``: (key, *value_cols,
    ts_col, seq_col, op_col) where ``op_col == delete_op`` marks a
    delete (its value columns are ignored) and anything else an upsert.
    ``ts_col``/``seq_col`` must be orderable; (ts, seq) must be unique
    per key for deterministic output. Returns (key, *value_cols) — the
    surviving latest state.
    """
    from .cogroup import _arrow_schema

    ch_schema = _arrow_schema(changes_ds.schema())
    ts_type = ch_schema.field(ts_col).type
    seq_type = ch_schema.field(seq_col).type

    def tag_base(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        cols = {key: batch[key]}
        for c in value_cols:
            cols[c] = batch[c]
        cols["__ts"] = pa.nulls(n, ts_type)
        cols["__seq"] = pa.nulls(n, seq_type)
        cols["__del"] = pa.nulls(n, pa.bool_()).fill_null(False)
        return pa.table(cols)

    def tag_change(batch: pa.Table) -> pa.Table:
        cols = {key: batch[key]}
        for c in value_cols:
            cols[c] = batch[c]
        cols["__ts"] = batch[ts_col]
        cols["__seq"] = batch[seq_col]
        cols["__del"] = pc.equal(batch[op_col], delete_op)
        return pa.table(cols)

    # nulls sort LAST under "descending" in arrow lexsort, so base rows
    # (null ts/seq) lose to every change — exactly "older than all".
    tagged = base_ds.map_batches(
        tag_base, batch_format="pyarrow", zero_copy_batch=True
    ).union(changes_ds.map_batches(
        tag_change, batch_format="pyarrow", zero_copy_batch=True))
    winners = group_arg_extreme(
        tagged, key=key,
        order_cols=[("__ts", "descending"), ("__seq", "descending")])

    def finish(batch: pa.Table) -> pa.Table:
        live = batch.filter(pc.invert(batch["__del"]))
        return live.select([key, *value_cols])

    return winners.map_batches(finish, batch_format="pyarrow",
                               zero_copy_batch=True)


def maintain_agg(agg_ds, delta_ds, *, key: str, sum_cols: list[str],
                 n_col: str = "n", op_col: str = "op",
                 delete_op: str = "delete"):
    """Incremental VIEW MAINTENANCE for distributive aggregates: update
    a materialized per-key (count, sums) aggregate from a row-level
    changelog WITHOUT rescanning the base table.

    ``agg_ds`` is the existing aggregate (key, n_col, *sum_cols);
    ``delta_ds`` is the change stream (key, *sum_cols, op_col) where
    each row is one inserted (+) or deleted (−) base-table row. Every
    delta row becomes a signed partial (±1, ±value), map-side combined
    per block, then ONE native groupby-sum merges partials with the
    old aggregate — the exchange carries ≤ |keys-in-block| rows of the
    delta plus the (already small) aggregate, never base rows. Keys
    whose count reaches zero are dropped (they no longer exist in the
    view), matching a full recompute exactly: count and sum are
    distributive, so base ⊎ inserts ∖ deletes == old_agg + Σ signed
    deltas. This is the 100-TB shape: maintaining a daily aggregate
    over an appended/retracted sliver costs O(delta), not O(base).

    Deletes MUST carry the same value columns as the original inserted
    row (standard changelog/retraction semantics — e.g. Flink's
    retract streams); int64 sums assumed (cents discipline).
    """

    def signed(batch: pa.Table) -> pa.Table:
        sign = pc.if_else(pc.equal(batch[op_col], delete_op),
                          pa.scalar(-1, pa.int64()),
                          pa.scalar(1, pa.int64()))
        cols = {key: batch[key], n_col: sign}
        for c in sum_cols:
            cols[c] = pc.multiply(pc.cast(batch[c], pa.int64()), sign)
        t = pa.table(cols)
        g = t.group_by(key).aggregate(
            [(n_col, "sum")] + [(c, "sum") for c in sum_cols])
        return g.rename_columns([key, n_col, *sum_cols])

    def align(batch: pa.Table) -> pa.Table:
        return batch.select([key, n_col, *sum_cols])

    merged = (agg_ds.map_batches(align, batch_format="pyarrow",
                                 zero_copy_batch=True)
              .union(delta_ds.map_batches(signed, batch_format="pyarrow",
                                          zero_copy_batch=True))
              .groupby(key).sum([n_col, *sum_cols]))

    def finish(batch: pa.Table) -> pa.Table:
        t = batch.rename_columns([key, n_col, *sum_cols])
        return t.filter(pc.greater(t[n_col], 0))

    return merged.map_batches(finish, batch_format="pyarrow",
                              zero_copy_batch=True)
