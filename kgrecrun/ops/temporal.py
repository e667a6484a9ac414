"""Temporal operators Ray Data has no built-in for: as-of join and
hopping (sliding) window aggregation.

Both are expressed over **epoch-microsecond int64** timestamps so every
comparison, bucket floor and gap is integer math — bit-exact against any
SQL engine with no float or timezone ambiguity.

* :func:`asof_join` — for each left row, the right row with the greatest
  ``right_ts <= left_ts`` for the same key (classic "most recent prior
  fact"). Implemented as ONE co-partitioning shuffle: both sides are
  tagged, unioned and ``groupby(key)``-ed; inside a group the right side
  is sorted once and every left timestamp resolves via a vectorized
  ``searchsorted``. Partitioning assumption: one key's rows fit in a
  worker (per-user event/order streams; salt hot keys upstream).
* :func:`hopping_window_agg` — fixed-width windows every ``hop``; each
  row lands in ``width // hop`` windows, materialized map-side as that
  many shifted copies (vectorized concat), partially aggregated per
  batch, then one global ``groupby``. ``width == hop`` degenerates to a
  tumbling window. The shuffle carries one row per (window, key) per
  block, never the events.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _epoch_us(col) -> pa.Array:
    """timestamp[*] → int64 epoch microseconds (integer-exact)."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    return pc.cast(pc.cast(arr, pa.timestamp("us")), pa.int64())


def asof_join(
    left_ds,
    right_ds,
    *,
    key: str,
    left_ts: str,
    right_ts: str,
    right_tie: str,
    left_cols: list[str],
    right_cols: list[str],
):
    """Most-recent-prior join (inner): for each left row, attach the
    right-side columns of the row with the greatest ``right_ts`` ≤ the
    left row's ``left_ts`` within the same ``key``; ties on ``right_ts``
    resolve to the greatest ``right_tie`` (deterministic). Left rows
    with no prior right row are dropped.

    ``left_ds``/``right_ds`` must already carry only the needed columns.
    Returns (key, left_ts, *left_cols, *right_cols) with both ts columns
    as int64 epoch-us.
    """
    all_left = [key, left_ts, *left_cols]
    all_right = [key, right_ts, right_tie, *[c for c in right_cols if c != right_tie]]
    r_payload = [right_ts, *[c for c in right_cols if c != right_ts]]

    # aligned union schema: key, __ts (us), __side, then nullable payloads
    def tag_left(batch: pa.Table) -> pa.Table:
        cols = {
            key: pc.cast(batch[key], pa.int64()),
            "__ts": _epoch_us(batch[left_ts]),
            "__side": pa.nulls(batch.num_rows, pa.int8()).fill_null(0),
        }
        for c in left_cols:
            cols[c] = batch[c]
        for c in r_payload:
            cols[c] = pa.nulls(batch.num_rows, pa.int64())
        return pa.table(cols)

    def tag_right(batch: pa.Table) -> pa.Table:
        cols = {
            key: pc.cast(batch[key], pa.int64()),
            "__ts": _epoch_us(batch[right_ts]),
            "__side": pa.nulls(batch.num_rows, pa.int8()).fill_null(1),
        }
        for c in left_cols:
            cols[c] = pa.nulls(batch.num_rows, pa.int64())
        for c in r_payload:
            cols[c] = (
                _epoch_us(batch[c])
                if pa.types.is_timestamp(batch.schema.field(c).type)
                else pc.cast(batch[c], pa.int64())
            )
        return pa.table(cols)

    tagged = left_ds.map_batches(tag_left, batch_format="pyarrow").union(
        right_ds.map_batches(tag_right, batch_format="pyarrow")
    )

    out_fields = [(key, pa.int64()), (left_ts, pa.int64())]
    out_fields += [(c, pa.int64()) for c in left_cols]
    out_fields += [(c, pa.int64()) for c in r_payload]
    out_schema = pa.schema(out_fields)

    def resolve(group: pa.Table) -> pa.Table:
        side = group["__side"].combine_chunks().to_numpy(zero_copy_only=False)
        ts = group["__ts"].combine_chunks().to_numpy(zero_copy_only=False)
        l_idx = np.flatnonzero(side == 0)
        r_idx = np.flatnonzero(side == 1)
        if len(l_idx) == 0 or len(r_idx) == 0:
            return out_schema.empty_table()
        r_ts = ts[r_idx]
        r_tie = (
            group[right_tie]
            .combine_chunks()
            .to_numpy(zero_copy_only=False)[r_idx]
            .astype(np.int64)
        )
        # sort right by (ts, tie) so searchsorted's idx-1 is the latest,
        # greatest-tie prior row
        order = np.lexsort((r_tie, r_ts))
        r_ts = r_ts[order]
        r_take = r_idx[order]
        pos = np.searchsorted(r_ts, ts[l_idx], side="right") - 1
        hit = pos >= 0
        l_hit = l_idx[hit]
        r_hit = r_take[pos[hit]]
        cols = {
            key: pc.cast(group[key], pa.int64()).take(pa.array(l_hit)),
            left_ts: pa.array(ts[l_hit], pa.int64()),
        }
        for c in left_cols:
            cols[c] = group[c].combine_chunks().take(pa.array(l_hit))
        for c in r_payload:
            cols[c] = group[c].combine_chunks().take(pa.array(r_hit))
        return pa.table(cols, schema=out_schema)

    return tagged.groupby(key).map_groups(resolve, batch_format="pyarrow")


def hopping_window_agg(
    events_ds,
    *,
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
    width_us: int = 2 * 3600 * 1_000_000,
    hop_us: int = 3600 * 1_000_000,
):
    """Hopping-window count + cents-sum per (window_start, key). A row
    with hour-floor f belongs to windows f, f-hop, ... down to
    f-(width//hop-1)*hop. Output: (window_start_us, key, n_events,
    sum_value_cents)."""
    from .relational import cents as to_cents

    assert width_us % hop_us == 0, "width must be a multiple of hop"
    n_copies = width_us // hop_us

    def pre(batch: pa.Table) -> pa.Table:
        ts = _epoch_us(batch[ts_col]).to_numpy(zero_copy_only=False)
        base = pa.array(ts - ts % hop_us, pa.int64())  # floor to hop grid
        c = to_cents(batch[value_col])
        keys = batch[key_col]
        parts = []
        for i in range(n_copies):
            parts.append(
                pa.table(
                    {
                        "window_start_us": pc.subtract(base, i * hop_us),
                        key_col: keys,
                        "cents": c,
                        "one": pa.nulls(batch.num_rows, pa.int64()).fill_null(1),
                    }
                )
            )
        t = pa.concat_tables(parts)
        g = t.group_by(["window_start_us", key_col]).aggregate(
            [("one", "sum"), ("cents", "sum")]
        )
        return g.rename_columns(["window_start_us", key_col, "n_local", "cents_local"])

    agg = (
        events_ds.map_batches(pre, batch_format="pyarrow")
        .groupby(["window_start_us", key_col])
        .sum(["n_local", "cents_local"])
    )
    return agg.map_batches(
        lambda b: b.rename_columns(
            ["window_start_us", key_col, "n_events", "sum_value_cents"]
        ),
        batch_format="pyarrow",
    )
