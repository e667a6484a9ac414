"""Windowed / per-group-ordered operators, expressed as
``groupby(key).map_groups`` over Arrow groups: the shuffle co-locates a
key's rows, the window logic runs vectorized inside the group. State
never crosses groups, so the pattern holds at any corpus size as long
as one key's rows fit in a worker (true for per-user event streams and
per-brand part lists; a hot key would be salted upstream).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def sessionize_events(sf_dir: str, gap_minutes: int = 30):
    """events → one row per (user, session): session = maximal run of a
    user's events with inter-event gaps ≤ ``gap_minutes``. Output:
    (user_id, session_no, n_events, sum_value_cents, duration_sec),
    session_no numbered 1.. in time order per user."""
    import ray.data

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_id", "ts", "value"]
    )
    gap_us = gap_minutes * 60 * 1_000_000

    def sessions(group: pa.Table) -> pa.Table:
        order = pc.sort_indices(
            group, sort_keys=[("ts", "ascending"), ("event_id", "ascending")]
        )
        g = group.take(order)
        from .relational import cents as to_cents

        ts = g["ts"].cast(pa.int64()).to_numpy()
        cents = to_cents(g["value"]).to_numpy()
        new_session = np.ones(len(ts), dtype=bool)
        new_session[1:] = (ts[1:] - ts[:-1]) > gap_us
        sess_no = np.cumsum(new_session)
        starts = np.flatnonzero(new_session)
        ends = np.append(starts[1:], len(ts))
        uid = g["user_id"][0].as_py()
        return pa.table(
            {
                "user_id": pa.array([uid] * len(starts), pa.int64()),
                "session_no": pa.array(sess_no[starts], pa.int64()),
                "n_events": pa.array(ends - starts, pa.int64()),
                "sum_value_cents": pa.array(
                    [int(cents[s:e].sum()) for s, e in zip(starts, ends)], pa.int64()
                ),
                "duration_sec": pa.array(
                    [int((ts[e - 1] - ts[s]) // 1_000_000) for s, e in zip(starts, ends)],
                    pa.int64(),
                ),
            }
        )

    return ds.groupby("user_id").map_groups(sessions, batch_format="pyarrow")


def user_event_windows(sf_dir: str, roll: int = 3):
    """Per-user ordered window functions (lag + rolling sum): for each
    event, the gap in µs since the user's previous event (null for the
    first) and the rolling sum of value-cents over the last ``roll``
    events inclusive. Ordering key is (ts, event_id) — total, so output
    is deterministic. Output: (event_id, user_id, gap_us, roll_cents).

    All-integer math (epoch-µs gaps, cents sums) → bit-exact vs the SQL
    ``lag``/``SUM OVER ROWS BETWEEN`` oracle."""
    import ray.data

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_id", "ts", "value"]
    )

    def windows(group: pa.Table) -> pa.Table:
        order = pc.sort_indices(
            group, sort_keys=[("ts", "ascending"), ("event_id", "ascending")]
        )
        g = group.take(order)
        from .relational import cents as to_cents

        ts = g["ts"].cast(pa.int64()).to_numpy()
        cents = to_cents(g["value"]).to_numpy()
        gap = np.empty(len(ts), dtype=np.int64)
        gap[1:] = ts[1:] - ts[:-1]
        csum = np.concatenate(([0], np.cumsum(cents)))
        lo = np.maximum(np.arange(len(ts)) - (roll - 1), 0)
        rolling = csum[1 + np.arange(len(ts))] - csum[lo]
        gap_arr = pa.array(gap, pa.int64(), mask=np.arange(len(ts)) == 0)
        return pa.table(
            {
                "event_id": g["event_id"],
                "user_id": g["user_id"],
                "gap_us": gap_arr,
                "roll_cents": pa.array(rolling, pa.int64()),
            }
        )

    return ds.groupby("user_id").map_groups(windows, batch_format="pyarrow")


def top_parts_per_brand(sf_dir: str, k: int = 3):
    """part → top-k per brand by retail price (window-rank): output
    (p_brand, p_partkey, p_retailprice, rnk)."""
    import ray.data

    ds = ray.data.read_parquet(
        f"{sf_dir}/part.parquet", columns=["p_brand", "p_partkey", "p_retailprice"]
    )

    def topk(group: pa.Table) -> pa.Table:
        order = pc.sort_indices(
            group,
            sort_keys=[("p_retailprice", "descending"), ("p_partkey", "ascending")],
        )[:k]
        g = group.take(order)
        return g.append_column("rnk", pa.array(range(1, g.num_rows + 1), pa.int64()))

    return ds.groupby("p_brand").map_groups(topk, batch_format="pyarrow")
