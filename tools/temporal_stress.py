"""Scale stress for the temporal operator family: synthesize N events
(default 10M) and N/10 orders across K users as streaming Datasets,
run `asof_join` and `hopping_window_agg`, and report wall time + result
invariants. Deterministic (seeded per block) — rerun = same counts.

Usage: python tools/temporal_stress.py [n_events] [n_users] [num_cpus]
"""

from __future__ import annotations

import sys
import time

import numpy as np
import pyarrow as pa

sys.path.insert(0, "/root/repo")

DAY_US = 86_400_000_000


def synth(n_rows: int, n_users: int, kind: str, num_blocks: int = 256):
    """Deterministic synthetic stream: block index seeds the RNG."""
    import ray.data

    per = n_rows // num_blocks

    def gen(batch: pa.Table) -> pa.Table:
        out = []
        import zlib

        for b in batch["id"].to_pylist():
            rng = np.random.RandomState(zlib.crc32(f"{kind}-{b}".encode()) % (2**31))
            base = np.arange(per, dtype=np.int64) + b * per
            ts = rng.randint(0, 30 * DAY_US, per).astype(np.int64)
            tbl = {
                "user_id": pa.array(base % n_users, pa.int64()),
                "ts": pa.array(ts, pa.int64()).cast(pa.timestamp("us")),
            }
            if kind == "events":
                tbl["event_id"] = pa.array(base, pa.int64())
                tbl["event_type"] = pa.array(
                    np.take(np.array(["view", "click", "buy"]), base % 3), pa.string()
                )
                tbl["value"] = pa.array(
                    rng.randint(0, 10_000, per) / 100.0, pa.float64()
                )
            else:
                tbl["o_orderkey"] = pa.array(base, pa.int64())
            out.append(pa.table(tbl))
        return pa.concat_tables(out)

    return ray.data.range(num_blocks, override_num_blocks=num_blocks).map_batches(
        gen, batch_format="pyarrow"
    )


def main(n_events: int, n_users: int, num_cpus: int = 32) -> None:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
                 log_to_driver=False)
    from kgrecrun.ops.temporal import asof_join, hopping_window_agg

    events = synth(n_events, n_users, "events")
    orders = synth(n_events // 10, n_users, "orders").map_batches(
        lambda b: pa.table(
            {"user_id": b["user_id"], "o_orderdate": b["ts"], "o_orderkey": b["o_orderkey"]}
        ),
        batch_format="pyarrow",
    )

    t0 = time.time()
    joined = asof_join(
        events.select_columns(["user_id", "ts", "event_id"]),
        orders,
        key="user_id",
        left_ts="ts",
        right_ts="o_orderdate",
        right_tie="o_orderkey",
        left_cols=["event_id"],
        right_cols=["o_orderdate", "o_orderkey"],
    )
    n_joined = joined.count()
    asof_sec = time.time() - t0

    t0 = time.time()
    agg = hopping_window_agg(events)
    n_windows = agg.count()
    hop_sec = time.time() - t0

    from kgrecrun.ops.window import sessionize_events, user_event_windows

    ev4 = events.select_columns(["user_id", "event_id", "ts", "value"])
    t0 = time.time()
    n_sessions = sessionize_events("", events_ds=ev4).count()
    sess_sec = time.time() - t0
    t0 = time.time()
    n_rows = user_event_windows("", events_ds=ev4).count()
    win_sec = time.time() - t0

    import json

    print(json.dumps({
        "n_events": n_events, "n_users": n_users,
        "asof_rows": n_joined, "asof_sec": round(asof_sec, 1),
        "asof_rows_per_sec": round(n_events / asof_sec),
        "hopping_windows": n_windows, "hopping_sec": round(hop_sec, 1),
        "hopping_rows_per_sec": round(n_events / hop_sec),
        "sessions": n_sessions, "sessionize_sec": round(sess_sec, 1),
        "sessionize_rows_per_sec": round(n_events / sess_sec),
        "window_rows": n_rows, "windows_sec": round(win_sec, 1),
        "windows_rows_per_sec": round(n_events / win_sec),
    }))


def main_prepartitioned(n_events: int, n_users: int, num_cpus: int,
                        n_buckets: int = 64) -> None:
    """VERDICT r2 item 7: the exchange-free as-of path over inputs
    pre-bucketed on disk by hash_bucket(user_id). The partitioned write
    is a ONE-OFF cost (amortized across every downstream temporal
    operator that reuses the partitioning key); the join itself is
    embarrassingly parallel — this is what bounds scaling when the
    shuffling variant is exchange-bound at ~0.5 efficiency."""
    import glob
    import json
    import shutil

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
                 log_to_driver=False)
    from kgrecrun.kg.unionfind import hash_bucket
    from kgrecrun.ops.temporal import asof_join_prepartitioned

    root = f"/tmp/temporal_prep_{n_events}_{n_users}_{n_buckets}"

    def tag(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "bucket", hash_bucket(batch["user_id"].combine_chunks(), n_buckets)
        )

    t0 = time.time()
    if not glob.glob(f"{root}/events/bucket=*"):
        shutil.rmtree(root, ignore_errors=True)
        events = synth(n_events, n_users, "events").select_columns(
            ["user_id", "ts", "event_id"]
        ).map_batches(tag, batch_format="pyarrow")
        events.write_parquet(f"{root}/events", partition_cols=["bucket"])
        orders = synth(n_events // 10, n_users, "orders").map_batches(
            lambda b: pa.table({
                "user_id": b["user_id"], "o_orderdate": b["ts"],
                "o_orderkey": b["o_orderkey"],
            }),
            batch_format="pyarrow",
        ).map_batches(tag, batch_format="pyarrow")
        orders.write_parquet(f"{root}/orders", partition_cols=["bucket"])
    write_sec = time.time() - t0

    t0 = time.time()
    joined = asof_join_prepartitioned(
        n_buckets,
        lambda b: f"{root}/events/bucket={b}",
        lambda b: f"{root}/orders/bucket={b}",
        key="user_id",
        left_ts="ts",
        right_ts="o_orderdate",
        right_tie="o_orderkey",
        left_cols=["event_id"],
        right_cols=["o_orderdate", "o_orderkey"],
    )
    n_joined = joined.count()
    join_sec = time.time() - t0

    print(json.dumps({
        "mode": "prepartitioned", "n_events": n_events, "n_users": n_users,
        "num_cpus": num_cpus, "n_buckets": n_buckets,
        "partition_write_sec": round(write_sec, 1),
        "asof_rows": n_joined, "asof_sec": round(join_sec, 1),
        "asof_rows_per_sec": round(n_events / join_sec),
    }))


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if a != "--prep"]
    n = int(args[0]) if len(args) > 0 else 10_000_000
    u = int(args[1]) if len(args) > 1 else 100_000
    c = int(args[2]) if len(args) > 2 else 32
    if "--prep" in sys.argv[1:]:
        main_prepartitioned(n, u, c)
    else:
        main(n, u, c)
