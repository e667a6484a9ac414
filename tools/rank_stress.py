"""global_rank at scale: 10M+ rows, two parallelism levels, checksum
bit-identity. Measures the range-prefix global ranking (no global sort)
and validates rn is a permutation (Σrn == n(n+1)/2) plus order-free
checksums (Σ rn·id, Σ rnk, Σ drnk mod 2^61−1) that must match across
parallelism levels.

Usage: python tools/rank_stress.py [n_rows] [cpus]
Writes one JSON line to stdout; redirect into BENCH/ to record.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np
import pyarrow as pa

sys.path.insert(0, "/root/repo")

M = (1 << 61) - 1


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    import ray
    import ray.data

    ray.init(address="local", num_cpus=cpus, include_dashboard=False,
             log_to_driver=False)
    from kgrecrun.ops.window import global_rank

    # deterministic per-row values derived from the id alone (identical
    # data at ANY block layout): multiplicative hash → quantized grid
    # with a squared tail (ties guaranteed, skewed range occupancy)
    def gen(batch):
        ids = batch["id"].to_numpy(zero_copy_only=False)
        h = (ids.astype(np.uint64) * np.uint64(2654435761)) % np.uint64(2**32)
        v = (h % np.uint64(20_000)).astype(np.float64)
        v = np.floor((v * v) / 4000.0) / 100.0
        return pa.table({
            "event_id": pa.array(ids, pa.int64()),
            "value": pa.array(v, pa.float64()),
        })

    # fixed block count across parallelism levels: the groupby
    # shuffle cost scales with block COUNT (BENCH note), so 4*cpus
    # blocks at 32 cpus measured 2.4x slower than the same 64 blocks
    blocks = int(sys.argv[3]) if len(sys.argv) > 3 else 64
    ds = (ray.data.range(n, override_num_blocks=blocks)
          .map_batches(gen, batch_format="pyarrow")
          .materialize())

    t0 = time.time()
    out = global_rank(ds, value_col="value", id_col="event_id",
                      range_width_cents=1000).materialize()
    elapsed = time.time() - t0
    # validation below is NOT timed — it's evidence, not the operator

    def check(batch: pa.Table) -> pa.Table:
        # uint64 wraparound (mod 2^64) — vectorized, no Python bigints
        rn = batch["rn"].to_numpy(zero_copy_only=False).astype(np.uint64)
        rnk = batch["rnk"].to_numpy(zero_copy_only=False).astype(np.uint64)
        dr = batch["drnk"].to_numpy(zero_copy_only=False).astype(np.uint64)
        ids = batch["event_id"].to_numpy(
            zero_copy_only=False).astype(np.uint64)
        def u(x):
            return pa.array([int(x)], pa.uint64())
        return pa.table({
            "sum_rn": u(rn.sum()),
            "ck_rnid": u((rn * ids).sum()),
            "ck_rnk": u((rnk * ids).sum()),
            "ck_drnk": u((dr * ids).sum()),
            "rows": pa.array([batch.num_rows], pa.int64()),
        })

    parts = [b for b in out.map_batches(check, batch_format="pyarrow")
             .iter_batches(batch_format="pyarrow")]
    agg = {c: np.uint64(0) for c in ("sum_rn", "ck_rnid", "ck_rnk", "ck_drnk")}
    rows = 0
    for b in parts:
        rows += sum(b["rows"].to_pylist())
        for c in agg:
            for v in b[c].to_pylist():
                agg[c] = np.uint64(agg[c] + np.uint64(v))
    agg = {c: int(v) for c, v in agg.items()}

    assert rows == n, (rows, n)
    assert agg["sum_rn"] == (n * (n + 1) // 2) % (1 << 64), agg
    agg["rows"] = rows
    print(json.dumps({
        "metric": "global_rank_rows_per_sec",
        "value": round(n / elapsed, 1),
        "unit": "rows/sec",
        "n_rows": n,
        "num_cpus": cpus,
        "elapsed_sec": round(elapsed, 2),
        "checksums": {k: agg[k] for k in ("ck_rnid", "ck_rnk", "ck_drnk")},  # uint64 wraparound
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()
