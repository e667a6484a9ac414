"""skew_join at scale: planted EXTREME key skew (head key ~30% of all
left rows, Zipf tail behind it) joined against a dimension table —
the regime where a plain hash join serializes one reducer. Measures
hybrid (hot-broadcast + cold-cogroup) vs plain bucketed cogroup wall
time at a given parallelism, with order-free checksums that must be
bit-identical between the two paths and across parallelism levels.

Synthetic shape (deterministic per-id, identical at any block layout):
left key = 0 for hot_pct% of ids (avalanche-mix routed), else mix(id) %
n_keys; right = one attr row per key 0..n_keys.

Also reports MAX BUCKET ROWS — the reducer-peak metric that matters
at cluster scale: the plain cogroup's hottest bucket holds every row of
the head key (reducer memory ∝ head share × total rows), while the
hybrid's cold buckets stay at tail/n_buckets regardless of skew.

Usage: python tools/skewjoin_stress.py [n_left] [n_keys] [cpus] [hot_pct]
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


def _mix(x: np.ndarray, seed: int) -> np.ndarray:
    x = x.astype(np.uint64) ^ np.uint64(seed)
    x = (x ^ (x >> np.uint64(33))) * np.uint64(0xFF51AFD7ED558CCD)
    x = (x ^ (x >> np.uint64(33))) * np.uint64(0xC4CEB9FE1A85EC53)
    return x ^ (x >> np.uint64(33))


def main() -> None:
    n_left = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    n_keys = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
    cpus = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    hot_pct = int(sys.argv[4]) if len(sys.argv) > 4 else 30

    import ray
    import ray.data

    ray.init(address="local", num_cpus=cpus, include_dashboard=False,
             log_to_driver=False)
    from kgrecrun.ops.cogroup import bucket_join
    from kgrecrun.ops.skew import skew_join

    def gen_left(batch):
        ids = batch["id"].to_numpy(zero_copy_only=False)
        hot = (_mix(ids, 0xAB) % np.uint64(100)) < np.uint64(hot_pct)  # head share
        k = np.where(hot, np.uint64(0),
                     _mix(ids, 0xCD) % np.uint64(n_keys)).astype(np.int64)
        return pa.table({"k": pa.array(k, pa.int64()),
                         "p": pa.array(ids, pa.int64())})

    def gen_right(batch):
        ids = batch["id"].to_numpy(zero_copy_only=False)
        return pa.table({"k": pa.array(ids, pa.int64()),
                         "attr": pa.array(
                             (_mix(ids, 0xEF) % np.uint64(1 << 31)).astype(np.int64),
                             pa.int64())})

    def left_ds():
        return ray.data.range(n_left, override_num_blocks=64).map_batches(
            gen_left, batch_format="pyarrow")

    def right_ds():
        return ray.data.range(n_keys, override_num_blocks=16).map_batches(
            gen_right, batch_format="pyarrow")

    def checksum(ds):
        n, acc = 0, 0
        for b in ds.iter_batches(batch_format="pyarrow"):
            n += b.num_rows
            kk = b["k"].to_numpy(zero_copy_only=False).astype(np.object_)
            pp = b["p"].to_numpy(zero_copy_only=False).astype(np.object_)
            aa = b["attr"].to_numpy(zero_copy_only=False).astype(np.object_)
            acc = (acc + int((((kk * 1_000_003 + pp) * 999_983 + aa) % M).sum())) % M
        return n, acc

    t0 = time.time()
    n_plain, cs_plain = checksum(
        bucket_join(left_ds(), right_ds(), key="k", join_type="inner"))
    t_plain = time.time() - t0

    t0 = time.time()
    n_skew, cs_skew = checksum(
        skew_join(left_ds(), right_ds(), key="k", detect_rows=2_000_000))
    t_skew = time.time() - t0

    # reducer-peak metric: rows landing in the hottest of 256 cogroup
    # buckets, plain vs the hybrid's cold path (exact, via the same
    # hash_bucket the operators use)
    from kgrecrun.kg.unionfind import hash_bucket

    def max_bucket(counts_by_key: dict) -> int:
        ks = pa.array(list(counts_by_key.keys()), pa.int64())
        b = hash_bucket(ks, 256).to_numpy(zero_copy_only=False)
        ns = np.fromiter(counts_by_key.values(), np.int64)
        return int(np.bincount(b, weights=ns, minlength=256).max())

    # exact per-key left counts, derived from the generator definition
    ids = np.arange(n_left, dtype=np.uint64)
    hot = (_mix(ids, 0xAB) % np.uint64(100)) < np.uint64(hot_pct)
    k = np.where(hot, np.uint64(0), _mix(ids, 0xCD) % np.uint64(n_keys)).astype(np.int64)
    uniq, cnt = np.unique(k, return_counts=True)
    all_counts = dict(zip(uniq.tolist(), cnt.tolist()))
    head_n = all_counts.get(0, 0)
    cold_counts = {kk: v for kk, v in all_counts.items() if kk != 0}
    mb_plain = max_bucket(all_counts)
    mb_hybrid = max_bucket(cold_counts)

    assert (n_plain, cs_plain) == (n_skew, cs_skew), "paths disagree"
    print(json.dumps({
        "tool": "skewjoin_stress", "n_left": n_left, "n_keys": n_keys,
        "cpus": cpus, "rows_out": n_plain, "checksum": cs_plain,
        "hot_pct": hot_pct, "head_rows": head_n,
        "plain_sec": round(t_plain, 2), "hybrid_sec": round(t_skew, 2),
        "speedup": round(t_plain / t_skew, 2),
        "max_bucket_rows_plain": mb_plain,
        "max_bucket_rows_hybrid_cold": mb_hybrid,
        "reducer_peak_reduction": round(1 - mb_hybrid / mb_plain, 4),
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()
