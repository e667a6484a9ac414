"""Bloom-prefilter join at scale: large-large semi/anti join where the
right key set is far beyond any exact-broadcast threshold, at a low
match rate (the bloom's home regime). Measures the verify-exchange
reduction (rows entering the cogroup shuffle) and wall time, bloom vs
plain cogroup, with order-free result checksums that must be identical
between the two paths and across parallelism levels.

Synthetic shape (deterministic per-id, identical at any block layout):
left ids 0..n_left over key domain [0, n_left); right keys drawn from
[0, n_right_domain) where only match_pct% of left rows hit. Per-(side, id)
avalanche-mixed keys (vectorized; scalar keys carry no sequence
structure, unlike the linear-token-stream trap).

Usage: python tools/bloom_stress.py [n_left] [n_right] [cpus]
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


def _mix_u64(seed: int, ids: np.ndarray) -> np.ndarray:
    """Vectorized stateless per-id hash (xxhash-style avalanche). Scalar
    KEYS have no sequence structure, so a mixed multiplicative hash is
    safe here (the memory-note trap was about token SEQUENCES under a
    linear stream); the seed xor decorrelates it from the bloom's own
    splitmix64 double hashing."""
    x = ids.astype(np.uint64) ^ np.uint64(seed)
    x = (x ^ (x >> np.uint64(33))) * np.uint64(0xFF51AFD7ED558CCD)
    x = (x ^ (x >> np.uint64(33))) * np.uint64(0xC4CEB9FE1A85EC53)
    return x ^ (x >> np.uint64(33))


def main() -> None:
    n_left = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    n_right = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
    cpus = int(sys.argv[3]) if len(sys.argv) > 3 else 32

    import ray
    import ray.data

    ray.init(address="local", num_cpus=cpus, include_dashboard=False,
             log_to_driver=False)
    from kgrecrun.ops.joins import bloom_semi_join, semi_join

    # key domains: left keys uniform over 100×n_right values, right keys
    # over the first n_right values → expected match rate 1%.
    domain = n_right * 100

    def gen_left(batch):
        ids = batch["id"].to_numpy(zero_copy_only=False)
        k = (_mix_u64(0x1EF7, ids) % np.uint64(domain)).astype(np.int64)
        return pa.table({"k": pa.array(k, pa.int64()),
                         "payload": pa.array(ids, pa.int64())})

    def gen_right(batch):
        ids = batch["id"].to_numpy(zero_copy_only=False)
        k = (_mix_u64(0x2A6B, ids) % np.uint64(n_right)).astype(np.int64)
        return pa.table({"k": pa.array(k, pa.int64())})

    def left_ds():
        return ray.data.range(n_left, override_num_blocks=64).map_batches(
            gen_left, batch_format="pyarrow")

    def right_ds():
        return ray.data.range(n_right, override_num_blocks=16).map_batches(
            gen_right, batch_format="pyarrow")

    def checksum(ds):
        import pyarrow.compute as pc

        n = 0
        acc = 0
        for b in ds.iter_batches(batch_format="pyarrow"):
            n += b.num_rows
            kk = b["k"].to_numpy(zero_copy_only=False).astype(np.object_)
            pp = b["payload"].to_numpy(zero_copy_only=False).astype(np.object_)
            acc = (acc + int(((kk * 1_000_003 + pp) % M).sum())) % M
        return n, acc

    results = {}
    # plain cogroup path: every left row enters the verify exchange
    t0 = time.time()
    n_plain, cs_plain = checksum(semi_join(left_ds(), right_ds(), "k"))
    t_plain = time.time() - t0

    # bloom path: count survivors entering the exchange via a probe run
    from kgrecrun.ops.joins import _bloom_mask, build_bloom

    t0 = time.time()
    n_bloom, cs_bloom = checksum(bloom_semi_join(left_ds(), right_ds(), "k"))
    t_bloom = time.time() - t0

    bloom = build_bloom(right_ds(), "k")
    surv = 0
    for b in left_ds().iter_batches(batch_format="pyarrow"):
        surv += int(_bloom_mask(b, "k", bloom, 4).sum())

    assert (n_plain, cs_plain) == (n_bloom, cs_bloom), "paths disagree"
    results = {
        "tool": "bloom_stress", "n_left": n_left, "n_right": n_right,
        "cpus": cpus, "match_rows": n_plain, "checksum": cs_plain,
        "plain_sec": round(t_plain, 2), "bloom_sec": round(t_bloom, 2),
        "exchange_rows_plain": n_left,
        "exchange_rows_bloom": surv,
        "exchange_reduction": round(1 - surv / n_left, 4),
        "fp_rate": round((surv - n_plain) / max(n_left - n_plain, 1), 5),
    }
    print(json.dumps(results))
    ray.shutdown()


if __name__ == "__main__":
    main()
