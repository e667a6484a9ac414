"""Storage-layout stress: LSM compaction and Z-order clustering at
range-partitioned scale.

Usage: python tools/store_stress.py [n_rows] [num_cpus]

Cells (all over a synthetic (id, payload) / (x, y, payload) table):

1. ``compact_stores`` — 3 fully-overlapping hash-split sorted runs of
   n_rows total merged into one store with ZERO shuffle (metadata-only
   merge plan, one pruned-read task per output range), versus the
   baseline a naive engine would run: a full ``Dataset.sort`` over the
   union of the runs (sample + all-to-all exchange). Checks output
   equality via per-file sortedness/disjointness + row-count + an
   order-free checksum of (key, payload).
2. ``write_zorder_store`` — n_rows points on a √n×√n grid; measures
   thin-box queries in each dimension: files pruned vs total, rows
   read vs table, wall time vs a full-scan filter of the same parquet.

Results are printed as one JSON dict per cell (stderr keeps progress);
record headline numbers in BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

import numpy as np
import pyarrow as pa

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = "/tmp/kgrecrun_store_stress"


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def checksum(ds, cols) -> int:
    """Order-free XOR checksum over a splitmix64 mix of the row tuple —
    vectorized equality witness, no driver sort at 10M rows."""

    def mix(x: np.ndarray) -> np.ndarray:
        x = x.astype(np.uint64)
        x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return x ^ (x >> np.uint64(31))

    acc = np.uint64(0)
    for b in ds.iter_batches(batch_format="pyarrow", batch_size=None):
        h = np.zeros(b.num_rows, np.uint64)
        for i, c in enumerate(cols):
            v = b[c].to_numpy(zero_copy_only=False).astype(np.uint64)
            h = mix(h ^ mix(v + np.uint64(i + 1)))
        acc ^= np.bitwise_xor.reduce(h) if len(h) else np.uint64(0)
    return int(acc)


def compaction_cell(n: int) -> dict:
    import ray.data

    from kgrecrun.ops.sample import _hash64
    from kgrecrun.runtime.sortedstore import (compact_stores, lookup,
                                              write_sorted_store)

    root = f"{BASE}/compact"
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(root)

    ids = np.arange(n, dtype=np.int64)
    payload = ids * 1_000_003 % 999_983

    def make_run(r: int) -> str:
        h = _hash64(ids.tolist()) % np.uint64(3)
        m = h == r
        t = pa.table({"id": pa.array(ids[m]), "payload": pa.array(payload[m])})
        d = f"{root}/run{r}"
        write_sorted_store(ray.data.from_arrow(t).repartition(32), d, key="id")
        return d

    t0 = time.time()
    runs = [make_run(r) for r in range(3)]
    t_write = time.time() - t0
    log(f"runs written in {t_write:.1f}s")

    t0 = time.time()
    zm = compact_stores(runs, f"{root}/merged", key="id",
                        target_rows_per_file=max(64_000, n // 64))
    t_compact = time.time() - t0
    merged_rows = sum(z["rows"] for z in zm.values())
    assert merged_rows == n, (merged_rows, n)
    # disjoint + sorted by construction; order-free checksum vs input
    files = sorted(os.path.join(f"{root}/merged", f) for f in zm)
    got = checksum(ray.data.read_parquet(files), ["id", "payload"])
    want = checksum(ray.data.from_arrow(pa.table({
        "id": pa.array(ids), "payload": pa.array(payload)})),
        ["id", "payload"])
    assert got == want, "compaction changed the row multiset"
    log(f"compact: {t_compact:.1f}s, {len(zm)} files, checksum OK")

    # baseline: full Dataset.sort over the union of the runs
    t0 = time.time()
    run_files = [os.path.join(r, f) for r in runs
                 for f in sorted(os.listdir(r)) if f.endswith(".parquet")]
    union = ray.data.read_parquet(run_files)
    write_sorted_store(union, f"{root}/sorted_baseline", key="id")
    t_sort = time.time() - t0
    log(f"full-sort baseline: {t_sort:.1f}s")

    # point-lookup sanity on the merged store
    probes = ids[:: max(1, n // 11)].tolist()
    lk = lookup(f"{root}/merged", key="id", keys=probes).to_pandas()
    assert sorted(lk["id"]) == sorted(probes)

    return {
        "cell": "compact_stores", "rows": n,
        "t_compact_s": round(t_compact, 2),
        "t_full_sort_s": round(t_sort, 2),
        "speedup_vs_sort": round(t_sort / t_compact, 2),
        "rows_per_s": round(n / t_compact),
        "out_files": len(zm),
    }


def zorder_cell(n: int) -> dict:
    import ray.data

    from kgrecrun.runtime.zorder import box_files, box_lookup, \
        write_zorder_store

    root = f"{BASE}/zorder"
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(root)

    side = int(np.sqrt(n))
    g = np.arange(side * side, dtype=np.int64)
    t = pa.table({"x": pa.array(g % side), "y": pa.array(g // side),
                  "payload": pa.array(g * 7 % 1009)})
    src = f"{root}/src.parquet"
    import pyarrow.parquet as pq
    pq.write_table(t, src)

    t0 = time.time()
    zm = write_zorder_store(
        ray.data.read_parquet(src), f"{root}/store", cols=("x", "y"))
    t_write = time.time() - t0
    log(f"zorder store: {t_write:.1f}s, {len(zm)} files")

    out = {"cell": "zorder_store", "rows": side * side,
           "t_write_s": round(t_write, 2), "files": len(zm)}
    w = max(1, side // 100)  # ~1% thin slab
    for name, lo, hi in [
        ("thin_x", (side // 2, 0), (side // 2 + w, side - 1)),
        ("thin_y", (0, side // 2), (side - 1, side // 2 + w)),
        ("cell_box", (side // 4, side // 4),
         (side // 4 + 4 * w, side // 4 + 4 * w)),
    ]:
        files, total = box_files(f"{root}/store", lo, hi)
        t0 = time.time()
        rows = box_lookup(f"{root}/store", lo, hi).count()
        t_q = time.time() - t0
        t0 = time.time()
        import pyarrow.dataset as pds
        full = ray.data.read_parquet(
            src, filter=(
                (pds.field("x") >= lo[0]) & (pds.field("x") <= hi[0])
                & (pds.field("y") >= lo[1]) & (pds.field("y") <= hi[1]))
        ).count()
        t_full = time.time() - t0
        assert rows == full, (name, rows, full)
        out[name] = {
            "files_read": len(files), "files_total": total,
            "prune_pct": round(100 * (1 - len(files) / total), 1),
            "rows": rows, "t_pruned_s": round(t_q, 2),
            "t_fullscan_s": round(t_full, 2),
        }
        log(f"{name}: {len(files)}/{total} files, {rows} rows, "
            f"{t_q:.2f}s vs full {t_full:.2f}s")
    return out


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=cpus, include_dashboard=False,
                 log_to_driver=False)
    results = [compaction_cell(n), zorder_cell(n)]
    for r in results:
        print(json.dumps(r), flush=True)
    ray.shutdown()


if __name__ == "__main__":
    main()
