"""WARC ingest at scale: archive bytes → streaming parse (digest
verification ON) → the flagship extraction stage, at two parallelism
levels with an order-free result checksum that must match across them.

The shard set is generated once per n (deterministic content, so the
8-cpu and 32-cpu runs consume IDENTICAL bytes) and cached under /tmp;
the timed path is read_warc → extract_articles → project + checksum —
i.e. exactly what a production ingest does with a crawl drop.

Usage: python tools/warc_stress.py [n_pages] [cpus]
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import time

import numpy as np
import pyarrow as pa

sys.path.insert(0, "/root/repo")


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    import ray
    import ray.data

    ray.init(address="local", num_cpus=cpus, include_dashboard=False,
             log_to_driver=False)
    from kgrecrun.corpus.synthgen import pages_dataset
    from kgrecrun.extract.stage import extract_articles
    from kgrecrun.sources.warc import read_warc, write_warc_shards

    shard_dir = f"/tmp/kgrecrun_warc_stress_{n}"
    write_sec = None
    if not os.path.isdir(shard_dir):
        t0 = time.time()
        stage = shard_dir + ".stage"
        manifest = write_warc_shards(
            pages_dataset(n, seed=42).repartition(max(16, n // 2000)),
            stage)
        assert int(manifest.to_pandas()["n_records"].sum()) == n
        os.rename(stage, shard_dir)
        write_sec = round(time.time() - t0, 2)

    n_shards = len(os.listdir(shard_dir))
    gb = sum(os.path.getsize(os.path.join(shard_dir, f))
             for f in os.listdir(shard_dir)) / 1e9

    t0 = time.time()
    arts = extract_articles(read_warc(shard_dir, verify_digests=True),
                            emit_html=False)

    def check(batch: pa.Table) -> pa.Table:
        ck = np.uint64(0)
        for u, tl, sc in zip(batch["url"].to_pylist(),
                             batch["text_length"].to_pylist(),
                             batch["score"].to_pylist()):
            h = hashlib.md5(f"{u}|{tl}|{sc}".encode()).digest()
            ck = np.uint64(ck + np.uint64(int.from_bytes(h[:8], "big")))
        return pa.table({"ck": pa.array([int(ck)], pa.uint64()),
                         "rows": pa.array([batch.num_rows], pa.int64())})

    ck = np.uint64(0)
    rows = 0
    for b in arts.map_batches(check, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"):
        for v in b["ck"].to_pylist():
            ck = np.uint64(ck + np.uint64(v))
        rows += sum(b["rows"].to_pylist())
    elapsed = time.time() - t0

    print(json.dumps({
        "metric": "warc_ingest_extract_pages_per_sec",
        "value": round(n / elapsed, 1),
        "unit": "pages/sec",
        "n_pages": n,
        "n_shards": n_shards,
        "warc_gb": round(gb, 2),
        "num_cpus": cpus,
        "elapsed_sec": round(elapsed, 2),
        "shard_write_sec": write_sec,
        "rows_out": rows,
        "checksum": int(ck),
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()
