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


def cdx_main(n: int, cpus: int, n_probes: int = 20_000) -> None:
    """--cdx mode: random access at scale. Shards + CDX index are built
    once per n (cached); the timed path filters the index to n_probes
    md5-selected urls and fetches each by byte range (digest verified).
    Point-lookup throughput must not scan shards: wall time tracks the
    probe count, not the corpus size."""
    import ray
    import ray.data

    ray.init(address="local", num_cpus=cpus, include_dashboard=False,
             log_to_driver=False)
    from kgrecrun.corpus.synthgen import pages_dataset
    from kgrecrun.sources.warc import cdx_fetch, write_warc_shards

    shard_dir = f"/tmp/kgrecrun_warc_cdx_stress_{n}"
    cdx_dir = shard_dir + "_cdx"
    if not os.path.isdir(shard_dir):
        stage, cstage = shard_dir + ".stage", cdx_dir + ".stage"
        write_warc_shards(
            pages_dataset(n, seed=42).repartition(max(16, n // 2000)),
            stage, cdx_dir=cstage)
        os.rename(cstage, cdx_dir)
        os.rename(stage, shard_dir)

    def probe(batch: pa.Table) -> pa.Table:
        # vectorized probe selection (doc id modulo) — the index scan
        # must not be a per-row Python loop, same rule as the engine
        import pyarrow.compute as pc

        did = pc.cast(pc.struct_field(pc.extract_regex(
            batch["url"].combine_chunks(), r"art-(?P<id>\d+)$"), "id"),
            pa.int64())
        k = max(1, n // n_probes)
        mixed = pc.add(did, pc.multiply(did, did))
        rem = pc.subtract(mixed, pc.multiply(
            pc.divide(mixed, k), k))  # no pc.mod in this pyarrow
        return batch.filter(pc.equal(rem, 0))

    t0 = time.time()
    hits = ray.data.read_parquet(cdx_dir).map_batches(
        probe, batch_format="pyarrow")
    rows = cdx_fetch(hits, shard_dir, verify_digests=True)
    ck = np.uint64(0)
    fetched = 0
    for b in rows.map_batches(
            lambda t: pa.table({
                "m": pa.array([sum(
                    int.from_bytes(hashlib.md5(h).digest()[:8], "big")
                    for h in t["html"].to_pylist()) % (2**64)], pa.uint64()),
                "n": pa.array([t.num_rows], pa.int64())}),
            batch_format="pyarrow").iter_batches(batch_format="pyarrow"):
        for v in b["m"].to_pylist():
            ck = np.uint64(ck + np.uint64(v))
        fetched += sum(b["n"].to_pylist())
    elapsed = time.time() - t0

    print(json.dumps({
        "metric": "warc_cdx_point_lookups_per_sec",
        "value": round(fetched / elapsed, 1),
        "unit": "lookups/sec",
        "n_pages": n,
        "n_probes": fetched,
        "num_cpus": cpus,
        "elapsed_sec": round(elapsed, 2),
        "payload_checksum": int(ck),
    }))
    ray.shutdown()


def main() -> None:
    argv = [a for a in sys.argv[1:] if a != "--cdx"]
    n = int(argv[0]) if len(argv) > 0 else 200_000
    cpus = int(argv[1]) if len(argv) > 1 else 32
    if "--cdx" in sys.argv:
        cdx_main(n, cpus)
        return

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
