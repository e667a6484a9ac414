"""segment_dedup_docs at scale: synthetic corpus with planted duplicate
windows, two parallelism levels, cross-parallelism checksum identity.

Corpus: n_docs docs x 40 tokens (4 segments of 10). A fraction of
segments is drawn from a small shared pool (heavy duplication — the
boilerplate regime), the rest are unique per (doc, position). Expected
behavior: every pool segment survives exactly once (at its smallest
(doc_id, seg_no)); unique segments all survive.

Validation: total surviving segments == n_unique + pool_distinct, and
an order-free uint64 checksum over md5(doc_id || text_clean) that must
match across parallelism levels.

Usage: python tools/segdedup_stress.py [n_docs] [cpus]
"""

from __future__ import annotations

import hashlib
import json
import sys
import time

import numpy as np
import pyarrow as pa

sys.path.insert(0, "/root/repo")

POOL = 1000        # distinct shared segments
DUP_FRAC = 0.3     # fraction of segment slots drawn from the pool


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 300_000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    import ray
    import ray.data

    ray.init(address="local", num_cpus=cpus, include_dashboard=False,
             log_to_driver=False)
    from kgrecrun.ops.dedup import segment_dedup_docs

    def gen(batch):
        ids = batch["id"].to_numpy(zero_copy_only=False)
        texts = []
        for d in ids:
            segs = []
            for s in range(4):
                # deterministic per (doc, slot): multiplicative hash
                h = (int(d) * 4 + s) * 2654435761 % (1 << 32)
                if (h % 1000) < DUP_FRAC * 1000:
                    k = h % POOL
                    segs.append(" ".join(f"p{k}w{i}" for i in range(10)))
                else:
                    segs.append(" ".join(f"d{d}s{s}w{i}" for i in range(10)))
            texts.append(" ".join(segs))
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array(texts, pa.string()),
        })

    ds = (ray.data.range(n, override_num_blocks=64)
          .map_batches(gen, batch_format="pyarrow")
          .materialize())

    t0 = time.time()
    out = segment_dedup_docs(ds).materialize()
    elapsed = time.time() - t0

    def check(batch: pa.Table) -> pa.Table:
        ck = np.uint64(0)
        nseg = 0
        for did, t in zip(batch["doc_id"].to_pylist(),
                          batch["text_clean"].to_pylist()):
            h = hashlib.md5(f"{did}|{t}".encode()).digest()
            ck = np.uint64(ck + np.uint64(int.from_bytes(h[:8], "big")))
            nseg += t.count(" ") // 10 + 1  # 10-token segs, 9 inner spaces
        return pa.table({"ck": pa.array([int(ck)], pa.uint64()),
                         "docs": pa.array([batch.num_rows], pa.int64()),
                         "segs": pa.array([nseg], pa.int64())})

    ck = np.uint64(0)
    docs = segs = 0
    for b in out.map_batches(check, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"):
        for v in b["ck"].to_pylist():
            ck = np.uint64(ck + np.uint64(v))
        docs += sum(b["docs"].to_pylist())
        segs += sum(b["segs"].to_pylist())

    print(json.dumps({
        "metric": "segment_dedup_docs_per_sec",
        "value": round(n / elapsed, 1),
        "unit": "docs/sec",
        "n_docs": n,
        "num_cpus": cpus,
        "elapsed_sec": round(elapsed, 2),
        "surviving_docs": docs,
        "surviving_segments": segs,
        "checksum": int(ck),
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()
