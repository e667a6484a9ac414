"""LM quality filter at scale: train the bigram model once, score N
synthetic docs at two parallelism levels, checksum the verdicts.

Usage: python tools/lm_stress.py [n_docs] [cpus]
"""

from __future__ import annotations

import hashlib
import json
import sys
import time

import numpy as np
import pyarrow as pa

sys.path.insert(0, "/root/repo")


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    import ray
    import ray.data

    ray.init(address="local", num_cpus=cpus, include_dashboard=False,
             log_to_driver=False)
    from kgrecrun.ops.lmfilter import lm_quality_scores

    words = [f"w{i}" for i in range(500)]

    def gen(batch: pa.Table) -> pa.Table:
        ids = batch["id"].to_pylist()
        texts = []
        for i in ids:
            # deterministic 100-token doc over a 500-word vocab
            toks = [words[(i * 31 + j * j * 7 + 3) % 500]
                    for j in range(100)]
            texts.append(" ".join(toks))
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "text": pa.array(texts, pa.string())})

    docs = (ray.data.range(n, override_num_blocks=max(64, 4 * cpus))
            .map_batches(gen, batch_format="pyarrow")
            .materialize())  # exclude generation from the timed path

    t0 = time.time()
    out = lm_quality_scores(docs, threshold_fp=10_000_000)
    ck = np.uint64(0)
    rows = 0
    for b in out.iter_batches(batch_format="pyarrow"):
        for i, s, k in zip(b["doc_id"].to_pylist(),
                           b["score_fp"].to_pylist(),
                           b["keep"].to_pylist()):
            h = hashlib.md5(f"{i}|{s}|{k}".encode()).digest()
            ck = np.uint64(ck + np.uint64(int.from_bytes(h[:8], "big")))
        rows += b.num_rows
    elapsed = time.time() - t0

    print(json.dumps({
        "metric": "lm_filter_docs_per_sec",
        "value": round(n / elapsed, 1),
        "unit": "docs/sec",
        "n_docs": n,
        "num_cpus": cpus,
        "elapsed_sec": round(elapsed, 2),
        "rows_out": rows,
        "checksum": int(ck),
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()
