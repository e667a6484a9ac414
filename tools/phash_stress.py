"""phash_dedup at scale: synthetic image corpus with planted
near-duplicate groups (container swap / brightness shift / 2x upscale
per synth_image_corpus), two parallelism levels, planted-truth
exactness and cross-parallelism identity.

Images are generated INSIDE the pipeline (real BMP/PNG encodes, ~3-16
KiB payloads), decoded and hashed by the actor-pool stage, then
clustered via the shared hamming banding — so the measured rate is the
full decode -> ahash -> band -> verify -> label path.

Validation: in md5-selected dup groups every id with id%5 in {0..3}
labels to its group base and id%5==4 stays a singleton; all other ids
are singletons (exact check, not statistical). An order-free checksum
over (media_id, root_id) must match across parallelism levels.

The corpus uses dup_groups_frac=0.125 (~10%% of images in planted
near-dup groups — the realistic regime; frac=1.0 would make the corpus
80%% duplicates and the measurement a driver-CC benchmark instead of a
decode/dedup one).

Usage: python tools/phash_stress.py [n_images] [cpus]
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
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    import ray
    import ray.data

    ray.init(address="local", num_cpus=cpus, include_dashboard=False,
             log_to_driver=False)
    from kgrecrun.ops.media import is_dup_group, phash_dedup, synth_image_corpus

    FRAC = 0.125

    def gen(batch: pa.Table) -> pa.Table:
        return synth_image_corpus(batch["id"].to_pylist(),
                                  dup_groups_frac=FRAC)

    media = (ray.data.range(n, override_num_blocks=max(64, 4 * cpus))
             .map_batches(gen, batch_format="pyarrow", batch_size=64)
             .materialize())  # exclude generation from the timed path

    t0 = time.time()
    out = phash_dedup(media).materialize()
    elapsed = time.time() - t0

    def check(batch: pa.Table) -> pa.Table:
        ids = batch["media_id"].to_numpy(zero_copy_only=False)
        roots = batch["root_id"].to_numpy(zero_copy_only=False)
        dup = np.array([is_dup_group(int(i) // 5, FRAC) for i in ids])
        want = np.where(dup & (ids % 5 < 4), ids - ids % 5, ids)
        bad = int((roots != want).sum())
        ck = np.uint64(0)
        for i, r in zip(ids.tolist(), roots.tolist()):
            h = hashlib.md5(f"{i}|{r}".encode()).digest()
            ck = np.uint64(ck + np.uint64(int.from_bytes(h[:8], "big")))
        return pa.table({"ck": pa.array([int(ck)], pa.uint64()),
                         "rows": pa.array([batch.num_rows], pa.int64()),
                         "bad": pa.array([bad], pa.int64())})

    ck = np.uint64(0)
    rows = bad = 0
    for b in out.map_batches(check, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"):
        for v in b["ck"].to_pylist():
            ck = np.uint64(ck + np.uint64(v))
        rows += sum(b["rows"].to_pylist())
        bad += sum(b["bad"].to_pylist())

    print(json.dumps({
        "metric": "phash_dedup_images_per_sec",
        "value": round(n / elapsed, 1),
        "unit": "images/sec",
        "n_images": n,
        "num_cpus": cpus,
        "elapsed_sec": round(elapsed, 2),
        "labeled_rows": rows,
        "planted_label_errors": bad,
        "checksum": int(ck),
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()
