"""JPEG-decode phash-dedup at scale: the phash_stress harness with the
corpus's duplicate variants carried as JPEG (ops/jpeg.py) — proves the
codec inside the full decode -> ahash -> band -> verify -> label path,
at two parallelism levels, with exact planted truth.

Groups of 4 sharing ``base = id - id%4``: 0 = base 32x32 image as BMP;
1 = SAME pixels as baseline JPEG q90 (lossy container swap); 2 = SAME
pixels as PROGRESSIVE (SOF2) JPEG q90 with restart_interval=2
(exercises the successive-approximation scans AND the per-scan DRI/RST
resync path at corpus scale); 3 = an independent JPEG (negative
control). Singleton ids alternate baseline/progressive by parity, so
roughly half the corpus decodes through each entropy layout.
Pixels are 4x4-constant cells whose values come from two
bands ({10..80} | {176..246}) so every ahash cell sits >=40 grey levels
from the image mean — JPEG's few-level reconstruction error then flips
ZERO hash bits and the planted truth is exact, not statistical
(measured: max flip 0 over the band distribution; 2 without banding).

Validation: in md5-selected dup groups (frac=0.25) ids with id%4 in
{0,1,2} must label to the group base and id%4==3 stays a singleton;
all other ids are singletons. An order-free checksum over
(media_id, root_id) must match across parallelism levels.

Usage: python tools/jpeg_stress.py [n_images] [cpus]
"""

from __future__ import annotations

import hashlib
import json
import sys
import time

import numpy as np
import pyarrow as pa

sys.path.insert(0, "/root/repo")

FRAC = 0.25


def _coarse(rng: np.random.RandomState) -> np.ndarray:
    lo = rng.randint(10, 81, size=(8, 8))
    hi = rng.randint(176, 247, size=(8, 8))
    pick = rng.randint(0, 2, size=(8, 8))
    return np.kron(np.where(pick, hi, lo).astype(np.uint8),
                   np.ones((4, 4), np.uint8))


def synth_jpeg_corpus(media_ids, seed: int = 7) -> pa.Table:
    from kgrecrun.ops.jpeg import encode_jpeg, encode_jpeg_progressive
    from kgrecrun.ops.media import MEDIA_SCHEMA, encode_bmp, is_dup_group

    rows = []
    for mid in media_ids:
        mid = int(mid)
        base = mid - mid % 4
        if is_dup_group(base // 4, FRAC) and mid % 4 < 3:
            gray = _coarse(np.random.RandomState(
                (seed * 2_000_003 + base) % (2**31)))
            which = mid % 4
            if which == 0:
                payload = encode_bmp(gray)
            elif which == 1:
                payload = encode_jpeg(gray, quality=90)
            else:
                payload = encode_jpeg_progressive(gray, quality=90,
                                                  restart_interval=2)
        else:
            enc = encode_jpeg_progressive if mid % 2 else encode_jpeg
            payload = enc(_coarse(np.random.RandomState(
                (seed * 3_000_017 + mid) % (2**31))), quality=90)
        rows.append(dict(
            media_id=mid, kind="image", payload=payload, width=32,
            height=32, sample_rate=0,
            url=f"https://media.example/img/{mid}"))
    return pa.Table.from_pylist(rows, schema=MEDIA_SCHEMA)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    import ray
    import ray.data

    ray.init(address="local", num_cpus=cpus, include_dashboard=False,
             log_to_driver=False)
    from kgrecrun.ops.media import is_dup_group, phash_dedup

    def gen(batch: pa.Table) -> pa.Table:
        return synth_jpeg_corpus(batch["id"].to_pylist())

    media = (ray.data.range(n, override_num_blocks=max(64, 4 * cpus))
             .map_batches(gen, batch_format="pyarrow", batch_size=64)
             .materialize())  # exclude generation from the timed path

    t0 = time.time()
    out = phash_dedup(media).materialize()
    elapsed = time.time() - t0

    def check(batch: pa.Table) -> pa.Table:
        ids = batch["media_id"].to_numpy(zero_copy_only=False)
        roots = batch["root_id"].to_numpy(zero_copy_only=False)
        dup = np.array([is_dup_group(int(i) // 4, FRAC) for i in ids])
        want = np.where(dup & (ids % 4 < 3), ids - ids % 4, ids)
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
        "metric": "jpeg_phash_dedup_images_per_sec",
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
