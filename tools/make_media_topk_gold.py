"""Planted-truth golden for media_phash_topk — the last rows-only row
in the media family. Methodology (same contract as make_media_gold.py /
make_kg_mentions_gold.py): the golden is computed WITHOUT the engine —
pixel truth restated from the generator's own recipe (synth_image_corpus
draws pixels BEFORE any container encoding, so the golden bypasses the
BMP/PNG codecs entirely and independently verifies them), the 64-bit
average hash recomputed by an independent implementation (reshape-mean
pooling + strict-> threshold — aHash is a published fixed algorithm, the
same status as the bit-exact MinHash SQL oracle), and the top-k elected
by a brute-force numpy pass with the documented (hamming, media_id) tie
order. The tool then MEASURES the premise (engine output == golden,
row-exact) and refuses to write a golden the engine does not reproduce,
so an engine change can never be laundered into a matching oracle.

Generator truths used (ops/media.py synth_image_corpus, seed=7,
dup_groups_frac=1.0 — the media_phash_topk query configuration):
  * base pixels: RandomState((7*2_000_003 + base) % 2**31)
    .randint(10, 246, (32, 32)) for base = id - id%5
  * id%5==0 -> base pixels; 1 -> same pixels (PNG container);
    2 -> pixels+3; 3 -> exact 2x np.repeat upscale; 4 -> independent
    RandomState((7*3_000_017 + id) % 2**31) pixels
  * probes [1, 6, 11, 16], k=5, corpus n = max(100, n_docs//5) = 300
    at sf0.01

Writes tests/goldens/media_topk_gold_sf001.parquet.

Usage: python tools/make_media_topk_gold.py
"""

from __future__ import annotations

import pathlib
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

ROOT = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

N_IMAGES = 300  # max(100, 1500 // 5) — the sf0.01 media_phash_topk corpus
SEED = 7
PROBES = [1, 6, 11, 16]
K = 5
SF_DIR = "/root/testdata/sf0.01"
OUT = ROOT / "tests" / "goldens" / "media_topk_gold_sf001.parquet"


def generator_pixels(mid: int) -> np.ndarray:
    """The generator's pixel recipe restated (synth_image_corpus with
    dup_groups_frac=1.0), before any container encoding."""
    base = mid - mid % 5
    rng = np.random.RandomState((SEED * 2_000_003 + base) % (2**31))
    gray = rng.randint(10, 246, size=(32, 32)).astype(np.uint8)
    which = mid % 5
    if which in (0, 1):
        return gray
    if which == 2:
        return gray + 3
    if which == 3:
        return np.repeat(np.repeat(gray, 2, 0), 2, 1)
    rng2 = np.random.RandomState((SEED * 3_000_017 + mid) % (2**31))
    return rng2.randint(10, 246, size=(32, 32)).astype(np.uint8)


def independent_ahash(gray: np.ndarray) -> int:
    """Independent aHash: 8x8 reshape-mean pooling (integer sums are
    exact in float64), bit i set when cell i > mean of cells."""
    h, w = gray.shape
    assert h % 8 == 0 and w % 8 == 0, (h, w)
    cells = gray.astype(np.float64).reshape(8, h // 8, 8, w // 8).mean(
        axis=(1, 3)).ravel()
    mean = float(cells.mean())
    out = 0
    for i, c in enumerate(cells):
        if c > mean:
            out |= 1 << i
    return out


def golden_rows() -> pa.Table:
    hashes = {mid: independent_ahash(generator_pixels(mid))
              for mid in range(N_IMAGES)}
    ids = np.array(sorted(hashes), dtype=np.int64)
    out_p, out_m, out_d, out_r = [], [], [], []
    for pid in PROBES:
        cand = [(bin(hashes[pid] ^ hashes[int(m)]).count("1"), int(m))
                for m in ids if int(m) != pid]
        cand.sort()
        for rank, (d, m) in enumerate(cand[:K], start=1):
            out_p.append(pid)
            out_m.append(m)
            out_d.append(d)
            out_r.append(rank)
    return pa.table({
        "probe_id": pa.array(out_p, pa.int64()),
        "media_id": pa.array(out_m, pa.int64()),
        "hamming": pa.array(out_d, pa.int64()),
        "rank": pa.array(out_r, pa.int64()),
    })


def measure_premise(gold: pa.Table) -> None:
    """Engine == golden, row-exact — refuse the write otherwise."""
    import ray

    import __ray_entry__ as E

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 log_to_driver=False)
    eng = E.queries()["media_phash_topk"](SF_DIR)
    eng_tbl = pa.concat_tables(
        [b for b in eng.iter_batches(batch_format="pyarrow")]
    ).select(["probe_id", "media_id", "hamming", "rank"])
    keys = [("probe_id", "ascending"), ("rank", "ascending")]
    import pyarrow.compute as pc

    eng_tbl = eng_tbl.take(pc.sort_indices(eng_tbl, sort_keys=keys))
    gold_s = gold.take(pc.sort_indices(gold, sort_keys=keys))
    if not eng_tbl.equals(gold_s):
        print("ENGINE:", eng_tbl.to_pydict())
        print("GOLDEN:", gold_s.to_pydict())
        raise SystemExit("PREMISE VIOLATED: engine != independent golden; "
                         "golden NOT written")
    print(f"premise measured: engine == golden, {gold.num_rows} rows exact")


def main() -> None:
    gold = golden_rows()
    measure_premise(gold)
    pq.write_table(gold, OUT)
    print(f"wrote {OUT} ({gold.num_rows} rows)")


if __name__ == "__main__":
    main()
