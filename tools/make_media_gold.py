"""Planted-truth goldens for the media family (VERDICT r3 item 4),
upgrading media_features / media_resize / media_frames /
media_phash_dedup from rows-only to hash-exact driver signals — the
kg_triples methodology: the golden is written from the GENERATOR's
knowledge only (container kind by id, payload bytes, signal lengths,
planted duplicate-group structure, format constants), never from the
engine; the tool MEASURES the premise (engine output == planted truth,
exactly) and refuses to write a golden the engine does not reproduce,
so an engine change can never be laundered into a matching oracle.

Generator truths used (ops/media.py synth_media_batch /
synth_image_corpus are input generators, same status as
corpus/synthgen):
  * kind: id%4==0 → audio (PCM WAV), else image (BMP / PNG / FAKEIMG)
  * checksum: md5 of the generator's own payload bytes
  * n_features: the declared 64-dim feature contract
  * resize: constant 16×16 output; n_bytes = the 24-bit BMP container
    size for 16×16 (14+40 header + 16 rows × 48 padded bytes = 822);
    audio rows error (n_bytes 0, ok false)
  * frames: sr=8000, window 25 ms (200 samples), hop 10 ms (80);
    n_frames = len(range(0, max(n-199, 1), 80)) with the generator's n
  * phash groups of 5: ids with id%5 in {0..3} label to base id
    (aHash invariance under container swap / clip-free +3 brightness /
    exact 2x upscale is proven on integer pixels); id%5==4 singleton

Writes tests/goldens/media_{features,resize,frames,phash}_gold_sf001.parquet.
Valid at sf0.01 (n_docs=1500 → 150 media rows / 300 corpus images).

Usage: python tools/make_media_gold.py
"""

from __future__ import annotations

import hashlib
import pathlib
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

ROOT = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

from kgrecrun.ops.media import (  # noqa: E402
    DecodeMedia,
    FrameSampleAudio,
    ResizeMedia,
    synth_image_corpus,
    synth_media_batch,
)

N_MEDIA = 150   # max(60, 1500 // 10) — the sf0.01 media-query corpus
N_IMAGES = 300  # max(100, 1500 // 5) — the sf0.01 phash-dedup corpus
SEED = 42
BMP_16x16_BYTES = 14 + 40 + 16 * ((16 * 3 + 3) // 4 * 4)  # 822


def wav_n_samples(mid: int) -> int:
    """The generator's RNG draw for audio length (synth_media_batch)."""
    rng = np.random.RandomState((SEED * 1_000_003 + mid) % (2**31))
    return int(rng.randint(800, 4000))


def fail(msg: str) -> None:
    print(f"PREMISE VIOLATION: {msg}")
    raise SystemExit(1)


def main() -> None:
    media = synth_media_batch(range(N_MEDIA))
    payloads = media["payload"].to_pylist()
    mids = media["media_id"].to_pylist()

    # ---- media_features golden ------------------------------------
    feat_truth = pa.table({
        "media_id": pa.array(mids, pa.int64()),
        "kind": pa.array(
            ["audio" if m % 4 == 0 else "image" for m in mids], pa.string()),
        "checksum": pa.array(
            [hashlib.md5(p).hexdigest() for p in payloads], pa.string()),
        "n_features": pa.array([64] * len(mids), pa.int64()),
    })
    got = DecodeMedia()(media)
    for i in range(len(mids)):
        if got["error"][i].as_py() is not None:
            fail(f"decode error for media_id {mids[i]}")
        if (got["kind"][i].as_py() != feat_truth["kind"][i].as_py()
                or got["checksum"][i].as_py() != feat_truth["checksum"][i].as_py()
                or len(got["features"][i].as_py()) != 64):
            fail(f"features row {mids[i]} != planted truth")

    # ---- media_resize golden ---------------------------------------
    rz_truth = pa.table({
        "media_id": pa.array(mids, pa.int64()),
        "out_width": pa.array([16] * len(mids), pa.int32()),
        "out_height": pa.array([16] * len(mids), pa.int32()),
        "n_bytes": pa.array(
            [0 if m % 4 == 0 else BMP_16x16_BYTES for m in mids], pa.int64()),
        "ok": pa.array([m % 4 != 0 for m in mids], pa.bool_()),
    })
    got = ResizeMedia()(media)
    for i in range(len(mids)):
        ok = got["error"][i].as_py() is None
        nb = len(got["payload"][i].as_py() or b"")
        if ok != rz_truth["ok"][i].as_py() or nb != rz_truth["n_bytes"][i].as_py():
            fail(f"resize row {mids[i]}: ok={ok} n_bytes={nb} != planted")

    # ---- media_frames golden ---------------------------------------
    def truth_frames(mid: int) -> tuple[int, int, bool]:
        if mid % 4 != 0:
            return 0, 0, False
        n = wav_n_samples(mid)
        return 8000, len(range(0, max(n - 200 + 1, 1), 80)), True

    fr = [truth_frames(m) for m in mids]
    fr_truth = pa.table({
        "media_id": pa.array(mids, pa.int64()),
        "sample_rate": pa.array([t[0] for t in fr], pa.int32()),
        "n_frames": pa.array([t[1] for t in fr], pa.int64()),
        "ok": pa.array([t[2] for t in fr], pa.bool_()),
    })
    got = FrameSampleAudio()(media)
    for i in range(len(mids)):
        ok = got["error"][i].as_py() is None
        if (ok != fr[i][2] or got["sample_rate"][i].as_py() != fr[i][0]
                or got["n_frames"][i].as_py() != fr[i][1]):
            fail(f"frames row {mids[i]} != planted truth")

    # ---- media_phash_dedup golden ----------------------------------
    ph_truth = pa.table({
        "media_id": pa.array(range(N_IMAGES), pa.int64()),
        "root_id": pa.array(
            [m - m % 5 if m % 5 < 4 else m for m in range(N_IMAGES)],
            pa.int64()),
    })
    import ray
    import ray.data

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 log_to_driver=False)
    from kgrecrun.ops.media import phash_dedup

    corpus = ray.data.from_arrow(synth_image_corpus(range(N_IMAGES)))
    got_ph = {
        r["media_id"]: r["root_id"]
        for r in phash_dedup(corpus).take_all()
    }
    want_ph = dict(zip(ph_truth["media_id"].to_pylist(),
                       ph_truth["root_id"].to_pylist()))
    if got_ph != want_ph:
        diff = {k: (got_ph.get(k), want_ph[k])
                for k in want_ph if got_ph.get(k) != want_ph[k]}
        fail(f"phash labels != planted ({len(diff)} diffs): "
             f"{dict(list(diff.items())[:5])}")

    goldens = ROOT / "tests" / "goldens"
    for name, tbl in [("media_features_gold_sf001.parquet", feat_truth),
                      ("media_resize_gold_sf001.parquet", rz_truth),
                      ("media_frames_gold_sf001.parquet", fr_truth),
                      ("media_phash_gold_sf001.parquet", ph_truth)]:
        pq.write_table(tbl, str(goldens / name))
        print(f"wrote {goldens / name}: {tbl.num_rows} rows")
    ray.shutdown()


if __name__ == "__main__":
    main()
