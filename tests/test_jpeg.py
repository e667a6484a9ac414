"""JPEG codec tests (kgrecrun/ops/jpeg.py) — baseline + progressive.

JPEG is lossy, so round-trips bound pixel error rather than
byte-comparing: flat blocks quantize to pure DC and reconstruct
exactly; smooth content stays within a few grey levels at q>=90.
The progressive (SOF2) tests are stronger: both encoders share the
quantization pipeline, so progressive decode must match baseline
decode BIT-EXACTLY on every image. The decoder returns the luma (Y)
plane — the surface every media operator (features / resize / aHash)
consumes.
"""

import numpy as np
import pytest

from kgrecrun.ops.jpeg import (decode_jpeg, encode_jpeg,
                               encode_jpeg_progressive)


def _luma(rgb: np.ndarray) -> np.ndarray:
    r = rgb.astype(np.float64)
    return 0.299 * r[..., 0] + 0.587 * r[..., 1] + 0.114 * r[..., 2]


def test_flat_grayscale_roundtrip_exact():
    img = np.full((24, 32), 117, dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(img, quality=90))
    assert out.shape == (24, 32)
    assert int(np.abs(out.astype(int) - 117).max()) == 0


def test_gradient_roundtrip_tight():
    gy, gx = np.mgrid[0:37, 0:53]
    img = ((gy * 3 + gx * 2) % 256).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(img, quality=95))
    assert out.shape == img.shape  # odd dims crop back exactly
    # sawtooth wrap edges are sharp; bound the mean, not the max
    assert np.abs(out.astype(int) - img.astype(int)).mean() < 3.0


def test_block_texture_high_quality():
    rng = np.random.default_rng(11)
    # piecewise-constant 8x8 tiles: every block is pure DC
    tiles = rng.integers(0, 255, size=(5, 7), dtype=np.uint8)
    img = np.kron(tiles, np.ones((8, 8), dtype=np.uint8))
    out = decode_jpeg(encode_jpeg(img, quality=90))
    assert int(np.abs(out.astype(int) - img.astype(int)).max()) <= 1


def test_color_420_luma_close():
    gy, gx = np.mgrid[0:33, 0:45]
    rgb = np.stack([(gy * 5) % 256, (gx * 3) % 256,
                    ((gy + gx) * 2) % 256], axis=-1).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(rgb, quality=95, subsample=True))
    assert out.shape == (33, 45)
    assert np.abs(out.astype(float) - _luma(rgb)).mean() < 4.0


def test_color_444_luma_close():
    rng = np.random.default_rng(3)
    base = rng.integers(40, 200, size=(3, 4, 3))
    rgb = np.kron(base, np.ones((8, 8, 1))).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(rgb, quality=95, subsample=False))
    assert out.shape == (24, 32)
    assert np.abs(out.astype(float) - _luma(rgb)).max() <= 3.0


def test_restart_markers_resync():
    gy, gx = np.mgrid[0:40, 0:72]
    img = ((gy * 7 + gx) % 256).astype(np.uint8)
    plain = decode_jpeg(encode_jpeg(img, quality=92))
    rst = decode_jpeg(encode_jpeg(img, quality=92, restart_interval=3))
    # restart markers change framing, not content: identical reconstruction
    assert np.array_equal(plain, rst)


def test_quality_monotonic():
    gy, gx = np.mgrid[0:32, 0:32]
    img = (128 + 60 * np.sin(gy / 5.0) * np.cos(gx / 7.0)).astype(np.uint8)
    errs = []
    for q in (30, 60, 90):
        out = decode_jpeg(encode_jpeg(img, quality=q))
        errs.append(np.abs(out.astype(float) - img.astype(float)).mean())
    assert errs[0] >= errs[1] >= errs[2]


def test_lossless_and_garbage_rejected():
    img = np.full((8, 8), 100, dtype=np.uint8)
    enc = bytearray(encode_jpeg(img))
    sof = enc.find(b"\xff\xc0")
    enc[sof + 1] = 0xC3  # rewrite SOF0 -> SOF3 (lossless)
    with pytest.raises(NotImplementedError):
        decode_jpeg(bytes(enc))
    with pytest.raises(ValueError):
        decode_jpeg(b"\xff\xd8\xff\xe0....not-a-jpeg")
    with pytest.raises(ValueError):
        decode_jpeg(b"not even a jpeg")


# ------------------------------------------------- progressive (SOF2)
#
# The progressive encoder shares _prepare_planes with the baseline one,
# so both entropy layouts carry bit-identical quantized coefficients:
# the decoded luma planes must match EXACTLY, not within a lossy bound.
# The image set deliberately covers every T.81 G.2 entropy construct:
# flat image -> multi-block EOB runs with extension bits; noise at low
# quality -> dense coefficients, BR correction-bit buffering in
# refinement scans; sparse spikes on a flat field -> long zero runs
# (ZRL in both first and refinement passes, BE bits buffered behind
# EOBn); odd dims -> padded-grid vs unpadded-grid block iteration.

def _prog_images():
    gy, gx = np.mgrid[0:37, 0:53]
    grad = ((gy * 3 + gx * 2) % 256).astype(np.uint8)
    rng = np.random.default_rng(7)
    noise = rng.integers(0, 256, (41, 59)).astype(np.uint8)
    sparse = np.full((48, 64), 128, dtype=np.uint8)
    sparse[::7, ::9] = 255
    return [np.full((24, 32), 117, dtype=np.uint8), grad, noise, sparse]


@pytest.mark.parametrize("quality", [20, 30, 50, 90, 95])
def test_progressive_matches_baseline_exactly_gray(quality):
    for img in _prog_images():
        base = decode_jpeg(encode_jpeg(img, quality=quality))
        prog = decode_jpeg(encode_jpeg_progressive(img, quality=quality))
        assert np.array_equal(base, prog)


@pytest.mark.parametrize("subsample", [True, False])
def test_progressive_matches_baseline_exactly_color(subsample):
    gy, gx = np.mgrid[0:37, 0:53]
    rgb = np.stack([(gy * 5) % 256, (gx * 3) % 256,
                    ((gy + gx) * 2) % 256], axis=-1).astype(np.uint8)
    for q in (30, 60, 95):
        base = decode_jpeg(encode_jpeg(rgb, quality=q, subsample=subsample))
        prog = decode_jpeg(
            encode_jpeg_progressive(rgb, quality=q, subsample=subsample))
        assert np.array_equal(base, prog)


def test_progressive_restart_markers_resync():
    rng = np.random.default_rng(13)
    img = rng.integers(0, 256, (40, 72)).astype(np.uint8)
    plain = decode_jpeg(encode_jpeg_progressive(img, quality=80))
    for ri in (1, 2, 5):
        rst = decode_jpeg(
            encode_jpeg_progressive(img, quality=80, restart_interval=ri))
        assert np.array_equal(plain, rst)
    gy, gx = np.mgrid[0:33, 0:45]
    rgb = np.stack([(gy * 5) % 256, (gx * 3) % 256,
                    ((gy + gx) * 2) % 256], axis=-1).astype(np.uint8)
    assert np.array_equal(
        decode_jpeg(encode_jpeg_progressive(rgb, quality=85)),
        decode_jpeg(encode_jpeg_progressive(rgb, quality=85,
                                            restart_interval=3)))


def test_progressive_roundtrip_quality():
    """Sanity independent of the baseline path: progressive decode is
    close to the source image, and exact on a flat field."""
    flat = np.full((24, 32), 117, dtype=np.uint8)
    out = decode_jpeg(encode_jpeg_progressive(flat, quality=90))
    assert int(np.abs(out.astype(int) - 117).max()) == 0
    gy, gx = np.mgrid[0:37, 0:53]
    grad = ((gy * 3 + gx * 2) % 256).astype(np.uint8)
    out = decode_jpeg(encode_jpeg_progressive(grad, quality=95))
    assert out.shape == grad.shape
    assert np.abs(out.astype(int) - grad.astype(int)).mean() < 3.0


def test_media_stage_decodes_progressive_jpeg():
    from kgrecrun.ops.media import _decode_payload

    img = np.kron(np.arange(12, dtype=np.uint8).reshape(3, 4) * 20,
                  np.ones((8, 8), dtype=np.uint8))
    kind, arr = _decode_payload(encode_jpeg_progressive(img, quality=90))
    assert kind == "image"
    assert np.array_equal(arr, decode_jpeg(encode_jpeg(img, quality=90)))


def test_media_stage_decodes_jpeg():
    """End-to-end through the media decode stage (no Ray needed:
    _decode_payload is the per-row kernel)."""
    from kgrecrun.ops.media import _decode_payload

    img = np.kron(np.arange(12, dtype=np.uint8).reshape(3, 4) * 20,
                  np.ones((8, 8), dtype=np.uint8))
    kind, arr = _decode_payload(encode_jpeg(img, quality=90))
    assert kind == "image"
    assert arr.shape == img.shape
    assert int(np.abs(arr.astype(int) - img.astype(int)).max()) <= 1
