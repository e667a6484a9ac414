"""Multimodal columns: image/audio payloads as opaque ``binary`` columns
with typed metadata, processed by actor-pool ``map_batches`` stages.

REAL codecs, stdlib/numpy-only: uncompressed 24-bit **BMP** images
(struct header parse, bottom-up rows, 4-byte row padding), 8-bit
grayscale **PNG** (zlib inflate + all five filter types), baseline
and progressive **JPEG** (ops/jpeg.py: Huffman + dequant + vectorized
IDCT, SOF2 successive-approximation scans; luma plane out — the
dominant web image format) and PCM-16 mono **WAV** audio (``wave``
module) decode genuinely — no PIL/ffmpeg in this container. The legacy
deterministic synthetic formats (``FAKEIMG``/``FAKEAUD``) still decode,
and anything else (lossless/arithmetic JPEG, MP3, …) raises
``NotImplementedError`` into the per-row ``error`` column — the
documented seam where a production deployment plugs PIL/ffmpeg.

media schema: (media_id int64, kind string, payload binary,
               width int32, height int32, sample_rate int32, url string)
"""

from __future__ import annotations

import hashlib
import io
import struct
import wave

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),
        ("payload", pa.large_binary()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("sample_rate", pa.int32()),
        ("url", pa.string()),
    ]
)

_IMG_MAGIC = b"FAKEIMG1"
_AUD_MAGIC = b"FAKEAUD1"


# ---------------------------------------------------------------- BMP

def encode_bmp(gray: np.ndarray) -> bytes:
    """Grayscale (h, w) uint8 → uncompressed 24-bit BMP (r=g=b),
    bottom-up rows, 4-byte-padded — a fully standards-compliant file."""
    h, w = gray.shape
    row_bytes = (w * 3 + 3) // 4 * 4
    img_size = row_bytes * h
    data_off = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", data_off + img_size, 0, 0, data_off)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0)
    rows = []
    for y in range(h - 1, -1, -1):  # bottom-up
        line = np.repeat(gray[y], 3).tobytes()  # b=g=r
        rows.append(line + b"\x00" * (row_bytes - len(line)))
    return header + info + b"".join(rows)


def decode_bmp(payload: bytes) -> np.ndarray:
    """Uncompressed 24-bit BI_RGB BMP → grayscale (h, w) uint8 (channel
    mean). Handles bottom-up AND top-down (negative height) layouts and
    row padding."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_off = struct.unpack_from("<I", payload, 10)[0]
    w, h = struct.unpack_from("<ii", payload, 18)
    bpp, comp = struct.unpack_from("<HI", payload, 28)
    if bpp != 24 or comp != 0:
        raise NotImplementedError(f"only uncompressed 24-bit BMP decodes (got {bpp}bpp comp={comp})")
    ah = abs(h)
    row_bytes = (w * 3 + 3) // 4 * 4
    raw = np.frombuffer(payload, dtype=np.uint8, offset=data_off, count=row_bytes * ah)
    px = raw.reshape(ah, row_bytes)[:, : w * 3].reshape(ah, w, 3)
    if h > 0:
        px = px[::-1]
    return px.mean(axis=2).astype(np.uint8)


# ---------------------------------------------------------------- PNG

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def _png_chunk(tag: bytes, body: bytes) -> bytes:
    import zlib

    return (struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF))


def encode_png(gray: np.ndarray, *, filter_type: int = 0) -> bytes:
    """Grayscale (h, w) uint8 → standards-compliant 8-bit grayscale PNG
    (color type 0, non-interlaced), stdlib zlib only. ``filter_type``
    selects the per-row filter (0=None 1=Sub 2=Up 3=Average 4=Paeth) —
    all five produce valid files; tests use them to exercise every
    decoder unfilter path."""
    import zlib

    h, w = gray.shape
    g = np.ascontiguousarray(gray, dtype=np.uint8)
    raw = bytearray()
    prior = np.zeros(w, dtype=np.uint8)
    for y in range(h):
        row = g[y]
        if filter_type == 0:
            filt = row
        elif filter_type == 1:
            left = np.concatenate(([0], row[:-1])).astype(np.uint8)
            filt = (row.astype(np.int16) - left) % 256
        elif filter_type == 2:
            filt = (row.astype(np.int16) - prior) % 256
        elif filter_type == 3:
            left = np.concatenate(([0], row[:-1])).astype(np.int16)
            filt = (row.astype(np.int16)
                    - (left + prior.astype(np.int16)) // 2) % 256
        elif filter_type == 4:
            out = np.empty(w, dtype=np.uint8)
            for x in range(w):
                a = int(row[x - 1]) if x else 0
                b = int(prior[x])
                c = int(prior[x - 1]) if x else 0
                p = a + b - c
                pa_, pb, pc_ = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa_ <= pb and pa_ <= pc_) else (
                    b if pb <= pc_ else c)
                out[x] = (int(row[x]) - pred) % 256
            filt = out
        else:
            raise ValueError(f"bad filter type {filter_type}")
        raw.append(filter_type)
        raw.extend(np.asarray(filt, dtype=np.uint8).tobytes())
        prior = row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    return (_PNG_MAGIC + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
            + _png_chunk(b"IEND", b""))


def decode_png(payload: bytes) -> np.ndarray:
    """8-bit non-interlaced PNG (grayscale / RGB / gray+alpha / RGBA,
    color types 0/2/4/6) → grayscale (h, w) uint8 (color-channel mean,
    alpha dropped — the BMP convention). Implements all five PNG row
    filters with stdlib zlib inflate; palette (type 3), 16-bit and
    interlaced files raise into the error column."""
    import zlib

    if payload[:8] != _PNG_MAGIC:
        raise ValueError("not a PNG payload")
    pos = 8
    w = h = None
    color_type = bit_depth = interlace = None
    idat = bytearray()
    while pos + 8 <= len(payload):
        ln, tag = struct.unpack_from(">I4s", payload, pos)
        body = payload[pos + 8: pos + 8 + ln]
        pos += 12 + ln
        if tag == b"IHDR":
            w, h, bit_depth, color_type, _, _, interlace = struct.unpack(
                ">IIBBBBB", body)
        elif tag == b"IDAT":
            idat.extend(body)
        elif tag == b"IEND":
            break
    if w is None:
        raise ValueError("PNG missing IHDR")
    if bit_depth != 8 or interlace != 0 or color_type not in (0, 2, 4, 6):
        raise NotImplementedError(
            f"only 8-bit non-interlaced gray/RGB(A) PNG decodes "
            f"(depth={bit_depth} color={color_type} interlace={interlace})")
    channels = {0: 1, 2: 3, 4: 2, 6: 4}[color_type]
    bpp = channels  # 8-bit: bytes per pixel == channels
    stride = w * bpp
    raw = zlib.decompress(bytes(idat))
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG data length mismatch")
    out = np.zeros((h, stride), dtype=np.uint8)
    prior = np.zeros(stride, dtype=np.int16)
    for y in range(h):
        ft = raw[y * (stride + 1)]
        row = np.frombuffer(raw, dtype=np.uint8,
                            offset=y * (stride + 1) + 1,
                            count=stride).astype(np.int16)
        if ft == 0:
            rec = row
        elif ft == 2:
            rec = (row + prior) % 256
        elif ft == 1:
            # Sub filter: rec[x] = row[x] + rec[x-bpp] — a per-lane
            # prefix sum mod 256, vectorized (the only sequential
            # unfilter paths left are Average/Paeth below)
            rec = (np.cumsum(row.reshape(-1, bpp), axis=0, dtype=np.int64)
                   % 256).ravel().astype(np.int16)
        elif ft in (3, 4):
            # Average/Paeth are sequential in x by definition; run the
            # scalar chain over plain Python ints (lists), ~4x faster
            # than per-element numpy indexing
            row_l = row.tolist()
            prior_l = prior.tolist()
            rec_l = [0] * stride
            if ft == 3:
                for x in range(stride):
                    a = rec_l[x - bpp] if x >= bpp else 0
                    rec_l[x] = (row_l[x] + (a + prior_l[x]) // 2) % 256
            else:  # paeth
                for x in range(stride):
                    a = rec_l[x - bpp] if x >= bpp else 0
                    b = prior_l[x]
                    c = prior_l[x - bpp] if x >= bpp else 0
                    p = a + b - c
                    pa_, pb, pc_ = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa_ <= pb and pa_ <= pc_) else (
                        b if pb <= pc_ else c)
                    rec_l[x] = (row_l[x] + pred) % 256
            rec = np.array(rec_l, dtype=np.int16)
        else:
            raise ValueError(f"bad PNG filter byte {ft}")
        out[y] = rec.astype(np.uint8)
        prior = rec
    px = out.reshape(h, w, bpp)
    color = px[:, :, :3] if color_type in (2, 6) else px[:, :, :1]
    return color.mean(axis=2).astype(np.uint8)


# ---------------------------------------------------------------- WAV

def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """int16 mono samples → PCM-16 WAV bytes (stdlib ``wave``)."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(np.asarray(samples, dtype=np.int16).tobytes())
    return buf.getvalue()


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """PCM-16 mono WAV → (int16 samples, sample_rate)."""
    with wave.open(io.BytesIO(payload)) as w:
        if w.getsampwidth() != 2 or w.getnchannels() != 1:
            raise NotImplementedError(
                f"only PCM-16 mono WAV decodes (got width={w.getsampwidth()} "
                f"channels={w.getnchannels()})"
            )
        sr = w.getframerate()
        data = np.frombuffer(w.readframes(w.getnframes()), dtype=np.int16)
    return data, sr


# ------------------------------------------------------------ synthesis

def synth_media_batch(media_ids, seed: int = 42) -> pa.Table:
    """Deterministic synthetic media rows: real PCM WAV audio, real BMP
    images, real 8-bit PNG images (cycling through all five row
    filters), and the legacy FAKEIMG format (kept to exercise the
    non-standard-container path) — one quarter each by id."""
    rows = []
    for mid in media_ids:
        mid = int(mid)
        rng = np.random.RandomState((seed * 1_000_003 + mid) % (2**31))
        which = mid % 4
        if which == 0:
            sr = 8000
            n = int(rng.randint(800, 4000))
            samples = rng.randint(-(2**15), 2**15, size=n, dtype=np.int16)
            payload = encode_wav(samples, sr)
            rows.append(
                dict(media_id=mid, kind="audio", payload=payload, width=0, height=0,
                     sample_rate=sr, url=f"https://media.example/aud/{mid}.wav")
            )
        elif which == 1:
            w, h = int(rng.randint(16, 64)), int(rng.randint(16, 64))
            gray = rng.randint(0, 256, size=(h, w), dtype=np.uint8)
            payload = encode_bmp(gray)
            rows.append(
                dict(media_id=mid, kind="image", payload=payload, width=w, height=h,
                     sample_rate=0, url=f"https://media.example/img/{mid}.bmp")
            )
        elif which == 2:
            w, h = int(rng.randint(16, 64)), int(rng.randint(16, 64))
            gray = rng.randint(0, 256, size=(h, w), dtype=np.uint8)
            payload = encode_png(gray, filter_type=(mid // 4) % 5)
            rows.append(
                dict(media_id=mid, kind="image", payload=payload, width=w, height=h,
                     sample_rate=0, url=f"https://media.example/img/{mid}.png")
            )
        else:
            w, h = int(rng.randint(16, 64)), int(rng.randint(16, 64))
            pixels = rng.randint(0, 256, size=w * h, dtype=np.uint8).tobytes()
            payload = _IMG_MAGIC + w.to_bytes(4, "little") + h.to_bytes(4, "little") + pixels
            rows.append(
                dict(media_id=mid, kind="image", payload=payload, width=w, height=h,
                     sample_rate=0, url=f"https://media.example/img/{mid}.fimg")
            )
    return pa.Table.from_pylist(rows, schema=MEDIA_SCHEMA)


def _decode_payload(payload: bytes):
    """→ (kind, np.ndarray). BMP/WAV decode for real; unknown containers
    raise into the error column."""
    if payload[:2] == b"BM":
        return "image", decode_bmp(payload)
    if payload[:2] == b"\xff\xd8":
        from .jpeg import decode_jpeg

        return "image", decode_jpeg(payload)
    if payload[:8] == _PNG_MAGIC:
        return "image", decode_png(payload)
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return "audio", decode_wav(payload)[0]
    if payload[:8] == _IMG_MAGIC:
        w = int.from_bytes(payload[8:12], "little")
        h = int.from_bytes(payload[12:16], "little")
        return "image", np.frombuffer(payload[16:16 + w * h], dtype=np.uint8).reshape(h, w)
    if payload[:8] == _AUD_MAGIC:
        n = int.from_bytes(payload[12:16], "little")
        return "audio", np.frombuffer(payload[16:16 + 2 * n], dtype=np.int16)
    raise NotImplementedError(
        "no codec for this container (BMP, 8-bit PNG, baseline/"
        "progressive JPEG and PCM WAV decode natively; MP3 / exotic "
        "JPEG modes need PIL/ffmpeg — plug them in here in production)"
    )


class DecodeMedia:
    """Actor-pool decode + feature stage. Per-row failures land in an
    ``error`` column (same policy as extraction). Features: 8×8
    mean-pooled grid for images, 64-bin mean-abs frames for audio —
    both deterministic, both 64-dim."""

    def __init__(self, feature_dim: int = 64):
        self.feature_dim = feature_dim

    def _features(self, kind: str, arr: np.ndarray) -> np.ndarray:
        if kind == "image":
            return mean_pool(arr, 8, 8).ravel()
        frames = np.array_split(np.abs(arr.astype(np.float64)), self.feature_dim)
        return np.array([f.mean() if len(f) else 0.0 for f in frames])

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, kinds, feats, checksums, errors = [], [], [], [], []
        for i in range(batch.num_rows):
            mid = batch["media_id"][i].as_py()
            payload = batch["payload"][i].as_py()
            try:
                kind, arr = _decode_payload(payload)
                feat = self._features(kind, arr)
                ids.append(mid)
                kinds.append(kind)
                feats.append(feat.tolist())
                checksums.append(hashlib.md5(payload).hexdigest())
                errors.append(None)
            except (NotImplementedError, ValueError, EOFError, IndexError,
                    wave.Error, struct.error) as exc:
                ids.append(mid)
                kinds.append("unknown")
                feats.append([0.0] * self.feature_dim)
                checksums.append(hashlib.md5(payload).hexdigest())
                errors.append(str(exc)[:200])
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "kind": pa.array(kinds, pa.string()),
                "features": pa.array(feats, pa.list_(pa.float64())),
                "checksum": pa.array(checksums, pa.string()),
                "error": pa.array(errors, pa.string()),
            }
        )


def decode_media(media_ds, *, concurrency=(1, 4), batch_size: int = 32):
    """Wide binary payloads → SMALL batch size so batch × concurrency
    stays within worker heap (SURVEY.md §7.4 / memory-aware sizing)."""
    return media_ds.map_batches(
        DecodeMedia,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency,
    )


def mean_pool(arr: np.ndarray, gh: int, gw: int) -> np.ndarray:
    """Area-mean downsample of a 2-D array to (gh, gw) — each output
    cell is the mean of its source tile (edges absorb the remainder).
    Divisible shapes take a single vectorized reshape-reduce (identical
    values: integer sums < 2^53 are exact in float64 regardless of
    reduction order); ragged shapes keep the tile loop."""
    h, w = arr.shape
    if h >= gh and w >= gw and h % gh == 0 and w % gw == 0:
        return (arr.astype(np.float64)
                .reshape(gh, h // gh, gw, w // gw).mean(axis=(1, 3)))
    out = np.zeros((gh, gw), dtype=np.float64)
    for i in range(gh):
        for j in range(gw):
            cell = arr[i * h // gh:(i + 1) * h // gh, j * w // gw:(j + 1) * w // gw]
            out[i, j] = float(cell.mean()) if cell.size else 0.0
    return out


class ResizeMedia:
    """Actor-pool image resize: decode (BMP / legacy FAKEIMG) →
    area-mean downsample to ``(out_h, out_w)`` → re-encode as a real
    BMP. Audio rows and undecodable containers land in ``error`` with
    the row preserved (same policy as DecodeMedia)."""

    def __init__(self, out_w: int = 16, out_h: int = 16):
        self.out_w, self.out_h = out_w, out_h

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, payloads, errors = [], [], []
        for i in range(batch.num_rows):
            ids.append(batch["media_id"][i].as_py())
            try:
                kind, arr = _decode_payload(batch["payload"][i].as_py())
                if kind != "image":
                    raise NotImplementedError("resize applies to images only")
                small = mean_pool(arr, self.out_h, self.out_w)
                payloads.append(encode_bmp(np.clip(np.rint(small), 0, 255).astype(np.uint8)))
                errors.append(None)
            except Exception as e:  # noqa: BLE001 — per-row error column
                payloads.append(None)
                errors.append(f"{type(e).__name__}: {e}")
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "payload": pa.array(payloads, pa.large_binary()),
                "out_width": pa.array([self.out_w] * len(ids), pa.int32()),
                "out_height": pa.array([self.out_h] * len(ids), pa.int32()),
                "error": pa.array(errors, pa.string()),
            }
        )


class FrameSampleAudio:
    """Actor-pool audio frame sampling: decode PCM WAV → fixed-length
    frames (``frame_ms`` window, ``hop_ms`` hop) → per-frame RMS energy
    (list<float>). Image rows land in ``error``; short clips yield the
    frames they can."""

    def __init__(self, frame_ms: int = 25, hop_ms: int = 10):
        self.frame_ms, self.hop_ms = frame_ms, hop_ms

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, srs, n_frames, energies, errors = [], [], [], [], []
        for i in range(batch.num_rows):
            ids.append(batch["media_id"][i].as_py())
            try:
                payload = batch["payload"][i].as_py()
                if not (payload[:4] == b"RIFF" and payload[8:12] == b"WAVE"):
                    if payload[:8] == _AUD_MAGIC:
                        sr = int.from_bytes(payload[8:12], "little")
                        n = int.from_bytes(payload[12:16], "little")
                        samples = np.frombuffer(payload[16:16 + 2 * n], dtype=np.int16)
                    else:
                        raise NotImplementedError("frame sampling applies to audio only")
                else:
                    samples, sr = decode_wav(payload)
                flen = max(1, sr * self.frame_ms // 1000)
                hop = max(1, sr * self.hop_ms // 1000)
                starts = np.arange(0, max(len(samples) - flen + 1, 1), hop)
                x = samples.astype(np.float64)
                rms = [
                    float(np.sqrt(np.mean(x[s:s + flen] ** 2))) if len(x[s:s + flen]) else 0.0
                    for s in starts
                ]
                srs.append(sr)
                n_frames.append(len(rms))
                energies.append(rms)
                errors.append(None)
            except Exception as e:  # noqa: BLE001
                srs.append(0)
                n_frames.append(0)
                energies.append(None)
                errors.append(f"{type(e).__name__}: {e}")
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "sample_rate": pa.array(srs, pa.int32()),
                "n_frames": pa.array(n_frames, pa.int64()),
                "frame_rms": pa.array(energies, pa.list_(pa.float64())),
                "error": pa.array(errors, pa.string()),
            }
        )


def is_dup_group(group_no: int, frac: float) -> bool:
    """Deterministic md5 Bernoulli gate: group ``group_no`` carries
    planted duplicates iff its hash lands under ``frac`` (stride-proof,
    unlike multiplicative hashing of sequential ids)."""
    if frac >= 1.0:
        return True
    h = int.from_bytes(hashlib.md5(f"g{group_no}".encode()).digest()[:8],
                       "little")
    return (h % 10_000) < int(frac * 10_000)


# ---------------------------------------------------- perceptual hash

def ahash64(gray: np.ndarray, grid: int = 8) -> int:
    """Average-hash: mean-pool to ``grid``×``grid``, set bit i when
    cell i exceeds the grid mean. On integer pixels every pooled mean
    and the grid mean are exact dyadic floats, so the hash is EXACTLY
    invariant to (a) container swaps (BMP↔PNG of identical pixels),
    (b) global brightness shifts that stay in range (cells and the
    mean shift together), and (c) integer upscaling (np.repeat tiles
    pool to identical means) — the three planted-duplicate classes the
    tests verify. Near-identical images differ in few bits → hamming
    banding finds them."""
    cells = mean_pool(gray, grid, grid).ravel()
    mean = float(cells.mean())
    h = 0
    for i, c in enumerate(cells):
        if c > mean:
            h |= 1 << i
    return h


class PhashMedia:
    """Actor-pool perceptual-hash stage: decode (BMP/PNG/legacy) →
    64-bit average-hash. Audio and undecodable rows land in ``error``
    with the row preserved (the shared media error-column policy)."""

    def __init__(self, grid: int = 8):
        self.grid = grid

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, hashes, errors = [], [], []
        for i in range(batch.num_rows):
            ids.append(batch["media_id"][i].as_py())
            try:
                kind, arr = _decode_payload(batch["payload"][i].as_py())
                if kind != "image":
                    raise NotImplementedError("phash applies to images only")
                hashes.append(ahash64(arr, self.grid))
                errors.append(None)
            except Exception as e:  # noqa: BLE001 — per-row error column
                hashes.append(0)
                errors.append(f"{type(e).__name__}: {e}")
        return pa.table({
            "media_id": pa.array(ids, pa.int64()),
            "phash": pa.array(hashes, pa.uint64()),
            "error": pa.array(errors, pa.string()),
        })


def phash_dedup(media_ds, *, max_hamming: int = 3, window: int = 64,
                concurrency=None, batch_size: int = 32):
    """Image NEAR-DUPLICATE detection by perceptual hash — the
    multimodal twin of ``simhash_dedup``: an actor-pool decode+hash
    stage (binary payloads never shuffle; the 8-byte phash does), then
    the shared 4×16-bit pigeonhole banding (any pair within hamming 3
    shares a band), bucketed window-sweep verification with vectorized
    XOR+popcount, and the CC label apply. Output: (media_id, root_id)
    for every decodable image row.
    """
    from .dedup import _cluster_and_apply, _popcount64, _sweep_edges

    if concurrency is None:
        # The stdlib codecs have TRIVIAL per-worker init, so the
        # elastic task pool beats an actor pool outright (measured at
        # 300k images / 32 cpus: 63k img/s tasks vs 29k pinned actors
        # vs 16k autoscaling actors — pool ramp-up is pure cost when
        # __init__ is free). Pass concurrency=N to get the actor pool
        # back for codecs with real setup (PIL/ffmpeg/model weights).
        ph = PhashMedia()
        hashed = media_ds.map_batches(
            lambda b: ph(b), batch_format="pyarrow", zero_copy_batch=True,
            batch_size=batch_size,
        )
    else:
        hashed = media_ds.map_batches(
            PhashMedia, batch_format="pyarrow", zero_copy_batch=True,
            batch_size=batch_size, concurrency=concurrency,
        )

    def ok_rows(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.is_null(batch["error"]))
        return pa.table({"media_id": t["media_id"], "phash": t["phash"]})

    # materialize the NARROW (media_id, phash) table: it feeds both the
    # banding and the final label apply — without this the actor-pool
    # decode stage would execute twice (16 B/row in the object store vs
    # re-decoding every payload; same pattern as ngram_jaccard's
    # sketched.materialize())
    imgs = hashed.map_batches(ok_rows, batch_format="pyarrow",
                              zero_copy_batch=True).materialize()

    def to_bands(batch: pa.Table) -> pa.Table:
        ph = batch["phash"].combine_chunks().to_numpy(zero_copy_only=False)
        ids = batch["media_id"].combine_chunks().to_numpy(zero_copy_only=False)
        keys, out_ids, out_ph = [], [], []
        for b in range(4):
            band = ((ph >> np.uint64(16 * b)) & np.uint64(0xFFFF)).astype(np.int64)
            keys.append(band + (b << 16))
            out_ids.append(ids)
            out_ph.append(ph)
        return pa.table({
            "band_key": pa.array(np.concatenate(keys), pa.int64()),
            "doc_id": pa.array(np.concatenate(out_ids), pa.int64()),
            "phash": pa.array(np.concatenate(out_ph), pa.uint64()),
        })

    def hamming_mask(g: pa.Table, lo: np.ndarray, hi: np.ndarray) -> np.ndarray:
        hs = g["phash"].combine_chunks().to_numpy(zero_copy_only=False)
        return _popcount64(hs[lo] ^ hs[hi]) <= max_hamming

    banded = imgs.map_batches(to_bands, batch_format="pyarrow",
                              zero_copy_batch=True)
    edges = _sweep_edges(banded, window=window, id_type=pa.int64(),
                         pair_mask_fn=hamming_mask)
    return _cluster_and_apply(imgs, edges, "media_id")


def synth_image_corpus(media_ids, seed: int = 7,
                       dup_groups_frac: float = 1.0) -> pa.Table:
    """Deterministic image corpus with PLANTED near-duplicate groups
    for phash-dedup tests/queries: ids come in groups of 5 sharing
    ``base = id - id % 5``. id%5==0 is the base 32×32 gray as BMP;
    1 = the SAME pixels as PNG (container swap); 2 = brightness +3 BMP
    (pixel range 10..245 keeps the shift clip-free); 3 = exact 2×
    upscale as PNG; 4 = an INDEPENDENT random image (negative
    control). Ground-truth cluster root for id%5∈{0..3} is the base
    id; id%5==4 is a singleton.

    ``dup_groups_frac`` < 1 demotes all but an md5-selected fraction of
    groups to all-independent images (every member a singleton) — the
    realistic few-percent-duplicates regime for scale tests; see
    :func:`is_dup_group`."""
    rows = []
    for mid in media_ids:
        mid = int(mid)
        base = mid - mid % 5
        if not is_dup_group(base // 5, dup_groups_frac):
            rng2 = np.random.RandomState((seed * 3_000_017 + mid) % (2**31))
            payload = encode_bmp(
                rng2.randint(10, 246, size=(32, 32)).astype(np.uint8))
            rows.append(dict(
                media_id=mid, kind="image", payload=payload, width=32,
                height=32, sample_rate=0,
                url=f"https://media.example/img/{mid}"))
            continue
        rng = np.random.RandomState((seed * 2_000_003 + base) % (2**31))
        gray = rng.randint(10, 246, size=(32, 32)).astype(np.uint8)
        which = mid % 5
        if which == 0:
            payload = encode_bmp(gray)
        elif which == 1:
            payload = encode_png(gray, filter_type=(mid // 5) % 5)
        elif which == 2:
            payload = encode_bmp(gray + 3)
        elif which == 3:
            payload = encode_png(np.repeat(np.repeat(gray, 2, 0), 2, 1),
                                 filter_type=(mid // 5 + 1) % 5)
        else:
            rng2 = np.random.RandomState((seed * 3_000_017 + mid) % (2**31))
            payload = encode_bmp(rng2.randint(10, 246, size=(32, 32)).astype(np.uint8))
        h, w = (64, 64) if which == 3 else (32, 32)
        rows.append(dict(
            media_id=mid, kind="image", payload=payload, width=w, height=h,
            sample_rate=0, url=f"https://media.example/img/{mid}"))
    return pa.Table.from_pylist(rows, schema=MEDIA_SCHEMA)


def phash_topk(media_ds, *, probe_ids, k: int = 5, batch_size: int = 64):
    """Similar-image SEARCH (the image twin of ops/ann.py's brute-force
    top-k): decode+hash every image once (elastic task pool), broadcast
    the probes' 64-bit hashes, compute per-batch hamming distances with
    one vectorized XOR+popcount (|batch|×|probes| matrix), keep a local
    top-k per probe per block, and elect the global top-k in a
    single-task reduce over the tiny (probes × k × blocks) candidate
    set. Probes excluded from their own results; deterministic
    (distance, media_id) tie order. Output: (probe_id, media_id,
    hamming, rank). Probe count is caller-bounded (they broadcast);
    corpus-scale probe sets want the banded phash_dedup blocking
    instead."""
    import ray
    import ray.data

    from .dedup import _popcount64

    ph = PhashMedia()
    hashed = media_ds.map_batches(
        lambda b: ph(b), batch_format="pyarrow", zero_copy_batch=True,
        batch_size=batch_size,
    )

    def ok_rows(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as _pc

        t = batch.filter(_pc.is_null(batch["error"]))
        return pa.table({"media_id": t["media_id"], "phash": t["phash"]})

    imgs = hashed.map_batches(ok_rows, batch_format="pyarrow",
                              zero_copy_batch=True).materialize()

    probe_set = sorted(int(p) for p in probe_ids)

    def probe_rows(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as _pc

        return batch.filter(_pc.is_in(
            batch["media_id"], value_set=pa.array(probe_set, pa.int64())))

    probe_parts = [t for t in ray.get(
        imgs.map_batches(probe_rows, batch_format="pyarrow")
        .to_arrow_refs())
        if t.num_columns > 0 and t.num_rows > 0]
    if not probe_parts:  # no probe decoded — empty result, not a crash
        return ray.data.from_arrow(pa.table({
            "probe_id": pa.array([], pa.int64()),
            "media_id": pa.array([], pa.int64()),
            "hamming": pa.array([], pa.int64()),
            "rank": pa.array([], pa.int64()),
        }))
    probe_tbl = pa.concat_tables(probe_parts)
    p_ids = probe_tbl["media_id"].to_numpy(zero_copy_only=False)
    p_hash = probe_tbl["phash"].to_numpy(zero_copy_only=False)

    def local_topk(batch: pa.Table) -> pa.Table:
        ids = batch["media_id"].combine_chunks().to_numpy(zero_copy_only=False)
        hs = batch["phash"].combine_chunks().to_numpy(zero_copy_only=False)
        out_p, out_m, out_d = [], [], []
        for pid, phv in zip(p_ids, p_hash):
            d = _popcount64(hs ^ phv)
            mask = ids != pid  # self excluded
            cand_d, cand_i = d[mask], ids[mask]
            if not len(cand_d):
                continue
            order = np.lexsort((cand_i, cand_d))[:k]
            out_p.extend([int(pid)] * len(order))
            out_m.extend(cand_i[order].tolist())
            out_d.extend(cand_d[order].astype(np.int64).tolist())
        return pa.table({
            "probe_id": pa.array(out_p, pa.int64()),
            "media_id": pa.array(out_m, pa.int64()),
            "hamming": pa.array(out_d, pa.int64()),
        })

    def global_topk(batch: pa.Table) -> pa.Table:
        order = pc.sort_indices(batch, sort_keys=[
            ("probe_id", "ascending"), ("hamming", "ascending"),
            ("media_id", "ascending")])
        t = batch.take(order)
        pidv = t["probe_id"].combine_chunks().to_numpy(zero_copy_only=False)
        n = len(pidv)
        new = np.ones(n, dtype=bool)
        new[1:] = pidv[1:] != pidv[:-1]
        seg = np.arange(n) - np.maximum.accumulate(
            np.where(new, np.arange(n), 0))
        keep = seg < k
        t = t.filter(pa.array(keep))
        return t.append_column("rank", pa.array(
            (seg[keep] + 1).astype(np.int64), pa.int64()))

    return (imgs.map_batches(local_topk, batch_format="pyarrow",
                             zero_copy_batch=True)
            .repartition(1)
            .map_batches(global_topk, batch_format="pyarrow",
                         batch_size=None))
