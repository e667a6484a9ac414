"""Multimodal columns: image/audio payloads as opaque ``binary`` columns
with typed metadata, processed by actor-pool ``map_batches`` stages.

The container has no image/audio codecs, so DECODING REAL FORMATS IS
STUBBED: :class:`DecodeMedia` fully supports a deterministic synthetic
format (``FAKEIMG``/``FAKEAUD``, produced by :func:`synth_media_batch`)
and raises ``NotImplementedError`` for real formats (JPEG/PNG/WAV…) —
the Ray-side plumbing (schema, batch sizing for wide binary payloads,
actor construction, output layout) is real and tested, and a production
deployment swaps the decoder body for PIL/ffmpeg.

media schema: (media_id int64, kind string, payload binary,
               width int32, height int32, sample_rate int32, url string)
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

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


def synth_media_batch(media_ids, seed: int = 42) -> pa.Table:
    """Deterministic synthetic media rows (images ~2/3, audio ~1/3)."""
    rows = []
    for mid in media_ids:
        mid = int(mid)
        rng = np.random.RandomState((seed * 1_000_003 + mid) % (2**31))
        if mid % 3 != 0:
            w, h = int(rng.randint(16, 64)), int(rng.randint(16, 64))
            pixels = rng.randint(0, 256, size=w * h, dtype=np.uint8).tobytes()
            payload = _IMG_MAGIC + w.to_bytes(4, "little") + h.to_bytes(4, "little") + pixels
            rows.append(
                dict(media_id=mid, kind="image", payload=payload, width=w, height=h,
                     sample_rate=0, url=f"https://media.example/img/{mid}.fimg")
            )
        else:
            sr = 8000
            n = int(rng.randint(800, 4000))
            samples = rng.randint(-(2**15), 2**15, size=n, dtype=np.int16).tobytes()
            payload = _AUD_MAGIC + sr.to_bytes(4, "little") + n.to_bytes(4, "little") + samples
            rows.append(
                dict(media_id=mid, kind="audio", payload=payload, width=0, height=0,
                     sample_rate=sr, url=f"https://media.example/aud/{mid}.faud")
            )
    return pa.Table.from_pylist(rows, schema=MEDIA_SCHEMA)


def _decode_payload(payload: bytes):
    """→ (kind, np.ndarray). Real codecs are unavailable here — stub."""
    if payload[:8] == _IMG_MAGIC:
        w = int.from_bytes(payload[8:12], "little")
        h = int.from_bytes(payload[12:16], "little")
        return "image", np.frombuffer(payload[16:16 + w * h], dtype=np.uint8).reshape(h, w)
    if payload[:8] == _AUD_MAGIC:
        n = int.from_bytes(payload[12:16], "little")
        return "audio", np.frombuffer(payload[16:16 + 2 * n], dtype=np.int16)
    raise NotImplementedError(
        "real image/audio codecs are not available in this environment; "
        "only the FAKEIMG1/FAKEAUD1 synthetic formats decode (swap this "
        "body for PIL/ffmpeg in production)"
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
            h, w = arr.shape
            gh, gw = 8, 8
            out = np.zeros((gh, gw), dtype=np.float64)
            for i in range(gh):
                for j in range(gw):
                    cell = arr[i * h // gh:(i + 1) * h // gh, j * w // gw:(j + 1) * w // gw]
                    out[i, j] = float(cell.mean()) if cell.size else 0.0
            return out.ravel()
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
            except NotImplementedError as exc:
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
