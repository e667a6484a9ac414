"""MinHash signatures and LSH band keys over character shingles.

Used for entity-name canonicalization blocking (kg.canon) and near-dup
document detection (ops.dedup). Permutations are the standard universal
family ``(a*h + b) mod p`` with a fixed seed; everything deterministic.
"""

from __future__ import annotations

import zlib

import numpy as np

from ..textnorm import ascii_words, normalize_ws

MERSENNE_P = (1 << 61) - 1


def shingles(text: str, k: int = 3) -> set[int]:
    """Character k-gram shingle hashes (crc32) of normalized text."""
    s = normalize_ws(text)
    if len(s) < k:
        return {zlib.crc32(s.encode("utf-8"))} if s else set()
    return {zlib.crc32(s[i:i + k].encode("utf-8")) for i in range(len(s) - k + 1)}


def _md5_64(s: str) -> int:
    """First 8 md5 bytes little-endian — DuckDB ``md5_number_upper``,
    so shingle hashes (and thus minhash signatures) are SQL-computable."""
    import hashlib

    return int.from_bytes(hashlib.md5(s.encode("utf-8")).digest()[:8], "little")


def word_shingles(text: str, k: int = 5) -> set[int]:
    """Word k-gram shingle hashes (64-bit md5) for document-level
    near-dup, tokenized on the ASCII/RE2 whitespace class so the
    minhash/jaccard oracle SQL (regexp_split_to_array '\\s+' +
    md5_number_upper) sees the same shingle sets."""
    words = ascii_words(text.lower())
    if len(words) < k:
        return {_md5_64(" ".join(words))} if words else set()
    return {
        _md5_64(" ".join(words[i:i + k]))
        for i in range(len(words) - k + 1)
    }


class MinHasher:
    """num_perm minhash functions; signature() maps a shingle set to a
    uint64 vector. Stateless after construction — build once per actor."""

    def __init__(self, num_perm: int = 64, seed: int = 7):
        rng = np.random.RandomState(seed)
        self.num_perm = num_perm
        self.a = rng.randint(1, MERSENNE_P, size=num_perm, dtype=np.uint64)
        self.b = rng.randint(0, MERSENNE_P, size=num_perm, dtype=np.uint64)

    def signature(self, shingle_set: set[int]) -> np.ndarray:
        if not shingle_set:
            return np.full(self.num_perm, np.iinfo(np.uint64).max, dtype=np.uint64)
        h = np.fromiter(shingle_set, dtype=np.uint64, count=len(shingle_set))
        # (a*h + b) mod p, vectorized over perms × shingles
        vals = (np.outer(self.a, h) + self.b[:, None]) % MERSENNE_P
        return vals.min(axis=1)

    def band_keys(self, sig: np.ndarray, bands: int) -> list[int]:
        """Split the signature into `bands` rows-per-band groups and hash
        each band → the LSH blocking keys. Collision probability for a
        pair with jaccard j is 1-(1-j^r)^b."""
        r = self.num_perm // bands
        keys = []
        for b in range(bands):
            band = sig[b * r:(b + 1) * r]
            keys.append(zlib.crc32(bytes([b]) + band.tobytes()))
        return keys


def jaccard(a: set[int], b: set[int]) -> float:
    if not a and not b:
        return 1.0
    inter = len(a & b)
    return inter / (len(a) + len(b) - inter)
