"""Entity linking: candidate generation from the broadcast alias
dictionary + deterministic hash-embedding cosine scoring.

The embedding is a character-3-gram feature-hashing vector (crc32 →
bucket, L2-normalized): fully deterministic, no model weights, cheap to
vectorize — a stand-in with the same data-flow shape as a learned
encoder (the scale-relevant part: candidate dictionary broadcast once
per actor; scoring is numpy against a small per-surface candidate set).

Ties (identical cosine) resolve to the lexicographically smallest
entity id, making the pipeline output order-independent.

Output: ``triples_linked(url, subj_surface, pred, obj_surface, subj_id,
obj_id, conf)`` — rows whose arguments cannot be linked are dropped
(conf-first policy, matching the precision-first extractor).
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa

from .resources import KGResources, resolve

EMBED_DIM = 128


def hash_embed(text: str, dim: int = EMBED_DIM) -> np.ndarray:
    """Deterministic char-3-gram feature-hashing embedding, L2-normalized."""
    s = f" {text.lower()} "
    v = np.zeros(dim, dtype=np.float64)
    for i in range(len(s) - 2):
        v[zlib.crc32(s[i:i + 3].encode("utf-8")) % dim] += 1.0
    n = np.linalg.norm(v)
    return v / n if n > 0 else v


def hash_embed_batch(texts, dim: int = EMBED_DIM) -> np.ndarray:
    return np.stack([hash_embed(t, dim) for t in texts])


class EntityLinker:
    """Maps a surface form to the best candidate entity id."""

    def __init__(self, resources):
        res: KGResources = resolve(resources)
        self.alias = res.alias
        self.canonical = res.canonical
        self._embed_cache: dict[str, np.ndarray] = {}
        self._link_cache: dict[str, tuple[str | None, float]] = {}

    def _embed(self, text: str) -> np.ndarray:
        v = self._embed_cache.get(text)
        if v is None:
            v = self._embed_cache[text] = hash_embed(text)
        return v

    def link(self, norm: str) -> tuple[str | None, float]:
        """norm (lowercased surface) → (entity_id | None, score)."""
        hit = self._link_cache.get(norm)
        if hit is not None:
            return hit
        candidates = self.alias.get(norm)
        if not candidates:
            result = (None, 0.0)
        elif len(candidates) == 1:
            result = (candidates[0], 1.0)
        else:
            sv = self._embed(norm)
            best_id, best_score = None, -1.0
            for cid in sorted(candidates):  # sorted → deterministic ties
                score = float(sv @ self._embed(self.canonical[cid].lower()))
                if score > best_score:
                    best_id, best_score = cid, score
            result = (best_id, best_score)
        self._link_cache[norm] = result
        return result


TRIPLES_LINKED_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("subj_surface", pa.string()),
        ("pred", pa.string()),
        ("obj_surface", pa.string()),
        ("subj_id", pa.string()),
        ("obj_id", pa.string()),
        ("conf", pa.float64()),
    ]
)


class LinkTriples:
    def __init__(self, resources):
        self.linker = EntityLinker(resources)

    def __call__(self, batch: pa.Table) -> pa.Table:
        keep = {k: [] for k in ("url", "subj_surface", "pred", "obj_surface", "subj_id", "obj_id", "conf")}
        cols = {name: batch[name].to_pylist() for name in ("url", "subj_surface", "pred", "obj_surface", "conf")}
        for i in range(batch.num_rows):
            sid, s_score = self.linker.link(cols["subj_surface"][i].lower())
            oid, o_score = self.linker.link(cols["obj_surface"][i].lower())
            if sid is None or oid is None:
                continue
            for name in ("url", "subj_surface", "pred", "obj_surface"):
                keep[name].append(cols[name][i])
            keep["subj_id"].append(sid)
            keep["obj_id"].append(oid)
            keep["conf"].append(cols["conf"][i] * s_score * o_score)
        return pa.table(
            {
                "url": pa.array(keep["url"], pa.string()),
                "subj_surface": pa.array(keep["subj_surface"], pa.string()),
                "pred": pa.array(keep["pred"], pa.string()),
                "obj_surface": pa.array(keep["obj_surface"], pa.string()),
                "subj_id": pa.array(keep["subj_id"], pa.string()),
                "obj_id": pa.array(keep["obj_id"], pa.string()),
                "conf": pa.array(keep["conf"], pa.float64()),
            }
        )


def link_triples(triples_ds, resources_ref, *, concurrency=(1, 8), batch_size: int = 1024):
    return triples_ds.map_batches(
        LinkTriples,
        fn_constructor_kwargs={"resources": resources_ref},
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency,
    )
