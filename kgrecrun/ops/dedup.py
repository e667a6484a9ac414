"""Deduplication operators for training-data pipelines, over a
``documents(doc_id, text)``-shaped Dataset (and an embeddings variant).

Five family members, all with the same scale shape — per-row sketch in
``map_batches`` → LSH/band blocking ``groupby`` → in-block verification
→ connected components over the verified edge list → cluster map
applied to every doc. Clustering is driver union-find + broadcast dict
below ``DEDUP_EDGE_THRESHOLD`` verified edges, and distributed
min-label-propagation CC + a bucket-cogroup apply above it (no driver
state that grows with the corpus):

* exact          — md5 of normalized text, hash-partition + min-id
* minhash        — word-shingle MinHash, banded LSH, signature-estimate verify
* simhash        — 64-bit SimHash, 4×16-bit band blocking, hamming verify
* ngram_jaccard  — bottom-k shingle sketch, exact jaccard on sketches
* embedding      — random-hyperplane LSH over an embedding column, cosine verify

Every variant returns a Dataset ``(doc_id, root_id)`` where
``root_id`` is the smallest doc_id of the duplicate cluster (root_id ==
doc_id for uniques); ``kept(ds)`` filters to cluster roots.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..kg.minhash import MinHasher, word_shingles
from ..kg.unionfind import UnionFind
from ..textnorm import normalize_ws


# ---------- shared helpers ----------

# above this many verified edges the driver union-find + broadcast dict
# is replaced by distributed label-propagation CC + a cogroup apply —
# a 100-TB crawl with 30-50% duplication breaks "edges fit one machine"
DEDUP_EDGE_THRESHOLD = 2_000_000


def _edges_to_mapping(edges_ds) -> dict:
    """Collect verified edges (small relative to corpus) → union-find →
    {doc_id: root}."""
    uf = UnionFind()
    for batch in edges_ds.iter_batches(batch_format="pyarrow"):
        for a, b in zip(batch["src"].to_pylist(), batch["dst"].to_pylist()):
            uf.union(a, b)
    return uf.components()


def _apply_labels(docs_ds, labels_ds, id_col: str = "doc_id", *, n_buckets: int = 64):
    """Driver-free cluster application: cogroup the id column with the
    CC labels by hash bucket; inside each bucket a vectorized left-outer
    acero join fills root_id (= own id for unclustered docs). Ships one
    narrow (bucket, id) row per doc — no broadcast dict."""
    from ..kg.unionfind import hash_bucket

    def doc_rows(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].combine_chunks()
        return pa.table({
            "bucket": hash_bucket(ids, n_buckets),
            "node": ids,
            "label": pa.nulls(len(ids), ids.type),
            "is_doc": pa.array([True] * len(ids), pa.bool_()),
        })

    def label_rows(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table({
            "bucket": hash_bucket(batch["node"].combine_chunks(), n_buckets),
            "node": batch["node"],
            "label": batch["label"],
            "is_doc": pa.array([False] * n, pa.bool_()),
        })

    def apply_bucket(group: pa.Table) -> pa.Table:
        docs = group.filter(group["is_doc"]).select(["node"])
        labs = group.filter(pc.invert(group["is_doc"])).select(["node", "label"])
        joined = docs.join(labs, keys=["node"], join_type="left outer")
        return pa.table({
            id_col: joined["node"],
            "root_id": pc.coalesce(joined["label"], joined["node"]),
        })

    unioned = docs_ds.map_batches(
        doc_rows, batch_format="pyarrow", zero_copy_batch=True
    ).union(labels_ds.map_batches(label_rows, batch_format="pyarrow"))
    return unioned.groupby("bucket").map_groups(apply_bucket, batch_format="pyarrow")


def _cluster_and_apply(docs_ds, edges_ds, id_col: str = "doc_id", *,
                       edge_threshold: int = DEDUP_EDGE_THRESHOLD):
    """edges → (doc_id, root_id): driver union-find + broadcast dict
    below ``edge_threshold`` verified edges (cheap, exact), distributed
    min-label-propagation CC + cogroup apply above it (no driver state
    that grows with the corpus). Both paths produce identical labels
    (root = smallest member)."""
    edges = edges_ds.materialize()  # verified pairs ≪ corpus; reused twice
    if edges.count() <= edge_threshold:
        return _apply_mapping(docs_ds, _edges_to_mapping(edges), id_col)
    from ..kg.unionfind import connected_components_distributed

    labels = connected_components_distributed(edges)
    return _apply_labels(docs_ds, labels, id_col)


def _apply_mapping(docs_ds, mapping, id_col: str = "doc_id"):
    from ..kg.resources import broadcast, resolve

    try:
        ref = broadcast(mapping)
    except Exception:
        ref = mapping

    class Apply:
        def __init__(self, mapping_ref):
            self.mapping = resolve(mapping_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = batch[id_col].to_pylist()
            roots = [self.mapping.get(i, i) for i in ids]
            return pa.table({id_col: batch[id_col], "root_id": pa.array(roots, batch[id_col].type)})

    return docs_ds.map_batches(
        Apply,
        fn_constructor_kwargs={"mapping_ref": ref},
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=(1, 8),
    )


def kept(cluster_ds, id_col: str = "doc_id"):
    """Filter a (doc_id, root_id) Dataset to the cluster roots."""

    def f(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.equal(batch[id_col], batch["root_id"])).select([id_col])

    return cluster_ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def normalize_text(t: str) -> str:
    # ASCII (RE2 \s) whitespace class, matching the oracle SQL's
    # regexp_replace(lower(text), '\s+', ' ') — see kgrecrun.textnorm
    return normalize_ws(t)


# ---------- exact ----------

def exact_dedup(docs_ds, text_col: str = "text", id_col: str = "doc_id"):
    """(doc_id, root_id) via content-hash grouping: ONE shuffle keyed by
    the md5 (carrying only (hash, id) pairs, never text); each hash
    group emits every member labeled with the group's min id. No join
    and no driver-side state, so it holds at any corpus size."""

    def to_hashes(batch: pa.Table) -> pa.Table:
        hs = [
            hashlib.md5(normalize_text(t).encode("utf-8")).hexdigest()
            for t in batch[text_col].to_pylist()
        ]
        return pa.table({"h": pa.array(hs, pa.string()), id_col: batch[id_col]})

    hashed = docs_ds.map_batches(to_hashes, batch_format="pyarrow", zero_copy_batch=True)

    def label_group(group: pa.Table) -> pa.Table:
        root = pc.min(group[id_col])
        return pa.table(
            {
                id_col: group[id_col],
                "root_id": pa.array([root.as_py()] * group.num_rows, group[id_col].type),
            }
        )

    return hashed.groupby("h").map_groups(label_group, batch_format="pyarrow")


# ---------- minhash LSH ----------

class _MinhashBands:
    def __init__(self, num_perm: int, bands: int, k: int, text_col: str, id_col: str):
        self.hasher = MinHasher(num_perm)
        self.bands = bands
        self.k = k
        self.text_col = text_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        keys, ids, sigs = [], [], []
        for i, t in enumerate(batch[self.text_col].to_pylist()):
            sig = self.hasher.signature(word_shingles(t or "", self.k))
            doc = batch[self.id_col][i].as_py()
            sig_bytes = sig.tobytes()
            for bk in self.hasher.band_keys(sig, self.bands):
                keys.append(bk)
                ids.append(doc)
                sigs.append(sig_bytes)
        return pa.table(
            {
                "band_key": pa.array(keys, pa.int64()),
                "doc_id": pa.array(ids),
                "sig": pa.array(sigs, pa.binary()),
            }
        )


def _verify_sig_block(block: pa.Table, threshold: float, window: int) -> pa.Table:
    ids = block["doc_id"].to_pylist()
    sigs = [np.frombuffer(s, dtype=np.uint64) for s in block["sig"].to_pylist()]
    order = sorted(range(len(ids)), key=lambda i: ids[i])
    srcs, dsts = [], []
    for pos in range(len(order)):
        i = order[pos]
        for pos2 in range(pos + 1, min(pos + 1 + window, len(order))):
            j = order[pos2]
            if ids[i] == ids[j]:
                continue
            est = float(np.mean(sigs[i] == sigs[j]))  # unbiased jaccard estimate
            if est >= threshold:
                a, b = sorted((ids[i], ids[j]))
                srcs.append(a)
                dsts.append(b)
    return pa.table({"src": pa.array(srcs), "dst": pa.array(dsts)})


def minhash_dedup(docs_ds, *, threshold: float = 0.7, num_perm: int = 64, bands: int = 16,
                  shingle_k: int = 5, window: int = 32, text_col: str = "text", id_col: str = "doc_id",
                  edge_threshold: int = DEDUP_EDGE_THRESHOLD):
    """r=4, b=16 → collision prob ≥0.98 at jaccard 0.7 while the band
    shuffle carries 4× less data than 128/32 (each band row ships the
    full signature for in-block verification — at corpus scale the
    signature bytes, not the band keys, dominate the exchange)."""
    banded = docs_ds.map_batches(
        _MinhashBands(num_perm, bands, shingle_k, text_col, id_col),
        batch_format="pyarrow", zero_copy_batch=True, batch_size=256,
    )
    edges = banded.groupby("band_key").map_groups(
        lambda g: _verify_sig_block(g, threshold, window), batch_format="pyarrow"
    )
    return _cluster_and_apply(docs_ds, edges, id_col, edge_threshold=edge_threshold)


# ---------- simhash ----------

_WORD_BITS_CACHE: dict[str, np.ndarray] = {}
_WORD_BITS_CACHE_MAX = 200_000
_SIMHASH_POW2 = 1 << np.arange(64, dtype=np.uint64)


def _word_bits(w: str) -> np.ndarray:
    """±1 bit vector for a word (md5-derived, deterministic), cached per
    worker — natural-language vocabulary is tiny relative to corpus
    token count, so the cache turns per-token hashing into a dict hit."""
    bits = _WORD_BITS_CACHE.get(w)
    if bits is None:
        hb = hashlib.md5(w.encode("utf-8")).digest()[:8]
        bits = np.unpackbits(np.frombuffer(hb, dtype=np.uint8), bitorder="little").astype(
            np.int64
        ) * 2 - 1
        if len(_WORD_BITS_CACHE) >= _WORD_BITS_CACHE_MAX:
            _WORD_BITS_CACHE.clear()
        _WORD_BITS_CACHE[w] = bits
    return bits


def simhash64(text: str) -> int:
    """64-bit SimHash over word hashes: weight each DISTINCT word's ±1
    bit vector by its frequency (equivalent to hashing every token, one
    hash per distinct word)."""
    from collections import Counter

    counts = Counter(normalize_text(text).split())
    if not counts:
        return 0
    acc = np.zeros(64, dtype=np.int64)
    for w, c in counts.items():
        acc += _word_bits(w) * c
    return int(((acc > 0).astype(np.uint64) * _SIMHASH_POW2).sum())


def simhash_dedup(docs_ds, *, max_hamming: int = 3, window: int = 64,
                  text_col: str = "text", id_col: str = "doc_id",
                  edge_threshold: int = DEDUP_EDGE_THRESHOLD):
    """SimHash near-dup: 4×16-bit band blocking guarantees that any pair
    within hamming distance 3 shares at least one exact band
    (pigeonhole); verification checks the true distance."""

    def to_bands(batch: pa.Table) -> pa.Table:
        keys, ids, hashes = [], [], []
        for i, t in enumerate(batch[text_col].to_pylist()):
            sh = simhash64(t or "")
            doc = batch[id_col][i].as_py()
            for b in range(4):
                band = (sh >> (16 * b)) & 0xFFFF
                keys.append((b << 16) | band)
                ids.append(doc)
                hashes.append(sh)
        return pa.table(
            {
                "band_key": pa.array(keys, pa.int64()),
                "doc_id": pa.array(ids),
                "simhash": pa.array(hashes, pa.uint64()),
            }
        )

    def verify(block: pa.Table) -> pa.Table:
        ids = block["doc_id"].to_pylist()
        hs = block["simhash"].to_pylist()
        order = sorted(range(len(ids)), key=lambda i: ids[i])
        srcs, dsts = [], []
        for pos in range(len(order)):
            i = order[pos]
            for pos2 in range(pos + 1, min(pos + 1 + window, len(order))):
                j = order[pos2]
                if ids[i] == ids[j]:
                    continue
                if bin(hs[i] ^ hs[j]).count("1") <= max_hamming:
                    a, b = sorted((ids[i], ids[j]))
                    srcs.append(a)
                    dsts.append(b)
        return pa.table({"src": pa.array(srcs), "dst": pa.array(dsts)})

    banded = docs_ds.map_batches(to_bands, batch_format="pyarrow", zero_copy_batch=True)
    edges = banded.groupby("band_key").map_groups(verify, batch_format="pyarrow")
    return _cluster_and_apply(docs_ds, edges, id_col, edge_threshold=edge_threshold)


# ---------- n-gram jaccard via bottom-k sketches ----------

def ngram_jaccard_dedup(docs_ds, *, threshold: float = 0.7, sketch_k: int = 200,
                        shingle_k: int = 4, bands: int = 16, num_perm: int = 64,
                        window: int = 32, text_col: str = "text", id_col: str = "doc_id",
                        edge_threshold: int = DEDUP_EDGE_THRESHOLD):
    """Jaccard on bottom-k shingle sketches (exact on the sketch, an
    unbiased estimator of the true jaccard); minhash-band blocking."""
    hasher = MinHasher(num_perm)

    def to_rows(batch: pa.Table) -> pa.Table:
        keys, ids, sketches = [], [], []
        for i, t in enumerate(batch[text_col].to_pylist()):
            sh = word_shingles(t or "", shingle_k)
            sketch = np.array(sorted(sh)[:sketch_k], dtype=np.uint64)
            sig = hasher.signature(sh)
            doc = batch[id_col][i].as_py()
            for bk in hasher.band_keys(sig, bands):
                keys.append(bk)
                ids.append(doc)
                sketches.append(sketch.tobytes())
        return pa.table(
            {
                "band_key": pa.array(keys, pa.int64()),
                "doc_id": pa.array(ids),
                "sketch": pa.array(sketches, pa.binary()),
            }
        )

    def verify(block: pa.Table) -> pa.Table:
        ids = block["doc_id"].to_pylist()
        sk = [set(np.frombuffer(s, dtype=np.uint64).tolist()) for s in block["sketch"].to_pylist()]
        order = sorted(range(len(ids)), key=lambda i: ids[i])
        srcs, dsts = [], []
        for pos in range(len(order)):
            i = order[pos]
            for pos2 in range(pos + 1, min(pos + 1 + window, len(order))):
                j = order[pos2]
                if ids[i] == ids[j]:
                    continue
                inter = len(sk[i] & sk[j])
                union = len(sk[i] | sk[j])
                if union and inter / union >= threshold:
                    a, b = sorted((ids[i], ids[j]))
                    srcs.append(a)
                    dsts.append(b)
        return pa.table({"src": pa.array(srcs), "dst": pa.array(dsts)})

    banded = docs_ds.map_batches(to_rows, batch_format="pyarrow", zero_copy_batch=True)
    edges = banded.groupby("band_key").map_groups(verify, batch_format="pyarrow")
    return _cluster_and_apply(docs_ds, edges, id_col, edge_threshold=edge_threshold)


# ---------- embedding cosine ----------

def embedding_dedup(embeds_ds, *, threshold: float = 0.95, n_planes: int = 12,
                    window: int = 64, vec_col: str = "embedding", id_col: str = "vec_id",
                    seed: int = 13, edge_threshold: int = DEDUP_EDGE_THRESHOLD):
    """Near-dup by embedding cosine: random-hyperplane LSH bucket →
    in-bucket cosine verify. Planes are seeded → deterministic buckets."""
    planes_by_dim: dict[int, np.ndarray] = {}

    def get_planes(dim: int) -> np.ndarray:
        if dim not in planes_by_dim:
            rng = np.random.RandomState(seed)
            planes_by_dim[dim] = rng.standard_normal((n_planes, dim))
        return planes_by_dim[dim]

    def to_buckets(batch: pa.Table) -> pa.Table:
        vecs = np.array(batch[vec_col].to_pylist(), dtype=np.float64)
        ids = batch[id_col].to_pylist()
        planes = get_planes(vecs.shape[1])
        signs = (vecs @ planes.T) > 0
        keys = signs.dot(1 << np.arange(n_planes)).astype(np.int64)
        return pa.table(
            {
                "band_key": pa.array(keys, pa.int64()),
                "doc_id": pa.array(ids),
                "vec": pa.array([v.tobytes() for v in vecs], pa.binary()),
            }
        )

    def verify(block: pa.Table) -> pa.Table:
        ids = block["doc_id"].to_pylist()
        vecs = [np.frombuffer(v, dtype=np.float64) for v in block["vec"].to_pylist()]
        norms = [np.linalg.norm(v) for v in vecs]
        order = sorted(range(len(ids)), key=lambda i: ids[i])
        srcs, dsts = [], []
        for pos in range(len(order)):
            i = order[pos]
            for pos2 in range(pos + 1, min(pos + 1 + window, len(order))):
                j = order[pos2]
                if ids[i] == ids[j]:
                    continue
                denom = norms[i] * norms[j]
                if denom > 0 and float(vecs[i] @ vecs[j]) / denom >= threshold:
                    a, b = sorted((ids[i], ids[j]))
                    srcs.append(a)
                    dsts.append(b)
        return pa.table({"src": pa.array(srcs), "dst": pa.array(dsts)})

    bucketed = embeds_ds.map_batches(to_buckets, batch_format="pyarrow", zero_copy_batch=True)
    edges = bucketed.groupby("band_key").map_groups(verify, batch_format="pyarrow")
    return _cluster_and_apply(embeds_ds, edges, id_col, edge_threshold=edge_threshold)
