"""Deduplication operators for training-data pipelines, over a
``documents(doc_id, text)``-shaped Dataset (and an embeddings variant).

Five family members, all with the same scale shape — per-row sketch in
``map_batches`` → LSH/band blocking → BUCKETED in-block verification →
connected components over the verified edge list → cluster map applied
to every doc. Clustering is driver union-find + broadcast dict below
``DEDUP_EDGE_THRESHOLD`` verified edges, and distributed
min-label-propagation CC + a bucket-cogroup apply above it (no driver
state that grows with the corpus):

* exact          — md5 of normalized text, ONE bucketed shuffle, segment-sweep min-id
* minhash        — word-shingle MinHash, banded LSH, two-phase signature verify
* simhash        — 64-bit SimHash, 4×16-bit band blocking, hamming verify
* ngram_jaccard  — bottom-k shingle sketch, exact jaccard on sketches
* embedding      — random-hyperplane LSH over an embedding column, cosine verify

Beyond the five clustering variants: :func:`segment_dedup_docs`
(sub-document line-level dedup with reassembly),
:func:`incremental_segment_dedup` (incoming-batch duplicate-segment
signal against an already-ingested base), :func:`provenance_dedup`
(near-title-key collapse to the most-trusted source's copy), and
:func:`source_segment_overlap` (cross-source boilerplate matrix); the
EXACT no-false-negative pair join lives in ops/simjoin.py.

Dispatch cardinality is capped everywhere: band keys hash into
``n_buckets`` groups and one ``map_groups`` call sweeps every band
segment in the bucket with vectorized shifted comparisons — per-key
``map_groups`` (one Python call per band/hash, ≈ docs×bands calls at
corpus scale) appears nowhere. The minhash/ngram band shuffle carries
only (band_key, doc_id) rows (16 B); signatures/sketches are attached
to the (rare) collision candidates afterwards via two bucket-cogroup
joins — a ~16× exchange reduction vs shipping the 512 B signature on
every band row.

Every variant returns a Dataset ``(doc_id, root_id)`` where
``root_id`` is the smallest doc_id of the duplicate cluster (root_id ==
doc_id for uniques); ``kept(ds)`` filters to cluster roots.

RECALL NOTE: in-block pair generation is windowed (``window`` nearest
ids per band segment). A band segment larger than the window still
clusters correctly when duplicates chain (adjacent ids link and
connected components close the transitive hull — tested), but a
pathological segment of mutually-similar docs with > window id spacing
could miss pairs; :func:`oversized_band_count` makes that truncation
measurable (used by tools/dedup_stress.py).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..kg.minhash import MinHasher, word_shingles
from ..kg.unionfind import UnionFind
from ..textnorm import WS_PATTERN, normalize_ws

# ---------- shared helpers ----------

# above this many verified edges the driver union-find + broadcast dict
# is replaced by distributed label-propagation CC + a cogroup apply —
# a 100-TB crawl with 30-50% duplication breaks "edges fit one machine"
DEDUP_EDGE_THRESHOLD = 2_000_000

# dispatch cap for band-verify sweeps: band keys hash into this many
# groups; one group call sweeps thousands of band segments vectorized
VERIFY_BUCKETS = 256


def _md5_bucket(harr: pa.Array, n_buckets: int) -> pa.Array:
    """Bucket id for a fixed_size_binary(16) digest column: mask the
    digest's first 8 little-endian bytes (md5/xxh128 fingerprints are
    uniform — no mixing finalizer, and the bytes are identical in every
    process by construction, so the cross-process-consistency concern
    hash_bucket documents for its string path does not arise).
    n_buckets must be a power of two.

    Vectorized: reads the digests straight out of the fixed-size-binary
    value buffer as a uint64 view (zero-copy; honors the array offset)
    instead of materializing per-row Python bytes."""
    if isinstance(harr, pa.ChunkedArray):
        harr = harr.combine_chunks()
    n = len(harr)
    if n == 0:
        return pa.array([], pa.int32())
    if harr.type.byte_width != 16:
        raise ValueError(f"_md5_bucket expects fixed_size_binary(16), "
                         f"got {harr.type} — a wrong-width digest would "
                         "be silently mis-bucketed")
    u = np.frombuffer(harr.buffers()[1], dtype="<u8", count=2 * n,
                      offset=harr.offset * 16)[::2]
    return pa.array((u & np.uint64(n_buckets - 1)).astype(np.int32),
                    pa.int32())


# RE2 \s class (ASCII-only), the tokenizer contract every oracle-facing
# text op shares with the SQL side — aliased from kgrecrun.textnorm so
# ascii_words (per-doc) and _flat_tokens (per-column) can never diverge
_WS_PATTERN = WS_PATTERN

# pinned seeds for the two independent xxhash channels of the 128-bit
# content fingerprints (any fixed distinct values work; what matters is
# that every process in the fleet uses the same pair)
_XXH_SEED_A = 0xA0761D6478BD642F
_XXH_SEED_B = 0xE7037ED1A0B428DB


def _flat_tokens(texts) -> tuple[pa.Array, np.ndarray]:
    """Vectorized corpus tokenization: one RE2 ``\\s`` split over the
    whole column (``pc.split_pattern_regex`` — pyarrow's regex engine
    IS RE2, so the class semantics match DuckDB's ``'\\s+'`` exactly),
    empties dropped. Returns ``(flat token StringArray — docs
    concatenated in order, per-doc token counts)``; equals
    ``[textnorm.ascii_words(t) for t in texts]`` element-wise (property
    test in tests/test_strip_vectorized.py). Null text → 0 tokens,
    like the Python path."""
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    lists = pc.split_pattern_regex(pc.fill_null(texts, ""),
                                   pattern=_WS_PATTERN)
    counts = pc.list_value_length(lists).to_numpy(
        zero_copy_only=False).astype(np.int64)
    flat = lists.flatten()
    keep = pc.not_equal(flat, "").to_numpy(
        zero_copy_only=False).astype(bool)
    parent = np.repeat(np.arange(counts.size), counts)
    lens = np.bincount(parent[keep], minlength=counts.size).astype(np.int64)
    return flat.filter(pa.array(keep)), lens


def _xxh_pair(strings) -> tuple[np.ndarray, np.ndarray]:
    """Two independent vectorized 64-bit xxhash channels per string
    (polars' hasher, pinned seeds) — together a 128-bit content
    fingerprint whose collision-freedom assumption matches the md5 one
    documented on exact_dedup. Hashes every occurrence directly —
    measured 9× faster than dictionary-encoding to uniques first even
    on a mostly-unique token stream (the hash-table build costs more
    than the ~ns/byte vectorized xxhash it saves; see
    BENCH/strip_kernel_r5). Cross-process deterministic for the same
    reason hash_bucket's string path is (content-only xxhash, fixed
    seeds, same polars everywhere; polars missing raises rather than
    silently falling back)."""
    import polars as pl

    if isinstance(strings, pa.ChunkedArray):
        strings = strings.combine_chunks()
    if len(strings) == 0:
        e = np.array([], dtype=np.uint64)
        return e, e
    s = pl.from_arrow(strings)
    return (s.hash(seed=_XXH_SEED_A).to_numpy(),
            s.hash(seed=_XXH_SEED_B).to_numpy())


def _pack_bin16(w1: np.ndarray, w2: np.ndarray) -> pa.Array:
    """Interleave two uint64 channels into a fixed_size_binary(16)
    fingerprint column (channel A in the first 8 little-endian bytes,
    so _md5_bucket masks channel A — same layout contract as md5
    digests)."""
    packed = np.empty((w1.size, 2), dtype="<u8")
    packed[:, 0] = w1
    packed[:, 1] = w2
    return pa.Array.from_buffers(
        pa.binary(16), w1.size, [None, pa.py_buffer(packed.tobytes())])


def _segments_vectorized(ids: np.ndarray, texts, *, seg_words: int,
                         seg_shift: int, fingerprint: str):
    """Shared vectorized segmenter for the seg_words-window family
    (segment_dedup_docs / source_template_strip): non-overlapping
    segments tile each doc's token run exactly, so one ListArray view
    over the flat token column (``_flat_tokens`` — a single RE2 split
    per batch) materializes every segment string through one
    binary_join; no per-doc Python. → (seg_doc index array, 1-based
    seg_no, segment strings, fixed_size_binary(16) fingerprints,
    ord = doc_id·2^seg_shift + seg_no).

    The fingerprint is a grouping key only in every caller (outputs
    never expose it), so ``"xxh128"`` (vectorized two-seed polars
    hash) and ``"md5"`` (the SQL oracles' digest, kept for parity
    tests) yield identical operator output under the module's
    collision-freedom assumption."""
    import hashlib

    flat, lens = _flat_tokens(texts)
    nseg = -(-lens // seg_words)            # ceil; 0-token docs → 0
    total = int(nseg.sum())
    seg_doc = np.repeat(np.arange(lens.size), nseg)
    seg_no = (np.arange(total, dtype=np.int64)
              - (np.cumsum(nseg) - nseg)[seg_doc] + 1)
    starts = (np.cumsum(lens) - lens)[seg_doc] + (seg_no - 1) * seg_words
    offsets = np.concatenate((starts, [int(lens.sum())]))
    segs = pc.cast(pc.binary_join(
        pa.LargeListArray.from_arrays(pa.array(offsets, pa.int64()), flat),
        " "), pa.string())
    if fingerprint == "md5":
        harr = pa.array([hashlib.md5(s.encode("utf-8")).digest()
                         for s in segs.to_pylist()], pa.binary(16))
    else:
        harr = _pack_bin16(*_xxh_pair(segs))
    # loud packing contract (the old Python-int path raised
    # OverflowError at pa.array; int64 numpy would wrap silently)
    if seg_no.size and int(seg_no.max()) >= (1 << seg_shift):
        raise ValueError(
            f"_segments_vectorized: a document has >= 2^{seg_shift} "
            "segments — the packed (doc_id, seg_no) ord contract does "
            "not hold; split the document upstream")
    if ids.size and (int(ids.max()) >= (1 << (63 - seg_shift))
                     or int(ids.min()) < 0):
        raise ValueError(
            f"_segments_vectorized: doc_id outside [0, "
            f"2^{63 - seg_shift}) breaks the packed (doc_id, seg_no) "
            "ord contract")
    return seg_doc, seg_no, segs, harr, ids[seg_doc] * (
        1 << seg_shift) + seg_no


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
    from ..kg.unionfind import connected_components

    labels = connected_components(edges)
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


# ---------- bucketed band sweep (shared by all LSH variants) ----------

def _sweep_edges(banded_ds, *, window: int, id_type: pa.DataType,
                 pair_mask_fn=None, n_buckets: int = VERIFY_BUCKETS,
                 banded_schema: pa.Schema | None = None):
    """(band_key, doc_id, *payload) → verified (src, dst) edges.

    ONE shuffle: band keys hash into ``n_buckets`` groups; inside a
    group a single sort by (band_key, doc_id) + shifted-comparison
    sweep generates the window-limited candidate pairs of EVERY band
    segment at once (identical pair set to per-band dispatch, but
    group-call count stays at n_buckets instead of docs×bands).

    ``pair_mask_fn(g_sorted, lo, hi) -> bool mask`` applies the
    variant's vectorized verification to candidate index pairs; None
    keeps all candidates (two-phase variants verify later against
    joined signatures). Pairs are emitted (src < dst), per-block
    distinct."""
    from ..kg.unionfind import hash_bucket

    edge_schema = pa.schema([("src", id_type), ("dst", id_type)])

    def tag(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "__bucket", hash_bucket(batch["band_key"].combine_chunks(), n_buckets)
        )

    def sweep(group: pa.Table) -> pa.Table:
        order = pc.sort_indices(
            group, sort_keys=[("band_key", "ascending"), ("doc_id", "ascending")]
        )
        g = group.take(order)
        bk = g["band_key"].combine_chunks().to_numpy(zero_copy_only=False)
        ids = g["doc_id"].combine_chunks().to_numpy(zero_copy_only=False)
        n = len(bk)
        lo_parts, hi_parts = [], []
        for d in range(1, min(window, n - 1) + 1):
            m = (bk[d:] == bk[:-d]) & (ids[d:] != ids[:-d])
            lo = np.flatnonzero(m)
            if len(lo):
                lo_parts.append(lo)
                hi_parts.append(lo + d)
        if not lo_parts:
            return edge_schema.empty_table()
        lo = np.concatenate(lo_parts)
        hi = np.concatenate(hi_parts)
        if pair_mask_fn is not None:
            keep = pair_mask_fn(g, lo, hi)
            lo, hi = lo[keep], hi[keep]
        if not len(lo):
            return edge_schema.empty_table()
        out = pa.table({
            "src": pa.array(ids[lo]).cast(id_type),
            "dst": pa.array(ids[hi]).cast(id_type),
        })
        return out.group_by(["src", "dst"]).aggregate([]).cast(edge_schema)

    tagged = banded_ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
    return tagged.groupby("__bucket").map_groups(sweep, batch_format="pyarrow")


def oversized_band_count(banded_ds, *, window: int) -> int:
    """Number of band groups whose membership exceeds ``window`` — the
    regime where windowed pair generation relies on chain transitivity
    instead of direct pairs. Narrow native aggregate (groupby count);
    surfaced by tools/dedup_stress.py so truncation is visible at
    scale."""
    counts = banded_ds.groupby("band_key").count()

    def over(batch: pa.Table) -> pa.Table:
        if batch.num_columns < 2:  # empty aggregate blocks are schemaless
            return pa.table({"n": pa.array([0], pa.int64())})
        c = batch.rename_columns(["band_key", "cnt"])
        n = pc.sum(pc.cast(pc.greater(c["cnt"], window), pa.int64())).as_py() or 0
        return pa.table({"n": pa.array([n], pa.int64())})

    return counts.map_batches(over, batch_format="pyarrow").sum("n") or 0


# ---------- exact ----------

def exact_dedup(docs_ds, text_col: str = "text", id_col: str = "doc_id",
                *, n_buckets: int = VERIFY_BUCKETS):
    """(doc_id, root_id) via content-hash grouping: ONE shuffle keyed by
    a hash BUCKET of the md5 (carrying only (hash, id) pairs, never
    text); inside a bucket one sort by (hash, id) + a segment sweep
    labels every member with its group's min id — group-call count is
    ``n_buckets`` regardless of how many distinct documents exist (a
    per-hash ``map_groups`` would cost one Python call per distinct doc,
    ~10¹² at corpus scale). No join and no driver-side state."""
    from ..kg.unionfind import hash_bucket

    def to_hashes(batch: pa.Table) -> pa.Table:
        hs = pa.array(
            [
                hashlib.md5(normalize_text(t).encode("utf-8")).hexdigest()
                for t in batch[text_col].to_pylist()
            ],
            pa.string(),
        )
        return pa.table({
            "__bucket": hash_bucket(hs, n_buckets),
            "h": hs,
            id_col: batch[id_col],
        })

    hashed = docs_ds.map_batches(to_hashes, batch_format="pyarrow", zero_copy_batch=True)

    def label_bucket(group: pa.Table) -> pa.Table:
        order = pc.sort_indices(
            group, sort_keys=[("h", "ascending"), (id_col, "ascending")]
        )
        g = group.take(order)
        ids = g[id_col].combine_chunks()
        h = g["h"].combine_chunks()
        n = g.num_rows
        neq = pc.not_equal(h.slice(1), h.slice(0, n - 1)).to_numpy(
            zero_copy_only=False
        )
        new_seg = np.concatenate(([True], neq.astype(bool)))
        pos = np.arange(n)
        first = np.maximum.accumulate(np.where(new_seg, pos, 0))
        return pa.table({id_col: ids, "root_id": ids.take(pa.array(first))})

    return hashed.groupby("__bucket").map_groups(label_bucket, batch_format="pyarrow")


# ---------- minhash LSH ----------

class _ComputeSigs:
    """(doc_id, text) → (doc_id, sig): one signature per doc, computed
    ONCE and reused for banding and candidate verification (the old
    layout re-shipped the 512 B signature on all 16 band rows)."""

    def __init__(self, num_perm: int, k: int, text_col: str, id_col: str):
        self.hasher = MinHasher(num_perm)
        self.k = k
        self.text_col = text_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        sigs = [
            self.hasher.signature(word_shingles(t or "", self.k)).tobytes()
            for t in batch[self.text_col].to_pylist()
        ]
        return pa.table({
            "doc_id": batch[self.id_col],
            "sig": pa.array(sigs, pa.binary()),
        })


def _band_rows_from_sigs(num_perm: int, bands: int):
    """(doc_id, sig) → (band_key, doc_id): 16 B per band row, no payload."""
    hasher = MinHasher(num_perm)

    def f(batch: pa.Table) -> pa.Table:
        keys, ids = [], []
        for i, s in enumerate(batch["sig"].to_pylist()):
            sig = np.frombuffer(s, dtype=np.uint64)
            doc = batch["doc_id"][i].as_py()
            for bk in hasher.band_keys(sig, bands):
                keys.append(bk)
                ids.append(doc)
        return pa.table({
            "band_key": pa.array(keys, pa.int64()),
            "doc_id": pa.array(ids, batch["doc_id"].type),
        })

    return f


def _attach_and_verify_sigs(cands_ds, sigs_ds, *, id_type: pa.DataType,
                            payload_col: str, verify_batch_fn):
    """candidates (src, dst) + per-doc payload (doc_id, col) → verified
    edges: two bucket-cogroup joins attach payload_a/payload_b, then a
    vectorized per-batch verification filters. The payload ships ~2×
    (once per join) instead of ``bands``× on every band row."""
    from .cogroup import bucket_join

    cand_schema = pa.schema([("src", id_type), ("dst", id_type)])
    pay_type = pa.binary()

    a_side = sigs_ds.map_batches(
        lambda b: pa.table({"src": b["doc_id"], "pay_a": b[payload_col]}),
        batch_format="pyarrow",
    )
    c1 = bucket_join(
        cands_ds, a_side, key="src",
        left_schema=cand_schema,
        right_schema=pa.schema([("src", id_type), ("pay_a", pay_type)]),
    )
    b_side = sigs_ds.map_batches(
        lambda b: pa.table({"dst": b["doc_id"], "pay_b": b[payload_col]}),
        batch_format="pyarrow",
    )
    c2 = bucket_join(
        c1, b_side, key="dst",
        left_schema=pa.schema(
            [("src", id_type), ("dst", id_type), ("pay_a", pay_type)]
        ),
        right_schema=pa.schema([("dst", id_type), ("pay_b", pay_type)]),
    )
    edge_schema = pa.schema([("src", id_type), ("dst", id_type)])

    def verify(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return edge_schema.empty_table()
        keep = verify_batch_fn(batch)
        return (
            batch.select(["src", "dst"])
            .filter(pa.array(keep, pa.bool_()))
            .cast(edge_schema)
        )

    return c2.map_batches(verify, batch_format="pyarrow")


def minhash_dedup(docs_ds, *, threshold: float = 0.7, num_perm: int = 64, bands: int = 16,
                  shingle_k: int = 5, window: int = 32, text_col: str = "text", id_col: str = "doc_id",
                  edge_threshold: int = DEDUP_EDGE_THRESHOLD):
    """r=4, b=16 → collision prob ≥0.98 at jaccard 0.7 while the band
    shuffle carries 4× less data than 128/32. Two-phase layout: band
    rows are (band_key, doc_id) ONLY — candidate pairs from the bucketed
    window sweep are verified against signatures attached by two
    bucket-cogroup joins, so the signature bytes cross the wire ~2×
    instead of ``bands``× (measured in tools/dedup_stress.py)."""
    id_type = docs_ds.schema().types[docs_ds.schema().names.index(id_col)]
    sigs = docs_ds.map_batches(
        _ComputeSigs(num_perm, shingle_k, text_col, id_col),
        batch_format="pyarrow", zero_copy_batch=True, batch_size=256,
    ).materialize()  # (doc_id, 512 B) — object-store resident, reused 3×
    banded = sigs.map_batches(
        _band_rows_from_sigs(num_perm, bands), batch_format="pyarrow"
    )
    cands = _sweep_edges(banded, window=window, id_type=id_type)

    def est_keep(batch: pa.Table) -> np.ndarray:
        a = np.frombuffer(
            b"".join(batch["pay_a"].to_pylist()), dtype=np.uint64
        ).reshape(-1, num_perm)
        b = np.frombuffer(
            b"".join(batch["pay_b"].to_pylist()), dtype=np.uint64
        ).reshape(-1, num_perm)
        return (a == b).mean(axis=1) >= threshold  # unbiased jaccard estimate

    edges = _attach_and_verify_sigs(
        cands, sigs, id_type=id_type, payload_col="sig", verify_batch_fn=est_keep
    )
    return _cluster_and_apply(docs_ds, edges, id_col, edge_threshold=edge_threshold)


# ---------- simhash ----------

_WORD_BITS_CACHE: dict[str, np.ndarray] = {}
_WORD_BITS_CACHE_MAX = 200_000
_SIMHASH_POW2 = 1 << np.arange(64, dtype=np.uint64)
_POPCOUNT8 = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint8)


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


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized popcount of a contiguous uint64 array."""
    return _POPCOUNT8[np.ascontiguousarray(x).view(np.uint8).reshape(-1, 8)].sum(
        axis=1
    )


def simhash_dedup(docs_ds, *, max_hamming: int = 3, window: int = 64,
                  text_col: str = "text", id_col: str = "doc_id",
                  edge_threshold: int = DEDUP_EDGE_THRESHOLD):
    """SimHash near-dup: 4×16-bit band blocking guarantees that any pair
    within hamming distance 3 shares at least one exact band
    (pigeonhole); verification checks the true distance with a
    vectorized XOR+popcount over the bucketed window sweep (the 8 B
    simhash rides the band row — single-phase is already the minimal
    exchange here)."""
    id_type = docs_ds.schema().types[docs_ds.schema().names.index(id_col)]

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
        return pa.table({
            "band_key": pa.array(keys, pa.int64()),
            "doc_id": pa.array(ids, id_type),
            "simhash": pa.array(hashes, pa.uint64()),
        })

    def hamming_mask(g: pa.Table, lo: np.ndarray, hi: np.ndarray) -> np.ndarray:
        hs = g["simhash"].combine_chunks().to_numpy(zero_copy_only=False)
        return _popcount64(hs[lo] ^ hs[hi]) <= max_hamming

    banded = docs_ds.map_batches(to_bands, batch_format="pyarrow", zero_copy_batch=True)
    edges = _sweep_edges(
        banded, window=window, id_type=id_type, pair_mask_fn=hamming_mask
    )
    return _cluster_and_apply(docs_ds, edges, id_col, edge_threshold=edge_threshold)


# ---------- n-gram jaccard via bottom-k sketches ----------

def ngram_jaccard_dedup(docs_ds, *, threshold: float = 0.7, sketch_k: int = 200,
                        shingle_k: int = 4, bands: int = 16, num_perm: int = 64,
                        window: int = 32, text_col: str = "text", id_col: str = "doc_id",
                        edge_threshold: int = DEDUP_EDGE_THRESHOLD):
    """Jaccard on bottom-k shingle sketches (exact on the sketch, an
    unbiased estimator of the true jaccard); minhash-band blocking.
    Same two-phase layout as :func:`minhash_dedup`: band rows carry no
    payload; sketches attach to collision candidates via bucket-cogroup
    joins (the ≤1.6 KB sketch would otherwise ship ``bands``×)."""
    id_type = docs_ds.schema().types[docs_ds.schema().names.index(id_col)]
    hasher = MinHasher(num_perm)

    def to_sketch_rows(batch: pa.Table) -> pa.Table:
        ids, sketches, sigs = [], [], []
        for i, t in enumerate(batch[text_col].to_pylist()):
            sh = word_shingles(t or "", shingle_k)
            sketches.append(np.array(sorted(sh)[:sketch_k], dtype=np.uint64).tobytes())
            sigs.append(hasher.signature(sh).tobytes())
            ids.append(batch[id_col][i].as_py())
        return pa.table({
            "doc_id": pa.array(ids, id_type),
            "sketch": pa.array(sketches, pa.binary()),
            "sig": pa.array(sigs, pa.binary()),
        })

    sketched = docs_ds.map_batches(
        to_sketch_rows, batch_format="pyarrow", zero_copy_batch=True, batch_size=256
    ).materialize()
    banded = sketched.map_batches(
        _band_rows_from_sigs(num_perm, bands), batch_format="pyarrow"
    )
    cands = _sweep_edges(banded, window=window, id_type=id_type)

    def jaccard_keep(batch: pa.Table) -> np.ndarray:
        keep = np.zeros(batch.num_rows, dtype=bool)
        for i, (a, b) in enumerate(
            zip(batch["pay_a"].to_pylist(), batch["pay_b"].to_pylist())
        ):
            sa = np.frombuffer(a, dtype=np.uint64)
            sb = np.frombuffer(b, dtype=np.uint64)
            inter = len(np.intersect1d(sa, sb, assume_unique=True))
            union = len(sa) + len(sb) - inter
            keep[i] = bool(union) and inter / union >= threshold
        return keep

    edges = _attach_and_verify_sigs(
        cands, sketched, id_type=id_type, payload_col="sketch",
        verify_batch_fn=jaccard_keep,
    )
    return _cluster_and_apply(docs_ds, edges, id_col, edge_threshold=edge_threshold)


# ---------- embedding cosine ----------

def embedding_dedup(embeds_ds, *, threshold: float = 0.95, n_planes: int = 12,
                    window: int = 64, vec_col: str = "embedding", id_col: str = "vec_id",
                    seed: int = 13, edge_threshold: int = DEDUP_EDGE_THRESHOLD):
    """Near-dup by embedding cosine: random-hyperplane LSH bucket →
    bucketed window sweep with a vectorized pairwise-cosine mask.
    Planes are seeded → deterministic buckets. Single-phase: each doc
    emits ONE bucket row, so the vector ships once either way."""
    id_type = embeds_ds.schema().types[embeds_ds.schema().names.index(id_col)]
    planes_by_dim: dict[int, np.ndarray] = {}

    def get_planes(dim: int) -> np.ndarray:
        if dim not in planes_by_dim:
            rng = np.random.RandomState(seed)
            planes_by_dim[dim] = rng.standard_normal((n_planes, dim))
        return planes_by_dim[dim]

    def to_buckets(batch: pa.Table) -> pa.Table:
        vecs = np.array(batch[vec_col].to_pylist(), dtype=np.float64)
        ids = batch[id_col]
        planes = get_planes(vecs.shape[1])
        signs = (vecs @ planes.T) > 0
        keys = signs.dot(1 << np.arange(n_planes)).astype(np.int64)
        return pa.table({
            "band_key": pa.array(keys, pa.int64()),
            "doc_id": ids,
            "vec": pa.array([v.tobytes() for v in vecs], pa.binary()),
        })

    def cosine_mask(g: pa.Table, lo: np.ndarray, hi: np.ndarray) -> np.ndarray:
        raw = b"".join(g["vec"].to_pylist())
        v = np.frombuffer(raw, dtype=np.float64).reshape(g.num_rows, -1)
        norms = np.linalg.norm(v, axis=1)
        sims = np.einsum("ij,ij->i", v[lo], v[hi])
        denom = norms[lo] * norms[hi]
        with np.errstate(divide="ignore", invalid="ignore"):
            cos = np.where(denom > 0, sims / denom, -np.inf)
        return (denom > 0) & (cos >= threshold)

    bucketed = embeds_ds.map_batches(to_buckets, batch_format="pyarrow", zero_copy_batch=True)
    edges = _sweep_edges(
        bucketed, window=window, id_type=id_type, pair_mask_fn=cosine_mask
    )
    return _cluster_and_apply(embeds_ds, edges, id_col, edge_threshold=edge_threshold)


def segment_dedup_docs(docs_ds, *, text_col: str = "text",
                       id_col: str = "doc_id", seg_words: int = 10,
                       n_buckets: int = VERIFY_BUCKETS,
                       fingerprint: str = "xxh128"):
    """SUB-document (segment-level) exact dedup with document
    reassembly — the CCNet/RefinedWeb line-dedup primitive, adapted to
    newline-free corpora: documents split into fixed ``seg_words``-token
    windows; a segment survives only in its globally FIRST occurrence
    (order = (doc_id, seg_no)); surviving segments re-concatenate per
    document in original order. Output: (doc_id, text_clean) — docs
    whose every segment lost vanish, like the SQL mirror.

    Two bucketed shuffles, text ships once:
    1. winner election ships only (16-byte md5, ord) — ord = doc_id·2²⁰ +
       seg_no packs the keep-order into one int64 (contract: doc_id <
       2⁴³, segments/doc < 2²⁰); one sort per hash bucket, the segment
       sweep's FIRST row per hash is the winner (exact_dedup's sweep,
       min() needs no second reduce);
    2. since ord ENCODES doc_id, the winner list co-groups with the
       segments table on the SAME doc-bucket key — one cogroup both
       filters (vectorized is_in) and reassembles (segment sweep →
       ListArray offsets → binary_join), so no separate semi-join
       exchange.

    Fingerprint collision-freedom is assumed, as in exact_dedup; the
    hash is a grouping key only (winner = min ord per equal CONTENT
    group), so the vectorized two-seed xxh128 default and the legacy
    ``"md5"`` mode emit identical output (parity-tested) — the
    segmenter itself is the shared :func:`_segments_vectorized` (one
    RE2 split + one binary_join per batch, no per-doc Python).
    """
    from ..kg.unionfind import hash_bucket

    if fingerprint not in ("xxh128", "md5"):
        raise ValueError(f"unknown fingerprint mode: {fingerprint!r}")
    SEG_SHIFT = 20

    def to_segments(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].combine_chunks().to_numpy(zero_copy_only=False)
        seg_doc, seg_no, segs, harr, ords = _segments_vectorized(
            ids, batch[text_col], seg_words=seg_words,
            seg_shift=SEG_SHIFT, fingerprint=fingerprint)
        return pa.table({
            id_col: pa.array(ids[seg_doc], pa.int64()),
            "seg_no": pa.array(seg_no, pa.int64()),
            "seg": segs,
            "h": harr,
            "ord": pa.array(ords, pa.int64()),
        })

    segments = docs_ds.map_batches(
        to_segments, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    def hash_rows(batch: pa.Table) -> pa.Table:
        return pa.table({
            "__bucket": _md5_bucket(batch["h"].combine_chunks(), n_buckets),
            "h": batch["h"],
            "ord": batch["ord"],
        })

    def winners_bucket(group: pa.Table) -> pa.Table:
        order = pc.sort_indices(
            group, sort_keys=[("h", "ascending"), ("ord", "ascending")])
        g = group.take(order)
        h = g["h"].combine_chunks()
        n = g.num_rows
        neq = pc.not_equal(h.slice(1), h.slice(0, n - 1)).to_numpy(
            zero_copy_only=False)
        first = np.concatenate(([True], neq.astype(bool)))
        return pa.table({
            "ord": g["ord"].combine_chunks().filter(pa.array(first)),
        })

    winners = (
        segments.map_batches(hash_rows, batch_format="pyarrow",
                             zero_copy_batch=True)
        .groupby("__bucket").map_groups(winners_bucket,
                                        batch_format="pyarrow")
    )

    # cogroup on doc_id: segments carry side 0, winner ords side 1
    def tag_seg(batch: pa.Table) -> pa.Table:
        return pa.table({
            "__bucket": hash_bucket(
                batch[id_col].combine_chunks(), n_buckets),
            "__side": pa.nulls(batch.num_rows, pa.int8()).fill_null(0),
            id_col: batch[id_col],
            "seg_no": batch["seg_no"],
            "seg": batch["seg"],
            "ord": batch["ord"],
        })

    def tag_win(batch: pa.Table) -> pa.Table:
        ords = batch["ord"].combine_chunks()
        dids = pc.cast(pc.shift_right(ords, SEG_SHIFT), pa.int64())
        return pa.table({
            "__bucket": hash_bucket(dids, n_buckets),
            "__side": pa.nulls(batch.num_rows, pa.int8()).fill_null(1),
            id_col: dids,
            "seg_no": pa.nulls(batch.num_rows, pa.int64()),
            "seg": pa.nulls(batch.num_rows, pa.string()),
            "ord": ords,
        })

    def rebuild_bucket(group: pa.Table) -> pa.Table:
        side = group["__side"]
        segs = group.filter(pc.equal(side, 0))
        win = group.filter(pc.equal(side, 1))
        keep = pc.is_in(segs["ord"].combine_chunks(),
                        value_set=win["ord"].combine_chunks())
        kept = segs.filter(keep)
        if kept.num_rows == 0:
            return pa.table({
                id_col: pa.array([], pa.int64()),
                "text_clean": pa.array([], pa.string()),
            })
        order = pc.sort_indices(
            kept, sort_keys=[(id_col, "ascending"), ("seg_no", "ascending")])
        g = kept.take(order)
        ids = g[id_col].combine_chunks()
        n = g.num_rows
        neq = pc.not_equal(ids.slice(1), ids.slice(0, n - 1)).to_numpy(
            zero_copy_only=False)
        starts = np.flatnonzero(np.concatenate(([True], neq.astype(bool))))
        offsets = pa.array(np.append(starts, n).astype(np.int32))
        lists = pa.ListArray.from_arrays(
            offsets, g["seg"].combine_chunks())
        return pa.table({
            id_col: ids.take(pa.array(starts, pa.int64())),
            "text_clean": pc.binary_join(lists, " "),
        })

    tagged = segments.map_batches(
        tag_seg, batch_format="pyarrow", zero_copy_batch=True
    ).union(winners.map_batches(tag_win, batch_format="pyarrow"))
    return tagged.groupby("__bucket").map_groups(
        rebuild_bucket, batch_format="pyarrow")


def dup_spans(ds, *, w: int = 8, stride: int = 4, text_col: str = "text",
              id_col: str = "doc_id", n_buckets: int = 256):
    """Substring-level duplicate-span statistics (the suffix-window
    flavor of exact dedup, Lee et al. 2021 "Deduplicating Training Data
    Makes Language Models Better"): slide OVERLAPPING ``w``-token
    windows every ``stride`` tokens over each document, fingerprint
    each span with md5, and report every span text that occurs more
    than once anywhere in the corpus as (span_h, n_occ, n_docs).

    Scale shape: the flat-map emits only (md5, doc_id) — span TEXT
    never leaves the map side — and a per-batch (h, doc) count partial
    collapses in-block repeats. ONE bucketed shuffle
    (``hash(h) % n_buckets``) then computes both levels of aggregation
    (occurrence sum, distinct-doc count) vectorized inside each bucket;
    a hot boilerplate span costs one row per (block) in the exchange,
    not one per occurrence. Tokenization (lowercase, RE2 ``\\s`` split,
    empties dropped) and windowing (full windows only: starts
    ``0, stride, …`` with ``start + w ≤ len``) are mirrored exactly by
    the SQL list-slice oracle."""
    import hashlib

    from ..kg.unionfind import hash_bucket

    def spans_partial(batch: pa.Table) -> pa.Table:
        # window STRINGS are built vectorized (lowercase per doc, one
        # RE2 split per batch, strided gather + one binary_join); the
        # md5 hex stays a per-window hashlib call because span_h is the
        # op's OUTPUT column, mirrored by the SQL oracle's md5()
        ids = batch[id_col].combine_chunks().to_numpy(zero_copy_only=False)
        lowered = pa.array([(t or "").lower()
                            for t in batch[text_col].to_pylist()],
                           pa.string())
        flat, lens = _flat_tokens(lowered)
        nw = np.where(lens >= w, (lens - w) // stride + 1, 0)
        total = int(nw.sum())
        win_doc = np.repeat(np.arange(lens.size), nw)
        pos = (np.arange(total, dtype=np.int64)
               - (np.cumsum(nw) - nw)[win_doc]) * stride
        gstart = (np.cumsum(lens) - lens)[win_doc] + pos
        idx = (gstart[:, None] + np.arange(w, dtype=np.int64)).ravel()
        words = flat.take(pa.array(idx, pa.int64()))
        lists = pa.LargeListArray.from_arrays(
            pa.array(np.arange(total + 1, dtype=np.int64) * w), words)
        spans = pc.cast(pc.binary_join(lists, " "), pa.string())
        hs = [hashlib.md5(s.encode()).hexdigest()
              for s in spans.to_pylist()]
        t = pa.table({
            "h": pa.array(hs, pa.string()),
            id_col: pa.array(ids[win_doc], pa.int64()),
            "c": pa.array(np.ones(total, np.int64), pa.int64()),
        })
        part = (t.group_by(["h", id_col]).aggregate([("c", "sum")])
                .rename_columns(["h", id_col, "c"]))
        return part.append_column(
            "__bucket", hash_bucket(part["h"].combine_chunks(), n_buckets))

    def reduce_bucket(group: pa.Table) -> pa.Table:
        pair = (group.group_by(["h", id_col]).aggregate([("c", "sum")])
                .rename_columns(["h", id_col, "n"]))
        agg = (pair.group_by("h")
               .aggregate([("n", "sum"), (id_col, "count")])
               .rename_columns(["span_h", "n_occ", "n_docs"]))
        return agg.filter(pc.greater(agg["n_occ"], 1))

    return (
        ds.map_batches(spans_partial, batch_format="pyarrow",
                       zero_copy_batch=True)
        .groupby("__bucket")
        .map_groups(reduce_bucket, batch_format="pyarrow")
    )


def source_segment_overlap(docs_ds, *, text_col: str = "text",
                           group_col: str = "source", seg_words: int = 10,
                           n_buckets: int = VERIFY_BUCKETS):
    """Cross-source boilerplate matrix: for every pair of sources, the
    number of DISTINCT ``seg_words``-token segment contents present in
    BOTH — the contamination-style diagnostic that tells a corpus
    curator which crawl sources share templates (and should share a
    dedup pass).

    Scale shape: segments never ship — each block emits its distinct
    (fingerprint, source) pairs (combiner); ONE bucketed cogroup on
    hash(fingerprint) sorts (h, source), drops duplicate (h, source)
    rows and emits the within-segment source pairs via the shared
    vectorized segment-pair sweep; per-(s1, s2) partial counts fold
    map-side and one tiny native groupby-sum finishes. Pair fanout per
    segment content is C(k, 2) with k ≤ |sources| — the SOURCE DOMAIN
    must be catalog-order (crawl-source scale, not doc scale), which is
    the operator's stated contract. Output: (s1, s2, n_shared) with
    s1 < s2. The fingerprint is purely internal (content-equality key;
    the SQL oracle groups on the segment STRING), so it is the
    vectorized 16-byte xxh128 of :func:`_segments_vectorized` under
    the module's collision-freedom assumption — no per-doc Python.
    """
    from .graph import _pairs_within_segments

    def to_pairs(batch: pa.Table) -> pa.Table:
        seg_doc, _, _, harr, _ = _segments_vectorized(
            np.zeros(batch.num_rows, np.int64), batch[text_col],
            seg_words=seg_words, seg_shift=20, fingerprint="xxh128")
        t = pa.table({
            "h": harr,
            "g": batch[group_col].combine_chunks().take(
                pa.array(seg_doc)),
        })
        t = t.group_by(["h", "g"]).aggregate([])  # per-block distinct
        return t.append_column(
            "__bucket", _md5_bucket(t["h"].combine_chunks(), n_buckets))

    def pairs_bucket(group: pa.Table) -> pa.Table:
        order = pc.sort_indices(
            group, sort_keys=[("h", "ascending"), ("g", "ascending")])
        gt = group.take(order)
        h = gt["h"].combine_chunks()
        g = gt["g"].combine_chunks()
        n = gt.num_rows
        if n == 0:
            return pa.table({"s1": pa.array([], pa.string()),
                             "s2": pa.array([], pa.string()),
                             "c": pa.array([], pa.int64())})
        same_h = np.zeros(n, dtype=bool)
        same_g = np.zeros(n, dtype=bool)
        if n > 1:
            same_h[1:] = pc.equal(h.slice(1), h.slice(0, n - 1)).to_numpy(
                zero_copy_only=False)
            same_g[1:] = pc.equal(g.slice(1), g.slice(0, n - 1)).to_numpy(
                zero_copy_only=False)
        keep = ~(same_h & same_g)  # distinct (h, g) across blocks
        h = h.filter(pa.array(keep))
        g = g.filter(pa.array(keep))
        m = len(h)
        new_seg = np.ones(m, dtype=bool)
        if m > 1:
            new_seg[1:] = np.invert(
                pc.equal(h.slice(1), h.slice(0, m - 1)).to_numpy(
                    zero_copy_only=False).astype(bool))
        idx = np.arange(m, dtype=np.int64)
        seg_start = idx[new_seg]
        seg_id = np.cumsum(new_seg) - 1
        w = idx - seg_start[seg_id]
        i, j = _pairs_within_segments(w)
        t = pa.table({"s1": g.take(pa.array(i, pa.int64())),
                      "s2": g.take(pa.array(j, pa.int64())),
                      "c": pa.nulls(len(i), pa.int64()).fill_null(1)})
        agg = t.group_by(["s1", "s2"]).aggregate([("c", "sum")])
        return agg.rename_columns(["s1", "s2", "c"])

    out = (docs_ds.map_batches(to_pairs, batch_format="pyarrow",
                               zero_copy_batch=True)
           .groupby("__bucket").map_groups(pairs_bucket,
                                           batch_format="pyarrow")
           .groupby(["s1", "s2"]).sum("c"))
    return out.map_batches(
        lambda b: b.rename_columns(["s1", "s2", "n_shared"]),
        batch_format="pyarrow")


def incremental_segment_dedup(docs_ds, *, text_col: str = "text",
                              id_col: str = "doc_id", seg_words: int = 10,
                              base_numer: int = 9, base_denom: int = 10):
    """Incremental-ingestion dedup diagnostic: treat the deterministic
    ``base_numer/base_denom`` id-hash split as the ALREADY-INGESTED
    corpus and the complement as the incoming batch; for every incoming
    document report how many of its ``seg_words``-token segments
    already exist in the base — the decision signal an ingestion
    pipeline uses to drop, trim, or keep a new document.

    Scale shape: segments ship as 16-byte fingerprints only; the base
    side applies a per-block distinct combiner; ONE bucketed left-outer
    cogroup on the segment fingerprint flags incoming segments
    (``bucket_join`` with ``right_distinct``), and per-doc
    (n_segs, n_dup) partials fold map-side into a native groupby-sum.
    The base fingerprint set is corpus-order and is never broadcast or
    collected. The fingerprint is purely internal (the oracle matches
    segment STRINGS), so it is the vectorized xxh128 of
    :func:`_segments_vectorized` — the base/incoming id-hash split
    stays the md5-of-str(id) the SQL mirrors. Output:
    (doc_id, n_segs, n_dup).
    """
    from .cogroup import bucket_join
    from .sample import _hash64

    def to_segments(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].combine_chunks().to_numpy(zero_copy_only=False)
        is_base = (_hash64(ids.tolist()) % base_denom) < base_numer
        seg_doc, _, _, harr, _ = _segments_vectorized(
            ids, batch[text_col], seg_words=seg_words, seg_shift=20,
            fingerprint="xxh128")
        return pa.table({
            id_col: pa.array(ids[seg_doc], pa.int64()),
            "h": harr,
            "is_base": pa.array(is_base[seg_doc]),
        })

    segs = docs_ds.map_batches(to_segments, batch_format="pyarrow",
                               zero_copy_batch=True).materialize()

    def base_side(batch: pa.Table) -> pa.Table:
        t = batch.filter(batch["is_base"]).select(["h"])
        uniq = pc.unique(t["h"].combine_chunks())
        return pa.table({
            "h": uniq,
            "hit": pa.nulls(len(uniq), pa.int64()).fill_null(1),
        })

    def inc_side(batch: pa.Table) -> pa.Table:
        return batch.filter(
            pc.invert(batch["is_base"])).select([id_col, "h"])

    base = segs.map_batches(base_side, batch_format="pyarrow",
                            zero_copy_batch=True)
    inc = segs.map_batches(inc_side, batch_format="pyarrow",
                           zero_copy_batch=True)
    flagged = bucket_join(
        inc, base, key="h", join_type="left outer", right_distinct=True,
        left_schema=pa.schema([(id_col, pa.int64()), ("h", pa.binary(16))]),
        right_schema=pa.schema([("h", pa.binary(16)), ("hit", pa.int64())]),
    )

    def doc_partial(batch: pa.Table) -> pa.Table:
        t = pa.table({
            id_col: batch[id_col],
            "n_segs": pa.nulls(batch.num_rows, pa.int64()).fill_null(1),
            "n_dup": batch["hit"].combine_chunks().fill_null(0),
        })
        g = t.group_by(id_col).aggregate([("n_segs", "sum"),
                                          ("n_dup", "sum")])
        return g.rename_columns([id_col, "n_segs", "n_dup"])

    out = (flagged.map_batches(doc_partial, batch_format="pyarrow",
                               zero_copy_batch=True)
           .groupby(id_col).sum(["n_segs", "n_dup"]))
    return out.map_batches(
        lambda b: b.rename_columns([id_col, "n_segs", "n_dup"]),
        batch_format="pyarrow")


def provenance_dedup(docs_ds, *, text_col: str = "text",
                     id_col: str = "doc_id", rank_col: str = "rank",
                     prefix_words: int = 8):
    """Cross-source preferred-provenance dedup: documents sharing the
    same ``prefix_words``-token normalized prefix (the near-title key a
    crawl uses to spot re-hosted copies) collapse to ONE preferred copy
    — the row with the smallest ``(rank_col, id_col)``, where the
    caller derives ``rank_col`` from source priority (lower = more
    trusted). Returns (id, keep_id, kept) for every input doc.

    Scale shape: text reduces to a 32-char md5 key map-side and never
    shuffles; winner election reuses :func:`group_arg_extreme`
    (combiner + one bucket-capped groupby); the keep-id fans back to
    all members via ONE bucketed cogroup join on the key. Three narrow
    exchanges total, none carrying text.
    """
    from .argext import group_arg_extreme
    from .cogroup import bucket_join

    def keyed(batch: pa.Table) -> pa.Table:
        from ..textnorm import ascii_words
        hs = []
        for t in batch[text_col].to_pylist():
            pref = " ".join(ascii_words((t or "").lower())[:prefix_words])
            hs.append(hashlib.md5(pref.encode("utf-8")).hexdigest())
        return pa.table({
            "h": pa.array(hs, pa.string()),
            id_col: batch[id_col],
            rank_col: batch[rank_col],
        })

    keys = docs_ds.map_batches(keyed, batch_format="pyarrow",
                               zero_copy_batch=True).materialize()
    winners = group_arg_extreme(
        keys, key="h",
        order_cols=[(rank_col, "ascending"), (id_col, "ascending")],
    ).map_batches(
        lambda b: pa.table({"h": b["h"], "keep_id": b[id_col]}),
        batch_format="pyarrow")

    joined = bucket_join(
        keys.map_batches(lambda b: b.select(["h", id_col]),
                         batch_format="pyarrow"),
        winners, key="h", join_type="inner",
        left_schema=pa.schema([("h", pa.string()), (id_col, pa.int64())]),
        right_schema=pa.schema([("h", pa.string()), ("keep_id", pa.int64())]),
    )

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table({
            id_col: batch[id_col],
            "keep_id": batch["keep_id"],
            "kept": pc.equal(batch[id_col], batch["keep_id"]),
        })

    return joined.map_batches(finish, batch_format="pyarrow",
                              zero_copy_batch=True)


def neardup_ingest(docs_ds, *, threshold: float = 0.7, num_perm: int = 64,
                   bands: int = 16, shingle_k: int = 5, window: int = 256,
                   text_col: str = "text", id_col: str = "doc_id",
                   base_numer: int = 9, base_denom: int = 10):
    """Streaming-ingest NEAR-duplicate decision (the minhash twin of
    :func:`incremental_segment_dedup`): the md5 id-hash split models
    the persisted index (``base_numer/base_denom`` of docs = already
    ingested, complement = the incoming batch), and each incoming doc
    is checked against the base by exactly the decision
    :func:`minhash_dedup` makes — full-band LSH collision AND signature
    agreement ≥ threshold. Output: (doc_id, dup_of) for every incoming
    doc; dup_of = smallest matching base doc, −1 when novel.

    Scale shape: only incoming×base candidate pairs are verified —
    base×base pairs are dropped before any signature ships (the
    already-clustered index never re-verifies itself). In a production
    ingest the base band rows/signatures come from the persisted store
    (16 B band rows + 512 B sigs per doc); here both sides are sketched
    in one pass so the DuckDB oracle can reproduce the decision
    bit-exactly. ``window`` bounds in-band pair generation; unlike
    minhash_dedup, cross-side pairs get no chain-transitivity rescue,
    so it defaults 8× wider (oversized-band truncation is visible via
    :func:`oversized_band_count`).
    """
    from .cogroup import bucket_join
    from .sample import _hash64

    id_type = docs_ds.schema().types[docs_ds.schema().names.index(id_col)]

    def base_mask(ids) -> np.ndarray:
        return (_hash64(ids) % np.uint64(base_denom)) < np.uint64(base_numer)

    sigs = docs_ds.map_batches(
        _ComputeSigs(num_perm, shingle_k, text_col, id_col),
        batch_format="pyarrow", zero_copy_batch=True, batch_size=256,
    ).materialize()  # feeds bands + two sig attaches
    banded = sigs.map_batches(
        _band_rows_from_sigs(num_perm, bands), batch_format="pyarrow"
    )
    cands = _sweep_edges(banded, window=window, id_type=id_type)

    def cross_only(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        s = base_mask(batch["src"].to_pylist())
        d = base_mask(batch["dst"].to_pylist())
        return batch.filter(pa.array(s != d))

    def est_keep(batch: pa.Table) -> np.ndarray:
        a = np.frombuffer(
            b"".join(batch["pay_a"].to_pylist()), dtype=np.uint64
        ).reshape(-1, num_perm)
        b = np.frombuffer(
            b"".join(batch["pay_b"].to_pylist()), dtype=np.uint64
        ).reshape(-1, num_perm)
        return (a == b).mean(axis=1) >= threshold

    edges = _attach_and_verify_sigs(
        cands.map_batches(cross_only, batch_format="pyarrow",
                          zero_copy_batch=True),
        sigs, id_type=id_type, payload_col="sig", verify_batch_fn=est_keep,
    )

    def orient(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"inc": pa.array([], id_type),
                             "base": pa.array([], id_type)})
        sb = pa.array(base_mask(batch["src"].to_pylist()))
        return pa.table({
            "inc": pc.if_else(sb, batch["dst"], batch["src"]),
            "base": pc.if_else(sb, batch["src"], batch["dst"]),
        })

    hits = (edges.map_batches(orient, batch_format="pyarrow")
            .groupby("inc").min("base")
            .map_batches(lambda b: b.rename_columns(["inc", "dup_of"]),
                         batch_format="pyarrow"))

    def incoming(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_pylist()
        keep = ~base_mask(ids)
        return pa.table({"inc": batch[id_col]}).filter(pa.array(keep))

    inc_ds = docs_ds.map_batches(incoming, batch_format="pyarrow",
                                 zero_copy_batch=True)
    j = bucket_join(
        inc_ds, hits, key="inc", join_type="left outer",
        left_schema=pa.schema([("inc", id_type)]),
        right_schema=pa.schema([("inc", id_type), ("dup_of", id_type)]),
    )
    return j.map_batches(
        lambda b: pa.table({
            id_col: b["inc"],
            "dup_of": pc.fill_null(b["dup_of"], -1),
        }), batch_format="pyarrow")


def dup_span_strip(ds, *, k: int = 8, text_col: str = "text",
                   id_col: str = "doc_id", n_buckets: int = VERIFY_BUCKETS,
                   fingerprint: str = "xxh128"):
    """APPLY the Lee-et-al duplicate-substring policy: a token is
    *covered* when any ``k``-token window containing it occurs more than
    once anywhere in the corpus (stride 1 — exact, unlike
    :func:`dup_spans`' stride-4 statistics); emit per doc the coverage
    count and the text with every covered token removed —
    ``(doc_id, n_tokens, dup_tokens, text_clean)``, one row per input
    doc (``text_clean=''`` when everything was duplicated).

    Scale shape: the window flat-map emits only (fingerprint, ord)
    where ord packs (doc_id, pos) into one int64 (doc_id < 2⁴²,
    pos < 2²¹ — loud ValueError beyond) — span text never leaves the
    map side and the widest exchange is 28 B/token. ONE bucketed
    shuffle on hash(fingerprint) both counts occurrences per
    fingerprint and filters the position rows to duplicated windows
    (all occurrences of a fingerprint land in one bucket, so the >1
    test is local and exact); a second bucketed cogroup on
    hash(doc_id) ships each doc's text once next to its covered
    positions and rebuilds the stripped text with a vectorized
    interval-union sweep. No all-pairs, no driver state.

    Tokenization (RE2 ``\\s`` split, empties dropped, case preserved)
    and windowing (full windows only) are mirrored exactly by the SQL
    list-slice oracle. The fingerprint is a GROUPING KEY only — the
    output depends on it solely through which windows collide, so any
    collision-free 128-bit content hash yields the identical result.
    ``fingerprint="xxh128"`` (default) is fully vectorized: tokens are
    split once per column (``_flat_tokens``), every token occurrence is
    hashed in one vectorized pass (``_xxh_pair``: two-seed polars
    xxhash — per-occurrence, which measured faster than
    dictionary-encoding to uniques first), and the k token hashes of
    every window combine through two independent uint64 Horner chains —
    no per-window Python, no per-window string join. ``fingerprint="md5"`` keeps the original
    per-window ``md5(" ".join(window))`` digest (the SQL oracle's
    formulation verbatim) for cross-checking — the parity test asserts
    both modes emit identical output. Collision-freedom of either
    128-bit fingerprint is assumed as in exact_dedup.

    Fingerprints ship as 16-byte fixed-size binary digests, not 32-char
    hex (the exchange is one row per token — the halved key width is a
    ~35% volume cut, measured in BENCH/strip_stress); _md5_bucket masks
    the fingerprint's first 8 bytes directly (uniform — no mixing
    finalizer, identical bytes in every process by construction).
    """
    import hashlib

    from ..kg.unionfind import hash_bucket
    from ..textnorm import ascii_words

    if fingerprint not in ("xxh128", "md5"):
        raise ValueError(f"unknown fingerprint mode: {fingerprint!r}")
    B1 = np.uint64(0x100000001B3)          # FNV-1a prime
    B2 = np.uint64(0xC6A4A7935BD1E995)     # Murmur2 multiplier

    # (doc_id, pos) packs into one int64 on the per-token exchange —
    # a 22% byte cut on the operator's widest shuffle (36 → 28 B/row).
    # Loud contract: pos < 2^21 (≤ 2M tokens/doc) and doc_id < 2^42.
    POS_SHIFT = 21
    POS_MASK = (1 << POS_SHIFT) - 1

    def _pack_ord(dids: np.ndarray, poss: np.ndarray) -> np.ndarray:
        if poss.size and int(poss.max()) > POS_MASK:
            raise ValueError(
                f"dup_span_strip: a document exceeds {POS_MASK + 1} "
                "tokens — the packed (doc_id, pos) exchange contract "
                "does not hold; split the document upstream")
        if dids.size and (int(dids.max()) >= (1 << 42)
                          or int(dids.min()) < 0):
            raise ValueError("dup_span_strip: doc_id outside [0, 2^42) "
                             "breaks the packed (doc_id, pos) exchange "
                             "contract")
        return (dids << np.int64(POS_SHIFT)) | poss

    def _windows_empty() -> pa.Table:
        return pa.table({
            "h": pa.array([], pa.binary(16)),
            "ord": pa.array([], pa.int64()),
            "__bucket": pa.array([], pa.int32()),
        })

    def to_windows(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _windows_empty()
        if fingerprint == "md5":
            hs, dids, poss = [], [], []
            for did, t in zip(batch[id_col].to_pylist(),
                              batch[text_col].to_pylist()):
                ws = ascii_words(t or "")
                for p in range(0, len(ws) - k + 1):
                    hs.append(hashlib.md5(
                        " ".join(ws[p:p + k]).encode("utf-8")).digest())
                    dids.append(did)
                    poss.append(p)
            harr = pa.array(hs, pa.binary(16))
            ords = _pack_ord(np.array(dids, np.int64),
                             np.array(poss, np.int64))
        else:
            ids = batch[id_col].combine_chunks().to_numpy(
                zero_copy_only=False)
            flat, lens = _flat_tokens(batch[text_col])
            nw = np.maximum(lens - k + 1, 0)
            total = int(nw.sum())
            if total == 0:
                return _windows_empty()
            win_doc = np.repeat(np.arange(lens.size), nw)
            pos = np.arange(total, dtype=np.int64) - (np.cumsum(nw)
                                                      - nw)[win_doc]
            gstart = (np.cumsum(lens) - lens)[win_doc] + pos
            h1, h2 = _xxh_pair(flat)
            w1, w2 = h1[gstart].copy(), h2[gstart].copy()
            for i in range(1, k):
                gi = gstart + i
                w1 = w1 * B1 + h1[gi]
                w2 = w2 * B2 + h2[gi]
            harr = _pack_bin16(w1, w2)
            ords = _pack_ord(ids[win_doc].astype(np.int64), pos)
        return pa.table({
            "h": harr,
            "ord": pa.array(ords, pa.int64()),
            "__bucket": _md5_bucket(harr, n_buckets),
        })

    def covered_bucket(group: pa.Table) -> pa.Table:
        order = pc.sort_indices(group, sort_keys=[("h", "ascending")])
        g = group.take(order)
        h = g["h"].combine_chunks()
        n = g.num_rows
        neq = pc.not_equal(h.slice(1), h.slice(0, n - 1)).to_numpy(
            zero_copy_only=False).astype(bool)
        starts = np.flatnonzero(np.concatenate(([True], neq)))
        counts = np.diff(np.append(starts, n))
        dup_rows = np.repeat(counts > 1, counts)
        flt = g.filter(pa.array(dup_rows))
        return pa.table({"ord": flt["ord"]})

    covered = (ds.map_batches(to_windows, batch_format="pyarrow",
                              zero_copy_batch=True)
               .groupby("__bucket")
               .map_groups(covered_bucket, batch_format="pyarrow"))

    def tag_doc(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].combine_chunks()
        return pa.table({
            "__bucket": hash_bucket(ids, n_buckets),
            "__side": pa.nulls(batch.num_rows, pa.int8()).fill_null(0),
            id_col: ids,
            text_col: batch[text_col],
            "ord": pa.nulls(batch.num_rows, pa.int64()),
        })

    def tag_cov(batch: pa.Table) -> pa.Table:
        ords = batch["ord"].combine_chunks()
        dids = pc.cast(pc.shift_right(ords, POS_SHIFT), pa.int64())
        return pa.table({
            "__bucket": hash_bucket(dids, n_buckets),
            "__side": pa.nulls(batch.num_rows, pa.int8()).fill_null(1),
            id_col: dids,
            text_col: pa.nulls(batch.num_rows, pa.string()),
            "ord": ords,
        })

    def strip_bucket(group: pa.Table) -> pa.Table:
        # vectorized coverage + rebuild: tokenize the bucket's docs once
        # into one flat token array, mark covered tokens with a single
        # scatter-add interval sweep over GLOBAL flat positions (full
        # windows never cross a doc boundary, so intervals can't bleed
        # into the next doc), then reassemble every doc's kept tokens in
        # one binary_join over a list view of the filtered flat array.
        side = group["__side"]
        docs = group.filter(pc.equal(side, 0))
        cov = group.filter(pc.equal(side, 1))
        ids = docs[id_col].combine_chunks().to_numpy(zero_copy_only=False)
        flat, lens = _flat_tokens(docs[text_col])
        total = int(lens.sum())
        doc_off = np.cumsum(lens) - lens
        covmask = np.zeros(total, bool)
        if cov.num_rows and total:
            cord = cov["ord"].combine_chunks().to_numpy(
                zero_copy_only=False)
            cids = cord >> np.int64(POS_SHIFT)
            cpos = cord & np.int64(POS_MASK)
            order = np.argsort(ids, kind="stable")
            di = order[np.searchsorted(ids[order], cids)]
            gs = doc_off[di] + cpos
            diff = np.zeros(total + 1, np.int64)
            np.add.at(diff, gs, 1)       # positions are unique per doc
            np.add.at(diff, gs + k, -1)  # p + k <= len(doc) ≤ next start
            covmask = np.cumsum(diff[:total]) > 0
        parent = np.repeat(np.arange(ids.size), lens)
        dup = np.bincount(parent[covmask],
                          minlength=ids.size).astype(np.int64)
        kept = flat.filter(pa.array(~covmask))
        offsets = np.concatenate(([0], np.cumsum(lens - dup)))
        lists = pa.LargeListArray.from_arrays(
            pa.array(offsets, pa.int64()), kept)
        return pa.table({
            id_col: pa.array(ids, pa.int64()),
            "n_tokens": pa.array(lens, pa.int64()),
            "dup_tokens": pa.array(dup, pa.int64()),
            "text_clean": pc.cast(pc.binary_join(lists, " "), pa.string()),
        })

    tagged = ds.map_batches(
        tag_doc, batch_format="pyarrow", zero_copy_batch=True
    ).union(covered.map_batches(tag_cov, batch_format="pyarrow"))
    return tagged.groupby("__bucket").map_groups(
        strip_bucket, batch_format="pyarrow")


def source_template_strip(docs_ds, *, text_col: str = "text",
                          id_col: str = "doc_id", group_col: str = "source",
                          seg_words: int = 10, min_docs: int = 2,
                          n_buckets: int = VERIFY_BUCKETS,
                          fingerprint: str = "xxh128"):
    """WITHIN-source template removal — the site-level boilerplate pass
    a crawl curator runs before global dedup: a ``seg_words``-token
    segment whose content appears in ≥ ``min_docs`` DISTINCT documents
    of the SAME source is a template, and every occurrence of it is
    stripped (unlike :func:`segment_dedup_docs`, which keeps the first).
    Output one row per doc with ≥1 segment:
    ``(doc_id, n_segs, n_template_segs, text_clean)`` (``text_clean=''``
    for all-template docs).

    Scale shape (segment_dedup's two-exchange layout, text ships once):
    1. template election ships only (16-byte md5, source, doc_id, ord) — one
       bucketed shuffle on hash(md5); inside a bucket a vectorized sort
       + boundary sweep counts distinct docs per (source, content) and
       emits the ord of EVERY row in template groups (``ord`` packs
       (doc_id, seg_no) as in segment_dedup: doc_id < 2⁴³,
       segments/doc < 2²⁰);
    2. since ord encodes doc_id, the loser list cogroups with the
       segment table on the doc-bucket key — one cogroup filters
       (vectorized is_in) and reassembles per doc via ListArray offsets
       + binary_join, emitting empty text for fully-templated docs.

    Segmentation is vectorized: one RE2 split per column
    (``_flat_tokens``), then — because non-overlapping ``seg_words``
    segments tile each doc's token run exactly — a single ListArray
    view over the flat token array materializes every segment string
    through one ``binary_join``. The content fingerprint is a grouping
    key only (output depends on it solely through collisions), so
    ``fingerprint="xxh128"`` (default) hashes the segment strings with
    the two-seed vectorized polars path (``_xxh_pair``) while
    ``fingerprint="md5"`` keeps the SQL oracle's per-segment digest for
    cross-checking; the parity test asserts identical output.

    A NULL ``group_col`` is filled to the ``''`` sentinel before
    grouping (null-source docs template against each other and against
    ``''``-source docs). The SQL oracle's equality join never matches
    NULL sources; the graded corpus has none — the sentinel exists so
    a null-source crawl degrades to sane grouping instead of silently
    mis-sweeping group boundaries (round-4 ADVICE).
    """
    from ..kg.unionfind import hash_bucket

    if fingerprint not in ("xxh128", "md5"):
        raise ValueError(f"unknown fingerprint mode: {fingerprint!r}")
    SEG_SHIFT = 20

    def to_segments(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({
                id_col: pa.array([], pa.int64()),
                "seg_no": pa.array([], pa.int64()),
                "seg": pa.array([], pa.string()),
                "h": pa.array([], pa.binary(16)),
                "src": pa.array([], pa.string()),
                "ord": pa.array([], pa.int64()),
            })
        ids = batch[id_col].combine_chunks().to_numpy(zero_copy_only=False)
        srcs = pc.fill_null(batch[group_col].combine_chunks(), "")
        seg_doc, seg_no, segs, harr, ords = _segments_vectorized(
            ids, batch[text_col], seg_words=seg_words,
            seg_shift=SEG_SHIFT, fingerprint=fingerprint)
        return pa.table({
            id_col: pa.array(ids[seg_doc], pa.int64()),
            "seg_no": pa.array(seg_no, pa.int64()),
            "seg": segs,
            "h": harr,
            "src": srcs.take(pa.array(seg_doc)),
            "ord": pa.array(ords, pa.int64()),
        })

    segments = docs_ds.map_batches(
        to_segments, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    def hash_rows(batch: pa.Table) -> pa.Table:
        return pa.table({
            "__bucket": _md5_bucket(batch["h"].combine_chunks(), n_buckets),
            "h": batch["h"],
            "src": batch["src"],
            id_col: batch[id_col],
            "ord": batch["ord"],
        })

    def losers_bucket(group: pa.Table) -> pa.Table:
        order = pc.sort_indices(group, sort_keys=[
            ("src", "ascending"), ("h", "ascending"),
            (id_col, "ascending")])
        g = group.take(order)
        n = g.num_rows
        src = g["src"].combine_chunks()
        h = g["h"].combine_chunks()
        did = g[id_col].combine_chunks()
        src_neq = pc.not_equal(src.slice(1), src.slice(0, n - 1)).to_numpy(
            zero_copy_only=False).astype(bool)
        h_neq = pc.not_equal(h.slice(1), h.slice(0, n - 1)).to_numpy(
            zero_copy_only=False).astype(bool)
        new_grp = np.concatenate(([True], src_neq | h_neq))
        did_neq = pc.not_equal(did.slice(1), did.slice(0, n - 1)).to_numpy(
            zero_copy_only=False).astype(bool)
        new_doc = new_grp | np.concatenate(([True], did_neq))
        gidx = np.cumsum(new_grp) - 1
        ndistinct = np.bincount(gidx[new_doc],
                                minlength=int(gidx[-1]) + 1 if n else 0)
        is_template = ndistinct >= min_docs
        mask = is_template[gidx]
        return pa.table({"ord": g["ord"].combine_chunks().filter(
            pa.array(mask))})

    losers = (segments.map_batches(hash_rows, batch_format="pyarrow",
                                   zero_copy_batch=True)
              .groupby("__bucket")
              .map_groups(losers_bucket, batch_format="pyarrow"))

    def tag_seg(batch: pa.Table) -> pa.Table:
        return pa.table({
            "__bucket": hash_bucket(
                batch[id_col].combine_chunks(), n_buckets),
            "__side": pa.nulls(batch.num_rows, pa.int8()).fill_null(0),
            id_col: batch[id_col],
            "seg_no": batch["seg_no"],
            "seg": batch["seg"],
            "ord": batch["ord"],
        })

    def tag_loser(batch: pa.Table) -> pa.Table:
        ords = batch["ord"].combine_chunks()
        dids = pc.cast(pc.shift_right(ords, SEG_SHIFT), pa.int64())
        return pa.table({
            "__bucket": hash_bucket(dids, n_buckets),
            "__side": pa.nulls(batch.num_rows, pa.int8()).fill_null(1),
            id_col: dids,
            "seg_no": pa.nulls(batch.num_rows, pa.int64()),
            "seg": pa.nulls(batch.num_rows, pa.string()),
            "ord": ords,
        })

    def rebuild_bucket(group: pa.Table) -> pa.Table:
        side = group["__side"]
        segs = group.filter(pc.equal(side, 0))
        lose = group.filter(pc.equal(side, 1))
        if segs.num_rows == 0:
            return pa.table({
                id_col: pa.array([], pa.int64()),
                "n_segs": pa.array([], pa.int64()),
                "n_template_segs": pa.array([], pa.int64()),
                "text_clean": pa.array([], pa.string()),
            })
        order = pc.sort_indices(
            segs, sort_keys=[(id_col, "ascending"), ("seg_no", "ascending")])
        g = segs.take(order)
        n = g.num_rows
        ids = g[id_col].combine_chunks()
        is_loser = pc.is_in(
            g["ord"].combine_chunks(),
            value_set=lose["ord"].combine_chunks()).to_numpy(
            zero_copy_only=False).astype(bool)
        neq = pc.not_equal(ids.slice(1), ids.slice(0, n - 1)).to_numpy(
            zero_copy_only=False).astype(bool)
        new_doc = np.concatenate(([True], neq))
        starts = np.flatnonzero(new_doc)
        seg_counts = np.diff(np.append(starts, n))
        didx = np.cumsum(new_doc) - 1
        n_templ = np.bincount(didx[is_loser], minlength=len(starts))
        kept = g.filter(pa.array(~is_loser))
        kept_counts = seg_counts - n_templ
        offsets = pa.array(
            np.concatenate(([0], np.cumsum(kept_counts))).astype(np.int32))
        lists = pa.ListArray.from_arrays(offsets, kept["seg"].combine_chunks())
        return pa.table({
            id_col: ids.take(pa.array(starts, pa.int64())),
            "n_segs": pa.array(seg_counts, pa.int64()),
            "n_template_segs": pa.array(n_templ, pa.int64()),
            "text_clean": pc.binary_join(lists, " "),
        })

    tagged = segments.map_batches(
        tag_seg, batch_format="pyarrow", zero_copy_batch=True
    ).union(losers.map_batches(tag_loser, batch_format="pyarrow"))
    return tagged.groupby("__bucket").map_groups(
        rebuild_bucket, batch_format="pyarrow")
