"""Similarity search over an embedding column (``list<float>``).

* :func:`brute_force_topk` — exact cosine top-k: the query matrix is
  broadcast once (``ray.put``), each batch does one numpy matmul and
  emits its LOCAL top-k per query, and a final per-query reduction keeps
  the global top-k. The shuffle carries at most (queries × k) rows per
  block — never the corpus.
* :class:`IVFIndex` — the scale path: deterministic k-means (fixed init,
  few iterations, fit on a driver-side sample), bucket assignment as a
  map stage, queries probe the ``n_probe`` nearest centroids so only a
  fraction of the corpus is scored.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _as_matrix(col) -> np.ndarray:
    """Arrow list-of-float column → (n, dim) float64 matrix without a
    Python-object round-trip: flatten the child values buffer (zero-copy
    for fixed-size lists and offset-uniform lists) and reshape."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if pa.types.is_fixed_size_list(arr.type):
        flat = arr.flatten().to_numpy(zero_copy_only=False)
        return flat.astype(np.float64, copy=False).reshape(len(arr), arr.type.list_size)
    if pa.types.is_list(arr.type) or pa.types.is_large_list(arr.type):
        offsets = arr.offsets.to_numpy(zero_copy_only=False)
        lengths = np.diff(offsets)
        if len(lengths) and (lengths == lengths[0]).all():
            flat = arr.flatten().to_numpy(zero_copy_only=False)
            return flat.astype(np.float64, copy=False).reshape(len(arr), int(lengths[0]))
    return np.array(arr.to_pylist(), dtype=np.float64)  # ragged fallback


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


class _LocalTopK:
    def __init__(self, queries_ref, query_ids, k, vec_col, id_col,
                 bucket_allowed=None, bucket_col: str = "bucket"):
        from ..kg.resources import resolve

        q = resolve(queries_ref)
        self.q = _normalize(np.asarray(q, dtype=np.float64))
        self.query_ids = list(query_ids)
        self.k = k
        self.vec_col = vec_col
        self.id_col = id_col
        # optional strict IVF probing: (n_queries, n_centroids) bool —
        # a vector only scores for queries that probed its bucket
        self.bucket_allowed = (
            None if bucket_allowed is None else np.asarray(resolve(bucket_allowed))
        )
        self.bucket_col = bucket_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        vecs = _normalize(_as_matrix(batch[self.vec_col]))
        ids = batch[self.id_col].combine_chunks().to_numpy(zero_copy_only=False)
        scores = self.q @ vecs.T  # Q × B
        if self.bucket_allowed is not None:
            buckets = batch[self.bucket_col].combine_chunks().to_numpy(
                zero_copy_only=False
            )
            mask = self.bucket_allowed[:, buckets]  # Q × B
            scores = np.where(mask, scores, -np.inf)
        k = min(self.k, scores.shape[1])
        out_q, out_id, out_s = [], [], []
        for qi, qid in enumerate(self.query_ids):
            row = scores[qi]
            top = np.argpartition(-row, k - 1)[:k] if k < len(row) else np.arange(len(row))
            for j in top:
                if row[j] == -np.inf:
                    continue
                out_q.append(qid)
                out_id.append(ids[j])
                out_s.append(float(row[j]))
        return pa.table(
            {
                "query_id": pa.array(out_q),
                self.id_col: pa.array(out_id),
                "score": pa.array(out_s, pa.float64()),
            }
        )


def _global_topk(candidates_ds, k: int, id_col: str):
    """Per-query reduction of local candidates to the global top-k
    (score desc, id asc for deterministic ties)."""

    def reduce_group(group: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        idx = pc.sort_indices(
            group,
            sort_keys=[("score", "descending"), (id_col, "ascending")],
        )[: k]
        top = group.take(idx)
        rank = pa.array(range(1, top.num_rows + 1), pa.int64())
        return top.append_column("rank", rank)

    return candidates_ds.groupby("query_id").map_groups(reduce_group, batch_format="pyarrow")


def brute_force_topk(embeds_ds, queries: np.ndarray, query_ids, k: int = 10,
                     *, vec_col: str = "embedding", id_col: str = "vec_id",
                     concurrency=(1, 8), batch_size: int = 1024,
                     bucket_allowed=None, bucket_col: str = "bucket"):
    """Exact cosine top-k for each query vector. Returns a Dataset
    (query_id, vec_id, score, rank). ``bucket_allowed`` (optional
    (n_queries, n_centroids) bool matrix) restricts each query to
    vectors in its probed IVF buckets."""
    from ..kg.resources import broadcast

    try:
        q_ref = broadcast(np.asarray(queries, dtype=np.float64))
    except Exception:
        q_ref = np.asarray(queries, dtype=np.float64)
    allowed_ref = None
    if bucket_allowed is not None:
        try:
            allowed_ref = broadcast(np.asarray(bucket_allowed))
        except Exception:
            allowed_ref = np.asarray(bucket_allowed)
    local = embeds_ds.map_batches(
        _LocalTopK,
        fn_constructor_kwargs=dict(
            queries_ref=q_ref, query_ids=query_ids, k=k, vec_col=vec_col,
            id_col=id_col, bucket_allowed=allowed_ref, bucket_col=bucket_col,
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency,
    )
    return _global_topk(local, k, id_col)


def cluster_assign(embeds_ds, centroids: np.ndarray, *,
                   vec_col: str = "embedding", id_col: str = "vec_id"):
    """K-means-style cluster assignment as a stateless map stage:
    cluster = argmax cosine over the given centroids (ties → lowest
    centroid index), sim = the winning cosine. With closed-form
    centroids (e.g. the first C vectors — `IVFIndex(n_iters=0)`) the
    whole op is SQL-checkable; Lloyd-refined centroids are the quality
    path. Output: (id_col, cluster, sim)."""
    c = _normalize(np.asarray(centroids, dtype=np.float64))

    def assign(batch: pa.Table) -> pa.Table:
        vecs = _normalize(_as_matrix(batch[vec_col]))
        scores = vecs @ c.T
        best = np.argmax(scores, axis=1)
        return pa.table(
            {
                id_col: batch[id_col],
                "cluster": pa.array(best.astype(np.int64), pa.int64()),
                "sim": pa.array(scores[np.arange(len(best)), best], pa.float64()),
            }
        )

    return embeds_ds.map_batches(assign, batch_format="pyarrow", zero_copy_batch=True)


class IVFIndex:
    """Deterministic IVF: k-means over a sample with fixed init (first C
    distinct vectors) and a fixed iteration count — same input, same
    centroids, everywhere.

    ``n_iters=0`` is the *oracle mode*: centroids are exactly the first C
    sample vectors, so index construction is closed-form and the whole
    search (assign → probe → score → top-k) is expressible as ANSI SQL
    over the raw table — the ``ann_ivf`` driver query is value-checked
    against DuckDB this way. ``n_iters>0`` is the production quality path
    (Lloyd refinement; recall measured in tests/BENCH) whose float mean
    reductions are not bit-reproducible in SQL."""

    def __init__(self, n_centroids: int = 16, n_iters: int = 8):
        self.n_centroids = n_centroids
        self.n_iters = n_iters
        self.centroids: np.ndarray | None = None

    def fit(self, sample: np.ndarray) -> "IVFIndex":
        x = _normalize(np.asarray(sample, dtype=np.float64))
        c = x[: self.n_centroids].copy()
        for _ in range(self.n_iters):
            assign = np.argmax(x @ c.T, axis=1)
            for j in range(len(c)):
                members = x[assign == j]
                if len(members):
                    v = members.mean(axis=0)
                    n = np.linalg.norm(v)
                    if n > 0:
                        c[j] = v / n
        self.centroids = c
        return self

    def assign_stage(self, embeds_ds, *, vec_col: str = "embedding", id_col: str = "vec_id"):
        centroids = self.centroids

        def assign(batch: pa.Table) -> pa.Table:
            vecs = _normalize(_as_matrix(batch[vec_col]))
            bucket = np.argmax(vecs @ centroids.T, axis=1).astype(np.int32)
            return batch.append_column("bucket", pa.array(bucket, pa.int32()))

        return embeds_ds.map_batches(assign, batch_format="pyarrow", zero_copy_batch=True)

    def search(self, assigned_ds, queries: np.ndarray, query_ids, k: int = 10,
               n_probe: int = 4, *, vec_col: str = "embedding", id_col: str = "vec_id",
               strict: bool = True):
        """Probe the n_probe nearest centroid buckets per query; exact
        cosine within the probed subset.

        ``strict=True`` (default) gives true per-query IVF semantics: a
        vector is scored for a query ONLY if its bucket is among that
        query's probes (a broadcast (queries × centroids) bool mask
        applied inside the scoring batches), so batch results equal
        running each query alone. ``strict=False`` keeps the documented
        union-probe mode: every query scores the union of all probed
        buckets (slightly higher recall, fewer masked lanes)."""
        q = _normalize(np.asarray(queries, dtype=np.float64))
        # stable sort: equal-similarity centroids keep index order, so the
        # probe set is deterministic and matches a SQL `ORDER BY sim DESC,
        # centroid ASC` tie-break
        probes = np.argsort(-(q @ self.centroids.T), axis=1, kind="stable")[:, :n_probe]
        # union of probed buckets → one filtered brute-force pass
        buckets = sorted({int(b) for row in probes for b in row})
        allowed = np.zeros((len(query_ids), len(self.centroids)), dtype=bool)
        for i in range(len(query_ids)):
            allowed[i, probes[i]] = True
        self.allowed_by_query = {
            qid: set(map(int, probes[i])) for i, qid in enumerate(query_ids)
        }

        import pyarrow.compute as pc

        def filter_buckets(batch: pa.Table) -> pa.Table:
            return batch.filter(pc.is_in(batch["bucket"], value_set=pa.array(buckets, pa.int32())))

        subset = assigned_ds.map_batches(filter_buckets, batch_format="pyarrow", zero_copy_batch=True)
        return brute_force_topk(
            subset, q, query_ids, k=k, vec_col=vec_col, id_col=id_col,
            bucket_allowed=allowed if strict else None,
        )


def knn_label_confusion(embeds_ds, *, vec_col: str = "embedding",
                        id_col: str = "vec_id", label_col: str = "label",
                        ref_table: pa.Table | None = None):
    """Leave-one-out 1-NN label prediction → confusion matrix — the
    embedding-quality / label-noise audit. Every vector is classified
    by its nearest OTHER vector's label (cosine; ties broken by the
    smaller neighbor id — the reference matrix is broadcast sorted by
    id, so ``argmax``'s first-max rule IS the tie-break). Output:
    (label, pred_label, n).

    Scale shape: the labeled reference set broadcasts ONCE (bounded
    contract: eval/validation sets, not the corpus — for corpus-scale
    neighbor search use the IVF path); each batch is one numpy matmul
    against it, confusion counts combine map-side, and the final
    groupby carries labels² rows. ``ref_table`` overrides the default
    of using the dataset itself as the reference (driver-side read of
    the same parquet).
    """
    import ray

    from ..kg.resources import broadcast, resolve

    if ref_table is None:
        blocks = [t for t in ray.get(embeds_ds.to_arrow_refs())
                  if t.num_rows]
        ref_table = pa.concat_tables(blocks)
    order = pc.sort_indices(ref_table, sort_keys=[(id_col, "ascending")])
    ref_table = ref_table.take(order)
    ref_ids = ref_table[id_col].to_numpy(zero_copy_only=False)
    ref_labels = ref_table[label_col].to_numpy(zero_copy_only=False)
    ref_m = _normalize(_as_matrix(ref_table[vec_col]))
    try:
        ref = broadcast((ref_ids, ref_labels, ref_m))
    except Exception:
        ref = (ref_ids, ref_labels, ref_m)

    def confuse(batch: pa.Table) -> pa.Table:
        ids_r, labels_r, m_r = resolve(ref)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        labels = batch[label_col].to_numpy(zero_copy_only=False)
        m = _normalize(_as_matrix(batch[vec_col]))
        sims = m @ m_r.T
        # exclude self: ids_r is sorted, so searchsorted finds own row
        pos = np.searchsorted(ids_r, ids)
        own = (pos < len(ids_r)) & (ids_r[np.minimum(pos, len(ids_r) - 1)]
                                    == ids)
        sims[np.flatnonzero(own), pos[own]] = -np.inf
        pred = labels_r[np.argmax(sims, axis=1)]
        t = pa.table({
            "label": pa.array(labels.astype(np.int64), pa.int64()),
            "pred_label": pa.array(pred.astype(np.int64), pa.int64()),
            "one": pa.nulls(len(ids), pa.int64()).fill_null(1),
        })
        agg = t.group_by(["label", "pred_label"]).aggregate([("one", "sum")])
        return (agg.select(["label", "pred_label", "one_sum"])
                   .rename_columns(["label", "pred_label", "n_p"]))

    return (
        embeds_ds.map_batches(confuse, batch_format="pyarrow",
                              zero_copy_batch=True)
        .groupby(["label", "pred_label"]).sum("n_p")
        .map_batches(
            lambda b: b.rename_columns(["label", "pred_label", "n"]),
            batch_format="pyarrow")
    )


def quantize_embeddings(ds, *, vec_col: str = "embedding",
                        id_col: str = "vec_id", levels: int = 255):
    """Global min-max int8-style quantization of an embedding column —
    the vector-compression step before shipping an index: per-DIMENSION
    (min, max) over the whole corpus, then code = floor((x − mn) ·
    levels / (mx − mn) + 0.5) per element (0 for constant dimensions).

    Determinism: min/max are exact (no summation), and the code
    expression is ONE fixed-order chain of IEEE-double ops evaluated
    identically by numpy and SQL — bit-equal codes, no float-sum
    ambiguity anywhere.

    Scale shape: pass 1 folds per-block per-dim (mn, mx) partials
    (2·dims values per block) into a native dim-keyed reduce — the only
    driver-collected state is dims-order; the (mn, mx) vectors broadcast
    once and pass 2 is a stateless vectorized map. The input is
    materialized once and feeds both passes. Output per vector:
    (id, code_sum, code_min, code_max) int64 — the row-level summary a
    SQL oracle can check without list-typed columns.
    """
    import ray

    ds = ds.materialize()
    mn_ref, mx_ref = _global_minmax(ds, vec_col)

    def quantize(batch: pa.Table) -> pa.Table:
        codes = _quant_codes(_as_matrix(batch[vec_col]),
                             ray.get(mn_ref), ray.get(mx_ref), levels)
        return pa.table({
            id_col: batch[id_col],
            "code_sum": pa.array(codes.sum(axis=1), pa.int64()),
            "code_min": pa.array(codes.min(axis=1), pa.int64()),
            "code_max": pa.array(codes.max(axis=1), pa.int64()),
        })

    return ds.map_batches(quantize, batch_format="pyarrow",
                          zero_copy_batch=True)


def _global_minmax(ds, vec_col: str):
    """Exact per-dimension (min, max) over the corpus: per-block
    (dim, mn, mx) partials → one dims-order native reduce → two
    broadcast numpy vectors (object refs)."""
    import ray
    from ray.data.aggregate import Max, Min

    def mm_partial(batch: pa.Table) -> pa.Table:
        m = _as_matrix(batch[vec_col])
        if m.size == 0:
            return pa.table({"dim": pa.array([], pa.int64()),
                             "mn": pa.array([], pa.float64()),
                             "mx": pa.array([], pa.float64())})
        return pa.table({
            "dim": pa.array(np.arange(m.shape[1], dtype=np.int64)),
            "mn": pa.array(m.min(axis=0), pa.float64()),
            "mx": pa.array(m.max(axis=0), pa.float64()),
        })

    stats = (ds.map_batches(mm_partial, batch_format="pyarrow",
                            zero_copy_batch=True)
             .groupby("dim").aggregate(Min("mn"), Max("mx")))
    dims, mns, mxs = [], [], []
    for b in stats.iter_batches(batch_format="pyarrow"):
        if b.num_rows == 0 or "dim" not in b.column_names:
            continue
        dims.append(b["dim"].to_numpy(zero_copy_only=False))
        mns.append(b["min(mn)"].to_numpy(zero_copy_only=False))
        mxs.append(b["max(mx)"].to_numpy(zero_copy_only=False))
    dim = np.concatenate(dims) if dims else np.array([], np.int64)
    order = np.argsort(dim)
    mn = (np.concatenate(mns) if mns else np.array([]))[order]
    mx = (np.concatenate(mxs) if mxs else np.array([]))[order]
    return ray.put(mn), ray.put(mx)


def _quant_codes(m: np.ndarray, lo: np.ndarray, hi: np.ndarray,
                 levels: int) -> np.ndarray:
    """code = floor((x − lo) · levels / (hi − lo) + 0.5), 0 where the
    dimension is constant — ONE fixed-order IEEE-double chain, bit-equal
    between numpy and SQL."""
    span = hi - lo
    safe = np.where(span == 0.0, 1.0, span)
    codes = np.floor((m - lo) * float(levels) / safe + 0.5)
    return np.where(span == 0.0, 0.0, codes).astype(np.int64)


def quantized_dim_stats(ds, *, vec_col: str = "embedding",
                        levels: int = 255):
    """Exact integer covariance sufficient statistics between every
    PAIR of quantized embedding dimensions — the feature-redundancy
    audit run before pruning or rotating an embedding space: which
    dimensions move together?

    Composition story: :func:`quantize_embeddings`' global min-max
    codes turn float vectors into small ints, and integer sums are
    order-free — so the full d×d second-moment matrix is EXACT and
    bit-identical across block layouts, where float covariance would be
    summation-order-dependent. Output: one row per unordered dim pair
    i < j with (di, dj, n, si, sj, sij) int64; the consumer forms the
    correlation numerator n·sij − si·sj driver-side (or in SQL).

    Scale shape: two streaming passes over the materialized input (one
    for min-max, one for products); each block contributes ONE
    d(d−1)/2-row partial (d=64 → 2016 rows) computed as a single
    C-level matmul (codesᵀ·codes), and a native (di, dj)-keyed sum
    folds partials — no per-pair dispatch, nothing corpus-order leaves
    the block. int64 headroom: codes ≤ levels, so sij ≤ n·levels²;
    overflow needs n > 1.4e14 vectors at levels=255.
    """
    import ray

    ds = ds.materialize()
    mn_ref, mx_ref = _global_minmax(ds, vec_col)

    def pair_partial(batch: pa.Table) -> pa.Table:
        codes = _quant_codes(_as_matrix(batch[vec_col]),
                             ray.get(mn_ref), ray.get(mx_ref), levels)
        if codes.size == 0:
            return pa.table({"di": pa.array([], pa.int64()),
                             "dj": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64()),
                             "si": pa.array([], pa.int64()),
                             "sj": pa.array([], pa.int64()),
                             "sij": pa.array([], pa.int64())})
        d = codes.shape[1]
        prod = codes.T @ codes            # d×d int64 matmul
        sums = codes.sum(axis=0)          # per-dim Σcode
        iu, ju = np.triu_indices(d, k=1)
        return pa.table({
            "di": pa.array(iu.astype(np.int64)),
            "dj": pa.array(ju.astype(np.int64)),
            "n": pa.array(np.full(len(iu), codes.shape[0], np.int64)),
            "si": pa.array(sums[iu]),
            "sj": pa.array(sums[ju]),
            "sij": pa.array(prod[iu, ju]),
        })

    out = (ds.map_batches(pair_partial, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby(["di", "dj"]).sum(["n", "si", "sj", "sij"]))
    return out.map_batches(
        lambda b: b.rename_columns(["di", "dj", "n", "si", "sj", "sij"]),
        batch_format="pyarrow")


def pq_codes(ds, *, vec_col: str = "embedding", id_col: str = "vec_id",
             seed_vectors: np.ndarray | None = None, n_sub: int = 4,
             n_centroids: int = 8, n_iters: int = 0,
             fit_sample: np.ndarray | None = None):
    """Product-quantization codes — THE standard vector-compression
    scale path (Jégou et al., public literature): dimensions split into
    ``n_sub`` contiguous subspaces, each sub-vector replaced by the id
    of its nearest (L2) subspace centroid, compressing dims×4 bytes to
    ``n_sub`` small ints per vector.

    ``n_iters=0`` is the ORACLE MODE (the IVFIndex convention): subspace
    centroids are exactly the sub-slices of ``seed_vectors`` (the first
    ``n_centroids`` corpus vectors), so the whole encoding is
    closed-form and SQL-checkable (argmin list_distance per slice,
    ties → lower centroid id). ``n_iters>0`` runs Lloyd refinement per
    subspace over ``fit_sample`` (a driver-side sample STRICTLY larger
    than the centroid count — refining over the seeds alone is an
    instant fixpoint) with fixed init + fixed iteration count —
    deterministic; quality is gated by a reconstruction-distortion
    pytest, not SQL.

    Scale shape: centroids broadcast once; encoding is a stateless
    vectorized map (one (B × n_centroids) distance matrix per subspace
    per batch). Output: (id, sub_0 … sub_{n_sub−1}) int64.
    """
    import ray

    if seed_vectors is None:
        raise ValueError("pq_codes needs seed_vectors (the first "
                         "n_centroids vectors, fetched driver-side)")
    seeds = np.asarray(seed_vectors, dtype=np.float64)[:n_centroids]
    dims = seeds.shape[1]
    if dims % n_sub:
        raise ValueError(f"dims {dims} not divisible by n_sub {n_sub}")
    w = dims // n_sub
    cents = [seeds[:, s * w:(s + 1) * w].copy() for s in range(n_sub)]
    if n_iters > 0:
        if fit_sample is None or len(fit_sample) <= n_centroids:
            raise ValueError(
                "n_iters>0 needs fit_sample with more vectors than "
                "n_centroids (Lloyd over the seeds alone is a no-op)")
        fit = np.asarray(fit_sample, dtype=np.float64)
        # Lloyd per subspace over the fit sample (deterministic: fixed
        # init = the seed centroids, fixed iteration count)
        for s in range(n_sub):
            sample = fit[:, s * w:(s + 1) * w]
            c = cents[s].copy()
            for _ in range(n_iters):
                d = ((sample[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
                a = np.argmin(d, axis=1)
                for j in range(len(c)):
                    m = a == j
                    if m.any():
                        c[j] = sample[m].mean(axis=0)
            cents[s] = c
    cents_ref = ray.put(cents)

    def encode(batch: pa.Table) -> pa.Table:
        cs = ray.get(cents_ref)
        m = _as_matrix(batch[vec_col])
        cols = {id_col: batch[id_col]}
        for s in range(n_sub):
            sub = m[:, s * w:(s + 1) * w]
            # direct (v−c)² form, NOT the expanded ‖v‖²−2v·c+‖c‖²: the
            # expansion cancels catastrophically near ties and can flip
            # the argmin vs the SQL oracle's per-element difference sum
            d = ((sub[:, None, :] - cs[s][None, :, :]) ** 2).sum(axis=2)
            cols[f"sub_{s}"] = pa.array(
                np.argmin(d, axis=1).astype(np.int64))
        return pa.table(cols)

    return ds.map_batches(encode, batch_format="pyarrow",
                          zero_copy_batch=True)
