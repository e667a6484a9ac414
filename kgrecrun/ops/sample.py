"""Deterministic sampling and split assignment for training-data prep.

At 100 TB you cannot sample with an RNG: retries, resumes, and
re-partitioning must all see the same decision per document. Both ops
key off ``md5(str(id))`` (first 8 bytes, little-endian uint64 — DuckDB
``md5_number_upper``), so every worker, every run, and the SQL oracle
agree exactly:

* :func:`hash_sample` — keep rows where ``h % denom < numer`` (an
  exact ``numer/denom`` fraction in expectation, stable under
  re-sharding). Embarrassingly parallel, no shuffle.
* :func:`hash_split` — assign every row to named splits (train/val/
  test) by hash range; complete and non-overlapping by construction.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _hash64(ids) -> np.ndarray:
    """md5(str(id))[:8] little-endian per id — matches DuckDB
    ``md5_number_upper(CAST(id AS VARCHAR))``."""
    return np.fromiter(
        (
            int.from_bytes(hashlib.md5(str(i).encode()).digest()[:8], "little")
            for i in ids
        ),
        dtype=np.uint64,
    )


def hash_sample(ds, *, numer: int = 1, denom: int = 10, id_col: str = "doc_id"):
    """Keep rows whose ``md5 hash % denom < numer`` — a deterministic
    ~numer/denom sample, stable across runs and re-sharding."""

    def f(batch: pa.Table) -> pa.Table:
        h = _hash64(batch[id_col].to_pylist())
        return batch.filter(pa.array(h % denom < numer))

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def cap_per_key(ds, *, key: str, k: int, id_col: str = "doc_id",
                n_buckets: int = 256):
    """Per-key quota sampling: keep at most ``k`` rows per ``key``,
    chosen deterministically by md5-hash order (the Common-Crawl
    per-domain cap — no domain may dominate the training mix; the hash
    order makes the kept subset stable across runs/resharding AND
    unbiased w.r.t. any natural ordering of the data).

    Bucketed like every per-group operator: ONE shuffle of (key, id,
    hash) rows into ``n_buckets`` hash groups, one sort by (key, hash,
    id) per group, vectorized segment ranks — dispatch capped at
    n_buckets for any key cardinality (per-domain map_groups would be
    one Python call per domain, ~10^8 at web scale).

    Returns the capped (id_col, key) rows. SQL-mirrorable exactly:
    ``QUALIFY row_number() OVER (PARTITION BY key ORDER BY
    md5_number_upper(CAST(id AS VARCHAR)), id) <= k``.
    """
    from ..kg.unionfind import hash_bucket

    def tag(batch: pa.Table) -> pa.Table:
        ids = batch[id_col]
        # top-bit flip maps uint64 order onto int64 order, so the arrow
        # int64 sort below ranks exactly like SQL's unsigned HUGEINT
        h = (_hash64(ids.to_pylist()) ^ np.uint64(1 << 63)).astype(np.int64)
        return pa.table({
            "__bucket": hash_bucket(batch[key].combine_chunks(), n_buckets),
            key: batch[key],
            id_col: ids,
            "__h": pa.array(h, pa.int64()),
        })

    def cap_bucket(group: pa.Table) -> pa.Table:
        order = pc.sort_indices(
            group,
            sort_keys=[(key, "ascending"), ("__h", "ascending"), (id_col, "ascending")],
        )
        g = group.take(order)
        ka = g[key].combine_chunks()
        n = g.num_rows
        neq = pc.not_equal(ka.slice(1), ka.slice(0, n - 1)).to_numpy(
            zero_copy_only=False
        )
        new_seg = np.concatenate(([True], neq.astype(bool)))
        idx = np.arange(n)
        rnk = idx - np.maximum.accumulate(np.where(new_seg, idx, 0)) + 1
        return g.filter(pa.array(rnk <= k)).select([id_col, key])

    return ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True) \
        .groupby("__bucket").map_groups(cap_bucket, batch_format="pyarrow")


def hash_split(ds, *, splits: dict[str, int] | None = None, id_col: str = "doc_id"):
    """Append a ``split`` column assigning each row to a named split by
    hash range. ``splits`` maps name → weight (parts of the total);
    ranges are cumulative in the given order, so the assignment is
    complete and non-overlapping. Default 98/1/1 train/val/test."""
    splits = splits or {"train": 98, "val": 1, "test": 1}
    names = list(splits)
    total = sum(splits.values())
    bounds = np.cumsum([splits[n] for n in names])  # upper bounds in [1, total]

    def f(batch: pa.Table) -> pa.Table:
        r = _hash64(batch[id_col].to_pylist()) % total
        idx = np.searchsorted(bounds, r, side="right")
        return batch.append_column(
            "split", pa.array([names[i] for i in idx], pa.string())
        )

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def rebalance_to_mix(ds, *, key: str, weights: dict | None = None,
                     id_col: str = "doc_id", denom_bits: int = 20,
                     max_keys: int = 1_000_000):
    """Deterministic stratified DOWNSAMPLING to a target mix — the
    data-mixing step of a training pipeline (e.g. balance languages /
    domains without upsampling anything).

    ``weights`` maps key → integer target weight (None = uniform). The
    scarcest key relative to its target keeps 100% of its rows; every
    other key keeps the deterministic md5-hash fraction that lands the
    kept corpus exactly on the target proportions (in expectation):
    with counts c_k, weights w_k (sum W), feasible total
    T = min_k floor(c_k·W/w_k) and per-key keep threshold
    numer_k = floor(w_k·T·D / (W·c_k)) over denominator D = 2^denom_bits
    — all exact Python-int arithmetic on the driver.

    Two stages: a native groupby count (rows = |key domain| — this op
    assumes a BOUNDED key domain, langs/domains/sources, like
    approx_distinct's documented assumption; the counts table lives on
    the driver) and an embarrassingly-parallel hash filter (no
    shuffle, stable across runs/resumes/resharding). Magnitude
    contract: c_min · D < 2^63 (c_min < 8.8e12 at D=2^20).

    ``max_keys`` is a LOUD bound on that assumption (lmfilter's
    max_model_rows pattern, round-4 VERDICT item 3): the counts table
    is materialized in the OBJECT STORE and its row count checked
    BEFORE anything is pulled to the driver heap — an open-domain key
    (urls, doc ids) raises instead of OOMing the driver.

    Output: (id_col, key) kept rows.
    """
    counts_ds = (
        ds.map_batches(
            lambda b: (
                b.select([key]).group_by(key).aggregate([([], "count_all")])
                .rename_columns([key, "n_local"])
            ),
            batch_format="pyarrow", zero_copy_batch=True,
        )
        .groupby(key)
        .sum("n_local")
    ).materialize()
    n_keys = counts_ds.count()
    if n_keys > max_keys:
        raise ValueError(
            f"rebalance_to_mix: key domain has {n_keys} distinct values "
            f"> max_keys={max_keys} — the per-key counts table would "
            "not fit the driver (this op's contract is a bounded key "
            "domain: languages / sources / domains, not open-domain "
            "keys); raise max_keys only if the driver can hold it")
    counts = counts_ds.to_pandas()
    counts.columns = [key, "n"]
    c = dict(zip(counts[key], counts["n"]))
    w = {k: 1 for k in c} if weights is None else weights
    W = sum(w.values())
    D = 1 << denom_bits
    # exact integer arithmetic (Python ints — no overflow)
    T = min((int(c[k]) * W) // w[k] for k in c if w.get(k))
    numer = {
        k: (w[k] * T * D) // (W * int(c[k])) if w.get(k) else 0 for k in c
    }

    def keep(batch: pa.Table) -> pa.Table:
        h = _hash64(batch[id_col].to_pylist()) % np.uint64(D)
        thr = np.array(
            [numer.get(k, 0) for k in batch[key].to_pylist()], np.uint64
        )
        return batch.filter(pa.array(h < thr)).select([id_col, key])

    return ds.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)


def weighted_hash_sample(ds, *, weight_col: str, target: int,
                         id_col: str = "doc_id", denom: int = 1_048_576):
    """Deterministic WEIGHTED Bernoulli sample: keep each row with
    probability ``min(1, weight/target)`` — rows at or above ``target``
    always survive, lighter rows proportionally (the quality-weighted /
    length-weighted training-mix sampler).

    Like :func:`hash_sample` the coin is ``md5(str(id))`` and the
    threshold is exact integer arithmetic (``weight·denom // target``),
    so the decision is identical across runs, resumes, re-sharding and
    the SQL oracle — no RNG anywhere. Embarrassingly parallel, no
    shuffle."""

    def f(batch: pa.Table) -> pa.Table:
        h = _hash64(batch[id_col].to_pylist())
        w = pc.cast(batch[weight_col], pa.int64()).to_numpy(zero_copy_only=False)
        thresh = np.minimum(w * denom // target, denom).astype(np.uint64)
        return batch.filter(pa.array(h % np.uint64(denom) < thresh))

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def quantile_band_filter(ds, *, value_col: str, id_col: str = "doc_id",
                         q_lo: float = 0.05, q_hi: float = 0.95):
    """Global-quantile band filter — the classic LLM-corpus length
    gate: keep rows whose ``value_col`` lies inside the [q_lo, q_hi]
    EXACT discrete quantile band of the whole dataset.

    The threshold rule is explicit (and mirrored verbatim in SQL):
    t(q) = the smallest value v with cumulative count(≤ v) ≥
    ceil(q · N), both ceil operands IEEE doubles, so engine and oracle
    agree bit-for-bit even where q·N lands on an exact integer
    boundary (0.05 · 500 = 25.000000000000004 in binary — ceil 26 on
    BOTH sides).

    Scale shape: the (value → count) histogram folds map-side and
    reduces in one native groupby-sum; only the histogram (bounded by
    the distinct-value domain — lengths, not documents; same contract
    as group_quantiles) reaches the driver, which sorts, cumsums and
    resolves the two thresholds; the filter pass is a broadcast-free
    vectorized compare. The input is materialized once and feeds both
    passes. Output: (id_col, value_col) inside the band.
    """
    import math

    import pyarrow.compute as pc

    ds = ds.materialize()  # feeds the histogram AND the filter pass

    def hist_partial(batch: pa.Table) -> pa.Table:
        t = pa.table({"v": pc.cast(batch[value_col], pa.int64()),
                      "c": pa.nulls(batch.num_rows, pa.int64()).fill_null(1)})
        g = t.group_by("v").aggregate([("c", "sum")])
        return g.rename_columns(["v", "c"])

    hist = (ds.map_batches(hist_partial, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby("v").sum("c"))
    vs, cs = [], []
    for b in hist.iter_batches(batch_format="pyarrow"):
        if b.num_rows == 0 or "v" not in b.column_names:
            continue
        vs.append(b["v"].to_numpy(zero_copy_only=False))
        cs.append(b["sum(c)"].to_numpy(zero_copy_only=False))
    v = np.concatenate(vs) if vs else np.array([], np.int64)
    c = np.concatenate(cs) if cs else np.array([], np.int64)
    order = np.argsort(v)
    v, c = v[order], c[order]
    cum = np.cumsum(c)
    n = int(cum[-1]) if len(cum) else 0

    def thresh(q: float) -> int:
        k = math.ceil(q * float(n))
        i = int(np.searchsorted(cum, k, side="left"))
        return int(v[min(i, len(v) - 1)])

    if n == 0:
        return ds.map_batches(
            lambda b: b.select([id_col, value_col]).slice(0, 0),
            batch_format="pyarrow")
    lo, hi = thresh(q_lo), thresh(q_hi)

    def band(batch: pa.Table) -> pa.Table:
        val = pc.cast(batch[value_col], pa.int64())
        keep = pc.and_(pc.greater_equal(val, pa.scalar(lo, pa.int64())),
                       pc.less_equal(val, pa.scalar(hi, pa.int64())))
        return batch.select([id_col, value_col]).filter(keep)

    return ds.map_batches(band, batch_format="pyarrow",
                          zero_copy_batch=True)


def sample_quantiles(ds, *, id_fn, cents_fn, k: int = 2000,
                     qs=(0.1, 0.25, 0.5, 0.75, 0.9)):
    """Quantile ESTIMATION by deterministic bottom-k sampling: keep the
    ``k`` rows with the smallest ``md5(id)`` — a uniform random sample
    that every worker, every run, and the SQL oracle select
    IDENTICALLY (no RNG, stable under re-sharding, the
    :func:`hash_sample` discipline) — then exact linear-interpolated
    quantiles over the sample. The 100-TB story: the exchange carries
    ≤ k (hash, cents) rows per block and the estimate's error is the
    standard sampling bound (~1/√k quantile deviation), independent of
    table size.

    Map-side each block keeps its own bottom-k (a superset guarantee:
    the global bottom-k is a subset of the union of per-block
    bottom-k); one single-task reduce re-sorts and interpolates.
    Sample membership is decided by the total order (h, cents) so hash
    ties cannot make the boundary ambiguous. ``qs`` fractions should
    be exact dyadics (0.25 steps are bit-exact vs DuckDB
    ``quantile_cont``; we round 6dp on both sides regardless).
    Output: (q float64, qv float64 — rounded 6dp).
    """

    def partial(batch: pa.Table) -> pa.Table:
        h = _hash64(id_fn(batch))
        cents = cents_fn(batch)
        if isinstance(cents, pa.ChunkedArray):
            cents = cents.combine_chunks()
        c = np.asarray(cents.to_numpy(zero_copy_only=False), np.int64)
        order = np.lexsort((c, h))[:k]
        return pa.table({"h": pa.array(h[order], pa.uint64()),
                         "cents": pa.array(c[order], pa.int64())})

    def finish(t: pa.Table) -> pa.Table:
        h = t["h"].combine_chunks().to_numpy(zero_copy_only=False)
        c = t["cents"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((c, h))[:k]
        v = np.sort(c[order].astype(np.float64))
        qarr = np.asarray(qs, np.float64)
        pos = (len(v) - 1) * qarr
        lo = np.floor(pos).astype(np.int64)
        hi = np.minimum(lo + 1, len(v) - 1)
        qv = v[lo] + (pos - lo) * (v[hi] - v[lo])
        # half-away-from-zero to match DuckDB round() (repo convention)
        t6 = pc.round(pa.array(qv, pa.float64()), ndigits=6,
                      round_mode="half_towards_infinity")
        return pa.table({"q": pa.array(qarr, pa.float64()), "qv": t6})

    return (ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)
            .repartition(1)
            .map_batches(finish, batch_format="pyarrow"))
