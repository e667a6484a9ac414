"""Distribution statistics operators.

:func:`group_quantiles` computes EXACT linear-interpolated quantiles
per group from (group, value) → count partial histograms: money lives
in integer cents, so each batch collapses to its distinct values before
the single bucketed shuffle. The shuffle carries
Σ_blocks |distinct values in block| rows — equal to raw rows only in
the worst case of an all-unique domain, collapsing by orders of
magnitude for quantized domains (latencies, scores, sizes). The
per-group quantile walk tolerates duplicate value bins (cumulative
counts stay strictly increasing), so no global (group, value) reduce is
needed — measured at sf0.1, that reduce was a full-data multi-key sort
for ~1% compression, 3× the wall time.

Both operators are BUCKET-cogrouped: keys hash into ``n_buckets``
groups and one ``map_groups`` call processes every key in the bucket
(vectorized arrow distinct / one sort + segment sweep) — group dispatch
stays at n_buckets regardless of key cardinality, so the operators hold
for corpus-order key domains, not just the benched small ones.

Interpolation mirrors SQL ``quantile_cont``/numpy ``linear``: with
sorted values v and idx = (n-1)·q, result = v[⌊idx⌋] +
(v[⌊idx⌋+1] − v[⌊idx⌋])·frac(idx). On integer cents every term is an
exact binary fraction for q ∈ {.25, .5, .75}, so the double result is
bit-identical to DuckDB's.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

N_BUCKETS = 256


def approx_distinct(
    ds,
    *,
    key: str,
    value_col: str,
    m: int = 4096,
    key_type: pa.DataType = pa.string(),
    n_buckets: int = N_BUCKETS,
):
    """Approximate COUNT(DISTINCT value) per group via LINEAR COUNTING
    with a deterministic md5 slot hash: per-group state is a bitmap of
    at most ``m`` occupied slots regardless of cardinality, partials
    merge by set-union (each batch emits its distinct (group, slot)
    pairs — ≤ m rows per group per block), and the estimate
    ``-m·ln(1 − z/m)`` corrects for hash collisions. At saturation
    (z == m) the estimate clamps z to m−1 (standard linear-counting
    practice — ln(0) is undefined; the bound is documented: with m=4096
    the estimator saturates near ~34k distinct values/group). Because
    the slot hash is md5 (DuckDB ``md5_number_upper``), the occupied
    count AND the estimate are bit-reproducible in SQL — a sketch with
    an exact oracle. Standard error ≈ √m⁻¹·√(e^t − t − 1)·m/n; with
    m=4096 and n ≤ m the estimate is within ~2% typical.

    Output: (key, occupied int64, est_distinct float64 — round 6dp
    applied by the caller to match SQL ``round``).
    """
    from ..kg.unionfind import hash_bucket
    from .sample import _hash64

    def slots_partial(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                key: batch[key],
                "slot": pa.array(
                    (_hash64(batch[value_col].to_pylist()) % m).astype(np.int64),
                    pa.int64(),
                ),
            }
        )
        t = t.group_by([key, "slot"]).aggregate([])
        return t.append_column(
            "__bucket", hash_bucket(t[key].combine_chunks(), n_buckets)
        )

    partials = ds.map_batches(slots_partial, batch_format="pyarrow")
    out_schema = pa.schema(
        [(key, key_type), ("occupied", pa.int64()), ("est_distinct", pa.float64())]
    )

    def estimate_bucket(group: pa.Table) -> pa.Table:
        # vectorized arrow distinct + grouped count over EVERY key in
        # the bucket — no per-key Python dispatch
        distinct = group.select([key, "slot"]).group_by([key, "slot"]).aggregate([])
        occ = distinct.group_by([key]).aggregate([("slot", "count")])
        z = occ["slot_count"].combine_chunks().to_numpy(zero_copy_only=False)
        z_eff = np.minimum(z, m - 1).astype(np.float64)
        est = -float(m) * np.log(1.0 - z_eff / float(m))
        return pa.table(
            {
                key: pc.cast(occ[key], key_type),
                "occupied": pa.array(z.astype(np.int64), pa.int64()),
                "est_distinct": pa.array(est, pa.float64()),
            },
            schema=out_schema,
        )

    return partials.groupby("__bucket").map_groups(
        estimate_bucket, batch_format="pyarrow"
    )


def group_quantiles(
    ds,
    *,
    key: str,
    value_cents,
    qs: tuple[float, ...] = (0.25, 0.5, 0.75),
    key_type: pa.DataType = pa.string(),
    n_buckets: int = N_BUCKETS,
):
    """Exact per-group quantiles of an integer-cents value. ``value_cents``
    is a callable batch→pa.Array producing the int64 cents column.
    Output: (key, q float64, qv float64 = interpolated quantile in cents).
    """
    from ..kg.unionfind import hash_bucket

    def hist_partial(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                key: batch[key],
                "v": value_cents(batch),
                "one": pa.nulls(batch.num_rows, pa.int64()).fill_null(1),
            }
        )
        g = t.group_by([key, "v"]).aggregate([("one", "sum")])
        g = g.rename_columns([key, "v", "n_local"])
        return g.append_column(
            "__bucket", hash_bucket(g[key].combine_chunks(), n_buckets)
        )

    # ONE shuffle: batch-partial histograms go straight into the
    # bucketed groupby. A global (key, v) reduce first would bound the
    # per-group payload by |distinct v| — but measured at sf0.1 the
    # price domain is ~99% unique, so that reduce is a full-data
    # multi-key sort for no compression (9.9s → 3s without it). The
    # quantile walk below tolerates duplicate v bins (cumulative counts
    # stay strictly increasing), so partials need no pre-merge.
    hist = ds.map_batches(hist_partial, batch_format="pyarrow")

    out_schema = pa.schema([(key, key_type), ("q", pa.float64()), ("qv", pa.float64())])

    def quantiles_bucket(group: pa.Table) -> pa.Table:
        # one sort of the whole bucket by (key, v); the per-key walk is
        # an in-process loop over key segments (cheap — |qs| searches
        # per key), not a per-key map_groups dispatch
        order = pc.sort_indices(
            group, sort_keys=[(key, "ascending"), ("v", "ascending")]
        )
        g = group.take(order)
        ka = g[key].combine_chunks()
        v_all = g["v"].combine_chunks().to_numpy(zero_copy_only=False)
        n_all = g["n_local"].combine_chunks().to_numpy(zero_copy_only=False)
        n = len(v_all)
        neq = pc.not_equal(ka.slice(1), ka.slice(0, n - 1)).to_numpy(
            zero_copy_only=False
        )
        starts = np.concatenate(([0], np.flatnonzero(neq.astype(bool)) + 1))
        ends = np.append(starts[1:], n)
        out_idx: list[int] = []
        out_q: list[float] = []
        out_v: list[float] = []
        for s, e in zip(starts, ends):
            v = v_all[s:e].astype(np.float64)
            cum = np.cumsum(n_all[s:e])  # cum[i] = #values <= v[i]
            total = int(cum[-1])
            for q in qs:
                idx = (total - 1) * q
                lo = int(np.floor(idx))
                frac = idx - lo
                # rank r (0-based) lives at the first bin with cum > r
                a = v[np.searchsorted(cum, lo, side="right")]
                if frac == 0.0:
                    res = a
                else:
                    b = v[np.searchsorted(cum, lo + 1, side="right")]
                    res = a + (b - a) * frac
                out_idx.append(int(s))
                out_q.append(q)
                out_v.append(res)
        return pa.table(
            {
                key: pc.cast(ka.take(pa.array(out_idx, pa.int64())), key_type),
                "q": pa.array(out_q, pa.float64()),
                "qv": pa.array(out_v, pa.float64()),
            },
            schema=out_schema,
        )

    return hist.groupby("__bucket").map_groups(
        quantiles_bucket, batch_format="pyarrow"
    )


def approx_group_quantiles(
    ds,
    *,
    key: str,
    value_cents,
    cell: int = 100,
    qs: tuple[float, ...] = (0.25, 0.5, 0.75),
    key_type: pa.DataType = pa.string(),
    n_buckets: int = N_BUCKETS,
):
    """Bounded-exchange approximate quantiles: values quantize to a grid
    of ``cell``-cent bins BEFORE the histogram partials, so the shuffle
    carries at most ``value_range/cell`` rows per group per block no
    matter how unique the raw domain is (the exact
    :func:`group_quantiles` degrades to one row per raw value — correct
    but unbounded for near-unique domains). Error ≤ cell/2 per
    estimate; the estimate itself is DETERMINISTIC and SQL-mirrorable
    exactly (it equals ``quantile_cont`` over the same bin midpoints:
    ``(v // cell) * cell + cell/2``), so the sketch has a bit-exact
    oracle like :func:`approx_distinct`."""

    def quantized(batch: pa.Table) -> pa.Array:
        v = value_cents(batch)
        binned = pc.multiply(
            pc.divide(pc.cast(v, pa.int64()), cell), cell
        )
        return pc.add(binned, cell // 2)

    return group_quantiles(
        ds, key=key, value_cents=quantized, qs=qs, key_type=key_type,
        n_buckets=n_buckets,
    )


def group_corr(ds, *, key: str, x_col: str, y_col: str,
               x_fn=None, y_fn=None):
    """Per-group Pearson correlation + OLS slope from integer
    sufficient statistics: each block contributes exact int64 partials
    (n, Σx, Σy, Σxy, Σx², Σy²) per key — a ≤|keys-in-block|-row
    shuffle — and the final r/slope are computed from the exact sums
    through an IDENTICAL IEEE-754 double sequence on the engine and SQL
    sides, then rounded to 6 dp:

        cxy = n·Σxy − Σx·Σy ;  cxx = n·Σx² − (Σx)² ;  cyy likewise
        r = cxy / sqrt(double(cxx) · double(cyy)) ;  slope = cxy / cxx

    Every int is exact, int→double casts and *,/,sqrt are correctly
    rounded, so both engines produce the same double bit pattern.
    Magnitude contract (docstring bound, like asof_join's int64
    contract): n·max|x|² must stay below 2^63 per group — pass integer-
    valued or coarsely-quantized columns (``x_fn``/``y_fn`` map the raw
    arrow column to int64; default is a plain int64 cast). For wider
    domains, accumulate two-limb or pre-aggregate per partition.

    Output: (key, n, corr6, slope6); groups with zero variance in x or
    y emit null corr6/slope6 (matches the SQL NULLIF guard).
    """

    def partial(batch: pa.Table) -> pa.Table:
        x = (x_fn(batch) if x_fn is not None
             else pc.cast(batch[x_col], pa.int64()))
        y = (y_fn(batch) if y_fn is not None
             else pc.cast(batch[y_col], pa.int64()))
        if isinstance(x, pa.ChunkedArray):
            x = x.combine_chunks()
        if isinstance(y, pa.ChunkedArray):
            y = y.combine_chunks()
        xn = x.to_numpy(zero_copy_only=False)
        yn = y.to_numpy(zero_copy_only=False)
        t = pa.table({
            key: batch[key],
            "n_p": pa.nulls(batch.num_rows, pa.int64()).fill_null(1),
            "sx": pa.array(xn, pa.int64()),
            "sy": pa.array(yn, pa.int64()),
            "sxy": pa.array(xn * yn, pa.int64()),
            "sxx": pa.array(xn * xn, pa.int64()),
            "syy": pa.array(yn * yn, pa.int64()),
        })
        return (
            t.group_by(key)
            .aggregate([("n_p", "sum"), ("sx", "sum"), ("sy", "sum"),
                        ("sxy", "sum"), ("sxx", "sum"), ("syy", "sum")])
            .rename_columns([key, "n_p", "sx", "sy", "sxy", "sxx", "syy"])
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(key)
        .sum(["n_p", "sx", "sy", "sxy", "sxx", "syy"])
    )

    def finish(batch: pa.Table) -> pa.Table:
        b = batch.rename_columns(
            [key, "n", "sx", "sy", "sxy", "sxx", "syy"]
        )
        n = b["n"].to_numpy(zero_copy_only=False)
        sx = b["sx"].to_numpy(zero_copy_only=False)
        sy = b["sy"].to_numpy(zero_copy_only=False)
        sxy = b["sxy"].to_numpy(zero_copy_only=False)
        sxx = b["sxx"].to_numpy(zero_copy_only=False)
        syy = b["syy"].to_numpy(zero_copy_only=False)
        cxy = (n * sxy - sx * sy).astype(np.float64)
        cxx = (n * sxx - sx * sx).astype(np.float64)
        cyy = (n * syy - sy * sy).astype(np.float64)
        ok = (cxx > 0) & (cyy > 0)
        with np.errstate(divide="ignore", invalid="ignore"):
            r = cxy / np.sqrt(cxx * cyy)
            slope = cxy / cxx
        # 6-dp half-away rounding == DuckDB round() (np.round is
        # banker's — a parity hazard at exact .5 boundaries)
        corr6 = pc.round(pa.array(r, pa.float64(), mask=~ok),
                         ndigits=6, round_mode="half_towards_infinity")
        slope6 = pc.round(pa.array(slope, pa.float64(), mask=~ok),
                          ndigits=6, round_mode="half_towards_infinity")
        return pa.table({
            key: b[key],
            "n": b["n"],
            "corr6": corr6,
            "slope6": slope6,
        })

    return agg.map_batches(finish, batch_format="pyarrow")


def group_mode(ds, *, key: str, value_col: str, n_buckets: int = 256):
    """Per-key modal value (plurality vote — majority-vote labeling,
    dominant-language-per-domain, etc.) with a DETERMINISTIC tie-break:
    highest count, then smallest value.

    Shape: map-side (key, value) count partials bound the first
    exchange at |distinct pairs per block|; the global pair-count
    groupby is native (vectorized sum); the per-key argmax is a
    bucketed cogroup — arrow sort + ordered ``group_by(...).first``
    inside each of ``n_buckets`` groups, so dispatch stays capped at
    n_buckets for any key cardinality. Works for string or integer
    keys/values (arrow kernels throughout, no numpy dtype limits).

    Output: (key, value_col, n) — one row per key.
    """
    from ..kg.unionfind import hash_bucket

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table({key: batch[key], value_col: batch[value_col]})
        g = t.group_by([key, value_col]).aggregate([([], "count_all")])
        return g.rename_columns([key, value_col, "c"])

    agg = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby([key, value_col])
        .sum("c")
    )

    def tag(batch: pa.Table) -> pa.Table:
        t = batch.rename_columns([key, value_col, "c"])
        return t.append_column(
            "__bucket", hash_bucket(t[key].combine_chunks(), n_buckets)
        )

    def pick(group: pa.Table) -> pa.Table:
        idx = pc.sort_indices(group, sort_keys=[
            (key, "ascending"), ("c", "descending"), (value_col, "ascending"),
        ])
        t = group.take(idx).select([key, value_col, "c"])
        out = t.group_by(key, use_threads=False).aggregate(
            [(value_col, "first"), ("c", "first")]
        )
        return out.rename_columns([key, value_col, "n"])

    return (
        agg.map_batches(tag, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(pick, batch_format="pyarrow")
    )


def group_zscore(ds, *, key: str, x_col: str, id_cols: list[str],
                 x_fn=None, n_buckets: int = 256,
                 broadcast_stats: int = 1_000_000):
    """Per-group standardization (the ML-preprocessing z-score):
    ``z = (x − μ_k)/σ_k`` computed as ``(n·x − Σx)/sqrt(n·Σx² − (Σx)²)``
    from exact int64 sufficient statistics — every integer exact, the
    final doubles follow an identical IEEE-754 sequence on the engine
    and SQL sides, 6-dp half-away rounding (the group_corr parity
    recipe). ``x_fn`` maps the batch to the int64 x column (default:
    plain cast); magnitude contract: n·max|x|² < 2^63 per group —
    quantize coarsely for wide domains.

    The (key, n, Σx, Σx²) stats table is key-domain-order. When it has
    ≤ ``broadcast_stats`` rows it is ``ray.put`` ONCE and the z map is
    shuffle-free (vectorized arrow hash join per batch); larger key
    domains fall back to a bucket_join of stats onto rows — one
    bounded-dispatch exchange.

    Output: (*id_cols, key, z6); zero-variance groups emit null z6.
    """
    import ray

    from .cogroup import bucket_join
    from .joins import broadcast_lookup

    def _x(batch: pa.Table) -> np.ndarray:
        x = (x_fn(batch) if x_fn is not None
             else pc.cast(batch[x_col], pa.int64()))
        if isinstance(x, pa.ChunkedArray):
            x = x.combine_chunks()
        return x.to_numpy(zero_copy_only=False)

    def partial(batch: pa.Table) -> pa.Table:
        xn = _x(batch)
        t = pa.table({
            key: batch[key],
            "n_p": pa.nulls(batch.num_rows, pa.int64()).fill_null(1),
            "sx": pa.array(xn, pa.int64()),
            "sxx": pa.array(xn * xn, pa.int64()),
        })
        return (
            t.group_by(key)
            .aggregate([("n_p", "sum"), ("sx", "sum"), ("sxx", "sum")])
            .rename_columns([key, "n_p", "sx", "sxx"])
        )

    stats = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(key)
        .sum(["n_p", "sx", "sxx"])
        .map_batches(
            lambda b: b.rename_columns([key, "n", "sx", "sxx"]),
            batch_format="pyarrow",
        )
    ).materialize()

    def rows(batch: pa.Table) -> pa.Table:
        xn = _x(batch)
        cols = {c: batch[c] for c in id_cols}
        cols[key] = batch[key]
        cols["x"] = pa.array(xn, pa.int64())
        return pa.table(cols)

    left = ds.map_batches(rows, batch_format="pyarrow", zero_copy_batch=True)

    def finish(batch: pa.Table) -> pa.Table:
        xn = batch["x"].combine_chunks().to_numpy(zero_copy_only=False)
        n = batch["n"].combine_chunks().to_numpy(zero_copy_only=False)
        sx = batch["sx"].combine_chunks().to_numpy(zero_copy_only=False)
        sxx = batch["sxx"].combine_chunks().to_numpy(zero_copy_only=False)
        var_n = (n * sxx - sx * sx).astype(np.float64)
        ok = var_n > 0
        with np.errstate(divide="ignore", invalid="ignore"):
            z = (n * xn - sx).astype(np.float64) / np.sqrt(var_n)
        z6 = pc.round(pa.array(z, pa.float64(), mask=~ok),
                      ndigits=6, round_mode="half_towards_infinity")
        cols = {c: batch[c] for c in id_cols}
        cols[key] = batch[key]
        cols["z6"] = z6
        return pa.table(cols)

    if stats.count() <= broadcast_stats:
        # all-empty Ray blocks are schemaless — drop them before concat
        blocks = [t for t in ray.get(stats.to_arrow_refs()) if t.num_rows]
        stats_tbl = pa.concat_tables(blocks) if blocks else pa.table({
            key: pa.array([], pa.string()),
            "n": pa.array([], pa.int64()),
            "sx": pa.array([], pa.int64()),
            "sxx": pa.array([], pa.int64()),
        })
        joined = broadcast_lookup(left, stats_tbl, key=key)
    else:
        joined = bucket_join(
            left, stats, key=key, n_buckets=n_buckets,
            left_schema=pa.schema(
                [(c, pa.int64()) for c in id_cols]
                + [(key, pa.string()), ("x", pa.int64())]
            ),
        )
    return joined.map_batches(finish, batch_format="pyarrow")


def group_gini(ds, *, key: str, label_col: str):
    """Per-group Gini impurity / Simpson diversity of a categorical
    column: ``gini = 1 − Σ_labels (c/n)²`` — the label-diversity /
    data-mix-audit statistic. Deliberately Gini rather than Shannon
    entropy: log2 differs by 1 ulp between numpy and DuckDB libm
    (measured, ops/rank.py), while Gini is rational — exact int64
    (n, Σc²) sufficient statistics, one final IEEE expression
    ``1.0 − c2/(n·n)`` identical on both sides, 6-dp rounding.

    Shuffle shape: map-side (key, label) combiner collapses each block
    to its distinct pairs; global pair reduce is keys×labels rows;
    second reduce keys rows. The raw column never shuffles. Output:
    (key, n, gini6).
    """

    def pair_partial(batch: pa.Table) -> pa.Table:
        t = pa.table({key: batch[key], label_col: batch[label_col]})
        agg = t.group_by([key, label_col]).aggregate([([], "count_all")])
        return agg.rename_columns([key, label_col, "c"])

    pairs = (
        ds.map_batches(pair_partial, batch_format="pyarrow",
                       zero_copy_batch=True)
        .groupby([key, label_col])
        .sum("c")
        .map_batches(lambda b: b.rename_columns([key, label_col, "c"]),
                     batch_format="pyarrow")
    )

    def sq_partial(batch: pa.Table) -> pa.Table:
        c = batch["c"].combine_chunks().to_numpy(zero_copy_only=False)
        return pa.table({
            key: batch[key],
            "n": batch["c"],
            "c2": pa.array(c * c, pa.int64()),
        })

    stats = (
        pairs.map_batches(sq_partial, batch_format="pyarrow",
                          zero_copy_batch=True)
        .groupby(key)
        .sum(["n", "c2"])
        .map_batches(lambda b: b.rename_columns([key, "n", "c2"]),
                     batch_format="pyarrow")
    )

    def finish(batch: pa.Table) -> pa.Table:
        n = batch["n"].combine_chunks().to_numpy(zero_copy_only=False)
        c2 = batch["c2"].combine_chunks().to_numpy(zero_copy_only=False)
        g = 1.0 - c2.astype(np.float64) / (n * n).astype(np.float64)
        g6 = pc.round(pa.array(g, pa.float64()), ndigits=6,
                      round_mode="half_towards_infinity")
        return pa.table({key: batch[key], "n": batch["n"], "gini6": g6})

    return stats.map_batches(finish, batch_format="pyarrow")


def value_histogram(ds, *, key: str, value_col: str, width_cents: int,
                    value_fn=None):
    """Fixed-width histogram per group: bin = floor(cents / width),
    count per (key, bin) — the distribution-profiling primitive. All
    integer (floor division on int64 cents), bit-exact vs SQL
    ``CAST(floor(c / w) AS BIGINT)`` (int÷int ≤ 2^53 is correctly
    rounded, and a true integer quotient is exactly representable, so
    the floor never misrounds; numpy ``//`` is floor division, matching
    SQL floor() on negatives too).

    Shuffle shape: each block collapses to its distinct (key, bin)
    pairs map-side; the one global reduce carries keys×bins rows.
    Output: (key, bin, cnt).
    """
    from .relational import cents as to_cents

    def hist_partial(batch: pa.Table) -> pa.Table:
        c = (value_fn(batch) if value_fn is not None
             else to_cents(batch[value_col]))
        if isinstance(c, pa.ChunkedArray):
            c = c.combine_chunks()
        cn = c.to_numpy(zero_copy_only=False)
        t = pa.table({
            key: batch[key],
            "bin": pa.array(cn // width_cents, pa.int64()),
        })
        agg = t.group_by([key, "bin"]).aggregate([([], "count_all")])
        return agg.rename_columns([key, "bin", "cnt"])

    return (
        ds.map_batches(hist_partial, batch_format="pyarrow",
                       zero_copy_batch=True)
        .groupby([key, "bin"])
        .sum("cnt")
        .map_batches(lambda b: b.rename_columns([key, "bin", "cnt"]),
                     batch_format="pyarrow")
    )


def iqr_outliers(ds, *, key: str, value_col: str, id_cols: list[str],
                 k: float = 1.5, key_type: pa.DataType = pa.string(),
                 value_fn=None):
    """Tukey-fence outlier detection per group — the data-cleaning
    composition: exact per-group (q1, q3) from :func:`group_quantiles`
    (one bounded shuffle), fences ``lo = q1 − k·iqr`` / ``hi = q3 +
    k·iqr`` built with the identical IEEE sequence as the SQL oracle
    (q1/q3 are bit-equal interpolated cents), broadcast ONCE, then one
    stateless vectorized filter map over the corpus — rows strictly
    outside the fences come back as (*id_cols, key, cents, side∈
    {'low','high'}). The fence table is key-domain-order (tiny); the
    corpus never shuffles.
    """
    import ray

    from ..kg.resources import broadcast, resolve
    from .joins import broadcast_lookup
    from .relational import cents as to_cents

    def _cents(batch: pa.Table) -> pa.Array:
        c = (value_fn(batch) if value_fn is not None
             else to_cents(batch[value_col]))
        return c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c

    q = group_quantiles(ds, key=key, value_cents=lambda b: _cents(b),
                        qs=(0.25, 0.75), key_type=key_type)
    lo_map: dict = {}
    hi_map: dict = {}
    q1_map: dict = {}
    for b in q.iter_batches(batch_format="pyarrow"):
        if b.num_rows == 0 or key not in b.column_names:
            continue
        for kk, qq, qv in zip(b[key].to_pylist(), b["q"].to_pylist(),
                              b["qv"].to_pylist()):
            (q1_map if qq == 0.25 else hi_map)[kk] = qv
    for kk, q1 in q1_map.items():
        q3 = hi_map[kk]
        iqr = q3 - q1
        lo_map[kk] = q1 - k * iqr
        hi_map[kk] = q3 + k * iqr
    fence_keys = pa.array(sorted(q1_map), key_type)
    lo_arr = np.array([lo_map[x] for x in sorted(q1_map)], np.float64)
    hi_arr = np.array([hi_map[x] for x in sorted(q1_map)], np.float64)
    try:
        fences_ref = broadcast((fence_keys, lo_arr, hi_arr))
    except Exception:
        fences_ref = (fence_keys, lo_arr, hi_arr)

    def flag(batch: pa.Table) -> pa.Table:
        fk, lo, hi = resolve(fences_ref)
        c = _cents(batch)
        cn = c.to_numpy(zero_copy_only=False).astype(np.float64)
        # vectorized fence lookup: dictionary-index into the tiny table
        ki = pc.index_in(pc.cast(batch[key].combine_chunks(), fk.type),
                         value_set=fk)
        kin = ki.to_numpy(zero_copy_only=False)
        lo_v = lo[kin]
        hi_v = hi[kin]
        is_lo = cn < lo_v
        is_hi = cn > hi_v
        keep = pa.array(is_lo | is_hi)
        t = pa.table({
            **{col: batch[col] for col in id_cols},
            key: batch[key],
            "cents": pc.cast(c, pa.int64()),
        }).filter(keep)
        side = np.where(is_lo[is_lo | is_hi], "low", "high")
        return t.append_column("side", pa.array(side.tolist(), pa.string()))

    return ds.map_batches(flag, batch_format="pyarrow",
                          zero_copy_batch=True)


def group_weighted_median(ds, *, key: str, value_cents, weight,
                          key_type: pa.DataType = pa.string(),
                          n_buckets: int = N_BUCKETS):
    """Exact per-group WEIGHTED (lower) median: the smallest value v
    with 2·Σ{w : value ≤ v} ≥ Σw — e.g. the price point at which half
    the shipped QUANTITY is cheaper. ``value_cents``/``weight`` are
    callables batch→int64 pa.Array; integer weights keep the cumulative
    sums exact and the answer bit-identical across layouts.

    Same scale shape as :func:`group_quantiles`: per-block (key, v,
    w_partial) histogram rows, ONE bucketed shuffle, a vectorized
    per-bucket sort + segment walk (no per-key dispatch). Output:
    (key, wmedian_cents int64, total_w int64).
    """
    from ..kg.unionfind import hash_bucket

    def hist_partial(batch: pa.Table) -> pa.Table:
        t = pa.table({
            key: batch[key],
            "v": value_cents(batch),
            "w": weight(batch),
        })
        g = t.group_by([key, "v"]).aggregate([("w", "sum")])
        g = g.rename_columns([key, "v", "w"])
        return g.append_column(
            "__bucket", hash_bucket(g[key].combine_chunks(), n_buckets))

    hist = ds.map_batches(hist_partial, batch_format="pyarrow")
    out_schema = pa.schema([(key, key_type), ("wmedian_cents", pa.int64()),
                            ("total_w", pa.int64())])

    def median_bucket(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return out_schema.empty_table()
        order = pc.sort_indices(
            group, sort_keys=[(key, "ascending"), ("v", "ascending")])
        g = group.take(order)
        ka = g[key].combine_chunks()
        v = g["v"].combine_chunks().to_numpy(zero_copy_only=False)
        w = g["w"].combine_chunks().to_numpy(zero_copy_only=False)
        n = len(v)
        neq = pc.not_equal(ka.slice(1), ka.slice(0, n - 1)).to_numpy(
            zero_copy_only=False)
        starts = np.concatenate(([0], np.flatnonzero(neq.astype(bool)) + 1))
        ends = np.append(starts[1:], n)
        # duplicate v bins across partials are fine: the walk needs the
        # FIRST index where 2·cum ≥ tot, and cum is nondecreasing
        cum = np.cumsum(w)
        base = np.concatenate(([0], cum[ends[:-1] - 1]))
        seg_cum = cum - np.repeat(base, ends - starts)
        tot = seg_cum[ends - 1]
        keys_out, med_out, tot_out = [], [], []
        for i, (s, e) in enumerate(zip(starts, ends)):
            j = s + int(np.searchsorted(2 * seg_cum[s:e], tot[i],
                                        side="left"))
            keys_out.append(ka[s].as_py())
            med_out.append(int(v[j]))
            tot_out.append(int(tot[i]))
        return pa.table({
            key: pa.array(keys_out, key_type),
            "wmedian_cents": pa.array(med_out, pa.int64()),
            "total_w": pa.array(tot_out, pa.int64()),
        })

    return (hist.groupby("__bucket")
            .map_groups(median_bucket, batch_format="pyarrow"))


def winsorize_global(ds, *, id_col: str, value_cents, q_num: int = 5,
                     q_den: int = 100):
    """Global rank-based winsorization: clip every value to the
    [q, 1−q] quantile band (q = q_num/q_den), where the thresholds are
    the LOWER quantiles — the smallest v with count(≤ v) ≥ ceil(q·n) /
    ceil((1−q)·n) — so both thresholds are exact corpus values and the
    clipped output is all-integer, bit-identical across layouts.

    Scale shape: per-block (v, n) histogram partials fold into a native
    v-keyed sum (narrow, value-domain-order); ONE single-block cumsum
    walk finds the two thresholds (the global-rank trade — a value
    histogram, not the corpus, sits in one task); the thresholds
    broadcast and the clip pass is a stateless vectorized map. The
    input is materialized once and feeds both passes. Output:
    (id, v_cents, v_clipped_cents).
    """
    import ray
    import ray.data

    ds = ds.materialize()

    def hist_partial(batch: pa.Table) -> pa.Table:
        t = pa.table({
            "v": value_cents(batch),
            "n": pa.nulls(batch.num_rows, pa.int64()).fill_null(1),
        })
        g = t.group_by("v").aggregate([("n", "sum")])
        return g.rename_columns(["v", "n"])

    hist = (ds.map_batches(hist_partial, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby("v").sum("n")
            .map_batches(lambda b: b.rename_columns(["v", "n"]),
                         batch_format="pyarrow"))

    lo_hi = []
    for b in hist.repartition(1).map_batches(
            lambda t: _threshold_walk(t, q_num, q_den),
            batch_format="pyarrow").iter_batches(batch_format="pyarrow"):
        if b.num_rows:
            lo_hi.append((b["lo"][0].as_py(), b["hi"][0].as_py()))
    (lo, hi), = lo_hi
    ref = ray.put((lo, hi))

    def clip(batch: pa.Table) -> pa.Table:
        lo_, hi_ = ray.get(ref)
        v = value_cents(batch).to_numpy(zero_copy_only=False)
        return pa.table({
            id_col: batch[id_col],
            "v_cents": pa.array(v),
            "v_clipped_cents": pa.array(np.clip(v, lo_, hi_)),
        })

    return ds.map_batches(clip, batch_format="pyarrow",
                          zero_copy_batch=True)


def _threshold_walk(t: pa.Table, q_num: int, q_den: int) -> pa.Table:
    order = pc.sort_indices(t, sort_keys=[("v", "ascending")])
    s = t.take(order)
    v = s["v"].combine_chunks().to_numpy(zero_copy_only=False)
    n = s["n"].combine_chunks().to_numpy(zero_copy_only=False)
    cum = np.cumsum(n)
    total = int(cum[-1])
    r_lo = -(-q_num * total // q_den)           # ceil(q*n)
    r_hi = -(-(q_den - q_num) * total // q_den)  # ceil((1-q)*n)
    lo = v[np.searchsorted(cum, r_lo)]
    hi = v[np.searchsorted(cum, r_hi)]
    return pa.table({"lo": pa.array([int(lo)], pa.int64()),
                     "hi": pa.array([int(hi)], pa.int64())})


def mann_whitney_u(ds, *, group_col: str, value_cents, group_a,
                   group_b):
    """EXACT Mann-Whitney U (rank-sum) statistic between two groups —
    the nonparametric are-these-distributions-different test, computed
    in pure integers: with tied values taking the average rank, every
    quantity is a multiple of ½, so the op reports 2·R_a and 2·U_a
    (plus n_a, n_b) and never touches floats. Consumers form
    U/(n_a·n_b) or a z-score downstream.

    Scale shape (the winsorize_global pattern): per-block (value,
    count_a, count_b) histogram partials fold into a native value-keyed
    sum; ONE single-block walk over the value histogram accumulates
    the tied-rank sum — for a run of c = c_a + c_b equal values
    starting after cumulative s, group a's rows contribute
    c_a · (2s + c + 1) to 2·R_a. Output: one row
    (n_a, n_b, r2_a, u2_a) int64.
    """
    import ray.data

    def hist_partial(batch: pa.Table) -> pa.Table:
        g = batch[group_col].combine_chunks()
        v = value_cents(batch)
        t = pa.table({
            "v": v,
            "ca": pc.cast(pc.equal(g, group_a), pa.int64()),
            "cb": pc.cast(pc.equal(g, group_b), pa.int64()),
        })
        t = t.filter(pc.or_(pc.equal(t["ca"], 1), pc.equal(t["cb"], 1)))
        agg = t.group_by("v").aggregate([("ca", "sum"), ("cb", "sum")])
        return agg.rename_columns(["v", "ca", "cb"])

    hist = (ds.map_batches(hist_partial, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby("v").sum(["ca", "cb"])
            .map_batches(lambda b: b.rename_columns(["v", "ca", "cb"]),
                         batch_format="pyarrow"))

    out_schema = pa.schema([("n_a", pa.int64()), ("n_b", pa.int64()),
                            ("r2_a", pa.int64()), ("u2_a", pa.int64())])

    def walk(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        order = pc.sort_indices(t, sort_keys=[("v", "ascending")])
        s = t.take(order)
        ca = s["ca"].combine_chunks().to_numpy(zero_copy_only=False)
        cb = s["cb"].combine_chunks().to_numpy(zero_copy_only=False)
        c = ca + cb
        start = np.concatenate(([0], np.cumsum(c)[:-1]))
        r2a = int((ca * (2 * start + c + 1)).sum())
        na, nb = int(ca.sum()), int(cb.sum())
        u2a = r2a - na * (na + 1)
        return pa.table({
            "n_a": pa.array([na], pa.int64()),
            "n_b": pa.array([nb], pa.int64()),
            "r2_a": pa.array([r2a], pa.int64()),
            "u2_a": pa.array([u2a], pa.int64()),
        })

    return hist.repartition(1).map_batches(walk, batch_format="pyarrow")


def ks_statistic(ds, *, group_col: str, value_cents, group_a, group_b):
    """EXACT two-sample Kolmogorov–Smirnov statistic: D = max over x of
    |F_a(x) − F_b(x)| — reported as the integer numerator
    ``d_num = max |cum_a·n_b − cum_b·n_a|`` with (n_a, n_b), so
    D = d_num / (n_a·n_b) with no float comparison anywhere inside the
    operator. Same scale shape as :func:`mann_whitney_u` (shared
    histogram fold, one single-block walk). Output: one row
    (n_a, n_b, d_num) int64.
    """
    def hist_partial(batch: pa.Table) -> pa.Table:
        g = batch[group_col].combine_chunks()
        t = pa.table({
            "v": value_cents(batch),
            "ca": pc.cast(pc.equal(g, group_a), pa.int64()),
            "cb": pc.cast(pc.equal(g, group_b), pa.int64()),
        })
        t = t.filter(pc.or_(pc.equal(t["ca"], 1), pc.equal(t["cb"], 1)))
        agg = t.group_by("v").aggregate([("ca", "sum"), ("cb", "sum")])
        return agg.rename_columns(["v", "ca", "cb"])

    hist = (ds.map_batches(hist_partial, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby("v").sum(["ca", "cb"])
            .map_batches(lambda b: b.rename_columns(["v", "ca", "cb"]),
                         batch_format="pyarrow"))

    out_schema = pa.schema([("n_a", pa.int64()), ("n_b", pa.int64()),
                            ("d_num", pa.int64())])

    def walk(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        order = pc.sort_indices(t, sort_keys=[("v", "ascending")])
        s = t.take(order)
        ca = s["ca"].combine_chunks().to_numpy(zero_copy_only=False)
        cb = s["cb"].combine_chunks().to_numpy(zero_copy_only=False)
        na, nb = int(ca.sum()), int(cb.sum())
        cuma = np.cumsum(ca)
        cumb = np.cumsum(cb)
        d_num = int(np.abs(cuma * nb - cumb * na).max()) if len(ca) else 0
        return pa.table({
            "n_a": pa.array([na], pa.int64()),
            "n_b": pa.array([nb], pa.int64()),
            "d_num": pa.array([d_num], pa.int64()),
        })

    return hist.repartition(1).map_batches(walk, batch_format="pyarrow")


def changepoint_cusum(ds, *, day_col: str, value_col: str):
    """Integer-exact single change-point detection over a daily series:
    the day k maximizing |n·prefix_k − k·total| — the CUSUM deviation
    |Σ_{i≤k} x_i − k·mean| scaled by n to stay integer (ties → earliest
    day). Input rows are (day, value) PARTIALS (callers fold map-side);
    the op finishes the fold natively, then one single-block
    chronological walk over the day-order series (calendar-bounded)
    picks the argmax. Output: one row
    (n_days, total, cp_day, s_num) — the deviation at the change point
    is s_num / n_days in value units.
    """
    hist = (ds.groupby(day_col).sum(value_col)
            .map_batches(lambda b: b.rename_columns(["day", "v"]),
                         batch_format="pyarrow"))

    out_schema = pa.schema([
        ("n_days", pa.int64()), ("total", pa.int64()),
        ("cp_day", pa.int64()), ("s_num", pa.int64()),
    ])

    def walk(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        order = pc.sort_indices(t, sort_keys=[("day", "ascending")])
        s = t.take(order)
        day = s["day"].combine_chunks().cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        v = s["v"].combine_chunks().to_numpy(zero_copy_only=False)
        n = len(v)
        total = int(v.sum())
        prefix = np.cumsum(v)
        k = np.arange(1, n + 1, dtype=np.int64)
        dev = np.abs(n * prefix - k * total)
        i = int(np.argmax(dev))  # first maximum → earliest day
        return pa.table({
            "n_days": pa.array([n], pa.int64()),
            "total": pa.array([total], pa.int64()),
            "cp_day": pa.array([int(day[i])], pa.int64()),
            "s_num": pa.array([int(dev[i])], pa.int64()),
        })

    return hist.repartition(1).map_batches(walk, batch_format="pyarrow")


def dataset_fingerprint(ds, *, cols: list[str]):
    """Order-free dataset integrity fingerprint: (n_rows, XOR of the
    md5-8 hash of every row's '|'-joined string form) — XOR is
    commutative/associative and closed under int64, so per-block
    partials fold natively with no overflow and the fingerprint is
    bit-identical across block layouts and parallelism (the checksum
    idiom of the repo's stress tools as a first-class operator; equal
    fingerprints + equal counts ⇒ equal multisets up to md5 collisions,
    except pairs of identical duplicate rows cancel under XOR — pass a
    unique key column in ``cols`` when exact-duplicate rows matter).
    Columns should be integer/string-typed: float→string formatting is
    engine-specific, integers are not.
    """
    import hashlib

    def partial(batch: pa.Table) -> pa.Table:
        strs = [pc.cast(batch[c], pa.string()).combine_chunks()
                for c in cols]
        x = np.int64(0)
        for i in range(batch.num_rows):
            row = "|".join("" if s[i].as_py() is None else s[i].as_py()
                           for s in strs)
            h = int.from_bytes(
                hashlib.md5(row.encode("utf-8")).digest()[:8],
                "little") & 0x7FFFFFFFFFFFFFFF
            x ^= np.int64(h)
        return pa.table({
            "k": pa.array([0], pa.int64()),
            "n_rows": pa.array([batch.num_rows], pa.int64()),
            "fp": pa.array([int(x)], pa.int64()),
        })

    folded = (ds.map_batches(partial, batch_format="pyarrow",
                             zero_copy_batch=True)
              .groupby("k").aggregate(_XorAgg("fp"), _SumAgg("n_rows")))
    return folded.map_batches(
        lambda b: pa.table({
            "n_rows": pc.cast(b.column(2), pa.int64()),
            "fp": pc.cast(b.column(1), pa.int64()),
        }), batch_format="pyarrow")


def _XorAgg(col):
    from ray.data.aggregate import AggregateFn

    return AggregateFn(
        init=lambda k: 0,
        accumulate_row=lambda a, row: a ^ int(row[col]),
        merge=lambda a, b: a ^ b,
        name=f"xor({col})",
    )


def _SumAgg(col):
    from ray.data.aggregate import Sum

    return Sum(col)


def hll_distinct(
    ds,
    *,
    key: str,
    value_col: str,
    p: int = 12,
    key_type: pa.DataType = pa.string(),
    n_buckets: int = N_BUCKETS,
):
    """Approximate COUNT(DISTINCT value) per group via HYPERLOGLOG —
    the scale path past linear counting's ~34k/group saturation
    (:func:`approx_distinct`): per-group state is m = 2^p registers
    (4 KiB at p=12) REGARDLESS of cardinality, good to ~2^50 distinct
    values at a typical 1.04/√m ≈ 1.6% standard error.

    Bit-reproducible in SQL, making the sketch value-exact against a
    DuckDB oracle: the md5-low-64 hash (``md5_number_upper``) splits
    into register = h % m and w = h >> p; the rank ρ = (64−p) −
    bit_length(w) + 1 mirrors ``length(bin(w))``; register maxima
    reduce associatively (one bucketed shuffle carries ≤ m rows per
    group per block); and the harmonic denominator is an EXACT integer
    S = Σ_reg 2^(64−ρ) (empty registers contribute 2^64) summed in
    arbitrary precision (HUGEINT in SQL, Python ints here), so the
    estimate is ONE identically-rounded float division of identical
    inputs on both sides — no order-dependent float reduction.
    Small-range correction (raw ≤ 2.5m, zeros > 0) falls back to
    linear counting, same as the SQL mirror.

    Per-key finalize cost: the register table is ≤ m rows per key, and
    per-key Python appears only in the big-int S fold — the documented
    small-KEY-domain assumption shared with :func:`approx_distinct`
    (group domains like event_type/lang; bucket-cogrouped so dispatch
    stays at n_buckets either way).

    Output: (key, occupied int64, est_distinct float64 — caller rounds
    6dp to match SQL ``round``).
    """
    from ..kg.unionfind import hash_bucket
    from .sample import _hash64

    m = 1 << p
    rho_max = 64 - p + 1

    def partial(batch: pa.Table) -> pa.Table:
        h = _hash64(batch[value_col].to_pylist())
        reg = (h % np.uint64(m)).astype(np.int64)
        w = h >> np.uint64(p)
        # w < 2^(64-p) ≤ 2^52 at p≥12 → float64-exact, frexp exponent
        # IS bit_length(w)
        _, ex = np.frexp(w.astype(np.float64))
        rho = np.where(w == 0, rho_max, rho_max - ex).astype(np.int64)
        t = pa.table({key: batch[key], "reg": pa.array(reg, pa.int64()),
                      "rho": pa.array(rho, pa.int64())})
        t = t.group_by([key, "reg"]).aggregate([("rho", "max")])
        t = t.rename_columns([key, "reg", "rho"])
        return t.append_column(
            "__bucket", hash_bucket(t[key].combine_chunks(), n_buckets))

    partials = ds.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True)
    out_schema = pa.schema(
        [(key, key_type), ("occupied", pa.int64()), ("est_distinct", pa.float64())]
    )
    alpha_mm = 0.7213 / (1.0 + 1.079 / float(m)) * float(m) * float(m)
    two64 = 1 << 64

    def finalize(group: pa.Table) -> pa.Table:
        mx = (group.select([key, "reg", "rho"])
              .group_by([key, "reg"]).aggregate([("rho", "max")]))
        idx = pc.sort_indices(mx, sort_keys=[(key, "ascending")])
        t = mx.take(idx)
        rho = t["rho_max"].combine_chunks().to_numpy(zero_copy_only=False)
        kv = t[key].combine_chunks()
        n = len(rho)
        first = np.ones(n, bool)
        if n > 1:
            first[1:] = ~pc.equal(kv.slice(1), kv.slice(0, n - 1)).to_numpy(
                zero_copy_only=False)
        starts = np.flatnonzero(first)
        occ = np.diff(np.append(starts, n)).astype(np.int64)
        # exact per-term 2^(64-ρ) fits uint64 (ρ ≥ 1); the SUM needs
        # arbitrary precision → object dtype (Python ints), reduceat
        terms = (np.uint64(1) << (np.uint64(64) - rho.astype(np.uint64)))
        seg = np.add.reduceat(terms.astype(object), starts)
        est = np.empty(len(starts), np.float64)
        for i, (s_occ, z) in enumerate(zip(seg, occ)):
            s_total = int(s_occ) + (m - int(z)) * two64
            raw = alpha_mm * (float(two64) / float(s_total))
            zeros = m - int(z)
            if raw <= 2.5 * m and zeros > 0:
                raw = float(m) * float(np.log(float(m) / float(zeros)))
            est[i] = raw
        return pa.table({
            key: pc.cast(kv.take(pa.array(starts, pa.int64())), key_type),
            "occupied": pa.array(occ, pa.int64()),
            "est_distinct": pa.array(est, pa.float64()),
        }, schema=out_schema)

    return partials.groupby("__bucket").map_groups(
        finalize, batch_format="pyarrow")


def cm_sketch_counts(
    weighted_ds,
    *,
    value_col: str,
    weight_col: str,
    d: int = 4,
    w: int = 1024,
    probe_min_weight: int = 100,
):
    """COUNT-MIN sketch frequency estimation — the sketch family's
    answer to "how often does each heavy value occur" when the value
    domain is unbounded: sketch state is a fixed d×w integer register
    grid (d=4 rows × w=1024 counters = 32 KiB) REGARDLESS of
    cardinality, mergeable by elementwise addition, with the classic
    one-sided guarantee exact ≤ est ≤ exact + 2n/w at 1−(1/2)^d
    confidence.

    ``weighted_ds`` carries (value_col, weight_col) partial-count rows
    (the caller combines map-side, e.g. per-block term counts), so the
    sketch update shuffle is bounded by Σ_blocks |distinct values in
    block| and the native cell groupby reduces it to ≤ d·w rows.

    Value-exact against a DuckDB oracle: every register is an INTEGER
    sum over md5-determined cells (row-salted
    ``md5(i || '|' || value) % w`` — :func:`~.sample._hash64` mirrors
    ``md5_number_upper``), merge order is irrelevant, and the estimate
    is an integer MIN over d registers — no float appears anywhere.

    Probes are the values whose EXACT total weight ≥ ``probe_min_weight``
    (computed from the same partials — both consumers share one
    materialized pass). Output: (value, n_exact, est_count), est ≥
    exact always. The bounded d·w-row sketch is collected driver-side
    and closed over by the probe estimator — a 32 KiB broadcast, the
    documented small-side pattern.
    """
    import ray

    from .sample import _hash64

    partials = weighted_ds.materialize()  # feeds sketch AND exact totals

    def updates(batch: pa.Table) -> pa.Table:
        vals = batch[value_col].to_pylist()
        cnt = batch[weight_col].combine_chunks().to_numpy(zero_copy_only=False)
        cells, cnts = [], []
        for i in range(d):
            h = _hash64([f"{i}|{v}" for v in vals])
            cells.append((h % np.uint64(w)).astype(np.int64) + i * w)
            cnts.append(cnt)
        return pa.table({
            "cell": pa.array(np.concatenate(cells), pa.int64()),
            "cnt": pa.array(np.concatenate(cnts), pa.int64()),
        })

    sketch_ds = (partials.map_batches(updates, batch_format="pyarrow",
                                      zero_copy_batch=True)
                 .groupby("cell").sum("cnt"))
    # ≤ d·w rows by construction — bounded driver collect
    sk = pa.concat_tables(
        [t for t in ray.get(sketch_ds.to_arrow_refs())
         if t.num_columns > 0 and t.num_rows > 0]  # drop schemaless empties
    )
    regs = np.zeros(d * w, dtype=np.int64)
    regs[sk["cell"].combine_chunks().to_numpy(zero_copy_only=False)] = (
        sk["sum(cnt)"].combine_chunks().to_numpy(zero_copy_only=False))

    exact = (partials.groupby(value_col).sum(weight_col)
             .map_batches(lambda b: b.rename_columns([value_col, "n_exact"]),
                          batch_format="pyarrow"))

    def estimate(batch: pa.Table) -> pa.Table:
        t = batch.filter(
            pc.greater_equal(batch["n_exact"], probe_min_weight))
        vals = t[value_col].to_pylist()
        est = np.full(len(vals), np.iinfo(np.int64).max, dtype=np.int64)
        for i in range(d):
            h = _hash64([f"{i}|{v}" for v in vals])
            cell = (h % np.uint64(w)).astype(np.int64) + i * w
            est = np.minimum(est, regs[cell])
        return pa.table({
            value_col: t[value_col],
            "n_exact": t["n_exact"],
            "est_count": pa.array(est, pa.int64()),
        })

    return exact.map_batches(estimate, batch_format="pyarrow")


def group_mad(
    ds,
    *,
    key: str,
    value_cents,
    key_type: pa.DataType = pa.string(),
    n_buckets: int = N_BUCKETS,
):
    """Per-group MEDIAN + MEDIAN ABSOLUTE DEVIATION (the robust
    location/scale pair) of an integer-cents value, exact and
    DuckDB-value-exact.

    Two :func:`group_quantiles`-style histogram passes, one bucketed
    shuffle each: pass 1 yields the interpolated median per key (over
    int cents the median is k or k+0.5, so 2·median is an EXACT
    integer); pass 2 histograms the integer deviation
    |2·v − 2·median| in half-cents and takes ITS median, returned in
    cents (an exact dyadic float — the only float ops are
    multiplications by 0.5 of integers < 2^52, bit-identical to SQL
    ``median(abs(v − med))``).

    KEY-CARDINALITY assumption: the pass-1 median table is collected
    driver-side and closed over by pass 2 — bounded by the key domain
    (event_type-like enums), the same documented small-domain contract
    as :func:`approx_distinct`.

    Output: (key, median_cents float64, mad_cents float64).
    """
    import ray

    med_ds = group_quantiles(
        ds, key=key, value_cents=value_cents, qs=(0.5,),
        key_type=key_type, n_buckets=n_buckets)
    med = pa.concat_tables(
        [t for t in ray.get(med_ds.to_arrow_refs())
         if t.num_columns > 0 and t.num_rows > 0]  # drop schemaless empties
    )
    keys_arr = med[key].combine_chunks()
    med2 = np.rint(
        med["qv"].combine_chunks().to_numpy(zero_copy_only=False) * 2.0
    ).astype(np.int64)  # 2·median: exact integer
    med_by_key = dict(zip(keys_arr.to_pylist(),
                          (med2 / 2.0).tolist()))

    def dev_halfcents(batch: pa.Table) -> pa.Array:
        v = value_cents(batch)
        if isinstance(v, pa.ChunkedArray):
            v = v.combine_chunks()
        v_np = v.to_numpy(zero_copy_only=False).astype(np.int64)
        idx = pc.index_in(batch[key], value_set=keys_arr).to_numpy(
            zero_copy_only=False)
        m2 = med2[idx]
        return pa.array(np.abs(2 * v_np - m2), pa.int64())

    mad_ds = group_quantiles(
        ds, key=key, value_cents=dev_halfcents, qs=(0.5,),
        key_type=key_type, n_buckets=n_buckets)

    def finish(batch: pa.Table) -> pa.Table:
        ks = batch[key].to_pylist()
        return pa.table({
            key: batch[key],
            "median_cents": pa.array([med_by_key[k] for k in ks],
                                     pa.float64()),
            "mad_cents": pc.multiply(batch["qv"], 0.5),
        })

    return mad_ds.map_batches(finish, batch_format="pyarrow")


def decayed_score(
    ds,
    *,
    key: str,
    ts_col: str,
    ref_day: int,
    cap_days: int = 40,
):
    """Exponentially time-decayed event count per key — the
    feature-store "recency-weighted engagement" aggregate, with
    base-2 daily decay so the score is an EXACT int64:
    ``score = Σ_events 2^(cap_days − age_days)`` over events whose
    calendar-day age ≤ ``cap_days`` (an event today weighs
    2^cap_days, one cap_days old weighs 1). Every term is a power of
    two, the sum is pure integer arithmetic — no order-dependent
    float reduction, value-exact against DuckDB
    ``SUM(1::BIGINT << (cap − age))``. int64 headroom: up to
    ~2^(62−cap_days) events per key (≈ 4M at cap 40).

    ``ref_day`` is the reference date as days-since-epoch (for naive
    epoch timestamps, ``floor(max_ts_us / 86_400e6)`` — equal to
    DuckDB ``CAST(MAX(ts) AS DATE)``); computing it is the caller's
    one tiny native ``max`` aggregate. Ages are calendar-day
    differences of the DATE parts, matching ``date_diff('day', …)``.

    Shape: per-batch (key, count, score) partials collapse each block
    to ≤ |keys-in-block| rows, then one native groupby-sum — the
    standard map-side-combine aggregate; no per-key Python anywhere.
    Output: (key, n_recent int64, decay_score int64).
    """
    from .temporal import _epoch_us

    us_per_day = 86_400_000_000

    def partial(batch: pa.Table) -> pa.Table:
        ts = _epoch_us(batch[ts_col]).to_numpy(zero_copy_only=False)
        age = ref_day - ts // us_per_day
        keep = age <= cap_days
        k = batch[key].combine_chunks().filter(pa.array(keep))
        w = np.int64(1) << (cap_days - age[keep]).astype(np.int64)
        t = pa.table({key: k,
                      "n_recent": pa.array(np.ones(len(w), np.int64)),
                      "decay_score": pa.array(w, pa.int64())})
        g = t.group_by(key).aggregate(
            [("n_recent", "sum"), ("decay_score", "sum")])
        return g.rename_columns([key, "n_recent", "decay_score"])

    out = (ds.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby(key).sum(["n_recent", "decay_score"]))
    return out.map_batches(
        lambda b: b.rename_columns([key, "n_recent", "decay_score"]),
        batch_format="pyarrow")


def _hll_partial_cols(values, p: int):
    """values → (register, rho) numpy arrays: the shared HLL hashing
    kernel (md5-low-64, register = h % 2^p, rank of the remaining
    64−p bits), identical to the SQL mirror's
    ``md5_number_upper`` / ``length(bin(…))`` arithmetic."""
    from .sample import _hash64

    m = 1 << p
    rho_max = 64 - p + 1
    h = _hash64(values)
    reg = (h % np.uint64(m)).astype(np.int64)
    w = h >> np.uint64(p)
    # w < 2^(64-p) ≤ 2^52 at p≥12 → float64-exact; frexp exponent IS
    # bit_length(w)
    _, ex = np.frexp(w.astype(np.float64))
    rho = np.where(w == 0, rho_max, rho_max - ex).astype(np.int64)
    return reg, rho


def _hll_estimate(occ_rho_pairs, m: int) -> float:
    """(register → max rho) pairs → the HLL estimate with exact-integer
    harmonic denominator + linear-counting small-range fallback —
    the single float division + ln shared bit-for-bit with the SQL
    mirror (see :func:`hll_distinct`)."""
    two64 = 1 << 64
    occ = len(occ_rho_pairs)
    s_total = sum(two64 >> int(r) for r in occ_rho_pairs) \
        + (m - occ) * two64
    alpha_mm = 0.7213 / (1.0 + 1.079 / float(m)) * float(m) * float(m)
    raw = alpha_mm * (float(two64) / float(s_total))
    zeros = m - occ
    if raw <= 2.5 * m and zeros > 0:
        raw = float(m) * float(np.log(float(m) / float(zeros)))
    return raw


def hll_overlap(
    left_ds,
    right_ds,
    *,
    left_col: str,
    right_col: str,
    p: int = 12,
):
    """Set-overlap estimation between two key sets via HLL sketch
    ALGEBRA — the "how big would this join be?" planner primitive:
    sketch each side once, merge registers (max) for the union, and
    inclusion–exclusion gives the intersection:
    ``|A∩B| ≈ est(A) + est(B) − est(A∪B)`` — no join, no shuffle of
    the data itself. Exchange: ≤ m rows per side per block (register
    maxima), final reduce on a single ≤ 2m-row table.

    Like :func:`hll_distinct`, every per-set estimate has an
    exact-integer denominator, so all four outputs are
    DuckDB-value-exact given the same md5 hash. Output: one row
    (est_left, est_right, est_union, est_intersection), unrounded —
    caller rounds 6dp to match SQL.
    """
    m = 1 << p

    def partial_for(col, side):
        def partial(batch: pa.Table) -> pa.Table:
            reg, rho = _hll_partial_cols(batch[col].to_pylist(), p)
            t = pa.table({
                "side": pa.array(np.full(len(reg), side, np.int8)),
                "reg": pa.array(reg), "rho": pa.array(rho)})
            t = t.group_by(["side", "reg"]).aggregate([("rho", "max")])
            return t.rename_columns(["side", "reg", "rho"])
        return partial

    parts = left_ds.map_batches(
        partial_for(left_col, 0), batch_format="pyarrow",
        zero_copy_batch=True,
    ).union(right_ds.map_batches(
        partial_for(right_col, 1), batch_format="pyarrow",
        zero_copy_batch=True,
    ))
    # native (side, reg) max → ≤ 2m rows; single-task finalize
    maxima = parts.groupby(["side", "reg"]).max("rho")

    def finalize(t: pa.Table) -> pa.Table:
        side = t["side"].to_numpy(zero_copy_only=False)
        reg = t["reg"].to_numpy(zero_copy_only=False)
        rho = t["max(rho)"].to_numpy(zero_copy_only=False)
        rho_u = np.zeros(m, np.int64)
        ests = {}
        for s, name in ((0, "est_left"), (1, "est_right")):
            mask = side == s
            np.maximum.at(rho_u, reg[mask], rho[mask])
            ests[name] = _hll_estimate(rho[mask], m)
        ests["est_union"] = _hll_estimate(rho_u[rho_u > 0], m)
        ests["est_intersection"] = (
            ests["est_left"] + ests["est_right"] - ests["est_union"])
        return pa.table({k: pa.array([v], pa.float64())
                         for k, v in ests.items()})

    return maxima.repartition(1).map_batches(
        finalize, batch_format="pyarrow")


def chi_square(ds, *, a_col: str, b_col: str):
    """Pearson chi-square independence table for two categorical
    columns — the contingency-table counterpart of the two-sample
    tests (:func:`mann_whitney_u`, KS): per cell (a, b) the observed
    count, the expected count under independence, and the chi-square
    contribution (O−E)²/E.

    Exactness discipline: margins and N are exact int64 sums; each
    cell's deviation is the exact INTEGER (O·N − R·C) squared in
    arbitrary precision (Python ints here, HUGEINT in the SQL mirror)
    over the exact integer N·R·C, so the only float ops are the final
    per-cell divisions of identical integers — identically rounded
    6dp on both engines. No order-dependent float sum anywhere (the
    total statistic is the caller's Σ of the emitted contributions).

    Scale shape: map-side (a, b) count partials collapse every block
    to the cell domain, one native groupby-sum, single-task finalize
    over the tiny cell table. Output: (a_col, b_col, o int64,
    expected6, contrib6).
    """

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table({a_col: batch[a_col], b_col: batch[b_col]})
        t = t.append_column("o", pa.nulls(t.num_rows,
                                          pa.int64()).fill_null(1))
        g = t.group_by([a_col, b_col]).aggregate([("o", "sum")])
        return g.rename_columns([a_col, b_col, "o"])

    counts = (ds.map_batches(partial, batch_format="pyarrow",
                             zero_copy_batch=True)
              .groupby([a_col, b_col]).sum("o"))

    def finalize(t: pa.Table) -> pa.Table:
        a = t[a_col].to_pylist()
        b = t[b_col].to_pylist()
        o = t["sum(o)"].to_pylist()
        n = sum(o)
        row = {}
        col = {}
        for ai, bi, oi in zip(a, b, o):
            row[ai] = row.get(ai, 0) + oi
            col[bi] = col.get(bi, 0) + oi
        exp, con = [], []
        for ai, bi, oi in zip(a, b, o):
            rc = row[ai] * col[bi]
            dev = oi * n - rc           # exact ints end-to-end
            exp.append(float(rc) / float(n))
            con.append(float(dev * dev) / float(n * rc))
        # half-away-from-zero like DuckDB round() (repo convention)
        r6 = dict(ndigits=6, round_mode="half_towards_infinity")
        return pa.table({
            a_col: t[a_col], b_col: t[b_col],
            "o": pa.array(o, pa.int64()),
            "expected6": pc.round(pa.array(exp, pa.float64()), **r6),
            "contrib6": pc.round(pa.array(con, pa.float64()), **r6),
        })

    return counts.repartition(1).map_batches(finalize,
                                             batch_format="pyarrow")
