"""Distribution statistics operators.

:func:`group_quantiles` computes EXACT linear-interpolated quantiles
per group from (group, value) → count partial histograms: money lives
in integer cents, so each batch collapses to its distinct values before
the single ``groupby(group)`` shuffle. The shuffle carries
Σ_blocks |distinct values in block| rows — equal to raw rows only in
the worst case of an all-unique domain, collapsing by orders of
magnitude for quantized domains (latencies, scores, sizes). The
per-group quantile walk tolerates duplicate value bins (cumulative
counts stay strictly increasing), so no global (group, value) reduce is
needed — measured at sf0.1, that reduce was a full-data multi-key sort
for ~1% compression, 3× the wall time.

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


def approx_distinct(
    ds,
    *,
    key: str,
    value_col: str,
    m: int = 4096,
    key_type: pa.DataType = pa.string(),
):
    """Approximate COUNT(DISTINCT value) per group via LINEAR COUNTING
    with a deterministic md5 slot hash: per-group state is a bitmap of
    at most ``m`` occupied slots regardless of cardinality, partials
    merge by set-union (each batch emits its distinct (group, slot)
    pairs — ≤ m rows per group per block), and the estimate
    ``-m·ln(1 − z/m)`` corrects for hash collisions. Because the slot
    hash is md5 (DuckDB ``md5_number_upper``), the occupied count AND
    the estimate are bit-reproducible in SQL — a sketch with an exact
    oracle. Standard error ≈ √m⁻¹·√(e^t − t − 1)·m/n; with m=4096 and
    n ≤ m the estimate is within ~2% typical.

    Output: (key, occupied int64, est_distinct float64 — round 6dp
    applied by the caller to match SQL ``round``).
    """
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
        return t.group_by([key, "slot"]).aggregate([])

    partials = ds.map_batches(slots_partial, batch_format="pyarrow")
    out_schema = pa.schema(
        [(key, key_type), ("occupied", pa.int64()), ("est_distinct", pa.float64())]
    )

    def estimate(group: pa.Table) -> pa.Table:
        slots = group["slot"].combine_chunks().to_numpy(zero_copy_only=False)
        z = len(np.unique(slots))
        est = -float(m) * np.log(1.0 - z / float(m)) if z < m else float("inf")
        return pa.table(
            {
                key: pa.array([group[key][0].as_py()], key_type),
                "occupied": pa.array([z], pa.int64()),
                "est_distinct": pa.array([est], pa.float64()),
            },
            schema=out_schema,
        )

    return partials.groupby(key).map_groups(estimate, batch_format="pyarrow")


def group_quantiles(
    ds,
    *,
    key: str,
    value_cents,
    qs: tuple[float, ...] = (0.25, 0.5, 0.75),
    key_type: pa.DataType = pa.string(),
):
    """Exact per-group quantiles of an integer-cents value. ``value_cents``
    is a callable batch→pa.Array producing the int64 cents column.
    Output: (key, q float64, qv float64 = interpolated quantile in cents).
    """

    def hist_partial(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                key: batch[key],
                "v": value_cents(batch),
                "one": pa.nulls(batch.num_rows, pa.int64()).fill_null(1),
            }
        )
        g = t.group_by([key, "v"]).aggregate([("one", "sum")])
        return g.rename_columns([key, "v", "n_local"])

    # ONE shuffle: batch-partial histograms go straight into the
    # per-key groupby. A global (key, v) reduce first would bound the
    # per-group payload by |distinct v| — but measured at sf0.1 the
    # price domain is ~99% unique, so that reduce is a full-data
    # multi-key sort for no compression (9.9s → 3s without it). The
    # quantile walk below tolerates duplicate v bins (cumulative counts
    # stay strictly increasing), so partials need no pre-merge.
    hist = ds.map_batches(hist_partial, batch_format="pyarrow")

    out_schema = pa.schema([(key, key_type), ("q", pa.float64()), ("qv", pa.float64())])

    def quantiles(group: pa.Table) -> pa.Table:
        v = group["v"].combine_chunks().to_numpy(zero_copy_only=False)
        n = group["n_local"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.argsort(v, kind="stable")
        v = v[order].astype(np.float64)
        cum = np.cumsum(n[order])  # cum[i] = #values <= v[i]
        total = int(cum[-1])
        kval = group[key][0]
        out_q, out_v = [], []
        for q in qs:
            idx = (total - 1) * q
            lo = int(np.floor(idx))
            frac = idx - lo
            # rank r (0-based) lives at the first histogram bin with cum > r
            a = v[np.searchsorted(cum, lo, side="right")]
            if frac == 0.0:
                res = a
            else:
                b = v[np.searchsorted(cum, lo + 1, side="right")]
                res = a + (b - a) * frac
            out_q.append(q)
            out_v.append(res)
        return pa.table(
            {
                key: pa.array([kval.as_py()] * len(qs), key_type),
                "q": pa.array(out_q, pa.float64()),
                "qv": pa.array(out_v, pa.float64()),
            },
            schema=out_schema,
        )

    return hist.groupby(key).map_groups(quantiles, batch_format="pyarrow")
