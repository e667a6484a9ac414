"""Distribution statistics operators.

:func:`group_quantiles` computes EXACT linear-interpolated quantiles per
group without ever co-locating a group's raw rows: because money lives
in integer cents, the value domain is discrete, so the pipeline reduces
to a (group, value) → count histogram first (combiner inside each batch,
then one global groupby whose cardinality is bounded by the number of
DISTINCT values, not rows), and the final per-group quantile walk runs
over that tiny histogram. At 100 TB the shuffle carries at most
|groups| × |distinct cents| rows — millions, not trillions — and no
worker ever needs a full group's rows in memory.

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

    hist = (
        ds.map_batches(hist_partial, batch_format="pyarrow")
        .groupby([key, "v"])
        .sum("n_local")
    )

    out_schema = pa.schema([(key, key_type), ("q", pa.float64()), ("qv", pa.float64())])

    def quantiles(group: pa.Table) -> pa.Table:
        v = group["v"].combine_chunks().to_numpy(zero_copy_only=False)
        n = group["sum(n_local)"].combine_chunks().to_numpy(zero_copy_only=False)
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
