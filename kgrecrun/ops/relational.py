"""Relational pipelines over the driver's TPC-H-ish tables, expressed
Ray-Data-first: column-pruned ``read_parquet``, per-batch partial
aggregation (combiner) before every global ``groupby``, broadcast
lookup for small dimension tables instead of shuffle joins, and
``sort().limit()`` only on already-reduced data.

Money columns are summed as integer cents (``round(x*100)`` per row is
one deterministic double op, then an order-independent int64 sum) so
results are bit-exact against any SQL engine regardless of float
summation order — the oracle SQL in ``__ray_entry__.py`` mirrors this.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq


def cents(col) -> pa.Array:
    """Money column → integer cents: one deterministic double op per row
    then order-free int64 sums; see the module docstring. Shared by the
    windowed and funnel ops."""
    return pc.cast(
        pc.round(
            pc.multiply(pc.cast(col, pa.float64()), 100.0),
            round_mode="half_towards_infinity",  # = DuckDB/SQL round()
        ),
        pa.int64(),
    )


_cents = cents


def docs_by_lang(sf_dir: str):
    """documents → (lang, n): global count per language."""
    import ray.data

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["lang"])

    def pre(batch: pa.Table) -> pa.Table:
        g = batch.group_by(["lang"]).aggregate([("lang", "count")])
        return g.rename_columns(["lang", "n_local"])

    agg = ds.map_batches(pre, batch_format="pyarrow").groupby("lang").sum("n_local")
    return agg.map_batches(
        lambda b: b.rename_columns(["lang", "n"]), batch_format="pyarrow"
    )


def q1_pricing_summary(sf_dir: str):
    """lineitem → per (returnflag, linestatus): qty/price sums + counts.
    Partial-aggregate inside each batch so the shuffle carries one row
    per group per block (SURVEY.md §7.3)."""
    import ray.data

    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice"],
    )

    def pre(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "l_returnflag": batch["l_returnflag"],
                "l_linestatus": batch["l_linestatus"],
                "qty": pc.cast(batch["l_quantity"], pa.int64()),
                "price_cents": _cents(batch["l_extendedprice"]),
            }
        )
        g = t.group_by(["l_returnflag", "l_linestatus"]).aggregate(
            [("qty", "sum"), ("price_cents", "sum"), ("qty", "count")]
        )
        return g.rename_columns(
            ["l_returnflag", "l_linestatus", "sum_qty", "sum_price_cents", "n_local"]
        )

    agg = (
        ds.map_batches(pre, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .sum(["sum_qty", "sum_price_cents", "n_local"])
    )

    def finish(batch: pa.Table) -> pa.Table:
        b = batch.rename_columns(
            ["l_returnflag", "l_linestatus", "sum_qty", "sum_price_cents", "count_order"]
        )
        avg = pc.round(
            pc.divide(
                pc.cast(b["sum_qty"], pa.float64()),
                pc.cast(b["count_order"], pa.float64()),
            ),
            ndigits=6,
            round_mode="half_towards_infinity",  # = DuckDB round()
        )
        return b.append_column("avg_qty", avg)

    return agg.map_batches(finish, batch_format="pyarrow")


def top_customers(sf_dir: str, k: int = 10):
    """orders → top-k customers by total order value (cents), with names
    attached from the small customer table via broadcast lookup — no
    shuffle join for a dimension table."""
    import ray
    import ray.data

    ds = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"]
    )

    def pre(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "o_custkey": batch["o_custkey"],
                "revenue_cents": _cents(batch["o_totalprice"]),
                "n_local": pa.array([1] * batch.num_rows, pa.int64()),
            }
        )
        g = t.group_by(["o_custkey"]).aggregate(
            [("revenue_cents", "sum"), ("n_local", "sum")]
        )
        return g.rename_columns(["o_custkey", "revenue_cents", "n_local"])

    agg = (
        ds.map_batches(pre, batch_format="pyarrow")
        .groupby("o_custkey")
        .sum(["revenue_cents", "n_local"])
    )
    top = (
        agg.map_batches(
            lambda b: b.rename_columns(["o_custkey", "revenue_cents", "n_orders"]),
            batch_format="pyarrow",
        )
        .sort(["revenue_cents", "o_custkey"], descending=[True, False])
        .limit(k)
    )

    from .joins import broadcast_lookup

    names_tbl = pq.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_name"]
    )
    with_names = broadcast_lookup(
        top, names_tbl, key="o_custkey", right_key="c_custkey"
    )

    def shape(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "c_custkey": batch["o_custkey"],
                "c_name": batch["c_name"],
                "revenue_cents": batch["revenue_cents"],
                "n_orders": batch["n_orders"],
            }
        )

    return with_names.map_batches(shape, batch_format="pyarrow")


def events_daily(sf_dir: str):
    """events → per (day, event_type): count + value sum (cents)."""
    import ray.data

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "event_type", "value"]
    )

    def pre(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "day": pc.strftime(batch["ts"], format="%Y-%m-%d"),
                "event_type": batch["event_type"],
                "value_cents": _cents(batch["value"]),
                "one": pa.array([1] * batch.num_rows, pa.int64()),
            }
        )
        g = t.group_by(["day", "event_type"]).aggregate(
            [("one", "sum"), ("value_cents", "sum")]
        )
        return g.rename_columns(["day", "event_type", "n_local", "cents_local"])

    agg = (
        ds.map_batches(pre, batch_format="pyarrow")
        .groupby(["day", "event_type"])
        .sum(["n_local", "cents_local"])
    )
    return agg.map_batches(
        lambda b: b.rename_columns(["day", "event_type", "n_events", "sum_value_cents"]),
        batch_format="pyarrow",
    )


def part_topk(sf_dir: str, min_size: int = 25, k: int = 20):
    """part → filter at the read (column prune + predicate) → top-k by
    retail price. Sort happens on the filtered subset only."""
    import ray.data

    ds = ray.data.read_parquet(
        f"{sf_dir}/part.parquet",
        columns=["p_partkey", "p_name", "p_size", "p_retailprice"],
    )

    def f(batch: pa.Table) -> pa.Table:
        kept = batch.filter(pc.greater(batch["p_size"], min_size))
        return kept.select(["p_partkey", "p_name", "p_retailprice"])

    return (
        ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)
        .sort(["p_retailprice", "p_partkey"], descending=[True, False])
        .limit(k)
    )


def segment_revenue(sf_dir: str, num_partitions: int = 8):
    """orders ⋈ customer via Ray Data's NATIVE hash join (both sides
    partitioned on the key), then aggregate revenue per market segment.
    The broadcast-lookup pattern (see supplier_region/top_customers) is
    preferred when one side is tiny; this pipeline is the general path
    for when both sides are large."""
    import ray.data

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"]
    )

    def order_cents(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_custkey": batch["o_custkey"],
                "cents": _cents(batch["o_totalprice"]),
            }
        )

    customer = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    )
    joined = orders.map_batches(order_cents, batch_format="pyarrow").join(
        customer,
        join_type="inner",
        num_partitions=num_partitions,
        on=("o_custkey",),
        right_on=("c_custkey",),
    )

    def pre(batch: pa.Table) -> pa.Table:
        g = batch.group_by(["c_mktsegment"]).aggregate([("cents", "sum"), ("cents", "count")])
        return g.rename_columns(["c_mktsegment", "cents_local", "n_local"])

    agg = (
        joined.map_batches(pre, batch_format="pyarrow")
        .groupby("c_mktsegment")
        .sum(["cents_local", "n_local"])
    )
    return agg.map_batches(
        lambda b: b.rename_columns(["c_mktsegment", "revenue_cents", "n_orders"]),
        batch_format="pyarrow",
    )


def supplier_region(sf_dir: str):
    """supplier ⋈ nation ⋈ region → per region: supplier count + acctbal
    sum. The two dimension tables are tiny: composed driver-side into a
    nationkey→region map and broadcast once (SURVEY.md §7.3 broadcast
    join), so the only shuffle is the final 5-row groupby."""
    import ray
    import ray.data

    from .joins import broadcast_lookup

    nation = pq.read_table(f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_regionkey"])
    region = pq.read_table(f"{sf_dir}/region.parquet", columns=["r_regionkey", "r_name"])
    # compose the two tiny dimensions driver-side: nationkey → region name
    nr = nation.join(region, keys=["n_regionkey"], right_keys=["r_regionkey"]).select(
        ["n_nationkey", "r_name"]
    )

    ds = ray.data.read_parquet(
        f"{sf_dir}/supplier.parquet", columns=["s_nationkey", "s_acctbal"]
    )
    with_region = broadcast_lookup(ds, nr, key="s_nationkey", right_key="n_nationkey")

    def pre(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "r_name": batch["r_name"],
                "acctbal_cents": _cents(batch["s_acctbal"]),
                "one": pa.nulls(batch.num_rows, pa.int64()).fill_null(1),
            }
        )
        g = t.group_by(["r_name"]).aggregate([("one", "sum"), ("acctbal_cents", "sum")])
        return g.rename_columns(["r_name", "n_local", "cents_local"])

    agg = with_region.map_batches(pre, batch_format="pyarrow").groupby("r_name").sum(
        ["n_local", "cents_local"]
    )
    return agg.map_batches(
        lambda b: b.rename_columns(["r_name", "n_suppliers", "sum_acctbal_cents"]),
        batch_format="pyarrow",
    )


def daily_activity_outer(sf_dir: str):
    """Per-day event counts FULL OUTER JOIN per-day order counts via
    the generic bucket-cogroup join (ops/cogroup.py): each side
    pre-aggregates map-side so the shuffle carries day-level partials
    only, and the outer join null-pads whichever side had no activity
    that day. Event days (recent) and order days (TPC-H 1992-1998)
    barely overlap, so both unmatched paths execute for real."""
    import ray.data

    from .cogroup import bucket_join

    def day_counts(path, ts_col, out_name):
        ds = ray.data.read_parquet(path, columns=[ts_col])

        def pre(batch: pa.Table) -> pa.Table:
            t = pa.table({
                "day": pc.strftime(batch[ts_col], format="%Y-%m-%d"),
                "one": pa.array([1] * batch.num_rows, pa.int64()),
            })
            return (t.group_by("day").aggregate([("one", "sum")])
                    .rename_columns(["day", "n_local"]))

        agg = (ds.map_batches(pre, batch_format="pyarrow")
               .groupby("day").sum("n_local"))
        return agg.map_batches(
            lambda b: b.rename_columns(["day", out_name]),
            batch_format="pyarrow",
        )

    ev = day_counts(f"{sf_dir}/events.parquet", "ts", "n_events")
    od = day_counts(f"{sf_dir}/orders.parquet", "o_orderdate", "n_orders")
    return bucket_join(
        ev, od, key="day", join_type="full outer", n_buckets=32,
        left_schema=pa.schema([("day", pa.string()), ("n_events", pa.int64())]),
        right_schema=pa.schema([("day", pa.string()), ("n_orders", pa.int64())]),
    )


def shipping_priority(sf_dir: str, *, segment: str = "BUILDING",
                      cutoff: str = "1996-06-01", k: int = 10):
    """TPC-H Q3-shaped pipeline — the multi-join flagship: revenue of
    undelivered-as-of-``cutoff`` orders for one market segment, top-k.

        customer(σ segment) ⋉ orders(σ date<cutoff)
                ⋈ Σ_lineitem(σ shipdate>cutoff) revenue   → top-k

    Scale shape, stage by stage: both date filters are PUSHED TO THE
    READ (pyarrow row-group predicates — pruned row groups never leave
    storage); the segment side ships only distinct custkeys into the
    semi-join's bucketed cogroup; lineitem revenue pre-aggregates per
    orderkey map-side so the groupby shuffle carries one row per
    (block, orderkey); the order⋈revenue join is a bucketed cogroup
    (both sides large at scale — no broadcast); top-k is local-k per
    block then one ≤ k·blocks reduce. Revenue is
    ``round((extprice·(1−disc))·100)`` int64 cents — the identical
    IEEE sequence as the SQL oracle.

    Output: (o_orderkey, revenue_cents, o_date_day, o_orderpriority),
    the k highest revenues (ties: earlier date, then lower orderkey).
    """
    import ray.data

    from .cogroup import bucket_join
    from .joins import semi_join

    cutoff_us = int(
        np.datetime64(cutoff, "us").astype("datetime64[us]").astype(np.int64)
    )
    day_us = 86_400_000_000

    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_mktsegment"],
        filter=(pc.field("c_mktsegment") == segment),
    ).map_batches(
        lambda b: pa.table({"o_custkey": b["c_custkey"]}),
        batch_format="pyarrow", zero_copy_batch=True,
    )

    def order_proj(batch: pa.Table) -> pa.Table:
        us = pc.cast(batch["o_orderdate"], pa.int64()).to_numpy(
            zero_copy_only=False)
        return pa.table({
            "o_orderkey": batch["o_orderkey"],
            "o_custkey": batch["o_custkey"],
            "o_date_day": pa.array(us // day_us, pa.int64()),
            "o_orderpriority": batch["o_orderpriority"],
        })

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"],
        filter=(pc.field("o_orderdate")
                < pa.scalar(cutoff_us, pa.timestamp("us"))),
    ).map_batches(order_proj, batch_format="pyarrow", zero_copy_batch=True)

    # one market segment's custkeys are the canonical broadcast-side
    # (~1/5 of customers); the threshold keeps the zero-shuffle path
    # for anything that fits one object comfortably and falls back to
    # the bucketed cogroup beyond it (500M-customer regime)
    orders = semi_join(orders, cust, "o_custkey",
                       broadcast_threshold=4_000_000)
    orders = orders.drop_columns(["o_custkey"])

    def revenue_partial(batch: pa.Table) -> pa.Table:
        ep = batch["l_extendedprice"].combine_chunks().to_numpy(
            zero_copy_only=False)
        disc = batch["l_discount"].combine_chunks().to_numpy(
            zero_copy_only=False)
        rc = pc.cast(
            pc.round(pa.array((ep * (1.0 - disc)) * 100.0, pa.float64()),
                     round_mode="half_towards_infinity"),
            pa.int64(),
        )
        t = pa.table({
            "o_orderkey": batch["l_orderkey"],
            "revenue_cents": rc,
        })
        agg = t.group_by("o_orderkey").aggregate([("revenue_cents", "sum")])
        return agg.rename_columns(["o_orderkey", "revenue_cents"])

    revenue = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount",
                 "l_shipdate"],
        filter=(pc.field("l_shipdate")
                > pa.scalar(cutoff_us, pa.timestamp("us"))),
    ).map_batches(revenue_partial, batch_format="pyarrow",
                  zero_copy_batch=True)

    # left_agg_sum fuses the per-orderkey revenue reduce INTO the join's
    # bucket cogroup — one all-to-all instead of groupby + join
    joined = bucket_join(
        revenue, orders, key="o_orderkey",
        left_agg_sum=["revenue_cents"],
        left_schema=pa.schema([("o_orderkey", pa.int64()),
                               ("revenue_cents", pa.int64())]),
        right_schema=pa.schema([("o_orderkey", pa.int64()),
                                ("o_date_day", pa.int64()),
                                ("o_orderpriority", pa.string())]),
    )

    def topk(batch: pa.Table) -> pa.Table:
        order = pc.sort_indices(batch, sort_keys=[
            ("revenue_cents", "descending"),
            ("o_date_day", "ascending"),
            ("o_orderkey", "ascending"),
        ])
        return batch.take(order.slice(0, k)).select(
            ["o_orderkey", "revenue_cents", "o_date_day", "o_orderpriority"])

    return joined.map_batches(topk, batch_format="pyarrow").repartition(1)\
        .map_batches(topk, batch_format="pyarrow")


def props_field_stats(sf_dir: str, *, field: str = "k", events_ds=None):
    """Semi-structured (JSON) field extraction + per-type aggregation:
    pull integer ``field`` out of the events ``props`` JSON string with
    ONE vectorized RE2 ``extract_regex`` kernel (no per-row json.loads
    loop; the same regex runs verbatim in the SQL oracle, so extraction
    semantics are engine-identical by construction), then exact int64
    (n, sum, min, max) per event_type via map-side combiner + one tiny
    groupby. Output: (event_type, n, sum_k, min_k, max_k).
    """
    import ray.data

    ds = events_ds if events_ds is not None else ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "props"]
    )
    pattern = rf'"{field}":\s*(?P<v>-?\d+)'

    def partial(batch: pa.Table) -> pa.Table:
        ex = pc.extract_regex(batch["props"].combine_chunks(), pattern)
        k = pc.cast(pc.struct_field(ex, "v"), pa.int64())
        t = pa.table({
            "event_type": batch["event_type"],
            "n_p": pa.nulls(batch.num_rows, pa.int64()).fill_null(1),
            "s_p": k,
            "mn_p": k,
            "mx_p": k,
        })
        agg = t.group_by("event_type").aggregate(
            [("n_p", "sum"), ("s_p", "sum"), ("mn_p", "min"),
             ("mx_p", "max")])
        return agg.rename_columns(["event_type", "n_p", "s_p", "mn_p", "mx_p"])

    from ray.data.aggregate import Max, Min, Sum

    agg = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("event_type")
        .aggregate(Sum("n_p"), Sum("s_p"), Min("mn_p"), Max("mx_p"))
    )
    return agg.map_batches(
        lambda b: b.rename_columns(
            ["event_type", "n", "sum_k", "min_k", "max_k"]),
        batch_format="pyarrow",
    )


def pivot_counts(ds, *, key: str, label_col: str, labels: list[str],
                 prefix: str = "n_"):
    """Long→wide PIVOT by counting: one output row per ``key`` with a
    ``{prefix}{label}`` count column per entry of ``labels`` (SQL
    ``COUNT(*) FILTER (WHERE label = ...)``).

    The label domain is a caller-supplied BOUNDED list — the wide
    schema must be fixed up front (discover it with a tiny distinct
    first if unknown); rows with labels outside it are ignored.

    Scale shape: per-batch vectorized mask sums collapse each block to
    ≤ one row per key (map-side combiner), then ONE native groupby-sum
    carries |keys| × blocks short int rows — no per-key dispatch, no
    label strings on the wire after the map side.
    """
    import ray.data  # noqa: F401

    out_cols = [f"{prefix}{lab}" for lab in labels]

    def partial(batch: pa.Table) -> pa.Table:
        lab = batch[label_col].combine_chunks()
        cols = {key: batch[key]}
        for name, want in zip(out_cols, labels):
            cols[name] = pc.cast(pc.equal(lab, want), pa.int64())
        t = pa.table(cols)
        agg = t.group_by(key).aggregate([(c, "sum") for c in out_cols])
        return agg.rename_columns([key, *out_cols])

    agg = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(key)
        .sum(out_cols)
    )
    return agg.map_batches(
        lambda b: b.rename_columns([key, *out_cols]), batch_format="pyarrow"
    )


def promo_revenue(sf_dir: str, *, month_lo: str = "1996-09-01",
                  month_hi: str = "1996-10-01"):
    """TPC-H Q14-shaped promotion-revenue share for one ship month:
    what fraction of discounted revenue came from PROMO-type parts.

    The month predicate is pushed to the parquet read; part type is
    attached via broadcast lookup (dimension table — no shuffle join);
    each batch folds to ONE (promo_cents, total_cents) partial row, so
    the global reduce is a constant-size groupby. The share is an
    integer ppm (promo·10⁶ // total) — bit-exact vs SQL, no float
    division in the hash path. Output: one row
    (promo_cents, total_cents, promo_ppm)."""
    import ray.data

    from .joins import broadcast_lookup

    lo = np.datetime64(month_lo, "us").astype(np.int64)
    hi = np.datetime64(month_hi, "us").astype(np.int64)
    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_extendedprice", "l_discount", "l_shipdate"],
        filter=(
            (pc.field("l_shipdate") >= pa.scalar(int(lo), pa.timestamp("us")))
            & (pc.field("l_shipdate") < pa.scalar(int(hi), pa.timestamp("us")))
        ),
    )
    ptype = pq.read_table(f"{sf_dir}/part.parquet", columns=["p_partkey", "p_type"])
    with_type = broadcast_lookup(ds, ptype, key="l_partkey", right_key="p_partkey")

    def partial(batch: pa.Table) -> pa.Table:
        ep = batch["l_extendedprice"].combine_chunks().to_numpy(zero_copy_only=False)
        disc = batch["l_discount"].combine_chunks().to_numpy(zero_copy_only=False)
        rc = pc.cast(
            pc.round(pa.array((ep * (1.0 - disc)) * 100.0, pa.float64()),
                     round_mode="half_towards_infinity"),
            pa.int64(),
        ).to_numpy(zero_copy_only=False)
        promo = (batch["p_type"].combine_chunks()
                 .to_numpy(zero_copy_only=False) == "PROMO")
        return pa.table({
            "k": pa.array([0], pa.int64()),
            "promo_cents": pa.array([int(rc[promo].sum())], pa.int64()),
            "total_cents": pa.array([int(rc.sum())], pa.int64()),
        })

    agg = (with_type.map_batches(partial, batch_format="pyarrow",
                                 zero_copy_batch=True)
           .groupby("k").sum(["promo_cents", "total_cents"]))

    def finish(batch: pa.Table) -> pa.Table:
        b = batch.rename_columns(["k", "promo_cents", "total_cents"])
        ppm = pc.divide(pc.multiply(b["promo_cents"], 1_000_000),
                        b["total_cents"])
        return pa.table({
            "promo_cents": b["promo_cents"],
            "total_cents": b["total_cents"],
            "promo_ppm": pc.cast(ppm, pa.int64()),
        })

    return agg.map_batches(finish, batch_format="pyarrow")


def large_orders(sf_dir: str, *, min_qty: int = 220):
    """TPC-H Q18-shaped large-volume orders: orders whose lineitem
    quantity total exceeds ``min_qty``, with customer name attached.

    The per-orderkey quantity reduce is FUSED into the order⋈qty join's
    single bucket shuffle (``bucket_join(left_agg_sum=...)``) — map-side
    per-block partials in, one all-to-all, HAVING filter applied on the
    joined bucket output. Customer name attaches via broadcast lookup.
    Output: (o_orderkey, o_custkey, c_name, sum_qty, o_totalprice_cents).
    """
    import ray.data

    from .cogroup import bucket_join
    from .joins import broadcast_lookup

    def qty_partial(batch: pa.Table) -> pa.Table:
        t = pa.table({
            "o_orderkey": batch["l_orderkey"],
            "sum_qty": pc.cast(
                pc.round(batch["l_quantity"],
                         round_mode="half_towards_infinity"),
                pa.int64()),
        })
        return (t.group_by("o_orderkey").aggregate([("sum_qty", "sum")])
                .rename_columns(["o_orderkey", "sum_qty"]))

    qty = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_quantity"]
    ).map_batches(qty_partial, batch_format="pyarrow", zero_copy_batch=True)

    def order_proj(batch: pa.Table) -> pa.Table:
        return pa.table({
            "o_orderkey": batch["o_orderkey"],
            "o_custkey": batch["o_custkey"],
            "o_totalprice_cents": _cents(batch["o_totalprice"]),
        })

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_totalprice"],
    ).map_batches(order_proj, batch_format="pyarrow", zero_copy_batch=True)

    joined = bucket_join(
        qty, orders, key="o_orderkey", left_agg_sum=["sum_qty"],
        left_schema=pa.schema([("o_orderkey", pa.int64()),
                               ("sum_qty", pa.int64())]),
        right_schema=pa.schema([("o_orderkey", pa.int64()),
                                ("o_custkey", pa.int64()),
                                ("o_totalprice_cents", pa.int64())]),
    )
    big = joined.map_batches(
        lambda b: b.filter(pc.greater(b["sum_qty"], min_qty)),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    names = pq.read_table(f"{sf_dir}/customer.parquet",
                          columns=["c_custkey", "c_name"])
    return broadcast_lookup(big, names, key="o_custkey", right_key="c_custkey")


def orders_above_cust_avg(sf_dir: str):
    """Correlated-subquery pattern (orders pricier than their OWN
    customer's average): the per-customer (sum, count) reduce is fused
    into the join's single bucket shuffle via ``left_agg_sum``, and the
    comparison is cross-multiplied to stay in exact int64
    (``price·n > sum`` ⇔ ``price > avg`` — no float division anywhere).
    Output: (o_orderkey, o_custkey, o_totalprice_cents)."""
    import ray.data

    from .cogroup import bucket_join

    def stat_partial(batch: pa.Table) -> pa.Table:
        t = pa.table({
            "o_custkey": batch["o_custkey"],
            "sum_cents": _cents(batch["o_totalprice"]),
            "n_orders": pa.nulls(batch.num_rows, pa.int64()).fill_null(1),
        })
        return (t.group_by("o_custkey")
                .aggregate([("sum_cents", "sum"), ("n_orders", "sum")])
                .rename_columns(["o_custkey", "sum_cents", "n_orders"]))

    def order_proj(batch: pa.Table) -> pa.Table:
        return pa.table({
            "o_custkey": batch["o_custkey"],
            "o_orderkey": batch["o_orderkey"],
            "o_totalprice_cents": _cents(batch["o_totalprice"]),
        })

    read = lambda: ray.data.read_parquet(  # noqa: E731
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_totalprice"],
    )
    stats = read().map_batches(stat_partial, batch_format="pyarrow",
                               zero_copy_batch=True)
    orders = read().map_batches(order_proj, batch_format="pyarrow",
                                zero_copy_batch=True)
    joined = bucket_join(
        stats, orders, key="o_custkey",
        left_agg_sum=["sum_cents", "n_orders"],
        left_schema=pa.schema([("o_custkey", pa.int64()),
                               ("sum_cents", pa.int64()),
                               ("n_orders", pa.int64())]),
        right_schema=pa.schema([("o_custkey", pa.int64()),
                                ("o_orderkey", pa.int64()),
                                ("o_totalprice_cents", pa.int64())]),
    )

    def above(batch: pa.Table) -> pa.Table:
        keep = pc.greater(
            pc.multiply(batch["o_totalprice_cents"], batch["n_orders"]),
            batch["sum_cents"])
        return batch.filter(keep).select(
            ["o_orderkey", "o_custkey", "o_totalprice_cents"])

    return joined.map_batches(above, batch_format="pyarrow",
                              zero_copy_batch=True)


def local_supplier_revenue(sf_dir: str, *, region: str = "ASIA",
                           year_lo: str = "1996-01-01",
                           year_hi: str = "1997-01-01"):
    """TPC-H Q5-shaped "local supplier volume": revenue per nation for
    orders placed in ``[year_lo, year_hi)`` where the CUSTOMER and the
    SUPPLIER sit in the same nation of one region.

        customer ⋈ orders(σ year) ⋈ lineitem ⋈ supplier ⋈ nation ⋈ region
        with c_nationkey = s_nationkey                        → Σ per nation

    Scale shape: nation⋈region composes driver-side (dozens of rows)
    into a broadcast nationkey set + name map; supplier is catalog-order
    even at 100 TB so its nationkey column broadcasts too
    (`suppkey → s_nationkey` lookup attached map-side to lineitem).
    Customer is corpus-order → orders(σ year, read-pushed) acquires
    ``c_nationkey`` through ONE bucketed cogroup on custkey; lineitem
    then joins that narrow (orderkey, c_nationkey) side through the
    second bucketed cogroup on orderkey, filtering s_nationkey ==
    c_nationkey inside the join batch. Revenue partials aggregate
    map-side per nation, so the final groupby carries ≤ nations rows
    per block. Two all-to-all exchanges total, both on narrow int64
    rows; money is int64 cents (module docstring contract).

    Output: (n_name, revenue_cents), revenue descending.
    """
    import ray.data

    from .cogroup import bucket_join

    lo_us = int(np.datetime64(year_lo, "us").astype(np.int64))
    hi_us = int(np.datetime64(year_hi, "us").astype(np.int64))

    nation = pq.read_table(f"{sf_dir}/nation.parquet",
                           columns=["n_nationkey", "n_regionkey", "n_name"])
    reg = pq.read_table(f"{sf_dir}/region.parquet",
                        columns=["r_regionkey", "r_name"])
    reg = reg.filter(pc.equal(reg["r_name"], region))
    nr = nation.join(reg, keys=["n_regionkey"], right_keys=["r_regionkey"],
                     join_type="inner")  # pa.Table.join defaults to LEFT OUTER
    nkeys = pc.cast(nr["n_nationkey"], pa.int64()).combine_chunks()
    name_map = pa.table({
        "c_nationkey": nkeys,
        "n_name": nr["n_name"].combine_chunks(),
    })

    supp = pq.read_table(f"{sf_dir}/supplier.parquet",
                         columns=["s_suppkey", "s_nationkey"])
    supp = pa.table({
        "l_suppkey": pc.cast(supp["s_suppkey"], pa.int64()),
        "s_nationkey": pc.cast(supp["s_nationkey"], pa.int64()),
    })

    nkey_np = np.sort(nkeys.to_numpy(zero_copy_only=False))

    def cust_proj(batch: pa.Table) -> pa.Table:
        nk = pc.cast(batch["c_nationkey"], pa.int64()).combine_chunks()
        t = pa.table({"o_custkey": batch["c_custkey"], "c_nationkey": nk})
        keep = np.isin(nk.to_numpy(zero_copy_only=False), nkey_np)
        return t.filter(pa.array(keep))

    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    ).map_batches(cust_proj, batch_format="pyarrow", zero_copy_batch=True)

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey",
                                             "o_orderdate"],
        filter=((pc.field("o_orderdate") >= pa.scalar(lo_us, pa.timestamp("us")))
                & (pc.field("o_orderdate") < pa.scalar(hi_us, pa.timestamp("us")))),
    ).map_batches(
        lambda b: b.select(["o_orderkey", "o_custkey"]),
        batch_format="pyarrow", zero_copy_batch=True,
    )

    # exchange 1: orders acquire the customer's nation (inner join drops
    # out-of-region customers — cust_proj already filtered them)
    o_nat = bucket_join(
        orders, cust, key="o_custkey",
        left_schema=pa.schema([("o_custkey", pa.int64()),
                               ("o_orderkey", pa.int64())]),
        right_schema=pa.schema([("o_custkey", pa.int64()),
                                ("c_nationkey", pa.int64())]),
    ).map_batches(
        lambda b: b.select(["o_orderkey", "c_nationkey"]),
        batch_format="pyarrow", zero_copy_batch=True,
    )

    from .joins import broadcast_lookup

    def line_proj(batch: pa.Table) -> pa.Table:
        return pa.table({
            "o_orderkey": batch["l_orderkey"],
            "l_suppkey": pc.cast(batch["l_suppkey"], pa.int64()),
            "rev_cents": _cents(pc.multiply(
                pc.cast(batch["l_extendedprice"], pa.float64()),
                pc.subtract(pa.scalar(1.0),
                            pc.cast(batch["l_discount"], pa.float64())))),
        })

    line = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
    ).map_batches(line_proj, batch_format="pyarrow", zero_copy_batch=True)
    line = broadcast_lookup(line, supp, key="l_suppkey").map_batches(
        lambda b: b.select(["o_orderkey", "s_nationkey", "rev_cents"]),
        batch_format="pyarrow", zero_copy_batch=True,
    )

    # exchange 2: lineitem ⋈ (orderkey → c_nationkey); the same-nation
    # predicate + per-nation partial fold happen inside the join batch
    joined = bucket_join(
        line, o_nat, key="o_orderkey",
        left_schema=pa.schema([("o_orderkey", pa.int64()),
                               ("s_nationkey", pa.int64()),
                               ("rev_cents", pa.int64())]),
        right_schema=pa.schema([("o_orderkey", pa.int64()),
                                ("c_nationkey", pa.int64())]),
    )

    def partial(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.equal(batch["s_nationkey"], batch["c_nationkey"]))
        g = (pa.table({"c_nationkey": t["c_nationkey"],
                       "rev_cents": t["rev_cents"]})
             .group_by("c_nationkey").aggregate([("rev_cents", "sum")]))
        return g.rename_columns(["c_nationkey", "rev_local"])

    agg = (joined.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True)
           .groupby("c_nationkey").sum("rev_local"))
    named = broadcast_lookup(
        agg.map_batches(
            lambda b: b.rename_columns(["c_nationkey", "revenue_cents"]),
            batch_format="pyarrow"),
        name_map, key="c_nationkey")
    return named.map_batches(
        lambda b: b.select(["n_name", "revenue_cents"]),
        batch_format="pyarrow",
    ).sort([("revenue_cents"), ("n_name")], descending=[True, False])


def returned_items_topk(sf_dir: str, *, date_lo: str = "1996-01-01",
                        date_hi: str = "1996-04-01", k: int = 20):
    """TPC-H Q10-shaped returned-item report: the ``k`` customers who
    lost the most revenue to returns (``l_returnflag = 'R'``) on orders
    placed in ``[date_lo, date_hi)``.

    Scale shape: both predicates are read-pushed; returned-lineitem
    revenue pre-aggregates per orderkey map-side; ONE bucketed cogroup
    (``left_agg_sum`` fusion — the reduce rides the join's shuffle)
    attaches o_custkey; per-custkey partials fold map-side before the
    small groupby; customer name/nation attach via broadcast lookup to
    the ≤ k·blocks survivors only AFTER top-k. Money is int64 cents.

    Output: (c_custkey, c_name, n_name, revenue_cents), revenue
    descending, ties by custkey.
    """
    import ray.data

    from .cogroup import bucket_join
    from .joins import broadcast_lookup

    lo_us = int(np.datetime64(date_lo, "us").astype(np.int64))
    hi_us = int(np.datetime64(date_hi, "us").astype(np.int64))

    def rev_partial(batch: pa.Table) -> pa.Table:
        t = pa.table({
            "o_orderkey": batch["l_orderkey"],
            "revenue_cents": _cents(pc.multiply(
                pc.cast(batch["l_extendedprice"], pa.float64()),
                pc.subtract(pa.scalar(1.0),
                            pc.cast(batch["l_discount"], pa.float64())))),
        })
        return (t.group_by("o_orderkey").aggregate([("revenue_cents", "sum")])
                .rename_columns(["o_orderkey", "revenue_cents"]))

    rev = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount",
                 "l_returnflag"],
        filter=(pc.field("l_returnflag") == "R"),
    ).map_batches(rev_partial, batch_format="pyarrow", zero_copy_batch=True)

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey",
                                             "o_orderdate"],
        filter=((pc.field("o_orderdate") >= pa.scalar(lo_us, pa.timestamp("us")))
                & (pc.field("o_orderdate") < pa.scalar(hi_us, pa.timestamp("us")))),
    ).map_batches(
        lambda b: b.select(["o_orderkey", "o_custkey"]),
        batch_format="pyarrow", zero_copy_batch=True,
    )

    joined = bucket_join(
        rev, orders, key="o_orderkey",
        left_agg_sum=["revenue_cents"],
        left_schema=pa.schema([("o_orderkey", pa.int64()),
                               ("revenue_cents", pa.int64())]),
        right_schema=pa.schema([("o_orderkey", pa.int64()),
                                ("o_custkey", pa.int64())]),
    )

    def cust_partial(batch: pa.Table) -> pa.Table:
        g = (pa.table({"c_custkey": batch["o_custkey"],
                       "revenue_cents": batch["revenue_cents"]})
             .group_by("c_custkey").aggregate([("revenue_cents", "sum")]))
        return g.rename_columns(["c_custkey", "rev_local"])

    agg = (joined.map_batches(cust_partial, batch_format="pyarrow",
                              zero_copy_batch=True)
           .groupby("c_custkey").sum("rev_local")
           .map_batches(
               lambda b: b.rename_columns(["c_custkey", "rev_local"]),
               batch_format="pyarrow"))

    def topk(batch: pa.Table) -> pa.Table:
        order = pc.sort_indices(batch, sort_keys=[
            ("rev_local", "descending"), ("c_custkey", "ascending")])
        return batch.take(order.slice(0, k))

    top = (agg.map_batches(topk, batch_format="pyarrow")
           .repartition(1).map_batches(topk, batch_format="pyarrow")
           .map_batches(
               lambda b: b.rename_columns(["c_custkey", "revenue_cents"]),
               batch_format="pyarrow"))

    # survivors are ≤ k rows — pull their keys to the driver and push
    # them INTO the customer read (row-group + page pruning), so the
    # corpus-order customer table is never scanned whole for k names
    top = top.materialize()
    keys = [r["c_custkey"] for r in top.take_all()]
    cust = pq.read_table(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_name", "c_nationkey"],
        filters=pc.field("c_custkey").isin(keys),
    )
    nation = pq.read_table(f"{sf_dir}/nation.parquet",
                           columns=["n_nationkey", "n_name"])
    dim = cust.join(nation, keys=["c_nationkey"],
                    right_keys=["n_nationkey"]).select(
        ["c_custkey", "c_name", "n_name"])
    named = broadcast_lookup(top, dim, key="c_custkey")
    return named.map_batches(
        lambda b: b.select(["c_custkey", "c_name", "n_name", "revenue_cents"]),
        batch_format="pyarrow",
    ).sort([("revenue_cents"), ("c_custkey")], descending=[True, False])


def nation_trade_volume(sf_dir: str, *, nation_a: str = "NATION_1",
                        nation_b: str = "NATION_2"):
    """TPC-H Q7-shaped cross-nation trade volume: revenue shipped
    between two nations (supplier in one, customer in the other, both
    directions) grouped by (supplier nation, customer nation, ship
    year).

    Scale shape: the two nationkeys resolve driver-side; supplier's
    nationkey broadcasts onto lineitem (catalog-order); lineitem rows
    not supplied from either nation are dropped BEFORE the exchange;
    the customer nation arrives through orders via one bucketed
    cogroup on custkey and meets lineitem in a second cogroup on
    orderkey, where the direction predicate and per-(pair, year)
    partials fold map-side. Output: (supp_nation, cust_nation, l_year,
    revenue_cents).
    """
    import ray.data

    from .cogroup import bucket_join
    from .joins import broadcast_lookup

    nation = pq.read_table(f"{sf_dir}/nation.parquet",
                           columns=["n_nationkey", "n_name"])
    sel = nation.filter(pc.is_in(nation["n_name"],
                                 value_set=pa.array([nation_a, nation_b])))
    keymap = dict(zip(pc.cast(sel["n_nationkey"], pa.int64()).to_pylist(),
                      sel["n_name"].to_pylist()))
    keys_np = np.sort(np.array(list(keymap), np.int64))

    supp = pq.read_table(f"{sf_dir}/supplier.parquet",
                         columns=["s_suppkey", "s_nationkey"])
    supp = pa.table({
        "l_suppkey": pc.cast(supp["s_suppkey"], pa.int64()),
        "s_nationkey": pc.cast(supp["s_nationkey"], pa.int64()),
    })

    def cust_proj(batch: pa.Table) -> pa.Table:
        nk = pc.cast(batch["c_nationkey"], pa.int64()).combine_chunks()
        keep = np.isin(nk.to_numpy(zero_copy_only=False), keys_np)
        return pa.table({"o_custkey": batch["c_custkey"],
                         "c_nationkey": nk}).filter(pa.array(keep))

    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    ).map_batches(cust_proj, batch_format="pyarrow", zero_copy_batch=True)

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"])
    o_nat = bucket_join(
        orders, cust, key="o_custkey",
        left_schema=pa.schema([("o_orderkey", pa.int64()),
                               ("o_custkey", pa.int64())]),
        right_schema=pa.schema([("o_custkey", pa.int64()),
                                ("c_nationkey", pa.int64())]),
    ).map_batches(
        lambda b: b.select(["o_orderkey", "c_nationkey"]),
        batch_format="pyarrow", zero_copy_batch=True,
    )

    def line_proj(batch: pa.Table) -> pa.Table:
        year = pc.year(batch["l_shipdate"])
        return pa.table({
            "o_orderkey": batch["l_orderkey"],
            "l_suppkey": pc.cast(batch["l_suppkey"], pa.int64()),
            "l_year": pc.cast(year, pa.int64()),
            "rev_cents": _cents(pc.multiply(
                pc.cast(batch["l_extendedprice"], pa.float64()),
                pc.subtract(pa.scalar(1.0),
                            pc.cast(batch["l_discount"], pa.float64())))),
        })

    line = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount",
                 "l_shipdate"],
    ).map_batches(line_proj, batch_format="pyarrow", zero_copy_batch=True)
    line = broadcast_lookup(line, supp, key="l_suppkey")

    def supp_filter(batch: pa.Table) -> pa.Table:
        keep = np.isin(batch["s_nationkey"].combine_chunks()
                       .to_numpy(zero_copy_only=False), keys_np)
        return batch.filter(pa.array(keep)).select(
            ["o_orderkey", "s_nationkey", "l_year", "rev_cents"])

    line = line.map_batches(supp_filter, batch_format="pyarrow",
                            zero_copy_batch=True)

    joined = bucket_join(
        line, o_nat, key="o_orderkey",
        left_schema=pa.schema([("o_orderkey", pa.int64()),
                               ("s_nationkey", pa.int64()),
                               ("l_year", pa.int64()),
                               ("rev_cents", pa.int64())]),
        right_schema=pa.schema([("o_orderkey", pa.int64()),
                                ("c_nationkey", pa.int64())]),
    )

    def partial(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.not_equal(batch["s_nationkey"],
                                      batch["c_nationkey"]))
        g = (pa.table({"s_nationkey": t["s_nationkey"],
                       "c_nationkey": t["c_nationkey"],
                       "l_year": t["l_year"],
                       "rev_cents": t["rev_cents"]})
             .group_by(["s_nationkey", "c_nationkey", "l_year"])
             .aggregate([("rev_cents", "sum")]))
        return g.rename_columns(
            ["s_nationkey", "c_nationkey", "l_year", "rev_local"])

    # the key space is 2 directions × years — combine to one partition
    agg = (joined.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True)
           .groupby(["s_nationkey", "c_nationkey", "l_year"])
           .sum("rev_local"))

    def finish(batch: pa.Table) -> pa.Table:
        sn = [keymap[v] for v in batch["s_nationkey"].to_pylist()]
        cn = [keymap[v] for v in batch["c_nationkey"].to_pylist()]
        return pa.table({
            "supp_nation": pa.array(sn, pa.string()),
            "cust_nation": pa.array(cn, pa.string()),
            "l_year": batch["l_year"],
            "revenue_cents": batch.column(3),
        })

    return agg.map_batches(finish, batch_format="pyarrow").sort(
        ["supp_nation", "cust_nation", "l_year"])


def late_shipment_priority_counts(sf_dir: str, *,
                                  date_lo: str = "1996-01-01",
                                  date_hi: str = "1996-04-01",
                                  grace_days: int = 60):
    """TPC-H Q4-shaped priority report: orders placed in ``[date_lo,
    date_hi)`` with at least one lineitem shipped ≥ ``grace_days``
    after the order date, counted per order priority.

    The EXISTS collapses to ``MAX(l_shipdate) ≥ o_orderdate + grace``:
    per-orderkey max folds map-side (one int64 per orderkey per
    block), a native groupby-max reduces it, and ONE bucketed cogroup
    meets the read-pushed orders window; the 5-row priority count
    aggregates from map-side partials. Output: (o_orderpriority,
    n_orders).
    """
    import ray.data

    from .cogroup import bucket_join

    lo_us = int(np.datetime64(date_lo, "us").astype(np.int64))
    hi_us = int(np.datetime64(date_hi, "us").astype(np.int64))
    grace_us = grace_days * 86_400_000_000

    def ship_partial(batch: pa.Table) -> pa.Table:
        t = pa.table({
            "o_orderkey": batch["l_orderkey"],
            "ship_us": pc.cast(batch["l_shipdate"], pa.int64()),
        })
        g = t.group_by("o_orderkey").aggregate([("ship_us", "max")])
        return g.rename_columns(["o_orderkey", "max_ship_us"])

    maxship = (ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_shipdate"])
        .map_batches(ship_partial, batch_format="pyarrow",
                     zero_copy_batch=True)
        .groupby("o_orderkey").max("max_ship_us")
        .map_batches(lambda b: b.rename_columns(["o_orderkey", "max_ship_us"]),
                     batch_format="pyarrow"))

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderdate", "o_orderpriority"],
        filter=((pc.field("o_orderdate") >= pa.scalar(lo_us, pa.timestamp("us")))
                & (pc.field("o_orderdate") < pa.scalar(hi_us, pa.timestamp("us")))),
    ).map_batches(
        lambda b: pa.table({
            "o_orderkey": b["o_orderkey"],
            "odate_us": pc.cast(b["o_orderdate"], pa.int64()),
            "o_orderpriority": b["o_orderpriority"],
        }),
        batch_format="pyarrow", zero_copy_batch=True,
    )

    joined = bucket_join(
        maxship, orders, key="o_orderkey",
        left_schema=pa.schema([("o_orderkey", pa.int64()),
                               ("max_ship_us", pa.int64())]),
        right_schema=pa.schema([("o_orderkey", pa.int64()),
                                ("odate_us", pa.int64()),
                                ("o_orderpriority", pa.string())]),
    )

    def late_partial(batch: pa.Table) -> pa.Table:
        keep = pc.greater_equal(
            batch["max_ship_us"],
            pc.add(batch["odate_us"], pa.scalar(grace_us, pa.int64())))
        t = batch.filter(keep)
        g = (pa.table({"o_orderpriority": t["o_orderpriority"],
                       "one": pa.nulls(t.num_rows, pa.int64()).fill_null(1)})
             .group_by("o_orderpriority").aggregate([("one", "sum")]))
        return g.rename_columns(["o_orderpriority", "n_local"])

    agg = (joined.map_batches(late_partial, batch_format="pyarrow",
                              zero_copy_batch=True)
           .groupby("o_orderpriority").sum("n_local"))
    return agg.map_batches(
        lambda b: b.rename_columns(["o_orderpriority", "n_orders"]),
        batch_format="pyarrow").sort("o_orderpriority")


def brand_disjunctive_revenue(sf_dir: str):
    """TPC-H Q19-shaped disjunctive-predicate revenue: per-brand
    revenue under two (brand, size-range, quantity-range) arms —

        (Brand#1,  size 1–15,  qty 1–20)  ∪  (Brand#2, size 16–30, qty 10–30)

    Part attributes broadcast (catalog-order) onto lineitem; the
    disjunction evaluates vectorized per batch; per-brand partials
    fold map-side; the final groupby carries ≤ 2 rows per block.
    Output: (p_brand, revenue_cents).
    """
    import ray.data

    from .joins import broadcast_lookup

    part = pq.read_table(f"{sf_dir}/part.parquet",
                         columns=["p_partkey", "p_brand", "p_size"])
    part = pa.table({
        "l_partkey": pc.cast(part["p_partkey"], pa.int64()),
        "p_brand": part["p_brand"],
        "p_size": pc.cast(part["p_size"], pa.int64()),
    })

    def line_proj(batch: pa.Table) -> pa.Table:
        return pa.table({
            "l_partkey": pc.cast(batch["l_partkey"], pa.int64()),
            "l_quantity": pc.cast(batch["l_quantity"], pa.float64()),
            "rev_cents": _cents(pc.multiply(
                pc.cast(batch["l_extendedprice"], pa.float64()),
                pc.subtract(pa.scalar(1.0),
                            pc.cast(batch["l_discount"], pa.float64())))),
        })

    line = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_quantity", "l_extendedprice", "l_discount"],
    ).map_batches(line_proj, batch_format="pyarrow", zero_copy_batch=True)
    line = broadcast_lookup(line, part, key="l_partkey")

    def arm(batch, brand, s_lo, s_hi, q_lo, q_hi):
        return pc.and_(
            pc.and_(pc.equal(batch["p_brand"], brand),
                    pc.and_(pc.greater_equal(batch["p_size"], s_lo),
                            pc.less_equal(batch["p_size"], s_hi))),
            pc.and_(pc.greater_equal(batch["l_quantity"], float(q_lo)),
                    pc.less_equal(batch["l_quantity"], float(q_hi))))

    def partial(batch: pa.Table) -> pa.Table:
        keep = pc.or_(arm(batch, "Brand#1", 1, 15, 1, 20),
                      arm(batch, "Brand#2", 16, 30, 10, 30))
        t = batch.filter(keep)
        g = (pa.table({"p_brand": t["p_brand"], "rev_cents": t["rev_cents"]})
             .group_by("p_brand").aggregate([("rev_cents", "sum")]))
        return g.rename_columns(["p_brand", "rev_local"])

    agg = (line.map_batches(partial, batch_format="pyarrow",
                            zero_copy_batch=True)
           .groupby("p_brand").sum("rev_local"))
    return agg.map_batches(
        lambda b: b.rename_columns(["p_brand", "revenue_cents"]),
        batch_format="pyarrow").sort("p_brand")


def idle_customer_balance(sf_dir: str, *, since: str = "2000-01-01"):
    """TPC-H Q22-shaped "dormant-capital opportunity": customers with
    an account balance above the average POSITIVE balance and NO order
    since ``since``, counted and summed per market segment.

    The global (n, sum) over positive balances reduces to TWO scalars
    (exact int64 cents) — the above-average predicate is the
    cross-multiplied integer compare ``bal·n > sum`` (no float
    division); dormancy is an anti-join on custkey against the
    read-pushed, per-block-distinct recent-order custkeys. Output:
    (c_mktsegment, n_custs, sum_acctbal_cents).
    """
    import ray.data

    from .joins import anti_join

    since_us = int(np.datetime64(since, "us").astype(np.int64))

    def bal_proj(batch: pa.Table) -> pa.Table:
        return pa.table({
            "c_custkey": batch["c_custkey"],
            "c_mktsegment": batch["c_mktsegment"],
            "bal_cents": _cents(batch["c_acctbal"]),
        })

    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_mktsegment", "c_acctbal"],
    ).map_batches(bal_proj, batch_format="pyarrow", zero_copy_batch=True)
    cust = cust.materialize()  # feeds the scalar pass AND the filter pass

    def pos_partial(batch: pa.Table) -> pa.Table:
        b = batch["bal_cents"].combine_chunks().to_numpy(zero_copy_only=False)
        pos = b[b > 0]
        return pa.table({"n": pa.array([len(pos)], pa.int64()),
                         "s": pa.array([int(pos.sum())], pa.int64())})

    stats = (cust.map_batches(pos_partial, batch_format="pyarrow",
                              zero_copy_batch=True)
             .sum(["n", "s"]))
    n_pos, sum_pos = int(stats["sum(n)"]), int(stats["sum(s)"])

    def above(batch: pa.Table) -> pa.Table:
        keep = pc.greater(pc.multiply(batch["bal_cents"],
                                      pa.scalar(n_pos, pa.int64())),
                          pa.scalar(sum_pos, pa.int64()))
        return batch.filter(keep)

    rich = cust.map_batches(above, batch_format="pyarrow",
                            zero_copy_batch=True)

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_orderdate"],
        filter=(pc.field("o_orderdate")
                >= pa.scalar(since_us, pa.timestamp("us"))),
    ).map_batches(
        lambda b: pa.table({"c_custkey": pc.unique(
            b["o_custkey"].combine_chunks())}),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    idle = anti_join(rich, orders, "c_custkey")

    def partial(batch: pa.Table) -> pa.Table:
        g = (pa.table({"c_mktsegment": batch["c_mktsegment"],
                       "one": pa.nulls(batch.num_rows, pa.int64()).fill_null(1),
                       "bal_cents": batch["bal_cents"]})
             .group_by("c_mktsegment")
             .aggregate([("one", "sum"), ("bal_cents", "sum")]))
        return g.rename_columns(["c_mktsegment", "n_local", "s_local"])

    agg = (idle.map_batches(partial, batch_format="pyarrow",
                            zero_copy_batch=True)
           .groupby("c_mktsegment").sum(["n_local", "s_local"]))
    return agg.map_batches(
        lambda b: b.rename_columns(
            ["c_mktsegment", "n_custs", "sum_acctbal_cents"]),
        batch_format="pyarrow").sort("c_mktsegment")


def cust_order_histogram(sf_dir: str, *, excl_priority: str = "1-URGENT"):
    """TPC-H Q13-shaped customer-distribution report: how many
    customers placed exactly c qualifying orders (orders with priority
    ``excl_priority`` excluded — the comment-LIKE analogue), INCLUDING
    the zero-order customers of the classic left join.

    Scale shape: per-custkey counts fold map-side (one int64 row per
    custkey per block) and reduce in one native groupby-sum; the
    second-level distribution (count of counts) folds the already
    tiny (custkey, c_count) table the same way. The zero bucket never
    joins anything: it is ``n_customers − n_customers_with_orders``,
    two scalars (customer row count from parquet metadata — catalog
    order; the distribution's own mass). Output: (c_count, custdist).
    """
    import ray.data

    n_cust = pq.ParquetFile(f"{sf_dir}/customer.parquet").metadata.num_rows

    def order_partial(batch: pa.Table) -> pa.Table:
        keep = pc.invert(pc.equal(batch["o_orderpriority"], excl_priority))
        t = pa.table({"c_custkey": batch.filter(keep)["o_custkey"]})
        g = t.group_by("c_custkey").aggregate([([], "count_all")])
        return g.rename_columns(["c_custkey", "n_local"])

    counts = (ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_orderpriority"])
        .map_batches(order_partial, batch_format="pyarrow",
                     zero_copy_batch=True)
        .groupby("c_custkey").sum("n_local"))

    def dist_partial(batch: pa.Table) -> pa.Table:
        t = pa.table({"c_count": batch["sum(n_local)"]})
        g = t.group_by("c_count").aggregate([([], "count_all")])
        return g.rename_columns(["c_count", "d_local"])

    dist = (counts.map_batches(dist_partial, batch_format="pyarrow",
                               zero_copy_batch=True)
            .groupby("c_count").sum("d_local"))
    # tiny: at most (max orders per customer) rows — collect, add the
    # zero-order bucket, hand back an in-memory Dataset
    tbl = pa.concat_tables(
        [b for b in dist.iter_batches(batch_format="pyarrow")]
        or [pa.table({"c_count": pa.array([], pa.int64()),
                      "sum(d_local)": pa.array([], pa.int64())})]
    ).rename_columns(["c_count", "custdist"])
    n_with = int(pc.sum(tbl["custdist"]).as_py() or 0)
    if n_cust - n_with > 0:
        tbl = pa.concat_tables([tbl, pa.table({
            "c_count": pa.array([0], pa.int64()),
            "custdist": pa.array([n_cust - n_with], pa.int64())})])
    out = tbl.sort_by([("custdist", "descending"), ("c_count", "descending")])
    return ray.data.from_arrow(out)


def top_supplier_revenue(sf_dir: str, *, date_lo: str = "1996-01-01",
                         date_hi: str = "1996-04-01"):
    """TPC-H Q15-shaped top supplier: the supplier(s) whose shipped
    revenue over ``[date_lo, date_hi)`` equals the global maximum
    (ties all emitted, as the Q15 view semantics demand).

    Revenue is exact int64 "cents×100": cents(extendedprice) ×
    (100 − round(discount·100)) per row, order-free sums. Scale shape:
    read-pushed shipdate window, map-side per-suppkey partials, one
    native groupby-sum to a supplier-order table; the arg-max is a
    scalar ``.max()`` over that reduced table plus one vectorized
    filter — no sort, no driver loop. The name attaches via broadcast
    lookup. Output: (s_suppkey, s_name, revenue_c4).
    """
    import ray.data

    from .joins import broadcast_lookup

    lo_us = int(np.datetime64(date_lo, "us").astype(np.int64))
    hi_us = int(np.datetime64(date_hi, "us").astype(np.int64))

    def rev_partial(batch: pa.Table) -> pa.Table:
        disc = pc.cast(pc.round(pc.multiply(pc.cast(batch["l_discount"],
                                                    pa.float64()), 100.0),
                                round_mode="half_towards_infinity"),
                       pa.int64())
        rev = pc.multiply(_cents(batch["l_extendedprice"]),
                          pc.subtract(pa.scalar(100, pa.int64()), disc))
        t = pa.table({"s_suppkey": batch["l_suppkey"], "rev": rev})
        g = t.group_by("s_suppkey").aggregate([("rev", "sum")])
        return g.rename_columns(["s_suppkey", "rev_local"])

    rev = (ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_suppkey", "l_extendedprice", "l_discount", "l_shipdate"],
        filter=((pc.field("l_shipdate")
                 >= pa.scalar(lo_us, pa.timestamp("us")))
                & (pc.field("l_shipdate")
                   < pa.scalar(hi_us, pa.timestamp("us")))))
        .map_batches(rev_partial, batch_format="pyarrow",
                     zero_copy_batch=True)
        .groupby("s_suppkey").sum("rev_local")
        .map_batches(lambda b: b.rename_columns(["s_suppkey", "revenue_c4"]),
                     batch_format="pyarrow"))
    rev = rev.materialize()  # supplier-order; feeds max AND filter
    best = rev.max("revenue_c4")
    top = rev.map_batches(
        lambda b: b.filter(pc.equal(b["revenue_c4"],
                                    pa.scalar(best, pa.int64()))),
        batch_format="pyarrow", zero_copy_batch=True)
    names = pq.read_table(f"{sf_dir}/supplier.parquet",
                          columns=["s_suppkey", "s_name"])
    return broadcast_lookup(top, names, key="s_suppkey").map_batches(
        lambda b: b.select(["s_suppkey", "s_name", "revenue_c4"]),
        batch_format="pyarrow")


def small_qty_avg_revenue(sf_dir: str, *, brand: str = "Brand#1",
                          max_size: int = 10):
    """TPC-H Q17-shaped small-quantity revenue: total extended price of
    lineitems for ``brand`` parts of size ≤ ``max_size`` whose quantity
    is below 20% of that part's average lineitem quantity.

    The correlated AVG subquery is exact-integer: with quantities
    scaled ×100 (q_units), ``q < 0.2·avg`` ⇔ ``5·q_units·n <
    sum_q_units`` — no float division anywhere. Scale shape: the
    qualifying partkey set resolves from the catalog-order part table
    and broadcasts into the lineitem read (map-side isin — brand rows
    only ever leave the scan); the filtered narrow projection is
    materialized ONCE and feeds both the per-part (sum, n) reduce and
    the final predicate pass; per-part stats are catalog-order and
    come back via broadcast lookup, not a shuffle join. Output: one
    row (revenue_cents, n_items).
    """
    import ray.data

    from .joins import broadcast_lookup

    part = pq.read_table(f"{sf_dir}/part.parquet",
                         columns=["p_partkey", "p_brand", "p_size"])
    keep = pc.and_(pc.equal(part["p_brand"], brand),
                   pc.less_equal(part["p_size"], max_size))
    pkeys = np.sort(pc.cast(part.filter(keep)["p_partkey"], pa.int64())
                    .to_numpy(zero_copy_only=False))

    def line_proj(batch: pa.Table) -> pa.Table:
        pk = pc.cast(batch["l_partkey"], pa.int64()).combine_chunks()
        m = np.isin(pk.to_numpy(zero_copy_only=False), pkeys)
        t = pa.table({
            "l_partkey": pk,
            "q_units": _cents(batch["l_quantity"]),
            "ep_cents": _cents(batch["l_extendedprice"]),
        }).filter(pa.array(m))
        return t

    lines = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_quantity", "l_extendedprice"],
    ).map_batches(line_proj, batch_format="pyarrow", zero_copy_batch=True)
    lines = lines.materialize()  # brand-restricted narrow rows, used twice

    def stat_partial(batch: pa.Table) -> pa.Table:
        t = pa.table({"l_partkey": batch["l_partkey"],
                      "sum_q": batch["q_units"],
                      "n": pa.nulls(batch.num_rows, pa.int64()).fill_null(1)})
        g = t.group_by("l_partkey").aggregate([("sum_q", "sum"), ("n", "sum")])
        return g.rename_columns(["l_partkey", "sum_q", "n"])

    stats = (lines.map_batches(stat_partial, batch_format="pyarrow",
                               zero_copy_batch=True)
             .groupby("l_partkey").sum(["sum_q", "n"])
             .map_batches(lambda b: b.rename_columns(
                 ["l_partkey", "sum_q", "n"]), batch_format="pyarrow"))
    stats_tbl = pa.concat_tables(
        [b for b in stats.iter_batches(batch_format="pyarrow")]
        or [pa.table({"l_partkey": pa.array([], pa.int64()),
                      "sum_q": pa.array([], pa.int64()),
                      "n": pa.array([], pa.int64())})])

    with_stats = broadcast_lookup(lines, stats_tbl, key="l_partkey")

    def small_partial(batch: pa.Table) -> pa.Table:
        q = batch["q_units"].combine_chunks().to_numpy(zero_copy_only=False)
        n = batch["n"].combine_chunks().to_numpy(zero_copy_only=False)
        s = batch["sum_q"].combine_chunks().to_numpy(zero_copy_only=False)
        m = 5 * q * n < s
        ep = batch["ep_cents"].combine_chunks().to_numpy(
            zero_copy_only=False)[m]
        return pa.table({"revenue_cents": pa.array([int(ep.sum())], pa.int64()),
                         "n_items": pa.array([int(m.sum())], pa.int64())})

    tot = (with_stats.map_batches(small_partial, batch_format="pyarrow",
                                  zero_copy_batch=True)
           .sum(["revenue_cents", "n_items"]))
    import ray.data as rd
    return rd.from_arrow(pa.table({
        "revenue_cents": pa.array([int(tot["sum(revenue_cents)"] or 0)],
                                  pa.int64()),
        "n_items": pa.array([int(tot["sum(n_items)"] or 0)], pa.int64()),
    }))


def forecast_revenue_change(sf_dir: str, *, year_lo: str = "1995-01-01",
                            year_hi: str = "1996-01-01",
                            disc_lo: float = 0.05, disc_hi: float = 0.07,
                            qty_lt: float = 24.0):
    """TPC-H Q6-shaped forecasting-revenue-change: total
    discount·price over one ship year within a discount band and a
    quantity cap — the canonical read-pushed filter + constant-size
    partial reduce. Every predicate is pushed to the parquet read (only
    matching row groups leave storage, four columns); each batch folds
    to ONE cents partial. Output: one row (revenue_cents)."""
    import ray.data

    lo = np.datetime64(year_lo, "us").astype(np.int64)
    hi = np.datetime64(year_hi, "us").astype(np.int64)
    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_extendedprice", "l_discount", "l_quantity",
                 "l_shipdate"],
        filter=(
            (pc.field("l_shipdate") >= pa.scalar(int(lo), pa.timestamp("us")))
            & (pc.field("l_shipdate") < pa.scalar(int(hi), pa.timestamp("us")))
            & (pc.field("l_discount") >= disc_lo)
            & (pc.field("l_discount") <= disc_hi)
            & (pc.field("l_quantity") < qty_lt)
        ),
    )

    def partial(batch: pa.Table) -> pa.Table:
        ep = batch["l_extendedprice"].combine_chunks().to_numpy(
            zero_copy_only=False)
        disc = batch["l_discount"].combine_chunks().to_numpy(
            zero_copy_only=False)
        rc = pc.cast(
            pc.round(pa.array(ep * disc * 100.0, pa.float64()),
                     round_mode="half_towards_infinity"),
            pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table({
            "k": pa.array([0], pa.int64()),
            "revenue_cents": pa.array([int(rc.sum())], pa.int64()),
        })

    agg = (ds.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby("k").sum("revenue_cents"))
    return agg.map_batches(
        lambda b: b.rename_columns(["k", "revenue_cents"])
        .select(["revenue_cents"]),
        batch_format="pyarrow")


def nation_market_share(sf_dir: str, *, region: str = "AMERICA",
                        nation: str = "NATION_1", p_type: str = "PROMO"):
    """TPC-H Q8-shaped market share: among orders placed by customers
    of one region for parts of one type, the per-order-year revenue
    fraction supplied by one nation.

    Scale shape: the part-type key set and the supplier→nationkey map
    broadcast (catalog-order); lineitem drops non-type rows map-side
    BEFORE any exchange; region membership reaches orders through one
    custkey cogroup (Q7 pattern) and meets lineitem in a second
    orderkey cogroup where per-year (total, nation) cent partials fold
    map-side — the final shuffle is a ≤ #years-row groupby. The share
    is ONE identically-rounded float division of two exact int64 cent
    sums, so the output is DuckDB-value-exact.

    Output: (o_year, total_cents, nation_cents, mkt_share) sorted by
    year.
    """
    import ray.data

    from .cogroup import bucket_join
    from .joins import broadcast_lookup

    nat = pq.read_table(f"{sf_dir}/nation.parquet")
    reg = pq.read_table(f"{sf_dir}/region.parquet")
    rkey = reg.filter(pc.equal(reg["r_name"], region))["r_regionkey"][0].as_py()
    region_nations = np.sort(pc.cast(
        nat.filter(pc.equal(pc.cast(nat["n_regionkey"], pa.int64()),
                            rkey))["n_nationkey"], pa.int64()
    ).to_numpy(zero_copy_only=False))
    target_key = pc.cast(
        nat.filter(pc.equal(nat["n_name"], nation))["n_nationkey"],
        pa.int64())[0].as_py()

    part = pq.read_table(f"{sf_dir}/part.parquet",
                         columns=["p_partkey", "p_type"])
    type_keys = np.sort(pc.cast(
        part.filter(pc.equal(part["p_type"], p_type))["p_partkey"],
        pa.int64()).to_numpy(zero_copy_only=False))

    supp = pq.read_table(f"{sf_dir}/supplier.parquet",
                         columns=["s_suppkey", "s_nationkey"])
    supp = pa.table({
        "l_suppkey": pc.cast(supp["s_suppkey"], pa.int64()),
        "s_nationkey": pc.cast(supp["s_nationkey"], pa.int64()),
    })

    def cust_proj(batch: pa.Table) -> pa.Table:
        nk = pc.cast(batch["c_nationkey"], pa.int64()).combine_chunks()
        keep = np.isin(nk.to_numpy(zero_copy_only=False), region_nations)
        return pa.table({"o_custkey": batch["c_custkey"]}).filter(
            pa.array(keep))

    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    ).map_batches(cust_proj, batch_format="pyarrow", zero_copy_batch=True)

    def orders_proj(batch: pa.Table) -> pa.Table:
        return pa.table({
            "o_orderkey": batch["o_orderkey"],
            "o_year": pc.cast(pc.year(batch["o_orderdate"]), pa.int64()),
            "o_custkey": pc.cast(batch["o_custkey"], pa.int64()),
        })

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderdate", "o_custkey"],
    ).map_batches(orders_proj, batch_format="pyarrow", zero_copy_batch=True)
    o_scope = bucket_join(
        orders, cust, key="o_custkey",
        left_schema=pa.schema([("o_orderkey", pa.int64()),
                               ("o_year", pa.int64()),
                               ("o_custkey", pa.int64())]),
        right_schema=pa.schema([("o_custkey", pa.int64())]),
        right_distinct=True,
    ).map_batches(lambda b: b.select(["o_orderkey", "o_year"]),
                  batch_format="pyarrow", zero_copy_batch=True)

    def line_proj(batch: pa.Table) -> pa.Table:
        pk = pc.cast(batch["l_partkey"], pa.int64()).combine_chunks()
        keep = np.isin(pk.to_numpy(zero_copy_only=False), type_keys)
        t = batch.filter(pa.array(keep))
        return pa.table({
            "o_orderkey": t["l_orderkey"],
            "l_suppkey": pc.cast(t["l_suppkey"], pa.int64()),
            "rev_cents": _cents(pc.multiply(
                pc.cast(t["l_extendedprice"], pa.float64()),
                pc.subtract(pa.scalar(1.0),
                            pc.cast(t["l_discount"], pa.float64())))),
        })

    line = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_partkey", "l_suppkey",
                 "l_extendedprice", "l_discount"],
    ).map_batches(line_proj, batch_format="pyarrow", zero_copy_batch=True)
    line = broadcast_lookup(line, supp, key="l_suppkey")

    joined = bucket_join(
        line, o_scope, key="o_orderkey",
        left_schema=pa.schema([("o_orderkey", pa.int64()),
                               ("l_suppkey", pa.int64()),
                               ("rev_cents", pa.int64()),
                               ("s_nationkey", pa.int64())]),
        right_schema=pa.schema([("o_orderkey", pa.int64()),
                                ("o_year", pa.int64())]),
    )

    def partial(batch: pa.Table) -> pa.Table:
        is_t = pc.cast(pc.equal(batch["s_nationkey"], target_key),
                       pa.int64())
        t = pa.table({
            "o_year": batch["o_year"],
            "total_local": batch["rev_cents"],
            "nation_local": pc.multiply(batch["rev_cents"], is_t),
        })
        return (t.group_by("o_year")
                .aggregate([("total_local", "sum"), ("nation_local", "sum")])
                .rename_columns(["o_year", "total_local", "nation_local"]))

    agg = (joined.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True)
           .groupby("o_year").sum(["total_local", "nation_local"]))

    def finish(batch: pa.Table) -> pa.Table:
        b = batch.rename_columns(["o_year", "total_cents", "nation_cents"])
        share = pc.round(
            pc.divide(pc.cast(b["nation_cents"], pa.float64()),
                      pc.cast(b["total_cents"], pa.float64())),
            ndigits=6, round_mode="half_towards_infinity")
        return b.append_column("mkt_share", share)

    return agg.map_batches(finish, batch_format="pyarrow").sort("o_year")


def sole_late_supplier_counts(sf_dir: str, *, grace_days: int = 60):
    """TPC-H Q21-shaped waiting-supplier report: on orders with ≥ 2
    distinct suppliers where EXACTLY ONE supplier shipped late
    (l_shipdate ≥ o_orderdate + grace), count such orders per that
    late supplier. (The reference Q21 uses receipt/commit dates the
    synthetic schema lacks; the order-date grace mirrors the Q4
    shape.)

    Scale shape: lineitem ships only (orderkey, suppkey, shipdate);
    orders ship (orderkey, orderdate). ONE orderkey-bucketed cogroup
    evaluates the whole multi-EXISTS predicate vectorized inside each
    bucket (two lexsorts + segment reduceats — per-order Python never
    happens); the verdict stream is one row per qualifying order, and
    a native suppkey groupby-count plus a broadcast name lookup
    finish. Output: (s_name, numwait) sorted by numwait DESC, s_name.
    """
    import ray.data

    from ..kg.unionfind import hash_bucket
    from .joins import broadcast_lookup

    us_day = 86_400_000_000
    grace_us = grace_days * us_day

    def line_proj(batch: pa.Table) -> pa.Table:
        # map-side combiner: late_any per supplier is MAX(shipdate) vs
        # the grace cutoff, and max folds per batch — the exchange
        # carries distinct (order, supplier) pairs, never raw lineitems
        raw = pa.table({
            "okey": pc.cast(batch["l_orderkey"], pa.int64()),
            "skey": pc.cast(batch["l_suppkey"], pa.int64()),
            "ship_us": pc.cast(pc.cast(batch["l_shipdate"],
                                       pa.timestamp("us")), pa.int64()),
        })
        red = (raw.group_by(["okey", "skey"]).aggregate([("ship_us", "max")])
               .rename_columns(["okey", "skey", "ship_us"]))
        t = red.append_column(
            "odate_us", pa.array(np.full(red.num_rows, -1, np.int64)))
        return t.append_column(
            "__bucket", hash_bucket(t["okey"].combine_chunks(), 256))

    def orders_proj(batch: pa.Table) -> pa.Table:
        t = pa.table({
            "okey": pc.cast(batch["o_orderkey"], pa.int64()),
            "skey": pa.array(np.full(batch.num_rows, -1, np.int64)),
            "ship_us": pa.array(np.full(batch.num_rows, -1, np.int64)),
            "odate_us": pc.cast(pc.cast(batch["o_orderdate"],
                                        pa.timestamp("us")), pa.int64()),
        })
        return t.append_column(
            "__bucket", hash_bucket(t["okey"].combine_chunks(), 256))

    line = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_shipdate"],
    ).map_batches(line_proj, batch_format="pyarrow", zero_copy_batch=True)
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderdate"]
    ).map_batches(orders_proj, batch_format="pyarrow", zero_copy_batch=True)

    def sweep(group: pa.Table) -> pa.Table:
        okey = group["okey"].combine_chunks().to_numpy(zero_copy_only=False)
        skey = group["skey"].combine_chunks().to_numpy(zero_copy_only=False)
        ship = group["ship_us"].combine_chunks().to_numpy(zero_copy_only=False)
        odate = group["odate_us"].combine_chunks().to_numpy(zero_copy_only=False)
        is_line = skey >= 0
        # orders first within each okey (odate row), then its lines
        order1 = np.lexsort((is_line.astype(np.int8), okey))
        okey, skey, ship, odate, is_line = (
            okey[order1], skey[order1], ship[order1], odate[order1],
            is_line[order1])
        n = len(okey)
        # forward-fill the order date onto line rows by POSITION (one
        # order row per okey precedes its lines; max-accumulating the
        # date itself would be wrong when a later order is older)
        pos = np.arange(n, dtype=np.int64)
        src = np.maximum.accumulate(np.where(~is_line, pos, np.int64(-1)))
        safe = np.maximum(src, 0)
        filled = odate[safe]
        has_order = (src >= 0) & (okey[safe] == okey)
        late = is_line & has_order & (ship >= filled + grace_us)
        lo, ls, llate = okey[is_line], skey[is_line], late[is_line]
        if len(lo) == 0:
            return pa.table({"s_suppkey": pa.array([], pa.int64())})
        # per (okey, skey): late_any (re-reduce of the map-side max);
        # per okey over supplier segments:
        # n_supp, n_late, the late suppkey
        order2 = np.lexsort((ls, lo))
        lo, ls, llate = lo[order2], ls[order2], llate[order2]
        pair_first = np.ones(len(lo), bool)
        pair_first[1:] = (lo[1:] != lo[:-1]) | (ls[1:] != ls[:-1])
        pstart = np.flatnonzero(pair_first)
        p_okey, p_skey = lo[pstart], ls[pstart]
        p_late = np.maximum.reduceat(llate.astype(np.int64), pstart)
        o_first = np.ones(len(p_okey), bool)
        o_first[1:] = p_okey[1:] != p_okey[:-1]
        ostart = np.flatnonzero(o_first)
        n_supp = np.diff(np.append(ostart, len(p_okey)))
        n_late = np.add.reduceat(p_late, ostart)
        late_sk = np.add.reduceat(p_skey * p_late, ostart)  # valid iff n_late==1
        ok = (n_supp >= 2) & (n_late == 1)
        return pa.table({"s_suppkey": pa.array(late_sk[ok], pa.int64())})

    verdicts = (line.union(orders)
                .groupby("__bucket")
                .map_groups(sweep, batch_format="pyarrow"))
    counts = verdicts.groupby("s_suppkey").count().map_batches(
        lambda b: b.rename_columns(["s_suppkey", "numwait"]),
        batch_format="pyarrow")
    names = pq.read_table(f"{sf_dir}/supplier.parquet",
                          columns=["s_suppkey", "s_name"])
    names = pa.table({"s_suppkey": pc.cast(names["s_suppkey"], pa.int64()),
                      "s_name": names["s_name"]})
    out = broadcast_lookup(counts, names, key="s_suppkey").map_batches(
        lambda b: b.select(["s_name", "numwait"]), batch_format="pyarrow")
    return out.sort(["numwait", "s_name"], descending=[True, False])
