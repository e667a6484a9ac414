"""Windowed / per-group-ordered operators.

The shuffle co-locates a key's rows; the window logic runs vectorized
INSIDE hash buckets of many keys (``groupby(bucket).map_groups``), not
per key — group dispatch stays at ``n_buckets`` no matter how many
users exist, and one lexsort per bucket handles every key in it with
segment-boundary masks (same pattern as ``ops/temporal.asof_join``;
per-key ``map_groups`` costs one Python call per key, pathological at
10^5+ keys). State never crosses keys, so the pattern holds at any
corpus size as long as one BUCKET's rows fit in a worker; a hot key
would be salted upstream.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

N_BUCKETS = 256


def _bucketed(ds, key: str):
    """Append a hash-bucket column for groupby(bucket) dispatch."""
    from ..kg.unionfind import hash_bucket

    def tag(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "__bucket", hash_bucket(batch[key].combine_chunks(), N_BUCKETS)
        )

    return ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)


def sessionize_events(sf_dir: str, gap_minutes: int = 30, *, events_ds=None):
    """events → one row per (user, session): session = maximal run of a
    user's events with inter-event gaps ≤ ``gap_minutes``. Output:
    (user_id, session_no, n_events, sum_value_cents, duration_sec),
    session_no numbered 1.. in time order per user. ``events_ds``
    overrides the parquet read with any Dataset of the same columns."""
    import ray.data

    ds = events_ds if events_ds is not None else ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_id", "ts", "value"]
    )
    gap_us = gap_minutes * 60 * 1_000_000

    def sessions(group: pa.Table) -> pa.Table:
        # one vectorized sweep over every user in the bucket
        order = pc.sort_indices(
            group,
            sort_keys=[
                ("user_id", "ascending"),
                ("ts", "ascending"),
                ("event_id", "ascending"),
            ],
        )
        g = group.take(order)
        from .relational import cents as to_cents

        uid = g["user_id"].combine_chunks().to_numpy(zero_copy_only=False)
        ts = g["ts"].combine_chunks().cast(pa.int64()).to_numpy(zero_copy_only=False)
        cents = to_cents(g["value"].combine_chunks()).to_numpy(zero_copy_only=False)
        n = len(ts)
        new_user = np.ones(n, dtype=bool)
        new_user[1:] = uid[1:] != uid[:-1]
        new_session = new_user.copy()
        new_session[1:] |= (ts[1:] - ts[:-1]) > gap_us
        starts = np.flatnonzero(new_session)
        ends = np.append(starts[1:], n)
        # session_no = 1-based rank of the session within its user
        sess_idx = np.arange(len(starts))
        user_first_sess = np.maximum.accumulate(
            np.where(new_user[starts], sess_idx, 0)
        )
        csum = np.concatenate(([0], np.cumsum(cents)))
        return pa.table(
            {
                "user_id": pa.array(uid[starts], pa.int64()),
                "session_no": pa.array(sess_idx - user_first_sess + 1, pa.int64()),
                "n_events": pa.array(ends - starts, pa.int64()),
                "sum_value_cents": pa.array(csum[ends] - csum[starts], pa.int64()),
                "duration_sec": pa.array(
                    (ts[ends - 1] - ts[starts]) // 1_000_000, pa.int64()
                ),
            }
        )

    return _bucketed(ds, "user_id").groupby("__bucket").map_groups(
        sessions, batch_format="pyarrow"
    )


def session_intervals(sf_dir: str, gap_minutes: int = 30, *, events_ds=None):
    """Per-user session WINDOWS: (user_id, session_no, start_us,
    end_us) with the same gap rule and numbering as
    :func:`sessionize_events` — non-overlapping by construction, the
    interval side of a containment :func:`~kgrecrun.ops.temporal.range_join`."""
    import ray.data

    ds = events_ds if events_ds is not None else ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_id", "ts"]
    )
    gap_us = gap_minutes * 60 * 1_000_000

    def intervals(group: pa.Table) -> pa.Table:
        order = pc.sort_indices(
            group,
            sort_keys=[
                ("user_id", "ascending"),
                ("ts", "ascending"),
                ("event_id", "ascending"),
            ],
        )
        g = group.take(order)
        uid = g["user_id"].combine_chunks().to_numpy(zero_copy_only=False)
        ts = g["ts"].combine_chunks().cast(pa.int64()).to_numpy(zero_copy_only=False)
        n = len(ts)
        new_user = np.ones(n, dtype=bool)
        new_user[1:] = uid[1:] != uid[:-1]
        new_session = new_user.copy()
        new_session[1:] |= (ts[1:] - ts[:-1]) > gap_us
        starts = np.flatnonzero(new_session)
        ends = np.append(starts[1:], n)
        sess_idx = np.arange(len(starts))
        user_first_sess = np.maximum.accumulate(
            np.where(new_user[starts], sess_idx, 0)
        )
        return pa.table(
            {
                "user_id": pa.array(uid[starts], pa.int64()),
                "session_no": pa.array(sess_idx - user_first_sess + 1, pa.int64()),
                "start_us": pa.array(ts[starts], pa.int64()),
                "end_us": pa.array(ts[ends - 1], pa.int64()),
            }
        )

    return _bucketed(ds, "user_id").groupby("__bucket").map_groups(
        intervals, batch_format="pyarrow"
    )


def user_event_windows(sf_dir: str, roll: int = 3, *, events_ds=None):
    """Per-user ordered window functions (lag + rolling sum): for each
    event, the gap in µs since the user's previous event (null for the
    first) and the rolling sum of value-cents over the last ``roll``
    events inclusive. Ordering key is (ts, event_id) — total, so output
    is deterministic. Output: (event_id, user_id, gap_us, roll_cents).

    All-integer math (epoch-µs gaps, cents sums) → bit-exact vs the SQL
    ``lag``/``SUM OVER ROWS BETWEEN`` oracle."""
    import ray.data

    ds = events_ds if events_ds is not None else ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_id", "ts", "value"]
    )

    def windows(group: pa.Table) -> pa.Table:
        # one vectorized sweep over every user in the bucket:
        # segment-boundary masks replace per-user dispatch
        order = pc.sort_indices(
            group,
            sort_keys=[
                ("user_id", "ascending"),
                ("ts", "ascending"),
                ("event_id", "ascending"),
            ],
        )
        g = group.take(order)
        from .relational import cents as to_cents

        uid = g["user_id"].combine_chunks().to_numpy(zero_copy_only=False)
        ts = g["ts"].combine_chunks().cast(pa.int64()).to_numpy(zero_copy_only=False)
        cents = to_cents(g["value"].combine_chunks()).to_numpy(zero_copy_only=False)
        n = len(ts)
        new_user = np.ones(n, dtype=bool)
        new_user[1:] = uid[1:] != uid[:-1]
        gap = np.empty(n, dtype=np.int64)
        gap[1:] = ts[1:] - ts[:-1]
        # rolling window floor: max(i - roll + 1, user segment start)
        idx = np.arange(n)
        seg_start = np.maximum.accumulate(np.where(new_user, idx, 0))
        lo = np.maximum(idx - (roll - 1), seg_start)
        csum = np.concatenate(([0], np.cumsum(cents)))
        rolling = csum[idx + 1] - csum[lo]
        gap_arr = pa.array(gap, pa.int64(), mask=new_user)
        return pa.table(
            {
                "event_id": g["event_id"],
                "user_id": g["user_id"],
                "gap_us": gap_arr,
                "roll_cents": pa.array(rolling, pa.int64()),
            }
        )

    return _bucketed(ds, "user_id").groupby("__bucket").map_groups(
        windows, batch_format="pyarrow"
    )


def user_value_ntile(sf_dir: str, tiles: int = 4, *, events_ds=None):
    """Per-user NTILE(tiles) of event value: rank-based, all-integer →
    bit-exact vs the SQL window oracle. Ordering within a user is
    (value_cents, event_id) — total, so tile assignment is
    deterministic. Output: (event_id, user_id, tile).

    Same bucketed segment-sweep dispatch as every window op here: one
    lexsort per hash bucket, tile formula vectorized over all users in
    the bucket (first ``n % tiles`` tiles get ``n // tiles + 1`` rows —
    DuckDB/ANSI NTILE semantics)."""
    import ray.data

    ds = events_ds if events_ds is not None else ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_id", "value"]
    )

    def tile_bucket(group: pa.Table) -> pa.Table:
        from .relational import cents as to_cents

        g = group.append_column("__cents", to_cents(group["value"]))
        order = pc.sort_indices(
            g,
            sort_keys=[
                ("user_id", "ascending"),
                ("__cents", "ascending"),
                ("event_id", "ascending"),
            ],
        )
        g = g.take(order)
        uid = g["user_id"].combine_chunks().to_numpy(zero_copy_only=False)
        n = len(uid)
        new_user = np.ones(n, dtype=bool)
        new_user[1:] = uid[1:] != uid[:-1]
        idx = np.arange(n)
        seg_start = np.maximum.accumulate(np.where(new_user, idx, 0))
        # per-row segment length: scatter seg ends back over the segment
        starts = np.flatnonzero(new_user)
        ends = np.append(starts[1:], n)
        seg_len = np.repeat(ends - starts, ends - starts)
        p = idx - seg_start  # 0-based position within the user
        q, r = seg_len // tiles, seg_len % tiles
        big_span = r * (q + 1)  # rows covered by the (q+1)-sized tiles
        in_big = p < big_span
        tile = np.where(
            in_big,
            p // (q + 1) + 1,
            # q can be 0 only when every row is in_big; guard the divide
            r + (p - big_span) // np.maximum(q, 1) + 1,
        )
        return pa.table({
            "event_id": g["event_id"],
            "user_id": g["user_id"],
            "tile": pa.array(tile.astype(np.int64), pa.int64()),
        })

    return _bucketed(ds, "user_id").groupby("__bucket").map_groups(
        tile_bucket, batch_format="pyarrow"
    )


def top_parts_per_brand(sf_dir: str, k: int = 3):
    """part → top-k per brand by retail price (window-rank): output
    (p_brand, p_partkey, p_retailprice, rnk). Bucketed like every other
    per-group operator: one sort of the bucket by (brand, -price,
    partkey), then vectorized segment ranks — dispatch stays at
    N_BUCKETS for any brand cardinality."""
    import ray.data

    ds = ray.data.read_parquet(
        f"{sf_dir}/part.parquet", columns=["p_brand", "p_partkey", "p_retailprice"]
    )

    def topk_bucket(group: pa.Table) -> pa.Table:
        order = pc.sort_indices(
            group,
            sort_keys=[
                ("p_brand", "ascending"),
                ("p_retailprice", "descending"),
                ("p_partkey", "ascending"),
            ],
        )
        g = group.take(order).drop_columns(["__bucket"])
        brand = g["p_brand"].combine_chunks()
        n = g.num_rows
        neq = pc.not_equal(brand.slice(1), brand.slice(0, n - 1)).to_numpy(
            zero_copy_only=False
        )
        new_seg = np.concatenate(([True], neq.astype(bool)))
        idx = np.arange(n)
        rnk = idx - np.maximum.accumulate(np.where(new_seg, idx, 0)) + 1
        keep = rnk <= k
        return g.filter(pa.array(keep)).append_column(
            "rnk", pa.array(rnk[keep], pa.int64())
        )

    return _bucketed(ds, "p_brand").groupby("__bucket").map_groups(
        topk_bucket, batch_format="pyarrow"
    )


def group_rank_windows(sf_dir: str, *, events_ds=None):
    """SQL ranking-window family per partition, one bucketed sweep:
    ROW_NUMBER / RANK / DENSE_RANK over (PARTITION BY user_id ORDER
    BY value_cents DESC) with event_id as the ROW_NUMBER tiebreak —
    all integer, bit-exact vs the window-function oracle — plus
    PERCENT_RANK ``(rank−1)/(n−1)`` (0.0 for single-row partitions,
    the ANSI/DuckDB convention), a single IEEE division from exact
    ints rounded to 6 dp. Output: (event_id, user_id, rn, rnk, drnk,
    pr6).

    Dispatch is ``groupby(bucket)`` at N_BUCKETS groups regardless of
    partition-key cardinality; one lexsort per bucket ranks every key
    in it via segment masks (the module-level pattern). The partition
    key must be fine-grained (a bucket holds many whole keys) — a
    5-value key like event_type would put a whole partition in one
    bucket; rank over coarse keys needs the distributed
    sort+prefix-offset path (ops/pack.py) instead."""
    import ray.data

    ds = events_ds if events_ds is not None else ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "user_id", "value"],
    )

    def rank_bucket(group: pa.Table) -> pa.Table:
        from .relational import cents as to_cents

        g = group.append_column("__cents", to_cents(group["value"]))
        order = pc.sort_indices(
            g,
            sort_keys=[
                ("user_id", "ascending"),
                ("__cents", "descending"),
                ("event_id", "ascending"),
            ],
        )
        g = g.take(order)
        key = g["user_id"].combine_chunks()
        c = g["__cents"].combine_chunks().to_numpy(zero_copy_only=False)
        n = len(c)
        new_key = np.ones(n, dtype=bool)
        eq = pc.equal(key.slice(1), key.slice(0, n - 1))
        new_key[1:] = ~eq.to_numpy(zero_copy_only=False)
        change = new_key.copy()
        change[1:] |= c[1:] != c[:-1]  # new tie-run within the key
        idx = np.arange(n, dtype=np.int64)
        seg_start = np.maximum.accumulate(np.where(new_key, idx, 0))
        run_start = np.maximum.accumulate(np.where(change, idx, 0))
        starts = np.flatnonzero(new_key)
        ends = np.append(starts[1:], n)
        seg_len = np.repeat(ends - starts, ends - starts)
        rn = idx - seg_start + 1
        rnk = run_start - seg_start + 1
        dr_global = np.cumsum(change)
        drnk = dr_global - dr_global[seg_start] + 1
        denom = seg_len - 1
        pr = np.where(
            denom > 0,
            (rnk - 1).astype(np.float64) / np.maximum(denom, 1).astype(np.float64),
            0.0,
        )
        pr6 = pc.round(pa.array(pr, pa.float64()), ndigits=6,
                       round_mode="half_towards_infinity")
        return pa.table({
            "event_id": g["event_id"],
            "user_id": g["user_id"],
            "rn": pa.array(rn, pa.int64()),
            "rnk": pa.array(rnk, pa.int64()),
            "drnk": pa.array(drnk, pa.int64()),
            "pr6": pr6,
        })

    return _bucketed(ds, "user_id").groupby("__bucket").map_groups(
        rank_bucket, batch_format="pyarrow"
    )


def global_rank(ds, *, value_col: str, id_col: str,
                range_width_cents: int = 1000, value_fn=None):
    """GLOBAL ranking windows — ROW_NUMBER / RANK / DENSE_RANK /
    PERCENT_RANK over ``ORDER BY cents DESC, id ASC`` with no
    partition key — WITHOUT a global sort: the pack.py range-prefix
    pattern. Ranges are value slices (``range_id = cents // width``),
    so every tie run is contained in exactly one range and global
    ranks decompose into range offsets + local segment ranks:

    1. tag (range_id, cents, id) — narrow projection, materialized
       once (feeds both the offset reduce and the assignment);
    2. per-range (rows, distinct-cents) totals via a map-side
       (range, cents) combiner + two tiny reduces — the only
       driver-collected state, bounded by the number of ranges;
       the driver prefix-sums them in DESCENDING range order and
       broadcasts {range: (row_offset, dense_offset)};
    3. ``groupby(range).map_groups``: one sort per range, vectorized
       tie-run masks, add the offsets.

    Integers are bit-exact vs the SQL window oracle; percent_rank is
    the single IEEE division ``(rank−1)/(N−1)`` rounded to 6 dp (0.0
    when N == 1). Output: (id, cents, rn, rnk, drnk, pr6).

    Scale contract: one range's rows must fit a worker — tune
    ``range_width_cents`` so N / (domain/width) rows fit; a massively
    hot single value (one tie run) cannot be split by any ranking
    method and would need a pre-aggregated representation instead.
    """
    import ray

    from ..kg.resources import broadcast, resolve
    from .relational import cents as to_cents

    def tag(batch: pa.Table) -> pa.Table:
        c = (value_fn(batch) if value_fn is not None
             else to_cents(batch[value_col]))
        if isinstance(c, pa.ChunkedArray):
            c = c.combine_chunks()
        cn = c.to_numpy(zero_copy_only=False)
        return pa.table({
            "__range": pa.array(cn // range_width_cents, pa.int64()),
            "cents": c,
            id_col: batch[id_col],
        })

    ranged = ds.map_batches(tag, batch_format="pyarrow",
                            zero_copy_batch=True).materialize()

    def pair_partial(batch: pa.Table) -> pa.Table:
        t = pa.table({"__range": batch["__range"], "cents": batch["cents"]})
        agg = t.group_by(["__range", "cents"]).aggregate([([], "count_all")])
        return agg.rename_columns(["__range", "cents", "cnt"])

    def range_stats(group: pa.Table) -> pa.Table:
        # dedupe the (cents, cnt) partials of ONE range: rows = Σcnt,
        # distinct = |distinct cents| — a single-key groupby over
        # combiner rows (a 2-key global (range,cents) reduce measured
        # 6× slower at 1M rows for the same answer)
        return pa.table({
            "__range": group["__range"].slice(0, 1),
            "rows": pa.array(
                [pc.sum(group["cnt"]).as_py() or 0], pa.int64()),
            "dist": pa.array(
                [pc.count_distinct(group["cents"]).as_py()], pa.int64()),
        })

    per_range = (
        ranged.map_batches(pair_partial, batch_format="pyarrow",
                           zero_copy_batch=True)
        .groupby("__range").map_groups(range_stats, batch_format="pyarrow")
    )
    rows_by_range: dict[int, int] = {}
    dist_by_range: dict[int, int] = {}
    for b in per_range.iter_batches(batch_format="pyarrow"):
        if b.num_rows == 0 or "__range" not in b.column_names:
            continue
        for r, rw, dc in zip(b["__range"].to_pylist(),
                             b["rows"].to_pylist(), b["dist"].to_pylist()):
            rows_by_range[r] = rows_by_range.get(r, 0) + rw
            dist_by_range[r] = dist_by_range.get(r, 0) + dc
    n_total = sum(rows_by_range.values())
    offsets: dict[int, tuple[int, int]] = {}
    row_acc = dense_acc = 0
    for r in sorted(rows_by_range, reverse=True):  # DESC value order
        offsets[r] = (row_acc, dense_acc)
        row_acc += rows_by_range[r]
        dense_acc += dist_by_range[r]
    try:
        off_ref = broadcast((offsets, n_total))
    except Exception:
        off_ref = (offsets, n_total)

    def assign(group: pa.Table) -> pa.Table:
        offs, total = resolve(off_ref)
        row_off, dense_off = offs[group["__range"][0].as_py()]
        order = pc.sort_indices(
            group,
            sort_keys=[("cents", "descending"), (id_col, "ascending")],
        )
        g = group.take(order)
        c = g["cents"].combine_chunks().to_numpy(zero_copy_only=False)
        n = len(c)
        change = np.ones(n, dtype=bool)
        change[1:] = c[1:] != c[:-1]
        idx = np.arange(n, dtype=np.int64)
        run_start = np.maximum.accumulate(np.where(change, idx, 0))
        rn = row_off + idx + 1
        rnk = row_off + run_start + 1
        drnk = dense_off + np.cumsum(change)
        if total > 1:
            pr = (rnk - 1).astype(np.float64) / float(total - 1)
        else:
            pr = np.zeros(n, dtype=np.float64)
        pr6 = pc.round(pa.array(pr, pa.float64()), ndigits=6,
                       round_mode="half_towards_infinity")
        return pa.table({
            id_col: g[id_col],
            "cents": g["cents"],
            "rn": pa.array(rn, pa.int64()),
            "rnk": pa.array(rnk, pa.int64()),
            "drnk": pa.array(drnk, pa.int64()),
            "pr6": pr6,
        })

    return ranged.groupby("__range").map_groups(
        assign, batch_format="pyarrow"
    )


def retention_cohorts(sf_dir: str, *, events_ds=None):
    """Cohort retention: users grouped by their first active day, count
    of distinct users active at each day offset — the classic product-
    analytics matrix. Output: (cohort_day int64 epoch-days, day_offset
    int64, n_users int64).

    Scale shape: each block collapses to its distinct (user, day) pairs
    map-side; ONE bucketed shuffle co-locates a user's pairs
    (``groupby(bucket(user))``, N_BUCKETS dispatch); one lexsort per
    bucket finds every user's min day and emits (cohort, offset) partial
    counts; a final tiny reduce sums them — bounded by cohorts × offsets
    rows. Raw events never shuffle; no driver state, no broadcast (a
    user→cohort broadcast would be corpus-order at 10⁹ users).
    """
    import ray.data

    ds = events_ds if events_ds is not None else ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts"]
    )
    us_per_day = 86_400_000_000

    def day_pairs(batch: pa.Table) -> pa.Table:
        us = pc.cast(batch["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        t = pa.table({
            "user_id": batch["user_id"],
            "day": pa.array(us // us_per_day, pa.int64()),
        })
        return t.group_by(["user_id", "day"]).aggregate([])

    pairs = ds.map_batches(day_pairs, batch_format="pyarrow",
                           zero_copy_batch=True)

    def cohort_bucket(group: pa.Table) -> pa.Table:
        # pairs may repeat across blocks: re-distinct inside the bucket
        g = group.select(["user_id", "day"]).group_by(
            ["user_id", "day"]).aggregate([])
        order = pc.sort_indices(
            g, sort_keys=[("user_id", "ascending"), ("day", "ascending")])
        g = g.take(order)
        uid = g["user_id"].combine_chunks().to_numpy(zero_copy_only=False)
        day = g["day"].combine_chunks().to_numpy(zero_copy_only=False)
        n = len(uid)
        new_user = np.ones(n, dtype=bool)
        new_user[1:] = uid[1:] != uid[:-1]
        idx = np.arange(n, dtype=np.int64)
        seg_start = np.maximum.accumulate(np.where(new_user, idx, 0))
        cohort = day[seg_start]  # min day = first row of the sorted segment
        t = pa.table({
            "cohort_day": pa.array(cohort, pa.int64()),
            "day_offset": pa.array(day - cohort, pa.int64()),
            "one": pa.nulls(n, pa.int64()).fill_null(1),
        })
        agg = t.group_by(["cohort_day", "day_offset"]).aggregate(
            [("one", "sum")])
        return agg.rename_columns(["cohort_day", "day_offset", "n_p"])

    return (
        _bucketed(pairs, "user_id").groupby("__bucket")
        .map_groups(cohort_bucket, batch_format="pyarrow")
        .groupby(["cohort_day", "day_offset"]).sum("n_p")
        .map_batches(
            lambda b: b.rename_columns(["cohort_day", "day_offset", "n_users"]),
            batch_format="pyarrow",
        )
    )


def group_string_agg(ds, *, key: str, value_col: str, sep: str = ",",
                     key_type: pa.DataType = pa.int64()):
    """SQL ``string_agg(value, sep ORDER BY value)`` per group, fully
    vectorized: one lexsort per bucket, then the bucket's segments
    become a single Arrow ListArray (offsets = segment starts) joined
    by ``pc.binary_join`` — no per-key Python, no per-key string
    concatenation loop. Deterministic: values sort ascending (ties keep
    duplicates — SQL multiset semantics). Output: (key, agg string).

    Scale contract: a group's concatenated string must fit a worker's
    string budget — this is inherent to string_agg everywhere.
    """

    def agg_bucket(group: pa.Table) -> pa.Table:
        order = pc.sort_indices(
            group,
            sort_keys=[(key, "ascending"), (value_col, "ascending")],
        )
        g = group.take(order)
        ka = g[key].combine_chunks()
        vals = pc.cast(g[value_col].combine_chunks(), pa.string())
        n = len(ka)
        new_key = np.ones(n, dtype=bool)
        eq = pc.equal(ka.slice(1), ka.slice(0, n - 1))
        new_key[1:] = ~eq.to_numpy(zero_copy_only=False)
        starts = np.flatnonzero(new_key)
        offsets = pa.array(np.append(starts, n).astype(np.int32))
        lists = pa.ListArray.from_arrays(offsets, vals)
        joined = pc.binary_join(lists, sep)
        return pa.table({
            key: pc.cast(ka.take(pa.array(starts, pa.int64())), key_type),
            "agg": joined,
        })

    return _bucketed(ds, key).groupby("__bucket").map_groups(
        agg_bucket, batch_format="pyarrow"
    )


def rolling_active_users(sf_dir: str, *, window_days: int = 7,
                         events_ds=None):
    """Rolling W-day distinct active users per day (the DAU/WAU
    metric): for each day d, the count of users with ≥1 event in
    [d−W+1, d]. Output: (day int64 epoch-days, n_users int64), clipped
    to days ≤ the max observed event day (trailing windows would
    otherwise emit W−1 ghost days past the end of the data).

    Scale shape: blocks collapse to distinct (user, day) pairs
    map-side; ONE bucketed shuffle co-locates a user's pairs; inside
    the bucket each user's days expand to their W trailing window days
    and DEDUPE LOCALLY (a user counts once per window day no matter
    how many active days fall in the window) — the classic replication
    trick, but the dedupe never leaves the worker; a final tiny
    groupby(day) sums per-bucket partials. Raw events never shuffle.
    """
    import ray.data

    ds = events_ds if events_ds is not None else ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts"]
    )
    us_per_day = 86_400_000_000

    def day_pairs(batch: pa.Table) -> pa.Table:
        us = pc.cast(batch["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        t = pa.table({
            "user_id": batch["user_id"],
            "day": pa.array(us // us_per_day, pa.int64()),
        })
        return t.group_by(["user_id", "day"]).aggregate([])

    # materialized: feeds both the window expansion and the max-day
    # bound below (narrow distinct pairs — object-store resident)
    pairs = ds.map_batches(day_pairs, batch_format="pyarrow",
                           zero_copy_batch=True).materialize()

    def window_bucket(group: pa.Table) -> pa.Table:
        g = group.select(["user_id", "day"]).group_by(
            ["user_id", "day"]).aggregate([])
        uid = g["user_id"].combine_chunks().to_numpy(zero_copy_only=False)
        day = g["day"].combine_chunks().to_numpy(zero_copy_only=False)
        # replicate each active day to its W trailing window days
        w = np.arange(window_days, dtype=np.int64)
        wd = (day[:, None] + w[None, :]).ravel()
        wu = np.repeat(uid, window_days)
        t = pa.table({
            "user_id": pa.array(wu, pa.int64()),
            "day": pa.array(wd, pa.int64()),
        })
        # local dedupe: one user counts once per window day
        t = t.group_by(["user_id", "day"]).aggregate([])
        cnt = t.group_by("day").aggregate([([], "count_all")])
        return cnt.rename_columns(["day", "n_p"])

    counts = (
        _bucketed(pairs, "user_id").groupby("__bucket")
        .map_groups(window_bucket, batch_format="pyarrow")
        .groupby("day").sum("n_p")
        .map_batches(lambda b: b.rename_columns(["day", "n_users"]),
                     batch_format="pyarrow")
    )
    # clip trailing ghost days (windows extending past the last
    # observed event day) with a broadcast max-day bound
    max_day = pairs.max("day")

    def clip(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.less_equal(batch["day"], max_day))

    return counts.map_batches(clip, batch_format="pyarrow")


def event_transitions(sf_dir: str, *, events_ds=None):
    """Global Markov transition counts over per-user ordered event
    sequences: (prev_type, next_type, n) for every consecutive pair of
    a user's events in (ts, event_id) order — the sequence-mining /
    session-flow primitive (SQL ``lead() OVER (PARTITION BY user)``).

    One bucketed shuffle co-locates each user's rows; inside a bucket
    one lexsort + same-user adjacency mask emits every pair vectorized,
    and a per-bucket ``group_by(prev,next)`` partial collapses the
    output to ≤ |types|² rows per bucket, so the final groupby-sum
    carries ≤ n_buckets × |types|² rows regardless of corpus size."""
    import ray.data

    ds = events_ds if events_ds is not None else ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_id", "ts", "event_type"]
    )

    def pairs(group: pa.Table) -> pa.Table:
        order = pc.sort_indices(
            group,
            sort_keys=[
                ("user_id", "ascending"),
                ("ts", "ascending"),
                ("event_id", "ascending"),
            ],
        )
        g = group.take(order)
        uid = g["user_id"].combine_chunks().to_numpy(zero_copy_only=False)
        et = g["event_type"].combine_chunks()
        n = len(uid)
        if n < 2:
            return pa.table({
                "prev_type": pa.array([], pa.string()),
                "next_type": pa.array([], pa.string()),
                "n_local": pa.array([], pa.int64()),
            })
        same = pa.array(uid[1:] == uid[:-1])
        t = pa.table({
            "prev_type": et.slice(0, n - 1),
            "next_type": et.slice(1, n - 1),
        }).filter(same)
        agg = t.group_by(["prev_type", "next_type"]).aggregate(
            [("prev_type", "count")]
        )
        return agg.rename_columns(["prev_type", "next_type", "n_local"])

    agg = (
        _bucketed(ds, "user_id")
        .groupby("__bucket")
        .map_groups(pairs, batch_format="pyarrow")
        .groupby(["prev_type", "next_type"])
        .sum("n_local")
    )
    return agg.map_batches(
        lambda b: b.rename_columns(["prev_type", "next_type", "n"]),
        batch_format="pyarrow",
    )


def daily_new_users(sf_dir: str, *, events_ds=None):
    """New-vs-cumulative user growth: each user counts once, on their
    FIRST active day; output (day, n_new, cum_users) with the running
    total (SQL ``SUM() OVER (ORDER BY day)``).

    Scale shape: first-seen day per user is a map-side per-batch min
    partial + ONE native ``groupby(user).min`` (no per-key dispatch);
    per-day counts pre-aggregate map-side. The final cumulative sum
    runs on the day-level result, whose cardinality is CALENDAR-bounded
    (≤ a few thousand rows for a decade of days, independent of corpus
    size), so one ``repartition(1)`` block sort + cumsum is exact and
    cheap at any scale."""
    import ray.data

    ds = events_ds if events_ds is not None else ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts"]
    )

    def first_partial(batch: pa.Table) -> pa.Table:
        t = pa.table({
            "user_id": batch["user_id"],
            "day": pc.strftime(batch["ts"], format="%Y-%m-%d"),
        })
        agg = t.group_by("user_id").aggregate([("day", "min")])
        return agg.rename_columns(["user_id", "day"])

    first = (
        ds.map_batches(first_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("user_id")
        .min("day")
    )

    def day_partial(batch: pa.Table) -> pa.Table:
        b = batch.rename_columns(["user_id", "day"])
        t = pa.table({
            "day": b["day"],
            "one": pa.nulls(b.num_rows, pa.int64()).fill_null(1),
        })
        return (t.group_by("day").aggregate([("one", "sum")])
                .rename_columns(["day", "n_local"]))

    per_day = (
        first.map_batches(day_partial, batch_format="pyarrow")
        .groupby("day")
        .sum("n_local")
    )

    def finish(batch: pa.Table) -> pa.Table:
        b = batch.rename_columns(["day", "n_new"])
        b = b.take(pc.sort_indices(b, sort_keys=[("day", "ascending")]))
        cum = np.cumsum(b["n_new"].to_numpy(zero_copy_only=False))
        return b.append_column("cum_users", pa.array(cum, pa.int64()))

    return per_day.repartition(1).map_batches(finish, batch_format="pyarrow")


def global_cummax(ds, *, order_col: str, value_col: str,
                  range_width: int = 65_536, value_fn=None,
                  tie_col: str | None = None):
    """GLOBAL running maximum over arrival order — the streaming
    "record tracker": for each row (ordered by ``order_col``), the max
    of every STRICTLY EARLIER row's value, plus an ``is_record`` flag
    (value exceeds everything before it; the first row is a record).

    No global sort: the global_rank range-prefix pattern over
    CONTIGUOUS order ranges (``range_id = order // range_width``) —

    1. tag (range_id, order, value) — narrow, materialized once;
    2. per-range max via a map-side combiner + native groupby-max —
       the only driver-collected state, one int64 per range; the
       driver prefix-maxes them in ASCENDING range order (exclusive)
       and broadcasts {range: prefix_max};
    3. one vectorized sort + shifted cummax per range group, offset
       by the range's prefix.

    Output: (order_col, value, prev_max, is_record) — ``prev_max`` is
    NULL-free int64 with the first global row carrying its own value
    (a record by definition, int64 min stays internal). Scale
    contract: one range's rows fit a worker (ranges are order-id
    slices — tune ``range_width``); order ids need not be dense, only
    unique — or pass ``tie_col`` (a unique id) to make "earlier" the
    lexicographic (order, tie) position when order values may collide
    (e.g. arrival timestamps). The tie column passes through to the
    output.
    """
    from ..kg.resources import broadcast, resolve

    I64_MIN = np.iinfo(np.int64).min

    def tag(batch: pa.Table) -> pa.Table:
        o = batch[order_col]
        if isinstance(o, pa.ChunkedArray):
            o = o.combine_chunks()
        v = (value_fn(batch) if value_fn is not None else batch[value_col])
        if isinstance(v, pa.ChunkedArray):
            v = v.combine_chunks()
        on = o.to_numpy(zero_copy_only=False)
        cols = {
            "__range": pa.array(on // range_width, pa.int64()),
            order_col: o,
            "value": pc.cast(v, pa.int64()),
        }
        if tie_col is not None:
            cols[tie_col] = batch[tie_col]
        return pa.table(cols)

    ranged = ds.map_batches(tag, batch_format="pyarrow",
                            zero_copy_batch=True).materialize()

    def max_partial(batch: pa.Table) -> pa.Table:
        t = pa.table({"__range": batch["__range"], "value": batch["value"]})
        g = t.group_by("__range").aggregate([("value", "max")])
        return g.rename_columns(["__range", "m_local"])

    per_range = (ranged.map_batches(max_partial, batch_format="pyarrow",
                                    zero_copy_batch=True)
                 .groupby("__range").max("m_local"))
    max_by_range: dict[int, int] = {}
    for b in per_range.iter_batches(batch_format="pyarrow"):
        if b.num_rows == 0 or "__range" not in b.column_names:
            continue
        for r, m in zip(b["__range"].to_pylist(), b["max(m_local)"].to_pylist()):
            max_by_range[r] = max(max_by_range.get(r, I64_MIN), m)
    prefix: dict[int, int] = {}
    acc = I64_MIN
    for r in sorted(max_by_range):  # ASC order; exclusive prefix
        prefix[r] = acc
        acc = max(acc, max_by_range[r])
    try:
        pre_ref = broadcast(prefix)
    except Exception:
        pre_ref = prefix

    def sweep(group: pa.Table) -> pa.Table:
        pre = resolve(pre_ref)[group["__range"][0].as_py()]
        sort_keys = [(order_col, "ascending")]
        if tie_col is not None:
            sort_keys.append((tie_col, "ascending"))
        g = group.take(pc.sort_indices(group, sort_keys=sort_keys))
        v = g["value"].combine_chunks().to_numpy(zero_copy_only=False)
        shifted = np.empty_like(v)
        shifted[0] = pre
        if len(v) > 1:
            np.maximum.accumulate(v[:-1], out=shifted[1:])
            np.maximum(shifted[1:], pre, out=shifted[1:])
        is_rec = v > shifted
        prev = np.where(shifted == np.iinfo(np.int64).min, v, shifted)
        cols = {
            order_col: g[order_col],
            "value": g["value"],
            "prev_max": pa.array(prev, pa.int64()),
            "is_record": pa.array(is_rec.astype(np.int64), pa.int64()),
        }
        if tie_col is not None:
            cols[tie_col] = g[tie_col]
        return pa.table(cols)

    return ranged.groupby("__range").map_groups(sweep, batch_format="pyarrow")


def user_gap_histogram(sf_dir: str | None = None, *, events_ds=None,
                       bucket_us: int = 60_000_000):
    """Inter-event inactivity distribution: the histogram of gaps
    between a user's CONSECUTIVE events, bucketed to minutes — the
    session-gap diagnostic behind sessionize's ``gap_minutes`` knob.

    Scale shape: the per-user ordered diff is the bucket-vectorized
    single-sweep pattern (one lexsort (user, ts) per hash bucket —
    N_BUCKETS dispatch, never per user); gap partials fold map-side
    inside the sweep and one tiny groupby-sum over the gap-minute
    domain finishes. Tie order among equal timestamps does not affect
    the gap MULTISET, so the histogram is deterministic without an id
    tiebreak. Output: (gap_min, n).
    """
    import ray.data

    if events_ds is None:
        events_ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                                          columns=["user_id", "ts"])

    def proj(batch: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": pc.cast(batch["user_id"], pa.int64()),
            "ts_us": pc.cast(pc.cast(batch["ts"], pa.timestamp("us")),
                             pa.int64()),
        })

    ds = _bucketed(events_ds.map_batches(proj, batch_format="pyarrow",
                                         zero_copy_batch=True), "user_id")

    def sweep(group: pa.Table) -> pa.Table:
        order = pc.sort_indices(group, sort_keys=[("user_id", "ascending"),
                                                  ("ts_us", "ascending")])
        g = group.take(order)
        u = g["user_id"].combine_chunks().to_numpy(zero_copy_only=False)
        t = g["ts_us"].combine_chunks().to_numpy(zero_copy_only=False)
        n = len(u)
        if n < 2:
            return pa.table({"gap_min": pa.array([], pa.int64()),
                             "n_local": pa.array([], pa.int64())})
        same = u[1:] == u[:-1]
        gaps = (t[1:] - t[:-1])[same] // bucket_us
        vals, cnts = np.unique(gaps, return_counts=True)
        return pa.table({"gap_min": pa.array(vals, pa.int64()),
                         "n_local": pa.array(cnts, pa.int64())})

    out = ds.groupby("__bucket").map_groups(
        sweep, batch_format="pyarrow").groupby("gap_min").sum("n_local")
    return out.map_batches(
        lambda b: b.rename_columns(["gap_min", "n"]),
        batch_format="pyarrow").sort("gap_min")


def event_trigram_paths(sf_dir: str, *, events_ds=None):
    """Length-3 user-journey mining: (t1, t2, t3, n) counts over every
    run of three consecutive events of one user in (ts, event_id)
    order — the sequence extension of :func:`event_transitions`, same
    scale shape (one bucketed shuffle, vectorized double-adjacency
    mask, per-bucket partials ≤ |types|³ rows)."""
    import ray.data

    ds = events_ds if events_ds is not None else ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "event_id", "ts", "event_type"])

    def trigrams(group: pa.Table) -> pa.Table:
        empty = pa.table({
            "t1": pa.array([], pa.string()),
            "t2": pa.array([], pa.string()),
            "t3": pa.array([], pa.string()),
            "n_local": pa.array([], pa.int64()),
        })
        order = pc.sort_indices(group, sort_keys=[
            ("user_id", "ascending"), ("ts", "ascending"),
            ("event_id", "ascending")])
        g = group.take(order)
        uid = g["user_id"].combine_chunks().to_numpy(zero_copy_only=False)
        et = g["event_type"].combine_chunks()
        n = len(uid)
        if n < 3:
            return empty
        same = pa.array((uid[1:-1] == uid[:-2]) & (uid[2:] == uid[:-2]))
        t = pa.table({
            "t1": et.slice(0, n - 2),
            "t2": et.slice(1, n - 2),
            "t3": et.slice(2, n - 2),
        }).filter(same)
        if t.num_rows == 0:
            return empty
        agg = t.group_by(["t1", "t2", "t3"]).aggregate([("t1", "count")])
        return agg.rename_columns(["t1", "t2", "t3", "n_local"])

    agg = (_bucketed(ds, "user_id")
           .groupby("__bucket")
           .map_groups(trigrams, batch_format="pyarrow")
           .groupby(["t1", "t2", "t3"]).sum("n_local"))
    return agg.map_batches(
        lambda b: b.rename_columns(["t1", "t2", "t3", "n"]),
        batch_format="pyarrow")


def group_abc_analysis(ds, *, key: str, member: str, value: str,
                       a_pct: int = 80, b_pct: int = 95):
    """ABC / Pareto analysis per group: members ranked by value DESC
    within each ``key``; each gets its running cumulative value and an
    ABC class — 'A' while cumulative·100 ≤ a_pct·total, then 'B' while
    ≤ b_pct·total, else 'C'. All comparisons are integer (value must be
    int64, e.g. cents) so class boundaries are bit-exact. Ties order by
    (value DESC, member ASC) — deterministic.

    Input rows must already be one (key, member, value) aggregate per
    member (callers fold with a native groupby-sum first). One bucketed
    shuffle; the per-bucket segment sweep ranks + cumsums every group
    vectorized. Output: (key, member, value, cum_value, abc_class).
    """
    out_schema = pa.schema([
        (key, pa.string()), (member, pa.int64()), (value, pa.int64()),
        ("cum_value", pa.int64()), ("abc_class", pa.string()),
    ])

    def sweep(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return out_schema.empty_table()
        order = pc.sort_indices(group, sort_keys=[
            (key, "ascending"), (value, "descending"),
            (member, "ascending")])
        g = group.take(order)
        ka = g[key].combine_chunks()
        v = g[value].combine_chunks().to_numpy(zero_copy_only=False)
        n = len(v)
        neq = pc.not_equal(ka.slice(1), ka.slice(0, n - 1)).to_numpy(
            zero_copy_only=False)
        new = np.concatenate(([True], neq.astype(bool)))
        cum = np.cumsum(v)
        seg_start = np.maximum.accumulate(
            np.where(new, np.arange(n, dtype=np.int64), 0))
        base = np.where(seg_start > 0, cum[seg_start - 1], 0)
        base[new & (seg_start == 0)] = 0
        seg_cum = cum - base
        ends = np.append(np.flatnonzero(new)[1:], n)
        tot = seg_cum[np.repeat(ends - 1, np.diff(
            np.append(np.flatnonzero(new), n)))]
        cls = np.where(seg_cum * 100 <= a_pct * tot, "A",
                       np.where(seg_cum * 100 <= b_pct * tot, "B", "C"))
        return pa.table({
            key: ka,
            member: g[member],
            value: pa.array(v),
            "cum_value": pa.array(seg_cum),
            "abc_class": pa.array(cls.tolist(), pa.string()),
        }).cast(out_schema)

    return (_bucketed(ds, key).groupby("__bucket")
            .map_groups(sweep, batch_format="pyarrow"))


def group_gap_stats(ds, *, key: str, ts: str, tie: str,
                    unit_us: int = 86_400_000_000):
    """Per-key gap statistics over an ordered event/order stream: for
    every key with ≥ 2 rows, the (count, sum, min, max) of the deltas
    between consecutive timestamps in (ts, tie) order, floor-divided
    into ``unit_us`` units (default days) — the repeat-purchase-interval
    profile, all integer-exact (no float mean; consumers divide
    sum/count themselves).

    One bucketed shuffle; the per-bucket sweep computes every key's
    adjacent diffs with one lexsort + same-key mask, then folds to one
    row per key with a vectorized segment reduce.
    Output: (key, n_gaps, sum_gap, min_gap, max_gap) int64.
    """
    out_schema = pa.schema([
        (key, pa.int64()), ("n_gaps", pa.int64()), ("sum_gap", pa.int64()),
        ("min_gap", pa.int64()), ("max_gap", pa.int64()),
    ])

    def sweep(group: pa.Table) -> pa.Table:
        if group.num_rows < 2:
            return out_schema.empty_table()
        order = pc.sort_indices(group, sort_keys=[
            (key, "ascending"), (ts, "ascending"), (tie, "ascending")])
        g = group.take(order)
        k = g[key].combine_chunks().to_numpy(zero_copy_only=False)
        t = (g[ts].combine_chunks().cast(pa.int64())
             .to_numpy(zero_copy_only=False))
        same = k[1:] == k[:-1]
        gaps = (t[1:] - t[:-1]) // unit_us
        gk = k[1:][same]
        gv = gaps[same]
        if len(gk) == 0:
            return out_schema.empty_table()
        order2 = np.argsort(gk, kind="stable")
        gk, gv = gk[order2], gv[order2]
        new = np.ones(len(gk), dtype=bool)
        new[1:] = gk[1:] != gk[:-1]
        gid = np.cumsum(new) - 1
        m = gid[-1] + 1
        n = np.zeros(m, np.int64)
        s = np.zeros(m, np.int64)
        mn = np.full(m, np.iinfo(np.int64).max)
        mx = np.full(m, np.iinfo(np.int64).min)
        np.add.at(n, gid, 1)
        np.add.at(s, gid, gv)
        np.minimum.at(mn, gid, gv)
        np.maximum.at(mx, gid, gv)
        return pa.table({
            key: pa.array(gk[new]),
            "n_gaps": pa.array(n),
            "sum_gap": pa.array(s),
            "min_gap": pa.array(mn),
            "max_gap": pa.array(mx),
        }).cast(out_schema)

    return (_bucketed(ds, key).groupby("__bucket")
            .map_groups(sweep, batch_format="pyarrow"))


def event_sequence_pattern(ds, *, key: str, ts_col: str, tiebreak_col: str,
                           code_col: str, pattern: str,
                           key_type: pa.DataType = pa.int64()):
    """Complex-event pattern matching (MATCH_RECOGNIZE shape): each
    key's events are totally ordered by (ts, tiebreak), their
    single-char codes concatenated into a sequence string, and a
    compiled RE2 pattern counted non-overlapping over it — e.g.
    ``v+p`` = "one or more views immediately followed by a purchase".

    Fully vectorized: ONE bucketed shuffle co-locates a key's events;
    inside the bucket one lexsort + an Arrow ListArray/binary_join
    builds every key's sequence at once, and ``count_substring_regex``
    (RE2 — the same engine DuckDB's regexp functions use, so greedy
    non-overlapping counts agree) scans all sequences in one kernel
    call. Per-key Python never happens.

    Scale contract: a key's concatenated code string must fit a worker
    (one byte per event — 10^8 events/key before this matters).

    Output: (key, seq_len int64, n_matches int64).
    """

    def sweep(group: pa.Table) -> pa.Table:
        order = pc.sort_indices(
            group,
            sort_keys=[(key, "ascending"), (ts_col, "ascending"),
                       (tiebreak_col, "ascending")],
        )
        g = group.take(order)
        ka = g[key].combine_chunks()
        codes = pc.cast(g[code_col].combine_chunks(), pa.string())
        n = len(ka)
        first = np.ones(n, dtype=bool)
        if n > 1:
            first[1:] = ~pc.equal(ka.slice(1), ka.slice(0, n - 1)).to_numpy(
                zero_copy_only=False)
        starts = np.flatnonzero(first)
        offsets = pa.array(np.append(starts, n).astype(np.int32))
        seqs = pc.binary_join(pa.ListArray.from_arrays(offsets, codes), "")
        matches = pc.count_substring_regex(seqs, pattern)
        return pa.table({
            key: pc.cast(ka.take(pa.array(starts, pa.int64())), key_type),
            "seq_len": pc.cast(pc.utf8_length(seqs), pa.int64()),
            "n_matches": pc.cast(matches, pa.int64()),
        })

    return _bucketed(ds, key).groupby("__bucket").map_groups(
        sweep, batch_format="pyarrow")


def session_running_spend(sf_dir: str, gap_minutes: int = 30, *,
                          events_ds=None):
    """Windowed running aggregate WITH PARTITION RESET (the SQL
    ``SUM(x) OVER (PARTITION BY user, session ORDER BY ts, id)``
    shape): every event row gets the cumulative spend within its
    session, sessions derived by the same gap rule and numbering as
    :func:`sessionize_events`. Output: (user_id, session_no, event_id,
    cum_cents).

    One bucketed shuffle; inside the bucket one sort + ONE global
    cumsum with per-session base subtraction (np.repeat of segment
    bases) — running sums for every user and session in the bucket
    come out of a single vectorized pass, no per-session loop.
    """
    import ray.data

    ds = events_ds if events_ds is not None else ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_id", "ts", "value"]
    )
    gap_us = gap_minutes * 60 * 1_000_000

    def sweep(group: pa.Table) -> pa.Table:
        order = pc.sort_indices(
            group,
            sort_keys=[("user_id", "ascending"), ("ts", "ascending"),
                       ("event_id", "ascending")],
        )
        g = group.take(order)
        from .relational import cents as to_cents

        uid = g["user_id"].combine_chunks().to_numpy(zero_copy_only=False)
        ts = g["ts"].combine_chunks().cast(pa.int64()).to_numpy(zero_copy_only=False)
        ev = g["event_id"].combine_chunks().to_numpy(zero_copy_only=False)
        cents = to_cents(g["value"].combine_chunks()).to_numpy(zero_copy_only=False)
        n = len(ts)
        new_user = np.ones(n, dtype=bool)
        new_user[1:] = uid[1:] != uid[:-1]
        new_session = new_user.copy()
        new_session[1:] |= (ts[1:] - ts[:-1]) > gap_us
        starts = np.flatnonzero(new_session)
        lengths = np.diff(np.append(starts, n))
        sess_idx = np.arange(len(starts))
        user_first_sess = np.maximum.accumulate(
            np.where(new_user[starts], sess_idx, 0))
        session_no = np.repeat(sess_idx - user_first_sess + 1, lengths)
        total = np.cumsum(cents)
        base = np.concatenate(([0], total))[starts]  # sum before segment
        cum = total - np.repeat(base, lengths)
        return pa.table({
            "user_id": pa.array(uid, pa.int64()),
            "session_no": pa.array(session_no, pa.int64()),
            "event_id": pa.array(ev, pa.int64()),
            "cum_cents": pa.array(cum, pa.int64()),
        })

    return _bucketed(ds, "user_id").groupby("__bucket").map_groups(
        sweep, batch_format="pyarrow")


def late_data_windows(ds, *, arrival_col: str, tie_col: str, ts_col: str,
                      delay_us: int, window_us: int = 86_400_000_000,
                      range_width: int = 65_536):
    """Streaming WATERMARK semantics over a batch table: tumbling
    event-time windows with late-data accounting — the missing
    "windows/watermarks/late data" row of the reference's category
    checklist, replayed deterministically from an arrival log.

    The watermark when a row arrives is ``max(event time of every
    strictly-earlier arrival) − delay_us`` (the standard
    bounded-out-of-orderness watermark, e.g. Flink's
    BoundedOutOfOrdernessWatermarks); a row whose event time is below
    that watermark is LATE — a streaming engine would have already
    closed its window and routed it to a side output. Output: one row
    per tumbling event-time window, (window_start_us, n_ontime,
    n_late); every event is attributed to its event-time window, late
    ones in the n_late column. The first arrival is on-time by
    definition.

    Scale shape: the running max over arrival order is
    :func:`global_cummax` (contiguous arrival ranges, per-range max
    partials, driver prefix-max of one int64 per range — no global
    sort); the window rollup is a map-side combiner + one native
    groupby-sum over the tiny window domain. ``arrival_col`` is epoch
    µs of arrival (may collide — ``tie_col`` must be a unique id).
    """
    wm = global_cummax(ds, order_col=arrival_col, value_col=ts_col,
                       range_width=range_width, tie_col=tie_col)

    def window_partial(batch: pa.Table) -> pa.Table:
        tsu = batch["value"].combine_chunks().to_numpy(zero_copy_only=False)
        prev = batch["prev_max"].combine_chunks().to_numpy(
            zero_copy_only=False)
        late = tsu < prev - delay_us
        t = pa.table({
            "window_start_us": pa.array(tsu // window_us * window_us,
                                        pa.int64()),
            "n_ontime": pa.array((~late).astype(np.int64)),
            "n_late": pa.array(late.astype(np.int64)),
        })
        g = t.group_by("window_start_us").aggregate(
            [("n_ontime", "sum"), ("n_late", "sum")])
        return g.rename_columns(["window_start_us", "n_ontime", "n_late"])

    out = (wm.map_batches(window_partial, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby("window_start_us").sum(["n_ontime", "n_late"]))
    return out.map_batches(
        lambda b: b.rename_columns(["window_start_us", "n_ontime",
                                    "n_late"]),
        batch_format="pyarrow")


def global_cumsum(ds, *, order_col: str, value_col: str,
                  range_width: int = 65_536, tie_col: str | None = None):
    """GLOBAL running sum over a total order — the prefix-SUM sibling
    of :func:`global_cummax`, same contiguous-range pattern: per-range
    sum partials (one int64 per range on the driver), exclusive prefix
    sums broadcast, one vectorized sort + cumsum per range group. The
    backbone of sweep-line operators (interval concurrency, inventory
    level, account balance replay). Output: (order_col[, tie_col],
    value, running) with ``running`` the inclusive prefix sum in
    (order, tie) order. One range's rows must fit a worker.
    """
    from ..kg.resources import broadcast, resolve

    def tag(batch: pa.Table) -> pa.Table:
        o = batch[order_col]
        if isinstance(o, pa.ChunkedArray):
            o = o.combine_chunks()
        on = o.to_numpy(zero_copy_only=False)
        cols = {
            "__range": pa.array(on // range_width, pa.int64()),
            order_col: o,
            "value": pc.cast(batch[value_col], pa.int64()),
        }
        if tie_col is not None:
            cols[tie_col] = batch[tie_col]
        return pa.table(cols)

    ranged = ds.map_batches(tag, batch_format="pyarrow",
                            zero_copy_batch=True).materialize()

    def sum_partial(batch: pa.Table) -> pa.Table:
        t = pa.table({"__range": batch["__range"], "value": batch["value"]})
        g = t.group_by("__range").aggregate([("value", "sum")])
        return g.rename_columns(["__range", "s_local"])

    per_range = (ranged.map_batches(sum_partial, batch_format="pyarrow",
                                    zero_copy_batch=True)
                 .groupby("__range").sum("s_local"))
    sum_by_range: dict[int, int] = {}
    for b in per_range.iter_batches(batch_format="pyarrow"):
        if b.num_rows == 0 or "__range" not in b.column_names:
            continue
        for r, s in zip(b["__range"].to_pylist(),
                        b["sum(s_local)"].to_pylist()):
            sum_by_range[r] = sum_by_range.get(r, 0) + s
    prefix: dict[int, int] = {}
    acc = 0
    for r in sorted(sum_by_range):
        prefix[r] = acc
        acc += sum_by_range[r]
    try:
        pre_ref = broadcast(prefix)
    except Exception:
        pre_ref = prefix

    def sweep(group: pa.Table) -> pa.Table:
        pre = resolve(pre_ref)[group["__range"][0].as_py()]
        sort_keys = [(order_col, "ascending")]
        if tie_col is not None:
            sort_keys.append((tie_col, "ascending"))
        g = group.take(pc.sort_indices(group, sort_keys=sort_keys))
        v = g["value"].combine_chunks().to_numpy(zero_copy_only=False)
        run = np.cumsum(v) + pre
        cols = {order_col: g[order_col], "value": g["value"],
                "running": pa.array(run, pa.int64())}
        if tie_col is not None:
            cols[tie_col] = g[tie_col]
        return pa.table(cols)

    return ranged.groupby("__range").map_groups(sweep,
                                                batch_format="pyarrow")


def peak_concurrency(intervals_ds, *, start_col: str, end_col: str,
                     window_us: int = 86_400_000_000,
                     range_width: int | None = None):
    """Sweep-line peak concurrency per tumbling window: how many
    intervals (sessions, connections, rentals) are open SIMULTANEOUSLY
    at the busiest boundary instant of each window — the classic
    +1-at-start / −1-at-end sweep, made distributed by
    :func:`global_cumsum` (no global sort).

    Closed-interval semantics: at a shared instant, starts count
    before ends (tie 0 < 1), so touching intervals overlap. Peaks are
    measured AT boundary instants; a window containing no boundary
    emits no row (concurrency there is flat and owned by the previous
    boundary — the SQL mirror behaves identically). Among equal
    boundary (t, tie) runs the running sum ramps monotonically, so the
    per-window MAX is order-invariant and deterministic.

    ``range_width`` defaults to ~1/2048 of the boundary time span
    (boundaries are epoch-µs — the id-oriented 65536 default would
    explode the range domain). Output: (window_start_us, peak).
    """
    def bounds(batch: pa.Table) -> pa.Table:
        s = pc.cast(batch[start_col], pa.int64()).combine_chunks()
        e = pc.cast(batch[end_col], pa.int64()).combine_chunks()
        n = batch.num_rows
        return pa.table({
            "t": pa.concat_arrays([s, e]),
            "d": pa.concat_arrays([
                pa.nulls(n, pa.int64()).fill_null(1),
                pa.nulls(n, pa.int64()).fill_null(-1)]),
            "tie": pa.concat_arrays([
                pa.nulls(n, pa.int64()).fill_null(0),
                pa.nulls(n, pa.int64()).fill_null(1)]),
        })

    b = intervals_ds.map_batches(bounds, batch_format="pyarrow",
                                 zero_copy_batch=True).materialize()
    if range_width is None:
        lo, hi = b.min("t"), b.max("t")
        range_width = max(1, (hi - lo) // 2048 + 1)
    run = global_cumsum(b, order_col="t", value_col="d", tie_col="tie",
                        range_width=range_width)

    def window_partial(batch: pa.Table) -> pa.Table:
        t = batch["t"].combine_chunks().to_numpy(zero_copy_only=False)
        r = batch["running"].combine_chunks().to_numpy(zero_copy_only=False)
        tbl = pa.table({
            "window_start_us": pa.array(t // window_us * window_us,
                                        pa.int64()),
            "peak": pa.array(r, pa.int64()),
        })
        g = tbl.group_by("window_start_us").aggregate([("peak", "max")])
        return g.rename_columns(["window_start_us", "peak"])

    out = (run.map_batches(window_partial, batch_format="pyarrow",
                           zero_copy_batch=True)
           .groupby("window_start_us").max("peak"))
    return out.map_batches(
        lambda t: t.rename_columns(["window_start_us", "peak"]),
        batch_format="pyarrow")


def debounce(ds, *, key_cols: list[str], ts_col: str, tie_col: str,
             window_us: int, out_cols: list[str] | None = None):
    """Event THROTTLING (debounce): within each key, keep an event only
    if it is the key's first or arrived more than ``window_us`` after
    the key's PREVIOUS event (kept or not) — the lag-based duplicate/
    burst suppressor every event pipeline runs at ingest. The
    previous-event (not previous-KEPT) rule is what makes the sweep
    one vectorized lag comparison instead of a sequential greedy chain
    — and is exactly SQL's ``lag() OVER (PARTITION BY key ORDER BY ts,
    tie)``, so the oracle is a QUALIFY one-liner.

    Bucket-vectorized like every per-key operator here: one hash-bucket
    shuffle of the narrow columns, one lexsort + segment mask sweep per
    bucket. Output: ``out_cols`` (default: key_cols + [ts_col,
    tie_col]) of the kept rows.
    """
    keep_cols = out_cols or [*key_cols, ts_col, tie_col]

    def sweep(group: pa.Table) -> pa.Table:
        order = pc.sort_indices(
            group, sort_keys=[(c, "ascending") for c in key_cols]
            + [(ts_col, "ascending"), (tie_col, "ascending")])
        g = group.take(order)
        ts = pc.cast(pc.cast(g[ts_col], pa.timestamp("us")), pa.int64()) \
            .combine_chunks().to_numpy(zero_copy_only=False)
        n = len(ts)
        new_seg = np.zeros(n, dtype=bool)
        new_seg[:1] = True
        for c in key_cols:
            v = g[c].combine_chunks()
            if n > 1:
                same = pc.equal(v.slice(1), v.slice(0, n - 1)).to_numpy(
                    zero_copy_only=False)
                new_seg[1:] |= ~same
        keep = new_seg.copy()
        if n > 1:
            keep[1:] |= (ts[1:] - ts[:-1]) > window_us
        return g.select(keep_cols).filter(pa.array(keep))

    bucketed = _bucketed(ds, key_cols[0])
    return bucketed.groupby("__bucket").map_groups(sweep,
                                                   batch_format="pyarrow")
