"""Temporal operators Ray Data has no built-in for: as-of join and
hopping (sliding) window aggregation.

Both are expressed over **epoch-microsecond int64** timestamps so every
comparison, bucket floor and gap is integer math — bit-exact against any
SQL engine with no float or timezone ambiguity.

* :func:`asof_join` — for each left row, the right row with the greatest
  ``right_ts <= left_ts`` for the same key (classic "most recent prior
  fact"). Implemented as ONE co-partitioning shuffle: both sides are
  tagged, unioned and ``groupby(key)``-ed; inside a group the right side
  is sorted once and every left timestamp resolves via a vectorized
  ``searchsorted``. Partitioning assumption: one key's rows fit in a
  worker (per-user event/order streams; salt hot keys upstream).
* :func:`hopping_window_agg` — fixed-width windows every ``hop``; each
  row lands in ``width // hop`` windows, materialized map-side as that
  many shifted copies (vectorized concat), partially aggregated per
  batch, then one global ``groupby``. ``width == hop`` degenerates to a
  tumbling window. The shuffle carries one row per (window, key) per
  block, never the events.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _epoch_us(col) -> pa.Array:
    """timestamp[*] → int64 epoch microseconds (integer-exact)."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    return pc.cast(pc.cast(arr, pa.timestamp("us")), pa.int64())


def asof_join(
    left_ds,
    right_ds,
    *,
    key: str,
    left_ts: str,
    right_ts: str,
    right_tie: str,
    left_cols: list[str],
    right_cols: list[str],
    n_buckets: int = 256,
):
    """Most-recent-prior join (inner): for each left row, attach the
    right-side columns of the row with the greatest ``right_ts`` ≤ the
    left row's ``left_ts`` within the same ``key``; ties on ``right_ts``
    resolve to the greatest ``right_tie`` (deterministic). Left rows
    with no prior right row are dropped.

    ``left_ds``/``right_ds`` must already carry only the needed columns.
    Returns (key, left_ts, *left_cols, *right_cols) with both ts columns
    as int64 epoch-us.

    TYPE CONTRACT (int64-only): the key and every payload column are
    hard-cast to int64 (the union's null padding is int64, so the two
    sides must share that schema). String keys/payloads are not
    supported — map them to dictionary codes upstream (or extend the
    tag functions to derive pad types from the actual schemas).
    Timestamp payload columns are converted to epoch-µs int64.

    Execution is BUCKET-vectorized: keys hash into ``n_buckets`` groups
    so one ``map_groups`` call processes thousands of keys at once with
    a single lexsort + forward-fill sweep — group dispatch stays at
    ``n_buckets`` regardless of key cardinality (per-key ``map_groups``
    would make 100k Python calls for 100k users). Measured at
    10M events × 1M orders / 100k keys, 32 cpus: 19–24 s end-to-end
    (tools/temporal_stress.py). The per-bucket sweep: sort by
    (key, ts, side) with right rows ordered before left at equal ts
    (≤ is inclusive) and greatest tie last; forward-fill the latest
    right index; invalidate fills that crossed a key boundary.
    """
    tag_left, tag_right, resolve_bucket = _asof_parts(
        key=key, left_ts=left_ts, right_ts=right_ts, right_tie=right_tie,
        left_cols=left_cols, right_cols=right_cols, n_buckets=n_buckets,
    )

    tagged = left_ds.map_batches(tag_left, batch_format="pyarrow").union(
        right_ds.map_batches(tag_right, batch_format="pyarrow")
    )

    # NOTE: measured alternatives at 10M×1M rows / 100k keys (32 cpus):
    # sort-groupby on the bucket column + this key-aware sweep = 19–24 s
    # (1024 vs 256 buckets); HASH_SHUFFLE keyed repartition = 173 s
    # (aggregator-actor spin-up dominates at this scale); per-key
    # map_groups dispatch is the pathological one (100k Python group
    # calls). The bucket sweep keeps group dispatch at n_buckets
    # regardless of key cardinality.
    return tagged.groupby("__bucket").map_groups(
        resolve_bucket, batch_format="pyarrow"
    )


def _asof_parts(*, key, left_ts, right_ts, right_tie, left_cols, right_cols,
                n_buckets):
    """The as-of join's three building blocks (left/right taggers + the
    per-bucket vectorized resolve), shared by the shuffling
    :func:`asof_join` and the exchange-free
    :func:`asof_join_prepartitioned`."""
    r_payload = [right_ts, *[c for c in right_cols if c != right_ts]]

    from ..kg.unionfind import hash_bucket

    # aligned union schema: bucket, key, __ts (us), __side, payloads
    def tag_left(batch: pa.Table) -> pa.Table:
        k = pc.cast(batch[key], pa.int64())
        cols = {
            "__bucket": hash_bucket(k, n_buckets),
            key: k,
            "__ts": _epoch_us(batch[left_ts]),
            "__side": pa.nulls(batch.num_rows, pa.int8()).fill_null(0),
        }
        for c in left_cols:
            cols[c] = batch[c]
        for c in r_payload:
            cols[c] = pa.nulls(batch.num_rows, pa.int64())
        return pa.table(cols)

    def tag_right(batch: pa.Table) -> pa.Table:
        k = pc.cast(batch[key], pa.int64())
        cols = {
            "__bucket": hash_bucket(k, n_buckets),
            key: k,
            "__ts": _epoch_us(batch[right_ts]),
            "__side": pa.nulls(batch.num_rows, pa.int8()).fill_null(1),
        }
        for c in left_cols:
            cols[c] = pa.nulls(batch.num_rows, pa.int64())
        for c in r_payload:
            cols[c] = (
                _epoch_us(batch[c])
                if pa.types.is_timestamp(batch.schema.field(c).type)
                else pc.cast(batch[c], pa.int64())
            )
        return pa.table(cols)

    out_fields = [(key, pa.int64()), (left_ts, pa.int64())]
    out_fields += [(c, pa.int64()) for c in left_cols]
    out_fields += [(c, pa.int64()) for c in r_payload]
    out_schema = pa.schema(out_fields)

    def resolve_bucket(group: pa.Table) -> pa.Table:
        side = group["__side"].combine_chunks().to_numpy(zero_copy_only=False)
        if (side == 0).sum() == 0 or (side == 1).sum() == 0:
            return out_schema.empty_table()
        k = group[key].combine_chunks().to_numpy(zero_copy_only=False)
        ts = group["__ts"].combine_chunks().to_numpy(zero_copy_only=False)
        tie = (
            pc.fill_null(group[right_tie].combine_chunks(), 0)
            .cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        # right rows first at equal (key, ts) — the ≤ is inclusive —
        # greatest tie last so forward-fill keeps it
        side_order = np.where(side == 1, 0, 1)
        order = np.lexsort((tie, side_order, ts, k))
        k_s = k[order]
        is_right = side[order] == 1
        cand = np.where(is_right, np.arange(len(order)), -1)
        last = np.maximum.accumulate(cand)
        left_pos = np.flatnonzero(~is_right)
        j = last[left_pos]
        valid = j >= 0
        valid &= k_s[left_pos] == k_s[np.maximum(j, 0)]  # no key crossing
        l_orig = pa.array(order[left_pos[valid]])
        r_orig = pa.array(order[j[valid]])
        cols = {
            key: group[key].combine_chunks().take(l_orig),
            left_ts: group["__ts"].combine_chunks().take(l_orig),
        }
        for c in left_cols:
            cols[c] = group[c].combine_chunks().take(l_orig)
        for c in r_payload:
            cols[c] = group[c].combine_chunks().take(r_orig)
        return pa.table(cols, schema=out_schema)

    return tag_left, tag_right, resolve_bucket


def asof_join_prepartitioned(
    n_buckets: int,
    left_files,
    right_files,
    *,
    key: str,
    left_ts: str,
    right_ts: str,
    right_tie: str,
    left_cols: list[str],
    right_cols: list[str],
):
    """Exchange-FREE as-of join over inputs already bucketed on disk:
    ``left_files(b)`` / ``right_files(b)`` map a bucket id to parquet
    path(s) holding exactly the rows whose ``hash_bucket(key) == b``
    (e.g. written once by an upstream job that partitions both streams
    with the same key). Each Ray task reads its bucket pair and runs the
    SAME vectorized sweep as :func:`asof_join` in-process — no shuffle,
    so the all-to-all exchange that bounds the shuffling variant at ~0.5
    scaling efficiency is amortized into the (one-off) partitioned
    write. Output is identical to :func:`asof_join` on the union of the
    buckets. This is the 100-TB shape: partition once on the
    co-location key, reuse across every downstream temporal operator."""
    import ray.data

    tag_left, tag_right, resolve_bucket = _asof_parts(
        key=key, left_ts=left_ts, right_ts=right_ts, right_tie=right_tie,
        left_cols=left_cols, right_cols=right_cols, n_buckets=n_buckets,
    )

    def run_bucket(batch: pa.Table) -> pa.Table:
        import pyarrow.parquet as pq

        outs = []
        for b in batch["id"].to_pylist():
            lt = tag_left(pq.read_table(left_files(b)))
            rt = tag_right(pq.read_table(right_files(b)))
            outs.append(resolve_bucket(pa.concat_tables([lt, rt])))
        return pa.concat_tables(outs)

    return ray.data.range(n_buckets, override_num_blocks=n_buckets).map_batches(
        run_bucket, batch_format="pyarrow"
    )


def count_interval_overlaps(
    intervals_ds,
    *,
    key: str,
    start_ts: str,
    end_ts: str,
    n_buckets: int = 256,
):
    """Number of intervals whose start precedes the previous interval's
    end within the same key (i.e. violations of :func:`range_join`'s
    non-overlap assumption). One bucketed shuffle of (key, start, end);
    inside a bucket one lexsort + a vectorized previous-end comparison
    masked at key boundaries."""
    from ..kg.unionfind import hash_bucket

    def tag(batch: pa.Table) -> pa.Table:
        k = pc.cast(batch[key], pa.int64())
        return pa.table({
            "__bucket": hash_bucket(k, n_buckets),
            "k": k,
            "s": _epoch_us(batch[start_ts]),
            "e": _epoch_us(batch[end_ts]),
        })

    def count_bucket(group: pa.Table) -> pa.Table:
        k = group["k"].combine_chunks().to_numpy(zero_copy_only=False)
        s = group["s"].combine_chunks().to_numpy(zero_copy_only=False)
        e = group["e"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((e, s, k))
        k_s, s_s, e_s = k[order], s[order], e[order]
        same_key = k_s[1:] == k_s[:-1]
        overlap = same_key & (s_s[1:] <= e_s[:-1])
        return pa.table({"n": pa.array([int(overlap.sum())], pa.int64())})

    tagged = intervals_ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
    counted = tagged.groupby("__bucket").map_groups(
        count_bucket, batch_format="pyarrow"
    )
    return counted.sum("n") or 0


def range_join(
    points_ds,
    intervals_ds,
    *,
    key: str,
    point_ts: str,
    start_ts: str,
    end_ts: str,
    point_cols: list[str],
    interval_cols: list[str],
    n_buckets: int = 256,
    validate: bool = False,
):
    """Containment range join: each point row attaches the interval of
    the same key with ``start_ts ≤ point_ts ≤ end_ts`` (inclusive ends,
    inner semantics). PARTITIONING ASSUMPTION: a key's intervals are
    NON-OVERLAPPING (session windows, validity ranges) — under it the
    covering interval is exactly the latest interval starting at or
    before the point, so this composes as the bucket-vectorized
    :func:`asof_join` on the interval start followed by a vectorized
    end-bound filter; with overlapping intervals only the
    latest-starting cover matches. ``validate=True`` makes that misuse
    fail LOUDLY: an eager :func:`count_interval_overlaps` pass over the
    interval side raises ``ValueError`` if any key has overlapping
    intervals (one extra narrow shuffle — opt-in because the caller
    usually knows the intervals are windows by construction).

    Returns (key, point_ts, *point_cols, start_ts, end_ts,
    *interval_cols), timestamps as int64 epoch-µs.
    """
    if validate:
        n_overlap = count_interval_overlaps(
            intervals_ds, key=key, start_ts=start_ts, end_ts=end_ts,
            n_buckets=n_buckets,
        )
        if n_overlap:
            raise ValueError(
                f"range_join(validate=True): {n_overlap} interval(s) overlap a "
                f"same-key predecessor — the non-overlap assumption is violated "
                f"and only the latest-starting cover would match each point"
            )
    joined = asof_join(
        points_ds,
        intervals_ds,
        key=key,
        left_ts=point_ts,
        right_ts=start_ts,
        right_tie=end_ts,
        left_cols=point_cols,
        right_cols=[start_ts, end_ts, *interval_cols],
        n_buckets=n_buckets,
    )

    def keep_covered(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.less_equal(batch[point_ts], batch[end_ts]))

    return joined.map_batches(
        keep_covered, batch_format="pyarrow", zero_copy_batch=True
    )


def hopping_window_agg(
    events_ds,
    *,
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
    width_us: int = 2 * 3600 * 1_000_000,
    hop_us: int = 3600 * 1_000_000,
):
    """Hopping-window count + cents-sum per (window_start, key). A row
    with hour-floor f belongs to windows f, f-hop, ... down to
    f-(width//hop-1)*hop. Output: (window_start_us, key, n_events,
    sum_value_cents)."""
    from .relational import cents as to_cents

    if width_us % hop_us != 0:
        raise ValueError("hopping_window: width_us must be a multiple "
                         "of hop_us (a strippable assert would let a "
                         "ragged grid emit wrong window assignments "
                         "under python -O)")
    n_copies = width_us // hop_us

    def pre(batch: pa.Table) -> pa.Table:
        ts = _epoch_us(batch[ts_col]).to_numpy(zero_copy_only=False)
        base = pa.array(ts - ts % hop_us, pa.int64())  # floor to hop grid
        c = to_cents(batch[value_col])
        keys = batch[key_col]
        parts = []
        for i in range(n_copies):
            parts.append(
                pa.table(
                    {
                        "window_start_us": pc.subtract(base, i * hop_us),
                        key_col: keys,
                        "cents": c,
                        "one": pa.nulls(batch.num_rows, pa.int64()).fill_null(1),
                    }
                )
            )
        t = pa.concat_tables(parts)
        g = t.group_by(["window_start_us", key_col]).aggregate(
            [("one", "sum"), ("cents", "sum")]
        )
        return g.rename_columns(["window_start_us", key_col, "n_local", "cents_local"])

    agg = (
        events_ds.map_batches(pre, batch_format="pyarrow")
        .groupby(["window_start_us", key_col])
        .sum(["n_local", "cents_local"])
    )
    return agg.map_batches(
        lambda b: b.rename_columns(
            ["window_start_us", key_col, "n_events", "sum_value_cents"]
        ),
        batch_format="pyarrow",
    )


def densify_daily(sf_dir: str, *, key: str = "event_type",
                  events_ds=None, n_buckets: int = 256):
    """Time-series gap fill (densification): per key, one row for EVERY
    day in the corpus' [min_day, max_day] range, zero-filled where the
    key had no events — the prerequisite for rolling averages /
    charting / seasonality models that assume a dense time axis.
    Output: (key, day int64 epoch-days, n_events int64).

    Scale shape: the day counts reduce map-side to (key, day) partials
    (ONE small shuffle, keys×days rows); the global [min_day, max_day]
    bound is two native scalar aggregates broadcast as plain ints; gap
    rows are GENERATED inside the bucketed cogroup (np.arange per key
    segment) — the dense matrix never exists on the driver. Output is
    keys×range_days rows; a multi-year corpus with a huge key domain
    should densify per partition window instead.
    """
    import ray.data

    from ..kg.unionfind import hash_bucket

    ds = events_ds if events_ds is not None else ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=[key, "ts"]
    )
    us_per_day = 86_400_000_000

    def day_partial(batch: pa.Table) -> pa.Table:
        us = pc.cast(batch["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        t = pa.table({
            key: batch[key],
            "day": pa.array(us // us_per_day, pa.int64()),
            "one": pa.nulls(batch.num_rows, pa.int64()).fill_null(1),
        })
        agg = t.group_by([key, "day"]).aggregate([("one", "sum")])
        return agg.rename_columns([key, "day", "n_p"])

    # narrow (key, day, n_p) partials feed the range bound AND the fill
    counts = ds.map_batches(day_partial, batch_format="pyarrow",
                            zero_copy_batch=True).materialize()
    lo = counts.min("day")
    hi = counts.max("day")

    def tag(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "__bucket", hash_bucket(batch[key].combine_chunks(), n_buckets))

    def fill_bucket(group: pa.Table) -> pa.Table:
        agg = group.select([key, "day", "n_p"]).group_by(
            [key, "day"]).aggregate([("n_p", "sum")])
        agg = agg.rename_columns([key, "day", "n_events"])
        order = pc.sort_indices(
            agg, sort_keys=[(key, "ascending"), ("day", "ascending")])
        g = agg.take(order)
        ka = g[key].combine_chunks()
        day = g["day"].combine_chunks().to_numpy(zero_copy_only=False)
        nev = g["n_events"].combine_chunks().to_numpy(zero_copy_only=False)
        n = len(day)
        new_key = np.ones(n, dtype=bool)
        eq = pc.equal(ka.slice(1), ka.slice(0, n - 1))
        new_key[1:] = ~eq.to_numpy(zero_copy_only=False)
        starts = np.flatnonzero(new_key)
        span = hi - lo + 1
        # dense frame: one contiguous [lo, hi] stripe per key segment
        n_keys = len(starts)
        out_day = np.tile(np.arange(lo, hi + 1, dtype=np.int64), n_keys)
        out_key = ka.take(pa.array(np.repeat(starts, span), pa.int64()))
        out_n = np.zeros(n_keys * span, dtype=np.int64)
        seg_of_row = np.repeat(np.arange(n_keys), np.diff(
            np.append(starts, n)))
        out_n[seg_of_row * span + (day - lo)] = nev
        return pa.table({
            key: out_key,
            "day": pa.array(out_day, pa.int64()),
            "n_events": pa.array(out_n, pa.int64()),
        })

    return counts.map_batches(tag, batch_format="pyarrow",
                              zero_copy_batch=True)\
        .groupby("__bucket").map_groups(fill_bucket, batch_format="pyarrow")


def daily_anomalies(sf_dir: str, *, key: str = "event_type",
                    window: int = 7, k: int = 2, events_ds=None,
                    n_buckets: int = 256):
    """Rolling anomaly detection over the DENSIFIED daily series: a day
    is anomalous when its count deviates from the trailing ``window``
    days' mean by more than ``k`` sample deviations — evaluated as the
    EXACT integer predicate

        (W·n − S)² > k² · (W·Q − S²)        [S=Σn, Q=Σn² over the window]

    (⟺ (n−μ)² > k²σ² with σ² the population variance of the trailing
    window) — no float mean/std, so the flag set is bit-reproducible
    against the SQL window-function mirror. Days with fewer than
    ``window`` prior days in the dense stripe are not evaluated.
    Zero-filled gap days participate in windows AND can themselves be
    flagged (a sudden silence after steady traffic is an anomaly).
    Output: (key, day, n_events) — flagged days only.

    Composes :func:`densify_daily` (one combiner shuffle) with a
    second key-bucketed cogroup: one sort per bucket, per-segment
    prefix sums give every trailing window in O(rows). Magnitude
    contract: W·max(n)² < 2⁶³ (W=7: per-key daily counts < ~10⁹).
    """
    import ray.data

    from ..kg.unionfind import hash_bucket

    dense = densify_daily(sf_dir, key=key, events_ds=events_ds,
                          n_buckets=n_buckets)

    def tag(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "__bucket", hash_bucket(batch[key].combine_chunks(), n_buckets))

    W = window
    k2 = k * k

    def flag_bucket(group: pa.Table) -> pa.Table:
        g = group.select([key, "day", "n_events"])
        order = pc.sort_indices(
            g, sort_keys=[(key, "ascending"), ("day", "ascending")])
        g = g.take(order)
        ka = g[key].combine_chunks()
        n = g["n_events"].combine_chunks().to_numpy(zero_copy_only=False)
        m = len(n)
        new_key = np.ones(m, dtype=bool)
        eq = pc.equal(ka.slice(1), ka.slice(0, m - 1))
        new_key[1:] = ~eq.to_numpy(zero_copy_only=False)
        idx = np.arange(m, dtype=np.int64)
        seg_start = np.maximum.accumulate(np.where(new_key, idx, 0))
        pos = idx - seg_start
        # per-segment prefix sums: global cumsum minus the segment
        # start's prior total
        cs = np.concatenate(([0], np.cumsum(n)))
        csq = np.concatenate(([0], np.cumsum(n * n)))
        ok = pos >= W  # full trailing window inside the segment
        i = idx[ok]
        s = cs[i] - cs[i - W]
        q = csq[i] - csq[i - W]
        nn = n[i]
        anom = (W * nn - s) ** 2 > k2 * (W * q - s * s)
        keep = i[anom]
        return pa.table({
            key: ka.take(pa.array(keep, pa.int64())),
            "day": g["day"].combine_chunks().take(pa.array(keep, pa.int64())),
            "n_events": pa.array(n[keep], pa.int64()),
        })

    return dense.map_batches(tag, batch_format="pyarrow",
                             zero_copy_batch=True)\
        .groupby("__bucket").map_groups(flag_bucket, batch_format="pyarrow")


def interval_attribution(points_ds, intervals_ds, *, key: str,
                         point_ts: str, start_ts: str, width_us: int,
                         point_cols: list[str], interval_cols: list[str],
                         n_buckets: int = 256):
    """Many-to-many containment join: each point row matches EVERY
    interval ``[start, start + width_us]`` of the same ``key`` that
    covers it (the ad-attribution / exposure-window pattern — unlike
    :func:`range_join`, overlapping intervals are first-class and every
    cover is emitted, not just the latest).

    One bucketed cogroup shuffle (``hash(key) % n_buckets``) co-locates
    each key's points and intervals; inside a bucket a vectorized acero
    inner join on ``key`` forms per-key candidate pairs which one
    arrow filter cuts to actual covers. Exchange = points + intervals,
    never pairs; the per-key pair blow-up stays inside a worker, so the
    operator holds as long as one key's points × intervals fits in
    memory — salt hot keys upstream. Output columns:
    ``point_cols + interval_cols + [delay_us]``, delay ∈ [0, width].
    """
    from .cogroup import bucket_join

    joined = bucket_join(
        points_ds, intervals_ds, key=key, join_type="inner",
        n_buckets=n_buckets,
    )

    def cover(batch: pa.Table) -> pa.Table:
        delay = pc.subtract(batch[point_ts], batch[start_ts])
        keep = pc.and_(pc.greater_equal(delay, 0),
                       pc.less_equal(delay, width_us))
        out = batch.append_column("delay_us", delay).filter(keep)
        return out.select([*point_cols, *interval_cols, "delay_us"])

    return joined.map_batches(cover, batch_format="pyarrow",
                              zero_copy_batch=True)


def asof_join_forward(
    left_ds,
    right_ds,
    *,
    key: str,
    left_ts: str,
    right_ts: str,
    right_tie: str,
    left_cols: list[str],
    right_cols: list[str],
    n_buckets: int = 256,
):
    """Nearest-NEXT join (inner): for each left row, attach the right
    row with the SMALLEST ``right_ts`` ≥ the left row's ``left_ts``
    within the same key; ties on ``right_ts`` resolve to the smallest
    ``right_tie``. Same int64-only type contract as :func:`asof_join`.

    Implementation: time reversal — negate both timestamp columns and
    the tie column, run the proven backward as-of sweep (greatest
    −ts ≤ −left_ts ⇔ smallest ts ≥ left_ts; greatest −tie ⇔ smallest
    tie), then un-negate. Zero new shuffle machinery; the bucket sweep
    and its measured scale behavior carry over unchanged.
    """
    def neg_cols(ts_col, tie: str | None):
        def f(batch: pa.Table) -> pa.Table:
            cols = {}
            for name in batch.column_names:
                col = batch[name]
                if name == ts_col:
                    col = pc.negate_checked(_epoch_us(col))
                elif tie is not None and name == tie:
                    col = pc.negate_checked(pc.cast(col, pa.int64()))
                cols[name] = col
            return pa.table(cols)
        return f

    out = asof_join(
        left_ds.map_batches(neg_cols(left_ts, None),
                            batch_format="pyarrow", zero_copy_batch=True),
        right_ds.map_batches(neg_cols(right_ts, right_tie),
                             batch_format="pyarrow", zero_copy_batch=True),
        key=key, left_ts=left_ts, right_ts=right_ts, right_tie=right_tie,
        left_cols=left_cols, right_cols=right_cols, n_buckets=n_buckets,
    )

    back = [left_ts, right_ts] + ([right_tie] if right_tie in
                                  (right_cols or []) else [])

    def unneg(batch: pa.Table) -> pa.Table:
        cols = {}
        for name in batch.column_names:
            col = batch[name]
            if name in back:
                col = pc.negate_checked(col)
            cols[name] = col
        return pa.table(cols)

    return out.map_batches(unneg, batch_format="pyarrow",
                           zero_copy_batch=True)


def _lex_insert(hk: np.ndarray, hv: np.ndarray, nk: np.ndarray,
                nv: np.ndarray, side: str) -> np.ndarray:
    """Vectorized lexicographic searchsorted: insertion index of each
    needle (nk, nv) into the haystack sorted by (hk, hv) — computed by
    one union lexsort with a side flag as the tie-break, no per-needle
    Python. side='left' counts haystack rows strictly less; 'right'
    counts rows ≤."""
    n_h = len(hk)
    k = np.concatenate([hk, nk])
    v = np.concatenate([hv, nv])
    if side == "left":
        flag = np.concatenate([np.ones(n_h, np.int8),
                               np.zeros(len(nk), np.int8)])
    else:
        flag = np.concatenate([np.zeros(n_h, np.int8),
                               np.ones(len(nk), np.int8)])
    order = np.lexsort((flag, v, k))
    is_hay = (order < n_h).astype(np.int64)
    hay_upto = np.cumsum(is_hay)
    pos = np.empty(len(order), np.int64)
    pos[order] = np.arange(len(order))
    return hay_upto[pos[n_h:]]  # needles are never hay at their slot


def interval_overlap_join(
    left_ds,
    right_ds,
    *,
    key: str,
    left_lo: str,
    left_hi: str,
    right_lo: str,
    right_hi: str,
    left_cols: list[str],
    right_cols: list[str],
    n_buckets: int = 256,
    validate: bool = False,
):
    """Interval OVERLAP join (the genomics / session-vs-campaign
    pattern): every (left, right) pair within a key whose half-open
    intervals intersect — ``l.lo < r.hi AND r.lo < l.hi`` — plus the
    overlap length in the native units. Distinct from
    :func:`range_join` (point-in-interval).

    PARTITIONING ASSUMPTION (the range_join convention): LEFT intervals
    must be non-overlapping within a key (session windows qualify by
    construction) — then sorting by lo also sorts hi, and each right
    interval's partners form one CONTIGUOUS run of the key's left rows:
    [first l with l.hi > r.lo, first l with l.lo ≥ r.hi). Both bounds
    come from ONE vectorized lexicographic searchsorted over the whole
    bucket (union lexsort — no per-key or per-row Python), and the
    pairs emit via a ragged-arange expansion. ``validate=True`` scans
    each bucket for left overlaps and raises (misuse fails loudly).
    The right side may overlap itself freely.

    Same int64-only type contract as :func:`asof_join`. One bucketed
    cogroup exchange; output is
    (key, left_lo, left_hi, *left_cols, right_lo, right_hi,
    *right_cols, overlap) int64.
    """
    from ..kg.unionfind import hash_bucket

    l_pay = list(left_cols)
    r_pay = list(right_cols)
    out_fields = ([(key, pa.int64()), (left_lo, pa.int64()),
                   (left_hi, pa.int64())]
                  + [(c, pa.int64()) for c in l_pay]
                  + [(right_lo, pa.int64()), (right_hi, pa.int64())]
                  + [(c, pa.int64()) for c in r_pay]
                  + [("overlap", pa.int64())])
    out_schema = pa.schema(out_fields)
    all_pay = ["__lo", "__hi", *l_pay, *r_pay]

    def tag(side_flag: int, lo_col, hi_col, own_pay, other_pay):
        def f(batch: pa.Table) -> pa.Table:
            k = pc.cast(batch[key], pa.int64())
            cols = {
                "__bucket": hash_bucket(k, n_buckets),
                key: k,
                "__side": pa.nulls(batch.num_rows,
                                   pa.int8()).fill_null(side_flag),
                "__lo": _epoch_us(batch[lo_col]),
                "__hi": _epoch_us(batch[hi_col]),
            }
            for c in own_pay:
                cols[c] = pc.cast(batch[c], pa.int64())
            for c in other_pay:
                cols[c] = pa.nulls(batch.num_rows, pa.int64())
            return pa.table(cols)
        return f

    tagged = left_ds.map_batches(
        tag(0, left_lo, left_hi, l_pay, r_pay), batch_format="pyarrow"
    ).union(right_ds.map_batches(
        tag(1, right_lo, right_hi, r_pay, l_pay), batch_format="pyarrow"))

    def resolve(group: pa.Table) -> pa.Table:
        side = group["__side"]
        lt = group.filter(pc.equal(side, 0))
        rt = group.filter(pc.equal(side, 1))
        if lt.num_rows == 0 or rt.num_rows == 0:
            return out_schema.empty_table()
        lorder = pc.sort_indices(lt, sort_keys=[
            (key, "ascending"), ("__lo", "ascending")])
        lt = lt.take(lorder)
        kl = lt[key].combine_chunks().to_numpy(zero_copy_only=False)
        llo = lt["__lo"].combine_chunks().to_numpy(zero_copy_only=False)
        lhi = lt["__hi"].combine_chunks().to_numpy(zero_copy_only=False)
        if validate:
            same = kl[1:] == kl[:-1]
            if bool((same & (llo[1:] < lhi[:-1])).any()):
                raise ValueError(
                    "interval_overlap_join(validate=True): left intervals "
                    "overlap within a key — the contiguous-run bound does "
                    "not hold; de-overlap the left side first")
        kr = rt[key].combine_chunks().to_numpy(zero_copy_only=False)
        rlo = rt["__lo"].combine_chunks().to_numpy(zero_copy_only=False)
        rhi = rt["__hi"].combine_chunks().to_numpy(zero_copy_only=False)
        start = _lex_insert(kl, lhi, kr, rlo, "right")  # first lhi > rlo
        stop = _lex_insert(kl, llo, kr, rhi, "left")    # first llo >= rhi
        counts = np.maximum(stop - start, 0)
        total = int(counts.sum())
        if total == 0:
            return out_schema.empty_table()
        r_idx = np.repeat(np.arange(len(kr), dtype=np.int64), counts)
        cs = np.cumsum(counts)
        offs = (np.arange(total, dtype=np.int64)
                - np.repeat(cs - counts, counts))
        l_idx = np.repeat(start, counts) + offs
        li = pa.array(l_idx)
        ri = pa.array(r_idx)
        cols = {
            key: pa.array(kl[l_idx]),
            left_lo: pa.array(llo[l_idx]),
            left_hi: pa.array(lhi[l_idx]),
        }
        for c in l_pay:
            cols[c] = lt[c].combine_chunks().take(li)
        cols[right_lo] = pa.array(rlo[r_idx])
        cols[right_hi] = pa.array(rhi[r_idx])
        for c in r_pay:
            cols[c] = rt[c].combine_chunks().take(ri)
        cols["overlap"] = pa.array(
            np.minimum(lhi[l_idx], rhi[r_idx])
            - np.maximum(llo[l_idx], rlo[r_idx]))
        return pa.table(cols).cast(out_schema)

    return tagged.groupby("__bucket").map_groups(
        resolve, batch_format="pyarrow")
