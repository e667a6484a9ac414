"""Distributed semi-join and anti-join as first-class operators.

Ray Data's native ``join`` covers inner/outer equi-joins; existence
filtering (EXISTS / NOT EXISTS) is cheaper than a full join because the
probe side never ships payload — only the key — and the output carries
no right-side columns. Two execution strategies:

* **cogroup** (default, both sides large): tag each side, union, ONE
  hash shuffle on the key, and per-group emit the left rows iff a right
  row is (semi) / is not (anti) present. No driver state, no broadcast;
  scales to any key cardinality.
* **broadcast** (`broadcast_threshold`): when the right side's DISTINCT
  keys fit comfortably in the object store, collect them once
  (``ray.put``) and filter map-side with ``pc.is_in`` — zero shuffles.
  The caller opts in by passing a threshold because only the caller
  knows the key-domain bound; the operator probes the distinct count
  first and falls back to cogroup above it.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _cogroup_exists(left_ds, right_ds, key: str, *, keep_if_exists: bool,
                    left_schema=None, right_schema=None):
    """EXISTS/NOT-EXISTS via ONE bucketed cogroup shuffle: keys hash
    into ~256 buckets and a vectorized acero left-semi/left-anti join
    runs inside each bucket — group dispatch stays at n_buckets
    regardless of key cardinality (a per-key ``groupby(key).map_groups``
    would cost one Python call per distinct customer/url). The right
    side ships only per-batch-distinct keys (the semi-join combiner).
    Pass schemas when a side may arrive all-empty (map_batches over an
    empty Dataset loses the schema)."""
    from .cogroup import bucket_join

    return bucket_join(
        left_ds,
        right_ds.select_columns([key]),
        key=key,
        join_type="left semi" if keep_if_exists else "left anti",
        right_distinct=True,
        left_schema=left_schema,
        right_schema=right_schema,
    )


def _distinct_keys(right_ds, key: str):
    def pre(batch: pa.Table) -> pa.Table:
        return batch.select([key]).group_by([key]).aggregate([])

    return right_ds.map_batches(pre, batch_format="pyarrow").groupby(key).count()


def _broadcast_filter(left_ds, keys: pa.Array, *, key: str, keep_if_in: bool):
    import ray

    keys_ref = ray.put(keys)

    def filt(batch: pa.Table) -> pa.Table:
        mask = pc.is_in(batch[key], value_set=ray.get(keys_ref))
        if not keep_if_in:
            mask = pc.invert(mask)
        return batch.filter(mask)

    return left_ds.map_batches(filt, batch_format="pyarrow", zero_copy_batch=True)


def _try_broadcast_keys(left_ds, right_ds, key: str, threshold: int):
    """Distinct right keys as one Arrow array if ≤ threshold, else None.
    The collection is bounded by the caller's threshold by construction."""
    if threshold <= 0:
        return None
    distinct = _distinct_keys(right_ds, key).materialize()
    if distinct.count() > threshold:
        return None
    key_type = left_ds.schema().types[left_ds.schema().names.index(key)]
    chunks = [b[key] for b in distinct.iter_batches(batch_format="pyarrow")]
    return pa.chunked_array(chunks or [pa.array([], key_type)]).combine_chunks()


def broadcast_lookup(left_ds, right_table: pa.Table, key: str, *,
                     right_key: str | None = None,
                     columns: list[str] | None = None):
    """Map-side dimension join: ``right_table`` (a SMALL driver-side
    Arrow table — nation/region/customer-name scale) is put in the
    object store ONCE and every batch attaches its columns via a
    vectorized Arrow hash join. Zero shuffles; the left side streams.
    Use Ray Data's native ``Dataset.join`` when the right side is big.
    """
    import ray

    rk = right_key or key
    cols = columns or [c for c in right_table.column_names if c != rk]
    small = right_table.select([rk, *cols])
    if rk != key:
        small = small.rename_columns([key, *cols])
    ref = ray.put(small)

    def attach(batch: pa.Table) -> pa.Table:
        dim = ray.get(ref)
        return batch.join(dim, keys=[key], join_type="left outer")

    return left_ds.map_batches(attach, batch_format="pyarrow", zero_copy_batch=True)


def semi_join(left_ds, right_ds, key: str, *, broadcast_threshold: int = 0):
    """left rows whose ``key`` EXISTS in right. ``broadcast_threshold``:
    if > 0 and right's distinct keys are at most that many, use the
    zero-shuffle broadcast path."""
    keys = _try_broadcast_keys(left_ds, right_ds, key, broadcast_threshold)
    if keys is not None:
        return _broadcast_filter(left_ds, keys, key=key, keep_if_in=True)
    return _cogroup_exists(left_ds, right_ds, key, keep_if_exists=True)


def anti_join(left_ds, right_ds, key: str, *, broadcast_threshold: int = 0):
    """left rows whose ``key`` does NOT EXIST in right (NOT EXISTS)."""
    keys = _try_broadcast_keys(left_ds, right_ds, key, broadcast_threshold)
    if keys is not None:
        return _broadcast_filter(left_ds, keys, key=key, keep_if_in=False)
    return _cogroup_exists(left_ds, right_ds, key, keep_if_exists=False)


def _bloom_positions(arr, m_bits: int, k: int) -> np.ndarray:
    """(n, k) uint64 bloom bit positions per value — double hashing
    ``(h1 + i·h2) mod m`` over two independent vectorized hashes.
    Integer keys: two splitmix64 finalizer passes with distinct seed
    xors (all numpy uint64, no per-row Python). String keys: polars'
    vectorized xxhash at two seeds. Consistency is only required
    WITHIN a run (build and probe use this same function); the join
    result never depends on the bloom contents because positives are
    exactly verified."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()

    def _mix(x: np.ndarray) -> np.ndarray:
        x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return x ^ (x >> np.uint64(31))

    if pa.types.is_integer(arr.type):
        x = pc.cast(arr, pa.int64()).to_numpy(zero_copy_only=False).astype(np.uint64)
        h1 = _mix(x ^ np.uint64(0x9E3779B97F4A7C15))
        h2 = _mix(x ^ np.uint64(0xC2B2AE3D27D4EB4F))
    else:
        import polars as pl

        s = pl.Series(arr.cast(pa.string()))
        h1 = s.hash(seed=1).to_numpy().astype(np.uint64)
        h2 = s.hash(seed=2).to_numpy().astype(np.uint64)
    h2 = h2 | np.uint64(1)  # odd stride so all k probes differ
    ks = np.arange(k, dtype=np.uint64)[None, :]
    return (h1[:, None] + ks * h2[:, None]) & np.uint64(m_bits - 1)


def build_bloom(right_ds, key: str, *, m_bits: int = 1 << 23, k: int = 4,
                batch_size: int = 1 << 20) -> np.ndarray:
    """Distributed bloom-filter build over ``right_ds[key]`` → one
    ``m_bits/64``-word uint64 bitmap on the driver (1 MiB at the
    default m=2^23 — broadcastable however many keys it summarizes).

    Scale shape: each map task folds up to ``batch_size`` keys into ONE
    fixed-size partial bitmap row, so partial count = ceil(rows / 2^20)
    (10^9 right keys → ~1k MiB-sized partials), then a two-level
    ``repartition`` tree OR-folds them — no driver loop over blocks,
    no shuffle of the right side itself. m_bits must be a power of two;
    size it ≥ ~8 bits/distinct key for a ~2.5% FP rate at k=4 (FPs
    only cost verify work, never correctness)."""
    words = m_bits // 64

    def partial(batch: pa.Table) -> pa.Table:
        w = np.zeros(words, np.uint64)
        if batch.num_rows:
            pos = _bloom_positions(batch[key], m_bits, k).ravel()
            np.bitwise_or.at(w, pos >> 6, np.uint64(1) << (pos & np.uint64(63)))
        return pa.table({"w": pa.array([w.tobytes()], pa.binary())})

    def orfold(batch: pa.Table) -> pa.Table:
        acc = np.zeros(words, np.uint64)
        for buf in batch["w"].to_pylist():
            acc |= np.frombuffer(buf, np.uint64)
        return pa.table({"w": pa.array([acc.tobytes()], pa.binary())})

    folded = (
        right_ds.map_batches(partial, batch_format="pyarrow",
                             batch_size=batch_size, zero_copy_batch=True)
        .repartition(8)
        .map_batches(orfold, batch_format="pyarrow", batch_size=None)
        .repartition(1)
        .map_batches(orfold, batch_format="pyarrow", batch_size=None)
    )
    rows = folded.take_all()  # exactly one fixed-size row by construction
    if not rows:
        return np.zeros(words, np.uint64)
    return np.frombuffer(rows[0]["w"], np.uint64).copy()


def _bloom_mask(batch: pa.Table, key: str, bloom: np.ndarray, k: int) -> np.ndarray:
    m_bits = len(bloom) * 64
    pos = _bloom_positions(batch[key], m_bits, k)
    hit = (bloom[pos >> 6] >> (pos & np.uint64(63))) & np.uint64(1)
    return hit.all(axis=1)


def _sized_m_bits(n_rows: int) -> int:
    """next_pow2(10 × rows), floor 2^13 — ~1% FP at k=4. Row count is
    an upper bound on distinct keys, so FP can only come out better.
    Used for the SECOND (positive-slice) bloom in the two-sided
    prefilter joins: callers size the primary ``m_bits`` to the RIGHT
    key count, so reusing it for the left slice saturates whenever the
    slice is larger — exactness survives but the advertised shuffle
    reduction silently disappears (ADVICE r3). The slice is
    materialized, so its size is known and free."""
    import math

    return 1 << max(13, math.ceil(math.log2(10 * max(n_rows, 1))))


def bloom_semi_join(left_ds, right_ds, key: str, *, m_bits: int = 1 << 23,
                    k: int = 4, prefilter_right: bool = False):
    """EXACT semi-join with a map-side bloom prefilter — the
    large-large EXISTS pattern: when the right side's distinct keys are
    too many to broadcast exactly (``broadcast_threshold`` path) but
    left rows mostly DON'T match, a 1 MiB bloom summary of the right
    keys broadcasts once and eliminates most left rows before any
    exchange; only bloom-positives (true matches + FPs) enter the
    exact cogroup semi-join that removes the false positives. Output is
    bit-identical to ``semi_join`` — the bloom affects only how many
    rows reach the verify exchange, e.g. a 1% match rate cuts the
    left-side shuffle ~97%.

    SIZE ``m_bits`` TO THE RIGHT KEY COUNT (~10 bits/key; see
    bloom_anti_join — the 1 MiB default saturates near 10M keys and
    stops filtering). ``prefilter_right=True`` mirrors the anti-join's
    two-sided trick: a second bloom over the (materialized) surviving
    left slice filters the right side map-side before the verify, so
    neither side ships at corpus order; a right row wrongly kept is
    removed by the exact cogroup, and one wrongly dropped could only
    have matched a left row the first bloom already rejected."""
    import ray

    bloom_ref = ray.put(build_bloom(right_ds, key, m_bits=m_bits, k=k))

    def filt(batch: pa.Table) -> pa.Table:
        if not batch.num_rows:
            return batch
        return batch.filter(pa.array(_bloom_mask(batch, key, ray.get(bloom_ref), k)))

    survivors = left_ds.map_batches(filt, batch_format="pyarrow",
                                    zero_copy_batch=True)
    verify_right = right_ds
    ls = rs = None
    if prefilter_right:
        ls = pa.schema(list(zip(left_ds.schema().names,
                                left_ds.schema().types)))
        r_sch = right_ds.schema()
        rs = pa.schema([(key, dict(zip(r_sch.names, r_sch.types))[key])])
        survivors = survivors.materialize()
        pos_bloom = ray.put(build_bloom(
            survivors, key, m_bits=_sized_m_bits(survivors.count()), k=k))

        def rfilt(batch: pa.Table) -> pa.Table:
            if not batch.num_rows:
                return batch
            return batch.filter(
                pa.array(_bloom_mask(batch, key, ray.get(pos_bloom), k)))

        verify_right = right_ds.map_batches(rfilt, batch_format="pyarrow",
                                            zero_copy_batch=True)
    return _cogroup_exists(survivors, verify_right, key, keep_if_exists=True,
                           left_schema=ls, right_schema=rs)


def bloom_anti_join(left_ds, right_ds, key: str, *, m_bits: int = 1 << 23,
                    k: int = 4, prefilter_right: bool = False):
    """EXACT anti-join with a map-side bloom prefilter: bloom-NEGATIVE
    rows are definitively absent from the right side (no false
    negatives) and stream straight to the output with zero exchange;
    only the bloom-positive slice needs the exact cogroup anti-join to
    reject the false positives. NOTE: the two filters are two
    consumers of ``left_ds`` — Ray re-executes the upstream read per
    consumer (cheap, column-pruned) rather than materializing it.

    SIZE ``m_bits`` TO THE RIGHT KEY COUNT: the default 1 MiB bitmap
    holds ~2^20 keys at ~2.5% FP; at 10M keys it saturates (~97% FP)
    and the "prefilter" passes nearly everything to the exact verify —
    measured as exactly this failure before negative_samples sized it.
    Rule of thumb: m_bits ≈ next_pow2(10 × right_keys), k=4 → ~1% FP.

    ``prefilter_right=True`` adds the symmetric trick for LARGE right
    sides: the bloom-positive left slice is materialized, a second
    bloom summarizing ITS keys broadcasts, and the right side is
    bloom-filtered map-side before the verify cogroup — so the verify
    exchange carries the (tiny) positive slice plus only right rows
    that match it, never the full right side. Output is bit-identical
    either way (a right row wrongly dropped by the second bloom could
    only have matched a left row that isn't there; any false KEEP is
    removed by the exact cogroup)."""
    import ray

    bloom_ref = ray.put(build_bloom(right_ds, key, m_bits=m_bits, k=k))

    def split(keep_positive: bool):
        def filt(batch: pa.Table) -> pa.Table:
            if not batch.num_rows:
                return batch
            mask = _bloom_mask(batch, key, ray.get(bloom_ref), k)
            return batch.filter(pa.array(mask if keep_positive else ~mask))

        return left_ds.map_batches(filt, batch_format="pyarrow",
                                   zero_copy_batch=True)

    certain = split(False)
    positives = split(True)
    verify_right = right_ds
    ls = rs = None
    if prefilter_right:
        # schemas captured BEFORE filtering: an all-filtered side loses
        # its schema and the verify cogroup could no longer infer it
        ls = pa.schema(list(zip(left_ds.schema().names,
                                left_ds.schema().types)))
        r_sch = right_ds.schema()
        rs = pa.schema([(key, dict(zip(r_sch.names, r_sch.types))[key])])
        positives = positives.materialize()
        pos_bloom = ray.put(build_bloom(
            positives, key, m_bits=_sized_m_bits(positives.count()), k=k))

        def rfilt(batch: pa.Table) -> pa.Table:
            if not batch.num_rows:
                return batch
            return batch.filter(
                pa.array(_bloom_mask(batch, key, ray.get(pos_bloom), k)))

        verify_right = right_ds.map_batches(rfilt, batch_format="pyarrow",
                                            zero_copy_batch=True)
    checked = _cogroup_exists(positives, verify_right, key,
                              keep_if_exists=False, left_schema=ls,
                              right_schema=rs)
    return certain.union(checked)


def fuzzy_join(ds, probe_tbl: pa.Table, *, text_col: str, id_col: str,
               probe_text_col: str, probe_id_col: str,
               threshold: tuple[int, int] = (1, 3)):
    """Fuzzy string join (entity matching): every left row is matched
    against a SMALL probe table by token-set Jaccard similarity —
    keep pairs with ``jaccard ≥ a/b`` where ``threshold=(a, b)``; the
    predicate is evaluated as the exact integer comparison
    ``b·|∩| ≥ a·|∪|`` (no float threshold edge), and the reported
    ``jac6`` is one IEEE division from exact ints rounded to 6 dp.
    Output: (id, probe_id, i, u, jac6).

    Scale shape: the probe table broadcasts ONCE (``ray.put``); each
    map task builds a token→probe inverted index from it (tiny) and
    probes candidates by token lookup, so a left row is compared only
    against probes sharing ≥1 token — never all probes, and the corpus
    never shuffles. PROBE-BOUNDED CONTRACT: probe_tbl must fit in one
    object (entity catalogs, benchmark lists); for large-large fuzzy
    joins use minhash-LSH blocking (ops/dedup.py) across the union of
    both sides instead.

    Tokenization is the shared ASCII/RE2 whitespace class, lowercased,
    deduplicated — mirrored verbatim by the SQL oracle.
    """
    import ray

    from ..kg.resources import broadcast, resolve
    from ..textnorm import ascii_words

    a, b = threshold

    def tokset(t: str | None) -> frozenset:
        return frozenset(ascii_words((t or "").lower()))

    probes = [
        (pid, tokset(pt))
        for pid, pt in zip(probe_tbl[probe_id_col].to_pylist(),
                           probe_tbl[probe_text_col].to_pylist())
    ]
    try:
        probes_ref = broadcast(probes)
    except Exception:
        probes_ref = probes

    def match(batch: pa.Table) -> pa.Table:
        ps = resolve(probes_ref)
        index: dict = {}
        for j, (_, toks) in enumerate(ps):
            for w in toks:
                index.setdefault(w, []).append(j)
        out_id, out_pid, out_i, out_u = [], [], [], []
        for rid, t in zip(batch[id_col].to_pylist(),
                          batch[text_col].to_pylist()):
            toks = tokset(t)
            cand = set()
            for w in toks:
                cand.update(index.get(w, ()))
            for j in sorted(cand):
                pid, ptoks = ps[j]
                i = len(toks & ptoks)
                u = len(toks | ptoks)
                if b * i >= a * u:
                    out_id.append(rid)
                    out_pid.append(pid)
                    out_i.append(i)
                    out_u.append(u)
        jac = pc.round(
            pa.array(np.array(out_i, np.float64)
                     / np.array(out_u, np.float64)
                     if out_i else [], pa.float64()),
            ndigits=6, round_mode="half_towards_infinity")
        return pa.table({
            id_col: pa.array(out_id, pa.int64()),
            probe_id_col: pa.array(out_pid, pa.int64()),
            "i": pa.array(out_i, pa.int64()),
            "u": pa.array(out_u, pa.int64()),
            "jac6": jac,
        })

    return ds.map_batches(match, batch_format="pyarrow",
                          zero_copy_batch=True)


def broadcast_interval_lookup(left_ds, intervals: pa.Table, value_col: str,
                              *, lo_col: str = "lo", hi_col: str = "hi",
                              n_cols: list[str] | None = None):
    """Map-side INTERVAL join (the IP-geolocation / price-tier
    pattern): each left row's ``value_col`` is matched to the catalog
    interval with ``lo ≤ v < hi``; rows matching no interval get null
    attributes. ``intervals`` is a SMALL driver-side table whose
    intervals must be non-overlapping (validated here, sorted by lo).

    Zero shuffles: the sorted (lo, hi, *attrs) vectors broadcast once
    (``ray.put``); per batch ONE ``searchsorted`` against the lo
    column + an in-bounds check resolves every row — no per-row
    dispatch, no BETWEEN join exchange. The left side streams.
    """
    import ray

    order = pc.sort_indices(intervals, sort_keys=[(lo_col, "ascending")])
    s = intervals.take(order)
    lo = s[lo_col].to_numpy(zero_copy_only=False)
    hi = s[hi_col].to_numpy(zero_copy_only=False)
    if (hi[:-1] > lo[1:]).any() if len(lo) > 1 else False:
        raise ValueError("broadcast_interval_lookup: intervals overlap")
    attrs = n_cols or [c for c in s.column_names if c not in (lo_col, hi_col)]
    ref = ray.put((lo, hi, {c: s[c] for c in attrs}))

    def attach(batch: pa.Table) -> pa.Table:
        lo_, hi_, att = ray.get(ref)
        import numpy as np

        v = batch[value_col].combine_chunks().to_numpy(zero_copy_only=False)
        idx = np.searchsorted(lo_, v, side="right") - 1
        safe = np.clip(idx, 0, max(len(lo_) - 1, 0))
        ok = (idx >= 0) & (len(lo_) > 0)
        if len(lo_):
            ok &= v < hi_[safe]
        out = batch
        mask = pa.array(~ok)
        for c in attrs:
            col = att[c].take(pa.array(safe, pa.int64()))
            if hasattr(col, "combine_chunks"):
                col = col.combine_chunks()
            col = pc.if_else(mask, pa.scalar(None, col.type), col)
            out = out.append_column(c, col)
        return out

    return left_ds.map_batches(attach, batch_format="pyarrow",
                               zero_copy_batch=True)


def join_size_profile(left_ds, right_ds, *, left_key: str, right_key: str):
    """EXACT join-size profile without materializing the join — the
    exact counterpart of the HLL overlap sketch
    (:func:`~kgrecrun.ops.stats.hll_overlap`): |A ⋈ B| =
    Σ_k cnt_A(k)·cnt_B(k), computed from per-key COUNT partials only.
    The planner's "would this join explode?" check: exchange carries
    one (key, count) row per distinct key per block — never the rows —
    and the per-key product also exposes the worst skew key.

    Output: one row (join_rows, matched_keys, left_keys, right_keys,
    max_key_rows) — all exact int64 (max_key_rows = the largest single
    key's contribution, the skew headline).
    """

    def partial_for(key, a, b):
        def partial(batch: pa.Table) -> pa.Table:
            t = pa.table({
                "k": pc.cast(batch[key], pa.int64()),
                "a": pa.nulls(batch.num_rows, pa.int64()).fill_null(a),
                "b": pa.nulls(batch.num_rows, pa.int64()).fill_null(b),
            })
            g = t.group_by("k").aggregate([("a", "sum"), ("b", "sum")])
            return g.rename_columns(["k", "a", "b"])
        return partial

    merged = (left_ds.map_batches(partial_for(left_key, 1, 0),
                                  batch_format="pyarrow",
                                  zero_copy_batch=True)
              .union(right_ds.map_batches(partial_for(right_key, 0, 1),
                                          batch_format="pyarrow",
                                          zero_copy_batch=True))
              .groupby("k").sum(["a", "b"]))

    def local(batch: pa.Table) -> pa.Table:
        a = batch["sum(a)"].combine_chunks().to_numpy(zero_copy_only=False)
        b = batch["sum(b)"].combine_chunks().to_numpy(zero_copy_only=False)
        prod = a * b
        return pa.table({
            "join_rows": pa.array([int(prod.sum())], pa.int64()),
            "matched_keys": pa.array([int(((a > 0) & (b > 0)).sum())],
                                     pa.int64()),
            "left_keys": pa.array([int((a > 0).sum())], pa.int64()),
            "right_keys": pa.array([int((b > 0).sum())], pa.int64()),
            "max_key_rows": pa.array(
                [int(prod.max()) if len(prod) else 0], pa.int64()),
        })

    def fold(t: pa.Table) -> pa.Table:
        return pa.table({
            "join_rows": pa.array([pc.sum(t["join_rows"]).as_py() or 0],
                                  pa.int64()),
            "matched_keys": pa.array(
                [pc.sum(t["matched_keys"]).as_py() or 0], pa.int64()),
            "left_keys": pa.array([pc.sum(t["left_keys"]).as_py() or 0],
                                  pa.int64()),
            "right_keys": pa.array([pc.sum(t["right_keys"]).as_py() or 0],
                                   pa.int64()),
            "max_key_rows": pa.array(
                [pc.max(t["max_key_rows"]).as_py() or 0], pa.int64()),
        })

    return (merged.map_batches(local, batch_format="pyarrow",
                               zero_copy_batch=True)
            .repartition(1).map_batches(fold, batch_format="pyarrow"))
