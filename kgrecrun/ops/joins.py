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


def _cogroup_exists(left_ds, right_ds, key: str, *, keep_if_exists: bool):
    """EXISTS/NOT-EXISTS via ONE bucketed cogroup shuffle: keys hash
    into ~256 buckets and a vectorized acero left-semi/left-anti join
    runs inside each bucket — group dispatch stays at n_buckets
    regardless of key cardinality (a per-key ``groupby(key).map_groups``
    would cost one Python call per distinct customer/url). The right
    side ships only per-batch-distinct keys (the semi-join combiner)."""
    from .cogroup import bucket_join

    return bucket_join(
        left_ds,
        right_ds.select_columns([key]),
        key=key,
        join_type="left semi" if keep_if_exists else "left anti",
        right_distinct=True,
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
