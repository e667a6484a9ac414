"""EXACT all-pairs set-similarity self-join (AllPairs/PPJoin-style
prefix filtering) — every document pair whose k-shingle-set Jaccard
meets a rational threshold, with NO false negatives (the exact
counterpart of the minhash/ngram LSH dedup family: those trade recall
for fewer candidates; this prunes candidates provably losslessly).

Algorithm (Bayardo et al. "Scaling Up All Pairs Similarity Search",
Xiao et al. PPJoin — public literature):

1. Each doc's distinct shingle set becomes ONE sorted uint64-hash array
   (md5-derived), carried as a binary payload; shingle rows re-derive
   from it by a vectorized explode — text is read once and never
   shuffles.
2. Global shingle document-frequency via a native groupby-count; one
   bucketed join attaches df to every shingle row. Tokens are ordered
   by (df, h) — rarest first (the ordering needs no dense global rank:
   the (df, h) key itself is the order).
3. Per doc, only the PREFIX — the first ``n − ceil(t·n) + 1`` tokens in
   (df, h) order — is emitted as (token, doc, n) candidate-generation
   rows (one bucketed cogroup on doc id; per-doc positions via a
   vectorized segment sweep). Prefix theorem: any pair with Jaccard ≥ t
   (and |a| ≥ t·|b|) shares at least one prefix token, so pruning loses
   nothing.
4. Candidate pairs: within each token group, ALL C(s,2) pairs via a
   ragged-arange sweep (vectorized; no window truncation — exactness
   bars the LSH family's windowed sweep), length-filtered
   (min·den ≥ num·max), then a native distinct.
5. Verification: two bucketed joins attach both sorted hash arrays to
   each candidate; ``np.intersect1d`` on the sorted arrays gives the
   exact intersection; keep pairs with inter·den ≥ num·union.

Scale shape: seven narrow exchanges, none carrying text; candidate
volume is prefix-pruned (prefix tokens are each doc's RAREST, so group
sizes track low dfs). SKEW NOTE: data where the answer itself is
quadratic (everything similar to everything) produces quadratic
candidates — that is the query's output size, not an engine artifact;
a native groupby-count over the prefix table (the
``oversized_band_count`` pattern in ops/dedup.py) makes hot prefix
tokens measurable before running step 4.

Output: (a, b, inter, uni) with a < b, both int64 counts — the
consumer forms jaccard = inter/uni; integer counts keep the result
bit-identical across layouts and SQL-checkable.

The module's second exact string-similarity join, :func:`edit1_join`,
covers the edit-distance-≤1 regime via FastSS deletion neighborhoods
(see its docstring).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

VERIFY_BUCKETS = 256


def _shingle_hashes(text: str, k: int) -> np.ndarray:
    from ..textnorm import ascii_words

    ws = ascii_words((text or "").lower())
    if len(ws) < k:
        # short doc: the whole token sequence is its one shingle
        segs = [" ".join(ws)] if ws else []
    else:
        segs = [" ".join(ws[i:i + k]) for i in range(len(ws) - k + 1)]
    hs = {
        int.from_bytes(hashlib.md5(s.encode("utf-8")).digest()[:8],
                       "little") & 0x7FFFFFFFFFFFFFFF
        for s in segs
    }
    return np.sort(np.fromiter(hs, dtype=np.int64, count=len(hs)))


def _ragged_arange(counts: np.ndarray) -> np.ndarray:
    """[2, 0, 3] → [1, 2, 1, 2, 3] (1-based arange per count)."""
    total = int(counts.sum())
    if total == 0:
        return np.empty(0, dtype=np.int64)
    cs = np.cumsum(counts)
    return (np.arange(total, dtype=np.int64)
            - np.repeat(cs - counts, counts) + 1)


def allpairs_jaccard_join(docs_ds, *, threshold_num: int = 1,
                          threshold_den: int = 2, shingle_k: int = 3,
                          text_col: str = "text", id_col: str = "doc_id",
                          n_buckets: int = VERIFY_BUCKETS):
    """All doc pairs with k-shingle-set Jaccard ≥ threshold_num /
    threshold_den (a rational, compared in exact integer arithmetic).
    Returns (a, b, inter, uni); see module docstring for the shape."""
    from ..kg.unionfind import hash_bucket
    from .cogroup import bucket_join

    num, den = int(threshold_num), int(threshold_den)

    def make_sets(batch: pa.Table) -> pa.Table:
        ids, ns, pays = [], [], []
        for did, t in zip(batch[id_col].to_pylist(),
                          batch[text_col].to_pylist()):
            hs = _shingle_hashes(t, shingle_k)
            if len(hs) == 0:
                continue
            ids.append(did)
            ns.append(len(hs))
            pays.append(hs.tobytes())
        return pa.table({
            id_col: pa.array(ids, pa.int64()),
            "n": pa.array(ns, pa.int64()),
            "pay": pa.array(pays, pa.binary()),
        })

    sets = docs_ds.map_batches(make_sets, batch_format="pyarrow",
                               zero_copy_batch=True,
                               batch_size=256).materialize()

    def explode(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64()),
                             "h": pa.array([], pa.int64())})
        ns = batch["n"].to_numpy(zero_copy_only=False)
        flat = np.frombuffer(
            b"".join(batch["pay"].to_pylist()), dtype=np.int64)
        return pa.table({
            id_col: pa.array(np.repeat(
                batch[id_col].to_numpy(zero_copy_only=False), ns)),
            "n": pa.array(np.repeat(ns, ns)),
            "h": pa.array(flat),
        })

    sh = sets.map_batches(explode, batch_format="pyarrow")

    df = sh.map_batches(
        lambda b: b.select(["h"]), batch_format="pyarrow"
    ).groupby("h").count().map_batches(
        lambda b: b.rename_columns(["h", "df"]), batch_format="pyarrow")

    sh_df = bucket_join(
        sh, df, key="h", n_buckets=n_buckets,
        left_schema=pa.schema([(id_col, pa.int64()), ("n", pa.int64()),
                               ("h", pa.int64())]),
        right_schema=pa.schema([("h", pa.int64()), ("df", pa.int64())]),
    )

    # per-doc prefix: first n - ceil(t*n) + 1 rows in (df, h) order —
    # one bucketed cogroup on doc id, positions via a segment sweep
    def tag_doc(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "__bucket",
            hash_bucket(batch[id_col].combine_chunks(), n_buckets))

    def prefix_rows(group: pa.Table) -> pa.Table:
        order = pc.sort_indices(group, sort_keys=[
            (id_col, "ascending"), ("df", "ascending"), ("h", "ascending")])
        g = group.take(order)
        ids = g[id_col].combine_chunks().to_numpy(zero_copy_only=False)
        ns = g["n"].combine_chunks().to_numpy(zero_copy_only=False)
        m = len(ids)
        new = np.ones(m, dtype=bool)
        new[1:] = ids[1:] != ids[:-1]
        seg_start = np.maximum.accumulate(
            np.where(new, np.arange(m, dtype=np.int64), 0))
        pos = np.arange(m, dtype=np.int64) - seg_start  # 0-based in doc
        plen = ns - (num * ns + den - 1) // den + 1  # n - ceil(t n) + 1
        keep = pos < plen
        return pa.table({
            "band_key": g["h"].combine_chunks().filter(pa.array(keep)),
            id_col: pa.array(ids[keep]),
            "n": pa.array(ns[keep]),
        })

    prefixes = (sh_df.map_batches(tag_doc, batch_format="pyarrow")
                .groupby("__bucket")
                .map_groups(prefix_rows, batch_format="pyarrow"))

    # exact candidate pairs per token group (ragged all-pairs sweep)
    def tag_tok(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "__bucket",
            hash_bucket(batch["band_key"].combine_chunks(), n_buckets))

    pair_schema = pa.schema([("src", pa.int64()), ("dst", pa.int64())])

    def pairs_sweep(group: pa.Table) -> pa.Table:
        order = pc.sort_indices(group, sort_keys=[
            ("band_key", "ascending"), (id_col, "ascending")])
        g = group.take(order)
        bk = g["band_key"].combine_chunks().to_numpy(zero_copy_only=False)
        ids = g[id_col].combine_chunks().to_numpy(zero_copy_only=False)
        ns = g["n"].combine_chunks().to_numpy(zero_copy_only=False)
        m = len(bk)
        new = np.ones(m, dtype=bool)
        new[1:] = bk[1:] != bk[:-1]
        seg_start = np.maximum.accumulate(
            np.where(new, np.arange(m, dtype=np.int64), 0))
        preds = np.arange(m, dtype=np.int64) - seg_start  # pairs per row
        offs = _ragged_arange(preds)
        if len(offs) == 0:
            return pair_schema.empty_table()
        hi = np.repeat(np.arange(m, dtype=np.int64), preds)
        lo = hi - offs
        a, b = ids[lo], ids[hi]
        na, nb = ns[lo], ns[hi]
        mn, mx = np.minimum(na, nb), np.maximum(na, nb)
        keep = (a != b) & (mn * den >= num * mx)  # length filter
        a, b = a[keep], b[keep]
        src, dst = np.minimum(a, b), np.maximum(a, b)
        out = pa.table({"src": pa.array(src), "dst": pa.array(dst)})
        return out.group_by(["src", "dst"]).aggregate([])

    cands = (prefixes.map_batches(tag_tok, batch_format="pyarrow")
             .groupby("__bucket")
             .map_groups(pairs_sweep, batch_format="pyarrow")
             # global distinct: the same pair can emerge from several
             # shared prefix tokens in different buckets
             .groupby(["src", "dst"]).count()
             .map_batches(lambda b: (
                 b.rename_columns(["src", "dst", "cnt"])
                 .select(["src", "dst"])
                 if b.num_columns >= 2 else pair_schema.empty_table()),
                 batch_format="pyarrow"))

    # attach both payloads, verify exactly
    a_side = sets.map_batches(
        lambda b: pa.table({"src": b[id_col], "pay_a": b["pay"]}),
        batch_format="pyarrow")
    c1 = bucket_join(
        cands, a_side, key="src", n_buckets=n_buckets,
        left_schema=pair_schema,
        right_schema=pa.schema([("src", pa.int64()),
                                ("pay_a", pa.binary())]))
    b_side = sets.map_batches(
        lambda b: pa.table({"dst": b[id_col], "pay_b": b["pay"]}),
        batch_format="pyarrow")
    c2 = bucket_join(
        c1, b_side, key="dst", n_buckets=n_buckets,
        left_schema=pa.schema([("src", pa.int64()), ("dst", pa.int64()),
                               ("pay_a", pa.binary())]),
        right_schema=pa.schema([("dst", pa.int64()),
                                ("pay_b", pa.binary())]))

    out_schema = pa.schema([("a", pa.int64()), ("b", pa.int64()),
                            ("inter", pa.int64()), ("uni", pa.int64())])

    def verify(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return out_schema.empty_table()
        pa_list = batch["pay_a"].to_pylist()
        pb_list = batch["pay_b"].to_pylist()
        inter = np.empty(len(pa_list), dtype=np.int64)
        uni = np.empty(len(pa_list), dtype=np.int64)
        for i, (ba, bb) in enumerate(zip(pa_list, pb_list)):
            xa = np.frombuffer(ba, dtype=np.int64)
            xb = np.frombuffer(bb, dtype=np.int64)
            k = len(np.intersect1d(xa, xb, assume_unique=True))
            inter[i] = k
            uni[i] = len(xa) + len(xb) - k
        keep = inter * den >= num * uni
        return pa.table({
            "a": batch["src"].combine_chunks().filter(pa.array(keep)),
            "b": batch["dst"].combine_chunks().filter(pa.array(keep)),
            "inter": pa.array(inter[keep]),
            "uni": pa.array(uni[keep]),
        }).cast(out_schema)

    return c2.map_batches(verify, batch_format="pyarrow")


def _dist_le1(a: str, b: str) -> bool:
    """Exact Levenshtein ≤ 1 for the verify step (O(len), early exit)."""
    la, lb = len(a), len(b)
    if abs(la - lb) > 1:
        return False
    if la == lb:
        return sum(x != y for x, y in zip(a, b)) <= 1
    if la < lb:
        a, b, la, lb = b, a, lb, la
    # a is longer by one: one deletion must align the rest
    i = 0
    while i < lb and a[i] == b[i]:
        i += 1
    return a[i + 1:] == b[i:]


def edit1_join(ds, *, col: str, n_buckets: int = VERIFY_BUCKETS):
    """EXACT edit-distance-≤1 self-join over a string column (FastSS
    deletion neighborhoods, public literature — the typo-detection /
    entity-resolution primitive): two distinct strings are within one
    edit iff their {self} ∪ {one-char-deleted variants} key sets
    intersect, so candidates come from ONE bucketed key shuffle and are
    verified with an exact O(len) check — no false negatives, no
    all-pairs comparison.

    Scale shape: distinct values first (native groupby — strings ship
    once), then len+1 md5 key rows per value; candidate pairs via the
    in-bucket segment sweep (all C(s,2) per key group — group sizes
    are alphabet-bounded per deletion position on natural ids/tokens;
    a corpus where thousands of strings share a deletion variant makes
    the ANSWER itself quadratic), a native pair distinct, and a
    vectorized-batch verify over the surviving few. Output: (a, b)
    with a < b lexicographically.
    """
    from ..kg.unionfind import hash_bucket

    distinct = (ds.map_batches(
        lambda b: b.select([col]).group_by(col).aggregate([]),
        batch_format="pyarrow", zero_copy_batch=True)
        .groupby(col).count()
        .map_batches(lambda b: (
            b.rename_columns([col, "c"]).select([col])
            if b.num_columns >= 1 and b.num_rows else
            pa.schema([(col, pa.string())]).empty_table()),
            batch_format="pyarrow"))

    def keys(batch: pa.Table) -> pa.Table:
        names, hs = [], []
        for s in batch[col].to_pylist():
            variants = [s] + [s[:i] + s[i + 1:] for i in range(len(s))]
            for v in variants:
                names.append(s)
                hs.append(int.from_bytes(
                    hashlib.md5(v.encode("utf-8")).digest()[:8],
                    "little") & 0x7FFFFFFFFFFFFFFF)
        return pa.table({
            "k": pa.array(hs, pa.int64()),
            col: pa.array(names, pa.string()),
        })

    keyed = distinct.map_batches(keys, batch_format="pyarrow")

    pair_schema = pa.schema([("a", pa.string()), ("b", pa.string())])

    def tag(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "__bucket", hash_bucket(batch["k"].combine_chunks(), n_buckets))

    def pairs_sweep(group: pa.Table) -> pa.Table:
        order = pc.sort_indices(group, sort_keys=[
            ("k", "ascending"), (col, "ascending")])
        g = group.take(order)
        k = g["k"].combine_chunks().to_numpy(zero_copy_only=False)
        m = len(k)
        new = np.ones(m, dtype=bool)
        new[1:] = k[1:] != k[:-1]
        seg_start = np.maximum.accumulate(
            np.where(new, np.arange(m, dtype=np.int64), 0))
        preds = np.arange(m, dtype=np.int64) - seg_start
        offs = _ragged_arange(preds)
        if len(offs) == 0:
            return pair_schema.empty_table()
        hi = np.repeat(np.arange(m, dtype=np.int64), preds)
        lo = hi - offs
        names = g[col].combine_chunks()
        a = names.take(pa.array(lo))
        b = names.take(pa.array(hi))
        swap = pc.greater(a, b)
        out = pa.table({
            "a": pc.if_else(swap, b, a),
            "b": pc.if_else(swap, a, b),
        }).filter(pc.not_equal(a, b))
        return out.group_by(["a", "b"]).aggregate([])

    cands = (keyed.map_batches(tag, batch_format="pyarrow")
             .groupby("__bucket")
             .map_groups(pairs_sweep, batch_format="pyarrow")
             .groupby(["a", "b"]).count()
             .map_batches(lambda b: (
                 b.rename_columns(["a", "b", "c"]).select(["a", "b"])
                 if b.num_columns >= 2 else pair_schema.empty_table()),
                 batch_format="pyarrow"))

    def verify(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pair_schema.empty_table()
        keep = [
            _dist_le1(x, y) for x, y in
            zip(batch["a"].to_pylist(), batch["b"].to_pylist())
        ]
        return batch.filter(pa.array(keep, pa.bool_())).cast(pair_schema)

    return cands.map_batches(verify, batch_format="pyarrow")
