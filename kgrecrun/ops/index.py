"""Inverted-index statistics over a document corpus.

``term_stats`` — (term, df, tf) for every term: the classic build step
for BM25 / tf-idf / vocabulary pruning. The hot-key hazard ("the"
appears in every document) is neutralized by a map-side combiner: each
block emits at most ONE row per distinct term, so the groupby shuffle
carries ≤ num_blocks rows for even the hottest term.

``postings`` — (term, doc_ids sorted list, df) for a df-capped
vocabulary subset: the actual inverted-index payload. Posting lists for
capped-df terms are bounded; uncapped hot terms are excluded by
construction (cap documented in the signature).
"""

from __future__ import annotations

from collections import Counter

import pyarrow as pa
import pyarrow.compute as pc

from ..textnorm import ascii_words


def _local_counts(batch: pa.Table, text_col: str) -> tuple[Counter, Counter]:
    df: Counter = Counter()
    tf: Counter = Counter()
    for t in batch[text_col].to_pylist():
        words = ascii_words((t or "").lower())
        tf.update(words)
        df.update(set(words))
    return df, tf


def term_stats(ds, *, text_col: str = "text", min_df: int = 1):
    """→ Dataset (term, df, tf): document frequency and total term
    frequency per distinct term, tokenized on the shared ASCII/RE2
    whitespace class (SQL-mirrorable)."""

    def local(batch: pa.Table) -> pa.Table:
        df, tf = _local_counts(batch, text_col)
        terms = sorted(tf)
        return pa.table({
            "term": pa.array(terms, pa.string()),
            "df_local": pa.array([df[w] for w in terms], pa.int64()),
            "tf_local": pa.array([tf[w] for w in terms], pa.int64()),
        })

    agg = (
        ds.map_batches(local, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("term")
        .sum(["df_local", "tf_local"])
    )

    def finish(batch: pa.Table) -> pa.Table:
        b = batch.rename_columns(["term", "df", "tf"])
        if min_df > 1:
            b = b.filter(pc.greater_equal(b["df"], min_df))
        return b

    return agg.map_batches(finish, batch_format="pyarrow")


def postings(ds, *, text_col: str = "text", id_col: str = "doc_id",
             max_df: int = 1000):
    """→ Dataset (term, doc_ids: list<int64>, df) for terms whose df ≤
    max_df (hot terms carry no ranking signal and unbounded lists; cap
    them out). One narrow (term, doc_id) shuffle after per-block dedup."""

    def explode(batch: pa.Table) -> pa.Table:
        terms, ids = [], []
        for i, t in zip(batch[id_col].to_pylist(), batch[text_col].to_pylist()):
            for w in set(ascii_words((t or "").lower())):
                terms.append(w)
                ids.append(i)
        return pa.table({
            "term": pa.array(terms, pa.string()),
            id_col: pa.array(ids, pa.int64()),
        })

    def build(group: pa.Table) -> pa.Table:
        ids = sorted(group[id_col].to_pylist())
        if len(ids) > max_df:
            return pa.table({
                "term": pa.array([], pa.string()),
                "doc_ids": pa.array([], pa.list_(pa.int64())),
                "df": pa.array([], pa.int64()),
            })
        return pa.table({
            "term": group["term"].slice(0, 1),
            "doc_ids": pa.array([ids], pa.list_(pa.int64())),
            "df": pa.array([len(ids)], pa.int64()),
        })

    exploded = ds.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True)
    return exploded.groupby("term").map_groups(build, batch_format="pyarrow")


def term_cooccurrence(ds, *, text_col: str = "text", id_col: str = "doc_id",
                      max_terms_per_doc: int = 256, min_count: int = 5,
                      k: int = 50, n_buckets: int = 64):
    """Top-k co-occurring term pairs with a fixed-point LIFT score —
    the phrase-mining / PMI primitive. For each document take the
    lexicographically-first ``max_terms_per_doc`` DISTINCT tokens
    (deterministic, SQL-mirrorable cap), emit ordered pairs (w1 < w2),
    count pairs corpus-wide, keep counts ≥ ``min_count`` and score

        lift_fp = (c12 · N · 10⁶) // (c1 · c2)     [exact integers]

    — lift is exp(PMI); kept rational in scaled-int64 floor arithmetic
    because libm ``log`` differs by 1 ulp across engines (the
    ops/rank.py BM25 trade). Output: (w1, w2, pair_count, lift_fp),
    the k most frequent pairs (ties: lexicographic).

    Scale shape: pair partials combine per block (Counter → ≤ distinct
    pairs in the block), the pair reduce is hash-BUCKETED (single-key
    groupby at ``n_buckets`` dispatch, arrow 2-key sum inside); term
    document-frequencies ride the existing term_stats combiner and are
    broadcast ONCE as parallel arrays (vectorized index_in lookup).
    BOUNDED-VOCAB CONTRACT: the df broadcast is vocabulary-order — at
    web scale prune the vocabulary first (min_df / stopword cap) or
    swap the broadcast for two bucket_joins of df onto the pair table.
    """
    from itertools import combinations

    import numpy as np

    from ..kg.unionfind import hash_bucket

    def tokset(t: str | None) -> list[str]:
        return sorted(set(ascii_words((t or "").lower())))[:max_terms_per_doc]

    def pair_partial(batch: pa.Table) -> pa.Table:
        cnt: Counter = Counter()
        for t in batch[text_col].to_pylist():
            cnt.update(combinations(tokset(t), 2))
        keys = sorted(cnt)
        t = pa.table({
            "w1": pa.array([a for a, _ in keys], pa.string()),
            "w2": pa.array([b for _, b in keys], pa.string()),
            "c_p": pa.array([cnt[p] for p in keys], pa.int64()),
        })
        return t.append_column(
            "__bucket",
            hash_bucket(pc.binary_join_element_wise(
                t["w1"], t["w2"], "\x1f").combine_chunks(), n_buckets),
        )

    def df_partial(batch: pa.Table) -> pa.Table:
        df: Counter = Counter()
        for t in batch[text_col].to_pylist():
            df.update(tokset(t))
        ws = sorted(df)
        return pa.table({
            "term": pa.array(ws, pa.string()),
            "df_p": pa.array([df[w] for w in ws], pa.int64()),
        })

    n_docs = ds.count()

    df_tbl = (
        ds.map_batches(df_partial, batch_format="pyarrow",
                       zero_copy_batch=True)
        .groupby("term").sum("df_p")
    )
    terms: list[str] = []
    dfs: list[int] = []
    for b in df_tbl.iter_batches(batch_format="pyarrow"):
        if b.num_rows == 0 or "term" not in b.column_names:
            continue
        terms.extend(b["term"].to_pylist())
        dfs.extend(b.column(1).to_pylist())
    order = np.argsort(np.array(terms, dtype=object), kind="stable")
    term_arr = pa.array([terms[i] for i in order], pa.string())
    df_arr = np.array([dfs[i] for i in order], np.int64)

    import ray

    from ..kg.resources import broadcast, resolve

    try:
        df_ref = broadcast((term_arr, df_arr))
    except Exception:
        df_ref = (term_arr, df_arr)

    def sum_bucket(group: pa.Table) -> pa.Table:
        agg = group.select(["w1", "w2", "c_p"]).group_by(
            ["w1", "w2"]).aggregate([("c_p", "sum")])
        agg = agg.rename_columns(["w1", "w2", "pair_count"])
        agg = agg.filter(pc.greater_equal(agg["pair_count"], min_count))
        if agg.num_rows == 0:
            return pa.table({
                "w1": pa.array([], pa.string()),
                "w2": pa.array([], pa.string()),
                "pair_count": pa.array([], pa.int64()),
                "lift_fp": pa.array([], pa.int64()),
            })
        ta, da = resolve(df_ref)
        i1 = pc.index_in(agg["w1"].combine_chunks(), value_set=ta)
        i2 = pc.index_in(agg["w2"].combine_chunks(), value_set=ta)
        c1 = da[i1.to_numpy(zero_copy_only=False)]
        c2 = da[i2.to_numpy(zero_copy_only=False)]
        c12 = agg["pair_count"].combine_chunks().to_numpy(
            zero_copy_only=False)
        # exact python-int floor division (no int64 overflow at any N)
        lift = [int(a) * n_docs * 1_000_000 // (int(x) * int(y))
                for a, x, y in zip(c12, c1, c2)]
        agg = agg.append_column("lift_fp", pa.array(lift, pa.int64()))
        return _pair_topk(agg, k)

    local = (
        ds.map_batches(pair_partial, batch_format="pyarrow",
                       zero_copy_batch=True)
        .groupby("__bucket")
        .map_groups(sum_bucket, batch_format="pyarrow")
    )
    return local.repartition(1).map_batches(
        lambda b: _pair_topk(b, k), batch_format="pyarrow")


def _pair_topk(t: pa.Table, k: int) -> pa.Table:
    order = pc.sort_indices(t, sort_keys=[
        ("pair_count", "descending"),
        ("w1", "ascending"),
        ("w2", "ascending"),
    ])
    return t.take(order.slice(0, k))


def tfidf_top_terms(ds, *, k: int = 3, text_col: str = "text",
                    id_col: str = "doc_id", n_buckets: int = 256):
    """Per-document top-``k`` most DISCRIMINATIVE terms — the tf-idf
    ranking with an integer-exact ordering: terms sort by (tf DESC,
    df ASC, term ASC) per document, which is the tf·idf ordering
    without the float logarithm (for fixed tf, lower df ⇔ higher idf)
    and therefore bit-exact against the SQL window oracle.

    Output: (doc_id, term, tf, df, rank), rank ∈ [1, k].

    Scale shape: corpus-wide df via ``term_stats``'s hot-key combiner
    (one vocab-order groupby); per-doc tf rows explode map-side (one
    Counter pass per doc, tokenization shared with the oracle via
    ``ascii_words``); df attaches through ONE bucketed cogroup on term
    (hot terms are a bounded ≤1-row-per-block join side thanks to the
    combiner); the per-doc top-k is the window module's bucketed
    segment sweep — dispatch ≤ n_buckets at any doc cardinality, no
    vocabulary or corpus table ever lands on the driver.
    """
    import numpy as np

    from ..kg.unionfind import hash_bucket
    from .cogroup import bucket_join

    def explode_tf(batch: pa.Table) -> pa.Table:
        ids, terms, tfs = [], [], []
        for i, t in zip(batch[id_col].to_pylist(), batch[text_col].to_pylist()):
            c = Counter(ascii_words((t or "").lower()))
            for w in sorted(c):
                ids.append(i)
                terms.append(w)
                tfs.append(c[w])
        return pa.table({
            id_col: pa.array(ids, pa.int64()),
            "term": pa.array(terms, pa.string()),
            "tf": pa.array(tfs, pa.int64()),
        })

    tf_rows = ds.map_batches(explode_tf, batch_format="pyarrow",
                             zero_copy_batch=True)
    df = term_stats(ds, text_col=text_col).map_batches(
        lambda b: b.select(["term", "df"]), batch_format="pyarrow")

    joined = bucket_join(
        tf_rows, df, key="term", n_buckets=n_buckets,
        left_schema=pa.schema([(id_col, pa.int64()), ("term", pa.string()),
                               ("tf", pa.int64())]),
        right_schema=pa.schema([("term", pa.string()), ("df", pa.int64())]),
    )

    def tag(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "__bucket", hash_bucket(batch[id_col].combine_chunks(), n_buckets))

    def topk_bucket(group: pa.Table) -> pa.Table:
        order = pc.sort_indices(group, sort_keys=[
            (id_col, "ascending"), ("tf", "descending"),
            ("df", "ascending"), ("term", "ascending"),
        ])
        g = group.take(order).drop_columns(["__bucket"])
        n = g.num_rows
        ids = g[id_col].combine_chunks().to_numpy(zero_copy_only=False)
        new_seg = np.concatenate(([True], ids[1:] != ids[:-1]))
        idx = np.arange(n)
        rnk = idx - np.maximum.accumulate(np.where(new_seg, idx, 0)) + 1
        keep = rnk <= k
        return g.filter(pa.array(keep)).append_column(
            "rank", pa.array(rnk[keep], pa.int64())).select(
            [id_col, "term", "tf", "df", "rank"])

    return (joined.map_batches(tag, batch_format="pyarrow")
            .groupby("__bucket")
            .map_groups(topk_bucket, batch_format="pyarrow"))
