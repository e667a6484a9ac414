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
