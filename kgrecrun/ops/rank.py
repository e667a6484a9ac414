"""Fixed-point BM25 ranking: score a document corpus against a small
query-term set and return the global top-k, without shuffling the
corpus.

Determinism: classic BM25 idf is ``ln((N-df+0.5)/(df+0.5)+1)`` — a
transcendental whose last ulp differs across libm implementations
(measured: DuckDB vs numpy disagree by 1 ulp), so float BM25 is not
reproducible across engines. This variant keeps the BM25 *shape* but
makes every factor rational, evaluated in scaled-int64 floor
arithmetic (the pagerank_fixedpoint / integer-cents trade):

    idf_fp(df) = ((2N − 2df + 1) · S) // (2df + 1)      [prob. idf]
    sat_fp(tf) = (11 · tf · S) // (5 · tf + 6)          [k1 = 6/5, b = 0]
    score_fp(doc) = Σ_terms (idf_fp · sat_fp) // S      [S = 10^6]

Bit-equal vs the SQL mirror and across any reduce order.

Scale shape: the query-term set broadcasts (a handful of strings); df
comes back as ≤ |terms| combiner rows per block; scoring is one
stateless map over the corpus emitting only matching (doc_id,
score_fp) rows; top-k is local-topk per block → single tiny reduce
(the ops/ann.py pattern). The corpus text never shuffles.
"""

from __future__ import annotations

from collections import Counter

import pyarrow as pa

from ..textnorm import ascii_words

SCALE = 10**6


def bm25_topk(ds, query_terms: list[str], *, text_col: str = "text",
              id_col: str = "doc_id", k: int = 20):
    """→ Dataset (doc_id, score_fp) — the k highest-scoring docs for
    ``query_terms``, ties broken by ascending doc id. Docs matching no
    term score 0 and are excluded before the reduce."""
    import ray

    qset = sorted(set(query_terms))
    qs = set(qset)
    n_docs = ds.count()

    def df_partial(batch: pa.Table) -> pa.Table:
        df: Counter = Counter()
        for t in batch[text_col].to_pylist():
            for w in set(ascii_words((t or "").lower())):
                if w in qs:
                    df[w] += 1
        ws = sorted(df)
        return pa.table({
            "term": pa.array(ws, pa.string()),
            "d": pa.array([df[w] for w in ws], pa.int64()),
        })

    parts = pa.concat_tables(
        list(
            ds.map_batches(df_partial, batch_format="pyarrow",
                           zero_copy_batch=True)
            .iter_batches(batch_format="pyarrow", batch_size=None)
        )
        or [pa.table({"term": pa.array([], pa.string()),
                      "d": pa.array([], pa.int64())})]
    )
    df_map: Counter = Counter()
    for term, d in zip(parts["term"].to_pylist(), parts["d"].to_pylist()):
        df_map[term] += d
    idf_fp = {
        t: ((2 * n_docs - 2 * df_map[t] + 1) * SCALE) // (2 * df_map[t] + 1)
        for t in qset if df_map[t] > 0
    }
    idf_ref = ray.put(idf_fp)

    def score(batch: pa.Table) -> pa.Table:
        idf = ray.get(idf_ref)
        ids, scores = [], []
        for i, t in zip(batch[id_col].to_pylist(),
                        batch[text_col].to_pylist()):
            tf = Counter(
                w for w in ascii_words((t or "").lower()) if w in idf
            )
            if not tf:
                continue
            s = 0
            for w, f in tf.items():
                sat = (11 * f * SCALE) // (5 * f + 6)
                s += (idf[w] * sat) // SCALE
            ids.append(i)
            scores.append(s)
        t = pa.table({
            id_col: pa.array(ids, pa.int64()),
            "score_fp": pa.array(scores, pa.int64()),
        })
        # local top-k: the reduce sees ≤ k rows per block
        return _topk(t, id_col, k)

    local = ds.map_batches(score, batch_format="pyarrow",
                           zero_copy_batch=True)
    return local.repartition(1).map_batches(
        lambda b: _topk(b, id_col, k), batch_format="pyarrow"
    )


def _topk(t: pa.Table, id_col: str, k: int) -> pa.Table:
    import pyarrow.compute as pc

    order = pc.sort_indices(
        t, sort_keys=[("score_fp", "descending"), (id_col, "ascending")]
    )
    return t.take(order.slice(0, k))
