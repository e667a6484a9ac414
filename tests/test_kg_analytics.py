"""KG quality/analytics operators (kg/analytics.py): DuckDB parity over
the checked-in goldens plus a tie-break edge case for the conflict
audit's top-2 segment sweep.
"""

import duckdb
import pandas as pd
import pyarrow as pa
import pytest

import ray.data

from kgrecrun.kg.analytics import (fact_conflicts, host_stats,
                                   pred_signatures)

GOLD = "/root/repo/tests/goldens/kg_triples_gold_sf001.parquet"
ARTS = "/root/repo/tests/goldens/kg_articles_sf001.parquet"


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def _assert_match(ds, sql):
    got = _canon(ds.to_pandas())
    want = _canon(duckdb.sql(sql).fetchdf())
    assert list(got.columns) == list(want.columns)
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)


@pytest.mark.usefixtures("ray_session")
def test_host_stats_matches_duckdb():
    arts = ray.data.read_parquet(ARTS, columns=["url", "text_length"])
    _assert_match(host_stats(arts), f"""
        SELECT regexp_extract(url, '^https://([^/]+)/', 1) AS host,
               COUNT(*) AS n_docs,
               CAST(SUM(text_length) AS BIGINT) AS total_text_length
        FROM read_parquet('{ARTS}') GROUP BY 1
    """)


@pytest.mark.usefixtures("ray_session")
def test_pred_signatures_matches_duckdb():
    ds = ray.data.read_parquet(GOLD)
    _assert_match(pred_signatures(ds), f"""
        SELECT pred, substr(subj, 1, 1) AS subj_type,
               substr(obj, 1, 1) AS obj_type, COUNT(*) AS n_facts,
               CAST(SUM(n_sources) AS BIGINT) AS n_sources
        FROM read_parquet('{GOLD}') GROUP BY 1, 2, 3
    """)


@pytest.mark.usefixtures("ray_session")
def test_fact_conflicts_matches_duckdb():
    ds = ray.data.read_parquet(GOLD)
    _assert_match(fact_conflicts(ds), f"""
        WITH r AS (SELECT subj, pred, obj, n_sources,
                ROW_NUMBER() OVER (PARTITION BY subj, pred
                    ORDER BY n_sources DESC, obj) AS rn,
                COUNT(*) OVER (PARTITION BY subj, pred) AS n_objs,
                SUM(n_sources) OVER (PARTITION BY subj, pred) AS tot
            FROM read_parquet('{GOLD}'))
        SELECT a.subj, a.pred, CAST(a.n_objs AS BIGINT) AS n_objs,
               CAST(a.tot AS BIGINT) AS total_sources,
               a.n_sources AS top_support, b.n_sources AS second_support
        FROM r a JOIN r b ON b.subj = a.subj AND b.pred = a.pred AND b.rn = 2
        WHERE a.rn = 1 AND a.n_objs >= 2
    """)


@pytest.mark.usefixtures("ray_session")
def test_fact_conflicts_tiebreak_and_singletons():
    ds = ray.data.from_arrow(pa.Table.from_pylist([
        # tie on support 5: top is obj 'A' (asc), second 'B'
        {"subj": "S", "pred": "p", "obj": "B", "n_sources": 5},
        {"subj": "S", "pred": "p", "obj": "A", "n_sources": 5},
        {"subj": "S", "pred": "p", "obj": "C", "n_sources": 1},
        # singleton (subj,pred): not a conflict, excluded
        {"subj": "S", "pred": "q", "obj": "Z", "n_sources": 9},
    ]))
    got = fact_conflicts(ds).take_all()
    assert got == [{"subj": "S", "pred": "p", "n_objs": 3,
                    "total_sources": 11, "top_support": 5,
                    "second_support": 5}]

@pytest.mark.usefixtures("ray_session")
def test_inverse_predicates_symmetric_inverse_and_selfloop():
    """A reversed pair counts once per (fwd triple, bwd triple) combo,
    symmetric predicates pair with themselves, self-loops are excluded,
    totals count non-self triples per predicate; partition-invariant."""
    from kgrecrun.kg.analytics import inverse_predicates

    rows = [
        ("a", "acq", "b"), ("b", "acq_by", "a"),   # inverse pair
        ("c", "acq", "d"), ("d", "acq_by", "c"),   # second instance
        ("e", "partner", "f"), ("f", "partner", "e"),  # symmetric
        ("g", "acq", "h"),                          # unreciprocated
        ("i", "partner", "i"),                      # self-loop: excluded
        ("b", "acq", "a"),   # reverses (a,acq,b) -> an (acq,acq) pair
    ]
    t = pa.table({
        "subj": pa.array([r[0] for r in rows]),
        "pred": pa.array([r[1] for r in rows]),
        "obj": pa.array([r[2] for r in rows]),
        "n_sources": pa.array([1] * len(rows), pa.int64()),
    })
    outs = []
    for parts in (1, 3):
        ds = ray.data.from_arrow(t).repartition(parts)
        df = (inverse_predicates(ds).to_pandas()
              .sort_values(["pred_a", "pred_b"]).reset_index(drop=True))
        outs.append(df)
    assert outs[0].equals(outs[1])
    got = {(r.pred_a, r.pred_b): (r.n_pairs, r.n_a, r.n_b)
           for r in outs[0].itertuples()}
    # acq non-self triples: a->b, c->d, g->h, b->a = 4; acq_by: 2;
    # partner non-self: e->f, f->e = 2
    assert got[("acq", "acq")] == (1, 4, 4)            # (a,acq,b)+(b,acq,a)
    assert got[("acq", "acq_by")] == (2, 4, 2)         # a|b and c|d
    assert got[("partner", "partner")] == (1, 2, 2)
    assert ("acq", "partner") not in got
