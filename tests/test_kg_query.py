"""KG declarative query surfaces (kg/query.py): DuckDB parity on the
planted-triples golden plus edge-case units (cross products, shortest-
length semantics, cycles, self-loops).
"""

import duckdb
import pandas as pd
import pyarrow as pa
import pytest

import ray.data

from kgrecrun.kg.query import conjunctive_match, path_closure

GOLD = "/root/repo/tests/goldens/kg_triples_gold_sf001.parquet"


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


def _tiny(rows):
    return ray.data.from_arrow(pa.Table.from_pylist(rows))


@pytest.mark.usefixtures("ray_session")
def test_conjunctive_matches_duckdb():
    ds = ray.data.read_parquet(GOLD)
    _assert_match(
        conjunctive_match(ds, [("founded", "org"), ("born_in", "birthplace")]),
        f"""
        WITH g AS (SELECT subj, pred, obj FROM read_parquet('{GOLD}'))
        SELECT a.subj, a.obj AS org, b.obj AS birthplace
        FROM g a JOIN g b ON b.subj = a.subj
        WHERE a.pred = 'founded' AND b.pred = 'born_in'
        """)


@pytest.mark.usefixtures("ray_session")
def test_path_closure_matches_duckdb():
    ds = ray.data.read_parquet(GOLD)
    _assert_match(path_closure(ds, "acquired", max_len=3), f"""
        WITH e AS MATERIALIZED (
            SELECT DISTINCT subj AS src, obj AS dst
            FROM read_parquet('{GOLD}') WHERE pred = 'acquired'),
        l1 AS MATERIALIZED (SELECT src, dst FROM e WHERE src <> dst),
        c2 AS MATERIALIZED (
            SELECT DISTINCT l1.src, e.dst FROM l1
            JOIN e ON e.src = l1.dst WHERE l1.src <> e.dst),
        l2 AS MATERIALIZED (
            SELECT src, dst FROM c2
            WHERE NOT EXISTS (SELECT 1 FROM l1
                              WHERE l1.src = c2.src AND l1.dst = c2.dst)),
        c3 AS MATERIALIZED (
            SELECT DISTINCT l2.src, e.dst FROM l2
            JOIN e ON e.src = l2.dst WHERE l2.src <> e.dst),
        l3 AS MATERIALIZED (
            SELECT src, dst FROM c3
            WHERE NOT EXISTS (SELECT 1 FROM l1
                              WHERE l1.src = c3.src AND l1.dst = c3.dst)
              AND NOT EXISTS (SELECT 1 FROM l2
                              WHERE l2.src = c3.src AND l2.dst = c3.dst))
        SELECT src, dst, CAST(1 AS BIGINT) AS path_len FROM l1
        UNION ALL SELECT src, dst, 2 FROM l2
        UNION ALL SELECT src, dst, 3 FROM l3
    """)


@pytest.mark.usefixtures("ray_session")
def test_conjunctive_cross_product():
    # two founded objs x one born_in -> 2 rows
    ds = _tiny([
        {"subj": "P1", "pred": "founded", "obj": "O1", "n_sources": 1},
        {"subj": "P1", "pred": "founded", "obj": "O2", "n_sources": 1},
        {"subj": "P1", "pred": "born_in", "obj": "L1", "n_sources": 1},
        {"subj": "P2", "pred": "founded", "obj": "O3", "n_sources": 1},
    ])
    got = sorted(
        conjunctive_match(ds, [("founded", "org"),
                               ("born_in", "birthplace")]).take_all(),
        key=lambda r: r["org"])
    assert got == [
        {"subj": "P1", "org": "O1", "birthplace": "L1"},
        {"subj": "P1", "org": "O2", "birthplace": "L1"},
    ]


@pytest.mark.usefixtures("ray_session")
def test_path_closure_shortest_and_cycles():
    # chain A->B->C->D plus shortcut A->C plus cycle D->A, self-loop E->E
    rows = [{"subj": s, "pred": "acquired", "obj": o, "n_sources": 1}
            for s, o in [("A", "B"), ("B", "C"), ("C", "D"),
                         ("A", "C"), ("D", "A"), ("E", "E")]]
    got = {(r["src"], r["dst"]): r["path_len"]
           for r in path_closure(_tiny(rows), "acquired", max_len=3).take_all()}
    # A reaches C at 1 (shortcut beats A->B->C), D at 2 (via shortcut)
    assert got[("A", "C")] == 1 and got[("A", "D")] == 2
    # cycle D->A->B: D reaches B at 2; E self-loop emits nothing
    assert got[("D", "B")] == 2
    assert ("E", "E") not in got and ("A", "A") not in got