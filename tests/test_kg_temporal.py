"""Temporal/provenance KG views (kg/temporal.py): operator-level DuckDB
parity over a synthetic per-occurrence canonical table (the sf0.01
provenance golden is exercised by the driver oracle sweep).
"""

import duckdb
import pandas as pd
import pyarrow as pa
import pytest

import ray.data

from kgrecrun.kg.temporal import (fact_sources, facts_asof, snapshot_delta,
                                  temporal_facts)

BASE = 1_000_000_000  # synthetic base_ts (µs)


def _canonical():
    # per-occurrence rows: fact A repeated in doc 1 (twice) and doc 5;
    # fact B in docs 2 and 9; (s2,p) has two competing objs
    rows = []
    for url_id, n in [(1, 2), (5, 1)]:
        rows += [{"subj": "S1", "pred": "p", "obj": "X",
                  "url": f"https://a.example/x/art-{url_id}"}] * n
    for url_id in [2, 9]:
        rows += [{"subj": "S2", "pred": "p", "obj": "Y",
                  "url": f"https://a.example/x/art-{url_id}"}]
    rows += [{"subj": "S2", "pred": "p", "obj": "Z",
              "url": "https://a.example/x/art-3"}]
    return pa.Table.from_pylist(rows)


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def _assert_match(ds, sql, tbl):
    got = _canon(ds.to_pandas())
    con = duckdb.connect()
    con.register("c", tbl)
    want = _canon(con.execute(sql).fetchdf())
    assert list(got.columns) == list(want.columns)
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)


_TS = ("1000000000 + CAST(regexp_extract(url, 'art-(\\d+)$', 1) AS BIGINT)"
       " * 1000000")


@pytest.mark.usefixtures("ray_session")
def test_fact_sources_counts():
    tbl = _canonical()
    _assert_match(
        fact_sources(ray.data.from_arrow(tbl)),
        "SELECT subj, pred, obj, url, COUNT(*) AS n_mentions "
        "FROM c GROUP BY 1, 2, 3, 4", tbl)


@pytest.mark.usefixtures("ray_session")
def test_temporal_facts_matches_duckdb():
    tbl = _canonical()
    _assert_match(
        temporal_facts(ray.data.from_arrow(tbl), base_ts=BASE),
        f"""SELECT subj, pred, obj, COUNT(*) AS n_sources,
                   MIN({_TS}) AS first_ts, MAX({_TS}) AS last_ts
            FROM c GROUP BY 1, 2, 3""", tbl)


@pytest.mark.usefixtures("ray_session")
def test_facts_asof_cutoff_and_tiebreaks():
    tbl = _canonical()
    # cutoff at doc 4: S1's fact (first seen doc 1) and S2's Y (doc 2)
    # and Z (doc 3) are all eligible; Y wins on last_ts... but doc 9 is
    # AFTER the cutoff -- last_ts still counts doc 9 (facts_asof caps
    # eligibility by first_ts, not the aggregate), mirroring the SQL.
    cutoff = BASE + 4 * 1_000_000
    _assert_match(
        facts_asof(ray.data.from_arrow(tbl), base_ts=BASE, cutoff_ts=cutoff),
        f"""WITH f AS (SELECT subj, pred, obj, COUNT(*) AS n_sources,
                              MIN({_TS}) AS first_ts, MAX({_TS}) AS last_ts
                       FROM c GROUP BY 1, 2, 3)
            SELECT subj, pred, obj, n_sources, first_ts, last_ts FROM (
                SELECT *, ROW_NUMBER() OVER (PARTITION BY subj, pred
                    ORDER BY last_ts DESC, n_sources DESC, obj) rn
                FROM f WHERE first_ts <= {cutoff}) WHERE rn = 1""", tbl)
    got = {r["subj"]: r["obj"]
           for r in facts_asof(ray.data.from_arrow(tbl), base_ts=BASE,
                               cutoff_ts=cutoff).take_all()}
    assert got == {"S1": "X", "S2": "Y"}


@pytest.mark.usefixtures("ray_session")
def test_snapshot_delta_statuses():
    tbl = _canonical()
    cutoff = BASE + 4 * 1_000_000
    _assert_match(
        snapshot_delta(ray.data.from_arrow(tbl), base_ts=BASE,
                       cutoff_ts=cutoff),
        f"""WITH f AS (SELECT subj, pred, obj,
                CAST(SUM(CASE WHEN {_TS} < {cutoff} THEN 1 ELSE 0 END)
                     AS BIGINT) AS n_before,
                CAST(SUM(CASE WHEN {_TS} >= {cutoff} THEN 1 ELSE 0 END)
                     AS BIGINT) AS n_after
             FROM c GROUP BY 1, 2, 3)
            SELECT subj, pred, obj, n_before, n_after,
                   CASE WHEN n_before = 0 THEN 'new'
                        WHEN n_after = 0 THEN 'static'
                        ELSE 'growing' END AS status FROM f""", tbl)
    got = {(r["subj"], r["obj"]): r["status"]
           for r in snapshot_delta(ray.data.from_arrow(tbl), base_ts=BASE,
                                   cutoff_ts=cutoff).take_all()}
    # S1/X: docs 1,5 -> growing; S2/Y: docs 2,9 -> growing;
    # S2/Z: doc 3 only -> static
    assert got == {("S1", "X"): "growing", ("S2", "Y"): "growing",
                   ("S2", "Z"): "static"}