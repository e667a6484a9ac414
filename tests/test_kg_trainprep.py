"""KG-embedding training-prep operators (kg/trainprep.py): value-exact
DuckDB parity over the planted-triples golden table, plus edge-case
units (tiebreaks, dead-end walks, accidental-positive filtering).

These operators' driver oracles are golden-backed (valid at sf0.01
where kg_triples reproduces the golden exactly); here we test the
operator layer directly on the golden parquet, which is sf-independent.
"""

import duckdb
import pandas as pd
import pyarrow as pa
import pytest

import ray.data

from kgrecrun.kg import trainprep as tp

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


@pytest.mark.usefixtures("ray_session")
def test_fact_resolution_matches_duckdb():
    ds = ray.data.read_parquet(GOLD)
    _assert_match(tp.fact_resolution(ds), f"""
        SELECT subj, pred, obj, n_sources FROM (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY subj, pred ORDER BY n_sources DESC, obj) rn
            FROM read_parquet('{GOLD}')) WHERE rn = 1
    """)


@pytest.mark.usefixtures("ray_session")
def test_two_hop_matches_duckdb():
    ds = ray.data.read_parquet(GOLD)
    _assert_match(tp.metapath_two_hop(ds), f"""
        WITH t AS (SELECT subj, pred, obj FROM read_parquet('{GOLD}'))
        SELECT a.pred AS pred1, b.pred AS pred2,
               COUNT(*) AS n_paths, COUNT(DISTINCT a.obj) AS n_bridges
        FROM t a JOIN t b ON a.obj = b.subj GROUP BY 1, 2
    """)


@pytest.mark.usefixtures("ray_session")
def test_negative_samples_matches_duckdb():
    ds = ray.data.read_parquet(GOLD)
    _assert_match(tp.negative_samples(ds), f"""
        WITH g AS (SELECT subj, pred, obj FROM read_parquet('{GOLD}')),
        pool AS (SELECT obj AS neg_obj, ROW_NUMBER() OVER (ORDER BY obj) - 1 AS rk
                 FROM (SELECT DISTINCT obj FROM g)),
        c AS (SELECT g.subj, g.pred, g.obj, CAST(i.i AS BIGINT) AS neg_idx,
               CAST(md5_number_upper(g.subj || '|' || g.pred || '|' || g.obj
                    || '|' || CAST(i.i AS VARCHAR))
                    % (SELECT COUNT(*) FROM pool) AS BIGINT) AS rk
              FROM g CROSS JOIN (SELECT 0 AS i UNION ALL SELECT 1) i)
        SELECT c.subj, c.pred, c.obj, c.neg_idx, p.neg_obj
        FROM c JOIN pool p USING (rk)
        WHERE NOT EXISTS (SELECT 1 FROM g t WHERE t.subj = c.subj
                          AND t.pred = c.pred AND t.obj = p.neg_obj)
    """)


@pytest.mark.usefixtures("ray_session")
def test_random_walks_matches_duckdb():
    ds = ray.data.read_parquet(GOLD)
    _assert_match(tp.random_walks(ds), f"""
        WITH adj AS MATERIALIZED (
            SELECT DISTINCT subj AS node, obj AS nbr FROM read_parquet('{GOLD}')),
        s0 AS MATERIALIZED (SELECT DISTINCT node AS walk_id, node FROM adj),
        c1 AS MATERIALIZED (SELECT s0.walk_id, a.nbr,
              ROW_NUMBER() OVER (PARTITION BY s0.walk_id
                ORDER BY md5_number_upper(s0.walk_id || '|1|' || a.nbr), a.nbr) rn
             FROM s0 JOIN adj a ON a.node = s0.node),
        s1 AS MATERIALIZED (SELECT walk_id, nbr AS node FROM c1 WHERE rn = 1),
        c2 AS MATERIALIZED (SELECT s1.walk_id, a.nbr,
              ROW_NUMBER() OVER (PARTITION BY s1.walk_id
                ORDER BY md5_number_upper(s1.walk_id || '|2|' || a.nbr), a.nbr) rn
             FROM s1 JOIN adj a ON a.node = s1.node),
        s2 AS MATERIALIZED (SELECT walk_id, nbr AS node FROM c2 WHERE rn = 1),
        c3 AS MATERIALIZED (SELECT s2.walk_id, a.nbr,
              ROW_NUMBER() OVER (PARTITION BY s2.walk_id
                ORDER BY md5_number_upper(s2.walk_id || '|3|' || a.nbr), a.nbr) rn
             FROM s2 JOIN adj a ON a.node = s2.node),
        s3 AS MATERIALIZED (SELECT walk_id, nbr AS node FROM c3 WHERE rn = 1)
        SELECT walk_id, CAST(0 AS BIGINT) AS step, node FROM s0
        UNION ALL SELECT walk_id, 1, node FROM s1
        UNION ALL SELECT walk_id, 2, node FROM s2
        UNION ALL SELECT walk_id, 3, node FROM s3
    """)


@pytest.mark.usefixtures("ray_session")
def test_verbalization_matches_duckdb():
    ds = ray.data.read_parquet(GOLD)
    _assert_match(tp.verbalize(ds), f"""
        SELECT subj, pred, obj, n_sources,
               subj || CASE pred
                   WHEN 'born_in' THEN ' was born in '
                   WHEN 'works_for' THEN ' works for '
                   WHEN 'acquired' THEN ' acquired '
                   WHEN 'located_in' THEN ' is located in '
                   WHEN 'founded' THEN ' founded '
                   WHEN 'ceo_of' THEN ' is the CEO of '
                   WHEN 'headquartered_in' THEN ' is headquartered in '
                   WHEN 'partnered_with' THEN ' partnered with '
                   ELSE ' ' || pred || ' ' END || obj || '.' AS sentence
        FROM read_parquet('{GOLD}')
    """)


@pytest.mark.usefixtures("ray_session")
def test_ego_networks_matches_duckdb():
    ds = ray.data.read_parquet(GOLD)
    _assert_match(tp.ego_networks(ds), f"""
        WITH adj AS MATERIALIZED (
            SELECT DISTINCT subj AS node, obj AS nbr FROM read_parquet('{GOLD}')),
        seeds AS MATERIALIZED (SELECT DISTINCT node AS seed FROM adj),
        h1 AS MATERIALIZED (
            SELECT seed, nbr, ROW_NUMBER() OVER (PARTITION BY seed
                ORDER BY md5_number_upper(seed || '|1|' || nbr), nbr) rn
            FROM seeds JOIN adj a ON a.node = seed WHERE nbr <> seed),
        l1 AS MATERIALIZED (SELECT seed, nbr AS node FROM h1 WHERE rn <= 3),
        h2c AS MATERIALIZED (
            SELECT l1.seed, l1.node AS parent, a.nbr
            FROM l1 JOIN adj a ON a.node = l1.node
            WHERE a.nbr <> l1.seed
              AND NOT EXISTS (SELECT 1 FROM l1 v
                              WHERE v.seed = l1.seed AND v.node = a.nbr)),
        h2r AS MATERIALIZED (
            SELECT seed, parent, nbr, ROW_NUMBER() OVER (
                PARTITION BY seed, parent
                ORDER BY md5_number_upper(seed || '|2|' || parent || '|' || nbr),
                         nbr) rn
            FROM h2c),
        l2 AS MATERIALIZED (SELECT DISTINCT seed, nbr AS node FROM h2r WHERE rn <= 3)
        SELECT seed, CAST(0 AS BIGINT) AS hop, seed AS node FROM seeds
        UNION ALL SELECT seed, 1, node FROM l1
        UNION ALL SELECT seed, 2, node FROM l2
    """)


@pytest.mark.usefixtures("ray_session")
def test_incremental_ingest_equals_full_recompute():
    # triple dedup is an associative aggregate: two disjoint corpus
    # halves pipelined independently then merged must equal one full
    # run bit-exactly (engine-vs-engine, sf-independent)
    import __ray_entry__ as E

    sf = "/root/testdata/sf0.001"
    key = lambda r: (r["subj"], r["pred"], r["obj"])
    inc = sorted(E.queries()["kg_incremental_ingest"](sf).take_all(), key=key)
    full = sorted(E.queries()["kg_triples"](sf).take_all(), key=key)
    assert inc == full


def _tiny(rows):
    return ray.data.from_arrow(pa.Table.from_pylist(rows))


@pytest.mark.usefixtures("ray_session")
def test_verbalize_unknown_pred_fallback():
    ds = _tiny([{"subj": "A", "pred": "mystery_rel", "obj": "B",
                 "n_sources": 1}])
    got = tp.verbalize(ds).take_all()
    assert got[0]["sentence"] == "A mystery_rel B."


@pytest.mark.usefixtures("ray_session")
def test_ego_networks_fanout_and_visited():
    # seed A: 5 out-neighbors -> exactly fanout=3 at hop 1; self-loop
    # A->A excluded; hop-2 candidates that are hop-1 nodes excluded
    rows = [{"subj": "A", "pred": "p", "obj": o, "n_sources": 1}
            for o in ["B", "C", "D", "E", "F", "A"]]
    rows += [{"subj": "B", "pred": "p", "obj": o, "n_sources": 1}
             for o in ["C", "D", "E", "F", "Z"]]
    got = tp.ego_networks(_tiny(rows)).take_all()
    by_hop = {}
    for r in got:
        if r["seed"] == "A":
            by_hop.setdefault(r["hop"], set()).add(r["node"])
    assert by_hop[0] == {"A"}
    assert len(by_hop[1]) == 3 and "A" not in by_hop[1]
    # hop-2 nodes are disjoint from {A} + hop-1
    assert by_hop.get(2, set()).isdisjoint(by_hop[1] | {"A"})


@pytest.mark.usefixtures("ray_session")
def test_fact_resolution_tiebreak():
    ds = _tiny([
        {"subj": "A", "pred": "p", "obj": "X", "n_sources": 3},
        {"subj": "A", "pred": "p", "obj": "B", "n_sources": 3},
        {"subj": "A", "pred": "p", "obj": "C", "n_sources": 9},
        {"subj": "A", "pred": "q", "obj": "Z", "n_sources": 1},
    ])
    got = sorted(tp.fact_resolution(ds).take_all(), key=lambda r: r["pred"])
    assert got == [
        {"subj": "A", "pred": "p", "obj": "C", "n_sources": 9},
        {"subj": "A", "pred": "q", "obj": "Z", "n_sources": 1},
    ]


@pytest.mark.usefixtures("ray_session")
def test_two_hop_hub_products():
    # hub B: 2 in-edges via p, 3 out-edges via q -> 6 paths, 1 bridge
    rows = ([{"subj": f"S{i}", "pred": "p", "obj": "B", "n_sources": 1}
             for i in range(2)]
            + [{"subj": "B", "pred": "q", "obj": f"T{i}", "n_sources": 1}
               for i in range(3)])
    got = tp.metapath_two_hop(_tiny(rows)).take_all()
    assert got == [{"pred1": "p", "pred2": "q", "n_paths": 6, "n_bridges": 1}]


@pytest.mark.usefixtures("ray_session")
def test_negative_samples_drops_accidental_positives():
    # pool = {X}: every candidate equals the sole true obj -> all dropped
    ds = _tiny([{"subj": "A", "pred": "p", "obj": "X", "n_sources": 1}])
    assert tp.negative_samples(ds).count() == 0


@pytest.mark.usefixtures("ray_session")
def test_random_walks_paths_equivalent():
    # broadcast (driver frontier + raw tasks) and exchange (bucketed
    # cogroup) paths must be bit-identical
    ds = ray.data.read_parquet(GOLD)
    key = lambda r: (r["walk_id"], r["step"])
    a = sorted(tp.random_walks(ds).take_all(), key=key)
    b = sorted(tp.random_walks(ds, broadcast_walks=None).take_all(), key=key)
    assert a == b


@pytest.mark.usefixtures("ray_session")
def test_random_walks_broadcast_bound():
    ds = ray.data.read_parquet(GOLD)
    with pytest.raises(RuntimeError, match="broadcast_walks"):
        tp.random_walks(ds, broadcast_walks=5)


@pytest.mark.usefixtures("ray_session")
def test_random_walks_dead_end_stops():
    # A -> B, B has no out-edge: walk A emits steps 0,1 then stops;
    # walk B never starts (B is not a subject)
    ds = _tiny([{"subj": "A", "pred": "p", "obj": "B", "n_sources": 1}])
    got = sorted(tp.random_walks(ds).take_all(),
                 key=lambda r: (r["walk_id"], r["step"]))
    assert got == [
        {"walk_id": "A", "step": 0, "node": "A"},
        {"walk_id": "A", "step": 1, "node": "B"},
    ]
