"""Graph-analytics + heavy-hitter operator tests: synthetic-graph
reference checks (pure-Python mirrors of the integer recurrences) and
shard-invariance. Oracle parity for the corpus-scale variants runs in
test_oracles.py / tools/check_oracles.py."""

import pyarrow as pa
import pytest

SF_DIR = "/root/testdata/sf0.001"


def _edges_ds(ray, pairs):
    """Symmetric edge Dataset from undirected (u, v) pairs."""
    src, dst = [], []
    for u, v in pairs:
        src += [u, v]
        dst += [v, u]
    return ray.data.from_arrow(
        pa.table({"src": pa.array(src, pa.int64()),
                  "dst": pa.array(dst, pa.int64())})
    )


def _pagerank_ref(pairs, iters, scale=10**12, d_num=85, d_den=100):
    """Driver-side mirror of the fixed-point recurrence."""
    adj: dict[int, list[int]] = {}
    for u, v in pairs:
        adj.setdefault(u, []).append(v)
        adj.setdefault(v, []).append(u)
    nodes = sorted(adj)
    r = {n: scale // len(nodes) for n in nodes}
    base = ((d_den - d_num) * (scale // len(nodes))) // d_den
    for _ in range(iters):
        s = {n: 0 for n in nodes}
        for u, nbrs in adj.items():
            c = r[u] // len(nbrs)
            for v in nbrs:
                s[v] += c
        r = {n: base + (d_num * s[n]) // d_den for n in nodes}
    return r


PAIRS = [(1, 2), (2, 3), (3, 4), (4, 1), (4, 5), (6, 7)]


def test_pagerank_matches_reference_recurrence(ray_session):
    from kgrecrun.ops.graph import pagerank_fixedpoint

    ds = _edges_ds(ray_session, PAIRS)
    got = {
        row["node"]: row["rank_fp"]
        for row in pagerank_fixedpoint(ds, iters=4).take_all()
    }
    assert got == _pagerank_ref(PAIRS, iters=4)


def test_pagerank_symmetric_shortcut_identical(ray_session):
    from kgrecrun.ops.graph import pagerank_fixedpoint

    generic = pagerank_fixedpoint(
        _edges_ds(ray_session, PAIRS), iters=3
    ).take_all()
    shortcut = pagerank_fixedpoint(
        _edges_ds(ray_session, PAIRS), iters=3, symmetric=True
    ).take_all()
    key = lambda r: r["node"]  # noqa: E731
    assert sorted(generic, key=key) == sorted(shortcut, key=key)


def test_pagerank_broadcast_path_identical(ray_session):
    from kgrecrun.ops.graph import pagerank_fixedpoint

    exchange = pagerank_fixedpoint(
        _edges_ds(ray_session, PAIRS), iters=3
    ).take_all()
    broadcast = pagerank_fixedpoint(
        _edges_ds(ray_session, PAIRS), iters=3, symmetric=True,
        broadcast_ranks=1000,
    ).take_all()
    key = lambda r: r["node"]  # noqa: E731
    assert sorted(exchange, key=key) == sorted(broadcast, key=key)


def test_pagerank_broadcast_bound_enforced(ray_session):
    from kgrecrun.ops.graph import pagerank_fixedpoint

    with pytest.raises(ValueError, match="broadcast bound"):
        pagerank_fixedpoint(
            _edges_ds(ray_session, PAIRS), iters=1, symmetric=True,
            broadcast_ranks=3,
        )


def test_graph_components_vs_unionfind(ray_session):
    from kgrecrun.kg.unionfind import UnionFind
    from kgrecrun.ops.graph import graph_components

    uf = UnionFind()
    for u, v in PAIRS:
        uf.union(u, v)
    want = uf.components()
    got = {
        row["node"]: row["root_id"]
        for row in graph_components(_edges_ds(ray_session, PAIRS)).take_all()
    }
    assert got == want


def test_supplier_part_edges_distinct_symmetric(ray_session):
    from kgrecrun.ops.graph import supplier_part_edges

    rows = supplier_part_edges(SF_DIR).take_all()
    edges = [(r["src"], r["dst"]) for r in rows]
    assert len(edges) == len(set(edges)), "edges must be distinct"
    es = set(edges)
    assert all((d, s) in es for s, d in es), "edge list must be symmetric"
    # bipartite encoding: parts even, suppliers odd, never same parity
    assert all((s % 2) != (d % 2) for s, d in es)


def test_degree_histogram_counts(ray_session):
    from kgrecrun.ops.graph import degree_histogram

    # node 4 has degree 3; nodes 1,2,3 degree 2; nodes 5,6,7 degree 1
    hist = {
        r["degree"]: r["n_nodes"]
        for r in degree_histogram(_edges_ds(ray_session, PAIRS)).take_all()
    }
    assert hist == {1: 3, 2: 3, 3: 1}


def test_heavy_hitters_exact_and_shard_invariant(ray_session):
    from collections import Counter

    from kgrecrun.ops.heavy import heavy_hitters
    from kgrecrun.textnorm import ascii_words

    docs = (
        ["aa bb aa cc"] * 5
        + ["bb dd ee ff gg hh ii jj kk ll"] * 2
        + ["mm nn oo pp qq rr ss tt uu vv ww xx yy zz ab cd ef gh ij kl"]
    )
    cnt = Counter()
    for t in docs:
        cnt.update(ascii_words(t.lower()))
    n = sum(cnt.values())
    k = 10
    want = {w: c for w, c in cnt.items() if c * k > n}
    tbl = pa.table({"text": pa.array(docs, pa.string())})
    for shards in (1, 4):
        ds = ray_session.data.from_arrow(tbl).repartition(shards)
        got = {
            r["term"]: r["cnt"]
            for r in heavy_hitters(ds, k=k).take_all()
        }
        assert got == want, f"shards={shards}"


def test_heavy_hitters_candidate_bound(ray_session):
    """The candidate scan never emits more than k terms per block."""
    from kgrecrun.ops.heavy import heavy_hitters

    # uniform distribution: nothing is globally heavy
    docs = [f"w{i} w{i + 1} w{i + 2}" for i in range(0, 300, 3)]
    ds = ray_session.data.from_arrow(
        pa.table({"text": pa.array(docs, pa.string())})
    ).repartition(4)
    assert heavy_hitters(ds, k=5).take_all() == []


def test_user_value_ntile_matches_duckdb(ray_session):
    import duckdb

    from kgrecrun.ops.window import user_value_ntile

    got = sorted(
        (r["event_id"], r["user_id"], r["tile"])
        for r in user_value_ntile(SF_DIR, tiles=4).take_all()
    )
    con = duckdb.connect()
    want = sorted(
        map(
            tuple,
            con.execute(
                f"""
        SELECT event_id, user_id,
               CAST(ntile(4) OVER (PARTITION BY user_id
                                   ORDER BY CAST(round(value*100) AS BIGINT),
                                            event_id) AS BIGINT)
        FROM read_parquet('{SF_DIR}/events.parquet')
        """
            ).fetchall(),
        )
    )
    assert got == want


def test_bm25_topk_shard_invariant_and_tiebreak(ray_session):
    from kgrecrun.ops.rank import SCALE, bm25_topk

    docs = pa.table({
        "doc_id": pa.array(list(range(8)), pa.int64()),
        "text": pa.array([
            "alpha alpha beta",   # 0: tf(alpha)=2
            "alpha beta",         # 1: tie with 2 -> doc_id order
            "alpha beta",         # 2
            "beta beta beta",     # 3
            "gamma gamma",        # 4: no query term
            "alpha",              # 5
            "", "delta",          # 6,7: no terms
        ], pa.string()),
    })
    # reference: idf/sat recurrence on paper
    n = 8
    df = {"alpha": 4, "beta": 4}
    idf = {t: ((2 * n - 2 * d + 1) * SCALE) // (2 * d + 1)
           for t, d in df.items()}
    sat = lambda f: (11 * f * SCALE) // (5 * f + 6)  # noqa: E731
    score = {
        0: (idf["alpha"] * sat(2)) // SCALE + (idf["beta"] * sat(1)) // SCALE,
        1: (idf["alpha"] * sat(1)) // SCALE + (idf["beta"] * sat(1)) // SCALE,
        2: (idf["alpha"] * sat(1)) // SCALE + (idf["beta"] * sat(1)) // SCALE,
        3: (idf["beta"] * sat(3)) // SCALE,
        5: (idf["alpha"] * sat(1)) // SCALE,
    }
    want = sorted(score.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
    for shards in (1, 4):
        ds = ray_session.data.from_arrow(docs).repartition(shards)
        got = [
            (r["doc_id"], r["score_fp"])
            for r in bm25_topk(ds, ["alpha", "beta"], k=3).take_all()
        ]
        assert got == want, f"shards={shards}"


def test_pagerank_empty_edges(ray_session):
    from kgrecrun.ops.graph import pagerank_fixedpoint

    empty = ray_session.data.from_arrow(
        pa.table({"src": pa.array([], pa.int64()),
                  "dst": pa.array([], pa.int64())})
    )
    assert pagerank_fixedpoint(empty, iters=2).take_all() == []


def test_triangle_counts_matches_bruteforce_both_paths(ray_session):
    """triangle_counts vs an O(n^3) reference on a random graph, with
    the broadcast-edge path and the bucket_join exchange path
    producing identical tables."""
    import numpy as np
    import ray

    from kgrecrun.ops.graph import triangle_counts

    rng = np.random.RandomState(23)
    n = 50
    adj = np.triu(rng.rand(n, n) < 0.2, 1)
    src, dst = np.where(adj)
    t = pa.table({"src": pa.array(src, pa.int64()),
                  "dst": pa.array(dst, pa.int64())})
    ds = ray.data.from_arrow(t).repartition(4)

    A = adj | adj.T
    tri = np.zeros(n, dtype=np.int64)
    for a in range(n):
        for b in range(a + 1, n):
            if not A[a, b]:
                continue
            common = A[a] & A[b]
            common[: b + 1] = False
            for c in np.where(common)[0]:
                tri[a] += 1
                tri[b] += 1
                tri[c] += 1
    want = {i: int(tri[i]) for i in range(n) if tri[i]}

    for bc in (50_000_000, None):  # broadcast path, exchange path
        got = triangle_counts(ds, n_buckets=8, broadcast_edges=bc).to_pandas()
        got_d = dict(zip(got["part"], got["n_triangles"]))
        assert got_d == want, f"broadcast_edges={bc}"


def test_triangle_counts_trianglefree_and_planted(ray_session):
    """A star graph (triangle-free) yields an empty result; planting
    one closing edge yields exactly one triangle on the right nodes."""
    import ray

    from kgrecrun.ops.graph import triangle_counts

    star = [(0, i) for i in range(1, 8)]
    t = pa.table({"src": pa.array([a for a, _ in star], pa.int64()),
                  "dst": pa.array([b for _, b in star], pa.int64())})
    out = triangle_counts(ray.data.from_arrow(t), n_buckets=4).to_pandas()
    assert len(out) == 0

    closed = star + [(3, 5)]
    t2 = pa.table({"src": pa.array([a for a, _ in closed], pa.int64()),
                   "dst": pa.array([b for _, b in closed], pa.int64())})
    out2 = (triangle_counts(ray.data.from_arrow(t2), n_buckets=4)
            .to_pandas().set_index("part")["n_triangles"])
    assert dict(out2) == {0: 1, 3: 1, 5: 1}


def _bfs_ref(pairs, source, max_hops):
    """Driver-side BFS over undirected pairs."""
    adj: dict[int, set[int]] = {}
    for u, v in pairs:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    dist = {source: 0}
    frontier = [source]
    for hop in range(1, max_hops + 1):
        nxt = []
        for u in frontier:
            for v in adj.get(u, ()):
                if v not in dist:
                    dist[v] = hop
                    nxt.append(v)
        frontier = nxt
    return dist


def test_bfs_distances_matches_reference(ray_session):
    """Chain + branch + disconnected component: hop labels match a
    driver BFS, unreachable nodes are absent, max_hops truncates."""
    from kgrecrun.ops.graph import bfs_distances

    pairs = [(1, 2), (2, 3), (3, 4), (4, 5), (2, 6), (6, 7), (8, 9)]
    ds = _edges_ds(ray_session, pairs)
    for bc in (2_000_000, None):  # broadcast path, exchange path
        for hops in (2, 4):
            got = {
                row["node"]: row["dist"]
                for row in bfs_distances(
                    ds, source=1, max_hops=hops, broadcast_nodes=bc
                ).take_all()
            }
            assert got == _bfs_ref(pairs, 1, hops), f"bc={bc} hops={hops}"
    # default source = smallest node id
    got0 = {
        row["node"]: row["dist"]
        for row in bfs_distances(ds, max_hops=3).take_all()
    }
    assert got0 == _bfs_ref(pairs, 1, 3)


def test_bfs_distances_early_exit(ray_session):
    """An exhausted frontier stops before max_hops (no empty rounds)."""
    from kgrecrun.ops.graph import bfs_distances

    pairs = [(1, 2), (2, 3)]
    ds = _edges_ds(ray_session, pairs)
    for bc in (2_000_000, None):
        got = {
            row["node"]: row["dist"]
            for row in bfs_distances(
                ds, source=1, max_hops=10, broadcast_nodes=bc).take_all()
        }
        assert got == {1: 0, 2: 1, 3: 2}, f"bc={bc}"


def test_bfs_broadcast_bound_enforced(ray_session):
    """Exceeding broadcast_nodes raises instead of silently growing
    driver state (the escape hatch is broadcast_nodes=None)."""
    from kgrecrun.ops.graph import bfs_distances

    pairs = [(0, i) for i in range(1, 9)]
    ds = _edges_ds(ray_session, pairs)
    with pytest.raises(RuntimeError, match="broadcast_nodes"):
        bfs_distances(ds, source=0, max_hops=2, broadcast_nodes=4)


def test_link_prediction_toy_graph(ray_session):
    """Square 10-11-12-13: both diagonals predicted (Jaccard 1.0);
    triangle+pendant excludes ADJACENT pairs; hub cap drops middles."""
    import ray

    from kgrecrun.ops.graph import link_prediction

    # square: diagonals (10,12) and (11,13) share 2 neighbors, not edges
    sq = _edges_ds(ray_session, [(10, 11), (11, 12), (12, 13), (10, 13)])
    out = {(r["x"], r["y"]): r for r in
           link_prediction(sq, min_common=2).take_all()}
    assert set(out) == {(10, 12), (11, 13)}
    assert out[(10, 12)]["common"] == 2
    assert out[(10, 12)]["deg_x"] == 2 and out[(10, 12)]["deg_y"] == 2
    assert out[(10, 12)]["jac6"] == 1.0

    # adjacent pair (1,2) shares middles 3,4 but IS an edge → excluded
    adj = _edges_ds(ray_session, [(1, 2), (1, 3), (2, 3), (1, 4), (2, 4)])
    got = {(r["x"], r["y"]) for r in
           link_prediction(adj, min_common=2).take_all()}
    assert got == {(3, 4)}  # 3,4 share middles 1,2 and are non-adjacent

    # hub cap: star center degree 5 > cap → no pairs survive
    star = _edges_ds(ray_session, [(0, i) for i in range(1, 6)])
    assert link_prediction(
        star, min_common=1, max_middle_degree=4).count() == 0
    # without the cap the leaf pairs all share the center
    assert link_prediction(
        star, min_common=1, max_middle_degree=5).count() == 10


def test_link_prediction_duplicate_blocks(ray_session):
    """Edge lists that are only per-block distinct (the repo's edge
    contract) must not inflate counts or degrees."""
    import ray
    import ray.data
    import pyarrow as pa

    from kgrecrun.ops.graph import link_prediction

    pairs = [(10, 11), (11, 12), (12, 13), (10, 13)]
    t = pa.table({
        "src": pa.array([p[0] for p in pairs] * 2, pa.int64()),
        "dst": pa.array([p[1] for p in pairs] * 2, pa.int64()),
    })
    ds = ray.data.from_arrow(t).repartition(4)
    out = {(r["x"], r["y"]): r for r in
           link_prediction(ds, min_common=2).take_all()}
    assert set(out) == {(10, 12), (11, 13)}
    assert out[(11, 13)]["common"] == 2 and out[(11, 13)]["deg_x"] == 2


def test_clustering_coefficients_toy(ray_session):
    """Triangle + pendant: closed nodes get 1.0, the bridge 1/3,
    degree-1 nodes are excluded, triangle-free nodes report 0."""
    from kgrecrun.ops.graph import clustering_coefficients

    import ray.data

    # triangle 1-2-3, pendant 3-4, and a path 5-6-7 (6 has deg 2, t=0);
    # canonical src<dst distinct edges (the triangle_counts contract)
    pairs = [(1, 2), (1, 3), (2, 3), (3, 4), (5, 6), (6, 7)]
    ds = ray.data.from_arrow(pa.table({
        "src": pa.array([p[0] for p in pairs], pa.int64()),
        "dst": pa.array([p[1] for p in pairs], pa.int64()),
    }))
    got = {r["node"]: r for r in clustering_coefficients(ds).take_all()}
    assert set(got) == {1, 2, 3, 6}
    assert got[1]["cc6"] == 1.0 and got[2]["cc6"] == 1.0
    assert got[3]["deg"] == 3 and got[3]["n_triangles"] == 1
    assert got[3]["cc6"] == 0.333333
    assert got[6]["n_triangles"] == 0 and got[6]["cc6"] == 0.0


def test_kcore_peeling(ray_session):
    """Multi-round peeling: a 4-clique with a pendant chain — the chain
    peels over several rounds (each round only exposes the next node),
    the clique survives as the 3-core."""
    import ray.data

    from kgrecrun.ops.graph import kcore

    # 4-clique on 1..4, chain 4-5-6-7 hanging off it
    pairs = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),
             (4, 5), (5, 6), (6, 7)]
    ds = ray.data.from_arrow(pa.table({
        "src": pa.array([p[0] for p in pairs], pa.int64()),
        "dst": pa.array([p[1] for p in pairs], pa.int64()),
    }))
    got = {r["node"]: r["deg"] for r in kcore(ds, k=3).take_all()}
    assert got == {1: 3, 2: 3, 3: 3, 4: 3}
    # k=2: the whole chain peels (pendant by pendant), clique keeps
    # its full degrees
    got2 = {r["node"]: r["deg"] for r in kcore(ds, k=2).take_all()}
    assert got2 == {1: 3, 2: 3, 3: 3, 4: 3}
    # k above max degree: empty, but typed
    assert kcore(ds, k=10).count() == 0


def test_kcore_nonconvergence_raises(ray_session):
    """A long path needs one peel round per node at k=2 — the round cap
    must RAISE (the unionfind convergence rule), never return a
    partially peeled set, because the SQL oracle is unrolled to the
    same depth."""
    import pytest
    import ray.data

    from kgrecrun.ops.graph import kcore

    n = 12  # path 0-1-...-12 needs ~6 rounds from both ends at k=2
    pairs = [(i, i + 1) for i in range(n)]
    ds = ray.data.from_arrow(pa.table({
        "src": pa.array([p[0] for p in pairs], pa.int64()),
        "dst": pa.array([p[1] for p in pairs], pa.int64()),
    }))
    with pytest.raises(RuntimeError, match="max_rounds"):
        kcore(ds, k=2, max_rounds=3)
    # ample rounds: the whole path dissolves
    assert kcore(ds, k=2, max_rounds=12).count() == 0


@pytest.mark.usefixtures("ray_session")
def test_label_propagation_planted_communities():
    import ray.data

    from kgrecrun.ops.graph import label_propagation

    # two cliques {0..4} and {10..14} joined by one bridge edge 4-10
    edges = []
    for grp in (range(5), range(10, 15)):
        g = list(grp)
        edges += [(a, b) for i, a in enumerate(g) for b in g[i + 1:]]
    edges.append((4, 10))
    t = pa.table({
        "src": pa.array([a for a, _ in edges], pa.int64()),
        "dst": pa.array([b for _, b in edges], pa.int64()),
    })
    ds = ray.data.from_arrow(t).repartition(3)
    out = (label_propagation(ds, rounds=3).to_pandas()
           .sort_values("node").reset_index(drop=True))

    # driver-side reference: synchronous min-tie LPA
    import collections

    nbrs = collections.defaultdict(list)
    for a, b in edges:
        nbrs[a].append(b)
        nbrs[b].append(a)
    lab = {n: n for n in nbrs}
    for _ in range(3):
        new = {}
        for n, ns in nbrs.items():
            cnt = collections.Counter(lab[m] for m in ns)
            best = max(cnt.items(), key=lambda kv: (kv[1], -kv[0]))
            # ties -> smallest label
            top = max(cnt.values())
            new[n] = min(l for l, c in cnt.items() if c == top)
        lab = new
    assert dict(zip(out["node"], out["label"])) == lab
    # the two cliques end up in distinct communities
    labs = dict(zip(out["node"], out["label"]))
    assert len({labs[n] for n in range(5)}) == 1
    assert len({labs[n] for n in range(10, 15)}) == 1
    assert labs[0] != labs[10]


def test_pagerank_broadcast_directed_identical(ray_session):
    """Directed (asymmetric) broadcast path: dangling obj-only nodes
    carry outdeg 0 and still receive rank — identical to the exchange
    path on a directed graph with dangling nodes."""
    from kgrecrun.ops.graph import pagerank_fixedpoint

    directed = [(1, 2), (1, 3), (2, 3), (4, 3), (3, 5)]  # 5 dangles
    exchange = pagerank_fixedpoint(
        _edges_ds(ray_session, directed), iters=3
    ).take_all()
    broadcast = pagerank_fixedpoint(
        _edges_ds(ray_session, directed), iters=3, broadcast_ranks=1000
    ).take_all()
    key = lambda r: r["node"]  # noqa: E731
    assert sorted(exchange, key=key) == sorted(broadcast, key=key)
    assert {r["node"] for r in broadcast} == {1, 2, 3, 4, 5}


def test_prepartitioned_store_paths_identical(ray_session, tmp_path):
    """write_edge_store + pagerank_prepartitioned /
    components_prepartitioned: bit-identical to the exchange paths;
    the store is idempotent and a mismatched layout raises."""
    import numpy as np
    import pytest

    from kgrecrun.kg.unionfind import connected_components_distributed
    from kgrecrun.ops.graph import pagerank_fixedpoint
    from kgrecrun.ops.graphstore import (
        components_prepartitioned,
        pagerank_prepartitioned,
        write_edge_store,
    )

    rng = np.random.RandomState(3)
    u = rng.randint(0, 400, 3000).astype(np.int64)
    v = rng.randint(0, 400, 3000).astype(np.int64)
    keep = u != v
    pairs = list(zip(u[keep].tolist(), v[keep].tolist()))
    edges = _edges_ds(ray_session, pairs)
    store = str(tmp_path / "edge_store")
    meta = write_edge_store(edges, store, n_buckets=4, symmetric=True)
    assert meta["n_edges"] == 2 * len(pairs)
    # idempotent reuse; layout mismatch raises
    assert write_edge_store(edges, store, n_buckets=4, symmetric=True) == meta
    with pytest.raises(ValueError):
        write_edge_store(edges, store, n_buckets=8, symmetric=True)

    key = lambda r: r["node"]  # noqa: E731
    pr_pre = sorted(pagerank_prepartitioned(store, iters=3).take_all(), key=key)
    pr_ex = sorted(
        pagerank_fixedpoint(edges, iters=3, symmetric=True).take_all(), key=key)
    assert pr_pre == pr_ex

    cc_pre = sorted(components_prepartitioned(store).take_all(), key=key)
    cc_ex = sorted(connected_components_distributed(edges).take_all(), key=key)
    assert cc_pre == cc_ex


def test_prepartitioned_components_requires_symmetric(ray_session, tmp_path):
    from kgrecrun.ops.graphstore import (
        components_prepartitioned,
        write_edge_store,
    )
    import pytest

    edges = _edges_ds(ray_session, [(1, 2)])
    store = str(tmp_path / "asym_store")
    write_edge_store(edges, store, n_buckets=2, symmetric=False)
    with pytest.raises(ValueError):
        components_prepartitioned(store)


def test_sssp_prepartitioned_identical(ray_session, tmp_path):
    """sssp_prepartitioned over a weighted symmetric edge store is
    bit-identical to the broadcast sssp_distances — both before the
    fixpoint (rounds=2 exercises the exact-d_rounds contract) and
    converged (rounds=12) — and refuses unweighted/asymmetric stores.
    The distance table lives in per-bucket object-store vectors; the
    driver never holds a node-order array (round-4 VERDICT item 2)."""
    import numpy as np
    import pytest

    from kgrecrun.ops.graph import sssp_distances
    from kgrecrun.ops.graphstore import sssp_prepartitioned, write_edge_store

    rng = np.random.RandomState(7)
    u = rng.randint(0, 300, 2000).astype(np.int64)
    v = rng.randint(0, 300, 2000).astype(np.int64)
    keep = u != v
    u, v = u[keep], v[keep]
    w = 1 + (u + v) % 7

    asym = ray_session.data.from_arrow(pa.table({
        "src": pa.array(u, pa.int64()),
        "dst": pa.array(v, pa.int64()),
        "w": pa.array(w, pa.int64()),
    }))
    sym = ray_session.data.from_arrow(pa.table({
        "src": pa.array(np.concatenate([u, v]), pa.int64()),
        "dst": pa.array(np.concatenate([v, u]), pa.int64()),
        "w": pa.array(np.concatenate([w, w]), pa.int64()),
    }))
    store = str(tmp_path / "w_store")
    meta = write_edge_store(sym, store, n_buckets=4, symmetric=True,
                            weighted=True)
    assert meta["weighted"] is True

    key = lambda r: r["node"]  # noqa: E731
    for rounds in (2, 12):
        a = sorted(sssp_distances(asym, rounds=rounds).take_all(), key=key)
        b = sorted(sssp_prepartitioned(store, rounds=rounds).take_all(),
                   key=key)
        assert a == b

    unweighted = str(tmp_path / "uw_store")
    write_edge_store(sym.drop_columns(["w"]), unweighted, n_buckets=2,
                     symmetric=True)
    with pytest.raises(ValueError):
        sssp_prepartitioned(unweighted)
    asym_store = str(tmp_path / "aw_store")
    write_edge_store(asym, asym_store, n_buckets=2, symmetric=False,
                     weighted=True)
    with pytest.raises(ValueError):
        sssp_prepartitioned(asym_store)


# ------------------------------------------------------------- HITS

DIRECTED_PAIRS = [(1, 10), (1, 11), (2, 10), (2, 12), (3, 10),
                  (3, 11), (3, 12), (3, 13), (4, 13), (10, 1)]


def _directed_ds(ray, pairs, shards=1):
    return ray.data.from_arrow(
        pa.table({"src": pa.array([u for u, _ in pairs], pa.int64()),
                  "dst": pa.array([v for _, v in pairs], pa.int64())})
    ).repartition(shards)


def _hits_ref(pairs, iters, scale=10**6):
    """Driver-side mirror of the integer fixed-point HITS recurrence."""
    nodes = sorted({u for u, _ in pairs} | {v for _, v in pairs})
    h = {n: scale for n in nodes}
    a = {n: 0 for n in nodes}

    def half(vec, flip):
        raw = {n: 0 for n in nodes}
        for u, v in pairs:
            if flip:
                raw[u] += vec[v]
            else:
                raw[v] += vec[u]
        m = max(raw.values())
        if m == 0:
            return raw
        return {n: (raw[n] * scale) // m for n in nodes}

    for _ in range(iters):
        a = half(h, flip=False)
        h = half(a, flip=True)
    return h, a


def test_hits_matches_reference_recurrence(ray_session):
    from kgrecrun.ops.graph import hits_fixedpoint

    h_ref, a_ref = _hits_ref(DIRECTED_PAIRS, iters=2)
    rows = hits_fixedpoint(
        _directed_ds(ray_session, DIRECTED_PAIRS), iters=2).take_all()
    assert {r["node"]: r["hub_fp"] for r in rows} == h_ref
    assert {r["node"]: r["auth_fp"] for r in rows} == a_ref
    # node 3 points at every authority -> top hub at full scale;
    # node 10 has the most in-links -> top authority at full scale
    assert h_ref[3] == 10**6 and a_ref[10] == 10**6


def test_hits_shard_invariant(ray_session):
    from kgrecrun.ops.graph import hits_fixedpoint

    base = sorted(
        tuple(r.values()) for r in hits_fixedpoint(
            _directed_ds(ray_session, DIRECTED_PAIRS, shards=1),
            iters=3).take_all())
    sharded = sorted(
        tuple(r.values()) for r in hits_fixedpoint(
            _directed_ds(ray_session, DIRECTED_PAIRS, shards=5),
            iters=3).take_all())
    assert base == sharded


def test_hits_broadcast_bound_enforced(ray_session):
    from kgrecrun.ops.graph import hits_fixedpoint

    with pytest.raises(ValueError, match="broadcast bound"):
        hits_fixedpoint(_directed_ds(ray_session, DIRECTED_PAIRS),
                        iters=1, broadcast_nodes=3).take_all()


def test_sssp_prepartitioned_absent_source(ray_session, tmp_path):
    """A source that is no graph endpoint still gets [(source, 0)] —
    the same contract as sssp_distances (round-5 review finding: the
    store path silently returned an empty table)."""
    import numpy as np

    from kgrecrun.ops.graphstore import sssp_prepartitioned, write_edge_store

    sym = ray_session.data.from_arrow(pa.table({
        "src": pa.array([1, 2], pa.int64()),
        "dst": pa.array([2, 1], pa.int64()),
        "w": pa.array([3, 3], pa.int64()),
    }))
    store = str(tmp_path / "tiny_w_store")
    write_edge_store(sym, store, n_buckets=2, symmetric=True,
                     weighted=True)
    out = sssp_prepartitioned(store, source=99, rounds=4).take_all()
    assert out == [{"node": 99, "dist": 0}]
