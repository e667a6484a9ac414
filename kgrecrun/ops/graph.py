"""Graph analytics over relational edge lists — the query-side
companions to the KG "graph materialize" stage (SURVEY.md §2.4): once
triples/adjacency land in partitioned Parquet, these are the standard
follow-on computations (degree profiles, importance ranking, component
labeling) a KG consumer runs.

Edges are a ``(src, dst)`` int64 Dataset. The demo graph is the
supplier–part bipartite graph from ``lineitem`` (node encoding
``part → 2·p_partkey``, ``supplier → 2·s_suppkey + 1`` keeps the two
key spaces disjoint in one int64 column), but every operator takes any
edge Dataset.

Scale notes:
- ``distinct`` edges: per-batch ``np.unique`` combiner first, so the
  global distinct shuffle carries at most one copy of each edge per
  block — the hot-edge analogue of the term_stats combiner.
- ``pagerank_fixedpoint`` is **integer fixed-point** PageRank: ranks
  are int64 scaled by 1e12 and every step is floor arithmetic
  (``rank // outdeg``, ``(d_num · Σ) // d_den``). Float PageRank sums
  are summation-order-dependent and therefore NOT reproducible across
  engines (or even across reduce trees); the fixed-point variant is
  bit-exact vs a chained-CTE DuckDB oracle AND run-to-run — the same
  determinism-over-ulps trade the repo's cents arithmetic makes.
  Per iteration: one bucket_join (ranks → edges on src), one
  ``groupby(dst).sum`` fold, one left-outer bucket_join back onto the
  node set — 3 key-partitioned exchanges of (edge | node)-order rows,
  the canonical Pregel-style round. Rank/node tables are materialized
  per round (node-set-bounded, object-store-resident). On a cluster,
  pre-partitioning edges by src (see asof_join_prepartitioned) removes
  the per-round edge exchange entirely; iteration count is the knob —
  this is a ranking signal, not a convergence study, so small fixed
  ``iters`` is the intended use.
- dangling nodes (out-degree 0) contribute no mass (their share is
  dropped, the common simplification); with symmetric edge lists every
  node has out-edges so the case never arises there.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .cogroup import bucket_join

PR_SCALE = 10**12


def _i64(name: str) -> pa.Field:
    return pa.field(name, pa.int64())


EDGE_SCHEMA = pa.schema([_i64("src"), _i64("dst")])


def supplier_part_edges(sf_dir: str, *, max_quantity: int | None = None,
                        directed: bool = False):
    """Distinct symmetric supplier–part edges from lineitem.

    ``max_quantity`` keeps only lineitems with ``l_quantity <=
    max_quantity`` — a sparser subgraph that splits into multiple
    components (used by :func:`graph_components`); ``None`` keeps all.
    ``directed=True`` emits only supplier→part edges (no reverse
    direction) — the bipartite DIRECTED graph :func:`hits_fixedpoint`
    ranks (suppliers are hub candidates, parts authority candidates).
    """
    import ray.data

    cols = ["l_partkey", "l_suppkey"] + (
        ["l_quantity"] if max_quantity is not None else []
    )
    ds = ray.data.read_parquet(f"{sf_dir}/lineitem.parquet", columns=cols)

    def encode(batch: pa.Table) -> pa.Table:
        t = batch
        if max_quantity is not None:
            t = t.filter(pc.less_equal(t["l_quantity"], max_quantity))
        p = pc.cast(t["l_partkey"], pa.int64()).combine_chunks().to_numpy(
            zero_copy_only=False
        )
        s = pc.cast(t["l_suppkey"], pa.int64()).combine_chunks().to_numpy(
            zero_copy_only=False
        )
        a = p * 2
        b = s * 2 + 1
        # both directions; per-batch distinct (combiner for the global
        # distinct shuffle). Edges travel as ONE packed int64 — the
        # global distinct then groups by a 256-value hash bucket and
        # np.uniques inside, instead of a full high-cardinality
        # (src,dst) sort (measured 13.2 s → bucketed sweep ~2 s at 1.2M
        # edges: Ray's sort cost is driven by key cardinality/width)
        if directed:
            src, dst = b, a
        else:
            src = np.concatenate([a, b])
            dst = np.concatenate([b, a])
        k = np.unique((src << np.int64(32)) | dst)
        return pa.table({"k": pa.array(k, pa.int64())})

    from ..kg.unionfind import hash_bucket

    def tag(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "__bucket", hash_bucket(batch["k"].combine_chunks(), 256)
        )

    def distinct_bucket(group: pa.Table) -> pa.Table:
        k = np.unique(
            group["k"].combine_chunks().to_numpy(zero_copy_only=False)
        )
        return pa.table({
            "src": pa.array(k >> np.int64(32), pa.int64()),
            "dst": pa.array(k & np.int64(0xFFFFFFFF), pa.int64()),
        })

    dedup = (
        ds.map_batches(encode, batch_format="pyarrow", zero_copy_batch=True)
        .map_batches(tag, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(distinct_bucket, batch_format="pyarrow")
    )
    # coalesce the per-group output blocks; every downstream sort pays
    # per-block cost (memory note: 64 near-empty blocks ≈ 2× the sort
    # cost of 8 full)
    return dedup.repartition(16)


def degree_histogram(edges_ds):
    """→ Dataset (degree, n_nodes): how many nodes have each
    out-degree. Two grouped folds, both with Ray's built-in partial
    aggregation; rows after the first fold = node count, after the
    second = distinct-degree count."""
    def partial(b: pa.Table) -> pa.Table:
        # map-side combiner: the shuffle carries ≤ |nodes in block|
        # (src, partial-count) rows instead of one row per edge
        return (
            b.select(["src"]).group_by("src").aggregate([([], "count_all")])
            .rename_columns(["src", "d"])
        )

    deg = (
        edges_ds.map_batches(partial, batch_format="pyarrow")
        .groupby("src")
        .sum("d")
    )

    def rename(b: pa.Table) -> pa.Table:
        return pa.table({"degree": pc.cast(b.column(1), pa.int64())})

    hist = (
        deg.map_batches(rename, batch_format="pyarrow")
        .groupby("degree")
        .count()
    )
    return hist.map_batches(
        lambda b: pa.table({
            "degree": pc.cast(b["degree"], pa.int64()),
            "n_nodes": pc.cast(b.column(1), pa.int64()),
        }),
        batch_format="pyarrow",
    )


def pagerank_fixedpoint(
    edges_ds,
    *,
    iters: int = 3,
    scale: int = PR_SCALE,
    d_num: int = 85,
    d_den: int = 100,
    symmetric: bool = False,
    broadcast_ranks: int | None = None,
):
    """Deterministic integer fixed-point PageRank (see module
    docstring). → Dataset (node, rank_fp:int64).

    r₀(v) = scale // N;  base = ((d_den−d_num)·(scale//N)) // d_den
    rₜ₊₁(v) = base + (d_num · Σ_{u→v} (rₜ(u) // outdeg(u))) // d_den

    ``symmetric=True`` asserts the edge list contains (v,u) for every
    (u,v): then every node has in-edges, the per-round grouped sum
    already covers the full node set, and the left-outer fold back onto
    ``nodes`` (one bucket-cogroup exchange per round) is skipped —
    identical output, 2 exchanges per round instead of 3.

    ``broadcast_ranks=N`` asserts the node set is ≤ N (catalog-order,
    e.g. a parts+suppliers graph or an entity catalog — NOT
    corpus-order): the rank table is then ``ray.put`` once per round
    and joined map-side, so a round costs ONE exchange of per-block
    (node, partial-sum) combiner rows instead of re-shuffling the edge
    list — the broadcast_lookup trade (ops/joins.py) applied to the
    Pregel loop. Raises if the node count exceeds the bound. Identical
    output to the exchange paths (tests/test_graph.py).
    """
    edges = edges_ds.materialize()
    from ..kg.unionfind import hash_bucket

    # outdeg: map-side combiner partials, folded per hash BUCKET (a
    # 256-value int32 sort) instead of per src — Ray's sort-groupby at
    # node-order key cardinality cost 12.5 s vs ~2 s bucketed at 2M
    # edges / 200k nodes (tools/graph_stress.py calibration)
    def od_partial(b: pa.Table) -> pa.Table:
        t = (
            b.select(["src"]).group_by("src").aggregate([([], "count_all")])
            .rename_columns(["src", "odp"])
        )
        return t.append_column(
            "__bucket", hash_bucket(t["src"].combine_chunks(), 256)
        )

    def od_fold(group: pa.Table) -> pa.Table:
        agg = (
            group.select(["src", "odp"]).group_by("src")
            .aggregate([("odp", "sum")])
        )
        return pa.table({
            "src": pc.cast(agg["src"], pa.int64()),
            "od": pc.cast(agg["odp_sum"], pa.int64()),
        })

    outdeg = (
        edges.map_batches(od_partial, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(od_fold, batch_format="pyarrow")
    )

    def _empty():
        import ray.data

        return ray.data.from_arrow(
            pa.table({"node": pa.array([], pa.int64()),
                      "rank_fp": pa.array([], pa.int64())})
        )

    if broadcast_ranks is not None:
        # the collected outdeg table provides the src set (bounded by
        # the caller's contract) — no nodes dataset, no edge join at
        # all. Symmetric graphs: src set IS the node set. Directed
        # graphs: union in the dst-only (dangling) nodes with outdeg 0
        # — they receive rank but never divide (contrib indexes od by
        # edge src only, and every src has od ≥ 1 by construction).
        od_tbl = _collect(outdeg)
        src_np = od_tbl["src"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.argsort(src_np)
        src_np = src_np[order]
        src_od = od_tbl["od"].combine_chunks().to_numpy(
            zero_copy_only=False)[order]
        if symmetric:
            node_np, od_np = src_np, src_od
        else:
            def dst_partial(b: pa.Table) -> pa.Table:
                u = np.unique(
                    b["dst"].combine_chunks().to_numpy(zero_copy_only=False))
                return pa.table({"dst": pa.array(u, pa.int64())})

            dst_tbl = _collect(
                edges.map_batches(dst_partial, batch_format="pyarrow"))
            node_np = np.union1d(
                src_np,
                dst_tbl["dst"].combine_chunks().to_numpy(
                    zero_copy_only=False))
            od_np = np.zeros(len(node_np), dtype=np.int64)
            od_np[np.searchsorted(node_np, src_np)] = src_od
        n_nodes = len(node_np)
        if n_nodes == 0:
            return _empty()
        if n_nodes > broadcast_ranks:
            raise ValueError(
                f"node set ({n_nodes}) exceeds the caller's broadcast "
                f"bound ({broadcast_ranks}) — use the exchange path"
            )
        r_init = scale // n_nodes
        base = ((d_den - d_num) * r_init) // d_den
        return _pagerank_broadcast(
            edges, node_np, od_np, iters=iters, r_init=r_init, base=base,
            d_num=d_num, d_den=d_den,
        )

    ewd = bucket_join(
        edges, outdeg, key="src",
        left_schema=EDGE_SCHEMA,
        right_schema=pa.schema([_i64("src"), _i64("od")]),
    ).repartition(16).materialize()

    # node set via the same bucketed-distinct pattern
    def node_partial(b: pa.Table) -> pa.Table:
        both = np.unique(np.concatenate([
            b["src"].combine_chunks().to_numpy(zero_copy_only=False),
            b["dst"].combine_chunks().to_numpy(zero_copy_only=False),
        ]))
        t = pa.table({"node": pa.array(both, pa.int64())})
        return t.append_column(
            "__bucket", hash_bucket(t["node"].combine_chunks(), 256)
        )

    def node_fold(group: pa.Table) -> pa.Table:
        u = np.unique(
            group["node"].combine_chunks().to_numpy(zero_copy_only=False)
        )
        return pa.table({"node": pa.array(u, pa.int64())})

    nodes = (
        edges.map_batches(node_partial, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(node_fold, batch_format="pyarrow")
        .repartition(8)
        .materialize()
    )
    n_nodes = nodes.count()
    if n_nodes == 0:
        return _empty()
    r_init = scale // n_nodes
    base = ((d_den - d_num) * r_init) // d_den
    node_schema = pa.schema([_i64("node")])
    rank_schema = pa.schema([_i64("node"), _i64("rank_fp")])

    ranks = nodes.map_batches(
        lambda b: b.append_column(
            "rank_fp", pa.nulls(b.num_rows, pa.int64()).fill_null(r_init)
        ),
        batch_format="pyarrow",
    ).materialize()
    # node-order tables stay at a fixed small block count between
    # rounds (same reasoning as unionfind's n_label_blocks)
    n_rank_blocks = 8

    for _ in range(iters):
        # attach each sender's current rank to its outgoing edges
        sends = bucket_join(
            ewd,
            ranks.map_batches(
                lambda b: b.rename_columns(["src", "rank_fp"]),
                batch_format="pyarrow",
            ),
            key="src",
            left_schema=pa.schema([_i64("src"), _i64("dst"), _i64("od")]),
            right_schema=pa.schema([_i64("src"), _i64("rank_fp")]),
        )

        def contrib(b: pa.Table) -> pa.Table:
            r = b["rank_fp"].combine_chunks().to_numpy(zero_copy_only=False)
            o = b["od"].combine_chunks().to_numpy(zero_copy_only=False)
            t = pa.table({
                "node": b["dst"],
                "c": pa.array(r // o, pa.int64()),
            })
            # map-side combiner: the global fold shuffles ≤ |nodes in
            # block| partials instead of one row per edge
            t = (
                t.group_by("node").aggregate([("c", "sum")])
                .rename_columns(["node", "c"])
            )
            from ..kg.unionfind import hash_bucket

            return t.append_column(
                "__bucket", hash_bucket(t["node"].combine_chunks(), 256)
            )

        def sum_fold(group: pa.Table) -> pa.Table:
            agg = (
                group.select(["node", "c"]).group_by("node")
                .aggregate([("c", "sum")])
            )
            return pa.table({
                "node": pc.cast(agg["node"], pa.int64()),
                "c": pc.cast(agg["c_sum"], pa.int64()),
            })

        # bucketed fold (256-value int32 sort) — a groupby(node) here
        # re-pays the node-order sort cardinality every round
        sums = (
            sends.map_batches(contrib, batch_format="pyarrow")
            .groupby("__bucket")
            .map_groups(sum_fold, batch_format="pyarrow")
        )
        if symmetric:
            def apply_direct(b: pa.Table) -> pa.Table:
                s = pc.cast(b.column(1), pa.int64()).combine_chunks().to_numpy(
                    zero_copy_only=False
                )
                return pa.table({
                    "node": pc.cast(b["node"], pa.int64()),
                    "rank_fp": pa.array(
                        base + (d_num * s) // d_den, pa.int64()
                    ),
                })

            ranks = sums.map_batches(
                apply_direct, batch_format="pyarrow"
            ).repartition(n_rank_blocks).materialize()
            continue
        folded = bucket_join(
            nodes,
            sums.map_batches(
                lambda b: pa.table({
                    "node": pc.cast(b["node"], pa.int64()),
                    "s": pc.cast(b.column(1), pa.int64()),
                }),
                batch_format="pyarrow",
            ),
            key="node",
            join_type="left outer",
            left_schema=node_schema,
            right_schema=pa.schema([_i64("node"), _i64("s")]),
        )

        def apply(b: pa.Table) -> pa.Table:
            s = b["s"].combine_chunks().fill_null(0).to_numpy(
                zero_copy_only=False
            )
            return pa.table({
                "node": b["node"],
                "rank_fp": pa.array(base + (d_num * s) // d_den, pa.int64()),
            })

        ranks = (
            folded.map_batches(apply, batch_format="pyarrow")
            .repartition(n_rank_blocks)
            .materialize()
        )

    return ranks


def _collect(ds) -> pa.Table:
    return pa.concat_tables(
        list(ds.iter_batches(batch_format="pyarrow", batch_size=None))
    )


def _pagerank_broadcast(edges, node_np, od_np, *, iters, r_init, base,
                        d_num, d_den):
    """Broadcast-ranks Pregel rounds (see pagerank_fixedpoint): the
    (sorted node, outdeg) vectors broadcast once and the rank vector
    once per round; edges NEVER shuffle — not even once for the outdeg
    attach — and the only cross-task traffic is the per-block
    (node, partial-sum) combiner rows folded into the rank vector.

    Execution note: like ``kcore``, the serially-dependent rounds run
    as plain ``ray.remote`` tasks over the ONCE-cached Arrow edge-block
    refs — per-round Dataset executor startup dwarfed the millisecond
    numpy round work (same measurement, see kcore docstring)."""
    import ray
    import ray.data

    n_nodes = len(node_np)
    rank_np = np.full(n_nodes, r_init, dtype=np.int64)
    block_refs = list(edges.materialize().to_arrow_refs())
    static_ref = ray.put((node_np, od_np))

    @ray.remote
    def contrib_bc(block: pa.Table, static, rv: np.ndarray):
        nv, ov = static
        s = block["src"].combine_chunks().to_numpy(zero_copy_only=False)
        d = block["dst"].combine_chunks().to_numpy(zero_copy_only=False)
        i = np.searchsorted(nv, s)
        c = rv[i] // ov[i]
        nodes, inv = np.unique(d, return_inverse=True)
        # integer segment-sum combiner (bincount's float64 weights
        # would break bit-exactness above 2^53)
        sums = np.zeros(len(nodes), dtype=np.int64)
        np.add.at(sums, inv, c)
        return nodes, sums

    for _ in range(iters):
        rank_ref = ray.put(rank_np)
        parts = ray.get([contrib_bc.remote(br, static_ref, rank_ref)
                         for br in block_refs])
        s_vec = np.zeros(n_nodes, dtype=np.int64)
        for nodes, sums in parts:
            if len(nodes):
                np.add.at(s_vec, np.searchsorted(node_np, nodes), sums)
        rank_np = base + (d_num * s_vec) // d_den

    return ray.data.from_arrow(
        pa.table({
            "node": pa.array(node_np, pa.int64()),
            "rank_fp": pa.array(rank_np, pa.int64()),
        })
    )


HITS_SCALE = 10**6


def hits_fixedpoint(
    edges_ds,
    *,
    iters: int = 2,
    scale: int = HITS_SCALE,
    broadcast_nodes: int = 50_000_000,
):
    """Deterministic integer fixed-point HITS (hubs & authorities,
    Kleinberg) over a DIRECTED (src, dst) edge Dataset
    → Dataset (node, hub_fp:int64, auth_fp:int64).

    Per iteration, both steps in exact integer arithmetic:

        a_raw(v) = Σ_{u→v} h(u);   a(v) = (a_raw(v) · scale) // max(a_raw)
        h_raw(u) = Σ_{u→v} a(v);   h(u) = (h_raw(u) · scale) // max(h_raw)

    with h₀ ≡ scale. Max-normalization (instead of the textbook L2
    norm) keeps every value a nonnegative int64, so sums are
    order-free and the output is bit-equal to the chained-CTE DuckDB
    oracle AND run-to-run — the same determinism-over-ulps trade as
    ``pagerank_fixedpoint``. ``scale`` is 10⁶ (not pagerank's 10¹²)
    because the rescale multiplies a raw in-sum (≤ scale·max_deg) by
    ``scale`` — the guard asserts the product fits int64.

    Execution mirrors ``_pagerank_broadcast``: the sorted node vector
    broadcasts once, the hub/authority vectors once per half-round;
    edge blocks are cached ONCE as Arrow refs and every half-round is
    one wave of plain ``ray.remote`` tasks returning per-block
    (node, partial-sum) combiner rows — edges never shuffle. Node set
    must be catalog-order (≤ ``broadcast_nodes``; raises beyond —
    corpus-order graphs want a prepartitioned two-copy edge store,
    see ops/graphstore.py).
    """
    import ray
    import ray.data

    edges = edges_ds.materialize()

    def node_partial(b: pa.Table) -> pa.Table:
        u = np.unique(np.concatenate([
            b["src"].combine_chunks().to_numpy(zero_copy_only=False),
            b["dst"].combine_chunks().to_numpy(zero_copy_only=False),
        ]))
        return pa.table({"node": pa.array(u, pa.int64())})

    node_tbl = _collect(edges.map_batches(node_partial,
                                          batch_format="pyarrow"))
    if node_tbl.num_rows == 0:
        return ray.data.from_arrow(pa.table({
            "node": pa.array([], pa.int64()),
            "hub_fp": pa.array([], pa.int64()),
            "auth_fp": pa.array([], pa.int64()),
        }))
    node_np = np.unique(
        node_tbl["node"].combine_chunks().to_numpy(zero_copy_only=False))
    n_nodes = len(node_np)
    if n_nodes > broadcast_nodes:
        raise ValueError(
            f"node set ({n_nodes}) exceeds the caller's broadcast bound "
            f"({broadcast_nodes}) — use a prepartitioned edge store")

    block_refs = list(edges.to_arrow_refs())
    node_ref = ray.put(node_np)

    @ray.remote
    def half_round(block: pa.Table, nv: np.ndarray, vec: np.ndarray,
                   from_col: str, to_col: str):
        s = block[from_col].combine_chunks().to_numpy(zero_copy_only=False)
        d = block[to_col].combine_chunks().to_numpy(zero_copy_only=False)
        c = vec[np.searchsorted(nv, s)]
        targets, inv = np.unique(d, return_inverse=True)
        sums = np.zeros(len(targets), dtype=np.int64)
        np.add.at(sums, inv, c)  # integer segment sum — order-free
        return targets, sums

    def sweep(vec: np.ndarray, from_col: str, to_col: str) -> np.ndarray:
        vec_ref = ray.put(vec)
        parts = ray.get([
            half_round.remote(br, node_ref, vec_ref, from_col, to_col)
            for br in block_refs])
        raw = np.zeros(n_nodes, dtype=np.int64)
        for targets, sums in parts:
            if len(targets):
                np.add.at(raw, np.searchsorted(node_np, targets), sums)
        m = int(raw.max())
        if m == 0:
            return raw  # no edges in this direction — all-zero scores
        if m > (2**63 - 1) // scale:
            raise OverflowError(
                f"HITS rescale overflow: max raw sum {m} · scale {scale} "
                "exceeds int64 — lower scale or split the graph")
        return (raw * scale) // m

    hub = np.full(n_nodes, scale, dtype=np.int64)
    auth = np.zeros(n_nodes, dtype=np.int64)
    for _ in range(iters):
        auth = sweep(hub, "src", "dst")
        hub = sweep(auth, "dst", "src")

    return ray.data.from_arrow(pa.table({
        "node": pa.array(node_np, pa.int64()),
        "hub_fp": pa.array(hub, pa.int64()),
        "auth_fp": pa.array(auth, pa.int64()),
    }))


def graph_components(edges_ds):
    """Component labeling of an edge Dataset → (node, root_id), root =
    smallest member — the same labeling the recursive-CTE SQL oracle
    computes. Integer node ids take the broadcast raw-task CC
    (zero per-round exchange over once-cached edge blocks, the kcore
    pattern — measured 52.5 s → seconds at sf0.01); string ids or
    oversized node domains take the distributed min-label propagation
    (kg/unionfind.py)."""
    from ..kg.unionfind import connected_components

    labels = connected_components(edges_ds)
    return labels.map_batches(
        lambda b: b.rename_columns(["node", "root_id"]),
        batch_format="pyarrow",
    )


def _pairs_within_segments(w: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """All ordered index pairs (i < j) inside contiguous segments, fully
    vectorized. ``w`` is each element's 0-based within-segment position;
    returns (i, j) index arrays into the flattened layout — element j
    pairs with the w[j] elements immediately before it."""
    total = int(w.sum())
    j = np.repeat(np.arange(len(w), dtype=np.int64), w)
    base = np.repeat(np.arange(len(w), dtype=np.int64) - w, w)
    starts = np.concatenate([[0], np.cumsum(w)[:-1]]) if len(w) else np.array([], np.int64)
    step = np.arange(total, dtype=np.int64) - np.repeat(starts, w)
    return base + step, j


def _segment_positions(keys: np.ndarray) -> np.ndarray:
    """0-based within-segment position for a SORTED key array."""
    n = len(keys)
    if n == 0:
        return np.array([], np.int64)
    new_seg = np.empty(n, dtype=bool)
    new_seg[0] = True
    np.not_equal(keys[1:], keys[:-1], out=new_seg[1:])
    idx = np.arange(n, dtype=np.int64)
    seg_start = idx[new_seg]
    seg_id = np.cumsum(new_seg) - 1
    return idx - seg_start[seg_id]


def copurchase_edges(sf_dir: str, *, n_buckets: int = 256):
    """Distinct part–part co-purchase edges: parts appearing in the
    same order, canonical ``src < dst`` (raw partkeys). Two bucketed
    shuffles, dispatch capped at n_buckets at any corpus size:

    1. bucket by ``hash(orderkey)`` — within a bucket, sort the packed
       ``(orderkey<<32)|partkey`` ids (lexicographic == (o, p) sort),
       drop consecutive duplicates, and emit every within-order pair
       via the vectorized segment-pair sweep. Pair fan-out per order is
       bounded by the lines-per-order cap (≤7 in TPC-H-shaped data), so
       this stage is linear, not quadratic, in corpus size.
    2. bucket by ``hash(packed edge)`` — np.unique inside the bucket
       dedupes pairs that co-occurred in many orders (per-bucket
       combiner ran in stage 1 already).

    int64-packing contract: orderkey and partkey must each fit 32 bits
    (TPC-H sf ≤ ~700 does).
    """
    import ray.data

    from ..kg.unionfind import hash_bucket

    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
    )

    def pack_op(batch: pa.Table) -> pa.Table:
        o = pc.cast(batch["l_orderkey"], pa.int64()).combine_chunks().to_numpy(
            zero_copy_only=False
        )
        p = pc.cast(batch["l_partkey"], pa.int64()).combine_chunks().to_numpy(
            zero_copy_only=False
        )
        op = np.unique((o << np.int64(32)) | p)
        t = pa.table({"op": pa.array(op, pa.int64())})
        return t.append_column(
            "__bucket",
            hash_bucket(pa.array(op >> np.int64(32), pa.int64()), n_buckets),
        )

    def pairs_bucket(group: pa.Table) -> pa.Table:
        op = np.unique(
            group["op"].combine_chunks().to_numpy(zero_copy_only=False)
        )  # sorted → (o, p) lexicographic, distinct
        o = op >> np.int64(32)
        p = op & np.int64(0xFFFFFFFF)
        w = _segment_positions(o)
        i, j = _pairs_within_segments(w)
        # within an order, p is strictly increasing → p[i] < p[j]
        k = np.unique((p[i] << np.int64(32)) | p[j])
        t = pa.table({"k": pa.array(k, pa.int64())})
        return t.append_column(
            "__bucket2", hash_bucket(t["k"].combine_chunks(), n_buckets)
        )

    def distinct_bucket(group: pa.Table) -> pa.Table:
        k = np.unique(group["k"].combine_chunks().to_numpy(zero_copy_only=False))
        return pa.table({
            "src": pa.array(k >> np.int64(32), pa.int64()),
            "dst": pa.array(k & np.int64(0xFFFFFFFF), pa.int64()),
        })

    edges = (
        ds.map_batches(pack_op, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__bucket")
        .map_groups(pairs_bucket, batch_format="pyarrow")
        .groupby("__bucket2")
        .map_groups(distinct_bucket, batch_format="pyarrow")
    )
    return edges.repartition(16)


def triangle_counts(edges_ds, *, n_buckets: int = 256,
                    broadcast_edges: int | None = 50_000_000):
    """Per-node triangle participation counts over a distinct
    undirected edge list (``src < dst`` by id) — the degree-oriented
    wedge algorithm, every stage a bounded-dispatch bucket cogroup:

    1. degrees per node (map-side partials, native groupby-sum);
    2. attach deg to both endpoints (two bucket_joins), orient each
       edge from its (deg, id)-smaller endpoint — out-degree is then
       O(√m) for any node, the classic bound that makes wedge volume
       O(m^1.5) instead of Σ deg² (hot nodes are wedge MIDDLES, never
       wedge sources);
    3. wedges: bucket by hash(u), sort (u, v), emit out-neighbor pairs
       (x < y by id) via the segment-pair sweep, packed as
       ``(x<<32)|y``;
    4. close the wedges against the canonical edge set;
    5. per-node +1 for all three corners → (part, n_triangles) via
       map-side partials + native groupby-sum.

    Steps 2 and 4 have two physical paths, the same broadcast-vs-
    exchange trade as ``pagerank_fixedpoint``: when the DISTINCT edge
    set fits the ``broadcast_edges`` bound (packed int64, 8 B/edge —
    part catalogs are catalog-order even when the corpus is 100 TB),
    it is ``ray.put`` once as a sorted array, degrees/orientation are
    searchsorted lookups folded into the map side (no bucket_joins),
    and every wedge task closes its own wedges with a vectorized
    searchsorted — the O(m^1.5) wedge set NEVER leaves the task that
    generated it (measured 48.6 s → 15.5 s wall at 1.2M edges / ~75M
    wedges / 1.88M triangles, sf0.1, 32 cpus). Larger edge sets fall
    back to the fully-distributed path: two bucket_joins to attach
    degrees, then a left-semi bucket_join of wedge rows against packed
    edges — bounded-dispatch exchanges of (edge | wedge)-order rows.

    Output: one row per node in ≥1 triangle. Exact (the orientation is
    a bijection on triangles), deterministic, no driver state beyond
    the optional broadcast edge array.
    """
    import ray

    from ..kg.unionfind import hash_bucket

    edges_ds = edges_ds.materialize()
    n_edges = edges_ds.count()
    use_broadcast = broadcast_edges is not None and n_edges <= broadcast_edges

    def _gen_wedges(group: pa.Table):
        u = group["u"].combine_chunks().to_numpy(zero_copy_only=False)
        v = group["v"].combine_chunks().to_numpy(zero_copy_only=False)
        # sort by (u, v-id): out-neighbor lists contiguous and id-sorted
        order = np.lexsort((v, u))
        u, v = u[order], v[order]
        w = _segment_positions(u)
        i, j = _pairs_within_segments(w)
        # v[i] < v[j] by id → packed wedge matches canonical src<dst edges
        return (v[i] << np.int64(32)) | v[j], u[j], v[i], v[j]

    if use_broadcast:
        packed = np.sort(
            np.concatenate([
                (t["src"].to_numpy(zero_copy_only=False) << np.int64(32))
                | t["dst"].to_numpy(zero_copy_only=False)
                for t in ray.get(edges_ds.to_arrow_refs())
            ] or [np.array([], np.int64)])
        )
        src_all = packed >> np.int64(32)
        dst_all = packed & np.int64(0xFFFFFFFF)
        nodes, degs = np.unique(
            np.concatenate([src_all, dst_all]), return_counts=True
        )
        edge_ref = ray.put(packed)
        deg_ref = ray.put((nodes, degs))

        def orient_close_bucket(batch: pa.Table) -> pa.Table:
            s = batch["src"].combine_chunks().to_numpy(zero_copy_only=False)
            d = batch["dst"].combine_chunks().to_numpy(zero_copy_only=False)
            nd, dg = ray.get(deg_ref)
            ds_ = dg[np.searchsorted(nd, s)]
            dd = dg[np.searchsorted(nd, d)]
            src_first = (ds_ < dd) | ((ds_ == dd) & (s < d))
            u = np.where(src_first, s, d)
            v = np.where(src_first, d, s)
            t = pa.table({
                "u": pa.array(u, pa.int64()), "v": pa.array(v, pa.int64()),
            })
            return t.append_column(
                "__bucket", hash_bucket(t["u"].combine_chunks(), n_buckets)
            )

        def wedges_close_bucket(group: pa.Table) -> pa.Table:
            k, wu, x, y = _gen_wedges(group)
            arr = ray.get(edge_ref)  # shared-memory, zero-copy
            if len(arr) == 0 or len(k) == 0:
                return pa.table({
                    "part": pa.array([], pa.int64()),
                    "t": pa.array([], pa.int64()),
                })
            pos = np.searchsorted(arr, k)
            hit = pos < len(arr)
            hit[hit] = arr[pos[hit]] == k[hit]
            corners = np.concatenate([wu[hit], x[hit], y[hit]])
            node, cnt = np.unique(corners, return_counts=True)
            return pa.table({
                "part": pa.array(node, pa.int64()),
                "t": pa.array(cnt, pa.int64()),
            })

        out = (
            edges_ds.map_batches(orient_close_bucket, batch_format="pyarrow")
            .groupby("__bucket")
            .map_groups(wedges_close_bucket, batch_format="pyarrow")
            .groupby("part")
            .sum("t")
        )
        return out.map_batches(
            lambda b: b.rename_columns(["part", "n_triangles"]),
            batch_format="pyarrow",
        )

    edge_schema = pa.schema([("src", pa.int64()), ("dst", pa.int64())])

    def deg_partial(b: pa.Table) -> pa.Table:
        s = b["src"].combine_chunks().to_numpy(zero_copy_only=False)
        d = b["dst"].combine_chunks().to_numpy(zero_copy_only=False)
        node, cnt = np.unique(np.concatenate([s, d]), return_counts=True)
        return pa.table({
            "node": pa.array(node, pa.int64()),
            "d": pa.array(cnt, pa.int64()),
        })

    deg = (
        edges_ds.map_batches(deg_partial, batch_format="pyarrow")
        .groupby("node")
        .sum("d")
    )
    deg = deg.map_batches(
        lambda b: b.rename_columns(["node", "d"]), batch_format="pyarrow"
    )

    def as_src(b: pa.Table) -> pa.Table:
        return b.rename_columns(["src", "deg_src"])

    def as_dst(b: pa.Table) -> pa.Table:
        return b.rename_columns(["dst", "deg_dst"])

    e1 = bucket_join(
        edges_ds, deg.map_batches(as_src, batch_format="pyarrow"),
        key="src", n_buckets=n_buckets,
        left_schema=edge_schema,
        right_schema=pa.schema([("src", pa.int64()), ("deg_src", pa.int64())]),
    )
    e2 = bucket_join(
        e1, deg.map_batches(as_dst, batch_format="pyarrow"),
        key="dst", n_buckets=n_buckets,
        left_schema=pa.schema([
            ("src", pa.int64()), ("dst", pa.int64()), ("deg_src", pa.int64())
        ]),
        right_schema=pa.schema([("dst", pa.int64()), ("deg_dst", pa.int64())]),
    )

    def orient(b: pa.Table) -> pa.Table:
        s = b["src"].combine_chunks().to_numpy(zero_copy_only=False)
        d = b["dst"].combine_chunks().to_numpy(zero_copy_only=False)
        ds_ = b["deg_src"].combine_chunks().to_numpy(zero_copy_only=False)
        dd = b["deg_dst"].combine_chunks().to_numpy(zero_copy_only=False)
        src_first = (ds_ < dd) | ((ds_ == dd) & (s < d))
        u = np.where(src_first, s, d)
        v = np.where(src_first, d, s)
        t = pa.table({"u": pa.array(u, pa.int64()), "v": pa.array(v, pa.int64())})
        return t.append_column(
            "__bucket", hash_bucket(t["u"].combine_chunks(), n_buckets)
        )

    oriented = e2.map_batches(orient, batch_format="pyarrow")

    def wedges_bucket(group: pa.Table) -> pa.Table:
        k, wu, _, _ = _gen_wedges(group)
        return pa.table({
            "k": pa.array(k, pa.int64()),
            "wu": pa.array(wu, pa.int64()),
        })

    wedges = oriented.groupby("__bucket").map_groups(
        wedges_bucket, batch_format="pyarrow"
    )

    def pack_edges(b: pa.Table) -> pa.Table:
        s = b["src"].combine_chunks().to_numpy(zero_copy_only=False)
        d = b["dst"].combine_chunks().to_numpy(zero_copy_only=False)
        return pa.table({"k": pa.array((s << np.int64(32)) | d, pa.int64())})

    closed = bucket_join(
        wedges,
        edges_ds.map_batches(pack_edges, batch_format="pyarrow"),
        key="k", join_type="left semi", n_buckets=n_buckets,
        left_schema=pa.schema([("k", pa.int64()), ("wu", pa.int64())]),
        right_schema=pa.schema([("k", pa.int64())]),
        right_distinct=True,
    )

    def corner_partial(b: pa.Table) -> pa.Table:
        k = b["k"].combine_chunks().to_numpy(zero_copy_only=False)
        wu = b["wu"].combine_chunks().to_numpy(zero_copy_only=False)
        corners = np.concatenate([wu, k >> np.int64(32), k & np.int64(0xFFFFFFFF)])
        node, cnt = np.unique(corners, return_counts=True)
        return pa.table({
            "part": pa.array(node, pa.int64()),
            "t": pa.array(cnt, pa.int64()),
        })

    out = (
        closed.map_batches(corner_partial, batch_format="pyarrow")
        .groupby("part")
        .sum("t")
    )
    return out.map_batches(
        lambda b: b.rename_columns(["part", "n_triangles"]),
        batch_format="pyarrow",
    )


def _distinct_ints(ds, col: str, *, n_buckets: int = 256):
    """Distributed distinct over one int64 column: bucket shuffle +
    np.unique per bucket — no driver set, no per-key dispatch."""
    from ..kg.unionfind import hash_bucket

    def tag(b: pa.Table) -> pa.Table:
        u = np.unique(b[col].combine_chunks().to_numpy(zero_copy_only=False))
        t = pa.table({col: pa.array(u, pa.int64())})
        return t.append_column(
            "__bucket", hash_bucket(t[col].combine_chunks(), n_buckets))

    def uniq(group: pa.Table) -> pa.Table:
        u = np.unique(group[col].combine_chunks().to_numpy(zero_copy_only=False))
        return pa.table({col: pa.array(u, pa.int64())})

    return (ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
            .groupby("__bucket").map_groups(uniq, batch_format="pyarrow"))


def bfs_distances(edges_ds, *, source: int | None = None, max_hops: int = 3,
                  broadcast_nodes: int | None = 2_000_000):
    """Hop-distance labels from one source over an undirected distinct
    edge list: (node, dist) for every node within ``max_hops`` — BFS as
    iterated Dataset algebra, the graph sibling of the crawl frontier.

    Two paths, same bit-identical output (the pagerank trade-off,
    module docstring):

    - **broadcast** (``broadcast_nodes`` = bound, default 2M): the
      visited/frontier node sets live on the driver as numpy arrays
      (16 B/node — bounded by the reachable node count, NOT |E|; a
      hard ``RuntimeError`` fires if the bound is exceeded). Per round
      ONE zero-shuffle execution: frontier set is ``ray.put`` once,
      every edge batch filters map-side (``np.isin`` against frontier,
      then against visited) and emits its locally-unique new nodes;
      the driver np.uniques the narrow survivors. Right for
      catalog-order node sets (this repo's supplier/part graphs).
    - **exchange** (``broadcast_nodes=None``): nothing node-shaped on
      the driver. Per round: frontier neighbors via ONE bucketed
      semi-join cogroup (edges × frontier — exchange is edges touched,
      dispatch capped at n_buckets), minus visited via an anti-join,
      distinct via a bucketed np.unique. Every inter-round table is
      NARROW ((node)/(node, dist) int64 rows, bounded by |V|) and
      materialized so no round recomputes its predecessors. Total
      exchanges = O(max_hops × |E touched|); at small |E| the ~3
      shuffles/round fixed cost dominates, which is why broadcast is
      the default.

    Rounds are sequential by nature (BFS is depth-synchronous); the
    full edge list lives in the object store, never on the driver.

    ``source=None`` uses the smallest node id in the edge list (always
    a ``src`` under the canonical src<dst orientation).
    """
    import ray.data

    def both_dirs(b: pa.Table) -> pa.Table:
        return pa.table({
            "u": pa.concat_arrays([
                b["src"].combine_chunks().cast(pa.int64()),
                b["dst"].combine_chunks().cast(pa.int64()),
            ]),
            "v": pa.concat_arrays([
                b["dst"].combine_chunks().cast(pa.int64()),
                b["src"].combine_chunks().cast(pa.int64()),
            ]),
        })

    edges = edges_ds.map_batches(
        both_dirs, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()
    if source is None:
        source = int(edges.min("u"))

    if broadcast_nodes is not None:
        return _bfs_broadcast(edges, source=source, max_hops=max_hops,
                              bound=broadcast_nodes)

    from .joins import anti_join, semi_join

    def labeled(nodes_ds, dist: int):
        return nodes_ds.map_batches(
            lambda b: b.append_column(
                "dist", pa.nulls(b.num_rows, pa.int64()).fill_null(dist)),
            batch_format="pyarrow",
        )

    seed = ray.data.from_arrow(pa.table({"node": pa.array([source], pa.int64())}))
    visited = labeled(seed, 0).materialize()
    frontier = seed.materialize()

    for hop in range(1, max_hops + 1):
        fr = frontier.map_batches(
            lambda b: b.rename_columns(["u"]), batch_format="pyarrow")
        nbrs = semi_join(edges, fr, "u").map_batches(
            lambda b: pa.table({"node": b["v"]}), batch_format="pyarrow",
            zero_copy_batch=True,
        )
        # compact every inter-round table to a handful of blocks: the
        # bucketed cogroups emit ~n_buckets tiny blocks each, and Ray's
        # shuffle cost scales with INPUT BLOCK COUNT, not rows — without
        # this the per-hop wall time compounds ~3x per hop (measured
        # 2.0 s -> 7.6 s -> 48 s at 2k edges) purely from block fanout.
        new = _distinct_ints(
            anti_join(nbrs, visited.select_columns(["node"]), "node"), "node"
        ).repartition(8).materialize()
        if new.count() == 0:
            break
        visited = visited.union(labeled(new, hop)).repartition(8).materialize()
        frontier = new

    return visited


def _bfs_broadcast(edges, *, source: int, max_hops: int, bound: int):
    """Zero-shuffle BFS rounds: frontier/visited sets broadcast via
    ``ray.put``, edges filtered map-side, new nodes collected as narrow
    int64 rows. Driver state is (node, dist) only — raises if the
    reachable node count exceeds ``bound``."""
    import ray
    import ray.data

    nodes = [np.array([source], np.int64)]
    dists = [np.array([0], np.int64)]
    visited_np = nodes[0]
    frontier_np = nodes[0]
    n_visited = 1
    # serially-dependent rounds over static edge blocks → raw tasks on
    # once-cached Arrow refs (the kcore execution note)
    block_refs = list(edges.to_arrow_refs())

    @ray.remote
    def expand(block: pa.Table, fr: np.ndarray, vis: np.ndarray):
        u = block["u"].combine_chunks().to_numpy(zero_copy_only=False)
        v = block["v"].combine_chunks().to_numpy(zero_copy_only=False)
        cand = np.unique(v[np.isin(u, fr)])
        return cand[~np.isin(cand, vis)]

    for hop in range(1, max_hops + 1):
        fr_ref = ray.put(np.sort(frontier_np))
        vis_ref = ray.put(np.sort(visited_np))
        parts = ray.get([expand.remote(br, fr_ref, vis_ref)
                         for br in block_refs])
        new_np = np.unique(np.concatenate(
            [p for p in parts if len(p)] or [np.array([], np.int64)]))
        if new_np.size == 0:
            break
        n_visited += int(new_np.size)
        if n_visited > bound:
            raise RuntimeError(
                f"bfs_distances: reachable node set exceeds "
                f"broadcast_nodes={bound}; pass broadcast_nodes=None for "
                f"the exchange path")
        nodes.append(new_np)
        dists.append(np.full(new_np.size, hop, np.int64))
        visited_np = np.concatenate([visited_np, new_np])
        frontier_np = new_np

    return ray.data.from_arrow(pa.table({
        "node": pa.array(np.concatenate(nodes), pa.int64()),
        "dist": pa.array(np.concatenate(dists), pa.int64()),
    }))


def link_prediction(edges_ds, *, min_common: int = 2,
                    max_middle_degree: int = 64, n_buckets: int = 256,
                    broadcast_nodes: int = 50_000_000):
    """Common-neighbor / Jaccard link prediction over a distinct
    undirected edge list (``src < dst`` by id): for every NON-adjacent
    pair (x, y) sharing ≥ ``min_common`` neighbors, emit the classic
    similarity signals.

    Output: (x, y, common, deg_x, deg_y, jac6) with x < y, where
    ``common`` counts shared neighbors whose degree ≤
    ``max_middle_degree`` and ``jac6`` = round(common / (deg_x + deg_y
    − common), 6) — one IEEE division from exact ints (the fuzzy_join
    determinism recipe).

    The middle-degree cap is the standard wedge-volume bound: pair
    volume through a middle u is C(deg(u), 2), so one hub node (a
    stopword-scale entity in a KG) would emit O(deg²) pairs carrying
    ~zero similarity signal; capping middles bounds per-middle work at
    C(cap, 2) and is applied IDENTICALLY in the SQL oracle.

    Scale shape: degrees via map-side partials + native groupby-sum;
    the (degree, packed-edge) tables are node/edge-order — catalog
    scale even at a 100-TB corpus — and broadcast ONCE via ``ray.put``
    (``broadcast_nodes`` bounds the combined array lengths; past it a
    RuntimeError names the knob — the exchange alternative is the
    triangle_counts fallback pattern: two bucket_joins for degrees and
    a left-anti bucket_join against packed edges). Wedge pairs are
    generated inside a bucketed cogroup on hash(middle) (dispatch ≤
    n_buckets) with per-group np.unique partials, so the global
    groupby-sum shuffle carries one row per distinct pair per bucket.
    """
    import ray

    from ..kg.unionfind import hash_bucket

    edges_ds = edges_ds.materialize()

    # degree table + packed SYMMETRIC-CLOSURE edge set, broadcast once.
    # Works for either input convention (canonical src<dst rows, or an
    # already-symmetrized list like supplier_part_edges) and for only
    # per-block-distinct inputs: the closure + np.unique normalizes
    # both; degree = src-side row count of the distinct closure.
    packed_parts = []
    for t in ray.get(edges_ds.to_arrow_refs()):
        s = t["src"].combine_chunks().to_numpy(zero_copy_only=False)
        d = t["dst"].combine_chunks().to_numpy(zero_copy_only=False)
        packed_parts.append((s << np.int64(32)) | d)
        packed_parts.append((d << np.int64(32)) | s)
    packed = np.unique(np.concatenate(packed_parts)
                       if packed_parts else np.array([], np.int64))
    nodes, degs = np.unique(packed >> np.int64(32), return_counts=True)
    if len(packed) + len(nodes) > broadcast_nodes:
        raise RuntimeError(
            f"link_prediction: edge+node count {len(packed) + len(nodes)} "
            f"exceeds broadcast_nodes={broadcast_nodes}; raise the bound or "
            "pre-filter the graph (see triangle_counts for the exchange "
            "pattern)")
    edge_ref = ray.put(packed)
    deg_ref = ray.put((nodes, degs))

    def both_dirs_capped(b: pa.Table) -> pa.Table:
        nd, dg = ray.get(deg_ref)
        s = b["src"].combine_chunks().to_numpy(zero_copy_only=False)
        d = b["dst"].combine_chunks().to_numpy(zero_copy_only=False)
        u = np.concatenate([s, d])   # middle
        v = np.concatenate([d, s])   # endpoint
        keep = dg[np.searchsorted(nd, u)] <= max_middle_degree
        t = pa.table({"u": pa.array(u[keep], pa.int64()),
                      "v": pa.array(v[keep], pa.int64())})
        return t.append_column(
            "__bucket", hash_bucket(t["u"].combine_chunks(), n_buckets))

    def pair_partial(group: pa.Table) -> pa.Table:
        u = group["u"].combine_chunks().to_numpy(zero_copy_only=False)
        v = group["v"].combine_chunks().to_numpy(zero_copy_only=False)
        # the cogroup holds EVERY row of each middle u, so a local
        # distinct here is a global distinct per (u, v) — upstream edge
        # lists are only per-block distinct
        uv = np.unique((u << np.int64(32)) | v)
        u, v = uv >> np.int64(32), uv & np.int64(0xFFFFFFFF)
        w = _segment_positions(u)
        i, j = _pairs_within_segments(w)
        pk, c = np.unique((v[i] << np.int64(32)) | v[j], return_counts=True)
        return pa.table({"pk": pa.array(pk, pa.int64()),
                         "c": pa.array(c, pa.int64())})

    common = (
        edges_ds.map_batches(both_dirs_capped, batch_format="pyarrow",
                             zero_copy_batch=True)
        .groupby("__bucket").map_groups(pair_partial, batch_format="pyarrow")
        .groupby("pk").sum("c")
    )

    def finish(b: pa.Table) -> pa.Table:
        b = b.rename_columns(["pk", "common"])
        pk = b["pk"].combine_chunks().to_numpy(zero_copy_only=False)
        c = b["common"].combine_chunks().to_numpy(zero_copy_only=False)
        keep = c >= min_common
        pk, c = pk[keep], c[keep]
        arr = ray.get(edge_ref)
        pos = np.searchsorted(arr, pk)
        is_edge = pos < len(arr)
        is_edge[is_edge] = arr[pos[is_edge]] == pk[is_edge]
        pk, c = pk[~is_edge], c[~is_edge]
        x = pk >> np.int64(32)
        y = pk & np.int64(0xFFFFFFFF)
        nd, dg = ray.get(deg_ref)
        dx = dg[np.searchsorted(nd, x)]
        dy = dg[np.searchsorted(nd, y)]
        jac = pc.round(
            pa.array(c.astype(np.float64) / (dx + dy - c).astype(np.float64),
                     pa.float64()),
            ndigits=6, round_mode="half_towards_infinity")
        return pa.table({
            "x": pa.array(x, pa.int64()), "y": pa.array(y, pa.int64()),
            "common": pa.array(c, pa.int64()),
            "deg_x": pa.array(dx, pa.int64()),
            "deg_y": pa.array(dy, pa.int64()),
            "jac6": jac,
        })

    return common.map_batches(finish, batch_format="pyarrow")


def clustering_coefficients(edges_ds, *, n_buckets: int = 256,
                            broadcast_edges: int | None = 50_000_000):
    """Per-node local clustering coefficient over a distinct canonical
    (``src < dst``) edge list: cc(v) = 2·t(v) / (deg(v)·(deg(v)−1)) for
    every node with deg ≥ 2 — triangles from :func:`triangle_counts`
    (degree-oriented wedges, exact), degrees from map-side partials +
    one native groupby-sum, met in ONE left-outer bucketed cogroup so
    triangle-free nodes report cc = 0 rather than vanishing.

    Output: (node, deg, n_triangles, cc6) — cc6 is one IEEE division
    from exact ints rounded to 6 dp (the repo's float-parity recipe).
    """
    from .cogroup import bucket_join

    edges_ds = edges_ds.materialize()

    def deg_partial(b: pa.Table) -> pa.Table:
        s = b["src"].combine_chunks().to_numpy(zero_copy_only=False)
        d = b["dst"].combine_chunks().to_numpy(zero_copy_only=False)
        node, cnt = np.unique(np.concatenate([s, d]), return_counts=True)
        return pa.table({"node": pa.array(node, pa.int64()),
                         "d": pa.array(cnt, pa.int64())})

    deg = (edges_ds.map_batches(deg_partial, batch_format="pyarrow")
           .groupby("node").sum("d")
           .map_batches(lambda b: b.rename_columns(["node", "deg"]),
                        batch_format="pyarrow")
           .map_batches(lambda b: b.filter(pc.greater_equal(b["deg"], 2)),
                        batch_format="pyarrow"))

    tri = triangle_counts(edges_ds, n_buckets=n_buckets,
                          broadcast_edges=broadcast_edges).map_batches(
        lambda b: b.rename_columns(["node", "n_triangles"]),
        batch_format="pyarrow")

    joined = bucket_join(
        deg, tri, key="node", join_type="left outer", n_buckets=n_buckets,
        left_schema=pa.schema([("node", pa.int64()), ("deg", pa.int64())]),
        right_schema=pa.schema([("node", pa.int64()),
                                ("n_triangles", pa.int64())]),
    )

    def finish(b: pa.Table) -> pa.Table:
        t = pc.fill_null(b["n_triangles"], 0).combine_chunks().to_numpy(
            zero_copy_only=False)
        d = b["deg"].combine_chunks().to_numpy(zero_copy_only=False)
        cc6 = pc.round(
            pa.array(2.0 * t / (d.astype(np.float64) * (d - 1)), pa.float64()),
            ndigits=6, round_mode="half_towards_infinity")
        return pa.table({
            "node": b["node"],
            "deg": b["deg"],
            "n_triangles": pa.array(t, pa.int64()),
            "cc6": cc6,
        })

    return joined.map_batches(finish, batch_format="pyarrow")


def kcore(edges_ds, *, k: int, max_rounds: int = 12,
          broadcast_nodes: int = 50_000_000):
    """k-core decomposition membership via iterated peeling over a
    distinct undirected edge list: repeatedly drop nodes of degree < k
    (and their edges) until fixpoint; emit every surviving node with
    its in-core degree.

    Output: (node, deg) with deg ≥ k computed over the final edge set.

    Determinism/oracle contract: the SQL oracle is the SAME peeling
    unrolled ``max_rounds`` times — past the fixpoint a peel round is
    a no-op, so the two agree exactly WHEN the engine converges within
    the cap. If round ``max_rounds`` still removes nodes the engine
    RAISES (the unionfind convergence rule: never return silently
    wrong labels). Peel depth is typically O(log n) on heavy-tailed
    graphs but O(n) on a path graph — callers with chain-like inputs
    must raise ``max_rounds``.

    Scale shape (broadcast regime, the catalog-graph sibling of
    triangle_counts/bfs): per round ONE zero-shuffle pass over the
    edge blocks (survivor set ``ray.put`` once, sorted-membership
    ``searchsorted`` filter map-side, per-block (node, cnt) degree
    partials) and one node-order driver fold — driver state is bounded
    by the NODE count (``broadcast_nodes``; a hard RuntimeError past it
    names the exchange alternative: bucket-fold degrees + semi-join
    edge filter per round, the bfs_distances exchange pattern). Edges
    live in the object store and never move.

    Execution note — the ONE raw-task loop in this repo: deep peeling
    runs O(tens) of serially-dependent rounds whose per-round compute
    is milliseconds of numpy; re-launching a Dataset execution per
    round costs ~100× the compute in executor startup + driver
    ``iter_batches`` (measured: ~10 s/round vs ~0.3 s at 2M edges).
    The materialized edge blocks are cached ONCE as Arrow object refs
    and each round maps a plain ``ray.remote`` degree-partial task
    over them — same blocks, same partials, same fold, no per-round
    executor. This is the documented escape hatch for iterative
    driver-synced algebra; everything single-pass stays Dataset-native.
    """
    import ray
    import ray.data

    edges = edges_ds.materialize()
    block_refs = [r for r in edges.to_arrow_refs()]
    survivors: np.ndarray | None = None  # None = all nodes (sorted)
    deg_nodes = deg_counts = None

    @ray.remote
    def deg_partial(block: pa.Table, s: np.ndarray | None):
        u = block["src"].combine_chunks().to_numpy(zero_copy_only=False)
        v = block["dst"].combine_chunks().to_numpy(zero_copy_only=False)
        if s is not None:
            # s is sorted+unique (np.unique output): membership via two
            # binary searches, no per-call re-sort like np.isin
            iu = np.searchsorted(s, u)
            iv = np.searchsorted(s, v)
            iu[iu == len(s)] = 0
            iv[iv == len(s)] = 0
            m = (s[iu] == u) & (s[iv] == v) if len(s) else np.zeros(
                len(u), bool)
            u, v = u[m], v[m]
        return np.unique(np.concatenate([u, v]), return_counts=True)

    for round_no in range(1, max_rounds + 1):
        surv_ref = None if survivors is None else ray.put(survivors)
        parts = ray.get([deg_partial.remote(br, surv_ref)
                         for br in block_refs])
        parts_n = [n for n, _ in parts if len(n)]
        parts_c = [c for _, c in parts if len(c)]
        if not parts_n:
            deg_nodes = np.array([], np.int64)
            deg_counts = np.array([], np.int64)
            survivors = deg_nodes
            break
        alln = np.concatenate(parts_n)
        allc = np.concatenate(parts_c)
        deg_nodes, inv = np.unique(alln, return_inverse=True)
        if deg_nodes.size > broadcast_nodes:
            raise RuntimeError(
                f"kcore: node set {deg_nodes.size} exceeds "
                f"broadcast_nodes={broadcast_nodes}; use a bucket-fold "
                f"exchange variant (bfs_distances exchange pattern)")
        deg_counts = np.bincount(inv, weights=allc).astype(np.int64)
        new = deg_nodes[deg_counts >= k]
        if survivors is not None and new.size == survivors.size:
            # peeling is monotone shrinking, so equal size == fixpoint
            survivors = new
            break
        survivors = new
        if new.size == 0:
            break
    else:
        raise RuntimeError(
            f"kcore: did not converge within max_rounds={max_rounds} "
            f"(last round still removed nodes); raise max_rounds — the "
            f"SQL oracle must be unrolled to the same depth")

    keep = deg_counts >= k if deg_counts is not None else np.array([], bool)
    return ray.data.from_arrow(pa.table({
        "node": pa.array(deg_nodes[keep] if deg_nodes is not None
                         else np.array([], np.int64), pa.int64()),
        "deg": pa.array(deg_counts[keep] if deg_counts is not None
                        else np.array([], np.int64), pa.int64()),
    }))


def label_propagation(edges_ds, *, rounds: int = 3,
                      broadcast_nodes: int = 50_000_000):
    """Synchronous label-propagation community detection over a
    distinct undirected edge list, made DETERMINISTIC: labels start as
    node ids; each round every node adopts the most frequent label
    among its neighbors, ties broken by the SMALLEST label (classic
    async LPA is order-dependent — the synchronous min-tie variant is
    reproducible and SQL-unrollable). Output after exactly ``rounds``
    rounds: (node, label) — same-label nodes are one community.

    Scale shape: the pagerank/kcore broadcast regime — the label vector
    broadcasts once per round, raw ``ray.remote`` tasks over the
    once-cached Arrow edge blocks emit per-block (node, neighbor-label,
    count) partials (combined per block, so a hot label ships one row
    per block), and a node-order driver fold takes the per-node mode
    with the min-label tie-break. Driver state is node-order
    (``broadcast_nodes`` bound, hard error past it — the exchange
    alternative is the bfs_distances pattern).
    """
    import ray
    import ray.data

    edges = edges_ds.materialize()
    block_refs = list(edges.to_arrow_refs())

    # node set + initial labels
    parts = []
    for t in ray.get(block_refs):
        u = t["src"].combine_chunks().to_numpy(zero_copy_only=False)
        v = t["dst"].combine_chunks().to_numpy(zero_copy_only=False)
        parts.append(np.unique(np.concatenate([u, v])))
    nodes = np.unique(np.concatenate(parts)) if parts else np.array(
        [], np.int64)
    if nodes.size > broadcast_nodes:
        raise RuntimeError(
            f"label_propagation: node set {nodes.size} exceeds "
            f"broadcast_nodes={broadcast_nodes}")
    labels = nodes.copy()

    @ray.remote
    def partial(block: pa.Table, node_np: np.ndarray, lab_np: np.ndarray):
        u = block["src"].combine_chunks().to_numpy(zero_copy_only=False)
        v = block["dst"].combine_chunks().to_numpy(zero_copy_only=False)
        au = np.concatenate([u, v])           # receiving node
        al = lab_np[np.searchsorted(node_np, np.concatenate([v, u]))]
        # per-block combine: counts per (node, neighbor label)
        order = np.lexsort((al, au))
        au, al = au[order], al[order]
        new = np.ones(len(au), dtype=bool)
        new[1:] = (au[1:] != au[:-1]) | (al[1:] != al[:-1])
        starts = np.flatnonzero(new)
        cnt = np.diff(np.append(starts, len(au)))
        return au[starts], al[starts], cnt.astype(np.int64)

    for _ in range(rounds):
        lab_ref = ray.put(labels)
        node_ref = ray.put(nodes)
        outs = ray.get([partial.remote(br, node_ref, lab_ref)
                        for br in block_refs])
        an = np.concatenate([o[0] for o in outs])
        al = np.concatenate([o[1] for o in outs])
        ac = np.concatenate([o[2] for o in outs])
        # fold partial counts, then per node: max count, tie → min label
        order = np.lexsort((al, an))
        an, al, ac = an[order], al[order], ac[order]
        new = np.ones(len(an), dtype=bool)
        new[1:] = (an[1:] != an[:-1]) | (al[1:] != al[:-1])
        gid = np.cumsum(new) - 1
        csum = np.zeros(gid[-1] + 1 if len(gid) else 0, dtype=np.int64)
        np.add.at(csum, gid, ac)
        gn = an[new]
        gl = al[new]
        # winner per node: sort groups by (node asc, count desc, label asc)
        worder = np.lexsort((gl, -csum, gn))
        gn2, gl2 = gn[worder], gl[worder]
        first = np.ones(len(gn2), dtype=bool)
        first[1:] = gn2[1:] != gn2[:-1]
        win_nodes = gn2[first]
        win_labels = gl2[first]
        labels = labels.copy()
        labels[np.searchsorted(nodes, win_nodes)] = win_labels

    return ray.data.from_arrow(pa.table({
        "node": pa.array(nodes, pa.int64()),
        "label": pa.array(labels, pa.int64()),
    }))


def sssp_distances(edges_ds, *, source: int | None = None, rounds: int = 12,
                   broadcast_nodes: int = 2_000_000):
    """Weighted single-source shortest paths (Bellman–Ford) over a
    symmetric (src, dst, w) edge list with positive int64 weights —
    the weighted sibling of :func:`bfs_distances`.

    Per round every edge relaxes once: d'(v) = min(d(v), min over
    incoming edges (d(u) + w)). Rounds are capped at ``rounds`` AND
    stop early at the fixpoint; both give exactly d_rounds (fixpoint
    rounds are no-ops), so an oracle that unrolls the same recurrence
    ``rounds`` times is value-equal whether or not the graph has
    converged — the same contract as the unrolled k-core SQL.

    Scale shape (the broadcast path of the module's pagerank/BFS
    trade-off): the (node, dist) state is driver-held numpy — 16
    B/reached node, hard-capped at ``broadcast_nodes`` — and each
    round is one wave of raw tasks over the once-cached edge block
    refs (serially-dependent rounds over static blocks: re-launching
    a Dataset execution per round costs ~10 s of executor startup for
    milliseconds of numpy). Map-side each block emits its per-target
    min candidate only — the merge is O(reached), never O(E).

    Above the cap (a web-graph-order reached set), use
    ``ops/graphstore.py sssp_prepartitioned`` — the identical
    recurrence with the distance table living as per-bucket
    object-store vectors over a once-written weighted edge store; the
    driver holds O(n_buckets) flags, never a node-order array
    (bit-identity asserted in tests/test_graph.py).

    ``source=None`` uses the smallest node id. Output: (node, dist)
    for every node reached within ``rounds`` relaxations.
    """
    import ray
    import ray.data

    def both_dirs(b: pa.Table) -> pa.Table:
        w = pc.cast(b["w"], pa.int64()).combine_chunks()
        return pa.table({
            "u": pa.concat_arrays([
                b["src"].combine_chunks().cast(pa.int64()),
                b["dst"].combine_chunks().cast(pa.int64()),
            ]),
            "v": pa.concat_arrays([
                b["dst"].combine_chunks().cast(pa.int64()),
                b["src"].combine_chunks().cast(pa.int64()),
            ]),
            "w": pa.concat_arrays([w, w]),
        })

    edges = edges_ds.map_batches(
        both_dirs, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()
    if source is None:
        source = int(edges.min("u"))
    block_refs = list(edges.to_arrow_refs())

    @ray.remote
    def relax(block: pa.Table, nodes: np.ndarray, dist: np.ndarray):
        u = block["u"].combine_chunks().to_numpy(zero_copy_only=False)
        v = block["v"].combine_chunks().to_numpy(zero_copy_only=False)
        w = block["w"].combine_chunks().to_numpy(zero_copy_only=False)
        pos = np.searchsorted(nodes, u)
        pos[pos >= len(nodes)] = 0
        hit = nodes[pos] == u
        cand = dist[pos[hit]] + w[hit]
        vv = v[hit]
        tgt, inv = np.unique(vv, return_inverse=True)
        m = np.full(tgt.size, np.iinfo(np.int64).max, np.int64)
        np.minimum.at(m, inv, cand)
        return tgt, m

    nodes = np.array([source], np.int64)   # kept sorted
    dist = np.array([0], np.int64)
    for _ in range(rounds):
        n_ref, d_ref = ray.put(nodes), ray.put(dist)
        parts = ray.get([relax.remote(br, n_ref, d_ref)
                         for br in block_refs])
        all_v = np.concatenate([p[0] for p in parts] + [nodes])
        all_d = np.concatenate([p[1] for p in parts] + [dist])
        tgt, inv = np.unique(all_v, return_inverse=True)
        nd = np.full(tgt.size, np.iinfo(np.int64).max, np.int64)
        np.minimum.at(nd, inv, all_d)
        if tgt.size > broadcast_nodes:
            raise RuntimeError(
                f"sssp_distances: reached node set exceeds "
                f"broadcast_nodes={broadcast_nodes}")
        unchanged = tgt.size == nodes.size and (nd == dist).all()
        nodes, dist = tgt, nd
        if unchanged:
            break

    return ray.data.from_arrow(pa.table({
        "node": pa.array(nodes, pa.int64()),
        "dist": pa.array(dist, pa.int64()),
    }))
