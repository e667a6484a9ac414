"""Prepartitioned edge storage for the graph family — the
``asof_join_prepartitioned`` pattern applied to the Pregel loop
(VERDICT r3 item 8).

The shuffling ``pagerank_fixedpoint`` exchange path moves edge-order
rows every round (ranks→edges bucket-cogroup + grouped contribution
fold), which measured 0.43 scaling efficiency at 10M edges
(BENCH/BASELINE.md). At 100 TB the fix is the storage layout, not a
faster shuffle: **write edges bucketed by ``hash_bucket(src)`` once**
(:func:`write_edge_store` — the one-off partitioned write every
downstream graph operator then reuses), and run rounds as plain
``ray.remote`` tasks per bucket where

* the edge block for bucket *b* is read once and CACHED in the object
  store (the task-return ref is the cache) — edges never move again;
* out-degrees are computed bucket-locally with NO exchange at all
  (every edge of a given ``src`` lives in src's bucket by
  construction);
* per-round cross-task traffic is only the per-(task, target-bucket)
  COMBINED ``(dst, partial)`` rows, shipped as object refs routed by
  ``num_returns`` fan-out — the driver plumbs references only and
  never holds a node-order vector (unlike the ``broadcast_ranks``
  path, this works at corpus-order node sets);
* rank/label state lives as one sorted per-bucket vector per bucket,
  also object-store-resident.

Outputs are BIT-IDENTICAL to the exchange paths (asserted in
tests/test_graph.py and tools/graph_stress.py --prep): the update rules
are the same order-free integer arithmetic.

Reference framing: recrun has no distributed analogue (single page,
single thread, readabilitySAX.js:767-808); this is the repo's "graph
materialize into partitioned tables, then query in place" shape from
SURVEY.md §2.4 / §7.
"""

from __future__ import annotations

import json
import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..kg.unionfind import hash_bucket

META = "_edge_store.json"


def _bucket_path(store_dir: str, b: int) -> str:
    return os.path.join(store_dir, f"bucket_{b:05d}.parquet")


def write_edge_store(edges_ds, store_dir: str, *, n_buckets: int = 64,
                     symmetric: bool = False,
                     weighted: bool = False) -> dict:
    """One-off partitioned write: (src, dst) edges → one parquet file
    per ``hash_bucket(src)`` bucket + a meta sidecar. Idempotent (an
    existing store with matching meta is reused); staged + renamed so a
    killed writer never leaves a half-store behind. ``symmetric``
    records the caller's promise that (v,u) accompanies every (u,v) —
    required by :func:`components_prepartitioned` and
    :func:`sssp_prepartitioned`. ``weighted`` carries the input's
    int64 ``w`` column into the bucket files (required by
    :func:`sssp_prepartitioned`; for a symmetric weighted store the
    caller's promise extends to equal weights in both directions)."""
    if n_buckets & (n_buckets - 1):
        raise ValueError("n_buckets must be a power of two")
    meta = {"n_buckets": n_buckets, "symmetric": bool(symmetric),
            "weighted": bool(weighted)}
    mpath = os.path.join(store_dir, META)
    if os.path.exists(mpath):
        with open(mpath) as f:
            have = json.load(f)
        if {k: have.get(k, False) for k in meta} == meta:
            return have
        raise ValueError(f"edge store {store_dir} exists with different "
                         f"layout {have} != {meta}")

    def tag(batch: pa.Table) -> pa.Table:
        cols = {
            "__bucket": hash_bucket(batch["src"].combine_chunks(), n_buckets),
            "src": batch["src"],
            "dst": batch["dst"],
        }
        if weighted:
            cols["w"] = pc.cast(batch["w"], pa.int64())
        return pa.table(cols)

    stage = store_dir + ".stage"
    shutil.rmtree(stage, ignore_errors=True)
    os.makedirs(stage, exist_ok=True)

    def write_bucket(group: pa.Table) -> pa.Table:
        import pyarrow.parquet as pq

        b = group["__bucket"][0].as_py()
        keep = ["src", "dst"] + (["w"] if weighted else [])
        pq.write_table(group.select(keep), _bucket_path(stage, b))
        return pa.table({"bucket": pa.array([b], pa.int32()),
                         "n_edges": pa.array([group.num_rows], pa.int64())})

    counts = (edges_ds.map_batches(tag, batch_format="pyarrow",
                                   zero_copy_batch=True)
              .groupby("__bucket")
              .map_groups(write_bucket, batch_format="pyarrow")).take_all()
    meta["n_edges"] = int(sum(r["n_edges"] for r in counts))
    meta["buckets_written"] = len(counts)
    with open(os.path.join(stage, META), "w") as f:
        json.dump(meta, f)
    try:
        os.rename(stage, store_dir)
    except OSError:  # concurrent writer won; trust the existing store
        shutil.rmtree(stage, ignore_errors=True)
    with open(mpath) as f:
        return json.load(f)


def _load_meta(store_dir: str) -> dict:
    with open(os.path.join(store_dir, META)) as f:
        return json.load(f)


def _remote_fns(n_buckets: int, weighted: bool = False):
    """Build the per-bucket task set (closures over n_buckets)."""
    import ray

    @ray.remote
    def load_edges(path: str) -> pa.Table:
        import pyarrow.parquet as pq

        if not os.path.exists(path):
            cols = {"src": pa.array([], pa.int64()),
                    "dst": pa.array([], pa.int64())}
            if weighted:
                cols["w"] = pa.array([], pa.int64())
            return pa.table(cols)
        return pq.read_table(path)

    @ray.remote(num_returns=n_buckets)
    def split_dsts(edges: pa.Table):
        """Unique dsts of this bucket's edges, routed by the dst's OWN
        bucket — builds each bucket's node membership without any
        driver-side node vector."""
        d = edges["dst"].combine_chunks().to_numpy(zero_copy_only=False)
        if len(d) == 0:
            out = [np.empty(0, dtype=np.int64)] * n_buckets
            return out if n_buckets > 1 else out[0]
        u = np.unique(d)
        tb = hash_bucket(pa.array(u, pa.int64()), n_buckets).to_numpy(
            zero_copy_only=False)
        out = [u[tb == t] for t in range(n_buckets)]
        return out if n_buckets > 1 else out[0]

    @ray.remote(num_returns=2)
    def build_state(edges: pa.Table, *routed_dsts):
        """→ ((node_b sorted, od_b aligned), len(node_b)). Out-degrees
        are exact with zero exchange: all edges of a src live here."""
        s = edges["src"].combine_chunks().to_numpy(zero_copy_only=False)
        srcs, od = (np.unique(s, return_counts=True) if len(s)
                    else (np.empty(0, np.int64), np.empty(0, np.int64)))
        parts = [srcs] + [r for r in routed_dsts if len(r)]
        node = np.unique(np.concatenate(parts)) if parts else srcs
        odv = np.zeros(len(node), dtype=np.int64)
        if len(srcs):
            odv[np.searchsorted(node, srcs)] = od.astype(np.int64)
        return (node.astype(np.int64), odv), len(node)

    @ray.remote(num_returns=n_buckets)
    def pr_contrib(edges: pa.Table, state, rank):
        """Σ rank[src]//od[src] per dst, combined per target bucket."""
        node, od = state
        empty = (np.empty(0, np.int64), np.empty(0, np.int64))
        s = edges["src"].combine_chunks().to_numpy(zero_copy_only=False)
        d = edges["dst"].combine_chunks().to_numpy(zero_copy_only=False)
        if len(s) == 0:
            out = [empty] * n_buckets
            return out if n_buckets > 1 else out[0]
        i = np.searchsorted(node, s)
        rv = (np.full(len(node), rank, dtype=np.int64)
              if np.isscalar(rank) else rank)
        c = rv[i] // od[i]
        dsts, inv = np.unique(d, return_inverse=True)
        sums = np.zeros(len(dsts), dtype=np.int64)
        np.add.at(sums, inv, c)
        tb = hash_bucket(pa.array(dsts, pa.int64()), n_buckets).to_numpy(
            zero_copy_only=False)
        out = [(dsts[tb == t], sums[tb == t]) for t in range(n_buckets)]
        return out if n_buckets > 1 else out[0]

    @ray.remote
    def pr_fold(state, base: int, d_num: int, d_den: int, *parts):
        node, _ = state
        s_vec = np.zeros(len(node), dtype=np.int64)
        for dsts, sums in parts:
            if len(dsts):
                np.add.at(s_vec, np.searchsorted(node, dsts), sums)
        return base + (d_num * s_vec) // d_den

    @ray.remote(num_returns=n_buckets)
    def cc_cand(edges: pa.Table, state, labels):
        """Min candidate label per dst from this bucket's src labels,
        combined per target bucket (symmetric store: the reverse
        direction is some bucket's local src side)."""
        node, _ = state
        empty = (np.empty(0, np.int64), np.empty(0, np.int64))
        s = edges["src"].combine_chunks().to_numpy(zero_copy_only=False)
        d = edges["dst"].combine_chunks().to_numpy(zero_copy_only=False)
        if len(s) == 0:
            out = [empty] * n_buckets
            return out if n_buckets > 1 else out[0]
        lab = labels[np.searchsorted(node, s)]
        dsts, inv = np.unique(d, return_inverse=True)
        m = np.full(len(dsts), np.iinfo(np.int64).max, dtype=np.int64)
        np.minimum.at(m, inv, lab)
        tb = hash_bucket(pa.array(dsts, pa.int64()), n_buckets).to_numpy(
            zero_copy_only=False)
        out = [(dsts[tb == t], m[tb == t]) for t in range(n_buckets)]
        return out if n_buckets > 1 else out[0]

    @ray.remote(num_returns=2)
    def cc_fold(state, labels, *parts):
        node, _ = state
        new = labels.copy()
        for dsts, mins in parts:
            if len(dsts):
                idx = np.searchsorted(node, dsts)
                np.minimum.at(new, idx, mins)
        return new, bool((new != labels).any())

    @ray.remote(num_returns=2)
    def sssp_init(state, source: int):
        node, _ = state
        dist = np.full(len(node), np.iinfo(np.int64).max, np.int64)
        i = np.searchsorted(node, source)
        found = bool(i < len(node) and node[i] == source)
        if found:
            dist[i] = 0
        return dist, found

    @ray.remote(num_returns=n_buckets)
    def sssp_cand(edges: pa.Table, state, dist):
        """min(dist[src] + w) per dst over this bucket's cached edges
        (every src's dist is bucket-local by construction), combined
        per target bucket — the relax half of one Bellman–Ford round;
        unreached srcs (dist = MAX sentinel) are masked out before the
        add so the sentinel can't wrap."""
        node, _ = state
        empty = (np.empty(0, np.int64), np.empty(0, np.int64))
        s = edges["src"].combine_chunks().to_numpy(zero_copy_only=False)
        if len(s) == 0:
            out = [empty] * n_buckets
            return out if n_buckets > 1 else out[0]
        d = edges["dst"].combine_chunks().to_numpy(zero_copy_only=False)
        w = edges["w"].combine_chunks().to_numpy(zero_copy_only=False)
        dv = dist[np.searchsorted(node, s)]
        fin = dv != np.iinfo(np.int64).max
        if not fin.any():
            out = [empty] * n_buckets
            return out if n_buckets > 1 else out[0]
        cand = dv[fin] + w[fin]
        dsts, inv = np.unique(d[fin], return_inverse=True)
        m = np.full(len(dsts), np.iinfo(np.int64).max, dtype=np.int64)
        np.minimum.at(m, inv, cand)
        tb = hash_bucket(pa.array(dsts, pa.int64()), n_buckets).to_numpy(
            zero_copy_only=False)
        out = [(dsts[tb == t], m[tb == t]) for t in range(n_buckets)]
        return out if n_buckets > 1 else out[0]

    @ray.remote(num_returns=2)
    def sssp_fold(state, dist, *parts):
        node, _ = state
        new = dist.copy()
        for dsts, mins in parts:
            if len(dsts):
                idx = np.searchsorted(node, dsts)
                np.minimum.at(new, idx, mins)
        return new, bool((new != dist).any())

    @ray.remote
    def node_min(state):
        node, _ = state
        return int(node[0]) if len(node) else None

    @ray.remote
    def reached_table(state, dist) -> pa.Table:
        node, _ = state
        hit = dist != np.iinfo(np.int64).max
        return pa.table({"node": pa.array(node[hit], pa.int64()),
                         "dist": pa.array(dist[hit], pa.int64())})

    @ray.remote
    def to_table(state, values, value_name: str) -> pa.Table:
        node, _ = state
        if np.isscalar(values):  # iters=0: ranks still the scalar init
            values = np.full(len(node), values, dtype=np.int64)
        return pa.table({"node": pa.array(node, pa.int64()),
                         value_name: pa.array(values, pa.int64())})

    return dict(load_edges=load_edges, split_dsts=split_dsts,
                build_state=build_state, pr_contrib=pr_contrib,
                pr_fold=pr_fold, cc_cand=cc_cand, cc_fold=cc_fold,
                sssp_init=sssp_init, sssp_cand=sssp_cand,
                sssp_fold=sssp_fold, node_min=node_min,
                reached_table=reached_table, to_table=to_table)


def _setup(store_dir: str):
    """→ (n_buckets, meta, edge_refs, state_refs, n_nodes). The only
    values the driver ever ray.gets are the per-bucket node COUNTS."""
    import ray

    meta = _load_meta(store_dir)
    n_buckets = meta["n_buckets"]
    fns = _remote_fns(n_buckets, weighted=meta.get("weighted", False))
    edge_refs = [fns["load_edges"].remote(_bucket_path(store_dir, b))
                 for b in range(n_buckets)]
    dst_parts = [fns["split_dsts"].remote(edge_refs[b])
                 for b in range(n_buckets)]
    if n_buckets == 1:
        dst_parts = [[r] for r in dst_parts]
    state_refs, count_refs = [], []
    for b in range(n_buckets):
        st, cnt = fns["build_state"].remote(
            edge_refs[b], *[dst_parts[sb][b] for sb in range(n_buckets)])
        state_refs.append(st)
        count_refs.append(cnt)
    n_nodes = int(sum(ray.get(count_refs)))
    return n_buckets, meta, fns, edge_refs, state_refs, n_nodes


def pagerank_prepartitioned(store_dir: str, *, iters: int = 3,
                            scale: int = 10**12, d_num: int = 85,
                            d_den: int = 100):
    """Integer fixed-point PageRank over a :func:`write_edge_store`
    store — bit-identical to ``pagerank_fixedpoint`` on the same edges
    (same order-free integer update), with ZERO per-round edge
    movement: per round, one ``pr_contrib`` task per bucket over the
    cached edge block and one ``pr_fold`` task per bucket over the
    routed combined partials. → Dataset (node, rank_fp)."""
    import ray
    import ray.data

    n_buckets, _, fns, edge_refs, state_refs, n_nodes = _setup(store_dir)
    if n_nodes == 0:
        return ray.data.from_arrow(pa.table({
            "node": pa.array([], pa.int64()),
            "rank_fp": pa.array([], pa.int64())}))
    r_init = scale // n_nodes
    base = ((d_den - d_num) * r_init) // d_den
    rank_refs: list = [r_init] * n_buckets  # scalar init, vectors after
    for _ in range(iters):
        contribs = [fns["pr_contrib"].remote(edge_refs[b], state_refs[b],
                                             rank_refs[b])
                    for b in range(n_buckets)]
        if n_buckets == 1:
            contribs = [[r] for r in contribs]
        rank_refs = [
            fns["pr_fold"].remote(state_refs[b], base, d_num, d_den,
                                  *[contribs[sb][b]
                                    for sb in range(n_buckets)])
            for b in range(n_buckets)
        ]
    tables = [fns["to_table"].remote(state_refs[b], rank_refs[b], "rank_fp")
              for b in range(n_buckets)]
    return ray.data.from_arrow_refs(tables)


def components_prepartitioned(store_dir: str, *, max_rounds: int = 200):
    """Min-label connected components over a SYMMETRIC
    :func:`write_edge_store` store — label = smallest member, identical
    to kg/unionfind's paths. Per round: one ``cc_cand`` task per bucket
    (cached edges, local labels) + one ``cc_fold`` min-merge per
    bucket; edges never move. Plain min propagation (no pointer
    jumping — compression would need remote label lookups), so rounds
    scale with component diameter; non-convergence RAISES rather than
    returning wrong labels. → Dataset (node, label)."""
    import ray
    import ray.data

    n_buckets, meta, fns, edge_refs, state_refs, n_nodes = _setup(store_dir)
    if not meta.get("symmetric"):
        raise ValueError("components_prepartitioned requires a store "
                         "written with symmetric=True")
    if n_nodes == 0:
        return ray.data.from_arrow(pa.table({
            "node": pa.array([], pa.int64()),
            "label": pa.array([], pa.int64())}))

    @ray.remote
    def init_labels(state):
        return state[0].copy()

    label_refs = [init_labels.remote(state_refs[b]) for b in range(n_buckets)]
    for _ in range(max_rounds):
        cands = [fns["cc_cand"].remote(edge_refs[b], state_refs[b],
                                       label_refs[b])
                 for b in range(n_buckets)]
        if n_buckets == 1:
            cands = [[r] for r in cands]
        changed_refs = []
        new_labels = []
        for b in range(n_buckets):
            nl, ch = fns["cc_fold"].remote(
                state_refs[b], label_refs[b],
                *[cands[sb][b] for sb in range(n_buckets)])
            new_labels.append(nl)
            changed_refs.append(ch)
        label_refs = new_labels
        if not any(ray.get(changed_refs)):
            break
    else:
        raise RuntimeError(
            f"components_prepartitioned did not converge within "
            f"{max_rounds} rounds (rounds scale with component "
            f"diameter) — labels would be WRONG; raise max_rounds")
    tables = [fns["to_table"].remote(state_refs[b], label_refs[b], "label")
              for b in range(n_buckets)]
    return ray.data.from_arrow_refs(tables)


def sssp_prepartitioned(store_dir: str, *, source: int | None = None,
                        rounds: int = 12, check_every: int = 4):
    """Weighted single-source shortest paths (Bellman–Ford) over a
    SYMMETRIC WEIGHTED :func:`write_edge_store` store — the
    zero-driver-state sibling of ``ops/graph.py sssp_distances``
    (round-4 VERDICT item 2): identical output (same order-free
    min-plus update, fixpoint-or-``rounds``-cap contract, reached
    nodes only), but the (node, dist) state lives as one sorted
    per-bucket vector in the object store. The driver plumbs object
    refs and ray.gets only O(n_buckets) scalars per round (changed
    flags; plus per-bucket node minima once when ``source=None``) —
    at a 10⁹–10¹⁰-node web graph the 16 B/node distance table that
    capped the broadcast path never materializes on any single
    machine.

    Per round: one ``sssp_cand`` task per bucket relaxes the bucket's
    cached edge block against its LOCAL distances (every src's state
    is bucket-resident because edges are bucketed by hash(src)) and
    ships per-(task, target-bucket) combined ``(dst, min_cand)`` rows;
    one ``sssp_fold`` min-merge per bucket applies them. Edges never
    move after the one-off partitioned write.

    ``check_every`` batches the early-stop convergence check: the
    driver submits that many rounds of tasks eagerly (bucket *b*'s
    fold of round *r* only awaits the candidate refs addressed to it,
    so rounds PIPELINE across buckets with no driver barrier between
    them) and ray.gets the changed flags only at chunk boundaries.
    Rounds past the fixpoint are no-ops on a min-plus recurrence, so
    the output is identical for any ``check_every``; measured 1.9×
    on the 60-round 20M-edge stress vs checking every round
    (BENCH/sssp_stress_r5_10m.json).
    """
    import ray
    import ray.data

    if check_every < 1:
        raise ValueError("check_every must be >= 1")
    n_buckets, meta, fns, edge_refs, state_refs, n_nodes = _setup(store_dir)
    if not meta.get("symmetric"):
        raise ValueError("sssp_prepartitioned requires a store written "
                         "with symmetric=True")
    if not meta.get("weighted"):
        raise ValueError("sssp_prepartitioned requires a store written "
                         "with weighted=True")
    if n_nodes == 0:
        return ray.data.from_arrow(pa.table({
            "node": pa.array([], pa.int64()),
            "dist": pa.array([], pa.int64())}))
    if source is None:
        mins = [m for m in ray.get([fns["node_min"].remote(s)
                                    for s in state_refs]) if m is not None]
        source = min(mins)

    inits = [fns["sssp_init"].remote(state_refs[b], source)
             for b in range(n_buckets)]
    dist_refs = [d for d, _ in inits]
    if not any(ray.get([f for _, f in inits])):
        # a source that is no graph endpoint still has distance 0 to
        # itself — match sssp_distances' [(source, 0)] exactly instead
        # of silently returning an empty table
        return ray.data.from_arrow(pa.table({
            "node": pa.array([source], pa.int64()),
            "dist": pa.array([0], pa.int64())}))
    done = 0
    while done < rounds:
        chunk = min(check_every, rounds - done)
        changed_refs = []
        for _ in range(chunk):
            cands = [fns["sssp_cand"].remote(edge_refs[b], state_refs[b],
                                             dist_refs[b])
                     for b in range(n_buckets)]
            if n_buckets == 1:
                cands = [[r] for r in cands]
            changed_refs, new_dists = [], []
            for b in range(n_buckets):
                nd, ch = fns["sssp_fold"].remote(
                    state_refs[b], dist_refs[b],
                    *[cands[sb][b] for sb in range(n_buckets)])
                new_dists.append(nd)
                changed_refs.append(ch)
            dist_refs = new_dists
        done += chunk
        # flags of the chunk's LAST round only: unchanged there is a
        # fixpoint (min-plus rounds are monotone), so earlier rounds
        # of the chunk need no inspection
        if not any(ray.get(changed_refs)):
            break
    tables = [fns["reached_table"].remote(state_refs[b], dist_refs[b])
              for b in range(n_buckets)]
    return ray.data.from_arrow_refs(tables)
