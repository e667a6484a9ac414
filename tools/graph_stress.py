"""Scale stress for the graph family: synthesize a deterministic random
symmetric graph (N directed edge rows over K nodes, seeded per block),
run `pagerank_fixedpoint` through BOTH the exchange path (unbounded node
sets: 2 bucket-cogroup exchanges per Pregel round) and the
broadcast-ranks path (catalog-bounded node sets: ranks ray.put once per
round, one combiner-partial fold), and report wall time + rank-vector
checksums — the two paths must be BIT-IDENTICAL.

Two-parallelism protocol: run once at 8 and once at 32 cpus in fresh
processes and compare edge throughput (BENCH/BASELINE.md).

Usage: python tools/graph_stress.py [n_edge_rows] [n_nodes] [num_cpus]
       [--skip-exchange] [--triangles] [--linkpred] [--bfs]

--triangles: stress `triangle_counts` instead — distinct canonical
edge list, broadcast-edge vs bucket_join-exchange paths, per-node
triangle-count checksums (must be bit-identical).

--linkpred: stress `link_prediction` — distinct canonical edge list,
per-pair (common, jaccard) checksums; cross-parallelism bit-identity
is certified by comparing the checksum across the 8- and 32-cpu runs.

--bfs: stress `bfs_distances` (4 hops from node 0) — broadcast vs
exchange frontier paths, (node, dist) checksums, must be identical.

--kcore: stress `kcore` deep peeling — at mean degree 20 the k=14
core survives (~88% of nodes) only after ~21 peel rounds, i.e. ~21
full edge passes; (node, deg) checksums certified across parallelism.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np
import pyarrow as pa

sys.path.insert(0, "/root/repo")


def synth_edges(n_rows: int, n_nodes: int, num_blocks: int = 128):
    """Deterministic symmetric multigraph: block index seeds the RNG;
    both directions of each sampled pair are emitted."""
    import ray.data

    per = n_rows // (2 * num_blocks)

    def gen(batch: pa.Table) -> pa.Table:
        import zlib

        out = []
        for b in batch["id"].to_pylist():
            rng = np.random.RandomState(zlib.crc32(f"g-{b}".encode()) % (2**31))
            u = rng.randint(0, n_nodes, per).astype(np.int64)
            v = rng.randint(0, n_nodes, per).astype(np.int64)
            keep = u != v
            u, v = u[keep], v[keep]
            out.append(pa.table({
                "src": pa.array(np.concatenate([u, v]), pa.int64()),
                "dst": pa.array(np.concatenate([v, u]), pa.int64()),
            }))
        return pa.concat_tables(out)

    return ray.data.range(num_blocks, override_num_blocks=num_blocks).map_batches(
        gen, batch_format="pyarrow"
    )


def synth_distinct_edges(n_rows: int, n_nodes: int, num_blocks: int = 128):
    """Deterministic DISTINCT canonical (src < dst) edge list — the
    triangle_counts input contract. Block-seeded pair sampling, packed
    per-block unique, then one bucketed global distinct (the same
    two-stage distinct copurchase_edges uses)."""
    import ray.data

    from kgrecrun.kg.unionfind import hash_bucket

    per = n_rows // num_blocks

    def gen(batch: pa.Table) -> pa.Table:
        import zlib

        out = []
        for b in batch["id"].to_pylist():
            rng = np.random.RandomState(zlib.crc32(f"t-{b}".encode()) % (2**31))
            u = rng.randint(0, n_nodes, per).astype(np.int64)
            v = rng.randint(0, n_nodes, per).astype(np.int64)
            keep = u != v
            u, v = u[keep], v[keep]
            k = np.unique((np.minimum(u, v) << np.int64(32)) | np.maximum(u, v))
            t = pa.table({"k": pa.array(k, pa.int64())})
            out.append(t.append_column(
                "__bucket", hash_bucket(t["k"].combine_chunks(), 256)
            ))
        return pa.concat_tables(out)

    def distinct_bucket(group: pa.Table) -> pa.Table:
        k = np.unique(group["k"].combine_chunks().to_numpy(zero_copy_only=False))
        return pa.table({
            "src": pa.array(k >> np.int64(32), pa.int64()),
            "dst": pa.array(k & np.int64(0xFFFFFFFF), pa.int64()),
        })

    return (
        ray.data.range(num_blocks, override_num_blocks=num_blocks)
        .map_batches(gen, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(distinct_bucket, batch_format="pyarrow")
        .repartition(64)
    )


def _checksum(ranks, key_col: str = "node", val_col: str = "rank_fp"):
    """(n, Σ val, Σ val·splitmix(key) mod 2^64) — order- and
    partition-invariant (everything is elementwise mod-2^64 wraparound
    plus an associative sum), collision-resistant enough to certify
    bit-identity."""
    n = 0
    s = 0
    mix = 0
    M = 1 << 64
    for b in ranks.iter_batches(batch_format="pyarrow", batch_size=None):
        node = b[key_col].combine_chunks().to_numpy(zero_copy_only=False)
        r = b[val_col].combine_chunks().to_numpy(zero_copy_only=False)
        x = node.astype(np.uint64)
        x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        x = x ^ (x >> np.uint64(31))
        n += len(r)
        s += int(r.sum())
        mix = (mix + int((r.astype(np.uint64) * x).sum())) % M
    return n, s, mix


def main() -> None:
    import ray

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n_rows = int(args[0]) if args else 10_000_000
    n_nodes = int(args[1]) if len(args) > 1 else 1_000_000
    num_cpus = int(args[2]) if len(args) > 2 else 32
    skip_exchange = "--skip-exchange" in sys.argv

    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
             log_to_driver=False)
    from kgrecrun.ops.graph import pagerank_fixedpoint

    if "--linkpred" in sys.argv:
        from kgrecrun.ops.graph import link_prediction

        edges = synth_distinct_edges(n_rows, n_nodes).materialize()
        m = edges.count()
        rec = {"mode": "linkpred", "n_edges": m, "n_nodes": n_nodes,
               "num_cpus": num_cpus}
        t0 = time.time()
        out = link_prediction(edges, min_common=2).map_batches(
            lambda b: pa.table({
                "pk": pa.array(
                    (b["x"].combine_chunks().to_numpy(zero_copy_only=False)
                     << np.int64(32))
                    | b["y"].combine_chunks().to_numpy(zero_copy_only=False),
                    pa.int64()),
                "common": b["common"],
            }), batch_format="pyarrow").materialize()
        rec["wall_sec"] = round(time.time() - t0, 2)
        rec["edges_per_sec"] = round(m / rec["wall_sec"], 0)
        cs = _checksum(out, "pk", "common")
        rec["checksum"] = cs
        rec["n_pairs"] = cs[0]
        print(json.dumps(rec))
        ray.shutdown()
        return

    if "--prep" in sys.argv:
        # prepartitioned edge store: one-off bucketed write, then
        # pagerank rounds with ZERO edge movement (ops/graphstore.py)
        # vs the shuffling exchange path — ranks must be bit-identical
        import shutil

        from kgrecrun.ops.graphstore import (
            pagerank_prepartitioned,
            write_edge_store,
        )

        # synth_edges emits BOTH directions (symmetric multigraph) —
        # required by symmetric=True on both compared paths
        edges = synth_edges(n_rows, n_nodes).materialize()
        m = edges.count()
        rec = {"mode": "prep", "n_edges": m, "n_nodes": n_nodes,
               "num_cpus": num_cpus}
        store = f"/tmp/graph_prep_store_{n_rows}_{n_nodes}"
        shutil.rmtree(store, ignore_errors=True)
        shutil.rmtree(store + ".stage", ignore_errors=True)
        t0 = time.time()
        write_edge_store(edges, store, n_buckets=64, symmetric=True)
        rec["store_write_sec"] = round(time.time() - t0, 2)
        t0 = time.time()
        pre = pagerank_prepartitioned(store, iters=3).materialize()
        rec["prep_pagerank_sec"] = round(time.time() - t0, 2)
        cs_pre = _checksum(pre)
        rec["checksum_prep"] = cs_pre
        rec["prep_edge_rounds_per_sec"] = round(
            3 * m / rec["prep_pagerank_sec"], 0)
        if not skip_exchange:
            t0 = time.time()
            ex = pagerank_fixedpoint(edges, iters=3, symmetric=True) \
                .materialize()
            rec["exchange_pagerank_sec"] = round(time.time() - t0, 2)
            cs_ex = _checksum(ex)
            rec["checksum_exchange"] = cs_ex
            rec["ranks_identical"] = cs_ex == cs_pre
            assert rec["ranks_identical"], "prep != exchange pagerank"
        print(json.dumps(rec))
        ray.shutdown()
        return

    if "--cc" in sys.argv:
        from kgrecrun.kg.unionfind import (
            connected_components_broadcast,
            connected_components_distributed,
        )

        edges = synth_distinct_edges(n_rows, n_nodes).materialize()
        m = edges.count()
        rec = {"mode": "cc", "n_edges": m, "n_nodes": n_nodes,
               "num_cpus": num_cpus}
        t0 = time.time()
        bc = connected_components_broadcast(edges).materialize()
        rec["broadcast_sec"] = round(time.time() - t0, 2)
        cs_bc = _checksum(bc, "node", "label")
        rec["checksum_broadcast"] = cs_bc
        rec["n_labeled"] = cs_bc[0]
        if not skip_exchange:
            t0 = time.time()
            ex = connected_components_distributed(edges).materialize()
            rec["exchange_sec"] = round(time.time() - t0, 2)
            cs_ex = _checksum(ex, "node", "label")
            rec["checksum_exchange"] = cs_ex
            rec["paths_identical"] = cs_ex == cs_bc
            assert rec["paths_identical"], "broadcast != distributed cc"
        rec["broadcast_edges_per_sec"] = round(m / rec["broadcast_sec"], 0)
        print(json.dumps(rec))
        ray.shutdown()
        return

    if "--kcore" in sys.argv:
        from kgrecrun.ops.graph import kcore

        edges = synth_distinct_edges(n_rows, n_nodes).materialize()
        m = edges.count()
        k = 14  # just under the mean-degree-20 collapse threshold
        rec = {"mode": "kcore", "n_edges": m, "n_nodes": n_nodes,
               "num_cpus": num_cpus, "k": k}
        t0 = time.time()
        out = kcore(edges, k=k, max_rounds=64).materialize()
        rec["wall_sec"] = round(time.time() - t0, 2)
        cs = _checksum(out, "node", "deg")
        rec["checksum"] = cs
        rec["n_core"] = cs[0]
        rec["edge_passes_per_sec"] = round(m / rec["wall_sec"], 0)
        print(json.dumps(rec))
        ray.shutdown()
        return

    if "--bfs" in sys.argv:
        from kgrecrun.ops.graph import bfs_distances

        edges = synth_distinct_edges(n_rows, n_nodes).materialize()
        m = edges.count()
        rec = {"mode": "bfs", "n_edges": m, "n_nodes": n_nodes,
               "num_cpus": num_cpus, "max_hops": 4}
        t0 = time.time()
        bc = bfs_distances(edges, source=0, max_hops=4).materialize()
        rec["broadcast_sec"] = round(time.time() - t0, 2)
        cs_bc = _checksum(bc, "node", "dist")
        rec["checksum_broadcast"] = cs_bc
        rec["n_reached"] = cs_bc[0]
        if not skip_exchange:
            t0 = time.time()
            ex = bfs_distances(edges, source=0, max_hops=4,
                               broadcast_nodes=None).materialize()
            rec["exchange_sec"] = round(time.time() - t0, 2)
            cs_ex = _checksum(ex, "node", "dist")
            rec["checksum_exchange"] = cs_ex
            rec["paths_identical"] = cs_ex == cs_bc
            assert rec["paths_identical"], "broadcast != exchange bfs"
        rec["broadcast_edges_per_sec"] = round(m / rec["broadcast_sec"], 0)
        print(json.dumps(rec))
        ray.shutdown()
        return

    if "--triangles" in sys.argv:
        from kgrecrun.ops.graph import triangle_counts

        edges = synth_distinct_edges(n_rows, n_nodes).materialize()
        m = edges.count()
        rec = {"mode": "triangles", "n_edges": m, "n_nodes": n_nodes,
               "num_cpus": num_cpus}

        t0 = time.time()
        bc = triangle_counts(edges).materialize()
        rec["broadcast_sec"] = round(time.time() - t0, 2)
        cs_bc = _checksum(bc, "part", "n_triangles")
        rec["checksum_broadcast"] = cs_bc
        rec["n_triangle_nodes"] = cs_bc[0]
        rec["total_triangles"] = cs_bc[1] // 3

        if not skip_exchange:
            t0 = time.time()
            ex = triangle_counts(edges, broadcast_edges=None).materialize()
            rec["exchange_sec"] = round(time.time() - t0, 2)
            cs_ex = _checksum(ex, "part", "n_triangles")
            rec["checksum_exchange"] = cs_ex
            rec["paths_identical"] = cs_ex == cs_bc
            assert rec["paths_identical"], "broadcast != exchange triangles"

        print(json.dumps(rec))
        ray.shutdown()
        return

    edges = synth_edges(n_rows, n_nodes).materialize()
    n_edges = edges.count()
    rec: dict = {"n_edge_rows": n_edges, "n_nodes": n_nodes,
                 "num_cpus": num_cpus, "iters": 3}

    t0 = time.time()
    bc = pagerank_fixedpoint(edges, iters=3, symmetric=True,
                             broadcast_ranks=n_nodes + 1)
    cs_bc = _checksum(bc)
    rec["broadcast_sec"] = round(time.time() - t0, 2)
    rec["broadcast_edges_per_sec"] = round(
        3 * n_edges / rec["broadcast_sec"], 0
    )
    rec["checksum_broadcast"] = cs_bc

    if not skip_exchange:
        t0 = time.time()
        ex = pagerank_fixedpoint(edges, iters=3, symmetric=True)
        cs_ex = _checksum(ex)
        rec["exchange_sec"] = round(time.time() - t0, 2)
        rec["exchange_edges_per_sec"] = round(
            3 * n_edges / rec["exchange_sec"], 0
        )
        rec["checksum_exchange"] = cs_ex
        rec["paths_identical"] = cs_ex == cs_bc
        assert rec["paths_identical"], "broadcast != exchange ranks"

    print(json.dumps(rec))
    ray.shutdown()


if __name__ == "__main__":
    main()
