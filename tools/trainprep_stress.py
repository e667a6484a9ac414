"""Scale stress for the KG training-prep family (kg/trainprep.py) at
10^7 triples with planted hub skew.

What it evidences:

1. **Hub-proof two-hop** — the count-vector formulation's whole point:
   with h hub entities each carrying ~N·f/h in-edges and out-edges,
   path materialization would emit Σ c_in·c_out ≈ (N·f/h)² rows per
   hub (10^10-order at this corpus), while metapath_two_hop ships one
   product row per (hub, pred, pred). The tool reports n_paths (the
   count the quadratic join would have had to materialize) next to
   the operator's wall time.
2. **Bit-identity across parallelism** — every operator's output
   checksummed (order-free xor of row md5s); run the tool at 8 and 32
   cpus and the checksums must be equal (the repo's two-parallelism
   determinism protocol).
3. **Throughput per stage** at the two cpu counts for the scaling
   record (BENCH/trainprep_stress_r3_cpus{8,32}.json).

Synthetic triples (deterministic, no RNG stream reuse — independent
md5 per (row, field), the memory-lesson-safe construction): subj/obj
drawn from an n_entities catalog; a fraction ``hub_frac`` of objects
redirect to one of ``n_hubs`` hub entities.

Usage: python tools/trainprep_stress.py [n_triples] [n_entities] [num_cpus] [ops]
Defaults: 10,000,000 triples, 100,000 entities, 32 cpus, all four ops;
``ops`` is a comma list from {two_hop,fact_resolution,neg,walks} for
capstone cells that exercise a subset. Prints one JSON.
"""

from __future__ import annotations

import hashlib
import json
import sys
import time

import numpy as np
import pyarrow as pa

sys.path.insert(0, "/root/repo")

PREDS = np.array(["born_in", "works_for", "acquired", "located_in",
                  "founded", "ceo_of", "headquartered_in", "partnered_with"])
N_HUBS = 4
HUB_FRAC = 0.10  # 10% of objects land on one of the 4 hubs


def _u64(prefix: str, ids: np.ndarray) -> np.ndarray:
    """Independent md5 per (prefix, id) — vectorized enough for a
    generator (one digest per value, no multiplicative streams)."""
    return np.fromiter(
        (int.from_bytes(hashlib.md5(f"{prefix}:{i}".encode()).digest()[:8],
                        "little") for i in ids),
        dtype=np.uint64, count=len(ids))


def synth_triples(n: int, n_entities: int, num_blocks: int = 128):
    import ray.data

    per = n // num_blocks

    def gen(batch: pa.Table) -> pa.Table:
        out = []
        for b in batch["id"].to_pylist():
            base = np.arange(per, dtype=np.int64) + b * per
            s = _u64("s", base) % np.uint64(n_entities)
            p = _u64("p", base) % np.uint64(len(PREDS))
            o = _u64("o", base) % np.uint64(n_entities)
            hub = _u64("h", base)
            is_hub = (hub % np.uint64(1000)) < np.uint64(int(HUB_FRAC * 1000))
            o = np.where(is_hub, hub % np.uint64(N_HUBS), o)
            out.append(pa.table({
                "subj": pa.array(np.char.add("E", s.astype("U7"))),
                "pred": pa.array(PREDS[p.astype(np.int64)]),
                "obj": pa.array(np.char.add("E", o.astype("U7"))),
                "n_sources": pa.array((base % 7 + 1).astype(np.int64)),
            }))
        return pa.concat_tables(out)

    return ray.data.range(num_blocks, override_num_blocks=num_blocks).map_batches(
        gen, batch_format="pyarrow")


def _xor_checksum(ds, cols: list[str]) -> int:
    """Order-free dataset fingerprint: xor of md5(row-string) per row."""
    def f(batch: pa.Table) -> pa.Table:
        parts = ["|".join(str(v) for v in row)
                 for row in zip(*[batch[c].to_pylist() for c in cols])]
        acc = 0
        for s in parts:
            acc ^= int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "little")
        return pa.table({"x": pa.array([acc], pa.uint64()),
                         "n": pa.array([batch.num_rows], pa.int64())})

    acc, n = 0, 0
    for b in ds.map_batches(f, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"):
        for x, m in zip(b["x"].to_pylist(), b["n"].to_pylist()):
            acc ^= x
            n += m
    return acc, n


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    n_entities = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000
    cpus = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    ops = set((sys.argv[4] if len(sys.argv) > 4
               else "two_hop,fact_resolution,neg,walks").split(","))

    import ray

    ray.init(address="local", num_cpus=cpus, include_dashboard=False,
             log_to_driver=False)

    from kgrecrun.kg import trainprep as tp

    res = {"n_triples": n, "n_entities": n_entities, "num_cpus": cpus,
           "n_hubs": N_HUBS, "hub_frac": HUB_FRAC}

    t0 = time.time()
    triples = synth_triples(n, n_entities).materialize()
    res["gen_s"] = round(time.time() - t0, 2)

    if "two_hop" in ops:
        t0 = time.time()
        th = tp.metapath_two_hop(triples).take_all()
        res["two_hop_s"] = round(time.time() - t0, 2)
        res["two_hop_rows"] = len(th)
        res["two_hop_n_paths"] = int(sum(r["n_paths"] for r in th))
        res["two_hop_checksum"] = _xor_checksum_rows(th)

    if "fact_resolution" in ops:
        t0 = time.time()
        fr = tp.fact_resolution(triples)
        c, nr = _xor_checksum(fr, ["subj", "pred", "obj", "n_sources"])
        res["fact_resolution_s"] = round(time.time() - t0, 2)
        res["fact_resolution_rows"] = nr
        res["fact_resolution_checksum"] = c

    if "neg" in ops:
        t0 = time.time()
        ns = tp.negative_samples(triples)
        c, nr = _xor_checksum(ns, ["subj", "pred", "obj", "neg_idx",
                                   "neg_obj"])
        res["neg_samples_s"] = round(time.time() - t0, 2)
        res["neg_samples_rows"] = nr
        res["neg_samples_checksum"] = c

    if "walks" in ops:
        t0 = time.time()
        rw = tp.random_walks(triples)
        c, nr = _xor_checksum(rw, ["walk_id", "step", "node"])
        res["walks_s"] = round(time.time() - t0, 2)
        res["walks_rows"] = nr
        res["walks_checksum"] = c

    res["total_s"] = round(sum(v for k, v in res.items()
                               if isinstance(v, float) and k.endswith("_s")), 2)
    print(json.dumps(res))
    ray.shutdown()


def _xor_checksum_rows(rows: list[dict]) -> int:
    acc = 0
    for r in rows:
        s = "|".join(str(r[k]) for k in sorted(r))
        acc ^= int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "little")
    return acc


if __name__ == "__main__":
    main()
