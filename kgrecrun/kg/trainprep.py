"""KG-embedding training preparation over the canonical triple table.

The downstream consumer of the materialized KG (reference produces the
article text these triples come from; the graph itself is this repo's
north-rule extension) is a graph-embedding / link-prediction trainer.
This module provides the four standard prep operators, each expressed
in the repo's scale idioms (map-side combiners, bucketed cogroups, one
narrow shuffle per stage, no per-key ``map_groups``):

- :func:`fact_resolution` — truth discovery: one winning object per
  (subj, pred) by source support (SQL ``arg_max`` shape).
- :func:`metapath_two_hop` — 2-hop metapath statistics WITHOUT
  materializing paths: per-bridge pred-count vectors joined in a
  bucketed cogroup, so a hub entity with c1 in-edges and c2 out-edges
  contributes a single (c1·c2) product row instead of c1·c2 rows.
- :func:`negative_samples` — deterministic corrupt-tail negatives
  (md5-keyed pick from the object vocabulary, accidental positives
  removed by a bucketed anti-join).
- :func:`random_walks` — DeepWalk-style walks with md5-keyed
  deterministic next-hop selection (bit-reproducible across engines,
  block layouts and parallelism).

Determinism contract: every hash is ``md5(key-string)`` low-8-bytes
little-endian, the exact value DuckDB's ``md5_number_upper`` returns,
so each operator has a value-exact SQL mirror. md5 per candidate is
the established repo convention for oracle parity (ops/sample.py); at
production scale you would swap in a vectorized 64-bit hash with the
same API.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

N_BUCKETS = 256


def _md5_u64(strs) -> np.ndarray:
    """md5(s)[:8] little-endian per string — matches DuckDB
    ``md5_number_upper(s)`` (same mapping as ops/sample._hash64)."""
    return np.fromiter(
        (int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "little")
         for s in strs),
        dtype=np.uint64,
        count=len(strs),
    )


def _concat_str(cols: list[pa.ChunkedArray | pa.Array], sep: str = "|") -> pa.Array:
    out = pc.binary_join_element_wise(*[pc.cast(c, pa.string()) for c in cols], sep)
    return out.combine_chunks() if isinstance(out, pa.ChunkedArray) else out


def fact_resolution(triples_ds):
    """One object per (subj, pred): max ``n_sources``, ties broken by
    the lexicographically smallest ``obj`` — the standard
    majority-support truth-discovery rule for functional predicates.

    Scale shape: delegates to ops/argext.group_arg_extreme — a map-side
    lexsort combiner (≤ 1 candidate/key/block crosses the wire) and one
    bucketed groupby; no per-key dispatch at any key cardinality.
    """
    from ..ops.argext import group_arg_extreme

    def add_key(b: pa.Table) -> pa.Table:
        return b.append_column("__sp", _concat_str([b["subj"], b["pred"]]))

    keyed = triples_ds.map_batches(add_key, batch_format="pyarrow",
                                   zero_copy_batch=True)
    won = group_arg_extreme(
        keyed, key="__sp",
        order_cols=[("n_sources", "descending"), ("obj", "ascending")],
    )
    return won.map_batches(lambda b: b.drop_columns(["__sp"]),
                           batch_format="pyarrow", zero_copy_batch=True)


def metapath_two_hop(triples_ds, *, n_buckets: int = N_BUCKETS):
    """Per (pred1, pred2): the number of 2-hop path instances
    (a −pred1→ b −pred2→ c) and the number of distinct bridge entities
    b, WITHOUT materializing any path.

    n_paths(p1,p2) = Σ_b in_cnt(b,p1) · out_cnt(b,p2), so it suffices
    to aggregate per-bridge pred-count vectors and join them per
    bridge: a hub with 10^4 in- and 10^4 out-edges contributes ONE
    product row instead of 10^8 path rows — the skew-proof formulation
    (path materialization is quadratic in hub degree; this is linear).

    Stages: (1) map-side partial counts keyed (entity, pred, side) —
    the shuffle carries ≤ |block-distinct (entity,pred)| rows; (2) ONE
    bucketed cogroup by hash(entity) that finishes the per-side sums
    and runs a vectorized Arrow join + product per bucket; (3) a final
    native groupby over ≤ |preds|² partial rows. Buckets partition
    entities, so per-bucket COUNT DISTINCT bridge sums exactly.
    """
    from .unionfind import hash_bucket

    def partial(b: pa.Table) -> pa.Table:
        fst = (b.select(["obj", "pred"]).group_by(["obj", "pred"])
                .aggregate([([], "count_all")]))
        snd = (b.select(["subj", "pred"]).group_by(["subj", "pred"])
                .aggregate([([], "count_all")]))
        out = pa.table({
            "entity": pa.concat_arrays([fst["obj"].combine_chunks(),
                                        snd["subj"].combine_chunks()]),
            "pred": pa.concat_arrays([fst["pred"].combine_chunks(),
                                      snd["pred"].combine_chunks()]),
            "cnt": pa.concat_arrays([
                pc.cast(fst["count_all"], pa.int64()).combine_chunks(),
                pc.cast(snd["count_all"], pa.int64()).combine_chunks()]),
            "side": pa.concat_arrays([
                pa.nulls(fst.num_rows, pa.int8()).fill_null(0),
                pa.nulls(snd.num_rows, pa.int8()).fill_null(1)]),
        })
        return out.append_column(
            "__bucket", hash_bucket(out["entity"].combine_chunks(), n_buckets))

    def sweep(group: pa.Table) -> pa.Table:
        left = group.filter(pc.equal(group["side"], 0))
        right = group.filter(pc.equal(group["side"], 1))
        if left.num_rows == 0 or right.num_rows == 0:
            return pa.table({"pp": pa.array([], pa.string()),
                             "n_paths": pa.array([], pa.int64()),
                             "n_bridges": pa.array([], pa.int64())})
        a = (left.select(["entity", "pred", "cnt"])
                 .group_by(["entity", "pred"]).aggregate([("cnt", "sum")])
                 .select(["entity", "pred", "cnt_sum"])
                 .rename_columns(["entity", "p1", "c1"]))
        bb = (right.select(["entity", "pred", "cnt"])
                   .group_by(["entity", "pred"]).aggregate([("cnt", "sum")])
                   .select(["entity", "pred", "cnt_sum"])
                   .rename_columns(["entity", "p2", "c2"]))
        j = a.join(bb, keys="entity", join_type="inner")
        if j.num_rows == 0:
            return pa.table({"pp": pa.array([], pa.string()),
                             "n_paths": pa.array([], pa.int64()),
                             "n_bridges": pa.array([], pa.int64())})
        j = j.append_column("prod", pc.multiply(j["c1"], j["c2"]))
        agg = (j.group_by(["p1", "p2"])
                .aggregate([("prod", "sum"), ("entity", "count_distinct")]))
        return pa.table({
            "pp": _concat_str([agg["p1"], agg["p2"]]),
            "n_paths": pc.cast(agg["prod_sum"], pa.int64()).combine_chunks(),
            "n_bridges": pc.cast(agg["entity_count_distinct"],
                                 pa.int64()).combine_chunks(),
        })

    parts = (triples_ds.map_batches(partial, batch_format="pyarrow",
                                    zero_copy_batch=True)
             .groupby("__bucket").map_groups(sweep, batch_format="pyarrow")
             .groupby("pp").sum(["n_paths", "n_bridges"]))

    def split(b: pa.Table) -> pa.Table:
        pp = pc.split_pattern(b["pp"], "|")
        return pa.table({
            "pred1": pc.list_element(pp, 0),
            "pred2": pc.list_element(pp, 1),
            "n_paths": b["sum(n_paths)"],
            "n_bridges": b["sum(n_bridges)"],
        })

    return parts.map_batches(split, batch_format="pyarrow")


def negative_samples(triples_ds, *, k: int = 2):
    """Corrupt-tail negatives for link-prediction training: for each
    positive (subj, pred, obj) and i ∈ [0, k), the candidate object is
    the entity at rank ``md5(subj|pred|obj|i) % |pool|`` of the SORTED
    object vocabulary; candidates that collide with a true triple are
    dropped (type-consistent filtered negatives, deterministic —
    RNG-free and reshard-stable like every sampler in this repo).

    Scale shape: the pool is the OBJECT VOCABULARY (the entity catalog
    — orders of magnitude smaller than the triple corpus), built by
    per-block uniques over the once-cached narrow refs (a groupby here
    would be a full corpus shuffle for a catalog-order result — it
    measured 31.5 s of the op's 165 s at 10M triples), broadcast once
    via ``ray.put`` and indexed per batch with one vectorized ``take``;
    at vocabularies past broadcast size you would md5-sample the pool
    first (same determinism). The accidental-positive filter is the
    bloom-prefiltered anti-join (ops/joins.bloom_anti_join): candidates
    almost never hit a true triple, so bloom-negatives (~97.5%) stream
    straight through with zero exchange and only the ~2.5% bloom FPs
    enter the exact cogroup verify — bit-identical to the plain
    anti-join at a fraction of the shuffle.
    """
    import ray

    from ..ops.joins import bloom_anti_join

    narrow = triples_ds.map_batches(
        lambda b: b.select(["subj", "pred", "obj"]),
        batch_format="pyarrow", zero_copy_batch=True).materialize()

    @ray.remote
    def block_objs(block: pa.Table):
        if block.num_rows == 0 or "obj" not in block.column_names:
            return np.array([], object)
        return np.unique(block["obj"].combine_chunks().to_numpy(
            zero_copy_only=False))

    uniq = ray.get([block_objs.remote(br) for br in narrow.to_arrow_refs()])
    pool = np.unique(np.concatenate(
        [u for u in uniq if len(u)] or [np.array([], object)]))
    pool_ref = ray.put(pool)

    def gen(batch: pa.Table) -> pa.Table:
        p = ray.get(pool_ref)
        n = batch.num_rows
        subj = batch["subj"].to_pylist()
        pred = batch["pred"].to_pylist()
        obj = batch["obj"].to_pylist()
        keys = [f"{s}|{pr}|{o}|{i}"
                for s, pr, o in zip(subj, pred, obj) for i in range(k)]
        idx = _md5_u64(keys) % np.uint64(len(p))
        cand = p[idx]
        rep = pa.table({
            "subj": pa.array(np.repeat(subj, k)),
            "pred": pa.array(np.repeat(pred, k)),
            "obj": pa.array(np.repeat(obj, k)),
            "neg_idx": pa.array(np.tile(np.arange(k, dtype=np.int64), n)),
            "neg_obj": pa.array(cand),
        })
        return rep.append_column(
            "__k", _concat_str([rep["subj"], rep["pred"], rep["neg_obj"]]))

    cands = narrow.map_batches(gen, batch_format="pyarrow",
                               zero_copy_batch=True)
    true_keys = narrow.map_batches(
        lambda b: pa.table({"__k": _concat_str([b["subj"], b["pred"], b["obj"]])}),
        batch_format="pyarrow", zero_copy_batch=True)
    # bloom sized to the triple count (~10 bits/key, ~1% FP — an
    # undersized bloom saturates and the prefilter passes everything);
    # prefilter_right keeps the verify exchange at positive-slice size
    # instead of shipping every true key
    n_true = narrow.count()
    m_bits = 1 << max(23, (10 * max(n_true, 1) - 1).bit_length())
    kept = bloom_anti_join(cands, true_keys, "__k", m_bits=m_bits,
                           prefilter_right=True)
    return kept.map_batches(lambda b: b.drop_columns(["__k"]),
                            batch_format="pyarrow", zero_copy_batch=True)


_VERB_TEMPLATES = {
    "born_in": " was born in ",
    "works_for": " works for ",
    "acquired": " acquired ",
    "located_in": " is located in ",
    "founded": " founded ",
    "ceo_of": " is the CEO of ",
    "headquartered_in": " is headquartered in ",
    "partnered_with": " partnered with ",
}


def verbalize(triples_ds):
    """KG-to-text linearization: one template sentence per triple
    (" <subj> works for <obj>." style) — the standard trick for feeding
    structured facts to an LM as training text. Unknown predicates fall
    back to " <pred> " as the connective, so the map is total.

    Stateless vectorized map: predicate → connective via one
    dictionary ``index_in`` + ``take`` per batch (no per-row Python),
    then a single ``binary_join_element_wise``. No shuffle at all.
    """
    preds = pa.array(list(_VERB_TEMPLATES))
    # fallback connective for out-of-vocabulary predicates: the raw
    # predicate wrapped in spaces
    mids = list(_VERB_TEMPLATES.values())

    def f(batch: pa.Table) -> pa.Table:
        idx = pc.index_in(batch["pred"], preds)
        fallback = pc.binary_join_element_wise(
            " ", pc.cast(batch["pred"], pa.string()), " ", "")
        mid_arr = pa.concat_arrays([pa.array(mids), fallback.combine_chunks()
                                    if isinstance(fallback, pa.ChunkedArray)
                                    else fallback])
        n = len(preds)
        pos = pc.if_else(pc.is_null(idx),
                         pc.add(pa.array(range(batch.num_rows), pa.int32()),
                                n),
                         idx)
        mid = pc.take(mid_arr, pos)
        sentence = pc.binary_join_element_wise(
            pc.cast(batch["subj"], pa.string()), mid,
            pc.cast(batch["obj"], pa.string()), ".", "")
        return batch.select(["subj", "pred", "obj", "n_sources"]) \
                    .append_column("sentence", sentence)

    return triples_ds.map_batches(f, batch_format="pyarrow",
                                  zero_copy_batch=True)


def ego_networks(triples_ds, *, fanout: int = 3, hops: int = 2,
                 broadcast_seeds: int = 2_000_000):
    """GraphSAGE-style deterministic neighborhood sampling: for every
    seed (each distinct subject), a ``hops``-hop ego network keeping at
    most ``fanout`` out-neighbors per (seed, parent) — the neighbor's
    rank is ``md5(seed|hop|parent|nbr)`` (hop 1: ``md5(seed|1|nbr)``),
    so the sample is bit-identical across engines and parallelism.
    Already-visited nodes (the seed, earlier hops) are excluded from
    candidacy BEFORE ranking; sampled nodes are deduped per (seed, hop)
    AFTER ranking. Emits (seed, hop, node), hop 0 = the seed.

    Scale shape (the random_walks broadcast design): the frontier is
    (seed, parent) pairs — bounded by seeds × fanout^(hop-1), catalog-
    order for the small fixed fanouts GNN training uses — kept on the
    driver; each hop is raw tasks over the once-cached compacted
    adjacency refs (vectorized Arrow join + visited mask + local
    top-f per (seed, parent)), tree-merged. Merging local top-f lists
    is exact: the global top-f is a subset of the union of local
    top-fs. Raises past ``broadcast_seeds`` frontier entries.
    """
    import ray
    import ray.data

    adj = (triples_ds.map_batches(
        lambda b: b.select(["subj", "obj"]),
        batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["subj", "obj"]).count()
        .map_batches(lambda b: pa.table({"node": b["subj"], "nbr": b["obj"]}),
                     batch_format="pyarrow")
        .materialize())
    n_edges = adj.count()
    adj = adj.repartition(max(8, min(256, n_edges // 75_000 + 1))).materialize()
    block_refs = list(adj.to_arrow_refs())

    @ray.remote
    def block_nodes(block: pa.Table):
        if block.num_rows == 0 or "node" not in block.column_names:
            return np.array([], object)
        return np.unique(block["node"].combine_chunks().to_numpy(
            zero_copy_only=False))

    uniq = ray.get([block_nodes.remote(br) for br in block_refs])
    seeds_np = np.unique(np.concatenate(
        [u for u in uniq if len(u)] or [np.array([], object)]))
    if len(seeds_np) > broadcast_seeds:
        raise RuntimeError(
            f"ego_networks: {len(seeds_np)} seeds exceeds "
            f"broadcast_seeds={broadcast_seeds}")

    empty = pa.table({"seed": pa.array([], pa.string()),
                      "parent": pa.array([], pa.string()),
                      "nbr": pa.array([], pa.string()),
                      "__h": pa.array([], pa.uint64())})

    def _topf(t: pa.Table) -> pa.Table:
        """≤ fanout rows per (seed, parent) under (__h, nbr) order."""
        if t.num_rows == 0:
            return t
        order = pc.sort_indices(t, sort_keys=[
            ("seed", "ascending"), ("parent", "ascending"),
            ("__h", "ascending"), ("nbr", "ascending")])
        s = t.take(order)
        key = pc.binary_join_element_wise(s["seed"], s["parent"], "|")
        kv = key.combine_chunks().to_numpy(zero_copy_only=False)
        first = np.ones(len(kv), dtype=bool)
        first[1:] = kv[1:] != kv[:-1]
        seg_start = np.maximum.accumulate(
            np.where(first, np.arange(len(kv)), 0))
        rank = np.arange(len(kv)) - seg_start
        return s.filter(pa.array(rank < fanout))

    @ray.remote
    def local_top(block: pa.Table, fr: pa.Table, visited: np.ndarray,
                  hop: int) -> pa.Table:
        if block.num_rows == 0 or "node" not in block.column_names:
            return empty
        cand = block.join(fr, keys="node", join_type="inner")
        if cand.num_rows == 0:
            return empty
        cand = cand.rename_columns(
            [{"node": "parent"}.get(c, c) for c in cand.column_names])
        vis_key = pc.binary_join_element_wise(
            cand["seed"], cand["nbr"], "|").combine_chunks() \
            .to_numpy(zero_copy_only=False)
        cand = cand.filter(pa.array(~np.isin(vis_key, visited)))
        if cand.num_rows == 0:
            return empty
        if hop == 1:
            keys = [f"{s}|1|{v}" for s, v in
                    zip(cand["seed"].to_pylist(), cand["nbr"].to_pylist())]
        else:
            keys = [f"{s}|{hop}|{p}|{v}" for s, p, v in
                    zip(cand["seed"].to_pylist(), cand["parent"].to_pylist(),
                        cand["nbr"].to_pylist())]
        cand = cand.append_column("__h", pa.array(_md5_u64(keys)))
        return _topf(cand.select(["seed", "parent", "nbr", "__h"]))

    @ray.remote
    def merge_top(*tables) -> pa.Table:
        live = [t for t in tables if t.num_rows]
        if not live:
            return empty
        return _topf(pa.concat_tables(live))

    out = [pa.table({"seed": pa.array(seeds_np.tolist(), pa.string()),
                     "hop": pa.nulls(len(seeds_np), pa.int64()).fill_null(0),
                     "node": pa.array(seeds_np.tolist(), pa.string())})]
    # frontier: (seed, node=parent-to-expand); visited: "seed|node" keys
    frontier = pa.table({"seed": out[0]["seed"], "node": out[0]["node"]})
    visited = np.unique(np.array(
        [f"{s}|{s}" for s in seeds_np.tolist()], object))

    for hop in range(1, hops + 1):
        fr_ref = ray.put(frontier)
        vis_ref = ray.put(visited)
        parts = [local_top.remote(br, fr_ref, vis_ref, hop)
                 for br in block_refs]
        while len(parts) > 1:
            parts = [merge_top.remote(*parts[i:i + 16])
                     for i in range(0, len(parts), 16)]
        won = ray.get(parts[0])
        if won.num_rows == 0:
            break
        # dedup sampled nodes per seed (different parents may sample
        # the same node), then extend visited + emit
        lvl = (won.select(["seed", "nbr"])
               .group_by(["seed", "nbr"]).aggregate([]))
        out.append(pa.table({
            "seed": lvl["seed"],
            "hop": pa.nulls(lvl.num_rows, pa.int64()).fill_null(hop),
            "node": lvl["nbr"],
        }))
        new_keys = pc.binary_join_element_wise(
            lvl["seed"], lvl["nbr"], "|").combine_chunks() \
            .to_numpy(zero_copy_only=False)
        visited = np.unique(np.concatenate([visited, new_keys]))
        frontier = pa.table({"seed": lvl["seed"], "node": lvl["nbr"]})

    return ray.data.from_arrow(pa.concat_tables(out))


def random_walks(triples_ds, *, steps: int = 3,
                 broadcast_walks: int | None = 2_000_000):
    """One deterministic walk per distinct subject entity: at step t
    the walk at node u moves to the out-neighbor v minimizing
    ``md5(walk_id|t|v)`` (ties — md5 collisions — broken by smallest
    v). Emits (walk_id, step, node) rows for step 0..steps; a walk
    with no outgoing edge simply stops (no row). md5-keyed selection
    makes the walk corpus bit-identical across engines / parallelism —
    the property DeepWalk-style sampling needs for reproducible
    training data.

    Two paths, bit-identical output (the bfs_distances trade-off):

    - **broadcast** (default, ``broadcast_walks`` = bound): walk count
      is catalog-order (one per distinct subject), so the frontier
      lives on the driver and each round is raw tasks over the ONCE-
      cached adjacency block refs — a vectorized Arrow join + local
      argmin per block, then a tree merge of ≤1-row-per-walk winner
      tables. Zero shuffles and zero executor launches per round
      (iterated Dataset algebra costs ~10 s/round in executor startup
      alone). Raises past the bound.
    - **exchange** (``broadcast_walks=None``): nothing walk-shaped on
      the driver — per round ONE bucketed cogroup join frontier ×
      adjacency plus the argext winner sweep; every inter-round table
      is narrow and materialized. Right when the walk set itself
      outgrows driver memory.

    Rounds are serial by nature (step t+1 needs step t) — ``steps`` is
    small and fixed, matching the unrolled-recurrence oracle contract
    used by k-core/SSSP. The (subj, obj) adjacency is projected NARROW
    and materialized ONCE (it feeds every round — re-deriving it would
    re-run the whole upstream KG pipeline per round).
    """
    adj = (triples_ds.map_batches(
        lambda b: b.select(["subj", "obj"]),
        batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["subj", "obj"]).count()
        .map_batches(lambda b: pa.table({"node": b["subj"], "nbr": b["obj"]}),
                     batch_format="pyarrow")
        .materialize())
    # compact: the distinct-groupby emits ~n_buckets tiny blocks; per-
    # round task count (broadcast) and shuffle cost (exchange) scale
    # with BLOCK COUNT, not rows — target ~75k rows/block
    n_edges = adj.count()
    adj = adj.repartition(max(8, min(256, n_edges // 75_000 + 1))).materialize()

    if broadcast_walks is not None:
        return _random_walks_broadcast(adj, steps=steps, bound=broadcast_walks)
    return _random_walks_exchange(adj, steps=steps)


def _random_walks_broadcast(adj, *, steps: int, bound: int):
    import ray
    import ray.data

    from ..ops.argext import _winners

    block_refs = list(adj.to_arrow_refs())

    # walk starts = distinct subjects, computed over the already-cached
    # refs (a groupby here would launch one more whole execution)
    @ray.remote
    def block_nodes(block: pa.Table):
        import numpy as np
        # repartition of a tiny dataset emits schemaless empty blocks
        if block.num_rows == 0 or "node" not in block.column_names:
            return np.array([], object)
        return np.unique(block["node"].combine_chunks().to_numpy(
            zero_copy_only=False))

    import numpy as np
    uniq = ray.get([block_nodes.remote(br) for br in block_refs])
    walk_np = np.unique(np.concatenate(
        [u for u in uniq if len(u)] or [np.array([], object)]))
    if len(walk_np) > bound:
        raise RuntimeError(
            f"random_walks: {len(walk_np)} walks exceeds "
            f"broadcast_walks={bound}; pass broadcast_walks=None for the "
            "exchange path")
    walk_nodes = pa.array(walk_np.tolist(), pa.string())
    frontier = pa.table({"walk_id": walk_nodes, "node": walk_nodes})
    order = [("__h", "ascending"), ("nbr", "ascending")]
    empty = pa.table({"walk_id": pa.array([], pa.string()),
                      "nbr": pa.array([], pa.string()),
                      "__h": pa.array([], pa.uint64())})

    @ray.remote
    def local_win(block: pa.Table, fr: pa.Table, t: int) -> pa.Table:
        if block.num_rows == 0 or "node" not in block.column_names:
            return empty
        cand = block.join(fr, keys="node", join_type="inner")
        if cand.num_rows == 0:
            return empty
        keys = [f"{w}|{t}|{v}" for w, v in
                zip(cand["walk_id"].to_pylist(), cand["nbr"].to_pylist())]
        cand = cand.append_column("__h", pa.array(_md5_u64(keys)))
        return _winners(cand.select(["walk_id", "nbr", "__h"]),
                        "walk_id", order)

    @ray.remote
    def merge(*tables) -> pa.Table:
        live = [t for t in tables if t.num_rows]
        if not live:
            return empty
        return _winners(pa.concat_tables(live), "walk_id", order)

    def step_table(fr: pa.Table, t: int) -> pa.Table:
        return pa.table({
            "walk_id": fr["walk_id"],
            "step": pa.nulls(fr.num_rows, pa.int64()).fill_null(t),
            "node": fr["node"],
        })

    out = [step_table(frontier, 0)]
    for t in range(1, steps + 1):
        fr_ref = ray.put(frontier)
        parts = [local_win.remote(br, fr_ref, t) for br in block_refs]
        while len(parts) > 1:
            parts = [merge.remote(*parts[i:i + 16])
                     for i in range(0, len(parts), 16)]
        won = ray.get(parts[0])
        if won.num_rows == 0:
            break
        frontier = pa.table({"walk_id": won["walk_id"], "node": won["nbr"]})
        out.append(step_table(frontier, t))
    return ray.data.from_arrow(pa.concat_tables(out))


def _random_walks_exchange(adj, *, steps: int):
    from ..ops.argext import group_arg_extreme
    from ..ops.cogroup import bucket_join

    frontier = (adj.map_batches(lambda b: b.select(["node"]),
                                batch_format="pyarrow", zero_copy_batch=True)
                .groupby("node").count()
                .map_batches(lambda b: pa.table({"walk_id": b["node"],
                                                 "node": b["node"]}),
                             batch_format="pyarrow")
                .materialize())

    def emit(step: int):
        def f(b: pa.Table) -> pa.Table:
            return pa.table({
                "walk_id": b["walk_id"],
                "step": pa.nulls(b.num_rows, pa.int64()).fill_null(step),
                "node": b["node"],
            })
        return f

    fr_schema = pa.schema([("walk_id", pa.string()), ("node", pa.string())])
    adj_schema = pa.schema([("node", pa.string()), ("nbr", pa.string())])

    outs = [frontier.map_batches(emit(0), batch_format="pyarrow")]
    for t in range(1, steps + 1):
        # explicit schemas: a dead-ended (empty) frontier loses its
        # schema and bucket_join cannot infer it from the Dataset
        cand = bucket_join(frontier, adj, key="node", join_type="inner",
                           left_schema=fr_schema, right_schema=adj_schema)

        def score(b: pa.Table, _t=t) -> pa.Table:
            keys = [f"{w}|{_t}|{v}" for w, v in
                    zip(b["walk_id"].to_pylist(), b["nbr"].to_pylist())]
            return b.append_column("__h", pa.array(_md5_u64(keys)))

        scored = cand.map_batches(score, batch_format="pyarrow",
                                  zero_copy_batch=True)
        won = group_arg_extreme(
            scored, key="walk_id",
            order_cols=[("__h", "ascending"), ("nbr", "ascending")])
        frontier = won.map_batches(
            lambda b: pa.table({"walk_id": b["walk_id"], "node": b["nbr"]}),
            batch_format="pyarrow").materialize()
        outs.append(frontier.map_batches(emit(t), batch_format="pyarrow"))

    out = outs[0]
    for o in outs[1:]:
        out = out.union(o)
    return out
