"""Connected components: driver-side union-find for verified edge lists
(edges ≪ entities after LSH verification), plus a distributed
iterative min-label propagation over Ray Data groupbys for the case
where even the edge list is too large for one machine (BTS-style
balanced approaches exist — see PAPERS.md — but label propagation with
per-iteration pointer doubling converges in O(log diameter) rounds,
ample for duplicate clusters; non-convergence within the cap RAISES
rather than returning wrong labels).
"""

from __future__ import annotations


def hash_bucket(arr, n_buckets: int):
    """Deterministic hash bucket per value (vectorized splitmix64 finalizer
    for integer ids, polars' vectorized xxhash for strings). n_buckets
    must be a power of two.

    The integer path MIXES the bits before masking: plain ``id & (n-1)``
    collapses keys strided by a multiple of n_buckets (sharded /
    partitioned id schemes) into one bucket, breaking the "one bucket
    fits a worker" assumption every bucket-cogroup operator relies on.
    splitmix64's finalizer is a bijection, so distinct keys stay
    distinct and the bucketing is deterministic across runs/processes.

    The string path needs only WITHIN-RUN consistency (bucket ids are
    internal grouping keys — every consumer processes whole buckets, so
    outputs never depend on the assignment; same contract as the bloom
    hashes in ops/joins). The previous per-row crc32 loop cost ~4 µs/row
    — pure Python in what is otherwise the hot path of every
    string-keyed cogroup — so strings now go through polars' xxhash
    (one vectorized call per batch), with crc32 kept as the no-polars
    fallback."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    if pa.types.is_integer(arr.type):
        cast = pc.cast(arr, pa.int64())
        if isinstance(cast, pa.ChunkedArray):
            cast = cast.combine_chunks()
        x = cast.to_numpy(zero_copy_only=False).astype(np.uint64)
        x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        x = x ^ (x >> np.uint64(31))
        return pa.array((x & np.uint64(n_buckets - 1)).astype(np.int32), pa.int32())
    try:
        import polars as pl

        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        h = pl.Series(arr.cast(pa.string())).hash(seed=0).to_numpy() \
            .astype(np.uint64)
        return pa.array((h & np.uint64(n_buckets - 1)).astype(np.int32),
                        pa.int32())
    except ImportError:
        import zlib

        return pa.array(
            [zlib.crc32(str(v).encode()) & (n_buckets - 1)
             for v in arr.to_pylist()],
            pa.int32(),
        )


class UnionFind:
    """Path-compressed, union-by-root-ordering: the root of a cluster is
    always its smallest member, making cluster ids deterministic."""

    def __init__(self):
        self.parent: dict = {}

    def find(self, x):
        parent = self.parent
        if x not in parent:
            parent[x] = x
            return x
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    def union(self, a, b) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra == rb:
            return
        if rb < ra:
            ra, rb = rb, ra
        self.parent[rb] = ra

    def components(self) -> dict:
        """member → smallest member of its component."""
        return {x: self.find(x) for x in list(self.parent)}


def connected_components_distributed(edges_ds, *, max_iters: int = 50):
    """Min-label propagation over an edges Dataset (src, dst) → labels
    Dataset (node, label), label = smallest member of the component —
    the same cluster ids ``UnionFind.components()`` produces.

    Fully driver-free: per iteration (1) a BUCKET cogroup of edges with
    the current labels on the sending endpoint broadcasts each node's
    label to its neighbors, (2) a bucket cogroup of incoming candidates
    with the node's own labels folds the min and flags changes; the
    only driver-visible value is the scalar changed-count used for
    early stop. Labels are ``materialize()``d between iterations
    (bounded by the clustered node set, held in the distributed object
    store — never a driver dict).

    Grouping is by ``hash(node) % n_buckets``, not by node: Ray's
    map_groups calls Python once per group, so per-node groups would
    cost one interpreter round-trip per node; per-bucket groups give a
    few hundred large groups whose internals run as vectorized acero
    joins / grouped aggregations. Size n_buckets so one bucket's edges
    fit a worker's heap (edges/n_buckets rows).

    Iterations = O(component diameter); LSH-verified duplicate clusters
    are near-cliques so 2-3 rounds typically converge.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    edges = edges_ds.materialize()
    n_buckets = 64
    # keep the label dataset at a FIXED block count: aggregate output
    # block counts otherwise compound through the iteration's unions and
    # every round's sort doubles in cost (measured: 2s -> 72s by iter 7)
    n_label_blocks = max(1, min(n_buckets, edges.num_blocks()))

    def _bucket(arr: pa.ChunkedArray | pa.Array) -> pa.Array:
        return hash_bucket(arr, n_buckets)

    def seed_labels(batch: pa.Table) -> pa.Table:
        nodes = pa.concat_arrays(
            [batch["src"].combine_chunks(), batch["dst"].combine_chunks()]
        )
        return pa.table({"node": nodes, "label": nodes})

    labels = (
        edges.map_batches(seed_labels, batch_format="pyarrow")
        .groupby("node")
        .min("label")
        .map_batches(
            lambda t: t.rename_columns(["node", "label"]), batch_format="pyarrow"
        )
        .repartition(n_label_blocks)
        .materialize()
    )

    # phase A inputs: edge rows bucketed by the SENDING endpoint, label
    # rows bucketed by their node; inside a bucket an acero join
    # attaches each sender's label to its outgoing directions
    def edge_rows(batch: pa.Table) -> pa.Table:
        src = batch["src"].combine_chunks()
        dst = batch["dst"].combine_chunks()
        key = pa.concat_arrays([src, dst])
        peer = pa.concat_arrays([dst, src])
        return pa.table({
            "bucket": _bucket(key),
            "key": key,
            "peer": peer,
            "label": pa.nulls(len(key), key.type),
            "is_label": pa.array([False] * len(key), pa.bool_()),
        })

    def label_rows(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table({
            "bucket": _bucket(batch["node"]),
            "key": batch["node"],
            "peer": pa.nulls(n, batch["node"].type),
            "label": batch["label"],
            "is_label": pa.array([True] * n, pa.bool_()),
        })

    def send_bucket(group: pa.Table) -> pa.Table:
        es = group.filter(pc.equal(group["is_label"], False)).select(["key", "peer"])
        ls = group.filter(group["is_label"]).select(["key", "label"])
        joined = es.join(ls, keys=["key"], join_type="inner")
        return pa.table({"node": joined["peer"], "cand": joined["label"]})

    # phase B inputs: candidate messages + own labels, bucketed by the
    # RECEIVING node; inside a bucket a grouped min folds both
    def fold_rows_msgs(batch: pa.Table) -> pa.Table:
        return pa.table({
            "bucket": _bucket(batch["node"]),
            "node": batch["node"],
            "cand": batch["cand"],
            "old": pa.nulls(batch.num_rows, batch["cand"].type),
        })

    def fold_rows_labels(batch: pa.Table) -> pa.Table:
        return pa.table({
            "bucket": _bucket(batch["node"]),
            "node": batch["node"],
            "cand": batch["label"],
            "old": batch["label"],
        })

    def min_bucket(group: pa.Table) -> pa.Table:
        agg = (
            group.select(["node", "cand", "old"])
            .group_by(["node"])
            .aggregate([("cand", "min"), ("old", "min")])
        )
        changed = pc.cast(
            pc.not_equal(agg["cand_min"], agg["old_min"]), pa.int64()
        )
        return pa.table({
            "node": agg["node"],
            "label": agg["cand_min"],
            "changed": changed,
        })

    # pointer-doubling shortcut (label <- label[label]): one extra
    # bucket cogroup per iteration turns the propagation into
    # O(log diameter) rounds — a long similarity chain (diameter > 50)
    # converges in ~6 doublings instead of blowing the iteration cap.
    # Invariant preserved: a node's label is always a member of its
    # component that is <= the node, and labels only decrease, so the
    # fixpoint (component min) is unchanged.
    def ref_rows(batch: pa.Table) -> pa.Table:
        return pa.table({
            "bucket": _bucket(batch["label"]),
            "key": batch["label"],
            "node": batch["node"],
            "lab": pa.nulls(batch.num_rows, batch["label"].type),
            "is_def": pa.array([False] * batch.num_rows, pa.bool_()),
        })

    def def_rows(batch: pa.Table) -> pa.Table:
        return pa.table({
            "bucket": _bucket(batch["node"]),
            "key": batch["node"],
            "node": pa.nulls(batch.num_rows, batch["node"].type),
            "lab": batch["label"],
            "is_def": pa.array([True] * batch.num_rows, pa.bool_()),
        })

    def shortcut_bucket(group: pa.Table) -> pa.Table:
        refs = group.filter(pc.equal(group["is_def"], False)).select(["key", "node"])
        defs = group.filter(group["is_def"]).select(["key", "lab"])
        # every label value is itself a node in the label table, so the
        # inner join is total over refs
        joined = refs.join(defs, keys=["key"], join_type="inner")
        changed = pc.cast(pc.not_equal(joined["lab"], joined["key"]), pa.int64())
        return pa.table({
            "node": joined["node"],
            "label": joined["lab"],
            "changed": changed,
        })

    n_changed = None
    for _ in range(max_iters):
        send = edges.map_batches(edge_rows, batch_format="pyarrow").union(
            labels.map_batches(label_rows, batch_format="pyarrow")
        )
        msgs = send.groupby("bucket").map_groups(send_bucket, batch_format="pyarrow")
        folded = msgs.map_batches(fold_rows_msgs, batch_format="pyarrow").union(
            labels.map_batches(fold_rows_labels, batch_format="pyarrow")
        )
        new_labels = (
            folded.groupby("bucket")
            .map_groups(min_bucket, batch_format="pyarrow")
            .materialize()
        )
        n_changed_b = new_labels.sum("changed")
        propagated = new_labels.drop_columns(["changed"])
        doubled = (
            propagated.map_batches(ref_rows, batch_format="pyarrow")
            .union(propagated.map_batches(def_rows, batch_format="pyarrow"))
            .groupby("bucket")
            .map_groups(shortcut_bucket, batch_format="pyarrow")
            .repartition(n_label_blocks)
            .materialize()
        )
        n_changed_c = doubled.sum("changed")
        labels = doubled.drop_columns(["changed"]).materialize()
        n_changed = (n_changed_b or 0) + (n_changed_c or 0)
        if not n_changed:
            break
    if n_changed:
        raise RuntimeError(
            f"connected_components_distributed did not converge within "
            f"{max_iters} iterations ({n_changed} labels still changing) — "
            f"cluster labels would be WRONG; raise max_iters (propagation "
            f"with pointer doubling needs ~log2(component diameter) rounds)"
        )
    return labels
