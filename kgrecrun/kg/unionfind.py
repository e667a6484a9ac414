"""Connected components: driver-side union-find for verified edge lists
(edges ≪ entities after LSH verification), plus a distributed
iterative min-label propagation over Ray Data groupbys for the case
where even the edge list is too large for one machine (BTS-style
balanced approaches exist — see PAPERS.md — but label propagation with
an iteration cap is sufficient for name-duplicate clusters, which have
tiny diameters).
"""

from __future__ import annotations


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


def connected_components_distributed(edges_ds, *, max_iters: int = 20):
    """Min-label propagation over an edges Dataset (src, dst) → labels
    Dataset (node, label). Each iteration: emit (node, neighbor_label)
    both directions + self, groupby(node).min(label); stop when no label
    changed. Iterations = O(component diameter); duplicate-name clusters
    are near-cliques so 2-3 rounds typically converge.

    Hot-key note: groupby(node) skew equals node degree; name-dup graphs
    are bounded-degree. For power-law graphs pre-combine per block first
    (map_batches local min) — that local pre-aggregation happens inside
    Ray Data's sort-based aggregate already.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    def seed_labels(batch: pa.Table) -> pa.Table:
        nodes = pa.concat_arrays(
            [batch["src"].combine_chunks(), batch["dst"].combine_chunks()]
        )
        return pa.table({"node": nodes, "label": nodes})

    labels = edges_ds.map_batches(seed_labels, batch_format="pyarrow")
    labels = labels.groupby("node").min("label")
    labels = labels.map_batches(
        lambda t: t.rename_columns(["node", "label"]), batch_format="pyarrow"
    )

    for _ in range(max_iters):
        # join edge endpoints with current labels (broadcast: labels are
        # the clustered subset only — small relative to the corpus)
        label_map = {}
        for b in labels.iter_batches(batch_format="pyarrow"):
            label_map.update(zip(b["node"].to_pylist(), b["label"].to_pylist()))

        def propagate(batch: pa.Table, label_map=label_map) -> pa.Table:
            src = batch["src"].to_pylist()
            dst = batch["dst"].to_pylist()
            nodes, labs = [], []
            for s, d in zip(src, dst):
                ls = label_map.get(s, s)
                ld = label_map.get(d, d)
                m = min(ls, ld)
                nodes.extend((s, d))
                labs.extend((m, m))
            return pa.table({"node": pa.array(nodes), "label": pa.array(labs)})

        new_labels = edges_ds.map_batches(propagate, batch_format="pyarrow")
        new_labels = new_labels.groupby("node").min("label")
        new_labels = new_labels.map_batches(
            lambda t: t.rename_columns(["node", "label"]), batch_format="pyarrow"
        )
        new_map = {}
        for b in new_labels.iter_batches(batch_format="pyarrow"):
            new_map.update(zip(b["node"].to_pylist(), b["label"].to_pylist()))
        labels = new_labels
        if new_map == label_map:
            break
    return labels
