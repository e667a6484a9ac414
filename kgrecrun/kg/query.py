"""Declarative query surfaces over the materialized KG: SPARQL-style
basic graph patterns (conjunctive multi-pattern match) and bounded
regular-path closure (``pred+`` up to a fixed depth).

Both are expressed in the repo's scale idioms: predicate filters are
pushed MAP-SIDE before any exchange (a pattern touching one predicate
ships only that predicate's edges), joins are the bucketed cogroup
(dispatch capped at n_buckets at any key cardinality), and iterative
closure rounds reuse one narrow materialized edge list (the
random_walks lesson: re-deriving it would re-run the whole upstream
pipeline per round).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def conjunctive_match(triples_ds, patterns: list[tuple[str, str]]):
    """Basic-graph-pattern match over a shared subject variable:
    ``patterns = [(pred1, out1), (pred2, out2), ...]`` returns one row
    per subject matching EVERY pattern, with columns
    ``subj, <out1>, <out2>, ...`` — the object bound by each pattern
    (SPARQL ``?s pred1 ?o1 . ?s pred2 ?o2``). A subject with several
    objects for a predicate yields the cross product (SQL join
    semantics).

    Scale shape: each pattern's edges are filtered map-side BEFORE the
    exchange (predicate pushdown — only matching edges ship), then the
    patterns fold left through bucketed cogroup inner joins on subj.
    n-1 joins for n patterns, each exchange bounded by that
    predicate's edge count, never the corpus.
    """
    from ..ops.cogroup import bucket_join

    if len(patterns) < 2:
        raise ValueError("conjunctive_match needs >= 2 patterns")
    names = [out for _, out in patterns]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate output names: {names}")

    def leg(pred: str, out: str):
        def f(b: pa.Table) -> pa.Table:
            m = b.filter(pc.equal(b["pred"], pred))
            return pa.table({"subj": m["subj"], out: m["obj"]})
        return triples_ds.map_batches(f, batch_format="pyarrow",
                                      zero_copy_batch=True)

    schema = [("subj", pa.string())]
    acc = leg(*patterns[0])
    acc_schema = pa.schema(schema + [(patterns[0][1], pa.string())])
    for pred, out in patterns[1:]:
        right_schema = pa.schema(schema + [(out, pa.string())])
        acc = bucket_join(acc, leg(pred, out), key="subj",
                          join_type="inner", left_schema=acc_schema,
                          right_schema=right_schema)
        acc_schema = pa.schema(list(acc_schema) + [(out, pa.string())])
    return acc


def path_closure(triples_ds, pred: str, *, max_len: int = 3):
    """Bounded regular-path query ``pred+``: all (src, dst, path_len)
    pairs connected by 1..max_len consecutive ``pred`` edges, with
    path_len the SHORTEST such length (cycles and longer rediscoveries
    are dropped; self-reachability src==dst is excluded). The bounded
    unrolling is the oracle contract used by k-core / SSSP — outputs
    are value-equal to the unrolled SQL whether or not the closure
    converged within the bound.

    Scale shape: the predicate's edge list is filtered map-side and
    materialized NARROW once; each round extends frontier paths by one
    bucketed cogroup join on the meeting node and drops pairs already
    reached at a shorter length via a bucketed anti-join on the
    (src, dst) composite. Inter-round tables are (src, dst) string
    pairs — bounded by the closure size, never the corpus.
    """
    import ray.data

    from ..ops.cogroup import bucket_join
    from ..ops.joins import anti_join

    def edges_only(b: pa.Table) -> pa.Table:
        m = b.filter(pc.equal(b["pred"], pred))
        # distinct within the block; global distinct follows in groupby
        return (pa.table({"src": m["subj"], "dst": m["obj"]})
                .group_by(["src", "dst"]).aggregate([]))

    edges = (triples_ds.map_batches(edges_only, batch_format="pyarrow",
                                    zero_copy_batch=True)
             .groupby(["src", "dst"]).count()
             .map_batches(lambda b: b.select(["src", "dst"]),
                          batch_format="pyarrow")
             .materialize())
    pair_schema = pa.schema([("src", pa.string()), ("dst", pa.string())])

    def with_len(ds, n: int):
        return ds.map_batches(
            lambda b: b.append_column(
                "path_len", pa.nulls(b.num_rows, pa.int64()).fill_null(n)),
            batch_format="pyarrow")

    def keyed(ds):
        return ds.map_batches(
            lambda b: pa.table({"__k": pc.binary_join_element_wise(
                b["src"], b["dst"], "|")}),
            batch_format="pyarrow")

    def no_self(b: pa.Table) -> pa.Table:
        return b.filter(pc.not_equal(b["src"], b["dst"]))

    # BFS invariant: shortest paths extend only shortest paths, so each
    # round extends just the NEWLY-reached frontier; any (src, dst)
    # found again later is strictly longer and anti-joined away.
    reached = edges.map_batches(no_self, batch_format="pyarrow").materialize()
    frontier = reached
    out = [with_len(reached, 1)]

    for n in range(2, max_len + 1):
        left = frontier.map_batches(
            lambda b: pa.table({"src": b["src"], "mid": b["dst"]}),
            batch_format="pyarrow")
        right = edges.map_batches(
            lambda b: pa.table({"mid": b["src"], "dst2": b["dst"]}),
            batch_format="pyarrow")
        ext = bucket_join(
            left, right, key="mid", join_type="inner",
            left_schema=pa.schema([("src", pa.string()),
                                   ("mid", pa.string())]),
            right_schema=pa.schema([("mid", pa.string()),
                                    ("dst2", pa.string())]))
        cand = (ext.map_batches(
            lambda b: (pa.table({"src": b["src"], "dst": b["dst2"]})
                       .group_by(["src", "dst"]).aggregate([])),
            batch_format="pyarrow")
            .groupby(["src", "dst"]).count()
            .map_batches(lambda b: b.select(["src", "dst"]),
                         batch_format="pyarrow")
            .map_batches(no_self, batch_format="pyarrow"))
        # drop pairs already reached at a shorter length
        ck = cand.map_batches(
            lambda b: b.append_column("__k", pc.binary_join_element_wise(
                b["src"], b["dst"], "|")),
            batch_format="pyarrow")
        new = (anti_join(ck, keyed(reached), "__k")
               .map_batches(lambda b: b.drop_columns(["__k"]),
                            batch_format="pyarrow")
               .materialize())
        if new.count() == 0:
            break
        out.append(with_len(new, n))
        reached = reached.union(new).materialize()
        frontier = new

    acc = out[0]
    for o in out[1:]:
        acc = acc.union(o)
    return acc
