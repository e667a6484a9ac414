"""KG quality / evolution analytics: schema induction over the triple
table, conflict auditing for functional predicates, per-source-host
extraction statistics, and the KG growth curve over crawl time.

All four are map-side-combiner + one-narrow-groupby shapes (the repo
standard); the conflict audit adds one bucketed segment sweep (top-2
per key is not a native aggregate — the sweep is vectorized numpy over
lexsorted segments, dispatch capped at n_buckets).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

N_BUCKETS = 256

_HOST_RE = r"^https://(?P<host>[^/]+)/"


def host_stats(articles_ds):
    """Per source host: document count and total extracted text length
    — the per-site extraction monitor a crawl operator watches. Host
    parsed by the same RE2 regex the SQL oracle runs; map-side partial
    (host, n, len) rows, one narrow groupby-sum."""
    def local(b: pa.Table) -> pa.Table:
        # non-matching urls: extract_regex yields null but DuckDB's
        # regexp_extract yields '' — fill to '' so engine and oracle
        # group such rows identically (ADVICE r3; not triggered by the
        # current corpus, where every url matches)
        host = pc.fill_null(pc.struct_field(
            pc.extract_regex(b["url"].combine_chunks(), _HOST_RE), "host"), "")
        t = pa.table({"host": host, "text_length": b["text_length"]})
        g = t.group_by("host").aggregate([([], "count_all"),
                                          ("text_length", "sum")])
        return pa.table({
            "host": g["host"],
            "n_local": pc.cast(g["count_all"], pa.int64()).combine_chunks(),
            "len_local": pc.cast(g["text_length_sum"],
                                 pa.int64()).combine_chunks(),
        })

    return (articles_ds.map_batches(local, batch_format="pyarrow",
                                    zero_copy_batch=True)
            .groupby("host").sum(["n_local", "len_local"])
            .map_batches(lambda b: b.rename_columns(
                ["host", "n_docs", "total_text_length"]),
                batch_format="pyarrow"))


def pred_signatures(triples_ds):
    """Schema induction: per (pred, subj_type, obj_type) — the entity
    type is the id's leading letter (P/O/L in this world) — the number
    of distinct facts and their total support. The ontology-constraint
    view: a predicate's domain/range profile falls out of the data."""
    def local(b: pa.Table) -> pa.Table:
        t = pa.table({
            "pred": b["pred"],
            "subj_type": pc.utf8_slice_codeunits(
                b["subj"].combine_chunks(), 0, 1),
            "obj_type": pc.utf8_slice_codeunits(
                b["obj"].combine_chunks(), 0, 1),
            "n_sources": b["n_sources"],
        })
        g = (t.group_by(["pred", "subj_type", "obj_type"])
              .aggregate([([], "count_all"), ("n_sources", "sum")]))
        return pa.table({
            "pred": g["pred"], "subj_type": g["subj_type"],
            "obj_type": g["obj_type"],
            "f_local": pc.cast(g["count_all"], pa.int64()).combine_chunks(),
            "s_local": pc.cast(g["n_sources_sum"],
                               pa.int64()).combine_chunks(),
        })

    return (triples_ds.map_batches(local, batch_format="pyarrow",
                                   zero_copy_batch=True)
            .groupby(["pred", "subj_type", "obj_type"])
            .sum(["f_local", "s_local"])
            .map_batches(lambda b: b.rename_columns(
                ["pred", "subj_type", "obj_type", "n_facts", "n_sources"]),
                batch_format="pyarrow"))


def growth_curve(canonical_ds, *, base_ts: int, window_docs: int = 250):
    """KG growth over crawl time: per tumbling window of the crawl
    (``window_docs`` documents wide in warc_ts order), how many
    distinct triples were seen for the FIRST time in that window —
    the curve that says whether a crawl still discovers new facts.
    Composes temporal_facts (first_ts per triple, urls aggregated
    away map-side) with one tiny window groupby."""
    from .temporal import temporal_facts

    width_us = window_docs * 1_000_000

    facts = temporal_facts(canonical_ds, base_ts=base_ts)

    def window(b: pa.Table) -> pa.Table:
        w = pc.divide(pc.subtract(b["first_ts"], base_ts), width_us)
        t = pa.table({"window_id": w})
        g = t.group_by("window_id").aggregate([([], "count_all")])
        return pa.table({
            "window_id": pc.cast(g["window_id"], pa.int64()).combine_chunks(),
            "n_local": pc.cast(g["count_all"], pa.int64()).combine_chunks(),
        })

    return (facts.map_batches(window, batch_format="pyarrow",
                              zero_copy_batch=True)
            .groupby("window_id").sum("n_local")
            .map_batches(lambda b: b.rename_columns(
                ["window_id", "n_new_facts"]),
                batch_format="pyarrow"))


def fact_conflicts(triples_ds, *, n_buckets: int = N_BUCKETS):
    """Conflict audit for functional predicates: every (subj, pred)
    asserting ≥ 2 distinct objects, with its distinct-object count,
    total support, and the top-2 supports (order: support desc, obj
    asc — the fact_resolution winner's margin over the runner-up).
    Exact integers throughout; the conflict strength is top/second as
    a ratio the consumer computes — no float leaves this operator.

    Scale shape: triples are already one row per distinct fact, so the
    sweep input is fact-table-sized; one bucketed shuffle on
    hash(subj|pred), then a vectorized lexsort + segment reduce per
    bucket (np.add.reduceat for sums, boundary picks for top-2) — no
    per-key dispatch.
    """
    from .unionfind import hash_bucket

    def tag(b: pa.Table) -> pa.Table:
        sp = pc.binary_join_element_wise(b["subj"], b["pred"], "|")
        t = b.append_column("__sp", sp)
        return t.append_column(
            "__bucket", hash_bucket(sp.combine_chunks()
                                    if isinstance(sp, pa.ChunkedArray)
                                    else sp, n_buckets))

    def sweep(group: pa.Table) -> pa.Table:
        empty = pa.table({
            "subj": pa.array([], pa.string()),
            "pred": pa.array([], pa.string()),
            "n_objs": pa.array([], pa.int64()),
            "total_sources": pa.array([], pa.int64()),
            "top_support": pa.array([], pa.int64()),
            "second_support": pa.array([], pa.int64()),
        })
        if group.num_rows == 0:
            return empty
        order = pc.sort_indices(group, sort_keys=[
            ("__sp", "ascending"), ("n_sources", "descending"),
            ("obj", "ascending")])
        s = group.take(order)
        sp = s["__sp"].combine_chunks().to_numpy(zero_copy_only=False)
        ns = s["n_sources"].combine_chunks().to_numpy(zero_copy_only=False)
        n = len(sp)
        first = np.ones(n, dtype=bool)
        first[1:] = sp[1:] != sp[:-1]
        starts = np.flatnonzero(first)
        lengths = np.diff(np.append(starts, n))
        keep = lengths >= 2
        if not keep.any():
            return empty
        st = starts[keep]
        totals = np.add.reduceat(ns, starts)[keep]
        return pa.table({
            "subj": s["subj"].take(pa.array(st)),
            "pred": s["pred"].take(pa.array(st)),
            "n_objs": pa.array(lengths[keep].astype(np.int64)),
            "total_sources": pa.array(totals.astype(np.int64)),
            "top_support": pa.array(ns[st].astype(np.int64)),
            "second_support": pa.array(ns[st + 1].astype(np.int64)),
        })

    return (triples_ds.map_batches(tag, batch_format="pyarrow",
                                   zero_copy_batch=True)
            .groupby("__bucket").map_groups(sweep, batch_format="pyarrow"))


def inverse_predicates(triples_ds, *, n_buckets: int = 64):
    """Schema induction: INVERSE / SYMMETRIC predicate detection — for
    every unordered predicate pair (p, q), how many entity pairs (s, o)
    have BOTH (s, p, o) and (o, q, s) in the canonical table. A high
    ``n_pairs`` relative to the predicates' triple counts flags q as
    p's inverse (``acquired``/``acquired_by``) or p as symmetric
    (``partnered_with``); downstream canonicalization can then fold
    the redundant direction. Self-loops (s == o) are excluded — their
    direction is undefined. Output: (pred_a, pred_b, n_pairs, n_a,
    n_b) with pred_a <= pred_b, n_a/n_b the predicates' non-self
    triple counts.

    Scale shape: triples bucket by hash of the UNORDERED entity pair
    (min(s,o), max(s,o)) — both directions of a pair co-locate, so the
    reversed-pair join is bucket-local: one acero join of the
    forward-direction rows (subj < obj) against the backward rows per
    bucket, then per-bucket (pred_a, pred_b) partial counts and one
    tiny groupby-sum finish (≤ |preds|² rows). Predicate totals ride
    the same narrow reduce. The PREDICATE domain is schema-order
    (dozens, not corpus-order) — the stated contract, as in
    pred_signatures.
    """
    from .unionfind import hash_bucket

    def pair_rows(b: pa.Table) -> pa.Table:
        keep = pc.not_equal(b["subj"], b["obj"])
        t = b.filter(keep)
        s = t["subj"].combine_chunks()
        o = t["obj"].combine_chunks()
        lo = pc.min_element_wise(s, o)
        hi = pc.max_element_wise(s, o)
        key = pc.binary_join_element_wise(lo, hi, "\x1f")
        return pa.table({
            "__bucket": hash_bucket(key, n_buckets),
            "key": key,
            "fwd": pc.equal(s, lo),
            "pred": t["pred"],
        })

    def join_bucket(group: pa.Table) -> pa.Table:
        fwd = group.filter(group["fwd"]).select(["key", "pred"])
        bwd = (group.filter(pc.invert(group["fwd"]))
               .select(["key", "pred"]).rename_columns(["key", "pred_r"]))
        j = fwd.join(bwd, keys=["key"], join_type="inner")
        if j.num_rows == 0:
            return pa.table({
                "pred_a": pa.array([], pa.string()),
                "pred_b": pa.array([], pa.string()),
                "n": pa.array([], pa.int64()),
            })
        pa_col = pc.min_element_wise(j["pred"].combine_chunks(),
                                     j["pred_r"].combine_chunks())
        pb_col = pc.max_element_wise(j["pred"].combine_chunks(),
                                     j["pred_r"].combine_chunks())
        g = (pa.table({"pred_a": pa_col, "pred_b": pb_col})
             .group_by(["pred_a", "pred_b"]).aggregate([([], "count_all")]))
        return pa.table({
            "pred_a": g["pred_a"],
            "pred_b": g["pred_b"],
            "n": pc.cast(g["count_all"], pa.int64()).combine_chunks(),
        })

    pairs = (triples_ds.map_batches(pair_rows, batch_format="pyarrow",
                                    zero_copy_batch=True)
             .groupby("__bucket").map_groups(join_bucket,
                                             batch_format="pyarrow")
             .groupby(["pred_a", "pred_b"]).sum("n"))

    def tot_rows(b: pa.Table) -> pa.Table:
        t = b.filter(pc.not_equal(b["subj"], b["obj"]))
        g = (pa.table({"pred": t["pred"]}).group_by("pred")
             .aggregate([([], "count_all")]))
        return pa.table({
            "pred": g["pred"],
            "c": pc.cast(g["count_all"], pa.int64()).combine_chunks(),
        })

    totals_ds = (triples_ds.map_batches(tot_rows, batch_format="pyarrow",
                                        zero_copy_batch=True)
                 .groupby("pred").sum("c"))
    totals = {r["pred"]: int(r["sum(c)"])
              for r in totals_ds.take_all()}  # schema-order small

    def finish(b: pa.Table) -> pa.Table:
        na = [totals[p] for p in b["pred_a"].to_pylist()]
        nb = [totals[p] for p in b["pred_b"].to_pylist()]
        return pa.table({
            "pred_a": b["pred_a"],
            "pred_b": b["pred_b"],
            "n_pairs": pc.cast(b["sum(n)"], pa.int64()),
            "n_a": pa.array(na, pa.int64()),
            "n_b": pa.array(nb, pa.int64()),
        })

    return pairs.map_batches(finish, batch_format="pyarrow")
