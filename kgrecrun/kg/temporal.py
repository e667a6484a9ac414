"""Temporal / provenance views over the per-occurrence canonical
triples (the mill's (subj, pred, obj, url) rows, BEFORE the provenance
dimension is aggregated away).

A web-scale KG is not a static fact set: facts carry WHERE they were
asserted (source url) and WHEN (the source document's warc_ts). This
module keeps that dimension queryable:

- :func:`fact_sources` — per (triple, source-url) mention counts, the
  provenance ledger (oracle: the generator-planted provenance golden).
- :func:`temporal_facts` — per triple: total support plus
  first/last-seen warc_ts, derived from the corpus url scheme
  (``art-<doc_id>`` → ``BASE_TS + doc_id·10^6`` µs — the same RE2
  regex and integer arithmetic the SQL oracle runs).
- :func:`facts_asof` — snapshot fact resolution: per (subj, pred) the
  fact in force at a cutoff (latest last-seen among facts first seen
  by then; support and smallest-obj tiebreaks) — the KG sibling of the
  CDC time-travel reads in runtime/sortedstore.

Scale shape: everything is map-side combiners + ONE narrow groupby
(the url/text columns never ride past their stage); facts_asof adds
the argext winner sweep (≤ 1 candidate/key/block crosses the wire).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def fact_sources(canonical_ds):
    """Per (subj, pred, obj, url): mention count — the provenance
    ledger. Map-side combiner inside each block, then one groupby-sum
    (the dedup_triples shape with the url dimension kept)."""
    def local(b: pa.Table) -> pa.Table:
        g = (b.group_by(["subj", "pred", "obj", "url"])
              .aggregate([([], "count_all")]))
        # select by GENERATED aggregate name: key/aggregate column order
        # out of pyarrow group_by is an implementation detail
        return (g.select(["subj", "pred", "obj", "url", "count_all"])
                 .rename_columns(["subj", "pred", "obj", "url", "n_local"]))

    return (canonical_ds.map_batches(local, batch_format="pyarrow",
                                     zero_copy_batch=True)
            .groupby(["subj", "pred", "obj", "url"]).sum("n_local")
            .map_batches(lambda b: b.rename_columns(
                ["subj", "pred", "obj", "url", "n_mentions"]),
                batch_format="pyarrow"))


_URL_ID_RE = r"art-(?P<id>\d+)$"


def _url_ts_us(urls: pa.Array, base_ts: int) -> pa.Array:
    """url → warc_ts epoch-µs via the corpus scheme (art-<id> suffix);
    the SQL oracle runs the same RE2 regex + integer arithmetic."""
    ids = pc.extract_regex(urls, _URL_ID_RE)
    doc_id = pc.cast(pc.struct_field(ids, "id"), pa.int64())
    return pc.add(pc.multiply(doc_id, 1_000_000), base_ts)


def temporal_facts(canonical_ds, *, base_ts: int):
    """Per (subj, pred, obj): n_sources (total mention occurrences —
    the same count kg_triples reports), first_ts and last_ts (epoch-µs
    warc_ts of the earliest/latest source document). Map-side partials
    (count, min, max per block) then one groupby finishing sum/min/min
    — url and text never cross the exchange."""
    def local(b: pa.Table) -> pa.Table:
        t = b.append_column("__ts", _url_ts_us(
            b["url"].combine_chunks(), base_ts))
        g = (t.group_by(["subj", "pred", "obj"])
              .aggregate([("__ts", "count"), ("__ts", "min"),
                          ("__ts", "max")]))
        return (g.select(["subj", "pred", "obj",
                          "__ts_count", "__ts_min", "__ts_max"])
                 .rename_columns(["subj", "pred", "obj",
                                  "n_local", "min_local", "max_local"]))

    agg = (canonical_ds.map_batches(local, batch_format="pyarrow",
                                    zero_copy_batch=True)
           .groupby(["subj", "pred", "obj"])
           .aggregate(*_sum_min_max()))

    def rename(b: pa.Table) -> pa.Table:
        return pa.table({
            "subj": b["subj"], "pred": b["pred"], "obj": b["obj"],
            "n_sources": pc.cast(b["sum(n_local)"], pa.int64()),
            "first_ts": pc.cast(b["min(min_local)"], pa.int64()),
            "last_ts": pc.cast(b["max(max_local)"], pa.int64()),
        })

    return agg.map_batches(rename, batch_format="pyarrow")


def _sum_min_max():
    from ray.data.aggregate import Max, Min, Sum

    return (Sum("n_local"), Min("min_local"), Max("max_local"))


def snapshot_delta(canonical_ds, *, base_ts: int, cutoff_ts: int):
    """KG snapshot diff at a crawl cutoff: per triple, support from
    documents BEFORE the cutoff vs AT/AFTER it, with a status —
    ``new`` (unseen before), ``static`` (no new support), ``growing``
    (supported on both sides) — the what-changed view an incremental
    ingest publishes alongside the merged table.

    Map-side conditional partial sums per block (the ts comparison is
    one vectorized mask), one narrow groupby-sum, status computed
    after the reduce. Urls never cross the exchange."""
    def local(b: pa.Table) -> pa.Table:
        ts = _url_ts_us(b["url"].combine_chunks(), base_ts)
        before = pc.cast(pc.less(ts, cutoff_ts), pa.int64())
        t = pa.table({"subj": b["subj"], "pred": b["pred"], "obj": b["obj"],
                      "b": before, "a": pc.subtract(1, before)})
        g = (t.group_by(["subj", "pred", "obj"])
              .aggregate([("b", "sum"), ("a", "sum")]))
        return (g.select(["subj", "pred", "obj", "b_sum", "a_sum"])
                 .rename_columns(["subj", "pred", "obj",
                                  "b_local", "a_local"]))

    agg = (canonical_ds.map_batches(local, batch_format="pyarrow",
                                    zero_copy_batch=True)
           .groupby(["subj", "pred", "obj"]).sum(["b_local", "a_local"]))

    def finish(b: pa.Table) -> pa.Table:
        nb = pc.cast(b["sum(b_local)"], pa.int64())
        na = pc.cast(b["sum(a_local)"], pa.int64())
        status = pc.if_else(
            pc.equal(nb, 0), pa.scalar("new"),
            pc.if_else(pc.equal(na, 0), pa.scalar("static"),
                       pa.scalar("growing")))
        return pa.table({"subj": b["subj"], "pred": b["pred"],
                         "obj": b["obj"], "n_before": nb, "n_after": na,
                         "status": status})

    return agg.map_batches(finish, batch_format="pyarrow")


def facts_asof(canonical_ds, *, base_ts: int, cutoff_ts: int):
    """Snapshot fact resolution: per (subj, pred), among facts FIRST
    SEEN by ``cutoff_ts``, the one with the latest last_ts (support
    count, then smallest obj, break ties) — "what did the KG believe
    at time T". Composes temporal_facts with the argext winner sweep.
    """
    from ..ops.argext import group_arg_extreme

    facts = temporal_facts(canonical_ds, base_ts=base_ts)

    def eligible(b: pa.Table) -> pa.Table:
        m = b.filter(pc.less_equal(b["first_ts"], cutoff_ts))
        return m.append_column("__sp", pc.binary_join_element_wise(
            m["subj"], m["pred"], "|"))

    keyed = facts.map_batches(eligible, batch_format="pyarrow",
                              zero_copy_batch=True)
    won = group_arg_extreme(
        keyed, key="__sp",
        order_cols=[("last_ts", "descending"), ("n_sources", "descending"),
                    ("obj", "ascending")])
    return won.map_batches(lambda b: b.drop_columns(["__sp"]),
                           batch_format="pyarrow", zero_copy_batch=True)
