"""Flagship pipeline assembly: pages → articles → triples → canonical
knowledge graph. Pure Dataset composition — lazy/streaming end-to-end;
the only driver-side materializations are the verified similarity edge
list (≪ corpus) and the broadcast resources.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ..extract.stage import extract_articles
from ..kg import canon
from ..kg.link import EntityLinker, link_triples
from ..kg.ner import detect_mentions
from ..kg.openie import TripleExtractor, extract_triples
from ..kg.resources import KGResources, broadcast, resolve


def english_texts(articles_ds):
    """articles → (url, text): successful English extractions only,
    wide columns projected away before any shuffle."""

    def f(batch: pa.Table) -> pa.Table:
        mask = pc.and_(
            pc.is_null(batch["error"]),
            pc.and_(
                pc.equal(batch["lang"], pa.scalar("en")),
                pc.greater(pc.utf8_length(batch["text"]), 0),
            ),
        )
        kept = batch.filter(mask)
        return kept.select(["url", "text"])

    return articles_ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


class TripleMill:
    """Fused per-document stage: OpenIE pattern extraction → entity
    linking → canonical-id substitution in ONE stage. Chaining three
    separate actor pools costs two extra pool spin-ups and two block
    handoffs per batch while the real per-doc work is tiny; fusing
    keeps the streaming executor's resources on the extract tasks and
    emits shuffle-ready (subj, pred, obj, url) directly."""

    def __init__(self, resources, mapping):
        self.extractor = TripleExtractor(resources)
        self.linker = EntityLinker(resolve(resources))
        self.mapping = resolve(mapping)

    def __call__(self, batch: pa.Table) -> pa.Table:
        subjs, preds, objs, urls = [], [], [], []
        m = self.mapping
        for url, text in zip(batch["url"].to_pylist(), batch["text"].to_pylist()):
            if not text:
                continue
            for _, s_surface, pred, o_surface, _conf in self.extractor.extract_from_text(url, text):
                sid, _ = self.linker.link(s_surface.lower())
                oid, _ = self.linker.link(o_surface.lower())
                if sid is None or oid is None:
                    continue
                subjs.append(m.get(sid, sid))
                preds.append(pred)
                objs.append(m.get(oid, oid))
                urls.append(url)
        return pa.table(
            {
                "subj": pa.array(subjs, pa.string()),
                "pred": pa.array(preds, pa.string()),
                "obj": pa.array(objs, pa.string()),
                "url": pa.array(urls, pa.string()),
            }
        )


# per-worker-process cache for the fused stage's state: running the mill
# as plain TASKS (not an actor pool) lets the streaming executor fuse it
# with generation/extraction and start at full width instantly — an
# autoscaling actor pool ramps over many seconds and reserves CPUs the
# upstream tasks need. Worker processes persist across tasks, so the
# state (pattern bank, linker, canonical map) is still built once per
# worker, which is the property actor pools exist to provide.
_MILL_CACHE: dict = {}


def _mill_batch(batch: pa.Table, resources, mapping) -> pa.Table:
    key = (str(resources), str(mapping))
    mill = _MILL_CACHE.get(key)
    if mill is None:
        _MILL_CACHE.clear()  # at most one live bundle per worker
        mill = TripleMill(resources, mapping)
        _MILL_CACHE[key] = mill
    return mill(batch)


def kg_pipeline(pages_ds, entities_table: pa.Table, *, concurrency=None):
    """Returns a dict of named Datasets (all lazy until consumed):

    articles  — extraction output (url, title, text, …)
    mentions  — NER gazetteer mentions
    linked    — per-occurrence linked triples
    triples   — deduplicated canonical (subj, pred, obj, n_sources)
    plus 'canonical_map' (entity_id → cluster root, driver dict).
    """
    import ray
    import ray.data

    if concurrency is None:
        # size actor pools to the cluster: warm floor of ncpu/2 so short
        # runs don't serialize on autoscaling ramp-up, ceiling of ncpu so
        # the same code saturates an 8-CPU node and a 256-node cluster
        ncpu = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
        concurrency = (max(1, ncpu // 2), max(4, ncpu))

    resources = KGResources.from_entity_table(entities_table)
    res_ref = broadcast(resources)

    articles = extract_articles(pages_ds, emit_html=False)
    texts = english_texts(articles)

    mentions = detect_mentions(texts, res_ref, concurrency=concurrency)
    triples_raw = extract_triples(texts, res_ref, concurrency=concurrency)
    linked = link_triples(triples_raw, res_ref, concurrency=concurrency)

    ent_cols = entities_table.select(["entity_id", "canonical"])
    if ent_cols.num_rows < 100_000:
        mapping = canon.canonicalize_table(ent_cols)
    else:
        mapping = canon.canonicalize(ray.data.from_arrow(ent_cols))
    mapping_ref = broadcast(mapping)

    canonical = texts.map_batches(
        _mill_batch,
        fn_kwargs={"resources": res_ref, "mapping": mapping_ref},
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=256,
    )
    triples = canon.dedup_triples(canonical)

    return {
        "articles": articles,
        "texts": texts,
        "mentions": mentions,
        "triples_raw": triples_raw,
        "linked": linked,
        "canonical": canonical,
        "triples": triples,
        "canonical_map": mapping,
    }
