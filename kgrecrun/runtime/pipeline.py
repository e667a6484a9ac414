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
from ..kg.link import link_triples
from ..kg.ner import detect_mentions
from ..kg.openie import extract_triples
from ..kg.resources import KGResources, broadcast


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


def kg_pipeline(pages_ds, entities_table: pa.Table, *, concurrency=(1, 8)):
    """Returns a dict of named Datasets (all lazy until consumed):

    articles  — extraction output (url, title, text, …)
    mentions  — NER gazetteer mentions
    linked    — per-occurrence linked triples
    triples   — deduplicated canonical (subj, pred, obj, n_sources)
    plus 'canonical_map' (entity_id → cluster root, driver dict).
    """
    import ray.data

    resources = KGResources.from_entity_table(entities_table)
    res_ref = broadcast(resources)

    articles = extract_articles(pages_ds, emit_html=False)
    texts = english_texts(articles)

    mentions = detect_mentions(texts, res_ref, concurrency=concurrency)
    triples_raw = extract_triples(texts, res_ref, concurrency=concurrency)
    linked = link_triples(triples_raw, res_ref, concurrency=concurrency)

    entities_ds = ray.data.from_arrow(entities_table.select(["entity_id", "canonical"]))
    mapping = canon.canonicalize(entities_ds)
    mapping_ref = broadcast(mapping)

    canonical = canon.canonical_triples(linked, mapping_ref)
    triples = canon.dedup_triples(canonical)

    return {
        "articles": articles,
        "texts": texts,
        "mentions": mentions,
        "triples_raw": triples_raw,
        "linked": linked,
        "triples": triples,
        "canonical_map": mapping,
    }
