"""Checkpointed, resumable execution of the flagship KG pipeline.

Layout decision (SURVEY.md §7.6): the corpus is processed in input
partitions (groups of input Parquet files). All *map-side* work —
extraction, NER, OpenIE, linking, canonical-id application — is
checkpointed per partition: each partition writes its canonical linked
triples (and mention counts) under ``out_dir/<output>/part-<pid>/`` and
then publishes a manifest. The *global* aggregation (exact triple
dedup + n_sources) re-runs on resume but reads only the compact
per-partition intermediates, never the raw pages — so a killed run
resumes by re-doing at most one partition of heavy work plus a cheap
reduce.

Each partition's pipeline is a streaming Ray Data job (read →
map_batches chain → write_parquet); partitions bound the re-work unit,
streaming inside a partition keeps the executor pipelined. On a real
cluster partition size is chosen so one partition ≈ tens of input
files (≈100 GB), far above per-task granularity.
"""

from __future__ import annotations

import os
import time

import pyarrow as pa

from ..extract.stage import extract_articles
from ..kg import canon
from ..kg.ner import detect_mentions
from ..kg.resources import KGResources, broadcast
from . import manifest as mf
from .pipeline import _mill_batch, english_texts


def _partition(files: list[str], files_per_partition: int) -> list[tuple[str, list[str]]]:
    files = sorted(files)
    return [
        (f"{i // files_per_partition:05d}", files[i:i + files_per_partition])
        for i in range(0, len(files), files_per_partition)
    ]


def run_checkpointed(
    input_files: list[str],
    entities_table: pa.Table,
    out_dir: str,
    *,
    files_per_partition: int = 4,
    concurrency=(1, 8),
    config: dict | None = None,
    input_format: str = "parquet",
) -> dict:
    """Run (or resume) the flagship pipeline over the given page files.

    ``input_format="warc"`` reads WARC.gz crawl shards directly
    (sources/warc.py streaming datasource) instead of parquet — the
    partition/checkpoint semantics are identical because both are
    file-granular: a partition is a file group, its manifest
    fingerprints the same bytes either way.

    Returns summary: partitions run/skipped and the final deduplicated
    triples output path.
    """
    import ray.data

    config = dict(config or {})
    config.setdefault("pipeline", "kg_v1")
    config.setdefault("input_format", input_format)
    cfg_hash = mf.config_hash(config)

    resources = KGResources.from_entity_table(entities_table)
    res_ref = broadcast(resources)

    # global canonical map: entity table is a global resource, its
    # clustering is independent of the page corpus (in-process below the
    # catalog-size threshold, Dataset path above — see canon)
    ent_cols = entities_table.select(["entity_id", "canonical"])
    if ent_cols.num_rows < 100_000:
        mapping = canon.canonicalize_table(ent_cols)
    else:
        mapping = canon.canonicalize(ray.data.from_arrow(ent_cols))
    mapping_ref = broadcast(mapping)

    partitions = _partition(input_files, files_per_partition)
    ran, skipped = [], []
    for pid, files in partitions:
        if mf.is_complete(out_dir, pid, files, cfg_hash):
            skipped.append(pid)
            continue
        t0 = time.time()
        if input_format == "warc":
            from kgrecrun.sources.warc import read_warc

            pages = read_warc(files, verify_digests=True)
        else:
            pages = ray.data.read_parquet(files)
        articles = extract_articles(pages, emit_html=False)
        texts = english_texts(articles)
        canonical = texts.map_batches(
            _mill_batch,
            fn_kwargs={"resources": res_ref, "mapping": mapping_ref},
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=256,
        )
        mentions = detect_mentions(texts, res_ref, concurrency=concurrency)

        triples_dir = os.path.join(out_dir, "triples_linked", f"part-{pid}")
        mentions_dir = os.path.join(out_dir, "mentions", f"part-{pid}")
        # a partition without a manifest may hold partial output from an
        # interrupted run — clear it before rewriting (write-then-publish)
        import shutil

        for d in (triples_dir, mentions_dir):
            if os.path.isdir(d):
                shutil.rmtree(d)
        canonical.write_parquet(triples_dir)
        mentions.write_parquet(mentions_dir)

        import pyarrow.dataset as pads

        n_pages = pages.count()
        n_triples = pads.dataset(triples_dir).count_rows()
        n_mentions = pads.dataset(mentions_dir).count_rows()
        wall = time.time() - t0
        mf.write_manifest(
            out_dir,
            mf.PartitionManifest(
                partition_id=pid,
                input_files=files,
                input_fingerprint=mf.fingerprint_files(files),
                config_hash=cfg_hash,
                row_counts={"pages": n_pages, "triples_linked": n_triples, "mentions": n_mentions},
                metrics={"wall_s": wall, "pages_per_s": n_pages / wall if wall > 0 else 0.0},
                lineage=[f"pages:{os.path.basename(f)}" for f in files],
            ),
        )
        ran.append(pid)

    # global reduce over compact per-partition intermediates; the final
    # table is derived output. The reduce itself is checkpointed by a
    # manifest fingerprinting the contributing partition set — a re-run
    # after a completed reduce skips it entirely; a crash mid-reduce
    # (or any partition change) re-runs it once.
    import hashlib
    import json as _json
    import shutil

    all_manifests = mf.load_manifests(out_dir)
    reduce_fp = hashlib.sha1(
        _json.dumps(
            sorted((pid, m.input_fingerprint) for pid, m in all_manifests.items())
        ).encode()
    ).hexdigest()
    reduce_marker = os.path.join(out_dir, "_manifests", "_final_reduce.json")
    final_dir_pre = os.path.join(out_dir, "triples")
    if os.path.isfile(reduce_marker) and os.path.isdir(final_dir_pre):
        try:
            prev = _json.load(open(reduce_marker))
        except Exception:
            prev = {}
        if prev.get("fingerprint") == reduce_fp and prev.get("config_hash") == cfg_hash:
            return {
                "partitions_run": ran,
                "partitions_skipped": skipped,
                "triples_dir": final_dir_pre,
                "config_hash": cfg_hash,
                "final_reduce": "skipped",
            }

    triples_root = os.path.join(out_dir, "triples_linked")
    all_triples = ray.data.read_parquet(triples_root)
    final = canon.dedup_triples(all_triples)

    # adjacency layout (SURVEY.md §7.3): bucket by hash(subj) so all of
    # an entity's edges co-locate in one partition directory — a reader
    # doing per-entity traversal opens one bucket, not the whole table
    n_buckets = 16

    def add_bucket(batch: pa.Table) -> pa.Table:
        import zlib

        buckets = [
            zlib.crc32(s.encode("utf-8")) % n_buckets for s in batch["subj"].to_pylist()
        ]
        return batch.append_column("subj_bucket", pa.array(buckets, pa.int32()))

    final_dir = os.path.join(out_dir, "triples")
    if os.path.isdir(final_dir):
        shutil.rmtree(final_dir)
    final.map_batches(add_bucket, batch_format="pyarrow").write_parquet(
        final_dir, partition_cols=["subj_bucket"]
    )

    # the entity catalog + canonical map are part of the graph product
    import pyarrow.parquet as pq

    ent_out = entities_table.append_column(
        "canonical_root",
        pa.array([mapping.get(e, e) for e in entities_table["entity_id"].to_pylist()],
                 pa.string()),
    )
    pq.write_table(ent_out, os.path.join(out_dir, "entities.parquet"))

    # publish the reduce marker last (write-then-rename) — output durable first
    os.makedirs(os.path.dirname(reduce_marker), exist_ok=True)
    tmp = reduce_marker + ".tmp"
    with open(tmp, "w") as f:
        _json.dump({"fingerprint": reduce_fp, "config_hash": cfg_hash}, f)
    os.replace(tmp, reduce_marker)

    return {
        "partitions_run": ran,
        "partitions_skipped": skipped,
        "triples_dir": final_dir,
        "config_hash": cfg_hash,
        "final_reduce": "ran",
    }
