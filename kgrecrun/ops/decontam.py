"""Benchmark decontamination: flag training documents that share any
word n-gram with an evaluation/benchmark set — the standard guard
against train/test overlap in LLM data pipelines (n=8..13 word-grams in
common practice).

Shingle hashes are the same 64-bit md5 word-shingles the dedup family
uses (``kg.minhash.word_shingles``), so the whole operator is
bit-reproducible in SQL via ``md5_number_upper`` — an exact oracle.

Two execution strategies, mirroring ops/joins.py:

* **broadcast** (default; benchmarks are small): the benchmark's
  distinct shingle hashes are collected once (bounded by
  ``broadcast_threshold``) and ``ray.put``; every doc batch counts its
  distinct-shingle overlap map-side with a sorted-array
  ``searchsorted`` membership test. Zero shuffles over the corpus.
* **exploded cogroup** (benchmark too big to broadcast): docs explode
  to (shingle, doc_id) rows, a bucketed semi join keeps the
  contaminated (shingle, doc_id) pairs, a NATIVE ``groupby(doc_id)
  .count()`` (vectorized sort-aggregate, no per-key Python) counts
  overlaps, and a bucketed left-outer join attaches the count to every
  doc. Shuffle carries (8 B hash, id) pairs only — never text.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..kg.minhash import word_shingles


def _bench_hashes(bench_ds, text_col: str, n: int):
    """benchmark texts → per-block-distinct shingle-hash rows (h)."""

    def f(batch: pa.Table) -> pa.Table:
        hs: set[int] = set()
        for t in batch[text_col].to_pylist():
            hs.update(word_shingles(t or "", n))
        arr = np.fromiter(hs, dtype=np.uint64, count=len(hs))
        return pa.table({"h": pa.array(arr.astype(np.int64), pa.int64())})

    return bench_ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def ngram_decontaminate(
    docs_ds,
    bench_ds,
    *,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str = "text",
    broadcast_threshold: int = 5_000_000,
):
    """→ Dataset (id_col, n_contaminated int64, clean int64 0/1):
    ``n_contaminated`` = number of DISTINCT word ``n``-grams of the doc
    that appear anywhere in ``bench_ds``; ``clean`` = 1 iff zero.
    Deterministic; hashes are 64-bit md5 so the false-match probability
    is ~2^-64 per pair (and the SQL oracle hashes identically, so
    engine and oracle agree bit-for-bit either way)."""
    distinct_bench = (
        _bench_hashes(bench_ds, bench_text_col, n).groupby("h").count().materialize()
    )
    n_bench = distinct_bench.count()

    if n_bench <= broadcast_threshold:
        import ray

        hs: list[np.ndarray] = []
        for b in distinct_bench.iter_batches(batch_format="pyarrow"):
            if "h" in b.column_names:
                hs.append(b["h"].to_numpy(zero_copy_only=False))
        bench_sorted = np.sort(np.concatenate(hs)) if hs else np.array([], np.int64)
        ref = ray.put(bench_sorted)

        def count_overlap(batch: pa.Table) -> pa.Table:
            bench = ray.get(ref)
            counts = np.zeros(batch.num_rows, dtype=np.int64)
            for i, t in enumerate(batch[text_col].to_pylist()):
                sh = word_shingles(t or "", n)
                if sh:
                    doc = np.fromiter(sh, dtype=np.uint64, count=len(sh)).astype(
                        np.int64
                    )
                    idx = np.searchsorted(bench, doc)
                    idx[idx >= len(bench)] = 0
                    counts[i] = int(
                        (bench[idx] == doc).sum() if len(bench) else 0
                    )
            return pa.table({
                id_col: batch[id_col],
                "n_contaminated": pa.array(counts, pa.int64()),
                "clean": pa.array((counts == 0).astype(np.int64), pa.int64()),
            })

        return docs_ds.map_batches(
            count_overlap, batch_format="pyarrow", zero_copy_batch=True
        )

    # ---- exploded cogroup path (benchmark exceeds the broadcast bound)
    from .cogroup import bucket_join

    id_type = docs_ds.schema().types[docs_ds.schema().names.index(id_col)]

    def explode(batch: pa.Table) -> pa.Table:
        h_parts, id_parts = [], []
        for i, t in enumerate(batch[text_col].to_pylist()):
            sh = word_shingles(t or "", n)
            if not sh:
                continue
            arr = np.fromiter(sh, dtype=np.uint64, count=len(sh)).astype(np.int64)
            h_parts.append(arr)
            id_parts.extend([batch[id_col][i].as_py()] * len(arr))
        hs = np.concatenate(h_parts) if h_parts else np.array([], np.int64)
        return pa.table({
            "h": pa.array(hs, pa.int64()),
            id_col: pa.array(id_parts, id_type),
        })

    exploded = docs_ds.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True)
    contaminated = bucket_join(
        exploded,
        distinct_bench.map_batches(
            lambda b: b.select(["h"]), batch_format="pyarrow"
        ),
        key="h",
        join_type="left semi",
        left_schema=pa.schema([("h", pa.int64()), (id_col, id_type)]),
        right_schema=pa.schema([("h", pa.int64())]),
        right_distinct=True,
    )
    # native vectorized per-doc count (no per-key Python dispatch)
    counts = contaminated.groupby(id_col).count()

    def fmt_counts(batch: pa.Table) -> pa.Table:
        if batch.num_columns < 2:  # empty aggregate blocks are schemaless
            return pa.schema(
                [(id_col, id_type), ("n_contaminated", pa.int64())]
            ).empty_table()
        b = batch.rename_columns([id_col, "n_contaminated"])
        return b.set_column(
            1, "n_contaminated", pc.cast(b["n_contaminated"], pa.int64())
        )

    ids_only = docs_ds.map_batches(
        lambda b: b.select([id_col]), batch_format="pyarrow"
    )
    joined = bucket_join(
        ids_only,
        counts.map_batches(fmt_counts, batch_format="pyarrow"),
        key=id_col,
        join_type="left outer",
        left_schema=pa.schema([(id_col, id_type)]),
        right_schema=pa.schema([(id_col, id_type), ("n_contaminated", pa.int64())]),
    )

    def finalize(batch: pa.Table) -> pa.Table:
        nc = pc.fill_null(batch["n_contaminated"], 0)
        return pa.table({
            id_col: batch[id_col],
            "n_contaminated": nc,
            "clean": pc.cast(pc.equal(nc, 0), pa.int64()),
        })

    return joined.map_batches(finalize, batch_format="pyarrow", zero_copy_batch=True)
