"""Dispatch-cardinality + exchange-volume stress for the round-3
bucket-vectorization work (VERDICT r2 items 1, 2, 5).

Measures, on synthetic data with >=10^6 DISTINCT keys:

1. exact_dedup dispatch win — the shipped bucketed segment sweep vs the
   r2 per-key ``groupby(h).map_groups`` shape (reconstructed inline) on
   the same corpus. Group-call count: n_buckets vs n_distinct_docs.
2. semi-join dispatch win — bucketed acero left-semi vs the r2 per-key
   existence cogroup, 2M probe rows against 10^6 distinct right keys.
3. minhash band-exchange bytes — the r2 layout (full 512 B signature on
   every band row, 16×) vs the shipped two-phase layout (16 B band rows
   + signatures attached to collision candidates only), measured with
   ``Dataset.size_bytes()`` on materialized shuffle inputs.
4. oversized_band_count — the windowed-verify truncation counter on the
   stress corpus (VERDICT r2 item 5).

Usage: python tools/dedup_stress.py [n_docs] [num_cpus]
Defaults: 1,200,000 docs (>=10^6 distinct), 32 cpus. Prints one JSON.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

sys.path.insert(0, "/root/repo")


def synth_docs(n_docs: int, dup_every: int = 10, num_blocks: int = 128):
    """Short distinct texts; every ``dup_every``-th doc duplicates its
    predecessor → ~n_docs*(1-1/dup_every) distinct hashes."""
    import ray.data

    per = n_docs // num_blocks

    def gen(batch: pa.Table) -> pa.Table:
        out = []
        for b in batch["id"].to_pylist():
            base = np.arange(per, dtype=np.int64) + b * per
            src = np.where(base % dup_every == 0, np.maximum(base - 1, 0), base)
            texts = [f"document body number {i} with shared filler words" for i in src]
            out.append(pa.table({
                "doc_id": pa.array(base, pa.int64()),
                "text": pa.array(texts, pa.string()),
            }))
        return pa.concat_tables(out)

    return ray.data.range(num_blocks, override_num_blocks=num_blocks).map_batches(
        gen, batch_format="pyarrow"
    )


def old_exact_dedup(docs_ds):
    """The r2 shape: one Python map_groups call per DISTINCT document."""
    import hashlib

    from kgrecrun.ops.dedup import normalize_text

    def to_hashes(batch: pa.Table) -> pa.Table:
        hs = [hashlib.md5(normalize_text(t).encode()).hexdigest()
              for t in batch["text"].to_pylist()]
        return pa.table({"h": pa.array(hs, pa.string()), "doc_id": batch["doc_id"]})

    hashed = docs_ds.map_batches(to_hashes, batch_format="pyarrow")

    def label_group(group: pa.Table) -> pa.Table:
        root = pc.min(group["doc_id"])
        return pa.table({
            "doc_id": group["doc_id"],
            "root_id": pa.array([root.as_py()] * group.num_rows, pa.int64()),
        })

    return hashed.groupby("h").map_groups(label_group, batch_format="pyarrow")


def old_semi_join(left_ds, right_ds, key: str):
    """The r2 existence cogroup: one Python call per distinct key."""
    names = ["user_id", "payload"]

    def tag_left(b):
        return b.append_column("__side", pa.nulls(b.num_rows, pa.int8()).fill_null(0))

    def tag_right(b):
        t = pa.table({key: b[key], "payload": pa.nulls(b.num_rows, pa.int64())})
        return t.append_column("__side", pa.nulls(t.num_rows, pa.int8()).fill_null(1))

    tagged = left_ds.map_batches(tag_left, batch_format="pyarrow").union(
        right_ds.select_columns([key]).map_batches(tag_right, batch_format="pyarrow")
    )

    def emit(group: pa.Table) -> pa.Table:
        if not pc.any(pc.equal(group["__side"], 1)).as_py():
            return pa.schema([(key, pa.int64()), ("payload", pa.int64())]).empty_table()
        return group.filter(pc.equal(group["__side"], 0)).select(names)

    return tagged.groupby(key).map_groups(emit, batch_format="pyarrow")


def main(n_docs: int, num_cpus: int) -> None:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
                 log_to_driver=False)
    import ray.data

    from kgrecrun.ops import dedup
    from kgrecrun.ops.joins import semi_join

    res: dict = {"n_docs": n_docs, "num_cpus": num_cpus}

    # -- 1. exact_dedup: bucketed sweep vs per-key dispatch -------------
    docs = synth_docs(n_docs).materialize()
    n_actual = docs.count()  # block rounding
    res["n_docs"] = n_actual
    t0 = time.time()
    n_new = dedup.exact_dedup(docs).count()
    res["exact_dedup_bucketed_sec"] = round(time.time() - t0, 1)
    t0 = time.time()
    n_old = old_exact_dedup(docs).count()
    res["exact_dedup_perkey_sec"] = round(time.time() - t0, 1)
    assert n_new == n_old == n_actual, (n_new, n_old)
    res["exact_dedup_speedup"] = round(
        res["exact_dedup_perkey_sec"] / res["exact_dedup_bucketed_sec"], 2
    )

    # -- 2. semi join: 2M probes vs 1e6 distinct right keys -------------
    n_left, n_right = 2 * n_docs, n_docs

    def gen_left(b):
        ids = b["id"].combine_chunks().to_numpy(zero_copy_only=False)
        return pa.table({
            "user_id": pa.array(ids % n_right, pa.int64()),
            "payload": pa.array(ids, pa.int64()),
        })

    left = ray.data.range(n_left, override_num_blocks=128).map_batches(
        gen_left, batch_format="pyarrow").materialize()
    right = ray.data.range(n_right, override_num_blocks=64).map_batches(
        lambda b: pa.table({"user_id": pc.multiply(b["id"], 2)}),
        batch_format="pyarrow").materialize()  # half the keys exist
    t0 = time.time()
    n_new = semi_join(left, right, "user_id").count()
    res["semi_join_bucketed_sec"] = round(time.time() - t0, 1)
    t0 = time.time()
    n_old = old_semi_join(left, right, "user_id").count()
    res["semi_join_perkey_sec"] = round(time.time() - t0, 1)
    assert n_new == n_old, (n_new, n_old)
    res["semi_join_rows"] = n_new
    res["semi_join_speedup"] = round(
        res["semi_join_perkey_sec"] / res["semi_join_bucketed_sec"], 2
    )

    # -- 3. minhash band-exchange bytes (smaller corpus: sig compute) ---
    n_mh = min(n_docs // 10, 120_000)
    mh_docs = synth_docs(n_mh, num_blocks=64).map_batches(
        lambda b: pa.table({
            "doc_id": b["doc_id"],
            "text": pc.binary_join_element_wise(
                b["text"], b["text"], b["text"], b["text"], " padding words "
            ),
        }),
        batch_format="pyarrow",
    ).materialize()
    sigs = mh_docs.map_batches(
        dedup._ComputeSigs(64, 5, "text", "doc_id"),
        batch_format="pyarrow", batch_size=256,
    ).materialize()
    new_banded = sigs.map_batches(
        dedup._band_rows_from_sigs(64, 16), batch_format="pyarrow"
    ).materialize()

    def old_band_rows(batch: pa.Table) -> pa.Table:
        from kgrecrun.kg.minhash import MinHasher

        hasher = MinHasher(64)
        keys, ids, payload = [], [], []
        for i, s in enumerate(batch["sig"].to_pylist()):
            sig = np.frombuffer(s, dtype=np.uint64)
            for bk in hasher.band_keys(sig, 16):
                keys.append(bk)
                ids.append(batch["doc_id"][i].as_py())
                payload.append(s)
        return pa.table({
            "band_key": pa.array(keys, pa.int64()),
            "doc_id": pa.array(ids, pa.int64()),
            "sig": pa.array(payload, pa.binary()),
        })

    old_banded = sigs.map_batches(old_band_rows, batch_format="pyarrow").materialize()
    cands = dedup._sweep_edges(new_banded, window=32, id_type=pa.int64()).materialize()
    old_bytes = old_banded.size_bytes()
    # new exchange: slim band rows + candidates + signatures shipped 2×
    new_bytes = new_banded.size_bytes() + cands.size_bytes() + 2 * sigs.size_bytes()
    res["minhash_docs"] = n_mh
    res["band_exchange_old_mb"] = round(old_bytes / 1e6, 1)
    res["band_exchange_new_mb"] = round(new_bytes / 1e6, 1)
    res["band_exchange_reduction"] = round(old_bytes / new_bytes, 2)

    # -- 4. truncation counter ------------------------------------------
    res["oversized_bands_w32"] = dedup.oversized_band_count(new_banded, window=32)

    print(json.dumps(res))


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_200_000
    c = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    main(n, c)
