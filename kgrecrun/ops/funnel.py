"""Training-data prep funnel: quality gate → exact dedup → corpus
stats, composed as one streaming pipeline. The gate conditions are
integer-only (``punct*10 <= chars`` instead of a float ratio) so the
whole funnel is bit-exactly SQL-checkable.

documents → (gate: chars ≥ min_chars, tokens ≥ min_tokens,
punct×10 ≤ chars) → content-hash groupby keeping each cluster's min-id
row → global (n_docs, total_tokens).
"""

from __future__ import annotations

import hashlib

import pyarrow as pa
import pyarrow.compute as pc

from .dedup import normalize_text
from .text import _ws_token_counts


def training_mix(sf_dir: str, *, min_chars: int = 100, min_tokens: int = 20):
    import ray.data

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def gate(batch: pa.Table) -> pa.Table:
        texts = batch["text"]
        n_chars = pc.cast(pc.utf8_length(texts), pa.int64())
        n_tokens = _ws_token_counts(texts)
        n_punct = pc.cast(
            pc.utf8_length(pc.replace_substring_regex(texts, r"[^.,;:!?]", "")), pa.int64()
        )
        keep = pc.and_(
            pc.and_(
                pc.greater_equal(n_chars, min_chars),
                pc.greater_equal(n_tokens, min_tokens),
            ),
            pc.less_equal(pc.multiply(n_punct, 10), n_chars),
        )
        t = pa.table(
            {"doc_id": batch["doc_id"], "text": texts, "n_tokens": n_tokens}
        )
        return t.filter(keep)

    gated = ds.map_batches(gate, batch_format="pyarrow", zero_copy_batch=True)

    from ..kg.unionfind import hash_bucket

    def to_hashes(batch: pa.Table) -> pa.Table:
        hs = pa.array(
            [
                hashlib.md5(normalize_text(t).encode("utf-8")).hexdigest()
                for t in batch["text"].to_pylist()
            ],
            pa.string(),
        )
        return pa.table(
            {
                "__bucket": hash_bucket(hs, 256),
                "h": hs,
                "doc_id": batch["doc_id"],
                "n_tokens": batch["n_tokens"],
            }
        )

    hashed = gated.map_batches(to_hashes, batch_format="pyarrow", zero_copy_batch=True)

    def keep_roots(group: pa.Table) -> pa.Table:
        # hash-BUCKET cogroup (one Python call per bucket, not per
        # distinct document): sort by (h, doc_id), keep each h-segment's
        # first row — the group's min doc_id
        import numpy as np

        order = pc.sort_indices(
            group, sort_keys=[("h", "ascending"), ("doc_id", "ascending")]
        )
        g = group.take(order)
        h = g["h"].combine_chunks()
        n = g.num_rows
        neq = pc.not_equal(h.slice(1), h.slice(0, n - 1)).to_numpy(
            zero_copy_only=False
        )
        new_seg = np.concatenate(([True], neq.astype(bool)))
        return g.filter(pa.array(new_seg)).select(["doc_id", "n_tokens"])

    roots = hashed.groupby("__bucket").map_groups(keep_roots, batch_format="pyarrow")

    def partial(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "n_docs": pa.array([batch.num_rows], pa.int64()),
                "total_tokens": pa.array(
                    [pc.sum(batch["n_tokens"]).as_py() or 0], pa.int64()
                ),
            }
        )

    partials = roots.map_batches(partial, batch_format="pyarrow").to_arrow_refs()
    import ray

    tables = [t for t in (ray.get(r) for r in partials) if "n_docs" in t.column_names]
    if not tables:  # everything gated out → empty schemaless blocks
        return pa.table(
            {"n_docs": pa.array([0], pa.int64()), "total_tokens": pa.array([0], pa.int64())}
        )
    merged = pa.concat_tables(tables)
    return pa.table(
        {
            "n_docs": pa.array([pc.sum(merged["n_docs"]).as_py() or 0], pa.int64()),
            "total_tokens": pa.array(
                [pc.sum(merged["total_tokens"]).as_py() or 0], pa.int64()
            ),
        }
    )


def event_funnel(sf_dir: str, steps=("view", "click", "purchase"), *,
                 events_ds=None, n_buckets: int = 256):
    """Ordered multi-step conversion funnel: for each user, step k
    counts only if it happens STRICTLY AFTER the user's step k−1
    (first-occurrence semantics, integer-µs comparisons — no float
    time). Output: (depth int64 1..len(steps), n_users) — cumulative
    funnel counts (a depth-2 user is also in depth 1).

    Scale shape: events project to (user, type, ts) and hash into user
    buckets — ONE shuffle; inside a bucket each step is a masked
    vectorized per-user min (np.minimum.at over the bucket's user
    index), len(steps) sweeps, no per-user Python; per-bucket partial
    counts reduce in a len(steps)-row groupby.
    """
    import numpy as np
    import ray.data

    from ..kg.unionfind import hash_bucket

    ds = events_ds if events_ds is not None else ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_type", "ts"]
    )
    steps = list(steps)

    def project(batch: pa.Table) -> pa.Table:
        t = pa.table({
            "user_id": batch["user_id"],
            "event_type": batch["event_type"],
            "t": pc.cast(batch["ts"], pa.int64()),
        })
        t = t.filter(pc.is_in(t["event_type"].combine_chunks(),
                              value_set=pa.array(steps)))
        return t.append_column(
            "__bucket", hash_bucket(t["user_id"].combine_chunks(),
                                    n_buckets))

    def funnel_bucket(group: pa.Table) -> pa.Table:
        uid = group["user_id"].combine_chunks().to_numpy(
            zero_copy_only=False)
        et = group["event_type"].combine_chunks()
        ts = group["t"].combine_chunks().to_numpy(zero_copy_only=False)
        _, inv = np.unique(uid, return_inverse=True)
        n_users = inv.max() + 1 if len(inv) else 0
        prev = np.zeros(n_users, dtype=np.int64)  # ts of previous step
        counts = []
        for s in steps:
            mask = pc.equal(et, s).to_numpy(zero_copy_only=False)
            ok = mask & (ts > prev[inv])
            cur = np.full(n_users, np.iinfo(np.int64).max, dtype=np.int64)
            np.minimum.at(cur, inv[ok], ts[ok])
            reached = cur < np.iinfo(np.int64).max
            counts.append(int(reached.sum()))
            prev = cur  # unreached users stay at int64 max -> ts > prev false
        return pa.table({
            "depth": pa.array(np.arange(1, len(steps) + 1), pa.int64()),
            "n_p": pa.array(counts, pa.int64()),
        })

    return (
        ds.map_batches(project, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__bucket").map_groups(funnel_bucket, batch_format="pyarrow")
        .groupby("depth").sum("n_p")
        .map_batches(lambda b: b.rename_columns(["depth", "n_users"]),
                     batch_format="pyarrow")
    )
