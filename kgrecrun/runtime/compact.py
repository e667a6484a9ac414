"""Small-file compaction for partitioned Parquet output — the
maintenance op a long-running ingestion pipeline runs between rounds:
many per-task files (checkpointed partitions, crawl rounds, dedup
shards) fold into few right-sized ones so downstream reads stop paying
per-file open/footer costs.

Safety: the rewrite goes to a SIBLING temp directory first and swaps in
atomically (rename) only after the new files are fully written and the
row count re-verified — a killed compaction leaves the original data
untouched. Content equality is the caller-visible contract (row order
within the directory is NOT preserved — parquet directories are
unordered sets of row groups to every reader in this repo).
"""

from __future__ import annotations

import os
import shutil

TARGET_BYTES = 128 * 1024 * 1024  # the classic HDFS/lakehouse default


def compact_parquet_dir(path: str, *, target_bytes: int = TARGET_BYTES,
                        min_files: int = 2) -> dict:
    """Compact every ``*.parquet`` under ``path`` (one directory level)
    into ``ceil(total_bytes / target_bytes)`` files. No-op (returns a
    report with ``compacted=False``) when the directory already has
    fewer than ``min_files`` files or one target's worth of bytes.
    Returns {compacted, files_before, files_after, rows}.
    """
    import ray.data

    files = sorted(
        os.path.join(path, f) for f in os.listdir(path)
        if f.endswith(".parquet"))
    total = sum(os.path.getsize(f) for f in files)
    if len(files) < min_files or total <= target_bytes:
        return {"compacted": False, "files_before": len(files),
                "files_after": len(files), "rows": None}

    n_out = max(1, -(-total // target_bytes))
    ds = ray.data.read_parquet(files)
    rows = ds.count()
    tmp = path.rstrip("/") + ".compact-tmp"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    ds.repartition(n_out).write_parquet(tmp)
    check = ray.data.read_parquet(tmp).count()
    if check != rows:
        shutil.rmtree(tmp)
        raise RuntimeError(
            f"compaction row-count mismatch ({check} != {rows}); "
            f"original directory left untouched")
    old = path.rstrip("/") + ".compact-old"
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)
    n_after = len([f for f in os.listdir(path) if f.endswith(".parquet")])
    return {"compacted": True, "files_before": len(files),
            "files_after": n_after, "rows": rows}
