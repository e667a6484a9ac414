"""Deterministic sampling and split assignment for training-data prep.

At 100 TB you cannot sample with an RNG: retries, resumes, and
re-partitioning must all see the same decision per document. Both ops
key off ``md5(str(id))`` (first 8 bytes, little-endian uint64 — DuckDB
``md5_number_upper``), so every worker, every run, and the SQL oracle
agree exactly:

* :func:`hash_sample` — keep rows where ``h % denom < numer`` (an
  exact ``numer/denom`` fraction in expectation, stable under
  re-sharding). Embarrassingly parallel, no shuffle.
* :func:`hash_split` — assign every row to named splits (train/val/
  test) by hash range; complete and non-overlapping by construction.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa


def _hash64(ids) -> np.ndarray:
    """md5(str(id))[:8] little-endian per id — matches DuckDB
    ``md5_number_upper(CAST(id AS VARCHAR))``."""
    return np.fromiter(
        (
            int.from_bytes(hashlib.md5(str(i).encode()).digest()[:8], "little")
            for i in ids
        ),
        dtype=np.uint64,
    )


def hash_sample(ds, *, numer: int = 1, denom: int = 10, id_col: str = "doc_id"):
    """Keep rows whose ``md5 hash % denom < numer`` — a deterministic
    ~numer/denom sample, stable across runs and re-sharding."""

    def f(batch: pa.Table) -> pa.Table:
        h = _hash64(batch[id_col].to_pylist())
        return batch.filter(pa.array(h % denom < numer))

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def hash_split(ds, *, splits: dict[str, int] | None = None, id_col: str = "doc_id"):
    """Append a ``split`` column assigning each row to a named split by
    hash range. ``splits`` maps name → weight (parts of the total);
    ranges are cumulative in the given order, so the assignment is
    complete and non-overlapping. Default 98/1/1 train/val/test."""
    splits = splits or {"train": 98, "val": 1, "test": 1}
    names = list(splits)
    total = sum(splits.values())
    bounds = np.cumsum([splits[n] for n in names])  # upper bounds in [1, total]

    def f(batch: pa.Table) -> pa.Table:
        r = _hash64(batch[id_col].to_pylist()) % total
        idx = np.searchsorted(bounds, r, side="right")
        return batch.append_column(
            "split", pa.array([names[i] for i in idx], pa.string())
        )

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)
