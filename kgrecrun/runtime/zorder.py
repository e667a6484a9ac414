"""Z-order (Morton-curve) clustered Parquet store: ONE layout that
prunes on TWO columns.

A 1-D sorted store (runtime/sortedstore.py) answers range probes on its
sort key with O(matching files) I/O — but a probe on any OTHER column
scans everything. The lakehouse answer is space-filling-curve
clustering: interleave the bits of two (31-bit) integer keys into one
Morton code z(a, b), range-sort the table by z, and every output file
covers a small axis-aligned CELL of (a, b) space, so a box query
``a ∈ [a0,a1] ∧ b ∈ [b0,b1]`` prunes files on BOTH dimensions at once.
This is the layout primitive behind Delta/Iceberg ``ZORDER BY`` — at
100 TB the difference between "scan a year of one customer" touching a
few files versus a full-column scan.

Pruning is metadata-only and twice conservative-safe:

* **z-interval overlap** — a file qualifies only if its [zmin, zmax]
  intersects [z(a0,b0), z(a1,b1)] (Morton codes are monotone per
  coordinate, so the box's z-image lies inside that interval);
* **quadtree-cell rejection** — the common binary prefix of a file's
  zmin/zmax defines the smallest quadtree cell containing the file;
  decoding the cell's corner codes gives an (a, b) bounding box, and a
  file whose cell box misses the query box is skipped even when its
  z-interval overlaps (the curve jumps between distant cells — this is
  the cheap 90% of Tropf–Herzog BIGMIN).

Rows inside surviving files are then filtered EXACTLY on (a, b) at the
parquet scan, so results are precise regardless of how coarse the prune
was. Storage reuses :func:`sortedstore.write_sorted_store` on the
computed ``__z`` column — same atomic zone-map layout, same
:func:`sortedstore.compact_stores` compaction path.

Coordinates must be integers in [0, 2^31): epoch-days, dictionary
codes, and surrogate keys all fit; z then fits int64.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa

from .sortedstore import ZONEMAP, write_sorted_store

ZCOL = "__z"
_META = "_zorder.json"


def _spread(x: np.ndarray) -> np.ndarray:
    """uint64 x (values < 2^32) → bits of x in the EVEN bit positions."""
    x = x.astype(np.uint64)
    x = (x | (x << np.uint64(16))) & np.uint64(0x0000FFFF0000FFFF)
    x = (x | (x << np.uint64(8))) & np.uint64(0x00FF00FF00FF00FF)
    x = (x | (x << np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    x = (x | (x << np.uint64(2))) & np.uint64(0x3333333333333333)
    x = (x | (x << np.uint64(1))) & np.uint64(0x5555555555555555)
    return x


def _squash(x: np.ndarray) -> np.ndarray:
    """inverse of :func:`_spread`: even bits of x → compact uint64."""
    x = x.astype(np.uint64) & np.uint64(0x5555555555555555)
    x = (x | (x >> np.uint64(1))) & np.uint64(0x3333333333333333)
    x = (x | (x >> np.uint64(2))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    x = (x | (x >> np.uint64(4))) & np.uint64(0x00FF00FF00FF00FF)
    x = (x | (x >> np.uint64(8))) & np.uint64(0x0000FFFF0000FFFF)
    x = (x | (x >> np.uint64(16))) & np.uint64(0x00000000FFFFFFFF)
    return x


def zvalue(a, b) -> np.ndarray:
    """Morton-interleave two integer coordinate arrays → int64 codes
    (a in the even bits, b in the odd). Both must be in [0, 2^31)."""
    a = np.asarray(a, np.int64)
    b = np.asarray(b, np.int64)
    if len(a) and (a.min() < 0 or b.min() < 0
                   or a.max() >= 1 << 31 or b.max() >= 1 << 31):
        raise ValueError("zvalue coordinates must be in [0, 2^31)")
    z = _spread(a.astype(np.uint64)) | (_spread(b.astype(np.uint64))
                                        << np.uint64(1))
    return z.astype(np.int64)


def zdecode(z) -> tuple[np.ndarray, np.ndarray]:
    """int64 Morton codes → (a, b) coordinate arrays."""
    u = np.asarray(z, np.int64).astype(np.uint64)
    return (_squash(u).astype(np.int64),
            _squash(u >> np.uint64(1)).astype(np.int64))


def write_zorder_store(ds, out_dir: str, *, cols: tuple[str, str]) -> dict:
    """Cluster ``ds`` by z(cols[0], cols[1]) and write a zone-mapped
    sorted store (atomic + idempotent, see ``write_sorted_store``).
    The ``__z`` column is kept in the files (it is the sort key the
    zone map indexes); lookups project it away. Returns the zone map.
    """
    a_col, b_col = cols

    def add_z(batch: pa.Table) -> pa.Table:
        a = batch[a_col].combine_chunks().to_numpy(zero_copy_only=False)
        b = batch[b_col].combine_chunks().to_numpy(zero_copy_only=False)
        return batch.append_column(ZCOL, pa.array(zvalue(a, b), pa.int64()))

    zm = write_sorted_store(
        ds.map_batches(add_z, batch_format="pyarrow", zero_copy_batch=True),
        out_dir, key=ZCOL)
    meta = os.path.join(out_dir, _META)
    if not os.path.exists(meta):
        with open(meta, "w") as f:
            json.dump({"cols": [a_col, b_col]}, f)
    return zm


def box_files(out_dir: str, lo: tuple[int, int],
              hi: tuple[int, int]) -> tuple[list[str], int]:
    """→ (files possibly containing the box, total files): the 2-D
    zone-map prune — z-interval overlap + quadtree-cell rejection."""
    with open(os.path.join(out_dir, ZONEMAP)) as f:
        zonemap = json.load(f)
    zlo = int(zvalue([lo[0]], [lo[1]])[0])
    zhi = int(zvalue([hi[0]], [hi[1]])[0])
    hit = []
    for name, zm in sorted(zonemap.items()):
        u, v = int(zm["min"]), int(zm["max"])
        if v < zlo or u > zhi:
            continue
        # smallest quadtree cell containing [u, v]: fix the common
        # prefix, free the rest; decoding the cell corners bounds the
        # file's reachable (a, b) region
        free = (u ^ v).bit_length()
        cell_lo, cell_hi = u >> free << free, u | ((1 << free) - 1)
        (amin,), (bmin,) = zdecode([cell_lo])
        (amax,), (bmax,) = zdecode([cell_hi])
        if amax < lo[0] or amin > hi[0] or bmax < lo[1] or bmin > hi[1]:
            continue
        hit.append(os.path.join(out_dir, name))
    return hit, len(zonemap)


def box_lookup(out_dir: str, lo: tuple[int, int], hi: tuple[int, int],
               *, columns: list[str] | None = None):
    """Exact box query ``a ∈ [lo[0], hi[0]] ∧ b ∈ [lo[1], hi[1]]``:
    read only the pruned files, row-filter exactly on the coordinate
    columns at the scan. → ray.data.Dataset."""
    import pyarrow.dataset as pds
    import ray.data

    with open(os.path.join(out_dir, _META)) as f:
        a_col, b_col = json.load(f)["cols"]
    files, _total = box_files(out_dir, lo, hi)
    if not files:
        return ray.data.from_arrow(pa.table({}))
    flt = ((pds.field(a_col) >= lo[0]) & (pds.field(a_col) <= hi[0])
           & (pds.field(b_col) >= lo[1]) & (pds.field(b_col) <= hi[1]))
    return ray.data.read_parquet(files, columns=columns, filter=flt)
