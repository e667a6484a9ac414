"""Range-partitioned sorted Parquet store with a zone-map manifest.

The storage-side answer to "point/range lookups over a 100-TB table
without scanning it": write the table ONCE sorted by a key (Ray Data's
sample-based range sort → every output file covers a disjoint key
range), record each file's (min, max, rows) in a small JSON zone map,
and serve lookups by pruning to the files whose range covers the probe
keys — I/O is O(matching files), not O(table).

Layout under ``out_dir``::

    part-00000.parquet ... part-NNNNN.parquet   (sorted, disjoint ranges)
    _zonemap.json                               ({file: {min, max, rows}})

Writes are atomic per store (stage directory + rename), so concurrent
builders of the same fingerprinted path can't expose a half-written
store — the same discipline as runtime/checkpoint.py.
"""

from __future__ import annotations

import json
import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq

ZONEMAP = "_zonemap.json"


def write_sorted_store(ds, out_dir: str, *, key: str) -> dict:
    """Sort ``ds`` by ``key`` (one range-shuffle), write one Parquet
    file per block, and build the zone map from the written FOOTERS
    (metadata-only reads — no data re-scan). Returns the zone map.
    Atomic: builds in a stage dir, renames into place; an existing
    complete store (zone map present) is left untouched and returned.
    """
    zpath = os.path.join(out_dir, ZONEMAP)
    if os.path.exists(zpath):
        with open(zpath) as f:
            return json.load(f)

    stage = f"{out_dir}.stage.{os.getpid()}"
    shutil.rmtree(stage, ignore_errors=True)
    ds.sort(key).write_parquet(stage)

    zonemap: dict[str, dict] = {}
    for name in sorted(os.listdir(stage)):
        if not name.endswith(".parquet"):
            continue
        md = pq.ParquetFile(os.path.join(stage, name)).metadata
        idx = md.schema.to_arrow_schema().get_field_index(key)
        mins, maxs, rows = [], [], 0
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            mins.append(st.min)
            maxs.append(st.max)
            rows += md.row_group(rg).num_rows
        if rows:
            zonemap[name] = {"min": min(mins), "max": max(maxs), "rows": rows}
    with open(os.path.join(stage, ZONEMAP), "w") as f:
        json.dump(zonemap, f)

    try:
        os.rename(stage, out_dir)
    except OSError:
        # a concurrent builder won the rename; trust its complete store
        shutil.rmtree(stage, ignore_errors=True)
        with open(zpath) as f:
            return json.load(f)
    return zonemap


def pruned_files(out_dir: str, keys) -> tuple[list[str], int]:
    """→ (matching file paths, total file count): the zone-map prune.
    A file qualifies iff some probe key lands inside its [min, max]."""
    with open(os.path.join(out_dir, ZONEMAP)) as f:
        zonemap = json.load(f)
    ks = sorted(keys)
    hit = [
        os.path.join(out_dir, name)
        for name, z in sorted(zonemap.items())
        if any(z["min"] <= k <= z["max"] for k in ks)
    ]
    return hit, len(zonemap)


def lookup(out_dir: str, *, key: str, keys, columns: list[str] | None = None):
    """Point-lookup rows whose ``key`` ∈ ``keys`` reading ONLY the
    zone-map-pruned files (plus a row-level filter inside them).
    → ray.data.Dataset. The probe list is caller-bounded (broadcast
    into the filter); range scans compose the same way with an
    interval predicate."""
    import ray.data

    files, _total = pruned_files(out_dir, keys)
    if not files:
        return ray.data.from_arrow(pa.table({}))
    import pyarrow.dataset as pds

    return ray.data.read_parquet(
        files, columns=columns,
        filter=pds.field(key).isin(list(keys)),
    )
