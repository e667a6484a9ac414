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
import pyarrow.compute as pc
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


def compact_stores(
    store_dirs: list[str],
    out_dir: str,
    *,
    key: str,
    target_rows_per_file: int = 64_000,
) -> dict:
    """LSM-style compaction: merge K sorted stores (overlapping key
    ranges) into ONE sorted store WITHOUT a global sort shuffle.

    A Dataset ``sort`` re-samples and all-to-all-exchanges every row;
    compaction instead exploits that the inputs are already sorted
    runs: the merge plan is computed from the ZONE MAPS alone (no data
    read), then each disjoint output key range is produced by one
    independent Ray task that reads only the input files overlapping
    its range (row-filtered at the parquet scan) and sorts the few
    blocks it sees. Exchange volume: zero; I/O: each input row is read
    exactly once; tasks are embarrassingly parallel and individually
    retryable — the shape that holds when the runs total 100 TB.

    Raw ``ray.remote`` is justified here (not ``map_batches``): each
    task is a range-scoped multi-file read+merge+write with no
    per-batch semantics, and the plan (range → files) is metadata the
    Dataset API cannot express without re-shuffling.

    Boundaries come from the input files' ROW-GROUP statistics
    (parquet footers — metadata-only reads, no row data), greedily
    packed to ~``target_rows_per_file`` rows per output range, so
    balance holds even when a run is a handful of huge files. Atomic
    + idempotent like :func:`write_sorted_store`: an existing
    complete store wins. Returns the merged store's zone map.
    """
    import ray

    zpath = os.path.join(out_dir, ZONEMAP)
    if os.path.exists(zpath):
        with open(zpath) as f:
            return json.load(f)

    entries = []   # per FILE: (path, min, max) — the range→files prune
    rg_stats = []  # per ROW GROUP: (min, rows) — boundary candidates
    for d in store_dirs:
        with open(os.path.join(d, ZONEMAP)) as f:
            for name, z in json.load(f).items():
                path = os.path.join(d, name)
                entries.append((path, z["min"], z["max"]))
                md = pq.ParquetFile(path).metadata
                idx = md.schema.to_arrow_schema().get_field_index(key)
                for rg in range(md.num_row_groups):
                    st = md.row_group(rg).column(idx).statistics
                    rg_stats.append((st.min, md.row_group(rg).num_rows))
    if not entries:
        raise ValueError("compact_stores: no input files")

    # range boundaries from row-group mins only (metadata-only plan)
    rg_stats.sort()
    bounds, acc = [rg_stats[0][0]], 0
    for mn, rows in rg_stats:
        if acc >= target_rows_per_file and mn > bounds[-1]:
            bounds.append(mn)
            acc = 0
        acc += rows
    ranges = [
        (bounds[i], bounds[i + 1] if i + 1 < len(bounds) else None)
        for i in range(len(bounds))
    ]

    @ray.remote
    def merge_range(i: int, lo, hi, files: list[str], stage: str):
        import pyarrow.dataset as pds

        flt = pds.field(key) >= lo
        if hi is not None:
            flt = flt & (pds.field(key) < hi)
        t = pds.dataset(files).to_table(filter=flt)
        if t.num_rows == 0:
            return None
        t = t.take(pc.sort_indices(t[key]))
        name = f"part-{i:05d}.parquet"
        pq.write_table(t, os.path.join(stage, name))
        col = t[key]
        return (name, col[0].as_py(), col[-1].as_py(), t.num_rows)

    stage = f"{out_dir}.stage.{os.getpid()}"
    shutil.rmtree(stage, ignore_errors=True)
    os.makedirs(stage)
    futs = []
    for i, (lo, hi) in enumerate(ranges):
        files = [
            p for p, mn, mx in entries
            if mx >= lo and (hi is None or mn < hi)
        ]
        if files:
            futs.append(merge_range.remote(i, lo, hi, files, stage))
    zonemap = {
        name: {"min": mn, "max": mx, "rows": rows}
        for name, mn, mx, rows in
        (r for r in ray.get(futs) if r is not None)
    }
    with open(os.path.join(stage, ZONEMAP), "w") as f:
        json.dump(zonemap, f)
    try:
        os.rename(stage, out_dir)
    except OSError:
        shutil.rmtree(stage, ignore_errors=True)
        with open(zpath) as f:
            return json.load(f)
    return zonemap
