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


FPRINTS = "_fingerprints.json"


def _mix_rows(tbl: pa.Table, key: str, columns: list[str]) -> int:
    """Order-free 64-bit content hash of (key, *columns) rows —
    vectorized per-row xxhash (polars ``hash_rows``, the same kernel as
    kg/unionfind.hash_bucket's string path) XOR-folded, so two stores'
    ranges hash equal iff the row multisets are equal regardless of
    file layout. polars' row hash is not stable across library
    versions, so ``_FP_VERSION`` (embedded in every fingerprint
    sidecar's grid id) carries the polars version: a cache written
    under a different implementation is recomputed, never compared."""
    import numpy as np
    import polars as pl

    h = pl.from_arrow(tbl.select([key, *columns])) \
        .hash_rows(seed=0).to_numpy().astype(np.uint64)
    if len(h) == 0:
        return 0
    return int(np.bitwise_xor.reduce(h))


def store_fingerprints(store_dir: str, bounds: list, *, key: str,
                       columns: list[str]) -> dict[int, int]:
    """Per-range content hashes of a sorted store on a COMMON range
    grid (``bounds[i] .. bounds[i+1]``, last open-ended) — the Merkle
    level of replica reconciliation. Computed by one pruned-read Ray
    task per range and CACHED in a ``_fingerprints.json`` sidecar
    keyed by the grid's own hash, so re-diffing unchanged replicas is
    metadata-only. Each input row is read once on first call.
    """
    import hashlib

    import ray

    import polars as _pl

    fp_version = f"xxh-rows-{_pl.__version__}"
    grid_id = hashlib.md5(repr((bounds, key, columns, fp_version)).encode()) \
        .hexdigest()[:16]
    fpath = os.path.join(store_dir, FPRINTS)
    cache = {}
    if os.path.exists(fpath):
        with open(fpath) as f:
            cache = json.load(f)
        if cache.get("grid") == grid_id:
            return {int(k): v for k, v in cache["ranges"].items()}

    with open(os.path.join(store_dir, ZONEMAP)) as f:
        zonemap = json.load(f)
    entries = [(os.path.join(store_dir, n), z["min"], z["max"])
               for n, z in sorted(zonemap.items())]

    @ray.remote
    def hash_range(i: int, lo, hi, files: list[str]):
        import pyarrow.dataset as pds

        flt = pds.field(key) >= lo
        if hi is not None:
            flt = flt & (pds.field(key) < hi)
        t = pds.dataset(files).to_table(filter=flt,
                                        columns=[key, *columns])
        return i, _mix_rows(t, key, columns), t.num_rows

    futs = []
    for i, lo in enumerate(bounds):
        hi = bounds[i + 1] if i + 1 < len(bounds) else None
        files = [p for p, mn, mx in entries
                 if mx >= lo and (hi is None or mn < hi)]
        if files:
            futs.append(hash_range.remote(i, lo, hi, files))
    out = {i: [h, n] for i, h, n in ray.get(futs)}
    tmp = f"{fpath}.tmp.{os.getpid()}"
    with open(tmp, "w") as f:
        json.dump({"grid": grid_id,
                   "ranges": {str(k): v for k, v in out.items()}}, f)
    os.replace(tmp, fpath)
    return out


def store_diff(dir_a: str, dir_b: str, *, key: str, columns: list[str],
               target_rows_per_range: int = 256_000):
    """Replica reconciliation between two sorted stores WITHOUT
    shipping either table: compare per-range Merkle content hashes on
    a common grid (from both stores' row-group metadata), then run an
    exact row diff ONLY inside mismatching ranges — each range one
    independent pruned-read task, zero exchange. Keys must be unique
    per store. At 100 TB this is how replicas are audited: hash
    comparison is metadata-cached (`store_fingerprints`), and the
    expensive row work is proportional to the DIVERGENCE, not the
    table.

    → ray.data.Dataset (key, status) with status ∈ {'only_a',
    'only_b', 'mismatch'} (mismatch = same key, any column differs).
    Returns an empty-but-typed Dataset when replicas agree.
    """
    import ray
    import ray.data

    rg_stats = []
    for d in (dir_a, dir_b):
        with open(os.path.join(d, ZONEMAP)) as f:
            for name in json.load(f):
                path = os.path.join(d, name)
                md = pq.ParquetFile(path).metadata
                idx = md.schema.to_arrow_schema().get_field_index(key)
                for rg in range(md.num_row_groups):
                    st = md.row_group(rg).column(idx).statistics
                    rg_stats.append((st.min, md.row_group(rg).num_rows))
    rg_stats.sort()
    bounds, acc = [rg_stats[0][0]], 0
    for mn, rows in rg_stats:
        if acc >= target_rows_per_range and mn > bounds[-1]:
            bounds.append(mn)
            acc = 0
        acc += rows
    fa = store_fingerprints(dir_a, bounds, key=key, columns=columns)
    fb = store_fingerprints(dir_b, bounds, key=key, columns=columns)
    bad = sorted(i for i in set(fa) | set(fb) if fa.get(i) != fb.get(i))

    def files_for(d, lo, hi):
        with open(os.path.join(d, ZONEMAP)) as f:
            zm = json.load(f)
        return [os.path.join(d, n) for n, z in sorted(zm.items())
                if z["max"] >= lo and (hi is None or z["min"] < hi)]

    @ray.remote
    def diff_range(lo, hi, files_a: list[str], files_b: list[str]):
        import numpy as np
        import pyarrow.dataset as pds

        def load(files):
            if not files:
                return pa.table({key: pa.array([], pa.int64()),
                                 **{c: pa.array([], pa.string())
                                    for c in columns}})
            flt = pds.field(key) >= lo
            if hi is not None:
                flt = flt & (pds.field(key) < hi)
            t = pds.dataset(files).to_table(filter=flt,
                                            columns=[key, *columns])
            return t.take(pc.sort_indices(t[key]))

        ta, tb = load(files_a), load(files_b)
        ka = ta[key].to_numpy(zero_copy_only=False)
        kb = tb[key].to_numpy(zero_copy_only=False)
        in_b = np.isin(ka, kb)
        in_a = np.isin(kb, ka)
        keys, statuses = [ka[~in_b], kb[~in_a]], ["only_a", "only_b"]
        ca, cb = ta.filter(pa.array(in_b)), tb.filter(pa.array(in_a))
        if ca.num_rows:
            neq = np.zeros(ca.num_rows, bool)
            for c in columns:
                neq |= pc.invert(pc.equal(
                    ca[c].combine_chunks(), cb[c].combine_chunks()
                )).fill_null(True).to_numpy(zero_copy_only=False)
            keys.append(ca[key].to_numpy(zero_copy_only=False)[neq])
            statuses.append("mismatch")
        out_k, out_s = [], []
        for k, s in zip(keys, statuses):
            out_k.extend(int(x) for x in k)
            out_s.extend([s] * len(k))
        return pa.table({key: pa.array(out_k, pa.int64()),
                         "status": pa.array(out_s, pa.string())})

    futs = []
    for i in bad:
        lo = bounds[i]
        hi = bounds[i + 1] if i + 1 < len(bounds) else None
        futs.append(diff_range.remote(lo, hi, files_for(dir_a, lo, hi),
                                      files_for(dir_b, lo, hi)))
    tables = [t for t in ray.get(futs) if t.num_rows] if futs else []
    if not tables:
        return ray.data.from_arrow(pa.table({
            key: pa.array([], pa.int64()),
            "status": pa.array([], pa.string())}))
    return ray.data.from_arrow(pa.concat_tables(tables))


VERSIONS = "_versions.json"


def commit_version(table_dir: str, ds, *, key: str) -> int:
    """Iceberg-style snapshot chain over sorted stores: each commit
    writes a full store under ``v<NNN>/`` and then atomically swaps the
    version manifest (tmp + os.replace), so readers always see either
    the old chain or the new one — never a half-written snapshot. Old
    versions stay immutable on disk for time-travel reads until a
    retention job drops them. Returns the new version number.

    (Snapshot = full store here; the delta path at scale is the
    existing changelog machinery — ``ops/cdc.apply_changelog`` to
    derive a snapshot, ``compact_stores`` to merge incremental sorted
    runs into the next version without a shuffle.)
    """
    os.makedirs(table_dir, exist_ok=True)
    vpath = os.path.join(table_dir, VERSIONS)
    chain = []
    if os.path.exists(vpath):
        with open(vpath) as f:
            chain = json.load(f)["versions"]
    v = (chain[-1] if chain else 0) + 1
    vdir = os.path.join(table_dir, f"v{v:03d}")
    write_sorted_store(ds, vdir, key=key)
    tmp = f"{vpath}.tmp.{os.getpid()}"
    with open(tmp, "w") as f:
        json.dump({"versions": chain + [v], "key": key}, f)
    os.replace(tmp, vpath)
    return v


def read_store_version(table_dir: str, version: int | None = None,
                       columns: list[str] | None = None):
    """Time-travel read: the full store of ``version`` (default: the
    latest committed). → ray.data.Dataset."""
    import ray.data

    with open(os.path.join(table_dir, VERSIONS)) as f:
        chain = json.load(f)["versions"]
    if version is None:
        version = chain[-1]
    if version not in chain:
        raise ValueError(f"version {version} not in {chain}")
    vdir = os.path.join(table_dir, f"v{version:03d}")
    with open(os.path.join(vdir, ZONEMAP)) as f:
        files = [os.path.join(vdir, n) for n in sorted(json.load(f))]
    return ray.data.read_parquet(files, columns=columns)
