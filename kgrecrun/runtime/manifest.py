"""Per-partition checkpoint manifests (SURVEY.md §7.6, north-rule
resumability requirement).

A manifest records, for one completed input partition: the input
fingerprint (paths + sizes), per-output row counts, the stage-config
hash, wall time, throughput metrics, and lineage. Manifests are written
atomically (tmp + rename) AFTER the partition's Parquet output is
durable, so a partially-written partition never looks complete. A
resumed run skips partitions whose manifest matches both fingerprint
and config hash — changed input or changed pipeline config invalidates
the checkpoint automatically.
"""

from __future__ import annotations

import hashlib
import json
import os
import time
from dataclasses import asdict, dataclass, field


@dataclass
class PartitionManifest:
    partition_id: str
    input_files: list[str]
    input_fingerprint: str
    config_hash: str
    row_counts: dict[str, int]
    metrics: dict[str, float]
    lineage: list[str] = field(default_factory=list)
    created_ts: float = 0.0

    def to_json(self) -> str:
        return json.dumps(asdict(self), indent=1, sort_keys=True)


def fingerprint_files(paths: list[str]) -> str:
    h = hashlib.sha1()
    for p in sorted(paths):
        st = os.stat(p)
        h.update(f"{p}:{st.st_size}\n".encode())
    return h.hexdigest()


def config_hash(config: dict) -> str:
    return hashlib.sha1(json.dumps(config, sort_keys=True, default=str).encode()).hexdigest()


def manifest_dir(out_dir: str) -> str:
    return os.path.join(out_dir, "_manifests")


def manifest_path(out_dir: str, partition_id: str) -> str:
    return os.path.join(manifest_dir(out_dir), f"part-{partition_id}.json")


def write_manifest(out_dir: str, manifest: PartitionManifest) -> None:
    os.makedirs(manifest_dir(out_dir), exist_ok=True)
    path = manifest_path(out_dir, manifest.partition_id)
    manifest.created_ts = time.time()
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        f.write(manifest.to_json())
    os.replace(tmp, path)  # atomic publish


def load_manifests(out_dir: str) -> dict[str, PartitionManifest]:
    d = manifest_dir(out_dir)
    if not os.path.isdir(d):
        return {}
    out = {}
    for name in os.listdir(d):
        if not (name.startswith("part-") and name.endswith(".json")):
            continue
        with open(os.path.join(d, name)) as f:
            data = json.load(f)
        m = PartitionManifest(**data)
        out[m.partition_id] = m
    return out


def is_complete(out_dir: str, partition_id: str, input_files: list[str], cfg_hash: str) -> bool:
    """True iff the partition's manifest exists and matches the current
    input fingerprint and pipeline config."""
    path = manifest_path(out_dir, partition_id)
    if not os.path.exists(path):
        return False
    with open(path) as f:
        data = json.load(f)
    return (
        data.get("config_hash") == cfg_hash
        and data.get("input_fingerprint") == fingerprint_files(input_files)
    )
