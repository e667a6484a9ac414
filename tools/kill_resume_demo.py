"""Hard-kill resumability demo: SIGKILL the checkpointed CLI mid-run,
re-run it, and verify the final triples equal an uninterrupted run.

Standalone (owns its Ray sessions via subprocesses; not part of pytest
because killing a driver can orphan raylet processes that would pollute
the shared test session).

Usage: python tools/kill_resume_demo.py [n_docs]
Exit 0 iff resumed output == clean output and ≥1 partition was skipped.
"""

from __future__ import annotations

import glob
import json
import os
import pathlib
import shutil
import signal
import subprocess
import sys
import time

ROOT = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))


def triples_set(path: str) -> set:
    import pyarrow.dataset as pads

    t = pads.dataset(path, partitioning="hive").to_table()
    return set(
        zip(t["subj"].to_pylist(), t["pred"].to_pylist(),
            t["obj"].to_pylist(), t["n_sources"].to_pylist())
    )


def cli(args: list[str]) -> subprocess.Popen:
    return subprocess.Popen(
        [sys.executable, "-m", "kgrecrun.cli", *args],
        cwd=str(ROOT), stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
    )


def main() -> int:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 4000
    base = "/tmp/kill_resume_demo"
    shutil.rmtree(base, ignore_errors=True)

    from kgrecrun.corpus import synthgen

    corpus = f"{base}/corpus"
    synthgen.write_corpus(corpus, n_docs, seed=42, shard_size=max(200, n_docs // 8))
    pages_glob = f"{corpus}/pages/*.parquet"
    n_shards = len(glob.glob(pages_glob))

    # entity catalog file for --entities
    import pyarrow.parquet as pq

    ent_path = f"{base}/entities.parquet"
    pq.write_table(synthgen.get_world(42).entity_table(), ent_path)
    common = ["--pages", pages_glob, "--entities", ent_path, "--files-per-partition", "1"]

    # 1) clean run
    p = cli([*common, "--out", f"{base}/clean"])
    out, _ = p.communicate(timeout=900)
    clean = json.loads(out.strip().splitlines()[-1])
    print(f"clean run: {len(clean['partitions_run'])}/{n_shards} partitions")

    # 2) killed run: SIGKILL as soon as the first manifest lands
    victim = cli([*common, "--out", f"{base}/killed"])
    mdir = f"{base}/killed/_manifests"
    deadline = time.time() + 600
    while time.time() < deadline:
        if glob.glob(f"{mdir}/*.json"):
            break
        if victim.poll() is not None:
            print("victim finished before kill — increase n_docs"); return 1
        time.sleep(0.2)
    os.kill(victim.pid, signal.SIGKILL)
    victim.wait()
    done_before = len(glob.glob(f"{mdir}/*.json"))
    print(f"SIGKILLed driver pid {victim.pid} with {done_before}/{n_shards} manifests written")
    subprocess.run(["ray", "stop", "--force"], capture_output=True)  # reap orphans
    time.sleep(2)

    # 3) resume
    p = cli([*common, "--out", f"{base}/killed"])
    out, _ = p.communicate(timeout=900)
    resumed = json.loads(out.strip().splitlines()[-1])
    print(f"resume: ran {len(resumed['partitions_run'])}, skipped {len(resumed['partitions_skipped'])}")

    same = triples_set(f"{base}/clean/triples") == triples_set(f"{base}/killed/triples")
    ok = same and len(resumed["partitions_skipped"]) >= 1
    print(json.dumps({"identical_output": same,
                      "partitions_skipped_on_resume": resumed["partitions_skipped"],
                      "verdict": "PASS" if ok else "FAIL"}))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
