"""Resumability: a run killed after some partitions resumes from the
per-partition manifests, skips completed work, and produces output
identical to an uninterrupted run.
"""

import pyarrow.dataset as pads
import pytest

from kgrecrun.corpus import synthgen
from kgrecrun.runtime import manifest as mf
from kgrecrun.runtime.checkpoint import run_checkpointed


def _triples_set(path):
    t = pads.dataset(path).to_table()
    return set(
        zip(t["subj"].to_pylist(), t["pred"].to_pylist(), t["obj"].to_pylist(), t["n_sources"].to_pylist())
    )


@pytest.mark.usefixtures("ray_session")
def test_resume_from_manifests(tmp_path):
    import glob

    corpus = tmp_path / "corpus"
    synthgen.write_corpus(str(corpus), n_docs=120, seed=42, shard_size=20)
    w = synthgen.get_world(42)
    files = sorted(glob.glob(str(corpus / "pages" / "*.parquet")))
    assert len(files) == 6

    # clean full run (reference output)
    out_a = str(tmp_path / "out_a")
    res_a = run_checkpointed(files, w.entity_table(), out_a, files_per_partition=2)
    assert res_a["partitions_run"] == ["00000", "00001", "00002"]
    assert res_a["partitions_skipped"] == []

    # "killed" run: only the first 2 partitions' inputs processed
    out_b = str(tmp_path / "out_b")
    run_checkpointed(files[:4], w.entity_table(), out_b, files_per_partition=2)
    manifests = mf.load_manifests(out_b)
    assert set(manifests) == {"00000", "00001"}
    for m in manifests.values():
        assert m.row_counts["pages"] == 40
        assert m.metrics["wall_s"] > 0
        assert m.lineage

    # resume with the full input: completed partitions are skipped
    res_b = run_checkpointed(files, w.entity_table(), out_b, files_per_partition=2)
    assert res_b["partitions_skipped"] == ["00000", "00001"]
    assert res_b["partitions_run"] == ["00002"]

    assert _triples_set(out_a + "/triples") == _triples_set(out_b + "/triples")


@pytest.mark.usefixtures("ray_session")
def test_config_change_invalidates(tmp_path):
    import glob

    corpus = tmp_path / "corpus"
    synthgen.write_corpus(str(corpus), n_docs=40, seed=42, shard_size=20)
    w = synthgen.get_world(42)
    files = sorted(glob.glob(str(corpus / "pages" / "*.parquet")))
    out = str(tmp_path / "out")
    run_checkpointed(files, w.entity_table(), out, files_per_partition=2)
    res = run_checkpointed(files, w.entity_table(), out, files_per_partition=2,
                           config={"pipeline": "kg_v2"})
    assert res["partitions_skipped"] == []  # config hash changed → re-run


def test_materialize_out_dir_keyed_by_corpus_fingerprint():
    """VERDICT r2 item 8: the kg_materialize scratch path is a function
    of the corpus identity (doc count, seed, generator source), not the
    sf name alone — different corpus definitions can never collide into
    one resumable tree."""
    import sys

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as E

    a = E._materialize_out_dir("/root/testdata/sf0.001")
    b = E._materialize_out_dir("/root/testdata/sf0.01")
    c = E._materialize_out_dir("/some/other/prefix/sf0.001")
    d = E._materialize_out_dir("/root/testdata/sf0.001", seed=7)
    assert a != b            # different doc counts → different trees
    assert a == c            # same corpus definition → same resumable tree
    assert a != d            # different seed → different tree
    assert a.startswith("/tmp/kgrecrun_materialize_")


@pytest.mark.usefixtures("ray_session")
def test_compact_parquet_dir(tmp_path):
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from kgrecrun.runtime.compact import compact_parquet_dir

    d = tmp_path / "shards"
    d.mkdir()
    want = {}
    for i in range(12):
        t = pa.table({"k": pa.array(range(i * 100, i * 100 + 100), pa.int64()),
                      "v": pa.array([i] * 100, pa.int64())})
        pq.write_table(t, d / f"part-{i:03d}.parquet")
        for k in range(i * 100, i * 100 + 100):
            want[k] = i
    rep = compact_parquet_dir(str(d), target_bytes=8 << 10)
    assert rep["compacted"] and rep["files_before"] == 12
    assert rep["files_after"] < 12 and rep["rows"] == 1200
    got = pads.dataset(str(d)).to_table()
    assert dict(zip(got["k"].to_pylist(), got["v"].to_pylist())) == want
    # second run is a no-op (already one target's worth)
    rep2 = compact_parquet_dir(str(d), target_bytes=1 << 20)
    assert not rep2["compacted"]
    assert not any(p.endswith((".compact-tmp", ".compact-old"))
                   for p in os.listdir(tmp_path))


@pytest.mark.usefixtures("ray_session")
def test_warc_input_flagship_identical(tmp_path):
    """The checkpointed flagship over WARC.gz crawl shards produces the
    SAME final triples as over parquet pages (file-granular partitions
    and manifests work identically), and a re-run skips everything."""
    import glob

    import ray.data

    from kgrecrun.sources.warc import write_warc_shards

    corpus = tmp_path / "corpus"
    synthgen.write_corpus(str(corpus), n_docs=80, seed=42, shard_size=20)
    w = synthgen.get_world(42)
    pq_files = sorted(glob.glob(str(corpus / "pages" / "*.parquet")))

    warc_dir = tmp_path / "warc"
    for f in pq_files:  # one WARC shard per parquet shard
        write_warc_shards(ray.data.read_parquet(f).repartition(1),
                          str(warc_dir))
    warc_files = sorted(glob.glob(str(warc_dir / "*.warc.gz")))
    assert len(warc_files) == len(pq_files)

    out_pq = str(tmp_path / "out_pq")
    out_wc = str(tmp_path / "out_wc")
    run_checkpointed(pq_files, w.entity_table(), out_pq,
                     files_per_partition=2)
    res = run_checkpointed(warc_files, w.entity_table(), out_wc,
                           files_per_partition=2, input_format="warc")
    assert res["partitions_run"] == ["00000", "00001"]
    assert _triples_set(out_wc + "/triples") == _triples_set(
        out_pq + "/triples")

    res2 = run_checkpointed(warc_files, w.entity_table(), out_wc,
                            files_per_partition=2, input_format="warc")
    assert res2["partitions_run"] == []
    assert res2["partitions_skipped"] == ["00000", "00001"]
    assert res2["final_reduce"] == "skipped"
