"""Corpus-curation capstone composition tests (__ray_entry__.py
corpus_curation): the value-exact driver oracle certifies the numbers;
these tests pin the composition PROPERTIES on a corpus with planted
structure."""

import pyarrow as pa
import pytest


@pytest.fixture(scope="module")
def curated(ray_session, tmp_path_factory):
    import pyarrow.parquet as pq

    import __ray_entry__ as E

    # planted corpus: two exact dups (one with extra whitespace — the
    # normalizer must collapse them), one non-English doc, and filler
    rows = []
    for i in range(40):
        rows.append(dict(doc_id=i, lang="en",
                         text=f"common words doc {i % 7} padded here"))
    rows.append(dict(doc_id=100, lang="en",
                     text="common words doc 1  padded   here"))  # ws dup
    rows.append(dict(doc_id=101, lang="de",
                     text="ganz anderes dokument"))
    sf = tmp_path_factory.mktemp("sf")
    tbl = pa.Table.from_pylist(rows)
    tbl = tbl.append_column("n_chars", pa.array(
        [len(r["text"]) for r in rows], pa.int64()))
    pq.write_table(tbl, str(sf / "documents.parquet"))

    out = E.queries()["corpus_curation"](str(sf)).to_pandas()
    return out.set_index("doc_id"), rows


def test_non_english_dropped(curated):
    out, _ = curated
    assert 101 not in out.index


def test_whitespace_dup_collapsed_to_first_copy(curated):
    out, _ = curated
    # doc 100 normalizes to doc 1's text; only the lower id survives
    assert 1 in out.index
    assert 100 not in out.index
    # docs 0..6 are the distinct texts; 7..39 are exact dups of them
    assert set(out.index) == set(range(7))


def test_shard_assignment_is_prefix_sum(curated):
    out, _ = curated
    out = out.sort_index()
    prior = 0
    for _, row in out.iterrows():
        assert row["shard_id"] == prior // 4096
        prior += row["n_tokens"]
    assert (out["n_tokens"] == 6).all()  # "common words doc K padded here"
