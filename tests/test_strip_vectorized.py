"""Round-5 vectorized-strip guarantees: the xxh128 fingerprint path of
dup_span_strip / source_template_strip emits BIT-IDENTICAL output to the
legacy md5 path (the fingerprint is a grouping key only), the vectorized
tokenizer equals textnorm.ascii_words element-wise, and the round-4
ADVICE null-handling edges (null source, null text) behave as
documented."""
import numpy as np
import pyarrow as pa
import pytest

from kgrecrun.ops import dedup
from kgrecrun.ops.dedup import _flat_tokens
from kgrecrun.textnorm import ascii_words

TRICKY_TEXTS = [
    None, "", "   ", "a", " a ", "a  b", "\ta\nb\r c\f",
    "a\vb",               # \v is NOT in the RE2 \s class — one token
    "x y",           # NBSP is not ASCII whitespace — one token
    "x y",           # LS likewise
    "héllo wörld", "a " * 50, "tok" * 100,
    "mixed\t \n\r\fruns  of   ws",
]


def test_flat_tokens_equals_ascii_words():
    arr = pa.array(TRICKY_TEXTS, pa.string())
    flat, lens = _flat_tokens(arr)
    toks = flat.to_pylist()
    off = 0
    for t, n in zip(TRICKY_TEXTS, lens):
        assert toks[off:off + int(n)] == ascii_words(t), repr(t)
        off += int(n)
    assert off == len(toks)


def test_flat_tokens_chunked_and_empty():
    flat, lens = _flat_tokens(pa.chunked_array([
        pa.array(["a b", None]), pa.array(["", "c"])]))
    assert flat.to_pylist() == ["a", "b", "c"]
    assert lens.tolist() == [2, 0, 0, 1]
    flat, lens = _flat_tokens(pa.array([], pa.string()))
    assert len(flat) == 0 and lens.size == 0


def _corpus(n_docs: int = 60, seed: int = 7) -> pa.Table:
    """Small corpus with heavy accidental k-gram/segment collisions
    (tiny vocab), plus planted boilerplate, null text and short docs."""
    rng = np.random.default_rng(seed)
    vocab = [f"w{i}" for i in range(8)]
    texts, srcs = [], []
    boiler = " ".join(f"b{i}" for i in range(12))
    for i in range(n_docs):
        body = " ".join(rng.choice(vocab, size=int(rng.integers(0, 40))))
        if i % 5 == 0:
            body = boiler + " " + body
        texts.append(body)
        srcs.append(f"s{i % 4}")
    texts[3] = None
    texts[9] = ""
    return pa.table({
        "doc_id": pa.array(range(n_docs), pa.int64()),
        "source": pa.array(srcs, pa.string()),
        "text": pa.array(texts, pa.string()),
    })


@pytest.mark.usefixtures("ray_session")
def test_dup_span_strip_fingerprint_modes_identical():
    import ray.data

    t = _corpus()
    outs = []
    for mode in ("md5", "xxh128"):
        ds = ray.data.from_arrow(t).repartition(4)
        outs.append(dedup.dup_span_strip(ds, k=3, fingerprint=mode)
                    .to_pandas().sort_values("doc_id")
                    .reset_index(drop=True))
    assert outs[0].equals(outs[1])
    # null text rows flow through as empty docs (documented contract)
    row = outs[1][outs[1].doc_id == 3].iloc[0]
    assert row.n_tokens == 0 and row.text_clean == ""


@pytest.mark.usefixtures("ray_session")
def test_template_strip_fingerprint_modes_identical():
    import ray.data

    t = _corpus()
    outs = []
    for mode in ("md5", "xxh128"):
        ds = ray.data.from_arrow(t).repartition(4)
        outs.append(dedup.source_template_strip(
            ds, seg_words=4, fingerprint=mode)
            .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert outs[0].equals(outs[1])


@pytest.mark.usefixtures("ray_session")
def test_segment_dedup_fingerprint_modes_identical():
    import ray.data

    t = _corpus()
    outs = []
    for mode in ("md5", "xxh128"):
        ds = ray.data.from_arrow(t).repartition(4)
        outs.append(dedup.segment_dedup_docs(
            ds, seg_words=4, fingerprint=mode)
            .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert outs[0].equals(outs[1])
    with pytest.raises(ValueError):
        dedup.segment_dedup_docs(None, fingerprint="sha1")


@pytest.mark.usefixtures("ray_session")
def test_template_strip_null_source_sentinel():
    """Null sources fill to the '' sentinel: two null-source docs
    sharing a segment template against each other, and the boundary
    sweep between a null-source run and an equal-hash neighbor group
    stays exact (the round-4 ADVICE miss)."""
    import ray.data

    seg = " ".join(f"t{i}" for i in range(4))
    t = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "source": pa.array([None, None, "s1", "s1"], pa.string()),
        "text": pa.array([seg + " keep1", seg + " keep2",
                          seg + " keep3", seg + " keep4"]),
    })
    ds = ray.data.from_arrow(t).repartition(2)
    df = (dedup.source_template_strip(ds, seg_words=4)
          .to_pandas().sort_values("doc_id").reset_index(drop=True))
    # the shared segment is a template within EACH group (null-null and
    # s1-s1), never across: all four docs lose exactly segment 1
    assert df["n_template_segs"].tolist() == [1, 1, 1, 1]
    assert df["text_clean"].tolist() == ["keep1", "keep2", "keep3",
                                         "keep4"]


def test_fingerprint_mode_validation():
    with pytest.raises(ValueError):
        dedup.dup_span_strip(None, fingerprint="sha1")
    with pytest.raises(ValueError):
        dedup.source_template_strip(None, fingerprint="sha1")


def test_segments_vectorized_overflow_is_loud():
    """The packed (doc_id, seg_no) ord raises instead of wrapping
    (round-5 review finding: numpy int64 would wrap silently where the
    old Python-int path raised OverflowError)."""
    from kgrecrun.ops.dedup import _segments_vectorized

    big_id = np.array([1 << 43], np.int64)
    with pytest.raises(ValueError, match="doc_id"):
        _segments_vectorized(big_id, pa.array(["a b c"]), seg_words=2,
                             seg_shift=20, fingerprint="xxh128")
    many_segs = pa.array([" ".join("t" for _ in range(8))])
    with pytest.raises(ValueError, match="segments"):
        _segments_vectorized(np.array([1], np.int64), many_segs,
                             seg_words=1, seg_shift=2,
                             fingerprint="xxh128")


def test_md5_bucket_rejects_wrong_width():
    from kgrecrun.ops.dedup import _md5_bucket

    with pytest.raises(ValueError, match="fixed_size_binary"):
        _md5_bucket(pa.array([b"12345678"], pa.binary(8)), 16)
