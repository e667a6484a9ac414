"""CCNet-style integer-exact LM quality filter tests
(kgrecrun/ops/lmfilter.py)."""

import pyarrow as pa
import pytest

from kgrecrun.ops.lmfilter import SCALE, lm_quality_scores, train_bigram_model


def _docs(texts):
    import ray.data

    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    }))


def test_model_counts_hand_checked(ray_session):
    c2, c1, v = train_bigram_model(_docs(["a b a b", "a b c", ""]))
    assert v == 3  # {a, b, c}
    assert c2 == {("a", "b"): 3, ("b", "a"): 1, ("b", "c"): 1}
    assert c1 == {"a": 3, "b": 2}


def test_scores_hand_checked(ray_session):
    """Corpus 'a b a b' + 'a b c': V=3, c1(a)=3, c1(b)=2.
    surprise(a,b) = S*(3+3)//(3+1) = 1.5S; surprise(b,a) = S*(2+3)//2
    = 2.5S; surprise(b,c) = 2.5S."""
    out = (lm_quality_scores(_docs(["a b a b", "a b c", ""]),
                             threshold_fp=2 * SCALE)
           .to_pandas().set_index("doc_id"))
    # doc0: bigrams ab, ba, ab -> (1.5+2.5+1.5)S // 3
    assert out.loc[0, "n_bigrams"] == 3
    assert out.loc[0, "score_fp"] == (3 * SCALE // 2 + 5 * SCALE // 2
                                      + 3 * SCALE // 2) // 3
    # doc1: ab, bc -> (1.5+2.5)S // 2 = 2S
    assert out.loc[1, "score_fp"] == 2 * SCALE
    # doc2: no bigrams -> score 0, kept
    assert out.loc[2, "n_bigrams"] == 0
    assert out.loc[2, "score_fp"] == 0
    assert out.loc[2, "keep"] == 1
    # threshold verdicts: doc0 score ~1.83S <= 2S keep; doc1 == 2S keep
    assert out.loc[0, "keep"] == 1
    assert out.loc[1, "keep"] == 1


def test_rare_continuations_score_higher(ray_session):
    """The filter property: a doc of common bigrams scores lower than a
    doc whose continuations the model has never seen dominate."""
    corpus = ["the cat sat on the mat"] * 20 + ["the zzq vqx the cat"]
    out = (lm_quality_scores(_docs(corpus))
           .to_pandas().set_index("doc_id"))
    common = out.loc[0, "score_fp"]
    weird = out.loc[20, "score_fp"]
    assert weird > common


def test_model_bound_raises(ray_session):
    with pytest.raises(ValueError, match="max_model_rows"):
        train_bigram_model(
            _docs(["w%d w%d" % (i, i + 1) for i in range(40)]),
            max_model_rows=10)
