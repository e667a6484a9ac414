"""End-to-end KG pipeline tests: triple P/R ≥ 0.95 vs planted ground
truth (surface level and canonical-cluster level), canonicalization
exactness, and unit tests for the stage kernels.
"""

import pyarrow.parquet as pq
import pytest

from kgrecrun.corpus import synthgen
from kgrecrun.kg import canon
from kgrecrun.kg.link import EntityLinker
from kgrecrun.kg.openie import TripleExtractor, split_sentences
from kgrecrun.kg.resources import KGResources

N_DOCS = 300


def prf(predicted: set, expected: set):
    tp = len(predicted & expected)
    p = tp / len(predicted) if predicted else 0.0
    r = tp / len(expected) if expected else 0.0
    return p, r


def test_split_sentences():
    assert split_sentences("One two three. Four five six.") == [
        "One two three.", "Four five six."
    ]
    assert split_sentences("A. Haddad founded Helix Labs. Next one.") == [
        "A. Haddad founded Helix Labs.", "Next one."
    ]
    assert split_sentences("X acquired Granite Holdings Inc.. The rest.") == [
        "X acquired Granite Holdings Inc..", "The rest."
    ]


def test_triple_extractor_unit():
    w = synthgen.get_world(42)
    res = KGResources.from_world(w)
    ex = TripleExtractor(res)
    e_person = w.by_type["person"][0]
    e_org = w.by_type["org"][0]
    text = (
        f"Noise sentence first. {e_person.canonical} founded {e_org.canonical}. "
        "The weather was mild."
    )
    rows = ex.extract_from_text("u", text)
    assert rows == [("u", e_person.canonical, "founded", e_org.canonical, 1.0)]
    # unknown argument → not emitted (precision-first)
    assert ex.extract_from_text("u", "Bogus Name founded Nothing Corp.") == []


def test_linker_unit():
    w = synthgen.get_world(42)
    res = KGResources.from_world(w)
    linker = EntityLinker(res)
    for e in w.entities[:30]:
        for surface in e.aliases:
            eid, score = linker.link(surface.lower())
            assert eid == e.entity_id, (surface, eid)
    assert linker.link("completely unknown thing") == (None, 0.0)


def test_names_match():
    assert canon.names_match("Summit Labs", "Summit Labs Inc.")
    assert canon.names_match("Willow Industries", "Willow Industries Incorporated")
    assert canon.names_match("Riverton Analytics", "Riverton Aalytics")
    assert not canon.names_match("Jorvale", "Norvale")
    assert not canon.names_match("Ivan Petrov", "Joan Petrov")
    assert not canon.names_match("Cinder Analytics", "Ember Analytics")


@pytest.mark.usefixtures("ray_session")
def test_canonicalize_matches_gold():
    import ray.data

    w = synthgen.get_world(42)
    entities_ds = ray.data.from_arrow(w.entity_table().select(["entity_id", "canonical"]))
    mapping = canon.canonicalize(entities_ds)
    for eid, root in w.gold_clusters.items():
        assert mapping.get(eid, eid) == root, (eid, mapping.get(eid, eid), root)


@pytest.fixture(scope="module")
def kg_run(ray_session, tmp_path_factory):
    import ray.data

    from kgrecrun.runtime.pipeline import kg_pipeline

    tmp = tmp_path_factory.mktemp("kgcorpus")
    synthgen.write_corpus(str(tmp), n_docs=N_DOCS, seed=42)
    w = synthgen.get_world(42)
    pages = ray.data.read_parquet(str(tmp / "pages"))
    out = kg_pipeline(pages, w.entity_table())
    expected = pq.read_table(str(tmp / "triples_expected"))
    return out, expected, w


def test_surface_triples_pr(kg_run):
    out, expected, _ = kg_run
    raw = out["triples_raw"].to_pandas()
    predicted = set(zip(raw["subj_surface"], raw["pred"], raw["obj_surface"]))
    exp = set(
        zip(
            expected["subj_surface"].to_pylist(),
            expected["pred"].to_pylist(),
            expected["obj_surface"].to_pylist(),
        )
    )
    p, r = prf(predicted, exp)
    assert p >= 0.95, f"surface precision {p:.3f}"
    assert r >= 0.95, f"surface recall {r:.3f}"


def test_canonical_triples_pr(kg_run):
    out, expected, _ = kg_run
    final = out["triples"].to_pandas()
    predicted = set(zip(final["subj"], final["pred"], final["obj"]))
    exp = set(
        zip(
            expected["subj_root"].to_pylist(),
            expected["pred"].to_pylist(),
            expected["obj_root"].to_pylist(),
        )
    )
    p, r = prf(predicted, exp)
    assert p >= 0.95, f"canonical precision {p:.3f}"
    assert r >= 0.95, f"canonical recall {r:.3f}"
    assert (final["n_sources"] >= 1).all()


def test_mentions_found(kg_run):
    out, expected, _ = kg_run
    mentions = out["mentions"].to_pandas()
    assert len(mentions) > 0
    # every planted subject surface should be among detected mentions
    planted = set(s.lower() for s in expected["subj_surface"].to_pylist())
    found = set(mentions["norm"])
    missing = planted - found
    assert len(missing) <= 0.02 * len(planted), f"missing mentions: {list(missing)[:10]}"


@pytest.mark.usefixtures("ray_session")
def test_distributed_cc_matches_unionfind():
    import pyarrow as pa
    import ray.data

    from kgrecrun.kg.unionfind import UnionFind, connected_components_distributed

    # a 9-node chain (worst case for propagation), a triangle, an isolated pair
    edges = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"), ("e", "f"),
             ("f", "g"), ("g", "h"), ("h", "i"),
             ("x", "y"), ("y", "z"), ("x", "z"),
             ("p", "q")]
    uf = UnionFind()
    for a, b in edges:
        uf.union(a, b)
    want = uf.components()

    ds = ray.data.from_arrow(
        pa.table({"src": [e[0] for e in edges], "dst": [e[1] for e in edges]})
    )
    got_df = connected_components_distributed(ds).to_pandas()
    got = dict(zip(got_df["node"], got_df["label"]))
    assert got == want, (got, want)


def test_ac_matcher_crossover_vs_regex():
    """The Aho-Corasick path must be BIT-IDENTICAL to the regex
    alternation on the sf0.01 corpus texts (and on adversarial edge
    cases: overlapping surfaces, shared prefixes, boundary rejections,
    case folds, resume-at-match-end)."""
    from kgrecrun.corpus import synthgen, world
    from kgrecrun.extract.events import html_to_events
    from kgrecrun.extract.kernel import Kernel
    from kgrecrun.kg.ner import ACMatcher, build_matcher

    # adversarial gazetteer: prefixes of each other, multi-word,
    # digit boundaries, case variants
    surfaces = ["Ann", "Ann Arbor", "Ann Arbor MI", "arbor", "BOR",
                "x9", "x99", "Meridian", "Meridian Systems", "n A"]
    rx = build_matcher(surfaces)
    ac = ACMatcher(surfaces)
    cases = [
        "Ann Arbor MI is in Ann Arbor; an arbor, annarbor, ANN ARBOR.",
        "x9 x99 x999 ax9 meridian systems at Meridian. n a? n A!",
        "",
        "arborarbor arbor ARBOR9 (arbor)",
        "Ann Arbor M",  # longest fails only at the very end
    ]
    for text in cases:
        want = [m.span() for m in rx.finditer(text)]
        got = ac.finditer(text)
        assert got == want, f"{text!r}: {got} != {want}"

    # corpus crossover: 150 extracted article texts, full gazetteer
    w = world.build_world(42)
    gaz = list(w.alias_dictionary().keys())
    rx = build_matcher(gaz)
    ac = ACMatcher(gaz)
    kernel = Kernel()
    n_matches = 0
    for doc_id in range(150):
        row, _ = synthgen.gen_page_row(42, doc_id, w)
        text = kernel.get_article(html_to_events(row["html"]))["text"]
        want = [m.span() for m in rx.finditer(text)]
        assert ac.finditer(text) == want, f"doc {doc_id} diverged"
        n_matches += len(want)
    assert n_matches > 500  # the corpus actually exercises the matcher
