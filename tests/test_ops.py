"""Training-data ops: text analysis, the dedup family, similarity
search, multimodal stubs. Behavioral tests use planted duplicates; the
driver's read-only testdata tables are used where real data helps.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from kgrecrun.ops import ann, dedup, media, text as optext

SF_DIR = "/root/testdata/sf0.001"


def _docs_table(texts, ids=None):
    ids = ids if ids is not None else list(range(len(texts)))
    return pa.table({"doc_id": pa.array(ids, pa.int64()), "text": pa.array(texts, pa.string())})


BASE = (
    "the quick brown fox jumps over the lazy dog while the committee "
    "reviews the annual report on river levels and infrastructure funding "
    "across twelve districts during the third consecutive year of decline "
    "with observers from neighbouring regions filing written remarks before "
    "the deadline and several agencies preparing corrected bulletins for "
    "publication in the spring alongside revised gauge calibration tables"
)
NEAR = BASE.replace("annual report", "yearly report")
FAR = (
    "completely different content about orchestras rehearsing symphonies "
    "in the concert hall every evening with brass woodwind and string "
    "sections preparing for the winter festival season program"
)


def test_token_counts_and_fingerprints():
    t = _docs_table(["a b  c", "", "  ", "one"])
    out = optext.token_counts(t)
    assert out["n_tokens"].to_pylist() == [3, 0, 0, 1]
    fp = optext.fingerprints(_docs_table(["Hello  World", "hello world", "other"]))
    fps = fp["fingerprint"].to_pylist()
    assert fps[0] == fps[1] != fps[2]


def test_quality_scores():
    out = optext.quality_scores(_docs_table(["Short, sharp. Sentence!", ""]))
    assert out["n_chars_text"].to_pylist()[0] == 23
    assert out["punct_ratio"].to_pylist()[0] == pytest.approx(3 / 23)
    assert out["punct_ratio"].to_pylist()[1] == 0.0


def test_lang_id_on_corpus():
    from kgrecrun.corpus import synthgen

    pages, _ = synthgen.gen_batch(range(200), 42)
    correct = sum(
        1
        for t, lang in zip(pages["text"].to_pylist(), pages["lang"].to_pylist())
        if optext.lang_id_text(t) == lang
    )
    assert correct / pages.num_rows >= 0.97


@pytest.mark.usefixtures("ray_session")
def test_exact_dedup():
    import ray.data

    t = _docs_table([BASE, FAR, BASE, "  " + BASE + " ", NEAR], ids=[10, 11, 12, 13, 14])
    result = dedup.exact_dedup(ray.data.from_arrow(t)).to_pandas()
    m = dict(zip(result["doc_id"], result["root_id"]))
    assert m[10] == m[12] == m[13] == 10  # normalization folds whitespace
    assert m[11] == 11 and m[14] == 14


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("fn", [dedup.minhash_dedup, dedup.simhash_dedup, dedup.ngram_jaccard_dedup])
def test_near_dedup_variants(fn):
    import ray.data

    t = _docs_table([BASE, NEAR, FAR, BASE + " extra trailing words here"], ids=[0, 1, 2, 3])
    result = fn(ray.data.from_arrow(t)).to_pandas()
    m = dict(zip(result["doc_id"], result["root_id"]))
    assert m[1] == 0, f"near-dup not merged by {fn.__name__}: {m}"
    assert m[2] == 2, f"distinct doc merged by {fn.__name__}: {m}"
    kept_ids = set(dedup.kept(fn(ray.data.from_arrow(t))).to_pandas()["doc_id"])
    assert 2 in kept_ids and 0 in kept_ids and 1 not in kept_ids


@pytest.mark.usefixtures("ray_session")
def test_embedding_dedup():
    import ray.data

    rng = np.random.RandomState(3)
    base = rng.standard_normal((20, 16))
    vecs = list(base) + [base[0] + 1e-3 * rng.standard_normal(16)]
    t = pa.table(
        {
            "vec_id": pa.array(range(21), pa.int64()),
            "embedding": pa.array([v.tolist() for v in vecs], pa.list_(pa.float32())),
        }
    )
    result = dedup.embedding_dedup(ray.data.from_arrow(t)).to_pandas()
    m = dict(zip(result["vec_id"], result["root_id"]))
    assert m[20] == 0
    assert sum(1 for k, v in m.items() if k != v) == 1


@pytest.mark.usefixtures("ray_session")
def test_brute_force_topk_matches_numpy():
    import ray.data

    embeds = ray.data.read_parquet(f"{SF_DIR}/embeddings.parquet")
    table = embeds.to_pandas()
    mat = np.array(table["embedding"].tolist(), dtype=np.float64)
    mat_n = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    queries = mat[:3]
    result = ann.brute_force_topk(
        ray.data.read_parquet(f"{SF_DIR}/embeddings.parquet"), queries, [0, 1, 2], k=10
    ).to_pandas()
    for qi in range(3):
        scores = mat_n @ (queries[qi] / np.linalg.norm(queries[qi]))
        order = np.lexsort((table["vec_id"].to_numpy(), -scores))[:10]
        expected = [int(table["vec_id"].iloc[j]) for j in order]
        got = list(
            result[result["query_id"] == qi].sort_values("rank")["vec_id"]
        )
        assert got == expected, f"query {qi}: {got} != {expected}"


@pytest.mark.usefixtures("ray_session")
def test_ivf_recall():
    import ray.data

    embeds = ray.data.read_parquet(f"{SF_DIR}/embeddings.parquet")
    sample = np.array(embeds.take_batch(200, batch_format="pyarrow")["embedding"].to_pylist())
    index = ann.IVFIndex(n_centroids=8, n_iters=5).fit(sample)
    assigned = index.assign_stage(ray.data.read_parquet(f"{SF_DIR}/embeddings.parquet"))
    queries = sample[:3]
    approx = index.search(assigned, queries, [0, 1, 2], k=10, n_probe=3).to_pandas()
    exact = ann.brute_force_topk(
        ray.data.read_parquet(f"{SF_DIR}/embeddings.parquet"), queries, [0, 1, 2], k=10
    ).to_pandas()
    recalls = []
    for qi in range(3):
        a = set(approx[approx["query_id"] == qi]["vec_id"])
        e = set(exact[exact["query_id"] == qi]["vec_id"])
        recalls.append(len(a & e) / len(e))
    assert np.mean(recalls) >= 0.8, recalls


@pytest.mark.usefixtures("ray_session")
def test_media_stage():
    import ray.data

    t = media.synth_media_batch(range(30))
    out = media.decode_media(ray.data.from_arrow(t)).to_pandas()
    assert len(out) == 30
    assert out["error"].isna().all()
    assert set(out["kind"]) == {"image", "audio"}
    assert all(len(f) == 64 for f in out["features"])
    # a codec-less container (GIF) is a clearly-marked seam; a truncated
    # JPEG and a corrupt PNG error per-row — none crashes the stage
    bad = pa.table(
        {
            "media_id": pa.array([99, 100, 101], pa.int64()),
            "kind": pa.array(["image", "image", "image"], pa.string()),
            "payload": pa.array(
                [b"GIF89a......gif", b"\x89PNG\r\n\x1a\n.....",
                 b"\xff\xd8\xff\xe0....jpeg"],
                pa.large_binary()),
            "width": pa.array([0, 0, 0], pa.int32()),
            "height": pa.array([0, 0, 0], pa.int32()),
            "sample_rate": pa.array([0, 0, 0], pa.int32()),
            "url": pa.array(["x", "y", "z"], pa.string()),
        }
    )
    out_bad = media.decode_media(ray.data.from_arrow(bad)).to_pandas()
    assert "codec" in out_bad["error"].iloc[0]
    assert out_bad["error"].iloc[1] is not None
    assert out_bad["error"].iloc[2] is not None  # malformed JPEG, per-row


@pytest.mark.usefixtures("ray_session")
def test_sessionize_events_matches_duckdb():
    import duckdb

    from kgrecrun.ops import window as W

    got = (
        W.sessionize_events(SF_DIR)
        .to_pandas()
        .sort_values(["user_id", "session_no"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF_DIR}/events.parquet')"
    )
    want = con.execute(
        """
        WITH ordered AS (
            SELECT user_id, event_id, ts, CAST(round(value*100) AS BIGINT) AS cents,
                   CASE WHEN lag(ts) OVER w IS NULL
                             OR ts - lag(ts) OVER w > INTERVAL 30 MINUTES
                        THEN 1 ELSE 0 END AS is_new
            FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ), numbered AS (
            SELECT *, SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                        ROWS UNBOUNDED PRECEDING) AS session_no
            FROM ordered
        )
        SELECT user_id, session_no, COUNT(*) AS n_events, SUM(cents) AS sum_value_cents,
               (epoch_us(MAX(ts)) - epoch_us(MIN(ts))) // 1000000 AS duration_sec
        FROM numbered GROUP BY user_id, session_no
        ORDER BY user_id, session_no
        """
    ).fetchdf()
    assert got["n_events"].sum() == want["n_events"].sum()
    assert got[["user_id", "session_no", "n_events", "sum_value_cents", "duration_sec"]].equals(
        want.astype({"user_id": "int64", "session_no": "int64", "n_events": "int64",
                     "sum_value_cents": "int64", "duration_sec": "int64"})
    )


@pytest.mark.usefixtures("ray_session")
def test_top_parts_per_brand():
    from kgrecrun.ops import window as W

    got = W.top_parts_per_brand(SF_DIR, k=3).to_pandas()
    assert set(got["rnk"]) == {1, 2, 3}
    # every brand's rank-1 price >= rank-2 >= rank-3
    for _, grp in got.groupby("p_brand"):
        prices = grp.sort_values("rnk")["p_retailprice"].tolist()
        assert prices == sorted(prices, reverse=True)


@pytest.mark.usefixtures("ray_session")
def test_salted_groupby_under_extreme_skew():
    import ray.data

    from kgrecrun.ops.skew import salted_count_sum

    # one key owns 90% of rows — the salted two-phase result must equal
    # a plain pandas groupby
    n = 5000
    keys = ["hot"] * (n - 500) + [f"k{i}" for i in range(500)]
    vals = list(range(n))
    t = pa.table({"k": pa.array(keys), "v": pa.array(vals, pa.int64())})
    got = (
        salted_count_sum(ray.data.from_arrow(t), "k", sum_col="v", salts=8)
        .to_pandas()
        .set_index("k")
        .sort_index()
    )
    import pandas as pd

    want = (
        pd.DataFrame({"k": keys, "v": vals})
        .groupby("k")
        .agg(n=("v", "size"), total=("v", "sum"))
        .sort_index()
    )
    assert got["n"].tolist() == want["n"].tolist()
    assert got["total"].tolist() == want["total"].tolist()


@pytest.mark.usefixtures("ray_session")
def test_near_dedup_distributed_path_matches_driver_path():
    """edge_threshold=0 forces the distributed-CC + cogroup-apply path;
    its (doc_id, root_id) output must equal the driver union-find path
    exactly."""
    import ray.data

    texts = [BASE, NEAR, FAR, BASE + " extra trailing words here",
             NEAR + " tail", "totally different content about trains and stations"]
    t = _docs_table(texts, ids=[0, 1, 2, 3, 4, 5])
    driver = dedup.minhash_dedup(ray.data.from_arrow(t)).to_pandas()
    dist = dedup.minhash_dedup(ray.data.from_arrow(t), edge_threshold=0).to_pandas()
    md = dict(zip(driver["doc_id"], driver["root_id"]))
    mm = dict(zip(dist["doc_id"], dist["root_id"]))
    assert md == mm, (md, mm)


@pytest.mark.usefixtures("ray_session")
def test_distributed_cc_stress_one_million_pairs():
    """VERDICT r1 item 4: >=10^6 synthetic duplicate pairs through the
    distributed CC without any driver dict — labels must be exact for
    every node (2-cliques + a few longer chains)."""
    import ray.data

    from kgrecrun.kg.unionfind import connected_components_distributed

    n_pairs = 1_000_000
    a = np.arange(0, 2 * n_pairs, 2, dtype=np.int64)
    # a handful of 5-edge chains on top, offset past the pair ids
    base = 10_000_000 + np.arange(0, 64 * 6, 6, dtype=np.int64)
    srcs = np.concatenate([a] + [base + k for k in range(5)])
    dsts = np.concatenate([a + 1] + [base + k + 1 for k in range(5)])
    ds = ray.data.from_arrow(pa.table({"src": srcs, "dst": dsts})).repartition(8)
    df = connected_components_distributed(ds).to_pandas()
    assert len(df) == 2 * n_pairs + 64 * 6
    pairs = df[df.node < 10_000_000]
    assert (pairs["label"].values == (pairs["node"].values // 2) * 2).all()
    chains = df[df.node >= 10_000_000]
    assert (chains["label"].values
            == ((chains["node"].values - 10_000_000) // 6) * 6 + 10_000_000).all()


@pytest.mark.usefixtures("ray_session")
def test_ivf_strict_probing_equals_per_query_runs():
    """strict=True batch semantics must equal running each query alone
    (VERDICT r1 item 8); union mode may only ADD candidates."""
    import ray.data

    embeds = ray.data.read_parquet(f"{SF_DIR}/embeddings.parquet")
    sample = np.array(embeds.take_batch(200, batch_format="pyarrow")["embedding"].to_pylist())
    index = ann.IVFIndex(n_centroids=8, n_iters=5).fit(sample)
    assigned = index.assign_stage(ray.data.read_parquet(f"{SF_DIR}/embeddings.parquet"))
    queries = sample[:3]

    batched = index.search(assigned, queries, [0, 1, 2], k=10, n_probe=2).to_pandas()
    for qi in range(3):
        solo = index.search(
            assigned, queries[qi:qi + 1], [qi], k=10, n_probe=2
        ).to_pandas()
        got = list(batched[batched["query_id"] == qi].sort_values("rank")["vec_id"])
        want = list(solo.sort_values("rank")["vec_id"])
        assert got == want, f"query {qi}: batched {got} != solo {want}"

    union = index.search(
        assigned, queries, [0, 1, 2], k=10, n_probe=2, strict=False
    ).to_pandas()
    for qi in range(3):
        s = batched[batched["query_id"] == qi]
        u = union[union["query_id"] == qi]
        # every strict hit scores at least as well as the union's kth
        assert set(s["vec_id"]).issubset(set(u["vec_id"])) or len(u) == 10


@pytest.mark.usefixtures("ray_session")
def test_hash_sample_and_split_deterministic():
    import hashlib

    import ray.data

    from kgrecrun.ops.sample import hash_sample, hash_split

    t = pa.table({"doc_id": pa.array(range(200), pa.int64())})
    got = sorted(hash_sample(ray.data.from_arrow(t), numer=1, denom=4).to_pandas()["doc_id"])
    want = [i for i in range(200)
            if int.from_bytes(hashlib.md5(str(i).encode()).digest()[:8], "little") % 4 < 1]
    assert got == want
    # split: complete, non-overlapping, stable across two runs
    s1 = hash_split(ray.data.from_arrow(t), splits={"train": 8, "val": 1, "test": 1}).to_pandas()
    s2 = hash_split(ray.data.from_arrow(t), splits={"train": 8, "val": 1, "test": 1}).to_pandas()
    assert len(s1) == 200 and set(s1["split"]) <= {"train", "val", "test"}
    assert dict(zip(s1.doc_id, s1.split)) == dict(zip(s2.doc_id, s2.split))


@pytest.mark.usefixtures("ray_session")
def test_pack_by_token_budget_matches_serial_prefix_sum():
    import ray.data

    from kgrecrun.ops.pack import pack_by_token_budget

    rng = np.random.RandomState(7)
    ntok = rng.randint(1, 500, size=300).astype(np.int64)
    t = pa.table({"doc_id": pa.array(range(300), pa.int64()),
                  "n_tokens": pa.array(ntok, pa.int64())})
    # small range_size so several ranges + offsets are exercised
    got = pack_by_token_budget(
        ray.data.from_arrow(t).repartition(5), budget=1000, range_size=32
    ).to_pandas().sort_values("doc_id")
    prior = np.concatenate(([0], np.cumsum(ntok)[:-1]))
    assert (got["shard_id"].values == prior // 1000).all()
    # every shard except the last crosses the budget boundary exactly once
    assert got["shard_id"].is_monotonic_increasing


@pytest.mark.usefixtures("ray_session")
def test_term_stats_and_postings():
    import ray.data

    from kgrecrun.ops.index import postings, term_stats

    docs = ["the cat sat", "the dog sat", "the cat ran far"]
    t = _docs_table(docs, ids=[0, 1, 2])
    ds = ray.data.from_arrow(t).repartition(3)
    stats = term_stats(ds).to_pandas().set_index("term")
    assert int(stats.loc["the", "df"]) == 3 and int(stats.loc["the", "tf"]) == 3
    assert int(stats.loc["cat", "df"]) == 2 and int(stats.loc["sat", "tf"]) == 2
    assert int(stats.loc["far", "df"]) == 1
    p = postings(ds, max_df=2).to_pandas().set_index("term")
    assert "the" not in p.index  # capped out
    assert list(p.loc["cat", "doc_ids"]) == [0, 2]
    assert int(p.loc["ran", "df"]) == 1


@pytest.mark.usefixtures("ray_session")
def test_tfidf_top_terms():
    """Integer tf-idf ordering: tf DESC, then df ASC (rarer wins the
    tie), then term ASC; rank is dense per doc and capped at k."""
    import ray.data

    from kgrecrun.ops.index import tfidf_top_terms

    docs = ["cat cat dog zebra", "dog dog cat", "cat mouse mouse zebra"]
    t = _docs_table(docs, ids=[0, 1, 2])
    ds = ray.data.from_arrow(t).repartition(3)
    got = tfidf_top_terms(ds, k=2).to_pandas()
    by_doc = {d: list(zip(g["term"], g["tf"], g["df"], g["rank"]))
              for d, g in got.sort_values(["doc_id", "rank"]).groupby("doc_id")}
    # doc 0: cat tf=2 first; tie tf=1 among dog (df=2) and zebra (df=2)
    #        → term ASC picks dog
    assert by_doc[0] == [("cat", 2, 3, 1), ("dog", 1, 2, 2)]
    # doc 1: dog tf=2; cat tf=1
    assert by_doc[1] == [("dog", 2, 2, 1), ("cat", 1, 3, 2)]
    # doc 2: mouse tf=2 (df=1); tie tf=1: zebra df=2 vs cat df=3 → zebra
    assert by_doc[2] == [("mouse", 2, 1, 1), ("zebra", 1, 2, 2)]


def test_bmp_wav_codecs_roundtrip():
    from kgrecrun.ops import media as M

    rng = np.random.RandomState(11)
    # width NOT a multiple of 4 → exercises row padding; odd height too
    gray = rng.randint(0, 256, size=(13, 21), dtype=np.uint8)
    assert (M.decode_bmp(M.encode_bmp(gray)) == gray).all()
    samples = rng.randint(-(2**15), 2**15, size=1234, dtype=np.int16)
    got, sr = M.decode_wav(M.encode_wav(samples, 8000))
    assert sr == 8000 and (got == samples).all()
    # hand-built 2x1 top-row-white BMP: decode must un-flip bottom-up rows
    two = np.array([[255], [0]], dtype=np.uint8)
    assert (M.decode_bmp(M.encode_bmp(two)) == two).all()


def test_decode_media_real_and_unknown_payloads():
    from kgrecrun.ops import media as M

    t = M.synth_media_batch([0, 1, 2, 3])  # wav, bmp, png, legacy fakeimg
    out = M.DecodeMedia()(t)
    assert out["error"].to_pylist() == [None, None, None, None]
    assert out["kind"].to_pylist() == ["audio", "image", "image", "image"]
    # an unknown container lands in the error column, row preserved
    bad = t.set_column(2, "payload", pa.array(
        [b"\x89PNG....", b"BM", b"x", b"RIFFxxxxWAVE"], pa.large_binary()))
    out2 = M.DecodeMedia()(bad)
    assert all(e is not None for e in out2["error"].to_pylist())
    assert out2.num_rows == 4


def test_scrub_pii_redacts_and_counts():
    batch = _docs_table(
        [
            "contact alice@example.com or bob.smith+tag@sub.domain.org today",
            "server at 192.168.1.7 and 10.0.0.255 responded",
            "call +1-555-0100-223 or 5550100223 now",
            "no pii here at all",
        ]
    )
    out = optext.scrub_pii(batch)
    assert out["n_email"].to_pylist() == [2, 0, 0, 0]
    assert out["n_ip"].to_pylist() == [0, 2, 0, 0]
    assert out["n_phone"].to_pylist() == [0, 0, 2, 0]
    clean = out["clean_text"].to_pylist()
    assert clean[0] == "contact [EMAIL] or [EMAIL] today"
    assert clean[1] == "server at [IP] and [IP] responded"
    assert "[PHONE]" in clean[2] and not any(ch.isdigit() for ch in clean[2])
    assert clean[3] == "no pii here at all"


@pytest.mark.usefixtures("ray_session")
def test_asof_join_matches_bruteforce():
    import ray.data

    from kgrecrun.ops.temporal import asof_join

    rng = np.random.RandomState(7)
    n_l, n_r = 400, 120
    lk = rng.randint(0, 8, n_l)
    lt = rng.randint(0, 10_000, n_l).astype(np.int64) * 1_000_000
    rk = rng.randint(0, 10, n_r)  # keys 8,9 have no left rows
    rt = rng.randint(0, 10_000, n_r).astype(np.int64) * 1_000_000
    rt[:20] = rt[20:40]  # force right-side ts ties within keys
    left = pa.table(
        {
            "k": pa.array(lk, pa.int64()),
            "lts": pa.array(lt, pa.int64()).cast(pa.timestamp("us")),
            "lid": pa.array(np.arange(n_l), pa.int64()),
        }
    )
    right = pa.table(
        {
            "k": pa.array(rk, pa.int64()),
            "rts": pa.array(rt, pa.int64()).cast(pa.timestamp("us")),
            "rid": pa.array(np.arange(n_r), pa.int64()),
        }
    )
    got = (
        asof_join(
            ray.data.from_arrow(left).repartition(5),
            ray.data.from_arrow(right).repartition(3),
            key="k",
            left_ts="lts",
            right_ts="rts",
            right_tie="rid",
            left_cols=["lid"],
            right_cols=["rts", "rid"],
        )
        .to_pandas()
        .sort_values("lid")
        .reset_index(drop=True)
    )
    # brute force: per left row, latest prior right row, max rid on ties
    want = {}
    for i in range(n_l):
        best = None
        for j in range(n_r):
            if rk[j] == lk[i] and rt[j] <= lt[i]:
                cand = (rt[j], j)
                if best is None or cand > best:
                    best = cand
        if best is not None:
            want[i] = best
    assert got["lid"].tolist() == sorted(want)
    for _, row in got.iterrows():
        bt, bj = want[row["lid"]]
        assert row["rts"] == bt and row["rid"] == bj


@pytest.mark.usefixtures("ray_session")
def test_hopping_window_each_event_in_two_windows():
    import ray.data

    from kgrecrun.ops.temporal import hopping_window_agg

    hour = 3600 * 1_000_000
    ts = pa.array([0, hour // 2, hour, 3 * hour + 1], pa.int64()).cast(pa.timestamp("us"))
    t = pa.table(
        {
            "ts": ts,
            "event_type": pa.array(["a", "a", "a", "b"], pa.string()),
            "value": pa.array([1.0, 2.0, 3.0, 4.0], pa.float64()),
        }
    )
    out = (
        hopping_window_agg(ray.data.from_arrow(t))
        .to_pandas()
        .sort_values(["event_type", "window_start_us"])
        .reset_index(drop=True)
    )
    # every event contributes to exactly width/hop = 2 windows
    assert out["n_events"].sum() == 2 * t.num_rows
    rows = {
        (r.event_type, r.window_start_us): (r.n_events, r.sum_value_cents)
        for r in out.itertuples()
    }
    assert rows[("a", -hour)] == (2, 300)        # window [-1h, 1h): events 0,1
    assert rows[("a", 0)] == (3, 600)            # [0, 2h): events 0,1,2
    assert rows[("a", hour)] == (1, 300)         # [1h, 3h): event 2
    assert rows[("b", 2 * hour)] == (1, 400)
    assert rows[("b", 3 * hour)] == (1, 400)


@pytest.mark.usefixtures("ray_session")
def test_group_quantiles_matches_numpy():
    import ray.data

    from kgrecrun.ops.stats import group_quantiles

    rng = np.random.RandomState(3)
    keys = rng.choice(list("xyz"), 5000)
    vals = rng.randint(0, 2000, 5000)  # heavy value collisions → real histogram
    t = pa.table({"g": pa.array(keys), "v": pa.array(vals, pa.int64())})
    out = (
        group_quantiles(
            ray.data.from_arrow(t).repartition(7),
            key="g",
            value_cents=lambda b: b["v"],
        )
        .to_pandas()
        .set_index(["g", "q"])["qv"]
    )
    for g in "xyz":
        sub = np.sort(vals[keys == g])
        for q in (0.25, 0.5, 0.75):
            assert out[(g, q)] == np.percentile(sub, q * 100)


@pytest.mark.usefixtures("ray_session")
def test_semi_anti_join_paths_agree_and_partition():
    import ray.data

    from kgrecrun.ops.joins import anti_join, semi_join

    rng = np.random.RandomState(11)
    left = pa.table(
        {
            "k": pa.array(rng.randint(0, 50, 300), pa.int64()),
            "payload": pa.array(rng.randint(0, 10**9, 300), pa.int64()),
        }
    )
    right = pa.table({"k": pa.array(rng.randint(25, 60, 80), pa.int64())})
    lds = ray.data.from_arrow(left).repartition(4)
    rds = ray.data.from_arrow(right).repartition(3)

    def rows(ds):
        return sorted(map(tuple, ds.to_pandas().itertuples(index=False)))

    semi_bc = rows(semi_join(lds, rds, "k", broadcast_threshold=10_000))
    semi_cg = rows(semi_join(lds, rds, "k"))
    anti_bc = rows(anti_join(lds, rds, "k", broadcast_threshold=10_000))
    anti_cg = rows(anti_join(lds, rds, "k"))
    assert semi_bc == semi_cg and anti_bc == anti_cg
    # semi + anti partition the left side exactly
    assert sorted(semi_bc + anti_bc) == sorted(map(tuple, left.to_pandas().itertuples(index=False)))
    rset = set(right["k"].to_pylist())
    assert all(r[0] in rset for r in semi_bc)
    assert all(r[0] not in rset for r in anti_bc)


@pytest.mark.usefixtures("ray_session")
def test_bloom_join_exact_and_prefilter():
    """bloom_semi/anti_join are bit-identical to the plain paths on both
    int and string keys (string path exercises the polars hash), the
    bloom prefilter has NO false negatives, and semi+anti partition."""
    import ray.data

    from kgrecrun.ops.joins import (
        _bloom_mask, anti_join, bloom_anti_join, bloom_semi_join,
        build_bloom, semi_join,
    )

    rng = np.random.RandomState(7)

    def rows(ds):
        return sorted(map(tuple, ds.to_pandas().itertuples(index=False)))

    for as_str in (False, True):
        lk = rng.randint(0, 4000, 1200)
        rk = rng.randint(3000, 7000, 500)
        conv = (lambda a: pa.array([f"k{v}" for v in a])) if as_str else (
            lambda a: pa.array(a, pa.int64()))
        left = pa.table({"k": conv(lk),
                         "payload": pa.array(rng.randint(0, 10**9, 1200), pa.int64())})
        right = pa.table({"k": conv(rk)})
        lds = ray.data.from_arrow(left).repartition(4)
        rds = ray.data.from_arrow(right).repartition(3)

        m_bits = 1 << 14
        semi_b = rows(bloom_semi_join(lds, rds, "k", m_bits=m_bits))
        anti_b = rows(bloom_anti_join(lds, rds, "k", m_bits=m_bits))
        assert semi_b == rows(semi_join(lds, rds, "k"))
        assert anti_b == rows(anti_join(lds, rds, "k"))
        # two-sided variant (right prefiltered by a bloom of the
        # positive slice) must be bit-identical
        assert rows(bloom_semi_join(lds, rds, "k", m_bits=m_bits,
                                    prefilter_right=True)) == semi_b
        assert rows(bloom_anti_join(lds, rds, "k", m_bits=m_bits,
                                    prefilter_right=True)) == anti_b
        assert sorted(semi_b + anti_b) == sorted(
            map(tuple, left.to_pandas().itertuples(index=False)))

        # no false negatives: every true match passes the bloom mask
        bloom = build_bloom(rds, "k", m_bits=m_bits)
        mask = _bloom_mask(left, "k", bloom, 4)
        true_match = np.isin(lk, rk) if not as_str else np.array(
            [f"k{v}" in {f"k{w}" for w in rk} for v in lk])
        assert mask[true_match].all()
        # and the prefilter actually prunes (most non-matches rejected)
        assert mask.sum() < len(lk) * 0.6

    # tiny saturated bloom still exact (all-positive degenerate case)
    lds = ray.data.from_arrow(pa.table({"k": pa.array(range(100), pa.int64())}))
    rds = ray.data.from_arrow(pa.table({"k": pa.array(range(50, 150), pa.int64())}))
    assert rows(bloom_semi_join(lds, rds, "k", m_bits=64)) == rows(
        semi_join(lds, rds, "k"))
    assert rows(bloom_anti_join(lds, rds, "k", m_bits=64)) == rows(
        anti_join(lds, rds, "k"))


@pytest.mark.usefixtures("ray_session")
def test_new_join_ops_empty_sides():
    """Empty-right edge cases: bloom semi → empty, bloom anti → whole
    left, skew join → empty; CEP with a never-matching pattern → all
    zero counts."""
    import ray.data

    from kgrecrun.ops.joins import bloom_anti_join, bloom_semi_join
    from kgrecrun.ops.skew import skew_join
    from kgrecrun.ops.window import event_sequence_pattern

    left = pa.table({"k": pa.array([1, 2, 3], pa.int64()),
                     "payload": pa.array([10, 20, 30], pa.int64())})
    empty = pa.table({"k": pa.array([], pa.int64()),
                      "attr": pa.array([], pa.int64())})
    lds = ray.data.from_arrow(left)
    rds = ray.data.from_arrow(empty)
    assert bloom_semi_join(lds, rds, "k").count() == 0
    assert sorted(r["k"] for r in bloom_anti_join(lds, rds, "k").take_all()) == [1, 2, 3]
    # two-sided variant with an empty positive slice (disjoint sets):
    # anti returns the whole left, semi nothing
    assert bloom_semi_join(lds, rds, "k", prefilter_right=True).count() == 0
    assert sorted(r["k"] for r in bloom_anti_join(
        lds, rds, "k", prefilter_right=True).take_all()) == [1, 2, 3]
    assert skew_join(lds, rds, key="k",
                     left_schema=left.schema, right_schema=empty.schema).count() == 0

    ev = pa.table({"u": pa.array([1, 1, 2], pa.int64()),
                   "t": pa.array([1, 2, 3], pa.int64()),
                   "i": pa.array([1, 2, 3], pa.int64()),
                   "c": pa.array(["v", "v", "c"])})
    out = event_sequence_pattern(
        ray.data.from_arrow(ev), key="u", ts_col="t", tiebreak_col="i",
        code_col="c", pattern="zz+").to_pandas()
    assert sorted(out["n_matches"]) == [0, 0]
    assert sorted(out["seq_len"]) == [1, 2]


@pytest.mark.usefixtures("ray_session")
def test_hll_distinct_accuracy_and_shard_invariance():
    """HLL estimates within ~3σ (≈5%) of the exact distinct count at
    cardinality far beyond linear counting's saturation, identical
    across blockings (register maxima are associative), and the
    small-range branch agrees with linear counting."""
    import ray.data

    from kgrecrun.ops.stats import hll_distinct

    # two groups: 120k-distinct (raw HLL branch) and 300-distinct
    # (small-range linear-counting branch); duplicated values
    n_big, n_small = 120_000, 300
    vals = np.concatenate([np.arange(n_big), np.arange(n_big // 2),
                           np.arange(n_small) + 10**9])
    grp = np.array(["big"] * (n_big + n_big // 2) + ["small"] * n_small)
    t = pa.table({"g": pa.array(grp), "v": pa.array(vals, pa.int64())})

    def run(blocks):
        ds = ray.data.from_arrow(t).repartition(blocks)
        out = hll_distinct(ds, key="g", value_col="v").to_pandas()
        return {r["g"]: (r["occupied"], r["est_distinct"])
                for _, r in out.iterrows()}

    a, b = run(3), run(11)
    assert a == b  # shard-invariant sketch
    assert abs(a["big"][1] - n_big) / n_big < 0.05
    assert abs(a["small"][1] - n_small) / n_small < 0.05
    # small group used the linear-counting correction exactly
    m, z = 4096, a["small"][0]
    assert a["small"][1] == pytest.approx(m * np.log(m / (m - z)), rel=1e-12)


@pytest.mark.usefixtures("ray_session")
def test_skew_join_matches_plain_join():
    """skew_join == bucket_join inner on Zipf-skewed keys, with right
    multiplicity, whether or not any key crosses the hot threshold."""
    import ray.data

    from kgrecrun.ops.cogroup import bucket_join
    from kgrecrun.ops.skew import skew_join

    rng = np.random.RandomState(3)
    k = rng.zipf(1.3, 8000) % 500
    left = pa.table({"k": pa.array(k, pa.int64()),
                     "p": pa.array(np.arange(8000), pa.int64())})
    rk = np.concatenate([np.arange(0, 400), np.arange(0, 40)])  # dup keys
    right = pa.table({"k": pa.array(rk, pa.int64()),
                      "attr": pa.array(rk * 10 + 1, pa.int64())})
    lds = ray.data.from_arrow(left).repartition(6)
    rds = ray.data.from_arrow(right).repartition(3)

    def rows(ds):
        return sorted(map(tuple,
                          ds.to_pandas()[["k", "p", "attr"]].itertuples(index=False)))

    plain = rows(bucket_join(lds, rds, key="k", join_type="inner"))
    assert rows(skew_join(lds, rds, key="k", hot_mult=4.0)) == plain  # hot+cold
    assert rows(skew_join(lds, rds, key="k", hot_mult=1e9)) == plain  # all cold


@pytest.mark.usefixtures("ray_session")
def test_rollup_levels_consistent():
    import ray.data

    from kgrecrun.ops.rollup import rollup_count_sum

    rng = np.random.RandomState(5)
    t = pa.table(
        {
            "a": pa.array(rng.choice(["x", "y", "z"], 500)),
            "b": pa.array(rng.choice(["p", "q"], 500)),
            "v": pa.array(rng.randint(0, 100, 500), pa.int64()),
        }
    )
    out = rollup_count_sum(
        ray.data.from_arrow(t).repartition(4), "a", "b", value_col="v"
    ).to_pandas()
    leaves = out[out.a.notna() & out.b.notna()]
    subs = out[out.a.notna() & out.b.isna()].set_index("a")
    grand = out[out.a.isna() & out.b.isna()]
    assert len(grand) == 1
    assert grand.n.iloc[0] == 500 and grand.total.iloc[0] == int(t["v"].to_numpy().sum())
    for a, g in leaves.groupby("a"):
        assert subs.loc[a, "n"] == g.n.sum() and subs.loc[a, "total"] == g.total.sum()
    # leaves equal a plain pandas groupby
    want = (
        t.to_pandas().groupby(["a", "b"])
        .agg(n=("v", "size"), total=("v", "sum"))
        .reset_index()
    )
    got = leaves.sort_values(["a", "b"]).reset_index(drop=True)[["a", "b", "n", "total"]]
    import pandas as pd

    pd.testing.assert_frame_equal(got, want.astype({"n": "int64"}), check_dtype=False)


@pytest.mark.usefixtures("ray_session")
def test_approx_distinct_accuracy_and_shard_invariance():
    import ray.data

    from kgrecrun.ops.stats import approx_distinct

    rng = np.random.RandomState(13)
    # group 'a': 3000 true distinct of 20000 rows; 'b': 50 distinct
    vals = np.concatenate([rng.randint(0, 3000, 20000), rng.randint(0, 50, 5000)])
    keys = np.concatenate([np.repeat("a", 20000), np.repeat("b", 5000)])
    t = pa.table({"g": pa.array(keys), "v": pa.array(vals, pa.int64())})

    def run(n_parts):
        return (
            approx_distinct(
                ray.data.from_arrow(t).repartition(n_parts), key="g", value_col="v"
            )
            .to_pandas()
            .set_index("g")
        )

    out = run(7)
    true_a = len(np.unique(vals[:20000]))
    true_b = len(np.unique(vals[20000:]))
    assert abs(out.loc["a", "est_distinct"] - true_a) / true_a < 0.05
    assert abs(out.loc["b", "est_distinct"] - true_b) / true_b < 0.05
    # set-union merge semantics → identical result under any sharding
    out2 = run(2)
    assert out.equals(out2)


def test_resize_media_roundtrip_and_audio_error():
    from kgrecrun.ops import media as M

    t = M.synth_media_batch([0, 1, 2, 3])  # wav, bmp, png, legacy fakeimg
    out = M.ResizeMedia(out_w=8, out_h=8)(t)
    assert out["error"].to_pylist()[0] is not None  # audio row → error
    for i in (1, 2, 3):  # all three image containers resize
        assert out["error"].to_pylist()[i] is None
        small = M.decode_bmp(out["payload"][i].as_py())
        assert small.shape == (8, 8)
        # resized pixels equal the area-mean of the original (±rounding)
        _, orig = M._decode_payload(t["payload"][i].as_py())
        want = np.clip(np.rint(M.mean_pool(orig, 8, 8)), 0, 255).astype(np.uint8)
        assert (small == want).all()


def test_frame_sample_audio_counts():
    from kgrecrun.ops import media as M

    sr, n = 8000, 4000
    rng = np.random.RandomState(0)
    samples = rng.randint(-(2**15), 2**15, size=n, dtype=np.int16)
    t = pa.table(
        {
            "media_id": pa.array([1, 2], pa.int64()),
            "payload": pa.array(
                [M.encode_wav(samples, sr), M.encode_bmp(np.zeros((4, 4), np.uint8))],
                pa.large_binary(),
            ),
        }
    )
    out = M.FrameSampleAudio(frame_ms=25, hop_ms=10)(t)
    flen, hop = sr * 25 // 1000, sr * 10 // 1000
    want_frames = len(range(0, n - flen + 1, hop))
    assert out["n_frames"].to_pylist() == [want_frames, 0]
    assert out["error"].to_pylist()[1] is not None  # image row → error
    rms0 = out["frame_rms"][0].as_py()[0]
    assert abs(rms0 - float(np.sqrt(np.mean(samples[:flen].astype(np.float64) ** 2)))) < 1e-9


@pytest.mark.usefixtures("ray_session")
def test_range_join_matches_bruteforce():
    import ray.data

    from kgrecrun.ops.temporal import range_join

    rng = np.random.RandomState(21)
    # non-overlapping intervals per key: sorted starts with gaps
    ivs = []
    for k in range(4):
        t = 0
        for s in range(5):
            start = t + rng.randint(1, 20)
            end = start + rng.randint(0, 15)
            ivs.append((k, start, end, len(ivs)))
            t = end + 1  # strictly disjoint
    pts = [(rng.randint(0, 5), rng.randint(0, 120), i) for i in range(300)]
    points = pa.table(
        {
            "k": pa.array([p[0] for p in pts], pa.int64()),
            "pt": pa.array([p[1] * 1_000_000 for p in pts], pa.int64()).cast(pa.timestamp("us")),
            "pid": pa.array([p[2] for p in pts], pa.int64()),
        }
    )
    intervals = pa.table(
        {
            "k": pa.array([v[0] for v in ivs], pa.int64()),
            "start": pa.array([v[1] * 1_000_000 for v in ivs], pa.int64()),
            "end": pa.array([v[2] * 1_000_000 for v in ivs], pa.int64()),
            "iid": pa.array([v[3] for v in ivs], pa.int64()),
        }
    )
    got = range_join(
        ray.data.from_arrow(points).repartition(3),
        ray.data.from_arrow(intervals).repartition(2),
        key="k",
        point_ts="pt",
        start_ts="start",
        end_ts="end",
        point_cols=["pid"],
        interval_cols=["iid"],
        n_buckets=4,
    ).to_pandas()
    want = {}
    for pk, pt, pid in pts:
        for ik, s, e, iid in ivs:
            if ik == pk and s <= pt <= e:
                want[pid] = iid
    assert sorted(got["pid"]) == sorted(want)
    for _, r in got.iterrows():
        assert r["iid"] == want[r["pid"]]


@pytest.mark.usefixtures("ray_session")
def test_hash_bucket_mixes_strided_integer_keys():
    """ADVICE r2: keys strided by a multiple of n_buckets must NOT
    collapse into one bucket (splitmix64 mix before masking)."""
    from kgrecrun.kg.unionfind import hash_bucket

    n_buckets = 64
    strided = pa.array(np.arange(0, 64 * 500, 64, dtype=np.int64))
    buckets = hash_bucket(strided, n_buckets).to_pylist()
    assert len(set(buckets)) > n_buckets // 2  # spread, not collapsed
    # deterministic across calls
    assert buckets == hash_bucket(strided, n_buckets).to_pylist()
    # string path unchanged and in range
    sb = hash_bucket(pa.array([f"u{i}" for i in range(100)]), 16).to_pylist()
    assert set(sb) <= set(range(16))


@pytest.mark.usefixtures("ray_session")
def test_distributed_cc_long_chain_pointer_doubling_and_raise():
    """ADVICE r2 (medium): a chain with diameter >> max_iters must either
    converge via pointer doubling (default iters: yes, since rounds are
    now O(log diameter)) or raise loudly instead of returning wrong
    labels."""
    import ray.data

    from kgrecrun.kg.unionfind import connected_components_distributed

    n = 300  # path graph 0-1-...-300: diameter 300 >> 50 plain iterations
    edges = pa.table({
        "src": pa.array(np.arange(n, dtype=np.int64)),
        "dst": pa.array(np.arange(1, n + 1, dtype=np.int64)),
    })
    ds = ray.data.from_arrow(edges).repartition(4)
    df = connected_components_distributed(ds).to_pandas()
    assert len(df) == n + 1
    assert (df["label"] == 0).all()

    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components_distributed(ds, max_iters=2)


@pytest.mark.usefixtures("ray_session")
def test_band_window_truncation_chain_transitivity():
    """VERDICT r2 item 5: a band segment larger than the verify window
    still clusters fully — adjacent ids link within the window and CC
    closes the transitive hull; oversized_band_count makes the
    truncation regime visible."""
    import ray.data

    n_dup = 40
    window = 4
    texts = [BASE] * n_dup + [FAR]
    t = _docs_table(texts, ids=list(range(n_dup + 1)))
    ds = ray.data.from_arrow(t).repartition(4)
    res = dedup.minhash_dedup(ds, window=window).to_pandas()
    roots = dict(zip(res["doc_id"], res["root_id"]))
    assert all(roots[i] == 0 for i in range(n_dup))  # one cluster despite window<segment
    assert roots[n_dup] == n_dup

    banded = ds.map_batches(
        dedup._ComputeSigs(64, 5, "text", "doc_id"), batch_format="pyarrow"
    ).map_batches(dedup._band_rows_from_sigs(64, 16), batch_format="pyarrow")
    assert dedup.oversized_band_count(banded, window=window) >= 16  # all 16 bands oversize


@pytest.mark.usefixtures("ray_session")
def test_range_join_validate_detects_overlap():
    """VERDICT r2 item 6: overlapping intervals violate range_join's
    partitioning assumption; validate=True fails loudly."""
    import ray.data

    from kgrecrun.ops.temporal import count_interval_overlaps, range_join

    us = 1_000_000
    good = pa.table({
        "k": pa.array([1, 1, 2], pa.int64()),
        "start": pa.array([0, 20 * us, 5 * us], pa.int64()),
        "end": pa.array([10 * us, 30 * us, 9 * us], pa.int64()),
        "iid": pa.array([0, 1, 2], pa.int64()),
    })
    bad = pa.table({
        "k": pa.array([1, 1], pa.int64()),
        "start": pa.array([0, 5 * us], pa.int64()),
        "end": pa.array([10 * us, 15 * us], pa.int64()),  # overlaps [0,10]
        "iid": pa.array([0, 1], pa.int64()),
    })
    points = pa.table({
        "k": pa.array([1], pa.int64()),
        "pt": pa.array([2 * us], pa.int64()),
        "pid": pa.array([0], pa.int64()),
    })
    kw = dict(key="k", point_ts="pt", start_ts="start", end_ts="end",
              point_cols=["pid"], interval_cols=["iid"], n_buckets=4)

    assert count_interval_overlaps(
        ray.data.from_arrow(good), key="k", start_ts="start", end_ts="end") == 0
    ok = range_join(ray.data.from_arrow(points), ray.data.from_arrow(good),
                    validate=True, **kw).to_pandas()
    assert ok["iid"].tolist() == [0]

    with pytest.raises(ValueError, match="overlap"):
        range_join(ray.data.from_arrow(points), ray.data.from_arrow(bad),
                   validate=True, **kw)


@pytest.mark.usefixtures("ray_session")
def test_bucket_join_matches_duckdb():
    """The generic bucket-cogroup join (backbone of semi/anti, crawl and
    dedup label application) against DuckDB on every join type."""
    import duckdb
    import ray.data

    from kgrecrun.ops.cogroup import bucket_join

    rng = np.random.RandomState(5)
    left = pa.table({
        "k": pa.array(rng.randint(0, 40, 300), pa.int64()),
        "lv": pa.array(np.arange(300), pa.int64()),
    })
    right = pa.table({
        "k": pa.array(rng.randint(20, 60, 80), pa.int64()),
        "rv": pa.array(np.arange(80) * 10, pa.int64()),
    })
    con = duckdb.connect()
    con.register("l", left)
    con.register("r", right)
    sqls = {
        "inner": "SELECT l.k, lv, rv FROM l JOIN r ON l.k = r.k",
        "left outer": "SELECT l.k, lv, rv FROM l LEFT JOIN r ON l.k = r.k",
        "full outer": ("SELECT COALESCE(l.k, r.k) AS k, lv, rv "
                       "FROM l FULL JOIN r ON l.k = r.k"),
        "left semi": "SELECT k, lv FROM l WHERE EXISTS (SELECT 1 FROM r WHERE r.k = l.k)",
        "left anti": "SELECT k, lv FROM l WHERE NOT EXISTS (SELECT 1 FROM r WHERE r.k = l.k)",
    }
    for jt, sql in sqls.items():
        got = bucket_join(
            ray.data.from_arrow(left).repartition(3),
            ray.data.from_arrow(right).repartition(2),
            key="k", join_type=jt, n_buckets=8,
        ).to_pandas()
        want = con.execute(sql).df()
        gs = got.sort_values(list(got.columns)).reset_index(drop=True)
        ws = want[list(got.columns)].sort_values(list(got.columns)).reset_index(drop=True)
        assert gs.shape == ws.shape, (jt, gs.shape, ws.shape)
        for c in gs.columns:
            gv = gs[c].astype("float64").fillna(-1).tolist()
            wv = ws[c].astype("float64").fillna(-1).tolist()
            assert gv == wv, (jt, c)


@pytest.mark.usefixtures("ray_session")
def test_cube_adds_k2_grouping_set():
    """cube = rollup + (NULL, k2) marginals; totals consistent."""
    import ray.data

    from kgrecrun.ops.rollup import cube_count_sum, rollup_count_sum

    t = pa.table({
        "a": pa.array(["x", "x", "y", "y", "y"], pa.string()),
        "b": pa.array(["p", "q", "p", "p", "q"], pa.string()),
        "v": pa.array([1, 2, 3, 4, 5], pa.int64()),
    })
    ds = ray.data.from_arrow(t).repartition(2)
    cube = cube_count_sum(ds, "a", "b", value_col="v").to_pandas()
    roll = rollup_count_sum(ds, "a", "b", value_col="v").to_pandas()
    assert len(cube) == len(roll) + 2  # b in {p, q}
    marg = cube[cube["a"].isna() & cube["b"].notna()].set_index("b")
    assert marg.loc["p", "total"] == 1 + 3 + 4
    assert marg.loc["q", "total"] == 2 + 5
    grand = cube[cube["a"].isna() & cube["b"].isna()]
    assert grand["total"].tolist() == [15]


@pytest.mark.usefixtures("ray_session")
def test_approx_group_quantiles_error_bound():
    """Quantized-histogram quantiles stay within cell/2 of exact."""
    import ray.data

    from kgrecrun.ops.stats import approx_group_quantiles, group_quantiles

    rng = np.random.RandomState(11)
    cents = rng.randint(100, 1_000_000, 20_000).astype(np.int64)
    keys = np.take(np.array(["a", "b", "c"]), rng.randint(0, 3, 20_000))
    t = pa.table({"k": pa.array(keys, pa.string()), "c": pa.array(cents, pa.int64())})
    ds = ray.data.from_arrow(t).repartition(4)
    cell = 100
    exact = group_quantiles(ds, key="k", value_cents=lambda b: b["c"]).to_pandas()
    approx = approx_group_quantiles(
        ds, key="k", cell=cell, value_cents=lambda b: b["c"]
    ).to_pandas()
    m = exact.merge(approx, on=["k", "q"], suffixes=("_e", "_a"))
    assert len(m) == 9
    assert (abs(m["qv_e"] - m["qv_a"]) <= cell / 2).all()


@pytest.mark.usefixtures("ray_session")
def test_decontaminate_paths_agree_and_detect_planted_overlap():
    """Broadcast and exploded-cogroup decontamination must agree; a doc
    sharing an 8-gram with the benchmark is flagged with the right
    distinct-overlap count."""
    import ray.data

    from kgrecrun.ops.decontam import ngram_decontaminate

    bench_text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = _docs_table(
        [
            bench_text,                                  # the benchmark doc itself
            "prefix words " + bench_text + " suffix words",  # contains all bench 8-grams
            "totally unrelated text with many distinct words here now",
            "short",
        ],
        ids=[0, 1, 2, 3],
    )
    bench = _docs_table([bench_text], ids=[100])
    dd = ray.data.from_arrow(docs).repartition(2)
    bd = ray.data.from_arrow(bench)
    bc = ngram_decontaminate(dd, bd, n=8).to_pandas().set_index("doc_id").sort_index()
    ex = ngram_decontaminate(dd, bd, n=8, broadcast_threshold=0) \
        .to_pandas().set_index("doc_id").sort_index()
    assert bc["n_contaminated"].tolist() == ex["n_contaminated"].tolist()
    assert bc["clean"].tolist() == ex["clean"].tolist()
    # bench doc has 3 8-grams (10 words), all shared; doc 1 contains them all
    assert bc.loc[0, "n_contaminated"] == 3
    assert bc.loc[1, "n_contaminated"] == 3
    assert bc.loc[2, "n_contaminated"] == 0 and bc.loc[2, "clean"] == 1
    assert bc.loc[3, "n_contaminated"] == 0


@pytest.mark.usefixtures("ray_session")
def test_cap_per_key_quota_and_determinism():
    """cap_per_key keeps exactly min(k, group size) rows per key and the
    SAME rows regardless of input partitioning."""
    import ray.data

    from kgrecrun.ops.sample import cap_per_key

    rng = np.random.RandomState(3)
    keys = np.take(np.array(["a", "b", "c", "d"]), rng.randint(0, 4, 500))
    t = pa.table({
        "doc_id": pa.array(np.arange(500), pa.int64()),
        "lang": pa.array(keys, pa.string()),
    })
    got1 = cap_per_key(ray.data.from_arrow(t).repartition(2),
                       key="lang", k=10).to_pandas()
    got2 = cap_per_key(ray.data.from_arrow(t).repartition(7),
                       key="lang", k=10).to_pandas()
    assert got1.groupby("lang").size().max() == 10
    s1 = set(map(tuple, got1.itertuples(index=False)))
    s2 = set(map(tuple, got2.itertuples(index=False)))
    assert s1 == s2 and len(s1) == 40


@pytest.mark.usefixtures("ray_session")
def test_group_corr_matches_numpy_and_shard_invariant():
    """group_corr's exact-integer sufficient statistics reproduce
    numpy's float corrcoef/OLS to 6 dp, are partitioning-invariant,
    and zero-variance groups yield null corr/slope."""
    import ray.data

    from kgrecrun.ops.stats import group_corr

    rng = np.random.RandomState(7)
    keys = np.take(np.array(["a", "b", "c"]), rng.randint(0, 3, 4000))
    x = rng.randint(1, 50, 4000)
    y = (3 * x + rng.randint(-40, 40, 4000)).astype(np.int64)
    # group "z": constant y → zero variance → null outputs
    keys = np.concatenate([keys, np.array(["z"] * 10)])
    x = np.concatenate([x, np.arange(10)])
    y = np.concatenate([y, np.full(10, 5)])
    t = pa.table({
        "g": pa.array(keys), "x": pa.array(x, pa.int64()),
        "y": pa.array(y, pa.int64()),
    })
    outs = []
    for parts in (3, 11):
        df = (
            group_corr(ray.data.from_arrow(t).repartition(parts),
                       key="g", x_col="x", y_col="y")
            .to_pandas().set_index("g").sort_index()
        )
        outs.append(df)
    assert outs[0].equals(outs[1])  # shard-invariant, bit-equal
    df = outs[0]
    for g in "abc":
        m = keys == g
        assert df.loc[g, "n"] == m.sum()
        assert abs(df.loc[g, "corr6"] - np.corrcoef(x[m], y[m])[0, 1]) < 1e-6
        slope = np.polyfit(x[m].astype(float), y[m].astype(float), 1)[0]
        assert abs(df.loc[g, "slope6"] - slope) < 1e-5
    assert df.loc["z", "n"] == 10
    assert np.isnan(df.loc["z", "corr6"]) and np.isnan(df.loc["z", "slope6"])


@pytest.mark.usefixtures("ray_session")
def test_group_mode_tiebreak_and_shard_invariance():
    """group_mode picks the max-count value with min-value tie-break,
    identically at any input partitioning."""
    import ray.data

    from kgrecrun.ops.stats import group_mode

    keys = ["a"] * 6 + ["b"] * 4 + ["c"] * 1
    vals = ["x", "x", "y", "y", "z", "z",      # a: 3-way tie → "x"
            "q", "p", "q", "p",                # b: tie p/q → "p"
            "solo"]                            # c: singleton
    t = pa.table({"k": pa.array(keys), "v": pa.array(vals)})
    outs = []
    for parts in (1, 5):
        df = (
            group_mode(ray.data.from_arrow(t).repartition(parts),
                       key="k", value_col="v", n_buckets=4)
            .to_pandas().set_index("k").sort_index()
        )
        outs.append(df)
    assert outs[0].equals(outs[1])
    df = outs[0]
    assert df.loc["a", "v"] == "x" and df.loc["a", "n"] == 2
    assert df.loc["b", "v"] == "p" and df.loc["b", "n"] == 2
    assert df.loc["c", "v"] == "solo" and df.loc["c", "n"] == 1


@pytest.mark.usefixtures("ray_session")
def test_rebalance_to_mix_weighted_and_deterministic():
    """rebalance_to_mix hits the target proportions (±hash noise), keeps
    the binding key entirely, and is partitioning-invariant."""
    import ray.data

    from kgrecrun.ops.sample import rebalance_to_mix

    rng = np.random.RandomState(9)
    langs = np.take(np.array(["en", "de", "fr"]), rng.choice(3, 6000, p=[.7, .2, .1]))
    t = pa.table({
        "doc_id": pa.array(np.arange(6000), pa.int64()),
        "lang": pa.array(langs, pa.string()),
    })
    # target 2:1:1 — "fr" (scarcest vs target) binds and keeps ~100%
    kept1 = rebalance_to_mix(
        ray.data.from_arrow(t).repartition(3),
        key="lang", weights={"en": 2, "de": 1, "fr": 1},
    ).to_pandas()
    kept2 = rebalance_to_mix(
        ray.data.from_arrow(t).repartition(8),
        key="lang", weights={"en": 2, "de": 1, "fr": 1},
    ).to_pandas()
    s1 = set(map(tuple, kept1.itertuples(index=False)))
    assert s1 == set(map(tuple, kept2.itertuples(index=False)))
    by = kept1.groupby("lang").size()
    n_fr = (langs == "fr").sum()
    assert by["fr"] >= n_fr * 0.999          # binding key: all kept
    # achieved mix ≈ 2:1:1 within hash noise
    assert abs(by["en"] / by["fr"] - 2.0) < 0.15
    assert abs(by["de"] / by["fr"] - 1.0) < 0.12


@pytest.mark.usefixtures("ray_session")
def test_rebalance_to_mix_open_domain_key_raises():
    """max_keys is a LOUD bound: an open-domain key (here: unique per
    row) raises before any per-key counts reach the driver heap; at or
    under the bound the op still works."""
    import ray.data

    from kgrecrun.ops.sample import rebalance_to_mix

    t = pa.table({
        "doc_id": pa.array(np.arange(500), pa.int64()),
        "url": pa.array([f"https://x.test/{i}" for i in range(500)]),
    })
    ds = ray.data.from_arrow(t).repartition(4)
    with pytest.raises(ValueError, match="max_keys"):
        rebalance_to_mix(ds, key="url", max_keys=100).to_pandas()
    # exactly at the bound: fine (uniform targets, everything kept)
    kept = rebalance_to_mix(ds, key="url", id_col="doc_id",
                            max_keys=500).to_pandas()
    assert len(kept) == 500


@pytest.mark.usefixtures("ray_session")
def test_group_zscore_matches_numpy_and_null_variance():
    """group_zscore equals numpy population z-scores to 6 dp; constant
    groups yield null; identical at any partitioning."""
    import ray.data

    from kgrecrun.ops.stats import group_zscore

    rng = np.random.RandomState(13)
    keys = np.take(np.array(["a", "b"]), rng.randint(0, 2, 3000))
    x = rng.randint(-100, 100, 3000)
    keys = np.concatenate([keys, ["c"] * 5])
    x = np.concatenate([x, [7] * 5])
    t = pa.table({
        "event_id": pa.array(np.arange(3005), pa.int64()),
        "g": pa.array(keys), "x": pa.array(x, pa.int64()),
    })
    outs = []
    for parts in (2, 9):
        df = (
            group_zscore(ray.data.from_arrow(t).repartition(parts),
                         key="g", x_col="x", id_cols=["event_id"])
            .to_pandas().sort_values("event_id").reset_index(drop=True)
        )
        outs.append(df)
    assert outs[0].equals(outs[1])
    df = outs[0]
    for g in "ab":
        m = keys == g
        want = (x[m] - x[m].mean()) / x[m].std()  # population std
        got = df[df["g"] == g]["z6"].to_numpy()
        assert np.abs(got - want).max() < 1e-6
    assert df[df["g"] == "c"]["z6"].isna().all()


@pytest.mark.usefixtures("ray_session")
def test_group_rank_windows_matches_duckdb_incl_singleton():
    """Rank family equals DuckDB window functions, including the
    percent_rank=0.0 single-row-partition convention; identical at any
    partitioning."""
    import duckdb
    import ray.data

    from kgrecrun.ops.window import group_rank_windows

    rng = np.random.RandomState(7)
    n = 2000
    t = pa.table({
        "event_id": pa.array(np.arange(n), pa.int64()),
        "user_id": pa.array(rng.randint(0, 60, n), pa.int64()),
        # coarse grid forces real ties within a user
        "value": pa.array(rng.randint(0, 25, n) * 1.0, pa.float64()),
    })
    # singleton partition
    t = pa.concat_tables([t, pa.table({
        "event_id": pa.array([99999], pa.int64()),
        "user_id": pa.array([777], pa.int64()),
        "value": pa.array([3.5], pa.float64()),
    })])
    want = duckdb.connect().execute("""
        WITH e AS (SELECT event_id, user_id,
                          CAST(round(value*100) AS BIGINT) AS c FROM t)
        SELECT event_id, user_id,
               CAST(ROW_NUMBER() OVER (PARTITION BY user_id
                    ORDER BY c DESC, event_id) AS BIGINT) AS rn,
               CAST(RANK() OVER (PARTITION BY user_id
                    ORDER BY c DESC) AS BIGINT) AS rnk,
               CAST(DENSE_RANK() OVER (PARTITION BY user_id
                    ORDER BY c DESC) AS BIGINT) AS drnk,
               round(PERCENT_RANK() OVER (PARTITION BY user_id
                     ORDER BY c DESC), 6) AS pr6
        FROM e ORDER BY event_id
    """).fetch_df()
    outs = []
    for parts in (3, 11):
        ds = ray.data.from_arrow(t).repartition(parts)
        df = (group_rank_windows(None, events_ds=ds).to_pandas()
              .sort_values("event_id").reset_index(drop=True))
        outs.append(df)
    assert outs[0].equals(outs[1])
    got = outs[0][["event_id", "user_id", "rn", "rnk", "drnk", "pr6"]]
    pd.testing.assert_frame_equal(got, want[got.columns.tolist()])
    assert got[got["user_id"] == 777]["pr6"].iloc[0] == 0.0


@pytest.mark.usefixtures("ray_session")
def test_group_gini_exact_and_constant_group():
    """Gini equals the exact rational formula; single-label groups are
    0; partitioning-invariant."""
    import ray.data

    from kgrecrun.ops.stats import group_gini

    rng = np.random.RandomState(3)
    keys = rng.randint(0, 40, 5000)
    labels = np.take(np.array(list("abcde")), rng.randint(0, 5, 5000))
    keys = np.concatenate([keys, [999] * 7])
    labels = np.concatenate([labels, ["z"] * 7])
    t = pa.table({"k": pa.array(keys, pa.int64()), "lab": pa.array(labels)})
    outs = []
    for parts in (2, 13):
        ds = ray.data.from_arrow(t).repartition(parts)
        df = (group_gini(ds, key="k", label_col="lab").to_pandas()
              .sort_values("k").reset_index(drop=True))
        outs.append(df)
    assert outs[0].equals(outs[1])
    df = outs[0]
    for k in (0, 17, 999):
        m = keys == k
        _, c = np.unique(labels[m], return_counts=True)
        want = round(1.0 - float((c * c).sum()) / float(m.sum()) ** 2, 6)
        row = df[df["k"] == k].iloc[0]
        assert row["n"] == m.sum()
        assert abs(row["gini6"] - want) < 1e-9
    assert df[df["k"] == 999]["gini6"].iloc[0] == 0.0


@pytest.mark.usefixtures("ray_session")
def test_value_histogram_floor_bins_negatives():
    """Histogram bins are floor(cents/width) — negative values land in
    the floor bin (−1, not 0); counts are exact."""
    import ray.data

    from kgrecrun.ops.stats import value_histogram

    t = pa.table({
        "g": pa.array(["a"] * 6 + ["b"] * 2),
        "value": pa.array([0.0, 9.99, 10.0, 25.0, -0.01, -10.0, 5.0, 5.0],
                          pa.float64()),
    })
    ds = ray.data.from_arrow(t).repartition(3)
    df = (value_histogram(ds, key="g", value_col="value", width_cents=1000)
          .to_pandas().sort_values(["g", "bin"]).reset_index(drop=True))
    want = pd.DataFrame({
        "g": ["a", "a", "a", "a", "b"],
        "bin": [-1, 0, 1, 2, 0],
        "cnt": [2, 2, 1, 1, 2],
    })
    pd.testing.assert_frame_equal(df, want)


@pytest.mark.usefixtures("ray_session")
def test_global_rank_matches_duckdb_negatives_and_partitions():
    """Distributed global rank (range-prefix, no sort) equals DuckDB
    global window functions, including negative values (floor range
    ids) and heavy ties; identical at any partitioning."""
    import duckdb
    import ray.data

    from kgrecrun.ops.window import global_rank

    rng = np.random.RandomState(11)
    n = 3000
    t = pa.table({
        "event_id": pa.array(np.arange(n), pa.int64()),
        # mixed-sign, coarse grid → ties, several ranges at width 1000
        "value": pa.array((rng.randint(-40, 120, n) * 2.5), pa.float64()),
    })
    want = duckdb.connect().execute("""
        WITH e AS (SELECT event_id,
                          CAST(round(value*100) AS BIGINT) AS cents FROM t)
        SELECT event_id, cents,
               CAST(ROW_NUMBER() OVER (ORDER BY cents DESC, event_id)
                    AS BIGINT) AS rn,
               CAST(RANK() OVER (ORDER BY cents DESC) AS BIGINT) AS rnk,
               CAST(DENSE_RANK() OVER (ORDER BY cents DESC) AS BIGINT)
                   AS drnk,
               round(PERCENT_RANK() OVER (ORDER BY cents DESC), 6) AS pr6
        FROM e ORDER BY event_id
    """).fetch_df()
    outs = []
    for parts in (2, 17):
        ds = ray.data.from_arrow(t).repartition(parts)
        df = (global_rank(ds, value_col="value", id_col="event_id")
              .to_pandas().sort_values("event_id").reset_index(drop=True))
        outs.append(df)
    assert outs[0].equals(outs[1])
    got = outs[0][["event_id", "cents", "rn", "rnk", "drnk", "pr6"]]
    pd.testing.assert_frame_equal(got, want[got.columns.tolist()])
    # total order: rn is a permutation of 1..n
    assert sorted(got["rn"]) == list(range(1, n + 1))


@pytest.mark.usefixtures("ray_session")
def test_iqr_outliers_fences_strict_and_exact():
    """Tukey fences flag exactly the strict-outside rows, with the same
    float fence sequence as SQL; boundary values stay inliers."""
    import duckdb
    import ray.data

    from kgrecrun.ops.stats import iqr_outliers

    rng = np.random.RandomState(5)
    base = rng.randint(100, 200, 400)  # tight core
    tail = np.array([1, 2, 900, 1500, 155])  # low + high outliers
    vals = np.concatenate([base, tail]) / 100.0
    t = pa.table({
        "event_id": pa.array(np.arange(len(vals)), pa.int64()),
        "event_type": pa.array(["a"] * len(vals)),
        "value": pa.array(vals, pa.float64()),
    })
    want = duckdb.connect().execute("""
        WITH e AS (SELECT event_id, event_type,
                          CAST(round(value*100) AS BIGINT) AS cents FROM t),
        q AS (SELECT event_type, quantile_cont(cents, 0.25) AS q1,
                     quantile_cont(cents, 0.75) AS q3 FROM e GROUP BY 1),
        b AS (SELECT event_type, q1 - 1.5*(q3-q1) AS lo,
                     q3 + 1.5*(q3-q1) AS hi FROM q)
        SELECT e.event_id, e.event_type, e.cents,
               CASE WHEN CAST(e.cents AS DOUBLE) < b.lo THEN 'low'
                    ELSE 'high' END AS side
        FROM e JOIN b USING (event_type)
        WHERE CAST(e.cents AS DOUBLE) < b.lo OR CAST(e.cents AS DOUBLE) > b.hi
        ORDER BY event_id
    """).fetch_df()
    ds = ray.data.from_arrow(t).repartition(4)
    df = (iqr_outliers(ds, key="event_type", value_col="value",
                       id_cols=["event_id"])
          .to_pandas().sort_values("event_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(
        df[["event_id", "event_type", "cents", "side"]],
        want[["event_id", "event_type", "cents", "side"]])
    assert set(df["side"]) == {"low", "high"}


@pytest.mark.usefixtures("ray_session")
def test_retention_cohorts_counts_distinct_users():
    """Cohort counts equal the pandas reference; repeat events on one
    day count once; partitioning-invariant."""
    import ray.data

    from kgrecrun.ops.window import retention_cohorts

    day_us = 86_400_000_000
    # user 1: days 0,0,1,3 ; user 2: days 1,1 ; user 3: days 0,3
    rows = [(1, 0), (1, 0), (1, 1), (1, 3), (2, 1), (2, 1), (3, 0), (3, 3)]
    t = pa.table({
        "user_id": pa.array([u for u, _ in rows], pa.int64()),
        "ts": pa.array([d * day_us + 12345 for _, d in rows],
                       pa.timestamp("us")),
    })
    outs = []
    for parts in (1, 5):
        ds = ray.data.from_arrow(t).repartition(parts)
        df = (retention_cohorts(None, events_ds=ds).to_pandas()
              .sort_values(["cohort_day", "day_offset"])
              .reset_index(drop=True))
        outs.append(df)
    assert outs[0].equals(outs[1])
    df = outs[0]
    want = pd.DataFrame({
        "cohort_day": [0, 0, 0, 1],
        "day_offset": [0, 1, 3, 0],
        "n_users": [2, 1, 2, 1],
    })
    pd.testing.assert_frame_equal(df, want)


@pytest.mark.usefixtures("ray_session")
def test_bucket_join_left_agg_sum_fuses_reduce():
    """left_agg_sum sums left partials per key inside the bucket before
    joining — equal to groupby-then-join; rejects unaggregated payload
    columns."""
    import ray.data

    from kgrecrun.ops.cogroup import bucket_join

    rng = np.random.RandomState(2)
    keys = rng.randint(0, 50, 4000)
    vals = rng.randint(1, 100, 4000)
    left = ray.data.from_arrow(pa.table({
        "k": pa.array(keys, pa.int64()),
        "v": pa.array(vals, pa.int64()),
    })).repartition(7)
    right = ray.data.from_arrow(pa.table({
        "k": pa.array(np.arange(0, 60, 2), pa.int64()),
        "name": pa.array([f"r{i}" for i in range(0, 60, 2)]),
    }))
    df = (bucket_join(left, right, key="k", left_agg_sum=["v"])
          .to_pandas().sort_values("k").reset_index(drop=True))
    want = (pd.DataFrame({"k": keys, "v": vals}).groupby("k", as_index=False)
            .sum().merge(pd.DataFrame(
                {"k": list(range(0, 60, 2)),
                 "name": [f"r{i}" for i in range(0, 60, 2)]}), on="k")
            .sort_values("k").reset_index(drop=True))
    pd.testing.assert_frame_equal(df[["k", "v", "name"]],
                                  want[["k", "v", "name"]])
    with pytest.raises(ValueError, match="left_agg_sum"):
        bucket_join(left, right, key="k", left_agg_sum=["nope"])


@pytest.mark.usefixtures("ray_session")
def test_group_string_agg_ordered_multiset():
    """string_agg keeps duplicates, sorts values ascending, and is
    partitioning-invariant."""
    import ray.data

    from kgrecrun.ops.window import group_string_agg

    t = pa.table({
        "k": pa.array([1, 1, 1, 2, 2, 3], pa.int64()),
        "v": pa.array(["b", "a", "b", "z", "a", "solo"]),
    })
    outs = []
    for parts in (1, 4):
        ds = ray.data.from_arrow(t).repartition(parts)
        df = (group_string_agg(ds, key="k", value_col="v").to_pandas()
              .sort_values("k").reset_index(drop=True))
        outs.append(df)
    assert outs[0].equals(outs[1])
    assert outs[0]["agg"].tolist() == ["a,b,b", "a,z", "solo"]


@pytest.mark.usefixtures("ray_session")
def test_rolling_active_users_window_and_clip():
    """WAU counts each user once per trailing window day; trailing ghost
    days past the max observed day are clipped."""
    import ray.data

    from kgrecrun.ops.window import rolling_active_users

    day_us = 86_400_000_000
    # user 1 active days 0,1 ; user 2 active day 2 ; max day = 2
    rows = [(1, 0), (1, 0), (1, 1), (2, 2)]
    t = pa.table({
        "user_id": pa.array([u for u, _ in rows], pa.int64()),
        "ts": pa.array([d * day_us + 7 for _, d in rows], pa.timestamp("us")),
    })
    ds = ray.data.from_arrow(t).repartition(2)
    df = (rolling_active_users(None, window_days=3, events_ds=ds)
          .to_pandas().sort_values("day").reset_index(drop=True))
    # day0: {1}, day1: {1} (deduped across its two active days),
    # day2: {1 (from day1), 2}; days 3,4 clipped
    want = pd.DataFrame({"day": [0, 1, 2], "n_users": [1, 1, 2]})
    pd.testing.assert_frame_equal(df, want)


@pytest.mark.usefixtures("ray_session")
def test_term_cooccurrence_lift_and_cap():
    """Pair counts, the min_count gate, the exact fixed-point lift and
    the per-doc distinct cap all match a hand computation; invariant to
    partitioning."""
    import ray.data

    from kgrecrun.ops.index import term_cooccurrence

    docs = (["alpha beta gamma"] * 6 + ["alpha beta"] * 2
            + ["beta gamma delta"] * 3 + ["zeta eta"])
    t = pa.table({
        "doc_id": pa.array(np.arange(len(docs)), pa.int64()),
        "text": pa.array(docs),
    })
    outs = []
    for parts in (1, 4):
        ds = ray.data.from_arrow(t).repartition(parts)
        df = (term_cooccurrence(ds, min_count=3, k=10).to_pandas()
              .reset_index(drop=True))
        outs.append(df)
    assert outs[0].equals(outs[1])
    df = outs[0].set_index(["w1", "w2"])
    n = len(docs)
    # alpha-beta: 8 docs; df(alpha)=8, df(beta)=11
    assert df.loc[("alpha", "beta"), "pair_count"] == 8
    assert df.loc[("alpha", "beta"), "lift_fp"] == 8 * n * 10**6 // (8 * 11)
    # beta-gamma: 9; alpha-gamma: 6; delta pairs only 3
    assert df.loc[("beta", "gamma"), "pair_count"] == 9
    assert df.loc[("beta", "delta"), "pair_count"] == 3
    assert ("zeta", "eta") not in df.index  # below min_count
    # ordering: count desc then lexicographic
    assert outs[0]["pair_count"].is_monotonic_decreasing


@pytest.mark.usefixtures("ray_session")
def test_densify_daily_fills_gaps_with_zeros():
    """Every key gets one row per day of the global range; silent days
    are zero; counts survive any partitioning."""
    import ray.data

    from kgrecrun.ops.temporal import densify_daily

    day_us = 86_400_000_000
    rows = [("a", 10), ("a", 10), ("a", 13), ("b", 11)]
    t = pa.table({
        "event_type": pa.array([k for k, _ in rows]),
        "ts": pa.array([d * day_us + 5 for _, d in rows],
                       pa.timestamp("us")),
    })
    outs = []
    for parts in (1, 3):
        ds = ray.data.from_arrow(t).repartition(parts)
        df = (densify_daily(None, events_ds=ds).to_pandas()
              .sort_values(["event_type", "day"]).reset_index(drop=True))
        outs.append(df)
    assert outs[0].equals(outs[1])
    df = outs[0]
    assert len(df) == 8  # 2 keys x days 10..13
    a = df[df["event_type"] == "a"]["n_events"].tolist()
    b = df[df["event_type"] == "b"]["n_events"].tolist()
    assert a == [2, 0, 0, 1]
    assert b == [0, 1, 0, 0]


@pytest.mark.usefixtures("ray_session")
def test_segment_dedup_docs_first_occurrence_and_reassembly():
    """A repeated 10-token window survives only at its first global
    (doc_id, seg_no) position; docs reassemble in order; a doc whose
    every segment lost vanishes; partitioning-invariant."""
    import ray.data

    from kgrecrun.ops.dedup import segment_dedup_docs

    w = lambda a, b: " ".join(f"t{i}" for i in range(a, b))
    seg_a = w(0, 10)       # shared window
    seg_b = w(10, 20)
    seg_c = w(20, 30)
    docs = [
        (1, seg_a + " " + seg_b),        # keeps both (first)
        (2, seg_c + " " + seg_a),        # keeps seg_c only
        (3, seg_a),                       # vanishes entirely
        (4, w(40, 45)),                   # short tail segment, unique
    ]
    t = pa.table({
        "doc_id": pa.array([d for d, _ in docs], pa.int64()),
        "text": pa.array([x for _, x in docs]),
    })
    outs = []
    for parts in (1, 3):
        ds = ray.data.from_arrow(t).repartition(parts)
        df = (segment_dedup_docs(ds).to_pandas()
              .sort_values("doc_id").reset_index(drop=True))
        outs.append(df)
    assert outs[0].equals(outs[1])
    df = outs[0]
    assert df["doc_id"].tolist() == [1, 2, 4]
    assert df.loc[0, "text_clean"] == seg_a + " " + seg_b
    assert df.loc[1, "text_clean"] == seg_c
    assert df.loc[2, "text_clean"] == w(40, 45)


@pytest.mark.usefixtures("ray_session")
def test_cli_query_formats_roundtrip(tmp_path, capsys):
    """The CLI runs a named driver pipeline and writes parquet/CSV/JSONL
    that round-trips with the same rows; it must not shut down a Ray
    session it did not start."""
    import json as _json

    import ray

    from kgrecrun.cli import main

    rows = {}
    for fmt in ("parquet", "csv", "json"):
        out = str(tmp_path / fmt)
        rc = main(["--query", "events_value_histogram",
                   "--sf-dir", "/root/testdata/sf0.001",
                   "--out", out, "--format", fmt])
        assert rc == 0
        rows[fmt] = _json.loads(
            capsys.readouterr().out.strip().splitlines()[-1])["rows"]
    assert rows["parquet"] == rows["csv"] == rows["json"] > 0
    assert ray.is_initialized()  # session fixture untouched


@pytest.mark.usefixtures("ray_session")
def test_props_field_stats_extracts_json_ints():
    """The RE2 extraction pulls the integer field (incl. negatives) and
    the per-type (n, sum, min, max) are exact; partitioning-invariant."""
    import ray.data

    from kgrecrun.ops.relational import props_field_stats

    t = pa.table({
        "event_type": pa.array(["a", "a", "a", "b"]),
        "props": pa.array(['{"k": 5}', '{"k": -3}', '{"k": 0}',
                           '{"k": 42}']),
    })
    outs = []
    for parts in (1, 3):
        ds = ray.data.from_arrow(t).repartition(parts)
        df = (props_field_stats(None, events_ds=ds).to_pandas()
              .sort_values("event_type").reset_index(drop=True))
        outs.append(df)
    assert outs[0].equals(outs[1])
    df = outs[0]
    a = df[df["event_type"] == "a"].iloc[0]
    assert (a["n"], a["sum_k"], a["min_k"], a["max_k"]) == (3, 2, -3, 5)
    b = df[df["event_type"] == "b"].iloc[0]
    assert (b["n"], b["sum_k"], b["min_k"], b["max_k"]) == (1, 42, 42, 42)


@pytest.mark.usefixtures("ray_session")
def test_fuzzy_join_integer_threshold_and_candidates():
    """Jaccard pairs pass exactly at the integer predicate boundary;
    rows sharing no token with any probe emit nothing; jac6 is the
    exact division."""
    import ray.data

    from kgrecrun.ops.joins import fuzzy_join

    probes = pa.table({
        "probe_id": pa.array([100, 200], pa.int64()),
        "probe_name": pa.array(["red widget", "blue bolt"]),
    })
    t = pa.table({
        "p_partkey": pa.array([1, 2, 3, 4], pa.int64()),
        "p_name": pa.array([
            "red widget",        # exact: jac 1 with 100
            "red gizmo",         # i=1,u=3 vs 100 -> 3*1>=3 boundary keep
            "green gadget",      # no shared token: no candidates
            "shiny blue bolt",   # i=2,u=3 vs 200 -> keep
        ]),
    })
    ds = ray.data.from_arrow(t).repartition(2)
    df = (fuzzy_join(ds, probes, text_col="p_name", id_col="p_partkey",
                     probe_text_col="probe_name", probe_id_col="probe_id",
                     threshold=(1, 3))
          .to_pandas().sort_values(["p_partkey", "probe_id"])
          .reset_index(drop=True))
    got = set(zip(df["p_partkey"], df["probe_id"]))
    assert got == {(1, 100), (2, 100), (4, 200)}
    assert df[df["p_partkey"] == 1]["jac6"].iloc[0] == 1.0
    assert abs(df[df["p_partkey"] == 2]["jac6"].iloc[0] - 0.333333) < 1e-9
    assert abs(df[df["p_partkey"] == 4]["jac6"].iloc[0] - 0.666667) < 1e-9


@pytest.mark.usefixtures("ray_session")
def test_knn_label_confusion_loo_and_ties():
    """1-NN excludes self, ties break to the smaller neighbor id, and
    confusion counts are exact; partitioning-invariant."""
    import ray.data

    from kgrecrun.ops.ann import knn_label_confusion

    # two tight clusters + one duplicate pair across labels
    vecs = [
        [1.0, 0.0], [0.99, 0.1],        # label 0 cluster (ids 0,1)
        [0.0, 1.0], [0.1, 0.99],        # label 1 cluster (ids 2,3)
        [0.5, 0.5], [0.5, 0.5],         # identical pair, labels 0/1 (4,5)
    ]
    labels = [0, 0, 1, 1, 0, 1]
    t = pa.table({
        "vec_id": pa.array(np.arange(6), pa.int64()),
        "embedding": pa.array([list(map(float, v)) for v in vecs],
                              pa.list_(pa.float32())),
        "label": pa.array(labels, pa.int32()),
    })
    outs = []
    for parts in (1, 3):
        ds = ray.data.from_arrow(t).repartition(parts)
        df = (knn_label_confusion(ds, ref_table=t).to_pandas()
              .sort_values(["label", "pred_label"]).reset_index(drop=True))
        outs.append(df)
    assert outs[0].equals(outs[1])
    m = {(r.label, r.pred_label): r.n for r in outs[0].itertuples()}
    # ids 0,1 predict each other (0->0); ids 2,3 likewise (1->1)
    # id 4 (label 0): nearest is its duplicate id 5 (label 1) -> (0,1)
    # id 5 (label 1): duplicate id 4 (label 0) -> (1,0)
    assert m[(0, 0)] == 2 and m[(1, 1)] == 2
    assert m[(0, 1)] == 1 and m[(1, 0)] == 1


def test_repetition_scores_ratio_and_short_docs():
    """rep = 1 − distinct/total over word 3-grams; <3-token docs emit
    no row; a fully repeated doc scores high."""
    from kgrecrun.ops.text import repetition_scores

    t = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array([
            "a b c a b c a b c",   # 7 grams, 3 distinct -> 4/7
            "x y",                  # too short: dropped
            "p q r s",              # 2 grams, both distinct -> 0.0
        ]),
    })
    df = repetition_scores(t).to_pandas()
    assert df["doc_id"].tolist() == [1, 3]
    assert df.loc[0, "n_ngrams"] == 7 and df.loc[0, "n_distinct"] == 3
    assert abs(df.loc[0, "rep6"] - round(1 - 3 / 7, 6)) < 1e-9
    assert df.loc[1, "rep6"] == 0.0


@pytest.mark.usefixtures("ray_session")
def test_event_funnel_strict_ordering():
    """A step counts only strictly after the user's previous step's
    first occurrence; same-timestamp steps do NOT chain; cumulative
    depth counts; partitioning-invariant."""
    import ray.data

    from kgrecrun.ops.funnel import event_funnel

    us = 1_000_000
    rows = [
        # user 1: view@1s, click@2s, purchase@3s -> depth 3
        (1, "view", 1), (1, "click", 2), (1, "purchase", 3),
        # user 2: click BEFORE view -> stops at depth 1 (view@5s)
        (2, "click", 4), (2, "view", 5),
        # user 3: view and click at the SAME ts -> strict > fails
        (3, "view", 7), (3, "click", 7),
        # user 4: no view at all -> depth 0 (not counted anywhere)
        (4, "purchase", 9),
    ]
    t = pa.table({
        "user_id": pa.array([u for u, _, _ in rows], pa.int64()),
        "event_type": pa.array([e for _, e, _ in rows]),
        "ts": pa.array([s * us for _, _, s in rows], pa.timestamp("us")),
    })
    outs = []
    for parts in (1, 3):
        ds = ray.data.from_arrow(t).repartition(parts)
        df = (event_funnel(None, events_ds=ds).to_pandas()
              .sort_values("depth").reset_index(drop=True))
        outs.append(df)
    assert outs[0].equals(outs[1])
    assert outs[0]["n_users"].tolist() == [3, 1, 1]


@pytest.mark.usefixtures("ray_session")
def test_daily_anomalies_integer_predicate():
    """A spike after a steady week is flagged; steady days are not;
    a zero-gap day after steady traffic is flagged; the first W days
    are never evaluated."""
    import ray.data

    from kgrecrun.ops.temporal import daily_anomalies

    day_us = 86_400_000_000
    rows = []
    # key a: 7 days of exactly 3 events, then a 30-event spike (day 7),
    # then back to 3 (days 8-14), then a silent day 15, then 3s again
    for d in range(7):
        rows += [("a", d)] * 3
    rows += [("a", 7)] * 30
    for d in range(8, 15):
        rows += [("a", d)] * 3
    # day 15: zero events (gap) — still in the dense range via day 16
    rows += [("a", 16)] * 3
    t = pa.table({
        "event_type": pa.array([k for k, _ in rows]),
        "ts": pa.array([d * day_us + 42 for _, d in rows],
                       pa.timestamp("us")),
    })
    ds = ray.data.from_arrow(t).repartition(3)
    df = (daily_anomalies(None, window=7, k=2, events_ds=ds)
          .to_pandas().sort_values("day").reset_index(drop=True))
    flagged = set(df["day"])
    assert 7 in flagged            # the spike
    assert 15 in flagged           # silence after steady traffic
    assert not flagged & set(range(7))   # warm-up days never evaluated
    # steady days stay unflagged — even when the spike sits inside
    # their trailing window, it inflates the window variance too
    assert 10 not in flagged


def test_chunk_documents_overlap_and_tail():
    """16/8 chunking: overlap is size−stride; the last chunk appears
    only if the previous one missed tokens; short and empty docs."""
    from kgrecrun.ops.text import chunk_documents

    w = lambda a, b: " ".join(f"t{i}" for i in range(a, b))
    t = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": pa.array([
            w(0, 20),   # chunks: [0:16], [8:20] (12 tokens)
            w(0, 16),   # exactly one chunk
            w(0, 5),    # shorter than size: one chunk of 5
            "",         # nothing
        ]),
    })
    df = chunk_documents(t).to_pandas()
    d1 = df[df["doc_id"] == 1]
    assert d1["chunk_no"].tolist() == [1, 2]
    assert d1["n_tokens"].tolist() == [16, 12]
    assert d1.iloc[1]["chunk"].split()[0] == "t8"  # stride-8 overlap
    assert df[df["doc_id"] == 2]["n_tokens"].tolist() == [16]
    assert df[df["doc_id"] == 3]["n_tokens"].tolist() == [5]
    assert (df["doc_id"] == 4).sum() == 0


@pytest.mark.usefixtures("ray_session")
def test_group_zscore_bucket_join_fallback_path():
    """Forcing broadcast_stats=0 exercises the wide-key-domain
    bucket_join fallback; output equals the broadcast path exactly."""
    import ray.data

    from kgrecrun.ops.stats import group_zscore

    rng = np.random.RandomState(21)
    t = pa.table({
        "event_id": pa.array(np.arange(800), pa.int64()),
        "g": pa.array(np.take(np.array(["x", "y", "z"]),
                              rng.randint(0, 3, 800))),
        "x": pa.array(rng.randint(-50, 50, 800), pa.int64()),
    })
    dfs = []
    for thresh in (1_000_000, 0):
        ds = ray.data.from_arrow(t).repartition(4)
        df = (group_zscore(ds, key="g", x_col="x", id_cols=["event_id"],
                           broadcast_stats=thresh)
              .to_pandas().sort_values("event_id").reset_index(drop=True))
        dfs.append(df[["event_id", "g", "z6"]])
    pd.testing.assert_frame_equal(dfs[0], dfs[1])


def test_group_arg_extreme_winner_and_determinism():
    """Per-group argmax picks the lexicographic winner with the
    tie-break column deciding equal order values; output is identical
    across block layouts (map-side combiner + bucketed reduce)."""
    import ray.data

    from kgrecrun.ops.argext import group_arg_extreme

    t = pa.table({
        "k": pa.array([1, 1, 1, 2, 2, 3], pa.int64()),
        "v": pa.array([5, 9, 9, 2, 2, 7], pa.int64()),
        "id": pa.array([10, 11, 12, 20, 21, 30], pa.int64()),
        "payload": pa.array(list("abcdef")),
    })
    expect = {1: (9, 12, "c"), 2: (2, 21, "e"), 3: (7, 30, "f")}
    for nblocks in (1, 3, 6):
        ds = ray.data.from_arrow(t).repartition(nblocks)
        out = group_arg_extreme(
            ds, key="k",
            order_cols=[("v", "descending"), ("id", "descending")],
        ).to_pandas().sort_values("k").reset_index(drop=True)
        got = {r.k: (r.v, r.id, r.payload) for r in out.itertuples()}
        assert got == expect, nblocks


def test_set_op_intersect_except_distinct():
    """INTERSECT keeps keys on both sides once (bag→set), EXCEPT keeps
    left-only keys; duplicates collapse via the per-batch distinct
    combiner; identical across block layouts."""
    import ray.data

    from kgrecrun.ops.setops import set_op

    left = pa.table({"k": pa.array([1, 1, 2, 3, 5], pa.int64())})
    right = pa.table({"k": pa.array([2, 2, 3, 4], pa.int64())})
    for nblocks in (1, 4):
        l = ray.data.from_arrow(left).repartition(nblocks)
        r = ray.data.from_arrow(right).repartition(nblocks)
        both = sorted(set_op(l, r, keys=["k"], op="intersect")
                      .to_pandas()["k"].tolist())
        only = sorted(set_op(l, r, keys=["k"], op="except")
                      .to_pandas()["k"].tolist())
        assert both == [2, 3] and only == [1, 5], nblocks


def test_set_op_multicolumn_key():
    import ray.data

    from kgrecrun.ops.setops import set_op

    l = ray.data.from_arrow(pa.table({
        "a": pa.array([1, 1, 2], pa.int64()),
        "b": pa.array(["x", "y", "x"]),
    }))
    r = ray.data.from_arrow(pa.table({
        "a": pa.array([1, 2], pa.int64()),
        "b": pa.array(["y", "z"]),
    }))
    out = set_op(l, r, keys=["a", "b"], op="intersect").to_pandas()
    assert [(x.a, x.b) for x in out.itertuples()] == [(1, "y")]


def test_pivot_counts_wide_schema():
    import ray.data

    from kgrecrun.ops.relational import pivot_counts

    t = pa.table({
        "k": pa.array([1, 1, 1, 2], pa.int64()),
        "lab": pa.array(["a", "b", "a", "b"]),
    })
    out = (pivot_counts(ray.data.from_arrow(t).repartition(2),
                        key="k", label_col="lab", labels=["a", "b", "c"])
           .to_pandas().sort_values("k").reset_index(drop=True))
    assert out.columns.tolist() == ["k", "n_a", "n_b", "n_c"]
    assert out.values.tolist() == [[1, 2, 1, 0], [2, 0, 1, 0]]


def test_event_transitions_per_user_adjacency():
    """Pairs never cross user boundaries; counts aggregate globally."""
    import ray.data

    from kgrecrun.ops.window import event_transitions

    t = pa.table({
        "user_id": pa.array([1, 1, 1, 2, 2], pa.int64()),
        "event_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "ts": pa.array([10, 20, 30, 5, 6], pa.timestamp("us")),
        "event_type": pa.array(["v", "c", "v", "v", "c"]),
    })
    out = event_transitions("", events_ds=ray.data.from_arrow(t).repartition(3))
    got = {(r.prev_type, r.next_type): r.n for r in out.to_pandas().itertuples()}
    assert got == {("v", "c"): 2, ("c", "v"): 1}


def test_daily_new_users_first_seen_and_cumulative():
    import ray.data

    from kgrecrun.ops.window import daily_new_users

    day_us = 86_400_000_000
    t = pa.table({
        "user_id": pa.array([1, 1, 2, 3, 3], pa.int64()),
        "ts": pa.array([0, 2 * day_us, day_us, day_us, 2 * day_us],
                       pa.timestamp("us")),
    })
    out = daily_new_users("", events_ds=ray.data.from_arrow(t).repartition(2)).to_pandas()
    assert out["day"].tolist() == ["1970-01-01", "1970-01-02"]
    assert out["n_new"].tolist() == [1, 2]
    assert out["cum_users"].tolist() == [1, 3]


def test_weighted_hash_sample_caps_and_proportion():
    """Rows at/above target always survive; lighter rows keep the exact
    integer-threshold fraction; decision is layout-independent."""
    import ray.data

    from kgrecrun.ops.sample import weighted_hash_sample

    n = 400
    t = pa.table({
        "doc_id": pa.array(np.arange(n), pa.int64()),
        "w": pa.array([500] * (n // 2) + [100] * (n // 2), pa.int64()),
    })
    kept = []
    for nblocks in (1, 5):
        ds = ray.data.from_arrow(t).repartition(nblocks)
        out = weighted_hash_sample(ds, weight_col="w", target=400).to_pandas()
        kept.append(sorted(out["doc_id"].tolist()))
    assert kept[0] == kept[1]
    heavy = [d for d in kept[0] if d < n // 2]
    light = [d for d in kept[0] if d >= n // 2]
    assert len(heavy) == n // 2          # p=1: all heavy rows kept
    assert 0 < len(light) < n // 2       # p=0.25: strict subset


def test_interval_attribution_many_to_many_covers():
    """Every covering window matches (overlapping intervals emit
    multiple rows per point); out-of-window and cross-user points
    don't."""
    import ray.data

    from kgrecrun.ops.temporal import interval_attribution

    pts = ray.data.from_arrow(pa.table({
        "user_id": pa.array([1, 1, 2], pa.int64()),
        "p_id": pa.array([100, 101, 102], pa.int64()),
        "p_ts": pa.array([50, 500, 50], pa.int64()),
    }))
    ivs = ray.data.from_arrow(pa.table({
        "user_id": pa.array([1, 1, 2], pa.int64()),
        "v_id": pa.array([7, 8, 9], pa.int64()),
        "v_ts": pa.array([0, 40, 300], pa.int64()),
    }))
    out = interval_attribution(
        pts, ivs, key="user_id", point_ts="p_ts", start_ts="v_ts",
        width_us=100, point_cols=["user_id", "p_id"],
        interval_cols=["v_id"],
    ).to_pandas().sort_values(["p_id", "v_id"]).reset_index(drop=True)
    got = [(r.p_id, r.v_id, r.delay_us) for r in out.itertuples()]
    # point 100 covered by both user-1 windows; 500 by none (too late);
    # user-2 point at 50 precedes its window at 300
    assert got == [(100, 7, 50), (100, 8, 10)]


def test_dup_spans_overlapping_windows_and_hot_span_counts():
    """A span repeated within one doc and across docs is reported with
    exact occurrence/doc counts; unique text contributes nothing."""
    import ray.data

    boiler = "all rights reserved contact us for more info"  # 8 tokens
    t = _docs_table([
        f"{boiler} alpha beta gamma delta {boiler}",
        f"intro words here then {boiler} tail one two three",
        "totally unique sentence with no repeated window at all here",
    ])
    out = dedup.dup_spans(ray.data.from_arrow(t).repartition(3),
                          w=8, stride=4).to_pandas()
    import hashlib
    h = hashlib.md5(boiler.encode()).hexdigest()
    row = out[out["span_h"] == h]
    assert len(row) == 1
    # doc0 has it at tokens 0 and 12 (stride 4 hits both), doc1 at 4
    assert int(row["n_occ"].iloc[0]) == 3
    assert int(row["n_docs"].iloc[0]) == 2


def test_global_cummax_matches_numpy(ray_session):
    """Distributed shifted cummax == the single-machine sweep, across a
    shuffled block layout and a range width that splits the stream."""
    import numpy as np
    import ray.data

    from kgrecrun.ops.window import global_cummax

    rng = np.random.default_rng(7)
    n = 5000
    order = rng.permutation(n).astype(np.int64)  # non-contiguous arrival
    vals = rng.integers(-1000, 1000, n).astype(np.int64)
    ds = ray.data.from_arrow(pa.table({
        "oid": pa.array(order, pa.int64()),
        "v": pa.array(vals, pa.int64()),
    })).repartition(13)
    out = global_cummax(ds, order_col="oid", value_col="v",
                        range_width=257).to_pandas()
    out = out.sort_values("oid").reset_index(drop=True)
    srt = np.argsort(order)
    v_sorted = vals[srt]
    exp_prev = np.empty(n, np.int64)
    exp_prev[0] = v_sorted[0]
    np.maximum.accumulate(v_sorted[:-1], out=exp_prev[1:])
    exp_rec = np.ones(n, np.int64)
    exp_rec[1:] = (v_sorted[1:] > exp_prev[1:]).astype(np.int64)
    assert (out["value"].to_numpy() == v_sorted).all()
    assert (out["prev_max"].to_numpy() == exp_prev).all()
    assert (out["is_record"].to_numpy() == exp_rec).all()


def test_quantile_band_filter_rule(ray_session):
    """The explicit ceil(q·N) threshold rule, including the tie run at
    the boundary value."""
    import ray.data

    from kgrecrun.ops.sample import quantile_band_filter

    # 10 rows: values 1..8 with 5 repeated 3x → N=10
    vals = [1, 2, 3, 4, 5, 5, 5, 6, 7, 8]
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(10), pa.int64()),
        "n": pa.array(vals, pa.int64()),
    })).repartition(3)
    out = quantile_band_filter(ds, value_col="n", q_lo=0.2,
                               q_hi=0.8).to_pandas()
    # t(0.2): ceil(2.0)=2 → v=2; t(0.8): ceil(8.0)=8 → cum(5)=7,
    # cum(6)=8 → v=6; band [2, 6] keeps 7 rows incl. every 5
    assert sorted(out["n"].tolist()) == [2, 3, 4, 5, 5, 5, 6]


def test_source_segment_overlap_counts(ray_session):
    """Planted shared segments: sources A/B share 2 distinct segment
    contents, B/C share 1, A/C none; a segment repeated WITHIN a source
    counts once; block layout must not matter."""
    import ray.data

    from kgrecrun.ops.dedup import source_segment_overlap

    seg1 = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"
    seg2 = "x1 x2 x3 x4 x5 x6 x7 x8 x9 x10"
    seg3 = "y1 y2 y3 y4 y5 y6 y7 y8 y9 y10"
    rows = [
        ("A", seg1 + " " + seg2),
        ("A", seg1),                      # repeat within A: counts once
        ("B", seg2 + " " + seg1),
        ("B", seg3),
        ("C", seg3 + " " + "z1 z2 z3"),   # short tail segment, C-only
    ]
    ds = ray.data.from_arrow(pa.table({
        "source": pa.array([r[0] for r in rows], pa.string()),
        "text": pa.array([r[1] for r in rows], pa.string()),
    })).repartition(3)
    got = {(r["s1"], r["s2"]): r["n_shared"]
           for r in source_segment_overlap(ds).take_all()}
    assert got == {("A", "B"): 2, ("B", "C"): 1}


def test_user_gap_histogram(ray_session):
    """Gaps bucket to minutes per user; cross-user boundaries emit no
    gap; single-event users emit nothing."""
    import ray.data

    from kgrecrun.ops.window import user_gap_histogram

    us = 1_000_000
    rows = [  # user, ts_us
        (1, 0), (1, 30 * us), (1, 90 * us),          # gaps 0min, 1min
        (2, 0), (2, 3600 * us),                      # gap 60min
        (3, 500 * us),                               # single event
    ]
    ds = ray.data.from_arrow(pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
    })).repartition(2)
    got = {r["gap_min"]: r["n"]
           for r in user_gap_histogram(events_ds=ds).take_all()}
    assert got == {0: 1, 1: 1, 60: 1}


def test_png_codec_roundtrip_all_filters():
    from kgrecrun.ops import media as M

    rng = np.random.RandomState(7)
    for ft in range(5):  # every PNG row filter is a valid encoding
        g = rng.randint(0, 256, size=(23, 17), dtype=np.uint8)
        assert (M.decode_png(M.encode_png(g, filter_type=ft)) == g).all()
    # RGB / RGBA / gray+alpha decode (channel mean, alpha dropped)
    import struct
    import zlib

    px = rng.randint(0, 256, size=(5, 6, 4), dtype=np.uint8)
    raw = b"".join(b"\x00" + px[y].tobytes() for y in range(5))
    ihdr = struct.pack(">IIBBBBB", 6, 5, 8, 6, 0, 0, 0)
    data = (M._PNG_MAGIC + M._png_chunk(b"IHDR", ihdr)
            + M._png_chunk(b"IDAT", zlib.compress(raw))
            + M._png_chunk(b"IEND", b""))
    want = px[:, :, :3].mean(axis=2).astype(np.uint8)
    assert (M.decode_png(data) == want).all()
    # palette / 16-bit stay a documented seam
    import pytest as _pytest

    ihdr3 = struct.pack(">IIBBBBB", 6, 5, 8, 3, 0, 0, 0)
    bad = (M._PNG_MAGIC + M._png_chunk(b"IHDR", ihdr3)
           + M._png_chunk(b"IDAT", zlib.compress(raw))
           + M._png_chunk(b"IEND", b""))
    with _pytest.raises(NotImplementedError):
        M.decode_png(bad)


def test_ahash_planted_invariances():
    from kgrecrun.ops import media as M

    rng = np.random.RandomState(11)
    gray = rng.randint(10, 246, size=(32, 32)).astype(np.uint8)
    h0 = M.ahash64(gray)
    # container swap: PNG decode reproduces the exact pixels
    assert M.ahash64(M.decode_png(M.encode_png(gray))) == h0
    # clip-free brightness shift: cells and mean shift together
    assert M.ahash64(gray + 3) == h0
    # exact 2x upscale: repeated tiles pool to identical means
    assert M.ahash64(np.repeat(np.repeat(gray, 2, 0), 2, 1)) == h0
    # an independent image hashes far away
    other = rng.randint(10, 246, size=(32, 32)).astype(np.uint8)
    assert bin(h0 ^ M.ahash64(other)).count("1") > 10


def test_phash_dedup_planted_groups():
    import ray.data

    from kgrecrun.ops import media as M

    n = 100  # 20 groups of 5: base + 3 variants + 1 negative control
    t = M.synth_image_corpus(range(n))
    out = M.phash_dedup(ray.data.from_arrow(t)).to_pandas()
    assert len(out) == n
    got = dict(zip(out["media_id"], out["root_id"]))
    for mid in range(n):
        want = mid - mid % 5 if mid % 5 < 4 else mid
        assert got[mid] == want, (mid, got[mid], want)


def test_cm_sketch_counts_one_sided_exactness():
    import ray.data

    from kgrecrun.ops.sample import _hash64
    from kgrecrun.ops.stats import cm_sketch_counts

    rng = np.random.RandomState(5)
    vals = [f"v{i}" for i in range(400)]
    weights = rng.randint(1, 50, size=400)
    weights[:5] = [500, 400, 300, 200, 150]  # heavy probes
    t = pa.table({"v": pa.array(vals), "n": pa.array(weights, pa.int64())})
    out = cm_sketch_counts(
        ray.data.from_arrow(t).repartition(4), value_col="v",
        weight_col="n", probe_min_weight=100,
    ).to_pandas().set_index("v")
    assert set(out.index) == {"v0", "v1", "v2", "v3", "v4"}
    # brute-force the same registers
    d, w = 4, 1024
    regs = np.zeros(d * w, dtype=np.int64)
    for i in range(d):
        h = _hash64([f"{i}|{v}" for v in vals])
        np.add.at(regs, (h % np.uint64(w)).astype(np.int64) + i * w, weights)
    for v in out.index:
        exact = int(weights[vals.index(v)])
        est = min(int(regs[int(_hash64([f"{i}|{v}"])[0] % np.uint64(w)) + i * w])
                  for i in range(d))
        assert out.loc[v, "n_exact"] == exact
        assert out.loc[v, "est_count"] == est >= exact


def test_group_mad_matches_numpy():
    import ray.data

    from kgrecrun.ops.stats import group_mad

    rng = np.random.RandomState(9)
    keys = rng.choice(["a", "b", "c"], size=500)
    cents = rng.randint(0, 10_000, size=500)
    t = pa.table({"k": pa.array(keys), "cents": pa.array(cents, pa.int64())})
    out = group_mad(
        ray.data.from_arrow(t).repartition(4), key="k",
        value_cents=lambda b: b["cents"],
    ).to_pandas().set_index("k")
    for k in "abc":
        v = cents[keys == k].astype(np.float64)
        med = float(np.median(v))
        mad = float(np.median(np.abs(v - med)))
        assert out.loc[k, "median_cents"] == med
        assert out.loc[k, "mad_cents"] == mad


def test_sorted_store_prunes_and_matches(tmp_path):
    import ray.data

    from kgrecrun.runtime.sortedstore import (lookup, pruned_files,
                                              write_sorted_store)

    t = pa.table({
        "k": pa.array(list(range(10_000)), pa.int64()),
        "v": pa.array([i * 7 % 1000 for i in range(10_000)], pa.int64()),
    })
    out = str(tmp_path / "store")
    zm = write_sorted_store(
        ray.data.from_arrow(t).repartition(16), out, key="k")
    assert len(zm) >= 8  # multiple range files
    probes = [3, 4111, 9999]
    files, total = pruned_files(out, probes)
    assert 0 < len(files) < total  # the zone map actually prunes
    got = lookup(out, key="k", keys=probes).to_pandas().sort_values("k")
    assert list(got["k"]) == probes
    assert list(got["v"]) == [k * 7 % 1000 for k in probes]
    # idempotent: a second writer call reuses the complete store
    zm2 = write_sorted_store(
        ray.data.from_arrow(t).repartition(16), out, key="k")
    assert zm2 == zm


def test_neardup_ingest_planted_and_novel():
    """Incoming near-dup of a base doc resolves to that base id; novel
    incoming docs get -1; base docs never appear in the output."""
    import ray.data

    from kgrecrun.ops.dedup import neardup_ingest
    from kgrecrun.ops.sample import _hash64

    base_text = " ".join(f"tok{i}" for i in range(60))
    ids = list(range(1, 400))
    is_base = (_hash64(ids) % np.uint64(10)) < np.uint64(9)
    inc_ids = [i for i, b in zip(ids, is_base) if not b]
    base_ids = [i for i, b in zip(ids, is_base) if b]
    dup_inc, novel_inc = inc_ids[0], inc_ids[1]
    anchor = base_ids[0]
    texts = {}
    for i in ids:
        texts[i] = f"unique{i} " + " ".join(f"u{i}w{j}" for j in range(40))
    texts[anchor] = base_text
    texts[dup_inc] = base_text + " tail"          # jaccard >> 0.7
    texts[novel_inc] = " ".join(f"n{j}" for j in range(40))
    t = pa.table({"doc_id": pa.array(ids, pa.int64()),
                  "text": pa.array([texts[i] for i in ids])})
    out = (neardup_ingest(ray.data.from_arrow(t).repartition(4))
           .to_pandas().set_index("doc_id"))
    assert set(out.index) == set(inc_ids)
    assert out.loc[dup_inc, "dup_of"] == anchor
    assert out.loc[novel_inc, "dup_of"] == -1


def test_phash_topk_planted_neighbors():
    import ray.data

    from kgrecrun.ops import media as M

    t = M.synth_image_corpus(range(100))
    out = (M.phash_topk(ray.data.from_arrow(t), probe_ids=[1, 6], k=3)
           .to_pandas())
    for probe, base in ((1, 0), (6, 5)):
        rows = out[out["probe_id"] == probe].sort_values("rank")
        # top-1 = the group base at hamming 0 (ids 0,2,3 all hash-equal
        # to probe 1; smallest id wins the tie)
        assert rows.iloc[0]["media_id"] == base
        assert rows.iloc[0]["hamming"] == 0
        assert list(rows["rank"]) == [1, 2, 3]
        assert probe not in set(rows["media_id"])  # self excluded


@pytest.mark.usefixtures("ray_session")
def test_compact_stores_zero_shuffle_merge(tmp_path):
    """LSM compaction of 3 fully-overlapping sorted runs: the merged
    store is complete (every row exactly once), each output file is
    sorted, file key ranges are disjoint, output is balanced (more
    than one file at a small target), lookups work, and a second
    compact call is idempotent."""
    import json as _json

    import pyarrow.parquet as _pq
    import ray.data

    from kgrecrun.runtime.sortedstore import (ZONEMAP, compact_stores,
                                              lookup, write_sorted_store)

    n = 9_000
    t = pa.table({
        "k": pa.array(list(range(n)), pa.int64()),
        "v": pa.array([i * 13 % 997 for i in range(n)], pa.int64()),
    })
    runs = []
    for r in range(3):  # hash-split: every run spans the full range
        sub = t.filter(pa.array([i % 3 == r for i in range(n)]))
        d = str(tmp_path / f"run{r}")
        write_sorted_store(ray.data.from_arrow(sub).repartition(5),
                           d, key="k")
        runs.append(d)
    out = str(tmp_path / "merged")
    zm = compact_stores(runs, out, key="k", target_rows_per_file=2_000)
    assert len(zm) > 1  # balanced: the plan actually split ranges

    prev_max = None
    seen = []
    for name in sorted(zm):
        part = _pq.read_table(f"{out}/{name}")
        ks = part["k"].to_numpy()
        assert (np.diff(ks) >= 0).all()          # sorted within file
        assert ks[0] == zm[name]["min"] and ks[-1] == zm[name]["max"]
        if prev_max is not None:
            assert ks[0] > prev_max              # disjoint ranges
        prev_max = ks[-1]
        seen.append(part)
    merged = pa.concat_tables(seen)
    assert merged.num_rows == n                  # complete, no dups
    assert sorted(merged["k"].to_pylist()) == list(range(n))

    got = lookup(out, key="k", keys=[0, 4444, 8999]).to_pandas()
    assert sorted(got["k"]) == [0, 4444, 8999]
    assert list(got.sort_values("k")["v"]) == [
        k * 13 % 997 for k in (0, 4444, 8999)]

    zm2 = compact_stores(runs, out, key="k", target_rows_per_file=2_000)
    assert zm2 == zm                             # idempotent re-run
    with open(f"{out}/{ZONEMAP}") as f:
        assert _json.load(f) == zm


@pytest.mark.usefixtures("ray_session")
def test_decayed_score_exact_and_shard_invariant():
    """decayed_score == Σ 2^(cap − age_days) per key over events within
    the cap, exactly, independent of blocking."""
    import ray.data

    from kgrecrun.ops.stats import decayed_score

    us_day = 86_400_000_000
    ref_day = 20_000  # days since epoch
    rows = []  # (user, age_days, µs-of-day offset)
    for u in range(40):
        for j in range(u % 7 + 1):
            age = (u * 31 + j * 17) % 60  # some beyond the 40-day cap
            rows.append((u, age, (u + j) * 1_000_003))
    ts = pa.array([(ref_day - a) * us_day + off for _, a, off in rows],
                  pa.timestamp("us"))
    t = pa.table({"u": pa.array([r[0] for r in rows], pa.int64()),
                  "ts": ts})

    expect_n, expect_s = {}, {}
    for u, age, _ in rows:
        if age <= 40:
            expect_n[u] = expect_n.get(u, 0) + 1
            expect_s[u] = expect_s.get(u, 0) + (1 << (40 - age))

    def run(blocks):
        out = decayed_score(
            ray.data.from_arrow(t).repartition(blocks),
            key="u", ts_col="ts", ref_day=ref_day, cap_days=40,
        ).to_pandas().set_index("u")
        return out

    a = run(3)
    assert set(a.index) == set(expect_n)
    for u in expect_n:
        assert a.loc[u, "n_recent"] == expect_n[u]
        assert a.loc[u, "decay_score"] == expect_s[u]
    b = run(9)
    assert a.sort_index().equals(b.sort_index())


@pytest.mark.usefixtures("ray_session")
def test_hll_overlap_accuracy_and_shard_invariance():
    """hll_overlap estimates |A|, |B|, |A∪B|, |A∩B| within ~5% on a
    planted 50% overlap, identically across blockings, and consistency
    holds: intersection = left + right − union exactly (by
    construction) and per-side estimates equal hll_distinct's."""
    import ray.data

    from kgrecrun.ops.stats import hll_overlap

    nl, nr, shared = 60_000, 40_000, 20_000
    left = np.arange(nl)                          # 0 .. 59_999
    right = np.arange(nl - shared, nl - shared + nr)  # 40k .. 79_999
    lt = pa.table({"a": pa.array(np.concatenate([left, left[:500]]),
                                 pa.int64())})    # dups don't matter
    rt = pa.table({"b": pa.array(right, pa.int64())})

    def run(blocks):
        out = hll_overlap(
            ray.data.from_arrow(lt).repartition(blocks),
            ray.data.from_arrow(rt).repartition(blocks),
            left_col="a", right_col="b",
        ).to_pandas().iloc[0]
        return out

    e = run(3)
    assert abs(e["est_left"] - nl) / nl < 0.05
    assert abs(e["est_right"] - nr) / nr < 0.05
    assert abs(e["est_union"] - (nl + nr - shared)) / (nl + nr - shared) < 0.05
    assert abs(e["est_intersection"] - shared) / shared < 0.15
    assert e["est_intersection"] == pytest.approx(
        e["est_left"] + e["est_right"] - e["est_union"], abs=1e-9)
    f = run(7)
    assert e.equals(f)  # register maxima are associative


@pytest.mark.usefixtures("ray_session")
def test_zorder_store_box_pruning(tmp_path):
    """Z-order clustering: box queries return exactly the brute-force
    rows, and the zone map prunes files for thin boxes in EITHER
    dimension (the property a 1-D sort cannot give)."""
    import ray.data

    from kgrecrun.runtime.zorder import (box_files, box_lookup, zdecode,
                                         write_zorder_store, zvalue)

    # round-trip of the bit interleave
    a = np.array([0, 1, 5, 2**31 - 1, 12345], np.int64)
    b = np.array([0, 2**31 - 1, 7, 3, 54321], np.int64)
    za = zvalue(a, b)
    ra, rb = zdecode(za)
    assert (ra == a).all() and (rb == b).all()
    # monotone per coordinate: box image inside corner z-interval
    assert zvalue([3], [4])[0] <= zvalue([5], [4])[0]
    assert zvalue([3], [4])[0] <= zvalue([3], [9])[0]

    n = 256
    g = np.arange(n * n, dtype=np.int64)
    t = pa.table({"x": g % n, "y": g // n,
                  "v": pa.array(g * 7 % 1009, pa.int64())})
    out = str(tmp_path / "zstore")
    zm = write_zorder_store(
        ray.data.from_arrow(t).repartition(32), out, cols=("x", "y"))
    assert len(zm) >= 16

    def brute(lo, hi):
        m = ((t["x"].to_numpy() >= lo[0]) & (t["x"].to_numpy() <= hi[0])
             & (t["y"].to_numpy() >= lo[1]) & (t["y"].to_numpy() <= hi[1]))
        return t.filter(pa.array(m))

    for lo, hi in [((10, 0), (15, 255)),    # thin in x, full in y
                   ((0, 100), (255, 105)),  # full in x, thin in y
                   ((40, 60), (80, 90)),    # interior box
                   ((200, 200), (255, 255))]:
        got = (box_lookup(out, lo, hi, columns=["x", "y", "v"])
               .to_pandas().sort_values(["x", "y"]).reset_index(drop=True))
        want = brute(lo, hi).to_pandas().sort_values(
            ["x", "y"]).reset_index(drop=True)
        assert got.equals(want)
        files, total = box_files(out, lo, hi)
        assert len(files) < total * 0.7  # pruned in BOTH thin dims

    # empty box off the grid
    assert box_lookup(out, (300, 300), (400, 400)).count() == 0


@pytest.mark.usefixtures("ray_session")
def test_maintain_agg_matches_recompute():
    """Incremental aggregate maintenance == full recompute: inserts on
    existing and NEW keys, partial deletes, and a key deleted down to
    zero rows (must vanish from the view)."""
    import ray.data

    from kgrecrun.ops.cdc import maintain_agg

    base = pa.table({
        "k": pa.array([1, 1, 2, 3, 3, 3], pa.int64()),
        "v": pa.array([10, 20, 5, 1, 2, 3], pa.int64()),
    })
    import pyarrow.compute as pc

    agg = base.group_by("k").aggregate([("v", "count"), ("v", "sum")])
    agg = pa.table({"k": agg["k"],
                    "n": pc.cast(agg["v_count"], pa.int64()),
                    "v": agg["v_sum"]})
    delta = pa.table({
        "k": pa.array([1, 2, 4, 4, 3, 3, 3], pa.int64()),
        "v": pa.array([7, 5, 100, 200, 1, 2, 3], pa.int64()),
        "op": pa.array(["insert", "delete", "insert", "insert",
                        "delete", "delete", "delete"]),
    })
    out = maintain_agg(
        ray.data.from_arrow(agg).repartition(2),
        ray.data.from_arrow(delta).repartition(3),
        key="k", sum_cols=["v"],
    ).to_pandas().set_index("k").sort_index()
    # recompute: k1 {10,20,7}, k2 {} (deleted to zero), k3 deleted all,
    # k4 new {100,200}
    assert list(out.index) == [1, 4]
    assert out.loc[1, "n"] == 3 and out.loc[1, "v"] == 37
    assert out.loc[4, "n"] == 2 and out.loc[4, "v"] == 300


@pytest.mark.usefixtures("ray_session")
def test_late_data_windows_watermark_semantics():
    """Watermark replay == a brute-force single-threaded simulation:
    per arrival, watermark = max(prior event times) − delay; late iff
    event time < watermark; counts roll into tumbling event-time
    windows. Includes arrival-time ties (tie_col order) and a first
    arrival (on-time by definition). Shard-invariant."""
    import ray.data

    from kgrecrun.ops.window import late_data_windows

    rng_rows = []
    # (event_id, ts, arrival): arrival = ts + deterministic jitter,
    # two rows share an arrival instant (tie broken by id)
    W, D = 100, 10
    data = [
        (1, 50, 55), (2, 90, 91), (3, 60, 92),   # 3: wm=90-10=80 > 60 late
        (4, 95, 93), (5, 70, 93),                # tie: 4 before 5; 5 late
        (6, 300, 301), (7, 310, 302),
        (8, 280, 303),                           # wm=310-10=300 > 280 late
        (9, 299, 304),                           # wm=300, 299<300 late
    ]
    del rng_rows
    t = pa.table({
        "event_id": pa.array([r[0] for r in data], pa.int64()),
        "ts_us": pa.array([r[1] for r in data], pa.int64()),
        "arrival_us": pa.array([r[2] for r in data], pa.int64()),
    })

    # brute-force reference
    byarr = sorted(data, key=lambda r: (r[2], r[0]))
    seen_max, flags = None, {}
    for eid, ts, _arr in byarr:
        late = seen_max is not None and ts < seen_max - D
        flags[eid] = late
        seen_max = ts if seen_max is None else max(seen_max, ts)
    expect = {}
    for eid, ts, _ in data:
        w = ts // W * W
        on, la = expect.get(w, (0, 0))
        expect[w] = (on + (not flags[eid]), la + flags[eid])

    def run(blocks, width):
        out = late_data_windows(
            ray.data.from_arrow(t).repartition(blocks),
            arrival_col="arrival_us", tie_col="event_id",
            ts_col="ts_us", delay_us=D, window_us=W,
            range_width=width,
        ).to_pandas().set_index("window_start_us").sort_index()
        return out

    a = run(3, 64)
    assert {w: (r["n_ontime"], r["n_late"]) for w, r in a.iterrows()} \
        == expect
    b = run(5, 7)  # ranges split mid-stream: prefix handoff exercised
    assert a.equals(b)


@pytest.mark.usefixtures("ray_session")
def test_sssp_weighted_and_round_cap():
    """Bellman–Ford: a weighted shortcut loses to the cheaper 2-hop
    path; the round cap yields exactly d_rounds of the recurrence
    (pre-convergence states match an unrolled reference)."""
    import ray.data

    from kgrecrun.ops.graph import sssp_distances

    edges = pa.table({
        "src": pa.array([1, 2, 1, 3, 4, 5], pa.int64()),
        "dst": pa.array([2, 3, 3, 4, 5, 6], pa.int64()),
        "w":   pa.array([5, 5, 20, 1, 1, 1], pa.int64()),
    })

    def reference(rounds):
        adj = {}
        for s, d, w in zip(edges["src"].to_pylist(),
                           edges["dst"].to_pylist(),
                           edges["w"].to_pylist()):
            adj.setdefault(s, []).append((d, w))
            adj.setdefault(d, []).append((s, w))
        dist = {1: 0}
        for _ in range(rounds):
            nd = dict(dist)
            for u, du in dist.items():
                for v, w in adj[u]:
                    if du + w < nd.get(v, 1 << 62):
                        nd[v] = du + w
            dist = nd
        return dist

    for rounds in (2, 12):
        got = dict(sssp_distances(
            ray.data.from_arrow(edges).repartition(3), rounds=rounds,
        ).to_pandas().itertuples(index=False, name=None))
        assert got == reference(rounds)
    # converged values: shortcut 1-3 (20) loses to 1-2-3 (10)
    assert reference(12) == {1: 0, 2: 5, 3: 10, 4: 11, 5: 12, 6: 13}


@pytest.mark.usefixtures("ray_session")
def test_sample_quantiles_deterministic_and_accurate():
    """Bottom-k hash sample: shard-invariant (identical estimates for
    any blocking), within ~4/sqrt(k) of the true quantiles on a known
    distribution, and exactly the full-data quantiles when k >= n."""
    import ray.data

    from kgrecrun.ops.sample import sample_quantiles

    n = 50_000
    vals = np.arange(n, dtype=np.int64)  # uniform 0..n-1
    t = pa.table({"id": pa.array(np.arange(n), pa.int64()),
                  "cents": pa.array(vals, pa.int64())})

    def run(blocks, k):
        out = sample_quantiles(
            ray.data.from_arrow(t).repartition(blocks),
            id_fn=lambda b: b["id"].to_pylist(),
            cents_fn=lambda b: b["cents"], k=k,
            qs=(0.25, 0.5, 0.75),
        ).to_pandas()
        return dict(zip(out["q"], out["qv"]))

    a, b = run(4, 1600), run(11, 1600)
    assert a == b  # deterministic sample: blocking-invariant
    for q, qv in a.items():
        assert abs(qv / n - q) < 4 / np.sqrt(1600)
    # k >= n degenerates to the exact full-data quantiles
    full = run(5, n + 10)
    assert full[0.5] == (n - 1) / 2
    assert full[0.25] == (n - 1) * 0.25


@pytest.mark.usefixtures("ray_session")
def test_peak_concurrency_sweep():
    """Sweep-line peak == brute-force boundary simulation: touching
    closed intervals overlap (start ties before end), multi-window
    spans, and prefix handoff across cumsum ranges (tiny width)."""
    import ray.data

    from kgrecrun.ops.window import global_cumsum, peak_concurrency

    W = 100
    iv = [(5, 40), (10, 20), (20, 30),    # t=20: end meets start -> 3
          (150, 260), (155, 160),         # spans windows 1 and 2
          (250, 255)]
    t = pa.table({
        "start_us": pa.array([a for a, _ in iv], pa.int64()),
        "end_us": pa.array([b for _, b in iv], pa.int64()),
    })

    # brute force at boundary instants
    bounds = sorted([(a, 0, 1) for a, _ in iv] + [(b, 1, -1) for _, b in iv])
    conc, by_w = 0, {}
    for tt, _tie, d in bounds:
        conc += d
        w = tt // W * W
        by_w[w] = max(by_w.get(w, -1 << 62), conc)

    def run(blocks, width):
        out = peak_concurrency(
            ray.data.from_arrow(t).repartition(blocks),
            start_col="start_us", end_col="end_us", window_us=W,
            range_width=width,
        ).to_pandas().set_index("window_start_us").sort_index()
        return dict(out["peak"])

    a = run(3, 7)
    assert a == by_w
    assert a == run(2, 1000)  # single range vs many: same result
    # the underlying prefix sum is exact in order
    run_tbl = global_cumsum(
        ray.data.from_arrow(pa.table({
            "t": pa.array([1, 1, 2, 3], pa.int64()),
            "d": pa.array([1, 1, -1, -1], pa.int64()),
            "tie": pa.array([0, 0, 1, 1], pa.int64()),
        })).repartition(2),
        order_col="t", value_col="d", tie_col="tie", range_width=2,
    ).to_pandas().sort_values(["t", "tie"])
    assert list(run_tbl["running"]) == [1, 2, 1, 0]


@pytest.mark.usefixtures("ray_session")
def test_chi_square_matches_reference():
    """chi_square cell table == a scipy-free hand computation on a
    known contingency table, shard-invariant."""
    import ray.data

    from kgrecrun.ops.stats import chi_square

    # planted 2x2: a/x 30, a/y 10, b/x 20, b/y 40
    pairs = [("a", "x")] * 30 + [("a", "y")] * 10 \
        + [("b", "x")] * 20 + [("b", "y")] * 40
    t = pa.table({"g": pa.array([p[0] for p in pairs]),
                  "h": pa.array([p[1] for p in pairs])})

    def run(blocks):
        out = chi_square(ray.data.from_arrow(t).repartition(blocks),
                         a_col="g", b_col="h").to_pandas()
        return out.set_index(["g", "h"]).sort_index()

    a = run(3)
    n = 100
    row = {"a": 40, "b": 60}
    col = {"x": 50, "y": 50}
    for (g, h), r in a.iterrows():
        e = row[g] * col[h] / n
        assert r["expected6"] == round(e, 6)
        assert r["contrib6"] == pytest.approx(
            (r["o"] - e) ** 2 / e, abs=1e-6)
    assert a["o"].sum() == n
    assert a.equals(run(7))


@pytest.mark.usefixtures("ray_session")
def test_store_diff_merkle_reconciliation(tmp_path):
    """Replica diff: identical replicas hash equal everywhere (empty
    diff, fingerprint sidecars written); planted drop/mutate/add rows
    come back with the right statuses; re-diff reuses the cached
    fingerprints."""
    import os

    import ray.data

    from kgrecrun.runtime.sortedstore import (FPRINTS, store_diff,
                                              write_sorted_store)

    n = 4000
    t = pa.table({
        "k": pa.array(list(range(n)), pa.int64()),
        "lang": pa.array(["en" if i % 3 else "de" for i in range(n)]),
        "sz": pa.array([i * 11 % 97 for i in range(n)], pa.int64()),
    })
    a_dir, b_dir, c_dir = (str(tmp_path / x) for x in "abc")
    write_sorted_store(ray.data.from_arrow(t).repartition(8), a_dir,
                       key="k")
    write_sorted_store(ray.data.from_arrow(t).repartition(5), c_dir,
                       key="k")
    # identical content, different file layout -> empty diff
    out = store_diff(a_dir, c_dir, key="k", columns=["lang", "sz"],
                     target_rows_per_range=500)
    assert out.count() == 0
    assert os.path.exists(f"{a_dir}/{FPRINTS}")

    # planted divergence: drop 100-109, mutate sz of 2000-2004, add 9001
    mask = [not (100 <= i < 110) for i in range(n)]
    tb = t.filter(pa.array(mask))
    sz = tb["sz"].to_pylist()
    kk = tb["k"].to_pylist()
    for j, key in enumerate(kk):
        if 2000 <= key < 2005:
            sz[j] += 1
    tb = tb.set_column(2, "sz", pa.array(sz, pa.int64()))
    tb = pa.concat_tables([tb, pa.table({
        "k": pa.array([9001], pa.int64()),
        "lang": pa.array(["fr"]), "sz": pa.array([1], pa.int64())})])
    write_sorted_store(ray.data.from_arrow(tb).repartition(6), b_dir,
                       key="k")
    got = store_diff(a_dir, b_dir, key="k", columns=["lang", "sz"],
                     target_rows_per_range=500).to_pandas()
    by = {s: sorted(g["k"]) for s, g in got.groupby("status")}
    assert by["only_a"] == list(range(100, 110))
    assert by["mismatch"] == list(range(2000, 2005))
    assert by["only_b"] == [9001]
    # cached fingerprints: second call, same result
    got2 = store_diff(a_dir, b_dir, key="k", columns=["lang", "sz"],
                      target_rows_per_range=500).to_pandas()
    assert len(got2) == len(got)


@pytest.mark.usefixtures("ray_session")
def test_debounce_bursts():
    """Planted bursts: within a (user, type) key, events ≤ window after
    the PREVIOUS event are dropped (lag rule, not last-kept), firsts
    always kept, other keys untouched."""
    import ray.data

    from kgrecrun.ops.window import debounce

    us = 1_000_000
    rows = [  # (id, user, type, t_seconds)
        (1, 7, "v", 0), (2, 7, "v", 10), (3, 7, "v", 25),
        (4, 7, "v", 100),          # burst: 2,3 dropped (gap<=30); 4 kept
        (5, 7, "p", 5),            # different type: kept
        (6, 8, "v", 11),           # different user: kept
        (7, 8, "v", 11),           # same instant: gap 0 -> dropped
    ]
    t = pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "user_id": pa.array([r[1] for r in rows], pa.int64()),
        "event_type": pa.array([r[2] for r in rows]),
        "ts": pa.array([r[3] * us for r in rows], pa.timestamp("us")),
    })
    out = debounce(ray.data.from_arrow(t).repartition(3),
                   key_cols=["user_id", "event_type"], ts_col="ts",
                   tie_col="event_id", window_us=30 * us,
                   out_cols=["event_id"]).to_pandas()
    assert sorted(out["event_id"]) == [1, 4, 5, 6]


@pytest.mark.usefixtures("ray_session")
def test_join_size_profile_exact():
    """join_size_profile == len of the actual join, incl. multiplicity
    and a skew key; unmatched keys counted per side only."""
    import ray.data

    from kgrecrun.ops.joins import join_size_profile

    a = pa.table({"k": pa.array([1, 1, 1, 2, 3, 9], pa.int64())})
    b = pa.table({"k": pa.array([1, 1, 2, 2, 2, 4], pa.int64())})
    out = join_size_profile(
        ray.data.from_arrow(a).repartition(3),
        ray.data.from_arrow(b).repartition(2),
        left_key="k", right_key="k").to_pandas().iloc[0]
    # join rows: k1 3*2=6, k2 1*3=3 -> 9; matched 2; skew key k1 -> 6
    assert out["join_rows"] == 9
    assert out["matched_keys"] == 2
    assert out["left_keys"] == 4 and out["right_keys"] == 3
    assert out["max_key_rows"] == 6


@pytest.mark.usefixtures("ray_session")
def test_revenue_autocorr_pair_alignment():
    """The lagged-pair construction only pairs existing days and the
    resulting correlation matches numpy's Pearson r on those pairs."""
    import ray.data

    import __ray_entry__ as E

    out = E.queries()["revenue_autocorr"](SF_DIR).to_pandas() \
        .set_index("lag")
    import duckdb
    con = duckdb.connect()
    con.execute(f"CREATE VIEW lineitem AS SELECT * FROM "
                f"read_parquet('{SF_DIR}/lineitem.parquet')")
    d = con.execute("""
        SELECT epoch_us(l_shipdate) // 86400000000 AS day,
               CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT))
                    AS BIGINT) // 100 AS v
        FROM lineitem GROUP BY 1 ORDER BY 1""").fetchnumpy()
    days, v = d["day"], d["v"]
    idx = {int(dd): i for i, dd in enumerate(days)}
    for lag in (1, 7, 28):
        xs, ys = [], []
        for i, dd in enumerate(days):
            j = idx.get(int(dd) + lag)
            if j is not None:
                xs.append(v[i])
                ys.append(v[j])
        assert out.loc[lag, "n"] == len(xs)
        if len(xs) > 1 and np.std(xs) > 0 and np.std(ys) > 0:
            r = np.corrcoef(xs, ys)[0, 1]
            assert out.loc[lag, "corr6"] == pytest.approx(r, abs=1e-5)


@pytest.mark.usefixtures("ray_session")
def test_store_versions_immutable_timetravel(tmp_path):
    """Snapshot chain: v1 stays byte-stable after v2 commits; latest
    read returns v2; unknown version raises."""
    import ray.data

    from kgrecrun.runtime.sortedstore import (commit_version,
                                              read_store_version)

    t1 = pa.table({"k": pa.array([1, 2, 3], pa.int64()),
                   "v": pa.array(["a", "b", "c"])})
    t2 = pa.table({"k": pa.array([1, 2, 3, 4], pa.int64()),
                   "v": pa.array(["a", "B", "c", "d"])})
    d = str(tmp_path / "tbl")
    assert commit_version(d, ray.data.from_arrow(t1), key="k") == 1
    assert commit_version(d, ray.data.from_arrow(t2), key="k") == 2
    old = read_store_version(d, 1).to_pandas().sort_values("k")
    assert list(old["v"]) == ["a", "b", "c"]
    new = read_store_version(d).to_pandas().sort_values("k")
    assert list(new["v"]) == ["a", "B", "c", "d"]
    with pytest.raises(ValueError):
        read_store_version(d, 9)


@pytest.mark.usefixtures("ray_session")
def test_dup_span_strip_exact_coverage_and_clean_text():
    """A token is stripped iff some duplicated k-window covers it:
    within-doc repeats count, overlapping coverage unions, docs shorter
    than k pass through verbatim, fully-duplicated docs empty out;
    partitioning-invariant."""
    import ray.data

    w = lambda a, b: " ".join(f"t{i}" for i in range(a, b))
    dup8 = w(0, 8)                      # the duplicated window
    docs = [
        (1, dup8 + " " + w(100, 104)),           # dup at 0..7, tail kept
        (2, w(200, 204) + " " + dup8),           # dup at 4..11, head kept
        (3, dup8),                               # fully duplicated -> ''
        (4, w(300, 305)),                        # < k tokens, untouched
        (5, w(400, 409) + " " + w(400, 409)),    # within-doc repeat:
        # tokens 0..8 and 9..17 are both covered (windows at 0 and 9
        # repeat across the two halves); the k-1 bridging windows are
        # unique but coverage unions to the whole doc
    ]
    t = pa.table({
        "doc_id": pa.array([d for d, _ in docs], pa.int64()),
        "text": pa.array([x for _, x in docs]),
    })
    outs = []
    for parts in (1, 4):
        ds = ray.data.from_arrow(t).repartition(parts)
        df = (dedup.dup_span_strip(ds, k=8).to_pandas()
              .sort_values("doc_id").reset_index(drop=True))
        outs.append(df)
    assert outs[0].equals(outs[1])
    df = outs[0]
    assert df["doc_id"].tolist() == [1, 2, 3, 4, 5]
    assert df["n_tokens"].tolist() == [12, 12, 8, 5, 18]
    assert df["dup_tokens"].tolist() == [8, 8, 8, 0, 18]
    assert df["text_clean"].tolist() == [
        w(100, 104), w(200, 204), "", w(300, 305), ""]


@pytest.mark.usefixtures("ray_session")
def test_source_template_strip_within_source_min_docs():
    """A segment is a template only when >= min_docs DISTINCT docs of
    the SAME source contain it: every occurrence is stripped (no
    first-survivor), cross-source repeats are untouched, a repeat
    within one doc does not elect; per-doc counts and reassembly are
    exact; partitioning-invariant."""
    import ray.data

    w = lambda a, b: " ".join(f"t{i}" for i in range(a, b))
    boiler = w(0, 10)
    docs = [
        (1, "a", boiler + " " + w(100, 110)),   # template + own content
        (2, "a", boiler + " " + w(200, 210)),   # template + own content
        (3, "a", boiler),                        # all template -> ''
        (4, "b", boiler + " " + w(300, 310)),   # same seg, other source:
        # only one doc of b has it -> kept
        (5, "b", w(400, 410) + " " + w(400, 410)),  # within-doc repeat,
        # one distinct doc -> not a template
    ]
    t = pa.table({
        "doc_id": pa.array([d for d, _, _ in docs], pa.int64()),
        "source": pa.array([s for _, s, _ in docs], pa.string()),
        "text": pa.array([x for _, _, x in docs]),
    })
    outs = []
    for parts in (1, 4):
        ds = ray.data.from_arrow(t).repartition(parts)
        df = (dedup.source_template_strip(ds).to_pandas()
              .sort_values("doc_id").reset_index(drop=True))
        outs.append(df)
    assert outs[0].equals(outs[1])
    df = outs[0]
    assert df["doc_id"].tolist() == [1, 2, 3, 4, 5]
    assert df["n_segs"].tolist() == [2, 2, 1, 2, 2]
    assert df["n_template_segs"].tolist() == [1, 1, 1, 0, 0]
    assert df["text_clean"].tolist() == [
        w(100, 110), w(200, 210), "",
        boiler + " " + w(300, 310), w(400, 410) + " " + w(400, 410)]


@pytest.mark.usefixtures("ray_session")
def test_dup_span_strip_randomized_matches_duckdb():
    """Randomized cross-check on a tiny-vocab corpus (heavy accidental
    k-gram collisions, within- and cross-doc): engine output equals an
    independently-written DuckDB formulation value-exactly."""
    import duckdb
    import numpy as np
    import ray.data

    rng = np.random.default_rng(1234)
    vocab = [f"w{i}" for i in range(6)]
    texts = [" ".join(rng.choice(vocab, size=int(n)))
             for n in rng.integers(0, 30, size=120)]
    t = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })
    K = 3
    got = (dedup.dup_span_strip(
        ray.data.from_arrow(t).repartition(5), k=K).to_pandas()
        .sort_values("doc_id").reset_index(drop=True))

    con = duckdb.connect()
    con.register("documents", t)
    want = con.execute(rf"""
        WITH toks AS (
          SELECT doc_id,
                 list_filter(regexp_split_to_array(text, '\s+'),
                             x -> x <> '') AS ws
          FROM documents
        ), gh AS (
          SELECT doc_id, unnest(range(1, len(ws) - {K} + 2)) AS p,
                 ws FROM toks WHERE len(ws) >= {K}
        ), g2 AS (
          SELECT doc_id, p,
                 array_to_string(ws[p : p + {K} - 1], ' ') AS g FROM gh
        ), dup AS (SELECT g FROM g2 GROUP BY g HAVING COUNT(*) > 1),
        cov AS (
          SELECT DISTINCT doc_id, p + t.i AS ti
          FROM g2 JOIN dup USING (g) CROSS JOIN range({K}) t(i)
        ), tw AS (
          SELECT doc_id, unnest(range(1, len(ws) + 1)) AS ti, ws
          FROM toks
        ), tv AS (SELECT doc_id, ti, ws[ti] AS w FROM tw),
        kept AS (
          SELECT v.doc_id, v.ti, v.w FROM tv v
          ANTI JOIN cov c ON v.doc_id = c.doc_id AND v.ti = c.ti
        )
        SELECT b.doc_id, CAST(len(b.ws) AS BIGINT) AS n_tokens,
               CAST(COALESCE(d.n, 0) AS BIGINT) AS dup_tokens,
               COALESCE(k.txt, '') AS text_clean
        FROM toks b
        LEFT JOIN (SELECT doc_id, COUNT(*) AS n FROM cov GROUP BY 1) d
               USING (doc_id)
        LEFT JOIN (SELECT doc_id, string_agg(w, ' ' ORDER BY ti) AS txt
                   FROM kept GROUP BY 1) k USING (doc_id)
        ORDER BY doc_id
    """).df()
    assert got.equals(want.reset_index(drop=True))


@pytest.mark.usefixtures("ray_session")
def test_source_template_strip_randomized_matches_duckdb():
    """Randomized cross-check: few sources, tiny vocab (so 4-token
    segments repeat across docs of a source by chance), engine equals
    DuckDB value-exactly."""
    import duckdb
    import numpy as np
    import ray.data

    rng = np.random.default_rng(77)
    vocab = [f"w{i}" for i in range(4)]
    texts = [" ".join(rng.choice(vocab, size=int(n)))
             for n in rng.integers(1, 18, size=90)]
    t = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "source": pa.array([f"s{i % 3}" for i in range(len(texts))]),
        "text": pa.array(texts, pa.string()),
    })
    W = 4
    got = (dedup.source_template_strip(
        ray.data.from_arrow(t).repartition(4), seg_words=W).to_pandas()
        .sort_values("doc_id").reset_index(drop=True))

    con = duckdb.connect()
    con.register("documents", t)
    want = con.execute(rf"""
        WITH toks AS (
          SELECT doc_id, source,
                 list_filter(regexp_split_to_array(text, '\s+'),
                             x -> x <> '') AS ws
          FROM documents
        ), idx AS (
          SELECT doc_id, source, ws,
                 unnest(range(1, CAST(ceil(len(ws) / {W}.0) AS BIGINT)
                                 + 1)) AS seg_no
          FROM toks
        ), seg AS (
          SELECT doc_id, source, seg_no,
                 array_to_string(ws[(seg_no - 1) * {W} + 1 : seg_no * {W}],
                                 ' ') AS seg
          FROM idx
        ), tmpl AS (
          SELECT source, seg FROM seg
          GROUP BY 1, 2 HAVING COUNT(DISTINCT doc_id) >= 2
        ), mark AS (
          SELECT s.doc_id, s.seg_no, s.seg, (t.seg IS NOT NULL) AS is_t
          FROM seg s LEFT JOIN tmpl t
            ON s.source = t.source AND s.seg = t.seg
        )
        SELECT doc_id, COUNT(*) AS n_segs,
               CAST(SUM(CASE WHEN is_t THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_template_segs,
               COALESCE(string_agg(CASE WHEN NOT is_t THEN seg END,
                                   ' ' ORDER BY seg_no), '') AS text_clean
        FROM mark GROUP BY 1 ORDER BY doc_id
    """).df()
    assert got.equals(want.reset_index(drop=True))
