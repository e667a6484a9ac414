"""Skyline, CDC merge, provenance dedup, quantized dim stats —
behavioral tests on planted synthetic inputs, each compared against a
driver-side brute-force or closed-form answer."""

import numpy as np
import pyarrow as pa

from kgrecrun.ops.ann import quantized_dim_stats
from kgrecrun.ops.cdc import apply_changelog
from kgrecrun.ops.dedup import provenance_dedup
from kgrecrun.ops.skyline import pareto_frontier


def _brute_skyline(x, y):
    n = len(x)
    return sorted(
        i for i in range(n)
        if not any(
            x[j] <= x[i] and y[j] <= y[i] and (x[j] < x[i] or y[j] < y[i])
            for j in range(n)
        )
    )


def test_pareto_frontier_matches_brute_force(ray_session):
    import ray.data

    rng = np.random.RandomState(11)
    x = rng.randint(0, 40, 400).astype(np.int64)
    y = rng.randint(0, 40, 400).astype(np.int64)
    ds = ray.data.from_arrow(
        pa.table({"x": x, "y": y, "id": np.arange(400, dtype=np.int64)})
    ).repartition(7)  # frontier must be layout-independent
    got = sorted(pareto_frontier(ds, x="x", y="y").to_pandas()["id"])
    assert got == _brute_skyline(x, y)


def test_pareto_frontier_keeps_tied_points(ray_session):
    import ray.data

    t = pa.table({
        "x": pa.array([1, 1, 2, 3], pa.int64()),
        "y": pa.array([5, 5, 9, 4], pa.int64()),
        "id": pa.array([0, 1, 2, 3], pa.int64()),
    })
    got = sorted(
        pareto_frontier(ray.data.from_arrow(t), x="x", y="y")
        .to_pandas()["id"])
    # the duplicate (1,5) pair both survive; (2,9) is dominated by (1,5)
    assert got == [0, 1, 3]


def test_apply_changelog_semantics(ray_session):
    import ray.data

    base = ray.data.from_arrow(pa.table({
        "k": pa.array([1, 2, 3, 4], pa.int64()),
        "v": pa.array([10, 20, 30, 40], pa.int64()),
    }))
    changes = ray.data.from_arrow(pa.table({
        # k=1: two upserts, later ts wins; k=2: delete wins (latest);
        # k=3: untouched; k=5: insert-by-change; k=4: same-ts tie →
        # higher seq wins; k=6: insert then delete → absent
        "k": pa.array([1, 1, 2, 5, 4, 4, 6, 6], pa.int64()),
        "v": pa.array([11, 12, 0, 50, 41, 42, 60, 0], pa.int64()),
        "ts": pa.array([1, 2, 3, 1, 5, 5, 1, 2], pa.int64()),
        "seq": pa.array([101, 102, 103, 104, 105, 106, 107, 108],
                        pa.int64()),
        "op": pa.array(["upsert", "upsert", "delete", "upsert", "upsert",
                        "upsert", "upsert", "delete"], pa.string()),
    })).repartition(3)
    out = apply_changelog(
        base, changes, key="k", value_cols=["v"],
        ts_col="ts", seq_col="seq", op_col="op",
    ).to_pandas().sort_values("k").reset_index(drop=True)
    assert list(zip(out["k"], out["v"])) == [(1, 12), (3, 30), (4, 42),
                                             (5, 50)]


def test_provenance_dedup_prefers_low_rank(ray_session):
    import ray.data

    pref = "alpha beta gamma delta epsilon zeta eta theta"
    docs = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": pa.array([
            pref + " tail one", pref + " tail two",  # same 8-token key
            pref + " tail three", "unrelated text entirely different here",
        ], pa.string()),
        "rank": pa.array([5, 2, 2, 9], pa.int64()),
    })).repartition(2)
    out = (provenance_dedup(docs).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    # winner of the shared key: rank 2 tie → lower doc_id (2)
    assert list(out["keep_id"]) == [2, 2, 2, 4]
    assert list(out["kept"]) == [False, True, False, True]


def test_quantized_dim_stats_exact(ray_session):
    import ray.data

    rng = np.random.RandomState(3)
    m = rng.rand(50, 5)
    m[:, 4] = 0.25  # constant dim → code 0
    ds = ray.data.from_arrow(pa.table({
        "vec_id": pa.array(np.arange(50, dtype=np.int64)),
        "embedding": pa.array([row.tolist() for row in m],
                              pa.list_(pa.float32())),
    })).repartition(4)
    out = (quantized_dim_stats(ds).to_pandas()
           .sort_values(["di", "dj"]).reset_index(drop=True))
    mf = m.astype(np.float32).astype(np.float64)
    lo, hi = mf.min(axis=0), mf.max(axis=0)
    span = np.where(hi == lo, 1.0, hi - lo)
    codes = np.floor((mf - lo) * 255.0 / span + 0.5)
    codes = np.where(hi == lo, 0.0, codes).astype(np.int64)
    iu, ju = np.triu_indices(5, k=1)
    assert out["n"].tolist() == [50] * len(iu)
    assert out["si"].tolist() == codes.sum(axis=0)[iu].tolist()
    assert out["sij"].tolist() == (codes.T @ codes)[iu, ju].tolist()
    # constant dim pairs have sj == 0
    assert out[out["dj"] == 4]["sj"].eq(0).all()


def _brute_jaccard_pairs(texts, k, num, den):
    from kgrecrun.ops.simjoin import _shingle_hashes

    sets = {i: set(_shingle_hashes(t, k).tolist())
            for i, t in enumerate(texts) if _shingle_hashes(t, k).size}
    out = []
    keys = sorted(sets)
    for ai in range(len(keys)):
        for bi in range(ai + 1, len(keys)):
            a, b = keys[ai], keys[bi]
            inter = len(sets[a] & sets[b])
            uni = len(sets[a] | sets[b])
            if inter * den >= num * uni:
                out.append((a, b, inter, uni))
    return out


def test_allpairs_jaccard_join_exact(ray_session):
    import ray.data

    from kgrecrun.ops.simjoin import allpairs_jaccard_join

    rng = np.random.RandomState(5)
    vocab = [f"w{i}" for i in range(60)]
    texts = []
    for i in range(40):
        words = [vocab[j] for j in rng.randint(0, 60, 25)]
        texts.append(" ".join(words))
    # planted near-dup chain: 40≈41≈42 (one-word edits)
    base = texts[0].split()
    e1 = list(base); e1[3] = "edited"
    e2 = list(e1); e2[17] = "again"
    texts += [" ".join(e1), " ".join(e2), "tiny", ""]
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
        "text": pa.array(texts, pa.string()),
    })).repartition(5)
    got = sorted(
        tuple(r) for r in allpairs_jaccard_join(
            ds, threshold_num=3, threshold_den=10
        ).to_pandas().itertuples(index=False))
    assert got == _brute_jaccard_pairs(texts, 3, 3, 10)
    assert any(a == 0 for a, *_ in got)  # the planted chain was found


def test_profile_table(ray_session):
    import ray.data

    from kgrecrun.ops.profile import profile_table

    t = pa.table({
        "a": pa.array([1, 1, 2, None, 3], pa.int64()),
        "b": pa.array(["x", None, None, "x", "y"], pa.string()),
        "c": pa.array([1.5, 1.5, 1.5, 1.5, 1.5], pa.float64()),
    })
    out = (profile_table(ray.data.from_arrow(t).repartition(3))
           .to_pandas().set_index("column").sort_index())
    assert out.loc["a"].tolist() == [5, 1, 3]
    assert out.loc["b"].tolist() == [5, 2, 2]
    assert out.loc["c"].tolist() == [5, 0, 1]


def test_group_weighted_median(ray_session):
    import ray.data

    from kgrecrun.ops.stats import group_weighted_median

    rng = np.random.RandomState(9)
    keys = rng.choice(["g1", "g2", "g3"], 300)
    vals = rng.randint(0, 50, 300).astype(np.int64)
    wts = rng.randint(1, 6, 300).astype(np.int64)
    ds = ray.data.from_arrow(pa.table({
        "k": pa.array(keys), "v": pa.array(vals), "w": pa.array(wts),
    })).repartition(4)
    out = (group_weighted_median(
        ds, key="k", value_cents=lambda b: b["v"],
        weight=lambda b: b["w"]).to_pandas()
        .set_index("k").sort_index())
    for g in ["g1", "g2", "g3"]:
        m = keys == g
        v, w = vals[m], wts[m]
        order = np.argsort(v, kind="stable")
        cum = np.cumsum(w[order])
        expect = int(v[order][np.searchsorted(2 * cum, cum[-1])])
        assert out.loc[g, "wmedian_cents"] == expect
        assert out.loc[g, "total_w"] == int(w.sum())


def test_broadcast_interval_lookup(ray_session):
    import pytest
    import ray.data

    from kgrecrun.ops.joins import broadcast_interval_lookup

    tiers = pa.table({
        "lo": pa.array([10, 30], pa.int64()),
        "hi": pa.array([20, 40], pa.int64()),
        "tier": pa.array(["a", "b"], pa.string()),
    })
    ds = ray.data.from_arrow(pa.table({
        "id": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "v": pa.array([5, 10, 19, 25, 39], pa.int64()),
    }))
    out = (broadcast_interval_lookup(ds, tiers, "v")
           .to_pandas().sort_values("id"))
    assert out["tier"].where(out["tier"].notna(), None).tolist() == [
        None, "a", "a", None, "b"]
    with pytest.raises(ValueError, match="overlap"):
        broadcast_interval_lookup(ds, pa.table({
            "lo": pa.array([0, 5], pa.int64()),
            "hi": pa.array([10, 15], pa.int64()),
            "tier": pa.array(["x", "y"], pa.string()),
        }), "v")


def test_pq_codes_lloyd_reduces_distortion(ray_session):
    import ray.data

    from kgrecrun.ops.ann import pq_codes

    rng = np.random.RandomState(13)
    m = rng.rand(200, 32)
    seeds = m[:8]
    ds = ray.data.from_arrow(pa.table({
        "vec_id": pa.array(np.arange(200, dtype=np.int64)),
        "embedding": pa.array([r.tolist() for r in m],
                              pa.list_(pa.float64())),
    })).repartition(3)

    def distortion(n_iters):
        out = (pq_codes(ds, seed_vectors=seeds, n_sub=4, n_centroids=8,
                        n_iters=n_iters, fit_sample=m[:64])
               .to_pandas().sort_values("vec_id").reset_index(drop=True))
        # rebuild the centroids exactly as the op does
        cents = [seeds[:, s * 8:(s + 1) * 8].copy() for s in range(4)]
        if n_iters:
            for s in range(4):
                sample = m[:64, s * 8:(s + 1) * 8]
                c = cents[s].copy()
                for _ in range(n_iters):
                    d = ((sample[:, None, :] - c[None, :, :]) ** 2).sum(2)
                    a = d.argmin(1)
                    for j in range(len(c)):
                        if (a == j).any():
                            c[j] = sample[a == j].mean(0)
                cents[s] = c
        err = 0.0
        for s in range(4):
            codes = out[f"sub_{s}"].to_numpy()
            err += ((m[:, s * 8:(s + 1) * 8] - cents[s][codes]) ** 2).sum()
        return err

    d0, d4 = distortion(0), distortion(4)
    assert d4 < d0  # Lloyd refinement reduces reconstruction error


def test_interval_overlap_join_matches_brute_force(ray_session):
    import ray.data

    from kgrecrun.ops.temporal import interval_overlap_join

    rng = np.random.RandomState(21)
    # left: non-overlapping per key by construction
    lk, llo, lhi, lid = [], [], [], []
    for k in range(6):
        t = 0
        for i in range(rng.randint(0, 8)):
            t += rng.randint(1, 20)
            lo = t
            t += rng.randint(1, 15)
            lk.append(k); llo.append(lo); lhi.append(t)
            lid.append(len(lid))
    rk = rng.randint(0, 7, 60)  # key 6 has no left rows
    rlo = rng.randint(0, 80, 60)
    rhi = rlo + rng.randint(1, 25, 60)
    left = ray.data.from_arrow(pa.table({
        "k": pa.array(lk, pa.int64()), "lo": pa.array(llo, pa.int64()),
        "hi": pa.array(lhi, pa.int64()), "lid": pa.array(lid, pa.int64()),
    })).repartition(3)
    right = ray.data.from_arrow(pa.table({
        "k": pa.array(rk, pa.int64()), "rlo": pa.array(rlo, pa.int64()),
        "rhi": pa.array(rhi, pa.int64()),
        "rid": pa.array(np.arange(60, dtype=np.int64)),
    })).repartition(4)
    out = interval_overlap_join(
        left, right, key="k", left_lo="lo", left_hi="hi",
        right_lo="rlo", right_hi="rhi", left_cols=["lid"],
        right_cols=["rid"], validate=True).to_pandas()
    got = sorted(zip(out["lid"], out["rid"], out["overlap"]))
    want = sorted(
        (li, ri, min(lhi[li], int(rhi[ri])) - max(llo[li], int(rlo[ri])))
        for li in range(len(lk)) for ri in range(60)
        if lk[li] == rk[ri] and llo[li] < rhi[ri] and rlo[ri] < lhi[li])
    assert got == want
    # validate=True rejects an overlapping left side
    import pytest
    bad = ray.data.from_arrow(pa.table({
        "k": pa.array([1, 1], pa.int64()),
        "lo": pa.array([0, 3], pa.int64()),
        "hi": pa.array([5, 8], pa.int64()),
        "lid": pa.array([0, 1], pa.int64()),
    }))
    with pytest.raises(Exception, match="overlap"):
        interval_overlap_join(
            bad, right, key="k", left_lo="lo", left_hi="hi",
            right_lo="rlo", right_hi="rhi", left_cols=["lid"],
            right_cols=["rid"], validate=True).materialize()


def test_edit1_join_exact(ray_session):
    import itertools

    import ray.data

    from kgrecrun.ops.simjoin import _dist_le1, edit1_join

    words = ["alpha", "alpho", "alpha", "alph", "aalpha", "beta",
             "betta", "bet", "gamma", "gamm", "gamma2", "delta",
             "dleta", "zzzz"]
    ds = ray.data.from_arrow(pa.table({
        "w": pa.array(words, pa.string()),
    })).repartition(3)
    got = sorted(zip(*[
        edit1_join(ds, col="w").to_pandas()[c] for c in ("a", "b")]))
    uniq = sorted(set(words))

    def lev(a, b):
        # full DP for the brute force (not the op's shortcut)
        d = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, d[0] = d[0], i
            for j, cb in enumerate(b, 1):
                prev, d[j] = d[j], min(d[j] + 1, d[j - 1] + 1,
                                       prev + (ca != cb))
        return d[len(b)]

    want = sorted((x, y) for x, y in itertools.combinations(uniq, 2)
                  if lev(x, y) <= 1)
    assert got == want
    # the O(len) verify shortcut agrees with full DP on random pairs
    rng = np.random.RandomState(3)
    for _ in range(300):
        x = "".join(rng.choice(list("abc"), rng.randint(0, 6)))
        y = "".join(rng.choice(list("abc"), rng.randint(0, 6)))
        assert _dist_le1(x, y) == (lev(x, y) <= 1), (x, y)


def test_table_diff_semantics(ray_session):
    import pytest
    import ray.data

    from kgrecrun.ops.diff import table_diff

    old = ray.data.from_arrow(pa.table({
        "k": pa.array([1, 2, 3, 4], pa.int64()),
        "v": pa.array(["a", "b", "c", None], pa.string()),
    }))
    new = ray.data.from_arrow(pa.table({
        # 1 unchanged, 2 changed, 3 removed, 5 added, 4: None -> "d"
        "k": pa.array([1, 2, 5, 4], pa.int64()),
        "v": pa.array(["a", "B", "e", "d"], pa.string()),
    })).repartition(2)
    out = (table_diff(old, new, key="k", cols=["v"]).to_pandas()
           .sort_values("k").reset_index(drop=True))
    assert list(zip(out["k"], out["status"])) == [
        (2, "changed"), (3, "removed"), (4, "changed"), (5, "added")]
    # duplicate keys on a side fail loudly
    dup = ray.data.from_arrow(pa.table({
        "k": pa.array([1, 1], pa.int64()),
        "v": pa.array(["x", "y"], pa.string()),
    }))
    with pytest.raises(Exception, match="key-unique"):
        table_diff(dup, new, key="k", cols=["v"]).materialize()


def test_group_abc_analysis(ray_session):
    import ray.data

    from kgrecrun.ops.window import group_abc_analysis

    ds = ray.data.from_arrow(pa.table({
        "g": pa.array(["x"] * 4 + ["y"] * 2, pa.string()),
        "m": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
        "v": pa.array([50, 30, 15, 5, 10, 10], pa.int64()),
    })).repartition(2)
    out = (group_abc_analysis(ds, key="g", member="m", value="v")
           .to_pandas().sort_values(["g", "m"]).reset_index(drop=True))
    x = out[out["g"] == "x"].set_index("m")
    # cum: m1=50 (A, 50<=80), m2=80 (A), m3=95 (B), m4=100 (C)
    assert x.loc[1, "abc_class"] == "A" and x.loc[2, "abc_class"] == "A"
    assert x.loc[3, "abc_class"] == "B" and x.loc[4, "abc_class"] == "C"
    assert x["cum_value"].tolist() == [50, 80, 95, 100]
    y = out[out["g"] == "y"].set_index("m")
    # tie at 10: member 5 first (cum 10 = 50% -> A), member 6 cum 20 -> C
    assert y.loc[5, "abc_class"] == "A" and y.loc[6, "abc_class"] == "C"


def test_group_gap_stats(ray_session):
    import ray.data

    from kgrecrun.ops.window import group_gap_stats

    day = 86_400_000_000
    ds = ray.data.from_arrow(pa.table({
        "k": pa.array([1, 1, 1, 2, 3], pa.int64()),
        "t": pa.array([0, 3 * day, 10 * day, 5 * day, 0], pa.int64()),
        "id": pa.array([10, 11, 12, 13, 14], pa.int64()),
    })).repartition(2)
    out = (group_gap_stats(ds, key="k", ts="t", tie="id")
           .to_pandas().set_index("k"))
    # key 1: gaps 3, 7; keys 2 and 3 have a single row -> absent
    assert sorted(out.index) == [1]
    assert out.loc[1].tolist() == [2, 10, 3, 7]


def test_mannwhitney_and_ks_exact(ray_session):
    import ray.data

    from kgrecrun.ops.stats import ks_statistic, mann_whitney_u

    rng = np.random.RandomState(17)
    a = rng.randint(0, 25, 80)
    b = rng.randint(5, 30, 55)
    t = pa.table({
        "g": pa.array(["a"] * 80 + ["b"] * 55 + ["other"] * 5),
        "v": pa.array(np.concatenate([a, b, np.zeros(5, np.int64)]),
                      pa.int64()),
    })
    ds = ray.data.from_arrow(t).repartition(4)
    u = mann_whitney_u(ds, group_col="g",
                       value_cents=lambda x: x["v"],
                       group_a="a", group_b="b").to_pandas().iloc[0]
    ks = ks_statistic(ds, group_col="g",
                      value_cents=lambda x: x["v"],
                      group_a="a", group_b="b").to_pandas().iloc[0]
    # brute force with average ranks
    vals = sorted(set(np.concatenate([a, b]).tolist()))
    cum = 0
    r2a = 0
    cuma = cumb = 0
    dnum = 0
    for v in vals:
        c_a = int((a == v).sum())
        c_b = int((b == v).sum())
        r2a += c_a * (2 * cum + c_a + c_b + 1)
        cum += c_a + c_b
        cuma += c_a
        cumb += c_b
        dnum = max(dnum, abs(cuma * len(b) - cumb * len(a)))
    assert (u["n_a"], u["n_b"]) == (80, 55)
    assert u["r2_a"] == r2a and u["u2_a"] == r2a - 80 * 81
    assert ks["d_num"] == dnum


def test_changepoint_cusum_planted_shift(ray_session):
    import ray.data

    from kgrecrun.ops.stats import changepoint_cusum

    # 30 days at 100/day, then 30 days at 200/day: CUSUM peaks at the
    # last low day (day 29)
    days = np.arange(60, dtype=np.int64)
    vals = np.where(days < 30, 100, 200).astype(np.int64)
    ds = ray.data.from_arrow(pa.table({
        "day": pa.array(days), "v": pa.array(vals),
    })).repartition(4)
    out = changepoint_cusum(ds, day_col="day",
                            value_col="v").to_pandas().iloc[0]
    assert out["n_days"] == 60 and out["total"] == 30 * 100 + 30 * 200
    assert out["cp_day"] == 29
    # deviation at day 29: |60*3000 - 30*9000| = 90000
    assert out["s_num"] == 90000
