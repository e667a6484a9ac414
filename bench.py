"""Benchmark driver. Prints ONE JSON line with per-pipeline wall times.

Default mode: run the headline pipelines over $GRAFT_SF_DIR (default
/root/testdata/sf0.1) under ray.init(address="local",
num_cpus=$RAY_GRAFT_CPUS or 32).

--scaling: run the flagship KG pipeline twice in FRESH subprocesses at
num_cpus=8 (N) and num_cpus=32 (4N) over the same synthetic corpus and
report docs/sec at both plus efficiency = T32 / (4 * T8)  (sandbox
protocol for the north rule's two-cluster-size criterion, BASELINE.md).

--kg-once --cpus C --docs D: internal child mode for --scaling.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

# sustained-throughput corpus: sized for a >=60 s extraction+KG run at
# 32 cpus so the reported docs/sec reflects steady state, not pool
# spin-up (VERDICT r1: the 8k-doc per-query number understated 10x).
# Scaled down with the scale factor so smoke runs stay fast.
_SUSTAINED_DOCS = {"sf0.001": 10_000, "sf0.01": 100_000}
SUSTAINED_DOCS = int(
    os.environ.get(
        "GRAFT_SUSTAINED_DOCS",
        _SUSTAINED_DOCS.get(SF_DIR.rstrip("/").rsplit("/", 1)[-1], 1_000_000),
    )
)


def _init(num_cpus: int) -> None:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
                 ignore_reinit_error=True, log_to_driver=False)


def _consume(ds) -> int:
    """Force full streaming execution; returns row count."""
    import ray.data

    if isinstance(ds, ray.data.Dataset):
        return ds.count()
    return len(ds)


def run_kg(n_docs: int) -> int:
    """Flagship: synthetic pages → extract → NER/OpenIE → link → canon →
    dedup triples. Returns triple count."""
    import ray

    from kgrecrun.corpus.synthgen import get_world, pages_dataset
    from kgrecrun.runtime.pipeline import kg_pipeline

    # ~4 blocks per CPU: fine enough for good wave-packing, coarse
    # enough that per-task overhead stays negligible
    ncpu = int(ray.cluster_resources().get("CPU", 8))
    pages = pages_dataset(n_docs, seed=42, override_num_blocks=max(64, 4 * ncpu))
    stages = kg_pipeline(pages, get_world(42).entity_table())
    return _consume(stages["triples"])


def bench_main() -> None:
    _init(NUM_CPUS)
    import __ray_entry__ as E

    qs = E.queries()
    names = [
        "kg_articles", "kg_triples", "kg_multipage",
        "doc_quality", "doc_fingerprints",
        "exact_dedup", "minhash_dedup", "simhash_dedup", "ngram_jaccard_dedup",
        "embedding_dedup", "ann_topk", "media_features",
        "sessionize_events", "events_by_user_salted",
        "q1_pricing_summary", "events_daily", "top_customers", "segment_revenue",
        "events_asof_orders", "events_hopping", "user_event_windows",
        "lineitem_price_quantiles", "doc_pii_scrub", "ann_ivf",
        "customers_without_events", "events_rollup", "events_user_distinct",
        "events_in_sessions", "events_cube", "lineitem_price_quantiles_approx",
        "docs_lang_cap", "doc_decontaminate",
        "graph_degrees", "graph_pagerank", "term_heavy_hitters",
        "bm25_topk", "events_value_ntile", "events_tumbling",
        "part_copurchase_triangles", "daily_activity_outer",
        "lineitem_qty_price_corr", "events_value_zscore",
        "user_value_rank", "user_event_gini", "events_value_histogram",
        "events_global_rank", "events_outliers", "user_retention",
        "shipping_priority", "user_event_type_agg", "weekly_active_users",
        "term_pairs_lift", "events_daily_dense", "docs_segment_dedup",
        "events_props_stats", "part_fuzzy_match", "knn_confusion",
        "doc_repetition", "events_funnel", "events_anomalies", "doc_chunks",
        "user_last_event", "part_min_supplier",
        "parts_shipped_both_years", "parts_shipped_first_only",
        "user_event_pivot", "event_transitions", "daily_new_users",
        "promo_revenue", "large_orders", "doc_weighted_sample",
        "view_purchase_attribution", "orders_above_cust_avg",
        "doc_dup_spans", "doc_dup_span_strip", "doc_template_strip",
        "graph_bfs", "local_supplier_revenue",
        "returned_items_topk", "graph_link_prediction", "doc_tfidf_top_terms",
        "nation_trade_volume", "late_shipment_priority_counts",
        "brand_disjunctive_revenue", "idle_customer_balance",
        "part_clustering_coeff",
        "part_copurchase_kcore", "cust_order_histogram",
        "top_supplier_revenue", "small_qty_avg_revenue",
        "docs_length_band", "events_running_max",
        "docs_source_overlap", "events_gap_histogram",
        "docs_incremental_ingest", "embedding_quantization",
        "part_pareto_frontier", "customer_balance_merge",
        "docs_preferred_copy", "embedding_dim_stats",
        "docs_similarity_join", "docs_table_profile",
        "brand_weighted_median_price", "docs_similarity_clusters",
        "forecast_revenue", "hybrid_rank_fusion", "customer_name_edit1",
        "part_communities", "customer_snapshot_diff", "supplier_abc_analysis",
        "customer_order_gaps", "purchase_view_mannwhitney", "purchase_view_ks", "revenue_changepoint", "lineitem_fingerprint",
        "lang_confusion",
        "event_trigram_paths", "events_value_winsorized", "events_value_tiers",
        "embedding_pq_codes", "orders_next_event", "sessions_overlap_purchases",
        "orders_with_returns", "orders_without_returns",
        "events_customer_join", "events_user_distinct_hll",
        "nation_market_share", "waiting_suppliers", "kg_entity_degrees",
        "user_purchase_patterns",
        "session_running_spend", "user_type_breadth", "nation_revenue_share",
        "term_cm_counts", "hopping_users_hll", "events_value_mad",
        "media_phash_dedup", "returnflag_priority_counts",
        "daily_top_spender", "kg_entity_pagerank", "docs_store_lookup",
        "docs_neardup_ingest", "media_phash_topk",
        "docs_store_compaction", "events_decayed_score",
        "user_order_overlap_hll", "orders_zorder_box",
        "supplier_qty_ivm", "events_late_data", "graph_sssp",
        "lineitem_sample_quantiles", "sessions_peak_concurrency",
        "event_value_chi2", "customer_balance_asof",
        "events_debounced", "docs_replica_diff",
        "events_orders_join_size", "hopping_users_exact",
        "revenue_autocorr", "data_quality_audit",
        "docs_store_timetravel",
        "kg_fact_resolution", "kg_two_hop",
        "kg_negative_samples", "kg_random_walks",
        "kg_verbalization", "kg_ego_networks", "kg_incremental_ingest",
        "kg_founders_birthplaces", "kg_acquisition_chains",
        "kg_fact_sources", "kg_temporal_facts", "kg_facts_asof",
        "kg_host_stats", "kg_pred_signatures", "kg_inverse_preds", "kg_growth",
        "kg_fact_conflicts", "kg_mention_counts", "kg_snapshot_delta",
        "kg_crawl_depths", "kg_corpus_pack",
        "warc_ingest", "warc_articles", "docs_url_canonical",
        "crawl_robots_filter", "crawl_frontier_schedule",
        "crawl_sitemap_seed", "doc_lm_quality",
        "corpus_curation",
    ]
    times: dict[str, float] = {}
    total0 = time.time()
    # flagship corpus size at this scale factor (mirrors __ray_entry__'s
    # _SF_DOCS — was hardcoded to the sf0.1 value, inflating docs/sec
    # 20x when bench ran at sf0.001)
    kg_docs = E._n_docs(SF_DIR)
    for i, name in enumerate(names):
        if i and i % 80 == 0:
            # recycle the session: one long Ray session accumulates
            # thousands of executed datasets and can trip a core
            # task-manager race that aborts the process (see
            # tools/check_oracles.py) — a dead bench run leaves the
            # driver's BENCH record null
            import ray

            ray.shutdown()
            _init(NUM_CPUS)
        t0 = time.time()
        n = _consume(qs[name](SF_DIR))
        times[name] = round(time.time() - t0, 3)
        print(f"{name}: {n} rows in {times[name]}s", file=sys.stderr)

    # sustained flagship throughput: one >=60s-scale KG run (extract →
    # NER/OpenIE → link → canon → dedup) over a corpus large enough to
    # amortize worker spin-up — the per-query times above carry ~1-3 s
    # of fixed overhead each and understate steady-state docs/sec
    t0 = time.time()
    n_triples = run_kg(SUSTAINED_DOCS)
    sustained_sec = round(time.time() - t0, 3)
    sustained_dps = round(SUSTAINED_DOCS / sustained_sec, 2)
    print(f"kg_sustained: {SUSTAINED_DOCS} docs, {n_triples} triples in "
          f"{sustained_sec}s = {sustained_dps} docs/s", file=sys.stderr)

    total = round(time.time() - total0, 3)
    sf = float(SF_DIR.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in SF_DIR else None
    # The driver tail-captures stdout, so the contract line must stay
    # compact (BENCH_r03 was parsed:null because the 177-entry per-query
    # dict overflowed the capture).  Per-query times go to stderr and to
    # BENCH/bench_queries_last.json; stdout carries only the headline
    # metrics.  kg_docs_per_sec is derived from the isolated sustained
    # run, not per-query suite times, so it tracks the code rather than
    # suite length/contention.
    detail = {
        "queries": times,
        "n_queries": len(times),
        "sf": sf,
        "num_cpus": NUM_CPUS,
        "kg_flagship_docs": kg_docs,
    }
    print("BENCH_DETAIL " + json.dumps(detail), file=sys.stderr)
    try:
        bench_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH")
        os.makedirs(bench_dir, exist_ok=True)
        with open(os.path.join(bench_dir, "bench_queries_last.json"), "w") as f:
            json.dump(detail, f, indent=1)
    except OSError:
        pass
    headline = [
        "kg_articles", "kg_triples", "kg_crawl_depths", "exact_dedup",
        "minhash_dedup", "ann_topk", "q1_pricing_summary", "graph_pagerank",
        "token_packing" if "token_packing" in times else "doc_quality",
        "bm25_topk",
    ]
    print(json.dumps({
        "metric": "bench_total_sec",
        "value": total,
        "unit": "sec",
        "queries": {k: times[k] for k in headline if k in times},
        "sf": sf,
        "num_cpus": NUM_CPUS,
        "n_queries": len(times),
        "kg_docs_per_sec": sustained_dps,
        "kg_sustained_docs": SUSTAINED_DOCS,
        "kg_sustained_sec": sustained_sec,
        "kg_sustained_docs_per_sec": sustained_dps,
    }))


def kg_once(cpus: int, docs: int) -> None:
    _init(cpus)
    t0 = time.time()
    n = run_kg(docs)
    print(json.dumps({"elapsed": time.time() - t0, "docs": docs, "triples": n,
                      "docs_per_sec": docs / (time.time() - t0)}))


def scaling(docs: int, reps: int) -> None:
    """N vs 4N in fresh processes; medians over `reps` runs each."""
    results: dict[int, list[float]] = {8: [], 32: []}
    for rep in range(reps):
        for cpus in (8, 32):
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--kg-once",
                 "--cpus", str(cpus), "--docs", str(docs)],
                capture_output=True, text=True, check=True,
            )
            line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
            r = json.loads(line)
            results[cpus].append(r["docs_per_sec"])
            print(f"rep {rep} cpus={cpus}: {r['docs_per_sec']:.1f} docs/s "
                  f"({r['elapsed']:.1f}s, {r['triples']} triples)", file=sys.stderr)
    med = {c: sorted(v)[len(v) // 2] for c, v in results.items()}
    eff = med[32] / (4 * med[8])
    print(json.dumps({
        "metric": "scaling_efficiency_8_to_32",
        "value": round(eff, 3),
        "unit": "ratio",
        "docs": docs,
        "docs_per_sec_cpus8": round(med[8], 2),
        "docs_per_sec_cpus32": round(med[32], 2),
        "all_runs": {str(k): [round(x, 2) for x in v] for k, v in results.items()},
    }))


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--scaling", action="store_true")
    p.add_argument("--kg-once", action="store_true")
    p.add_argument("--cpus", type=int, default=NUM_CPUS)
    p.add_argument("--docs", type=int, default=300_000)
    p.add_argument("--reps", type=int, default=3)
    args = p.parse_args()
    if args.kg_once:
        kg_once(args.cpus, args.docs)
    elif args.scaling:
        scaling(args.docs, args.reps)
    else:
        bench_main()
