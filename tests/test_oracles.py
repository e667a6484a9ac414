"""Oracle parity inside the pytest gate (the north rule's verification
command): a representative subset of ``__ray_entry__`` queries compared
value-exactly against their DuckDB oracles at sf0.001. The full sweep
(every query, sf0.01) runs via ``tools/check_oracles.py`` /
``tools/preflight.sh``.
"""

import duckdb
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.001"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

# fast, shuffle-diverse subset: groupby, window, salted, join, funnel, topk
SUBSET = [
    "docs_by_lang",
    "doc_fingerprints",
    "exact_dedup",
    "sessionize_events",
    "events_by_user_salted",
    "q1_pricing_summary",
    "segment_revenue",
    "part_topk",
    "training_mix",
    # round-2 additions: IVF oracle mode, as-of join, hopping windows,
    # per-user window functions, histogram quantiles, PII scrub
    "ann_ivf",
    "embedding_clusters",
    "events_asof_orders",
    "events_hopping",
    "user_event_windows",
    "lineitem_price_quantiles",
    "doc_pii_scrub",
    "customers_with_events",
    "customers_without_events",
    "events_rollup",
    "events_user_distinct",
    "events_in_sessions",
    # round-3 additions: CUBE grouping sets, quantized-quantile sketch
    # (kg_articles/kg_text_nodes goldens are sf0.01-only → full sweep)
    "events_cube",
    "lineitem_price_quantiles_approx",
    # round-3 additions: graph family + heavy hitters + ntile/tumbling
    # (graph_pagerank / graph_components are shuffle-heavy at any sf —
    # unit-tested against reference recurrences in test_graph.py and
    # swept at sf0.01 by tools/check_oracles.py)
    "graph_degrees",
    "term_heavy_hitters",
    "bm25_topk",
    "events_value_ntile",
    "events_tumbling",
    "graph_bfs",
    # round-3 session-3 additions: k-core peeling (unrolled-SQL oracle),
    # Q13/Q15/Q17 shapes, global-quantile band filter, streaming cummax
    "part_copurchase_kcore",
    "cust_order_histogram",
    "top_supplier_revenue",
    "small_qty_avg_revenue",
    "docs_length_band",
    "events_running_max",
    "docs_source_overlap",
    "events_gap_histogram",
    # round-3 session-5 additions: bloom joins, skew-hybrid join, HLL,
    # Q8/Q21 shapes
    "orders_with_returns",
    "events_customer_join",
    "events_user_distinct_hll",
    "waiting_suppliers",
    "user_purchase_patterns",
    # round-3 session-6 additions: session running spend, breadth
    # histogram, ratio-to-parent rollup, Count-Min sketch, windowed
    # HLL, robust median/MAD
    "session_running_spend",
    "user_type_breadth",
    "nation_revenue_share",
    "term_cm_counts",
    "hopping_users_hll",
    "events_value_mad",
    "returnflag_priority_counts",
    "daily_top_spender",
    "docs_store_lookup",
    "docs_neardup_ingest",
    # round-4 session-3 additions: repeated-content strip operators
    # (crawl_frontier_schedule's oracle is golden-backed sf0.01-only →
    # full sweep)
    "doc_dup_span_strip",
    "doc_template_strip",
]


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


@pytest.fixture(scope="module")
def oracle_con():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    return con


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("name", SUBSET)
def test_query_matches_oracle(name, oracle_con):
    import __ray_entry__ as E

    res = E.queries()[name](SF_DIR)
    got = res.to_pandas()  # Dataset and pyarrow.Table both support it
    want = oracle_con.execute(E.oracle_sql()[name]).fetchdf()
    got, want = _canon(got), _canon(want)
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want)
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)
