#!/usr/bin/env python3
"""DuckDB side of the bench comparison: run each headline oracle SQL at the
given SF dir and print per-query seconds (same shapes the Spark bench runs)."""
import sys, time, json
import duckdb

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

HEADLINE = ["q1_pricing_summary", "q3_top_orders", "scan_project_filter",
            "filter_in_time_range", "json_filter_gte", "json_filter_native",
            "latest_event_per_user", "metrics_count_hourly",
            "metrics_daily_by_type", "sessionize_30min", "explode_tokens",
            "dedup_jaccard_pairs", "knn_brute_force", "embedding_cosine_pairs",
            "text_token_stats", "asof_click_before_purchase", "range_join_60s",
            "rollup_order_stats", "pivot_event_counts", "top3_per_user",
            "salted_agg_by_type", "dedup_clusters", "q17_small_quantity",
            "moving_avg_revenue", "dedup_span_removal", "bm25_topk",
            "weighted_sample_topn", "pack_sequences", "incremental_minhash_dedup",
            "hybrid_rrf_topk", "mixture_sample_budget", "sketch_distinct_rollup",
            "q21_waiting_suppliers", "q8_market_share",
            "q13_customer_distribution", "q19_discounted_revenue",
            "entity_resolution",
            "q2_min_cost_supplier", "q11_important_stock", "funnel_steps",
            "pagerank_trade", "ema_daily_revenue", "dq_constraints",
            "global_rank_agg", "ntile_deciles", "auc_exact",
            "target_encode_oof", "pca_covariance",
            "cc_twostar_chains",
            "quality_classifier_coeffs", "incremental_equidepth_check",
            "curation_scored_batch", "incremental_equidepth_by_type"]

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    # ScaleData-generated dirs are partitioned (table.parquet/*.parquet) and
    # may carry only the tables a subset bench needs
    import os
    p = f"{sfdir}/{t}.parquet"
    if os.path.isdir(p):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}/*.parquet'")
    elif os.path.exists(p):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
oracles = json.load(open(f"{outdir}/oracle_sql.json"))

out = {}
for name in HEADLINE:
    if name not in oracles:
        continue
    sql = oracles[name]
    con.sql(sql).fetchall()  # warmup
    def timed():
        t0 = time.time()
        con.sql(sql).fetchall()
        return time.time() - t0
    first = timed()
    # median-of-3 on multi-second queries, mirroring graft.Bench
    dt = sorted([first, timed(), timed()])[1] if first > 1.0 else first
    out[name] = round(dt, 3)
print(json.dumps({"total": round(sum(out.values()), 3), "queries": out, "sf": sfdir}))
