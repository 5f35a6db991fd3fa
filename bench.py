"""Benchmark harness: runs the headline catalog queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced to full execution with a count-style action
(``df.foreach(noop)`` would be slower; ``count()`` after a cache-less run
measures the whole plan because Catalyst cannot short-circuit aggregates/
projections feeding a count... to be safe we use ``df.write.format("noop")``
which materializes every row and column with zero sink cost).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from flinkapps_spark.plans import catalog
from flinkapps_spark.session import free_session_state, get_spark

# headline set: the flagship pipeline plus the heaviest representative
# operator from each family (filter/agg/window/join/dedup/similarity/text)
HEADLINE = [
    "flagship_filter_project",
    "filter_compound_precedence",
    "csv_roundtrip",
    "tokenize_wordcount",
    "agg_minmax_year",
    "agg_tumbling_window",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier",
    "q6_forecast_revenue",
    "q12_shipmode_case",
    "q14_promo_ratio",
    "q4_order_priority",
    "q9_product_profit",
    "q10_returned_items",
    "topk_per_group",
    "window_battery",
    "join_asof_signup",
    "join_asof_jvm",
    "events_sessionize",
    "json_extract_props",
    "dedup_exact",
    "dedup_minhash_lsh",
    "knn_cosine_bruteforce",
    "embedding_centroids",
    "text_quality_score",
    "pipeline_training_prep",
    "text_decontaminate",
    "doc_chunk_windows",
    "pack_sequences_budget",
    "embedding_neardup_pairs",
    "q2_min_cost_supplier",
    "q21_waiting_supplier",
    "vocab_build",
    "quality_filter_sweep",
    "embedding_quantize_int8",
    "dedup_repeated_spans",
    "sketch_hll_rollup",
    "bm25_topk_docs",
    "cdc_apply_changelog",
    "shuffle_epoch_batches",
    "text_bigram_logprob",
    # round-4 additions (appended — bench_compare keys on the common
    # subset, so extending the list never breaks cross-round ratios)
    "features_pit_window",
    "interp_linear_fill",
    "snapshot_diff",
    "er_multikey_blocking",
    "itemset_copurchase_pairs",
    "rfm_segmentation",
    "skew_key_audit",
    # round-5 additions
    "kmeans_lloyd",
    "vocab_bpe_merges",
    "text_quality_linear",
    "sketch_grid_quantiles",
    "events_ewma_recent",
    "graph_label_propagation",
    "events_concurrency_peaks",
    "text_line_dedup",
    "sketch_hll_portable",
    "events_attribution",
    "stats_category_lift",
    "text_phrase_search",
    "sample_group_holdout",
    "events_top_paths",
    "events_changepoint_cusum",
    "events_attribution_skewsafe",
    "hybrid_rrf_fusion",
    "events_time_weighted_avg",
    "events_trend_theilsen",
    # round-5 continuation additions
    "stats_ks_twosample",
    "events_audience_overlap",
    "orders_active_streaks",
    "recsys_item_cosine",
    "profile_table_columns",
    "stats_ab_conversion",
    "embedding_covariance",
    "text_keyword_rake",
    "embedding_mmr_diversify",
    "dq_benford_digits",
    "events_autocorrelation",
    "text_zipf_fit",
    "orders_cohort_ltv",
    "events_power_users_gini",
    "orders_skyline_pareto",
    "stats_mannwhitney_u",
    "stats_welch_ttest",
    "events_user_entropy",
    "events_runs_test",
    "orders_max_drawdown",
    "sql_recursive_hierarchy",
    "maintenance_compaction_bins",
    "stats_bootstrap_ci",
    # round-5 part-7 additions
    "ml_auc_roc",
    "ml_gains_deciles",
    "stats_spearman_trend",
    "text_readability",
    "events_forecast_backtest",
    "embedding_power_iteration",
    "embedding_outlier_scores",
    "exact_weighted_median",
    "dq_referential_integrity",
    # round-6 additions
    "bpe_encode",
    "events_holt_linear",
    "graph_pagerank",
    "source_overlap_jaccard",
    "bpe_fertility_by_lang",
    # round-7 additions
    "events_holt_linear_weekly",
    "dedup_clusters",
    # round-8 additions
    "embedding_neardup_lsh",
    "semdedup_keep_lsh",
    "dedup_clusters_lsh",
    # round-9 additions
    "knn_cosine_lsh",
    "knn_lsh_neardup",
    "stream_cep_sequence",
    "knn_cosine_ivfpq",
    "stream_knn_ivfpq_serving",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    spark = get_spark("flinkapps-bench")
    spark.sparkContext.setLogLevel("ERROR")
    reg = catalog.registry()
    names = [n for n in HEADLINE if n in reg]

    timings: dict[str, float] = {}
    # warm-up: JVM/codegen/parquet-footer caches on the smallest table,
    # plus the python daemon workers used by the pandas-UDF operators
    reg["flagship_filter_project"].build(spark, sf_dir).write.format("noop") \
        .mode("overwrite").save()
    import pandas as _pd
    (spark.range(256).repartition(64)
     .mapInPandas(lambda it: it, schema="id long")
     .write.format("noop").mode("overwrite").save())

    # median-of-N per query (N=3 default, $SPARK_GRAFT_BENCH_RUNS): the
    # median is robust to the scheduling-noise outliers co-tenants cause
    # (observed 10-20x spikes on sub-second queries; VERDICT r2 flagged a
    # whole contended pass that doubled the recorded total) while, unlike
    # min, still reflecting a *persistent* slowdown.  Spread per query is
    # recorded so a noisy environment is visible in the artifact itself.
    n_runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3")))
    # sub-second queries are overhead-dominated and the noisiest rows in
    # BENCH_COMPARE (VERDICT r3 #6): once a query's first run comes in
    # under 1 s, extend its loop to n_runs_fast so the median settles and
    # the MAD quantifies what spread remains.
    n_runs_fast = max(n_runs, int(
        os.environ.get("SPARK_GRAFT_BENCH_RUNS_FAST", "7")))
    # queries BENCH_COMPARE has ⚠-flagged across rounds with UNCHANGED
    # plans (r4+r5 verdicts: environmental noise, not regressions) sit
    # just above the 1 s fast-loop cutoff and so get only n_runs=3 —
    # too few for a stable median on a shared VM.  Pin them to the
    # extended loop regardless of first-run time so the table flags
    # only real plan changes (VERDICT r5 #7).
    sticky_fast = {
        "csv_roundtrip", "dedup_minhash_lsh", "join_asof_signup",
        "q4_order_priority", "q9_product_profit", "bm25_topk_docs",
        "tokenize_wordcount", "snapshot_diff",
    }
    spread: dict[str, float] = {}
    mad: dict[str, float] = {}
    # best-of-N alongside the median: rounds 1-2 recorded best-of-2, so
    # cross-round ratios must compare min-to-min, not median-to-min
    mins: dict[str, float] = {}

    def cpu_counters() -> tuple[float, float]:
        """(steal, total) jiffies from /proc/stat — the box is a shared VM
        and hypervisor steal of 10-30% has been measured mid-bench; the
        recorded steal%% lets a reader attribute cross-round swings."""
        try:
            with open("/proc/stat") as f:
                parts = f.readline().split()
            vals = [float(x) for x in parts[1:9]]
            return vals[7], sum(vals)
        except (OSError, IndexError, ValueError):
            return 0.0, 0.0

    # session hygiene before the timed region: the warm-up may have
    # cached frames; every timed run below computes from parquet
    free_session_state(spark)

    steal0, total0 = cpu_counters()
    for name in names:
        runs = []
        while True:
            t0 = time.perf_counter()
            df = reg[name].build(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - t0)
            # drop the result OUTSIDE the timed window: the registry's
            # self-cleaning finalizer (catalog._self_cleaning) fires on
            # GC of the result — an in-window rebind would charge its
            # (tiny) unpersist round-trip to the NEXT run
            del df
            # between-run hygiene, OUTSIDE the timed window (round-9,
            # measurement fix declared in OPTIMIZATION_r09.md): drop the
            # run's cached plans and pinned localCheckpoint blocks so
            # (a) the next run cannot silently reuse a persisted frame —
            # every timed run computes from the parquet inputs — and
            # (b) pinned blocks do not accumulate over the 115-query
            # session and degrade later queries (measured 2-4x).
            free_session_state(spark)
            budget = (n_runs_fast if runs[0] < 1.0 or name in sticky_fast
                      else n_runs)
            if len(runs) >= budget:
                break
        runs.sort()
        med = runs[len(runs) // 2]
        timings[name] = round(med, 3)
        # max/min over the runs: 1.0 = perfectly stable box
        spread[name] = round(runs[-1] / max(runs[0], 1e-9), 2)
        mad[name] = round(sorted(abs(r - med) for r in runs)
                          [len(runs) // 2], 3)
        mins[name] = round(runs[0], 3)
    total = round(sum(timings.values()), 3)
    steal1, total1 = cpu_counters()
    steal_pct = (round(100.0 * (steal1 - steal0) / (total1 - total0), 2)
                 if total1 > total0 else None)

    print(json.dumps({
        "metric": "headline_queries_total_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "runs_per_query": n_runs,
        "runs_per_query_fast": n_runs_fast,
        "stat": "median",
        "run_spread": spread,
        "queries_mad": mad,
        "queries_min": mins,
        "cpu_steal_pct": steal_pct,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
