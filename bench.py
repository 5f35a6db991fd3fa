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
from flinkapps_spark.session import get_spark

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

    # best-of-2 per query, plus a third run when the first two disagree by
    # >1.5x: absorbs scheduling noise from co-tenants on the box (observed
    # 10-20x outliers on otherwise sub-second queries; a whole contended
    # pass once doubled the recorded total)
    t_all = time.perf_counter()
    for name in names:
        runs = []
        for _ in range(2):
            t0 = time.perf_counter()
            df = reg[name].build(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - t0)
        if max(runs) > 1.5 * min(runs):
            t0 = time.perf_counter()
            df = reg[name].build(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - t0)
        timings[name] = round(min(runs), 3)
    total = round(sum(timings.values()), 3)

    print(json.dumps({
        "metric": "headline_queries_total_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
