"""Regenerate PLANS.md: formatted physical plans for representative
headline queries, committed so plan quality is reviewable without
running Spark.  Re-run after changing any of the listed plans.

Usage: python scripts/gen_plans.py
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

SHOWCASE = [
    ("flagship_filter_project",
     "filter + derive: predicate and projection must reach the parquet "
     "scan (PushedFilters / pruned ReadSchema); one codegen stage, no "
     "exchange."),
    ("q1_pricing_summary",
     "TPC-H Q1: partial_* aggregates BEFORE the single exchange "
     "(map-side combine); fixed-point units as plain long arithmetic "
     "inside codegen."),
    ("q5_local_supplier",
     "multi-join: every dimension broadcast (BroadcastHashJoin), the "
     "fact tables alone shuffle; join order keeps the fact stream "
     "unbroken."),
    ("join_asof_jvm",
     "as-of via union + window carry: exactly ONE Exchange "
     "hashpartitioning and no Python/Arrow nodes."),
    ("dedup_minhash_lsh",
     "LSH dedup: Arrow-vectorized hashing (one ArrowEvalPython), band "
     "self-join keyed by band string, exact verify only on candidates."),
    ("embedding_neardup_pairs",
     "lossless grid blocking: broadcast 3^d delta fan-out on (id, key) "
     "pairs only, shuffle keyed by one long, payload re-joined by id."),
    ("features_pit_window",
     "point-in-time features: both strictly-before RANGE frames share "
     "one (custkey, day) Exchange + Sort — a single Window operator, "
     "no self-join, no Python."),
    ("er_multikey_blocking",
     "entity resolution: two equality block self-joins (hash joins on "
     "the block keys, never cartesian), unioned, deduped, verified "
     "with JVM levenshtein on candidates only."),
    ("text_quality_linear",
     "hashed linear quality model: ZERO exchanges, zero joins, zero "
     "Python — the whole corpus pass is one codegen map stage."),
    ("kmeans_lloyd",
     "Lloyd assignment: centroids ride as broadcast literals in the "
     "expression tree (no join operator anywhere); the only shuffle is "
     "the (cluster, dim) partial-agg exchange."),
    ("sketch_grid_quantiles",
     "mergeable histogram sketch: partial_count before the first "
     "exchange, bin-count union as a second partial-agg, window "
     "finalize on the tiny merged sketch."),
    ("events_ewma_recent",
     "bounded-state EWMA: the top-256 window and the per-key fold "
     "share ONE event_type hash partitioning — exactly one Exchange, "
     "no Python."),
    ("events_concurrency_peaks",
     "distributed sweep-line: within-hour running sums partition by "
     "(type, hour); the cross-hour offset window runs over the tiny "
     "per-hour summary — NO single-partition Exchange anywhere."),
    ("sketch_hll_portable",
     "portable HLL: partial_max register combine before the (key, "
     "bucket) exchange; merge + finalize are plain aggregates over "
     "1024-row register tables — all JVM, no Python."),
    ("events_cep_sequence",
     "3-step CEP pattern: both range-frame window passes share ONE "
     "(user, time) sort — no join operator anywhere, vs the naive "
     "triple self-join."),
    ("join_bloom_prefiltered",
     "bloom semi-join reduction: the 4096-word filter broadcasts to "
     "the fact scan; the exact join afterwards sees only surviving "
     "rows."),
    ("events_attribution",
     "last-touch attribution: both IGNORE-NULLS last_value exprs share "
     "one frame — a single Window node over ONE user_id Exchange, no "
     "self-join, no Python."),
    ("text_phrase_search",
     "positional phrase search: the two term filters sit BELOW the "
     "posting-list join, so only the query terms' postings shuffle, "
     "keyed by (doc_id, pos)."),
    ("stats_ks_twosample",
     "exact two-sample KS: TWO-PHASE prefix sum — per-value cumulative "
     "window partitioned by price bucket, only the bounded bucket-"
     "offset frame is single-partition; D's numerator stays integer."),
    ("embedding_covariance",
     "exact covariance: one int64 Gram matmul per Arrow batch; the "
     "only shuffle carries (i, j, s) partials — d²-bounded, corpus-"
     "size-independent; one corpus scan by construction."),
    ("events_autocorrelation",
     "lag-k ACF: events collapse to the hourly frame in one partial-"
     "agg shuffle; moments and all six lags share ONE window sort "
     "over that bounded frame — no join, no second scan."),
    ("embedding_mmr_diversify",
     "MMR re-rank: corpus scanned once (TakeOrdered pool carries its "
     "vectors); pairwise sims + greedy in ONE Arrow stage on the "
     "20-row pool partition."),
    ("stats_mannwhitney_u",
     "rank-sum test: the cumulative rank scan is the shared two-phase "
     "prefix (bucket-partitioned window + broadcast offsets); the only "
     "single-partition frames are the bounded bucket prefix and the "
     "final scalar."),
    ("stats_bootstrap_ci",
     "Poisson bootstrap: 32-row replicate table broadcast-nested-loop "
     "joins the scan, Poisson weights are map-side CASE arms, and the "
     "replicate aggregation is partial — each task emits 32 rows."),
    ("geo_nearest_warehouse",
     "geo argmin: 25 sites broadcast; haversine + 1-meter gridding + "
     "int64-encoded argmin all inside one codegen stage; the shuffle "
     "carries one partial MIN per customer per task."),
    ("orders_kaplan_meier",
     "survival: corpus reduces per-customer, then to the date-bounded "
     "lifetime grid; risk-set suffix counts and the gridded-ln cumsum "
     "ride windows over that bounded grid only."),
    ("sql_recursive_hierarchy",
     "native WITH RECURSIVE (Spark 4 union-loop execution): per-step "
     "frontier projection+filter stays codegen'd; no Python driver "
     "loop.  Shown on the underlying SQL (the catalog build returns "
     "the pinned localCheckpoint result — see events_holt_linear's "
     "note)."),
    ("ml_auc_roc",
     "exact ROC AUC: distinct-score grouping bounds the frame, the "
     "cumulative negative count is the shared two-phase prefix, and "
     "npos/nneg ride the broadcast offsets — all-int64 pair counting."),
    ("ml_gains_deciles",
     "gains table: global rank = per-bucket row_number + broadcast "
     "offsets (never a single-partition corpus sort); div-based decile "
     "cut; the 10-row cumulative window is driver-trivial."),
    ("embedding_outlier_scores",
     "diagonal Mahalanobis: per-dim stats collapse to 64 literal "
     "(mu, var) pairs, scoring is one map-only codegen pass over "
     "intact arrays, top-k is TakeOrdered — no explode, no corpus "
     "shuffle."),
    ("exact_weighted_median",
     "weighted median: 2*cum >= tot integer test + monotonicity turn "
     "the extraction into MIN over the two-phase bucketed prefix — no "
     "second window, no halving division."),
    ("events_lateness_profile",
     "lateness audit: the global event-time high-water mark is a "
     "two-phase prefix-MAX (bucket_offsets max mode) over arrival "
     "buckets; all lateness arithmetic in int64 epoch-us."),
    ("dq_referential_integrity",
     "FK audit: dimension parents broadcast, the one fact-fact edge "
     "shuffles on the key, per-edge counts partial-aggregate to a "
     "7-row union."),
    ("events_holt_linear",
     "Holt smoothing: native WITH RECURSIVE (union-loop) over the "
     "bounded day grid, joining the static grid inside the recursive "
     "member; integer floor-div state, no Python.  Shown on the "
     "underlying SQL: since round 6 the catalog build returns the "
     "PINNED (localCheckpoint) result so the scoped row-limit raise "
     "can be restored — the recursion plan below is what executes "
     "inside that pin."),
    ("text_ngram_novelty",
     "novelty: one explode pass, window MIN on the shingle key (no "
     "join-back recompute), partial-agg to the source frame."),
    ("events_markov_removal",
     "Markov removal effect: one lead() corpus pass + bounded "
     "aggregations; the absorbing-chain recursion is driver-side model "
     "math, so the result plan is a local relation."),
    ("knn_cosine_ivfpq",
     "IVFADC: exactly two ArrowEvalPython stages (residual-PQ encode, "
     "ADC scoring) — a third means the double-eval pushdown returned; "
     "the probe table joins as a BroadcastHashJoin on cell; the only "
     "corpus-wide exchange is the per-query top-shortlist window; the "
     "exact re-rank joins full vectors to the shortlist ONLY."),
]


def main() -> None:
    import argparse

    from flinkapps_spark.plans import catalog
    from flinkapps_spark.session import get_spark

    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001"))
    ap.add_argument("--out", default=os.path.join(ROOT, "PLANS.md"))
    ns = ap.parse_args()
    sf_dir = ns.sf_dir
    spark = get_spark("gen-plans")
    spark.sparkContext.setLogLevel("ERROR")
    reg = catalog.registry()

    lines = [
        "# PLANS — physical plans of representative queries",
        "",
        f"Generated by `python scripts/gen_plans.py` at `{sf_dir}` "
        "(plan SHAPE is scale-invariant; AQE may re-plan sizes at "
        "runtime).  What to check per plan is noted above each block.",
    ]
    def build_unpinned(name):
        """The two recursive-CTE queries return a pinned localCheckpoint
        result (scoped row-limit raise, round 6); show the underlying
        recursion's own plan instead of the pin's LogicalRDD scan."""
        from flinkapps_spark.sources.batch import load_table
        if name == "events_holt_linear":
            from flinkapps_spark.plans.timeseries_queries import _HOLT_SQL
            load_table(spark, sf_dir, "events") \
                .createOrReplaceTempView("holt_plan_v")
            return spark.sql(_HOLT_SQL.format(table="holt_plan_v"))
        if name == "sql_recursive_hierarchy":
            from flinkapps_spark.plans.relational_queries import (
                _REC_HIER_SQL,
            )
            load_table(spark, sf_dir, "customer") \
                .createOrReplaceTempView("rec_hier_plan_v")
            return spark.sql(_REC_HIER_SQL.format(table="rec_hier_plan_v"))
        return reg[name].build(spark, sf_dir)

    for name, note in SHOWCASE:
        df = build_unpinned(name)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain(mode="formatted")
        plan = buf.getvalue().rstrip()
        # keep the operator tree + the pushdown-evidence lines; drop the
        # long tail of per-operator field dumps to stay reviewable
        head = plan.split("\n\n")[0]
        evidence = [ln.strip() for ln in plan.splitlines()
                    if any(k in ln for k in
                           ("PushedFilters", "ReadSchema", "Batched"))]
        block = head + ("\n\n" + "\n".join(evidence) if evidence else "")
        lines += ["", f"## {name}", "", note, "", "```", block, "```"]
    out = ns.out
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {out} ({len(SHOWCASE)} plans)")
    spark.stop()


if __name__ == "__main__":
    main()
