"""Physical-plan assertions: the scale properties the engine promises
(predicate pushdown, column pruning, broadcast strategy, codegen) hold in
the actual Catalyst plans — not just in docstrings.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from flinkapps_spark.plans import catalog
from tests.conftest import SF_ORACLE

REG = catalog.registry()


def plan_of(spark, name: str) -> str:
    df = REG[name].build(spark, SF_ORACLE)
    return df._jdf.queryExecution().executedPlan().toString()


def test_flagship_pushes_filter_to_scan(spark):
    """The membership filter must reach the parquet scan (the reference
    filters post-parse on every record — ours never deserializes pruned
    rows)."""
    plan = plan_of(spark, "flagship_filter_project")
    assert "PushedFilters: [In(event_type" in plan, plan


def test_column_pruning(spark):
    """A 2-column projection reads 2 columns, not the whole schema."""
    df = REG["project_rename"].build(spark, SF_ORACLE).select("pk", "pname")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ReadSchema" in plan
    read = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "p_partkey" in read and "p_name" in read
    assert "p_retailprice" not in read, read


def test_broadcast_join_strategy(spark):
    plan = plan_of(spark, "join_broadcast_parts")
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan


def test_q1_partial_aggregation(spark):
    """Map-side partial agg before the shuffle: at 100 TB the shuffle must
    carry one row per group per task.  Codegen is checked on the *final*
    (post-AQE) plan — markers only exist after execution."""
    df = REG["q1_pricing_summary"].build(spark, SF_ORACLE)
    assert "partial" in \
        df._jdf.queryExecution().executedPlan().toString().lower()
    df.collect()  # materialize THIS df → its AQE plan becomes final
    final = df._jdf.queryExecution().executedPlan().toString()
    # '*(n)' prefixes mark WholeStageCodegen stages in the plan string
    assert "*(1)" in final, final
    assert "partial_sum" in final, final
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual" in final


def test_semi_join_physical(spark):
    plan = plan_of(spark, "join_semi_customers")
    assert "LeftSemi" in plan, plan


def test_topk_no_global_sort(spark):
    """Top-k per group is a windowed rank, not a global sort-limit of the
    raw table."""
    plan = plan_of(spark, "topk_per_group")
    assert "RunningWindowFunction" in plan or "Window" in plan


def test_no_cartesian_in_joins(spark):
    """Equi-joins must never degrade to cartesian products; only the
    explicitly-bounded range/pairs queries may nested-loop."""
    for name in ("q3_shipping_priority", "q5_local_supplier",
                 "join_outer_counts", "join_semi_customers"):
        plan = plan_of(spark, name)
        assert "CartesianProduct" not in plan, f"{name}: {plan}"


def test_bucketed_join_no_shuffle(spark, tmp_path):
    """Joins on the bucket column of two co-bucketed tables run without
    either side shuffling (no Exchange above the scans)."""
    from flinkapps_spark.sinks.files import write_bucketed
    from flinkapps_spark.sources.batch import load_table

    spark.sql(f"CREATE DATABASE IF NOT EXISTS bktdb "
              f"LOCATION '{tmp_path}/bktdb'")
    # at fixture scale AQE would pick a broadcast join (correct for small
    # inputs); disable it to expose the shuffle-free bucketed sort-merge
    # that a fact-fact join at 100 TB would use
    saved = {k: spark.conf.get(k, None) for k in
             ("spark.sql.autoBroadcastJoinThreshold",
              "spark.sql.adaptive.autoBroadcastJoinThreshold")}
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        li = load_table(spark, SF_ORACLE, "lineitem") \
            .select("l_orderkey", "l_quantity")
        od = load_table(spark, SF_ORACLE, "orders") \
            .select("o_orderkey", "o_totalprice")
        write_bucketed(li, "bktdb.li_b", "l_orderkey", 8)
        write_bucketed(od, "bktdb.od_b", "o_orderkey", 8)
        j = (spark.table("bktdb.li_b")
             .join(spark.table("bktdb.od_b"),
                   F.col("l_orderkey") == F.col("o_orderkey")))
        j.collect()
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan, plan
        assert "Exchange" not in plan, plan  # co-located: no shuffle at all
    finally:
        for k, v in saved.items():
            if v is not None:
                spark.conf.set(k, v)
            else:
                # get(k, None)==None means the conf had no explicit value;
                # unset, or the -1 leaks into the shared session and
                # degrades later unhinted joins to cartesian products
                spark.conf.unset(k)
        spark.sql("DROP DATABASE IF EXISTS bktdb CASCADE")


def test_q5_fact_joins_not_hint_broadcast(spark):
    """q5's fact-scale joins carry no user broadcast hint: the logical plan
    pins broadcast only on the supplier/nation/region dims (AQE may still
    choose broadcast at runtime for small inputs — a size decision)."""
    df = REG["q5_local_supplier"].build(spark, SF_ORACLE)
    logical = df._jdf.queryExecution().optimizedPlan().toString()
    # three dim-side hints survive into the optimized plan, no more
    assert logical.count("UnresolvedHint") == 0
    physical = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in physical


def test_partition_pruning_static_and_dynamic(spark, tmp_path):
    """Partition-layout pruning, the single biggest scan saver at 100 TB:
    (a) a literal filter on the partition column becomes a PartitionFilter
    (directories never listed, files never opened); (b) joining on the
    partition column against a filtered dim inserts a dynamic-partition-
    pruning subquery, so the fact scan prunes by the dim's surviving keys
    at runtime."""
    from flinkapps_spark.sources.batch import load_table

    path = str(tmp_path / "ev_part")
    ev = load_table(spark, SF_ORACLE, "events")
    ev.write.partitionBy("event_type").mode("overwrite").parquet(path)

    back = spark.read.parquet(path).filter(F.col("event_type") == "purchase")
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(event_type" in plan, plan

    dim = spark.createDataFrame(
        [("purchase", 1), ("error", 2)], "event_type string, pri int"
    ).filter(F.col("pri") == 1)
    j = spark.read.parquet(path).join(dim, "event_type")
    jplan = j._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in jplan.lower(), jplan


def test_runtime_bloom_filter_injection(spark):
    """Runtime bloom-filter join pruning: a selective build side injects a
    bloom_filter_agg into the probe side's scan stage, filtering fact rows
    BEFORE the shuffle.  At 100 TB the default thresholds (10 GB probe
    scan) trigger this automatically; at fixture scale we lower the
    application-side threshold to demonstrate the rewrite."""
    from flinkapps_spark.sources.batch import load_table

    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter."
        "applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        li = load_table(spark, SF_ORACLE, "lineitem")
        pa = load_table(spark, SF_ORACLE, "part").filter(
            F.col("p_name").like("red%"))
        j = li.join(pa, F.col("l_partkey") == F.col("p_partkey"))
        plan = j._jdf.queryExecution().optimizedPlan().toString()
        assert "bloom_filter_agg" in plan, plan
    finally:
        for k, v in saved.items():
            if v is not None:
                spark.conf.set(k, v)
            else:
                spark.conf.unset(k)  # no explicit prior value: unset, don't leak


def test_range_partitioned_sorted_write_layout(spark, tmp_path):
    """Write-optimized layout: repartitionByRange(shipdate) +
    sortWithinPartitions gives RangePartitioning (one Exchange) and an
    in-partition Sort with NO second exchange — the layout that makes
    parquet min/max row-group stats selective for time-range scans at
    100 TB (each file covers a narrow date band instead of the full
    range)."""
    from flinkapps_spark.sources.batch import load_table

    li = load_table(spark, SF_ORACLE, "lineitem").select(
        "l_orderkey", "l_shipdate", "l_extendedprice")
    laid_out = (li.repartitionByRange(8, F.col("l_shipdate"))
                .sortWithinPartitions("l_shipdate"))
    plan = laid_out._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning" in plan.lower(), plan
    assert plan.lower().count("exchange") == 1, plan  # sort adds no shuffle

    # the layout round-trips: narrow date filter over the written files
    # still pushes to the scan (row-group pruning then applies file-side)
    path = str(tmp_path / "li_sorted")
    laid_out.write.mode("overwrite").parquet(path)
    back = spark.read.parquet(path).filter(
        F.col("l_shipdate") >= F.lit("1999-06-01 00:00:00").cast("timestamp"))
    bplan = back._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(l_shipdate), GreaterThanOrEqual" in bplan


def test_no_cartesian_entire_catalog(spark):
    """Catalog-wide plan lint: NO batch query may contain a
    CartesianProduct.  Intentional small-side nested loops (range join,
    broadcast k-NN, 1-row scalar cross joins) plan as
    BroadcastNestedLoopJoin, which is allowed; an unhinted
    CartesianProduct means a join lost its condition — fatal at scale."""
    from tests.conftest import SF_SMOKE

    offenders = []
    for name, q in sorted(REG.items()):
        if name.startswith("stream_"):
            continue  # build() executes a real stream; covered elsewhere
        df = q.build(spark, SF_SMOKE)
        if "CartesianProduct" in \
                df._jdf.queryExecution().executedPlan().toString():
            offenders.append(name)
    assert not offenders, offenders


def test_catalog_layout_queries_plan_shapes(spark):
    """The catalog's storage-layout queries really exercise the layout:
    source_partition_pruning must resolve its predicate as PartitionFilters
    (directory pruning + pruned ReadSchema), and join_bucketed_colocated
    must scan bucketed tables (SelectedBucketsCount present; with broadcast
    disabled the join is a no-exchange SortMergeJoin — covered by
    test_bucketed_join_no_shuffle)."""
    from flinkapps_spark.plans.curation_queries import (
        join_bucketed_colocated, source_partition_pruning,
    )
    from tests.conftest import SF_SMOKE

    p1 = source_partition_pruning(spark, SF_SMOKE) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(event_type" in p1, p1
    assert "= purchase" in p1, p1
    assert "ReadSchema: struct<user_id:bigint,value:double>" in p1, p1

    p2 = join_bucketed_colocated(spark, SF_SMOKE) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "SelectedBucketsCount: 8 out of 8" in p2, p2


def test_q2_semi_joins_below_aggregation(spark):
    """q2's selective dims reach lineitem BEFORE the (partkey, suppkey)
    aggregation: two broadcast LEFT-SEMI joins must appear under the
    partial aggregate, so the big shuffle reads only matching rows."""
    from flinkapps_spark.plans import catalog
    from tests.conftest import SF_SMOKE

    plan = catalog.registry()["q2_min_cost_supplier"] \
        .build(spark, SF_SMOKE) \
        ._jdf.queryExecution().executedPlan().toString()
    assert plan.count("LeftSemi") >= 2, plan
    assert "BroadcastHashJoin" in plan, plan


def test_asof_jvm_single_shuffle(spark):
    """The JVM as-of join's whole physical plan contains exactly one
    Exchange and no Python evaluation — the property that makes it the
    100 TB default (SCALE.md Joins)."""
    import re

    from flinkapps_spark.plans import catalog
    from tests.conftest import SF_SMOKE

    plan = catalog.registry()["join_asof_jvm"] \
        .build(spark, SF_SMOKE) \
        ._jdf.queryExecution().executedPlan().toString()
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1, plan
    assert "Python" not in plan and "Arrow" not in plan, plan


def test_gapfill_broadcast_size_guard(spark):
    """events_gap_fill broadcasts the bucket×type grid only under the
    session broadcast threshold (VERDICT r3 #3): default regime shows a
    BroadcastHashJoin; with autobroadcast disabled (grid 'too big') the
    SAME builder falls back to a non-broadcast join, both correct."""
    from flinkapps_spark.plans import catalog
    from tests.conftest import SF_SMOKE

    build = catalog.registry()["events_gap_fill"].build
    p_bc = build(spark, SF_SMOKE) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in p_bc, p_bc

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        df = build(spark, SF_SMOKE)
        p_sh = df._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" not in p_sh, p_sh
        assert df.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


# ---------------------------------------------------------------------------
# round-4 additions: plan shapes of the new query families
# ---------------------------------------------------------------------------


def test_seasonal_baseline_broadcasts_profile(spark):
    """The (type, hour) profile is provably bounded (types x 24 rows) and
    must broadcast; the event stream itself must not shuffle for the
    join-back."""
    plan = plan_of(spark, "events_seasonal_baseline")
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_pit_features_single_window_sort(spark):
    """Both strictly-before RANGE frames share one (custkey, day)
    partitioning/sort: exactly one Exchange and one Sort in the plan —
    the point-in-time feature computation never self-joins."""
    plan = plan_of(spark, "features_pit_window")
    assert plan.count("Exchange") == 1, plan
    assert "Join" not in plan, plan


def test_interp_single_sort(spark):
    """All four IGNORE-NULLS neighbor lookups share one (user_id, ts,
    event_id) sort — one Exchange, one Sort, no Python stage."""
    plan = plan_of(spark, "interp_linear_fill")
    assert plan.count("Exchange") == 1, plan
    assert "Sort" in plan, plan
    assert "Python" not in plan, plan


def test_er_blocking_equi_joins_only(spark):
    """Both ER blocking passes are equality joins on block keys (never a
    cartesian with a post-filter): the a.k < b.k predicate must ride as
    a join condition/filter on a hash or sort-merge join."""
    plan = plan_of(spark, "er_multikey_blocking")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_snapshot_diff_single_key_join(spark):
    """The A-vs-B diff is one full-outer join on the primary key with
    constant-width fingerprints — no column-by-column join explosion."""
    plan = plan_of(spark, "snapshot_diff")
    assert "FullOuter" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_itemset_pairs_shuffle_on_pair_key(spark):
    """Basket pair expansion joins on the order key (bounded per-basket
    quadratic), aggregates on the pair key; the order-count side is
    explicitly broadcast."""
    plan = plan_of(spark, "itemset_copurchase_pairs")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" in plan, plan  # 1-row count table


def test_quality_linear_map_only(spark):
    """The hashed linear quality scorer is a pure JVM map over the scan:
    zero exchanges, zero joins, zero Python."""
    plan = plan_of(spark, "text_quality_linear")
    assert plan.count("Exchange") == 0, plan
    assert "Join" not in plan, plan
    assert "Python" not in plan, plan


def test_kmeans_assignment_no_join(spark):
    """Lloyd assignment carries the centroids as broadcast literals in the
    expression tree — the final plan has NO join operator, only the
    (cluster, dim) partial-agg shuffle."""
    plan = plan_of(spark, "kmeans_lloyd")
    assert "Join" not in plan, plan
    assert "partial_count" in plan or "HashAggregate" in plan, plan


def test_grid_quantiles_partial_merge(spark):
    """The histogram builds map-side partials before each exchange (the
    sketch-merge property in the physical plan), and never joins."""
    plan = plan_of(spark, "sketch_grid_quantiles")
    assert "partial_count" in plan or "partial_sum" in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "Python" not in plan, plan


def test_ewma_single_shuffle(spark):
    """The top-256 window and the per-key fold share one event_type hash
    partitioning: exactly one Exchange, no Python stage."""
    plan = plan_of(spark, "events_ewma_recent")
    assert plan.count("Exchange") == 1, plan
    assert "Python" not in plan, plan


def test_concurrency_peaks_no_global_sort(spark):
    """The sweep-line never sorts globally: the within-hour running sum
    partitions by (type, hour) and the offset window runs over the tiny
    per-hour summary — no single-partition Exchange, no Python."""
    plan = plan_of(spark, "events_concurrency_peaks")
    assert "Exchange SinglePartition" not in plan, plan
    assert "Python" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_hll_portable_partial_agg_no_python(spark):
    """Registers partial-aggregate map-side (max per bucket combines
    before the exchange) and the whole sketch stays JVM-side."""
    plan = plan_of(spark, "sketch_hll_portable")
    assert "partial_max" in plan or "partial_count" in plan, plan
    assert "Python" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_line_dedup_shuffles_on_digest_or_doc(spark):
    """Line dedup never broadcasts the corpus and never goes quadratic:
    only hash joins on doc_id / md5 digests, no cartesian."""
    plan = plan_of(spark, "text_line_dedup")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_kmv_top_k_is_take_ordered(spark):
    """The KMV samples run as TakeOrdered (per-partition top-k merged on
    the driver), never a global sort — and the sketch stays JVM-side."""
    plan = plan_of(spark, "sketch_kmv_setops")
    assert "TakeOrderedAndProject" in plan, plan
    assert "Python" not in plan, plan


def test_cms_cells_partial_agg(spark):
    """CMS cell counts combine map-side before the exchange, and the
    probe join broadcasts the 4096-cell table — never the other way."""
    plan = plan_of(spark, "sketch_cms_freq")
    assert "partial_count" in plan or "HashAggregate" in plan, plan
    assert "Python" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_hll_rolling_no_event_scale_sort(spark):
    """The rolling-window merge works on register tables: the only sort
    in the plan orders the |days| table for probe ranking, and no Python
    stage ever touches the event stream."""
    plan = plan_of(spark, "sketch_hll_rolling7d")
    assert "Python" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_cep_sequence_single_sort_no_join(spark):
    """Both CEP window passes share one (user, us) sort: a single
    Exchange, no join operator, no Python — the anti-triple-self-join."""
    plan = plan_of(spark, "events_cep_sequence")
    assert plan.count("Exchange") <= 2, plan   # window + final group agg
    assert "Join" not in plan, plan
    assert "Python" not in plan, plan


def test_attribution_single_window_no_join(spark):
    """Last-touch attribution is ONE shuffle on user_id feeding ONE
    Window node (both IGNORE-NULLS last_value exprs share the frame) —
    no self-join, no Python in the plan."""
    plan = plan_of(spark, "events_attribution")
    assert plan.count("Exchange") <= 1, plan
    assert plan.count("Window") == 1, plan
    assert "Join" not in plan, plan
    assert "Python" not in plan, plan


def test_category_lift_no_join_no_python(spark):
    """Lift matrix: the fact scan collapses in one partial-aggregated
    shuffle; the marginal windows run over the tiny category frame with
    no join and no Python."""
    plan = plan_of(spark, "stats_category_lift")
    assert "partial_count" in plan or "partial" in plan, plan
    assert "Join" not in plan, plan
    assert "Python" not in plan, plan


def test_phrase_search_filters_below_join(spark):
    """Phrase search joins only the two query terms' posting lists: the
    term filters sit BELOW the join (postings for other terms never
    shuffle), and the join keys on (doc_id, pos)."""
    plan = plan_of(spark, "text_phrase_search")
    assert plan.count("Join") == 1, plan
    join_at = plan.index("Join")
    # both term-equality filters appear in the subtree under the join
    below = plan[join_at:]
    assert below.count("= hash") >= 1 and below.count("= value") >= 1, plan
    assert "Python" not in plan, plan


def test_group_holdout_map_side_hash(spark):
    """The split decision is a stateless map-side hash: no join, no
    Python, and only aggregation exchanges in the plan."""
    plan = plan_of(spark, "sample_group_holdout")
    assert "Join" not in plan, plan
    assert "Python" not in plan, plan
    assert plan.count("Exchange") <= 2, plan


def test_top_paths_shared_sort_take_ordered(spark):
    """Path analysis: the lag/cumsum windows share one (user, ts) sort;
    the top-k is TakeOrdered (k rows per partition to the driver), not a
    global Sort; no join, no Python."""
    plan = plan_of(spark, "events_top_paths")
    assert "TakeOrderedAndProject" in plan, plan
    assert "Join" not in plan, plan
    assert "Python" not in plan, plan
    assert plan.count("Exchange") <= 2, plan


def test_cusum_partial_agg_no_join(spark):
    """CUSUM: events collapse to the hourly frame in one partial-agg
    shuffle; the marginal/prefix windows run over that tiny frame with
    no join and no Python."""
    plan = plan_of(spark, "events_changepoint_cusum")
    assert "partial" in plan, plan
    assert "Join" not in plan, plan
    assert "Python" not in plan, plan
    assert plan.count("Exchange") <= 2, plan


def test_attribution_skewsafe_slices_the_user_key(spark):
    """The skew-safe attribution's event-scale window partitions by
    (user_id, slice) — never by user_id alone; only the tiny per-slice
    summary frame uses the bare user key. No Python anywhere."""
    plan = plan_of(spark, "events_attribution_skewsafe")
    assert "Python" not in plan, plan
    import re
    parts = re.findall(r"hashpartitioning\(([^)]*)\)", plan)
    sliced = [p for p in parts if "slice" in p]
    assert sliced, plan   # the event-scale exchanges carry the slice key


def test_hybrid_rrf_pools_are_take_ordered(spark):
    """BOTH ranker pools and the final fused cut are TakeOrdered top-k
    (3 nodes: bm25 pool, cosine pool, fused top-10) — never a global
    sort of the corpus; a regression of either pool to a corpus-wide
    Sort/window drops the count below 3."""
    plan = plan_of(spark, "hybrid_rrf_fusion")
    assert plan.count("TakeOrderedAndProject") >= 3, plan


def test_ks_wide_window_partitioned_by_bucket(spark):
    """The KS cumulative scan must be the two-phase form: the per-value
    window runs PARTITIONED by the price bucket (never one global sort
    over the value grid), with the bucket offsets broadcast back. No
    Python anywhere."""
    plan = plan_of(spark, "stats_ks_twosample")
    assert "windowspecdefinition(bkt" in plan, plan
    # single-partition passes only over scalar/bounded frames (the
    # bucket-offset prefix and the global n1/n2 count) — never the data
    assert plan.count("Exchange SinglePartition") <= 2, plan
    assert "Python" not in plan, plan


def test_audience_overlap_broadcast_sizes(spark):
    """Audience sizes (|event types| rows) attach via broadcast joins;
    the user-key self-join is an equi-join, not a cartesian."""
    plan = plan_of(spark, "events_audience_overlap")
    assert plan.count("BroadcastHashJoin") >= 2, plan
    assert "CartesianProduct" not in plan, plan
    assert "Python" not in plan, plan


def test_streaks_single_customer_shuffle(spark):
    """Gaps-and-islands: the distinct, the window, and both aggregations
    all share the customer-key partitioning — at most two exchanges
    (distinct on (cust, month), then the cust-only window), no join."""
    plan = plan_of(spark, "orders_active_streaks")
    assert plan.count("Exchange") <= 2, plan
    assert "Join" not in plan, plan
    assert "Python" not in plan, plan


def test_recsys_topk_take_ordered(spark):
    """Item-item CF: the top-k is TakeOrdered (per-partition heaps), not
    a global sort; all joins keep their conditions."""
    plan = plan_of(spark, "recsys_item_cosine")
    assert "TakeOrderedAndProject" in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "Python" not in plan, plan


def test_profile_single_pass_expand(spark):
    """Column profiling is ONE scan: the multi-countDistinct plans as a
    single Expand + aggregate, no join, no union of per-column scans."""
    plan = plan_of(spark, "profile_table_columns")
    assert "Expand" in plan, plan
    assert "Join" not in plan, plan
    assert plan.count("FileScan") == 1, plan
    assert plan.count("Exchange") <= 2, plan


def test_ab_conversion_two_phase_agg(spark):
    """A/B readout: per-user flags from one user-key shuffle with map-side
    partial MAX, then a scalar global aggregate — two exchanges, no join,
    no Python."""
    plan = plan_of(spark, "stats_ab_conversion")
    assert plan.count("Exchange") <= 2, plan
    assert "Join" not in plan, plan
    assert "Python" not in plan, plan
    assert "partial" in plan.lower(), plan


def test_covariance_shuffles_partials_only(spark):
    """Covariance: exactly one Arrow-batched Python stage (the int64 Gram
    matmul); every exchange AFTER it carries only (i, j, s) partials —
    the embedding column never crosses a shuffle."""
    plan = plan_of(spark, "embedding_covariance")
    # exactly two Python stages (Gram partials; d²-row assembly) and ONE
    # corpus scan — the join-based assembly re-executed the scan 3x
    assert plan.count("MapInPandas") == 2, plan
    assert plan.count("FileScan") == 1, plan
    # no exchange carries the embedding column: only (i, j, s) partials
    for ln in plan.splitlines():
        if "Exchange" in ln:
            assert "embedding" not in ln, ln


def test_rake_take_ordered_no_python(spark):
    """RAKE: pure built-in expressions (split/explode/agg) — no Python
    UDFs; top-k phrases via TakeOrdered, not a global sort."""
    plan = plan_of(spark, "text_keyword_rake")
    assert "TakeOrderedAndProject" in plan, plan
    assert "Python" not in plan, plan


def _final_plan_of(spark, name: str) -> str:
    """Executed-and-finalized AQE plan (node counts on the raw string
    double-count: toString appends the '== Initial Plan ==' section)."""
    df = REG[name].build(spark, SF_ORACLE)
    df.collect()
    return df._jdf.queryExecution().executedPlan() \
        .toString().split("Initial Plan")[0]


def test_benford_single_scan_windowed_total(spark):
    """Benford audit: one scan of orders; the grand total comes from a
    window over the 9-row digit frame, not a second aggregation branch."""
    plan = _final_plan_of(spark, "dq_benford_digits")
    assert plan.count("FileScan") == 1, plan
    assert "Join" not in plan, plan
    assert "Python" not in plan, plan


def test_mmr_single_corpus_scan_one_arrow_stage(spark):
    """MMR: exactly one corpus scan (plus the 1-row query-vector scan)
    and ONE Arrow stage over the pool — a Spark-side pool self-join
    re-materialized the corpus behind an AQE broadcast stage."""
    plan = _final_plan_of(spark, "embedding_mmr_diversify")
    assert plan.count("FileScan") == 2, plan
    assert plan.count("MapInPandas") == 1, plan
    assert "TakeOrderedAndProject" in plan, plan


def test_autocorrelation_hourly_collapse_first(spark):
    """ACF: events collapse to the hourly frame in ONE partial-agg
    shuffle; the lag joins and moment windows run on that bounded frame
    — a single corpus scan, no Python."""
    plan = _final_plan_of(spark, "events_autocorrelation")
    assert plan.count("FileScan") == 1, plan
    assert "Python" not in plan, plan
    assert "partial" in plan.lower(), plan


def test_zipf_take_ordered_vocab(spark):
    """Zipf fit: vocabulary counts partial-agg, top-100 via TakeOrdered
    (never a global sort of the vocabulary), scalar OLS aggregate."""
    plan = _final_plan_of(spark, "text_zipf_fit")
    assert "TakeOrderedAndProject" in plan, plan
    assert "Python" not in plan, plan
    assert plan.count("FileScan") == 1, plan


def test_cohort_ltv_single_chain(spark):
    """Cohort LTV: one scan; cohort window, (cohort, age) aggregation,
    and the cumulative/FIRST_VALUE windows chain without a join (the
    cohort-size shortcut rides the age-0 active count)."""
    plan = _final_plan_of(spark, "orders_cohort_ltv")
    assert plan.count("FileScan") == 1, plan
    assert "Join" not in plan, plan
    assert "Python" not in plan, plan


def test_gini_two_phase_rank_cached_base(spark):
    """Gini: the per-user frame is cached (InMemoryTableScan) so the
    bounded count-grid offsets cannot re-execute the corpus
    aggregation; the wide rank window is partitioned by count value."""
    plan = _final_plan_of(spark, "events_power_users_gini")
    # consumers read the cache; the only FileScan in the printed tree
    # is the cached relation's STORED build plan (nested sub-plan
    # printing truncates, so count the scans rather than the readers)
    assert "InMemoryTableScan" in plan, plan
    assert plan.count("FileScan") <= 1, plan
    assert "windowspecdefinition(x#" in plan, plan


def test_skyline_two_phase_prefix_max(spark):
    """Skyline: dominance via the shared bucket_offsets prefix-max —
    the RANGE window partitions by price band, the cross-bucket maxes
    broadcast, and the cached base keeps the scan single."""
    plan = _final_plan_of(spark, "orders_skyline_pareto")
    assert "InMemoryTableScan" in plan, plan
    # every printed FileScan is a cached relation's STORED build plan
    # (one per InMemoryRelation print) — no live re-scan branch
    assert plan.count("FileScan") <= plan.count("InMemoryRelation"), plan
    assert "windowspecdefinition(bkt#" in plan, plan
    assert "Python" not in plan, plan


def test_mannwhitney_two_phase_rank_window(spark):
    """Mann-Whitney reuses the KS shape: the cumulative rank window is
    partitioned by price bucket; single-partition passes only over the
    bounded bucket frame. No Python."""
    plan = plan_of(spark, "stats_mannwhitney_u")
    assert "windowspecdefinition(bkt" in plan, plan
    assert plan.count("Exchange SinglePartition") <= 2, plan
    assert "Python" not in plan, plan


def test_welch_moments_single_pass_no_window(spark):
    """Welch's t collects all six moments in ONE partial-aggregated scan:
    no window, no second corpus pass, no Python."""
    plan = plan_of(spark, "stats_welch_ttest")
    assert "partial" in plan.lower(), plan
    assert "windowspecdefinition" not in plan, plan
    assert "Python" not in plan, plan
    assert plan.count("FileScan") <= 2, plan  # orders + customer, once each


def test_user_entropy_two_partial_aggs_no_window(spark):
    """Entropy is two partial-aggregated shuffles (type grid, then user)
    — no window, no broadcast of corpus-sized state, no Python."""
    plan = plan_of(spark, "events_user_entropy")
    assert "partial" in plan.lower(), plan
    assert "windowspecdefinition" not in plan, plan
    assert "Exchange SinglePartition" not in plan, plan
    assert "Python" not in plan, plan


def test_runs_test_windows_ride_daily_series(spark):
    """Runs test: every window partitions by event_type over the
    date-bounded daily series; the corpus collapses through a partial
    agg first and nothing runs single-partition."""
    plan = plan_of(spark, "events_runs_test")
    assert "windowspecdefinition(event_type" in plan, plan
    assert "partial" in plan.lower(), plan
    assert "Exchange SinglePartition" not in plan, plan
    assert "Python" not in plan, plan


def test_drawdown_window_partitioned_by_segment(spark):
    """Drawdown's running max partitions by segment over per-day totals;
    the corpus reduces through a partial agg before any window."""
    plan = plan_of(spark, "orders_max_drawdown")
    assert "windowspecdefinition(seg" in plan, plan
    assert "partial" in plan.lower(), plan
    assert "Exchange SinglePartition" not in plan, plan
    assert "Python" not in plan, plan


def test_recursive_cte_native_loop(spark):
    """The recursive hierarchy runs through Spark's native recursive-CTE
    execution (a union-loop node, not a Python driver loop), and the
    per-step frontier work stays codegen'd JVM.  Since round 6 the
    catalog build returns the PINNED (localCheckpoint) result — the
    row-limit raise is scoped to the eager execution, see
    test_cte_row_limit_restored — so the native-loop property is
    asserted on the underlying SQL's own plan."""
    from flinkapps_spark.plans.relational_queries import _REC_HIER_SQL
    from flinkapps_spark.sources.batch import load_table

    load_table(spark, SF_ORACLE, "customer") \
        .createOrReplaceTempView("rec_cte_plan_v")
    df = spark.sql(_REC_HIER_SQL.format(table="rec_cte_plan_v"))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Loop" in plan or "Recursion" in plan, plan
    assert "Python" not in plan, plan


def test_compaction_cursor_partitioned_by_source(spark):
    """The compaction size cursor windows per table-partition (source) —
    never a global manifest order."""
    plan = plan_of(spark, "maintenance_compaction_bins")
    assert "windowspecdefinition(source" in plan, plan
    assert "Exchange SinglePartition" not in plan, plan
    assert "Python" not in plan, plan


def test_bootstrap_replicates_broadcast_partial_agg(spark):
    """Poisson bootstrap: the 32-row replicate table joins via broadcast
    nested loop (never a cartesian shuffle), weights are map-side, and
    the replicate aggregation is partial — each task ships 32 partial
    rows. The only single-partition frames are the 32-row replicate
    mean selection."""
    plan = plan_of(spark, "stats_bootstrap_ci")
    assert "BroadcastNestedLoopJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "partial" in plan.lower(), plan
    assert "Python" not in plan, plan


def test_woe_iv_band_frame_bounded(spark):
    """WOE/IV: one partial-aggregated shuffle to the 20-row band frame;
    the single-partition window rides only that bounded frame."""
    plan = plan_of(spark, "risk_woe_iv")
    assert "partial" in plan.lower(), plan
    assert plan.count("Exchange SinglePartition") <= 1, plan
    assert "Python" not in plan, plan


def test_kaplan_meier_grid_windows_bounded(spark):
    """KM: the corpus reduces per-customer then to the lifetime grid
    before any global-order window; no Python."""
    plan = plan_of(spark, "orders_kaplan_meier")
    assert "partial" in plan.lower(), plan
    # global windows only over the date-domain-bounded lifetime grid
    assert "windowspecdefinition(t#" in plan, plan
    assert "Python" not in plan, plan


def test_ivm_merge_is_one_join_of_partials(spark):
    """IVM: both branches partial-aggregate before the full-outer merge;
    no window, no Python."""
    plan = plan_of(spark, "ivm_incremental_agg")
    assert "partial" in plan.lower(), plan
    assert "FullOuter" in plan, plan
    assert "windowspecdefinition" not in plan, plan
    assert "Python" not in plan, plan


def test_geo_nearest_broadcast_argmin_single_pass(spark):
    """Geo nearest: 25-row site table broadcast (nested loop), encoded
    int64 argmin partial-aggregates — no window, no rejoin, no Python."""
    plan = plan_of(spark, "geo_nearest_warehouse")
    assert "BroadcastNestedLoopJoin" in plan, plan
    assert "partial" in plan.lower(), plan
    assert "windowspecdefinition" not in plan, plan
    assert plan.count("FileScan") <= 2, plan
    assert "Python" not in plan, plan


def test_auc_prefix_two_phase_bounded(spark):
    """ROC AUC: the cumulative negative count is the shared two-phase
    prefix — the wide window partitions by score bucket; the only
    single-partition frames are the bounded bucket-offset scans."""
    plan = plan_of(spark, "ml_auc_roc")
    assert "windowspecdefinition(bkt#" in plan, plan
    assert "partial" in plan.lower(), plan
    assert "CartesianProduct" not in plan, plan
    assert "Python" not in plan, plan


def test_pr_sweep_grid_broadcast_partial_agg(spark):
    """PR threshold sweep: the 9-row grid joins via broadcast nested
    loop and the confusion counts partial-aggregate map-side — each
    task ships 9 partial rows; no window, no Python."""
    plan = plan_of(spark, "ml_pr_threshold_sweep")
    assert "BroadcastNestedLoopJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "partial" in plan.lower(), plan
    assert "windowspecdefinition" not in plan, plan
    assert "Python" not in plan, plan


def test_gains_rank_two_phase_bounded(spark):
    """Gains deciles: the global rank is two-phase (row_number
    partitioned by score bucket + broadcast offsets); the decile
    aggregation partial-aggregates; the only unpartitioned windows ride
    the bounded bucket/decile frames."""
    plan = plan_of(spark, "ml_gains_deciles")
    assert "windowspecdefinition(nbkt#" in plan, plan
    assert "partial" in plan.lower(), plan
    assert "CartesianProduct" not in plan, plan
    assert "Python" not in plan, plan


def test_spearman_ranks_two_phase_per_type(spark):
    """Spearman: both rankings window per (event_type, bucket) — never
    a per-type single-partition sort; rank frames meet in an equi-join;
    the rho aggregation is partial."""
    plan = plan_of(spark, "stats_spearman_trend")
    assert "windowspecdefinition(event_type#" in plan, plan
    assert "Exchange SinglePartition" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "partial" in plan.lower(), plan
    assert "Python" not in plan, plan


def test_readability_map_only_single_shuffle(spark):
    """Readability: regexp counts are map-side; ONE partial-aggregated
    shuffle on source; no window, no join, no Python."""
    plan = plan_of(spark, "text_readability")
    assert plan.count("Exchange") <= 2, plan  # agg shuffle (+AQE read)
    assert "partial" in plan.lower(), plan
    assert "windowspecdefinition" not in plan, plan
    assert "Join" not in plan, plan
    assert "Python" not in plan, plan


def test_calibration_single_bounded_shuffle(spark):
    """Calibration bins: map-side binning + one partial-aggregated
    shuffle to the ~20-bin frame; no window, no join, no Python."""
    plan = plan_of(spark, "ml_calibration_bins")
    assert "partial" in plan.lower(), plan
    assert "windowspecdefinition" not in plan, plan
    assert "Join" not in plan, plan
    assert "Python" not in plan, plan


def test_forecast_backtest_bounded_after_per_day(spark):
    """Forecast backtest: one corpus shuffle to the (type, day) frame;
    the max-date scalar and train profile ride broadcasts; no window,
    no Python, no cartesian shuffle."""
    plan = plan_of(spark, "events_forecast_backtest")
    assert "partial" in plan.lower(), plan
    assert "CartesianProduct" not in plan, plan
    assert "windowspecdefinition" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan
    assert "Python" not in plan, plan


def test_power_iteration_near_dominant_energy(spark):
    """The integer-exact power-iteration estimate is unit-norm and its
    Rayleigh quotient captures >= 95% of numpy's top eigenvalue of the
    same normalized Gram matrix.  (The fixture embeddings are
    near-isotropic — lambda2/lambda1 ~ 0.98 — so exact eigvec agreement
    in 12 rounds is impossible by the (l2/l1)^k rate; the energy
    captured is the meaningful convergence property.)"""
    import numpy as np

    from flinkapps_spark.plans.ml_queries import (
        COV_SCALE, PI_SCALE, _dominant_eigvec_units,
    )
    from flinkapps_spark.sources.batch import load_table

    vu = np.array(_dominant_eigvec_units(spark, SF_ORACLE), dtype=np.float64)
    v = vu / PI_SCALE
    assert abs(np.linalg.norm(v) - 1.0) < 1e-3, np.linalg.norm(v)

    rows = (load_table(spark, SF_ORACLE, "embeddings")
            .select("embedding").collect())
    arr = np.stack([np.asarray(r["embedding"], dtype=np.float64)
                    for r in rows])
    xu = np.where(arr * COV_SCALE >= 0,
                  np.floor(arr * COV_SCALE + 0.5),
                  np.ceil(arr * COV_SCALE - 0.5))
    g = xu.T @ xu
    gn = g / np.abs(g).max()
    lam1 = np.linalg.eigvalsh(gn)[-1]
    rayleigh = float(v @ gn @ v / (v @ v))
    assert rayleigh >= 0.95 * lam1, (rayleigh, lam1)


def test_pca_project_jvm_dot_after_gram(spark):
    """PCA projection: the per-vector dot product stays in codegen (the
    eigenvector is a literal array); one partial-agg shuffle on label.
    The Python stage in the plan belongs to the Gram pass only — the
    projection plan itself (post-eigvec) must be Python-free, which we
    check by pinning exactly one Arrow stage (the Gram mapInPandas is
    driver-side, not in this plan)."""
    plan = plan_of(spark, "embedding_pca_project")
    assert "partial" in plan.lower(), plan
    assert "zip_with" in plan or "transform" in plan.lower() \
        or "aggregate" in plan.lower(), plan
    assert "ArrowEvalPython" not in plan, plan
    assert "FlatMapGroupsInPandas" not in plan, plan


def test_langid_confusion_bounded_cells(spark):
    """Langid confusion: map-side scoring, one partial-agg shuffle to
    the <= n_langs^2 cell frame; the share window rides that frame."""
    plan = plan_of(spark, "ml_langid_confusion")
    assert "partial" in plan.lower(), plan
    assert "Join" not in plan, plan
    assert "Python" not in plan, plan


def test_outlier_scores_map_side_takeordered(spark):
    """Outlier scoring: per-dim stats are literals, so the scoring plan
    is a map-only pass over intact arrays with TakeOrdered top-k — no
    explode, no window, no join, no Python, no full sort."""
    plan = plan_of(spark, "embedding_outlier_scores")
    assert "TakeOrderedAndProject" in plan, plan
    assert "Generate" not in plan, plan          # no explode in scoring
    assert "windowspecdefinition" not in plan, plan
    assert "Join" not in plan, plan
    assert "Python" not in plan, plan


def test_weighted_median_two_phase_min_agg(spark):
    """Weighted median: cumulative weight is the two-phase prefix
    (window partitioned by price bucket); the median extraction is a
    plain MIN aggregation — no second window, no Python."""
    plan = plan_of(spark, "exact_weighted_median")
    assert "windowspecdefinition(flag#" in plan, plan
    assert "Exchange SinglePartition" not in plan, plan
    assert "partial" in plan.lower(), plan
    assert "Python" not in plan, plan


def test_referential_integrity_broadcast_dims(spark):
    """RI audit: dimension parents broadcast; only the lineitem->orders
    edge shuffles; per-edge counts partial-aggregate to 7 rows."""
    plan = plan_of(spark, "dq_referential_integrity")
    assert plan.count("BroadcastHashJoin") >= 5, plan
    assert "CartesianProduct" not in plan, plan
    assert "partial" in plan.lower(), plan
    assert "Python" not in plan, plan


def test_dp_counts_bounded_frame(spark):
    """DP counts: one partial-agg shuffle to the per-type frame; noise
    is map-side arithmetic — no window, no join, no Python."""
    plan = plan_of(spark, "privacy_dp_counts")
    assert "partial" in plan.lower(), plan
    assert "windowspecdefinition" not in plan, plan
    assert "Join" not in plan, plan
    assert "Python" not in plan, plan


def test_lateness_prefix_max_two_phase(spark):
    """Lateness audit: the global prefix-MAX windows per arrival
    bucket (two-phase via bucket_offsets max mode); no single-partition
    pass over the corpus; final agg partial on event_type."""
    plan = plan_of(spark, "events_lateness_profile")
    assert "windowspecdefinition(bkt#" in plan, plan
    assert "partial" in plan.lower(), plan
    assert "Python" not in plan, plan


def test_neyman_allocation_bounded_frames(spark):
    """Neyman allocation: one partial-agg corpus shuffle to the
    per-type frame; the weight-total join is a broadcast over that
    bounded frame; no window, no Python."""
    plan = plan_of(spark, "sample_neyman_allocation")
    assert "partial" in plan.lower(), plan
    assert "windowspecdefinition" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "Python" not in plan, plan


def test_markov_removal_one_corpus_pass(spark):
    """Markov removal effect: the data-side work is one lead() pass
    (window per user) + bounded aggregations; the absorbing-chain
    iteration is driver-side model math, so the returned frame is a
    4-row local relation."""
    plan = plan_of(spark, "events_markov_removal")
    assert "Scan ExistingRDD" in plan or "LocalTableScan" in plan, plan


def test_fano_bounded_frames(spark):
    """Fano factor: one partial-agg corpus shuffle to the (type, hour)
    frame, then a bounded per-type scalar; no window, no Python."""
    plan = plan_of(spark, "events_fano_burstiness")
    assert "partial" in plan.lower(), plan
    assert "windowspecdefinition" not in plan, plan
    assert "Python" not in plan, plan


def test_novelty_inverted_index_shape(spark):
    """N-gram novelty: shingles explode map-side, first-occurrence MIN
    partial-aggregates on the shingle key, one equi-join back — never
    doc-to-doc; no Python."""
    plan = plan_of(spark, "text_ngram_novelty")
    assert "Generate explode" in plan or "Generate" in plan, plan
    assert "partial" in plan.lower(), plan
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "Python" not in plan, plan


def test_holt_recursive_native_over_day_grid(spark):
    """Holt smoothing: Spark executes the WITH RECURSIVE natively
    (union-loop), the recursion joins only the bounded day grid, and
    no Python appears anywhere.  The catalog build returns the pinned
    result (scoped row-limit raise, round 6), so assert on the
    underlying SQL's own plan."""
    from flinkapps_spark.plans.timeseries_queries import _HOLT_SQL
    from flinkapps_spark.sources.batch import load_table

    load_table(spark, SF_ORACLE, "events") \
        .createOrReplaceTempView("holt_cte_plan_v")
    df = spark.sql(_HOLT_SQL.format(table="holt_cte_plan_v"))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Loop" in plan or "Recursion" in plan, plan
    assert "Python" not in plan, plan


def test_abc_rank_and_cumrev_one_two_phase(spark):
    """ABC classes: rank AND cumulative revenue ride one two-phase
    prefix (windows partitioned by revenue band); no single-partition
    pass over the part dimension; no Python."""
    plan = plan_of(spark, "parts_abc_classification")
    assert "windowspecdefinition(nbkt#" in plan, plan
    assert "partial" in plan.lower(), plan
    assert "Python" not in plan, plan


def test_freshness_bounded_broadcast(spark):
    """Freshness: one partial-agg shuffle to the per-type frame; the
    high-water mark broadcasts over that bounded frame; no window."""
    plan = plan_of(spark, "dq_freshness")
    assert "partial" in plan.lower(), plan
    assert "windowspecdefinition" not in plan, plan
    assert "Python" not in plan, plan


def test_theilsen_hist_escape_parity_and_plan(spark, duck_oracle):
    """The histogram escape (hist_mode=True) must emit exactly the
    window path's answer AND replace the per-type full sort of C(H,2)
    slopes with partial-agg passes: in the final plan the only Sort
    feeds the window over the median-bin SURVIVORS (a Filter on the bin
    predicate sits below it), never the raw pair stream."""
    from flinkapps_spark.plans.timeseries_queries import (
        events_trend_theilsen,
    )
    from tests.conftest import SF_ORACLE
    from tests.oracle_harness import compare

    hist = events_trend_theilsen(spark, SF_ORACLE, hist_mode=True)
    q = REG["events_trend_theilsen"]
    compare(hist, duck_oracle.sql(q.oracle), "events_trend_theilsen[hist]")
    window = sorted(tuple(r) for r in q.build(spark, SF_ORACLE).collect())
    assert sorted(tuple(r) for r in hist.collect()) == window

    plan = hist._jdf.queryExecution().executedPlan().toString()
    # the median-bin predicate (least(FLOOR(...)) = target, driver-
    # coalesced literals) gates the sort — Catalyst pushes it all the
    # way INTO the pair-join condition, so survivors are dropped during
    # the join itself and the Sort never sees the raw C(H,2) stream
    assert "Sort" in plan, plan
    sort_at = plan.index("Sort")
    assert "least(FLOOR" in plan[sort_at:], plan
    assert "CartesianProduct" not in plan, plan


def test_theilsen_auto_switch(spark):
    """hist_mode=None auto-selects: below the span threshold the window
    path runs (single plan, row_number over all pairs); above it the
    histogram path runs (driver-coalesced literals in the plan)."""
    from flinkapps_spark.plans.timeseries_queries import (
        events_trend_theilsen,
    )
    from tests.conftest import SF_ORACLE

    low = events_trend_theilsen(spark, SF_ORACLE, hist_mode=None,
                                span_threshold=10 ** 9)
    lp = low._jdf.queryExecution().executedPlan().toString()
    assert "row_number" in lp and "least(FLOOR" not in lp, lp
    high = events_trend_theilsen(spark, SF_ORACLE, hist_mode=None,
                                 span_threshold=1)
    hp = high._jdf.queryExecution().executedPlan().toString()
    assert "least(FLOOR" in hp, hp
    assert (sorted(tuple(r) for r in low.collect())
            == sorted(tuple(r) for r in high.collect()))


def test_graph_reliable_checkpoint_mode(spark, duck_oracle, tmp_path):
    """Both lineage-cut modes — localCheckpoint (default) and reliable
    checkpoint(checkpoint_dir=) — produce identical, oracle-green
    results; the reliable mode really writes round state to the DFS
    dir (durability is the point: executor loss recovers from files)."""
    import os

    from flinkapps_spark.plans.graph_queries import (
        graph_label_propagation, graph_pagerank,
    )
    from tests.conftest import SF_ORACLE
    from tests.oracle_harness import compare

    ck = str(tmp_path / "ck")
    for name, fn in (("graph_pagerank", graph_pagerank),
                     ("graph_label_propagation", graph_label_propagation)):
        reliable = fn(spark, SF_ORACLE, checkpoint_dir=ck)
        compare(reliable, duck_oracle.sql(REG[name].oracle),
                f"{name}[reliable-ckpt]")
        local = sorted(tuple(r)
                       for r in REG[name].build(spark, SF_ORACLE).collect())
        assert sorted(tuple(r) for r in reliable.collect()) == local
    # round state actually hit the reliable dir
    found = [os.path.join(r, f) for r, _, fs in os.walk(ck) for f in fs]
    assert found, "reliable checkpoint wrote nothing"


def test_bpe_encode_map_only(spark):
    """Encoding with the learned merges is a pure map over the corpus:
    the returned plan has NO join (no vocabulary lookup), NO exchange
    (the per-doc fold replaces explode+groupBy), and NO Python stage —
    the learned rules ride as literal replace ops in codegen."""
    plan = plan_of(spark, "bpe_encode")
    assert "Join" not in plan, plan
    assert plan.count("Exchange") == 0, plan
    assert "Python" not in plan, plan


def test_source_overlap_bounded_join(spark):
    """The cross-source overlap matrix joins on the shingle code after a
    distinct (source, code) collapse — per-code fan-out is bounded by
    C(|sources|,2) — and the size table rides a broadcast; never a
    cartesian."""
    plan = plan_of(spark, "source_overlap_jaccard")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan
    assert "partial_count" in plan or "HashAggregate" in plan, plan


def test_neardup_lsh_banded_equi_join(spark):
    """The LSH pair generator's candidate stage must be an EQUI-join on
    (band, sig) — never a nested loop over the corpus (that would be the
    quadratic shape banding exists to avoid).  The grid path legitimately
    uses one BroadcastNestedLoopJoin for its 3^d delta fan-out; the
    banded path has no such stage, so ANY nested loop in this plan is a
    lost join condition."""
    plan = plan_of(spark, "embedding_neardup_lsh")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert ("SortMergeJoin" in plan or "ShuffledHashJoin" in plan
            or "BroadcastHashJoin" in plan), plan
    assert "band" in plan and "sig" in plan, plan


def test_single_arrow_eval_per_udf_stage(spark):
    """Regression guard for the round-9 double-evaluation class: filter
    inference (InferFiltersFromGenerate / size()>0 guards) rewrote
    non-empty checks in terms of a pandas-UDF expression and pushed them
    below the projection, running the whole Arrow matmul TWICE per plan
    (found on the word-hash, band-signature and IVF cell-assign UDFs;
    all are asNondeterministic now, which blocks the duplicating
    pushdown).  Pin the exact ArrowEvalPython node count of the plans
    that regressed, plus the new IVF-PQ pair."""
    from tests.conftest import SF_SMOKE
    import pyspark.sql.functions as SF
    from flinkapps_spark.operators import dedup as D, similarity as S
    from flinkapps_spark.sources.batch import load_table

    def n_arrow(df) -> int:
        return df._jdf.queryExecution().executedPlan() \
            .toString().count("ArrowEvalPython")

    docs = load_table(spark, SF_SMOKE, "documents")
    # word-hash UDF: shingle table = exactly one Arrow pass
    assert n_arrow(D.doc_shingle_table(docs)) == 1
    emb = load_table(spark, SF_SMOKE, "embeddings")
    # band signatures: one Arrow pass per side
    assert n_arrow(S.band_signature_table(emb, "vec_id", "embedding",
                                          64, 8, 16)) == 1
    centers = S.train_coarse_centroids(emb)
    assigned = emb.withColumn(
        "cell", S._cell_assign_udf(centers)(
            SF.transform("embedding", lambda x: x.cast("double"))))
    assert n_arrow(assigned) == 1
    books = S.train_residual_books(emb, centers)
    enc = S.ivfpq_encode(emb, centers, books)
    assert n_arrow(enc) == 1
    q = emb.filter(SF.col("vec_id") < 5)
    # shortlist = encode (1) + ADC scoring (1); a third node means a
    # duplicated stage
    assert n_arrow(S.ivfpq_adc_shortlist(enc, q, centers, books,
                                         shortlist=16)) == 2
