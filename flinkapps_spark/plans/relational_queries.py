"""Relational extensions beyond the reference surface (SURVEY §2.10 confirms
the reference has NO joins / set ops / sorts / over-windows / rollups):
a complete engine needs them, expressed Spark-first.

Scale notes repeated per query where the plan choice matters at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from flinkapps_spark.operators import joins
from flinkapps_spark.plans.catalog import query
from flinkapps_spark.sources.batch import load_table

# ---------------------------------------------------------------------------
# TPC-H-style joins
# ---------------------------------------------------------------------------


@query(
    "q1_pricing_summary",
    oracle="""
        SELECT l_returnflag, l_linestatus,
               ROUND(SUM(l_quantity), 2) AS sum_qty,
               ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
               ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
               ROUND(AVG(l_quantity), 4) AS avg_qty,
               ROUND(AVG(l_extendedprice), 4) AS avg_price,
               ROUND(AVG(l_discount), 6) AS avg_disc,
               COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
    """,
    category="extension: agg (TPC-H Q1 shape)",
    doc="Pricing summary report: wide multi-aggregate scan-group. Scale: "
        "single pass, map-side partial agg, 6 groups — shuffle carries ~6 "
        "rows/task regardless of input size.",
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
             F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
             F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
             F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
             F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
             F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
             F.round(F.avg("l_discount"), 6).alias("avg_disc"),
             F.count("*").alias("count_order"))
    )


@query(
    "q3_shipping_priority",
    oracle="""
        SELECT l_orderkey,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
               CAST(o_orderdate AS DATE) AS odate
        FROM customer JOIN orders ON c_custkey = o_custkey
                      JOIN lineitem ON l_orderkey = o_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
          AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
        GROUP BY l_orderkey, o_orderdate
        ORDER BY revenue DESC, l_orderkey
        LIMIT 10
    """,
    category="extension: join (TPC-H Q3 shape)",
    doc="Customer-orders-lineitem join + top-10 revenue. Scale: customer is "
        "the small side after the segment filter → broadcast; orders⋈lineitem "
        "shuffles on orderkey; top-k is TakeOrderedAndProject (no full sort). "
        "Deterministic order: rounded revenue + unique orderkey tiebreak.",
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cu = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING")
    od = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15 00:00:00").cast("timestamp"))
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15 00:00:00").cast("timestamp"))
    j = (joins.broadcast_dim_join(od, cu, od.o_custkey == cu.c_custkey)
         .join(li, F.col("l_orderkey") == F.col("o_orderkey")))
    return (
        j.groupBy("l_orderkey", "o_orderdate")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
             .alias("revenue"))
        .select("l_orderkey", "revenue",
                F.col("o_orderdate").cast("date").alias("odate"))
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@query(
    "q5_local_supplier",
    oracle="""
        SELECT n_name,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM customer
          JOIN orders   ON c_custkey = o_custkey
          JOIN lineitem ON l_orderkey = o_orderkey
          JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
          JOIN nation   ON s_nationkey = n_nationkey
          JOIN region   ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY n_name
    """,
    category="extension: join (TPC-H Q5 shape)",
    doc="Six-table local-supplier-volume join. Scale: region/nation/supplier/"
        "customer are broadcast dims; only orders⋈lineitem shuffles. The "
        "c_nationkey=s_nationkey condition rides along the supplier join.",
)
def q5_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    cu = load_table(spark, sf_dir, "customer")
    od = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp")))
    li = load_table(spark, sf_dir, "lineitem")
    su = load_table(spark, sf_dir, "supplier")
    na = load_table(spark, sf_dir, "nation")
    re = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    j = (li.join(F.broadcast(od), F.col("l_orderkey") == F.col("o_orderkey"))
         .join(F.broadcast(cu), F.col("o_custkey") == F.col("c_custkey"))
         .join(F.broadcast(su), (F.col("l_suppkey") == F.col("s_suppkey"))
               & (F.col("c_nationkey") == F.col("s_nationkey")))
         .join(F.broadcast(na), F.col("s_nationkey") == F.col("n_nationkey"))
         .join(F.broadcast(re), F.col("n_regionkey") == F.col("r_regionkey")))
    return j.groupBy("n_name").agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
        .alias("revenue"))


@query(
    "join_broadcast_parts",
    oracle="""
        SELECT p_brand, COUNT(*) AS n_items,
               ROUND(SUM(l_extendedprice), 2) AS total_price
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY p_brand
    """,
    category="extension: broadcast join",
    doc="Fact⋈dim with explicit broadcast: at 1000-executor scale the part "
        "dim ships once per executor; the lineitem scan never shuffles "
        "before aggregation (.explain shows BroadcastHashJoin).",
)
def join_broadcast_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    pt = load_table(spark, sf_dir, "part")
    j = joins.broadcast_dim_join(li, pt, li.l_partkey == pt.p_partkey)
    return j.groupBy("p_brand").agg(
        F.count("*").alias("n_items"),
        F.round(F.sum("l_extendedprice"), 2).alias("total_price"))


@query(
    "join_outer_counts",
    oracle="""
        SELECT c_custkey, c_name, COUNT(o_orderkey) AS n_orders
        FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        GROUP BY c_custkey, c_name
    """,
    category="extension: outer join",
    doc="Left outer join keeping order-less customers (count 0).",
)
def join_outer_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    cu = load_table(spark, sf_dir, "customer")
    od = load_table(spark, sf_dir, "orders")
    return (cu.join(od, cu.c_custkey == od.o_custkey, "left")
            .groupBy("c_custkey", "c_name")
            .agg(F.count("o_orderkey").alias("n_orders")))


@query(
    "join_semi_customers",
    oracle="""
        SELECT c_custkey, c_name FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                      AND o.o_totalprice > 400000.0)
    """,
    category="extension: semi join",
    doc="EXISTS via left_semi: no row multiplication, right columns never "
        "materialize — the scalable EXISTS plan.",
)
def join_semi_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cu = load_table(spark, sf_dir, "customer")
    od = load_table(spark, sf_dir, "orders").filter(
        F.col("o_totalprice") > 400000.0)
    return joins.semi_join(cu, od, cu.c_custkey == od.o_custkey) \
        .select("c_custkey", "c_name")


@query(
    "join_anti_customers",
    oracle="""
        SELECT c_custkey, c_name FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
    category="extension: anti join",
    doc="NOT EXISTS via left_anti.",
)
def join_anti_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cu = load_table(spark, sf_dir, "customer")
    od = load_table(spark, sf_dir, "orders")
    return joins.anti_join(cu, od, cu.c_custkey == od.o_custkey) \
        .select("c_custkey", "c_name")


@query(
    "join_range_bands",
    oracle="""
        SELECT band, COUNT(*) AS n_items,
               ROUND(SUM(l_extendedprice), 2) AS total_price
        FROM lineitem
        JOIN (VALUES (0.0, 20000.0, 'small'), (20000.0, 40000.0, 'mid'),
                     (40000.0, 70000.0, 'large'), (70000.0, 1e9, 'huge'))
             AS bands(lo, hi, band)
          ON l_extendedprice >= lo AND l_extendedprice < hi
        GROUP BY band
    """,
    category="extension: range join",
    doc="Half-open band join, bands broadcast → BroadcastNestedLoopJoin in "
        "codegen; grouping collapses to 4 rows.",
)
def join_range_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    bands = spark.createDataFrame(
        [(0.0, 20000.0, "small"), (20000.0, 40000.0, "mid"),
         (40000.0, 70000.0, "large"), (70000.0, 1e9, "huge")],
        "lo double, hi double, band string")
    j = joins.range_join(li, bands, "l_extendedprice")
    return j.groupBy("band").agg(
        F.count("*").alias("n_items"),
        F.round(F.sum("l_extendedprice"), 2).alias("total_price"))


@query(
    "join_asof_signup",
    oracle="""
        WITH purchases AS (
            SELECT event_id, user_id, ts, value FROM events
            WHERE event_type = 'purchase'
        ), signups AS (
            SELECT user_id, ts, value FROM events WHERE event_type = 'signup'
        )
        SELECT p.event_id, p.user_id, p.ts, p.value,
               s.ts AS signup_ts, s.value AS signup_value
        FROM purchases p
        ASOF LEFT JOIN signups s
          ON p.user_id = s.user_id AND s.ts <= p.ts
    """,
    category="extension: as-of join",
    doc="As-of join (latest signup at or before each purchase, per user): "
        "co-partition by key + pandas merge_asof per group via applyInPandas "
        "— sorted-merge O(n+m) per key, the scalable pattern vs. an O(n·m) "
        "conditional join. Oracle: DuckDB ASOF LEFT JOIN.",
)
def join_asof_signup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase") \
        .select("event_id", "user_id", "ts", "value")
    signups = ev.filter(F.col("event_type") == "signup") \
        .select("user_id", "ts",
                F.col("ts").alias("signup_ts"),
                F.col("value").alias("signup_value"))
    return joins.asof_join(
        purchases, signups, key_cols=["user_id"], ts_col="ts",
        value_cols=["signup_ts", "signup_value"])


# ---------------------------------------------------------------------------
# Set operations / distinct / sort / top-k
# ---------------------------------------------------------------------------


@query(
    "set_ops_users",
    oracle="""
        SELECT user_id, 'both' AS tag FROM (
            SELECT user_id FROM events WHERE event_type = 'purchase'
            INTERSECT
            SELECT user_id FROM events WHERE event_type = 'error')
        UNION ALL
        SELECT user_id, 'only_purchase' AS tag FROM (
            SELECT user_id FROM events WHERE event_type = 'purchase'
            EXCEPT
            SELECT user_id FROM events WHERE event_type = 'error')
    """,
    category="extension: set ops",
    doc="INTERSECT / EXCEPT / UNION ALL (absent from the reference, "
        "SURVEY §2.10).",
)
def set_ops_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    buyers = ev.filter(F.col("event_type") == "purchase").select("user_id")
    errers = ev.filter(F.col("event_type") == "error").select("user_id")
    both = buyers.intersect(errers).withColumn("tag", F.lit("both"))
    only = buyers.subtract(errers).withColumn("tag", F.lit("only_purchase"))
    return both.unionByName(only)


@query(
    "distinct_count",
    oracle="""
        SELECT event_type, COUNT(DISTINCT user_id) AS n_users,
               COUNT(*) AS n_events
        FROM events GROUP BY event_type
    """,
    category="extension: distinct agg",
    doc="COUNT(DISTINCT) — expands to a two-phase partial-distinct plan; at "
        "scale prefer approx_count_distinct (see agg_approx_distinct).",
)
def distinct_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.count("*").alias("n_events"))


@query(
    "agg_approx_distinct",
    oracle=None,  # HLL sketches are engine-specific; driver does rows-only
    category="extension: approximate agg",
    doc="approx_count_distinct (HyperLogLog++): the 100 TB-scale substitute "
        "for exact COUNT(DISTINCT) — no per-key value set, fixed-size sketch, "
        "map-side combinable. No SQL oracle: sketch estimates are "
        "engine-specific (DuckDB's approx_count_distinct uses a different "
        "HLL seed/width).",
)
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id").alias("approx_users"))


@query(
    "topk_per_group",
    oracle="""
        SELECT event_type, event_id, user_id, value
        FROM events
        QUALIFY ROW_NUMBER() OVER (PARTITION BY event_type
                                   ORDER BY value DESC, event_id) <= 3
    """,
    category="extension: over-window rank",
    doc="Top-k per group via row_number over-window (absent from reference). "
        "Scale: single shuffle on the partition key; rank prunes before any "
        "downstream join. Deterministic: unique event_id tiebreak.",
)
def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy(F.desc("value"),
                                                 F.asc("event_id"))
    return (ev.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= 3)
            .select("event_type", "event_id", "user_id", "value"))


@query(
    "window_analytics",
    oracle="""
        SELECT event_id, user_id, value,
               LAG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   AS prev_value,
               ROUND(SUM(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                      ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND CURRENT ROW), 2) AS run_total
        FROM events
    """,
    category="extension: analytic window",
    doc="lag + running sum per user ordered by time (absent from reference).",
)
def window_analytics(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wr = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return ev.select(
        "event_id", "user_id", "value",
        F.lag("value").over(w).alias("prev_value"),
        F.round(F.sum("value").over(wr), 2).alias("run_total"))


@query(
    "rollup_status_priority",
    oracle="""
        SELECT COALESCE(o_orderstatus, 'ALL') AS status,
               COALESCE(o_orderpriority, 'ALL') AS priority,
               GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority) AS grp_id,
               COUNT(*) AS n_orders,
               ROUND(SUM(o_totalprice), 2) AS total
        FROM orders
        GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
    category="extension: rollup / grouping sets",
    doc="ROLLUP with GROUPING ids (absent from reference, SURVEY §2.10). "
        "Spark expands to a grouping-sets Expand + single aggregation pass.",
)
def rollup_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = load_table(spark, sf_dir, "orders")
    return (
        od.rollup("o_orderstatus", "o_orderpriority")
        .agg(F.grouping_id().alias("grp_id"),
             F.count("*").alias("n_orders"),
             F.round(F.sum("o_totalprice"), 2).alias("total"))
        .select(F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
                F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
                F.col("grp_id").cast("long").alias("grp_id"),
                "n_orders", "total")
    )


@query(
    "percentiles_by_type",
    oracle="""
        SELECT event_type,
               ROUND(quantile_cont(value, 0.25), 4) AS p25,
               ROUND(quantile_cont(value, 0.50), 4) AS p50,
               ROUND(quantile_cont(value, 0.75), 4) AS p75
        FROM events GROUP BY event_type
    """,
    category="extension: exact percentiles",
    doc="Exact linear-interpolated percentiles (Spark `percentile` == DuckDB "
        "quantile_cont). At 100 TB use approx_percentile instead (sketch-"
        "based, map-combinable) — exact percentile collects per-group values.",
)
def percentiles_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(F.percentile("value", 0.25), 4).alias("p25"),
        F.round(F.percentile("value", 0.50), 4).alias("p50"),
        F.round(F.percentile("value", 0.75), 4).alias("p75"))


@query(
    "agg_two_phase_salted",
    oracle="""
        SELECT user_id, ROUND(SUM(value), 2) AS total, COUNT(*) AS n
        FROM events GROUP BY user_id
    """,
    category="extension: skew-safe aggregation",
    doc="Salted two-phase aggregation: partial agg on (key, salt) spreads a "
        "hot key over N reducers, final agg merges partials — same result "
        "as the direct groupBy (which the oracle computes). The skew "
        "mitigation pattern for 100 TB hot keys; AQE skew-join handles the "
        "join-side equivalent automatically.",
)
def agg_two_phase_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    salted = ev.withColumn("salt", (F.col("event_id") % 8).cast("int"))
    partial = salted.groupBy("user_id", "salt").agg(
        F.sum("value").alias("psum"), F.count("*").alias("pcnt"))
    return partial.groupBy("user_id").agg(
        F.round(F.sum("psum"), 2).alias("total"),
        F.sum("pcnt").alias("n"))


@query(
    "events_sessionize",
    oracle="""
        WITH marked AS (
            SELECT user_id, ts,
                   CASE WHEN LAG(ts) OVER w IS NULL
                         OR ts - LAG(ts) OVER w > INTERVAL '30 minutes'
                        THEN 1 ELSE 0 END AS new_s
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        ),
        sess AS (
            SELECT user_id, ts,
                   SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS sid
            FROM marked
        )
        SELECT user_id, MIN(ts) AS session_start, COUNT(*) AS n_events
        FROM sess GROUP BY user_id, sid
    """,
    category="extension: session windows",
    doc="Gap-based sessionization (30-min inactivity): Spark session_window "
        "— the session-window operator the reference lacks (SURVEY §2.10 "
        "lists only tumbling). Oracle reconstructs sessions with "
        "lag/cumulative-sum window SQL; session_start == MIN(ts) per "
        "session under identical gap semantics.",
)
def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", "30 minutes"), F.col("user_id"))
        .agg(F.count("*").alias("n_events"))
        .select(F.col("user_id"),
                F.col("session_window.start").alias("session_start"),
                F.col("n_events"))
    )


@query(
    "distinct_pairs",
    oracle="SELECT DISTINCT lang, source FROM documents",
    category="extension: distinct",
    doc="DISTINCT projection (dropDuplicates) — absent from the reference.",
)
def distinct_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("lang", "source").distinct()
