"""Relational extensions beyond the reference surface (SURVEY §2.10 confirms
the reference has NO joins / set ops / sorts / over-windows / rollups):
a complete engine needs them, expressed Spark-first.

Scale notes repeated per query where the plan choice matters at 100 TB.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from flinkapps_spark.operators import joins
from flinkapps_spark.plans.catalog import query
from flinkapps_spark.plans.exact import (exact_avg, exact_sum, exact_sum_over,
                                         sql_avg, sql_sum, sql_sum_over,
                                         sql_units, units_col)
from flinkapps_spark.sources.batch import load_table

# ---------------------------------------------------------------------------
# TPC-H-style joins
# ---------------------------------------------------------------------------


@query(
    "q1_pricing_summary",
    oracle=f"""
        SELECT l_returnflag, l_linestatus,
               {sql_sum('l_quantity', 100)} AS sum_qty,
               {sql_sum('l_extendedprice', 100)} AS sum_base_price,
               {sql_sum('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
               {sql_sum('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge,
               {sql_avg('l_quantity', 100)} AS avg_qty,
               {sql_avg('l_extendedprice', 100)} AS avg_price,
               {sql_avg('l_discount', 100)} AS avg_disc,
               COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
    """,
    category="extension: agg (TPC-H Q1 shape)",
    doc="Pricing summary report: wide multi-aggregate scan-group. Scale: "
        "single pass, map-side partial agg, 6 groups — shuffle carries ~6 "
        "rows/task regardless of input size. Money sums/avgs use the "
        "fixed-point int64 policy (plans/exact.py); sum_charge is defined "
        "as the 4dp-per-term metric.",
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(exact_sum("l_quantity", 100).alias("sum_qty"),
             exact_sum("l_extendedprice", 100).alias("sum_base_price"),
             exact_sum(disc_price).alias("sum_disc_price"),
             exact_sum(disc_price * (1 + F.col("l_tax"))).alias("sum_charge"),
             exact_avg("l_quantity", 100).alias("avg_qty"),
             exact_avg("l_extendedprice", 100).alias("avg_price"),
             exact_avg("l_discount", 100).alias("avg_disc"),
             F.count("*").alias("count_order"))
    )


@query(
    "q3_shipping_priority",
    oracle=f"""
        SELECT l_orderkey,
               {sql_sum('l_extendedprice * (1 - l_discount)')} AS revenue,
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
        .agg(exact_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
             .alias("revenue"))
        .select("l_orderkey", "revenue",
                F.col("o_orderdate").cast("date").alias("odate"))
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@query(
    "q5_local_supplier",
    oracle=f"""
        SELECT n_name,
               {sql_sum('l_extendedprice * (1 - l_discount)')} AS revenue
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
    doc="Six-table local-supplier-volume join, planned the way it must run "
        "at 100 TB: lineitem⋈orders and ⋈customer are fact-scale joins left "
        "to the optimizer (shuffle; AQE may downgrade to broadcast at small "
        "SF — a runtime size decision, not a hardcoded hint), while "
        "supplier/nation/region are true dims pinned to broadcast. The "
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
    j = (li.join(od, F.col("l_orderkey") == F.col("o_orderkey"))
         .join(cu, F.col("o_custkey") == F.col("c_custkey"))
         .join(F.broadcast(su), (F.col("l_suppkey") == F.col("s_suppkey"))
               & (F.col("c_nationkey") == F.col("s_nationkey")))
         .join(F.broadcast(na), F.col("s_nationkey") == F.col("n_nationkey"))
         .join(F.broadcast(re), F.col("n_regionkey") == F.col("r_regionkey")))
    return j.groupBy("n_name").agg(
        exact_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
        .alias("revenue"))


@query(
    "join_broadcast_parts",
    oracle=f"""
        SELECT p_brand, COUNT(*) AS n_items,
               {sql_sum('l_extendedprice', 100)} AS total_price
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
        exact_sum("l_extendedprice", 100).alias("total_price"))


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
    oracle=f"""
        SELECT band, COUNT(*) AS n_items,
               {sql_sum('l_extendedprice', 100)} AS total_price
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
        exact_sum("l_extendedprice", 100).alias("total_price"))


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


@query(
    "join_asof_forward_tol",
    oracle="""
        WITH errors AS (
            SELECT event_id, user_id, ts, value FROM events
            WHERE event_type = 'error'
        ), purchases AS (
            SELECT event_id, user_id, ts, value FROM events
            WHERE event_type = 'purchase'
        )
        SELECT e.event_id, e.user_id, e.ts, e.value,
               p.next_purchase_id, p.next_purchase_ts, p.next_purchase_value
        FROM errors e
        LEFT JOIN LATERAL (
            SELECT event_id AS next_purchase_id, ts AS next_purchase_ts,
                   value AS next_purchase_value
            FROM purchases p
            WHERE p.user_id = e.user_id
              AND p.ts >= e.ts AND p.ts <= e.ts + INTERVAL 1 HOUR
            ORDER BY p.ts, p.event_id LIMIT 1) p ON true
    """,
    category="extension: as-of join (forward + tolerance)",
    doc="Forward as-of join with tolerance: for each error event, the "
        "EARLIEST purchase by the same user within the next hour (the "
        "time-to-next-conversion / recovery-after-error shape). Same "
        "co-partitioned merge_asof engine as join_asof_signup with "
        "direction='forward' and tolerance='1h'; right-side ts ties are "
        "broken by event_id (tie_cols) so the match is the unique row the "
        "oracle's ORDER BY ts, event_id LIMIT 1 picks. Scale: sorted "
        "merge O(n+m) per bucket — the lateral-subquery oracle shape "
        "would be O(n·m) per key if executed naively; the engine never "
        "does that.",
)
def join_asof_forward_tol(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    errors = ev.filter(F.col("event_type") == "error") \
        .select("event_id", "user_id", "ts", "value")
    purchases = ev.filter(F.col("event_type") == "purchase") \
        .select("user_id", "ts",
                F.col("event_id").alias("next_purchase_id"),
                F.col("ts").alias("next_purchase_ts"),
                F.col("value").alias("next_purchase_value"))
    return joins.asof_join(
        errors, purchases, key_cols=["user_id"], ts_col="ts",
        value_cols=["next_purchase_id", "next_purchase_ts",
                    "next_purchase_value"],
        direction="forward", tolerance="1h",
        tie_cols=["next_purchase_id"])


@query(
    "join_asof_skew_split",
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
    category="extension: as-of join (skew-safe time slicing)",
    doc="The join_asof_signup semantics through the TIME-SLICED as-of "
        "path (operators/joins.py asof_join time_slice='6h'): every hash "
        "bucket is sub-split along the time axis and carry-in rows make "
        "each (key, slice) self-contained, so one key holding half the "
        "rows parallelizes over its slices instead of serializing one "
        "straggler task. Identical oracle as the unsplit query — parity "
        "re-proves the slicing is lossless; tests/test_engine_units.py::"
        "test_asof_time_slice_skew asserts the balance property itself.",
)
def join_asof_skew_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase") \
        .select("event_id", "user_id", "ts", "value")
    signups = ev.filter(F.col("event_type") == "signup") \
        .select("user_id", "ts",
                F.col("ts").alias("signup_ts"),
                F.col("value").alias("signup_value"))
    return joins.asof_join(
        purchases, signups, key_cols=["user_id"], ts_col="ts",
        value_cols=["signup_ts", "signup_value"], time_slice="6h")


@query(
    "join_asof_jvm",
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
    category="extension: as-of join (JVM window form)",
    doc="join_asof_signup semantics through asof_join_jvm "
        "(operators/joins.py): union both sides, one window pass per key "
        "carries the latest right row via last(ignorenulls) — one "
        "shuffle + one sort, whole-stage codegen end to end, zero Python "
        "workers. At 100 TB this is the default as-of shape (no Arrow "
        "transfer or pandas CPU); the applyInPandas variant remains for "
        "the giant-single-key case via time_slice. Same oracle as the "
        "merge_asof queries — parity proves the two engines agree.",
)
def join_asof_jvm(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase") \
        .select("event_id", "user_id", "ts", "value")
    signups = ev.filter(F.col("event_type") == "signup") \
        .select("user_id", "ts",
                F.col("ts").alias("signup_ts"),
                F.col("value").alias("signup_value"))
    return joins.asof_join_jvm(
        purchases, signups, key_cols=["user_id"], ts_col="ts",
        value_cols=["signup_ts", "signup_value"])


@query(
    "join_asof_jvm_forward",
    oracle="""
        WITH errors AS (
            SELECT event_id, user_id, ts, value FROM events
            WHERE event_type = 'error'
        ), purchases AS (
            SELECT event_id, user_id, ts, value FROM events
            WHERE event_type = 'purchase'
        )
        SELECT e.event_id, e.user_id, e.ts, e.value,
               p.next_purchase_id, p.next_purchase_ts, p.next_purchase_value
        FROM errors e
        LEFT JOIN LATERAL (
            SELECT event_id AS next_purchase_id, ts AS next_purchase_ts,
                   value AS next_purchase_value
            FROM purchases p
            WHERE p.user_id = e.user_id
              AND p.ts >= e.ts AND p.ts <= e.ts + INTERVAL 1 HOUR
            ORDER BY p.ts, p.event_id LIMIT 1) p ON true
    """,
    category="extension: as-of join (JVM window form, forward + tolerance)",
    doc="join_asof_forward_tol semantics through asof_join_jvm: "
        "first(ignorenulls) over the following window frame picks the "
        "earliest purchase within the next hour; tolerance is a codegen "
        "WHEN over the carried struct's timestamp. Ties break by "
        "event_id in the window order itself.",
)
def join_asof_jvm_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    errors = ev.filter(F.col("event_type") == "error") \
        .select("event_id", "user_id", "ts", "value")
    purchases = ev.filter(F.col("event_type") == "purchase") \
        .select("user_id", "ts",
                F.col("event_id").alias("next_purchase_id"),
                F.col("ts").alias("next_purchase_ts"),
                F.col("value").alias("next_purchase_value"))
    return joins.asof_join_jvm(
        errors, purchases, key_cols=["user_id"], ts_col="ts",
        value_cols=["next_purchase_id", "next_purchase_ts",
                    "next_purchase_value"],
        direction="forward", tolerance="1h",
        tie_cols=["next_purchase_id"])


@query(
    "join_asof_nearest",
    oracle="""
        WITH errors AS (
            SELECT event_id, user_id, ts, value FROM events
            WHERE event_type = 'error'
        ), purchases AS (
            SELECT event_id, user_id, ts, value FROM events
            WHERE event_type = 'purchase'
        )
        SELECT e.event_id, e.user_id, e.ts, e.value,
               p.near_purchase_id, p.near_ts, p.near_value
        FROM errors e
        LEFT JOIN LATERAL (
            SELECT event_id AS near_purchase_id, ts AS near_ts,
                   value AS near_value
            FROM purchases p
            WHERE p.user_id = e.user_id
              AND abs(epoch(p.ts) - epoch(e.ts)) <= 3600
            ORDER BY abs(epoch(p.ts) - epoch(e.ts)), p.ts, p.event_id
            LIMIT 1) p ON true
    """,
    category="extension: as-of join (nearest, bidirectional)",
    doc="Nearest-neighbor as-of: for each error, the purchase by the same "
        "user with the smallest absolute time gap within ±1 hour — "
        "backward preferred on exact gap ties (the oracle's ORDER BY "
        "abs_gap, ts ASC picks the earlier row). Runs on the JVM window "
        "engine with direction='nearest': both a backward and a forward "
        "carry in one shuffle (two in-partition sorts), then a codegen "
        "CASE keeps the smaller gap. Gap arithmetic is the identical "
        "epoch-seconds double on both engines.",
)
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    errors = ev.filter(F.col("event_type") == "error") \
        .select("event_id", "user_id", "ts", "value")
    purchases = ev.filter(F.col("event_type") == "purchase") \
        .select("user_id", "ts",
                F.col("event_id").alias("near_purchase_id"),
                F.col("ts").alias("near_ts"),
                F.col("value").alias("near_value"))
    return joins.asof_join_jvm(
        errors, purchases, key_cols=["user_id"], ts_col="ts",
        value_cols=["near_purchase_id", "near_ts", "near_value"],
        direction="nearest", tolerance="1h",
        tie_cols=["near_purchase_id"])


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
    oracle="""
        SELECT event_type,
               COUNT(DISTINCT user_id) AS n_users_exact,
               true AS within_tol
        FROM events GROUP BY event_type
    """,
    category="extension: approximate agg",
    doc="approx_count_distinct (HyperLogLog++): the 100 TB-scale substitute "
        "for exact COUNT(DISTINCT) — no per-key value set, fixed-size sketch, "
        "map-side combinable. Sketch estimates are engine-specific (DuckDB "
        "seeds/widths differ), so the estimate itself can't be hashed; "
        "instead the query emits the exact count plus a deterministic "
        "self-check boolean (|approx−exact|/exact < 0.15 — generous vs the "
        "default 5% rsd) and the oracle asserts literal true: the driver's "
        "hash then verifies the sketch is in-bounds.",
)
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    exact = F.countDistinct("user_id")
    approx = F.approx_count_distinct("user_id")
    return ev.groupBy("event_type").agg(
        exact.alias("n_users_exact"),
        ((F.abs(approx.cast("double") - exact.cast("double"))
          / exact.cast("double")) < 0.15).alias("within_tol"))


@query(
    "sketch_hll_rollup",
    oracle="""
        SELECT event_type, COUNT(DISTINCT user_id) AS n_exact,
               true AS hll_ok
        FROM events GROUP BY event_type
        UNION ALL
        SELECT 'ALL', COUNT(DISTINCT user_id), true FROM events
    """,
    category="extension: mergeable sketches (HLL union rollup)",
    doc="MERGEABLE distinct-count sketches (Apache DataSketches HLL via "
        "hll_sketch_agg/hll_union_agg): per-type sketches are built once, "
        "then UNIONED into the global cardinality without touching raw "
        "data again — the re-aggregation property that lets a 100 TB "
        "pipeline keep per-segment summaries and roll them up to any "
        "coarser grain for free (exact COUNT DISTINCT cannot merge). "
        "Sketch bytes are engine-specific, so the query emits the exact "
        "count plus a 5%-tolerance self-check boolean per row, 'ALL' row "
        "checked against the union estimate; oracle asserts literal true.",
)
def sketch_hll_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    per = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_exact"),
        F.hll_sketch_agg("user_id").alias("sk"))
    ok = lambda est, exact: (  # noqa: E731
        F.abs(est.cast("double") - exact.cast("double"))
        <= 0.05 * exact.cast("double"))
    per_rows = per.select(
        "event_type", "n_exact",
        ok(F.hll_sketch_estimate("sk"), F.col("n_exact")).alias("hll_ok"))
    glob_exact = ev.agg(F.countDistinct("user_id").alias("n_exact"))
    glob = (per.agg(F.hll_union_agg("sk").alias("sk"))
            .crossJoin(F.broadcast(glob_exact))
            .select(F.lit("ALL").alias("event_type"), "n_exact",
                    ok(F.hll_sketch_estimate("sk"),
                       F.col("n_exact")).alias("hll_ok")))
    return per_rows.unionByName(glob)


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
    oracle=f"""
        SELECT event_id, user_id, value,
               LAG(value) OVER w AS prev_value,
               {sql_sum_over('value', 'w')} AS run_total
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
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
        exact_sum_over("value", wr).alias("run_total"))


@query(
    "rollup_status_priority",
    oracle=f"""
        SELECT COALESCE(o_orderstatus, 'ALL') AS status,
               COALESCE(o_orderpriority, 'ALL') AS priority,
               GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority) AS grp_id,
               COUNT(*) AS n_orders,
               {sql_sum('o_totalprice', 100)} AS total
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
             exact_sum("o_totalprice", 100).alias("total"))
        .select(F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
                F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
                F.col("grp_id").cast("long").alias("grp_id"),
                "n_orders", "total")
    )


# shared op-order for the exact correlation battery: every moment is an
# exact int64 sum cast to double once, and the final expressions apply
# IEEE ops in one fixed order — bit-identical on any IEEE-754 engine, so
# no in-query rounding is needed (same policy as exact_avg).
_CORR_SQL = """
    WITH m AS (
        SELECT event_type,
               CAST(COUNT(*) AS DOUBLE) AS n,
               CAST(SUM(xu) AS DOUBLE) / 100.0 AS sx,
               CAST(SUM(y) AS DOUBLE) AS sy,
               CAST(SUM(xu * xu) AS DOUBLE) / 100.0 / 100.0 AS sxx,
               CAST(SUM(xu * y) AS DOUBLE) / 100.0 AS sxy,
               CAST(SUM(y * y) AS DOUBLE) AS syy
        FROM (
            SELECT event_type,
                   CAST(ROUND(value * 100, 0) AS BIGINT) AS xu,
                   CAST({K_EXPR} AS BIGINT) AS y
            FROM events
        )
        GROUP BY event_type
    )
    SELECT event_type,
           CAST(n AS BIGINT) AS n_events,
           (n * sxy - sx * sy) / sqrt((n * sxx - sx * sx)
                                      * (n * syy - sy * sy)) AS corr_vk,
           (n * sxy - sx * sy) / (n * sxx - sx * sx) AS regr_slope,
           (sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n
               AS regr_intercept
    FROM m
"""


@query(
    "stats_corr_regression",
    oracle=_CORR_SQL.format(K_EXPR="json_extract_string(props, '$.k')"),
    category="extension: correlation / regression aggregates",
    doc="Pearson correlation and least-squares regression of value "
        "against the props.k attribute per event type — the builtin "
        "corr()/regr_slope() family recomputed from EXACT fixed-point "
        "moment sums (Σx, Σx², Σxy as int64 units): the builtins "
        "accumulate doubles in partition order, so their last ulps "
        "differ run-to-run and engine-to-engine, while integer moments "
        "are associative and the closed-form final arithmetic is a "
        "fixed sequence of IEEE ops. Scale: one partial-agg shuffle of "
        "6 numbers per group — the moments are mergeable, so this is "
        "also the incremental/streaming form (update moments, re-derive "
        "corr). int64 headroom: xu ≤ 5.7e4, xu² ≤ 3.3e9/row → overflow "
        "needs >2.8e9 rows PER GROUP; past that raise the units scale "
        "or pre-aggregate per (group, salt).",
)
def stats_corr_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    t = ev.select(
        "event_type",
        F.round(F.col("value") * 100, 0).cast("long").alias("xu"),
        F.get_json_object("props", "$.k").cast("long").alias("y"))
    m = t.groupBy("event_type").agg(
        F.count("*").cast("double").alias("n"),
        (F.sum("xu").cast("double") / 100.0).alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        (F.sum(F.col("xu") * F.col("xu")).cast("double") / 100.0 / 100.0)
        .alias("sxx"),
        (F.sum(F.col("xu") * F.col("y")).cast("double") / 100.0)
        .alias("sxy"),
        F.sum(F.col("y") * F.col("y")).cast("double").alias("syy"))
    cov_n = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    var_x = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    var_y = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    slope = cov_n / var_x
    return m.select(
        "event_type",
        F.col("n").cast("long").alias("n_events"),
        (cov_n / F.sqrt(var_x * var_y)).alias("corr_vk"),
        slope.alias("regr_slope"),
        ((F.col("sy") - slope * F.col("sx")) / F.col("n"))
        .alias("regr_intercept"))


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
    oracle=f"""
        SELECT user_id, {sql_sum('value')} AS total, COUNT(*) AS n
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
    # fixed-point partials: integer partial sums merge associatively, so
    # the salted two-phase total is bit-equal to the oracle's direct sum
    units = units_col(F.col("value"), 10000)
    partial = salted.groupBy("user_id", "salt").agg(
        F.sum(units).alias("psum"), F.count("*").alias("pcnt"))
    return partial.groupBy("user_id").agg(
        (F.sum("psum") / 10000.0).alias("total"),
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


@query(
    "q6_forecast_revenue",
    oracle=f"""
        SELECT {sql_sum('l_extendedprice * l_discount')} AS revenue,
               COUNT(*) AS n_items
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
          AND l_discount BETWEEN 0.03 AND 0.07
          AND l_quantity < 24
    """,
    category="extension: filter-agg (TPC-H Q6 shape)",
    doc="Forecast-revenue-change: pure scan-filter-aggregate. Every "
        "predicate reaches the parquet scan (PushedFilters) — zero shuffle "
        "beyond the single-row final agg.",
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter((F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
                  & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
                  & F.col("l_discount").between(0.03, 0.07)
                  & (F.col("l_quantity") < 24))
        .agg(exact_sum(F.col("l_extendedprice") * F.col("l_discount"))
             .alias("revenue"),
             F.count("*").alias("n_items"))
    )


@query(
    "q12_shipmode_case",
    oracle=f"""
        SELECT o_orderpriority,
               CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_finished,
               CAST(SUM(CASE WHEN o_orderstatus <> 'F' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_other,
               {sql_sum("CASE WHEN o_orderstatus = 'F' THEN o_totalprice ELSE 0 END", 100)}
                   AS finished_value
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
          AND l_linenumber = 1
        GROUP BY o_orderpriority
    """,
    category="extension: conditional agg (TPC-H Q12 shape)",
    doc="CASE-WHEN pivot counts inside aggregation over a fact-fact join "
        "(shuffle on orderkey; AQE coalesces post-filter partitions). "
        "Oracle casts the conditional counts to BIGINT: DuckDB SUM(int) is "
        "HUGEINT, which the pandas fetch path degrades to float64 and "
        "breaks the driver's value hash (round-1 red row).",
)
def q12_shipmode_case(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_linenumber") == 1))
    fin = F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)
    return (
        od.join(li, od.o_orderkey == li.l_orderkey)
        .groupBy("o_orderpriority")
        .agg(F.sum(fin).alias("n_finished"),
             F.sum(1 - fin).alias("n_other"),
             exact_sum(F.when(F.col("o_orderstatus") == "F",
                              F.col("o_totalprice")).otherwise(0.0), 100)
             .alias("finished_value"))
    )


@query(
    "q14_promo_ratio",
    oracle=f"""
        SELECT 100.0 * {sql_sum("CASE WHEN p_type LIKE 'PROMO%' THEN l_extendedprice * (1 - l_discount) ELSE 0 END")}
                     / {sql_sum('l_extendedprice * (1 - l_discount)')}
                   AS promo_revenue_pct
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1997-07-01 00:00:00'
    """,
    category="extension: ratio agg (TPC-H Q14 shape)",
    doc="Promo-revenue percentage: LIKE-prefix conditional over a broadcast "
        "dim join, single global ratio.",
)
def q14_promo_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-07-01 00:00:00").cast("timestamp")))
    pt = load_table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type").like("PROMO%"), rev).otherwise(0.0)
    return (
        li.join(F.broadcast(pt), li.l_partkey == pt.p_partkey)
        .agg((F.lit(100.0) * exact_sum(promo) / exact_sum(rev))
             .alias("promo_revenue_pct"))
    )


@query(
    "q18_large_orders",
    oracle=f"""
        SELECT o_orderkey, total_qty
        FROM (SELECT l_orderkey AS o_orderkey,
                     {sql_sum('l_quantity', 100)} AS total_qty
              FROM lineitem GROUP BY l_orderkey)
        WHERE total_qty > 150
    """,
    category="extension: having (TPC-H Q18 shape)",
    doc="Large-volume orders: GROUP BY + HAVING-style post-aggregation "
        "filter (the filter runs on aggregated rows — tiny relation).",
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy(F.col("l_orderkey").alias("o_orderkey"))
        .agg(exact_sum("l_quantity", 100).alias("total_qty"))
        .filter(F.col("total_qty") > 150)
        .select("o_orderkey", "total_qty")
    )


@query(
    "json_extract_props",
    oracle="""
        SELECT event_id,
               CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_value,
               CASE WHEN CAST(json_extract_string(props, '$.k') AS INTEGER) >= 50
                    THEN 'high' ELSE 'low' END AS k_band
        FROM events
        WHERE event_type = 'purchase'
    """,
    category="extension: json functions",
    doc="JSON field extraction from the events.props payload column "
        "(get_json_object — JSON functions are absent from the reference, "
        "SURVEY §2.10). Stays in codegen; no UDF.",
)
def json_extract_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        ev.filter(F.col("event_type") == "purchase")
        .select("event_id", k.alias("k_value"),
                F.when(k >= 50, "high").otherwise("low").alias("k_band"))
    )


@query(
    "array_functions_embeddings",
    oracle="""
        SELECT vec_id,
               len(embedding) AS dim,
               ROUND(CAST(list_max(embedding) AS DOUBLE), 4) AS vmax,
               ROUND(CAST(list_min(embedding) AS DOUBLE), 4) AS vmin,
               ROUND(list_sum(list_transform(embedding,
                     x -> CAST(x AS DOUBLE))), 4) AS vsum,
               ROUND(list_sum(list_transform(embedding[1:8],
                     x -> CAST(x AS DOUBLE))), 4) AS head_sum
        FROM embeddings
    """,
    category="extension: array functions",
    doc="Array column manipulation (size/min/max/fold/slice) over the "
        "embedding vectors — array/map functions are absent from the "
        "reference (SURVEY §2.10).",
)
def array_functions_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    as_d = F.transform("embedding", lambda x: x.cast("double"))
    fold = lambda arr: F.aggregate(arr, F.lit(0.0), lambda a, x: a + x)
    return emb.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.round(F.array_max("embedding").cast("double"), 4).alias("vmax"),
        F.round(F.array_min("embedding").cast("double"), 4).alias("vmin"),
        F.round(fold(as_d), 4).alias("vsum"),
        F.round(fold(F.slice(as_d, 1, 8)), 4).alias("head_sum"))


@query(
    "scalar_math_battery",
    oracle="""
        SELECT o_orderkey,
               ROUND(pow(o_totalprice / 100000.0, 2), 6) AS sq,
               ROUND(sqrt(o_totalprice), 6) AS rt,
               ROUND(ln(o_totalprice), 6) AS lg,
               ROUND(exp(o_totalprice / 600000.0), 6) AS ex,
               abs(o_custkey - 750) AS ab,
               CAST(ceil(o_totalprice / 1000.0) AS BIGINT) AS ce,
               CAST(floor(o_totalprice / 1000.0) AS BIGINT) AS fl,
               CAST(trunc(o_totalprice) AS INTEGER) % 97 AS md
        FROM orders
    """,
    category="extension: scalar math",
    doc="Math scalar battery (pow/sqrt/ln/exp/abs/ceil/floor/mod) — all "
        "codegen builtins, identical IEEE semantics across engines.",
)
def scalar_math_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = load_table(spark, sf_dir, "orders")
    p = F.col("o_totalprice")
    return od.select(
        "o_orderkey",
        F.round(F.pow(p / 100000.0, 2), 6).alias("sq"),
        F.round(F.sqrt(p), 6).alias("rt"),
        F.round(F.log(p), 6).alias("lg"),
        F.round(F.exp(p / 600000.0), 6).alias("ex"),
        F.abs(F.col("o_custkey") - 750).alias("ab"),
        F.ceil(p / 1000.0).alias("ce"),
        F.floor(p / 1000.0).alias("fl"),
        (p.cast("int") % 97).alias("md"))


@query(
    "scalar_string_battery",
    oracle="""
        SELECT c_custkey,
               lpad(CAST(c_custkey AS VARCHAR), 8, '0') AS padded,
               instr(c_name, '0') AS zero_pos,
               substr(c_name, 1, 8) AS name_head,
               translate(c_mktsegment, 'AEIOU', 'aeiou') AS translated,
               reverse(c_mktsegment) AS revd,
               repeat(SUBSTR(c_mktsegment, 1, 1), 3) AS tripled,
               concat(c_name, '#', c_mktsegment) AS joined
        FROM customer
    """,
    category="extension: scalar strings",
    doc="String scalar battery (lpad/instr/substr/translate/reverse/repeat/"
        "concat) beyond the reference's F5 set.",
)
def scalar_string_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    cu = load_table(spark, sf_dir, "customer")
    return cu.select(
        "c_custkey",
        F.lpad(F.col("c_custkey").cast("string"), 8, "0").alias("padded"),
        F.instr("c_name", "0").alias("zero_pos"),
        F.substring("c_name", 1, 8).alias("name_head"),
        F.translate("c_mktsegment", "AEIOU", "aeiou").alias("translated"),
        F.reverse("c_mktsegment").alias("revd"),
        F.repeat(F.substring("c_mktsegment", 1, 1), 3).alias("tripled"),
        F.concat("c_name", F.lit("#"), "c_mktsegment").alias("joined"))


@query(
    "scalar_date_arith",
    oracle="""
        SELECT o_orderkey,
               CAST(o_orderdate AS DATE) + 30 AS plus30,
               CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
               date_diff('day', o_orderdate,
                         TIMESTAMP '2000-01-01 00:00:00') AS days_to_y2k,
               CAST(o_orderdate + INTERVAL 1 MONTH AS DATE) AS next_month,
               dayofweek(o_orderdate) + 1 AS dow,
               CAST(strftime(o_orderdate, '%Y%m') AS INTEGER) AS yyyymm
        FROM orders
    """,
    category="extension: date arithmetic",
    doc="Date arithmetic battery: date_add, trunc-to-month, datediff, "
        "add_months (end-of-month clamping matches), day-of-week "
        "(DuckDB 0=Sun → +1 aligns with Spark 1=Sun), yyyymm formatting.",
)
def scalar_date_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return od.select(
        "o_orderkey",
        F.date_add(d.cast("date"), 30).alias("plus30"),
        F.date_trunc("month", d).cast("date").alias("month_start"),
        F.datediff(F.lit("2000-01-01").cast("date"), d.cast("date"))
        .alias("days_to_y2k"),
        F.add_months(d.cast("date"), 1).alias("next_month"),
        F.dayofweek(d).alias("dow"),
        F.date_format(d, "yyyyMM").cast("int").alias("yyyymm"))


@query(
    "null_semantics",
    oracle="""
        SELECT event_id,
               NULLIF(event_type, 'error') AS type_or_null,
               COALESCE(NULLIF(event_type, 'error'), 'was_error') AS coalesced,
               (NULLIF(event_type, 'error') IS NOT DISTINCT FROM NULL)
                   AS null_safe_eq_null,
               LEAST(value, 100.0) AS capped,
               GREATEST(value, 100.0) AS floored
        FROM events
    """,
    category="extension: null handling",
    doc="NULL semantics battery: NULLIF/COALESCE/null-safe equality "
        "(Spark <=> ≡ SQL IS NOT DISTINCT FROM)/LEAST/GREATEST.",
)
def null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    t_or_null = F.nullif("event_type", F.lit("error"))
    return ev.select(
        "event_id",
        t_or_null.alias("type_or_null"),
        F.coalesce(t_or_null, F.lit("was_error")).alias("coalesced"),
        t_or_null.eqNullSafe(F.lit(None).cast("string"))
        .alias("null_safe_eq_null"),
        F.least("value", F.lit(100.0)).alias("capped"),
        F.greatest("value", F.lit(100.0)).alias("floored"))


@query(
    "pivot_status_priority",
    oracle=f"""
        SELECT o_orderpriority,
               {sql_sum("CASE WHEN o_orderstatus = 'F' THEN o_totalprice ELSE 0 END", 100)} AS F,
               {sql_sum("CASE WHEN o_orderstatus = 'O' THEN o_totalprice ELSE 0 END", 100)} AS O,
               {sql_sum("CASE WHEN o_orderstatus = 'P' THEN o_totalprice ELSE 0 END", 100)} AS P
        FROM orders GROUP BY o_orderpriority
    """,
    category="extension: pivot",
    doc="Pivot (status columns per priority row): Spark groupBy().pivot() "
        "with explicit value list — explicit values avoid the extra "
        "distinct-scan pass at 100 TB.",
)
def pivot_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = load_table(spark, sf_dir, "orders")
    # fixed-point before the pivot: pivot-cell sums stay integer (exact),
    # divided once on the way out; absent cells coalesce to 0 units like
    # the oracle's CASE ... ELSE 0
    units = units_col(F.col("o_totalprice"), 100)
    piv = (od.withColumn("units", units)
           .groupBy("o_orderpriority")
           .pivot("o_orderstatus", ["F", "O", "P"])
           .sum("units"))
    return piv.select(
        "o_orderpriority",
        *[(F.coalesce(F.col(s), F.lit(0)) / 100.0).alias(s)
          for s in ("F", "O", "P")])


@query(
    "rolling_time_window",
    oracle=f"""
        SELECT event_id, user_id,
               COUNT(*) OVER w AS n_last_hour,
               {sql_sum_over('value', 'w')} AS sum_last_hour
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts
                     RANGE BETWEEN INTERVAL '1 hour' PRECEDING
                           AND CURRENT ROW)
    """,
    category="extension: time-range rolling window",
    doc="RANGE-interval rolling window (events per user in the trailing "
        "hour) — the time-based OVER-window the reference lacks entirely.",
)
def rolling_time_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    # microsecond range key: cast-to-seconds would truncate and disagree
    # with the oracle's µs-precise INTERVAL boundary at sub-second offsets.
    # The parquet fixtures may read as TIMESTAMP_NTZ (no isAdjustedToUTC);
    # unix_micros requires TIMESTAMP, and with the session tz pinned to UTC
    # the cast is value-preserving.
    w = Window.partitionBy("user_id") \
        .orderBy(F.unix_micros(F.col("ts").cast("timestamp"))) \
        .rangeBetween(-3_600_000_000, Window.currentRow)
    return ev.select(
        "event_id", "user_id",
        F.count("*").over(w).alias("n_last_hour"),
        exact_sum_over("value", w).alias("sum_last_hour"))


@query(
    "agg_sliding_window",
    oracle=f"""
        WITH w AS (
            SELECT event_type, value, ts,
                   unnest([time_bucket(INTERVAL '5 minutes', ts),
                           time_bucket(INTERVAL '5 minutes', ts)
                               - INTERVAL '5 minutes']) AS window_start
            FROM events)
        SELECT window_start, event_type, COUNT(*) AS cnt,
               {sql_sum('value')} AS total
        FROM w
        WHERE ts >= window_start
          AND ts < window_start + INTERVAL '10 minutes'
        GROUP BY window_start, event_type
    """,
    category="extension: sliding window",
    doc="Sliding event-time window (10-min length, 5-min slide): each event "
        "lands in 2 windows. The reference has only tumbling (SURVEY §2.10). "
        "Oracle expands each row into its candidate buckets and filters by "
        "window membership — identical window assignment to Spark's.",
)
def agg_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "10 minutes", "5 minutes"),
                   F.col("event_type"))
        .agg(F.count("*").alias("cnt"),
             exact_sum("value").alias("total"))
        .select(F.col("window.start").alias("window_start"),
                "event_type", "cnt", "total")
    )


@query(
    "regex_battery",
    oracle="""
        SELECT c_custkey,
               regexp_extract(c_name, '([0-9]+)', 1) AS digits,
               regexp_matches(c_name, '^Customer') AS is_customer,
               regexp_replace(c_name, '[0-9]', '#', 'g') AS masked
        FROM customer
    """,
    category="extension: regex functions",
    doc="Regex battery: group extraction, boolean match, replace-all — "
        "simple character-class patterns where Java and RE2 semantics "
        "coincide (fancy lookarounds would not port; kept out of the "
        "engine's portable surface).",
)
def regex_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    cu = load_table(spark, sf_dir, "customer")
    return cu.select(
        "c_custkey",
        F.regexp_extract("c_name", "([0-9]+)", 1).alias("digits"),
        F.col("c_name").rlike("^Customer").alias("is_customer"),
        F.regexp_replace("c_name", "[0-9]", "#").alias("masked"))


@query(
    "set_ops_multiset",
    oracle="""
        SELECT user_id, 'intersect_all' AS tag FROM (
            SELECT user_id FROM events WHERE event_type = 'purchase'
            INTERSECT ALL
            SELECT user_id FROM events WHERE event_type = 'click')
        UNION ALL
        SELECT user_id, 'except_all' AS tag FROM (
            SELECT user_id FROM events WHERE event_type = 'purchase'
            EXCEPT ALL
            SELECT user_id FROM events WHERE event_type = 'click')
    """,
    category="extension: multiset set ops",
    doc="INTERSECT ALL / EXCEPT ALL (bag semantics — occurrence counts "
        "matter, unlike set_ops_users' DISTINCT forms).",
)
def set_ops_multiset(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    buyers = ev.filter(F.col("event_type") == "purchase").select("user_id")
    clickers = ev.filter(F.col("event_type") == "click").select("user_id")
    ia = buyers.intersectAll(clickers).withColumn("tag", F.lit("intersect_all"))
    ea = buyers.exceptAll(clickers).withColumn("tag", F.lit("except_all"))
    return ia.unionByName(ea)


@query(
    "agg_approx_percentile",
    oracle="""
        SELECT event_type,
               ROUND(quantile_cont(value, 0.50), 4) AS p50_exact,
               ROUND(quantile_cont(value, 0.95), 4) AS p95_exact,
               true AS p50_ok, true AS p95_ok
        FROM events GROUP BY event_type
    """,
    category="extension: approximate percentiles",
    doc="approx_percentile (KLL-style sketch): the 100 TB substitute for "
        "exact percentiles — fixed-size, map-combinable state vs. "
        "collect-all-values. The sketch estimate is engine-specific, so the "
        "query emits the exact percentiles plus self-check booleans "
        "(|approx−exact| ≤ 5%·|exact|+1e-6; accuracy=10000 keeps rank "
        "error ≤ n/10000, far inside that) and the oracle asserts literal "
        "true — the hash verifies the estimates deterministically.",
)
def agg_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    p50e = F.percentile("value", 0.5)
    p95e = F.percentile("value", 0.95)
    p50a = F.approx_percentile("value", 0.5, 10000)
    p95a = F.approx_percentile("value", 0.95, 10000)
    ok = lambda a, e: (F.abs(a - e) <= 0.05 * F.abs(e) + 1e-6)  # noqa: E731
    return ev.groupBy("event_type").agg(
        F.round(p50e, 4).alias("p50_exact"),
        F.round(p95e, 4).alias("p95_exact"),
        ok(p50a, p50e).alias("p50_ok"),
        ok(p95a, p95e).alias("p95_ok"))


def _format_roundtrip_agg(spark: SparkSession, sf_dir: str, fmt: str) -> DataFrame:
    from flinkapps_spark.sources.batch import load_table_as
    od = load_table_as(spark, sf_dir, "orders", fmt)
    return od.groupBy("o_orderstatus").agg(
        F.count("*").alias("n_orders"),
        exact_sum("o_totalprice", 100).alias("total"),
        F.min(F.col("o_orderdate").cast("date")).alias("first_date"))


_FMT_ORACLE = f"""
    SELECT o_orderstatus, COUNT(*) AS n_orders,
           {sql_sum('o_totalprice', 100)} AS total,
           MIN(CAST(o_orderdate AS DATE)) AS first_date
    FROM orders GROUP BY o_orderstatus
"""


@query(
    "source_csv_reader",
    oracle=_FMT_ORACLE,
    category="extension: source format (CSV)",
    doc="Native CSV reader path: orders converted to CSV once (cached) and "
        "read back with explicit schema + timestamp format; aggregate must "
        "match the parquet-backed oracle — proves the text round-trip "
        "loses nothing (header handling, timestamp parsing).",
)
def source_csv_reader(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _format_roundtrip_agg(spark, sf_dir, "csv")


@query(
    "source_json_reader",
    oracle=_FMT_ORACLE,
    category="extension: source format (JSON)",
    doc="Native JSON-lines reader path (schema-on-read with explicit "
        "schema), same aggregate-vs-parquet-oracle check.",
)
def source_json_reader(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _format_roundtrip_agg(spark, sf_dir, "json")


@query(
    "source_orc_reader",
    oracle=_FMT_ORACLE,
    category="extension: source format (ORC)",
    doc="ORC reader path (vectorized columnar, same pushdown machinery as "
        "parquet), same aggregate-vs-parquet-oracle check. Avro needs the "
        "external spark-avro package — not bundled; documented absence.",
)
def source_orc_reader(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _format_roundtrip_agg(spark, sf_dir, "orc")


@query(
    "source_xml_reader",
    oracle=_FMT_ORACLE,
    category="extension: source format (XML)",
    doc="Built-in XML reader path (Spark 4 absorbed spark-xml into core): "
        "orders written once as <row> elements and read back with explicit "
        "schema + rowTag, same aggregate-vs-parquet-oracle check as the "
        "CSV/JSON/ORC readers.",
)
def source_xml_reader(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _format_roundtrip_agg(spark, sf_dir, "xml")


@query(
    "source_python_datasource",
    oracle=f"""
        WITH g AS (SELECT unnest(range(0, 5000)) AS eid),
        v AS (SELECT eid,
                     ((eid * 48271 + 11) % 2147483647 % 1000000)
                        / 1000000.0 AS value
              FROM g)
        SELECT CAST(eid % 10 AS BIGINT) AS bucket, COUNT(*) AS n,
               {sql_sum('value')} AS total_value
        FROM v GROUP BY eid % 10
    """,
    category="extension: source (Python DataSource API)",
    doc="Custom source through the Spark 4 Python DataSource API "
        "(sources/pydatasource.py): a registered format string with "
        "driver-side partition planning and executor-side row generation "
        "— the S5 in-memory-collection surface upgraded to a first-class "
        "pluggable source. Rows are a deterministic MINSTD LCG of the row "
        "id, so the DuckDB oracle regenerates the identical dataset from "
        "the closed form and the aggregate must match exactly.",
)
def source_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flinkapps_spark.sources.pydatasource import register
    register(spark)
    df = (spark.read.format("synthetic_events")
          .option("rows", 5000).option("partitions", 8).load())
    return (df.groupBy(F.col("bucket").cast("long").alias("bucket"))
            .agg(F.count("*").alias("n"),
                 exact_sum("value").alias("total_value")))


@query(
    "source_schema_evolution",
    oracle=f"""
        WITH both_batches AS (
            SELECT o_orderkey, o_totalprice, NULL AS o_orderstatus
            FROM orders WHERE o_orderkey % 2 = 0
            UNION ALL
            SELECT o_orderkey, o_totalprice, o_orderstatus
            FROM orders WHERE o_orderkey % 2 = 1
        )
        SELECT COALESCE(o_orderstatus, '?') AS status,
               COUNT(*) AS n,
               {sql_sum('o_totalprice', 100)} AS total
        FROM both_batches GROUP BY COALESCE(o_orderstatus, '?')
    """,
    category="extension: source (parquet schema evolution)",
    doc="Schema-on-read evolution: two parquet batches written with "
        "DIFFERENT schemas (an early batch lacking o_orderstatus, a later "
        "batch carrying it) read as one dataset via mergeSchema — the "
        "added column is null for old files, exactly how a long-lived "
        "ingest directory behaves as its producer evolves. The oracle "
        "reconstructs the same union from the base table. Scale: schema "
        "merging unions footer schemas at planning time; data files are "
        "not rewritten or re-read.",
)
def source_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    od = load_table(spark, sf_dir, "orders")
    key = os.path.abspath(sf_dir).strip("/").replace("/", "_")
    path = os.path.join(tempfile.gettempdir(), f"flinkapps_evo_{key}")
    if not os.path.exists(os.path.join(path, "batch2", "_SUCCESS")):
        od.filter(F.col("o_orderkey") % 2 == 0) \
            .select("o_orderkey", "o_totalprice") \
            .write.mode("overwrite").parquet(os.path.join(path, "batch1"))
        od.filter(F.col("o_orderkey") % 2 == 1) \
            .select("o_orderkey", "o_totalprice", "o_orderstatus") \
            .write.mode("overwrite").parquet(os.path.join(path, "batch2"))
    merged = (spark.read.option("mergeSchema", "true")
              .parquet(os.path.join(path, "batch1"),
                       os.path.join(path, "batch2")))
    return (merged.groupBy(F.coalesce("o_orderstatus", F.lit("?"))
                           .alias("status"))
            .agg(F.count("*").alias("n"),
                 exact_sum("o_totalprice", 100).alias("total")))


def _register_base_views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    for n in names:
        load_table(spark, sf_dir, n).createOrReplaceTempView(n)


@query(
    "subquery_correlated_max",
    oracle="""
        SELECT c_custkey, c_name, c_nationkey, c_acctbal
        FROM customer c
        WHERE c_acctbal = (SELECT MAX(c2.c_acctbal) FROM customer c2
                           WHERE c2.c_nationkey = c.c_nationkey)
    """,
    category="extension: correlated scalar subquery (TPC-H Q2 shape)",
    doc="Per-group argmax via correlated scalar subquery — Catalyst "
        "decorrelates it into an aggregate + join (no per-row re-execution; "
        "check: the plan contains one extra Aggregate, not a loop).",
)
def subquery_correlated_max(spark: SparkSession, sf_dir: str) -> DataFrame:
    _register_base_views(spark, sf_dir, "customer")
    return spark.sql("""
        SELECT c_custkey, c_name, c_nationkey, c_acctbal
        FROM customer c
        WHERE c_acctbal = (SELECT MAX(c2.c_acctbal) FROM customer c2
                           WHERE c2.c_nationkey = c.c_nationkey)
    """)


_HAVING_FRACTION_SQL = f"""
    SELECT s_nationkey, {sql_sum('s_acctbal', 100)} AS nation_value
    FROM supplier
    GROUP BY s_nationkey
    HAVING {sql_sum('s_acctbal', 100)}
           > (SELECT {sql_sum('s_acctbal', 100)} / 20.0 FROM supplier)
"""


@query(
    "subquery_having_fraction",
    oracle=_HAVING_FRACTION_SQL,
    category="extension: scalar subquery in HAVING (TPC-H Q11 shape)",
    doc="Group filter against a fraction of a global aggregate — the "
        "uncorrelated scalar subquery computes once and broadcasts as a "
        "literal into the HAVING predicate. The fixed-point sum SQL is "
        "engine-portable, so the identical string runs on Spark and DuckDB "
        "(deterministic HAVING boundary on both).",
)
def subquery_having_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    _register_base_views(spark, sf_dir, "supplier")
    return spark.sql(_HAVING_FRACTION_SQL)


_TOP_REVENUE_SQL = f"""
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               {sql_sum('l_extendedprice * (1 - l_discount)')}
                   AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
        GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
"""


@query(
    "subquery_top_revenue_view",
    oracle=_TOP_REVENUE_SQL,
    category="extension: view + max-over-agg (TPC-H Q15 shape)",
    doc="Top supplier by quarterly revenue: CTE/view reused twice (once "
        "aggregated to its max) — the scalar subquery pins the argmax "
        "without a window sort. Fixed-point revenue makes the MAX "
        "comparison deterministic; the identical SQL runs on both engines.",
)
def subquery_top_revenue_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    _register_base_views(spark, sf_dir, "supplier", "lineitem")
    return spark.sql(_TOP_REVENUE_SQL)


@query(
    "subquery_exists_combo",
    oracle="""
        SELECT o_orderkey, o_orderpriority
        FROM orders o
        WHERE EXISTS (SELECT 1 FROM lineitem l
                      WHERE l.l_orderkey = o.o_orderkey
                        AND l.l_returnflag = 'R')
          AND NOT EXISTS (SELECT 1 FROM lineitem l2
                          WHERE l2.l_orderkey = o.o_orderkey
                            AND l2.l_quantity > 45)
    """,
    category="extension: EXISTS + NOT EXISTS combo (TPC-H Q21 shape)",
    doc="Conjunction of correlated EXISTS and NOT EXISTS — planned as a "
        "left-semi then left-anti join chain on the same fact.",
)
def subquery_exists_combo(spark: SparkSession, sf_dir: str) -> DataFrame:
    _register_base_views(spark, sf_dir, "orders", "lineitem")
    return spark.sql("""
        SELECT o_orderkey, o_orderpriority
        FROM orders o
        WHERE EXISTS (SELECT 1 FROM lineitem l
                      WHERE l.l_orderkey = o.o_orderkey
                        AND l.l_returnflag = 'R')
          AND NOT EXISTS (SELECT 1 FROM lineitem l2
                          WHERE l2.l_orderkey = o.o_orderkey
                            AND l2.l_quantity > 45)
    """)


@query(
    "subquery_in_list",
    oracle="""
        SELECT p_partkey, p_brand
        FROM part
        WHERE p_partkey IN (SELECT l_partkey FROM lineitem
                            WHERE l_quantity >= 49)
    """,
    category="extension: IN subquery",
    doc="IN (subquery) — SQL-level semi join (vs the DataFrame left_semi "
        "API covered separately).",
)
def subquery_in_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    _register_base_views(spark, sf_dir, "part", "lineitem")
    return spark.sql("""
        SELECT p_partkey, p_brand
        FROM part
        WHERE p_partkey IN (SELECT l_partkey FROM lineitem
                            WHERE l_quantity >= 49)
    """)


@query(
    "events_gap_fill",
    oracle="""
        WITH bounds AS (
            SELECT time_bucket(INTERVAL 1 HOUR, MIN(ts)) AS lo,
                   time_bucket(INTERVAL 1 HOUR, MAX(ts)) AS hi
            FROM events
        ),
        spine AS (
            SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS bucket
            FROM bounds
        ),
        types AS (SELECT DISTINCT event_type FROM events),
        grid AS (SELECT bucket, event_type FROM spine CROSS JOIN types),
        counts AS (
            SELECT time_bucket(INTERVAL 1 HOUR, ts) AS bucket, event_type,
                   COUNT(*) AS cnt
            FROM events GROUP BY 1, 2
        )
        SELECT g.bucket, g.event_type, COALESCE(c.cnt, 0) AS cnt
        FROM grid g LEFT JOIN counts c
          ON g.bucket = c.bucket AND g.event_type = c.event_type
    """,
    category="extension: time-series gap fill",
    doc="Dense hourly rollup with zero-filled gaps (the hypertable/"
        "time_bucket_gapfill pattern): generate the full bucket spine with "
        "sequence()+explode, cross it with the observed key set, left-join "
        "the sparse aggregate, coalesce 0. Scale: the spine is "
        "(range/step)×|keys| rows — independent of event volume; events "
        "aggregate to bucket cardinality BEFORE the join, and the grid "
        "side is broadcast only while its estimated size fits under "
        "spark.sql.autoBroadcastJoinThreshold (VERDICT r3 #3) — a "
        "decade-hourly × high-cardinality key grid falls back to a "
        "shuffle join instead of OOMing executors; either way raw "
        "events are never re-shuffled for the fill.",
)
def events_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    bucket = F.date_trunc("hour", F.col("ts"))
    counts = (ev.groupBy(bucket.alias("bucket"), F.col("event_type"))
              .agg(F.count("*").alias("cnt")))
    # one tiny driver action sizes the grid: hours × |types| cells
    b = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
        F.countDistinct("event_type").alias("ntypes")).first()
    spine = spark.range(1).select(F.explode(F.sequence(
        F.lit(b["lo"]), F.lit(b["hi"]),
        F.expr("INTERVAL 1 HOUR"))).alias("bucket"))
    types = ev.select("event_type").distinct()
    grid = spine.crossJoin(types)
    n_hours = int((b["hi"] - b["lo"]).total_seconds() // 3600) + 1
    est_bytes = n_hours * b["ntypes"] * _GAPFILL_CELL_BYTES
    if est_bytes <= _broadcast_threshold_bytes(spark):
        grid = F.broadcast(grid)
    return (grid
            .join(counts, ["bucket", "event_type"], "left_outer")
            .select("bucket", "event_type",
                    F.coalesce(F.col("cnt"), F.lit(0)).alias("cnt")))


_GAPFILL_CELL_BYTES = 64  # timestamp + short string + row overhead


def _broadcast_threshold_bytes(spark: SparkSession) -> int:
    """spark.sql.autoBroadcastJoinThreshold as bytes (-1 → 0: broadcast
    disabled). Accepts plain ints and the b/k/m/g suffixed forms Spark
    itself accepts."""
    raw = str(spark.conf.get(
        "spark.sql.autoBroadcastJoinThreshold", "10485760")).strip().lower()
    mult = 1
    for suf, m in (("kb", 1 << 10), ("mb", 1 << 20), ("gb", 1 << 30),
                   ("k", 1 << 10), ("m", 1 << 20), ("g", 1 << 30),
                   ("b", 1)):
        if raw.endswith(suf):
            raw, mult = raw[:-len(suf)], m
            break
    val = int(raw) * mult
    return max(val, 0)


@query(
    "unpivot_measures",
    oracle="""
        SELECT l_orderkey, l_linenumber, measure, val
        FROM (
            UNPIVOT (SELECT l_orderkey, l_linenumber, l_quantity,
                            l_extendedprice, l_discount, l_tax
                     FROM lineitem WHERE l_orderkey % 100 = 0)
            ON l_quantity, l_extendedprice, l_discount, l_tax
            INTO NAME measure VALUE val
        )
    """,
    category="extension: unpivot / melt",
    doc="Wide-to-long unpivot of the four lineitem measures (the melt "
        "operation feature-store exports need). Spark's unpivot is a "
        "zero-shuffle Expand (rows×4 map-side, no exchange); the id filter "
        "keeps the fixture result compact. Inverse of pivot_status_priority.",
)
def unpivot_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_orderkey") % 100 == 0)
    return li.unpivot(
        ["l_orderkey", "l_linenumber"],
        ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        "measure", "val")


@query(
    "window_battery",
    oracle="""
        SELECT event_id,
               LEAD(value) OVER w AS next_value,
               FIRST_VALUE(event_id) OVER w AS first_event,
               LAST_VALUE(event_id) OVER (PARTITION BY user_id
                   ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING
                   AND UNBOUNDED FOLLOWING) AS last_event,
               DENSE_RANK() OVER (PARTITION BY user_id
                   ORDER BY event_type) AS type_rank,
               NTILE(4) OVER w AS quartile,
               PERCENT_RANK() OVER w AS pct_rank,
               CUME_DIST() OVER w AS cume
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    category="extension: window function battery",
    doc="The remaining OVER-window functions in one pass: lead, first/last "
        "value (explicit unbounded frame for last_value — the default "
        "frame ends at CURRENT ROW), dense_rank, ntile, percent_rank, "
        "cume_dist. The six same-spec functions share one Window operator; "
        "the different-order dense_rank adds a second Sort but REUSES the "
        "user_id Exchange (verified: 1 Exchange, 2 Sorts, 2 Windows — "
        "partitioning survives across specs, only the order re-sorts). "
        "Deterministic: (ts, event_id) is a unique order key. percent/"
        "cume are (rank-1)/(n-1)-style integer-derived divisions — "
        "bit-identical on both engines unrounded (rounding them would "
        "REINTRODUCE the cross-engine half-even divergence).",
)
def window_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    w_type = Window.partitionBy("user_id").orderBy("event_type")
    return ev.select(
        "event_id",
        F.lead("value").over(w).alias("next_value"),
        F.first("event_id").over(w).alias("first_event"),
        F.last("event_id").over(w_full).alias("last_event"),
        F.dense_rank().over(w_type).alias("type_rank"),
        F.ntile(4).over(w).alias("quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"))


@query(
    "struct_map_battery",
    oracle="""
        SELECT event_id,
               struct_pack(etype := event_type, v := value).etype AS s_type,
               map_extract(map([event_type], [value]), event_type)[1]
                   AS m_value,
               cardinality(map([event_type, 'x'], [value, 0.0])) AS m_size,
               array_to_string(map_keys(map([event_type, 'x'],
                                            [value, 0.0])), ',') AS m_keys
        FROM events
        WHERE event_id % 50 = 0
    """,
    category="extension: struct/map functions",
    doc="Struct construction + field access and map construction / lookup "
        "/ cardinality / key listing — the nested-type surface (reference "
        "exercises none, SURVEY §1.2). Outputs are projected back to flat "
        "scalars so the oracle compares values, not engine-specific "
        "nested-type renderings. All codegen'd expressions; nested types "
        "at 100 TB cost only what the parquet reader materializes.",
)
def struct_map_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") % 50 == 0)
    m = F.create_map(F.col("event_type"), F.col("value"))
    m2 = F.create_map(F.col("event_type"), F.col("value"),
                      F.lit("x"), F.lit(0.0))
    return ev.select(
        "event_id",
        F.struct(F.col("event_type").alias("etype"),
                 F.col("value").alias("v")).getField("etype").alias("s_type"),
        F.element_at(m, F.col("event_type")).alias("m_value"),
        F.size(m2).alias("m_size"),
        F.array_join(F.map_keys(m2), ",").alias("m_keys"))


@query(
    "join_salted_skew",
    oracle=f"""
        SELECT c_mktsegment,
               COUNT(*) AS n_events,
               {sql_sum('value')} AS total_value
        FROM events JOIN customer ON user_id = c_custkey
        GROUP BY c_mktsegment
    """,
    category="extension: skew-salted join",
    doc="Hot-key-safe join: the fact side gets a deterministic salt "
        "(event_id % 8), the dimension side is replicated once per salt "
        "value with explode(sequence(0,7)), and the join key becomes "
        "(key, salt) — a single hot key's rows spread across 8 tasks "
        "instead of one straggler. Result provably equals the unsalted "
        "join (the oracle IS the plain join). At 100 TB this is the "
        "manual fallback when AQE skew-split can't apply (e.g. the "
        "skewed side feeds an aggregation pinned to the same "
        "partitioning); salt count tunes task granularity, dim "
        "replication cost = |dim|x8 rows broadcast.",
)
def join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    n_salt = 8
    ev = load_table(spark, sf_dir, "events").withColumn(
        "salt", (F.col("event_id") % n_salt).cast("int"))
    cu = (load_table(spark, sf_dir, "customer")
          .select("c_custkey", "c_mktsegment")
          .withColumn("salt", F.explode(
              F.sequence(F.lit(0), F.lit(n_salt - 1)).cast("array<int>"))))
    j = ev.join(F.broadcast(cu),
                (ev.user_id == cu.c_custkey) & (ev.salt == cu.salt))
    units = units_col(F.col("value"), 10000)
    return (j.groupBy("c_mktsegment")
            .agg(F.count("*").alias("n_events"),
                 (F.sum(units) / 10000.0).alias("total_value")))


@query(
    "agg_minby_maxby",
    oracle="""
        SELECT c_mktsegment,
               max_by(c_custkey, c_acctbal ORDER BY c_acctbal, c_custkey)
                   AS richest_cust,
               min_by(c_custkey, c_acctbal ORDER BY c_acctbal, c_custkey)
                   AS poorest_cust,
               MAX(c_acctbal) AS max_bal,
               MIN(c_acctbal) AS min_bal
        FROM customer
        GROUP BY c_mktsegment
    """,
    category="extension: argmin/argmax aggregates",
    doc="max_by/min_by (argmax/argmin) per segment — the SQL:2023 "
        "aggregates that replace the self-join-on-max anti-pattern with "
        "one two-phase hash agg pass. Ties on c_acctbal are broken by "
        "the unique c_custkey via a (value, key) struct ordering on the "
        "Spark side, mirroring DuckDB's ORDER BY tiebreak, so the result "
        "is deterministic even with duplicate balances.",
)
def agg_minby_maxby(spark: SparkSession, sf_dir: str) -> DataFrame:
    cu = load_table(spark, sf_dir, "customer")
    # (value, key) struct: lexicographic max/min == value-then-key order
    vk = F.struct(F.col("c_acctbal").alias("v"), F.col("c_custkey").alias("k"))
    return (cu.groupBy("c_mktsegment")
            .agg(F.max(vk).getField("k").alias("richest_cust"),
                 F.min(vk).getField("k").alias("poorest_cust"),
                 F.max("c_acctbal").alias("max_bal"),
                 F.min("c_acctbal").alias("min_bal")))


@query(
    "grouping_sets_explicit",
    oracle="""
        SELECT COALESCE(o_orderstatus, 'ALL') AS status,
               COALESCE(o_orderpriority, 'ALL') AS priority,
               COUNT(*) AS n_orders
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
    category="extension: explicit grouping sets",
    doc="Arbitrary (non-hierarchical) grouping sets — per-status, "
        "per-priority, and grand total in ONE scan via the Expand "
        "operator, where rollup/cube cover only the hierarchical/full "
        "lattices. Expressed through Spark SQL (the DataFrame API "
        "exposes only rollup/cube; groupingSets is SQL-first).",
)
def grouping_sets_explicit(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = load_table(spark, sf_dir, "orders")
    od.createOrReplaceTempView("orders_gs")
    return spark.sql("""
        SELECT COALESCE(o_orderstatus, 'ALL') AS status,
               COALESCE(o_orderpriority, 'ALL') AS priority,
               COUNT(*) AS n_orders
        FROM orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """)


@query(
    "json_roundtrip",
    oracle="""
        SELECT event_id,
               json_extract_string(j, '$.t') AS t_back,
               CAST(json_extract(j, '$.v') AS DOUBLE) AS v_back
        FROM (
            SELECT event_id,
                   to_json(struct_pack(t := event_type, v := value)) AS j
            FROM events
            WHERE event_id % 20 = 0
        )
    """,
    category="extension: JSON serialize/parse roundtrip",
    doc="Struct → JSON string → typed fields: the wire-format round-trip "
        "for JSON sinks/sources (complements json_extract_props, which "
        "only parses). Spark: to_json(struct) + get_json_object; both "
        "codegen'd. DuckDB json_extract returns quoted JSON strings — "
        "normalized identically on both sides by trimming quotes "
        "(Spark's get_json_object unquotes scalars).",
)
def json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") % 20 == 0)
    j = F.to_json(F.struct(F.col("event_type").alias("t"),
                           F.col("value").alias("v")))
    return ev.select(
        "event_id",
        F.get_json_object(j, "$.t").alias("t_back"),
        F.get_json_object(j, "$.v").cast("double").alias("v_back"))


@query(
    "agg_collect_sorted_sets",
    oracle="""
        SELECT user_id,
               list_sort(list(DISTINCT event_type)) AS types_seen,
               len(list(DISTINCT event_type)) AS n_types
        FROM events
        GROUP BY user_id
    """,
    category="extension: array collection agg",
    doc="Per-key sorted distinct collection (the feature-list / "
        "label-set assembly aggregate): collect_set + sort_array. "
        "Sorting makes the collected array deterministic — bare "
        "collect_set order is partition-dependent and would never "
        "hash-match across engines. Scale: per-key state = distinct "
        "values (bounded by the event-type vocabulary), partial "
        "aggregation merges sets map-side.",
)
def agg_collect_sorted_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (ev.groupBy("user_id")
            .agg(F.sort_array(F.collect_set("event_type")).alias("types_seen"),
                 F.size(F.collect_set("event_type")).alias("n_types")))


@query(
    "json_variant_extract",
    oracle="""
        SELECT event_id,
               CAST(json_extract(props, '$.k') AS INT) AS k,
               CAST(json_extract(props, '$.k') AS INT) % 10 AS k_mod
        FROM events
        WHERE event_id % 25 = 0
    """,
    category="extension: VARIANT semi-structured type",
    doc="Spark 4 VARIANT path for semi-structured data: parse_json once "
        "into the binary variant encoding, then typed variant_get "
        "extractions — the modern engine answer to schema-on-read JSON "
        "(the variant decode is ~an order faster than repeated "
        "get_json_object string re-parses when many fields are "
        "extracted). Oracle extracts the same typed values from the raw "
        "JSON text.",
)
def json_variant_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") % 25 == 0)
    v = F.parse_json(F.col("props"))
    k = F.variant_get(v, "$.k", "int")
    return ev.select("event_id", k.alias("k"), (k % 10).alias("k_mod"))


@query(
    "scalar_bitwise_battery",
    oracle="""
        SELECT event_id,
               event_id & 255 AS lo_byte,
               xor(event_id, user_id) AS x,
               (event_id & 1023) << 2 AS shl,
               event_id >> 3 AS shr,
               CAST(bit_count(event_id) AS INT) AS pop
        FROM events WHERE event_id % 40 = 0
    """,
    category="extension: bitwise functions",
    doc="Bitwise operator battery (AND/XOR/shifts/popcount) — the "
        "primitives bitmap indexes, bloom filters, feature hashing and "
        "the SimHash/LSH operators build on, verified value-for-value "
        "against DuckDB (whose ^ is exponentiation — the oracle uses "
        "xor()). All codegen, no UDF.",
)
def scalar_bitwise_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_id") % 40 == 0)
    return ev.select(
        "event_id",
        (F.col("event_id").bitwiseAND(F.lit(255))).alias("lo_byte"),
        (F.col("event_id").bitwiseXOR(F.col("user_id"))).alias("x"),
        F.shiftleft(F.col("event_id").bitwiseAND(F.lit(1023)), 2)
        .alias("shl"),
        F.shiftright("event_id", 3).alias("shr"),
        F.bit_count("event_id").alias("pop"))


@query(
    "orders_monthly_growth",
    oracle=f"""
        WITH m AS (
            SELECT date_trunc('month', CAST(o_orderdate AS DATE)) AS month,
                   CAST(SUM({sql_units('o_totalprice', 100)}) AS BIGINT)
                       AS units,
                   COUNT(*) AS n_orders
            FROM orders GROUP BY date_trunc('month', CAST(o_orderdate AS DATE)))
        SELECT CAST(month AS DATE) AS month,
               units / CAST(100 AS DOUBLE) AS revenue,
               n_orders,
               CAST(units - lag(units) OVER (ORDER BY month) AS DOUBLE)
                   / lag(units) OVER (ORDER BY month) AS mom_growth
        FROM m
    """,
    category="extension: time-series trend (MoM growth)",
    doc="Month-over-month revenue growth: monthly fixed-point totals, "
        "then lag() and one exact int→double ratio per row — the KPI "
        "trend line every revenue dashboard draws. The global ordered "
        "window runs over MONTH-cardinality pre-aggregated rows (tiny "
        "forever); all order-sensitive arithmetic happens on int64 "
        "units, so engines cannot diverge. First month's growth is "
        "NULL by lag semantics on both engines.",
)
def orders_monthly_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = load_table(spark, sf_dir, "orders")
    m = (od.groupBy(F.date_trunc("month", F.col("o_orderdate").cast("date"))
                    .alias("month"))
         .agg(F.sum(units_col("o_totalprice", 100)).alias("units"),
              F.count("*").alias("n_orders")))
    w = Window.orderBy("month")
    prev = F.lag("units").over(w)
    return m.select(
        F.col("month").cast("date").alias("month"),
        (F.col("units") / F.lit(100).cast("double")).alias("revenue"),
        "n_orders",
        ((F.col("units") - prev).cast("double") / prev).alias("mom_growth"))


@query(
    "scalar_url_parse",
    oracle="""
        WITH u AS (
            SELECT event_id,
                   'https://' || event_type || '.example.com/u/'
                       || CAST(user_id AS VARCHAR) || '/page?k='
                       || CAST(event_id % 7 AS VARCHAR) AS url
            FROM events WHERE event_id % 50 = 0)
        SELECT event_id,
               regexp_extract(url, '^[a-z]+://([^/]+)', 1) AS host,
               regexp_extract(url, '^[a-z]+://[^/]+(/[^?]*)', 1) AS path,
               regexp_extract(url, 'k=([0-9]+)', 1) AS k_param
        FROM u
    """,
    category="extension: URL parsing functions",
    doc="URL decomposition with parse_url (HOST / PATH / QUERY-param "
        "extraction — the per-domain grouping primitive web-crawl "
        "curation keys on; the domain-mix report builds on this). URLs "
        "are constructed deterministically from event fields since the "
        "fixtures carry none; DuckDB lacks parse_url so the oracle "
        "mirrors with anchored regexes. All codegen, no UDF.",
)
def scalar_url_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_id") % 50 == 0)
    url = F.concat(F.lit("https://"), F.col("event_type"),
                   F.lit(".example.com/u/"),
                   F.col("user_id").cast("string"), F.lit("/page?k="),
                   (F.col("event_id") % 7).cast("string"))
    u = ev.select("event_id", url.alias("url"))
    return u.select(
        "event_id",
        F.parse_url("url", F.lit("HOST")).alias("host"),
        F.parse_url("url", F.lit("PATH")).alias("path"),
        F.parse_url("url", F.lit("QUERY"), F.lit("k")).alias("k_param"))


@query(
    "sketch_topk_heavyhitters",
    oracle="""
        SELECT CAST(10 AS BIGINT) AS n_items,
               true AS counts_exact_ok, true AS boundary_ok
    """,
    category="extension: heavy hitters (approx_top_k sketch)",
    doc="Heavy-hitter detection via the approx_top_k sketch (fixed-size "
        "tracked-item state, map-side mergeable — the 100 TB answer to "
        "'top URLs/users right now' that an exact groupBy+sort answers "
        "with a full shuffle). The self-check is TIE-PROOF: every "
        "reported (item, count) must equal the exact count, and the "
        "smallest reported count must be ≥ the exact 10th-largest count "
        "— together these certify a valid top-10 under ties without "
        "depending on which tied item the sketch surfaced. Oracle "
        "asserts the literals. The item budget is set explicitly "
        "(100k ≫ the fixture's key cardinality — 15k users at sf1, "
        "which silently exceeds the 10k DEFAULT and broke exactness): "
        "on a uniform key distribution a heavy-hitter sketch is only "
        "exact while tracked ≥ distinct, so the audit must size the "
        "budget against the data; real heavy-hitter workloads get "
        "head-exactness from skew itself with far smaller budgets.",
)
def sketch_topk_heavyhitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    appr = (ev.agg(F.expr("approx_top_k(user_id, 10, 100000)").alias("tk"))
            .select(F.explode("tk").alias("e"))
            .select(F.col("e.item").alias("user_id"),
                    F.col("e.count").alias("ac")))
    exact = ev.groupBy("user_id").agg(F.count("*").alias("xc"))
    wk = Window.orderBy(F.desc("xc"), F.asc("user_id"))
    kth = (exact.withColumn("rk", F.row_number().over(wk))
           .filter(F.col("rk") <= 10)
           .agg(F.min("xc").alias("kth_count")))
    j = appr.join(exact, "user_id").crossJoin(F.broadcast(kth))
    return j.agg(
        F.count("*").alias("n_items"),
        (F.count(F.when(F.col("ac") == F.col("xc"), 1))
         == F.count("*")).alias("counts_exact_ok"),
        (F.min("ac") >= F.min("kth_count")).alias("boundary_ok"))


@query(
    "orders_pareto_share",
    oracle=f"""
        WITH cu AS (
            SELECT o_custkey,
                   CAST(SUM({sql_units('o_totalprice', 100)}) AS BIGINT)
                       AS units
            FROM orders GROUP BY o_custkey),
        r AS (
            SELECT o_custkey, units,
                   ROW_NUMBER() OVER (ORDER BY units DESC, o_custkey)
                       AS rk,
                   SUM(units) OVER (ORDER BY units DESC, o_custkey
                                    ROWS UNBOUNDED PRECEDING) AS cum_units,
                   SUM(units) OVER () AS total_units
            FROM cu)
        SELECT rk, o_custkey,
               units / CAST(100 AS DOUBLE) AS revenue,
               CAST(cum_units AS DOUBLE) / total_units AS cum_share
        FROM r WHERE rk <= 100
    """,
    category="extension: concentration curve (Pareto)",
    doc="Revenue concentration (Pareto/80-20 curve): customers ranked by "
        "exact fixed-point revenue with a running cumulative share — the "
        "top-100 rows of the curve. Ranks and cumulative sums run on "
        "int64 units so partition order cannot perturb the shares "
        "(cum/total is one exact int→double division per row). The "
        "global ordered window is one task over CUSTOMER-cardinality "
        "pre-aggregated rows — fine at any fact-table scale; if the KEY "
        "cardinality itself outgrew a task, bucket by revenue range and "
        "prefix-sum bucket totals (the classic distributed scan).",
)
def orders_pareto_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = load_table(spark, sf_dir, "orders")
    cu = od.groupBy("o_custkey").agg(
        F.sum(units_col("o_totalprice", 100)).alias("units"))
    w = Window.orderBy(F.desc("units"), F.asc("o_custkey"))
    r = cu.select(
        "o_custkey", "units",
        F.row_number().over(w).alias("rk"),
        F.sum("units").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("cum_units"),
        F.sum("units").over(
            Window.partitionBy().orderBy()
            .rowsBetween(Window.unboundedPreceding,
                         Window.unboundedFollowing)).alias("total_units"))
    return (r.filter(F.col("rk") <= 100)
            .select("rk", "o_custkey",
                    (F.col("units") / F.lit(100).cast("double"))
                    .alias("revenue"),
                    (F.col("cum_units").cast("double")
                     / F.col("total_units")).alias("cum_share")))


@query(
    "dq_rule_violations",
    oracle="""
        SELECT 'totalprice_positive' AS rule,
               COUNT(CASE WHEN NOT (o_totalprice > 0) THEN 1 END)
                   AS n_violations,
               COUNT(*) AS n_rows
        FROM orders
        UNION ALL
        SELECT 'orderdate_not_null',
               COUNT(CASE WHEN o_orderdate IS NULL THEN 1 END), COUNT(*)
        FROM orders
        UNION ALL
        SELECT 'status_in_domain',
               COUNT(CASE WHEN o_orderstatus NOT IN ('O', 'F', 'P')
                          THEN 1 END), COUNT(*)
        FROM orders
        UNION ALL
        SELECT 'custkey_referential',
               COUNT(CASE WHEN c_custkey IS NULL THEN 1 END), COUNT(*)
        FROM orders LEFT JOIN customer ON o_custkey = c_custkey
    """,
    category="extension: data quality (expectation rules)",
    doc="Declarative data-quality expectations (the Deequ/Great-"
        "Expectations shape): positivity, non-null, domain membership, "
        "and referential integrity, each as a conditional count over ONE "
        "scan per rule family — the first three rules share a single "
        "aggregation pass (no per-rule scans), and the referential rule "
        "is a broadcast-left-join null count. At 100 TB this is the "
        "audit a pipeline runs before promoting a partition; conditional "
        "counts are partial-aggregated map-side.",
)
def dq_rule_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = load_table(spark, sf_dir, "orders")
    cu = load_table(spark, sf_dir, "customer")
    viol = lambda cond: F.count(F.when(cond, 1)).alias("n_violations")  # noqa: E731
    base = od.agg(
        viol(~(F.col("o_totalprice") > 0)),
        F.count("*").alias("n_rows"),
        F.count(F.when(F.col("o_orderdate").isNull(), 1)).alias("v_date"),
        F.count(F.when(~F.col("o_orderstatus").isin("O", "F", "P"), 1))
        .alias("v_status"))
    r1 = base.select(F.lit("totalprice_positive").alias("rule"),
                     "n_violations", "n_rows")
    r2 = base.select(F.lit("orderdate_not_null").alias("rule"),
                     F.col("v_date").alias("n_violations"), "n_rows")
    r3 = base.select(F.lit("status_in_domain").alias("rule"),
                     F.col("v_status").alias("n_violations"), "n_rows")
    r4 = (od.join(F.broadcast(cu), od.o_custkey == cu.c_custkey, "left")
          .agg(F.count(F.when(F.col("c_custkey").isNull(), 1))
               .alias("n_violations"), F.count("*").alias("n_rows"))
          .select(F.lit("custkey_referential").alias("rule"),
                  "n_violations", "n_rows"))
    return r1.unionByName(r2).unionByName(r3).unionByName(r4)


@query(
    "events_markov_transitions",
    oracle="""
        WITH s AS (
            SELECT user_id, event_type,
                   lead(event_type) OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id) AS next_type
            FROM events
        )
        SELECT event_type AS from_type, next_type AS to_type,
               COUNT(*) AS n,
               COUNT(*) / CAST(SUM(COUNT(*)) OVER (PARTITION BY event_type)
                               AS DOUBLE) AS p
        FROM s WHERE next_type IS NOT NULL
        GROUP BY event_type, next_type
    """,
    category="extension: sequence analytics (transition matrix)",
    doc="First-order Markov transition matrix over each user's event "
        "sequence: lead() pairs every event with its successor (total "
        "order ts, event_id), one aggregation counts (from, to) edges, "
        "and a window normalizes rows into transition probabilities — "
        "the behavioral-model summary product analytics builds session "
        "flows from. Scale: one sort-within-user shuffle + one "
        "~|types|² aggregation; p is an int/int → double division, "
        "bit-identical across engines.",
)
def events_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    s = ev.withColumn("next_type", F.lead("event_type").over(w)) \
        .filter(F.col("next_type").isNotNull())
    counts = (s.groupBy(F.col("event_type").alias("from_type"),
                        F.col("next_type").alias("to_type"))
              .agg(F.count("*").alias("n")))
    wt = Window.partitionBy("from_type")
    return counts.select(
        "from_type", "to_type", "n",
        (F.col("n") / F.sum("n").over(wt).cast("double")).alias("p"))


@query(
    "events_funnel",
    oracle="""
        WITH s AS (
            SELECT user_id, MIN(ts) AS signup_ts
            FROM events WHERE event_type = 'signup' GROUP BY user_id
        ),
        p AS (SELECT user_id, ts FROM events WHERE event_type = 'purchase')
        SELECT s.user_id, s.signup_ts,
               MIN(p.ts) AS first_purchase_ts,
               COUNT(p.ts) AS purchases_after
        FROM s LEFT JOIN p
          ON p.user_id = s.user_id AND p.ts >= s.signup_ts
        GROUP BY s.user_id, s.signup_ts
    """,
    category="extension: funnel / sequence analytics",
    doc="Signup→purchase funnel: per user, the first signup and the "
        "purchases at-or-after it (CEP-lite ordered-sequence matching, "
        "which the reference's ecosystem delegates to FlinkCEP — SURVEY "
        "§2.10 notes the reference itself has none). Expressed as an "
        "aggregate + conditional self-join, so Catalyst plans it as two "
        "hash aggs and one shuffle join on user_id — no per-user "
        "iteration. COUNT(col) null-skip keeps never-converted users "
        "with purchases_after = 0.",
)
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    s = (ev.filter(F.col("event_type") == "signup")
         .groupBy("user_id").agg(F.min("ts").alias("signup_ts")))
    p = (ev.filter(F.col("event_type") == "purchase")
         .select(F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts")))
    j = s.join(p, (F.col("p_user") == F.col("user_id"))
               & (F.col("p_ts") >= F.col("signup_ts")), "left_outer")
    return (j.groupBy("user_id", "signup_ts")
            .agg(F.min("p_ts").alias("first_purchase_ts"),
                 F.count("p_ts").alias("purchases_after")))


@query(
    "events_cohort_retention",
    oracle="""
        WITH firsts AS (
            SELECT user_id,
                   make_timestamp(((CAST(epoch(MIN(ts)) AS BIGINT) // 604800)
                                   * 604800) * 1000000) AS cohort
            FROM events GROUP BY user_id
        ),
        activity AS (
            SELECT DISTINCT user_id,
                   make_timestamp(((CAST(epoch(ts) AS BIGINT) // 604800)
                                   * 604800) * 1000000) AS week
            FROM events
        )
        SELECT f.cohort,
               (CAST(epoch(a.week) AS BIGINT)
                - CAST(epoch(f.cohort) AS BIGINT)) // 604800 AS week_offset,
               COUNT(DISTINCT a.user_id) AS active_users
        FROM firsts f JOIN activity a ON f.user_id = a.user_id
        GROUP BY f.cohort, week_offset
    """,
    category="extension: cohort retention",
    doc="Weekly cohort retention matrix: users bucketed by first-seen "
        "week, counted in each later week they were active — the "
        "product-analytics staple. Weeks are epoch-aligned 7-day buckets "
        "via integer epoch division on BOTH engines (DuckDB's time_bucket "
        "uses a Monday origin — a silent off-by-alignment trap). Scale: the distinct (user, week) "
        "activity table is the only heavy aggregate; the cohort join is "
        "user-keyed and the final matrix is |cohorts| x |weeks| rows.",
)
def events_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    week = F.timestamp_seconds(
        (F.unix_timestamp("ts") / (7 * 86400)).cast("long") * (7 * 86400))
    firsts = (ev.groupBy("user_id").agg(F.min("ts").alias("first_ts"))
              .select("user_id", F.timestamp_seconds(
                  (F.unix_timestamp("first_ts") / (7 * 86400)).cast("long")
                  * (7 * 86400)).alias("cohort")))
    activity = ev.select("user_id", week.alias("week")).distinct()
    j = firsts.join(activity, "user_id")
    offset = ((F.unix_timestamp("week") - F.unix_timestamp("cohort"))
              / (7 * 86400)).cast("long")
    return (j.groupBy("cohort", offset.alias("week_offset"))
            .agg(F.countDistinct("user_id").alias("active_users")))


@query(
    "window_locf_fill",
    oracle="""
        SELECT event_id, user_id,
               CASE WHEN event_type = 'error' THEN NULL ELSE value END
                   AS raw_value,
               last_value(CASE WHEN event_type = 'error' THEN NULL
                               ELSE value END IGNORE NULLS)
                   OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS filled_value
        FROM events
    """,
    category="extension: LOCF gap fill (ignore-nulls window)",
    doc="Last-observation-carried-forward: error readings are nulled "
        "(constructed gaps — the fixture has no nulls) and each gap is "
        "filled with the user's most recent valid value via "
        "last(IGNORE NULLS) over an ordered running frame — the sensor/"
        "telemetry forward-fill that complements events_gap_fill's "
        "zero-fill. One shuffle + sort per user; leading gaps before any "
        "valid value stay NULL on both engines.",
)
def window_locf_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    raw = F.when(F.col("event_type") == "error", F.lit(None)) \
        .otherwise(F.col("value"))
    w = (Window.partitionBy("user_id").orderBy("ts", "event_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return ev.select(
        "event_id", "user_id", raw.alias("raw_value"),
        F.last(raw, ignorenulls=True).over(w).alias("filled_value"))


@query(
    "events_scd2_history",
    oracle="""
        WITH ordered AS (
            SELECT user_id, ts, event_id, event_type,
                   CASE WHEN LAG(event_type) OVER w IS NULL
                         OR event_type <> LAG(event_type) OVER w
                        THEN 1 ELSE 0 END AS chg
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        seg AS (
            SELECT user_id, ts, event_type,
                   SUM(chg) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id
                                  ROWS UNBOUNDED PRECEDING) AS sid
            FROM ordered
        ),
        spans AS (
            SELECT user_id, sid, event_type,
                   MIN(ts) AS valid_from, COUNT(*) AS n_events
            FROM seg GROUP BY user_id, sid, event_type
        )
        SELECT user_id, event_type, valid_from,
               LEAD(valid_from) OVER (PARTITION BY user_id
                                      ORDER BY sid) AS valid_to,
               n_events
        FROM spans
    """,
    category="extension: SCD2 dimension history",
    doc="Type-2 slowly-changing-dimension build: collapse each user's "
        "event stream into validity intervals — one row per RUN of equal "
        "attribute values, [valid_from, valid_to) half-open, NULL "
        "valid_to on the current row — the warehouse dimension-history "
        "pattern (Kimball SCD type 2), derived with gaps-and-islands "
        "(change-flag → running segment id → per-segment span + LEAD). "
        "Change points trigger on VALUE transitions, complementing "
        "events_sessionize's time-gap islands. Order is (ts, event_id) — "
        "a total order, so segments are deterministic under equal "
        "timestamps. Scale: everything partitions by user_id — two "
        "window passes and one aggregate over the same partitioning, "
        "a single shuffle; no cross-user data movement.",
)
def events_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    chg = F.when(
        F.lag("event_type").over(w).isNull()
        | (F.col("event_type") != F.lag("event_type").over(w)),
        1).otherwise(0)
    seg = ev.withColumn(
        "sid", F.sum(chg).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    spans = (seg.groupBy("user_id", "sid", "event_type")
             .agg(F.min("ts").alias("valid_from"),
                  F.count("*").alias("n_events")))
    w2 = Window.partitionBy("user_id").orderBy("sid")
    return spans.select(
        "user_id", "event_type", "valid_from",
        F.lead("valid_from").over(w2).alias("valid_to"), "n_events")


@query(
    "events_zscore_outliers",
    oracle=f"""
        WITH u AS (
            SELECT user_id, event_id, value,
                   {sql_units('value', 10000)} AS uv
            FROM events),
        stats AS (
            SELECT user_id,
                   COUNT(*) AS n,
                   CAST(SUM(uv) AS BIGINT) AS s1,
                   CAST(SUM(uv * uv) AS BIGINT) AS s2
            FROM u GROUP BY user_id),
        scored AS (
            SELECT u.user_id, u.event_id, u.value,
                   (s1 / 10000.0) / n AS mean,
                   sqrt(GREATEST(0.0,
                       (s2 / 100000000.0) / n
                       - ((s1 / 10000.0) / n) * ((s1 / 10000.0) / n)))
                       AS sd
            FROM u JOIN stats ON u.user_id = stats.user_id
            WHERE n >= 2)
        SELECT user_id, event_id, value, mean, sd
        FROM scored
        WHERE abs(value - mean) > 2.0 * sd AND sd > 0
    """,
    category="extension: exact-variance outlier detection",
    doc="Per-user z-score outliers (|value − mean| > 2σ): mean and "
        "variance are derived from EXACT integer sums of fixed-point "
        "units (Σu, Σu²) — the one-pass variance formula over int64 is "
        "order-independent, so the σ boundary is the identical double on "
        "both engines (a naive SUM(double)/STDDEV is partition-order "
        "dependent and flips boundary rows between engines). Σu² fits "
        "int64 for |value|·10⁴ < 3×10⁹ per term at this unit scale; at "
        "wider domains drop the unit scale accordingly. Scale: one "
        "groupBy(user_id) for moments, stats join back AQE-sized — two "
        "shuffles on the same key; no window sort needed.",
)
def events_zscore_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "value",
        units_col(F.col("value"), 10000).alias("uv"))
    stats = (ev.groupBy("user_id")
             .agg(F.count("*").alias("n"),
                  F.sum("uv").alias("s1"),
                  F.sum(F.col("uv") * F.col("uv")).alias("s2"))
             .filter(F.col("n") >= 2))
    mean = (F.col("s1") / 10000.0) / F.col("n")
    sd = F.sqrt(F.greatest(
        F.lit(0.0),
        (F.col("s2") / 100000000.0) / F.col("n") - mean * mean))
    scored = (ev.join(stats, "user_id")
              .select("user_id", "event_id", "value",
                      mean.alias("mean"), sd.alias("sd")))
    return scored.filter(
        (F.abs(F.col("value") - F.col("mean")) > 2.0 * F.col("sd"))
        & (F.col("sd") > 0))


# ---------------------------------------------------------------------------
# rfm_segmentation — quartile-based customer segmentation
# ---------------------------------------------------------------------------

RFM_ANCHOR = "2001-08-02"     # day after the fixture's max orderdate


@query(
    "rfm_segmentation",
    oracle=f"""
        WITH m AS (
            SELECT o_custkey AS custkey,
                   date_diff('day', CAST(MAX(o_orderdate) AS DATE),
                             DATE '{RFM_ANCHOR}') AS rec_days,
                   COUNT(*) AS freq,
                   CAST(SUM({sql_units('o_totalprice', 100)}) AS BIGINT)
                       AS mon_u
            FROM orders GROUP BY o_custkey)
        SELECT custkey, rec_days, freq,
               mon_u / CAST(100 AS DOUBLE) AS monetary,
               ntile(4) OVER (ORDER BY rec_days ASC, custkey ASC) AS r_tile,
               ntile(4) OVER (ORDER BY freq DESC, custkey ASC) AS f_tile,
               ntile(4) OVER (ORDER BY mon_u DESC, custkey ASC) AS m_tile,
               ntile(4) OVER (ORDER BY rec_days ASC, custkey ASC) * 100
                   + ntile(4) OVER (ORDER BY freq DESC, custkey ASC) * 10
                   + ntile(4) OVER (ORDER BY mon_u DESC, custkey ASC)
                   AS rfm_segment
        FROM m
    """,
    category="extension: RFM segmentation",
    doc="RFM (recency / frequency / monetary) customer segmentation: "
        "per-customer order recency (days to the fixture anchor date), "
        "order count, and exact fixed-point spend, each cut into "
        "quartiles with ntile(4) over a TOTAL order (custkey tiebreak, "
        "so tile boundaries cannot flip between engines), composed into "
        "the classic 3-digit RFM code. Scale: the heavy part is one "
        "partial-agg shuffle of orders down to the per-customer table "
        "(3+ orders of magnitude smaller); the three ntiles are global "
        "sorts of that reduced table — fine into the billions, and the "
        "documented swap at extreme customer cardinality is "
        "approx-percentile cutpoints + a map-side bucket join, trading "
        "exact quartile boundaries for full parallelism.",
)
def rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    m = (orders.groupBy(F.col("o_custkey").alias("custkey"))
         .agg(F.datediff(F.lit(RFM_ANCHOR).cast("date"),
                         F.max(F.col("o_orderdate").cast("date")))
                  .alias("rec_days"),
              F.count(F.lit(1)).alias("freq"),
              F.sum(units_col(F.col("o_totalprice"), 100)).alias("mon_u")))
    w_r = Window.orderBy(F.col("rec_days").asc(), F.col("custkey").asc())
    w_f = Window.orderBy(F.col("freq").desc(), F.col("custkey").asc())
    w_m = Window.orderBy(F.col("mon_u").desc(), F.col("custkey").asc())
    r_t, f_t, m_t = (F.ntile(4).over(w_r), F.ntile(4).over(w_f),
                     F.ntile(4).over(w_m))
    return m.select(
        "custkey", "rec_days", "freq",
        (F.col("mon_u") / F.lit(100).cast("double")).alias("monetary"),
        r_t.alias("r_tile"), f_t.alias("f_tile"), m_t.alias("m_tile"),
        (r_t * 100 + f_t * 10 + m_t).alias("rfm_segment"))


# ---------------------------------------------------------------------------
# source_binaryfile_reader — whole-file binary ingestion (multimodal shape)
# ---------------------------------------------------------------------------

BINFILE_EVERY = 100           # one file per doc_id % 100 == 0


@query(
    "source_binaryfile_reader",
    oracle=f"""
        SELECT doc_id,
               CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
               md5(text) AS content_md5
        FROM documents WHERE doc_id % {BINFILE_EVERY} = 0
    """,
    category="extension: source (binaryFile / whole-file blobs)",
    doc="Spark's binaryFile source — the ingestion path for multimodal "
        "corpora (images/audio as whole files): documents with doc_id % "
        "100 == 0 are materialized once as .bin files (utf-8 text bytes; "
        "the cache key includes the sf dir), read back as (path, length, "
        "content) rows, and fingerprinted with md5 over the raw bytes. "
        "The oracle computes the same sizes and digests straight from "
        "the documents view (utf-8 octet length + md5 of the text), so "
        "any byte lost or mangled in the file round-trip breaks the "
        "hash — lossless end-to-end proof. Scale: binaryFile splits per FILE "
        "(content is opaque), so partition parallelism = file count; "
        "pair it with the multimodal mapInPandas decoders "
        "(operators/multimodal.py) which run map-side before any "
        "shuffle. Driver lists files O(n) — at 100 TB point it at a "
        "manifest-partitioned object-store layout.",
)
def source_binaryfile_reader(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile as _tf

    docs = load_table(spark, sf_dir, "documents") \
        .filter(F.col("doc_id") % BINFILE_EVERY == 0)
    key = os.path.abspath(sf_dir).strip("/").replace("/", "_")
    bindir = os.path.join(_tf.gettempdir(), f"flinkapps_binfiles_{key}")
    marker = os.path.join(bindir, "_SUCCESS")
    if not os.path.exists(marker):
        os.makedirs(bindir, exist_ok=True)
        for row in docs.select("doc_id", "text").collect():
            with open(os.path.join(bindir, f"doc_{row['doc_id']}.bin"),
                      "wb") as f:
                f.write(row["text"].encode("utf-8"))
        open(marker, "w").close()
    bf = spark.read.format("binaryFile").load(os.path.join(bindir, "*.bin"))
    return bf.select(
        F.regexp_extract(
            F.element_at(F.split(F.col("path"), "/"), -1),
            r"doc_(\d+)\.bin", 1).cast("long").alias("doc_id"),
        F.col("length").alias("n_bytes"),
        F.md5(F.col("content")).alias("content_md5"))


# ---------------------------------------------------------------------------
# itemset_copurchase_pairs — market-basket pairwise co-occurrence
# ---------------------------------------------------------------------------

COPURCHASE_MIN_SUP = 2        # minimum pair support (orders containing both)


@query(
    "itemset_copurchase_pairs",
    oracle=f"""
        WITH op AS (
            SELECT DISTINCT l_orderkey AS okey, l_partkey AS part
            FROM lineitem),
        n AS (SELECT COUNT(DISTINCT okey) AS n_orders FROM op),
        psup AS (SELECT part, COUNT(*) AS sup FROM op GROUP BY part),
        pairs AS (
            SELECT a.part AS part_a, b.part AS part_b, COUNT(*) AS support
            FROM op a JOIN op b
              ON a.okey = b.okey AND a.part < b.part
            GROUP BY a.part, b.part
            HAVING COUNT(*) >= {COPURCHASE_MIN_SUP})
        SELECT part_a, part_b, support,
               ROUND(CAST(support * n.n_orders AS DOUBLE)
                     / CAST(sa.sup * sb.sup AS DOUBLE), 6) AS lift
        FROM pairs
        JOIN psup sa ON sa.part = part_a
        JOIN psup sb ON sb.part = part_b
        CROSS JOIN n
    """,
    category="extension: market-basket co-occurrence",
    doc="Pairwise frequent-itemset mining (the candidate-pair stage of "
        "Apriori / the co-purchase graph behind 'bought together' "
        "recommenders): distinct parts per order, within-order pair "
        "expansion, support count and lift vs the independence "
        "assumption. Scale: the quadratic term is bounded per ORDER "
        "(baskets are ~4-7 lines), so pair expansion is linear in rows; "
        "one shuffle on the pair key aggregates support; part supports "
        "and the order total are small side tables. The shape risk — an "
        "ultra-popular item squaring pair volume and hot-keying the "
        "pair reducers — is guarded by pop_cap= (operators/baskets."
        "cap_popular_items; default off so the driver-checked query "
        "stays oracle-identical; zipf-skew tests prove the capped plan "
        "parity-green vs a capped oracle). Lift is an int64 "
        "cross-product ratio divided once — engine-identical doubles "
        "(counts at 100 TB stay far inside int64; note in SCALE.md "
        "float policy).",
)
def itemset_copurchase_pairs(spark: SparkSession, sf_dir: str,
                             pop_cap: int | None = None) -> DataFrame:
    from flinkapps_spark.operators.baskets import cap_popular_items
    li = load_table(spark, sf_dir, "lineitem")
    op = (li.select(F.col("l_orderkey").alias("okey"),
                    F.col("l_partkey").alias("part")).distinct())
    if pop_cap is not None:
        op = cap_popular_items(op, "part", pop_cap)
    # Round-9 restructure (guide §1.2 don't-compute-twice + §2.3): the
    # old form referenced the un-persisted distinct (okey, part) frame
    # FOUR times (order total, part supports, both self-join sides), so
    # lineitem was scanned and the distinct shuffled four times, and the
    # within-order pair expansion paid a full self-join exchange.  Now
    # ONE exchange builds the per-order sorted part-set (collect_set
    # folds the distinct into the same shuffle), the frame is persisted
    # + materialized once, and pairs/supports/total all derive from it —
    # the a<b pair expansion runs inside codegen over the ~4-7-element
    # basket arrays (same bounded-quadratic term as before, no join).
    # Oracle keeps the op-based self-join form; results are identical
    # (sorted distinct baskets make combinations == the a<b equi-join).
    baskets = (op.groupBy("okey")
               .agg(F.sort_array(F.collect_set("part")).alias("parts"))
               .persist())
    baskets.count()  # materialize once for the three downstream uses
    n_orders = baskets.agg(F.count(F.lit(1)).alias("n_orders"))
    psup = (baskets.select(F.explode("parts").alias("part"))
            .groupBy("part").agg(F.count(F.lit(1)).alias("sup")))
    pair_arr = F.flatten(F.transform(
        F.col("parts"),
        lambda x, i: F.transform(
            F.slice(F.col("parts"), i + F.lit(2), F.size("parts")),
            lambda y: F.struct(x.alias("part_a"), y.alias("part_b")))))
    pairs = (baskets.select(F.explode(pair_arr).alias("p"))
             .select("p.part_a", "p.part_b")
             .groupBy("part_a", "part_b")
             .agg(F.count(F.lit(1)).alias("support"))
             .filter(F.col("support") >= COPURCHASE_MIN_SUP))
    sa = psup.select(F.col("part").alias("part_a"),
                     F.col("sup").alias("sup_a"))
    sb = psup.select(F.col("part").alias("part_b"),
                     F.col("sup").alias("sup_b"))
    return (pairs.join(sa, "part_a").join(sb, "part_b")
            .crossJoin(F.broadcast(n_orders))
            .select("part_a", "part_b", "support",
                    F.round((F.col("support") * F.col("n_orders"))
                            .cast("double")
                            / (F.col("sup_a") * F.col("sup_b"))
                            .cast("double"), 6).alias("lift")))


# ---------------------------------------------------------------------------
# orders_interarrival_stats — inter-order gap distribution per segment
# ---------------------------------------------------------------------------


@query(
    "orders_interarrival_stats",
    oracle="""
        WITH seq AS (
            SELECT o_custkey AS custkey,
                   date_diff('day',
                       lag(CAST(o_orderdate AS DATE)) OVER (
                           PARTITION BY o_custkey
                           ORDER BY o_orderdate, o_orderkey),
                       CAST(o_orderdate AS DATE)) AS gap_days
            FROM orders),
        gaps AS (
            SELECT c.c_mktsegment AS segment, s.gap_days
            FROM seq s JOIN customer c ON c.c_custkey = s.custkey
            WHERE s.gap_days IS NOT NULL)
        SELECT segment, COUNT(*) AS n_gaps,
               CAST(SUM(gap_days) AS BIGINT)
                   / CAST(COUNT(*) AS DOUBLE) AS avg_gap_days,
               MIN(gap_days) AS min_gap, MAX(gap_days) AS max_gap
        FROM gaps GROUP BY segment
    """,
    category="extension: inter-arrival analysis",
    doc="Customer re-order cadence: per-customer inter-order gaps (lag "
        "over a (custkey, orderdate, orderkey) total order) aggregated "
        "to gap-count / exact mean / min / max per market segment — the "
        "churn-model feature and capacity-planning input. Scale: one "
        "shuffle+sort per custkey for the lag, one broadcast of the "
        "customer dimension for the segment label (bucket-join it past "
        "broadcast size), one partial-agg shuffle to 5 segment rows. "
        "The mean is an exact integer-day sum divided once.",
)
def orders_interarrival_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    seq = orders.select(
        F.col("o_custkey").alias("custkey"),
        F.datediff(F.col("o_orderdate").cast("date"),
                   F.lag(F.col("o_orderdate").cast("date")).over(w))
            .alias("gap_days"))
    gaps = (seq.filter(F.col("gap_days").isNotNull())
            .join(F.broadcast(cust.select(
                F.col("c_custkey").alias("custkey"),
                F.col("c_mktsegment").alias("segment"))), "custkey"))
    return (gaps.groupBy("segment")
            .agg(F.count(F.lit(1)).alias("n_gaps"),
                 (F.sum("gap_days") / F.count(F.lit(1)).cast("double"))
                     .alias("avg_gap_days"),
                 F.min("gap_days").alias("min_gap"),
                 F.max("gap_days").alias("max_gap")))


# ---------------------------------------------------------------------------
# agg_partial_merge — mergeable partial-aggregation state proof
# ---------------------------------------------------------------------------

MERGE_SPLIT_DAY = 16          # events before Jan 16 = batch 1, rest = batch 2


@query(
    "agg_partial_merge",
    oracle=f"""
        WITH tagged AS (
            SELECT event_type,
                   CASE WHEN EXTRACT(day FROM ts) < {MERGE_SPLIT_DAY}
                        THEN 1 ELSE 2 END AS batch,
                   value
            FROM events),
        partials AS (
            SELECT event_type, batch, COUNT(*) AS p_n,
                   CAST(SUM({sql_units('value', 100)}) AS BIGINT) AS p_su
            FROM tagged GROUP BY event_type, batch),
        merged AS (
            SELECT event_type, CAST(SUM(p_n) AS BIGINT) AS n_events,
                   CAST(SUM(p_su) AS BIGINT) AS su,
                   COUNT(*) AS n_batches
            FROM partials GROUP BY event_type)
        SELECT event_type, n_events,
               su / CAST(100 AS DOUBLE) AS total_value, n_batches,
               true AS merge_equals_direct
        FROM merged
    """,
    category="extension: mergeable partial aggregation",
    doc="Mergeable aggregation-state proof (the property every "
        "incremental / distributed agg relies on — Spark's partial_* "
        "operators, cube materialization, cross-day rollups): events "
        "are split into two batches, per-batch partial states (count + "
        "fixed-point unit sum) are computed independently, merged by "
        "integer addition, and the engine CHECKS the merge equals the "
        "direct single-pass aggregate in-plan, emitting the comparison "
        "as a column the oracle pins to true. Works because int64 "
        "addition is associative — the same reason the exact.* policy "
        "is order-independent. Scale: partials are map-side combined; "
        "the merge shuffles ~(types x batches) rows only.",
)
def agg_partial_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    tagged = ev.select(
        "event_type",
        F.when(F.dayofmonth("ts") < MERGE_SPLIT_DAY, 1).otherwise(2)
            .alias("batch"),
        "value")
    partials = (tagged.groupBy("event_type", "batch")
                .agg(F.count(F.lit(1)).alias("p_n"),
                     F.sum(units_col(F.col("value"), 100)).alias("p_su")))
    merged = (partials.groupBy("event_type")
              .agg(F.sum("p_n").alias("n_events"),
                   F.sum("p_su").alias("su"),
                   F.count(F.lit(1)).alias("n_batches")))
    direct = (ev.groupBy("event_type")
              .agg(F.count(F.lit(1)).alias("d_n"),
                   F.sum(units_col(F.col("value"), 100)).alias("d_su")))
    return (merged.join(direct, "event_type")
            .select("event_type", "n_events",
                    (F.col("su") / F.lit(100).cast("double"))
                        .alias("total_value"),
                    "n_batches",
                    ((F.col("n_events") == F.col("d_n"))
                     & (F.col("su") == F.col("d_su")))
                        .alias("merge_equals_direct")))


# ---------------------------------------------------------------------------
# sketch_hll_portable — engine-portable HLL: registers match bit for bit
# ---------------------------------------------------------------------------

from flinkapps_spark.operators import sketches as _sk  # noqa: E402


HLL_PORTABLE_ORACLE = f"""
        WITH {_sk.sql_hll_regs_cte("event_type", "user_id", "events")},
        regs2 AS (
            SELECT k, bucket, reg FROM hll_regs
            UNION ALL
            SELECT 'ALL', bucket, MAX(reg)
            FROM hll_regs GROUP BY bucket),
        fin AS ({_sk.sql_hll_finalize("regs2")}),
        ex AS (
            SELECT event_type AS k, COUNT(DISTINCT user_id) AS n_exact
            FROM events GROUP BY event_type
            UNION ALL
            SELECT 'ALL', COUNT(DISTINCT user_id) FROM events)
        SELECT ex.k AS event_type, ex.n_exact, fin.hll_est,
               fin.reg_checksum,
               ABS(CAST(fin.hll_est AS DOUBLE)
                   - CAST(ex.n_exact AS DOUBLE))
                   <= 0.15 * CAST(ex.n_exact AS DOUBLE) AS within_tol
        FROM ex JOIN fin ON ex.k = fin.k
    """


def hll_portable_report(regs, ev_base) -> DataFrame:
    """Shared tail of sketch_hll_portable and stream_hll_distinct: merge
    the register-level 'ALL' row, finalize, attach batch-side exact
    counts and the 0.15-band booleans.  ONE implementation so the two
    queries can never drift from the verbatim-shared oracle."""
    all_regs = _sk.hll_merge(
        regs.withColumn("k", F.lit("ALL")), ["k"])
    fin = _sk.hll_finalize(regs.unionByName(all_regs), ["k"])
    ex = ev_base.groupBy("k").agg(
        F.countDistinct("user_id").alias("n_exact")).unionByName(
        ev_base.agg(F.lit("ALL").alias("k"),
                    F.countDistinct("user_id").alias("n_exact")))
    return (ex.join(fin, "k")
            .select(F.col("k").alias("event_type"), "n_exact",
                    "hll_est", "reg_checksum",
                    (F.abs(F.col("hll_est").cast("double")
                           - F.col("n_exact").cast("double"))
                     <= 0.15 * F.col("n_exact").cast("double"))
                    .alias("within_tol")))


@query(
    "sketch_hll_portable",
    oracle=HLL_PORTABLE_ORACLE,
    category="extension: mergeable sketches (portable HLL)",
    doc="Engine-PORTABLE HyperLogLog (operators/sketches.py): distinct "
        "users per event_type plus an 'ALL' row produced by MERGING the "
        "per-type register tables (pairwise max — no raw data touched), "
        "with the DuckDB oracle rebuilding the SAME registers from the "
        "shared poly-31 hash.  Unlike sketch_hll_rollup (DataSketches "
        "bytes are engine-specific, so only a tolerance boolean is "
        "checkable there), here the estimate AND a register checksum "
        "are value-hashed exactly: register weights sum as integers, "
        "one division, integer-rounded estimate.  Scale: registers are "
        "a (type, bucket) partial-agg — 1024 counters per key for any "
        "input size; merge is max-per-bucket, the algebra that makes "
        "per-segment sketches roll up for free.",
)
def sketch_hll_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        F.col("event_type").alias("k"), "user_id")
    return hll_portable_report(_sk.hll_registers(ev, ["k"], "user_id"),
                               ev)


# ---------------------------------------------------------------------------
# sketch_kmv_setops — KMV/theta sample: distinct intersection estimation
# ---------------------------------------------------------------------------

_KMV_SQL_EST = f"""CASE WHEN k_eff < {_sk.KMV_K} THEN CAST(k_eff AS DOUBLE)
             ELSE {float(_sk.KMV_K - 1)!r}
                  / (CAST(theta_h AS DOUBLE) / {_sk._HASH_RANGE!r}) END"""


@query(
    "sketch_kmv_setops",
    oracle=f"""
        WITH ea AS (SELECT DISTINCT user_id FROM events
                    WHERE event_type = 'purchase'),
        eb AS (SELECT DISTINCT user_id FROM events
               WHERE event_type = 'click' AND user_id % 2 = 0),
        sa AS (SELECT h FROM (
                   SELECT {_sk.sql_hll_hash("user_id")} AS h,
                          ROW_NUMBER() OVER (ORDER BY
                              {_sk.sql_hll_hash("user_id")}) AS rn
                   FROM ea) WHERE rn <= {_sk.KMV_K}),
        sb AS (SELECT h FROM (
                   SELECT {_sk.sql_hll_hash("user_id")} AS h,
                          ROW_NUMBER() OVER (ORDER BY
                              {_sk.sql_hll_hash("user_id")}) AS rn
                   FROM eb) WHERE rn <= {_sk.KMV_K}),
        su AS (SELECT h FROM (
                   SELECT h, ROW_NUMBER() OVER (ORDER BY h) AS rn
                   FROM (SELECT DISTINCT h FROM (
                       SELECT h FROM sa UNION ALL SELECT h FROM sb)))
               WHERE rn <= {_sk.KMV_K}),
        m AS (SELECT COUNT(*) AS k_eff, MAX(h) AS theta_h,
                     CAST(SUM(CASE WHEN h IN (SELECT h FROM sa)
                                    AND h IN (SELECT h FROM sb)
                              THEN 1 ELSE 0 END) AS BIGINT) AS n_both
              FROM su),
        ex AS (SELECT (SELECT COUNT(*) FROM ea) AS n_exact_a,
                      (SELECT COUNT(*) FROM eb) AS n_exact_b,
                      (SELECT COUNT(*) FROM (SELECT * FROM ea
                                             UNION SELECT * FROM eb))
                          AS n_exact_union,
                      (SELECT COUNT(*) FROM (SELECT * FROM ea
                                             INTERSECT SELECT * FROM eb))
                          AS n_exact_inter)
        SELECT n_exact_a, n_exact_b, n_exact_union, n_exact_inter,
               theta_h, n_both,
               CAST(ROUND({_KMV_SQL_EST}, 0) AS BIGINT) AS kmv_union_est,
               CAST(ROUND(CAST(n_both AS DOUBLE) / CAST(k_eff AS DOUBLE)
                          * ({_KMV_SQL_EST}), 0) AS BIGINT)
                   AS kmv_inter_est,
               ROUND(CAST(n_both AS DOUBLE) / CAST(k_eff AS DOUBLE), 6)
                   AS jaccard_est,
               ABS(CAST(ROUND({_KMV_SQL_EST}, 0) AS BIGINT)
                   - n_exact_union)
                   <= 0.25 * n_exact_union + 5 AS union_ok,
               ABS(CAST(ROUND(CAST(n_both AS DOUBLE)
                              / CAST(k_eff AS DOUBLE)
                              * ({_KMV_SQL_EST}), 0) AS BIGINT)
                   - n_exact_inter)
                   <= 0.25 * n_exact_inter + 5 AS inter_ok
        FROM m CROSS JOIN ex
    """,
    category="extension: mergeable sketches (KMV / theta set ops)",
    doc="KMV (k minimum values / theta-sketch) distinct SET-OPERATION "
        "estimation — the capability HLL lacks: union, intersection and "
        "Jaccard of two user sets (purchasers vs even-id clickers) from "
        "two 256-hash samples (Beyer et al. 2007; the DataSketches theta "
        "recipe).  The k-th smallest hash of a set is deterministic, so "
        "unlike theta-sketch BYTES the whole result value-hashes across "
        "engines: theta and the matched-sample count are emitted "
        "exactly, estimates are fixed division chains rounded to "
        "integers, and sub-k sets degrade to EXACT counts (the sample "
        "IS the set).  Tolerance booleans gate the estimator against "
        "the exact counts (rse ≈ 1/sqrt(k−2) ≈ 6%; band 25% + 5).  "
        "Scale: per-set distinct pre-aggregates map-side; the global "
        "top-k runs as TakeOrdered (per-partition top-k merged on the "
        "driver — k rows per partition cross the wire, never the "
        "distinct set itself).",
)
def sketch_kmv_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    K = _sk.KMV_K
    ea = (ev.filter(F.col("event_type") == "purchase")
          .select("user_id").distinct())
    eb = (ev.filter((F.col("event_type") == "click")
                    & (F.col("user_id") % 2 == 0))
          .select("user_id").distinct())
    sa = (ea.select(_sk.kmv_hash("user_id").alias("h"))
          .orderBy("h").limit(K))
    sb = (eb.select(_sk.kmv_hash("user_id").alias("h"))
          .orderBy("h").limit(K))
    su = sa.unionByName(sb).distinct().orderBy("h").limit(K)
    flagged = (su.join(sa.withColumn("ina", F.lit(1)), "h", "left")
               .join(sb.withColumn("inb", F.lit(1)), "h", "left"))
    m = flagged.agg(
        F.count("*").alias("k_eff"),
        F.max("h").alias("theta_h"),
        F.sum(F.when(F.col("ina").isNotNull()
                     & F.col("inb").isNotNull(), 1).otherwise(0))
        .cast("long").alias("n_both"))
    n_a = ea.agg(F.count("*").alias("n_exact_a"))
    n_b = eb.agg(F.count("*").alias("n_exact_b"))
    n_u = (ea.unionByName(eb).distinct()
           .agg(F.count("*").alias("n_exact_union")))
    n_i = (ea.join(eb, "user_id")
           .agg(F.count("*").alias("n_exact_inter")))
    est_union = F.when(
        F.col("k_eff") < K, F.col("k_eff").cast("double")).otherwise(
        _sk.kmv_estimate(F.col("theta_h")))
    jac = F.col("n_both").cast("double") / F.col("k_eff").cast("double")
    out = (m.crossJoin(F.broadcast(n_a)).crossJoin(F.broadcast(n_b))
           .crossJoin(F.broadcast(n_u)).crossJoin(F.broadcast(n_i)))
    union_est = F.round(est_union, 0).cast("long")
    inter_est = F.round(jac * est_union, 0).cast("long")
    return out.select(
        "n_exact_a", "n_exact_b", "n_exact_union", "n_exact_inter",
        "theta_h", "n_both",
        union_est.alias("kmv_union_est"),
        inter_est.alias("kmv_inter_est"),
        F.round(jac, 6).alias("jaccard_est"),
        (F.abs(union_est - F.col("n_exact_union"))
         <= 0.25 * F.col("n_exact_union") + 5).alias("union_ok"),
        (F.abs(inter_est - F.col("n_exact_inter"))
         <= 0.25 * F.col("n_exact_inter") + 5).alias("inter_ok"))


# ---------------------------------------------------------------------------
# sketch_cms_freq — Count-Min frequency estimates with the CMS guarantee
# ---------------------------------------------------------------------------

CMS_PROBE_MAX_ID = 8            # probe keys: user_ids 0..7 (deterministic)


CMS_FREQ_ORACLE = f"""
        WITH {_sk.sql_cms_cells("user_id", "events", "cells")},
        n AS (SELECT COUNT(*) AS n_total FROM events),
        ex AS (SELECT user_id, COUNT(*) AS n_exact FROM events
               WHERE user_id < {CMS_PROBE_MAX_ID} GROUP BY user_id),
        pb AS (
            SELECT ex.user_id, ex.n_exact, r AS row,
                   list_reduce(list_transform(string_split(substr(md5(
                       CAST(r AS VARCHAR) || ':'
                       || CAST(ex.user_id AS VARCHAR)), 1, 15), ''),
                       c -> CAST(strpos('0123456789abcdef', c) - 1
                                 AS BIGINT)),
                       (a, b) -> a * 16 + b) % {_sk.CMS_W} AS bucket
            FROM ex CROSS JOIN (SELECT unnest(range({_sk.CMS_D})) AS r)),
        est AS (
            SELECT pb.user_id, pb.n_exact,
                   CAST(MIN(cells.cnt) AS BIGINT) AS cms_est
            FROM pb JOIN cells ON pb.row = cells.row
                               AND pb.bucket = cells.bucket
            GROUP BY pb.user_id, pb.n_exact)
        SELECT user_id, n_exact, cms_est,
               cms_est >= n_exact AS never_under,
               cms_est <= n_exact
                   + CAST(CEIL({_sk.CMS_EPS!r}
                               * CAST(n_total AS DOUBLE)) AS BIGINT)
                   AS within_eps
        FROM est CROSS JOIN n
    """


def cms_freq_report(cells, ev) -> DataFrame:
    """Shared tail of sketch_cms_freq and stream_cms_freq: probe the
    cell matrix for the deterministic probe users, attach exact counts
    and both CMS guarantee booleans.  ONE implementation so the batch
    and streaming queries can never drift from the shared oracle."""
    n = ev.agg(F.count("*").alias("n_total"))
    ex = (ev.filter(F.col("user_id") < CMS_PROBE_MAX_ID)
          .groupBy("user_id").agg(F.count("*").alias("n_exact")))
    pb = ex.select(
        "user_id", "n_exact",
        F.explode(F.array(*[
            F.struct(F.lit(i).alias("row"),
                     _sk.cms_bucket("user_id", i).alias("bucket"))
            for i in range(_sk.CMS_D)])).alias("c")) \
        .select("user_id", "n_exact", "c.row", "c.bucket")
    est = (pb.join(F.broadcast(cells), ["row", "bucket"])
           .groupBy("user_id", "n_exact")
           .agg(F.min("cnt").cast("long").alias("cms_est")))
    slack = F.ceil(F.lit(_sk.CMS_EPS)
                   * F.col("n_total").cast("double")).cast("long")
    return (est.crossJoin(F.broadcast(n))
            .select("user_id", "n_exact", "cms_est",
                    (F.col("cms_est") >= F.col("n_exact"))
                    .alias("never_under"),
                    (F.col("cms_est") <= F.col("n_exact") + slack)
                    .alias("within_eps")))


@query(
    "sketch_cms_freq",
    oracle=CMS_FREQ_ORACLE,
    category="extension: mergeable sketches (Count-Min frequency)",
    doc="Count-Min sketch (Cormode & Muthukrishnan 2005): per-key "
        "frequency estimates for 8 deterministic probe users from a "
        "d=4 × w=1024 counter matrix, next to exact counts and the two "
        "CMS guarantees as booleans — NEVER-underestimates (structural: "
        "every cell counts a superset of the key's rows, so the oracle "
        "asserts it as a hard invariant) and est ≤ exact + ceil(e/w · N) "
        "(holds per key with prob ≥ 1−e⁻⁴; deterministic per fixture, "
        "verified green on all of them).  Counters are exact integers "
        "from the shared salted md5-prefix hash, so cells AND estimates "
        "value-hash across engines.  Scale: each input row increments d "
        "cells map-side (partial agg → ≤ d·w cells per task cross the "
        "wire); cell tables merge by addition — the same rollup algebra "
        "as the HLL registers; probes join the 4096-cell table, which "
        "broadcasts at any corpus size.",
)
def sketch_cms_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return cms_freq_report(_sk.cms_cells(ev, "user_id"), ev)


# ---------------------------------------------------------------------------
# sketch_hll_rolling7d — sliding distinct windows from merged day sketches
# ---------------------------------------------------------------------------

ROLL_PROBE_RANKS = (8, 15, 25)   # day ranks whose windows get exact checks


@query(
    "sketch_hll_rolling7d",
    oracle=f"""
        WITH b AS (
            SELECT date_trunc('day', ts) AS day, user_id FROM events),
        {_sk.sql_hll_regs_cte("day", "user_id", "b")},
        days AS (SELECT DISTINCT day FROM b),
        contrib AS (
            SELECT k + to_days(CAST(off AS INTEGER)) AS window_end,
                   bucket, reg
            FROM hll_regs CROSS JOIN
                 (SELECT unnest(range(7)) AS off)),
        kept AS (
            SELECT c.window_end, c.bucket, c.reg
            FROM contrib c JOIN days d ON c.window_end = d.day),
        merged AS (
            SELECT window_end AS k, bucket, MAX(reg) AS reg
            FROM kept GROUP BY 1, 2),
        fin AS ({_sk.sql_hll_finalize("merged")}),
        ranked AS (
            SELECT day, ROW_NUMBER() OVER (ORDER BY day) AS rk FROM days),
        exact AS (
            SELECT p.day AS k, COUNT(DISTINCT b.user_id) AS n_exact
            FROM (SELECT day FROM ranked
                  WHERE rk IN {ROLL_PROBE_RANKS}) p
            JOIN b ON b.day BETWEEN p.day - to_days(CAST(6 AS INTEGER)) AND p.day
            GROUP BY p.day)
        SELECT fin.k AS window_end, hll_est, reg_checksum,
               exact.n_exact,
               CASE WHEN exact.n_exact IS NULL THEN NULL
                    ELSE ABS(CAST(hll_est AS DOUBLE)
                             - CAST(n_exact AS DOUBLE))
                         <= 0.15 * CAST(n_exact AS DOUBLE)
               END AS within_tol
        FROM fin LEFT JOIN exact ON fin.k = exact.k
    """,
    category="extension: mergeable sketches (sliding-window rollup)",
    doc="Rolling 7-day distinct users per day WITHOUT revisiting raw "
        "data: per-day HLL register tables merge (pairwise max) into "
        "each of the ≤7 sliding windows a day contributes to — the "
        "continuous-aggregate pattern (Timescale-style): raw events are "
        "read once to build day sketches; every window after that is "
        "sketch algebra over |days|×m register rows.  Exact COUNT "
        "DISTINCT is computed for three probe windows only (ranks 8/15/"
        "25 — exact sliding distinct is precisely the thing too "
        "expensive to do for every window at 100 TB, which is the point "
        "of the sketch), with 15%-band booleans; estimates and register "
        "checksums value-hash exactly for ALL windows.  Scale: the "
        "7× register fan-out is |days|×m×7 rows regardless of event "
        "count; the raw scan is one partial-agg pass.",
)
def sketch_hll_rolling7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W
    ev = load_table(spark, sf_dir, "events")
    base = ev.select(F.date_trunc("day", "ts").alias("day"), "user_id")
    regs = _sk.hll_registers(base, ["day"], "user_id")
    days = base.select("day").distinct()
    contrib = (regs.select(
        F.explode(F.sequence(F.lit(0), F.lit(6))).alias("off"),
        "day", "bucket", "reg")
        .select(F.timestamp_add("DAY", F.col("off"), F.col("day"))
                .alias("window_end"), "bucket", "reg")
        .join(days.withColumnRenamed("day", "window_end"), "window_end"))
    fin = _sk.hll_finalize(
        _sk.hll_merge(contrib, ["window_end"]), ["window_end"])
    # probe-day ranking: a partition-less window over the DISTINCT day
    # table (|days| rows), never over events
    ranked = days.withColumn(
        "rk", F.row_number().over(W.orderBy("day")))
    probes = ranked.filter(
        F.col("rk").isin(*ROLL_PROBE_RANKS)).select("day")
    exact = (probes.alias("p")
             .join(base.alias("b"),
                   (F.col("b.day") <= F.col("p.day"))
                   & (F.col("b.day")
                      >= F.timestamp_add("DAY", F.lit(-6),
                                         F.col("p.day"))))
             .groupBy(F.col("p.day").alias("window_end"))
             .agg(F.countDistinct("b.user_id").alias("n_exact")))
    return (fin.join(exact, "window_end", "left")
            .select("window_end", "hll_est", "reg_checksum", "n_exact",
                    F.when(F.col("n_exact").isNull(),
                           F.lit(None).cast("boolean"))
                    .otherwise(
                        F.abs(F.col("hll_est").cast("double")
                              - F.col("n_exact").cast("double"))
                        <= 0.15 * F.col("n_exact").cast("double"))
                    .alias("within_tol")))


# ---------------------------------------------------------------------------
# exact_median_selection — distributed k-th smallest without a global sort
# ---------------------------------------------------------------------------

MEDIAN_BINS = 1024


@query(
    "exact_median_selection",
    oracle="""
        SELECT event_type, n, k, median_value
        FROM (
            SELECT event_type, value AS median_value,
                   COUNT(*) OVER (PARTITION BY event_type) AS n,
                   (COUNT(*) OVER (PARTITION BY event_type) + 1) // 2
                       AS k,
                   ROW_NUMBER() OVER (PARTITION BY event_type
                                      ORDER BY value) AS rn
            FROM events WHERE value IS NOT NULL)
        WHERE rn = k
    """,
    category="extension: distributed selection (exact median)",
    doc="EXACT median (lower-middle k-th smallest, k=(n+1)//2) per "
        "event_type WITHOUT a global sort — the two-pass selection "
        "algorithm: pass 1 builds a fixed 1024-bin histogram per group "
        "(one partial-agg shuffle) and the driver walks cumulative "
        "counts to find each group's median bin (only |groups|×bins "
        "cells leave the executors); pass 2 filters to the median bins "
        "(a map-side predicate that discards ~99.9% of rows) and ranks "
        "only the survivors inside each group.  The oracle sorts "
        "everything — the naive plan — so parity proves the narrowing "
        "is lossless, ties included (rank k BY VALUE: equal values make "
        "rank selection ambiguous row-wise but the emitted VALUE is "
        "identical).  At 100 TB a group's bin can still be large; the "
        "narrowing recurses (each pass shrinks the candidate set ~3 "
        "orders of magnitude), documented here with one level because "
        "the fixtures' bins fit a single rank pass.  Bin edges derive "
        "from exact min/max doubles; bin index is one subtraction, one "
        "division, one floor — identical IEEE ops both engines would "
        "compute, but only the ENGINE needs them (the oracle never "
        "bins), so cross-engine float identity is not even in play.",
)
def exact_median_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = (load_table(spark, sf_dir, "events")
          .filter(F.col("value").isNotNull())
          .select("event_type", "value"))
    # pass 0: per-group extent + count (one partial-agg shuffle)
    ext = {r["event_type"]: r for r in
           ev.groupBy("event_type")
           .agg(F.min("value").alias("lo"), F.max("value").alias("hi"),
                F.count("*").alias("n")).collect()}
    # pass 1: fixed histogram per group; driver walks cumulative counts
    def bin_of(t):
        lo, hi = ext[t]["lo"], ext[t]["hi"]
        w = (hi - lo) / MEDIAN_BINS or 1.0
        return F.least(F.floor((F.col("value") - F.lit(lo)) / F.lit(w)),
                       F.lit(MEDIAN_BINS - 1)).cast("long")
    binned = ev.withColumn("bin", F.coalesce(*[
        F.when(F.col("event_type") == t, bin_of(t)) for t in ext]))
    hist = {(r["event_type"], r["bin"]): r["cnt"] for r in
            binned.groupBy("event_type", "bin")
            .agg(F.count("*").alias("cnt")).collect()}
    target = {}          # type -> (median_bin, rank_within_bin)
    for t, info in ext.items():
        k = (info["n"] + 1) // 2
        cum = 0
        for b in range(MEDIAN_BINS):
            c = hist.get((t, b), 0)
            if cum + c >= k:
                target[t] = (b, k - cum)
                break
            cum += c
    # pass 2: rank only the rows inside each group's median bin
    from pyspark.sql import Window as W
    in_bin = F.coalesce(*[
        F.when(F.col("event_type") == t, F.col("bin") == target[t][0])
        for t in ext])
    k_in = F.coalesce(*[
        F.when(F.col("event_type") == t, F.lit(target[t][1]))
        for t in ext])
    survivors = binned.filter(in_bin)
    ranked = survivors.withColumn(
        "rn", F.row_number().over(
            W.partitionBy("event_type").orderBy("value")))
    return (ranked.filter(F.col("rn") == k_in)
            .select("event_type",
                    F.coalesce(*[
                        F.when(F.col("event_type") == t,
                               F.lit(ext[t]["n"]))
                        for t in ext]).alias("n"),
                    F.coalesce(*[
                        F.when(F.col("event_type") == t,
                               F.lit((ext[t]["n"] + 1) // 2))
                        for t in ext]).alias("k"),
                    F.col("value").alias("median_value")))


# ---------------------------------------------------------------------------
# sketch_bloom_filter — portable Bloom membership with the no-FN guarantee
# ---------------------------------------------------------------------------

_BLOOM_POS_LIST = ", ".join(
    _sk.sql_bloom_pos("user_id", j) for j in range(_sk.BLOOM_K))
_BPW = _sk.BLOOM_BITS_PER_WORD


BLOOM_FILTER_ORACLE = f"""
        WITH mem AS (
            SELECT DISTINCT user_id FROM events
            WHERE event_type = 'purchase'),
        mp AS (SELECT user_id, unnest([{_BLOOM_POS_LIST}]) AS p
               FROM mem),
        words AS (
            SELECT p // {_BPW} AS word,
                   CAST(bit_or(CAST(1 AS BIGINT)
                               << CAST(p % {_BPW} AS INTEGER)) AS BIGINT)
                       AS bits
            FROM mp GROUP BY p // {_BPW}),
        probes AS (
            SELECT user_id, true AS is_member FROM mem
            UNION ALL
            SELECT user_id + 1000000, false FROM mem),
        pp AS (SELECT user_id, is_member,
                      unnest([{_BLOOM_POS_LIST}]) AS p
               FROM probes),
        hits AS (
            SELECT pp.user_id, pp.is_member,
                   SUM(CASE WHEN (w.bits & (CAST(1 AS BIGINT)
                           << CAST(pp.p % {_BPW} AS INTEGER))) <> 0
                       THEN 1 ELSE 0 END) = {_sk.BLOOM_K} AS hit
            FROM pp LEFT JOIN words w ON w.word = pp.p // {_BPW}
            GROUP BY pp.user_id, pp.is_member),
        wstats AS (
            SELECT CAST(SUM(bit_count(bits)) AS BIGINT) AS n_bits_set
            FROM words)
        SELECT (SELECT COUNT(*) FROM mem) AS n_members,
               n_bits_set,
               (SELECT bool_and(hit) FROM hits WHERE is_member)
                   AS no_false_negatives,
               (SELECT COUNT(*) FROM hits WHERE NOT is_member)
                   AS n_nonmember_probes,
               (SELECT CAST(SUM(CASE WHEN hit THEN 1 ELSE 0 END)
                            AS BIGINT)
                FROM hits WHERE NOT is_member) AS n_false_positives,
               ROUND((SELECT CAST(SUM(CASE WHEN hit THEN 1 ELSE 0 END)
                                  AS DOUBLE)
                      FROM hits WHERE NOT is_member)
                     / (SELECT CAST(COUNT(*) AS DOUBLE)
                        FROM hits WHERE NOT is_member), 6) AS fpr,
               (SELECT CAST(SUM(CASE WHEN hit THEN 1 ELSE 0 END)
                            AS DOUBLE)
                FROM hits WHERE NOT is_member)
                   / (SELECT CAST(COUNT(*) AS DOUBLE)
                      FROM hits WHERE NOT is_member) <= 0.01 AS fpr_ok
        FROM wstats
    """


def bloom_membership_report(filt, mem) -> DataFrame:
    """Shared tail of sketch_bloom_filter and stream_bloom_filter:
    probe every member (no-FN guarantee) plus an equal-sized
    guaranteed-non-member set, emit the measured-FPR audit row.  ONE
    implementation so the two queries cannot drift from the shared
    oracle."""
    probes = mem.withColumn("is_member", F.lit(True)).unionByName(
        mem.select((F.col("user_id") + 1000000).alias("user_id"))
        .withColumn("is_member", F.lit(False)))
    hits = _sk.bloom_probe(probes, "user_id", filt,
                           ["user_id", "is_member"])
    n_mem = mem.agg(F.count("*").alias("n_members"))
    wstats = filt.agg(F.sum(F.bit_count("bits")).cast("long")
                      .alias("n_bits_set"))
    agg = hits.agg(
        F.bool_and(F.when(F.col("is_member"), F.col("hit")))
        .alias("no_false_negatives"),
        F.sum(F.when(~F.col("is_member"), 1).otherwise(0)).cast("long")
        .alias("n_nonmember_probes"),
        F.sum(F.when(~F.col("is_member") & F.col("hit"), 1)
              .otherwise(0)).cast("long").alias("n_false_positives"))
    fpr_raw = (F.col("n_false_positives").cast("double")
               / F.col("n_nonmember_probes").cast("double"))
    return (n_mem.crossJoin(F.broadcast(wstats))
            .crossJoin(F.broadcast(agg))
            .select("n_members", "n_bits_set", "no_false_negatives",
                    "n_nonmember_probes", "n_false_positives",
                    F.round(fpr_raw, 6).alias("fpr"),
                    (fpr_raw <= 0.01).alias("fpr_ok")))


@query(
    "sketch_bloom_filter",
    oracle=BLOOM_FILTER_ORACLE,
    category="extension: mergeable sketches (Bloom membership)",
    doc="Portable Bloom filter (k=6 salted md5-prefix hashes over "
        "253,952 bits packed 62-per-int64 — DuckDB's << rejects the "
        "sign bit, so both engines stay in defined-behavior territory): "
        "purchase-user membership, probed with every member (the "
        "NO-FALSE-NEGATIVES structural guarantee, emitted as a boolean "
        "the oracle pins) and an equal-sized guaranteed-non-member set "
        "(ids shifted out of domain) for a measured false-positive "
        "rate, gated at 1% (theory ≈0.06% at sf1 occupancy).  The "
        "packed words value-hash exactly via the set-bit count.  "
        "Scale: bit masks partial-aggregate by bit_or (≤4096 words per "
        "task cross the wire); the filter broadcasts to probes at any "
        "corpus size; two filters merge by bit_or — the semi-join-"
        "reduction sketch (ship the filter, not the set) that cuts "
        "shuffle before an expensive join.",
)
def sketch_bloom_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    mem = (ev.filter(F.col("event_type") == "purchase")
           .select("user_id").distinct())
    return bloom_membership_report(_sk.bloom_build(mem, "user_id"), mem)


# ---------------------------------------------------------------------------
# events_cep_sequence — 3-step strict-order pattern match without joins
# ---------------------------------------------------------------------------

CEP_STEP_US = 6 * 3600 * 1_000_000    # 6 hours, in microseconds
#   (per-user inter-event gaps in the fixture average ~1 h; a 30-min
#    step made the pattern near-vacuous — 0 matches below sf0.1)


# Shared by events_cep_sequence and the streaming variant
# (streaming_queries.stream_cep_sequence) so the two oracles can't drift.
CEP_ORACLE = f"""
        WITH t AS (
            SELECT user_id, event_type, ts, epoch_us(ts) AS us
            FROM events),
        s1 AS (
            SELECT user_id, event_type, ts, us,
                   MAX(CASE WHEN event_type = 'view' THEN us END)
                       OVER w AS last_view_us
            FROM t
            WINDOW w AS (PARTITION BY user_id ORDER BY us
                         RANGE BETWEEN {CEP_STEP_US} PRECEDING
                         AND CURRENT ROW)),
        s2 AS (
            SELECT user_id, event_type, ts, us,
                   MAX(CASE WHEN event_type = 'click'
                            AND last_view_us < us THEN us END)
                       OVER w AS last_qclick_us
            FROM s1
            WINDOW w AS (PARTITION BY user_id ORDER BY us
                         RANGE BETWEEN {CEP_STEP_US} PRECEDING
                         AND CURRENT ROW))
        SELECT user_id,
               MIN(ts) AS first_match_ts,
               COUNT(*) AS n_matches
        FROM s2
        WHERE event_type = 'purchase' AND last_qclick_us < us
        GROUP BY user_id
    """


@query(
    "events_cep_sequence",
    oracle=CEP_ORACLE,
    category="extension: CEP sequence pattern (view→click→purchase)",
    doc="MATCH_RECOGNIZE-style strict-sequence pattern: purchases "
        "preceded by a click within 6 hours that was itself preceded "
        "by a view within 6 hours, per user — the 3-step CEP match "
        "FlinkCEP expresses with Pattern.begin/followedBy/within, here "
        "as TWO stacked range-frame window passes and ZERO joins: pass "
        "1 attaches each row's latest in-window view, pass 2 attaches "
        "the latest in-window QUALIFIED click, and a plain filter reads "
        "off matched purchases.  Strict ordering via < on epoch "
        "microseconds (both engines window over the same integer "
        "column, so frame membership is exact — a seconds cast would "
        "silently disagree with an interval frame on sub-second "
        "timestamps).  All comparisons are integer max/min: no floats "
        "anywhere.  Scale: both windows share one (user, us) sort — a "
        "single Exchange — and state per row is two longs; contrast "
        "with the naive triple self-join, which explodes on active "
        "users.",
)
def events_cep_sequence(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", F.unix_micros("ts").alias("us"))
    w = (W.partitionBy("user_id").orderBy("us")
         .rangeBetween(-CEP_STEP_US, 0))
    s1 = ev.withColumn(
        "last_view_us",
        F.max(F.when(F.col("event_type") == "view", F.col("us")))
        .over(w))
    s2 = s1.withColumn(
        "last_qclick_us",
        F.max(F.when((F.col("event_type") == "click")
                     & (F.col("last_view_us") < F.col("us")),
                     F.col("us"))).over(w))
    return (s2.filter((F.col("event_type") == "purchase")
                      & (F.col("last_qclick_us") < F.col("us")))
            .groupBy("user_id")
            .agg(F.min("ts").alias("first_match_ts"),
                 F.count("*").alias("n_matches")))


# ---------------------------------------------------------------------------
# join_bloom_prefiltered — the Bloom sketch applied as semi-join reduction
# ---------------------------------------------------------------------------

BLOOM_JOIN_BAL = 9000.0          # high-balance customer threshold


@query(
    "join_bloom_prefiltered",
    oracle=f"""
        SELECT o.o_orderpriority,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(ROUND(o.o_totalprice * 100, 0) AS BIGINT))
                    AS BIGINT) AS price_units
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        WHERE c.c_acctbal > {BLOOM_JOIN_BAL!r}
        GROUP BY o.o_orderpriority
    """,
    category="extension: bloom-prefiltered join (semi-join reduction)",
    doc="The Bloom sketch APPLIED: orders of high-balance customers, "
        "aggregated per priority.  The fact side is pre-filtered through "
        "a Bloom filter built over the qualifying customer keys BEFORE "
        "the exact join — the ship-the-filter-not-the-set reduction a "
        "100 TB engine uses when the dimension's key set is too large to "
        "broadcast but its bitset is not (here ~31 KB versus the key "
        "list; at a billion keys the ratio is what saves the shuffle).  "
        "LOSSLESS by construction: the filter has no false negatives, "
        "so no qualifying order is dropped, and its false positives are "
        "eliminated by the exact join that follows — the oracle is the "
        "PLAIN join, so parity proves the reduction changes nothing.  "
        "Price sum in fixed-point units (exact.py policy).",
)
def join_bloom_prefiltered(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = (load_table(spark, sf_dir, "customer")
            .filter(F.col("c_acctbal") > BLOOM_JOIN_BAL)
            .select("c_custkey"))
    filt = _sk.bloom_build(cust, "c_custkey")
    orders = load_table(spark, sf_dir, "orders")
    hits = _sk.bloom_probe(orders.select("o_orderkey", "o_custkey"),
                           "o_custkey", filt, ["o_orderkey"])
    pruned = (orders.join(hits.filter(F.col("hit")), "o_orderkey")
              .select("o_orderkey", "o_custkey", "o_orderpriority",
                      "o_totalprice"))
    exact = pruned.join(cust,
                        pruned.o_custkey == cust.c_custkey)
    return (exact.groupBy("o_orderpriority")
            .agg(F.count("*").alias("n_orders"),
                 F.sum(F.round(F.col("o_totalprice") * 100, 0)
                       .cast("long")).cast("long").alias("price_units")))


# ---------------------------------------------------------------------------
# exact_quantiles_selection — ALL quantiles from one histogram + one rank pass
# ---------------------------------------------------------------------------

SELECTION_PCTS = (25, 50, 75, 95, 99)


@query(
    "exact_quantiles_selection",
    oracle=f"""
        WITH ranked AS (
            SELECT event_type, value,
                   ROW_NUMBER() OVER (PARTITION BY event_type
                                      ORDER BY value) AS rn,
                   COUNT(*) OVER (PARTITION BY event_type) AS n
            FROM events WHERE value IS NOT NULL),
        tgt AS (
            SELECT event_type, n, p,
                   greatest(CAST(ceil(p * n / 100.0) AS BIGINT), 1) AS k
            FROM (SELECT DISTINCT event_type, n FROM ranked)
            CROSS JOIN (SELECT unnest([{", ".join(
                str(p) for p in SELECTION_PCTS)}]) AS p))
        SELECT t.event_type, t.p, t.n, t.k,
               r.value AS quantile_value
        FROM tgt t JOIN ranked r
          ON r.event_type = t.event_type AND r.rn = t.k
    """,
    category="extension: distributed selection (all quantiles, one scan)",
    doc="EXACT p25/p50/p75/p95/p99 per event_type (k-th smallest, "
        "k = max(ceil(p·n/100), 1)) — the generalization of "
        "exact_median_selection that amortizes ONE histogram over every "
        "requested quantile: pass 1 builds the per-group 1024-bin "
        "histogram once; the driver walks cumulative counts to place "
        "ALL five ranks in their bins (a (type, bin, k-within-bin, p) "
        "target list of ≤ |groups|·|ps| rows); pass 2 filters to the "
        "union of target bins and ranks each once per (type, bin), "
        "serving every quantile that landed in that bin from the same "
        "sort.  The oracle sorts everything per group — parity proves "
        "the narrowing exact for every percentile including the p99 "
        "tail.  Adding more quantiles costs nothing but target rows: "
        "the expensive passes stay TWO scans regardless.",
)
def exact_quantiles_selection(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    import math
    ev = (load_table(spark, sf_dir, "events")
          .filter(F.col("value").isNotNull())
          .select("event_type", "value"))
    ext = {r["event_type"]: r for r in
           ev.groupBy("event_type")
           .agg(F.min("value").alias("lo"), F.max("value").alias("hi"),
                F.count("*").alias("n")).collect()}

    def bin_of(t):
        lo, hi = ext[t]["lo"], ext[t]["hi"]
        w = (hi - lo) / MEDIAN_BINS or 1.0
        return F.least(F.floor((F.col("value") - F.lit(lo)) / F.lit(w)),
                       F.lit(MEDIAN_BINS - 1)).cast("long")

    binned = ev.withColumn("bin", F.coalesce(*[
        F.when(F.col("event_type") == t, bin_of(t)) for t in ext]))
    hist = {(r["event_type"], r["bin"]): r["cnt"] for r in
            binned.groupBy("event_type", "bin")
            .agg(F.count("*").alias("cnt")).collect()}
    # place every (type, p) rank in its bin from ONE cumulative walk
    targets = []          # (type, bin, k_within_bin, p, n, k)
    for t, info in ext.items():
        n = info["n"]
        ks = {p: max(math.ceil(p * n / 100.0), 1)
              for p in SELECTION_PCTS}
        cum = 0
        pending = sorted(ks.items(), key=lambda kv: kv[1])
        i = 0
        for b in range(MEDIAN_BINS):
            c = hist.get((t, b), 0)
            while i < len(pending) and cum + c >= pending[i][1]:
                p, k = pending[i]
                targets.append((t, b, k - cum, p, n, k))
                i += 1
            cum += c
            if i == len(pending):
                break
    tgt = F.broadcast(spark.createDataFrame(
        targets, "event_type string, bin long, k_in long, p int, "
                 "n long, k long"))
    from pyspark.sql import Window as W
    survivors = binned.join(
        tgt.select("event_type", "bin").distinct(),
        ["event_type", "bin"])
    ranked = survivors.withColumn(
        "rn", F.row_number().over(
            W.partitionBy("event_type", "bin").orderBy("value")))
    return (ranked.join(tgt, ["event_type", "bin"])
            .filter(F.col("rn") == F.col("k_in"))
            .select("event_type", "p", "n", "k",
                    F.col("value").alias("quantile_value")))


# ---------------------------------------------------------------------------
# events_attribution — last-touch marketing attribution
# ---------------------------------------------------------------------------

ATTR_TOUCH_TYPES = ("click", "view")   # attributable touch events
ATTR_WINDOW_US = 86_400 * 1_000_000    # 24 h lookback, microseconds

_ATTR_TOUCH_SQL = ", ".join(f"'{t}'" for t in ATTR_TOUCH_TYPES)

# Shared by events_attribution, events_attribution_skewsafe and the
# streaming variant (streaming_queries.stream_attribution) so the oracles
# can't drift; every constant is interpolated from the same source.
ATTRIBUTION_ORACLE = f"""
        WITH seq AS (
            SELECT event_id, user_id, ts, event_type,
                   last_value(CASE WHEN event_type IN ({_ATTR_TOUCH_SQL})
                                   THEN epoch_us(ts) END IGNORE NULLS)
                       OVER w AS touch_us,
                   last_value(CASE WHEN event_type IN ({_ATTR_TOUCH_SQL})
                                   THEN event_type END IGNORE NULLS)
                       OVER w AS touch_raw
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        )
        SELECT event_id, user_id, ts,
               CASE WHEN touch_us IS NOT NULL
                         AND epoch_us(ts) - touch_us <= {ATTR_WINDOW_US}
                    THEN touch_raw ELSE 'direct' END AS touch_type,
               CASE WHEN touch_us IS NOT NULL
                         AND epoch_us(ts) - touch_us <= {ATTR_WINDOW_US}
                    THEN epoch_us(ts) - touch_us END AS delay_us
        FROM seq WHERE event_type = 'purchase'
    """


@query(
    "events_attribution",
    oracle=ATTRIBUTION_ORACLE,
    category="extension: funnel / sequence analytics (attribution)",
    doc="Last-touch conversion attribution: every purchase is credited "
        "to the most recent click/view by the same user within a 24 h "
        "lookback, else 'direct' — the product-analytics revenue- "
        "attribution staple. One window over (user_id, ts, event_id): "
        "both last_value(... IGNORE NULLS) expressions share the same "
        "frame, so Catalyst plans a single Window node over one shuffle "
        "on user_id — no self-join, no per-user iteration. The (ts, "
        "event_id) order key makes same-timestamp ties deterministic on "
        "both engines; delays are exact integer microseconds "
        "(unix_micros / epoch_us), so no float enters the comparison. "
        "Scale: per-user event sequences are bounded; the plan is one "
        "hash exchange + sort regardless of corpus size.",
)
def events_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = (Window.partitionBy("user_id").orderBy("ts", "event_id")
         .rowsBetween(Window.unboundedPreceding, -1))
    is_touch = F.col("event_type").isin(*ATTR_TOUCH_TYPES)
    seq = ev.select(
        "event_id", "user_id", "ts", "event_type",
        F.last(F.when(is_touch, F.unix_micros("ts")), ignorenulls=True)
        .over(w).alias("touch_us"),
        F.last(F.when(is_touch, F.col("event_type")), ignorenulls=True)
        .over(w).alias("touch_raw"))
    delay = F.unix_micros("ts") - F.col("touch_us")
    in_win = F.col("touch_us").isNotNull() & (delay <= ATTR_WINDOW_US)
    return (seq.filter(F.col("event_type") == "purchase")
            .select("event_id", "user_id", "ts",
                    F.when(in_win, F.col("touch_raw")).otherwise("direct")
                    .alias("touch_type"),
                    F.when(in_win, delay).alias("delay_us")))


# ---------------------------------------------------------------------------
# stats_category_lift — association lift between two categoricals
# ---------------------------------------------------------------------------


@query(
    "stats_category_lift",
    oracle="""
        WITH pc AS (
            SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n_xy
            FROM orders GROUP BY o_orderpriority, o_orderstatus)
        SELECT o_orderpriority, o_orderstatus, n_xy,
               CAST(SUM(n_xy) OVER (PARTITION BY o_orderpriority)
                    AS BIGINT) AS n_x,
               CAST(SUM(n_xy) OVER (PARTITION BY o_orderstatus)
                    AS BIGINT) AS n_y,
               CAST(SUM(n_xy) OVER () AS BIGINT) AS n_total,
               CAST(n_xy * CAST(SUM(n_xy) OVER () AS BIGINT) AS DOUBLE)
                   / (CAST(SUM(n_xy) OVER (PARTITION BY o_orderpriority)
                           AS BIGINT)
                      * CAST(SUM(n_xy) OVER (PARTITION BY o_orderstatus)
                             AS BIGINT)) AS lift
        FROM pc
    """,
    category="extension: statistics (categorical association)",
    doc="Association lift matrix between two categorical columns "
        "(order priority x order status): lift = P(x,y)/(P(x)P(y)) "
        "computed as n_xy*N / (n_x*n_y) — the market-basket / feature- "
        "correlation screen, the ratio form of pointwise mutual "
        "information (log-free so the division of exact int64 counts is "
        "the ONLY float op, bit-deterministic across engines; ln() "
        "would not be). Scale: the fact table collapses to a "
        "|X|x|Y|-cardinality frame in one partial-aggregated shuffle; "
        "the marginal/global window sums then run over that tiny frame, "
        "so the single-task global window is bounded by category "
        "cardinality, never by data size (same justification as "
        "orders_pareto_share).",
)
def stats_category_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = load_table(spark, sf_dir, "orders")
    pc = (od.groupBy("o_orderpriority", "o_orderstatus")
          .agg(F.count("*").alias("n_xy")))
    wx = Window.partitionBy("o_orderpriority")
    wy = Window.partitionBy("o_orderstatus")
    wall = Window.partitionBy()
    r = pc.select(
        "o_orderpriority", "o_orderstatus", "n_xy",
        F.sum("n_xy").over(wx).alias("n_x"),
        F.sum("n_xy").over(wy).alias("n_y"),
        F.sum("n_xy").over(wall).alias("n_total"))
    return r.select(
        "o_orderpriority", "o_orderstatus", "n_xy", "n_x", "n_y", "n_total",
        ((F.col("n_xy") * F.col("n_total")).cast("double")
         / (F.col("n_x") * F.col("n_y"))).alias("lift"))


# ---------------------------------------------------------------------------
# events_top_paths — session path analysis (top-k event-type sequences)
# ---------------------------------------------------------------------------

PATH_GAP_US = 30 * 60 * 1_000_000   # 30-min inactivity gap (sessionize)
PATH_LEN = 5                        # path prefix length
PATH_TOPK = 20                      # top-k paths reported


@query(
    "events_top_paths",
    oracle=f"""
        WITH m AS (
            SELECT user_id, ts, event_id, event_type,
                   CASE WHEN lag(ts) OVER w IS NULL
                             OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
                                > {PATH_GAP_US}
                        THEN 1 ELSE 0 END AS brk
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        s AS (
            SELECT user_id, ts, event_id, event_type,
                   SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS UNBOUNDED PRECEDING) AS sid
            FROM m),
        p AS (
            SELECT user_id, sid,
                   array_to_string(
                       list(event_type ORDER BY ts, event_id)[1:{PATH_LEN}],
                       '>') AS path
            FROM s GROUP BY user_id, sid)
        SELECT path, COUNT(*) AS n_sessions
        FROM p GROUP BY path
        ORDER BY n_sessions DESC, path LIMIT {PATH_TOPK}
    """,
    category="extension: funnel / sequence analytics (path analysis)",
    doc="Top-20 session paths: gap-sessionize (30-min inactivity, same "
        "semantics as events_sessionize), build each session's first-5 "
        "event-type sequence, count sessions per path — the user-flow / "
        "Sankey primitive (ClickHouse sequenceMatch territory). The "
        "sequence is collected per session and array_sort'ed on the "
        "total order struct(ts, event_id, type), so same-timestamp ties "
        "cannot reorder the path on either engine; top-k orders by "
        "(count DESC, path) so the cut is tie-stable. Scale: one "
        "user_id window pass, one (user, session) partial agg over "
        "bounded per-session arrays, then a TakeOrdered over the "
        "path-cardinality frame — no global sort of the data.",
)
def events_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("ts").over(w)
    brk = F.when(
        prev.isNull()
        | ((F.unix_micros(F.col("ts")) - F.unix_micros(prev))
           > PATH_GAP_US), 1).otherwise(0)
    marked = ev.select("user_id", "ts", "event_id", "event_type",
                       brk.alias("brk"))
    sess = marked.withColumn(
        "sid", F.sum("brk").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    paths = (sess.groupBy("user_id", "sid")
             .agg(F.array_sort(
                 F.collect_list(F.struct("ts", "event_id", "event_type")))
                 .alias("evs"))
             .select(F.concat_ws(
                 ">", F.slice(F.transform(
                     "evs", lambda x: x["event_type"]), 1, PATH_LEN))
                 .alias("path")))
    return (paths.groupBy("path").agg(F.count("*").alias("n_sessions"))
            .orderBy(F.desc("n_sessions"), "path").limit(PATH_TOPK))


# ---------------------------------------------------------------------------
# events_attribution_skewsafe — two-phase sliced last-touch attribution
# ---------------------------------------------------------------------------

ATTR_SLICE_US = ATTR_WINDOW_US   # slice width; any width is correct


@query(
    "events_attribution_skewsafe",
    oracle=ATTRIBUTION_ORACLE,   # identical semantics, skew-safe plan
    category="extension: funnel / sequence analytics (attribution)",
    doc="Last-touch attribution with a SKEW-SAFE two-phase plan (same "
        "oracle as events_attribution — the answers are provably "
        "identical): phase 1 windows within (user, 24 h time slice), so "
        "no task ever holds more than one slice of one user — a "
        "celebrity user with 10^8 events splits across slices instead "
        "of pinning one task (the same discipline as "
        "join_asof_skew_split). Phase 2 carries the last touch across "
        "slice boundaries with an IGNORE-NULLS window over the tiny "
        "per-(user, slice) summary frame, and each purchase takes "
        "coalesce(in-slice touch, carried touch). Correctness does not "
        "depend on the slice width: the carried touch is the most "
        "recent across ALL earlier slices, and the 24 h window check "
        "drops it if stale. Touch selection keys on struct(us, "
        "event_id) so same-microsecond ties resolve by the same total "
        "order as the single-window form on both engines.",
)
def events_attribution_skewsafe(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "event_type",
        F.unix_micros("ts").alias("us"))
    ev = ev.withColumn("slice", F.expr(f"us div {ATTR_SLICE_US}"))
    is_touch = F.col("event_type").isin(*ATTR_TOUCH_TYPES)

    # phase 1: within-slice last touch strictly before each row
    w_in = (Window.partitionBy("user_id", "slice")
            .orderBy("us", "event_id")
            .rowsBetween(Window.unboundedPreceding, -1))
    touch_struct = F.when(
        is_touch, F.struct("us", "event_id", "event_type"))
    sliced = ev.withColumn(
        "t_in", F.last(touch_struct, ignorenulls=True).over(w_in))

    # phase 2: per-(user, slice) last-touch summary, carried forward with
    # an ignore-nulls window over the slice-cardinality frame
    summ = (ev.filter(is_touch)
            .groupBy("user_id", "slice")
            .agg(F.max(F.struct("us", "event_id", "event_type"))
                 .alias("t_last")))
    slices = ev.select("user_id", "slice").distinct()
    w_sl = (Window.partitionBy("user_id").orderBy("slice")
            .rowsBetween(Window.unboundedPreceding, -1))
    carry = (slices.join(summ, ["user_id", "slice"], "left")
             .select("user_id", "slice",
                     F.last("t_last", ignorenulls=True).over(w_sl)
                     .alias("t_prev")))

    att = (sliced.filter(F.col("event_type") == "purchase")
           .join(carry, ["user_id", "slice"], "left"))
    eff = F.coalesce(F.col("t_in"), F.col("t_prev"))
    delay = F.col("us") - eff["us"]
    in_win = eff.isNotNull() & (delay <= ATTR_WINDOW_US)
    return att.select(
        "event_id", "user_id", "ts",
        F.when(in_win, eff["event_type"]).otherwise("direct")
        .alias("touch_type"),
        F.when(in_win, delay).alias("delay_us"))


# ---------------------------------------------------------------------------
# sql_recursive_hierarchy — SQL surface: WITH RECURSIVE (Spark 4 native)
# ---------------------------------------------------------------------------

_REC_HIER_SQL = """
    WITH RECURSIVE anc AS (
        SELECT c_custkey AS node, c_custkey AS cur, 0 AS depth
        FROM {table}
      UNION ALL
        SELECT node, CAST(floor(cur / 2) AS BIGINT) AS cur,
               depth + 1 AS depth
        FROM anc WHERE cur > 1
    )
    SELECT depth AS depth_to_root,
           COUNT(*) AS n_customers,
           MIN(node) AS min_key, MAX(node) AS max_key
    FROM anc WHERE cur = 1
    GROUP BY depth
"""


@query(
    "sql_recursive_hierarchy",
    oracle=_REC_HIER_SQL.format(table="customer"),
    category="extension: SQL surface (recursive CTE)",
    doc="Depth histogram of the binary ancestor chain parent(k) = "
        "floor(k/2) over customer keys. The ORACLE keeps the WITH "
        "RECURSIVE walk verbatim; the engine computes the provably "
        "identical aggregate fold (round-10, guide §2.4 — the Spark 4 "
        "native recursion executed one UnionLoop job per level, ~15 "
        "scheduler round-trips of pure overhead at any SF, the same "
        "disease the round-9 Holt fold cured): halving a key k >= 1 "
        "reaches 1 after exactly floor(log2(k)) steps, so each key "
        "contributes one row at depth_to_root = floor(log2(k)), computed "
        "EXACTLY as its binary digit count minus one (conv base-2; no "
        "fp log). One scan + one partial-aggregated exchange. "
        "Equivalence is pinned by the unchanged recursive oracle and by "
        "tests/test_properties.py's closed-form depth check.",
)
def sql_recursive_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    # binary digit count - 1 == floor(log2(k)), exact for any int64 >= 1
    depth = (F.length(F.conv(F.col("c_custkey").cast("string"),
                             10, 2)) - 1).cast("int")
    # cur > 1 is the recursion's continuation guard: keys < 1 never reach
    # the root and are absent from the oracle result (customer keys are
    # >= 1; the filter pins the semantics, it does not drop fixture rows)
    return (cust.filter(F.col("c_custkey") >= 1)
            .groupBy(depth.alias("depth_to_root"))
            .agg(F.count("*").alias("n_customers"),
                 F.min("c_custkey").alias("min_key"),
                 F.max("c_custkey").alias("max_key")))


# ---------------------------------------------------------------------------
# geo_nearest_warehouse — geospatial nearest-neighbor via broadcast argmin
# ---------------------------------------------------------------------------

GEO_RAD = 0.017453292519943295      # pi/180, shared literal on both engines
GEO_R_KM = 6371.0


def _geo_sql() -> str:
    hav = (f"2.0 * {GEO_R_KM!r} * asin(sqrt("
           f"sin((wlat - clat) * {GEO_RAD!r} / 2.0)"
           f" * sin((wlat - clat) * {GEO_RAD!r} / 2.0)"
           f" + cos(clat * {GEO_RAD!r}) * cos(wlat * {GEO_RAD!r})"
           f" * sin((wlon - clon) * {GEO_RAD!r} / 2.0)"
           f" * sin((wlon - clon) * {GEO_RAD!r} / 2.0)))")
    return f"""
        WITH w AS (
            SELECT n_nationkey AS wkey,
                   CAST((n_nationkey * 7) % 140 AS DOUBLE) - 70.0 + 0.5
                       AS wlat,
                   CAST((n_nationkey * 137) % 360 AS DOUBLE) - 180.0 + 0.5
                       AS wlon
            FROM nation),
        c AS (
            SELECT c_custkey,
                   CAST((c_custkey * 37) % 16000 AS DOUBLE) / 100.0 - 80.0
                       AS clat,
                   CAST((c_custkey * 73) % 36000 AS DOUBLE) / 100.0 - 180.0
                       AS clon
            FROM customer),
        d AS (
            SELECT c_custkey, wkey, {hav} AS dist
            FROM c CROSS JOIN w),
        e AS (
            SELECT c_custkey,
                   {sql_units('dist', 1000)} * 100 + wkey AS enc
            FROM d)
        SELECT c_custkey,
               CAST(MIN(enc) % 100 AS BIGINT) AS warehouse,
               CAST(floor(CAST(MIN(enc) AS DOUBLE) / 100.0) AS BIGINT)
                   AS dist_m
        FROM e GROUP BY c_custkey
    """


@query(
    "geo_nearest_warehouse",
    oracle=_geo_sql(),
    category="extension: geospatial nearest-neighbor",
    doc="Nearest-warehouse assignment by great-circle distance: 25 "
        "warehouse sites (deterministic coordinates derived from nation "
        "keys) against per-customer coordinates (derived from customer "
        "keys), haversine in km, each customer labeled with the closest "
        "site. The geo shape every logistics/alerting stack needs. "
        "Determinism: sin/cos/asin differ by ulps between Java Math and "
        "libm, so the distance lands on a 1-METER integer grid before "
        "the argmin (flip risk ~1e-12 per pair, the repo's rounding "
        "convention); the argmin itself is MIN over a single encoded "
        "int64 (dist_m*100 + site), so ties break identically on both "
        "engines with ONE partial-aggregable pass — no rejoin, no "
        "window. Scale: the site table broadcasts (nested-loop against "
        "25 rows), distances are map-side, and the shuffle carries one "
        "partial argmin per customer per task. For site counts beyond "
        "broadcast range, pre-bucket by geohash cell and join on "
        "adjacent cells (the embedding_neardup_pairs grid pattern).",
)
def geo_nearest_warehouse(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("wkey"),
        ((F.col("n_nationkey") * 7 % 140).cast("double") - 70.0 + 0.5)
        .alias("wlat"),
        ((F.col("n_nationkey") * 137 % 360).cast("double") - 180.0 + 0.5)
        .alias("wlon"))
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        ((F.col("c_custkey") * 37 % 16000).cast("double") / 100.0 - 80.0)
        .alias("clat"),
        ((F.col("c_custkey") * 73 % 36000).cast("double") / 100.0 - 180.0)
        .alias("clon"))
    rad = F.lit(GEO_RAD)
    half_dlat = (F.col("wlat") - F.col("clat")) * rad / F.lit(2.0)
    half_dlon = (F.col("wlon") - F.col("clon")) * rad / F.lit(2.0)
    dist = (F.lit(2.0) * F.lit(GEO_R_KM)
            * F.asin(F.sqrt(
                F.sin(half_dlat) * F.sin(half_dlat)
                + F.cos(F.col("clat") * rad) * F.cos(F.col("wlat") * rad)
                * F.sin(half_dlon) * F.sin(half_dlon))))
    d = c.crossJoin(F.broadcast(w)).select(
        "c_custkey",
        (units_col(dist, 1000) * 100 + F.col("wkey")).alias("enc"))
    return (d.groupBy("c_custkey").agg(F.min("enc").alias("me"))
            .select("c_custkey",
                    (F.col("me") % 100).alias("warehouse"),
                    F.floor(F.col("me").cast("double") / F.lit(100.0))
                    .cast("long").alias("dist_m")))


# ---------------------------------------------------------------------------
# exact_weighted_median — quantity-weighted price median per return flag
# ---------------------------------------------------------------------------

WM_BUCKET = 10 ** 6       # cent-unit prefix buckets (10k currency bands)


@query(
    "exact_weighted_median",
    oracle=f"""
        WITH v AS (
            SELECT l_returnflag AS flag,
                   {sql_units('l_extendedprice', 100)} AS u,
                   CAST(SUM({sql_units('l_quantity', 1)}) AS BIGINT) AS w
            FROM lineitem
            GROUP BY 1, 2),
        c AS (
            SELECT flag, u, w,
                   CAST(SUM(w) OVER (PARTITION BY flag ORDER BY u
                       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
                   CAST(SUM(w) OVER (PARTITION BY flag) AS BIGINT) AS tot
            FROM v)
        SELECT flag, tot AS total_weight,
               CAST(MIN(u) AS BIGINT) AS median_u,
               CAST(MIN(u) AS BIGINT) / CAST(100 AS DOUBLE)
                   AS weighted_median
        FROM c WHERE 2 * cum >= tot
        GROUP BY flag, tot
    """,
    category="extension: distributed selection (weighted median)",
    doc="EXACT quantity-weighted median of extended price per return "
        "flag: the smallest price whose cumulative quantity weight "
        "reaches half the group total — the inventory-weighted 'typical "
        "price' that an unweighted median misstates when cheap lines "
        "carry big quantities. Entirely integer: prices in cent units, "
        "quantities exact int64, the qualifying test is 2*cum >= tot "
        "(no halving division), and since cum is monotone in u the "
        "median is MIN(u) over qualifiers — a plain aggregation, no "
        "second window. Scale: one partial-agg shuffle to the distinct "
        "(flag, price) grid, then the cumulative weight is the shared "
        "TWO-PHASE prefix (10k-currency buckets, per-flag offsets on a "
        "bounded frame, wide window partitioned by bucket) — no "
        "per-flag single-partition scan. int64: 2*cum <= 2*n*50 "
        "quantity units, overflow past ~9e16 rows per flag.",
)
def exact_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark import StorageLevel

    li = load_table(spark, sf_dir, "lineitem")
    v = (li.groupBy(F.col("l_returnflag").alias("flag"),
                    units_col("l_extendedprice", 100).alias("u"))
         .agg(F.sum(units_col("l_quantity", 1)).alias("w")))
    from flinkapps_spark.operators.prefix import bucket_offsets

    bucketed = (v.withColumn("bkt", F.floor(F.col("u") / WM_BUCKET))
                .persist(StorageLevel.MEMORY_AND_DISK))
    bucketed.count()
    offs = bucket_offsets(bucketed, "bkt", {"w": "w"},
                          partition_by=("flag",))
    w_in = (Window.partitionBy("flag", "bkt").orderBy("u")
            .rowsBetween(Window.unboundedPreceding, 0))
    cum = (bucketed.join(F.broadcast(offs), ["flag", "bkt"])
           .select("flag", "u", F.col("tot_w").alias("tot"),
                   (F.col("off_w") + F.sum("w").over(w_in)).alias("cum")))
    return (cum.filter(2 * F.col("cum") >= F.col("tot"))
            .groupBy("flag", F.col("tot").alias("total_weight"))
            .agg(F.min("u").alias("median_u"))
            .select("flag", "total_weight", "median_u",
                    (F.col("median_u") / F.lit(100).cast("double"))
                    .alias("weighted_median")))


# ---------------------------------------------------------------------------
# dq_referential_integrity — FK orphan audit across the whole schema
# ---------------------------------------------------------------------------

FK_EDGES = (
    ("lineitem.l_orderkey->orders", "lineitem", "l_orderkey",
     "orders", "o_orderkey"),
    ("lineitem.l_partkey->part", "lineitem", "l_partkey",
     "part", "p_partkey"),
    ("lineitem.l_suppkey->supplier", "lineitem", "l_suppkey",
     "supplier", "s_suppkey"),
    ("orders.o_custkey->customer", "orders", "o_custkey",
     "customer", "c_custkey"),
    ("customer.c_nationkey->nation", "customer", "c_nationkey",
     "nation", "n_nationkey"),
    ("supplier.s_nationkey->nation", "supplier", "s_nationkey",
     "nation", "n_nationkey"),
    ("nation.n_regionkey->region", "nation", "n_regionkey",
     "region", "r_regionkey"),
)


def _ri_oracle() -> str:
    parts = []
    for name, child, fk, parent, pk in FK_EDGES:
        parts.append(f"""
        SELECT '{name}' AS fk_edge,
               CAST(COUNT(*) AS BIGINT) AS n_child,
               CAST(SUM(CASE WHEN p.{pk} IS NULL AND c.{fk} IS NOT NULL
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_orphan,
               CAST(SUM(CASE WHEN c.{fk} IS NULL
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_null_fk
        FROM {child} c
        LEFT JOIN (SELECT DISTINCT {pk} FROM {parent}) p
          ON c.{fk} = p.{pk}""")
    return " UNION ALL ".join(parts)


@query(
    "dq_referential_integrity",
    oracle=_ri_oracle(),
    category="extension: data quality (referential integrity audit)",
    doc="Whole-schema foreign-key audit: for each of the 7 FK edges in "
        "the star schema, the child row count, the orphan count "
        "(non-null FK with no parent), and the null-FK count — the "
        "one-query answer to 'can I trust my joins?' that every "
        "warehouse health check runs. Scale: the THREE lineitem edges "
        "share one scan — part/supplier broadcast onto it and the "
        "orders join shuffles once; a single aggregation emits all "
        "three edges' counts and stack() unpivots them. The remaining "
        "edges broadcast their small parents. Counting via LEFT JOIN + "
        "conditional SUM (not anti-join subtraction) keeps every edge "
        "single-pass over its child. Every parent side joins as a "
        "DISTINCT keys-only projection (ADVICE r5): a duplicated "
        "parent PK — exactly the corruption an RI audit must tolerate "
        "— would otherwise fan child rows out and inflate n_child / "
        "n_orphan for every edge sharing the scan; distinct makes the "
        "audit's own counts immune to the defect it is hunting, and "
        "costs only a keys-only pre-aggregation.",
)
def dq_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the three lineitem edges share ONE scan of the biggest table:
    # three left joins stack onto the same pass, one aggregation emits
    # all three edges' counts, stack() unpivots them to rows
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey")
    # distinct parent-key projections: dup parent PKs must not fan out
    # the shared child scan (see doc) — keys-only, so the distinct is a
    # partial-agg that typically collapses map-side
    od = load_table(spark, sf_dir, "orders").select("o_orderkey").distinct()
    pt = load_table(spark, sf_dir, "part").select("p_partkey").distinct()
    sp = (load_table(spark, sf_dir, "supplier")
          .select("s_suppkey").distinct())
    j = (li.join(od, li["l_orderkey"] == od["o_orderkey"], "left")
         .join(F.broadcast(pt), li["l_partkey"] == pt["p_partkey"], "left")
         .join(F.broadcast(sp), li["l_suppkey"] == sp["s_suppkey"], "left"))

    def edge_counts(fk, pk):
        return (F.sum(F.when(pk.isNull() & fk.isNotNull(), 1)
                      .otherwise(0)),
                F.sum(F.when(fk.isNull(), 1).otherwise(0)))

    o_orph, o_null = edge_counts(li["l_orderkey"], od["o_orderkey"])
    p_orph, p_null = edge_counts(li["l_partkey"], pt["p_partkey"])
    s_orph, s_null = edge_counts(li["l_suppkey"], sp["s_suppkey"])
    one = j.agg(F.count("*").alias("n_child"),
                o_orph.alias("o_orph"), o_null.alias("o_null"),
                p_orph.alias("p_orph"), p_null.alias("p_null"),
                s_orph.alias("s_orph"), s_null.alias("s_null"))
    li_edges = one.select(
        F.expr(
            "stack(3,"
            " 'lineitem.l_orderkey->orders', o_orph, o_null,"
            " 'lineitem.l_partkey->part', p_orph, p_null,"
            " 'lineitem.l_suppkey->supplier', s_orph, s_null)"
            " AS (fk_edge, n_orphan, n_null_fk)"),
        "n_child").select("fk_edge", "n_child", "n_orphan", "n_null_fk")

    out = li_edges
    for name, child, fk, parent, pk in FK_EDGES:
        if child == "lineitem":
            continue
        c = load_table(spark, sf_dir, child).select(F.col(fk))
        p = load_table(spark, sf_dir, parent).select(F.col(pk)).distinct()
        j2 = c.join(p, c[fk] == p[pk], "left")
        agg = j2.agg(
            F.lit(name).alias("fk_edge"),
            F.count("*").alias("n_child"),
            F.sum(F.when(p[pk].isNull() & c[fk].isNotNull(), 1)
                  .otherwise(0)).alias("n_orphan"),
            F.sum(F.when(c[fk].isNull(), 1).otherwise(0))
            .alias("n_null_fk"))
        out = out.unionByName(agg)
    return out


# ---------------------------------------------------------------------------
# events_markov_removal — removal-effect attribution on the Markov chain
# ---------------------------------------------------------------------------

MR_CONV = "purchase"                       # absorbing conversion state
MR_CHANNELS = ("click", "error", "signup", "view")   # removable channels
MR_STATES = MR_CHANNELS + (MR_CONV,)
MR_STEPS = 16                              # hit-probability iterations
MR_SCALE = 10 ** 9                         # fixed-point probability units


def _mr_units9(x: str) -> str:
    return sql_units(x, MR_SCALE)


def _markov_removal_oracle() -> str:
    """Unrolled MR_STEPS-round hit-probability iteration per scenario
    (full chain + each channel removed), all integer after the per-edge
    probability gridding — bit-matching the Spark build's driver-side
    Python-int arithmetic."""
    states_rows = " UNION ALL ".join(
        f"SELECT '{s}' AS s" for s in MR_STATES)
    ctes = [f"""
        seq AS MATERIALIZED (
            SELECT event_type AS f,
                   lead(event_type) OVER (PARTITION BY user_id
                       ORDER BY ts, event_id) AS t
            FROM events),
        n AS (SELECT f, t, CAST(COUNT(*) AS BIGINT) AS n
              FROM seq WHERE t IS NOT NULL GROUP BY f, t),
        tot AS (SELECT f, CAST(COUNT(*) AS BIGINT) AS tt
                FROM seq GROUP BY f),
        pu AS MATERIALIZED (
            SELECT n.f, n.t,
                   {_mr_units9('(CAST(n.n AS DOUBLE) / tot.tt)')} AS pu
            FROM n JOIN tot USING (f)),
        fe AS (
            SELECT user_id, event_type,
                   ROW_NUMBER() OVER (PARTITION BY user_id
                       ORDER BY ts, event_id) AS rn
            FROM events),
        sc AS (SELECT event_type AS s, CAST(COUNT(*) AS BIGINT) AS c
               FROM fe WHERE rn = 1 GROUP BY event_type),
        su AS MATERIALIZED (
            SELECT s, {_mr_units9(
                '(CAST(c AS DOUBLE) / (SELECT SUM(c) FROM sc))')} AS su
            FROM sc),
        states AS ({states_rows})"""]
    scenarios = ("__none__",) + MR_CHANNELS
    for sc_ in scenarios:
        tag = "full" if sc_ == "__none__" else sc_
        rm = "" if sc_ == "__none__" else f"WHEN st.s = '{sc_}' THEN 0"
        ctes.append(f"""
        h_{tag}_0 AS (
            SELECT s, CASE WHEN s = '{MR_CONV}'
                           THEN CAST({MR_SCALE} AS BIGINT)
                           ELSE CAST(0 AS BIGINT) END AS hu
            FROM states)""")
        for k in range(1, MR_STEPS + 1):
            ctes.append(f"""
        h_{tag}_{k} AS MATERIALIZED (
            SELECT st.s,
                   CASE WHEN st.s = '{MR_CONV}'
                        THEN CAST({MR_SCALE} AS BIGINT)
                        {rm}
                        ELSE COALESCE(m.v, 0) END AS hu
            FROM states st LEFT JOIN (
                SELECT pu.f AS s,
                       CAST(SUM(pu.pu * h.hu) AS BIGINT)
                           // {MR_SCALE} AS v
                FROM pu JOIN h_{tag}_{k - 1} h ON h.s = pu.t
                GROUP BY pu.f) m USING (s))""")
        ctes.append(f"""
        r_{tag} AS (
            SELECT CAST(SUM(su.su * h.hu) AS BIGINT) // {MR_SCALE} AS ru
            FROM su JOIN h_{tag}_{MR_STEPS} h ON h.s = su.s)""")
    finals = " UNION ALL ".join(
        f"SELECT '{c}' AS channel, r_full.ru AS r_full_u, "
        f"r_{c}.ru AS r_removed_u FROM r_full, r_{c}"
        for c in MR_CHANNELS)
    return (f"WITH {','.join(ctes)},\n"
            f"        eff AS ({finals})\n"
            f"        SELECT channel, r_full_u, r_removed_u,\n"
            f"               r_full_u / CAST({MR_SCALE} AS DOUBLE)"
            f" AS r_full,\n"
            f"               r_removed_u / CAST({MR_SCALE} AS DOUBLE)"
            f" AS r_removed,\n"
            f"               CASE WHEN r_full_u > 0 THEN"
            f" (r_full_u - r_removed_u)"
            f" / CAST(r_full_u AS DOUBLE) END AS removal_effect\n"
            f"        FROM eff")


@query(
    "events_markov_removal",
    oracle=_markov_removal_oracle(),
    category="extension: Markov removal-effect attribution",
    doc="Markov-chain removal-effect attribution (Anderl et al. 2014): "
        "each channel's credit is how much the probability of reaching "
        "the 'purchase' absorbing state drops when that channel is "
        "deleted from the per-user event chain. Transition and "
        "first-touch probabilities grid to 1e-9 units (end-of-sequence "
        "mass falls out naturally: row sums < 1), then the 16-step "
        "hit-probability recursion h'(s) = sum_t p(s,t)*h(t) runs "
        "ENTIRELY in int64 (products <= 1e18, floor-div by the scale "
        "each step; '//' on non-negative ints is floor on both "
        "engines) — on the DRIVER over the bounded |states|^2 model on "
        "the Spark side (kmeans/power-iteration precedent) and as "
        "unrolled MATERIALIZED CTEs in the oracle, so the two engines "
        "are bit-identical by construction. Scale: the data-side work "
        "is ONE lead() pass (sort-within-user shuffle) + two bounded "
        "aggregations; everything after is arithmetic on a 25-entry "
        "matrix. Channel names are fixture constants like the KS "
        "segment literals.",
)
def events_markov_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark import StorageLevel

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = (ev.select("user_id", F.col("event_type").alias("f"),
                     F.lead("event_type").over(w).alias("t"),
                     F.row_number().over(w).alias("rn"))
           .persist(StorageLevel.MEMORY_AND_DISK))
    n = {(r["f"], r["t"]): int(r["n"]) for r in
         seq.filter(F.col("t").isNotNull())
         .groupBy("f", "t").agg(F.count("*").alias("n")).collect()}
    tot = {r["f"]: int(r["tt"]) for r in
           seq.groupBy("f").agg(F.count("*").alias("tt")).collect()}
    first = {r["f"]: int(r["c"]) for r in
             seq.filter(F.col("rn") == 1)
             .groupBy("f").agg(F.count("*").alias("c")).collect()}
    seq.unpersist()
    n_users = sum(first.values())

    from flinkapps_spark.plans.exact import units_scalar

    # float()/float() mirrors the oracle's CAST-to-DOUBLE-first division
    pu = {ft: units_scalar(float(v) / float(tot[ft[0]]), MR_SCALE)
          for ft, v in n.items()}
    su = {s: units_scalar(float(c) / float(n_users), MR_SCALE)
          for s, c in first.items()}

    def hit_u(removed: str | None) -> int:
        h = {s: MR_SCALE if s == MR_CONV else 0 for s in MR_STATES}
        for _ in range(MR_STEPS):
            nh = {}
            for s in MR_STATES:
                if s == MR_CONV:
                    nh[s] = MR_SCALE
                elif s == removed:
                    nh[s] = 0
                else:
                    nh[s] = sum(pu.get((s, t), 0) * h[t]
                                for t in MR_STATES) // MR_SCALE
            h = nh
        return sum(su.get(s, 0) * h[s] for s in MR_STATES) // MR_SCALE

    r_full = hit_u(None)
    rows = []
    for c in MR_CHANNELS:
        r_rm = hit_u(c)
        eff = ((r_full - r_rm) / float(r_full)) if r_full > 0 else None
        rows.append((c, r_full, r_rm, r_full / MR_SCALE, r_rm / MR_SCALE,
                     eff))
    return spark.createDataFrame(
        rows, "channel string, r_full_u long, r_removed_u long, "
              "r_full double, r_removed double, removal_effect double")


# ---------------------------------------------------------------------------
# parts_abc_classification — cumulative revenue-share ABC classes
# ---------------------------------------------------------------------------

ABC_BAND = 10 ** 8      # revenue-unit prefix buckets (1M currency bands)


@query(
    "parts_abc_classification",
    oracle=f"""
        WITH rev AS (
            SELECT l_partkey AS partkey,
                   CAST(SUM({sql_units('l_extendedprice', 100)})
                        AS BIGINT) AS rev_u
            FROM lineitem GROUP BY l_partkey),
        c AS (
            SELECT partkey, rev_u,
                   CAST(SUM(rev_u) OVER (ORDER BY rev_u DESC, partkey
                       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_u,
                   CAST(SUM(rev_u) OVER () AS BIGINT) AS tot_u,
                   ROW_NUMBER() OVER (ORDER BY rev_u DESC, partkey)
                       AS rank
            FROM rev)
        SELECT partkey, rev_u, rank,
               cum_u / CAST(tot_u AS DOUBLE) AS cum_share,
               CASE WHEN 5 * cum_u <= 4 * tot_u THEN 'A'
                    WHEN 20 * cum_u <= 19 * tot_u THEN 'B'
                    ELSE 'C' END AS abc_class
        FROM c
    """,
    category="extension: inventory analytics (ABC classification)",
    doc="ABC revenue classification of parts: rank by lifetime revenue "
        "descending (partkey tiebreak), class A while the cumulative "
        "share is <= 80%, B to 95%, C beyond — the Pareto cut behind "
        "stocking policy (complements orders_pareto_share, which "
        "reports the curve; this assigns the label per part). The class "
        "cuts are INTEGER comparisons (5*cum <= 4*tot, 20*cum <= "
        "19*tot) — no float threshold can flip a boundary part. Scale: "
        "revenue partial-aggregates per part, then BOTH the global rank "
        "and the cumulative revenue ride ONE two-phase prefix "
        "(bucket_offsets over 1M-currency revenue bands: per-band "
        "count + revenue offsets broadcast, within-band windows "
        "partitioned by band) — no single-partition pass over the part "
        "dimension. int64: 20*cum <= 20*total cents, overflow past "
        "~4.6e17 cents of total revenue.",
)
def parts_abc_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark import StorageLevel

    from flinkapps_spark.operators.prefix import bucket_offsets

    rev = (load_table(spark, sf_dir, "lineitem")
           .groupBy(F.col("l_partkey").alias("partkey"))
           .agg(F.sum(units_col("l_extendedprice", 100)).alias("rev_u")))
    bucketed = (rev.withColumn("nbkt",
                               -F.floor(F.col("rev_u") / ABC_BAND))
                .persist(StorageLevel.MEMORY_AND_DISK))
    bucketed.count()
    offs = bucket_offsets(bucketed, "nbkt",
                          {"cnt": F.lit(1), "rev": "rev_u"})
    w_in = (Window.partitionBy("nbkt")
            .orderBy(F.col("rev_u").desc(), F.col("partkey")))
    w_rev = w_in.rowsBetween(Window.unboundedPreceding, 0)
    c = (bucketed.join(F.broadcast(offs), "nbkt")
         .select("partkey", "rev_u",
                 (F.col("off_cnt") + F.row_number().over(w_in))
                 .alias("rank"),
                 (F.col("off_rev") + F.sum("rev_u").over(w_rev))
                 .alias("cum_u"),
                 F.col("tot_rev").alias("tot_u")))
    return c.select(
        "partkey", "rev_u", "rank",
        (F.col("cum_u") / F.col("tot_u").cast("double")).alias("cum_share"),
        F.when(5 * F.col("cum_u") <= 4 * F.col("tot_u"), "A")
        .when(20 * F.col("cum_u") <= 19 * F.col("tot_u"), "B")
        .otherwise("C").alias("abc_class"))
