"""Statistical-analysis & profiling queries: two-sample distribution
tests, A/B experiment readouts, audience overlap, activity streaks,
item-item collaborative filtering, and one-pass column profiling.

Beyond-reference extensions (the reference has no statistics surface);
each follows the catalog conventions (catalog.py module docstring):
identical column aliases on both sides, fixed-point int64 sums for any
float aggregate, and one final division so the derived double is
bit-identical across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from flinkapps_spark.plans.catalog import query
from flinkapps_spark.plans.exact import sql_avg, sql_units, units_col
from flinkapps_spark.sources.batch import load_table

# ---------------------------------------------------------------------------
# stats_ks_twosample
# ---------------------------------------------------------------------------

KS_SEG_A, KS_SEG_B = "BUILDING", "MACHINERY"
KS_BUCKET = 100_000        # price-cent units per prefix bucket (1000 currency)


@query(
    "stats_ks_twosample",
    oracle=f"""
        WITH t AS (
            SELECT {sql_units('o_totalprice', 100)} AS u,
                   CASE WHEN c_mktsegment = '{KS_SEG_A}' THEN 1 ELSE 0 END AS ga
            FROM orders JOIN customer ON o_custkey = c_custkey
            WHERE c_mktsegment IN ('{KS_SEG_A}', '{KS_SEG_B}')),
        n AS (
            SELECT CAST(SUM(ga) AS BIGINT) AS n1,
                   CAST(SUM(1 - ga) AS BIGINT) AS n2
            FROM t),
        c AS (
            SELECT u,
                   CAST(SUM(ga) AS BIGINT) AS a,
                   CAST(SUM(1 - ga) AS BIGINT) AS b
            FROM t GROUP BY u),
        cum AS (
            SELECT CAST(SUM(a) OVER (ORDER BY u) AS BIGINT) AS ca,
                   CAST(SUM(b) OVER (ORDER BY u) AS BIGINT) AS cb
            FROM c)
        SELECT n1, n2,
               MAX(ABS(ca * n2 - cb * n1)) AS d_num,
               MAX(ABS(ca * n2 - cb * n1)) / CAST(n1 * n2 AS DOUBLE) AS ks_d
        FROM cum, n GROUP BY n1, n2
    """,
    category="extension: two-sample distribution test",
    doc="Exact two-sample Kolmogorov-Smirnov statistic between the "
        "order-price distributions of two customer segments — the "
        "drift-detection complement to drift_psi_features (PSI bins "
        "coarsely; KS is the sup-norm over the full empirical CDFs). "
        "Entirely integer until one final division: prices become cent "
        "units, D's numerator is max|ca*n2 - cb*n1| over cumulative "
        "counts, so both engines agree bit-for-bit. Scale: the "
        "cumulative scan is TWO-PHASE — per-u counts are bucketed into "
        "1000-currency bands, bucket totals (bounded, a few hundred "
        "rows) get a tiny global-window prefix, and the wide per-u "
        "window runs PARTITIONED by bucket with the bucket offset added "
        "back — no single-partition pass over the value grid, so the "
        "plan holds when the distinct-price grid has millions of "
        "entries. The per-value frame is eagerly cached so the corpus "
        "is scanned ONCE (offsets live on a broadcast stage that would "
        "otherwise re-execute the chain); n1/n2 ride the same broadcast "
        "frame. int64 headroom: ca*n2 <= n1*n2, overflow needs both "
        "samples past ~3e9 rows; past that divide counts by a common "
        "power of two first.",
)
def stats_ks_twosample(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = (load_table(spark, sf_dir, "customer")
            .filter(F.col("c_mktsegment").isin(KS_SEG_A, KS_SEG_B))
            .select("c_custkey",
                    F.when(F.col("c_mktsegment") == KS_SEG_A, 1)
                    .otherwise(0).alias("ga")))
    t = (load_table(spark, sf_dir, "orders")
         .join(cust, F.col("o_custkey") == F.col("c_custkey"))
         .select(units_col("o_totalprice", 100).alias("u"), "ga"))
    per_u = t.groupBy("u").agg(
        F.sum("ga").alias("a"), F.sum(1 - F.col("ga")).alias("b"))
    # Two-phase prefix sum: bucket totals -> tiny global prefix of
    # offsets; per-u cumulative stays partitioned by bucket.  The
    # bucket-offset frame sits on the BROADCAST side of the join below,
    # and AQE materializes broadcast stages independently — without the
    # eager cache the corpus scan+join+agg re-executes inside that
    # stage (observed: orders scanned twice).  per_u is bounded by the
    # distinct-value grid, not the corpus; MEMORY_AND_DISK spills
    # rather than pinning executor memory (dedup_keep_set precedent).
    from pyspark import StorageLevel

    from flinkapps_spark.operators.prefix import bucket_offsets

    bucketed = (per_u.withColumn("bkt", F.floor(F.col("u") / KS_BUCKET))
                .persist(StorageLevel.MEMORY_AND_DISK))
    bucketed.count()
    # offsets AND the n1/n2 grand totals ride one broadcast bucket frame
    offs = bucket_offsets(bucketed, "bkt", {"a": "a", "b": "b"})
    w_in = (Window.partitionBy("bkt").orderBy("u")
            .rowsBetween(Window.unboundedPreceding, 0))
    cum = (bucketed.join(F.broadcast(offs), "bkt")
           .select(F.col("tot_a").alias("n1"), F.col("tot_b").alias("n2"),
                   (F.col("off_a") + F.sum("a").over(w_in)).alias("ca"),
                   (F.col("off_b") + F.sum("b").over(w_in)).alias("cb")))
    d = (cum.groupBy("n1", "n2")
         .agg(F.max(F.abs(F.col("ca") * F.col("n2")
                          - F.col("cb") * F.col("n1"))).alias("d_num")))
    return d.select(
        "n1", "n2", "d_num",
        (F.col("d_num")
         / (F.col("n1") * F.col("n2")).cast("double")).alias("ks_d"))


# ---------------------------------------------------------------------------
# events_audience_overlap
# ---------------------------------------------------------------------------


@query(
    "events_audience_overlap",
    oracle="""
        WITH d AS (SELECT DISTINCT event_type, user_id FROM events),
        pairs AS (
            SELECT a.event_type AS type_a, b.event_type AS type_b,
                   COUNT(*) AS overlap
            FROM d a JOIN d b
              ON a.user_id = b.user_id AND a.event_type < b.event_type
            GROUP BY 1, 2),
        sizes AS (
            SELECT event_type, COUNT(*) AS n FROM d GROUP BY event_type)
        SELECT type_a, type_b, overlap,
               sa.n AS n_a, sb.n AS n_b,
               overlap / CAST(sa.n + sb.n - overlap AS DOUBLE) AS jaccard
        FROM pairs
        JOIN sizes sa ON sa.event_type = type_a
        JOIN sizes sb ON sb.event_type = type_b
    """,
    category="extension: audience overlap matrix",
    doc="Pairwise audience overlap between event types: distinct "
        "(type, user) pairs self-joined on user with type_a < type_b, "
        "plus per-type audience sizes and the exact Jaccard (one "
        "integer-derived division). The segment-overlap report every "
        "ads/analytics stack ships. Scale: one shuffle on user_id; "
        "per-user fan-out is C(types-touched, 2), bounded by the "
        "event-type cardinality squared, NOT by user activity — a user "
        "with 1e6 events still contributes at most C(|types|,2) pairs "
        "because the input is distinct (type,user). The size lookup "
        "joins a |types|-row table, broadcast.",
)
def events_audience_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = (load_table(spark, sf_dir, "events")
         .select("event_type", "user_id").distinct())
    a = d.select(F.col("event_type").alias("type_a"),
                 F.col("user_id").alias("ua"))
    b = d.select(F.col("event_type").alias("type_b"),
                 F.col("user_id").alias("ub"))
    pairs = (a.join(b, (F.col("ua") == F.col("ub"))
                    & (F.col("type_a") < F.col("type_b")))
             .groupBy("type_a", "type_b")
             .agg(F.count("*").alias("overlap")))
    sizes = d.groupBy("event_type").agg(F.count("*").alias("n"))
    sa = sizes.select(F.col("event_type").alias("type_a"),
                      F.col("n").alias("n_a"))
    sb = sizes.select(F.col("event_type").alias("type_b"),
                      F.col("n").alias("n_b"))
    return (pairs.join(F.broadcast(sa), "type_a")
            .join(F.broadcast(sb), "type_b")
            .select("type_a", "type_b", "overlap", "n_a", "n_b",
                    (F.col("overlap")
                     / (F.col("n_a") + F.col("n_b") - F.col("overlap"))
                     .cast("double")).alias("jaccard")))


# ---------------------------------------------------------------------------
# orders_active_streaks
# ---------------------------------------------------------------------------


@query(
    "orders_active_streaks",
    oracle="""
        WITH m AS (
            SELECT DISTINCT o_custkey,
                   CAST(year(o_orderdate) * 12 + month(o_orderdate)
                        AS BIGINT) AS mo
            FROM orders),
        isl AS (
            SELECT o_custkey,
                   mo - ROW_NUMBER() OVER (PARTITION BY o_custkey
                                           ORDER BY mo) AS grp
            FROM m),
        runs AS (
            SELECT o_custkey, grp, COUNT(*) AS run_len
            FROM isl GROUP BY o_custkey, grp)
        SELECT o_custkey,
               MAX(run_len) AS longest_streak,
               CAST(SUM(run_len) AS BIGINT) AS active_months,
               COUNT(*) AS n_streaks
        FROM runs GROUP BY o_custkey
    """,
    category="extension: gaps-and-islands streaks",
    doc="Longest consecutive-month ordering streak per customer — the "
        "classic gaps-and-islands shape (island id = month-index minus "
        "row_number, constant within a consecutive run). Exact integer "
        "month arithmetic; no floats anywhere. Scale: the window and "
        "both aggregations partition on o_custkey, so this is one "
        "shuffle on the customer key reused across all three steps; "
        "distinct-months first keeps the windowed frame at months, not "
        "orders.",
)
def orders_active_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    mo = (F.year("o_orderdate") * 12 + F.month("o_orderdate")).cast("long")
    m = (load_table(spark, sf_dir, "orders")
         .select("o_custkey", mo.alias("mo")).distinct())
    w = Window.partitionBy("o_custkey").orderBy("mo")
    isl = m.select("o_custkey",
                   (F.col("mo") - F.row_number().over(w)).alias("grp"))
    runs = isl.groupBy("o_custkey", "grp").agg(F.count("*").alias("run_len"))
    return runs.groupBy("o_custkey").agg(
        F.max("run_len").alias("longest_streak"),
        F.sum("run_len").alias("active_months"),
        F.count("*").alias("n_streaks"))


# ---------------------------------------------------------------------------
# recsys_item_cosine
# ---------------------------------------------------------------------------

COSINE_MIN_CO = 2     # minimum co-occurrence support before scoring
COSINE_TOPK = 50


@query(
    "recsys_item_cosine",
    oracle=f"""
        WITH b AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        co AS (
            SELECT a.l_partkey AS part_a, b2.l_partkey AS part_b,
                   COUNT(*) AS co_cnt
            FROM b a JOIN b b2
              ON a.l_orderkey = b2.l_orderkey
             AND a.l_partkey < b2.l_partkey
            GROUP BY 1, 2
            HAVING COUNT(*) >= {COSINE_MIN_CO}),
        cnt AS (SELECT l_partkey, COUNT(*) AS n FROM b GROUP BY l_partkey)
        SELECT part_a, part_b, co_cnt, ca.n AS n_a, cb.n AS n_b,
               co_cnt / sqrt(CAST(ca.n * cb.n AS DOUBLE)) AS cosine
        FROM co
        JOIN cnt ca ON ca.l_partkey = part_a
        JOIN cnt cb ON cb.l_partkey = part_b
        ORDER BY cosine DESC, part_a, part_b
        LIMIT {COSINE_TOPK}
    """,
    category="extension: item-item collaborative filtering",
    doc="Item-item cosine similarity from order co-occurrence (the "
        "classic implicit-feedback CF neighborhood model): baskets are "
        "distinct (order, part) pairs, co-occurrence counts come from a "
        "within-order self-join with part_a < part_b, and cosine = "
        "co / sqrt(n_a * n_b) — one sqrt+division on identical integers, "
        "so ordering agrees across engines; the top-k sort carries "
        "(part_a, part_b) as a total-order tiebreaker. Scale: the "
        "self-join shuffles on orderkey and fans out C(items-per-order, "
        "2) per order — bounded by basket size, not catalog size. The "
        "remaining shape risk — an ultra-popular item in a large "
        "fraction of baskets squares its pair volume and hot-keys the "
        "pair reducers — is guarded by pop_cap= (operators/baskets."
        "cap_popular_items, the standard Amazon-CF mitigation: drop "
        "items above a support cap before the self-join; they dominate "
        "pair volume but carry no preference signal). Default off so "
        "the driver-checked query stays oracle-identical; the zipf-skew "
        "tests prove the capped plan parity-green vs a capped oracle. "
        "The count lookup joins aggregated part counts on partkey (no "
        "broadcast — the part dimension scales with the catalog). "
        "TakeOrdered top-k: per-partition heaps, no global sort.",
)
def recsys_item_cosine(spark: SparkSession, sf_dir: str,
                       pop_cap: int | None = None) -> DataFrame:
    from flinkapps_spark.operators.baskets import cap_popular_items
    b = (load_table(spark, sf_dir, "lineitem")
         .select("l_orderkey", "l_partkey").distinct())
    if pop_cap is not None:
        b = cap_popular_items(b, "l_partkey", pop_cap)
    # Round-9 restructure (guide §1.2 + §2.3 — same rewrite as
    # itemset_copurchase_pairs): the un-persisted distinct frame was
    # referenced three times (both self-join sides + part counts), so
    # lineitem was scanned and the distinct shuffled three times and the
    # within-order pair expansion paid a self-join exchange.  One
    # collect_set shuffle builds the sorted per-order basket (the
    # distinct folds into the same exchange), the frame persists once,
    # and the a<b expansion runs in codegen over the ~4-7-element
    # arrays.  Oracle keeps the self-join form; results identical.
    baskets = (b.groupBy("l_orderkey")
               .agg(F.sort_array(F.collect_set("l_partkey")).alias("parts"))
               .persist())
    baskets.count()  # materialize once for the two downstream uses
    pair_arr = F.flatten(F.transform(
        F.col("parts"),
        lambda x, i: F.transform(
            F.slice(F.col("parts"), i + F.lit(2), F.size("parts")),
            lambda y: F.struct(x.alias("part_a"), y.alias("part_b")))))
    co = (baskets.select(F.explode(pair_arr).alias("p"))
          .select("p.part_a", "p.part_b")
          .groupBy("part_a", "part_b")
          .agg(F.count("*").alias("co_cnt"))
          .filter(F.col("co_cnt") >= COSINE_MIN_CO))
    cnt = (baskets.select(F.explode("parts").alias("l_partkey"))
           .groupBy("l_partkey").agg(F.count("*").alias("n")))
    ca = cnt.select(F.col("l_partkey").alias("part_a"),
                    F.col("n").alias("n_a"))
    cb = cnt.select(F.col("l_partkey").alias("part_b"),
                    F.col("n").alias("n_b"))
    scored = (co.join(ca, "part_a").join(cb, "part_b")
              .select("part_a", "part_b", "co_cnt", "n_a", "n_b",
                      (F.col("co_cnt")
                       / F.sqrt((F.col("n_a") * F.col("n_b"))
                                .cast("double"))).alias("cosine")))
    return (scored
            .orderBy(F.desc("cosine"), "part_a", "part_b")
            .limit(COSINE_TOPK))


# ---------------------------------------------------------------------------
# profile_table_columns
# ---------------------------------------------------------------------------

_PROFILE_COLS = ["o_orderkey", "o_custkey", "o_orderstatus",
                 "o_totalprice", "o_orderdate", "o_orderpriority"]


@query(
    "profile_table_columns",
    oracle="\n        UNION ALL\n".join(
        f"""SELECT '{c}' AS col_name,
                   COUNT(*) - COUNT({c}) AS n_null,
                   COUNT(DISTINCT {c}) AS n_distinct
            FROM orders"""
        for c in _PROFILE_COLS),
    category="extension: one-pass column profiling",
    doc="Table profiling — per-column null count and exact distinct "
        "count over orders, computed in ONE scan (a single multi-"
        "aggregate, then the 1-row result exploded to long format "
        "driver-free). The schema-quality report every ingestion "
        "pipeline runs before accepting a drop. Scale: Spark rewrites "
        "N count-distincts into one Expand (xN row multiplier) + "
        "partial aggs — still a single pass over the data; at 100 TB "
        "swap countDistinct for approx_count_distinct (HLL, no Expand) "
        "and keep the same shape. Oracle is the equivalent UNION ALL "
        "of per-column profiles.",
)
def profile_table_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    aggs = []
    for c in _PROFILE_COLS:
        aggs.append(F.sum(F.col(c).isNull().cast("long"))
                    .alias(f"null_{c}"))
        aggs.append(F.countDistinct(c).alias(f"nd_{c}"))
    row = o.agg(*aggs)
    structs = [F.struct(F.lit(c).alias("col_name"),
                        F.col(f"null_{c}").alias("n_null"),
                        F.col(f"nd_{c}").alias("n_distinct"))
               for c in _PROFILE_COLS]
    return (row.select(F.explode(F.array(*structs)).alias("s"))
            .select("s.*"))


# ---------------------------------------------------------------------------
# stats_ab_conversion
# ---------------------------------------------------------------------------


AB_VALUE_MIN = 350.0      # a "conversion" = purchase with value >= this


@query(
    "stats_ab_conversion",
    oracle=f"""
        WITH per_user AS (
            SELECT user_id,
                   user_id % 2 AS variant,
                   MAX(CASE WHEN event_type = 'purchase'
                             AND value >= {AB_VALUE_MIN!r}
                            THEN 1 ELSE 0 END) AS converted
            FROM events GROUP BY user_id),
        agg AS (
            SELECT
                CAST(SUM(CASE WHEN variant = 0 THEN 1 ELSE 0 END)
                     AS BIGINT) AS n_a,
                CAST(SUM(CASE WHEN variant = 0 THEN converted ELSE 0 END)
                     AS BIGINT) AS x_a,
                CAST(SUM(CASE WHEN variant = 1 THEN 1 ELSE 0 END)
                     AS BIGINT) AS n_b,
                CAST(SUM(CASE WHEN variant = 1 THEN converted ELSE 0 END)
                     AS BIGINT) AS x_b
            FROM per_user)
        SELECT n_a, x_a, n_b, x_b,
               x_a * n_b - x_b * n_a AS lift_num,
               ((CAST(x_a AS DOUBLE) / n_a - CAST(x_b AS DOUBLE) / n_b)
                * (CAST(x_a AS DOUBLE) / n_a - CAST(x_b AS DOUBLE) / n_b))
               / ((CAST(x_a + x_b AS DOUBLE) / (n_a + n_b))
                  * (1.0 - CAST(x_a + x_b AS DOUBLE) / (n_a + n_b))
                  * (1.0 / n_a + 1.0 / n_b)) AS z_squared
        FROM agg
    """,
    category="extension: A/B test readout",
    doc="Two-proportion z-test readout for a deterministic experiment "
        "split (variant = user_id % 2, conversion = user ever fired a "
        "'purchase' with value >= 350): per-variant user and converter "
        "counts are exact "
        "integers; lift_num = x_a*n_b - x_b*n_a is the pure-integer "
        "sign/magnitude of the lift (cross-multiplied, division-free); "
        "z_squared is the pooled-variance z-statistic squared, derived "
        "from those integers by an identical IEEE op sequence on both "
        "engines. Scale: one shuffle to per-user flags (partial-agg "
        "combines the MAX map-side), then a scalar global aggregate — "
        "the same two-phase shape at any data size.",
)
def stats_ab_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    per_user = (ev.groupBy("user_id")
                .agg(F.max(((F.col("event_type") == "purchase")
                            & (F.col("value") >= AB_VALUE_MIN))
                           .cast("int")).alias("converted"))
                .select((F.col("user_id") % 2).alias("variant"),
                        "converted"))
    agg = per_user.groupBy().agg(
        F.sum(F.when(F.col("variant") == 0, 1).otherwise(0))
        .alias("n_a"),
        F.sum(F.when(F.col("variant") == 0, F.col("converted"))
              .otherwise(0)).alias("x_a"),
        F.sum(F.when(F.col("variant") == 1, 1).otherwise(0))
        .alias("n_b"),
        F.sum(F.when(F.col("variant") == 1, F.col("converted"))
              .otherwise(0)).alias("x_b"))
    pa = F.col("x_a").cast("double") / F.col("n_a")
    pb = F.col("x_b").cast("double") / F.col("n_b")
    p = ((F.col("x_a") + F.col("x_b")).cast("double")
         / (F.col("n_a") + F.col("n_b")))
    return agg.select(
        "n_a", "x_a", "n_b", "x_b",
        (F.col("x_a") * F.col("n_b")
         - F.col("x_b") * F.col("n_a")).alias("lift_num"),
        # try_divide: when every user (or no user) converts the pooled
        # variance is 0 and DuckDB's x/0.0 yields NULL — Spark 4's ANSI
        # division throws instead (inherited latent failure, surfaced by
        # the round-10 sf0.001 sweep: zero conversions at that SF).
        # Identical IEEE division wherever the denominator is nonzero
        # (the round-9 try_divide precedent).
        F.try_divide(
            (pa - pb) * (pa - pb),
            p * (F.lit(1.0) - p)
            * (F.lit(1.0) / F.col("n_a")
               + F.lit(1.0) / F.col("n_b"))).alias("z_squared"))


# ---------------------------------------------------------------------------
# orders_cohort_ltv — cumulative revenue curve per acquisition cohort
# ---------------------------------------------------------------------------


@query(
    "orders_cohort_ltv",
    oracle=f"""
        WITH o AS (
            SELECT o_custkey,
                   CAST(year(o_orderdate) * 12 + month(o_orderdate)
                        AS BIGINT) AS m,
                   {sql_units('o_totalprice', 100)} AS u
            FROM orders),
        ann AS (
            SELECT o_custkey, m, u,
                   MIN(m) OVER (PARTITION BY o_custkey) AS cohort
            FROM o),
        agg AS (
            SELECT cohort, m - cohort AS age,
                   COUNT(*) AS n_orders,
                   COUNT(DISTINCT o_custkey) AS active_customers,
                   CAST(SUM(u) AS BIGINT) AS su
            FROM ann GROUP BY cohort, m - cohort),
        cum AS (
            SELECT cohort, age, n_orders, active_customers,
                   CAST(SUM(su) OVER (PARTITION BY cohort ORDER BY age)
                        AS BIGINT) AS cum_u,
                   FIRST_VALUE(active_customers)
                       OVER (PARTITION BY cohort ORDER BY age)
                       AS cohort_size
            FROM agg)
        SELECT cohort, CAST(age AS INT) AS age, n_orders,
               active_customers, cohort_size,
               cum_u / CAST(100 AS DOUBLE) AS cum_revenue,
               cum_u / CAST(100 AS DOUBLE) / cohort_size
                   AS ltv_per_customer
        FROM cum
    """,
    category="extension: cohort LTV curve",
    doc="Customer-lifetime-value curves per acquisition cohort: cohort "
        "= a customer's first order month, age = months since, and the "
        "per-(cohort, age) revenue accumulates into the LTV curve — "
        "the revenue-side complement of events_cohort_retention. "
        "Revenue stays fixed-point int64 through the cumulative window "
        "and divides once at the end; cohort_size reuses the age-0 "
        "active count via FIRST_VALUE (every cohort member orders in "
        "its cohort month BY DEFINITION of min — no second distinct "
        "branch, keeping the plan one chain). Scale: one shuffle on "
        "customer for the cohort window, one partial-agg shuffle to "
        "the (cohort, age) frame, then windows over that bounded "
        "frame.",
)
def orders_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        (F.year("o_orderdate") * 12 + F.month("o_orderdate"))
        .cast("long").alias("m"),
        units_col("o_totalprice", 100).alias("u"))
    ann = o.select(
        "o_custkey", "m", "u",
        F.min("m").over(Window.partitionBy("o_custkey")).alias("cohort"))
    agg = (ann.groupBy("cohort", (F.col("m") - F.col("cohort")).alias("age"))
           .agg(F.count("*").alias("n_orders"),
                F.countDistinct("o_custkey").alias("active_customers"),
                F.sum("u").alias("su")))
    w = Window.partitionBy("cohort").orderBy("age")
    cum = agg.select(
        "cohort", "age", "n_orders", "active_customers",
        F.sum("su").over(w).alias("cum_u"),
        F.first("active_customers").over(w).alias("cohort_size"))
    return cum.select(
        "cohort", F.col("age").cast("int").alias("age"), "n_orders",
        "active_customers", "cohort_size",
        (F.col("cum_u") / F.lit(100).cast("double")).alias("cum_revenue"),
        (F.col("cum_u") / F.lit(100).cast("double") / F.col("cohort_size"))
        .alias("ltv_per_customer"))


# ---------------------------------------------------------------------------
# events_power_users_gini — activity-concentration coefficient
# ---------------------------------------------------------------------------


@query(
    "events_power_users_gini",
    oracle="""
        WITH ux AS (
            SELECT user_id, COUNT(*) AS x FROM events GROUP BY user_id),
        r AS (
            SELECT x, ROW_NUMBER() OVER (ORDER BY x, user_id) AS rk
            FROM ux),
        s AS (
            SELECT COUNT(*) AS n,
                   CAST(SUM(x) AS BIGINT) AS s0,
                   CAST(SUM(rk * x) AS BIGINT) AS s1
            FROM r)
        SELECT n AS n_users, s0 AS total_events,
               2 * s1 - (n + 1) * s0 AS gini_num,
               (2 * s1 - (n + 1) * s0) / CAST(n * s0 AS DOUBLE) AS gini
        FROM s
    """,
    category="extension: concentration (Gini)",
    doc="Gini coefficient of per-user event volume — the power-user "
        "concentration number behind 'do 1% of users generate 90% of "
        "traffic?' (and, over token counts, the corpus-balance check "
        "of a training mix). Uses the rank identity G = (2Σrk·x - "
        "(n+1)Σx)/(nΣx) with ranks ascending by (count, user): all "
        "integer until one division, so both engines agree exactly. "
        "Scale: the rank over users is TWO-PHASE like stats_ks_"
        "twosample — row_number partitioned BY COUNT VALUE (plus a "
        "user tiebreak) with cumulative offsets from the bounded "
        "count-value grid; the per-user frame is eagerly cached so "
        "the offsets' broadcast stage cannot re-execute the corpus "
        "aggregation. int64 headroom: Σrk·x <= n·Σx — past ~1e19 "
        "(1e9 users x 1e10 events) shift to per-stratum Gini or "
        "divide counts by a common factor first.",
)
def events_power_users_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark import StorageLevel

    ev = load_table(spark, sf_dir, "events")
    from flinkapps_spark.operators.prefix import bucket_offsets

    ux = (ev.groupBy("user_id").agg(F.count("*").alias("x"))
          .persist(StorageLevel.MEMORY_AND_DISK))
    ux.count()
    # phase 1: per-count-value totals -> prefix offsets + grand totals
    # (bounded by the distinct-count grid, broadcast back)
    offs = bucket_offsets(ux, "x", {"cnt": F.lit(1)})
    # phase 2: within-count rank by user id + offset = global rank
    w_in = Window.partitionBy("x").orderBy("user_id")
    ranked = (ux.join(F.broadcast(offs), "x")
              .select("x", F.col("tot_cnt").alias("n"),
                      (F.col("off_cnt") + F.row_number().over(w_in))
                      .alias("rk")))
    s = ranked.groupBy("n").agg(
        F.sum("x").alias("s0"),
        F.sum(F.col("rk") * F.col("x")).alias("s1"))
    num = 2 * F.col("s1") - (F.col("n") + 1) * F.col("s0")
    return s.select(
        F.col("n").alias("n_users"),
        F.col("s0").alias("total_events"),
        num.alias("gini_num"),
        (num / (F.col("n") * F.col("s0")).cast("double")).alias("gini"))


# ---------------------------------------------------------------------------
# orders_skyline_pareto — 2D skyline (cheapest-and-latest non-dominated set)
# ---------------------------------------------------------------------------

SKY_BUCKET = 100_000       # price-cent units per prefix bucket


@query(
    "orders_skyline_pareto",
    oracle=f"""
        WITH b AS (
            SELECT o_orderkey,
                   {sql_units('o_totalprice', 100)} AS u,
                   epoch_us(o_orderdate) AS d_us
            FROM orders),
        w AS (
            SELECT o_orderkey, u, d_us,
                   MAX(d_us) OVER (ORDER BY u RANGE BETWEEN UNBOUNDED
                                   PRECEDING AND 1 PRECEDING) AS m_strict,
                   MAX(d_us) OVER (PARTITION BY u) AS m_peers
            FROM b)
        SELECT o_orderkey, u AS price_cents, d_us
        FROM w
        WHERE (m_strict IS NULL OR d_us > m_strict) AND d_us = m_peers
    """,
    category="extension: skyline / Pareto front",
    doc="2D skyline query (Borzsony et al. 2001): orders not dominated "
        "in (price low, order date high) — no other order is both at "
        "most as expensive and at least as recent (identical "
        "price+date pairs survive together; all comparisons are "
        "integer cents / epoch-µs, so the front is engine-exact). "
        "Spark plan is the two-phase prefix-MAX scan via operators/"
        "prefix.bucket_offsets: within-bucket strict-cheaper max uses "
        "a RANGE frame partitioned by price band, cross-bucket "
        "dominance arrives as broadcast exclusive prefix maxes — no "
        "single-partition pass over the data, same skeleton as "
        "stats_ks_twosample/events_power_users_gini. The base frame "
        "is eagerly cached (prefix.py module doc: AQE broadcast "
        "stages re-execute lazy upstreams).",
)
def orders_skyline_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark import StorageLevel

    from flinkapps_spark.operators.prefix import bucket_offsets

    base = (load_table(spark, sf_dir, "orders")
            .select("o_orderkey",
                    units_col("o_totalprice", 100).alias("u"),
                    F.unix_micros("o_orderdate").alias("d_us"))
            .withColumn("bkt", F.floor(F.col("u") / SKY_BUCKET))
            .persist(StorageLevel.MEMORY_AND_DISK))
    base.count()
    offs = bucket_offsets(base, "bkt", {}, maxes={"d": "d_us"})
    w_strict = (Window.partitionBy("bkt").orderBy("u")
                .rangeBetween(Window.unboundedPreceding, -1))
    w_peers = Window.partitionBy("u")
    neg_inf = F.lit(-(1 << 62))
    m_strict = F.greatest(
        F.coalesce(F.max("d_us").over(w_strict), neg_inf),
        F.coalesce(F.col("off_d"), neg_inf))
    ann = (base.join(F.broadcast(offs), "bkt")
           .select("o_orderkey", "u", "d_us",
                   m_strict.alias("m_strict"),
                   F.max("d_us").over(w_peers).alias("m_peers")))
    return (ann.filter((F.col("d_us") > F.col("m_strict"))
                       & (F.col("d_us") == F.col("m_peers")))
            .select("o_orderkey", F.col("u").alias("price_cents"), "d_us"))


# ---------------------------------------------------------------------------
# stats_mannwhitney_u
# ---------------------------------------------------------------------------

MW_SEG_A, MW_SEG_B = "AUTOMOBILE", "FURNITURE"
MW_BUCKET = 100_000        # price-cent units per prefix bucket


@query(
    "stats_mannwhitney_u",
    oracle=f"""
        WITH t AS (
            SELECT {sql_units('o_totalprice', 100)} AS u,
                   CASE WHEN c_mktsegment = '{MW_SEG_A}' THEN 1 ELSE 0 END AS ga
            FROM orders JOIN customer ON o_custkey = c_custkey
            WHERE c_mktsegment IN ('{MW_SEG_A}', '{MW_SEG_B}')),
        c AS (
            SELECT u, CAST(SUM(ga) AS BIGINT) AS a,
                   CAST(SUM(1 - ga) AS BIGINT) AS b
            FROM t GROUP BY u),
        cum AS (
            SELECT a, a + b AS cc,
                   CAST(COALESCE(SUM(a + b) OVER (ORDER BY u
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                        0) AS BIGINT) AS cb4
            FROM c),
        s AS (
            SELECT CAST(SUM(a) AS BIGINT) AS n1,
                   CAST(SUM(cc - a) AS BIGINT) AS n2,
                   CAST(SUM(a * (2 * cb4 + cc + 1)) AS BIGINT) AS r2,
                   CAST(SUM(cc * cc * cc - cc) AS BIGINT) AS tie
            FROM cum)
        SELECT n1, n2,
               r2 - n1 * (n1 + 1) AS u1_x2,
               (r2 - n1 * (n1 + 1)) / 2.0 AS u_stat,
               ((r2 - n1 * (n1 + 1)) / 2.0
                - (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)) / 2.0)
               / sqrt((CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 12.0)
                      * ((CAST(n1 + n2 AS DOUBLE) + 1.0)
                         - CAST(tie AS DOUBLE)
                           / (CAST(n1 + n2 AS DOUBLE)
                              * (CAST(n1 + n2 AS DOUBLE) - 1.0)))) AS z
        FROM s
    """,
    category="extension: two-sample rank test",
    doc="Exact tie-corrected Mann-Whitney U between the order-price "
        "distributions of two customer segments — the rank-based "
        "complement to stats_ks_twosample (KS is sup-norm sensitive to "
        "any CDF gap; U detects stochastic dominance / median shift). "
        "Entirely integer until the final z formula: with per-cent-value "
        "counts a,b and exclusive cumulative count cb4, the tied-group "
        "average rank doubled is 2*cb4 + (a+b) + 1, so 2*R1 = "
        "sum(a * that) stays int64 and U1 = (2R1 - n1(n1+1))/2 is one "
        "division; tie correction sums (c^3 - c) per distinct value. z "
        "is the same double op sequence on both engines from the same "
        "four integers — bit-identical. Scale: reuses the KS shape — "
        "the cumulative rank scan is TWO-PHASE (operators/prefix.py): "
        "bucket totals get the tiny global window, the per-value scan "
        "runs partitioned by 1000-currency bucket with offsets added "
        "back from a broadcast frame (eagerly cached; AQE broadcast "
        "stages re-execute lazy upstreams). int64 headroom: 2R1 <= "
        "2N^2 -> N up to ~2e9; tie term needs the largest tied group "
        "under ~2e6 rows (distinct cent prices make ties tiny).",
)
def stats_mannwhitney_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark import StorageLevel

    from flinkapps_spark.operators.prefix import bucket_offsets

    cust = (load_table(spark, sf_dir, "customer")
            .filter(F.col("c_mktsegment").isin(MW_SEG_A, MW_SEG_B))
            .select("c_custkey",
                    F.when(F.col("c_mktsegment") == MW_SEG_A, 1)
                    .otherwise(0).alias("ga")))
    t = (load_table(spark, sf_dir, "orders")
         .join(cust, F.col("o_custkey") == F.col("c_custkey"))
         .select(units_col("o_totalprice", 100).alias("u"), "ga"))
    per_u = t.groupBy("u").agg(
        F.sum("ga").alias("a"), F.sum(1 - F.col("ga")).alias("b"))
    bucketed = (per_u.withColumn("bkt", F.floor(F.col("u") / MW_BUCKET))
                .persist(StorageLevel.MEMORY_AND_DISK))
    bucketed.count()
    offs = bucket_offsets(bucketed, "bkt", {"c": F.col("a") + F.col("b")})
    w_excl = (Window.partitionBy("bkt").orderBy("u")
              .rowsBetween(Window.unboundedPreceding, -1))
    cum = (bucketed.join(F.broadcast(offs), "bkt")
           .select("a", (F.col("a") + F.col("b")).alias("cc"),
                   (F.col("off_c")
                    + F.coalesce(F.sum(F.col("a") + F.col("b")).over(w_excl),
                                 F.lit(0))).alias("cb4")))
    s = cum.agg(
        F.sum("a").alias("n1"),
        F.sum(F.col("cc") - F.col("a")).alias("n2"),
        F.sum(F.col("a") * (2 * F.col("cb4") + F.col("cc") + 1)).alias("r2"),
        F.sum(F.col("cc") * F.col("cc") * F.col("cc") - F.col("cc"))
        .alias("tie"))
    n1d = F.col("n1").cast("double")
    n2d = F.col("n2").cast("double")
    nd = (F.col("n1") + F.col("n2")).cast("double")
    u1_x2 = F.col("r2") - F.col("n1") * (F.col("n1") + 1)
    u_stat = u1_x2 / F.lit(2.0)
    mu = (n1d * n2d) / F.lit(2.0)
    var = ((n1d * n2d / F.lit(12.0))
           * ((nd + F.lit(1.0))
              - F.col("tie").cast("double") / (nd * (nd - F.lit(1.0)))))
    return s.select(
        "n1", "n2", u1_x2.alias("u1_x2"), u_stat.alias("u_stat"),
        ((u_stat - mu) / F.sqrt(var)).alias("z"))


# ---------------------------------------------------------------------------
# stats_welch_ttest
# ---------------------------------------------------------------------------

TT_SEG_A, TT_SEG_B = "HOUSEHOLD", "MACHINERY"


@query(
    "stats_welch_ttest",
    oracle=f"""
        WITH t AS (
            SELECT {sql_units('o_totalprice', 1)} AS u,
                   CASE WHEN c_mktsegment = '{TT_SEG_A}' THEN 1 ELSE 0 END AS ga
            FROM orders JOIN customer ON o_custkey = c_custkey
            WHERE c_mktsegment IN ('{TT_SEG_A}', '{TT_SEG_B}')),
        s AS (
            SELECT CAST(SUM(ga) AS BIGINT) AS n1,
                   CAST(SUM(1 - ga) AS BIGINT) AS n2,
                   CAST(SUM(ga * u) AS BIGINT) AS s1,
                   CAST(SUM((1 - ga) * u) AS BIGINT) AS s2,
                   CAST(SUM(ga * u * u) AS BIGINT) AS q1,
                   CAST(SUM((1 - ga) * u * u) AS BIGINT) AS q2
            FROM t),
        m AS (
            SELECT n1, n2,
                   CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE) AS m1,
                   CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE) AS m2,
                   (CAST(q1 AS DOUBLE)
                    - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
                      / CAST(n1 AS DOUBLE)) / (CAST(n1 AS DOUBLE) - 1.0)
                       / CAST(n1 AS DOUBLE) AS se1,
                   (CAST(q2 AS DOUBLE)
                    - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE)
                      / CAST(n2 AS DOUBLE)) / (CAST(n2 AS DOUBLE) - 1.0)
                       / CAST(n2 AS DOUBLE) AS se2
            FROM s)
        SELECT n1, n2, m1, m2,
               (m1 - m2) / sqrt(se1 + se2) AS t_stat,
               (se1 + se2) * (se1 + se2)
               / (se1 * se1 / (CAST(n1 AS DOUBLE) - 1.0)
                  + se2 * se2 / (CAST(n2 AS DOUBLE) - 1.0)) AS welch_df
        FROM m
    """,
    category="extension: two-sample mean test",
    doc="Welch's unequal-variance t-test between two customer segments' "
        "order prices: one partial-aggregated pass collects six exact "
        "int64 moments (n, sum, sum-of-squares per group); t and the "
        "Welch-Satterthwaite df are then the identical double op "
        "sequence on both engines from those integers — bit-identical "
        "without rounding. Scale: single map-side-combined aggregation, "
        "no shuffle wider than one row. Units are WHOLE CURRENCY, not "
        "cents: the sum-of-squares is the binding int64 term (u^2 ~ "
        "4e11 per row in currency units -> ~2e7 rows of headroom; cent "
        "units overflowed already at sf1, caught by the sf1 sweep — "
        "the statistic is defined on rounded-currency data, which for "
        "a mean test shifts nothing material). Past 1e7 rows/segment, "
        "center u on a constant near the grand mean first (the moments "
        "shift algebraically; headroom grows with 1/variance).",
)
def stats_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = (load_table(spark, sf_dir, "customer")
            .filter(F.col("c_mktsegment").isin(TT_SEG_A, TT_SEG_B))
            .select("c_custkey",
                    F.when(F.col("c_mktsegment") == TT_SEG_A, 1)
                    .otherwise(0).alias("ga")))
    t = (load_table(spark, sf_dir, "orders")
         .join(cust, F.col("o_custkey") == F.col("c_custkey"))
         .select(units_col("o_totalprice", 1).alias("u"), "ga"))
    gb = F.col("ga")
    s = t.agg(
        F.sum(gb).alias("n1"),
        F.sum(1 - gb).alias("n2"),
        F.sum(gb * F.col("u")).alias("s1"),
        F.sum((1 - gb) * F.col("u")).alias("s2"),
        F.sum(gb * F.col("u") * F.col("u")).alias("q1"),
        F.sum((1 - gb) * F.col("u") * F.col("u")).alias("q2"))
    n1d, n2d = F.col("n1").cast("double"), F.col("n2").cast("double")
    s1d, s2d = F.col("s1").cast("double"), F.col("s2").cast("double")
    q1d, q2d = F.col("q1").cast("double"), F.col("q2").cast("double")
    m = s.select(
        "n1", "n2",
        (s1d / n1d).alias("m1"), (s2d / n2d).alias("m2"),
        ((q1d - s1d * s1d / n1d) / (n1d - F.lit(1.0)) / n1d).alias("se1"),
        ((q2d - s2d * s2d / n2d) / (n2d - F.lit(1.0)) / n2d).alias("se2"))
    se = F.col("se1") + F.col("se2")
    return m.select(
        "n1", "n2", "m1", "m2",
        ((F.col("m1") - F.col("m2")) / F.sqrt(se)).alias("t_stat"),
        (se * se
         / (F.col("se1") * F.col("se1")
            / (F.col("n1").cast("double") - F.lit(1.0))
            + F.col("se2") * F.col("se2")
            / (F.col("n2").cast("double") - F.lit(1.0)))).alias("welch_df"))


# ---------------------------------------------------------------------------
# events_user_entropy
# ---------------------------------------------------------------------------


@query(
    "events_user_entropy",
    oracle=f"""
        WITH c AS (
            SELECT user_id, event_type, COUNT(*) AS cnt
            FROM events GROUP BY user_id, event_type),
        s AS (
            SELECT user_id,
                   CAST(SUM(cnt) AS BIGINT) AS n_events,
                   CAST(COUNT(*) AS BIGINT) AS n_types,
                   CAST(SUM({sql_units(
                       'CAST(cnt AS DOUBLE) * ln(CAST(cnt AS DOUBLE))',
                       10 ** 7)}) AS BIGINT) AS su
            FROM c GROUP BY user_id)
        SELECT user_id, n_events, n_types,
               CAST({sql_units(
                   'CAST(n_events AS DOUBLE) * ln(CAST(n_events AS DOUBLE))',
                   10 ** 7)} - su AS DOUBLE) / 10000000.0
               / CAST(n_events AS DOUBLE) AS entropy
        FROM s
    """,
    category="extension: behavioral diversity (Shannon entropy)",
    doc="Shannon entropy of each user's event-type mix — the behavioral- "
        "diversity signal (bots hammer one type -> entropy ~0; organic "
        "users spread). Uses n*H = n*ln(n) - sum(cnt*ln(cnt)); BOTH the "
        "n*ln(n) term and each cnt*ln(cnt) term go through the 1e-7 "
        "fixed-point grid before the integer subtraction, then ONE "
        "division chain — so a 1-ulp ln divergence between Java "
        "Math.log and libm (observed: 4/150 users off by ~4 ulps when "
        "ln(n) was left raw, the cancellation in ln(n)-x amplifying it) "
        "is absorbed by the grid instead of leaking into the output. "
        "Scale: two partial-aggregated shuffles on (user_id, event_type) "
        "then user_id — no window, no broadcast; per-user state is one "
        "row per type actually seen.",
)
def events_user_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = (load_table(spark, sf_dir, "events")
         .groupBy("user_id", "event_type").agg(F.count("*").alias("cnt")))
    cnt_d = F.col("cnt").cast("double")
    s = c.groupBy("user_id").agg(
        F.sum("cnt").alias("n_events"),
        F.count("*").alias("n_types"),
        F.sum(units_col(cnt_d * F.log(cnt_d), 10 ** 7)).alias("su"))
    n_d = F.col("n_events").cast("double")
    return s.select(
        "user_id", "n_events", "n_types",
        ((units_col(n_d * F.log(n_d), 10 ** 7) - F.col("su"))
         .cast("double") / F.lit(10000000.0) / n_d).alias("entropy"))


# ---------------------------------------------------------------------------
# events_runs_test
# ---------------------------------------------------------------------------


@query(
    "events_runs_test",
    oracle=f"""
        WITH d AS (
            SELECT event_type, date_trunc('day', ts) AS day,
                   CAST(SUM({sql_units('value', 10000)}) AS BIGINT) AS su
            FROM events GROUP BY event_type, date_trunc('day', ts)),
        sgn AS (
            SELECT event_type, day,
                   CASE WHEN su * CAST(COUNT(*) OVER
                            (PARTITION BY event_type) AS BIGINT)
                          > CAST(SUM(su) OVER
                            (PARTITION BY event_type) AS BIGINT)
                        THEN 1 ELSE 0 END AS sign
            FROM d),
        chg AS (
            SELECT event_type, sign,
                   CASE WHEN LAG(sign) OVER
                            (PARTITION BY event_type ORDER BY day) IS NULL
                          OR LAG(sign) OVER
                            (PARTITION BY event_type ORDER BY day) <> sign
                        THEN 1 ELSE 0 END AS brk
            FROM sgn),
        s AS (
            SELECT event_type,
                   CAST(SUM(sign) AS BIGINT) AS n_above,
                   CAST(SUM(1 - sign) AS BIGINT) AS n_below,
                   CAST(SUM(brk) AS BIGINT) AS runs
            FROM chg GROUP BY event_type)
        SELECT event_type, n_above, n_below, runs,
               (CAST(runs AS DOUBLE)
                - (1.0 + (2.0 * CAST(n_above AS DOUBLE)
                              * CAST(n_below AS DOUBLE))
                         / CAST(n_above + n_below AS DOUBLE)))
               / sqrt(((2.0 * CAST(n_above AS DOUBLE)
                            * CAST(n_below AS DOUBLE))
                       * ((2.0 * CAST(n_above AS DOUBLE)
                               * CAST(n_below AS DOUBLE))
                          - CAST(n_above + n_below AS DOUBLE)))
                      / ((CAST(n_above + n_below AS DOUBLE)
                          * CAST(n_above + n_below AS DOUBLE))
                         * (CAST(n_above + n_below AS DOUBLE) - 1.0))) AS z
        FROM s
    """,
    category="extension: randomness diagnostic (runs test)",
    doc="Wald-Wolfowitz runs test per event type over the daily-revenue "
        "series: days are labeled above/below the type's mean daily "
        "total, runs of equal labels are counted, and z measures whether "
        "the sequence alternates too little (trending/regime behavior) "
        "or too much. The above-mean label never divides: day*n_days > "
        "total compares exact int64 fixed-point sums. Runs counting is "
        "a LAG over the per-type DAILY series — the window partition is "
        "bounded by the date domain (730 rows/type here), never by raw "
        "volume, because the corpus is reduced by the daily aggregation "
        "first; z is the same double op sequence on both engines from "
        "three integers. Companion to events_changepoint_cusum (CUSUM "
        "locates a drift; the runs test scores global sequence "
        "randomness).",
)
def events_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = (load_table(spark, sf_dir, "events")
         .groupBy("event_type", F.date_trunc("day", "ts").alias("day"))
         .agg(F.sum(units_col("value", 10000)).alias("su")))
    w_t = Window.partitionBy("event_type")
    sgn = d.select(
        "event_type", "day",
        F.when(F.col("su") * F.count("*").over(w_t)
               > F.sum("su").over(w_t), 1).otherwise(0).alias("sign"))
    w_ord = Window.partitionBy("event_type").orderBy("day")
    lag = F.lag("sign").over(w_ord)
    chg = sgn.select(
        "event_type", "sign",
        F.when(lag.isNull() | (lag != F.col("sign")), 1)
        .otherwise(0).alias("brk"))
    s = chg.groupBy("event_type").agg(
        F.sum("sign").alias("n_above"),
        F.sum(1 - F.col("sign")).alias("n_below"),
        F.sum("brk").alias("runs"))
    ad = F.col("n_above").cast("double")
    bd = F.col("n_below").cast("double")
    nd = (F.col("n_above") + F.col("n_below")).cast("double")
    two_ab = F.lit(2.0) * ad * bd
    mu = F.lit(1.0) + two_ab / nd
    var = (two_ab * (two_ab - nd)) / ((nd * nd) * (nd - F.lit(1.0)))
    return s.select(
        "event_type", "n_above", "n_below", "runs",
        ((F.col("runs").cast("double") - mu) / F.sqrt(var)).alias("z"))


# ---------------------------------------------------------------------------
# stats_bootstrap_ci
# ---------------------------------------------------------------------------

BOOT_B = 32                       # bootstrap replicates
BOOT_MULT = 2654435761            # Knuth multiplicative constant
BOOT_BSTEP = 97531
BOOT_MOD = 2147483647
# Poisson(1) cumulative probabilities P(X<=k), exact double reprs shared
# with the oracle SQL so both engines compare against the same IEEE-754
# constants (the Poisson bootstrap of Chamandy et al. 2012: per-row
# replicate weights ~ Poisson(1) need no global resample pass).
BOOT_CDF = (0.36787944117144233, 0.7357588823428847, 0.9196986029286058,
            0.9810118431238462, 0.9963401531726563, 0.9994058151824183)


def _boot_w_sql() -> str:
    u = f"(CAST(h AS DOUBLE) / {BOOT_MOD}.0)"
    arms = " ".join(
        f"WHEN {u} < {p!r} THEN {k}" for k, p in enumerate(BOOT_CDF))
    return f"CASE {arms} ELSE {len(BOOT_CDF)} END"


@query(
    "stats_bootstrap_ci",
    oracle=f"""
        WITH w AS (
            SELECT t.b,
                   {_boot_w_sql()} AS w, u
            FROM (SELECT {sql_units('o_totalprice', 100)} AS u,
                         o_orderkey FROM orders) o
            CROSS JOIN range({BOOT_B}) t(b),
            LATERAL (SELECT (o.o_orderkey * {BOOT_MULT}
                             + t.b * {BOOT_BSTEP}) % {BOOT_MOD} AS h) hh),
        rep AS (
            SELECT b, CAST(SUM(w * u) AS BIGINT) AS swu,
                   CAST(SUM(w) AS BIGINT) AS sw
            FROM w GROUP BY b),
        m AS (
            SELECT b, CAST(swu AS DOUBLE) / CAST(sw AS DOUBLE) AS mean_cents
            FROM rep),
        o AS (
            SELECT mean_cents, b,
                   ROW_NUMBER() OVER (ORDER BY mean_cents, b) AS rn
            FROM m)
        SELECT COUNT(*) AS n_replicates,
               MAX(CASE WHEN rn = 2 THEN mean_cents END) AS boot_lo,
               MAX(CASE WHEN rn = {BOOT_B - 1} THEN mean_cents END)
                   AS boot_hi,
               {sql_avg('mean_cents', 10 ** 6)} AS boot_center
        FROM o
    """,
    category="extension: resampling inference (Poisson bootstrap)",
    doc="Bootstrap confidence interval for the mean order price WITHOUT "
        "an RNG or a resampling shuffle: the Poisson bootstrap "
        "(Chamandy et al. 2012, the streaming/MapReduce form used for "
        "massive data) gives each (row, replicate) a Poisson(1) weight, "
        "here drawn DETERMINISTICALLY by inverse-CDF over a "
        "multiplicative-hash uniform of (orderkey, replicate) — reruns "
        "and both engines pick identical pseudo-samples. One map-side "
        "pass fans each row out x32 replicates and partial-aggregates "
        "to 32 (weight-sum, weighted-sum) int64 pairs per task — the "
        "replicate dimension never shuffles data, only 32-row partials. "
        "boot_lo/boot_hi are the 2nd-smallest / 2nd-largest replicate "
        "means (~93.75% central coverage at B=32), picked by exact "
        "selection over the 32-row frame; boot_center fixed-points the "
        "replicate means before averaging so their addition order is "
        "irrelevant. The hash u and every CDF threshold are repr-shared "
        "constants -> identical CASE outcomes on both engines.",
)
def stats_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    reps = spark.range(BOOT_B).select(F.col("id").alias("b"))
    o = load_table(spark, sf_dir, "orders").select(
        units_col("o_totalprice", 100).alias("u"), "o_orderkey")
    h = (F.col("o_orderkey") * F.lit(BOOT_MULT)
         + F.col("b") * F.lit(BOOT_BSTEP)) % F.lit(BOOT_MOD)
    u_unif = h.cast("double") / F.lit(float(BOOT_MOD))
    w_expr = F.when(u_unif < BOOT_CDF[0], 0)
    for k in range(1, len(BOOT_CDF)):
        w_expr = w_expr.when(u_unif < BOOT_CDF[k], k)
    w_expr = w_expr.otherwise(len(BOOT_CDF))
    w = o.crossJoin(reps).select("b", w_expr.alias("w"), "u")
    rep = w.groupBy("b").agg(
        F.sum(F.col("w") * F.col("u")).alias("swu"),
        F.sum("w").alias("sw"))
    m = rep.select(
        "b", (F.col("swu").cast("double") / F.col("sw").cast("double"))
        .alias("mean_cents"))
    rn = F.row_number().over(Window.orderBy("mean_cents", "b"))
    o_rn = m.select("mean_cents", rn.alias("rn"))
    from flinkapps_spark.plans.exact import exact_avg
    return o_rn.agg(
        F.count("*").alias("n_replicates"),
        F.max(F.when(F.col("rn") == 2, F.col("mean_cents")))
        .alias("boot_lo"),
        F.max(F.when(F.col("rn") == BOOT_B - 1, F.col("mean_cents")))
        .alias("boot_hi"),
        exact_avg(F.col("mean_cents"), 10 ** 6).alias("boot_center"))


# ---------------------------------------------------------------------------
# orders_kaplan_meier
# ---------------------------------------------------------------------------

KM_CENSOR_DAYS = 90    # customers ordering in this tail window are censored


@query(
    "orders_kaplan_meier",
    oracle=f"""
        WITH life AS (
            SELECT o_custkey,
                   date_diff('day', MIN(o_orderdate), MAX(o_orderdate))
                       AS t,
                   MAX(o_orderdate) AS last_day
            FROM orders GROUP BY o_custkey),
        horizon AS (SELECT MAX(o_orderdate) AS max_day FROM orders),
        lab AS (
            SELECT t, CASE WHEN last_day <= max_day
                            - INTERVAL {KM_CENSOR_DAYS} DAY
                           THEN 1 ELSE 0 END AS churned
            FROM life CROSS JOIN horizon),
        grid AS (
            SELECT t, CAST(SUM(churned) AS BIGINT) AS d,
                   CAST(COUNT(*) AS BIGINT) AS c
            FROM lab GROUP BY t),
        risk AS (
            SELECT t, d, c,
                   CAST(SUM(c) OVER () AS BIGINT)
                   - CAST(COALESCE(SUM(c) OVER (ORDER BY t
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                         0) AS BIGINT) AS n_risk
            FROM grid),
        surv AS (
            SELECT t, d, c, n_risk,
                   CAST(SUM(CASE WHEN d > 0 AND n_risk > d THEN
                        {sql_units(
                            'ln(CAST(n_risk - d AS DOUBLE)'
                            ' / CAST(n_risk AS DOUBLE))', 10 ** 7)}
                        ELSE 0 END) OVER (ORDER BY t
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                        AS BIGINT) AS ls_u
            FROM risk)
        SELECT t AS t_days, n_risk, d AS d_churned,
               c - d AS c_censored,
               CAST(ls_u AS DOUBLE) / 10000000.0 AS log_survival
        FROM surv WHERE d > 0 AND n_risk > d
    """,
    category="extension: survival analysis (Kaplan-Meier)",
    doc="Kaplan-Meier survival estimate of customer lifetime (days from "
        "first to last order): customers who still ordered in the final "
        f"{KM_CENSOR_DAYS} days of the observation window are CENSORED "
        "(their lifetime is a lower bound — they stay in every risk set "
        "but never count as churn) — the estimator retention analysis "
        "needs once 'active at window end' stops meaning 'churned'. "
        "Output: each lifetime with churn events, its risk-set size, "
        "and log S(t) = cumulative sum of ln((n_t-d_t)/n_t); each ln "
        "term is an int-ratio double pushed through the 1e-7 grid "
        "before the integer cumsum, so Math.log/libm ulp drift cannot "
        "leak (events_user_entropy precedent). Terminal collapse rows "
        "(n_risk = d, log -> -inf) are excluded, documented. Scale: "
        "the corpus reduces per-customer, then to the DATE-DOMAIN- "
        "bounded lifetime grid (~2.4k values over the 6.5-year "
        "window); the global-order windows ride that bounded grid "
        "(runs-test precedent), never raw volume; the horizon scalar "
        "broadcasts. (Defined on orders, not events: the events "
        "fixture spans one month of uniformly-active users, so no "
        "lifetime ever ends — zero churn rows, a vacuous estimator.)",
)
def orders_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    life = orders.groupBy("o_custkey").agg(
        F.datediff(F.max("o_orderdate"), F.min("o_orderdate")).alias("t"),
        F.max("o_orderdate").alias("last_day"))
    horizon = orders.agg(F.max("o_orderdate").alias("max_day"))
    lab = life.crossJoin(F.broadcast(horizon)).select(
        "t",
        F.when(F.col("last_day")
               <= F.col("max_day") - F.expr(
                   f"INTERVAL {KM_CENSOR_DAYS} DAY"), 1)
        .otherwise(0).alias("churned"))
    grid = lab.groupBy("t").agg(
        F.sum("churned").alias("d"), F.count("*").alias("c"))
    w_tot = Window.partitionBy()
    w_excl = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, -1)
    w_incl = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    risk = grid.select(
        "t", "d", "c",
        (F.sum("c").over(w_tot)
         - F.coalesce(F.sum("c").over(w_excl), F.lit(0))).alias("n_risk"))
    term = F.when(
        (F.col("d") > 0) & (F.col("n_risk") > F.col("d")),
        units_col(F.log((F.col("n_risk") - F.col("d")).cast("double")
                        / F.col("n_risk").cast("double")), 10 ** 7)) \
        .otherwise(F.lit(0))
    surv = risk.select(
        "t", "d", "c", "n_risk", F.sum(term).over(w_incl).alias("ls_u"))
    return (surv.filter((F.col("d") > 0) & (F.col("n_risk") > F.col("d")))
            .select(F.col("t").alias("t_days"), "n_risk",
                    F.col("d").alias("d_churned"),
                    (F.col("c") - F.col("d")).alias("c_censored"),
                    (F.col("ls_u").cast("double") / F.lit(10000000.0))
                    .alias("log_survival")))


# ---------------------------------------------------------------------------
# stats_spearman_trend
# ---------------------------------------------------------------------------

SP_VAL_BUCKET = 4.0       # value-rank bucket width (events.value ~0..490)


@query(
    "stats_spearman_trend",
    oracle="""
        WITH r AS (
            SELECT event_type,
                   ROW_NUMBER() OVER (PARTITION BY event_type
                       ORDER BY value, event_id) AS rx,
                   ROW_NUMBER() OVER (PARTITION BY event_type
                       ORDER BY ts, event_id) AS ry
            FROM events),
        a AS (
            SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM((rx - ry) * (rx - ry)) AS BIGINT) AS sum_d2
            FROM r GROUP BY event_type)
        SELECT event_type, n, sum_d2,
               CASE WHEN n > 1 THEN
                   1.0 - CAST(6 * sum_d2 AS DOUBLE)
                       / CAST(n * (n * n - 1) AS DOUBLE) END AS rho
        FROM a
    """,
    category="extension: rank correlation (Spearman)",
    doc="Spearman rank correlation between event value and event time "
        "per event type — the scale-free monotonic-trend readout that "
        "complements events_trend_theilsen (slope) and "
        "events_autocorrelation (lag structure). Ties broken by the "
        "unique event_id, so both rank vectors are permutations and the "
        "classic rho = 1 - 6*sum(d^2)/(n(n^2-1)) identity is EXACT: "
        "everything is int64 until one division (d <= n, sum_d2 <= n^3 "
        "— overflow needs a ~2e6-row group; past that, compute per "
        "time-stratum and average, or use the Pearson-on-ranks form "
        "with fixed-point units). Scale: each ranking is the shared "
        "TWO-PHASE decomposition — rows bucket by value band / calendar "
        "day, per-(type,bucket) counts make a bounded offset frame "
        "(window partitioned BY TYPE over buckets only), and "
        "row_number runs partitioned by (type,bucket) — no "
        "per-type single-partition sort. The two rank frames join on "
        "event_id (one corpus-keyed shuffle) and the final aggregation "
        "is partial. The bounded count frames are eagerly cached per "
        "the prefix-module AQE note (broadcast side would otherwise "
        "re-scan events).",
)
def stats_spearman_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark import StorageLevel

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value", "ts")

    from flinkapps_spark.operators.prefix import bucket_offsets

    def two_phase_rank(bucket_col, order_cols, out_name: str) -> DataFrame:
        """rank within event_type by order_cols via the shared
        per-group bucketed prefix (bucket_offsets partition_by)."""
        rows = ev.withColumn("bkt", bucket_col)
        cnts = (rows.groupBy("event_type", "bkt")
                .agg(F.count("*").alias("cnt"))
                .persist(StorageLevel.MEMORY_AND_DISK))
        cnts.count()
        offs = bucket_offsets(cnts, "bkt", {"cnt": "cnt"},
                              partition_by=("event_type",))
        w_in = Window.partitionBy("event_type", "bkt").orderBy(*order_cols)
        return (rows.join(F.broadcast(offs.select(
                    "event_type", "bkt", "off_cnt")),
                    ["event_type", "bkt"])
                .select("event_id", "event_type",
                        (F.col("off_cnt") + F.row_number().over(w_in))
                        .alias(out_name)))

    rx = two_phase_rank(F.floor(F.col("value") / SP_VAL_BUCKET),
                        [F.col("value"), F.col("event_id")], "rx")
    ry = two_phase_rank(F.date_trunc("day", F.col("ts")),
                        [F.col("ts"), F.col("event_id")], "ry")
    d = (rx.join(ry.drop("event_type"), "event_id")
         .select("event_type",
                 ((F.col("rx") - F.col("ry"))
                  * (F.col("rx") - F.col("ry"))).alias("d2")))
    a = d.groupBy("event_type").agg(
        F.count("*").alias("n"), F.sum("d2").alias("sum_d2"))
    return a.select(
        "event_type", "n", "sum_d2",
        F.when(F.col("n") > 1,
               F.lit(1.0) - (6 * F.col("sum_d2")).cast("double")
               / (F.col("n") * (F.col("n") * F.col("n") - 1))
               .cast("double")).alias("rho"))


# ---------------------------------------------------------------------------
# sample_neyman_allocation
# ---------------------------------------------------------------------------

NEY_BUDGET = 1000         # total sample rows to allocate
NEY_WSCALE = 10 ** 6      # fixed-point units for the N_h * S_h weights


@query(
    "sample_neyman_allocation",
    oracle=f"""
        WITH st AS (
            SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_rows,
                   CAST(SUM({sql_units('value', 100)}) AS BIGINT) AS sx,
                   CAST(SUM({sql_units('value', 100)}
                            * {sql_units('value', 100)}) AS BIGINT) AS sxx
            FROM events GROUP BY event_type),
        sd AS (
            SELECT event_type, n_rows,
                   sqrt(((n_rows * (sxx / 10000.0))
                         - (sx / 100.0) * (sx / 100.0))
                        / (CAST(n_rows AS DOUBLE) * n_rows)) AS stddev_value
            FROM st),
        w AS (
            SELECT event_type, n_rows, stddev_value,
                   CAST(CASE WHEN n_rows * stddev_value >= 0
                        THEN floor(n_rows * stddev_value * {NEY_WSCALE}
                                   + 0.5)
                        ELSE ceil(n_rows * stddev_value * {NEY_WSCALE}
                                  - 0.5) END AS BIGINT) AS w_u
            FROM sd),
        t AS (SELECT CAST(SUM(w_u) AS BIGINT) AS tot_w FROM w)
        SELECT event_type, n_rows, stddev_value, w_u,
               CAST(floor(({NEY_BUDGET} * w_u) / CAST(tot_w AS DOUBLE)
                          + 0.5) AS BIGINT) AS alloc_n
        FROM w, t
    """,
    category="extension: sampling design (Neyman allocation)",
    doc="Optimal (Neyman) allocation of a 1000-row sample budget across "
        "event-type strata: n_h proportional to N_h * S_h, which "
        "minimizes the variance of the stratified mean estimator — the "
        "design step that runs BEFORE sample_hash_stratified when "
        "strata differ in spread. Per-stratum variance uses exact int64 "
        "cent-unit sums in embedding_covariance's op order (products "
        "stay double: n*Sxx would overflow int64 at ~1e7 rows); sqrt is "
        "correctly-rounded IEEE so S_h is bit-identical; the N_h*S_h "
        "weights round to fixed-point units so their TOTAL is an exact "
        "integer sum (never an order-dependent float sum); the final "
        "allocation is one division + half-away rounding. Rounded "
        "allocations can sum to budget +/- #strata (largest-remainder "
        "correction is a driver-trivial post-step, noted not applied). "
        "Scale: one partial-agg shuffle to the per-type frame; the "
        "weight total rides a bounded cross join.",
)
def sample_neyman_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    u = units_col("value", 100)
    st = (load_table(spark, sf_dir, "events")
          .groupBy("event_type")
          .agg(F.count("*").alias("n_rows"), F.sum(u).alias("sx"),
               F.sum(u * u).alias("sxx")))
    sd = st.select(
        "event_type", "n_rows",
        F.sqrt(((F.col("n_rows") * (F.col("sxx") / F.lit(10000.0)))
                - (F.col("sx") / F.lit(100.0))
                * (F.col("sx") / F.lit(100.0)))
               / (F.col("n_rows").cast("double") * F.col("n_rows")))
        .alias("stddev_value"))
    from pyspark import StorageLevel

    # eager cache: tot_w rides a broadcast stage that would otherwise
    # re-execute the corpus aggregation (prefix-module AQE note)
    w = sd.select(
        "event_type", "n_rows", "stddev_value",
        units_col(F.col("n_rows") * F.col("stddev_value"), NEY_WSCALE)
        .alias("w_u")).persist(StorageLevel.MEMORY_AND_DISK)
    w.count()
    t = w.agg(F.sum("w_u").alias("tot_w"))
    return (w.crossJoin(F.broadcast(t))
            .select("event_type", "n_rows", "stddev_value", "w_u",
                    F.floor((NEY_BUDGET * F.col("w_u"))
                            / F.col("tot_w").cast("double") + 0.5)
                    .cast("long").alias("alloc_n")))


# ---------------------------------------------------------------------------
# events_fano_burstiness
# ---------------------------------------------------------------------------


@query(
    "events_fano_burstiness",
    oracle="""
        WITH c AS (
            SELECT event_type, date_trunc('hour', ts) AS h,
                   CAST(COUNT(*) AS BIGINT) AS cnt
            FROM events GROUP BY 1, 2),
        s AS (
            SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_hours,
                   CAST(SUM(cnt) AS BIGINT) AS s1,
                   CAST(SUM(cnt * cnt) AS BIGINT) AS s2
            FROM c GROUP BY event_type)
        SELECT event_type, n_hours, s1 AS n_events,
               (n_hours * s2 - s1 * s1)
                   / CAST(n_hours * s1 AS DOUBLE) AS fano_factor
        FROM s
    """,
    category="extension: burstiness (Fano factor)",
    doc="Index of dispersion of hourly event arrivals per type: Fano = "
        "Var(count)/Mean(count) over the observed hourly bins — 1 for a "
        "Poisson process, >1 means bursty traffic (the capacity-planning "
        "readout that complements events_rate_spike's point alerts and "
        "events_concurrency_peaks). The identity (n*S2 - S1^2)/(n*S1) "
        "keeps everything int64 until ONE division; hour bucketing via "
        "date_trunc (the SCALE.md time policy). int64: n*S2 <= "
        "bins^2*max_cnt^2 — overflow needs ~3e9 events in one hour. "
        "Scale: one partial-agg shuffle to the bounded (type, hour) "
        "frame, then a per-type scalar.",
)
def events_fano_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = (load_table(spark, sf_dir, "events")
         .groupBy("event_type", F.date_trunc("hour", F.col("ts")).alias("h"))
         .agg(F.count("*").alias("cnt")))
    s = c.groupBy("event_type").agg(
        F.count("*").alias("n_hours"), F.sum("cnt").alias("s1"),
        F.sum(F.col("cnt") * F.col("cnt")).alias("s2"))
    return s.select(
        "event_type", "n_hours", F.col("s1").alias("n_events"),
        ((F.col("n_hours") * F.col("s2") - F.col("s1") * F.col("s1"))
         / (F.col("n_hours") * F.col("s1")).cast("double"))
        .alias("fano_factor"))
