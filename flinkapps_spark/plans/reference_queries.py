"""Reference-parity queries: SURVEY §2's operator inventory over the driver
fixtures (mapping per FIXTURES.md: dailyPrices→events/lineitem,
name_score→customer, text_lines→documents).

Each query exercises one numbered operator (R*, A*, F*, SQL-*) with the exact
semantics the reference job implements, re-expressed as a declarative Spark
plan, plus a DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

from flinkapps_spark.functions.dates import (
    convert_string_to_date, extract_weekyear, extract_year,
)
from flinkapps_spark.functions.text import normalize_address
from flinkapps_spark.operators import filters
from flinkapps_spark.operators.aggregations import (
    grouped_sum, minmax_by_key_year, tumbling_window_agg, word_count,
)
from flinkapps_spark.operators.projections import (
    csv_parse, csv_serialize, rename_all, select_column_range,
)
from flinkapps_spark.plans.catalog import query
from flinkapps_spark.plans.exact import exact_sum, sql_sum, units_col
from flinkapps_spark.sources.batch import load_table

# ---------------------------------------------------------------------------
# Row-level operators (§2.2)
# ---------------------------------------------------------------------------


@query(
    "flagship_filter_project",
    oracle="""
        SELECT event_id, ts, user_id, event_type, value,
               ROUND(value - 100.0, 2) AS spread
        FROM events
        WHERE event_type IN ('purchase', 'signup', 'error')
    """,
    category="row-level R3+R6",
    doc="Flagship alert pipeline: membership filter + derived spread column "
        "(reference source/flinkStreamProcessing.scala:129-134; symbols→event "
        "types, close-open→value-100).",
)
def flagship_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.filter(filters.symbol_in(F.col("event_type"),
                                    ["purchase", "signup", "error"]))
        .select("event_id", "ts", "user_id", "event_type", "value",
                F.round(F.col("value") - F.lit(100.0), 2).alias("spread"))
    )


@query(
    "filter_param_threshold",
    oracle="""
        SELECT event_id, user_id, event_type, value
        FROM events
        WHERE event_type = 'purchase' AND (value >= 400.0 OR value <= 20.0)
    """,
    category="row-level R4",
    doc="Parameterized equality + OR-threshold filter (reference "
        "source/flinkStreamingInput.scala:123-126 and commented :125).",
)
def filter_param_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    pred = filters.param_equality(F.col("event_type"), "purchase") & \
        filters.threshold_or(F.col("value"), 400.0, F.col("value"), 20.0)
    return ev.filter(pred).select("event_id", "user_id", "event_type", "value")


@query(
    "filter_compound_precedence",
    oracle="""
        SELECT l_orderkey, l_linenumber, l_returnflag, l_quantity, l_discount,
               YEAR(l_shipdate) AS shipyear
        FROM lineitem
        WHERE l_returnflag = 'A'
           OR l_returnflag = 'N'
           OR (l_returnflag = 'R' AND l_quantity = 25.0)
           OR (l_discount = 0.05 AND YEAR(l_shipdate) >= 1997
                                 AND YEAR(l_shipdate) <= 1998)
    """,
    category="row-level R5",
    doc="Compound boolean replicating the reference's *actual* Scala operator "
        "precedence — && binds tighter than ||, so the tree is "
        "A||B||(C&&D)||(E&&F&&G) (reference source/flinkStreamProcessing.scala:148-151).",
)
def filter_compound_precedence(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    pred = filters.compound_actual(
        symbol=F.col("l_returnflag"), high=F.col("l_quantity"),
        low=F.col("l_discount"), year=F.year("l_shipdate"),
        symbols=("A", "N", "R"), high_v=25.0, low_v=0.05,
        yr_from=1997, yr_to=1998)
    return li.filter(pred).select(
        "l_orderkey", "l_linenumber", "l_returnflag", "l_quantity",
        "l_discount", F.year("l_shipdate").alias("shipyear"))


@query(
    "filter_compound_intended",
    oracle="""
        SELECT l_orderkey, l_linenumber, l_returnflag, l_quantity, l_discount,
               YEAR(l_shipdate) AS shipyear
        FROM lineitem
        WHERE l_returnflag IN ('A', 'N', 'R')
          AND (l_quantity = 25.0 OR l_discount = 0.05)
          AND YEAR(l_shipdate) BETWEEN 1997 AND 1998
    """,
    category="row-level R5 (documented option)",
    doc="The *intended* reading of the same compound filter, offered as the "
        "documented job option (SURVEY §7.5.1).",
)
def filter_compound_intended(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    pred = filters.compound_intended(
        symbol=F.col("l_returnflag"), high=F.col("l_quantity"),
        low=F.col("l_discount"), year=F.year("l_shipdate"),
        symbols=("A", "N", "R"), high_v=25.0, low_v=0.05,
        yr_from=1997, yr_to=1998)
    return li.filter(pred).select(
        "l_orderkey", "l_linenumber", "l_returnflag", "l_quantity",
        "l_discount", F.year("l_shipdate").alias("shipyear"))


@query(
    "csv_roundtrip",
    oracle="""
        WITH serialized AS (
            SELECT concat_ws(',', l_orderkey, l_linenumber, l_returnflag,
                             CAST(CAST(l_shipdate AS DATE) AS VARCHAR),
                             l_quantity, l_extendedprice) AS line
            FROM lineitem
        ), parts AS (SELECT string_split(line, ',') AS p FROM serialized)
        SELECT CAST(p[1] AS BIGINT) AS l_orderkey,
               CAST(p[2] AS INT)    AS l_linenumber,
               p[3]                 AS l_returnflag,
               CAST(p[4] AS DATE)   AS shipdate,
               CAST(p[5] AS DOUBLE) AS l_quantity,
               CAST(p[6] AS DOUBLE) AS l_extendedprice
        FROM parts
    """,
    category="row-level R1+R6",
    doc="CSV wire-format round-trip: serialize rows to comma-joined strings "
        "(reference source/flinkStreamProcessing.scala:130-134) then "
        "schema-on-read parse them back with positional split+cast "
        "(reference source/flinkStreamProcessing.scala:107-115).",
)
def csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    line = csv_serialize([
        F.col("l_orderkey"), F.col("l_linenumber"), F.col("l_returnflag"),
        F.col("l_shipdate").cast("date").cast("string"),
        F.col("l_quantity"), F.col("l_extendedprice"),
    ]).alias("line")
    schema = T.StructType([
        T.StructField("l_orderkey", T.LongType()),
        T.StructField("l_linenumber", T.IntegerType()),
        T.StructField("l_returnflag", T.StringType()),
        T.StructField("shipdate", T.DateType()),
        T.StructField("l_quantity", T.DoubleType()),
        T.StructField("l_extendedprice", T.DoubleType()),
    ])
    return li.select(line).select(*csv_parse(F.col("line"), schema))


@query(
    "project_rename",
    oracle="""
        SELECT p_partkey AS pk, p_name AS pname, p_brand AS pbrand,
               p_type AS ptype
        FROM part
    """,
    category="row-level R9",
    doc="Positional column-range projection + wholesale rename (reference "
        "source/flinkTableManipulation.scala:190-194, commented demo).",
)
def project_rename(spark: SparkSession, sf_dir: str) -> DataFrame:
    pt = load_table(spark, sf_dir, "part")
    return rename_all(select_column_range(pt, 1, 4),
                      "pk", "pname", "pbrand", "ptype")


@query(
    "filter_notnull_date",
    oracle="""
        SELECT o_orderkey, o_orderstatus, CAST(o_orderdate AS DATE) AS odate
        FROM orders
        WHERE o_orderstatus IS NOT NULL
          AND o_orderstatus = 'O'
          AND o_orderdate >= TIMESTAMP '1999-01-01 00:00:00'
    """,
    category="row-level R10",
    doc="Fluent isNotNull / equality / date >= filters (reference "
        "source/flinkTableManipulation.scala:214-218, commented demo).",
)
def filter_notnull_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = load_table(spark, sf_dir, "orders")
    return (
        od.filter(F.col("o_orderstatus").isNotNull()
                  & (F.col("o_orderstatus") == "O")
                  & (F.col("o_orderdate") >= F.lit("1999-01-01 00:00:00").cast("timestamp")))
        .select("o_orderkey", "o_orderstatus",
                F.col("o_orderdate").cast("date").alias("odate"))
    )


# ---------------------------------------------------------------------------
# Aggregation (§2.3)
# ---------------------------------------------------------------------------


@query(
    "tokenize_wordcount",
    oracle="""
        SELECT w AS word, COUNT(*) AS cnt
        FROM (SELECT unnest(string_split_regex(lower(text), '\\W+')) AS w
              FROM documents)
        WHERE w <> ''
        GROUP BY w
    """,
    category="row-level R7 + agg A1+A3",
    doc="Word count: lowercase, split \\W+, drop empties, count per word "
        "(reference source/flinkStarter.scala:14-24, batch shape).",
)
def tokenize_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return word_count(docs, "text")


@query(
    "agg_sum_group",
    oracle=f"""
        SELECT c_mktsegment AS name, {sql_sum('c_acctbal', 100)} AS total
        FROM customer GROUP BY c_mktsegment
    """,
    category="agg A4",
    doc="SELECT name, SUM(score) GROUP BY name over a stream-able table "
        "(reference source/flinkStreamTable.scala:73; name_score→customer). "
        "Summed in fixed-point cents (grouped_sum over int units) per the "
        "exact-sum policy.",
)
def agg_sum_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    cu = load_table(spark, sf_dir, "customer") \
        .select(F.col("c_mktsegment").alias("name"),
                units_col(F.col("c_acctbal"), 100)
                .alias("score"))
    return grouped_sum(cu, "name", "score", out="total") \
        .select("name", (F.col("total") / 100.0).alias("total"))


@query(
    "agg_minmax_year",
    oracle="""
        SELECT o_orderpriority AS symbol, YEAR(o_orderdate) AS yearr,
               MIN(o_totalprice) AS min_v, MAX(o_totalprice) AS max_v
        FROM orders GROUP BY o_orderpriority, YEAR(o_orderdate)
    """,
    category="agg A5",
    doc="min/max grouped by key + computed YEAR() group key (reference "
        "source/flinkTableManipulation.scala:115; symbol→o_orderpriority).",
)
def agg_minmax_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = load_table(spark, sf_dir, "orders") \
        .select(F.col("o_orderpriority").alias("symbol"),
                F.col("o_orderdate"), F.col("o_totalprice"))
    return minmax_by_key_year(od, "symbol", F.col("o_orderdate"),
                              "o_totalprice")


@query(
    "agg_count_avg",
    oracle="""
        SELECT COUNT(*) AS num_orders,
               AVG(YEAR(o_orderdate)) AS avg_year
        FROM orders
    """,
    category="agg A6",
    doc="COUNT(*) + AVG(YEAR(date)) (reference "
        "source/flinkTableManipulation.scala:202-208, commented demo). "
        "Unrounded: an integer-sum average divides the same exact long by "
        "the same count on both engines — bit-identical; rounding it would "
        "reintroduce cross-engine divergence.",
)
def agg_count_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = load_table(spark, sf_dir, "orders")
    return od.agg(
        F.count("*").alias("num_orders"),
        F.avg(F.year("o_orderdate")).alias("avg_year"))


@query(
    "agg_tumbling_window",
    oracle=f"""
        SELECT time_bucket(INTERVAL '5 minutes', ts) AS window_start,
               event_type, COUNT(*) AS cnt, {sql_sum('value')} AS total
        FROM events
        GROUP BY time_bucket(INTERVAL '5 minutes', ts), event_type
    """,
    category="agg A2+A3",
    doc="Tumbling 5-minute window aggregation per key (reference "
        "source/flinkStarter.scala:22-24 — 5 s processing-time tumbling sum; "
        "event-time over fixture timestamps for determinism, SURVEY §7.5.5). "
        "Epoch-aligned Spark window == DuckDB time_bucket for 5-min buckets.",
)
def agg_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    out = tumbling_window_agg(
        ev, "ts", "5 minutes", ["event_type"],
        [F.count("*").alias("cnt"), exact_sum("value").alias("total")])
    return out


# ---------------------------------------------------------------------------
# Scalar functions (§2.5)
# ---------------------------------------------------------------------------


@query(
    "scalar_dates",
    oracle="""
        SELECT o_orderkey,
               CAST(o_orderdate AS DATE) AS odate,
               YEAR(o_orderdate) AS oyear,
               MONTH(o_orderdate) AS omonth,
               DAY(o_orderdate) AS oday,
               CAST(epoch(o_orderdate) AS BIGINT) AS oepoch
        FROM orders
    """,
    category="scalar F1-F4",
    doc="Date parsing + component extraction + epoch seconds (reference "
        "common/dateFormatter.scala:11-19, source/flinkStreamProcessing.scala:130). "
        "The yyyy-MM-dd string round-trips through convertStringToDate (F1).",
)
def scalar_dates(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = load_table(spark, sf_dir, "orders")
    datestr = F.date_format("o_orderdate", "yyyy-MM-dd")
    return od.select(
        "o_orderkey",
        convert_string_to_date(datestr).alias("odate"),
        extract_year(F.col("o_orderdate")).alias("oyear"),
        F.month("o_orderdate").alias("omonth"),
        F.dayofmonth("o_orderdate").alias("oday"),
        F.unix_timestamp("o_orderdate").alias("oepoch"))


@query(
    "scalar_weekyear",
    oracle="""
        SELECT o_orderkey, YEAR(o_orderdate) AS cal_year,
               YEAR(CAST(o_orderdate AS DATE)
                    + CAST(6 - dayofweek(o_orderdate) AS INTEGER)) AS week_year
        FROM orders
    """,
    category="scalar F2 (bug-compatible)",
    doc="SimpleDateFormat 'YYYY' week-year vs calendar year: the reference's "
        "extractYr uses week-year by accident (reference common/dateFormatter.scala:17); "
        "both semantics exposed (SURVEY §7.5.2). Spark dayofweek is 1=Sun..7=Sat, "
        "DuckDB 0=Sun..6=Sat — both compute the Saturday ending the week.",
)
def scalar_weekyear(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = load_table(spark, sf_dir, "orders")
    return od.select(
        "o_orderkey",
        extract_year(F.col("o_orderdate")).alias("cal_year"),
        extract_weekyear(F.col("o_orderdate").cast("date")).alias("week_year"))


@query(
    "scalar_strings_normalize",
    oracle="""
        SELECT c_custkey,
               trim(regexp_replace(regexp_replace(
                   upper(concat_ws(', ', c_name, c_mktsegment, n_name)),
                   '\\W', ' ', 'g'), '\\s+', ' ', 'g')) AS normalized,
               lower(c_name) AS lname, length(c_name) AS name_len
        FROM customer JOIN nation ON c_nationkey = n_nationkey
    """,
    category="scalar F5+F8",
    doc="AddressNormalizer semantics as pure builtins: uppercase, \\W→space, "
        "collapse whitespace, trim (reference source/flinkTableManipulation.scala:255-266) "
        "— the reference needs a registered ScalarFunction UDF; Spark stays in "
        "codegen with regexp_replace (no Python round-trip).",
)
def scalar_strings_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    cu = load_table(spark, sf_dir, "customer")
    na = load_table(spark, sf_dir, "nation")
    j = cu.join(F.broadcast(na),
                cu.c_nationkey == na.n_nationkey, "inner")
    return j.select(
        "c_custkey",
        normalize_address(F.col("c_name"), F.col("c_mktsegment"),
                          F.col("n_name")).alias("normalized"),
        F.lower("c_name").alias("lname"),
        F.length("c_name").alias("name_len"))


# ---------------------------------------------------------------------------
# SQL surface (§2.7) — verbatim SQL strings through spark.sql
# ---------------------------------------------------------------------------


@query(
    "sql_grouped_sum",
    oracle=f"""
        SELECT name, {sql_sum('score', 100)} AS total
        FROM (SELECT c_mktsegment AS name, c_acctbal AS score FROM customer)
        GROUP BY name
    """,
    category="sql §2.7-1",
    doc="SQL string 1 run through spark.sql over a registered temp view "
        "(reference source/flinkStreamTable.scala:68-73 — verbatim shape "
        "'SELECT name, SUM(score) FROM InputTable GROUP BY name'; the sum "
        "is expressed fixed-point per the exact-sum policy, same SQL text "
        "on both engines).",
)
def sql_grouped_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    cu = load_table(spark, sf_dir, "customer") \
        .select(F.col("c_mktsegment").alias("name"),
                F.col("c_acctbal").alias("score"))
    cu.createOrReplaceTempView("InputTable")
    return spark.sql(
        f"SELECT name, {sql_sum('score', 100)} AS total "
        "FROM InputTable GROUP BY name")


@query(
    "sql_minmax_year",
    oracle="""
        SELECT symbol, YEAR(CAST(trdate AS DATE)) AS yearr,
               MIN(high) AS min_high, MAX(high) AS max_high
        FROM (SELECT event_type AS symbol,
                     strftime(ts, '%Y-%m-%d') AS trdate,
                     value AS high
              FROM events)
        GROUP BY symbol, YEAR(CAST(trdate AS DATE))
    """,
    category="sql §2.7-2",
    doc="SQL string 2 verbatim: string trdate CAST to DATE at query time, "
        "YEAR() group key (reference source/flinkTableManipulation.scala:113-115; "
        "daily_prices view mapped onto events).",
)
def sql_minmax_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    ev.select(F.col("event_type").alias("symbol"),
              F.date_format("ts", "yyyy-MM-dd").alias("trdate"),
              F.col("value").alias("high")) \
        .createOrReplaceTempView("t_flnk_daily_prices")
    return spark.sql(
        "SELECT symbol, YEAR(CAST(trdate AS DATE)) AS yearr, "
        "MIN(high) AS min_high, MAX(high) AS max_high "
        "FROM t_flnk_daily_prices "
        "GROUP BY symbol, YEAR(CAST(trdate AS DATE))")


@query(
    "csv_parse_malformed",
    oracle="""
        WITH lines AS (
            SELECT concat_ws(',', l_orderkey,
                             CASE WHEN l_linenumber = 1 THEN 'not_a_number'
                                  ELSE CAST(l_quantity AS VARCHAR) END,
                             l_returnflag) AS line
            FROM lineitem
        ), parts AS (SELECT string_split(line, ',') AS p FROM lines)
        SELECT CAST(p[1] AS BIGINT) AS l_orderkey,
               TRY_CAST(p[2] AS DOUBLE) AS l_quantity,
               p[3] AS l_returnflag,
               (TRY_CAST(p[2] AS DOUBLE) IS NULL) AS is_malformed
        FROM parts
    """,
    category="row-level R1 (malformed input)",
    doc="Schema-on-read robustness: unparseable numeric fields become NULL "
        "(Spark CAST semantics ≡ SQL TRY_CAST) instead of killing the "
        "pipeline — the reference's naive split+toFloat throws and fails "
        "the job on the first bad record (reference "
        "source/flinkStreamProcessing.scala:107-115).",
)
def csv_parse_malformed(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    line = F.concat_ws(
        ",", F.col("l_orderkey"),
        F.when(F.col("l_linenumber") == 1, F.lit("not_a_number"))
        .otherwise(F.col("l_quantity").cast("string")),
        F.col("l_returnflag")).alias("line")
    parts = F.split(F.col("line"), ",")
    # try_cast: ANSI mode (Spark 4 default) makes plain CAST throw on
    # malformed input — try_cast gives the NULL-on-bad-input semantics
    return li.select(line).select(
        parts.getItem(0).try_cast("bigint").alias("l_orderkey"),
        parts.getItem(1).try_cast("double").alias("l_quantity"),
        parts.getItem(2).alias("l_returnflag"),
        parts.getItem(1).try_cast("double").isNull().alias("is_malformed"))
