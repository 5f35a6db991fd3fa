"""Time-series analytics over the events stream: OHLC bar resampling and
fixed-width value histograms — the aggregation shapes a market-data /
telemetry engine runs constantly (the reference's domain is stock CSVs:
open/close columns at source/flinkStreamProcessing.scala:52-57; these
queries generalize that to arbitrary event streams).

Determinism notes (driver compare is an exact value hash):
- open/close are selected by row_number over (ts, event_id) — a total
  order, so first/last are unique rows, not engine-dependent ties;
- high/low are min/max of raw doubles (comparisons, no arithmetic);
- volume sums go through the fixed-point exact.* helpers;
- histogram bins come from floor(value/width): the same IEEE double
  division on the same input double is bit-identical on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from flinkapps_spark.plans.catalog import query
from flinkapps_spark.plans.exact import exact_sum, sql_sum, sql_units
from flinkapps_spark.sources.batch import load_table

BAR = "hour"          # OHLC bar width (date_trunc unit, same both engines)
BIN_WIDTH = 25.0      # histogram bin width over events.value
BIN_MAX = 19          # clamp: values ≥ BIN_WIDTH*BIN_MAX land in the top bin


@query(
    "events_ohlc_resample",
    oracle=f"""
        WITH b AS (
            SELECT event_type, date_trunc('{BAR}', ts) AS bucket,
                   value, ts, event_id
            FROM events),
        r AS (
            SELECT *,
                   row_number() OVER (PARTITION BY event_type, bucket
                                      ORDER BY ts, event_id) AS rn_a,
                   row_number() OVER (PARTITION BY event_type, bucket
                                      ORDER BY ts DESC, event_id DESC) AS rn_d
            FROM b)
        SELECT event_type, bucket,
               max(CASE WHEN rn_a = 1 THEN value END) AS open,
               max(value) AS high,
               min(value) AS low,
               max(CASE WHEN rn_d = 1 THEN value END) AS close,
               {sql_sum('value', 100)} AS volume,
               COUNT(*) AS n_events
        FROM r
        GROUP BY event_type, bucket
    """,
    category="extension: time-series (OHLC resample)",
    doc="OHLC bar resampling: per event_type per hour bucket emit "
        "open/high/low/close/volume/count — the canonical market-data "
        "downsample (the reference's stock schema has open/close columns; "
        "this computes them from the raw stream). open/close are "
        "min_by/max_by over the total order struct(ts, event_id), so ties "
        "cannot flip between engines AND the plan is pure partial "
        "aggregation — NO window sort: one map-side-combined shuffle on "
        "(event_type, bucket), which is the shape that survives 100 TB "
        "(the oracle uses an equivalent row_number formulation because "
        "DuckDB's arg_min rejects struct ordering keys — same unique row, "
        "different plan). Volume is a fixed-point exact sum.",
)
def events_ohlc_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.date_trunc(BAR, "ts").alias("bucket"),
        "value", F.struct("ts", "event_id").alias("ord"))
    return (ev.groupBy("event_type", "bucket")
            .agg(F.min_by("value", "ord").alias("open"),
                 F.max("value").alias("high"),
                 F.min("value").alias("low"),
                 F.max_by("value", "ord").alias("close"),
                 exact_sum("value", 100).alias("volume"),
                 F.count(F.lit(1)).alias("n_events")))


@query(
    "events_value_histogram",
    oracle=f"""
        SELECT event_type,
               CAST(least(floor(value / {BIN_WIDTH}), {BIN_MAX}) AS BIGINT)
                   AS bin,
               COUNT(*) AS n,
               {sql_sum('value', 100)} AS sum_value
        FROM events
        GROUP BY 1, 2
    """,
    category="extension: time-series (histogram / feature binning)",
    doc="Fixed-width histogram of events.value per event_type (bin width "
        "25, top-clamped at bin 19) with count and exact sum per bin — "
        "the numeric-feature binning step of a feature-engineering "
        "pipeline and the data behind a monitoring heatmap. Bin "
        "assignment is map-side arithmetic; the aggregate is one "
        "partial-agg shuffle on (type, bin) — ~100 groups regardless of "
        "input size, so this runs at scan speed on 100 TB.",
)
def events_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    bin_col = F.least(F.floor(F.col("value") / BIN_WIDTH),
                      F.lit(BIN_MAX)).cast("long")
    return (ev.groupBy("event_type", bin_col.alias("bin"))
            .agg(F.count(F.lit(1)).alias("n"),
                 exact_sum("value", 100).alias("sum_value")))


@query(
    "events_rate_spike",
    oracle="""
        WITH h AS (
            SELECT event_type, date_trunc('hour', ts) AS hour_b,
                   COUNT(*) AS cnt
            FROM events GROUP BY event_type, date_trunc('hour', ts)),
        w AS (
            SELECT event_type, hour_b, cnt,
                   CAST(SUM(cnt) OVER (PARTITION BY event_type
                                       ORDER BY hour_b
                                       ROWS BETWEEN 24 PRECEDING
                                            AND 1 PRECEDING) AS BIGINT)
                       AS base_sum,
                   COUNT(cnt) OVER (PARTITION BY event_type ORDER BY hour_b
                                    ROWS BETWEEN 24 PRECEDING
                                         AND 1 PRECEDING) AS base_n
            FROM h)
        SELECT event_type, hour_b, cnt, base_sum, base_n,
               (base_n >= 6 AND
                CAST(cnt * base_n AS DOUBLE) > 3.0 * base_sum) AS is_spike
        FROM w
    """,
    category="extension: anomaly detection (rate spike)",
    doc="Rate-spike detection: each (type, hour) bucket compared against "
        "its own trailing 24-hour baseline — flagged when the count "
        "exceeds 3x the baseline MEAN, with a 6-bucket warm-up guard. "
        "The compare is cross-multiplied (cnt·base_n > 3·base_sum) so "
        "everything but one literal product stays in exact int64 — no "
        "division, no float accumulation, engine-proof. One hourly "
        "aggregation plus one bounded window frame (25 rows of state "
        "per key): the always-on monitoring query over a metrics "
        "stream, runnable identically under Structured Streaming.",
)
def events_rate_spike(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    h = (ev.groupBy("event_type", F.date_trunc("hour", "ts").alias("hour_b"))
         .agg(F.count("*").alias("cnt")))
    w = (Window.partitionBy("event_type").orderBy("hour_b")
         .rowsBetween(-24, -1))
    base_sum = F.sum("cnt").over(w)
    base_n = F.count("cnt").over(w)
    return h.select(
        "event_type", "hour_b", "cnt",
        base_sum.alias("base_sum"), base_n.alias("base_n"),
        ((base_n >= 6)
         & ((F.col("cnt") * base_n).cast("double")
            > 3.0 * base_sum)).alias("is_spike"))


MAINT_WINDOWS = [
    ("w_jan05", "2024-01-05 02:00:00", "2024-01-05 06:00:00"),
    ("w_jan12", "2024-01-12 00:00:00", "2024-01-12 12:00:00"),
    ("w_jan20", "2024-01-20 08:00:00", "2024-01-20 09:00:00"),
    ("w_jan28", "2024-01-28 22:00:00", "2024-01-29 04:00:00"),
]


@query(
    "join_interval_overlap",
    oracle=f"""
        WITH iv AS (
            SELECT user_id, MIN(ts) AS s, MAX(ts) AS e
            FROM events GROUP BY user_id, date_trunc('day', ts)),
        w(win_id, ws, we) AS (VALUES {', '.join(
            f"('{i}', TIMESTAMP '{s}', TIMESTAMP '{e}')"
            for i, s, e in MAINT_WINDOWS)}),
        ov AS (
            SELECT w.win_id, iv.user_id,
                   {{OSEC_UNITS}} AS osec_units
            FROM iv JOIN w ON iv.s < w.we AND w.ws < iv.e)
        SELECT win_id, COUNT(*) AS n_intervals,
               COUNT(DISTINCT user_id) AS n_users,
               CAST(SUM(osec_units) AS BIGINT) AS overlap_usec
        FROM ov GROUP BY win_id
    """.format(OSEC_UNITS=sql_units(
        "epoch(least(iv.e, w.we)) - epoch(greatest(iv.s, w.ws))",
        1000000)),
    category="extension: interval overlap join",
    doc="Interval-overlap join: per-user daily activity intervals "
        "[min ts, max ts] joined against maintenance windows on the "
        "canonical overlap predicate (s1 < e2 AND s2 < e1), reporting "
        "affected interval/user counts and total overlap microseconds "
        "per window. The window table is tiny → broadcast nested-loop "
        "with the predicate in codegen (same strategy as the band range "
        "join; a large-large interval join would bucket both sides by "
        "time slice first, the asof time_slice pattern). Overlap "
        "durations are fixed-pointed to exact integer microseconds "
        "before summing.",
)
def join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flinkapps_spark.plans.exact import units_col
    ev = load_table(spark, sf_dir, "events")
    iv = (ev.groupBy("user_id", F.date_trunc("day", "ts").alias("d"))
          .agg(F.min("ts").alias("s"), F.max("ts").alias("e")))
    w = spark.createDataFrame(MAINT_WINDOWS, "win_id string, ws string, we string") \
        .select("win_id", F.col("ws").cast("timestamp").alias("ws"),
                F.col("we").cast("timestamp").alias("we"))
    ov = iv.join(F.broadcast(w),
                 (F.col("s") < F.col("we")) & (F.col("ws") < F.col("e")))
    osec = (F.least("e", "we").cast("double")
            - F.greatest("s", "ws").cast("double"))
    return (ov.select("win_id", "user_id",
                      units_col(osec, 1000000).alias("osec_units"))
            .groupBy("win_id")
            .agg(F.count("*").alias("n_intervals"),
                 F.countDistinct("user_id").alias("n_users"),
                 F.sum("osec_units").alias("overlap_usec")))


@query(
    "events_mad_outliers",
    oracle="""
        WITH r AS (
            SELECT event_type, value,
                   ROW_NUMBER() OVER (PARTITION BY event_type
                                      ORDER BY value, event_id) AS rn,
                   COUNT(*) OVER (PARTITION BY event_type) AS n
            FROM events),
        med AS (SELECT event_type, value AS med FROM r
                WHERE rn = (n + 1) // 2),
        d AS (SELECT e.event_type, m.med, abs(e.value - m.med) AS dev
              FROM events e JOIN med m USING (event_type)),
        r2 AS (
            SELECT event_type, med, dev,
                   ROW_NUMBER() OVER (PARTITION BY event_type
                                      ORDER BY dev) AS rn,
                   COUNT(*) OVER (PARTITION BY event_type) AS n
            FROM d),
        mad AS (SELECT event_type, med, dev AS mad FROM r2
                WHERE rn = (n + 1) // 2)
        SELECT d.event_type, mad.med, mad.mad,
               COUNT(*) AS n,
               COUNT(CASE WHEN d.dev > mad.mad * 4.4478 THEN 1 END)
                   AS n_outliers
        FROM d JOIN mad USING (event_type)
        GROUP BY d.event_type, mad.med, mad.mad
    """,
    category="extension: robust outliers (median/MAD)",
    doc="Robust outlier detection per event type: lower-median and "
        "median-absolute-deviation picked as EXACT ELEMENTS (row_number "
        "to the (n+1)/2-th smallest — no interpolation arithmetic, so "
        "the statistic is a value that exists in the data and is "
        "bit-identical on any engine; quantile interpolation op order "
        "can differ in the last ulp). Outliers are dev > 4.4478·MAD "
        "(= 3σ under normality). Unlike the z-score variant, one wild "
        "value cannot drag the threshold. Two window passes + one "
        "broadcast-size join per statistic.",
)
def events_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    wv = Window.partitionBy("event_type").orderBy("value", "event_id")
    wc = Window.partitionBy("event_type")
    r = ev.select("event_type", "value",
                  F.row_number().over(wv).alias("rn"),
                  F.count("*").over(wc).alias("n"))
    med = r.filter(F.col("rn") == F.expr("(n + 1) div 2")) \
        .select("event_type", F.col("value").alias("med"))
    d = ev.join(F.broadcast(med), "event_type") \
        .select("event_type", "med",
                F.abs(F.col("value") - F.col("med")).alias("dev"))
    wd = Window.partitionBy("event_type").orderBy("dev")
    r2 = d.select("event_type", "med", "dev",
                  F.row_number().over(wd).alias("rn"),
                  F.count("*").over(wc).alias("n"))
    mad = r2.filter(F.col("rn") == F.expr("(n + 1) div 2")) \
        .select("event_type", "med", F.col("dev").alias("mad"))
    return (d.drop("med").join(F.broadcast(mad), "event_type")
            .groupBy("event_type", "med", "mad")
            .agg(F.count("*").alias("n"),
                 F.count(F.when(F.col("dev") > F.col("mad") * 4.4478, 1))
                 .alias("n_outliers")))


@query(
    "time_multi_rollup",
    oracle=f"""
        SELECT CASE WHEN grouping(hour_b) = 0 THEN 'hour' ELSE 'day' END
                   AS granularity,
               COALESCE(hour_b, day_b) AS bucket,
               event_type,
               COUNT(*) AS n_events,
               {sql_sum('value', 100)} AS sum_value,
               MIN(value) AS min_value,
               MAX(value) AS max_value
        FROM (
            SELECT event_type, value,
                   date_trunc('hour', ts) AS hour_b,
                   date_trunc('day', ts) AS day_b
            FROM events)
        GROUP BY GROUPING SETS ((event_type, day_b, hour_b),
                                (event_type, day_b))
    """,
    category="extension: time-series (multi-granularity rollup)",
    doc="Hypertable-style continuous-aggregate rollup: hourly AND daily "
        "summaries of the event stream in ONE scan via GROUPING SETS over "
        "(type, day, hour) / (type, day) — the materialized-rollup shape "
        "TimescaleDB/Druid serve dashboards from. hour functionally "
        "determines day, so the hour set carries day too and the Expand "
        "operator emits 2 rows per input row into one partial-agg shuffle; "
        "at 100 TB this stays a single pass with ~2x shuffle rows of a "
        "plain hourly agg, vs two full scans for union-of-aggs. Sums are "
        "fixed-point exact; min/max are comparisons (no float arithmetic).",
)
def time_multi_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", "value",
        F.date_trunc("hour", "ts").alias("hour_b"),
        F.date_trunc("day", "ts").alias("day_b"))
    ev.createOrReplaceTempView("events_tmr")
    return spark.sql(f"""
        SELECT CASE WHEN grouping(hour_b) = 0 THEN 'hour' ELSE 'day' END
                   AS granularity,
               COALESCE(hour_b, day_b) AS bucket,
               event_type,
               COUNT(*) AS n_events,
               {sql_sum('value', 100)} AS sum_value,
               MIN(value) AS min_value,
               MAX(value) AS max_value
        FROM events_tmr
        GROUP BY GROUPING SETS ((event_type, day_b, hour_b),
                                (event_type, day_b))
    """)
