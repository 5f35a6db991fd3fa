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
from flinkapps_spark.plans.exact import (
    exact_avg, exact_sum, sql_avg, sql_sum, sql_units, units_col, view_tag,
)
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


# ---------------------------------------------------------------------------
# features_pit_window — point-in-time feature computation (feature-store shape)
# ---------------------------------------------------------------------------

PIT_DAYS = 90         # trailing feature horizon (days, strictly before label)


@query(
    "features_pit_window",
    oracle=f"""
        WITH o AS (
            SELECT o_orderkey AS okey, o_custkey AS custkey,
                   date_diff('day', DATE '1970-01-01',
                             CAST(o_orderdate AS DATE)) AS day,
                   {sql_units('o_totalprice', 100)} AS price_u
            FROM orders)
        SELECT okey, custkey, day,
               COUNT(1) OVER w90 AS prior_cnt_90d,
               CAST(COALESCE(SUM(price_u) OVER w90, 0) AS BIGINT)
                   / CAST(100 AS DOUBLE) AS prior_spend_90d,
               COUNT(1) OVER wlife AS prior_cnt_life
        FROM o
        WINDOW w90 AS (PARTITION BY custkey ORDER BY day
                       RANGE BETWEEN {PIT_DAYS} PRECEDING AND 1 PRECEDING),
               wlife AS (PARTITION BY custkey ORDER BY day
                         RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    """,
    category="extension: point-in-time features (feature store)",
    doc="Feature-store point-in-time correctness: for every order (the "
        "label event) compute the customer's trailing-90-day order count "
        "and spend plus lifetime prior count, using STRICTLY-BEFORE RANGE "
        "frames so no feature leaks the label row or same-day peers "
        "(train/serve skew prevention — the core feature-store guarantee). "
        "Scale: both frames share one (custkey, day) partition/sort, so "
        "Catalyst emits a single Exchange + Sort feeding one Window "
        "operator; the frame is value-based (RANGE on epoch-day) — no "
        "per-row self-join, no Python. Spend is fixed-point exact "
        "(int64 units summed in-frame, divided once).",
)
def features_pit_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    o = orders.select(
        F.col("o_orderkey").alias("okey"),
        F.col("o_custkey").alias("custkey"),
        F.datediff(F.col("o_orderdate").cast("date"),
                   F.to_date(F.lit("1970-01-01"))).alias("day"),
        units_col(F.col("o_totalprice"), 100).alias("price_u"))
    w90 = (Window.partitionBy("custkey").orderBy("day")
           .rangeBetween(-PIT_DAYS, -1))
    wlife = (Window.partitionBy("custkey").orderBy("day")
             .rangeBetween(Window.unboundedPreceding, -1))
    return o.select(
        "okey", "custkey", "day",
        F.count(F.lit(1)).over(w90).alias("prior_cnt_90d"),
        (F.coalesce(F.sum("price_u").over(w90), F.lit(0)) / 100.0)
            .alias("prior_spend_90d"),
        F.count(F.lit(1)).over(wlife).alias("prior_cnt_life"))


# ---------------------------------------------------------------------------
# interp_linear_fill — time-weighted linear interpolation of gaps
# ---------------------------------------------------------------------------

INTERP_SCALE = 1_000_000      # 6-dp fixed-point round of interpolated values


@query(
    "interp_linear_fill",
    oracle=f"""
        WITH g AS (
            SELECT event_id, user_id, ts,
                   CASE WHEN event_id % 5 = 0 THEN NULL ELSE value END AS v,
                   epoch_us(ts) AS tus
            FROM events),
        n AS (
            SELECT event_id, user_id, ts, v, tus,
                   last_value(v IGNORE NULLS) OVER wp AS prev_v,
                   last_value(CASE WHEN v IS NOT NULL THEN tus END
                              IGNORE NULLS) OVER wp AS prev_t,
                   first_value(v IGNORE NULLS) OVER wn AS next_v,
                   first_value(CASE WHEN v IS NOT NULL THEN tus END
                              IGNORE NULLS) OVER wn AS next_t
            FROM g
            WINDOW wp AS (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                   wn AS (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING))
        SELECT event_id, user_id, ts, v IS NULL AS was_null,
               CASE WHEN v IS NOT NULL THEN v
                    WHEN prev_v IS NOT NULL AND next_v IS NOT NULL THEN
                        {sql_units(
                            'prev_v + (next_v - prev_v) * '
                            '(CAST(tus - prev_t AS DOUBLE) '
                            '/ CAST(next_t - prev_t AS DOUBLE))',
                            1_000_000)} / CAST({INTERP_SCALE} AS DOUBLE)
                    ELSE NULL END AS value_filled
        FROM n
    """,
    category="extension: time-series interpolation",
    doc="Time-weighted linear interpolation of missing samples (the "
        "timescaledb `interpolate()` / pandas `interpolate(method='time')` "
        "semantics): values deterministically nulled (event_id %% 5 == 0) "
        "are rebuilt from the nearest non-null neighbors on each side, "
        "weighted by µs timestamp distance; leading/trailing gaps stay "
        "NULL (no extrapolation). Complements window_locf_fill (step "
        "carry-forward) with the continuous estimator. Scale: one shuffle "
        "+ sort per user_id; the four IGNORE-NULLS frames share the same "
        "partition/sort so Catalyst emits one Exchange and one Sort; all "
        "arithmetic is JVM-side (no Python). The interpolated double is "
        "fixed-point-rounded at 6 dp with the engine-identical floor "
        "formula; the ts-ratio divides the same int64 µs on both engines.",
)
def interp_linear_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    g = ev.select(
        "event_id", "user_id", "ts",
        F.when(F.col("event_id") % 5 == 0, None)
            .otherwise(F.col("value")).alias("v"),
        F.unix_micros("ts").alias("tus"))
    wp = (Window.partitionBy("user_id").orderBy("ts", "event_id")
          .rowsBetween(Window.unboundedPreceding, -1))
    wn = (Window.partitionBy("user_id").orderBy("ts", "event_id")
          .rowsBetween(1, Window.unboundedFollowing))
    t_not_null = F.when(F.col("v").isNotNull(), F.col("tus"))
    n = g.select(
        "event_id", "user_id", "ts", "v", "tus",
        F.last("v", ignorenulls=True).over(wp).alias("prev_v"),
        F.last(t_not_null, ignorenulls=True).over(wp).alias("prev_t"),
        F.first("v", ignorenulls=True).over(wn).alias("next_v"),
        F.first(t_not_null, ignorenulls=True).over(wn).alias("next_t"))
    ratio = ((F.col("tus") - F.col("prev_t")).cast("double")
             / (F.col("next_t") - F.col("prev_t")).cast("double"))
    interp = (F.col("prev_v")
              + (F.col("next_v") - F.col("prev_v")) * ratio)
    return n.select(
        "event_id", "user_id", "ts",
        F.col("v").isNull().alias("was_null"),
        F.when(F.col("v").isNotNull(), F.col("v"))
         .when(F.col("prev_v").isNotNull() & F.col("next_v").isNotNull(),
               units_col(interp, INTERP_SCALE) / float(INTERP_SCALE))
         .alias("value_filled"))


# ---------------------------------------------------------------------------
# events_seasonal_baseline — hour-of-day seasonal profile + deviation flags
# ---------------------------------------------------------------------------

SEASONAL_FACTOR = 4.0         # flag events with value > FACTOR * hourly mean


@query(
    "events_seasonal_baseline",
    oracle=f"""
        WITH prof AS (
            SELECT event_type, CAST(EXTRACT(hour FROM ts) AS INTEGER)
                       AS hod,
                   COUNT(*) AS n_in_cell,
                   {sql_sum('value', 100)} AS cell_sum
            FROM events GROUP BY 1, 2),
        p2 AS (
            SELECT event_type, hod, n_in_cell,
                   cell_sum / CAST(n_in_cell AS DOUBLE) AS hourly_mean
            FROM prof)
        SELECT e.event_id, e.event_type,
               CAST(EXTRACT(hour FROM e.ts) AS INTEGER) AS hod,
               e.value, p2.hourly_mean,
               e.value / p2.hourly_mean AS ratio
        FROM events e
        JOIN p2 ON p2.event_type = e.event_type
               AND p2.hod = CAST(EXTRACT(hour FROM e.ts) AS INTEGER)
        WHERE e.value > {SEASONAL_FACTOR!r} * p2.hourly_mean
    """,
    category="extension: seasonal anomaly baseline",
    doc="Seasonal (hour-of-day) baseline anomaly detection: a profile "
        "table of mean value per (event_type, hour-of-day) cell — at most "
        "types x 24 rows regardless of input size — is joined back to the "
        "stream and events exceeding FACTOR x their cell mean are "
        "flagged. Complements events_rate_spike (trailing window) with "
        "the dimensional-seasonality shape Prometheus/Grafana-style "
        "monitors use. Scale: the profile is one partial-agg shuffle to "
        "a provably-bounded table, explicitly broadcast for the join "
        "back, so the fact stream is never shuffled — scan speed at "
        "100 TB. Cell mean is fixed-point exact (unit sum / n, divided "
        "once); the flag compare and ratio are the same deterministic "
        "doubles on both engines.",
)
def events_seasonal_baseline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import broadcast

    ev = load_table(spark, sf_dir, "events")
    hod = F.hour("ts").cast("int")
    prof = (ev.groupBy("event_type", hod.alias("hod"))
            .agg(F.count(F.lit(1)).alias("n_in_cell"),
                 exact_sum("value", 100).alias("cell_sum"))
            .withColumn("hourly_mean",
                        F.col("cell_sum") / F.col("n_in_cell")
                            .cast("double"))
            .drop("cell_sum"))
    e = ev.select("event_id", "event_type", hod.alias("hod"), "value")
    return (e.join(broadcast(prof), ["event_type", "hod"])
            .filter(F.col("value") > SEASONAL_FACTOR * F.col("hourly_mean"))
            .select("event_id", "event_type", "hod", "value", "hourly_mean",
                    (F.col("value") / F.col("hourly_mean")).alias("ratio")))


# ---------------------------------------------------------------------------
# events_winsorized_stats — robust moments via exact-rank clipping
# ---------------------------------------------------------------------------


@query(
    "events_winsorized_stats",
    oracle=f"""
        WITH r AS (
            SELECT event_type, value,
                   row_number() OVER (PARTITION BY event_type
                                      ORDER BY value, event_id) AS rn,
                   COUNT(*) OVER (PARTITION BY event_type) AS n
            FROM events),
        cuts AS (
            SELECT event_type, MAX(n) AS n,
                   MAX(CASE WHEN rn = CAST(ceil(0.01 * n) AS BIGINT)
                            THEN value END) AS p01,
                   MAX(CASE WHEN rn = CAST(ceil(0.99 * n) AS BIGINT)
                            THEN value END) AS p99
            FROM r GROUP BY event_type)
        SELECT e.event_type, MAX(c.n) AS n,
               MAX(c.p01) AS p01, MAX(c.p99) AS p99,
               {sql_sum('value', 100)} / COUNT(*) AS mean_raw,
               {sql_sum('LEAST(GREATEST(e.value, c.p01), c.p99)', 100)}
                   / COUNT(*) AS mean_winsorized,
               CAST(SUM(CASE WHEN e.value < c.p01 OR e.value > c.p99
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped
        FROM events e JOIN cuts c ON c.event_type = e.event_type
        GROUP BY e.event_type
    """,
    category="extension: robust statistics (winsorization)",
    doc="Winsorized moments — the outlier-robust mean every metrics "
        "pipeline needs when heavy-tailed values (payment amounts, "
        "latencies) poison plain averages: per event_type the exact "
        "p01/p99 cut points are RANK PICKS over a (value, event_id) "
        "total order (no interpolation — the picked value is an input "
        "double, engine-identical), values are clipped to the cuts and "
        "both raw and winsorized exact means are emitted with the clip "
        "count. Scale: one sort per event_type for the ranks (the same "
        "shuffle any per-key quantile needs), cut table is ~|types| "
        "rows broadcast back, then one partial-agg pass. Means are "
        "fixed-point unit sums divided once.",
)
def events_winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    wn = Window.partitionBy("event_type")
    r = ev.select(
        "event_type", "value",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"))
    cuts = (r.groupBy("event_type")
            .agg(F.max("n").alias("n"),
                 F.max(F.when(F.col("rn") == F.ceil(0.01 * F.col("n"))
                              .cast("long"), F.col("value"))).alias("p01"),
                 F.max(F.when(F.col("rn") == F.ceil(0.99 * F.col("n"))
                              .cast("long"), F.col("value"))).alias("p99")))
    e = ev.join(F.broadcast(cuts), "event_type")
    clipped = F.least(F.greatest(F.col("value"), F.col("p01")), F.col("p99"))
    return (e.groupBy("event_type")
            .agg(F.max("n").alias("n"),
                 F.max("p01").alias("p01"), F.max("p99").alias("p99"),
                 (exact_sum("value", 100) / F.count(F.lit(1)))
                     .alias("mean_raw"),
                 (exact_sum(clipped, 100) / F.count(F.lit(1)))
                     .alias("mean_winsorized"),
                 F.sum(F.when((F.col("value") < F.col("p01"))
                              | (F.col("value") > F.col("p99")), 1)
                       .otherwise(0)).alias("n_clipped")))


# ---------------------------------------------------------------------------
# events_chi2_independence — contingency-table independence audit
# ---------------------------------------------------------------------------

CHI2_SCALE = 1_000_000        # 6-dp fixed-point for cell contributions


@query(
    "events_chi2_independence",
    oracle=f"""
        WITH obs AS (
            -- DuckDB dayofweek is 0-based Sunday; Spark's is 1-based —
            -- +1 aligns the oracle to Spark's numbering
            SELECT event_type, CAST(dayofweek(ts) + 1 AS BIGINT) AS dow,
                   COUNT(*) AS o
            FROM events GROUP BY 1, 2),
        tot AS (
            SELECT event_type, dow, o,
                   CAST(SUM(o) OVER (PARTITION BY event_type) AS BIGINT)
                       AS row_tot,
                   CAST(SUM(o) OVER (PARTITION BY dow) AS BIGINT)
                       AS col_tot,
                   CAST(SUM(o) OVER () AS BIGINT) AS n
            FROM obs),
        cells AS (
            SELECT event_type, dow, o,
                   CAST(row_tot * col_tot AS DOUBLE) / CAST(n AS DOUBLE)
                       AS expected,
                   {sql_units(
                       '(CAST(o AS DOUBLE) '
                       '- CAST(row_tot * col_tot AS DOUBLE) '
                       '/ CAST(n AS DOUBLE)) '
                       '* (CAST(o AS DOUBLE) '
                       '- CAST(row_tot * col_tot AS DOUBLE) '
                       '/ CAST(n AS DOUBLE)) '
                       '/ (CAST(row_tot * col_tot AS DOUBLE) '
                       '/ CAST(n AS DOUBLE))', 1_000_000)} AS contrib_u
            FROM tot)
        SELECT event_type, dow, o,
               ROUND(expected, 6) AS expected,
               contrib_u / CAST({CHI2_SCALE} AS DOUBLE) AS contrib,
               CAST(SUM(contrib_u) OVER () AS BIGINT)
                   / CAST({CHI2_SCALE} AS DOUBLE) AS chi2_total
        FROM cells
    """,
    category="extension: statistical testing (chi-square)",
    doc="Chi-square independence audit over the (event_type x "
        "day-of-week) contingency table — the drift/independence check "
        "a data-quality monitor runs on categorical features: observed "
        "counts, expected counts under independence (int64 "
        "cross-products divided once), per-cell contributions and the "
        "global chi2 statistic. Per-cell contributions are fixed-point "
        "rounded BEFORE the global sum, so the statistic is an exact "
        "integer sum — immune to float summation order on both "
        "engines. Scale: one partial-agg shuffle to ~|types|x7 cells; "
        "the margins are window sums over that tiny table.",
)
def events_chi2_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    obs = (ev.groupBy("event_type",
                      F.dayofweek("ts").cast("long").alias("dow"))
           .agg(F.count(F.lit(1)).alias("o")))
    tot = obs.select(
        "event_type", "dow", "o",
        F.sum("o").over(Window.partitionBy("event_type")).alias("row_tot"),
        F.sum("o").over(Window.partitionBy("dow")).alias("col_tot"),
        F.sum("o").over(Window.partitionBy()).alias("n"))
    expected = ((F.col("row_tot") * F.col("col_tot")).cast("double")
                / F.col("n").cast("double"))
    diff = F.col("o").cast("double") - expected
    cells = tot.select(
        "event_type", "dow", "o",
        expected.alias("expected_raw"),
        units_col(diff * diff / expected, CHI2_SCALE).alias("contrib_u"))
    return cells.select(
        "event_type", "dow", "o",
        F.round("expected_raw", 6).alias("expected"),
        (F.col("contrib_u") / F.lit(CHI2_SCALE).cast("double"))
            .alias("contrib"),
        (F.sum("contrib_u").over(Window.partitionBy())
         / F.lit(CHI2_SCALE).cast("double")).alias("chi2_total"))


@query(
    "events_concurrency_peaks",
    oracle="""
        WITH iv AS (
            SELECT event_type, ts AS s,
                   ts + to_seconds(greatest(
                       CAST(floor(COALESCE(value, 0)) AS BIGINT), 0)) AS e
            FROM events),
        b AS (
            SELECT event_type, s AS t, 1 AS delta FROM iv
            UNION ALL
            SELECT event_type, e, -1 FROM iv),
        net AS (
            SELECT event_type, date_trunc('hour', t) AS hr, t,
                   SUM(delta) AS net,
                   SUM(CASE WHEN delta = 1 THEN 1 ELSE 0 END) AS n_starts,
                   SUM(CASE WHEN delta = -1 THEN 1 ELSE 0 END) AS n_ends
            FROM b GROUP BY 1, 2, 3),
        run AS (
            SELECT event_type, hr, n_starts, n_ends,
                   SUM(net) OVER (PARTITION BY event_type ORDER BY t
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND CURRENT ROW) AS conc
            FROM net)
        SELECT event_type, hr,
               CAST(MAX(conc) AS BIGINT) AS peak_concurrency,
               CAST(SUM(n_starts) AS BIGINT) AS n_starts,
               CAST(SUM(n_ends) AS BIGINT) AS n_ends
        FROM run GROUP BY 1, 2
    """,
    category="extension: time-series (interval concurrency / sweep-line)",
    doc="Peak concurrent intervals per event_type per hour — the "
        "capacity-planning sweep-line (how many sessions/calls/jobs were "
        "in flight at once).  Each event spans [ts, ts + floor(value) "
        "seconds]; boundaries become +1/-1 deltas, ends processed before "
        "starts at the same instant (end-exclusive), which also makes "
        "the per-timestamp NET delta exact, so equal-time boundaries "
        "collapse by aggregation before any window.  THE SCALE POINT: a "
        "global running sum would drag every boundary through one "
        "ordered partition, so the engine uses the two-phase distributed "
        "prefix sum instead — (1) within-hour running sums, partitioned "
        "by (type, hour); (2) a cross-hour offset window over the TINY "
        "per-hour net table (|types| x |hours| rows); peak = offset + "
        "within-hour max.  The oracle runs the simple one-window form — "
        "same result, so the decomposition's correctness is what the "
        "parity check proves.  Concurrency is sampled AT boundaries "
        "(hours with no boundary emit no row; a spanning interval's "
        "contribution is carried into later hours by the offset).",
)
def events_concurrency_peaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    dur = F.greatest(
        F.floor(F.coalesce(F.col("value"), F.lit(0.0))).cast("long"),
        F.lit(0).cast("long"))
    iv = ev.select(
        "event_type", F.col("ts").alias("s"),
        F.timestamp_add("SECOND", dur, F.col("ts")).alias("e"))
    b = iv.select("event_type", F.col("s").alias("t"),
                  F.lit(1).alias("delta")).unionByName(
        iv.select("event_type", F.col("e").alias("t"),
                  F.lit(-1).alias("delta")))
    net = (b.groupBy("event_type",
                     F.date_trunc("hour", "t").alias("hr"), "t")
           .agg(F.sum("delta").alias("net"),
                F.sum(F.when(F.col("delta") == 1, 1).otherwise(0))
                    .alias("n_starts"),
                F.sum(F.when(F.col("delta") == -1, 1).otherwise(0))
                    .alias("n_ends")))
    # phase 1: running sum WITHIN each (type, hour) partition — shuffle
    # is keyed by (type, hour), so no partition ever exceeds one hour of
    # one type's boundaries regardless of corpus size
    w_in = (Window.partitionBy("event_type", "hr").orderBy("t")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    within = net.withColumn("run_in", F.sum("net").over(w_in))
    hour_stats = (within.groupBy("event_type", "hr")
                  .agg(F.max("run_in").alias("peak_in"),
                       F.sum("net").alias("hour_net"),
                       F.sum("n_starts").alias("n_starts"),
                       F.sum("n_ends").alias("n_ends")))
    # phase 2: carry-in offset = cumulative net of all PRIOR hours; the
    # window runs over the per-hour summary (|types| x |hours| rows),
    # never over raw boundaries
    w_off = (Window.partitionBy("event_type").orderBy("hr")
             .rowsBetween(Window.unboundedPreceding, -1))
    offset = F.coalesce(F.sum("hour_net").over(w_off),
                        F.lit(0).cast("long"))
    return hour_stats.select(
        "event_type", "hr",
        (offset + F.col("peak_in")).cast("long").alias("peak_concurrency"),
        F.col("n_starts").cast("long").alias("n_starts"),
        F.col("n_ends").cast("long").alias("n_ends"))


# ---------------------------------------------------------------------------
# events_changepoint_cusum — integer-exact CUSUM drift detection
# ---------------------------------------------------------------------------

CUSUM_SCALE = 100   # fixed-point scale for hourly value sums
CUSUM_K = 2         # flag when |cusum| exceeds K average-hours of drift


@query(
    "events_changepoint_cusum",
    oracle=f"""
        WITH h AS (
            SELECT event_type, date_trunc('hour', ts) AS hr,
                   CAST(SUM({sql_units('value', CUSUM_SCALE)}) AS BIGINT)
                       AS s_units
            FROM events GROUP BY event_type, hr),
        c AS (
            SELECT event_type, hr, s_units,
                   CAST(SUM(s_units) OVER (PARTITION BY event_type)
                        AS BIGINT) AS stot,
                   COUNT(*) OVER (PARTITION BY event_type) AS nh,
                   CAST(SUM(s_units) OVER (PARTITION BY event_type
                                           ORDER BY hr
                                           ROWS UNBOUNDED PRECEDING)
                        AS BIGINT) AS pref,
                   ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY hr)
                       AS t_idx
            FROM h)
        SELECT event_type, hr, s_units,
               nh * pref - t_idx * stot AS cusum_units,
               abs(nh * pref - t_idx * stot) > {CUSUM_K} * abs(stot)
                   AS drift_flag
        FROM c
    """,
    category="extension: time series (changepoint detection)",
    doc="CUSUM changepoint/drift screen per event type over hourly "
        "value sums: cusum_t = nh*prefix_t - t*total is the cumulative "
        "deviation from the per-type mean hourly sum, scaled by nh so "
        "the WHOLE statistic stays in exact int64 fixed-point units — "
        "no mean division, no float, so the drift flag compares "
        "bit-identically on both engines (flag when the accumulated "
        "deviation exceeds K=2 average-hours — chosen so the flag splits both ways at sf0.01 AND sf1: the random-walk cusum grows ~sqrt while the total grows linearly, so any fixed multiple gets harder to cross at scale). The page-view/telemetry "
        "monitoring primitive (Page 1954). Scale: one partial-agg "
        "shuffle events->hourly (bounded hours x types rows), then "
        "windows over the tiny hourly frame share one (type, hr) "
        "sort; int64 holds through nh*pref at any realistic horizon "
        "(~1e14 at 1e5 hours of 1e9-unit sums).",
)
def events_changepoint_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    h = (ev.groupBy("event_type",
                    F.date_trunc("hour", F.col("ts")).alias("hr"))
         .agg(F.sum(units_col("value", CUSUM_SCALE)).alias("s_units")))
    wt = Window.partitionBy("event_type")
    wo = (wt.orderBy("hr")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    c = h.select(
        "event_type", "hr", "s_units",
        F.sum("s_units").over(wt).alias("stot"),
        F.count("*").over(wt).alias("nh"),
        F.sum("s_units").over(wo).alias("pref"),
        F.row_number().over(wt.orderBy("hr")).alias("t_idx"))
    cusum = F.col("nh") * F.col("pref") - F.col("t_idx") * F.col("stot")
    return c.select(
        "event_type", "hr", "s_units",
        cusum.alias("cusum_units"),
        (F.abs(cusum) > CUSUM_K * F.abs(F.col("stot"))).alias("drift_flag"))


# ---------------------------------------------------------------------------
# events_time_weighted_avg — TWAP via exact integer gap weighting
# ---------------------------------------------------------------------------

TWAP_SCALE = 100   # fixed-point value units (matches OHLC volume scale)


@query(
    "events_time_weighted_avg",
    oracle=f"""
        WITH t AS (
            SELECT event_type, epoch_us(ts) AS us, event_id,
                   {sql_units('value', TWAP_SCALE)} AS units
            FROM events),
        g AS (
            SELECT event_type, units,
                   (lead(us) OVER (PARTITION BY event_type
                                   ORDER BY us, event_id) - us) // 1000
                       AS gap_ms
            FROM t)
        SELECT event_type,
               CAST(SUM(units * gap_ms) AS BIGINT) AS weighted_units_ms,
               CAST(SUM(gap_ms) AS BIGINT) AS total_ms,
               CAST(SUM(units * gap_ms) AS BIGINT)
                   / (CAST(SUM(gap_ms) AS BIGINT)
                      * CAST({TWAP_SCALE} AS DOUBLE)) AS twap
        FROM g WHERE gap_ms IS NOT NULL
        GROUP BY event_type
    """,
    category="extension: time series (time-weighted average)",
    doc="Time-weighted average per event type (TimescaleDB time_weight / "
        "the last-observation-carried-forward TWAP): each value is "
        "weighted by how long it remained current (the integer "
        "millisecond gap to the next observation of the same type), so "
        "irregular sampling cannot bias the mean the way a plain AVG "
        "does. The whole statistic is exact int64 — fixed-point value "
        "units x integer ms gaps, one final division — so it is "
        "bit-deterministic across engines; int64 holds to ~10-year "
        "streams at this scale (units*gap sums ~1e16 < 2^63). Plan: one "
        "(type, time) window sort shared with a partial-agg reduce — "
        "two exchanges, no joins, no Python.",
)
def events_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.unix_micros("ts").alias("us"), "event_id",
        units_col("value", TWAP_SCALE).alias("units"))
    w = Window.partitionBy("event_type").orderBy("us", "event_id")
    g = ev.select(
        "event_type", "units",
        (F.lead("us").over(w) - F.col("us")).alias("gap_us"))
    g = g.withColumn("gap_ms", F.expr("gap_us div 1000"))
    agg = (g.filter(F.col("gap_ms").isNotNull())
           .groupBy("event_type")
           .agg(F.sum(F.col("units") * F.col("gap_ms"))
                .alias("weighted_units_ms"),
                F.sum("gap_ms").alias("total_ms")))
    return agg.select(
        "event_type", "weighted_units_ms", "total_ms",
        (F.col("weighted_units_ms")
         / (F.col("total_ms") * F.lit(TWAP_SCALE).cast("double")))
        .alias("twap"))


# ---------------------------------------------------------------------------
# events_trend_theilsen — robust trend via the median of pairwise slopes
# ---------------------------------------------------------------------------

TS_SCALE = 100       # fixed-point scale for hourly value sums
TS_HIST_BINS = 1024  # slope-histogram resolution (hist escape path)
TS_HIST_SPAN = 2048  # hours per type beyond which auto mode switches
#   (2048 hours ~ 3 months -> ~2M pairs/type: past this the per-type
#   single-partition sort, not the pair join, is the bottleneck)


@query(
    "events_trend_theilsen",
    oracle=f"""
        WITH h AS (
            SELECT event_type,
                   epoch_us(date_trunc('hour', ts)) // 3600000000 AS hr,
                   CAST(SUM({sql_units('value', TS_SCALE)}) AS BIGINT)
                       AS u
            FROM events GROUP BY event_type, hr),
        p AS (
            SELECT a.event_type,
                   (b.u - a.u) / CAST(b.hr - a.hr AS DOUBLE) AS slope
            FROM h a JOIN h b
              ON a.event_type = b.event_type AND a.hr < b.hr),
        r AS (
            SELECT event_type, slope,
                   ROW_NUMBER() OVER (PARTITION BY event_type
                                      ORDER BY slope) AS rn,
                   COUNT(*) OVER (PARTITION BY event_type) AS n_pairs
            FROM p)
        SELECT event_type, n_pairs,
               slope / {TS_SCALE} AS theilsen_slope
        FROM r WHERE rn = (n_pairs + 1) // 2
    """,
    category="extension: time series (robust trend, Theil-Sen)",
    doc="Theil-Sen trend per event type: the LOWER MEDIAN of all pairwise "
        "slopes between hourly sums — the robust regression slope that "
        "tolerates up to ~29% outliers where OLS (stats_corr_regression) "
        "breaks (Sen 1968). Every slope is one division of exact int64 "
        "deltas (fixed-point units over integer hour indices), so the "
        "slope multiset is bit-identical across engines and the median "
        "pick cannot drift; the lower median avoids averaging two "
        "doubles. Scale: events collapse to the hourly frame in one "
        "partial-agg shuffle; the pair self-join is bounded by "
        "HOURS^2 per type (~260k pairs per type-month), never by event "
        "volume. For long spans the window path's weakness is the "
        "per-type SINGLE-PARTITION sort of all HOURS^2/2 slopes — "
        "hist_mode=True (or hist_mode=None to auto-switch past "
        "span_threshold hours) replaces it with exact_median_selection's "
        "two-pass histogram narrowing: the pair join still streams, but "
        "only through partial-agg shuffles (extent, then a 1024-bin "
        "histogram — |types|x1024 cells visit the driver), and the only "
        "sort ranks the ~1/1000 of slopes inside each type's median bin. "
        "A decade-long span's ~3.8B pairs/type aggregate instead of "
        "sorting on one task. Identical result by construction (rank k "
        "BY VALUE — the emitted slope equals the window path's pick, "
        "ties included); tests pin window==hist==oracle.",
)
def events_trend_theilsen(spark: SparkSession, sf_dir: str,
                          hist_mode: bool | None = False,
                          span_threshold: int = TS_HIST_SPAN) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    # persist: the pair self-join reads the hourly frame on both sides
    # (and the hist path re-streams it per pass) — un-persisted, each
    # reference re-scanned events and redid the partial agg (guide §1.2).
    # |types|·|hours| rows, tiny at any scale.
    h = (ev.groupBy(
            "event_type",
            (F.unix_micros(F.date_trunc("hour", F.col("ts")))
             / F.lit(3_600_000_000)).cast("long").alias("hr"))
         .agg(F.sum(units_col("value", TS_SCALE)).alias("u"))
         .persist())
    h.count()
    if hist_mode is None:
        # auto: one cheap action over the bounded hourly frame decides;
        # the default (False) keeps the driver-measured path single-pass
        longest = (h.groupBy("event_type").count()
                   .agg(F.max("count")).first()[0]) or 0
        hist_mode = longest > span_threshold

    def pairs() -> DataFrame:
        a = h.select(F.col("event_type"), F.col("hr").alias("ha"),
                     F.col("u").alias("ua"))
        b = h.select(F.col("event_type"), F.col("hr").alias("hb"),
                     F.col("u").alias("ub"))
        return (a.join(b, "event_type")
                .filter(F.col("ha") < F.col("hb"))
                .select("event_type",
                        ((F.col("ub") - F.col("ua"))
                         / (F.col("hb") - F.col("ha")).cast("double"))
                        .alias("slope")))

    if not hist_mode:
        p = pairs()
        wt = Window.partitionBy("event_type")
        r = p.select(
            "event_type", "slope",
            F.row_number().over(wt.orderBy("slope")).alias("rn"),
            F.count("*").over(wt).alias("n_pairs"))
        return (r.filter(F.col("rn") == F.expr("(n_pairs + 1) div 2"))
                .select("event_type", "n_pairs",
                        (F.col("slope") / TS_SCALE).alias("theilsen_slope")))
    return _theilsen_hist(spark, pairs)


def _theilsen_hist(spark: SparkSession, pairs) -> DataFrame:
    """Two-pass histogram median over the pairwise-slope stream — the
    exact_median_selection machinery (relational_queries.py) applied to
    a DERIVED stream instead of a base table: the C(H,2)-row pair join
    re-streams per pass (its inputs are the tiny hourly frame) and each
    pass reduces it map-side, so no task ever holds or sorts a type's
    full slope multiset.  Bin edges derive from exact min/max doubles;
    bin index is subtract/divide/floor — engine-internal only (the
    oracle never bins), so cross-engine float identity is not in play."""
    # pass 0: per-type slope extent + pair count (one partial-agg shuffle)
    ext = {r["event_type"]: r for r in
           pairs().groupBy("event_type")
           .agg(F.min("slope").alias("lo"), F.max("slope").alias("hi"),
                F.count("*").alias("n")).collect()}
    if not ext:
        # no type has >= 2 hourly buckets: same empty frame (and schema)
        # the window path returns
        return spark.createDataFrame(
            [], "event_type string, n_pairs long, theilsen_slope double")

    # Per-type bin params ride in a BROADCAST frame, not per-type when()
    # branches: with T event types an inlined CASE chain is O(T) deep per
    # row and blows past codegen limits on exactly the high-cardinality
    # long-span path this escape targets; a broadcast hash join is O(1)
    # per row at any T (ADVICE r6).  Bin width is computed driver-side
    # (same IEEE double the when-chain form shipped as literals).
    meta = spark.createDataFrame(
        [(t, float(r["lo"]),
          float((r["hi"] - r["lo"]) / TS_HIST_BINS or 1.0), int(r["n"]))
         for t, r in ext.items()],
        "event_type string, lo double, w double, n long")
    bin_col = F.least(
        F.floor((F.col("slope") - F.col("lo")) / F.col("w")),
        F.lit(TS_HIST_BINS - 1)).cast("long")
    # pass 1: histogram (partial-agg; |types| x bins cells to the driver)
    hist = {(r["event_type"], r["bin"]): r["cnt"] for r in
            pairs().join(F.broadcast(meta), "event_type")
            .select("event_type", bin_col.alias("bin"))
            .groupBy("event_type", "bin")
            .agg(F.count("*").alias("cnt")).collect()}
    target = []          # (type, median_bin, rank_within_bin) rows
    for t, info in ext.items():
        k = (info["n"] + 1) // 2
        cum = 0
        for bn in range(TS_HIST_BINS):
            c = hist.get((t, bn), 0)
            if cum + c >= k:
                target.append((t, bn, k - cum))
                break
            cum += c
    tgt = spark.createDataFrame(
        target, "event_type string, target_bin long, k_in long")
    # pass 2: rank only the slopes inside each type's median bin
    binned = (pairs()
              .join(F.broadcast(meta.join(tgt, "event_type")), "event_type")
              .withColumn("bin", bin_col))
    ranked = (binned.filter(F.col("bin") == F.col("target_bin"))
              .withColumn("rn", F.row_number().over(
                  Window.partitionBy("event_type").orderBy("slope"))))
    return (ranked.filter(F.col("rn") == F.col("k_in"))
            .select("event_type",
                    F.col("n").alias("n_pairs"),
                    (F.col("slope") / TS_SCALE).alias("theilsen_slope")))


# ---------------------------------------------------------------------------
# events_autocorrelation — lag-k ACF of the hourly count series
# ---------------------------------------------------------------------------

ACF_LAGS = (1, 2, 3, 6, 12, 24)


def _acf_oracle() -> str:
    lag_cols = ",\n                   ".join(
        f"lag(c, {k}) OVER (PARTITION BY event_type ORDER BY t) AS b{k}"
        for k in ACF_LAGS)
    pair_union = "\n            UNION ALL ".join(
        f"SELECT event_type, n, s, den, c, {k} AS lag, b{k} AS cb "
        f"FROM lagged WHERE b{k} IS NOT NULL"
        for k in ACF_LAGS)
    return f"""
        WITH hourly AS (
            SELECT event_type,
                   CAST(epoch_us(date_trunc('hour', ts)) / 3600000000
                        AS BIGINT) AS t,
                   COUNT(*) AS c
            FROM events GROUP BY 1, 2),
        ann AS (
            SELECT event_type, t, c,
                   COUNT(*) OVER (PARTITION BY event_type) AS n,
                   CAST(SUM(c) OVER (PARTITION BY event_type) AS BIGINT)
                       AS s
            FROM hourly),
        lagged AS MATERIALIZED (
            SELECT event_type, n, s, c,
                   CAST(SUM((n * c - s) * (n * c - s))
                        OVER (PARTITION BY event_type) AS BIGINT) AS den,
                   {lag_cols}
            FROM ann),
        pairs AS (
            {pair_union})
        SELECT event_type, CAST(lag AS INT) AS lag,
               COUNT(*) AS n_pairs,
               CAST(SUM((n * cb - s) * (n * c - s)) AS BIGINT)
               / CAST(NULLIF(MAX(den), 0) AS DOUBLE) AS acf
        FROM pairs GROUP BY event_type, lag
    """


@query(
    "events_autocorrelation",
    oracle=_acf_oracle(),
    category="extension: autocorrelation",
    doc="Lag-k autocorrelation of the hourly event-count series per "
        "type (k in 1,2,3,6,12,24) — the seasonality/memory diagnostic "
        "behind 'is this stream hourly-periodic?'. The estimator is "
        "cross-multiplied to integers: with n hours and total S, "
        "acf_k = Σ(n·c_t - S)(n·c_{{t-k}} - S) / Σ(n·c_t - S)² — both "
        "sums exact int64 (the n² denominators cancel), one final "
        "division. Lagged pairs are ROW lags over the observed hourly "
        "sequence (one shared window sort; identical on both engines; "
        "equivalent to time lags whenever the series is gap-free — "
        "events_gap_fill is the densify step otherwise). Scale: events "
        "collapse to the hourly frame in one partial-agg shuffle; ALL "
        "windows (n, S, den, the six lags) share one (type)-partition "
        "sort on that bounded frame — a single scan and no join "
        "(a lag self-join re-executed the hourly aggregation per "
        "branch). int64 headroom: |n·c - S| <= n·max(c); overflow "
        "needs n·max(c) past 3e9 — years of hours times billions-per-"
        "hour; aggregate to days first at that point.",
)
def events_autocorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    hourly = (ev.groupBy(
        "event_type",
        (F.unix_micros(F.date_trunc("hour", "ts")) / 3_600_000_000)
        .cast("long").alias("t"))
        .agg(F.count("*").alias("c")))
    wp = Window.partitionBy("event_type")
    wo = wp.orderBy("t")
    ann = hourly.select(
        "event_type", "t", "c",
        F.count("*").over(wp).alias("n"),
        F.sum("c").over(wp).alias("s"))
    dev = F.col("n") * F.col("c") - F.col("s")
    lagged = ann.select(
        "event_type", "n", "s", "c",
        F.sum(dev * dev).over(wp).alias("den"),
        *[F.lag("c", k).over(wo).alias(f"b{k}") for k in ACF_LAGS])
    pairs = (lagged.select(
        "event_type", "n", "s", "den", "c",
        F.explode(F.array(*[
            F.struct(F.lit(k).alias("lag"), F.col(f"b{k}").alias("cb"))
            for k in ACF_LAGS])).alias("p"))
        .select("event_type", "n", "s", "den", "c",
                F.col("p.lag").alias("lag"), F.col("p.cb").alias("cb"))
        .filter(F.col("cb").isNotNull()))
    return (pairs.groupBy("event_type", "lag")
            .agg(F.count("*").alias("n_pairs"),
                 (F.sum((F.col("n") * F.col("cb") - F.col("s"))
                        * (F.col("n") * F.col("c") - F.col("s")))
                  / F.nullif(F.max("den"), F.lit(0)).cast("double"))
                 .alias("acf"))
            .select("event_type", F.col("lag").cast("int").alias("lag"),
                    "n_pairs", "acf"))


# ---------------------------------------------------------------------------
# orders_max_drawdown
# ---------------------------------------------------------------------------


@query(
    "orders_max_drawdown",
    oracle=f"""
        WITH d AS (
            SELECT c_mktsegment AS seg,
                   date_trunc('day', o_orderdate) AS day,
                   CAST(SUM({sql_units('o_totalprice', 100)}) AS BIGINT) AS su
            FROM orders JOIN customer ON o_custkey = c_custkey
            GROUP BY 1, 2),
        r AS (
            SELECT seg, su,
                   CAST(MAX(su) OVER (PARTITION BY seg ORDER BY day
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                        AS BIGINT) AS runmax
            FROM d)
        SELECT seg, COUNT(*) AS n_days,
               CAST(MAX(su) AS BIGINT) AS peak_cents,
               CAST(MAX(runmax - su) AS BIGINT) AS max_drawdown_cents
        FROM r GROUP BY seg
    """,
    category="extension: time-series drawdown",
    doc="Largest peak-to-trough decline in DAILY revenue per customer "
        "segment: a running max over the per-day totals, drawdown = "
        "running peak minus today, maximized — the health metric a "
        "revenue dashboard tracks (how far below the best day have we "
        "fallen, and per segment). Entirely int64 cent units; no "
        "division at all. Scale: the corpus reduces through a partial- "
        "aggregated (segment, day) shuffle FIRST, so the running-max "
        "window rides a series bounded by the date domain x 5 segments "
        "(~2.4k rows/segment here), never raw order volume.",
)
def orders_max_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer") \
        .select("c_custkey", F.col("c_mktsegment").alias("seg"))
    d = (load_table(spark, sf_dir, "orders")
         .join(cust, F.col("o_custkey") == F.col("c_custkey"))
         .groupBy("seg", F.date_trunc("day", "o_orderdate").alias("day"))
         .agg(F.sum(units_col("o_totalprice", 100)).alias("su")))
    w = (Window.partitionBy("seg").orderBy("day")
         .rowsBetween(Window.unboundedPreceding, 0))
    r = d.select("seg", "su", F.max("su").over(w).alias("runmax"))
    return r.groupBy("seg").agg(
        F.count("*").alias("n_days"),
        F.max("su").alias("peak_cents"),
        F.max(F.col("runmax") - F.col("su")).alias("max_drawdown_cents"))


# ---------------------------------------------------------------------------
# events_forecast_backtest — seasonal-naive forecast scored on a holdout
# ---------------------------------------------------------------------------

FB_HOLDOUT_DAYS = 7       # test window: the last 7 observed days
FB_MAE_SCALE = 10 ** 6    # fixed-point units for the |a-f| terms
FB_SMAPE_SCALE = 10 ** 9  # fixed-point units for the sMAPE terms


@query(
    "events_forecast_backtest",
    oracle=f"""
        WITH per_day AS (
            SELECT event_type, CAST(ts AS DATE) AS d,
                   CAST(COUNT(*) AS BIGINT) AS cnt
            FROM events GROUP BY 1, 2),
        mx AS (SELECT MAX(d) AS maxd FROM per_day),
        train AS (
            SELECT event_type, isodow(d) - 1 AS wd,
                   CAST(COUNT(*) AS BIGINT) AS n_days,
                   CAST(SUM(cnt) AS BIGINT) AS s
            FROM per_day, mx
            WHERE d <= maxd - {FB_HOLDOUT_DAYS}
            GROUP BY 1, 2),
        test AS (
            SELECT event_type, isodow(d) - 1 AS wd, cnt
            FROM per_day, mx
            WHERE d > maxd - {FB_HOLDOUT_DAYS}),
        joined AS (
            SELECT t.event_type, t.cnt,
                   tr.s / CAST(tr.n_days AS DOUBLE) AS fmean
            FROM test t
            JOIN train tr ON tr.event_type = t.event_type
                         AND tr.wd = t.wd)
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n_test_days,
               {sql_avg('ABS(cnt - fmean)', FB_MAE_SCALE)} AS mae,
               {sql_avg('2 * ABS(cnt - fmean) / (cnt + fmean)',
                        FB_SMAPE_SCALE)} AS smape
        FROM joined GROUP BY event_type
    """,
    category="extension: forecast backtesting (seasonal naive)",
    doc="Backtest of the seasonal-naive forecaster: the last 7 observed "
        "days are held out, the forecast for each (event_type, weekday) "
        "is the mean daily event count over the TRAINING days of that "
        "weekday, and the readout is per-type MAE and sMAPE on the "
        "holdout — the minimal honest baseline every fancier forecast "
        "must beat (complements events_seasonal_baseline, which flags "
        "anomalies rather than scoring forecasts). Weekday is "
        "Monday=0 on both engines (Spark weekday(), DuckDB isodow-1). "
        "Determinism: daily counts are int64; the forecast divides "
        "once; |a-f| and 2|a-f|/(a+f) are identical double expressions "
        "and their per-day terms sum in FIXED-POINT units "
        "(order-independent) before one exact_avg division. Scale: one "
        "partial-agg shuffle to the bounded (type, day) frame — cached "
        "eagerly since the scalar max-date and the train profile both "
        "ride broadcast stages (prefix-module AQE note) — everything "
        "after is bounded by the date domain, not the corpus.",
)
def events_forecast_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark import StorageLevel

    per_day = (load_table(spark, sf_dir, "events")
               .groupBy("event_type", F.to_date("ts").alias("d"))
               .agg(F.count("*").alias("cnt"))
               .persist(StorageLevel.MEMORY_AND_DISK))
    per_day.count()
    mx = per_day.agg(F.max("d").alias("maxd"))
    pd_m = per_day.crossJoin(F.broadcast(mx))
    cutoff = F.date_sub(F.col("maxd"), FB_HOLDOUT_DAYS)
    train = (pd_m.filter(F.col("d") <= cutoff)
             .groupBy("event_type", F.weekday("d").alias("wd"))
             .agg(F.count("*").alias("n_days"), F.sum("cnt").alias("s")))
    test = (pd_m.filter(F.col("d") > cutoff)
            .select("event_type", F.weekday("d").alias("wd"), "cnt"))
    joined = (test.join(F.broadcast(
        train.select("event_type", "wd",
                     (F.col("s") / F.col("n_days").cast("double"))
                     .alias("fmean"))), ["event_type", "wd"]))
    a_err = F.abs(F.col("cnt") - F.col("fmean"))
    return (joined.groupBy("event_type")
            .agg(F.count("*").alias("n_test_days"),
                 exact_avg(a_err, FB_MAE_SCALE).alias("mae"),
                 exact_avg(2 * a_err / (F.col("cnt") + F.col("fmean")),
                           FB_SMAPE_SCALE).alias("smape")))


# ---------------------------------------------------------------------------
# events_holt_linear — recursive-CTE Holt smoothing, same SQL on both engines
# ---------------------------------------------------------------------------

HOLT_SCALE = 10 ** 6      # fixed-point units per daily count
# alpha = 1/2, beta = 1/4: the exact-binary smoothing factors make each
# step a floor-div of small integer sums (no float state anywhere)

_HOLT_LNEXT = ("CAST(floor(CAST(b.cnt * 1000000 + h.l_u + h.b_u "
               "AS DOUBLE) / 2) AS BIGINT)")


def _holt_recursion(daily_src: str, unit: str = "day") -> str:
    """The Holt recursion over a (event_type, d, cnt) period grid —
    ``daily_src`` is either the inline corpus agg (oracle form) or a
    pre-materialized grid view (engine form; see events_holt_linear for
    why).  ``unit`` names the output columns (day/week grain)."""
    return f"""
    WITH RECURSIVE base AS (
        SELECT event_type, d, cnt,
               ROW_NUMBER() OVER (PARTITION BY event_type
                                  ORDER BY d) AS k
        FROM {daily_src}
    ),
    holt AS (
        SELECT event_type, k, CAST(cnt * 1000000 AS BIGINT) AS l_u,
               CAST(0 AS BIGINT) AS b_u
        FROM base WHERE k = 1
      UNION ALL
        SELECT b.event_type, b.k,
               {_HOLT_LNEXT} AS l_u,
               CAST(floor(CAST(({_HOLT_LNEXT} - h.l_u) + 3 * h.b_u
                   AS DOUBLE) / 4) AS BIGINT) AS b_u
        FROM holt h JOIN base b
          ON b.event_type = h.event_type AND b.k = h.k + 1
    ),
    last AS (SELECT event_type, MAX(k) AS kmax FROM base
             GROUP BY event_type)
    SELECT h.event_type, h.k AS n_{unit}s, h.l_u, h.b_u,
           h.l_u / CAST(1000000 AS DOUBLE) AS level_smoothed,
           h.b_u / CAST(1000000 AS DOUBLE) AS trend_per_{unit},
           (h.l_u + h.b_u) / CAST(1000000 AS DOUBLE) AS forecast_next
    FROM holt h JOIN last l
      ON l.event_type = h.event_type AND l.kmax = h.k
"""


_HOLT_DAY_EXPR = "CAST(ts AS DATE)"
_HOLT_WEEK_EXPR = "CAST(date_trunc('week', ts) AS DATE)"


def _holt_daily_agg(table: str, day_expr: str) -> str:
    return (f"(SELECT event_type, {day_expr} AS d, "
            f"CAST(COUNT(*) AS BIGINT) AS cnt FROM {table} "
            f"GROUP BY 1, 2)")


# day-grain template over a raw events view (oracle form; also the
# plan-pin fixture in tests/test_plans_scale.py)
_HOLT_SQL = _holt_recursion(_holt_daily_agg("{table}", _HOLT_DAY_EXPR))


@query(
    "events_holt_linear",
    oracle=_HOLT_SQL.format(table="events"),
    category="extension: time-series (Holt linear smoothing, recursive CTE)",
    doc="Holt double-exponential smoothing of daily event volume per "
        "type — level + trend state evolved day by day, the one-line "
        "forecaster a volume dashboard runs next to the seasonal-naive "
        "backtest (events_forecast_backtest scores it). The SAME SQL "
        "text executes on both engines (only the view name differs): "
        "Spark 4 runs WITH RECURSIVE natively (UnionLoop — second use "
        "after sql_recursive_hierarchy, here with a JOIN back to the "
        "static day grid inside the recursive member). Determinism: "
        "alpha=1/2 and beta=1/4 turn each update into integer sums + a "
        "floor through an exactly-representable double (values < 2^53) "
        "— NO float state crosses a step, so 30 chained steps cannot "
        "accumulate engine drift. The ORACLE keeps the recursive-CTE "
        "form; the engine form (round 9) folds the same update across "
        "each type's date-sorted period array with aggregate() — the "
        "recursion is linear per type, so one codegen fold replaces "
        "#periods UnionLoop jobs (the round-7 UnionLoop form cost one "
        "scheduler round-trip per day: measured 4.8 s -> sub-second at "
        "sf0.1). shiftright is the exact integer form of the oracle's "
        "floor-halving for |values| < 2^53, the documented range. "
        "Scale: the grid is one partial-agg shuffle over the corpus, "
        "bounded by the calendar; the fold state is 2 int64 per type; "
        "coarsen to weeks past a ~3-month window "
        "(events_holt_linear_weekly — grain='week').",
)
def events_holt_linear(spark: SparkSession, sf_dir: str,
                       grain: str = "day") -> DataFrame:
    # Round-9 optimization (guide §2.4 — remove shuffles/passes
    # outright): the WITH RECURSIVE engine form launched one Spark job
    # per recursion step (UnionLoop executes the recursive member
    # #periods times — ~30 scheduler round-trips over a tiny grid,
    # measured 4.8 s at sf0.1), plus two localCheckpoints and a scoped
    # conf raise.  The recursion is a per-type LINEAR fold over the
    # date-sorted period grid, so it now runs as ONE aggregate():
    # collect each type's (d, cnt) rows into a sorted array (the grid
    # is calendar-bounded — thousands of elements at most, the same
    # bound the recursive form relied on) and fold the Holt update
    # across it inside codegen.  Exactness is unchanged: alpha=1/2,
    # beta=1/4 make each step integer sums + a floor-halving, and
    # shiftright IS floor division by 2^k on int64 (arithmetic shift,
    # negatives included) — the same integers the oracle's
    # floor(double)/CAST chain produces for |values| < 2^53, the
    # operator's documented range.  One partial-agg exchange + one
    # per-type exchange, no recursion, no Python, no checkpoint.
    if grain not in ("day", "week"):
        raise ValueError(f"grain must be 'day' or 'week', got {grain!r}")
    period = (F.to_date("ts") if grain == "day"
              else F.date_trunc("week", F.col("ts")).cast("date"))
    grid = (load_table(spark, sf_dir, "events")
            .groupBy("event_type", period.alias("d"))
            .agg(F.count("*").cast("long").alias("cnt")))
    g = grid.groupBy("event_type").agg(
        F.array_sort(F.collect_list(F.struct("d", "cnt"))).alias("xs"))

    def step(acc, x):
        # l' = (cnt·S + l + b) >> 1 ; b' = (l' − l + 3b) >> 2  — the
        # exact integer form of the oracle's floor((...)/2), floor((...)/4)
        lnext = F.shiftright(
            x["cnt"] * F.lit(HOLT_SCALE).cast("long") + acc["l"] + acc["b"],
            1)
        return F.struct(
            lnext.alias("l"),
            F.shiftright(lnext - acc["l"] + 3 * acc["b"], 2).alias("b"))

    init = F.struct(
        (F.element_at("xs", 1)["cnt"] * F.lit(HOLT_SCALE).cast("long"))
        .alias("l"),
        F.lit(0).cast("long").alias("b"))
    st = F.aggregate(
        F.slice("xs", 2, F.size("xs") - 1), init, step)
    scale = float(HOLT_SCALE)
    return g.select(
        "event_type",
        F.size("xs").cast("long").alias(f"n_{grain}s"),
        st["l"].alias("l_u"),
        st["b"].alias("b_u"),
    ).select(
        "event_type", f"n_{grain}s", "l_u", "b_u",
        (F.col("l_u") / scale).alias("level_smoothed"),
        (F.col("b_u") / scale).alias(f"trend_per_{grain}"),
        ((F.col("l_u") + F.col("b_u")) / scale).alias("forecast_next"))


@query(
    "events_holt_linear_weekly",
    oracle=_holt_recursion(_holt_daily_agg("events", _HOLT_WEEK_EXPR),
                           unit="week"),
    category="extension: time-series (Holt linear smoothing, recursive CTE)",
    doc="Weekly-grain Holt smoothing (VERDICT r6 #5): identical "
        "recursion to events_holt_linear but over the Monday-truncated "
        "week grid — date_trunc('week') is Monday on BOTH engines — "
        "cutting the fold length ~7x, the prescribed coarsening once "
        "the window outgrows ~3 months. Same fixed-point state "
        "arithmetic, so cross-engine parity stays exact at any depth.",
)
def events_holt_linear_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    return events_holt_linear(spark, sf_dir, grain="week")
