"""Job parity layer: the reference's 13 applications re-expressed as named,
config-driven Spark pipelines (SURVEY §0.1 file inventory, §2.9 config
surface).

Each job is a function (spark, cfg, source_df) -> DataFrame | side-effect
where ``source_df`` injection replaces the physical source (Kafka/socket)
so the same pipeline logic runs from fixtures in tests and from real
streams in production — the reference's own pattern of swapping
source/sink configs per environment.

The *transform* stage of every job is pure DataFrame logic shared with the
query catalog; jobs add the source/sink wiring.
"""

from __future__ import annotations

from dataclasses import dataclass
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

from flinkapps_spark.config import EngineConfig
from flinkapps_spark.operators import filters
from flinkapps_spark.operators.aggregations import word_count
from flinkapps_spark.operators.projections import csv_parse, csv_serialize
from flinkapps_spark.schemas import DAILY_PRICES, SENSOR_READING


# --- shared transform stages ----------------------------------------------

def parse_daily_prices(lines: DataFrame) -> DataFrame:
    """CSV line stream → typed dailyPrices rows (R1; reference
    source/flinkStreamProcessing.scala:107-115)."""
    return lines.select(*csv_parse(F.col("value"), DAILY_PRICES))


def parse_sensor_readings(lines: DataFrame) -> DataFrame:
    """CSV → sensorReading with trimmed ids (reference
    source/flinkStreamingJDBCSink.scala:117-121)."""
    return lines.select(*csv_parse(F.col("value"), SENSOR_READING, trim=True))


def alert_projection(prices: DataFrame, topic: str) -> DataFrame:
    """R6: epoch-ts, topic, all fields, spread → CSV line (reference
    source/flinkStreamProcessing.scala:130-134)."""
    cols = [F.unix_timestamp().cast("string"), F.lit(topic)] + \
        [F.col(f.name).cast("string") for f in DAILY_PRICES.fields] + \
        [(F.col("close") - F.col("open")).cast("string")]
    return prices.select(csv_serialize(cols).alias("value"))


# --- the 13 jobs -----------------------------------------------------------

def flink_starter(lines: DataFrame) -> DataFrame:
    """flinkStarter: socket word count, 5 s tumbling window (reference
    source/flinkStarter.scala).  Batch form counts all lines; streaming
    form adds the window in streaming/jobs.py."""
    return word_count(lines, "value")


def flink_streaming_input(lines: DataFrame, cfg: EngineConfig) -> DataFrame:
    """flinkStreamingInput: parse → filter symbol == cfg.symb (reference
    source/flinkStreamingInput.scala:100-126)."""
    prices = parse_daily_prices(lines)
    return prices.filter(filters.param_equality(F.col("symbol"), cfg.symb))


def flink_stream_processing(lines: DataFrame, cfg: EngineConfig) -> DataFrame:
    """flinkStreamProcessing (flagship): parse → membership filter →
    derived-CSV projection, destined for the Kafka sink (reference
    source/flinkStreamProcessing.scala:103-186)."""
    prices = parse_daily_prices(lines)
    filtered = prices.filter(
        filters.symbol_in(F.col("symbol"), ("ABB", "IBM", "CAT")))
    return alert_projection(filtered, cfg.topic_sink)


def flink_continuous_processing_rollover(lines: DataFrame,
                                         cfg: EngineConfig) -> DataFrame:
    """flinkContinuousProcessingRollover: parse → compound precedence filter
    → CSV projection, destined for the rolling file sink (reference
    source/flinkContinuousProcessingRollover.scala:115-162; sink emulation
    in sinks/files.py)."""
    prices = parse_daily_prices(lines)
    pred = filters.compound_actual(
        symbol=F.col("symbol"), high=F.col("high"), low=F.col("low"),
        year=F.year(F.to_date("trdate")),
        high_v=cfg.high, low_v=cfg.low,
        yr_from=cfg.bet_from, yr_to=cfg.bet_to)
    return alert_projection(prices.filter(pred), cfg.topic_sink)


def flink_streaming_hdfs_sink(lines: DataFrame, cfg: EngineConfig) -> DataFrame:
    """flinkStreamingHDFSSink: parse → membership filter (the reference's
    HDFS sink block is an empty stub — reference
    source/flinkStreamingHDFSSink.scala:142-144); write via
    sinks/files.py to any hdfs:// path."""
    prices = parse_daily_prices(lines)
    return prices.filter(
        filters.symbol_in(F.col("symbol"), ("ABB", "IBM", "CAT")))


def flink_stream_table(rows: DataFrame) -> DataFrame:
    """flinkStreamTable: (name, score) rows → SQL SUM GROUP BY with
    changelog output (reference source/flinkStreamTable.scala:61-79).

    The reference registers a session-global view named ``InputTable``;
    here the DataFrame is passed as a parameterized-SQL table argument —
    same verbatim query text, ZERO catalog state, so concurrent jobs in
    one shared session can't collide (ADVICE r2 / VERDICT r3 #4)."""
    return rows.sparkSession.sql(
        "SELECT name, SUM(score) AS score_sum FROM {InputTable} "
        "GROUP BY name", InputTable=rows)


def flink_table_manipulation(lines: DataFrame) -> DataFrame:
    """flinkTableManipulation: parse → view → min/max-by-symbol-year SQL
    (reference source/flinkTableManipulation.scala:91-122).  View passed
    as a parameterized-SQL table argument — no global temp-view name
    (VERDICT r3 #4)."""
    prices = parse_daily_prices(lines)
    return prices.sparkSession.sql(
        "SELECT symbol, YEAR(CAST(trdate AS DATE)) AS yearr, "
        "MIN(high) AS min_high, MAX(high) AS max_high "
        "FROM {t_flnk_daily_prices} "
        "GROUP BY symbol, YEAR(CAST(trdate AS DATE))",
        t_flnk_daily_prices=prices)


def flink_table_jdbc(lines: DataFrame, sink: Callable[[DataFrame], None]) -> None:
    """flinkTableJDBC / flinkTableJDBC02 / flinkStreamingJDBCSink02:
    parse → declarative batched INSERT (reference
    source/flinkTableJDBC.scala:43-76); ``sink`` is sinks.jdbc.write_jdbc_insert
    or an upsert_batch partial."""
    sink(parse_sensor_readings(lines))


def flink_batch_jdbc_sink(lines: DataFrame,
                          sink: Callable[[DataFrame], None]) -> None:
    """flinkBatchJDBCSink(+01) / flinkStreamingJDBCSink: parse → upsert
    with accumulation (reference source/flinkBatchJDBCSink.scala:47-127);
    ``sink`` is sinks.jdbc.upsert_batch(accumulate=True) — parallel-safe
    redesign of the reference's parallelism-1 two-statement upsert."""
    sink(parse_sensor_readings(lines))


JOBS: dict[str, Callable] = {
    "flinkStarter": flink_starter,
    "flinkStreamingInput": flink_streaming_input,
    "flinkStreamProcessing": flink_stream_processing,
    "flinkContinuousProcessingRollover": flink_continuous_processing_rollover,
    "flinkStreamingHDFSSink": flink_streaming_hdfs_sink,
    "flinkStreamTable": flink_stream_table,
    "flinkTableManipulation": flink_table_manipulation,
    "flinkTableJDBC": flink_table_jdbc,
    "flinkTableJDBC02": flink_table_jdbc,
    "flinkStreamingJDBCSink": flink_batch_jdbc_sink,
    "flinkStreamingJDBCSink02": flink_table_jdbc,
    "flinkBatchJDBCSink": flink_batch_jdbc_sink,
    "flinkBatchJDBCSink01": flink_batch_jdbc_sink,
}
