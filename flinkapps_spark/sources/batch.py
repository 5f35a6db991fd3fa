"""Batch sources (SURVEY §2.1 S4-S5 + driver parquet fixtures).

The reference reads bounded inputs via ``env.readTextFile`` (reference
source/flinkBatchJDBCSink.scala:47) and in-memory collections
(``env.fromElements``, reference source/flinkStreamTable.scala:61-65).
Spark equivalents: ``spark.read.text`` / ``spark.createDataFrame``.

This module also owns loading the driver's parquet fixtures, including the
``timestamp[ns]`` quirk: Spark 4 refuses parquet TIMESTAMP(NANOS) columns,
so we read them as long (legacy conf) and truncate ns→µs — exactly what
DuckDB does when it reads the same files, so oracle comparisons line up.

Scale note: loading stays a plain parquet scan so Catalyst keeps predicate
pushdown / column pruning / partition pruning; the ns→µs projection is a
cheap arithmetic column rewrite that does not block pushdown on other
columns.
"""

from __future__ import annotations

import os
import tempfile
from collections.abc import Iterable

from pyspark.sql import DataFrame, SparkSession, functions as F

from flinkapps_spark.schemas import NANOS_TS_COLUMNS, TESTDATA_TABLES
from flinkapps_spark.session import tune_session


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one driver fixture table, normalizing nanosecond timestamps."""
    tune_session(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    for col in NANOS_TS_COLUMNS.get(name, []):
        if col in df.columns and dict(df.dtypes).get(col) == "bigint":
            # ns → µs truncation (matches DuckDB's read of the same file).
            # Integer `div`, NOT `/`: float division of ~1e18 ns loses the
            # low microsecond digit (double has 53 significand bits).
            df = df.withColumn(
                col, F.expr(f"timestamp_micros(`{col}` div 1000)")
            )
    return df


def load_tables(spark: SparkSession, sf_dir: str,
                names: Iterable[str] = TESTDATA_TABLES) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in names}


def register_views(spark: SparkSession, sf_dir: str,
                   names: Iterable[str] = TESTDATA_TABLES) -> None:
    """Register fixture tables as temp views for the SQL surface (§2.7)."""
    for n in names:
        load_table(spark, sf_dir, n).createOrReplaceTempView(n)


def read_text(spark: SparkSession, path: str) -> DataFrame:
    """S4: bounded text-file source (one `value` string column per line)."""
    return spark.read.text(path)


def from_rows(spark: SparkSession, rows, schema) -> DataFrame:
    """S5: in-memory collection source (env.fromElements equivalent)."""
    return spark.createDataFrame(rows, schema)


def _format_cache_dir(sf_dir: str, name: str, fmt: str) -> str:
    """Deterministic per-(sf,table,format) cache dir under /tmp for
    format-conversion fixtures (testdata itself is read-only)."""
    key = os.path.abspath(sf_dir).strip("/").replace("/", "_")
    return os.path.join(tempfile.gettempdir(),
                        f"flinkapps_fmt_{key}_{name}_{fmt}")


def load_table_as(spark: SparkSession, sf_dir: str, name: str,
                  fmt: str) -> DataFrame:
    """Read a fixture table through an alternate file format (csv/json/orc).

    The parquet fixture is converted once into a cached /tmp copy, then
    read back with the format's reader and the original schema — the
    format-specific read path (header/type inference pitfalls, ORC
    vectorization) is what gets exercised; values must match parquet.
    """
    df = load_table(spark, sf_dir, name)
    path = _format_cache_dir(sf_dir, name, fmt)
    marker = os.path.join(path, "_SUCCESS")
    if not os.path.exists(marker):
        w = df.write.mode("overwrite")
        if fmt == "csv":
            # explicit timestamp format: CSV has no native types
            w = w.option("header", "true") \
                .option("timestampFormat", "yyyy-MM-dd HH:mm:ss.SSSSSS")
        w.format(fmt).save(path)
    r = spark.read
    if fmt == "csv":
        r = r.option("header", "true") \
            .option("timestampFormat", "yyyy-MM-dd HH:mm:ss.SSSSSS")
    return r.schema(df.schema).format(fmt).load(path)
