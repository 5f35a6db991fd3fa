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
from pyspark.sql.types import TimestampNTZType

from flinkapps_spark.schemas import NANOS_TS_COLUMNS, TESTDATA_TABLES
from flinkapps_spark.session import tune_session


def normalize_ntz(df: DataFrame) -> DataFrame:
    """Cast TIMESTAMP_NTZ columns to TIMESTAMP at the source edge.

    pyarrow's default parquet timestamp flavor is ``timestamp[us]`` with no
    timezone annotation (isAdjustedToUTC=false), which Spark 4 infers as
    TIMESTAMP_NTZ — and ``withWatermark`` / streaming event-time require
    TIMESTAMP proper (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE otherwise).  The
    session timezone is pinned UTC (session.py), so the cast is a pure
    re-tag: the same micros-since-epoch value, no wall-clock shift — and
    it matches how DuckDB reads the identical file for the oracle.
    """
    ntz = [f.name for f in df.schema.fields
           if isinstance(f.dataType, TimestampNTZType)]
    for c in ntz:
        df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one driver fixture table, normalizing nanosecond and
    timezone-less timestamps."""
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
    return normalize_ntz(df)


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


def _format_cache_dir(sf_dir: str, name: str, fmt: str,
                      schema_key: str = "") -> str:
    """Deterministic per-(sf,table,format,schema) cache dir under /tmp for
    format-conversion fixtures (testdata itself is read-only).  The schema
    fingerprint invalidates the cache when the source-edge normalization
    changes (e.g. the NTZ→TIMESTAMP cast re-typed columns: a cache written
    under the old schema would fail or mis-parse under the new reader)."""
    key = os.path.abspath(sf_dir).strip("/").replace("/", "_")
    return os.path.join(tempfile.gettempdir(),
                        f"flinkapps_fmt_{key}_{name}_{fmt}{schema_key}")


def load_table_as(spark: SparkSession, sf_dir: str, name: str,
                  fmt: str) -> DataFrame:
    """Read a fixture table through an alternate file format (csv/json/orc).

    The parquet fixture is converted once into a cached /tmp copy, then
    read back with the format's reader and the original schema — the
    format-specific read path (header/type inference pitfalls, ORC
    vectorization) is what gets exercised; values must match parquet.
    """
    df = load_table(spark, sf_dir, name)
    import hashlib
    schema_key = "_" + hashlib.sha1(
        df.schema.simpleString().encode()).hexdigest()[:8]
    path = _format_cache_dir(sf_dir, name, fmt, schema_key)
    marker = os.path.join(path, "_SUCCESS")
    if not os.path.exists(marker):
        w = df.write.mode("overwrite")
        if fmt == "csv":
            # explicit timestamp format: CSV has no native types
            w = w.option("header", "true") \
                .option("timestampFormat", "yyyy-MM-dd HH:mm:ss.SSSSSS")
        elif fmt == "xml":
            # built-in XML source (Spark 4 absorbed spark-xml into core)
            w = w.option("rowTag", "row") \
                .option("timestampFormat", "yyyy-MM-dd HH:mm:ss.SSSSSS")
        w.format(fmt).save(path)
    r = spark.read
    if fmt == "csv":
        r = r.option("header", "true") \
            .option("timestampFormat", "yyyy-MM-dd HH:mm:ss.SSSSSS")
    elif fmt == "xml":
        r = r.option("rowTag", "row") \
            .option("timestampFormat", "yyyy-MM-dd HH:mm:ss.SSSSSS")
    return r.schema(df.schema).format(fmt).load(path)
