"""Projection / derivation / CSV parse-serialize operators (SURVEY §2.2 R1, R6, R9).

The reference's schema-on-read CSV parse is an imperative split+cast map
(reference source/flinkStreamProcessing.scala:107-115); here it is a
declarative expression list so Catalyst fuses parse+filter+project into one
codegen stage and prunes unused fields.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql import types as T


def csv_parse(col: Column, schema: T.StructType, *, trim: bool = False,
              permissive: bool = False) -> list[Column]:
    """R1: positional split(',') + cast → typed columns.

    ``trim`` mirrors the sensor jobs' `.trim` on string fields
    (reference source/flinkStreamingJDBCSink.scala:117-121).
    ``permissive`` swaps CAST for try_cast: malformed fields become NULL
    instead of failing the job (Spark 4 ANSI CAST throws — which matches
    the reference's toFloat-throws behavior, so strict is the default).
    """
    parts = F.split(col, ",")
    out: list[Column] = []
    for i, field in enumerate(schema.fields):
        c = parts.getItem(i)
        if trim or not isinstance(field.dataType, T.StringType):
            c = F.trim(c)
        c = c.try_cast(field.dataType) if permissive else c.cast(field.dataType)
        out.append(c.alias(field.name))
    return out


def csv_serialize(cols: list[Column]) -> Column:
    """R6 (string form): comma-joined output line
    (reference source/flinkStreamProcessing.scala:130-134)."""
    return F.concat_ws(",", *cols)


def derive_spread(close: Column, open_: Column) -> Column:
    """R6/F7: the one computed analytic — spread = close - open
    (reference source/flinkStreamProcessing.scala:133)."""
    return close - open_


def select_column_range(df: DataFrame, start: int, end: int) -> DataFrame:
    """R9: withColumns(start to end) positional projection
    (reference source/flinkTableManipulation.scala:190-194; 1-based inclusive)."""
    return df.select(*df.columns[start - 1:end])


def rename_all(df: DataFrame, *names: str) -> DataFrame:
    """R9: `.as("name", ...)` wholesale rename."""
    return df.toDF(*names)
