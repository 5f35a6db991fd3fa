"""Driver contract for the spark-graft builder (PySpark target).

Thin wrapper over the engine's query catalog
(``flinkapps_spark/plans/catalog.py``), which pairs every implemented
operator from SURVEY.md §2 with its DuckDB oracle SQL.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from flinkapps_spark.plans import catalog

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The reference's flagship pipeline: membership filter + derived spread
    (reference source/flinkStreamProcessing.scala:129-134).
    """
    return catalog.registry()["flagship_filter_project"].build(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return catalog.queries()


def oracle_sql() -> dict[str, str]:
    return catalog.oracle_sql()
