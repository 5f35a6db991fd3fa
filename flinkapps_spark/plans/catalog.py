"""Query catalog: every engine capability as a (Spark build, DuckDB oracle) pair.

This is the single source of truth behind ``__spark_entry__.py``: each entry
is one operator/capability from SURVEY.md §2 (or a beyond-reference
extension), expressed twice —

- ``build(spark, sf_dir) -> DataFrame``: the engine's idiomatic-Spark plan;
- ``oracle``: equivalent ANSI SQL that DuckDB runs on the same parquet
  fixtures (views: region nation customer supplier part orders lineitem
  events documents embeddings).

Conventions (driver compare is row-count + schema + order-insensitive
value hash over name-sorted columns):
- every computed/aggregate column is aliased identically on both sides;
- floating-point *aggregates* are rounded in-query (both sides) so
  summation-order ulp noise cannot flip the hash;
- no ORDER BY unless the query semantics are top-k (then the sort key is
  made deterministic with a unique tiebreaker).

Query modules register themselves via the ``@query`` decorator on import.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QueryDef:
    name: str
    build: Callable[[SparkSession, str], DataFrame]
    oracle: str | None          # DuckDB SQL; None → driver does rows-only check
    category: str               # SURVEY §2 bucket or "extension"
    doc: str                    # what it verifies + reference citation


_REGISTRY: dict[str, QueryDef] = {}


def query(name: str, *, oracle: str | None = None, category: str = "",
          doc: str = ""):
    """Decorator: register ``fn(spark, sf_dir) -> DataFrame`` as a catalog query."""
    def deco(fn):
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = QueryDef(name, fn, oracle, category, doc)
        return fn
    return deco


def _load_all() -> None:
    # Import for side effect: module import registers its queries.
    from flinkapps_spark.plans import (  # noqa: F401
        reference_queries,
        relational_queries,
        tpch_extra_queries,
        pipeline_queries,
        curation_queries,
        governance_queries,
        retrieval_queries,
        graph_queries,
        analytics_queries,
        timeseries_queries,
        ml_queries,
        mleval_queries,
        streaming_queries,
    )


def registry() -> dict[str, QueryDef]:
    _load_all()
    return dict(_REGISTRY)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {n: q.build for n, q in registry().items()}


def oracle_sql() -> dict[str, str]:
    return {n: q.oracle for n, q in registry().items() if q.oracle is not None}
