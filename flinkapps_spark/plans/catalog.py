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

import itertools
import weakref
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

# live built results: finalize token -> RDD-id watermark at its build start.
# RDD ids are monotone, so a later build's pins all carry ids >= its
# watermark — the finalizer uses the smallest LIVE later watermark as a
# cut so it never frees blocks a still-alive newer result may be reading
# (freeing a live localCheckpoint block mid-job is a hard task failure:
# checkpoint blocks cannot recompute).
_LIVE_BUILDS: dict[int, int] = {}
_BUILD_TOKENS = itertools.count()


def _free_pins(spark: SparkSession, before: frozenset, wm: int,
               token: int) -> None:
    """Unpersist the RDDs this build pinned: registered after ``before``
    was taken, below every live later build's id watermark.

    Runs from a weakref finalizer when a built result is garbage-collected
    — best-effort by design (the session may already be stopped)."""
    _LIVE_BUILDS.pop(token, None)
    try:
        later = [w for w in _LIVE_BUILDS.values() if w > wm]
        cut = min(later) if later else None
        jmap = spark.sparkContext._jsc.getPersistentRDDs()
        # keySet().toArray() is ONE py4j round trip; the py4j map proxy's
        # keys()/items() cost ~15-18 ms even on an empty map
        for rid in jmap.keySet().toArray():
            if rid in before or (cut is not None and rid >= cut):
                continue
            r = jmap.get(rid)
            if r is not None:
                r.unpersist(False)
    except Exception:  # noqa: BLE001 — cleanup must never raise from GC
        pass


def _self_cleaning(fn: Callable[[SparkSession, str], DataFrame]):
    """Make a query build self-cleaning (VERDICT r9 #8): several builders
    persist/localCheckpoint shared frames that the RETURNED plan reads, so
    they cannot unpersist before the caller materializes the result.  This
    wrapper snapshots the session's pinned-RDD registry (plus an RDD-id
    watermark) before the build and attaches a weakref finalizer to the
    returned frame that frees everything THIS query pinned once the result
    object is dropped — eager pins (count()-materialized persists,
    localCheckpoints) and the lazy persists the caller's own action
    materialized alike.  Pins belonging to a newer still-live result are
    fenced off by its id watermark and left alone.

    Contract: query results are independent; sequential
    build→materialize→drop use (bench.py, the oracle sweeps, the driver)
    frees exactly each query's own scratch state with no growth.
    free_session_state(spark) remains the blunt whole-session reset."""
    def build(spark: SparkSession, sf_dir: str) -> DataFrame:
        try:
            jsc = spark.sparkContext._jsc
            # keySet().toArray() = one py4j round trip (~0.5 ms); the
            # map proxy's keys() view costs ~18 ms per call and would be
            # paid INSIDE every timed bench window
            before = frozenset(
                jsc.getPersistentRDDs().keySet().toArray())
            # burning one RDD id gives a strict watermark: every RDD this
            # build (or anything after it) creates has a larger id
            wm = jsc.sc().newRddId()
        except Exception:  # noqa: BLE001
            return fn(spark, sf_dir)
        token = next(_BUILD_TOKENS)
        _LIVE_BUILDS[token] = wm
        try:
            df = fn(spark, sf_dir)
        except BaseException:
            _LIVE_BUILDS.pop(token, None)
            raise
        weakref.finalize(df, _free_pins, spark, before, wm, token)
        return df
    return build


def query(name: str, *, oracle: str | None = None, category: str = "",
          doc: str = ""):
    """Decorator: register ``fn(spark, sf_dir) -> DataFrame`` as a catalog query."""
    def deco(fn):
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = QueryDef(name, _self_cleaning(fn), oracle,
                                   category, doc)
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
