"""Fixed-point exact aggregation helpers (the SCALE.md float-determinism
policy, centralized).

Why: ``ROUND(SUM(double), dp>0)`` is order-dependent (partition addition
order differs between Spark and DuckDB) AND the final rounding itself
diverges between engines when the total lands on a ``.xx5`` boundary —
Spark rounds the shortest decimal repr via BigDecimal HALF_UP while DuckDB
rounds the binary value (SCALE.md "Float determinism": 307843.595 → .60
vs .59).  The fix used everywhere in this repo: round each TERM to a
fixed-point int64 (``ROUND(x, 0)`` is engine-identical below 2^51), sum
exactly (integer addition is associative → order-independent), divide ONCE
by the scale, and do NOT re-round.  The resulting double is bit-identical
on both engines because it is the same integer divided by the same scale.

Scale choice: 100 for columns with ≤2 true decimals (prices, balances),
10000 for products like ``extendedprice * (1 - discount)`` (≤4 true
decimals).  Six-decimal products (price·disc·tax) are *defined* as the
4dp-per-term rounded metric — deterministic on both engines, documented
per query.

int64 headroom: terms are ≤ ~1e5 · 1e4 = 1e9 units; 2^63/1e9 ≈ 9.2e9 rows
per group before overflow — at true 100 TB scale (1e10+ rows in one group)
drop to scale=100, which buys another 100×, or pre-aggregate per partition.

The DuckDB side mirrors the exact same shape; ``CAST(SUM(...) AS BIGINT)``
also guards the HUGEINT fetch trap (DuckDB SUM(integer) → HUGEINT →
pandas float64, which breaks the driver's value hash — see the q12
round-1 post-mortem in VERDICT.md).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, functions as F


def view_tag(sf_dir: str) -> str:
    """Short stable suffix for temp-view names derived from the fixture
    dir: two builds of the same query against DIFFERENT sf_dirs in one
    shared session must register distinct views, or the second
    createOrReplaceTempView silently redirects the first build's
    still-unexecuted plan (views resolve at analysis time, but a shared
    fixed name is a race the moment catalog builds interleave)."""
    return hashlib.md5(sf_dir.encode()).hexdigest()[:8]


def units_col(expr, scale: int) -> Column:
    """Fixed-point units: half-away-from-zero rounding of expr*scale,
    expressed as floor/ceil (+/−0.5) rather than ROUND(x, 0) — Spark's
    Round on DoubleType allocates a BigDecimal PER ROW (~14× slower than
    the floor form in codegen; measured on TPC-H Q1).  The ORACLE SIDE
    uses the identical floor/ceil formula (sql_units), so both engines
    compute the same float ops in the same order — parity holds by
    construction, not by the two engines' ROUND implementations agreeing.
    """
    if isinstance(expr, str):
        expr = F.col(expr)
    v = expr * scale
    return F.when(v >= 0, F.floor(v + 0.5)) \
        .otherwise(F.ceil(v - 0.5)).cast("long")


def sql_units(expr: str, scale: int) -> str:
    """DuckDB mirror of :func:`units_col` — same formula, same op order."""
    v = f"(({expr}) * {scale})"
    return (f"CAST(CASE WHEN {v} >= 0 THEN floor({v} + 0.5) "
            f"ELSE ceil({v} - 0.5) END AS BIGINT)")


_units = units_col  # internal alias


def exact_sum(expr, scale: int = 10000):
    """Order-independent fixed-point sum; returns an un-rounded double
    (= exact integer total / scale, bit-identical across engines)."""
    return F.sum(_units(expr, scale)) / float(scale)


def exact_avg(expr, scale: int = 10000):
    """Order-independent average: exact fixed-point sum divided by count.
    Op order (sum/scale)/count is mirrored in :func:`sql_avg`."""
    return F.sum(_units(expr, scale)) / float(scale) / F.count(F.lit(1))


def exact_sum_over(expr, window, scale: int = 10000):
    """Windowed variant: fixed-point sum OVER a frame — frame-order
    independent, unlike a double running sum."""
    return F.sum(_units(expr, scale)).over(window) / float(scale)


def sql_sum(expr: str, scale: int = 10000) -> str:
    """SQL mirror of :func:`exact_sum` — ENGINE-PORTABLE: the same string
    is valid on DuckDB (oracle) and through ``spark.sql``.

    The divisor is ``CAST({scale} AS DOUBLE)``, never a bare ``{scale}.0``
    literal: Spark parses ``100.0`` as DECIMAL(4,1) and BIGINT/DECIMAL
    yields decimal(27,6) output, which the driver's value hash compares
    red against DuckDB's float64 fetch even when every value is equal
    (round-2 sql_grouped_sum post-mortem, VERDICT r2 "What's wrong #1").
    With an explicit DOUBLE divisor both engines perform the identical
    correctly-rounded int64/double division → bit-identical doubles.
    """
    return (f"(CAST(SUM({sql_units(expr, scale)}) "
            f"AS BIGINT) / CAST({scale} AS DOUBLE))")


def sql_avg(expr: str, scale: int = 10000) -> str:
    """DuckDB oracle mirror of :func:`exact_avg`."""
    return f"({sql_sum(expr, scale)} / COUNT(*))"


def sql_sum_over(expr: str, over: str, scale: int = 10000) -> str:
    """SQL mirror of :func:`exact_sum_over`; ``over`` is the window spec,
    e.g. ``"w"`` or ``"(PARTITION BY k ORDER BY ts)"``.  Engine-portable
    DOUBLE divisor — see :func:`sql_sum` for why not ``{scale}.0``."""
    return (f"(CAST(SUM({sql_units(expr, scale)}) "
            f"OVER {over} AS BIGINT) / CAST({scale} AS DOUBLE))")


def units_scalar(x: float, scale: int) -> int:
    """Driver-side mirror of :func:`units_col`/:func:`sql_units` for
    bounded model state (k-means centroids, power-iteration vectors,
    Markov probabilities): the same half-away-from-zero fixed-point
    rounding, as one shared definition instead of per-module clones.
    Callers must pass x already in DOUBLE form (e.g. float(a)/float(b),
    never exact int/int) so the op sequence matches the SQL side's
    CAST-to-DOUBLE-first arithmetic.
    """
    import math

    v = x * scale
    return int(math.floor(v + 0.5)) if v >= 0 else int(math.ceil(v - 0.5))
