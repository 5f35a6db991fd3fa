"""Vector math over array<float> columns (beyond-reference: similarity search).

Pure Column expressions via ``zip_with``/``aggregate`` — JVM-side, no Python.
At 100 TB scale these run inside codegen; for very wide vectors a pandas UDF
with numpy BLAS could win, but at dim=64 the builtin path avoids Arrow
transfer entirely.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, v: acc + v)


def l2_norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine_similarity(a: Column, b: Column) -> Column:
    # try_divide, not `/`: a zero-norm vector makes the denominator 0,
    # which ANSI mode turns into a job-killing SparkArithmeticException —
    # one zero embedding in a 100 TB corpus must not abort the query.
    # NULL is also what the DuckDB oracle computes for x/0, so the
    # cross-engine contract is preserved; NULL cosine sorts LAST under
    # desc ranking and fails every >= threshold filter, i.e. undefined
    # similarity never produces a result row.
    return F.try_divide(dot(a, b), l2_norm(a) * l2_norm(b))
