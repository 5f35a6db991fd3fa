"""Spark-vs-DuckDB comparison used by the oracle-parity tests.

Mirrors the driver's contract: row count + column-name set + order-
insensitive value comparison over name-sorted columns.  Comparison is
*exact* after a normalization that absorbs representation (not value)
differences: NaN/None unification, -0.0→0.0, timestamp/date → ISO strings,
floats → repr of 10-significant-digit rounding (queries are expected to
round aggregates in-query; this guard only absorbs sub-ulp repr noise).
"""

from __future__ import annotations

import datetime as dt
import math
from decimal import Decimal

import pandas as pd


def _norm_cell(x):
    if x is None:
        return "∅"
    if isinstance(x, float):
        if math.isnan(x):
            return "∅"
        if x == 0.0:
            x = 0.0
        # 12 significant digits: absorbs last-ulp repr differences while
        # still catching any real numeric divergence.
        return f"{x:.12g}"
    if isinstance(x, Decimal):
        return f"{float(x):.12g}"
    if isinstance(x, (pd.Timestamp, dt.datetime)):
        return "T" + pd.Timestamp(x).isoformat()
    if isinstance(x, dt.date):
        return "D" + x.isoformat()
    if isinstance(x, (list, tuple)):
        return "[" + ",".join(_norm_cell(v) for v in x) + "]"
    if isinstance(x, (bytes, bytearray)):
        return bytes(x).hex()
    if isinstance(x, (int, bool, str)):
        return repr(x)
    return repr(x)


def normalize(cols: list[str], rows: list[tuple]) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm_cell(r[i]) for i in order) for r in rows)


_INT_SPARK = {"tinyint", "smallint", "int", "bigint"}
_FLOAT_SPARK = {"float", "double"}


def assert_fetch_dtypes(spark_df, duck_rel, name: str = "") -> None:
    """Mirror the DRIVER's strictest fetch path: the driver pulls the
    oracle through pandas/Arrow, where DuckDB HUGEINT (the type of a bare
    SUM(integer)) degrades to float64 and hash-mismatches Spark's long
    even when every value is equal (round-1 q12 post-mortem).  Two guards:

    1. no oracle output column may be HUGEINT/UHUGEINT — always CAST such
       sums to BIGINT (or use count_if/COUNT which are BIGINT already);
    2. the pandas dtype family of each oracle column must match the Spark
       column's type family (int↔int, float↔float, bool↔bool) whenever the
       fetched column is null-free (nulls legitimately float-ify pandas
       int columns on BOTH sides, so those are skipped).
    """
    # Spark-side guard (round-2 sql_grouped_sum post-mortem): no catalog
    # query may emit DecimalType.  Spark parses a bare `100.0` SQL literal
    # as DECIMAL and BIGINT/DECIMAL → decimal(27,6); _norm_cell folds
    # Decimal→float so the LOCAL suite would pass while the DRIVER's
    # value hash (which sees the Decimal repr) goes red.  Divide by
    # CAST(n AS DOUBLE) instead (plans/exact.py sql_sum).
    for f in spark_df.schema:
        assert "decimal" not in f.dataType.simpleString(), (
            f"{name}: Spark column {f.name} is {f.dataType.simpleString()}"
            f" — a bare `N.0` SQL literal division? Use CAST(N AS DOUBLE) "
            f"(the driver hashes Decimal output red against the oracle's "
            f"float64 even when values are equal)")
    d_cols = list(duck_rel.columns)
    d_types = [str(t).upper() for t in duck_rel.types]
    for c, t in zip(d_cols, d_types):
        assert "HUGEINT" not in t, (
            f"{name}: oracle column {c} is {t} — a bare integer SUM? "
            f"CAST it to BIGINT (pandas fetch turns HUGEINT into float64 "
            f"and breaks the driver hash)")
    s_types = {f.name: f.dataType.simpleString() for f in spark_df.schema}
    pdf = duck_rel.df()
    for c in d_cols:
        if c not in s_types or pdf[c].isnull().any():
            continue
        p = str(pdf[c].dtype)
        s = s_types[c]
        if s in _INT_SPARK:
            assert p.startswith(("int", "uint")), (
                f"{name}: column {c}: spark {s} vs pandas-fetched {p} — "
                f"driver hash would compare int against {p}")
        elif s in _FLOAT_SPARK:
            assert p.startswith("float"), (
                f"{name}: column {c}: spark {s} vs pandas-fetched {p}")
        elif s == "boolean":
            assert p in ("bool", "boolean", "object"), (
                f"{name}: column {c}: spark {s} vs pandas-fetched {p}")


def compare(spark_df, duck_rel, name: str = "") -> None:
    assert_fetch_dtypes(spark_df, duck_rel, name)
    s_cols = list(spark_df.columns)
    s_data = [tuple(r) for r in spark_df.collect()]
    d_cols = list(duck_rel.columns)
    d_data = duck_rel.fetchall()
    assert sorted(s_cols) == sorted(d_cols), (
        f"{name}: column mismatch spark={sorted(s_cols)} "
        f"duck={sorted(d_cols)}")
    assert len(s_data) == len(d_data), (
        f"{name}: row count spark={len(s_data)} duck={len(d_data)}")
    s_rows = normalize(s_cols, s_data)
    d_rows = normalize(d_cols, d_data)
    if s_rows != d_rows:
        diffs = [(a, b) for a, b in zip(s_rows, d_rows) if a != b][:5]
        raise AssertionError(
            f"{name}: value mismatch; first diffs (spark vs duck): {diffs}")
