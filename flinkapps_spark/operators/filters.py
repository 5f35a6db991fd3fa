"""Row-level predicate operators (SURVEY §2.2 R3-R5, R10).

All are Column-expression builders — Catalyst pushes them into the parquet
scan (check: .explain shows PushedFilters), an upgrade over the reference,
which filters after parsing every record on the Flink side
(reference source/flinkStreamProcessing.scala:129-151).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, functions as F


def symbol_in(col: Column, symbols: Sequence[str]) -> Column:
    """R3: membership filter (reference source/flinkStreamProcessing.scala:129,
    symbols ABB/IBM/CAT)."""
    return col.isin(list(symbols))


def param_equality(col: Column, value) -> Column:
    """R4: parameterized equality (reference source/flinkStreamingInput.scala:123-126,
    `x.symbol == _symb`)."""
    return col == F.lit(value)


def threshold_or(high: Column, high_v: float, low: Column, low_v: float) -> Column:
    """R4 (commented variant): `high >= _high || low <= _low`
    (reference source/flinkStreamingInput.scala:125)."""
    return (high >= F.lit(high_v)) | (low <= F.lit(low_v))


def compound_actual(symbol: Column, high: Column, low: Column, year: Column,
                    symbols: Sequence[str] = ("ABB", "IBM", "CAT"),
                    high_v: float = 50.0, low_v: float = 10.0,
                    yr_from: int = 2010, yr_to: int = 2011) -> Column:
    """R5, *actual* semantics: the reference writes

        s==A || s==B || s==C && high==H || low==L && yr>=F && yr<=T

    (reference source/flinkStreamProcessing.scala:148-151) and Scala's `&&`
    binds tighter than `||`, so the real tree is

        s==A || s==B || (s==C && high==H) || (low==L && yr>=F && yr<=T)

    We replicate that tree exactly (parenthesized — Python's &/| precedence
    differs from Scala's &&/||).
    """
    a, b, c = (symbol == F.lit(s) for s in symbols)
    return (
        a
        | b
        | (c & (high == F.lit(high_v)))
        | ((low == F.lit(low_v)) & (year >= F.lit(yr_from)) & (year <= F.lit(yr_to)))
    )


def compound_intended(symbol: Column, high: Column, low: Column, year: Column,
                      symbols: Sequence[str] = ("ABB", "IBM", "CAT"),
                      high_v: float = 50.0, low_v: float = 10.0,
                      yr_from: int = 2010, yr_to: int = 2011) -> Column:
    """R5, *intended* semantics (documented option): symbol in set AND
    (high==H OR low==L) AND year between F..T."""
    return (
        symbol.isin(list(symbols))
        & ((high == F.lit(high_v)) | (low == F.lit(low_v)))
        & (year >= F.lit(yr_from)) & (year <= F.lit(yr_to))
    )
