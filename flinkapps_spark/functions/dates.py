"""Date/time scalar functions (SURVEY §2.5 F1-F4).

The reference's ``dateFormatter`` helper (reference common/dateFormatter.scala:11-19)
parses ``yyyy-MM-dd`` strings and formats dates with pattern ``"YYYY"`` —
SimpleDateFormat *week-year*, a subtle bug: 2010-12-31 → 2011.  We expose
both the intended calendar year (default) and a bug-compatible week-year.

All pure Column expressions — JVM-side, codegen-friendly, no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def convert_string_to_date(col: Column | str) -> Column:
    """F1: parse a yyyy-MM-dd string into DateType
    (reference common/dateFormatter.scala:11-14)."""
    return F.to_date(F.col(col) if isinstance(col, str) else col, "yyyy-MM-dd")


def extract_year(col: Column | str) -> Column:
    """F2 (intended semantics): calendar year as int."""
    return F.year(F.col(col) if isinstance(col, str) else col)


def extract_weekyear(col: Column | str) -> Column:
    """F2 (bug-compatible): SimpleDateFormat "YYYY" week-year.

    Java's default (US) locale weeks start Sunday with minimalDaysInFirstWeek=1,
    so week 1 of year Y is the Sun-Sat week containing Jan 1 Y; a date's
    week-year is the calendar year of the *Saturday* ending its week.
    Spark 3+ forbids the 'Y' pattern, so we compute it directly:
    dayofweek is 1=Sunday..7=Saturday → Saturday = date + (7 - dayofweek).
    e.g. 2010-12-31 (Fri) → Saturday 2011-01-01 → 2011.
    (reference common/dateFormatter.scala:16-19)
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.year(F.date_add(c, 7 - F.dayofweek(c)))


def epoch_seconds() -> Column:
    """F4: processing-time epoch seconds
    (reference source/flinkStreamProcessing.scala:130 uses currentTimeMillis/1000)."""
    return F.unix_timestamp()
