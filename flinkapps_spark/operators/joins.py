"""Join operators (beyond the reference — SURVEY §2.10 confirms it has none).

Design for 100 TB:
- dimension tables (region/nation/supplier/part at TPC-H ratios) are
  broadcast — ``F.broadcast`` pins the strategy so a 1000-executor cluster
  never shuffles the fact table for them;
- fact-fact joins (orders⋈lineitem) shuffle on the join key; AQE handles
  skew splitting; co-partitioning via bucketing is exposed in sinks/files.py;
- as-of joins use ``applyInPandas`` + ``pandas.merge_asof`` per key-group:
  the shuffle is one partition-by-key pass, then each group joins sorted
  locally — the standard scalable pattern (no O(n·m) conditional join).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F


def broadcast_dim_join(fact: DataFrame, dim: DataFrame, on, how: str = "inner") -> DataFrame:
    """Hash-join with the dimension side broadcast (no fact shuffle)."""
    return fact.join(F.broadcast(dim), on, how)


def semi_join(left: DataFrame, right: DataFrame, on) -> DataFrame:
    """EXISTS: rows of left having a match in right (left_semi keeps the
    build side small — no row multiplication, no right columns)."""
    return left.join(right, on, "left_semi")


def anti_join(left: DataFrame, right: DataFrame, on) -> DataFrame:
    """NOT EXISTS."""
    return left.join(right, on, "left_anti")


def range_join(fact: DataFrame, bands: DataFrame, value_col: str,
               lo_col: str = "lo", hi_col: str = "hi") -> DataFrame:
    """Band/range join: bands.lo <= fact.value < bands.hi (half-open, so
    bands tile without double-matching at float boundaries).

    The bands side is broadcast (it is by construction tiny), so this is a
    BroadcastNestedLoopJoin with the range predicate evaluated in codegen —
    the right physical plan; a shuffle range-join would only pay off for
    large band tables (then: bucketize value into band ids first).
    """
    cond = (F.col(value_col) >= F.col(lo_col)) & (F.col(value_col) < F.col(hi_col))
    return fact.join(F.broadcast(bands), cond, "inner")


def asof_join(left: DataFrame, right: DataFrame, key_cols: Sequence[str],
              ts_col: str, right_ts_col: str | None = None,
              value_cols: Sequence[str] = (),
              direction: str = "backward",
              tolerance=None,
              tie_cols: Sequence[str] = (),
              num_buckets: int = 64) -> DataFrame:
    """As-of join: for each left row, the latest right row with
    right.ts <= left.ts (direction='backward') within the same key group.
    ``direction='forward'`` matches the earliest right row with
    right.ts >= left.ts instead; ``tolerance`` (a ``pandas.Timedelta`` or
    parseable string like ``"1h"``) bounds how far the match may be.
    ``tie_cols`` (names from ``value_cols``) break right-side timestamp
    ties deterministically — without them, equal-ts rows match in
    partition order, which an oracle cannot reproduce.

    Implementation: hash keys into ``num_buckets`` co-partitioned buckets
    (one shuffle each side), then one ``pandas.merge_asof`` per BUCKET with
    ``by=key_cols`` — merge_asof does the per-key as-of inside the bucket.
    Bucketing (vs grouping per key) amortizes the Arrow/pandas per-group
    overhead over many keys: 1000 users → 64 python calls, not 1000.
    Sorted-merge, O((n+m) log) per bucket; state per task = one bucket.
    Skew: a single giant key still lands in one bucket — sub-split by time
    range if that bites.
    """
    import pandas as pd

    right_ts = right_ts_col or ts_col
    keys = list(key_cols)
    vals = list(value_cols) or [c for c in right.columns
                                if c not in keys + [right_ts]]
    l_cols = left.columns
    out_fields = [left.schema[c] for c in l_cols]
    r_schema = right.schema
    out_fields += [r_schema[c] for c in vals]
    from pyspark.sql import types as T
    out_schema = T.StructType(
        [T.StructField(f.name, f.dataType, True) for f in out_fields])

    bucket = F.pmod(F.hash(*[F.col(k) for k in keys]), F.lit(num_buckets))
    lt = left.withColumn("__side", F.lit(0)).withColumn("__bucket", bucket)
    # align right to the left's column frame: key cols + asof ts + values
    rt = (right.select(*keys, F.col(right_ts).alias(ts_col), *vals)
          .withColumn("__side", F.lit(1)).withColumn("__bucket", bucket))

    tol = pd.Timedelta(tolerance) if tolerance is not None else None
    r_sort = [ts_col] + list(tie_cols)

    def merge(pdf: pd.DataFrame) -> pd.DataFrame:
        lpart = pdf[pdf["__side"] == 0][l_cols].sort_values(ts_col)
        rpart = (pdf[pdf["__side"] == 1][keys + [ts_col] + vals]
                 .sort_values(r_sort))
        if lpart.empty:
            return pd.DataFrame(columns=l_cols + vals)
        merged = pd.merge_asof(lpart, rpart, on=ts_col, by=keys,
                               direction=direction, tolerance=tol,
                               suffixes=("", "__r"))
        return merged[l_cols + vals]

    both = lt.unionByName(rt, allowMissingColumns=True)
    # explicit repartition: AQE would coalesce this byte-small exchange to
    # 1-2 partitions and serialize the python merge; the cost here is
    # python CPU, not bytes, so pin one partition per bucket
    both = both.repartition(num_buckets, "__bucket")
    return both.groupBy("__bucket").applyInPandas(merge, schema=out_schema)
