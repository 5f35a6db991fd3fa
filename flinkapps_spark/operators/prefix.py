"""Distributed prefix (cumulative) aggregation — the two-phase scan.

A cumulative aggregate over a global ordering is the textbook parallel
prefix-sum problem: a single `Window.orderBy(u)` plans as ONE partition
holding every row — correct at fixture scale, fatal at 100 TB.  The
two-phase decomposition used by every parallel-prefix implementation
(Blelloch 1990) maps onto Spark as:

1. bucket rows by a width on the order column;
2. aggregate per-bucket totals (a bounded frame: one row per bucket,
   cardinality set by the VALUE DOMAIN, not the data volume);
3. prefix-scan the bucket totals with a tiny single-partition window
   and broadcast the exclusive offsets back;
4. run the wide window PARTITIONED by bucket and add the offset.

The helper here owns steps 2-3 (the shared machinery); callers keep
step 4 because the within-bucket frame semantics differ per operator
(ROWS over unique keys for KS, row_number ranking for Gini, RANGE with
peers for the skyline).

AQE pitfall this module exists to centralize: the offsets land on the
BROADCAST side of the phase-4 join, and AQE materializes broadcast
stages bottom-up — if the bucketed frame is lazy, the whole upstream
corpus pipeline re-executes inside that stage (observed: double scans
in stats_ks_twosample and events_power_users_gini before the fix).
Callers should eagerly persist the bucketed frame when it derives from
a corpus-sized pipeline; `bucket_offsets` only consumes it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def bucket_offsets(bucketed: DataFrame, bkt: str,
                   cols: dict[str, str | Column],
                   maxes: dict[str, str | Column] | None = None,
                   partition_by: tuple[str, ...] = (),
                   ) -> DataFrame:
    """Exclusive prefix offsets + grand totals over bucket totals.

    ``cols`` maps output name -> column to SUM within each bucket;
    ``maxes`` maps output name -> column to MAX (for prefix-max scans,
    e.g. skyline dominance); ``partition_by`` scopes the scan to a
    group key (per-type ranks, per-flag weighted medians) — offsets and
    totals are then per (group, bucket), and the tiny offset windows
    run per group over buckets only.  Returns one row per bucket:
    ``partition_by`` columns, ``bkt``,
    ``off_<name>`` (aggregate over all STRICTLY EARLIER buckets; 0 for
    sums and NULL for maxes on the first bucket) and ``tot_<name>``
    (the grand aggregate, identical on every row — it rides the same
    broadcast so callers never need a second aggregation branch over
    the data).

    Both windows run on the bucket frame, whose cardinality is bounded
    by the bucketing of the value domain — the single-partition scan
    here is over buckets, never over rows.
    """
    maxes = maxes or {}
    aggs = [F.sum(c).alias(f"t_{name}") for name, c in cols.items()]
    aggs += [F.max(c).alias(f"t_{name}") for name, c in maxes.items()]
    totals = bucketed.groupBy(*partition_by, bkt).agg(*aggs)
    w_off = (Window.partitionBy(*partition_by).orderBy(bkt)
             .rowsBetween(Window.unboundedPreceding, -1))
    w_all = (Window.partitionBy(*partition_by).orderBy(bkt)
             .rowsBetween(Window.unboundedPreceding,
                          Window.unboundedFollowing))
    out = [F.col(c) for c in partition_by] + [F.col(bkt)]
    for name in cols:
        out.append(F.coalesce(F.sum(f"t_{name}").over(w_off), F.lit(0))
                   .alias(f"off_{name}"))
        out.append(F.sum(f"t_{name}").over(w_all).alias(f"tot_{name}"))
    for name in maxes:
        out.append(F.max(f"t_{name}").over(w_off).alias(f"off_{name}"))
        out.append(F.max(f"t_{name}").over(w_all).alias(f"tot_{name}"))
    return totals.select(*out)
