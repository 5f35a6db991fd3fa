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
              num_buckets: int = 64,
              time_slice: str | None = None,
              slice_hot_threshold: int | None = None) -> DataFrame:
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

    Skew (``time_slice``): a single giant key lands in one bucket and that
    task straggles.  Passing ``time_slice`` (a Timedelta string, e.g.
    ``"6h"``) additionally splits every bucket along the time axis and
    partitions on (bucket, slice), so a key holding 50% of all rows spreads
    over all of its time slices instead of serializing one task.  A slice
    is self-contained because each (key, left-slice) gets a CARRY-IN row:
    the as-of-eligible right row from outside the slice (backward: the
    latest right row in any earlier slice; forward: the earliest in any
    later slice).  Carry-ins are computed on per-(key, slice) REDUCED data
    (≤ one row per key per slice — orders of magnitude below row count)
    with one window pass, so the skew fix adds only small-table work.
    Matches inside the slice then supersede the carry-in in merge_asof
    order, which reproduces the unsplit semantics exactly (tolerance still
    applies to the carried row's original timestamp).

    Adaptive split (``slice_hot_threshold``, round 6): slicing EVERY key
    pays explode/carry-in overhead on the cold majority that never
    needed it (SKEWBENCH.md measured the full-slice path slower than
    naive on a 30%-hot fixture).  With a threshold set alongside
    ``time_slice``, one partial-agg pass counts rows per key across both
    sides, keys above the threshold (≤ total/threshold keys by
    pigeonhole — broadcastable) route through the sliced path, and
    every other key takes the direct bucketed path; the union is the
    answer because an as-of join is independent per key.  Straggler
    bound and near-naive cost at once.
    """
    import pandas as pd

    if slice_hot_threshold is not None and time_slice is None:
        # silently falling through to the unsliced path would hand a
        # caller who opted into the hot-key split an unbounded straggler
        raise ValueError(
            "slice_hot_threshold requires time_slice: the threshold only "
            "selects WHICH keys take the sliced path; time_slice defines "
            "the slicing itself")
    if time_slice is not None and slice_hot_threshold is not None:
        keys = list(key_cols)
        occ = (left.select(*keys).unionByName(right.select(*keys))
               .groupBy(*keys).count())
        hot = occ.filter(F.col("count") > slice_hot_threshold).select(*keys)
        kwargs = dict(
            right_ts_col=right_ts_col, value_cols=value_cols,
            direction=direction, tolerance=tolerance, tie_cols=tie_cols,
            num_buckets=num_buckets)
        # .select(*columns): a string-key semi/anti join moves the key
        # columns to the front — restore the caller's column order so
        # both branches (and the final union) match the unsplit output
        sliced = asof_join(
            left.join(F.broadcast(hot), keys, "left_semi")
                .select(*left.columns),
            right.join(F.broadcast(hot), keys, "left_semi")
                .select(*right.columns),
            keys, ts_col, time_slice=time_slice, **kwargs)
        direct = asof_join(
            left.join(F.broadcast(hot), keys, "left_anti")
                .select(*left.columns),
            right.join(F.broadcast(hot), keys, "left_anti")
                .select(*right.columns),
            keys, ts_col, time_slice=None, **kwargs)
        return sliced.unionByName(direct)

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

    if time_slice is None:
        both = lt.unionByName(rt, allowMissingColumns=True)
        # explicit repartition: AQE would coalesce this byte-small exchange
        # to 1-2 partitions and serialize the python merge; the cost here is
        # python CPU, not bytes, so pin one partition per bucket
        both = both.repartition(num_buckets, "__bucket")
        return both.groupBy("__bucket").applyInPandas(merge,
                                                      schema=out_schema)

    # ---- time-sliced path (skewed keys) -----------------------------------
    from pyspark.sql import Window

    if direction not in ("backward", "forward"):
        # the carry-in construction below is single-sided; 'nearest' would
        # need a dual (backward+forward) carry per slice.  Refuse loudly
        # rather than silently returning backward-only matches.
        raise ValueError(
            f"time_slice supports direction 'backward'/'forward', got "
            f"{direction!r}; use asof_join_jvm(direction='nearest') or the "
            f"unsliced path for nearest-match semantics")

    slice_secs = float(pd.Timedelta(time_slice).total_seconds())

    def slice_of(c: str):
        return F.floor(F.col(c).cast("double") / slice_secs).cast("long")

    forward = direction == "forward"
    lt = lt.withColumn("__slice", slice_of(ts_col))
    rt = rt.withColumn("__slice", slice_of(ts_col))

    # one reduced row per (key, slice): the row merge_asof would pick if the
    # whole slice were eclipsed — backward: max (ts, ties); forward: min.
    order = [F.col(c).asc() if forward else F.col(c).desc()
             for c in [ts_col, *tie_cols]]
    w_red = Window.partitionBy(*keys, "__slice").orderBy(*order)
    reduced = (rt.withColumn("__rn", F.row_number().over(w_red))
               .filter(F.col("__rn") == 1).drop("__rn"))

    # slices that actually have left rows — the only ones needing carry-ins
    targets = lt.select(*keys, "__slice").distinct()

    # as-of over SLICE NUMBERS: candidate effective slice is shifted by one
    # (a right row in slice s is carry-in for targets s+1.. backward /
    # s-1.. forward; slice-s rows are already physically in partition s).
    row_struct = F.struct(ts_col, *vals)
    cand = reduced.select(
        *keys, (F.col("__slice") + (-1 if forward else 1)).alias("__eff"),
        F.lit(0).alias("__m"), row_struct.alias("__row"),
        F.lit(None).cast("long").alias("__slice_t"))
    tgt = targets.select(
        *keys, F.col("__slice").alias("__eff"), F.lit(1).alias("__m"),
        F.lit(None).cast(cand.schema["__row"].dataType).alias("__row"),
        F.col("__slice").alias("__slice_t"))
    eff_order = F.col("__eff").desc() if forward else F.col("__eff").asc()
    w_carry = (Window.partitionBy(*keys)
               .orderBy(eff_order, F.col("__m").asc())
               .rowsBetween(Window.unboundedPreceding, 0))
    # struct carry keeps the row atomic: last(ignorenulls) over separate
    # columns could stitch fields from different rows when vals have nulls
    carry = (cand.unionByName(tgt)
             .withColumn("__c", F.last("__row", ignorenulls=True)
                         .over(w_carry))
             .filter((F.col("__m") == 1) & F.col("__c").isNotNull())
             .select(*keys, F.col("__slice_t").alias("__slice"),
                     *[F.col(f"__c.{c}").alias(c) for c in [ts_col, *vals]])
             .withColumn("__side", F.lit(1))
             .withColumn("__bucket", bucket))

    both = lt.unionByName(rt.unionByName(carry), allowMissingColumns=True)
    both = both.repartition(num_buckets, "__bucket", "__slice")
    return (both.groupBy("__bucket", "__slice")
            .applyInPandas(merge, schema=out_schema))


def asof_join_jvm(left: DataFrame, right: DataFrame,
                  key_cols: Sequence[str], ts_col: str,
                  right_ts_col: str | None = None,
                  value_cols: Sequence[str] = (),
                  direction: str = "backward",
                  tolerance: str | None = None,
                  tie_cols: Sequence[str] = ()) -> DataFrame:
    """As-of join executed ENTIRELY JVM-side — no Python workers.

    Same semantics as :func:`asof_join` (latest right row at-or-before /
    earliest at-or-after per key, optional tolerance, deterministic
    ``tie_cols``), different physical plan: union both sides into one
    frame, then a single window pass per key ordered by (ts, side, ties)
    carries the nearest right row onto each left row via
    ``last(..., ignorenulls=True)`` (backward) / ``first`` over the
    following frame (forward).  ``direction="nearest"`` (this engine
    only) computes BOTH carries and keeps the smaller absolute gap,
    preferring backward on exact ties; tolerance bounds the chosen gap.  One shuffle + one sort, all inside
    whole-stage codegen — none of the Arrow transfer / pandas merge CPU
    of the ``applyInPandas`` variant, which matters when the as-of is a
    hot headliner. Trade-off: the window partitions by KEY, so one giant
    key serializes into one task (the pandas variant's ``time_slice``
    handles that case); at normal key cardinality this form is strictly
    cheaper and is what a 1000-executor cluster should run.
    """
    import pandas as pd

    right_ts = right_ts_col or ts_col
    keys = list(key_cols)
    vals = list(value_cols) or [c for c in right.columns
                                if c not in keys + [right_ts]]
    l_cols = left.columns
    forward = direction == "forward"
    nearest = direction == "nearest"

    # right rows carry their payload in ONE struct column (atomic carry —
    # per-column last(ignorenulls) could stitch different rows when a
    # value column is legitimately null); left rows carry null.
    rt = right.select(
        *keys, F.col(right_ts).alias(ts_col),
        F.lit(1 if forward else 0).alias("__ord"),
        F.struct(F.col(right_ts).alias("__rts"),
                 *[F.col(c) for c in vals]).alias("__r"),
        *[F.col(c).alias(f"__tie_{c}") for c in tie_cols])
    lt = left.select(
        "*", F.lit(0 if forward else 1).alias("__ord"),
        F.lit(None).cast(rt.schema["__r"].dataType).alias("__r"),
        *[F.lit(None).cast(rt.schema[f"__tie_{c}"].dataType)
          .alias(f"__tie_{c}") for c in tie_cols])

    from pyspark.sql import Window
    both = lt.unionByName(rt, allowMissingColumns=True)
    tol_s = (float(pd.Timedelta(tolerance).total_seconds())
             if tolerance is not None else None)

    def back_window(tie_desc: bool):
        ties = [F.col(f"__tie_{c}").desc() if tie_desc
                else F.col(f"__tie_{c}").asc() for c in tie_cols]
        return (Window.partitionBy(*keys)
                .orderBy(F.col(ts_col).asc(), F.col("__ord").asc(), *ties)
                .rowsBetween(Window.unboundedPreceding, Window.currentRow))

    def fwd_window():
        ties = [F.col(f"__tie_{c}").asc() for c in tie_cols]
        return (Window.partitionBy(*keys)
                .orderBy(F.col(ts_col).asc(), F.col("__ord").asc(), *ties)
                .rowsBetween(Window.currentRow, Window.unboundedFollowing))

    if nearest:
        # nearest = min |gap|, backward preferred on equal gaps; ALL ties
        # (same ts, same gap) break toward the SMALLEST tie_cols value on
        # both sides, matching an oracle's ORDER BY abs_gap, ts, tie ASC
        # LIMIT 1 (note backward-only mode keeps merge_asof's max-tie
        # pick instead — the two conventions are each internally
        # consistent and documented).  Costs two window sorts.
        cb = F.last("__r", ignorenulls=True).over(back_window(tie_desc=True))
        cf = F.first("__r", ignorenulls=True).over(fwd_window())
        out = (both.withColumn("__cb", cb).withColumn("__cf", cf)
               .filter(F.col("__r").isNull()))
        t = F.col(ts_col).cast("double")
        gap_b = t - F.col("__cb.__rts").cast("double")
        gap_f = F.col("__cf.__rts").cast("double") - t
        in_b = F.col("__cb").isNotNull() & (
            (gap_b <= tol_s) if tol_s is not None else F.lit(True))
        in_f = F.col("__cf").isNotNull() & (
            (gap_f <= tol_s) if tol_s is not None else F.lit(True))
        chosen = (F.when(in_b & (~in_f | (gap_b <= gap_f)), F.col("__cb"))
                  .when(in_f, F.col("__cf")))
        out = out.withColumn("__c", chosen)
        return out.select(
            *l_cols,
            *[F.col(f"__c.{c}").alias(c) for c in vals])

    # backward: right sorts BEFORE left at equal ts (inclusive match) and
    # the carried row is the LAST right row ≤ current → max (ts, ties),
    # exactly merge_asof's pick.  forward mirrors with first over the
    # following frame → min (ts, ties).
    if forward:
        carried = F.first("__r", ignorenulls=True).over(fwd_window())
    else:
        carried = F.last("__r", ignorenulls=True).over(
            back_window(tie_desc=False))

    out = both.withColumn("__c", carried).filter(F.col("__r").isNull())

    valid = F.col("__c").isNotNull()
    if tol_s is not None:
        gap = (F.col("__c.__rts").cast("double")
               - F.col(ts_col).cast("double"))
        valid = valid & ((gap >= -tol_s) & (gap <= 0) if not forward
                         else (gap >= 0) & (gap <= tol_s))
    return out.select(
        *l_cols,
        *[F.when(valid, F.col(f"__c.{c}")).alias(c) for c in vals])
