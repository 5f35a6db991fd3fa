"""Naive-vs-guarded bench on the zipf skew fixture (VERDICT r5 #2).

tests/test_skew_guards.py proves each guard LOSSLESS under skew; this
script measures whether each guard actually MOVES wall-clock on the
shape it exists for, and writes SKEWBENCH.md.  Honesty rules:

- parity is re-checked in-run (exceptAll both directions == empty), so
  a fast-but-wrong variant can never post a number;
- where the naive path is NOT slower (e.g. algebraic aggregation, where
  Spark's map-side partial agg already collapses the hot key before the
  exchange), the table says so — that is a finding about when the guard
  is needed, not a failure;
- the join naive path pins a shuffle (merge hint): with a broadcastable
  dimension Spark would broadcast and skew would be moot — the salted
  pattern exists for dims past broadcast size, so that is the regime
  benched.

Usage: python scripts/bench_skew.py [--scale 5] [--runs 3]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from flinkapps_spark.operators import joins
from flinkapps_spark.operators.dedup import exact_dedup
from flinkapps_spark.plans.exact import units_col
from flinkapps_spark.session import get_spark
from flinkapps_spark.sources.batch import load_table
from scripts.gen_skew import (
    HOT_DOC_RATE, HOT_PART_RATE, HOT_PARTS, HOT_USER_RATE, generate,
)


def _events_sides(spark, d):
    # left = EVERY event (enrich-each-event-with-last-signup, the
    # realistic as-of shape): the hot user's ~30% of ALL rows lands in
    # ONE pandas group on the naive path — the straggler the slicer
    # exists to split
    ev = load_table(spark, d, "events")
    left = ev.select("event_id", "user_id", "ts", "value")
    signups = (ev.filter(F.col("event_type") == "signup")
               .select("user_id", "ts",
                       F.col("ts").alias("signup_ts"),
                       F.col("value").alias("signup_value")))
    return left, signups


def asof_naive(spark, d):
    p, s = _events_sides(spark, d)
    return joins.asof_join(p, s, key_cols=["user_id"], ts_col="ts",
                           value_cols=["signup_ts", "signup_value"])


def asof_guarded(spark, d):
    p, s = _events_sides(spark, d)
    return joins.asof_join(p, s, key_cols=["user_id"], ts_col="ts",
                           value_cols=["signup_ts", "signup_value"],
                           time_slice="6h")


def asof_adaptive(spark, d):
    p, s = _events_sides(spark, d)
    return joins.asof_join(p, s, key_cols=["user_id"], ts_col="ts",
                           value_cols=["signup_ts", "signup_value"],
                           time_slice="6h", slice_hot_threshold=100_000)


def join_naive(spark, d):
    ev = load_table(spark, d, "events")
    cu = (load_table(spark, d, "customer")
          .select("c_custkey", "c_mktsegment"))
    units = units_col(F.col("value"), 10000)
    return (ev.join(cu.hint("merge"), ev.user_id == cu.c_custkey)
            .groupBy("c_mktsegment")
            .agg(F.count("*").alias("n_events"),
                 (F.sum(units) / 10000.0).alias("total_value")))


def join_guarded(spark, d):
    from flinkapps_spark.plans.catalog import registry
    return registry()["join_salted_skew"].build(spark, d)


def agg_naive(spark, d):
    ev = load_table(spark, d, "events")
    units = units_col(F.col("value"), 10000)
    return ev.groupBy("user_id").agg(
        (F.sum(units) / 10000.0).alias("total"),
        F.count("*").alias("n"))


def agg_guarded(spark, d):
    from flinkapps_spark.plans.catalog import registry
    return registry()["agg_two_phase_salted"].build(spark, d)


def dedup_naive(spark, d):
    return exact_dedup(load_table(spark, d, "documents"))


def dedup_guarded(spark, d):
    return exact_dedup(load_table(spark, d, "documents"), skew_guard=True)


def basket_naive(spark, d):
    from flinkapps_spark.plans.relational_queries import (
        itemset_copurchase_pairs,
    )
    return itemset_copurchase_pairs(spark, d)


def basket_guarded(spark, d):
    from flinkapps_spark.plans.relational_queries import (
        itemset_copurchase_pairs,
    )
    return itemset_copurchase_pairs(spark, d, pop_cap=1000)


def _max_share(df, naive_cols, guarded_cols):
    """(naive, guarded) max single-task-key share of rows: the fraction
    of all rows the LARGEST reduce key holds before and after the guard
    re-keys it.  This is the scale-independent number — on a cluster the
    naive share is the fraction of the whole stage one straggler task
    serializes, regardless of data volume."""
    tot = df.count()

    def mx(cols):
        return (df.groupBy(*cols).count()
                .agg(F.max("count")).first()[0]) / tot

    return mx(naive_cols), mx(guarded_cols)


def balance_agg_join(spark, d):
    ev = load_table(spark, d, "events").withColumn(
        "salt", (F.col("event_id") % 8).cast("int"))
    return _max_share(ev, ["user_id"], ["user_id", "salt"])


def balance_asof(spark, d):
    ev = load_table(spark, d, "events").withColumn(
        "slice", F.floor(F.unix_timestamp("ts") / (6 * 3600)))
    return _max_share(ev, ["user_id"], ["user_id", "slice"])


def balance_dedup(spark, d):
    docs = load_table(spark, d, "documents").select(
        F.md5("text").alias("digest"),
        F.pmod(F.hash("doc_id"), F.lit(32)).alias("salt"))
    return _max_share(docs, ["digest"], ["digest", "salt"])


def balance_basket(spark, d):
    """For the pair expansion the bounded quantity is total pair VOLUME
    (sum of C(basket,2)); report naive vs capped volume as shares of
    the naive volume."""
    from flinkapps_spark.operators.baskets import cap_popular_items
    op = (load_table(spark, d, "lineitem")
          .select("l_orderkey", "l_partkey").distinct())

    def vol(df):
        per = df.groupBy("l_orderkey").agg(F.count("*").alias("k"))
        return per.agg(F.sum(F.expr("k * (k - 1) div 2"))).first()[0]

    naive = vol(op)
    return 1.0, vol(cap_popular_items(op, "l_partkey", 1000)) / naive


PAIRS = [
    ("basket pair expansion", "pop_cap=1000 drops the ultra-popular items",
     basket_naive, basket_guarded, False, balance_basket,
     "pair volume (of naive)"),
    ("as-of join (slice all)", "time_slice=6h splits EVERY key's bucket",
     asof_naive, asof_guarded, True, balance_asof, "max key share"),
    ("as-of join (adaptive)", "slice only keys > 100k rows; cold keys direct",
     asof_naive, asof_adaptive, True, balance_asof, "max key share"),
    ("fact-dim join", "salt x8 + dim replication vs pinned shuffle join",
     join_naive, join_guarded, True, balance_agg_join, "max key share"),
    ("aggregation", "salted two-phase vs direct groupBy",
     agg_naive, agg_guarded, True, balance_agg_join, "max key share"),
    ("exact dedup", "two-phase (digest,salt) vs one hash-groupBy",
     dedup_naive, dedup_guarded, True, balance_dedup, "max key share"),
]


def timed(fn, spark, d, runs):
    ts = []
    for _ in range(runs):
        t0 = time.perf_counter()
        fn(spark, d).write.format("noop").mode("overwrite").save()
        ts.append(time.perf_counter() - t0)
    return statistics.median(ts)


AQE_SKEW_CONFS = {
    # byte thresholds scaled to the fixture: the defaults (256MB/64MB)
    # are sized for real clusters; the micro fixture's whole shuffle is
    # a few MB, so detection needs fixture-scale numbers
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "256KB",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2.0",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "256KB",
    "spark.sql.adaptive.forceOptimizeSkewedJoin": "true",
    "spark.sql.autoBroadcastJoinThreshold": "-1",
}


def aqe_fact_dim_rows(spark, d, runs):
    """AQE-on column for the fact-dim join (VERDICT r6 #6): the same
    hot-key merge join, wide rows (64-byte payload — AQE's skew
    detector triggers on SHUFFLE BYTES, and the micro fixture's
    constant-key rows lz4-compress below any sane byte threshold), run
    with (1) AQE defaults, (2) skew-split thresholds scaled to the
    fixture, (3) the manual salted join under the same forced-split
    confs (composition).  Returns (rows, split_seen, parity_ok)."""
    def wide_sides():
        ev = (load_table(spark, d, "events")
              .withColumn("payload",
                          F.sha2(F.col("event_id").cast("string"), 256)))
        cu = (load_table(spark, d, "customer")
              .select("c_custkey", "c_mktsegment"))
        return ev, cu

    def wide_join(spark, d):
        ev, cu = wide_sides()
        return ev.join(cu.hint("merge"), ev.user_id == cu.c_custkey)

    def salted_wide(spark, d):
        n_salt = 8
        ev, cu = wide_sides()
        ev = ev.withColumn("salt", (F.col("event_id") % n_salt).cast("int"))
        cu = cu.withColumn("salt", F.explode(
            F.sequence(F.lit(0), F.lit(n_salt - 1)).cast("array<int>")))
        return ev.join(F.broadcast(cu),
                       (ev.user_id == cu.c_custkey) & (ev.salt == cu.salt))

    prior = {k: spark.conf.get(k, None) for k in AQE_SKEW_CONFS}

    def set_confs(vals):
        for k, v in vals.items():
            (spark.conf.unset(k) if v is None
             else spark.conf.set(k, str(v)))

    t_default = timed(wide_join, spark, d, runs)
    base = wide_join(spark, d)
    try:
        set_confs(AQE_SKEW_CONFS)
        t_split = timed(wide_join, spark, d, runs)
        # marker must come from THIS dataset's executed (final) plan:
        # a .write runs through its own command QueryExecution and the
        # dataset's QE is never AQE-finalized, so collect (not noop
        # write) is required; collect also keeps the payload column in
        # the shuffle (a count/agg would prune it and kill the byte
        # trigger).  1/20 row subset bounds driver memory while the hot
        # partition stays megabytes above the 256KB threshold.
        j = wide_join(spark, d).filter(F.col("event_id") % 20 == 0)
        _ = j.collect()
        plan = j._jdf.queryExecution().executedPlan().toString()
        split_seen = "skew=true" in plan
        t_salted = timed(salted_wide, spark, d, runs)
        g = salted_wide(spark, d).select(*base.columns)
        parity_ok = (base.exceptAll(g).count()
                     + g.exceptAll(base).count()) == 0
    finally:
        set_confs(prior)
    rows = [
        ("merge join, AQE defaults", t_default,
         "no split: 256MB-class thresholds are cluster-sized"),
        ("merge join, thresholds fixture-scaled", t_split,
         "hot partition split at runtime"
         if split_seen else "SPLIT NOT OBSERVED"),
        ("salted join under forced split", t_salted,
         "guards compose with AQE"
         if parity_ok else "PARITY MISMATCH"),
    ]
    return rows, split_seen, parity_ok


def main():
    scale = int(sys.argv[sys.argv.index("--scale") + 1]) \
        if "--scale" in sys.argv else 5
    runs = int(sys.argv[sys.argv.index("--runs") + 1]) \
        if "--runs" in sys.argv else 3
    d = generate("/tmp/testdata_skew_bench", scale=scale)
    spark = get_spark("flinkapps-skewbench")
    spark.sparkContext.setLogLevel("ERROR")
    # warm up JVM + python workers
    agg_naive(spark, d).write.format("noop").mode("overwrite").save()
    (spark.range(256).repartition(64)
     .mapInPandas(lambda it: it, schema="id long")
     .write.format("noop").mode("overwrite").save())

    rows = []
    for name, note, naive, guarded, expect_equal, balance, bkind in PAIRS:
        if expect_equal:
            a, b = naive(spark, d), guarded(spark, d)
            mismatch = a.exceptAll(b).count() + b.exceptAll(a).count()
            parity = "identical" if mismatch == 0 else f"MISMATCH {mismatch}"
        else:
            parity = "capped semantics (oracle-checked in tests)"
        bn, bg = balance(spark, d)
        bal = f"{bn:.1%} → {bg:.2%} ({bkind})"
        tn = timed(naive, spark, d, runs)
        tg = timed(guarded, spark, d, runs)
        rows.append((name, note, tn, tg, tn / max(tg, 1e-9), bal, parity))
        print(f"{name}: naive={tn:.2f}s guarded={tg:.2f}s "
              f"balance {bal} parity={parity}")

    aqe_rows, split_seen, parity_ok = aqe_fact_dim_rows(spark, d, runs)
    for name, t, note in aqe_rows:
        print(f"AQE: {name}: {t:.2f}s ({note})")

    ev_n = load_table(spark, d, "events").count()
    li_n = load_table(spark, d, "lineitem").count()
    doc_n = load_table(spark, d, "documents").count()
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "SKEWBENCH.md"), "w") as f:
        f.write(
            "# SKEWBENCH — naive vs guarded on the zipf fixture\n\n"
            f"Fixture: scripts/gen_skew.py --scale {scale} "
            f"(events {ev_n:,} rows with one user owning "
            f"~{HOT_USER_RATE:.0%}; lineitem {li_n:,} rows with "
            f"{HOT_PARTS} items each in ~{HOT_PART_RATE:.0%} of baskets; "
            f"documents {doc_n:,} rows with one text duplicated into "
            f"~{HOT_DOC_RATE:.0%}).  Medians of {runs} runs on "
            "local[32]; parity "
            "re-checked in-run via exceptAll both directions "
            "(tests/test_skew_guards.py carries the oracle-checked "
            "correctness half).\n\n"
            "| guard | what it does | naive s | guarded s | naive/guarded |"
            " straggler bound | parity |\n|---|---|---|---|---|---|---|\n")
        for name, note, tn, tg, ratio, bal, parity in rows:
            f.write(f"| {name} | {note} | {tn:.2f} | {tg:.2f} | "
                    f"{ratio:.2f}x | {bal} | {parity} |\n")
        f.write(
            "\nReading the table honestly:\n\n"
            "- **straggler bound** is the scale-independent column: the "
            "largest reduce key's share of all rows, before → after the "
            "guard re-keys it.  On a 1000-executor cluster the naive "
            "share is the fraction of the whole stage ONE task "
            "serializes (30% hot key = the stage runs at ~1/0.3 of one "
            "task's speed no matter the cluster size); the guarded "
            "share is the bound the salt/slice/cap enforces.  Wall-"
            "clock on local[32] with page-cached inputs underSTATES the "
            "naive penalty — the bound column is what predicts 100 TB.\n"
            "- **wall-clock ratios > 1** (fact-dim join) are where the "
            "straggler already bites at this toy scale.\n"
            "- **aggregation / exact dedup** naive ~wins locally and "
            "that is expected: Spark's map-side partial aggregation "
            "already collapses a hot key to one row per map task for "
            "algebraic aggregates, so the salted two-phase is insurance "
            "for what partial agg can't absorb (holistic aggregates, "
            "partial-agg-disabled sessions, per-task hash-table "
            "eviction under huge key cardinality) — the guards stay "
            "opt-in flags for exactly that reason.\n"
            "- **as-of** slice-all pays carry-in overhead on every cold "
            "key; the ADAPTIVE row (slice_hot_threshold) routes only "
            "keys above a row-count threshold through the sliced path "
            "and keeps the cold majority on the direct path — "
            "near-naive cost with the same straggler bound on the hot "
            "key, which is the form a 100 TB job should run.\n"
            "- **fact-dim join** naive pins a shuffle-merge join: with "
            "a broadcastable dim Spark broadcasts and skew is moot; the "
            "salted pattern targets dims past broadcast size.\n")
        f.write(
            "\n## AQE-native skew split — fact-dim join, AQE-on column\n\n"
            "The same hot-key merge join with WIDE rows (64-byte "
            "payload: AQE's detector triggers on shuffle BYTES, and the "
            "micro fixture's constant-key narrow rows lz4-compress "
            "below any sane byte threshold — a real 100 TB row does "
            "not).  Medians of the same run count as above; parity "
            "checked via exceptAll; the runtime-split marker "
            "(SortMergeJoin(skew=true)) is also pinned by "
            "tests/test_skew_guards.py::"
            "test_aqe_skew_split_and_guard_composition.\n\n"
            "| config | s | outcome |\n|---|---|---|\n")
        for name, t, note in aqe_rows:
            f.write(f"| {name} | {t:.2f} | {note} |\n")
        f.write(
            "\nDivision of labor (pinned by the composition test):\n\n"
            "- **Rely on AQE** for hot post-shuffle partitions of "
            "shuffle EQUI-joins (sort-merge / shuffled-hash): it splits "
            "the skewed reduce partition at runtime and replicates the "
            "matching side — zero code, correct by construction.  On a "
            "real cluster the 256MB-class default thresholds are the "
            "right ones; this bench scales them to fixture size only "
            "to force the decision locally.\n"
            "- **Rely on the manual guards** where AQE structurally "
            "cannot act: pair expansion inside a broadcast-join task "
            "(pop_cap), per-key pandas buckets in the as-of "
            "(time_slice / slice_hot_threshold), the FIRST shuffle's "
            "key placement for holistic aggregation and dedup (salted "
            "two-phase) — AQE only rewrites post-shuffle reads of "
            "shuffle joins, never the inside of a task or a "
            "non-join exchange consumer.\n"
            "- **Composition**: the salted join under forced skew-split "
            "returns identical results — salting changes the join KEY "
            "(key, salt), so AQE sees an ordinary join and the two "
            "mechanisms never contend for the same partition.\n")
    print("wrote SKEWBENCH.md")
    spark.stop()


if __name__ == "__main__":
    main()
