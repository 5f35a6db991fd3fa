"""Skew-guard verification on a zipf-adversarial fixture (VERDICT r5 #1-2).

Every skew-safe path the engine ships was previously verified correct on
UNIFORM TPC-H-ish fixtures only.  These tests run each guard on
scripts/gen_skew.py's adversarial shapes — a hot user owning 30% of
events, 5 items each in 30% of baskets, one document text duplicated
into 30% of rows — and prove, under actual skew:

1. the NEW pop_cap guard (operators/baskets.py) is lossless against a
   capped DuckDB oracle and bounds the pair fan-out it exists to bound;
2. every pre-existing guard (salted agg, salted join, as-of time slice,
   dedup skew_guard) still matches its naive/oracle twin bit-for-bit.

SKEWBENCH.md (scripts/bench_skew.py) carries the naive-vs-guarded
timings on the same fixture; these tests carry the correctness half.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flinkapps_spark.operators.baskets import sql_cap_popular_items
from flinkapps_spark.operators.dedup import exact_dedup
from flinkapps_spark.plans import catalog
from flinkapps_spark.plans.analytics_queries import (
    COSINE_MIN_CO, COSINE_TOPK, recsys_item_cosine,
)
from flinkapps_spark.plans.relational_queries import (
    COPURCHASE_MIN_SUP, itemset_copurchase_pairs,
)
from flinkapps_spark.sources.batch import load_table
from scripts.gen_skew import HOT_PARTS, generate
from tests.conftest import make_duck
from tests.oracle_harness import compare

REG = catalog.registry()
POP_CAP = 1000   # hot parts carry ~6000 support; the uniform tail < 100


@pytest.fixture(scope="module")
def skew_dir(tmp_path_factory):
    return generate(str(tmp_path_factory.mktemp("skew")), scale=1)


@pytest.fixture(scope="module")
def skew_duck(skew_dir):
    con = make_duck(skew_dir)
    yield con
    con.close()


# --- the new pop_cap guard --------------------------------------------------


def _capped_recsys_oracle() -> str:
    capped = sql_cap_popular_items("b0", "l_partkey", POP_CAP)
    return f"""
        WITH b0 AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        b AS (SELECT * FROM {capped}),
        co AS (
            SELECT a.l_partkey AS part_a, b2.l_partkey AS part_b,
                   COUNT(*) AS co_cnt
            FROM b a JOIN b b2
              ON a.l_orderkey = b2.l_orderkey
             AND a.l_partkey < b2.l_partkey
            GROUP BY 1, 2
            HAVING COUNT(*) >= {COSINE_MIN_CO}),
        cnt AS (SELECT l_partkey, COUNT(*) AS n FROM b GROUP BY l_partkey)
        SELECT part_a, part_b, co_cnt, ca.n AS n_a, cb.n AS n_b,
               co_cnt / sqrt(CAST(ca.n * cb.n AS DOUBLE)) AS cosine
        FROM co
        JOIN cnt ca ON ca.l_partkey = part_a
        JOIN cnt cb ON cb.l_partkey = part_b
        ORDER BY cosine DESC, part_a, part_b
        LIMIT {COSINE_TOPK}
    """


def _capped_itemset_oracle() -> str:
    capped = sql_cap_popular_items("op0", "part", POP_CAP)
    return f"""
        WITH op0 AS (
            SELECT DISTINCT l_orderkey AS okey, l_partkey AS part
            FROM lineitem),
        op AS (SELECT * FROM {capped}),
        n AS (SELECT COUNT(DISTINCT okey) AS n_orders FROM op),
        psup AS (SELECT part, COUNT(*) AS sup FROM op GROUP BY part),
        pairs AS (
            SELECT a.part AS part_a, b.part AS part_b, COUNT(*) AS support
            FROM op a JOIN op b
              ON a.okey = b.okey AND a.part < b.part
            GROUP BY a.part, b.part
            HAVING COUNT(*) >= {COPURCHASE_MIN_SUP})
        SELECT part_a, part_b, support,
               ROUND(CAST(support * n.n_orders AS DOUBLE)
                     / CAST(sa.sup * sb.sup AS DOUBLE), 6) AS lift
        FROM pairs
        JOIN psup sa ON sa.part = part_a
        JOIN psup sb ON sb.part = part_b
        CROSS JOIN n
    """


def test_pop_cap_recsys_parity_on_zipf(spark, skew_dir, skew_duck):
    """The capped cosine plan is lossless: identical to a DuckDB oracle
    that applies the same support cap before the self-join."""
    sdf = recsys_item_cosine(spark, skew_dir, pop_cap=POP_CAP)
    compare(sdf, skew_duck.sql(_capped_recsys_oracle()),
            "recsys_item_cosine[pop_cap]")


def test_pop_cap_itemset_parity_on_zipf(spark, skew_dir, skew_duck):
    sdf = itemset_copurchase_pairs(spark, skew_dir, pop_cap=POP_CAP)
    compare(sdf, skew_duck.sql(_capped_itemset_oracle()),
            "itemset_copurchase_pairs[pop_cap]")


def test_pop_cap_bounds_fanout(spark, skew_dir):
    """The guard actually removes the quadratic mass: total within-order
    pair volume (sum of C(basket,2)) drops by the hot items' share, and
    no surviving item exceeds the cap."""
    op = (load_table(spark, skew_dir, "lineitem")
          .select("l_orderkey", "l_partkey").distinct())
    from flinkapps_spark.operators.baskets import cap_popular_items
    capped = cap_popular_items(op, "l_partkey", POP_CAP)

    def pair_volume(df):
        per = df.groupBy("l_orderkey").agg(F.count("*").alias("k"))
        return per.agg(F.sum(F.expr("k * (k - 1) div 2"))).first()[0]

    naive, guarded = pair_volume(op), pair_volume(capped)
    assert guarded < 0.6 * naive, (naive, guarded)
    max_sup = (capped.groupBy("l_partkey").count()
               .agg(F.max("count")).first()[0])
    assert max_sup <= POP_CAP, max_sup
    # the hot list really was the HOT_PARTS planted items
    dropped = (op.select("l_partkey").distinct()
               .subtract(capped.select("l_partkey").distinct()).count())
    assert dropped == HOT_PARTS, dropped


def test_pop_cap_plan_broadcast_anti(spark, skew_dir):
    """The hot list rides a broadcast LEFT ANTI join (map-side; the big
    basket table is never re-shuffled for the cap) and the capped plan
    keeps the no-cartesian property."""
    plan = (itemset_copurchase_pairs(spark, skew_dir, pop_cap=POP_CAP)
            ._jdf.queryExecution().executedPlan().toString())
    assert "LeftAnti" in plan, plan
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan, plan
    assert "CartesianProduct" not in plan, plan


# --- pre-existing guards, now under actual skew ------------------------------

SKEW_ORACLE_CHECKED = [
    "agg_two_phase_salted",     # salted two-phase vs direct-groupBy oracle
    "join_salted_skew",         # salted+replicated join vs plain-join oracle
    "join_asof_skew_split",     # time-sliced as-of vs ASOF JOIN oracle
]


@pytest.mark.parametrize("name", SKEW_ORACLE_CHECKED)
def test_guard_oracle_parity_on_zipf(spark, skew_dir, skew_duck, name):
    """Each guarded catalog query's oracle IS the naive plan — parity on
    the zipf fixture proves guarded == naive under the skew the guard
    exists for (the uniform-fixture parity already passes; this is the
    shape that matters)."""
    q = REG[name]
    compare(q.build(spark, skew_dir), skew_duck.sql(q.oracle),
            f"{name}[zipf]")


def test_dedup_skew_guard_on_hot_digest(spark, skew_dir):
    """exact_dedup's two-phase salted path equals the one-shuffle path on
    a corpus where one digest holds 30% of all rows."""
    docs = load_table(spark, skew_dir, "documents")
    plain = sorted(tuple(r) for r in exact_dedup(docs).collect())
    guarded = sorted(tuple(r)
                     for r in exact_dedup(docs, skew_guard=True).collect())
    assert plain == guarded
    hot = max(n for _, _, n in plain)
    assert hot >= 0.29 * docs.count()   # the fixture shape really is hot


def test_asof_adaptive_hot_split(spark, skew_dir):
    """slice_hot_threshold routes ONLY the hot key through the sliced
    path (cold keys stay on the cheap direct path); the union equals the
    unsplit join row-for-row on the zipf fixture."""
    from flinkapps_spark.operators import joins

    ev = load_table(spark, skew_dir, "events")
    left = (ev.filter(F.col("event_type") == "purchase")
            .select("event_id", "user_id", "ts", "value"))
    right = (ev.filter(F.col("event_type") == "signup")
             .select("user_id", "ts",
                     F.col("ts").alias("signup_ts"),
                     F.col("value").alias("signup_value")))
    kw = dict(key_cols=["user_id"], ts_col="ts",
              value_cols=["signup_ts", "signup_value"])
    plain = sorted(tuple(r) for r in
                   joins.asof_join(left, right, **kw).collect())
    adaptive = sorted(tuple(r) for r in
                      joins.asof_join(left, right, time_slice="6h",
                                      slice_hot_threshold=5000,
                                      **kw).collect())
    assert plain == adaptive


def test_asof_hot_threshold_without_time_slice_raises(spark):
    """slice_hot_threshold without time_slice must fail loudly — the
    silent fall-through would hand a caller who opted into the hot-key
    split the unsliced path with no straggler bound (ADVICE r6)."""
    from flinkapps_spark.operators import joins

    df = spark.createDataFrame(
        [(1, 1)], "user_id long, ts long").withColumn(
        "ts", F.timestamp_seconds(F.col("ts")))
    with pytest.raises(ValueError, match="time_slice"):
        joins.asof_join(df, df, key_cols=["user_id"], ts_col="ts",
                        slice_hot_threshold=10)


def test_pop_cap_null_item_contract(spark):
    """NULL item keys are KEPT (never capped) on BOTH engines: Spark's
    left_anti never matches NULL, and the oracle twin uses NOT EXISTS
    precisely because NOT IN would three-valued-logic every row to NULL
    once the hot list contains a NULL (review r6 finding)."""
    import duckdb

    from flinkapps_spark.operators.baskets import (
        cap_popular_items, sql_cap_popular_items,
    )

    rows = [(1, None), (2, None), (3, 5), (4, 5), (5, 6)]
    op = spark.createDataFrame(rows, "okey long, item long")
    got_spark = sorted(
        (r["okey"], r["item"])
        for r in cap_popular_items(op, "item", 1).collect())
    con = duckdb.connect()
    try:
        con.execute("CREATE TABLE b (okey BIGINT, item BIGINT)")
        con.executemany("INSERT INTO b VALUES (?, ?)", rows)
        got_duck = sorted(map(tuple, con.sql(
            f"SELECT okey, item FROM {sql_cap_popular_items('b', 'item', 1)}"
            " q").fetchall()))
    finally:
        con.close()
    expect = [(1, None), (2, None), (5, 6)]   # item 5 (support 2) capped
    assert got_spark == expect, got_spark
    assert got_duck == expect, got_duck


def test_aqe_skew_split_and_guard_composition(spark, skew_dir):
    """Division of labor between AQE and the manual guards (VERDICT r6
    #6), pinned:

    (a) AQE-NATIVE territory: hot POST-SHUFFLE partitions of a
        sort-merge equi-join.  With byte thresholds scaled to the
        fixture, Spark splits the hot partition at runtime —
        SortMergeJoin(skew=true) — and the result is unchanged.  The
        trigger is SHUFFLE BYTES, so the left side carries a
        high-entropy payload the way a real wide row does (the micro
        fixture's constant-hot-key rows lz4-compress below any sane
        threshold — the reason SKEWBENCH's AQE row lowers thresholds).
    (b) MANUAL-guard territory (asserted structurally: no SMJ for AQE
        to split): pair expansion inside a broadcast-join task
        (pop_cap), per-key pandas buckets in the as-of (time_slice),
        holistic/first-shuffle placement (salted agg, dedup skew_guard)
        — AQE only rewrites post-shuffle reads of shuffle joins.
    (c) COMPOSITION: with skew-split forced on aggressively, the salted
        join and the adaptive as-of return exactly their AQE-default
        results — the guards never fight the runtime re-plan.
    """
    from flinkapps_spark.operators import joins
    from flinkapps_spark.plans.catalog import registry
    # the SAME conf set SKEWBENCH's AQE section benches — import, don't
    # copy, so a retune can never leave the test pinning a stale config
    from scripts.bench_skew import AQE_SKEW_CONFS as aggressive

    prior = {k: spark.conf.get(k, None) for k in aggressive}

    def set_confs(vals):
        for k, v in vals.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)

    left = spark.range(0, 200_000).select(
        F.when(F.col("id") % 10 < 3, F.lit(1))
        .otherwise(F.col("id") % 5000).alias("k"),
        F.sha2(F.col("id").cast("string"), 256).alias("payload"))
    right = spark.range(0, 5000).select(
        F.col("id").alias("k"),
        F.sha2((F.col("id") * 7).cast("string"), 256).alias("dim"))

    ev = load_table(spark, skew_dir, "events")
    asof_kw = dict(key_cols=["user_id"], ts_col="ts",
                   value_cols=["signup_ts", "signup_value"])
    a_left = (ev.filter(F.col("event_type") == "purchase")
              .select("event_id", "user_id", "ts", "value"))
    a_right = (ev.filter(F.col("event_type") == "signup")
               .select("user_id", "ts", F.col("ts").alias("signup_ts"),
                       F.col("value").alias("signup_value")))
    salted = registry()["join_salted_skew"]

    # baseline results under the session's default AQE settings
    base_join = sorted(tuple(r) for r in
                       left.join(right.hint("merge"), "k").collect())
    base_salted = sorted(tuple(r) for r in
                         salted.build(spark, skew_dir).collect())
    base_asof = sorted(tuple(r) for r in
                       joins.asof_join(a_left, a_right, time_slice="6h",
                                       slice_hot_threshold=5000,
                                       **asof_kw).collect())
    try:
        set_confs(aggressive)
        # (a) the hot partition is split at runtime, values unchanged
        j = left.join(right.hint("merge"), "k")
        got = sorted(tuple(r) for r in j.collect())
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan
        assert got == base_join
        # (c) guards compose: identical results with skew-split forced
        assert sorted(tuple(r) for r in
                      salted.build(spark, skew_dir).collect()) \
            == base_salted
        assert sorted(tuple(r) for r in
                      joins.asof_join(a_left, a_right, time_slice="6h",
                                      slice_hot_threshold=5000,
                                      **asof_kw).collect()) == base_asof
    finally:
        set_confs(prior)


def test_theilsen_hist_empty_pairs(spark):
    """hist_mode=True on an events set where no type has two hourly
    buckets returns the SAME empty frame (and schema) the window path
    returns, instead of crashing on a zero-branch coalesce (review r6
    finding)."""
    import os
    import tempfile

    from flinkapps_spark.plans.timeseries_queries import (
        events_trend_theilsen,
    )

    d = tempfile.mkdtemp(prefix="ts_single_hour_")
    (spark.createDataFrame(
        [(1, "2024-01-01 10:00:05", 7, "view", 1.0),
         (2, "2024-01-01 10:30:00", 8, "click", 2.0)],
        "event_id long, ts string, user_id long, event_type string, "
        "value double")
     .withColumn("ts", F.col("ts").cast("timestamp"))
     .write.mode("overwrite").parquet(os.path.join(d, "events.parquet")))
    hist = events_trend_theilsen(spark, d, hist_mode=True)
    window = events_trend_theilsen(spark, d, hist_mode=False)
    assert hist.count() == 0 and window.count() == 0
    assert [f.dataType for f in hist.schema.fields] == \
        [f.dataType for f in window.schema.fields], (hist.schema,
                                                     window.schema)
