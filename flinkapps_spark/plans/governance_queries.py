"""Data-governance & training-data-management queries: CDC changelog
application, privacy (k-anonymity / l-diversity) auditing, corpus
diversity metrics, and deterministic epoch shuffling with batch
assignment — the bookkeeping layer of a production 100 TB data platform.

Beyond-reference extensions (the reference has no governance surface);
each follows the catalog conventions: identical column aliases on both
sides, fixed-point exact sums for any float aggregate, and float
constants injected into the oracle SQL via ``repr()`` so both engines
parse the *same* IEEE-754 double.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from flinkapps_spark.operators.cdc import apply_changelog
from flinkapps_spark.plans.catalog import query
from flinkapps_spark.plans.pipeline_queries import _sql_word_code
from flinkapps_spark.plans.exact import exact_sum, sql_sum, sql_units, units_col
from flinkapps_spark.sources.batch import load_table

# ---------------------------------------------------------------------------
# cdc_apply_changelog
# ---------------------------------------------------------------------------

UPLIFT = 1.1          # deterministic synthetic UPDATE: price * 1.1 @ 2 dp


@query(
    "cdc_apply_changelog",
    oracle=f"""
        WITH chg AS (
            SELECT o_orderkey AS okey, 1 AS seq, 'I' AS op,
                   o_totalprice AS price FROM orders
            UNION ALL
            SELECT o_orderkey, 2, 'U',
                   ({sql_units(f'o_totalprice * {UPLIFT!r}', 100)}
                    / CAST(100 AS DOUBLE))
            FROM orders WHERE o_orderkey % 3 = 0
            UNION ALL
            SELECT o_orderkey, 3, 'D', CAST(NULL AS DOUBLE)
            FROM orders WHERE o_orderkey % 5 = 0
        ),
        ranked AS (
            SELECT okey, op, price,
                   ROW_NUMBER() OVER (PARTITION BY okey
                                      ORDER BY seq DESC) AS rn,
                   COUNT(*) OVER (PARTITION BY okey) AS n_changes
            FROM chg
        )
        SELECT okey, op, price, n_changes
        FROM ranked WHERE rn = 1 AND op <> 'D'
    """,
    category="extension: CDC changelog apply",
    doc="Debezium-style changelog merge: a deterministic synthetic "
        "changelog over orders (every key INSERTs at seq 1; keys %3==0 "
        "UPDATE price*1.1 at seq 2; keys %5==0 DELETE at seq 3) collapsed "
        "to final state by operators/cdc.apply_changelog — last write "
        "wins per key, deletes tombstone. Scale: one shuffle on the key; "
        "row_number and the audit count share one Window "
        "partitioning/sort so Catalyst emits a single Exchange. The "
        "uplifted price is fixed-point-rounded (units formula, 2 dp) so "
        "both engines produce the identical double.",
)
def cdc_apply_changelog(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    okey = F.col("o_orderkey").alias("okey")
    ins = orders.select(okey, F.lit(1).alias("seq"), F.lit("I").alias("op"),
                        F.col("o_totalprice").alias("price"))
    upd = (orders.filter(F.col("o_orderkey") % 3 == 0)
           .select(okey, F.lit(2).alias("seq"), F.lit("U").alias("op"),
                   (units_col(F.col("o_totalprice") * UPLIFT, 100)
                    / 100.0).alias("price")))
    dele = (orders.filter(F.col("o_orderkey") % 5 == 0)
            .select(okey, F.lit(3).alias("seq"), F.lit("D").alias("op"),
                    F.lit(None).cast("double").alias("price")))
    chg = ins.unionByName(upd).unionByName(dele)
    return (apply_changelog(chg, ["okey"], seq_col="seq", op_col="op")
            .select("okey", "op", "price", "n_changes"))


# ---------------------------------------------------------------------------
# privacy_k_anonymity
# ---------------------------------------------------------------------------

K_ANON = 10           # minimum equivalence-class size
L_DIVERSE = 3         # minimum distinct sensitive values per class


@query(
    "privacy_k_anonymity",
    oracle=f"""
        SELECT c_nationkey, c_mktsegment,
               COUNT(*) AS class_size,
               COUNT(DISTINCT CAST(floor(c_acctbal / 1000.0) AS BIGINT))
                   AS n_sensitive,
               COUNT(*) >= {K_ANON} AS k_anonymous,
               COUNT(DISTINCT CAST(floor(c_acctbal / 1000.0) AS BIGINT))
                   >= {L_DIVERSE} AS l_diverse
        FROM customer
        GROUP BY c_nationkey, c_mktsegment
    """,
    category="extension: privacy audit",
    doc="k-anonymity / l-diversity audit (Sweeney 2002; Machanavajjhala "
        "et al. 2007): customers grouped by the quasi-identifier "
        "(nation, market segment); each equivalence class reports its "
        "size (re-identification risk when < k=10) and the diversity of "
        "the sensitive attribute (account-balance bucket, floor(bal/"
        "1000) — homogeneity attack risk when < l=3). Scale: one "
        "partial-aggregated shuffle on the QI columns; the distinct "
        "count is exact (buckets are small-cardinality ints). The "
        "bucket is floor of the identical double division on both "
        "engines.",
)
def privacy_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    bucket = F.floor(F.col("c_acctbal") / 1000.0)
    return (cust.groupBy("c_nationkey", "c_mktsegment")
            .agg(F.count("*").alias("class_size"),
                 F.countDistinct(bucket).alias("n_sensitive"))
            .select("c_nationkey", "c_mktsegment", "class_size",
                    "n_sensitive",
                    (F.col("class_size") >= K_ANON).alias("k_anonymous"),
                    (F.col("n_sensitive") >= L_DIVERSE).alias("l_diverse")))


# ---------------------------------------------------------------------------
# source_entropy_diversity
# ---------------------------------------------------------------------------

ENT_SCALE = 10 ** 9   # fixed-point scale for entropy/HHI term sums


@query(
    "source_entropy_diversity",
    oracle=f"""
        WITH cnt AS (
            SELECT source, lang, COUNT(*) AS c
            FROM documents GROUP BY source, lang
        ),
        tot AS (
            SELECT source, CAST(SUM(c) AS BIGINT) AS t
            FROM cnt GROUP BY source
        )
        SELECT source, t AS n_docs, COUNT(*) AS n_langs,
               {sql_sum('-((CAST(c AS DOUBLE) / t) * '
                        'ln(CAST(c AS DOUBLE) / t))', ENT_SCALE)}
                   AS entropy_nats,
               {sql_sum('(CAST(c AS DOUBLE) / t) * '
                        '(CAST(c AS DOUBLE) / t)', ENT_SCALE)} AS hhi
        FROM cnt JOIN tot USING (source)
        GROUP BY source, t
    """,
    category="extension: corpus diversity metrics",
    doc="Training-mix diversity audit: per source, the Shannon entropy "
        "(nats) and Herfindahl concentration (sum p^2) of its language "
        "distribution — the dashboard numbers behind 'is this crawl "
        "slice monolingual?'. Scale: two small aggregations (source x "
        "lang cardinality, then source); the fact table is scanned "
        "once. Determinism: p = exact-int division, p*ln(p) is the "
        "identical libm op on both engines, and the per-source sums are "
        "fixed-point (scale 1e9) so lang addition order cannot flip a "
        "bit.",
)
def source_entropy_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    cnt = docs.groupBy("source", "lang").agg(F.count("*").alias("c"))
    tot = cnt.groupBy("source").agg(F.sum("c").alias("t"))
    j = cnt.join(tot, "source")
    p = F.col("c").cast("double") / F.col("t")
    return (j.groupBy("source", "t")
            .agg(F.count("*").alias("n_langs"),
                 exact_sum(-(p * F.log(p)), ENT_SCALE).alias("entropy_nats"),
                 exact_sum(p * p, ENT_SCALE).alias("hhi"))
            .select("source", F.col("t").alias("n_docs"), "n_langs",
                    "entropy_nats", "hhi"))


# ---------------------------------------------------------------------------
# shuffle_epoch_batches
# ---------------------------------------------------------------------------

N_EPOCHS = 2
BATCH_SIZE = 256


@query(
    "shuffle_epoch_batches",
    oracle=f"""
        WITH e AS (
            SELECT doc_id, epoch FROM documents
            CROSS JOIN (SELECT unnest([0, 1]) AS epoch) ep
        ),
        b AS (
            SELECT doc_id, epoch,
                   md5(CAST(epoch AS VARCHAR) || ':' ||
                       CAST(doc_id AS VARCHAR)) AS skey
            FROM e
        ),
        r AS (
            SELECT doc_id, epoch, substr(skey, 1, 2) AS bucket, skey,
                   ROW_NUMBER() OVER (PARTITION BY epoch, substr(skey, 1, 2)
                                      ORDER BY skey, doc_id) AS rn
            FROM b
        ),
        oset AS (
            SELECT epoch, substr(skey, 1, 2) AS bucket,
                   CAST(SUM(COUNT(*)) OVER (PARTITION BY epoch
                                            ORDER BY substr(skey, 1, 2))
                        AS BIGINT) - COUNT(*) AS off
            FROM b GROUP BY epoch, substr(skey, 1, 2)
        )
        SELECT r.epoch, r.doc_id,
               (off + rn - 1) AS epoch_pos,
               CAST(floor((off + rn - 1) / {BATCH_SIZE}.0) AS BIGINT)
                   AS batch_id,
               ((off + rn - 1) % {BATCH_SIZE}) AS pos_in_batch
        FROM r JOIN oset USING (epoch, bucket)
    """,
    category="extension: deterministic epoch shuffle",
    doc="Deterministic training-epoch shuffle + fixed-size batch "
        "assignment: each (epoch, doc) gets a pseudo-random but "
        "reproducible global position by ranking on md5(epoch:doc_id), "
        "then batch_id = pos // 256. The global rank is computed "
        "DISTRIBUTED: rank within (epoch, first-byte-of-md5 bucket) via "
        "one window, plus per-bucket offsets from a 2x256-row cumulative "
        "count that is broadcast — no epoch-wide single-partition sort, "
        "so the pattern holds at 100 TB (the bucket prefix of the sort "
        "key makes bucket-order + within-bucket-order = global order). "
        "Every op is integer/string-exact; no floats beyond the final "
        "floor division.",
)
def shuffle_epoch_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    epochs = F.explode(F.array(*[F.lit(i) for i in range(N_EPOCHS)]))
    e = docs.select("doc_id", epochs.alias("epoch"))
    d = (e.withColumn("skey", F.md5(F.concat_ws(
            ":", F.col("epoch").cast("string"),
            F.col("doc_id").cast("string"))))
         .withColumn("bucket", F.substring("skey", 1, 2)))
    wr = Window.partitionBy("epoch", "bucket").orderBy("skey", "doc_id")
    ranked = d.withColumn("rn", F.row_number().over(wr))
    wo = Window.partitionBy("epoch").orderBy("bucket")
    off = (d.groupBy("epoch", "bucket").agg(F.count("*").alias("c"))
           .withColumn("off", F.sum("c").over(wo) - F.col("c"))
           .select("epoch", "bucket", "off"))
    pos = F.col("off") + F.col("rn") - 1
    return (ranked.join(F.broadcast(off), ["epoch", "bucket"])
            .select("epoch", "doc_id",
                    pos.alias("epoch_pos"),
                    F.floor(pos / float(BATCH_SIZE)).alias("batch_id"),
                    (pos % BATCH_SIZE).alias("pos_in_batch")))


# ---------------------------------------------------------------------------
# snapshot_diff — dataset-version diff via row fingerprints
# ---------------------------------------------------------------------------

DIFF_UPLIFT = 1.07          # synthetic snapshot-B price change (%3 keys)
DIFF_NEWKEY = 2_000_000_000  # key offset for synthetic inserted rows


@query(
    "snapshot_diff",
    oracle=f"""
        WITH a AS (
            SELECT o_orderkey AS okey, o_orderstatus AS st,
                   o_orderpriority AS pri,
                   {sql_units('o_totalprice', 100)} AS price_u
            FROM orders),
        b AS (
            SELECT okey, st, pri,
                   CASE WHEN okey % 3 = 0 THEN
                       {sql_units(f'(price_u / CAST(100 AS DOUBLE)) * {DIFF_UPLIFT!r}', 100)}
                   ELSE price_u END AS price_u
            FROM a WHERE okey % 7 <> 0
            UNION ALL
            SELECT okey + {DIFF_NEWKEY}, st, 'SYNTH', price_u
            FROM a WHERE okey % 11 = 0),
        fa AS (SELECT okey, price_u,
                      md5(concat_ws('|', CAST(price_u AS VARCHAR), st, pri))
                          AS fp
               FROM a),
        fb AS (SELECT okey, price_u,
                      md5(concat_ws('|', CAST(price_u AS VARCHAR), st, pri))
                          AS fp
               FROM b),
        d AS (
            SELECT COALESCE(fa.okey, fb.okey) AS okey,
                   CASE WHEN fb.okey IS NULL THEN 'removed'
                        WHEN fa.okey IS NULL THEN 'added'
                        WHEN fa.fp <> fb.fp THEN 'changed'
                        ELSE 'unchanged' END AS status,
                   COALESCE(fb.price_u, 0) - COALESCE(fa.price_u, 0)
                       AS delta_u
            FROM fa FULL OUTER JOIN fb ON fa.okey = fb.okey)
        SELECT status, COUNT(*) AS n_rows,
               CAST(SUM(delta_u) AS BIGINT) / CAST(100 AS DOUBLE)
                   AS price_delta
        FROM d GROUP BY status
    """,
    category="extension: snapshot diff (data versioning)",
    doc="Dataset-version diff (the Delta-Lake/DVC 'what changed between "
        "snapshot A and B' audit): snapshot B is derived deterministically "
        "from orders (keys %7==0 deleted, %3==0 price uplifted 7%, %11==0 "
        "re-inserted under a new key), every row is fingerprinted with "
        "md5 over its fixed-point-normalized columns, and a FULL OUTER "
        "join on the primary key classifies added / removed / changed / "
        "unchanged with the exact price delta per class. Scale: one "
        "co-partitioned shuffle join on the key (bucket both snapshots "
        "by key at 100 TB for a shuffle-free storage-partitioned join); "
        "the fingerprint is constant-width regardless of column count, "
        "so the compare never widens the shuffle. Fingerprint inputs are "
        "int64 units cast to string — engine-identical (double-to-string "
        "formatting never enters the hash).",
)
def snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    a = orders.select(
        F.col("o_orderkey").alias("okey"),
        F.col("o_orderstatus").alias("st"),
        F.col("o_orderpriority").alias("pri"),
        units_col(F.col("o_totalprice"), 100).alias("price_u"))
    b_kept = (a.filter(F.col("okey") % 7 != 0)
              .withColumn("price_u",
                          F.when(F.col("okey") % 3 == 0,
                                 units_col((F.col("price_u")
                                            / F.lit(100).cast("double"))
                                           * DIFF_UPLIFT, 100))
                          .otherwise(F.col("price_u"))))
    b_new = (a.filter(F.col("okey") % 11 == 0)
             .select((F.col("okey") + DIFF_NEWKEY).alias("okey"), "st",
                     F.lit("SYNTH").alias("pri"), "price_u"))
    b = b_kept.unionByName(b_new)

    def fp(df: DataFrame) -> DataFrame:
        return df.select(
            "okey", "price_u",
            F.md5(F.concat_ws("|", F.col("price_u").cast("string"),
                              "st", "pri")).alias("fp"))

    fa, fb = fp(a), fp(b)
    d = (fa.alias("fa").join(fb.alias("fb"), "okey", "full_outer")
         .select(
             F.when(F.col("fb.fp").isNull(), "removed")
              .when(F.col("fa.fp").isNull(), "added")
              .when(F.col("fa.fp") != F.col("fb.fp"), "changed")
              .otherwise("unchanged").alias("status"),
             (F.coalesce(F.col("fb.price_u"), F.lit(0))
              - F.coalesce(F.col("fa.price_u"), F.lit(0))).alias("delta_u")))
    return (d.groupBy("status")
            .agg(F.count(F.lit(1)).alias("n_rows"),
                 (F.sum("delta_u") / F.lit(100).cast("double"))
                     .alias("price_delta")))


# ---------------------------------------------------------------------------
# skew_key_audit — join-key distribution audit (pre-flight for big joins)
# ---------------------------------------------------------------------------


@query(
    "skew_key_audit",
    oracle="""
        WITH kc AS (
            SELECT l_suppkey AS key, COUNT(*) AS cnt
            FROM lineitem GROUP BY l_suppkey),
        r AS (
            SELECT key, cnt,
                   row_number() OVER (ORDER BY cnt DESC, key ASC) AS rn_d,
                   row_number() OVER (ORDER BY cnt ASC, key ASC) AS rn_a,
                   COUNT(*) OVER () AS n_keys
            FROM kc)
        SELECT MAX(n_keys) AS n_keys,
               CAST(SUM(cnt) AS BIGINT) AS total_rows,
               MAX(cnt) AS max_cnt,
               MAX(CASE WHEN rn_a = CAST(ceil(0.99 * n_keys) AS BIGINT)
                        THEN cnt END) AS p99_cnt,
               ROUND(CAST(MAX(cnt) * MAX(n_keys) AS DOUBLE)
                     / CAST(SUM(cnt) AS DOUBLE), 6) AS skew_ratio,
               ROUND(CAST(SUM(CASE WHEN rn_d <= 10 THEN cnt ELSE 0 END)
                          AS BIGINT)
                     / CAST(SUM(cnt) AS DOUBLE), 6) AS top10_share
        FROM r
    """,
    category="extension: skew audit (join pre-flight)",
    doc="Join-key skew auditor — the pre-flight check before shuffling "
        "100 TB on a key (feeds the salting / AQE-skew-join decision "
        "that joins.salted_join and the as-of time-slice path "
        "implement): per-key counts reduced to cardinality, max and "
        "exact-p99 frequency, skew ratio (max/mean as an int64 "
        "cross-product divided once) and top-10-key row share. Scale: "
        "the per-key count is one partial-agg shuffle; the audit "
        "windows run over the KEY-COUNT table (|keys| rows, orders of "
        "magnitude below the fact table — swap exact p99 for "
        "approx_percentile only at extreme key cardinality). p99 is an "
        "exact rank pick (ceil(0.99·n)-th smallest), not interpolated — "
        "engine-identical.",
)
def skew_key_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    kc = (li.groupBy(F.col("l_suppkey").alias("key"))
          .agg(F.count(F.lit(1)).alias("cnt")))
    w_d = Window.orderBy(F.col("cnt").desc(), F.col("key").asc())
    w_a = Window.orderBy(F.col("cnt").asc(), F.col("key").asc())
    w_all = Window.partitionBy()
    r = kc.select(
        "key", "cnt",
        F.row_number().over(w_d).alias("rn_d"),
        F.row_number().over(w_a).alias("rn_a"),
        F.count(F.lit(1)).over(w_all).alias("n_keys"))
    return r.agg(
        F.max("n_keys").alias("n_keys"),
        F.sum("cnt").alias("total_rows"),
        F.max("cnt").alias("max_cnt"),
        F.max(F.when(F.col("rn_a")
                     == F.ceil(0.99 * F.col("n_keys")).cast("long"),
                     F.col("cnt"))).alias("p99_cnt"),
        F.round((F.max("cnt") * F.max(F.col("n_keys"))).cast("double")
                / F.sum("cnt").cast("double"), 6).alias("skew_ratio"),
        F.round(F.sum(F.when(F.col("rn_d") <= 10, F.col("cnt"))
                      .otherwise(F.lit(0))).cast("double")
                / F.sum("cnt").cast("double"), 6).alias("top10_share"))


# ---------------------------------------------------------------------------
# drift_psi_features — population stability index between two periods
# ---------------------------------------------------------------------------

PSI_SPLIT_DAY = 16            # period A: Jan < 16; period B: rest
PSI_BIN = 25.0                # value-bucket width (mirrors histogram bins)
PSI_BIN_MAX = 19
PSI_FLOOR = 0.0005            # Laplace-style floor for empty buckets


@query(
    "drift_psi_features",
    oracle=f"""
        WITH tagged AS (
            SELECT CASE WHEN EXTRACT(day FROM ts) < {PSI_SPLIT_DAY}
                        THEN 'a' ELSE 'b' END AS period,
                   event_type,
                   CAST(least(floor(value / {PSI_BIN!r}), {PSI_BIN_MAX})
                        AS BIGINT) AS bin
            FROM events),
        cnt AS (
            SELECT event_type, bin,
                   CAST(SUM(CASE WHEN period = 'a' THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_a,
                   CAST(SUM(CASE WHEN period = 'b' THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_b
            FROM tagged GROUP BY event_type, bin),
        tot AS (
            SELECT event_type, bin, n_a, n_b,
                   CAST(SUM(n_a) OVER (PARTITION BY event_type) AS BIGINT)
                       AS tot_a,
                   CAST(SUM(n_b) OVER (PARTITION BY event_type) AS BIGINT)
                       AS tot_b
            FROM cnt),
        cells AS (
            SELECT event_type, bin, n_a, n_b,
                   GREATEST(CAST(n_a AS DOUBLE) / CAST(tot_a AS DOUBLE),
                            {PSI_FLOOR!r}) AS p_a,
                   GREATEST(CAST(n_b AS DOUBLE) / CAST(tot_b AS DOUBLE),
                            {PSI_FLOOR!r}) AS p_b
            FROM tot)
        SELECT event_type, bin, n_a, n_b,
               {sql_units('(p_a - p_b) * ln(p_a / p_b)', 1_000_000)}
                   / CAST(1000000 AS DOUBLE) AS psi_contrib,
               CAST(SUM({sql_units('(p_a - p_b) * ln(p_a / p_b)',
                                   1_000_000)})
                    OVER (PARTITION BY event_type) AS BIGINT)
                   / CAST(1000000 AS DOUBLE) AS psi_total
        FROM cells
    """,
    category="extension: distribution drift (PSI)",
    doc="Population Stability Index — the standard production-ML drift "
        "monitor comparing a feature's binned distribution across two "
        "periods: per (event_type, value-bucket) shares in period A vs "
        "B (floored to avoid ln(0)), per-bucket contribution "
        "(p_a - p_b)·ln(p_a/p_b), and the per-type PSI total "
        "(> 0.2 = action threshold). Contributions are fixed-point "
        "rounded BEFORE the total, so the sum is exact integer "
        "arithmetic — float summation order cannot flip the hash; the "
        "shares are identical int64/double divisions and ln is the "
        "same libm call on both engines (same policy as the unigram "
        "log-prob and DSIR queries). Scale: one partial-agg shuffle to "
        "~|types|x|bins| cells; margins are window sums over that tiny "
        "table — scan-speed at 100 TB.",
)
def drift_psi_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    tagged = ev.select(
        F.when(F.dayofmonth("ts") < PSI_SPLIT_DAY, "a").otherwise("b")
            .alias("period"),
        "event_type",
        F.least(F.floor(F.col("value") / PSI_BIN), F.lit(PSI_BIN_MAX))
            .cast("long").alias("bin"))
    cnt = (tagged.groupBy("event_type", "bin")
           .agg(F.sum(F.when(F.col("period") == "a", 1).otherwise(0))
                    .alias("n_a"),
                F.sum(F.when(F.col("period") == "b", 1).otherwise(0))
                    .alias("n_b")))
    wt = Window.partitionBy("event_type")
    tot = cnt.select(
        "event_type", "bin", "n_a", "n_b",
        F.sum("n_a").over(wt).alias("tot_a"),
        F.sum("n_b").over(wt).alias("tot_b"))
    p_a = F.greatest(F.col("n_a").cast("double")
                     / F.col("tot_a").cast("double"), F.lit(PSI_FLOOR))
    p_b = F.greatest(F.col("n_b").cast("double")
                     / F.col("tot_b").cast("double"), F.lit(PSI_FLOOR))
    contrib_u = units_col((p_a - p_b) * F.log(p_a / p_b), 1_000_000)
    cells = tot.select("event_type", "bin", "n_a", "n_b",
                       contrib_u.alias("contrib_u"))
    return cells.select(
        "event_type", "bin", "n_a", "n_b",
        (F.col("contrib_u") / F.lit(1_000_000).cast("double"))
            .alias("psi_contrib"),
        (F.sum("contrib_u").over(wt) / F.lit(1_000_000).cast("double"))
            .alias("psi_total"))


# ---------------------------------------------------------------------------
# dq_benford_digits — first-significant-digit distribution audit
# ---------------------------------------------------------------------------

import math as _math

_BENFORD_P = {d: _math.log10(1.0 + 1.0 / d) for d in range(1, 10)}
_BENFORD_SQL_CASE = ("CAST(CASE digit " + " ".join(
    f"WHEN {d} THEN {p!r}" for d, p in _BENFORD_P.items())
    + " END AS DOUBLE)")


@query(
    "dq_benford_digits",
    oracle=f"""
        WITH d AS (
            SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT)
                                    AS VARCHAR), 1, 1) AS INTEGER) AS digit
            FROM orders),
        c AS (SELECT digit, COUNT(*) AS observed FROM d GROUP BY digit),
        n AS (SELECT CAST(SUM(observed) AS BIGINT) AS n FROM c)
        SELECT digit, observed,
               n * {_BENFORD_SQL_CASE} AS expected,
               (observed - n * {_BENFORD_SQL_CASE})
               * (observed - n * {_BENFORD_SQL_CASE})
               / (n * {_BENFORD_SQL_CASE}) AS chi2_contrib
        FROM c, n
    """,
    category="extension: Benford digit audit",
    doc="Benford first-significant-digit audit over order totals — the "
        "classic fabricated-data / ingestion-corruption screen (Benford "
        "1938; Nigrini 2012). Digit = first character of the floored "
        "integer value (floor BEFORE the bigint cast: DuckDB's "
        "double->bigint cast rounds while Spark's truncates — floor "
        "makes both exact). Expected shares log10(1+1/d) are injected "
        "as the same Python-repr'd doubles into both engines, and the "
        "chi-squared contribution is emitted PER DIGIT rather than "
        "globally summed, so no cross-row float accumulation exists "
        "anywhere. Scale: one partial-agg shuffle on 9 digit keys plus "
        "a scalar total — the two-phase counting shape at any size. "
        "(Uniform TPC-H prices are far from Benford — the audit's "
        "point is the deviation report, not conformance.)",
)
def dq_benford_digits(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    digit = (F.substring(F.floor("o_totalprice").cast("string"), 1, 1)
             .cast("int").alias("digit"))
    c = o.select(digit).groupBy("digit").agg(F.count("*").alias("observed"))
    # grand total over the 9-row digit frame via a window — a second
    # aggregation branch would re-execute the scan (plan fan-out)
    n = F.sum("observed").over(Window.partitionBy())
    p = F.col("digit")
    case = F.when(p == 1, _BENFORD_P[1])
    for d in range(2, 10):
        case = case.when(p == d, _BENFORD_P[d])
    exp = n * case
    return c.select("digit", "observed",
                    exp.alias("expected"),
                    ((F.col("observed") - exp) * (F.col("observed") - exp)
                     / exp).alias("chi2_contrib"))


# ---------------------------------------------------------------------------
# maintenance_compaction_bins
# ---------------------------------------------------------------------------

COMPACT_TARGET = 32_000       # target bytes per compacted output file


@query(
    "maintenance_compaction_bins",
    oracle=f"""
        WITH f AS (
            SELECT source, doc_id, n_chars,
                   CAST(COALESCE(SUM(n_chars) OVER (
                        PARTITION BY source ORDER BY doc_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                        0) AS BIGINT) AS cum0
            FROM documents)
        SELECT source,
               CAST(floor(CAST(cum0 AS DOUBLE) / {COMPACT_TARGET}.0)
                    AS BIGINT) AS bin_id,
               COUNT(*) AS n_files,
               CAST(SUM(n_chars) AS BIGINT) AS bin_bytes,
               CAST(SUM(n_chars) AS BIGINT) < {COMPACT_TARGET // 2}
                   AS undersized
        FROM f
        GROUP BY source, CAST(floor(CAST(cum0 AS DOUBLE)
                                    / {COMPACT_TARGET}.0) AS BIGINT)
    """,
    category="extension: table maintenance (compaction planning)",
    doc="Small-file compaction planner — the manifest pass behind "
        "OPTIMIZE/rewriteDataFiles in Delta/Iceberg: files (documents "
        "stand in as the manifest, n_chars as bytes) are packed "
        "sequentially per table partition (source) into target-sized "
        "output bins via an exclusive running-size cursor, bin_id = "
        "floor(bytes_before / target). The trailing bin of a partition "
        "flags undersized (< target/2) = the remainder file a next compaction "
        "round would pick up again. Entirely integer except the one "
        "exact floor-division (int < 2^52 through double). Scale: the "
        "cumulative cursor is windowed PER PARTITION — exactly how a "
        "real compaction planner shards (a manifest scan per partition, "
        "never a global order); each partition's manifest is file "
        "COUNT-sized, not data-sized.",
)
def maintenance_compaction_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    w = (Window.partitionBy("source").orderBy("doc_id")
         .rowsBetween(Window.unboundedPreceding, -1))
    f = docs.select(
        "source", "doc_id", "n_chars",
        F.coalesce(F.sum("n_chars").over(w), F.lit(0)).alias("cum0"))
    bin_id = F.floor(F.col("cum0").cast("double")
                     / F.lit(float(COMPACT_TARGET)))
    return (f.groupBy("source", bin_id.alias("bin_id"))
            .agg(F.count("*").alias("n_files"),
                 F.sum("n_chars").alias("bin_bytes"))
            .select("source", "bin_id", "n_files", "bin_bytes",
                    (F.col("bin_bytes") < F.lit(COMPACT_TARGET // 2))
                    .alias("undersized")))


# ---------------------------------------------------------------------------
# ivm_incremental_agg
# ---------------------------------------------------------------------------


@query(
    "ivm_incremental_agg",
    oracle=f"""
        SELECT user_id, COUNT(*) AS n_events,
               {sql_sum('value', 10000)} AS total_value
        FROM events GROUP BY user_id
    """,
    category="extension: incremental view maintenance",
    doc="Incremental refresh of a per-user aggregate view: the engine "
        "side computes the view INCREMENTALLY — a 'stored' state branch "
        "(all days before the last) merged with a delta branch (the "
        "last day only) via one co-partitioned full-outer join of "
        "partial aggregates — while the oracle recomputes from scratch; "
        "equality PROVES the merge law. That proof only exists because "
        "partials are fixed-point int64: float partials would drift "
        "from the full recompute by summation order, which is exactly "
        "why lakehouse IVM (Delta incremental MVs, Flink retract "
        "streams) keeps additive state exact. The final division by "
        "the scale happens once, after the merge. Scale: in production "
        "the state branch is a materialized table (zero scan) and the "
        "delta scan partition-prunes to one day; the merge shuffles "
        "only the DELTA's user set against state (here both derive "
        "from the fixture for verifiability). The horizon scalar "
        "broadcasts.",
)
def ivm_incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    horizon = ev.agg(F.date_trunc("day", F.max("ts")).alias("max_day"))
    tagged = ev.crossJoin(F.broadcast(horizon))
    state = (tagged.filter(F.date_trunc("day", F.col("ts"))
                           < F.col("max_day"))
             .groupBy("user_id")
             .agg(F.count("*").alias("cnt_s"),
                  F.sum(units_col("value", 10000)).alias("su_s")))
    delta = (tagged.filter(F.date_trunc("day", F.col("ts"))
                           >= F.col("max_day"))
             .groupBy("user_id")
             .agg(F.count("*").alias("cnt_d"),
                  F.sum(units_col("value", 10000)).alias("su_d")))
    merged = state.join(delta, "user_id", "full_outer")
    return merged.select(
        "user_id",
        (F.coalesce(F.col("cnt_s"), F.lit(0))
         + F.coalesce(F.col("cnt_d"), F.lit(0))).alias("n_events"),
        ((F.coalesce(F.col("su_s"), F.lit(0))
          + F.coalesce(F.col("su_d"), F.lit(0)))
         / F.lit(10000.0)).alias("total_value"))


# ---------------------------------------------------------------------------
# privacy_dp_counts — Laplace mechanism with a deterministic hash PRNG
# ---------------------------------------------------------------------------

DP_EPSILON = 1.0          # privacy budget (sensitivity 1 for counts)
DP_MOD = 2 ** 20          # hash->uniform modulus


_DP_RAW = ("(-(1.0 / " + repr(DP_EPSILON) + ") "
           "* (CASE WHEN uni - 0.5 >= 0 THEN 1.0 ELSE -1.0 END) "
           "* ln(1.0 - 2.0 * ABS(uni - 0.5)))")
# ln() is not correctly-rounded and differs by 1 ulp between the JVM and
# libm, so the released noise is ROUNDED to 1e-9 units in-query on both
# sides (the source_entropy_diversity pattern for transcendental terms)
_DP_NOISE_U = sql_units(_DP_RAW, 10 ** 9)


@query(
    "privacy_dp_counts",
    oracle=f"""
        WITH c AS (
            SELECT event_type, CAST(COUNT(*) AS BIGINT) AS true_count
            FROM events GROUP BY event_type),
        u AS (
            SELECT event_type, true_count,
                   (({_sql_word_code("event_type")}
                     % {DP_MOD}) + 0.5) / {DP_MOD} AS uni
            FROM c)
        SELECT event_type, true_count, uni,
               (uni - 0.5) AS t,
               {_DP_NOISE_U} / CAST(1000000000 AS DOUBLE)
                   AS laplace_noise,
               true_count
                   + {_DP_NOISE_U} / CAST(1000000000 AS DOUBLE)
                   AS noisy_count
        FROM u
    """,
    category="extension: privacy (differential-privacy Laplace counts)",
    doc="Laplace-mechanism noisy per-type counts (sensitivity-1 "
        "histogram release at epsilon=1): noise = -b*sign(t)*ln(1-2|t|) "
        "is the exact inverse-CDF Laplace draw, with the uniform t "
        "coming from a DETERMINISTIC poly-31 hash of the group key "
        "((code mod 2^20)+0.5)/2^20, never 0 or 1) so both engines "
        "release the identical value and the test suite can pin it — "
        "swap the hash for a real PRNG seed per release in production "
        "(and drop true_count/uni, kept here so the oracle can verify "
        "the mechanism end-to-end). The noise expression is the same "
        "IEEE sequence on both engines. Scale: one partial-agg shuffle "
        "to the per-type frame; the noise is map-side arithmetic on "
        "that bounded frame.",
)
def privacy_dp_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flinkapps_spark.functions.text import word_code

    c = (load_table(spark, sf_dir, "events")
         .groupBy("event_type").agg(F.count("*").alias("true_count")))
    uni = ((word_code(F.col("event_type")) % DP_MOD) + 0.5) / DP_MOD
    t = uni - F.lit(0.5)
    sign = F.when(t >= 0, F.lit(1.0)).otherwise(F.lit(-1.0))
    raw = (F.lit(-(1.0 / DP_EPSILON)) * sign
           * F.log(F.lit(1.0) - F.lit(2.0) * F.abs(t)))
    noise = units_col(raw, 10 ** 9) / F.lit(10 ** 9).cast("double")
    return c.select(
        "event_type", "true_count", uni.alias("uni"), t.alias("t"),
        noise.alias("laplace_noise"),
        (F.col("true_count") + noise).alias("noisy_count"))


# ---------------------------------------------------------------------------
# events_lateness_profile — out-of-orderness audit for watermark sizing
# ---------------------------------------------------------------------------

LATE_BUCKET = 65_536            # arrival-order (event_id) prefix buckets
LATE_THRESH_US = 300_000_000    # 5 minutes


@query(
    "events_lateness_profile",
    oracle=f"""
        WITH a AS (
            SELECT event_type, event_id, epoch_us(ts) AS us,
                   MAX(epoch_us(ts)) OVER (ORDER BY event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                       AS hwm
            FROM events),
        l AS (
            SELECT event_type,
                   GREATEST(COALESCE(hwm - us, 0), 0) AS late_us
            FROM a)
        SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(SUM(CASE WHEN late_us > 0 THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_late,
               CAST(MAX(late_us) AS BIGINT) AS max_late_us,
               CAST(SUM(late_us) AS BIGINT) / CAST(COUNT(*) AS DOUBLE)
                   AS mean_late_us,
               CAST(SUM(CASE WHEN late_us > {LATE_THRESH_US}
                             THEN 1 ELSE 0 END) AS BIGINT)
                   / CAST(COUNT(*) AS DOUBLE) AS frac_over_5min
        FROM l GROUP BY event_type
    """,
    category="extension: streaming ops (out-of-orderness / lateness audit)",
    doc="Watermark-sizing audit: treating event_id as the arrival "
        "order, each event's lateness is the event-time high-water mark "
        "of everything that arrived STRICTLY before it minus its own "
        "event time — the empirical out-of-orderness distribution that "
        "decides withWatermark's delay (per type: late fraction, "
        "max/mean lateness in exact integer microseconds, and the "
        "fraction that a 5-minute watermark would drop). Scale: the "
        "global prefix-MAX is the shared TWO-PHASE scan via "
        "bucket_offsets' max mode — 65k-id arrival buckets, bounded "
        "offset frame, wide window partitioned by bucket — never a "
        "single-partition pass over the corpus; the final aggregation "
        "is partial on event_type. All lateness arithmetic is int64 "
        "epoch-us (epoch_us/unix_micros, the SCALE.md time policy).",
)
def events_lateness_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark import StorageLevel

    from flinkapps_spark.operators.prefix import bucket_offsets

    ev = load_table(spark, sf_dir, "events").select(
        "event_type", "event_id", F.unix_micros("ts").alias("us"),
        F.floor(F.col("event_id") / LATE_BUCKET).alias("bkt"))
    # cache only the BOUNDED per-bucket max frame (bucket_offsets'
    # broadcast stage would otherwise rescan events); the row-level
    # probe side re-reads parquet once, which is cheaper than writing a
    # corpus-sized cache
    per_bkt = (ev.groupBy("bkt").agg(F.max("us").alias("mx"))
               .persist(StorageLevel.MEMORY_AND_DISK))
    per_bkt.count()
    offs = bucket_offsets(per_bkt, "bkt", {}, maxes={"us": "mx"})
    w_in = (Window.partitionBy("bkt").orderBy("event_id")
            .rowsBetween(Window.unboundedPreceding, -1))
    # greatest() skips NULLs on both engines: first bucket has off_us
    # NULL, first row in a bucket has a NULL frame max
    hwm = F.greatest(F.col("off_us"), F.max("us").over(w_in))
    late = F.greatest(F.coalesce(hwm - F.col("us"), F.lit(0)), F.lit(0))
    l = (ev.join(F.broadcast(offs.select("bkt", "off_us")), "bkt")
         .select("event_type", late.alias("late_us")))
    return (l.groupBy("event_type")
            .agg(F.count("*").alias("n_events"),
                 F.sum(F.when(F.col("late_us") > 0, 1).otherwise(0))
                 .alias("n_late"),
                 F.max("late_us").alias("max_late_us"),
                 (F.sum("late_us")
                  / F.count("*").cast("double")).alias("mean_late_us"),
                 (F.sum(F.when(F.col("late_us") > LATE_THRESH_US, 1)
                        .otherwise(0))
                  / F.count("*").cast("double")).alias("frac_over_5min")))


# ---------------------------------------------------------------------------
# dq_freshness — per-type staleness against the corpus high-water mark
# ---------------------------------------------------------------------------

FRESH_SLA_US = 6 * 3600 * 1_000_000     # 6-hour freshness SLA


@query(
    "dq_freshness",
    oracle=f"""
        WITH t AS (
            SELECT event_type,
                   CAST(COUNT(*) AS BIGINT) AS n_events,
                   CAST(MAX(epoch_us(ts)) AS BIGINT) AS last_us
            FROM events GROUP BY event_type),
        hwm AS (SELECT CAST(MAX(last_us) AS BIGINT) AS corpus_us FROM t)
        SELECT event_type, n_events, last_us,
               corpus_us - last_us AS staleness_us,
               (corpus_us - last_us) > {FRESH_SLA_US} AS sla_breach
        FROM t, hwm
    """,
    category="extension: data quality (freshness / staleness audit)",
    doc="Pipeline-freshness audit: each event type's last event time "
        "against the corpus high-water mark, with a 6-hour SLA flag — "
        "the 'did a producer stop?' check that pages before dashboards "
        "silently flatline (the batch complement of "
        "events_lateness_profile, which audits ordering rather than "
        "liveness). Exact int64 epoch-us arithmetic. Scale: one "
        "partial-agg shuffle to the per-type frame; the high-water mark "
        "rides a broadcast over that bounded frame.",
)
def dq_freshness(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = (load_table(spark, sf_dir, "events")
         .groupBy("event_type")
         .agg(F.count("*").alias("n_events"),
              F.max(F.unix_micros("ts")).alias("last_us")))
    hwm = t.agg(F.max("last_us").alias("corpus_us"))
    return (t.crossJoin(F.broadcast(hwm))
            .select("event_type", "n_events", "last_us",
                    (F.col("corpus_us") - F.col("last_us"))
                    .alias("staleness_us"),
                    ((F.col("corpus_us") - F.col("last_us"))
                     > FRESH_SLA_US).alias("sla_breach")))
