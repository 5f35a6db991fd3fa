"""Unit tests for the engine layers that aren't (or can't be) covered by
DuckDB oracle parity: sinks (rolling files, upsert), config surface, job
parity pipelines with the reference's canonical fixtures, LSH recall,
multimodal stubs, week-year semantics.
"""

from __future__ import annotations

import glob
import os

import duckdb
import pytest
from pyspark.sql import functions as F

from flinkapps_spark.config import EngineConfig, UsageError
from flinkapps_spark.jobs import (
    flink_starter, flink_stream_processing, flink_stream_table,
    flink_table_manipulation,
)
from flinkapps_spark.operators.similarity import knn_bruteforce, knn_lsh
from flinkapps_spark.schemas import NAME_SCORE
from flinkapps_spark.sinks.files import write_rolling_text
from flinkapps_spark.sinks.jdbc import upsert_batch, upsert_sql
from flinkapps_spark.sources.batch import load_table
from tests.conftest import SF_SMOKE

# --- reference golden fixtures (FIXTURES.md F1/F4) -------------------------

DAILY_PRICES_CSV = [
    "NYSE,ABB,2010-03-12,21.5,22.1,21.0,21.9,1200345,21.9",
    "NYSE,IBM,2011-07-01,130.0,50.0,12.0,131.5,900000,131.5",
    "NASDAQ,MSFT,2010-01-04,30.0,31.0,29.5,30.5,50000000,30.5",
    "NYSE,CAT,2009-05-20,60.0,61.0,59.0,60.5,750000,60.5",
]


def test_flagship_job_golden(spark):
    """flinkStreamProcessing parity: symbol-IN filter keeps ABB/IBM/CAT
    rows only; output is the reference's CSV alert line shape
    (reference source/flinkStreamProcessing.scala:129-134)."""
    lines = spark.createDataFrame([(s,) for s in DAILY_PRICES_CSV],
                                  "value string")
    out = flink_stream_processing(lines, EngineConfig()).collect()
    assert len(out) == 3  # MSFT filtered out
    fields = out[0]["value"].split(",")
    assert len(fields) == 12  # epoch + topic + 9 fields + spread
    assert fields[1] == EngineConfig().topic_sink


def test_stream_table_golden(spark):
    """flinkStreamTable canonical rows: (Alice,12),(Bob,10),(Alice,100) →
    {Alice: 112, Bob: 10} (reference source/flinkStreamTable.scala:61-73,
    FIXTURES.md F4)."""
    rows = spark.createDataFrame(
        [("Alice", 12), ("Bob", 10), ("Alice", 100)], NAME_SCORE)
    got = {r["name"]: r["score_sum"]
           for r in flink_stream_table(rows).collect()}
    assert got == {"Alice": 112, "Bob": 10}


def test_table_manipulation_golden(spark):
    """min/max by (symbol, year) over the golden CSV (reference
    source/flinkTableManipulation.scala:115)."""
    lines = spark.createDataFrame([(s,) for s in DAILY_PRICES_CSV],
                                  "value string")
    out = {(r["symbol"], r["yearr"]): (r["min_high"], r["max_high"])
           for r in flink_table_manipulation(lines).collect()}
    assert out[("ABB", 2010)] == (pytest.approx(22.1), pytest.approx(22.1))
    assert ("MSFT", 2010) in out


def test_word_count_golden(spark):
    lines = spark.createDataFrame(
        [("Hello, world! hello",), ("WORLD again",)], "value string")
    got = {r["word"]: r["cnt"] for r in flink_starter(lines).collect()}
    assert got == {"hello": 2, "world": 2, "again": 1}


# --- config surface (§2.9) -------------------------------------------------


def test_properties_roundtrip(tmp_path):
    p = tmp_path / "app.properties"
    p.write_text("# comment\nBOOTSTRAP_SERVERS=broker:9092\n"
                 "LOC_KFKA_SRC=src-topic\nSYMB=IBM\nHIGH=75.5\nBET_FROM=2005\n")
    cfg = EngineConfig.from_properties(str(p))
    assert cfg.bootstrap_servers == "broker:9092"
    assert cfg.topic_source == "src-topic"
    assert cfg.symb == "IBM"
    assert cfg.high == 75.5
    assert cfg.bet_from == 2005


def test_cli_args_and_usage_failfast():
    cfg = EngineConfig.from_args(
        ["--topic_source", "a", "--topic_sink", "b", "--groupId", "g",
         "--symb", "CAT", "--high", "100"],
        required=("topic_source", "topic_sink", "group_id", "symb"))
    assert cfg.symb == "CAT" and cfg.high == 100.0
    with pytest.raises(UsageError):
        EngineConfig.from_args(["--symb", "CAT"],
                               required=("topic_source",))


# --- sinks -----------------------------------------------------------------


def test_rolling_file_sink(spark, tmp_path):
    """K3 emulation: hourly bucket folders + part files (reference
    source/flinkContinuousProcessingRollover.scala:165-194)."""
    ev = load_table(spark, SF_SMOKE, "events").limit(500)
    out = str(tmp_path / "rolled")
    write_rolling_text(ev.select("event_id", "event_type", "ts"), out,
                       ts_col="ts", max_records_per_file=100)
    buckets = [d for d in os.listdir(out) if d.startswith("date_hour=")]
    assert buckets, "expected yyyy-MM-dd--HH bucket folders"
    assert "--" in buckets[0]
    files = glob.glob(os.path.join(out, "date_hour=*", "*.csv"))
    assert files


def test_upsert_accumulate_duckdb(spark):
    """K7: atomic accumulate upsert is parallel-safe and matches the
    reference's read-modify-write semantics (reference
    source/flinkBatchJDBCSink.scala:98-127, SURVEY §7.5.6)."""
    con = duckdb.connect(":memory:")
    con.execute("CREATE TABLE t_temp (sensor_id VARCHAR PRIMARY KEY, "
                "sensor_temp DOUBLE)")

    def factory(c=con):
        class NoClose:
            def executemany(self, *a):
                return c.executemany(*a)
            def commit(self):
                pass
            def close(self):
                pass
        return NoClose()

    batch1 = spark.createDataFrame(
        [("s1", 10.0), ("s1", 5.0), ("s2", 1.0)],
        "sensor_id string, sensor_temp double")
    upsert_batch(batch1, connection_factory=factory, table="t_temp",
                 key_cols=["sensor_id"], val_cols=["sensor_temp"],
                 accumulate=True, driver_collect=True)
    batch2 = spark.createDataFrame(
        [("s1", 2.0), ("s3", 7.0)], "sensor_id string, sensor_temp double")
    upsert_batch(batch2, connection_factory=factory, table="t_temp",
                 key_cols=["sensor_id"], val_cols=["sensor_temp"],
                 accumulate=True, driver_collect=True)
    got = dict(con.execute(
        "SELECT sensor_id, sensor_temp FROM t_temp").fetchall())
    assert got == {"s1": 17.0, "s2": 1.0, "s3": 7.0}
    con.close()


def test_upsert_foreachpartition_executor_side(spark, tmp_path):
    """K7 default path: the upsert runs via foreachPartition with a
    per-executor connection — no driver collect.  sqlite3 is the stand-in
    DB because its connections can be opened inside worker processes
    (a file path pickles; a live handle doesn't)."""
    import sqlite3

    db = str(tmp_path / "upsert.db")
    init = sqlite3.connect(db)
    init.execute("CREATE TABLE t_temp (sensor_id TEXT PRIMARY KEY, "
                 "sensor_temp REAL)")
    init.commit()
    init.close()

    def factory(path=db):
        c = sqlite3.connect(path, timeout=30.0)
        c.execute("PRAGMA busy_timeout=30000")
        return c

    rows = [(f"s{i % 7}", float(i)) for i in range(200)]
    batch = spark.createDataFrame(
        rows, "sensor_id string, sensor_temp double").repartition(8)
    upsert_batch(batch, connection_factory=factory, table="t_temp",
                 key_cols=["sensor_id"], val_cols=["sensor_temp"],
                 accumulate=True, batch_size=3)
    chk = sqlite3.connect(db)
    got = dict(chk.execute(
        "SELECT sensor_id, sensor_temp FROM t_temp").fetchall())
    chk.close()
    expect: dict[str, float] = {}
    for k, v in rows:
        expect[k] = expect.get(k, 0.0) + v
    assert got == expect


def test_upsert_sql_shapes():
    acc = upsert_sql("t", ["k"], ["v"], accumulate=True)
    assert "ON CONFLICT (k) DO UPDATE" in acc and "t.v + excluded.v" in acc
    lww = upsert_sql("t", ["k"], ["v"], accumulate=False)
    assert "v = excluded.v" in lww


# --- similarity: LSH recall vs brute force ---------------------------------


def test_lsh_recall(spark):
    emb = load_table(spark, SF_SMOKE, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    brute = knn_bruteforce(emb, queries, k=5).collect()
    # band-OR multi-code index with the corpus-sized (r, L) law — recall
    # against brute force should be near-total even on this isotropic
    # fixture (measured 0.98-1.0 across fixtures; gate at 0.9)
    lsh = knn_lsh(emb, queries, k=5).collect()
    brute_pairs = {(r["query_id"], r["vec_id"]) for r in brute}
    lsh_pairs = {(r["query_id"], r["vec_id"]) for r in lsh}
    assert lsh_pairs, "LSH returned nothing (bucketing broken)"
    recall = len(brute_pairs & lsh_pairs) / len(brute_pairs)
    assert recall >= 0.9


def test_knn_lsh_params_law():
    from flinkapps_spark.operators.similarity import (
        knn_lsh_expected_frac, knn_lsh_params)
    # r grows with log2(n); L solves the target-recall equation
    r5, l5 = knn_lsh_params(500)
    r20k, l20k = knn_lsh_params(20_000)
    assert r5 == 8 and r20k == 13
    assert l20k > l5 >= 1
    # the expected random-candidate fraction FALLS as n grows (ρ law):
    # that monotone decrease is what the catalog gate's budget tracks
    assert knn_lsh_expected_frac(l20k, r20k) < knn_lsh_expected_frac(l5, r5)
    # clipped at both ends
    assert knn_lsh_params(4)[0] == 6 and knn_lsh_params(10**9)[0] == 18


# --- multimodal stubs ------------------------------------------------------


def test_multimodal_stubs_raise(spark):
    from flinkapps_spark.operators import multimodal
    docs = load_table(spark, SF_SMOKE, "documents").limit(1)
    with pytest.raises(NotImplementedError):
        multimodal.decode_image(docs)


def test_sample_frames_exact(spark):
    """Frame sampler on a known payload: 150 'a' bytes → frames of 64 at
    stride 4 keep only frame 0 (frames are 0,1,2; stride 4 → idx 0)."""
    from flinkapps_spark.operators import multimodal
    df = spark.createDataFrame([(1, "a" * 150)], "doc_id long, text string")
    out = multimodal.sample_frames(
        multimodal.attach_binary_payload(df)).collect()
    assert [(r.doc_id, r.frame_idx, r.frame_bytes, r.frame_sum)
            for r in out] == [(1, 0, 64, 64 * 97)]
    # stride 1 keeps all 3 frames incl. the 22-byte tail
    out_all = multimodal.sample_frames(
        multimodal.attach_binary_payload(df), every_n=1).collect()
    assert [(r.frame_idx, r.frame_bytes) for r in out_all] == [
        (0, 64), (1, 64), (2, 22)]


# --- week-year quirk (SURVEY §7.5.2) ---------------------------------------


def test_weekyear_quirk(spark):
    from flinkapps_spark.functions.dates import extract_weekyear, extract_year
    df = spark.createDataFrame([("2010-12-31",), ("2011-01-01",),
                                ("2010-06-15",)], "d string") \
        .select(F.to_date("d").alias("d"))
    rows = df.select(extract_year(F.col("d")).alias("cal"),
                     extract_weekyear(F.col("d")).alias("wk")).collect()
    assert [(r["cal"], r["wk"]) for r in rows] == [
        (2010, 2011),  # SimpleDateFormat "YYYY" week-year bug reproduced
        (2011, 2011),
        (2010, 2010),
    ]


# --- SQL surface: verbatim dotted-name query (§2.7-2) ----------------------


def test_sql_dotted_database_verbatim(spark, tmp_path):
    """The reference registers its view under a dotted name and queries it
    verbatim (reference source/flinkTableManipulation.scala:113-115); Spark
    needs a real database for that — create one, run the exact SQL string.
    """
    spark.sql(f"CREATE DATABASE IF NOT EXISTS flinkappdb "
              f"LOCATION '{tmp_path}/flinkappdb'")
    try:
        lines = spark.createDataFrame([(s,) for s in DAILY_PRICES_CSV],
                                      "value string")
        from flinkapps_spark.jobs import parse_daily_prices
        parse_daily_prices(lines).write.mode("overwrite") \
            .saveAsTable("flinkappdb.t_flnk_daily_prices")
        out = spark.sql(
            "SELECT symbol, YEAR(CAST(trdate AS DATE)) AS yearr, "
            "min(high) as MIN_HIGH, max(high) AS MAX_HIGH "
            "FROM flinkappdb.t_flnk_daily_prices "
            "GROUP BY symbol, YEAR(CAST(trdate AS DATE))").collect()
        got = {(r["symbol"], r["yearr"]) for r in out}
        assert ("ABB", 2010) in got and ("IBM", 2011) in got
    finally:
        spark.sql("DROP DATABASE IF EXISTS flinkappdb CASCADE")


# --- UDF registration hook (§2.8) ------------------------------------------


def test_register_function_udf(spark):
    """The engine's ScalarFunction-registration parity: a Python UDF
    registered by name and callable from SQL (reference
    source/flinkTableManipulation.scala:219-222, 255-266)."""
    from pyspark.sql import types as T
    from flinkapps_spark.functions.text import register_function

    register_function(
        spark, "norm_addr",
        lambda s: " ".join(s.upper().replace(".", " ").split()),
        T.StringType())
    spark.createDataFrame([("12 main st.",)], "street string") \
        .createOrReplaceTempView("udf_in")
    out = spark.sql("SELECT norm_addr(street) AS n FROM udf_in").collect()
    assert out[0]["n"] == "12 MAIN ST"


# --- remaining job parity pipelines ----------------------------------------


def test_streaming_input_job(spark):
    from flinkapps_spark.jobs import flink_streaming_input
    lines = spark.createDataFrame([(s,) for s in DAILY_PRICES_CSV],
                                  "value string")
    cfg = EngineConfig()
    cfg.symb = "IBM"
    out = flink_streaming_input(lines, cfg).collect()
    assert len(out) == 1 and out[0]["symbol"] == "IBM"


def test_rollover_job_compound_filter(spark):
    """flinkContinuousProcessingRollover: precedence-faithful compound
    filter — ABB/IBM rows pass unconditionally (the A||B arms), CAT only
    with high==cfg.high, others only via the low/date-range arm."""
    from flinkapps_spark.jobs import flink_continuous_processing_rollover
    lines = spark.createDataFrame([(s,) for s in DAILY_PRICES_CSV],
                                  "value string")
    out = flink_continuous_processing_rollover(lines, EngineConfig()).collect()
    got = {r["value"].split(",")[3] for r in out}  # symbol field
    assert "ABB" in got and "IBM" in got
    assert "MSFT" not in got  # fails every arm
    assert "CAT" not in got   # high=61.0 != cfg.high=50.0


def test_jdbc_job_wrappers(spark):
    from flinkapps_spark.jobs import flink_table_jdbc, flink_batch_jdbc_sink
    lines = spark.createDataFrame(
        [("sensor_1, 1651400400, 53.2",), ("sensor_1, 1651400500, 1.8",)],
        "value string")
    captured = []
    flink_table_jdbc(lines, lambda df: captured.append(df.collect()))
    assert len(captured[0]) == 2
    assert captured[0][0]["sensorId"] == "sensor_1"  # trim applied
    flink_batch_jdbc_sink(lines, lambda df: captured.append(df.collect()))
    assert len(captured) == 2


def test_arrow_word_codes_match_jvm(spark):
    """The Arrow-vectorized shingle path (tokenize → poly-31 → 3-gram →
    first-occurrence distinct, all in one numpy pass) must be bit-identical
    — values AND array order — to the Column-expression fold on real
    fixture text."""
    from flinkapps_spark.operators.dedup import shingled_docs
    docs = load_table(spark, SF_SMOKE, "documents").limit(100)
    a = {r["doc"]: r["codes"]
         for r in shingled_docs(docs, use_arrow=True).collect()}
    j = {r["doc"]: r["codes"]
         for r in shingled_docs(docs, use_arrow=False).collect()}
    assert a == j


def test_arrow_span_codes_match_jvm(spark):
    """The Arrow rolling span-code path (repeated_spans' input) must be
    bit-identical to the JVM zip_with fold — all spans, occurrence order
    preserved, sub-width docs empty."""
    import pyspark.sql.functions as SF

    from flinkapps_spark.functions.text import tokenize, word_code
    from flinkapps_spark.operators.dedup import (
        SPAN_SIZE, _span_codes_arrow, span_codes_of,
    )
    docs = load_table(spark, SF_SMOKE, "documents").limit(100)
    a = {r["doc_id"]: r["spans"] for r in docs.select(
        "doc_id", _span_codes_arrow(SPAN_SIZE)(SF.col("text"))
        .alias("spans")).collect()}
    wc = SF.transform(tokenize(SF.col("text")), lambda w: word_code(w))
    j = {r["doc_id"]: r["spans"] for r in docs.select(
        "doc_id", span_codes_of(wc, SPAN_SIZE).alias("spans")).collect()}
    assert a == j
    assert any(len(v) > 0 for v in j.values())


def test_arrow_minhash_sig_matches_jvm(spark):
    """The Arrow MinHash signature (16 affine permutations + reduceat
    minima in one numpy pass) must be bit-identical to the JVM
    transform+array_min form over the same shingle-code sets."""
    import pyspark.sql.functions as SF

    from flinkapps_spark.operators.dedup import (
        _minhash_sig_arrow, minhash_signature, shingled_docs,
    )
    docs = load_table(spark, SF_SMOKE, "documents").limit(100)
    base = shingled_docs(docs).persist()
    a = {r["doc"]: r["sig"] for r in base.select(
        "doc", _minhash_sig_arrow()(SF.col("codes")).alias("sig"))
        .collect()}
    j = {r["doc"]: r["sig"] for r in base.select(
        "doc", minhash_signature(SF.col("codes")).alias("sig")).collect()}
    base.unpersist()
    assert len(a) > 0 and a == j


def test_neardup_blocking_lossless(spark):
    """Grid-blocked near-dup pairs EQUAL the exhaustive all-pairs result
    on the augmented fixture (the losslessness proof, checked empirically).
    This pin matters doubly since the sf1 scaling pass: the DuckDB oracle
    now reuses the same blocking math (plans/pipeline_queries.py
    _sql_blocked_pair_ctes), so the independent all-pairs cross-check
    lives HERE, against similarity.embedding_neardup_pairs(exhaustive=True)."""
    from flinkapps_spark.operators.similarity import embedding_neardup_pairs
    from flinkapps_spark.plans.pipeline_queries import _aug_embeddings
    aug = _aug_embeddings(spark, SF_SMOKE)
    blocked = {(r["id_a"], r["id_b"]): r["cosine"]
               for r in embedding_neardup_pairs(aug, 0.99).collect()}
    allpairs = {(r["id_a"], r["id_b"]): r["cosine"]
                for r in embedding_neardup_pairs(
                    aug, 0.99, exhaustive=True).collect()}
    assert blocked == allpairs
    assert len(blocked) > 0  # augmentation plants one pair per vector


def test_neardup_lsh_subset_and_recall(spark):
    """LSH-banded near-dup pairs are a SUBSET of the exhaustive all-pairs
    result (every candidate passes the exact cosine verify, so no false
    positives are possible) with recall ≈ 1 on the fixture — the
    augmented pairs sit at cosine ≈ 0.9987, where the 12×16 banding's
    theoretical miss probability is ~2e-8. Verified cosines must be
    bit-identical to the exhaustive path's (same verify expression)."""
    from flinkapps_spark.operators.similarity import (
        embedding_neardup_pairs, embedding_neardup_pairs_lsh)
    from flinkapps_spark.plans.pipeline_queries import _aug_embeddings
    aug = _aug_embeddings(spark, SF_SMOKE)
    lsh = {(r["id_a"], r["id_b"]): r["cosine"]
           for r in embedding_neardup_pairs_lsh(aug, 0.99).collect()}
    allpairs = {(r["id_a"], r["id_b"]): r["cosine"]
                for r in embedding_neardup_pairs(
                    aug, 0.99, exhaustive=True).collect()}
    assert set(lsh) <= set(allpairs)
    assert all(lsh[k] == allpairs[k] for k in lsh)
    assert len(allpairs) > 0
    assert len(lsh) / len(allpairs) >= 0.99


def test_neardup_lsh_bits_knob(spark):
    """The subquadratic knob works at other (bands, bits) settings: the
    plane generator and signature packing are parametric, and a finer
    code (20 bits — what a 10x-bigger corpus would use to hold
    candidates-per-vector constant) still finds every fixture pair
    (theoretical miss at cos .9987 with 24x20: ~1e-5)."""
    from flinkapps_spark.operators.similarity import (
        embedding_neardup_pairs, embedding_neardup_pairs_lsh)
    from flinkapps_spark.plans.pipeline_queries import _aug_embeddings
    aug = _aug_embeddings(spark, SF_SMOKE)
    fine = {(r["id_a"], r["id_b"])
            for r in embedding_neardup_pairs_lsh(
                aug, 0.99, n_bands=24, band_bits=20).collect()}
    allpairs = {(r["id_a"], r["id_b"])
                for r in embedding_neardup_pairs(
                    aug, 0.99, exhaustive=True).collect()}
    assert fine <= allpairs
    assert len(fine) / len(allpairs) >= 0.99


def test_ivf_recall(spark):
    from flinkapps_spark.operators.similarity import knn_bruteforce, knn_ivf
    emb = load_table(spark, SF_SMOKE, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    brute = {(r["query_id"], r["vec_id"])
             for r in knn_bruteforce(emb, queries, k=5).collect()}
    ivf = {(r["query_id"], r["vec_id"])
           for r in knn_ivf(emb, queries, k=5, n_probe=3).collect()}
    recall = len(brute & ivf) / len(brute)
    assert recall >= 0.3, f"IVF recall too low: {recall}"


def test_ivfpq_adc(spark):
    """IVFADC: the ADC shortlist must recover the exact-within-probe
    top-k (PQ-noise isolation — same centroids/probes so IVF loss
    cancels), end-to-end recall must clear the catalog floor, and the
    encoded index must be (cell, m codes, norm) — never the vectors."""
    from flinkapps_spark.operators import similarity as S
    emb = load_table(spark, SF_SMOKE, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    centers = S.train_coarse_centroids(emb)
    books = S.train_residual_books(emb, centers)
    enc = S.ivfpq_encode(emb, centers, books)
    row = enc.first()
    assert set(enc.columns) == {"vec_id", "cell", "vnorm", "codes"}
    assert len(row["codes"]) == 8
    assert all(0 <= c < 256 for c in row["codes"])
    short = S.ivfpq_adc_shortlist(enc, queries, centers, books)
    ivf = {(r["query_id"], r["vec_id"])
           for r in S.knn_ivf(emb, queries, k=5,
                              centroids=centers).collect()}
    got = {(r["query_id"], r["vec_id"]) for r in short.collect()}
    assert len(ivf & got) / len(ivf) >= 0.7
    brute = {(r["query_id"], r["vec_id"])
             for r in knn_bruteforce(emb, queries, k=5).collect()}
    ann = {(r["query_id"], r["vec_id"])
           for r in S.knn_ivf_pq(emb, queries, k=5).collect()}
    assert len(brute & ann) / len(brute) >= 0.25


def test_lloyd_update_forms_identical():
    """The vectorized Lloyd center update (bincount + np.add.at scatter,
    round 9 optimization) is BIT-IDENTICAL to the per-cluster mask loop
    it replaced: numpy's axis-0 mean reduces rows sequentially in index
    order — the same accumulation order np.add.at uses — so no center
    (and hence no downstream cell assignment or codebook) can move by
    an ulp.  Checked at both quantizer shapes (coarse k=16 over dim 64,
    PQ book k=256 over a dim-8 subspace), including clusters larger
    than numpy's 128-element pairwise-summation block."""
    import numpy as np

    from flinkapps_spark.operators.similarity import _lloyd, _nearest_center

    def lloyd_loop(X, k, seed, iters=25):
        rng = np.random.default_rng(seed)
        ctr = X[rng.choice(len(X), size=min(k, len(X)), replace=False)]
        xx = (X * X).sum(1)
        for _ in range(iters):
            assign = _nearest_center(X, ctr, xx)
            for j in range(len(ctr)):
                pts = X[assign == j]
                if len(pts):
                    ctr[j] = pts.mean(axis=0)
        return ctr

    rng = np.random.default_rng(7)
    for n, d, k in ((2000, 64, 16), (2000, 8, 256), (50, 4, 256)):
        X = rng.standard_normal((n, d))
        want = lloyd_loop(X, k, seed=42)
        got = np.asarray(_lloyd(X, k, seed=42))
        assert np.array_equal(want, got), (n, d, k)


def test_observation_metrics(spark):
    """df.observe: zero-cost pipeline metrics collected during the action
    (row counts, sums for data-quality monitoring) — no second scan."""
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    li = load_table(spark, SF_SMOKE, "lineitem")
    obs = Observation("li_metrics")
    observed = li.observe(
        obs, F.count(F.lit(1)).alias("n_rows"),
        F.sum((F.col("l_quantity") < 0).cast("int")).alias("neg_qty"))
    n = observed.filter(F.col("l_returnflag") == "R").count()
    assert n > 0
    got = obs.get
    assert got["n_rows"] == li.count()
    assert got["neg_qty"] == 0


def test_simhash_blocked_equals_crossjoin(spark):
    """Pigeonhole banding is lossless: the banded candidate generation
    returns exactly the cross-join pair set for any max_hamming."""
    from flinkapps_spark.operators.dedup import simhash_pairs
    docs = load_table(spark, SF_SMOKE, "documents")
    for mh, wide in ((3, True), (6, True), (6, False)):
        blocked = {(r.doc_a, r.doc_b, r.hamming) for r in
                   simhash_pairs(docs, max_hamming=mh,
                                 wide=wide).collect()}
        direct = {(r.doc_a, r.doc_b, r.hamming) for r in
                  simhash_pairs(docs, max_hamming=mh, blocked=False,
                                wide=wide).collect()}
        assert blocked == direct


def test_python_udtf_registration(spark):
    """Python UDTF surface (table function: one input row → N output
    rows), registered and callable from SQL — the §2.8 UDF hook extended
    to table functions."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="word: string, n: int")
    class SplitWords:
        def eval(self, text: str):
            for w in (text or "").split():
                yield (w, len(w))

    spark.udtf.register("split_words_t", SplitWords)
    got = [(r.word, r.n) for r in
           spark.sql("SELECT * FROM split_words_t('hello big world')")
           .collect()]
    assert got == [("hello", 5), ("big", 3), ("world", 5)]


def test_cli_jdbc_jobs_demo_input(spark, monkeypatch, capsys):
    """CLI regression: the JDBC jobs get sensor-shaped demo lines (their
    parsers cast field 2 to long — daily-prices lines would explode under
    ANSI casts).  main() calls spark.stop() (correct for its own process);
    neutralize it here so the suite's shared session survives.

    The demo sink is the SCALE path (VERDICT r3 #2): executor-side
    upsert_batch into sqlite + accumulator count — no .collect() anywhere
    on a sink-bound DataFrame (asserted on the module source)."""
    import inspect

    from pyspark.sql import SparkSession

    import flinkapps_spark.__main__ as M
    monkeypatch.setattr(SparkSession, "stop", lambda self: None)
    # both modes pre-aggregate per key first (parallel-safe upsert step 1):
    # 3 demo sensor lines hold 2 distinct sensor ids -> 2 delivered rows
    assert M.main(["--job", "flinkTableJDBC"]) == 0
    assert "2 rows delivered" in capsys.readouterr().out
    assert M.main(["--job", "flinkBatchJDBCSink"]) == 0
    assert "2 rows delivered" in capsys.readouterr().out
    assert ".collect()" not in inspect.getsource(M)


def test_haversine_known_distances(spark):
    """Haversine against published city-pair distances (±0.5%)."""
    from flinkapps_spark.functions.geo import haversine_km
    rows = [
        # (lat1, lon1, lat2, lon2, expected_km)
        (48.8566, 2.3522, 51.5074, -0.1278, 343.6),    # Paris-London
        (40.7128, -74.0060, 34.0522, -118.2437, 3935.7),  # NYC-LA
        (0.0, 0.0, 0.0, 180.0, 20015.1),               # antipodal equator
    ]
    df = spark.createDataFrame(
        rows, "lat1 double, lon1 double, lat2 double, lon2 double, want double")
    got = df.select(
        haversine_km(F.col("lat1"), F.col("lon1"),
                     F.col("lat2"), F.col("lon2")).alias("d"),
        "want").collect()
    for r in got:
        assert abs(r.d - r.want) / r.want < 0.005, (r.d, r.want)


def test_cli_query_surface(spark, monkeypatch, capsys):
    """--list-queries and --query run the catalog from the command line."""
    from pyspark.sql import SparkSession

    from flinkapps_spark.__main__ import main
    monkeypatch.setattr(SparkSession, "stop", lambda self: None)
    assert main(["--list-queries"]) == 0
    listed = capsys.readouterr().out
    assert "q1_pricing_summary" in listed and "[oracle]" in listed
    assert main(["--query", "agg_sum_group", "--sf-dir", SF_SMOKE]) == 0
    assert main(["--query", "nope_not_real"]) == 2


def test_asof_time_slice_skew(spark):
    """asof_join(time_slice=...) under heavy key skew (one key = 50% of
    rows): (a) output is identical to the unsplit operator in both
    directions, incl. tolerance; (b) the (bucket, slice) partitioning the
    sliced path shuffles on actually divides the giant key's rows, where
    the bucket-only scheme serializes them into one task (asserted via
    per-partition-key row counts, not wall time)."""
    import datetime as dt

    from flinkapps_spark.operators.joins import asof_join

    n = 4000
    base = dt.datetime(2024, 1, 1)
    skew_key = lambda i: 0 if i % 2 == 0 else 1 + i % 7  # noqa: E731
    left = spark.createDataFrame(
        [(i, skew_key(i), base + dt.timedelta(minutes=i % 1440), float(i))
         for i in range(n)],
        "id long, k long, ts timestamp, v double")
    right = spark.createDataFrame(
        [(skew_key(i), base + dt.timedelta(minutes=(i * 3) % 1440),
          float(i) * 10.0)
         for i in range(n // 2)],
        "k long, ts timestamp, rv double")

    for kwargs in ({"direction": "backward"},
                   {"direction": "forward", "tolerance": "45min"}):
        plain = asof_join(left, right, ["k"], "ts", value_cols=["rv"],
                          tie_cols=["rv"], num_buckets=8, **kwargs)
        sliced = asof_join(left, right, ["k"], "ts", value_cols=["rv"],
                           tie_cols=["rv"], num_buckets=8,
                           time_slice="2h", **kwargs)
        p = sorted(map(tuple, plain.collect()))
        s = sorted(map(tuple, sliced.collect()))
        assert p == s, (kwargs, p[:3], s[:3])

    # partition-balance: same formulas the operator shuffles on
    b = F.pmod(F.hash("k"), F.lit(8))
    sl = F.floor(F.col("ts").cast("double") / (2 * 3600)).cast("long")
    unsplit_max = (left.groupBy(b.alias("b")).count()
                   .agg(F.max("count")).first()[0])
    split_max = (left.groupBy(b.alias("b"), sl.alias("s")).count()
                 .agg(F.max("count")).first()[0])
    assert unsplit_max >= n / 2            # giant key serialized
    assert split_max <= unsplit_max / 4    # time axis divides it

    # direction='nearest' has no sliced carry-in construction: must refuse
    # loudly, not silently run backward-only (ADVICE r3)
    import pytest
    with pytest.raises(ValueError, match="nearest"):
        asof_join(left, right, ["k"], "ts", value_cols=["rv"],
                  direction="nearest", time_slice="2h")


def test_pq_audit_rejects_indivisible_dim(spark):
    """pq_encode_audit(dim % m != 0) must raise, not return NULL audit
    booleans from a null-padded reconstruction cosine (ADVICE r3)."""
    import pytest

    from flinkapps_spark.operators.similarity import pq_encode_audit

    df = spark.createDataFrame(
        [(i, [float(i + j) for j in range(10)]) for i in range(20)],
        "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="dim % m"):
        pq_encode_audit(df, m=4, k=2).collect()


def test_asof_jvm_matches_pandas_engine(spark):
    """asof_join_jvm (union + window carry, pure codegen) returns exactly
    the merge_asof engine's rows — backward, and forward with tolerance,
    including tie-breaks on equal right timestamps."""
    import datetime as dt

    from flinkapps_spark.operators.joins import asof_join, asof_join_jvm

    n = 3000
    base = dt.datetime(2024, 1, 1)
    left = spark.createDataFrame(
        [(i, i % 11, base + dt.timedelta(minutes=(i * 7) % 2000), float(i))
         for i in range(n)],
        "id long, k long, ts timestamp, v double")
    # duplicate right timestamps on purpose: (i // 2) makes pairs share ts
    right = spark.createDataFrame(
        [(i % 11, base + dt.timedelta(minutes=((i // 2) * 13) % 2000),
          float(i))
         for i in range(n // 2)],
        "k long, ts timestamp, rv double")

    for kwargs in ({"direction": "backward"},
                   {"direction": "backward", "tolerance": "30min"},
                   {"direction": "forward", "tolerance": "1h"}):
        a = asof_join(left, right, ["k"], "ts", value_cols=["rv"],
                      tie_cols=["rv"], num_buckets=8, **kwargs)
        b = asof_join_jvm(left, right, ["k"], "ts", value_cols=["rv"],
                          tie_cols=["rv"], **kwargs)
        ra = sorted(map(tuple, a.collect()))
        rb = sorted(map(tuple, b.collect()))
        assert ra == rb, (kwargs, ra[:3], rb[:3])


def test_checkpoint_resume_exactly_once(spark, tmp_path):
    """T1 checkpointing end-to-end: a file-source stream processes batch 1,
    terminates (availableNow), new files arrive, and a SECOND query
    resuming from the same checkpoint processes ONLY the new files while
    the state store carries the old aggregate forward — converged counts
    equal the batch answer over all data, with no double counting."""
    import uuid

    src = tmp_path / "src"
    ckpt = str(tmp_path / "ckpt")
    b1 = spark.range(0, 300).select((F.col("id") % 5).alias("k"))
    b1.write.mode("append").parquet(str(src))

    schema = "k bigint"

    def run_pass(qname):
        stream = (spark.readStream.schema(schema).parquet(str(src))
                  .groupBy("k").agg(F.count("*").alias("cnt")))
        q = (stream.writeStream.format("memory").queryName(qname)
             .outputMode("complete")
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination()
        return {(r.k, r.cnt) for r in spark.table(qname).collect()}

    first = run_pass(f"ck_{uuid.uuid4().hex[:8]}")
    assert first == {(k, 60) for k in range(5)}

    b2 = spark.range(300, 400).select((F.col("id") % 5).alias("k"))
    b2.write.mode("append").parquet(str(src))
    resumed = run_pass(f"ck_{uuid.uuid4().hex[:8]}")
    # 400 total rows: 80 per key — NOT 60+80 (double-processing batch 1
    # would give 140) and NOT 20 (losing checkpointed state would give
    # only batch 2's counts)
    assert resumed == {(k, 80) for k in range(5)}


def test_jobs_no_shared_view_collision(spark):
    """flink_stream_table and flink_table_manipulation build CONCURRENTLY
    in one session without touching the session catalog (VERDICT r3 #4):
    neither registers a temp view, and two interleaved builds of each
    still evaluate correctly (the old fixed-name createOrReplaceTempView
    would let build B clobber A's input before A collected)."""
    from flinkapps_spark.jobs import flink_stream_table, flink_table_manipulation

    views_before = {v.name for v in spark.catalog.listTables()}
    a = flink_stream_table(spark.createDataFrame(
        [("Alice", 12), ("Bob", 10), ("Alice", 100)],
        "name string, score int"))
    b = flink_stream_table(spark.createDataFrame(
        [("Zed", 1)], "name string, score int"))
    lines1 = spark.createDataFrame(
        [("NYSE,ABB,2010-03-12,21.5,22.1,21.0,21.9,1200345,21.9",)],
        "value string")
    lines2 = spark.createDataFrame(
        [("NYSE,CAT,2011-05-20,60.0,61.0,59.0,60.5,750000,60.5",)],
        "value string")
    c = flink_table_manipulation(lines1)
    d = flink_table_manipulation(lines2)
    # interleaved evaluation AFTER all four builds
    assert {(r.name, r.score_sum) for r in a.collect()} == \
        {("Alice", 112), ("Bob", 10)}
    assert [tuple(r) for r in b.collect()] == [("Zed", 1)]
    assert c.first()["symbol"] == "ABB" and d.first()["symbol"] == "CAT"
    assert {v.name for v in spark.catalog.listTables()} == views_before


def test_exact_dedup_skew_guard(spark):
    """exact_dedup(skew_guard=True) under heavy digest skew (one text =
    50% of rows): (a) output identical to the single-phase form; (b) the
    (digest, salt) keying phase 1 shuffles on actually divides the hot
    digest's rows across reduce keys, where digest-only keying (or any
    md5-prefix scheme — a pure function of the digest) serializes them."""
    from flinkapps_spark.operators.dedup import exact_dedup

    n = 4000
    rows = [(i, "HOT DOCUMENT" if i % 2 == 0 else f"text {i}")
            for i in range(n)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    plain = sorted(map(tuple, exact_dedup(docs).collect()))
    guarded = sorted(map(tuple, exact_dedup(docs, skew_guard=True,
                                            salt_buckets=16).collect()))
    assert plain == guarded
    n_copies = dict((t[0], t[2]) for t in guarded)
    assert max(n_copies.values()) == n / 2      # the skew is real

    # reduce-key balance: same formulas the operator groups on
    digest = F.md5("text")
    salt = F.pmod(F.hash("doc_id"), F.lit(16))
    unsplit_max = (docs.groupBy(digest.alias("d")).count()
                   .agg(F.max("count")).first()[0])
    split_max = (docs.groupBy(digest.alias("d"), salt.alias("s")).count()
                 .agg(F.max("count")).first()[0])
    assert unsplit_max == n / 2
    assert split_max <= unsplit_max / 4


def test_compact_parquet_reduces_files(spark, tmp_path):
    """A fragmented dataset (64 tiny files) compacts to the measured
    target count with identical contents; the swap is atomic-ish (no
    temp dirs left behind)."""
    from flinkapps_spark.sinks.files import compact_parquet
    path = str(tmp_path / "frag")
    spark.range(10_000).selectExpr("id", "id % 7 AS k") \
        .repartition(64).write.parquet(path)
    before = len(glob.glob(os.path.join(path, "*.parquet")))
    assert before >= 32
    total_before = spark.read.parquet(path).count()
    sum_before = spark.read.parquet(path).agg(F.sum("id")).collect()[0][0]
    n_out = compact_parquet(spark, path, target_mb=256)
    assert n_out < before
    assert not os.path.exists(path + "__compact_tmp")
    assert not os.path.exists(path + "__compact_old")
    after = spark.read.parquet(path)
    assert after.count() == total_before
    assert after.agg(F.sum("id")).collect()[0][0] == sum_before


def test_insert_overwrite_partitions_touches_only_written(spark, tmp_path):
    """Dynamic partition overwrite rewrites only the partitions present
    in the incoming frame; untouched partitions keep their rows."""
    from flinkapps_spark.sinks.files import insert_overwrite_partitions
    path = str(tmp_path / "days")
    base = spark.createDataFrame(
        [(1, "d1"), (2, "d1"), (3, "d2"), (4, "d3")], "id int, day string")
    insert_overwrite_partitions(base, path, "day")
    # backfill re-writes ONLY d2 with corrected rows
    fix = spark.createDataFrame([(30, "d2"), (31, "d2")], "id int, day string")
    insert_overwrite_partitions(fix, path, "day")
    got = {(r["id"], r["day"])
           for r in spark.read.parquet(path).collect()}
    assert got == {(1, "d1"), (2, "d1"), (30, "d2"), (31, "d2"), (4, "d3")}


def test_hll_rho_integer_division(spark):
    """The HLL rho domain must come from an integer shift, not double
    division: a 60-bit hash exceeds the 53-bit double significand, so
    floor(h / 1024) rounds h = 2^59 − 32 UP to 2^59 and flips the bin
    length — breaking bit-for-bit register parity with the oracle's
    integer `//`.  Pins the shiftright form against exact python `>>`
    on adversarial values around the rounding boundary."""
    from pyspark.sql import functions as F
    from flinkapps_spark.operators.sketches import HLL_P
    hs = [2 ** 59 - 32, 2 ** 59 - 1, 2 ** 59, 2 ** 60 - 1,
          2 ** 53 + 1, 12345, 0, 1023, 1024]
    df = spark.createDataFrame([(h,) for h in hs], "h long")
    got = [r["w"] for r in
           df.select(F.shiftright("h", HLL_P).alias("w"))
           .orderBy("h").collect()]
    expected = [h >> HLL_P for h in sorted(hs)]
    assert got == expected
    # and the double-division form really IS wrong on the boundary —
    # the regression this test exists to prevent coming back
    bad = df.select(F.floor(F.col("h") / (1 << HLL_P)).cast("long")
                    .alias("w")).orderBy("h").collect()
    assert [r["w"] for r in bad] != expected


# --- ADVICE r5 regressions --------------------------------------------------


def test_cte_row_limit_restored(spark):
    """The recursive-CTE queries raise spark.sql.cteRecursionRowLimit for
    their own execution only: the prior value must be restored before the
    build returns (the tripwire stays armed for later queries on the
    shared session), and the returned frame must still be collectable
    under the restored LOW limit (the recursion ran eagerly, pinned)."""
    from flinkapps_spark.plans import catalog
    reg = catalog.registry()
    key = "spark.sql.cteRecursionRowLimit"
    prior = spark.conf.get(key)
    try:
        spark.conf.set(key, "1000")   # far below the walk's ~90k rows
        df = reg["sql_recursive_hierarchy"].build(spark, SF_SMOKE)
        assert spark.conf.get(key) == "1000"
        assert df.count() > 0         # pinned result; no re-run
        df2 = reg["events_holt_linear"].build(spark, SF_SMOKE)
        assert spark.conf.get(key) == "1000"
        assert df2.count() > 0
    finally:
        spark.conf.set(key, prior)


def test_ri_audit_tolerates_duplicate_parent_keys(spark, tmp_path):
    """dq_referential_integrity joins DISTINCT parent-key projections: a
    duplicated parent PK (the corruption an RI audit exists to survive)
    must not fan out the shared lineitem scan and inflate n_child /
    n_orphan (ADVICE r5).  Builds a fixture dir where orders carries one
    duplicated o_orderkey and nation one duplicated n_nationkey, then
    checks exact child counts AND full oracle parity on the same dir."""
    import shutil

    from flinkapps_spark.plans import catalog
    from flinkapps_spark.schemas import TESTDATA_TABLES
    from tests.conftest import make_duck
    from tests.oracle_harness import compare

    dst = str(tmp_path)
    con = duckdb.connect()
    dup_pk = {"orders": "o_orderkey", "nation": "n_nationkey"}
    for t in TESTDATA_TABLES:
        src = os.path.join(SF_SMOKE, f"{t}.parquet")
        if not os.path.exists(src):
            continue
        if t in dup_pk:
            con.execute(f"""
                COPY (SELECT * FROM read_parquet('{src}')
                      UNION ALL
                      SELECT * FROM (
                          SELECT * FROM read_parquet('{src}')
                          ORDER BY {dup_pk[t]} LIMIT 1))
                TO '{dst}/{t}.parquet' (FORMAT PARQUET)""")
        else:
            shutil.copy(src, os.path.join(dst, f"{t}.parquet"))
    con.close()

    q = catalog.registry()["dq_referential_integrity"]
    got = {r["fk_edge"]: r for r in q.build(spark, dst).collect()}
    n_li = load_table(spark, dst, "lineitem").count()
    n_orders = load_table(spark, dst, "orders").count()
    n_cust = load_table(spark, dst, "customer").count()
    # the duplicated o_orderkey parent must NOT fan out the lineitem scan
    for edge in ("lineitem.l_orderkey->orders", "lineitem.l_partkey->part",
                 "lineitem.l_suppkey->supplier"):
        assert got[edge]["n_child"] == n_li, edge
        assert got[edge]["n_orphan"] == 0, edge
    # child-side duplication is real rows and DOES count (orders gained
    # one row as a CHILD of customer; customer gained none as a child)
    assert got["orders.o_custkey->customer"]["n_child"] == n_orders
    assert got["customer.c_nationkey->nation"]["n_child"] == n_cust
    # and the duplicated n_nationkey parent must not inflate either edge
    # that references nation
    duck = make_duck(dst)
    try:
        compare(q.build(spark, dst), duck.sql(q.oracle),
                "dq_referential_integrity[dup-parents]")
    finally:
        duck.close()


# --- dedup_clusters strategy knob -------------------------------------------


def test_dedup_clusters_strategy_knob(spark):
    """One clusters API, two generators: 'prefix' and 'lsh' agree on this
    fixture (its near-dup pairs are far above the LSH S-curve knee, so
    banding recall is 1.0 here); 'auto' routes small corpora to prefix;
    unknown strategies are rejected rather than silently defaulted."""
    from flinkapps_spark.operators.dedup import dedup_clusters
    from flinkapps_spark.plans.pipeline_queries import _augment_near

    docs = _augment_near(load_table(spark, SF_SMOKE, "documents"))
    by_prefix = sorted(tuple(r) for r in
                       dedup_clusters(docs, pairs="prefix").collect())
    by_lsh = sorted(tuple(r) for r in
                    dedup_clusters(docs, pairs="lsh").collect())
    by_auto = sorted(tuple(r) for r in
                     dedup_clusters(docs, pairs="auto").collect())
    assert by_prefix == by_lsh == by_auto
    with pytest.raises(ValueError, match="pairs must be"):
        dedup_clusters(docs, pairs="lshh")


def test_dedup_clusters_concurrent_queries(spark):
    """Regression stress for the round-8 ADVICE medium: _ckpt_tracked
    diffs the context-GLOBAL persistent-RDD registry around each
    localCheckpoint, so two CC-based queries on the SAME SparkContext
    could capture each other's checkpoint blocks and later unpersist
    them — a locally-checkpointed RDD cannot be recomputed, so the
    victim thread failed or silently lost rows.  The snapshot window is
    now serialized by a module lock; this runs both cluster strategies
    concurrently and pins each against its serial result."""
    import threading

    from flinkapps_spark.operators.dedup import dedup_clusters
    from flinkapps_spark.plans.pipeline_queries import _augment_near

    docs = _augment_near(load_table(spark, SF_SMOKE, "documents"))
    serial = {p: sorted(tuple(r) for r in
                        dedup_clusters(docs, pairs=p).collect())
              for p in ("prefix", "lsh")}
    results: dict[str, list] = {}
    errors: list[BaseException] = []

    def run(p: str) -> None:
        try:
            results[p] = sorted(tuple(r) for r in
                                dedup_clusters(docs, pairs=p).collect())
        except BaseException as e:  # noqa: BLE001 — surfaced below
            errors.append(e)

    threads = [threading.Thread(target=run, args=(p,))
               for p in ("prefix", "lsh")]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    assert not any(t.is_alive() for t in threads), \
        "a concurrent cluster query hung past the 300 s join timeout"
    assert not errors, errors
    assert results["prefix"] == serial["prefix"]
    assert results["lsh"] == serial["lsh"]


def test_augment_offset_tripwire(spark):
    """An id at/above the augmentation offset must fail LOUDLY instead of
    silently colliding with an augmented id (the sf-scale GROUP BY merge
    bug class)."""
    from flinkapps_spark.plans.pipeline_queries import _augment_near

    bad = spark.createDataFrame([(1_000_001, "x y z")],
                                "doc_id long, text string")
    with pytest.raises(Exception, match="offset would collide"):
        _augment_near(bad).collect()


def test_query_pins_self_clean(spark):
    """VERDICT r9 #8: query-local persists/localCheckpoints must not
    accumulate across sequential catalog builds WITHOUT free_session_state.
    The registry attaches a weakref finalizer to every built result that
    frees the blocks pinned for it once the result object is dropped —
    probe: N build→materialize→drop cycles over persist-heavy queries,
    pinned-RDD count must not grow."""
    import gc

    from flinkapps_spark.plans import catalog

    reg = catalog.registry()
    jsc = spark.sparkContext._jsc

    def n_pinned() -> int:
        gc.collect()
        return len(jsc.getPersistentRDDs())

    names = ["itemset_copurchase_pairs", "dedup_minhash_lsh",
             "stats_mannwhitney_u"]

    def cycle() -> None:
        for nm in names:
            df = reg[nm].build(spark, SF_SMOKE)
            df.write.format("noop").mode("overwrite").save()
            del df

    cycle()                      # warm-up cycle, then measure growth
    base = n_pinned()
    for _ in range(3):
        cycle()
    after = n_pinned()
    assert after <= base, (base, after)


def test_nearest_center_inplace_form():
    """_nearest_center's in-place distance build must be BIT-identical to
    the naive ‖x‖²−2x·C+‖C‖² expression (power-of-two scaling commutes
    with IEEE rounding; addition is commutative; add order preserved) —
    the cell-assignment contract every IVF path routes through."""
    import numpy as np

    from flinkapps_spark.operators.similarity import _nearest_center

    rng = np.random.default_rng(7)
    for n, k, dim in ((16384, 256, 8), (2000, 16, 64), (7, 3, 8), (1, 1, 4)):
        X = rng.normal(size=(n, dim))
        C = np.ascontiguousarray(X[:k].copy())
        naive = (((X * X).sum(1))[:, None] - 2.0 * (X @ C.T)
                 + (C * C).sum(1)[None, :]).argmin(1)
        assert np.array_equal(_nearest_center(X, C), naive)
