"""Streaming-executed queries: the reference's streaming pipeline shapes run
through real Structured Streaming micro-batches (file-replay source,
availableNow trigger, memory sink), then checked against *batch* DuckDB
oracles — the batch≡stream consistency property the reference's changelog
output is supposed to guarantee (SURVEY §5.3, §7.5.3).

The driver sees an ordinary DataFrame result; the streaming execution
happens inside the build function.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from flinkapps_spark.functions.text import tokenize
from flinkapps_spark.plans.catalog import query
from flinkapps_spark.plans.exact import exact_sum, sql_sum, units_col
from flinkapps_spark.plans.relational_queries import (
    ATTRIBUTION_ORACLE, CEP_ORACLE,
)
from flinkapps_spark.streaming.jobs import (
    file_stream_source, run_stream_to_memory,
)


@query(
    "stream_flagship_filter",
    oracle="""
        SELECT event_id, user_id, event_type, value,
               ROUND(value - 100.0, 2) AS spread
        FROM events
        WHERE event_type IN ('purchase', 'signup', 'error')
    """,
    category="streaming: filter pipeline (append)",
    doc="The flagship filter/derive pipeline executed as a real stream "
        "(micro-batch append mode) — same rows as the batch plan "
        "(reference source/flinkStreamProcessing.scala:103-135, EP1).",
)
def stream_flagship_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = file_stream_source(spark, sf_dir, "events")
    out = (ev.filter(F.col("event_type").isin("purchase", "signup", "error"))
           .select("event_id", "user_id", "event_type", "value",
                   F.round(F.col("value") - F.lit(100.0), 2).alias("spread")))
    return run_stream_to_memory(out, output_mode="append")


@query(
    "stream_wordcount",
    oracle="""
        SELECT w AS word, COUNT(*) AS cnt
        FROM (SELECT unnest(string_split_regex(lower(text), '\\W+')) AS w
              FROM documents)
        WHERE w <> ''
        GROUP BY w
    """,
    category="streaming: continuous aggregation (complete)",
    doc="Word count as a continuous streaming aggregation (complete output "
        "mode = the converged changelog state, SURVEY §7.5.3) — final state "
        "equals the batch answer (reference source/flinkStarter.scala:12-26).",
)
def stream_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = file_stream_source(spark, sf_dir, "documents")
    counts = (docs.select(F.explode(tokenize(F.col("text"))).alias("word"))
              .groupBy("word").agg(F.count("*").alias("cnt")))
    return run_stream_to_memory(counts, output_mode="complete")


@query(
    "stream_tumbling_window",
    oracle="""
        SELECT time_bucket(INTERVAL '5 minutes', ts) AS window_start,
               event_type, COUNT(*) AS cnt
        FROM events
        GROUP BY time_bucket(INTERVAL '5 minutes', ts), event_type
    """,
    category="streaming: event-time window + watermark",
    doc="Tumbling 5-minute event-time window with a watermark, run as a "
        "stream (reference source/flinkStarter.scala:22-24; watermark "
        "surface = SURVEY T2, which the reference declares but never uses). "
        "availableNow replay + complete mode → converged state matches batch.",
)
def stream_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = file_stream_source(spark, sf_dir, "events")
    agged = (ev.withWatermark("ts", "10 minutes")
             .groupBy(F.window("ts", "5 minutes"), F.col("event_type"))
             .agg(F.count("*").alias("cnt"))
             .select(F.col("window.start").alias("window_start"),
                     "event_type", "cnt"))
    return run_stream_to_memory(agged, output_mode="complete")


@query(
    "stream_append_closed_windows",
    oracle="""
        WITH mx AS (SELECT max(ts) AS m FROM events)
        SELECT time_bucket(INTERVAL '1 hour', ts) AS ws, event_type,
               COUNT(*) AS cnt
        FROM events, mx
        GROUP BY time_bucket(INTERVAL '1 hour', ts), event_type, mx.m
        HAVING time_bucket(INTERVAL '1 hour', ts) + INTERVAL 1 HOUR
               <= m - INTERVAL 10 MINUTE
    """,
    category="streaming: append-mode watermark finalization",
    doc="APPEND output mode: a window row is emitted exactly once, only "
        "after the watermark (max event time − 10 min) passes its end — "
        "the at-most-once-per-window contract downstream sinks without "
        "upsert support need (complete/update modes re-emit). The final "
        "in-flight windows are NOT emitted, and the oracle reproduces "
        "precisely that: hourly counts HAVING window_end ≤ max(ts) − "
        "delay. Also pins the availableNow flush-on-termination "
        "behavior (a final no-data batch advances the watermark).",
)
def stream_append_closed_windows(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    ev = file_stream_source(spark, sf_dir, "events")
    agged = (ev.withWatermark("ts", "10 minutes")
             .groupBy(F.window("ts", "1 hour"), F.col("event_type"))
             .agg(F.count("*").alias("cnt"))
             .select(F.col("window.start").alias("ws"),
                     "event_type", "cnt"))
    return run_stream_to_memory(agged, output_mode="append")


@query(
    "stream_sliding_window",
    oracle="""
        SELECT ws AS window_start, event_type, COUNT(*) AS cnt
        FROM (SELECT event_type,
                     unnest([time_bucket(INTERVAL '5 minutes', ts),
                             time_bucket(INTERVAL '5 minutes', ts)
                                 - INTERVAL 5 MINUTE]) AS ws
              FROM events)
        GROUP BY ws, event_type
    """,
    category="streaming: sliding event-time window",
    doc="Sliding 10-minute window advancing every 5 minutes: each event "
        "contributes to exactly two overlapping windows — Spark expands "
        "the row into its window memberships before the keyed state agg "
        "(state ∝ open windows × keys, bounded by the watermark). The "
        "oracle unrolls the same two 5-min-aligned window starts per "
        "event. Complete-mode converged state equals the batch answer.",
)
def stream_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = file_stream_source(spark, sf_dir, "events")
    agged = (ev.withWatermark("ts", "10 minutes")
             .groupBy(F.window("ts", "10 minutes", "5 minutes"),
                      F.col("event_type"))
             .agg(F.count("*").alias("cnt"))
             .select(F.col("window.start").alias("window_start"),
                     "event_type", "cnt"))
    return run_stream_to_memory(agged, output_mode="complete")


@query(
    "stream_ohlc_bars",
    oracle=f"""
        WITH b AS (
            SELECT event_type, date_trunc('hour', ts) AS bucket,
                   value, ts, event_id
            FROM events),
        r AS (
            SELECT *,
                   row_number() OVER (PARTITION BY event_type, bucket
                                      ORDER BY ts, event_id) AS rn_a,
                   row_number() OVER (PARTITION BY event_type, bucket
                                      ORDER BY ts DESC, event_id DESC) AS rn_d
            FROM b)
        SELECT event_type, bucket,
               max(CASE WHEN rn_a = 1 THEN value END) AS open,
               max(value) AS high,
               min(value) AS low,
               max(CASE WHEN rn_d = 1 THEN value END) AS close,
               {sql_sum('value', 100)} AS volume,
               COUNT(*) AS n_events
        FROM r
        GROUP BY event_type, bucket
    """,
    category="streaming: OHLC bars (stateful min_by/max_by)",
    doc="Streaming OHLC: the events_ohlc_resample aggregation run as a "
        "watermarked 1-hour event-time window stream — min_by/max_by "
        "keyed state accumulates open/close per (type, bar) across "
        "micro-batches; complete-mode converged state must equal the "
        "batch result (batch≡stream, SURVEY T3). The hour window() "
        "aligns with date_trunc('hour') by construction.",
)
def stream_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = file_stream_source(spark, sf_dir, "events")
    agged = (ev.withWatermark("ts", "10 minutes")
             .groupBy(F.window("ts", "1 hour"), F.col("event_type"))
             .agg(F.min_by("value", F.struct("ts", "event_id")).alias("open"),
                  F.max("value").alias("high"),
                  F.min("value").alias("low"),
                  F.max_by("value", F.struct("ts", "event_id")).alias("close"),
                  exact_sum("value", 100).alias("volume"),
                  F.count(F.lit(1)).alias("n_events"))
             .select(F.col("window.start").alias("bucket"), "event_type",
                     "open", "high", "low", "close", "volume", "n_events"))
    return run_stream_to_memory(agged, output_mode="complete")


@query(
    "stream_sql_grouped_sum",
    oracle=f"""
        SELECT name, {sql_sum('score', 100)} AS total
        FROM (SELECT c_mktsegment AS name, c_acctbal AS score FROM customer)
        GROUP BY name
    """,
    category="streaming: SQL over stream (update→converged)",
    doc="SQL-over-stream: temp view on a streaming DataFrame + spark.sql "
        "continuous aggregation (reference source/flinkStreamTable.scala:68-79, "
        "EP2 bridge). Complete mode returns the converged changelog state.",
)
def stream_sql_grouped_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    cu = file_stream_source(spark, sf_dir, "customer") \
        .select(F.col("c_mktsegment").alias("name"),
                F.col("c_acctbal").alias("score"))
    cu.createOrReplaceTempView("stream_input_table")
    # the fixed-point sum SQL is engine-portable: same expression as the
    # DuckDB oracle (streaming state accumulates exact integer units)
    agged = spark.sql(
        f"SELECT name, {sql_sum('score', 100)} AS total "
        "FROM stream_input_table GROUP BY name")
    return run_stream_to_memory(agged, output_mode="complete")


@query(
    "stream_upsert_accumulate",
    oracle=f"""
        SELECT user_id AS sensor_id, {sql_sum('value')} AS sensor_temp
        FROM events GROUP BY user_id
    """,
    category="streaming: foreachBatch upsert sink (K7)",
    doc="End-to-end streaming upsert: events replayed through micro-batches, "
        "each batch pre-aggregated per key and atomically upserted "
        "(INSERT .. ON CONFLICT DO UPDATE, accumulate mode) into a DB-API "
        "database (DuckDB stands in for Postgres — reference "
        "source/flinkBatchJDBCSink.scala:98-127). Converged table state "
        "must equal the batch GROUP BY — the reference needed "
        "parallelism=1 for this; the atomic form doesn't (SURVEY §7.5.6).",
)
def stream_upsert_accumulate(spark: SparkSession, sf_dir: str) -> DataFrame:
    import duckdb

    from flinkapps_spark.sinks.jdbc import foreach_batch_upsert

    con = duckdb.connect(":memory:")
    # accumulate fixed-point int units in the DB so cross-batch addition is
    # associative (matches the oracle's fixed-point SUM bit-for-bit)
    con.execute("CREATE TABLE t_sensor (sensor_id BIGINT PRIMARY KEY, "
                "sensor_temp BIGINT)")

    class _SharedCon:
        # foreachBatch runs on the driver: share one in-process connection,
        # ignore per-batch close() so state accumulates across batches
        def executemany(self, *a):
            return con.executemany(*a)

        def commit(self):
            pass

        def close(self):
            pass

    ev = file_stream_source(spark, sf_dir, "events") \
        .select(F.col("user_id").alias("sensor_id"),
                units_col(F.col("value"), 10000)
                .alias("sensor_temp"))
    import tempfile
    ckpt = tempfile.mkdtemp(prefix="ckpt_upsert_")
    q = foreach_batch_upsert(
        ev, ckpt, connection_factory=_SharedCon, table="t_sensor",
        key_cols=["sensor_id"], val_cols=["sensor_temp"], accumulate=True,
        driver_collect=True)
    q.awaitTermination()
    rows = con.execute("SELECT sensor_id, sensor_temp / 10000.0 "
                       "FROM t_sensor").fetchall()
    con.close()
    return spark.createDataFrame(
        rows, "sensor_id bigint, sensor_temp double")


@query(
    "stream_update_mode_sum",
    oracle=f"""
        SELECT event_type, {sql_sum('value')} AS total
        FROM events GROUP BY event_type
    """,
    category="streaming: update-mode changelog (T4)",
    doc="Update output mode — Spark's changelog surface: each micro-batch "
        "emits only re-aggregated keys (Flink emits -U/+U retract pairs; "
        "same converged state — SURVEY §7.5.3). With the fixture replay the "
        "converged sink state equals the batch GROUP BY.",
)
def stream_update_mode_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = file_stream_source(spark, sf_dir, "events")
    agged = (ev.groupBy("event_type")
             .agg(exact_sum("value").alias("total")))
    mem = run_stream_to_memory(agged, output_mode="update")
    # update mode appends one row per key per batch that touched the key;
    # the converged state is the LAST emission per key
    from pyspark.sql import Window
    import pyspark.sql.functions as SF
    w = Window.partitionBy("event_type").orderBy(SF.monotonically_increasing_id().desc())
    return (mem.withColumn("_rn", SF.row_number().over(w))
            .filter(SF.col("_rn") == 1).drop("_rn"))


@query(
    "stream_stateful_running_count",
    oracle=f"""
        SELECT user_id, COUNT(*) AS n_events,
               {sql_sum('value')} AS total_value
        FROM events GROUP BY user_id
    """,
    category="streaming: custom stateful operator",
    doc="Custom stateful streaming operator via applyInPandasWithState: "
        "per-user running (count, sum) state updated across micro-batches, "
        "final state emitted at timeout/end — the Spark surface for "
        "operators Structured Streaming lacks built-in (SURVEY north star). "
        "Converged state equals the batch GROUP BY.",
)
def stream_stateful_running_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd
    from pyspark.sql.streaming.state import (
        GroupState, GroupStateTimeout,
    )

    ev = file_stream_source(spark, sf_dir, "events") \
        .select("user_id", "value")

    out_schema = ("user_id bigint, n_events bigint, total_value double")
    # state holds fixed-point int units so the running sum is
    # order-independent and matches the oracle's fixed-point SUM exactly
    state_schema = "n bigint, s bigint"

    def update(key, pdfs, state: GroupState):
        import numpy as np
        n, s = (state.get if state.exists else (0, 0))
        for pdf in pdfs:
            n += len(pdf)
            v = pdf["value"].to_numpy() * 10000.0
            # half-away-from-zero, mirroring SQL ROUND(x, 0) on both engines
            # (np.round would use half-even)
            units = np.where(v >= 0, np.floor(v + 0.5),
                             np.ceil(v - 0.5)).astype("int64")
            s += int(units.sum())
        state.update((n, s))
        yield pd.DataFrame({"user_id": [key[0]], "n_events": [n],
                            "total_value": [s / 10000.0]})

    updates = ev.groupBy("user_id").applyInPandasWithState(
        update, outputStructType=out_schema, stateStructType=state_schema,
        outputMode="update", timeoutConf=GroupStateTimeout.NoTimeout)
    mem = run_stream_to_memory(updates, output_mode="update")
    # keep the LAST emission per key (single availableNow batch → one
    # emission, but be robust to multi-batch replays)
    from pyspark.sql import Window
    w = Window.partitionBy("user_id").orderBy(
        F.monotonically_increasing_id().desc())
    return (mem.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1).drop("_rn"))


@query(
    "stream_dropduplicates",
    oracle="""
        SELECT DISTINCT user_id, event_type FROM events
    """,
    category="streaming: dropDuplicates + watermark",
    doc="Streaming deduplication: dropDuplicates over (user_id, event_type) "
        "with a watermark bounding the dedup state — the streaming-native "
        "exact-dedup operator for at-least-once sources. Emitted key set "
        "equals batch DISTINCT.",
)
def stream_dropduplicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = file_stream_source(spark, sf_dir, "events")
    deduped = (ev.withWatermark("ts", "1 hour")
               .dropDuplicates(["user_id", "event_type"])
               .select("user_id", "event_type"))
    return run_stream_to_memory(deduped, output_mode="append")


@query(
    "stream_static_join",
    oracle="""
        SELECT event_id, user_id, value, c_mktsegment
        FROM events JOIN customer ON user_id = c_custkey
        WHERE event_type = 'purchase'
    """,
    category="streaming: stream-static enrichment join",
    doc="Dimension enrichment of a live stream: streaming events inner-join "
        "a static customer table. The static side is broadcast — each "
        "micro-batch probes the hashed relation with NO shuffle of the "
        "stream and no state store (stateless join; at 100 TB/day the "
        "stream never repartitions, and dim refresh is a re-broadcast per "
        "batch). Beyond the reference surface (it has no joins, SURVEY "
        "§2.10) but a capability every Kafka-enrichment pipeline needs.",
)
def stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flinkapps_spark.sources.batch import load_table
    ev = file_stream_source(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase")
    cu = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment")
    out = (ev.join(F.broadcast(cu), ev.user_id == cu.c_custkey)
           .select("event_id", "user_id", "value", "c_mktsegment"))
    return run_stream_to_memory(out, output_mode="append")


@query(
    "stream_stream_join",
    oracle="""
        SELECT p.event_id AS purchase_id, s.event_id AS signup_id,
               p.user_id, p.value AS purchase_value
        FROM events p JOIN events s
          ON p.user_id = s.user_id
         AND p.event_type = 'purchase' AND s.event_type = 'signup'
         AND p.ts >= s.ts AND p.ts <= s.ts + INTERVAL 1 HOUR
    """,
    category="streaming: stream-stream interval join",
    doc="Purchases attributed to a signup by the same user within the "
        "previous hour: two watermarked streams, inner join with an "
        "event-time range condition. Spark keeps both sides in the state "
        "store only up to watermark + interval (bounded state — the range "
        "condition is what makes an unbounded stream-stream join feasible); "
        "availableNow replay converges to exactly the batch join. Scale: "
        "state keyed by user_id, evicted by watermark; skewed users split "
        "by AQE does NOT apply in streaming — salt the key if one user "
        "dominates.",
)
def stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = file_stream_source(spark, sf_dir, "events")
    p = (ev.filter(F.col("event_type") == "purchase")
         .select(F.col("event_id").alias("purchase_id"),
                 F.col("user_id").alias("p_user"),
                 F.col("value").alias("purchase_value"),
                 F.col("ts").alias("p_ts"))
         .withWatermark("p_ts", "2 hours"))
    s = (file_stream_source(spark, sf_dir, "events")
         .filter(F.col("event_type") == "signup")
         .select(F.col("event_id").alias("signup_id"),
                 F.col("user_id").alias("s_user"),
                 F.col("ts").alias("s_ts"))
         .withWatermark("s_ts", "2 hours"))
    joined = p.join(
        s, (F.col("p_user") == F.col("s_user"))
        & (F.col("p_ts") >= F.col("s_ts"))
        & (F.col("p_ts") <= F.col("s_ts") + F.expr("INTERVAL 1 HOUR")))
    out = joined.select(
        "purchase_id", "signup_id",
        F.col("p_user").alias("user_id"), "purchase_value")
    return run_stream_to_memory(out, output_mode="append")


@query(
    "stream_session_window",
    oracle="""
        WITH marked AS (
            SELECT user_id, ts,
                   CASE WHEN LAG(ts) OVER w IS NULL
                         OR ts - LAG(ts) OVER w > INTERVAL '30 minutes'
                        THEN 1 ELSE 0 END AS new_s
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        ),
        sess AS (
            SELECT user_id, ts,
                   SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS sid
            FROM marked
        )
        SELECT user_id, MIN(ts) AS session_start, COUNT(*) AS n_events
        FROM sess GROUP BY user_id, sid
    """,
    category="streaming: session window + watermark",
    doc="Gap-based sessionization (30-min inactivity) as a STREAMING "
        "aggregation: session_window + watermark, availableNow replay, "
        "complete mode → converged sessions equal the batch islands "
        "(same oracle as events_sessionize). Scale: session state is "
        "merged incrementally per key in the state store and evicted "
        "once the watermark passes a session's close — the unbounded-"
        "stream path the batch lag/cumsum reconstruction can't take.",
)
def stream_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = file_stream_source(spark, sf_dir, "events")
    agged = (ev.withWatermark("ts", "1 hour")
             .groupBy(F.session_window("ts", "30 minutes"), F.col("user_id"))
             .agg(F.count("*").alias("n_events"))
             .select(F.col("user_id"),
                     F.col("session_window.start").alias("session_start"),
                     F.col("n_events")))
    return run_stream_to_memory(agged, output_mode="complete")


@query(
    "stream_dropdup_within_watermark",
    oracle="""
        SELECT event_id, event_type, value FROM events
    """,
    category="streaming: dropDuplicatesWithinWatermark",
    doc="At-least-once source dedup: the input stream carries every event "
        "TWICE (constructed exact redelivery) and "
        "dropDuplicatesWithinWatermark(event_id) restores exactly-once "
        "rows. Unlike plain dropDuplicates, per-key state is EVICTED "
        "once the watermark passes — bounded state on an unbounded "
        "stream, the production shape for deduping retried deliveries. "
        "Duplicates are byte-identical so the kept row is independent "
        "of arrival order.",
)
def stream_dropdup_within_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = (file_stream_source(spark, sf_dir, "events")
          .select("event_id", "ts", "event_type", "value"))
    doubled = ev.unionByName(ev)  # simulated redelivery
    dd = (doubled.withWatermark("ts", "1 hour")
          .dropDuplicatesWithinWatermark(["event_id"])
          .select("event_id", "event_type", "value"))
    return run_stream_to_memory(dd, output_mode="append")


def _stream_minhash_oracle() -> str:
    from flinkapps_spark.plans.pipeline_queries import (
        SQL_AUG_NEAR, SQL_WORDS, _sql_band_keys, _sql_minhash_sig,
        _sql_shingle_codes, _sql_word_code,
    )
    from flinkapps_spark.operators.dedup import N_BANDS

    return f"""
        WITH aug AS ({SQL_AUG_NEAR}),
        docs_w AS (SELECT doc_id, {SQL_WORDS} AS ws FROM aug),
        wcodes AS (
            SELECT doc_id,
                   list_transform(ws, w -> {_sql_word_code('w')}) AS wc
            FROM docs_w WHERE len(ws) >= 3
        ),
        codes AS (
            SELECT doc_id, {_sql_shingle_codes('wc')} AS cset FROM wcodes
        ),
        sig_t AS (
            SELECT doc_id AS doc, {_sql_minhash_sig()} AS sig FROM codes
        ),
        bands AS (
            SELECT doc, unnest([{_sql_band_keys()}]) AS band_key,
                   unnest({list(range(1, N_BANDS + 1))}) AS band_idx
            FROM sig_t
        ),
        cand AS (
            SELECT x.doc AS doc_a, y.doc AS doc_b,
                   COUNT(*) AS shared_bands
            FROM bands x JOIN bands y
              ON x.band_idx = y.band_idx AND x.band_key = y.band_key
             AND x.doc < 1000000 AND y.doc >= 1000000
            GROUP BY x.doc, y.doc
        )
        SELECT c.doc_a, c.doc_b, c.shared_bands,
               ROUND(CAST(len(list_intersect(ca.cset, cb.cset)) AS DOUBLE)
                     / (len(ca.cset) + len(cb.cset)
                        - len(list_intersect(ca.cset, cb.cset))), 6)
                   AS jaccard
        FROM cand c
        JOIN codes ca ON ca.doc_id = c.doc_a
        JOIN codes cb ON cb.doc_id = c.doc_b
        WHERE ROUND(CAST(len(list_intersect(ca.cset, cb.cset)) AS DOUBLE)
                    / (len(ca.cset) + len(cb.cset)
                       - len(list_intersect(ca.cset, cb.cset))), 6) >= 0.5
    """


@query(
    "stream_minhash_neardup",
    # oracle generated from the same constants as dedup_minhash_lsh,
    # restricted to (static original, streamed variant) cross pairs
    oracle=_stream_minhash_oracle(),
    category="streaming: incremental near-dup vs static index",
    doc="Incremental dedup: a stream of incoming documents (the "
        "constructed first-word-dropped variants) is checked for "
        "near-duplicates against a STATIC corpus band index — the "
        "production shape for deduping new data against an existing "
        "training set. Candidate generation runs inside the stream as a "
        "stateless stream-static broadcast join on (band_idx, band_key); "
        "the converged candidate set is then verified batch-side with "
        "exact Jaccard over shingle-code sets. Scale: per micro-batch "
        "cost = signature math + broadcast probe; the static index "
        "re-broadcasts per batch (pin it with a persisted table or a "
        "state-store join if the corpus outgrows broadcast).",
)
def stream_minhash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flinkapps_spark.operators import dedup
    from flinkapps_spark.sources.batch import load_table

    docs = load_table(spark, sf_dir, "documents")
    # static corpus: shingle-code sets + band index (batch, reused twice)
    static_base = dedup.shingled_docs(docs).persist()
    static_base.count()
    static_sig = static_base.select(
        "doc", dedup._minhash_sig_arrow()(F.col("codes")).alias("sig"))
    static_bands = static_sig.select(
        F.col("doc").alias("static_doc"),
        F.posexplode(F.array(*dedup.band_keys(F.col("sig"))))
        .alias("band_idx", "band_key"))

    # stream of incoming variants (id+1000000, first word dropped)
    incoming = (file_stream_source(spark, sf_dir, "documents")
                .select((F.col("doc_id") + 1000000).alias("doc_id"),
                        F.regexp_replace("text", "^\\w+\\W+", "")
                        .alias("text")))
    s_base = dedup.shingled_docs(incoming)
    s_sig = s_base.select(
        "doc", dedup._minhash_sig_arrow()(F.col("codes")).alias("sig"))
    s_bands = s_sig.select(
        F.col("doc").alias("stream_doc"),
        F.posexplode(F.array(*dedup.band_keys(F.col("sig"))))
        .alias("band_idx", "band_key"))
    hits = s_bands.join(F.broadcast(static_bands), ["band_idx", "band_key"])

    # converge the stream (stateless append), then verify batch-side
    raw = run_stream_to_memory(
        hits.select("static_doc", "stream_doc"), output_mode="append")
    cand = (raw.groupBy("static_doc", "stream_doc")
            .agg(F.count("*").alias("shared_bands")))

    ca = static_base.select(F.col("doc").alias("static_doc"),
                            F.col("codes").alias("ca"))
    # streamed side codes recomputed batch-side (same transform, same codes)
    var_batch = docs.select((F.col("doc_id") + 1000000).alias("doc_id"),
                            F.regexp_replace("text", "^\\w+\\W+", "")
                            .alias("text"))
    cb = dedup.shingled_docs(var_batch).select(
        F.col("doc").alias("stream_doc"), F.col("codes").alias("cb"))
    common = F.size(F.array_intersect(F.col("ca"), F.col("cb")))
    return (cand.join(ca, "static_doc").join(cb, "stream_doc")
            .withColumn("jaccard", F.round(
                common / (F.size("ca") + F.size("cb") - common), 6))
            .filter(F.col("jaccard") >= 0.5)
            .select(F.col("static_doc").alias("doc_a"),
                    F.col("stream_doc").alias("doc_b"),
                    "shared_bands", "jaccard"))


def _stream_embedding_oracle() -> str:
    from flinkapps_spark.plans.pipeline_queries import _sql_lsh_pair_ctes
    # the shared LSH CTEs already union originals with their perturbed
    # twins (id+10000000); the stream-vs-static restriction is exactly
    # the CROSS pairs (original id_a, streamed-variant id_b)
    return f"""
        WITH {_sql_lsh_pair_ctes(0.99)}
        SELECT id_a AS static_id, id_b AS stream_id, cosine
        FROM lsh_pairs
        WHERE id_a < 10000000 AND id_b >= 10000000
    """


@query(
    "stream_embedding_neardup",
    oracle=_stream_embedding_oracle(),
    category="streaming: incremental embedding near-dup vs static index",
    doc="Incremental SEMANTIC dedup: a stream of incoming embeddings "
        "(the constructed +0.05-perturbed variants, id+10000000) is "
        "checked for near-duplicates against a STATIC corpus's "
        "hyperplane-band index — the production ingest shape for "
        "deduping new vectors against an existing training set (the "
        "embedding analog of stream_minhash_neardup). Candidate "
        "generation runs inside the stream as a stateless stream-static "
        "equi-join on (band, sig); the converged candidate set is "
        "verified batch-side with exact cosine ≥ 0.99. Signatures are "
        "the integer-exact banded family (operators/similarity.py), so "
        "the DuckDB oracle mirrors every bit. Scale: per micro-batch "
        "cost = one Arrow signature pass + an equi-join probe; the "
        "static index is built once (re-broadcast per batch here — pin "
        "it with a persisted table or a state-store join when the "
        "corpus outgrows broadcast).",
)
def stream_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flinkapps_spark.functions.vectors import cosine_similarity
    from flinkapps_spark.operators import similarity
    from flinkapps_spark.sources.batch import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    # static corpus band index (batch side, built once)
    static_bands = similarity.band_signature_table(
        emb, "vec_id", "embedding") \
        .withColumnRenamed("id", "static_id")

    def variant(df):
        v = F.transform("embedding", lambda x: x.cast("double"))
        return df.select(
            (F.col("vec_id") + 10000000).alias("vec_id"),
            F.concat(F.array(F.element_at(v, 1) + 0.05),
                     F.slice(v, 2, 10_000)).alias("embedding"))

    # stream of incoming perturbed vectors
    incoming = variant(file_stream_source(spark, sf_dir, "embeddings"))
    s_bands = similarity.band_signature_table(
        incoming, "vec_id", "embedding") \
        .withColumnRenamed("id", "stream_id")
    hits = s_bands.join(F.broadcast(static_bands), ["band", "sig"])

    # converge the stream (stateless append), then verify batch-side
    raw = run_stream_to_memory(
        hits.select("static_id", "stream_id"), output_mode="append")
    cand = raw.distinct()
    sv = emb.select(F.col("vec_id").alias("static_id"),
                    F.transform("embedding", lambda x: x.cast("double"))
                    .alias("sv"))
    bv = variant(emb).select(F.col("vec_id").alias("stream_id"),
                             F.col("embedding").alias("bv"))
    cos = F.round(cosine_similarity(F.col("sv"), F.col("bv")), 6)
    return (cand.join(sv, "static_id").join(bv, "stream_id")
            .withColumn("cosine", cos)
            .filter(F.col("cosine") >= 0.99)
            .select("static_id", "stream_id", "cosine"))


@query(
    "stream_knn_ivfpq_serving",
    oracle="""
        SELECT COUNT(*) AS n_queries, true AS stream_matches_batch
        FROM embeddings WHERE vec_id < 30
    """,
    category="streaming: ANN query serving vs static IVF-PQ index",
    doc="Vector-search SERVING: a stream of incoming query vectors is "
        "answered per micro-batch against a static IVF-PQ index — the "
        "operational complement of stream_embedding_neardup (there the "
        "CORPUS side streams for dedup ingest; here the QUERY side "
        "streams for retrieval). The index (coarse centroids + residual "
        "codebooks + encoded codes) is trained and persisted ONCE before "
        "the stream starts; each micro-batch runs the exact same batch "
        "operators (ivfpq_adc_shortlist → knn_rerank) over only its "
        "arrived queries, so per-batch cost is probe + ADC scan + "
        "shortlist re-rank, independent of how many batches came before "
        "— stateless serving, no stream state store. Because per-query "
        "results are independent, the converged union must EQUAL the "
        "one-shot batch answer bit-for-bit; the emitted gate "
        "(stream_matches_batch) asserts multiset equality of the two "
        "bounded (k·n_queries-row) answer sets — exceptAll-both-ways "
        "emptiness, compared on the driver — "
        "the batch≡stream contract (SURVEY T3) applied to ANN. Index "
        "internals are seed-specific, so the DuckDB oracle asserts the "
        "gate shape (same pattern as the other ANN gates).",
)
def stream_knn_ivfpq_serving(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from flinkapps_spark.operators import similarity
    from flinkapps_spark.sources.batch import load_table

    # persist: emb feeds the trainer sample, the encode pass, and the
    # exact re-rank of every served batch plus the batch baseline
    # (guide §1.2); unpersisted with enc in the finally below
    emb = load_table(spark, sf_dir, "embeddings").persist()
    X = similarity.training_sample(emb)  # one collect, both trainers
    centers = similarity.train_coarse_centroids(emb, sample=X)
    books = similarity.train_residual_books(emb, centers, sample=X)
    # the serving index: encoded once, pinned for the stream's lifetime
    enc = similarity.ivfpq_encode(emb, centers, books).persist()
    n = enc.count()

    def answer(queries):
        short = similarity.ivfpq_adc_shortlist(
            enc, queries, centers, books, corpus_n=n)
        return similarity.knn_rerank(
            short.select("query_id", "vec_id"), emb, queries, k=5)

    served: list = []  # bounded: k rows per served query
    done_batches: set = set()

    def handle(batch_df, batch_id: int) -> None:
        # exactly-once under batch replay: Spark re-runs a failed batch
        # with the SAME id (the K7 sink's batch-id dedup pattern) — a
        # replayed append would otherwise double-count and fail the gate
        if batch_id in done_batches:
            return
        qb = batch_df.filter(F.col("vec_id") < 30)
        if not qb.isEmpty():
            served.extend(answer(qb).collect())
        done_batches.add(batch_id)

    incoming = file_stream_source(spark, sf_dir, "embeddings")
    ckpt = tempfile.mkdtemp(prefix="ckpt_knn_serving_")
    sq = (incoming.writeStream
          .foreachBatch(handle)
          .option("checkpointLocation", ckpt)
          .trigger(availableNow=True)
          .start())
    sq.awaitTermination()

    try:
        # the gate compares two BOUNDED result sets (k rows per served
        # query: k·30 = 150 rows each side) — collect the batch answer
        # once and compare MULTISETS on the driver, which is exactly
        # exceptAll-both-ways-emptiness.  The exceptAll form paid three
        # jobs (two isEmpty + a distinct count) plus a localCheckpoint
        # over 150-row frames — measured 1.3-1.4 s of pure plan overhead
        # at sf0.1 (round-9, guide §1.2/§5: bounded model-state compare
        # belongs on the driver, same precedent as the other ANN gates)
        batch_rows = answer(emb.filter(F.col("vec_id") < 30)).collect()
    finally:
        enc.unpersist()
        emb.unpersist()
    def _cmp_cos(c: float):
        # mirror exceptAll's set-op equality, which the driver compare
        # replaced (ADVICE r9): NaN == NaN (a zero-norm embedding yields a
        # NaN cosine) and -0.0 == 0.0.  Python tuple equality has neither,
        # so map NaN to a sentinel and add +0.0 (IEEE: -0.0 + 0.0 = +0.0).
        return "NaN" if c != c else c + 0.0

    stream_t = sorted((r.query_id, r.vec_id, _cmp_cos(r.cosine), r.rank)
                      for r in served)
    batch_t = sorted((r.query_id, r.vec_id, _cmp_cos(r.cosine), r.rank)
                     for r in batch_rows)
    matches = stream_t == batch_t
    n_q = len({t[0] for t in stream_t})
    return spark.createDataFrame(
        [(n_q, matches)], "n_queries bigint, stream_matches_batch boolean")





from flinkapps_spark.plans.ml_queries import (  # noqa: E402
    GQ_WIDTH, GRID_QUANTILES_ORACLE as _GRID_ORACLE, grid_quantiles_finalize,
)


@query(
    "stream_grid_quantiles",
    oracle=_GRID_ORACLE,  # shared verbatim with the batch sketch
    category="streaming: incremental quantile sketch (complete)",
    doc="The grid-histogram quantile sketch maintained INCREMENTALLY by "
        "the streaming state store: each micro-batch updates per-(type, "
        "bin) counts (complete output mode = the converged sketch), and "
        "the finalize step — shared code with the batch "
        "sketch_grid_quantiles — reads p50/p90/p99 off the converged "
        "histogram. Stream-converged == batch == DuckDB oracle closes "
        "the loop on sketch mergeability: per-hour partial union (batch) "
        "and per-micro-batch state update (stream) are the SAME sketch "
        "algebra. Scale: streaming state is |types| x |bins| counters — "
        "constant per key, unbounded input.",
)
def stream_grid_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = file_stream_source(spark, sf_dir, "events")
    hist = (ev.groupBy(
        F.col("event_type"),
        F.floor(F.col("value") / GQ_WIDTH).cast("long").alias("bin"))
        .agg(F.count("*").alias("cnt")))
    converged = run_stream_to_memory(hist, output_mode="complete")
    return grid_quantiles_finalize(converged)


from flinkapps_spark.operators import sketches as _sk  # noqa: E402
from flinkapps_spark.plans.relational_queries import (  # noqa: E402
    HLL_PORTABLE_ORACLE as _HLL_ORACLE,
)


@query(
    "stream_hll_distinct",
    oracle=_HLL_ORACLE,  # shared verbatim with the batch sketch
    category="streaming: incremental portable HLL (complete)",
    doc="The engine-portable HLL register table maintained INCREMENTALLY "
        "by the streaming state store: each micro-batch folds new rows "
        "into the per-(type, bucket) max-rho registers (complete output "
        "mode = the converged register table), then the finalize step — "
        "shared code with batch sketch_hll_portable, including the "
        "register-merged 'ALL' row — reads the estimate and register "
        "checksum off the converged state.  Stream-converged == batch == "
        "DuckDB oracle: per-micro-batch state fold and batch partial "
        "aggregation are the SAME max-per-bucket sketch algebra, which "
        "is the mergeability property that lets a production pipeline "
        "keep one live sketch per segment and union them on demand.  "
        "Scale: streaming state is m=1024 registers per key — constant "
        "per key, unbounded input.  Exact distinct counts for the "
        "tolerance column are recomputed batch-side (the stream never "
        "needs per-key value sets).",
)
def stream_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flinkapps_spark.sources.batch import load_table
    from flinkapps_spark.plans.relational_queries import (
        hll_portable_report,
    )
    ev = file_stream_source(spark, sf_dir, "events").select(
        F.col("event_type").alias("k"), "user_id")
    regs_stream = _sk.hll_registers(ev, ["k"], "user_id")
    converged = run_stream_to_memory(regs_stream, output_mode="complete")
    ev_b = load_table(spark, sf_dir, "events").select(
        F.col("event_type").alias("k"), "user_id")
    return hll_portable_report(converged, ev_b)


from flinkapps_spark.plans.relational_queries import (  # noqa: E402
    CMS_FREQ_ORACLE as _CMS_ORACLE, CMS_PROBE_MAX_ID,
)


@query(
    "stream_cms_freq",
    oracle=_CMS_ORACLE,  # shared verbatim with the batch sketch
    category="streaming: incremental Count-Min sketch (complete)",
    doc="The Count-Min counter matrix maintained INCREMENTALLY by the "
        "streaming state store: each micro-batch adds its d-cell "
        "increments into the per-(row, bucket) counters (complete "
        "output mode = the converged matrix), probed batch-side with "
        "the same estimate/guarantee code as sketch_cms_freq.  "
        "Stream-converged == batch == oracle — counter addition per "
        "micro-batch IS the CMS merge, the third sketch family (after "
        "grid quantiles and portable HLL) whose state-store fold is "
        "proven identical to the batch partial-agg.  Scale: streaming "
        "state is d×w = 4096 counters total, unbounded input.",
)
def stream_cms_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flinkapps_spark.sources.batch import load_table
    from flinkapps_spark.plans.relational_queries import cms_freq_report
    ev_s = file_stream_source(spark, sf_dir, "events")
    # the incremental fold: per micro-batch, each row's d cell
    # increments add into the state-store counters (cms_cells works on
    # a streaming frame as-is — counter addition IS the CMS merge)
    cells_stream = _sk.cms_cells(ev_s, "user_id")
    cells = run_stream_to_memory(cells_stream, output_mode="complete")
    ev = load_table(spark, sf_dir, "events")
    return cms_freq_report(cells, ev)


@query(
    "stream_stream_left_join",
    oracle="""
        SELECT s.event_id AS signup_id, s.user_id,
               p.event_id AS purchase_id, p.value AS purchase_value
        FROM events s LEFT JOIN events p
          ON p.user_id = s.user_id AND p.event_type = 'purchase'
         AND p.ts >= s.ts AND p.ts <= s.ts + INTERVAL 1 HOUR
        WHERE s.event_type = 'signup'
    """,
    category="streaming: stream-stream LEFT OUTER join",
    doc="Signups LEFT-OUTER-joined to purchases by the same user within "
        "the following hour: the hard part of streaming outer joins is "
        "that an unmatched left row can only be emitted once the "
        "watermark PROVES no match can still arrive — Spark holds it in "
        "state until watermark > signup_ts + interval, then emits it "
        "with nulls.  The replay therefore stages the fixture into a "
        "multi-batch file stream (maxFilesPerTrigger=1) of TIME-"
        "CONTIGUOUS chunks (time_split_replay — event-time order across "
        "batches; row-sliced chunks each spanning the full time range "
        "would advance the watermark past later chunks' early rows and "
        "silently drop them) and appends "
        "far-future sentinel files: sentinel 1 advances the watermark "
        "past every signup's upper bound, sentinel 2 provides the "
        "micro-batch in which the flushed non-matches actually emit "
        "(watermarks update at batch END, so emission happens one batch "
        "later — exactly the production behavior where a quiet stream "
        "withholds tail results until traffic advances the clock).  "
        "Converged output equals the batch LEFT JOIN, nulls included.  "
        "Scale: state keyed by user_id, evicted by watermark; bounded "
        "by the 1-hour range condition.",
)
def stream_stream_left_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    import datetime as _dt
    import os
    import shutil
    import tempfile

    from flinkapps_spark.sources.batch import load_table
    from flinkapps_spark.streaming.jobs import time_split_replay

    batch = load_table(spark, sf_dir, "events")
    max_ts = batch.agg(F.max("ts")).first()[0]

    # time-contiguous chunks: replay order == event-time order, so the
    # watermark only ever moves FORWARD relative to arriving data (a
    # row-sliced multi-file copy each spanning the whole time range
    # dropped later chunks' rows as late — 187997-row diff at sf1)
    cols = ["event_id", "user_id", "event_type", "value", "ts"]
    stream, staged = time_split_replay(spark, sf_dir, "events", cols,
                                       n_chunks=3)
    sent_ts = max_ts + _dt.timedelta(days=10)
    for i in (1, 2, 3):
        # sentinels must survive the event_type filters to reach the
        # withWatermark nodes (a filtered-out row advances nothing): one
        # signup and one purchase row per file, on disjoint negative
        # user ids so they can never join each other or real rows
        rows = [
            (-i, -1, "signup", 0.0, sent_ts),
            (-1000 - i, -2, "purchase", 0.0, sent_ts),
        ]
        sdf = spark.createDataFrame(rows, stream.schema)
        part = tempfile.mkdtemp(prefix=f"lj_sent{i}_")
        sdf.coalesce(1).write.mode("overwrite").parquet(part)
        pf = next(f for f in os.listdir(part) if f.endswith(".parquet"))
        dst = os.path.join(staged, f"zz_sentinel_{i}.parquet")
        shutil.copy(os.path.join(part, pf), dst)
        # mtimes after every chunk's (1_700_000_000 + i): the file
        # source replays by modification time, sentinels come last
        os.utime(dst, (1_700_000_100 + i, 1_700_000_100 + i))
        shutil.rmtree(part, ignore_errors=True)

    s = (stream.filter(F.col("event_type") == "signup")
         .select(F.col("event_id").alias("signup_id"),
                 F.col("user_id").alias("s_user"),
                 F.col("ts").alias("s_ts"))
         .withWatermark("s_ts", "2 hours"))
    p = (stream.filter(F.col("event_type") == "purchase")
         .select(F.col("event_id").alias("purchase_id"),
                 F.col("user_id").alias("p_user"),
                 F.col("value").alias("purchase_value"),
                 F.col("ts").alias("p_ts"))
         .withWatermark("p_ts", "2 hours"))
    joined = s.join(
        p, (F.col("p_user") == F.col("s_user"))
        & (F.col("p_ts") >= F.col("s_ts"))
        & (F.col("p_ts") <= F.col("s_ts") + F.expr("INTERVAL 1 HOUR")),
        "leftOuter")
    out = joined.select("signup_id", F.col("s_user").alias("user_id"),
                        "purchase_id", "purchase_value")
    try:
        converged = run_stream_to_memory(out, output_mode="append")
        # force the memory sink to materialize fully before the staged
        # replay files disappear (the sink table itself is in memory)
        converged = converged.filter(F.col("signup_id") >= 0)
        converged.count()
        return converged
    finally:
        # a sweep re-runs this query many times; leaked staged copies of
        # the fixture would accumulate gigabytes under /tmp
        shutil.rmtree(staged, ignore_errors=True)


@query(
    "stream_join_then_window",
    oracle="""
        WITH mx AS (SELECT max(ts) AS m FROM events)
        SELECT time_bucket(INTERVAL '1 hour', p.ts) AS ws,
               COUNT(*) AS n_attributed
        FROM events p JOIN events s
          ON p.user_id = s.user_id
         AND p.event_type = 'purchase' AND s.event_type = 'signup'
         AND p.ts >= s.ts AND p.ts <= s.ts + INTERVAL 1 HOUR, mx
        GROUP BY 1, mx.m
        HAVING time_bucket(INTERVAL '1 hour', p.ts) + INTERVAL 1 HOUR
               <= m - INTERVAL 3 HOUR
    """,
    category="streaming: chained stateful operators (join → window)",
    doc="TWO stateful operators in one streaming query: the watermarked "
        "stream-stream interval join feeds a tumbling-window count of "
        "attributed purchases per hour, append mode (Spark ≥3.5 "
        "multiple-stateful-operators support; older versions rejected "
        "this pipeline outright).  The subtle semantic the oracle "
        "encodes: the join DELAYS the downstream output watermark by "
        "its event-time interval — a window may only close when no "
        "joined row can still be produced for it, i.e. window_end ≤ "
        "max(ts) − watermark_delay(2h) − join_interval(1h).  Determined "
        "empirically at sf1 (714 windows at the −3h cutoff vs 715 at "
        "−2h; Spark emits 714) and pinned here.  In-flight windows stay "
        "unemitted, exactly as append mode promises.  Scale: join state "
        "evicted by watermark, window state is |windows in flight| — "
        "both bounded; one shuffle per stateful operator.",
)
def stream_join_then_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = file_stream_source(spark, sf_dir, "events")
    p = (ev.filter(F.col("event_type") == "purchase")
         .select(F.col("event_id").alias("purchase_id"),
                 F.col("user_id").alias("p_user"),
                 F.col("ts").alias("p_ts"))
         .withWatermark("p_ts", "2 hours"))
    s = (file_stream_source(spark, sf_dir, "events")
         .filter(F.col("event_type") == "signup")
         .select(F.col("user_id").alias("s_user"),
                 F.col("ts").alias("s_ts"))
         .withWatermark("s_ts", "2 hours"))
    j = p.join(s, (F.col("p_user") == F.col("s_user"))
               & (F.col("p_ts") >= F.col("s_ts"))
               & (F.col("p_ts") <= F.col("s_ts")
                  + F.expr("INTERVAL 1 HOUR")))
    w = (j.groupBy(F.window("p_ts", "1 hour"))
         .agg(F.count("*").alias("n_attributed"))
         .select(F.col("window.start").alias("ws"), "n_attributed"))
    return run_stream_to_memory(w, output_mode="append")


from flinkapps_spark.plans.relational_queries import (  # noqa: E402
    BLOOM_FILTER_ORACLE as _BLOOM_ORACLE,
)


@query(
    "stream_bloom_filter",
    oracle=_BLOOM_ORACLE,  # shared verbatim with the batch sketch
    category="streaming: incremental Bloom filter (complete)",
    doc="The Bloom bit array maintained INCREMENTALLY by the streaming "
        "state store: each micro-batch bit_or's its members' masks into "
        "the per-word counters (complete output mode = the converged "
        "filter), then the same probe/FPR audit as batch "
        "sketch_bloom_filter runs against it — shared report code and "
        "verbatim-shared oracle, the fourth sketch family (after grid "
        "quantiles, HLL, CMS) whose state-store fold is proven "
        "identical to the batch partial-agg.  Scale: streaming state "
        "is <= 4096 words total, unbounded input; bit_or per batch IS "
        "the Bloom merge.",
)
def stream_bloom_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flinkapps_spark.sources.batch import load_table
    from flinkapps_spark.plans.relational_queries import (
        bloom_membership_report,
    )
    ev_s = file_stream_source(spark, sf_dir, "events")
    mem_s = (ev_s.filter(F.col("event_type") == "purchase")
             .select("user_id"))
    filt_stream = _sk.bloom_build(mem_s, "user_id")
    filt = run_stream_to_memory(filt_stream, output_mode="complete")
    ev = load_table(spark, sf_dir, "events")
    mem = (ev.filter(F.col("event_type") == "purchase")
           .select("user_id").distinct())
    return bloom_membership_report(filt, mem)


# ---------------------------------------------------------------------------
# stream_attribution — stateful last-touch attribution across micro-batches
# ---------------------------------------------------------------------------


@query(
    "stream_attribution",
    # the streaming operator answers the SAME question as the batch window
    # query, minus the ts column the stream doesn't re-emit — the oracle IS
    # the batch query's oracle (shared constant, cannot drift)
    oracle=("SELECT event_id, user_id, touch_type, delay_us "
            f"FROM ({ATTRIBUTION_ORACLE})"),
    category="streaming: stateful last-touch attribution",
    doc="Last-touch attribution as a CUSTOM STATEFUL STREAMING OPERATOR "
        "(applyInPandasWithState keyed by user_id): per-user state holds "
        "only (last_touch_us, last_touch_type) — O(1) per user, no event "
        "buffer — and every purchase is attributed in the micro-batch it "
        "arrives in. The replay stages the fixture into THREE "
        "time-contiguous files (maxFilesPerTrigger=1, mtimes ordered), "
        "so attribution across a batch boundary genuinely exercises the "
        "carried state: a touch in batch 1 credits a purchase in batch "
        "2. Within a batch, rows are sorted by the same (ts, event_id) "
        "total order as the batch window query. Converged output equals "
        "the batch events_attribution — the oracle IS that query's "
        "oracle (shared constant, cannot drift). Scale: state is two "
        "scalars per user; batches stream through Arrow; nothing is "
        "collected to the driver.",
)
def stream_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil

    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from flinkapps_spark.plans.relational_queries import (
        ATTR_TOUCH_TYPES, ATTR_WINDOW_US,
    )
    from flinkapps_spark.streaming.jobs import time_split_replay

    stream, staged = time_split_replay(
        spark, sf_dir, "events",
        ["event_id", "user_id", "ts", "event_type"])
    try:
        out_schema = ("event_id bigint, user_id bigint, "
                      "touch_type string, delay_us bigint")
        state_schema = "last_us bigint, last_ty string"
        touch_set = set(ATTR_TOUCH_TYPES)
        win_us = ATTR_WINDOW_US

        def update(key, pdfs, state: GroupState):
            import numpy as np
            last_us, last_ty = (state.get if state.exists
                                else (None, None))
            # a group straddling Arrow chunk boundaries arrives as MULTIPLE
            # pdfs whose internal order is arbitrary (the state shuffle
            # sorts by key only) — concatenate, then sort ONCE; per-chunk
            # sorting silently mis-orders exactly the straddling groups
            # (measured: 216 wrong attributions at sf1). Per-user event
            # counts are bounded, so materializing the group is safe.
            batch = [p for p in pdfs if len(p)]
            if batch:
                pdf = pd.concat(batch, ignore_index=True) \
                    .sort_values(["ts", "event_id"])
                ts = pd.to_datetime(pdf["ts"])
                if ts.dt.tz is not None:
                    ts = ts.dt.tz_localize(None)
                row_us = ts.astype("datetime64[ns]").astype("int64") // 1000
                out_ids, out_ty, out_delay = [], [], []
                for eid, ety, t_us in zip(pdf["event_id"], pdf["event_type"],
                                          row_us):
                    if ety == "purchase":
                        if (last_us is not None
                                and t_us - last_us <= win_us):
                            out_ids.append(eid)
                            out_ty.append(last_ty)
                            out_delay.append(t_us - last_us)
                        else:
                            out_ids.append(eid)
                            out_ty.append("direct")
                            out_delay.append(None)
                    elif ety in touch_set:
                        last_us, last_ty = int(t_us), ety
                if out_ids:
                    yield pd.DataFrame({
                        "event_id": np.asarray(out_ids, dtype="int64"),
                        "user_id": np.full(len(out_ids), key[0],
                                           dtype="int64"),
                        "touch_type": out_ty,
                        "delay_us": pd.array(out_delay, dtype="Int64")})
            state.update((last_us, last_ty))

        attributed = stream.groupBy("user_id").applyInPandasWithState(
            update, outputStructType=out_schema,
            stateStructType=state_schema, outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout)
        converged = run_stream_to_memory(attributed, output_mode="append")
        converged.count()   # materialize before the staged files vanish
        return converged
    finally:
        shutil.rmtree(staged, ignore_errors=True)


# ---------------------------------------------------------------------------
# stream_cep_sequence — stateful 3-step CEP pattern across micro-batches
# ---------------------------------------------------------------------------


@query(
    "stream_cep_sequence",
    # identical question to the batch stacked-window query — the oracle IS
    # that query's oracle (shared constant, cannot drift)
    oracle=CEP_ORACLE,
    category="streaming: stateful CEP sequence (view->click->purchase)",
    doc="The 3-step strict-order CEP pattern (view -> click within 6 h -> "
        "purchase within 6 h) as a STATEFUL STREAMING OPERATOR — the "
        "FlinkCEP Pattern.begin/followedBy/within shape the reference's "
        "ecosystem delegates to FlinkCEP, here as applyInPandasWithState "
        "with O(1) per-user state: (last_view_us, last_qualified_click_us, "
        "first_match_us, n_matches). A click qualifies iff a view "
        "precedes it strictly within the step window AT THE TIME IT "
        "ARRIVES (later views cannot re-qualify it — exactly the frame "
        "semantics of the batch query's stacked range windows); a "
        "purchase matches iff a qualified click precedes it strictly "
        "within the window. Replayed as three time-contiguous "
        "micro-batches so sequences SPANNING batch boundaries match "
        "through carried state. Update-mode emission per batch; the "
        "converged per-user (first_match_ts, n_matches) equals the "
        "batch events_cep_sequence. Scale: four scalars of state per "
        "user, Arrow-batched, nothing on the driver; the per-key walk "
        "is a vectorized numpy scan (VERDICT r8 #2 — the per-event "
        "Python loop was the worst streaming number at sf10), with the "
        "ts→µs and event-type→bitcode conversions pushed into JVM "
        "expressions BEFORE the stateful operator so the UDF touches "
        "only int64 arrays.",
)
def stream_cep_sequence(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil

    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from flinkapps_spark.plans.relational_queries import CEP_STEP_US
    from flinkapps_spark.streaming.jobs import time_split_replay

    stream, staged = time_split_replay(
        spark, sf_dir, "events",
        ["event_id", "user_id", "ts", "event_type"])
    try:
        out_schema = ("user_id bigint, first_match_ts timestamp, "
                      "n_matches bigint")
        state_schema = ("last_view bigint, last_qclick bigint, "
                        "first_us bigint, n bigint")
        step_us = CEP_STEP_US

        # JVM-side prep: µs epoch + type bitcode (view=1, click=2,
        # purchase=4; other types carry no CEP role and code to 0) — the
        # stateful UDF then never parses a timestamp or compares a string
        ev = stream.select(
            "user_id",
            F.unix_micros("ts").alias("us"),
            F.when(F.col("event_type") == "view", 1)
             .when(F.col("event_type") == "click", 2)
             .when(F.col("event_type") == "purchase", 4)
             .otherwise(0).alias("tcode"))

        NEG = -(1 << 62)  # "no view/qclick yet" sentinel (None in state)

        def update(key, pdfs, state: GroupState):
            import numpy as np
            last_view, last_qclick, first_us, n = (
                state.get if state.exists else (None, None, None, 0))
            chunks = [p for p in pdfs if len(p)]
            if chunks:
                us = np.concatenate(
                    [c["us"].to_numpy(np.int64) for c in chunks])
                tc = np.concatenate(
                    [c["tcode"].to_numpy(np.int64) for c in chunks])
                # aggregate per DISTINCT microsecond, not per row: the
                # batch query's RANGE frames include same-us peers, so a
                # view at the same us as a click MASKS the click's
                # qualification (strict '<' fails) and a qualified click
                # at the same us as a purchase masks the purchase.
                # Same-us rows can never split across replay chunks (the
                # splitter cuts on us), so every tie is visible here.
                uu, inv = np.unique(us, return_inverse=True)
                flags = np.zeros(len(uu), dtype=np.int64)
                np.bitwise_or.at(flags, inv, tc & 3)
                n_purch = np.bincount(
                    inv, weights=(tc == 4), minlength=len(uu)) \
                    .astype(np.int64)
                has_view = (flags & 1) > 0
                has_click = (flags & 2) > 0
                # most recent view STRICTLY before each distinct us =
                # shifted cumulative max, seeded with the carried state
                # (time-contiguous replay: all prior-batch us < this
                # batch's min, so strictness holds across batches too)
                pv = int(last_view) if last_view is not None else NEG
                cm = np.maximum.accumulate(np.where(has_view, uu, NEG))
                prev_view = np.empty(len(uu), dtype=np.int64)
                prev_view[0] = pv
                if len(uu) > 1:
                    np.maximum(pv, cm[:-1], out=prev_view[1:])
                # a click qualifies iff a view precedes it strictly
                # within the window AT ARRIVAL TIME (later views cannot
                # re-qualify it) and no view shares its microsecond
                qclick = has_click & ~has_view & (uu <= prev_view + step_us)
                pq = int(last_qclick) if last_qclick is not None else NEG
                cq = np.maximum.accumulate(np.where(qclick, uu, NEG))
                prev_qc = np.empty(len(uu), dtype=np.int64)
                prev_qc[0] = pq
                if len(uu) > 1:
                    np.maximum(pq, cq[:-1], out=prev_qc[1:])
                match = (n_purch > 0) & ~qclick & (uu <= prev_qc + step_us)
                add = int(n_purch[match].sum())
                if add:
                    if first_us is None:
                        first_us = int(uu[match][0])
                    n += add
                if cm[-1] > NEG:
                    last_view = int(cm[-1])
                if cq[-1] > NEG:
                    last_qclick = int(cq[-1])
            state.update((last_view, last_qclick, first_us, n))
            if n > 0:
                yield pd.DataFrame({
                    "user_id": [key[0]],
                    "first_match_ts": [pd.Timestamp(first_us, unit="us")],
                    "n_matches": [n]})

        matched = ev.groupBy("user_id").applyInPandasWithState(
            update, outputStructType=out_schema,
            stateStructType=state_schema, outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout)
        mem = run_stream_to_memory(matched, output_mode="update")
        # update mode re-emits a key's running totals each batch it
        # changes in; the converged answer is the LAST emission per key
        from pyspark.sql import Window
        w = Window.partitionBy("user_id").orderBy(
            F.monotonically_increasing_id().desc())
        converged = (mem.withColumn("_rn", F.row_number().over(w))
                     .filter(F.col("_rn") == 1).drop("_rn"))
        converged.count()   # materialize before the staged files vanish
        return converged
    finally:
        shutil.rmtree(staged, ignore_errors=True)


# ---------------------------------------------------------------------------
# stream_dynamic_rules — per-micro-batch rule updates (broadcast-state idiom)
# ---------------------------------------------------------------------------

# rule thresholds: base per event type, tightened by 15 per rules version
RULES_BASE = {"click": 30, "view": 40, "purchase": 60,
              "signup": 20, "error": 80}
RULES_STEP = 15

_RULES_VALUES = ", ".join(
    f"({v}, '{t}', {base + RULES_STEP * v})"
    for v in range(3) for t, base in sorted(RULES_BASE.items()))


@query(
    "stream_dynamic_rules",
    oracle=f"""
        WITH b AS (SELECT MIN(epoch_us(ts)) AS lo, MAX(epoch_us(ts)) AS hi
                   FROM events),
        v AS (SELECT e.*,
                     CASE WHEN epoch_us(ts) < lo + (hi - lo) * 1 // 3 THEN 0
                          WHEN epoch_us(ts) < lo + (hi - lo) * 2 // 3 THEN 1
                          ELSE 2 END AS rule_version
              FROM events e, b),
        r AS (SELECT * FROM (VALUES {_RULES_VALUES})
              AS t(rv, rtype, threshold))
        SELECT event_id, user_id, event_type, value, rule_version
        FROM v JOIN r ON r.rv = v.rule_version AND r.rtype = v.event_type
        WHERE v.value >= r.threshold
    """,
    category="streaming: dynamic rules (broadcast-state idiom)",
    doc="Dynamic rule evaluation — Flink's broadcast-state pattern "
        "(a control stream updates rules that every event sees) in its "
        "Spark translation: foreachBatch resolves the CURRENT rule set "
        "per micro-batch and broadcast-joins it to the batch — rules "
        "change BETWEEN batches without restarting the query, which is "
        "exactly the operational contract broadcast state gives Flink. "
        "The replay feeds three time-contiguous micro-batches; rules "
        "version i applies to batch i, so the oracle reproduces the "
        "version assignment from the same integer epoch arithmetic the "
        "splitter uses and joins the identical VALUES rule table. "
        "Scale: the rules table broadcasts (it is tiny by nature); the "
        "event stream is map-side only — no shuffle at all per batch.",
)
def stream_dynamic_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from flinkapps_spark.streaming.jobs import time_split_replay

    stream, staged = time_split_replay(
        spark, sf_dir, "events",
        ["event_id", "user_id", "ts", "event_type", "value"])
    out_dir = tempfile.mkdtemp(prefix="rules_out_")
    ckpt = tempfile.mkdtemp(prefix="rules_ckpt_")
    try:
        def handle(batch_df, batch_id):
            v = min(int(batch_id), 2)
            rules = spark.createDataFrame(
                [(v, t, RULES_BASE[t] + RULES_STEP * v)
                 for t in sorted(RULES_BASE)],
                "rv int, rtype string, threshold int")
            out = (batch_df.join(
                F.broadcast(rules),
                (batch_df.event_type == rules.rtype)
                & (batch_df.value >= rules.threshold))
                .select("event_id", "user_id", "event_type", "value",
                        F.col("rv").cast("int").alias("rule_version")))
            out.write.mode("append").parquet(out_dir)

        q = (stream.writeStream.foreachBatch(handle)
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination()
        # materialize on the driver before the temp output dir is removed
        # (the memory sink would hold the same rows on the driver anyway)
        res = spark.read.parquet(out_dir)
        rows = res.collect()
        return spark.createDataFrame(rows, res.schema)
    finally:
        shutil.rmtree(staged, ignore_errors=True)
        shutil.rmtree(out_dir, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)


# ---------------------------------------------------------------------------
# stream_zscore_alerts — stateful running-moments anomaly flags
# ---------------------------------------------------------------------------

ZS_MIN_N = 30         # warm-up: alerts only after this many prior samples
ZS_K2 = 9             # threshold z² (3 sigma), integer


@query(
    "stream_zscore_alerts",
    oracle=f"""
        WITH u AS (
            SELECT event_id, event_type, ts,
                   CAST(CASE WHEN value * 100 >= 0
                        THEN floor(value * 100 + 0.5)
                        ELSE ceil(value * 100 - 0.5) END AS BIGINT) AS xu
            FROM events),
        w AS (
            SELECT event_id, event_type, xu,
                   COUNT(*) OVER win AS n,
                   CAST(COALESCE(SUM(xu) OVER win, 0) AS HUGEINT) AS s1,
                   CAST(COALESCE(SUM(xu * xu) OVER win, 0) AS HUGEINT) AS s2
            FROM u
            WINDOW win AS (PARTITION BY event_type ORDER BY ts, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND 1 PRECEDING))
        SELECT event_id, event_type, n AS n_prior
        FROM w
        WHERE n >= {ZS_MIN_N}
          AND (CAST(n AS HUGEINT) * xu - s1)
              * (CAST(n AS HUGEINT) * xu - s1)
              > {ZS_K2} * (CAST(n AS HUGEINT) * s2 - s1 * s1)
    """,
    category="streaming: stateful z-score anomaly alerts",
    doc="Streaming anomaly detection as a CUSTOM STATEFUL OPERATOR "
        "(applyInPandasWithState keyed by event_type): state is the "
        "running moment triple (n, Σxu, Σxu²) over PRIOR events only — "
        "O(1) per key — and an event alerts when its z-score against "
        "the prior distribution exceeds 3σ after a 30-sample warm-up. "
        "The test is EXACT: cross-multiplied to (n·x−S)² > 9(nQ−S²) in "
        "arbitrary-precision Python ints (the squared terms exceed "
        "int64), matched by a HUGEINT window oracle — no float "
        "boundary anywhere, so batch and stream agree bit-for-bit. "
        "Replay stages three time-contiguous files so moments genuinely "
        "carry across micro-batches (chunk cuts are on event time: "
        "same-timestamp rows never straddle a batch, and within-batch "
        "rows are sorted by the oracle's exact (ts, event_id) order). "
        "Scale: three scalars of state per key; Arrow-batched; nothing "
        "collected to the driver. The same moments are the mergeable "
        "partial-agg form of variance, so the operator doubles as the "
        "incremental feed of stats_corr_regression's moment table.",
)
def stream_zscore_alerts(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil

    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from flinkapps_spark.streaming.jobs import time_split_replay

    stream, staged = time_split_replay(
        spark, sf_dir, "events",
        ["event_id", "event_type", "ts", "value"])
    try:
        out_schema = "event_id bigint, event_type string, n_prior bigint"
        state_schema = "n bigint, s1 bigint, s2m bigint, s2r bigint"
        # s2 can exceed int64 at extreme scale; state splits it as
        # s2 = s2m * 2^62 + s2r so the stored pieces stay in bigint.
        chunk = 1 << 62

        def update(key, pdfs, state: GroupState):
            import numpy as np
            if state.exists:
                n, s1, s2m, s2r = state.get
                s2 = int(s2m) * chunk + int(s2r)
                n, s1 = int(n), int(s1)
            else:
                n, s1, s2 = 0, 0, 0
            batch = [p for p in pdfs if len(p)]
            if batch:
                pdf = pd.concat(batch, ignore_index=True) \
                    .sort_values(["ts", "event_id"])
                v = pdf["value"].to_numpy(dtype="float64") * 100.0
                xu = np.where(v >= 0, np.floor(v + 0.5),
                              np.ceil(v - 0.5)).astype("int64")
                out_ids, out_n = [], []
                for eid, x in zip(pdf["event_id"], xu):
                    x = int(x)
                    if n >= ZS_MIN_N:
                        lhs = (n * x - s1) ** 2
                        rhs = ZS_K2 * (n * s2 - s1 * s1)
                        if lhs > rhs:
                            out_ids.append(int(eid))
                            out_n.append(n)
                    n += 1
                    s1 += x
                    s2 += x * x
                if out_ids:
                    yield pd.DataFrame({
                        "event_id": np.asarray(out_ids, dtype="int64"),
                        "event_type": [key[0]] * len(out_ids),
                        "n_prior": np.asarray(out_n, dtype="int64")})
            state.update((n, s1, s2 // chunk, s2 % chunk))

        alerts = stream.groupBy("event_type").applyInPandasWithState(
            update, outputStructType=out_schema,
            stateStructType=state_schema, outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout)
        converged = run_stream_to_memory(alerts, output_mode="append")
        converged.count()   # materialize before the staged files vanish
        return converged
    finally:
        shutil.rmtree(staged, ignore_errors=True)


@query(
    "stream_rate_limited_counts",
    oracle="""
        SELECT event_type, COUNT(*) AS n FROM events GROUP BY event_type
    """,
    category="streaming: rate-controlled backfill (T6 backpressure)",
    doc="Backfill under admission control (VERDICT r5 #6): the events "
        "table replays as 4 row-range files through maxFilesPerTrigger=1 "
        "(streaming/jobs.multifile_replay), so the availableNow backfill "
        "executes as >= 3 data micro-batches instead of swallowing the "
        "whole backlog in one — the build FAILS LOUDLY if fewer batches "
        "ran, so the driver check pins the batch structure, and the "
        "converged complete-mode counts must equal the batch GROUP BY "
        "(the oracle): throttling changes batch boundaries, never "
        "results. This is the knob that keeps first-deploy state sizes "
        "and shuffle spills bounded when a 100 TB topic backlog hits a "
        "new streaming job; at cluster scale the same option rides on "
        "the Kafka source as maxOffsetsPerTrigger.",
)
def stream_rate_limited_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil

    from flinkapps_spark.streaming.jobs import (
        multifile_replay, run_stream_to_memory,
    )

    stream, staged, n_files = multifile_replay(
        spark, sf_dir, "events", columns=["event_id", "event_type"],
        n_files=4, max_files_per_trigger=1)
    try:
        progress: list = []
        got = run_stream_to_memory(
            stream.groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n")),
            output_mode="complete", progress_sink=progress)
        got.count()      # materialize before the staged files vanish
        data_batches = sum(1 for p in progress
                           if p.get("numInputRows", 0) > 0)
        if data_batches < 3:
            raise RuntimeError(
                f"rate control did not split the backfill: "
                f"{data_batches} data batches over {n_files} files")
        return got
    finally:
        shutil.rmtree(staged, ignore_errors=True)
