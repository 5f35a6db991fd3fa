"""Structured Streaming spine (SURVEY §2.1 S1-S3, §2.6 T1-T5).

The reference's streaming jobs are Kafka/socket → parse → transform → sink
with checkpointing and update-mode changelog output.  Spark equivalents:

- sources: ``readStream.format("kafka"/"socket")`` builders below; a
  file-replay source substitutes for Kafka in this container (no broker, no
  spark-sql-kafka jar) — same DataFrame downstream, swap the source config
  in production.
- checkpointing (T1): ``option("checkpointLocation", ...)`` per query —
  Spark checkpoints offsets + state; exactly-once internal state.
- changelog/update output (T4): ``outputMode("update")`` emits changed
  aggregate rows per micro-batch (Flink emits -U/+U retract pairs; same
  converged state, different wire format — SURVEY §7.5.3).
- batch≡stream (T3): every transform here is a plain DataFrame function
  usable under ``spark.read`` or ``spark.readStream`` unchanged.
"""

from __future__ import annotations

import os
import tempfile
import uuid
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from flinkapps_spark.session import tune_session
from flinkapps_spark.sources.batch import load_table

# recentProgress buffer size used while a caller collects progress_sink;
# well above any replay the tests (or a plausible local backfill) produce.
_PROGRESS_RETENTION = 10_000


def socket_source(spark: SparkSession, host: str = "localhost",
                  port: int = 9999) -> DataFrame:
    """S1: unbounded lines from a TCP socket
    (reference source/flinkStarter.scala:12)."""
    return (spark.readStream.format("socket")
            .option("host", host).option("port", port).load())


# The record schema Spark's Kafka source emits (Structured Streaming +
# Kafka Integration Guide) — the fixed wire contract the projection in
# kafka_source must accept; the contract test feeds an empty frame of
# exactly this shape through the builder.
KAFKA_SOURCE_WIRE_SCHEMA = (
    "key binary, value binary, topic string, partition int, offset long, "
    "timestamp timestamp, timestampType int")


def kafka_source_options(brokers: str, topic: str,
                         starting_offsets: str = "latest") -> dict[str, str]:
    """The exact option dict handed to ``readStream.format('kafka')`` —
    names are the documented Spark Kafka source options (a typo here
    surfaces only at cluster runtime, hence the pinned contract test)."""
    return {
        "kafka.bootstrap.servers": brokers,
        "subscribe": topic,
        "startingOffsets": starting_offsets,
    }


def kafka_source(spark: SparkSession, brokers: str, topic: str,
                 starting_offsets: str = "latest") -> DataFrame:
    """S2/S3: Kafka topic as value-only strings
    (reference source/flinkStreamProcessing.scala:93-103).

    Requires the spark-sql-kafka connector jar on the cluster; not
    available in this container — the option dict and the projection over
    the documented source schema are pinned by the contract test.
    """
    raw = (spark.readStream.format("kafka")
           .options(**kafka_source_options(brokers, topic, starting_offsets))
           .load())
    return raw.selectExpr("CAST(value AS STRING) AS value")


def file_stream_source(spark: SparkSession, sf_dir: str, table: str,
                       max_files_per_trigger: int | None = None,
                       max_bytes_per_trigger: int | None = None
                       ) -> DataFrame:
    """File-replay stream over a fixture table: the deterministic stand-in
    for Kafka replay (same rows as the batch table, delivered as a stream).

    Rate control (VERDICT r5 #6 — the backpressure surface a 100 TB
    stream needs; without it the first micro-batch swallows the whole
    backlog and the query sizes its state/shuffles for the worst case):

    - ``max_files_per_trigger``: passed straight through as the file
      source's ``maxFilesPerTrigger`` — each micro-batch admits at most
      this many files (also honored by availableNow backfills, which is
      what makes the multi-batch replay tests deterministic).
    - ``max_bytes_per_trigger``: Spark's OSS file source has no byte
      knob (that is a Delta source option), so this is translated
      honestly: the target dir's file sizes are listed once and the
      byte budget becomes ``floor(budget / max_file_size)`` files
      (min 1 file) — admitted bytes per batch never exceed the budget
      by more than one file, the same guarantee Delta documents.
      Ignored when ``max_files_per_trigger`` is set explicitly.
    """
    tune_session(spark)
    batch = load_table(spark, sf_dir, table)
    # readStream needs an explicit schema; reuse the *raw* parquet schema
    # (pre ns→µs conversion) then re-apply the conversion.
    raw_schema = spark.read.parquet(
        os.path.join(sf_dir, f"{table}.parquet")).schema
    reader = spark.readStream.schema(raw_schema)
    if max_files_per_trigger is None and max_bytes_per_trigger is not None:
        import glob as _glob
        target = os.path.join(sf_dir, f"{table}*.parquet")
        matched = _glob.glob(target)
        # a multi-file fixture is a {table}.parquet/ DIRECTORY of parts —
        # size the budget on the leaf files, not the (skipped) dir entry
        leaves = [p for p in matched if os.path.isfile(p)] + [
            q for p in matched if os.path.isdir(p)
            for q in _glob.glob(os.path.join(p, "*.parquet"))]
        sizes = [os.path.getsize(p) for p in leaves] or [1]
        max_files_per_trigger = max(
            1, int(max_bytes_per_trigger) // max(max(sizes), 1))
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger",
                               int(max_files_per_trigger))
    # glob form: the file source requires a directory basePath; a glob over
    # the fixture dir scopes it to this one table's file
    stream = reader.parquet(os.path.join(sf_dir, f"{table}*.parquet"))
    from flinkapps_spark.schemas import NANOS_TS_COLUMNS
    from flinkapps_spark.sources.batch import normalize_ntz
    from pyspark.sql import functions as F
    for col in NANOS_TS_COLUMNS.get(table, []):
        if dict(stream.dtypes).get(col) == "bigint":
            stream = stream.withColumn(
                col, F.expr(f"timestamp_micros(`{col}` div 1000)"))
    # TIMESTAMP_NTZ → TIMESTAMP: withWatermark requires TIMESTAMP proper;
    # value-preserving under the pinned-UTC session (see normalize_ntz).
    return normalize_ntz(stream)


def run_stream_to_memory(transformed: DataFrame, *, output_mode: str,
                         name: str | None = None,
                         progress_sink: list | None = None) -> DataFrame:
    """Execute a streaming DataFrame to completion (availableNow trigger →
    processes all available input, then stops) into a memory sink; returns
    the sink contents as a batch DataFrame.

    This is the harness for batch≡stream equivalence: the returned frame is
    comparable against the batch plan / SQL oracle.  availableNow honors
    the source's rate-control options (maxFilesPerTrigger), so a throttled
    backfill really executes as multiple micro-batches; pass
    ``progress_sink`` (a list) to receive the per-batch progress dicts and
    assert on batch structure.

    ``recentProgress`` retains only the most recent
    ``spark.sql.streaming.numRecentProgressUpdates`` entries (default
    ~100), which would silently undercount micro-batches on a long
    backfill — so when ``progress_sink`` is requested the retention is
    raised to ``_PROGRESS_RETENTION`` for the duration of the query
    (restored after), making batch-structure assertions reliable up to
    that many micro-batches.
    """
    spark = transformed.sparkSession
    qname = name or f"mem_{uuid.uuid4().hex[:12]}"
    ckpt = tempfile.mkdtemp(prefix=f"ckpt_{qname}_")
    retention_key = "spark.sql.streaming.numRecentProgressUpdates"
    # capture with an explicit None default (ADVICE r7): single-arg get
    # returns the REGISTERED DEFAULT for this key, so restoring that
    # value in the finally would pin a session override that was never
    # set; None → unset restores the true prior state
    prior_retention = (spark.conf.get(retention_key, None)
                       if progress_sink is not None else None)
    if progress_sink is not None:
        spark.conf.set(retention_key, str(_PROGRESS_RETENTION))
    try:
        q = (transformed.writeStream
             .format("memory")
             .queryName(qname)
             .outputMode(output_mode)
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True)
             .start())
        q.awaitTermination()
        if progress_sink is not None:
            progress_sink.extend(q.recentProgress)
    finally:
        if progress_sink is not None:
            if prior_retention is None:
                spark.conf.unset(retention_key)
            else:
                spark.conf.set(retention_key, prior_retention)
    return spark.table(qname)


def time_split_replay(spark: SparkSession, sf_dir: str, table: str,
                      columns, n_chunks: int = 3,
                      ts_col: str = "ts", df: DataFrame | None = None,
                      cuts: list[int] | None = None):
    """Stage a fixture table as ``n_chunks`` TIME-CONTIGUOUS parquet files
    and open them as a ``maxFilesPerTrigger=1`` file stream: a
    deterministic multi-micro-batch replay in event-time order, so
    stateful operators genuinely exercise cross-batch state carry (a
    single-file availableNow replay collapses to one batch and proves
    nothing about state).  File order is pinned twice — lexicographic
    names AND ascending mtimes (the file source sorts by modification
    time).  Returns ``(stream_df, staged_dir)``; the caller removes
    ``staged_dir`` after the sink is materialized.

    ``df`` replays an arbitrary DataFrame instead of a fixture table
    (``sf_dir``/``table``/``columns`` ignored); ``cuts`` pins explicit µs
    cut points instead of the equal-width default — both exist so the
    layout property tests can fuzz the staging over synthetic frames and
    adversarial boundaries (the round-8 left-join bug was a LAYOUT bug:
    row-sliced chunks each spanning the full time range advanced the
    watermark past later chunks' rows).
    """
    import shutil
    import tempfile

    from flinkapps_spark.sources.batch import load_table
    from pyspark.sql import functions as F

    if df is None:
        df = load_table(spark, sf_dir, table).select(*columns)
    us = F.unix_micros(ts_col)
    lo, hi = df.agg(F.min(us), F.max(us)).first()
    if cuts is None:
        cuts = [lo + (hi - lo) * i // n_chunks for i in range(1, n_chunks)]
    else:
        cuts = sorted(int(c) for c in cuts)
        n_chunks = len(cuts) + 1
    staged = tempfile.mkdtemp(prefix=f"replay_{table or 'df'}_")
    # ONE staging pass (round-9, guide §1.2: the per-chunk filter+write
    # loop re-scanned the source once PER CHUNK — 1 + n_chunks corpus
    # passes per replay query): assign each row its chunk id, hash-
    # repartition BY the id (equal ids never split across tasks, so each
    # partition dir below holds exactly one file; a hash collision only
    # co-locates two chunks in one task), sort within the task by event
    # time (the shuffle's fetch order is not run-deterministic — the
    # sort pins file contents; time-ordered rows within a chunk), and
    # write all chunks in one partitioned job.  The staged layout is
    # byte-compatible with the old loop: same names, same pinned mtimes,
    # and EMPTY chunks still stage a zero-row file (an empty micro-batch
    # is part of the replay semantics the layout fuzz tests pin).
    chunk_id = F.lit(0)
    for c in cuts:
        chunk_id = chunk_id + (us >= F.lit(c)).cast("int")
    part = tempfile.mkdtemp(prefix="replay_chunks_")
    (df.withColumn("__chunk", chunk_id)
       .repartition(n_chunks, "__chunk")
       .sortWithinPartitions(us)
       .write.mode("overwrite").partitionBy("__chunk").parquet(part))
    empty = None
    for i in range(n_chunks):
        d = os.path.join(part, f"__chunk={i}")
        pfs = ([f for f in os.listdir(d) if f.endswith(".parquet")]
               if os.path.isdir(d) else [])
        if len(pfs) > 1:  # impossible per the repartition argument above
            raise AssertionError(f"chunk {i} staged as {len(pfs)} files")
        dst = os.path.join(staged, f"{i:02d}_chunk.parquet")
        if pfs:
            shutil.copy(os.path.join(d, pfs[0]), dst)
        else:
            if empty is None:  # no row fell in this chunk: 0-row file
                ep = tempfile.mkdtemp(prefix="replay_empty_")
                spark.createDataFrame([], df.schema) \
                    .coalesce(1).write.mode("overwrite").parquet(ep)
                empty = os.path.join(ep, next(
                    f for f in os.listdir(ep) if f.endswith(".parquet")))
            shutil.copy(empty, dst)
        os.utime(dst, (1_700_000_000 + i, 1_700_000_000 + i))
    shutil.rmtree(part, ignore_errors=True)
    if empty is not None:
        shutil.rmtree(os.path.dirname(empty), ignore_errors=True)
    stream = (spark.readStream.schema(df.schema)
              .option("maxFilesPerTrigger", 1)
              .parquet(os.path.join(staged, "*.parquet")))
    return stream, staged


def multifile_replay(spark: SparkSession, sf_dir: str, table: str,
                     columns=None, n_files: int = 4,
                     max_files_per_trigger: int = 1):
    """Stage a fixture table as ``n_files`` parquet files and open them as
    a rate-limited file stream (``maxFilesPerTrigger``) — the generic
    multi-micro-batch replay for tables WITHOUT a time axis (the
    time-ordered variant is time_split_replay).  Files are row-range
    splits on the first column (repartitionByRange), names and mtimes
    pinned so the source's modification-time ordering is deterministic.
    Returns ``(stream_df, staged_dir, n_files)``; the caller removes
    ``staged_dir`` after the sink is materialized.
    """
    import shutil

    from pyspark.sql import functions as F

    df = load_table(spark, sf_dir, table)
    if columns is not None:
        df = df.select(*columns)
    key = df.columns[0]
    staged = tempfile.mkdtemp(prefix=f"replay_{table}_")
    part = tempfile.mkdtemp(prefix=f"replay_rows_{table}_")
    (df.repartitionByRange(n_files, F.col(key))
     .write.mode("overwrite").parquet(part))
    files = sorted(f for f in os.listdir(part) if f.endswith(".parquet"))
    for i, f in enumerate(files):
        dst = os.path.join(staged, f"{i:02d}_chunk.parquet")
        shutil.copy(os.path.join(part, f), dst)
        os.utime(dst, (1_700_000_000 + i, 1_700_000_000 + i))
    shutil.rmtree(part, ignore_errors=True)
    stream = (spark.readStream.schema(df.schema)
              .option("maxFilesPerTrigger", max_files_per_trigger)
              .parquet(os.path.join(staged, "*.parquet")))
    return stream, staged, len(files)
