"""File sinks (SURVEY §2.4 K3-K5): console/text/csv/parquet writes and the
rolling-file emulation of Flink's StreamingFileSink.

Flink's rolling sink (reference source/flinkContinuousProcessingRollover.scala:165-194)
buckets output into hourly folders (`yyyy-MM-dd--HH` DateTimeBucketAssigner)
and rolls part files on time/size.  Spark-first mapping:

- bucket folders → ``partitionBy`` on a derived date-hour column (Catalyst
  prunes these partitions on read-back — better than opaque folder names);
- time-based rolling → the micro-batch trigger interval (one file set per
  micro-batch per partition);
- size-based rolling → ``maxRecordsPerFile``.

Scale: partition count = distinct bucket values × parallelism; for 100 TB
pick bucket granularity so files land in the 100 MB-1 GB parquet sweet spot
and let AQE coalesce small shuffle partitions before the write.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

BUCKET_PATTERN = "yyyy-MM-dd--HH"  # reference's DateTimeBucketAssigner format


def with_time_bucket(df: DataFrame, ts_col: str | None = None,
                     bucket_col: str = "date_hour") -> DataFrame:
    """Derive the reference's hourly bucket column (event-time when a
    timestamp column is given, else processing time)."""
    ts = F.col(ts_col) if ts_col else F.current_timestamp()
    return df.withColumn(bucket_col, F.date_format(ts, BUCKET_PATTERN))


def write_rolling_text(df: DataFrame, path: str, *, ts_col: str | None = None,
                       max_records_per_file: int = 100_000,
                       fmt: str = "csv") -> None:
    """Batch write with hourly bucket folders + size-capped part files
    (K3 emulation; K4 plain text = fmt='text' without partitioning)."""
    bucketed = with_time_bucket(df, ts_col)
    (bucketed.write
     .option("maxRecordsPerFile", max_records_per_file)
     .partitionBy("date_hour")
     .mode("overwrite")
     .format(fmt)
     .save(path))


def write_stream_rolling(df: DataFrame, path: str, checkpoint: str, *,
                         ts_col: str | None = None,
                         trigger_interval: str = "15 minutes",
                         max_records_per_file: int = 100_000,
                         fmt: str = "csv"):
    """Streaming variant: trigger interval plays the rolling-policy role
    (reference DefaultRollingPolicy 15 min rollover)."""
    bucketed = with_time_bucket(df, ts_col)
    return (bucketed.writeStream
            .format(fmt)
            .option("path", path)
            .option("checkpointLocation", checkpoint)
            .option("maxRecordsPerFile", max_records_per_file)
            .partitionBy("date_hour")
            .trigger(processingTime=trigger_interval)
            .start())


def write_overwrite_text(df: DataFrame, path: str, single_file: bool = True) -> None:
    """K4: writeAsText(path, OVERWRITE).setParallelism(1)
    (reference source/flinkStreamProcessing.scala:191, commented)."""
    out = df.coalesce(1) if single_file else df
    out.write.mode("overwrite").text(path)


def write_bucketed(df: DataFrame, table: str, bucket_col: str,
                   num_buckets: int = 16, sort_col: str | None = None) -> None:
    """Bucketed managed table: co-locates rows by key at WRITE time so
    later equi-joins/aggregations on the bucket column need no shuffle —
    the 100 TB answer to repeated fact-fact joins (SCALE.md).

    Requires a session with a warehouse dir (saveAsTable).
    """
    w = df.write.mode("overwrite").bucketBy(num_buckets, bucket_col)
    if sort_col:
        w = w.sortBy(sort_col)
    w.saveAsTable(table)


def compact_parquet(spark, path: str, *, target_mb: int = 256,
                    partition_col: str | None = None) -> int:
    """Small-file compaction: rewrite a parquet dataset into files sized
    near ``target_mb`` — the table-maintenance job every long-lived
    ingest (streaming sinks, incremental batches) needs, because
    thousands of KB-sized part files destroy scan throughput (footer
    reads + task-per-file scheduling dominate).

    Sizing is measured, not guessed: the current on-disk byte size sets
    the output file count (ceil(bytes / target)); ``repartition(n)`` is
    a full shuffle of the data ONCE, which is the cost of the compaction
    by definition.  With ``partition_col`` the layout is preserved
    (repartition on the column so each Hive partition writes its own
    files) and dynamic partition overwrite would let a scheduler compact
    one partition at a time.  Writes to a temp sibling then swaps, so a
    crash mid-compaction never leaves the dataset half-rewritten.

    Returns the number of output files written.
    """
    import glob
    import os
    import shutil

    files = [f for f in glob.glob(os.path.join(path, "**", "*.parquet"),
                                  recursive=True)
             if os.path.isfile(f)]
    total = sum(os.path.getsize(f) for f in files)
    n_out = max(1, -(-total // (target_mb * 1024 * 1024)))
    df = spark.read.parquet(path)
    rep = (df.repartition(int(n_out), partition_col) if partition_col
           else df.repartition(int(n_out)))
    tmp = path.rstrip("/") + "__compact_tmp"
    w = rep.write.mode("overwrite")
    if partition_col:
        w = w.partitionBy(partition_col)
    w.parquet(tmp)
    old = path.rstrip("/") + "__compact_old"
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)
    return len([f for f in glob.glob(os.path.join(path, "**", "*.parquet"),
                                     recursive=True) if os.path.isfile(f)])


def insert_overwrite_partitions(df: DataFrame, path: str,
                                partition_col: str) -> None:
    """Dynamic partition overwrite: replace ONLY the Hive partitions
    present in ``df``, leaving all others untouched — the idempotent
    re-run primitive for daily/hourly backfills (a failed day re-writes
    that day, not the table).  Uses Spark's
    ``partitionOverwriteMode=dynamic`` scoped to this single write via
    the DataFrameWriter option (no session-level state leaked).
    """
    (df.write
     .option("partitionOverwriteMode", "dynamic")
     .mode("overwrite")
     .partitionBy(partition_col)
     .parquet(path))
