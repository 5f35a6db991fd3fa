"""JDBC / database sinks (SURVEY §2.4 K6-K7).

The reference ships two database-write patterns:

- K6 declarative batch INSERT (JdbcSink.sink with batchSize=1000,
  interval=200ms, retries=5 — reference source/flinkTableJDBC.scala:56-76);
- K7 custom upsert: UPDATE first, INSERT if no row matched, optionally
  *accumulating* (sensor_temp = sensor_temp + ?, iteration + 1 — reference
  source/flinkBatchJDBCSink.scala:98-127).  The reference pins
  parallelism=1 because its two-statement upsert races under concurrency
  (SURVEY §7.5.6).

Spark-first redesign (parallel-safe, no parallelism pinning):
1. pre-aggregate the batch per key (one row per key per batch —
   ``groupBy(key).agg(...)``), so statement order within a key is moot;
2. write with an *atomic* upsert (INSERT ... ON CONFLICT DO UPDATE) per
   partition, batched.

No JDBC driver jar / postgres exists in this container, so the writer
targets any DB-API connection factory (tests use DuckDB in-memory; swap the
factory for psycopg2 in production — identical SQL shape).  A classic
``df.write.jdbc`` path is provided for clusters with the jar present.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame, functions as F

JDBC_BATCH_SIZE = 1000   # reference JdbcExecutionOptions.withBatchSize
JDBC_MAX_RETRIES = 5     # reference .withMaxRetries


def write_jdbc_insert(df: DataFrame, url: str, table: str,
                      properties: dict[str, str],
                      batch_size: int = JDBC_BATCH_SIZE) -> None:
    """K6 on a real cluster: declarative JDBC append."""
    (df.write.mode("append")
     .option("batchsize", batch_size)
     .jdbc(url, table, properties=properties))


def upsert_sql(table: str, key_cols: Sequence[str],
               val_cols: Sequence[str], accumulate: bool = False) -> str:
    """Build the atomic upsert statement (K7, parallel-safe form).

    accumulate=True reproduces the reference's read-modify-write semantics
    (sensor_temp accumulates, iteration counts) atomically.
    """
    cols = list(key_cols) + list(val_cols)
    placeholders = ", ".join("?" for _ in cols)
    keys = ", ".join(key_cols)
    if accumulate:
        sets = ", ".join(
            f"{c} = {table}.{c} + excluded.{c}" for c in val_cols)
    else:
        sets = ", ".join(f"{c} = excluded.{c}" for c in val_cols)
    return (f"INSERT INTO {table} ({', '.join(cols)}) "
            f"VALUES ({placeholders}) "
            f"ON CONFLICT ({keys}) DO UPDATE SET {sets}")


def _write_rows(rows_iter, sql: str, connection_factory: Callable,
                batch_size: int) -> None:
    """Stream rows into the database in bounded batches (runs on an
    executor under foreachPartition, or on the driver in shim mode).
    The connection opens lazily so empty partitions cost nothing."""
    con = None
    buf: list[tuple] = []
    try:
        for row in rows_iter:
            buf.append(tuple(row))
            if len(buf) >= batch_size:
                if con is None:
                    con = connection_factory()
                con.executemany(sql, buf)
                buf = []
        if buf:
            if con is None:
                con = connection_factory()
            con.executemany(sql, buf)
        if con is not None and hasattr(con, "commit"):
            con.commit()
    finally:
        if con is not None:
            con.close()


def upsert_batch(df: DataFrame, *, connection_factory: Callable,
                 table: str, key_cols: Sequence[str],
                 val_cols: Sequence[str], accumulate: bool = False,
                 agg_exprs: dict[str, str] | None = None,
                 batch_size: int = JDBC_BATCH_SIZE,
                 driver_collect: bool = False) -> None:
    """Atomic upsert of a (micro-)batch DataFrame into a DB-API database.

    Step 1 — pre-aggregate per key so each key appears once in the batch
    (reference semantics: accumulate → SUM the values; last-write-wins →
    arbitrary deterministic pick via max).
    Step 2 — ``foreachPartition``: each executor opens its own connection
    via ``connection_factory`` (which must be picklable and valid on the
    workers — e.g. a psycopg2/sqlite3 connect closure) and streams its
    partition through batched atomic upserts.  Memory per task is one
    ``batch_size`` buffer — never the whole batch, never the driver.
    Atomic ON CONFLICT statements make concurrent partitions safe — the
    reference needed parallelism=1 here (SURVEY §7.5.6); this doesn't.

    ``driver_collect=True`` is the test shim for in-process DB handles
    (e.g. a shared in-memory DuckDB) that can't cross the executor
    process boundary; it bounds memory by streaming ``toLocalIterator``.
    """
    agg_exprs = agg_exprs or {}
    if accumulate:
        aggs = [F.sum(c).alias(c) if c not in agg_exprs
                else F.expr(agg_exprs[c]).alias(c) for c in val_cols]
    else:
        aggs = [F.max(c).alias(c) if c not in agg_exprs
                else F.expr(agg_exprs[c]).alias(c) for c in val_cols]
    deduped = df.groupBy(*key_cols).agg(*aggs)
    sql = upsert_sql(table, key_cols, val_cols, accumulate)
    out = deduped.select(*key_cols, *val_cols)
    if driver_collect:
        _write_rows(out.toLocalIterator(), sql, connection_factory,
                    batch_size)
        return
    out.foreachPartition(
        lambda rows: _write_rows(rows, sql, connection_factory, batch_size))


def foreach_batch_upsert(stream_df: DataFrame, checkpoint: str, **upsert_kw):
    """K7 streaming form: upsert every micro-batch (T1 checkpointing makes
    replays idempotent for last-write-wins; accumulate mode relies on
    exactly-once micro-batch ids — Spark replays a failed batch with the
    same id, so track batch ids in the target for strict exactly-once)."""
    def handle(batch_df: DataFrame, batch_id: int) -> None:
        upsert_batch(batch_df, **upsert_kw)

    return (stream_df.writeStream
            .foreachBatch(handle)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start())
