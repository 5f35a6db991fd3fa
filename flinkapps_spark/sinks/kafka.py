"""Kafka sink (SURVEY §2.4 K2): exactly-once-oriented Kafka output.

The reference uses a transactional Flink KafkaSink (idempotent producer,
transaction id prefix, read_committed — reference
source/flinkStreamProcessing.scala:162-186).  Spark's Kafka sink is
at-least-once; the engine exposes the two production-grade mitigations
(SURVEY §7.5.4):

1. idempotent producer options + downstream read_committed/dedup keys;
2. foreachBatch with the checkpointed batch id embedded per record, so
   replayed micro-batches are deduplicable downstream (the standard Spark
   exactly-once-to-Kafka pattern).

Requires the spark-sql-kafka connector jar at runtime (not in this
container); the builders are config-surface-tested only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

PRODUCER_EXACTLY_ONCE_OPTS = {
    # mirrors the reference's producer properties (:164-176)
    "kafka.enable.idempotence": "true",
    "kafka.acks": "all",
    "kafka.max.in.flight.requests.per.connection": "5",
}


def to_kafka_records(df: DataFrame, value_expr: str,
                     key_expr: str | None = None) -> DataFrame:
    cols = [F.expr(value_expr).cast("string").alias("value")]
    if key_expr:
        cols.insert(0, F.expr(key_expr).cast("string").alias("key"))
    return df.select(*cols)


def write_stream_kafka(df: DataFrame, brokers: str, topic: str,
                       checkpoint: str, value_expr: str = "value"):
    """At-least-once Kafka sink with idempotent-producer options."""
    out = to_kafka_records(df, value_expr)
    ws = (out.writeStream.format("kafka")
          .option("kafka.bootstrap.servers", brokers)
          .option("topic", topic)
          .option("checkpointLocation", checkpoint))
    for k, v in PRODUCER_EXACTLY_ONCE_OPTS.items():
        ws = ws.option(k, v)
    return ws.start()


def write_stream_kafka_dedup(df: DataFrame, brokers: str, topic: str,
                             checkpoint: str, value_expr: str = "value"):
    """Exactly-once-equivalent: attach the checkpointed micro-batch id to
    every record as a Kafka HEADER (out-of-band), so consumers dedup
    replays on (batch_id header, row content) while the value payload
    keeps its original wire format — prefixing the id into the value
    would silently break consumers of structured values (e.g. JSON)."""
    def handle(batch_df: DataFrame, batch_id: int) -> None:
        headers = F.array(F.struct(
            F.lit("spark_batch_id").alias("key"),
            F.lit(str(batch_id)).cast("binary").alias("value")))
        (to_kafka_records(batch_df, value_expr)
         .withColumn("headers", headers)
         .write.format("kafka")
         .option("kafka.bootstrap.servers", brokers)
         .option("topic", topic)
         .option("includeHeaders", "true")
         .save())

    return (df.writeStream.foreachBatch(handle)
            .option("checkpointLocation", checkpoint)
            .start())
