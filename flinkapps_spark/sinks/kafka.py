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


def kafka_sink_options(brokers: str, topic: str,
                       include_headers: bool = False) -> dict[str, str]:
    """The exact option dict handed to ``format('kafka')`` writers —
    names are the documented Spark Kafka sink options (pinned by the
    contract test so a cluster user can't hit an option-name typo)."""
    opts = {"kafka.bootstrap.servers": brokers, "topic": topic}
    if include_headers:
        opts["includeHeaders"] = "true"
    return opts


def write_stream_kafka(df: DataFrame, brokers: str, topic: str,
                       checkpoint: str, value_expr: str = "value"):
    """At-least-once Kafka sink with idempotent-producer options."""
    out = to_kafka_records(df, value_expr)
    ws = (out.writeStream.format("kafka")
          .options(**kafka_sink_options(brokers, topic))
          .option("checkpointLocation", checkpoint))
    for k, v in PRODUCER_EXACTLY_ONCE_OPTS.items():
        ws = ws.option(k, v)
    return ws.start()


def batch_kafka_dedup_records(batch_df: DataFrame, batch_id: int,
                              value_expr: str = "value") -> DataFrame:
    """The per-micro-batch record frame write_stream_kafka_dedup emits:
    (value, headers) where headers carries the checkpointed batch id as a
    Kafka header struct — the documented sink shape
    ``array<struct<key:string, value:binary>>``."""
    headers = F.array(F.struct(
        F.lit("spark_batch_id").alias("key"),
        F.lit(str(batch_id)).cast("binary").alias("value")))
    return to_kafka_records(batch_df, value_expr).withColumn(
        "headers", headers)


def write_stream_kafka_dedup(df: DataFrame, brokers: str, topic: str,
                             checkpoint: str, value_expr: str = "value"):
    """Exactly-once-equivalent: attach the checkpointed micro-batch id to
    every record as a Kafka HEADER (out-of-band), so consumers dedup
    replays on (batch_id header, row content) while the value payload
    keeps its original wire format — prefixing the id into the value
    would silently break consumers of structured values (e.g. JSON)."""
    def handle(batch_df: DataFrame, batch_id: int) -> None:
        (batch_kafka_dedup_records(batch_df, batch_id, value_expr)
         .write.format("kafka")
         .options(**kafka_sink_options(brokers, topic, include_headers=True))
         .save())

    return (df.writeStream.foreachBatch(handle)
            .option("checkpointLocation", checkpoint)
            .start())
