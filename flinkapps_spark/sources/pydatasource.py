"""Custom source via the Spark 4 Python DataSource API (S5 extension).

The reference's only custom-source surface is the in-memory collection
(``env.fromElements``, reference source/flinkStreamTable.scala:61-65);
Spark 4 goes further: a pure-Python ``DataSource`` plugs into the planner
as a first-class format string — partitioned, schema'd, usable from
``spark.read.format(...)`` exactly like parquet.  This module registers a
DETERMINISTIC synthetic event source (MINSTD LCG per row id) so the
output is reproducible by any engine — the DuckDB oracle regenerates the
identical rows from the same recurrence.

Scale: partition planning happens driver-side (``partitions()`` returns
lightweight handles), row generation executor-side per partition — the
same contract a production custom source (REST cursor, proprietary file
format, message-log snapshot) would follow; nothing is collected through
the driver.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

# MINSTD constants: small enough that eid * A never overflows int64, so
# the identical closed form runs on DuckDB BIGINTs.
LCG_A = 48271
LCG_C = 11
LCG_M = 2147483647
VALUE_MOD = 1_000_000


def lcg_value(eid: int) -> float:
    """value(eid) = ((eid*A + C) mod M mod 10^6) / 10^6 — one exact
    int->double division, bit-identical on every IEEE-754 engine."""
    return ((eid * LCG_A + LCG_C) % LCG_M % VALUE_MOD) / VALUE_MOD


class SyntheticEventsDataSource(DataSource):
    """``spark.read.format("synthetic_events")`` after registration.

    Options: ``rows`` (total row count), ``partitions`` (parallelism).
    Rows are range-partitioned round-robin by id so every partition
    generates disjoint ids without coordination.
    """

    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self) -> str:
        return "event_id bigint, bucket int, value double"

    def reader(self, schema) -> "SyntheticEventsReader":
        return SyntheticEventsReader(self.options)


class SyntheticEventsReader(DataSourceReader):
    def __init__(self, options):
        self.rows = int(options.get("rows", 1000))
        self.n_parts = int(options.get("partitions", 8))

    def partitions(self):
        return [InputPartition(i) for i in range(self.n_parts)]

    def read(self, partition: InputPartition):
        start = partition.value
        for eid in range(start, self.rows, self.n_parts):
            yield (eid, eid % 10, lcg_value(eid))


def register(spark: SparkSession) -> None:
    spark.dataSource.register(SyntheticEventsDataSource)
