"""Changelog (CDC) application: collapse an ordered stream of I/U/D
change records into final table state — last-write-wins per key, with
deletes tombstoning the key.

Beyond-reference extension. The reference's Flink runtime applies the
same semantics implicitly inside its upsert sinks (reference
source/flinkTableJDBC.scala:56-76 relies on key-wise last-write-wins in
the JDBC upsert); here it is an explicit, batch-testable operator — the
shape of a Debezium/Hudi/Delta "merge changelog into snapshot" job.

Scale: ONE shuffle on the key. Both window functions (row_number for
latest-wins, count for audit) share the same partitioning and sort, so
Catalyst plans a single Exchange + Sort and evaluates them in one Window
node. At 100 TB the changelog is typically much smaller than the base
snapshot; to merge into an existing snapshot, union the snapshot as
seq=0 'I' rows — same single-shuffle plan.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window, functions as F


def apply_changelog(changes: DataFrame, key_cols: Sequence[str],
                    seq_col: str = "seq", op_col: str = "op",
                    delete_op: str = "D") -> DataFrame:
    """Final state after applying ``changes`` in ``seq_col`` order per key.

    Emits one row per surviving key: the columns of its latest change
    record plus ``n_changes`` (how many change records touched the key).
    Keys whose latest op equals ``delete_op`` are dropped entirely.
    ``seq_col`` must be unique per key (changelogs carry an LSN/offset).
    """
    keys = [F.col(c) for c in key_cols]
    latest = Window.partitionBy(*keys).orderBy(F.col(seq_col).desc())
    per_key = Window.partitionBy(*keys)
    ranked = (changes
              .withColumn("__rn", F.row_number().over(latest))
              .withColumn("n_changes", F.count(F.lit(1)).over(per_key)))
    return (ranked
            .filter((F.col("__rn") == 1) & (F.col(op_col) != delete_op))
            .drop("__rn"))
