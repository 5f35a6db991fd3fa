"""The main correctness gate, run locally: every catalog query with an
oracle is executed on Spark and DuckDB at sf0.01 and compared exactly the
way the driver does (row count + schema + order-insensitive values).
"""

from __future__ import annotations

import pytest

from flinkapps_spark.plans import catalog
from tests.conftest import SF_ORACLE
from tests.oracle_harness import compare

REGISTRY = catalog.registry()
ORACLED = [n for n, q in sorted(REGISTRY.items()) if q.oracle is not None]
ROWS_ONLY = [n for n, q in sorted(REGISTRY.items()) if q.oracle is None]


@pytest.mark.parametrize("name", ORACLED)
def test_oracle_parity(spark, duck_oracle, name):
    q = REGISTRY[name]
    sdf = q.build(spark, SF_ORACLE)
    compare(sdf, duck_oracle.sql(q.oracle), name)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_runs(spark, name):
    q = REGISTRY[name]
    sdf = q.build(spark, SF_ORACLE)
    assert sdf.count() >= 0


def test_entry_smoke(spark):
    import __spark_entry__ as e
    df = e.entry(spark)
    assert df.count() > 0
    assert len(df.schema.fields) > 0


def test_contract_shape():
    import __spark_entry__ as e
    qs, os_ = e.queries(), e.oracle_sql()
    assert set(os_) <= set(qs)
    assert len(qs) >= 10
