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


# 10x-scale spot check: the driver verifies sf0.01; these heavyweight
# queries are ALSO verified at sf0.1, catching scale-dependent failures
# (fixed-point overflow, summation-order drift, top-k tie instability).
SF01_SAMPLE = [
    "q1_pricing_summary", "q5_local_supplier", "q9_product_profit",
    "q10_returned_items", "q17_small_qty_revenue", "q22_dormant_customers",
    "cube_status_priority", "embedding_centroids", "dedup_exact",
    "window_battery", "pipeline_training_prep", "text_tfidf_topterms",
    "text_decontaminate", "embedding_neardup_pairs", "pack_sequences_budget",
]


@pytest.fixture(scope="module")
def duck_oracle_sf01():
    import duckdb
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem events "
              "documents embeddings").split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('/root/testdata/sf0.1/{t}.parquet')")
    yield con
    con.close()


@pytest.mark.parametrize("name", SF01_SAMPLE)
def test_oracle_parity_sf01(spark, duck_oracle_sf01, name):
    q = REGISTRY[name]
    sdf = q.build(spark, "/root/testdata/sf0.1")
    compare(sdf, duck_oracle_sf01.sql(q.oracle), name)
