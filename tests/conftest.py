"""Shared fixtures: one tuned local SparkSession per test run, DuckDB
connection with fixture views registered (mirrors the driver's oracle setup).
"""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flinkapps_spark.schemas import TESTDATA_TABLES
from flinkapps_spark.session import get_spark

TESTDATA_ROOT = "/root/testdata"
SF_SMOKE = os.path.join(TESTDATA_ROOT, "sf0.001")
# sweepable: SPARK_GRAFT_PARITY_SF_DIR=/root/testdata/sf0.001 python -m
# pytest tests/test_oracle_parity.py  → re-checks every oracle at another
# scale factor (boundary behavior is sf-dependent)
SF_ORACLE = os.environ.get("SPARK_GRAFT_PARITY_SF_DIR",
                           os.path.join(TESTDATA_ROOT, "sf0.01"))


@pytest.fixture(scope="session")
def spark():
    cpus = os.environ.get("SPARK_GRAFT_TEST_CPUS", "8")
    s = get_spark("flinkapps-tests", master=f"local[{cpus}]",
                  shuffle_partitions=8)
    yield s
    s.stop()


def make_duck(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            if os.path.isdir(path):  # multi-file fixture (gen_sf.py)
                path = os.path.join(path, "*.parquet")
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


@pytest.fixture(scope="session")
def duck_oracle():
    con = make_duck(SF_ORACLE)
    yield con
    con.close()
