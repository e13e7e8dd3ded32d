"""Shared fixtures: one SparkSession per test session (local mode), a DuckDB
connection with the testdata views registered the way the driver registers
them, and scale-factor paths."""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TESTDATA = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata")
SF_SMOKE = f"{TESTDATA}/sf0.001"
SF_CORRECT = f"{TESTDATA}/sf0.01"

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


@pytest.fixture(scope="session")
def spark():
    from data_engineering_spotify_etl_airflow_aws_spark.session import get_spark

    # smaller core count for test parallelism headroom; configs identical
    spark = get_spark(app_name="engine-tests", master="local[8]", shuffle_partitions=8)
    yield spark
    spark.stop()


def make_duckdb(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


@pytest.fixture(scope="session")
def duck_correct():
    con = make_duckdb(SF_CORRECT)
    yield con
    con.close()
