"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

All real logic lives in the data_engineering_spotify_etl_airflow_aws_spark
package; this module only adapts its registry to the driver contract.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import data_engineering_spotify_etl_airflow_aws_spark as engine
from data_engineering_spotify_etl_airflow_aws_spark import registry

engine.load_all_operators()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: MinHash+LSH near-dup
    detection over the documents table - the LLM-data-pipeline core path
    (shingle -> minhash -> band -> bucket equi-join, never all-pairs),
    rotated in from the TPC-H pricing summary per the r9 verdict so the
    driver's smoke check exercises the north-star surface."""
    from data_engineering_spotify_etl_airflow_aws_spark.operators.dedup import (
        minhash_lsh_near_dup,
    )

    return minhash_lsh_near_dup(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(registry.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalent for each oracle-checkable query."""
    return dict(registry.ORACLES)
