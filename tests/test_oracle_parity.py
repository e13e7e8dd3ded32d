"""Mirror of the driver's correctness gate: every registered query with an
oracle must match DuckDB on row count, column names, and an order-insensitive
multiset of normalized values at sf=0.01.

Stricter than the driver in one way: it also asserts rows>0 for most queries
so a parity "pass" can't be an accidentally-empty result (allowlist below for
queries whose correct answer may legitimately be empty).
"""

from __future__ import annotations

import datetime
import decimal
import math

import pytest

import data_engineering_spotify_etl_airflow_aws_spark as engine
from data_engineering_spotify_etl_airflow_aws_spark import registry

from .conftest import SF_CORRECT

engine.load_all_operators()

MAY_BE_EMPTY = {"anti_join_not_exists", "embedding_near_dup_pairs"}


def test_may_be_empty_names_are_registered():
    """A dead allowlist entry could silently mask an accidentally-empty
    result if a future query reuses the name (round-1 ADVICE)."""
    unknown = MAY_BE_EMPTY - set(registry.QUERIES)
    assert not unknown, f"MAY_BE_EMPTY lists unregistered queries: {unknown}"


def normalize(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, decimal.Decimal):
        return float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(normalize(x) for x in v)
    return v


def rows_to_multiset(col_names, rows):
    """Sort columns by name (driver semantics), normalize values, return a
    sorted list of tuples for order-insensitive comparison."""
    order = sorted(range(len(col_names)), key=lambda i: col_names[i])
    out = [tuple(normalize(r[i]) for i in order) for r in rows]
    return sorted(out, key=lambda t: tuple((x is None, str(x)) for x in t))


def oracle_names():
    return sorted(registry.ORACLES)


@pytest.mark.parametrize("name", oracle_names())
def test_oracle_parity(name, spark, duck_correct):
    spark_df = registry.QUERIES[name](spark, SF_CORRECT)
    spark_cols = spark_df.columns
    spark_rows = spark_df.collect()

    rel = duck_correct.execute(registry.ORACLES[name])
    duck_cols = [d[0] for d in rel.description]
    duck_rows = rel.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column names differ: spark={spark_cols} duck={duck_cols}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count differs: spark={len(spark_rows)} duck={len(duck_rows)}"
    )
    if name not in MAY_BE_EMPTY:
        assert len(spark_rows) > 0, f"{name}: empty result can't validate anything"

    s = rows_to_multiset(spark_cols, [tuple(r) for r in spark_rows])
    d = rows_to_multiset(duck_cols, duck_rows)
    if s != d:
        diffs = [
            (i, a, b) for i, (a, b) in enumerate(zip(s, d)) if a != b
        ][:5]
        raise AssertionError(f"{name}: value mismatch, first diffs: {diffs}")


def test_rows_only_queries_run(spark):
    """Queries without oracles still must run and return a stable schema."""
    for name in sorted(set(registry.QUERIES) - set(registry.ORACLES)):
        df = registry.QUERIES[name](spark, SF_CORRECT)
        assert df.columns, name
        df.limit(5).collect()
