"""Opt-in partition-invariance sweep over the driver's 50-query audit
window: every windowed query must produce the exact same value multiset
at spark.sql.shuffle.partitions=32 and =7.

Why this matters: the correctness driver runs the engine's query
functions inside ITS OWN SparkSession, whose parallelism/partitioning
need not match the local test session's. Any result that depends on
partition count — a double aggregated in shuffle order, a row_number
window without a total order, a limit without a deterministic sort —
would pass local parity yet hash-fail (or flap) in the driver audit.
The engine's standing rule is determinism by construction (exact
integer/decimal aggregates, one final IEEE division, id-tiebroken rank
cuts); this sweep is the executable check of that rule.

Off by default (two collects per query, several minutes); enable with
    SPARK_GRAFT_PART_INVARIANCE=1 python -m pytest tests/test_partition_invariance.py
for the driver's 50-query audit window, or =full to sweep the ENTIRE
registry (~10 min — the r12 upgrade that turns the round-7 one-off
full-registry evidence into a re-runnable standing sweep).

Round-7 evidence: the full 50-slot window (6 changed pins + the TPC-H
completion batch + the PQ/ADC similarity family + streaming joins +
the statistics batch) swept green at sf0.01, 32-vs-7 partitions, zero
mismatches — and a one-off sweep of the remaining 285 registered
queries the same session was also green (zero mismatches, zero errors),
so the whole registry holds the rule; this standing test keeps the
driver-facing window continuously covered.
"""

from __future__ import annotations

import os

import pytest

import data_engineering_spotify_etl_airflow_aws_spark as engine
from data_engineering_spotify_etl_airflow_aws_spark import registry

from .conftest import SF_CORRECT

engine.load_all_operators()

_MODE = os.environ.get("SPARK_GRAFT_PART_INVARIANCE", "")
_ENABLED = _MODE in ("1", "full")


def _window_names():
    names = list(registry.QUERIES)
    if _MODE == "full":
        return names
    return names[: engine.AUDIT_WINDOW]


def _canon(df):
    cols = sorted(df.columns)
    rows = [tuple(r[c] for c in cols) for r in df.collect()]
    return sorted(rows, key=lambda t: tuple((x is None, str(x)) for x in t))


@pytest.mark.skipif(
    not _ENABLED,
    reason="partition-invariance sweep is opt-in: SPARK_GRAFT_PART_INVARIANCE=1",
)
@pytest.mark.parametrize("name", _window_names())
def test_partition_invariant(name, spark):
    fn = registry.QUERIES[name]
    before = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "32")
        wide = _canon(fn(spark, SF_CORRECT))
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        narrow = _canon(fn(spark, SF_CORRECT))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", before)
    assert wide == narrow, (
        f"{name}: result depends on shuffle partition count — "
        f"first diffs: {[(a, b) for a, b in zip(wide, narrow) if a != b][:3]}"
    )
