"""Shared fixtures: one SparkSession per test session (local mode), a DuckDB
connection with the testdata views registered the way the driver registers
them, scale-factor paths, and the sweep-evidence recorder that appends
opt-in sweep outcomes to SWEEPS.json (round-7 verdict #3: sweep results
must be machine-readable artifacts, not commit-message prose)."""

from __future__ import annotations

import datetime
import json
import os
import sys
import warnings
from collections import Counter

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


# ---------------------------------------------------------------------------
# Sweep-evidence recorder: when an opt-in sweep actually RUNS (its env var
# set, so its tests aren't skipped), append one entry per sweep to the
# repo-root SWEEPS.json after the session. The entry records what was
# observed (passed/failed/skipped counts), so a -k subset run is honestly
# a partial entry, and a green full run is durable, re-scannable evidence.

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_SWEEPS_PATH = os.path.join(_REPO_ROOT, "SWEEPS.json")

# test file basename -> (sweep name, sf, gating env var)
_SWEEP_SUITES: dict[str, tuple[str, float, str]] = {
    "test_partition_invariance.py": (
        "partition_invariance_32v7",
        0.01,
        "SPARK_GRAFT_PART_INVARIANCE",
    ),
    "test_parity_sf01.py": (
        "sf01_oracle_parity_at_risk",
        0.1,
        "SPARK_GRAFT_SF01_PARITY",
    ),
    "test_parity_sf0001.py": (
        "oracle_parity_full_registry",
        0.001,
        "SPARK_GRAFT_SF0001_PARITY",
    ),
    "test_parity_sf1.py": (
        "sf1_oracle_parity_at_risk",
        1.0,
        "SPARK_GRAFT_SF1_PARITY",
    ),
    "test_parity_sf10.py": (
        "sf10_oracle_parity_at_risk",
        10.0,
        "SPARK_GRAFT_SF10_PARITY",
    ),
    # the 5k-doc hash sample OF THE SF1 FIXTURE (sf recorded as 1.0:
    # sf1 vocabulary/shingle statistics are the point of the evidence)
    "test_parity_sf1_sampled.py": (
        "sf1_sampled_quadratic_parity",
        1.0,
        "SPARK_GRAFT_SF1_SAMPLED_PARITY",
    ),
}

# full-registry mode (env var == "full") records under a distinct sweep
# name so the evidence log is auditable (r12 ADVICE: four same-named
# partition_invariance_32v7 rows with passed 50/343/1/50 were
# indistinguishable).
_FULL_MODE_NAMES: dict[str, str] = {
    "test_partition_invariance.py": "partition_invariance_full",
    "test_parity_sf01.py": "sf01_oracle_parity_full",
    "test_parity_sf1.py": "sf1_oracle_parity_full",
    "test_parity_sf10.py": "sf10_oracle_parity_full",
}

# r14: the sf1 suite's "rest" mode (full-registry MINUS the at-risk
# window) records under its own name too - the at_risk + rest row pair
# composes a complete sf1 validation without re-running either half.
_REST_MODE_NAMES: dict[str, str] = {
    "test_parity_sf1.py": "sf1_oracle_parity_rest",
    "test_parity_sf10.py": "sf10_oracle_parity_rest",
}

_sweep_outcomes: dict[str, dict[str, str]] = {}


# worst outcome per TEST, not a count per pytest PHASE: a test that
# passes at call but errors at teardown must count once, as failed
_OUTCOME_RANK = {"passed": 0, "skipped": 1, "failed": 2}


def pytest_runtest_logreport(report):
    base = os.path.basename(report.nodeid.split("::")[0])
    if base not in _SWEEP_SUITES:
        return
    if report.failed:
        outcome = "failed"
    elif report.skipped:
        outcome = "skipped"
    elif report.passed and report.when == "call":
        outcome = "passed"
    else:
        return  # setup/teardown passes carry no information
    per_node = _sweep_outcomes.setdefault(base, {})
    prev = per_node.get(report.nodeid)
    if prev is None or _OUTCOME_RANK[outcome] > _OUTCOME_RANK[prev]:
        per_node[report.nodeid] = outcome


def _current_round() -> int:
    """The build round in progress = latest driver CORRECTNESS round + 1.
    Trees without the history files fall back to the generated ledger
    snapshot's SCANNED_ROUNDS (the same fallback the audit rotation uses)."""
    from data_engineering_spotify_etl_airflow_aws_spark.audit import (
        scanned_rounds,
    )

    rounds = scanned_rounds(_REPO_ROOT)
    if not rounds:
        from data_engineering_spotify_etl_airflow_aws_spark.audit_ledger import (
            SCANNED_ROUNDS,
        )

        rounds = SCANNED_ROUNDS
    return (max(rounds) + 1) if rounds else 0


def pytest_sessionfinish(session, exitstatus):
    for base, per_node in _sweep_outcomes.items():
        name, sf, env = _SWEEP_SUITES[base]
        mode = os.environ.get(env)
        if not mode:
            continue  # suite was opt-out: all rows skipped, nothing ran
        counts = Counter(per_node.values())
        if counts.get("passed", 0) + counts.get("failed", 0) == 0:
            continue
        # r13 (ADVICE): full-registry runs get a DISTINCT sweep name so
        # the evidence log distinguishes them from the standard window
        # runs, and the entry carries the mode so a -k subset is visibly
        # partial, not a fake sweep.
        if mode == "full" and base in _FULL_MODE_NAMES:
            name = _FULL_MODE_NAMES[base]
        elif mode == "rest" and base in _REST_MODE_NAMES:
            name = _REST_MODE_NAMES[base]
        elif mode == "touched":
            # r15: re-run of the round's PIN_FIRST changed set at scale
            name = name.replace("_at_risk", "_touched")
        entry = {
            "sweep": name,
            "sf": sf,
            "date": datetime.date.today().isoformat(),
            "round": _current_round(),
            "mode": mode,
            "passed": counts.get("passed", 0),
            "failed": counts.get("failed", 0),
            "skipped": counts.get("skipped", 0),
        }
        # SWEEPS.json is the durable evidence log: a missing file starts
        # fresh, but a CORRUPT file is preserved aside (never silently
        # discarded), and the rewrite is temp-file + os.replace so a
        # crash mid-write can't destroy the history either way.
        try:
            with open(_SWEEPS_PATH) as f:
                log = json.load(f)
            if not isinstance(log, list):
                raise ValueError("SWEEPS.json is not a JSON list")
        except OSError:
            log = []
        except ValueError:
            aside = _SWEEPS_PATH + ".corrupt"
            os.replace(_SWEEPS_PATH, aside)
            warnings.warn(
                f"SWEEPS.json was unparsable or wrong-shaped; moved it "
                f"to {aside} and started a fresh log",
                stacklevel=1,
            )
            log = []
        log.append(entry)
        tmp = _SWEEPS_PATH + ".tmp"
        with open(tmp, "w") as f:
            json.dump(log, f, indent=2)
            f.write("\n")
        os.replace(tmp, _SWEEPS_PATH)
