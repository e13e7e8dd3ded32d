"""tools/scaling_audit.py unit coverage: the exponent math, the flag
line, and the r8-ADVICE missing-query failure mode (a query erroring or
vanishing at one scale factor must fail the audit unless the run is a
declared subset)."""

from __future__ import annotations

import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
TOOL = REPO / "tools" / "scaling_audit.py"


def _write(tmp_path: Path, name: str, sf: float, queries: dict) -> str:
    p = tmp_path / name
    p.write_text(json.dumps({"sf": sf, "queries": queries}))
    return str(p)


def _run(*args: str) -> subprocess.CompletedProcess:
    return subprocess.run(
        [sys.executable, str(TOOL), *args], capture_output=True, text=True
    )


def test_clean_pair_passes(tmp_path):
    lo = _write(tmp_path, "lo.json", 0.01, {"a": 1.0, "b": 0.5})
    hi = _write(tmp_path, "hi.json", 0.1, {"a": 5.0, "b": 3.0})
    r = _run(lo, hi)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "no query above the flag line" in r.stdout


def test_superlinear_heavy_query_flags(tmp_path):
    # 1.0s -> 40s over a 10x step: exponent 1.6, well past 1.35
    lo = _write(tmp_path, "lo.json", 0.01, {"a": 1.0, "b": 0.5})
    hi = _write(tmp_path, "hi.json", 0.1, {"a": 40.0, "b": 1.0})
    r = _run(lo, hi)
    assert r.returncode == 1
    assert "SUPERLINEAR" in r.stdout and "'a'" in r.stdout


def test_cheap_superlinear_query_is_noise_not_flag(tmp_path):
    # same exponent but t_hi below the 2s floor: reported, never flagged
    lo = _write(tmp_path, "lo.json", 0.01, {"a": 0.03, "b": 0.5})
    hi = _write(tmp_path, "hi.json", 0.1, {"a": 1.2, "b": 1.0})
    r = _run(lo, hi)
    assert r.returncode == 0


def test_missing_query_fails_unless_subset(tmp_path):
    lo = _write(tmp_path, "lo.json", 0.01, {"a": 1.0, "b": 0.5})
    hi = _write(tmp_path, "hi.json", 0.1, {"a": 5.0})  # b vanished
    r = _run(lo, hi)
    assert r.returncode == 1
    assert "MISSING" in r.stderr and "'b'" in r.stderr
    r2 = _run("--allow-missing", lo, hi)
    assert r2.returncode == 0
    assert "MISSING" in r2.stderr  # still reported, just not fatal


def test_zeroed_query_counts_as_missing(tmp_path):
    # present at both sfs but non-positive at one = errored-at-that-sf
    lo = _write(tmp_path, "lo.json", 0.01, {"a": 1.0, "b": 0.5})
    hi = _write(tmp_path, "hi.json", 0.1, {"a": 5.0, "b": 0.0})
    r = _run(lo, hi)
    assert r.returncode == 1
    assert "'b'" in r.stderr


def test_bench_recorded_failure_beats_allow_missing(tmp_path):
    """--allow-missing tolerates deliberate subset exclusions, but a
    query bench RECORDED as failed (e.g. OOM at the high sf) must fail
    the audit regardless."""
    lo = _write(tmp_path, "lo.json", 0.01, {"a": 1.0, "b": 0.5})
    p = tmp_path / "hi.json"
    p.write_text(
        json.dumps(
            {
                "sf": 0.1,
                "queries": {"a": 5.0},
                "failed": {"b": "OutOfMemoryError: ..."},
            }
        )
    )
    r = _run("--allow-missing", lo, str(p))
    assert r.returncode == 1
    assert "ERRORED" in r.stderr and "'b'" in r.stderr


def test_same_sf_inputs_rejected(tmp_path):
    lo = _write(tmp_path, "lo.json", 0.01, {"a": 1.0})
    lo2 = _write(tmp_path, "lo2.json", 0.01, {"a": 1.1})
    r = _run(lo, lo2)
    assert r.returncode != 0
    assert "DIFFERENT" in (r.stdout + r.stderr)
