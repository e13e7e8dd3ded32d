"""The bench's ONE-line stdout contract (r17 hardening).

r16's round-over-round PERF comparison was lost because the driver's
capture of the r15 bench stdout kept only a 2000-char tail: the line had
grown to ~30k chars once repeat_samples rode along with the 343 query
timings. The contract fields stay on stdout; the bulky diagnostics
(repeat_samples, failure detail) live only in the SPARK_GRAFT_BENCH_OUT
snapshot. These tests pin that split so the line cannot silently regrow.
"""

from __future__ import annotations

import importlib.util
import json
import os

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_bench():
    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(_ROOT, "bench.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _synthetic_full(n: int = 343) -> dict:
    queries = {f"query_name_{i:04d}": round(0.1 + i * 0.01, 4) for i in range(n)}
    return {
        "metric": "suite_wall_sec",
        "value": round(sum(queries.values()), 4),
        "unit": "sec",
        "queries": queries,
        "sf": 0.1,
        "n_queries": n,
        # the bulky diagnostics that used to ride on stdout
        "repeat_samples": {k: [v, v * 2.5] for k, v in queries.items()},
        "repeat_failed": {"query_name_0001": "Py4JJavaError: transient"},
        "failed": {"query_name_0002": "AnalysisException: " + "x" * 180},
    }


def test_stdout_line_parses_and_keeps_contract_fields():
    bench = _load_bench()
    full = _synthetic_full()
    line = json.dumps(bench.build_stdout_payload(full))
    parsed = json.loads(line)
    for key in ("metric", "value", "unit", "queries", "sf", "n_queries"):
        assert parsed[key] == full[key]
    assert parsed["n_failed"] == 1
    # diagnostics stay off stdout (they live in the snapshot file only)
    assert "repeat_samples" not in parsed
    assert "repeat_failed" not in parsed
    assert "failed" not in parsed


def test_stdout_line_stays_within_size_bound():
    """A full-registry line (343 queries, every query repeated) must stay
    far below the ~30k chars that got the r15 capture truncated; the
    bound leaves room for registry growth without re-admitting the bulk."""
    bench = _load_bench()
    full = _synthetic_full()
    lean = json.dumps(bench.build_stdout_payload(full))
    assert len(lean) < 16_000, len(lean)
    # and the split is real: the full payload is much larger
    assert len(json.dumps(full)) > 2 * len(lean)


def test_snapshot_payload_keeps_full_detail():
    """The SPARK_GRAFT_BENCH_OUT snapshot is where repeat_samples and
    failure detail live; the lean line must be a pure projection of it
    (no field diverges between the two)."""
    bench = _load_bench()
    full = _synthetic_full()
    lean = bench.build_stdout_payload(full)
    for key, val in lean.items():
        if key == "n_failed":
            assert val == len(full["failed"])
        else:
            assert full[key] == val
    assert "repeat_samples" in full and "failed" in full
