"""Forecast the DuckDB ORACLE-side cost of every registered query at sf1,
from measured sf0.01 and sf0.1 timings, to decide which oracles are
infeasible for the sf1 parity sweep (tests/test_parity_sf1.py).

The engine side is already measured at sf1 (evidence/bench_r13_sf1_*);
what has never been measured is the ORACLE side, and the r13
internal-moment finding showed oracle-at-scale behavior is exactly where
bugs hide. A handful of oracles are deliberate brute-force proofs
(all-pairs O(n^2) joins proving Spark-side pruning lossless); this tool
finds them by measurement instead of by guessing.

Method: time each oracle once at sf0.01 and, when the sf0.01 time
exceeds a floor, again at sf0.1; the per-decade growth ratio
r = t(sf0.1)/t(sf0.01) extrapolates est(sf1) = t(sf0.1) * r. Oracles in
KNOWN_QUADRATIC are not re-timed at sf0.1 (their sf0.1 cost is already
minutes and the quadratic shape is analytic); they are flagged directly.

Usage:  python tools/oracle_cost_forecast.py [--out evidence/...json]
Run UNCONTENDED - timings feed an infeasibility decision.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import data_engineering_spotify_etl_airflow_aws_spark as engine
from data_engineering_spotify_etl_airflow_aws_spark import registry
from tests.conftest import TESTDATA, make_duckdb

# analytic exclusions: all-pairs lossless-pruning proofs, O(n_docs^2 * |sh|)
KNOWN_QUADRATIC = (
    "ngram_jaccard_near_dup",
    "containment_near_dup",
    "near_dup_recall_eval",
)

# re-time at sf0.1 only when sf0.01 exceeds this (everything below it is
# sub-second even at 100x growing quadratically: t * (10^2)^2 bound)
ESCALATE_FLOOR_SEC = 0.25
# forecast above this at sf1 => flag for exclusion review
FLAG_SEC = 600.0


def time_oracle(con, sql: str) -> float:
    t0 = time.perf_counter()
    con.execute(sql).fetchall()
    return round(time.perf_counter() - t0, 4)


# sf10 mode (r15, verdict ask #2): one decade up — base timings at
# sf0.1, escalations re-timed at sf1 (data/sf1), extrapolation to sf10.
# The four sf1-infeasible oracles are flagged directly (three analytic
# all-pairs proofs + dedup_clusters' measured ~84,000 s sf1 forecast);
# everything else is re-measured because each new decade can hide a new
# growth break (the r14 lesson: 2^53 crossings and fraction-of-total
# gates appear mid-decade).
KNOWN_SF1_INFEASIBLE = KNOWN_QUADRATIC + ("dedup_clusters",)
ESCALATE_FLOOR_SF10_SEC = 1.0
SF1_DIR_DEFAULT = "/root/repo/data/sf1"


def _forecast_sf10(out_path: str) -> int:
    engine.load_all_operators()
    sf1_dir = os.environ.get("SPARK_GRAFT_SF1_DIR", SF1_DIR_DEFAULT)
    rows: dict[str, dict] = {}

    con01 = make_duckdb(f"{TESTDATA}/sf0.1")
    for name in sorted(registry.ORACLES):
        if name in KNOWN_SF1_INFEASIBLE:
            rows[name] = {"flag": "known_infeasible_at_sf1"}
            continue
        try:
            rows[name] = {"t_sf01": time_oracle(con01, registry.ORACLES[name])}
        except Exception as exc:
            rows[name] = {
                "t_sf01": None,
                "err": f"{type(exc).__name__}: {exc}"[:200],
                "flag": "sf01_error_review",
            }
    con01.close()

    con1 = make_duckdb(sf1_dir)
    for name, row in rows.items():
        t = row.get("t_sf01")
        if t is None or t < ESCALATE_FLOOR_SF10_SEC:
            continue
        try:
            row["t_sf1"] = time_oracle(con1, registry.ORACLES[name])
        except Exception as exc:
            row["err_sf1"] = f"{type(exc).__name__}: {exc}"[:200]
            row["flag"] = "sf1_error_review"
            continue
        ratio = row["t_sf1"] / max(t, 1e-3)
        row["est_sf10"] = round(row["t_sf1"] * max(ratio, 1.0), 1)
        if row["est_sf10"] > FLAG_SEC:
            row["flag"] = "forecast_over_budget"
    con1.close()

    flagged = sorted(n for n, r in rows.items() if r.get("flag"))
    out = {
        "method": "t(sf0.1) for all; t(sf1)+extrapolation when over "
        f"{ESCALATE_FLOOR_SF10_SEC}s; flag over {FLAG_SEC}s est at sf10; "
        "the 4 sf1-infeasible oracles flagged directly",
        "flagged": flagged,
        "oracles": rows,
    }
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    tmp = out_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    os.replace(tmp, out_path)
    print(json.dumps({"flagged": flagged, "n": len(rows)}))
    return 0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None)
    ap.add_argument("--target", choices=("sf1", "sf10"), default="sf1")
    args = ap.parse_args()

    if args.target == "sf10":
        return _forecast_sf10(
            args.out or "evidence/sf10_oracle_cost_forecast.json"
        )
    args.out = args.out or "evidence/sf1_oracle_cost_forecast.json"

    engine.load_all_operators()
    rows: dict[str, dict] = {}

    con001 = make_duckdb(f"{TESTDATA}/sf0.01")
    for name in sorted(registry.ORACLES):
        try:
            rows[name] = {"t_sf001": time_oracle(con001, registry.ORACLES[name])}
        except Exception as exc:
            rows[name] = {"t_sf001": None, "err": f"{type(exc).__name__}: {exc}"[:200]}
    con001.close()

    con01 = make_duckdb(f"{TESTDATA}/sf0.1")
    for name, row in rows.items():
        t = row.get("t_sf001")
        if name in KNOWN_QUADRATIC:
            row["flag"] = "known_quadratic"
            continue
        if t is None or t < ESCALATE_FLOOR_SEC:
            continue
        try:
            row["t_sf01"] = time_oracle(con01, registry.ORACLES[name])
        except Exception as exc:
            row["err_sf01"] = f"{type(exc).__name__}: {exc}"[:200]
            # no timing => no est_sf1; surface it for manual review
            # instead of letting it drop out of the infeasibility list
            row["flag"] = "sf01_error_review"
            continue
        ratio = row["t_sf01"] / max(t, 1e-3)
        row["est_sf1"] = round(row["t_sf01"] * max(ratio, 1.0), 1)
        if row["est_sf1"] > FLAG_SEC:
            row["flag"] = "forecast_over_budget"
    con01.close()

    flagged = sorted(n for n, r in rows.items() if r.get("flag"))
    out = {
        "method": "t(sf0.01) for all; t(sf0.1)+extrapolation when over "
        f"{ESCALATE_FLOOR_SEC}s; flag over {FLAG_SEC}s est at sf1",
        "flagged": flagged,
        "oracles": rows,
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    tmp = args.out + ".tmp"
    with open(tmp, "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    os.replace(tmp, args.out)
    print(json.dumps({"flagged": flagged, "n": len(rows)}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
