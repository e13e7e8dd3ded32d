"""Scaling-exponent audit (round-7 verdict #7, the cheap 100x-readiness
check no single-sf bench gives): given two bench JSON outputs at
different scale factors, compute each query's empirical scaling ratio

    ratio = t(sf_hi) / t(sf_lo)        (data grew sf_hi/sf_lo = RX times)
    exponent ~ log(ratio) / log(RX)    (t ~ n^exponent)

and flag queries whose growth exceeds their design class. Small
absolute times are noise-dominated (JVM scheduling jitter is ~0.1-0.3s
per query on this host), so queries under MIN_HI_SEC at the high sf are
reported but never flagged: an 0.2s -> 0.5s "superlinear" query is
measurement floor, not a scale risk.

Interpretation guide: with fixed parallelism, linear work shows
exponent <= 1; shuffle-heavy ops with an n log n sort term drift to
~1.1-1.3; a genuinely quadratic candidate generator would show ~2. At
the 10x step used here the fixed per-query overhead (plan + codegen +
job scheduling, ~0.2-0.5s) DEFLATES exponents for fast queries, so the
audit is conservative exactly where queries are cheap and sharp where
they are expensive - which is where it matters.

Usage:
    python tools/scaling_audit.py bench_sf0.01.json bench_sf0.1.json

A query present/usable in only one input fails the audit (a scale
regression looks exactly like "errored or dropped at the high sf").
When one input is a DELIBERATE subset run (SPARK_GRAFT_QUERIES, e.g.
the sf1 flag-eligible-only pass), pass --allow-missing to demote that
failure to the printed notice — but a query the bench JSON itself
records under "failed" is a hard failure at ANY setting: the subset
flag cannot launder a query that errored at scale.
"""

from __future__ import annotations

import json
import math
import sys

MIN_HI_SEC = 2.0  # below this at the high sf, ratios are noise
FLAG_EXPONENT = 1.35  # n log n at 10x is ~1.23; leave jitter headroom


def load(path: str) -> tuple[float, dict[str, float], dict[str, str]]:
    with open(path) as f:
        d = json.load(f)
    return float(d["sf"]), d["queries"], d.get("failed", {})


def main() -> int:
    args = [x for x in sys.argv[1:] if x != "--allow-missing"]
    allow_missing = "--allow-missing" in sys.argv[1:]
    a, b = load(args[0]), load(args[1])
    if a[0] == b[0]:
        sys.exit(
            f"both inputs are at sf={a[0]}; need two DIFFERENT scale "
            f"factors to measure scaling"
        )
    (sf_lo, t_lo, f_lo), (sf_hi, t_hi, f_hi) = sorted(
        (a, b), key=lambda p: p[0]
    )
    rx = sf_hi / sf_lo

    # A query bench RECORDED as failed is a hard audit failure at any
    # setting: --allow-missing exists for queries deliberately excluded
    # from a subset run, and cannot launder one that errored at scale —
    # bench's "failed" key is exactly how an OOM-at-sf1 would present.
    errored = sorted(set(f_lo) | set(f_hi))
    if errored:
        print(
            f"ERRORED ({len(errored)}): recorded as failed by bench: "
            f"{errored}",
            file=sys.stderr,
        )

    # A query present in one run but missing (or non-positive) in the
    # other is exactly what a scale regression looks like (errored or
    # dropped at the high sf) — fail loudly instead of silently
    # shrinking the audit (repo no-silent-caps convention).
    usable_lo = {n for n, t in t_lo.items() if t > 0}
    usable_hi = {n for n, t in t_hi.items() if t > 0}
    lost = sorted(usable_lo ^ usable_hi)
    if lost:
        print(
            f"MISSING ({len(lost)}): present/usable in only one input "
            f"(errored or dropped at one sf?): {lost}",
            file=sys.stderr,
        )

    rows = []
    for name, hi in t_hi.items():
        lo = t_lo.get(name)
        if lo is None or lo <= 0:
            continue
        ratio = hi / lo
        exp = math.log(ratio) / math.log(rx) if ratio > 0 else 0.0
        rows.append((hi, name, lo, ratio, exp))
    rows.sort(reverse=True)

    # Flag over EVERY query above the time floor (not just the printed
    # head): a flag-eligible query outside the top-25 table must still
    # fail the audit.
    flagged = [
        name
        for hi, name, lo, ratio, exp in rows
        if hi >= MIN_HI_SEC and exp > FLAG_EXPONENT
    ]
    eligible = sum(1 for hi, *_ in rows if hi >= MIN_HI_SEC)

    print(
        f"# scaling audit: t(sf{sf_hi})/t(sf{sf_lo}), data x{rx:.0f}; "
        f"exponent = log(ratio)/log({rx:.0f}); "
        f"{eligible} queries >= {MIN_HI_SEC}s at sf{sf_hi}, all checked"
    )
    print(f"{'query':42s} {'t_lo':>7s} {'t_hi':>7s} {'ratio':>6s} {'exp':>5s}")
    shown = {r[1] for r in rows[:25]}
    for hi, name, lo, ratio, exp in rows[:25]:
        mark = "  <-- SUPERLINEAR" if name in flagged else ""
        print(f"{name:42s} {lo:7.2f} {hi:7.2f} {ratio:6.2f} {exp:5.2f}{mark}")
    for hi, name, lo, ratio, exp in rows[25:]:  # flagged rows below the fold
        if name in flagged:
            print(
                f"{name:42s} {lo:7.2f} {hi:7.2f} {ratio:6.2f} {exp:5.2f}"
                "  <-- SUPERLINEAR (below top-25)"
            )
    print()
    if flagged:
        print(f"FLAGGED ({len(flagged)}): {flagged}")
        return 1
    print(
        f"no query above the flag line (exp > {FLAG_EXPONENT} with "
        f"t_hi >= {MIN_HI_SEC}s) among all {eligible} eligible queries"
    )
    if errored:
        return 1
    return 1 if (lost and not allow_missing) else 0


if __name__ == "__main__":
    sys.exit(main())
