"""Randomized brute-force references for the two sweep-line kernels
(`interval_union_coverage`, `max_concurrent_per_user`) — the companion
to test_asof_join_matches_reference_on_random_inputs.

Why beyond oracle parity: the DuckDB oracles share each query's
FORMULATION (same flag window, same sweep order), so a tie-semantics
bug expressed identically in both would pass the hash gate. This test
regenerates the documented SEMANTICS independently — sort intervals,
merge/count in plain Python — on inputs engineered to be far nastier
than the fixture: 5 users, timestamps drawn from a pool of just 40
instants (forcing many exact-duplicate (user, ts) collisions),
durations drawn to produce zero-gap touching intervals and full
containment. Any divergence between the distributed window plan and the
sequential reference on these inputs is a real tie/boundary defect.

Deterministic: numpy RandomState(7), one temp parquet fixture, one
Spark collect per query.
"""

from __future__ import annotations

import collections
import os

import numpy as np
import pandas as pd
import pytest

import data_engineering_spotify_etl_airflow_aws_spark as engine
from data_engineering_spotify_etl_airflow_aws_spark import registry

engine.load_all_operators()

_N = 400
_USERS = 5
_BASE_US = 820_454_400_000_000  # 1996-01-01 UTC in epoch micros


@pytest.fixture(scope="module")
def tie_fixture(tmp_path_factory):
    """events.parquet with heavy (user, ts) collisions and values chosen
    so derived interval lengths hit the full 1..60-minute range."""
    rng = np.random.RandomState(7)
    # 40 candidate instants spaced 30 s apart: adjacent intervals touch
    # and overlap constantly, and ties are guaranteed by the pigeonhole
    instants = _BASE_US + np.arange(40, dtype=np.int64) * 30_000_000
    ts_us = instants[rng.randint(0, len(instants), _N)]
    df = pd.DataFrame(
        {
            "event_id": np.arange(_N, dtype=np.int64),
            "ts": pd.to_datetime(ts_us, unit="us"),
            "user_id": rng.randint(0, _USERS, _N).astype(np.int64),
            "event_type": rng.choice(
                ["click", "view", "purchase"], _N
            ).astype(object),
            # abs+floor%60 drives the union interval length; include
            # negatives and >60 magnitudes to exercise the derivation
            "value": np.round(rng.uniform(-120, 120, _N), 6),
        }
    )
    df["props"] = "{}"
    out = tmp_path_factory.mktemp("tiedata")
    df.to_parquet(os.path.join(out, "events.parquet"), index=False)
    return str(out), df.assign(ts_us=ts_us)


def test_interval_union_matches_sequential_reference(spark, tie_fixture):
    sf_dir, raw = tie_fixture
    got = {
        r["user_id"]: (r["n_islands"], r["covered_us"], r["longest_us"])
        for r in registry.QUERIES["interval_union_coverage"](
            spark, sf_dir
        ).collect()
    }

    per_user: dict[int, list[tuple[int, int]]] = collections.defaultdict(list)
    for _, row in raw.iterrows():
        s = int(row.ts_us)
        e = s + (1 + int(np.floor(abs(row.value))) % 60) * 60_000_000
        per_user[int(row.user_id)].append((s, e))
    want = {}
    for u, ivs in per_user.items():
        ivs.sort()
        islands: list[list[int]] = []
        for s, e in ivs:
            # touching merges (>=), matching the operator's flag rule
            if islands and s <= islands[-1][1]:
                islands[-1][1] = max(islands[-1][1], e)
            else:
                islands.append([s, e])
        covers = [e - s for s, e in islands]
        want[u] = (len(islands), sum(covers), max(covers))
    assert got == want


def test_max_concurrent_matches_sequential_reference(spark, tie_fixture):
    sf_dir, raw = tie_fixture
    got = {
        r["user_id"]: (r["n_intervals"], r["max_concurrent"])
        for r in registry.QUERIES["max_concurrent_per_user"](
            spark, sf_dir
        ).collect()
    }

    pts: dict[int, list[tuple[int, int, int]]] = collections.defaultdict(list)
    for _, row in raw.iterrows():
        s = int(row.ts_us)
        e = s + (60 + int(row.event_id) % 540) * 1_000_000
        pts[int(row.user_id)].append((s, 1, int(row.event_id)))
        pts[int(row.user_id)].append((e, -1, int(row.event_id)))
    want = {}
    for u, events in pts.items():
        # the operator's documented total order: (t, delta, event_id) —
        # the -1 sorts first at equal instants (end-exclusive sweep)
        events.sort()
        run = best = 0
        for _t, d, _eid in events:
            run += d
            best = max(best, run)
        want[u] = (sum(1 for _, d, _ in events if d == 1), best)
    assert got == want
