"""Opt-in parity for the four quadratic-oracle exclusions, on the
deterministic 5k-doc hash sample of the sf1 documents table — the
standing at-scale VALUE evidence the r14 verdict asked for (ask #3).

The sf1 suite excludes these four because their ORACLES are deliberate
brute-force proofs (all-pairs list-intersections; a recursive-CTE
connected-components walk) that cost hours-to-days against 50k docs.
The sample restores oracle feasibility at the sf0.1 pair count while
keeping sf1 DATA statistics: sf1 vocabulary, sf1 shingle distributions,
all ten copy bijections represented (~515 docs per 'a'..'i'-prefixed
copy). Near-dup pairs land on hash-random ids, so ~10% of docs keeps
~1% of pairs — about 25 expected positives, enough that agreement is
non-vacuous (and the suite does not REQUIRE rows>0, per the standing
scale rule: agreement is the assertion).

Enable with
    SPARK_GRAFT_SF1_SAMPLED_PARITY=1 python -m pytest tests/test_parity_sf1_sampled.py

Fixture: data/sf1_sample (tools/gen_sf1_sample.py — documents sampled
where the first two hex digits of md5(doc_id) < 0x1A; other tables
symlinked from sf1). Outcomes append to SWEEPS.json
(sf1_sampled_quadratic_parity).
"""

from __future__ import annotations

import os

import pytest

import data_engineering_spotify_etl_airflow_aws_spark as engine
from data_engineering_spotify_etl_airflow_aws_spark import registry

from .conftest import make_duckdb
from .test_oracle_parity import rows_to_multiset

engine.load_all_operators()

SAMPLE = os.environ.get(
    "SPARK_GRAFT_SF1_SAMPLE_DIR", "/root/repo/data/sf1_sample"
)

# exactly the sf1 suite's SF1_ORACLE_INFEASIBLE keys — a new exclusion
# there must gain sampled evidence here (guarded by the test below)
QUADRATIC_EXCLUSIONS = (
    "ngram_jaccard_near_dup",
    "containment_near_dup",
    "near_dup_recall_eval",
    "dedup_clusters",
)

pytestmark = [
    pytest.mark.skipif(
        os.environ.get("SPARK_GRAFT_SF1_SAMPLED_PARITY", "") != "1",
        reason="sampled-subcorpus parity is opt-in "
        "(SPARK_GRAFT_SF1_SAMPLED_PARITY=1); it runs the four "
        "quadratic-oracle exclusions' full brute-force oracles "
        "(~minutes each)",
    ),
    pytest.mark.skipif(
        not os.path.isdir(SAMPLE),
        reason=f"sampled fixture missing at {SAMPLE}; regenerate with "
        "tools/gen_sf1_sample.py",
    ),
]


def test_exclusion_lists_in_sync():
    from .test_parity_sf1 import SF1_ORACLE_INFEASIBLE

    assert set(QUADRATIC_EXCLUSIONS) == set(SF1_ORACLE_INFEASIBLE), (
        "a new sf1 oracle exclusion must gain sampled-subcorpus value "
        "evidence here"
    )


@pytest.fixture(scope="module")
def ducks():
    con = make_duckdb(SAMPLE)
    yield con
    con.close()


@pytest.mark.parametrize("name", QUADRATIC_EXCLUSIONS)
def test_sampled_parity(name, spark, ducks):
    sdf = registry.QUERIES[name](spark, SAMPLE)
    rel = ducks.execute(registry.ORACLES[name])
    duck_cols = [d[0] for d in rel.description]
    duck_rows = rel.fetchall()
    assert sorted(sdf.columns) == sorted(duck_cols)
    s = rows_to_multiset(sdf.columns, [tuple(r) for r in sdf.collect()])
    d = rows_to_multiset(duck_cols, duck_rows)
    assert len(s) == len(d)
    assert s == d
