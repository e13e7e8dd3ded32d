"""Temporal-join and curation operators: tie semantics on crafted inputs
plus the plan-shape (scale) assertions for every round-3 operator."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

import data_engineering_spotify_etl_airflow_aws_spark as engine
from data_engineering_spotify_etl_airflow_aws_spark import plans
from data_engineering_spotify_etl_airflow_aws_spark.operators.temporal import (
    asof_join,
)
from data_engineering_spotify_etl_airflow_aws_spark.registry import QUERIES

from .conftest import SF_CORRECT

engine.load_all_operators()

_T = lambda h, m=0, s=0: dt.datetime(2024, 1, 1, h, m, s)  # noqa: E731


def test_asof_join_tie_semantics(spark):
    """The contract corners the fixture can't hit: inclusive <= (build row
    AT the probe instant matches), max-build_id tie-break among equal
    (key, ts), strictly-later build rows invisible, and all-null when no
    build row precedes the probe."""
    probe = spark.createDataFrame(
        [
            (100, 1, _T(12)),   # build rows at 12:00 exactly -> inclusive
            (101, 1, _T(10)),   # before every build row -> nulls
            (102, 2, _T(15)),   # key 2: picks its own side, not key 1's
        ],
        "pid bigint, k bigint, ts timestamp",
    )
    build = spark.createDataFrame(
        [
            (1, _T(12), 7, "a"),   # tie on (k, ts): bid 9 must win
            (1, _T(12), 9, "b"),
            (1, _T(13), 50, "late"),  # after probe 100 -> invisible
            (2, _T(14), 3, "c"),
        ],
        "k bigint, ts timestamp, bid bigint, tag string",
    )
    out = {
        r.pid: r
        for r in asof_join(
            probe, build, key="k", ts="ts", build_id="bid", payload=["tag"]
        ).collect()
    }
    assert out[100].asof_bid == 9 and out[100].asof_tag == "b"
    assert out[100].asof_ts_us == int(_T(12).timestamp() * 1_000_000)
    assert out[101].asof_bid is None and out[101].asof_tag is None
    assert out[102].asof_bid == 3 and out[102].asof_tag == "c"


def test_asof_join_single_shuffle_plan(spark):
    """Scale contract: the as-of query shuffles exactly once on the join
    key (plus the presentation sort) - no range-join candidate explosion,
    no single-partition window."""
    df = QUERIES["asof_join_purchase_click"](spark, SF_CORRECT)
    plan = plans.executed_plan(df)
    assert plans.num_shuffles(df) <= 2  # key window + output sort
    assert "hashpartitioning(__k" in plan, "window must partition on the key"
    assert "SinglePartition" not in plan


def test_promo_range_join_is_bucketed_hash_join(spark):
    """The interval join must be the month-bucketed broadcast HASH join
    (hash probe per fact row + residual BETWEEN), never a nested loop
    that evaluates every interval against every row."""
    df = QUERIES["promo_range_join"](spark, SF_CORRECT)
    plan = plans.executed_plan(df)
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastHashJoin" in plan
    assert plans.num_shuffles(df) <= 2  # partial/final agg + output sort


def test_stratified_sample_is_stateless(spark):
    """Sampling is a pure per-row predicate: zero shuffles beyond the
    presentation sort, and deterministic across reruns."""
    df = QUERIES["stratified_sample_docs"](spark, SF_CORRECT)
    assert plans.num_shuffles(df) <= 1  # output sort only
    a = [r.doc_id for r in df.collect()]
    b = [r.doc_id for r in QUERIES["stratified_sample_docs"](spark, SF_CORRECT).collect()]
    assert a == b and len(a) > 0


def test_stratified_sample_hits_target_rates(spark):
    """Hash sampling must land near the configured per-language rates
    (exact in expectation; tolerance ~4/sqrt(n) absolute)."""
    from data_engineering_spotify_etl_airflow_aws_spark.operators.curation import (
        SAMPLE_RATES,
    )
    from data_engineering_spotify_etl_airflow_aws_spark.tables import load_table

    totals = {
        r.lang: r.n
        for r in load_table(spark, SF_CORRECT, "documents")
        .groupBy("lang")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    kept = {
        r.lang: r.n
        for r in QUERIES["stratified_sample_docs"](spark, SF_CORRECT)
        .groupBy("lang")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    for lang, total in totals.items():
        rate = SAMPLE_RATES.get(lang, SAMPLE_RATES["__default__"])
        got = kept.get(lang, 0) / total
        tol = 4.0 / (total**0.5)
        assert abs(got - rate) < tol, f"{lang}: {got:.3f} vs {rate} (tol {tol:.3f})"


def test_label_centroids_partial_agg_plan(spark):
    """Centroid agg must run map-side partial aggregation on the exploded
    (label, dim) rows - one hash shuffle plus the output sort - and return
    exactly n_labels x n_dims rows."""
    df = QUERIES["label_centroids"](spark, SF_CORRECT)
    plan = plans.executed_plan(df)
    assert plans.num_shuffles(df) <= 2
    assert plan.count("HashAggregate") >= 2, "partial + final agg expected"
    rows = df.collect()
    labels = {r.label for r in rows}
    dims = {r.dim for r in rows}
    assert len(rows) == len(labels) * len(dims)


def test_corpus_curation_bounded_shuffles(spark):
    """Curation = projections -> fingerprint dedup window -> lang agg:
    at most three shuffles (fp window, lang agg, output sort)."""
    df = QUERIES["corpus_curation_stats"](spark, SF_CORRECT)
    assert plans.num_shuffles(df) <= 3
    assert "SinglePartition" not in plans.executed_plan(df)


def test_curation_drops_low_quality_and_duplicates(spark):
    """The curated corpus must be smaller than the raw per-lang counts
    (quality gate + dedup both engage on the fixture)."""
    from data_engineering_spotify_etl_airflow_aws_spark.tables import load_table

    raw = {
        r.lang: r.n
        for r in load_table(spark, SF_CORRECT, "documents")
        .groupBy("lang")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    cur = {r.lang: r.n_docs for r in QUERIES["corpus_curation_stats"](spark, SF_CORRECT).collect()}
    assert sum(cur.values()) < sum(raw.values())
    for lang, n in cur.items():
        assert 0 < n <= raw[lang]


def test_merge_upsert_rejects_duplicate_change_keys(spark):
    """MERGE semantics: a change set with two rows for one key must raise
    (Delta/Iceberg raise on multiple matches; the full-outer-join rewrite
    would otherwise silently fan the base row out). Unique keys pass."""
    from pyspark.sql.utils import PythonException

    from data_engineering_spotify_etl_airflow_aws_spark.operators.merge import (
        merge_upsert,
    )

    base = spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string")
    dup = spark.createDataFrame(
        [(1, "x"), (1, "y"), (3, "z")], "k int, v string"
    )
    with pytest.raises(Exception, match="duplicate change-set key"):
        merge_upsert(base, dup, key="k", set_cols={"v": "v"}).collect()

    uniq = spark.createDataFrame([(1, "x"), (3, "z")], "k int, v string")
    out = {
        r.k: (r.v, r.merge_action)
        for r in merge_upsert(
            base, uniq, key="k", set_cols={"v": "v"}
        ).collect()
    }
    assert out == {
        1: ("x", "updated"),
        2: ("b", "kept"),
        3: ("z", "inserted"),
    }

    # opt-out path keeps the old fan-out behaviour for proven-unique input
    assert (
        merge_upsert(
            base, dup, key="k", set_cols={"v": "v"}, check_unique_key=False
        ).count()
        == 4
    )


def test_merge_guard_adds_no_exchange(spark):
    """The duplicate-key guard window must reuse the change-set window's
    hash partitioning (both key on the merge key), so enabling it adds
    ZERO exchanges: the registered merge plan has exactly two shuffles -
    the change-set derivation window and the base side of the full-outer
    join (round-4 verdict #6, claim in merge.py's docstring)."""
    from data_engineering_spotify_etl_airflow_aws_spark.operators.merge import (
        merge_upsert,
        merge_upsert_customer,
    )
    from data_engineering_spotify_etl_airflow_aws_spark.tables import load_table

    df = merge_upsert_customer(spark, SF_CORRECT)
    assert plans.num_shuffles(df) == 2, plans.executed_plan(df)
    # and the guard itself is exchange-free: the same merge with the
    # guard on vs off produces identical shuffle counts

    base = load_table(spark, SF_CORRECT, "customer").select(
        "c_custkey", "c_name", "c_acctbal"
    )
    changes = (
        load_table(spark, SF_CORRECT, "events")
        .groupBy(F.col("user_id").alias("c_custkey"))
        .agg(F.max("value").alias("value"))
    )
    kwargs = dict(key="c_custkey", set_cols={"c_acctbal": "value"})
    with_guard = merge_upsert(base, changes, check_unique_key=True, **kwargs)
    without = merge_upsert(base, changes, check_unique_key=False, **kwargs)
    assert plans.num_shuffles(with_guard) == plans.num_shuffles(without), (
        plans.executed_plan(with_guard)
    )


def test_asof_join_matches_reference_on_random_inputs(spark):
    """Property-based check: on random (key, ts) build/probe sets -
    including duplicate timestamps and keys with no build rows - the
    union+window as-of plan must agree with a brute-force reference
    (latest build ts <= probe ts; ties to the largest build id)."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from data_engineering_spotify_etl_airflow_aws_spark.operators.temporal import (
        asof_join,
    )

    row = st.tuples(st.integers(0, 3), st.integers(0, 20))

    @settings(
        max_examples=8,
        deadline=None,
        suppress_health_check=list(HealthCheck),
    )
    @given(
        build=st.lists(row, min_size=1, max_size=25),
        probe=st.lists(row, min_size=1, max_size=15),
    )
    def check(build, probe):
        b = spark.createDataFrame(
            [(k, t * 1000, i) for i, (k, t) in enumerate(build)],
            "k bigint, ts_ms bigint, bid bigint",
        ).select("k", F.timestamp_millis(F.col("ts_ms")).alias("ts"), "bid")
        p = spark.createDataFrame(
            [(k, t * 1000, i) for i, (k, t) in enumerate(probe)],
            "k bigint, ts_ms bigint, pid bigint",
        ).select("pid", "k", F.timestamp_millis(F.col("ts_ms")).alias("ts"))
        got = {
            r.pid: r.asof_bid
            for r in asof_join(p, b, key="k", ts="ts", build_id="bid").collect()
        }
        expect = {}
        for i, (pk, pt) in enumerate(probe):
            cands = [
                (bt, j)
                for j, (bk, bt) in enumerate(build)
                if bk == pk and bt <= pt
            ]
            expect[i] = max(cands)[1] if cands else None
        assert got == expect

    check()
