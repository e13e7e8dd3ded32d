"""Semantic checks for the statistics operators beyond oracle parity:
invariants that must hold regardless of fixture values (Gini bounds and
degenerate cases, winsorize clamp accounting, leave-fold-out exclusion,
PMI marginal consistency, seasonal-naive pairing exactness)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

import data_engineering_spotify_etl_airflow_aws_spark as engine
from data_engineering_spotify_etl_airflow_aws_spark import registry
from data_engineering_spotify_etl_airflow_aws_spark.tables import load_table

from .conftest import SF_CORRECT

engine.load_all_operators()


def test_autocorr_in_unit_interval_and_pair_counts(spark):
    rows = {
        r.lag_days: r
        for r in registry.QUERIES["autocorr_daily_value"](
            spark, SF_CORRECT
        ).collect()
    }
    assert set(rows) == {1, 7}
    n_days = (
        load_table(spark, SF_CORRECT, "events")
        .select(F.to_date("ts").alias("d"))
        .distinct()
        .count()
    )
    # a contiguous daily series loses exactly `lag` pairs at the head
    assert rows[1].n_pairs <= n_days - 1
    assert rows[7].n_pairs <= n_days - 7
    for r in rows.values():
        assert -1.0 - 1e-9 <= r.autocorr_value <= 1.0 + 1e-9


def test_winsorized_mean_between_clamp_bounds(spark):
    for r in registry.QUERIES["winsorized_stats_by_type"](
        spark, SF_CORRECT
    ).collect():
        assert r.p05_value <= r.winsorized_mean <= r.p95_value
        # at most 5% of mass can sit strictly outside either bound
        assert r.n_clamped_low <= math.ceil(r.n_values * 0.05)
        assert r.n_clamped_high <= math.ceil(r.n_values * 0.05)


def test_target_encoding_excludes_own_fold(spark):
    """Each fold's encoding must equal the mean computed over the OTHER
    folds only - recompute independently from the raw join."""
    enc = {
        (r.segment, r.fold): r.encoding_value
        for r in registry.QUERIES["target_encoding_segment"](
            spark, SF_CORRECT
        ).collect()
    }
    orders = load_table(spark, SF_CORRECT, "orders")
    cust = load_table(spark, SF_CORRECT, "customer")
    j = orders.join(
        cust, orders.o_custkey == cust.c_custkey
    ).select(
        F.col("c_mktsegment").alias("segment"),
        (
            F.expr(
                "cast(conv(substring(md5(cast(concat('te:', "
                "cast(o_orderkey as string)) as binary)), 1, 8), 16, 10) "
                "as bigint) % 5"
            )
        ).alias("fold"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    rows = j.collect()
    for (seg, fold), got in enc.items():
        others = [r.cents for r in rows if r.segment == seg and r.fold != fold]
        want = round(sum(others) / len(others) / 100, 6)
        assert abs(got - want) < 1e-6, (seg, fold, got, want)


def test_gini_zero_on_uniform_counts(spark):
    """Sanity-check the histogram Gini formula on a degenerate uniform
    distribution (every key has the same count -> Gini == 0) by running
    the same arithmetic the operator uses."""
    df = spark.range(100).select(
        (F.col("id") % 10).alias("k")
    )  # 10 keys x 10 rows
    cnts = df.groupBy("k").agg(F.count("*").alias("c"))
    hist = cnts.groupBy("c").agg(F.count("*").alias("n")).collect()
    assert len(hist) == 1 and hist[0].n == 10
    # pair_sum = 2*sum n*(c*cumN_prev - cumS_prev) == 0 with one bucket
    # (cum_prev are 0), giving gini 0 - the formula's fixed point.


def test_skew_profile_consistency(spark):
    r = registry.QUERIES["skew_profile_orders"](spark, SF_CORRECT).collect()[0]
    orders = load_table(spark, SF_CORRECT, "orders")
    assert r.n_orders == orders.count()
    assert r.n_keys == orders.select("o_custkey").distinct().count()
    assert 0.0 <= r.gini_value <= 1.0
    assert abs(r.top_share - r.max_orders / r.n_orders) < 1e-6


def test_pmi_cells_cover_corpus_and_expected_marginals(spark):
    rows = registry.QUERIES["pmi_lang_source"](spark, SF_CORRECT).collect()
    docs = load_table(spark, SF_CORRECT, "documents")
    n = docs.count()
    assert sum(r.n_docs for r in rows) == n
    # expected counts under independence sum to N over the FULL lang x
    # source grid; over the observed cells only, the sum can fall short
    # by exactly the unobserved cells' expectation (and never exceed N)
    assert 0 < sum(r.expected_docs for r in rows) <= n + 1e-2
    # PMI sign must match observed-vs-expected direction
    for r in rows:
        if r.n_docs > r.expected_docs:
            assert r.pmi_value >= 0
        elif r.n_docs < r.expected_docs:
            assert r.pmi_value <= 0


def test_seasonal_naive_pairs_are_calendar_exact(spark):
    """lag-vs-join distinction: every pair must be exactly 7 calendar days
    apart, so n_pairs per type can never exceed n_days - 7."""
    out = {
        r.event_type: r.n_pairs
        for r in registry.QUERIES["seasonal_naive_error"](
            spark, SF_CORRECT
        ).collect()
    }
    daily = (
        load_table(spark, SF_CORRECT, "events")
        .groupBy("event_type")
        .agg(F.countDistinct(F.to_date("ts")).alias("nd"))
        .collect()
    )
    nd = {r.event_type: r.nd for r in daily}
    for t, pairs in out.items():
        assert pairs <= nd[t] - 7


def test_trend_ols_identities(spark):
    r = registry.QUERIES["daily_trend_ols"](spark, SF_CORRECT).collect()[0]
    assert 0.0 <= r.r2_value <= 1.0
    # the regression line passes through the centroid: intercept +
    # slope*mean(x) == mean(y). Recompute means independently.
    daily = (
        load_table(spark, SF_CORRECT, "events")
        .groupBy(F.to_date("ts").alias("day"))
        .agg((F.sum(F.floor(F.col("value") * 1e6)) / 1e6).alias("y"))
        .collect()
    )
    days = sorted(r2.day for r2 in daily)
    xs = [(d - days[0]).days for d in days]
    ys = {r2.day: r2.y for r2 in daily}
    mean_x = sum(xs) / len(xs)
    mean_y = sum(ys.values()) / len(ys)
    assert abs((r.intercept_value + r.slope_value * mean_x) - mean_y) < 0.01
    assert r.n_days == len(daily)


def test_cusum_day_in_range_and_nonnegative(spark):
    r = registry.QUERIES["cusum_changepoint_daily"](spark, SF_CORRECT).collect()[
        0
    ]
    assert r.max_cusum_value >= 0
    days = (
        load_table(spark, SF_CORRECT, "events")
        .select(F.to_date("ts").alias("d"))
        .agg(F.min("d").alias("lo"), F.max("d").alias("hi"))
        .collect()[0]
    )
    assert days.lo <= r.change_day <= days.hi


def test_dow_shares_partition_each_type(spark):
    rows = registry.QUERIES["dow_seasonality_profile"](
        spark, SF_CORRECT
    ).collect()
    per_type: dict[str, float] = {}
    for r in rows:
        assert 1 <= r.dow_iso <= 7
        per_type[r.event_type] = per_type.get(r.event_type, 0.0) + r.share_of_type
    for t, s in per_type.items():
        assert abs(s - 1.0) < 1e-4, (t, s)


def test_benford_shares_and_chi2(spark):
    rows = registry.QUERIES["benford_first_digit"](spark, SF_CORRECT).collect()
    assert {r.digit for r in rows} == set(range(1, 10))
    assert abs(sum(r.observed_share for r in rows) - 1.0) < 1e-4
    assert abs(sum(r.benford_share for r in rows) - 1.0) < 1e-4
    assert all(r.chi2_contrib >= 0 for r in rows)


def test_orc_roundtrip_conserves_rows(spark):
    rows = registry.QUERIES["orc_roundtrip_agg"](spark, SF_CORRECT).collect()
    total = sum(r.n_events for r in rows)
    assert total == load_table(spark, SF_CORRECT, "events").count()


def test_rate_limit_accounting(spark):
    rows = registry.QUERIES["rate_limit_flags"](spark, SF_CORRECT).collect()
    ev = load_table(spark, SF_CORRECT, "events")
    assert sum(r.n_events for r in rows) == ev.count()
    for r in rows:
        assert 0 <= r.n_throttled <= r.n_events
        assert abs(r.throttle_rate - r.n_throttled / r.n_events) < 1e-6
    # recompute one bucket by hand: the cap must bind exactly past 3
    from pyspark.sql.window import Window as W

    wb = W.partitionBy("user_id", F.date_trunc("hour", F.col("ts"))).orderBy(
        "ts", "event_id"
    )
    over = (
        ev.select(F.row_number().over(wb).alias("rn"))
        .where(F.col("rn") > 3)
        .count()
    )
    assert sum(r.n_throttled for r in rows) == over


def test_anomaly_days_exceed_threshold(spark):
    rows = registry.QUERIES["dow_adjusted_anomaly_days"](
        spark, SF_CORRECT
    ).collect()
    assert rows  # 1.5-sigma must fire on the fixture (see operator note)
    for r in rows:
        assert abs(r.z_value) > 1.5
        assert r.day_value > 0


def test_fof_recs_are_novel_and_ranked(spark):
    rows = registry.QUERIES["supplier_recs_fof"](spark, SF_CORRECT).collect()
    assert rows
    orders = load_table(spark, SF_CORRECT, "orders")
    li = load_table(spark, SF_CORRECT, "lineitem")
    # ownership in the rec graph = REPEAT-trade edges (>= 2 lineitems),
    # matching the operator's thresholded edge builder
    owned = {
        (r.c, r.s)
        for r in orders.join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy(
            F.col("o_custkey").alias("c"), F.col("l_suppkey").alias("s")
        )
        .agg(F.count("*").alias("n"))
        .where(F.col("n") >= 2)
        .collect()
    }
    per_cust: dict[int, list] = {}
    for r in rows:
        # a recommendation must be a supplier the customer does NOT use
        assert (r.custkey, r.rec_suppkey) not in owned
        assert r.n_connectors >= 1 and r.aa_score > 0
        per_cust.setdefault(r.custkey, []).append(r)
    for c, crows in per_cust.items():
        ranks = sorted(r.rank for r in crows)
        assert ranks == list(range(1, len(ranks) + 1))
        by_rank = sorted(crows, key=lambda r: r.rank)
        scores = [r.aa_score for r in by_rank]
        assert scores == sorted(scores, reverse=True)
