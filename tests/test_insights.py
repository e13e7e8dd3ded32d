"""Semantic checks for the insights operators beyond oracle parity:
triangle identities on a hand-built graph, Gini bounds, KL cell
consistency, attribution conservation, streak accounting, RRF list
properties, stickiness bounds."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

import data_engineering_spotify_etl_airflow_aws_spark as engine
from data_engineering_spotify_etl_airflow_aws_spark import registry
from data_engineering_spotify_etl_airflow_aws_spark.operators.insights import (
    part_triangle_stats,
)
from data_engineering_spotify_etl_airflow_aws_spark.tables import load_table

from .conftest import SF_CORRECT

engine.load_all_operators()


def test_triangle_stats_on_hand_graph(spark):
    # K4 on {1,2,3,4} (4 triangles, every node in 3) plus a pendant node
    # 5 attached to 1 (degree 1, no triangle, NULL clustering).
    k4 = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    edges = spark.createDataFrame(k4 + [(1, 5)], ["u", "v"])
    rows = {r.part_key: r for r in part_triangle_stats(edges).collect()}
    assert set(rows) == {1, 2, 3, 4, 5}
    for n in (2, 3, 4):
        assert rows[n].degree == 3
        assert rows[n].n_tri == 3
        assert rows[n].clustering == 1.0
    assert rows[1].degree == 4
    assert rows[1].n_tri == 3  # the pendant edge adds no triangle
    assert math.isclose(rows[1].clustering, 0.5)  # 2*3/(4*3)
    assert rows[5].degree == 1
    assert rows[5].n_tri == 0
    assert rows[5].clustering is None


def test_triangle_total_is_one_third_of_node_sum(spark):
    # every triangle credits exactly its 3 corners, so the per-node
    # column must sum to 3x the distinct-triangle count
    df = registry.QUERIES["triangle_count_parts"](spark, SF_CORRECT)
    total = df.agg(F.sum("n_tri")).collect()[0][0]
    assert total > 0 and total % 3 == 0


def test_gini_bounds_and_segments(spark):
    rows = registry.QUERIES["gini_customer_value"](spark, SF_CORRECT).collect()
    assert len(rows) >= 2
    for r in rows:
        assert 0.0 <= r.gini < 1.0
        assert r.n_customers > 0 and r.total_cents > 0


def test_kl_cells_match_marginals(spark):
    rows = registry.QUERIES["kl_divergence_source_lang"](
        spark, SF_CORRECT
    ).collect()
    # p sums to 1 within each source, and the per-source KL sum
    # (the consumer's fold) is non-negative up to rounding of the terms
    by_source: dict[str, list] = {}
    for r in rows:
        by_source.setdefault(r.source, []).append(r)
    for cells in by_source.values():
        assert math.isclose(sum(c.p_in_source for c in cells), 1.0, rel_tol=1e-9)
        assert sum(c.kl_term for c in cells) >= -1e-5


def test_attribution_conserves_purchases(spark):
    rows = registry.QUERIES["last_touch_attribution"](
        spark, SF_CORRECT
    ).collect()
    ev = load_table(spark, SF_CORRECT, "events")
    n_purch = ev.where(F.col("event_type") == "purchase").count()
    assert sum(r.n_conversions for r in rows) == n_purch
    assert all(r.touch_type != "purchase" for r in rows)


def test_streak_histogram_accounts_every_active_user(spark):
    rows = registry.QUERIES["user_activity_streaks"](
        spark, SF_CORRECT
    ).collect()
    n_users = (
        load_table(spark, SF_CORRECT, "events")
        .select("user_id")
        .distinct()
        .count()
    )
    assert sum(r.n_users for r in rows) == n_users
    n_days = (
        load_table(spark, SF_CORRECT, "events")
        .select(F.to_date("ts"))
        .distinct()
        .count()
    )
    assert all(1 <= r.streak_days <= n_days for r in rows)


def test_rrf_scores_are_descending_top20(spark):
    rows = registry.QUERIES["reciprocal_rank_fusion"](
        spark, SF_CORRECT
    ).collect()
    assert len(rows) == 20
    scores = [r.rrf_score for r in rows]
    assert scores == sorted(scores, reverse=True)
    # best possible score is rank 1 on both lists
    assert scores[0] <= 2.0 / 61.0 + 1e-12
    assert all(
        (r.r_qty is not None) or (r.r_rev is not None) for r in rows
    )


def test_stickiness_bounded_by_one(spark):
    rows = registry.QUERIES["dau_mau_stickiness"](spark, SF_CORRECT).collect()
    assert rows
    for r in rows:
        assert 0.0 < r.stickiness <= 1.0
        assert r.dau <= r.mau


def test_auc_bounds_and_class_totals(spark):
    r = registry.QUERIES["auc_click_propensity"](spark, SF_CORRECT).collect()[0]
    n_users = (
        load_table(spark, SF_CORRECT, "events")
        .select("user_id")
        .distinct()
        .count()
    )
    assert r.n_pos + r.n_neg == n_users
    assert r.n_pos > 0 and r.n_neg > 0  # threshold keeps both classes alive
    assert 0.0 <= r.auc <= 1.0


def test_multi_touch_conserves_credit(spark):
    rows = registry.QUERIES["multi_touch_attribution"](
        spark, SF_CORRECT
    ).collect()
    assert {r.touch_type for r in rows} == {"view", "click", "signup", "error"}
    total = sum(r.credit_u6 for r in rows)
    # conversions with at least one preceding touch each hand out 1e6
    # micro-units minus at most 4 integer-floor losses
    last = registry.QUERIES["last_touch_attribution"](
        spark, SF_CORRECT
    ).collect()
    n_touched = sum(r.n_conversions for r in last if r.touch_type != "none")
    assert (1_000_000 - 4) * n_touched <= total <= 1_000_000 * n_touched


def test_hhi_between_uniform_and_monopoly(spark):
    for r in registry.QUERIES["hhi_supplier_concentration"](
        spark, SF_CORRECT
    ).collect():
        assert r.n_suppliers > 0
        assert 1.0 / r.n_suppliers - 1e-6 <= r.hhi <= 1.0


def test_trending_scores_bounded_and_sorted(spark):
    rows = registry.QUERIES["trending_parts_decayed"](
        spark, SF_CORRECT
    ).collect()
    assert len(rows) == 20
    scores = [r.trend_score_u6 for r in rows]
    assert scores == sorted(scores, reverse=True)
    for r in rows:
        assert 0 <= r.trend_score_u6 <= 1_000_000 * r.n_lineitems


def test_kmv_overlap_identities(spark):
    rows = registry.QUERIES["kmv_user_overlap"](spark, SF_CORRECT).collect()
    assert len(rows) == 10  # C(5,2) event-type pairs
    for r in rows:
        assert r.type_a < r.type_b
        # set algebra on the exact side
        assert r.exact_inter <= r.exact_union
        # estimates are positive and the intersection estimate can never
        # exceed the union estimate (jaccard <= 1; est_intersection is
        # rounded to 4 decimals, so allow that much slack)
        assert 0 < r.est_intersection <= r.est_union + 1e-4
        assert r.union_within == 1 and r.inter_within == 1


def test_compaction_preserves_content_and_reduces_files(spark):
    r = registry.QUERIES["compact_small_files"](spark, SF_CORRECT).collect()[0]
    assert r.n_files_before == 64
    assert r.n_files_after == 8
    n_events = load_table(spark, SF_CORRECT, "events").count()
    assert r.n_rows == n_events


def test_psi_shares_sum_to_one_per_type(spark):
    rows = registry.QUERIES["psi_value_drift"](spark, SF_CORRECT).collect()
    by_type: dict[str, list] = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(r)
    assert len(by_type) == 5
    for cells in by_type.values():
        assert math.isclose(sum(c.p_base for c in cells), 1.0, rel_tol=1e-9)
        assert math.isclose(sum(c.p_cur for c in cells), 1.0, rel_tol=1e-9)
        assert all(0 <= c.bucket <= 9 for c in cells)


def test_entropy_bounded_by_log_cardinality(spark):
    rows = registry.QUERIES["column_entropy_profile"](
        spark, SF_CORRECT
    ).collect()
    assert len(rows) == 6
    for r in rows:
        assert 0 <= r.entropy_n9 <= math.log(r.n_distinct) * 1e9 + 1
        assert r.n_distinct <= r.n_rows


def test_time_to_convert_covers_subset_of_users(spark):
    rows = registry.QUERIES["time_to_convert_hours"](
        spark, SF_CORRECT
    ).collect()
    n_users = (
        load_table(spark, SF_CORRECT, "events")
        .select("user_id")
        .distinct()
        .count()
    )
    assert 0 < sum(r.n_users for r in rows) <= n_users
    assert all(r.hours_to_convert >= 0 for r in rows)


def test_calibration_partitions_all_users(spark):
    rows = registry.QUERIES["calibration_curve_clicks"](
        spark, SF_CORRECT
    ).collect()
    auc_row = registry.QUERIES["auc_click_propensity"](
        spark, SF_CORRECT
    ).collect()[0]
    assert sum(r.n_users for r in rows) == auc_row.n_pos + auc_row.n_neg
    assert sum(r.n_converted for r in rows) == auc_row.n_pos
    for r in rows:
        assert 0 <= r.score_decile <= 9
        assert 0.0 <= r.conv_rate <= 1.0
        assert r.min_score <= r.max_score


def test_new_returning_split_accounts_everyone(spark):
    rows = registry.QUERIES["new_vs_returning_daily"](
        spark, SF_CORRECT
    ).collect()
    n_users = (
        load_table(spark, SF_CORRECT, "events")
        .select("user_id")
        .distinct()
        .count()
    )
    # every user is new exactly once
    assert sum(r.new_users for r in rows) == n_users
    first = min(rows, key=lambda r: r.day)
    assert first.returning_users == 0  # nobody returns on day one


def test_repeat_purchase_gaps_nonnegative(spark):
    rows = registry.QUERIES["repeat_purchase_gap_days"](
        spark, SF_CORRECT
    ).collect()
    n_purch = (
        load_table(spark, SF_CORRECT, "events")
        .where(F.col("event_type") == "purchase")
        .count()
    )
    n_buyers = (
        load_table(spark, SF_CORRECT, "events")
        .where(F.col("event_type") == "purchase")
        .select("user_id")
        .distinct()
        .count()
    )
    # each buyer's first purchase has no predecessor
    assert sum(r.n_gaps for r in rows) == n_purch - n_buyers
    assert all(r.gap_days >= 0 for r in rows)


def test_abc_classes_follow_pareto_shape(spark):
    rows = registry.QUERIES["abc_classification_parts"](
        spark, SF_CORRECT
    ).collect()
    by_brand: dict[str, dict] = {}
    for r in rows:
        by_brand.setdefault(r.p_brand, {})[r.abc_class] = r
    for brand, classes in by_brand.items():
        assert "A" in classes, brand
        total = sum(c.class_rev_u6 for c in classes.values())
        # construction guarantees: A stops at <=80% of revenue and A+B
        # at <=95% (the part CROSSING a boundary falls to the next class)
        assert classes["A"].class_rev_u6 <= 0.8 * total + 1
        ab = classes["A"].class_rev_u6 + (
            classes["B"].class_rev_u6 if "B" in classes else 0
        )
        assert ab <= 0.95 * total + 1


def test_share_of_parent_sums_to_one(spark):
    rows = registry.QUERIES["rollup_share_of_parent"](
        spark, SF_CORRECT
    ).collect()
    assert len(rows) == 25
    by_region: dict[str, list] = {}
    for r in rows:
        by_region.setdefault(r.region, []).append(r)
    assert len(by_region) == 5
    region_shares = set()
    for region, cells in by_region.items():
        assert math.isclose(
            sum(c.share_of_region for c in cells), 1.0, rel_tol=1e-9
        )
        region_shares.add(cells[0].region_share_of_total)
    assert math.isclose(sum(region_shares), 1.0, rel_tol=1e-9)


def test_cumulative_reach_is_monotone_and_totals(spark):
    rows = sorted(
        registry.QUERIES["cumulative_reach_daily"](spark, SF_CORRECT).collect(),
        key=lambda r: r.day,
    )
    n_users = (
        load_table(spark, SF_CORRECT, "events")
        .select("user_id")
        .distinct()
        .count()
    )
    assert rows[-1].cumulative_reach == n_users
    reaches = [r.cumulative_reach for r in rows]
    assert reaches == sorted(reaches)
    assert sum(r.new_users for r in rows) == n_users


def test_percentile_bands_ordered(spark):
    for r in registry.QUERIES["daily_value_percentile_bands"](
        spark, SF_CORRECT
    ).collect():
        assert r.p50_u6_x10 <= r.p90_u6_x10
        assert r.n_values > 0


def test_lexical_complexity_ratios(spark):
    rows = registry.QUERIES["lexical_complexity_scores"](
        spark, SF_CORRECT
    ).collect()
    assert rows
    for r in rows[:50]:
        assert r.n_words > 0
        assert 0.0 <= r.complex_word_ratio <= 1.0
        # every word has at least 0 vowel groups; ratio sanity only
        assert r.syllables_per_word >= 0.0


def test_backlog_nonnegative_and_closes_out(spark):
    rows = sorted(
        registry.QUERIES["order_backlog_daily"](spark, SF_CORRECT).collect(),
        key=lambda r: r.day,
    )
    assert all(r.open_backlog >= 0 for r in rows)
    # every order eventually ships: the final running value is zero
    assert rows[-1].open_backlog == 0
    # scope: orders with at least one lineitem (a no-lineitem order has
    # no ship date, so it has no lifecycle to track - 257 such orders
    # exist in this synthetic fixture)
    n_orders = (
        load_table(spark, SF_CORRECT, "lineitem")
        .select("l_orderkey")
        .distinct()
        .join(
            load_table(spark, SF_CORRECT, "orders").select(
                F.col("o_orderkey").alias("l_orderkey")
            ),
            "l_orderkey",
        )
        .count()
    )
    assert sum(r.opened for r in rows) == n_orders
    assert sum(r.closed for r in rows) == n_orders


def test_retention_by_age_censored_denominator(spark):
    rows = sorted(
        registry.QUERIES["retention_by_age"](spark, SF_CORRECT).collect(),
        key=lambda r: r.age_days,
    )
    assert rows[0].age_days == 0
    # at age 0 everyone at risk is active (first day IS an active day)
    assert rows[0].retention == 1.0
    n_users = (
        load_table(spark, SF_CORRECT, "events")
        .select("user_id")
        .distinct()
        .count()
    )
    assert rows[0].at_risk_users == n_users
    for r in rows:
        assert 0.0 < r.retention <= 1.0
        assert r.active_users <= r.at_risk_users
    # censoring: the at-risk population never grows with age
    risks = [r.at_risk_users for r in rows]
    assert risks == sorted(risks, reverse=True)


def test_zipf_fit_is_nonincreasing_fit(spark):
    r = registry.QUERIES["zipf_token_slope"](spark, SF_CORRECT).collect()[0]
    assert r.vocab_size > 1
    assert r.zipf_slope <= 0.0  # frequency cannot rise with rank
    assert 0.0 <= r.r2 <= 1.0
