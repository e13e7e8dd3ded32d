"""Opt-in oracle parity at sf0.1 - ten times the driver's correctness
scale - for the queries most exposed to scale-dependent divergence
(decimal overflow, hash-order flips, threshold boundary effects,
fixed-count picks interacting with a larger corpus).

Off by default (several minutes of Spark+DuckDB work); enable with
    SPARK_GRAFT_SF01_PARITY=1 python -m pytest tests/test_parity_sf01.py

Round-6 coverage: this list caught a REAL bug (label_centroids decimal
half-tie divergence, fixed in the same round), and a one-off sweep then
verified 121 of the 123 registered queries green at sf0.1; the 21
late-round-6 additions were all swept green at sf0.1 the same way (12
of them kept here as standing at-risk entries). The two never swept -
ngram_jaccard_near_dup and dedup_clusters - are bounded by ORACLE cost,
not engine cost (DuckDB's all-pairs Jaccard over 5000 docs runs
>10 min; Spark's prefix-filtered side finishes in ~13 s); their values
are exact integer/string set operations outside the float-tie risk
class, and both hold green sf0.01 driver audits.

The TPC-H completion batch (Q2/Q4/Q7/Q8/Q9/Q11/Q12/Q13/Q16/Q17/Q20/Q21)
was swept green at sf0.1 the round it landed; the five with tie- or
threshold-prone ingredients stay here as standing entries. The
statistics + ML-prep batches (12 queries) were swept green at sf0.1 the
session they landed; the six with float/threshold ingredients stay here.
"""

from __future__ import annotations

import os

import pytest

import data_engineering_spotify_etl_airflow_aws_spark as engine
from data_engineering_spotify_etl_airflow_aws_spark import registry

from .conftest import TESTDATA, make_duckdb
from .test_oracle_parity import rows_to_multiset

engine.load_all_operators()

SF01 = f"{TESTDATA}/sf0.1"

AT_RISK = [
    "label_centroids",  # the query that EXPOSED the decimal-tie bug (r6)
    "time_weighted_avg_value",
    "value_zscore_outliers",
    "daily_value_correlation",
    "orders_table_checksum",
    "incremental_agg_refresh",
    "kmeans_embedding_clusters",
    "sample_exact_k_per_lang",
    "lang_temperature_resample",
    "max_concurrent_per_user",
    "topk_similar_per_query",
    "ivf_topk_similar",
    "hard_negative_mining",
    "vocab_oov_rate",
    "cohort_daily_retention",
    "fuzzy_name_matches",
    "snapshot_diff_orders",
    "dq_constraint_violations",
    "table_profile_orders",
    "funnel_view_click_purchase",
    "term_posting_lists",
    "skew_salted_join_agg",
    "bucketed_colocated_join",
    "dynamic_partition_pruned_join",
    # late-round-6 additions with scale-exposed ingredients: fixed-count
    # hash-order picks against a 10x corpus (recall eval, GDPR batch),
    # float micro-unit means (dim stats), md5 bucket assignment (split),
    # decimal-exact max ties (Q15) and scalar thresholds (Q22/Q6).
    "ann_recall_eval",
    "embedding_dim_stats",
    "cascade_delete_users",
    "hash_split_assignment",
    "tpch_q6_forecast_revenue",
    "tpch_q15_top_supplier",
    "tpch_q22_dormant_balance",
    "dedup_rolling_window",
    "sketch_rollup_users",
    # semantic-prune / moments batch: cosine threshold at 10x pair count
    # (semdedup), >2^53 integer moments through the VARCHAR-hop double
    # conversion (covariance, slopes - the DuckDB int128 truncation find)
    "semdedup_embedding_prune",
    "embedding_covariance_matrix",
    "user_value_trend_slopes",
    # drawdown/MV-maintenance batch: 10x-long running-sum windows
    # (drawdown), decimal negation merge vs full recompute (retractable),
    # hugeint pair products + share division (join profile)
    "max_drawdown_per_user",
    "retractable_agg_refresh",
    "join_cardinality_profile",
    # KS max-ECDF-gap + critical-value threshold are float comparisons
    # (containment_near_dup is excluded like ngram_jaccard: its all-pairs
    # ORACLE is what's slow at sf0.1, the values are exact set ops)
    "ks_test_click_vs_purchase",
    # bootstrap replica means are order statistics over float divisions;
    # the curve's level cells shift with a 10x corpus
    "bootstrap_ci_event_value",
    "nested_subsample_curve",
    # chained float arithmetic off the integer moments (64-term sums)
    "pca_power_iteration",
    # decimal revenue ranking ties at 10x part count; gram products near
    # wider counts; minute-boundary lag flags
    "topk_plus_other_parts",
    "event_type_gram_matrix",
    "freshness_sla_by_type",
    # re-quantized centroid moments through the VARCHAR hop; close-
    # boundary membership + share division on 10x daily totals
    "embedding_centroid_drift",
    "late_data_restatement",
    # decimal op-algebra payloads at 10x keys; GROUPING() flags across a
    # wider month domain
    "cdc_changelog_compaction",
    "rollup_lattice_profile",
    # RANGE-frame peers over 10x denser timestamps; gap-moment VARCHAR
    # hop; censor-horizon boundary membership
    "trailing_7d_sum_per_event",
    "interarrival_stats_by_type",
    "churn_label_generation",
    # band-blocked hamming pairs at 10x doc count (lossless claim);
    # two-level gap flags on denser streams; QI buckets over wider values
    "simhash_hamming_pairs",
    "macro_session_rollup",
    "k_anonymity_profile",
    # hash-rank draws at 10x users; 64-bit gram keys at 10x gram count;
    # LPA tie flips on denser co-purchase neighborhoods
    "negative_sampling_recs",
    "dup_ngram_span_share",
    "label_propagation_communities",
    # split-hash membership at 10x interactions; ln/sqrt z-score chain
    # on a 10x vocabulary; rank ties on denser weekly revenue
    "recsys_holdout_eval",
    "logodds_distinctive_terms",
    "rank_movers_wow",
    # full-outer watermark flush on 10x stream volume; band-boundary
    # decile arithmetic on a 10x user population
    "stream_full_join_click_purchase",
    "decile_lift_table",
    # micro-grid equality classification on 10x orders; first-seen
    # bucket ties on a 10x vocabulary
    "order_header_reconcile",
    "heaps_law_curve",
    # micro-quantized silhouette on 10x vectors; running-max island
    # merges on denser per-user streams
    "simplified_silhouette_by_label",
    "interval_union_coverage",
    # range-frame boundaries on denser per-user streams; dyadic-weight
    # sums at 10x daily counts; PMI rank ties on a 10x pair space
    "feature_store_training_set",
    "bigram_pmi_collocations",
    "ewma_control_chart",
    # signature-group ties at 10x docs; quantized decomposition on
    # 10x daily sums; forward-carry ties on denser purchase streams
    "golden_doc_selection",
    "stl_daily_decomposition",
    "asof_forward_next_purchase",
    # decorrelated-lateral rank ties at 10x customers; removal share on
    # a 10x pair set
    "lateral_topk_per_nation",
    "near_dup_removal_impact",
    # bin-boundary floors on a 10x pair set; band cumulative shares at
    # 10x docs; greedy-fold merge ties on a 10x pair table
    "near_dup_threshold_sweep",
    "quality_pruning_curve",
    "bpe_apply_top_merge",
    # quantized-ln entropy boundaries on 10x docs
    "char_entropy_gate",
    # per-part effect quantization at 10x volume; trig-term sums on 10x
    # events; quantized-ln regression on denser degree histograms
    "price_volume_mix_bridge",
    "diurnal_circular_profile",
    "degree_powerlaw_check",
    # lift ratios on 10x sessions; range-frame burst ties on denser
    # error streams
    "session_type_affinity",
    "error_burst_peaks",
    # cumulative-weight median boundary at 10x quantities; 30-day
    # launch-window edges on a 10x order stream
    "weighted_median_price_by_brand",
    "part_adoption_speed",
    # cumulative quartile cuts on a 10x price domain
    "segment_price_quartiles_exact",
    # theta/effect quantization on 10x user moments
    "cuped_ab_adjustment",
    # argmax-gap ties on 10x daily sums; band-block pair fan-out at 10x
    "binseg_changepoints",
    "duplicate_payment_candidates",
    # rank-window checkpoints on a 10x vocabulary
    "vocab_coverage_curve",
    # df-cut posting joins + quantized cosines on a 10x vocabulary;
    # year-universe division on the full 10x part set
    "tfidf_cosine_pairs",
    "relational_division_parts_all_years",
    # power-sum headroom + moment quantization on 10x rows; sqrt-chain
    # CI bounds on 10x daily counts
    "skewness_kurtosis_by_type",
    "wilson_ci_daily_purchase",
    "chisq_residual_heatmap",
    # quality^2 normalization at 10x sources' volumes; tercile cut
    # boundaries on 10x value domains
    "source_mixture_weights",
    "curriculum_stage_assignment",
    # rollup level masks over a 10x month grid
    "time_hierarchy_rollup",
    # cohort-age cumulative cells at 10x order volume
    "cohort_ltv_matrix",
    # rank ties across both metrics at 10x corpus; SMD/TVD boundaries
    # on 10x samples; top-100 cut ties at 10x part revenue
    "cosine_vs_l2_rank_agreement",
    "hash_sample_bias_audit",
    "topk_stability_audit",
    # 99%-line breach islands on 10x daily volume; quantized moment
    # correlation on denser degree pairs
    "breach_run_detection",
    "degree_assortativity",
    # assignment rank ties over 10x vectors; as-of gap boundaries on
    # 10x purchase volume
    "ivf_cell_balance",
    "attribution_window_sweep",
    # density-bucket integer cuts on 10x per-user activity
    "user_engagement_grid",
    # quantized correlation chain on 10x doc moments
    "length_quality_correlation",
    # t/df quantization on 10x group moments
    "welch_t_weekend_effect",
    "pagerank_trade_graph",
    "zorder_box_scan",
    "scd2_point_in_time_join",
    # TPC-H completion batch: groupwise-min cost ties over a 10x-denser
    # derived partsupp (Q2), DECIMAL(38,0) micro-unit profit sums (Q9),
    # a fraction-of-total scalar threshold (Q11), a 0.2x-of-average
    # boundary comparison (Q17), and the one-late-supplier anti join
    # whose lateness boundary rides timestamp arithmetic (Q21).
    "tpch_q2_min_cost_supplier",
    "tpch_q9_product_profit",
    "tpch_q11_important_stock",
    "tpch_q17_small_quantity_revenue",
    "tpch_q21_waiting_suppliers",
    # sketch/fold batch: PQ argmin over IEEE distance folds + micro-unit
    # error quantization, the EMA sequential fold, the CM estimate matrix
    # (integer-exact but its top-20 candidate cut rides a count boundary),
    # and the cross-source Jaccard divide.
    "pq_encode_embeddings",
    "cm_heavy_hitters",
    "cross_source_ngram_overlap",
    "ema_user_value",
    # analytics batch: the basket top-20 rides a dense support-tie
    # boundary at 10x pair density; the z-score is IEEE-composed and its
    # conversion threshold sits near the per-user purchase median.
    "market_basket_part_pairs",
    "ab_conversion_ztest",
    # ADC eval: micro-unit LUT sums rank 10x more candidates per query
    "pq_adc_recall_eval",
    # composed IVF routing x ADC scoring at 10x cell occupancy
    "ivfpq_topk_similar",
    # two chained interpolated-percentile passes at 10x group sizes
    "mad_outlier_gate",
    # p95 interpolates at a fractional rank position over integer days
    "fulfillment_latency_stats",
    # statistics batch: two interpolated-percentile clamps at 10x group
    # sizes; lag-7 autocorr moments in decimal at 10x daily magnitudes
    "winsorized_stats_by_type",
    "autocorr_daily_value",
    # ML-prep batch: BM25's picounit quantization + top-20 boundary at
    # 10x df/avgdl; exponential-clock keys ordered on raw doubles; kNN
    # cosine-tie ordering at 10x candidate density; ln() micro-unit
    # quantization against a fixed flag threshold
    "bm25_doc_ranking",
    "weighted_sample_docs",
    "knn_label_accuracy",
    "unigram_logprob_filter",
    # IEEE-composed slope/r2 at 10x magnitudes; max-|cusum| tie pick;
    # chi2/log10 boundary rounding at 10x digit counts
    "daily_trend_ols",
    "cusum_changepoint_daily",
    "benford_first_digit",
    # Adamic-Adar picounit weights + rank ties at 10x edge density; the
    # 1.5-sigma gate rides an IEEE z right at the threshold boundary
    "supplier_recs_fof",
    "dow_adjusted_anomaly_days",
    # insights batch: jaccard-double window ordering at 10x pair
    # density; round(p*ln(...), 6) terms; rank-formula Gini over
    # HUGEINT/decimal moments; RRF double-sum ordering at the top-20 cut
    "item_item_recs",
    "kl_divergence_source_lang",
    "gini_customer_value",
    "reciprocal_rank_fusion",
    # insights batch 2: round(6) divisions whose numerators ride exact
    # integer moments at 10x magnitudes (AUC rank sums, HHI squares)
    "auc_click_propensity",
    "hhi_supplier_concentration",
    # KMV estimates ride IEEE divisions against 0.45x threshold flags
    # whose inputs shift with the 10x audience
    "kmv_user_overlap",
    # per-cell ln() rounds at 10x cell counts; nano-unit entropy floors
    "psi_value_drift",
    "column_entropy_profile",
    # micro-quantized ln ranks + round(6) OLS at 10x corpus counts
    "zipf_token_slope",
    # 10x-longer IEEE (level, trend) fold - the mirrored-op-order claim
    # is exactly what a longer series would break
    "holt_linear_forecast",
    # exact-cents max ties on a 10x-denser day grid decide frontier
    # membership; fixed-count hash-order seed pick against a 10x graph
    "pareto_frontier_orders",
    "khop_part_reach",
    # float cosine rank ties across three metrics at a 10x corpus, with
    # the fixed-count hash-order query pick
    "matryoshka_recall_eval",
]

# r13: "full" mode runs the ENTIRE oracle registry at sf0.1, not just
# the AT_RISK classification — the classifier itself had never been
# validated at 10x scale (r12 verdict gap #2). A green full run retires
# the classification risk; the conftest recorder logs it under the
# distinct sweep name sf01_oracle_parity_full.
_MODE = os.environ.get("SPARK_GRAFT_SF01_PARITY", "")

pytestmark = pytest.mark.skipif(
    _MODE not in ("1", "full"),
    reason="sf0.1 parity is opt-in (SPARK_GRAFT_SF01_PARITY=1 for the "
    "at-risk window, =full for the whole registry); the default suite "
    "runs the full registry at sf0.01",
)

_NAMES = sorted(registry.ORACLES) if _MODE == "full" else AT_RISK


@pytest.fixture(scope="module")
def duck01():
    con = make_duckdb(SF01)
    yield con
    con.close()


@pytest.mark.parametrize("name", _NAMES)
def test_parity_at_sf01(name, spark, duck01):
    sdf = registry.QUERIES[name](spark, SF01)
    drel = duck01.sql(registry.ORACLES[name])
    assert sorted(sdf.columns) == sorted(drel.columns)
    # the main suite's None-safe order-insensitive multiset comparator
    s = rows_to_multiset(sdf.columns, [tuple(r) for r in sdf.collect()])
    d = rows_to_multiset(drel.columns, drel.fetchall())
    assert len(s) == len(d)
    if _MODE != "full":
        # the hand-picked at-risk queries are all known non-empty at
        # sf0.1; in full mode an empty-but-agreeing result can be correct
        assert len(s) > 0
    assert s == d
