"""Semantic checks for the ML-prep operators beyond oracle parity:
Bloom filters can't have false negatives, BM25 results must actually
match the query, weighted sampling must respect group bounds and its
published key formula, kNN votes must account correctly."""

from __future__ import annotations

from pyspark.sql import functions as F

import data_engineering_spotify_etl_airflow_aws_spark as engine
from data_engineering_spotify_etl_airflow_aws_spark import registry
from data_engineering_spotify_etl_airflow_aws_spark.operators.mlprep import (
    _BM25_TERMS,
    _BM25_TOP,
    _FH_BUCKETS,
    _FH_DOCS,
    _KNN_K,
    _KNN_QUERIES,
    _WSW_K,
)
from data_engineering_spotify_etl_airflow_aws_spark.functions import tokens
from data_engineering_spotify_etl_airflow_aws_spark.tables import load_table

from .conftest import SF_CORRECT

engine.load_all_operators()


def test_bm25_results_match_query_and_are_ordered(spark):
    rows = registry.QUERIES["bm25_doc_ranking"](spark, SF_CORRECT).collect()
    assert 0 < len(rows) <= _BM25_TOP
    scores = [r.bm25_score for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert all(r.bm25_score > 0 for r in rows)
    assert all(1 <= r.n_terms_matched <= len(_BM25_TERMS) for r in rows)
    # every ranked doc really contains at least one query term
    docs = load_table(spark, SF_CORRECT, "documents").select(
        "doc_id", F.explode(tokens("text")).alias("tok")
    )
    matching = {
        r.doc_id
        for r in docs.where(F.col("tok").isin(*_BM25_TERMS))
        .select("doc_id")
        .distinct()
        .collect()
    }
    assert {r.doc_id for r in rows} <= matching


def test_feature_hash_buckets_and_token_conservation(spark):
    rows = registry.QUERIES["feature_hash_counts"](spark, SF_CORRECT).collect()
    doc_ids = {r.doc_id for r in rows}
    assert len(doc_ids) == _FH_DOCS
    assert all(0 <= r.bucket < _FH_BUCKETS for r in rows)
    # hashing loses vocabulary identity but must conserve token mass
    docs = load_table(spark, SF_CORRECT, "documents").select(
        "doc_id", F.size(tokens("text")).alias("n")
    )
    expected = {
        r.doc_id: r.n for r in docs.where(F.col("doc_id").isin(doc_ids)).collect()
    }
    got: dict[int, int] = {}
    for r in rows:
        got[r.doc_id] = got.get(r.doc_id, 0) + r.n_tokens
    assert got == expected


def test_weighted_sample_bounds_and_key_formula(spark):
    rows = registry.QUERIES["weighted_sample_docs"](spark, SF_CORRECT).collect()
    per_lang: dict[str, list] = {}
    for r in rows:
        per_lang.setdefault(r.lang, []).append(r)
    docs = load_table(spark, SF_CORRECT, "documents")
    lang_sizes = {
        r.lang: r.n
        for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    for lang, lrows in per_lang.items():
        assert len(lrows) == min(_WSW_K, lang_sizes[lang])
        assert sorted(r.rank for r in lrows) == list(range(1, len(lrows) + 1))
        # keys ascend with rank (smallest exponential clock wins)
        by_rank = sorted(lrows, key=lambda r: r.rank)
        keys = [r.sample_key for r in by_rank]
        assert keys == sorted(keys)
        assert all(k >= 0 for k in keys)


def test_knn_vote_accounting(spark):
    rows = registry.QUERIES["knn_label_accuracy"](spark, SF_CORRECT).collect()
    assert len(rows) == _KNN_QUERIES
    for r in rows:
        assert 1 <= r.n_votes <= _KNN_K
        assert r.is_correct == (1 if r.pred_label == r.true_label else 0)
    # distinct queries only - the pick is without replacement
    assert len({r.query_id for r in rows}) == _KNN_QUERIES


def test_bloom_filter_has_no_false_negatives(spark):
    r = registry.QUERIES["bloom_filter_semi_join"](spark, SF_CORRECT).collect()[0]
    # every true member must pass its own bits: pass = members + fp exactly
    assert r.n_bloom_pass - r.n_false_pos == r.n_true_members
    assert r.n_bloom_pass >= r.n_true_members
    assert 0.0 <= r.fp_rate <= 1.0
    assert r.n_probe > 0 and r.n_true_members > 0


def test_unigram_logprob_sign_and_flag_bounds(spark):
    rows = registry.QUERIES["unigram_logprob_filter"](
        spark, SF_CORRECT
    ).collect()
    assert rows
    total_docs = sum(r.n_docs for r in rows)
    assert total_docs == load_table(spark, SF_CORRECT, "documents").count()
    for r in rows:
        assert r.mean_logprob < 0  # probabilities < 1
        assert r.min_logprob <= r.mean_logprob
        assert 0 <= r.n_flagged <= r.n_docs
