"""Semantic checks for the LLM-pipeline operators beyond oracle parity:
LSH recall vs the exact Jaccard join, sketch error bounds vs exact counts,
and fingerprint stability."""

from __future__ import annotations

from pyspark.sql import functions as F

import data_engineering_spotify_etl_airflow_aws_spark as engine
from data_engineering_spotify_etl_airflow_aws_spark import registry

from .conftest import SF_CORRECT, SF_SMOKE

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
    """approx_distinct_users emits the exact count plus a within_bound flag
    (the driver-hashable form of the sketch check); the exact side must
    match the exact twin and every flag must be set."""
    exact = {
        r.event_type: r.n_users
        for r in registry.QUERIES["distinct_users_by_type"](
            spark, SF_CORRECT
        ).collect()
    }
    rows = registry.QUERIES["approx_distinct_users"](
        spark, SF_CORRECT
    ).collect()
    assert {r.event_type for r in rows} == set(exact)
    for r in rows:
        assert r.exact_users == exact[r.event_type]
        assert r.within_bound == 1, (r.event_type, r)


def test_embedding_near_dup_finds_planted_duplicates(spark):
    """The fixture has no cosine>=0.9 pairs (near-uniform sphere), so the
    registered query is legitimately empty. Plant exact duplicates and
    assert the LSH bucket join surfaces every planted pair: identical
    vectors always share all hyperplane signs."""
    from pyspark.sql import functions as F

    from data_engineering_spotify_etl_airflow_aws_spark.functions import vec_double
    from data_engineering_spotify_etl_airflow_aws_spark.operators.similarity import (
        near_dup_pairs,
    )
    from data_engineering_spotify_etl_airflow_aws_spark.tables import load_table

    v = load_table(spark, SF_CORRECT, "embeddings").select(
        "vec_id", vec_double("embedding").alias("emb")
    )
    planted = v.where(F.col("vec_id") < 10).select(
        (F.col("vec_id") + 100000).alias("vec_id"), "emb"
    )
    pairs = near_dup_pairs(v.unionByName(planted), tau=0.9).collect()
    found = {(r.vec_a, r.vec_b) for r in pairs}
    expected = {(i, i + 100000) for i in range(10)}
    assert expected <= found, expected - found
    assert all(r.score >= 0.9 for r in pairs)


def test_ivf_results_subset_of_bruteforce_candidates(spark):
    """Every IVF hit must also be a real corpus vector scored identically
    to the brute-force baseline (scores for the same (query,cand) pair
    must agree exactly - same cosine composition)."""
    bf = {
        (r.query_id, r.cand_id): r.score
        for r in registry.QUERIES["topk_similar_per_query"](
            spark, SF_CORRECT
        ).collect()
    }
    ivf = registry.QUERIES["ivf_topk_similar"](spark, SF_CORRECT).collect()
    assert ivf, "IVF should return results"
    overlap = [r for r in ivf if (r.query_id, r.cand_id) in bf]
    assert overlap, "IVF and brute force should overlap on some pairs"
    for r in overlap:
        assert r.score == bf[(r.query_id, r.cand_id)]


def test_simhash_stable_and_full_coverage(spark):
    df = registry.QUERIES["simhash_fingerprints"](spark, SF_CORRECT)
    rows = df.collect()
    assert len(rows) == len({r.doc_id for r in rows})
    assert all(0 <= r.simhash32 < (1 << 32) for r in rows)


def test_multimodal_decode_seam_and_fallback():
    """decode_image must fail loudly on malformed input; digest_features
    is the deterministic fallback with a fixed width. Every signature
    now routes to a NATIVE codec (PPM r8, PNG r9, JPEG r10), so a
    malformed payload of any format - and an unrecognized signature -
    raises the codecs' shared ValueError dialect; there is no library
    seam left."""
    import pytest as _pytest

    from data_engineering_spotify_etl_airflow_aws_spark.operators.multimodal import (
        decode_image,
        digest_features,
    )

    with _pytest.raises(ValueError):
        decode_image(b"\x89PNG\r\n\x1a\nfake")
    with _pytest.raises(ValueError):
        decode_image(b"\xff\xd8\xff\xe0jpeg-ish")
    with _pytest.raises(ValueError, match="unsupported image payload"):
        decode_image(b"GIF89a not supported")
    f = digest_features(b"payload")
    assert len(f) == 8 and all(0.0 <= x <= 1.0 for x in f)
    assert f == digest_features(b"payload")


def test_approx_quantiles_close_to_exact(spark):
    """value_quantiles_approx emits rank-error flags (the driver-hashable
    form of the sketch check); every group's p50/p95 flags must be set and
    the group census must match the exact twin's groups."""
    exact_types = {
        r.event_type
        for r in registry.QUERIES["value_quantiles_exact"](
            spark, SF_CORRECT
        ).collect()
    }
    rows = registry.QUERIES["value_quantiles_approx"](
        spark, SF_CORRECT
    ).collect()
    assert {r.event_type for r in rows} == exact_types
    for r in rows:
        assert r.n_values > 0
        assert r.p50_within == 1, (r.event_type, r)
        assert r.p95_within == 1, (r.event_type, r)


def test_connected_components_transitive_chain(spark):
    """A 4-node path (1-2, 2-3, 3-4) plus an isolated node must collapse to
    one component labeled by its min plus a singleton -- multi-hop closure,
    which exercises the pointer-jumping rounds, not just direct pairs."""
    from data_engineering_spotify_etl_airflow_aws_spark.operators.clusters import (
        connected_components,
    )

    nodes = spark.createDataFrame([(i,) for i in [1, 2, 3, 4, 9]], "id long")
    edges = spark.createDataFrame(
        [(2, 1), (3, 2), (4, 3)], "a long, b long"
    )
    out = {
        r.node: r.lbl
        for r in connected_components(
            nodes, edges, id_col="id", src="a", dst="b"
        ).collect()
    }
    assert out == {1: 1, 2: 1, 3: 1, 4: 1, 9: 9}


def test_pii_scrub_planted_docs_are_redacted(spark):
    """Every doc with the in-query planted PII suffix (doc_id % 7 == 0)
    must report at least one URL, one email and one IPv4 redaction; clean
    docs must not be touched by the planted patterns' host/domain."""
    rows = registry.QUERIES["pii_scrub_docs"](spark, SF_CORRECT).collect()
    assert rows
    planted = [r for r in rows if r.doc_id % 7 == 0]
    assert planted
    for r in planted:
        assert r.n_urls >= 1 and r.n_emails >= 1 and r.n_ips >= 1, r


def test_decontam_excludes_benchmark_split_and_bounds_fraction(spark):
    """The benchmark split itself (doc_id % 50 == 0) must never be flagged,
    and the shared-gram count can't exceed the doc's own distinct grams."""
    rows = registry.QUERIES["benchmark_decontam_overlap"](
        spark, SF_CORRECT
    ).collect()
    assert rows, "planted near-dups of benchmark docs should be flagged"
    for r in rows:
        assert r.doc_id % 50 != 0, f"benchmark doc flagged: {r}"
        assert 0.0 < r.contam_frac <= 1.0, r
        assert r.n_bench_docs >= 1, r


def test_repetition_stats_flag_consistency(spark):
    """keep_flag must be exactly (top_frac <= 0.2); fractions bounded; the
    duplicate fraction is 0 iff every trigram is unique."""
    rows = registry.QUERIES["doc_repetition_stats"](spark, SF_CORRECT).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.dup_frac < 1.0 and 0.0 < r.top_frac <= 1.0, r
        assert r.keep_flag == (1 if r.top_frac <= 0.2 else 0), r
        assert (r.dup_frac == 0.0) == (r.n_uniq_trigrams == r.n_trigrams), r


def test_tfidf_top_terms_rank_contract(spark):
    """Per doc: at most 5 rows, ranks contiguous from 1, scores
    non-increasing in rank order (the deterministic cut contract)."""
    from collections import defaultdict

    per_doc = defaultdict(list)
    for r in registry.QUERIES["tfidf_top_terms"](spark, SF_CORRECT).collect():
        per_doc[r.doc_id].append(r)
    assert per_doc
    for doc, rs in per_doc.items():
        rs.sort(key=lambda r: r.rnk)
        assert [r.rnk for r in rs] == list(range(1, len(rs) + 1)), doc
        assert len(rs) <= 5, doc
        scores = [r.score for r in rs]
        assert scores == sorted(scores, reverse=True), doc


def test_pack_token_sequences_is_contiguous_token_stream(spark):
    """Packing invariants: the corpus concatenates with no gaps or overlaps
    (start_tok[0]=0; each next doc starts where the previous ended), and
    every sequence-index column is pure arithmetic on (start_tok, n_tokens)
    with the fixed 512-token budget."""
    rows = (
        registry.QUERIES["pack_token_sequences"](spark, SF_CORRECT)
        .orderBy("doc_id")
        .collect()
    )
    assert rows and rows[0].start_tok == 0
    expect = 0
    for r in rows:
        assert r.start_tok == expect, r
        expect += r.n_tokens
        assert r.first_seq == r.start_tok // 512, r
        last = r.start_tok if r.n_tokens == 0 else r.start_tok + r.n_tokens - 1
        assert r.last_seq == last // 512, r
        assert r.seq_offset == r.start_tok % 512, r


def test_chunk_docs_overlap_covers_each_doc_exactly(spark):
    """Chunking invariants: per doc, starts advance by the 150-char stride
    from 1, every chunk is <=200 chars, and stride coverage reconstructs the
    document length exactly (no char lost or counted twice beyond the
    declared 50-char overlap)."""
    from collections import defaultdict

    from data_engineering_spotify_etl_airflow_aws_spark.tables import load_table

    n_chars = {
        r.doc_id: r.n
        for r in load_table(spark, SF_CORRECT, "documents")
        .select("doc_id", F.length("text").alias("n"))
        .collect()
    }
    per_doc = defaultdict(list)
    for r in registry.QUERIES["chunk_docs_overlap"](spark, SF_CORRECT).collect():
        per_doc[r.doc_id].append(r)
    assert set(per_doc) == set(n_chars)
    for doc, rs in per_doc.items():
        rs.sort(key=lambda r: r.chunk_idx)
        assert [r.chunk_idx for r in rs] == list(range(len(rs))), doc
        for i, r in enumerate(rs):
            assert r.chunk_start == i * 150 + 1, r
            assert 1 <= r.chunk_len <= 200, r
        assert 150 * (len(rs) - 1) + rs[-1].chunk_len == n_chars[doc], doc


def test_connected_components_matches_union_find_on_random_graphs(spark):
    """Property-based check: on random small graphs, the iterative
    min-label-propagation + pointer-jumping plan must compute exactly the
    same components as a reference union-find (label = min vertex id of
    the component). Random graphs hit shapes the fixture never produces:
    long chains, stars, multi-edges, self-loops, cycles."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from data_engineering_spotify_etl_airflow_aws_spark.operators.clusters import (
        connected_components,
    )

    def union_find_labels(edges):
        parent = {}

        def find(x):
            parent.setdefault(x, x)
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        return {v: find(v) for v in parent}

    @settings(
        max_examples=8,
        deadline=None,
        suppress_health_check=list(HealthCheck),
    )
    @given(
        edges=st.lists(
            st.tuples(st.integers(0, 30), st.integers(0, 30)),
            min_size=1,
            max_size=40,
        )
    )
    def check(edges):
        df = spark.createDataFrame(edges, "doc_a bigint, doc_b bigint")
        got = {
            r.node: r.lbl
            for r in connected_components(
                None, df, id_col="doc_id", src="doc_a", dst="doc_b"
            ).collect()
        }
        assert got == union_find_labels(edges)

    check()


def test_corpus_prep_example_end_to_end(spark):
    """examples/corpus_prep.py - the LLM corpus-preparation chain as one
    script - must run every stage and report internally-consistent
    numbers (splits partition the corpus, no content leaks, packing
    emits rows)."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "examples"))
    try:
        import corpus_prep
    finally:
        sys.path.pop(0)

    from .conftest import SF_CORRECT, SF_SMOKE

    out = corpus_prep.main(spark, SF_CORRECT)
    assert out["quality_total"] > 0
    assert 0 < out["quality_pass"] <= out["quality_total"]
    assert sum(out["split_docs"].values()) == out["quality_total"]
    assert set(out["split_docs"]) == {"train", "val", "test"}
    assert out["leaked_contents"] == 0
    assert out["packed_rows"] > 0
    assert out["exact_survivors"] <= out["quality_total"]
    assert out["worst_source_overlap"] is not None
    assert out["pq_encoded_vecs"] > 0
    assert 0 <= out["pq_adc_avg_recall"] <= 1


def test_pagerank_conserves_mass_and_orders_hubs(spark):
    """Power iteration on the undirected trade graph must conserve rank
    mass (sum over ALL nodes ~= 1: damping redistributes, never leaks -
    undirected means no dangling nodes) and give every supplier a rank
    above the teleport floor (1-d)/N."""
    from data_engineering_spotify_etl_airflow_aws_spark.operators.clusters import (
        _PR_DAMP,
        pagerank_trade_graph,
    )

    from .conftest import SF_CORRECT, SF_SMOKE

    rows = pagerank_trade_graph(spark, SF_CORRECT).collect()
    assert len(rows) == 25
    ranks = [r["rank"] for r in rows]
    assert all(r > 0 for r in ranks)
    # top-25 suppliers: each far above a uniform-share floor is not
    # guaranteed, but each must exceed the teleport-only floor
    n_nodes = 1600  # 1500 customers + 100 suppliers at sf0.01
    floor = (1.0 - _PR_DAMP) / n_nodes
    assert all(r > floor for r in ranks)
    assert ranks == sorted(ranks, reverse=True)


def test_pagerank_long_micro_accumulator_matches_decimal_hop(spark):
    """r16 internals change: the power iteration accumulates contribution
    micro-units in LONG with a native long->double boundary cast, instead
    of decimal(38,0) + string hop. This must be bit-identical: (a) the
    quantizer yields LongType (floor of a double), and (b) re-running the
    iteration with the old decimal(38,0)+string-hop accumulator produces
    the exact same (node, rank) doubles - both conversions are exact
    below 2^53, and the magnitude proof (total rank mass 1 => every
    partial sum <= 1e12 + |edges|/2) guarantees we stay below it."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType

    from data_engineering_spotify_etl_airflow_aws_spark.operators import (
        clusters as cl,
    )

    from .conftest import SF_CORRECT

    # (a) quantizer type: long, not decimal
    probe = spark.range(1).select(cl._pr_spark_micro(F.lit(0.1234)).alias("m"))
    assert isinstance(probe.schema["m"].dataType, LongType)

    # (b) value identity against the decimal + string-hop reference
    new_rows = sorted(
        (r["suppkey"], r["rank"])
        for r in cl.pagerank_trade_graph(spark, SF_CORRECT).collect()
    )

    real_micro = cl._pr_spark_micro
    real_iter_src = cl._pr_iterate

    def _decimal_micro(c):
        return F.floor(c * 1e12 + F.lit(0.5)).cast("decimal(38,0)")

    # swap the iteration back to the r15 decimal + string-hop shape
    def _pr_iterate_decimal(und):
        deg = und.groupBy("src").agg(F.count("*").alias("outdeg"))
        nodes = deg.select(F.col("src").alias("node"))
        n_nodes = nodes.count()
        ranks = nodes.select("node", F.lit(1.0 / n_nodes).alias("rank"))
        base = cl._PR_RESID / n_nodes
        for _ in range(cl._PR_ITERS):
            weights = ranks.join(deg, ranks.node == deg.src).select(
                F.col("node"),
                _decimal_micro(F.col("rank") / F.col("outdeg")).alias("c_u"),
            )
            contribs = (
                und.join(weights, und.src == weights.node)
                .groupBy("dst")
                .agg(F.sum("c_u").alias("s_u"))
            )
            ranks = (
                nodes.join(contribs, nodes.node == contribs.dst, "left")
                .select(
                    "node",
                    (
                        F.lit(base)
                        + F.lit(cl._PR_DAMP)
                        * (
                            F.coalesce(
                                F.col("s_u"), F.lit(0).cast("decimal(38,0)")
                            )
                            .cast("string")
                            .cast("double")
                            / F.lit(1e12)
                        )
                    ).alias("rank"),
                )
                .localCheckpoint()
            )
        return (
            ranks.where(F.col("node") >= cl._PR_SUPP_OFFSET)
            .select(
                (F.col("node") - cl._PR_SUPP_OFFSET).alias("suppkey"), "rank"
            )
            .orderBy(F.desc("rank"), "suppkey")
            .limit(25)
        )

    cl._pr_iterate = _pr_iterate_decimal
    try:
        old_rows = sorted(
            (r["suppkey"], r["rank"])
            for r in cl.pagerank_trade_graph(spark, SF_CORRECT).collect()
        )
    finally:
        cl._pr_iterate = real_iter_src
        assert cl._pr_spark_micro is real_micro

    assert new_rows == old_rows  # bit-identical doubles, same hub order


def test_morton_interleaves_bits():
    """morton(a, b) must place bit i of `a` at position 2i and bit i of
    `b` at 2i+1 (the property the Z-curve's locality relies on)."""
    from pyspark.sql import functions as F

    from data_engineering_spotify_etl_airflow_aws_spark.operators.extras import (
        _morton,
    )
    from data_engineering_spotify_etl_airflow_aws_spark.session import get_spark

    spark = get_spark()
    cases = [(1, 0, 1), (0, 1, 2), (3, 0, 5), (0, 3, 10), (2, 1, 6),
             (65535, 0, 0x55555555), (0, 65535, 0xAAAAAAAA)]
    df = spark.createDataFrame(
        [(a, b) for a, b, _ in cases], "a long, b long"
    ).select(_morton(F.col("a"), F.col("b")).alias("z"))
    got = [r["z"] for r in df.collect()]
    assert got == [z for _, _, z in cases]


def test_dedup_rolling_window_episode_semantics(spark):
    """Crafted series: events at t0, t0+1d, t0+4d+1us, t0+5d for one key.
    Gap-based episodes with a 3-day re-arm: t0 opens episode 1 (kept),
    +1d suppressed, +4d+1us opens episode 2 (gap 3d+1us > 3d), +5d
    suppressed (gap < 3d from previous OCCURRENCE)."""
    from data_engineering_spotify_etl_airflow_aws_spark import registry

    base = 1_700_000_000_000_000  # us
    day = 86_400_000_000
    rows = [
        (1, base, 10),
        (2, base + day, 11),
        (3, base + 4 * day + 1, 12),
        (4, base + 5 * day, 13),
    ]
    df = spark.createDataFrame(
        [(eid, ts, 7, "click", float(v)) for eid, ts, v in rows],
        "event_id long, ts_us long, user_id long, event_type string, value double",
    ).selectExpr(
        "event_id", "timestamp_micros(ts_us) AS ts", "user_id",
        "event_type", "value",
    )
    # run the registered operator against the probe frame: load_table
    # reads {dir}/events.parquet, so a temp dir stands in for a fixture
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        df.write.mode("overwrite").parquet(f"{td}/events.parquet")
        out = {
            (r["user_id"], r["event_type"]): (r["n_events"], r["n_kept"])
            for r in registry.QUERIES["dedup_rolling_window"](
                spark, td
            ).collect()
        }
    assert out == {(7, "click"): (4, 2)}


def test_hash_split_deterministic_and_partition_invariant(spark):
    """The split assignment must be a pure function of doc_id: identical
    across partition layouts (resharding-proof) and roughly 90/5/5 on
    random id sets (hypothesis drives the id distribution)."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from data_engineering_spotify_etl_airflow_aws_spark.operators.curation import (
        _split_col,
    )

    @settings(
        max_examples=6,
        deadline=None,
        suppress_health_check=list(HealthCheck),
    )
    @given(
        ids=st.lists(
            st.integers(0, 10**9), min_size=20, max_size=200, unique=True
        )
    )
    def check(ids):
        df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
        a = dict(
            df.repartition(1)
            .select("doc_id", _split_col("doc_id").alias("s"))
            .collect()
        )
        b = dict(
            df.repartition(7, "doc_id")
            .select("doc_id", _split_col("doc_id").alias("s"))
            .collect()
        )
        assert a == b
        assert set(a.values()) <= {"train", "val", "test"}
        # 90% expected train share; wide tolerance for small samples
        train_frac = sum(v == "train" for v in a.values()) / len(a)
        assert train_frac > 0.6

    check()


def test_ohlc_open_close_are_true_extremes(spark):
    """open/close must be the values at the true order-extremes of each
    (user, day) series - cross-checked against a driver-side sort of the
    same rows, including timestamp ties broken by event_id."""
    import tempfile

    from data_engineering_spotify_etl_airflow_aws_spark import registry

    base = 1_700_000_000_000_000
    rows = [
        # one user, one day, with a ts TIE at the open (event_id breaks it)
        (1, base, 5.0), (2, base, 4.0), (3, base + 9, 9.0), (4, base + 5, 1.0),
    ]
    df = spark.createDataFrame(
        [(eid, ts, 3, "click", v) for eid, ts, v in rows],
        "event_id long, ts_us long, user_id long, event_type string, value double",
    ).selectExpr(
        "event_id", "timestamp_micros(ts_us) AS ts", "user_id",
        "event_type", "value",
    )
    with tempfile.TemporaryDirectory() as td:
        df.write.mode("overwrite").parquet(f"{td}/events.parquet")
        out = registry.QUERIES["ohlc_downsample"](spark, td).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["open"], r["close"]) == (5.0, 9.0)  # tie -> lower event_id
    assert (r["high"], r["low"], r["n_events"]) == (9.0, 1.0, 4)


def test_pq_codes_in_range_and_codebook_reconstructs_exactly(spark):
    """Every PQ code must be a valid codebook index, and the K codebook
    vectors themselves must reconstruct with zero error (each of their
    subvectors is at squared distance 0 from its own codebook entry, and
    no other entry can beat 0)."""
    from data_engineering_spotify_etl_airflow_aws_spark.operators.similarity import (
        _PQ_K,
        _PQ_M,
        _pq_encode,
    )

    df = _pq_encode(spark, SF_CORRECT)
    stats = df.select(
        F.count("*").alias("n"),
        F.min(F.array_min("pq_code")).alias("cmin"),
        F.max(F.array_max("pq_code")).alias("cmax"),
        F.min(F.size("pq_code")).alias("lmin"),
        F.max(F.size("pq_code")).alias("lmax"),
        F.min("err_micro").alias("emin"),
        F.sum((F.col("err_micro") == 0).cast("int")).alias("n_exact"),
    ).first()
    assert stats.n > 0
    assert 0 <= stats.cmin and stats.cmax < _PQ_K
    assert stats.lmin == stats.lmax == _PQ_M
    assert stats.emin >= 0, "squared-distance reconstruction error is >= 0"
    assert stats.n_exact >= _PQ_K, (
        f"only {stats.n_exact} zero-error rows; the {_PQ_K} codebook "
        "vectors must all reconstruct exactly"
    )


def test_cm_sketch_guarantees_hold(spark):
    """Count-Min structural guarantees on the fixture corpus: the sketch
    NEVER undercounts (min over d rows each >= true count), and at
    w=256 the overcount bound flag holds for every candidate."""
    df = registry.QUERIES["cm_heavy_hitters"](spark, SF_CORRECT)
    rows = df.collect()
    assert len(rows) == 20
    for r in rows:
        assert r.cm_est >= r.exact_cnt, f"CM undercounted {r.tok}"
        assert r.never_undercount == 1
        assert r.within_bound == 1, f"{r.tok} overcount outside (e/w)*N"


def test_ema_is_convex_combination_and_counts_match(spark):
    """The alpha=0.5 EMA is a convex combination of the user's values, so
    it must lie within [min, max] of those values; n_events must match
    the raw event count per user."""
    ema = registry.QUERIES["ema_user_value"](spark, SF_CORRECT)
    ev = engine.tables.load_table(spark, SF_CORRECT, "events").groupBy(
        "user_id"
    ).agg(
        F.count("*").alias("raw_n"),
        F.min("value").alias("vmin"),
        F.max("value").alias("vmax"),
    )
    bad = (
        ema.join(ev, "user_id")
        .where(
            (F.col("n_events") != F.col("raw_n"))
            | (F.col("ema_value") < F.col("vmin"))
            | (F.col("ema_value") > F.col("vmax"))
        )
        .count()
    )
    assert bad == 0


def test_cross_source_overlap_contract(spark):
    """Pair matrix invariants: canonical ordering (a < b), shared count
    bounded by the smaller side's gram set, and Jaccard consistent with
    the emitted integers."""
    df = registry.QUERIES["cross_source_ngram_overlap"](spark, SF_CORRECT)
    rows = df.collect()
    assert rows, "fixture sources share 5-grams"
    for r in rows:
        assert r.source_a < r.source_b
        assert 0 < r.n_shared <= min(r.grams_a, r.grams_b)
        denom = r.grams_a + r.grams_b - r.n_shared
        assert abs(r.jaccard - r.n_shared / denom) < 1e-12
        assert 0 < r.jaccard <= 1


def test_tpch_q13_histogram_accounts_for_every_customer(spark):
    """The order-count histogram must partition the customer table: the
    custdist column sums to exactly |customer| (left join keeps the
    zero-order customers in the c_count=0 bucket)."""
    hist = registry.QUERIES["tpch_q13_customer_distribution"](
        spark, SF_CORRECT
    )
    total = hist.agg(F.sum("custdist").alias("s")).first().s
    n_cust = engine.tables.load_table(spark, SF_CORRECT, "customer").count()
    assert total == n_cust


def test_market_basket_pair_contract(spark):
    """Pair invariants: canonical ordering, support bounded by each
    part's own order frequency, and lift consistent with the emitted
    integers (lift = support * n_orders / (n_a * n_b))."""
    df = registry.QUERIES["market_basket_part_pairs"](spark, SF_CORRECT)
    rows = df.collect()
    assert len(rows) == 20
    n_orders = (
        engine.tables.load_table(spark, SF_CORRECT, "lineitem")
        .select("l_orderkey")
        .distinct()
        .count()
    )
    for r in rows:
        assert r.part_a < r.part_b
        assert 1 <= r.support <= min(r.n_a, r.n_b)
        assert abs(r.lift - r.support * n_orders / (r.n_a * r.n_b)) < 1e-9
        assert r.lift > 0


def test_ab_ztest_accounts_for_all_users_and_sign(spark):
    """The two arms must partition the user population; the z sign must
    match the rate difference; rates stay inside [0, 1]."""
    r = registry.QUERIES["ab_conversion_ztest"](spark, SF_CORRECT).first()
    n_users = (
        engine.tables.load_table(spark, SF_CORRECT, "events")
        .select("user_id")
        .distinct()
        .count()
    )
    assert r.n_control + r.n_treatment == n_users
    assert r.n_control > 0 and r.n_treatment > 0
    assert 0 <= r.rate_control <= 1 and 0 <= r.rate_treatment <= 1
    assert r.conv_control <= r.n_control
    assert r.conv_treatment <= r.n_treatment
    if r.z_score is not None and r.rate_treatment != r.rate_control:
        assert (r.z_score > 0) == (r.rate_treatment > r.rate_control)


def test_pq_adc_recall_eval_contract(spark):
    """One row per query vector; hit counts bounded by k; recall is
    exactly n_hits/k; and across the whole query set ADC must beat the
    all-miss floor (some true neighbor survives 8-bit-per-subspace
    compression even on the adversarial near-uniform fixture)."""
    from data_engineering_spotify_etl_airflow_aws_spark.operators.similarity import (
        _ADC_K,
        N_QUERIES,
    )

    rows = registry.QUERIES["pq_adc_recall_eval"](spark, SF_CORRECT).collect()
    assert len(rows) == N_QUERIES
    for r in rows:
        assert 0 <= r.n_hits <= _ADC_K
        assert abs(r.recall_at_k - r.n_hits / _ADC_K) < 1e-12
    assert sum(r.n_hits for r in rows) > 0, "ADC found no true neighbors at all"


def test_ivfpq_rank_contract_and_candidate_subset(spark):
    """IVF-PQ output: at most k rows per query, ranks dense from 1,
    adc_micro non-negative and non-decreasing with rank; and every
    returned candidate must come from the probed-cell candidate space —
    i.e. appear in the full ADC ranking too (routing only ever SHRINKS
    the candidate set, scoring is the same LUT)."""
    from data_engineering_spotify_etl_airflow_aws_spark.operators.similarity import (
        TOP_K,
    )

    rows = registry.QUERIES["ivfpq_topk_similar"](spark, SF_CORRECT).collect()
    assert rows
    by_q: dict = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    for q, rs in by_q.items():
        rs.sort(key=lambda r: r.rank)
        assert 1 <= len(rs) <= TOP_K
        assert [r.rank for r in rs] == list(range(1, len(rs) + 1))
        micros = [r.adc_micro for r in rs]
        assert all(m >= 0 for m in micros)
        assert micros == sorted(micros)


def _write_events(spark, td, rows):
    """rows: (event_id, ts_us, user_id, event_type, value)."""
    spark.createDataFrame(
        list(rows),
        "event_id long, ts_us long, user_id long, event_type string,"
        " value double",
    ).selectExpr(
        "event_id", "timestamp_micros(ts_us) AS ts", "user_id",
        "event_type", "value",
    ).write.mode("overwrite").parquet(f"{td}/events.parquet")


def test_interval_union_islands_correct_on_ts_ties(spark):
    """Same-start-tie regression (r6 ADVICE): two intervals starting at
    the identical microsecond, where the interval with the SMALLER end
    has the LARGER event_id. The island-id cumulative sum must use the
    same (s, event_id) total order as the flag window; the old (s, e)
    order summed the tied flag-0 row first, attached it to the PREVIOUS
    island, and merged two disjoint islands (covered_us 300s, not 180s).

    Fixture (minutes; interval length = 1 + floor(|value|) % 60):
      id=1 t=0  v=0 -> [0, 1m)     island 1
      id=2 t=2m v=1 -> [2m, 4m)    island 2 starts (flag row of the tie)
      id=3 t=2m v=0 -> [2m, 3m)    tie; inside island 2
    """
    import tempfile

    minute_us = 60_000_000
    rows = [
        (1, 0 * minute_us, 7, "click", 0.0),
        (2, 2 * minute_us, 7, "click", 1.0),
        (3, 2 * minute_us, 7, "click", 0.0),
    ]
    with tempfile.TemporaryDirectory() as td:
        _write_events(spark, td, rows)
        out = registry.QUERIES["interval_union_coverage"](spark, td).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_islands"] == 2, r
    assert r["covered_us"] == 3 * minute_us, r  # 1m + 2m, NOT 5m merged
    assert r["longest_us"] == 2 * minute_us, r


def test_session_type_affinity_tie_at_session_boundary(spark):
    """Same-timestamp-tie regression (r6 ADVICE): two events tie at a
    session boundary and their event_type order is OPPOSITE their
    event_id order. The session-id cumulative sum must use the same
    (us, event_id) total order as the gap-flag window; the old
    (us, event_type) order summed 'purchase' (flag 0) before 'view'
    (the flag row), pulling it into the PREVIOUS session and reporting
    a phantom (click, purchase) co-occurrence.

    Fixture: click at t=0; then >30-min gap; view (id=2) and purchase
    (id=3) tie at t=31m -> sessions {click}, {purchase, view}; the only
    pair is (purchase, view) with lift (1/2)/((1/2)*(1/2)) = 2."""
    import tempfile

    minute_us = 60_000_000
    rows = [
        (1, 0 * minute_us, 7, "click", 0.0),
        (2, 31 * minute_us, 7, "view", 0.0),
        (3, 31 * minute_us, 7, "purchase", 0.0),
    ]
    with tempfile.TemporaryDirectory() as td:
        _write_events(spark, td, rows)
        out = registry.QUERIES["session_type_affinity"](spark, td).collect()
    assert len(out) == 1, out
    r = out[0]
    assert (r["a"], r["b"], r["n_ab"]) == ("purchase", "view", 1), out
    assert r["lift"] == 2.0, out


def test_fuzzy_name_matches_excludes_cross_length_empty_names(spark, tmp_path):
    """The r9 review edge: an empty name's sequence(1, 0) yields [1, 0]
    (step -1), whose zero-length deletion variants would match every
    1-char name in the nation - a pair the oracle's length-equality
    predicate excludes. The Spark join now carries the same predicate:
    '' never pairs with 'A', while identical empty names still pair at
    dist 0 and genuine substitutions still pair at dist 1."""
    rows = [
        (1, "", 7, 0.0, "SEG"),
        (2, "A", 7, 0.0, "SEG"),
        (3, "", 7, 0.0, "SEG"),
        (4, "AB", 7, 0.0, "SEG"),
        (5, "AC", 7, 0.0, "SEG"),
    ]
    spark.createDataFrame(
        rows,
        "c_custkey bigint, c_name string, c_nationkey int, "
        "c_acctbal double, c_mktsegment string",
    ).write.parquet(str(tmp_path / "customer.parquet"))

    got = sorted(
        (r.custkey_a, r.custkey_b, r.edit_dist)
        for r in registry.QUERIES["fuzzy_name_matches"](
            spark, str(tmp_path)
        ).collect()
    )
    # ('', '') dist 0; ('AB','AC') dist 1; NO ('', 'A') cross-length pair
    assert got == [(1, 3, 0), (4, 5, 1)]


def test_near_dup_pairs_tau_none_is_raw_pair_set(spark):
    """tau=None must enumerate every bucket pair with no score predicate
    (the threshold sweep's contract): superset of any tau filter, and
    the bucket-join pair count exactly."""
    from data_engineering_spotify_etl_airflow_aws_spark.operators.similarity import (
        _emb,
        near_dup_pairs,
    )

    v = _emb(spark, SF_SMOKE)
    raw = near_dup_pairs(v, tau=None)
    n_raw = raw.count()
    # recompute the bucket-pair count independently of the helper
    from pyspark.sql import functions as F

    from data_engineering_spotify_etl_airflow_aws_spark.operators.similarity import (
        _spark_bucket,
    )

    sig = v.select("vec_id", _spark_bucket(F.col("emb")).alias("bucket"))
    expected = (
        sig.alias("x")
        .join(
            sig.alias("y"),
            (F.col("x.bucket") == F.col("y.bucket"))
            & (F.col("x.vec_id") < F.col("y.vec_id")),
        )
        .count()
    )
    assert n_raw == expected and n_raw > 0
    assert near_dup_pairs(v, tau=0.5).count() <= n_raw


def test_rank_agreement_counts_every_query(spark):
    """Every one of the 64 fixed queries contributes to the agreement
    metric - a fully-disjoint query lands at n_common = 0 instead of
    vanishing from the denominator (the r9 review bias fix)."""
    row = registry.QUERIES["cosine_vs_l2_rank_agreement"](
        spark, SF_SMOKE
    ).collect()[0]
    assert row.n_queries == 64
