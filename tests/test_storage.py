"""Sinks, catalog, and plan-shape assertions: partition pruning and filter
pushdown must be visible in the executed plan, catalog tables must round-
trip through spark.sql, and inbox archival must be exactly-once-ish."""

from __future__ import annotations

import shutil
from pathlib import Path

from pyspark.sql import functions as F

import data_engineering_spotify_etl_airflow_aws_spark as engine
from data_engineering_spotify_etl_airflow_aws_spark import plans
from data_engineering_spotify_etl_airflow_aws_spark.pipeline.fixture_gen import (
    INBOX_DIR,
)
from data_engineering_spotify_etl_airflow_aws_spark.pipeline.transforms import (
    songs_transform,
)
from data_engineering_spotify_etl_airflow_aws_spark.sinks import (
    archive_consumed,
    save_as_table,
    write_partitioned,
)

engine.load_all_operators()


def test_partition_pruning_reaches_scan(spark, tmp_path):
    path = str(tmp_path / "songs_parts")
    write_partitioned(songs_transform(spark), path)
    back = spark.read.parquet(path)
    pruned = back.where(F.col("scrape_date") == "2025-07-20")
    pf = plans.partition_filters(pruned)
    assert pf, "scrape_date predicate must become a PartitionFilter"
    assert any("scrape_date" in f for f in pf)
    # and only one partition's rows flow
    assert pruned.count() == 50


def test_roundtrip_prune_uses_subquery_partition_filter(spark):
    """partitioned_roundtrip_prune must find the latest day WITHOUT a
    driver collect: the max(scrape_date) scalar subquery has to appear
    inside the scan's PartitionFilters (single-partition read at any
    scale; round-2 verdict #6)."""
    from data_engineering_spotify_etl_airflow_aws_spark.registry import QUERIES

    from .conftest import SF_CORRECT

    df = QUERIES["partitioned_roundtrip_prune"](spark, SF_CORRECT)
    df.collect()
    pf = plans.partition_filters(df)
    assert any("Subquery" in f and "scrape_date" in f for f in pf), (
        f"expected scalar-subquery partition filter, got {pf}"
    )


def test_predicate_pushdown_reaches_parquet(spark, tmp_path):
    path = str(tmp_path / "songs_flat")
    songs_transform(spark).write.mode("overwrite").parquet(path)
    narrow = spark.read.parquet(path).where(F.col("rank") <= 10)
    assert plans.pushed_filters(narrow), "rank filter must push to parquet"


def test_save_as_table_sql_roundtrip(spark):
    """K3/S4: persistent table + spark.sql over it (Crawler/Athena analog)."""
    save_as_table(songs_transform(spark), "songs_tbl", partition_by="scrape_date")
    try:
        n = spark.sql(
            "SELECT count(*) AS n FROM songs_tbl WHERE rank <= 10"
        ).collect()[0].n
        assert n == 30  # 10 per day x 3 days
        assert "songs_tbl" in [t.name for t in spark.catalog.listTables()]
    finally:
        spark.sql("DROP TABLE IF EXISTS songs_tbl")


def test_archive_consumed_moves_then_noop(spark, tmp_path):
    inbox = tmp_path / "inbox"
    archive = tmp_path / "archive"
    shutil.copytree(INBOX_DIR, inbox)
    n_files = len(list(Path(inbox).glob("*.json")))
    assert archive_consumed(spark, str(inbox), str(archive)) == n_files
    assert len(list(archive.glob("*.json"))) == n_files
    assert not list(Path(inbox).glob("*.json"))
    # replay: nothing left to move, and nothing breaks
    assert archive_consumed(spark, str(inbox), str(archive)) == 0


def test_star_join_agg_is_all_broadcast_single_shuffle(spark):
    """Scale guard: the 3-dim star join must not shuffle the fact for
    joins - one Exchange total (the aggregation)."""
    from data_engineering_spotify_etl_airflow_aws_spark.registry import QUERIES

    from .conftest import SF_CORRECT

    df = QUERIES["star_join_agg"](spark, SF_CORRECT)
    plan = plans.executed_plan(df)
    assert plan.count("BroadcastHashJoin") == 3
    # shuffles: agg exchange + final range sort only, no join shuffles
    assert plans.num_shuffles(df) <= 2


def test_raw_json_and_csv_sinks_roundtrip(spark, tmp_path):
    """K1/K2: the raw landing write and the per-table CSV export must
    round-trip losslessly (CSV via explicit schema on re-read)."""
    from data_engineering_spotify_etl_airflow_aws_spark.pipeline.transforms import (
        read_raw,
    )
    from data_engineering_spotify_etl_airflow_aws_spark.sinks import (
        write_raw_json,
        write_table_csv,
    )

    raw_path = str(tmp_path / "raw_json")
    write_raw_json(read_raw(spark).select("tracks"), raw_path)
    back = spark.read.json(raw_path)
    assert back.count() == 3
    assert back.selectExpr("size(tracks.items)").collect()[0][0] == 50

    songs = songs_transform(spark)
    csv_path = str(tmp_path / "songs_csv")
    write_table_csv(songs, csv_path)
    csv_back = spark.read.option("header", "true").schema(songs.schema).csv(
        csv_path
    )
    assert csv_back.count() == songs.count()
    a = {tuple(r) for r in csv_back.collect()}
    b = {tuple(r) for r in songs.collect()}
    assert a == b


def test_pricing_summary_plan_shape(spark):
    """Flagship Q1-style agg: filter must push to the parquet scan and the
    plan must contain exactly one aggregation exchange (partial/final hash
    agg) plus the final sort - no extra wide stages."""
    from data_engineering_spotify_etl_airflow_aws_spark.registry import QUERIES

    from .conftest import SF_CORRECT

    df = QUERIES["pricing_summary"](spark, SF_CORRECT)
    assert plans.pushed_filters(df), "shipdate filter must reach parquet"
    assert plans.num_shuffles(df) <= 2  # agg exchange + output sort


def test_ntile_deciles_no_global_sort_window(spark):
    """Round-2 verdict fix: exact ntile deciles must not route the fact
    table through a single-partition global-order window. The distributed
    plan windows per approx-percentile band: the fact-table row_number
    window must be fed by a _band-hash exchange. The cumulative-offset
    window over the per-band COUNT table is allowed to be
    SinglePartition — its input cardinality is the band count, bounded
    by construction, never the data."""
    from data_engineering_spotify_etl_airflow_aws_spark.registry import QUERIES

    from .conftest import SF_CORRECT

    df = QUERIES["ntile_price_deciles"](spark, SF_CORRECT)
    df.collect()
    plan = plans.executed_plan(df)
    lines = plan.splitlines()
    rn_windows = [
        i for i, l in enumerate(lines) if "Window" in l and "row_number" in l
    ]
    assert rn_windows, "expected a per-band row_number window"
    for i in rn_windows:
        feeding = next(
            (l for l in lines[i + 1 : i + 6] if "Exchange" in l), ""
        )
        assert "hashpartitioning(_band" in feeding, (
            f"row_number window fed by non-band exchange: {feeding.strip()[:120]}"
        )
    # the bounded offset window exists but must only aggregate _bn counts
    other = [
        i
        for i, l in enumerate(lines)
        if "Window" in l and "row_number" not in l and "windowspecdefinition" in l
    ]
    for i in other:
        assert "_bn" in lines[i], (
            f"unexpected non-count single-partition window: {lines[i].strip()[:120]}"
        )


def test_bucketed_join_is_exchange_free(spark):
    """Co-located join: orders and lineitem bucketed on the join key must
    join with ZERO exchanges - the write-time bucketing replaces the
    per-query shuffle (SURVEY scale notes; brief: 'bucketing for
    co-located joins')."""
    from data_engineering_spotify_etl_airflow_aws_spark.sinks import (
        save_bucketed_table,
    )
    from data_engineering_spotify_etl_airflow_aws_spark.tables import load_table

    from .conftest import SF_CORRECT

    # at sf0.01 AQE would broadcast the small side, hiding the property
    # under test; disable auto-broadcast so the planner must choose the
    # bucket-aware sort-merge join (the shape a fact-to-fact join takes
    # at real scale, where neither side broadcasts)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        save_bucketed_table(
            load_table(spark, SF_CORRECT, "orders"),
            "orders_bkt", bucket_by="o_orderkey",
        )
        save_bucketed_table(
            load_table(spark, SF_CORRECT, "lineitem"),
            "lineitem_bkt", bucket_by="l_orderkey",
        )
        joined = (
            spark.table("orders_bkt")
            .join(
                spark.table("lineitem_bkt"),
                F.col("o_orderkey") == F.col("l_orderkey"),
            )
            .select("o_orderkey", "l_linenumber", "l_quantity")
        )
        n = joined.count()
        assert n == load_table(spark, SF_CORRECT, "lineitem").count()
        plan = plans.executed_plan(joined)
        assert "SortMergeJoin" in plan
        assert plans.num_shuffles(joined) == 0, (
            "bucketed equi-join must not re-shuffle either side"
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS orders_bkt")
        spark.sql("DROP TABLE IF EXISTS lineitem_bkt")


def test_aqe_splits_skewed_join(spark):
    """RUNTIME_CONFS turns on AQE skew-join splitting; prove it engages.
    A fact with ~90% of rows on one key sort-merge-joined to a dim must
    show skew=true in the adaptive plan (the hot partition split into
    subpartitions) and still return exact results."""
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2.0",
        "spark.sql.adaptive.coalescePartitions.minPartitionSize": "1KB",
    }
    prev = {k: spark.conf.get(k) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        fact = spark.range(0, 300_000).select(
            F.when(F.col("id") % 10 < 9, F.lit(7))
            .otherwise(F.col("id") % 1000)
            .alias("k"),
            F.col("id").alias("v"),
        )
        dim = spark.range(0, 1000).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("w")
        )
        joined = fact.join(dim, "k")
        # AQE decisions exist only in the FINAL adaptive plan, and only on
        # the query execution that actually ran - count() would wrap the
        # plan in a fresh execution, so collect this DataFrame itself
        assert len(joined.collect()) == 300_000
        plan = plans.executed_plan(joined)
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, plan[:2000]
        rows = {
            r.k: r.n
            for r in joined.groupBy("k").agg(F.count("*").alias("n")).collect()
        }
        # 90% of rows land on k=7; the otherwise-branch (id%10==9) can never
        # produce k=7 since 7 % 10 != 9
        assert rows[7] == 270_000
        assert sum(rows.values()) == 300_000
    finally:
        for k, v in prev.items():
            spark.conf.set(k, v)


def test_pack_sequences_banded_prefix_sum_plan(spark):
    """pack_token_sequences must compute the corpus prefix sum with the
    banded plan: the data-sized cumulative-sum window is fed by a
    _band-hash exchange, never SinglePartition; only the per-band total
    table (rows = band count, bounded by construction) may window over a
    single partition."""
    from data_engineering_spotify_etl_airflow_aws_spark.registry import QUERIES

    from .conftest import SF_CORRECT

    df = QUERIES["pack_token_sequences"](spark, SF_CORRECT)
    df.collect()
    plan = plans.executed_plan(df)
    lines = plan.splitlines()
    windows = [i for i, l in enumerate(lines) if "Window" in l]
    assert windows, "expected window nodes in the packing plan"
    for i in windows:
        if "_bn" in lines[i]:
            continue  # bounded band-offset window
        feeding = next((l for l in lines[i + 1 : i + 6] if "Exchange" in l), "")
        assert "hashpartitioning(_band" in feeding, (
            f"prefix-sum window fed by non-band exchange: {feeding.strip()[:120]}"
        )


def test_chunk_docs_is_shuffle_free_flat_map(spark):
    """chunk_docs_overlap is a pure per-row expansion: with the
    presentation-only output sort dropped (round-4 verdict #3) the plan
    has NO exchange at all - a flat map over the corpus."""
    from data_engineering_spotify_etl_airflow_aws_spark.registry import QUERIES

    from .conftest import SF_CORRECT

    df = QUERIES["chunk_docs_overlap"](spark, SF_CORRECT)
    df.collect()
    # count only the final adaptive plan (toString also prints the initial)
    final = plans.executed_plan(df).split("== Initial Plan ==")[0]
    assert "Exchange" not in final, final[:2000]


def test_topk_per_group_prunes_map_side(spark):
    """Grouped top-k must NOT ship the whole fact to |groups| reducers:
    Catalyst's InferWindowGroupLimit gives the rank-filter window a
    map-side WindowGroupLimit(Partial) BELOW the group-key exchange (each
    split forwards <= k rows per group) and a Final prune above it - the
    'partial TakeOrdered before the shuffle' shape of SURVEY §4's
    grouped-top-k rule, provided natively by the optimizer."""
    from data_engineering_spotify_etl_airflow_aws_spark.registry import QUERIES

    from .conftest import SF_CORRECT

    df = QUERIES["topk_per_group"](spark, SF_CORRECT)
    df.collect()
    final = plans.executed_plan(df).split("== Initial Plan ==")[0]
    lines = final.splitlines()
    partial = [i for i, l in enumerate(lines)
               if "WindowGroupLimit" in l and "Partial" in l]
    assert partial, final[:2000]
    # the Partial prune must sit BELOW (after, in toString order) the
    # group-key hash exchange it feeds
    exchange = [i for i, l in enumerate(lines)
                if "Exchange hashpartitioning(l_returnflag" in l]
    assert exchange and min(exchange) < max(partial), final[:2000]
    assert any("WindowGroupLimit" in l and "Final" in l for l in lines), (
        final[:2000]
    )


def test_tpch_q3_q5_join_plans_broadcast_dims(spark):
    """Q3: filtered customer broadcasts, top-10 rides TakeOrderedAndProject
    (no global sort). Q5: region/nation/supplier/customer all broadcast -
    the only shuffle partitions the surviving join output for the agg."""
    from data_engineering_spotify_etl_airflow_aws_spark.registry import QUERIES

    from .conftest import SF_CORRECT

    q3 = QUERIES["tpch_q3_shipping_priority"](spark, SF_CORRECT)
    q3.collect()
    p3 = plans.executed_plan(q3).split("== Initial Plan ==")[0]
    assert "TakeOrderedAndProject" in p3, p3[:1500]
    assert "BroadcastHashJoin" in p3
    assert "SortMergeJoin" not in p3

    q5 = QUERIES["tpch_q5_local_supplier_volume"](spark, SF_CORRECT)
    q5.collect()
    p5 = plans.executed_plan(q5).split("== Initial Plan ==")[0]
    assert p5.count("BroadcastHashJoin") >= 3, p5[:1500]
    # lineitem (the fact) must be scanned with column pruning in effect
    assert "l_extendedprice" in p5 and "l_tax" not in p5


def test_widen_small_scan_noops_on_wide_input(spark):
    """The fan-out must fire only in the small-scan regime: a relation
    already at session parallelism passes through untouched (the 100 TB
    case), while a 1-split scan widens to the default parallelism."""
    from data_engineering_spotify_etl_airflow_aws_spark.tables import (
        load_table,
        widen_small_scan,
    )

    from .conftest import SF_CORRECT

    target = spark.sparkContext.defaultParallelism
    wide = spark.range(0, 1000, numPartitions=target)
    assert widen_small_scan(wide) is wide

    docs = load_table(spark, SF_CORRECT, "documents")
    assert docs.rdd.getNumPartitions() < target
    widened = widen_small_scan(docs)
    assert widened.rdd.getNumPartitions() == target
    assert widened.count() == docs.count()


def test_persist_when_scaled_gate_semantics(spark, monkeypatch):
    """The scale-gated persist (r17) must be a NO-OP at fixture scale
    (r16 measured unconditional persists of cheap duplicated subtrees as
    consistent losses there) and engage exactly when dup x input-splits
    reaches the session parallelism - plus unconditionally under the
    forced-gate env hook used by the oracle-parity forced run."""
    from data_engineering_spotify_etl_airflow_aws_spark.tables import (
        load_table,
        persist_when_scaled,
        scan_splits,
    )

    from .conftest import SF_CORRECT

    target = spark.sparkContext.defaultParallelism
    docs = load_table(spark, SF_CORRECT, "documents").select("lang", "source")
    splits = scan_splits(spark, SF_CORRECT, "documents")
    # the memoized split count must agree with Spark's own scan split
    # count (the fixture is a single row group -> one split)
    assert splits == docs.rdd.getNumPartitions()
    assert splits * 4 < target or target <= 4

    # fixture regime: gate off - passthrough, nothing persisted/cached
    cache: list = []
    monkeypatch.delenv("SPARK_GRAFT_FORCE_SCALE_PERSIST", raising=False)
    out = persist_when_scaled(docs, cache, splits, dup=4)
    assert out is docs and cache == []
    assert not out.storageLevel.useMemory and not out.storageLevel.useDisk

    # scale regime (modelled via the parts override): gate on - the
    # relation is persisted, registered, and value-identical (persist()
    # returns the same DataFrame object in PySpark, so the observable
    # is the storage level + cache registration, not object identity)
    baseline = sorted(map(tuple, docs.collect()))
    engaged = persist_when_scaled(docs, cache, splits, dup=4, parts=2)
    assert cache == [engaged]
    assert engaged.storageLevel.useMemory and engaged.storageLevel.useDisk
    assert sorted(map(tuple, engaged.collect())) == baseline
    while cache:
        cache.pop().unpersist()

    # forced-gate hook engages regardless of input splits
    monkeypatch.setenv("SPARK_GRAFT_FORCE_SCALE_PERSIST", "1")
    forced = persist_when_scaled(docs, cache, splits, dup=1)
    assert cache == [forced]
    assert forced.storageLevel.useMemory
    while cache:
        cache.pop().unpersist()


# The call sites that gained the r17 scale-gated persist: the r16
# reverted cheap-subtree class + item_item_recs' support table, plus
# the x3/x4 scan-census tail swept in the same round.
_GATED_PERSIST_QUERIES = (
    "pmi_lang_source",
    "chi_square_lang_source",
    "kmv_user_overlap",
    "bloom_filter_semi_join",
    "bm25_doc_ranking",
    "logodds_distinctive_terms",
    "heaps_law_curve",
    "bigram_pmi_collocations",
    "kl_divergence_source_lang",
    "embedding_centroid_drift",
    "dq_constraint_violations",
    "table_profile_orders",
    "item_item_recs",
    # census tail (r17 sweep)
    "attribution_window_sweep",
    "binseg_changepoints",
    "ewma_control_chart",
    "growth_accounting_daily",
    "hash_sample_bias_audit",
    "stl_daily_decomposition",
    "weekly_active_users",
    "cohort_ltv_matrix",
    "fd_violation_profile",
    "cdc_changelog_compaction",
    "price_volume_mix_bridge",
    "rank_movers_wow",
    "topk_stability_audit",
    "column_entropy_profile",
    "curriculum_stage_assignment",
    "lang_temperature_resample",
    "unigram_logprob_filter",
    "tfidf_top_terms",
)


def test_gated_persist_values_identical_when_engaged(spark, monkeypatch):
    """Every gated-persist query must return bit-identical rows whether
    the gate engages (forced, the 100 TB regime) or stays off (the
    fixture regime the bench measures) - a persist may never change
    what a query computes."""
    import io
    from contextlib import redirect_stdout

    from data_engineering_spotify_etl_airflow_aws_spark import caches
    from data_engineering_spotify_etl_airflow_aws_spark.registry import QUERIES

    from .conftest import SF_SMOKE

    for name in _GATED_PERSIST_QUERIES:
        monkeypatch.delenv("SPARK_GRAFT_FORCE_SCALE_PERSIST", raising=False)
        plain = sorted(
            str(tuple(r)) for r in QUERIES[name](spark, SF_SMOKE).collect()
        )
        caches.release_all()
        monkeypatch.setenv("SPARK_GRAFT_FORCE_SCALE_PERSIST", "1")
        forced = sorted(
            str(tuple(r)) for r in QUERIES[name](spark, SF_SMOKE).collect()
        )
        caches.release_all()
        assert forced == plain, name
    monkeypatch.delenv("SPARK_GRAFT_FORCE_SCALE_PERSIST", raising=False)

    # and the forced gate really engages: the plan gains a cache scan
    buf_plain, buf_forced = io.StringIO(), io.StringIO()
    with redirect_stdout(buf_plain):
        QUERIES["pmi_lang_source"](spark, SF_SMOKE).explain("formatted")
    caches.release_all()
    monkeypatch.setenv("SPARK_GRAFT_FORCE_SCALE_PERSIST", "1")
    with redirect_stdout(buf_forced):
        QUERIES["pmi_lang_source"](spark, SF_SMOKE).explain("formatted")
    caches.release_all()
    assert "InMemoryTableScan" not in buf_plain.getvalue()
    assert "InMemoryTableScan" in buf_forced.getvalue()


def test_bucketed_colocated_join_is_exchange_free_into_the_join(spark):
    """The bucketed join's whole point: both scans bucket-aligned, the
    sort-merge join fed by ZERO exchanges, and exactly one shuffle in the
    entire query (the final segment agg)."""
    from data_engineering_spotify_etl_airflow_aws_spark.registry import QUERIES

    from .conftest import SF_CORRECT

    df = QUERIES["bucketed_colocated_join"](spark, SF_CORRECT)
    p = plans.executed_plan(df).split("== Initial Plan ==")[0]
    assert "SortMergeJoin" in p, p[:1500]
    assert p.count("SelectedBucketsCount") == 2, p[:1500]
    assert plans.num_shuffles(df) == 1, p[:1500]
    # the join itself must sit below no Exchange: everything between the
    # scans and the join is sort/filter/project only
    join_part = p.split("SortMergeJoin")[1]
    assert "Exchange" not in join_part, join_part[:1500]


def test_salted_join_spreads_hot_key_and_matches_plain_semantics(spark):
    """The salted plan must (a) join on the composite (key, salt) pair -
    visible in the SMJ keys - and (b) keep the hint-pinned sort-merge
    path (the big-dim regime salting exists for)."""
    from data_engineering_spotify_etl_airflow_aws_spark.registry import QUERIES

    from .conftest import SF_CORRECT

    df = QUERIES["skew_salted_join_agg"](spark, SF_CORRECT)
    p = plans.executed_plan(df).split("== Initial Plan ==")[0]
    assert "SortMergeJoin" in p, p[:1500]
    smj_line = [ln for ln in p.splitlines() if "SortMergeJoin" in ln][0]
    assert "salt" in smj_line, smj_line


def test_dynamic_partition_pruning_reaches_the_fact_scan(spark):
    """The DPP query's fact scan must carry a dynamicpruningexpression in
    its PartitionFilters - the runtime partition elimination that is the
    operator's whole point (static pruning is impossible: the day list is
    itself a query result)."""
    from data_engineering_spotify_etl_airflow_aws_spark.registry import QUERIES

    from .conftest import SF_CORRECT

    df = QUERIES["dynamic_partition_pruned_join"](spark, SF_CORRECT)
    p = plans.executed_plan(df)
    assert "dynamicpruningexpression" in p, p[:2000]


def test_range_clustered_layout_is_disjoint_and_prunes(spark):
    """Each file of the range-clustered events copy must own a disjoint ts
    slice (the property row-group min/max pruning relies on), and the
    registered range query must push its ts bounds into the parquet scan."""
    import pyarrow.parquet as pq
    from pathlib import Path

    from data_engineering_spotify_etl_airflow_aws_spark.operators.extras import (
        ensure_range_clustered_events,
    )
    from data_engineering_spotify_etl_airflow_aws_spark.registry import QUERIES

    from .conftest import SF_CORRECT

    path = ensure_range_clustered_events(spark, SF_CORRECT)
    spans = []
    for f in Path(path).glob("*.parquet"):
        t = pq.read_table(f, columns=["ts"])
        if t.num_rows:
            col = t.column("ts")
            lo, hi = min(col.to_pylist()), max(col.to_pylist())
            spans.append((lo, hi))
    spans.sort()
    assert len(spans) > 1, "clustering degenerated to a single file"
    for (_, prev_hi), (next_lo, _) in zip(spans, spans[1:]):
        assert prev_hi <= next_lo, f"overlapping ts slices: {prev_hi} > {next_lo}"

    df = QUERIES["range_clustered_scan"](spark, SF_CORRECT)
    p = plans.executed_plan(df)
    assert "PushedFilters" in p and "ts" in p.split("PushedFilters")[1][:200], (
        p[:2000]
    )


def test_zorder_layout_localizes_both_dimensions(spark):
    """Z-ordering must make the box query skippable on per-file min/max
    stats of BOTH user_id and day: for the registered box predicate, a
    majority of files' bounding boxes must miss the box entirely (the
    stats-pruning win single-column clustering cannot give on the
    second dimension)."""
    import datetime

    import pyarrow.parquet as pq
    from pathlib import Path

    from data_engineering_spotify_etl_airflow_aws_spark.operators.extras import (
        _Z_D_HI,
        _Z_D_LO,
        _Z_EPOCH,
        _Z_U_HI,
        _Z_U_LO,
        ensure_zorder_clustered_events,
    )

    from .conftest import SF_CORRECT

    path = ensure_zorder_clustered_events(spark, SF_CORRECT)
    epoch = datetime.date.fromisoformat(_Z_EPOCH)
    d_lo = epoch + datetime.timedelta(days=_Z_D_LO)
    d_hi = epoch + datetime.timedelta(days=_Z_D_HI)
    total, skippable, areas = 0, 0, []
    g_users, g_days = set(), set()
    for f in Path(path).glob("*.parquet"):
        t = pq.read_table(f, columns=["user_id", "ts"])
        if not t.num_rows:
            continue
        total += 1
        users = t.column("user_id").to_pylist()
        days = [x.date() for x in t.column("ts").to_pylist()]
        g_users.update((min(users), max(users)))
        g_days.update((min(days), max(days)))
        areas.append(
            (max(users) - min(users) + 1)
            * ((max(days) - min(days)).days + 1)
        )
        skippable += (
            max(users) < _Z_U_LO
            or min(users) > _Z_U_HI
            or max(days) < d_lo
            or min(days) > d_hi
        )
    assert total >= 8, f"clustering degenerated to {total} files"
    # clustering quality: mean per-file bounding box must cover a small
    # fraction of the global (user x day) area - an unclustered layout
    # scores ~1.0, ideal 16-file z-tiling ~1/16; 0.25 leaves slack for
    # curve boundary crossings
    g_area = (max(g_users) - min(g_users) + 1) * (
        (max(g_days) - min(g_days)).days + 1
    )
    ratio = sum(areas) / len(areas) / g_area
    assert ratio < 0.25, f"per-file boxes too wide: mean ratio {ratio:.3f}"
    # and the registered box predicate must be stats-skippable on at
    # least half the files (both-dimension pruning)
    assert skippable >= total / 2, (
        f"z-order should let stats skip files: {skippable}/{total}"
    )


def test_item_item_recs_top3_prunes_map_side(spark):
    """The rec-ranking rank<=3 filter must get the same native
    WindowGroupLimit map-side prune as topk_per_group: each map split
    forwards at most 3 candidates per part before the part_key
    exchange."""
    from data_engineering_spotify_etl_airflow_aws_spark.registry import QUERIES

    from .conftest import SF_CORRECT

    df = QUERIES["item_item_recs"](spark, SF_CORRECT)
    df.collect()
    final = plans.executed_plan(df).split("== Initial Plan ==")[0]
    lines = final.splitlines()
    assert any("WindowGroupLimit" in l for l in lines), final[:2000]
    # Two acceptable shapes. (a) The window is fed by a part_key shuffle:
    # the map-side Partial prune must sit below it. (b) AQE broadcast the
    # candidate side instead (runtime stats put bidir under the
    # threshold), so the window input inherits freq's part_key hash
    # partitioning and there is NO exchange to prune for - only the
    # Final WindowGroupLimit remains, which is strictly fewer exchanges.
    has_partial = any(
        "WindowGroupLimit" in l and "Partial" in l for l in lines
    )
    if not has_partial:
        # Accept ONLY the intended alternative: no part_key exchange
        # because AQE broadcast the candidate side. Requiring the
        # BroadcastHashJoin too keeps an unrelated plan change that
        # merely drops both nodes from passing silently (r6 ADVICE).
        assert "Exchange hashpartitioning(part_key" not in final, final[:2000]
        assert "BroadcastHashJoin" in final, final[:2000]


def test_repeat_purchase_filter_pushes_to_scan(spark):
    """The purchase-only predicate must reach the parquet scan as a
    pushed filter (row-group pruning), not execute post-read."""
    from data_engineering_spotify_etl_airflow_aws_spark.registry import QUERIES

    from .conftest import SF_CORRECT

    df = QUERIES["repeat_purchase_gap_days"](spark, SF_CORRECT)
    pushed = plans.pushed_filters(df)
    assert any("event_type" in p for p in pushed), pushed


def test_trending_anchor_is_stats_only_broadcast(spark):
    """trending_parts_decayed's max-shipdate anchor must join as a
    broadcast of a 1-row relation (no driver collect round-trip, the
    recent_topk rule)."""
    from data_engineering_spotify_etl_airflow_aws_spark.registry import QUERIES

    from .conftest import SF_CORRECT

    df = QUERIES["trending_parts_decayed"](spark, SF_CORRECT)
    plan = plans.executed_plan(df)
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan
