"""Temporal join operators: as-of join and interval/range join.

The reference's workload is date-predicate scans and equi-joins
(spotify-analysis.sql:93-126); these add the two temporal join shapes a
time-series / training-data pipeline needs that Spark has no native
operator for (the brief's canonical "custom operator" examples):

  * as-of join  - for each probe row, the single latest build-side row of
                  the same key at-or-before the probe's timestamp.
  * range join  - rows joined to every interval of a small dimension that
                  contains them (intervals may overlap, so this is NOT
                  expressible as a floor()/width_bucket equi-join).

Scale notes (100 TB):
  * as-of: the naive formulation (range join + argmax per probe) explodes
    quadratically on hot keys. This implementation is the distributed
    sort-merge form: tag both sides, UNION, one window over
    (key ORDER BY ts, side, id) carrying last non-null build payload
    forward - exactly ONE shuffle on the join key, state O(1) per row, no
    candidate blowup. This is how kdb/QuestDB/Flink express as-of at scale.
  * range join: unit-bucket prefilter - each interval explodes to the
    coarse (month) buckets it touches, the fact side derives its bucket,
    and the join is a broadcast HASH join on the bucket key with the
    exact BETWEEN as a residual. O(rows) hash probes instead of the
    nested loop's O(rows x intervals) predicate evaluations; the same
    shape shuffles (instead of broadcasting) the interval side when the
    catalog outgrows a broadcast.

Both are oracle-checked: DuckDB has native ASOF JOIN, so the oracle
*proves* the union+window plan implements real as-of semantics.
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..functions import dsum, oracle_dsum
from ..registry import query
from ..caches import register_cache
from ..tables import load_table

# Gap relation persisted by the previous attribution_window_sweep call
# when the scale gate engages (released on the next call; caches.py).
_ATTR_CACHE = register_cache([])

# ---------------------------------------------------------------------------
# Time-series resample + gap fill: regularize each user's event stream onto
# a daily grid (the hypertable-rollup shape). Daily totals where events
# exist, n_events=0 on gap days, and the last observed daily total carried
# forward. Spine bounds are PER USER (min..max observed day), so the grid
# is data-driven, not a global constant.
#
# Scale notes (100 TB): the spine is built by sequence()+explode on the
# per-user bounds - generation is distributed and proportional to output
# size, never a driver loop or a cross join against a calendar dim. One
# shuffle for the daily rollup, one equi-join spine x daily co-partitioned
# on (user_id, day), one window for the forward fill. Forward fill via
# last(ignorenulls) is O(1) running state per user - same plan family as
# the as-of join below.


@query(
    "ts_gap_fill",
    oracle=f"""
    WITH daily AS (
        SELECT user_id, CAST(ts AS DATE) AS day,
               {oracle_dsum('value', 6)} AS day_value,
               count(*) AS n_events
        FROM events GROUP BY 1, 2
    ),
    bounds AS (
        SELECT user_id, min(day) AS d0, max(day) AS d1 FROM daily GROUP BY 1
    ),
    spine AS (
        SELECT user_id,
               CAST(unnest(generate_series(CAST(d0 AS TIMESTAMP),
                                           CAST(d1 AS TIMESTAMP),
                                           INTERVAL 1 DAY)) AS DATE) AS day
        FROM bounds
    )
    SELECT s.user_id, s.day,
           coalesce(d.n_events, 0) AS n_events,
           last_value(d.day_value IGNORE NULLS) OVER (
               PARTITION BY s.user_id ORDER BY s.day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS filled_value
    FROM spine s LEFT JOIN daily d ON d.user_id = s.user_id AND d.day = s.day
    ORDER BY s.user_id, s.day
    """,
)
def ts_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    # drift check (r6): warm sf0.1 = 1.05s (min of 3), below the r4
    # driver 1.15s - the r5 1.34s was cold-run jitter, no regression.
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.to_date("ts").alias("day"), "value"
    )
    daily = ev.groupBy("user_id", "day").agg(
        dsum("value", scale=6, alias="day_value"),
        F.count("*").alias("n_events"),
    )
    spine = (
        daily.groupBy("user_id")
        .agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
        .select("user_id", F.explode(F.sequence("d0", "d1")).alias("day"))
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        spine.join(daily, ["user_id", "day"], "left")
        .select(
            "user_id",
            "day",
            F.coalesce("n_events", F.lit(0)).alias("n_events"),
            F.last("day_value", ignorenulls=True).over(w).alias("filled_value"),
        )
        .orderBy("user_id", "day")
    )


def asof_join(
    probe: DataFrame,
    build: DataFrame,
    key: str,
    ts: str,
    build_id: str,
    payload: list[str] | None = None,
) -> DataFrame:
    """Generic distributed as-of join: for each probe row, attach the
    build row of the same `key` with the greatest `ts` <= the probe's
    (inclusive; ties on (key, ts) resolved to the largest `build_id`).

    Returns the probe columns plus `asof_<build_id>`, `asof_<ts>_us`, and
    `asof_<c>` for each payload column; all-null when no build row
    precedes the probe.

    Plan: tag sides, UNION, ONE window over (key ORDER BY ts, side, id)
    carrying the last non-null build payload forward - a single shuffle on
    `key`, O(1) running state, no range-join candidate blowup.
    """
    payload = payload or []
    p_cols = list(probe.columns)
    b_types = dict(build.dtypes)
    p_types = dict(probe.dtypes)
    b = build.select(
        F.col(key).alias("__k"),
        F.col(ts).alias("__ts"),
        F.col(build_id).alias("__bid"),
        F.lit(0).alias("__side"),
        *[F.col(c).alias(f"__p_{c}") for c in payload],
        *[F.lit(None).cast(p_types[c]).alias(f"__probe_{c}") for c in p_cols],
    )
    p = probe.select(
        F.col(key).alias("__k"),
        F.col(ts).alias("__ts"),
        F.lit(None).cast(b_types[build_id]).alias("__bid"),
        F.lit(1).alias("__side"),
        *[F.lit(None).cast(b_types[c]).alias(f"__p_{c}") for c in payload],
        *[F.col(c).alias(f"__probe_{c}") for c in p_cols],
    )
    w = (
        W.partitionBy("__k")
        .orderBy("__ts", "__side", "__bid")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    is_build = F.col("__side") == 0
    carried = [
        F.last(F.when(is_build, F.col("__bid")), ignorenulls=True)
        .over(w)
        .alias(f"asof_{build_id}"),
        F.last(F.when(is_build, F.unix_micros("__ts")), ignorenulls=True)
        .over(w)
        .alias(f"asof_{ts}_us"),
        *[
            F.last(F.when(is_build, F.col(f"__p_{c}")), ignorenulls=True)
            .over(w)
            .alias(f"asof_{c}")
            for c in payload
        ],
    ]
    return (
        b.unionByName(p)
        .select(
            "__side",
            *[F.col(f"__probe_{c}").alias(c) for c in p_cols],
            *carried,
        )
        .where(F.col("__side") == 1)
        .drop("__side")
    )


# ---------------------------------------------------------------------------
# As-of join: for every purchase event, the latest click by the same user
# at-or-before the purchase timestamp (attribution's "last touch").
#
# Tie contract (shared with the oracle): among clicks with the identical
# (user_id, ts) the largest event_id wins; a click exactly at the purchase
# instant counts (inclusive <=).
@query(
    "asof_join_purchase_click",
    oracle="""
    WITH p AS (
        SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
    ),
    c AS (  -- one row per (user, instant): largest event_id survives
        SELECT user_id, ts, max(event_id) AS event_id
        FROM events WHERE event_type = 'click' GROUP BY user_id, ts
    )
    SELECT p.event_id AS purchase_id,
           p.user_id,
           epoch_us(p.ts) AS purchase_us,
           c.event_id AS last_click_id,
           epoch_us(c.ts) AS last_click_us,
           epoch_us(p.ts) - epoch_us(c.ts) AS gap_us
    FROM p ASOF LEFT JOIN c
      ON p.user_id = c.user_id AND c.ts <= p.ts
    ORDER BY purchase_id
    """,
)
def asof_join_purchase_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "event_type"
    )
    probe = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", "ts"
    )
    build = ev.where(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("event_id").alias("click_id")
    )
    joined = asof_join(probe, build, key="user_id", ts="ts", build_id="click_id")
    return joined.select(
        "purchase_id",
        "user_id",
        F.unix_micros("ts").alias("purchase_us"),
        F.col("asof_click_id").alias("last_click_id"),
        F.col("asof_ts_us").alias("last_click_us"),
        (F.unix_micros("ts") - F.col("asof_ts_us")).alias("gap_us"),
    ).orderBy("purchase_id")


# ---------------------------------------------------------------------------
# Range (interval) join: overlapping promo windows x orders. Every order
# matches EVERY promo interval containing its order date; windows overlap
# by construction (270-day spans starting every 180 days), so a bucketing
# trick cannot replace the range predicate.
_PROMO_START0 = _dt.date(1995, 1, 1)
PROMOS: list[tuple[int, _dt.date, _dt.date]] = [
    (
        i,
        _PROMO_START0 + _dt.timedelta(days=180 * i),
        _PROMO_START0 + _dt.timedelta(days=180 * i + 269),
    )
    for i in range(14)  # covers 1995-01-01 .. 2001-06-26+269d > fixture max
]


def _promo_values_sql() -> str:
    return ", ".join(
        f"({pid}, DATE '{s.isoformat()}', DATE '{e.isoformat()}')"
        for pid, s, e in PROMOS
    )


@query(
    "promo_range_join",
    oracle=f"""
    WITH promos(promo_id, start_d, end_d) AS (
        VALUES {_promo_values_sql()}
    )
    SELECT promo_id, start_d, end_d,
           count(*) AS n_orders,
           {oracle_dsum('o_totalprice')} AS revenue
    FROM promos
    JOIN orders
      ON CAST(o_orderdate AS DATE) BETWEEN start_d AND end_d
    GROUP BY promo_id, start_d, end_d
    ORDER BY promo_id
    """,
)
def promo_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Interval join via month bucketing, not a nested-loop: each promo
    # explodes to one row per calendar month it touches, the fact side
    # derives its month, and the join is a broadcast HASH join on the
    # month key with the exact BETWEEN as a residual filter. A fact row
    # matches a (promo, month) bucket at most once, so no dedup is
    # needed. This replaces O(rows x promos) predicate evaluations with
    # O(rows) hash probes - the difference between a stage that scales
    # with the promo catalog and one that doesn't (round-4 bench: the
    # BroadcastNestedLoopJoin form cost 4.0s at sf0.1, this 1.6s).
    orders = load_table(spark, sf_dir, "orders").select(
        F.to_date("o_orderdate").alias("order_d"), "o_totalprice"
    )
    promos = spark.createDataFrame(
        PROMOS, schema="promo_id int, start_d date, end_d date"
    )
    promos_m = promos.select(
        "*",
        F.explode(
            F.sequence(
                F.trunc("start_d", "month"),
                F.trunc("end_d", "month"),
                F.expr("interval 1 month"),
            )
        ).alias("m"),
    )
    return (
        orders.withColumn("m", F.trunc("order_d", "month"))
        .join(F.broadcast(promos_m), "m")
        .where(
            (F.col("order_d") >= F.col("start_d"))
            & (F.col("order_d") <= F.col("end_d"))
        )
        .groupBy("promo_id", "start_d", "end_d")
        .agg(
            F.count("*").alias("n_orders"),
            dsum("o_totalprice", alias="revenue"),
        )
        .orderBy("promo_id")
    )


# ---------------------------------------------------------------------------
# Max-concurrency (sweep line): derive an interval per event (start=ts,
# duration a pure function of event_id: 60 + event_id % 540 seconds) and
# compute, per user, the maximum number of simultaneously-open intervals
# - the "peak concurrent sessions" metric every usage/capacity pipeline
# needs and SQL has no native operator for. Classic sweep: +1 at start,
# -1 at end (end-exclusive: at equal instants the -1 sorts first via
# delta ASC, so back-to-back intervals never double-count), running sum
# per user in event-time order, then max.
#
# Scale notes (100 TB): the sweep window partitions on user_id - per-
# ENTITY sequential, globally parallel across millions of users (the same
# shape as user_value_movement; never a single global sweep). One shuffle
# for the window (union of the two point projections is shuffle-free),
# one same-key agg that reuses the window's partitioning. Total order
# (t_us, delta, event_id) makes the running sum deterministic under ties.
_CONC_DUR_S = "(60 + event_id % 540)"


@query(
    "max_concurrent_per_user",
    oracle=f"""
    WITH iv AS (
        SELECT event_id, user_id,
               epoch_us(ts) AS s_us,
               epoch_us(ts) + {_CONC_DUR_S} * 1000000 AS e_us
        FROM events
    ),
    pts AS (
        SELECT user_id, s_us AS t_us, 1 AS delta, event_id FROM iv
        UNION ALL
        SELECT user_id, e_us AS t_us, -1 AS delta, event_id FROM iv
    ),
    run AS (
        SELECT user_id, delta,
               CAST(sum(delta) OVER (
                   PARTITION BY user_id
                   ORDER BY t_us, delta, event_id
                   ROWS UNBOUNDED PRECEDING
               ) AS BIGINT) AS conc
        FROM pts
    )
    SELECT user_id,
           CAST(sum(CASE WHEN delta = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_intervals,
           max(conc) AS max_concurrent
    FROM run GROUP BY user_id ORDER BY user_id
    """,
)
def max_concurrent_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    iv = load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.unix_micros("ts").alias("s_us"),
        (
            F.unix_micros("ts")
            + F.expr(_CONC_DUR_S).cast("bigint") * F.lit(1_000_000)
        ).alias("e_us"),
    )
    pts = iv.select(
        "user_id",
        F.col("s_us").alias("t_us"),
        F.lit(1).alias("delta"),
        "event_id",
    ).unionByName(
        iv.select(
            "user_id",
            F.col("e_us").alias("t_us"),
            F.lit(-1).alias("delta"),
            "event_id",
        )
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("t_us", "delta", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        pts.withColumn("conc", F.sum("delta").over(w).cast("bigint"))
        .groupBy("user_id")
        .agg(
            F.sum(F.when(F.col("delta") == 1, 1).otherwise(0))
            .cast("bigint")
            .alias("n_intervals"),
            F.max("conc").alias("max_concurrent"),
        )
        # no output sort: one row per user, driver hash order-insensitive
    )


# ---------------------------------------------------------------------------
# OHLC downsampling (the TSDB first/last/min/max rollup: candlesticks,
# sensor dailies, metric compaction): collapse each (user, day) series
# to open/high/low/close + volume. Open/close are ORDER-DEFINED - the
# value at the earliest/latest (ts, event_id) - so they ride
# row_number over one hash partitioning of (user_id, day); the ascending
# and descending rank share that single exchange (two sorts, one
# shuffle), and the final groupBy reuses the same partitioning - the
# whole operator moves each row across the cluster exactly once. The
# deterministic (ts, event_id) tiebreak makes both engines pick the
# same row when timestamps collide, which at 100 TB they routinely do.
@query(
    "ohlc_downsample",
    oracle=f"""
    WITH seq AS (
        SELECT user_id, CAST(ts AS DATE) AS day, value,
               row_number() OVER (
                   PARTITION BY user_id, CAST(ts AS DATE)
                   ORDER BY ts, event_id) AS rn_a,
               row_number() OVER (
                   PARTITION BY user_id, CAST(ts AS DATE)
                   ORDER BY ts DESC, event_id DESC) AS rn_d
        FROM events
    )
    SELECT user_id, day,
           {oracle_dsum('CASE WHEN rn_a = 1 THEN value END', 6)} AS open,
           max(value) AS high,
           min(value) AS low,
           {oracle_dsum('CASE WHEN rn_d = 1 THEN value END', 6)} AS close,
           count(*) AS n_events,
           {oracle_dsum('value', 6)} AS sum_value
    FROM seq
    GROUP BY user_id, day
    ORDER BY user_id, day
    """,
)
def ohlc_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.to_date("ts").alias("day"), "ts", "event_id", "value"
    )
    wa = W.partitionBy("user_id", "day").orderBy("ts", "event_id")
    wd = W.partitionBy("user_id", "day").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    seq = ev.select(
        "user_id",
        "day",
        "value",
        F.row_number().over(wa).alias("rn_a"),
        F.row_number().over(wd).alias("rn_d"),
    )
    return (
        seq.groupBy("user_id", "day")
        .agg(
            dsum(F.when(F.col("rn_a") == 1, F.col("value")), 6, "open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            dsum(F.when(F.col("rn_d") == 1, F.col("value")), 6, "close"),
            F.count("*").alias("n_events"),
            dsum("value", scale=6, alias="sum_value"),
        )
        # no output sort: driver hash is order-insensitive (r5 rule)
    )


# ---------------------------------------------------------------------------
# SCD2 point-in-time join: attach to each fact row the dimension VERSION
# that was valid at the fact's event time - the correctness core of any
# versioned-dimension warehouse (a fact joined to today's dim row is
# silently wrong history). Dimension = SCD2 value history derived from
# 'click' events (change points open versions, merge.py shape); facts =
# 'purchase' events; validity is [valid_from, valid_to) with the open
# version unbounded.
#
# The plan deliberately avoids a range join: version-start rows and fact
# rows UNION into one stream, one window per user ordered by
# (ts, kind, event_id) carries the last-seen version forward
# (last_value ignore-nulls), and facts read their version off the
# running state - ONE shuffle on user_id, one sort, zero joins, O(1)
# state per row. kind orders version starts before same-instant facts,
# giving the inclusive-start / exclusive-end semantics the oracle's
# explicit range join states. At 100 TB this is the asof pattern that
# keeps PIT joins linear (a naive theta-join explodes on hot users).
@query(
    "scd2_point_in_time_join",
    oracle="""
    WITH ordered AS (
        SELECT user_id, value, event_id, epoch_us(ts) AS ts_us,
               lag(value) OVER (
                   PARTITION BY user_id ORDER BY epoch_us(ts), event_id
               ) AS prev_value
        FROM events WHERE event_type = 'click'
    ),
    versions AS (
        SELECT user_id, value AS dim_value, ts_us AS valid_from_us,
               row_number() OVER (
                   PARTITION BY user_id ORDER BY ts_us, event_id
               ) AS version_no,
               lead(ts_us) OVER (
                   PARTITION BY user_id ORDER BY ts_us, event_id
               ) AS valid_to_us
        FROM ordered
        WHERE prev_value IS NULL OR value <> prev_value
    )
    SELECT f.event_id, f.user_id, epoch_us(f.ts) AS ts_us,
           v.version_no, v.dim_value
    FROM events f LEFT JOIN versions v
      ON v.user_id = f.user_id
     AND v.valid_from_us <= epoch_us(f.ts)
     AND (v.valid_to_us IS NULL OR epoch_us(f.ts) < v.valid_to_us)
    WHERE f.event_type = 'purchase'
    ORDER BY f.event_id
    """,
)
def scd2_point_in_time_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", "value",
        F.unix_micros("ts").alias("ts_us"),
    )
    w_click = W.partitionBy("user_id").orderBy("ts_us", "event_id")
    versions = (
        ev.where(F.col("event_type") == "click")
        .withColumn("prev_value", F.lag("value").over(w_click))
        .where(
            F.col("prev_value").isNull()
            | (F.col("value") != F.col("prev_value"))
        )
        .select(
            "user_id",
            "ts_us",
            "event_id",
            F.row_number().over(w_click).alias("version_no"),
            F.col("value").alias("dim_value"),
        )
    )
    tagged = versions.select(
        "user_id",
        "ts_us",
        "event_id",
        F.lit(0).alias("kind"),
        "version_no",
        "dim_value",
    ).unionByName(
        ev.where(F.col("event_type") == "purchase").select(
            "user_id",
            "ts_us",
            "event_id",
            F.lit(1).alias("kind"),
            F.lit(None).cast("int").alias("version_no"),
            F.lit(None).cast("double").alias("dim_value"),
        )
    )
    w_run = (
        W.partitionBy("user_id")
        .orderBy("ts_us", "kind", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        tagged.select(
            "user_id",
            "ts_us",
            "event_id",
            "kind",
            F.last("version_no", ignorenulls=True).over(w_run).alias("version_no"),
            F.last("dim_value", ignorenulls=True).over(w_run).alias("dim_value"),
        )
        .where(F.col("kind") == 1)
        .select("event_id", "user_id", "ts_us", "version_no", "dim_value")
        # no output sort: driver hash is order-insensitive (r5 rule)
    )


# ---------------------------------------------------------------------------
# Per-user exponential moving average (alpha = 0.5): the linear
# recurrence s_i = (s_{i-1} + x_i) / 2 over each user's time-ordered
# values — a stateful fold no window frame expresses (each output
# depends on ALL predecessors with geometric weights). Implemented as
# collect-sort-fold per key: one shuffle on user_id, then array_sort +
# a sequential left fold (F.aggregate), all JVM-side.
#
# Determinism: the fold order is pinned by the unique (ts_us, event_id)
# sort key, and DuckDB's list_reduce performs the same left fold over
# the same list(... ORDER BY) order, so the IEEE add/halve sequence is
# bit-identical cross-engine. alpha = 0.5 keeps every weight dyadic.
#
# Scale note: per-user state is the user's event list — same bounded-
# per-key contract as sequence packing (curation.py); a key whose
# history can't fit an executor needs chunked prefix folds (carry the
# (ema, weight) pair per chunk), which this operator would compose from.
@query(
    "ema_user_value",
    oracle="""
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_events,
           list_reduce(list(value ORDER BY epoch_us(ts), event_id),
                       (acc, x) -> (acc + x) * 0.5) AS ema_value
    FROM events
    GROUP BY user_id
    """,
)
def ema_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "value", F.unix_micros("ts").alias("ts_us")
    )
    seq = ev.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.array_sort(
            F.collect_list(F.struct("ts_us", "event_id", "value"))
        ).alias("seq"),
    )
    return seq.withColumn(
        "vals", F.expr("transform(seq, s -> s.value)")
    ).select(
        "user_id",
        "n_events",
        F.expr(
            "aggregate(slice(vals, 2, greatest(size(vals) - 1, 0)),"
            " element_at(vals, 1), (acc, x) -> (acc + x) * 0.5D)"
        ).alias("ema_value"),
    )


# ---------------------------------------------------------------------------
# User-journey path mining: the 10 most common 3-step event-type paths
# (consecutive triples in each user's time-ordered stream) — the
# sequence-mining primitive behind "what do users do before X?". Same
# collect-sort base as the EMA above (one user_id shuffle, per-user
# state bounded by the user's event count), then trigram extraction is
# the dedup.py shingle shape — chained zip_with over shifted slices,
# O(1) per element — exploded into a count aggregate. The path alphabet
# is |event_types|^3, so the count shuffle carries a bounded key domain;
# top-10 on (count DESC, path) is a total order.
@query(
    "event_path_trigrams",
    oracle="""
    WITH seqs AS (
        SELECT user_id,
               list(event_type ORDER BY epoch_us(ts), event_id) AS et
        FROM events GROUP BY user_id
    ),
    tri AS (
        SELECT unnest(
            CASE WHEN len(et) >= 3 THEN list_transform(
                generate_series(1, len(et) - 2),
                i -> concat_ws(' > ', et[i], et[i+1], et[i+2]))
            ELSE [] END) AS path
        FROM seqs
    )
    SELECT path, CAST(count(*) AS BIGINT) AS n_occurrences
    FROM tri GROUP BY path
    ORDER BY n_occurrences DESC, path
    LIMIT 10
    """,
)
def event_path_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "event_type",
        F.unix_micros("ts").alias("ts_us"),
    )
    seqs = ev.groupBy("user_id").agg(
        F.expr(
            "transform(array_sort(collect_list("
            "struct(ts_us, event_id, event_type))), s -> s.event_type)"
        ).alias("et")
    )
    trigrams = F.expr(
        "CASE WHEN size(et) >= 3 THEN "
        "zip_with(zip_with(slice(et, 1, size(et) - 2), "
        "slice(et, 2, size(et) - 2), (x, y) -> concat(x, ' > ', y)), "
        "slice(et, 3, size(et) - 2), (x, y) -> concat(x, ' > ', y)) "
        "ELSE array() END"
    )
    return (
        seqs.select(F.explode(trigrams).alias("path"))
        .groupBy("path")
        .agg(F.count("*").alias("n_occurrences"))
        .orderBy(F.desc("n_occurrences"), "path")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# Holt linear-trend smoothing (double exponential smoothing, alpha =
# beta = 0.5) over each event type's daily value series - the
# level+trend forecaster between ema_user_value (level only) and
# daily_trend_ols (global fit): l_t = a*x_t + (1-a)*(l+b),
# b_t = B*(l_t - l) + (1-B)*b, forecast = l + b. A stateful linear
# recurrence no window frame expresses, so it reuses the EMA
# collect-sort-fold shape with a STRUCT accumulator carrying (l, b).
#
# Determinism: daily totals are exact micro-unit integers with ONE
# double division each; the fold is then a pinned-order sequence of IEEE
# +/* with dyadic 0.5 coefficients, written symbol-for-symbol
# identically on both sides - bit-identical cross-engine (verified: the
# two engines' folds agree to the last ulp at sf0.01 and sf0.1). new_l
# is recomputed inline inside the trend update (lambdas bind no
# locals); both engines evaluate the identical expression tree. The
# oracle carries the (l, b) state through a RECURSIVE CTE over the
# bounded day index rather than list_reduce: this DuckDB build's
# list_reduce mis-evaluates STRUCT-typed accumulators (diverging
# values, unicode-corruption errors on string fields - reproduced and
# ruled out before this oracle was written), while scalar folds like
# ema_user_value's are unaffected.
#
# Scale notes (100 TB): one (event_type, day) map-side-combinable agg
# over the fact table; the fold then runs on |event_types| rows of
# calendar-bounded arrays - driver-free, broadcast-free, and the
# per-key state is bounded by the day count, not the row count.
@query(
    "holt_linear_forecast",
    oracle="""
    WITH RECURSIVE daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               CAST(sum(CAST(floor(value * 1000000) AS BIGINT)) AS BIGINT)
                   AS v_u6
        FROM events GROUP BY 1, 2
    ),
    idx AS (
        SELECT event_type,
               row_number() OVER (PARTITION BY event_type ORDER BY day) AS i,
               CAST(v_u6 AS DOUBLE) / CAST(1000000 AS DOUBLE) AS x
        FROM daily
    ),
    cnt AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_days
            FROM idx GROUP BY 1),
    fold AS (
        SELECT event_type, i, x AS l, CAST(0 AS DOUBLE) AS b
        FROM idx WHERE i = 1
        UNION ALL
        SELECT n.event_type, n.i,
               CAST(0.5 AS DOUBLE) * n.x
                   + CAST(0.5 AS DOUBLE) * (f.l + f.b),
               CAST(0.5 AS DOUBLE)
                   * ((CAST(0.5 AS DOUBLE) * n.x
                       + CAST(0.5 AS DOUBLE) * (f.l + f.b)) - f.l)
                   + CAST(0.5 AS DOUBLE) * f.b
        FROM fold f JOIN idx n ON n.event_type = f.event_type
                              AND n.i = f.i + 1
    )
    SELECT f.event_type, c.n_days, f.l AS level, f.b AS trend,
           f.l + f.b AS forecast_next
    FROM fold f JOIN cnt c ON c.event_type = f.event_type
                          AND f.i = c.n_days
    """,
)
def holt_linear_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.to_date("ts").alias("day"),
        F.floor(F.col("value") * 1_000_000).cast("bigint").alias("v_u6"),
    )
    daily = ev.groupBy("event_type", "day").agg(
        # r12 review find: decimal accumulation + bigint output cast
        # (per-(type,day) u6 totals cross int64 at 100 TB/day - the
        # _daily_micro class; the oracle already sums HUGEINT).
        F.sum(F.col("v_u6").cast("decimal(38,0)")).cast("bigint").alias("v_u6")
    )
    seqs = daily.groupBy("event_type").agg(
        F.count("*").alias("n_days"),
        F.expr(
            "transform(array_sort(collect_list(struct(day, v_u6))),"
            " s -> CAST(s.v_u6 AS DOUBLE) / CAST(1000000 AS DOUBLE))"
        ).alias("xs"),
    )
    fold = seqs.select(
        "event_type",
        "n_days",
        F.expr(
            "aggregate("
            " slice(xs, 2, greatest(size(xs) - 1, 0)),"
            " named_struct('l', element_at(xs, 1), 'b', CAST(0 AS DOUBLE)),"
            " (acc, x) -> named_struct("
            "   'l', CAST(0.5 AS DOUBLE) * x"
            "        + CAST(0.5 AS DOUBLE) * (acc.l + acc.b),"
            "   'b', CAST(0.5 AS DOUBLE)"
            "        * ((CAST(0.5 AS DOUBLE) * x"
            "            + CAST(0.5 AS DOUBLE) * (acc.l + acc.b))"
            "           - acc.l)"
            "        + CAST(0.5 AS DOUBLE) * acc.b))"
        ).alias("hw"),
    )
    return fold.select(
        "event_type",
        "n_days",
        F.col("hw.l").alias("level"),
        F.col("hw.b").alias("trend"),
        (F.col("hw.l") + F.col("hw.b")).alias("forecast_next"),
    )


# ---------------------------------------------------------------------------
# Feature-store point-in-time training set: for every CLICK event, the
# features a model would have been allowed to see AT THAT INSTANT -
# last purchase value, purchase count/total so far (strictly before),
# clicks in the trailing 7 days - plus the 24-hour forward conversion
# label. This is the feature-store correctness contract (no leakage:
# every feature frame ends at -1 row / -1 microsecond; the label frame
# STARTS at +1) that asof_join (one feature, one build side) does not
# generalize to. All features and the label come from ONE stream pass.
#
# Determinism: total order (us, event_id) per user; purchase totals ride
# exact micro ints; last_purchase_value is a value copy, not arithmetic.
#
# Scale notes (100 TB): every window keys on user_id - ONE corpus
# shuffle feeds all five window frames (same partitioning, Catalyst
# plans one Window node per frame spec over the sorted run); no joins,
# no broadcast, output is click-row-sized.
_FS_7D_US = 7 * 86400 * 1_000_000
_FS_24H_US = 24 * 3600 * 1_000_000


@query(
    "feature_store_training_set",
    oracle=f"""
    WITH e AS (
        SELECT event_id, user_id, event_type, value,
               epoch_us(ts) AS us,
               CAST(floor(value * 1000000 + 0.5) AS BIGINT) AS v_micro
        FROM events
    ),
    f AS (
        SELECT event_id, user_id, event_type, us,
               last_value(CASE WHEN event_type = 'purchase' THEN value END
                   IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY us, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   AS last_purchase_value,
               CAST(coalesce(sum(CASE WHEN event_type = 'purchase'
                       THEN 1 END) OVER (
                   PARTITION BY user_id ORDER BY us, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS BIGINT) AS n_purchases_before,
               CAST(coalesce(sum(CASE WHEN event_type = 'purchase'
                       THEN v_micro END) OVER (
                   PARTITION BY user_id ORDER BY us, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS BIGINT) AS purchase_total_micro,
               CAST(coalesce(sum(CASE WHEN event_type = 'click'
                       THEN 1 END) OVER (
                   PARTITION BY user_id ORDER BY us
                   RANGE BETWEEN {_FS_7D_US} PRECEDING AND 1 PRECEDING),
                   0) AS BIGINT) AS clicks_7d,
               CASE WHEN coalesce(max(CASE WHEN event_type = 'purchase'
                       THEN 1 END) OVER (
                   PARTITION BY user_id ORDER BY us
                   RANGE BETWEEN 1 FOLLOWING AND {_FS_24H_US} FOLLOWING),
                   0) = 1 THEN 1 ELSE 0 END AS label_purchase_24h
        FROM e
    )
    SELECT event_id AS click_id, user_id, us,
           last_purchase_value, n_purchases_before,
           purchase_total_micro, clicks_7d,
           CAST(label_purchase_24h AS BIGINT) AS label_purchase_24h
    FROM f WHERE event_type = 'click'
    """,
)
def feature_store_training_set(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "event_type",
        "value",
        F.unix_micros("ts").alias("us"),
        F.floor(F.col("value") * F.lit(1_000_000) + F.lit(0.5))
        .cast("bigint")
        .alias("v_micro"),
    )
    w_rows = (
        W.partitionBy("user_id")
        .orderBy("us", "event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    w_7d = (
        W.partitionBy("user_id")
        .orderBy("us")
        .rangeBetween(-_FS_7D_US, -1)
    )
    w_fwd = (
        W.partitionBy("user_id")
        .orderBy("us")
        .rangeBetween(1, _FS_24H_US)
    )
    is_p = F.col("event_type") == "purchase"
    is_c = F.col("event_type") == "click"
    f = e.select(
        "event_id",
        "user_id",
        "event_type",
        "us",
        F.last(F.when(is_p, F.col("value")), ignorenulls=True)
        .over(w_rows)
        .alias("last_purchase_value"),
        F.coalesce(F.sum(F.when(is_p, 1)).over(w_rows), F.lit(0))
        .cast("bigint")
        .alias("n_purchases_before"),
        F.coalesce(F.sum(F.when(is_p, F.col("v_micro"))).over(w_rows), F.lit(0))
        .cast("bigint")
        .alias("purchase_total_micro"),
        F.coalesce(F.sum(F.when(is_c, 1)).over(w_7d), F.lit(0))
        .cast("bigint")
        .alias("clicks_7d"),
        F.when(
            F.coalesce(F.max(F.when(is_p, 1)).over(w_fwd), F.lit(0)) == 1, 1
        )
        .otherwise(0)
        .cast("bigint")
        .alias("label_purchase_24h"),
    )
    return f.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        "user_id",
        "us",
        "last_purchase_value",
        "n_purchases_before",
        "purchase_total_micro",
        "clicks_7d",
        "label_purchase_24h",
    )


# ---------------------------------------------------------------------------
# FORWARD as-of join: for every click, the NEXT purchase by the same
# user at-or-after the click instant - the mirror of
# asof_join_purchase_click (backward: last click before a purchase).
# Backward as-of answers attribution ("what caused this?"); forward
# as-of answers outcome lookup ("what did this lead to?") - the shape
# behind time-to-repair, next-maintenance, and per-impression
# conversion joins. Completes the temporal family: backward as-of,
# range join, gap fill, and now forward as-of.
#
# Tie contract (shared with the oracle): among purchases at the same
# (user_id, ts) the SMALLEST event_id wins; a purchase exactly at the
# click instant matches (inclusive >=).
#
# Scale notes (100 TB): the same union trick as asof_join - tag sides,
# union, ONE window per user ordered by ts DESCENDING carrying the
# nearest following purchase backward; a single user_id shuffle, O(1)
# running state, no range-join candidate blowup.
@query(
    "asof_forward_next_purchase",
    oracle="""
    WITH c AS (
        SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
    ),
    p AS (  -- one row per (user, instant): smallest event_id survives
        SELECT user_id, ts, min(event_id) AS event_id
        FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts
    )
    SELECT c.event_id AS click_id,
           c.user_id,
           epoch_us(c.ts) AS click_us,
           p.event_id AS next_purchase_id,
           epoch_us(p.ts) AS next_purchase_us,
           epoch_us(p.ts) - epoch_us(c.ts) AS wait_us
    FROM c ASOF LEFT JOIN p
      ON c.user_id = p.user_id AND p.ts >= c.ts
    """,
)
def asof_forward_next_purchase(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "event_type"
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        "user_id",
        F.unix_micros("ts").alias("us"),
    )
    purchases = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy("user_id", F.unix_micros("ts").alias("us"))
        .agg(F.min("event_id").alias("purchase_id"))
    )
    b = purchases.select(
        "user_id",
        "us",
        "purchase_id",
        F.lit(0).alias("side"),
        F.lit(None).cast("bigint").alias("click_id"),
    )
    p = clicks.select(
        "user_id",
        "us",
        F.lit(None).cast("bigint").alias("purchase_id"),
        F.lit(1).alias("side"),
        "click_id",
    )
    # DESC time order: the window carries the nearest FOLLOWING purchase
    # backward onto each click; at equal us the purchase row (side 0)
    # precedes the click row, making >= inclusive.
    w = (
        W.partitionBy("user_id")
        .orderBy(F.desc("us"), "side")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    is_b = F.col("side") == 0
    return (
        b.unionByName(p)
        .select(
            "side",
            "click_id",
            "user_id",
            F.col("us").alias("click_us"),
            F.last(F.when(is_b, F.col("purchase_id")), ignorenulls=True)
            .over(w)
            .alias("next_purchase_id"),
            F.last(F.when(is_b, F.col("us")), ignorenulls=True)
            .over(w)
            .alias("next_purchase_us"),
        )
        .where(F.col("side") == 1)
        .select(
            "click_id",
            "user_id",
            "click_us",
            "next_purchase_id",
            "next_purchase_us",
            (F.col("next_purchase_us") - F.col("click_us")).alias("wait_us"),
        )
    )


# ---------------------------------------------------------------------------
# Attribution-window sensitivity sweep: how many purchases get click
# attribution at EVERY candidate lookback window (1h / 6h / 24h / 72h)
# from one as-of pass - the sweep marketing runs before committing to a
# window (asof_join_purchase_click answers one window implicitly; the
# business question is how the number MOVES as the window widens). Per
# window: attributed purchases and the attribution share.
#
# Determinism: gaps are exact micros off the same union-window as-of
# device (ties to the largest click id); the window test is integer
# comparison; shares are single divisions.
#
# Scale notes (100 TB): ONE user-keyed as-of pass computes every gap;
# the sweep is a bounded 4-row conditional aggregation over it - the
# whole point vs re-running attribution per window.
_ATTR_WINDOWS_H = (1, 6, 24, 72)


@query(
    "attribution_window_sweep",
    oracle=f"""
    WITH p AS (
        SELECT event_id, user_id, ts FROM events
        WHERE event_type = 'purchase'
    ),
    c AS (
        SELECT user_id, ts, max(event_id) AS event_id
        FROM events WHERE event_type = 'click' GROUP BY user_id, ts
    ),
    g AS (
        SELECT p.event_id,
               epoch_us(p.ts) - epoch_us(c.ts) AS gap_us
        FROM p ASOF LEFT JOIN c
          ON p.user_id = c.user_id AND c.ts <= p.ts
    ),
    t AS (SELECT CAST(count(*) AS BIGINT) AS n_purchases FROM g)
    SELECT w.window_hours,
           CAST(count(*) FILTER (g.gap_us IS NOT NULL
               AND g.gap_us <= w.window_hours * 3600000000) AS BIGINT)
               AS n_attributed,
           CAST(count(*) FILTER (g.gap_us IS NOT NULL
               AND g.gap_us <= w.window_hours * 3600000000) AS DOUBLE)
               / CAST(max(t.n_purchases) AS DOUBLE) AS attributed_share
    FROM g
    CROSS JOIN (SELECT unnest({list(_ATTR_WINDOWS_H)}) AS window_hours) w
    CROSS JOIN t
    GROUP BY w.window_hours
    """,
)
def attribution_window_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "event_type"
    )
    probe = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", "ts"
    )
    build = (
        ev.where(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("click_id"))
    )
    j = asof_join(probe, build, key="user_id", ts="ts", build_id="click_id")
    g = j.select(
        "purchase_id",
        (F.unix_micros("ts") - F.col("asof_ts_us")).alias("gap_us"),
    )
    # Scale-gated persist (r17): `g` feeds the purchase count and the
    # window sweep - the whole asof-join subtree (2 events scans +
    # sort) runs twice per plan. No-op at fixture scale (the r16
    # cheap-subtree lesson); at corpus scale the second asof join is a
    # full extra shuffle+sort, so the 2-column per-purchase gap
    # relation persists (disk-backed) once the input has real splits.
    from ..tables import persist_when_scaled, scan_splits

    while _ATTR_CACHE:
        _ATTR_CACHE.pop().unpersist()
    g = persist_when_scaled(
        g, _ATTR_CACHE, scan_splits(spark, sf_dir, "events"), dup=2
    )
    t = g.agg(F.count("*").cast("bigint").alias("n_purchases"))
    wins = F.explode(
        F.array(*[F.lit(h).cast("bigint") for h in _ATTR_WINDOWS_H])
    ).alias("window_hours")
    hit = F.col("gap_us").isNotNull() & (
        F.col("gap_us") <= F.col("window_hours") * F.lit(3_600_000_000)
    )
    return (
        g.select("gap_us", wins)
        .crossJoin(F.broadcast(t))
        .groupBy("window_hours")
        .agg(
            F.count(F.when(hit, 1)).cast("bigint").alias("n_attributed"),
            (
                F.count(F.when(hit, 1)).cast("double")
                / F.max("n_purchases").cast("double")
            ).alias("attributed_share"),
        )
    )
