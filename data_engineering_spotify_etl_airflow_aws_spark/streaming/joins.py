"""Stream-stream event-time interval join with watermarked state.

The last major Structured Streaming surface the engine exposes: joining
two unbounded streams (here: purchase events to the clicks that preceded
them within an attribution window) where neither side can be buffered
whole. Spark keeps both sides in keyed state and uses the event-time
bounds in the join condition plus each side's watermark to evict rows
that can no longer match - state is O(arrival rate x (watermark + join
window)) per side, never O(stream).

The reference repo's pipeline is batch-only (its "continuous" tier is
Snowpipe file ingest, S:58-74, covered by streaming/ingest.py); this
generalizes it the way an event-attribution pipeline needs. Cites:
Airflow-docker/dags/spotify-airflow-pipeline.py:140-170 (the event feed
shape this extends).

Safety of availableNow over range-ordered chunks: the watermark only
advances AFTER a micro-batch completes, and state eviction keeps every
click within (join window + watermark delay) of the global minimum
watermark. Chunks are time-bucketed AND arrive in event-time order by
construction - FileStreamSource orders files by modification time, which
chunks.py stamps explicitly in range order (path order alone would not
guarantee this) - so a batch-N purchase can only need clicks newer than
watermark - window - delay, which are still in state; the driver-audited
result is therefore EXACTLY the batch join, which the DuckDB oracle
states directly.
"""

from __future__ import annotations

import shutil
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from .chunks import plain_event_feed

_EVENT_SCHEMA = (
    "event_id bigint, user_id bigint, ts timestamp, "
    "event_type string, value double"
)

# attribution window: clicks within 2h before the purchase
_JOIN_WINDOW = "2 hours"
_WATERMARK = "30 minutes"


def click_purchase_join_stream(
    spark: SparkSession, chunk_dir: str
) -> DataFrame:
    """The streaming operator under test: two file-source streams over the
    same chunk feed, watermarked both sides, inner-joined on user with an
    event-time interval condition (the state-eviction contract)."""
    raw = spark.readStream.schema(_EVENT_SCHEMA).parquet(chunk_dir)
    clicks = (
        raw.where(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", _WATERMARK)
    )
    purchases = (
        raw.where(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", _WATERMARK)
    )
    return purchases.join(
        clicks,
        F.expr(
            f"c_user = p_user AND "
            f"c_ts BETWEEN p_ts - INTERVAL {_JOIN_WINDOW} AND p_ts"
        ),
    )


@query(
    "stream_join_click_purchase",
    oracle="""
    SELECT p.event_id AS purchase_id,
           c.event_id AS click_id,
           p.user_id AS user_id,
           epoch_us(p.ts) AS purchase_ts_us,
           epoch_us(c.ts) AS click_ts_us
    FROM events p JOIN events c
      ON p.user_id = c.user_id
     AND c.ts BETWEEN p.ts - INTERVAL 2 HOUR AND p.ts
    WHERE p.event_type = 'purchase' AND c.event_type = 'click'
    ORDER BY purchase_id, click_id
    """,
)
def stream_join_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = Path("/tmp/spark_graft_stream/click_purchase_join")
    shutil.rmtree(base, ignore_errors=True)

    chunks = plain_event_feed(spark, sf_dir)

    # Stateful-query state stores are one-per-shuffle-partition (x4 for a
    # stream-stream join) and each pays per-batch checkpoint I/O, so the
    # partition count must be sized to STATE volume, not to the session's
    # scan parallelism (32 partitions of near-empty state measured 12.2s;
    # 8 measured 3.0s). A production run sizes this to arrival rate x
    # watermark the same way.
    prev_sp = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        q = (
            click_purchase_join_stream(spark, chunks)
            .writeStream.format("parquet")
            .option("path", str(base / "data"))
            .option("checkpointLocation", str(base / "checkpoint"))
            .option("maxFilesPerTrigger", "3")  # >1 real micro-batch
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_sp)

    back = spark.read.parquet(str(base / "data"))
    return back.select(
        "purchase_id",
        "click_id",
        F.col("p_user").alias("user_id"),
        F.unix_micros("p_ts").alias("purchase_ts_us"),
        F.unix_micros("c_ts").alias("click_ts_us"),
    ).orderBy("purchase_id", "click_id")
