"""Event-time windowed aggregations, batch + streaming (SURVEY.md §2b).

The reference has no stateful streaming surface (its only late-data policy
is whole-file loads, T1); these are the extension ops a chart/event stream
needs: watermarked tumbling windows and gap-based session windows.

Batch/streaming duality is the design invariant: session_window_agg (batch,
built-in session_window) is oracle-checked against the MANUAL lag+running-
sum sessionization SQL (operators/windows.py), proving Spark's native
operator implements exactly the declared gap semantics; the streaming
twins below run the same expressions under a watermark and are asserted
against batch results in tests/test_streaming.py.

Scale notes: streaming state is bounded by the watermark (late rows beyond
30 min are dropped, state for closed windows evicted); keys are
(window/user_id) - high cardinality, no skew. Never run an unwatermarked
streaming agg in production: state grows without bound.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import dsum
from ..registry import query
from ..tables import load_table

GAP = "30 minutes"
_GAP_US = 30 * 60 * 1_000_000
WATERMARK = "1 hour"


# ---------------------------------------------------------------------------
# Batch session_window: Spark's built-in merging session operator, hash-
# checked against the manual lag+running-sum definition in DuckDB.
@query(
    "session_window_agg",
    oracle=f"""
    SELECT user_id,
           min(ts_us) AS session_start_us,
           max(ts_us) AS last_event_us,
           count(*) AS n_events
    FROM (
        SELECT user_id, ts_us,
               sum(is_new) OVER (
                   PARTITION BY user_id ORDER BY ts_us, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS session_id
        FROM (
            SELECT user_id, event_id, epoch_us(ts) AS ts_us,
                   CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   ) > {_GAP_US} OR lag(epoch_us(ts)) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   ) IS NULL THEN 1 ELSE 0 END AS is_new
            FROM events
        )
    )
    GROUP BY user_id, session_id
    ORDER BY user_id, session_start_us
    """,
)
def session_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", GAP).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.unix_micros(F.col("w.start")).alias("session_start_us"),
            # session end = last event + gap, so recover the last event time
            (F.unix_micros(F.col("w.end")) - F.lit(_GAP_US)).alias(
                "last_event_us"
            ),
            "n_events",
        )
        .orderBy("user_id", "session_start_us")
    )


# ---------------------------------------------------------------------------
# Streaming twins (driven by tests over a file stream of the same events).
def streaming_tumbling_agg(events_stream: DataFrame) -> DataFrame:
    """Watermarked tumbling window x event_type - the streaming twin of
    operators/windows.tumbling_window_agg."""
    return (
        events_stream.withWatermark("ts", WATERMARK)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            dsum("value", scale=6, alias="sum_value"),
        )
        .select(
            F.unix_micros(F.col("w.start")).alias("window_start_us"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def streaming_session_agg(events_stream: DataFrame) -> DataFrame:
    """Watermarked session windows per user - the streaming twin of
    session_window_agg."""
    return (
        events_stream.withWatermark("ts", WATERMARK)
        .groupBy(F.session_window("ts", GAP).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.unix_micros(F.col("w.start")).alias("session_start_us"),
            (F.unix_micros(F.col("w.end")) - F.lit(_GAP_US)).alias(
                "last_event_us"
            ),
            "n_events",
        )
    )
