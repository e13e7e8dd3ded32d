"""Custom stateful streaming operator: applyInPandasWithState.

The built-in streaming aggregations (aggregations.py) cover windowed and
session state; this module is the ESCAPE HATCH tier - arbitrary per-key
state the built-ins can't express (SURVEY §2b "stateful streaming ops",
brief: "applyInPandasWithState for custom stateful operators").

Operator: per-user running feature accumulator. For every user_id the
state holds (n_events, total_value, max_ts_us); each micro-batch folds its
rows into the state and emits the updated snapshot. The pattern is the
streaming half of feature-store maintenance: cumulative per-entity
aggregates over an unbounded event stream, exactly-once per checkpoint.

Scale notes (100 TB/day stream):
  * state is O(|users|) fixed-width rows, hash-partitioned by user_id -
    the same layout a shuffle-partitioned batch agg would have;
  * rows cross the Python boundary in Arrow batches per key-group, not
    per row;
  * emitted snapshots are per-key upserts: downstream sinks treat them as
    an update stream (foreachBatch MERGE, or a key-value store write).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
        T.StructField("max_ts_us", T.LongType()),
    ]
)

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
        T.StructField("max_ts_us", T.LongType()),
    ]
)


def _accumulate(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    if state.exists:
        n, total, max_ts = state.get
    else:
        n, total, max_ts = 0, 0.0, 0
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
        if len(pdf):
            max_ts = max(max_ts, int(pdf["ts_us"].max()))
    state.update((n, total, max_ts))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "total_value": [total],
            "max_ts_us": [max_ts],
        }
    )


def running_user_totals(events_stream: DataFrame) -> DataFrame:
    """events_stream needs (user_id, value, ts_us). Emits one updated
    (user_id, n_events, total_value, max_ts_us) snapshot per key per
    micro-batch; pair with outputMode('update')."""
    return events_stream.groupBy("user_id").applyInPandasWithState(
        _accumulate,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
