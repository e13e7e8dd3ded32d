"""MERGE / upsert: apply a change set onto a dimension (warehouse SCD1).

The reference's warehouse tier only ever appends (COPY INTO / Snowpipe,
spotify-analysis.sql:58-74); a real dim needs MERGE: update matched keys,
insert unmatched ones, keep the rest. Spark has no MERGE statement outside
table formats (Delta/Iceberg), so the engine expresses it as the canonical
full-outer-join rewrite - which is exactly what those formats execute
underneath.

The change set here is itself derived: each user's LATEST event value
(deterministic argmax via row_number over (ts DESC, event_id DESC)),
applied to the customer dim's account balance.

Scale notes (100 TB):
  * change-set derivation: one window shuffle on user_id.
  * the merge: one sort-merge full-outer join on the dim key. No
    broadcast of anything O(dim).
  * on a real lakehouse table this plan feeds a partition-overwrite
    (copy-on-write) of only the partitions containing touched keys -
    the join output carries merge_action so the writer can skip
    'kept' partitions; the relational result below is the part every
    format shares.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..registry import query
from ..tables import load_table


def merge_upsert(
    base: DataFrame,
    changes: DataFrame,
    key: str,
    set_cols: dict[str, str],
    insert_defaults: dict[str, Column] | None = None,
    check_unique_key: bool = True,
) -> DataFrame:
    """Generic SCD1 merge: rows of `changes` update matching `base` rows'
    `set_cols` (base_col <- change_col) and insert new keys; untouched
    base rows pass through. Adds merge_action in {kept, updated, inserted}.

    `changes` MUST be unique on `key`: the full-outer-join rewrite would
    otherwise fan a matched base row out once per duplicate, silently
    multiplying the dimension. Real MERGE engines (Delta/Iceberg) raise
    on multiple matches; with `check_unique_key` (default) so does this
    one, at execution time, via a per-key window count that raises on the
    first key seen twice. The window partitions on the same key the join
    shuffles on, so alias-aware output partitioning makes the guard a
    zero-extra-exchange pass over the change set. Disable only when the
    caller proves uniqueness upstream (e.g. a rn=1 slice) and the extra
    sort matters.
    """
    insert_defaults = insert_defaults or {}
    if check_unique_key:
        kc = F.count("*").over(W.partitionBy(key))
        changes = (
            changes.withColumn("_key_cnt", kc)
            .where(
                F.when(F.col("_key_cnt") == 1, F.lit(True)).otherwise(
                    F.raise_error(
                        F.concat(
                            F.lit(
                                "merge_upsert: duplicate change-set key "
                                f"'{key}' = "
                            ),
                            F.col(key).cast("string"),
                        )
                    )
                )
            )
            .drop("_key_cnt")
        )
    b = base.alias("b")
    c = changes.alias("c")
    joined = b.join(c, F.col(f"b.{key}") == F.col(f"c.{key}"), "full_outer")
    matched = F.col(f"c.{key}").isNotNull()
    in_base = F.col(f"b.{key}").isNotNull()
    out = [F.coalesce(F.col(f"b.{key}"), F.col(f"c.{key}")).alias(key)]
    for col in base.columns:
        if col == key:
            continue
        expr = F.col(f"b.{col}")
        if col in set_cols:
            expr = F.when(matched, F.col(f"c.{set_cols[col]}")).otherwise(expr)
        elif col in insert_defaults:
            expr = F.when(in_base, expr).otherwise(insert_defaults[col])
        out.append(expr.alias(col))
    action = (
        F.when(~matched, F.lit("kept"))
        .when(~in_base, F.lit("inserted"))
        .otherwise(F.lit("updated"))
    )
    return joined.select(*out, action.alias("merge_action"))


@query(
    "merge_upsert_customer",
    oracle="""
    WITH upd AS (
        SELECT user_id, value FROM (
            SELECT user_id, value,
                   row_number() OVER (
                       PARTITION BY user_id ORDER BY ts DESC, event_id DESC
                   ) AS rn
            FROM events
        ) WHERE rn = 1
    )
    SELECT coalesce(c.c_custkey, u.user_id) AS c_custkey,
           CASE WHEN c.c_custkey IS NULL THEN '(new)' ELSE c.c_name END
               AS c_name,
           CASE WHEN u.user_id IS NULL THEN c.c_acctbal ELSE u.value END
               AS c_acctbal,
           CASE WHEN u.user_id IS NULL THEN 'kept'
                WHEN c.c_custkey IS NULL THEN 'inserted'
                ELSE 'updated' END AS merge_action
    FROM customer c FULL OUTER JOIN upd u ON c.c_custkey = u.user_id
    ORDER BY c_custkey
    """,
)
def merge_upsert_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest event value per user MERGEd into customer.c_acctbal."""
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal"
    )
    w = W.partitionBy("user_id").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    upd = (
        load_table(spark, sf_dir, "events")
        .select("user_id", "ts", "event_id", "value")
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(F.col("user_id").alias("c_custkey"), F.col("value"))
    )
    # no output sort: the merged dim is full-table scale and the driver
    # hash is order-insensitive - dropping the rangepartitioning leaves
    # exactly two exchanges (change-set window + base join side; the
    # uniqueness guard rides the window's partitioning, asserted by
    # tests/test_temporal_curation.py::test_merge_guard_adds_no_exchange)
    return merge_upsert(
        cust,
        upd,
        key="c_custkey",
        set_cols={"c_acctbal": "value"},
        insert_defaults={"c_name": F.lit("(new)")},
    )


# ---------------------------------------------------------------------------
# SCD2: change-point history. Each user's event stream becomes versioned
# rows: only events whose value differs from the previous one open a new
# version; valid_from/valid_to (exclusive, microseconds) come from lead(),
# the open version has valid_to NULL. This is the full slowly-changing-
# dimension shape the SCD1 merge above collapses to "latest only".
#
# Scale notes (100 TB): two windows over the SAME (user_id ORDER BY ts,
# event_id) sort - Catalyst reuses one shuffle+sort for both (lag for
# change detection, lead/row_number after the filter re-sorts only the
# surviving change points). No joins, no driver state.
@query(
    "scd2_user_value_history",
    oracle="""
    WITH ordered AS (
        SELECT user_id, value, event_id, epoch_us(ts) AS ts_us,
               lag(value) OVER (
                   PARTITION BY user_id ORDER BY epoch_us(ts), event_id
               ) AS prev_value
        FROM events
    ),
    changes AS (
        SELECT user_id, value, ts_us, event_id FROM ordered
        WHERE prev_value IS NULL OR value <> prev_value
    )
    SELECT user_id,
           row_number() OVER (
               PARTITION BY user_id ORDER BY ts_us, event_id
           ) AS version_no,
           value,
           ts_us AS valid_from_us,
           lead(ts_us) OVER (
               PARTITION BY user_id ORDER BY ts_us, event_id
           ) AS valid_to_us,
           (lead(ts_us) OVER (
               PARTITION BY user_id ORDER BY ts_us, event_id
           ) IS NULL) AS is_current
    FROM changes
    ORDER BY user_id, version_no
    """,
)
def scd2_user_value_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "value", F.unix_micros("ts").alias("ts_us")
    )
    w_ev = W.partitionBy("user_id").orderBy("ts_us", "event_id")
    changes = (
        ev.withColumn("prev_value", F.lag("value").over(w_ev))
        .where(F.col("prev_value").isNull() | (F.col("value") != F.col("prev_value")))
        .select("user_id", "value", "ts_us", "event_id")
    )
    w_ch = W.partitionBy("user_id").orderBy("ts_us", "event_id")
    return (
        changes.select(
            "user_id",
            F.row_number().over(w_ch).alias("version_no"),
            "value",
            F.col("ts_us").alias("valid_from_us"),
            F.lead("ts_us").over(w_ch).alias("valid_to_us"),
            F.lead("ts_us").over(w_ch).isNull().alias("is_current"),
        )
        .orderBy("user_id", "version_no")
    )
