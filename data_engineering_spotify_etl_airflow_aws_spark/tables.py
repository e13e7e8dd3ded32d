"""Loaders for the driver-generated testdata tables (TESTDATA.md).

Normalizes the fixtures' physical timestamp quirks so every operator sees one
timestamp semantic: TimestampType UTC instants (the session timezone is pinned
to UTC in session.RUNTIME_CONFS).

- timestamp[us] parquet columns carry no timezone (isAdjustedToUTC=false), so
  Spark surfaces them as TIMESTAMP_NTZ; we cast to TimestampType, which under
  the UTC session reinterprets the same wall-clock as a UTC instant — exactly
  how DuckDB's epoch_us() treats its naive TIMESTAMP, so oracles agree.
- timestamp[ns] columns (earlier fixture generations) are only readable via
  the nanosAsLong escape hatch; we convert the long back to TimestampType
  with microsecond truncation (matching DuckDB's ns->us conversion).

load_table() applies the needed session confs defensively because the
correctness driver hands us a session we didn't build.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .session import apply_runtime_confs

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# columns stored as timestamp[ns] -> read as long (nanos since epoch)
_NANOS_COLS = {"events": ("ts",)}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    apply_runtime_confs(spark)
    df = spark.read.parquet(f"{sf_dir.rstrip('/')}/{name}.parquet")
    dtypes = dict(df.dtypes)
    for col in _NANOS_COLS.get(name, ()):
        if dtypes.get(col) == "bigint":
            # Floor division in exact long arithmetic (`div` truncates toward
            # zero, which would be off by 1µs for pre-1970 negative nanos;
            # float division would lose precision past 2^53). pmod keeps the
            # remainder non-negative, matching DuckDB's floor-based epoch_us.
            df = df.withColumn(
                col,
                F.timestamp_micros(
                    F.expr(f"(`{col}` - pmod(`{col}`, 1000L)) div 1000L")
                ),
            )
    # NTZ -> UTC instant (no-op on the wall-clock under the UTC session; see
    # module docstring). Cast keeps the projection narrow and codegen-able.
    ntz_cols = [c for c, d in dtypes.items() if d == "timestamp_ntz"]
    if ntz_cols:
        df = df.withColumns(
            {c: F.col(c).cast("timestamp") for c in ntz_cols}
        )
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view (catalog-scan analog of
    the reference's Glue Crawler + Athena tier; SURVEY.md S4)."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def widen_small_scan(df: DataFrame, parts: int | None = None) -> DataFrame:
    """Fan a small scan out to the session's parallelism before CPU-heavy
    per-row work (regex tokenization, shingling, n-gram building).

    A small parquet fixture is ONE split (single row group), so without
    this the whole map stage runs on one core while 31 idle - measured
    3.5s -> 1.3s for the Jaccard shingle base at sf0.1. At real scale the
    scan already has >= parallelism splits and this is a no-op, so the
    shuffle only exists in exactly the regime where it is free.
    """
    sess = df.sparkSession
    target = parts or sess.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
