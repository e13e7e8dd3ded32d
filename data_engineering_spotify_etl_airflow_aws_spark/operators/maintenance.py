"""Table-maintenance operators: small-file compaction.

Continuous ingest (the reference's daily Snowpipe loads, S:58-74; this
repo's streaming/ingest.py) accretes many small files - the classic
lakehouse pathology: scan parallelism explodes into per-file open
overhead and the NameNode/listing cost dominates. Every table format's
maintenance story (Delta OPTIMIZE, Iceberg rewrite_data_files, Hive
concatenate) is the same operation: rewrite N small files into
ceil(total/target) right-sized ones WITHOUT changing table content.

The operator here is that rewrite expressed in plain Spark: read the
fragmented directory, repartitionByRange on the sort key (keeps the
range-clustering property compaction should preserve - min/max file
stats stay selective), write to a fresh directory, and PROVE content
invariance with a row-count + order-insensitive content checksum that
the DuckDB oracle computes from the raw table. File counts are part of
the checked output: 64 before (fixture construction), 8 after
(repartition target) - both deterministic.

Scale notes (100 TB): compaction is one range-shuffle of the fragmented
data - the minimum possible for a clustering-preserving rewrite (hash
repartition would be cheaper but destroys range locality). In
production this runs per-partition (compact yesterday's ingest
partition), bounding the shuffle to one day's arrivals, and swaps
directories atomically (write to _tmp, rename) - the same
write-then-commit shape as sinks.py's partitioned writer.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load_table
from .dedup import _DUCK_H32, _SPARK_H32
from .extras import _ensure_derived_copy

_FRAG_ROOT = "/tmp/spark_graft_fragmented"
_FRAG_FILES = 64
_COMPACT_TARGET = 8

_ROW_SPARK = (
    "concat_ws('|', cast(event_id as string), cast(user_id as string), "
    "cast(unix_micros(ts) as string), event_type, "
    "cast(cast(floor(value * 1000000) as bigint) as string))"
)
_ROW_DUCK = (
    "concat_ws('|', CAST(event_id AS VARCHAR), CAST(user_id AS VARCHAR), "
    "CAST(epoch_us(ts) AS VARCHAR), event_type, "
    "CAST(CAST(floor(value * 1000000) AS BIGINT) AS VARCHAR))"
)


def ensure_fragmented_events(spark: SparkSession, sf_dir: str) -> str:
    """The pathology under repair, written once per data generation: the
    events table sprayed across 64 range-partitioned files (what ~2
    months of daily micro-batch ingest leaves behind)."""

    def write(dest: str) -> None:
        (
            load_table(spark, sf_dir, "events")
            .repartitionByRange(_FRAG_FILES, "ts")
            .write.mode("overwrite")
            .parquet(dest)
        )

    return _ensure_derived_copy(_FRAG_ROOT, sf_dir, write)


def compact_directory(
    spark: SparkSession, src: str, dest: str, n_files: int, sort_col: str
) -> None:
    """The maintenance rewrite: N files -> n_files, preserving range
    clustering on sort_col."""
    (
        spark.read.parquet(src)
        .repartitionByRange(n_files, sort_col)
        .sortWithinPartitions(sort_col)
        .write.mode("overwrite")
        .parquet(dest)
    )


@query(
    "compact_small_files",
    oracle=f"""
    SELECT CAST({_FRAG_FILES} AS BIGINT) AS n_files_before,
           CAST({_COMPACT_TARGET} AS BIGINT) AS n_files_after,
           count(*) AS n_rows,
           CAST(sum({_DUCK_H32.format(s=_ROW_DUCK)}) AS BIGINT)
               AS content_checksum
    FROM events
    """,
)
def compact_small_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    frag = ensure_fragmented_events(spark, sf_dir)
    # the rewrite OUTPUT is per-run work product, not a shared fixture:
    # pid-scope it so two engine processes compacting the same generation
    # never overwrite each other mid-read (the run_scratch rule; the
    # fragmented INPUT above is marker-guarded and immutable once built)
    dest = str(
        Path(frag).parent / f"{Path(frag).name}_compacted_{os.getpid()}"
    )
    # sweep compacted outputs left by dead processes (bounded disk, same
    # policy as streaming.chunks._sweep_dead_run_dirs)
    import shutil

    for d in Path(frag).parent.glob("*_compacted_*"):
        try:
            pid = int(d.name.rsplit("_", 1)[1])
            os.kill(pid, 0)
        except ValueError:
            continue
        except ProcessLookupError:
            shutil.rmtree(d, ignore_errors=True)
        except PermissionError:
            pass
    compact_directory(spark, frag, dest, _COMPACT_TARGET, "ts")

    def count_files(d: str) -> int:
        return sum(1 for p in Path(d).glob("*.parquet"))

    nb, na = count_files(frag), count_files(dest)
    back = spark.read.parquet(dest)
    return back.agg(
        F.lit(nb).cast("bigint").alias("n_files_before"),
        F.lit(na).cast("bigint").alias("n_files_after"),
        F.count("*").alias("n_rows"),
        # r13 review: h32 sums cross int64 at ~4.3e9 rows (avg 2^31 per
        # row) - decimal accumulation; the bigint output cast raises
        # loudly past int64 under the pinned ANSI mode, mirroring the
        # oracle's HUGEINT-sum-then-BIGINT-cast
        F.sum(
            F.expr(_SPARK_H32.format(s=_ROW_SPARK)).cast("decimal(38,0)")
        )
        .cast("bigint")
        .alias("content_checksum"),
    )
