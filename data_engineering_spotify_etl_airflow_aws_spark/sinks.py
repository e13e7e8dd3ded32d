"""Sinks (SURVEY.md §2a K1-K5): raw JSON write, per-table CSV, date-
partitioned Parquet (the engine's canonical physical design), persistent
catalog tables, and consumed-file archival.

Reference parity: K1 raw JSON landing (P:199-207), K2 per-table CSV
(P:221-261), K3 warehouse append / COPY INTO (S:58-74) -> saveAsTable,
K5 inbox hygiene copy-then-delete (P:166-183) -> Hadoop FileSystem rename
(atomic per object store semantics, same crash window as the reference's
copy+delete but idempotent on replay because the streaming checkpoint, not
the inbox, is the source of truth - SURVEY §7.5).

Scale notes (100 TB): everything lands partitioned by scrape_date so the
recency/point queries (Q1/Q4 shapes) prune partitions statically; writes
use dynamic partition overwrite to make daily re-runs idempotent without
clobbering other days.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_raw_json(df: DataFrame, path: str) -> None:
    """K1: raw landing zone, append-only."""
    df.write.mode("append").json(path)


def write_table_csv(df: DataFrame, path: str) -> None:
    """K2: per-table CSV export with header (the reference's interchange)."""
    df.write.mode("overwrite").option("header", "true").csv(path)


def write_partitioned(
    df: DataFrame, path: str, partition_by: str = "scrape_date"
) -> None:
    """K2 -> canonical form: date-partitioned Parquet. Dynamic overwrite
    replaces only the partitions present in df (idempotent daily re-runs)."""
    (
        df.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(partition_by)
        .parquet(path)
    )


def save_as_table(
    df: DataFrame, name: str, partition_by: str | None = None
) -> None:
    """K3/S4: persistent session-catalog table (Glue Crawler + COPY INTO
    analog); downstream access is spark.sql / spark.table."""
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(partition_by)
    w.saveAsTable(name)


def archive_consumed(spark: SparkSession, src_dir: str, dest_dir: str) -> int:
    """K5: move consumed inbox files out of the scan prefix via the Hadoop
    FileSystem API (scheme-agnostic: file://, s3a://, ...). Returns the
    number of files moved. Idempotent: missing sources are skipped."""
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    src = jvm.org.apache.hadoop.fs.Path(src_dir)
    dst = jvm.org.apache.hadoop.fs.Path(dest_dir)
    fs = src.getFileSystem(conf)
    if not fs.exists(src):
        return 0
    fs.mkdirs(dst)
    moved = 0
    for status in fs.listStatus(src):
        p = status.getPath()
        if fs.rename(p, jvm.org.apache.hadoop.fs.Path(dst, p.getName())):
            moved += 1
    return moved


def save_bucketed_table(
    df: DataFrame,
    name: str,
    bucket_by: str,
    n_buckets: int = 16,
    sort_by: str | None = None,
) -> None:
    """Bucketed catalog table: pre-shuffles ONCE at write time so every
    later equi-join/agg on the bucket key is exchange-free (the co-located
    join strategy for repeated fact-to-fact joins at 100 TB - pay the
    shuffle once, reuse it every query)."""
    w = df.write.mode("overwrite").bucketBy(n_buckets, bucket_by)
    if sort_by:
        w = w.sortBy(sort_by)
    w.saveAsTable(name)
