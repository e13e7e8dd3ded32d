"""Shared time-bucketed chunk-file builder for the streaming queries.

The registered streaming queries (dedup, stream-stream join, stateful
totals) exercise a file-source stream over the events fixture. The chunk
layout is a pure function of the source data and the builder logic, so it
is written ONCE per (source generation, builder version) and reused
across invocations - the per-run rebuild was bench noise (round-3
verdict). The cache key covers the source file's identity (size + mtime)
because the round driver regenerates /root/testdata between rounds, plus
the caller's builder-version string and n_chunks, because a code change
to the builder must not replay a stale layout from /tmp.

repartitionByRange(ts) is the distributed way to write time-bucketed
files: no global sort, no driver collection, and rows with equal ts land
in the same chunk by construction. Spark's FileStreamSource orders files
by MODIFICATION TIME (task/job-commit order), not path, so range-ordered
part file NAMES alone do not guarantee chronological arrival - a later
time bucket landing in an earlier micro-batch would advance the watermark
past rows still in flight and silently drop them as late. The builder
therefore stamps each part file's mtime explicitly in range (path) order
after the write, making arrival order == event-time order by
construction.
"""

from __future__ import annotations

import hashlib
import os
import shutil
import time
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_CHUNK_ROOT = Path("/tmp/spark_graft_stream")


def _stamp_mtimes_in_range_order(chunks: Path) -> None:
    """Set part-file mtimes strictly increasing in path order (part-00000
    is the earliest range bucket). 2-second spacing, all in the past, so
    FileStreamSource's ms-granularity timestamp sort sees the same order
    a real chronological file-arrival feed would produce."""
    parts = sorted(p for p in chunks.glob("part-*") if p.is_file())
    base = time.time() - 2.0 * (len(parts) + 1)
    for i, p in enumerate(parts):
        t = base + 2.0 * i
        os.utime(p, (t, t))


def ensure_event_chunks(
    spark: SparkSession,
    sf_dir: str,
    tag: str,
    build_df: Callable[[], DataFrame],
    n_chunks: int = 6,
    builder_version: str = "1",
) -> str:
    """Write build_df() as n_chunks time-bucketed parquet files, once per
    (tag, source-file generation, builder version); return the chunk
    directory path. Callers bump builder_version whenever the build_df
    logic changes so stale /tmp layouts are never replayed."""
    src = Path(sf_dir) / "events.parquet"
    st = src.stat()
    cache_id = hashlib.md5(
        f"{sf_dir}|{st.st_size}|{st.st_mtime_ns}"
        f"|{n_chunks}|v{builder_version}".encode()
    ).hexdigest()[:12]
    chunks = _CHUNK_ROOT / f"{tag}_chunks" / cache_id
    if not (chunks / "_SUCCESS").exists():
        shutil.rmtree(chunks, ignore_errors=True)  # partial previous write
        (
            build_df()
            .repartitionByRange(n_chunks, "ts")
            .sortWithinPartitions("ts", "event_id")
            .write.parquet(str(chunks))
        )
        _stamp_mtimes_in_range_order(chunks)
    return str(chunks)


def plain_event_feed(spark: SparkSession, sf_dir: str) -> str:
    """The un-augmented events chunk feed shared by the stream-stream join
    and the stateful-totals queries. A NAMED builder on purpose: every
    consumer (and the bench pre-warm) must go through the same build_df,
    because the cache key identifies the layout by tag+version, not by
    builder code - two call sites with drifting lambdas under one tag
    would silently serve each other's chunks."""
    from ..tables import load_table

    return ensure_event_chunks(
        spark,
        sf_dir,
        "events_plain",
        lambda: load_table(spark, sf_dir, "events").select(
            "event_id", "user_id", "ts", "event_type", "value"
        ),
    )


_SWEPT_STALE_RUNS = False


def _sweep_dead_run_dirs() -> None:
    """Delete run_<pid> scratch trees left by processes that no longer
    exist - the fixed paths self-overwrote so disk use was bounded, and
    pid-scoping must not turn that into an unbounded /tmp leak. Runs
    once per process, on first scratch use; a live pid (signal-0 probe)
    is never touched."""
    for d in _CHUNK_ROOT.glob("run_*"):
        try:
            pid = int(d.name[4:])
        except ValueError:
            continue
        if pid == os.getpid():
            continue
        try:
            os.kill(pid, 0)
        except ProcessLookupError:
            shutil.rmtree(d, ignore_errors=True)
        except PermissionError:
            pass  # pid alive under another uid - leave it


def run_scratch(name: str) -> Path:
    """Per-process scratch dir for a streaming query's checkpoint +
    output sink. Pid-scoped so concurrent engine processes (a bench run
    beside a test run) can never clobber each other's in-flight
    checkpoints - observed once as a corrupted outer-join flush when two
    suites shared the same fixed /tmp path. The CHUNK feeds above stay
    process-shared deliberately: they are immutable once their _SUCCESS
    marker exists, so concurrent readers are safe and the build is
    marker-guarded. Stale trees of dead processes are swept on first
    use."""
    global _SWEPT_STALE_RUNS
    if not _SWEPT_STALE_RUNS:
        _SWEPT_STALE_RUNS = True
        _sweep_dead_run_dirs()
    return _CHUNK_ROOT / f"run_{os.getpid()}" / name
