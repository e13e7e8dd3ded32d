"""Shared time-bucketed chunk-file builder for the streaming queries.

The registered streaming queries (dedup, stream-stream join) exercise a
file-source stream over the events fixture. The chunk layout is a pure
function of the source data, so it is written ONCE per source generation
and reused across invocations - the per-run rebuild was bench noise
(round-3 verdict). The cache key covers the source file's identity
(size + mtime), not just its path: the round driver regenerates
/root/testdata between rounds, and a path-only key would replay stale
chunks from a previous generation.

repartitionByRange(ts) is the distributed way to write time-bucketed
files: no global sort, no driver collection, and rows with equal ts land
in the same chunk by construction. Chunk files come out named in range
order (part-00000 is the earliest bucket), so the file source's
path-ordered listing feeds the stream roughly chronologically - the shape
a real file-arrival feed has.
"""

from __future__ import annotations

import hashlib
import shutil
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_CHUNK_ROOT = Path("/tmp/spark_graft_stream")


def ensure_event_chunks(
    spark: SparkSession,
    sf_dir: str,
    tag: str,
    build_df: Callable[[], DataFrame],
    n_chunks: int = 6,
) -> str:
    """Write build_df() as n_chunks time-bucketed parquet files, once per
    (tag, source-file generation); return the chunk directory path."""
    src = Path(sf_dir) / "events.parquet"
    st = src.stat()
    cache_id = hashlib.md5(
        f"{sf_dir}|{st.st_size}|{st.st_mtime_ns}".encode()
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
    return str(chunks)
