"""Structured Streaming twin of the genuine-decode batch (round-8
verdict stretch #8): the real PPM codec running as a stateless
mapInPandas projection inside the micro-batch engine.

The three decoders (PPM/WAV/Y4M, operators/multimodal.py) are pure
per-record projections — no state, no watermark, no shuffle — so the
streaming form is exactly the batch form with a file-source scan
swapped in: payload chunks arrive as parquet files, each micro-batch
decodes its Arrow batches with decode_ppm(), and the sink lands the
per-document channel means. The registered query runs the REAL
micro-batch engine (availableNow, maxFilesPerTrigger forces >1 batch)
and is oracle-checked against the SAME DuckDB SQL as the batch twin —
proving the modality path end-to-end under streaming, hash-equal to
batch.

Payloads are built once per (source generation, builder version) by the
batch constructor ppm_payload_df() — the same JVM-side expressions the
batch query decodes — so batch and stream decode byte-identical bytes.

Scale notes (continuous 100 TB ingest of images): decode state is
O(micro-batch), never O(stream history) — the stateless-projection
class, the cheapest possible streaming operator. Payload bytes move
scan → Arrow batch → sink on the executors; nothing binary shuffles or
reaches the driver. Throughput scales with files-per-trigger × executor
count; a real deployment points the same plan at a cloud-storage
listing or notification source.
"""

from __future__ import annotations

import hashlib
import shutil
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

from ..operators.multimodal import (
    _PPM_STATS_SCHEMA,
    _ppm_stats_batches,
    ppm_payload_df,
)
from ..registry import ORACLES, query
from .chunks import _CHUNK_ROOT, run_scratch

_PAYLOAD_SCHEMA = "doc_id bigint, payload binary"
_N_CHUNKS = 4


def ppm_payload_feed(spark: SparkSession, sf_dir: str) -> str:
    """Write the PPM payload table as _N_CHUNKS doc_id-range-bucketed
    parquet files, once per (source generation, builder version);
    return the chunk directory. Mirrors chunks.ensure_event_chunks but
    keys on documents.parquet and ranges on doc_id — no mtime stamping
    needed: the decode is stateless (no event time, no watermark), so
    file-arrival order cannot drop rows."""
    src = Path(sf_dir) / "documents.parquet"
    st = src.stat()
    cache_id = hashlib.md5(
        f"{sf_dir}|{st.st_size}|{st.st_mtime_ns}|{_N_CHUNKS}|v1".encode()
    ).hexdigest()[:12]
    chunks = _CHUNK_ROOT / "ppm_payload_chunks" / cache_id
    if not (chunks / "_SUCCESS").exists():
        shutil.rmtree(chunks, ignore_errors=True)  # partial previous write
        (
            ppm_payload_df(spark, sf_dir)
            .repartitionByRange(_N_CHUNKS, "doc_id")
            .sortWithinPartitions("doc_id")
            .write.parquet(str(chunks))
        )
    return str(chunks)


def decode_stream(spark: SparkSession, chunk_dir: str) -> DataFrame:
    """The operator under test: file-source payload stream decoded by
    the real PPM codec, batch-for-batch identical to the batch twin's
    mapInPandas stage. maxFilesPerTrigger sits on the READER (the file
    source); on the writer Spark silently ignores it and availableNow
    collapses to a single batch (r9 review fix, verified via
    recentProgress: writer-side = 1 batch, reader-side = 2)."""
    return (
        spark.readStream.schema(_PAYLOAD_SCHEMA)
        .option("maxFilesPerTrigger", "2")  # 4 chunks -> 2 micro-batches
        .parquet(chunk_dir)
        .mapInPandas(_ppm_stats_batches, schema=_PPM_STATS_SCHEMA)
    )


@query(
    "stream_multimodal_decode",
    # the batch twin's oracle verbatim: streaming must be hash-equal
    oracle=ORACLES["multimodal_ppm_decode_stats"],
)
def stream_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = run_scratch("mm_decode")
    shutil.rmtree(base, ignore_errors=True)

    chunks = ppm_payload_feed(spark, sf_dir)
    q = (
        decode_stream(spark, chunks)
        .writeStream.format("parquet")
        .option("path", str(base / "data"))
        .option("checkpointLocation", str(base / "checkpoint"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    return spark.read.parquet(str(base / "data")).orderBy("doc_id")
