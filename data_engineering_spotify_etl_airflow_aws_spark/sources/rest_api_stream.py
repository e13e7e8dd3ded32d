"""S1/K4 streaming twin: the REST playlist source as a Spark 4 Python
STREAMING DataSource (SimpleDataSourceStreamReader).

The batch source (rest_api.py) plans one input partition per page; this
variant turns the same paged API into a continuous micro-batch stream -
the "poll the API forever" deployment the reference approximates with a
daily Airflow schedule (Airflow-docker/dags/spotify-airflow-pipeline.py:
75-96, @daily DAG). The stream's offset is the page cursor, checkpointed
by Structured Streaming, so a restarted query resumes exactly where it
stopped instead of re-fetching from page zero - the exactly-once story
the reference gets from Snowpipe file-load tracking (S:58-74), here for
an API cursor.

Offset protocol: {"page": n} = "pages [0, n) are committed". read(start)
serves ONE page per micro-batch and advances the cursor;
readBetweenOffsets replays any committed range for recovery, which makes
the source deterministic under restart by construction. The synthetic
transport serves the same frozen corpus as the batch source, so the
DuckDB oracle proves stream == batch == file-inbox ingest (S1 = S2 =
this) down to the value hash.

Scale notes (100 TB): a page cursor is a SINGLE partition stream by
nature (the simple-reader API runs read() on the driver and ships rows
to executors); rate is bounded by page size x trigger rate, which is the
correct shape for an API poller - fan-out belongs to the BATCH source
(one partition per page) for backfills. State is the 8-byte cursor.
"""

from __future__ import annotations

import shutil
from pathlib import Path
from typing import Iterator

from pyspark.sql import types as T
from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader

from ..streaming.chunks import run_scratch
from .rest_api import _ITEM, ROW_SCHEMA, _to_tuple, synthetic_pages


class PlaylistRestStreamReader(SimpleDataSourceStreamReader):
    """One synthetic page per micro-batch; cursor offsets; deterministic
    replay via readBetweenOffsets."""

    def __init__(self, page_size: int):
        self.page_size = page_size

    def initialOffset(self) -> dict:
        return {"page": 0}

    def _page_rows(self, index: int) -> list[tuple]:
        date, items = synthetic_pages()[index]
        return [
            (date, pos + 1, _to_tuple(item, _ITEM))
            for pos, item in enumerate(items[: self.page_size])
        ]

    def read(self, start: dict) -> tuple[Iterator[tuple], dict]:
        i = start["page"]
        if i >= len(synthetic_pages()):
            return iter(()), start  # caught up: no progress, same offset
        return iter(self._page_rows(i)), {"page": i + 1}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        rows: list[tuple] = []
        for i in range(start["page"], min(end["page"], len(synthetic_pages()))):
            rows.extend(self._page_rows(i))
        return iter(rows)


class PlaylistRestStreamDataSource(DataSource):
    """spark.readStream.format("playlist_rest_stream")."""

    @classmethod
    def name(cls) -> str:
        return "playlist_rest_stream"

    def schema(self) -> T.StructType:
        return ROW_SCHEMA

    def simpleStreamReader(self, schema: T.StructType) -> PlaylistRestStreamReader:
        return PlaylistRestStreamReader(
            int(self.options.get("page_size", "50"))
        )


def register_rest_stream_source(spark) -> None:
    spark.dataSource.register(PlaylistRestStreamDataSource)


def run_rest_stream_to_parquet(
    spark, base: Path, fresh: bool = True
) -> None:
    """Drain the paged stream into a parquet sink + checkpoint under
    `base`. processAllAvailable() is the finite-drain trigger for Python
    streaming sources (Trigger.AvailableNow falls back to a single batch
    for them - verified, the fallback WARN is logged by MicroBatchExecution),
    then the query stops; a restart with the same checkpoint resumes from
    the committed page cursor (tested in tests/test_streaming.py)."""
    register_rest_stream_source(spark)
    if fresh:
        shutil.rmtree(base, ignore_errors=True)
    q = (
        spark.readStream.format("playlist_rest_stream")
        .load()
        .writeStream.format("parquet")
        .option("path", str(base / "data"))
        .option("checkpointLocation", str(base / "checkpoint"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()  # blocks until terminated (spark.sql.streaming.stopTimeout)


# ---------------------------------------------------------------------------
# Registered query: the songs projection through the STREAMING source.
# Hash-equal to rest_api_songs (S1) and star_songs_fact (S2), proving the
# three ingest paths interchangeable.


def _register_query() -> None:
    from pyspark.sql import DataFrame, SparkSession
    from pyspark.sql import functions as F

    from ..pipeline.transforms import _ORACLE_BASE, songs_projection
    from ..registry import query

    @query(
        "stream_rest_api_songs",
        oracle=_ORACLE_BASE + "SELECT * FROM songs ORDER BY scrape_date, rank",
    )
    def stream_rest_api_songs(spark: SparkSession, sf_dir: str) -> DataFrame:
        """sf_dir unused: the synthetic API is its own fixture (same as
        rest_api_songs)."""
        base = run_scratch("rest_api_pages")
        run_rest_stream_to_parquet(spark, base)
        back = (
            spark.read.parquet(str(base / "data"))
            .select(
                F.to_date("scrape_date").alias("scrape_date"), "rank", "item"
            )
        )
        return songs_projection(back).orderBy("scrape_date", "rank")


_register_query()
