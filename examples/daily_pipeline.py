"""The reference repo's daily run, end to end, as one spark-submit-able
script - what `spotify-airflow-pipeline.py`'s task DAG (P:270-276)
collapses to on Spark:

  extract  -> the raw-JSON inbox (here: the committed fixture inbox; a
              live deployment calls sources.rest_api and lands the
              day's file first)
  ingest   -> exactly-once Structured Streaming file ingest of the
              songs fact (Snowpipe analog, checkpointed, archival)
  transform-> album/artist dims + date-partitioned songs fact written
              as the analytical star schema
  analyze  -> the four published analytics queries (S:93-126 / A:7-40)

Airflow's fan-out/fan-in becomes a single lazy Spark plan per output;
scheduling is whatever calls this script daily (cron, Airflow
BashOperator, Databricks job - orchestration is external to the engine).

Run: `python examples/daily_pipeline.py [output_dir]`, or import and
call main(spark, output_dir) with an existing session (the test does).
Writes only under the given output_dir (default: a fresh /tmp dir).
"""

from __future__ import annotations

import sys
import tempfile
from pathlib import Path


def main(spark, out_dir: str | None = None) -> dict:
    import data_engineering_spotify_etl_airflow_aws_spark as engine
    from data_engineering_spotify_etl_airflow_aws_spark.pipeline.transforms import (
        INBOX_DIR,
        album_transform,
        artist_transform,
        q1_top_trending,
        q2_album_popularity,
        q3_top_artist_presence,
        q4_song_movement,
        songs_transform,
    )
    from data_engineering_spotify_etl_airflow_aws_spark.sinks import (
        write_partitioned,
        write_table_csv,
    )
    from data_engineering_spotify_etl_airflow_aws_spark.streaming.ingest import (
        ingest_songs_available_now,
    )

    engine.load_all_operators()
    out = Path(out_dir or tempfile.mkdtemp(prefix="daily_pipeline_"))
    results: dict = {"output_dir": str(out)}

    # -- ingest: exactly-once streaming load of today's (and any missed)
    # inbox files; re-running the script replays nothing (checkpoint).
    ingest_songs_available_now(
        spark,
        str(INBOX_DIR),
        str(out / "warehouse" / "songs_stream"),
        str(out / "checkpoints" / "songs"),
    )
    results["songs_ingested"] = spark.read.parquet(
        str(out / "warehouse" / "songs_stream")
    ).count()

    # -- transform: the star schema. Fact is date-partitioned parquet
    # (dynamic overwrite = idempotent daily re-runs); dims are small and
    # land as CSV exactly like the reference's interchange format.
    write_partitioned(songs_transform(spark), str(out / "warehouse" / "songs"))
    write_table_csv(album_transform(spark), str(out / "warehouse" / "album"))
    write_table_csv(artist_transform(spark), str(out / "warehouse" / "artist"))

    # -- analyze: the four published analytics queries (sf_dir unused by
    # the Q1-Q4 builders - they read the transformed star directly)
    for name, fn in (
        ("q1_top_trending", q1_top_trending),
        ("q2_album_popularity", q2_album_popularity),
        ("q3_top_artist_presence", q3_top_artist_presence),
        ("q4_song_movement", q4_song_movement),
    ):
        df = fn(spark, "")
        df.write.mode("overwrite").option("header", "true").csv(
            str(out / "analytics" / name)
        )
        results[name] = df.count()
    return results


if __name__ == "__main__":
    # running as `python examples/<script>.py` puts examples/ (not the
    # repo root) on sys.path - add the root so the package resolves
    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    from data_engineering_spotify_etl_airflow_aws_spark.session import get_spark

    dest = sys.argv[1] if len(sys.argv) > 1 else None
    print(main(get_spark(app_name="daily-pipeline"), dest))
