"""Property tests for the raw->star pipeline (SURVEY.md §5): rank density,
dedup idempotence/uniqueness, and end-to-end shape."""

from __future__ import annotations

from pyspark.sql import functions as F

import data_engineering_spotify_etl_airflow_aws_spark as engine
from data_engineering_spotify_etl_airflow_aws_spark.pipeline.transforms import (
    album_transform,
    artist_transform,
    read_raw,
    songs_transform,
)

engine.load_all_operators()


def test_rank_dense_per_scrape_date(spark):
    """X1: rank must be exactly 1..50 within every scrape_date."""
    songs = songs_transform(spark)
    per_day = (
        songs.groupBy("scrape_date")
        .agg(
            F.count("*").alias("n"),
            F.min("rank").alias("lo"),
            F.max("rank").alias("hi"),
            F.countDistinct("rank").alias("n_ranks"),
        )
        .collect()
    )
    assert len(per_day) == 3
    for r in per_day:
        assert (r.n, r.lo, r.hi, r.n_ranks) == (50, 1, 50, 50), r


def test_dims_are_unique_and_idempotent(spark):
    album = album_transform(spark)
    artist = artist_transform(spark)
    assert album.count() == album.select("album_id").distinct().count()
    assert artist.count() == artist.select("artist_id").distinct().count()
    # dedup idempotence: re-deduping the dim is a no-op
    re_album = album.dropDuplicates(["album_id"])
    assert re_album.count() == album.count()


def test_mixed_precision_release_dates_parse(spark):
    """D3: every non-null raw release_date must parse; the planted null
    stays null."""
    album = album_transform(spark).collect()
    nulls = [r.album_id for r in album if r.release_date is None]
    assert nulls == ["album_0013"]


def test_raw_read_schema_stable(spark):
    raw = read_raw(spark)
    assert raw.columns == ["tracks", "scrape_date"]
    assert raw.count() == 3  # one row per daily file
