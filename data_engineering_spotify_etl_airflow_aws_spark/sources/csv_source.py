"""CSV source with the warehouse file-format contract (reference S:14-20:
SKIP_HEADER, NULL_IF ('NULL','null'), EMPTY_FIELD_AS_NULL, optional '"'
enclosures) - SURVEY.md S3 + D5.

Spark's csv reader natively covers header, one nullValue token, and
quote/escape; the remaining NULL_IF tokens and empty-field-as-null are
applied as explicit nullif expressions so the full Snowflake semantics are
engine-visible (and mirrored verbatim in the DuckDB oracle).

Scale notes: CSV is the reference's interchange format, not ours - data
lands here once and becomes Parquet immediately (sinks.py). The reader
itself is splittable and streams; the nullif projection is codegen'd.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions import to_date_cascade
from ..registry import query

CSV_DIR = Path(__file__).resolve().parents[2] / "data" / "csv_inbox"

FEED_SCHEMA = T.StructType(
    [
        T.StructField("album_id", T.StringType()),
        T.StructField("album_name", T.StringType()),
        T.StructField("release_date", T.StringType()),
        T.StructField("total_tracks", T.StringType()),  # NULL_IF before cast
        T.StructField("url", T.StringType()),
    ]
)

_NULL_TOKENS = ("null", "")  # 'NULL' handled by the reader option


def _null_if(col: F.Column) -> F.Column:
    out = col
    for tok in _NULL_TOKENS:
        out = F.nullif(out, F.lit(tok))
    return out


def read_warehouse_csv(
    spark: SparkSession, path: str | Path | None = None
) -> DataFrame:
    raw = (
        spark.read.schema(FEED_SCHEMA)
        .option("header", "true")  # SKIP_HEADER = 1
        .option("nullValue", "NULL")  # first NULL_IF token
        .option("quote", '"')  # FIELD_OPTIONALLY_ENCLOSED_BY
        .option("escape", '"')  # CSV doubles quotes, not backslashes
        .csv(str(path or CSV_DIR / "warehouse_feed.csv"))
    )
    return raw.select(
        *[_null_if(F.col(f.name)).alias(f.name) for f in FEED_SCHEMA.fields]
    )


@query(
    "csv_null_semantics",
    oracle=f"""
    -- r14 review: album_id gets the SAME NULL_IF treatment as every
    -- other column (read_warehouse_csv applies _null_if to all fields;
    -- a bare album_id here would keep '' / 'null' where Spark nulls
    -- them - fixture-masked, but the contract is all-columns)
    SELECT nullif(nullif(album_id, 'null'), '') AS album_id,
           nullif(nullif(album_name, 'null'), '') AS album_name,
           CAST(coalesce(
               try_strptime(nullif(nullif(release_date, 'null'), ''), '%Y-%m-%d'),
               try_strptime(nullif(nullif(release_date, 'null'), ''), '%Y-%m'),
               try_strptime(nullif(nullif(release_date, 'null'), ''), '%Y')
           ) AS DATE) AS release_parsed,
           CAST(nullif(nullif(total_tracks, 'null'), '') AS BIGINT)
               AS total_tracks,
           nullif(nullif(url, 'null'), '') AS url
    FROM read_csv('{CSV_DIR}/warehouse_feed.csv', header=true,
                  nullstr='NULL', quote='"', escape='"',
                  columns={{'album_id': 'VARCHAR', 'album_name': 'VARCHAR',
                           'release_date': 'VARCHAR',
                           'total_tracks': 'VARCHAR', 'url': 'VARCHAR'}})
    ORDER BY album_id
    """,
)
def csv_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D5 end to end: NULL_IF tokens, empty-as-null, quoted commas, doubled
    quotes, then the D3 date cascade over the surviving strings."""
    feed = read_warehouse_csv(spark)
    return feed.select(
        "album_id",
        "album_name",
        to_date_cascade("release_date").alias("release_parsed"),
        F.col("total_tracks").cast("bigint").alias("total_tracks"),
        "url",
    ).orderBy("album_id")


# ---------------------------------------------------------------------------
# Positional load: the Snowflake COPY INTO semantic the reference relies
# on (S:61-62 loads CSV into the DDL with NO column list, which is why
# the CSV header `name` lands in DDL column `name_` (S:29) without
# error - SURVEY §1.3). Spark reproduces it exactly: with an explicit
# schema and enforceSchema (default true), the header row is only
# SKIPPED, never matched - columns map by POSITION. The declared schema
# below uses the warehouse DDL's names, deliberately different from the
# file's header, and the oracle loads the same file positionally via
# read_csv's explicit columns.
WAREHOUSE_DDL_SCHEMA = T.StructType(
    [
        T.StructField("album_id", T.StringType()),
        T.StructField("name_", T.StringType()),  # header says album_name
        T.StructField("release_date", T.StringType()),
        T.StructField("total_tracks", T.StringType()),
        T.StructField("url", T.StringType()),
    ]
)


@query(
    "positional_csv_load",
    # EMPTY_FIELD_AS_NULL applied explicitly on BOTH sides: Spark's csv
    # reader nulls empty fields where DuckDB keeps '' - the Snowflake
    # option the reference's format declares (S:18) pins the semantic.
    oracle=f"""
    -- r14 review: Spark's reader nulls EVERY empty field (no emptyValue
    -- set), including the untouched album_id passthrough - mirror that
    -- here, not just on the explicitly nullif'd columns
    SELECT nullif(album_id, '') AS album_id, nullif(name_, '') AS name_,
           nullif(url, '') AS url
    FROM read_csv('{CSV_DIR}/warehouse_feed.csv', header=true,
                  nullstr='NULL', quote='"', escape='"',
                  columns={{'album_id': 'VARCHAR', 'name_': 'VARCHAR',
                           'release_date': 'VARCHAR',
                           'total_tracks': 'VARCHAR', 'url': 'VARCHAR'}})
    ORDER BY album_id
    """,
)
def positional_csv_load(spark: SparkSession, sf_dir: str) -> DataFrame:
    raw = (
        spark.read.schema(WAREHOUSE_DDL_SCHEMA)
        .option("header", "true")  # skip the row; names are NOT matched
        .option("nullValue", "NULL")
        .option("quote", '"')
        .option("escape", '"')
        .csv(str(CSV_DIR / "warehouse_feed.csv"))
    )
    return raw.select(
        "album_id",
        F.nullif(F.col("name_"), F.lit("")).alias("name_"),
        F.nullif(F.col("url"), F.lit("")).alias("url"),
    ).orderBy("album_id")
