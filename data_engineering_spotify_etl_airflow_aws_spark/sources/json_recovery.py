"""Malformed-record-tolerant JSON ingestion (PERMISSIVE + corrupt-record
column): the JSON twin of the CSV null-semantics source (csv_source.py,
SURVEY §2a S3/D5). Real inbox feeds (the reference's raw landing zone,
P:76-89) contain truncated uploads and type-drifted fields; the warehouse
contract is "never drop the batch, never crash - quarantine the bad rows
with their raw payload".

Spark semantics under test (verified empirically, locked by the oracle):
  * a structurally-broken document (truncated - unclosed object) parses
    to ALL-NULL fields with the raw string captured in the corrupt
    column;
  * a well-formed document with one type-mismatched field (string where
    bigint is declared) parses PARTIALLY - the good fields survive, the
    bad field is NULL, and the raw string is still captured;
  * well-formed rows parse fully, corrupt column NULL.

The fixture plants both corruption kinds deterministically (pure function
of doc_id: %37 -> truncated, %41 -> type drift), so the DuckDB oracle can
state the expected recovery row-for-row without parsing JSON at all.

Scale notes (100 TB): from_json is a stateless JVM projection (Jackson
inside codegen) - no shuffle, no Python, and the corrupt-row quarantine
is a filter on the same pass; schema inference is never used (declared
schema, the S3-source lesson).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load_table

_PARSE_SCHEMA = "doc_id bigint, lang string, n_chars bigint, _corrupt string"


def planted_json_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(src_id, js): one JSON document per documents-row, with truncation
    planted on doc_id%37==0 and a type-drifted n_chars on doc_id%41==0.
    Built by string concat (not to_json) so the oracle can mirror the
    exact bytes trivially; lang codes contain nothing needing escapes."""
    docs = load_table(spark, sf_dir, "documents")
    base = F.concat(
        F.lit('{"doc_id":'),
        F.col("doc_id").cast("string"),
        F.lit(',"lang":"'),
        F.col("lang"),
        F.lit('","n_chars":'),
        F.when(F.col("doc_id") % 41 == 0, F.lit('"oops"')).otherwise(
            F.col("n_chars").cast("string")
        ),
        F.lit("}"),
    )
    return docs.select(F.col("doc_id").alias("src_id"), base.alias("js")).select(
        "src_id",
        F.when(
            F.col("src_id") % 37 == 0,
            F.expr("substring(js, 1, length(js) - 1)"),
        )
        .otherwise(F.col("js"))
        .alias("js"),
    )


@query(
    "corrupt_json_recovery",
    oracle="""
    SELECT doc_id AS src_id,
           CASE WHEN doc_id % 37 = 0 THEN NULL ELSE doc_id END AS p_doc_id,
           CASE WHEN doc_id % 37 = 0 THEN NULL ELSE lang END AS p_lang,
           CASE WHEN doc_id % 37 = 0 OR doc_id % 41 = 0 THEN NULL
                ELSE n_chars END AS p_n_chars,
           CASE WHEN doc_id % 37 = 0 OR doc_id % 41 = 0 THEN 1
                ELSE 0 END AS is_corrupt
    FROM documents
    ORDER BY src_id
    """,
)
def corrupt_json_recovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    feed = planted_json_feed(spark, sf_dir)
    parsed = feed.select(
        "src_id",
        F.from_json(
            "js", _PARSE_SCHEMA, {"columnNameOfCorruptRecord": "_corrupt"}
        ).alias("p"),
    )
    return parsed.select(
        "src_id",
        F.col("p.doc_id").alias("p_doc_id"),
        F.col("p.lang").alias("p_lang"),
        F.col("p.n_chars").alias("p_n_chars"),
        F.col("p._corrupt").isNotNull().cast("int").alias("is_corrupt"),
        # no output sort: driver hash is order-insensitive
    )
