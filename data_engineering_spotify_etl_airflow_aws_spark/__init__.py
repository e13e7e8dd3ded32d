"""PySpark-native analytics engine with the query/data-processing surface of
the reference Spotify ETL repo (Shravan-0024/data-engineering-spotify-etl-Airflow-AWS),
re-expressed Spark-first, plus LLM-data-pipeline extension operators
(dedup, similarity search, multimodal columns, text analysis).

Layout:
    session    - tuned SparkSession factory
    tables     - testdata parquet loaders (nanos-timestamp safe)
    registry   - query/oracle registry consumed by __spark_entry__
    operators/ - relational surface + extension operators
    sources/   - REST API Python DataSource, CSV-with-warehouse-options
    pipeline/  - the Spotify star-schema ETL (schemas, transforms, Q1-Q4
                 in DataFrame and spark.sql forms)
    streaming/ - Structured Streaming ingest (Snowpipe analog), windowed
                 aggregation twins, applyInPandasWithState custom state
    functions/ - shared column-expression helpers
    plans/     - plan inspection/explain helpers
"""

__version__ = "0.1.0"


def load_all_operators() -> None:
    """Import every operator module so its @query registrations land in
    the central registry. Idempotent."""
    from .operators import (  # noqa: F401
        relational,
        windows,
        dedup,
        similarity,
        text,
        multimodal,
    )
    from .pipeline import transforms, sql_api  # noqa: F401
    from .sources import csv_source, rest_api  # noqa: F401
    from .streaming import aggregations, ingest  # noqa: F401
