"""Source connectors (SURVEY.md §2a S1-S5).

    csv_source - CSV with the warehouse file-format contract (S:14-20):
                 header skip, NULL_IF ('NULL','null'), empty-field-as-null,
                 optional double-quote enclosures with "" escapes
    json_inbox - the raw JSON inbox scan lives in pipeline.transforms
                 (read_raw: declared schema, multiLine, pathGlobFilter)
    rest_api   - S1 (Spotify REST) as a Spark 4 Python DataSource: one
                 input partition per playlist page, page fetches on the
                 executors (reference P:23-72 is a driver-side extract);
                 deterministic synthetic transport in-container, urllib
                 http transport for real deployments
    catalog    - persistent-table registration (Glue Crawler/Athena analog,
                 S4) lives in sinks.save_as_table + spark.sql
"""
