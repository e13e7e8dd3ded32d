"""Source connectors (SURVEY.md §2a S1-S5).

    csv_source - CSV with the warehouse file-format contract (S:14-20):
                 header skip, NULL_IF ('NULL','null'), empty-field-as-null,
                 optional double-quote enclosures with "" escapes
    json_inbox - the raw JSON inbox scan lives in pipeline.transforms
                 (read_raw: declared schema, multiLine, pathGlobFilter)
    rest_api   - S1 (Spotify REST) is a driver-side extract in the
                 reference (P:23-72); its engine-side analog is
                 spark.createDataFrame over fetched pages and is exercised
                 by tests via synthetic payloads rather than a live API
    catalog    - persistent-table registration (Glue Crawler/Athena analog,
                 S4) lives in sinks.save_as_table + spark.sql
"""
