"""The reference's core job re-expressed Spark-first: raw nested playlist
JSON -> 3-table star schema (album, artist, songs) -> the four analytics
queries (reference P:92-163, S:27-56, S:93-126).

    schemas     - explicit StructType for the raw playlist item + star DDL
    fixture_gen - deterministic synthetic raw-JSON inbox (committed to
                  data/raw_inbox/; run `python -m ..fixture_gen` to rebuild)
    transforms  - read_raw + album/artist/songs transforms + Q1-Q4, all
                  registered as oracle-checked queries
"""
