"""Diagnose the r14 sf1 pricing_summary divergence: Spark and DuckDB
disagree by one ulp on sum_charge for the ('R','O') group at sf1 - the
first query whose decimal sum's unscaled value crossed 2^53 (2.79e16 at
scale 6) in a validated regime.

Stage separation: compare the EXACT decimal sums as strings (no double
conversion), then each engine's decimal->double conversion of its own
sum. Whichever stage disagrees is the defect class:
  * sums differ       -> per-row double->decimal cast divergence
  * conversions differ -> decimal->double conversion convention gap
Usage: python tools/probe_pricing_summary_sf1.py [sf_dir]
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

import duckdb

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/data/sf1"

EXPR = "l_extendedprice * (1 - l_discount) * (1 + l_tax)"


def main() -> None:
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM '{SF}/lineitem.parquet'"
    )
    duck = con.execute(f"""
        SELECT l_returnflag, l_linestatus,
               CAST(sum(CAST({EXPR} AS DECIMAL(30,6))) AS VARCHAR) AS s,
               CAST(sum(CAST({EXPR} AS DECIMAL(30,6))) AS DOUBLE) AS d
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY 1, 2 ORDER BY 1, 2
    """).fetchall()

    from data_engineering_spotify_etl_airflow_aws_spark.session import get_spark
    from data_engineering_spotify_etl_airflow_aws_spark.tables import load_table
    from pyspark.sql import functions as F

    spark = get_spark(app_name="probe", master="local[8]", shuffle_partitions=8)
    li = load_table(spark, SF, "lineitem")
    charge = (
        F.col("l_extendedprice")
        * (1 - F.col("l_discount"))
        * (1 + F.col("l_tax"))
    )
    rows = (
        li.where(
            F.col("l_shipdate")
            <= F.lit("1998-09-02 00:00:00").cast("timestamp_ntz")
        )
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(charge.cast("decimal(30,6)")).cast("string").alias("s"),
            F.sum(charge.cast("decimal(30,6)")).cast("double").alias("d"),
        )
        .orderBy("l_returnflag", "l_linestatus")
        .collect()
    )
    print(f"{'grp':6s} {'stage':12s} spark | duck | verdict")
    for sp, du in zip(rows, duck):
        grp = f"{sp['l_returnflag']},{sp['l_linestatus']}"
        same_sum = sp["s"] == du[2]
        print(f"{grp:6s} exact-sum    {sp['s']} | {du[2]} | "
              f"{'EQUAL' if same_sum else 'DIFFER'}")
        same_d = sp["d"].hex() == float(du[3]).hex()
        correct = float(sp["s"]).hex()
        print(f"{grp:6s} as-double    {sp['d'].hex()} | {float(du[3]).hex()} | "
              f"{'EQUAL' if same_d else 'DIFFER'}; correctly-rounded(spark sum)={correct}")
    spark.stop()


if __name__ == "__main__":
    main()
