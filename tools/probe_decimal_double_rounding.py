"""Measure, across the 100 TB design range, whether each engine's NATIVE
wide->double narrowing agrees with its correctly-rounded STRING path —
the evidence base for the r15 tree-wide string-hop convention
(r14 verdict ask #1; SCALING_r14.md residual note).

Three claims, each checked on adversarial magnitudes straddling 2^53
through 10^30 (the unscaled-value range corpus-scale decimal moments
occupy between sf0.001 and the 100 TB design point), with odd low bits
and near-half-ulp tails that force rounding decisions:

  1. DuckDB native CAST(DECIMAL/HUGEINT AS DOUBLE) vs VARCHAR hop —
     expected to DIVERGE above 2^53 (the r6 int128 truncation family,
     measured for DECIMAL by r14's pricing_summary find). Divergence
     count > 0 justifies rewriting every oracle wide->double cast to
     the hop.
  2. Spark native decimal->double cast vs .cast("string").cast("double")
     hop — OpenJDK BigDecimal.doubleValue() is single-rounded on every
     path (exact-operand fast paths, Double.parseDouble fallback), so
     expected to AGREE everywhere. Agreement means the Spark-side
     rewrite is value-preserving on this JVM; the hop is still applied
     tree-wide because no JVM SPEC promises it.
  3. double->VARCHAR->double round-trips the identity in BOTH engines
     (shortest-roundtrip formatting), so hopping an already-double
     expression is harmless — the mechanical rewrite does not need to
     type-check ambiguous oracle sums.

Usage: python tools/probe_decimal_double_rounding.py
Writes evidence/decimal_double_rounding_probe.json.
"""

from __future__ import annotations

import json
import os
import random
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def gen_unscaled(rng: random.Random, n: int) -> list[int]:
    """Adversarial unscaled integers: around 2^53, wide magnitudes up to
    ~10^30, odd tails, and near-tie patterns (0111…1 / 1000…1 low bits)."""
    vals: list[int] = []
    # dense band around the 2^53 boundary
    for d in range(-3, 4):
        for off in (-3, -1, 0, 1, 3):
            vals.append((1 << (53 + d)) + off)
    while len(vals) < n:
        bits = rng.randint(40, 100)
        base = rng.getrandbits(bits) | (1 << (bits - 1))
        # force a rounding decision: set a far-below-ulp tail
        tail = rng.choice([0, 1, (1 << max(bits - 54, 1)) - 1,
                           (1 << max(bits - 54, 1)) + 1])
        vals.append(base ^ tail | 1)
    return vals[:n]


def main() -> int:
    rng = random.Random(0xD15C)
    unscaled = gen_unscaled(rng, 4000)
    scales = [0, 2, 6, 9]

    def dec_text(u: int, s: int) -> str:
        if s == 0:
            return str(u)
        t = str(u).rjust(s + 1, "0")
        return f"{t[:-s]}.{t[-s:]}"

    con = duckdb.connect()
    duck_div = 0
    duck_cases = []
    for s in scales:
        for u in unscaled:
            if len(str(u)) > 38:
                continue
            lit = f"CAST('{dec_text(u, s)}' AS DECIMAL(38,{s}))"
            native, hop = con.execute(
                f"SELECT CAST({lit} AS DOUBLE),"
                f" CAST(CAST({lit} AS VARCHAR) AS DOUBLE)"
            ).fetchone()
            if native != hop:
                duck_div += 1
                if len(duck_cases) < 5:
                    duck_cases.append({"unscaled": u, "scale": s,
                                       "native": native, "hop": hop})
    # HUGEINT path (scale-0 exact integers)
    duck_hug_div = 0
    for u in unscaled:
        if u >= 1 << 127:
            continue
        native, hop = con.execute(
            f"SELECT CAST(CAST('{u}' AS HUGEINT) AS DOUBLE),"
            f" CAST(CAST(CAST('{u}' AS HUGEINT) AS VARCHAR) AS DOUBLE)"
        ).fetchone()
        if native != hop:
            duck_hug_div += 1

    # claim 3, DuckDB: double->varchar->double identity
    doubles = [float(u) / 10**s for s in scales for u in unscaled[:500]]
    duck_rt_div = 0
    for d in doubles:
        (rt,) = con.execute(
            "SELECT CAST(CAST(CAST(? AS DOUBLE) AS VARCHAR) AS DOUBLE)", [d]
        ).fetchone()
        if rt != d:
            duck_rt_div += 1
    con.close()

    # Spark side: native decimal->double vs the string hop, same inputs.
    # (Claim 3 is DuckDB-only: the mechanical ORACLE rewrite may hop
    # already-double sums; the Spark rewrite touches only decimal-sourced
    # sites, where decimal->string is exact by construction.)
    from data_engineering_spotify_etl_airflow_aws_spark.session import get_spark
    from pyspark.sql import functions as F

    spark = get_spark()
    spark_div = 0
    spark_cases = []
    for s in scales:
        # exact decimal literal text — parsed losslessly by the cast,
        # no arithmetic that could pre-round the unscaled value
        df = spark.createDataFrame(
            [(dec_text(u, s),) for u in unscaled], "t string"
        ).select(F.col("t").cast(f"decimal(38,{s})").alias("d"))
        bad = (
            df.select(
                F.col("d").cast("double").alias("native"),
                F.col("d").cast("string").cast("double").alias("hop"),
                "d",
            )
            .where(F.col("native") != F.col("hop"))
            .limit(5)
            .collect()
        )
        # count all, sample a few
        n_bad = (
            df.select(
                F.col("d").cast("double").alias("native"),
                F.col("d").cast("string").cast("double").alias("hop"),
            )
            .where(F.col("native") != F.col("hop"))
            .count()
        )
        spark_div += n_bad
        spark_cases += [
            {"scale": s, "d": str(r["d"]), "native": r["native"],
             "hop": r["hop"]}
            for r in bad
        ]

    out = {
        "n_unscaled": len(unscaled),
        "scales": scales,
        "duckdb_decimal_native_vs_hop_divergences": duck_div,
        "duckdb_decimal_divergence_examples": duck_cases,
        "duckdb_hugeint_native_vs_hop_divergences": duck_hug_div,
        "duckdb_double_varchar_roundtrip_divergences": duck_rt_div,
        "spark_decimal_native_vs_hop_divergences": spark_div,
        "spark_divergence_examples": spark_cases,
        "verdicts": {
            "oracle_rewrite_justified": duck_div + duck_hug_div > 0,
            "oracle_hop_on_double_harmless": duck_rt_div == 0,
            "spark_rewrite_value_preserving_on_this_jvm": spark_div == 0,
        },
    }
    os.makedirs("evidence", exist_ok=True)
    path = "evidence/decimal_double_rounding_probe.json"
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    print(json.dumps({k: v for k, v in out.items() if "examples" not in k},
                     indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
