"""Deterministic hash-sampled subcorpus of the sf1 documents table —
at-scale VALUE evidence for the four quadratic-oracle exclusions
(r14 verdict ask #3).

The four excluded oracles (ngram_jaccard_near_dup, containment_near_dup,
near_dup_recall_eval, dedup_clusters) are deliberate brute-force
all-pairs / recursive-CTE proofs whose cost is quadratic in the doc
count: infeasible against sf1's 50k docs (measured forecasts,
evidence/sf1_oracle_cost_forecast.json) but feasible against a 5k-doc
sample — the SAME pair count as the green sf0.1 full sweep, only now
over sf1 vocabulary, sf1 shingle statistics, and sf1 token bijections
('a'..'i' copy prefixes). Near-dup pairs land on hash-random doc ids
(fixture check: sf0.01's 25 pairs span (8,245), (26,455), ...), so a
10% doc sample keeps ~1% of pairs ≈ 25 expected positives at sf1 scale
— enough that agreement is non-vacuous.

Sample rule (deterministic, engine-independent — the fixture is
materialized once and BOTH engines read the same parquet):
    docs where the first two hex digits of md5(doc_id) < 0x1A  (~10.2%)

The other nine tables are symlinked from the sf1 fixture (the four
queries only read documents; make_duckdb still needs every view to
resolve).

Usage: python tools/gen_sf1_sample.py [out_dir]   # default data/sf1_sample
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = os.environ.get("SPARK_GRAFT_SF1_DIR", "/root/repo/data/sf1")
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "embeddings"
).split()


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/data/sf1_sample"
    if not os.path.isdir(SRC):
        raise SystemExit(f"sf1 fixture missing at {SRC}; run tools/gen_sf1.py")
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    con.execute(
        f"""
        COPY (
            SELECT * FROM '{SRC}/documents.parquet'
            WHERE CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 2)
                       AS INTEGER) < 26
            ORDER BY doc_id
        ) TO '{out}/documents.parquet' (FORMAT PARQUET)
        """
    )
    n = con.execute(
        f"SELECT count(*) FROM '{out}/documents.parquet'"
    ).fetchone()[0]
    total = con.execute(
        f"SELECT count(*) FROM '{SRC}/documents.parquet'"
    ).fetchone()[0]
    print(f"documents: {n} of {total} sampled ({100.0 * n / total:.2f}%)")
    for t in TABLES:
        link = f"{out}/{t}.parquet"
        target = os.path.abspath(f"{SRC}/{t}.parquet")
        if os.path.islink(link) or os.path.exists(link):
            os.remove(link)
        os.symlink(target, link)
    print(f"sampled fixture at {out} (9 tables symlinked from {SRC})")


if __name__ == "__main__":
    sys.exit(main())
