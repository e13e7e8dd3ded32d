"""sf10 fixture generation — the THIRD decade of the scaling audit
(round-13 verdict #3): tile sf10 from the sf1 fixture exactly the way
tools/gen_sf1.py tiles sf1 from sf0.1, so the sf1->sf10 step measures
data-volume scaling at fixed structure with an exact, known growth
factor per table (10x main tables, 4x embeddings — the driver's own
sub-linear embedding pattern per decade).

Everything gen_sf1.py documents applies verbatim, one decade up:
  * TPC-H tables + events: 10 disjoint key-shifted copies of sf1; joins
    stay copy-local, join output grows exactly 10x by construction.
  * documents: copies 1..9 apply a per-copy token bijection with prefix
    letters 'j'..'r' — DISJOINT from the 'a'..'i' prefixes sf1's own
    copies used, so the two tiling levels cannot alias. Jaccard over
    shingles is bijection-invariant, so near-dup structure grows
    exactly 10x, and the cross-copy vocabulary-disjointness invariant
    is VERIFIED over the generated data (generation fails on any
    collision), same as gen_sf1.
  * embeddings: 4 copies of sf1's 8000 vectors with per-copy seeded
    Gaussian noise (seeds disjoint from gen_sf1's 42..45 so no copy
    reuses a noise pattern).
  * region/nation: constant at every sf (driver pattern).
  * c_name/s_name regenerated from the shifted key (the r12
    fuzzy_name_matches lesson: verbatim name copies create cross-copy
    match pairs no real dataset contains).

Usage:
    python tools/gen_sf10.py [out_dir]    # default /root/repo/data/sf10
~1.5-2 GB output (lineitem 60M rows); a few minutes of DuckDB work.
"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

# honor the same env var the sf1 parity suite uses, so an sf1 fixture
# generated elsewhere can feed sf10 generation without editing this file
SRC = os.environ.get("SPARK_GRAFT_SF1_DIR", "/root/repo/data/sf1")
K_MAIN = 10
K_EMB = 4

# dense key-space sizes at sf1 (10x the sf0.1 sizes gen_sf1.py shifts by;
# verified against the generated fixture row counts)
N_CUST = 150_000
N_SUPP = 10_000
N_PART = 200_000
N_ORD = 1_500_000
N_EVT = 1_000_000
N_DOC = 50_000
N_VEC = 8_000


def _copies(con: duckdb.DuckDBPyConnection, out: str, table: str,
            select_for_copy) -> None:
    parts = [select_for_copy(i) for i in range(K_MAIN)]
    sql = " UNION ALL ".join(parts)
    con.execute(
        f"COPY ({sql}) TO '{out}/{table}.parquet' (FORMAT PARQUET)"
    )
    n = con.execute(f"SELECT count(*) FROM '{out}/{table}.parquet'").fetchone()[0]
    print(f"  {table}: {n} rows")


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/data/sf10"
    if not os.path.isdir(SRC):
        raise SystemExit(f"sf1 fixture missing at {SRC}; run tools/gen_sf1.py")
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()

    for t in ("region", "nation"):
        con.execute(
            f"COPY (SELECT * FROM '{SRC}/{t}.parquet') "
            f"TO '{out}/{t}.parquet' (FORMAT PARQUET)"
        )
        print(f"  {t}: copied")

    _copies(con, out, "customer", lambda i: f"""
        SELECT c_custkey + {i * N_CUST} AS c_custkey,
               'Customer#' || lpad(CAST(c_custkey + {i * N_CUST}
                   AS VARCHAR), 9, '0') AS c_name,
               * EXCLUDE (c_custkey, c_name)
        FROM '{SRC}/customer.parquet'""")

    _copies(con, out, "supplier", lambda i: f"""
        SELECT s_suppkey + {i * N_SUPP} AS s_suppkey,
               'Supplier#' || lpad(CAST(s_suppkey + {i * N_SUPP}
                   AS VARCHAR), 9, '0') AS s_name,
               * EXCLUDE (s_suppkey, s_name)
        FROM '{SRC}/supplier.parquet'""")

    _copies(con, out, "part", lambda i: f"""
        SELECT p_partkey + {i * N_PART} AS p_partkey,
               * EXCLUDE (p_partkey)
        FROM '{SRC}/part.parquet'""")

    _copies(con, out, "orders", lambda i: f"""
        SELECT o_orderkey + {i * N_ORD} AS o_orderkey,
               o_custkey + {i * N_CUST} AS o_custkey,
               * EXCLUDE (o_orderkey, o_custkey)
        FROM '{SRC}/orders.parquet'""")

    _copies(con, out, "lineitem", lambda i: f"""
        SELECT l_orderkey + {i * N_ORD} AS l_orderkey,
               l_partkey + {i * N_PART} AS l_partkey,
               l_suppkey + {i * N_SUPP} AS l_suppkey,
               * EXCLUDE (l_orderkey, l_partkey, l_suppkey)
        FROM '{SRC}/lineitem.parquet'""")

    _copies(con, out, "events", lambda i: f"""
        SELECT event_id + {i * N_EVT} AS event_id,
               user_id + {i * N_CUST} AS user_id,
               * EXCLUDE (event_id, user_id)
        FROM '{SRC}/events.parquet'""")

    # documents: prefix letters 'j'..'r' (copies 1..9), disjoint from
    # the 'a'..'i' level-one prefixes baked into SRC's copies.
    def doc_copy(i: int) -> str:
        if i == 0:
            return (
                "SELECT doc_id, text, lang, source, n_chars "
                f"FROM '{SRC}/documents.parquet'"
            )
        tag = chr(ord("j") + i - 1)
        text = (
            "array_to_string(list_transform(string_split(text, ' '), "
            f"t -> CASE WHEN t = '' THEN t ELSE '{tag}' || t END), ' ')"
        )
        return f"""
        SELECT doc_id + {i * N_DOC} AS doc_id,
               {text} AS text,
               lang, source,
               length({text}) AS n_chars
        FROM '{SRC}/documents.parquet'"""

    _copies(con, out, "documents", doc_copy)

    collisions = con.execute(f"""
        WITH toks AS (
            SELECT doc_id // {N_DOC} AS copy_idx,
                   unnest(string_split(text, ' ')) AS tok
            FROM '{out}/documents.parquet'
        )
        SELECT tok, count(DISTINCT copy_idx) AS n_copies
        FROM toks WHERE tok <> ''
        GROUP BY tok HAVING count(DISTINCT copy_idx) > 1
        LIMIT 5
    """).fetchall()
    if collisions:
        raise SystemExit(
            f"cross-copy token collisions break the linear-growth "
            f"invariant: {collisions}"
        )
    print("  documents: cross-copy token disjointness verified")

    tbl = pq.read_table(f"{SRC}/embeddings.parquet")
    vec = np.array(tbl["embedding"].to_pylist(), dtype=np.float32)
    vid = tbl["vec_id"].to_numpy()
    lab = tbl["label"].to_numpy()
    vs, ls, ids = [], [], []
    for i in range(K_EMB):
        rng = np.random.default_rng(142 + i)  # disjoint from gen_sf1's 42..45
        noise = (
            0.0 if i == 0
            else rng.normal(0.0, 0.05, size=vec.shape).astype(np.float32)
        )
        vs.append(vec + noise)
        ls.append(lab)
        ids.append(vid + i * N_VEC)
    emb = pa.table(
        {
            "vec_id": pa.array(np.concatenate(ids), type=pa.int64()),
            "embedding": pa.array(
                [v.tolist() for v in np.vstack(vs)],
                type=pa.list_(pa.float32()),
            ),
            "label": pa.array(np.concatenate(ls), type=pa.int32()),
        }
    )
    pq.write_table(emb, f"{out}/embeddings.parquet")
    print(f"  embeddings: {emb.num_rows} rows")
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
