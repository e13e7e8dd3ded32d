"""One-off sf1 fixture generation for the two-decade scaling audit
(round-8 verdict stretch #7).

/root/testdata is driver-generated and read-only, and the driver's
generator is not available in this repo — so sf1 is synthesized from
sf0.1 by TILING: K key-shifted copies whose per-copy distributions are
exactly sf0.1's. Tiled scaling holds the data's *structure* fixed while
growing its *volume*, which is precisely the 1000-executor question the
audit asks ("does throughput scale with data?"), and it makes the
growth factor per table exact and known:

  * TPC-H tables + events: 10 disjoint copies, every key column shifted
    by copy_index * (dense key-space size). Joins stay copy-local by
    construction, so join output grows exactly 10x — linear by design,
    any super-linear measurement is the ENGINE's doing.
  * documents: 10 copies; copy i > 0 applies a per-copy TOKEN BIJECTION
    (each non-empty whitespace token prefixed with one copy-specific
    letter). Jaccard similarity over token shingles is invariant under
    a bijection, so every within-copy exact-dup / near-dup relation of
    sf0.1 is reproduced in every copy; near-dup candidate structure
    grows exactly 10x, never quadratically by fixture artifact.
    n_chars is recomputed. Cross-copy token-set disjointness is NOT
    guaranteed by the prefix scheme alone (a verbatim copy-0 token
    'avec' would collide with copy 1's image of 'vec'), so generation
    VERIFIES it over the actual vocabulary and fails if any cross-copy
    token collision exists — the r9 review turned the narrative claim
    into an enforced invariant.
  * embeddings: 4 copies (the driver's own sub-linear fixture pattern:
    500 @ sf0.01 -> 2000 @ sf0.1, i.e. 4x per decade), vec_id shifted;
    copy i > 0 adds small deterministic Gaussian noise (seeded by copy)
    so copies are not exact duplicate vectors but keep the label/
    cluster geometry. ANN-family exponents therefore measure a 4x data
    step, same distortion the sf0.01->sf0.1 pair already had.
  * region/nation: constant at every sf (driver pattern).

Caveat (documented in SCALING_r09.md): tiling reproduces structure, it
does not grow it — graph diameter, vocabulary size, and cluster count
stay at sf0.1 levels while volume grows. Exponents over this step
measure data-volume scaling at fixed structure, which is the audit's
question; they say nothing about structural growth (e.g. a vocabulary
10x larger), which no synthetic extrapolation from sf0.1 could claim
anyway.

Usage:
    python tools/gen_sf1.py [out_dir]     # default /root/repo/data/sf1
"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
K_MAIN = 10  # copies for TPC-H / events / documents
K_EMB = 4  # copies for embeddings (driver's 4x-per-decade pattern)

# dense key-space sizes at sf0.1 (verified: all keys dense from 0)
N_CUST = 15_000
N_SUPP = 1_000
N_PART = 20_000
N_ORD = 150_000
N_EVT = 100_000
N_DOC = 5_000
N_VEC = 2_000


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
    out = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/data/sf1"
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()

    for t in ("region", "nation"):
        con.execute(
            f"COPY (SELECT * FROM '{SRC}/{t}.parquet') "
            f"TO '{out}/{t}.parquet' (FORMAT PARQUET)"
        )
        print(f"  {t}: copied")

    # c_name/s_name embed the entity key ("Customer#000000042"), so they
    # are REGENERATED from the shifted key rather than copied verbatim:
    # verbatim copies reuse identical names across copies, and any
    # name-similarity operator then matches cross-copy pairs that no
    # real sf1 dataset contains (r12 finding: 94% of
    # fuzzy_name_matches' sf1 output was cross-copy artifact pairs,
    # output 165x for a 10x tiling). With key-derived names the sf1
    # name population is exactly what a dense 0..149999 keyspace
    # produces, and digit-Hamming match growth is the data's own
    # (~linear), not the tiling's.
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

    # documents: per-copy token bijection (prefix letter a..i for copies
    # 1..9; copy 0 verbatim). Empty tokens (consecutive/trailing spaces)
    # are preserved verbatim so tokenization stats match the original.
    def doc_copy(i: int) -> str:
        if i == 0:
            # Explicit column list (r9 ADVICE #2): the copies below are
            # positionally UNION ALL'd against this branch, and lang /
            # source are same-typed VARCHARs — a SELECT * here would let
            # any column-order drift in the fixture silently swap them
            # instead of erroring.
            return (
                "SELECT doc_id, text, lang, source, n_chars "
                f"FROM '{SRC}/documents.parquet'"
            )
        tag = chr(ord("a") + i - 1)
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

    # Enforce the scaling-evidence invariant the docstring relies on:
    # no token may appear in more than one copy's vocabulary, or
    # cross-copy shingle overlap could create spurious near-dup
    # candidates and corrupt the decade-2 exponents.
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

    # embeddings: numpy side (list column + per-copy Gaussian noise)
    tbl = pq.read_table(f"{SRC}/embeddings.parquet")
    vec = np.array(tbl["embedding"].to_pylist(), dtype=np.float32)
    vid = tbl["vec_id"].to_numpy()
    lab = tbl["label"].to_numpy()
    vs, ls, ids = [], [], []
    for i in range(K_EMB):
        rng = np.random.default_rng(42 + i)
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
