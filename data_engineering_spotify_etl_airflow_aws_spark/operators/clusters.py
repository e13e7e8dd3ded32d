"""Near-duplicate cluster resolution: connected components over the
near-dup pair graph, producing one canonical doc per cluster.

The reference dedups by single-column key only (drop_duplicates,
P:108/P:130). A pretraining-corpus pipeline needs the transitive closure:
near-dup PAIRS (dedup.py) say a~b and b~c, so {a,b,c} must collapse to one
survivor even when a and c never matched directly. That closure is exactly
connected components on the pair graph.

Spark plan (iterative min-label propagation + pointer jumping):
  labels start as each node's own id; each round every node takes the min
  of its neighbors' labels (one hop), then replaces its label by its
  label's label (pointer jump). Labels are monotone non-increasing and
  lower-bounded by the component minimum, and pointer jumping halves the
  remaining path length, so the loop converges in O(log(diameter)) rounds
  to cluster_id = min(doc_id in component) - fully deterministic, no
  tie-breaking needed.

Driver involvement: ONE 8-byte scalar per round (a decimal checksum of the
label column) to detect the fixpoint - the standard shape for iterative
graph algorithms (GraphX/GraphFrames do the same); no row data ever
reaches the driver. The oracle is a DuckDB recursive CTE over the same
edges, so the iterative plan is value-checked end to end, not rows-only.

Lineage MUST be truncated every round (localCheckpoint), not merely
persisted: the pointer-jump self-join references the hop relation twice,
so round r's ANALYZED plan holds 2^r copies of the full upstream tree
(including the expensive edge-producing join). Caching short-circuits
execution but Catalyst still walks the whole logical plan - measured
2.8s/9.8s/~40s for rounds 0/1/2 at sf0.1 before truncation, <1s/round
after. localCheckpoint (executor-local, no HDFS dir) is the right tool
on a long-lived session; a fault-tolerant production run would point
spark.sparkContext.setCheckpointDir at durable storage and use
checkpoint() with the same plan shape.

Scale notes (100 TB):
  * each round is equi-join + partial-agg shuffles on node id - a uniform
    high-entropy key; no broadcast of anything O(nodes).
  * rounds are O(log diameter); near-dup components are shallow (planted
    fixture clusters converge in 2 rounds, the cap of 15 covers diameters
    beyond 2^15 after jumping).
  * label state is one (node, lbl) row per doc, checkpointed per round;
    superseded rounds' blocks are freed when their DataFrames are GC'd.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..registry import query
from ..tables import load_table
from .dedup import _DUCK_SHINGLE_BASE, JACCARD_TAU, ngram_jaccard_near_dup


def connected_components(
    nodes: DataFrame | None,
    edges: DataFrame,
    id_col: str,
    src: str,
    dst: str,
    max_rounds: int = 15,
) -> DataFrame:
    """Distributed connected components. `edges` is undirected with one
    row per pair in either orientation. `nodes` supplies one row per
    vertex (isolated vertices become their own singleton component);
    pass None to derive the vertex set from the edges - CRUCIALLY, the
    derived set reads the CHECKPOINTED undirected-edge relation, so an
    expensive upstream edge plan (e.g. the Jaccard pair join) is
    materialized exactly once, not once per downstream consumer.

    Returns (node, lbl) where lbl = min(vertex id in the component). The
    result is an eagerly-materialized localCheckpoint relation (its blocks
    are freed when the DataFrame is garbage-collected).
    """
    # Truncate lineage at the edge relation: every round's plan re-walks
    # whatever sits above `und` during analysis, so an expensive upstream
    # join (the Jaccard pair plan) must be cut out of the loop entirely.
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    und = (
        e.unionByName(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        .localCheckpoint()
    )
    # Size the ROUND shuffles by the iteration frame (edge endpoints), not
    # the session default: und is materialized, so its count is free, and
    # every relation inside the loop is O(edges) - at near-dup densities a
    # tiny fraction of the corpus. One shuffle partition per ~50k edges
    # (floor 8) keeps per-round task overhead proportional to the frame;
    # a 100 TB edge set stays at the session width. The upstream edge
    # plan (the expensive part) already ran at full width inside the
    # localCheckpoint above.
    spark = edges.sparkSession
    n_edges = und.count()
    prev_sp = spark.conf.get("spark.sql.shuffle.partitions")
    # One shuffle partition per ~50k edges with a floor of 8, capped at
    # the session value (never WIDEN - min(prev, ...) holds even when the
    # session is already narrower than 8). The floor was re-measured in
    # round 5: a single partition serializes the per-round micro-jobs and
    # is ~1.6x SLOWER than 8 even on a 256-edge fixture (the cost is job
    # launch, not task count), while a 100 TB edge set still gets session
    # width. The override is session-global (restored in the finally
    # below) - the fixpoint loop assumes it owns the session while
    # iterating, same as any multi-action driver algorithm; concurrent
    # queries on the same session would need a per-query session clone,
    # which cross-session DataFrames forbid.
    narrowed = min(int(prev_sp), max(8, n_edges // 50_000 + 1))
    spark.conf.set("spark.sql.shuffle.partitions", str(narrowed))
    try:
        if nodes is None:
            vertices = und.select(F.col("src").alias("node")).distinct()
        else:
            vertices = nodes.select(F.col(id_col).alias("node"))
        labels = vertices.select(
            "node", F.col("node").alias("lbl")
        ).localCheckpoint()
        # label(v) <= v holds throughout (init =, least() only lowers), so
        # the decimal checksum strictly decreases iff any label moved.
        checksum = lambda df: df.agg(  # noqa: E731
            F.sum(F.col("lbl").cast("decimal(38,0)")).alias("s")
        ).first()[0]
        prev = checksum(labels)
        for _ in range(max_rounds):
            # hop: take the min label over incoming neighbors
            msgs = (
                und.join(labels, und.src == labels.node)
                .groupBy("dst")
                .agg(F.min("lbl").alias("nbr"))
            )
            hop = labels.join(msgs, labels.node == msgs.dst, "left").select(
                "node", F.least("lbl", F.coalesce("nbr", "lbl")).alias("lbl")
            )
            # jump: label's label (always defined: every label is a vertex
            # id). localCheckpoint both truncates the 2x-per-round plan
            # growth of this self-join AND materializes nxt for the
            # checksum read.
            nxt = (
                hop.alias("x")
                .join(hop.alias("y"), F.col("x.lbl") == F.col("y.node"))
                .select(
                    F.col("x.node").alias("node"),
                    F.least("x.lbl", "y.lbl").alias("lbl"),
                )
                .localCheckpoint()
            )
            cur = checksum(nxt)
            labels = nxt
            if cur == prev:
                break
            prev = cur
        else:
            raise RuntimeError(
                f"connected_components: no fixpoint in {max_rounds} rounds"
            )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_sp)
    return labels


# ---------------------------------------------------------------------------
# Cluster resolution over the EXACT n-gram Jaccard pairs (dedup.py): every
# document labeled with its cluster's canonical doc (min doc_id) and the
# cluster size; singletons keep their own id. The recursive-CTE oracle
# proves the iterative Spark plan computes the true transitive closure.
@query(
    "dedup_clusters",
    oracle=f"""
    WITH RECURSIVE sh AS ({_DUCK_SHINGLE_BASE}),
    pairs AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        WHERE a.n_sh > 0 AND b.n_sh > 0
          AND CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
                  / (a.n_sh + b.n_sh - len(list_intersect(a.sh, b.sh)))
              >= {JACCARD_TAU}
    ),
    edges AS (
        SELECT doc_a AS src, doc_b AS dst FROM pairs
        UNION ALL
        SELECT doc_b, doc_a FROM pairs
    ),
    reach(node, lbl) AS (
        SELECT doc_id, doc_id FROM documents
        UNION
        SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.node
    ),
    lab AS (
        SELECT node AS doc_id, min(lbl) AS cluster_id FROM reach GROUP BY node
    )
    SELECT doc_id, cluster_id,
           count(*) OVER (PARTITION BY cluster_id) AS cluster_size
    FROM lab
    ORDER BY doc_id
    """,
)
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    pairs = ngram_jaccard_near_dup(spark, sf_dir).select("doc_a", "doc_b")
    # Iterate ONLY over edge endpoints (nodes=None: docs that matched some
    # pair, derived from the checkpointed edge relation) - singletons never
    # change label, so they join back in one pass after the fixpoint.
    # Near-dup endpoints are a tiny fraction of the corpus, which shrinks
    # every iteration frame by orders of magnitude.
    labels = connected_components(
        None, pairs, id_col="doc_id", src="doc_a", dst="doc_b"
    )
    return (
        docs.join(labels, docs.doc_id == labels.node, "left")
        .select(
            "doc_id", F.coalesce("lbl", "doc_id").alias("cluster_id")
        )
        .withColumn(
            "cluster_size", F.count("*").over(W.partitionBy("cluster_id"))
        )
        # no output sort: one row per doc (full-table scale), driver hash
        # is order-insensitive; the cluster_id window partitioning is the
        # plan's last required exchange
    )
