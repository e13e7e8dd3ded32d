"""Deduplication operators on the documents fixture (SURVEY.md §2b).

Generalizes the reference's key-dedup (drop_duplicates, P:108/P:130) to the
content-level dedup a pretraining-corpus pipeline needs:

  * exact dedup           - content-hash groupBy (md5), deterministic survivor
  * n-gram Jaccard        - EXACT near-dup pairs, prefix-filtered inverted
                            shingle index (NOT all-pairs; see scale notes)
  * MinHash + LSH banding - approximate near-dup pairs, fully deterministic
                            (md5-derived hashes), then exact-Jaccard verified
  * SimHash               - 32-bit weighted-token fingerprint

Determinism: every hash is derived from md5 hex (identical across engines);
affine MinHash constants are fixed literals, so even the LSH query is
bit-reproducible and oracle-checkable in DuckDB.

Oracle strategy: the Jaccard oracle is brute-force all-pairs - hash equality
against the prefix-filtered Spark plan PROVES the candidate pruning is
lossless. The MinHash oracle mirrors the banding pipeline step for step.

Scale notes (100 TB):
  * exact dedup: one shuffle on a uniform high-entropy key (md5). Safe.
  * Jaccard: candidate generation joins doc PREFIXES (|d| - ceil(tau*|d|) + 1
    lexicographically-least shingles - any pair with J >= tau must collide
    there, pigeonhole over the required overlap) against the full inverted
    index, so the quadratic blowup of frequent shingles is bounded by prefix
    size, not document size. At production scale, order prefixes by global
    shingle frequency (one extra agg + broadcast of the rare-shingle rank
    map) to shrink candidates further; lexicographic order keeps this query
    self-contained.
  * MinHash/LSH: signatures are a narrow per-doc map; candidates come from
    equi-joins on 4 band keys - the classic sub-quadratic path; band joins
    shuffle only (band_idx, band_key, doc_id).
  * SimHash: pure per-row projection; near-dup lookup would bucket on
    rotated fingerprint bytes (not needed for the fixture).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W
from pyspark.storagelevel import StorageLevel

from ..caches import register_cache
from ..functions import ORACLE_TOKENS
from ..registry import query
from ..tables import load_table, widen_small_scan

JACCARD_TAU = 0.5  # planted near-dups sit at ~0.98; background noise < 0.03

# Fixed affine MinHash constants (seed 7): h_i(x) = (a_i*x + b_i) mod p.
# a < 2^30 and x < 2^32 keep a*x < 2^62, inside int64 for both engines.
_MH_P = 2147483647
_MH_AB = [
    (347712783, 323946139), (423938500, 103694312), (77777869, 202142728),
    (392655487, 124551738), (976787302, 461060838), (40260663, 184570285),
    (465623511, 898017869), (75006692, 516819858), (97402359, 911648019),
    (63469422, 265862673), (1017316376, 479402028), (677129423, 132847736),
    (619659572, 851864842), (53246120, 474769608), (50017773, 285990742),
    (310965606, 900094241),
]
_N_BANDS, _BAND_ROWS = 4, 4  # 16 = 4 bands x 4 rows

_OT = ORACLE_TOKENS.format(col="text")

# --- shared shingle / hash expressions, Spark (SQL-expr) and DuckDB forms.
# Shingles are distinct token 3-grams; element_at / l[i] are both 1-based.
# zip_with over shifted slices, NOT transform(sequence, i -> element_at):
# positional element_at inside a lambda costs ~40us/element (per-element
# array re-wrapping), ~11x slower than the zip_with formulation at sf0.1.
_SPARK_SHINGLES = """
    array_distinct(CASE WHEN size({t}) >= 3 THEN
        zip_with(zip_with(slice({t}, 1, size({t}) - 2),
                          slice({t}, 2, size({t}) - 2),
                          (x, y) -> concat(x, ' ', y)),
                 slice({t}, 3, size({t}) - 2),
                 (xy, z) -> concat(xy, ' ', z))
    ELSE array() END)
"""
_DUCK_SHINGLES = """
    list_distinct(CASE WHEN len({t}) >= 3 THEN
        list_transform(generate_series(1, len({t}) - 2),
                       i -> concat_ws(' ', {t}[i], {t}[i+1], {t}[i+2]))
    ELSE [] END)
"""
# 32-bit hash of a string from its md5 hex prefix - identical cross-engine
_SPARK_H32 = "cast(conv(substring(md5(cast({s} as binary)), 1, 8), 16, 10) as bigint)"
_DUCK_H32 = "CAST(('0x' || substring(md5({s}), 1, 8)) AS BIGINT)"


def _spark_shingle_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, sh: array<string> distinct shingles, n_sh) - shingle base.

    The token array is projected as its OWN column before the shingle
    expression references it. Inlining the split() into the shingle string
    (the round-1 shape) re-evaluated the full regex tokenization for every
    element_at() inside the transform() lambda - O(tokens^2) regex work per
    document, ~15s/branch at sf0.1 vs <1s two-step. Catalyst does not
    collapse non-cheap projections into lambda bodies, so the bound
    attribute is computed once per row.
    """
    # the per-row regex+shingle work dominates; widen the 1-split fixture
    # scan so it parallelizes (no-op on a real many-split corpus)
    docs = widen_small_scan(load_table(spark, sf_dir, "documents"))
    toks = "filter(split(lower(text), '[^a-z0-9]+'), x -> x != '')"
    return (
        docs.select("doc_id", F.expr(toks).alias("t"))
        .select("doc_id", F.expr(_SPARK_SHINGLES.format(t="t")).alias("sh"))
        .withColumn("n_sh", F.size("sh"))
    )


_DUCK_SHINGLE_BASE = f"""
    SELECT doc_id, {_DUCK_SHINGLES.format(t=_OT)} AS sh,
           len({_DUCK_SHINGLES.format(t=_OT)}) AS n_sh
    FROM documents
"""


# ---------------------------------------------------------------------------
# Exact dedup by content hash: md5 groupBy, survivor = min doc_id. One
# shuffle on a uniform key; the whole-row generalization of D1/D2.
@query(
    "dedup_exact_content",
    oracle="""
    SELECT md5(text) AS content_fp,
           min(doc_id) AS survivor_doc_id,
           count(*) AS n_copies
    FROM documents
    GROUP BY 1
    ORDER BY survivor_doc_id
    """,
)
def dedup_exact_content(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.groupBy(F.md5(F.col("text").cast("binary")).alias("content_fp"))
        .agg(
            F.min("doc_id").alias("survivor_doc_id"),
            F.count("*").alias("n_copies"),
        )
        # no output sort: full-table fan-out, driver hash is
        # order-insensitive; a global sort here is the plan's single
        # largest exchange at scale and buys nothing (oracle keeps its
        # ORDER BY - harmless on the DuckDB side)
    )


# Persisted relations from the previous near-dup invocation, released on
# the next call (the lazily returned plans mean in-function unpersist
# would be premature; the bench also clears cache between measurements)
# or via caches.release_all() for interactive sessions.
_SHINGLE_BASE_CACHE: list[DataFrame] = register_cache([])


def _shingle_base(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The persisted non-empty shingle relation both near-dup pipelines
    (and their recall eval, which runs them against ONE shared base)
    start from. Releases the previous invocation's relations first."""
    while _SHINGLE_BASE_CACHE:
        _SHINGLE_BASE_CACHE.pop().unpersist()
    sh = (
        _spark_shingle_df(spark, sf_dir)
        .where(F.col("n_sh") > 0)
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    _SHINGLE_BASE_CACHE.append(sh)
    return sh


# ---------------------------------------------------------------------------
# EXACT n-gram Jaccard near-dup pairs. Spark plan: prefix-filtered inverted
# index (candidates from the frequency-ordered prefix self-join with
# PPJoin size + positional pruning), then exact verify via
# array_intersect. Oracle: brute-force all-pairs - equal hashes prove the
# pruning lost nothing.
@query(
    "ngram_jaccard_near_dup",
    oracle=f"""
    WITH sh AS ({_DUCK_SHINGLE_BASE})
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           len(list_intersect(a.sh, b.sh)) AS n_common,
           CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
               / (a.n_sh + b.n_sh - len(list_intersect(a.sh, b.sh))) AS jaccard
    FROM sh a JOIN sh b ON a.doc_id < b.doc_id
    WHERE a.n_sh > 0 AND b.n_sh > 0
      AND CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
              / (a.n_sh + b.n_sh - len(list_intersect(a.sh, b.sh)))
          >= {JACCARD_TAU}
    ORDER BY doc_a, doc_b
    """,
)
def ngram_jaccard_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _ngram_pairs(_shingle_base(spark, sf_dir))


def _ngram_pairs(sh: DataFrame) -> DataFrame:
    # Both reused relations are persisted: the executed plan otherwise
    # rescans + re-shingles documents SIX times (prefix window twice, the
    # freq branch, and the two verify sides) with zero exchange reuse.
    # Measured at sf0.1: no persist 10.6s, persist sh 4.6s, persist sh +
    # prefix 3.9s. (A round-1 note claimed caching slowed this query; that
    # predates the zip_with shingle fix that made recompute cheap enough
    # to expose the 6x re-read instead.) Released on the next call, same
    # pattern as the MinHash base.
    #
    # Prefix filtering (AllPairs/PPJoin): order every doc's shingles by ONE
    # global total order and keep the first |d| - ceil(tau*|d|) + 1. For any
    # pair with J >= tau, the globally-smallest SHARED shingle c must sit in
    # BOTH prefixes: all of a's shingles ordered before c are non-shared, of
    # which a has at most |a| - o <= |a| - ceil(tau*|a|), so c's position in
    # a is within the prefix (symmetrically for b). Hence prefix x prefix
    # self-join finds every qualifying pair; the all-pairs oracle hash-match
    # proves the pruning lossless. The global order is (doc-frequency,
    # shingle): rarest first, so prefix join buckets are the SMALLEST ones -
    # the frequency agg is one extra shuffle that removes the quadratic
    # blowup of hot shingles (at sf0.1: 653k candidates lexicographic ->
    # ~20k frequency-ordered).
    # the exploded (doc, shingle) stream feeds both the df agg and the
    # prefix join; persist so the explode runs once (r16; guide §5)
    full = (
        sh.select("doc_id", "n_sh", F.explode("sh").alias("shingle"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    _SHINGLE_BASE_CACHE.append(full)
    freq = full.groupBy("shingle").agg(F.count("*").alias("df"))
    w = W.partitionBy("doc_id").orderBy("df", "shingle")
    prefix_len = (
        F.col("n_sh") - F.ceil(F.lit(JACCARD_TAU) * F.col("n_sh")) + 1
    ).cast("int")
    prefix = (
        full.join(freq, "shingle")
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= prefix_len)
        .select("doc_id", "n_sh", "rn", "shingle")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    _SHINGLE_BASE_CACHE.append(prefix)
    # PPJoin pruning on the prefix-collision rows, both lossless for
    # J >= tau (the all-pairs oracle hash-match PROVES it):
    #   size filter      - tau*|a| <= |b| and tau*|b| <= |a|;
    #   positional filter- overlap o <= min(|a|-pa, |b|-pb) + 1 at the
    #     FIRST token matched in both prefixes (all common tokens rank at
    #     or after it - an earlier common token would sit inside both
    #     prefixes and be an earlier match), so any surviving match must
    #     allow o >= ceil(tau/(1+tau) * (|a|+|b|)).
    # Measured at sf0.1: 409k raw prefix-collision pairs -> 125k after
    # both filters (verify-join work drops proportionally).
    size_ok = (
        F.col("f.n_sh") >= F.ceil(F.lit(JACCARD_TAU) * F.col("p.n_sh"))
    ) & (F.col("p.n_sh") >= F.ceil(F.lit(JACCARD_TAU) * F.col("f.n_sh")))
    min_overlap = F.ceil(
        F.lit(JACCARD_TAU / (1.0 + JACCARD_TAU))
        * (F.col("p.n_sh") + F.col("f.n_sh"))
    )
    pos_ok = (
        F.least(
            F.col("p.n_sh") - F.col("p.rn"), F.col("f.n_sh") - F.col("f.rn")
        )
        + 1
    ) >= min_overlap
    cand = (
        prefix.alias("p")
        .join(prefix.alias("f"), "shingle")
        .where(
            (F.col("p.doc_id") < F.col("f.doc_id")) & size_ok & pos_ok
        )
        .select(
            F.col("p.doc_id").alias("doc_a"),
            F.col("f.doc_id").alias("doc_b"),
        )
        .distinct()
    )
    a = sh.select(
        F.col("doc_id").alias("doc_a"),
        F.col("sh").alias("sh_a"),
        F.col("n_sh").alias("n_a"),
    )
    b = sh.select(
        F.col("doc_id").alias("doc_b"),
        F.col("sh").alias("sh_b"),
        F.col("n_sh").alias("n_b"),
    )
    common = F.size(F.array_intersect("sh_a", "sh_b"))
    jac = common.cast("double") / (F.col("n_a") + F.col("n_b") - common)
    return (
        cand.join(a, "doc_a")
        .join(b, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            common.alias("n_common"),
            jac.alias("jaccard"),
        )
        .where(F.col("jaccard") >= JACCARD_TAU)
        .orderBy("doc_a", "doc_b")
    )


# ---------------------------------------------------------------------------
# MinHash + LSH banding, deterministic end to end: shingle -> 32-bit md5
# hash -> 16 affine permutation minima -> 4 band keys -> band equi-join for
# candidates -> exact-Jaccard verification. The oracle replicates every
# step, so even this "approximate" operator is hash-checked.
def _minhash_signature(sh: DataFrame) -> DataFrame:
    """(doc_id, sh, n_sh, mh0..mh15). The 32-bit shingle-hash array is
    projected ONCE as its own column; the 16 permutation minima then fold
    over that bound attribute. Inlining the hash expression into each mh_i
    (the round-1 shape) made every permutation re-md5 every shingle - 16x
    the hash work."""
    hs = F.expr("transform(sh, s -> " + _SPARK_H32.format(s="s") + ")")
    minima = [
        F.array_min(
            F.transform(F.col("hs"), lambda h: (F.lit(a) * h + F.lit(b)) % _MH_P)
        ).alias(f"mh{i}")
        for i, (a, b) in enumerate(_MH_AB)
    ]
    return sh.withColumn("hs", hs).select("doc_id", "sh", "n_sh", *minima)


def _duck_minhash_cols() -> str:
    hs = f"list_transform(sh, s -> {_DUCK_H32.format(s='s')})"
    return ", ".join(
        f"list_min(list_transform({hs}, h -> ({a} * h + {b}) % {_MH_P})) AS mh{i}"
        for i, (a, b) in enumerate(_MH_AB)
    )


def _band_key_exprs(col: str = "mh") -> list[str]:
    keys = []
    for band in range(_N_BANDS):
        cols = [f"{col}{band * _BAND_ROWS + r}" for r in range(_BAND_ROWS)]
        keys.append("concat_ws('-', " + ", ".join(cols) + ")")
    return keys


@query(
    "minhash_lsh_near_dup",
    oracle=f"""
    WITH sh AS ({_DUCK_SHINGLE_BASE}),
    sig AS (
        SELECT doc_id, sh, n_sh, {_duck_minhash_cols()}
        FROM sh WHERE n_sh > 0
    ),
    bands AS (
        SELECT doc_id,
               unnest(generate_series(0, {_N_BANDS - 1})) AS band_idx,
               unnest([{", ".join(_band_key_exprs())}]) AS band_key
        FROM sig
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM bands a
        JOIN bands b ON a.band_idx = b.band_idx
                    AND a.band_key = b.band_key
                    AND a.doc_id < b.doc_id
    )
    SELECT doc_a, doc_b,
           len(list_intersect(sa.sh, sb.sh)) AS n_common,
           CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
               / (sa.n_sh + sb.n_sh - len(list_intersect(sa.sh, sb.sh)))
               AS jaccard
    FROM cand
    JOIN sig sa ON sa.doc_id = doc_a
    JOIN sig sb ON sb.doc_id = doc_b
    WHERE CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
              / (sa.n_sh + sb.n_sh - len(list_intersect(sa.sh, sb.sh)))
          >= {JACCARD_TAU}
    ORDER BY doc_a, doc_b
    """,
)
def minhash_lsh_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The returned plan is lazy, so the persist can't be released inside
    # this function; instead each call frees the previous call's base, so
    # at most one cached relation ever outlives its query (the bench also
    # clears the cache between measurements).
    return _minhash_pairs(_shingle_base(spark, sf_dir))


def _minhash_pairs(sh: DataFrame) -> DataFrame:
    sig = _minhash_signature(sh)
    band_keys = [F.expr(e) for e in _band_key_exprs()]
    # both sides of the band self-join read `bands`; persist so the
    # signature computation (16 affine minima over every doc's hashed
    # shingle set - the pipeline's dominant map work) runs once, not
    # twice (r16; guide §5). 4 small rows per doc; _SHINGLE_BASE_CACHE
    # lifecycle.
    bands = sig.select(
        "doc_id", F.posexplode(F.array(*band_keys)).alias("band_idx", "band_key")
    ).persist(StorageLevel.MEMORY_AND_DISK)
    _SHINGLE_BASE_CACHE.append(bands)
    cand = (
        bands.alias("x")
        .join(
            bands.alias("y"),
            (F.col("x.band_idx") == F.col("y.band_idx"))
            & (F.col("x.band_key") == F.col("y.band_key"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .select(
            F.col("x.doc_id").alias("doc_a"), F.col("y.doc_id").alias("doc_b")
        )
        .distinct()
    )
    a = sh.select(
        F.col("doc_id").alias("doc_a"),
        F.col("sh").alias("sh_a"),
        F.col("n_sh").alias("n_a"),
    )
    b = sh.select(
        F.col("doc_id").alias("doc_b"),
        F.col("sh").alias("sh_b"),
        F.col("n_sh").alias("n_b"),
    )
    common = F.size(F.array_intersect("sh_a", "sh_b"))
    jac = common.cast("double") / (F.col("n_a") + F.col("n_b") - common)
    return (
        cand.join(a, "doc_a")
        .join(b, "doc_b")
        .select("doc_a", "doc_b", common.alias("n_common"), jac.alias("jaccard"))
        .where(F.col("jaccard") >= JACCARD_TAU)
        .orderBy("doc_a", "doc_b")
    )


# ---------------------------------------------------------------------------
# SimHash: 32-bit weighted fingerprint. Each distinct token contributes its
# count with sign +-1 per bit of its 32-bit hash; fingerprint bit b is set
# iff the signed sum is positive. One narrow agg per doc - near-dup lookup
# at scale buckets fingerprints on rotated byte slices (Hamming-ball probe).
_SIMHASH_BITS = 32

_DUCK_BIT_SUMS = ", ".join(
    f"sum(CASE WHEN ((h >> {b}) & 1) = 1 THEN cnt ELSE -cnt END) AS s{b}"
    for b in range(_SIMHASH_BITS)
)
_DUCK_ASSEMBLE = " + ".join(
    f"(CASE WHEN s{b} > 0 THEN {1 << b} ELSE 0 END)" for b in range(_SIMHASH_BITS)
)


@query(
    "simhash_fingerprints",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, t AS token, count(*) AS cnt
        FROM (SELECT doc_id, unnest({_OT}) AS t FROM documents) GROUP BY 1, 2
    ),
    hashed AS (
        SELECT doc_id, cnt, {_DUCK_H32.format(s='token')} AS h FROM tok
    ),
    bitsums AS (
        SELECT doc_id, {_DUCK_BIT_SUMS} FROM hashed GROUP BY doc_id
    )
    SELECT doc_id, CAST({_DUCK_ASSEMBLE} AS BIGINT) AS simhash32
    FROM bitsums ORDER BY doc_id
    """,
)
def simhash_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = "filter(split(lower(text), '[^a-z0-9]+'), x -> x != '')"
    tok = (
        docs.select("doc_id", F.explode(F.expr(toks)).alias("token"))
        .groupBy("doc_id", "token")
        .agg(F.count("*").alias("cnt"))
        .select(
            "doc_id",
            "cnt",
            F.expr(_SPARK_H32.format(s="token")).alias("h"),
        )
    )
    bit_sums = [
        F.sum(
            F.when(
                F.shiftright("h", b).bitwiseAND(F.lit(1)) == 1, F.col("cnt")
            ).otherwise(-F.col("cnt"))
        ).alias(f"s{b}")
        for b in range(_SIMHASH_BITS)
    ]
    assembled = sum(
        [
            F.when(F.col(f"s{b}") > 0, F.lit(1 << b)).otherwise(F.lit(0))
            for b in range(_SIMHASH_BITS)
        ],
        F.lit(0),
    )
    return (
        tok.groupBy("doc_id")
        .agg(*bit_sums)
        .select("doc_id", assembled.cast("bigint").alias("simhash32"))
        # no output sort: one row per doc (full-table scale), driver hash
        # is order-insensitive
    )


# ---------------------------------------------------------------------------
# Entity resolution by DELETION-NEIGHBORHOOD blocking: two equal-length
# names are within edit distance 1 (= at most one substitution) iff
# deleting some position i makes them identical, so each name fans out
# into its L single-deletion variants and candidates come from an
# equi-join on (nation, i, variant) - the record-linkage analog of the
# shingle prefix filter above, provably LOSSLESS for the dist<=1
# predicate (the all-pairs oracle hash-match proves it, same strategy as
# the Jaccard query). A naive (nation, length) block key degenerates on
# fixed-format names (every name same length -> whole-nation quadratic
# blocks, measured 58s at sf0.1); the deletion join is linear fan-out
# (L variants/row) into tiny high-entropy buckets, 0.9s on the same
# data. Both engines implement classic unit-cost edit distance, so
# edit_dist is exact and hash-checkable.
@query(
    "fuzzy_name_matches",
    oracle="""
    SELECT a.c_custkey AS custkey_a, b.c_custkey AS custkey_b,
           levenshtein(a.c_name, b.c_name) AS edit_dist
    FROM customer a JOIN customer b
      ON a.c_nationkey = b.c_nationkey
     AND length(a.c_name) = length(b.c_name)
     AND a.c_custkey < b.c_custkey
    WHERE levenshtein(a.c_name, b.c_name) <= 1
    ORDER BY custkey_a, custkey_b
    """,
)
def fuzzy_name_matches(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    variants = cust.select(
        "c_custkey",
        "c_name",
        "c_nationkey",
        F.explode(
            F.expr(
                "transform(sequence(1, length(c_name)), i -> "
                "named_struct('pos', i, 'v', "
                "concat(substring(c_name, 1, i - 1), "
                "substring(c_name, i + 1, length(c_name)))))"
            )
        ).alias("dv"),
    ).select(
        "c_custkey", "c_name", "c_nationkey",
        F.col("dv.pos").alias("pos"), F.col("dv.v").alias("v"),
    )
    a, b = variants.alias("a"), variants.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.c_nationkey") == F.col("b.c_nationkey"))
            & (F.col("a.pos") == F.col("b.pos"))
            & (F.col("a.v") == F.col("b.v"))
            # mirrors the oracle's length-equality predicate. Implied for
            # non-degenerate variants, but an EMPTY name's sequence(1, 0)
            # yields [1, 0] (Spark infers step -1) whose zero-length
            # variants would otherwise match every 1-char name across
            # lengths - latent on TPC-H names, divergent on dirty
            # corpora (r9 review)
            & (
                F.length(F.col("a.c_name")) == F.length(F.col("b.c_name"))
            )
            & (F.col("a.c_custkey") < F.col("b.c_custkey")),
        )
        # equal variants at the same position => names identical outside
        # pos => dist <= 1 already; distinct collapses the L-fold match
        # multiplicity of identical-name pairs
        .select(
            F.col("a.c_custkey").alias("custkey_a"),
            F.col("b.c_custkey").alias("custkey_b"),
            F.col("a.c_name").alias("name_a"),
            F.col("b.c_name").alias("name_b"),
        )
        .distinct()
    )
    return pairs.select(
        "custkey_a",
        "custkey_b",
        F.levenshtein("name_a", "name_b").alias("edit_dist"),
    )  # no output sort: driver hash is order-insensitive (r5 rule)


# ---------------------------------------------------------------------------
# Rolling-window dedup with re-arm: suppress repeats of a (user, event
# type) signal, but let it fire again once the signal has been QUIET for
# a full re-arm gap - the alerting/notification dedup semantic (send at
# most one alert per quiet period, not one per lifetime). Episodes are
# gap-based sessions: a new episode starts when the gap from the
# PREVIOUS OCCURRENCE exceeds the re-arm window; the episode's first
# event is kept, the rest are suppressed. One window spec (partition by
# the dedup key, order by ts) serves lag + the running episode counter,
# so the whole operator is a single shuffle on the dedup key - at 100 TB
# the state per key is one row of lag context, never a buffer, and the
# same shuffle feeds the final per-key rollup with no extra exchange.
_REARM_DAYS = 3


@query(
    "dedup_rolling_window",
    oracle=f"""
    WITH seq AS (
        SELECT user_id, event_type, ts,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR ts - lag(ts) OVER w > INTERVAL {_REARM_DAYS} DAY
                    THEN 1 ELSE 0 END AS is_first
        FROM events
        WINDOW w AS (PARTITION BY user_id, event_type ORDER BY ts, event_id)
    )
    SELECT user_id, event_type,
           count(*) AS n_events,
           CAST(sum(is_first) AS BIGINT) AS n_kept,
           count(*) - CAST(sum(is_first) AS BIGINT) AS n_suppressed
    FROM seq
    GROUP BY user_id, event_type
    ORDER BY user_id, event_type
    """,
)
def dedup_rolling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    # exact microsecond gap arithmetic: the oracle compares full-
    # precision timestamp intervals, so a whole-second cast here would
    # diverge for gaps within 1s of the 72h boundary (review finding,
    # this round - fixtures carry microseconds on every ts)
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", F.unix_micros("ts").alias("ts_us"), "event_id"
    )
    w = W.partitionBy("user_id", "event_type").orderBy("ts_us", "event_id")
    gap_new = (
        F.lag("ts_us").over(w).isNull()
        | (
            F.col("ts_us") - F.lag("ts_us").over(w)
            > _REARM_DAYS * 86400 * 1_000_000
        )
    )
    return (
        ev.withColumn("is_first", gap_new.cast("int"))
        .groupBy("user_id", "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("is_first").alias("n_kept"),
            (F.count("*") - F.sum("is_first")).alias("n_suppressed"),
        )
        # no output sort: driver hash is order-insensitive (r5 rule)
    )


# ---------------------------------------------------------------------------
# Near-dup index recall eval: does MinHash-LSH banding surface every
# pair the exact prefix-filtered Jaccard join finds? Completes the eval
# family (ann_recall_eval grades the IVF index, pq_adc_recall_eval the
# quantizer, this grades the LSH banding): both pipelines verify
# candidates against exact Jaccard >= tau, so LSH output is a SUBSET of
# the exact pair set and candidate precision is 1.0 by construction -
# the number that can degrade is banding RECALL (a pair whose signature
# agrees in no band is never seen), i.e. the false-negative rate of the
# (bands, rows) choice. One row: exact pairs, LSH hits, recall.
#
# Scale notes (100 TB): the eval runs both registered pipelines (their
# scale stories hold unchanged) and joins two bounded PAIR relations -
# the comparison costs nothing next to the searches; run it on a
# sampled slice to tune banding before an index build, exactly like
# ann_recall_eval.
@query(
    "near_dup_recall_eval",
    oracle=None,  # assigned below from the two composed oracle texts
)
def near_dup_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    # ONE shared shingle base: calling the two registered queries
    # back-to-back would persist two identical bases and unpersist the
    # first mid-plan (each call releases the previous cache entry)
    sh = _shingle_base(spark, sf_dir)
    exact = _ngram_pairs(sh).select(
        F.col("doc_a").alias("e_a"), F.col("doc_b").alias("e_b")
    )
    lsh = _minhash_pairs(sh).select(
        F.col("doc_a").alias("l_a"), F.col("doc_b").alias("l_b")
    )
    j = exact.join(
        lsh, (F.col("e_a") == F.col("l_a")) & (F.col("e_b") == F.col("l_b")),
        "left",
    )
    return j.agg(
        F.count("e_a").alias("n_exact_pairs"),
        F.count("l_a").alias("n_lsh_pairs"),
        (F.count("l_a").cast("double") / F.count("e_a").cast("double")).alias(
            "banding_recall"
        ),
    )


from ..registry import ORACLES as _DD_OR  # noqa: E402

_DD_OR["near_dup_recall_eval"] = f"""
WITH exact AS ({_DD_OR["ngram_jaccard_near_dup"]}),
     lsh AS ({_DD_OR["minhash_lsh_near_dup"]})
SELECT CAST(count(e.doc_a) AS BIGINT) AS n_exact_pairs,
       CAST(count(l.doc_a) AS BIGINT) AS n_lsh_pairs,
       CAST(count(l.doc_a) AS DOUBLE) / CAST(count(e.doc_a) AS DOUBLE)
           AS banding_recall
FROM exact e
LEFT JOIN lsh l ON l.doc_a = e.doc_a AND l.doc_b = e.doc_b
"""


# ---------------------------------------------------------------------------
# Incremental dedup: check an arriving DELTA batch against the existing
# BASE corpus - the production ingest shape (near_dup pipelines above
# dedup a corpus against ITSELF; a daily pipeline instead asks "which of
# today's documents already exist?"). The delta is a deterministic
# ~10% hash split standing in for the day's arrivals; candidates come
# from the same MinHash band keys, but the band join is ASYMMETRIC
# (delta bands against base bands only), so the work is O(delta)
# collisions, never the corpus self-join - the reason LSH indexes
# amortize: band keys for the base are computed once at index time and
# only probed here. Survivors verify by exact Jaccard >= tau.
#
# Scale notes (100 TB base + daily delta): both sides shuffle on the
# (band, key) pair; the delta side is days smaller, but it GROWS with
# the corpus rate, so no broadcast hint is pinned (Catalyst promotes
# small-enough deltas at runtime). Verification joins fetch shingle
# arrays for matched candidates only.
_INC_SPLIT_MOD = 10  # ~1/10 of docs play the arriving delta
_INC_H_SPARK = _SPARK_H32.format(s="concat('split-', cast(doc_id as string))")
_INC_H_DUCK = _DUCK_H32.format(s="concat('split-', CAST(doc_id AS VARCHAR))")


@query(
    "incremental_lsh_dedup",
    oracle=f"""
    WITH sh AS ({_DUCK_SHINGLE_BASE}),
    sig AS (
        SELECT doc_id, sh, n_sh, ({_INC_H_DUCK}) % {_INC_SPLIT_MOD} = 0
                   AS is_delta,
               {_duck_minhash_cols()}
        FROM sh WHERE n_sh > 0
    ),
    bands AS (
        SELECT doc_id, is_delta,
               unnest(generate_series(0, {_N_BANDS - 1})) AS band_idx,
               unnest([{", ".join(_band_key_exprs())}]) AS band_key
        FROM sig
    ),
    cand AS (
        SELECT DISTINCT d.doc_id AS delta_doc, b.doc_id AS base_doc
        FROM bands d
        JOIN bands b ON d.band_idx = b.band_idx
                    AND d.band_key = b.band_key
        WHERE d.is_delta AND NOT b.is_delta
    )
    SELECT delta_doc, base_doc,
           len(list_intersect(sd.sh, sb.sh)) AS n_common,
           CAST(len(list_intersect(sd.sh, sb.sh)) AS DOUBLE)
               / (sd.n_sh + sb.n_sh - len(list_intersect(sd.sh, sb.sh)))
               AS jaccard
    FROM cand
    JOIN sig sd ON sd.doc_id = delta_doc
    JOIN sig sb ON sb.doc_id = base_doc
    WHERE CAST(len(list_intersect(sd.sh, sb.sh)) AS DOUBLE)
              / (sd.n_sh + sb.n_sh - len(list_intersect(sd.sh, sb.sh)))
          >= {JACCARD_TAU}
    """,
)
def incremental_lsh_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    sh = _shingle_base(spark, sf_dir)
    sig = _minhash_signature(sh).withColumn(
        "is_delta", F.expr(_INC_H_SPARK) % _INC_SPLIT_MOD == F.lit(0)
    )
    band_keys = [F.expr(e) for e in _band_key_exprs()]
    # both sides of the delta-vs-base band join read `bands`; persist so
    # the signature computation runs once (r16; guide §5 - same fix as
    # _minhash_pairs)
    bands = sig.select(
        "doc_id",
        "is_delta",
        F.posexplode(F.array(*band_keys)).alias("band_idx", "band_key"),
    ).persist(StorageLevel.MEMORY_AND_DISK)
    _SHINGLE_BASE_CACHE.append(bands)
    cand = (
        bands.where("is_delta")
        .select(
            F.col("doc_id").alias("delta_doc"), "band_idx", "band_key"
        )
        .join(
            bands.where("NOT is_delta").select(
                F.col("doc_id").alias("base_doc"), "band_idx", "band_key"
            ),
            ["band_idx", "band_key"],
        )
        .select("delta_doc", "base_doc")
        .distinct()
    )
    d = sh.select(
        F.col("doc_id").alias("delta_doc"),
        F.col("sh").alias("sh_d"),
        F.col("n_sh").alias("n_d"),
    )
    b = sh.select(
        F.col("doc_id").alias("base_doc"),
        F.col("sh").alias("sh_b"),
        F.col("n_sh").alias("n_b"),
    )
    common = F.size(F.array_intersect("sh_d", "sh_b"))
    jac = common.cast("double") / (F.col("n_d") + F.col("n_b") - common)
    return (
        cand.join(d, "delta_doc")
        .join(b, "base_doc")
        .select(
            "delta_doc",
            "base_doc",
            common.alias("n_common"),
            jac.alias("jaccard"),
        )
        .where(F.col("jaccard") >= JACCARD_TAU)
    )


# ---------------------------------------------------------------------------
# Asymmetric CONTAINMENT near-dup: flag pairs where one document's
# shingle set is mostly INSIDE the other's (|A n B| / |A| >= tau) - the
# quote / excerpt / boilerplate-inclusion detector that symmetric Jaccard
# misses by construction (a 50-shingle quote inside a 5000-shingle page
# has Jaccard ~0.01 but containment ~1.0). Emits both directions per
# pair plus the shared-shingle count.
#
# Candidate generation is the asymmetric AllPairs variant: every doc
# keeps a frequency-ordered PREFIX (|d| - ceil(tau*|d|) + 1 rarest
# shingles) as its PROBE side, joined against the FULL inverted index -
# for containment the indexed side cannot be prefix-pruned (the
# containee's matching shingles may sit anywhere in the container), so
# asymmetric probe-vs-full is the tightest lossless filter; the
# brute-force all-pairs oracle hash-match PROVES nothing is lost. The
# size filter keeps only containers big enough to absorb ceil(tau*|A|)
# shared shingles.
#
# Scale notes (100 TB): prefix and index shuffle on the high-entropy
# shingle key; rarest-first ordering keeps probe buckets tiny (same
# machinery as ngram_jaccard_near_dup, measured there); the verify join
# moves each doc's shingle array once. tau=0.5: fixture's planted
# overlaps sit >=0.8, background <0.3 (measured sf0.01), so the
# threshold has margin on both sides.
_CONT_TAU = 0.5


@query(
    "containment_near_dup",
    oracle=f"""
    WITH sh AS ({_DUCK_SHINGLE_BASE})
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           len(list_intersect(a.sh, b.sh)) AS n_common,
           CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) / a.n_sh
               AS cont_a_in_b,
           CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) / b.n_sh
               AS cont_b_in_a
    FROM sh a JOIN sh b ON a.doc_id < b.doc_id
    WHERE a.n_sh > 0 AND b.n_sh > 0
      AND greatest(
            CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) / a.n_sh,
            CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) / b.n_sh)
          >= {_CONT_TAU}
    """,
)
def containment_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    sh = _shingle_base(spark, sf_dir)
    # the exploded (doc, shingle) stream has THREE consumers (the df agg,
    # the prefix build, and the full-index probe side of the candidate
    # join); persist so the explode runs once (r16; guide §5) - same
    # lifecycle as the shingle base itself
    full = (
        sh.select("doc_id", "n_sh", F.explode("sh").alias("shingle"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    _SHINGLE_BASE_CACHE.append(full)
    freq = full.groupBy("shingle").agg(F.count("*").alias("df"))
    w = W.partitionBy("doc_id").orderBy("df", "shingle")
    prefix_len = (
        F.col("n_sh") - F.ceil(F.lit(_CONT_TAU) * F.col("n_sh")) + 1
    ).cast("int")
    prefix = (
        full.join(freq, "shingle")
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= prefix_len)
        .select("doc_id", "n_sh", "shingle")
    )
    cand = (
        prefix.alias("p")
        .join(full.alias("f"), "shingle")
        .where(
            (F.col("p.doc_id") != F.col("f.doc_id"))
            & (
                F.col("f.n_sh")
                >= F.ceil(F.lit(_CONT_TAU) * F.col("p.n_sh"))
            )
        )
        .select(
            F.least("p.doc_id", "f.doc_id").alias("doc_a"),
            F.greatest("p.doc_id", "f.doc_id").alias("doc_b"),
        )
        .distinct()
    )
    a = sh.select(
        F.col("doc_id").alias("doc_a"),
        F.col("sh").alias("sh_a"),
        F.col("n_sh").alias("n_a"),
    )
    b = sh.select(
        F.col("doc_id").alias("doc_b"),
        F.col("sh").alias("sh_b"),
        F.col("n_sh").alias("n_b"),
    )
    common = F.size(F.array_intersect("sh_a", "sh_b"))
    c_ab = common.cast("double") / F.col("n_a")
    c_ba = common.cast("double") / F.col("n_b")
    return (
        cand.join(a, "doc_a")
        .join(b, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            common.alias("n_common"),
            c_ab.alias("cont_a_in_b"),
            c_ba.alias("cont_b_in_a"),
        )
        .where(
            F.greatest("cont_a_in_b", "cont_b_in_a") >= F.lit(_CONT_TAU)
        )
        # no output sort: driver hash is order-insensitive (r5 rule)
    )


# ---------------------------------------------------------------------------
# SimHash near-dup PAIRS: close the loop on simhash_fingerprints (which
# emits per-doc fingerprints) by finding document pairs within Hamming
# distance 2 - byte-band blocking on the 32-bit fingerprint, then an
# exact XOR-popcount verify. The 4x8-bit banding is lossless for d <= 3
# by pigeonhole (3 flipped bits touch at most 3 bands, so one band
# matches exactly), which covers the d <= 2 emit threshold with margin;
# the all-pairs oracle hash-match PROVES no pair is lost.
#
# 32-bit simhash trades precision for the cross-engine exactness the
# fingerprint op established; the fixture's shared word-soup vocabulary
# puts the random-pair noise floor near d ~ 4-5 (measured: 174 pairs at
# d <= 2 vs 125k total), so tau = 2 reads "same dominant vocabulary" -
# a 64-bit production simhash separates further, same plan shape.
#
# Scale notes (100 TB): fingerprints are one (doc, token) shuffle; the
# band equi-join shuffles 4 small (band_id, byte) keys per doc and the
# verify is an integer XOR per candidate - no shingle arrays move at
# all (cheaper than the MinHash verify join).
_SH_TAU = 2


@query(
    "simhash_hamming_pairs",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, t AS token, count(*) AS cnt
        FROM (SELECT doc_id, unnest({_OT}) AS t FROM documents) GROUP BY 1, 2
    ),
    hashed AS (
        SELECT doc_id, cnt, {_DUCK_H32.format(s='token')} AS h FROM tok
    ),
    bitsums AS (
        SELECT doc_id, {_DUCK_BIT_SUMS} FROM hashed GROUP BY doc_id
    ),
    fp AS (SELECT doc_id, CAST({_DUCK_ASSEMBLE} AS BIGINT) AS f
           FROM bitsums)
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(bit_count(xor(a.f, b.f)) AS BIGINT) AS hamming
    FROM fp a JOIN fp b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.f, b.f)) <= {_SH_TAU}
    """,
)
def simhash_hamming_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = "filter(split(lower(text), '[^a-z0-9]+'), x -> x != '')"
    tok = (
        docs.select("doc_id", F.explode(F.expr(toks)).alias("token"))
        .groupBy("doc_id", "token")
        .agg(F.count("*").alias("cnt"))
        .select(
            "doc_id", "cnt", F.expr(_SPARK_H32.format(s="token")).alias("h")
        )
    )
    bit_sums = [
        F.sum(
            F.when(
                F.shiftright("h", b).bitwiseAND(F.lit(1)) == 1, F.col("cnt")
            ).otherwise(-F.col("cnt"))
        ).alias(f"s{b}")
        for b in range(_SIMHASH_BITS)
    ]
    assembled = sum(
        [
            F.when(F.col(f"s{b}") > 0, F.lit(1 << b)).otherwise(F.lit(0))
            for b in range(_SIMHASH_BITS)
        ],
        F.lit(0),
    )
    # Drain the previous invocation's relations BEFORE persisting (the
    # contract every other persisting operator in this family follows);
    # append-only here leaked one fingerprint relation per call in
    # interactive sessions (r9 review).
    while _SHINGLE_BASE_CACHE:
        _SHINGLE_BASE_CACHE.pop().unpersist()
    fp = (
        tok.groupBy("doc_id")
        .agg(*bit_sums)
        .select("doc_id", assembled.cast("bigint").alias("f"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    _SHINGLE_BASE_CACHE.append(fp)
    bands = fp.select(
        "doc_id",
        "f",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(k).alias("band_id"),
                        F.shiftright("f", 8 * k)
                        .bitwiseAND(F.lit(255))
                        .alias("byte"),
                    )
                    for k in range(4)
                ]
            )
        ).alias("bk"),
    ).select("doc_id", "f", "bk.band_id", "bk.byte")
    cand = (
        bands.alias("a")
        .join(
            bands.alias("b"),
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.byte") == F.col("b.byte"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.f").alias("fa"),
            F.col("b.f").alias("fb"),
        )
        .distinct()
    )
    ham = F.bit_count(F.col("fa").bitwiseXOR(F.col("fb")))
    return (
        cand.where(ham <= _SH_TAU)
        .select(
            "doc_a", "doc_b", ham.cast("bigint").alias("hamming")
        )
    )


# ---------------------------------------------------------------------------
# Duplicated n-gram span share: for every document, the fraction of its
# 8-gram positions whose 8-gram also occurs in at least one OTHER
# document - the per-doc "how much of me is corpus-duplicated text"
# exposure metric behind exact-substring dedup (Lee et al. 2022,
# "Deduplicating Training Data Makes Language Models Better"): docs
# with a high share get their duplicated spans cut (or are dropped)
# before LM training. Complements doc_repetition_stats (INTRA-doc
# repetition) and the near-dup families (whole-doc similarity) with the
# span-level CROSS-doc signal none of them expose.
#
# Grams travel as 16-hex-char md5 prefixes (64 bits - collision odds
# ~1e-11 at a billion distinct grams), computed identically in both
# engines, so the shuffle moves 16-byte keys instead of 8-word strings.
#
# Scale notes (100 TB): gram fan-out is ~1 row per token (linear);
# the plan is two gram-keyed shuffles (per-(doc,gram) counts, then the
# docs-per-gram agg whose join back REUSES the gram partitioning) and
# one doc-keyed rollup - no broadcast, no arrays through the shuffle.
# The share division is a single IEEE double op on exact counts.
_DUPSPAN_N = 8

# previous invocation's persisted per-doc gram counts (dup_ngram_span_share),
# released on the next call - the _SHINGLE_BASE_CACHE lifecycle
_DUPSPAN_CACHE: list[DataFrame] = register_cache([])


@query(
    "dup_ngram_span_share",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, {_OT} AS tk FROM documents
    ),
    g AS (
        SELECT doc_id,
               substring(md5(array_to_string(
                   list_slice(tk, i, i + {_DUPSPAN_N - 1}), ' ')), 1, 16)
                   AS gk
        FROM toks, unnest(generate_series(1, len(tk) - {_DUPSPAN_N - 1}))
                   AS t(i)
        WHERE len(tk) >= {_DUPSPAN_N}
    ),
    dg AS (
        SELECT doc_id, gk, CAST(count(*) AS BIGINT) AS c
        FROM g GROUP BY 1, 2
    ),
    gd AS (SELECT gk, CAST(count(*) AS BIGINT) AS n_docs FROM dg GROUP BY 1),
    per AS (
        SELECT dg.doc_id,
               CAST(sum(dg.c) AS BIGINT) AS n_grams,
               CAST(sum(CASE WHEN gd.n_docs >= 2 THEN dg.c ELSE 0 END)
                   AS BIGINT) AS n_dup_grams
        FROM dg JOIN gd USING (gk) GROUP BY 1
    )
    SELECT doc_id, n_grams, n_dup_grams,
           CAST(n_dup_grams AS DOUBLE) / CAST(n_grams AS DOUBLE)
               AS dup_share
    FROM per
    """,
)
def dup_ngram_span_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..tables import widen_small_scan

    # r16: widen the fixture's single-split scan - the tokenize + per-gram
    # md5 explode (this query's dominant map work) otherwise runs on one
    # core (no-op on a real many-split corpus); and persist the per-doc
    # gram counts, which feed BOTH the gram-frequency agg and the final
    # per-doc join - without the persist the whole explode + md5 pass
    # executes twice (guide §5).
    docs = widen_small_scan(load_table(spark, sf_dir, "documents"))
    toks = "filter(split(lower(text), '[^a-z0-9]+'), x -> x != '')"
    gram = (
        f"transform(sequence(1, size(tk) - {_DUPSPAN_N - 1}), "
        f"i -> substring(md5(cast(concat_ws(' ', "
        f"slice(tk, i, {_DUPSPAN_N})) as binary)), 1, 16))"
    )
    g = (
        docs.select("doc_id", F.expr(toks).alias("tk"))
        .where(F.size("tk") >= _DUPSPAN_N)
        .select("doc_id", F.explode(F.expr(gram)).alias("gk"))
    )
    while _DUPSPAN_CACHE:
        _DUPSPAN_CACHE.pop().unpersist()
    dg = g.groupBy("doc_id", "gk").agg(F.count("*").alias("c")).persist()
    _DUPSPAN_CACHE.append(dg)
    gd = dg.groupBy("gk").agg(F.count("*").alias("n_docs"))
    per = (
        dg.join(gd, "gk")
        .groupBy("doc_id")
        .agg(
            F.sum("c").cast("bigint").alias("n_grams"),
            F.sum(F.when(F.col("n_docs") >= 2, F.col("c")).otherwise(0))
            .cast("bigint")
            .alias("n_dup_grams"),
        )
    )
    return per.select(
        "doc_id",
        "n_grams",
        "n_dup_grams",
        (
            F.col("n_dup_grams").cast("double")
            / F.col("n_grams").cast("double")
        ).alias("dup_share"),
    )


_GOLD_STOP = ("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")


# ---------------------------------------------------------------------------
# Survivorship (golden-record selection) over topic-signature groups:
# where dedup_exact_content keeps the SMALLEST doc_id (a stable but
# arbitrary rule), real curation picks the BEST copy. Groups are docs
# sharing a TOPIC SIGNATURE - the sorted top-5 tokens by (count DESC,
# token) - the cheap blocking key for "retellings of the same content"
# (this fixture has zero byte-exact duplicates, so exact-hash groups
# are all singletons; the signature groups are where a survivorship
# rule has actual work to do). Within each group the survivor is the
# argmax of the text_quality_stats score with doc_id as tiebreak; the
# output records group size, the survivor, and the quality spread the
# rule exercised.
#
# Determinism: the quality score is the established fixed-association
# IEEE chain (text.py) on exact counts, PRE-QUANTIZED to micro ints;
# the argmax rides the composite integer key q_micro*1e12 - doc_id
# (exact in int64: q_micro <= 1e6 so the key tops out ~1e18 < 2^63 and
# quality strictly dominates for any doc_id < 1e12 - the
# latest_order_per_segment device).
#
# Scale notes (100 TB): the signature needs one (doc, token) count
# shuffle + a per-doc top-5 window (WindowGroupLimit map-side prune) +
# a doc-keyed rollup; the survivor pass is ONE signature-keyed shuffle
# with map-side partial arg-max. Only multi-doc groups survive the
# HAVING; nothing broadcasts.
@query(
    "golden_doc_selection",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, t AS token, count(*) AS c
        FROM (SELECT doc_id, unnest({_OT}) AS t FROM documents)
        GROUP BY 1, 2
    ),
    r5 AS (
        SELECT doc_id, token, row_number() OVER (
            PARTITION BY doc_id ORDER BY c DESC, token) AS rn
        FROM tok
    ),
    sig AS (
        SELECT doc_id, array_to_string(list_sort(list(token)), ' ')
               AS signature
        FROM r5 WHERE rn <= 5 GROUP BY doc_id
    ),
    q AS (
        SELECT doc_id,
               CAST(floor((
                   (0.4 * least(CAST(len(toks) AS DOUBLE) / 100.0, 1.0)
                    + 0.3 * (1.0 - CAST(len(list_filter(toks,
                          x -> list_contains([{', '.join(
                              f"'{w}'" for w in _GOLD_STOP)}], x)))
                          AS DOUBLE) / len(toks)))
                   + 0.3 * (CAST(len(list_distinct(toks)) AS DOUBLE)
                            / len(toks))) * 1000000 + 0.5) AS BIGINT)
                   AS q_micro
        FROM (SELECT doc_id, {_OT} AS toks FROM documents)
        WHERE len(toks) > 0
    )
    SELECT s.signature,
           CAST(count(*) AS BIGINT) AS group_size,
           arg_max(q.doc_id, q.q_micro * 1000000000000 - q.doc_id)
               AS survivor_doc_id,
           CAST(max(q.q_micro) AS DOUBLE) / 1000000 AS survivor_quality,
           CAST(max(q.q_micro) - min(q.q_micro) AS DOUBLE) / 1000000
               AS quality_spread
    FROM sig s JOIN q ON q.doc_id = s.doc_id
    GROUP BY s.signature HAVING count(*) >= 2
    """,
)
def golden_doc_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = "filter(split(lower(text), '[^a-z0-9]+'), x -> x != '')"
    tok = (
        docs.select("doc_id", F.explode(F.expr(toks)).alias("token"))
        .groupBy("doc_id", "token")
        .agg(F.count("*").alias("c"))
    )
    w5 = W.partitionBy("doc_id").orderBy(F.desc("c"), "token")
    sig = (
        tok.withColumn("rn", F.row_number().over(w5))
        .where(F.col("rn") <= 5)
        .groupBy("doc_id")
        .agg(
            F.array_join(F.array_sort(F.collect_list("token")), " ").alias(
                "signature"
            )
        )
    )
    stop_lst = ", ".join(f"'{w}'" for w in _GOLD_STOP)
    q_expr = (
        f"cast(floor(((0.4 * least(cast(size(t) as double) / 100.0, 1.0)"
        f" + 0.3 * (1.0 - cast(size(filter(t, x -> array_contains("
        f"array({stop_lst}), x))) as double) / size(t)))"
        f" + 0.3 * (cast(size(array_distinct(t)) as double) / size(t)))"
        f" * 1000000 + 0.5) as bigint)"
    )
    q = (
        docs.select("doc_id", F.expr(toks).alias("t"))
        .where(F.size("t") > 0)
        .select("doc_id", F.expr(q_expr).alias("q_micro"))
    )
    key = F.col("q_micro") * F.lit(1_000_000_000_000) - F.col("doc_id")
    return (
        sig.join(q, "doc_id")
        .select("signature", "doc_id", "q_micro", key.alias("k"))
        .groupBy("signature")
        .agg(
            F.count("*").alias("group_size"),
            F.max_by("doc_id", "k").alias("survivor_doc_id"),
            (F.max("q_micro").cast("double") / F.lit(1_000_000)).alias(
                "survivor_quality"
            ),
            (
                (F.max("q_micro") - F.min("q_micro")).cast("double")
                / F.lit(1_000_000)
            ).alias("quality_spread"),
        )
        .where(F.col("group_size") >= 2)
    )


# ---------------------------------------------------------------------------
# Near-dup removal impact report: what deduplication actually SAVES.
# Removal set = every doc that loses at least one verified MinHash+LSH
# near-dup pair (survivor = smaller doc_id, the pair contract above);
# the report is one row - corpus size, docs removed, chars/tokens
# removed, and the char share - the number a curation run publishes to
# justify itself (and the capacity-planning input for the next stage).
#
# The oracle WRAPS the minhash_lsh_near_dup oracle verbatim as a
# subquery, so the impact numbers are proven against the exact pair set
# the pair query itself is audited on - one contract, two views.
#
# Scale notes (100 TB): the pair pipeline is the audited sub-quadratic
# banding path; the removal set is a distinct on the loser column, the
# stats one semi-join-shaped aggregation over documents (doc_id-keyed),
# and the output is a single row. Nothing new shuffles the corpus.
def _impact_oracle() -> str:
    from ..registry import ORACLES

    return f"""
    WITH pairs AS ({{pair_oracle}}),
    removed AS (SELECT DISTINCT doc_b AS doc_id FROM pairs),
    d AS (
        SELECT doc_id, n_chars, len({_OT}) AS n_toks,
               doc_id IN (SELECT doc_id FROM removed) AS is_removed
        FROM documents
    )
    SELECT CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(*) FILTER (is_removed) AS BIGINT) AS n_removed,
           CAST(coalesce(sum(n_chars) FILTER (is_removed), 0) AS BIGINT)
               AS removed_chars,
           CAST(coalesce(sum(n_toks) FILTER (is_removed), 0) AS BIGINT)
               AS removed_tokens,
           CAST(CAST(coalesce(sum(n_chars) FILTER (is_removed), 0) AS VARCHAR) AS DOUBLE)
               / CAST(CAST(sum(n_chars) AS VARCHAR) AS DOUBLE) AS removed_char_share
    FROM d
    """


@query("near_dup_removal_impact", oracle="__PLACEHOLDER_IMPACT__")
def near_dup_removal_impact(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = _minhash_pairs(_shingle_base(spark, sf_dir))
    removed = pairs.select(F.col("doc_b").alias("doc_id")).distinct()
    toks = "filter(split(lower(text), '[^a-z0-9]+'), x -> x != '')"
    d = (
        load_table(spark, sf_dir, "documents")
        .select(
            "doc_id", "n_chars", F.size(F.expr(toks)).alias("n_toks")
        )
        .join(
            removed.withColumn("is_removed", F.lit(True)), "doc_id", "left"
        )
        .select(
            "n_chars",
            "n_toks",
            F.coalesce("is_removed", F.lit(False)).alias("is_removed"),
        )
    )
    rem = F.when(F.col("is_removed"), 1).otherwise(0)
    return d.agg(
        F.count("*").alias("n_docs"),
        F.sum(rem).cast("bigint").alias("n_removed"),
        F.coalesce(
            F.sum(F.when(F.col("is_removed"), F.col("n_chars"))), F.lit(0)
        )
        .cast("bigint")
        .alias("removed_chars"),
        F.coalesce(
            F.sum(F.when(F.col("is_removed"), F.col("n_toks"))), F.lit(0)
        )
        .cast("bigint")
        .alias("removed_tokens"),
        (
            F.coalesce(
                F.sum(F.when(F.col("is_removed"), F.col("n_chars"))),
                F.lit(0),
            ).cast("double")
            / F.sum("n_chars").cast("double")
        ).alias("removed_char_share"),
    )


# resolve the impact oracle now that the registry holds the pair oracle
from ..registry import ORACLES as _DD_ORACLES  # noqa: E402

_DD_ORACLES["near_dup_removal_impact"] = _impact_oracle().format(
    pair_oracle=_DD_ORACLES["minhash_lsh_near_dup"]
)
