"""Deduplication for LLM data pipelines (SURVEY.md §2.9 L1-L2 and the
BASELINE mandate): exact, MinHash+LSH, n-gram Jaccard, SimHash, and
embedding-cosine near-dup.

Determinism: survivors are always chosen by explicit order
(row_number()=1 over doc_id, or min(doc_id)), never dropDuplicates'
first-seen row.  Pair outputs are canonicalized (id_a < id_b).

Scale notes (100 TB):
- Exact dedup partitions by the normalized content key — here the
  normalized text itself (oracle-mirrorable); in production, partition
  by xxhash64(text) so the shuffle carries 8-byte keys instead of
  documents (hash first, compare text only within a hash bucket).
- Near-dup never goes all-pairs: MinHashLSH buckets by band signature
  (approxSimilarityJoin joins on shared hash buckets), and the n-gram
  Jaccard path blocks on a 40-char prefix fingerprint before computing
  any pairwise similarity.  The greedy min-id survivor rule is exact
  for the fixture's small clusters; transitive mega-clusters need an
  iterative connected-components pass (large-star/small-star) before
  survivor election — documented, not built, as fixtures cannot
  exercise it.
- SimHash is the constant-cost alternative: one 32/64-bit signature
  per doc (single aggregation), near-dups found by hamming distance on
  rotated-signature sort keys instead of pair joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_streaming_example_spark.plans.registry import register
from flink_streaming_example_spark.sources.tables import load_table

_DEDUP_EXACT_ORACLE = """
SELECT doc_id, lang, source, CAST(n_copies AS BIGINT) AS n_copies
FROM (
  SELECT doc_id, lang, source,
    COUNT(*) OVER (PARTITION BY lower(trim(text))) AS n_copies,
    ROW_NUMBER() OVER (PARTITION BY lower(trim(text)) ORDER BY doc_id) AS rn
  FROM documents
)
WHERE rn = 1
"""


@register("q_dedup_exact", oracle=_DEDUP_EXACT_ORACLE, tags=("dedup",))
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L1: exact dedup — deterministic min-doc_id survivor per
    normalized-text group (see module docstring for the xxhash64
    partitioning swap at scale)."""
    docs = load_table(spark, sf_dir, "documents")
    from pyspark.sql import Window

    key = F.lower(F.trim(F.col("text")))
    w = Window.partitionBy(key)
    w_rn = w.orderBy("doc_id")
    return (
        docs.select(
            "doc_id",
            "lang",
            "source",
            F.count(F.lit(1)).over(w).alias("n_copies"),
            F.row_number().over(w_rn).alias("rn"),
        )
        .filter(F.col("rn") == 1)
        .select("doc_id", "lang", "source", "n_copies")
    )


@register("q_dedup_near", oracle=None, tags=("dedup", "python", "approx"))
def q_dedup_near(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2: near-dup dedup via MinHash + LSH (rows-only: the LSH
    signature is pseudo-random, not SQL-expressible).

    Pipeline: 5-char shingles (token-set Jaccard saturates on the
    31-word fixture vocab — SURVEY §2.9) -> binary HashingTF ->
    MinHashLSH.approxSimilarityJoin at Jaccard distance <= 0.6 ->
    greedy min-id survivor over the similarity edges.  The LSH join is
    bucketed (band-signature equi-join), never all-pairs — the 100 TB
    path; seed pinned for reproducibility."""
    from pyspark.ml.feature import HashingTF, MinHashLSH

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    shingled = docs.select(
        "doc_id",
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.greatest(F.length("text") - 4, F.lit(1))),
                lambda i: F.col("text").substr(i, F.lit(5)),
            )
        ).alias("shingles"),
    ).filter(F.size("shingles") > 0)
    tf = HashingTF(
        inputCol="shingles", outputCol="features", numFeatures=1 << 18, binary=True
    )
    feats = tf.transform(shingled)
    lsh = MinHashLSH(inputCol="features", outputCol="sig", numHashTables=6, seed=42)
    model = lsh.fit(feats)
    pairs = (
        model.approxSimilarityJoin(feats, feats, 0.6, distCol="jaccard_dist")
        .select(
            F.col("datasetA.doc_id").alias("id_a"),
            F.col("datasetB.doc_id").alias("id_b"),
        )
        .filter(F.col("id_a") < F.col("id_b"))
    )
    # Greedy min-id survivor: drop any doc that has a near-dup edge to a
    # smaller id (exact for small clusters; see module docstring).
    dropped = pairs.select(F.col("id_b").alias("doc_id")).distinct()
    return docs.join(dropped, "doc_id", "left_anti").select("doc_id")


_NGRAM_ORACLE = """
WITH sh AS (
  SELECT
    doc_id,
    substring(text, 1, 40) AS block,
    list_distinct([substring(text, i, 5)
                   FOR i IN range(1, greatest(length(text) - 3, 2))]) AS shingles
  FROM documents
)
SELECT
  a.doc_id AS doc_id_a,
  b.doc_id AS doc_id_b,
  CAST(FLOOR(
    (CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
     / len(list_distinct(list_concat(a.shingles, b.shingles))))
    * 1000000.0 + 0.5) AS DOUBLE) / 1000000.0 AS jaccard
FROM sh a JOIN sh b ON a.block = b.block AND a.doc_id < b.doc_id
WHERE (CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
       / len(list_distinct(list_concat(a.shingles, b.shingles)))) >= 0.4
"""


@register("q_dedup_ngram", oracle=_NGRAM_ORACLE, tags=("dedup",))
def q_dedup_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2b: exact n-gram Jaccard near-dup pairs, prefix-blocked.

    Candidate generation is a 40-char-prefix equi-join (the blocked,
    shuffle-on-block-key plan — never all-pairs), then exact 5-gram
    Jaccard >= 0.4 within each block.  Complements the probabilistic
    MinHash path with a verifiable exact one."""
    docs = load_table(spark, sf_dir, "documents")
    shingles = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.length("text") - 3 - 1, F.lit(1))),
            lambda i: F.col("text").substr(i, F.lit(5)),
        )
    )
    sh = docs.select(
        "doc_id",
        F.substring("text", 1, 40).alias("block"),
        shingles.alias("shingles"),
    )
    a = sh.select(
        F.col("doc_id").alias("doc_id_a"),
        F.col("block"),
        F.col("shingles").alias("sh_a"),
    )
    b = sh.select(
        F.col("doc_id").alias("doc_id_b"),
        F.col("block").alias("block_b"),
        F.col("shingles").alias("sh_b"),
    )
    jac = F.size(F.array_intersect("sh_a", "sh_b")).cast("double") / F.size(
        F.array_distinct(F.concat("sh_a", "sh_b"))
    )
    return (
        a.join(
            b,
            (a.block == b.block_b) & (a.doc_id_a < b.doc_id_b),
        )
        .withColumn("jac_raw", jac)
        .filter(F.col("jac_raw") >= 0.4)
        .select(
            "doc_id_a",
            "doc_id_b",
            (
                F.floor(F.col("jac_raw") * F.lit(1000000.0) + F.lit(0.5)).cast(
                    "double"
                )
                / F.lit(1000000.0)
            ).alias("jaccard"),
        )
    )


def _simhash_bits() -> int:
    return 32


def _simhash_oracle() -> str:
    """Generate the 32-term majority-vote SQL (mirrors the Spark expr)."""
    bits = _simhash_bits()
    terms = [
        f"CAST(SUM(CASE WHEN (h // {1 << i}) % 2 = 1 THEN 1 ELSE -1 END) > 0"
        f" AS BIGINT) * {1 << i}"
        for i in range(bits)
    ]
    plus = "\n      + ".join(terms)
    return f"""
WITH tok AS (
  SELECT DISTINCT doc_id, unnest(string_split(lower(text), ' ')) AS token
  FROM documents
), hashed AS (
  SELECT doc_id,
         CAST(CONCAT('0x', substring(md5(token), 1, 8)) AS BIGINT) AS h
  FROM tok
)
SELECT doc_id,
       {plus} AS simhash
FROM hashed
GROUP BY doc_id
"""


@register("q_dedup_simhash", oracle=_simhash_oracle(), tags=("dedup",))
def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2c: SimHash document signatures — 32-bit bitwise majority vote
    over md5-derived token hashes (identical digests in both engines
    make the signature oracle-checkable).  Near-dups are then found by
    signature hamming distance — constant state per doc, no pair join;
    the signature aggregation is one partial+final hash agg."""
    docs = load_table(spark, sf_dir, "documents")
    bits = _simhash_bits()
    tok = docs.select(
        "doc_id", F.explode(F.split(F.lower(F.col("text")), " ")).alias("token")
    ).distinct()
    h = F.conv(F.substring(F.md5("token"), 1, 8), 16, 10).cast("long")
    hashed = tok.select("doc_id", h.alias("h"))
    bit_terms = [
        (
            F.sum(
                F.when(
                    (F.col("h").bitwiseAND(F.lit(1 << i))) != 0, F.lit(1)
                ).otherwise(F.lit(-1))
            )
            > 0
        )
        .cast("long")
        * F.lit(1 << i)
        for i in range(bits)
    ]
    simhash = bit_terms[0]
    for t in bit_terms[1:]:
        simhash = simhash + t
    return hashed.groupBy("doc_id").agg(simhash.alias("simhash"))


_EMBED_NEAR_ORACLE = """
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
), n AS (
  SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e
)
SELECT
  a.vec_id AS vec_id_a,
  b.vec_id AS vec_id_b,
  CAST(FLOOR(
    (list_dot_product(a.v, b.v) / (a.nrm * b.nrm)) * 10000.0 + 0.5
  ) AS DOUBLE) / 10000.0 AS cos_sim
FROM n a JOIN n b ON a.vec_id < b.vec_id
WHERE list_dot_product(a.v, b.v) / (a.nrm * b.nrm) >= 0.45
"""


@register("q_embed_near_dup", oracle=_EMBED_NEAR_ORACLE, tags=("dedup",))
def q_embed_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2d: embedding-cosine near-dup pairs (threshold 0.45 — the
    fixture's max off-diagonal cosine is ~0.51, so the band is small
    and non-empty).  Committed exact path is the O(n^2) self-join —
    acceptable for a bounded dedup corpus; at 100 TB pre-bucket with
    random-hyperplane LSH (BucketedRandomProjectionLSH) and join only
    within buckets, same pair predicate."""
    emb = load_table(spark, sf_dir, "embeddings")
    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    dot_self = F.aggregate(
        F.zip_with(F.col("v"), F.col("v"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    e = emb.select(F.col("vec_id"), v.alias("v")).withColumn(
        "nrm", F.sqrt(dot_self)
    )
    a = e.select(
        F.col("vec_id").alias("vec_id_a"),
        F.col("v").alias("va"),
        F.col("nrm").alias("na"),
    )
    b = e.select(
        F.col("vec_id").alias("vec_id_b"),
        F.col("v").alias("vb"),
        F.col("nrm").alias("nb"),
    )
    dot_ab = F.aggregate(
        F.zip_with("va", "vb", lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    cos = dot_ab / (F.col("na") * F.col("nb"))
    return (
        a.join(b, F.col("vec_id_a") < F.col("vec_id_b"))
        .withColumn("cos_raw", cos)
        .filter(F.col("cos_raw") >= 0.45)
        .select(
            "vec_id_a",
            "vec_id_b",
            (
                F.floor(F.col("cos_raw") * F.lit(10000.0) + F.lit(0.5)).cast(
                    "double"
                )
                / F.lit(10000.0)
            ).alias("cos_sim"),
        )
    )
