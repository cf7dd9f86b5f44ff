"""Reproducible sampling and sequence packing for training-data
pipelines (SURVEY.md §2.9 mandate, beyond the reference surface).

Random-seed sampling is NOT reproducible across engines, partitionings
or reruns; content-hash bucketing is: bucket = md5(doc_id) mod 100, a
pure function of the row.  The same rule assigns train/val/test splits
so a document can never migrate between splits when the corpus grows —
the property LLM data pipelines actually need (leakage-free splits),
and md5 is the one digest Spark and DuckDB share bit-for-bit, so it is
fully oracle-checkable.

Packing assigns documents to fixed-token-budget training sequences via
an exclusive running sum per language shard — a single window cumsum,
no sequential driver loop; docs may straddle a boundary (the
streaming-append packing used when sequences are concatenated and
re-chunked downstream).  Strict no-straddle greedy packing is
order-sequential (non-associative) and would serialize the corpus; the
cumsum form is the scalable choice and is exactly mirrorable in SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_streaming_example_spark.plans.registry import register
from flink_streaming_example_spark.sources.tables import load_table

_PACK_BUDGET = 512

_SAMPLE_ORACLE = """
WITH bucketed AS (
  SELECT doc_id, lang,
    CAST(CONCAT('0x', substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))
         AS BIGINT) % 100 AS bucket
  FROM documents
), labeled AS (
  SELECT lang,
    CASE WHEN bucket < 80 THEN 'train'
         WHEN bucket < 90 THEN 'val'
         ELSE 'test' END AS split
  FROM bucketed
)
SELECT lang, split, COUNT(*) AS n_docs
FROM labeled
GROUP BY lang, split
"""


@register("q_sample_hash", oracle=_SAMPLE_ORACLE, tags=("sampling", "llm"))
def q_sample_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic content-hash train/val/test split (80/10/10 by
    md5(doc_id) mod 100) — reproducible across engines, partitionings
    and corpus growth, unlike seeded random sampling (module
    docstring).  Output is the per-language split distribution."""
    docs = load_table(spark, sf_dir, "documents")
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long")
        % 100
    )
    split = (
        F.when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test")
    )
    return (
        docs.select("lang", split.alias("split"))
        .groupBy("lang", "split")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


_PACK_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, lang, len(string_split(text, ' ')) AS n_tokens
  FROM documents
), packed AS (
  SELECT doc_id, lang, n_tokens,
    CAST(FLOOR((SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens)
        / {_PACK_BUDGET}.0) AS BIGINT) AS pack_id
  FROM toks
)
SELECT lang, pack_id, COUNT(*) AS n_docs,
  CAST(SUM(n_tokens) AS BIGINT) AS pack_tokens
FROM packed
GROUP BY lang, pack_id
"""


@register("q_pack_sequences", oracle=_PACK_ORACLE, tags=("sampling", "llm"))
def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing: documents assigned to fixed-budget (512
    token) training sequences per language shard via an exclusive running
    token sum (one window cumsum — parallel across shards, ordered by
    doc_id within; module docstring explains the straddle trade-off
    vs sequential greedy packing).  Output is per-pack document and
    token counts."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        "lang",
        F.size(F.split(F.col("text"), " ")).alias("n_tokens"),
    )
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    pack_id = F.floor(
        (F.sum("n_tokens").over(w) - F.col("n_tokens")) / float(_PACK_BUDGET)
    ).cast("long")
    return (
        toks.withColumn("pack_id", pack_id)
        .groupBy("lang", "pack_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("pack_tokens"),
        )
    )


# Weighted Bernoulli sampling: include a document with probability
# proportional to its weight (here n_chars, capped at _WEIGHT_CAP so a
# single giant document cannot exceed probability 1).  The coin flip is
# the same engine-portable md5 integer hash as q_sample_hash — include
# iff hash(doc_id) mod CAP < min(weight, CAP) — so the sample is a
# pure function of the row: reproducible across engines, partitionings
# and reruns, and integer-exact (no float RNG, nothing to drift).
# This is the importance-sampling primitive LLM pipelines use to
# up-weight long / high-quality documents without a shuffle: the
# filter is row-local and runs inside the scan's codegen stage.
_WEIGHT_CAP = 600

_WEIGHTED_ORACLE = f"""
SELECT doc_id, lang, n_chars
FROM documents
WHERE CAST(CONCAT('0x', substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))
      AS BIGINT) % {_WEIGHT_CAP}
    < LEAST(n_chars, {_WEIGHT_CAP})
"""


@register("q_weighted_sample", oracle=_WEIGHTED_ORACLE, tags=("sampling", "llm"))
def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-weighted Bernoulli sample: keep each document with
    probability min(n_chars, 600)/600 via the deterministic md5 coin
    (comment above) — row-local, shuffle-free, reproducible.  Output
    is the sampled rows themselves so the selection is hash-checked
    row-for-row, not just in aggregate."""
    docs = load_table(spark, sf_dir, "documents")
    coin = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long")
        % _WEIGHT_CAP
    )
    return docs.where(
        coin < F.least(F.col("n_chars"), F.lit(_WEIGHT_CAP))
    ).select("doc_id", "lang", "n_chars")


# Stratified fixed-size sampling: exactly k documents per stratum,
# chosen as the k SMALLEST md5 hashes within the stratum — the
# deterministic analogue of per-stratum reservoir sampling (bottom-k
# hash sketches).  Unlike rate-based sampling (q_domain_mix) the
# output size per stratum is exact, and unlike seeded randomness the
# choice is a pure row function: stable under reruns, partitioning,
# and corpus growth restricted to k-set turnover (a new doc enters a
# stratum's sample only by hashing below its current k-th smallest —
# the bottom-k mergeability that makes this the distributed-sampling
# primitive: partial bottom-k per partition, merge, keep k).
_STRAT_K = 10

_STRAT_ORACLE = f"""
SELECT lang, doc_id, CAST(rn AS BIGINT) AS rn
FROM (
  SELECT lang, doc_id,
    ROW_NUMBER() OVER (
      PARTITION BY lang
      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
    ) AS rn
  FROM documents
)
WHERE rn <= {_STRAT_K}
"""


@register("q_stratified_sample", oracle=_STRAT_ORACLE, tags=("sampling", "llm"))
def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-k-per-stratum sample (k=10 per language) via bottom-k
    md5 order (comment above) — the balanced-subsample primitive for
    eval-set construction and per-domain inspection.  One shuffle by
    stratum; at scale the window becomes partial bottom-k per
    partition + merge (same result, mergeable sketch shape)."""
    docs = load_table(spark, sf_dir, "documents")
    from pyspark.sql import Window

    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    return (
        docs.select("lang", "doc_id", F.row_number().over(w).alias("rn"))
        .where(F.col("rn") <= _STRAT_K)
        .select("lang", "doc_id", F.col("rn").cast("long").alias("rn"))
    )


# Negative-pair sampling for contrastive training: each anchor document
# gets K pseudo-random partners, chosen by a deterministic hash offset
# so the pairing is reproducible (same property argument as the
# weighted sample above) and never self-pairing: offset = 1 +
# md5(doc_id:j) mod (N-1) lands in [1, N-1], so (doc_id + offset)
# mod N != doc_id.  doc_ids are contiguous 0..N-1 in the fixture; for
# sparse id spaces, rank ids first (one window) and apply the same
# arithmetic to the ranks.  Scale shape: the partner fetch is a plain
# equi-join on the computed id — hash-partitioned, no skew (offsets
# are uniform), no broadcast needed on either side.
_NEG_K = 3

_NEG_ORACLE = f"""
WITH n AS (SELECT COUNT(*) AS n_docs FROM documents),
anchors AS (
  SELECT d.doc_id, d.source, j.j,
    (d.doc_id + 1 + CAST(CONCAT('0x', substring(
        md5(CAST(d.doc_id AS VARCHAR) || ':' || CAST(j.j AS VARCHAR)),
        1, 8)) AS BIGINT) % (n.n_docs - 1)) % n.n_docs AS neg_id
  FROM documents d, (SELECT unnest(range(1, {_NEG_K + 1})) AS j) j, n
)
SELECT a.doc_id, CAST(a.j AS BIGINT) AS j, a.neg_id,
  CAST(a.source <> b.source AS INTEGER) AS cross_source
FROM anchors a JOIN documents b ON b.doc_id = a.neg_id
"""


@register("q_negative_pairs", oracle=_NEG_ORACLE, tags=("sampling", "llm"))
def q_negative_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic negative sampling: K=3 hash-chosen partner docs
    per anchor, never self, reproducible across engines and reruns
    (comment above), labeled with whether the pair crosses sources —
    the contrastive-pair generation step of an embedding-training
    pipeline.  One row-local offset computation + one equi-join."""
    docs = load_table(spark, sf_dir, "documents")
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    anchors = (
        docs.select("doc_id", "source")
        .join(F.broadcast(n), how="cross")
        .select(
            "doc_id",
            "source",
            "n_docs",
            F.explode(
                F.array(*[F.lit(j) for j in range(1, _NEG_K + 1)])
            ).alias("j"),
        )
    )
    offset = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("doc_id").cast("string"),
                        F.lit(":"),
                        F.col("j").cast("string"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % (F.col("n_docs") - 1)
        + 1
    )
    pairs = anchors.select(
        "doc_id",
        "source",
        F.col("j").cast("long").alias("j"),
        ((F.col("doc_id") + offset) % F.col("n_docs")).alias("neg_id"),
    )
    partners = docs.select(
        F.col("doc_id").alias("neg_id"), F.col("source").alias("b_source")
    )
    return pairs.join(partners, "neg_id").select(
        "doc_id",
        "j",
        "neg_id",
        (F.col("source") != F.col("b_source")).cast("int").alias(
            "cross_source"
        ),
    )


_IMPORTANCE_ORACLE = """
WITH lc AS (
  SELECT lang, COUNT(*) AS n_lang FROM documents GROUP BY lang
), t AS (
  SELECT CAST(SUM(n_lang) AS BIGINT) AS n_total,
         CAST(COUNT(*) AS BIGINT) AS n_langs
  FROM lc
), thr AS (
  SELECT lang, n_lang,
         LEAST(1000, (1000 * n_total) // (n_langs * n_lang))
           AS thr_permille
  FROM lc, t
)
SELECT d.lang,
  CAST(MIN(thr.n_lang) AS BIGINT) AS n_docs,
  CAST(MIN(thr.thr_permille) AS BIGINT) AS thr_permille,
  CAST(COALESCE(SUM(CASE WHEN
        CAST(CONCAT('0x', substring(md5(CAST(d.doc_id AS VARCHAR)), 1, 8))
             AS BIGINT) % 1000 < thr.thr_permille
        THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_selected
FROM documents d JOIN thr ON d.lang = thr.lang
GROUP BY d.lang
"""


@register(
    "q_importance_sample",
    oracle=_IMPORTANCE_ORACLE,
    tags=("sampling", "llm"),
)
def q_importance_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Importance resampling to rebalance the corpus's language mix
    toward uniform (the DSIR recipe shape: weight = target share /
    empirical share, acceptance by a content-hash coin — deterministic
    where seeded Bernoulli sampling is not, SURVEY.md §2.9).  Each
    language's acceptance threshold is the integer permille
    min(1000, (1000 * n_total) DIV (n_langs * n_lang)): over-represented
    languages (en) are downsampled toward the uniform share,
    under-represented ones keep everything (weight capped at 1 — this
    is subsampling, not replication).  Plan: one tiny per-language agg,
    its grand total folded in and BROADCAST back onto the corpus (the
    dimension side is vocabulary-sized at any corpus scale), then a
    row-local md5 coin — no second full shuffle of the documents."""
    docs = load_table(spark, sf_dir, "documents")
    lc = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n_lang"))
    tot = lc.agg(
        F.sum("n_lang").alias("n_total"),
        F.count(F.lit(1)).alias("n_langs"),
    )
    thr = (
        lc.crossJoin(F.broadcast(tot))
        .select(
            "lang",
            "n_lang",
            F.least(
                F.lit(1000).cast("long"),
                F.expr("(1000 * n_total) DIV (n_langs * n_lang)"),
            ).alias("thr_permille"),
        )
    )
    coin = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long")
        % 1000
    )
    return (
        docs.join(F.broadcast(thr), "lang")
        .select(
            "lang",
            "n_lang",
            "thr_permille",
            (coin < F.col("thr_permille")).cast("int").alias("sel"),
        )
        .groupBy("lang")
        .agg(
            F.min("n_lang").cast("long").alias("n_docs"),
            F.min("thr_permille").cast("long").alias("thr_permille"),
            F.coalesce(F.sum("sel"), F.lit(0)).cast("long").alias("n_selected"),
        )
    )


# Class balancing: where q_stratified_sample keeps a FIXED k per
# stratum, the balanced-training-set op keeps min-class-size rows per
# class — the k is DATA-DEPENDENT, so the operator is two aggregates
# (class counts -> scalar min) plus the same bottom-k-hash selection,
# with the min broadcast to every row.
_BALANCE_ORACLE = """
WITH k AS (
  SELECT MIN(n) AS kk FROM (
    SELECT COUNT(*) AS n FROM documents GROUP BY lang
  )
), r AS (
  SELECT lang, doc_id, n_chars,
    ROW_NUMBER() OVER (
      PARTITION BY lang
      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
    ) AS rn
  FROM documents
)
SELECT lang,
  CAST(COUNT(*) AS BIGINT) AS n_kept,
  CAST(SUM(doc_id) AS BIGINT) AS id_checksum,
  CAST(SUM(n_chars) AS BIGINT) AS kept_chars
FROM r WHERE rn <= (SELECT kk FROM k)
GROUP BY lang
"""


@register("q_class_balance", oracle=_BALANCE_ORACLE, tags=("sampling", "llm"))
def q_class_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Balanced downsampling to the minority class — the class-balance
    pass before training on skewed labels: every language keeps
    exactly min-class-size documents, selected by the same
    reproducible bottom-k-md5 order as q_stratified_sample (content-
    deterministic, partition-order-free).  The per-class report emits
    the kept count (provably equal across classes), an id checksum
    and the kept character mass, so both the SELECTION and the
    balance property are hash-checked.  Scale: one shuffle by class
    for the ranking, one class-cardinality aggregate reduced to a
    broadcast scalar — the data-dependent k costs one extra tiny
    stage over the fixed-k primitive."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    kk = (
        docs.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(F.min("n").alias("kk"))
    )
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    r = docs.select(
        "lang", "doc_id", "n_chars", F.row_number().over(w).alias("rn")
    )
    return (
        r.crossJoin(F.broadcast(kk))
        .where(F.col("rn") <= F.col("kk"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.sum("doc_id").cast("long").alias("id_checksum"),
            F.sum("n_chars").cast("long").alias("kept_chars"),
        )
    )
