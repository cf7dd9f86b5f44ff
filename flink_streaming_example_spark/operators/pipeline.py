"""End-to-end LLM training-data pipeline (the composed use-case all
the §2.9 operators exist for): quality filter -> exact dedup ->
near-dup cluster dedup -> corpus stats, as ONE oracle-checked query.

Stage order matters and is mirrored exactly in the oracle:
1. quality gate: keep docs with >= 30 whitespace tokens;
2. exact dedup: min-doc_id survivor per normalized text;
3. near-dup dedup over the SURVIVORS: 5-gram Jaccard >= 0.4 pairs
   (prefix-blocked), connected components, keep each component's min
   doc_id (transitively-correct survivor election — cc_min_labels);
4. report the cleaned corpus per language.

Scale shape: stages 1-2 are scan + one windowed shuffle; stage 3 is
the blocked pair join + O(diameter) label-propagation rounds over the
(tiny) edge set; stage 4 is a partial+final aggregate.  Nothing is
all-pairs, nothing collects to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flink_streaming_example_spark.operators.dedup import (
    _ngram_pairs_from,
    cc_min_labels,
)
from flink_streaming_example_spark.plans.registry import register
from flink_streaming_example_spark.sources.tables import load_table

_MIN_TOKENS = 30

_CLEAN_CORPUS_ORACLE = f"""
WITH RECURSIVE quality AS (
  SELECT doc_id, text, lang
  FROM documents
  WHERE len(string_split(text, ' ')) >= {_MIN_TOKENS}
), exact_survivors AS (
  SELECT doc_id, text, lang FROM (
    SELECT *, ROW_NUMBER() OVER (
      PARTITION BY lower(trim(text)) ORDER BY doc_id
    ) AS rn
    FROM quality
  ) WHERE rn = 1
), sh AS (
  SELECT doc_id, substring(text, 1, 40) AS block,
    list_distinct([substring(text, i, 5)
                   FOR i IN range(1, greatest(length(text) - 3, 2))]) AS shingles
  FROM exact_survivors
), pairs AS (
  SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b
  FROM sh a JOIN sh b ON a.block = b.block AND a.doc_id < b.doc_id
  WHERE (CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
         / len(list_distinct(list_concat(a.shingles, b.shingles)))) >= 0.4
), und AS (
  SELECT doc_id_a AS src, doc_id_b AS dst FROM pairs
  UNION ALL
  SELECT doc_id_b AS src, doc_id_a AS dst FROM pairs
), reach(src, dst) AS (
  SELECT src, src FROM (SELECT DISTINCT src FROM und)
  UNION
  SELECT r.src, u.dst FROM reach r JOIN und u ON r.dst = u.src
), labels AS (
  SELECT src AS doc_id, MIN(dst) AS cluster_id FROM reach GROUP BY src
), clean AS (
  SELECT s.doc_id, s.text, s.lang
  FROM exact_survivors s LEFT JOIN labels l ON s.doc_id = l.doc_id
  WHERE l.doc_id IS NULL OR l.cluster_id = s.doc_id
)
SELECT
  lang,
  COUNT(*) AS n_docs,
  CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
  MIN(doc_id) AS first_doc
FROM clean
GROUP BY lang
"""


@register(
    "q_clean_corpus", oracle=_CLEAN_CORPUS_ORACLE, tags=("pipeline", "flagship")
)
def q_clean_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed pipeline (module docstring) — every stage is an
    operator that also has its own standalone oracle-checked key."""
    docs = load_table(spark, sf_dir, "documents")
    quality = docs.filter(
        F.size(F.split(F.col("text"), " ")) >= _MIN_TOKENS
    ).select("doc_id", "text", "lang")

    w = Window.partitionBy(F.lower(F.trim(F.col("text")))).orderBy("doc_id")
    exact_survivors = (
        quality.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
        .persist()
    )

    edges = _ngram_pairs_from(exact_survivors).select("doc_id_a", "doc_id_b")
    labels = cc_min_labels(edges)
    clean = exact_survivors.join(labels, "doc_id", "left").filter(
        F.col("cluster_id").isNull()
        | (F.col("cluster_id") == F.col("doc_id"))
    )

    return clean.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(F.split(F.col("text"), " "))).cast("long").alias(
            "total_tokens"
        ),
        F.min("doc_id").alias("first_doc"),
    )


# -------------------------------------------------------- training mix
# The OTHER composed use-case (round 7): assemble an actual training
# shard from the cleaned corpus — the sequence of decisions a
# pretraining data pipeline runs after cleaning.  Stage order is the
# production order and is mirrored exactly in the oracle:
# 1. quality gate (>= 30 tokens — same rule as q_clean_corpus);
# 2. exact dedup: min-doc_id survivor per normalized text;
# 3. TRAIN split: md5(doc_id) mod 100 < 80 (the leakage-free
#    content-hash rule of q_sample_hash — eval/val docs can never
#    drift into the shard);
# 4. per-language cap: bottom-50 by md5 order (q_stratified_sample's
#    bottom-k rule — balances the mix without rate guessing);
# 5. sequence packing at a 512-token budget per language
#    (q_pack_sequences' exclusive-cumsum rule);
# 6. report per (lang, pack): docs + tokens.
# Every stage is a pure function of the rows, so the whole shard
# recipe is reproducible and the composition is hash-checkable.
_MIX_CAP = 50
_MIX_BUDGET = 512

_TRAINING_MIX_ORACLE = f"""
WITH quality AS (
  SELECT doc_id, text, lang
  FROM documents
  WHERE len(string_split(text, ' ')) >= {_MIN_TOKENS}
), survivors AS (
  SELECT doc_id, text, lang FROM (
    SELECT *, ROW_NUMBER() OVER (
      PARTITION BY lower(trim(text)) ORDER BY doc_id
    ) AS rn
    FROM quality
  ) WHERE rn = 1
), train AS (
  SELECT * FROM survivors
  WHERE CAST(CONCAT('0x', substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))
        AS BIGINT) % 100 < 80
), capped AS (
  SELECT doc_id, lang, len(string_split(text, ' ')) AS n_tokens FROM (
    SELECT *, ROW_NUMBER() OVER (
      PARTITION BY lang
      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
    ) AS krn
    FROM train
  ) WHERE krn <= {_MIX_CAP}
), packed AS (
  SELECT lang, n_tokens,
    CAST(FLOOR((SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens)
        / {_MIX_BUDGET}.0) AS BIGINT) AS pack_id
  FROM capped
)
SELECT lang, pack_id, COUNT(*) AS n_docs,
  CAST(SUM(n_tokens) AS BIGINT) AS pack_tokens
FROM packed
GROUP BY lang, pack_id
"""


def split_cap_pack_report(survivors: DataFrame) -> DataFrame:
    """Stages 3-6 of the shard recipe over exact-deduped survivors
    (doc_id, lang, n_tokens): content-hash train split -> per-language
    bottom-{_MIX_CAP} cap -> {_MIX_BUDGET}-token packing -> per
    (lang, pack) report.  THE single implementation — q_training_mix
    applies it after its in-query dedup, q_streaming_training_mix
    after draining the upsert dedup state, so the two keys' shard
    rule cannot drift (the round-7 OHLC multiplier lesson, applied
    preemptively)."""
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long")
        % 100
    )
    train = survivors.where(bucket < 80)
    w_cap = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    capped = (
        train.withColumn("krn", F.row_number().over(w_cap))
        .where(F.col("krn") <= _MIX_CAP)
        .select("doc_id", "lang", "n_tokens")
    )
    w_pack = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    pack_id = F.floor(
        (F.sum("n_tokens").over(w_pack) - F.col("n_tokens"))
        / float(_MIX_BUDGET)
    ).cast("long")
    return (
        capped.withColumn("pack_id", pack_id)
        .groupBy("lang", "pack_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("pack_tokens"),
        )
    )


# keep the docstring's constants in sync (plain string otherwise —
# round-8 advisor)
split_cap_pack_report.__doc__ = (
    split_cap_pack_report.__doc__.replace("{_MIX_CAP}", str(_MIX_CAP))
    .replace("{_MIX_BUDGET}", str(_MIX_BUDGET))
)


@register("q_training_mix", oracle=_TRAINING_MIX_ORACLE, tags=("llm", "pipeline"))
def q_training_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed shard assembly (block comment above): quality gate ->
    exact dedup -> content-hash train split -> per-language bottom-k
    cap -> 512-token sequence packing -> per-pack report, each stage
    the same rule as its standalone key.  Scale shape: one windowed
    shuffle per keyed stage (dedup survivor, cap, pack cumsum), all
    partitioned by text-hash or language — nothing driver-side,
    nothing all-pairs."""
    docs = load_table(spark, sf_dir, "documents")
    quality = docs.where(
        F.size(F.split(F.col("text"), " ")) >= _MIN_TOKENS
    )
    w_dedup = Window.partitionBy(F.lower(F.trim(F.col("text")))).orderBy(
        "doc_id"
    )
    survivors = (
        quality.withColumn("rn", F.row_number().over(w_dedup))
        .where(F.col("rn") == 1)
        .select(
            "doc_id",
            "lang",
            F.size(F.split(F.col("text"), " ")).alias("n_tokens"),
        )
    )
    return split_cap_pack_report(survivors)
