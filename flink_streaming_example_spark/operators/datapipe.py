"""Training-corpus curation operators beyond dedup/similarity
(SURVEY.md §2.9 mandate — the steps a production pretraining pipeline
runs between raw crawl and tokenizer):

- benchmark decontamination (q_decontaminate): n-gram overlap between
  the training pool and a held-out eval split, the standard guard
  against test-set leakage.  Gram matching is an equi-join on the
  gram (hashable to a 64-bit key at scale) with the eval side orders
  of magnitude smaller — a broadcast join at 100 TB, never all-pairs.
- domain mixing (q_domain_mix): per-domain downsampling to target
  rates via content-hash bucketing — the reweighting step that shapes
  the corpus mixture.  Hash-bucket sampling (not rand()) keeps the
  kept-set a pure function of the row: reproducible across engines,
  partitionings, reruns and corpus growth.
- pattern scrubbing (q_pattern_scrub): regex redaction of sensitive
  spans (email / phone patterns, plus a fixture-exercised demo
  pattern — the synthetic corpus contains no real PII, so the email
  and phone rules run for real but match zero spans; the demo rule
  proves the counting/replacement plumbing end-to-end).  Pure
  per-row expressions: no shuffle at all, trivially scales.
- repetition/quality gating (q_gopher_quality): the Gopher-style
  signal family — word count bounds, distinct-word ratio, top-word
  fraction, stopword fraction — computed via ONE explode+groupBy
  (a single shuffle keyed by doc_id; per-doc O(n^2) higher-order
  array scans were rejected as the interpreted slow path).

All four are exact-arithmetic (ints and int-ratio doubles) and fully
oracle-checkable in DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_streaming_example_spark.plans.registry import register
from flink_streaming_example_spark.sources.tables import load_table

# ~2% held-out eval split: md5 bucket >= _EVAL_BUCKET (same md5
# bucketing rule as sampling.q_sample_hash — a pure function of
# doc_id, so the eval membership is stable as the corpus grows).
_EVAL_BUCKET = 98

_DECON_ORACLE = f"""
WITH b AS (
  SELECT doc_id, source, lower(text) AS t,
    CAST(CONCAT('0x', substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))
         AS BIGINT) % 100 AS bucket
  FROM documents
), toks AS (
  SELECT doc_id, source, bucket, string_split(t, ' ') AS w FROM b
), grams AS (
  SELECT doc_id, source, bucket,
    w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS gram
  FROM toks, LATERAL (
    SELECT unnest(generate_series(1, len(w) - 2)) AS i
  ) g
), eval_grams AS (
  SELECT DISTINCT gram FROM grams WHERE bucket >= {_EVAL_BUCKET}
), train AS (
  SELECT doc_id, source FROM b WHERE bucket < {_EVAL_BUCKET}
), hits AS (
  SELECT DISTINCT g.doc_id, g.gram
  FROM grams g JOIN eval_grams e USING (gram)
  WHERE g.bucket < {_EVAL_BUCKET}
), per_doc AS (
  SELECT doc_id, COUNT(*) AS n_gram_hits FROM hits GROUP BY doc_id
)
SELECT t.source,
  COUNT(*) AS n_train,
  COUNT(p.doc_id) AS n_contaminated,
  CAST(COALESCE(SUM(p.n_gram_hits), 0) AS BIGINT) AS n_gram_hits
FROM train t LEFT JOIN per_doc p USING (doc_id)
GROUP BY t.source
"""


# Substring-level decontamination: token 3-grams (q_decontaminate)
# miss verbatim leaks that tokenize differently (punctuation drift,
# re-wrapped whitespace inside a window, partial-word boundaries), so
# the second standard pass matches fixed-width CHARACTER windows.
# Width 32, stride 8: striding the train side cuts the window blowup
# 8x and still guarantees detection of any shared run >= 39 chars
# (a full window must fit between two stride offsets: 32 + 8 - 1).
# The eval side is NOT strided — the guarantee needs every eval
# window of one side present.  At 100 TB the window join keys on the
# window md5 (8-byte prefix), never the raw text, and the distinct
# eval-window set stays broadcastable because the eval split is ~2%.
_SUB_W = 32
_SUB_STRIDE = 8

_DECON_SUB_ORACLE = f"""
WITH b AS (
  SELECT doc_id, source, lower(text) AS t,
    CAST(CONCAT('0x', substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))
         AS BIGINT) % 100 AS bucket
  FROM documents
  WHERE length(text) >= {_SUB_W}
), eval_w AS (
  SELECT DISTINCT md5(substring(t, i, {_SUB_W})) AS wh
  FROM b, LATERAL (
    SELECT unnest(generate_series(1, len(t) - {_SUB_W - 1})) AS i
  ) g
  WHERE bucket >= {_EVAL_BUCKET}
), train_w AS (
  SELECT doc_id, source, md5(substring(t, i, {_SUB_W})) AS wh
  FROM b, LATERAL (
    SELECT unnest(generate_series(1, len(t) - {_SUB_W - 1}, {_SUB_STRIDE}))
           AS i
  ) g
  WHERE bucket < {_EVAL_BUCKET}
), hits AS (
  SELECT DISTINCT t.doc_id, t.wh
  FROM train_w t JOIN eval_w e USING (wh)
), per_doc AS (
  SELECT doc_id, COUNT(*) AS n_window_hits FROM hits GROUP BY doc_id
), train AS (
  SELECT DISTINCT doc_id, source FROM b WHERE bucket < {_EVAL_BUCKET}
)
SELECT t.source,
  COUNT(*) AS n_train,
  COUNT(p.doc_id) AS n_contaminated,
  CAST(COALESCE(SUM(p.n_window_hits), 0) AS BIGINT) AS n_window_hits
FROM train t LEFT JOIN per_doc p USING (doc_id)
GROUP BY t.source
"""


@register(
    "q_decontaminate_substring", oracle=_DECON_SUB_ORACLE, tags=("llm", "datapipe")
)
def q_decontaminate_substring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination, substring pass: flag training
    documents sharing any 32-char window with the held-out eval split
    (md5 bucket >= 98) — catches verbatim leaks the token-3-gram rule
    misses (block comment above: stride-8 train windows, unstrided
    eval windows, >= 39-char shared runs guaranteed caught; join keys
    on window md5, never raw text)."""
    docs = load_table(spark, sf_dir, "documents").where(
        F.length("text") >= _SUB_W
    )
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long")
        % 100
    )
    base = docs.select(
        "doc_id",
        "source",
        bucket.alias("bucket"),
        F.lower(F.col("text")).alias("t"),
    )

    def windows(df, stride: int):
        return df.select(
            "doc_id",
            "source",
            F.explode(
                F.expr(
                    f"transform(sequence(1, length(t) - {_SUB_W - 1}, "
                    f"{stride}), i -> md5(substr(t, i, {_SUB_W})))"
                )
            ).alias("wh"),
        )

    eval_w = (
        windows(base.where(F.col("bucket") >= _EVAL_BUCKET), 1)
        .select("wh")
        .distinct()
    )
    train = base.where(F.col("bucket") < _EVAL_BUCKET)
    train_w = windows(train, _SUB_STRIDE)
    hits = (
        train_w.join(F.broadcast(eval_w), "wh")
        .select("doc_id", "wh")
        .distinct()
    )
    per_doc = hits.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_window_hits")
    )
    return (
        train.select("doc_id", "source")
        .join(per_doc, "doc_id", "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_train"),
            F.count("n_window_hits").alias("n_contaminated"),
            F.coalesce(F.sum("n_window_hits"), F.lit(0))
            .cast("long")
            .alias("n_window_hits"),
        )
    )


@register("q_decontaminate", oracle=_DECON_ORACLE, tags=("llm", "datapipe"))
def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag training documents sharing any
    word 3-gram with the held-out eval split (md5 bucket >= 98), the
    n-gram-overlap rule pretraining pipelines use against test-set
    leakage.  The distinct eval-gram set is tiny relative to the
    corpus and is broadcast into the gram join; per-source output is
    train size, contaminated count and total distinct gram hits."""
    docs = load_table(spark, sf_dir, "documents")
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long")
        % 100
    )
    toks = docs.select(
        "doc_id",
        "source",
        bucket.alias("bucket"),
        F.split(F.lower(F.col("text")), " ").alias("w"),
    )
    # Word 3-grams, 0-based F.get over a 0..n-3 index sequence (the
    # oracle's 1-based w[i]..w[i+2] shifted down by one).
    grams = toks.select(
        "doc_id",
        "source",
        "bucket",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.size("w") - 3),
                lambda i: F.concat_ws(
                    " ", F.get("w", i), F.get("w", i + 1), F.get("w", i + 2)
                ),
            )
        ).alias("gram"),
    )
    eval_grams = (
        grams.filter(F.col("bucket") >= _EVAL_BUCKET).select("gram").distinct()
    )
    hits = (
        grams.filter(F.col("bucket") < _EVAL_BUCKET)
        .join(F.broadcast(eval_grams), "gram")
        .select("doc_id", "gram")
        .distinct()
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_gram_hits"))
    )
    train = toks.filter(F.col("bucket") < _EVAL_BUCKET).select("doc_id", "source")
    return (
        train.join(hits, "doc_id", "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_train"),
            F.count("n_gram_hits").alias("n_contaminated"),
            F.coalesce(F.sum("n_gram_hits"), F.lit(0))
            .cast("long")
            .alias("n_gram_hits"),
        )
    )


_MIX_ORACLE = """
WITH rated AS (
  SELECT doc_id, source,
    CASE WHEN CAST(substring(source, 4) AS INTEGER) % 2 = 0
         THEN 50 ELSE 100 END AS rate,
    CAST(CONCAT('0x', substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))
         AS BIGINT) % 100 AS bucket
  FROM documents
)
SELECT source,
  COUNT(*) AS n_total,
  COUNT(CASE WHEN bucket < rate THEN 1 END) AS n_kept
FROM rated
GROUP BY source
"""


@register("q_domain_mix", oracle=_MIX_ORACLE, tags=("llm", "datapipe"))
def q_domain_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain mixing: downsample even-numbered sources to a 50% target
    rate (odd sources kept whole) by comparing the md5 doc_id bucket
    against the per-domain rate — deterministic stratified sampling
    with zero shuffle before the final count (module docstring: why
    hash buckets, not rand())."""
    docs = load_table(spark, sf_dir, "documents")
    rate = F.when(
        F.substring("source", 4, 10).cast("int") % 2 == 0, F.lit(50)
    ).otherwise(F.lit(100))
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long")
        % 100
    )
    return (
        docs.select("source", rate.alias("rate"), bucket.alias("bucket"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.count(F.when(F.col("bucket") < F.col("rate"), 1)).alias("n_kept"),
        )
    )


# Email/phone regexes restricted to syntax Java regex and RE2 share
# (char classes, bounded repeats, \b) so both engines compile the
# exact same automaton.
_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PHONE_RE = r"\+?[0-9][0-9() -]{6,}[0-9]"
_DEMO_RE = r"\b(customer|value)\b"

_SCRUB_ORACLE = f"""
SELECT doc_id,
  len(regexp_extract_all(text, '{_EMAIL_RE}')) AS n_email,
  len(regexp_extract_all(text, '{_PHONE_RE}')) AS n_phone,
  len(regexp_extract_all(text, '{_DEMO_RE}')) AS n_demo,
  md5(regexp_replace(regexp_replace(regexp_replace(text,
      '{_EMAIL_RE}', '<EMAIL>', 'g'),
      '{_PHONE_RE}', '<PHONE>', 'g'),
      '{_DEMO_RE}', '<ID>', 'g')) AS scrubbed_md5
FROM documents
"""


@register("q_pattern_scrub", oracle=_SCRUB_ORACLE, tags=("llm", "datapipe"))
def q_pattern_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII-style pattern scrubbing: count and redact email / phone /
    demo-pattern spans per document (module docstring: the synthetic
    corpus has no real PII, so the demo rule exercises the plumbing).
    Row-local expressions only — no shuffle; the md5 of the scrubbed
    text pins replacement semantics bit-for-bit against the oracle."""
    docs = load_table(spark, sf_dir, "documents")
    scrubbed = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("text"), _EMAIL_RE, "<EMAIL>"),
            _PHONE_RE,
            "<PHONE>",
        ),
        _DEMO_RE,
        "<ID>",
    )
    return docs.select(
        "doc_id",
        F.regexp_count("text", F.lit(_EMAIL_RE)).cast("long").alias("n_email"),
        F.regexp_count("text", F.lit(_PHONE_RE)).cast("long").alias("n_phone"),
        F.regexp_count("text", F.lit(_DEMO_RE)).cast("long").alias("n_demo"),
        F.md5(scrubbed).alias("scrubbed_md5"),
    )


_STOPWORDS = ("the", "a")

_GOPHER_ORACLE = f"""
WITH words AS (
  SELECT doc_id, source, unnest(string_split(lower(text), ' ')) AS word
  FROM documents
), wc AS (
  SELECT doc_id, source, word, COUNT(*) AS c
  FROM words GROUP BY doc_id, source, word
), sig AS (
  SELECT doc_id, source,
    CAST(SUM(c) AS BIGINT) AS n_words,
    COUNT(*) AS n_distinct,
    CAST(MAX(c) AS DOUBLE) / SUM(c) AS top_word_frac,
    CAST(COALESCE(SUM(CASE WHEN word IN {_STOPWORDS} THEN c END), 0)
         AS DOUBLE) / SUM(c) AS stopword_frac
  FROM wc GROUP BY doc_id, source
)
SELECT source,
  COUNT(*) AS n_docs,
  COUNT(CASE WHEN n_words BETWEEN 20 AND 100000
              AND CAST(n_distinct AS DOUBLE) / n_words >= 0.2
              AND top_word_frac <= 0.12
         THEN 1 END) AS n_pass
FROM sig
GROUP BY source
"""


@register("q_gopher_quality", oracle=_GOPHER_ORACLE, tags=("llm", "datapipe"))
def q_gopher_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition/quality gating: per-document word
    count, distinct-word ratio, top-word fraction and stopword
    fraction from one explode+groupBy(doc_id, word) shuffle, then a
    threshold gate (20 <= words <= 100k, distinct ratio >= 0.2,
    top-word fraction <= 0.12) aggregated per source.  Ratios are
    exact int-division doubles — deterministic, no float-sum order
    sensitivity."""
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(
        "doc_id",
        "source",
        F.explode(F.split(F.lower(F.col("text")), " ")).alias("word"),
    )
    wc = words.groupBy("doc_id", "source", "word").agg(
        F.count(F.lit(1)).alias("c")
    )
    sig = wc.groupBy("doc_id", "source").agg(
        F.sum("c").cast("long").alias("n_words"),
        F.count(F.lit(1)).alias("n_distinct"),
        (F.max("c").cast("double") / F.sum("c")).alias("top_word_frac"),
        (
            F.coalesce(
                F.sum(F.when(F.col("word").isin(*_STOPWORDS), F.col("c"))),
                F.lit(0),
            ).cast("double")
            / F.sum("c")
        ).alias("stopword_frac"),
    )
    passed = (
        F.col("n_words").between(20, 100000)
        & (F.col("n_distinct").cast("double") / F.col("n_words") >= 0.2)
        & (F.col("top_word_frac") <= 0.12)
    )
    return sig.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count(F.when(passed, 1)).alias("n_pass"),
    )


_BOILERPLATE_N = 5  # word n-gram width
_BOILERPLATE_MIN_DOCS = 3

_BOILERPLATE_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents
), grams AS (
  SELECT doc_id,
         unnest([array_to_string(t[i:i+{_BOILERPLATE_N - 1}], ' ')
                 FOR i IN range(1, len(t) - {_BOILERPLATE_N - 2})]) AS ngram
  FROM toks
  WHERE len(t) >= {_BOILERPLATE_N}
)
SELECT ngram,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
       CAST(COUNT(*) AS BIGINT) AS n_occurrences
FROM grams
GROUP BY ngram
HAVING COUNT(DISTINCT doc_id) >= {_BOILERPLATE_MIN_DOCS}
"""


@register("q_boilerplate_ngrams", oracle=_BOILERPLATE_ORACLE, tags=("datapipe",))
def q_boilerplate_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-internal boilerplate detection: word 5-grams shared by >= 3
    distinct docs — the signal behind template/boilerplate stripping
    (nav bars, license headers, injected near-dup prefixes) that
    line-level dedup does on newline-structured corpora.

    Spark side is the shuffle-free tail-zip (slice + arrays_zip, all
    codegen'd — same A/B-measured pattern as q_bigrams) exploded into
    ONE hash aggregate computing both the occurrence count and the
    distinct-doc count.  At 100 TB the aggregate is the only shuffle
    and partial aggregation collapses the per-partition duplicates
    first; the >= 3-docs filter is a HAVING on the aggregate, so
    nothing rescans."""
    n = _BOILERPLATE_N
    docs = load_table(spark, sf_dir, "documents")
    t = F.split(F.lower(F.col("text")), " ")
    width = F.size(t) - (n - 1)
    zipped = F.arrays_zip(*[F.slice(t, 1 + k, width) for k in range(n)])
    grams = (
        docs.filter(F.size(t) >= n)
        .select("doc_id", F.explode(zipped).alias("g"))
        .select(
            "doc_id",
            F.concat_ws(
                " ", *[F.col(f"g.{k}") for k in range(n)]
            ).alias("ngram"),
        )
    )
    return (
        grams.groupBy("ngram")
        .agg(
            F.count_distinct("doc_id").cast("long").alias("n_docs"),
            F.count(F.lit(1)).cast("long").alias("n_occurrences"),
        )
        .filter(F.col("n_docs") >= _BOILERPLATE_MIN_DOCS)
    )


_SOURCE_PROFILE_ORACLE = """
SELECT
  source,
  CAST(COUNT(*) AS BIGINT) AS n_docs,
  CAST(SUM(n_chars) AS BIGINT) AS total_chars,
  CAST(FLOOR(quantile_cont(n_chars, 0.5) * 1000000.0 + 0.5) AS DOUBLE)
    / 1000000.0 AS median_chars,
  CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
  CAST(MIN(doc_id) AS BIGINT) AS first_doc
FROM documents
GROUP BY source
"""


@register("q_source_profile", oracle=_SOURCE_PROFILE_ORACLE, tags=("datapipe",))
def q_source_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source corpus profile — the triage report a curation run
    starts from (which crawls/feeds dominate, how long their docs are,
    language spread): doc count, total/median chars, distinct langs.

    Exact linear-interpolated median via `percentile` (matches DuckDB
    quantile_cont; approx_percentile is the 100 TB swap and the reason
    the column is 1e-6-rounded).  One partial+final hash aggregate,
    grouped on the low-cardinality source key."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("total_chars"),
        (
            F.floor(
                F.percentile(F.col("n_chars"), F.lit(0.5)) * F.lit(1000000.0)
                + F.lit(0.5)
            ).cast("double")
            / F.lit(1000000.0)
        ).alias("median_chars"),
        F.count_distinct("lang").cast("long").alias("n_langs"),
        F.min("doc_id").cast("long").alias("first_doc"),
    )


# ---- RAG / context chunking (round 8): fixed token windows with
# overlap — the chunker every retrieval pipeline runs before
# embedding.  Window 32 tokens, stride 24 (8-token overlap carries
# boundary context); chunk starts are the arithmetic sequence
# 0, 24, 48, ... below n_tokens, so the last chunk may be short.
_CHUNK_W = 32
_CHUNK_STRIDE = 24

_CHUNK_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
)
SELECT doc_id,
  CAST(s // {_CHUNK_STRIDE} AS BIGINT) AS chunk_id,
  CAST(len(list_slice(t, s + 1, s + {_CHUNK_W})) AS BIGINT)
    AS n_chunk_tokens,
  md5(array_to_string(list_slice(t, s + 1, s + {_CHUNK_W}), ' '))
    AS chunk_md5
FROM (
  SELECT doc_id, t, unnest(range(0, len(t), {_CHUNK_STRIDE})) AS s
  FROM toks
)
"""


@register("q_chunk_documents", oracle=_CHUNK_ORACLE, tags=("llm", "datapipe"))
def q_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAG chunking (block comment above): one row per overlapping
    token window, with the chunk's md5 pinning the exact token span
    (an off-by-one in start, width, or overlap changes the digest).
    Row-local throughout — explode(sequence) + slice + array_join are
    codegen'd array natives, no shuffle at all: at 100 TB the chunker
    rides the scan and its output feeds the embedding UDF directly."""
    docs = load_table(spark, sf_dir, "documents")
    t = F.split(F.col("text"), " ")
    starts = F.sequence(
        F.lit(0), F.size(t) - F.lit(1), F.lit(_CHUNK_STRIDE)
    )
    return (
        docs.select("doc_id", t.alias("t"), F.explode(starts).alias("s"))
        .select(
            "doc_id",
            (F.col("s") / _CHUNK_STRIDE).cast("long").alias("chunk_id"),
            F.slice(F.col("t"), F.col("s") + 1, _CHUNK_W).alias("c"),
        )
        .select(
            "doc_id",
            "chunk_id",
            F.size("c").cast("long").alias("n_chunk_tokens"),
            F.md5(F.array_join("c", " ")).alias("chunk_md5"),
        )
    )


_K_ANON = 5
_K_ANON_BAND = 200

_K_ANON_ORACLE = f"""
WITH q AS (
  SELECT lang, source, n_chars // {_K_ANON_BAND} AS len_band,
    COUNT(*) AS grp_n
  FROM documents GROUP BY 1, 2, 3
)
SELECT lang, source,
  CAST(COUNT(*) AS BIGINT) AS n_classes,
  CAST(SUM(CASE WHEN grp_n < {_K_ANON} THEN 1 ELSE 0 END) AS BIGINT)
    AS n_violating,
  CAST(SUM(CASE WHEN grp_n < {_K_ANON} THEN grp_n ELSE 0 END) AS BIGINT)
    AS n_suppressed,
  CAST(SUM(CASE WHEN grp_n >= {_K_ANON} THEN grp_n ELSE 0 END) AS BIGINT)
    AS n_released,
  CAST(MIN(grp_n) AS BIGINT) AS min_class_size
FROM q GROUP BY lang, source
"""


@register("q_k_anonymity", oracle=_K_ANON_ORACLE, tags=("datapipe",))
def q_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit — the privacy gate a corpus release runs
    after PII scrubbing (q_pii_scrub removes direct identifiers; this
    key measures re-identification risk from QUASI-identifiers):
    documents are grouped into equivalence classes on (lang, source,
    banded length) and any class with fewer than k={_K_ANON} members
    is marked for suppression.  The per-(lang, source) report emits
    class counts, violating classes, suppressed vs released row
    counts, and the minimum class size (the k actually achieved).
    Scale: two hash aggregates, the second over class-cardinality
    rows — the suppression rule is then a broadcast-joinable class
    list, never a row-level shuffle of the corpus."""
    d = load_table(spark, sf_dir, "documents")
    q = d.groupBy(
        "lang",
        "source",
        F.expr(f"n_chars div {_K_ANON_BAND}").alias("len_band"),
    ).agg(F.count(F.lit(1)).alias("grp_n"))
    small = F.col("grp_n") < _K_ANON
    return q.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_classes"),
        F.sum(small.cast("long")).alias("n_violating"),
        F.sum(F.when(small, F.col("grp_n")).otherwise(0))
        .cast("long")
        .alias("n_suppressed"),
        F.sum(F.when(~small, F.col("grp_n")).otherwise(0))
        .cast("long")
        .alias("n_released"),
        F.min("grp_n").cast("long").alias("min_class_size"),
    )


q_k_anonymity.__doc__ = q_k_anonymity.__doc__.format(_K_ANON=_K_ANON)
