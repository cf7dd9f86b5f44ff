"""JSONL / CSV ingestion (SURVEY.md §2.1 source-family depth): the
formats training corpora actually arrive in — newline-delimited JSON,
usually gzip-compressed — read with the same explicit-schema
discipline as the parquet loader (tables.py: schemas declared, never
inferred; at 100 TB schema inference samples thousands of files
before the first real byte of work).

The registered key round-trips the documents fixture through
`.jsonl.gz` once per (process, sf_dir) and reads it back through
Spark's JSON source with gzip decompression — proving the exact path
a corpus drop lands on: splittable-by-file parallelism (one task per
.gz file; gzip is not splittable WITHIN a file, so many medium files
beat one giant one — the operational note that matters at scale),
explicit schema projection, and columnar-identical results to the
parquet twin (the DuckDB oracle reads the original parquet).

PERMISSIVE-mode corrupt-record accounting (the other thing real JSONL
needs) is pinned in tests/test_sources.py on a deliberately corrupted
copy — kept out of the oracle key because fixture bytes are never
modified there.
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_streaming_example_spark.plans.registry import register
from flink_streaming_example_spark.sources.tables import (
    load_table,
    load_text_table,
)

# one conversion per (process, sf_dir): the key must be rerunnable in
# a bench sweep without paying the write each time.  BENCH NOTE: the
# first q_jsonl_source invocation in a process pays this write (cold
# run incomparable to reruns — medians-of-3 absorb it); directories
# are removed at interpreter exit so repeated processes don't leak
# one gzip copy of documents each (advisor note, round 7).
_jsonl_cache: dict[str, str] = {}


def _cleanup_jsonl_cache() -> None:
    for path in _jsonl_cache.values():
        shutil.rmtree(path, ignore_errors=True)
    _jsonl_cache.clear()


atexit.register(_cleanup_jsonl_cache)


def documents_as_jsonl_gz(spark: SparkSession, sf_dir: str) -> str:
    """Materialize the documents table as gzip JSONL (once per
    process per sf_dir) and return the directory path."""
    cached = _jsonl_cache.get(sf_dir)
    if cached is not None and os.path.isdir(cached):
        return cached
    out = tempfile.mkdtemp(prefix="docs_jsonl_")
    (
        load_table(spark, sf_dir, "documents")
        .write.mode("overwrite")
        .option("compression", "gzip")
        .json(out)
    )
    _jsonl_cache[sf_dir] = out
    return out


_JSONL_ORACLE = """
SELECT lang, source,
  COUNT(*) AS n_docs,
  CAST(SUM(n_chars) AS BIGINT) AS total_chars,
  CAST(SUM(length(text)) AS BIGINT) AS measured_chars
FROM documents
GROUP BY lang, source
"""


@register("q_jsonl_source", oracle=_JSONL_ORACLE, tags=("source",))
def q_jsonl_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S-depth: ingest gzip JSONL with an explicit schema (module
    docstring) and aggregate per (lang, source) — n_docs plus both
    the carried and re-measured character counts, so a lossy
    serialization round-trip (encoding, escaping, truncation) cannot
    hash-match the parquet-reading oracle."""
    path = documents_as_jsonl_gz(spark, sf_dir)
    # same declared-schema FAILFAST reader as every landing format
    # (tables.load_text_table); gzip decompression is transparent
    docs = load_text_table(spark, path, "documents", format="json")
    return docs.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("long").alias("total_chars"),
        F.sum(F.length("text")).cast("long").alias("measured_chars"),
    )


# CSV twin: the other format corpora land in.  The synthesized export
# carries a QUOTING-TORTURE column (embedded commas and double quotes,
# built deterministically from row values) so a reader that mishandles
# RFC-4180 escaping cannot reproduce the parquet-side oracle.
# Embedded NEWLINES are deliberately excluded: Spark's CSV source
# needs multiLine=true for them, which makes files non-splittable —
# at 100 TB the operational rule is "no raw newlines in CSV fields";
# corpora that need them belong in JSONL/parquet.
_CSV_SCHEMA = (
    "doc_id BIGINT, lang STRING, source STRING, n_chars INT, "
    "tricky STRING"
)
# one expression string both engines evaluate verbatim (same
# no-drift trick as text_analysis._PII_AUG_EXPR)
_CSV_TRICKY_EXPR = (
    "substr(text, 1, 40) || ', \"' || lang || '\" x,' "
    "|| CAST(doc_id % 100 AS STRING)"
)

_csv_cache: dict[str, str] = {}


def _cleanup_csv_cache() -> None:
    for path in _csv_cache.values():
        shutil.rmtree(path, ignore_errors=True)
    _csv_cache.clear()


atexit.register(_cleanup_csv_cache)


def documents_as_csv(spark: SparkSession, sf_dir: str) -> str:
    """Materialize the documents table as headered CSV with the
    quoting-torture column (once per process per sf_dir)."""
    cached = _csv_cache.get(sf_dir)
    if cached is not None and os.path.isdir(cached):
        return cached
    out = tempfile.mkdtemp(prefix="docs_csv_")
    (
        load_table(spark, sf_dir, "documents")
        .select(
            "doc_id",
            "lang",
            "source",
            "n_chars",
            F.expr(_CSV_TRICKY_EXPR).alias("tricky"),
        )
        .write.mode("overwrite")
        .option("header", "true")
        # RFC-4180 quote doubling ("" inside quoted fields), NOT
        # Spark's default backslash convention: external producers
        # (Excel, COPY, csv.writer) emit the doubled form, and a
        # Spark reader left on its defaults silently mis-parses it —
        # the interop gotcha this key exists to pin.
        .option("escape", '"')
        .csv(out)
    )
    _csv_cache[sf_dir] = out
    return out


_CSV_ORACLE = (
    "SELECT lang, source,\n"
    "  COUNT(*) AS n_docs,\n"
    "  CAST(SUM(n_chars) AS BIGINT) AS total_chars,\n"
    "  CAST(SUM(length(" + _CSV_TRICKY_EXPR + ")) AS BIGINT)"
    " AS tricky_chars,\n"
    "  CAST(SUM(CASE WHEN " + _CSV_TRICKY_EXPR + " LIKE '%\"%'"
    " THEN 1 ELSE 0 END) AS BIGINT) AS n_quoted\n"
    "FROM documents\n"
    "GROUP BY lang, source"
)


@register("q_csv_source", oracle=_CSV_ORACLE, tags=("source",))
def q_csv_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S-depth (round 8): headered CSV ingestion with an explicit
    schema and FAILFAST, against a quoting-torture export — embedded
    commas in every row and RFC-4180 doubled quotes (escape='"' on
    BOTH sides; Spark's default backslash escaping would round-trip
    with itself but mis-parse real-world CSV).  The per-group
    report re-measures the tricky column's characters AND counts the
    rows still carrying a literal double quote after the round-trip,
    so a reader that strips, doubles, or mis-splits quoted fields
    cannot hash-match the parquet-reading oracle.  Same splittable
    one-task-per-file scan shape as the JSONL twin."""
    path = documents_as_csv(spark, sf_dir)
    docs = (
        spark.read.schema(_CSV_SCHEMA)
        .option("mode", "FAILFAST")
        .option("header", "true")
        .option("escape", '"')  # RFC-4180 (writer comment above)
        .csv(path)
    )
    return docs.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("long").alias("total_chars"),
        F.sum(F.length("tricky")).cast("long").alias("tricky_chars"),
        F.sum(F.col("tricky").contains('"').cast("long")).alias("n_quoted"),
    )


_orc_cache: dict[str, str] = {}


def _cleanup_orc_cache() -> None:
    for path in _orc_cache.values():
        shutil.rmtree(path, ignore_errors=True)
    _orc_cache.clear()


atexit.register(_cleanup_orc_cache)


def events_as_orc(spark: SparkSession, sf_dir: str) -> str:
    """Materialize the events table as zlib ORC (once per process per
    sf_dir) and return the directory path — same cache/cleanup idiom
    as the JSONL/CSV twins."""
    cached = _orc_cache.get(sf_dir)
    if cached is not None and os.path.isdir(cached):
        return cached
    out = tempfile.mkdtemp(prefix="events_orc_")
    (
        load_table(spark, sf_dir, "events")
        .write.mode("overwrite")
        .option("compression", "zlib")
        .orc(out)
    )
    _orc_cache[sf_dir] = out
    return out


_ORC_ORACLE = """
SELECT event_type,
  CAST(COUNT(*) AS BIGINT) AS n_events,
  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
  CAST(SUM(CAST(CAST(CAST(value AS STRING) AS DECIMAL(30,6)) * 1000000
           AS BIGINT)) AS BIGINT) AS total_micro,
  CAST(MIN(epoch_us(CAST(ts AS TIMESTAMP))) AS BIGINT) AS min_ts_us,
  CAST(MAX(epoch_us(CAST(ts AS TIMESTAMP))) AS BIGINT) AS max_ts_us
FROM events
GROUP BY event_type
"""


@register("q_orc_source", oracle=_ORC_ORACLE, tags=("source",))
def q_orc_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S-depth (round 9): ORC ingestion — the second columnar format
    next to parquet (Flink ships an ORC bulk format for exactly this
    interop role).  The events table round-trips through zlib ORC and
    the per-type report re-aggregates counts, distinct users, the
    exact micro-scaled value total, and the min/max event times in
    MICROSECONDS — so a reader that drops rows, mangles the timestamp
    unit (the round-3 parquet lesson), or loses double precision in
    transit cannot hash-match the parquet-reading oracle.  Scan shape
    is identical to parquet: columnar batched read, splittable per
    stripe, predicate pushdown available."""
    path = events_as_orc(spark, sf_dir)
    ev = spark.read.orc(path)
    vi = (F.col("value").cast("decimal(30,6)") * 1000000).cast("long")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        F.sum(vi).cast("long").alias("total_micro"),
        F.min(F.unix_micros(F.col("ts").cast("timestamp"))).alias("min_ts_us"),
        F.max(F.unix_micros(F.col("ts").cast("timestamp"))).alias("max_ts_us"),
    )


_part_cache: dict[str, str] = {}


def _cleanup_part_cache() -> None:
    for path in _part_cache.values():
        shutil.rmtree(path, ignore_errors=True)
    _part_cache.clear()


atexit.register(_cleanup_part_cache)


def events_as_partitioned_parquet(spark: SparkSession, sf_dir: str) -> str:
    """Materialize events as a Hive-partitioned parquet layout
    (partitioned by event_type, once per process per sf_dir) — the
    directory-per-value layout every warehouse table at scale uses so
    that a partition-key predicate prunes whole directories at
    PLANNING time, before a single footer is read."""
    cached = _part_cache.get(sf_dir)
    if cached is not None and os.path.isdir(cached):
        return cached
    out = tempfile.mkdtemp(prefix="events_part_")
    (
        load_table(spark, sf_dir, "events")
        # one file per partition value: repartition BY the partition
        # column first, else every input task writes a file into every
        # directory (the small-files explosion this layout is usually
        # blamed for — task-level partitioning is the fix, not fewer
        # partitions)
        .repartition("event_type")
        .write.mode("overwrite")
        .partitionBy("event_type")
        .parquet(out)
    )
    _part_cache[sf_dir] = out
    return out


_PARTITIONED_ORACLE = """
SELECT user_id,
  CAST(COUNT(*) AS BIGINT) AS n_purchases,
  CAST(SUM(CAST(CAST(CAST(value AS STRING) AS DECIMAL(30,6)) * 1000000
           AS BIGINT)) AS BIGINT) AS total_micro
FROM events
WHERE event_type = 'purchase'
GROUP BY user_id
"""


@register("q_partitioned_source", oracle=_PARTITIONED_ORACLE, tags=("source", "scale"))
def q_partitioned_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-pruned scan: events round-trip through a Hive-
    partitioned parquet layout and the purchase-only report reads ONLY
    the event_type=purchase directory — the filter is satisfied by the
    LAYOUT (PartitionFilters in the scan node, asserted on the
    executed plan by tests/test_sources.py), so scan cost is
    proportional to the selected partition, not the table.  At 100 TB
    this is the difference between reading 20% and 100% of the fact
    table; the same applies to date-partitioned event logs.  The
    report re-aggregates exact micro-scaled totals so a reader that
    loses rows or precision in the round-trip cannot hash-match the
    oracle (which reads the ORIGINAL parquet)."""
    path = events_as_partitioned_parquet(spark, sf_dir)
    ev = spark.read.parquet(path).where(F.col("event_type") == "purchase")
    vi = (F.col("value").cast("decimal(30,6)") * 1000000).cast("long")
    return ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_purchases"),
        F.sum(vi).cast("long").alias("total_micro"),
    )


_evolved_cache: dict[str, str] = {}


def _cleanup_evolved_cache() -> None:
    for path in _evolved_cache.values():
        shutil.rmtree(path, ignore_errors=True)
    _evolved_cache.clear()


atexit.register(_cleanup_evolved_cache)


def documents_as_evolved_parquet(spark: SparkSession, sf_dir: str) -> str:
    """Materialize documents as a two-generation parquet layout (once
    per process per sf_dir): generation v1 (even doc_ids) was written
    before a schema migration and carries (doc_id, lang, source,
    n_chars); generation v2 (odd doc_ids) adds a BIGINT `quality`
    column (deterministically n_chars % 97, so the oracle can
    recompute it from the base table).  This is the layout every
    long-lived warehouse table grows into — old files never
    rewritten, new columns appearing partway through history."""
    cached = _evolved_cache.get(sf_dir)
    if cached is not None and os.path.isdir(cached):
        return cached
    out = tempfile.mkdtemp(prefix="docs_evolved_")
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", "n_chars"
    )
    docs.where(F.col("doc_id") % 2 == 0).write.mode("overwrite").parquet(
        os.path.join(out, "gen=v1")
    )
    docs.where(F.col("doc_id") % 2 == 1).withColumn(
        "quality", (F.col("n_chars") % 97).cast("long")
    ).write.mode("overwrite").parquet(os.path.join(out, "gen=v2"))
    _evolved_cache[sf_dir] = out
    return out


_EVOLVED_ORACLE = """
SELECT lang,
  CAST(COUNT(*) AS BIGINT) AS n_docs,
  CAST(SUM(n_chars) AS BIGINT) AS total_chars,
  CAST(SUM(CASE WHEN doc_id % 2 = 1 THEN n_chars % 97 ELSE 0 END)
       AS BIGINT) AS quality_sum,
  CAST(SUM(CASE WHEN doc_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT)
    AS n_with_quality
FROM documents
GROUP BY lang
"""


@register("q_schema_evolution", oracle=_EVOLVED_ORACLE, tags=("source",))
def q_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S-depth: schema-evolution read — `mergeSchema=true` over a
    parquet table whose later files added a `quality` column
    (documents_as_evolved_parquet).  The merged scan presents the
    union schema with NULLs for pre-migration files; the report
    aggregates both a base column across generations and the new
    column's sum + presence count, so a reader that drops old files,
    refuses the union, or zero-fills instead of NULL-filling cannot
    hash-match the oracle (which recomputes the v2-only column from
    the base table's generative rule).  Cost note for 100 TB: schema
    merge reads every file footer at planning time — production
    tables should pin the merged schema in a catalog; this key proves
    the read path, not the planning default (tables.py declares
    schemas explicitly for exactly that reason)."""
    path = documents_as_evolved_parquet(spark, sf_dir)
    docs = spark.read.option("mergeSchema", "true").option(
        "recursiveFileLookup", "false"
    ).parquet(path)
    return docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("long").alias("total_chars"),
        F.sum(F.coalesce(F.col("quality"), F.lit(0)))
        .cast("long")
        .alias("quality_sum"),
        F.count("quality").cast("long").alias("n_with_quality"),
    )


# XML twin (Spark 4 built-in XML data source, the spark-xml merge):
# the interchange format enterprise feeds still arrive in.  The
# synthesized export carries an ENTITY-TORTURE column built from row
# values — literal '<', '&', '"' and a pre-escaped '&amp;' substring —
# so a writer/reader pair that under- or double-escapes XML entities
# cannot reproduce the parquet-side oracle.  The column is wrapped in
# 'X'...'X' sentinels because conformant XML readers may trim
# surrounding whitespace from element text (ignoreSurroundingSpaces).
_XML_SCHEMA = (
    "doc_id BIGINT, lang STRING, source STRING, n_chars BIGINT, "
    "tricky STRING"
)
# one expression string both engines evaluate verbatim (the CSV/PII
# no-drift trick); '&amp;' in the SOURCE text distinguishes exactly-
# once escaping from double-escape/double-unescape on the round-trip
_XML_TRICKY_EXPR = (
    "'X<&\" &amp; ' || substr(text, 1, 40) || ' <' || lang || '>&X'"
)

_xml_cache: dict[str, str] = {}


def _cleanup_xml_cache() -> None:
    for path in _xml_cache.values():
        shutil.rmtree(path, ignore_errors=True)
    _xml_cache.clear()


atexit.register(_cleanup_xml_cache)


def documents_as_xml(spark: SparkSession, sf_dir: str) -> str:
    """Materialize the documents table as XML (rowTag=doc, once per
    process per sf_dir) with the entity-torture column — same
    cache/cleanup idiom as the JSONL/CSV/ORC twins."""
    cached = _xml_cache.get(sf_dir)
    if cached is not None and os.path.isdir(cached):
        return cached
    out = tempfile.mkdtemp(prefix="docs_xml_")
    (
        load_table(spark, sf_dir, "documents")
        .select(
            "doc_id",
            "lang",
            "source",
            "n_chars",
            F.expr(_XML_TRICKY_EXPR).alias("tricky"),
        )
        .write.mode("overwrite")
        .option("rootTag", "docs")
        .option("rowTag", "doc")
        .format("xml")
        .save(out)
    )
    _xml_cache[sf_dir] = out
    return out


_XML_ORACLE = (
    "SELECT lang, source,\n"
    "  COUNT(*) AS n_docs,\n"
    "  CAST(SUM(n_chars) AS BIGINT) AS total_chars,\n"
    "  CAST(SUM(length(" + _XML_TRICKY_EXPR + ")) AS BIGINT)"
    " AS tricky_chars,\n"
    "  CAST(SUM(length(" + _XML_TRICKY_EXPR + ")\n"
    "         - length(replace(" + _XML_TRICKY_EXPR + ", '&', '')))"
    " AS BIGINT) AS n_amp,\n"
    "  CAST(SUM(length(" + _XML_TRICKY_EXPR + ")\n"
    "         - length(replace(" + _XML_TRICKY_EXPR + ", '<', '')))"
    " AS BIGINT) AS n_lt\n"
    "FROM documents\n"
    "GROUP BY lang, source"
)


@register("q_xml_source", oracle=_XML_ORACLE, tags=("source",))
def q_xml_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S-depth (round 9): XML ingestion through Spark 4's built-in XML
    data source (the spark-xml lineage Flink users reach for via
    custom formats).  The documents table round-trips through
    rowTag=doc XML whose torture column embeds '<', '&', '\"' and a
    literal '&amp;' substring; the per-group report re-measures the
    column's length and its exact '&' and '<' occurrence counts, so a
    round-trip that under-escapes (ill-formed XML fails the read),
    double-escapes ('&amp;' inflating to '&amp;amp;'), or trims
    content cannot hash-match the parquet-reading oracle.  Scan shape:
    one task per file (row elements don't split within a file) —
    like gzip JSONL, many medium files beat one giant one; at 100 TB
    XML is a landing format to convert once, not a working format."""
    path = documents_as_xml(spark, sf_dir)
    docs = (
        spark.read.schema(_XML_SCHEMA)
        .option("rowTag", "doc")
        .format("xml")
        .load(path)
    )
    amp = F.length("tricky") - F.length(F.replace("tricky", F.lit("&")))
    lt = F.length("tricky") - F.length(F.replace("tricky", F.lit("<")))
    return docs.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("long").alias("total_chars"),
        F.sum(F.length("tricky")).cast("long").alias("tricky_chars"),
        F.sum(amp).cast("long").alias("n_amp"),
        F.sum(lt).cast("long").alias("n_lt"),
    )


_DPP_ORACLE = """
WITH keep AS (
  SELECT event_type FROM events GROUP BY 1
  HAVING COUNT(*) > (SELECT COUNT(*) // 5 FROM events)
)
SELECT e.event_type,
  CAST(COUNT(*) AS BIGINT) AS n_events,
  CAST(SUM(CAST(CAST(CAST(e.value AS STRING) AS DECIMAL(30,6)) * 1000000
           AS BIGINT)) AS BIGINT) AS total_micro
FROM events e JOIN keep ON e.event_type = keep.event_type
GROUP BY 1
"""


@register("q_dpp_join", oracle=_DPP_ORACLE, tags=("source", "scale"))
def q_dpp_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic partition pruning — the 100 TB warehouse feature static
    pruning (q_partitioned_source) can't give you: which fact
    partitions survive is not knowable until a DIMENSION-side
    predicate runs, so Catalyst injects a runtime
    `dynamicpruningexpression(event_type IN <dim subquery>)` into the
    fact scan's PartitionFilters and whole partition directories are
    skipped at execution time.  The dim here is the above-average-
    frequency event types (HAVING over a grouped count) — a predicate
    on an AGGREGATE, which constraint propagation provably cannot
    push into the fact statically (a key-expression filter like
    md5(event_type) < '8' gets inferred through the equi-join and
    turns the key into a static-pruning demo; this rule can't be).
    The threshold is resolved to a literal driver-side (one bounded
    COUNT — DPP's benefit heuristic requires a literal filter) and
    the plan property is asserted by tests/test_sources.py."""
    path = events_as_partitioned_parquet(spark, sf_dir)
    fact = spark.read.parquet(path)
    base = load_table(spark, sf_dir, "events")
    # bounded scalar: one count, resolved to a literal so the DPP
    # planner sees a selective dim filter (see docstring)
    threshold = base.count() // 5
    dim = (
        base.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") > F.lit(threshold))
        .select("event_type")
    )
    vi = (F.col("value").cast("decimal(30,6)") * 1000000).cast("long")
    return (
        fact.join(F.broadcast(dim), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(vi).cast("long").alias("total_micro"),
        )
    )
