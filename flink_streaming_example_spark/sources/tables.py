"""Bounded parquet sources with explicit schemas (SURVEY.md §2.1 S1).

Policy (SURVEY.md §1.1): schemas are always declared, never inferred —
this matches the reference's static-schema discipline (Flink
`TypeInformation` is compile-time) and, at 100 TB, skips footer-sampling
schema inference over many thousands of files.

Timestamp handling (SURVEY.md §1.2): the fixture timestamps are
tz-naive; `lineitem`/`orders` carry ms-precision (reads as
TIMESTAMP_NTZ), while `events.ts` is ns-precision, which Spark cannot
read natively — we read it as epoch-nanos long
(`spark.sql.legacy.parquet.nanosAsLong`) and truncate to µs with integer
division, which matches DuckDB's `CAST(ts AS TIMESTAMP)` exactly
(verified value-for-value in tests/test_sources.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from flink_streaming_example_spark.session import ensure_session_confs

_NTZ = T.TimestampNTZType()


def _struct(*fields: tuple[str, T.DataType]) -> T.StructType:
    return T.StructType([T.StructField(n, t, True) for n, t in fields])


# Declared physical read schemas, verified against the fixtures
# (FIXTURES.md).  events.ts is declared long (epoch nanos) at read time
# and converted in load_table().
SCHEMAS: dict[str, T.StructType] = {
    "region": _struct(
        ("r_regionkey", T.IntegerType()), ("r_name", T.StringType())
    ),
    "nation": _struct(
        ("n_nationkey", T.IntegerType()),
        ("n_name", T.StringType()),
        ("n_regionkey", T.IntegerType()),
    ),
    "customer": _struct(
        ("c_custkey", T.LongType()),
        ("c_name", T.StringType()),
        ("c_nationkey", T.IntegerType()),
        ("c_acctbal", T.DoubleType()),
        ("c_mktsegment", T.StringType()),
    ),
    "supplier": _struct(
        ("s_suppkey", T.LongType()),
        ("s_name", T.StringType()),
        ("s_nationkey", T.IntegerType()),
        ("s_acctbal", T.DoubleType()),
    ),
    "part": _struct(
        ("p_partkey", T.LongType()),
        ("p_name", T.StringType()),
        ("p_brand", T.StringType()),
        ("p_type", T.StringType()),
        ("p_size", T.IntegerType()),
        ("p_retailprice", T.DoubleType()),
    ),
    "orders": _struct(
        ("o_orderkey", T.LongType()),
        ("o_custkey", T.LongType()),
        ("o_orderstatus", T.StringType()),
        ("o_totalprice", T.DoubleType()),
        ("o_orderdate", _NTZ),
        ("o_orderpriority", T.StringType()),
    ),
    "lineitem": _struct(
        ("l_orderkey", T.LongType()),
        ("l_partkey", T.LongType()),
        ("l_suppkey", T.LongType()),
        ("l_linenumber", T.IntegerType()),
        ("l_quantity", T.DoubleType()),
        ("l_extendedprice", T.DoubleType()),
        ("l_discount", T.DoubleType()),
        ("l_tax", T.DoubleType()),
        ("l_returnflag", T.StringType()),
        ("l_linestatus", T.StringType()),
        ("l_shipdate", _NTZ),
    ),
    "events": _struct(
        ("event_id", T.LongType()),
        ("ts", T.LongType()),  # epoch nanos; converted below
        ("user_id", T.LongType()),
        ("event_type", T.StringType()),
        ("value", T.DoubleType()),
        ("props", T.StringType()),
    ),
    "documents": _struct(
        ("doc_id", T.LongType()),
        ("text", T.StringType()),
        ("lang", T.StringType()),
        ("source", T.StringType()),
        ("n_chars", T.LongType()),
    ),
    "embeddings": _struct(
        ("vec_id", T.LongType()),
        ("embedding", T.ArrayType(T.FloatType())),
        ("label", T.IntegerType()),
    ),
}

TABLE_NAMES: tuple[str, ...] = tuple(SCHEMAS)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table with its declared schema.

    Filters/projections applied downstream reach the parquet scan
    (predicate pushdown + column pruning are preserved — the only
    post-read transform is the events timestamp conversion, which is a
    deterministic per-row projection).
    """
    if name not in SCHEMAS:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    ensure_session_confs(spark)
    df = spark.read.schema(SCHEMAS[name]).parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        # ns -> µs truncation via integer division (floor; all fixture
        # timestamps are post-epoch).  Matches DuckDB CAST(ts AS TIMESTAMP).
        df = df.withColumn(
            "ts", F.expr("cast(timestamp_micros(ts div 1000) as timestamp_ntz)")
        )
    return df


def tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """All fixture tables keyed by name."""
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def load_text_table(
    spark: SparkSession, path: str, name: str, format: str = "csv"
) -> DataFrame:
    """S1-variants: the same declared-schema discipline over alternate
    landing formats (CSV with header, JSON lines, or ORC) — what a
    Flink example's readTextFile/CsvReaderFormat maps to.  Schema is
    always the declared one, never inferred: at 100 TB, sampling-based
    inference is a full extra pass and a type-drift hazard.

    PERMISSIVE mode with a _corrupt-free assumption is NOT used:
    FAILFAST surfaces malformed rows immediately instead of silently
    nulling them (roundtrip parity proven in tests/test_sources.py)."""
    if name not in SCHEMAS:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    ensure_session_confs(spark)
    reader = spark.read.schema(SCHEMAS[name]).option("mode", "FAILFAST")
    if format == "csv":
        return reader.option("header", "true").csv(path)
    if format == "json":
        return reader.json(path)
    if format == "orc":
        return reader.orc(path)
    raise ValueError(f"unsupported text format {format!r}")
