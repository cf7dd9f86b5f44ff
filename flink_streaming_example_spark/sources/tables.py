"""Bounded parquet sources with explicit schemas (SURVEY.md §2.1 S1).

Policy (SURVEY.md §1.1): schemas are always declared, never inferred —
this matches the reference's static-schema discipline (Flink
`TypeInformation` is compile-time) and, at 100 TB, skips footer-sampling
schema inference over many thousands of files.

Timestamp handling (SURVEY.md §1.2): the fixture timestamps are
tz-naive.  `events.ts` has historically shipped in different parquet
physical units (TIMESTAMP(NANOS) in earlier fixture generations,
TIMESTAMP(MICROS) now), so the loader sniffs the footer's declared unit
(one cached pyarrow footer read per table per process) and picks the
matching read path:

 - us/ms: read natively as TIMESTAMP_NTZ — no conversion needed.
 - ns: Spark cannot read TIMESTAMP(NANOS) natively
   ([PARQUET_TYPE_ILLEGAL]); read as epoch-nanos long
   (`spark.sql.legacy.parquet.nanosAsLong`) and truncate to µs with
   integer division, matching DuckDB's `CAST(ts AS TIMESTAMP)`.

Every load also runs a schema-drift preflight: each declared column must
exist in the parquet footer with a read-compatible physical type, else
`SchemaDriftError` is raised with the exact mismatch.  Silently-wrong
values (the failure mode a hard-coded unit assumption produces when the
fixture drifts) are the worst possible outcome at 100 TB — fail loud.
"""

from __future__ import annotations

import functools
import glob
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from flink_streaming_example_spark.session import ensure_session_confs

_NTZ = T.TimestampNTZType()


class SchemaDriftError(RuntimeError):
    """Declared schema no longer matches the parquet footer."""


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
        ("ts", _NTZ),  # physical unit sniffed from footer; see _read_schema_for
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


@functools.lru_cache(maxsize=256)
def _footer_schema(path: str):
    """One parquet footer read per path per process (pyarrow).

    For a directory of part-files the first file's footer stands for
    all of them — the writers here (driver fixtures, our own sinks)
    write uniform schemas; a truly mixed-schema directory would fail the
    preflight on whichever file is sampled, which is the desired loud
    failure.
    """
    import pyarrow.parquet as pq

    target = path
    if os.path.isdir(path):
        parts = sorted(glob.glob(os.path.join(path, "*.parquet")))
        if not parts:
            raise SchemaDriftError(f"no parquet files under {path!r}")
        target = parts[0]
    return pq.read_schema(target)


def _arrow_compatible(arrow_t, spark_t: T.DataType) -> bool:
    """Is the declared Spark read type exactly right for this physical
    arrow/parquet type?  Strict on purpose: widening or unit-mangling
    reads are exactly the silent drift this guard exists to catch."""
    import pyarrow as pa

    if pa.types.is_int32(arrow_t):
        return isinstance(spark_t, T.IntegerType)
    if pa.types.is_int64(arrow_t):
        return isinstance(spark_t, T.LongType)
    if pa.types.is_string(arrow_t) or pa.types.is_large_string(arrow_t):
        return isinstance(spark_t, T.StringType)
    if pa.types.is_float64(arrow_t):
        return isinstance(spark_t, T.DoubleType)
    if pa.types.is_float32(arrow_t):
        return isinstance(spark_t, T.FloatType)
    if pa.types.is_boolean(arrow_t):
        return isinstance(spark_t, T.BooleanType)
    if pa.types.is_binary(arrow_t) or pa.types.is_large_binary(arrow_t):
        return isinstance(spark_t, T.BinaryType)
    if pa.types.is_date(arrow_t):
        return isinstance(spark_t, T.DateType)
    if pa.types.is_timestamp(arrow_t):
        if arrow_t.unit == "ns":
            # Spark reads TIMESTAMP(NANOS) only as long via nanosAsLong,
            # which drops any tz annotation on the floor: a fixture
            # drifting to TIMESTAMP(NANOS, tz=UTC) would silently be
            # reinterpreted as naive wall-clock downstream.  Reject it
            # here like every other tz drift.
            return arrow_t.tz is None and isinstance(spark_t, T.LongType)
        # tz must match the declared type exactly: a fixture drifting
        # from tz-naive to instant-annotated (tz=UTC) timestamps would
        # otherwise pass preflight while Spark silently reinterprets
        # the column as NTZ wall-clock — the very drift class this
        # guard exists to catch.
        if arrow_t.tz is None:
            return isinstance(spark_t, T.TimestampNTZType)
        return isinstance(spark_t, T.TimestampType)
    if pa.types.is_list(arrow_t) or pa.types.is_large_list(arrow_t):
        return isinstance(spark_t, T.ArrayType) and _arrow_compatible(
            arrow_t.value_type, spark_t.elementType
        )
    if pa.types.is_struct(arrow_t):
        if not isinstance(spark_t, T.StructType):
            return False
        names = {f.name: f.type for f in arrow_t}
        return all(
            f.name in names and _arrow_compatible(names[f.name], f.dataType)
            for f in spark_t.fields
        )
    return False


def _preflight(path: str, name: str, schema: T.StructType) -> None:
    """Assert the declared read schema matches the footer; raise loud.

    Footer-extra columns are fine (column pruning skips them); a
    declared column that is missing or physically different is not.
    """
    footer = _footer_schema(path)
    footer_types = {f.name: f.type for f in footer}
    for field in schema.fields:
        if field.name not in footer_types:
            raise SchemaDriftError(
                f"table {name!r}: declared column {field.name!r} missing "
                f"from parquet footer at {path!r} "
                f"(footer has: {sorted(footer_types)})"
            )
        arrow_t = footer_types[field.name]
        if not _arrow_compatible(arrow_t, field.dataType):
            raise SchemaDriftError(
                f"table {name!r}: column {field.name!r} is "
                f"{arrow_t} in the parquet footer at {path!r} but declared "
                f"{field.dataType.simpleString()} — the fixture schema has "
                f"drifted; update SCHEMAS/_read_schema_for rather than "
                f"reading silently-wrong values"
            )


def ts_unit(sf_dir: str, name: str = "events", column: str = "ts") -> str:
    """Physical timestamp unit ('s'|'ms'|'us'|'ns') of a fixture column,
    from the cached parquet footer."""
    import pyarrow as pa

    t = _footer_schema(f"{sf_dir}/{name}.parquet").field(column).type
    if not pa.types.is_timestamp(t):
        raise SchemaDriftError(
            f"table {name!r}: column {column!r} is {t}, not a parquet "
            f"timestamp — cannot pick a read path"
        )
    return t.unit


def _read_schema_for(name: str, path: str) -> T.StructType:
    """Physical read schema: the declared schema, except a ns-unit
    events.ts must be read as epoch-nanos long (nanosAsLong)."""
    schema = SCHEMAS[name]
    if name == "events":
        import pyarrow as pa

        t = _footer_schema(path).field("ts").type
        if pa.types.is_timestamp(t) and t.unit == "ns":
            schema = T.StructType(
                [
                    T.StructField("ts", T.LongType(), True)
                    if f.name == "ts"
                    else f
                    for f in schema.fields
                ]
            )
    return schema


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table with its declared schema.

    Filters/projections applied downstream reach the parquet scan
    (predicate pushdown + column pruning are preserved — the only
    post-read transform is the ns-unit events timestamp conversion,
    which is a deterministic per-row projection and only exists when
    the footer really is TIMESTAMP(NANOS)).
    """
    if name not in SCHEMAS:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    ensure_session_confs(spark)
    path = f"{sf_dir}/{name}.parquet"
    read_schema = _read_schema_for(name, path)
    _preflight(path, name, read_schema)
    df = spark.read.schema(read_schema).parquet(path)
    if name == "events" and isinstance(
        read_schema["ts"].dataType, T.LongType
    ):
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
