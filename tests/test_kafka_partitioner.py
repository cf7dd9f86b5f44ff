"""The kafka writer's murmur2 DefaultPartitioner, pinned to a Python
reference implementation of the published Kafka algorithm
(org.apache.kafka.common.utils.Utils.murmur2: seed 0x9747b28c,
MurmurHash2 multiplier 0x5bd1e995, r=24, case-fallthrough tail,
13/15 avalanche; partition = (h & 0x7fffffff) % N).  Both the Spark
expression (sources/streams.py::murmur2_ascii) and the DuckDB oracle
expression (murmur2_partition_sql) must reproduce it bit-for-bit over
every tail length (len % 4 in 0..3), multi-word keys, and the empty
string — a divergence in ANY of the three implementations fails."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from flink_streaming_example_spark.sources.streams import (
    kafka_frame,
    kafka_partition,
    murmur2_ascii,
    murmur2_partition_sql,
)


def _murmur2_ref(data: bytes) -> int:
    """Reference murmur2 (the public Kafka algorithm), unsigned-32
    emulated in Python ints."""
    m = 0x5BD1E995
    h = (0x9747B28C ^ len(data)) & 0xFFFFFFFF
    n4 = (len(data) // 4) * 4
    for i in range(0, n4, 4):
        k = (
            data[i]
            | (data[i + 1] << 8)
            | (data[i + 2] << 16)
            | (data[i + 3] << 24)
        )
        k = (k * m) & 0xFFFFFFFF
        k ^= k >> 24
        k = (k * m) & 0xFFFFFFFF
        h = (h * m) & 0xFFFFFFFF
        h ^= k
    t = len(data) & 3
    if t:
        tv = data[n4]
        if t >= 2:
            tv |= data[n4 + 1] << 8
        if t >= 3:
            tv |= data[n4 + 2] << 16
        h ^= tv
        h = (h * m) & 0xFFFFFFFF
    h ^= h >> 13
    h = (h * m) & 0xFFFFFFFF
    h ^= h >> 15
    return h


def _partition_ref(key: str, n: int) -> int:
    return (_murmur2_ref(key.encode("ascii")) & 0x7FFFFFFF) % n


# Every tail length x word count, digit keys (the fixture's shape),
# plus general ASCII and the empty string.
_KEYS = [
    "",
    "7",
    "42",
    "123",
    "9999",
    "31337",
    "123456",
    "1234567",
    "12345678",
    "123456789",
    "user_00042",
    "a",
    "ab",
    "abc",
    "abcd",
    "The quick brown fox jumps over the lazy dog",
    "!@#$%^&*()_+-=[]{};:,.<>/?",
] + [str(3_000_000_007 * i % 10**9) for i in range(1, 21)]


def test_spark_murmur2_matches_reference(spark):
    df = spark.createDataFrame([(k,) for k in _KEYS], "k string")
    got = {
        r["k"]: (r["h"], r["p"])
        for r in df.select(
            "k",
            murmur2_ascii(F.col("k")).alias("h"),
            kafka_partition(F.col("k"), 8).alias("p"),
        ).collect()
    }
    for k in _KEYS:
        assert got[k] == (_murmur2_ref(k.encode("ascii")), _partition_ref(k, 8)), (
            f"spark murmur2 diverges from reference on {k!r}"
        )


def test_duckdb_murmur2_sql_matches_reference():
    con = duckdb.connect()
    con.execute("CREATE TABLE ks (k VARCHAR)")
    con.executemany("INSERT INTO ks VALUES (?)", [(k,) for k in _KEYS])
    expr = murmur2_partition_sql("k", 8)
    rows = con.execute(f"SELECT k, {expr} AS p FROM ks").fetchall()
    assert len(rows) == len(_KEYS)
    for k, p in rows:
        assert p == _partition_ref(k, 8), (
            f"duckdb murmur2 SQL diverges from reference on {k!r}"
        )


@pytest.mark.parametrize("n", [1, 2, 3, 8, 100])
def test_partition_range_and_modulus(spark, n):
    df = spark.createDataFrame([(k,) for k in _KEYS if k], "k string")
    rows = df.select(kafka_partition(F.col("k"), n).alias("p")).collect()
    assert all(0 <= r["p"] < n for r in rows)


def test_kafka_frame_requires_key_for_partitioning(spark):
    df = spark.createDataFrame([(1, "a")], "user_id bigint, event_type string")
    with pytest.raises(ValueError, match="n_partitions requires key_col"):
        kafka_frame(df, key_col=None, n_partitions=8)
