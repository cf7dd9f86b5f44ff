"""Source-layer verification (SURVEY.md §1.2): declared schemas load,
and the events ns->µs timestamp conversion matches DuckDB's
CAST(ts AS TIMESTAMP) value-for-value — the subtlest correctness trap
in the fixture set."""

from __future__ import annotations

import pytest

from flink_streaming_example_spark.sources.tables import (
    SCHEMAS,
    TABLE_NAMES,
    load_table,
)
from flink_streaming_example_spark.testing import compare_frames


def test_all_tables_load_with_declared_schema(spark, sf_dir):
    for name in TABLE_NAMES:
        df = load_table(spark, sf_dir, name)
        expected = [f.name for f in SCHEMAS[name].fields]
        assert df.columns == expected, name
        assert df.limit(1).count() == 1, f"{name}: empty"


def test_events_ts_post_epoch(spark, sf_dir):
    # Every fixture timestamp must be post-epoch.  For a ns-unit fixture
    # this pins the `div 1000` truncate-toward-zero == floor assumption;
    # for a native-unit fixture it catches a collapsed-to-1970 read
    # (exactly the drift bug the round-3 fixture regeneration exposed).
    df = load_table(spark, sf_dir, "events")
    assert df.filter("ts <= timestamp'1971-01-01'").count() == 0


def test_events_ts_unit_sniffed(sf_dir):
    # The loader must read the unit from the footer, not assume it.
    from flink_streaming_example_spark.sources.tables import ts_unit

    assert ts_unit(sf_dir, "events", "ts") in ("s", "ms", "us", "ns")


def test_preflight_raises_on_drift(spark, sf_dir, tmp_path):
    """A fixture whose physical type silently drifts must fail loud
    (SchemaDriftError), never read wrong values."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from flink_streaming_example_spark.sources.tables import (
        SchemaDriftError,
        _footer_schema,
        load_table,
    )

    # A wrong-typed `events` file: ts as plain int64 (no timestamp
    # annotation) — neither the native nor the nanosAsLong path applies.
    bad_dir = tmp_path / "bad_sf"
    bad_dir.mkdir()
    tbl = pa.table(
        {
            "event_id": pa.array([1], pa.int64()),
            "ts": pa.array([123], pa.int64()),
            "user_id": pa.array([1], pa.int64()),
            "event_type": pa.array(["click"], pa.string()),
            "value": pa.array([1.0], pa.float64()),
            "props": pa.array(["{}"], pa.string()),
        }
    )
    pq.write_table(tbl, bad_dir / "events.parquet")
    with pytest.raises(SchemaDriftError):
        load_table(spark, str(bad_dir), "events")

    # A column gone missing must also fail loud.
    cust = tbl.set_column(
        1, "ts", pa.array([123456], pa.timestamp("us"))
    ).drop_columns(["props"])
    cust_dir = tmp_path / "bad_sf2"
    cust_dir.mkdir()
    pq.write_table(cust, cust_dir / "events.parquet")
    _footer_schema.cache_clear()
    with pytest.raises(SchemaDriftError, match="missing"):
        load_table(spark, str(cust_dir), "events")
    _footer_schema.cache_clear()


def test_events_ts_matches_duckdb_cast(spark, duck, sf_dir):
    spark_pdf = (
        load_table(spark, sf_dir, "events").select("event_id", "ts").toPandas()
    )
    oracle_pdf = duck.execute(
        "SELECT event_id, CAST(ts AS TIMESTAMP) AS ts FROM events"
    ).df()
    result = compare_frames(spark_pdf, oracle_pdf)
    assert result.ok, result.detail


@pytest.mark.parametrize("format", ["csv", "json", "orc"])
def test_text_format_roundtrip(spark, sf_dir, format, tmp_path):
    """CSV/JSON landing formats under the same declared schema produce
    value-identical tables to the parquet path (S1-variants)."""
    from flink_streaming_example_spark.sources.tables import load_text_table

    want = load_table(spark, sf_dir, "orders")
    out = str(tmp_path / f"orders_{format}")
    w = want.write.mode("overwrite")
    if format == "csv":
        w.option("header", "true").csv(out)
    elif format == "json":
        w.json(out)
    else:
        w.orc(out)
    got = load_text_table(spark, out, "orders", format=format)
    result = compare_frames(got.toPandas(), want.toPandas())
    assert result.ok, result.detail


def test_text_format_failfast_on_malformed(spark, tmp_path):
    from flink_streaming_example_spark.sources.tables import load_text_table

    bad = tmp_path / "bad"
    bad.mkdir()
    (bad / "part.csv").write_text(
        "o_orderkey,o_custkey,o_orderstatus,o_totalprice,o_orderdate,o_orderpriority\n"
        "not_a_number,1,O,10.5,1995-01-01,1-URGENT\n"
    )
    with pytest.raises(Exception, match="Malformed|FAILFAST"):
        load_text_table(spark, str(bad), "orders", format="csv").collect()


def test_jsonl_gz_roundtrip_and_permissive_accounting(spark, sf_dir, tmp_path):
    """The gzip-JSONL ingestion path behind q_jsonl_source: (a) the
    compressed roundtrip is lossless vs the parquet loader, and (b)
    PERMISSIVE mode (the triage read used to COUNT damage before a
    FAILFAST production read) isolates a corrupted line into
    _corrupt_record without nulling the healthy rows."""
    import gzip
    import json as _json

    from flink_streaming_example_spark.sources.tables import load_table
    from flink_streaming_example_spark.sources.text_formats import (
        documents_as_jsonl_gz,
    )

    from flink_streaming_example_spark.sources.tables import load_text_table

    path = documents_as_jsonl_gz(spark, sf_dir)
    got = load_text_table(spark, path, "documents", format="json")
    want = load_table(spark, sf_dir, "documents")
    result = compare_frames(got.toPandas(), want.toPandas())
    assert result.ok, result.detail

    # corrupt one line in a copy, then account for it PERMISSIVEly
    bad_dir = tmp_path / "bad_jsonl"
    bad_dir.mkdir()
    rows = [
        _json.dumps({"doc_id": 1, "text": "ok", "lang": "en",
                     "source": "web", "n_chars": 2}),
        '{"doc_id": 2, "text": "truncated...',  # malformed JSON
        _json.dumps({"doc_id": 3, "text": "fine", "lang": "en",
                     "source": "web", "n_chars": 4}),
    ]
    with gzip.open(bad_dir / "part.jsonl.gz", "wt") as fh:
        fh.write("\n".join(rows) + "\n")
    triage = (
        spark.read.schema(
            "doc_id long, text string, lang string, source string, "
            "n_chars long, _corrupt_record string"
        )
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(str(bad_dir))
        .cache()  # Spark requires materializing before referencing
        # the corrupt-record column alone (SPARK-21610)
    )
    assert triage.count() == 3
    assert triage.filter("_corrupt_record IS NOT NULL").count() == 1
    assert (
        triage.filter("_corrupt_record IS NULL AND doc_id IS NOT NULL").count()
        == 2
    )
    triage.unpersist()


def test_xml_roundtrip_exact_escaping(spark, sf_dir):
    """The XML export must escape entities exactly once: raw files
    carry '&amp;amp;' for the source text's literal '&amp;' (and
    '&lt;' for '<'), never a bare '&'/'<' inside content, and the
    read-back tricky column is string-identical to the expression
    evaluated on the parquet table."""
    import glob
    import os

    from pyspark.sql import functions as F

    from flink_streaming_example_spark.sources.text_formats import (
        _XML_TRICKY_EXPR,
        documents_as_xml,
    )
    from flink_streaming_example_spark.sources.tables import load_table

    path = documents_as_xml(spark, sf_dir)
    raw = ""
    for f in glob.glob(os.path.join(path, "*.xml")):
        with open(f, encoding="utf-8") as fh:
            raw += fh.read()
    assert "&amp;amp;" in raw  # pre-escaped '&amp;' escaped once more
    assert "&lt;" in raw and "&quot;" not in raw.split("<doc>")[0]
    # no unescaped specials inside element text: every '&' in the file
    # body starts an entity
    import re

    assert not re.search(r"&(?!(amp|lt|gt|quot|apos|#)\w*;?)", raw)

    back = (
        spark.read.schema(
            "doc_id BIGINT, lang STRING, source STRING, n_chars BIGINT,"
            " tricky STRING"
        )
        .option("rowTag", "doc")
        .format("xml")
        .load(path)
        .select("doc_id", "tricky")
    )
    orig = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.expr(_XML_TRICKY_EXPR).alias("expect")
    )
    diff = back.join(orig, "doc_id").where(
        F.col("tricky") != F.col("expect")
    )
    assert back.count() == orig.count()
    assert diff.count() == 0


def test_dpp_join_prunes_dynamically(spark, sf_dir, duck):
    """q_dpp_join's fact scan must carry a dynamicpruningexpression in
    its PartitionFilters (runtime pruning fed by the dim subquery) and
    NO other static partition predicate (the dim rule is an aggregate
    HAVING — unpropagatable by constraint inference, so DPP is the
    only pruning mechanism).  Also: the surviving category set is a
    strict non-empty subset of the partitions."""
    import contextlib
    import io

    from flink_streaming_example_spark.plans.registry import all_specs

    df = all_specs()["q_dpp_join"].fn(spark, sf_dir)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    fact_filters = [
        line
        for line in plan.splitlines()
        if "PartitionFilters" in line and "dynamicpruning" in line
    ]
    assert fact_filters, "fact scan lost its dynamic pruning expression"
    static = fact_filters[0].split("dynamicpruning")[0]
    assert "md5" not in static and ">" not in static and "<" not in static, (
        f"unexpected static partition predicate: {static}"
    )
    counts = duck.execute(
        "SELECT event_type, COUNT(*) FROM events GROUP BY 1"
    ).fetchall()
    total = sum(n for _, n in counts)
    kept = [t for t, n in counts if n > total // 5]
    assert 0 < len(kept) < len(counts)
    assert df.count() == len(kept)


def test_kafka_frame_roundtrips_adversarial_strings(spark):
    """The kafka writer projection (kafka_frame) must round-trip any
    string payload byte-exactly through JSON value bytes, key bytes,
    and header bytes — the classes JSON encoders historically mangle:
    quotes, backslashes, newlines/tabs, unicode (incl. astral plane),
    JSON-looking strings, and empties.  Decoded exactly the way
    q_kafka_frame_roundtrip / kafka_source decode."""
    from pyspark.sql import functions as F

    from flink_streaming_example_spark.sources.streams import kafka_frame

    payloads = [
        'quote " inside',
        "backslash \\ and \\\\ double",
        "newline\nand\ttab",
        "unicode: émojis 🎉 中文   line-sep",
        '{"looks": "like json", "n": [1,2]}',
        "",
        " leading and trailing ",
        "null",
    ]
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(payloads)], "k long, payload string"
    )
    frames = kafka_frame(
        df,
        key_col="k",
        topic="t.v1",
        n_partitions=4,
        headers=[("h", F.col("payload"))],
    )
    got = frames.select(
        F.col("key").cast("string").cast("long").alias("k"),
        F.from_json(
            F.col("value").cast("string"), "k long, payload string"
        ).alias("r"),
        F.col("headers")[0]["value"].cast("string").alias("h"),
        "partition",
    ).collect()
    assert len(got) == len(payloads)
    # partition = Kafka's murmur2 DefaultPartitioner over the key's
    # string bytes (round 12; reference impl in test_kafka_partitioner)
    from tests.test_kafka_partitioner import _partition_ref

    for row in sorted(got, key=lambda r: r["k"]):
        want = payloads[row["k"]]
        assert row["r"]["payload"] == want, repr((row["r"]["payload"], want))
        assert row["h"] == want
        assert row["partition"] == _partition_ref(str(row["k"]), 4)
