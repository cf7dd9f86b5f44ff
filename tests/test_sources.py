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
    # The ns->µs conversion uses `div 1000`, which truncates toward
    # zero — identical to floor only for non-negative inputs.  Pin the
    # assumption: every raw ns timestamp is post-epoch.
    raw = spark.read.schema(SCHEMAS["events"]).parquet(f"{sf_dir}/events.parquet")
    assert raw.filter("ts <= 0").count() == 0


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
