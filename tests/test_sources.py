"""Source-layer verification (SURVEY.md §1.2): declared schemas load,
and the events ns->µs timestamp conversion matches DuckDB's
CAST(ts AS TIMESTAMP) value-for-value — the subtlest correctness trap
in the fixture set."""

from __future__ import annotations

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
