"""Partition pruning on a date-partitioned layout — at 100 TB the fact
tables are laid out by date; a day-ranged query must prune to the
matching directories, not scan everything.  (The driver fixtures are
unpartitioned, so this proves the property on a re-layout.)"""

from __future__ import annotations

import contextlib
import io
import re
import tempfile

import pytest

from pyspark.sql import functions as F

from flink_streaming_example_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def partitioned_events(spark) -> str:
    out = tempfile.mkdtemp(prefix="events_by_day_")
    ev = load_table(spark, SF_DIR, "events").withColumn(
        "event_date", F.to_date("ts")
    )
    ev.write.partitionBy("event_date").mode("overwrite").parquet(out)
    return out


def test_date_filter_prunes_partitions(spark, partitioned_events):
    df = spark.read.parquet(partitioned_events).filter(
        (F.col("event_date") >= "2024-01-10") & (F.col("event_date") < "2024-01-12")
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and m.group(1).strip(), f"no partition filters pushed:\n{plan}"
    # and the pruned read agrees with the unpartitioned filter
    want = (
        load_table(spark, SF_DIR, "events")
        .filter(
            (F.to_date("ts") >= F.lit("2024-01-10"))
            & (F.to_date("ts") < F.lit("2024-01-12"))
        )
        .count()
    )
    assert df.count() == want > 0
