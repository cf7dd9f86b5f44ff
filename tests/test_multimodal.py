"""Multimodal stub-surface contract: the Spark plumbing (schemas,
lazy plan construction, Arrow batch path) is real; the codec kernels
raise NotImplementedError exactly as documented."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from flink_streaming_example_spark.operators import multimodal
from flink_streaming_example_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


def _modal(spark, mime: str):
    docs = load_table(spark, SF_DIR, "documents").limit(5)
    return docs.select(
        "doc_id",
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.lit(mime).alias("mime"),
    )


def test_resize_passthrough_schema_for_text(spark):
    out = multimodal.resize_images(_modal(spark, "text/plain"), 64, 64)
    assert out.columns == ["doc_id", "mime", "width", "height", "payload"]
    rows = out.collect()
    assert len(rows) == 5 and rows[0]["width"] == 64


def test_resize_raises_for_image_mime(spark):
    out = multimodal.resize_images(_modal(spark, "image/png"), 64, 64)
    # plan construction is lazy and fine; execution hits the stub
    with pytest.raises(Exception, match="NotImplementedError|PIL|opencv"):
        out.collect()


def test_sample_frames_raises(spark):
    out = multimodal.sample_frames(_modal(spark, "video/mp4"), 10)
    assert out.columns == ["doc_id", "frame_idx", "frame"]
    with pytest.raises(Exception, match="NotImplementedError|ffmpeg"):
        out.collect()
