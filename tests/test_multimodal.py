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


# ---- header parsers (pure Python, no Spark needed) ----

def test_parse_png_header():
    import struct
    import zlib

    ihdr = struct.pack(">IIBBBBB", 640, 480, 8, 2, 0, 0, 0)
    payload = (
        b"\x89PNG\r\n\x1a\n" + struct.pack(">I", 13) + b"IHDR" + ihdr
        + struct.pack(">I", zlib.crc32(b"IHDR" + ihdr))
    )
    got = multimodal.parse_media_header(payload)
    assert got == {"mime": "image/png", "width": 640, "height": 480}


def test_parse_jpeg_walks_past_app_segments_to_sof():
    import struct

    # APP0 + a fat APP1 (EXIF-like) BEFORE the SOF0 — the marker walk
    # must skip both by their length fields, not assume SOF position
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
    app1 = b"\xff\xe1" + struct.pack(">H", 102) + b"E" * 100
    sof2 = b"\xff\xc2" + struct.pack(">HBHHB", 11, 8, 1080, 1920, 3) + b"\x00" * 3
    got = multimodal.parse_media_header(b"\xff\xd8" + app0 + app1 + sof2)
    assert got == {"mime": "image/jpeg", "width": 1920, "height": 1080}


def test_parse_bmp_negative_height_is_topdown():
    import struct

    # top-down BMPs store height negative; metadata wants magnitude
    payload = (
        b"BM" + struct.pack("<IHHI", 54, 0, 0, 54)
        + struct.pack("<IiiHH", 40, 800, -600, 1, 24) + b"\x00" * 24
    )
    got = multimodal.parse_media_header(payload)
    assert got["width"] == 800 and got["height"] == 600


def test_parse_wav_header():
    import struct

    payload = (
        b"RIFF" + struct.pack("<I", 36) + b"WAVEfmt "
        + struct.pack("<IHHIIHH", 16, 1, 2, 44100, 176400, 4, 16)
        + b"data" + struct.pack("<I", 0)
    )
    got = multimodal.parse_media_header(payload)
    assert got == {"mime": "audio/wav", "sample_rate": 44100, "channels": 2}


def test_parse_rejects_corrupt_payloads():
    with pytest.raises(ValueError, match="unrecognized"):
        multimodal.parse_media_header(b"\x00\x01\x02\x03garbage")
    with pytest.raises(ValueError, match="truncated PNG"):
        multimodal.parse_media_header(b"\x89PNG\r\n\x1a\n\x00\x00")
    with pytest.raises(ValueError, match="without SOF"):
        multimodal.parse_media_header(b"\xff\xd8\xff\xd9")
