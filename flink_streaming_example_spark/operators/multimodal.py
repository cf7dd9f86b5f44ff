"""Multimodal columns (SURVEY.md §2.9 L5): opaque binary payloads with
typed metadata, processed by Arrow-batched Python.

Model: a modality row is (payload BINARY, meta STRUCT<mime, n_bytes>) —
no custom Spark type needed.  Feature extraction runs in mapInPandas
(Arrow batches, vectorized pandas ops — never row-at-a-time Python);
the output schema is declared explicitly so the plan is fully typed.

The fixture has no image/audio files, so the binary payload is the
UTF-8 encoding of documents.text, and the "decode" step for non-text
mime types is a clearly-marked stub (_decode_payload raises
NotImplementedError) — the Spark-side plumbing (schema, Arrow batch
shape, UDF signature, partitioning) is real and oracle-verified via
byte-level features DuckDB can recompute (octet_length, first byte).

Scale notes (100 TB): binary payloads ride the same columnar scan as
any column; keep per-batch memory bounded with
spark.sql.execution.arrow.maxRecordsPerBatch when payloads are large
(images), and store huge blobs as paths + ranged reads instead of
inline bytes.  mapInPandas is a narrow transform — no shuffle.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_streaming_example_spark.plans.registry import register
from flink_streaming_example_spark.sources.tables import load_table

_FEATURE_SCHEMA = (
    "doc_id long, mime string, n_bytes long, first_byte long, byte_sum_mod long"
)


def _decode_payload(payload: bytes, mime: str) -> bytes:
    """Decode a payload for feature extraction.

    Only text/plain is implemented in this environment; image/audio
    decode (PIL/libsndfile/ffmpeg) is stubbed — the container has no
    media libraries.  The surrounding Spark plumbing is identical for
    any modality.
    """
    if mime == "text/plain":
        return payload
    raise NotImplementedError(f"no decoder for mime type {mime!r}")


def _extract_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched feature extraction over (doc_id, payload, mime)."""
    for pdf in batches:
        decoded = [
            _decode_payload(p, m) for p, m in zip(pdf["payload"], pdf["mime"])
        ]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "mime": pdf["mime"],
                "n_bytes": [len(b) for b in decoded],
                "first_byte": [b[0] if len(b) else -1 for b in decoded],
                "byte_sum_mod": [sum(b) % 997 for b in decoded],
            }
        )


_RESIZE_SCHEMA = "doc_id long, mime string, width int, height int, payload binary"
_FRAMES_SCHEMA = "doc_id long, frame_idx int, frame binary"


def resize_images(df: DataFrame, width: int, height: int) -> DataFrame:
    """Image resize over (doc_id, payload, mime) -> _RESIZE_SCHEMA.

    Spark-side plumbing is real (Arrow batches, declared output
    schema, narrow transform); the pixel work needs an image codec
    (PIL/opencv) that this container does not ship, so the batch
    kernel raises NotImplementedError for any non-text mime."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for m in pdf["mime"]:
                if m.startswith("image/"):
                    raise NotImplementedError(
                        "image decode/resize requires PIL/opencv (absent)"
                    )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "mime": pdf["mime"],
                    "width": width,
                    "height": height,
                    "payload": pdf["payload"],
                }
            )

    return df.mapInPandas(kernel, schema=_RESIZE_SCHEMA)


def sample_frames(df: DataFrame, every_n: int) -> DataFrame:
    """Video frame sampling -> one row per sampled frame
    (_FRAMES_SCHEMA).  Same contract as resize_images: schema,
    batching and the 1->N row expansion are real; the decoder
    (ffmpeg) is stubbed."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf):
                raise NotImplementedError(
                    "video frame extraction requires ffmpeg (absent)"
                )
            yield pd.DataFrame(
                {"doc_id": [], "frame_idx": [], "frame": []}
            )

    return df.mapInPandas(kernel, schema=_FRAMES_SCHEMA)


# ---- header-level media metadata (round 6): the pure-Python piece of
# the decode story that needs NO codec.  A 100 TB corpus triage pass
# (dimension filters, aspect-ratio buckets, sample-rate splits, corrupt
# -payload quarantine) only needs the container HEADER — parsing it in
# an Arrow-batched kernel avoids ever shipping pixel decoders to the
# cluster.  Formats are parsed from their public container layouts
# (PNG IHDR, JPEG SOFn marker walk, GIF logical screen descriptor, BMP
# BITMAPINFOHEADER, WAV RIFF fmt chunk).


def parse_media_header(payload: bytes) -> dict:
    """Extract (mime, width, height, sample_rate, channels) from a
    media container header — pure Python, no codecs.  Unknown or
    truncated payloads raise ValueError (fail loud: silently emitting
    zeros would let corrupt payloads masquerade as 0x0 images —
    quarantine decisions need the distinction)."""
    import struct

    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        if len(payload) < 24:
            raise ValueError("truncated PNG header")
        w, h = struct.unpack(">II", payload[16:24])
        return {"mime": "image/png", "width": w, "height": h}
    if payload[:3] == b"GIF" and payload[3:6] in (b"87a", b"89a"):
        if len(payload) < 10:
            raise ValueError("truncated GIF header")
        w, h = struct.unpack("<HH", payload[6:10])
        return {"mime": "image/gif", "width": w, "height": h}
    if payload[:2] == b"BM":
        if len(payload) < 26:
            raise ValueError("truncated BMP header")
        w, h = struct.unpack("<ii", payload[18:26])
        return {"mime": "image/bmp", "width": w, "height": abs(h)}
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        if len(payload) < 36 or payload[12:16] != b"fmt ":
            raise ValueError("truncated/noncanonical WAV header")
        ch, sr = struct.unpack("<HI", payload[22:28])
        return {"mime": "audio/wav", "sample_rate": sr, "channels": ch}
    if payload[:2] == b"\xff\xd8":
        # JPEG: walk marker segments to the first SOFn frame header
        pos = 2
        while pos + 4 <= len(payload):
            if payload[pos] != 0xFF:
                break
            marker = payload[pos + 1]
            if marker in (0xD8, 0xD9) or 0xD0 <= marker <= 0xD7:
                pos += 2  # standalone markers carry no length
                continue
            (seg_len,) = struct.unpack(">H", payload[pos + 2 : pos + 4])
            is_sof = 0xC0 <= marker <= 0xCF and marker not in (
                0xC4,
                0xC8,
                0xCC,
            )
            if is_sof:
                if pos + 9 > len(payload):
                    raise ValueError("truncated JPEG SOF segment")
                h, w = struct.unpack(">HH", payload[pos + 5 : pos + 9])
                return {"mime": "image/jpeg", "width": w, "height": h}
            pos += 2 + seg_len
        raise ValueError("JPEG without SOF frame header")
    raise ValueError(f"unrecognized media container: {payload[:8]!r}")


def media_metadata(df: DataFrame) -> DataFrame:
    """(doc_id, payload) -> header metadata, Arrow-batched; the
    production shape for corpus triage at scale (narrow transform, no
    shuffle, bytes never decoded past the header)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [parse_media_header(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "mime": [r["mime"] for r in rows],
                    "width": pd.Series(
                        [r.get("width", 0) for r in rows], dtype="int32"
                    ),
                    "height": pd.Series(
                        [r.get("height", 0) for r in rows], dtype="int32"
                    ),
                    "sample_rate": pd.Series(
                        [r.get("sample_rate", 0) for r in rows],
                        dtype="int32",
                    ),
                    "channels": pd.Series(
                        [r.get("channels", 0) for r in rows], dtype="int32"
                    ),
                    "n_bytes": pd.Series(
                        [len(p) for p in pdf["payload"]], dtype="int64"
                    ),
                }
            )

    return df.mapInPandas(
        kernel,
        schema=(
            "doc_id long, mime string, width int, height int, "
            "sample_rate int, channels int, n_bytes long"
        ),
    )


def synth_media_payloads(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Deterministic real container headers from doc_id (the fixture
    ships no media bytes): mime cycles by doc_id % 5, dimensions /
    audio params are doc_id arithmetic — which is what lets the DuckDB
    oracle recompute the parsed metadata without parsing bytes."""
    import struct
    import zlib

    def png(w, h):
        ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
        return (
            b"\x89PNG\r\n\x1a\n"
            + struct.pack(">I", len(ihdr))
            + b"IHDR"
            + ihdr
            + struct.pack(">I", zlib.crc32(b"IHDR" + ihdr))
        )

    def jpeg(w, h):
        app0 = (
            b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00"
            + struct.pack(">HH", 1, 1) + b"\x00\x00"
        )
        sof0 = b"\xff\xc0" + struct.pack(">HBHHB", 11, 8, h, w, 1) + b"\x01\x11\x00"
        return b"\xff\xd8" + app0 + sof0 + b"\xff\xd9"

    def gif(w, h):
        return b"GIF89a" + struct.pack("<HH", w, h) + b"\x00\x00\x00"

    def bmp(w, h):
        return (
            b"BM" + struct.pack("<IHHI", 54, 0, 0, 54)
            + struct.pack("<IiiHH", 40, w, h, 1, 24)
            + struct.pack("<IIiiII", 0, 0, 2835, 2835, 0, 0)
        )

    def wav(sr, ch):
        return (
            b"RIFF" + struct.pack("<I", 36) + b"WAVEfmt "
            + struct.pack("<IHHIIHH", 16, 1, ch, sr, sr * ch * 2, ch * 2, 16)
            + b"data" + struct.pack("<I", 0)
        )

    for pdf in batches:
        payloads = []
        for doc_id in pdf["doc_id"]:
            d = int(doc_id)
            w, h = d % 1024 + 16, (d * 7) % 1024 + 16
            kind = d % 5
            if kind == 0:
                payloads.append(png(w, h))
            elif kind == 1:
                payloads.append(jpeg(w, h))
            elif kind == 2:
                payloads.append(gif(w, h))
            elif kind == 3:
                payloads.append(bmp(w, h))
            else:
                payloads.append(wav(8000 * (d % 3 + 1), d % 2 + 1))
        yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})


_MEDIA_META_ORACLE = """
SELECT
  doc_id,
  CASE doc_id % 5 WHEN 0 THEN 'image/png' WHEN 1 THEN 'image/jpeg'
       WHEN 2 THEN 'image/gif' WHEN 3 THEN 'image/bmp'
       ELSE 'audio/wav' END AS mime,
  CAST(CASE WHEN doc_id % 5 < 4 THEN doc_id % 1024 + 16 ELSE 0 END
       AS INT) AS width,
  CAST(CASE WHEN doc_id % 5 < 4 THEN (doc_id * 7) % 1024 + 16 ELSE 0 END
       AS INT) AS height,
  CAST(CASE WHEN doc_id % 5 = 4 THEN 8000 * (doc_id % 3 + 1) ELSE 0 END
       AS INT) AS sample_rate,
  CAST(CASE WHEN doc_id % 5 = 4 THEN doc_id % 2 + 1 ELSE 0 END
       AS INT) AS channels,
  CAST(CASE doc_id % 5 WHEN 0 THEN 33 WHEN 1 THEN 35 WHEN 2 THEN 13
       WHEN 3 THEN 54 ELSE 44 END AS BIGINT) AS n_bytes
FROM documents
"""


@register(
    "q_media_metadata",
    oracle=_MEDIA_META_ORACLE,
    tags=("multimodal", "python"),
)
def q_media_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L5b: header-level media metadata extraction — REAL pure-Python
    container parsers (PNG/JPEG/GIF/BMP/WAV), no codecs, over
    deterministic synthesized headers (the fixture ships no media
    bytes).  The oracle recomputes every parsed field from doc_id
    arithmetic, so a parser reading the wrong offset/endianness fails
    the hash.  Two chained mapInPandas stages (synthesize -> parse)
    exercise the binary-column round trip through Arrow both ways."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    media = docs.mapInPandas(
        synth_media_payloads, schema="doc_id long, payload binary"
    )
    return media_metadata(media)


_MULTIMODAL_ORACLE = """
SELECT
  doc_id,
  'text/plain' AS mime,
  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
  CAST(CASE WHEN length(text) > 0 THEN ascii(substring(text, 1, 1))
            ELSE -1 END AS BIGINT) AS first_byte,
  CAST(list_sum(list_transform(range(1, length(text) + 1),
                               i -> ascii(substring(text, i, 1)))) % 997
       AS BIGINT) AS byte_sum_mod
FROM documents
"""


@register(
    "q_multimodal_features",
    oracle=_MULTIMODAL_ORACLE,
    tags=("multimodal", "python"),
)
def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L5: binary-payload feature extraction through mapInPandas.

    documents.text -> BINARY payload + meta struct -> Arrow-batched
    pandas features (byte length, first byte, checksum-mod).  The
    oracle recomputes the same byte-level features in SQL, proving the
    Python path end-to-end.  (ASCII fixture text: UTF-8 bytes == char
    codes, which is what lets DuckDB mirror the byte math.)"""
    docs = load_table(spark, sf_dir, "documents")
    modal = docs.select(
        "doc_id",
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.lit("text/plain").alias("mime"),
    )
    return modal.mapInPandas(_extract_features, schema=_FEATURE_SCHEMA)
