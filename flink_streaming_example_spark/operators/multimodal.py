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
