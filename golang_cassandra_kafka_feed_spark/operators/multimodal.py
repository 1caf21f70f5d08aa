"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed in Arrow-batched Pandas stages.

The Spark-side architecture is fully real — schemas, partition-preserving
``mapInPandas`` stages, batch iteration — while the media decode itself is
STUBBED (the container has no image/audio libraries): ``decode_media``
raises NotImplementedError unless a decoder is importable, and
``fake_feature_extract`` computes deterministic features from the raw bytes
so the pipeline shape is testable end-to-end.

At 100 TB: binary payloads ride the columnar path (parquet binary +
Arrow); mapInPandas streams batches (spark.sql.execution.arrow
.maxRecordsPerBatch controls peak memory), and feature extraction is
embarrassingly parallel — no shuffle anywhere in this module.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("content_type", T.StringType(), False),
        T.StructField("payload", T.BinaryType(), False),
        T.StructField("byte_len", T.LongType(), False),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("content_type", T.StringType(), False),
        T.StructField("byte_len", T.LongType(), False),
        T.StructField("sha256_8", T.StringType(), False),
        T.StructField("feature", T.ArrayType(T.DoubleType()), False),
    ]
)


def attach_binary_payload(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Materialize an opaque binary payload column + typed metadata.

    Here the payload is the utf-8 encoding of the text (a deterministic
    stand-in for image bytes); in production this column comes straight
    from parquet binary storage.
    """
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.lit("application/octet-stream").alias("content_type"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.length(F.encode(F.col(text_col), "UTF-8")).cast("long").alias(
            "byte_len"
        ),
    )


def decode_media(df: DataFrame) -> DataFrame:
    """Real media decode — STUB.

    Gated on an importable decoder (PIL); the container ships none, so this
    raises.  The Arrow/batch plumbing is identical to
    ``fake_feature_extract`` below, which is the tested path.
    """
    try:
        import PIL.Image  # noqa: F401
    except ImportError as exc:  # pragma: no cover - no decoder in image
        raise NotImplementedError(
            "media decoding requires an image library (e.g. Pillow) which "
            "is not available in this environment; use "
            "fake_feature_extract() for the pipeline-shape path"
        ) from exc
    raise NotImplementedError("real decoder wiring lands with the library")


def fake_feature_extract(
    media: DataFrame, feature_dim: int = 8
) -> DataFrame:
    """Deterministic per-payload features via Arrow-batched mapInPandas.

    Feature = first ``feature_dim`` bytes of sha256(payload), scaled to
    [0, 1) — a stand-in with the exact batch shape of a real embedding
    model (bytes in, float vector out, vectorized per Arrow batch).
    """

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            digests = [
                hashlib.sha256(bytes(p)).digest() for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "content_type": pdf["content_type"],
                    "byte_len": pdf["byte_len"],
                    "sha256_8": [d[:8].hex() for d in digests],
                    "feature": [
                        [b / 256.0 for b in d[:feature_dim]] for d in digests
                    ],
                }
            )

    return media.mapInPandas(_extract, FEATURE_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("content_type", T.StringType(), False),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
        T.StructField("thumbnail", T.BinaryType(), False),
    ]
)


def resize_media(
    media: DataFrame, width: int = 8, height: int = 8
) -> DataFrame:
    """Thumbnail/resize stage — Arrow-batched mapInPandas with the exact
    signature a real image resize would have (payload in, width x height
    thumbnail bytes out, narrow, no shuffle).

    Without an image library the pixel decode is STUBBED deterministically:
    the "thumbnail" is ``width*height`` bytes stride-sampled evenly across
    the payload (repeating for short payloads), so output size and batch
    shape match the real operator and tests can pin determinism.
    """
    n_out = width * height

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            thumbs = []
            for p in pdf["payload"]:
                raw = bytes(p)
                if not raw:
                    thumbs.append(b"\x00" * n_out)
                    continue
                step = max(1, len(raw) // n_out)
                sampled = raw[::step][:n_out]
                # repeat to exactly n_out bytes for short payloads
                sampled = (sampled * (n_out // len(sampled) + 1))[:n_out]
                thumbs.append(sampled)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "content_type": pdf["content_type"],
                    "width": width,
                    "height": height,
                    "thumbnail": thumbs,
                }
            )

    return media.mapInPandas(_resize, RESIZED_SCHEMA)


def frame_sample(
    media: DataFrame, every_n_bytes: int = 64, max_frames: int = 4
) -> DataFrame:
    """'Frame sampling' over the opaque payload (stand-in for video frame
    extraction): deterministic byte-offset slices as one row per frame.
    Pure column work — explode of a computed offset sequence, no UDF."""
    return media.select(
        "doc_id",
        "content_type",
        F.posexplode(
            F.transform(
                F.sequence(
                    F.lit(0),
                    F.least(
                        F.lit(max_frames - 1),
                        (F.col("byte_len") / every_n_bytes).cast("long"),
                    ),
                ),
                lambda i: F.substring(
                    F.col("payload").cast("string"), i * every_n_bytes + 1, 16
                ),
            )
        ).alias("frame_idx", "frame_preview"),
    )
