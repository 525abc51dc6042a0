"""Multimodal column plumbing: image/audio/video as opaque ``binary`` columns
with typed metadata, processed by Arrow-batched pandas UDFs over
``mapInPandas``.

The container has no image/audio codecs (no PIL/ffmpeg), so the *decode*
kernels are stubbed: ``decode_image``/``decode_audio`` raise
NotImplementedError unless the optional lib imports, and a clearly-marked
deterministic FAKE decoder exists for exercising the real Spark plumbing
(schema, partitioning, UDF signature, Arrow batch shape) end-to-end.

Scale notes: binary payloads ride the scan as plain parquet BYTE_ARRAY;
mapInPandas streams Arrow batches so peak memory is one batch per task —
size ``spark.sql.execution.arrow.maxRecordsPerBatch`` against payload size
(e.g. 1k rows x 1 MB images = 1 GB/batch: lower it for real media).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: canonical multimodal record: opaque payload + typed metadata
MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),  # image | audio | video
        StructField("content", BinaryType()),
        StructField("mime", StringType()),
        StructField("width", IntegerType()),  # -1 when unknown/not applicable
        StructField("height", IntegerType()),
        StructField("duration_ms", IntegerType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("digest", StringType()),
        StructField("head_byte", IntegerType()),
    ]
)


def decode_image(content: bytes):  # pragma: no cover - no codec in container
    """Real image decode — requires an optional codec library."""
    try:
        from PIL import Image  # type: ignore
        import io

        return Image.open(io.BytesIO(content))
    except ImportError as exc:
        raise NotImplementedError(
            "image decoding requires Pillow, which is not installed in this "
            "environment; use fake_decode_image for plumbing tests"
        ) from exc


def fake_decode_image(content: bytes) -> dict:
    """Deterministic FAKE decoder (clearly marked): derives pseudo-dimensions
    from the payload bytes so plumbing tests have stable expectations."""
    n = len(content)
    return {
        "width": (content[0] if n else 0) + 1,
        "height": (content[-1] if n else 0) + 1,
        "n_bytes": n,
    }


def extract_features(media: DataFrame, content_col: str = "content", id_col: str = "media_id") -> DataFrame:
    """Byte-level feature extraction via mapInPandas (Arrow batches).

    The kernel is pure-Python-per-batch (hashlib/numpy) — the pattern real
    decode/resize/frame-sample kernels plug into."""
    import hashlib

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf[content_col]
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col],
                    "n_bytes": payloads.map(len).astype("int64"),
                    "digest": payloads.map(lambda b: hashlib.md5(bytes(b)).hexdigest()),
                    "head_byte": payloads.map(lambda b: int(b[0]) if len(b) else -1).astype("int32"),
                }
            )

    return media.select(id_col, content_col).mapInPandas(kernel, FEATURE_SCHEMA)


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:  # pragma: no cover
    """STUB: real resize needs a codec; the distributed shape is identical to
    extract_features (mapInPandas over content batches)."""
    raise NotImplementedError("no image codec in this environment (see module docstring)")


def sample_video_frames(media: DataFrame, every_ms: int) -> DataFrame:  # pragma: no cover
    """STUB: frame sampling needs ffmpeg; same mapInPandas shape."""
    raise NotImplementedError("no video codec in this environment (see module docstring)")


def documents_as_media(spark: SparkSession, sf: str) -> DataFrame:
    """Synthesize a media table from documents (text bytes as payload) so the
    binary plumbing is exercised on real distributed data."""
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("kind"),
        F.encode("text", "UTF-8").alias("content"),
        F.lit("application/octet-stream").alias("mime"),
        F.lit(-1).alias("width"),
        F.lit(-1).alias("height"),
        F.lit(-1).alias("duration_ms"),
    )


def q_multimodal_features(spark: SparkSession, sf: str) -> DataFrame:
    """Catalog entry: full binary pipeline — synthesize payloads, extract
    features via mapInPandas. Oracle recomputes the same byte facts in SQL."""
    return extract_features(documents_as_media(spark, sf))


Q_MULTIMODAL_SQL = """
SELECT doc_id                           AS media_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       md5(text)                        AS digest,
       CAST(ascii(substr(text, 1, 1)) AS INTEGER) AS head_byte
FROM documents
"""

MULTIMODAL_QUERIES = {"q_multimodal_features": q_multimodal_features}
MULTIMODAL_ORACLES = {"q_multimodal_features": Q_MULTIMODAL_SQL}
