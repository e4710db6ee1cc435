"""Multimodal column plumbing (BASELINE.json extension pack).

Images/audio/video are opaque ``binary`` columns with a typed metadata
struct alongside. The Spark-side plumbing — schemas, Arrow-batched
``mapInPandas`` operators, partitioning discipline — is real and tested;
the actual codec calls are STUBBED (image/audio libraries are not in
this container): ``decode_image`` raises NotImplementedError, and
``fake_features`` is the deterministic stand-in that exercises the same
batch shapes.

Scale notes:
- Binary payloads ride in the same Parquet row groups as their metadata;
  size-based file splitting (maxPartitionBytes) keeps task memory
  bounded as long as single blobs stay << split size. For 100 MB+ video
  blobs, store pointers (path + byte range) instead and load inside the
  batch operator.
- All per-blob compute goes through ``mapInPandas`` so the Python
  boundary is Arrow-batched, never per-row.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Canonical multimodal schema: payload + typed metadata.
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("modality", T.StringType(), False),  # image|audio|video
                    T.StructField("mime", T.StringType(), True),
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.LongType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = "media_id long, n_bytes long, byte_checksum long, features array<double>"


def decode_image(payload: bytes):  # pragma: no cover - stub by design
    """STUB: real image decode (PIL/libjpeg) is unavailable in this
    container. The mapInPandas plumbing around it is real; swap this
    function for the codec call in production."""
    raise NotImplementedError("image codec not available in this environment")


def _fake_feature_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    """Deterministic stand-in for decode+embed: per blob, byte stats and
    an 8-dim 'feature vector' derived from byte positions. Same batch
    shape (pandas in/out via Arrow) as a real extractor."""
    payloads = pdf["payload"]
    n_bytes = payloads.map(lambda b: len(b) if b is not None else 0).astype("int64")
    checksum = payloads.map(lambda b: sum(b) % 1_000_000_007 if b else 0).astype("int64")
    feats = payloads.map(
        lambda b: [float(sum(b[i::8]) % 997) for i in range(8)] if b else [0.0] * 8
    )
    return pd.DataFrame(
        {
            "media_id": pdf["media_id"].astype("int64"),
            "n_bytes": n_bytes,
            "byte_checksum": checksum,
            "features": feats,
        }
    )


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads. In
    production the batch fn decodes + embeds; here it computes the
    deterministic fake (see _fake_feature_batch)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _fake_feature_batch(pdf)

    return media.select("media_id", "payload").mapInPandas(run, schema=FEATURE_SCHEMA)


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Adapter for tests: wrap the documents table as fake media rows
    (text bytes as payload) so the multimodal plumbing has a
    deterministic corpus in this container."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.struct(
            F.lit("image").alias("modality"),
            F.lit("application/octet-stream").alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
        ).alias("meta"),
    )


RESIZED_SCHEMA = "media_id long, width int, height int, payload binary"


def resize_image(payload: bytes, width: int, height: int):  # pragma: no cover - stub
    """STUB: real resize needs an image codec (absent here). Production
    swaps this for PIL/opencv; the batch operator below is the real
    plumbing."""
    raise NotImplementedError("image codec not available in this environment")


def resize_batch(media: DataFrame, width: int, height: int) -> DataFrame:
    """Arrow-batched resize over binary payloads. The deterministic
    stand-in 'resamples' bytes to width*height//64 output bytes by
    stride-sampling the payload — same signature, batch shape, and
    output schema as a codec-backed implementation."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        target = max(width * height // 64, 1)
        for pdf in batches:
            def sample(b):
                if not b:
                    return b"\x00" * target
                stride = max(len(b) // target, 1)
                return bytes(b[::stride][:target]).ljust(target, b"\x00")

            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].astype("int64"),
                    "width": width,
                    "height": height,
                    "payload": pdf["payload"].map(sample),
                }
            )

    return media.select("media_id", "payload").mapInPandas(run, schema=RESIZED_SCHEMA)


FRAMES_SCHEMA = "media_id long, frame_idx int, frame binary"


def sample_frames(media: DataFrame, n_frames: int = 4) -> DataFrame:
    """Frame sampling for video payloads: emit ``n_frames`` evenly-spaced
    'frames' per blob (UDTF shape — one input row to n output rows).
    The stand-in slices the byte stream into equal windows; a real
    implementation decodes containers inside the same Arrow-batched
    operator. Partitioning discipline: output explodes n_frames× — at
    100 TB, repartition AFTER sampling if frames feed a shuffle-heavy
    stage, never before."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for mid, b in zip(pdf["media_id"], pdf["payload"]):
                b = b or b""
                step = max(len(b) // n_frames, 1)
                for i in range(n_frames):
                    ids.append(mid)
                    idxs.append(i)
                    frames.append(bytes(b[i * step : (i + 1) * step]))
            yield pd.DataFrame(
                {"media_id": pd.Series(ids, dtype="int64"),
                 "frame_idx": pd.Series(idxs, dtype="int32"),
                 "frame": frames}
            )

    return media.select("media_id", "payload").mapInPandas(run, schema=FRAMES_SCHEMA)
