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


def decode_image(payload: bytes):
    """Decode an image payload to an (H, W, 3) uint8 numpy array.

    REAL pure-numpy decoders for two uncompressed formats:
    - PPM "P6" (binary, maxval<=255) — netpbm spec
    - BMP "BM" (BITMAPINFOHEADER, 24-bit, BI_RGB uncompressed,
      bottom-up rows, 4-byte row padding)

    Compressed formats (JPEG/PNG/...) still need a codec library that
    is not in this container — those raise NotImplementedError; swap in
    PIL/opencv in production. The mapInPandas plumbing is identical."""
    import numpy as np

    if payload is None or len(payload) < 2:
        raise ValueError("empty payload")
    magic = bytes(payload[:2])
    if magic == b"P6":
        return _decode_ppm(bytes(payload))
    if magic == b"BM":
        return _decode_bmp(bytes(payload))
    raise NotImplementedError(
        f"no codec for magic {magic!r} (only uncompressed PPM/BMP decode "
        "in-container; compressed formats need an image library)"
    )


def _decode_ppm(data: bytes):
    """P6 parser: 'P6' <ws> width <ws> height <ws> maxval <single-ws> raster.
    '#' comments allowed in the header (netpbm spec)."""
    import numpy as np

    pos = 2
    fields: list[int] = []
    while len(fields) < 3:
        while pos < len(data) and data[pos : pos + 1].isspace():
            pos += 1
        if data[pos : pos + 1] == b"#":  # comment to end of line
            while pos < len(data) and data[pos] not in (0x0A, 0x0D):
                pos += 1
            continue
        start = pos
        while pos < len(data) and not data[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(data[start:pos]))
    pos += 1  # exactly one whitespace byte before the raster
    w, h, maxval = fields
    if maxval > 255:
        raise NotImplementedError("16-bit PPM not supported")
    raster = np.frombuffer(data, dtype=np.uint8, count=w * h * 3, offset=pos)
    return raster.reshape(h, w, 3).copy()


def _decode_bmp(data: bytes):
    """24-bit uncompressed BMP (BITMAPINFOHEADER): little-endian header,
    BGR byte order, rows bottom-up and padded to 4 bytes."""
    import struct

    import numpy as np

    if len(data) < 54:
        raise ValueError("truncated BMP header")
    pixel_off = struct.unpack_from("<I", data, 10)[0]
    header_size = struct.unpack_from("<I", data, 14)[0]
    if header_size < 40:
        raise NotImplementedError("BITMAPCOREHEADER BMP not supported")
    w, h = struct.unpack_from("<ii", data, 18)
    planes, bpp = struct.unpack_from("<HH", data, 26)
    compression = struct.unpack_from("<I", data, 30)[0]
    if bpp != 24 or compression != 0:
        raise NotImplementedError(f"only 24-bit BI_RGB BMP supported (bpp={bpp})")
    bottom_up = h > 0
    h = abs(h)
    row_bytes = (w * 3 + 3) & ~3
    raster = np.frombuffer(data, dtype=np.uint8, count=row_bytes * h, offset=pixel_off)
    rows = raster.reshape(h, row_bytes)[:, : w * 3].reshape(h, w, 3)
    if bottom_up:
        rows = rows[::-1]
    return rows[:, :, ::-1].copy()  # BGR -> RGB


def encode_ppm(arr) -> bytes:
    """Encode an (H, W, 3) uint8 array as binary PPM (P6) — the
    deterministic in-container output codec."""
    h, w = arr.shape[0], arr.shape[1]
    return b"P6\n%d %d\n255\n" % (w, h) + arr.astype("uint8").tobytes()


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


def resize_image(payload: bytes, width: int, height: int) -> bytes:
    """REAL resize for decodable payloads (PPM/BMP): decode, nearest-
    neighbor resample with pure-numpy index math (deterministic — the
    same pixel wins on every run/engine), re-encode as PPM. Compressed
    inputs raise via decode_image until a codec library is swapped in."""
    import numpy as np

    arr = decode_image(payload)
    h, w = arr.shape[0], arr.shape[1]
    yi = (np.arange(height) * h) // height
    xi = (np.arange(width) * w) // width
    return encode_ppm(arr[yi][:, xi])


def resize_batch(media: DataFrame, width: int, height: int, decode: bool = True) -> DataFrame:
    """Arrow-batched resize over binary payloads. Decodable payloads
    (PPM/BMP magic) get a REAL nearest-neighbor pixel resize
    (:func:`resize_image`); anything else falls back to the
    deterministic byte-resampler stand-in (width*height//64 stride-
    sampled bytes) so non-image corpora — e.g. the documents-as-media
    test fixture — stay deterministic. Same signature, batch shape, and
    output schema either way.

    ``decode=False`` forces the byte-resampler for EVERY row: a caller
    that knows its payloads are not images (text corpora) opts out of
    magic sniffing, so a text that happens to parse as a valid PPM
    header cannot flip a row onto the pixel path and make the output
    content-dependent."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        target = max(width * height // 64, 1)
        for pdf in batches:
            def sample(b):
                if decode and b and bytes(b[:2]) in (b"P6", b"BM"):
                    try:
                        return resize_image(bytes(b), width, height)
                    except (NotImplementedError, ValueError):
                        pass
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
