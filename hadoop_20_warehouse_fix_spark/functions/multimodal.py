"""Multimodal column plumbing (BASELINE.json extension pack).

Images/audio/video are opaque ``binary`` columns with a typed metadata
struct alongside. The Spark-side plumbing — schemas, Arrow-batched
``mapInPandas`` operators, partitioning discipline — is real and tested.
Codecs: ``decode_image`` REALLY decodes PPM, BMP, zlib-compressed PNG
(all five scanline filters), and baseline JPEG (pure-python Huffman +
vectorized IDCT, :mod:`.jpeg`) with numpy + stdlib only; PIL/OpenCV is
feature-detected as the FAST path for JPEG and the only path for
exotic variants (16-bit/palette/interlaced PNG, arithmetic/12-bit
JPEG — neither library ships in this container, so those raise
NotImplementedError here). Progressive JPEG (SOF2) decodes PURE as
of round 8 (:mod:`.jpeg`'s multi-scan path).
``fake_features`` remains the deterministic embed stand-in that
exercises the same batch shapes as a real extractor.

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

import struct
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

# Allocation guard shared by the pure decoders (round-7 fuzz finding):
# a corrupt header can claim implausible dimensions, and a decoder that
# believes it attempts a multi-GB numpy allocation — a memory DoS from
# one bad payload. 100M pixels (~300 MB decoded RGB) is far above any
# payload this engine decodes in-container and still task-safe.
_MAX_DECODE_PIXELS = 100_000_000


_IMAGE_LIB: list | None = None  # lazy feature-detect cache: [module_kind] or []


def _image_library():
    """Feature-detect an optional image library ONCE per process:
    PIL (Pillow) preferred, OpenCV second. Returns ("pil", module),
    ("cv2", module), or None — the in-container build has neither, so
    the pure decoders below carry PPM/BMP/PNG and JPEG raises."""
    global _IMAGE_LIB
    if _IMAGE_LIB is None:
        _IMAGE_LIB = []
        try:
            from PIL import Image  # noqa: PLC0415

            _IMAGE_LIB = [("pil", Image)]
        except ImportError:
            try:
                import cv2  # noqa: PLC0415

                _IMAGE_LIB = [("cv2", cv2)]
            except ImportError:
                pass
    return _IMAGE_LIB[0] if _IMAGE_LIB else None


def _decode_with_library(data: bytes):
    """Decode via PIL/cv2 when present (JPEG, exotic PNG variants...).
    Returns (H, W, 3) uint8 RGB or None when no library is available."""
    import numpy as np

    lib = _image_library()
    if lib is None:
        return None
    kind, mod = lib
    if kind == "pil":
        import io

        arr = np.asarray(mod.open(io.BytesIO(data)).convert("RGB"), dtype=np.uint8)
        return arr
    decoded = mod.imdecode(np.frombuffer(data, dtype=np.uint8), 1)  # cv2: BGR
    if decoded is None:
        raise ValueError("cv2.imdecode failed")
    return decoded[:, :, ::-1].copy()


def decode_image(payload: bytes):
    """Decode an image payload to an (H, W, 3) uint8 numpy array.

    REAL pure-numpy decoders, no external libraries:
    - PPM "P6" (binary, maxval<=255) — netpbm spec
    - BMP "BM" (BITMAPINFOHEADER, 24-bit, BI_RGB uncompressed,
      bottom-up rows, 4-byte row padding)
    - PNG (8-bit gray / gray+alpha / RGB / RGBA, non-interlaced) —
      stdlib zlib inflate + all five scanline filters unfiltered in
      numpy (:func:`_decode_png`); genuinely compressed input.

    - baseline AND progressive JPEG (SOF0/SOF2, Huffman, 8-bit, any
      integer subsampling) — pure-python marker parse + Huffman +
      vectorized IDCT, multi-scan coefficient accumulation for SOF2
      (:mod:`.jpeg`; rounds 6-8).

    Exotic PNG variants (16-bit, palette, interlaced) and non-Huffman
    JPEG (arithmetic, 12-bit, lossless) go through PIL/OpenCV
    when one is installed (feature-detected once per process —
    :func:`_image_library`, and the library is preferred for JPEG even
    when the pure decoder could cope: it is the fast path); without a
    library they raise NotImplementedError. The mapInPandas plumbing
    is identical either way."""
    if payload is None or len(payload) < 2:
        raise ValueError("empty payload")
    data = bytes(payload)
    magic = data[:2]
    if magic == b"P6":
        return _decode_ppm(data)
    if magic == b"BM":
        return _decode_bmp(data)
    if data[:8] == b"\x89PNG\r\n\x1a\n":
        try:
            return _decode_png(data)
        except NotImplementedError:
            via_lib = _decode_with_library(data)
            if via_lib is not None:
                return via_lib
            raise
        except (IndexError, struct.error) as exc:
            # corrupt chunk structure (round-7 fuzz): the package-wide
            # exception contract maps it to ValueError
            raise ValueError(f"corrupt/truncated PNG: {exc}") from exc
    if data[:3] == b"\xff\xd8\xff":
        via_lib = _decode_with_library(data)  # native decode: the fast path
        if via_lib is not None:
            return via_lib
        from hadoop_20_warehouse_fix_spark.functions.jpeg import decode_jpeg

        return decode_jpeg(data)
    via_lib = _decode_with_library(data)
    if via_lib is not None:
        return via_lib
    raise NotImplementedError(
        f"no codec for magic {magic!r} (in-container: pure PPM/BMP/PNG/"
        "baseline-JPEG decode; other compressed formats need PIL or OpenCV)"
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


def _decode_png(data: bytes):
    """Pure-numpy PNG decoder (stdlib zlib for the DEFLATE stream).

    Exception contract (shared across this package's decoders, see
    :mod:`.jpeg`): corrupt data -> ValueError (a corrupt DEFLATE
    stream's zlib.error is re-raised as one), unsupported variant ->
    NotImplementedError; nothing else escapes to the batch operators.

    8-bit depth, color types 0 (gray), 2 (RGB), 4 (gray+alpha),
    8-bit depth, color types 0 (gray), 2 (RGB), 4 (gray+alpha),
    6 (RGBA), interlace 0. All five scanline filters per the PNG spec
    §9: None/Up are vectorized whole-row; Sub is a per-channel
    cumulative sum mod 256; Average/Paeth carry a true sequential
    dependency on the left-reconstructed pixel, so they walk pixels
    within the row (bounded by width — fine for the metadata-scale
    thumbnails this engine decodes in-container; a production pipeline
    swaps in PIL via the same dispatch). 16-bit, palette, and
    interlaced PNGs raise NotImplementedError (library fallback)."""
    import struct
    import zlib

    import numpy as np

    pos = 8
    ihdr = None
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + type + crc
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif ctype == b"IDAT":
            idat.extend(body)
        elif ctype == b"IEND":
            break
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    w, h, depth, color, comp, filt, interlace = ihdr
    if w < 1 or h < 1:
        raise ValueError("corrupt PNG IHDR: zero dimension")
    if w * h > _MAX_DECODE_PIXELS:
        raise ValueError(
            f"PNG dimensions {w}x{h} exceed the pure decoder's "
            f"{_MAX_DECODE_PIXELS}-pixel cap (corrupt header, or use a library)"
        )
    channels = {0: 1, 2: 3, 4: 2, 6: 4}.get(color)
    if depth != 8 or channels is None or interlace != 0:
        raise NotImplementedError(
            f"PNG variant unsupported by the pure decoder "
            f"(depth={depth}, color_type={color}, interlace={interlace})"
        )
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as exc:
        raise ValueError(f"corrupt PNG DEFLATE stream: {exc}") from exc
    stride = w * channels
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG scanline payload size mismatch")
    rows = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride + 1)
    filters = rows[:, 0]
    out = np.zeros((h, stride), dtype=np.uint8)
    bpp = channels
    for y in range(h):
        cur = rows[y, 1:].copy()
        prior = out[y - 1] if y > 0 else np.zeros(stride, dtype=np.uint8)
        f = int(filters[y])
        if f == 0:  # None
            out[y] = cur
        elif f == 2:  # Up
            out[y] = cur + prior  # uint8 wraps = mod 256
        elif f == 1:  # Sub: cumsum per channel lane, mod 256 via uint8 wrap
            lanes = cur.reshape(w, bpp).astype(np.uint64)
            out[y] = np.cumsum(lanes, axis=0).astype(np.uint8).reshape(stride)
        elif f == 3:  # Average — left dependency: walk pixels
            rec = out[y]
            rec[:bpp] = cur[:bpp] + (prior[:bpp] // 2)
            for x in range(bpp, stride, bpp):
                left = rec[x - bpp : x].astype(np.uint16)
                up = prior[x : x + bpp].astype(np.uint16)
                rec[x : x + bpp] = cur[x : x + bpp] + ((left + up) // 2).astype(np.uint8)
        elif f == 4:  # Paeth — left dependency: walk pixels
            rec = out[y]
            rec[:bpp] = cur[:bpp] + prior[:bpp]  # predictor(0, up, 0) = up
            for x in range(bpp, stride, bpp):
                a = rec[x - bpp : x].astype(np.int16)
                b = prior[x : x + bpp].astype(np.int16)
                c = (prior[x - bpp : x] if y > 0 else np.zeros(bpp, dtype=np.uint8)).astype(np.int16)
                p = a + b - c
                pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
                pred = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
                rec[x : x + bpp] = cur[x : x + bpp] + pred.astype(np.uint8)
        else:
            raise ValueError(f"invalid PNG filter type {f}")
    img = out.reshape(h, w, channels)
    if channels == 1:
        return np.repeat(img, 3, axis=2).copy()
    if channels == 2:  # gray+alpha -> replicate gray, drop alpha
        return np.repeat(img[:, :, :1], 3, axis=2).copy()
    if channels == 4:  # RGBA -> drop alpha
        return img[:, :, :3].copy()
    return img.copy()


def encode_png(arr) -> bytes:
    """Encode an (H, W, 3) uint8 array as a REAL zlib-compressed PNG
    (color type 2, filter 0 scanlines) — the deterministic in-container
    compressed output codec, and the round-trip partner of
    :func:`_decode_png` in tests."""
    import struct
    import zlib

    import numpy as np

    a = np.ascontiguousarray(arr, dtype=np.uint8)
    h, w = a.shape[0], a.shape[1]
    raw = b"".join(b"\x00" + a[y].tobytes() for y in range(h))

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )


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


IMAGE_FEATURES_SCHEMA = (
    "media_id long, decoded boolean, width int, height int, "
    "mean_rgb array<double>, std_rgb array<double>"
)


def image_features(media: DataFrame, observation=None) -> DataFrame:
    """REAL image feature extraction (round 7 — the upgrade the codec
    work exists for): payloads that magic-sniff as images decode
    through :func:`decode_image` (PPM/BMP/PNG/baseline-JPEG pure
    paths, PIL/OpenCV fast path) and yield dimensions + per-channel
    mean/std; everything else — including non-baseline JPEG without a
    library — comes back ``decoded=false`` with nulls, counted via
    ``observation`` (``rows`` / ``decoded_rows`` /
    ``sniffed_fallback_rows`` — the ``resize_batch`` observability
    contract). ``extract_features`` keeps its deterministic byte
    stand-in (registry-pinned oracle); this is the pixel-truth
    operator beside it."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for mid, b in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(b) if b is not None else b""
                status, vals = 0, (None, None, None, None)
                if b and _looks_like_image(b[:8]):
                    try:
                        arr = decode_image(b).astype(np.float64)
                        vals = (
                            int(arr.shape[1]),
                            int(arr.shape[0]),
                            [float(x) for x in arr.mean(axis=(0, 1))],
                            [float(x) for x in arr.std(axis=(0, 1))],
                        )
                        status = 1
                    except (ValueError, NotImplementedError):
                        status = 2  # sniffed as image, undecodable
                rows.append((int(mid), status == 1, status, *vals))
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "decoded", "_status", "width", "height",
                    "mean_rgb", "std_rgb",
                ],
            )

    feats = media.select("media_id", "payload").mapInPandas(
        run,
        schema=(
            "media_id long, decoded boolean, _status int, width int, "
            "height int, mean_rgb array<double>, std_rgb array<double>"
        ),
    )
    if observation is not None:
        feats = feats.observe(
            observation,
            F.count(F.lit(1)).alias("rows"),
            F.sum((F.col("_status") == 1).cast("long")).alias("decoded_rows"),
            F.sum((F.col("_status") == 2).cast("long")).alias("sniffed_fallback_rows"),
        )
    return feats.drop("_status")


def dhash_pixels(arr) -> int:
    """dHash of an already-decoded (H, W, 3) uint8 array — the pixel
    half of :func:`dhash_image`, factored out so VIDEO frames (already
    pixels after :mod:`.video`'s MJPEG decode) hash on the identical
    recipe."""
    import numpy as np

    arr = np.asarray(arr).astype(np.int32)
    gray = arr.sum(axis=2)  # 3x channel mean — monotone equivalent, exact ints
    h, w = gray.shape
    yi = (np.arange(8) * h) // 8
    xi = (np.arange(9) * w) // 9
    small = gray[yi][:, xi]
    bits = (small[:, :-1] > small[:, 1:]).flatten()  # 8 rows x 8 comparisons
    v = 0
    for i, b in enumerate(bits):
        if b:
            v |= 1 << i
    return v


def dhash_image(payload: bytes) -> int:
    """64-bit difference hash (dHash — the public perceptual-hash
    recipe): decode, grayscale (channel mean), nearest-neighbor
    downsample to 9x8, bit (y, x) = 1 iff px[y, x] > px[y, x+1].
    Gradient-based, so it is EXACTLY invariant to global brightness
    shifts (adding a constant preserves every comparison) and robust
    to small recompression noise — the right fingerprint for
    near-duplicate image detection, where byte hashes see nothing."""
    return dhash_pixels(decode_image(payload))


def image_dhash_bands(media: DataFrame, observation=None) -> DataFrame:
    """Each decodable payload's dHash as (id, band0..band3) 16-bit
    bands — the exact input shape of
    :func:`~..operators.dedup.hamming_pairs_from_bands`, so IMAGE
    near-dup pairs run on the same pigeonhole machinery as text
    SimHash: ``hamming_pairs_from_bands(image_dhash_bands(media))``.
    Undecodable payloads are dropped from the output (a fingerprint of
    a failed decode would manufacture pairs) and counted via
    ``observation`` (``rows`` / ``decoded_rows`` /
    ``sniffed_fallback_rows``)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, b in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(b) if b is not None else b""
                status = 0
                bands = (None, None, None, None)
                if b and _looks_like_image(b[:8]):
                    try:
                        v = dhash_image(b)
                        bands = tuple((v >> (16 * i)) & 0xFFFF for i in range(4))
                        status = 1
                    except (ValueError, NotImplementedError):
                        status = 2
                rows.append((int(mid), status, *bands))
            yield pd.DataFrame(
                rows, columns=["id", "_status", "band0", "band1", "band2", "band3"]
            )

    feats = media.select("media_id", "payload").mapInPandas(
        run,
        schema="id long, _status int, band0 int, band1 int, band2 int, band3 int",
    )
    if observation is not None:
        feats = feats.observe(
            observation,
            F.count(F.lit(1)).alias("rows"),
            F.sum((F.col("_status") == 1).cast("long")).alias("decoded_rows"),
            F.sum((F.col("_status") == 2).cast("long")).alias("sniffed_fallback_rows"),
        )
    return feats.filter(F.col("_status") == 1).drop("_status")


def image_near_dup_pairs(
    media: DataFrame, max_hamming: int = 3, observation=None
) -> DataFrame:
    """Image near-duplicate pairs: dHash fingerprints -> pigeonhole
    banding -> Hamming verify (the text-SimHash physics applied to
    pixels). Output (id_a, id_b, hamming). Scale shape identical to
    ``simhash_pairs``: candidates from equality joins on 16-bit bands,
    never an all-pairs comparison."""
    from hadoop_20_warehouse_fix_spark.operators.dedup import hamming_pairs_from_bands

    return hamming_pairs_from_bands(
        image_dhash_bands(media, observation=observation), max_hamming
    )


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


def _looks_like_image(head: bytes) -> bool:
    """Magic sniff for the decodable formats: PPM, BMP, PNG, JPEG."""
    return (
        head[:2] in (b"P6", b"BM")
        or head[:8] == b"\x89PNG\r\n\x1a\n"
        or head[:3] == b"\xff\xd8\xff"
    )


def media_fingerprint_bands(
    media: DataFrame,
    n_frames: int = 3,
    observation=None,
    min_flatness: float = 0.0,
    demux_av: bool = False,
) -> DataFrame:
    """Modality-dispatched fingerprint bands over a MIXED media corpus
    — the decode gate + fingerprint stage of the multimodal training-
    set pipeline in ONE ``mapInPandas`` pass. Each payload is sniffed
    by magic (the three families are disjoint: image P6/BM/PNG/JPEG;
    audio RIFF-WAVE/fLaC; video RIFF-AVI) and routed to its modality's
    64-bit fingerprint: image dHash (:func:`dhash_image`), audio
    spectral (:func:`~.audio.audio_fingerprint`), video frame-dHash
    (:func:`~.video.dhash_video`). Output is the shared band shape
    (id, modality, n_bytes, band0..band3) — ``n_bytes`` (the payload's
    size, the pipeline's packing weight) rides along because this pass
    already holds the bytes, sparing the caller a second scan of the
    payload column (round-9 review: the capstone's separate sizes
    branch re-executed the exact-dedup shuffle) — for
    :func:`~..operators.dedup.hamming_pairs_from_bands` with
    ``key_cols=["modality"]`` — pairs form only WITHIN a modality, so
    a numerically-colliding image/audio fingerprint can never pair.

    The gate contract mirrors the per-modality band extractors:
    undecodable-but-sniffed payloads and unrecognized formats are
    DROPPED from the output (a fingerprint of a failed decode would
    manufacture pairs) and counted via ``observation`` as the
    pipeline's dropped-media ledger: ``rows`` / ``decoded_rows`` /
    ``failed_decode_rows`` / ``unrecognized_rows``, plus per-modality
    ``decoded_image_rows`` / ``decoded_audio_rows`` /
    ``decoded_video_rows``, plus ``sparse_spectrum_rows`` (audio
    gated by ``min_flatness``) and ``demuxed_track_rows`` (soundtrack
    fingerprints emitted by ``demux_av``).

    ``min_flatness`` (round 10 — the round-9 over-cluster mitigation,
    previously reachable only from the standalone audio path): audio
    whose :func:`~.audio.spectral_flatness` falls below the threshold
    is counted + dropped instead of fingerprinted. Sparse tonal
    spectra (test tones, DTMF, synthesizer beeps) leave most
    energy-comparison bits at the noise-floor tie and DIFFERENT tone
    sets land within the Hamming threshold (measured in SCALING.md
    r9: 600 distinct 4-tone clips over-clustered to 82 survivors —
    INSIDE this pipeline). Default 0.0 keeps the old behavior; ~0.1
    separates tones from speech/music-shaped spectra. The gate also
    covers demuxed soundtracks.

    ``demux_av`` (round 10 — cross-container audio dedup): each AVI
    that carries a PCM soundtrack additionally emits a SHADOW row
    (id = the video's own media_id, modality ``"audio_track"``,
    n_bytes 0 — no packing mass) holding the soundtrack's AUDIO
    fingerprint via :func:`~.video.demux_audio`. A standalone WAV
    ripped from (or muxed into) a video now shares a fingerprint
    space with that video's track, so the capstone can drop the rip —
    a pair the modality-keyed engine could never form (round-9
    verdict gap). Audio-less / non-PCM AVIs simply emit no shadow
    row. Reference analog: one update stream over heterogeneous
    inputs (``/root/reference/M/lib/MultipleInputs.java:34``).

    100 TB: row-local Arrow-batched work (decode cost is the payload's
    own bytes), zero shuffle; the scan prunes to (media_id, payload).
    Reference analog: the heterogeneous-doc index pipeline
    (``/root/reference/X/index/.../main/UpdateIndex.java:66``) feeding
    one update stream from mixed input formats."""
    from hadoop_20_warehouse_fix_spark.functions.audio import (
        _looks_like_audio,
        audio_fingerprint,
        decode_audio,
        spectral_flatness,
    )
    from hadoop_20_warehouse_fix_spark.functions.video import (
        _looks_like_avi,
        demux_audio,
        dhash_video,
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def gated(samples, rate):
            # shared flatness gate: True = too tonal to fingerprint
            if min_flatness <= 0.0:
                return False
            flat = spectral_flatness(samples, rate)
            return flat is None or flat < min_flatness

        for pdf in batches:
            rows = []
            for mid, b in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(b) if b is not None else b""
                head = b[:12]
                modality, status, bands = None, 0, (None, None, None, None)
                track = None  # optional shadow row for the AVI soundtrack
                try:
                    if _looks_like_avi(head):  # RIFF-AVI before RIFF-WAVE
                        modality, status = "video", 2
                        v = dhash_video(b, n_frames=n_frames)
                        if demux_av:
                            try:
                                ts, tr = demux_audio(b)
                                if gated(ts, tr):
                                    track = (int(mid), "audio_track", 3, 0,
                                             None, None, None, None)
                                else:
                                    tv = audio_fingerprint(ts, tr)
                                    track = (
                                        int(mid), "audio_track", 1, 0,
                                        *((tv >> (16 * i)) & 0xFFFF for i in range(4)),
                                    )
                            except (ValueError, NotImplementedError):
                                # audio-less AVI or un-fingerprintable
                                # track: no shadow row, the VIDEO row's
                                # own status is untouched
                                track = None
                    elif _looks_like_audio(head):
                        modality, status = "audio", 2
                        samples, rate = decode_audio(b)
                        if gated(samples, rate):
                            rows.append((int(mid), modality, 3, len(b), *bands))
                            continue
                        v = audio_fingerprint(samples, rate)
                    elif _looks_like_image(head[:8]):
                        modality, status = "image", 2
                        v = dhash_image(b)
                    else:
                        rows.append((int(mid), None, 0, len(b), *bands))
                        continue
                    bands = tuple((v >> (16 * i)) & 0xFFFF for i in range(4))
                    status = 1
                except (ValueError, NotImplementedError):
                    bands = (None, None, None, None)
                rows.append((int(mid), modality, status, len(b), *bands))
                if track is not None:
                    rows.append(track)
            yield pd.DataFrame(
                rows,
                columns=[
                    "id", "modality", "_status", "n_bytes",
                    "band0", "band1", "band2", "band3",
                ],
            )

    feats = media.select("media_id", "payload").mapInPandas(
        run,
        schema=(
            "id long, modality string, _status int, n_bytes long,"
            " band0 int, band1 int, band2 int, band3 int"
        ),
    )
    if observation is not None:
        decoded = F.col("_status") == 1
        # shadow soundtrack rows are NOT input payloads: they ride
        # their own counter and stay out of the per-payload ledger
        shadow = F.coalesce(F.col("modality") == "audio_track", F.lit(False))
        payload_row = (~shadow).cast("long")
        # coalesce(sum, 0): F.sum over ZERO rows is NULL, and an empty
        # corpus must read rows=0, not rows=None (round-10 review)
        z = lambda c: F.coalesce(F.sum(c), F.lit(0))  # noqa: E731
        feats = feats.observe(
            observation,
            z(payload_row).alias("rows"),
            z((decoded & ~shadow).cast("long")).alias("decoded_rows"),
            z(((F.col("_status") == 2) & ~shadow).cast("long")).alias(
                "failed_decode_rows"
            ),
            z((F.col("_status") == 0).cast("long")).alias("unrecognized_rows"),
            z((decoded & (F.col("modality") == "image")).cast("long")).alias(
                "decoded_image_rows"
            ),
            z((decoded & (F.col("modality") == "audio")).cast("long")).alias(
                "decoded_audio_rows"
            ),
            z((decoded & (F.col("modality") == "video")).cast("long")).alias(
                "decoded_video_rows"
            ),
            z((F.col("_status") == 3).cast("long")).alias(
                "sparse_spectrum_rows"
            ),
            z((decoded & shadow).cast("long")).alias("demuxed_track_rows"),
        )
    return feats.filter(F.col("_status") == 1).drop("_status")


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


def resize_batch(
    media: DataFrame,
    width: int,
    height: int,
    decode: bool = True,
    observation=None,
    on_undecodable: str = "fallback",
) -> DataFrame:
    """Arrow-batched resize over binary payloads. Decodable payloads
    (PPM/BMP/PNG magic — plus JPEG when PIL/OpenCV is present) get a
    REAL nearest-neighbor pixel resize (:func:`resize_image`); anything
    else falls back to the deterministic byte-resampler stand-in
    (width*height//64 stride-sampled bytes) so non-image corpora — e.g.
    the documents-as-media test fixture — stay deterministic. Same
    signature, batch shape, and output schema either way.

    The fallback is NOT silent (round-6 review): pass ``observation``
    (a ``pyspark.sql.Observation``) and after the first action on the
    result it carries ``rows`` / ``pixel_rows`` /
    ``sniffed_fallback_rows`` — the last counts payloads whose magic
    SAID image but no codec could decode them (e.g. JPEG in a container
    with neither PIL nor OpenCV), i.e. rows where the caller asked for
    pixels and got the stand-in. ``on_undecodable="error"`` hardens
    that to a raise at the first such payload — the right mode for a
    corpus the caller KNOWS is images, where 100% stand-in output is a
    misconfiguration (missing codec library), not a result.

    ``decode=False`` forces the byte-resampler for EVERY row: a caller
    that knows its payloads are not images (text corpora) opts out of
    magic sniffing, so a text that happens to parse as a valid PPM
    header cannot flip a row onto the pixel path and make the output
    content-dependent."""
    if on_undecodable not in ("fallback", "error"):
        raise ValueError(
            f"on_undecodable must be 'fallback' or 'error', got {on_undecodable!r}"
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        target = max(width * height // 64, 1)
        for pdf in batches:
            def sample(b):
                # status: 1 = pixel path, 2 = sniffed-as-image but no
                # codec (the counted fallback), 0 = plain byte payload
                status = 0
                if decode and b and _looks_like_image(bytes(b[:8])):
                    try:
                        return resize_image(bytes(b), width, height), 1
                    except (NotImplementedError, ValueError) as exc:
                        if on_undecodable == "error":
                            raise NotImplementedError(
                                "payload sniffed as an image but no codec "
                                "could decode it (JPEG needs PIL/OpenCV in "
                                "the container); on_undecodable='fallback' "
                                f"would substitute the byte-resampler: {exc}"
                            ) from exc
                        status = 2
                if not b:
                    return b"\x00" * target, status
                stride = max(len(b) // target, 1)
                return bytes(b[::stride][:target]).ljust(target, b"\x00"), status

            out = [sample(b) for b in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].astype("int64"),
                    "width": width,
                    "height": height,
                    "payload": [p for p, _ in out],
                    "_status": pd.Series([s for _, s in out], dtype="int32"),
                }
            )

    resized = media.select("media_id", "payload").mapInPandas(
        run, schema=RESIZED_SCHEMA + ", _status int"
    )
    if observation is not None:
        resized = resized.observe(
            observation,
            F.count(F.lit(1)).alias("rows"),
            F.sum((F.col("_status") == 1).cast("long")).alias("pixel_rows"),
            F.sum((F.col("_status") == 2).cast("long")).alias("sniffed_fallback_rows"),
        )
    return resized.drop("_status")


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
