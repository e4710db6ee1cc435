"""Pure-python MJPEG/AVI video container — the last modality made real.

Round 7 closed images (baseline JPEG, :mod:`.jpeg`) and audio
(RIFF/WAVE, :mod:`.audio`); this module closes video for the one
container the two of them already pay for: AVI is RIFF (the same
chunk grammar as WAV), and Motion-JPEG frames are baseline JPEGs.
So an MJPEG .avi decodes in-container end-to-end with zero new
codec machinery — container walk here, pixels from
:func:`.jpeg.decode_jpeg`.

Public formats only: the RIFF/AVI layout (Microsoft multimedia spec:
``RIFF('AVI ') { LIST('hdrl'){ avih, LIST('strl'){ strh, strf } },
LIST('movi'){ '00dc'... } }``) and the JPEG baseline process.
Inter-coded video (H.264/VP9/AV1) stays library-gated, exactly like
compressed audio — the sniff routes it onto the counted byte-slicing
stand-in in :func:`sample_frames_real`.

Exception contract as everywhere in this package: corrupt/truncated
-> ValueError, recognized-but-unsupported -> NotImplementedError;
nothing else escapes to the batch operators (fuzz-pinned).
"""

from __future__ import annotations

import struct

import numpy as np

_MAX_FRAMES = 100_000  # corrupt-header allocation guard (fuzz discipline)


def parse_avi(data: bytes) -> dict:
    """Walk an AVI's RIFF tree; return {width, height, usec_per_frame,
    frames: [bytes, ...], audio: bytes, audio_fmt: bytes | None}.
    ``frames`` are stream-0 video chunks ('00dc'/'00db'); ``audio`` is
    the concatenated stream-1 '01wb' payload with ``audio_fmt`` the
    'auds' strf body (a WAVEFORMAT(EX) — exactly the bytes a WAV
    'fmt ' chunk carries, which is how :func:`demux_audio` reuses the
    audio module's decoder)."""
    try:
        return _parse_avi_impl(data)
    except (IndexError, struct.error) as exc:
        raise ValueError(f"corrupt/truncated AVI: {exc}") from exc


def _parse_avi_impl(data: bytes) -> dict:
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI payload")
    meta = {
        "width": None, "height": None, "usec_per_frame": None,
        "frames": [], "audio": b"", "audio_fmt": None,
    }
    audio_parts: list[bytes] = []
    strl_types: list[bytes] = []  # per-stream fccType, in strl order

    # Iterative DFS with an explicit stack (round-7 ADVICE: a crafted
    # ~60KB AVI with deeply nested LISTs blew the Python recursion limit,
    # escaping the (ValueError, NotImplementedError) contract). The stack
    # holds (resume_pos, end) continuations; traversal order is identical
    # to the recursive in-order walk, so strh/strf pairing and frame
    # order are unchanged.
    stack: list[tuple[int, int]] = [(12, len(data))]
    while stack:
        pos, end = stack.pop()
        while pos + 8 <= end:
            cid = data[pos : pos + 4]
            (clen,) = struct.unpack("<I", data[pos + 4 : pos + 8])
            body_start = pos + 8
            body_end = min(body_start + clen, end)
            if cid == b"LIST":
                # descend now, resume the current level's siblings later
                stack.append((body_start + clen + (clen & 1), end))
                pos, end = body_start + 4, body_end
                continue
            elif cid == b"avih" and clen >= 40:
                meta["usec_per_frame"] = struct.unpack("<I", data[body_start : body_start + 4])[0]
                meta["width"], meta["height"] = struct.unpack(
                    "<II", data[body_start + 32 : body_start + 40]
                )
            elif cid == b"strh" and clen >= 4:
                strl_types.append(data[body_start : body_start + 4])
            elif cid == b"strf" and strl_types and strl_types[-1] == b"auds":
                meta["audio_fmt"] = data[body_start:body_end]
            elif cid in (b"00dc", b"00db"):
                if len(meta["frames"]) >= _MAX_FRAMES:
                    raise ValueError(f"AVI exceeds the {_MAX_FRAMES}-frame cap")
                meta["frames"].append(data[body_start:body_end])
            elif cid == b"01wb":
                audio_parts.append(data[body_start:body_end])
            pos = body_start + clen + (clen & 1)  # chunks are word-aligned

    meta["audio"] = b"".join(audio_parts)
    if not meta["frames"] and not meta["audio"]:
        raise ValueError("AVI contains no video or audio chunks")
    return meta


def demux_audio(data: bytes):
    """Extract an AVI's PCM soundtrack as (samples, sample_rate) —
    the ASR-training-data path (pull speech out of video corpora).
    Implementation is pure reuse: the 'auds' strf IS a WAV 'fmt '
    body, so the demux rebuilds a minimal RIFF/WAVE shell around the
    concatenated '01wb' chunks and hands it to
    :func:`~..audio.decode_wav` — one decoder, two containers.
    Raises ValueError when the AVI carries no audio stream."""
    from hadoop_20_warehouse_fix_spark.functions.audio import decode_wav

    meta = parse_avi(data)
    if not meta["audio"] or meta["audio_fmt"] is None:
        raise ValueError("AVI carries no audio stream")
    fmt = meta["audio_fmt"]
    raw = meta["audio"]
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt + (b"\x00" if len(fmt) & 1 else b"")
        + b"data" + struct.pack("<I", len(raw)) + raw
    )
    return decode_wav(b"RIFF" + struct.pack("<I", len(body)) + body)


def decode_avi_frames(data: bytes, indices: list[int] | None = None) -> list[np.ndarray]:
    """Decode selected frames (default: all) of an MJPEG AVI to
    (H, W, 3) uint8 arrays. Non-JPEG frame payloads (an inter-coded
    codec in an AVI shell) raise NotImplementedError."""
    from hadoop_20_warehouse_fix_spark.functions.jpeg import decode_jpeg

    meta = parse_avi(data)
    frames = meta["frames"]
    if not frames:
        raise ValueError("AVI contains no video frame chunks")
    out = []
    for i in indices if indices is not None else range(len(frames)):
        f = frames[i]
        if f[:3] != b"\xff\xd8\xff":
            raise NotImplementedError(
                "AVI frame is not MJPEG (inter-coded codecs need a library)"
            )
        out.append(decode_jpeg(f))
    return out


def encode_avi_mjpeg(
    frames: list[np.ndarray],
    fps: int = 10,
    quant: int = 8,
    audio: np.ndarray | None = None,
    audio_rate: int = 8000,
) -> bytes:
    """Minimal spec-conformant MJPEG AVI writer (fixtures + sink path):
    avih + one 'vids'/'MJPG' stream (strh + BITMAPINFOHEADER strf) +
    a movi LIST of baseline-JPEG '00dc' chunks. ``audio`` (float
    samples in [-1, 1], mono or (frames, channels)) adds a second
    'auds' PCM16 stream — WAVEFORMATEX strf + one '01wb' chunk."""
    from hadoop_20_warehouse_fix_spark.functions.jpeg import encode_jpeg

    if not frames:
        raise ValueError("need at least one frame")
    h, w = frames[0].shape[0], frames[0].shape[1]
    payloads = [encode_jpeg(f, quant=quant) for f in frames]

    def chunk(cid: bytes, body: bytes) -> bytes:
        return cid + struct.pack("<I", len(body)) + body + (b"\x00" if len(body) & 1 else b"")

    def lst(ltype: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", ltype + body)

    usec = 1_000_000 // max(fps, 1)
    n_streams = 1 if audio is None else 2
    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        usec, 0, 0, 0x10, len(payloads), 0, n_streams, 0, w, h, 0, 0, 0, 0
    )
    strh = (
        b"vids" + b"MJPG" + struct.pack("<IHHIIIIIIIII", 0, 0, 0, 0, 1, fps, 0, len(payloads), 0, 0, 0, 0)
        + struct.pack("<hhhh", 0, 0, w, h)
    )
    strf = struct.pack("<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG", w * h * 3, 0, 0, 0, 0)
    strls = lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf))
    audio_chunks = b""
    if audio is not None:
        s = np.asarray(audio, dtype=np.float64)
        if s.ndim == 1:
            s = s[:, None]
        ch = s.shape[1]
        pcm = np.clip(np.round(s * 32767.0), -32768, 32767).astype("<i2").reshape(-1).tobytes()
        astrh = (
            b"auds" + b"\x00\x00\x00\x00"
            + struct.pack("<IHHIIIIIIIII", 0, 0, 0, 0, 1, audio_rate, 0, s.shape[0], 0, 0, 0, 0)
            + struct.pack("<hhhh", 0, 0, 0, 0)
        )
        # WAVEFORMATEX: tag=1 (PCM), channels, rate, byte-rate, block, bits, cbSize
        astrf = struct.pack(
            "<HHIIHHH", 1, ch, audio_rate, audio_rate * ch * 2, ch * 2, 16, 0
        )
        strls += lst(b"strl", chunk(b"strh", astrh) + chunk(b"strf", astrf))
        audio_chunks = chunk(b"01wb", pcm)
    hdrl = lst(b"hdrl", chunk(b"avih", avih) + strls)
    movi = lst(b"movi", b"".join(chunk(b"00dc", p) for p in payloads) + audio_chunks)
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _looks_like_avi(head: bytes) -> bool:
    return len(head) >= 12 and head[:4] == b"RIFF" and head[8:12] == b"AVI "


def sample_frames_real(media, n_frames: int = 4, observation=None):
    """REAL frame sampling: MJPEG-AVI payloads get ``n_frames``
    evenly-spaced frames DECODED to pixels and re-encoded as PPM
    (deterministic, library-free); anything else — inter-coded video,
    non-AVI containers, plain bytes — falls back to the byte-window
    slicing of :func:`multimodal.sample_frames`, counted via
    ``observation`` (``rows`` / ``decoded_rows`` /
    ``sniffed_fallback_rows`` — the package observability contract).
    Output schema matches the stand-in operator exactly
    (media_id, frame_idx, frame)."""
    import pandas as pd
    from pyspark.sql import functions as F

    from hadoop_20_warehouse_fix_spark.functions.multimodal import encode_ppm

    def run(batches):
        for pdf in batches:
            ids, idxs, frames_out, statuses = [], [], [], []
            for mid, b in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(b) if b is not None else b""
                status = 0
                decoded = None
                if _looks_like_avi(b[:12]):
                    try:
                        meta = parse_avi(b)
                        total = len(meta["frames"])
                        picks = [min(i * total // n_frames, total - 1) for i in range(n_frames)]
                        decoded = decode_avi_frames(b, picks)
                        status = 1
                    except (ValueError, NotImplementedError):
                        decoded = None
                        status = 2  # sniffed as video, undecodable
                if decoded is not None:
                    outs = [encode_ppm(arr) for arr in decoded]
                else:
                    step = max(len(b) // n_frames, 1)
                    outs = [bytes(b[i * step : (i + 1) * step]) for i in range(n_frames)]
                for i, fb in enumerate(outs):
                    ids.append(int(mid))
                    idxs.append(i)
                    frames_out.append(fb)
                    statuses.append(status)
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame": frames_out,
                    "_status": pd.Series(statuses, dtype="int32"),
                }
            )

    out = media.select("media_id", "payload").mapInPandas(
        run, schema="media_id long, frame_idx int, frame binary, _status int"
    )
    if observation is not None:
        out = out.observe(
            observation,
            F.count(F.lit(1)).alias("rows"),
            F.sum((F.col("_status") == 1).cast("long")).alias("decoded_rows"),
            F.sum((F.col("_status") == 2).cast("long")).alias("sniffed_fallback_rows"),
        )
    return out.drop("_status")


AUDIO_TRACK_SCHEMA = (
    "media_id long, decoded boolean, sample_rate int, channels int, "
    "duration_ms long, wav binary"
)


def extract_audio_track(media, observation=None):
    """Demux each AVI payload's PCM soundtrack and return it as a
    standalone WAV payload (media_id, decoded, sample_rate, channels,
    duration_ms, wav) — the ASR-pipeline composition point: the output
    ``wav`` column feeds :func:`~..audio.audio_features` (or any
    downstream speech stage) directly, so video corpora become audio
    corpora in one operator. Non-AVI / audio-less / non-PCM payloads
    come back ``decoded=false`` with nulls, counted via ``observation``
    (``rows`` / ``decoded_rows`` / ``sniffed_fallback_rows`` — the
    package observability contract)."""
    import pandas as pd
    from pyspark.sql import functions as F

    from hadoop_20_warehouse_fix_spark.functions.audio import encode_wav

    def run(batches):
        for pdf in batches:
            rows = []
            for mid, b in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(b) if b is not None else b""
                status, vals = 0, (None, None, None, None)
                if _looks_like_avi(b[:12]):
                    try:
                        samples, rate = demux_audio(b)
                        vals = (
                            int(rate),
                            int(samples.shape[1]),
                            int(samples.shape[0] * 1000 // max(rate, 1)),
                            encode_wav(samples, rate),
                        )
                        status = 1
                    except (ValueError, NotImplementedError):
                        status = 2  # sniffed as AVI, no demuxable audio
                rows.append((int(mid), status == 1, status, *vals))
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "decoded", "_status", "sample_rate",
                    "channels", "duration_ms", "wav",
                ],
            )

    out = media.select("media_id", "payload").mapInPandas(
        run,
        schema=(
            "media_id long, decoded boolean, _status int, sample_rate int, "
            "channels int, duration_ms long, wav binary"
        ),
    )
    if observation is not None:
        out = out.observe(
            observation,
            F.count(F.lit(1)).alias("rows"),
            F.sum((F.col("_status") == 1).cast("long")).alias("decoded_rows"),
            F.sum((F.col("_status") == 2).cast("long")).alias("sniffed_fallback_rows"),
        )
    return out.drop("_status")


def dhash_video(data: bytes, n_frames: int = 3) -> int:
    """64-bit perceptual video fingerprint: dHash
    (:func:`~.multimodal.dhash_pixels` — the image recipe, unchanged)
    of ``n_frames`` evenly-sampled DECODED frames, combined by
    per-bit MAJORITY vote. Majority absorbs a single divergent frame
    (an inserted title card, a re-encode artifact burst) while
    inheriting dHash's exact brightness-shift invariance per frame;
    re-encoding the same frames at a different JPEG quality moves only
    the bits whose 9x8 cells sit near a comparison boundary.
    Raises like the container/codec stack (ValueError /
    NotImplementedError) for undecodable payloads."""
    from hadoop_20_warehouse_fix_spark.functions.multimodal import dhash_pixels

    meta = parse_avi(data)
    total = len(meta["frames"])
    if not total:
        raise ValueError("AVI contains no video frame chunks")
    picks = sorted({min(i * total // n_frames, total - 1) for i in range(n_frames)})
    hashes = [dhash_pixels(fr) for fr in decode_avi_frames(data, picks)]
    v = 0
    for bit in range(64):
        if sum((h >> bit) & 1 for h in hashes) * 2 > len(hashes):
            v |= 1 << bit
    return v


def video_fingerprint_bands(media, n_frames: int = 3, observation=None):
    """Each decodable MJPEG-AVI payload's video fingerprint as
    (id, band0..band3) 16-bit bands — the near-dup matrix's VIDEO
    member on the shared
    :func:`~..operators.dedup.hamming_pairs_from_bands` machinery
    (text SimHash, image dHash, audio spectral, video frame-dHash:
    ONE pair engine, four modalities). Undecodable payloads are
    dropped + counted (``rows`` / ``decoded_rows`` /
    ``sniffed_fallback_rows``)."""
    import pandas as pd
    from pyspark.sql import functions as F

    def run(batches):
        for pdf in batches:
            rows = []
            for mid, b in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(b) if b is not None else b""
                status = 0
                bands = (None, None, None, None)
                if _looks_like_avi(b[:12]):
                    try:
                        v = dhash_video(b, n_frames=n_frames)
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


def video_near_dup_pairs(media, max_hamming: int = 3, n_frames: int = 3, observation=None):
    """Video near-duplicate pairs: frame-dHash fingerprints ->
    pigeonhole banding -> Hamming verify. Output (id_a, id_b,
    hamming); candidates from equality joins on 16-bit bands, never an
    all-pairs compare."""
    from hadoop_20_warehouse_fix_spark.operators.dedup import hamming_pairs_from_bands

    return hamming_pairs_from_bands(
        video_fingerprint_bands(media, n_frames=n_frames, observation=observation),
        max_hamming,
    )
