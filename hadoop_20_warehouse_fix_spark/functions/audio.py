"""Pure-python/numpy WAV (RIFF PCM) audio codec + Arrow-batched audio ops.

Round 7: the audio modality gets the same posture images got — REAL
in-container decode for the canonical uncompressed format, with the
plumbing (schemas, mapInPandas batch shapes, sniff-dispatch,
observability) identical to what a compressed-codec library would
slot into. The reference's model is the same pluggable-codec registry
cited in :mod:`.jpeg` (``/root/reference/src/core/org/apache/hadoop/
io/compress/``).

Implements the public RIFF/WAVE container format (Microsoft/IBM
multimedia spec, as mirrored by every public implementation):

- decoder: chunked RIFF parse (unknown chunks skipped by their length
  fields — LIST/INFO/fact all ride through), ``fmt `` codes 1 (PCM:
  u8 / i16 / i24 / i32) and 3 (IEEE float32/64) and their
  WAVE_FORMAT_EXTENSIBLE (0xFFFE) wrappers, interleaved multichannel.
  Samples come back as float64 in [-1, 1), shape (frames, channels).
- encoder: PCM16 writer (fixtures + sink path).
- ``resample_linear``: vectorized linear-interpolation resample — the
  deterministic numpy stand-in for a polyphase resampler, exact for
  the piecewise-linear signals tests pin.

Compressed audio: FLAC decodes PURE and bit-exact as of round 8
(:mod:`.flac` — lossless, so exact recovery is the test contract; it
is also what real speech corpora like LibriSpeech ship as). Lossy
codecs (MP3/AAC/Vorbis/Opus) stay library-gated: the sniff in
:func:`audio_features` routes undecodable payloads onto the byte
stand-in and counts them, exactly like ``resize_batch`` does for
non-baseline-JPEG images.
"""

from __future__ import annotations

import struct

import numpy as np


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """Decode a RIFF/WAVE payload to (samples, sample_rate); samples is
    float64 in [-1, 1), shape (frames, channels).

    Exception contract (as in :mod:`.jpeg`): corrupt/truncated ->
    ValueError, unsupported format code / bit depth ->
    NotImplementedError; nothing else escapes to the batch operators."""
    try:
        return _decode_wav_impl(data)
    except (IndexError, struct.error) as exc:
        raise ValueError(f"corrupt/truncated WAV: {exc}") from exc


def _decode_wav_impl(data: bytes) -> tuple[np.ndarray, int]:
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, n = 12, len(data)
    fmt = None
    raw = None
    while pos + 8 <= n:
        cid = data[pos : pos + 4]
        (clen,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + clen]
        if cid == b"fmt ":
            code, channels, rate, _byte_rate, block_align, bits = struct.unpack(
                "<HHIIHH", body[:16]
            )
            if code == 0xFFFE and clen >= 40:  # WAVE_FORMAT_EXTENSIBLE
                # the real format code leads the 16-byte SubFormat GUID
                (code,) = struct.unpack("<H", body[24:26])
            fmt = (code, channels, rate, block_align, bits)
        elif cid == b"data":
            raw = body
        pos += 8 + clen + (clen & 1)  # chunks are word-aligned
    if fmt is None or raw is None:
        raise ValueError("WAV missing fmt/data chunk")
    code, channels, rate, _block_align, bits = fmt
    if channels < 1:
        raise ValueError("WAV with zero channels")
    if code == 1:  # integer PCM
        if bits == 8:  # unsigned, offset-binary
            x = (np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
        elif bits == 16:
            x = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
        elif bits == 24:
            b = np.frombuffer(raw, dtype=np.uint8)
            b = b[: len(b) - len(b) % 3].reshape(-1, 3).astype(np.int64)
            v = b[:, 0] | (b[:, 1] << 8) | (b[:, 2] << 16)
            v -= (v & 0x800000) << 1  # sign-extend 24-bit
            x = v.astype(np.float64) / 8388608.0
        elif bits == 32:
            x = np.frombuffer(raw, dtype="<i4").astype(np.float64) / 2147483648.0
        else:
            raise NotImplementedError(f"{bits}-bit integer PCM")
    elif code == 3:  # IEEE float
        if bits == 32:
            x = np.frombuffer(raw, dtype="<f4").astype(np.float64)
        elif bits == 64:
            x = np.frombuffer(raw, dtype="<f8").astype(np.float64)
        else:
            raise NotImplementedError(f"{bits}-bit float PCM")
    else:
        raise NotImplementedError(
            f"WAV format code {code} (compressed audio needs a codec library)"
        )
    frames = len(x) // channels
    return x[: frames * channels].reshape(frames, channels), rate


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """Encode (frames,) or (frames, channels) float samples in [-1, 1]
    as 16-bit PCM WAV."""
    s = np.asarray(samples, dtype=np.float64)
    if s.ndim == 1:
        s = s[:, None]
    channels = s.shape[1]
    pcm = np.clip(np.round(s * 32767.0), -32768, 32767).astype("<i2")
    raw = pcm.reshape(-1).tobytes()
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sample_rate, sample_rate * channels * 2, channels * 2, 16
    )
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(raw)) + raw
    return b"RIFF" + struct.pack("<I", len(body)) + body


def resample_linear(samples: np.ndarray, from_rate: int, to_rate: int) -> np.ndarray:
    """Linear-interpolation resample along axis 0 (per channel),
    deterministic pure numpy. Output length = round(frames * to/from)."""
    s = np.asarray(samples, dtype=np.float64)
    one_d = s.ndim == 1
    if one_d:
        s = s[:, None]
    frames = s.shape[0]
    out_frames = max(int(round(frames * to_rate / from_rate)), 1)
    if frames == 1:
        out = np.repeat(s, out_frames, axis=0)
    else:
        xi = np.arange(out_frames) * (frames - 1) / max(out_frames - 1, 1)
        out = np.stack(
            [np.interp(xi, np.arange(frames), s[:, c]) for c in range(s.shape[1])],
            axis=1,
        )
    return out[:, 0] if one_d else out


def _looks_like_wav(head: bytes) -> bool:
    return len(head) >= 12 and head[:4] == b"RIFF" and head[8:12] == b"WAVE"


def _looks_like_audio(head: bytes) -> bool:
    """Sniff for the decodable audio containers: RIFF/WAVE or FLAC."""
    return _looks_like_wav(head) or head[:4] == b"fLaC"


def decode_audio(data: bytes):
    """ONE audio decode chokepoint: WAV via :func:`decode_wav`, FLAC
    via :func:`~.flac.decode_flac` (round 8 — lossless compressed
    audio decodes pure and bit-exact; lossy codecs stay
    library-gated). Returns (samples, rate), the shared contract."""
    if data[:4] == b"fLaC":
        from hadoop_20_warehouse_fix_spark.functions.flac import decode_flac

        return decode_flac(data)
    return decode_wav(data)


AUDIO_FEATURES_SCHEMA = (
    "media_id long, decoded boolean, duration_ms long, sample_rate int, "
    "channels int, rms double, peak double, zero_crossing_rate double"
)


def audio_features(media, observation=None):
    """Arrow-batched audio feature extraction over binary payloads:
    RIFF/WAVE and FLAC payloads REALLY decode (``decode_audio``) and yield
    duration / rate / channels / RMS / peak / zero-crossing-rate
    (channel-mean signal); anything else — including compressed audio
    without a codec library — yields ``decoded=false`` with null
    features, counted via ``observation`` (``rows`` / ``decoded_rows``
    / ``sniffed_fallback_rows``, the resize_batch observability
    contract). Feature math is vectorized numpy per payload; the
    Python-per-row cost is the decode itself, same scale posture as
    the image codecs."""
    import pandas as pd
    from pyspark.sql import functions as F

    def run(batches):
        for pdf in batches:
            rows = []
            for mid, b in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(b) if b is not None else b""
                status = 0
                vals = (None, None, None, None, None, None)
                if _looks_like_audio(b[:12]):
                    try:
                        s, rate = decode_audio(b)
                        mono = s.mean(axis=1)
                        frames = s.shape[0]
                        zc = (
                            float(np.count_nonzero(np.diff(np.signbit(mono))))
                            / max(frames - 1, 1)
                        )
                        vals = (
                            int(frames * 1000 // max(rate, 1)),
                            int(rate),
                            int(s.shape[1]),
                            float(np.sqrt(np.mean(mono**2))) if frames else 0.0,
                            float(np.abs(mono).max()) if frames else 0.0,
                            zc,
                        )
                        status = 1
                    except (ValueError, NotImplementedError):
                        status = 2  # sniffed as audio, undecodable
                rows.append((int(mid), status, *vals))
            out = pd.DataFrame(
                rows,
                columns=[
                    "media_id", "_status", "duration_ms", "sample_rate",
                    "channels", "rms", "peak", "zero_crossing_rate",
                ],
            )
            out.insert(1, "decoded", out["_status"] == 1)
            yield out

    feats = media.select("media_id", "payload").mapInPandas(
        run,
        schema=(
            "media_id long, decoded boolean, _status int, duration_ms long, "
            "sample_rate int, channels int, rms double, peak double, "
            "zero_crossing_rate double"
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


def stft_magnitudes(
    samples: np.ndarray, frame: int = 256, hop: int = 128, window: str = "hann"
) -> np.ndarray:
    """Magnitude short-time Fourier transform — (n_frames, frame//2+1)
    float64, vectorized numpy (stride-tricked framing + one batched
    rfft). ``window="hann"`` (the textbook periodic Hann) or "rect".
    The ASR front-end primitive: downstream mel/log compression are
    cheap matrix ops on this output. Signals shorter than one frame
    yield an empty (0, frame//2+1) array."""
    s = np.asarray(samples, dtype=np.float64)
    if s.ndim == 2:
        s = s.mean(axis=1)  # channel-mean, matching audio_features
    if frame < 2 or hop < 1:
        raise ValueError(f"frame must be >= 2 and hop >= 1, got {frame}, {hop}")
    if len(s) < frame:
        return np.zeros((0, frame // 2 + 1))
    n_frames = 1 + (len(s) - frame) // hop
    idx = np.arange(frame)[None, :] + hop * np.arange(n_frames)[:, None]
    frames = s[idx]
    if window == "hann":
        frames = frames * (0.5 - 0.5 * np.cos(2 * np.pi * np.arange(frame) / frame))
    elif window != "rect":
        raise ValueError(f"window must be 'hann' or 'rect', got {window!r}")
    return np.abs(np.fft.rfft(frames, axis=1))


def spectral_features(samples: np.ndarray, rate: int, frame: int = 256, hop: int = 128) -> dict:
    """Clip-level spectral summary from the mean STFT magnitude:
    dominant_freq_hz (peak bin), spectral_centroid_hz (magnitude-
    weighted mean frequency). Deterministic, analytic on pure tones
    (pytest-pinned: a bin-aligned sine's dominant bin is exact)."""
    mag = stft_magnitudes(samples, frame, hop)
    if mag.shape[0] == 0:
        return {"dominant_freq_hz": None, "spectral_centroid_hz": None}
    mean_mag = mag.mean(axis=0)
    freqs = np.arange(len(mean_mag)) * rate / frame
    total = mean_mag.sum()
    return {
        "dominant_freq_hz": float(freqs[int(mean_mag.argmax())]),
        "spectral_centroid_hz": float((freqs * mean_mag).sum() / total) if total > 0 else None,
    }


def spectral_flatness(samples: np.ndarray, rate: int, frame: int = 256) -> float | None:
    """Wiener entropy of the mean STFT magnitude spectrum: geometric
    mean / arithmetic mean of the power bins, in (0, 1] — ~1 for white
    noise (flat spectrum), ->0 for pure tones (all energy in a few
    bins). The standard sparse-vs-broadband discriminator (public DSP
    textbook measure), used as the fingerprint's operating-envelope
    gate (SCALING.md r9: 600 distinct 4-tone clips over-clustered to
    82 survivors — with <=4 spectral peaks, most band-energy bits sit
    at the noise-floor tie). None for signals shorter than one frame."""
    mag = stft_magnitudes(samples, frame=frame)
    if mag.shape[0] == 0:
        return None
    power = mag.mean(axis=0) ** 2 + 1e-30
    return float(np.exp(np.log(power).mean()) / power.mean())


def audio_fingerprint(
    samples: np.ndarray,
    rate: int,
    n_time: int = 8,
    n_bands: int = 9,
    fmin: float = 100.0,
    fmax: float = 2000.0,
    frame_ms: int = 64,
) -> int:
    """64-bit spectral fingerprint — the audio member of the near-dup
    matrix: an (8 time-segments x 9 log-spaced-bands) energy grid, bit
    (t, b) = 1 iff band b's energy exceeds segment t's MEAN band energy
    (b = 0..7; band 8 contributes to the mean only). The
    energy-comparison-sign idea is Haitsma & Kalker 2002 ("A Highly
    Robust Audio Fingerprinting System", public); the mean-reference
    form (rather than adjacent-band differences) keeps discrimination
    on SPARSE tonal spectra, where empty guard bands make adjacent
    comparisons blind to amplitude ordering. Collapsing to one 64-bit
    clip hash makes it a drop-in for
    :func:`~..operators.dedup.hamming_pairs_from_bands`.

    Invariances (pytest-pinned, analytic):
    - GAIN: exact — scaling the signal scales every grid cell by the
      same factor, preserving every comparison (the +40-brightness
      analog of dHash).
    - RESAMPLE: approximate — the frame length is a fixed DURATION
      (``frame_ms``), so STFT bins map to absolute Hz at any sample
      rate, and band edges are Hz; time segments are relative. fmax
      must stay under the lower Nyquist for this to hold.

    Raises ValueError for clips too short to fill every time segment
    with at least one STFT frame (a fingerprint of silence-padding
    would manufacture pairs — callers drop + count, the
    ``image_dhash_bands`` discipline)."""
    s = np.asarray(samples, dtype=np.float64)
    if s.ndim == 2:
        s = s.mean(axis=1)
    if rate < 1:
        raise ValueError(f"sample rate must be >= 1, got {rate}")
    frame = max(int(round(rate * frame_ms / 1000.0)), 2)
    hop = max(frame // 2, 1)
    mag = stft_magnitudes(s, frame=frame, hop=hop)
    n_frames = mag.shape[0]
    if n_frames < n_time:
        raise ValueError(
            f"clip too short to fingerprint: {n_frames} STFT frames < "
            f"{n_time} time segments"
        )
    energy = mag**2
    # log-spaced band edges in absolute Hz; bin k sits at k*rate/frame Hz
    edges = fmin * (fmax / fmin) ** (np.arange(n_bands + 1) / n_bands)
    bin_hz = np.arange(mag.shape[1]) * rate / frame
    band_of_bin = np.searchsorted(edges, bin_hz, side="right") - 1
    in_range = (band_of_bin >= 0) & (band_of_bin < n_bands)
    if not in_range.any():
        # a rate so low no STFT bin lands inside [fmin, fmax) would
        # hash EVERY such clip to the constant 0 — manufactured pairs,
        # the exact failure the too-short guard above exists for
        raise ValueError(
            f"sample rate {rate} puts no spectral bin inside the "
            f"[{fmin}, {fmax}) Hz band range — clip cannot be fingerprinted"
        )
    seg_of_frame = np.arange(n_frames) * n_time // n_frames
    # two indicator matmuls (BLAS) instead of scatter-adds:
    # grid[t, b] = sum over frames in segment t, bins in band b
    band_ind = band_of_bin[in_range][:, None] == np.arange(n_bands)[None, :]
    seg_ind = seg_of_frame[:, None] == np.arange(n_time)[None, :]
    grid = seg_ind.T.astype(np.float64) @ (energy[:, in_range] @ band_ind)
    # bit (t, b): band b above segment t's mean band energy (b < n_bands-1)
    row_sum = grid.sum(axis=1, keepdims=True)
    bits = (grid[:, :-1] * n_bands > row_sum).flatten()
    v = 0
    for i, b in enumerate(bits):
        if b:
            v |= 1 << i
    return v


def audio_fingerprint_bands(media, observation=None, min_flatness: float = 0.0):
    """Each decodable WAV/FLAC payload's fingerprint as (id, band0..band3)
    16-bit bands — the exact input shape of
    :func:`~..operators.dedup.hamming_pairs_from_bands`, completing the
    near-dup matrix text/image/AUDIO on ONE pair engine. Undecodable
    or too-short payloads are dropped (no fingerprint, no manufactured
    pairs) and counted via ``observation`` (``rows`` / ``decoded_rows``
    / ``sniffed_fallback_rows`` / ``sparse_spectrum_rows``).

    ``min_flatness`` (round 9, the SCALING.md r9 mitigation made
    code): clips whose :func:`spectral_flatness` falls below the
    threshold are counted + dropped instead of fingerprinted — sparse
    tonal content (synthesizer beeps, test tones, DTMF) leaves most
    energy-comparison bits at the noise-floor tie, and DIFFERENT tone
    sets land within the Hamming threshold (measured: 600 distinct
    4-tone clips over-clustered to 82). Default 0.0 keeps the old
    behavior; ~0.1 separates tones from speech/music-shaped spectra."""
    import pandas as pd
    from pyspark.sql import functions as F

    def run(batches):
        for pdf in batches:
            rows = []
            for mid, b in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(b) if b is not None else b""
                status = 0
                bands = (None, None, None, None)
                if _looks_like_audio(b[:12]):
                    try:
                        samples, rate = decode_audio(b)
                        if min_flatness > 0.0:
                            flat = spectral_flatness(samples, rate)
                            if flat is None or flat < min_flatness:
                                rows.append((int(mid), 3, *bands))
                                continue
                        v = audio_fingerprint(samples, rate)
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
            F.sum((F.col("_status") == 3).cast("long")).alias("sparse_spectrum_rows"),
        )
    return feats.filter(F.col("_status") == 1).drop("_status")


def audio_near_dup_pairs(
    media, max_hamming: int = 3, observation=None, min_flatness: float = 0.0
):
    """Audio near-duplicate pairs: spectral fingerprints -> pigeonhole
    banding -> Hamming verify — the text-SimHash / image-dHash physics
    applied to sound. Output (id_a, id_b, hamming); candidates come
    from equality joins on 16-bit bands, never an all-pairs compare.
    ``min_flatness`` forwards the sparse-spectrum gate (see
    :func:`audio_fingerprint_bands`)."""
    from hadoop_20_warehouse_fix_spark.operators.dedup import hamming_pairs_from_bands

    return hamming_pairs_from_bands(
        audio_fingerprint_bands(
            media, observation=observation, min_flatness=min_flatness
        ),
        max_hamming,
    )
