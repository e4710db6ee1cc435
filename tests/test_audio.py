"""WAV codec + audio-feature operator tests (round 7).

Same validation strategy as the image codecs: decoders are pinned
against HAND-BUILT spec bitstreams (RIFF chunks assembled with struct,
sample values analytic), the encoder via roundtrip through the pinned
decoder, and the Spark operator end-to-end with the observability
contract."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from hadoop_20_warehouse_fix_spark.functions.audio import (
    decode_wav,
    encode_wav,
    resample_linear,
)


def _riff(*chunks: bytes) -> bytes:
    body = b"WAVE" + b"".join(chunks)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _chunk(cid: bytes, body: bytes) -> bytes:
    return cid + struct.pack("<I", len(body)) + body + (b"\x00" if len(body) & 1 else b"")


def _fmt(code=1, channels=1, rate=8000, bits=16) -> bytes:
    block = channels * bits // 8
    return _chunk(
        b"fmt ", struct.pack("<HHIIHH", code, channels, rate, rate * block, block, bits)
    )


def test_decode_handbuilt_pcm16_values():
    # samples 0, 16384, -16384, -32768 -> 0.0, 0.5, -0.5, -1.0 exactly
    data = _riff(_fmt(), _chunk(b"data", struct.pack("<4h", 0, 16384, -16384, -32768)))
    s, rate = decode_wav(data)
    assert rate == 8000 and s.shape == (4, 1)
    assert s[:, 0].tolist() == [0.0, 0.5, -0.5, -1.0]


def test_decode_skips_unknown_chunks_and_word_aligns():
    # LIST chunk (odd length, pad byte) before fmt/data must ride through
    data = _riff(
        _chunk(b"LIST", b"INFOabc"),  # 7 bytes -> padded
        _fmt(rate=44100),
        _chunk(b"data", struct.pack("<2h", 32767, 0)),
    )
    s, rate = decode_wav(data)
    assert rate == 44100 and s.shape == (2, 1)
    assert abs(s[0, 0] - 32767 / 32768) < 1e-12


def test_decode_u8_i24_f32_paths():
    # u8 offset-binary: 128 -> 0.0, 255 -> 0.9921875, 0 -> -1.0
    d8 = _riff(_fmt(bits=8), _chunk(b"data", bytes([128, 255, 0])))
    s8, _ = decode_wav(d8)
    assert s8[:, 0].tolist() == [0.0, 127 / 128, -1.0]
    # i24 little-endian: 0x400000 -> 0.5; 0xC00000 (sign) -> -0.5
    d24 = _riff(
        _fmt(bits=24),
        _chunk(b"data", bytes([0x00, 0x00, 0x40]) + bytes([0x00, 0x00, 0xC0])),
    )
    s24, _ = decode_wav(d24)
    assert s24[:, 0].tolist() == [0.5, -0.5]
    # float32 passthrough (format code 3)
    df32 = _riff(_fmt(code=3, bits=32), _chunk(b"data", struct.pack("<2f", 0.25, -1.0)))
    sf32, _ = decode_wav(df32)
    assert sf32[:, 0].tolist() == [0.25, -1.0]


def test_decode_extensible_wrapper():
    # WAVE_FORMAT_EXTENSIBLE (0xFFFE): the real code leads the SubFormat
    ext = struct.pack("<HHIIHH", 0xFFFE, 1, 16000, 32000, 2, 16)
    ext += struct.pack("<HHI", 16, 0, 0) + struct.pack("<H", 1) + b"\x00" * 14
    data = _riff(_chunk(b"fmt ", ext), _chunk(b"data", struct.pack("<h", 16384)))
    s, rate = decode_wav(data)
    assert rate == 16000 and s[0, 0] == 0.5


def test_decode_rejects_non_wav_and_compressed():
    with pytest.raises(ValueError, match="RIFF"):
        decode_wav(b"not audio at all")
    mp3ish = _riff(_fmt(code=85), _chunk(b"data", b"\x00\x00"))
    with pytest.raises(NotImplementedError, match="format code 85"):
        decode_wav(mp3ish)


def test_encode_decode_roundtrip_stereo():
    rng = np.random.default_rng(5)
    s = rng.uniform(-1, 1, size=(500, 2))
    out, rate = decode_wav(encode_wav(s, 22050))
    assert rate == 22050 and out.shape == (500, 2)
    # 16-bit quantization + the standard asymmetric scale convention
    # (encode x32767, decode /32768): |round(s*32767)/32768 - s| is
    # bounded by (0.5 + |s|)/32768
    assert np.abs(out - s).max() <= 1.5 / 32768


def test_resample_linear_exact_on_linear_signal():
    # a linear ramp is reproduced EXACTLY by linear interpolation
    ramp = np.linspace(0.0, 1.0, 101)
    up = resample_linear(ramp, 100, 200)
    assert np.abs(up - np.linspace(0.0, 1.0, len(up))).max() < 1e-12
    down = resample_linear(ramp, 100, 50)
    assert np.abs(down - np.linspace(0.0, 1.0, len(down))).max() < 1e-12


def test_audio_features_operator(spark):
    from pyspark.sql import Observation

    from hadoop_20_warehouse_fix_spark.functions.audio import audio_features

    # full-scale square wave: rms = peak = 1 (quantized to 32767/32768),
    # zcr = 1 (sign flips every sample), 1000 frames at 1 kHz = 1000 ms
    sq = np.tile([1.0, -1.0], 500)
    wav = encode_wav(sq, 1000)
    corrupt = b"RIFF" + struct.pack("<I", 4) + b"WAVE"  # sniffs, no chunks
    media = spark.createDataFrame(
        [(1, bytearray(wav)), (2, bytearray(b"plain text bytes")), (3, bytearray(corrupt))],
        "media_id long, payload binary",
    )
    obs = Observation("audio_paths")
    rows = {r.media_id: r for r in audio_features(media, observation=obs).collect()}
    assert obs.get["rows"] == 3
    assert obs.get["decoded_rows"] == 1
    assert obs.get["sniffed_fallback_rows"] == 1
    r = rows[1]
    assert r.decoded and r.duration_ms == 1000 and r.sample_rate == 1000
    assert r.channels == 1 and r.zero_crossing_rate == pytest.approx(1.0)
    assert r.rms == pytest.approx(32767 / 32768, abs=1e-6)
    assert r.peak == pytest.approx(32767 / 32768, abs=1e-6)
    assert not rows[2].decoded and rows[2].rms is None
    assert not rows[3].decoded


def test_stft_pure_tone_hits_its_bin():
    """Analytic: a sine at exactly bin k of the frame lands its energy
    in bin k; dominant/centroid frequencies follow."""
    from hadoop_20_warehouse_fix_spark.functions.audio import (
        spectral_features,
        stft_magnitudes,
    )

    rate, frame = 8000, 256
    k = 16  # bin-aligned: f = k * rate / frame = 500 Hz
    t = np.arange(8000) / rate
    tone = np.sin(2 * np.pi * (k * rate / frame) * t)
    mag = stft_magnitudes(tone, frame=frame, hop=128)
    assert mag.shape == (1 + (8000 - frame) // 128, frame // 2 + 1)
    assert (mag.argmax(axis=1) == k).all()  # every frame peaks at bin k
    feats = spectral_features(tone, rate, frame=frame)
    assert feats["dominant_freq_hz"] == pytest.approx(500.0)
    assert feats["spectral_centroid_hz"] == pytest.approx(500.0, rel=0.02)
    # too-short signal: empty frames, None features, no crash
    from hadoop_20_warehouse_fix_spark.functions.audio import spectral_features as sf
    assert sf(np.zeros(10), rate)["dominant_freq_hz"] is None
    with pytest.raises(ValueError, match="window"):
        stft_magnitudes(tone, window="blackman")


def test_audio_fingerprint_invariances_and_discrimination():
    """Round-8 brief #2: the spectral fingerprint's analytic contract.
    Gain scaling is EXACTLY invariant (energy comparisons scale
    together — the dHash +40-brightness analog); resampling moves the
    hash by at most a few bits (fixed-duration frames -> absolute-Hz
    bands); a clip with the opposite band-energy ordering differs in
    most bits; too-short clips refuse."""
    from hadoop_20_warehouse_fix_spark.functions.audio import audio_fingerprint

    rate = 8000
    t = np.arange(rate * 2) / rate  # 2 s
    # band-center tones with strictly decreasing amplitudes -> robust
    # comparison signs (energies well separated between bands)
    freqs = [120, 240, 480, 900, 1600]
    amps = [1.0, 0.7, 0.5, 0.35, 0.2]
    clip = sum(a * np.sin(2 * np.pi * f * t) for f, a in zip(freqs, amps))
    rev = sum(a * np.sin(2 * np.pi * f * t) for f, a in zip(freqs, reversed(amps)))

    v = audio_fingerprint(clip, rate)
    assert v == audio_fingerprint(0.25 * clip, rate)  # gain: exact
    resampled = resample_linear(clip, rate, 6000)
    d_resample = bin(v ^ audio_fingerprint(resampled, 6000)).count("1")
    assert d_resample <= 3, d_resample
    d_rev = bin(v ^ audio_fingerprint(rev, rate)).count("1")
    assert d_rev > 10, d_rev  # different spectral shape: far away
    with pytest.raises(ValueError, match="too short"):
        audio_fingerprint(np.zeros(100), rate)


def test_audio_near_dup_pairs_operator(spark):
    """End-to-end on the shared Hamming band machinery: original +
    gain-shifted copy pair at hamming 0, resampled copy pairs under
    the threshold, a different clip stays unpaired, non-WAV payloads
    are dropped and counted."""
    from pyspark.sql import Observation

    from hadoop_20_warehouse_fix_spark.functions.audio import audio_near_dup_pairs

    rate = 8000
    t = np.arange(rate * 2) / rate
    freqs = [120, 240, 480, 900, 1600]
    amps = [1.0, 0.7, 0.5, 0.35, 0.2]
    clip = sum(a * np.sin(2 * np.pi * f * t) for f, a in zip(freqs, amps))
    other = sum(a * np.sin(2 * np.pi * f * t) for f, a in zip(freqs, reversed(amps)))
    rows = [
        (1, bytearray(encode_wav(clip, rate))),
        (2, bytearray(encode_wav(0.5 * clip, rate))),  # gain-shifted copy
        (3, bytearray(encode_wav(resample_linear(clip, rate, 6000), 6000))),
        (4, bytearray(encode_wav(other, rate))),
        (5, bytearray(b"not audio at all")),  # never sniffs as WAV
        (6, bytearray(encode_wav(np.zeros(100), rate))),  # too short to fingerprint
    ]
    media = spark.createDataFrame(rows, "media_id long, payload binary")
    obs = Observation("audio_fp")
    pairs = {
        (r.id_a, r.id_b): r.hamming
        for r in audio_near_dup_pairs(media, max_hamming=3, observation=obs).collect()
    }
    assert obs.get["rows"] == 6 and obs.get["decoded_rows"] == 4
    assert obs.get["sniffed_fallback_rows"] == 1  # the too-short WAV
    assert pairs[(1, 2)] == 0  # exact gain invariance
    assert (1, 3) in pairs and pairs[(1, 3)] <= 3  # resample near-dup
    assert not any(4 in p or 5 in p or 6 in p for p in pairs)


def test_audio_fingerprint_refuses_sub_band_rates():
    """A rate so low no STFT bin lands in the band range would hash
    every such clip to constant 0 (manufactured pairs) — refuse."""
    from hadoop_20_warehouse_fix_spark.functions.audio import audio_fingerprint

    with pytest.raises(ValueError, match="no spectral bin"):
        audio_fingerprint(np.sin(np.arange(400) / 5.0), rate=150)


def test_spectral_flatness_gate_drops_sparse_tonal_clips(spark):
    """Round-9 SCALING finding made code: sparse tonal clips leave most
    energy-comparison bits at the noise-floor tie, so DIFFERENT tone
    sets pair within hamming 3 (600 distinct 4-tone clips over-
    clustered to 82 in the media-capstone measurement). min_flatness
    gates them out of the fingerprint — counted, not silently paired —
    while broadband clips sail through."""
    import numpy as np
    from pyspark.sql import Observation

    from hadoop_20_warehouse_fix_spark.functions.audio import (
        audio_fingerprint_bands,
        encode_wav,
        spectral_flatness,
    )

    rng = np.random.default_rng(17)
    t = np.arange(16000) / 8000.0
    tone = 0.5 * np.sin(2 * np.pi * 440 * t) + 0.3 * np.sin(2 * np.pi * 900 * t)
    broadband = rng.uniform(-0.5, 0.5, len(t))
    # the measure itself: tones near 0, noise near 1
    assert spectral_flatness(tone[:, None], 8000) < 0.05
    assert spectral_flatness(broadband[:, None], 8000) > 0.5
    media = spark.createDataFrame(
        [(1, bytearray(encode_wav(tone, 8000))),
         (2, bytearray(encode_wav(broadband, 8000)))],
        "media_id long, payload binary",
    )
    obs = Observation("flat_gate")
    out = audio_fingerprint_bands(media, observation=obs, min_flatness=0.1).collect()
    assert {r.id for r in out} == {2}
    assert obs.get["sparse_spectrum_rows"] == 1 and obs.get["decoded_rows"] == 1
    # default keeps the old behavior: both fingerprint
    assert {r.id for r in audio_fingerprint_bands(media).collect()} == {1, 2}
