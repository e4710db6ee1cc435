"""MJPEG/AVI video container tests (round 7 — the last modality).

Same strategy as images/audio: the container parser pinned against a
HAND-BUILT RIFF tree (chunks assembled with struct, frame payloads
known), the writer via roundtrip through the pinned parser + the
already-validated JPEG codec, the Spark operator end-to-end with the
observability contract, and the decoder exception contract fuzzed."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from hadoop_20_warehouse_fix_spark.functions.video import (
    decode_avi_frames,
    encode_avi_mjpeg,
    parse_avi,
)


def _frames(n, h=16, w=16):
    # flat frames at distinct analytic levels: frame i is all (40 + 10*i)
    return [np.full((h, w, 3), 40 + 10 * i, dtype=np.uint8) for i in range(n)]


def test_parse_handbuilt_avi_tree():
    # hand-assembled RIFF('AVI ') with avih meta and two '00dc' chunks
    def chunk(cid, body):
        return cid + struct.pack("<I", len(body)) + body + (b"\x00" if len(body) & 1 else b"")

    avih = struct.pack("<IIIIIIIIIIIIII", 100000, 0, 0, 0x10, 2, 0, 1, 0, 32, 24, 0, 0, 0, 0)
    hdrl = chunk(b"LIST", b"hdrl" + chunk(b"avih", avih))
    movi = chunk(b"LIST", b"movi" + chunk(b"00dc", b"FRAME_A") + chunk(b"00dc", b"FRAME_BB"))
    body = b"AVI " + hdrl + movi
    meta = parse_avi(b"RIFF" + struct.pack("<I", len(body)) + body)
    assert (meta["width"], meta["height"], meta["usec_per_frame"]) == (32, 24, 100000)
    assert meta["frames"] == [b"FRAME_A", b"FRAME_BB"]


def test_encode_decode_roundtrip_flat_frames():
    frames = _frames(5)
    avi = encode_avi_mjpeg(frames, fps=10, quant=1)
    meta = parse_avi(avi)
    assert len(meta["frames"]) == 5
    assert (meta["width"], meta["height"], meta["usec_per_frame"]) == (16, 16, 100000)
    decoded = decode_avi_frames(avi)
    for i, arr in enumerate(decoded):
        assert arr.shape == (16, 16, 3)
        assert np.abs(arr.astype(int) - (40 + 10 * i)).max() <= 2  # quant=1 color bound


def test_decode_selected_indices():
    avi = encode_avi_mjpeg(_frames(10), quant=1)
    picks = decode_avi_frames(avi, [0, 9])
    assert np.abs(picks[0].astype(int) - 40).max() <= 2
    assert np.abs(picks[1].astype(int) - 130).max() <= 2


def test_rejects_non_avi_and_non_mjpeg():
    with pytest.raises(ValueError, match="RIFF/AVI"):
        parse_avi(b"plainly not a container")
    # an AVI shell whose frame payload is not JPEG -> unsupported codec
    def chunk(cid, body):
        return cid + struct.pack("<I", len(body)) + body + (b"\x00" if len(body) & 1 else b"")

    movi = chunk(b"LIST", b"movi" + chunk(b"00dc", b"\x00\x00h264ish"))
    body = b"AVI " + movi
    avi = b"RIFF" + struct.pack("<I", len(body)) + body
    with pytest.raises(NotImplementedError, match="MJPEG"):
        decode_avi_frames(avi)


def test_deeply_nested_lists_do_not_blow_the_stack():
    """Round-7 ADVICE: a crafted ~60KB AVI with thousands of nested
    LIST chunks raised RecursionError through the recursive walk —
    escaping the (ValueError, NotImplementedError) contract and killing
    the Spark task. The walk is now an explicit-stack loop; deep
    nesting must parse (or refuse) like any other payload."""
    def chunk(cid, body):
        return cid + struct.pack("<I", len(body)) + body + (b"\x00" if len(body) & 1 else b"")

    inner = chunk(b"00dc", b"FRAME_X")
    for _ in range(5000):  # ~60KB of pure nesting, >> the recursion limit
        inner = chunk(b"LIST", b"junk" + inner)
    body = b"AVI " + inner
    meta = parse_avi(b"RIFF" + struct.pack("<I", len(body)) + body)
    assert meta["frames"] == [b"FRAME_X"]  # in-order traversal unchanged


def test_parser_exception_contract_fuzz():
    """Contract fuzz (derandomized, same discipline as test_jpeg):
    garbage, truncations, and corruptions raise only
    ValueError/NotImplementedError."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    valid = encode_avi_mjpeg(_frames(3), quant=8)

    @settings(max_examples=150, deadline=None, derandomize=True)
    @given(
        junk=st.binary(min_size=0, max_size=48),
        cut=st.integers(min_value=0, max_value=400),
        base=st.sampled_from(["junk", "cut", "corrupt", "nest"]),
        seed=st.integers(min_value=0, max_value=10_000),
    )
    def fuzz(junk, cut, base, seed):
        if base == "cut":
            payload = valid[: max(12, len(valid) - cut)] + junk
        elif base == "corrupt":
            rng = np.random.default_rng(seed)
            v = bytearray(valid)
            for _ in range(3):
                v[int(rng.integers(0, len(v)))] = int(rng.integers(0, 256))
            payload = bytes(v)
        elif base == "nest":
            # deep LIST nesting around junk, possibly truncated (the
            # round-7 ADVICE RecursionError class)
            inner = junk
            for _ in range(1500 + seed % 1500):
                inner = b"LIST" + struct.pack("<I", len(inner) + 4) + b"junk" + inner
            body = b"AVI " + inner
            payload = (b"RIFF" + struct.pack("<I", len(body)) + body)[
                : max(12, len(body) + 8 - cut)
            ]
        else:
            payload = b"RIFF\x00\x00\x00\x00AVI " + junk
        try:
            decode_avi_frames(payload)
        except (ValueError, NotImplementedError):
            pass

    fuzz()


def test_sample_frames_real_operator(spark):
    from pyspark.sql import Observation

    from hadoop_20_warehouse_fix_spark.functions.multimodal import decode_image
    from hadoop_20_warehouse_fix_spark.functions.video import sample_frames_real

    avi = encode_avi_mjpeg(_frames(8), quant=1)
    media = spark.createDataFrame(
        [(1, bytearray(avi)), (2, bytearray(b"not a video payload here"))],
        "media_id long, payload binary",
    )
    obs = Observation("frame_paths")
    out = sample_frames_real(media, n_frames=4, observation=obs)
    rows = {(r.media_id, r.frame_idx): bytes(r.frame) for r in out.collect()}
    assert len(rows) == 8  # 2 media x 4 frames
    assert obs.get["rows"] == 8 and obs.get["decoded_rows"] == 4
    assert obs.get["sniffed_fallback_rows"] == 0
    # evenly spaced picks from 8 frames: indices 0,2,4,6 -> levels 40,60,80,100
    for i, level in enumerate((40, 60, 80, 100)):
        arr = decode_image(rows[(1, i)])  # frames come back as PPM pixels
        assert np.abs(arr.astype(int) - level).max() <= 2, (i, level)
    # the non-video payload got deterministic byte windows
    assert rows[(2, 0)] == b"not a "


def test_demux_audio_roundtrip():
    """A/V mux-demux: the soundtrack written into the AVI comes back
    bit-equivalent to a direct WAV roundtrip (same PCM16 path)."""
    from hadoop_20_warehouse_fix_spark.functions.video import demux_audio

    t = np.arange(4000) / 8000.0
    tone = 0.5 * np.sin(2 * np.pi * 440 * t)
    avi = encode_avi_mjpeg(_frames(3), fps=10, quant=8, audio=tone, audio_rate=8000)
    samples, rate = demux_audio(avi)
    assert rate == 8000 and samples.shape == (4000, 1)
    assert np.abs(samples[:, 0] - tone).max() <= 1.5 / 32768  # PCM16 bound
    # frames still decode from the same container
    assert len(decode_avi_frames(avi)) == 3
    # an AVI without audio refuses the demux explicitly
    with pytest.raises(ValueError, match="no audio"):
        demux_audio(encode_avi_mjpeg(_frames(2)))


def test_extract_audio_track_composes_with_audio_features(spark):
    """The ASR-pipeline composition: video corpus -> extract_audio_track
    -> audio_features, all in-container. The demuxed WAV payload rows
    feed the audio operator unchanged; non-AVI payloads fall through
    counted."""
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    from hadoop_20_warehouse_fix_spark.functions.audio import audio_features
    from hadoop_20_warehouse_fix_spark.functions.video import extract_audio_track

    sq = np.tile([0.8, -0.8], 2000)  # 4000 samples at 4kHz = 1000 ms
    avi = encode_avi_mjpeg(_frames(2), quant=8, audio=sq, audio_rate=4000)
    silent = encode_avi_mjpeg(_frames(2), quant=8)  # video-only
    media = spark.createDataFrame(
        [(1, bytearray(avi)), (2, bytearray(silent)), (3, bytearray(b"not media"))],
        "media_id long, payload binary",
    )
    obs = Observation("demux_paths")
    tracks = extract_audio_track(media, observation=obs)
    rows = {r.media_id: r for r in tracks.collect()}
    assert obs.get["rows"] == 3 and obs.get["decoded_rows"] == 1
    assert obs.get["sniffed_fallback_rows"] == 1  # the audio-less AVI
    assert rows[1].decoded and rows[1].sample_rate == 4000
    assert rows[1].duration_ms == 1000 and rows[1].channels == 1
    assert not rows[2].decoded and not rows[3].decoded
    # composition: the wav column IS an audio corpus
    wav_media = tracks.filter("decoded").select(
        "media_id", F.col("wav").alias("payload")
    )
    feats = {r.media_id: r for r in audio_features(wav_media).collect()}
    assert feats[1].decoded and feats[1].sample_rate == 4000
    assert feats[1].rms == pytest.approx(0.8, abs=2e-3)
    assert feats[1].zero_crossing_rate == pytest.approx(1.0)


def test_video_near_dup_pairs_operator(spark):
    """The near-dup matrix's video member on the shared Hamming band
    machinery: a brightness-shifted copy pairs at hamming 0 (dHash
    invariance per frame), a re-encode at a different JPEG quality
    pairs under the threshold, a different video stays unpaired,
    non-AVI payloads are dropped and counted."""
    from pyspark.sql import Observation

    from hadoop_20_warehouse_fix_spark.functions.video import (
        dhash_video,
        video_near_dup_pairs,
    )

    rng = np.random.default_rng(11)
    base = rng.integers(40, 160, size=(6, 24, 24, 3)).astype(np.uint8)
    frames = [base[i] for i in range(6)]
    brighter = [np.clip(f.astype(int) + 40, 0, 255).astype(np.uint8) for f in frames]
    other = [np.full((24, 24, 3), 200 - 20 * i, dtype=np.uint8) for i in range(6)]
    rows = [
        (1, bytearray(encode_avi_mjpeg(frames, quant=1))),
        (2, bytearray(encode_avi_mjpeg(brighter, quant=1))),  # +40 brightness
        (3, bytearray(encode_avi_mjpeg(frames, quant=4))),  # re-encode
        (4, bytearray(encode_avi_mjpeg(other, quant=1))),
        (5, bytearray(b"definitely not a video")),
    ]
    media = spark.createDataFrame(rows, "media_id long, payload binary")
    obs = Observation("video_fp")
    pairs = {
        (r.id_a, r.id_b): r.hamming
        for r in video_near_dup_pairs(media, max_hamming=3, observation=obs).collect()
    }
    assert obs.get["rows"] == 5 and obs.get["decoded_rows"] == 4
    assert obs.get["sniffed_fallback_rows"] == 0  # non-AVI never sniffs
    assert pairs[(1, 2)] == 0  # per-frame dHash brightness invariance
    assert (1, 3) in pairs and pairs[(1, 3)] <= 3  # re-encode near-dup
    assert not any(4 in p or 5 in p for p in pairs)
    # pure-function contract: undecodable raises inside the usual envelope
    with pytest.raises(ValueError):
        dhash_video(b"RIFF\x00\x00\x00\x00AVI junkjunk")
