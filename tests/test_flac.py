"""Pure-python FLAC codec tests (round 8 — lossless compressed audio).

Validation strategy mirrors the JPEG/WAV suites: the decoder is pinned
against HAND-BUILT single-frame bitstreams (LPC, stereo decorrelation,
wasted bits, Rice partitions, escape residuals — the features the
deliberately-simple encoder never emits), CRC polynomials against
published check values, the encoder via EXACT roundtrip (FLAC is
lossless — equality, not a bound), the Spark operators end-to-end, and
the exception contract fuzzed."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from hadoop_20_warehouse_fix_spark.functions.flac import (
    _Bits,
    _BitsW,
    _crc8,
    _crc16,
    _read_utf8_coded,
    decode_flac,
    encode_flac,
)


def test_crc_known_answers():
    # published check values: CRC-8 (poly 0x07, init 0) and
    # CRC-16/BUYPASS (poly 0x8005, init 0) over b"123456789"
    assert _crc8(b"123456789") == 0xF4
    assert _crc16(b"123456789") == 0xFEE8


def _streaminfo(rate, channels, bps, total) -> bytes:
    si = _BitsW()
    si.write(4096, 16); si.write(4096, 16)
    si.write(0, 24); si.write(0, 24)
    si.write(rate, 20); si.write(channels - 1, 3); si.write(bps - 1, 5)
    si.write(total, 36)
    body = si.bytes() + b"\x00" * 16
    return b"fLaC" + bytes([0x80]) + struct.pack(">I", len(body))[1:] + body


def _one_frame(build_subframes, channels, ch_code, block=8, rate=8000, bps=16):
    """Hand-assemble a one-frame FLAC: STREAMINFO + frame header (CRC-8
    computed like the spec says) + caller-built subframe bits + CRC-16."""
    out = bytearray(_streaminfo(rate, channels, bps, block))
    hw = _BitsW()
    hw.write(0x3FFE, 14); hw.write(0, 1); hw.write(0, 1)
    hw.write(6, 4)   # block size: 8-bit field follows
    hw.write(0, 4)   # rate from STREAMINFO
    hw.write(ch_code, 4)
    hw.write(4, 3)   # 16 bps
    hw.write(0, 1)
    hw.write(0, 8)   # frame number 0 (utf8 1-byte)
    hw.write(block - 1, 8)
    hw.align()
    hdr = hw.bytes()
    hdr += bytes([_crc8(hdr)])
    fw = _BitsW()
    build_subframes(fw)
    fw.align()
    frame = hdr + fw.bytes()
    frame += struct.pack(">H", _crc16(frame))
    return bytes(out + frame)


def _constant(fw, value, bits=16):
    fw.write(0, 1); fw.write(0, 6); fw.write(0, 1)
    fw.write(value, bits)


def test_handbuilt_lpc_subframe():
    """LPC order 1, coef 4, shift 2: predictor = (4*prev)>>2 = prev;
    warmup 100, residuals all 1 -> samples 100..107 exactly."""
    def build(fw):
        fw.write(0, 1); fw.write(32, 6); fw.write(0, 1)  # LPC order 1
        fw.write(100, 16)        # warmup
        fw.write(3, 4)           # precision-1 = 3 -> 4-bit coefs
        fw.write(2, 5)           # shift 2
        fw.write(4, 4)           # coef = 4
        fw.write(0, 2); fw.write(0, 4); fw.write(1, 4)  # rice: porder 0, param 1
        for _ in range(7):       # residual +1: zigzag 2 -> q=1 ('01') + low bit 0
            fw.write(0b010, 3)

    s, rate = decode_flac(_one_frame(build, 1, 0))
    assert rate == 8000
    assert (s[:, 0] * 32768.0).astype(int).tolist() == list(range(100, 108))


def test_handbuilt_stereo_decorrelation_modes():
    """left/side, right/side, mid/side constant frames all reconstruct
    L=1000, R=400 (side = 600, mid = floor(1400/2) = 700); the side
    channel carries bps+1 bits by spec."""
    def ls(fw):
        _constant(fw, 1000, 16)   # left
        _constant(fw, 600, 17)    # side
    def rs(fw):
        _constant(fw, 600, 17)    # side first
        _constant(fw, 400, 16)    # right
    def ms(fw):
        _constant(fw, 700, 16)    # mid
        _constant(fw, 600, 17)    # side
    for ch_code, build in ((8, ls), (9, rs), (10, ms)):
        s, _ = decode_flac(_one_frame(build, 2, ch_code))
        ints = (s * 32768.0).astype(int)
        assert (ints[:, 0] == 1000).all() and (ints[:, 1] == 400).all(), ch_code


def test_handbuilt_wasted_bits_and_verbatim():
    """Verbatim subframe with 1 wasted bit: stored 15-bit values come
    back shifted left once."""
    vals = [3, -3, 50, -50, 0, 7, -8, 1]

    def build(fw):
        fw.write(0, 1); fw.write(1, 6)  # VERBATIM
        fw.write(1, 1); fw.write(1, 1)  # wasted: flag + unary '1' -> 1 bit
        for v in vals:
            fw.write(v, 15)

    s, _ = decode_flac(_one_frame(build, 1, 0))
    assert (s[:, 0] * 32768.0).astype(int).tolist() == [v << 1 for v in vals]


def test_handbuilt_rice_partitions_and_escape():
    """Fixed order 0 with partition order 1 (two partitions of 4): the
    first partition Rice param 0, the second ESCAPED to 6-bit verbatim
    residuals."""
    first, second = [0, -1, 1, -2], [20, -20, 10, -9]

    def build(fw):
        fw.write(0, 1); fw.write(8, 6); fw.write(0, 1)  # FIXED order 0
        fw.write(0, 2)   # method 0
        fw.write(1, 4)   # partition order 1
        fw.write(0, 4)   # partition 1: param 0
        for v in first:
            u = (v << 1) ^ (v >> 63)
            for _ in range(u):
                fw.write(0, 1)
            fw.write(1, 1)
        fw.write(15, 4)  # partition 2: escape
        fw.write(6, 5)   # 6-bit verbatim residuals
        for v in second:
            fw.write(v, 6)

    s, _ = decode_flac(_one_frame(build, 1, 0))
    assert (s[:, 0] * 32768.0).astype(int).tolist() == first + second


def test_roundtrip_exact_and_frame_spanning():
    """Losslessness is EQUALITY: every sample comes back as the exact
    quantized integer, across frame boundaries (>4096 samples), mono
    and stereo, constant and noisy content."""
    rng = np.random.default_rng(5)
    for s, rate in [
        (0.5 * np.sin(2 * np.pi * 440 * np.arange(9000) / 8000), 8000),
        (rng.uniform(-1, 1, 5000), 16000),
        (rng.uniform(-0.8, 0.8, (10000, 2)), 44100),
        (np.full(4500, 0.25), 8000),
        (np.array([0.1, -0.2, 0.3]), 22050),
    ]:
        out, r = decode_flac(encode_flac(s, rate))
        s2 = s[:, None] if s.ndim == 1 else s
        want = np.clip(np.round(s2 * 32768.0), -32768, 32767)
        assert r == rate and out.shape == s2.shape
        assert np.array_equal(out * 32768.0, want)
    # a pure sine genuinely compresses through the fixed predictors
    tone = 0.5 * np.sin(2 * np.pi * 440 * np.arange(9000) / 8000)
    assert len(encode_flac(tone, 8000)) < 0.9 * (9000 * 2)


def test_rejects_and_exception_contract_fuzz():
    with pytest.raises(ValueError, match="fLaC"):
        decode_flac(b"not audio")
    from hypothesis import given, settings
    from hypothesis import strategies as st

    valid = encode_flac(
        0.3 * np.sin(2 * np.pi * 300 * np.arange(5000) / 8000), 8000
    )

    @settings(max_examples=200, deadline=None, derandomize=True)
    @given(
        cut=st.integers(min_value=0, max_value=800),
        base=st.sampled_from(["cut", "corrupt"]),
        seed=st.integers(min_value=0, max_value=10_000),
    )
    def fuzz(cut, base, seed):
        if base == "cut":
            payload = valid[: max(4, len(valid) - cut)]
        else:
            rng = np.random.default_rng(seed)
            v = bytearray(valid)
            for _ in range(4):
                v[int(rng.integers(0, len(v)))] = int(rng.integers(0, 256))
            payload = bytes(v)
        try:
            decode_flac(payload)
        except (ValueError, NotImplementedError):
            pass

    fuzz()


def test_audio_operators_decode_flac(spark):
    """The Spark surface: FLAC payloads flow through audio_features AND
    the near-dup fingerprint exactly like WAV — same features, and a
    WAV copy of the same clip pairs with its FLAC twin at hamming 0
    (the fingerprint sees samples, not containers)."""
    from pyspark.sql import Observation

    from hadoop_20_warehouse_fix_spark.functions.audio import (
        audio_features,
        audio_near_dup_pairs,
        encode_wav,
    )

    t = np.arange(16000) / 8000.0
    freqs, amps = [120, 240, 480, 900, 1600], [1.0, 0.7, 0.5, 0.35, 0.2]
    clip = sum(a * np.sin(2 * np.pi * f * t) for f, a in zip(freqs, amps)) / 3.0
    media = spark.createDataFrame(
        [
            (1, bytearray(encode_wav(clip, 8000))),
            (2, bytearray(encode_flac(clip, 8000))),
            (3, bytearray(b"not audio at all")),
        ],
        "media_id long, payload binary",
    )
    obs = Observation("flac_feats")
    rows = {r.media_id: r for r in audio_features(media, observation=obs).collect()}
    assert obs.get["decoded_rows"] == 2
    assert rows[2].decoded and rows[2].sample_rate == 8000
    assert rows[2].duration_ms == rows[1].duration_ms == 2000
    assert rows[2].rms == pytest.approx(rows[1].rms, abs=2e-4)
    pairs = {
        (r.id_a, r.id_b): r.hamming
        for r in audio_near_dup_pairs(media, max_hamming=3).collect()
    }
    # WAV x32767 vs FLAC x32768 quantization: sub-LSB gain difference,
    # which the fingerprint's gain invariance absorbs exactly
    assert pairs.get((1, 2)) == 0


def test_frame_crc16_catches_entropy_corruption():
    """Second-pass review: the frame CRC-16 must be VERIFIED — without
    it, single bit flips in the entropy data decoded silently to wrong
    samples. Every entropy-region bit flip now raises (or, rarely,
    breaks the parse earlier)."""
    rng = np.random.default_rng(2)
    valid = encode_flac(rng.uniform(-0.5, 0.5, 3000), 8000)
    # locate the frame region: everything after STREAMINFO (4 + 4 + 34 + 16)
    frame_start = len(b"fLaC") + 4 + 34 + 16
    silent = 0
    for off in range(frame_start + 12, min(frame_start + 212, len(valid) - 2)):
        v = bytearray(valid)
        v[off] ^= 0x10
        try:
            out, _ = decode_flac(bytes(v))
            ref, _ = decode_flac(valid)
            if not np.array_equal(out, ref):
                silent += 1
        except (ValueError, NotImplementedError):
            pass
    assert silent == 0, f"{silent} corruptions decoded silently wrong"


def test_encoder_validates_sample_rate():
    with pytest.raises(ValueError, match="sample_rate"):
        encode_flac(np.zeros(100), 0)
    with pytest.raises(ValueError, match="sample_rate"):
        encode_flac(np.zeros(100), 1_048_576 + 8000)


def test_streaminfo_blocksize_reflects_single_short_frame():
    """Round-8 ADVICE: a single-frame stream shorter than 4096 samples
    must not claim min/max blocksize 4096 — the spec's last-frame
    exemption covers trailing short frames, not the only frame. The
    fields live at byte offsets 8..11 (after fLaC magic + 4-byte block
    header): 16-bit min, 16-bit max."""
    import struct as _struct

    rng = np.random.default_rng(7)
    for n, expect in [(1000, 1000), (10, 16), (4096, 4096), (5000, 4096)]:
        s = rng.uniform(-0.4, 0.4, n)
        blob = encode_flac(s, 8000)
        mn, mx = _struct.unpack(">HH", blob[8:12])
        assert (mn, mx) == (expect, expect), (n, mn, mx)
        out, rate = decode_flac(blob)
        assert rate == 8000
        assert np.array_equal(
            out[:, 0] * 32768.0, np.clip(np.round(s * 32768.0), -32768, 32767)
        )


def test_encode_flac_lpc_roundtrip_bit_exact():
    """Round-10: predictor='lpc' emits real LPC subframes (type 32+),
    decodes bit-exactly, and beats the FIXED encoder on correlated
    audio — the honest fixture class for the decoder's LPC path
    (libFLAC corpora are predominantly LPC)."""
    rng = np.random.default_rng(5)
    n = 16000
    e = rng.normal(0, 0.02, n)
    x = np.zeros(n)
    for i in range(2, n):
        x[i] = 1.6 * x[i - 1] - 0.68 * x[i - 2] + e[i]
    x = np.clip(x, -0.99, 0.99)
    want = np.clip(np.round(x * 32768.0), -32768, 32767).astype(np.int64) / 32768.0
    b_lpc = encode_flac(x, 8000, predictor="lpc")
    b_fix = encode_flac(x, 8000, predictor="fixed")
    s, rate = decode_flac(b_lpc)
    assert rate == 8000 and np.array_equal(s[:, 0], want)
    assert len(b_lpc) < len(b_fix)  # correlated audio: LPC compresses better
    # the stream really carries an LPC subframe: peek the first frame's
    # first subframe type (6 bits after the frame header + 1 pad bit)
    pos = 4
    while True:  # skip metadata blocks
        last, size = b_lpc[pos] & 0x80, int.from_bytes(b_lpc[pos + 1 : pos + 4], "big")
        pos += 4 + size
        if last:
            break
    bits = _Bits(b_lpc, pos * 8)
    assert bits.read(14) == 0x3FFE
    bits.read(2 + 4 + 4 + 4 + 3 + 1)
    _read_utf8_coded(bits)
    bits.read(16)  # 16-bit blocksize field (encoder always writes code 7)
    bits.read(8)  # crc8
    bits.read(1)
    sf_type = bits.read(6)
    assert sf_type >= 32, f"expected an LPC subframe, got type {sf_type}"
    assert sf_type - 31 == 8  # order 8


def test_encode_flac_lpc_degenerate_fallbacks():
    """Blocks LPC cannot model (constant, white noise, tiny) still
    roundtrip bit-exactly via the FIXED/CONSTANT fallbacks; bad
    predictor values raise."""
    rng = np.random.default_rng(6)
    for sig in (
        np.full(5000, 0.25),
        rng.uniform(-0.9, 0.9, 5000),
        np.array([0.1, -0.2, 0.05]),
        np.zeros(4096),
    ):
        want = (
            np.clip(np.round(sig * 32768.0), -32768, 32767).astype(np.int64)
            / 32768.0
        )
        s, _ = decode_flac(encode_flac(sig, 8000, predictor="lpc"))
        assert np.array_equal(s[:, 0], want)
    with pytest.raises(ValueError, match="predictor"):
        encode_flac(np.zeros(100), 8000, predictor="arima")


def test_lpc_loop_codegen_equals_naive():
    """The code-generated unrolled LPC reconstruction (round-10 decode
    speedup) is the SAME arbitrary-precision arithmetic as the naive
    sum form — exhaustively equal over random filters at every legal
    order, including huge-int regimes numpy could never hold."""
    from hadoop_20_warehouse_fix_spark.functions.flac import _lpc_loop

    rng = np.random.default_rng(7)
    for order in list(range(1, 9)) + [15, 32]:
        warm = [int(v) for v in rng.integers(-(1 << 30), 1 << 30, order)]
        coefs = [int(v) for v in rng.integers(-(1 << 14), 1 << 14, order)]
        shift = int(rng.integers(0, 16))
        resid = [int(v) for v in rng.integers(-(1 << 20), 1 << 20, 200)]
        naive = list(warm)
        for r in resid:
            pred = sum(c * naive[-i - 1] for i, c in enumerate(coefs)) >> shift
            naive.append(pred + r)
        assert _lpc_loop(order)(warm, coefs, shift, resid) == naive
