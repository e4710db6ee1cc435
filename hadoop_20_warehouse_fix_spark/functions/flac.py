"""Pure-python FLAC codec — lossless compressed audio, no libraries.

Round 8: the round-7 verdict carried "compressed audio" as a
library-gated gap. FLAC is the one compressed audio format this
engine can close PURE and EXACTLY: it is lossless, so the decode
contract is bit-perfect sample recovery (the roundtrip test asserts
EQUALITY, not a bound), and it is what real speech corpora ship as
(LibriSpeech et al.) — the highest-value compressed-audio target for
an ASR data pipeline. Lossy codecs (MP3/AAC/Vorbis/Opus) remain
library-gated: a pure implementation would be a psychoacoustics
project, not a data-plumbing one.

Implements the public FLAC format (xiph.org specification / RFC 9639):

- decoder: fLaC magic, STREAMINFO + skipped metadata blocks, frame
  headers (sync, block size / sample rate / channel / sample-size
  codes, UTF-8-coded frame number, CRC-8 verified), all four subframe
  types (CONSTANT, VERBATIM, FIXED orders 0-4, LPC with quantized
  coefficients and shift), wasted bits, Rice-coded residuals
  (partitioned, both 4- and 5-bit parameter widths, escape code to
  verbatim residuals), and the four channel layouts (independent,
  left/side, right/side, mid/side). Samples return as float64 in
  [-1, 1), shape (frames, channels) — the :mod:`.audio` contract.
- encoder (fixture + sink path): one frame per 4096-sample block,
  per-subframe choice of CONSTANT / FIXED order 0-2 with single-
  partition Rice residuals (whichever is smallest), independent
  channels, streaminfo + CRC-8/CRC-16 written per spec. Deliberately
  simple — every bit is spec-valid and the decoder recovers input
  EXACTLY, which is what makes it an honest fixture generator.

Exception contract as everywhere in this package: corrupt/truncated
-> ValueError, recognized-but-unsupported -> NotImplementedError.
"""

from __future__ import annotations

import struct

import numpy as np
from numpy.lib.stride_tricks import sliding_window_view

_FIXED_COEFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}

_BLOCK_SIZES = {
    1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
    8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096, 13: 8192, 14: 16384, 15: 32768,
}
_RATES = {
    1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000, 6: 22050, 7: 24000,
    8: 32000, 9: 44100, 10: 48000, 11: 96000,
}
_SIZES = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}


def _crc_table(poly: int, width: int) -> list[int]:
    mask, top = (1 << width) - 1, 1 << (width - 1)
    table = []
    for b in range(256):
        crc = b << (width - 8)
        for _ in range(8):
            crc = ((crc << 1) ^ poly) & mask if crc & top else (crc << 1) & mask
        table.append(crc)
    return table


_CRC8_TABLE = _crc_table(0x07, 8)
_CRC16_TABLE = _crc_table(0x8005, 16)


def _crc8(data: bytes) -> int:
    """Byte-wise table CRC-8 (poly 0x07) — same values as the spec's
    bit-serial definition (pinned by the published check values in
    tests), 8x less work per byte (round 9: the bit-serial loop over
    every frame byte was a top decode cost)."""
    crc = 0
    for b in data:
        crc = _CRC8_TABLE[crc ^ b]
    return crc


def _crc16(data: bytes) -> int:
    """Byte-wise table CRC-16 (poly 0x8005); see :func:`_crc8`."""
    crc = 0
    for b in data:
        crc = ((crc << 8) ^ _CRC16_TABLE[(crc >> 8) ^ b]) & 0xFFFF
    return crc


class _Bits:
    """MSB-first reader over the whole stream (FLAC is not byte-stuffed).

    ``bitarr`` exposes the stream as an unpacked 0/1 numpy array (built
    lazily ONCE per stream) — the substrate of the round-9 vectorized
    residual/verbatim paths; the scalar reader and the array always
    agree on ``bitpos`` semantics."""

    __slots__ = ("data", "bitpos", "_bitarr")

    def __init__(self, data: bytes, bitpos: int = 0):
        self.data = data
        self.bitpos = bitpos
        self._bitarr = None

    def bitarr(self) -> np.ndarray:
        if self._bitarr is None:
            self._bitarr = np.unpackbits(np.frombuffer(self.data, dtype=np.uint8))
        return self._bitarr

    def read(self, n: int) -> int:
        end = self.bitpos + n
        if end > len(self.data) * 8:
            raise ValueError("truncated FLAC bitstream")
        out = 0
        pos = self.bitpos
        while n:
            byte = self.data[pos >> 3]
            avail = 8 - (pos & 7)
            take = min(avail, n)
            out = (out << take) | ((byte >> (avail - take)) & ((1 << take) - 1))
            pos += take
            n -= take
        self.bitpos = pos
        return out

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v >= (1 << (n - 1)) else v

    def read_unary(self) -> int:
        q = 0
        while self.read(1) == 0:
            q += 1
            if q > 1 << 24:
                raise ValueError("runaway unary code (corrupt FLAC)")
        return q

    def align(self) -> None:
        self.bitpos = (self.bitpos + 7) & ~7


def _read_utf8_coded(bits: _Bits) -> int:
    """FLAC's UTF-8-style variable-length frame/sample number."""
    b0 = bits.read(8)
    if b0 < 0x80:
        return b0
    n = 0
    mask = 0x40
    while b0 & mask:
        n += 1
        mask >>= 1
    if n < 1 or n > 6:
        raise ValueError("invalid UTF-8-coded number in frame header")
    v = b0 & (mask - 1)
    for _ in range(n):
        c = bits.read(8)
        if c & 0xC0 != 0x80:
            raise ValueError("invalid UTF-8-coded continuation byte")
        v = (v << 6) | (c & 0x3F)
    return v


def _extract_fields(ba: np.ndarray, starts: np.ndarray, width: int) -> np.ndarray:
    """Vectorized MSB-first unsigned field extraction: the ``width``-bit
    integer starting at each bit position in ``starts``. Callers bound
    ``starts + width <= len(ba)``."""
    if width == 0 or len(starts) == 0:
        return np.zeros(len(starts), dtype=np.int64)
    idx = starts[:, None] + np.arange(width, dtype=np.int64)[None, :]
    w = np.left_shift(np.int64(1), np.arange(width - 1, -1, -1, dtype=np.int64))
    return (ba[idx].astype(np.int64) * w).sum(axis=1)


def _rice_partition(bits: _Bits, count: int, param: int) -> np.ndarray:
    """Vectorized Rice decode of one partition (round 9: the per-sample
    read_unary/read loop was the decode hot path — measured 5x+ on the
    whole-clip wall). The sequential entropy CONTRACT is untouched; it
    is factored into a precomputed JUMP TABLE: for every 1-bit at
    position ``ones[i]``, ``nxt[i]`` is the index of the first 1-bit
    past that bit's ``param`` low-bit field (one vectorized
    searchsorted). The terminator chain — sample k's low bits may
    contain 1-bits that sample k+1's unary scan must skip — is then a
    plain list-index walk; quotients, low bits, and the zigzag are
    pure array math off the found terminator positions."""
    ba = bits.bitarr()
    start = bits.bitpos
    total = len(ba)
    if count == 0:
        return np.zeros(0, dtype=np.int64)
    # expected bits/sample = param + 1 + E[quotient] (~= param + 2 for a
    # well-fit param); 1.3x margin — the growth loop below is the
    # correctness backstop, the estimate only sizes the common case
    window_end = min(total, start + (count * (param + 2) * 13) // 10 + 64)
    terms_l: list[int] = []
    while True:
        ones = np.flatnonzero(ba[start:window_end]).astype(np.int64) + start
        nxt = np.searchsorted(ones, ones + 1 + param, side="left")
        ones_l, nxt_l = ones.tolist(), nxt.tolist()
        i, n_ones = 0, len(ones_l)
        terms_l.clear()
        while len(terms_l) < count and i < n_ones:
            terms_l.append(ones_l[i])
            i = nxt_l[i]
        if len(terms_l) == count:
            break
        if window_end >= total:
            raise ValueError("truncated FLAC bitstream")
        window_end = min(total, window_end + max(window_end - start, 4096))
    terms = np.array(terms_l, dtype=np.int64)
    end = int(terms[-1]) + 1 + param
    if end > total:
        raise ValueError("truncated FLAC bitstream")
    starts = np.empty(count, dtype=np.int64)
    starts[0] = start
    starts[1:] = terms[:-1] + 1 + param
    q = terms - starts
    if bool((q > 1 << 24).any()):
        raise ValueError("runaway unary code (corrupt FLAC)")
    low = _extract_fields(ba, terms + 1, param)
    v = (q << param) | low
    bits.bitpos = end
    return (v >> 1) ^ -(v & 1)  # zigzag


def _read_residual(bits: _Bits, block_size: int, order: int) -> np.ndarray:
    method = bits.read(2)
    if method > 1:
        raise ValueError(f"reserved residual coding method {method}")
    plen = 4 if method == 0 else 5
    escape = (1 << plen) - 1
    porder = bits.read(4)
    nparts = 1 << porder
    if block_size % nparts:
        raise ValueError("partition order does not divide block size")
    parts: list[np.ndarray] = []
    for p in range(nparts):
        count = (block_size >> porder) - (order if p == 0 else 0)
        if count < 0:
            raise ValueError("negative residual partition size")
        param = bits.read(plen)
        if param == escape:
            nbits = bits.read(5)
            if nbits:
                ba = bits.bitarr()
                end = bits.bitpos + count * nbits
                if end > len(ba):
                    raise ValueError("truncated FLAC bitstream")
                starts = bits.bitpos + nbits * np.arange(count, dtype=np.int64)
                u = _extract_fields(ba, starts, nbits)
                sign = np.int64(1) << (nbits - 1)
                parts.append(u - ((u >= sign).astype(np.int64) << np.int64(nbits)))
                bits.bitpos = end
            else:
                parts.append(np.zeros(count, dtype=np.int64))
        else:
            parts.append(_rice_partition(bits, count, param))
    return np.concatenate(parts) if parts else np.zeros(0, dtype=np.int64)


_LPC_LOOPS: dict = {}


def _lpc_loop(order: int):
    """Compile (once per order, cached) the exact LPC reconstruction
    loop with the dot product unrolled into local-variable registers:
    ``v = ((c1*s1 + ... + ck*sk) >> shift) + r`` then rotate. Same
    Python-int (arbitrary-precision, overflow-free) semantics as the
    naive ``sum(c * out[-i-1] ...)`` form — only the interpreter
    overhead (generator frame + list indexing per sample) goes away.
    s1 is the most recent sample, sk the oldest, matching coefficient
    order as read from the bitstream."""
    fn = _LPC_LOOPS.get(order)
    if fn is None:
        cs = ", ".join(f"c{i}" for i in range(1, order + 1))
        regs = ", ".join(f"s{i}" for i in range(1, order + 1))
        init = ", ".join(f"warm[{order - i}]" for i in range(1, order + 1))
        dot = " + ".join(f"c{i}*s{i}" for i in range(1, order + 1))
        rot = "; ".join(f"s{i} = s{i - 1}" for i in range(order, 1, -1))
        rot = (rot + "; " if rot else "") + "s1 = v"
        src = (
            f"def _f(warm, coefs, shift, resid):\n"
            f"    ({cs},) = coefs\n"
            f"    ({regs},) = ({init},)\n"
            f"    out = list(warm)\n"
            f"    ap = out.append\n"
            f"    for r in resid:\n"
            f"        v = (({dot}) >> shift) + r\n"
            f"        ap(v)\n"
            f"        {rot}\n"
            f"    return out\n"
        )
        ns: dict = {}
        exec(src, ns)  # noqa: S102 — generated from `order` alone
        fn = _LPC_LOOPS[order] = ns["_f"]
    return fn


def _decode_subframe(bits: _Bits, block_size: int, bps: int) -> np.ndarray:
    if bits.read(1):
        raise ValueError("subframe sync bit set (corrupt FLAC)")
    sf_type = bits.read(6)
    wasted = 0
    if bits.read(1):
        wasted = 1 + bits.read_unary()
    eff = bps - wasted
    if eff <= 0:
        raise ValueError("wasted bits exceed sample size")
    if sf_type == 0:  # CONSTANT
        v = bits.read_signed(eff)
        out = np.full(block_size, v, dtype=np.int64)
    elif sf_type == 1:  # VERBATIM
        ba = bits.bitarr()
        end = bits.bitpos + block_size * eff
        if end > len(ba):
            raise ValueError("truncated FLAC bitstream")
        starts = bits.bitpos + eff * np.arange(block_size, dtype=np.int64)
        u = _extract_fields(ba, starts, eff)
        sign = np.int64(1) << (eff - 1)
        out = u - ((u >= sign).astype(np.int64) << np.int64(eff))
        bits.bitpos = end
    elif 8 <= sf_type <= 12:  # FIXED, order 0-4
        order = sf_type - 8
        warm = [bits.read_signed(eff) for _ in range(order)]
        resid = _read_residual(bits, block_size, order)
        out = _fixed_reconstruct(warm, resid, order)
    elif sf_type >= 32:  # LPC, order 1-32
        order = sf_type - 31
        warm = [bits.read_signed(eff) for _ in range(order)]
        prec = bits.read(4)
        if prec == 15:
            raise ValueError("invalid LPC precision code")
        prec += 1
        shift = bits.read_signed(5)
        if shift < 0:
            raise ValueError("negative LPC shift")
        coefs = [bits.read_signed(prec) for _ in range(order)]
        resid = _read_residual(bits, block_size, order)
        # SEQUENTIAL by contract: every sample feeds the next
        # prediction through an arbitrary quantized filter + shift —
        # the floor in `>> shift` is nonlinear, so no blocked/cumsum
        # form exists (unlike FIXED). The loop body is code-generated
        # per order (cached): unrolled dot + register rotation over
        # Python ints — the SAME arbitrary-precision arithmetic as the
        # naive genexpr-sum form, ~2x less interpreter overhead
        # (measured in SCALING.md r10; fixtures pin bit-exactness).
        out = np.array(
            _lpc_loop(order)(warm, coefs, shift, resid.tolist()),
            dtype=np.int64,
        )
    else:
        raise ValueError(f"reserved subframe type {sf_type}")
    return out << wasted


def _fixed_reconstruct(warm: list[int], resid: np.ndarray, order: int) -> np.ndarray:
    """FIXED-predictor reconstruction as iterated cumulative sums
    (round 9, vectorizing the per-sample loop): the order-k FIXED
    residual IS the k-th forward difference of the signal, so
    reconstruction = k nested cumsums, each seeded with the last value
    of the warmup's difference pyramid. Bit-identical to the
    sequential form (fixtures + roundtrips pin it); int64 is exact —
    level-j values are the actual j-th differences, bounded by
    2^(bps+j) on any in-range stream, and the overflow guard below
    rejects the crafted out-of-range streams the old Python-int path
    refused via OverflowError."""
    if order == 0:
        return np.asarray(resid, dtype=np.int64)
    if resid.size and np.abs(resid).max() > np.int64(1) << 40:
        # pre-guard: residuals this large (legal ceiling ~2^36 for
        # 32-bit audio at order 4) would overflow the first cumsum
        # BEFORE the per-level guard could see it
        raise ValueError("FIXED residual out of range (corrupt FLAC)")
    levels = [np.asarray(warm, dtype=np.int64)]
    for _ in range(1, order):
        levels.append(np.diff(levels[-1]))
    s = np.asarray(resid, dtype=np.int64)
    for j in range(order - 1, -1, -1):
        s = levels[j][-1] + np.cumsum(s)
        if s.size and np.abs(s).max() > np.int64(1) << 40:
            # legal streams stay far below (2^(32+4) worst case); a
            # CRC-valid crafted stream must fail loudly, not wrap
            raise ValueError("FIXED predictor overflow (corrupt FLAC)")
    return np.concatenate([levels[0], s])


def decode_flac(data: bytes) -> tuple[np.ndarray, int]:
    """Decode a FLAC payload to (samples, sample_rate): float64 in
    [-1, 1), shape (frames, channels) — bit-exact integer recovery
    scaled by 2^(bps-1), the :func:`.audio.decode_wav` contract.

    Exception contract as everywhere in this package: corrupt /
    truncated -> ValueError; unsupported -> NotImplementedError."""
    try:
        return _decode_flac_impl(bytes(data))
    except (IndexError, KeyError, struct.error, OverflowError) as exc:
        raise ValueError(f"corrupt/truncated FLAC: {exc!r}") from exc


def _decode_flac_impl(data: bytes) -> tuple[np.ndarray, int]:
    if data[:4] != b"fLaC":
        raise ValueError("not a FLAC payload (missing fLaC magic)")
    pos = 4
    streaminfo = None
    while True:
        if pos + 4 > len(data):
            raise ValueError("truncated FLAC metadata")
        hdr = data[pos]
        last, btype = hdr >> 7, hdr & 0x7F
        (blen,) = struct.unpack(">I", b"\x00" + data[pos + 1 : pos + 4])
        body = data[pos + 4 : pos + 4 + blen]
        if btype == 0:  # STREAMINFO
            if len(body) < 34:
                raise ValueError("truncated STREAMINFO")
            sb = _Bits(body)
            sb.read(16); sb.read(16); sb.read(24); sb.read(24)
            rate = sb.read(20)
            channels = sb.read(3) + 1
            bps = sb.read(5) + 1
            total = sb.read(36)
            streaminfo = (rate, channels, bps, total)
        elif btype == 127:
            raise ValueError("invalid metadata block type 127")
        pos += 4 + blen
        if last:
            break
    if streaminfo is None:
        raise ValueError("FLAC stream has no STREAMINFO block")
    rate, channels, bps, total = streaminfo
    if rate == 0:
        raise ValueError("STREAMINFO sample rate is 0")

    chans: list[list[np.ndarray]] = [[] for _ in range(channels)]
    decoded = 0
    bits = _Bits(data, pos * 8)
    nbytes = len(data)
    while bits.bitpos < nbytes * 8 - 15:
        frame_start = bits.bitpos >> 3
        sync = bits.read(14)
        if sync != 0x3FFE:
            raise ValueError(f"bad frame sync at byte {frame_start}")
        if bits.read(1):
            raise ValueError("reserved frame-header bit set")
        bits.read(1)  # blocking strategy
        bs_code = bits.read(4)
        sr_code = bits.read(4)
        ch_code = bits.read(4)
        ss_code = bits.read(3)
        if bits.read(1):
            raise ValueError("reserved frame-header bit set")
        _read_utf8_coded(bits)
        if bs_code == 0:
            raise ValueError("reserved block size code 0")
        elif bs_code == 6:
            block_size = bits.read(8) + 1
        elif bs_code == 7:
            block_size = bits.read(16) + 1
        else:
            block_size = _BLOCK_SIZES[bs_code]
        if sr_code == 12:
            bits.read(8)
        elif sr_code in (13, 14):
            bits.read(16)
        elif sr_code == 15:
            raise ValueError("invalid sample rate code 15")
        elif sr_code != 0 and _RATES.get(sr_code) not in (None, rate):
            pass  # frame-local rate overrides are legal; STREAMINFO rules
        if ss_code == 0:
            f_bps = bps
        elif ss_code in (3,):
            raise ValueError("reserved sample size code 3")
        else:
            f_bps = _SIZES[ss_code]
        # CRC-8 over the header bytes (sync through just before the CRC)
        bits.align()
        hdr_end = bits.bitpos >> 3
        want = bits.read(8)
        got = _crc8(data[frame_start:hdr_end])
        if want != got:
            raise ValueError("frame header CRC-8 mismatch (corrupt FLAC)")

        if ch_code < 8:
            n_ch = ch_code + 1
            if n_ch != channels:
                raise ValueError("frame channel count differs from STREAMINFO")
            subs = [_decode_subframe(bits, block_size, f_bps) for _ in range(n_ch)]
        elif ch_code in (8, 9, 10):  # stereo decorrelation
            if channels != 2:
                raise ValueError("decorrelated frame in non-stereo stream")
            if ch_code == 8:  # left/side
                left = _decode_subframe(bits, block_size, f_bps)
                side = _decode_subframe(bits, block_size, f_bps + 1)
                subs = [left, left - side]
            elif ch_code == 9:  # right/side
                side = _decode_subframe(bits, block_size, f_bps + 1)
                right = _decode_subframe(bits, block_size, f_bps)
                subs = [right + side, right]
            else:  # mid/side: mid = (L+R)>>1 (floor), side = L-R
                mid = _decode_subframe(bits, block_size, f_bps)
                side = _decode_subframe(bits, block_size, f_bps + 1)
                left = (((mid << 1) | (side & 1)) + side) >> 1
                subs = [left, left - side]
        else:
            raise ValueError(f"reserved channel assignment {ch_code}")
        bits.align()
        crc_end = bits.bitpos >> 3
        if bits.read(16) != _crc16(data[frame_start:crc_end]):
            # round-8 review: without this check, single bit flips in
            # the entropy data decoded SILENTLY to wrong samples — the
            # spec ships the frame CRC-16 exactly to catch that
            raise ValueError("frame CRC-16 mismatch (corrupt FLAC)")
        for c in range(channels):
            chans[c].append(subs[c])
        decoded += len(subs[0])
        if total and decoded >= total:
            break
    if total and decoded < total:
        raise ValueError("FLAC stream ended before STREAMINFO total samples")
    n = total or decoded
    cat = [
        np.concatenate(c) if c else np.zeros(0, dtype=np.int64) for c in chans
    ]
    arr = np.array([c[:n] for c in cat], dtype=np.float64).T
    return arr / float(1 << (bps - 1)), rate


# ---------------------------------------------------------------- encoder


class _BitsW:
    __slots__ = ("out", "acc", "n")

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, v: int, nbits: int) -> None:
        v &= (1 << nbits) - 1 if nbits else 0
        self.acc = (self.acc << nbits) | v
        self.n += nbits
        while self.n >= 8:
            self.n -= 8
            self.out.append((self.acc >> self.n) & 0xFF)
        self.acc &= (1 << self.n) - 1

    def align(self) -> None:
        if self.n:
            self.write(0, 8 - self.n)

    def bytes(self) -> bytes:
        assert self.n == 0
        return bytes(self.out)


def _rice_cost(resid: list[int], param: int) -> int:
    return sum((((v << 1) ^ (v >> 63)) >> param) + 1 + param for v in
               (int(x) for x in resid))


def _write_rice(bw: _BitsW, resid, param: int) -> None:
    bw.write(0, 2)  # method 0: 4-bit params
    bw.write(0, 4)  # partition order 0 (single partition)
    bw.write(param, 4)
    for v in resid:
        v = int(v)
        u = (v << 1) ^ (v >> 63)  # zigzag (arithmetic shift: sign mask)
        q = u >> param
        for _ in range(q):
            bw.write(0, 1)
        bw.write(1, 1)
        bw.write(u & ((1 << param) - 1), param)


def _lpc_quantized(x: np.ndarray, order: int, precision: int = 12):
    """Quantized LPC filter for one block (the libFLAC recipe, public:
    autocorrelation -> Levinson-Durbin -> coefficient quantization).
    Returns (coefs list[int], shift int) or None when the block is
    degenerate (zero energy, unstable recursion, all-zero filter) —
    callers fall back to the FIXED path."""
    xf = x.astype(np.float64)
    n = len(xf)
    if n <= order:
        return None
    r = np.array([float(np.dot(xf[: n - k], xf[k:])) for k in range(order + 1)])
    if r[0] <= 0.0:
        return None
    a = np.zeros(order + 1)
    a[0] = 1.0
    e = r[0]
    for i in range(1, order + 1):
        acc = r[i] + float(np.dot(a[1:i], r[1:i][::-1]))
        if e <= 0.0:
            return None
        k = -acc / e
        if not -1.0 < k < 1.0:  # unstable filter — bail to FIXED
            return None
        a[1:i] = a[1:i] + k * a[1:i][::-1]
        a[i] = k
        e *= 1.0 - k * k
    coefs = -a[1:]  # predictor: x[n] ~= sum(c_j * x[n-j])
    peak = float(np.abs(coefs).max())
    if peak == 0.0:
        return None
    import math

    shift = (precision - 1) - (int(math.floor(math.log2(peak))) + 1)
    shift = max(0, min(15, shift))
    lim = 1 << (precision - 1)
    q = [int(np.clip(round(c * (1 << shift)), -lim, lim - 1)) for c in coefs]
    if not any(q):
        return None
    return q, shift


def encode_flac(
    samples: np.ndarray, sample_rate: int, bps: int = 16, predictor: str = "fixed"
) -> bytes:
    """Minimal spec-conformant FLAC writer: independent channels, one
    frame per 4096-sample block, per-subframe best of CONSTANT / FIXED
    order 0-2 with single-partition Rice residuals. Lossless by
    construction — ``decode_flac(encode_flac(s))`` recovers the
    quantized integers EXACTLY (pytest-pinned).

    ``predictor="lpc"`` (round 10): order-8 quantized-LPC subframes
    (autocorrelation + Levinson-Durbin, precision 12 — the libFLAC
    default shape), falling back to the FIXED candidates only on
    degenerate blocks. Exists because real libFLAC corpora
    (LibriSpeech et al.) are predominantly LPC subframes, and the
    decoder's LPC path — sequential by spec — needs HONEST fixtures to
    measure against (SCALING.md r10); it also simply compresses
    correlated audio better, same as everywhere else in lossless
    audio."""
    if bps != 16:
        raise NotImplementedError("encoder writes 16-bit FLAC only")
    if predictor not in ("fixed", "lpc"):
        raise ValueError(f"predictor must be 'fixed' or 'lpc', got {predictor!r}")
    if not 1 <= sample_rate <= 655350:  # spec max; field is 20 bits
        raise ValueError(f"sample_rate must be in [1, 655350], got {sample_rate}")
    s = np.asarray(samples, dtype=np.float64)
    if s.ndim == 1:
        s = s[:, None]
    ints = np.clip(np.round(s * 32768.0), -32768, 32767).astype(np.int64)
    nframes, channels = ints.shape
    if not 1 <= channels <= 8:
        raise ValueError(f"channels must be 1..8, got {channels}")

    out = bytearray(b"fLaC")
    si = _BitsW()
    # STREAMINFO min/max blocksize must describe the stream's ACTUAL
    # frames: a single-frame stream shorter than 4096 samples has no
    # "trailing short frame" for the spec's last-frame exemption to
    # cover, so strict validators flag a 4096/4096 claim (round-8
    # ADVICE). Field legal range is 16..65535, hence the floor.
    bs_field = max(min(nframes, 4096), 16) if nframes else 4096
    si.write(bs_field, 16); si.write(bs_field, 16)
    si.write(0, 24); si.write(0, 24)
    si.write(sample_rate, 20)
    si.write(channels - 1, 3)
    si.write(bps - 1, 5)
    si.write(nframes, 36)
    body = si.bytes() + b"\x00" * 16  # zero MD5 (unset, legal)
    out += bytes([0x80]) + struct.pack(">I", len(body))[1:] + body

    for fi, start in enumerate(range(0, max(nframes, 1), 4096)):
        block = ints[start : start + 4096]
        bsize = len(block)
        if bsize == 0:
            break
        bw = _BitsW()
        bw.write(0x3FFE, 14)
        bw.write(0, 1)
        bw.write(0, 1)  # fixed blocksize strategy
        bw.write(7, 4)  # block size: 16-bit field follows
        bw.write(0, 4)  # sample rate: from STREAMINFO
        bw.write(channels - 1, 4)
        bw.write(4, 3)  # 16 bps
        bw.write(0, 1)
        # UTF-8-coded frame number: 1-byte (<128) or 2-byte (<2048) forms
        # cover 2048 frames x 4096 samples = 8.4M samples per stream
        fn = fi
        if fn < 0x80:
            bw.write(fn, 8)
        elif fn < 0x800:
            bw.write(0xC0 | (fn >> 6), 8)
            bw.write(0x80 | (fn & 0x3F), 8)
        else:
            raise NotImplementedError("encoder caps at 2048 frames per stream")
        bw.write(bsize - 1, 16)
        bw.align()
        hdr = bw.bytes()
        hdr += bytes([_crc8(hdr)])
        fw = _BitsW()
        for c in range(channels):
            x = block[:, c]
            # candidate subframes: constant, fixed order 0/1/2
            if np.all(x == x[0]):
                fw.write(0, 1); fw.write(0, 6); fw.write(0, 1)
                fw.write(int(x[0]), 16)
                continue
            if predictor == "lpc":
                lpc = _lpc_quantized(x, min(8, bsize - 1))
                if lpc is not None:
                    qc, shift = lpc
                    order = len(qc)
                    # residual with the decoder's EXACT integer
                    # semantics: r[n] = x[n] - ((sum_j c_j*x[n-j]) >>
                    # shift); the windowed dot is int64-exact
                    # (|c|<2^11, |x|<2^15, order<=8 -> |sum|<2^30) and
                    # numpy >> is the same arithmetic shift
                    w = sliding_window_view(x, order)[:-1]
                    dot = w @ np.asarray(qc[::-1], dtype=np.int64)
                    resid = (x[order:] - (dot >> np.int64(shift))).tolist()
                    _, param = min((_rice_cost(resid, p), p) for p in range(15))
                    fw.write(0, 1); fw.write(31 + order, 6); fw.write(0, 1)
                    for i in range(order):
                        fw.write(int(x[i]), 16)
                    fw.write(12 - 1, 4)  # precision code = prec-1
                    fw.write(shift, 5)  # non-negative by construction
                    for qcoef in qc:
                        fw.write(qcoef, 12)
                    _write_rice(fw, resid, param)
                    continue
            best = None
            for order in (0, 1, 2):
                if bsize <= order:
                    continue
                coefs = _FIXED_COEFS[order]
                resid = list(x[order:])
                for i, cc in enumerate(coefs):
                    resid = [r - cc * int(x[order + j - i - 1]) for j, r in enumerate(resid)]
                # rice parameter: best of 0..14 by exact cost (the
                # param width is charged inside _rice_cost's 1+param)
                cost, param = min((_rice_cost(resid, p), p) for p in range(15))
                cost += order * 16
                if best is None or cost < best[0]:
                    best = (cost, order, param, resid)
            _, order, param, resid = best
            fw.write(0, 1); fw.write(8 + order, 6); fw.write(0, 1)
            for i in range(order):
                fw.write(int(x[i]), 16)
            _write_rice(fw, resid, param)
        fw.align()
        frame = hdr + fw.bytes()
        frame += struct.pack(">H", _crc16(frame))
        out += frame
    return bytes(out)
