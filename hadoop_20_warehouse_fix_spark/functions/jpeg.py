"""Pure-python/numpy baseline JPEG codec — no external libraries.

Round-6 brief #7: the last stubbed multimodal format. The reference
treated codecs as pluggable implementations behind one dispatch
(``/root/reference/src/core/org/apache/hadoop/io/compress/`` — a codec
registry with pure-Java fallbacks for every native codec); this module
is the JPEG entry of :mod:`multimodal`'s dispatch, used only when
PIL/OpenCV is absent (the library remains the fast path).

Implements the baseline sequential DCT process from the public JPEG
specification (ITU-T T.81 / ISO 10918-1):

- decoder: SOI/APPn/DQT/SOF0/DHT/DRI/SOS/RSTn/EOI marker parse,
  canonical Huffman entropy decode (byte-destuffed, restart-interval
  aware), dequantize, vectorized 2D IDCT (the orthonormal DCT-II
  matrix identity — T.81's FDCT/IDCT in A.3.3 equal the orthonormal
  transform, so one matmul per block array), nearest-neighbor chroma
  upsample for any integer sampling factors (4:4:4, 4:2:2, 4:2:0),
  JFIF YCbCr->RGB. Progressive (SOF2), arithmetic coding, and 12-bit
  precision raise ``NotImplementedError`` (library-gated, as before).
- encoder: grayscale or color (4:4:4 / 4:2:0), flat-or-custom
  quantization, canonical Huffman tables built from the data with
  EQUAL code lengths per table (counts[L] = k, k <= 2^L - 1, so the
  all-ones code is never assigned — T.81 C.2's reserved-codepoint
  rule) — not compression-optimal, but every bit is spec-valid, and
  simplicity keeps the encoder honest as a test-fixture generator.

Scale note: entropy decode is sequential per scan BY SPEC (bit-level
Huffman with byte stuffing), so the pure path is a per-row Python
loop inside the Arrow batch — correct, bounded by image size, and
slow relative to a native library. At 100 TB the deployment answer is
the PIL/OpenCV fast path in :func:`multimodal._decode_with_library`;
this module guarantees the capability exists everywhere.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------- shared

_ZZ = []  # zigzag scan order: _ZZ[i] = (row, col) of the i-th coefficient
for _s in range(15):
    _d = range(min(_s, 7), max(0, _s - 7) - 1, -1) if _s % 2 == 0 else range(max(0, _s - 7), min(_s, 7) + 1)
    _ZZ.extend((y, _s - y) for y in _d)

# Orthonormal 8x8 DCT-II basis: T.81 A.3.3's FDCT/IDCT are exactly
# F = M f M^T / f = M^T F M with this M (the 1/4·C(u)C(v) scaling IS
# the orthonormal normalization, term by term).
_M = np.zeros((8, 8))
for _u in range(8):
    for _x in range(8):
        _M[_u, _x] = np.sqrt((1.0 if _u == 0 else 2.0) / 8.0) * np.cos((2 * _x + 1) * _u * np.pi / 16.0)


def _idct_blocks(blocks: np.ndarray) -> np.ndarray:
    """Vectorized IDCT over an (n, 8, 8) coefficient array."""
    return _M.T @ blocks @ _M


def _fdct_blocks(blocks: np.ndarray) -> np.ndarray:
    return _M @ blocks @ _M.T


def _build_huff(counts: list[int], symbols: bytes) -> dict:
    """Canonical Huffman (T.81 C.2): codes assigned in increasing
    length then symbol order. Returns {(length, code): symbol}."""
    table, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            table[(length, code)] = symbols[k]
            k += 1
            code += 1
        code <<= 1
    return table


def _extend(bits: int, t: int) -> int:
    """T.81 F.2.2.1 EXTEND: map a t-bit magnitude to its signed value."""
    return bits if bits >= (1 << (t - 1)) else bits - (1 << t) + 1


# ---------------------------------------------------------------- decoder


def _build_lut(counts: list[int], symbols: bytes) -> list[tuple[int, int]]:
    """16-bit-prefix decode table: lut[peek16] = (symbol, code_length),
    (0, 0) for invalid prefixes. One table lookup replaces the per-bit
    canonical walk — the standard fast Huffman decode (measured ~3x on
    the pure path; the build is C-speed slice assignment, once per DHT)."""
    lut: list[tuple[int, int]] = [(0, 0)] * 65536
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            entry = (symbols[k], length)
            start = code << (16 - length)
            lut[start : start + (1 << (16 - length))] = [entry] * (1 << (16 - length))
            k += 1
            code += 1
        code <<= 1
    return lut


class _BitReader:
    """MSB-first bit reader over a destuffed entropy segment, with a
    byte-refilled accumulator. Reads past the end return 1-bits (the
    T.81 padding convention) so the final MCU's 16-bit decode peek
    never falls off the buffer; more than 8 phantom bytes means the
    segment was genuinely truncated."""

    __slots__ = ("data", "pos", "acc", "nbits")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def _fill(self, need: int) -> None:
        while self.nbits < need:
            if self.pos < len(self.data):
                b = self.data[self.pos]
            elif self.pos < len(self.data) + 8:
                b = 0xFF  # padding past the end (peek slack)
            else:
                raise ValueError("truncated entropy-coded segment")
            self.pos += 1
            self.acc = ((self.acc << 8) | b) & 0xFFFFFFFF
            self.nbits += 8

    def read_bit(self) -> int:
        return self.read_bits(1)

    def read_bits(self, n: int) -> int:
        if n == 0:
            return 0
        self._fill(n)
        self.nbits -= n
        return (self.acc >> self.nbits) & ((1 << n) - 1)

    def decode_huff(self, lut: list[tuple[int, int]]) -> int:
        self._fill(16)
        sym, length = lut[(self.acc >> (self.nbits - 16)) & 0xFFFF]
        if length == 0:
            raise ValueError("invalid Huffman code in entropy stream")
        self.nbits -= length
        return sym


def _split_entropy(data: bytes, pos: int) -> tuple[list[bytes], int]:
    """Destuff the scan's entropy bytes, splitting at RSTn markers;
    stop at any other marker. Returns (segments, position_of_marker)."""
    segs, cur, n = [], bytearray(), len(data)
    while pos < n:
        b = data[pos]
        if b == 0xFF:
            m = data[pos + 1] if pos + 1 < n else 0xD9
            if m == 0x00:
                cur.append(0xFF)
                pos += 2
                continue
            if 0xD0 <= m <= 0xD7:  # RSTn: restart-interval boundary
                segs.append(bytes(cur))
                cur = bytearray()
                pos += 2
                continue
            break
        cur.append(b)
        pos += 1
    segs.append(bytes(cur))
    return segs, pos


def decode_jpeg(data: bytes) -> np.ndarray:
    """Decode a baseline JPEG to (H, W, 3) uint8 RGB (grayscale is
    replicated across channels, matching :func:`multimodal.decode_image`'s
    contract for every other format).

    Exception contract (shared by every decoder in this package):
    corrupt/truncated data -> ValueError; recognized-but-unsupported
    process -> NotImplementedError. NOTHING else escapes — the batch
    operators (`resize_batch`, `image_features`) catch exactly these
    two to route a bad payload onto the counted fallback instead of
    killing the task."""
    try:
        return _decode_jpeg_impl(data)
    except (IndexError, KeyError, struct.error, ZeroDivisionError, OverflowError) as exc:
        # IndexError/struct.error: truncated segment or entropy data;
        # KeyError: the scan references a quant/Huffman table the
        # (truncated) headers never defined; ZeroDivision/Overflow:
        # arithmetic on values a corrupt header lied about (the SOF
        # validation catches the known shapes; this is the backstop).
        raise ValueError(f"corrupt/truncated JPEG: {exc!r}") from exc


def _decode_jpeg_impl(data: bytes) -> np.ndarray:
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], list] = {}  # (class, id) -> 16-bit-prefix LUT
    frame = None  # (H, W, [(comp_id, h, v, tq), ...])
    restart_interval = 0
    pos, n = 2, len(data)
    while pos < n:
        if data[pos] != 0xFF:
            raise ValueError(f"expected marker at byte {pos}")
        while pos + 1 < n and data[pos + 1] == 0xFF:
            pos += 1  # fill bytes before a marker (T.81 B.1.1.2)
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI before SOS
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:  # TEM/RSTn: no payload
            continue
        (seglen,) = struct.unpack(">H", data[pos : pos + 2])
        seg = data[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT — possibly several tables per segment
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 0x0F
                i += 1
                if pq == 0:
                    vals = np.frombuffer(seg[i : i + 64], dtype=np.uint8).astype(np.int32)
                    i += 64
                else:
                    vals = np.frombuffer(seg[i : i + 128], dtype=">u2").astype(np.int32)
                    i += 128
                t = np.zeros((8, 8), dtype=np.int32)
                for k, (y, x) in enumerate(_ZZ):
                    t[y, x] = vals[k]
                qt[tq] = t
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1: baseline/ext sequential
            precision, height, width, nf = seg[0], struct.unpack(">H", seg[1:3])[0], struct.unpack(">H", seg[3:5])[0], seg[5]
            if precision != 8:
                raise NotImplementedError(f"{precision}-bit JPEG (pure decoder is 8-bit)")
            # Round-7 fuzz hardening: a corrupt SOF can claim zero or
            # implausible dimensions / sampling factors; believing it
            # means divide-by-zero MCU grids or multi-GB allocations.
            if height < 1 or width < 1 or not 1 <= nf <= 4:
                raise ValueError(f"corrupt SOF: {width}x{height}, {nf} components")
            if height * width > 100_000_000:
                raise ValueError(
                    f"JPEG dimensions {width}x{height} exceed the pure "
                    "decoder's 100M-pixel cap (corrupt header, or use a library)"
                )
            comps = []
            for c in range(nf):
                cid, hv, tq = seg[6 + 3 * c], seg[7 + 3 * c], seg[8 + 3 * c]
                h, v = hv >> 4, hv & 0x0F
                if not (1 <= h <= 4 and 1 <= v <= 4):
                    raise ValueError(f"corrupt SOF: sampling factors {h}x{v}")
                comps.append((cid, h, v, tq))
            frame = (height, width, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"JPEG process SOF{marker - 0xC0} (progressive/arithmetic/lossless)"
                " — pure decoder is baseline sequential; install PIL/OpenCV"
            )
        elif marker == 0xC4:  # DHT — possibly several tables per segment
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 0x0F
                counts = list(seg[i + 1 : i + 17])
                nsym = sum(counts)
                huff[(tc, th)] = _build_lut(counts, seg[i + 17 : i + 17 + nsym])
                i += 17 + nsym
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:  # SOS — start of the (single, baseline) scan
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = seg[0]
            if ns == 0:
                raise ValueError("corrupt SOS: zero scan components")
            if ns != len(frame[2]):
                # Spec-legal non-interleaved baseline (one scan per
                # component, T.81 §B.2.3) — the decoder below assumes ONE
                # interleaved scan covering every frame component, so
                # route these to a library instead of misparsing the
                # entropy stream against the frame-wide MCU grid.
                raise NotImplementedError(
                    f"non-interleaved JPEG scan ({ns} of {len(frame[2])} "
                    "components) — pure decoder is single-scan interleaved;"
                    " install PIL/OpenCV"
                )
            scan = []  # (comp_idx, dc_table, ac_table)
            for c in range(ns):
                cs, tdta = seg[1 + 2 * c], seg[2 + 2 * c]
                matches = [i for i, comp in enumerate(frame[2]) if comp[0] == cs]
                if not matches:
                    raise ValueError(f"SOS references undefined component id {cs}")
                idx = matches[0]
                scan.append((idx, tdta >> 4, tdta & 0x0F))
            segs, pos = _split_entropy(data, pos + seglen)
            return _decode_scan(frame, scan, qt, huff, restart_interval, segs)
        pos += seglen
    raise ValueError("no SOS scan found")


def _decode_scan(frame, scan, qt, huff, restart_interval, segs) -> np.ndarray:
    height, width, comps = frame
    hmax = max(h for _, h, _, _ in comps)
    vmax = max(v for _, _, v, _ in comps)
    mcus_x = -(-width // (8 * hmax))
    mcus_y = -(-height // (8 * vmax))
    # per-component zigzag coefficient planes, padded to the MCU grid
    planes = [np.zeros((mcus_y * v * 8, mcus_x * h * 8), dtype=np.int32) for _, h, v, _ in comps]
    order = [(ci, dc, ac) for ci, dc, ac in scan]
    pred = [0] * len(comps)
    br = _BitReader(segs[0])
    seg_idx = 0
    for mcu in range(mcus_x * mcus_y):
        if restart_interval and mcu and mcu % restart_interval == 0:
            seg_idx += 1  # RST boundary: next byte-aligned segment, predictors reset
            br = _BitReader(segs[seg_idx])
            pred = [0] * len(comps)
        my, mx = divmod(mcu, mcus_x)
        for ci, dc_t, ac_t in order:
            _, h, v, _ = comps[ci]
            for b in range(h * v):
                by, bx = divmod(b, h)
                block = _decode_block(br, huff[(0, dc_t)], huff[(1, ac_t)], pred, ci)
                y0, x0 = (my * v + by) * 8, (mx * h + bx) * 8
                planes[ci][y0 : y0 + 8, x0 : x0 + 8] = block
    # dequantize + IDCT, whole component at once (the vectorized half)
    out_planes = []
    for ci, (_, h, v, tq) in enumerate(comps):
        if hmax % h or vmax % v:
            raise NotImplementedError(
                f"non-integer sampling ratio {h}x{v} vs {hmax}x{vmax}"
            )
        p = planes[ci]
        rows, cols = p.shape
        blocks = p.reshape(rows // 8, 8, cols // 8, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
        pix = _idct_blocks((blocks * qt[tq]).astype(np.float64)) + 128.0
        pix = pix.reshape(rows // 8, cols // 8, 8, 8).transpose(0, 2, 1, 3).reshape(rows, cols)
        # nearest-neighbor upsample to the full sampling grid, then crop
        pix = np.repeat(np.repeat(pix, vmax // v, axis=0), hmax // h, axis=1)
        out_planes.append(pix[:height, :width])
    if len(out_planes) == 1:
        gray = np.clip(np.round(out_planes[0]), 0, 255).astype(np.uint8)
        return np.stack([gray] * 3, axis=-1)
    y, cb, cr = out_planes[0], out_planes[1] - 128.0, out_planes[2] - 128.0
    rgb = np.stack(
        [y + 1.402 * cr, y - 0.344136 * cb - 0.714136 * cr, y + 1.772 * cb], axis=-1
    )
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


def _decode_block(br, dc_table, ac_table, pred, ci) -> np.ndarray:
    """One 8x8 block of QUANTIZED coefficients, de-zigzagged to natural
    (row, col) order; dequantization + IDCT happen vectorized later."""
    coeff = np.zeros((8, 8), dtype=np.int32)
    t = br.decode_huff(dc_table)
    diff = _extend(br.read_bits(t), t) if t else 0
    pred[ci] += diff
    coeff[0, 0] = pred[ci]
    k = 1
    while k < 64:
        rs = br.decode_huff(ac_table)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:  # ZRL: sixteen zeros
                k += 16
                continue
            break  # EOB
        k += r
        if k > 63:
            raise ValueError("AC run past end of block")
        y, x = _ZZ[k]
        coeff[y, x] = _extend(br.read_bits(s), s)
        k += 1
    return coeff


# ---------------------------------------------------------------- encoder


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, nbits: int) -> None:
        for i in range(nbits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc, self.nbits = 0, 0

    def flush(self) -> bytes:
        if self.nbits:
            self.write((1 << (8 - self.nbits)) - 1, 8 - self.nbits)  # pad with 1s
        return bytes(self.out)


def _size_cat(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


def _mag_bits(v: int, t: int) -> int:
    return v if v >= 0 else v + (1 << t) - 1


def _equal_length_table(symbols: list[int]) -> tuple[list[int], bytes]:
    """counts/symbols for a canonical table giving every symbol the SAME
    code length L, with k <= 2^L - 1 so the all-ones code stays unused
    (T.81 C.2). Valid, simple, and deliberately non-optimal."""
    syms = sorted(set(symbols))
    k = len(syms)
    length = max(1, (k + 1 - 1).bit_length())  # smallest L with 2^L - 1 >= k
    while (1 << length) - 1 < k:
        length += 1
    counts = [0] * 16
    counts[length - 1] = k
    return counts, bytes(syms)


def _encode_codes(counts: list[int], symbols: bytes) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) from the canonical assignment."""
    return {sym: (code, length) for (length, code), sym in _build_huff(counts, symbols).items()}


def _block_symbols(qblocks: np.ndarray, pred: int) -> tuple[list, int]:
    """Per-block (dc_size, dc_bits, [(rs, bits, size), ...]) tuples plus
    the updated DC predictor — shared by the stats and emit passes."""
    out = []
    for blk in qblocks:
        zz = np.array([blk[y, x] for y, x in _ZZ], dtype=np.int64)
        diff = int(zz[0]) - pred
        pred = int(zz[0])
        t = _size_cat(diff)
        acs = []
        run = 0
        nz = np.nonzero(zz[1:])[0]
        last = nz[-1] + 1 if len(nz) else 0
        for k in range(1, last + 1):
            v = int(zz[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                acs.append((0xF0, 0, 0))  # ZRL
                run -= 16
            s = _size_cat(v)
            acs.append(((run << 4) | s, _mag_bits(v, s), s))
            run = 0
        if last < 63:
            acs.append((0x00, 0, 0))  # EOB
        out.append((t, _mag_bits(diff, t), acs))
    return out, pred


def _plane_blocks(plane: np.ndarray, quant: np.ndarray) -> np.ndarray:
    """Pad (edge-replicate) to 8-multiples, FDCT, quantize-round."""
    h, w = plane.shape
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    p = np.pad(plane.astype(np.float64) - 128.0, ((0, ph - h), (0, pw - w)), mode="edge")
    blocks = p.reshape(ph // 8, 8, pw // 8, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    return np.round(_fdct_blocks(blocks) / quant).astype(np.int64)


def encode_jpeg(arr: np.ndarray, quant: int | np.ndarray = 16, subsample: str = "444") -> bytes:
    """Encode (H, W) grayscale or (H, W, 3) RGB uint8 as baseline JPEG.

    ``quant``: scalar for a flat quantization table (analytically
    convenient: reconstruction error per coefficient <= quant/2), or a
    full 64-value table in natural (row-major) order.
    ``subsample``: "444" or "420" (color only)."""
    arr = np.asarray(arr, dtype=np.uint8)
    if subsample not in ("444", "420"):
        raise ValueError(f"subsample must be '444' or '420', got {subsample!r}")
    q = np.full((8, 8), int(quant), dtype=np.int32) if np.isscalar(quant) else np.asarray(quant, dtype=np.int32).reshape(8, 8)
    if not (1 <= q.min() and q.max() <= 255):
        raise ValueError("quantization values must be in [1, 255] (8-bit DQT)")
    h, w = arr.shape[:2]
    gray = arr.ndim == 2
    if gray:
        planes = [arr.astype(np.float64)]
        samp = [(1, 1)]
    else:
        r, g, b = (arr[..., i].astype(np.float64) for i in range(3))
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if subsample == "420":
            ph, pw = -(-h // 2) * 2, -(-w // 2) * 2
            cb = np.pad(cb, ((0, ph - h), (0, pw - w)), mode="edge")
            cr = np.pad(cr, ((0, ph - h), (0, pw - w)), mode="edge")
            cb = cb.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
            cr = cr.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
            samp = [(2, 2), (1, 1), (1, 1)]
            # Y padded so the MCU grid (16x16) is whole; chroma to 8s.
            yh, yw = -(-h // 16) * 16, -(-w // 16) * 16
            y = np.pad(y, ((0, yh - h), (0, yw - w)), mode="edge")
        else:
            samp = [(1, 1), (1, 1), (1, 1)]
        planes = [np.clip(p, 0, 255) for p in (y, cb, cr)]
    qblocks = [_plane_blocks(p, q) for p in planes]

    # MCU-interleave block order (matches the decoder's scan order)
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcus_x, mcus_y = -(-w // (8 * hmax)), -(-h // (8 * vmax))
    interleaved: list[list[int]] = [[] for _ in planes]  # block indices per comp
    for mcu in range(mcus_x * mcus_y):
        my, mx = divmod(mcu, mcus_x)
        for ci, (sh, sv) in enumerate(samp):
            # every component's padded plane is exactly the MCU grid:
            # (mcus_y * sv) x (mcus_x * sh) blocks, by the padding above
            cols = mcus_x * sh
            for b in range(sh * sv):
                by, bx = divmod(b, sh)
                interleaved[ci].append((my * sv + by) * cols + (mx * sh + bx))
    # Stats pass: symbol sets per table class (0 = luma, 1 = chroma)
    classes = [0] + [1] * (len(planes) - 1)
    dc_syms: dict[int, list] = {0: [], 1: []}
    ac_syms: dict[int, list] = {0: [], 1: []}
    per_comp_syms = []
    for ci in range(len(planes)):
        ordered = qblocks[ci][interleaved[ci]]
        syms, _ = _block_symbols(ordered, 0)
        per_comp_syms.append(syms)
        for t, _, acs in syms:
            dc_syms[classes[ci]].append(t)
            ac_syms[classes[ci]].extend(rs for rs, _, _ in acs)
    used = sorted(set(classes))
    tables = {}
    for cl in used:
        tables[(0, cl)] = _equal_length_table(dc_syms[cl])
        tables[(1, cl)] = _equal_length_table(ac_syms[cl] or [0x00])
    codes = {k: _encode_codes(*v) for k, v in tables.items()}

    # Emit pass — interleave MCU by MCU exactly as counted above.
    bw_ = _BitWriter()
    cursor = [0] * len(planes)
    for mcu in range(mcus_x * mcus_y):
        for ci, (sh, sv) in enumerate(samp):
            cl = classes[ci]
            for _ in range(sh * sv):
                t, dbits, acs = per_comp_syms[ci][cursor[ci]]
                cursor[ci] += 1
                c, length = codes[(0, cl)][t]
                bw_.write(c, length)
                if t:
                    bw_.write(dbits, t)
                for rs, bits, s in acs:
                    c, length = codes[(1, cl)][rs]
                    bw_.write(c, length)
                    if s:
                        bw_.write(bits, s)
    entropy = bw_.flush()

    # Headers
    out = bytearray(b"\xff\xd8")
    zz_q = bytes(int(q[y, x]) for y, x in _ZZ)
    out += b"\xff\xdb" + struct.pack(">H", 2 + 65) + b"\x00" + zz_q
    if len(planes) > 1:
        out += b"\xff\xdb" + struct.pack(">H", 2 + 65) + b"\x01" + zz_q
    sof = bytearray(struct.pack(">BHHB", 8, h, w, len(planes)))
    for ci, (sh, sv) in enumerate(samp):
        sof += bytes([ci + 1, (sh << 4) | sv, 0 if ci == 0 else (1 if len(planes) > 1 else 0)])
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    for (tc, th), (counts, syms) in sorted(tables.items()):
        body = bytes([(tc << 4) | th]) + bytes(counts) + syms
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body
    sos = bytearray([len(planes)])
    for ci in range(len(planes)):
        cl = classes[ci]
        sos += bytes([ci + 1, (cl << 4) | cl])
    sos += b"\x00\x3f\x00"  # Ss=0, Se=63, AhAl=0 (baseline)
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
    out += entropy + b"\xff\xd9"
    return bytes(out)
