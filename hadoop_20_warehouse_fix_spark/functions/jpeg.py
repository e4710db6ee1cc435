"""Pure-python/numpy baseline JPEG codec — no external libraries.

Round-6 brief #7: the last stubbed multimodal format. The reference
treated codecs as pluggable implementations behind one dispatch
(``/root/reference/src/core/org/apache/hadoop/io/compress/`` — a codec
registry with pure-Java fallbacks for every native codec); this module
is the JPEG entry of :mod:`multimodal`'s dispatch, used only when
PIL/OpenCV is absent (the library remains the fast path).

Implements the baseline sequential AND progressive Huffman DCT
processes from the public JPEG specification (ITU-T T.81 /
ISO 10918-1):

- decoder: SOI/APPn/DQT/SOF0/1/2/DHT/DRI/SOS/RSTn/EOI marker parse,
  canonical Huffman entropy decode (byte-destuffed, restart-interval
  aware), dequantize, vectorized 2D IDCT (the orthonormal DCT-II
  matrix identity — T.81's FDCT/IDCT in A.3.3 equal the orthonormal
  transform, so one matmul per block array), nearest-neighbor chroma
  upsample for any integer sampling factors (4:4:4, 4:2:2, 4:2:0),
  JFIF YCbCr->RGB. PROGRESSIVE (SOF2, round 8 — previously
  library-gated): multi-scan coefficient accumulation with spectral
  selection bands, successive approximation (DC and AC first/refine,
  T.81 Annex G), EOB runs, interleaved DC scans, one reconstruction
  at EOI. Arithmetic coding, lossless/hierarchical, and 12-bit
  precision still raise ``NotImplementedError`` (library-gated).
- encoder: grayscale or color (4:4:4 / 4:2:0), flat-or-custom
  quantization, canonical Huffman tables built from the data with
  EQUAL code lengths per table (counts[L] = k, k <= 2^L - 1, so the
  all-ones code is never assigned — T.81 C.2's reserved-codepoint
  rule) — not compression-optimal, but every bit is spec-valid, and
  simplicity keeps the encoder honest as a test-fixture generator.
  ``encode_jpeg_progressive`` emits the SOF2 form (full scan script:
  spectral selection + successive approximation, jcphuff.c-style
  refinement bit buffering) and decodes to EXACTLY the baseline
  encoder's pixels at equal quant (pytest-pinned) — progression
  reorders the bits, never the final coefficients.

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
    progressive = False
    coefs: list[np.ndarray] | None = None  # progressive: per-comp zigzag state
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
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline/extended, SOF2 progressive
            progressive = marker == 0xC2
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
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"JPEG process SOF{marker - 0xC0} (arithmetic/lossless/hierarchical)"
                " — pure decoder is baseline + progressive Huffman; install PIL/OpenCV"
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
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = seg[0]
            if ns == 0:
                raise ValueError("corrupt SOS: zero scan components")
            scan = []  # (comp_idx, dc_table, ac_table)
            for c in range(ns):
                cs, tdta = seg[1 + 2 * c], seg[2 + 2 * c]
                matches = [i for i, comp in enumerate(frame[2]) if comp[0] == cs]
                if not matches:
                    raise ValueError(f"SOS references undefined component id {cs}")
                idx = matches[0]
                scan.append((idx, tdta >> 4, tdta & 0x0F))
            if progressive:
                ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
                ahal = seg[3 + 2 * ns]
                if coefs is None:
                    coefs = _alloc_coefs(frame)
                segs, pos = _split_entropy(data, pos + seglen)
                _decode_progressive_scan(
                    frame, scan, coefs, ss, se, ahal >> 4, ahal & 0x0F,
                    huff, restart_interval, segs,
                )
                continue  # more scans (or EOI) follow
            if ns != len(frame[2]):
                # Spec-legal non-interleaved baseline (one scan per
                # component, T.81 §B.2.3) — the sequential decoder below
                # assumes ONE interleaved scan covering every frame
                # component, so route these to a library instead of
                # misparsing the entropy stream against the frame-wide
                # MCU grid.
                raise NotImplementedError(
                    f"non-interleaved JPEG scan ({ns} of {len(frame[2])} "
                    "components) — pure decoder is single-scan interleaved;"
                    " install PIL/OpenCV"
                )
            segs, pos = _split_entropy(data, pos + seglen)
            return _decode_scan(frame, scan, qt, huff, restart_interval, segs)
        pos += seglen
    if progressive and coefs is not None:
        return _finish(frame, qt, _zz_planes_to_natural(frame, coefs))
    raise ValueError("no SOS scan found")


# ------------------------------------------------- progressive (T.81 G)


def _frame_grids(frame):
    H, W, comps = frame
    hmax = max(h for _, h, _, _ in comps)
    vmax = max(v for _, _, v, _ in comps)
    return hmax, vmax, -(-W // (8 * hmax)), -(-H // (8 * vmax))


def _alloc_coefs(frame) -> list[np.ndarray]:
    """Per-component zigzag coefficient state, padded to the MCU grid
    (interleaved DC scans cover padding blocks; non-interleaved AC
    scans cover only the component grid — the rest stays zero, exactly
    the baseline padding semantics)."""
    _, _, comps = frame
    hmax, vmax, mcus_x, mcus_y = _frame_grids(frame)
    return [
        np.zeros((mcus_y * v, mcus_x * h, 64), dtype=np.int32)
        for _, h, v, _ in comps
    ]


def _comp_block_grid(frame, ci) -> tuple[int, int]:
    """Non-interleaved data-unit grid (T.81 A.2.2): ceil over the
    COMPONENT's sample dimensions, not the MCU-padded frame grid."""
    H, W, comps = frame
    hmax, vmax, _, _ = _frame_grids(frame)
    _, h, v, _ = comps[ci]
    ys, xs = -(-H * v // vmax), -(-W * h // hmax)
    return -(-ys // 8), -(-xs // 8)


def _decode_progressive_scan(
    frame, scan, coefs, ss, se, ah, al, huff, restart_interval, segs
) -> None:
    """One progressive scan (T.81 G.2): DC first/refine (possibly
    interleaved), AC first/refine (single component by spec), spectral
    selection bands, successive approximation, EOB runs, restart
    intervals. Mutates ``coefs`` in place; reconstruction happens once
    at EOI."""
    _, _, comps = frame
    if not (ss <= se <= 63) or al > 13 or (ah and ah != al + 1):
        raise ValueError(f"invalid progressive scan header Ss={ss} Se={se} Ah={ah} Al={al}")
    if ss == 0:
        if se != 0:
            raise ValueError("progressive DC scan must have Se=0 (T.81 G.1.1.1.1)")
        _progressive_dc_scan(frame, scan, coefs, ah, al, huff, restart_interval, segs)
        return
    if len(scan) != 1:
        raise ValueError("progressive AC scan must carry exactly one component")
    _progressive_ac_scan(frame, scan[0], coefs, ss, se, ah, al, huff, restart_interval, segs)


def _progressive_dc_scan(frame, scan, coefs, ah, al, huff, restart_interval, segs):
    _, _, comps = frame
    hmax, vmax, mcus_x, mcus_y = _frame_grids(frame)
    br, seg_idx = _BitReader(segs[0]), 0
    pred = [0] * len(comps)
    if len(scan) == 1:
        ci, dc_t, _ = scan[0]
        bh, bw = _comp_block_grid(frame, ci)
        units = [(ci, dc_t, by, bx) for by in range(bh) for bx in range(bw)]
    else:
        units = []
        for mcu in range(mcus_x * mcus_y):
            my, mx = divmod(mcu, mcus_x)
            for ci, dc_t, _ in scan:
                _, h, v, _ = comps[ci]
                for b in range(h * v):
                    by, bx = divmod(b, h)
                    units.append((ci, dc_t, my * v + by, mx * h + bx))
        restart_interval = restart_interval * (len(units) // max(mcus_x * mcus_y, 1))
        # restart counts MCUs; with a uniform unit stream the boundary
        # falls every (units-per-MCU * Ri) units, which the scaling above
        # encodes so ONE unit loop serves both orderings
    done = 0
    per = restart_interval
    for ci, dc_t, by, bx in units:
        if per and done and done % per == 0:
            seg_idx += 1
            br = _BitReader(segs[seg_idx])
            pred = [0] * len(comps)
        done += 1
        if ah == 0:
            t = br.decode_huff(huff[(0, dc_t)])
            diff = _extend(br.read_bits(t), t) if t else 0
            pred[ci] += diff
            coefs[ci][by, bx, 0] = pred[ci] << al
        elif br.read_bit():
            coefs[ci][by, bx, 0] |= 1 << al


def _progressive_ac_scan(frame, comp_scan, coefs, ss, se, ah, al, huff, restart_interval, segs):
    ci, _, ac_t = comp_scan
    lut = huff[(1, ac_t)]
    bh, bw = _comp_block_grid(frame, ci)
    br, seg_idx = _BitReader(segs[0]), 0
    eobrun = 0
    done = 0
    for by in range(bh):
        for bx in range(bw):
            if restart_interval and done and done % restart_interval == 0:
                seg_idx += 1
                br = _BitReader(segs[seg_idx])
                eobrun = 0
            done += 1
            zz = coefs[ci][by, bx]
            if ah == 0:
                if eobrun:
                    eobrun -= 1
                    continue
                k = ss
                while k <= se:
                    rs = br.decode_huff(lut)
                    r, s = rs >> 4, rs & 0x0F
                    if s == 0:
                        if r == 15:  # ZRL
                            k += 16
                            continue
                        eobrun = (1 << r) - 1 + (br.read_bits(r) if r else 0)
                        break
                    k += r
                    if k > se:
                        raise ValueError("AC run past spectral band end")
                    zz[k] = _extend(br.read_bits(s), s) << al
                    k += 1
            else:
                eobrun = _refine_ac_block(br, lut, zz, ss, se, al, eobrun)


def _refine_ac_block(br, lut, zz, ss, se, al, eobrun) -> int:
    """AC successive-approximation refinement for one block (T.81
    G.1.2.3; the control flow mirrors the public libjpeg jdphuff.c):
    newly-significant coefficients arrive as s=1 symbols whose run
    counts ZERO-HISTORY positions; every nonzero-history coefficient
    crossed (and, once EOB fires, every one left in the band) consumes
    a correction bit — appended 1-bits add 1<<Al toward the sign."""
    p1, m1 = 1 << al, -(1 << al)
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = br.decode_huff(lut)
            r, s = rs >> 4, rs & 0x0F
            val = 0
            if s == 0:
                if r != 15:
                    eobrun = (1 << r) + (br.read_bits(r) if r else 0)
                    break
                # ZRL: pass 16 zero-history positions, refining along the way
            elif s == 1:
                val = p1 if br.read_bit() else m1
            else:
                raise ValueError("AC refinement magnitude must be 1")
            while k <= se:
                c = int(zz[k])
                if c != 0:
                    bit = br.read_bit()
                    if bit and (c & p1) == 0:
                        zz[k] = c + (p1 if c >= 0 else m1)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if val and k <= se:
                zz[k] = val
            k += 1
    if eobrun > 0:
        while k <= se:
            c = int(zz[k])
            if c != 0:
                bit = br.read_bit()
                if bit and (c & p1) == 0:
                    zz[k] = c + (p1 if c >= 0 else m1)
            k += 1
        eobrun -= 1
    return eobrun


def _zz_planes_to_natural(frame, coefs) -> list[np.ndarray]:
    planes = []
    for zz in coefs:
        by, bx, _ = zz.shape
        nat = np.zeros((by, bx, 8, 8), dtype=np.int32)
        for k, (y, x) in enumerate(_ZZ):
            nat[:, :, y, x] = zz[:, :, k]
        planes.append(nat.transpose(0, 2, 1, 3).reshape(by * 8, bx * 8))
    return planes


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
    return _finish(frame, qt, planes)


def _finish(frame, qt, planes) -> np.ndarray:
    """Shared reconstruction tail (baseline + progressive): dequantize,
    vectorized IDCT, chroma upsample, color transform."""
    height, width, comps = frame
    hmax = max(h for _, h, _, _ in comps)
    vmax = max(v for _, _, v, _ in comps)
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


def _prepare_planes(arr, quant, subsample):
    """Shared encoder front half (baseline + progressive): validate,
    color-transform, subsample, pad. Returns (arr, planes, samp, q, h, w)."""
    arr = np.asarray(arr, dtype=np.uint8)
    if subsample not in ("444", "420"):
        raise ValueError(f"subsample must be '444' or '420', got {subsample!r}")
    q = np.full((8, 8), int(quant), dtype=np.int32) if np.isscalar(quant) else np.asarray(quant, dtype=np.int32).reshape(8, 8)
    if not (1 <= q.min() and q.max() <= 255):
        raise ValueError("quantization values must be in [1, 255] (8-bit DQT)")
    h, w = arr.shape[:2]
    if arr.ndim == 2:
        return arr, [arr.astype(np.float64)], [(1, 1)], q, h, w
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
    return arr, [np.clip(p, 0, 255) for p in (y, cb, cr)], samp, q, h, w


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
    arr, planes, samp, q, h, w = _prepare_planes(arr, quant, subsample)
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


# ------------------------------------------------- progressive encoder


def _render_ops(ops: list) -> tuple[bytes, tuple[list[int], bytes]]:
    """Render a scan's op stream (("sym", s) Huffman symbols intermixed
    with ("raw", value, nbits) appended bits) against an equal-length
    canonical table built from the scan's own symbol set. Returns
    (entropy_bytes, (counts, symbols)) — one DHT per scan, the
    spec-legal redefine-between-scans form."""
    syms = [s for op in ops if op[0] == "sym" for s in (op[1],)]
    counts, symbols = _equal_length_table(syms or [0x00])
    codes = _encode_codes(counts, symbols)
    bw = _BitWriter()
    for op in ops:
        if op[0] == "sym":
            c, length = codes[op[1]]
            bw.write(c, length)
        else:
            bw.write(op[1], op[2])
    return bw.flush(), (counts, symbols)


def _flush_eob(ops: list, eobrun: int, pending: list[int]) -> int:
    """Emit an EOBn symbol for the accumulated run, then the buffered
    correction bits (refinement scans; empty list for first scans)."""
    if eobrun:
        r = eobrun.bit_length() - 1
        ops.append(("sym", r << 4))
        if r:
            ops.append(("raw", eobrun - (1 << r), r))
        for b in pending:
            ops.append(("raw", b, 1))
        pending.clear()
    return 0


def _tz(v: int, a: int) -> int:
    """AC point transform: magnitude shift (truncation toward zero)."""
    return abs(int(v)) >> a


def _ac_first_ops(zz_blocks, band, al) -> list:
    """AC first scan (Ah=0): significant = |v|>>Al != 0, runs over the
    rest, eager ZRL every 16, EOB runs accumulated across blocks."""
    lo, hi = band
    ops: list = []
    eobrun = 0
    for zz in zz_blocks:
        tvals = [_tz(zz[k], al) for k in range(lo, hi + 1)]
        if not any(tvals):
            eobrun += 1
            if eobrun == 0x7FFF:
                eobrun = _flush_eob(ops, eobrun, [])
            continue
        eobrun = _flush_eob(ops, eobrun, [])
        last = max(i for i, t in enumerate(tvals) if t)
        r = 0
        for i in range(last + 1):
            t = tvals[i]
            if t == 0:
                r += 1
                if r == 16:
                    ops.append(("sym", 0xF0))  # ZRL
                    r = 0
                continue
            s = t.bit_length()
            v = t if zz[lo + i] > 0 else -t
            ops.append(("sym", (r << 4) | s))
            ops.append(("raw", _mag_bits(v, s), s))
            r = 0
        if last < hi - lo:
            eobrun += 1
    _flush_eob(ops, eobrun, [])
    return ops


def _ac_refine_ops(zz_blocks, band, al) -> list:
    """AC refinement scan (Ah=Al+1): newly-significant coefficients as
    s=1 symbols whose run counts ZERO-HISTORY positions; correction
    bits for nonzero-history coefficients buffered and appended after
    the next symbol (or the EOB run) in position-then-block order —
    the jcphuff.c bit-buffering discipline, mirrored by
    :func:`_refine_ac_block` on the decode side."""
    lo, hi = band
    ops: list = []
    eobrun = 0
    pending: list[int] = []
    for zz in zz_blocks:
        tvals = [_tz(zz[k], al) for k in range(lo, hi + 1)]
        newly = [i for i, t in enumerate(tvals) if t == 1]
        if not newly:
            eobrun += 1
            pending.extend(t & 1 for t in tvals if t > 1)
            if eobrun == 0x7FFF:
                eobrun = _flush_eob(ops, eobrun, pending)
            continue
        eobrun = _flush_eob(ops, eobrun, pending)
        last = newly[-1]
        r = 0
        for i in range(last + 1):
            t = tvals[i]
            if t == 0:
                r += 1
                if r == 16:
                    ops.append(("sym", 0xF0))
                    for b in pending:
                        ops.append(("raw", b, 1))
                    pending.clear()
                    r = 0
                continue
            if t > 1:
                pending.append(t & 1)
                continue
            ops.append(("sym", (r << 4) | 1))
            ops.append(("raw", 1 if zz[lo + i] > 0 else 0, 1))
            for b in pending:
                ops.append(("raw", b, 1))
            pending.clear()
            r = 0
        tail = [t & 1 for t in tvals[last + 1 :] if t > 1]
        if last < hi - lo:
            eobrun += 1
            pending.extend(tail)
    _flush_eob(ops, eobrun, pending)
    return ops


def encode_jpeg_progressive(
    arr: np.ndarray,
    quant: int | np.ndarray = 16,
    subsample: str = "444",
    al: int = 1,
    bands: tuple = ((1, 5), (6, 63)),
) -> bytes:
    """Encode as PROGRESSIVE JPEG (SOF2) with spectral selection AND
    successive approximation — the scan script is DC first (interleaved,
    Al=al) → AC first per band per component (Al=al) → DC refinement
    bit scans (Al=al-1..0) → AC refinement per band per component.
    Decodes to the SAME pixels as the baseline encoder at equal quant
    (pytest-pinned roundtrip) — progression changes the ORDER bits
    arrive, never the final coefficients. ``al=0`` gives the
    spectral-selection-only form (no refinement scans)."""
    if al < 0 or al > 13:
        raise ValueError(f"al must be in [0, 13], got {al}")
    got = [k for lo, hi in bands for k in range(lo, hi + 1)]
    if got != list(range(1, 64)):
        raise ValueError("bands must partition 1..63 in ascending order")
    arr, planes, samp, q, h, w = _prepare_planes(arr, quant, subsample)
    qblocks = [_plane_blocks(p, q) for p in planes]
    zz_idx = np.array(_ZZ)
    zzs = [qb[:, zz_idx[:, 0], zz_idx[:, 1]] for qb in qblocks]  # (nblk, 64)
    # block grids of the PADDED planes (_plane_blocks pads to 8-multiples
    # internally — shape//8 under-counted whenever a dim wasn't a multiple)
    grids = [(-(-p.shape[0] // 8), -(-p.shape[1] // 8)) for p in planes]
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcus_x, mcus_y = -(-w // (8 * hmax)), -(-h // (8 * vmax))
    frame = (h, w, [(ci + 1, sh, sv, 0 if ci == 0 else (1 if len(planes) > 1 else 0)) for ci, (sh, sv) in enumerate(samp)])

    # interleaved MCU unit order for the DC scans (baseline's ordering)
    dc_units: list[tuple[int, int]] = []  # (comp, block_index_in_plane)
    for mcu in range(mcus_x * mcus_y):
        my, mx = divmod(mcu, mcus_x)
        for ci, (sh, sv) in enumerate(samp):
            cols = grids[ci][1]
            for b in range(sh * sv):
                by, bx = divmod(b, sh)
                dc_units.append((ci, (my * sv + by) * cols + (mx * sh + bx)))
    if len(planes) == 1:
        # single-component scans are non-interleaved by spec: the unit
        # grid is the component grid, which may be smaller than padding
        bh, bw_ = _comp_block_grid(frame, 0)
        cols = grids[0][1]
        dc_units = [(0, by * cols + bx) for by in range(bh) for bx in range(bw_)]

    def ac_blocks(ci):
        bh, bw_ = _comp_block_grid(frame, ci)
        cols = grids[ci][1]
        return [zzs[ci][by * cols + bx] for by in range(bh) for bx in range(bw_)]

    scans: list[tuple[bytes, tuple, list[int], int, int, int, int]] = []
    # 1. DC first (all components, Al=al)
    ops: list = []
    pred = [0] * len(planes)
    for ci, bi in dc_units:
        d = int(zzs[ci][bi, 0]) >> al  # DC point transform: arithmetic shift
        diff = d - pred[ci]
        pred[ci] = d
        t = _size_cat(diff)
        ops.append(("sym", t))
        if t:
            ops.append(("raw", _mag_bits(diff, t), t))
    entropy, table = _render_ops(ops)
    scans.append((entropy, (0, table), list(range(len(planes))), 0, 0, 0, al))
    # 2. AC first per band per component (Al=al)
    for ci in range(len(planes)):
        blocks = ac_blocks(ci)
        for lo, hi in bands:
            entropy, table = _render_ops(_ac_first_ops(blocks, (lo, hi), al))
            scans.append((entropy, (1, table), [ci], lo, hi, 0, al))
    # 3. DC refinement bit scans (raw bits, no table)
    for a in range(al - 1, -1, -1):
        ops = [("raw", (int(zzs[ci][bi, 0]) >> a) & 1, 1) for ci, bi in dc_units]
        entropy, _ = _render_ops([op for op in ops])  # table unused: all raw
        scans.append((entropy, None, list(range(len(planes))), 0, 0, a + 1, a))
    # 4. AC refinement per band per component
    for a in range(al - 1, -1, -1):
        for ci in range(len(planes)):
            blocks = ac_blocks(ci)
            for lo, hi in bands:
                entropy, table = _render_ops(_ac_refine_ops(blocks, (lo, hi), a))
                scans.append((entropy, (1, table), [ci], lo, hi, a + 1, a))

    # headers
    out = bytearray(b"\xff\xd8")
    zz_q = bytes(int(q[y, x]) for y, x in _ZZ)
    out += b"\xff\xdb" + struct.pack(">H", 2 + 65) + b"\x00" + zz_q
    if len(planes) > 1:
        out += b"\xff\xdb" + struct.pack(">H", 2 + 65) + b"\x01" + zz_q
    sof = bytearray(struct.pack(">BHHB", 8, h, w, len(planes)))
    for ci, (sh, sv) in enumerate(samp):
        sof += bytes([ci + 1, (sh << 4) | sv, 0 if ci == 0 else (1 if len(planes) > 1 else 0)])
    out += b"\xff\xc2" + struct.pack(">H", 2 + len(sof)) + sof
    for entropy, table, comp_ids, ss, se, ah, a in scans:
        if table is not None:
            tc, (counts, symbols) = table
            body = bytes([(tc << 4) | 0]) + bytes(counts) + symbols
            out += b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body
        sos = bytearray([len(comp_ids)])
        for ci in comp_ids:
            sos += bytes([ci + 1, 0x00])  # Td=0, Ta=0 (redefined per scan)
        sos += bytes([ss, se, (ah << 4) | a])
        out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
        out += entropy
    out += b"\xff\xd9"
    return bytes(out)
