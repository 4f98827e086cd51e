"""Dependency-free baseline JPEG codec (pure numpy + stdlib).

The container has no PIL/opencv, so like the PPM and PNG codecs in
operators/multimodal.py this module implements the format itself: a
REAL ITU T.81 baseline sequential encoder/decoder — standard Annex K
quantization + Huffman tables, interleaved 4:4:4 MCUs, byte stuffing,
differential DC, RLE/EOB AC coding, orthonormal 2-D DCT/IDCT. It is
the third raster codec in the repo and the first LOSSY one, which is
exactly why it earns its own oracle construction: for flat 8x8 blocks
every AC coefficient is zero, so the decode result is an integer
formula (quantized DC round-trip) that DuckDB can recompute EXACTLY —
see multimodal_jpeg_decode in operators/multimodal.py.

Scope (honestly bounded): baseline DCT, 8-bit, 1 or 3 components,
no chroma subsampling (4:4:4), no restart intervals, no progressive.
Anything else raises ValueError — the error contract decode_image's
dispatcher expects.

Float-boundary discipline: quantization and final pixel rounding both
use floor(x + 0.5 + _EPS). The epsilon (1e-6, far above the ~1e-11
DCT matrix-product noise, far below any quantization step) pins the
half-way cases so the pure-SQL oracle twin can use the identical
closed form floor(x + 0.5 + eps) with exact arithmetic.
"""

from __future__ import annotations

import struct

import numpy as np

_EPS = 1e-6

# Standard Annex K.1/K.2 quantization tables (quality 50), row-major.
QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int32).reshape(8, 8)

QUANT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int32).reshape(8, 8)

# Zigzag scan: ZIGZAG[k] = row-major index of the k-th coefficient.
ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

# Standard Annex K.3 Huffman specs: (BITS[1..16], HUFFVAL).
DC_LUMA_SPEC = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
DC_CHROMA_SPEC = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
AC_LUMA_SPEC = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
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
        0xF9, 0xFA,
    ],
)
AC_CHROMA_SPEC = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
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
        0xF9, 0xFA,
    ],
)


def _canonical_codes(spec: tuple[list[int], list[int]]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) by the T.81 canonical assignment."""
    bits, vals = spec
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _decode_map(spec: tuple[list[int], list[int]]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol, for the bit-at-a-time decoder."""
    return {(ln, cd): sym for sym, (cd, ln) in _canonical_codes(spec).items()}


# Orthonormal DCT-II basis: F = T @ X @ T.T, X = T.T @ F @ T.
_T = np.zeros((8, 8))
for _i in range(8):
    for _j in range(8):
        _T[_i, _j] = (np.sqrt(0.125) if _i == 0 else 0.5) * np.cos(
            (2 * _j + 1) * _i * np.pi / 16
        )


def _q_round(x: np.ndarray | float) -> np.ndarray:
    """floor(x + 0.5 + eps): the codec's single rounding rule, chosen
    so the SQL oracle can replay it with exact integer arithmetic."""
    return np.floor(x + 0.5 + _EPS)


def _category(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._n = 0

    def write(self, code: int, length: int) -> None:
        self._acc = (self._acc << length) | (code & ((1 << length) - 1))
        self._n += length
        while self._n >= 8:
            self._n -= 8
            byte = (self._acc >> self._n) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.out.append(0x00)

    def flush(self) -> None:
        if self._n:
            pad = 8 - self._n
            self.write((1 << pad) - 1, pad)  # 1-fill per spec


class _BitReader:
    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self._acc = 0
        self._n = 0

    def read_bit(self) -> int:
        if self._n == 0:
            if self.pos >= len(self.data):
                raise ValueError("truncated entropy-coded segment")
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                if self.pos >= len(self.data):
                    raise ValueError("truncated after 0xFF")
                nxt = self.data[self.pos]
                if nxt == 0x00:
                    self.pos += 1  # stuffed byte
                else:
                    raise ValueError(f"unexpected marker 0xFF{nxt:02X} in scan")
            self._acc = b
            self._n = 8
        self._n -= 1
        return (self._acc >> self._n) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def read_symbol(self, table: dict[tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code in scan")


def _extend(v: int, size: int) -> int:
    """T.81 EXTEND: map the `size`-bit magnitude to the signed value."""
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def _rgb_to_ycc(px: np.ndarray) -> np.ndarray:
    r = px[..., 0].astype(np.float64)
    g = px[..., 1].astype(np.float64)
    b = px[..., 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.clip(_q_round(np.stack([y, cb, cr], axis=-1)), 0, 255)


def _ycc_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y = ycc[..., 0]
    cb = ycc[..., 1] - 128.0
    cr = ycc[..., 2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(_q_round(np.stack([r, g, b], axis=-1)), 0, 255).astype(np.uint8)


def make_jpeg(width: int, height: int, pixels: bytes) -> bytes:
    """Encode raw RGB bytes (len == w*h*3; w and h multiples of 8) as a
    baseline sequential JPEG: 4:4:4, standard Annex K quantization and
    Huffman tables, interleaved Y/Cb/Cr MCUs, differential DC."""
    if width % 8 or height % 8:
        raise ValueError("encoder supports multiple-of-8 dimensions only")
    if len(pixels) != width * height * 3:
        raise ValueError(f"expected {width * height * 3} bytes, got {len(pixels)}")
    px = np.frombuffer(pixels, dtype=np.uint8).reshape(height, width, 3)
    ycc = _rgb_to_ycc(px)

    enc_dc = [_canonical_codes(DC_LUMA_SPEC), _canonical_codes(DC_CHROMA_SPEC)]
    enc_ac = [_canonical_codes(AC_LUMA_SPEC), _canonical_codes(AC_CHROMA_SPEC)]
    quants = [QUANT_LUMA, QUANT_CHROMA]

    w = _BitWriter()
    prev_dc = [0, 0, 0]
    for by in range(height // 8):
        for bx in range(width // 8):
            for comp in range(3):  # one MCU = Y, Cb, Cr blocks (4:4:4)
                tsel = 0 if comp == 0 else 1
                block = ycc[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8, comp]
                coef = _T @ (block - 128.0) @ _T.T
                q = _q_round(coef / quants[tsel]).astype(np.int64)
                zz = q.reshape(64)[ZIGZAG]
                diff = int(zz[0]) - prev_dc[comp]
                prev_dc[comp] = int(zz[0])
                size = _category(diff)
                code, ln = enc_dc[tsel][size]
                w.write(code, ln)
                if size:
                    w.write(diff if diff >= 0 else diff + (1 << size) - 1, size)
                run = 0
                last_nz = max([k for k in range(1, 64) if zz[k]], default=0)
                for k in range(1, last_nz + 1):
                    v = int(zz[k])
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        code, ln = enc_ac[tsel][0xF0]  # ZRL
                        w.write(code, ln)
                        run -= 16
                    size = _category(v)
                    code, ln = enc_ac[tsel][(run << 4) | size]
                    w.write(code, ln)
                    w.write(v if v >= 0 else v + (1 << size) - 1, size)
                    run = 0
                if last_nz < 63:
                    code, ln = enc_ac[tsel][0x00]  # EOB
                    w.write(code, ln)
    w.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    def dqt(tid: int, table: np.ndarray) -> bytes:
        zz = table.reshape(64)[ZIGZAG]
        return seg(0xFFDB, bytes([tid]) + bytes(int(v) for v in zz))

    def dht(cls: int, tid: int, spec: tuple[list[int], list[int]]) -> bytes:
        bits, vals = spec
        return seg(0xFFC4, bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals))

    sof = seg(
        0xFFC0,
        struct.pack(">BHHB", 8, height, width, 3)
        + bytes([1, 0x11, 0, 2, 0x11, 1, 3, 0x11, 1]),
    )
    sos = seg(0xFFDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))
    return (
        b"\xff\xd8"
        + dqt(0, QUANT_LUMA)
        + dqt(1, QUANT_CHROMA)
        + sof
        + dht(0, 0, DC_LUMA_SPEC)
        + dht(1, 0, AC_LUMA_SPEC)
        + dht(0, 1, DC_CHROMA_SPEC)
        + dht(1, 1, AC_CHROMA_SPEC)
        + sos
        + bytes(w.out)
        + b"\xff\xd9"
    )


def decode_jpeg(payload: bytes) -> tuple[int, int, bytes]:
    """Decode a baseline sequential JPEG (8-bit, 1 or 3 components,
    4:4:4, no restart intervals): returns (width, height, RGB bytes).
    Real decode — marker parse, DQT/DHT table build, Huffman + RLE
    entropy decode with byte unstuffing, dequantize, inverse zigzag,
    IDCT, YCbCr->RGB. Out-of-scope JPEGs raise ValueError."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    quants: dict[int, np.ndarray] = {}
    dc_maps: dict[int, dict] = {}
    ac_maps: dict[int, dict] = {}
    frame = None  # (height, width, [(cid, tq)])
    scan = None  # ([(cid, td, ta)], entropy_start)
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        marker = struct.unpack(">H", payload[pos : pos + 2])[0]
        if marker == 0xFFD9:
            break
        (length,) = struct.unpack(">H", payload[pos + 2 : pos + 4])
        body = payload[pos + 4 : pos + 2 + length]
        if marker == 0xFFDB:
            off = 0
            while off < len(body):
                pq, tq = body[off] >> 4, body[off] & 0xF
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                zz = np.array(list(body[off + 1 : off + 65]), dtype=np.int32)
                t = np.zeros(64, dtype=np.int32)
                t[ZIGZAG] = zz
                quants[tq] = t.reshape(8, 8)
                off += 65
        elif marker == 0xFFC4:
            off = 0
            while off < len(body):
                cls, tid = body[off] >> 4, body[off] & 0xF
                bits = list(body[off + 1 : off + 17])
                n = sum(bits)
                vals = list(body[off + 17 : off + 17 + n])
                (dc_maps if cls == 0 else ac_maps)[tid] = _decode_map((bits, vals))
                off += 17 + n
        elif marker == 0xFFC0:
            prec, h, wd, nc = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise ValueError("only 8-bit precision supported")
            comps = []
            for c in range(nc):
                cid, hv, tq = body[6 + 3 * c : 9 + 3 * c]
                if hv != 0x11:
                    raise ValueError("only 4:4:4 (no subsampling) supported")
                comps.append((cid, tq))
            frame = (h, wd, comps)
        elif marker in (0xFFC1, 0xFFC2, 0xFFC3, 0xFFC5, 0xFFC6, 0xFFC7,
                        0xFFC9, 0xFFCA, 0xFFCB, 0xFFCD, 0xFFCE, 0xFFCF):
            raise ValueError("only baseline sequential (SOF0) supported")
        elif marker == 0xFFDD:
            raise ValueError("restart intervals unsupported")
        elif marker == 0xFFDA:
            ns = body[0]
            sel = [
                (body[1 + 2 * c], body[2 + 2 * c] >> 4, body[2 + 2 * c] & 0xF)
                for c in range(ns)
            ]
            scan = (sel, pos + 2 + length)
            break
        pos += 2 + length
    if frame is None or scan is None:
        raise ValueError("missing SOF0/SOS")
    height, width, comps = frame
    if height % 8 or width % 8:
        raise ValueError("decoder supports multiple-of-8 dimensions only")
    sel, entropy_start = scan
    if [cid for cid, _ in comps] != [cid for cid, _, _ in sel]:
        raise ValueError("scan component order must match frame")

    r = _BitReader(payload, entropy_start)
    nc = len(comps)
    planes = np.zeros((nc, height, width), dtype=np.float64)
    prev_dc = [0] * nc
    for by in range(height // 8):
        for bx in range(width // 8):
            for ci, ((_, tq), (_, td, ta)) in enumerate(zip(comps, sel)):
                zz = np.zeros(64, dtype=np.int64)
                size = r.read_symbol(dc_maps[td])
                prev_dc[ci] += _extend(r.read_bits(size), size)
                zz[0] = prev_dc[ci]
                k = 1
                while k < 64:
                    rs = r.read_symbol(ac_maps[ta])
                    run, size = rs >> 4, rs & 0xF
                    if rs == 0x00:  # EOB
                        break
                    if rs == 0xF0:  # ZRL
                        k += 16
                        continue
                    k += run
                    if k > 63:
                        raise ValueError("AC run past end of block")
                    zz[k] = _extend(r.read_bits(size), size)
                    k += 1
                coef = np.zeros(64, dtype=np.float64)
                coef[ZIGZAG] = zz * quants[tq].reshape(64)[ZIGZAG]
                block = _T.T @ coef.reshape(8, 8) @ _T + 128.0
                planes[ci, by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = block
    if nc == 3:
        rgb = _ycc_to_rgb(np.stack([planes[0], planes[1], planes[2]], axis=-1))
    elif nc == 1:
        g = np.clip(_q_round(planes[0]), 0, 255).astype(np.uint8)
        rgb = np.stack([g, g, g], axis=-1)
    else:
        raise ValueError(f"unsupported component count {nc}")
    return width, height, rgb.tobytes()
