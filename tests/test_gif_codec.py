"""GIF87a codec unit tests (basis_spark/operators/gif.py) — the same
contract test_jpeg_codec.py pins for JPEG: lossless round-trips across
shapes that hit every LZW edge (code-width growth, the KwKwK case,
4096-entry table reset, sub-block framing) plus red-path scope guards
for the features the decoder honestly refuses."""

from __future__ import annotations

import random

import pytest

from basis_spark.operators.gif import (
    decode_gif,
    lzw_decode,
    lzw_encode,
    make_gif,
)


@pytest.mark.parametrize(
    "w,h",
    [(1, 1), (8, 8), (7, 5), (33, 9), (64, 64), (255, 3)],
)
def test_roundtrip_shapes(w, h):
    rng = random.Random(w * 1000 + h)
    px = bytes(rng.randrange(256) for _ in range(w * h))
    assert decode_gif(make_gif(w, h, px)) == (w, h, px)


def test_roundtrip_forces_table_reset():
    # long runs + repeated ramps push the LZW table past 4096 entries,
    # forcing the CLEAR/reset path in both encoder and decoder
    px = bytes([5] * 5000 + list(range(256)) * 20 + [9] * 3000)
    assert decode_gif(make_gif(len(px), 1, px))[2] == px


def test_kwkwk_special_case():
    # "ababab..." makes the decoder reference the code it is ABOUT to
    # define (the classic KwKwK case) within the first few codes
    px = bytes([97, 98] * 300)
    assert decode_gif(make_gif(len(px), 1, px))[2] == px


def test_lzw_stream_roundtrip_direct():
    data = bytes(range(256)) * 3
    assert lzw_decode(lzw_encode(data), len(data)) == data


def test_rejects_non_gif():
    with pytest.raises(ValueError, match="not a GIF"):
        decode_gif(b"PNG....")


def test_rejects_interlaced():
    g = bytearray(make_gif(4, 4, bytes(16)))
    # image descriptor starts right after 13-byte header + 768 palette
    g[13 + 768 + 9] |= 0x40  # set interlace flag
    with pytest.raises(ValueError, match="interlaced"):
        decode_gif(bytes(g))


def test_rejects_extension_blocks():
    g = bytearray(make_gif(4, 4, bytes(16)))
    # splice a GIF89a graphic-control extension before the descriptor
    ext = bytes([0x21, 0xF9, 0x04, 0, 0, 0, 0, 0])
    g2 = g[: 13 + 768] + ext + g[13 + 768 :]
    with pytest.raises(ValueError, match="extension"):
        decode_gif(bytes(g2))


def test_truncated_stream_raises():
    g = make_gif(16, 16, bytes(range(256)))
    with pytest.raises(ValueError):
        decode_gif(g[: len(g) // 2] + b"\x00\x3b")
