"""Baseline JPEG codec (operators/jpeg.py): entropy coding must be
bit-lossless (all loss is quantization), the flat-block construction
must decode to the exact closed form the DuckDB oracle recomputes, and
out-of-scope format features must raise, never mis-decode."""

from __future__ import annotations

import numpy as np
import pytest

from basis_spark.operators.jpeg import (
    QUANT_CHROMA,
    QUANT_LUMA,
    _q_round,
    _rgb_to_ycc,
    _T,
    _ycc_to_rgb,
    decode_jpeg,
    make_jpeg,
)
from basis_spark.operators.multimodal import synth_gray_blocks


def _quant_only(img: np.ndarray) -> np.ndarray:
    """The codec minus entropy coding: DCT -> quantize -> dequantize ->
    IDCT, per 8x8 block per channel. Full encode->decode must equal
    this EXACTLY — any difference is an entropy-coding bug."""
    h, w, _ = img.shape
    ycc = _rgb_to_ycc(img)
    planes = np.zeros((3, h, w))
    for c in range(3):
        q = QUANT_LUMA if c == 0 else QUANT_CHROMA
        for by in range(h // 8):
            for bx in range(w // 8):
                blk = ycc[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8, c]
                coef = _T @ (blk - 128.0) @ _T.T
                qq = _q_round(coef / q)
                planes[c, by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
                    _T.T @ (qq * q) @ _T + 128.0
                )
    return _ycc_to_rgb(np.stack([planes[0], planes[1], planes[2]], axis=-1))


def _roundtrip(img: np.ndarray) -> np.ndarray:
    h, w, _ = img.shape
    wd, hd, out = decode_jpeg(make_jpeg(w, h, img.tobytes()))
    assert (wd, hd) == (w, h)
    return np.frombuffer(out, dtype=np.uint8).reshape(h, w, 3)


def test_entropy_coding_is_bit_lossless_on_noise():
    # Uniform noise maximizes nonzero AC coefficients, runs, ZRL and
    # byte-stuffing traffic — the hardest entropy-coding workload.
    rng = np.random.RandomState(42)
    img = rng.randint(0, 256, (24, 32, 3), dtype=np.uint8)
    assert (_roundtrip(img) == _quant_only(img)).all()


def test_smooth_gradient_roundtrips_above_35db():
    yy, xx = np.mgrid[0:24, 0:32]
    img = np.stack(
        [(xx * 8) % 256, (yy * 10) % 256, ((xx + yy) * 4) % 256], axis=-1
    ).astype(np.uint8)
    dec = _roundtrip(img)
    mse = np.mean((img.astype(float) - dec.astype(float)) ** 2)
    assert 10 * np.log10(255**2 / mse) > 35.0


def test_flat_blocks_decode_to_oracle_closed_form():
    for doc_id in (0, 1, 2, 7, 100, 254, 255, 1234, 99999):
        px, vals = synth_gray_blocks(doc_id)
        dec = np.frombuffer(
            decode_jpeg(make_jpeg(16, 16, px))[2], dtype=np.uint8
        ).reshape(16, 16, 3)
        for b, v in enumerate(vals):
            y0, x0 = (b // 2) * 8, (b % 2) * 8
            blk = dec[y0 : y0 + 8, x0 : x0 + 8]
            expect = min(255, 2 * ((v - 127) // 2) + 128)
            assert (blk == expect).all(), (doc_id, b, v, np.unique(blk))


def test_dc_differential_chains_across_mcus():
    # Strongly varying flat blocks force large DC diffs of both signs;
    # a broken EXTEND or category would corrupt every later block.
    vals = [0, 255, 1, 254, 128, 3, 250, 7]
    px = bytearray()
    for y in range(8):
        for x in range(64):
            v = vals[x // 8]
            px += bytes((v, v, v))
    dec = np.frombuffer(
        decode_jpeg(make_jpeg(64, 8, bytes(px)))[2], dtype=np.uint8
    ).reshape(8, 64, 3)
    for b, v in enumerate(vals):
        expect = min(255, 2 * ((v - 127) // 2) + 128)
        assert (dec[:, b * 8 : b * 8 + 8] == expect).all(), (b, v)


def test_rejects_out_of_scope_jpegs():
    img = np.zeros((8, 8, 3), dtype=np.uint8)
    good = make_jpeg(8, 8, img.tobytes())
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"\x00" + good)
    # progressive: rewrite SOF0 (FFC0) to SOF2 (FFC2)
    prog = good.replace(b"\xff\xc0", b"\xff\xc2", 1)
    with pytest.raises(ValueError, match="baseline"):
        decode_jpeg(prog)
    # truncated entropy segment
    with pytest.raises(ValueError):
        decode_jpeg(good[: len(good) - 8])


def test_dispatcher_routes_jpeg_magic():
    from basis_spark.operators.multimodal import decode_image

    img = np.full((8, 8, 3), 200, dtype=np.uint8)
    w, h, rgb = decode_image(make_jpeg(8, 8, img.tobytes()))
    assert (w, h) == (8, 8)
    assert len(rgb) == 8 * 8 * 3


def test_rejects_progressive_sof2_hand_built_header():
    """Hand-built minimal stream: SOI then an SOF2 frame header. The
    parser must refuse at the MARKER, before trusting any of the
    progressive frame's fields (r5-verdict scope-guard mandate)."""
    import struct

    body = struct.pack(">BHHB", 8, 8, 8, 3) + bytes(
        [1, 0x11, 0, 2, 0x11, 1, 3, 0x11, 1]
    )
    prog = b"\xff\xd8" + b"\xff\xc2" + struct.pack(">H", 2 + len(body)) + body
    with pytest.raises(ValueError, match="baseline"):
        decode_jpeg(prog)


def test_rejects_restart_interval_dri():
    """A DRI segment (FFDD) spliced before SOS must raise: the scan
    decoder has no RSTn resync, so tolerating the marker would
    mis-decode every MCU after the first restart."""
    import struct

    img = np.zeros((8, 8, 3), dtype=np.uint8)
    good = make_jpeg(8, 8, img.tobytes())
    sos = good.index(b"\xff\xda")
    dri = b"\xff\xdd" + struct.pack(">H", 4) + struct.pack(">H", 2)
    with pytest.raises(ValueError, match="restart"):
        decode_jpeg(good[:sos] + dri + good[sos:])


def test_rejects_chroma_subsampling_420():
    """SOF0 with the Y component's sampling factors rewritten from 1x1
    (0x11) to 2x2 (0x22) — i.e. a 4:2:0 frame — must raise: the MCU
    walker assumes one 8x8 block per component per MCU."""
    img = np.zeros((8, 8, 3), dtype=np.uint8)
    good = bytearray(make_jpeg(8, 8, img.tobytes()))
    sof = bytes(good).index(b"\xff\xc0")
    hv_off = sof + 4 + 7  # body: prec(1) h(2) w(2) nc(1) cid(1) -> hv
    assert good[hv_off] == 0x11
    good[hv_off] = 0x22
    with pytest.raises(ValueError, match="4:4:4"):
        decode_jpeg(bytes(good))


def test_resize_any_dispatch_and_fallback():
    """resize_any routes PPM magic to the real pixel path and keeps the
    deterministic stride fallback for unknown magic (the multimodal_
    resize contract after the r6 re-point)."""
    from basis_spark.operators.multimodal import (
        decode_ppm,
        fake_resize,
        resize_any,
        synth_ppm,
    )

    ppm = synth_ppm(7)
    w, h, px = decode_ppm(resize_any(ppm, 2, 2))
    assert (w, h) == (2, 2)
    # thumb pixel (x,y) == source pixel (4x,4y): indices {0,4,32,36}
    expect = bytes((7 * 31 + i + c * 85) % 256 for i in (0, 4, 32, 36) for c in range(3))
    assert px == expect

    blob = b"\x89PNGnot-really" * 10
    assert resize_any(blob, 2, 2) == fake_resize(blob, 2, 2)
    assert len(resize_any(blob, 2, 2)) == 4
