"""PNG codec tests (operators/png.py): lossless-exact round trips on
the supported subset, all five row filters, palette/alpha handling, and
loud failure on corruption and unsupported modes. Spec authority:
RFC 2083 / ISO 15948 (public)."""

import struct
import zlib

import numpy as np
import pytest

from pulsar_io_delta_spark.operators.multimodal import _real_decode, _real_resize
from pulsar_io_delta_spark.operators.png import (
    _SIGNATURE,
    PngFormatError,
    decode_png,
    encode_png,
)


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def _hand_png(w, h, color, raw, extra=b""):
    return (
        _SIGNATURE
        + _chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0))
        + extra
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )


@pytest.mark.parametrize("shape", [(10, 13), (24, 7, 3), (1, 1, 3), (64, 64)])
def test_lossless_round_trip(shape):
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, shape, dtype=np.uint8)
    out = decode_png(encode_png(img))
    ref = img if img.ndim == 3 else np.repeat(img[:, :, None], 3, axis=2)
    assert np.array_equal(out, ref)


def test_all_five_filters_decode_exactly():
    """Hand-filter each scanline with a different filter type (None,
    Sub, Up, Average, Paeth); the decoder must invert every one."""
    rng = np.random.default_rng(9)
    w, h, ch = 6, 5, 3
    img = rng.integers(0, 256, (h, w, ch), dtype=np.int32)
    rows = []
    prev = np.zeros(w * ch, dtype=np.int32)
    for y in range(h):
        cur = img[y].reshape(-1)
        ft = y % 5
        f = np.zeros(w * ch, dtype=np.int32)
        for i in range(w * ch):
            a = cur[i - ch] if i >= ch else 0
            b = prev[i]
            c = prev[i - ch] if i >= ch else 0
            if ft == 0:
                pred = 0
            elif ft == 1:
                pred = a
            elif ft == 2:
                pred = b
            elif ft == 3:
                pred = (a + b) >> 1
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            f[i] = (cur[i] - pred) & 0xFF
        rows.append(bytes([ft]) + bytes(f.astype(np.uint8)))
        prev = cur
    blob = _hand_png(w, h, 2, b"".join(rows))
    assert np.array_equal(decode_png(blob), img.astype(np.uint8))


def test_palette_and_alpha_color_types():
    # color type 3: palette indices dereference through PLTE
    pal = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255]], dtype=np.uint8)
    idx = np.array([[0, 1], [2, 0]], dtype=np.uint8)
    raw = b"".join(b"\x00" + idx[y].tobytes() for y in range(2))
    blob = _hand_png(2, 2, 3, raw, extra=_chunk(b"PLTE", pal.tobytes()))
    assert np.array_equal(decode_png(blob), pal[idx])
    # color type 6: RGBA → alpha dropped
    rgba = np.dstack(
        [np.full((3, 3), v, np.uint8) for v in (10, 20, 30, 200)]
    )
    raw = b"".join(b"\x00" + rgba[y].tobytes() for y in range(3))
    out = decode_png(_hand_png(3, 3, 6, raw))
    assert np.array_equal(out, rgba[:, :, :3])
    # color type 4: gray+alpha → gray replicated
    ga = np.dstack([np.full((2, 2), 77, np.uint8), np.full((2, 2), 1, np.uint8)])
    raw = b"".join(b"\x00" + ga[y].tobytes() for y in range(2))
    out = decode_png(_hand_png(2, 2, 4, raw))
    assert np.all(out == 77)


def test_corruption_and_invalid_are_loud():
    blob = bytearray(encode_png(np.zeros((4, 4), np.uint8)))
    blob[20] ^= 0xFF
    with pytest.raises(PngFormatError, match="CRC"):
        decode_png(bytes(blob))
    with pytest.raises(PngFormatError, match="signature"):
        decode_png(b"\xff\xd8xxxx")
    # invalid depth/color combination (16-bit palette): loud
    ihdr = struct.pack(">IIBBBBB", 2, 2, 16, 3, 0, 0, 0)
    blob = _SIGNATURE + _chunk(b"IHDR", ihdr) + _chunk(b"IEND", b"")
    with pytest.raises(PngFormatError, match="invalid depth"):
        decode_png(blob)
    # unknown interlace method: loud
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 2)
    blob = _SIGNATURE + _chunk(b"IHDR", ihdr) + _chunk(b"IEND", b"")
    with pytest.raises(PngFormatError, match="interlace"):
        decode_png(blob)


# ---------------------------------------------------------------------------
# Round 9: bit depths 1/2/4/16 and Adam7 interlace (the last PNG gates)


def test_adam7_matches_sequential():
    """Adam7 is a pure re-layout: the interlaced decode must equal the
    sequential decode EXACTLY, including tiny dims with empty passes."""
    rng = np.random.default_rng(5)
    for hw in ((23, 17), (8, 8), (1, 1), (3, 2), (16, 5), (2, 9)):
        img = rng.integers(0, 256, (*hw, 3), dtype=np.uint8)
        assert np.array_equal(decode_png(encode_png(img, interlace=True)), img), hw
        gi = rng.integers(0, 256, hw, dtype=np.uint8)
        assert np.array_equal(
            decode_png(encode_png(gi, interlace=True)),
            np.repeat(gi[:, :, None], 3, 2),
        ), hw


def test_16bit_decode_takes_high_byte():
    rng = np.random.default_rng(7)
    w16 = rng.integers(0, 65536, (11, 7, 3), dtype=np.uint16)
    exp = (w16 >> 8).astype(np.uint8)
    assert np.array_equal(decode_png(encode_png(w16)), exp)
    assert np.array_equal(decode_png(encode_png(w16, interlace=True)), exp)
    g16 = rng.integers(0, 65536, (9, 13), dtype=np.uint16)
    assert np.array_equal(
        decode_png(encode_png(g16))[:, :, 0], (g16 >> 8).astype(np.uint8)
    )


def test_1bit_gray_checkerboard():
    """Hand-packed 1-bit gray rows (MSB-first) decode to the 0/255
    scaled checkerboard — the sub-byte unpack + gray scaling path."""
    w, h = 10, 3
    rows = []
    for y in range(h):
        byts = bytearray(2)
        for x in range(w):
            byts[x // 8] |= ((x + y) & 1) << (7 - x % 8)
        rows.append(b"\x00" + bytes(byts))
    blob = (
        _SIGNATURE
        + _chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 1, 0, 0, 0, 0))
        + _chunk(b"IDAT", zlib.compress(b"".join(rows)))
        + _chunk(b"IEND", b"")
    )
    out = decode_png(blob)
    exp = np.array(
        [[(x + y) & 1 for x in range(w)] for y in range(h)], dtype=np.uint8
    ) * 255
    assert np.array_equal(out[:, :, 0], exp)


def test_4bit_palette_decode():
    pal = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 10, 20, 30])
    idx = [[0, 1, 2, 3, 0], [3, 2, 1, 0, 1]]
    rows = []
    for r in idx:
        byts = bytearray(3)
        for i, v in enumerate(r):
            byts[i // 2] |= v << (4 - 4 * (i % 2))
        rows.append(b"\x00" + bytes(byts))
    blob = (
        _SIGNATURE
        + _chunk(b"IHDR", struct.pack(">IIBBBBB", 5, 2, 4, 3, 0, 0, 0))
        + _chunk(b"PLTE", pal)
        + _chunk(b"IDAT", zlib.compress(b"".join(rows)))
        + _chunk(b"IEND", b"")
    )
    out = decode_png(blob)
    p = np.frombuffer(pal, np.uint8).reshape(-1, 3)
    assert np.array_equal(out, p[np.array(idx)])


def test_multimodal_routes_png():
    img = np.full((12, 10), 150, dtype=np.uint8)
    w, h, n_frames, feats = _real_decode(encode_png(img))
    assert (w, h, n_frames) == (10, 12, 1)
    assert feats[0] == round(150 / 255, 6)
    resized = _real_resize(encode_png(img), 5, 6)
    out = decode_png(resized)
    assert out.shape == (6, 5, 3)
    assert np.all(out == 150)


def test_multiple_idat_chunks():
    img = np.arange(48, dtype=np.uint8).reshape(4, 4, 3)
    raw = b"".join(b"\x00" + img[y].tobytes() for y in range(4))
    z = zlib.compress(raw)
    blob = (
        _SIGNATURE
        + _chunk(b"IHDR", struct.pack(">IIBBBBB", 4, 4, 8, 2, 0, 0, 0))
        + _chunk(b"IDAT", z[:7])
        + _chunk(b"IDAT", z[7:])
        + _chunk(b"IEND", b"")
    )
    assert np.array_equal(decode_png(blob), img)
