"""BMP codec tests: exact round trips (24/32-bit), bottom-up/top-down,
row padding, palette and 1-bit decode, refusals, decode_image dispatch."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from fsql_spark.operators.bmp import decode_bmp, encode_bmp
from fsql_spark.operators.codecs import CodecError

RNG = np.random.RandomState(20260814)


@pytest.mark.parametrize("shape", [(1, 1, 3), (7, 5, 3), (9, 17, 3), (6, 3, 4), (4, 31, 4)])
def test_round_trip_exact(shape):
    a = RNG.randint(0, 256, size=shape).astype(np.uint8)
    out = decode_bmp(encode_bmp(a))
    assert out.shape == a.shape and (out == a).all()


def test_palette_and_mono_decode():
    # hand-build an 8-bit paletted BMP (bottom-up, padded rows)
    w, h, n = 5, 3, 7
    idx = RNG.randint(0, n, size=(h, w)).astype(np.uint8)
    pal = RNG.randint(0, 256, size=(n, 3)).astype(np.uint8)
    bgrx = np.zeros((n, 4), np.uint8)
    bgrx[:, :3] = pal[:, ::-1]
    row_bytes = (w * 8 + 31) // 32 * 4
    rows = np.zeros((h, row_bytes), np.uint8)
    rows[:, :w] = idx[::-1]
    pix_offset = 14 + 40 + 4 * n
    hdr = b"BM" + struct.pack("<IHHI", pix_offset + rows.size, 0, 0, pix_offset)
    hdr += struct.pack("<IiiHHIIiiII", 40, w, h, 1, 8, 0, rows.size, 0, 0, n, 0)
    out = decode_bmp(hdr + bgrx.tobytes() + rows.tobytes())
    assert (out == pal[idx]).all()
    # 1-bit mono
    bits = RNG.randint(0, 2, size=(h, 9)).astype(np.uint8)
    row_bytes1 = (9 * 1 + 31) // 32 * 4
    rows1 = np.zeros((h, row_bytes1), np.uint8)
    packed = np.packbits(bits[::-1], axis=1)
    rows1[:, : packed.shape[1]] = packed
    pix1 = 14 + 40 + 8
    hdr1 = b"BM" + struct.pack("<IHHI", pix1 + rows1.size, 0, 0, pix1)
    hdr1 += struct.pack("<IiiHHIIiiII", 40, 9, h, 1, 1, 0, rows1.size, 0, 0, 2, 0)
    table = bytes([0, 0, 0, 0, 255, 255, 255, 0])
    out1 = decode_bmp(hdr1 + table + rows1.tobytes())
    assert out1.shape == (h, 9) and (out1 == bits).all()


def test_top_down_negative_height():
    a = RNG.randint(0, 256, size=(4, 6, 3)).astype(np.uint8)
    bmp = bytearray(encode_bmp(a))
    # flip to top-down: negate height and un-reverse the stored rows
    bmp[22:26] = struct.pack("<i", -4)
    row_bytes = (6 * 24 + 31) // 32 * 4
    body = np.frombuffer(bytes(bmp[54:]), dtype=np.uint8).reshape(4, row_bytes)[::-1]
    assert (decode_bmp(bytes(bmp[:54]) + body.tobytes()) == a).all()


def test_refusals():
    with pytest.raises(CodecError, match="magic|truncated"):
        decode_bmp(b"not a bmp")
    a = RNG.randint(0, 256, size=(4, 4, 3)).astype(np.uint8)
    good = bytearray(encode_bmp(a))
    with pytest.raises(CodecError, match="truncated pixel"):
        decode_bmp(bytes(good[:-5]))
    rle = good.copy()
    rle[30:34] = struct.pack("<I", 1)  # BI_RLE8
    with pytest.raises(NotImplementedError, match="compression 1"):
        decode_bmp(bytes(rle))
    odd = good.copy()
    odd[28:30] = struct.pack("<H", 16)
    with pytest.raises(NotImplementedError, match="16-bit"):
        decode_bmp(bytes(odd))
    with pytest.raises(ValueError, match="uint8"):
        encode_bmp(a.astype(np.int32))


def test_decode_image_dispatch():
    from fsql_spark.operators.multimodal import decode_image

    a = RNG.randint(0, 256, size=(11, 13, 3)).astype(np.uint8)
    assert (decode_image(encode_bmp(a)) == a).all()


def test_bitfields_masks_checked():
    import struct as _s

    a = RNG.randint(0, 256, size=(4, 4, 4)).astype(np.uint8)
    good = bytearray(encode_bmp(a))
    # declare BI_BITFIELDS with a V4-size header and nonstandard masks
    bf = good.copy()
    bf[30:34] = _s.pack("<I", 3)
    bf[14:18] = _s.pack("<I", 108)  # V4
    # grow the header area with masks RGBA-order (nonstandard)
    masks = _s.pack("<IIII", 0x000000FF, 0x0000FF00, 0x00FF0000, 0xFF000000)
    body = bytes(bf[:54]) + masks + b"\x00" * (108 - 40 - 16) + bytes(bf[54:])
    body = bytearray(body)
    body[10:14] = _s.pack("<I", 14 + 108)
    with pytest.raises(NotImplementedError, match="mask layout"):
        decode_bmp(bytes(body))
