"""Pure stdlib+numpy BMP (Windows bitmap) codec.

The simplest common image container: a fixed header + bottom-up
uncompressed pixel rows. Decoding covers the files a crawl actually
meets — BITMAPINFOHEADER (40) and the V4/V5 extensions, 24/32-bit
truecolor, 8-bit paletted, 1-bit mono — all BI_RGB (uncompressed) plus
BI_BITFIELDS in the standard 8888 layout. RLE compression raises
NotImplementedError. Lossless, so round trips are exact.

Like the other codecs these run INSIDE Arrow-batched mapInPandas
kernels; everything here is numpy slicing — no per-pixel Python.
"""

from __future__ import annotations

import struct

import numpy as np

from .codecs import CodecError


def decode_bmp(data: bytes) -> np.ndarray:
    """Decode a BMP byte string to a uint8 array — (H, W, 3) BGR->RGB for
    truecolor, (H, W, 4) for 32-bit with alpha, (H, W, 3) palette lookup
    for 8-bit, (H, W) 0/1 for 1-bit mono. Refuses corrupt structure with
    :class:`CodecError` and RLE/odd bit depths with NotImplementedError."""
    if len(data) < 54 or data[:2] != b"BM":
        raise CodecError("not a BMP (bad magic or truncated header)")
    (pix_offset,) = struct.unpack("<I", data[10:14])
    (hdr_size,) = struct.unpack("<I", data[14:18])
    if hdr_size < 40:
        raise NotImplementedError(f"BMP: header size {hdr_size} (BITMAPCOREHEADER) not supported")
    width, height_raw = struct.unpack("<ii", data[18:26])
    planes, bpp = struct.unpack("<HH", data[26:30])
    (compression,) = struct.unpack("<I", data[30:34])
    if width <= 0 or height_raw == 0:
        raise CodecError("BMP: non-positive dimensions")
    top_down = height_raw < 0
    height = abs(height_raw)
    if planes != 1:
        raise CodecError(f"BMP: planes must be 1, got {planes}")
    if compression not in (0, 3):  # BI_RGB / BI_BITFIELDS
        raise NotImplementedError(f"BMP: compression {compression} not supported (BI_RGB only)")
    if bpp not in (1, 8, 24, 32):
        raise NotImplementedError(f"BMP: {bpp}-bit pixels not supported (1/8/24/32)")
    if compression == 3:
        if bpp != 32:
            raise NotImplementedError("BMP: BI_BITFIELDS only supported for 32-bit")
        # the masks define the channel layout: decode assumes the standard
        # BGRA 8888 order — any other layout must refuse, not swap channels
        if hdr_size >= 56:  # V4/V5: masks live in the header
            if len(data) < 70:
                raise CodecError("BMP: truncated V4/V5 mask fields")
            masks = struct.unpack("<IIII", data[54:70])
        else:  # BITMAPINFOHEADER: three masks follow the header
            if len(data) < 14 + hdr_size + 12:
                raise CodecError("BMP: truncated BI_BITFIELDS masks")
            masks = struct.unpack("<III", data[14 + hdr_size : 14 + hdr_size + 12]) + (0xFF000000,)
        expect = (0x00FF0000, 0x0000FF00, 0x000000FF, 0xFF000000)
        if tuple(masks[:3]) != expect[:3] or masks[3] not in (0, 0xFF000000):
            raise NotImplementedError(
                f"BMP: BI_BITFIELDS mask layout {[hex(m) for m in masks]} "
                "not supported (standard 8888 BGRA only)"
            )

    palette = None
    if bpp <= 8:
        (colors_used,) = struct.unpack("<I", data[46:50])
        n = colors_used or (1 << bpp)
        pal_start = 14 + hdr_size + (12 if compression == 3 and hdr_size == 40 else 0)
        raw_pal = data[pal_start : pal_start + 4 * n]
        if len(raw_pal) != 4 * n:
            raise CodecError("BMP: truncated color table")
        bgrx = np.frombuffer(raw_pal, dtype=np.uint8).reshape(n, 4)
        palette = bgrx[:, [2, 1, 0]]  # BGRX -> RGB

    row_bytes = (width * bpp + 31) // 32 * 4  # rows pad to 4-byte boundaries
    body = data[pix_offset : pix_offset + row_bytes * height]
    if len(body) != row_bytes * height:
        raise CodecError("BMP: truncated pixel data")
    rows = np.frombuffer(body, dtype=np.uint8).reshape(height, row_bytes)
    if not top_down:
        rows = rows[::-1]  # stored bottom-up

    if bpp == 32:
        px = rows[:, : width * 4].reshape(height, width, 4)
        return px[:, :, [2, 1, 0, 3]].copy()  # BGRA -> RGBA
    if bpp == 24:
        px = rows[:, : width * 3].reshape(height, width, 3)
        return px[:, :, ::-1].copy()  # BGR -> RGB
    if bpp == 8:
        idx = rows[:, :width]
        if int(idx.max(initial=0)) >= palette.shape[0]:
            raise CodecError("BMP: palette index out of range")
        return palette[idx]
    # 1-bit mono: MSB-first bits, returned as raw 0/1 (like sub-byte PNG)
    bits = np.unpackbits(rows, axis=1)[:, :width]
    return bits.astype(np.uint8)


def encode_bmp(arr: np.ndarray) -> bytes:
    """Encode a uint8 array — (H, W, 3) RGB or (H, W, 4) RGBA — as an
    uncompressed bottom-up BITMAPINFOHEADER BMP. Deterministic."""
    if arr.dtype != np.uint8 or arr.ndim != 3 or arr.shape[2] not in (3, 4):
        raise ValueError("encode_bmp needs a uint8 (H, W, 3|4) array")
    height, width, channels = arr.shape
    if height == 0 or width == 0:
        raise ValueError("cannot encode a zero-sized image")
    bpp = channels * 8
    row_bytes = (width * bpp + 31) // 32 * 4
    body = np.zeros((height, row_bytes), dtype=np.uint8)
    if channels == 3:
        body[:, : width * 3] = arr[::-1, :, ::-1].reshape(height, width * 3)  # RGB->BGR, bottom-up
    else:
        body[:, : width * 4] = arr[::-1][:, :, [2, 1, 0, 3]].reshape(height, width * 4)
    pix_offset = 14 + 40
    size = pix_offset + body.size
    header = (
        b"BM"
        + struct.pack("<IHHI", size, 0, 0, pix_offset)
        + struct.pack("<IiiHHIIiiII", 40, width, height, 1, bpp, 0, body.size, 2835, 2835, 0, 0)
    )
    return header + body.tobytes()
