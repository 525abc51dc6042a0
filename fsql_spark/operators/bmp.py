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
    has_alpha = False
    if compression == 3:
        if bpp != 32:
            raise NotImplementedError("BMP: BI_BITFIELDS only supported for 32-bit")
        # the masks define the channel layout: decode assumes the standard
        # 8888 order — any other layout must refuse, not swap channels
        if hdr_size >= 56:  # V3+/V4/V5: four masks inside the header
            if len(data) < 70:
                raise CodecError("BMP: truncated V4/V5 mask fields")
            masks = struct.unpack("<IIII", data[54:70])
        elif hdr_size >= 52:  # V2: three masks inside the header, no alpha
            if len(data) < 66:
                raise CodecError("BMP: truncated V2 mask fields")
            masks = struct.unpack("<III", data[54:66]) + (0,)
        else:  # BITMAPINFOHEADER: three masks follow the header
            if len(data) < 14 + hdr_size + 12:
                raise CodecError("BMP: truncated BI_BITFIELDS masks")
            masks = struct.unpack("<III", data[14 + hdr_size : 14 + hdr_size + 12]) + (0,)
        expect = (0x00FF0000, 0x0000FF00, 0x000000FF)
        if tuple(masks[:3]) != expect or masks[3] not in (0, 0xFF000000):
            raise NotImplementedError(
                f"BMP: BI_BITFIELDS mask layout {[hex(m) for m in masks]} "
                "not supported (standard 8888 BGRA only)"
            )
        has_alpha = masks[3] == 0xFF000000

    palette = None
    min_pix_offset = 14 + hdr_size
    if compression == 3 and hdr_size < 52:
        min_pix_offset += 12  # the three appended masks
    if bpp <= 8:
        (colors_used,) = struct.unpack("<I", data[46:50])
        n = colors_used or (1 << bpp)
        pal_start = min_pix_offset
        min_pix_offset += 4 * n
        raw_pal = data[pal_start : pal_start + 4 * n]
        if len(raw_pal) != 4 * n:
            raise CodecError("BMP: truncated color table")
        bgrx = np.frombuffer(raw_pal, dtype=np.uint8).reshape(n, 4)
        palette = bgrx[:, [2, 1, 0]]  # BGRX -> RGB

    if pix_offset < min_pix_offset:
        # an offset inside the header/palette would slice metadata bytes
        # into the pixel array — refuse, never decode garbage
        raise CodecError(f"BMP: pixel offset {pix_offset} overlaps the header")
    row_bytes = (width * bpp + 31) // 32 * 4  # rows pad to 4-byte boundaries
    body = data[pix_offset : pix_offset + row_bytes * height]
    if len(body) != row_bytes * height:
        raise CodecError("BMP: truncated pixel data")
    rows = np.frombuffer(body, dtype=np.uint8).reshape(height, row_bytes)
    if not top_down:
        rows = rows[::-1]  # stored bottom-up

    if bpp == 32:
        px = rows[:, : width * 4].reshape(height, width, 4)
        if has_alpha:
            return px[:, :, [2, 1, 0, 3]].copy()  # BGRA -> RGBA
        # BI_RGB 32-bit (or BITFIELDS without an alpha mask): the fourth
        # byte is spec-reserved padding, often 0 — returning it as alpha
        # would render standard files fully transparent (review find)
        return px[:, :, [2, 1, 0]].copy()  # BGRX -> RGB
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
        hdr_size, compression = 40, 0
        extra = b""
    else:
        body[:, : width * 4] = arr[::-1][:, :, [2, 1, 0, 3]].reshape(height, width * 4)
        # RGBA needs an ALPHA-BEARING header: BI_RGB's fourth byte is
        # reserved padding that conforming decoders ignore — write a V4
        # header with BI_BITFIELDS and an explicit 0xFF000000 alpha mask
        hdr_size, compression = 108, 3
        extra = struct.pack(
            "<IIII", 0x00FF0000, 0x0000FF00, 0x000000FF, 0xFF000000
        ) + b"\x00" * (108 - 40 - 16)
    pix_offset = 14 + hdr_size
    size = pix_offset + body.size
    header = (
        b"BM"
        + struct.pack("<IHHI", size, 0, 0, pix_offset)
        + struct.pack(
            "<IiiHHIIiiII", hdr_size, width, height, 1, bpp, compression,
            body.size, 2835, 2835, 0, 0,
        )
        + extra
    )
    return header + body.tobytes()
