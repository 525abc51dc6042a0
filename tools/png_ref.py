"""ctypes shim over the system reference PNG codec (libpng16), using the
SIMPLIFIED API (png_image) — flat struct, no callbacks, ABI-stable since
libpng 1.6.

Used at fixture-GENERATION time (tools/make_png_fixtures.py) and by the
gated live interop test. Committed fixtures don't need it at test time.
"""

from __future__ import annotations

import ctypes

import numpy as np

PNG_IMAGE_VERSION = 1
PNG_FORMAT_GRAY = 0x00
PNG_FORMAT_RGB = 0x02  # PNG_FORMAT_FLAG_COLOR
PNG_FORMAT_RGBA = 0x03  # COLOR | ALPHA
PNG_FORMAT_GA = 0x01  # ALPHA (gray + alpha)
PNG_FORMAT_LINEAR = 0x04

_CHANNELS = {
    PNG_FORMAT_GRAY: 1,
    PNG_FORMAT_GA: 2,
    PNG_FORMAT_RGB: 3,
    PNG_FORMAT_RGBA: 4,
}


class PngImage(ctypes.Structure):
    """png_image (png.h, PNG_IMAGE_VERSION 1)."""

    _fields_ = [
        ("opaque", ctypes.c_void_p),
        ("version", ctypes.c_uint32),
        ("width", ctypes.c_uint32),
        ("height", ctypes.c_uint32),
        ("format", ctypes.c_uint32),
        ("flags", ctypes.c_uint32),
        ("colormap_entries", ctypes.c_uint32),
        ("warning_or_error", ctypes.c_uint32),
        ("message", ctypes.c_char * 64),
    ]


def load_libpng():
    for name in ("libpng16.so.16", "libpng16.so", "libpng16.16.dylib"):
        try:
            return ctypes.CDLL(name)
        except OSError:
            continue
    return None


def ref_decode_png(data: bytes, lib=None) -> np.ndarray:
    """Decode a PNG with libpng -> (H, W, C) uint8 in the stream's own
    composition class (gray / gray+alpha / RGB / RGBA; palettes resolve
    to their RGB(A) meaning — same normalization our decoder applies)."""
    lib = lib or load_libpng()
    if lib is None:
        raise RuntimeError("libpng16 not available")
    img = PngImage()
    img.version = PNG_IMAGE_VERSION
    ok = lib.png_image_begin_read_from_memory(
        ctypes.byref(img), data, ctypes.c_size_t(len(data))
    )
    if not ok:
        raise ValueError(f"libpng rejected the stream: {img.message!r}")
    # request 8-bit, keep the color/alpha class libpng detected
    fmt = img.format & (PNG_FORMAT_RGBA)  # drop LINEAR/COLORMAP flags
    img.format = fmt
    ch = _CHANNELS[fmt]
    buf = np.zeros((img.height, img.width, ch), dtype=np.uint8)
    ok = lib.png_image_finish_read(
        ctypes.byref(img),
        None,
        buf.ctypes.data_as(ctypes.c_void_p),
        ctypes.c_int32(img.width * ch),
        None,
    )
    if not ok:
        raise ValueError(f"libpng finish_read failed: {img.message!r}")
    return buf if ch > 1 else buf[:, :, 0]


def ref_encode_png(arr: np.ndarray, lib=None) -> bytes:
    """Encode (H,W) gray / (H,W,2) gray+alpha / (H,W,3) RGB / (H,W,4)
    RGBA uint8 with libpng's simplified writer (non-interlaced,
    filter choice = libpng's own heuristics — a genuinely independent
    bitstream producer)."""
    lib = lib or load_libpng()
    if lib is None:
        raise RuntimeError("libpng16 not available")
    assert arr.dtype == np.uint8
    if arr.ndim == 2:
        fmt, ch = PNG_FORMAT_GRAY, 1
    else:
        fmt = {2: PNG_FORMAT_GA, 3: PNG_FORMAT_RGB, 4: PNG_FORMAT_RGBA}[arr.shape[2]]
        ch = arr.shape[2]
    h, w = arr.shape[:2]
    img = PngImage()
    img.version = PNG_IMAGE_VERSION
    img.width = w
    img.height = h
    img.format = fmt
    buf = np.ascontiguousarray(arr).tobytes()
    size = ctypes.c_size_t(0)
    # first call with NULL memory computes the required size
    lib.png_image_write_to_memory(
        ctypes.byref(img), None, ctypes.byref(size), 0, buf,
        ctypes.c_int32(w * ch), None,
    )
    if size.value == 0:
        raise ValueError(f"libpng write sizing failed: {img.message!r}")
    out = ctypes.create_string_buffer(size.value)
    ok = lib.png_image_write_to_memory(
        ctypes.byref(img), out, ctypes.byref(size), 0, buf,
        ctypes.c_int32(w * ch), None,
    )
    if not ok:
        raise ValueError(f"libpng write failed: {img.message!r}")
    return out.raw[: size.value]
