"""ctypes shim over the system's reference WebP codec (libwebp.so.7).

Used by tools/make_webp_fixtures.py at FIXTURE-GENERATION time and by the
gated interop tests when the library is present. The committed fixtures +
expected pixels do NOT need this at test time — that's the point of
vendoring them.

Public API surface only (decode.h / encode.h of libwebp):
  WebPDecodeRGBA(data, size, &w, &h) -> uint8* (RGBA, row-major)
  WebPEncodeLosslessRGBA(rgba, w, h, stride, &out) -> size
  WebPFree(ptr)
"""

from __future__ import annotations

import ctypes

import numpy as np


def load_libwebp():
    """Return the CDLL or None when the shared library is absent."""
    for name in ("libwebp.so.7", "libwebp.so", "libwebp.7.dylib", "libwebp.dylib"):
        try:
            return ctypes.CDLL(name)
        except OSError:
            continue
    return None


def ref_decode_rgba(data: bytes, lib=None) -> np.ndarray:
    """Decode any WebP stream with the reference decoder -> (H, W, 4)
    uint8 RGBA. Raises ValueError when libwebp rejects the stream."""
    lib = lib or load_libwebp()
    if lib is None:
        raise RuntimeError("libwebp shared library not available")
    lib.WebPDecodeRGBA.restype = ctypes.POINTER(ctypes.c_uint8)
    lib.WebPDecodeRGBA.argtypes = [
        ctypes.c_char_p,
        ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int),
    ]
    lib.WebPFree.argtypes = [ctypes.c_void_p]
    w = ctypes.c_int(0)
    h = ctypes.c_int(0)
    ptr = lib.WebPDecodeRGBA(data, len(data), ctypes.byref(w), ctypes.byref(h))
    if not ptr:
        raise ValueError("libwebp rejected the stream")
    try:
        n = w.value * h.value * 4
        out = np.ctypeslib.as_array(ptr, shape=(n,)).copy()
    finally:
        lib.WebPFree(ctypes.cast(ptr, ctypes.c_void_p))
    return out.reshape(h.value, w.value, 4)


def ref_encode_lossless_rgba(rgba: np.ndarray, lib=None) -> bytes:
    """Encode (H, W, 4) uint8 RGBA losslessly with the reference encoder."""
    lib = lib or load_libwebp()
    if lib is None:
        raise RuntimeError("libwebp shared library not available")
    assert rgba.dtype == np.uint8 and rgba.ndim == 3 and rgba.shape[2] == 4
    h, w = rgba.shape[:2]
    buf = np.ascontiguousarray(rgba)
    lib.WebPEncodeLosslessRGBA.restype = ctypes.c_size_t
    lib.WebPEncodeLosslessRGBA.argtypes = [
        ctypes.c_char_p,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
    ]
    lib.WebPFree.argtypes = [ctypes.c_void_p]
    out_ptr = ctypes.POINTER(ctypes.c_uint8)()
    size = lib.WebPEncodeLosslessRGBA(
        buf.tobytes(), w, h, w * 4, ctypes.byref(out_ptr)
    )
    if size == 0 or not out_ptr:
        raise ValueError("libwebp lossless encode failed")
    try:
        data = bytes(bytearray(np.ctypeslib.as_array(out_ptr, shape=(size,))))
    finally:
        lib.WebPFree(ctypes.cast(out_ptr, ctypes.c_void_p))
    return data
