"""Cross-codec interop: every image codec arbitrated against the JDK's
javax.imageio (round 10).

Until round 10 only WebP had third-party arbitration (libwebp). The JDK
bundles an independent image codec suite (com.sun.imageio — IJG-lineage
JPEG, its own PNG/GIF/BMP/TIFF), and every test session already holds a
Spark JVM — so this arbitration runs UNCONDITIONALLY, unlike the
Pillow/libwebp-gated tests. Shim: tools/imageio_ref.py (raster access,
no colorspace transforms).

Directions:
- ImageIO ENCODES, our codec DECODES (the stream is produced by code
  that shares nothing with this repo);
- our codec ENCODES, ImageIO DECODES (our bitstreams are readable by an
  independent implementation).

Tolerances: lossless formats (PNG/BMP/GIF/TIFF) must be EXACT. JPEG is
spec-accurate, not bit-exact: IDCT implementations may differ by ~1/LSB
(ISO 10918 accuracy clause), so gray and 4:4:4 assert max abs diff <= 3.
4:2:0 chroma upsampling is a decoder-choice filter (replication here,
triangle in IJG lineage), so 4:2:0 asserts the luma plane within 8
(Y is invertible from RGB except where clipping to 0..255 loses the
chroma excess) and overall mean within 12 — structural agreement,
with the spread explained by the documented filter difference, not by
entropy/marker/dequant bugs (those produce garbage, not +-filter blur).
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pytest

from fsql_spark.operators.bmp import decode_bmp, encode_bmp
from fsql_spark.operators.codecs import decode_png, encode_png, encode_png_palette
from fsql_spark.operators.gif import decode_gif, encode_gif
from fsql_spark.operators.jpeg import decode_jpeg, encode_jpeg
from fsql_spark.operators.tiff import decode_tiff, encode_tiff

TOOLS = os.path.join(os.path.dirname(__file__), "..", "tools")

_RNG = np.random.RandomState(20261015)
RGB = _RNG.randint(0, 256, (13, 11, 3), dtype=np.uint8)
GRAY = _RNG.randint(0, 256, (10, 9), dtype=np.uint8)
RGBA = _RNG.randint(0, 256, (8, 12, 4), dtype=np.uint8)
PAL_IDX = _RNG.randint(0, 7, (12, 9)).astype(np.uint8)
PALETTE = (np.arange(7)[:, None] * [31, 17, 7] % 256).astype(np.uint8)
SMOOTH = np.zeros((24, 16, 3), np.uint8)
_yy, _xx = np.mgrid[0:24, 0:16]
SMOOTH[..., 0] = (_xx * 9) % 256
SMOOTH[..., 1] = (_yy * 11 + _xx * 2) % 256
SMOOTH[..., 2] = (_yy * 5) % 256


@pytest.fixture(scope="module")
def imageio(spark):
    sys.path.insert(0, TOOLS)
    try:
        from imageio_ref import ImageIORef
    finally:
        sys.path.remove(TOOLS)
    return ImageIORef(spark)


def _y(x):
    x = x.astype(float)
    return 0.299 * x[..., 0] + 0.587 * x[..., 1] + 0.114 * x[..., 2]


# -- ImageIO encodes, we decode (exact for lossless) ------------------------


def test_imageio_png_decodes_exactly(imageio):
    for img in (RGB, GRAY, RGBA):
        got = decode_png(imageio.encode(img, "png"))
        assert got.shape == img.shape and (got == img).all()


def test_imageio_bmp_decodes_exactly(imageio):
    got = decode_bmp(imageio.encode(RGB, "bmp"))
    assert (got == RGB).all()


def test_imageio_gif_decodes_exactly(imageio):
    rgb = PALETTE[PAL_IDX]
    frame = decode_gif(imageio.encode(rgb, "gif"))["frames"][0]
    assert (frame[..., :3] == rgb).all()
    if frame.shape[2] == 4:
        assert (frame[..., 3] == 255).all()


@pytest.mark.parametrize("compression", [None, "LZW", "PackBits", "Deflate"])
def test_imageio_tiff_decodes_exactly(imageio, compression):
    kw = {"compression": compression} if compression else {}
    for img in (RGB, GRAY):
        got = decode_tiff(imageio.encode(img, "tiff", **kw))
        assert np.squeeze(got).shape == img.shape and (np.squeeze(got) == img).all()


def test_imageio_jpeg_gray_decodes_within_idct_tolerance(imageio):
    data = imageio.encode(GRAY, "jpeg", quality=0.95)
    got, ref = decode_jpeg(data), imageio.decode(data)
    assert np.abs(got.astype(int) - ref.astype(int)).max() <= 3


def test_imageio_jpeg_rgb420_decodes_structurally(imageio):
    # the JDK writer emits 4:2:0 ((2,2),(1,1),(1,1)) — upsampling filters
    # legitimately differ; luma is invertible from RGB and must be tight
    data = imageio.encode(SMOOTH, "jpeg", quality=0.95)
    got, ref = decode_jpeg(data), imageio.decode(data)
    assert np.abs(_y(got) - _y(ref)).max() <= 8.0
    assert np.abs(got.astype(int) - ref.astype(int)).mean() <= 12.0


# -- we encode, ImageIO decodes ---------------------------------------------


def test_our_png_streams_read_by_imageio(imageio):
    for img, kw in [
        (RGB, {}),
        (RGB, {"interlace": True}),
        (GRAY, {"filters": "none"}),
        (RGBA, {}),
    ]:
        got = imageio.decode(encode_png(img, **kw))
        assert np.squeeze(got).shape == img.shape and (np.squeeze(got) == img).all()
    pal_stream = encode_png_palette(PAL_IDX, PALETTE)
    got = imageio.decode(pal_stream)
    assert (got[..., :3] == PALETTE[PAL_IDX]).all()


def test_our_bmp_gif_tiff_streams_read_by_imageio(imageio):
    assert (imageio.decode(encode_bmp(RGB)) == RGB).all()
    # RGBA BMP uses the V4 BI_BITFIELDS header with an explicit alpha
    # mask — the JDK must honor it (alpha channel round-trips)
    got = imageio.decode(encode_bmp(RGBA))
    assert got.shape == RGBA.shape and (got == RGBA).all()
    got = imageio.decode(encode_gif(PAL_IDX, PALETTE))
    assert (got[..., :3] == PALETTE[PAL_IDX]).all()
    got = imageio.decode(encode_gif(PAL_IDX, PALETTE, interlace=True))
    assert (got[..., :3] == PALETTE[PAL_IDX]).all()
    got = imageio.decode(encode_gif(PAL_IDX, PALETTE, transparent=2))
    assert got.shape[2] == 4
    assert (got[..., 3] == np.where(PAL_IDX == 2, 0, 255)).all()
    opaque = PAL_IDX != 2
    assert (got[opaque][:, :3] == PALETTE[PAL_IDX][opaque]).all()
    for kw in ({}, {"compression": "packbits"}, {"compression": "lzw"},
               {"compression": "deflate", "predictor": True}):
        got = imageio.decode(encode_tiff(RGB, **kw))
        assert (got == RGB).all(), kw


@pytest.mark.parametrize(
    "kw",
    [
        {"quality": 95},
        {"quality": 95, "progressive": True},
        {"quality": 95, "restart_interval": 2},
    ],
)
def test_our_jpeg444_streams_read_by_imageio(imageio, kw):
    data = encode_jpeg(RGB, **kw)
    got, ours = imageio.decode(data), decode_jpeg(data)
    assert np.abs(got.astype(int) - ours.astype(int)).max() <= 3, kw


def test_our_jpeg_gray_stream_read_by_imageio(imageio):
    data = encode_jpeg(GRAY, quality=95)
    got, ours = imageio.decode(data), decode_jpeg(data)
    assert np.abs(got.astype(int) - ours.astype(int)).max() <= 3


def test_our_jpeg420_stream_read_by_imageio(imageio):
    data = encode_jpeg(SMOOTH, quality=90, subsampling="4:2:0")
    got, ours = imageio.decode(data), decode_jpeg(data)
    assert np.abs(_y(got) - _y(ours)).max() <= 8.0
    assert np.abs(got.astype(int) - ours.astype(int)).mean() <= 12.0


def test_our_16bit_and_subbyte_png_read_by_imageio(imageio):
    """Depth coverage beyond 8-bit: 16-bit gray/RGB and 1/2/4-bit gray
    PNGs from our encoder, read back through the JDK's raw raster
    (sample-exact; `decode` would 8-bit-truncate / LUT-map these)."""
    rng = np.random.RandomState(9)
    u16g = rng.randint(0, 65536, (5, 4), dtype=np.uint16)
    got = imageio.decode_raw_samples(encode_png(u16g))
    assert (got[:, :, 0] == u16g).all()
    u16c = rng.randint(0, 65536, (4, 3, 3), dtype=np.uint16)
    got = imageio.decode_raw_samples(encode_png(u16c))
    assert (got == u16c).all()
    for depth in (1, 2, 4):
        g = rng.randint(0, 1 << depth, (6, 5)).astype(np.uint8)
        got = imageio.decode_raw_samples(encode_png(g, depth=depth))
        assert (got[:, :, 0] == g).all(), depth


def _libpng():
    sys.path.insert(0, TOOLS)
    try:
        from png_ref import load_libpng

        return load_libpng()
    finally:
        sys.path.remove(TOOLS)


@pytest.mark.skipif(_libpng() is None, reason="libpng16 shared library absent")
def test_libpng_interop_live():
    """Second independent PNG arbiter (gated): libpng16's simplified API
    encodes streams we must decode exactly, and decodes our streams
    (incl. Adam7 + cycling filters) back to the source pixels."""
    sys.path.insert(0, TOOLS)
    try:
        from png_ref import ref_decode_png, ref_encode_png
    finally:
        sys.path.remove(TOOLS)
    for img in (RGB, GRAY, RGBA):
        data = ref_encode_png(img)
        got = decode_png(data)
        assert got.shape == img.shape and (got == img).all()
    for img, kw in [(RGB, {}), (RGB, {"interlace": True}), (GRAY, {}), (RGBA, {})]:
        got = ref_decode_png(encode_png(img, **kw))
        assert np.squeeze(got).shape == img.shape and (np.squeeze(got) == img).all()


def test_imageio_jpeg_in_tiff_decodes_structurally(imageio):
    """The JDK's TIFF writer with JPEG compression (new-style JPEG-in-
    TIFF, tag 259=7): same 4:2:0 physics as plain JPEG — luma tight,
    chroma bounded by the upsampling-filter difference."""
    data = imageio.encode(SMOOTH, "tiff", compression="JPEG")
    got, ref = decode_tiff(data), imageio.decode(data)
    assert np.abs(_y(got) - _y(ref)).max() <= 8.0
    assert np.abs(got.astype(int) - ref.astype(int)).mean() <= 12.0
