"""Arbitrated PROPERTY fuzz (round 10): hypothesis drives random inputs
through the codecs with an independent implementation as the oracle —
the generalization of the fixed interop matrices that would have caught
both round-10 transcription bugs (_CODE_TO_PLANE order, TIFF-LZW
EarlyChange) automatically.

Two arbiters:
- javax.imageio through the test session's JVM (always present);
- libwebp.so for hand-assembled VP8L distance streams (gated; present
  in this environment).

Example counts and image sizes are deliberately small: each ImageIO
round trip costs py4j chatter, and the VP8L assembler emits whole
streams per example. The fixed matrices in test_codec_interop.py /
test_webp_fixtures.py remain the fast always-on gate; this file is the
adversarial sweep.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from fsql_spark.operators.codecs import decode_png, encode_png
from fsql_spark.operators.tiff import decode_tiff, encode_tiff
from fsql_spark.operators.webp import decode_webp

TOOLS = os.path.join(os.path.dirname(__file__), "..", "tools")
sys.path.insert(0, TOOLS)
try:
    from vp8l_assembler import (
        BitWriter,
        canonical,
        lz77_parts,
        riff_wrap,
        spec_distance,
        vp8l_header,
        write_normal_code,
        write_simple_code,
    )
    from webp_ref import load_libwebp
finally:
    sys.path.remove(TOOLS)

_HAS_LIBWEBP = load_libwebp() is not None


@pytest.fixture(scope="module")
def imageio(spark):
    sys.path.insert(0, TOOLS)
    try:
        from imageio_ref import ImageIORef
    finally:
        sys.path.remove(TOOLS)
    return ImageIORef(spark)


_img = st.tuples(
    st.integers(2, 8), st.integers(2, 8), st.sampled_from([0, 3, 4]),
    st.integers(0, 2**32 - 1),
).map(
    lambda t: np.random.RandomState(t[3]).randint(
        0, 256, (t[0], t[1]) if t[2] == 0 else (t[0], t[1], t[2]), dtype=np.uint8
    )
)


@given(img=_img, interlace=st.booleans(), filters=st.sampled_from(["cycle", "none"]))
@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_property_png_ours_to_imageio(imageio, img, interlace, filters):
    got = imageio.decode(encode_png(img, interlace=interlace, filters=filters))
    assert (np.squeeze(got) == np.squeeze(img)).all()


@given(img=_img, compression=st.sampled_from(["none", "packbits", "lzw", "deflate"]),
       predictor=st.booleans())
@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_property_tiff_ours_to_imageio(imageio, img, compression, predictor):
    if predictor and compression in ("none", "packbits"):
        predictor = False
    data = encode_tiff(img, compression=compression, predictor=predictor)
    got = imageio.decode(data)
    assert (np.squeeze(got) == np.squeeze(img)).all()


# --------------------------------------------------------------------------
# VP8L distance streams: random code sequences, libwebp as oracle
# --------------------------------------------------------------------------


def _build_distance_stream(w: int, dist_values: list) -> tuple[bytes, np.ndarray]:
    """A stream of 9 literal rows (distinct greens) + one row per 8 refs
    with the given distance VALUES (1..128), mirroring
    tools/make_webp_fixtures.build_dist_all120 but parametrized. Returns
    (stream, spec-model expected ARGB)."""
    n_lit = 9 * w
    n_ref = len(dist_values)
    assert (n_lit + n_ref) % w == 0
    h = (n_lit + n_ref) // w
    bw = BitWriter()
    vp8l_header(bw, w, h)
    bw.write(0, 1)
    bw.write(0, 1)
    bw.write(0, 1)
    g_lengths = {**{s: 8 for s in range(192)}, 256: 2}
    write_normal_code(
        bw, {8: 1, 2: 2, 18: 2},
        [("lit", 8)] * 192 + [("z18", 53), ("lit", 2), ("z18", 12)],
    )
    gcodes = canonical(g_lengths)
    write_simple_code(bw, [0xAA])
    write_simple_code(bw, [0xBB])
    write_simple_code(bw, [0xFF])
    d_lengths = {**{s: 4 for s in range(12)}, 12: 3, 13: 3}
    write_normal_code(
        bw, {4: 1, 3: 2, 18: 2},
        [("lit", 4)] * 12 + [("lit", 3)] * 2 + [("z18", 15)],
    )
    dcodes = canonical(d_lengths)
    for i in range(n_lit):
        c, l = gcodes[i]
        bw.write_code(c, l)
    c256, l256 = gcodes[256]
    for v in dist_values:
        bw.write_code(c256, l256)
        dsym, deb, dev = lz77_parts(v)
        c, l = dcodes[dsym]
        bw.write_code(c, l)
        bw.write(dev, deb)
    data = riff_wrap(b"\x2f" + bw.getvalue())
    out = [(0xFF << 24) | (0xAA << 16) | (g << 8) | 0xBB for g in range(n_lit)]
    for v in dist_values:
        d = spec_distance(v, w)
        out.append(out[len(out) - d])
    argb = np.array(out, dtype=np.uint32).reshape(h, w)
    rgba = np.stack(
        [(argb >> 16) & 0xFF, (argb >> 8) & 0xFF, argb & 0xFF, (argb >> 24) & 0xFF],
        axis=-1,
    ).astype(np.uint8)
    return data, rgba


def _norm_rgba(img: np.ndarray) -> np.ndarray:
    if img.ndim == 2:
        return np.stack([img, img, img, np.full_like(img, 255)], -1)
    if img.shape[2] == 3:
        a = np.full(img.shape[:2] + (1,), 255, np.uint8)
        return np.concatenate([img, a], -1)
    return img


@pytest.mark.skipif(not _HAS_LIBWEBP, reason="libwebp shared library absent")
@given(
    w=st.integers(4, 20),
    codes=st.lists(st.integers(1, 128), min_size=8, max_size=24),
    seed=st.integers(0, 2**31),
)
@settings(max_examples=25, deadline=None)
def test_property_vp8l_distance_streams_match_libwebp(w, codes, seed):
    """Random 2D + plain distance sequences: our decode, the independent
    spec model, and libwebp must all agree. 9 literal rows guarantee
    every code 1..128 resolves to a valid (dist <= position) reference
    for any width >= 4 (max 2D distance is 7w+8 <= 9w)."""
    codes = codes[: (len(codes) // w) * w] if len(codes) % w else codes
    if not codes:
        codes = [1] * w
    while len(codes) % w:
        codes.append(1)
    data, want = _build_distance_stream(w, codes)
    sys.path.insert(0, TOOLS)
    try:
        from webp_ref import ref_decode_rgba
    finally:
        sys.path.remove(TOOLS)
    ref = ref_decode_rgba(data)
    assert (ref == want).all(), "spec model disagrees with libwebp"
    ours = _norm_rgba(decode_webp(data))
    assert (ours == want).all(), "our decoder disagrees"


@pytest.mark.skipif(not _HAS_LIBWEBP, reason="libwebp shared library absent")
@given(
    kind=st.sampled_from(["noise", "gradient", "palette", "blocks"]),
    w=st.integers(5, 64),
    h=st.integers(5, 64),
    alpha=st.booleans(),
    seed=st.integers(0, 2**31),
)
@settings(max_examples=20, deadline=None)
def test_property_libwebp_encoded_images_decode_exactly(kind, w, h, alpha, seed):
    """The strongest decoder fuzz available: libwebp's own encoder picks
    per-tile predictors, entropy images, color caches, and 2D-distance
    LZ77 references by its cost model — feature combinations this repo's
    encoder never emits. Whatever it produces, decode_webp must return
    the source pixels exactly (VP8L is lossless)."""
    rng = np.random.RandomState(seed)
    if kind == "noise":
        img = rng.randint(0, 256, (h, w, 4), dtype=np.uint8)
    elif kind == "gradient":
        yy, xx = np.mgrid[0:h, 0:w]
        img = np.stack(
            [(xx * 7) % 256, (yy * 5 + xx) % 256, (yy * 11) % 256,
             np.full((h, w), 255)], axis=-1
        ).astype(np.uint8)
    elif kind == "palette":
        pal = rng.randint(0, 256, (rng.randint(2, 9), 4), dtype=np.uint8)
        img = pal[rng.randint(0, len(pal), (h, w))]
    else:  # blocks: runs + repeats drive LZ77 hard
        img = np.repeat(
            np.repeat(rng.randint(0, 256, ((h + 7) // 8, (w + 7) // 8, 4),
                                  dtype=np.uint8), 8, axis=0), 8, axis=1
        )[:h, :w]
    if not alpha:
        img[..., 3] = 255
    sys.path.insert(0, TOOLS)
    try:
        from webp_ref import ref_encode_lossless_rgba
    finally:
        sys.path.remove(TOOLS)
    data = ref_encode_lossless_rgba(np.ascontiguousarray(img))
    sys.path.insert(0, TOOLS)
    try:
        from webp_ref import ref_decode_rgba
    finally:
        sys.path.remove(TOOLS)
    # libwebp's default encode is NOT exact under full transparency: it
    # may rewrite the RGB of alpha==0 pixels (alpha-cleanup) — so the
    # oracle is libwebp's own decode of the stream, which must match us
    # bit-for-bit; for opaque images that equals the source exactly.
    want = ref_decode_rgba(data)
    got = _norm_rgba(decode_webp(data))
    assert got.shape == want.shape
    assert (got == want).all()
    opaque = img[..., 3] == 255
    assert (got[opaque] == img[opaque]).all()
