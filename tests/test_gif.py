"""GIF codec tests: exact LZW round trips (plain + interlaced +
transparency + table-growth/clear-code paths), corrupt/scope refusals,
multi-frame parsing, and the decode_image dispatch."""

from __future__ import annotations

import numpy as np
import pytest

from fsql_spark.operators.codecs import CodecError
from fsql_spark.operators.gif import decode_gif, encode_gif

RNG = np.random.RandomState(20260814)


@pytest.mark.parametrize("shape,npal", [((23, 17), 7), ((1, 1), 2), ((40, 33), 256), ((8, 300), 5)])
@pytest.mark.parametrize("interlace", [False, True])
def test_round_trip_exact(shape, npal, interlace):
    idx = RNG.randint(0, npal, size=shape).astype(np.uint8)
    pal = RNG.randint(0, 256, size=(npal, 3)).astype(np.uint8)
    out = decode_gif(encode_gif(idx, pal, interlace=interlace))
    assert out["width"] == shape[1] and out["height"] == shape[0]
    assert len(out["frames"]) == 1
    assert (out["frames"][0] == pal[idx]).all()


def test_transparency():
    idx = RNG.randint(0, 4, size=(9, 9)).astype(np.uint8)
    pal = RNG.randint(0, 256, size=(4, 3)).astype(np.uint8)
    f = decode_gif(encode_gif(idx, pal, transparent=2))["frames"][0]
    assert f.shape == (9, 9, 4)
    assert ((f[:, :, 3] == 0) == (idx == 2)).all()
    assert (f[:, :, :3] == pal[idx]).all()


def test_lzw_table_growth_and_clear():
    # enough distinct runs to grow to 12-bit codes and force a clear
    big = np.tile(np.arange(256, dtype=np.uint8), 300).reshape(100, 768)
    pal = RNG.randint(0, 256, size=(256, 3)).astype(np.uint8)
    assert (decode_gif(encode_gif(big, pal))["frames"][0] == pal[big]).all()


def test_refusals():
    with pytest.raises(CodecError, match="magic"):
        decode_gif(b"PNG... nope")
    idx = RNG.randint(0, 4, size=(6, 6)).astype(np.uint8)
    pal = RNG.randint(0, 256, size=(4, 3)).astype(np.uint8)
    good = bytearray(encode_gif(idx, pal))
    with pytest.raises(CodecError):
        decode_gif(bytes(good[:20]))  # truncated mid-structure
    no_trailer_no_data = good[:13] + good[13 : 13 + 12] + b"\x3b"
    with pytest.raises(CodecError, match="no image data"):
        decode_gif(bytes(no_trailer_no_data))
    # partial-canvas frame: patch the image descriptor's left offset
    i = bytes(good).find(b"\x2c")
    partial = good.copy()
    partial[i + 1] = 1  # left = 1
    with pytest.raises(NotImplementedError, match="partial-canvas"):
        decode_gif(bytes(partial))
    with pytest.raises(ValueError, match="index out of range"):
        encode_gif(np.full((4, 4), 9, np.uint8), pal)
    with pytest.raises(ValueError, match="transparent index"):
        encode_gif(idx, pal, transparent=7)


def test_multi_frame_concat():
    # two full-canvas frames back to back (animation without disposal)
    idx1 = RNG.randint(0, 4, size=(5, 7)).astype(np.uint8)
    idx2 = RNG.randint(0, 4, size=(5, 7)).astype(np.uint8)
    pal = RNG.randint(0, 256, size=(4, 3)).astype(np.uint8)
    a = bytearray(encode_gif(idx1, pal))
    b = bytes(encode_gif(idx2, pal))
    i = b.find(b"\x2c")  # splice frame 2's image block before frame 1's trailer
    two = bytes(a[:-1]) + b[i:]
    out = decode_gif(two)
    assert len(out["frames"]) == 2
    assert (out["frames"][0] == pal[idx1]).all()
    assert (out["frames"][1] == pal[idx2]).all()


def test_decode_image_dispatch():
    from fsql_spark.operators.multimodal import decode_image

    idx = RNG.randint(0, 8, size=(11, 13)).astype(np.uint8)
    pal = RNG.randint(0, 256, size=(8, 3)).astype(np.uint8)
    out = decode_image(encode_gif(idx, pal, interlace=True))
    assert out.shape == (11, 13, 3)
    assert (out == pal[idx]).all()


def test_zero_screen_and_dim_bounds():
    with pytest.raises(CodecError, match="zero-sized"):
        # 0x0 logical screen, no color table, immediate trailer
        decode_gif(b"GIF89a" + b"\x00\x00\x00\x00\x00\x00\x00" + b"\x3b")
    with pytest.raises(ValueError, match="65535"):
        encode_gif(np.zeros((1, 70000), np.uint8), np.zeros((2, 3), np.uint8))
