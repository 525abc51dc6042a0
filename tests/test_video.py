"""Y4M (YUV4MPEG2) codec tests: exact round trips (mono + C420jpeg),
header parsing, corrupt/scope refusals, and the distributed
frame-sampling dispatch over Spark."""

from __future__ import annotations

import numpy as np
import pytest

from fsql_spark.operators.codecs import CodecError
from fsql_spark.operators.video import decode_y4m, encode_y4m

RNG = np.random.RandomState(20260814)


def test_mono_round_trip_exact():
    y = RNG.randint(0, 256, size=(5, 12, 17)).astype(np.uint8)
    out = decode_y4m(encode_y4m(y, fps=(30, 1)))
    assert out["width"] == 17 and out["height"] == 12
    assert out["fps_num"] == 30 and out["fps_den"] == 1
    assert out["colorspace"] == "mono" and "u" not in out
    assert (out["y"] == y).all()


def test_c420_round_trip_exact():
    y = RNG.randint(0, 256, size=(3, 8, 10)).astype(np.uint8)
    u = RNG.randint(0, 256, size=(3, 4, 5)).astype(np.uint8)
    v = RNG.randint(0, 256, size=(3, 4, 5)).astype(np.uint8)
    out = decode_y4m(encode_y4m(y, fps=(24000, 1001), u=u, v=v))
    assert out["colorspace"] == "420jpeg"
    assert (out["y"] == y).all() and (out["u"] == u).all() and (out["v"] == v).all()
    assert out["fps_num"] == 24000 and out["fps_den"] == 1001


def test_c420_siting_variants_share_layout():
    y = RNG.randint(0, 256, size=(2, 4, 4)).astype(np.uint8)
    u = RNG.randint(0, 256, size=(2, 2, 2)).astype(np.uint8)
    v = RNG.randint(0, 256, size=(2, 2, 2)).astype(np.uint8)
    data = encode_y4m(y, u=u, v=v)
    for tag in (b"C420jpeg", b"C420", b"C420mpeg2", b"C420paldv"):
        out = decode_y4m(data.replace(b"C420jpeg", tag, 1))
        assert (out["y"] == y).all() and (out["v"] == v).all()


def test_zero_frames():
    out = decode_y4m(b"YUV4MPEG2 W4 H4 F25:1 Ip Cmono\n")
    assert out["y"].shape == (0, 4, 4)


def test_refusals():
    with pytest.raises(CodecError, match="magic"):
        decode_y4m(b"AVI nope")
    with pytest.raises(CodecError, match="unterminated"):
        decode_y4m(b"YUV4MPEG2 W4 H4")
    with pytest.raises(CodecError, match="W/H"):
        decode_y4m(b"YUV4MPEG2 F25:1\n")
    with pytest.raises(NotImplementedError, match="C422"):
        decode_y4m(b"YUV4MPEG2 W4 H4 F25:1 C422\n")
    with pytest.raises(NotImplementedError, match="interlacing"):
        decode_y4m(b"YUV4MPEG2 W4 H4 F25:1 It Cmono\n")
    good = encode_y4m(np.zeros((2, 4, 4), np.uint8))
    with pytest.raises(CodecError, match="truncated frame"):
        decode_y4m(good[:-3])
    with pytest.raises(CodecError, match="expected FRAME"):
        # corrupt the second frame's record header (last 22 bytes = FRAME\n + 16px)
        decode_y4m(good[:-22] + b"XRAME\n" + good[-16:])
    with pytest.raises(ValueError, match="both u and v"):
        encode_y4m(np.zeros((1, 4, 4), np.uint8), u=np.zeros((1, 2, 2), np.uint8))
    with pytest.raises(ValueError, match="chroma planes must be"):
        encode_y4m(
            np.zeros((1, 4, 4), np.uint8),
            u=np.zeros((1, 3, 3), np.uint8),
            v=np.zeros((1, 3, 3), np.uint8),
        )


def test_sample_video_frames_dispatch(spark):
    import pandas as pd

    from fsql_spark.operators.multimodal import pack_y4m, sample_video_frames

    docs = spark.createDataFrame(pd.DataFrame({"doc_id": [7], "text": ["abcdefg"]}))
    out = sample_video_frames(pack_y4m(docs), every=2).toPandas()
    assert out["frame_idx"].tolist() == [0, 2, 4, 6]
    assert out["luma_sum"].tolist() == [64 * ord(c) for c in "aceg"]
    # non-Y4M payload refuses with the media id attached
    bad = spark.createDataFrame(
        [(9, bytearray(b"\x00\x00\x00 ftypmp42 not a y4m"))],
        "media_id: long, content: binary",
    )
    with pytest.raises(Exception, match="media 9"):
        sample_video_frames(bad).collect()


def test_header_token_validation():
    with pytest.raises(CodecError, match="malformed stream-header"):
        decode_y4m(b"YUV4MPEG2 Wx H4 F25:1 Cmono\n")
    with pytest.raises(CodecError, match="malformed stream-header"):
        decode_y4m(b"YUV4MPEG2 W4 H4 F25 Cmono\n")
    with pytest.raises(CodecError, match="W/H"):
        decode_y4m(b"YUV4MPEG2 W-4 H4 F25:1 Cmono\n")
    with pytest.raises(ValueError, match="uint8 chroma"):
        encode_y4m(
            np.zeros((1, 4, 4), np.uint8),
            u=np.full((1, 2, 2), 300.7),
            v=np.full((1, 2, 2), 300.7),
        )
