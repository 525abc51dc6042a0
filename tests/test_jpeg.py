"""Baseline JPEG codec tests: exact constant-block round trips (the
closed-form oracle family), bounded-error smooth/noise round trips,
4:2:0 vs 4:4:4, restart markers, odd sizes, corrupt/scope refusals,
and the distributed decode dispatch over Spark."""

from __future__ import annotations

import numpy as np
import pytest

from fsql_spark.operators.codecs import CodecError
from fsql_spark.operators.jpeg import (
    QUANT_LUM,
    ZIGZAG,
    decode_jpeg,
    encode_jpeg,
    quality_scaled_table,
)

RNG = np.random.RandomState(20260814)


def _expected_constant(v: np.ndarray, q00: int) -> np.ndarray:
    """Closed-form decode of a constant 8x8 block (module determinism
    contract): clamp(floor(8*(v-128)/q00 + 0.5) * q00/8 + 128)."""
    s = v.astype(np.int64) - 128
    sq = np.floor(8.0 * s / q00 + 0.5)
    return np.clip(sq * q00 / 8.0 + 128, 0, 255).astype(np.uint8)


def test_constant_blocks_exact_all_values():
    # every uint8 value as a constant block; quality 50 -> Q00 = 16
    v = np.arange(256, dtype=np.uint8)
    img = np.repeat(np.repeat(v.reshape(16, 16), 8, axis=0), 8, axis=1)
    out = decode_jpeg(encode_jpeg(img, quality=50))
    expect = np.repeat(
        np.repeat(_expected_constant(v, 16).reshape(16, 16), 8, axis=0), 8, axis=1
    )
    assert out.shape == img.shape
    assert (out == expect).all()


@pytest.mark.parametrize("quality,q00", [(50, 16), (25, 32), (75, 8)])
def test_constant_blocks_exact_when_q00_divides_8(quality, q00):
    assert quality_scaled_table(QUANT_LUM, quality)[0, 0] == q00
    if q00 % 8:
        pytest.skip("closed form needs 8 | Q00")
    v = np.arange(32, 127, dtype=np.uint8)
    img = np.repeat(np.repeat(v.reshape(-1, 1), 8, axis=0), 8, axis=1)
    out = decode_jpeg(encode_jpeg(img, quality=quality))
    assert (out[::8, 0] == _expected_constant(v, q00)).all()


def test_zigzag_is_the_spec_permutation():
    # spot anchors of the well-known order: 0,1,8,16,9,2,3,10,... ends at 63
    assert ZIGZAG[0] == 0 and ZIGZAG[1] == 1 and ZIGZAG[2] == 8
    assert ZIGZAG[3] == 16 and ZIGZAG[4] == 9 and ZIGZAG[5] == 2
    assert ZIGZAG[63] == 63 and sorted(ZIGZAG.tolist()) == list(range(64))


def test_smooth_round_trip_bounded_error():
    g = (np.add.outer(np.arange(40), np.arange(48)) * 2 % 256).astype(np.uint8)
    d = decode_jpeg(encode_jpeg(g, quality=90))
    assert d.shape == g.shape
    assert np.abs(d.astype(int) - g.astype(int)).max() <= 16


@pytest.mark.parametrize("subsampling", ["4:4:4", "4:2:0"])
def test_color_round_trip(subsampling):
    img = np.zeros((24, 40, 3), np.uint8)
    img[:, :, 0] = np.linspace(0, 255, 40).astype(np.uint8)
    img[:, :, 1] = 100
    img[:, :, 2] = np.linspace(255, 0, 24).astype(np.uint8)[:, None]
    d = decode_jpeg(encode_jpeg(img, quality=90, subsampling=subsampling))
    assert d.shape == img.shape
    # 4:2:0 halves chroma resolution: looser but still tight on a gradient
    bound = 16 if subsampling == "4:4:4" else 40
    assert np.abs(d.astype(int) - img.astype(int)).max() <= bound


@pytest.mark.parametrize("shape", [(1, 1), (7, 5), (9, 17), (16, 16), (23, 31, 3)])
def test_odd_sizes_round_trip_shape(shape):
    a = RNG.randint(60, 196, size=shape).astype(np.uint8)
    sub = "4:2:0" if len(shape) == 3 else "4:4:4"
    d = decode_jpeg(encode_jpeg(a, quality=95, subsampling=sub))
    assert d.shape == a.shape


def test_restart_markers_do_not_change_output():
    a = RNG.randint(0, 256, size=(40, 56)).astype(np.uint8)
    base = decode_jpeg(encode_jpeg(a, quality=92))
    for ri in (1, 2, 5, 7):
        assert (decode_jpeg(encode_jpeg(a, quality=92, restart_interval=ri)) == base).all()
    c = RNG.randint(0, 256, size=(24, 40, 3)).astype(np.uint8)
    b3 = decode_jpeg(encode_jpeg(c, quality=85, subsampling="4:2:0"))
    d3 = decode_jpeg(encode_jpeg(c, quality=85, subsampling="4:2:0", restart_interval=3))
    assert (d3 == b3).all()


def test_determinism_same_bytes():
    a = RNG.randint(0, 256, size=(17, 23)).astype(np.uint8)
    assert encode_jpeg(a, quality=70) == encode_jpeg(a.copy(), quality=70)


def test_refusals():
    with pytest.raises(CodecError, match="SOI"):
        decode_jpeg(b"nope")
    a = np.zeros((8, 8), np.uint8)
    good = bytearray(encode_jpeg(a))
    # flip the SOF0 marker to SOF3 (lossless) -> loud NotImplementedError
    i = bytes(good).find(b"\xff\xc0")
    prog = good.copy()
    prog[i + 1] = 0xC3
    with pytest.raises(NotImplementedError, match="SOF0/SOF1.*SOF2|progressive"):
        decode_jpeg(bytes(prog))
    with pytest.raises(CodecError):
        decode_jpeg(bytes(good[:-4]))  # truncated entropy data / no EOI scan end
    with pytest.raises(ValueError, match="quality"):
        encode_jpeg(a, quality=0)
    with pytest.raises(ValueError, match="uint8"):
        encode_jpeg(a.astype(np.int32))
    with pytest.raises(ValueError, match="subsampling"):
        encode_jpeg(np.zeros((8, 8, 3), np.uint8), subsampling="4:1:1")


def test_quality_scaling_anchors():
    assert (quality_scaled_table(QUANT_LUM, 50) == QUANT_LUM).all()
    assert quality_scaled_table(QUANT_LUM, 100).min() == 1
    assert (quality_scaled_table(QUANT_LUM, 1) >= QUANT_LUM).all()


def test_decode_image_dispatches_jpeg_natively(spark):
    from fsql_spark.operators.multimodal import decode_image

    a = np.repeat(np.repeat(np.array([[70, 80], [90, 100]], np.uint8), 8, 0), 8, 1)
    out = decode_image(encode_jpeg(a, quality=50))
    assert out.shape == (16, 16)
    assert (out == _expected_constant(a.astype(np.uint8), 16)).all()


@pytest.mark.parametrize("kind", ["gray", "rgb444", "rgb420"])
def test_progressive_equals_baseline(kind):
    """The progressive transmission carries the same quantized
    coefficients as the sequential one — decoded outputs must be
    IDENTICAL. This pins all four scan kinds (DC first/refine, AC
    first/refine) against the sequential path across random content,
    quality tiers, and partial-edge-block geometries."""
    rng = np.random.RandomState(7)
    for q in (35, 50, 75, 92, 99):
        h, w = int(rng.randint(1, 40)), int(rng.randint(1, 40))
        shape = (h, w) if kind == "gray" else (h, w, 3)
        sub = "4:2:0" if kind == "rgb420" else "4:4:4"
        a = rng.randint(0, 256, size=shape).astype(np.uint8)
        base = decode_jpeg(encode_jpeg(a, quality=q, subsampling=sub))
        prog = decode_jpeg(encode_jpeg(a, quality=q, subsampling=sub, progressive=True))
        assert (base == prog).all(), (kind, q, shape)


def test_progressive_constant_blocks_exact():
    # the closed-form oracle family holds for the progressive file too
    v = np.arange(32, 127, dtype=np.uint8)
    img = np.repeat(np.repeat(v.reshape(-1, 1), 8, axis=0), 8, axis=1)
    out = decode_jpeg(encode_jpeg(img, quality=50, progressive=True))
    assert (out[::8, 0] == _expected_constant(v, 16)).all()


def test_progressive_marker_and_scan_count():
    a = RNG.randint(0, 256, size=(16, 16, 3)).astype(np.uint8)
    data = encode_jpeg(a, quality=75, progressive=True)
    assert b"\xff\xc2" in data and b"\xff\xc0" not in data
    # DC first + 3x AC first + DC refine + 3x AC refine = 8 SOS segments
    assert data.count(b"\xff\xda") >= 8
    with pytest.raises(ValueError, match="sequential"):
        encode_jpeg(a, progressive=True, restart_interval=2)


def test_foreign_eobn_symbols_decode():
    """Our encoder only emits EOB0 (the standard tables carry no EOBn),
    but foreign progressive files use multi-block EOB runs — drive the
    block decoders directly with a custom table containing EOB1."""
    from fsql_spark.operators.jpeg import (
        _ac_first_block,
        _BitReader,
        _BitWriter,
        _build_decode_table,
        _build_encode_table,
    )

    bits = [0, 4, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
    vals = [0x00, 0x10, 0x01, 0xF0]
    enc = _build_encode_table(bits, vals)
    dec = _build_decode_table(bits, vals)
    w = _BitWriter()
    # block 1: coefficient 1 at k=1 (run 0, size 1, bit=1 -> +1), then EOB1
    code, length = enc[0x01]
    w.write(code, length)
    w.write(1, 1)
    code, length = enc[0x10]  # EOB1: eobrun = 2 + appended bit
    w.write(code, length)
    w.write(1, 1)  # eobrun = 3 -> this block + skip 2 more
    w.flush()
    reader = _BitReader(bytes(w.out))
    blocks = [[0] * 64 for _ in range(3)]
    eobrun = 0
    eobrun = _ac_first_block(reader, dec, blocks[0], 1, 63, 1, eobrun)
    assert blocks[0][1] == 1 << 1 and eobrun == 2
    eobrun = _ac_first_block(reader, dec, blocks[1], 1, 63, 1, eobrun)
    eobrun = _ac_first_block(reader, dec, blocks[2], 1, 63, 1, eobrun)
    assert eobrun == 0 and not any(any(b[1:]) for b in blocks[1:])


def test_header_dimension_cap():
    """A ~30-byte crafted stream declaring a 65535x65535 frame must refuse
    at the header, not allocate gigabytes of coefficient state."""
    import struct as _s

    from fsql_spark.operators.jpeg import MAX_DECODE_PIXELS

    sof = _s.pack(">BHHB", 8, 65535, 65535, 1) + _s.pack(">BBB", 1, 0x11, 0)
    data = (
        b"\xff\xd8"
        + b"\xff\xc2" + _s.pack(">H", len(sof) + 2) + sof
        + b"\xff\xd9"
    )
    with pytest.raises(CodecError, match="exceeds the decode cap"):
        decode_jpeg(data)
    assert 65535 * 65535 > MAX_DECODE_PIXELS
