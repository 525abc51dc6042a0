"""FLAC codec tests: exact round trips through the real fixed-predictor
+ Rice encoder, plus HAND-BUILT streams exercising the decoder paths our
encoder never emits — LPC subframes, all three stereo decorrelation
modes, wasted bits, the Rice escape partition — and CRC refusals."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from fsql_spark.operators.codecs import CodecError
from fsql_spark.operators.flac import (
    FLAC_MAGIC,
    _Bits,
    _BitsW,
    _crc8,
    _crc16,
    _utf8_write,
    decode_flac,
    encode_flac,
)

RNG = np.random.RandomState(20260814)


@pytest.mark.parametrize("kind", ["random", "smooth", "constant", "tiny"])
def test_mono_round_trip(kind):
    if kind == "random":
        s = RNG.randint(-32768, 32768, size=10000).astype(np.int16)
    elif kind == "smooth":
        t = np.arange(10000)
        s = (3000 * np.sin(t / 50.0) + 200 * np.sin(t / 7.0)).astype(np.int16)
    elif kind == "constant":
        s = np.full(5000, -1234, np.int16)
    else:
        s = np.array([5], np.int16)
    rate, out = decode_flac(encode_flac(s, 44100))
    assert rate == 44100 and out.dtype == np.int16 and (out == s).all()


def test_stereo_and_24bit_and_blocks():
    st = np.stack(
        [
            (2000 * np.sin(np.arange(9000) / 40.0)).astype(np.int16),
            RNG.randint(-2000, 2000, size=9000).astype(np.int16),
        ],
        axis=1,
    )
    rate, out = decode_flac(encode_flac(st, 48000))
    assert out.shape == st.shape and (out == st).all()
    s24 = RNG.randint(-(1 << 23), 1 << 23, size=5000).astype(np.int32)
    _, o24 = decode_flac(encode_flac(s24, 96000))
    assert o24.dtype == np.int32 and (o24 == s24).all()
    for n in (1, 4095, 4096, 4097):
        s = RNG.randint(-1000, 1000, size=n).astype(np.int16)
        assert (decode_flac(encode_flac(s, 8000))[1] == s).all()


def test_compression_is_real():
    sm = (3000 * np.sin(np.arange(20000) / 50.0)).astype(np.int16)
    assert len(encode_flac(sm, 44100)) < 0.5 * 2 * len(sm)


def _stream(frame_builder, channels=1, bps=16, n_total=None, rate=8000):
    """Assemble magic + STREAMINFO + one hand-built frame."""
    si = _BitsW()
    si.write(4096, 16)
    si.write(4096, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(rate, 20)
    si.write(channels - 1, 3)
    si.write(bps - 1, 5)
    si.write(n_total or 0, 36)
    si.out += b"\x00" * 16
    out = bytearray(FLAC_MAGIC) + bytes([0x80, 0, 0, 34]) + bytes(si.out)

    w = _BitsW()
    frame_builder(w)
    w.align()
    frame = bytes(w.out)
    w.write(_crc16(frame), 16)
    return bytes(out) + bytes(w.out)


def _frame_header(w, block, ch_code, bps=16):
    w.write(0x3FFE, 14)
    w.write(0, 1)
    w.write(0, 1)
    w.write(7, 4)  # 16-bit block size at header end
    w.write(0, 4)
    w.write(ch_code, 4)
    w.write({16: 4, 24: 6}[bps], 3)
    w.write(0, 1)
    _utf8_write(w, 0)
    w.write(block - 1, 16)
    w.align()
    w.write(_crc8(bytes(w.out)), 8)


def test_lpc_subframe():
    # LPC order 1, precision 4, shift 1, coef 2: pred = x[i-1]
    x = [10, 11, 13, 16, 20]

    def build(w):
        _frame_header(w, len(x), ch_code=0)
        w.write(0, 1)
        w.write(32 + 0, 6)  # LPC, order 1 (type 32 + order-1)
        w.write(0, 1)
        w.write(x[0], 16)  # warmup
        w.write(3, 4)  # precision-1 -> 4 bits
        w.write(1, 5)  # shift 1
        w.write(2, 4)  # coefficient 2 -> pred = 2*prev >> 1 = prev
        # residuals x[i]-x[i-1] = 1,2,3,4 ; rice param 2, order 0
        w.write(0, 2)
        w.write(0, 4)
        w.write(2, 4)
        for r in (1, 2, 3, 4):
            zig = r << 1
            w.write_unary(zig >> 2)
            w.write(zig & 3, 2)

    rate, out = decode_flac(_stream(build, n_total=len(x)))
    assert out.tolist() == x


@pytest.mark.parametrize("mode", ["left_side", "right_side", "mid_side"])
def test_stereo_decorrelation_modes(mode):
    left = [100, -50, 30, 7]
    right = [90, -60, 42, 7]

    def verbatim(w, vals, nbits):
        w.write(0, 1)
        w.write(1, 6)
        w.write(0, 1)
        for v in vals:
            w.write(v, nbits)

    def build(w):
        ch_code = {"left_side": 8, "right_side": 9, "mid_side": 10}[mode]
        _frame_header(w, 4, ch_code=ch_code)
        side = [l - r for l, r in zip(left, right)]
        if mode == "left_side":
            verbatim(w, left, 16)
            verbatim(w, side, 17)
        elif mode == "right_side":
            verbatim(w, side, 17)
            verbatim(w, right, 16)
        else:
            mid = [(l + r) >> 1 for l, r in zip(left, right)]
            verbatim(w, mid, 16)
            verbatim(w, side, 17)

    rate, out = decode_flac(_stream(build, channels=2, n_total=4))
    assert out[:, 0].tolist() == left and out[:, 1].tolist() == right


def test_wasted_bits_and_rice_escape():
    vals = [4, 8, -12, 16]  # all divisible by 4 -> 2 wasted bits

    def build(w):
        _frame_header(w, 4, ch_code=0)
        w.write(0, 1)
        w.write(8, 6)  # FIXED order 0: residuals = samples
        w.write(1, 1)  # wasted bits follow
        w.write_unary(2 - 1)  # wasted = 2
        # residual partition via the ESCAPE code: raw 8-bit residuals
        w.write(0, 2)
        w.write(0, 4)
        w.write(15, 4)  # escape
        w.write(8, 5)  # 8 raw bits each
        for v in vals:
            w.write(v >> 2, 8)

    rate, out = decode_flac(_stream(build, n_total=4))
    assert out.tolist() == vals


def test_crc_refusals_and_dispatch():
    s = RNG.randint(-1000, 1000, size=300).astype(np.int16)
    good = bytearray(encode_flac(s, 8000))
    bad = good.copy()
    bad[-1] ^= 0xFF  # frame CRC-16
    with pytest.raises(CodecError, match="CRC-16"):
        decode_flac(bytes(bad))
    with pytest.raises(CodecError, match="magic"):
        decode_flac(b"OggS not flac")
    from fsql_spark.operators.multimodal import decode_audio

    rate, out = decode_audio(bytes(good))
    assert rate == 8000 and (out == s).all()
    with pytest.raises(NotImplementedError, match="external codec"):
        decode_audio(b"ID3\x04 mp3 here")


def test_flac_payload_not_larger_than_wav(spark):
    """Text-derived samples (byte*256 steps) are only weakly correlated,
    so the win is small — but the fixed predictors must at least not
    LOSE to the raw container (real audio compresses hard, asserted in
    test_compression_is_real)."""
    import pandas as pd

    from fsql_spark.operators.multimodal import pack_flac, pack_wav

    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1], "text": ["the quick brown fox " * 40]})
    )
    flac_len = len(bytes(pack_flac(docs).collect()[0]["content"]))
    wav_len = len(bytes(pack_wav(docs).collect()[0]["content"]))
    assert flac_len < wav_len


def test_partitioned_rice_first_partition_short():
    """RFC 9639 §9.2.7: with partition order > 0 the FIRST partition is
    short by the predictor order — the layout every real libflac file
    uses (review find: the symmetric-split reading rejected them)."""
    # fixed order 1, block 8, partition order 1: partitions of 3 and 4
    x = [10, 11, 13, 16, 20, 25, 31, 38]  # residuals 1..7 under order-1
    res = [x[i] - x[i - 1] for i in range(1, 8)]

    def build(w):
        _frame_header(w, 8, ch_code=0)
        w.write(0, 1)
        w.write(8 + 1, 6)  # FIXED order 1
        w.write(0, 1)
        w.write(x[0], 16)  # warmup
        w.write(0, 2)  # 4-bit Rice
        w.write(1, 4)  # partition order 1
        for part in (res[:3], res[3:]):
            w.write(2, 4)  # rice param 2
            for r in part:
                zig = ((-r) << 1) - 1 if r < 0 else (r << 1)
                w.write_unary(zig >> 2)
                w.write(zig & 3, 2)

    rate, out = decode_flac(_stream(build, n_total=8))
    assert out.tolist() == x


def test_encode_block_size_validated():
    s = RNG.randint(-100, 100, size=64).astype(np.int16)
    with pytest.raises(ValueError, match="block_size"):
        encode_flac(s, 8000, block_size=70000)
    with pytest.raises(ValueError, match="block_size"):
        encode_flac(s, 8000, block_size=8)


def test_streaminfo_md5_written_and_verified():
    """Round 10: the encoder writes the RFC 9639 sample MD5 (interleaved
    little-endian signed) and the decoder verifies any nonzero MD5 —
    the one external-arbitration channel FLAC offers in this
    environment. A tampered MD5 must refuse; an all-zero MD5 (legacy
    streams, incl. pre-r10 output of this encoder) must still decode."""
    import hashlib

    import numpy as np

    from fsql_spark.operators.codecs import CodecError
    from fsql_spark.operators.flac import decode_flac, encode_flac

    rng = np.random.RandomState(11)
    mono = rng.randint(-32768, 32768, 900).astype(np.int16)
    stereo = rng.randint(-32768, 32768, (700, 2)).astype(np.int16)
    for s in (mono, stereo):
        data = encode_flac(s, 8000, block_size=256)
        # the MD5 field sits at STREAMINFO body bytes 18..34 = stream
        # offset 4 (magic) + 4 (block header) + 18
        field = data[26:42]
        inter = s.reshape(len(s), -1).astype("<i2").tobytes()
        assert field == hashlib.md5(inter).digest()
        rate, back = decode_flac(data)  # verification path runs
        assert (back == s).all()
        # tamper: flip one MD5 byte -> decode must refuse loudly
        bad = bytearray(data)
        bad[26] ^= 0xFF
        try:
            decode_flac(bytes(bad))
            assert False, "tampered MD5 accepted"
        except CodecError as exc:
            assert "MD5" in str(exc)
        # all-zero MD5 stays accepted (spec: not computed)
        legacy = bytearray(data)
        legacy[26:42] = b"\x00" * 16
        rate, back = decode_flac(bytes(legacy))
        assert (back == s).all()
