"""Native PNG/WAV codec tests: exact round trips across shapes and filter
modes, per-filter unfilter coverage, corrupt-payload refusal, scope gates
(palette/16-bit/interlace/non-PCM), and the distributed decode/resize
pipelines over Spark."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from fsql_spark.operators.codecs import (
    PNG_SIGNATURE,
    CodecError,
    decode_png,
    decode_wav,
    encode_png,
    encode_png_palette,
    encode_wav,
)

SF = "/root/testdata/sf0.001"

RNG = np.random.RandomState(20260814)


@pytest.mark.parametrize("shape", [(1, 1), (3, 5), (17, 32), (6, 4, 3), (5, 5, 4), (2, 9, 2)])
@pytest.mark.parametrize("filters", ["none", "cycle"])
def test_png_round_trip_exact(shape, filters):
    arr = RNG.randint(0, 256, size=shape, dtype=np.uint8)
    out = decode_png(encode_png(arr, filters))
    assert out.shape == arr.shape
    assert (out == arr).all()


def test_png_cycle_mode_exercises_every_filter():
    """filters='cycle' writes rows 0..4 with filter types 0..4 — decoding a
    >=5-row image covers None/Sub/Up/Average/Paeth unfilter paths. Verify
    the filter bytes really differ (guards against an encoder regression
    that silently writes filter 0 everywhere, which would make round-trip
    tests vacuous for filters 1-4)."""
    arr = RNG.randint(0, 256, size=(7, 16, 3), dtype=np.uint8)
    png = encode_png(arr, "cycle")
    # extract the IDAT stream and look at each scanline's filter byte
    pos, idat = len(PNG_SIGNATURE), bytearray()
    while pos < len(png):
        (length,) = struct.unpack(">I", png[pos : pos + 4])
        ctype = png[pos + 4 : pos + 8]
        if ctype == b"IDAT":
            idat.extend(png[pos + 8 : pos + 8 + length])
        pos += 12 + length
    raw = zlib.decompress(bytes(idat))
    stride = 16 * 3
    ftypes = [raw[r * (1 + stride)] for r in range(7)]
    assert ftypes == [0, 1, 2, 3, 4, 0, 1]
    assert (decode_png(png) == arr).all()


def test_png_corrupt_and_scope_refusals():
    arr = RNG.randint(0, 256, size=(8, 8), dtype=np.uint8)
    png = bytearray(encode_png(arr))
    with pytest.raises(CodecError, match="signature"):
        decode_png(b"notapng" + bytes(png))
    flipped = png.copy()
    flipped[45] ^= 0xFF  # inside IDAT payload -> CRC mismatch
    with pytest.raises(CodecError, match="CRC|truncated"):
        decode_png(bytes(flipped))
    with pytest.raises(CodecError, match="truncated|IEND"):
        decode_png(bytes(png[:-6]))

    def ihdr_png(depth=8, color=0, interlace=0):
        ihdr = struct.pack(">IIBBBBB", 4, 4, depth, color, 0, 0, interlace)
        chunk = struct.pack(">I", 13) + b"IHDR" + ihdr + struct.pack(
            ">I", zlib.crc32(b"IHDR" + ihdr) & 0xFFFFFFFF
        )
        end = struct.pack(">I", 0) + b"IEND" + struct.pack(">I", zlib.crc32(b"IEND") & 0xFFFFFFFF)
        return PNG_SIGNATURE + chunk + end

    with pytest.raises(NotImplementedError, match="bit depth 3"):
        decode_png(ihdr_png(depth=3))  # spec-illegal depth refuses loudly
    with pytest.raises(NotImplementedError, match="color type 7"):
        decode_png(ihdr_png(color=7))
    with pytest.raises(NotImplementedError, match="bit depth 16 for color type 3"):
        decode_png(ihdr_png(depth=16, color=3))
    with pytest.raises(CodecError, match="unknown interlace"):
        decode_png(ihdr_png(interlace=2))


@pytest.mark.parametrize(
    "shape", [(1, 1), (7, 5), (9, 17), (16, 16), (23, 31, 3), (10, 12, 4), (6, 9, 2)]
)
@pytest.mark.parametrize("filters", ["none", "cycle"])
def test_png_adam7_round_trip(shape, filters):
    a = RNG.randint(0, 256, size=shape).astype(np.uint8)
    assert (decode_png(encode_png(a, filters=filters, interlace=True)) == a).all()


def test_png_adam7_16bit_and_palette():
    a16 = RNG.randint(0, 65536, size=(11, 13, 3)).astype(np.uint16)
    assert (decode_png(encode_png(a16, interlace=True)) == a16).all()
    idx = RNG.randint(0, 7, size=(21, 13)).astype(np.uint8)
    pal = RNG.randint(0, 256, size=(7, 3)).astype(np.uint8)
    assert (decode_png(encode_png_palette(idx, pal, interlace=True)) == pal[idx]).all()
    out4 = decode_png(
        encode_png_palette(idx, pal, trns=np.array([9, 200], np.uint8), interlace=True)
    )
    assert out4.shape == (21, 13, 4)


def test_png_adam7_truncated_pass_refused():
    a = RNG.randint(0, 256, size=(16, 16)).astype(np.uint8)
    png = bytearray(encode_png(a, interlace=True))
    # recompress a SHORTER stream into the IDAT chunk: structure intact,
    # pass payload missing -> size-mismatch refusal (not garbage pixels)
    import struct as _s
    import zlib as _z

    pos = len(PNG_SIGNATURE)
    out = bytearray(PNG_SIGNATURE)
    while pos < len(png):
        (length,) = _s.unpack(">I", png[pos : pos + 4])
        ctype = bytes(png[pos + 4 : pos + 8])
        payload = bytes(png[pos + 8 : pos + 8 + length])
        if ctype == b"IDAT":
            payload = _z.compress(_z.decompress(payload)[:-40], 6)
        crc = _s.pack(">I", _z.crc32(ctype + payload) & 0xFFFFFFFF)
        out += _s.pack(">I", len(payload)) + ctype + payload + crc
        pos += 12 + length
    with pytest.raises(CodecError, match="size mismatch"):
        decode_png(bytes(out))


def test_png_palette_round_trip():
    idx = RNG.randint(0, 7, size=(23, 17)).astype(np.uint8)
    pal = RNG.randint(0, 256, size=(7, 3)).astype(np.uint8)
    out = decode_png(encode_png_palette(idx, pal))
    assert out.shape == (23, 17, 3) and (out == pal[idx]).all()
    # tRNS alpha: listed entries take their alpha, the rest are opaque
    trns = np.array([0, 128, 255], dtype=np.uint8)
    out4 = decode_png(encode_png_palette(idx, pal, trns=trns))
    alut = np.full(7, 255, np.uint8)
    alut[:3] = trns
    assert out4.shape == (23, 17, 4)
    assert (out4[:, :, :3] == pal[idx]).all() and (out4[:, :, 3] == alut[idx]).all()


def test_png_palette_refusals():
    idx = np.zeros((4, 4), dtype=np.uint8)
    pal = np.zeros((2, 3), dtype=np.uint8)
    with pytest.raises(ValueError, match="index out of range"):
        encode_png_palette(np.full((4, 4), 9, np.uint8), pal)
    # decode-side out-of-range: encode with a big palette, then shrink PLTE
    big = encode_png_palette(np.full((4, 4), 5, np.uint8), RNG.randint(0, 256, (6, 3)).astype(np.uint8))
    # rebuild with a 2-entry PLTE but the same IDAT (indices now exceed it)
    chunks = []
    pos = len(PNG_SIGNATURE)
    while pos < len(big):
        (length,) = struct.unpack(">I", big[pos : pos + 4])
        ctype = big[pos + 4 : pos + 8]
        payload = big[pos + 8 : pos + 8 + length]
        if ctype == b"PLTE":
            payload = payload[:6]
        crc = struct.pack(">I", zlib.crc32(ctype + payload) & 0xFFFFFFFF)
        chunks.append(struct.pack(">I", len(payload)) + ctype + payload + crc)
        pos += 12 + length
    with pytest.raises(CodecError, match="palette index 5 out of range"):
        decode_png(PNG_SIGNATURE + b"".join(chunks))
    # palette image with no PLTE at all
    no_plte = [c for c in chunks if c[4:8] != b"PLTE"]
    with pytest.raises(CodecError, match="missing PLTE"):
        decode_png(PNG_SIGNATURE + b"".join(no_plte))


@pytest.mark.parametrize("shape", [(9, 13), (9, 13, 3), (5, 4, 4), (1, 1)])
@pytest.mark.parametrize("filters", ["none", "cycle"])
def test_png_16bit_round_trip(shape, filters):
    a16 = RNG.randint(0, 65536, size=shape).astype(np.uint16)
    got = decode_png(encode_png(a16, filters=filters))
    assert got.dtype == np.uint16 and got.shape == a16.shape and (got == a16).all()


@pytest.mark.parametrize(
    "dtype,shape",
    [(np.int16, (100,)), (np.uint8, (100,)), (np.int16, (50, 2)), (np.uint8, (33, 3))],
)
def test_wav_round_trip_exact(dtype, shape):
    if dtype == np.int16:
        s = RNG.randint(-32768, 32768, size=shape).astype(np.int16)
    else:
        s = RNG.randint(0, 256, size=shape).astype(np.uint8)
    rate, out = decode_wav(encode_wav(s, 44100))
    assert rate == 44100
    assert out.dtype == dtype and out.shape == s.shape
    assert (out == s).all()


def test_wav_refusals():
    with pytest.raises(CodecError, match="RIFF"):
        decode_wav(b"OggS not a wav")
    s = RNG.randint(0, 256, size=(10,)).astype(np.uint8)
    wav = bytearray(encode_wav(s, 8000))
    # flip PCM format code to ADPCM (offset: RIFF(12) + 'fmt '+size(8))
    wav[20] = 2
    with pytest.raises(NotImplementedError, match="PCM/float"):
        decode_wav(bytes(wav))
    # float format code with a non-float bit width refuses too
    wav[20] = 3
    with pytest.raises(NotImplementedError, match="float samples"):
        decode_wav(bytes(wav))
    with pytest.raises(ValueError, match="encode_wav needs"):
        encode_wav(s.astype(np.int8), 8000)
    with pytest.raises(ValueError, match="sample_rate"):
        encode_wav(s, 0)


@pytest.mark.parametrize("case", ["i24", "i24stereo", "i32", "f32", "f64"])
def test_wav_extended_formats_round_trip(case):
    if case == "i24":
        s = RNG.randint(-(1 << 23), 1 << 23, size=200).astype(np.int32)
        s[:2] = [-(1 << 23), (1 << 23) - 1]
        kw = {"bits": 24}
    elif case == "i24stereo":
        s = RNG.randint(-(1 << 23), 1 << 23, size=(60, 2)).astype(np.int32)
        kw = {"bits": 24}
    elif case == "i32":
        s = RNG.randint(-(2**31), 2**31, size=64).astype(np.int32)
        kw = {}
    elif case == "f32":
        s = RNG.standard_normal(64).astype(np.float32)
        kw = {}
    else:
        s = RNG.standard_normal(64).astype(np.float64)
        kw = {}
    rate, out = decode_wav(encode_wav(s, 48000, **kw))
    assert rate == 48000 and out.dtype == s.dtype and out.shape == s.shape
    assert (out == s).all()
    if case == "i24":
        with pytest.raises(ValueError, match="must fit"):
            encode_wav(np.array([1 << 23], np.int32), 8000, bits=24)


def test_wav_odd_data_chunk_is_word_aligned():
    """An odd-length 8-bit mono payload forces the spec's pad byte; the
    parser must honor word alignment when walking chunks after data."""
    s = RNG.randint(0, 256, size=(7,)).astype(np.uint8)
    wav = encode_wav(s, 8000)
    assert len(wav) % 2 == 0
    rate, out = decode_wav(wav)
    assert (out == s).all()


def test_decode_image_dispatches_png_natively(spark):
    from fsql_spark.operators.multimodal import decode_image

    arr = RNG.randint(0, 256, size=(6, 9, 3), dtype=np.uint8)
    assert (decode_image(encode_png(arr, "cycle")) == arr).all()


def test_decode_audio_dispatch():
    from fsql_spark.operators.multimodal import decode_audio

    s = RNG.randint(-1000, 1000, size=(40,)).astype(np.int16)
    rate, out = decode_audio(encode_wav(s, 16000))
    assert rate == 16000 and (out == s).all()
    with pytest.raises(NotImplementedError, match="RIFF/WAVE"):
        decode_audio(b"\x00\x01\x02")


def test_resize_images_real_png_path(spark):
    """Distributed resize: decode -> nearest-neighbor -> re-encode; verify
    each output PNG against the numpy reference sampling of the source."""
    from fsql_spark.operators.multimodal import documents_as_png, resize_images

    media = documents_as_png(spark, SF, width=32).limit(6)
    src = {r["media_id"]: bytes(r["content"]) for r in media.collect()}
    out = resize_images(media, width=8, height=8).collect()
    assert len(out) == len(src)
    for r in out:
        assert r["width"] == 8 and r["height"] == 8
        got = decode_png(bytes(r["content"]))
        ref = decode_png(src[r["media_id"]])
        h, w = ref.shape[0], ref.shape[1]
        rows = np.minimum((np.arange(8) * h) // 8, h - 1)
        cols = np.minimum((np.arange(8) * w) // 8, w - 1)
        assert (got == ref[np.ix_(rows, cols)]).all()


def test_resize_images_rejects_bad_size(spark):
    from fsql_spark.operators.multimodal import documents_as_png, resize_images

    with pytest.raises(ValueError, match="target size"):
        resize_images(documents_as_png(spark, SF), 0, 8)


def test_decode_image_stats_matches_source_bytes(spark):
    """The decode entry's pixel md5 equals md5 of the '.'-padded text —
    i.e. the full encode->deflate->inflate->unfilter chain is lossless."""
    import hashlib
    import math

    from fsql_spark.operators.multimodal import decode_image_stats, documents_as_png

    docs = {r["doc_id"]: r["text"] for r in
            spark.read.parquet(f"{SF}/documents.parquet").limit(10).collect()}
    media = documents_as_png(spark, SF, width=32).where("media_id < 10")
    stats = decode_image_stats(media).collect()
    assert len(stats) == len([d for d in docs if d < 10])
    for r in stats:
        b = (docs[r["media_id"]] or "").encode()
        n = max(1, math.ceil(len(b) / 32))
        padded = b.ljust(n * 32, b".")
        assert r["width"] == 32 and r["height"] == n
        assert r["n_pixels"] == n * 32
        assert r["px_sum"] == sum(padded)
        assert r["px_md5"] == hashlib.md5(padded).hexdigest()


# ---------------------------------------------------------------------------
# property tests: pure-Python codecs, no Spark jobs -> generous example count
# ---------------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=25, deadline=None)
@given(
    h=st.integers(min_value=1, max_value=9),
    w=st.integers(min_value=1, max_value=9),
    c=st.sampled_from([0, 2, 3, 4]),  # 0 = 2-D gray
    filters=st.sampled_from(["none", "cycle"]),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_png_round_trip_property(h, w, c, filters, seed):
    rng = np.random.RandomState(seed)
    shape = (h, w) if c == 0 else (h, w, c)
    arr = rng.randint(0, 256, size=shape, dtype=np.uint8)
    out = decode_png(encode_png(arr, filters))
    assert out.shape == arr.shape and (out == arr).all()


@settings(max_examples=25, deadline=None)
@given(
    n=st.integers(min_value=0, max_value=200),
    ch=st.integers(min_value=1, max_value=3),
    bits16=st.booleans(),
    rate=st.integers(min_value=1, max_value=96000),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_wav_round_trip_property(n, ch, bits16, rate, seed):
    rng = np.random.RandomState(seed)
    shape = (n,) if ch == 1 else (n, ch)
    s = (
        rng.randint(-32768, 32768, size=shape).astype(np.int16)
        if bits16
        else rng.randint(0, 256, size=shape).astype(np.uint8)
    )
    got_rate, out = decode_wav(encode_wav(s, rate))
    assert got_rate == rate and out.shape == s.shape and (out == s).all()


@settings(max_examples=50, deadline=None)
@given(junk=st.binary(min_size=0, max_size=300), prefix=st.sampled_from([b"", PNG_SIGNATURE, b"RIFF"]))
def test_codecs_refuse_arbitrary_garbage(junk, prefix):
    """Crawl payloads are adversarial: any byte string must produce a typed
    refusal (CodecError / NotImplementedError), never a hang, wrong-type
    error, or silent success, including when it starts with a valid magic."""
    data = prefix + junk
    for dec in (decode_png, decode_wav):
        # MUST raise: a regression that returns None/garbage for malformed
        # bytes would otherwise pass silently (random junk cannot satisfy
        # PNG per-chunk CRCs or a RIFF/WAVE fmt+data layout)
        with pytest.raises((CodecError, NotImplementedError)):
            dec(data)


@pytest.mark.parametrize("depth", [1, 2, 4])
@pytest.mark.parametrize("filters", ["none", "cycle"])
def test_png_subbyte_gray_round_trip(depth, filters):
    # widths that do NOT divide the samples-per-byte evenly (padding bits)
    a = RNG.randint(0, 1 << depth, size=(13, 21)).astype(np.uint8)
    got = decode_png(encode_png(a, filters=filters, depth=depth))
    assert got.shape == a.shape and (got == a).all()


@pytest.mark.parametrize("depth", [1, 2, 4])
def test_png_subbyte_palette_round_trip(depth):
    npal = 1 << depth
    idx = RNG.randint(0, npal, size=(9, 31)).astype(np.uint8)
    pal = RNG.randint(0, 256, size=(npal, 3)).astype(np.uint8)
    assert (decode_png(encode_png_palette(idx, pal, depth=depth)) == pal[idx]).all()


def test_png_subbyte_refusals():
    a = RNG.randint(0, 2, size=(4, 4)).astype(np.uint8)
    with pytest.raises(ValueError, match="fit in 1 bits"):
        encode_png(np.full((4, 4), 2, np.uint8), depth=1)
    with pytest.raises(ValueError, match="Adam7"):
        encode_png(a, depth=1, interlace=True)
    with pytest.raises(ValueError, match="single-channel"):
        encode_png(RNG.randint(0, 2, (4, 4, 3)).astype(np.uint8), depth=1)
    with pytest.raises(ValueError, match="palette depth"):
        encode_png_palette(a, np.zeros((2, 3), np.uint8), depth=3)


def test_g711_matches_cpython_audioop():
    """decode_mulaw/decode_alaw match CPython's audioop G.711 expansion
    byte-for-byte across all 256 codes — an INDEPENDENT reference
    implementation, not a round trip of our own code."""
    import warnings

    from fsql_spark.operators.codecs import decode_alaw, decode_mulaw

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")  # audioop is deprecated, not gone
        try:
            import audioop
        except ImportError:
            pytest.skip("audioop removed from this Python")
    codes = np.arange(256, dtype=np.uint8)
    ref_u = np.frombuffer(audioop.ulaw2lin(codes.tobytes(), 2), dtype="<i2")
    ref_a = np.frombuffer(audioop.alaw2lin(codes.tobytes(), 2), dtype="<i2")
    assert (decode_mulaw(codes) == ref_u).all()
    assert (decode_alaw(codes) == ref_a).all()


def test_au_and_g711_wav_paths():
    import struct as _s

    from fsql_spark.operators.codecs import decode_au, decode_mulaw

    codes = np.arange(256, dtype=np.uint8)
    hdr = b".snd" + _s.pack(">IIIII", 24, 256, 1, 8000, 1)
    rate, s = decode_au(hdr + codes.tobytes())
    assert rate == 8000 and (s == decode_mulaw(codes)).all()
    # 16-bit big-endian linear, stereo
    pcm = RNG.randint(-32768, 32768, size=(50, 2)).astype(np.int16)
    hdr2 = b".snd" + _s.pack(">IIIII", 24, pcm.size * 2, 3, 44100, 2)
    rate2, s2 = decode_au(hdr2 + pcm.astype(">i2").tobytes())
    assert rate2 == 44100 and s2.shape == (50, 2) and (s2 == pcm).all()
    # WAV format 7 (mu-law): expand through the WAV chunk path
    wav = bytearray(encode_wav(codes, 8000))
    wav[20] = 7
    _, s3 = decode_wav(bytes(wav))
    assert (s3 == decode_mulaw(codes)).all()
    with pytest.raises(CodecError, match="not a Sun"):
        decode_au(b"RIFFnope")
    with pytest.raises(NotImplementedError, match="encoding 23"):
        decode_au(b".snd" + _s.pack(">IIIII", 24, 0, 23, 8000, 1))


def test_decode_audio_dispatches_au():
    from fsql_spark.operators.codecs import decode_mulaw
    from fsql_spark.operators.multimodal import decode_audio
    import struct as _s

    codes = np.arange(64, dtype=np.uint8)
    hdr = b".snd" + _s.pack(">IIIII", 24, 64, 1, 8000, 1)
    rate, s = decode_audio(hdr + codes.tobytes())
    assert rate == 8000 and (s == decode_mulaw(codes)).all()
    with pytest.raises(NotImplementedError, match="compressed audio"):
        decode_audio(b"ID3\x04 mp3 frames here")


def test_lossless_containers_agree_pixelwise():
    """The same RGB array shipped through every lossless container must
    decode to identical pixels — one dispatch test covering the whole
    image-codec family."""
    from fsql_spark.operators.bmp import encode_bmp
    from fsql_spark.operators.gif import encode_gif
    from fsql_spark.operators.multimodal import decode_image
    from fsql_spark.operators.tiff import encode_tiff

    idx = RNG.randint(0, 16, size=(13, 17)).astype(np.uint8)
    pal = RNG.randint(0, 256, size=(16, 3)).astype(np.uint8)
    rgb = pal[idx]
    payloads = [
        encode_png(rgb),
        encode_png_palette(idx, pal),
        encode_gif(idx, pal, interlace=True),
        encode_bmp(rgb),
        encode_tiff(rgb, compression="lzw"),
        encode_tiff(rgb, compression="packbits"),
    ]
    for p in payloads:
        assert (decode_image(p) == rgb).all()


def test_resize_dispatches_any_container(spark):
    """resize_images consumes whatever decode_image can decode — a JPEG
    or TIFF payload resizes exactly like the PNG twin."""
    from fsql_spark.operators.jpeg import decode_jpeg, encode_jpeg
    from fsql_spark.operators.multimodal import decode_image, resize_images
    from fsql_spark.operators.tiff import encode_tiff

    a = np.repeat(np.repeat(RNG.randint(0, 256, (4, 4)).astype(np.uint8), 8, 0), 8, 1)
    jp = encode_jpeg(a, quality=50)
    expect = decode_jpeg(jp)  # resize source = the decoded (lossy) pixels
    media = spark.createDataFrame(
        [(1, bytearray(jp)), (2, bytearray(encode_tiff(a)))],
        "media_id: long, content: binary",
    )
    out = {r["media_id"]: r for r in resize_images(media, 8, 8).collect()}
    rows = np.minimum(np.arange(8) * 32 // 8, 31)
    got1 = decode_image(bytes(out[1]["content"]))
    assert (got1 == expect[np.ix_(rows, rows)]).all()
    got2 = decode_image(bytes(out[2]["content"]))
    assert (got2 == a[np.ix_(rows, rows)]).all()


# --------------------------------------------------------------------------
# AIFF / AIFF-C
# --------------------------------------------------------------------------

def test_aiff_round_trip_dtypes_and_channels():
    from fsql_spark.operators.codecs import decode_aiff, encode_aiff

    rng = np.random.default_rng(8)
    for dtype, lo, hi in ((np.int8, -128, 128), (np.int16, -(1 << 15), 1 << 15),
                          (np.int32, -(1 << 31), 1 << 31)):
        mono = rng.integers(lo, hi, 257).astype(dtype)
        rate, out = decode_aiff(encode_aiff(mono, 44100))
        assert rate == 44100 and out.dtype == dtype and out.tolist() == mono.tolist()
        stereo = rng.integers(lo, hi, (64, 2)).astype(dtype)
        _rate, out2 = decode_aiff(encode_aiff(stereo, 8000))
        assert out2.shape == (64, 2) and out2.tolist() == stereo.tolist()


def test_aiff_extended_float_rate_exact():
    from fsql_spark.operators.codecs import _f80_decode, _f80_encode

    for rate in (1, 7, 8000, 11025, 22050, 44100, 48000, 192000, (1 << 62)):
        assert _f80_decode(_f80_encode(rate)) == rate


def test_aifc_sowt_little_endian_decodes():
    import struct

    from fsql_spark.operators.codecs import CodecError, decode_aiff, encode_aiff

    samples = np.array([1, -2, 300, -400], dtype=np.int16)
    data = bytearray(encode_aiff(samples, 8000))
    # rewrite as AIFC/sowt: FORM type + COMM gains a compression field, and
    # the payload flips to little-endian
    comm = struct.pack(">HIH", 1, 4, 16) + data[28:38] + b"sowt"
    ssnd = struct.pack(">II", 0, 0) + samples.astype("<i2").tobytes()
    def chunk(cid, payload):
        pad = b"\x00" if len(payload) & 1 else b""
        return cid + struct.pack(">I", len(payload)) + payload + pad
    body = b"AIFC" + chunk(b"COMM", comm) + chunk(b"SSND", ssnd)
    out = b"FORM" + struct.pack(">I", len(body)) + body
    rate, dec = decode_aiff(out)
    assert rate == 8000 and dec.tolist() == samples.tolist()
    # compressed AIFC types refuse loudly
    body2 = body.replace(b"sowt", b"ima4")
    with pytest.raises(NotImplementedError, match="ima4"):
        decode_aiff(b"FORM" + struct.pack(">I", len(body2)) + body2)


def test_aiff_refusals():
    from fsql_spark.operators.codecs import CodecError, decode_aiff, encode_aiff

    samples = np.arange(16, dtype=np.int16)
    good = encode_aiff(samples, 8000)
    with pytest.raises(CodecError, match="IFF FORM"):
        decode_aiff(b"FORM" + good[4:8] + b"WAVE" + good[12:])
    with pytest.raises(CodecError, match="truncated"):
        decode_aiff(good[:-3])
    with pytest.raises(CodecError):
        decode_aiff(good[:11])


def test_decode_audio_dispatches_aiff():
    from fsql_spark.operators.codecs import encode_aiff
    from fsql_spark.operators.multimodal import decode_audio

    samples = np.array([5, -6, 7], dtype=np.int16)
    rate, out = decode_audio(encode_aiff(samples, 8000))
    assert rate == 8000 and out.tolist() == samples.tolist()


def test_webp_decodes_via_pillow_when_installed():
    """The OTHER half of the decided WebP position: refusal without Pillow
    is pinned in test_operators.py; HERE, when Pillow IS installed, a real
    lossless WebP must decode through decode_image's fallback to the same
    ndarray contract the native codecs honor (pixel-exact, uint8, (H,W,C)).
    Skipped in the bare container — executable wherever a user adds
    Pillow."""
    PIL = pytest.importorskip("PIL.Image")
    import io

    from fsql_spark.operators.multimodal import decode_image

    rng = np.random.default_rng(88)
    arr = rng.integers(0, 256, (9, 13, 3)).astype(np.uint8)
    buf = io.BytesIO()
    PIL.fromarray(arr).save(buf, format="WEBP", lossless=True)
    out = decode_image(buf.getvalue())
    assert out.dtype == np.uint8 and out.shape == (9, 13, 3)
    assert np.array_equal(out, arr)
