"""Baseline TIFF codec tests: exact round trips (gray/RGB/RGBA,
uncompressed + PackBits), both byte orders, photometric inversion,
multi-strip files, refusals, decode_image dispatch."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from fsql_spark.operators.codecs import CodecError
from fsql_spark.operators.tiff import decode_tiff, encode_tiff

RNG = np.random.RandomState(20260814)


@pytest.mark.parametrize("shape", [(1, 1), (7, 5), (9, 17), (23, 31, 3), (6, 4, 4)])
@pytest.mark.parametrize("packbits", [False, True])
def test_round_trip_exact(shape, packbits):
    a = RNG.randint(0, 256, size=shape).astype(np.uint8)
    got = decode_tiff(encode_tiff(a, packbits=packbits))
    assert got.shape == a.shape and (got == a).all()


def test_packbits_run_heavy():
    runs = np.repeat(RNG.randint(0, 256, 40), RNG.randint(1, 200, size=40))[:2992]
    img = runs.astype(np.uint8).reshape(44, 68)
    assert (decode_tiff(encode_tiff(img, packbits=True)) == img).all()


def _mm_file(a, photometric=1, extra_tag=None):
    def tag(tid, tt, cnt, val):
        if tt == 3:
            return struct.pack(">HHIHH", tid, tt, cnt, val, 0)
        return struct.pack(">HHII", tid, tt, cnt, val)

    h, w = a.shape
    tags = [
        tag(256, 3, 1, w), tag(257, 3, 1, h), tag(259, 3, 1, 1),
        tag(262, 3, 1, photometric),
    ]
    if extra_tag is not None:
        tags.append(extra_tag(tag))
    n = len(tags) + 2
    data_off = 8 + 2 + n * 12 + 4
    tags.append(tag(273, 4, 1, data_off))
    tags.append(tag(279, 4, 1, h * w))
    body = struct.pack(">H", len(tags)) + b"".join(tags) + struct.pack(">I", 0)
    return b"MM\x00\x2a" + struct.pack(">I", 8) + body + a.tobytes()


def test_big_endian_and_photometric():
    a = RNG.randint(0, 256, size=(3, 5)).astype(np.uint8)
    assert (decode_tiff(_mm_file(a, photometric=1)) == a).all()
    assert (decode_tiff(_mm_file(a, photometric=0)) == 255 - a).all()


def test_multi_strip():
    # two strips of 2 rows each (little-endian writer only emits one, so
    # patch RowsPerStrip + strips by hand through the MM path)
    a = RNG.randint(0, 256, size=(4, 6)).astype(np.uint8)

    def tag(tid, tt, cnt, val):
        if tt == 3:
            return struct.pack(">HHIHH", tid, tt, cnt, val, 0)
        return struct.pack(">HHII", tid, tt, cnt, val)

    n = 8
    hdr = 8 + 2 + n * 12 + 4
    off_tbl = hdr
    cnt_tbl = hdr + 8
    data = cnt_tbl + 8
    tags = [
        tag(256, 3, 1, 6), tag(257, 3, 1, 4), tag(259, 3, 1, 1),
        tag(262, 3, 1, 1), tag(273, 4, 2, off_tbl), tag(277, 3, 1, 1),
        tag(278, 3, 1, 2), tag(279, 4, 2, cnt_tbl),
    ]
    body = struct.pack(">H", n) + b"".join(tags) + struct.pack(">I", 0)
    body += struct.pack(">II", data, data + 12)
    body += struct.pack(">II", 12, 12)
    out = b"MM\x00\x2a" + struct.pack(">I", 8) + body + a.tobytes()
    assert (decode_tiff(out) == a).all()


def test_refusals():
    with pytest.raises(CodecError, match="byte-order"):
        decode_tiff(b"XXnothing")
    a = RNG.randint(0, 256, size=(4, 4)).astype(np.uint8)
    good = bytearray(encode_tiff(a))
    with pytest.raises(CodecError):
        decode_tiff(bytes(good[:-5]))
    old_jp = bytes(good).replace(struct.pack("<HHIHH", 259, 3, 1, 1, 0),
                                 struct.pack("<HHIHH", 259, 3, 1, 6, 0))
    with pytest.raises(NotImplementedError, match="old-JPEG"):
        decode_tiff(old_jp)
    # LZW and JPEG-in-TIFF are in scope now: garbage streams under those
    # codes refuse with CodecError, not NotImplementedError
    for code in (5, 7):
        bad = bytes(good).replace(struct.pack("<HHIHH", 259, 3, 1, 1, 0),
                                  struct.pack("<HHIHH", 259, 3, 1, code, 0))
        with pytest.raises(CodecError):
            decode_tiff(bad)
    # tiles are in scope now — but an incomplete tile tag set refuses
    tiled = _mm_file(a, extra_tag=lambda tag: tag(322, 3, 1, 16))
    with pytest.raises(CodecError, match="missing required tag"):
        decode_tiff(tiled)
    pal = _mm_file(a, photometric=3)
    with pytest.raises(NotImplementedError, match="palette"):
        decode_tiff(pal)
    with pytest.raises(ValueError, match="uint8"):
        encode_tiff(a.astype(np.float32))


def test_decode_image_dispatch():
    from fsql_spark.operators.multimodal import decode_image

    a = RNG.randint(0, 256, size=(11, 13, 3)).astype(np.uint8)
    assert (decode_image(encode_tiff(a, packbits=True)) == a).all()


@pytest.mark.parametrize("comp", ["lzw", "deflate"])
def test_lzw_and_deflate_round_trips(comp):
    for shape in [(1, 1), (9, 17), (23, 31, 3), (64, 64, 4)]:
        a = RNG.randint(0, 256, size=shape).astype(np.uint8)
        got = decode_tiff(encode_tiff(a, compression=comp))
        assert got.shape == a.shape and (got == a).all(), (comp, shape)
    # multiple LZW clear cycles (table fills past 12 bits on random data)
    big = RNG.randint(0, 256, size=(200, 211)).astype(np.uint8)
    assert (decode_tiff(encode_tiff(big, compression=comp)) == big).all()
    # highly compressible text-like content (deep table chains, KwKwK)
    text = (b"the quick brown fox " * 800)[:12000]
    timg = np.frombuffer(text, np.uint8).reshape(100, 120)
    assert (decode_tiff(encode_tiff(timg, compression=comp)) == timg).all()


def test_encode_compression_args():
    a = RNG.randint(0, 256, size=(4, 4)).astype(np.uint8)
    assert decode_tiff(encode_tiff(a, packbits=True)).tolist() == a.tolist()
    with pytest.raises(ValueError, match="not both"):
        encode_tiff(a, packbits=True, compression="lzw")
    with pytest.raises(ValueError, match="unsupported compression"):
        encode_tiff(a, compression="ccitt")


def _jpeg_tiff(strip_bytes, w, h, spp, tables=None):
    def tag(t, tt, cnt, val):
        if tt == 3:
            return struct.pack("<HHIHH", t, tt, cnt, val, 0)
        return struct.pack("<HHII", t, tt, cnt, val)

    tags = [
        (256, 3, 1, w), (257, 3, 1, h), (259, 3, 1, 7), (262, 3, 1, 6 if spp == 3 else 1),
        (277, 3, 1, spp), (278, 3, 1, h),
    ]
    n = len(tags) + 2 + (1 if tables else 0)
    hdr_end = 8 + 2 + n * 12 + 4
    tbl_off = hdr_end
    data_off = tbl_off + (len(tables) if tables else 0)
    entries = [tag(*t) for t in tags]
    entries.append(tag(273, 4, 1, data_off))
    entries.append(tag(279, 4, 1, len(strip_bytes)))
    if tables:
        entries.append(tag(347, 7, len(tables), tbl_off))
    entries.sort(key=lambda e: struct.unpack("<H", e[:2])[0])
    body = struct.pack("<H", n) + b"".join(entries) + struct.pack("<I", 0)
    out = b"II*\x00" + struct.pack("<I", 8) + body
    if tables:
        out += tables
    return out + strip_bytes


def test_jpeg_in_tiff():
    from fsql_spark.operators.jpeg import decode_jpeg, encode_jpeg

    a = RNG.randint(0, 256, size=(24, 17)).astype(np.uint8)
    jp = encode_jpeg(a, quality=85)
    expect = decode_jpeg(jp)
    got = decode_tiff(_jpeg_tiff(jp, 17, 24, 1))
    assert (got == expect).all()
    # color strip declared as YCbCr photometric
    c = RNG.randint(0, 256, size=(16, 16, 3)).astype(np.uint8)
    jpc = encode_jpeg(c, quality=85)
    assert (decode_tiff(_jpeg_tiff(jpc, 16, 16, 3)) == decode_jpeg(jpc)).all()


def test_jpeg_in_tiff_shared_tables():
    from fsql_spark.operators.jpeg import decode_jpeg, encode_jpeg

    a = RNG.randint(0, 256, size=(16, 24)).astype(np.uint8)
    full = bytes(encode_jpeg(a, quality=85))
    # split the stream: DQT/DHT into JPEGTables, the rest into the strip
    pos, tables, strip = 2, b"", b"\xff\xd8"
    while pos + 4 <= len(full):
        marker = full[pos + 1]
        if marker == 0xD9:
            strip += full[pos:]
            break
        (ln,) = struct.unpack(">H", full[pos + 2 : pos + 4])
        segment = full[pos : pos + 2 + ln]
        if marker in (0xDB, 0xC4):
            tables += segment
        else:
            strip += segment
        if marker == 0xDA:  # entropy data follows the SOS header
            end = full.rindex(b"\xff\xd9")
            strip += full[pos + 2 + ln : end + 2]
            break
        pos += 2 + ln
    tbl_stream = b"\xff\xd8" + tables + b"\xff\xd9"
    got = decode_tiff(_jpeg_tiff(strip, 24, 16, 1, tables=tbl_stream))
    assert (got == decode_jpeg(full)).all()


@pytest.mark.parametrize("comp", ["lzw", "deflate"])
def test_predictor_2_round_trip_and_wins(comp):
    """Horizontal differencing (tag 317=2, the libtiff default) round
    trips exactly and genuinely improves compression on smooth content."""
    grad = np.clip(np.add.outer(np.arange(40), np.arange(50)) * 2, 0, 255).astype(np.uint8)
    plain = encode_tiff(grad, compression=comp)
    pred = encode_tiff(grad, compression=comp, predictor=True)
    assert (decode_tiff(pred) == grad).all()
    assert len(pred) < len(plain)  # deltas compress better
    rgb = np.dstack([grad, grad[::-1], grad]).astype(np.uint8)
    assert (decode_tiff(encode_tiff(rgb, compression=comp, predictor=True)) == rgb).all()
    with pytest.raises(ValueError, match="predictor requires"):
        encode_tiff(grad, predictor=True)


def test_large_dimensions_encode_as_long():
    # dims > 65535 must not crash struct.pack (SHORT) — LONG fields now
    tall = np.zeros((70000, 2), np.uint8)
    out = decode_tiff(encode_tiff(tall, compression="deflate"))
    assert out.shape == (70000, 2)


def test_jpeg_in_tiff_min_is_white_inverts():
    from fsql_spark.operators.jpeg import decode_jpeg, encode_jpeg

    a = np.full((8, 8), 200, np.uint8)
    jp = encode_jpeg(a, quality=50)
    f = bytearray(_jpeg_tiff(jp, 8, 8, 1))
    # flip photometric 1 -> 0 (min-is-white)
    i = bytes(f).find(struct.pack("<HHIHH", 262, 3, 1, 1, 0))
    assert i > 0
    f[i : i + 12] = struct.pack("<HHIHH", 262, 3, 1, 0, 0)
    assert (decode_tiff(bytes(f)) == 255 - decode_jpeg(jp)).all()


def test_jpeg_in_tiff_spp_mismatch_refused():
    from fsql_spark.operators.jpeg import encode_jpeg

    gray = encode_jpeg(np.full((8, 8), 90, np.uint8), quality=50)
    with pytest.raises(CodecError, match="disagrees with SamplesPerPixel"):
        decode_tiff(_jpeg_tiff(gray, 8, 8, 3))



def _tile_tiff(w, h, tw, th, tiles, compression=1, spp=1, predictor=False):
    """Hand-build a little-endian tiled TIFF from per-tile payload bytes."""
    def tag(t, tt, cnt, val):
        if tt == 3:
            return struct.pack("<HHIHH", t, tt, cnt, val, 0)
        return struct.pack("<HHII", t, tt, cnt, val)

    n_tags = 9 + (1 if spp > 1 else 0) + (1 if predictor else 0)
    hdr_end = 8 + 2 + n_tags * 12 + 4
    off_tbl = hdr_end
    cnt_tbl = off_tbl + 4 * len(tiles)
    data_start = cnt_tbl + 4 * len(tiles)
    offs, poss = [], data_start
    for t in tiles:
        offs.append(poss)
        poss += len(t)
    entries = [
        tag(256, 4, 1, w), tag(257, 4, 1, h), tag(258, 3, 1, 8),
        tag(259, 3, 1, compression), tag(262, 3, 1, 1 if spp == 1 else 2),
        tag(322, 3, 1, tw), tag(323, 3, 1, th),
        tag(324, 4, len(tiles), off_tbl), tag(325, 4, len(tiles), cnt_tbl),
    ]
    if spp > 1:
        entries.append(tag(277, 3, 1, spp))
    if predictor:
        entries.append(tag(317, 3, 1, 2))
    entries.sort(key=lambda e: struct.unpack("<H", e[:2])[0])
    body = struct.pack("<H", n_tags) + b"".join(entries) + struct.pack("<I", 0)
    body += b"".join(struct.pack("<I", o) for o in offs)
    body += b"".join(struct.pack("<I", len(t)) for t in tiles)
    return b"II*\x00" + struct.pack("<I", 8) + body + b"".join(tiles)


def test_tiled_round_trip():
    from fsql_spark.operators.tiff import _tiff_lzw_encode

    a = RNG.randint(0, 256, size=(10, 13)).astype(np.uint8)
    tw, th = 8, 4
    tiles = []
    for ty in range(3):
        for tx in range(2):
            pad = np.zeros((th, tw), np.uint8)
            sub = a[ty * th : (ty + 1) * th, tx * tw : (tx + 1) * tw]
            pad[: sub.shape[0], : sub.shape[1]] = sub
            tiles.append(pad.tobytes())
    assert (decode_tiff(_tile_tiff(13, 10, tw, th, tiles)) == a).all()
    # LZW-compressed tiles with per-tile predictor
    tiles_lzw = []
    for ty in range(3):
        for tx in range(2):
            pad = np.zeros((th, tw), np.uint8)
            sub = a[ty * th : (ty + 1) * th, tx * tw : (tx + 1) * tw]
            pad[: sub.shape[0], : sub.shape[1]] = sub
            diff = pad.astype(np.int16)
            diff[:, 1:] = (pad[:, 1:].astype(np.int16) - pad[:, :-1]) & 0xFF
            tiles_lzw.append(_tiff_lzw_encode(diff.astype(np.uint8).tobytes()))
    got = decode_tiff(_tile_tiff(13, 10, tw, th, tiles_lzw, compression=5, predictor=True))
    assert (got == a).all()


def test_tiled_refusals():
    from fsql_spark.operators.jpeg import encode_jpeg

    with pytest.raises(CodecError, match="tiles for a"):
        decode_tiff(_tile_tiff(13, 10, 8, 4, [bytes(32)]))  # wrong tile count
    jp = encode_jpeg(np.zeros((8, 8), np.uint8))
    with pytest.raises(NotImplementedError, match="tiled JPEG"):
        decode_tiff(_tile_tiff(8, 8, 8, 8, [jp], compression=7))
