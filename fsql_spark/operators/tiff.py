"""Pure stdlib+numpy baseline TIFF codec.

The scanned-document format a crawl meets after the web-image trio:
``decode_tiff`` walks the IFD tag structure (both byte orders) and
supports 8-bit grayscale / RGB / RGBA in STRIPS and TILES; compressions
uncompressed (1), PackBits (32773), TIFF-LZW (5, EarlyChange), Deflate
(8/32946), and new-style JPEG-in-TIFF (7, incl. shared JPEGTables);
horizontal-differencing predictor (317=2); min-is-black/white
photometrics. Other bit depths, palettes, CCITT fax, and old-JPEG raise
NotImplementedError naming the feature. ``encode_tiff`` writes canonical
little-endian single-strip files (none/packbits/lzw/deflate, optional
predictor) for exact round trips.

Like the other codecs these run INSIDE Arrow-batched mapInPandas
kernels; the LZW/PackBits loops are bounded per strip/tile, everything
else numpy.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

from .codecs import CodecError

#: tag ids (TIFF 6.0 baseline)
_T_WIDTH = 256
_T_HEIGHT = 257
_T_BITS = 258
_T_COMPRESSION = 259
_T_PHOTOMETRIC = 262
_T_STRIP_OFFSETS = 273
_T_SPP = 277
_T_ROWS_PER_STRIP = 278
_T_STRIP_COUNTS = 279
_T_PLANAR = 284
_T_PREDICTOR = 317
_T_TILE_WIDTH = 322
_T_TILE_LENGTH = 323
_T_TILE_OFFSETS = 324
_T_TILE_COUNTS = 325
_T_JPEG_TABLES = 347

_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4, 10: 8, 11: 4, 12: 8}


def _packbits_decode(data: bytes, expected: int) -> bytes:
    """Apple PackBits RLE (TIFF 6.0 §9): n in [0,127] -> copy n+1 literal
    bytes; n in [-127,-1] -> repeat next byte 1-n times; -128 is a noop."""
    out = bytearray()
    pos = 0
    n_in = len(data)
    while pos < n_in and len(out) < expected:
        n = data[pos]
        pos += 1
        if n < 128:  # literal run
            end = pos + n + 1
            if end > n_in:
                raise CodecError("TIFF PackBits: truncated literal run")
            out += data[pos:end]
            pos = end
        elif n > 128:  # replicate run of 257-n
            if pos >= n_in:
                raise CodecError("TIFF PackBits: truncated replicate run")
            out += bytes([data[pos]]) * (257 - n)
            pos += 1
        # n == 128: noop
    if len(out) < expected:
        raise CodecError(f"TIFF PackBits: decoded {len(out)} of {expected} bytes")
    return bytes(out[:expected])


def _packbits_encode(row: bytes) -> bytes:
    """Canonical PackBits: replicate runs of >=3, literals otherwise."""
    out = bytearray()
    i = 0
    n = len(row)
    while i < n:
        # find run length at i
        j = i + 1
        while j < n and j - i < 128 and row[j] == row[i]:
            j += 1
        if j - i >= 3:
            out += bytes([257 - (j - i), row[i]])
            i = j
            continue
        # literal: extend until a >=3 run starts (or 128 cap)
        lit = i
        while j < n and j - lit < 128:
            k = j + 1
            while k < n and k - j < 3 and row[k] == row[j]:
                k += 1
            if k - j >= 3:
                break
            j = k
        j = min(j, lit + 128, n)
        out += bytes([j - lit - 1]) + row[lit:j]
        i = j
    return bytes(out)


def _tiff_lzw_decode(data: bytes, expected: int) -> bytes:
    """TIFF-variant LZW (6.0 §13): MSB-first variable-width codes with
    EarlyChange (the width bumps one code EARLY, unlike GIF's LSB-first
    scheme); ClearCode 256, EOI 257."""
    CLEAR, EOI = 256, 257
    base = [bytes([i]) for i in range(256)] + [b"", b""]
    table = list(base)
    width = 9
    out = bytearray()
    acc = 0
    nbits = 0
    prev = None
    pos = 0
    n = len(data)
    while len(out) < expected:
        while nbits < width:
            if pos >= n:
                raise CodecError("TIFF LZW: stream ran out")
            acc = (acc << 8) | data[pos]
            nbits += 8
            pos += 1
        code = (acc >> (nbits - width)) & ((1 << width) - 1)
        nbits -= width
        if code == CLEAR:
            table = list(base)
            width = 9
            prev = None
            continue
        if code == EOI:
            break
        if prev is None:
            if code >= 256:
                raise CodecError("TIFF LZW: first code out of range")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):  # KwKwK
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise CodecError("TIFF LZW: code out of range")
        out += entry
        prev = entry
        # EarlyChange width rule, INTEROP-ARBITRATED (round 10): widen as
        # soon as the next assignable code no longer fits the current
        # width MINUS ONE — i.e. after adding entry 510/1022/2046 the next
        # read uses 10/11/12 bits (the JDK TIFFLZWDecompressor bumps at
        # tableIndex == 511/1023/2047; libtiff agrees). The pre-r10 code
        # bumped one entry EARLIER still (len+2) — self-consistent with
        # the old encoder but desynced from every other implementation;
        # caught by javax.imageio arbitration (tests/test_codec_interop).
        if len(table) + 1 >= (1 << width) and width < 12:
            width += 1
    if len(out) < expected:
        raise CodecError(f"TIFF LZW: decoded {len(out)} of {expected} bytes")
    return bytes(out[:expected])


def _tiff_lzw_encode(data: bytes) -> bytes:
    """TIFF-variant LZW encoder (MSB-first, EarlyChange), the decoder's
    mirror: ClearCode resets when the table approaches 12 bits."""
    CLEAR, EOI = 256, 257
    out = bytearray()
    acc = 0
    nbits = 0

    width = 9

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc = (acc << width) | code
        nbits += width
        while nbits >= 8:
            out.append((acc >> (nbits - 8)) & 0xFF)
            nbits -= 8

    def reset():
        return {bytes([i]): i for i in range(256)}, 258

    emit(CLEAR)
    table, next_code = reset()
    prev = b""
    for b in data:
        cur = prev + bytes([b])
        if cur in table:
            prev = cur
            continue
        emit(table[prev])
        table[cur] = next_code
        next_code += 1
        # EarlyChange, the decoder's mirror (see _tiff_lzw_decode): the
        # decoder's table lags this one by exactly one entry (it adds
        # from its second read onward), so the k-th emitted code is read
        # with the decoder's table at k-1 entries — widen when next_code
        # reaches 1 << width, which makes code #254 the first 10-bit one
        # on BOTH sides (pre-r10: >= (1<<width)-1, one emit early,
        # rejected by the JDK decoder — see tests/test_codec_interop)
        if next_code >= (1 << width) and width < 12:
            width += 1
        if next_code >= 4094:  # reset before 12 bits overflow
            emit(CLEAR)
            table, next_code = reset()
            width = 9
        prev = bytes([b])
    if prev:
        emit(table[prev])
    emit(EOI)
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


def _decompress_block(raw: bytes, expected: int, compression: int, what: str) -> bytes:
    """Expand one strip/tile to exactly ``expected`` bytes (shared by the
    strip and tile assembly paths)."""
    if compression == 32773:
        return _packbits_decode(raw, expected)
    if compression == 5:
        return _tiff_lzw_decode(raw, expected)
    if compression in (8, 32946):  # Adobe/old deflate: plain zlib
        try:
            inflated = zlib.decompress(raw)
        except zlib.error as exc:
            raise CodecError(f"TIFF: {what} deflate error: {exc}") from exc
        if len(inflated) < expected:
            raise CodecError(f"TIFF: {what} inflated short")
        return inflated[:expected]
    if len(raw) < expected:
        raise CodecError(f"TIFF: {what} shorter than its pixel data")
    return raw[:expected]


def decode_tiff(data: bytes) -> np.ndarray:
    """Decode a baseline TIFF byte string (first IFD) to a uint8 array —
    (H, W) gray or (H, W, C). Refuses corrupt structure with
    :class:`CodecError` and out-of-scope features (sub-byte or
    16-bit samples, palettes, CCITT fax, old-JPEG) with
    NotImplementedError."""
    if len(data) < 8:
        raise CodecError("TIFF: truncated header")
    if data[:2] == b"II":
        bo = "<"
    elif data[:2] == b"MM":
        bo = ">"
    else:
        raise CodecError("not a TIFF (bad byte-order mark)")
    (magic,) = struct.unpack(bo + "H", data[2:4])
    if magic != 42:
        raise CodecError(f"TIFF: bad magic {magic} (BigTIFF not supported)" if magic == 43 else f"TIFF: bad magic {magic}")
    (ifd,) = struct.unpack(bo + "I", data[4:8])
    if ifd + 2 > len(data):
        raise CodecError("TIFF: IFD offset out of range")
    (n_tags,) = struct.unpack(bo + "H", data[ifd : ifd + 2])
    tags = {}
    for i in range(n_tags):
        e = ifd + 2 + 12 * i
        if e + 12 > len(data):
            raise CodecError("TIFF: truncated IFD")
        tid, ttype, count = struct.unpack(bo + "HHI", data[e : e + 8])
        size = _TYPE_SIZES.get(ttype, 1) * count
        if size <= 4:
            raw = data[e + 8 : e + 8 + size]
        else:
            (off,) = struct.unpack(bo + "I", data[e + 8 : e + 12])
            raw = data[off : off + size]
            if len(raw) != size:
                raise CodecError(f"TIFF: tag {tid} payload out of range")
        if ttype == 3:
            vals = list(struct.unpack(bo + "H" * count, raw))
        elif ttype == 4:
            vals = list(struct.unpack(bo + "I" * count, raw))
        elif ttype == 1:
            vals = list(raw)
        else:
            vals = [raw]
        tags[tid] = vals

    tiled = _T_TILE_WIDTH in tags or _T_TILE_OFFSETS in tags

    def ints(tid, default=None, required=False):
        """The tags this decoder consumes must carry INTEGER values — a
        corrupted field type stores raw bytes, which would otherwise
        surface as TypeErrors deep in the strip math (fuzz find)."""
        if tid not in tags:
            if required:
                raise CodecError(f"TIFF: missing required tag {tid}")
            return default
        vals = tags[tid]
        if not vals or not all(isinstance(v, int) for v in vals):
            raise CodecError(f"TIFF: tag {tid} has a non-integer field type")
        return vals

    width = ints(_T_WIDTH, required=True)[0]
    height = ints(_T_HEIGHT, required=True)[0]
    if tiled:
        tile_w = ints(_T_TILE_WIDTH, required=True)[0]
        tile_h = ints(_T_TILE_LENGTH, required=True)[0]
        offsets = ints(_T_TILE_OFFSETS, required=True)
        counts = ints(_T_TILE_COUNTS, required=True)
        if tile_w <= 0 or tile_h <= 0:
            raise CodecError("TIFF: non-positive tile dimensions")
    else:
        offsets = ints(_T_STRIP_OFFSETS, required=True)
        counts = ints(_T_STRIP_COUNTS, required=True)
    spp = ints(_T_SPP, [1])[0]
    bits = ints(_T_BITS, [8])
    compression = ints(_T_COMPRESSION, [1])[0]
    photometric = ints(_T_PHOTOMETRIC, [1])[0]
    planar = ints(_T_PLANAR, [1])[0]
    rows_per_strip = ints(_T_ROWS_PER_STRIP, [height])[0]
    predictor = ints(_T_PREDICTOR, [1])[0]
    if rows_per_strip <= 0:
        raise CodecError("TIFF: non-positive RowsPerStrip")
    if predictor not in (1, 2):
        raise NotImplementedError(f"TIFF: predictor {predictor} not supported (1/2)")
    if any(b != 8 for b in bits):
        raise NotImplementedError(f"TIFF: bits per sample {bits} not supported (8 only)")
    if spp not in (1, 3, 4):
        raise NotImplementedError(f"TIFF: {spp} samples per pixel not supported")
    if planar != 1:
        raise NotImplementedError("TIFF: planar configuration 2 not supported")
    if compression not in (1, 5, 7, 8, 32773, 32946):
        name = {6: "old-JPEG", 2: "CCITT-RLE", 3: "CCITT-G3", 4: "CCITT-G4"}.get(
            compression, compression
        )
        raise NotImplementedError(f"TIFF: compression {name} not supported")
    if photometric == 3:
        raise NotImplementedError("TIFF: palette-color not supported")
    if photometric not in (0, 1, 2, 6):
        raise NotImplementedError(f"TIFF: photometric {photometric} not supported")
    if photometric == 6 and compression != 7:
        raise NotImplementedError("TIFF: YCbCr is only supported inside JPEG strips")
    if width == 0 or height == 0:
        raise CodecError("TIFF: zero-sized image")
    if len(offsets) != len(counts):
        raise CodecError("TIFF: strip offset/count mismatch")
    if compression == 7:  # new-style JPEG-in-TIFF: strips are JPEG streams
        if tiled:
            raise NotImplementedError("TIFF: tiled JPEG-in-TIFF not supported")
        return _decode_jpeg_strips(
            data, tags, offsets, counts, width, height, rows_per_strip, spp,
            photometric,
        )

    if tiled:
        # tiles cover a padded canvas in row-major grid order; each tile
        # is ALWAYS tile_w x tile_h (edge tiles carry padding the crop
        # discards), and the predictor restarts per tile row
        tiles_x = -(-width // tile_w)
        tiles_y = -(-height // tile_h)
        if len(offsets) != tiles_x * tiles_y:
            raise CodecError(
                f"TIFF: {len(offsets)} tiles for a {tiles_x}x{tiles_y} grid"
            )
        tile_bytes = tile_w * tile_h * spp
        canvas = np.zeros((tiles_y * tile_h, tiles_x * tile_w, spp), dtype=np.uint8)
        for ti, (off, cnt) in enumerate(zip(offsets, counts)):
            raw = data[off : off + cnt]
            if len(raw) != cnt:
                raise CodecError(f"TIFF: tile {ti} out of range")
            block = _decompress_block(raw, tile_bytes, compression, f"tile {ti}")
            t = np.frombuffer(block, dtype=np.uint8).reshape(tile_h, tile_w, spp)
            if predictor == 2:
                t = (np.cumsum(t.astype(np.int64), axis=1) & 0xFF).astype(np.uint8)
            ty, tx = divmod(ti, tiles_x)
            canvas[ty * tile_h : (ty + 1) * tile_h, tx * tile_w : (tx + 1) * tile_w] = t
        arr = canvas[:height, :width]
        arr = arr[:, :, 0] if spp == 1 else arr
        if photometric == 0:
            arr = 255 - arr
        return arr.copy()

    row_bytes = width * spp
    out = bytearray()
    for si, (off, cnt) in enumerate(zip(offsets, counts)):
        raw = data[off : off + cnt]
        if len(raw) != cnt:
            raise CodecError(f"TIFF: strip {si} out of range")
        strip_rows = min(rows_per_strip, height - si * rows_per_strip)
        if strip_rows <= 0:
            raise CodecError("TIFF: more strips than rows")
        out += _decompress_block(raw, strip_rows * row_bytes, compression, f"strip {si}")
    if len(out) != height * row_bytes:
        raise CodecError("TIFF: assembled pixel data has the wrong size")
    arr = np.frombuffer(bytes(out), dtype=np.uint8)
    arr = arr.reshape(height, width) if spp == 1 else arr.reshape(height, width, spp)
    if predictor == 2:
        # horizontal differencing (the libtiff LZW/deflate default): each
        # sample is stored as the delta from its left neighbor — undo with
        # a per-row, per-channel modular prefix sum
        arr = (np.cumsum(arr.astype(np.int64), axis=1) & 0xFF).astype(np.uint8)
    if photometric == 0:  # min-is-white: invert to the conventional scale
        arr = 255 - arr
    return arr.copy()


def _decode_jpeg_strips(data, tags, offsets, counts, width, height, rows_per_strip, spp,
                        photometric):
    """New-style JPEG-in-TIFF (TechNote 2): each strip is a JPEG stream,
    optionally sharing tables via the JPEGTables tag (an abbreviated
    stream SOI..EOI whose DQT/DHT segments prefix every strip). Reuses
    the engine's own JPEG decoder; min-is-white files invert like the
    baseline path."""
    from .jpeg import decode_jpeg

    tables = tags.get(_T_JPEG_TABLES)
    prefix = b""
    if tables:
        try:
            t = bytes(tables if isinstance(tables[0], int) else tables[0])
        except (ValueError, TypeError) as exc:
            raise CodecError(f"TIFF: JPEGTables has a non-byte field type: {exc}") from exc
        if len(t) < 4 or t[:2] != b"\xff\xd8" or t[-2:] != b"\xff\xd9":
            raise CodecError("TIFF: malformed JPEGTables payload")
        prefix = t[2:-2]  # the table segments, minus SOI/EOI
    rows = []
    for si, (off, cnt) in enumerate(zip(offsets, counts)):
        raw = data[off : off + cnt]
        if len(raw) != cnt:
            raise CodecError(f"TIFF: strip {si} out of range")
        if raw[:2] != b"\xff\xd8":
            raise CodecError(f"TIFF: strip {si} is not a JPEG stream")
        strip = b"\xff\xd8" + prefix + raw[2:]
        px = decode_jpeg(strip)
        strip_rows = min(rows_per_strip, height - si * rows_per_strip)
        if px.shape[0] < strip_rows or px.shape[1] < width:
            raise CodecError(f"TIFF: strip {si} decodes smaller than declared")
        rows.append(px[:strip_rows, :width])
    try:
        out = np.concatenate(rows, axis=0) if len(rows) > 1 else rows[0]
    except ValueError as exc:
        raise CodecError(f"TIFF: JPEG strips have inconsistent geometry: {exc}") from exc
    if out.shape[0] != height:
        raise CodecError("TIFF: JPEG strips do not cover the image height")
    if (spp == 1) != (out.ndim == 2):
        raise CodecError("TIFF: JPEG strip channel count disagrees with SamplesPerPixel")
    if photometric == 0:  # min-is-white, same inversion as the baseline path
        out = 255 - out
    return out


def encode_tiff(
    arr: np.ndarray,
    packbits: bool = False,
    compression: str | None = None,
    predictor: bool = False,
) -> bytes:
    """Encode a uint8 array — (H, W) gray / (H, W, 3) RGB / (H, W, 4)
    RGBA — as a canonical little-endian single-strip baseline TIFF.
    ``compression``: 'none' (default), 'packbits', 'lzw' (TIFF-variant
    MSB-first EarlyChange), or 'deflate'; ``packbits=True`` is a
    shorthand kept for symmetry. ``predictor`` applies horizontal
    differencing before lzw/deflate (tag 317=2, the libtiff default —
    deltas compress far better on natural images). Deterministic."""
    if packbits and compression not in (None, "packbits"):
        raise ValueError("pass either packbits=True or compression=, not both")
    if compression is None:
        compression = "packbits" if packbits else "none"
    if compression not in ("none", "packbits", "lzw", "deflate"):
        raise ValueError(f"unsupported compression {compression!r}")
    if arr.dtype != np.uint8 or arr.ndim not in (2, 3):
        raise ValueError("encode_tiff needs a uint8 (H, W[, C]) array")
    spp = 1 if arr.ndim == 2 else arr.shape[2]
    if arr.ndim == 3 and spp not in (3, 4):
        raise ValueError(f"unsupported channel count {spp}")
    height, width = arr.shape[0], arr.shape[1]
    if height == 0 or width == 0:
        raise ValueError("cannot encode a zero-sized image")
    if predictor and compression not in ("lzw", "deflate"):
        raise ValueError("predictor requires lzw or deflate compression")
    if predictor:
        # horizontal differencing per row/channel (mod 256)
        px = arr.reshape(height, width, spp).astype(np.int16)
        diff = px.copy()
        diff[:, 1:, :] = (px[:, 1:, :] - px[:, :-1, :]) & 0xFF
        arr = diff.astype(np.uint8).reshape(arr.shape)
    flat = arr.reshape(height, width * spp)
    if compression == "packbits":
        # PackBits restarts per row (TIFF requirement)
        pixel_data = b"".join(_packbits_encode(flat[r].tobytes()) for r in range(height))
        comp_code = 32773
    elif compression == "lzw":
        pixel_data = _tiff_lzw_encode(flat.tobytes())
        comp_code = 5
    elif compression == "deflate":
        pixel_data = zlib.compress(flat.tobytes(), 6)
        comp_code = 8
    else:
        pixel_data = flat.tobytes()
        comp_code = 1

    photometric = 1 if spp == 1 else 2
    entries = [
        (_T_WIDTH, 4, 1, width),  # LONG: dims may exceed 65535
        (_T_HEIGHT, 4, 1, height),
        (_T_BITS, 3, spp, None),  # payload below when spp > 2
        (_T_COMPRESSION, 3, 1, comp_code),
        (_T_PHOTOMETRIC, 3, 1, photometric),
        (_T_STRIP_OFFSETS, 4, 1, None),  # filled once layout is known
        (_T_SPP, 3, 1, spp),
        (_T_ROWS_PER_STRIP, 4, 1, height),
        (_T_STRIP_COUNTS, 4, 1, len(pixel_data)),
    ]
    if predictor:
        entries.append((_T_PREDICTOR, 3, 1, 2))
        entries.sort()
    ifd_off = 8
    ifd_size = 2 + 12 * len(entries) + 4
    extra_off = ifd_off + ifd_size
    extra = b""
    bits_off = None
    if spp > 2:  # BitsPerSample payload doesn't fit inline
        bits_off = extra_off + len(extra)
        extra += struct.pack("<" + "H" * spp, *([8] * spp))
    data_off = extra_off + len(extra)

    out = bytearray(b"II*\x00" + struct.pack("<I", ifd_off))
    out += struct.pack("<H", len(entries))
    for tid, ttype, count, val in entries:
        if tid == _T_BITS and spp > 2:
            out += struct.pack("<HHII", tid, ttype, count, bits_off)
            continue
        if tid == _T_BITS:
            val = 8
        if tid == _T_STRIP_OFFSETS:
            val = data_off
        if ttype == 3:
            out += struct.pack("<HHIHH", tid, ttype, count, val, 0)
        else:
            out += struct.pack("<HHII", tid, ttype, count, val)
    out += struct.pack("<I", 0)  # no next IFD
    out += extra
    out += pixel_data
    return bytes(out)
