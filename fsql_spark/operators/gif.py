"""Pure stdlib+numpy GIF (87a/89a) codec.

LZW with variable-width LSB-first codes, global/local color tables,
interlacing, frame disposal-free multi-frame parsing, and GCE
transparency. Lossless — so GIF entries get EXACT SQL oracles like the
palette-PNG path. No counterpart in the reference (fsql has no
multimodal surface); the driver brief mandates multimodal decode.

Scope (loud refusal outside it):

- Decode: any single- or multi-frame GIF whose frames are full-canvas
  (left=top=0, frame size == screen size); partial-canvas frames
  (disposal composition) raise NotImplementedError — a training
  pipeline treats those as quarantine cases, not silently-wrong pixels.
- Encode: single frame, global color table, optional interlace.

Like the other codecs these run INSIDE Arrow-batched mapInPandas
kernels; the LZW loops are plain Python over one frame's codes.
"""

from __future__ import annotations

import struct

import numpy as np

from .codecs import CodecError

GIF_MAGICS = (b"GIF87a", b"GIF89a")


def _interlace_rows(height: int) -> list:
    """GIF 4-pass interlace row order."""
    rows = list(range(0, height, 8))
    rows += list(range(4, height, 8))
    rows += list(range(2, height, 4))
    rows += list(range(1, height, 2))
    return rows


def _lzw_decode(mcs: int, data: bytes, n_pixels: int) -> np.ndarray:
    """Decode a GIF LZW stream (LSB-first variable-width codes) to exactly
    ``n_pixels`` palette indices."""
    if not 2 <= mcs <= 8:
        raise CodecError(f"GIF: bad LZW minimum code size {mcs}")
    clear = 1 << mcs
    eoi = clear + 1
    # dictionary as a list of byte strings; reset on clear
    base = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = list(base)
    width = mcs + 1
    out = bytearray()
    acc = 0
    nbits = 0
    prev = None
    pos = 0
    n = len(data)
    while True:
        while nbits < width:
            if pos >= n:
                # missing explicit EOI is tolerated by most decoders iff the
                # pixel count is already satisfied
                if len(out) >= n_pixels:
                    return np.frombuffer(bytes(out[:n_pixels]), dtype=np.uint8)
                raise CodecError("GIF: LZW stream ran out")
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = list(base)
            width = mcs + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            if code >= len(table):
                raise CodecError("GIF: first LZW code out of range")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):  # the KwKwK case
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise CodecError("GIF: LZW code out of range")
        out += entry
        prev = entry
        if len(table) == (1 << width) and width < 12:
            width += 1
        if len(out) >= n_pixels:
            # frame complete; consume (ignore) the trailing EOI if present
            return np.frombuffer(bytes(out[:n_pixels]), dtype=np.uint8)
    if len(out) < n_pixels:
        raise CodecError(f"GIF: LZW decoded {len(out)} of {n_pixels} pixels")
    return np.frombuffer(bytes(out[:n_pixels]), dtype=np.uint8)


def _lzw_encode(mcs: int, indices: np.ndarray) -> bytes:
    """Encode palette indices as a GIF LZW stream (dict-based, clear code
    emitted when the table fills — the canonical scheme)."""
    clear = 1 << mcs
    eoi = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0
    width = mcs + 1

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    emit(clear)
    prev = b""
    for b in bytes(indices.astype(np.uint8).tobytes()):
        cur = prev + bytes([b])
        if cur in table:
            prev = cur
            continue
        emit(table[prev])
        table[cur] = next_code
        next_code += 1
        if next_code == (1 << width) + 1:
            if width < 12:
                width += 1
            else:
                emit(clear)
                table = {bytes([i]): i for i in range(clear)}
                next_code = eoi + 1
                width = mcs + 1
        prev = bytes([b])
    if prev:
        emit(table[prev])
    emit(eoi)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def decode_gif(data: bytes) -> dict:
    """Decode a GIF byte string -> dict with ``width``, ``height``,
    ``frames`` (list of (H, W, 3) uint8 RGB arrays — or (H, W, 4) when the
    frame's GCE declares a transparent index). Refuses corrupt structure
    with :class:`CodecError` and partial-canvas frames with
    NotImplementedError."""
    if data[:6] not in GIF_MAGICS:
        raise CodecError("not a GIF (bad magic)")
    if len(data) < 13:
        raise CodecError("GIF: truncated header")
    width, height, flags, _bg, _ar = struct.unpack("<HHBBB", data[6:13])
    if width == 0 or height == 0:
        raise CodecError("GIF: zero-sized logical screen")
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = np.frombuffer(data[pos : pos + 3 * n], dtype=np.uint8)
        if gct.size != 3 * n:
            raise CodecError("GIF: truncated global color table")
        gct = gct.reshape(n, 3)
        pos += 3 * n
    frames = []
    transparent = None
    while pos < len(data):
        b = data[pos]
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension
            if pos + 2 > len(data):
                raise CodecError("GIF: truncated extension")
            label = data[pos + 1]
            pos += 2
            if label == 0xF9:
                # GCE block: size byte (>=4) + flags + delay(2) + index
                if pos + 5 > len(data) or data[pos] < 4:
                    raise CodecError("GIF: truncated graphics control extension")
                gce_flags = data[pos + 1]
                if gce_flags & 0x01:
                    transparent = data[pos + 4]
            # skip sub-blocks (any label)
            while True:
                if pos >= len(data):
                    raise CodecError("GIF: truncated extension sub-blocks")
                size = data[pos]
                pos += 1 + size
                if size == 0:
                    break
        elif b == 0x2C:  # image descriptor
            if pos + 10 > len(data):
                raise CodecError("GIF: truncated image descriptor")
            left, top, fw, fh, iflags = struct.unpack("<HHHHB", data[pos + 1 : pos + 10])
            pos += 10
            if (left, top) != (0, 0) or (fw, fh) != (width, height):
                raise NotImplementedError(
                    "GIF: partial-canvas frames (disposal composition) not supported"
                )
            ct = gct
            if iflags & 0x80:  # local color table
                n = 2 << (iflags & 0x07)
                ct = np.frombuffer(data[pos : pos + 3 * n], dtype=np.uint8)
                if ct.size != 3 * n:
                    raise CodecError("GIF: truncated local color table")
                ct = ct.reshape(n, 3)
                pos += 3 * n
            if ct is None:
                raise CodecError("GIF: frame has no color table")
            if pos >= len(data):
                raise CodecError("GIF: missing LZW minimum code size")
            mcs = data[pos]
            pos += 1
            chunks = []
            while True:
                if pos >= len(data):
                    raise CodecError("GIF: truncated image sub-blocks")
                size = data[pos]
                pos += 1
                if size == 0:
                    break
                chunks.append(data[pos : pos + size])
                if len(chunks[-1]) != size:
                    raise CodecError("GIF: truncated image sub-block")
                pos += size
            idx = _lzw_decode(mcs, b"".join(chunks), fw * fh)
            if int(idx.max(initial=0)) >= ct.shape[0]:
                raise CodecError(
                    f"GIF: palette index {int(idx.max())} out of range "
                    f"(table has {ct.shape[0]} entries)"
                )
            idx = idx.reshape(fh, fw)
            if iflags & 0x40:  # interlaced: rows arrive in 4-pass order
                ordered = np.empty_like(idx)
                ordered[_interlace_rows(fh)] = idx
                idx = ordered
            rgb = ct[idx]
            if transparent is not None and transparent < ct.shape[0]:
                alpha = np.where(idx == transparent, 0, 255).astype(np.uint8)
                frames.append(np.dstack([rgb, alpha]))
            else:
                frames.append(rgb)
            transparent = None  # GCE applies to ONE following image
        else:
            raise CodecError(f"GIF: unknown block 0x{b:02x}")
    if not frames:
        raise CodecError("GIF: no image data")
    return {"width": width, "height": height, "frames": frames}


def encode_gif(
    indices: np.ndarray,
    palette: np.ndarray,
    interlace: bool = False,
    transparent: int | None = None,
) -> bytes:
    """Encode a uint8 index array (H, W) + (n, 3) uint8 palette as a
    single-frame GIF89a (global color table, optional interlace /
    transparent index). Deterministic: same input -> same bytes."""
    if indices.dtype != np.uint8 or indices.ndim != 2:
        raise ValueError("encode_gif needs a uint8 (H, W) index array")
    palette = np.asarray(palette, dtype=np.uint8)
    if palette.ndim != 2 or palette.shape[1] != 3 or not 2 <= palette.shape[0] <= 256:
        raise ValueError("palette must be (n, 3) uint8 with 2 <= n <= 256")
    if int(indices.max(initial=0)) >= palette.shape[0]:
        raise ValueError("palette index out of range")
    height, width = indices.shape
    if height == 0 or width == 0:
        raise ValueError("cannot encode a zero-sized image")
    if height > 65535 or width > 65535:
        raise ValueError("GIF dimensions are limited to 65535")
    # color table size: next power of two >= palette size (min 2)
    bits = max(1, int(palette.shape[0] - 1).bit_length())
    n_ct = 1 << bits
    ct = np.zeros((n_ct, 3), dtype=np.uint8)
    ct[: palette.shape[0]] = palette
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", width, height, 0x80 | (bits - 1), 0, 0)
    out += ct.tobytes()
    if transparent is not None:
        if not 0 <= transparent < palette.shape[0]:
            raise ValueError("transparent index out of range")
        out += bytes([0x21, 0xF9, 4, 0x01, 0, 0, transparent, 0])
    out += struct.pack("<BHHHHB", 0x2C, 0, 0, width, height, 0x40 if interlace else 0)
    rows = indices[_interlace_rows(height)] if interlace else indices
    mcs = max(2, bits)
    out.append(mcs)
    stream = _lzw_encode(mcs, rows.reshape(-1))
    for i in range(0, len(stream), 255):
        chunk = stream[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"
    return bytes(out)
