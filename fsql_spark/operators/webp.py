"""Pure stdlib+numpy WebP-LOSSLESS (VP8L) codec.

WebP lossless is the one widely-deployed image format this engine still
refused natively (VERDICT r8 "What's missing" #2). The VP8L bitstream is
exactly decodable — canonical prefix codes (simple and normal, with the
code-length-code + 16/17/18 repeat layer), LZ77 backward references with
the 2D distance mapping, a color cache, and the subtract-green transform
— so, like PNG/GIF/FLAC, entries built on it get EXACT SQL oracles. No
counterpart in the reference (fsql has no multimodal surface,
`/root/reference/src/fsql/deser.py`); driver-mandated extension surface
(SURVEY §2.6).

Scope (loud refusal outside it):

- Decode: any VP8L stream using literals, LZ77 references (2D and plain
  distances), color cache, simple or normal prefix codes, and the
  SUBTRACT_GREEN transform. The PREDICTOR / COLOR / COLOR_INDEXING
  transforms and meta prefix codes (entropy image) raise
  NotImplementedError naming the feature — a training pipeline treats
  those as quarantine cases, not silently-wrong pixels. Lossy "VP8 " and
  extended "VP8X" containers refuse at dispatch (external codec).
- Encode: any gray / RGB / RGBA uint8 array, written with the
  subtract-green transform, run-length LZ77 over identical pixels (plain
  distance 1 — arithmetic-only mapping), an optional color cache, and
  frequency-built canonical codes (simple codes when <= 2 symbols). The
  encoder exists so decode is value-checked end-to-end without an
  external codec; interop is additionally covered by a Pillow-gated test
  that skips where Pillow is absent.

Error taxonomy: corrupt structure raises :class:`~fsql_spark.operators.
codecs.CodecError` (a ValueError), out-of-scope features raise
NotImplementedError — never IndexError/struct.error (fuzz-gated in
tests/test_codec_fuzz.py). VP8L carries no checksum, so a bit flip in
entropy-coded pixel data can decode to different pixels without error;
the catalog's md5 oracles are the integrity layer.

Like the other codecs these run INSIDE Arrow-batched mapInPandas
kernels; the entropy loops are plain Python over one image's symbols.
"""

from __future__ import annotations

import struct

import numpy as np

from .codecs import CodecError

WEBP_RIFF = b"RIFF"
WEBP_FOURCC = b"WEBP"

#: code-length symbols arrive in this fixed order (spec §"normal codes")
_KCODE_LENGTH_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)

#: 2D distance mapping: decoded distance values 1..120 name near pixels.
#: Each byte packs (yoffset << 4) | (8 - xoffset); dist = y*width + x
#: (clamped to >= 1). Transcribed from the public libwebp table; the
#: permutation + near-ordering properties are unit-tested, and the
#: engine's own encoder emits only arithmetic (plain, > 120) distances so
#: round-trip correctness never depends on this table.
_CODE_TO_PLANE = (
    0x18, 0x07, 0x17, 0x19, 0x28, 0x06, 0x27, 0x29, 0x16, 0x1a,
    0x26, 0x2a, 0x38, 0x05, 0x37, 0x39, 0x15, 0x1b, 0x36, 0x3a,
    0x25, 0x2b, 0x48, 0x04, 0x47, 0x49, 0x14, 0x1c, 0x35, 0x3b,
    0x46, 0x4a, 0x24, 0x2c, 0x58, 0x45, 0x4b, 0x34, 0x3c, 0x03,
    0x57, 0x59, 0x13, 0x1d, 0x56, 0x5a, 0x23, 0x2d, 0x44, 0x4c,
    0x55, 0x5b, 0x33, 0x3d, 0x68, 0x02, 0x67, 0x69, 0x12, 0x1e,
    0x66, 0x6a, 0x22, 0x2e, 0x54, 0x5c, 0x43, 0x4d, 0x65, 0x6b,
    0x32, 0x3e, 0x78, 0x01, 0x77, 0x79, 0x53, 0x5d, 0x11, 0x1f,
    0x64, 0x6c, 0x42, 0x4e, 0x76, 0x7a, 0x21, 0x2f, 0x75, 0x7b,
    0x31, 0x3f, 0x63, 0x6d, 0x52, 0x5e, 0x00, 0x74, 0x7c, 0x41,
    0x4f, 0x10, 0x20, 0x62, 0x6e, 0x30, 0x73, 0x7d, 0x51, 0x5f,
    0x40, 0x61, 0x6f, 0x72, 0x7e, 0x50, 0x71, 0x7f, 0x60, 0x70,
)

_HASH_MUL = 0x1E35A7BD  # color-cache multiplicative hash (spec constant)
_MAX_LZ77_LEN = 4096


# --------------------------------------------------------------------------
# bit I/O (LSB-first within bytes; prefix-code bits are the code's MSB
# first in stream order, DEFLATE-style)
# --------------------------------------------------------------------------


class _BitReader:
    __slots__ = ("data", "n", "byte_pos", "buf", "bits", "used", "limit")

    def __init__(self, data: bytes):
        self.data = data
        self.n = len(data)
        self.byte_pos = 0
        self.buf = 0
        self.bits = 0
        self.used = 0  # bits CONSUMED; > limit means a truncated stream
        self.limit = 8 * self.n

    def _fill(self, need: int) -> None:
        while self.bits < need:
            if self.byte_pos < self.n:
                self.buf |= self.data[self.byte_pos] << self.bits
                self.byte_pos += 1
            # else zero-pad past the end; `used > limit` flags the overrun
            self.bits += 8

    def read(self, nbits: int) -> int:
        if nbits == 0:
            return 0
        self._fill(nbits)
        v = self.buf & ((1 << nbits) - 1)
        self.buf >>= nbits
        self.bits -= nbits
        self.used += nbits
        return v

    def peek(self, nbits: int) -> int:
        self._fill(nbits)
        return self.buf & ((1 << nbits) - 1)

    def consume(self, nbits: int) -> None:
        self._fill(nbits)
        self.buf >>= nbits
        self.bits -= nbits
        self.used += nbits

    def check_truncation(self) -> None:
        if self.used > self.limit:
            raise CodecError("VP8L: truncated stream")


class _BitWriter:
    __slots__ = ("out", "buf", "bits")

    def __init__(self):
        self.out = bytearray()
        self.buf = 0
        self.bits = 0

    def write(self, value: int, nbits: int) -> None:
        self.buf |= (value & ((1 << nbits) - 1)) << self.bits
        self.bits += nbits
        while self.bits >= 8:
            self.out.append(self.buf & 0xFF)
            self.buf >>= 8
            self.bits -= 8

    def write_code(self, code: int, length: int) -> None:
        """Emit a canonical prefix code MSB-first (codes are walked from
        the root, so the first stream bit is the code's top bit)."""
        for j in range(length - 1, -1, -1):
            self.write((code >> j) & 1, 1)

    def getvalue(self) -> bytes:
        if self.bits:
            self.out.append(self.buf & 0xFF)
            self.buf = 0
            self.bits = 0
        return bytes(self.out)


# --------------------------------------------------------------------------
# canonical prefix codes
# --------------------------------------------------------------------------


def _canonical_codes(lengths) -> dict:
    """symbol -> (code, length) per the canonical construction (codes
    assigned in (length, symbol) order), DEFLATE/VP8L-style."""
    pairs = sorted((l, s) for s, l in enumerate(lengths) if l > 0)
    codes = {}
    code = 0
    prev_len = pairs[0][0] if pairs else 0
    for l, s in pairs:
        code <<= l - prev_len
        prev_len = l
        codes[s] = (code, l)
        code += 1
    return codes


class _PrefixCode:
    """Table-driven decoder for one canonical prefix code.

    ``const_sym`` handles the 0-bit single-symbol form (simple codes with
    one symbol, or a normal code where exactly one length is non-zero).
    """

    __slots__ = ("const_sym", "max_len", "table")

    def __init__(self, lengths):
        nonzero = [(s, l) for s, l in enumerate(lengths) if l > 0]
        if not nonzero:
            raise CodecError("VP8L: prefix code with no symbols")
        if len(nonzero) == 1:
            self.const_sym = nonzero[0][0]
            self.max_len = 0
            self.table = None
            return
        kraft = sum(1 << (15 - l) for _, l in nonzero)
        if kraft != (1 << 15):
            raise CodecError("VP8L: prefix code lengths are not a complete code")
        self.const_sym = -1
        self.max_len = max(l for _, l in nonzero)
        size = 1 << self.max_len
        table = [(-1, 0)] * size
        for sym, (code, l) in _canonical_codes(lengths).items():
            # stream presents the code MSB-first while peek() returns bits
            # LSB-first, so index by the bit-reversed code + every filler
            rev = 0
            for j in range(l):
                rev = (rev << 1) | ((code >> j) & 1)
            step = 1 << l
            for filler in range(rev, size, step):
                table[filler] = (sym, l)
        self.table = table

    def read(self, br: _BitReader) -> int:
        if self.const_sym >= 0:
            return self.const_sym
        sym, l = self.table[br.peek(self.max_len)]
        if sym < 0:
            raise CodecError("VP8L: invalid prefix code in stream")
        br.consume(l)
        return sym


def _read_prefix_code(br: _BitReader, alphabet_size: int) -> _PrefixCode:
    if br.read(1):  # simple code
        num_symbols = br.read(1) + 1
        first_8bits = br.read(1)
        s0 = br.read(8 if first_8bits else 1)
        lengths = [0] * alphabet_size
        if s0 >= alphabet_size:
            raise CodecError(f"VP8L: simple-code symbol {s0} out of alphabet")
        if num_symbols == 2:
            s1 = br.read(8)
            if s1 >= alphabet_size:
                raise CodecError(f"VP8L: simple-code symbol {s1} out of alphabet")
            if s1 == s0:
                raise CodecError("VP8L: simple code repeats a symbol")
            lengths[s0] = lengths[s1] = 1
        else:
            lengths[s0] = 1  # collapses to the 0-bit const form below
        return _PrefixCode(lengths)
    # normal code: code lengths arrive through their own prefix code
    num_cl = 4 + br.read(4)
    cl_lengths = [0] * 19
    for i in range(num_cl):
        cl_lengths[_KCODE_LENGTH_ORDER[i]] = br.read(3)
    cl_code = _PrefixCode(cl_lengths)
    lengths = _read_code_lengths(br, cl_code, alphabet_size)
    return _PrefixCode(lengths)


def _read_code_lengths(br: _BitReader, cl_code: _PrefixCode, num_symbols: int) -> list:
    if br.read(1):  # explicit max_symbol cap
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
    else:
        max_symbol = num_symbols
    lengths = [0] * num_symbols
    prev_len = 8  # spec-mandated initial repeat value
    sym = 0
    while sym < num_symbols:
        if max_symbol == 0:
            break
        max_symbol -= 1
        cl = cl_code.read(br)
        if cl < 16:
            lengths[sym] = cl
            sym += 1
            if cl:
                prev_len = cl
        else:
            if cl == 16:
                repeat, fill = 3 + br.read(2), prev_len
            elif cl == 17:
                repeat, fill = 3 + br.read(3), 0
            else:
                repeat, fill = 11 + br.read(7), 0
            if sym + repeat > num_symbols:
                raise CodecError("VP8L: code-length repeat overruns the alphabet")
            for _ in range(repeat):
                lengths[sym] = fill
                sym += 1
        br.check_truncation()
    return lengths


# --------------------------------------------------------------------------
# the length/distance prefix-value scheme (24 length / 40 distance syms)
# --------------------------------------------------------------------------


def _read_prefix_value(br: _BitReader, code: int) -> int:
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra
    return offset + br.read(extra) + 1


def _prefix_value_parts(value: int) -> tuple:
    """(symbol, extra_bits_count, extra_bits_value) for a LZ77 value."""
    x = value - 1
    if x < 4:
        return x, 0, 0
    eb = x.bit_length() - 2
    top = x >> eb  # 2 or 3
    sym = 2 * eb + 2 + (top - 2)
    offset = (2 + (sym & 1)) << eb
    return sym, eb, x - offset


# --------------------------------------------------------------------------
# decode
# --------------------------------------------------------------------------


def decode_webp(data: bytes) -> np.ndarray:
    """Decode a WebP byte string. VP8L (lossless) decodes natively to a
    uint8 array — (H, W) gray when the image is exactly gray and opaque,
    else (H, W, 3) when opaque, else (H, W, 4) RGBA (native channel count,
    like the TIFF/BMP decoders). Lossy "VP8 " and extended "VP8X" payloads
    raise NotImplementedError (external codec); corrupt structure raises
    :class:`CodecError`."""
    data = bytes(data)
    if data[:4] != WEBP_RIFF or len(data) < 16 or data[8:12] != WEBP_FOURCC:
        raise CodecError("not a WebP stream (bad RIFF/WEBP header)")
    fourcc = data[12:16]
    if fourcc == b"VP8 ":
        raise NotImplementedError(
            "lossy WebP (VP8) needs an external codec; VP8L lossless decodes natively"
        )
    if fourcc == b"VP8X":
        raise NotImplementedError(
            "extended WebP (VP8X: animation/EXIF/alpha-chunk) is not supported; "
            "plain VP8L lossless decodes natively"
        )
    if fourcc != b"VP8L":
        raise CodecError(f"WebP: unknown chunk {fourcc!r} where VP8L expected")
    if len(data) < 20:
        raise CodecError("WebP: truncated VP8L chunk header")
    (chunk_len,) = struct.unpack("<I", data[16:20])
    payload = data[20 : 20 + chunk_len]
    if len(payload) < chunk_len or chunk_len < 5:
        raise CodecError("WebP: truncated VP8L chunk")
    if payload[0] != 0x2F:
        raise CodecError("VP8L: bad signature byte")
    br = _BitReader(payload[1:])
    w = br.read(14) + 1
    h = br.read(14) + 1
    br.read(1)  # alpha hint — informational
    if br.read(3) != 0:
        raise CodecError("VP8L: unknown bitstream version")
    argb = _decode_image_stream(br, w, h)
    a = (argb >> 24).astype(np.uint8).reshape(h, w)
    r = ((argb >> 16) & 0xFF).astype(np.uint8).reshape(h, w)
    g = ((argb >> 8) & 0xFF).astype(np.uint8).reshape(h, w)
    b = (argb & 0xFF).astype(np.uint8).reshape(h, w)
    if (a == 255).all():
        if (r == g).all() and (g == b).all():
            return g
        return np.stack([r, g, b], axis=-1)
    return np.stack([r, g, b, a], axis=-1)


def _decode_image_stream(br: _BitReader, w: int, h: int) -> np.ndarray:
    subtract_green = False
    seen = set()
    while br.read(1):
        t = br.read(2)
        if t in seen:
            raise CodecError(f"VP8L: transform {t} appears twice")
        seen.add(t)
        if t == 2:
            subtract_green = True
        else:
            name = {0: "PREDICTOR", 1: "COLOR", 3: "COLOR_INDEXING"}[t]
            raise NotImplementedError(
                f"VP8L {name} transform is not supported; SUBTRACT_GREEN "
                "decodes natively"
            )
    cache_bits = 0
    if br.read(1):
        cache_bits = br.read(4)
        if not 1 <= cache_bits <= 11:
            raise CodecError(f"VP8L: color cache bits {cache_bits} out of range")
    if br.read(1):
        raise NotImplementedError(
            "VP8L meta prefix codes (entropy image) are not supported; "
            "single-group streams decode natively"
        )
    cache_size = (1 << cache_bits) if cache_bits else 0
    g_code = _read_prefix_code(br, 256 + 24 + cache_size)
    r_code = _read_prefix_code(br, 256)
    b_code = _read_prefix_code(br, 256)
    a_code = _read_prefix_code(br, 256)
    d_code = _read_prefix_code(br, 40)

    n = w * h
    if n > 1 << 24:
        # a pure-Python entropy loop over >16.7M pixels is out of this
        # codec's practical envelope (and an adversarial header could
        # otherwise demand gigabytes); a real pipeline shards such assets
        raise NotImplementedError(
            f"VP8L image {w}x{h} exceeds the supported 2^24-pixel budget"
        )
    out = [0] * n
    cache = [0] * cache_size
    shift = 32 - cache_bits if cache_bits else 0
    i = 0
    while i < n:
        br.check_truncation()
        s = g_code.read(br)
        if s < 256:
            red = r_code.read(br)
            blue = b_code.read(br)
            alpha = a_code.read(br)
            px = (alpha << 24) | (red << 16) | (s << 8) | blue
            out[i] = px
            if cache_bits:
                cache[((_HASH_MUL * px) & 0xFFFFFFFF) >> shift] = px
            i += 1
        elif s < 280:
            length = _read_prefix_value(br, s - 256)
            dist_value = _read_prefix_value(br, d_code.read(br))
            if dist_value > 120:
                dist = dist_value - 120
            else:
                plane = _CODE_TO_PLANE[dist_value - 1]
                dist = (plane >> 4) * w + (8 - (plane & 0xF))
                if dist < 1:
                    dist = 1
            if dist > i:
                raise CodecError("VP8L: backward reference before image start")
            if i + length > n:
                raise CodecError("VP8L: backward reference past image end")
            if cache_bits:
                for _ in range(length):
                    px = out[i - dist]
                    out[i] = px
                    cache[((_HASH_MUL * px) & 0xFFFFFFFF) >> shift] = px
                    i += 1
            else:
                for _ in range(length):
                    out[i] = out[i - dist]
                    i += 1
        else:
            if s - 280 >= cache_size:
                raise CodecError("VP8L: color cache index out of range")
            out[i] = cache[s - 280]
            i += 1
    br.check_truncation()

    argb = np.asarray(out, dtype=np.uint32)
    if subtract_green:
        g = (argb >> 8) & 0xFF
        r = (((argb >> 16) & 0xFF) + g) & 0xFF
        b = ((argb & 0xFF) + g) & 0xFF
        argb = (argb & 0xFF00FF00) | (r << 16) | b
    return argb


# --------------------------------------------------------------------------
# encode
# --------------------------------------------------------------------------


def _huffman_lengths(freqs: dict, max_len: int) -> dict:
    """Code lengths for the used symbols (heapq Huffman; a balanced-tree
    fallback keeps every length <= max_len, completeness preserved)."""
    import heapq

    if len(freqs) == 1:
        return {next(iter(freqs)): 1}
    heap = [(f, [s]) for s, f in freqs.items()]
    heapq.heapify(heap)
    lengths = dict.fromkeys(freqs, 0)
    while len(heap) > 1:
        fa, sa = heapq.heappop(heap)
        fb, sb = heapq.heappop(heap)
        for s in sa + sb:
            lengths[s] += 1
        heapq.heappush(heap, (fa + fb, sa + sb))
    if max(lengths.values()) <= max_len:
        return lengths
    # balanced fallback: k leaves as a full binary tree — (2^L - k) leaves
    # at depth L-1, the rest at depth L; Kraft sums to exactly 1
    k = len(freqs)
    depth = max(1, (k - 1).bit_length())
    shallow = (1 << depth) - k
    ordered = sorted(freqs, key=lambda s: -freqs[s])
    return {
        s: (depth - 1 if j < shallow else depth) for j, s in enumerate(ordered)
    }


def _write_prefix_code(bw: _BitWriter, lengths_by_sym: dict, alphabet_size: int) -> dict:
    """Serialize one prefix code (simple when <= 2 symbols fit, else the
    normal code-length form) and return symbol -> (code, length)."""
    used = sorted(lengths_by_sym)
    if 1 <= len(used) <= 2 and used[-1] < 256:
        bw.write(1, 1)  # simple
        bw.write(len(used) - 1, 1)
        s0 = used[0]
        if s0 <= 1:
            bw.write(0, 1)  # 1-bit first symbol
            bw.write(s0, 1)
        else:
            bw.write(1, 1)
            bw.write(s0, 8)
        if len(used) == 2:
            bw.write(used[1], 8)
            return {used[0]: (0, 1), used[1]: (1, 1)}
        return {used[0]: (0, 0)}
    bw.write(0, 1)  # normal
    lengths = [0] * alphabet_size
    for s, l in lengths_by_sym.items():
        lengths[s] = l
    # RLE the length array into code-length symbols
    stream = []  # (cl_symbol, extra_bits, extra_value)
    idx = 0
    while idx < alphabet_size:
        l = lengths[idx]
        run = 1
        while idx + run < alphabet_size and lengths[idx + run] == l:
            run += 1
        if l == 0:
            rem = run
            while rem >= 3:
                if rem >= 11:
                    take = min(rem, 138)
                    stream.append((18, 7, take - 11))
                else:
                    take = min(rem, 6)
                    stream.append((17, 3, take - 3))
                rem -= take
            stream.extend((0, 0, 0) for _ in range(rem))
        else:
            stream.append((l, 0, 0))
            rem = run - 1
            while rem >= 3:
                take = min(rem, 6)
                stream.append((16, 2, take - 3))
                rem -= take
            stream.extend((l, 0, 0) for _ in range(rem))
        idx += run
    cl_freq: dict = {}
    for cl, _, _ in stream:
        cl_freq[cl] = cl_freq.get(cl, 0) + 1
    cl_lengths_by_sym = _huffman_lengths(cl_freq, 7)
    if len(cl_lengths_by_sym) == 1:
        # a 0-bit code-length code cannot terminate the reader's loop at
        # the right symbol count; pad with a harmless second symbol
        lone = next(iter(cl_lengths_by_sym))
        other = 0 if lone != 0 else 17
        cl_lengths_by_sym = {lone: 1, other: 1}
    cl_lengths = [0] * 19
    for s, l in cl_lengths_by_sym.items():
        cl_lengths[s] = l
    num_cl = max(
        4, 1 + max(i for i, s in enumerate(_KCODE_LENGTH_ORDER) if cl_lengths[s] > 0)
    )
    bw.write(num_cl - 4, 4)
    for i in range(num_cl):
        bw.write(cl_lengths[_KCODE_LENGTH_ORDER[i]], 3)
    bw.write(0, 1)  # no explicit max_symbol cap
    cl_codes = _canonical_codes(cl_lengths)
    for cl, ebits, evalue in stream:
        code, l = cl_codes[cl]
        bw.write_code(code, l)
        if ebits:
            bw.write(evalue, ebits)
    return _canonical_codes(lengths)


def encode_webp_lossless(
    arr: np.ndarray, use_lz77: bool = True, cache_bits: int = 0
) -> bytes:
    """Encode a uint8 array — (H, W) gray, (H, W, 3) RGB or (H, W, 4)
    RGBA — as a lossless WebP (VP8L). Always applies the SUBTRACT_GREEN
    transform (gray images then spend bits on the green channel only);
    ``use_lz77`` run-length-codes runs of identical pixels via plain
    distance-1 references; ``cache_bits`` > 0 additionally routes repeats
    through a color cache of 2^bits entries (decode-path coverage).
    Deterministic: same array + options => identical bytes."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        r = g = b = a
        al = np.full(a.shape, 255, dtype=np.uint8)
    elif a.ndim == 3 and a.shape[2] == 3:
        r, g, b = a[..., 0], a[..., 1], a[..., 2]
        al = np.full(a.shape[:2], 255, dtype=np.uint8)
    elif a.ndim == 3 and a.shape[2] == 4:
        r, g, b, al = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    else:
        raise ValueError(f"expected (H,W)/(H,W,3)/(H,W,4) uint8, got {a.shape}")
    h, w = g.shape[0], g.shape[1]
    if h < 1 or w < 1 or h > 16384 or w > 16384:
        raise ValueError(f"image size {w}x{h} outside VP8L's 14-bit range")
    if not 0 <= cache_bits <= 11:
        raise ValueError(f"cache_bits must be 0..11, got {cache_bits}")
    # subtract-green, then flatten scan-order ARGB words
    rr = (r.astype(np.int16) - g).astype(np.uint8).ravel()
    bb = (b.astype(np.int16) - g).astype(np.uint8).ravel()
    gg = g.ravel()
    aa = al.ravel()
    argb = (
        (aa.astype(np.uint32) << 24)
        | (rr.astype(np.uint32) << 16)
        | (gg.astype(np.uint32) << 8)
        | bb.astype(np.uint32)
    )
    n = argb.shape[0]

    # tokenize: literals / (length, dist=1) runs / color-cache hits
    cache_size = (1 << cache_bits) if cache_bits else 0
    shift = 32 - cache_bits if cache_bits else 0
    cache = [0] * cache_size
    cache_seen = [False] * cache_size
    tokens = []  # ('lit', i) | ('run', length) | ('cache', index)
    i = 0
    while i < n:
        px = int(argb[i])
        if use_lz77 and i > 0 and px == int(argb[i - 1]):
            run = 1
            while (
                i + run < n
                and int(argb[i + run]) == px
                and run < _MAX_LZ77_LEN
            ):
                run += 1
            if run >= 3:
                tokens.append(("run", run))
                if cache_bits:
                    idx = ((_HASH_MUL * px) & 0xFFFFFFFF) >> shift
                    cache[idx] = px
                    cache_seen[idx] = True
                i += run
                continue
        if cache_bits:
            idx = ((_HASH_MUL * px) & 0xFFFFFFFF) >> shift
            if cache_seen[idx] and cache[idx] == px:
                tokens.append(("cache", idx))
                i += 1
                continue
            cache[idx] = px
            cache_seen[idx] = True
        tokens.append(("lit", i))
        i += 1

    g_freq: dict = {}
    r_freq: dict = {}
    b_freq: dict = {}
    a_freq: dict = {}
    d_freq: dict = {}
    for kind, v in tokens:
        if kind == "lit":
            g_freq[int(gg[v])] = g_freq.get(int(gg[v]), 0) + 1
            r_freq[int(rr[v])] = r_freq.get(int(rr[v]), 0) + 1
            b_freq[int(bb[v])] = b_freq.get(int(bb[v]), 0) + 1
            a_freq[int(aa[v])] = a_freq.get(int(aa[v]), 0) + 1
        elif kind == "run":
            sym, _, _ = _prefix_value_parts(v)
            g_freq[256 + sym] = g_freq.get(256 + sym, 0) + 1
            dsym, _, _ = _prefix_value_parts(121)  # plain distance 1
            d_freq[dsym] = d_freq.get(dsym, 0) + 1
        else:
            g_freq[280 + v] = g_freq.get(280 + v, 0) + 1
    # every prefix code must exist even when unused (the decoder reads 5)
    for fr in (r_freq, b_freq, a_freq, d_freq):
        if not fr:
            fr[0] = 1

    bw = _BitWriter()
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1)  # alpha hint
    bw.write(0, 3)  # version
    bw.write(1, 1)  # a transform follows
    bw.write(2, 2)  # SUBTRACT_GREEN
    bw.write(0, 1)  # no more transforms
    if cache_bits:
        bw.write(1, 1)
        bw.write(cache_bits, 4)
    else:
        bw.write(0, 1)
    bw.write(0, 1)  # no meta prefix codes
    g_alpha = 256 + 24 + cache_size
    g_codes = _write_prefix_code(bw, _huffman_lengths(g_freq, 15), g_alpha)
    r_codes = _write_prefix_code(bw, _huffman_lengths(r_freq, 15), 256)
    b_codes = _write_prefix_code(bw, _huffman_lengths(b_freq, 15), 256)
    a_codes = _write_prefix_code(bw, _huffman_lengths(a_freq, 15), 256)
    d_codes = _write_prefix_code(bw, _huffman_lengths(d_freq, 15), 40)

    for kind, v in tokens:
        if kind == "lit":
            c, l = g_codes[int(gg[v])]
            bw.write_code(c, l)
            c, l = r_codes[int(rr[v])]
            bw.write_code(c, l)
            c, l = b_codes[int(bb[v])]
            bw.write_code(c, l)
            c, l = a_codes[int(aa[v])]
            bw.write_code(c, l)
        elif kind == "run":
            sym, ebits, evalue = _prefix_value_parts(v)
            c, l = g_codes[256 + sym]
            bw.write_code(c, l)
            if ebits:
                bw.write(evalue, ebits)
            dsym, debits, devalue = _prefix_value_parts(121)
            c, l = d_codes[dsym]
            bw.write_code(c, l)
            if debits:
                bw.write(devalue, debits)
        else:
            c, l = g_codes[280 + v]
            bw.write_code(c, l)

    payload = b"\x2f" + bw.getvalue()
    chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) % 2:
        chunk += b"\x00"
    riff = WEBP_FOURCC + chunk
    return WEBP_RIFF + struct.pack("<I", len(riff)) + riff
