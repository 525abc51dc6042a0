"""Pure stdlib+numpy JPEG (ITU-T T.81) codec — sequential AND progressive.

Closes the "JPEG second after PNG" gap with zero external dependencies:
``encode_jpeg`` / ``decode_jpeg`` implement the real pipeline — level
shift, 8x8 DCT, quantization (Annex K tables, libjpeg-convention quality
scaling), zigzag, differential DC + run-length AC Huffman coding with the
spec's standard code tables, byte stuffing, progressive multi-scan
transmission, and the whole thing in reverse. No counterpart in the
reference (fsql has no multimodal surface); the driver brief mandates
multimodal decode.

Scope (loud refusal outside it):

- Sequential DCT (SOF0/SOF1) AND progressive DCT (SOF2 — spectral
  selection + successive approximation, both directions: the decoder
  accumulates per-component coefficients across scans and reconstructs
  at EOI; the encoder writes a 4-kind scan script). 8-bit precision,
  Huffman entropy coding. Arithmetic coding, 12-bit, lossless and
  hierarchical modes raise NotImplementedError naming the feature.
- 1 component (grayscale) or 3 components (YCbCr, JFIF conversion)
  with sampling factors 1 or 2 per axis (covers 4:4:4, 4:2:2, 4:2:0).
- Restart markers (DRI/RSTn) are honored on decode.

Progressive correctness is pinned by an equivalence property, not just
round trips: the progressive transmission carries the SAME quantized
coefficients as the sequential one, so decode(progressive(img)) must
equal decode(sequential(img)) EXACTLY — asserted across random images,
all subsampling modes, and edge-block geometries in the test suite.

Determinism contract (what makes a JPEG entry ORACLE-ABLE): every
rounding step uses floor(x + 0.5), and both DCT directions snap their
float output to the nearest 1/256 (dyadic, exact in float64). True DCT
coefficients of a CONSTANT 8x8 block are exact integers (DC = 8*(v-128),
AC = 0), so the snap eliminates matmul ulps and the full encode->decode
round trip becomes exact integer arithmetic a SQL oracle can replicate:
with Q00 divisible by 8 (quality 50 gives the Annex K DC step of 16),
    decoded = clamp(floor(8*(v-128)/Q00 + 0.5) * Q00/8 + 128, 0, 255).
For general images the snap is a <1/512 perturbation, far inside the
quantizer's step (>= 1).

Performance shape: like ``codecs.py``, these run INSIDE Arrow-batched
mapInPandas kernels — one image per row, numpy for the blockwise DCT
(a single (n_blocks, 8, 8) tensor matmul per component), plain-Python
bit I/O only for the entropy layer.
"""

from __future__ import annotations

import struct

import numpy as np

from .codecs import CodecError

#: upper bound on decodable image area: coefficient state is allocated
#: from the SOF header alone, so untrusted dimensions must be capped
#: (64 MP ~ 1M blocks ~ 600 MB of coefficient lists at the extreme)
MAX_DECODE_PIXELS = 1 << 26

# --------------------------------------------------------------------------
# spec constants (ITU-T T.81 Annex K — public)
# --------------------------------------------------------------------------

#: Annex K.1 luminance / K.2 chrominance quantization tables (natural order)
QUANT_LUM = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    dtype=np.int32,
)
QUANT_CHROM = np.array(
    [
        [17, 18, 24, 47, 99, 99, 99, 99],
        [18, 21, 26, 66, 99, 99, 99, 99],
        [24, 26, 56, 99, 99, 99, 99, 99],
        [47, 66, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
    ],
    dtype=np.int32,
)

#: Annex K.3 standard Huffman tables: (bits[1..16], values)
HUFF_DC_LUM = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
HUFF_DC_CHROM = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
HUFF_AC_LUM = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
HUFF_AC_CHROM = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
        0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
        0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
        0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
        0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
        0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
        0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
        0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
        0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
        0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
        0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
for _bits, _vals in (HUFF_DC_LUM, HUFF_DC_CHROM, HUFF_AC_LUM, HUFF_AC_CHROM):
    assert sum(_bits) == len(_vals), "Huffman table BITS/HUFFVAL mismatch"


def _zigzag_order() -> np.ndarray:
    """The 64-entry zigzag permutation, generated (not transcribed): entry k
    is the natural-order index of the k-th zigzag coefficient."""
    order = sorted(
        ((r, c) for r in range(8) for c in range(8)),
        # even diagonals run bottom-left -> top-right (row descending = col
        # ascending), odd ones the reverse — the T.81 Figure 5 order
        key=lambda rc: (rc[0] + rc[1], rc[0] if (rc[0] + rc[1]) % 2 else rc[1]),
    )
    return np.array([r * 8 + c for r, c in order], dtype=np.int64)


ZIGZAG = _zigzag_order()  # natural index of each zigzag position
UNZIGZAG = np.argsort(ZIGZAG)  # zigzag position of each natural index

#: orthonormal 8-point DCT-II matrix: dct2(b) = C @ b @ C.T
_C = np.array(
    [
        [
            (np.sqrt(1.0 / 8.0) if k == 0 else np.sqrt(2.0 / 8.0))
            * np.cos((2 * n + 1) * k * np.pi / 16.0)
            for n in range(8)
        ]
        for k in range(8)
    ]
)


def _snap(x: np.ndarray) -> np.ndarray:
    """Snap to the nearest 1/256 (dyadic — exact in float64): kills matmul
    ulps so integer-valued true coefficients stay EXACT integers (the
    determinism contract in the module docstring)."""
    return np.floor(x * 256.0 + 0.5) / 256.0


def _round_half_up(x: np.ndarray) -> np.ndarray:
    return np.floor(x + 0.5)


def quality_scaled_table(base: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg-convention quality scaling (public): 1..100, 50 = the Annex K
    table verbatim."""
    if not 1 <= quality <= 100:
        raise ValueError(f"quality must be 1..100, got {quality}")
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * scale + 50) // 100, 1, 255).astype(np.int32)


# --------------------------------------------------------------------------
# bit I/O + Huffman
# --------------------------------------------------------------------------

class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, length: int) -> None:
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.nbits -= 8
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.out.append(0x00)

    def flush(self) -> None:
        pad = (8 - self.nbits % 8) % 8
        if pad:  # pad with 1-bits (spec convention)
            self.write((1 << pad) - 1, pad)
        self.acc = 0
        self.nbits = 0


def _destuff_scan(data: bytes, pos: int):
    """Pre-scan an entropy-coded segment ONCE: strip 0xFF00 stuffing,
    record RSTn boundaries (as destuffed offsets), find where the scan
    ends (the first real marker). Returns (clean_bytes, rst_offsets,
    rst_markers, end_pos). This turns the hot decode path into plain
    buffered bit reads with no per-byte marker logic."""
    parts = []
    rst_offsets = []
    rst_markers = []
    start = pos
    clean_len = 0
    while True:
        ff = data.find(0xFF, pos)
        if ff < 0:
            parts.append(data[start:])
            clean_len += len(data) - start
            return b"".join(parts), rst_offsets, rst_markers, len(data)
        nxt = data[ff + 1] if ff + 1 < len(data) else None
        if nxt == 0x00:  # stuffed data byte: keep the 0xFF, drop the 0x00
            parts.append(data[start : ff + 1])
            clean_len += ff + 1 - start
            pos = start = ff + 2
        elif nxt == 0xFF:  # fill byte preceding a marker (B.1.1.2): drop it
            parts.append(data[start:ff])
            clean_len += ff - start
            pos = start = ff + 1
        elif nxt is not None and 0xD0 <= nxt <= 0xD7:  # restart marker
            parts.append(data[start:ff])
            clean_len += ff - start
            rst_offsets.append(clean_len)
            rst_markers.append(nxt - 0xD0)
            pos = start = ff + 2
        else:  # real marker (or truncation) ends the scan
            parts.append(data[start:ff])
            clean_len += ff - start
            return b"".join(parts), rst_offsets, rst_markers, ff


class _BitReader:
    """Buffered MSB-first bit reader over a destuffed entropy segment.
    ``peek16`` may read past the end (zero-padded) so a terminal symbol
    can be matched by the lookup table; actually CONSUMING past the end
    raises."""

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0  # next unread byte
        self.buf = 0
        self.nbuf = 0  # bits in buf
        self.padded = 0  # pad bits appended past the real data

    def _fill(self, need: int) -> None:
        while self.nbuf < need:
            chunk = self.data[self.pos : self.pos + 4]
            if chunk:
                self.buf = (self.buf << (8 * len(chunk))) | int.from_bytes(chunk, "big")
                self.nbuf += 8 * len(chunk)
                self.pos += len(chunk)
            else:
                self.buf <<= 8
                self.nbuf += 8
                self.padded += 8
        if self.padded > 16:  # peek slack only — consumption ran past the end
            raise CodecError("JPEG: entropy data ran out")

    def peek16(self) -> int:
        self._fill(16)
        return (self.buf >> (self.nbuf - 16)) & 0xFFFF

    def consume(self, n: int) -> None:
        self.nbuf -= n
        self.buf &= (1 << self.nbuf) - 1

    def receive(self, length: int) -> int:
        if length == 0:
            return 0
        self._fill(length)
        v = (self.buf >> (self.nbuf - length)) & ((1 << length) - 1)
        self.consume(length)
        return v

    def byte_offset(self) -> int:
        """Destuffed offset of the next whole byte (for RST alignment)."""
        return self.pos - self.nbuf // 8

    def align(self) -> None:
        drop = self.nbuf % 8
        if drop:
            self.consume(drop)
        # drop whole buffered bytes too: restart decoding resumes exactly
        # at byte_offset, so rewind pos instead of keeping stale buffer
        self.pos -= self.nbuf // 8
        self.buf = 0
        self.nbuf = 0
        self.padded = 0


def _build_encode_table(bits: list, values: list) -> dict:
    """Canonical Huffman code assignment (spec C.2): symbol -> (code, len)."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return table


_ENC_DC = [_build_encode_table(*HUFF_DC_LUM), _build_encode_table(*HUFF_DC_CHROM)]
_ENC_AC = [_build_encode_table(*HUFF_AC_LUM), _build_encode_table(*HUFF_AC_CHROM)]
# dense array views for the vectorized encoder (symbol -> code/length)
_ENC_DC_ARR = None  # filled in after _enc_table_arrays is defined


#: decode-LUT cache keyed by the DHT payload — every image from the same
#: encoder family shares tables, and a 65k-entry LUT build costs more than
#: the entropy decode of a small image (profiled: 2.3 of 5 ms/img)
_DECODE_TABLE_CACHE: dict = {}


def _build_decode_table(bits: list, values: list) -> list:
    """Peek-16 lookup list: for any 16-bit window, entry ``(length << 8) |
    symbol`` (0 = invalid code). One PLAIN-LIST read per symbol replaces
    up to 16 per-bit dict probes (and beats numpy scalar indexing ~10x in
    this hot loop)."""
    key = (bytes(bits), bytes(values))
    cached = _DECODE_TABLE_CACHE.get(key)
    if cached is not None:
        return cached
    lut = np.zeros(1 << 16, dtype=np.int32)
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            lo = code << (16 - length)
            hi = (code + 1) << (16 - length)
            lut[lo:hi] = (length << 8) | values[k]
            code += 1
            k += 1
        code <<= 1
    out = lut.tolist()
    if len(_DECODE_TABLE_CACHE) > 64:  # bound: forget foreign one-off tables
        _DECODE_TABLE_CACHE.clear()
    _DECODE_TABLE_CACHE[key] = out
    return out


def _decode_symbol(reader: _BitReader, table: list) -> int:
    entry = table[reader.peek16()]
    if entry == 0:
        raise CodecError("JPEG: invalid Huffman code")
    reader.consume(entry >> 8)
    return entry & 0xFF


def _magnitude(v: int) -> tuple:
    """(size, appended-bits) per spec F.1.2.1: negatives code as v-1 in
    ``size`` bits."""
    size = int(abs(v)).bit_length()
    return size, (v if v >= 0 else v + (1 << size) - 1)


def _extend(received: int, size: int) -> int:
    if size == 0:
        return 0
    return received if received >= (1 << (size - 1)) else received - (1 << size) + 1


# --------------------------------------------------------------------------
# encoder
# --------------------------------------------------------------------------

def _fdct_blocks(plane: np.ndarray) -> np.ndarray:
    """(H, W) float -> (H//8 * W//8, 8, 8) snapped DCT coefficients."""
    h, w = plane.shape
    blocks = plane.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    return _snap(_C @ blocks @ _C.T)


def _enc_table_arrays(table: dict, n: int) -> tuple:
    """Dense (codes, lengths) int64 arrays for symbols 0..n-1 so the hot
    vectorized paths index arrays instead of dict lookups. Missing
    symbols keep length 0 (never emitted)."""
    codes = np.zeros(n, dtype=np.int64)
    lens = np.zeros(n, dtype=np.int64)
    for sym, (c, ln) in table.items():
        if sym < n:
            codes[sym] = c
            lens[sym] = ln
    return codes, lens


_POW2 = np.array([1 << i for i in range(17)], dtype=np.int64)

_ENC_DC_ARR = [_enc_table_arrays(t, 12) for t in _ENC_DC]


def _pack_symbols(vals: np.ndarray, lens: np.ndarray) -> bytes:
    """One entropy-coded segment from (value, length) symbol arrays:
    MSB-first concatenation, 1-bit padding to the byte boundary (the
    flush convention), 0xFF byte stuffing — a single numpy pass instead
    of per-bit ``_BitWriter`` calls. Only the low ``length`` bits of
    each value are read, matching ``_BitWriter.write``'s masking."""
    vals = np.asarray(vals, dtype=np.int64)
    lens = np.asarray(lens, dtype=np.int64)
    if vals.size == 0:
        return b""
    maxlen = int(lens.max())
    shifts = lens[:, None] - 1 - np.arange(maxlen, dtype=np.int64)[None, :]
    valid = shifts >= 0
    bits = ((vals[:, None] >> np.where(valid, shifts, 0)) & 1).astype(np.uint8)
    flat = bits[valid]
    pad = (-flat.size) % 8
    if pad:
        flat = np.concatenate([flat, np.ones(pad, np.uint8)])
    packed = np.packbits(flat)
    ff = np.nonzero(packed == 0xFF)[0]
    if ff.size:
        packed = np.insert(packed, ff + 1, 0)
    return packed.tobytes()


def _interleaved_order(comp_blocks, factors, mcus_y, mcus_x, ncomp):
    """Per component: (block indices in MCU-interleaved scan order, the
    global slot of each such block in the interleaved sequence). The
    slot arithmetic mirrors the nested (my, mx, ci, dy, dx) walk."""
    sizes = [factors[ci][0] * factors[ci][1] for ci in range(ncomp)]
    per_mcu = sum(sizes)
    nm = mcus_y * mcus_x
    my = np.arange(mcus_y)
    mx = np.arange(mcus_x)
    out = []
    off = 0
    for ci in range(ncomp):
        h_i, v_i = factors[ci]
        bx = comp_blocks[ci][1]
        dy = np.arange(v_i)
        dx = np.arange(h_i)
        bidx = (
            (my[:, None, None, None] * v_i + dy[None, None, :, None]) * bx
            + mx[None, :, None, None] * h_i
            + dx[None, None, None, :]
        )
        slots = np.arange(nm)[:, None] * per_mcu + off + np.arange(sizes[ci])[None, :]
        out.append((bidx.reshape(-1), slots.reshape(-1)))
        off += sizes[ci]
    return out, nm * per_mcu


def _dc_symbol_scatter(comp_blocks, orders, total, point_shift, restart_group=None):
    """Vectorized DC difference coding for every block of every
    component, scattered into global interleaved slot order. Returns
    (codev, codel, bitv, bitl): per slot the Huffman symbol and the
    appended magnitude bits (length 0 when size is 0).
    ``restart_group``: (restart_interval, factors) — resets the DC
    predictor at restart-segment boundaries (sequential mode only)."""
    codev = np.empty(total, dtype=np.int64)
    codel = np.empty(total, dtype=np.int64)
    bitv = np.empty(total, dtype=np.int64)
    bitl = np.empty(total, dtype=np.int64)
    for ci, (bidx, slots) in enumerate(orders):
        ca, la = _ENC_DC_ARR[0 if ci == 0 else 1]
        zz = comp_blocks[ci][2]
        dcv = zz[bidx, 0].astype(np.int64) >> point_shift
        diffs = np.empty_like(dcv)
        if dcv.size:
            diffs[0] = dcv[0]
            np.subtract(dcv[1:], dcv[:-1], out=diffs[1:])
        if restart_group:
            # predictor resets at restart boundaries: the component's
            # first block of each segment diffs against 0
            h_i, v_i = restart_group[1][ci]
            diffs[:: restart_group[0] * h_i * v_i] = dcv[:: restart_group[0] * h_i * v_i]
        absd = np.abs(diffs)
        sizes = np.searchsorted(_POW2[:16], absd, side="right")  # == bit_length
        bits = np.where(diffs >= 0, diffs, diffs + _POW2[sizes] - 1)
        codev[slots] = ca[sizes]
        codel[slots] = la[sizes]
        bitv[slots] = bits
        bitl[slots] = sizes
    return codev, codel, bitv, bitl


def _ac_seq_symbols(va: list, la: list, ac_tab: dict, row) -> None:
    """Sequential AC run/size coding for one block; ``row`` is the
    zigzagged tail (63 entries). Appends (value, length) symbols."""
    nz = np.nonzero(row)[0]
    if nz.size == 0:
        c, ln = ac_tab[0x00]  # EOB
        va.append(c)
        la.append(ln)
        return
    zc, zl = ac_tab[0xF0]  # ZRL
    prev = -1
    for p in nz:
        run = p - prev - 1
        while run > 15:
            va.append(zc)
            la.append(zl)
            run -= 16
        size, bits = _magnitude(int(row[p]))
        c, ln = ac_tab[(run << 4) | size]
        va.append(c)
        la.append(ln)
        va.append(bits)
        la.append(size)
        prev = p
    if nz[-1] != row.size - 1:
        c, ln = ac_tab[0x00]
        va.append(c)
        la.append(ln)


def _ac_first_symbols(va: list, la: list, ac_tab: dict, m_row, sign_row) -> None:
    """Progressive AC first-scan coding for one block (G.1.2.2 shape).
    ``m_row`` holds the point-transformed magnitudes, ``sign_row`` the
    raw coefficients. Blocks ending in EOB state flush an EOB0
    IMMEDIATELY — the standard AC tables carry no EOBn (n>0) symbols,
    so runs cannot span blocks (the decoder still accepts foreign
    EOBn)."""
    nz = np.nonzero(m_row)[0]
    if nz.size == 0:
        c, ln = ac_tab[0x00]  # EOB0
        va.append(c)
        la.append(ln)
        return
    zc, zl = ac_tab[0xF0]
    prev = -1
    for p in nz:
        run = p - prev - 1
        while run > 15:
            va.append(zc)
            la.append(zl)
            run -= 16
        m = int(m_row[p])
        size, bits = _magnitude(m if sign_row[p] >= 0 else -m)
        c, ln = ac_tab[(run << 4) | size]
        va.append(c)
        la.append(ln)
        va.append(bits)
        la.append(size)
        prev = p
    if nz[-1] != m_row.size - 1:
        c, ln = ac_tab[0x00]
        va.append(c)
        la.append(ln)


def _ac_refine_symbols(va: list, la: list, ac_tab: dict, m_row, sign_row) -> None:
    """Progressive AC refinement coding for one block (G.1.2.3):
    correction bits for history coefficients ride AFTER the next emitted
    symbol; a block ending in EOB state flushes EOB0 + its remaining
    correction bits immediately (EOB0-only discipline, as above)."""
    nz = np.nonzero(m_row)[0]
    ec, el = ac_tab[0x00]
    if nz.size == 0:
        va.append(ec)
        la.append(el)
        return
    ones = nz[m_row[nz] == 1]
    eob = int(ones[-1]) if ones.size else -1
    zc, zl = ac_tab[0xF0]
    last = m_row.size - 1
    prev = -1
    run = 0
    br: list = []
    ended_clean = False
    for p in nz:
        run += p - prev - 1
        prev = p
        while run > 15 and p <= eob:
            va.append(zc)
            la.append(zl)
            run -= 16
            va.extend(br)
            la.extend([1] * len(br))
            br = []
        m = int(m_row[p])
        if m > 1:  # history coefficient: one correction bit, deferred
            br.append(m & 1)
            continue
        c, ln = ac_tab[(run << 4) | 1]
        va.append(c)
        la.append(ln)
        va.append(1 if sign_row[p] >= 0 else 0)
        la.append(1)
        va.extend(br)
        la.extend([1] * len(br))
        br = []
        run = 0
        ended_clean = p == last
    run += last - prev
    if run > 0 or br or not ended_clean:
        va.append(ec)
        la.append(el)
        va.extend(br)
        la.extend([1] * len(br))


def _progressive_scans(comp_blocks, factors, mcus_y, mcus_x, ncomp, height, width):
    """The SOF2 scan script: DC first (Al=1) interleaved, per-component
    AC first 1..63 (Al=1), DC refine, per-component AC refine — every
    progressive scan kind exercised, and the accumulated coefficients
    equal the sequential transmission exactly."""
    scans = []

    def sos(sel, ss, se, ah, al):
        p = struct.pack(">B", len(sel))
        for ci in sel:
            t = 0 if ci == 0 else 1
            p += struct.pack(">BB", ci + 1, (t << 4) | t)
        return p + struct.pack(">BBB", ss, se, (ah << 4) | al)

    all_comps = list(range(ncomp))
    hmax = max(f[0] for f in factors[:ncomp])
    vmax = max(f[1] for f in factors[:ncomp])

    def ni_order(ci):
        """Non-interleaved scans cover the component's OWN block grid
        (B.2.3), row-major, strided by the MCU-grid row width — the same
        geometry the decoder walks. MCU padding blocks are skipped; their
        pixels crop away."""
        bx = comp_blocks[ci][1]
        h_i, v_i = factors[ci]
        bw = -(-(-(-width * h_i // hmax)) // 8)
        bh = -(-(-(-height * v_i // vmax)) // 8)
        return (np.arange(bh)[:, None] * bx + np.arange(bw)[None, :]).reshape(-1)

    orders, total = _interleaved_order(comp_blocks, factors, mcus_y, mcus_x, ncomp)

    # scan 1: DC first, Al=1, interleaved over all components (vectorized
    # diff/size/bits, scattered into slot order)
    codev, codel, bitv, bitl = _dc_symbol_scatter(comp_blocks, orders, total, 1)
    v2 = np.stack([codev, bitv], axis=1).reshape(-1)
    l2 = np.stack([codel, bitl], axis=1).reshape(-1)
    keep = l2 > 0
    scans.append((sos(all_comps, 0, 0, 0, 1), _pack_symbols(v2[keep], l2[keep])))

    # scan 2 per component: AC first 1..63, Al=1 (non-interleaved grid).
    # The all-blocks-EOB case (every shifted magnitude zero — e.g. the
    # constant-block corpus) collapses to a vectorized EOB0 run.
    for ci in all_comps:
        zz = comp_blocks[ci][2]
        ac_tab = _ENC_AC[0 if ci == 0 else 1]
        order = ni_order(ci)
        tails = zz[order, 1:]
        mags = np.abs(tails.astype(np.int64)) >> 1
        has_ac = mags.any(axis=1)
        ec, el = ac_tab[0x00]
        if not has_ac.any():
            vals = np.full(order.size, ec, dtype=np.int64)
            lens = np.full(order.size, el, dtype=np.int64)
        else:
            va: list = []
            la: list = []
            for b in range(order.size):
                if not has_ac[b]:
                    va.append(ec)
                    la.append(el)
                else:
                    _ac_first_symbols(va, la, ac_tab, mags[b], tails[b])
            vals, lens = np.array(va, dtype=np.int64), np.array(la, dtype=np.int64)
        scans.append((sos([ci], 1, 63, 0, 1), _pack_symbols(vals, lens)))

    # scan 3: DC refine (Ah=1, Al=0): one raw bit per block, no Huffman
    dcbits = np.empty(total, dtype=np.int64)
    for ci, (bidx, slots) in enumerate(orders):
        dcbits[slots] = comp_blocks[ci][2][bidx, 0].astype(np.int64) & 1
    scans.append(
        (sos(all_comps, 0, 0, 1, 0), _pack_symbols(dcbits, np.ones(total, np.int64)))
    )

    # scan 4 per component: AC refine (Ah=1, Al=0)
    for ci in all_comps:
        zz = comp_blocks[ci][2]
        ac_tab = _ENC_AC[0 if ci == 0 else 1]
        order = ni_order(ci)
        tails = zz[order, 1:]
        mags = np.abs(tails.astype(np.int64))
        has_ac = mags.any(axis=1)
        ec, el = ac_tab[0x00]
        if not has_ac.any():
            vals = np.full(order.size, ec, dtype=np.int64)
            lens = np.full(order.size, el, dtype=np.int64)
        else:
            va = []
            la = []
            for b in range(order.size):
                if not has_ac[b]:
                    va.append(ec)
                    la.append(el)
                else:
                    _ac_refine_symbols(va, la, ac_tab, mags[b], tails[b])
            vals, lens = np.array(va, dtype=np.int64), np.array(la, dtype=np.int64)
        scans.append((sos([ci], 1, 63, 1, 0), _pack_symbols(vals, lens)))
    return scans


def _pad_to(plane: np.ndarray, mh: int, mw: int) -> np.ndarray:
    """Edge-replicate to multiples of (mh, mw) — the spec's recommended
    extension, and replication keeps constant blocks constant."""
    h, w = plane.shape
    return np.pad(
        plane, ((0, (-h) % mh), (0, (-w) % mw)), mode="edge"
    )


def encode_jpeg(
    arr: np.ndarray,
    quality: int = 50,
    subsampling: str = "4:4:4",
    restart_interval: int = 0,
    progressive: bool = False,
) -> bytes:
    """Encode a uint8 array — (H, W) grayscale or (H, W, 3) RGB — as a
    baseline JFIF JPEG (SOF0, standard Huffman tables, Annex K quant
    tables scaled by ``quality``). ``subsampling``: '4:4:4' or '4:2:0'
    (3-component only). ``restart_interval`` > 0 writes DRI + RSTn
    markers every that many MCUs (error-resilience segmentation — also
    exercises the decoder's restart path; sequential mode only).
    ``progressive`` writes an SOF2 multi-scan file — DC first (Al=1),
    per-component AC first (Al=1), DC refine, per-component AC refine —
    which decodes IDENTICALLY to the sequential file (same quantized
    coefficients, reordered transmission). Deterministic: same array ->
    same bytes."""
    if arr.dtype != np.uint8:
        raise ValueError(f"encode_jpeg needs uint8, got {arr.dtype}")
    if arr.ndim == 3 and arr.shape[2] == 1:
        arr = arr[:, :, 0]
    gray = arr.ndim == 2
    if not gray and (arr.ndim != 3 or arr.shape[2] != 3):
        raise ValueError(f"unsupported array shape {arr.shape}")
    if arr.shape[0] == 0 or arr.shape[1] == 0:
        raise ValueError("cannot encode a zero-sized image")
    if subsampling not in ("4:4:4", "4:2:0"):
        raise ValueError(f"subsampling must be '4:4:4' or '4:2:0', got {subsampling}")
    if progressive and restart_interval:
        raise ValueError("restart_interval is only supported in sequential mode")
    sub = (not gray) and subsampling == "4:2:0"
    height, width = arr.shape[0], arr.shape[1]

    qlum = quality_scaled_table(QUANT_LUM, quality)
    qchrom = quality_scaled_table(QUANT_CHROM, quality)

    if gray:
        planes = [arr.astype(np.float64)]
    else:
        rgb = arr.astype(np.float64)
        r, g, b = rgb[:, :, 0], rgb[:, :, 1], rgb[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        planes = [
            np.clip(_round_half_up(p), 0, 255) for p in (y, cb, cr)
        ]
        if sub:  # 2x2 mean, floor(x+0.5) for determinism
            for i in (1, 2):
                p = _pad_to(planes[i], 2, 2)
                planes[i] = _round_half_up(
                    (p[0::2, 0::2] + p[0::2, 1::2] + p[1::2, 0::2] + p[1::2, 1::2]) / 4.0
                )

    # component geometry: (h_i, v_i) sampling factors
    factors = [(1, 1)] if gray else ([(2, 2), (1, 1), (1, 1)] if sub else [(1, 1), (1, 1), (1, 1)])
    hmax = max(f[0] for f in factors)
    vmax = max(f[1] for f in factors)

    # quantize each component's blocks, in MCU-interleaved order
    comp_blocks = []  # per component: (blocks_y, blocks_x, zz (n,64))
    for ci, plane in enumerate(planes):
        h_i, v_i = factors[ci]
        # pad each component to the size the MCU grid implies
        mcus_y = -(-height // (8 * vmax))
        mcus_x = -(-width // (8 * hmax))
        th, tw = mcus_y * 8 * v_i, mcus_x * 8 * h_i
        p = plane[: min(plane.shape[0], th), : min(plane.shape[1], tw)]
        p = np.pad(p, ((0, th - p.shape[0]), (0, tw - p.shape[1])), mode="edge")
        coefs = _fdct_blocks(p - 128.0)
        q = (qlum if ci == 0 else qchrom).astype(np.float64)
        zz = _round_half_up(coefs / q).astype(np.int32).reshape(-1, 64)[:, ZIGZAG]
        comp_blocks.append((th // 8, tw // 8, zz))

    # entropy-encode
    enc_dc = _ENC_DC  # fixed standard tables — built once at import
    enc_ac = _ENC_AC
    mcus_y = -(-height // (8 * vmax))
    mcus_x = -(-width // (8 * hmax))
    ncomp = 1 if gray else 3
    if progressive:
        scans = _progressive_scans(
            comp_blocks, factors, mcus_y, mcus_x, ncomp, height, width
        )
    else:
        orders, total = _interleaved_order(comp_blocks, factors, mcus_y, mcus_x, ncomp)
        rg = (restart_interval, factors) if restart_interval else None
        codev, codel, bitv, bitl = _dc_symbol_scatter(comp_blocks, orders, total, 0, rg)
        # per-slot component table index and AC-presence, in slot order
        tab_seq = np.empty(total, dtype=np.int64)
        bidx_seq = np.empty(total, dtype=np.int64)
        ci_seq = np.empty(total, dtype=np.int64)
        hasac_seq = np.empty(total, dtype=bool)
        for ci, (bidx, slots) in enumerate(orders):
            tab_seq[slots] = 0 if ci == 0 else 1
            ci_seq[slots] = ci
            bidx_seq[slots] = bidx
            hasac_seq[slots] = (comp_blocks[ci][2][:, 1:] != 0).any(axis=1)[bidx]

        def seq_symbols(lo: int, hi: int) -> tuple:
            """(vals, lens) for slots [lo, hi): DC symbol + bits + AC coding."""
            if not hasac_seq[lo:hi].any():
                # every block ends at the DC coefficient: DC symbol, DC
                # bits, EOB — fully vectorized
                eob = np.array([enc_ac[0][0x00], enc_ac[1][0x00]], dtype=np.int64)
                ts = tab_seq[lo:hi]
                v3 = np.stack([codev[lo:hi], bitv[lo:hi], eob[ts, 0]], axis=1).reshape(-1)
                l3 = np.stack([codel[lo:hi], bitl[lo:hi], eob[ts, 1]], axis=1).reshape(-1)
                keep = l3 > 0
                return v3[keep], l3[keep]
            va: list = []
            la: list = []
            for s in range(lo, hi):
                va.append(codev[s])
                la.append(codel[s])
                if bitl[s]:
                    va.append(bitv[s])
                    la.append(bitl[s])
                ac_tab = enc_ac[tab_seq[s]]
                if not hasac_seq[s]:
                    c, ln = ac_tab[0x00]
                    va.append(c)
                    la.append(ln)
                else:
                    _ac_seq_symbols(
                        va, la, ac_tab, comp_blocks[ci_seq[s]][2][bidx_seq[s], 1:]
                    )
            return np.array(va, dtype=np.int64), np.array(la, dtype=np.int64)

        per_mcu = total // (mcus_y * mcus_x)
        if restart_interval:
            entropy = bytearray()
            step = restart_interval * per_mcu
            rst_n = 0
            for lo in range(0, total, step):
                if lo:
                    entropy += bytes([0xFF, 0xD0 + rst_n])
                    rst_n = (rst_n + 1) & 7
                entropy += _pack_symbols(*seq_symbols(lo, min(lo + step, total)))
            entropy = bytes(entropy)
        else:
            entropy = _pack_symbols(*seq_symbols(0, total))
        sos = struct.pack(">B", ncomp)
        for ci in range(ncomp):
            t = 0 if ci == 0 else 1
            sos += struct.pack(">BB", ci + 1, (t << 4) | t)
        sos += b"\x00\x3f\x00"
        scans = [(sos, entropy)]

    # --- assemble the stream ---
    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")  # APP0
    out += seg(0xFFDB, b"\x00" + bytes(qlum.reshape(64)[ZIGZAG].astype(np.uint8)))
    if not gray:
        out += seg(0xFFDB, b"\x01" + bytes(qchrom.reshape(64)[ZIGZAG].astype(np.uint8)))
    sof = struct.pack(">BHHB", 8, height, width, ncomp)
    for ci in range(ncomp):
        h_i, v_i = factors[ci]
        sof += struct.pack(">BBB", ci + 1, (h_i << 4) | v_i, 0 if ci == 0 else 1)
    out += seg(0xFFC2 if progressive else 0xFFC0, sof)
    for tclass, tid, (bits, vals) in (
        (0, 0, HUFF_DC_LUM),
        (1, 0, HUFF_AC_LUM),
        (0, 1, HUFF_DC_CHROM),
        (1, 1, HUFF_AC_CHROM),
    ):
        if gray and tid == 1:
            continue
        out += seg(0xFFC4, bytes([(tclass << 4) | tid]) + bytes(bits) + bytes(vals))
    if restart_interval:
        out += seg(0xFFDD, struct.pack(">H", restart_interval))
    for sos_payload, entropy in scans:
        out += seg(0xFFDA, sos_payload)
        out += entropy
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# --------------------------------------------------------------------------
# decoder
# --------------------------------------------------------------------------

def decode_jpeg(data: bytes) -> np.ndarray:
    """Decode a baseline (SOF0/1) or progressive (SOF2) JPEG byte string
    to a uint8 array — (H, W) for one component, (H, W, 3) RGB for three
    (JFIF YCbCr conversion). Progressive files accumulate coefficients
    across scans (spectral selection + successive approximation, the
    full F.2.2/G.2 machinery) and reconstruct once at EOI. Refuses
    corrupt structure with :class:`CodecError` and out-of-scope modes
    (arithmetic coding / hierarchical / 12-bit) with
    NotImplementedError."""
    if len(data) < 4 or data[0] != 0xFF or data[1] != 0xD8:
        raise CodecError("not a JPEG (missing SOI)")
    pos = 2
    qtables: dict = {}
    dc_tables: dict = {}
    ac_tables: dict = {}
    frame = None  # (height, width, comps, progressive)
    state = None  # per-component coefficient buffers (zigzag order)
    restart_interval = 0
    saw_scan = False

    while pos + 1 < len(data):
        if data[pos] != 0xFF:
            raise CodecError(f"JPEG: expected marker at byte {pos}")
        marker = data[pos + 1]
        if marker == 0xFF:  # spec-legal fill byte (B.1.1.2): any number of
            pos += 1  # 0xFFs may pad before a marker — consume one
            continue
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01, *range(0xD0, 0xD8)):  # standalone
            continue
        if pos + 2 > len(data):
            raise CodecError("JPEG: truncated segment header")
        (length,) = struct.unpack(">H", data[pos : pos + 2])
        payload = data[pos + 2 : pos + length]
        if len(payload) != length - 2:
            raise CodecError("JPEG: truncated segment payload")
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(payload):
                pq, tq = payload[p] >> 4, payload[p] & 0x0F
                if pq != 0:
                    raise NotImplementedError("JPEG: 16-bit quant tables not supported")
                if p + 65 > len(payload):
                    raise CodecError("JPEG DQT: truncated table")
                zz = np.frombuffer(payload[p + 1 : p + 65], dtype=np.uint8).astype(np.int32)
                qtables[tq] = zz[UNZIGZAG].reshape(8, 8)
                p += 65
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(payload):
                if p + 17 > len(payload):
                    raise CodecError("JPEG DHT: truncated table header")
                tc, th = payload[p] >> 4, payload[p] & 0x0F
                bits = list(payload[p + 1 : p + 17])
                n = sum(bits)
                vals = list(payload[p + 17 : p + 17 + n])
                if len(vals) != n:
                    raise CodecError("JPEG DHT: truncated table")
                (dc_tables if tc == 0 else ac_tables)[th] = _build_decode_table(bits, vals)
                p += 17 + n
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 (sequential) / SOF2 (progressive)
            if len(payload) < 6:
                raise CodecError("JPEG SOF: truncated header")
            precision, height, width, ncomp = struct.unpack(">BHHB", payload[:6])
            if precision != 8:
                raise NotImplementedError(f"JPEG: {precision}-bit precision not supported")
            if width == 0 or height == 0:
                raise CodecError("JPEG: zero-sized frame")
            if width * height > MAX_DECODE_PIXELS:
                # coefficient buffers allocate from these header fields
                # BEFORE any entropy data arrives — a 30-byte crafted file
                # must not OOM the executor (fuzz/review find)
                raise CodecError(
                    f"JPEG: {width}x{height} exceeds the decode cap of "
                    f"{MAX_DECODE_PIXELS} pixels"
                )
            if len(payload) < 6 + 3 * ncomp:
                raise CodecError("JPEG SOF: truncated component list")
            comps = []
            for i in range(ncomp):
                cid, hv, tq = struct.unpack(">BBB", payload[6 + 3 * i : 9 + 3 * i])
                h_i, v_i = hv >> 4, hv & 0x0F
                if h_i not in (1, 2) or v_i not in (1, 2):
                    raise NotImplementedError(
                        f"JPEG: sampling factor {h_i}x{v_i} not supported (1 or 2)"
                    )
                comps.append((cid, h_i, v_i, tq))
            if ncomp not in (1, 3):
                raise NotImplementedError(f"JPEG: {ncomp}-component images not supported")
            frame = (height, width, comps, marker == 0xC2)
            state = _alloc_coef_state(height, width, comps)
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "JPEG: only sequential (SOF0/SOF1) and progressive (SOF2) "
                "Huffman modes are supported"
            )
        elif marker == 0xDD:  # DRI
            if len(payload) < 2:
                raise CodecError("JPEG DRI: truncated")
            (restart_interval,) = struct.unpack(">H", payload[:2])
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise CodecError("JPEG: SOS before SOF")
            if not payload:
                raise CodecError("JPEG: empty SOS header")
            ns = payload[0]
            if len(payload) < 1 + 2 * ns + 3:
                raise CodecError("JPEG: truncated SOS header")
            scan_sel = []
            for i in range(ns):
                cs, tt = payload[1 + 2 * i], payload[2 + 2 * i]
                scan_sel.append((cs, tt >> 4, tt & 0x0F))
            ss = payload[1 + 2 * ns]
            se = payload[2 + 2 * ns]
            ah = payload[3 + 2 * ns] >> 4
            al = payload[3 + 2 * ns] & 0x0F
            if not frame[3]:  # sequential: full band, no approximation
                ss, se, ah, al = 0, 63, 0, 0
            pos = _decode_sos(
                data, pos + length, frame, state, scan_sel,
                dc_tables, ac_tables, restart_interval, ss, se, ah, al,
            )
            saw_scan = True
            continue  # pos already advanced past entropy data
        pos += length
    if not saw_scan:
        raise CodecError("JPEG: no scan decoded")
    return _reconstruct(frame, state, qtables)


def _alloc_coef_state(height, width, comps):
    """Per-component zigzag coefficient buffers, MCU-grid sized (the
    superset of both interleaved and non-interleaved scan geometries) —
    plain lists of lists: progressive refinement is read-modify-write per
    coefficient, where list indexing beats numpy scalar access ~10x."""
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus_y = -(-height // (8 * vmax))
    mcus_x = -(-width // (8 * hmax))
    state = []
    for cid, h_i, v_i, tq in comps:
        by, bx = mcus_y * v_i, mcus_x * h_i
        # non-interleaved scans cover only the component's OWN block grid
        bw = -(-(-(-width * h_i // hmax)) // 8)
        bh = -(-(-(-height * v_i // vmax)) // 8)
        state.append({
            "coef": [[0] * 64 for _ in range(by * bx)],
            "by": by, "bx": bx, "bw": bw, "bh": bh,
        })
    return state


def _decode_sos(data, pos, frame, state, scan_sel, dc_tables, ac_tables,
                restart_interval, ss, se, ah, al):
    height, width, comps, progressive = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus_y = -(-height // (8 * vmax))
    mcus_x = -(-width // (8 * hmax))
    if not 0 <= ss <= se <= 63 or al > 13:
        raise CodecError(f"JPEG: bad spectral range {ss}..{se}")
    if ss > 0 and len(scan_sel) != 1:
        raise CodecError("JPEG: AC scans must be single-component")

    # resolve scan components -> (state_idx, dc_table, ac_table, h, v)
    order = []
    for cs, td, ta in scan_sel:
        ci = next((i for i, c in enumerate(comps) if c[0] == cs), None)
        if ci is None:
            raise CodecError(f"JPEG: scan references unknown component {cs}")
        dc_tab = dc_tables.get(td)
        ac_tab = ac_tables.get(ta)
        if ss == 0 and ah == 0 and dc_tab is None:
            raise CodecError("JPEG: scan references an undefined DC table")
        if se > 0 and ac_tab is None:
            # every scan that touches AC coefficients needs its table —
            # including the (spec-dubious) full-band ss=0/se=63 case
            raise CodecError("JPEG: scan references an undefined AC table")
        order.append((ci, dc_tab, ac_tab, comps[ci][1], comps[ci][2]))

    clean, rst_offsets, rst_markers, end_pos = _destuff_scan(data, pos)
    reader = _BitReader(clean)
    rst_i = 0
    rst_n = 0
    preds = [0] * len(comps)
    eobrun = 0
    unit_count = 0

    def maybe_restart():
        nonlocal rst_i, rst_n, preds, eobrun
        if restart_interval and unit_count and unit_count % restart_interval == 0:
            reader.align()
            if rst_i >= len(rst_offsets) or rst_offsets[rst_i] != reader.byte_offset():
                raise CodecError(f"JPEG: expected RST{rst_n} marker")
            if rst_markers[rst_i] != rst_n:
                raise CodecError(f"JPEG: expected RST{rst_n}, found RST{rst_markers[rst_i]}")
            rst_i += 1
            rst_n = (rst_n + 1) & 7
            preds = [0] * len(comps)
            eobrun = 0

    interleaved = len(scan_sel) > 1
    if ss == 0:  # DC scan (or full sequential band)
        full_band = se == 63  # sequential single-scan fast path
        for my in range(mcus_y if interleaved else 1):
            for mx in range(mcus_x if interleaved else 1):
                if interleaved:
                    maybe_restart()
                    unit_count += 1
                for oi, (ci, dc_tab, ac_tab, h_i, v_i) in enumerate(order):
                    st = state[ci]
                    coef = st["coef"]
                    if interleaved:
                        spans = [
                            (my * v_i + dy) * st["bx"] + mx * h_i + dx
                            for dy in range(v_i) for dx in range(h_i)
                        ]
                    else:
                        spans = None  # iterate the component grid below
                    for bidx in (spans if spans is not None else _ni_blocks(st)):
                        if not interleaved:
                            maybe_restart()
                            unit_count += 1
                        cof = coef[bidx]
                        if ah == 0:  # DC first (or sequential)
                            size = _decode_symbol(reader, dc_tab)
                            if size > 11:
                                raise CodecError("JPEG: DC size out of range")
                            preds[ci] += _extend(reader.receive(size), size)
                            cof[0] = preds[ci] << al
                            if full_band:
                                _seq_ac_block(reader, ac_tab, cof)
                        else:  # DC refine: one appended bit per block
                            if reader.receive(1):
                                cof[0] |= 1 << al
    else:  # AC scan: single component, its own block grid
        ci, _dc, ac_tab, h_i, v_i = order[0]
        st = state[ci]
        coef = st["coef"]
        for bidx in _ni_blocks(st):
            maybe_restart()
            unit_count += 1
            cof = coef[bidx]
            if ah == 0:
                eobrun = _ac_first_block(reader, ac_tab, cof, ss, se, al, eobrun)
            else:
                eobrun = _ac_refine_block(reader, ac_tab, cof, ss, se, al, eobrun)
    return end_pos


def _ni_blocks(st):
    """Row-major block indices of a component's OWN grid inside its
    MCU-grid-strided buffer (non-interleaved scan geometry, B.2.3)."""
    bx = st["bx"]
    for r in range(st["bh"]):
        base = r * bx
        for c in range(st["bw"]):
            yield base + c


def _seq_ac_block(reader, ac_tab, cof):
    """Sequential AC 1..63 for one block (the baseline hot loop)."""
    k = 1
    while k < 64:
        entry = ac_tab[reader.peek16()]
        if entry == 0:
            raise CodecError("JPEG: invalid Huffman code")
        reader.consume(entry >> 8)
        rs = entry & 0xFF
        run, size = rs >> 4, rs & 0x0F
        if size == 0:
            if run == 15:  # ZRL
                k += 16
                continue
            break  # EOB
        k += run
        if k > 63:
            raise CodecError("JPEG: AC run past block end")
        cof[k] = _extend(reader.receive(size), size)
        k += 1


def _ac_first_block(reader, ac_tab, cof, ss, se, al, eobrun):
    """Progressive AC first scan for one block (F.2.2.2 / jdphuff shape)."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = _decode_symbol(reader, ac_tab)
        run, size = rs >> 4, rs & 0x0F
        if size == 0:
            if run == 15:  # ZRL
                k += 16
                continue
            eobrun = (1 << run) + (reader.receive(run) if run else 0) - 1
            return eobrun
        k += run
        if k > se:
            raise CodecError("JPEG: AC run past spectral band end")
        cof[k] = _extend(reader.receive(size), size) << al
        k += 1
    return 0


def _ac_refine_block(reader, ac_tab, cof, ss, se, al, eobrun):
    """Progressive AC refinement for one block (G.2 successive
    approximation: correction bits for known coefficients, +-1<<Al for
    newly nonzero ones, EOB runs covering trailing corrections)."""
    p1 = 1 << al
    m1 = -p1
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = _decode_symbol(reader, ac_tab)
            run, size = rs >> 4, rs & 0x0F
            newval = 0
            if size != 0:
                if size != 1:
                    raise CodecError("JPEG: AC refine size must be 1")
                newval = p1 if reader.receive(1) else m1
            else:
                if run != 15:
                    eobrun = (1 << run) + (reader.receive(run) if run else 0)
                    break  # fall through to the EOB correction sweep
                # ZRL: skip 16 zero-history positions (with corrections)
            while k <= se:
                c = cof[k]
                if c != 0:
                    if reader.receive(1) and (c & p1) == 0:
                        cof[k] = c + (p1 if c >= 0 else m1)
                else:
                    if run == 0:
                        break
                    run -= 1
                k += 1
            if newval and k <= se:
                cof[k] = newval
            k += 1
    if eobrun > 0:
        while k <= se:
            c = cof[k]
            if c != 0 and reader.receive(1) and (c & p1) == 0:
                cof[k] = c + (p1 if c >= 0 else m1)
            k += 1
        eobrun -= 1
    return eobrun


def _reconstruct(frame, state, qtables):
    """Dequantize + IDCT every component (ONE batched tensor matmul each),
    upsample, level shift, color convert, crop."""
    height, width, comps, _prog = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    full = []
    for ci, (cid, h_i, v_i, tq) in enumerate(comps):
        if tq not in qtables:
            raise CodecError(f"JPEG: component references undefined quant table {tq}")
        st = state[ci]
        by, bx = st["by"], st["bx"]
        q = qtables[tq].astype(np.float64)
        blocks = np.asarray(st["coef"], dtype=np.float64)[:, UNZIGZAG].reshape(-1, 8, 8) * q
        px = _snap(_C.T @ blocks @ _C)
        p = px.reshape(by, bx, 8, 8).transpose(0, 2, 1, 3).reshape(by * 8, bx * 8)
        if h_i != hmax or v_i != vmax:
            p = np.repeat(np.repeat(p, vmax // v_i, axis=0), hmax // h_i, axis=1)
        full.append(p[:height, :width])
    if len(full) == 1:
        return np.clip(_round_half_up(full[0] + 128.0), 0, 255).astype(np.uint8)
    y, cb, cr = full[0] + 128.0, full[1] + 128.0, full[2] + 128.0
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.stack(
        [np.clip(_round_half_up(c), 0, 255).astype(np.uint8) for c in (r, g, b)], axis=2
    )
