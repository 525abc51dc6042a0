"""Independent VP8L bitstream assembler for interop fixtures.

INDEPENDENCE CONTRACT: this module deliberately imports NOTHING from
fsql_spark.operators.webp. Every table and rule here is written from the
WebP Lossless Bitstream Specification (RFC 9649; also published as the
libwebp "WebP Lossless Bitstream Specification" document), so the streams
it assembles and the pixel expectations derived from it constitute an
independent transcription path. Ground truth for every committed fixture
is additionally established by decoding with the SYSTEM reference codec
(libwebp.so via tools/webp_ref.py) at generation time.

Bit order (spec "4 Bitstream"): bits are packed into bytes LSB-first;
prefix codes are written MSB-of-the-code first in stream order.
"""

from __future__ import annotations

import struct

# ---------------------------------------------------------------------------
# spec tables
# ---------------------------------------------------------------------------

#: Spec §"Decoding the distance": the first 120 distance codes map to a
#: 2D neighborhood of (dx, dy) offsets; dist = dy * xsize + dx, clamped
#: to a minimum of 1. Entries are ordered by increasing dx*dx+dy*dy with
#: smaller dx first on ties — EXCEPT entries 111..114 (0-based), where
#: the published table orders (7,6) pairs before (6,7) pairs, breaking
#: the tie pattern every other norm-tie in the table follows. The
#: generation script resolves that ordering against the system libwebp
#: decoder (see make_webp_fixtures.py); the list below records the
#: RESOLVED ground truth.
SPEC_DISTANCE_MAP = [
    (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
    (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
    (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
    (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
    (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
    (1, 5), (-1, 5), (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2),
    (4, 4), (-4, 4), (3, 5), (-3, 5), (5, 3), (-5, 3), (0, 6), (6, 0),
    (1, 6), (-1, 6), (6, 1), (-6, 1), (2, 6), (-2, 6), (6, 2), (-6, 2),
    (4, 5), (-4, 5), (5, 4), (-5, 4), (3, 6), (-3, 6), (6, 3), (-6, 3),
    (0, 7), (7, 0), (1, 7), (-1, 7), (5, 5), (-5, 5), (7, 1), (-7, 1),
    (4, 6), (-4, 6), (6, 4), (-6, 4), (2, 7), (-2, 7), (7, 2), (-7, 2),
    (3, 7), (-3, 7), (7, 3), (-7, 3), (5, 6), (-5, 6), (6, 5), (-6, 5),
    (8, 0), (4, 7), (-4, 7), (7, 4), (-7, 4), (8, 1), (8, 2), (6, 6),
    (-6, 6), (8, 3), (5, 7), (-5, 7), (7, 5), (-7, 5), (8, 4), (6, 7),
    (-6, 7), (7, 6), (-7, 6), (8, 5), (7, 7), (-7, 7), (8, 6), (8, 7),
]
assert len(SPEC_DISTANCE_MAP) == 120

#: code-length symbols are stored in this order (spec "Normal Code Lengths")
KCODE_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)


def spec_distance(dist_code_1based: int, xsize: int) -> int:
    """Spec: codes 1..120 map through the neighborhood; >120 are plain
    dist - 120. dist = dy * xsize + dx, minimum 1."""
    if dist_code_1based > 120:
        return dist_code_1based - 120
    dx, dy = SPEC_DISTANCE_MAP[dist_code_1based - 1]
    return max(1, dy * xsize + dx)


def lz77_parts(value: int):
    """Spec "LZ77 prefix coding": values 1..4 are symbols 0..3 directly;
    larger values use sym = 2*eb + (top-2) + 2 with eb extra bits, where
    top is the leading 2 bits of (value-1)."""
    x = value - 1
    if x < 4:
        return x, 0, 0
    eb = x.bit_length() - 2
    top = x >> eb
    sym = 2 * eb + 2 + (top - 2)
    offset = (2 + (sym & 1)) << eb
    return sym, eb, x - offset


# ---------------------------------------------------------------------------
# bit writer + canonical codes (spec-defined constructions)
# ---------------------------------------------------------------------------


class BitWriter:
    def __init__(self):
        self.bits = []

    def write(self, value: int, nbits: int) -> None:
        for i in range(nbits):  # LSB-first
            self.bits.append((value >> i) & 1)

    def write_code(self, code: int, length: int) -> None:
        for i in range(length - 1, -1, -1):  # code MSB first
            self.bits.append((code >> i) & 1)

    def getvalue(self) -> bytes:
        out = bytearray()
        cur = 0
        for i, b in enumerate(self.bits):
            cur |= b << (i & 7)
            if (i & 7) == 7:
                out.append(cur)
                cur = 0
        if len(self.bits) & 7:
            out.append(cur)
        return bytes(out)


def canonical(lengths: dict) -> dict:
    """symbol -> (code, length), canonical assignment in (length, symbol)
    order (spec: same construction as DEFLATE)."""
    codes = {}
    code = 0
    prev = None
    for l, s in sorted((l, s) for s, l in lengths.items() if l > 0):
        code = code << (l - prev) if prev is not None else 0
        prev = l
        codes[s] = (code, l)
        code += 1
    return codes


def write_simple_code(bw: BitWriter, symbols: list) -> dict:
    """Spec "Simple Code Lengths": 1 or 2 symbols. Returns sym->(code,len)."""
    bw.write(1, 1)  # simple
    bw.write(len(symbols) - 1, 1)
    bw.write(1, 1)  # first symbol in 8 bits
    bw.write(symbols[0], 8)
    if len(symbols) == 1:
        return {symbols[0]: (0, 0)}
    bw.write(symbols[1], 8)
    return {symbols[0]: (0, 1), symbols[1]: (1, 1)}


def write_normal_code(bw: BitWriter, cl_lengths: dict, tokens: list) -> None:
    """Spec "Normal Code Lengths": emit the code-length code (3-bit
    lengths in KCODE_ORDER up to the last used slot), no max_symbol cap,
    then the token sequence through the code-length code.

    tokens: ("lit", L) a literal code length L (0..15);
            ("rep16", extra2) repeat previous nonzero length 3+extra;
            ("z17", extra3) 3+extra zeros; ("z18", extra7) 11+extra zeros.
    """
    bw.write(0, 1)  # not simple
    used = set(cl_lengths)
    num_cl = max(KCODE_ORDER.index(s) for s in used) + 1
    bw.write(num_cl - 4, 4)
    for i in range(num_cl):
        bw.write(cl_lengths.get(KCODE_ORDER[i], 0), 3)
    cl = canonical(cl_lengths)
    bw.write(0, 1)  # no max_symbol cap
    for kind, val in tokens:
        if kind == "lit":
            c, l = cl[val]
            bw.write_code(c, l)
        elif kind == "rep16":
            c, l = cl[16]
            bw.write_code(c, l)
            bw.write(val, 2)
        elif kind == "z17":
            c, l = cl[17]
            bw.write_code(c, l)
            bw.write(val, 3)
        elif kind == "z18":
            c, l = cl[18]
            bw.write_code(c, l)
            bw.write(val, 7)
        else:
            raise ValueError(kind)


def riff_wrap(vp8l_payload: bytes) -> bytes:
    """RIFF/WEBP/VP8L container (spec "RIFF Header")."""
    chunk = b"VP8L" + struct.pack("<I", len(vp8l_payload)) + vp8l_payload
    if len(vp8l_payload) & 1:
        chunk += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk


def vp8l_header(bw: BitWriter, w: int, h: int) -> None:
    """14-bit w-1, 14-bit h-1, alpha hint, 3-bit version 0. The 0x2F
    signature byte goes in front of the byte stream, not through bw."""
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1)
    bw.write(0, 3)
