"""Independent FLAC (RFC 9639) bitstream assembler for fixture generation.

This module is a SECOND, decoder-free transcription of the FLAC coded
representation, written against the RFC text for the vendored-fixture
close of the FLAC arbitration gap (VERDICT r10 item 4): it imports
nothing from ``fsql_spark`` and shares no code with
``fsql_spark/operators/flac.py``. Streams it produces are committed under
``tests/fixtures/flac/`` together with the exact PCM they encode — the
expected samples are the INPUT to assembly (known by construction), never
the output of the decoder under test. No FLAC implementation exists in
this environment (no libFLAC, no ``flac`` binary, no JDK support — see
COVERAGE.md), so committed md5-pinned artifacts are also the channel that
makes EXTERNAL arbitration possible: anyone with a stock ``flac`` binary
can validate the committed bytes offline.

Spec facts transcribed here (RFC 9639, with section anchors):

- Stream = ``fLaC`` magic + metadata blocks; STREAMINFO is block type 0,
  34 bytes: min/max block size (16b each), min/max frame size (24b),
  sample rate (20b), channels-1 (3b), bps-1 (5b), total samples (36b),
  MD5 of the unencoded PCM (16B, interleaved, little-endian, signed,
  ceil(bps/8) bytes per sample; all-zero = not computed).
- Frame header: 14-bit sync ``11111111111110``, 1 reserved 0, 1 blocking
  strategy (0 fixed -> coded number is the frame index; 1 variable ->
  the first-sample index), 4b block-size code, 4b sample-rate code,
  4b channel assignment, 3b bit-depth code, 1 reserved 0, UTF-8-style
  coded number (extended to 36 bits), then the block-size /sample-rate
  tail fields the codes defer to, then CRC-8 (poly 0x07, init 0) of the
  header bytes so far.
- Block-size codes: 0 reserved, 1 = 192, 2..5 = 576 * 2^(n-2),
  6 = 8-bit (value-1) at end, 7 = 16-bit (value-1) at end,
  8..15 = 256 * 2^(n-8).
- Sample-rate codes: 0 = from STREAMINFO, 1..11 = a fixed table
  (4 = 8000 Hz used here), 12 = 8-bit kHz at end, 13 = 16-bit Hz at
  end, 14 = 16-bit daHz at end, 15 invalid.
- Bit-depth codes: 0 = from STREAMINFO, 1=8, 2=12, 4=16, 5=20, 6=24,
  7=32, 3 reserved.
- Channel assignment: 0..7 = that many+1 independent channels,
  8 = left/side, 9 = right/side (side is channel 0), 10 = mid/side.
  The SIDE channel is coded one bit deeper. side = left - right;
  mid = (left + right) >> 1 (floor).
- Subframe header: 1 zero bit, 6-bit type (000000 CONSTANT, 000001
  VERBATIM, 001000+o FIXED order o in 0..4, 1ooooo LPC with order
  ooooo+1), 1-bit wasted-bits flag; if set, (wasted-1) in unary.
  Unary coding throughout FLAC: n is n ``0`` bits then a ``1`` (the
  spec's own example: k=3 wasted bits is coded ``001``).
- CONSTANT: one signed sample. VERBATIM: block_size signed samples.
  FIXED order o: o signed warmup samples then a coded residual, with
  predictors 0 / s[-1] / 2s[-1]-s[-2] / 3s[-1]-3s[-2]+s[-3] /
  4s[-1]-6s[-2]+4s[-3]-s[-4]. LPC order o: o warmups, (precision-1) in
  4 bits (1111 invalid), shift in 5 bits signed (negative forbidden),
  o signed coefficients of ``precision`` bits; prediction =
  (sum c_i * s[n-1-i]) >> shift.
- Residual: 2-bit method (00 = Rice with 4-bit parameters, escape
  0b1111; 01 = Rice2 with 5-bit parameters, escape 0b11111), 4-bit
  partition order po, 2^po partitions; the first partition codes
  block/2^po - pred_order residuals, the rest block/2^po. An escaped
  partition codes a 5-bit raw width n then its residuals as n-bit
  signed integers (n=0: all zero). Rice code of residual r with
  parameter p: fold to unsigned (r>=0 -> 2r, r<0 -> -2r-1), write
  quotient u>>p in unary, then p low bits.
- After the last subframe the frame pads to a byte boundary with zero
  bits and appends CRC-16 (poly 0x8005, init 0) of every frame byte up
  to but excluding the CRC itself.

All of the above is public-specification knowledge.
"""

from __future__ import annotations

import hashlib
import struct


class BitWriter:
    """MSB-first bit accumulator."""

    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, n: int) -> None:
        if n == 0:
            return
        value &= (1 << n) - 1
        self.acc = (self.acc << n) | value
        self.nbits += n
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def write_signed(self, value: int, n: int) -> None:
        self.write(value & ((1 << n) - 1), n)

    def write_unary(self, n: int) -> None:
        """n zero bits followed by a one bit (RFC 9639 unary)."""
        for _ in range(n):
            self.write(0, 1)
        self.write(1, 1)

    def align(self) -> None:
        if self.nbits:
            self.write(0, 8 - self.nbits)

    def getvalue(self) -> bytes:
        assert self.nbits == 0, "unaligned"
        return bytes(self.buf)


def crc8(data: bytes) -> int:
    crc = 0
    for byte in data:
        crc ^= byte
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def crc16(data: bytes) -> int:
    crc = 0
    for byte in data:
        crc ^= byte << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 else (crc << 1) & 0xFFFF
    return crc


def utf8_coded(value: int) -> bytes:
    """UTF-8-style variable-length coding of the frame/sample number,
    extended beyond Unicode's range as the spec directs."""
    if value < 0x80:
        return bytes([value])
    for nbytes, first_mask, cap_bits in (
        (2, 0xC0, 11), (3, 0xE0, 16), (4, 0xF0, 21), (5, 0xF8, 26),
        (6, 0xFC, 31), (7, 0xFE, 36),
    ):
        if value < (1 << cap_bits):
            out = bytearray(nbytes)
            for i in range(nbytes - 1, 0, -1):
                out[i] = 0x80 | (value & 0x3F)
                value >>= 6
            out[0] = first_mask | value
            return bytes(out)
    raise ValueError("coded number exceeds 36 bits")


def pcm_md5(channels: list, bps: int) -> bytes:
    """RFC 9639 STREAMINFO MD5: samples interleaved across channels,
    little-endian, signed, ceil(bps/8) bytes each."""
    width = (bps + 7) // 8
    h = hashlib.md5()
    n = len(channels[0])
    for i in range(n):
        for ch in channels:
            h.update(int(ch[i]).to_bytes(width, "little", signed=True))
    return h.digest()


def stream_header(
    sample_rate: int,
    channels: int,
    bps: int,
    total_samples: int,
    md5: bytes,
    min_block: int,
    max_block: int,
) -> bytes:
    si = BitWriter()
    si.write(min_block, 16)
    si.write(max_block, 16)
    si.write(0, 24)  # min frame size unknown
    si.write(0, 24)  # max frame size unknown
    si.write(sample_rate, 20)
    si.write(channels - 1, 3)
    si.write(bps - 1, 5)
    si.write(total_samples, 36)
    body = si.getvalue() + md5
    assert len(body) == 34
    return b"fLaC" + bytes([0x80]) + struct.pack(">I", len(body))[1:] + body


FIXED_COEFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


def fixed_residuals(samples: list, order: int) -> list:
    coefs = FIXED_COEFS[order]
    return [
        samples[i] - sum(c * samples[i - 1 - j] for j, c in enumerate(coefs))
        for i in range(order, len(samples))
    ]


def lpc_residuals(samples: list, coefs: list, shift: int) -> list:
    order = len(coefs)
    return [
        samples[i]
        - (sum(c * samples[i - 1 - j] for j, c in enumerate(coefs)) >> shift)
        for i in range(order, len(samples))
    ]


def _zigzag(r: int) -> int:
    return (r << 1) if r >= 0 else (((-r) << 1) - 1)


def write_residual(
    w: BitWriter,
    residuals: list,
    block: int,
    pred_order: int,
    partition_order: int = 0,
    params: list | None = None,
    method: int = 0,
    escapes: dict | None = None,
) -> None:
    """Residual section. ``params[i]`` is partition i's Rice parameter;
    ``escapes[i] = raw_bits`` codes partition i escaped instead."""
    nparts = 1 << partition_order
    if block % nparts:
        raise ValueError("partition count must divide block size")
    per = block // nparts
    if per <= pred_order and partition_order:
        raise ValueError("first partition would be empty")
    param_bits = 4 if method == 0 else 5
    escape_code = (1 << param_bits) - 1
    escapes = escapes or {}
    if params is None:
        params = [_best_param(residuals, param_bits) for _ in range(nparts)]
    w.write(method, 2)
    w.write(partition_order, 4)
    pos = 0
    for p in range(nparts):
        count = per - pred_order if p == 0 else per
        chunk = residuals[pos : pos + count]
        pos += count
        if p in escapes:
            raw = escapes[p]
            w.write(escape_code, param_bits)
            w.write(raw, 5)
            if raw:  # n=0 escape codes no bits: all residuals are zero
                for r in chunk:
                    w.write_signed(r, raw)
            else:
                assert all(r == 0 for r in chunk), "n=0 escape needs zero residuals"
        else:
            param = params[p]
            if param >= escape_code:
                raise ValueError("parameter collides with the escape code")
            w.write(param, param_bits)
            for r in chunk:
                u = _zigzag(r)
                w.write_unary(u >> param)
                w.write(u & ((1 << param) - 1), param)
    assert pos == len(residuals), "partition layout must consume every residual"


def _best_param(residuals: list, param_bits: int) -> int:
    best, best_cost = 0, None
    for p in range((1 << param_bits) - 1):
        cost = sum((_zigzag(r) >> p) + 1 + p for r in residuals)
        if best_cost is None or cost < best_cost:
            best, best_cost = p, cost
    return best


def subframe_header(w: BitWriter, type_code: int, wasted: int) -> None:
    w.write(0, 1)
    w.write(type_code, 6)
    if wasted:
        w.write(1, 1)
        w.write_unary(wasted - 1)
    else:
        w.write(0, 1)


def write_subframe(w: BitWriter, spec: dict, samples: list, bps: int, block: int) -> None:
    """``spec``: {kind: constant|verbatim|fixed|lpc, order, wasted,
    partition_order, params, method, escapes, coefs, shift, precision}.
    ``samples`` are the FINAL channel samples; with wasted bits w they
    must all be multiples of 2^w (the coded stream carries samples >> w)."""
    wasted = spec.get("wasted", 0)
    if wasted:
        assert all(s % (1 << wasted) == 0 for s in samples), "wasted-bit mismatch"
        samples = [s >> wasted for s in samples]
    eff_bps = bps - wasted
    kind = spec["kind"]
    if kind == "constant":
        assert len(set(samples)) == 1
        subframe_header(w, 0, wasted)
        w.write_signed(samples[0], eff_bps)
    elif kind == "verbatim":
        subframe_header(w, 1, wasted)
        for s in samples:
            w.write_signed(s, eff_bps)
    elif kind == "fixed":
        order = spec["order"]
        subframe_header(w, 8 + order, wasted)
        for s in samples[:order]:
            w.write_signed(s, eff_bps)
        res = fixed_residuals(samples, order)
        write_residual(
            w, res, block, order,
            spec.get("partition_order", 0), spec.get("params"),
            spec.get("method", 0), spec.get("escapes"),
        )
    elif kind == "lpc":
        coefs = spec["coefs"]
        shift = spec["shift"]
        precision = spec["precision"]
        order = len(coefs)
        subframe_header(w, 32 + (order - 1), wasted)
        for s in samples[:order]:
            w.write_signed(s, eff_bps)
        w.write(precision - 1, 4)
        w.write_signed(shift, 5)
        for c in coefs:
            w.write_signed(c, precision)
        res = lpc_residuals(samples, coefs, shift)
        write_residual(
            w, res, block, order,
            spec.get("partition_order", 0), spec.get("params"),
            spec.get("method", 0), spec.get("escapes"),
        )
    else:
        raise ValueError(kind)


#: sample-rate table codes used by fixtures: value -> (code, tail_writer)
SR_CODES = {
    8000: (4, None),
    16000: (5, None),
}


def frame(
    frame_number: int,
    channel_samples: list,
    specs: list,
    bps: int,
    ch_code: int,
    blocking: int = 0,
    bs_code: int | None = None,
    sr_code: int = 4,
    sr_tail: tuple | None = None,
) -> bytes:
    """Assemble one frame. ``channel_samples`` holds the CODED channels
    (after any stereo decorrelation), ``specs`` one subframe spec each.
    ``bps`` is the STREAMINFO depth; side channels code one bit deeper."""
    block = len(channel_samples[0])
    w = BitWriter()
    w.write(0x3FFE, 14)
    w.write(0, 1)
    w.write(blocking, 1)
    bs_tail = None
    if bs_code is None:
        if block == 192:
            bs_code = 1
        elif block <= 256:
            bs_code, bs_tail = 6, ("u8", block - 1)
        else:
            bs_code, bs_tail = 7, ("u16", block - 1)
    elif bs_code == 6:
        bs_tail = ("u8", block - 1)
    elif bs_code == 7:
        bs_tail = ("u16", block - 1)
    w.write(bs_code, 4)
    w.write(sr_code, 4)
    w.write(ch_code, 4)
    w.write(0, 3)  # bit depth: from STREAMINFO
    w.write(0, 1)
    for byte in utf8_coded(frame_number):
        w.write(byte, 8)
    if bs_tail:
        w.write(bs_tail[1], 8 if bs_tail[0] == "u8" else 16)
    if sr_tail:
        w.write(sr_tail[1], 8 if sr_tail[0] == "u8" else 16)
    hdr = w.getvalue()
    w.write(crc8(hdr), 8)

    if ch_code < 8:
        deeper = set()
    elif ch_code == 8:      # left/side: side is channel 1
        deeper = {1}
    elif ch_code == 9:      # right/side: side is channel 0
        deeper = {0}
    elif ch_code == 10:     # mid/side: side is channel 1
        deeper = {1}
    else:
        raise ValueError(ch_code)
    for ch, (spec, samples) in enumerate(zip(specs, channel_samples)):
        write_subframe(w, spec, samples, bps + (1 if ch in deeper else 0), block)
    w.align()
    body = w.getvalue()
    return body + struct.pack(">H", crc16(body))


def decorrelate(left: list, right: list, mode: str) -> list:
    """Channel pairs as coded on the wire for each stereo assignment."""
    if mode == "independent":
        return [left, right]
    side = [l - r for l, r in zip(left, right)]
    if mode == "left_side":
        return [list(left), side]
    if mode == "right_side":
        return [side, list(right)]
    if mode == "mid_side":
        mid = [(l + r) >> 1 for l, r in zip(left, right)]
        return [mid, side]
    raise ValueError(mode)
