"""Pure stdlib+numpy FLAC codec (decode: full subframe set; encode:
fixed predictors + Rice).

The lossless audio format a crawl meets after WAV: ``decode_flac``
parses the STREAMINFO metadata and every frame — constant, verbatim,
fixed-predictor (orders 0-4) and LPC subframes with Rice/Rice2 residual
coding, left/right/mid-side stereo decorrelation, wasted bits, and UTF-8
frame numbering — verifying both the frame-header CRC-8 and the frame
CRC-16. ``encode_flac`` writes real compressed streams (per-subframe
best-of fixed predictors 0-2 with Rice residuals, falling back to
verbatim) so round trips exercise genuine Rice decoding, not an echo.
Lossless: decode(encode(x)) == x exactly.

Scope: encode takes int16 (16-bit) or int32-within-24-bit samples,
1-2 channels, and writes no seektables; decode accepts 8/16/24/32-bit
streams and every channel assignment the spec names. Out-of-scope
inputs refuse loudly.
Like the other codecs these run inside Arrow-batched kernels; the Rice
loops are plain Python per frame — FLAC's entropy layer has no
vectorizable shape (like progressive JPEG's refinement bits).
"""

from __future__ import annotations

import struct

import numpy as np

from .codecs import CodecError

FLAC_MAGIC = b"fLaC"

#: fixed-predictor residual formulas (order -> coefficient row), spec §
_FIXED_COEFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


def _crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 else (crc << 1) & 0xFFFF
    return crc


class _Bits:
    """MSB-first bit reader over bytes, tracking position for CRC spans."""

    def __init__(self, data: bytes, pos: int = 0) -> None:
        self.data = data
        self.byte = pos
        self.bit = 0

    def read(self, n: int) -> int:
        v = 0
        while n > 0:
            if self.byte >= len(self.data):
                raise CodecError("FLAC: bitstream ran out")
            avail = 8 - self.bit
            take = min(n, avail)
            cur = self.data[self.byte]
            v = (v << take) | ((cur >> (avail - take)) & ((1 << take) - 1))
            self.bit += take
            if self.bit == 8:
                self.bit = 0
                self.byte += 1
            n -= take
        return v

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v >= (1 << (n - 1)) else v

    def read_unary(self) -> int:
        q = 0
        while self.read(1) == 0:
            q += 1
        return q

    def align(self) -> None:
        if self.bit:
            self.bit = 0
            self.byte += 1


class _BitsW:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, v: int, n: int) -> None:
        self.acc = (self.acc << n) | (v & ((1 << n) - 1))
        self.nbits += n
        while self.nbits >= 8:
            self.out.append((self.acc >> (self.nbits - 8)) & 0xFF)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def write_unary(self, q: int) -> None:
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)

    def align(self) -> None:
        if self.nbits:
            self.write(0, 8 - self.nbits)


def _utf8_number(bits: _Bits) -> int:
    """FLAC's extended-UTF-8 frame/sample number."""
    b0 = bits.read(8)
    if b0 < 0x80:
        return b0
    n = 0
    mask = 0x80
    while b0 & mask:
        n += 1
        mask >>= 1
    if n < 2 or n > 7:
        raise CodecError("FLAC: bad UTF-8 frame number")
    v = b0 & (0xFF >> (n + 1))
    for _ in range(n - 1):
        c = bits.read(8)
        if c & 0xC0 != 0x80:
            raise CodecError("FLAC: bad UTF-8 continuation")
        v = (v << 6) | (c & 0x3F)
    return v


def _rice_read(bits: _Bits, block: int, pred_order: int) -> list:
    """Read one subframe's residuals (coding method + partitioned Rice).
    Partition sizes follow RFC 9639 §9.2.7: every partition holds
    block/2^order residuals EXCEPT the first, which is short by the
    predictor order (the warmup samples are not residual-coded)."""
    method = bits.read(2)
    if method not in (0, 1):
        raise CodecError(f"FLAC: reserved residual coding method {method}")
    esc_param = 15 if method == 0 else 31
    pbits = 4 if method == 0 else 5
    order = bits.read(4)
    residuals = []
    nparts = 1 << order
    if block % nparts:
        raise CodecError("FLAC: partition order does not divide block size")
    part = block // nparts
    if part <= pred_order and nparts > 1:
        raise CodecError("FLAC: predictor order leaves the first partition empty")
    for p in range(nparts):
        count = part - (pred_order if p == 0 else 0)
        if count < 0:
            raise CodecError("FLAC: predictor order exceeds partition size")
        param = bits.read(pbits)
        if param == esc_param:
            raw_bits = bits.read(5)
            for _ in range(count):
                residuals.append(bits.read_signed(raw_bits) if raw_bits else 0)
        else:
            for _ in range(count):
                q = bits.read_unary()
                r = bits.read(param) if param else 0
                zig = (q << param) | r
                residuals.append((zig >> 1) ^ -(zig & 1))
    return residuals


#: decoded-sample runaway bound: any legal FLAC sample fits 32 bits; a
#: crafted predictor can otherwise grow Python bignums geometrically
#: (OverflowError at numpy conversion — outside the taxonomy — or a
#: multi-GB memory DoS before it)
_SAMPLE_LIMIT = 1 << 34


def _check_sample(v: int) -> int:
    if v > _SAMPLE_LIMIT or v < -_SAMPLE_LIMIT:
        raise CodecError("FLAC: predictor output out of range (corrupt stream)")
    return v


def _restore_fixed(order: int, warmup: list, residuals: list) -> list:
    out = list(warmup)
    coefs = _FIXED_COEFS[order]
    for r in residuals:
        pred = sum(c * out[-i - 1] for i, c in enumerate(coefs))
        out.append(_check_sample(r + pred))
    return out


def decode_flac(data: bytes) -> tuple:
    """Decode a FLAC byte string -> (sample_rate, samples ndarray) —
    int16 for <=16-bit streams, int32 for 24-bit; (n,) mono or
    (n, channels). Verifies frame-header CRC-8 and frame CRC-16."""
    if data[:4] != FLAC_MAGIC:
        raise CodecError("not a FLAC stream (bad magic)")
    pos = 4
    streaminfo = None
    while True:  # metadata blocks
        if pos + 4 > len(data):
            raise CodecError("FLAC: truncated metadata header")
        hdr = data[pos]
        last = hdr & 0x80
        btype = hdr & 0x7F
        (ln,) = struct.unpack(">I", b"\x00" + data[pos + 1 : pos + 4])
        body = data[pos + 4 : pos + 4 + ln]
        if len(body) != ln:
            raise CodecError("FLAC: truncated metadata block")
        if btype == 0:
            if ln < 34:
                raise CodecError("FLAC: STREAMINFO too short")
            streaminfo = body
        elif btype == 127:
            raise CodecError("FLAC: invalid metadata block type")
        pos += 4 + ln
        if last:
            break
    if streaminfo is None:
        raise CodecError("FLAC: missing STREAMINFO")
    b = _Bits(streaminfo)
    b.read(16)  # min block
    b.read(16)  # max block
    b.read(24)
    b.read(24)
    sample_rate = b.read(20)
    channels = b.read(3) + 1
    bps = b.read(5) + 1
    total_samples = b.read(36)
    if bps not in (8, 16, 24, 32):
        raise NotImplementedError(f"FLAC: {bps}-bit samples not supported")
    if sample_rate == 0:
        raise CodecError("FLAC: sample rate 0")

    chans = [[] for _ in range(channels)]
    while pos < len(data):
        frame_start = pos
        bits = _Bits(data, pos)
        sync = bits.read(14)
        if sync != 0x3FFE:
            raise CodecError(f"FLAC: bad frame sync at byte {pos}")
        if bits.read(1):  # reserved bit: must be 0
            raise CodecError("FLAC: reserved frame-header bit set")
        blocking = bits.read(1)
        bs_code = bits.read(4)
        sr_code = bits.read(4)
        ch_code = bits.read(4)
        bps_code = bits.read(3)
        if sr_code == 15:
            raise CodecError("FLAC: invalid sample-rate code 15")
        if bps_code == 3:
            raise CodecError("FLAC: reserved bit-depth code 3")
        if bits.read(1):  # reserved bit: must be 0
            raise CodecError("FLAC: reserved frame-header bit set")
        _num = _utf8_number(bits)
        if bs_code == 0:
            raise CodecError("FLAC: reserved block size code")
        elif bs_code == 1:
            block = 192
        elif bs_code <= 5:
            block = 576 << (bs_code - 2)
        elif bs_code == 6:
            block = bits.read(8) + 1
        elif bs_code == 7:
            block = bits.read(16) + 1
        else:
            block = 256 << (bs_code - 8)
        if sr_code == 12:
            bits.read(8)
        elif sr_code in (13, 14):
            bits.read(16)
        # frame bps: code 0 = "from streaminfo"; a nonzero code legally
        # declares the frame's own depth — this decoder keeps one dtype for
        # the whole stream, so a disagreeing frame must be refused, not
        # silently mis-parsed (RFC 9639 table: 1=8, 2=12, 4=16, 5=20,
        # 6=24, 7=32; 3 already rejected as reserved above)
        frame_bps = {0: bps, 1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}[bps_code]
        if frame_bps != bps:
            raise CodecError(
                f"FLAC: frame declares {frame_bps}-bit samples but "
                f"STREAMINFO says {bps}-bit"
            )
        # header CRC-8 covers everything up to here
        bits.align()
        hdr_crc = bits.read(8)
        if _crc8(data[frame_start : bits.byte - 1]) != hdr_crc:
            raise CodecError("FLAC: frame header CRC-8 mismatch")

        if ch_code < 8:
            n_ch = ch_code + 1
            assignment = "independent"
        elif ch_code == 8:
            n_ch, assignment = 2, "left_side"
        elif ch_code == 9:
            n_ch, assignment = 2, "right_side"
        elif ch_code == 10:
            n_ch, assignment = 2, "mid_side"
        else:
            raise CodecError(f"FLAC: reserved channel assignment {ch_code}")
        if n_ch != channels:
            raise CodecError("FLAC: frame channel count disagrees with STREAMINFO")

        sub = []
        for ch in range(n_ch):
            ch_bps = bps
            if assignment == "left_side" and ch == 1:
                ch_bps += 1
            if assignment == "right_side" and ch == 0:
                ch_bps += 1
            if assignment == "mid_side" and ch == 1:
                ch_bps += 1
            if bits.read(1):
                raise CodecError("FLAC: subframe sync bit set")
            stype = bits.read(6)
            wasted = 0
            if bits.read(1):
                wasted = bits.read_unary() + 1
                if wasted >= ch_bps:
                    raise CodecError("FLAC: wasted bits exceed the sample width")
                ch_bps -= wasted
            if stype == 0:  # CONSTANT
                v = bits.read_signed(ch_bps)
                samples = [v] * block
            elif stype == 1:  # VERBATIM
                samples = [bits.read_signed(ch_bps) for _ in range(block)]
            elif 8 <= stype <= 12:  # FIXED order 0-4
                order = stype - 8
                warm = [bits.read_signed(ch_bps) for _ in range(order)]
                res = _rice_read(bits, block, order)
                samples = _restore_fixed(order, warm, res)
            elif stype >= 32:  # LPC order 1-32
                order = stype - 31
                warm = [bits.read_signed(ch_bps) for _ in range(order)]
                precision = bits.read(4) + 1
                if precision == 16:
                    raise CodecError("FLAC: invalid LPC precision")
                shift = bits.read_signed(5)
                if shift < 0:
                    raise CodecError("FLAC: negative LPC shift")
                coefs = [bits.read_signed(precision) for _ in range(order)]
                res = _rice_read(bits, block, order)
                samples = list(warm)
                for r in res:
                    pred = sum(c * samples[-i - 1] for i, c in enumerate(coefs)) >> shift
                    samples.append(_check_sample(r + pred))
            else:
                raise CodecError(f"FLAC: reserved subframe type {stype}")
            if wasted:
                samples = [s << wasted for s in samples]
            sub.append(samples)
        bits.align()
        if bits.byte + 2 > len(data):
            raise CodecError("FLAC: truncated frame CRC")
        frame_crc = (data[bits.byte] << 8) | data[bits.byte + 1]
        if _crc16(data[frame_start : bits.byte]) != frame_crc:
            raise CodecError("FLAC: frame CRC-16 mismatch")
        pos = bits.byte + 2

        # undo stereo decorrelation
        if assignment == "left_side":
            left = sub[0]
            side = sub[1]
            sub = [left, [l - s for l, s in zip(left, side)]]
        elif assignment == "right_side":
            side, right = sub[0], sub[1]
            sub = [[r + s for r, s in zip(right, side)], right]
        elif assignment == "mid_side":
            mid, side = sub[0], sub[1]
            lr = []
            rr = []
            for m, s in zip(mid, side):
                m = (m << 1) | (s & 1)
                lr.append((m + s) >> 1)
                rr.append((m - s) >> 1)
            sub = [lr, rr]
        for ch in range(channels):
            chans[ch].extend(sub[ch])

    dtype = np.int16 if bps <= 16 else np.int32
    lo, hi = -(1 << (bps - 1)), (1 << (bps - 1)) - 1
    for c in chans:
        if c and (min(c) < lo or max(c) > hi):
            # a crafted stream can be CRC-valid yet decode outside the
            # declared bit depth: refuse rather than silently wrap
            raise CodecError(f"FLAC: decoded samples exceed the {bps}-bit range")
    arrs = [np.asarray(c, dtype=dtype) for c in chans]
    if total_samples:
        arrs = [a[:total_samples] for a in arrs]
    # RFC 9639 §8.2: STREAMINFO carries the MD5 of the unencoded audio
    # (interleaved, little-endian, signed, ceil(bps/8) bytes/sample);
    # all-zero means "not computed". Verifying it (round 10) gives decode
    # a spec-level end-to-end check against the ORIGINAL encoder — the
    # only external-arbitration channel available for FLAC in this
    # environment (no libFLAC, no JDK support), and it catches exactly
    # the convention-mismatch class (e.g. wrong stereo decorrelation)
    # that per-frame CRCs cannot see, because CRCs cover coded bytes,
    # not reconstructed samples.
    md5_declared = streaminfo[18:34]
    if md5_declared != b"\x00" * 16:
        if _streaminfo_md5(arrs, bps) != md5_declared:
            raise CodecError(
                "FLAC: decoded samples do not match the STREAMINFO MD5 "
                "(mis-decode or corrupted stream)"
            )
    out = arrs[0] if channels == 1 else np.stack(arrs, axis=1)
    return sample_rate, out


def _streaminfo_md5(arrs: list, bps: int) -> bytes:
    """MD5 of the unencoded audio per RFC 9639: channel-interleaved
    samples, each as a little-endian SIGNED integer of ceil(bps/8)
    bytes."""
    import hashlib

    width = (bps + 7) // 8
    inter = np.stack(arrs, axis=1).astype(np.int64)  # (n, channels)
    u = inter & ((1 << (8 * width)) - 1)  # two's complement view
    b = np.stack(
        [(u >> (8 * i)) & 0xFF for i in range(width)], axis=-1
    ).astype(np.uint8)
    return hashlib.md5(b.tobytes()).digest()


# --------------------------------------------------------------------------
# encoder (fixed predictors + Rice — real compression for round trips)
# --------------------------------------------------------------------------

def _rice_write(w: _BitsW, residuals: list) -> None:
    """One partition (order 0), parameter chosen from the mean magnitude."""
    w.write(0, 2)  # 4-bit Rice
    w.write(0, 4)  # partition order 0
    n = len(residuals)
    mean = (sum(abs(r) for r in residuals) // max(1, n)) + 1
    param = max(0, min(14, mean.bit_length()))
    w.write(param, 4)
    for r in residuals:
        zig = ((-r) << 1) - 1 if r < 0 else (r << 1)
        w.write_unary(zig >> param)
        if param:
            w.write(zig & ((1 << param) - 1), param)


def _utf8_write(w: _BitsW, v: int) -> None:
    if v < 0x80:
        w.write(v, 8)
        return
    # choose the shortest extended-UTF-8 form
    for n in range(2, 8):
        if v < (1 << (5 * n + 1)) or n == 7:
            break
    lead = (0xFF << (8 - n)) & 0xFF
    w.write(lead | (v >> (6 * (n - 1))), 8)
    for i in range(n - 2, -1, -1):
        w.write(0x80 | ((v >> (6 * i)) & 0x3F), 8)


def encode_flac(samples: np.ndarray, sample_rate: int, block_size: int = 4096) -> bytes:
    """Encode int16 (16-bit) or int32-within-24-bit samples — (n,) mono or
    (n, 2) stereo — as a REAL compressed FLAC stream: per subframe the
    best of fixed predictors 0-2 (Rice residuals) or verbatim.
    Deterministic; decode(encode(x)) == x exactly."""
    if sample_rate < 1 or sample_rate >= (1 << 20):
        raise ValueError(f"bad sample_rate {sample_rate}")
    if not 16 <= block_size <= 65535:
        raise ValueError(f"block_size must be 16..65535, got {block_size}")
    if samples.dtype == np.int16:
        bps = 16
    elif samples.dtype == np.int32:
        bps = 24
        flat = samples.reshape(-1)
        if flat.size and (int(flat.max()) > 0x7FFFFF or int(flat.min()) < -0x800000):
            raise ValueError("int32 input encodes as 24-bit; samples must fit")
    else:
        raise ValueError(f"encode_flac needs int16 or int32, got {samples.dtype}")
    if samples.ndim == 1:
        channels = 1
    elif samples.ndim == 2 and samples.shape[1] in (1, 2):
        channels = samples.shape[1]
        if channels == 1:
            samples = samples[:, 0]
    else:
        raise ValueError("encode_flac supports 1-2 channels")
    n_total = samples.shape[0]

    out = bytearray(FLAC_MAGIC)
    si = _BitsW()
    # STREAMINFO min == max == block_size is CORRECT for this encoder even
    # though the final frame is usually shorter: equal fields are the
    # spec's signal for a fixed-blocksize stream (matching the frames'
    # blocking-strategy bit), the last block is explicitly exempt from the
    # declared minimum, and blocksize fields MUST be >= 16 — writing the
    # tail's true size would both mis-declare the stream as variable-
    # blocksize and go out of range for tails under 16 samples
    # (RFC 9639 streaminfo rules; libFLAC writes the same).
    si.write(block_size, 16)
    si.write(block_size, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(sample_rate, 20)
    si.write(channels - 1, 3)
    si.write(bps - 1, 5)
    si.write(n_total, 36)
    # real sample MD5 (round 10; was all-zero "not computed"): the decoder
    # now VERIFIES this, so every round trip checks reconstructed samples
    # end-to-end, and libFLAC-style tools can validate our streams
    _md5_arrs = (
        [samples] if channels == 1 else [samples[:, 0], samples[:, 1]]
    )
    si.out += _streaminfo_md5(_md5_arrs, bps)
    out += bytes([0x80, 0, 0, 34]) + bytes(si.out)

    def rice_cost(res: list) -> int:
        """TRUE emitted size of _rice_write for these residuals: unary
        quotients + terminators + param bits + the 10 coding-method/
        order/param header bits (an optimistic bit_length proxy made the
        verbatim fallback unreachable — review find)."""
        n = len(res)
        mean = (sum(abs(r) for r in res) // max(1, n)) + 1
        param = max(0, min(14, mean.bit_length()))
        zigs = ((((-r) << 1) - 1 if r < 0 else (r << 1)) for r in res)
        return 10 + n * (1 + param) + sum(z >> param for z in zigs)

    def subframe(w: _BitsW, vals: list) -> None:
        # pick the cheapest of fixed orders 0..2 by the REAL Rice cost
        best_order, best_res, best_cost = None, None, None
        for order in range(0, 3):
            if len(vals) <= order:
                continue
            res = []
            coefs = _FIXED_COEFS[order]
            for i in range(order, len(vals)):
                pred = sum(c * vals[i - j - 1] for j, c in enumerate(coefs))
                res.append(vals[i] - pred)
            cost = order * bps + rice_cost(res)
            if best_cost is None or cost < best_cost:
                best_order, best_res, best_cost = order, res, cost
        if best_res is not None and best_cost < len(vals) * bps:
            w.write(0, 1)
            w.write(8 + best_order, 6)  # FIXED
            w.write(0, 1)  # no wasted bits
            for v in vals[:best_order]:
                w.write(v, bps)
            _rice_write(w, best_res)
        else:
            w.write(0, 1)
            w.write(1, 6)  # VERBATIM
            w.write(0, 1)
            for v in vals:
                w.write(v, bps)

    frame_no = 0
    for start in range(0, n_total, block_size):
        vals = samples[start : start + block_size]
        block = vals.shape[0]
        w = _BitsW()
        w.write(0x3FFE, 14)
        w.write(0, 1)
        w.write(0, 1)  # fixed blocksize stream
        w.write(7, 4)  # block size: 16-bit at end of header
        w.write(0, 4)  # sample rate: from STREAMINFO
        w.write(channels - 1, 4)  # independent channels
        w.write({16: 4, 24: 6}[bps], 3)
        w.write(0, 1)
        _utf8_write(w, frame_no)
        w.write(block - 1, 16)
        w.align()
        hdr = bytes(w.out)
        w.write(_crc8(hdr), 8)
        if channels == 1:
            subframe(w, [int(v) for v in vals])
        else:
            for ch in range(channels):
                subframe(w, [int(v) for v in vals[:, ch]])
        w.align()
        frame = bytes(w.out)
        w.write(_crc16(frame), 16)
        out += bytes(w.out)
        frame_no += 1
    return bytes(out)
