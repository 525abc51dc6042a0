"""Generate the vendored FLAC fixtures (tests/fixtures/flac/).

Round-11 closure of the FLAC arbitration gap (VERDICT r10 item 4): the
FLAC decoder was the one codec verified only against this repo's own
encoder (plus the RFC 9639 STREAMINFO MD5 self-check, which catches
stream corruption but not consistent-pair convention bugs — exactly the
class the r10 WebP/TIFF arbitration caught twice). These fixtures are
assembled by ``tools/flac_assembler.py``, an INDEPENDENT second
transcription of RFC 9639 that imports nothing from ``fsql_spark``; the
expected PCM is the assembler's INPUT (known by construction), never the
decoder's output. No FLAC implementation exists in this environment (no
libFLAC, no ``flac`` binary, no JDK FLAC support — COVERAGE.md), so the
committed, md5-pinned artifacts are also the external-arbitration
channel: anyone with a stock ``flac`` binary can run ``flac -d`` on the
committed bytes and diff against expected.npz offline.

Coverage (every decode path of fsql_spark/operators/flac.py):

- ``subframe_types.flac``  — CONSTANT, VERBATIM, FIXED orders 0..4
  across frames; block-size codes 1 (192) and 6 (8-bit at end).
- ``lpc_subframes.flac``   — LPC orders 1/2/8 with distinct precisions
  and shifts; one frame coded with the Rice2 (5-bit) method.
- ``stereo_modes.flac``    — independent, left-side, right-side,
  mid-side frames, with odd left+right sums to pin the mid-channel
  floor-shift rounding and the side channel's bps+1 depth.
- ``wasted_bits.flac``     — wasted-bits on CONSTANT, FIXED and
  VERBATIM subframes (1 and 3 wasted bits).
- ``rice_partitions.flac`` — partition order 2 (short first partition),
  an escaped raw partition, and an n=0 escape (all-zero residuals).
- ``mono8.flac``           — 8-bit stream (int16 output dtype path).
- ``stereo24.flac``        — 24-bit mid-side stream (int32 output).
- ``variable_blocking.flac`` — variable blocking strategy (coded number
  is the multi-byte UTF-8 FIRST-SAMPLE index), sample-rate code 14
  (16-bit daHz tail field), block-size code 7 (16-bit at end).

Every stream carries the RFC 9639 STREAMINFO MD5 of its PCM, so the
decoder's own MD5 gate must also pass on each fixture.

Run: PYTHONPATH=/root/repo python tools/make_flac_fixtures.py
"""

from __future__ import annotations

import hashlib
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(__file__))

from flac_assembler import (  # noqa: E402
    decorrelate,
    frame,
    pcm_md5,
    stream_header,
)

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "tests", "fixtures", "flac")


def lcg(seed: int):
    state = seed & 0xFFFFFFFF
    while True:
        state = (state * 1103515245 + 12345) & 0xFFFFFFFF
        yield state >> 16


def waves(n: int, seed: int, amp: int, smooth: int = 0) -> list:
    """Deterministic pseudo-audio: LCG noise, optionally smoothed so FIXED/
    LPC predictors leave small residuals (exercises low Rice parameters)."""
    g = lcg(seed)
    vals = [(next(g) % (2 * amp + 1)) - amp for _ in range(n)]
    for _ in range(smooth):
        vals = [vals[0]] + [(a + b) // 2 for a, b in zip(vals, vals[1:])]
    return vals


def build_subframe_types() -> tuple:
    bps, sr, ch_code = 16, 8000, 0
    frames = []
    pcm = []
    # frame 0: CONSTANT over a 192 block (block-size code 1)
    c = [-1234] * 192
    frames.append((c, {"kind": "constant"}))
    # frame 1: VERBATIM (rough noise), 192 block
    v = waves(192, 7, 3000)
    frames.append((v, {"kind": "verbatim"}))
    # frames 2..6: FIXED orders 0..4 over smoothed noise
    for order in range(5):
        s = waves(192, 100 + order, 900, smooth=order + 1)
        frames.append((s, {"kind": "fixed", "order": order}))
    for samples, _ in frames:
        pcm.extend(samples)
    md5 = pcm_md5([pcm], bps)
    data = stream_header(sr, 1, bps, len(pcm), md5, 192, 192)
    for i, (samples, spec) in enumerate(frames):
        data += frame(i, [samples], [spec], bps, ch_code)
    return data, np.array(pcm, dtype=np.int16), sr


def build_lpc_subframes() -> tuple:
    bps, sr, ch_code = 16, 8000, 0
    block = 64
    frames = [
        (waves(block, 21, 1200, smooth=2),
         {"kind": "lpc", "coefs": [3], "shift": 2, "precision": 4}),
        (waves(block, 22, 1500, smooth=1),
         {"kind": "lpc", "coefs": [5, -2], "shift": 2, "precision": 5}),
        (waves(block, 23, 2000, smooth=3),
         {"kind": "lpc", "coefs": [31, -14, 6, -3, 2, -1, 1, -1],
          "shift": 5, "precision": 6, "method": 1}),  # Rice2 path
    ]
    pcm = []
    for samples, _ in frames:
        pcm.extend(samples)
    md5 = pcm_md5([pcm], bps)
    data = stream_header(sr, 1, bps, len(pcm), md5, block, block)
    for i, (samples, spec) in enumerate(frames):
        data += frame(i, [samples], [spec], bps, ch_code, bs_code=6)
    return data, np.array(pcm, dtype=np.int16), sr


def build_stereo_modes() -> tuple:
    bps, sr = 16, 16000
    block = 48
    # odd l+r sums in every frame: (l + r) >> 1 floor rounding must matter
    modes = [
        ("independent", 1),
        ("left_side", 8),
        ("right_side", 9),
        ("mid_side", 10),
    ]
    left_all, right_all = [], []
    parts = []
    for mi, (mode, ch_code) in enumerate(modes):
        left = waves(block, 300 + mi, 5000, smooth=1)
        right = [l - d for l, d in zip(left, waves(block, 400 + mi, 701))]
        # force odd sums on half the samples (mid floor rounding)
        right = [r + 1 if (l + r) % 2 == 0 and i % 2 == 0 else r
                 for i, (l, r) in enumerate(zip(left, right))]
        coded = decorrelate(left, right, mode)
        parts.append((mode, ch_code, coded))
        left_all.extend(left)
        right_all.extend(right)
    md5 = pcm_md5([left_all, right_all], bps)
    data = stream_header(sr, 2, bps, len(left_all), md5, block, block)
    for i, (mode, ch_code, coded) in enumerate(parts):
        specs = [{"kind": "verbatim"}, {"kind": "verbatim"}]
        data += frame(i, coded, specs, bps, ch_code, sr_code=5)
    pcm = np.stack([np.array(left_all, dtype=np.int16),
                    np.array(right_all, dtype=np.int16)], axis=1)
    return data, pcm, sr


def build_wasted_bits() -> tuple:
    bps, sr, ch_code = 16, 8000, 0
    block = 32
    f0 = [(v // 2) * 2 for v in waves(block, 51, 4000)]          # 1 wasted bit
    f0[0] = f0[0] | 0  # keep even
    f1 = [(v // 8) * 8 for v in waves(block, 52, 4000, smooth=2)]  # 3 wasted
    f2 = [1024] * block                                           # constant, 10 wasted? use 8
    frames = [
        (f0, {"kind": "verbatim", "wasted": 1}),
        (f1, {"kind": "fixed", "order": 2, "wasted": 3}),
        (f2, {"kind": "constant", "wasted": 8}),
    ]
    pcm = []
    for samples, _ in frames:
        pcm.extend(samples)
    md5 = pcm_md5([pcm], bps)
    data = stream_header(sr, 1, bps, len(pcm), md5, block, block)
    for i, (samples, spec) in enumerate(frames):
        data += frame(i, [samples], [spec], bps, ch_code, bs_code=6)
    return data, np.array(pcm, dtype=np.int16), sr


def build_rice_partitions() -> tuple:
    bps, sr, ch_code = 16, 8000, 0
    block = 64  # partition order 2 -> 4 partitions of 16; first codes 14
    samples = waves(block, 61, 800, smooth=2)
    # zero a stretch so one partition's residuals are all zero (n=0 escape)
    # samples 13..39 constant -> second differences (FIXED-2 residuals)
    # vanish for samples 15..39, covering ALL of partition 1 (samples
    # 16..31) for the n=0 escape; partition 2 (32..47) re-enters noise at
    # 40, so its raw escape needs 14 bits for the step residual
    base = samples[13]
    for i in range(14, 40):
        samples[i] = base
    spec = {
        "kind": "fixed", "order": 2, "partition_order": 2,
        "params": [4, 0, 6, 5],
        "escapes": {1: 0, 2: 14},
    }
    pcm = list(samples)
    md5 = pcm_md5([pcm], bps)
    data = stream_header(sr, 1, bps, len(pcm), md5, block, block)
    data += frame(0, [samples], [spec], bps, ch_code, bs_code=6)
    return data, np.array(pcm, dtype=np.int16), sr


def build_mono8() -> tuple:
    bps, sr, ch_code = 8, 8000, 0
    block = 96
    frames = [
        (waves(block, 71, 100), {"kind": "verbatim"}),
        (waves(block, 72, 90, smooth=2), {"kind": "fixed", "order": 1}),
    ]
    pcm = []
    for samples, _ in frames:
        pcm.extend(samples)
    md5 = pcm_md5([pcm], bps)
    data = stream_header(sr, 1, bps, len(pcm), md5, block, block)
    for i, (samples, spec) in enumerate(frames):
        data += frame(i, [samples], [spec], bps, ch_code, bs_code=6)
    return data, np.array(pcm, dtype=np.int16), sr


def build_stereo24() -> tuple:
    bps, sr = 24, 8000
    block = 48
    left = waves(block, 81, 4_000_000, smooth=1)
    right = [l - d for l, d in zip(left, waves(block, 82, 60_000))]
    right = [r + 1 if (l + r) % 2 == 0 and i % 3 == 0 else r
             for i, (l, r) in enumerate(zip(left, right))]
    coded = decorrelate(left, right, "mid_side")
    md5 = pcm_md5([left, right], bps)
    data = stream_header(sr, 2, bps, block, md5, block, block)
    data += frame(0, coded, [{"kind": "verbatim"}, {"kind": "fixed", "order": 1}],
                  bps, 10, bs_code=6)
    pcm = np.stack([np.array(left, dtype=np.int32),
                    np.array(right, dtype=np.int32)], axis=1)
    return data, pcm, sr


def build_variable_blocking() -> tuple:
    bps, ch_code = 16, 0
    sr = 44100  # code 14: 16-bit daHz tail = 4410
    block = 300  # bs code 7: 16-bit (block-1) at end
    f0 = waves(block, 91, 2500, smooth=1)
    f1 = waves(block, 92, 2500, smooth=2)
    pcm = f0 + f1
    md5 = pcm_md5([pcm], bps)
    data = stream_header(sr, 1, bps, len(pcm), md5, block, block)
    # variable blocking: coded number is the FIRST SAMPLE index; frame 1
    # starts at sample 300 -> multi-byte UTF-8 coded number
    data += frame(0, [f0], [{"kind": "fixed", "order": 2}], bps, ch_code,
                  blocking=1, bs_code=7, sr_code=14, sr_tail=("u16", 4410))
    data += frame(300, [f1], [{"kind": "fixed", "order": 3}], bps, ch_code,
                  blocking=1, bs_code=7, sr_code=14, sr_tail=("u16", 4410))
    return data, np.array(pcm, dtype=np.int16), sr


BUILDERS = {
    "subframe_types": build_subframe_types,
    "lpc_subframes": build_lpc_subframes,
    "stereo_modes": build_stereo_modes,
    "wasted_bits": build_wasted_bits,
    "rice_partitions": build_rice_partitions,
    "mono8": build_mono8,
    "stereo24": build_stereo24,
    "variable_blocking": build_variable_blocking,
}


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    manifest = {}
    expected = {}
    for name, builder in sorted(BUILDERS.items()):
        data, pcm, sr = builder()
        path = os.path.join(OUT, f"{name}.flac")
        with open(path, "wb") as fh:
            fh.write(data)
        expected[f"{name}_pcm"] = pcm
        expected[f"{name}_rate"] = np.array(sr)
        manifest[name] = {
            "bytes": len(data),
            "md5_stream": hashlib.md5(data).hexdigest(),
            "md5_expected_pcm": hashlib.md5(pcm.tobytes()).hexdigest(),
            "shape": list(pcm.shape),
            "dtype": str(pcm.dtype),
            "sample_rate": sr,
        }
        print(name, manifest[name])
    np.savez_compressed(os.path.join(OUT, "expected.npz"), **expected)
    with open(os.path.join(OUT, "MANIFEST.json"), "w") as fh:
        json.dump(manifest, fh, indent=1, sort_keys=True)
    print("wrote", OUT)


if __name__ == "__main__":
    main()
