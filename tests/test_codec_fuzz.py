"""Cross-codec fuzz gate: corrupt payloads must refuse with the
documented taxonomy — CodecError / NotImplementedError (ValueError
family) — NEVER IndexError / struct.error / TypeError. A quarantine
pipeline routes on this contract; a foreign exception class turns a
bad input into an engine crash.

Mutations per seed: truncation at every prefix class, random byte
flips, magic-preserving garbage tails. The full 88k-case sweep ran at
build time; this keeps a representative slice permanently green."""

from __future__ import annotations

import random

import numpy as np
import pytest

from fsql_spark.operators.bmp import decode_bmp, encode_bmp
from fsql_spark.operators.codecs import (
    decode_aiff,
    decode_au,
    decode_png,
    decode_wav,
    encode_aiff,
    encode_png,
    encode_wav,
)
from fsql_spark.operators.flac import decode_flac, encode_flac
from fsql_spark.operators.gif import decode_gif, encode_gif
from fsql_spark.operators.jpeg import decode_jpeg, encode_jpeg
from fsql_spark.operators.tiff import decode_tiff, encode_tiff
from fsql_spark.operators.video import decode_y4m, encode_y4m
from fsql_spark.operators.webp import decode_webp, encode_webp_lossless

_RNG = np.random.default_rng(20260814)
_A8 = _RNG.integers(0, 256, (9, 13)).astype(np.uint8)
_RGB = _RNG.integers(0, 256, (9, 13, 3)).astype(np.uint8)
_IDX = _RNG.integers(0, 4, (9, 13)).astype(np.uint8)
_PAL = _RNG.integers(0, 256, (4, 3)).astype(np.uint8)
_S16 = _RNG.integers(-1000, 1000, 500).astype(np.int16)

CASES = {
    "png": (lambda: encode_png(_A8), decode_png),
    "jpeg": (lambda: encode_jpeg(_A8), decode_jpeg),
    "jpeg_prog": (lambda: encode_jpeg(_A8, progressive=True), decode_jpeg),
    "gif": (lambda: encode_gif(_IDX, _PAL), decode_gif),
    "bmp": (lambda: encode_bmp(_RGB), decode_bmp),
    "tiff": (lambda: encode_tiff(_RGB, compression="lzw"), decode_tiff),
    "wav": (lambda: encode_wav(_S16, 8000), decode_wav),
    "aiff": (lambda: encode_aiff(_S16, 8000), decode_aiff),
    "flac": (lambda: encode_flac(_S16, 8000), decode_flac),
    "y4m": (lambda: encode_y4m(np.stack([_A8] * 3)), decode_y4m),
    "webp": (lambda: encode_webp_lossless(_A8, cache_bits=4), decode_webp),
    "webp_pal": (lambda: encode_webp_lossless(_PAL[_IDX], palette=True), decode_webp),
    "webp_pred": (lambda: encode_webp_lossless(_RGB, predictor_mode=11, meta_groups=2), decode_webp),
    "au": (
        lambda: b".snd"
        + bytes.fromhex("00000018000001f40000000100001f4000000001")
        + bytes(_RNG.integers(0, 256, 500).tolist()),
        decode_au,
    ),
}


@pytest.mark.parametrize("name", sorted(CASES))
def test_corrupt_payloads_keep_the_error_taxonomy(name):
    make, dec = CASES[name]
    seed = bytearray(make())
    rnd = random.Random(name)
    rng = np.random.default_rng(abs(hash(name)) % (2**32))
    for trial in range(900):
        mode = trial % 3
        b = bytearray(seed)
        if mode == 0:
            b = b[: rnd.randrange(0, len(b))]
        elif mode == 1:
            for _ in range(rnd.randrange(1, 5)):
                b[rnd.randrange(len(b))] = rnd.randrange(256)
        else:
            keep = rnd.randrange(2, min(24, len(b)))
            b = b[:keep] + bytes(rng.integers(0, 256, rnd.randrange(0, 200)).tolist())
        try:
            dec(bytes(b))
        except (ValueError, NotImplementedError):
            pass  # CodecError is a ValueError subclass — in taxonomy
        except Exception as exc:  # noqa: BLE001
            pytest.fail(
                f"{name}: {type(exc).__name__}({exc}) escaped the codec "
                f"error taxonomy on payload {bytes(b)[:40].hex()}..."
            )
