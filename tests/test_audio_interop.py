"""Audio container interop vs javax.sound.sampled (round 10).

Same policy as tests/test_codec_interop.py: the JDK ships an independent
audio codec suite (WAV/AIFF/AU readers+writers, G.711 u-law/A-law
converters) reachable through the test session's JVM, so arbitration
runs unconditionally. WAV was already byte-validated against CPython's
audioop (r7); this extends third-party coverage to AIFF, AU, and the
G.711 expansion tables, both directions.

PCM containers are lossless — exact sample equality. G.711 is a lossy
8-bit companding: the JDK-ENCODED u-law/A-law bytes must expand through
OUR ITU tables to within 1 quantization step of the JDK's own expansion
(implementations differ in round-vs-truncate on encode, not on the
table itself; our decode of a given byte must match the JDK's decode of
the same byte EXACTLY, which the au-roundtrip case pins).
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pytest

from fsql_spark.operators.codecs import (
    decode_aiff,
    decode_au,
    decode_wav,
    encode_aiff,
    encode_wav,
)

TOOLS = os.path.join(os.path.dirname(__file__), "..", "tools")

_RNG = np.random.RandomState(20261016)
S16 = _RNG.randint(-32768, 32768, 128).astype(np.int16)


@pytest.fixture(scope="module")
def jsound(spark):
    sys.path.insert(0, TOOLS)
    try:
        from jsound_ref import JSoundRef
    finally:
        sys.path.remove(TOOLS)
    return JSoundRef(spark)


def test_jdk_written_containers_decode_exactly(jsound):
    for ft, dec in [("wave", decode_wav), ("aiff", decode_aiff), ("au", decode_au)]:
        rate, got = dec(jsound.encode(S16, 8000, ft))
        assert rate == 8000
        assert got.dtype == np.int16
        assert (np.squeeze(got) == S16).all(), ft


def test_our_containers_read_by_jdk(jsound):
    for data in (encode_wav(S16, 8000), encode_aiff(S16, 8000)):
        rate, got, enc = jsound.decode(data)
        assert rate == 8000 and enc == "PCM_SIGNED"
        assert (got == S16).all()


def test_jdk_g711_au_expands_through_our_tables(jsound):
    """The JDK writes u-law/A-law .au; our ITU expansion of those BYTES
    must match the JDK's own expansion of the same bytes exactly — this
    pins the 256-entry decode tables against an independent
    implementation (encode-side companding choices cancel out because
    both sides decode the identical byte stream)."""
    for enc_name in ("ulaw", "alaw"):
        data = jsound.encode(S16, 8000, "au", encoding=enc_name)
        rate, ours = decode_au(data)
        jrate, theirs, jenc = jsound.decode(data)
        assert rate == jrate == 8000 and jenc == enc_name.upper()
        ours = np.squeeze(ours).astype(np.int32)
        theirs = theirs.astype(np.int32)
        assert ours.shape == theirs.shape
        # the JDK's u-law table expands to the same linear levels as the
        # ITU formulas; A-law likewise. Allow 0 difference — table-exact.
        diff = np.abs(ours - theirs)
        assert diff.max() == 0, (enc_name, diff.max(), int((diff > 0).sum()))
