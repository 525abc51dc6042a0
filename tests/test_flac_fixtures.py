"""Vendored FLAC fixture arbitration (round 11, VERDICT r10 item 4).

Each committed stream under ``tests/fixtures/flac/`` was assembled by
``tools/flac_assembler.py`` — an independent, decoder-free transcription
of RFC 9639 that imports nothing from ``fsql_spark`` — and its expected
PCM is the assembler's INPUT, fixed before any decoding happened. The
decoder under test (``fsql_spark/operators/flac.py``) must reproduce
those samples exactly. This breaks the encoder/decoder consistent-pair
blind spot the r10 WebP/TIFF arbitration exposed twice: a convention bug
shared by ``encode_flac`` and ``decode_flac`` round-trips clean but
CANNOT match a stream written by a second transcription.

MANIFEST.json md5-pins every committed artifact (tamper evidence), and —
since this environment has no FLAC implementation to arbitrate against
(no libFLAC, no ``flac`` binary, no JDK support; COVERAGE.md) — the
committed bytes are the channel that makes OFFLINE arbitration possible:
``flac -d <fixture>`` anywhere must yield expected.npz's samples.
"""

from __future__ import annotations

import hashlib
import json
import os

import numpy as np
import pytest

from fsql_spark.operators.flac import decode_flac

FIXTURE_DIR = os.path.join(os.path.dirname(__file__), "fixtures", "flac")

with open(os.path.join(FIXTURE_DIR, "MANIFEST.json")) as _fh:
    MANIFEST = json.load(_fh)

EXPECTED = np.load(os.path.join(FIXTURE_DIR, "expected.npz"))


@pytest.mark.parametrize("name", sorted(MANIFEST))
def test_fixture_decodes_to_assembled_pcm(name):
    path = os.path.join(FIXTURE_DIR, f"{name}.flac")
    with open(path, "rb") as fh:
        data = fh.read()
    entry = MANIFEST[name]
    # tamper evidence: the committed bytes are exactly what the assembler
    # produced (a regenerated-but-different stream must not slip through)
    assert hashlib.md5(data).hexdigest() == entry["md5_stream"], name
    assert len(data) == entry["bytes"], name

    rate, samples = decode_flac(data)
    want = EXPECTED[f"{name}_pcm"]
    assert rate == entry["sample_rate"] == int(EXPECTED[f"{name}_rate"])
    assert samples.dtype == np.dtype(entry["dtype"]), (samples.dtype, entry["dtype"])
    assert samples.shape == tuple(entry["shape"]), (samples.shape, entry["shape"])
    assert hashlib.md5(want.tobytes()).hexdigest() == entry["md5_expected_pcm"], name
    np.testing.assert_array_equal(samples, want, err_msg=name)


def test_fixture_surface_is_complete():
    """The fixture set must keep covering every decode path family —
    losing a fixture file silently would shrink arbitration coverage."""
    required = {
        "subframe_types", "lpc_subframes", "stereo_modes", "wasted_bits",
        "rice_partitions", "mono8", "stereo24", "variable_blocking",
    }
    assert required <= set(MANIFEST)
    on_disk = {f[:-5] for f in os.listdir(FIXTURE_DIR) if f.endswith(".flac")}
    assert required <= on_disk
