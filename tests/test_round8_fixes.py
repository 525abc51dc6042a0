"""Regression tests for the round-8 ADVICE/verdict fixes:

- FLAC STREAMINFO min-blocksize: the TRUE minimum (short tail frame), not
  a copy of max — spec-strict validators flag frames below the declared min
- FLAC frame-header bps code: a frame legally declaring a different depth
  than STREAMINFO is refused (CodecError), not silently mis-parsed
- WAV EXTENSIBLE wValidBitsPerSample: valid != container bits is refused
- simhash_pairs collapse_exact: a typo ("Auto", "always") raises ValueError
  instead of silently flipping to True
- GIF / palette-PNG / gray-PNG synths: repartitioned before the kernel so a
  single-file scan does not serialize the per-byte encode onto one task
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd
import pytest

from fsql_spark.operators.codecs import CodecError, decode_wav
from fsql_spark.operators.dedup import simhash_pairs
from fsql_spark.operators.flac import decode_flac, encode_flac


@pytest.mark.parametrize("n", [4096 * 2 + 100, 4096 * 2, 50])
def test_flac_streaminfo_declares_fixed_blocksize(n):
    # min == max == block_size even with a short tail frame: equal fields
    # signal a FIXED-blocksize stream (matching the frames' blocking-
    # strategy bit), the last block is exempt from the declared minimum,
    # and blocksize fields must be >= 16 — so the tail's true size (100,
    # or 50 for a single short frame) must NOT be written (RFC 9639;
    # the round-7 ADVICE item suggesting otherwise was investigated and
    # is wrong — see encode_flac's comment)
    samples = np.arange(n, dtype=np.int16) % 1000
    data = encode_flac(samples, sample_rate=8000, block_size=4096)
    # STREAMINFO: 4-byte magic, 4-byte block header, then min(16) max(16)
    assert struct.unpack(">HH", data[8:12]) == (4096, 4096)
    rate, decoded = decode_flac(data)
    assert rate == 8000 and decoded.tolist() == samples.tolist()


def test_flac_frame_bps_disagreeing_with_streaminfo_refused():
    samples = np.zeros(64, dtype=np.int16)  # 16-bit -> frame bps code 4
    data = bytearray(encode_flac(samples, sample_rate=8000, block_size=64))
    # frame header: first 0xFFF8 sync after the metadata blocks. Layout:
    # sync(14) rsv(1) blocking(1) | bs(4) sr(4) | ch(4) bps(3) rsv(1) ->
    # bps code sits in byte hdr+3 bits 3..1. Flip code 4 (16-bit) to 1
    # (8-bit) and re-sign the header CRC-8.
    hdr = bytes(data).index(b"\xff\xf8")
    data[hdr + 3] = (data[hdr + 3] & ~0x0E) | (1 << 1)
    from fsql_spark.operators.flac import _crc8

    # header CRC-8 is the byte right before subframe data; re-sign so the
    # new refusal (not a CRC mismatch) is what fires
    crc_pos = hdr + 4 + 1  # sync..rsv 4 bytes, 1-byte UTF-8 frame number
    data[crc_pos] = _crc8(bytes(data[hdr:crc_pos]))
    with pytest.raises(CodecError, match="frame declares 8-bit"):
        decode_flac(bytes(data))


def _wav_extensible(valid_bits: int) -> bytes:
    """Minimal WAVE_FORMAT_EXTENSIBLE file: 16-bit PCM SubFormat, 1 ch."""
    # PCM SubFormat GUID 00000001-0000-0010-8000-00AA00389B71 (16 bytes)
    sub = struct.pack("<IHH", 1, 0, 0x10) + bytes.fromhex("800000aa00389b71")
    ext = struct.pack("<HI", valid_bits, 0x4) + sub
    fmt = struct.pack("<HHIIHH", 0xFFFE, 1, 8000, 16000, 2, 16)
    fmt_body = fmt + struct.pack("<H", len(ext)) + ext
    frames = struct.pack("<4h", 1, -2, 3, -4)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt_body)) + fmt_body
        + b"data" + struct.pack("<I", len(frames)) + frames
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_wav_extensible_full_valid_bits_decodes():
    for vb in (16, 0):  # 0 = unset, treated as container width
        rate, samples = decode_wav(_wav_extensible(vb))
        assert rate == 8000 and samples.tolist() == [1, -2, 3, -4]


def test_wav_extensible_partial_valid_bits_refused():
    with pytest.raises(NotImplementedError, match="20 valid bits"):
        decode_wav(_wav_extensible(20))


def test_simhash_collapse_exact_typo_rejected(spark):
    df = spark.createDataFrame(pd.DataFrame({"k": [1, 2], "t": ["a", "a"]}))
    for bad in ("Auto", "always", "yes", 2):
        with pytest.raises(ValueError, match="collapse_exact"):
            simhash_pairs(df, "k", "t", collapse_exact=bad)


@pytest.mark.parametrize("synth_name", [
    # EVERY MEDIA_SCHEMA producer taking (spark, sf) — a new synth that
    # forgets the spread fails here, not at the sf10 sweep
    "documents_as_png", "documents_as_palette_png", "documents_as_gif",
    "documents_as_jpeg", "documents_as_tiff", "documents_as_webp",
    "documents_as_webp_palette",
    "documents_as_wav",
    "documents_as_audio", "documents_as_video", "documents_as_media",
])
def test_media_synths_spread_single_file_scans(spark, synth_name):
    # the per-byte encode kernels must not run as ONE task on a single-file
    # scan (PERF.md: 33.7s -> 1.8s lesson); assert the plan repartitions
    from fsql_spark.operators import multimodal

    df = getattr(multimodal, synth_name)(spark, "/root/testdata/sf0.001")
    assert df.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism


@pytest.mark.parametrize("pack_name", [
    "pack_y4m", "pack_video", "pack_wav", "pack_flac", "pack_aiff",
])
def test_pack_kernels_spread_single_file_scans(spark, pack_name):
    # the pack_* family spreads INSIDE the producer, so callers (batch
    # entries AND ad-hoc users) get the protection without opting in
    from fsql_spark.operators import multimodal

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    assert docs.rdd.getNumPartitions() < spark.sparkContext.defaultParallelism
    df = getattr(multimodal, pack_name)(docs)
    assert df.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism


def test_spread_for_kernel_is_noop_on_parallel_input(spark):
    # on an already-parallel source (many-file layout / 100 TB corpus) the
    # spread must NOT add a shuffle — an unconditional repartition would
    # move the whole corpus for nothing
    from fsql_spark.operators.multimodal import _spread_for_kernel

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    wide = docs.repartition(64)
    out = _spread_for_kernel(wide)
    assert out is wide  # plan unchanged, no extra Exchange
    # the raw single-file scan (1 partition) DOES get spread
    assert docs.rdd.getNumPartitions() < spark.sparkContext.defaultParallelism
    assert (
        _spread_for_kernel(docs).rdd.getNumPartitions()
        == spark.sparkContext.defaultParallelism
    )


# --------------------------------------- bounded kernel output batches

def test_bounded_slices_respects_budget_and_covers_all_rows():
    import pandas as pd

    from fsql_spark.operators.multimodal import _bounded_slices

    pdf = pd.DataFrame({"x": range(10)})
    est = [40, 40, 40, 5, 100, 1, 1, 1, 200, 1]
    slices = list(_bounded_slices(pdf, est, budget=100))
    # every slice's estimate fits the budget unless it is a single row
    for s in slices:
        tot = sum(est[i] for i in s.index)
        assert tot <= 100 or len(s) == 1
    # partition: concatenation reproduces the input exactly, in order
    assert pd.concat(slices).x.tolist() == list(range(10))
    # an oversized single row still comes through (never an infinite loop)
    assert any(len(s) == 1 and est[s.index[0]] == 200 for s in slices)


def test_pack_y4m_yields_bounded_batches(spark):
    """A fan-out synth must never emit one giant Arrow batch: with a tiny
    budget patched in, a wide-text corpus comes back in MANY batches whose
    payloads each respect the cap — and the content is unchanged."""
    import pandas as pd

    from fsql_spark.operators import multimodal as mm

    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": list(range(20)), "text": ["a" * 1000] * 20})
    )
    media = mm.pack_y4m(docs, frame_w=8, frame_h=8).collect()
    assert len(media) == 20
    # each blob: 1000 frames x (64 luma + 6 header) + stream header
    assert all(len(r.content) > 1000 * 70 for r in media)
    # per-row estimate ~70 KB against the default 32 MB budget -> one slice
    # locally; force the budget down to prove slicing kicks in
    pdf = pd.DataFrame({"doc_id": list(range(20)), "text": ["a" * 1000] * 20})
    est = pdf["text"].str.len() * 70 + 128
    slices = list(mm._bounded_slices(pdf, est, budget=150_000))
    assert len(slices) >= 10  # ~2 rows per 150 KB budget
    assert pd.concat(slices).doc_id.tolist() == list(range(20))


def test_pack_y4m_multi_slice_batch_stays_aligned(spark):
    """REGRESSION (caught by the sf10 sweep): a non-first _bounded_slices
    slice keeps the parent batch's pandas index; building the output frame
    from that Series plus fresh-RangeIndex Series unioned both indexes and
    misaligned every column, crashing the worker. Texts big enough to split
    one input batch under the REAL 32 MB budget (a monkeypatched budget
    never reaches executor-side re-imports of the module) exercise the
    second slice; ids and content must stay paired."""
    import pandas as pd

    from fsql_spark.operators import multimodal as mm
    from fsql_spark.operators.video import decode_y4m

    # 12 docs x 47k chars: ~3.3 MB estimated output each, ~40 MB total ->
    # at least two slices inside the single coalesced input batch
    docs = spark.createDataFrame(
        pd.DataFrame(
            {"doc_id": list(range(12)), "text": [chr(97 + i) * 47_000 for i in range(12)]}
        )
    ).coalesce(1)
    out = mm.pack_y4m(docs, frame_w=8, frame_h=8).select("media_id", "content").collect()
    rows = {r.media_id: r for r in out}
    assert sorted(rows) == list(range(12))
    for i in (0, 11):  # first slice and last slice
        y = decode_y4m(bytes(rows[i].content))["y"]
        assert y.shape == (47_000, 8, 8)
        assert int(y[0, 0, 0]) == 97 + i  # frame bytes match THIS doc's text


def test_frame_samplers_flush_bounded_output(spark):
    """The per-frame fan-out kernels flush output at the byte budget
    (~280k rows) instead of buffering a whole input batch's frames. A
    single 300k-frame video crosses the mid-loop flush threshold through
    the REAL executor path; every frame must come back exactly once and
    in order across the flush boundary."""
    import pandas as pd

    from fsql_spark.operators import multimodal as mm
    from fsql_spark.operators.video import decode_y4m  # noqa: F401 — import check

    n = 300_000
    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1], "text": ["ab" * (n // 2)]})
    )
    media = mm.pack_y4m(docs, frame_w=2, frame_h=2)
    got = mm.sample_video_frames(media, every=1).orderBy("frame_idx").collect()
    assert len(got) == n
    assert got[0].frame_idx == 0 and got[-1].frame_idx == n - 1
    # luma of frame i is 4 * byte(i): 'a'=97 alternating 'b'=98
    assert got[0].luma_sum == 4 * 97 and got[1].luma_sum == 4 * 98
    assert got[279_999].luma_sum in (4 * 97, 4 * 98)  # spans the flush edge
    assert len({r.frame_idx for r in got}) == n  # no duplicated rows
