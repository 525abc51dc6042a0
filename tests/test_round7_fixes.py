"""Regression tests for the round-7 ADVICE/verdict fixes:

- pack_wav sample scale: byte 0 (NUL) must not wrap via int16 overflow
- lsh_ann_pairs dim probe: NULL first vector must not pin dim=-1
- decode kernels: foreign exceptions (non-ValueError) keep the media id
- stateless LM scorers: refuse to collect an unbounded external model
- simhash_pairs collapse_exact short-circuit: identical output either way
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from fsql_spark.operators import lm as lm_mod
from fsql_spark.operators.codecs import CodecError, decode_wav
from fsql_spark.operators.dedup import simhash_pairs
from fsql_spark.operators.multimodal import (
    decode_image_stats,
    pack_wav,
)
from fsql_spark.operators.similarity import lsh_ann_pairs


def test_pack_wav_nul_byte_exact(spark):
    # "\x00" is the worst case: (0-128)*256 = -32768 == int16 min, exact.
    # The old *257 scale produced -32896, which wrapped to +32640.
    docs = spark.createDataFrame(pd.DataFrame({"doc_id": [1], "text": ["\x00a\xff"]}))
    wav = pack_wav(docs).collect()[0]
    _rate, samples = decode_wav(bytes(wav["content"]))
    # text encodes to UTF-8 bytes [0x00, 0x61, 0xC3, 0xBF]
    expect = [(b - 128) * 256 for b in "\x00a\xff".encode("utf-8")]
    assert samples.tolist() == expect
    assert samples.dtype == np.int16
    assert samples.min() == -32768  # no wrap


def test_lsh_probe_skips_null_vectors(spark):
    rng = np.random.default_rng(7)
    rows = [(i, rng.standard_normal(8).tolist()) for i in range(4)]
    df = spark.createDataFrame([(99, None)] + rows, "vec_id: long, embedding: array<double>")
    # old behavior: F.size(NULL) = -1 pinned dim=-1 -> every batch failed
    out = lsh_ann_pairs(
        df.where("embedding IS NOT NULL OR vec_id = 99"),
        "vec_id", "embedding", 0.0, n_planes=2, n_tables=2,
    )
    out.collect()  # must not raise "expected -1-dim"


def test_lsh_all_null_is_empty(spark):
    # all-null corpus: null vectors are unmatchable and filtered -> empty
    # pair set (and no confusing "expected -1-dim" error from the probe)
    df = spark.createDataFrame([(1, None), (2, None)], "vec_id: long, embedding: array<double>")
    assert lsh_ann_pairs(df, "vec_id", "embedding", 0.0, n_planes=2, n_tables=2).count() == 0


def test_decode_kernel_annotates_foreign_exceptions(spark):
    # a payload that is neither PNG nor decodable: without Pillow the decode
    # raises NotImplementedError (type preserved); with Pillow installed it
    # raises UnidentifiedImageError — either way the media id must survive
    media = spark.createDataFrame(
        [(42, bytearray(b"\xff\xd8\xff\xe0 not really a jpeg"))],
        "media_id: long, content: binary",
    )
    with pytest.raises(Exception) as ei:
        decode_image_stats(media).collect()
    assert "media 42" in str(ei.value)


def test_stateless_lm_refuses_unbounded_model(spark, monkeypatch):
    monkeypatch.setattr(lm_mod, "MAX_STATELESS_MODEL_ROWS", 2)
    model = spark.createDataFrame(
        pd.DataFrame({"token": ["a", "b", "c"], "logprob": [-1.0, -2.0, -3.0]})
    )
    docs = spark.createDataFrame(pd.DataFrame({"doc_id": [1], "text": ["a b"]}))
    with pytest.raises(ValueError, match="exceeds 2 rows"):
        lm_mod.doc_cross_entropy_stateless(docs, model, -10.0)
    bi = spark.createDataFrame(
        pd.DataFrame({"prev": ["a", "a", "b"], "cur": ["b", "c", "c"], "logprob": [-1.0] * 3})
    )
    with pytest.raises(ValueError, match="bigram layer"):
        lm_mod.doc_bigram_cross_entropy_stateless(docs, {"a": -1.0}, -10.0, bi)


def test_simhash_collapse_shortcircuit_equivalence(spark):
    # corpus WITHOUT exact dups: short-circuit skips the collapse pass but
    # the output must be identical to plain simhash_pairs
    texts = [f"the quick brown fox {i} jumps over the lazy dog" for i in range(12)]
    df = spark.createDataFrame(pd.DataFrame({"doc_id": range(12), "text": texts}))
    plain = sorted(map(tuple, simhash_pairs(df, "doc_id", "text").collect()))
    for mode in (True, "auto"):  # no dup classes: all three modes agree
        collapsed = sorted(
            map(tuple, simhash_pairs(df, "doc_id", "text", collapse_exact=mode).collect())
        )
        assert plain == collapsed, mode
    # corpus WITH a dup class: collapse engages and keeps only canonical keys
    dup = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(6), "text": ["same text here"] * 3 + texts[:3]})
    )
    copies = {1, 2}  # non-canonical members of the dup class (canonical = 0)
    for mode in (True, "auto"):
        out = simhash_pairs(dup, "doc_id", "text", collapse_exact=mode).toPandas()
        assert not (set(out["doc_a"]) | set(out["doc_b"])) & copies, mode


def test_winnow_matches_reference_algorithm(spark):
    """winnow_fingerprints == the textbook algorithm (rightmost minimum of
    every fully-contained window, deduplicated) on adversarial inputs:
    repeated characters (ties everywhere), periodic strings, short docs."""
    import hashlib
    import random

    from fsql_spark.operators.text import winnow_fingerprints

    def ref(text, k=5, w=4):
        n = len(text) - k + 1
        if n < w:
            return set()
        hs = [hashlib.md5(text[i : i + k].encode()).hexdigest() for i in range(n)]
        sel = set()
        for s in range(n - w + 1):
            window = hs[s : s + w]
            m = min(window)
            q = s + max(i for i, h in enumerate(window) if h == m)
            sel.add((q + 1, hs[q]))
        return sel

    random.seed(11)
    texts = ["".join(random.choice("abcab ") for _ in range(random.randint(2, 60))) for _ in range(60)]
    texts += ["aaaaaaaaaaaa", "abcabcabcabc", "", "abcd", "abcdefgh"]
    df = spark.createDataFrame(pd.DataFrame({"doc_id": range(len(texts)), "text": texts}))
    got = winnow_fingerprints(df, k=5, w=4).toPandas()
    for i, t in enumerate(texts):
        mine = set(map(tuple, got[got.doc_id == i][["gram_pos", "fp"]].itertuples(index=False)))
        assert mine == ref(t), (i, t)


def test_winnow_guarantee_and_density(spark):
    """Every w-window of a long document contains >= 1 fingerprint, and the
    density is near the 2/(w+1) expectation for random text."""
    import random

    from fsql_spark.operators.text import winnow_fingerprints

    random.seed(5)
    text = "".join(random.choice("abcdefghijklmnop") for _ in range(4000))
    df = spark.createDataFrame(pd.DataFrame({"doc_id": [1], "text": [text]}))
    pos = sorted(winnow_fingerprints(df, k=5, w=4).toPandas()["gram_pos"])
    gaps = [b - a for a, b in zip(pos, pos[1:])]
    assert max(gaps) <= 4  # the winnowing guarantee: one selection per window
    density = len(pos) / (len(text) - 5 + 1)
    assert 0.3 < density < 0.5  # 2/(w+1) = 0.4


def test_winnow_xxhash64_lever(spark):
    """The production hash lever keeps the winnowing properties (max gap
    <= w, one selection per window) and is measurably cheaper per gram;
    md5 stays the oracle-portable default."""
    import random

    from fsql_spark.operators.text import winnow_fingerprints

    random.seed(3)
    text = "".join(random.choice("abcdefghij") for _ in range(3000))
    df = spark.createDataFrame(pd.DataFrame({"doc_id": [1], "text": [text]}))
    out = winnow_fingerprints(df, k=5, w=4, hash_fn="xxhash64").toPandas()
    pos = sorted(out["gram_pos"])
    gaps = [b - a for a, b in zip(pos, pos[1:])]
    assert max(gaps) <= 4
    assert out["fp"].dtype.kind in "iu" or out["fp"].map(lambda v: isinstance(v, int)).all()
    with pytest.raises(ValueError, match="hash_fn"):
        winnow_fingerprints(df, hash_fn="sha1")
