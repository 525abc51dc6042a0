"""Perceptual-hash image dedup (phash.py): known-answer bit patterns on
constructed images, the RGB luma-collapse path, cross-codec agreement
(same pixels through PNG and BMP must hash identically), and validation."""

from __future__ import annotations

import numpy as np
import pytest

from fsql_spark.operators import perceptual_hashes, phash_clusters
from fsql_spark.operators.codecs import encode_png


def _media(spark, items):
    return spark.createDataFrame(
        [(i, bytearray(b)) for i, b in items], "media_id long, content binary"
    )


def _hashes(spark, items, hash_size=8):
    df = _media(spark, items)
    return {
        r["media_id"]: r["phash"]
        for r in perceptual_hashes(df, hash_size=hash_size).collect()
    }


def test_known_answer_half_bright(spark):
    # left half 200, right half 10: bits are 1 on the left columns, 0 right
    arr = np.full((8, 8), 10, np.uint8)
    arr[:, :4] = 200
    out = _hashes(spark, [(1, encode_png(arr))], hash_size=8)
    assert out[1] == ("1111" + "0000") * 8


def test_uniform_image_is_all_zero_bits(spark):
    # strict threshold: v > mean is false everywhere on a constant image
    arr = np.full((16, 16), 77, np.uint8)
    out = _hashes(spark, [(1, encode_png(arr))], hash_size=8)
    assert out[1] == "0" * 64


def test_reencode_and_resize_collide_bytes_differ(spark):
    # the whole point: byte-unequal variants of the same picture share a
    # hash. Variant A: different PNG row filters. Variant B: 2x upscale
    # (nearest-neighbor sampling lands on the same source pixels).
    rng = np.random.RandomState(7)
    arr = rng.randint(0, 256, (8, 8), dtype=np.uint8)
    big = np.kron(arr, np.ones((2, 2), np.uint8))
    a = encode_png(arr, filters="none")
    b = encode_png(arr, filters="cycle")
    c = encode_png(big, filters="cycle")
    assert a != b  # genuinely different bytes
    out = _hashes(spark, [(1, a), (2, b), (3, c)], hash_size=8)
    assert out[1] == out[2] == out[3]
    clustered = {
        r["media_id"]: (r["cluster_size"], r["canonical_id"])
        for r in phash_clusters(
            perceptual_hashes(_media(spark, [(1, a), (2, b), (3, c)]))
        ).collect()
    }
    assert clustered == {1: (3, 1), 2: (3, 1), 3: (3, 1)}


def test_cross_codec_same_pixels_same_hash(spark):
    from fsql_spark.operators.bmp import encode_bmp

    rng = np.random.RandomState(11)
    gray = rng.randint(0, 256, (12, 9), dtype=np.uint8)
    rgb = np.stack([gray, np.roll(gray, 1, 0), np.roll(gray, 2, 1)], axis=2)
    out = _hashes(
        spark,
        [(1, encode_png(rgb)), (2, encode_bmp(rgb))],
        hash_size=8,
    )
    assert out[1] == out[2]


def test_rgb_luma_collapse_is_integer_mean(spark):
    # channels (30, 60, 93): luma = 183 // 3 = 61 everywhere except one
    # bright sample -> exactly one 1-bit
    rgb = np.zeros((8, 8, 3), np.uint8)
    rgb[..., 0], rgb[..., 1], rgb[..., 2] = 30, 60, 93
    rgb[0, 0] = (255, 255, 255)
    out = _hashes(spark, [(1, encode_png(rgb))], hash_size=8)
    assert out[1] == "1" + "0" * 63


def test_hash_size_validation_and_id_on_error(spark):
    df = _media(spark, [(7, b"not an image")])
    with pytest.raises(ValueError, match="hash_size must be >= 1"):
        perceptual_hashes(df, hash_size=0)
    from pyspark.errors.exceptions.captured import PythonException

    with pytest.raises(PythonException) as ei:
        perceptual_hashes(df).collect()
    assert "media 7" in str(ei.value)


def _hash_frame(spark, items):
    return spark.createDataFrame(items, "media_id long, phash string")


def test_near_pairs_pigeonhole_and_verify(spark):
    from fsql_spark.operators import phash_near_pairs

    base = "0" * 64
    flip3 = "1" * 3 + "0" * 61          # hamming 3 < n_bands=4 -> guaranteed
    flip8 = ("1" * 2 + "0" * 14) * 4    # 2 diffs in EVERY band -> no band match
    flip6_one_band = "1" * 6 + "0" * 58  # 6 diffs all in band 0 -> caught, ham 6
    rows = [(1, base), (2, flip3), (3, flip8), (4, flip6_one_band)]
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in phash_near_pairs(_hash_frame(spark, rows)).collect()
    }
    # pigeonhole guarantee: ham < n_bands is always recalled
    assert got[(1, 2)] == 3
    # all-bands-dirty pair is an LSH miss even though ham=8 > 6 anyway;
    # the one-band-clean ham-6 pair is caught at the threshold
    assert got[(1, 4)] == 6
    assert (1, 3) not in got
    # candidates colliding in MULTIPLE bands emit exactly one row
    assert sum(1 for k in got if k == (2, 4)) <= 1


def test_near_pairs_threshold_excludes_above_max(spark):
    from fsql_spark.operators import phash_near_pairs

    base = "0" * 64
    # 7 diffs all inside band 0 -> bands 1..3 match -> candidate, ham 7 > 6
    flip7_one_band = "1" * 7 + "0" * 57
    rows = [(1, base), (2, flip7_one_band)]
    out = phash_near_pairs(_hash_frame(spark, rows), max_hamming=6).collect()
    assert out == []
    out7 = phash_near_pairs(_hash_frame(spark, rows), max_hamming=7).collect()
    assert [(r["id_a"], r["id_b"], r["hamming"]) for r in out7] == [(1, 2, 7)]


def test_near_pairs_band_validation(spark):
    from fsql_spark.operators import phash_near_pairs

    with pytest.raises(ValueError, match="must divide"):
        phash_near_pairs(_hash_frame(spark, [(1, "0" * 64)]), n_bands=5)


def test_near_pairs_collapse_exact_first(spark):
    from fsql_spark.operators import phash_near_pairs

    # ids 1,5,9 share one hash; ids 2,7 share a hash 2 bits away ->
    # exactly ONE pair row between representatives 1 and 2 with member
    # counts 3 and 2 (never the 3x2 image-level pairs, and no ham-0 rows)
    ha = "0" * 64
    hb = "11" + "0" * 62
    rows = [(5, ha), (1, ha), (9, ha), (7, hb), (2, hb)]
    out = phash_near_pairs(_hash_frame(spark, rows)).collect()
    assert [(r["id_a"], r["id_b"], r["hamming"], r["members_a"], r["members_b"])
            for r in out] == [(1, 2, 2, 3, 2)]
