"""Data-mixing divergence (mixing.py): known-answer and property tests —
identical sources score 0, the sparse closed-form zero-handling matches an
independent dense pure-Python JSD, and the bound [0, ln 2] holds on the
real corpus."""

from __future__ import annotations

import math

from fsql_spark.operators import source_js_divergence, source_token_probabilities


def _dense_jsd(pa: dict, pb: dict) -> float:
    """Independent dense JSD over the union support (the textbook formula
    the sparse closed form must equal)."""
    total = 0.0
    for t in set(pa) | set(pb):
        p, q = pa.get(t, 0.0), pb.get(t, 0.0)
        m = (p + q) / 2.0
        if p:
            total += 0.5 * p * math.log(p / m)
        if q:
            total += 0.5 * q * math.log(q / m)
    return total


def test_identical_sources_have_zero_divergence(spark):
    rows = [(i, "alpha beta beta gamma", f"s{i % 2}") for i in range(8)]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = source_js_divergence(df, top_k=10).collect()
    assert len(out) == 1
    assert out[0]["js_divergence"] == 0.0
    assert out[0]["shared_tokens"] == 3


def test_sparse_closed_form_matches_dense_python_jsd(spark):
    # three sources with overlapping-but-different vocabularies, one token
    # per side OUTSIDE the shared support — exercises the (1 - P_shared)
    # closed-form term the inner join can't see directly
    rows = [
        (1, "a a a b c", "s1"),
        (2, "a b b b d", "s2"),
        (3, "c c d d e", "s3"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    probs = {}
    for r in source_token_probabilities(df, top_k=10).collect():
        probs.setdefault(r["source"], {})[r["token"]] = r["p"]
    got = {
        (r["group_a"], r["group_b"]): r["js_divergence"]
        for r in source_js_divergence(df, top_k=10).collect()
    }
    assert set(got) == {("s1", "s2"), ("s1", "s3"), ("s2", "s3")}
    for (a, b), v in got.items():
        want = _dense_jsd(probs[a], probs[b])
        assert abs(v - want) < 1e-12, (a, b, v, want)
        assert 0.0 <= v <= math.log(2.0) + 1e-12


def test_renormalized_distributions_sum_to_one(spark):
    rows = [(1, "x y z z q", "s1"), (2, "x x y rare", "s2")]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    # top_k=3 cuts the tail; each source's kept mass renormalizes to 1
    per_source: dict[str, float] = {}
    for r in source_token_probabilities(df, top_k=3).collect():
        per_source[r["source"]] = per_source.get(r["source"], 0.0) + r["p"]
    for s, mass in per_source.items():
        assert abs(mass - 1.0) < 1e-12, (s, mass)


def test_testdata_matrix_shape_and_bounds(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    rows = source_js_divergence(docs, top_k=50).collect()
    n_src = docs.select("source").distinct().count()
    assert len(rows) == n_src * (n_src - 1) // 2
    for r in rows:
        assert r["group_a"] < r["group_b"]
        assert 0.0 <= r["js_divergence"] <= math.log(2.0) + 1e-12
