"""Exact-substring duplicate spans (spans.py): known-answer tests on
constructed corpora for the properties the SQL-oracle harness can't isolate
— window-merge boundary cases (overlap / touch / gap), self-duplication
within one document, and the span-arithmetic identities."""

from __future__ import annotations

import pytest

from fsql_spark.operators import duplicated_kgram_positions, duplicated_spans


def _spans(spark, rows, k):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return {
        (r["doc_id"], r["span_start"]): (r["span_chars"], r["n_kgrams"])
        for r in duplicated_spans(df, k=k).collect()
    }


def test_cross_doc_copy_merges_to_one_maximal_span(spark):
    # two docs share a 12-char block inside unique flanks; k=8 flags
    # positions start..start+4 (5 windows) and they merge into ONE span of
    # exactly 12 chars in each doc
    shared = "ABCDEFGHIJKL"  # 12 chars
    rows = [(1, f"xxxxx{shared}yyyyy"), (2, f"qqq{shared}rrrrrrr")]
    out = _spans(spark, rows, k=8)
    assert out == {(1, 6): (12, 5), (2, 4): (12, 5)}


def test_self_duplication_within_one_doc_counts(spark):
    # Lee et al.'s any-second-occurrence rule: a doc repeating its own
    # 8-gram is flagged even though no other doc holds it
    rows = [(1, "ABCDEFGH....ABCDEFGH"), (2, "totally unrelated text")]
    out = _spans(spark, rows, k=8)
    assert out == {(1, 1): (8, 1), (1, 13): (8, 1)}


def test_fully_identical_docs_are_one_full_span(spark):
    # identical docs: EVERY window duplicated -> one maximal span covering
    # the whole text, with n_kgrams == len - k + 1 (dense span)
    txt = "ABCDEFGH" + "z" + "IJKLMNOP"  # 17 chars
    rows = [(1, txt), (2, txt)]
    out = _spans(spark, rows, k=8)
    assert out == {(1, 1): (17, 10), (2, 1): (17, 10)}


def test_true_split_spans(spark):
    # doc 1 shares two DISJOINT 8-blocks with two different docs; the
    # connecting middle is unique to doc 1 -> two separate spans
    rows = [
        (1, "ABCDEFGH" + "-unique middle-" + "IJKLMNOP"),
        (2, "ABCDEFGH plus other stuff"),
        (3, "other stuff then IJKLMNOP"),
    ]
    out = _spans(spark, rows, k=8)
    assert out[(1, 1)] == (8, 1)
    assert out[(1, 24)] == (8, 1)


def test_short_docs_and_uniques_absent(spark):
    rows = [(1, "short"), (2, "all chars here unique abcdefgh"), (3, "zyxw")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    assert duplicated_kgram_positions(df, k=8).count() == 0
    assert duplicated_spans(df, k=8).count() == 0


def test_k_validation(spark):
    df = spark.createDataFrame([(1, "abc")], "doc_id long, text string")
    with pytest.raises(ValueError, match="k must be >= 1"):
        duplicated_kgram_positions(df, k=0)


def test_span_arithmetic_invariants_on_testdata(spark):
    """On the real sf0.001 corpus: spans never overlap within a doc, every
    span covers >= k chars, and n_kgrams == span_chars - k + 1 for every
    maximal span (positions inside a span are contiguous? NO — only that
    consecutive flagged positions are <= k apart; the kgram count is
    bounded by the span extent)."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    k = 40
    rows = duplicated_spans(docs, k=k).collect()
    assert rows, "testdata corpus is known to contain duplicated 40-grams"
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
        assert r["span_chars"] >= k
        assert 1 <= r["n_kgrams"] <= r["span_chars"] - k + 1
    for doc, spans in by_doc.items():
        spans.sort(key=lambda r: r["span_start"])
        for a, b in zip(spans, spans[1:]):
            # maximality: had b started at or before a's end, the island
            # rule (pos <= prev + k) would have merged them
            assert b["span_start"] > a["span_start"] + a["span_chars"]
