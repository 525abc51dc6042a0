"""LexRangeQuery boundary matrix, ported 1:1 from the reference
(`/root/reference/tests/test_lex_range_query.py`) — SURVEY §7 flags these
semantics as easy to get subtly wrong. Exercises both the Python evaluator
(driver pruning) and the Catalyst compilation (fast path)."""

from __future__ import annotations

import pandas as pd
import pytest

from fsql_spark import (
    ColumnComparator,
    ColumnRange,
    LexRangeQuery,
    Q_AND,
    Q_EQ,
    Q_OR,
    read_partitioned_table,
)


def test_invalid_range_rejected():
    with pytest.raises(ValueError, match="invalid range"):
        ColumnRange("c1", "z", "a")
    with pytest.raises(ValueError, match="invalid range"):
        ColumnRange("c1", "27", "3", ColumnComparator.num)


def build_tree(tmp_path, c1s, c2s, c3s):
    i = 0
    for a in c1s:
        for b in c2s:
            for c in c3s:
                d = tmp_path / f"t/c1={a}/c2={b}/c3={c}"
                d.mkdir(parents=True, exist_ok=True)
                pd.DataFrame({"k": [i]}).to_csv(d / "f.csv", index=False)
                i += 1


QUERY_3COL = LexRangeQuery(
    [
        ColumnRange("c1", "b", "d"),
        ColumnRange("c2", "", "", ColumnComparator.wld),
        ColumnRange("c3", "c", "d"),
    ]
)


def _eval3(c1, c3):
    return QUERY_3COL.eval_all({"c1": c1, "c2": "x", "c3": c3})


def test_lex_range_3col_python_matrix():
    """[b,*,c] <= (c1,c2,c3) < [d,*,d): min edge in, max edge out, wld ignored
    (`test_lex_range_query.py:24-56`)."""
    assert _eval3("b", "c")            # exactly the min tuple -> included
    assert not _eval3("b", "b")        # below min on c3 while tied on c1
    assert _eval3("b", "d")            # tied min on c1, c3 above min3 -> in
    assert _eval3("c", "a")            # strictly inside on c1: c3 free
    assert _eval3("c", "d")
    assert _eval3("d", "c")            # tied max on c1, c3 < max3 -> in
    assert not _eval3("d", "d")        # exactly the max tuple -> excluded
    assert not _eval3("a", "c")        # below min on c1
    assert not _eval3("e", "a")        # above max on c1


def test_lex_range_3col_spark(spark, tmp_path):
    build_tree(tmp_path, "abcde", ["m"], "abcd")
    out = read_partitioned_table(str(tmp_path / "t"), QUERY_3COL, spark=spark)
    got = {(r["c1"], r["c3"]) for r in out.select("c1", "c3").collect()}
    expected = {
        (a, c)
        for a in "abcde"
        for c in "abcd"
        if _eval3(a, c)
    }
    assert got == expected


NUM_QUERY = LexRangeQuery([ColumnRange("c1", "3", "27", ColumnComparator.num)])


def test_lex_range_numeric(spark, tmp_path):
    """num comparator: 9 < 11 < 27 numerically, not lexically; [3, 27) half-open
    (`test_lex_range_query.py:59-85`)."""
    for v in ["1", "3", "9", "11", "21", "27", "101"]:
        d = tmp_path / f"t/c1={v}"
        d.mkdir(parents=True)
        pd.DataFrame({"k": [int(v)]}).to_csv(d / "f.csv", index=False)
    out = read_partitioned_table(str(tmp_path / "t"), NUM_QUERY, spark=spark)
    assert sorted(out.toPandas()["c1"].astype(int).tolist()) == [3, 9, 11, 21]
    # python evaluator agrees
    for v, expect in [("1", False), ("3", True), ("9", True), ("11", True), ("21", True), ("27", False), ("101", False)]:
        assert NUM_QUERY.eval_all({"c1": v}) is expect


def test_lex_range_combined(spark, tmp_path):
    """OR/AND with Q_EQ; the AND case yields the documented empty-DF deviation
    (`test_lex_range_query.py:88-114`)."""
    for v in ["0", "1", "3", "6", "7", "8"]:
        d = tmp_path / f"t/c1={v}"
        d.mkdir(parents=True)
        pd.DataFrame({"k": [int(v)]}).to_csv(d / "f.csv", index=False)
    rng = LexRangeQuery([ColumnRange("c1", "1", "5", ColumnComparator.num)])
    union = read_partitioned_table(str(tmp_path / "t"), Q_OR(rng, Q_EQ("c1", "7")), spark=spark)
    assert sorted(union.toPandas()["c1"].astype(int).tolist()) == [1, 3, 7]
    empty = read_partitioned_table(str(tmp_path / "t"), Q_AND(rng, Q_EQ("c1", "7")), spark=spark)
    assert empty.count() == 0  # reference crashes here; we return empty


def test_eval_available_prunes_optimistically():
    """Partial bindings: missing column -> True (the pruning oracle)."""
    assert QUERY_3COL.eval_available({"c1": "c"})
    assert QUERY_3COL.eval_available({"c1": "b"})   # tied min, can't rule out
    assert not QUERY_3COL.eval_available({"c1": "a"})
    assert not QUERY_3COL.eval_available({"c1": "e"})
    assert QUERY_3COL.eval_available({})
