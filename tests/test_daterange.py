"""DateRangeQuery / DateRangeGenerator tests mirroring the reference
(`/root/reference/tests/test_daterange.py`, `tests/test_daterange_ext.py`)."""

from __future__ import annotations

import pandas as pd

from fsql_spark import (
    DateRangeGenerator,
    DateRangeQuery,
    Q_AND,
    Q_EQ,
    Q_TRUE,
    read_partitioned_table,
)

from .conftest import assert_same


def build_ymd(tmp_path, root, layout):
    """layout: iterable of (relpath, tag)."""
    for rel, tag in layout:
        d = tmp_path / root / rel
        d.mkdir(parents=True, exist_ok=True)
        pd.DataFrame({"v": [tag]}).to_csv(d / f"f{tag}.csv", index=False)


MONTH_BOUNDARY = [
    ("year=2022/month=4/jaj=29", 0),
    ("year=2022/month=4/jaj=30", 1),
    ("year=2022/month=5/jaj=1", 2),
    ("year=2022/month=5/jaj=2", 3),
]


def test_daterange_query_month_boundary(spark, tmp_path):
    """[2022/4/30, 2022/5/2) across a month boundary, renamed day column
    (`test_daterange.py:14-50`)."""
    build_ymd(tmp_path, "t", MONTH_BOUNDARY)
    q = DateRangeQuery("2022/04/30", "2022/05/02", day_name="jaj")
    out = read_partitioned_table(str(tmp_path / "t"), q, spark=spark)
    assert sorted(out.toPandas()["v"].tolist()) == [1, 2]


def test_daterange_generator_equals_query(spark, tmp_path):
    """Generator (zero-ls path synthesis) must produce the identical result
    (`test_daterange.py:35-50`)."""
    build_ymd(tmp_path, "t", MONTH_BOUNDARY)
    q = DateRangeQuery("2022/04/30", "2022/05/02", day_name="jaj")
    via_query = read_partitioned_table(str(tmp_path / "t"), q, spark=spark)
    gen = DateRangeGenerator.build("2022/04/30", "2022/05/02", day_name="jaj")
    via_generator = read_partitioned_table(str(tmp_path / "t"), Q_TRUE, column_parser=gen, spark=spark)
    assert_same(via_query, via_generator.toPandas())


def test_daterange_combined_with_outer_column(spark, tmp_path):
    """Q_AND(Q_EQ, DateRangeQuery) with a non-date outer partition level
    (`test_daterange_ext.py:15-40`)."""
    layout = [
        (f"col={c}/year=2022/month={m}/day={d}", int(f"{c}{m}{d}"))
        for c in ["1", "2"]
        for m, d in [("4", "30"), ("5", "1"), ("5", "2")]
    ]
    build_ymd(tmp_path, "t", layout)
    q = Q_AND(Q_EQ("col", "1"), DateRangeQuery("2022/04/30", "2022/05/02"))
    out = read_partitioned_table(str(tmp_path / "t"), q, spark=spark)
    assert sorted(out.toPandas()["v"].tolist()) == [151, 1430]  # 1/4/30 and 1/5/1


def test_daterange_generator_valueonly_custom_names(spark, tmp_path):
    """include_column_in_path=False + custom year name
    (`test_daterange_ext.py:43-67`)."""
    layout = [("2022/4/30", 1), ("2022/5/1", 2), ("2022/5/2", 3)]
    build_ymd(tmp_path, "t", layout)
    gen = DateRangeGenerator.build(
        "2022/04/30", "2022/05/02", year_name="annus", include_column_in_path=False
    )
    out = read_partitioned_table(str(tmp_path / "t"), Q_TRUE, column_parser=gen, spark=spark)
    pdf = out.toPandas()
    assert sorted(pdf["v"].tolist()) == [1, 2]
    assert set(pdf["annus"]) == {"2022"}


def test_eval_available_interval_pruning():
    """Partial y/m bindings complete to leftmost/rightmost dates
    (`daterange_utils.py:63-79`)."""
    q = DateRangeQuery("2022/04/30", "2022/05/02")
    assert q.eval_available({})                              # nothing bound
    assert q.eval_available({"year": "2022"})
    assert not q.eval_available({"year": "2021"})
    assert q.eval_available({"year": "2022", "month": "4"})
    assert not q.eval_available({"year": "2022", "month": "3"})
    assert not q.eval_available({"year": "2022", "month": "6"})
    assert q.eval_all({"year": "2022", "month": "5", "day": "1"})
    assert not q.eval_all({"year": "2022", "month": "5", "day": "2"})  # half-open
