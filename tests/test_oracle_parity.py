"""Local twin of the driver's correctness gate: run every ``queries()`` entry
on Spark and its ``oracle_sql()`` on DuckDB over the same parquet, compare
row counts + order-insensitive values. Runs at sf0.001 for speed (the driver
uses sf0.01)."""

from __future__ import annotations

import math

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    yield con
    con.close()


def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    """Order-insensitive, dtype-tolerant canonical form."""
    pdf = pdf.reindex(sorted(pdf.columns), axis=1).copy()
    for col in pdf.columns:
        s = pdf[col]
        if pd.api.types.is_datetime64_any_dtype(s):
            pdf[col] = pd.to_datetime(s).dt.tz_localize(None).astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(s):
            pdf[col] = s.round(6)
        elif s.dtype == object:
            import datetime

            first = s.dropna().iloc[0] if s.notna().any() else None
            if isinstance(first, (datetime.date, datetime.datetime)):
                pdf[col] = pd.to_datetime(s).astype("datetime64[us]")
            else:
                pdf[col] = s.astype(str)
    pdf = pdf.sort_values(by=list(pdf.columns), ignore_index=True)
    return pdf


def assert_matches(name: str, spark_df, oracle_df: pd.DataFrame):
    got = normalize(spark_df.toPandas())
    want = normalize(oracle_df)
    assert len(got) == len(want), f"{name}: row count {len(got)} != oracle {len(want)}"
    assert list(got.columns) == list(want.columns), (
        f"{name}: columns {list(got.columns)} != oracle {list(want.columns)}"
    )
    for col in got.columns:
        g, w = got[col], want[col]
        if pd.api.types.is_float_dtype(g) or pd.api.types.is_float_dtype(w):
            ok = [
                (math.isnan(a) and math.isnan(b)) or abs(a - b) <= 1e-6 + 1e-9 * abs(b)
                for a, b in zip(g.astype(float).fillna(float("nan")), w.astype(float).fillna(float("nan")))
            ]
            assert all(ok), f"{name}.{col}: value mismatch (first bad row {ok.index(False)})"
        else:
            pd.testing.assert_series_equal(
                g, w, check_dtype=False, check_names=False, obj=f"{name}.{col}"
            )


QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, spark, duck):
    fn = QUERIES[name]
    df = fn(spark, SF_DIR)
    sql = ORACLES.get(name)
    if sql is None:
        # rows-only contract: must run and have a stable schema
        assert df.count() >= 0
        assert df.columns
        return
    assert_matches(name, df, duck.execute(sql).df())


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() >= 0
    assert df.columns
