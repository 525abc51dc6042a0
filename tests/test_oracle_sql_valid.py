"""Every oracle_sql() string must PLAN on DuckDB without touching Spark —
the instant syntax/binding gate. The strict hash gate catches this too,
but only after a full Spark run per entry; this fails in milliseconds
with the entry name when an oracle edit typos a column or a CTE."""

from __future__ import annotations

import duckdb
import pytest

import __spark_entry__ as entry_mod
from tests.driver_mimic import TABLES

SF_DIR = "/root/testdata/sf0.001"

ORACLES = entry_mod.oracle_sql()


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_plans_on_duckdb(name, con):
    con.execute(f"EXPLAIN {ORACLES[name]}")
