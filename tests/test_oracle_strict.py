"""Driver-strict local correctness gate: exact value-hash comparison (the
tolerant gate in test_oracle_parity let q9/q12 ship red for two rounds —
rows and schema matched but the driver's hash did not).

Mirrors the driver: columns sorted by name, rows sorted, repr-exact cell
hash — int64 vs float64 DIFFERS, a 1-ulp rounding flip DIFFERS. Runs every
oracle-backed ``queries()`` entry at sf0.001; set FSQL_STRICT_SF_DIR to run
the driver's sf0.01 (slower, used before round hand-off)."""

from __future__ import annotations

import os

import pytest

import __spark_entry__ as entry_mod
from tests.driver_mimic import compare, duck_connect

SF_DIR = os.environ.get("FSQL_STRICT_SF_DIR", "/root/testdata/sf0.001")

QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()


@pytest.fixture(scope="module")
def duck():
    con = duck_connect(SF_DIR)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(n for n in QUERIES if n in ORACLES))
def test_strict_hash_matches_driver(name, spark, duck):
    out = compare(name, spark, SF_DIR, con=duck)
    assert out.get("rows_match"), f"{name}: rows {out.get('spark_rows')} != {out.get('oracle_rows')}"
    assert out.get("schema_match"), f"{name}: column sets differ"
    assert out.get("hash_match"), f"{name}: value hash mismatch — {out.get('first_diff')}"
