"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query smoke check at sf0.001.
``queries()`` — every implemented operator (SURVEY.md §2 + driver extensions),
one callable ``(spark, sf_dir) -> DataFrame`` each.
``oracle_sql()`` — DuckDB-equivalent ANSI SQL per query (omitted only for
genuinely non-SQL-expressible ops, which get the weaker rows-only check).

Engine code lives in ``fsql_spark``; this module only adapts it to the
driver harness.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from fsql_spark.relational import RELATIONAL_ORACLES, RELATIONAL_QUERIES  # noqa: E402
from fsql_spark.session import configure  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: TPC-H Q5-shaped star join
    (broadcast dims + shuffled facts + aggregation)."""
    configure(spark)
    from fsql_spark.relational import q5_local_supplier_volume

    return q5_local_supplier_volume(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    out.update(RELATIONAL_QUERIES)
    from fsql_spark.sql import SQL_QUERIES

    out.update(SQL_QUERIES)
    from fsql_spark.fsql_catalog import FSQL_QUERIES

    out.update(FSQL_QUERIES)
    try:  # extension operators land incrementally; never break the contract
        from fsql_spark.operators import EXTENSION_QUERIES

        out.update(EXTENSION_QUERIES)
    except ImportError:
        pass
    try:
        from fsql_spark.streaming import STREAMING_QUERIES

        out.update(STREAMING_QUERIES)
    except ImportError:
        pass
    return out


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    out.update(RELATIONAL_ORACLES)
    from fsql_spark.sql import SQL_ORACLES

    out.update(SQL_ORACLES)
    from fsql_spark.fsql_catalog import FSQL_ORACLES

    out.update(FSQL_ORACLES)
    try:
        from fsql_spark.operators import EXTENSION_ORACLES

        out.update(EXTENSION_ORACLES)
    except ImportError:
        pass
    try:
        from fsql_spark.streaming import STREAMING_ORACLES

        out.update(STREAMING_ORACLES)
    except ImportError:
        pass
    return out
