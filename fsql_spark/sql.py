"""SQL entry point over path-based tables — metastore-less, like everything
else here.

The reference has no SQL front end ("no proper parser & grammar & query
optimiser is used", reference README.md:42); in this engine SQL comes free
from Spark once path tables are registered as temp views. ``sql()`` resolves
table names lazily: any identifier in the statement that matches a
``{root}/{name}.parquet`` file (or a partitioned subdirectory) is registered
before execution.
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, SparkSession


def register_path_tables(spark: SparkSession, root: str) -> list[str]:
    """Register every parquet table under ``root`` as a temp view.

    ``{root}/{name}.parquet`` single files and ``{root}/{name}/`` partitioned
    directories both become views named ``{name}``."""
    names: list[str] = []
    for entry in sorted(os.listdir(root)):
        path = os.path.join(root, entry)
        if entry.endswith(".parquet"):
            name = entry[: -len(".parquet")]
        elif os.path.isdir(path):
            name = entry
        else:
            continue
        try:
            if name == "events":  # TIMESTAMP(NANOS) special case
                from .relational import _fix_nanos

                df = _fix_nanos(spark, root)
            else:
                df = spark.read.parquet(path)
        except Exception:
            continue
        df.createOrReplaceTempView(name)
        names.append(name)
    return names


def sql(query: str, root: str, spark: SparkSession | None = None) -> DataFrame:
    """Run ANSI SQL against the path tables under ``root``.

    Registration is lazy and name-driven: only identifiers that appear in the
    query text are registered (cheap — view registration reads one footer)."""
    from .api import _active_spark

    spark = _active_spark(spark)
    mentioned = set(re.findall(r"[A-Za-z_][A-Za-z0-9_]*", query))
    for entry in sorted(os.listdir(root)):
        name = entry[: -len(".parquet")] if entry.endswith(".parquet") else entry
        if name in mentioned:
            path = os.path.join(root, entry)
            if name == "events":
                from .relational import _fix_nanos

                _fix_nanos(spark, root).createOrReplaceTempView(name)
            elif entry.endswith(".parquet") or os.path.isdir(path):
                spark.read.parquet(path).createOrReplaceTempView(name)
    return spark.sql(query)


# --------------------------------------------------------------------------
# catalog entry: the SQL surface itself, oracle-checked
# --------------------------------------------------------------------------

def q_sql_yearly_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """Demonstrates the spark.sql entry: identical ANSI text runs on both
    engines (modulo nothing — the oracle IS the same statement)."""
    return sql(
        """
        SELECT CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS order_year,
               o_orderstatus,
               COUNT(*)                        AS n_orders,
               ROUND(SUM(o_totalprice), 2)     AS revenue
        FROM orders
        GROUP BY 1, 2
        """,
        sf,
        spark=spark,
    )


Q_SQL_YEARLY_SQL = """
SELECT CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS order_year,
       o_orderstatus,
       COUNT(*)                        AS n_orders,
       ROUND(SUM(o_totalprice), 2)     AS revenue
FROM orders
GROUP BY 1, 2
"""

SQL_QUERIES = {"q_sql_yearly_revenue": q_sql_yearly_revenue}
SQL_ORACLES = {"q_sql_yearly_revenue": Q_SQL_YEARLY_SQL}
