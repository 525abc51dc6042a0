"""SQL entry point over path-based tables — metastore-less, like everything
else here.

The reference has no SQL front end ("no proper parser & grammar & query
optimiser is used", reference README.md:42); in this engine SQL comes free
from Spark once path tables are registered as temp views. ``sql()`` registers
every ``{root}/{name}.parquet`` file (or partitioned subdirectory) as a view
named ``{name}`` before execution — registration is metadata-only.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def register_path_tables(
    spark: SparkSession, root: str, pin_tz: bool = False
) -> list[str]:
    """Register every parquet table under ``root`` as a temp view.

    ``{root}/{name}.parquet`` single files and ``{root}/{name}/`` partitioned
    directories both become views named ``{name}``. The events special case
    (TIMESTAMP(NANOS)) defaults to ``pin_tz=False``: registering a table must
    not silently change the caller's session timezone; pass ``pin_tz=True``
    for the engine's UTC-pinned catalog semantics."""
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

                df = _fix_nanos(spark, root, pin_tz=pin_tz)
            else:
                df = spark.read.parquet(path)
        except Exception:
            continue
        df.createOrReplaceTempView(name)
        names.append(name)
    return names


#: (spark appId, root) pairs whose tables are already registered this session
_REGISTERED: set[tuple[str, str]] = set()


def sql(query: str, root: str, spark: SparkSession | None = None) -> DataFrame:
    """Run ANSI SQL against the path tables under ``root``.

    All tables under ``root`` are registered — registration is metadata-only
    (one footer read each), and matching identifiers textually is unsound (a
    regex scan registers keywords/aliases and misses quoted identifiers; a
    parser walk is py4j-fragile). Registration is cached per (session, root):
    views persist in the session, so repeat calls skip the footer reads
    (drop a view manually => call register_path_tables yourself)."""
    from .api import _active_spark

    spark = _active_spark(spark)
    cache_key = (spark.sparkContext.applicationId, os.path.abspath(root))
    if cache_key not in _REGISTERED:
        register_path_tables(spark, root)
        _REGISTERED.add(cache_key)
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
