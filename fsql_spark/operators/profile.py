"""Data profiling operators: per-column stats and histograms.

Training-data pipelines run these continuously (schema drift, null surges,
cardinality checks before joins). Shapes:

- :func:`profile`: ONE pass over the table computing count/nulls/distinct per
  column (all aggregates in a single job — not one job per column); distinct
  counts are exact here, switch to ``approx_count_distinct`` at 100 TB via
  ``exact=False``.
- :func:`histogram`: equi-width bucket counts — floor arithmetic only, so the
  result is integer-exact and engine-independent (oracle-able).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def profile(df: DataFrame, columns: list[str] | None = None, exact: bool = True) -> DataFrame:
    """Long-format per-column profile: (column, n_rows, n_nulls, n_distinct).

    Single aggregation job: all columns' aggregates are computed together,
    then unpivoted — one scan regardless of column count."""
    cols = columns or df.columns
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs.append(F.count(F.when(F.col(c).isNull(), 1)).alias(f"__nulls_{c}"))
        distinct = F.countDistinct(F.col(c)) if exact else F.approx_count_distinct(F.col(c))
        aggs.append(distinct.alias(f"__dist_{c}"))
    row = df.agg(*aggs)
    spark = df.sparkSession
    stacked = None
    for c in cols:
        piece = row.select(
            F.lit(c).alias("column"),
            F.col("__n").alias("n_rows"),
            F.col(f"__nulls_{c}").alias("n_nulls"),
            F.col(f"__dist_{c}").alias("n_distinct"),
        )
        stacked = piece if stacked is None else stacked.unionByName(piece)
    return stacked if stacked is not None else spark.createDataFrame([], "column string")


def histogram(
    df: DataFrame, col: str, lo: float, hi: float, n_buckets: int = 10
) -> DataFrame:
    """Equi-width histogram over [lo, hi): (bucket, bucket_lo, n). Values
    outside the range are clamped into the edge buckets (no silent drops)."""
    # fail at plan-build time, not as a DIVIDE_BY_ZERO on an executor
    # mid-job (ANSI mode) after the scan already ran
    if not hi > lo:
        raise ValueError(f"histogram range is empty: lo={lo}, hi={hi}")
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    width = (hi - lo) / n_buckets
    raw = F.floor((F.col(col) - F.lit(lo)) / F.lit(width)).cast("int")
    bucket = F.least(F.greatest(raw, F.lit(0)), F.lit(n_buckets - 1))
    return (
        df.groupBy(bucket.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("bucket_lo", F.round(F.lit(lo) + F.col("bucket") * F.lit(width), 4))
        .select("bucket", "bucket_lo", "n")
    )


# --------------------------------------------------------------------------
# catalog entries + oracles
# --------------------------------------------------------------------------

def q_profile_orders(spark: SparkSession, sf: str) -> DataFrame:
    orders = spark.read.parquet(f"{sf}/orders.parquet")
    return profile(orders, ["o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority"])


Q_PROFILE_SQL = """
SELECT 'o_orderkey' AS column, COUNT(*) AS n_rows,
       COUNT(CASE WHEN o_orderkey IS NULL THEN 1 END) AS n_nulls,
       COUNT(DISTINCT o_orderkey) AS n_distinct FROM orders
UNION ALL
SELECT 'o_custkey', COUNT(*),
       COUNT(CASE WHEN o_custkey IS NULL THEN 1 END),
       COUNT(DISTINCT o_custkey) FROM orders
UNION ALL
SELECT 'o_orderstatus', COUNT(*),
       COUNT(CASE WHEN o_orderstatus IS NULL THEN 1 END),
       COUNT(DISTINCT o_orderstatus) FROM orders
UNION ALL
SELECT 'o_orderpriority', COUNT(*),
       COUNT(CASE WHEN o_orderpriority IS NULL THEN 1 END),
       COUNT(DISTINCT o_orderpriority) FROM orders
"""


def q_histogram_prices(spark: SparkSession, sf: str) -> DataFrame:
    orders = spark.read.parquet(f"{sf}/orders.parquet")
    return histogram(orders, "o_totalprice", lo=0.0, hi=500000.0, n_buckets=20)


Q_HISTOGRAM_SQL = """
SELECT bucket,
       ROUND(0.0 + bucket * 25000.0, 4) AS bucket_lo,
       COUNT(*) AS n
FROM (
  SELECT LEAST(GREATEST(CAST(FLOOR((o_totalprice - 0.0) / 25000.0) AS INTEGER), 0), 19) AS bucket
  FROM orders
)
GROUP BY bucket
"""

PROFILE_QUERIES = {
    "q_profile_orders": q_profile_orders,
    "q_histogram_prices": q_histogram_prices,
}

PROFILE_ORACLES = {
    "q_profile_orders": Q_PROFILE_SQL,
    "q_histogram_prices": Q_HISTOGRAM_SQL,
}
