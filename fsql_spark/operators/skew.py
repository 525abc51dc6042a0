"""Skew mitigation: salted joins.

AQE's skew-join splitting (`spark.sql.adaptive.skewJoin.enabled`, on in the
session defaults) handles most skew transparently; explicit salting remains
the tool when one join key dominates so heavily that even split partitions
overwhelm a task (the classic null-key / celebrity-key problem at 100 TB).

``salted_join`` spreads each key of the skewed (large) side over ``n_salts``
sub-keys and replicates the small side once per salt: the shuffle for a hot
key fans out over ``n_salts`` tasks instead of one.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    on: list[str],
    n_salts: int = 16,
    how: str = "inner",
    salt_source: Optional[str] = None,
) -> DataFrame:
    """Join a skewed large side to a small side on ``on`` with key salting.

    The salt must vary WITHIN a key: it is derived by hashing ``salt_source``
    (any high-cardinality column, e.g. the fact's primary key) when given —
    deterministic across runs — else from a per-row id (stable within one
    execution). The small side is replicated ``n_salts`` times (cost:
    |small| * n_salts shuffle rows — keep small small).
    """
    if salt_source is not None:
        salt = F.pmod(F.xxhash64(F.col(salt_source)), F.lit(n_salts))
    else:
        salt = F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(n_salts))
    left = skewed.withColumn("__salt", salt.cast("int"))
    right = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    out = left.join(right, on + ["__salt"], how)
    return out.drop("__salt")


# --------------------------------------------------------------------------
# catalog entry + oracle
# --------------------------------------------------------------------------

def q_salted_join(spark, sf: str):
    """Salted fact-to-dim join, oracle-checked for RESULT INVARIANCE: the
    salt must not change what the join computes, only how its shuffle fans
    out (each hot l_suppkey spreads over 16 sub-keys; the dim replicates 16x
    — |supplier| * 16 rows, still dim-sized). The oracle is the PLAIN join,
    so a hash match proves salting is semantically free."""
    li = spark.read.parquet(f"{sf}/lineitem.parquet")
    supp = spark.read.parquet(f"{sf}/supplier.parquet").select(
        F.col("s_suppkey").alias("l_suppkey"), "s_nationkey"
    )
    joined = salted_join(li, supp, on=["l_suppkey"], n_salts=16, salt_source="l_orderkey")
    return joined.groupBy("s_nationkey").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
    )


Q_SALTED_JOIN_SQL = """
SELECT s_nationkey,
       COUNT(*) AS n_items,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
GROUP BY s_nationkey
"""


def key_skew_report(
    df: DataFrame, key_col: str, top_k: int = 20
) -> DataFrame:
    """Join-key skew diagnostics -> one row per heavy key: count, its
    multiple of the mean key load, and the running share of all rows the
    top keys absorb — the report that decides WHETHER a join needs
    :func:`salted_join` (a key at 1000x mean will overwhelm even AQE's
    split partitions) and how many salts.

    One map-side-combinable count per key, scalar totals from one action,
    top-k via TakeOrderedAndProject, the cumulative share over just the
    k-row result. Ratios are single divisions of exact BIGINTs."""
    from pyspark.sql.window import Window

    counts = df.groupBy(key_col).agg(F.count(F.lit(1)).alias("n_rows"))
    tot = counts.agg(
        F.sum("n_rows").alias("t"), F.count(F.lit(1)).alias("k")
    ).collect()[0]
    total, n_keys = int(tot["t"] or 0), int(tot["k"] or 1)
    top = (
        counts.orderBy(F.desc("n_rows"), key_col)
        .limit(top_k)
        .withColumn("rnk", F.row_number().over(
            Window.orderBy(F.desc("n_rows"), key_col)
        ))
    )
    w_cum = Window.orderBy(F.desc("n_rows"), key_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return top.select(
        "rnk",
        F.col(key_col).alias("key"),
        "n_rows",
        F.round(F.col("n_rows") * F.lit(float(n_keys)) / F.lit(float(total)), 4).alias("x_mean"),
        F.round(F.sum("n_rows").over(w_cum) / F.lit(float(total)), 4).alias("cum_share"),
    )


def q_lineitem_key_skew(spark: SparkSession, sf: str) -> DataFrame:
    """Skew report for lineitem's order-key join load: the 20 heaviest
    orderkeys, their multiple of the mean, and the share of the fact table
    the top keys absorb — the pre-join salting decision input.

    The k-row windowed summary is the ONLY unpartitioned window here and
    it runs over the already-limited top-k rows (TakeOrderedAndProject
    feeds it), not the key universe."""
    li = spark.read.parquet(f"{sf}/lineitem.parquet").select("l_orderkey")
    return key_skew_report(li, "l_orderkey", top_k=20).orderBy("rnk")


Q_LINEITEM_SKEW_SQL = """
WITH counts AS (
  SELECT l_orderkey AS key, CAST(COUNT(*) AS BIGINT) AS n_rows
  FROM lineitem GROUP BY l_orderkey
),
tot AS (SELECT CAST(SUM(n_rows) AS DOUBLE) AS t, CAST(COUNT(*) AS DOUBLE) AS k FROM counts),
top AS (
  SELECT key, n_rows,
         ROW_NUMBER() OVER (ORDER BY n_rows DESC, key) AS rnk
  FROM counts ORDER BY n_rows DESC, key LIMIT 20
)
SELECT rnk, key, n_rows,
       ROUND(n_rows * (SELECT k FROM tot) / (SELECT t FROM tot), 4) AS x_mean,
       ROUND(SUM(n_rows) OVER (ORDER BY n_rows DESC, key
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             / (SELECT t FROM tot), 4) AS cum_share
FROM top
ORDER BY rnk
"""


SKEW_QUERIES = {
    "q_salted_join": q_salted_join,
    "q_lineitem_key_skew": q_lineitem_key_skew,
}

SKEW_ORACLES = {
    "q_salted_join": Q_SALTED_JOIN_SQL,
    "q_lineitem_key_skew": Q_LINEITEM_SKEW_SQL,
}
