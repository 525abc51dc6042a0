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

from pyspark.sql import DataFrame
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


SKEW_QUERIES = {
    "q_salted_join": q_salted_join,
}

SKEW_ORACLES = {
    "q_salted_join": Q_SALTED_JOIN_SQL,
}
