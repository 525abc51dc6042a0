"""Deterministic cardinality / quantile sketches.

A 100 TB profiling pass can't afford exact DISTINCT or exact sort-based
quantiles on every question, but seeded-RNG sketches (HLL, t-digest,
reservoir samples) are engine- and partitioning-dependent — no two engines
reproduce them, so they can't sit under a value-level oracle and two runs of
the same pipeline may disagree. Both sketches here derive every decision
from content hashes instead, which makes them:

- **deterministic**: same data + same config => same answer on any cluster
  layout, any engine (md5 agrees byte-for-byte everywhere);
- **mergeable**: the KMV state is "the k smallest hashes" (merge = union +
  re-top-k), the sample state is a hash-threshold predicate (merge =
  union) — the partial-aggregate property that makes sketches work on a
  1000-executor scan;
- **oracle-able**: a SQL engine replays the identical hash arithmetic.

Operators:

- :func:`kmv_distinct` — K-Minimum-Values distinct-count estimate
  (Bar-Yossef et al. 2002): the k-th smallest of the distinct values'
  hashes, mapped to (0,1), estimates n ~ (k-1)/u_k. Exact below k.
- :func:`sampled_quantiles` — DISCRETE quantiles over a deterministic
  hash-fraction sample: composes :func:`~fsql_spark.operators.sampling.
  hash_fraction_sample` (map-only row selection) with the rank-at-
  ceil(q*n) selection of an actual data value — no interpolation
  arithmetic, so no cross-engine float midpoints (same rationale as
  q_price_quantiles, `relational.py`).

No reference counterpart (the reference delegates all row-level compute,
`/root/reference/src/fsql/deser.py:30-31`); driver-mandated extension
surface (SURVEY §2.6).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .sampling import hash_fraction_sample

#: 2^60 — md5's first 15 hex chars as an integer fall in [0, 2^60); dividing
#: by this maps the hash to a uniform fraction in [0, 1). 15 chars (not 16)
#: keeps the integer inside a signed 64-bit long in every engine.
_HASH_SPACE = float(1 << 60)


def kmv_distinct(
    df: DataFrame,
    value_col: str,
    k: int = 128,
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """K-Minimum-Values distinct-count estimate per group:
    (group..., n_distinct_exact, kmv_estimate).

    The estimator: hash every DISTINCT value to a uniform fraction
    u = int(md5[:15], 16) / 2^60; if the k-th smallest hash is u_k, the
    distinct count is ~ (k-1)/u_k (k-1 values landed below u_k, so spacing
    ~ u_k/(k-1)). Groups with fewer than k distinct values report the exact
    count (the sketch holds every value — KMV's standard small-set mode).

    The exact count rides along because this formulation computes it for
    free; a production profiler would keep only the k hashes. Scale shape:
    the distinct collapse is a map-side-combinable aggregate; the GROUPED
    per-group rank is a window parallel across groups, touching only
    DISTINCT values (vocabulary-sized, not corpus-sized). The UNGROUPED
    form avoids a single-partition window entirely: the k-th hash comes
    from ``orderBy(hash).limit(k)`` — Spark's TakeOrdered, a per-partition
    partial top-k merged on the driver (k rows, not the corpus)."""
    gcols = list(group_cols)
    vals = df.select(*gcols, value_col).distinct()
    h = F.md5(F.col(value_col).cast("string"))
    u = F.conv(F.substring(h, 1, 15), 16, 10).cast("long")
    est_of = lambda cnt, uk: F.when(  # noqa: E731
        uk.isNull(), cnt.cast("double")
    ).otherwise((k - 1) * _HASH_SPACE / uk)
    if not gcols:
        cnt = vals.agg(F.count(F.lit(1)).alias("n_distinct_exact"))
        topk = vals.orderBy(h.asc(), F.col(value_col).asc()).limit(k).select(u.alias("__u"))
        kth = topk.agg(
            F.when(F.count(F.lit(1)) == k, F.max("__u")).alias("__uk")
        )
        agg = cnt.crossJoin(kth)  # two 1-row frames
        return agg.select(
            "n_distinct_exact",
            F.round(est_of(F.col("n_distinct_exact"), F.col("__uk")), 4).alias("kmv_estimate"),
        )
    w = Window.partitionBy(*gcols).orderBy(h.asc(), F.col(value_col).asc())
    ranked = vals.withColumn("__rn", F.row_number().over(w)).withColumn("__u", u)
    agg = ranked.groupBy(*gcols).agg(
        F.count(F.lit(1)).alias("n_distinct_exact"),
        F.max(F.when(F.col("__rn") == k, F.col("__u"))).alias("__uk"),
    )
    return agg.select(
        *gcols,
        "n_distinct_exact",
        F.round(est_of(F.col("n_distinct_exact"), F.col("__uk")), 4).alias("kmv_estimate"),
    )


def sampled_quantiles(
    df: DataFrame,
    value_col: str,
    key_col: str,
    fraction: float,
    quantiles: Sequence[float] = (0.5, 0.9),
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """Discrete quantiles of ``value_col`` over a deterministic
    ``fraction`` hash-sample: (group..., n_sampled, q50_value, ...).

    Selection is the value at rank ceil(q * n) of the SAMPLE — an actual
    data value, no interpolation. The sample is the map-only
    hash-threshold predicate, so at 100 TB the sort ranks ~fraction of the
    data and the whole estimate is reproducible run-over-run (and in the
    SQL oracle) — the property df.sample + approx_percentile can't give.

    With ``group_cols`` the rank windows run parallel across groups — the
    scale form. An EMPTY ``group_cols`` is one global ordered window
    (single-task sort over the sample): acceptable only while
    fraction x |df| stays executor-sized — same documented caveat as
    ``pack_shards``; pass a stratum column at scale."""
    gcols = list(group_cols)
    sampled = hash_fraction_sample(df, key_col, fraction=fraction)
    w = Window.partitionBy(*gcols).orderBy(F.col(value_col).asc(), F.col(key_col).asc())
    ranked = sampled.withColumn("__rn", F.row_number().over(w)).withColumn(
        "__n", F.count(F.lit(1)).over(Window.partitionBy(*gcols) if gcols else Window.partitionBy())
    )
    aggs = [F.max("__n").alias("n_sampled")]
    for q in quantiles:
        at = F.max(
            F.when(
                F.col("__rn") == F.ceil(F.lit(q) * F.col("__n")).cast("int"),
                F.col(value_col),
            )
        )
        # round() the LABEL percent: int() truncates under binary float
        # (int(0.29 * 100) == 28)
        aggs.append(F.round(at, 4).alias(f"q{round(q * 100)}_{value_col}"))
    return (ranked.groupBy(*gcols) if gcols else ranked.groupBy()).agg(*aggs)


# --------------------------------------------------------------------------
# catalog entries + oracles
# --------------------------------------------------------------------------

def q_kmv_distinct_shingles(spark: SparkSession, sf: str) -> DataFrame:
    """Per-language distinct 3-gram-shingle cardinality: KMV estimate (k=128)
    next to the exact count — the profiling sketch a 100 TB corpus audit
    runs instead of COUNT(DISTINCT) over trillions of shingles."""
    from .dedup import _word_shingles

    docs = spark.read.parquet(f"{sf}/documents.parquet")
    sh = docs.select("lang", F.explode(_word_shingles(F.col("text"), 3)).alias("shingle"))
    return kmv_distinct(sh, "shingle", k=128, group_cols=["lang"])


Q_KMV_SQL = """
WITH sh AS (
  SELECT DISTINCT lang, w AS shingle
  FROM (
    SELECT lang, unnest(list_distinct(
      [array_to_string(ws[i:i+2], chr(1)) for i in range(1, len(ws) - 1)])) AS w
    FROM (SELECT lang, string_split(text, ' ') AS ws FROM documents)
    WHERE len(ws) >= 3
  )
),
ranked AS (
  SELECT lang,
         ROW_NUMBER() OVER (PARTITION BY lang ORDER BY md5(shingle), shingle) AS rn,
         CAST(('0x' || substr(md5(shingle), 1, 15))::UBIGINT AS BIGINT) AS u
  FROM sh
),
agg AS (
  SELECT lang, COUNT(*) AS n_distinct_exact,
         MAX(CASE WHEN rn = 128 THEN u END) AS uk
  FROM ranked GROUP BY lang
)
SELECT lang, n_distinct_exact,
       ROUND(CASE WHEN uk IS NULL THEN CAST(n_distinct_exact AS DOUBLE)
                  ELSE 127 * 1152921504606846976.0 / uk END, 4) AS kmv_estimate
FROM agg
"""


def q_sampled_quantiles_prices(spark: SparkSession, sf: str) -> DataFrame:
    """Median/p90 order price per priority from a deterministic 20%
    hash-sample — the scan-bound profiling estimate (the exact counterpart
    is q_price_quantiles)."""
    orders = spark.read.parquet(f"{sf}/orders.parquet")
    return sampled_quantiles(
        orders,
        "o_totalprice",
        "o_orderkey",
        fraction=0.2,
        quantiles=(0.5, 0.9),
        group_cols=["o_orderpriority"],
    )


Q_SAMPLED_QUANTILES_SQL = """
WITH sampled AS (
  SELECT o_orderpriority, o_totalprice, o_orderkey
  FROM orders
  WHERE substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 8) < '33333333'
),
ranked AS (
  SELECT o_orderpriority, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                            ORDER BY o_totalprice, o_orderkey) AS rn,
         COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
  FROM sampled
)
SELECT o_orderpriority,
       MAX(n)                                                              AS n_sampled,
       ROUND(MAX(CASE WHEN rn = CAST(CEIL(0.5 * n) AS INTEGER) THEN o_totalprice END), 4) AS q50_o_totalprice,
       ROUND(MAX(CASE WHEN rn = CAST(CEIL(0.9 * n) AS INTEGER) THEN o_totalprice END), 4) AS q90_o_totalprice
FROM ranked
GROUP BY o_orderpriority
"""


SKETCH_QUERIES = {
    "q_kmv_distinct_shingles": q_kmv_distinct_shingles,
    "q_sampled_quantiles_prices": q_sampled_quantiles_prices,
}

SKETCH_ORACLES = {
    "q_kmv_distinct_shingles": Q_KMV_SQL,
    "q_sampled_quantiles_prices": Q_SAMPLED_QUANTILES_SQL,
}
