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

from pyspark.sql import Column, DataFrame, SparkSession
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


def hll_distinct(
    df: DataFrame,
    value_col: str,
    p: int = 10,
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """HyperLogLog distinct-count estimate per group (Flajolet et al. 2007):
    (group..., n_distinct_exact, hll_estimate).

    Deterministic + oracle-able by the same construction as
    :func:`kmv_distinct`: the 60-bit md5-derived hash splits into a p-bit
    register index and a (60-p)-bit tail whose leading-zero count is the
    register update, so any SQL engine replays the identical registers.
    Two deliberate exactness choices:

    - the harmonic sum is computed in INTEGER arithmetic — each register
      contributes ``2^(51 - M_j)`` (M_j <= 51, so nonnegative shifts), and
      empty registers ``2^51`` — summing exactly in a BIGINT (max
      2^p * 2^51 < 2^63). A float ``sum(2^-M)`` would round in an
      ORDER-DEPENDENT way, and no two engines sum in the same order. The
      single float division happens once, after the integers agree.
    - small-range correction (linear counting ``m * ln(m/V)`` when
      E <= 2.5m and V empty registers exist) uses one ``ln`` — IEEE-double
      cross-engine agreement to well under the 4dp rounding.

    ``n_distinct_exact`` rides along for free (sum of per-register distinct
    counts), as in :func:`kmv_distinct`. Scale shape: ONE shuffle on
    (group, register) — 2^p rows per group after the combine, register
    maxes merged map-side; this is exactly the mergeability that lets a
    1000-executor scan sketch a 100 TB column."""
    if not 4 <= p <= 16:
        raise ValueError(f"p must be in [4, 16], got {p}")
    m = 1 << p
    w = 60 - p  # tail width; rho in [1, w+1] and w+1 <= 51 for p >= 10
    if w + 1 > 51:
        raise ValueError(f"p={p} leaves a {w}-bit tail; need p >= 10 so 2^(51-rho) fits")
    alpha = 0.7213 / (1 + 1.079 / m)
    numerator = alpha * m * m * float(1 << 51)
    gcols = list(group_cols)
    vals = df.select(*gcols, value_col).distinct()
    h = F.conv(F.substring(F.md5(F.col(value_col).cast("string")), 1, 15), 16, 10).cast(
        "long"
    )
    bucket = F.shiftright(h, w)
    tail = h.bitwiseAND(F.lit((1 << w) - 1))
    rho = F.when(tail == 0, F.lit(w + 1)).otherwise(w + 1 - F.length(F.bin(tail)))
    regs = vals.select(*gcols, bucket.alias("__b"), rho.alias("__rho")).groupBy(
        *gcols, "__b"
    ).agg(F.max("__rho").alias("__M"), F.count(F.lit(1)).alias("__n"))
    agg = (regs.groupBy(*gcols) if gcols else regs.groupBy()).agg(
        F.sum("__n").alias("n_distinct_exact"),
        F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), 51 - __M)")).alias("__s"),
        F.count(F.lit(1)).alias("__nz"),
    )
    sum_scaled = F.col("__s") + (m - F.col("__nz")) * F.lit(1 << 51).cast("long")
    e_raw = F.lit(numerator) / sum_scaled.cast("double")
    v = (m - F.col("__nz")).cast("double")
    est = F.when((e_raw <= 2.5 * m) & (v > 0), m * F.log(m / v)).otherwise(e_raw)
    return agg.select(
        *gcols,
        "n_distinct_exact",
        F.round(est, 4).alias("hll_estimate"),
    )


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


def q_hll_distinct_tokens(spark: SparkSession, sf: str) -> DataFrame:
    """Per-language distinct whitespace-token cardinality: HLL estimate
    (p=10, 1024 registers) next to the exact count — the constant-memory
    mergeable sketch a 100 TB vocabulary audit runs instead of
    COUNT(DISTINCT); complements q_kmv_distinct_shingles (KMV holds k
    hashes, HLL holds 2^p register maxes)."""
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    toks = docs.select(
        "lang", F.explode(F.split(F.col("text"), " ")).alias("token")
    ).where(F.col("token") != "")
    return hll_distinct(toks, "token", p=10, group_cols=["lang"])


#: the Spark plan replayed in SQL: same md5-derived 60-bit hash, same
#: p=10 register split, same EXACT integer harmonic sum (s + empty*2^51),
#: same alpha_m * m^2 * 2^51 numerator (float literal equal by repr), same
#: linear-counting branch. 1125899906842623 = 2^50 - 1 (tail mask),
#: 2251799813685248 = 2^51, 1.7013287633207432e21 = 0.7213/(1+1.079/1024)
#: * 1024^2 * 2^51, 2560 = 2.5 * m.
Q_HLL_SQL = """
WITH toks AS (
  SELECT DISTINCT lang, t AS token
  FROM (SELECT lang, unnest(string_split(text, ' ')) AS t FROM documents)
  WHERE t <> ''
),
hashed AS (
  SELECT lang,
         CAST(('0x' || substr(md5(token), 1, 15))::UBIGINT AS BIGINT) AS h
  FROM toks
),
regs AS (
  SELECT lang, h >> 50 AS b,
         MAX(CASE WHEN (h & 1125899906842623) = 0 THEN 51
                  ELSE 51 - length(bin(h & 1125899906842623)) END) AS m_j,
         COUNT(*) AS n
  FROM hashed GROUP BY lang, h >> 50
),
agg AS (
  SELECT lang, CAST(SUM(n) AS BIGINT) AS n_distinct_exact,
         SUM(CAST(1 AS BIGINT) << (51 - m_j))
           + (1024 - COUNT(*)) * 2251799813685248 AS s,
         CAST(1024 - COUNT(*) AS DOUBLE) AS v
  FROM regs GROUP BY lang
),
est AS (
  SELECT lang, n_distinct_exact, v,
         1.7013287633207432e21 / CAST(s AS DOUBLE) AS e_raw
  FROM agg
)
SELECT lang, n_distinct_exact,
       ROUND(CASE WHEN e_raw <= 2560.0 AND v > 0
                  THEN 1024 * ln(1024.0 / v) ELSE e_raw END, 4) AS hll_estimate
FROM est
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


def cms_cell_expr(row_col: Column, value_col: Column, width: int) -> Column:
    """The count-min cell index for one (hash-row, value) pair: the first
    60 bits of md5("<row>:<value>") mod ``width``. Shared by the sketch
    builder (count_min_cells) and every probe side — if the hash recipe or
    the grid shape ever changes, it changes HERE, in one place, or probes
    would silently join against the wrong cells and the min-estimate
    becomes garbage."""
    return (
        F.conv(
            F.substring(
                F.md5(F.concat(row_col.cast("string"), F.lit(":"),
                               value_col.cast("string"))),
                1, 15,
            ),
            16, 10,
        ).cast("long") % width
    )


def count_min_cells(counts: DataFrame, value_col: str, count_col: str,
                    depth: int = 4, width: int = 512) -> DataFrame:
    """Count-min sketch cells from PRE-AGGREGATED (value, count) rows:
    ``depth`` independent md5-derived hash rows, each value adding its
    count to cell ``H(row, value) % width``. Feeding the sketch from the
    compressed per-value counts instead of raw occurrences is the scale
    lever — the heavy explode happens on the distinct-value frame (and the
    cell table is a fixed depth x width grid regardless of corpus size,
    the whole point of the sketch). Counter sums are associative integers,
    so the grid is deterministic under any partitioning."""
    if depth < 1 or width < 1:
        raise ValueError(f"depth/width must be >= 1, got {depth}x{width}")
    rows = F.explode(F.array(*[F.lit(i) for i in range(depth)])).alias("cms_row")
    cell = cms_cell_expr(F.col("cms_row"), F.col(value_col), width).alias("cms_cell")
    return (
        counts.select(value_col, count_col, rows)
        .select("cms_row", cell, count_col)
        .groupBy("cms_row", "cms_cell")
        .agg(F.sum(count_col).cast("long").alias("cell_count"))
    )


def q_cms_heavy_hitters(spark: SparkSession, sf: str) -> DataFrame:
    """Heavy hitters through a count-min sketch (depth 4 x width 512): the
    top-20 whitespace tokens by exact count next to their CMS estimate
    (min over the 4 hashed cells — always >= exact, the CMS guarantee a
    pytest property pins). The cell grid is 2048 rows whatever the corpus
    size, so the estimate join is a broadcast; exact counts exist here only
    because the entry VERIFIES the sketch — a 100 TB run keeps just the
    grid."""
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    toks = docs.select(F.explode(F.split(F.col("text"), " ")).alias("token")).where(
        F.col("token") != ""
    )
    depth, width = 4, 512
    exact = toks.groupBy("token").agg(F.count(F.lit(1)).alias("exact_n"))
    cells = count_min_cells(exact, "token", "exact_n", depth=depth, width=width)
    # top-20 via orderBy+limit (TakeOrderedAndProject: per-partition heaps
    # merged on the driver) — not a global row_number window, which would
    # sort the whole vocabulary through ONE task. The (exact_n desc, token)
    # sort is total, so limit picks the same deterministic 20 rows.
    top = exact.orderBy(F.desc("exact_n"), F.asc("token")).limit(20)
    probes = top.select(
        "token",
        "exact_n",
        F.explode(F.array(*[F.lit(i) for i in range(depth)])).alias("cms_row"),
    ).withColumn(
        "cms_cell", cms_cell_expr(F.col("cms_row"), F.col("token"), width)
    )
    return (
        probes.join(F.broadcast(cells), ["cms_row", "cms_cell"])
        .groupBy("token", "exact_n")
        .agg(F.min("cell_count").alias("cms_n"))
    )


#: same md5-derived row:value hash, same 4x512 grid, same min-over-rows
#: estimate — integer arithmetic end to end, so the sketch is replayable
#: exactly in SQL.
Q_CMS_HEAVY_HITTERS_SQL = """
WITH toks AS (
  SELECT t AS token
  FROM (SELECT unnest(string_split(text, ' ')) AS t FROM documents)
  WHERE t <> ''
),
exact AS (
  SELECT token, CAST(COUNT(*) AS BIGINT) AS exact_n FROM toks GROUP BY token
),
hashed AS (
  SELECT e.token, e.exact_n, d.i AS cms_row,
         CAST(('0x' || substr(md5(CAST(d.i AS VARCHAR) || ':' || e.token), 1, 15))::UBIGINT AS BIGINT)
           % 512 AS cms_cell
  FROM exact e, unnest([0, 1, 2, 3]) AS d(i)
),
cells AS (
  SELECT cms_row, cms_cell, CAST(SUM(exact_n) AS BIGINT) AS cell_count
  FROM hashed GROUP BY cms_row, cms_cell
),
top AS (
  SELECT token, exact_n,
         ROW_NUMBER() OVER (ORDER BY exact_n DESC, token ASC) AS rn
  FROM exact
)
SELECT t.token, t.exact_n, MIN(c.cell_count) AS cms_n
FROM top t
JOIN hashed h ON h.token = t.token
JOIN cells c ON c.cms_row = h.cms_row AND c.cms_cell = h.cms_cell
WHERE t.rn <= 20
GROUP BY t.token, t.exact_n
"""


SKETCH_QUERIES = {
    "q_kmv_distinct_shingles": q_kmv_distinct_shingles,
    "q_hll_distinct_tokens": q_hll_distinct_tokens,
    "q_sampled_quantiles_prices": q_sampled_quantiles_prices,
    "q_cms_heavy_hitters": q_cms_heavy_hitters,
}

SKETCH_ORACLES = {
    "q_kmv_distinct_shingles": Q_KMV_SQL,
    "q_hll_distinct_tokens": Q_HLL_SQL,
    "q_sampled_quantiles_prices": Q_SAMPLED_QUANTILES_SQL,
    "q_cms_heavy_hitters": Q_CMS_HEAVY_HITTERS_SQL,
}
