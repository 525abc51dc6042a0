"""Temporal joins Spark lacks natively: as-of join and banded range join.

**As-of join** (each left row matched to the latest right row at-or-before its
timestamp, per key): implemented with the union+ordered-window technique — tag
both sides, sort within key by (time, side), carry right-side values forward
with ``last(ignorenulls)``, keep left rows. ONE shuffle + sort, no point
lookups, no skew beyond the key distribution: the standard scalable
formulation (same shape Flint/pandas merge_asof use).

**Range join** (pairs within a time tolerance, per key): the naive theta join
is quadratic per key; the banded formulation buckets time into
tolerance-width bins and joins only adjacent bins — candidates shrink from
O(n^2) to O(n * density), then the exact |dt| <= tolerance filter applies.

Both have exact DuckDB oracles (ASOF JOIN is native there; range join is a
plain non-equi join at oracle scale).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..session import shuffle_width


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    right_value_cols: list[str],
    suffix: str = "_right",
    tolerance_us: Optional[int] = None,
) -> DataFrame:
    """Backward as-of join: latest right row with ``right_ts <= left_ts`` per
    ``on`` key. Inner semantics (unmatched left rows dropped); optional
    tolerance bounds the lookback."""
    carried = [right_ts] + right_value_cols
    l_tag = left.withColumn("__side", F.lit(1)).withColumn("__t", F.col(left_ts))
    r_tag = (
        right.select(*on, *carried)
        .withColumnRenamed(right_ts, right_ts + suffix)
        .withColumns({c + suffix: F.col(c) for c in right_value_cols})
        .drop(*right_value_cols)
        .withColumn("__side", F.lit(0))
        .withColumn("__t", F.col(right_ts + suffix))
    )
    unioned = l_tag.unionByName(r_tag, allowMissingColumns=True)
    # right rows (side=0) sort before left rows at equal time => inclusive <=
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("__t").asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried_out = [right_ts + suffix] + [c + suffix for c in right_value_cols]
    filled = unioned.withColumns(
        {c: F.last(c, ignorenulls=True).over(w) for c in carried_out}
    )
    out = filled.where(F.col("__side") == 1).drop("__side", "__t")
    out = out.where(F.col(right_ts + suffix).isNotNull())
    if tolerance_us is not None:
        gap = F.unix_micros(F.col(left_ts)) - F.unix_micros(F.col(right_ts + suffix))
        out = out.where(gap <= tolerance_us)
    return out


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    tolerance_us: int,
    suffix: str = "_right",
) -> DataFrame:
    """All (left, right) pairs with |left_ts - right_ts| <= tolerance per key.

    Banded: join on (key, time_bucket) for the three adjacent
    tolerance-width buckets, then exact filter.

    EVERY right column is prefixed internally (and restored afterwards, with
    ``suffix`` appended on a name collision with the left side), so passing
    the same DataFrame — or two frames sharing column names, including
    ``left_ts == right_ts`` — resolves unambiguously instead of failing with
    AMBIGUOUS_REFERENCE (found by the degenerate-input audit: burst
    detection over ONE stream is the self-join case)."""
    if not tolerance_us > 0:
        raise ValueError(f"tolerance_us must be > 0, got {tolerance_us}")
    rb = right.select([F.col(c).alias(f"__r_{c}") for c in right.columns])
    lb = left.withColumn("__lb", (F.unix_micros(F.col(left_ts)) / tolerance_us).cast("long"))
    rb = rb.withColumn(
        "__rb", (F.unix_micros(F.col(f"__r_{right_ts}")) / tolerance_us).cast("long")
    )
    rb = rb.withColumn("__rb_adj", F.explode(F.array(F.col("__rb") - 1, F.col("__rb"), F.col("__rb") + 1)))
    cond = [lb[k] == rb[f"__r_{k}"] for k in on] + [lb["__lb"] == rb["__rb_adj"]]
    joined = lb.join(rb, cond)
    gap = F.abs(F.unix_micros(F.col(left_ts)) - F.unix_micros(F.col(f"__r_{right_ts}")))
    out = joined.where(gap <= tolerance_us).drop(
        "__lb", "__rb", "__rb_adj", *[f"__r_{k}" for k in on]
    )
    left_cols = set(left.columns)
    taken = set(left.columns)
    for c in right.columns:
        if c in on:
            continue
        target = c if c not in left_cols else c + suffix
        if target in taken:
            # e.g. left already has 'v_right', or right carries both 'v' and
            # 'v_right' — a silent duplicate column would reintroduce the
            # AMBIGUOUS_REFERENCE downstream (review find): refuse loudly
            raise ValueError(
                f"range_join output name collision on {target!r}; rename the "
                f"conflicting column or pass a different suffix"
            )
        taken.add(target)
        out = out.withColumnRenamed(f"__r_{c}", target)
    return out


def resample_ffill(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    order_col: str,
    value_cols: list[str],
    every_seconds: int,
) -> DataFrame:
    """Per-key fixed-interval resampling with forward fill — the time-series
    regularization every monitoring/feature pipeline needs: one row per
    ``every_seconds`` bin from each key's first to last event, carrying the
    key's LAST observed values across gaps.

    All arithmetic is integer (``us - us % every``) and per-bin values are
    SELECTED (latest row by (ts, order_col)), never averaged — no float
    summation, so the result is bit-identical across engines and layouts.

    Scale shape: the per-bin latest-row pick and the gap-filling window both
    shuffle once on the key; the dense grid is generated per key from a
    2-column span aggregate (``sequence`` explode — rows ~ keys x bins, the
    OUTPUT size, never a cross join). Output: (key, bin_start_us, values...)
    with ``bin_start_us`` the bin's epoch-microseconds start."""
    # fail at plan-build time, not as a REMAINDER_BY_ZERO on an executor;
    # validate the INT value (0 < every_seconds < 1 would pass a raw >0
    # check and then truncate to a zero modulus — review find)
    if int(every_seconds) != every_seconds or int(every_seconds) <= 0:
        raise ValueError(f"every_seconds must be a positive integer, got {every_seconds}")
    from .dedup import _spread

    every_us = int(every_seconds) * 1_000_000
    us = F.unix_micros(F.col(ts_col))
    bs = (us - F.pmod(us, F.lit(every_us))).alias("__bs")
    # _spread: a single-file input scans as ONE task, and the per-bin
    # pick's partial sort then runs on it (measured: minutes at the sf10
    # perf corpus); no-op on real many-file inputs
    binned = _spread(df).withColumn("__bs", bs)
    w_pick = Window.partitionBy(key_col, "__bs").orderBy(
        F.col(ts_col).desc(), F.col(order_col).desc()
    )
    per_bin = (
        binned.withColumn("__rn", F.row_number().over(w_pick))
        .where(F.col("__rn") == 1)
        .select(key_col, "__bs", *value_cols)
    )
    spans = binned.groupBy(key_col).agg(
        F.min("__bs").alias("__lo"), F.max("__bs").alias("__hi")
    )
    # the spans table is keys-sized, so AQE coalesces it to ~1 partition —
    # which would then make ONE task generate the whole keys x bins grid
    # (measured: the single-task explode dominated the decade spot-bench);
    # spread the tiny table first so grid generation parallelizes. The
    # width must be EXPLICIT: a column-only repartition is itself
    # AQE-coalesced right back to one partition (measured, second round
    # of the same spot-bench)
    width = shuffle_width(df.sparkSession)
    grid = spans.repartition(width, key_col).select(
        key_col,
        F.explode(F.sequence("__lo", "__hi", F.lit(every_us))).alias("__bs"),
    )
    # per_bin is corpus-BIN-sized; Catalyst's selectivity estimate for the
    # row_number()==1 filter makes it look broadcastable and the driver
    # then builds a tens-of-millions-row hashed relation single-threaded
    # (measured: the sf10 spot ground in a one-task stage) — pin the join
    joined = grid.join(per_bin.hint("shuffle_hash"), [key_col, "__bs"], "left")
    w_fill = Window.partitionBy(key_col).orderBy("__bs")
    return joined.select(
        key_col,
        F.col("__bs").alias("bin_start_us"),
        *[
            F.last(v, ignorenulls=True).over(w_fill).alias(v)
            for v in value_cols
        ],
    )


def resample_interpolate(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    order_col: str,
    value_col: str,
    every_seconds: int,
) -> DataFrame:
    """Per-key fixed-interval resampling with LINEAR interpolation — the
    other half of time-series regularization (:func:`resample_ffill` carries
    the last observation forward; this draws the straight line between the
    surrounding observations, the right gap-fill for continuously-varying
    signals such as sensor readings or prices).

    Per bin the anchor value is SELECTED (latest row by (ts, order_col)),
    then each empty bin gets ``prev + (next - prev) * (bin - prev_bin) /
    (next_bin - prev_bin)`` — a fixed per-row float expression with one
    evaluation order, so the result is reproducible across engines (the SQL
    oracle spells the identical expression). Bins before the first / after
    the last observation take the nearest anchor (no extrapolation).

    Scale shape: identical to resample_ffill — one shuffle on the key for
    the per-bin pick, one ordered window pass per direction for the anchor
    carry; the grid is keys x bins (output-sized), generated per key from a
    2-column span aggregate."""
    if int(every_seconds) != every_seconds or int(every_seconds) <= 0:
        raise ValueError(f"every_seconds must be a positive integer, got {every_seconds}")
    from .dedup import _spread

    every_us = int(every_seconds) * 1_000_000
    us = F.unix_micros(F.col(ts_col))
    # _spread: see resample_ffill — single-file inputs otherwise feed the
    # per-bin pick's partial sort from a one-task scan
    binned = _spread(df).withColumn("__bs", us - F.pmod(us, F.lit(every_us)))
    w_pick = Window.partitionBy(key_col, "__bs").orderBy(
        F.col(ts_col).desc(), F.col(order_col).desc()
    )
    per_bin = (
        binned.withColumn("__rn", F.row_number().over(w_pick))
        .where(F.col("__rn") == 1)
        .select(key_col, "__bs", F.col(value_col).alias("__obs"))
    )
    spans = binned.groupBy(key_col).agg(
        F.min("__bs").alias("__lo"), F.max("__bs").alias("__hi")
    )
    # spread the keys-sized spans table before exploding at an EXPLICIT
    # width (see resample_ffill: column-only repartition gets AQE-coalesced
    # straight back to one partition)
    width = shuffle_width(df.sparkSession)
    grid = spans.repartition(width, key_col).select(
        key_col,
        F.explode(F.sequence("__lo", "__hi", F.lit(every_us))).alias("__bs"),
    )
    # shuffle_hash: see resample_ffill — per_bin looks broadcastable to the
    # static estimator but is corpus-bin-sized
    joined = grid.join(per_bin.hint("shuffle_hash"), [key_col, "__bs"], "left")
    # BOTH anchor carries run as cumulative unbounded-PRECEDING frames
    # (incremental, O(rows)): the forward anchor uses a DESC ordering
    # instead of an unbounded-FOLLOWING frame, because Spark evaluates
    # following-frames with ignoreNulls by re-scanning the frame per row —
    # quadratic per key (measured: 232 s -> the rewrite's time at sf1 for
    # the identical result)
    w_back = (
        Window.partitionBy(key_col)
        .orderBy("__bs")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_fwd = (
        Window.partitionBy(key_col)
        .orderBy(F.desc("__bs"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    obs_bs = F.when(F.col("__obs").isNotNull(), F.col("__bs"))
    prev_v = F.last("__obs", ignorenulls=True).over(w_back)
    prev_b = F.last(obs_bs, ignorenulls=True).over(w_back)
    nxt_v = F.last("__obs", ignorenulls=True).over(w_fwd)
    nxt_b = F.last(obs_bs, ignorenulls=True).over(w_fwd)
    interp = (
        F.when(F.col("__obs").isNotNull(), F.col("__obs"))
        .when(prev_v.isNull(), nxt_v)
        .when(nxt_v.isNull(), prev_v)
        .otherwise(
            prev_v
            + ((nxt_v - prev_v) * (F.col("__bs") - prev_b)) / (nxt_b - prev_b)
        )
    )
    return joined.select(
        key_col,
        F.col("__bs").alias("bin_start_us"),
        interp.alias(value_col),
    )


# --------------------------------------------------------------------------
# catalog entries + oracles (events table: clicks vs purchases)
# --------------------------------------------------------------------------

def q_asof_click_purchase(spark: SparkSession, sf: str) -> DataFrame:
    """For every click, the user's most recent purchase at-or-before it."""
    from ..relational import _t

    ev = _t(spark, sf, "events")
    clicks = ev.where(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id", "value"
    ).withColumnRenamed("event_id", "purchase_event")
    out = asof_join(
        clicks,
        purchases,
        on=["user_id"],
        left_ts="ts",
        right_ts="ts",
        right_value_cols=["purchase_event", "value"],
    )
    return out.select(
        F.col("event_id").alias("click_id"),
        "user_id",
        F.col("purchase_event_right").alias("purchase_id"),
        F.round("value_right", 2).alias("purchase_value"),
    )


Q_ASOF_SQL = """
SELECT l.event_id            AS click_id,
       l.user_id             AS user_id,
       r.event_id            AS purchase_id,
       ROUND(r.value, 2)     AS purchase_value
FROM (SELECT * FROM events WHERE event_type = 'click') l
ASOF JOIN (SELECT * FROM events WHERE event_type = 'purchase') r
  ON l.user_id = r.user_id AND l.ts >= r.ts
"""


def q_range_join_bursts(spark: SparkSession, sf: str) -> DataFrame:
    """Pairs of distinct events by the same user within 60 seconds — burst
    detection shape. Output: ordered id pairs + gap in ms."""
    from ..relational import _t

    ev = _t(spark, sf, "events").select("event_id", "user_id", "ts")
    other = ev.select(
        F.col("event_id").alias("event_b"), F.col("user_id"), F.col("ts").alias("ts_b")
    )
    out = range_join(ev, other, ["user_id"], "ts", "ts_b", 60_000_000)
    # strict id ordering: each unordered pair exactly once
    out = out.where(F.col("event_id") < F.col("event_b"))
    gap_ms = (F.abs(F.unix_micros(F.col("ts")) - F.unix_micros(F.col("ts_b"))) / 1000).cast("long")
    return out.select("user_id", F.col("event_id").alias("event_a"), "event_b", gap_ms.alias("gap_ms"))


Q_RANGE_JOIN_SQL = """
SELECT a.user_id AS user_id,
       a.event_id AS event_a,
       b.event_id AS event_b,
       CAST(abs(epoch_us(a.ts) - epoch_us(b.ts)) // 1000 AS BIGINT) AS gap_ms
FROM events a
JOIN events b
  ON a.user_id = b.user_id
 AND a.event_id < b.event_id
 AND abs(epoch_us(a.ts) - epoch_us(b.ts)) <= 60 * 1000000
"""

def q_events_resample(spark: SparkSession, sf: str) -> DataFrame:
    """Hourly resampled per-user value series with forward fill (users < 20
    bound the grid): the regularized time series a feature store derives
    from raw events."""
    from ..relational import _t

    ev = _t(spark, sf, "events").where(F.col("user_id") < 20)
    out = resample_ffill(
        ev, "user_id", "ts", "event_id", ["value"], every_seconds=3600
    )
    return out.select("user_id", "bin_start_us", F.round("value", 2).alias("value"))


Q_EVENTS_RESAMPLE_SQL = """
WITH e AS (
  SELECT user_id, epoch_us(ts) AS us, event_id, value
  FROM events WHERE user_id < 20
),
b AS (SELECT *, us - (us % 3600000000) AS bs FROM e),
picked AS (
  SELECT user_id, bs, value FROM (
    SELECT user_id, bs, value,
           ROW_NUMBER() OVER (PARTITION BY user_id, bs ORDER BY us DESC, event_id DESC) AS rn
    FROM b) WHERE rn = 1
),
spans AS (SELECT user_id, MIN(bs) AS lo, MAX(bs) AS hi FROM b GROUP BY user_id),
grid AS (
  SELECT user_id, unnest(generate_series(lo, hi, 3600000000)) AS bs FROM spans
)
SELECT g.user_id,
       g.bs AS bin_start_us,
       ROUND(LAST_VALUE(p.value IGNORE NULLS) OVER (
         PARTITION BY g.user_id ORDER BY g.bs
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS value
FROM grid g LEFT JOIN picked p ON g.user_id = p.user_id AND g.bs = p.bs
"""


def q_events_interpolate(spark: SparkSession, sf: str) -> DataFrame:
    """Hourly per-user value series with LINEAR interpolation across gaps
    (users < 20 bound the grid) — the continuously-varying-signal twin of
    q_events_resample's forward fill. Interpolated values are emitted RAW:
    the formula is a fixed per-row float expression (no summation), so both
    engines produce bit-identical doubles — whereas ROUND would DIVERGE
    here, because interpolating 2dp inputs at power-of-two gap fractions
    lands exactly on decimal half-way points where the engines' double
    rounding disagrees (measured: 23.79875 -> 23.7988 vs 23.7987)."""
    from ..relational import _t

    ev = _t(spark, sf, "events").where(F.col("user_id") < 20)
    out = resample_interpolate(
        ev, "user_id", "ts", "event_id", "value", every_seconds=3600
    )
    return out.select("user_id", "bin_start_us", "value")


Q_EVENTS_INTERPOLATE_SQL = """
WITH e AS (
  SELECT user_id, epoch_us(ts) AS us, event_id, value
  FROM events WHERE user_id < 20
),
b AS (SELECT *, us - (us % 3600000000) AS bs FROM e),
picked AS (
  SELECT user_id, bs, value AS obs FROM (
    SELECT user_id, bs, value,
           ROW_NUMBER() OVER (PARTITION BY user_id, bs ORDER BY us DESC, event_id DESC) AS rn
    FROM b) WHERE rn = 1
),
spans AS (SELECT user_id, MIN(bs) AS lo, MAX(bs) AS hi FROM b GROUP BY user_id),
grid AS (
  SELECT user_id, unnest(generate_series(lo, hi, 3600000000)) AS bs FROM spans
),
anchored AS (
  SELECT g.user_id, g.bs, p.obs,
         LAST_VALUE(p.obs IGNORE NULLS) OVER (
           PARTITION BY g.user_id ORDER BY g.bs
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_v,
         LAST_VALUE(CASE WHEN p.obs IS NOT NULL THEN g.bs END IGNORE NULLS) OVER (
           PARTITION BY g.user_id ORDER BY g.bs
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_b,
         FIRST_VALUE(p.obs IGNORE NULLS) OVER (
           PARTITION BY g.user_id ORDER BY g.bs
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nxt_v,
         FIRST_VALUE(CASE WHEN p.obs IS NOT NULL THEN g.bs END IGNORE NULLS) OVER (
           PARTITION BY g.user_id ORDER BY g.bs
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nxt_b
  FROM grid g LEFT JOIN picked p ON g.user_id = p.user_id AND g.bs = p.bs
)
SELECT user_id, bs AS bin_start_us,
       CASE WHEN obs IS NOT NULL THEN obs
            WHEN prev_v IS NULL THEN nxt_v
            WHEN nxt_v IS NULL THEN prev_v
            ELSE prev_v + ((nxt_v - prev_v) * (bs - prev_b)) / (nxt_b - prev_b)
       END AS value
FROM anchored
"""


ASOF_QUERIES = {
    "q_asof_click_purchase": q_asof_click_purchase,
    "q_range_join_bursts": q_range_join_bursts,
    "q_events_resample": q_events_resample,
    "q_events_interpolate": q_events_interpolate,
}

ASOF_ORACLES = {
    "q_asof_click_purchase": Q_ASOF_SQL,
    "q_range_join_bursts": Q_RANGE_JOIN_SQL,
    "q_events_resample": Q_EVENTS_RESAMPLE_SQL,
    "q_events_interpolate": Q_EVENTS_INTERPOLATE_SQL,
}
