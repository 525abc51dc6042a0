"""Event-sequence analytics: last-touch attribution and Markov transitions.

A clickstream/events table is a set of per-user ordered SEQUENCES; two
questions every product/marketing pipeline asks of it:

- **Attribution**: when a conversion happens, which earlier touch gets the
  credit? Last-touch (the industry default) credits the most recent
  qualifying touch strictly BEFORE the conversion; conversions with no
  prior touch are "direct".
- **Transition structure**: what follows what? The first-order Markov
  transition matrix (P(next_type | type) from consecutive event pairs) is
  the standard sequence fingerprint — feeds session simulation, anomaly
  scoring (improbable paths), and UX funnels.

Both are ONE ordered-window pass over the events table: shuffle once on
``user_id``, sort within the key by (ts, event_id), then a window carry
(attribution: ``last(ignorenulls)`` over the preceding frame) or a ``lead``
(transitions). The follow-up aggregate is grouped by low-cardinality type
keys — map-side combinable, never user-wide. No driver loops, no UDFs; at
100 TB the cost is exactly one repartition of the events table, and AQE
handles user-skew in the sort.

Determinism: ties in ``ts`` are broken by ``event_id`` (total order), so
the attributed touch and every (type, next) pair are unique; transition
probabilities are single divisions of exact BIGINT counts — bit-identical
across engines.

No reference counterpart (the reference delegates all row-level compute,
`/root/reference/src/fsql/deser.py:30-31`); driver-mandated extension
surface (SURVEY §2.6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def last_touch_attribution(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    order_col: str,
    type_col: str,
    conversion_type: str,
    touch_types: list[str],
) -> DataFrame:
    """Conversion rows annotated with their attributed touch: the latest
    event of a ``touch_types`` type strictly before the conversion in the
    same user's (ts, order) sequence; ``channel`` is NULL when no touch
    precedes (callers usually coalesce to 'direct').

    One window over (user, ts, order): the qualifying-touch type is carried
    forward with ``last(ignorenulls)`` over the UNBOUNDED-PRECEDING..-1
    frame (strictly earlier rows), then non-conversions are dropped.

    ``channel`` is a RESERVED output name: an input that already carries a
    ``channel`` column would be silently clobbered by the ``withColumn``,
    so it is rejected up front."""
    if "channel" in events.columns:
        raise ValueError(
            "last_touch_attribution reserves the output column 'channel'; "
            "rename or drop the input's existing 'channel' column first"
        )
    w = (
        Window.partitionBy(user_col)
        .orderBy(F.col(ts_col), F.col(order_col))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch = F.when(F.col(type_col).isin(touch_types), F.col(type_col))
    return (
        events.withColumn("channel", F.last(touch, ignorenulls=True).over(w))
        .where(F.col(type_col) == conversion_type)
    )


def transition_matrix(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    order_col: str,
    type_col: str,
) -> DataFrame:
    """First-order Markov transition counts and probabilities from each
    user's ordered event sequence -> (type, next_type, n, p) where
    ``p = n / sum(n over type)``. Sequence-final events emit no pair.

    The pair extraction is one ``lead`` window (a single shuffle on the
    user key); the count is grouped by the type pair — a tiny,
    map-side-combinable aggregate — and the row-normalization is a second
    window over the type-pair table, which is (|types|^2)-sized, i.e.
    driver-trivial at any corpus scale.

    ``next_type`` is a RESERVED output name (and must differ from
    ``type_col``): a pre-existing column of that name would be silently
    clobbered, so it is rejected up front."""
    if "next_type" in events.columns or type_col == "next_type":
        raise ValueError(
            "transition_matrix reserves the output column 'next_type'; "
            "rename or drop the input's existing 'next_type' column first"
        )
    w = Window.partitionBy(user_col).orderBy(F.col(ts_col), F.col(order_col))
    pairs = (
        events.withColumn("next_type", F.lead(type_col).over(w))
        .where(F.col("next_type").isNotNull())
        .groupBy(F.col(type_col).alias("type"), "next_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w_row = Window.partitionBy("type")
    return pairs.withColumn("p", F.col("n") / F.sum("n").over(w_row))


# --------------------------------------------------------------------------
# catalog entries + oracles
# --------------------------------------------------------------------------

_TOUCH_TYPES = ["click", "view"]


def q_events_attribution(spark: SparkSession, sf: str) -> DataFrame:
    """Last-touch revenue attribution: every purchase credits the user's
    most recent click/view strictly before it (ties broken by event_id),
    'direct' when none precedes; reported as conversions + revenue (2dp)
    per channel."""
    from ..relational import _t

    ev = _t(spark, sf, "events")
    conv = last_touch_attribution(
        ev, "user_id", "ts", "event_id", "event_type",
        conversion_type="purchase", touch_types=_TOUCH_TYPES,
    )
    return (
        conv.select(F.coalesce("channel", F.lit("direct")).alias("channel"), "value")
        .groupBy("channel")
        .agg(
            F.count(F.lit(1)).alias("conversions"),
            F.round(F.sum("value"), 2).alias("revenue"),
        )
        .orderBy("channel")
    )


Q_EVENTS_ATTRIBUTION_SQL = """
WITH tagged AS (
  SELECT event_type, value,
         LAST_VALUE(CASE WHEN event_type IN ('click', 'view') THEN event_type END
                    IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS channel
  FROM events
)
SELECT COALESCE(channel, 'direct') AS channel,
       COUNT(*) AS conversions,
       ROUND(SUM(value), 2) AS revenue
FROM tagged
WHERE event_type = 'purchase'
GROUP BY 1
ORDER BY 1
"""


def q_markov_transitions(spark: SparkSession, sf: str) -> DataFrame:
    """First-order Markov transition matrix of the event-type sequences:
    per (type, next_type) the pair count and row-normalized probability
    (4dp) — the corpus's behavioral fingerprint."""
    from ..relational import _t

    ev = _t(spark, sf, "events")
    out = transition_matrix(ev, "user_id", "ts", "event_id", "event_type")
    return out.select(
        "type", "next_type", "n", F.round("p", 4).alias("p")
    ).orderBy("type", "next_type")


Q_MARKOV_TRANSITIONS_SQL = """
WITH pairs AS (
  SELECT event_type AS type,
         LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type
  FROM events
),
counts AS (
  SELECT type, next_type, COUNT(*) AS n
  FROM pairs WHERE next_type IS NOT NULL
  GROUP BY 1, 2
)
SELECT type, next_type, n,
       ROUND(n / SUM(n) OVER (PARTITION BY type), 4) AS p
FROM counts
ORDER BY type, next_type
"""


def sequence_ngrams(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    order_col: str,
    type_col: str,
    n: int = 3,
) -> DataFrame:
    """Frequent behavioral n-grams: every length-``n`` run of consecutive
    event types per user, counted corpus-wide -> (t1..tn, cnt). The
    sequence-mining staple behind "what do users do right before X" —
    first-order transitions (``transition_matrix``) can't see it (a Markov
    chain forgets everything past one step).

    Same one-window shape as the transition matrix: ``n-1`` leads over one
    (user, ts, order) sort — Spark computes all leads in a single Window
    node — then a tiny type-tuple aggregate."""
    if n < 2:
        raise ValueError(f"n must be >= 2, got {n}")
    w = Window.partitionBy(user_col).orderBy(F.col(ts_col), F.col(order_col))
    cols = [F.col(type_col).alias("t1")]
    for i in range(1, n):
        cols.append(F.lead(type_col, i).over(w).alias(f"t{i + 1}"))
    grams = events.select(*cols).where(F.col(f"t{n}").isNotNull())
    return grams.groupBy(*[f"t{i + 1}" for i in range(n)]).agg(
        F.count(F.lit(1)).alias("cnt")
    )


def q_sequence_trigrams(spark: SparkSession, sf: str) -> DataFrame:
    """Top-20 event-type trigrams across all user sequences (count desc,
    lexical tie-break) — the pre-conversion path report."""
    from ..relational import _t

    ev = _t(spark, sf, "events")
    out = sequence_ngrams(ev, "user_id", "ts", "event_id", "event_type", n=3)
    return (
        out.orderBy(F.desc("cnt"), "t1", "t2", "t3")
        .limit(20)
        .select("t1", "t2", "t3", "cnt")
    )


Q_SEQUENCE_TRIGRAMS_SQL = """
WITH grams AS (
  SELECT event_type AS t1,
         LEAD(event_type, 1) OVER w AS t2,
         LEAD(event_type, 2) OVER w AS t3
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT t1, t2, t3, COUNT(*) AS cnt
FROM grams WHERE t3 IS NOT NULL
GROUP BY t1, t2, t3
ORDER BY cnt DESC, t1, t2, t3
LIMIT 20
"""


def q_conversion_latency(spark: SparkSession, sf: str) -> DataFrame:
    """Touch-to-conversion latency distribution per channel: every purchase
    measures the time since its attributed (latest strictly-preceding)
    click/view, reported per channel as count, min/median/p90/max seconds —
    "how long does each channel take to convert". The attributed touch TS
    rides the same strictly-preceding window as the channel; quantiles are
    exact DISCRETE order statistics via a per-channel ranking window (the
    q_price_quantiles posture: interpolated quantiles diverge across
    engines at decimal midpoints), and every statistic is integer seconds —
    no float anywhere."""
    from ..relational import _t

    ev = _t(spark, sf, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts"), F.col("event_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch_type = F.when(F.col("event_type").isin(_TOUCH_TYPES), F.col("event_type"))
    touch_ts = F.when(F.col("event_type").isin(_TOUCH_TYPES), F.col("ts"))
    conv = (
        ev.withColumn("channel", F.last(touch_type, ignorenulls=True).over(w))
        .withColumn("touch_ts", F.last(touch_ts, ignorenulls=True).over(w))
        .where((F.col("event_type") == "purchase") & F.col("channel").isNotNull())
        .select(
            "channel",
            ((F.unix_micros("ts") - F.unix_micros("touch_ts")) / 1_000_000)
            .cast("long")
            .alias("gap_s"),
            "event_id",
        )
    )
    w_rank = Window.partitionBy("channel").orderBy("gap_s", "event_id")
    w_n = Window.partitionBy("channel")
    ranked = conv.withColumn("rn", F.row_number().over(w_rank)).withColumn(
        "n", F.count(F.lit(1)).over(w_n)
    )
    at = lambda q: F.max(  # noqa: E731
        F.when(
            F.col("rn") == F.ceil(F.lit(q) * F.col("n")).cast("int"),
            F.col("gap_s"),
        )
    )
    return (
        ranked.groupBy("channel")
        .agg(
            F.max("n").alias("conversions"),
            F.min("gap_s").alias("min_s"),
            at(0.5).alias("median_s"),
            at(0.9).alias("p90_s"),
            F.max("gap_s").alias("max_s"),
        )
        .orderBy("channel")
    )


Q_CONVERSION_LATENCY_SQL = """
WITH tagged AS (
  SELECT event_type, ts, event_id,
         LAST_VALUE(CASE WHEN event_type IN ('click', 'view') THEN event_type END
                    IGNORE NULLS) OVER w AS channel,
         LAST_VALUE(CASE WHEN event_type IN ('click', 'view') THEN ts END
                    IGNORE NULLS) OVER w AS touch_ts
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
),
conv AS (
  SELECT channel,
         CAST((epoch_us(ts) - epoch_us(touch_ts)) // 1000000 AS BIGINT) AS gap_s,
         event_id
  FROM tagged
  WHERE event_type = 'purchase' AND channel IS NOT NULL
),
ranked AS (
  SELECT channel, gap_s,
         ROW_NUMBER() OVER (PARTITION BY channel ORDER BY gap_s, event_id) AS rn,
         COUNT(*) OVER (PARTITION BY channel) AS n
  FROM conv
)
SELECT channel,
       MAX(n) AS conversions,
       MIN(gap_s) AS min_s,
       MAX(CASE WHEN rn = CAST(CEIL(0.5 * n) AS INTEGER) THEN gap_s END) AS median_s,
       MAX(CASE WHEN rn = CAST(CEIL(0.9 * n) AS INTEGER) THEN gap_s END) AS p90_s,
       MAX(gap_s) AS max_s
FROM ranked
GROUP BY channel
ORDER BY channel
"""


SEQUENCE_QUERIES = {
    "q_events_attribution": q_events_attribution,
    "q_markov_transitions": q_markov_transitions,
    "q_sequence_trigrams": q_sequence_trigrams,
    "q_conversion_latency": q_conversion_latency,
}
SEQUENCE_ORACLES = {
    "q_events_attribution": Q_EVENTS_ATTRIBUTION_SQL,
    "q_markov_transitions": Q_MARKOV_TRANSITIONS_SQL,
    "q_sequence_trigrams": Q_SEQUENCE_TRIGRAMS_SQL,
    "q_conversion_latency": Q_CONVERSION_LATENCY_SQL,
}
