"""DSIR-style data selection: importance resampling on hashed-n-gram
log-likelihood ratios (Xie et al. 2023, "Data Selection for Language
Models via Importance Resampling").

The selection step a real pretraining pipeline runs over a 100 TB crawl:
score every raw document by how much more likely its hashed n-gram bag
is under the TARGET distribution (the data you want more of) than under
the RAW distribution (the crawl you have), then sample toward the target
with the ratio as the weight. This composes three operators the engine
already has — hashed n-gram featurization (the md5 bucket trick every
oracle-checked hash in this repo uses), smoothed count LMs
(:mod:`~fsql_spark.operators.lm`'s exact-integer recipe), and
deterministic weighted sampling (:mod:`~fsql_spark.operators.sampling`'s
Efraimidis-Spirakis / Gumbel machinery) — into one pipeline entry.

Exactly-oracle-able by construction: bucket counts are integers, the
log-ratio is a fixed expression over them, the per-doc score is a sum,
and the Gumbel resampling key derives from md5 — DuckDB replays every
step (4dp rounding on the reported score absorbs the engines'
sum-association ULP noise, the repo-wide convention).

Scale posture (100 TB): two passes over the corpus text, the DSIR
paper's own design. Pass 1 tokenizes and hashes every gram and
map-side-combines straight down to the ``n_buckets``-sized count table
(one shuffle of B-bounded partials; both models come from ONE aggregate
— the target is a conditional count of the same stream). Pass 2
re-hashes grams and joins the BROADCAST B-sized log-ratio table, then
map-side-combines per-doc sums (one doc-keyed shuffle). The resample is
TakeOrderedAndProject — no global sort. Nothing corpus-sized is ever
collected or persisted.

No reference counterpart (the reference delegates row-level compute,
`/root/reference/src/fsql/deser.py:30-31`); driver-mandated extension
surface (SURVEY §2.6, quality/mixing family).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

#: Default hashed-feature space: collisions are part of the method
#: (feature hashing); the paper's quality is insensitive to B within
#: 1e3-1e5. B bounds the model table, the broadcast, and pass 1's
#: aggregate — the 100 TB knob.
DSIR_BUCKETS = 4096


def _gram_stream(df: DataFrame, text_col: str, n_buckets: int, *carry: str) -> DataFrame:
    """(*carry, bucket) with one row per gram INSTANCE (unigrams + bigrams
    of whitespace words, multiplicity preserved — the bag, not the set).
    All JVM-side: word split, bigram join via the transform-over-index
    technique (``sequence(1, 0)`` would be a DESCENDING [1, 0] — the
    _word_shingles lesson — so short docs short-circuit to no bigrams),
    and the md5 bucket hash DuckDB can recompute."""
    words = F.filter(F.split(F.col(text_col), " "), lambda x: x != F.lit(""))
    base = df.select(*carry, words.alias("__ws"))
    n = F.size("__ws")
    bis = F.when(n >= 2, F.transform(
        F.sequence(F.lit(1), n - 1),
        lambda i: F.concat_ws(" ", F.element_at("__ws", i),
                              F.element_at("__ws", (i + 1).cast("int"))),
    )).otherwise(F.array().cast("array<string>"))
    grams = base.select(*carry, F.explode(F.concat(F.col("__ws"), bis)).alias("__g"))
    bucket = F.pmod(
        F.conv(F.substring(F.md5(F.col("__g")), 1, 8), 16, 10).cast("long"),
        F.lit(n_buckets),
    )
    return grams.select(*carry, bucket.alias("__bucket"))


def dsir_fit(
    df: DataFrame,
    text_col: str,
    is_target: Column,
    n_buckets: int = DSIR_BUCKETS,
) -> list:
    """Fit the DSIR log-ratio model: exactly ``n_buckets`` ``(bucket, lr)``
    rows — the shipped artifact — from ONE bucket-bounded aggregate over
    the corpus gram stream (raw counts and target counts ride the same
    pass; exact integers feed one ``ln`` per side, the lm.py recipe).
    Buckets unseen in the fit corpus get the smoothing-only log-ratio
    ``ln((r_total+B)/(t_total+B))`` (both Laplace models assign an unseen
    bucket ``1/(total+B)``), so scoring a NEW corpus — the streaming
    crawl-selection use case — counts unseen grams identically in the
    batch scorer's join and the stateless kernel instead of silently
    dropping (batch) or zero-weighting (stateless) them. Collected
    driver-side by design: it is model metadata, bounded by ``n_buckets``,
    and both the batch scorer (broadcast relation) and the streaming
    stateless scorer (kernel closure) consume it."""
    if n_buckets < 2:
        raise ValueError(f"n_buckets must be >= 2, got {n_buckets}")
    from .dedup import _spread

    tagged = _spread(
        df.select(F.col(text_col).alias("__tx"), is_target.cast("boolean").alias("__t"))
    )
    g1 = _gram_stream(tagged, "__tx", n_buckets, "__t")
    counts = (
        g1.groupBy("__bucket")
        .agg(
            F.count(F.lit(1)).alias("r_n"),
            F.sum(F.when(F.col("__t"), 1).otherwise(0)).alias("t_n"),
        )
        .persist()  # consumed by the totals action and the ratio projection
    )
    try:
        tot = counts.agg(
            F.sum("r_n").alias("r"), F.sum("t_n").alias("t")
        ).collect()[0]
        r_total, t_total = int(tot["r"] or 0), int(tot["t"] or 0)
        if t_total == 0:
            raise ValueError("is_target selects no grams — empty target corpus")
        seen = counts.select(
            "__bucket",
            (
                F.log((F.col("t_n") + 1.0) / F.lit(float(t_total + n_buckets)))
                - F.log((F.col("r_n") + 1.0) / F.lit(float(r_total + n_buckets)))
            ).alias("__lr"),
        ).collect()
    finally:
        counts.unpersist()
    # Unseen buckets: both smoothed models give count 1/(total+B), so the
    # log-ratio reduces to one constant. Filled driver-side (B-bounded).
    import math

    from pyspark.sql import Row

    default_lr = math.log(float(r_total + n_buckets)) - math.log(
        float(t_total + n_buckets)
    )
    have = {int(row["__bucket"]) for row in seen}
    return seen + [
        Row(__bucket=b, __lr=default_lr)
        for b in range(n_buckets)
        if b not in have
    ]


def dsir_logratio_scores(
    df: DataFrame,
    id_col: str,
    text_col: str,
    is_target: Column,
    n_buckets: int = DSIR_BUCKETS,
) -> DataFrame:
    """(id, n_grams, llr): per-document importance score
    ``llr = sum over gram instances of ln(p_target(b)) - ln(p_raw(b))``
    under Laplace-smoothed hashed-n-gram models fit in the SAME pass —
    ``p(b) = (count_b + 1) / (total + B)`` with exact integer counts, the
    target model from the ``is_target`` rows, the raw model from ALL
    rows (the paper's raw side; target docs are crawl members too).
    Positive llr = the doc looks more like the target than like the
    crawl average. Documents with no grams (empty text) are absent:
    their bag carries no evidence, and a selection run drops them.

    ``is_target`` is a boolean Column over ``df``'s columns (e.g.
    ``F.col('lang') == 'en'``), so target membership rides the same
    scan instead of forcing a second corpus input."""
    from .dedup import _spread

    spark = df.sparkSession
    # pass 1 (inside dsir_fit): both models from ONE B-bounded aggregate,
    # materialized driver-side as the model artifact — downstream plans
    # broadcast a self-contained relation with no lineage into the corpus
    ratio_rows = dsir_fit(df, text_col, is_target, n_buckets)
    ratio = spark.createDataFrame(ratio_rows, "__bucket long, __lr double")

    # ---- pass 2: per-doc sum over the broadcast ratio table ----
    tagged = _spread(
        df.select(F.col(id_col).alias("__id"), F.col(text_col).alias("__tx"))
    )
    g2 = _gram_stream(tagged, "__tx", n_buckets, "__id")
    return (
        g2.join(F.broadcast(ratio), "__bucket")
        .groupBy("__id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum("__lr").alias("llr"),
        )
        .select(F.col("__id").alias(id_col), "n_grams", "llr")
    )


def dsir_score_stateless(
    df: DataFrame,
    ratio_rows: list,
    n_buckets: int = DSIR_BUCKETS,
    id_col: str = "doc_id",
    text_col: str = "text",
    carry_cols: tuple = (),
) -> DataFrame:
    """STATELESS per-document DSIR scoring: the B-sized log-ratio model
    (from :func:`dsir_fit`) rides as a numpy array in the kernel closure,
    each document hashes its own grams and sums ratios row-locally inside
    one Arrow batch — no join, no aggregation state — so the same code
    runs unmodified on a readStream (crawl-time selection scoring —
    exercised against a rate-limited unbounded source with a watermarked
    windowed aggregate downstream in
    tests/test_streaming.py::test_dsir_stateless_on_rate_source_with_watermark), the
    :func:`~fsql_spark.operators.lm.doc_cross_entropy_stateless` posture.
    Gram hashing replicates the JVM/oracle definition exactly
    (``md5(gram)[:8]`` as int mod B — md5 is md5 in any engine).
    Zero-gram documents emit no row, matching the batch scorer.

    ``ratio_rows`` must cover all ``n_buckets`` buckets (:func:`dsir_fit`
    guarantees this — unseen buckets carry the smoothing-only ratio), so
    novel grams in a scored stream weigh exactly what the batch scorer's
    join gives them; a partial model is refused rather than silently
    zero-weighting unseen buckets."""
    import numpy as np
    import pandas as pd

    from pyspark.sql.types import DoubleType, LongType, StructField, StructType

    if len(ratio_rows) != n_buckets:
        raise ValueError(
            f"partial DSIR model: {len(ratio_rows)} rows for n_buckets="
            f"{n_buckets}; fit with dsir_fit (emits every bucket)"
        )
    # np.full(nan) + post-check rather than np.empty: a model with a
    # duplicate __bucket would pass the length check yet leave one slot
    # uninitialized — nondeterministic llr instead of a loud refusal
    # (ADVICE r12).
    lr = np.full(n_buckets, np.nan, dtype=np.float64)
    for row in ratio_rows:
        lr[int(row["__bucket"])] = float(row["__lr"])
    if np.isnan(lr).any():
        missing = int(np.isnan(lr).sum())
        raise ValueError(
            f"malformed DSIR model: {missing} of {n_buckets} buckets unfilled "
            "(duplicate or out-of-range __bucket rows); fit with dsir_fit"
        )

    src = df.select(id_col, text_col, *carry_cols)
    schema = StructType(
        [src.schema[id_col]]
        + [src.schema[c] for c in carry_cols]
        + [
            StructField("n_grams", LongType()),
            StructField("llr", DoubleType()),
        ]
    )

    def run(batches):
        import hashlib
        from functools import lru_cache

        # gram -> bucket memo: the vocabulary is zipf-shaped, so most gram
        # instances are repeats of a small head — caching turns the
        # per-instance python md5 (the kernel's measured hot spot, PERF.md
        # r11 A/B) into a dict probe. Bounded: ~1M entries x ~100 B is a
        # worker-safe ceiling even on adversarial vocabularies.
        @lru_cache(maxsize=1 << 20)
        def bucket(g: str) -> int:
            return int(hashlib.md5(g.encode("utf-8")).hexdigest()[:8], 16) % n_buckets

        for pdf in batches:
            rows = []
            carries = [pdf[c] for c in carry_cols]
            for key, text, *extra in zip(pdf[id_col], pdf[text_col], *carries):
                words = [w for w in (text or "").split(" ") if w]
                if not words:
                    continue
                grams = words + [
                    f"{a} {b}" for a, b in zip(words, words[1:])
                ]
                total = float(sum(lr[bucket(g)] for g in grams))
                rows.append((key, *extra, len(grams), total))
            yield pd.DataFrame(
                rows, columns=[id_col, *carry_cols, "n_grams", "llr"]
            )

    return src.mapInPandas(run, schema=schema)


def gumbel_topk(
    df: DataFrame,
    key_col: str,
    logweight_col: str,
    k: int,
    seed: str = "42",
) -> DataFrame:
    """Deterministic Gumbel-top-k: sample ``k`` rows without replacement
    with probability proportional to ``exp(logweight)`` — the
    log-space twin of :func:`~fsql_spark.operators.sampling.
    weighted_sample_topk` (Efraimidis-Spirakis), for weights that only
    exist as logs (DSIR's llr can be very negative; exponentiating would
    underflow). Key = ``logweight - ln(-ln(u))`` with ``u`` a
    reproducible md5-derived uniform in (0, 1) — 52 mantissa bits of
    ``md5(key || '-' || seed)``, shifted into the open interval so
    neither ln is singular. Map-only scoring + TakeOrderedAndProject."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    v = F.conv(
        F.substring(F.md5(F.concat_ws("-", F.col(key_col).cast("string"), F.lit(seed))), 1, 13),
        16, 10,
    ).cast("double")
    u = (v + 0.5) / F.lit(float(1 << 52))  # (0, 1): both ln calls finite
    gkey = F.col(logweight_col) - F.log(-F.log(u))
    return (
        df.withColumn("__gk", gkey)
        .orderBy(F.desc("__gk"), F.col(key_col))
        .limit(k)
        .drop("__gk")
    )


# --------------------------------------------------------------------------
# catalog entry + oracle
# --------------------------------------------------------------------------

_DSIR_K = 50
_DSIR_B = DSIR_BUCKETS


def q_dsir_selection(spark: SparkSession, sf: str) -> DataFrame:
    """DSIR importance resampling toward English: hashed unigram+bigram
    models of the en subcorpus (target) vs the whole crawl (raw), per-doc
    log-likelihood-ratio scores, and a 50-doc Gumbel resample proportional
    to exp(llr) — the paper's selection step end-to-end. Reported:
    (doc_id, lang, source, n_grams, llr 4dp), doc_id order."""
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    scores = dsir_logratio_scores(
        docs, "doc_id", "text", F.col("lang") == "en", n_buckets=_DSIR_B
    )
    picked = gumbel_topk(scores, "doc_id", "llr", k=_DSIR_K)
    return (
        picked.join(docs.select("doc_id", "lang", "source"), "doc_id")
        .select("doc_id", "lang", "source", "n_grams",
                F.round("llr", 4).alias("llr"))
        .orderBy("doc_id")
    )


def _dsir_scores_cte(src: str = "documents") -> str:
    """The shared model+scoring CTEs over relation ``src`` (one SQL
    definition of the DSIR arithmetic — a bucket-count or smoothing change
    cannot drift between the batch selection oracle, the streaming twin,
    and any pipeline composition that fits the model on a FILTERED
    corpus). ``src`` must expose (doc_id, lang, text)."""
    return _DSIR_SCORES_CTE.replace("FROM documents)", f"FROM {src})")


# the default instance over the raw documents table
_DSIR_SCORES_CTE = f"""grams AS (
  SELECT doc_id, lang,
         ('0x' || substr(md5(g), 1, 8))::BIGINT % {_DSIR_B} AS bucket
  FROM (
    SELECT doc_id, lang, unnest(ws) AS g
    FROM (
      SELECT doc_id, lang,
             list_concat(
               ws,
               CASE WHEN len(ws) >= 2 THEN
                 list_transform(generate_series(1, len(ws) - 1),
                                i -> ws[CAST(i AS INTEGER)] || ' ' ||
                                     ws[CAST(i AS INTEGER) + 1])
               ELSE [] END) AS ws
      FROM (SELECT doc_id, lang,
                   list_filter(string_split(text, ' '), x -> x <> '') AS ws
            FROM documents)
    )
  )
),
counts AS MATERIALIZED (
  SELECT bucket,
         CAST(COUNT(*) AS BIGINT) AS r_n,
         CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS t_n
  FROM grams GROUP BY bucket
),
tots AS (SELECT SUM(r_n) AS r_total, SUM(t_n) AS t_total FROM counts),
ratio AS MATERIALIZED (
  SELECT bucket,
         LN((t_n + 1.0) / (t_total + {_DSIR_B}))
         - LN((r_n + 1.0) / (r_total + {_DSIR_B})) AS lr
  FROM counts, tots
),
scores AS (
  SELECT g.doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_grams,
         SUM(ratio.lr) AS llr
  FROM grams g JOIN ratio ON g.bucket = ratio.bucket
  GROUP BY g.doc_id
)"""


Q_DSIR_SELECTION_SQL = f"""
WITH {_DSIR_SCORES_CTE},
picked AS (
  SELECT doc_id, n_grams, llr
  FROM scores
  ORDER BY llr - LN(-LN((('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '-42'), 1, 13))::BIGINT + 0.5)
                        / 4503599627370496.0)) DESC,
           doc_id
  LIMIT {_DSIR_K}
)
SELECT p.doc_id, d.lang, d.source, p.n_grams, ROUND(p.llr, 4) AS llr
FROM picked p JOIN documents d ON p.doc_id = d.doc_id
ORDER BY p.doc_id
"""


DSIR_QUERIES = {"q_dsir_selection": q_dsir_selection}
DSIR_ORACLES = {"q_dsir_selection": Q_DSIR_SELECTION_SQL}
