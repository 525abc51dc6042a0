"""fastText-style linear quality-classifier scoring — the DCLM /
RedPajama-v2 curation recipe: train a cheap linear classifier on hashed
n-gram features ("good" reference corpus vs raw crawl) and keep the
documents it scores above threshold.

The public shape (Joulin et al. 2016 "Bag of Tricks", the DCLM and
RedPajama-v2 pipelines): hash unigrams+bigrams into B buckets, pool the
per-gram weights over the document (fastText's mean-of-embeddings, here
dim=1), add the class-prior bias, squash through a sigmoid. The trainer
is the closed-form two-class Naive Bayes log-odds — NB *is* a linear
model over these features, needs one aggregate pass instead of SGD, and
its exact-integer counts make the whole pipeline DuckDB-replayable (the
:mod:`~fsql_spark.operators.dsir` lesson). What distinguishes this from
DSIR scoring: disjoint pos-vs-neg classes (DSIR is target-vs-ALL), a
class-prior bias term, length-invariant MEAN pooling (DSIR sums — longer
docs drift), and a calibrated (0,1) probability with a keep verdict —
the act-on-it filter, composing with the Gopher filter's rule-based
pass.

Scale posture (100 TB): fit is one B-bounded map-side-combined aggregate
over the gram stream (both class counts ride the same pass) plus one
scalar doc-count aggregate for the prior; the model is a B-row artifact
collected driver-side by design. Scoring re-hashes grams map-only, joins
the BROADCAST B-row weight table, and map-side-combines one doc-keyed
aggregate — the 100 TB side never shuffles anything wider than
(doc, count, sum). No reference counterpart (the reference delegates
row-level compute, `/root/reference/src/fsql/deser.py:30-31`);
driver-mandated extension surface (SURVEY §2.6).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .dsir import DSIR_BUCKETS, _gram_stream

#: Same default feature space as DSIR: the hashed-feature trick is shared
#: machinery (one md5-bucket definition repo-wide), B bounds model/broadcast.
QC_BUCKETS = DSIR_BUCKETS


def quality_classifier_fit(
    df: DataFrame,
    text_col: str,
    is_positive: Column,
    n_buckets: int = QC_BUCKETS,
) -> tuple[list, float]:
    """Fit the linear quality classifier: returns ``(weight_rows, bias)``
    where ``weight_rows`` is exactly ``n_buckets`` ``(bucket, w)`` rows
    with ``w = ln((pos_b+1)/(pos_tot+B)) - ln((neg_b+1)/(neg_tot+B))``
    (Laplace-smoothed NB log-odds over gram-instance counts) and ``bias``
    is the class prior ``ln(n_pos_docs / n_neg_docs)``. ``is_positive``
    partitions the fit corpus (positive = reference "good" data, negative
    = everything else); both classes must be non-empty. Buckets unseen in
    the fit corpus carry the smoothing-only weight so scoring a NEW
    corpus weighs novel grams identically everywhere (the dsir_fit
    posture). Collected driver-side by design: B-bounded model metadata,
    consumed as a broadcast relation."""
    if n_buckets < 2:
        raise ValueError(f"n_buckets must be >= 2, got {n_buckets}")
    from .dedup import _spread

    tagged = _spread(
        df.select(
            F.col(text_col).alias("__tx"), is_positive.cast("boolean").alias("__p")
        )
    )
    prior = tagged.agg(
        F.sum(F.when(F.col("__p"), 1).otherwise(0)).alias("np"),
        F.sum(F.when(F.col("__p"), 0).otherwise(1)).alias("nn"),
    ).collect()[0]
    n_pos, n_neg = int(prior["np"] or 0), int(prior["nn"] or 0)
    if n_pos == 0 or n_neg == 0:
        raise ValueError(
            f"quality classifier needs both classes: {n_pos} positive / "
            f"{n_neg} negative docs"
        )
    bias = math.log(n_pos / n_neg)

    g1 = _gram_stream(tagged, "__tx", n_buckets, "__p")
    counts = (
        g1.groupBy("__bucket")
        .agg(
            F.sum(F.when(F.col("__p"), 1).otherwise(0)).alias("p_n"),
            F.sum(F.when(F.col("__p"), 0).otherwise(1)).alias("n_n"),
        )
        .persist()  # consumed by the totals action and the weight projection
    )
    try:
        tot = counts.agg(
            F.sum("p_n").alias("p"), F.sum("n_n").alias("n")
        ).collect()[0]
        p_total, n_total = int(tot["p"] or 0), int(tot["n"] or 0)
        seen = counts.select(
            "__bucket",
            (
                F.log((F.col("p_n") + 1.0) / F.lit(float(p_total + n_buckets)))
                - F.log((F.col("n_n") + 1.0) / F.lit(float(n_total + n_buckets)))
            ).alias("__w"),
        ).collect()
    finally:
        counts.unpersist()
    from pyspark.sql import Row

    default_w = math.log(float(n_total + n_buckets)) - math.log(
        float(p_total + n_buckets)
    )
    have = {int(row["__bucket"]) for row in seen}
    rows = seen + [
        Row(__bucket=b, __w=default_w) for b in range(n_buckets) if b not in have
    ]
    return rows, bias


def _check_weight_rows(weight_rows: list, n_buckets: int) -> None:
    """Refuse partial / duplicate-bucket / out-of-range models loudly —
    shared by the batch join scorer and the stateless kernel so both
    reject exactly the same malformed inputs."""
    if len(weight_rows) != n_buckets:
        raise ValueError(
            f"partial quality model: {len(weight_rows)} rows for n_buckets="
            f"{n_buckets}; fit with quality_classifier_fit (emits every bucket)"
        )
    seen = {int(row["__bucket"]) for row in weight_rows}
    if seen != set(range(n_buckets)):
        missing = len(set(range(n_buckets)) - seen)
        raise ValueError(
            f"malformed quality model: {missing} of {n_buckets} buckets "
            "unfilled (duplicate or out-of-range __bucket rows); fit with "
            "quality_classifier_fit"
        )


def quality_classifier_score(
    df: DataFrame,
    id_col: str,
    text_col: str,
    weight_rows: list,
    bias: float,
    n_buckets: int = QC_BUCKETS,
    threshold: float = 0.5,
) -> DataFrame:
    """(id, n_grams, p_good 4dp, keep 0/1): per-document probability under
    the fitted linear model — ``sigmoid(bias + mean over gram instances of
    w[bucket(g)])`` — and the keep verdict at ``threshold``. Mean pooling
    makes the score length-invariant (a 10x longer doc of the same
    character scores the same, unlike a summed llr). Docs with no grams
    carry no evidence and are absent (the repo-wide empty-bag convention).
    A partial or duplicate-bucket model is refused (the
    dsir_score_stateless posture — a duplicated+missing bucket pair
    passes a length-only check yet silently drops every gram hashing to
    the hole through the inner join, shifting the mean; batch and stream
    must refuse the SAME malformed inputs or their verdicts diverge)."""
    _check_weight_rows(weight_rows, n_buckets)
    from .dedup import _spread

    spark = df.sparkSession
    wts = spark.createDataFrame(weight_rows, "__bucket long, __w double")
    tagged = _spread(
        df.select(F.col(id_col).alias("__id"), F.col(text_col).alias("__tx"))
    )
    g2 = _gram_stream(tagged, "__tx", n_buckets, "__id")
    scored = (
        g2.join(F.broadcast(wts), "__bucket")
        .groupBy("__id")
        .agg(F.count(F.lit(1)).alias("n_grams"), F.sum("__w").alias("__sw"))
    )
    s = F.lit(float(bias)) + F.col("__sw") / F.col("n_grams")
    p = F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-s)), 4)
    return scored.select(
        F.col("__id").alias(id_col),
        "n_grams",
        p.alias("p_good"),
        (p >= threshold).cast("int").alias("keep"),
    )


def quality_score_stateless(
    df: DataFrame,
    weight_rows: list,
    bias: float,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = QC_BUCKETS,
    threshold: float = 0.5,
    carry_cols: tuple = (),
) -> DataFrame:
    """STATELESS per-document classifier scoring — quality filtering AT
    CRAWL INGEST, the DCLM deployment shape: the B-sized weight vector
    rides as a numpy array in the kernel closure, each arriving document
    hashes its own grams and mean-pools row-locally inside one Arrow
    batch — no join, no aggregation state, no watermark — so the same
    code runs unmodified on a readStream (the
    :func:`~fsql_spark.operators.dsir.dsir_score_stateless` posture,
    including the md5 gram-bucket memo and the partial/duplicate-model
    refusals). Sigmoid + rounding + verdict happen JVM-side after the
    kernel, exactly like the batch scorer, so batch and stream verdicts
    share one arithmetic definition (and one oracle)."""
    import numpy as np
    import pandas as pd

    from pyspark.sql.types import DoubleType, LongType, StructField, StructType

    _check_weight_rows(weight_rows, n_buckets)
    w = np.empty(n_buckets, dtype=np.float64)
    for row in weight_rows:
        w[int(row["__bucket"])] = float(row["__w"])

    src = df.select(id_col, text_col, *carry_cols)
    schema = StructType(
        [src.schema[id_col]]
        + [src.schema[c] for c in carry_cols]
        + [StructField("n_grams", LongType()), StructField("__sw", DoubleType())]
    )

    def run(batches):
        import hashlib
        from functools import lru_cache

        @lru_cache(maxsize=1 << 20)
        def bucket(g: str) -> int:
            return int(hashlib.md5(g.encode("utf-8")).hexdigest()[:8], 16) % n_buckets

        for pdf in batches:
            rows = []
            carries = [pdf[c] for c in carry_cols]
            for key, text, *extra in zip(pdf[id_col], pdf[text_col], *carries):
                words = [x for x in (text or "").split(" ") if x]
                if not words:
                    continue
                grams = words + [f"{a} {b}" for a, b in zip(words, words[1:])]
                total = float(sum(w[bucket(g)] for g in grams))
                rows.append((key, *extra, len(grams), total))
            yield pd.DataFrame(
                rows, columns=[id_col, *carry_cols, "n_grams", "__sw"]
            )

    scored = src.mapInPandas(run, schema=schema)
    s = F.lit(float(bias)) + F.col("__sw") / F.col("n_grams")
    p = F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-s)), 4)
    return scored.select(
        id_col,
        *carry_cols,
        "n_grams",
        p.alias("p_good"),
        (p >= threshold).cast("int").alias("keep"),
    )


# --------------------------------------------------------------------------
# catalog entry + oracle
# --------------------------------------------------------------------------

def q_quality_classifier(spark: SparkSession, sf: str) -> DataFrame:
    """Fit on the documents table (positive class: lang='en' — the
    stand-in 'reference corpus' the synthetic data offers), score every
    document, report the per-doc probability + keep verdict at 0.5."""
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    weight_rows, bias = quality_classifier_fit(
        docs, "text", F.col("lang") == "en", QC_BUCKETS
    )
    return quality_classifier_score(
        docs, "doc_id", "text", weight_rows, bias, QC_BUCKETS, threshold=0.5
    )


Q_QUALITY_CLASSIFIER_SQL = f"""
WITH grams AS (
  SELECT doc_id, lang,
         ('0x' || substr(md5(g), 1, 8))::BIGINT % {QC_BUCKETS} AS bucket
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
         CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS p_n,
         CAST(SUM(CASE WHEN lang <> 'en' THEN 1 ELSE 0 END) AS BIGINT) AS n_n
  FROM grams GROUP BY bucket
),
tots AS (SELECT SUM(p_n) AS p_total, SUM(n_n) AS n_total FROM counts),
prior AS (
  SELECT LN(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) * 1.0
            / SUM(CASE WHEN lang <> 'en' THEN 1 ELSE 0 END)) AS bias
  FROM documents
),
wts AS MATERIALIZED (
  SELECT bucket,
         LN((p_n + 1.0) / (p_total + {QC_BUCKETS}))
         - LN((n_n + 1.0) / (n_total + {QC_BUCKETS})) AS w
  FROM counts, tots
),
scores AS (
  SELECT g.doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_grams,
         SUM(wts.w) AS sw
  FROM grams g JOIN wts USING (bucket)
  GROUP BY g.doc_id
)
SELECT s.doc_id, s.n_grams,
       ROUND(1.0 / (1.0 + EXP(-(p.bias + s.sw / s.n_grams))), 4) AS p_good,
       CAST(ROUND(1.0 / (1.0 + EXP(-(p.bias + s.sw / s.n_grams))), 4) >= 0.5
            AS INTEGER) AS keep
FROM scores s, prior p
"""


QUALITY_QUERIES = {
    "q_quality_classifier": q_quality_classifier,
}

QUALITY_ORACLES = {
    "q_quality_classifier": Q_QUALITY_CLASSIFIER_SQL,
}
