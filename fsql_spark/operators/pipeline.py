"""Composed corpus-build pipeline: the end-to-end shape a training-data
engine exists for — quality filter -> exact dedup -> split assignment — as
ONE lazy plan, demonstrating that the operator surface composes without
materialization barriers.

Every stage is hash-deterministic (arithmetic quality score, sha2 content
dedup, md5 split bands), so the WHOLE pipeline sits under a single
value-level SQL oracle: the composed answer is checked, not just each
stage in isolation.

Scale shape (100 TB): the quality filter is a map-only scan predicate
(pushes past column pruning, no shuffle); dedup is the one content-hash
shuffle; split assignment is map-only again; the audit aggregate is
map-side combinable. One exchange end-to-end plus the final aggregation —
Catalyst pipelines the stages because nothing here forces an action.

No reference counterpart (the reference delegates all row-level compute,
`/root/reference/src/fsql/deser.py:30-31`); driver-mandated extension
surface (SURVEY §2.6).
"""

from __future__ import annotations

from typing import Mapping

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .dedup import dedup_exact
from .sampling import fraction_to_hex_threshold, split_by_hash
from .text import quality_score


def build_corpus(
    docs: DataFrame,
    key_col: str = "doc_id",
    text_col: str = "text",
    quality_threshold: float = 0.5,
    splits: Mapping[str, float] | None = None,
) -> DataFrame:
    """Filter low-quality docs, keep one canonical row per distinct text
    (min key), assign deterministic split labels. Returns the surviving
    rows + ``split`` — a lazy DataFrame; nothing materializes until the
    caller acts."""
    if splits is None:
        splits = {"train": 0.9, "val": 0.05, "test": 0.05}
    q = docs.where(quality_score(text_col) >= quality_threshold)
    d = dedup_exact(q, [text_col], key_col)
    return split_by_hash(d, key_col, splits)


def q_corpus_pipeline(spark: SparkSession, sf: str) -> DataFrame:
    """The composed corpus build audited per (split, lang): quality >= 0.5,
    exact-deduped, 90/5/5 split. One oracle checks the whole chain."""
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    out = build_corpus(docs)
    return out.groupBy("split", "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("sum_chars"),
    )


Q_CORPUS_PIPELINE_SQL = f"""
WITH t AS (
  SELECT *, len(string_split(text, ' ')) AS ntr FROM documents
),
q AS (
  SELECT * FROM t
  WHERE ROUND(
          LEAST(ntr / 100.0, 1.0) * 0.5
          + CASE WHEN (LENGTH(text) - ntr + 1) * 1.0 / ntr BETWEEN 3 AND 8
                 THEN 0.3 ELSE 0.0 END
          + LEAST(((LENGTH(text) - LENGTH(REPLACE(text, ' the ', ''))) / 5) / 3.0, 1.0) * 0.2,
          4) >= 0.5
),
d AS (
  SELECT * FROM q
  QUALIFY ROW_NUMBER() OVER (PARTITION BY text ORDER BY doc_id) = 1
),
s AS (
  SELECT CASE
           WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) < '{fraction_to_hex_threshold(0.9)}'  THEN 'train'
           WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) < '{fraction_to_hex_threshold(0.95)}' THEN 'val'
           ELSE 'test'
         END AS split,
         lang, n_chars
  FROM d
)
SELECT split, lang,
       COUNT(*)                     AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars
FROM s
GROUP BY 1, 2
"""


def build_corpus_quality_gated(
    docs: DataFrame,
    key_col: str = "doc_id",
    text_col: str = "text",
    ce_cutoff: float = 3.6,
    top_k: int = 30,
    splits: Mapping[str, float] | None = None,
) -> DataFrame:
    """The 2024-era curation recipe composed end-to-end: Gopher rule gate
    AND corpus-trained unigram-LM cross-entropy gate -> exact dedup ->
    deterministic split. Two passes over the corpus by necessity (the LM is
    trained on the full corpus before it can score), but ONE tokenization:
    the persisted tf stream feeds the model aggregate and the scoring join.

    Exchange audit: (1) the token-keyed model aggregate, (2) the doc-keyed
    score aggregate — whose hash partitioning Spark REUSES for the
    corpus⋈score join, so the join adds only the corpus-side exchange —
    (3) the dedup content-hash shuffle. Rules and split assignment are
    map-only. The cross-entropy gate compares ROUND(ce, 4) on both engines,
    so the float boundary is a rounding-grid event (~1e-11/doc), not an
    epsilon race."""
    from .lm import doc_cross_entropy, unigram_model
    from .text import quality_filter
    from .vocab import term_frequencies

    if splits is None:
        splits = {"train": 0.9, "val": 0.05, "test": 0.05}
    tf = term_frequencies(docs, key_col, text_col).persist()
    model, oov_lp, _, _ = unigram_model(docs, key_col, text_col, top_k=top_k, tf=tf)
    scored = doc_cross_entropy(docs, model, oov_lp, key_col, text_col, tf=tf).select(
        key_col, F.round("cross_entropy", 4).alias("__ce")
    )
    gated = (
        quality_filter(docs, text_col)
        .where(F.col("passes"))
        .drop("r_word_count", "r_word_len", "r_stopword", "r_repetition", "passes")
        .join(scored, key_col)
        .where(F.col("__ce") <= ce_cutoff)
        .drop("__ce")
    )
    d = dedup_exact(gated, [text_col], key_col)
    return split_by_hash(d, key_col, splits)


def q_corpus_pipeline_v2(spark: SparkSession, sf: str) -> DataFrame:
    """Quality-gated corpus build audited per (split, lang): Gopher rules +
    LM cross-entropy <= 3.6 (top-30 model trained on the full corpus),
    exact-deduped, 90/5/5 split. One oracle retrains the model and replays
    the whole chain."""
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    out = build_corpus_quality_gated(docs)
    return out.groupBy("split", "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("sum_chars"),
    )


# composes the SHARED LM model/scoring CTEs from operators.lm (one SQL
# definition of the model — _TOP_K/smoothing changes cannot drift here)
from .lm import _LM_MODEL_CTE, _LM_SCORED_CTE  # noqa: E402

Q_CORPUS_PIPELINE_V2_SQL = f"""
WITH {_LM_MODEL_CTE},
{_LM_SCORED_CTE},
rce AS (SELECT doc_id, ROUND(ce, 4) AS ce FROM scored),
rl AS (
  SELECT *, list_filter(string_split(text, ' '), x -> x <> '') AS l
  FROM documents
),
rules AS (
  SELECT doc_id, text, lang, n_chars,
         len(l) BETWEEN 20 AND 90
           AND COALESCE(list_sum(list_transform(l, x -> LENGTH(x))), 0) * 1.0
                 / GREATEST(len(l), 1) BETWEEN 2.5 AND 7.0
           AND (list_contains(l, 'a') OR list_contains(l, 'the'))
           AND len(list_distinct(l)) * 1.0 / GREATEST(len(l), 1) >= 0.3 AS passes
  FROM rl
),
gated AS (
  SELECT r.doc_id, r.text, r.lang, r.n_chars
  FROM rules r JOIN rce s USING (doc_id)
  WHERE r.passes AND s.ce <= 3.6
),
d AS (
  SELECT * FROM gated
  QUALIFY ROW_NUMBER() OVER (PARTITION BY text ORDER BY doc_id) = 1
),
s AS (
  SELECT CASE
           WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) < '{fraction_to_hex_threshold(0.9)}'  THEN 'train'
           WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) < '{fraction_to_hex_threshold(0.95)}' THEN 'val'
           ELSE 'test'
         END AS split,
         lang, n_chars
  FROM d
)
SELECT split, lang,
       COUNT(*)                     AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars
FROM s
GROUP BY 1, 2
"""


def build_corpus_dsir_selected(
    docs: DataFrame,
    key_col: str = "doc_id",
    text_col: str = "text",
    target=None,
    n_select: int = 100,
    n_buckets: int | None = None,
) -> DataFrame:
    """The selection-era recipe composed end-to-end: Gopher rule gate ->
    exact dedup -> DSIR importance resample toward the target distribution
    (Gumbel-top-``n_select`` on hashed-n-gram log-likelihood ratios) — the
    chain a 2024+ pretraining corpus build actually runs, with the DSIR
    model fitted on the GATED+DEDUPED corpus (garbage filtered before it
    can distort the raw-side model, the paper's own ordering).

    Exchange audit: rules are map-only; dedup is the one content-hash
    shuffle; the DSIR fit is a bucket-bounded aggregate over the deduped
    stream; scoring joins a broadcast B-sized ratio table and combines
    per-doc map-side; the resample is TakeOrderedAndProject. Nothing
    corpus-sized is collected."""
    from .dsir import DSIR_BUCKETS, dsir_logratio_scores, gumbel_topk
    from .text import quality_filter

    if target is None:
        target = F.col("lang") == "en"
    gated = (
        quality_filter(docs, text_col)
        .where(F.col("passes"))
        .drop("r_word_count", "r_word_len", "r_stopword", "r_repetition", "passes")
    )
    d = dedup_exact(gated, [text_col], key_col)
    scores = dsir_logratio_scores(
        d, key_col, text_col, target, n_buckets=n_buckets or DSIR_BUCKETS
    )
    picked = gumbel_topk(scores, key_col, "llr", k=n_select)
    return picked.join(d, key_col)


def q_corpus_pipeline_v3(spark: SparkSession, sf: str) -> DataFrame:
    """Gate -> dedup -> DSIR-select-100-toward-English, audited per
    (lang, source): selected doc counts + characters. One oracle replays
    the whole chain including the model fit on the gated+deduped set."""
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    out = build_corpus_dsir_selected(docs)
    return (
        out.groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
        )
        .orderBy("lang", "source")
    )


from .dsir import _dsir_scores_cte  # noqa: E402

Q_CORPUS_PIPELINE_V3_SQL = f"""
WITH rl AS (
  SELECT *, list_filter(string_split(text, ' '), x -> x <> '') AS l
  FROM documents
),
rules AS (
  SELECT doc_id, text, lang, source, n_chars,
         len(l) BETWEEN 20 AND 90
           AND COALESCE(list_sum(list_transform(l, x -> LENGTH(x))), 0) * 1.0
                 / GREATEST(len(l), 1) BETWEEN 2.5 AND 7.0
           AND (list_contains(l, 'a') OR list_contains(l, 'the'))
           AND len(list_distinct(l)) * 1.0 / GREATEST(len(l), 1) >= 0.3 AS passes
  FROM rl
),
gatedsrc AS MATERIALIZED (
  SELECT doc_id, text, lang, source, n_chars FROM rules
  WHERE passes
  QUALIFY ROW_NUMBER() OVER (PARTITION BY text ORDER BY doc_id) = 1
),
{_dsir_scores_cte("gatedsrc")},
picked AS (
  SELECT doc_id
  FROM scores
  ORDER BY llr - LN(-LN((('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '-42'), 1, 13))::BIGINT + 0.5)
                        / 4503599627370496.0)) DESC,
           doc_id
  LIMIT 100
)
SELECT g.lang, g.source,
       COUNT(*)                     AS n_docs,
       CAST(SUM(g.n_chars) AS BIGINT) AS sum_chars
FROM picked p JOIN gatedsrc g USING (doc_id)
GROUP BY 1, 2
ORDER BY 1, 2
"""


PIPELINE_QUERIES = {
    "q_corpus_pipeline": q_corpus_pipeline,
    "q_corpus_pipeline_v2": q_corpus_pipeline_v2,
    "q_corpus_pipeline_v3": q_corpus_pipeline_v3,
}
PIPELINE_ORACLES = {
    "q_corpus_pipeline": Q_CORPUS_PIPELINE_SQL,
    "q_corpus_pipeline_v2": Q_CORPUS_PIPELINE_V2_SQL,
    "q_corpus_pipeline_v3": Q_CORPUS_PIPELINE_V3_SQL,
}
