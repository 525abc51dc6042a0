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


PIPELINE_QUERIES = {"q_corpus_pipeline": q_corpus_pipeline}
PIPELINE_ORACLES = {"q_corpus_pipeline": Q_CORPUS_PIPELINE_SQL}
