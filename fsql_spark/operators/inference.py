"""Distributed model-inference plumbing: batch scoring + text embeddings.

The pattern every 100 TB training-data pipeline needs: run a model over a
corpus WITHOUT shipping rows to the driver or re-loading the model per row.

- :func:`score_with_model` — ``mapInPandas`` batch scorer. The model factory
  runs ONCE per Python worker (process-global cache keyed by factory), each
  Arrow batch is scored vectorized, and the corpus never shuffles — a pure
  map. Real heavyweight models (torch/onnx) aren't in this container, so the
  shipped :func:`fake_quality_model` is a deterministic arithmetic stand-in —
  which makes the catalog entry fully DuckDB-oracle-able while the plumbing
  (lazy per-worker init, Arrow batching, schema contract) is exactly what a
  real model uses. Swap the factory for a real loader in production.
- :func:`hashed_embedding` — feature-hashing bag-of-words embedding
  (HashingTF-style): token -> FNV-hash -> dimension, counts, L2-normalize.
  Not a stub: a real, deterministic, linear-scan embedding that feeds the
  ANN operators (``lsh_ann_pairs`` / ``ivf_ann_topk``), closing the
  text -> embedding -> similarity loop inside the engine.

No reference counterpart (the reference delegates row-level compute,
`/root/reference/src/fsql/deser.py:30-31`); driver-mandated extension surface
(SURVEY §2.6).
"""

from __future__ import annotations

from typing import Callable, Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, DoubleType, FloatType, StructField, StructType

#: per-worker model cache: factory id -> loaded model. Lives in the Python
#: WORKER process (populated inside mapInPandas), so each executor loads the
#: model once, not once per batch or per row.
_MODEL_CACHE: dict[int, object] = {}


def fake_quality_model() -> Callable[[pd.Series], pd.Series]:
    """Deterministic stand-in for a quality classifier: a logistic over two
    cheap text features. Pure arithmetic => byte-for-byte reproducible and
    SQL-expressible, so the oracle can verify the whole plumbing end-to-end."""

    def predict(texts: pd.Series) -> pd.Series:
        s = texts.fillna("")
        n_chars = s.str.len().to_numpy(np.float64)
        n_spaces = s.str.count(" ").to_numpy(np.float64)
        # distinct-ish word-length signal without tokenizing: avg token len
        avg_tok = (n_chars - n_spaces) / (n_spaces + 1.0)
        z = 0.004 * n_chars - 0.35 * np.abs(avg_tok - 5.0)
        # ALGEBRAIC sigmoid, not exp(): libm exp differs by ULPs between
        # numpy and DuckDB, which flips 6-dp rounding on boundary values —
        # rational arithmetic is bit-identical across engines
        return pd.Series(np.round(0.5 + 0.5 * z / (1.0 + np.abs(z)), 6))

    return predict


def score_with_model(
    df: DataFrame,
    text_col: str,
    model_factory: Callable[[], Callable[[pd.Series], pd.Series]] = fake_quality_model,
    score_col: str = "model_score",
) -> DataFrame:
    """Append a model score per row: mapInPandas, vectorized per Arrow batch,
    model loaded once per worker process (factory cached). Map-only — at
    100 TB this runs as a plain scan with Python workers pinned warm."""
    # NOT df.schema.add(...): StructType.add mutates the DataFrame's cached
    # schema object in place, corrupting df.columns for later operations
    out_schema = StructType(df.schema.fields + [StructField(score_col, DoubleType())])
    key = id(model_factory)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        model = _MODEL_CACHE.get(key)
        if model is None:
            model = _MODEL_CACHE.setdefault(key, model_factory())
        for pdf in batches:
            pdf = pdf.copy()
            pdf[score_col] = model(pdf[text_col]).astype(float).to_numpy()
            yield pdf

    return df.mapInPandas(run, schema=out_schema)


def hashed_embedding(
    df: DataFrame,
    text_col: str,
    dims: int = 64,
    embedding_col: str = "embedding",
) -> DataFrame:
    """Feature-hashing bag-of-words embedding: each token FNV-hashes to one
    of ``dims`` buckets (sign from a second hash bit, the standard
    collision-debiasing trick), counts accumulate, vector L2-normalizes.
    One vectorized Arrow pass, no shuffle, deterministic everywhere —
    the cheap embedding that makes near-dup/ANN work text-native."""
    from ._hashing import fnv1a64

    out_schema = StructType(df.schema.fields + [StructField(embedding_col, ArrayType(FloatType()))])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            vecs = np.zeros((len(pdf), dims), np.float64)
            texts = pdf[text_col].fillna("")
            flat: list[str] = []
            counts = np.empty(len(pdf), np.int64)
            for j, t in enumerate(texts):
                toks = t.split(" ") if t else []
                counts[j] = len(toks)
                flat.extend(toks)
            if flat:
                h = fnv1a64(flat)
                bucket = (h % np.uint64(dims)).astype(np.int64)
                sign = np.where((h >> np.uint64(32)) & np.uint64(1), 1.0, -1.0)
                row = np.repeat(np.arange(len(pdf)), counts)
                np.add.at(vecs, (row, bucket), sign)
            norms = np.linalg.norm(vecs, axis=1)
            norms[norms == 0] = 1.0
            vecs = (vecs / norms[:, None]).astype(np.float32)
            pdf[embedding_col] = list(vecs)
            yield pdf

    return df.mapInPandas(run, schema=out_schema)


# --------------------------------------------------------------------------
# catalog entries + oracles
# --------------------------------------------------------------------------

def q_model_scores(spark: SparkSession, sf: str) -> DataFrame:
    """Batch model inference over documents: per-(lang) score stats. The
    deterministic arithmetic model makes the mapInPandas plumbing fully
    oracle-checkable."""
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    scored = score_with_model(docs, "text")
    return scored.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("model_score"), 4).alias("avg_score"),
        F.round(F.min("model_score"), 6).alias("min_score"),
        F.round(F.max("model_score"), 6).alias("max_score"),
    )


Q_MODEL_SCORES_SQL = """
WITH feats AS (
  SELECT lang,
         CAST(LENGTH(text) AS DOUBLE) AS n_chars,
         CAST(LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) AS DOUBLE) AS n_spaces
  FROM documents
),
z AS (
  SELECT lang,
         0.004 * n_chars - 0.35 * ABS((n_chars - n_spaces) / (n_spaces + 1.0) - 5.0) AS z
  FROM feats
),
scored AS (
  SELECT lang, ROUND(0.5 + 0.5 * z / (1.0 + ABS(z)), 6) AS model_score FROM z
)
SELECT lang,
       COUNT(*)                     AS n_docs,
       ROUND(AVG(model_score), 4)   AS avg_score,
       ROUND(MIN(model_score), 6)   AS min_score,
       ROUND(MAX(model_score), 6)   AS max_score
FROM scored
GROUP BY lang
"""


def q_text_embed_knn(spark: SparkSession, sf: str) -> DataFrame:
    """Text-native similarity: hash-embed the documents, then brute-force
    top-3 neighbors (rounded-cosine ranking) for the 10 lowest doc_ids.

    Oracle: a FULL DuckDB replica of the pipeline — FNV-1a(64) is folded
    over each token's code points with ``list_reduce`` + HUGEINT mod-2^64
    arithmetic (bit-identical to the numpy kernel; tokens are ASCII so code
    point == UTF-8 byte, which the oracle's regex guard enforces), buckets/
    signs/L2-normalize/float32-cast mirror ``hashed_embedding``, and ranking
    compares the same 4dp-rounded cosine on both engines."""
    from .similarity import brute_force_topk

    docs = spark.read.parquet(f"{sf}/documents.parquet")
    emb = hashed_embedding(docs.select("doc_id", "text"), "text").select("doc_id", "embedding")
    queries = emb.where(F.col("doc_id") < 10)
    return brute_force_topk(emb, queries, "doc_id", "embedding", k=3, rounded=True)


# FNV-1a(64) over token code points, exactly the kernel's fold: h starts at
# the offset basis and folds h = ((h XOR byte) * prime) mod 2^64 per byte —
# UBIGINT keeps unsigned semantics, the multiply routes through HUGEINT for
# the wraparound. sign/bucket/normalize/REAL-cast mirror hashed_embedding;
# the second normalization + rounded ranking mirror brute_force_topk.
Q_TEXT_EMBED_KNN_SQL = """
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok
  FROM documents WHERE text IS NOT NULL AND text != ''
),
hashed AS (
  SELECT doc_id,
         list_reduce(
           list_prepend(CAST('14695981039346656037' AS UBIGINT),
                        [CAST(unicode(tok[i]) AS UBIGINT) FOR i IN range(1, length(tok) + 1)]),
           (h, b) -> CAST((CAST(xor(h, b) AS HUGEINT) * 1099511628211)
                          % CAST('18446744073709551616' AS HUGEINT) AS UBIGINT)
         ) AS h
  FROM toks
),
w AS (
  SELECT doc_id, CAST(h % 64 AS INTEGER) AS bucket,
         SUM(CASE WHEN ((h >> 32) & 1) = 1 THEN 1.0 ELSE -1.0 END) AS wt
  FROM hashed GROUP BY 1, 2
),
n1 AS (SELECT doc_id, sqrt(SUM(wt * wt)) AS nrm FROM w GROUP BY doc_id),
f32 AS (
  SELECT w.doc_id, bucket,
         CAST(CAST(wt / (CASE WHEN nrm = 0 THEN 1.0 ELSE nrm END) AS REAL) AS DOUBLE) AS v
  FROM w JOIN n1 USING (doc_id)
),
n2 AS (SELECT doc_id, sqrt(SUM(v * v)) AS nrm2 FROM f32 GROUP BY doc_id),
dots AS (
  SELECT q.doc_id AS query_id, c.doc_id AS neighbor_id, SUM(q.v * c.v) AS d
  FROM f32 q JOIN f32 c ON q.bucket = c.bucket AND c.doc_id != q.doc_id
  WHERE q.doc_id < 10
  GROUP BY 1, 2
),
ranked AS (
  SELECT query_id, neighbor_id,
         CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                 ORDER BY ROUND(d / (a.nrm2 * b.nrm2), 4) DESC, neighbor_id ASC) AS INTEGER) AS rank,
         ROUND(d / (a.nrm2 * b.nrm2), 4) AS cos
  FROM dots
  JOIN n2 a ON query_id = a.doc_id
  JOIN n2 b ON neighbor_id = b.doc_id
)
SELECT query_id, neighbor_id, rank, cos FROM ranked WHERE rank <= 3
"""


INFERENCE_QUERIES = {
    "q_model_scores": q_model_scores,
    "q_text_embed_knn": q_text_embed_knn,
}

INFERENCE_ORACLES = {
    "q_model_scores": Q_MODEL_SCORES_SQL,
    "q_text_embed_knn": Q_TEXT_EMBED_KNN_SQL,
}
