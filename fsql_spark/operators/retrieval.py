"""BM25 relevance scoring over the documents corpus.

A training-data pipeline ranks candidate documents against fixed probe
queries constantly — retrieval-based quality filtering, decontamination
triage ("which corpus docs look like eval questions"), and targeted
sampling all reduce to a sparse-term relevance score at corpus scale.
This module computes Okapi BM25 with the classic k1/b parameterization,
Spark-first:

- **No explode for term frequencies.** ``tf`` per query term comes from
  ``F.size(F.filter(F.split(text), x == term))`` — JVM higher-order
  functions inside whole-stage codegen, one pass over each row's token
  array, zero shuffle. Exploding a 100 TB corpus to (doc, token) rows
  just to count a 3-term query would shuffle everything; filtering
  per-row arrays touches nothing.
- **Corpus stats stay tiny.** N (docs) and total token count aggregate
  to ONE bounded driver row inlined as literals (the Q2/Q11 scalar
  idiom); document frequency per query term is a |terms|-row broadcast.
  Nothing about the query scales with the corpus.
- **Determinism contract with the SQL oracle**: ``avgdl`` is formed as
  ``CAST(total_tokens AS DOUBLE) / n_docs`` (integer sums first, ONE
  float division) and the score expression is written in the identical
  operation order on both engines, so doubles agree bit-for-bit and
  ``ROUND(..., 4)`` hashes identically.

The per-(doc, term) output deliberately skips a cross-term SUM: float
addition order across terms is partition-dependent in a groupBy, which
would make the last digit nondeterministic. Callers who want one score
per doc sum the (already rounded) per-term scores.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def bm25_scores(
    docs: DataFrame,
    query_terms: Sequence[str],
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
    corpus_stats: tuple[int, int] | None = None,
) -> DataFrame:
    """Per-(doc, term) Okapi BM25 scores for a fixed bag of query terms.

    EAGER, unlike the rest of this package: unless ``corpus_stats`` is
    given, construction runs one Spark job over ``docs`` to collect the
    two corpus scalars (N docs, total tokens) that inline as literals —
    so calling this on an expensive upstream triggers a full corpus scan
    NOW and a second at action time. Pass ``corpus_stats=(n_docs,
    total_tokens)`` (computed once, reused across queries — the shape a
    100 TB retrieval service uses anyway) to keep construction lazy.

    Returns (id_col, term, tf, score_bm25) for every document containing
    the term. ``idf`` uses the standard +1 smoothing
    ``ln((N - df + 0.5) / (df + 0.5) + 1)`` so scores stay positive even
    for terms in most documents.
    """
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    if len(set(query_terms)) != len(query_terms):
        raise ValueError("query_terms must be distinct")

    toks = F.filter(F.split(F.col(text_col), " "), lambda x: x != F.lit(""))

    def _tf(term: str):
        # a one-arg lambda per term: F.filter treats TWO-arg lambdas as
        # (element, index), which would compare tokens to positions
        return F.size(F.filter(toks, lambda x: x == F.lit(term)))

    per_doc = docs.select(
        id_col,
        F.size(toks).alias("dl"),
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(t).alias("term"), _tf(t).alias("tf"))
                    for t in query_terms
                ]
            )
        ).alias("s"),
    ).select(id_col, "dl", F.col("s.term").alias("term"), F.col("s.tf").alias("tf"))

    matched = per_doc.where(F.col("tf") > 0)

    # the two corpus scalars (N docs, total tokens) collect to the driver
    # as ONE bounded row and inline as literals — the Q2/Q11 idiom. The
    # join alternatives both fail the plan shape: a broadcast cross join
    # is a BroadcastNestedLoopJoin (lint-forbidden), and a constant-key
    # equi-join folds back into one; a global window would single-reduce
    # the corpus.
    if corpus_stats is not None:
        n_docs, total_tokens = corpus_stats
    else:
        n_docs, total_tokens = (
            docs.select(F.size(toks).alias("dl"))
            .agg(F.count(F.lit(1)), F.sum("dl").cast("long"))
            .first()
        )
    df_per_term = matched.groupBy("term").agg(F.count(F.lit(1)).alias("df"))

    avgdl = F.lit(total_tokens).cast("double") / F.lit(n_docs)
    idf = F.log(
        (F.lit(n_docs) - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
        + F.lit(1.0)
    )
    score = idf * (
        F.col("tf") * (F.lit(k1) + F.lit(1.0))
    ) / (
        F.col("tf") + F.lit(k1) * (F.lit(1.0) - F.lit(b) + F.lit(b) * F.col("dl") / avgdl)
    )
    return (
        matched.join(F.broadcast(df_per_term), "term")
        .select(
            id_col,
            "term",
            "tf",
            F.round(score, 4).alias("score_bm25"),
        )
    )


def q_doc_bm25(spark: SparkSession, sf: str) -> DataFrame:
    """BM25 relevance of every document against the fixed probe query
    {hash, vector, stream} — per-(doc, term) scores, k1=1.2 b=0.75. The
    oracle replays the exact arithmetic (integer tf/dl/df/N, one double
    division for avgdl, identical operation order) so the hash pins the
    whole scoring pipeline, not just row counts."""
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    return bm25_scores(docs, ["hash", "vector", "stream"], k1=1.2, b=0.75)


Q_DOC_BM25_SQL = r"""
WITH per_doc AS (
  SELECT doc_id,
         len(list_filter(string_split(text, ' '), x -> x <> '')) AS dl,
         t.term,
         len(list_filter(string_split(text, ' '), x -> x = t.term)) AS tf
  FROM documents, unnest(['hash', 'vector', 'stream']) AS t(term)
),
matched AS (
  SELECT * FROM per_doc WHERE tf > 0
),
stats AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(dl) AS BIGINT)  AS total_tokens
  FROM (SELECT len(list_filter(string_split(text, ' '), x -> x <> '')) AS dl
        FROM documents)
),
df_per_term AS (
  SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM matched GROUP BY term
)
SELECT m.doc_id,
       m.term,
       m.tf,
       ROUND(
         ln((s.n_docs - d.df + 0.5) / (d.df + 0.5) + 1.0)
         * (m.tf * (1.2 + 1.0))
         / (m.tf + 1.2 * (1.0 - 0.75 + 0.75 * m.dl / (CAST(s.total_tokens AS DOUBLE) / s.n_docs))),
         4) AS score_bm25
FROM matched m
JOIN df_per_term d ON d.term = m.term
CROSS JOIN stats s
"""


RETRIEVAL_QUERIES = {
    "q_doc_bm25": q_doc_bm25,
}

RETRIEVAL_ORACLES = {
    "q_doc_bm25": Q_DOC_BM25_SQL,
}
