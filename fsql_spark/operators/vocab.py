"""Vocabulary / term-statistics operators: term frequencies, document
frequencies, TF-IDF — the corpus-statistics layer a tokenizer-training or
relevance-weighting pipeline needs.

Scale shape (the whole point at 100 TB):

- :func:`term_frequencies` is **map-only** — each document's (token, tf)
  pairs are computed row-locally inside one Arrow batch, so the corpus never
  shuffles to count terms. A naive ``explode + groupBy(doc, token)`` pays a
  full exchange of the token stream for keys that never span partitions;
  this emits the already-aggregated pairs with zero shuffle.
- :func:`vocabulary` is the single unavoidable shuffle: a token-keyed
  aggregate over the distinct (doc, token) pairs, map-side combinable.
- :func:`tf_idf` joins the pairs against the vocabulary. The vocabulary is
  corpus-level metadata (≪ corpus size after a ``min_df`` cut), so it
  broadcasts; the pair stream itself never shuffles.

No reference counterpart (the reference delegates row-level compute,
`/root/reference/src/fsql/deser.py:30-31`); driver-mandated extension
surface (SURVEY §2.6).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType


def term_frequencies(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    token_col: str = "token",
    tf_col: str = "tf",
) -> DataFrame:
    """Distinct (id, token, tf) per document, whitespace tokens, empties
    dropped. Map-only: counting happens inside the Arrow batch (the tokens
    of one document are row-local by construction), so there is NO shuffle —
    unlike explode+groupBy, which exchanges the full token stream."""
    # NOT spread (r14 A/B): the tokenize+count kernel on a one-task
    # single-file corpus costs LESS than the round-robin shuffle that
    # would parallelize it (0.66 s vs 1.22 s warm at sf0.1) — the tf
    # stream is consumed by aggregates that shuffle anyway, and a real
    # many-file corpus already arrives parallel.
    src = df.select(id_col, text_col)
    schema = StructType(
        [src.schema[id_col], StructField(token_col, StringType()), StructField(tf_col, LongType())]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            texts = pdf[text_col].fillna("")
            flat: list[str] = []
            counts = np.empty(len(pdf), np.int64)
            for j, t in enumerate(texts):
                toks = [x for x in t.split(" ") if x]
                counts[j] = len(toks)
                flat.extend(toks)
            pairs = pd.DataFrame(
                {
                    id_col: np.repeat(pdf[id_col].to_numpy(), counts),
                    token_col: flat,
                }
            )
            agg = (
                pairs.groupby([id_col, token_col], sort=False)
                .size()
                .rename(tf_col)
                .reset_index()
            )
            yield agg

    return src.mapInPandas(run, schema=schema)


def vocabulary(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_df: int = 1,
) -> DataFrame:
    """(token, doc_freq, total_tf) over the corpus — the vocab-building
    aggregate. One token-keyed shuffle; the map side already carries one row
    per (doc, token), so partial aggregation collapses everything local
    before the exchange. ``min_df`` applies the standard rare-token cut."""
    tf = term_frequencies(df, id_col, text_col)
    vocab = tf.groupBy("token").agg(
        F.count(F.lit(1)).alias("doc_freq"),  # tf rows are distinct per (doc, token)
        F.sum("tf").alias("total_tf"),
    )
    if min_df > 1:
        vocab = vocab.where(F.col("doc_freq") >= min_df)
    return vocab


def tf_idf(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_df: int = 1,
    n_docs: int | None = None,
    broadcast_vocab: bool = True,
) -> DataFrame:
    """(id, token, tf, doc_freq, tfidf) with the smoothed sklearn-style
    weight ``tfidf = tf * (ln((1 + N) / (1 + df)) + 1)``.

    The term-frequency stream is computed ONCE and persisted (the vocabulary
    aggregate and the final join both consume it — without the persist, the
    self-referencing plan re-tokenizes the corpus twice). The vocabulary side
    broadcasts by default: after a ``min_df`` cut it is corpus metadata, not
    corpus data; pass ``broadcast_vocab=False`` for a pathological vocabulary
    that genuinely exceeds executor memory (then it's a shuffle join on
    token). ``n_docs`` skips the extra count job when the caller knows N."""
    tf = term_frequencies(df, id_col, text_col).persist()
    if n_docs is None:
        n_docs = df.count()  # one metadata-cheap count job, driver-side scalar
    vocab = tf.groupBy("token").agg(F.count(F.lit(1)).alias("doc_freq"))
    if min_df > 1:
        vocab = vocab.where(F.col("doc_freq") >= min_df)
    if broadcast_vocab:
        vocab = F.broadcast(vocab)
    idf = F.log((1.0 + F.lit(float(n_docs))) / (1.0 + F.col("doc_freq"))) + 1.0
    return tf.join(vocab, "token").select(
        id_col, "token", "tf", "doc_freq", (F.col("tf") * idf).alias("tfidf")
    )


def _deletion_signatures_expr(token_col: str, max_distance: int) -> str:
    """SQL expression (array<string>) for the <=d-deletion neighborhood of
    ``token_col``: every string reachable by deleting up to ``max_distance``
    characters, the token itself included. Built by applying a one-deletion
    higher-order transform d times and concatenating the layers — pure
    Catalyst expressions, no Python in the hot path."""

    def del1(arr: str) -> str:
        # each string in `arr` -> all strings with exactly one char removed
        # (greatest(.,1) guards length-0 strings: sequence(1,0) in Spark
        # would DESCEND to [1,0], not return empty)
        return (
            f"flatten(transform({arr}, s -> transform("
            f"sequence(1, greatest(length(s), 1)), "
            f"i -> concat(substring(s, 1, i-1), substring(s, i+1)))))"
        )

    layers = f"array({token_col})"
    cur = f"array({token_col})"
    for _ in range(max_distance):
        cur = f"array_distinct({del1(cur)})"
        layers = f"concat({layers}, {cur})"
    return f"array_distinct({layers})"


def vocab_edit_distance_pairs(
    df: DataFrame,
    text_col: str = "text",
    max_distance: int = 1,
) -> DataFrame:
    """Token pairs from the corpus VOCABULARY within Levenshtein distance
    ``max_distance`` — the spell-correction / OCR-noise join:
    (token_a, token_b, dist), canonically ordered (shorter first; lex on
    ties), each unordered pair exactly once.

    Blocking is the DELETION NEIGHBORHOOD (FastSS, Bocek et al. 2007):
    every token emits each string reachable by deleting up to d characters
    as a join key. Sound for ARBITRARY d — an edit script of length <= d
    deletes <= d characters from each side to reach a common string, so
    lev(a,b) <= d guarantees the two neighborhoods intersect. Candidates
    equi-join on the shared variant (no BETWEEN, so no nested-loop join),
    dedupe to distinct pairs, and exact ``levenshtein`` verifies — the
    signature join is a complete-but-not-exact candidate generator.

    Scale shape: this runs over the DISTINCT vocabulary (zipf-bounded
    metadata, not corpus data). Each length-L token emits O(L^d) variants
    — for d=2 a 20-char token emits ~200 — but candidates are pairs that
    genuinely share a variant, NOT the quadratic same-length-band blowup
    the previous length-pigeonhole blocking paid: a 100M-token vocabulary
    with a million 8-char tokens would band-join 10^12 candidate pairs,
    while deletion signatures only collide tokens that are actually close
    (plus hash-bounded accidents). A cheap length pigeonhole
    (|len(a)-len(b)| <= d) prunes before the pair-dedup shuffle."""
    if max_distance < 1:
        raise ValueError(f"max_distance must be >= 1, got {max_distance}")
    toks = (
        df.select(F.explode(F.split(F.col(text_col), " ")).alias("token"))
        .where(F.col("token") != "")
        .distinct()
    )
    sig = _deletion_signatures_expr("token", max_distance)
    a = toks.select(
        "token",
        F.length("token").alias("l"),
        F.explode(F.expr(sig)).alias("sig"),
    )
    b = a.select(
        F.col("token").alias("token_b"), F.col("l").alias("lb"), "sig"
    )
    cand = (
        a.join(b, "sig")
        .where(
            (F.col("l") < F.col("lb"))
            | ((F.col("l") == F.col("lb")) & (F.col("token") < F.col("token_b")))
        )
        .where(F.col("lb") - F.col("l") <= max_distance)
        .select(F.col("token").alias("token_a"), "token_b")
        .distinct()
    )
    return cand.select(
        "token_a",
        "token_b",
        F.levenshtein("token_a", "token_b").cast("int").alias("dist"),
    ).where(F.col("dist") <= max_distance)


# --------------------------------------------------------------------------
# catalog entries + oracles
# --------------------------------------------------------------------------

def q_vocab_top_tokens(spark: SparkSession, sf: str) -> DataFrame:
    """Top-20 corpus tokens by total term frequency (vocab building)."""
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    return (
        vocabulary(docs, "doc_id", "text")
        .orderBy(F.desc("total_tf"), "token")
        .limit(20)
    )


Q_VOCAB_TOP_TOKENS_SQL = """
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
)
SELECT token,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS doc_freq,
       CAST(COUNT(*) AS BIGINT)               AS total_tf
FROM toks
WHERE token <> ''
GROUP BY token
ORDER BY total_tf DESC, token
LIMIT 20
"""


def q_tfidf_terms(spark: SparkSession, sf: str) -> DataFrame:
    """Top-3 TF-IDF terms per document for the 20 lowest doc_ids (corpus-wide
    df/N; deterministic tie-break on token)."""
    from pyspark.sql import Window

    docs = spark.read.parquet(f"{sf}/documents.parquet")
    scored = tf_idf(docs, "doc_id", "text")
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), "token")
    return (
        scored.where(F.col("doc_id") < 20)
        .withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= 3)
        .select(
            "doc_id", "token", "tf", "doc_freq",
            F.round("tfidf", 4).alias("tfidf"), "rnk",
        )
    )


Q_TFIDF_TERMS_SQL = """
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
),
filtered AS (SELECT doc_id, token FROM toks WHERE token <> ''),
tf AS (
  SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf
  FROM filtered GROUP BY doc_id, token
),
vocab AS (
  SELECT token, CAST(COUNT(*) AS BIGINT) AS doc_freq
  FROM tf GROUP BY token
),
n AS (SELECT COUNT(*) AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.token, tf.tf, vocab.doc_freq,
         tf.tf * (LN((1.0 + n.n_docs) / (1.0 + vocab.doc_freq)) + 1.0) AS tfidf
  FROM tf JOIN vocab USING (token) CROSS JOIN n
),
ranked AS (
  -- rank on the UNROUNDED weight (like the Spark side), round for output only
  SELECT doc_id, token, tf, doc_freq, tfidf,
         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, token) AS rnk
  FROM scored
  WHERE doc_id < 20
)
SELECT doc_id, token, tf, doc_freq, ROUND(tfidf, 4) AS tfidf, rnk
FROM ranked WHERE rnk <= 3
"""


def q_vocab_edit_pairs(spark: SparkSession, sf: str) -> DataFrame:
    """Vocabulary tokens within edit distance 2 of each other — the
    spell-correction/OCR-noise audit over the corpus vocabulary (FastSS
    deletion-neighborhood blocking + exact levenshtein verify). d=2 because the
    driver corpus's vocabulary is clean by construction (d=1 matches
    nothing — a real OCR corpus would use 1)."""
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    return vocab_edit_distance_pairs(docs, "text", max_distance=2)


Q_VOCAB_EDIT_PAIRS_SQL = """
WITH vocab AS (
  SELECT DISTINCT t AS token
  FROM (SELECT unnest(string_split(text, ' ')) AS t FROM documents)
  WHERE t <> ''
),
a AS (SELECT token, LENGTH(token) AS l FROM vocab),
banded AS (SELECT token, l, l + u.k AS band FROM a, unnest([0, 1, 2]) AS u(k)),
pairs AS (
  SELECT ab.token AS token_a, b.token AS token_b,
         levenshtein(ab.token, b.token) AS dist
  FROM banded ab JOIN a b ON ab.band = b.l
  WHERE ab.l < b.l OR (ab.l = b.l AND ab.token < b.token)
)
SELECT token_a, token_b, CAST(dist AS INTEGER) AS dist
FROM pairs WHERE dist <= 2
"""


def pmi_collocations(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_count: int = 10,
) -> DataFrame:
    """Pointwise mutual information of adjacent token pairs ->
    (token_a, token_b, n_ab, pmi) for pairs seen >= ``min_count`` times —
    the classic collocation statistic (Church & Hanks 1990): phrases whose
    co-occurrence beats the independence baseline ("new york", "machine
    learning") float to the top, which feeds phrase-aware tokenizers and
    multi-word-expression vocabularies.

    ``pmi = ln( (n_ab / N_bigrams) / ((n_a / N_tokens) * (n_b / N_tokens)) )``
    with the exact expression order mirrored in the SQL oracle. Pair
    extraction is JVM-side (a transform over the token index range — the
    _word_shingles technique, no UDF); the two count aggregates are
    map-side combinable and PERSISTED (the scalar-total actions and the
    final join all consume them — without the persist the corpus would be
    re-tokenized once per action, the tf_idf lesson at vocab.py:115); the
    totals then come back from tiny aggregate-over-persisted actions and
    re-enter the plan as literals. ``min_count`` applies the standard
    low-frequency cut (PMI is notoriously noisy on rare pairs)."""
    from .dedup import _spread

    words = F.filter(F.split(F.col(text_col), " "), lambda x: x != F.lit(""))
    # spread before the pair explosion (single-file corpora arrive at scan
    # parallelism — the whole bigram count would run in one task otherwise)
    base = _spread(df.select(words.alias("ws")))
    n = F.size("ws")
    # sequence(1, 0) would be a DESCENDING [1, 0] (the _word_shingles
    # lesson), so short docs short-circuit to an empty pair array
    bi = F.when(n >= 2, F.transform(
        F.sequence(F.lit(1), n - 1),
        lambda i: F.struct(
            F.element_at("ws", i).alias("a"),
            F.element_at("ws", (i + 1).cast("int")).alias("b"),
        ),
    )).otherwise(F.array().cast("array<struct<a:string,b:string>>"))
    pairs = base.select(F.explode(bi).alias("p")).select("p.a", "p.b")
    big = pairs.groupBy("a", "b").agg(F.count(F.lit(1)).alias("n_ab")).persist()
    uni = (
        base.select(F.explode("ws").alias("t"))
        .groupBy("t")
        .agg(F.count(F.lit(1)).alias("n_t"))
        .persist()
    )
    totals = big.agg(F.sum("n_ab")).collect()[0][0] or 0
    nu = uni.agg(F.sum("n_t")).collect()[0][0] or 0
    ua = uni.select(F.col("t").alias("a"), F.col("n_t").alias("n_a"))
    ub = uni.select(F.col("t").alias("b"), F.col("n_t").alias("n_b"))
    pmi = F.log(
        (F.col("n_ab") * 1.0 / F.lit(float(totals)))
        / (
            (F.col("n_a") * 1.0 / F.lit(float(nu)))
            * (F.col("n_b") * 1.0 / F.lit(float(nu)))
        )
    )
    return (
        big.where(F.col("n_ab") >= min_count)
        .join(ua, "a")
        .join(ub, "b")
        .select(
            F.col("a").alias("token_a"),
            F.col("b").alias("token_b"),
            "n_ab",
            pmi.alias("pmi"),
        )
    )


_PMI_MIN_COUNT = 10
_PMI_TOP = 20


def q_pmi_collocations(spark: SparkSession, sf: str) -> DataFrame:
    """Top-20 PMI collocations of the corpus (pairs seen >= 10 times,
    ranked on the unrounded statistic, reported 4dp) — the
    phrase-discovery report."""
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    out = pmi_collocations(docs, "doc_id", "text", min_count=_PMI_MIN_COUNT)
    return (
        out.orderBy(F.desc("pmi"), "token_a", "token_b")
        .limit(_PMI_TOP)
        .select("token_a", "token_b", "n_ab", F.round("pmi", 4).alias("pmi"))
    )


Q_PMI_SQL = f"""
WITH toksl AS (
  SELECT list_filter(string_split(text, ' '), x -> x <> '') AS ts FROM documents
),
pairs AS (
  SELECT ts[CAST(s.i AS INTEGER)] AS a, ts[CAST(s.i + 1 AS INTEGER)] AS b
  FROM toksl, unnest(generate_series(1, len(ts) - 1)) AS s(i)
  WHERE len(ts) >= 2
),
big AS (SELECT a, b, CAST(COUNT(*) AS BIGINT) AS n_ab FROM pairs GROUP BY a, b),
uni AS (
  SELECT t, CAST(COUNT(*) AS BIGINT) AS n_t
  FROM (SELECT unnest(ts) AS t FROM toksl) GROUP BY t
),
nb AS (SELECT CAST(SUM(n_ab) AS DOUBLE) AS v FROM big),
nu AS (SELECT CAST(SUM(n_t) AS DOUBLE) AS v FROM uni),
scored AS (
  SELECT big.a, big.b, big.n_ab,
         LN((big.n_ab * 1.0 / (SELECT v FROM nb))
            / ((ua.n_t * 1.0 / (SELECT v FROM nu))
               * (ub.n_t * 1.0 / (SELECT v FROM nu)))) AS pmi
  FROM big
  JOIN uni ua ON big.a = ua.t
  JOIN uni ub ON big.b = ub.t
  WHERE big.n_ab >= {_PMI_MIN_COUNT}
)
SELECT a AS token_a, b AS token_b, n_ab, ROUND(pmi, 4) AS pmi
FROM scored
ORDER BY pmi DESC, token_a, token_b
LIMIT {_PMI_TOP}
"""


VOCAB_QUERIES = {
    "q_vocab_top_tokens": q_vocab_top_tokens,
    "q_tfidf_terms": q_tfidf_terms,
    "q_vocab_edit_pairs": q_vocab_edit_pairs,
    "q_pmi_collocations": q_pmi_collocations,
}

VOCAB_ORACLES = {
    "q_vocab_top_tokens": Q_VOCAB_TOP_TOKENS_SQL,
    "q_tfidf_terms": Q_TFIDF_TERMS_SQL,
    "q_vocab_edit_pairs": Q_VOCAB_EDIT_PAIRS_SQL,
    "q_pmi_collocations": Q_PMI_SQL,
}
