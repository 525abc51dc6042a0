"""Benchmark decontamination + repetition quality signals.

Two pre-training hygiene operators every large corpus pipeline runs:

- :func:`contamination_check` — flag corpus documents sharing any word
  n-gram with a benchmark/eval set (train-test leakage). Scale shape: the
  BENCHMARK side is small by nature (eval sets are KB-MB), so its distinct
  n-gram set broadcasts and the corpus side is a map-only explode + broadcast
  semi/inner join — no corpus shuffle, no all-pairs anything. The corpus is
  never collected or self-joined.
- :func:`repetition_score` — fraction of repeated tokens per document
  (1 - distinct/total), the cheapest of the Gopher-style repetition filters;
  pure JVM array expressions, zero shuffle.

No reference counterpart (the reference delegates row-level compute,
`/root/reference/src/fsql/deser.py:30-31`); driver-mandated extension surface
(SURVEY §2.6). Both have exact DuckDB twins for the oracle gate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

def _gram_structs(text: Column, ngram: int) -> Column:
    """Word n-grams as struct tuples via arrays_zip of shifted slices — no
    per-element lambda (HOF lambdas run interpreted, measured 3x slower) and
    collision-proof identity without a joiner. Struct equality joins and
    deduplicates exactly like the string form."""
    words = F.split(text, " ")
    if ngram == 1:
        return words
    k = F.size(words) - (ngram - 1)
    return F.arrays_zip(
        *[F.slice(words, i + 1, F.greatest(k, F.lit(0))) for i in range(ngram)]
    )


def benchmark_grams(
    benchmark: DataFrame, benchmark_text: str, ngram: int = 5
) -> DataFrame:
    """The DISTINCT benchmark gram relation — the broadcast side of every
    check here, exposed so the stateless crawl-ingest scorer
    (:func:`contamination_score_stateless`) ships EXACTLY the set the
    batch joins use (one definition of the gram identity; a tokenization
    change cannot drift between batch and stream). ``array_distinct``
    BEFORE explode: per-doc duplicate grams never enter the exploded
    relation."""
    return benchmark.select(
        F.explode(
            F.array_distinct(_gram_structs(F.col(benchmark_text), ngram))
        ).alias("g")
    ).distinct()


def contamination_check(
    corpus: DataFrame,
    benchmark: DataFrame,
    corpus_key: str,
    corpus_text: str,
    benchmark_text: str,
    ngram: int = 5,
) -> DataFrame:
    """(key, n_hits) for corpus docs sharing >= 1 word ``ngram``-gram with any
    benchmark document; n_hits = how many DISTINCT contaminated n-grams.

    Real pipelines use 8-13-grams; the knob is ``ngram``. Drop flagged docs
    with an anti-join on the result."""
    bench_grams = benchmark_grams(benchmark, benchmark_text, ngram)
    corpus_grams = corpus.select(
        F.col(corpus_key).alias("k"),
        F.explode(F.array_distinct(_gram_structs(F.col(corpus_text), ngram))).alias("g"),
    )
    return (
        corpus_grams.join(F.broadcast(bench_grams), "g")
        .groupBy("k")
        .agg(F.countDistinct("g").alias("n_hits"))
        .select(F.col("k").alias(corpus_key), "n_hits")
    )


def contamination_fraction(
    corpus: DataFrame,
    benchmark: DataFrame,
    corpus_key: str,
    corpus_text: str,
    benchmark_text: str,
    ngram: int = 5,
    threshold: float = 0.5,
) -> DataFrame:
    """The overlap-DECISION score real decontamination pipelines act on
    (the GPT-3/PaLM appendix recipe): per corpus doc, the fraction of its
    DISTINCT word ``ngram``-grams that appear anywhere in the benchmark,
    plus the drop verdict at ``threshold``. Unlike
    :func:`contamination_check` (hit count, flagged docs only), EVERY doc
    with >= 1 gram comes back — the zero-hit rows are the point, a
    decontamination report must show what it cleared. Docs shorter than
    ``ngram`` words have no grams, carry no evidence, and are absent (the
    repo-wide empty-bag convention, cf. DSIR scoring).

    Output: (key, n_grams, n_hits, contamination 4dp, drop 0/1).

    Scale shape: the benchmark gram set is DISTINCT-collapsed before the
    join and broadcast (eval sets are MBs; the 100 TB side never
    shuffles); per-doc grams are array_distinct'd BEFORE exploding so the
    join input is bounded by distinct-grams-per-doc; one doc-keyed
    map-side-combinable aggregate finishes."""
    bench_grams = benchmark_grams(benchmark, benchmark_text, ngram)
    corpus_grams = corpus.select(
        F.col(corpus_key).alias("k"),
        F.explode(F.array_distinct(_gram_structs(F.col(corpus_text), ngram))).alias(
            "g"
        ),
    )
    hit = bench_grams.withColumn("__hit", F.lit(1))
    scored = (
        corpus_grams.join(F.broadcast(hit), "g", "left")
        .groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(F.coalesce("__hit", F.lit(0))).alias("n_hits"),
        )
    )
    frac = F.col("n_hits") / F.col("n_grams")
    return scored.select(
        F.col("k").alias(corpus_key),
        "n_grams",
        "n_hits",
        F.round(frac, 4).alias("contamination"),
        (F.round(frac, 4) >= threshold).cast("int").alias("drop"),
    )


def contamination_score_stateless(
    df: DataFrame,
    bench_gram_rows: list,
    id_col: str = "doc_id",
    text_col: str = "text",
    ngram: int = 5,
    threshold: float = 0.5,
    carry_cols: tuple = (),
) -> DataFrame:
    """STATELESS per-document contamination scoring — decontamination at
    crawl ingest, the production shape (score every arriving doc against
    the fixed eval set; quarantine before the corpus ever lands). The
    DISTINCT benchmark gram set (from :func:`benchmark_grams`, collected —
    eval sets are KB-MB by nature, the same size argument that lets the
    batch path broadcast it) rides as a Python set in the kernel closure;
    each document grams itself and intersects ROW-LOCALLY inside one Arrow
    batch — no join, no aggregation state, no watermark — so the same code
    runs unmodified on a readStream (the
    :func:`~fsql_spark.operators.dsir.dsir_score_stateless` posture).

    Output/semantics match :func:`contamination_fraction` exactly —
    (id, *carries, n_grams, n_hits, contamination 4dp, drop 0/1) over
    per-doc DISTINCT grams, zero-gram docs absent — and the gram identity
    is the collected output of the SAME relation the batch join broadcasts
    (one definition, no batch/stream drift). The fraction is rounded
    JVM-side after the kernel: Python ``round`` is banker's, Spark's is
    HALF_UP, and the drop verdict sits exactly on the boundary."""
    import pandas as pd

    from pyspark.sql.types import LongType, StructField, StructType

    bench = set()
    for r in bench_gram_rows:
        g = r["g"]
        bench.add(g if isinstance(g, str) else tuple(g))

    src = df.select(id_col, text_col, *carry_cols)
    schema = StructType(
        [src.schema[id_col]]
        + [src.schema[c] for c in carry_cols]
        + [StructField("n_grams", LongType()), StructField("n_hits", LongType())]
    )

    def run(batches):
        for pdf in batches:
            rows = []
            carries = [pdf[c] for c in carry_cols]
            for key, text, *extra in zip(pdf[id_col], pdf[text_col], *carries):
                # replicate the JVM gram identity exactly: split on single
                # space KEEPING empties (F.split semantics), n consecutive
                # words, per-doc distinct. NULL text must be absent like
                # the batch path (split(NULL) -> NULL -> no explode rows)
                # — coercing to "" would fabricate a {""} gram set at
                # ngram=1 and emit a row the batch twin omits.
                if text is None or text != text:  # None / NaN from pandas
                    continue
                words = text.split(" ")
                if ngram == 1:
                    grams = set(words)
                else:
                    k = len(words) - (ngram - 1)
                    grams = {tuple(words[i : i + ngram]) for i in range(max(k, 0))}
                if not grams:
                    continue
                rows.append((key, *extra, len(grams), len(grams & bench)))
            yield pd.DataFrame(
                rows, columns=[id_col, *carry_cols, "n_grams", "n_hits"]
            )

    scored = src.mapInPandas(run, schema=schema)
    frac = F.col("n_hits") / F.col("n_grams")
    return scored.select(
        id_col,
        *carry_cols,
        "n_grams",
        "n_hits",
        F.round(frac, 4).alias("contamination"),
        (F.round(frac, 4) >= threshold).cast("int").alias("drop"),
    )


def repetition_score(text: Column | str, ngram: int = 1) -> Column:
    """1 - distinct/total over word n-grams: 0 = no repetition, -> 1 for
    degenerate loops. The standard cheap repetition filter (drop > ~0.2 at
    ngram >= 2 in real pipelines).

    Counting doesn't need string grams: ``arrays_zip`` of the n shifted word
    slices yields struct grams with exact equality and NO per-element lambda —
    measured 3x faster than the transform+slice higher-order function
    (``_word_shingles``), which Spark evaluates interpreted per element.
    Struct distinctness is also collision-proof by construction (no joiner)."""
    grams = _gram_structs(F.col(text) if isinstance(text, str) else text, ngram)
    n = F.size(grams)
    # empty gram list (doc shorter than n tokens) => 0, not a division by
    # zero (which THROWS under Spark 4's default ANSI mode)
    return F.when(n == 0, F.lit(0.0)).otherwise(
        F.round(1 - F.size(F.array_distinct(grams)) / n, 4)
    )


# --------------------------------------------------------------------------
# catalog entries + oracles
# --------------------------------------------------------------------------

def q_contamination(spark: SparkSession, sf: str) -> DataFrame:
    """Corpus = documents, benchmark = the 20 lowest doc_ids (stand-in eval
    set); 4-gram overlap audit. The 31-word synthetic vocabulary makes short
    n-grams collide on purpose — plenty of hits to verify."""
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    bench = docs.where(F.col("doc_id") < 20)
    corpus = docs.where(F.col("doc_id") >= 20)
    return contamination_check(corpus, bench, "doc_id", "text", "text", ngram=4)


Q_CONTAMINATION_SQL = """
WITH grams AS (
  SELECT doc_id,
         list_distinct(list_transform(
           generate_series(1, greatest(len(string_split(text, ' ')) - 3, 0)),
           i -> array_to_string(string_split(text, ' ')[i:i+3], chr(1))
         )) AS gs
  FROM documents
),
bench AS (
  SELECT DISTINCT unnest(gs) AS g FROM grams WHERE doc_id < 20
),
corpus AS (
  SELECT doc_id, unnest(gs) AS g FROM grams WHERE doc_id >= 20
)
SELECT c.doc_id, COUNT(DISTINCT c.g) AS n_hits
FROM corpus c JOIN bench b ON c.g = b.g
GROUP BY c.doc_id
"""


def q_contamination_fraction(spark: SparkSession, sf: str) -> DataFrame:
    """Per-doc contamination share vs the 20-lowest-doc_id stand-in eval
    set at 4-grams, with the drop verdict at 50% — the full report
    including cleared (zero-hit) docs."""
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    bench = docs.where(F.col("doc_id") < 20)
    corpus = docs.where(F.col("doc_id") >= 20)
    return contamination_fraction(
        corpus, bench, "doc_id", "text", "text", ngram=4, threshold=0.5
    )


Q_CONTAMINATION_FRACTION_SQL = """
WITH grams AS (
  SELECT doc_id,
         list_distinct(list_transform(
           generate_series(1, greatest(len(string_split(text, ' ')) - 3, 0)),
           i -> array_to_string(string_split(text, ' ')[i:i+3], chr(1))
         )) AS gs
  FROM documents
),
bench AS (
  SELECT DISTINCT unnest(gs) AS g FROM grams WHERE doc_id < 20
),
corpus AS (
  SELECT doc_id, unnest(gs) AS g FROM grams WHERE doc_id >= 20
)
SELECT c.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_grams,
       CAST(SUM(CASE WHEN b.g IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hits,
       ROUND(SUM(CASE WHEN b.g IS NOT NULL THEN 1 ELSE 0 END) * 1.0 / COUNT(*), 4)
         AS contamination,
       CAST(ROUND(SUM(CASE WHEN b.g IS NOT NULL THEN 1 ELSE 0 END) * 1.0
                  / COUNT(*), 4) >= 0.5 AS INTEGER) AS drop
FROM corpus c LEFT JOIN bench b ON c.g = b.g
GROUP BY c.doc_id
"""


def q_doc_repetition(spark: SparkSession, sf: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    return docs.select(
        "doc_id",
        repetition_score("text", ngram=1).alias("rep1"),
        repetition_score("text", ngram=2).alias("rep2"),
    )


Q_REPETITION_SQL = """
WITH t AS (
  SELECT doc_id,
         string_split(text, ' ') AS w1,
         list_transform(
           generate_series(1, greatest(len(string_split(text, ' ')) - 1, 0)),
           i -> array_to_string(string_split(text, ' ')[i:i+1], chr(1))
         ) AS w2
  FROM documents
)
SELECT doc_id,
       CASE WHEN len(w1) = 0 THEN 0.0
            ELSE ROUND(1 - len(list_distinct(w1)) * 1.0 / len(w1), 4) END AS rep1,
       CASE WHEN len(w2) = 0 THEN 0.0
            ELSE ROUND(1 - len(list_distinct(w2)) * 1.0 / len(w2), 4) END AS rep2
FROM t
"""


def source_gram_containment(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    ngram: int = 3,
) -> DataFrame:
    """Cross-slice leakage matrix: for every ORDERED pair of groups, the
    fraction of group A's distinct word n-grams that also occur in group B
    -> (group_a, group_b, shared_grams, containment). The
    benchmark-vs-corpus contamination check generalized to all slice
    pairs — which crawl snapshots replicate each other, which "new" source
    is a re-scrape of an old one (containment is asymmetric: a subset
    scores 1.0 against its superset, not vice versa).

    One shuffle builds the distinct (group, gram) relation; the gram-keyed
    self-join's fanout is bounded by groups-per-gram SQUARED — group
    count, not corpus size — and the gram relation is vocabulary-scale, so
    the join is pinned to shuffled hash (never broadcast)."""
    grams = (
        df.select(
            F.col(group_col).alias("group_a"),
            F.explode(F.array_distinct(_gram_structs(F.col(text_col), ngram))).alias("g"),
        )
        .distinct()
    )
    totals = grams.groupBy("group_a").agg(F.count(F.lit(1)).alias("n_grams"))
    g2 = grams.select(F.col("group_a").alias("group_b"), "g")
    shared = (
        grams.join(g2.hint("shuffle_hash"), "g")
        .where(F.col("group_a") != F.col("group_b"))
        .groupBy("group_a", "group_b")
        .agg(F.count(F.lit(1)).alias("shared_grams"))
    )
    return shared.join(F.broadcast(totals), "group_a").select(
        "group_a",
        "group_b",
        "shared_grams",
        (F.col("shared_grams") / F.col("n_grams")).alias("containment"),
    )


def q_source_containment(spark: SparkSession, sf: str) -> DataFrame:
    """3-gram containment matrix between the documents table's sources —
    the slice-leakage dashboard (4dp)."""
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    out = source_gram_containment(docs, "source", "text", ngram=3)
    return out.select(
        F.col("group_a").alias("source_a"),
        F.col("group_b").alias("source_b"),
        "shared_grams",
        F.round("containment", 4).alias("containment"),
    ).orderBy("source_a", "source_b")


Q_SOURCE_CONTAINMENT_SQL = """
WITH grams AS (
  SELECT DISTINCT source AS group_a,
         unnest(list_distinct(list_transform(
           generate_series(1, greatest(len(string_split(text, ' ')) - 2, 0)),
           i -> array_to_string(string_split(text, ' ')[i:i+2], chr(1))
         ))) AS g
  FROM documents
),
totals AS (SELECT group_a, CAST(COUNT(*) AS BIGINT) AS n_grams FROM grams GROUP BY group_a),
shared AS (
  SELECT a.group_a, b.group_a AS group_b, CAST(COUNT(*) AS BIGINT) AS shared_grams
  FROM grams a JOIN grams b ON a.g = b.g AND a.group_a <> b.group_a
  GROUP BY 1, 2
)
SELECT s.group_a AS source_a, s.group_b AS source_b, s.shared_grams,
       ROUND(s.shared_grams / t.n_grams, 4) AS containment
FROM shared s JOIN totals t ON s.group_a = t.group_a
ORDER BY source_a, source_b
"""


DECONTAM_QUERIES = {
    "q_contamination": q_contamination,
    "q_contamination_fraction": q_contamination_fraction,
    "q_doc_repetition": q_doc_repetition,
    "q_source_containment": q_source_containment,
}

DECONTAM_ORACLES = {
    "q_contamination": Q_CONTAMINATION_SQL,
    "q_contamination_fraction": Q_CONTAMINATION_FRACTION_SQL,
    "q_doc_repetition": Q_REPETITION_SQL,
    "q_source_containment": Q_SOURCE_CONTAINMENT_SQL,
}
