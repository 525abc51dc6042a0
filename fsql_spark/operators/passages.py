"""Passage-level (k-token window) duplication analysis — the exact-substring
dedup signal of Lee et al., *Deduplicating Training Data Makes Language
Models Better* (2021), re-expressed relationally: instead of a suffix array,
every k-token sliding window becomes one row, and corpus-wide duplication is
one hash aggregate over those rows.

Reference parity: the reference engine (/root/reference) has no text
operators at all (SURVEY.md §2.5) — this module is part of the
driver-mandated LLM-pipeline extension surface (SURVEY.md §2.6).

Scale shape (100 TB): window generation is a JVM-only flatMap (split +
sequence + transform — no Python, no shuffle); the duplication count is ONE
map-side-combinable aggregate keyed on the passage text (at petabyte scale
key on ``xxhash64(passage)`` instead and let the 64-bit key ride the
shuffle; semantics identical modulo a ~2^-64 collision). The per-document
dup fraction is one hash join from windows to the (much smaller) duplicated
set plus a per-doc aggregate. Nothing is quadratic: every stage is linear in
total token count, and the only shuffles carry (passage, count) pairs or
per-doc partial aggregates.

Containment (doc-inside-doc detection, RefinedWeb-style) lives here too:
Jaccard misses a small document embedded in a big one (the union term
dominates), so near-dup pipelines pair a containment pass with the
MinHash/Jaccard pass. The exact formulation is the same inverted-index join
as ``jaccard_pairs`` with ``|A∩B| / min(|A|,|B|)`` as the score.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .dedup import _spread, _word_shingles


def _passage_array(text: Column, k: int) -> Column:
    """All k-token sliding windows of ``text`` as an array<string>, tokens
    joined by a single space (positional, NOT distinct — occurrences count).
    Documents shorter than k tokens yield an empty array. One window
    generator serves both families: this is ``_word_shingles`` with
    positional semantics and a human-readable separator."""
    return _word_shingles(text, k, distinct=False, sep=" ")


def passage_windows(df: DataFrame, key_col: str, text_col: str, k: int = 8) -> DataFrame:
    """One row per k-token window: (key, pos, passage). ``pos`` is the
    0-based token offset of the window start. The window generation itself
    is a pure JVM flatMap, linear in token count; single-file inputs first
    get one small round-robin exchange of the compact text rows (see
    ``_spread``) so the explosion parallelizes."""
    return _spread(df).select(
        F.col(key_col).alias("k"),
        F.posexplode(_passage_array(F.col(text_col), k)).alias("pos", "passage"),
    )


def duplicated_passages(
    df: DataFrame, key_col: str, text_col: str, k: int = 8, min_docs: int = 2
) -> DataFrame:
    """Passages (k-token windows) that appear in >= ``min_docs`` DISTINCT
    documents: (passage, n_docs, n_occurrences).

    One aggregate: window rows -> groupBy(passage) with a distinct-doc count
    and an occurrence count. Map-side combine collapses within-partition
    repeats before the shuffle; the exchange carries (passage, partial
    counts) only."""
    w = passage_windows(df, key_col, text_col, k)
    return (
        w.groupBy("passage")
        .agg(
            F.countDistinct("k").alias("n_docs"),
            F.count(F.lit(1)).alias("n_occurrences"),
        )
        .where(F.col("n_docs") >= min_docs)
    )


def passage_dup_fraction(
    df: DataFrame, key_col: str, text_col: str, k: int = 8, min_docs: int = 2
) -> DataFrame:
    """Per-document duplicated-passage fraction: of a doc's k-token windows,
    the share that also appears in >= ``min_docs`` distinct documents
    (including this one) — the per-doc removal signal of exact-substring
    dedup. Output: (key, n_windows, n_dup_windows, dup_fraction 4dp);
    documents with fewer than k tokens report 0 windows and fraction 0.0.

    Two linear stages: the duplicated-passage set from
    :func:`duplicated_passages`, then one join from windows to that set and
    a per-doc aggregate. The join keys are passage strings (hash-join; the
    duplicated set is typically orders of magnitude smaller than the window
    relation — AQE broadcasts it when it fits)."""
    w = passage_windows(df, key_col, text_col, k)
    dups = duplicated_passages(df, key_col, text_col, k, min_docs).select(
        "passage", F.lit(1).alias("__dup")
    )
    per_doc = (
        w.join(dups, "passage", "left")
        .groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("n_windows"),
            F.sum(F.coalesce(F.col("__dup"), F.lit(0))).alias("n_dup_windows"),
        )
    )
    # docs shorter than k tokens emit no window rows — restore them with 0s
    # so the output is total over the input keys
    all_keys = df.select(F.col(key_col).alias("k")).distinct()
    nw = F.coalesce("n_windows", F.lit(0))
    nd = F.coalesce("n_dup_windows", F.lit(0))
    # explicit zero-window guard: x / 0 THROWS under Spark 4's default ANSI
    frac = F.when(nw == 0, F.lit(0.0)).otherwise(F.round(nd / nw, 4))
    return all_keys.join(per_doc, "k", "left").select(
        F.col("k").alias(key_col),
        nw.alias("n_windows"),
        nd.alias("n_dup_windows"),
        frac.alias("dup_fraction"),
    )


def strip_duplicated_passages(
    df: DataFrame, key_col: str, text_col: str, k: int = 8, min_docs: int = 2
) -> DataFrame:
    """The exact-substring dedup TRANSFORMATION (Lee et al. 2021): rewrite
    every document with its duplicated spans removed. Returns (key, text)
    with ``text`` rebuilt from the surviving tokens.

    Semantics, fully deterministic: a k-token window is *removed* when its
    passage occurs in >= ``min_docs`` distinct documents AND this document
    is not the passage's canonical holder (the minimum key containing it).
    A token survives unless some removed window covers it — span dedup,
    not doc dedup. Canonical-per-window, not a per-passage survival
    guarantee: when duplicated passages OVERLAP with different canonical
    docs, a canonical copy can lose tokens to a neighboring span's
    removal, so a passage may survive nowhere (the same coverage-based
    behavior as suffix-array span dedup, which also removes overlapping
    duplicate ranges wholesale).

    Scale shape (r15): windows are a linear JVM explosion whose rows carry
    ``xxhash64(passage)`` instead of the k-token string — the module
    docstring's petabyte form: the stats shuffle and the dup join move
    8-byte keys, not passages (identical output modulo a ~2^-64 collision,
    hash-checked against the oracle). The removal decision collapses to ONE
    compact per-doc aggregate — the window-start positions of removed
    spans, a few ints per affected doc — and the rewrite is a pure JVM
    array expression per document (drop tokens whose index some removed
    window covers, re-join). The pre-r15 shape shipped every covered
    (doc, idx) pair and every token of the corpus through an anti-join
    plus a collect_list/array_sort rebuild shuffle; this form moves
    decisions, not payloads (guide §2.3): the only doc-keyed shuffle left
    carries removed-position lists.

    Unique-``key_col`` contract (the jaccard_pairs convention): documents
    are rewritten per input row, each against the union of its key's
    removal positions."""
    w = passage_windows(df, key_col, text_col, k).select(
        "k", "pos", F.xxhash64("passage").alias("ph")
    )
    stats = w.groupBy("ph").agg(
        F.countDistinct("k").alias("n_docs"), F.min("k").alias("canon")
    )
    dup = stats.where(F.col("n_docs") >= min_docs).select("ph", "canon")
    rem = w.join(dup, "ph").where(F.col("k") != F.col("canon")).select("k", "pos")
    rem_pos = rem.groupBy("k").agg(F.collect_set("pos").alias("__rp"))
    base = _spread(df).select(F.col(key_col).alias("k"), F.col(text_col).alias("__t"))
    joined = base.join(rem_pos, "k", "left")
    toks = F.split(F.col("__t"), " ")
    idxed = F.transform(toks, lambda t, i: F.struct(t.alias("t"), i.alias("i")))
    kept = F.filter(
        idxed,
        lambda s: ~F.exists(
            F.col("__rp"), lambda p: (p <= s["i"]) & (s["i"] <= p + F.lit(k - 1))
        ),
    )
    # concat_ws over the split tokens is byte-identical to the original
    # text (empty tokens from repeated separators survive the round-trip),
    # so untouched docs — the vast majority — skip the per-token lambdas
    rebuilt = F.when(F.col("__rp").isNull(), F.col("__t")).otherwise(
        F.concat_ws(" ", F.transform(kept, lambda s: s["t"]))
    )
    return joined.select(F.col("k").alias(key_col), rebuilt.alias(text_col))


def containment_pairs_against(
    df_new: DataFrame,
    corpus: DataFrame,
    key_col: str,
    text_col: str,
    threshold: float = 0.9,
    ngram: int = 3,
) -> DataFrame:
    """Cross-corpus containment: (new_key, corpus_key, containment) for
    pairs whose n-gram shingle-set containment ``|A∩B| / min(|A|,|B|)``
    meets ``threshold`` — catches a truncation/excerpt of a corpus document
    that Jaccard misses (a half-doc vs its source has J ~ 0.5 but
    containment 1.0).

    Exact inverted-index formulation: shingles of the (small) new batch join
    shingles of the corpus on the shingle value; intersection sizes fall out
    of one count aggregate; set sizes re-attach by key. The batch side of an
    incremental pipeline is bounded (a crawl increment), so the index join
    is candidates ~ shared-shingle pairs, not |batch| x |corpus|; for
    batch-free full-corpus containment at scale, band the MINIMUM-side
    shingle sample as in minhash_lsh_pairs (containment-LSH) — not needed
    for the incremental shape this operator serves."""
    btok = (
        _spread(df_new)
        .select(
            F.col(key_col).alias("bk"),
            _word_shingles(F.col(text_col), ngram).alias("sh"),
        )
        .select("bk", F.size("sh").alias("bn"), F.explode("sh").alias("w"))
    )
    ctok = (
        _spread(corpus)
        .select(
            F.col(key_col).alias("ck"),
            _word_shingles(F.col(text_col), ngram).alias("sh"),
        )
        .select("ck", F.size("sh").alias("cn"), F.explode("sh").alias("w"))
    )
    common = btok.join(ctok, "w").groupBy("bk", "ck", "bn", "cn").agg(
        F.count(F.lit(1)).alias("c")
    )
    cont = F.col("c") / F.least("bn", "cn")
    return common.where(cont >= threshold).select(
        F.col("bk").alias("new_key"),
        F.col("ck").alias("corpus_key"),
        F.round(cont, 4).alias("containment"),
    )


# --------------------------------------------------------------------------
# catalog entries + oracles
# --------------------------------------------------------------------------

def _docs(spark: SparkSession, sf: str) -> DataFrame:
    return spark.read.parquet(f"{sf}/documents.parquet")


def q_duplicated_passages(spark: SparkSession, sf: str) -> DataFrame:
    """Corpus-wide duplicated 8-token passages with doc/occurrence counts —
    the exact-substring dedup signal. 8 tokens over this corpus' ~31-word
    vocabulary gives ~31^8 distinct possible windows, so chance collisions
    are nil and every hit is a genuinely copied passage."""
    return duplicated_passages(_docs(spark, sf), "doc_id", "text", k=8, min_docs=2)


Q_DUP_PASSAGES_SQL = """
WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
p AS (
  SELECT doc_id, unnest([array_to_string(ws[i:i+7], ' ') for i in range(1, len(ws) - 6)]) AS passage
  FROM w WHERE len(ws) >= 8
)
SELECT passage,
       COUNT(DISTINCT doc_id) AS n_docs,
       COUNT(*)               AS n_occurrences
FROM p
GROUP BY passage
HAVING COUNT(DISTINCT doc_id) >= 2
"""


def q_passage_dup_fraction(spark: SparkSession, sf: str) -> DataFrame:
    """Per-document duplicated-passage fraction (the doc-level removal
    signal): docs that are copies score near 1.0, unique docs 0.0."""
    return passage_dup_fraction(_docs(spark, sf), "doc_id", "text", k=8, min_docs=2)


Q_PASSAGE_FRACTION_SQL = """
WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
p AS (
  SELECT doc_id, unnest([array_to_string(ws[i:i+7], ' ') for i in range(1, len(ws) - 6)]) AS passage
  FROM w WHERE len(ws) >= 8
),
dup AS (
  SELECT passage FROM p GROUP BY passage HAVING COUNT(DISTINCT doc_id) >= 2
),
per_doc AS (
  SELECT p.doc_id,
         COUNT(*) AS n_windows,
         CAST(SUM(CASE WHEN d.passage IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_windows
  FROM p LEFT JOIN dup d ON p.passage = d.passage
  GROUP BY p.doc_id
)
SELECT docs.doc_id,
       COALESCE(n_windows, 0)                                   AS n_windows,
       COALESCE(n_dup_windows, 0)                               AS n_dup_windows,
       ROUND(COALESCE(n_dup_windows * 1.0 / n_windows, 0.0), 4) AS dup_fraction
FROM (SELECT DISTINCT doc_id FROM documents) docs
LEFT JOIN per_doc USING (doc_id)
"""


def q_containment_pairs(spark: SparkSession, sf: str) -> DataFrame:
    """Containment detection on the synthetic ingest batch: half-truncations
    of corpus docs 50-79 (J ~ 0.5 vs source — invisible to the minhash
    entries at threshold 0.8) score containment ~1.0 against their source.
    Same batch construction as q_dedup_incremental's novel half.

    ngram=5 (vs the dedup family's 3): the inverted-index join's cost is
    sum over batch shingles of their corpus document frequency, and this
    corpus' ~31-word vocabulary makes 3-grams frequent (every batch shingle
    matches thousands of docs => tens of millions of joined rows at sf0.1
    for 30 output pairs). 5-grams are ~1000x rarer, cutting the join to
    ~true-match multiplicity while the containment signal is unchanged (a
    truncation's 5-grams are still all in its source). The general scale
    lesson: pick the shingle width so document frequency, not corpus size,
    bounds the index join."""
    corpus = _docs(spark, sf)
    words = F.split(F.col("text"), " ")
    half = F.concat_ws(
        " ", F.slice(words, 1, F.greatest(F.floor(F.size(words) / 2).cast("int"), F.lit(1)))
    )
    truncs = corpus.where((F.col("doc_id") >= 50) & (F.col("doc_id") < 80)).select(
        (F.col("doc_id") + 200000).alias("doc_id"), half.alias("text")
    )
    return containment_pairs_against(
        truncs, corpus, "doc_id", "text", threshold=0.9, ngram=5
    )


Q_CONTAINMENT_SQL = """
WITH batch AS (
  SELECT doc_id + 200000 AS doc_id,
         array_to_string(
           list_slice(string_split(text, ' '), 1,
                      greatest(len(string_split(text, ' ')) // 2, 1)),
           ' ') AS text
  FROM documents WHERE doc_id >= 50 AND doc_id < 80
),
btok AS (
  SELECT doc_id, unnest(list_distinct(
    [array_to_string(ws[i:i+4], chr(1)) for i in range(1, len(ws) - 3)])) AS w
  FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM batch)
  WHERE len(ws) >= 5
),
ctok AS (
  SELECT doc_id, unnest(list_distinct(
    [array_to_string(ws[i:i+4], chr(1)) for i in range(1, len(ws) - 3)])) AS w
  FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)
  WHERE len(ws) >= 5
),
bsz AS (SELECT doc_id, COUNT(*) AS n FROM btok GROUP BY doc_id),
csz AS (SELECT doc_id, COUNT(*) AS n FROM ctok GROUP BY doc_id),
common AS (
  SELECT b.doc_id AS new_key, c.doc_id AS corpus_key, COUNT(*) AS c
  FROM btok b JOIN ctok c ON b.w = c.w
  GROUP BY 1, 2
)
SELECT new_key, corpus_key,
       ROUND(c * 1.0 / LEAST(b.n, cs.n), 4) AS containment
FROM common
JOIN bsz b  ON new_key = b.doc_id
JOIN csz cs ON corpus_key = cs.doc_id
WHERE c * 1.0 / LEAST(b.n, cs.n) >= 0.9
"""


def q_strip_passages(spark: SparkSession, sf: str) -> DataFrame:
    """Span-level dedup applied to the corpus: per doc, token counts before
    and after stripping non-canonical duplicated 8-token spans, plus the
    md5 of the rewritten text (the value-level proof the rebuild agrees
    byte-for-byte across engines)."""
    docs = _docs(spark, sf)
    cleaned = strip_duplicated_passages(docs, "doc_id", "text", k=8, min_docs=2)
    before = docs.select(
        "doc_id", F.size(F.split("text", " ")).alias("n_tokens_before")
    )
    return before.join(cleaned, "doc_id").select(
        "doc_id",
        "n_tokens_before",
        F.when(F.col("text") == "", 0)
        .otherwise(F.size(F.split("text", " ")))
        .cast("int")
        .alias("n_tokens_after"),
        F.md5("text").alias("cleaned_fp"),
    )


Q_STRIP_PASSAGES_SQL = """
WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
p AS (
  SELECT doc_id, u['pos'] AS pos, u['pas'] AS passage
  FROM (
    SELECT doc_id,
           unnest([{'pos': i - 1, 'pas': array_to_string(ws[i:i+7], ' ')}
                   for i in range(1, len(ws) - 6)]) AS u
    FROM w WHERE len(ws) >= 8
  )
),
stats AS (
  SELECT passage, COUNT(DISTINCT doc_id) AS n_docs, MIN(doc_id) AS canon
  FROM p GROUP BY passage
),
rem AS (
  SELECT p.doc_id, p.pos
  FROM p JOIN stats s ON p.passage = s.passage
  WHERE s.n_docs >= 2 AND p.doc_id != s.canon
),
covered AS (
  SELECT DISTINCT doc_id, unnest(range(pos, pos + 8)) AS idx FROM rem
),
toks AS (
  SELECT doc_id, generate_subscripts(ws, 1) - 1 AS idx, unnest(ws) AS tok FROM w
),
kept AS (
  SELECT t.doc_id, t.idx, t.tok
  FROM toks t LEFT JOIN covered c ON t.doc_id = c.doc_id AND t.idx = c.idx
  WHERE c.doc_id IS NULL
),
rebuilt AS (
  SELECT doc_id, string_agg(tok, ' ' ORDER BY idx) AS text FROM kept GROUP BY doc_id
)
SELECT w.doc_id,
       CAST(len(w.ws) AS INTEGER) AS n_tokens_before,
       CAST(CASE WHEN COALESCE(r.text, '') = '' THEN 0
                 ELSE len(string_split(r.text, ' ')) END AS INTEGER) AS n_tokens_after,
       md5(COALESCE(r.text, '')) AS cleaned_fp
FROM w LEFT JOIN rebuilt r USING (doc_id)
"""


PASSAGE_QUERIES = {
    "q_duplicated_passages": q_duplicated_passages,
    "q_passage_dup_fraction": q_passage_dup_fraction,
    "q_strip_passages": q_strip_passages,
    "q_containment_pairs": q_containment_pairs,
}

PASSAGE_ORACLES = {
    "q_duplicated_passages": Q_DUP_PASSAGES_SQL,
    "q_passage_dup_fraction": Q_PASSAGE_FRACTION_SQL,
    "q_strip_passages": Q_STRIP_PASSAGES_SQL,
    "q_containment_pairs": Q_CONTAINMENT_SQL,
}
