"""BPE tokenizer training on the corpus: pair statistics + merge learning.

A training-data engine that scores, dedups, and packs a corpus should
also be able to LEARN the tokenizer from it. Classic byte-pair-encoding
training (Sennrich et al. 2016; the HF-tokenizers/SentencePiece-BPE
shape) is two very different problems glued together:

1. **Word-frequency compression** — corpus-sized, embarrassingly
   distributable: one explode + one hash aggregate collapses N tokens of
   text into the DISTINCT-word frequency table. This is the only part
   that ever touches corpus-scale data, and it is one shuffle.
2. **The merge loop** — iterative argmax over pair counts derived from
   that zipf-bounded word table. Every merge depends on the previous
   one, so the loop is inherently sequential; the industry-standard
   design (HF tokenizers, SentencePiece, fastBPE) runs it single-node
   over the compressed word counts. :func:`bpe_learn_merges` does the
   same on the driver, guarded by an explicit ``max_words`` budget —
   the same bounded-driver compromise :mod:`~fsql_spark.operators.
   clustering` documents for dedup graphs (a 100 TB corpus's distinct-
   word table is 10-100M rows, ~GBs — driver-sized; the CORPUS never
   moves).

Determinism contract (what makes this testable): the winning pair each
round is max by (count, then lexicographically smallest (left, right)),
and merges apply left-to-right non-overlapping — so the merge table is a
pure function of the word-frequency table, reproducible by any
implementation. :func:`bpe_pair_stats` (merge round 1's candidate
statistics) is fully SQL-expressible and carries the exact DuckDB
oracle; the merge LOOP's catalog entry fixes the budget at 15 merges,
which makes even the sequential loop exactly SQL-replayable by
UNROLLING (``_bpe_unrolled_sql`` — round 11; previously the catalog's
one rows-only entry), and the unbounded loop is additionally
property-tested against an independent pure-Python reference.

No reference counterpart (fsql delegates all row-level compute,
`/root/reference/src/fsql/deser.py:30-31`); driver-mandated extension
surface (SURVEY §2.6, text analysis).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: refuse to collect a word table bigger than this (see module docstring)
MAX_DRIVER_WORDS = 2_000_000


def word_frequencies(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, n) over whitespace words — the distributed compression step
    every BPE trainer starts with. One explode + one map-side-combinable
    aggregate; output is zipf-bounded vocabulary metadata, not corpus."""
    return (
        df.select(F.explode(F.split(F.col(text_col), " ")).alias("word"))
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def bpe_pair_stats(
    df: DataFrame, text_col: str = "text", top_k: int = 20
) -> DataFrame:
    """Merge-round-1 candidate statistics: adjacent CHARACTER pairs inside
    words, weighted by word frequency — (left, right, pair_n), the top-k
    by count (ties broken lexicographically). The pair a BPE trainer
    would merge first is row 1.

    Plan shape: the pair explosion runs on the DISTINCT word table (zipf-
    bounded), pairs come from arrays_zip of two shifted char slices (pure
    codegen — the higher-order ``transform`` lambda is the documented
    interpreted-eval cliff, PERF.md inflection #6), and top-k is
    TakeOrderedAndProject, never a global sort."""
    if top_k < 1:
        raise ValueError(f"top_k must be >= 1, got {top_k}")
    words = word_frequencies(df, text_col)
    chars = F.split(F.col("word"), "")
    pairs = F.arrays_zip(
        F.slice(chars, 1, F.size(chars) - 1).alias("l"),
        F.slice(chars, 2, F.size(chars) - 1).alias("r"),
    )
    return (
        words.where(F.length("word") >= 2)
        .select("n", F.explode(pairs).alias("p"))
        .groupBy(F.col("p.l").alias("left"), F.col("p.r").alias("right"))
        .agg(F.sum("n").alias("pair_n"))
        .orderBy(F.desc("pair_n"), "left", "right")
        .limit(top_k)
    )


def _guard_vocab(word_counts: DataFrame, max_words: int = MAX_DRIVER_WORDS) -> list:
    """Collect a (word, n) vocabulary relation under the driver budget —
    raises instead of silently attempting a driver OOM (shared by the
    learner and the r15 single-scan entries)."""
    rows = word_counts.limit(max_words + 1).collect()
    if len(rows) > max_words:
        raise ValueError(
            f"distinct-word table exceeds max_words={max_words}; raise the "
            "budget or pre-filter the corpus (the merge loop is sequential "
            "by definition — see bpe.py's module docstring)"
        )
    return rows


def bpe_learn_merges(
    df: DataFrame,
    text_col: str = "text",
    num_merges: int = 20,
    max_words: int = MAX_DRIVER_WORDS,
) -> DataFrame:
    """Learn ``num_merges`` BPE merges from the corpus: (rank, left,
    right, merged, pair_n), rank 1 first. Distributed word-frequency
    compression, then the exact sequential merge loop on the driver (see
    the module docstring for why that split is the standard design) —
    since round 10 with incremental pair-count maintenance
    (:func:`_merge_loop_incremental`): per merge, only the words that
    contain the winning pair are rescanned, ~30x fewer driver operations
    than a per-round full rescan on a zipf-shaped vocabulary (asserted in
    tests/test_round10_fixes.py, >=5x gate).
    Raises when the distinct-word table exceeds ``max_words`` instead of
    silently attempting a driver OOM."""
    if num_merges < 1:
        raise ValueError(f"num_merges must be >= 1, got {num_merges}")
    spark = df.sparkSession
    rows = _guard_vocab(word_frequencies(df, text_col), max_words)
    words = {tuple(r["word"]): int(r["n"]) for r in rows}
    merges, _ = _merge_loop_incremental(words, num_merges)
    return spark.createDataFrame(
        merges, "rank int, left string, right string, merged string, pair_n long"
    )


def _apply_merge(toks: list, best: tuple, merged: str) -> list:
    """Replace adjacent (best[0], best[1]) with ``merged``, left-to-right
    non-overlapping — the shared apply rule of both loop implementations."""
    out: list = []
    i = 0
    while i < len(toks):
        if i + 1 < len(toks) and toks[i] == best[0] and toks[i + 1] == best[1]:
            out.append(merged)
            i += 2
        else:
            out.append(toks[i])
            i += 1
    return out


def _merge_loop_incremental(
    word_freqs: dict, num_merges: int
) -> tuple[list, int]:
    """The merge loop with INCREMENTAL pair-count maintenance (the
    HF-tokenizers design, round-10 advice item): build the pair->count
    table and a pair->word-ids index ONCE, then per merge touch only the
    words that actually contain the winning pair — subtract their old
    adjacent-pair counts, apply the merge, add the new ones, and keep the
    index exact (a pair's id-set is always precisely the words where it
    is adjacent). Equivalent by construction to a full rescan: the
    subtract/add bookkeeping is exact integer arithmetic, so ``counts``
    after each round equals what a rescan would rebuild (pinned by
    tests/test_round10_fixes.py against the naive loop and by the
    hypothesis property vs an independent Python BPE).

    Returns (merges, ops) where ops counts token positions visited in
    word scans — the driver-work measure the naive loop pays per round
    over the ENTIRE vocabulary and this loop pays only for touched words.
    """
    words: list = [[list(w), n] for w, n in word_freqs.items()]
    counts: dict = {}
    index: dict = {}
    ops = 0
    for wi, (toks, n) in enumerate(words):
        ops += len(toks)
        for i in range(len(toks) - 1):
            p = (toks[i], toks[i + 1])
            counts[p] = counts.get(p, 0) + n
            index.setdefault(p, set()).add(wi)
    merges: list = []
    for rank in range(1, num_merges + 1):
        if not counts:
            break
        # deterministic winner: max count, then lexicographically smallest
        best = min(counts, key=lambda p: (-counts[p], p))
        merged = best[0] + best[1]
        best_n = counts[best]
        for wi in list(index.get(best, ())):
            toks, n = words[wi]
            ops += len(toks)
            old_pairs = [
                (toks[i], toks[i + 1]) for i in range(len(toks) - 1)
            ]
            for p in old_pairs:
                c = counts[p] - n
                if c:
                    counts[p] = c
                else:
                    del counts[p]
            new_toks = _apply_merge(toks, best, merged)
            words[wi][0] = new_toks
            new_pairs = [
                (new_toks[i], new_toks[i + 1])
                for i in range(len(new_toks) - 1)
            ]
            for p in new_pairs:
                counts[p] = counts.get(p, 0) + n
            old_set, new_set = set(old_pairs), set(new_pairs)
            for p in old_set - new_set:
                s = index[p]
                s.discard(wi)
                if not s:
                    del index[p]
            for p in new_set - old_set:
                index.setdefault(p, set()).add(wi)
        merges.append((rank, best[0], best[1], merged, best_n))
    return merges, ops


def _merge_loop_naive(word_freqs: dict, num_merges: int) -> tuple[list, int]:
    """The pre-round-10 full-rescan loop, kept ONLY as the equivalence +
    operation-count reference for tests (every round rebuilds pair counts
    over the whole vocabulary and rewrites every word)."""
    words = dict(word_freqs)
    merges: list = []
    ops = 0
    for rank in range(1, num_merges + 1):
        counts: dict = {}
        for toks, n in words.items():
            ops += len(toks)
            for i in range(len(toks) - 1):
                p = (toks[i], toks[i + 1])
                counts[p] = counts.get(p, 0) + n
        if not counts:
            break
        best = min(counts, key=lambda p: (-counts[p], p))
        merged = best[0] + best[1]
        new_words: dict = {}
        for toks, n in words.items():
            ops += len(toks)
            key = tuple(_apply_merge(list(toks), best, merged))
            new_words[key] = new_words.get(key, 0) + n
        words = new_words
        merges.append((rank, best[0], best[1], merged, counts[best]))
    return merges, ops


# --------------------------------------------------------------------------
# catalog entries + oracle
# --------------------------------------------------------------------------


def q_bpe_pair_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Top-20 first-round BPE merge candidates over the corpus vocabulary
    (adjacent char pairs weighted by word frequency, deterministic
    tie-break)."""
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    return bpe_pair_stats(docs, "text", top_k=20)


Q_BPE_PAIR_STATS_SQL = """
WITH words AS (
  SELECT w AS word, CAST(COUNT(*) AS BIGINT) AS n
  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
  WHERE w <> '' GROUP BY w
),
pairs AS (
  SELECT substr(word, CAST(s.i AS INTEGER), 1)     AS "left",
         substr(word, CAST(s.i AS INTEGER) + 1, 1) AS "right",
         n
  FROM words, unnest(generate_series(1, LENGTH(word) - 1)) AS s(i)
  WHERE LENGTH(word) >= 2
)
SELECT "left", "right", CAST(SUM(n) AS BIGINT) AS pair_n
FROM pairs
GROUP BY "left", "right"
ORDER BY pair_n DESC, "left", "right"
LIMIT 20
"""


def q_bpe_learned_merges(spark: SparkSession, sf: str) -> DataFrame:
    """The first 15 learned BPE merges over the corpus. EXACT-oracled
    since round 11: the fixed merge budget lets the sequential loop be
    UNROLLED into 15 rounds of plain SQL (the unrolled-CTE PageRank
    technique) — each round recomputes weighted adjacent-pair counts,
    takes the deterministic argmax, and applies the merge with a
    left-to-right non-overlapping string ``replace`` over a
    separator-wrapped token-string word representation (see
    ``_bpe_unrolled_sql``). The hypothesis property test against an
    independent pure-Python BPE (tests/test_property_ops.py) remains as
    the unbounded-budget check."""
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    return bpe_learn_merges(docs, "text", num_merges=15)


def _bpe_unrolled_sql(num_merges: int) -> str:
    """DuckDB replay of :func:`bpe_learn_merges` for a FIXED merge budget.

    Word representation: each word is a string with every token wrapped
    in U+001F separators — ``hello`` starts as ``␟h␟␟e␟␟l␟␟l␟␟o␟``.
    Merging pair (a, b) is then ``replace(ws, '␟a␟␟b␟', '␟ab␟')``:
    SQL ``replace`` scans left-to-right and never rescans replaced
    output, which is exactly BPE's non-overlapping apply rule (e.g.
    tokens [a,a,a] under merge (a,a) -> [aa, a]); the separator wrapping
    makes token-boundary collisions impossible (corpus text never
    contains U+001F — ASCII control). The per-round argmax is
    ``ORDER BY c DESC, l, r LIMIT 1``: DuckDB's default binary collation
    compares UTF-8 bytes = code points, matching the Python loop's tuple
    min. Every per-round CTE is MATERIALIZED: w{r+1} references w{r}
    twice (directly and through b{r}), so inlined CTEs would expand into
    a 2^rounds evaluation tree. If pairs run dry early, the empty argmax row empties every
    later round, matching the Python loop's break."""
    sep = "\\x1F"  # DuckDB string-literal escape for U+001F
    rounds = []
    for r in range(num_merges):
        rounds.append(f"""
p{r} AS MATERIALIZED (
  SELECT toks[CAST(s.i AS INTEGER)]     AS l,
         toks[CAST(s.i AS INTEGER) + 1] AS r,
         CAST(SUM(n) AS BIGINT)         AS c
  FROM (SELECT n, string_split(trim(ws, e'{sep}'), e'{sep}{sep}') AS toks FROM w{r}),
       unnest(generate_series(1, len(toks) - 1)) AS s(i)
  GROUP BY 1, 2
),
b{r} AS MATERIALIZED (SELECT l, r, c FROM p{r} ORDER BY c DESC, l, r LIMIT 1),
m{r} AS (
  SELECT {r + 1} AS rank, l AS "left", r AS "right", l || r AS merged,
         c AS pair_n
  FROM b{r}
),
w{r + 1} AS MATERIALIZED (
  SELECT n,
         replace(ws, e'{sep}' || l || e'{sep}{sep}' || r || e'{sep}',
                 e'{sep}' || l || r || e'{sep}') AS ws
  FROM w{r}, b{r}
)""")
    union = "\nUNION ALL\n".join(f"SELECT * FROM m{r}" for r in range(num_merges))
    return f"""
WITH words AS (
  SELECT w AS word, CAST(COUNT(*) AS BIGINT) AS n
  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
  WHERE w <> '' GROUP BY w
),
w0 AS MATERIALIZED (
  SELECT n,
         e'{sep}' || array_to_string(
           list_transform(generate_series(1, length(word)),
                          i -> substr(word, CAST(i AS INTEGER), 1)),
           e'{sep}{sep}') || e'{sep}' AS ws
  FROM words
),{",".join(rounds)}"""


Q_BPE_LEARNED_MERGES_SQL = (
    _bpe_unrolled_sql(15)
    + "\nSELECT * FROM ("
    + "\nUNION ALL\n".join(f"SELECT * FROM m{r}" for r in range(15))
    + ") ORDER BY rank\n"
)


# --------------------------------------------------------------------------
# applying the learned merges back to the corpus (entry #193)
# --------------------------------------------------------------------------


def bpe_apply_merges(
    df: DataFrame,
    merges: list,
    text_col: str = "text",
    id_col: str = "doc_id",
    vocab: list | None = None,
    words_stream: DataFrame | None = None,
) -> DataFrame:
    """Tokenize the corpus under a learned merge list: (id, n_words,
    n_tokens, n_chars) per document with >= 1 word — the
    fertility/compression report (chars-per-token = n_chars/n_tokens)
    that tells a pipeline how a tokenizer fits its corpus. All-integer
    output BY DESIGN: a rounded ratio sits on rounding-boundary values
    where engines legally disagree (measured at sf0.001: 207/160 =
    1.29375 rounds differently across round-half conventions), and the
    exact integers carry strictly more information anyway. ``merges`` is
    the ``(left, right)`` sequence in rank order (e.g. from
    :func:`bpe_learn_merges` ``.collect()``).

    Tokenization is a pure function of the WORD, so the expensive part —
    the U+001F-wrapped token string pushed through a chain of ``replace``
    expressions, one per merge (SQL replace IS BPE's left-to-right
    non-overlapping apply rule, the identity the unrolled oracle rests
    on) — runs on the DISTINCT word table, which is zipf-bounded
    vocabulary metadata, not corpus (the same compression insight the
    merge LEARNER rests on; the first formulation applied the chain per
    word INSTANCE inside a transform lambda and the interpreted
    higher-order eval paid 15 replace passes over every corpus character
    — killed at sf10, rewrite recorded in PERF.md r11). The per-word
    (n_tokens, n_chars) relation then broadcast-joins back onto the word
    stream and map-side-combines per doc: one vocab aggregate + one
    doc-keyed shuffle, both of compact integer rows. At vocabularies
    beyond the broadcast threshold drop the hint and the planner falls
    back to a shuffle join on the word key — still never quadratic.

    r15 single-scan knobs: callers that already COLLECTED the vocabulary
    (every learn-then-apply entry: the merge loop needs it driver-side
    anyway) pass it as ``vocab`` (word strings) and the per-word counts
    come from the same ``_apply_merge`` chain the learner uses — by the
    module's unroll identity, exactly the replace-chain's counts (pinned
    by tests) — shipped back as a LocalTableScan instead of re-exploding
    the corpus for a distinct-word aggregate. ``words_stream`` likewise
    lets the caller hand in the (id_col, word) explosion — persisted, so
    the learn pass's vocabulary aggregate and this function's doc
    aggregate share ONE corpus scan."""
    sep = "\x1f"
    stream = words_stream
    if stream is None:
        stream = df.select(
            F.col(id_col),
            F.explode(
                F.filter(F.split(F.col(text_col), " "), lambda x: x != F.lit(""))
            ).alias("word"),
        )
    if vocab is not None:
        rows = []
        for w in vocab:
            toks = list(w)
            for left, right in merges:
                toks = _apply_merge(toks, (left, right), left + right)
            rows.append((w, len(toks), len(w)))
        tokmap = df.sparkSession.createDataFrame(
            rows, "word string, __tok long, __chr long"
        )
    else:
        wrapped = F.concat(
            F.lit(sep), F.array_join(F.split(F.col("word"), ""), sep + sep), F.lit(sep)
        )
        folded = wrapped
        for left, right in merges:
            folded = F.replace(
                folded,
                F.lit(f"{sep}{left}{sep}{sep}{right}{sep}"),
                F.lit(f"{sep}{left}{right}{sep}"),
            )
        tokmap = (
            stream.select("word").distinct()
            .withColumn("__s", folded)
            .select(
                "word",
                (F.length("__s")
                 - F.length(F.replace(F.col("__s"), F.lit(sep + sep), F.lit(sep))) + 1)
                .cast("long").alias("__tok"),
                F.length("word").cast("long").alias("__chr"),
            )
        )
    return (
        stream.join(F.broadcast(tokmap), "word")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("__tok").alias("n_tokens"),
            F.sum("__chr").alias("n_chars"),
        )
    )


def _learn_apply_counts(
    spark: SparkSession, sf: str, num_merges: int = 15
) -> tuple[DataFrame, DataFrame]:
    """Shared learn+apply pass for the BPE entries (r15 single-scan shape):
    ONE persisted corpus explosion feeds both the vocabulary collect (the
    merge learner needs it driver-side regardless) and the per-doc token
    aggregate, and the per-word token counts ride back as a vocab-sized
    LocalTableScan from the driver-side ``_apply_merge`` chain — the
    pre-r15 shape exploded the corpus twice (learn + apply) and ran a
    third distinct-word aggregate just to re-derive counts the collected
    vocabulary already determines. Returns (docs, per-doc counts)."""
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    stream = docs.select(
        "doc_id",
        F.explode(
            F.filter(F.split(F.col("text"), " "), lambda x: x != F.lit(""))
        ).alias("word"),
    ).persist()
    rows = _guard_vocab(stream.groupBy("word").agg(F.count(F.lit(1)).alias("n")))
    words = {tuple(r["word"]): int(r["n"]) for r in rows}
    learned, _ = _merge_loop_incremental(words, num_merges)
    merges = [(left, right) for _, left, right, _, _ in learned]
    counts = bpe_apply_merges(
        docs, merges, vocab=[r["word"] for r in rows], words_stream=stream
    )
    return docs, counts


def q_bpe_tokenized_lengths(spark: SparkSession, sf: str) -> DataFrame:
    """Per-document token counts under the corpus's own 15 learned BPE
    merges — learn (driver loop over the zipf-bounded word table), then
    apply distributedly (vocab-sized token-count table broadcast-joined
    back to the shared persisted word stream — one corpus scan total):
    (doc_id, n_words, n_tokens, n_chars) — exact integers only."""
    _, counts = _learn_apply_counts(spark, sf, num_merges=15)
    return counts.orderBy("doc_id")


def _bpe_apply_sql(num_merges: int) -> str:
    """Oracle: replay the learn (shared unrolled rounds) AND the apply —
    per-word wrapped strings pushed through the same ``replace`` chain,
    one round per learned merge (``a{r}`` tables, MATERIALIZED like the
    learn side), then per-doc aggregation of token/char counts."""
    sep = "\\x1F"
    parts = [f"""
docwords AS MATERIALIZED (
  SELECT doc_id, w AS word
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)
  WHERE w <> ''
),
a0 AS MATERIALIZED (
  SELECT doc_id,
         e'{sep}' || array_to_string(
           list_transform(generate_series(1, length(word)),
                          i -> substr(word, CAST(i AS INTEGER), 1)),
           e'{sep}{sep}') || e'{sep}' AS ws
  FROM docwords
)"""]
    # LEFT JOIN ON TRUE, not a cross join: if the merge loop runs dry
    # before the fixed budget, b{r} is EMPTY and a cross join would empty
    # every later apply round (tokcounts -> zero rows) while the engine —
    # applying the shorter learned list — returns every document. With the
    # left join a dry round passes ws through unchanged (COALESCE over the
    # NULL replace), matching the Python loop's break. ADVICE r11.
    for r in range(num_merges):
        parts.append(f"""
a{r + 1} AS MATERIALIZED (
  SELECT doc_id,
         COALESCE(replace(ws, e'{sep}' || l || e'{sep}{sep}' || r || e'{sep}',
                          e'{sep}' || l || r || e'{sep}'), ws) AS ws
  FROM a{r} LEFT JOIN b{r} ON TRUE
)""")
    return (
        _bpe_unrolled_sql(num_merges)
        + ","
        + ",".join(parts)
        + f""",
tokcounts AS MATERIALIZED (
  SELECT doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_words,
         CAST(SUM(length(ws) - length(replace(ws, e'{sep}{sep}', e'{sep}')) + 1) AS BIGINT) AS n_tokens,
         CAST(SUM(length(replace(ws, e'{sep}', ''))) AS BIGINT) AS n_chars
  FROM a{num_merges}
  GROUP BY doc_id
)"""
    )


Q_BPE_TOKENIZED_LENGTHS_SQL = (
    _bpe_apply_sql(15) + "\nSELECT * FROM tokcounts ORDER BY doc_id\n"
)


_PACK_TOKEN_BUDGET = 4096  # one context window per shard


def q_pack_token_shards(spark: SparkSession, sf: str) -> DataFrame:
    """TOKEN-budget sequence packing: tokenize the corpus under its own 15
    learned BPE merges, then greedy-pack documents into ~4096-token shards
    per language (the context-window batching step that follows
    tokenization in every pretraining pipeline; q_pack_shards is the same
    packer on raw chars). Audited per (lang, shard): docs + exact token
    sum. One oracle replays learn, apply, AND the running-sum packing."""
    from .sampling import pack_shards

    docs, counts = _learn_apply_counts(spark, sf, num_merges=15)
    withlang = counts.join(docs.select("doc_id", "lang"), "doc_id")
    packed = pack_shards(
        withlang, "doc_id", "n_tokens", budget=_PACK_TOKEN_BUDGET,
        partition_cols=["lang"],
    )
    return (
        packed.groupBy("lang", "shard_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("shard_tokens"),
        )
        .orderBy("lang", "shard_id")
    )


Q_PACK_TOKEN_SHARDS_SQL = (
    _bpe_apply_sql(15)
    + f""",
withlang AS (
  SELECT t.doc_id, d.lang, t.n_tokens
  FROM tokcounts t JOIN documents d USING (doc_id)
),
packed AS (
  SELECT lang, n_tokens,
         CAST(FLOOR((SUM(n_tokens) OVER (
                PARTITION BY lang
                ORDER BY substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) ASC, doc_id ASC
                ROWS UNBOUNDED PRECEDING
              ) - n_tokens) / {_PACK_TOKEN_BUDGET}.0) AS BIGINT) AS shard_id
  FROM withlang
)
SELECT lang, shard_id,
       COUNT(*)                      AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS shard_tokens
FROM packed
GROUP BY 1, 2
ORDER BY 1, 2
"""
)


#: bump when the merge-loop definition (tokenization, tie-break, apply
#: rule) changes: an old persisted merge table applied to newly-learned
#: conventions would silently tokenize differently
_BPE_FORMAT = 1
_BPE_META_COLS = ["__n_merges", "__bpe_fmt"]


def write_bpe_merges(merges: DataFrame, url: str) -> None:
    """Materialize a learned merge table — the shipped tokenizer artifact
    of the learn-once / tokenize-every-batch lifecycle (the
    write_unigram_model posture): format version + merge count ride as
    constant columns, validated on read so a stale or appended-to
    artifact refuses loudly instead of silently mis-tokenizing."""
    from ..api import write_table

    rows = merges.count()
    if rows == 0:
        raise ValueError("merge table is empty — nothing to persist")
    out = (
        merges.withColumn("__n_merges", F.lit(int(rows)))
        .withColumn("__bpe_fmt", F.lit(_BPE_FORMAT))
    )
    write_table(out, url)


def read_bpe_merges(spark: SparkSession, url: str) -> list:
    """Load a persisted merge table as the rank-ordered ``(left, right)``
    list :func:`bpe_apply_merges` consumes. Refuses missing metadata,
    mixed configs, format drift, and row-count mismatches (an append with
    the same config would re-apply merges out of order)."""
    from ..fs import get_url_and_fs

    path, fs = get_url_and_fs(url)
    df = spark.read.parquet(fs.spark_url(path))
    missing = [c for c in _BPE_META_COLS if c not in df.columns]
    if missing:
        raise ValueError(
            f"merge table at {url} lacks metadata column(s) {missing} — "
            f"rebuild with write_bpe_merges (current format v{_BPE_FORMAT})"
        )
    configs = [tuple(r) for r in df.select(*_BPE_META_COLS).distinct().limit(3).collect()]
    if len(configs) != 1:
        raise ValueError(
            f"merge table at {url} contains MIXED configs {configs} — "
            "it was appended to under different settings; rebuild it"
        )
    n_merges, fmt = configs[0]
    if fmt != _BPE_FORMAT:
        raise ValueError(
            f"merge table at {url} is format v{fmt}, this engine expects "
            f"v{_BPE_FORMAT} (merge-loop conventions changed) — rebuild it"
        )
    rows = df.select("rank", "left", "right").orderBy("rank").collect()
    if len(rows) != int(n_merges):
        raise ValueError(
            f"merge table at {url} has {len(rows)} rows but records "
            f"__n_merges={int(n_merges)} — it was appended to; rebuild it"
        )
    if [r["rank"] for r in rows] != list(range(1, len(rows) + 1)):
        raise ValueError(
            f"merge table at {url} has non-contiguous ranks — merges apply "
            "in rank order and a gap means a corrupted artifact; rebuild it"
        )
    return [(r["left"], r["right"]) for r in rows]


BPE_QUERIES = {
    "q_bpe_pair_stats": q_bpe_pair_stats,
    "q_bpe_learned_merges": q_bpe_learned_merges,
    "q_bpe_tokenized_lengths": q_bpe_tokenized_lengths,
    "q_pack_token_shards": q_pack_token_shards,
}

BPE_ORACLES = {
    "q_bpe_pair_stats": Q_BPE_PAIR_STATS_SQL,
    "q_bpe_learned_merges": Q_BPE_LEARNED_MERGES_SQL,
    "q_bpe_tokenized_lengths": Q_BPE_TOKENIZED_LENGTHS_SQL,
    "q_pack_token_shards": Q_PACK_TOKEN_SHARDS_SQL,
}
