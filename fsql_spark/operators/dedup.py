"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash,
embedding-cosine near-dup.

Scale design (the point of each variant):

- **exact**: one hash-groupBy shuffle on ``sha2(text)`` — at 100 TB this is
  the cheapest possible dedup (map-side partial aggregation applies, the
  shuffle carries only (hash, key) pairs when run in keys-only mode).
- **token/n-gram Jaccard (all-pairs)**: exact but quadratic in the worst
  case — the token-inverted-index self-join explodes on frequent tokens.
  Provided as the *oracle-able* exact formulation; use it on small/filtered
  candidate sets.
- **MinHash+LSH**: the scale path for near-dup. shingle -> k independent
  min-hashes (xxhash64 with seed salts, all JVM-side) -> band signatures ->
  bucket join => candidate pairs ~ O(true pairs), then exact-Jaccard refine.
  Banding makes the shuffle carry only (band-hash, doc) pairs.
- **SimHash**: 64-bit signature per doc (one map pass), near-dups = signatures
  within Hamming distance d; bucketed by rotated prefixes for a join-friendly
  formulation.
- **embedding cosine**: see ``similarity.py`` — near-dup = cosine above a
  threshold.

All hashing is deterministic (xxhash64/sha2/md5), so results are stable across
runs and cluster sizes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window


# --------------------------------------------------------------------------
# exact dedup
# --------------------------------------------------------------------------

def dedup_exact(df: DataFrame, content_cols: list[str], key_col: str) -> DataFrame:
    """Keep exactly one row per distinct content (the min key) — deterministic.

    Implementation: ranking window over the content hash. At scale prefer
    ``dedup_exact_keys`` (groupBy, map-side combinable) when only keys are
    needed."""
    h = F.sha2(F.concat_ws("\x01", *content_cols), 256)
    w = Window.partitionBy(h).orderBy(F.col(key_col).asc())
    return df.withColumn("__rn", F.row_number().over(w)).where(F.col("__rn") == 1).drop("__rn")


def dedup_exact_keys(df: DataFrame, content_cols: list[str], key_col: str) -> DataFrame:
    """Keys of the canonical (min-key) row per distinct content; single
    hash-aggregate shuffle."""
    h = F.sha2(F.concat_ws("\x01", *content_cols), 256)
    return df.groupBy(h.alias("__h")).agg(F.min(key_col).alias(key_col)).select(key_col)


def banding_for_threshold(threshold: float, num_hashes: int) -> tuple[int, int]:
    """Pick (bands, rows_per_band) for a target Jaccard threshold: among the
    divisor splits of ``num_hashes``, the one whose S-curve inflection
    ``(1/b)^(1/r)`` lands closest to ``threshold`` — the standard LSH
    parameter rule (Leskovec/Rajaraman/Ullman, MMDS §3.4.3). More bands =
    higher recall below the knee (more candidates); more rows = sharper
    cutoff. Deterministic, so a pinned catalog config stays explainable."""
    if not 0.0 < threshold < 1.0:
        raise ValueError(f"threshold must be in (0, 1), got {threshold}")
    if num_hashes < 2:
        raise ValueError(f"num_hashes must be >= 2, got {num_hashes}")
    best: tuple[float, int, int] | None = None
    for bands in range(1, num_hashes + 1):
        if num_hashes % bands:
            continue
        rows = num_hashes // bands
        knee = (1.0 / bands) ** (1.0 / rows)
        cand = (abs(knee - threshold), bands, rows)
        if best is None or cand < best:
            best = cand
    assert best is not None
    return best[1], best[2]


# --------------------------------------------------------------------------
# token-set / n-gram Jaccard (exact all-pairs; oracle-able)
# --------------------------------------------------------------------------

def _word_shingles(text: Column, n: int, distinct: bool = True, sep: str = "\x01") -> Column:
    """Word n-grams (n=1 => tokens); distinct=True for set semantics
    (Jaccard/MinHash), False for frequency-weighted/positional consumers
    (SimHash, passage windows). ``sep`` joins the window's tokens — the
    default control byte prevents cross-boundary collisions ('ab'+'c' vs
    'a'+'bc'); passage operators pass ' ' for human-readable output. Any
    SQL twin must join with the SAME separator (chr(1) for the default)."""
    if n == 1:
        words = F.split(text, " ")
        return F.array_distinct(words) if distinct else words

    # sliding window via transform over index range; JVM-side, no UDF.
    # k <= 0 (doc shorter than n tokens) must short-circuit to an EMPTY
    # array: Spark's sequence(0, -1) is a DESCENDING [0, -1], whose -1 index
    # then feeds slice(start=0) and throws INVALID_PARAMETER_VALUE
    def _of(words: Column) -> Column:
        k = F.size(words) - (n - 1)
        grams = F.when(k <= 0, F.array().cast("array<string>")).otherwise(
            F.transform(
                F.sequence(F.lit(0), k - 1),
                lambda i: F.concat_ws(sep, F.slice(words, i + 1, n)),
            )
        )
        return F.array_distinct(grams) if distinct else grams

    # let-binding via a 1-element outer transform: the lambda variable binds
    # split(text) ONCE per row. Inlining `split` directly would re-evaluate
    # it inside EVERY window lambda (Catalyst does not factor common
    # subexpressions into interpreted higher-order functions) — measured 7x
    # slower (2.9 s -> 0.4 s for the sf0.1 5-gram explosion).
    return F.transform(F.array(F.split(text, " ")), _of)[0]


#: logical-plan node names that imply an upstream exchange: such plans
#: already run at spark.sql.shuffle.partitions parallelism, and probing
#: them with .rdd would force AQE to finalize (and EXECUTE) their shuffle
#: stages eagerly — so _spread must not touch them
_SHUFFLED_PLAN_NODES = (
    "Join", "Aggregate", "Window", "Repartition", "Sort", "Deduplicate"
)


def _spread(df: DataFrame) -> DataFrame:
    """Round-robin the input across the cluster when it arrives in fewer
    partitions than cores — a single-file local table otherwise evaluates
    the whole shingle/window explosion (or a heavy signature expression) in
    ONE task. The (small) shuffle moves compact text rows BEFORE the
    explosion; results are row-local, so placement can't change them. On a
    real many-file corpus input parallelism already exists and this is a
    no-op.

    Applies only to narrow scan-shaped plans: if the logical plan already
    contains a shuffling operator, parallelism is already set by it AND the
    ``.rdd`` partition probe would make AQE finalize the plan eagerly —
    submitting its shuffle stages as immediate jobs that the caller's real
    action then recomputes. The logical-plan string check costs nothing."""
    if df.isStreaming:
        return df  # micro-batch sizing is the stream's own concern; .rdd throws
    plan = df._jdf.queryExecution().analyzed().toString()
    if any(node in plan for node in _SHUFFLED_PLAN_NODES):
        return df
    par = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < par:
        return df.repartition(par)
    return df


class CandidateExplosionError(ValueError):
    """The inverted-index self-join would materialize too many pairs."""


def jaccard_pairs(
    df: DataFrame,
    key_col: str,
    text_col: str,
    threshold: float,
    ngram: int = 1,
    max_candidate_pairs: int | None = 25_000_000,
    max_shingle_df: int | None = None,
) -> DataFrame:
    """Exact Jaccard-similar pairs over word n-gram sets.

    Inverted-index self-join: explode distinct shingles, join on shingle to
    form candidate pairs, verify with exact Jaccard on the full shingle sets.
    Quadratic on frequent shingles — the exact/oracle formulation; MinHash-LSH
    below is the scale path.

    Guard rails (the unguarded form OOMs the JVM on a frequent-shingle corpus
    — ~500M joined rows on the 31-word-vocab documents table at sf0.1):

    - ``max_candidate_pairs``: before joining, the candidate count is bounded
      above by sum_w C(df_w, 2) over shingle document frequencies (one cheap
      aggregate over the already-exploded tokens). If the bound exceeds the
      cap a :class:`CandidateExplosionError` is raised naming the remedies.
      ``None`` disables the check.
    - ``max_shingle_df``: drop shingles appearing in more than this many
      documents from CANDIDATE GENERATION only (the standard frequent-token
      cut); verification still uses the full sets, so emitted Jaccard values
      stay exact. Near-exact rather than exact: a pair whose every common
      shingle is frequent can be missed — at a high threshold such pairs
      barely exist (frequent shingles are shared with everyone, so they can't
      dominate a high-Jaccard pair's intersection alone).

    Contract: ``key_col`` values must be UNIQUE. The count-based verify of
    the no-cut path counts join rows per (k, k2) — with duplicate keys the
    shared shingles of every row-pair combination sum into one count
    (jaccard can exceed 1), while the ``max_shingle_df`` branch's
    array_intersect verify computes per-row-pair values, so the two
    branches would disagree on the same degenerate input (advice find).
    Deduplicate keys (or aggregate shingle sets per key) upstream; every
    catalog caller feeds uniquely-keyed document tables.
    """
    base = _spread(df).select(
        F.col(key_col).alias("k"), _word_shingles(F.col(text_col), ngram).alias("sh")
    )
    tok = base.select("k", F.explode("sh").alias("w"))
    cand_tok = tok
    if max_shingle_df is not None:
        # broadcast the FREQUENT set (few shingles by Zipf — KBs) and anti-join
        # it away; broadcasting the rare set would ship the large side
        dfreq = tok.groupBy("w").agg(F.count(F.lit(1)).alias("df_w"))
        frequent = dfreq.where(F.col("df_w") > max_shingle_df).select("w")
        cand_tok = tok.join(F.broadcast(frequent), "w", "left_anti")
    if max_candidate_pairs is not None:
        est = (
            cand_tok.groupBy("w")
            .agg(F.count(F.lit(1)).alias("n"))
            .agg(F.sum(F.col("n") * (F.col("n") - 1) / 2).alias("pairs"))
            .collect()[0]["pairs"]
            or 0
        )
        if est > max_candidate_pairs:
            raise CandidateExplosionError(
                f"jaccard_pairs would join up to {int(est):,} candidate pairs "
                f"(cap {max_candidate_pairs:,}). Use minhash_lsh_pairs (the "
                "bucketed scale path), set max_shingle_df to cut frequent "
                "shingles from candidate generation, or raise "
                "max_candidate_pairs explicitly."
            )
    t2 = cand_tok.select(F.col("k").alias("k2"), F.col("w").alias("w2"))
    if max_shingle_df is None:
        # no frequency cut => the candidate join already touches every
        # shared DISTINCT shingle of every pair exactly once, so
        # |intersection| is a COUNT on the join output (the formulation the
        # DuckDB oracle uses) — map-side partial aggregation spreads the
        # work that the old distinct-pairs + array_intersect verify
        # concentrated into one AQE-coalesced task (small pair bytes, heavy
        # per-row array CPU)
        common = (
            cand_tok.join(t2, (cand_tok.w == t2.w2) & (cand_tok.k < t2.k2))
            .groupBy("k", "k2")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        sizes = base.select("k", F.size("sh").alias("n"))
        s2n = sizes.select(F.col("k").alias("k2"), F.col("n").alias("n2"))
        jac = F.col("c") / (F.col("n") + F.col("n2") - F.col("c"))
        return (
            common.join(sizes, "k")
            .join(s2n, "k2")
            .where(jac >= threshold)
            .select(
                F.col("k").alias("doc_a"),
                F.col("k2").alias("doc_b"),
                F.round(jac, 4).alias("jaccard"),
            )
        )
    cand_keys = (
        cand_tok.join(t2, (cand_tok.w == t2.w2) & (cand_tok.k < t2.k2))
        .select("k", "k2")
        .distinct()
    )
    # under max_shingle_df the cut index undercounts shared shingles, so
    # verify on the FULL shingle sets (exact even under the cut)
    s1 = base.select("k", "sh")
    s2 = base.select(F.col("k").alias("k2"), F.col("sh").alias("sh2"))
    cands = cand_keys.join(s1, "k").join(s2, "k2")
    inter = F.size(F.array_intersect("sh", "sh2"))
    jac = inter / (F.size("sh") + F.size("sh2") - inter)
    return (
        cands.where(jac >= threshold)
        .select(
            F.col("k").alias("doc_a"),
            F.col("k2").alias("doc_b"),
            F.round(jac, 4).alias("jaccard"),
        )
    )


def prefix_filter_pairs(
    df: DataFrame,
    key_col: str,
    text_col: str,
    threshold: float,
    ngram: int = 1,
) -> DataFrame:
    """EXACT Jaccard-similar pairs via prefix filtering (the All-Pairs /
    PPJoin family, Chaudhuri 2006 / Xiao 2008) — same output contract as
    :func:`jaccard_pairs`, but the candidate join touches only each set's
    PREFIX instead of its whole inverted index, so no frequency cut and no
    candidate-explosion cap are needed: the algorithm is exact AND bounded.

    The lemma: under any fixed global token order, two sets with
    ``J >= t`` must share a token among the first ``|x| - ceil(t*|x|) + 1``
    of each (a qualifying pair intersects in >= ceil(t*|x|) tokens, and a
    subset that large cannot avoid the prefix). Ordering tokens RAREST
    FIRST makes prefixes maximally selective: the quadratic blowup of
    stop-word postings disappears because stop words live in suffixes. At
    t=0.95 the prefix is ~5% of each set — candidate volume drops by
    ~400x vs the full inverted index, which is the difference between an
    exact join finishing at corpus scale and needing the LSH fallback.

    Plan: one token-keyed shuffle to attach document frequencies, one
    per-doc sort (rarest first) to cut prefixes, the prefix-keyed
    candidate equi-join with the standard size filter
    (``t*|x| <= |y| <= |x|/t``), then exact verification on the full
    shingle sets. Float guards (the 1e-9 slacks) only ever ADMIT extra
    candidates — verification keeps the result exact."""
    if not (0.0 < threshold <= 1.0):
        # t > 1 makes the prefix length non-positive (F.slice throws an
        # opaque runtime error deep in the plan); t <= 0 silently
        # degenerates to the full quadratic join — both are caller bugs.
        raise ValueError(
            f"threshold must be in (0, 1], got {threshold!r}"
        )
    base = _spread(df).select(
        F.col(key_col).alias("k"), _word_shingles(F.col(text_col), ngram).alias("sh")
    )
    base = base.where(F.size("sh") > 0)
    tok = base.select("k", F.size("sh").alias("s"), F.explode("sh").alias("w"))
    dfreq = tok.groupBy("w").agg(F.count(F.lit(1)).alias("dfw"))
    # dfreq is corpus-VOCABULARY-sized: AQE's post-agg size estimate can
    # look broadcastable while the real build blows the driver (measured:
    # sf10 "Not enough memory to build and broadcast" before the hint) —
    # pin both token-keyed joins to shuffled hash
    ordered = tok.join(dfreq.hint("shuffle_hash"), "w")
    # prefix length |x| - ceil(t*|x|) + 1; the -1e-9 keeps a float ceil
    # from rounding UP past an exact integer product (which would shorten
    # the prefix and silently drop qualifying pairs)
    pref_len = (
        F.col("s") - F.ceil(F.col("s") * F.lit(threshold) - F.lit(1e-9)) + 1
    ).cast("int")
    prefixes = (
        ordered.groupBy("k", "s")
        .agg(F.sort_array(F.collect_list(F.struct("dfw", "w"))).alias("toks"))
        .select(
            "k", "s",
            F.explode(F.slice("toks", F.lit(1), pref_len)).alias("t"),
        )
        .select("k", "s", F.col("t.w").alias("w"))
    )
    p2 = prefixes.select(
        F.col("k").alias("k2"), F.col("s").alias("s2"), F.col("w")
    )
    size_ok = (
        (F.col("s2") >= F.col("s") * F.lit(threshold) - F.lit(1e-9))
        & (F.col("s") >= F.col("s2") * F.lit(threshold) - F.lit(1e-9))
    )
    cand_keys = (
        prefixes.join(p2.hint("shuffle_hash"), "w")
        .where((F.col("k") < F.col("k2")) & size_ok)
        .select("k", "k2")
        .distinct()
    )
    s1 = base.select("k", "sh")
    s2 = base.select(F.col("k").alias("k2"), F.col("sh").alias("sh2"))
    cands = cand_keys.join(s1, "k").join(s2, "k2")
    inter = F.size(F.array_intersect("sh", "sh2"))
    jac = inter / (F.size("sh") + F.size("sh2") - inter)
    return cands.where(jac >= threshold).select(
        F.col("k").alias("doc_a"),
        F.col("k2").alias("doc_b"),
        F.round(jac, 4).alias("jaccard"),
    )


# --------------------------------------------------------------------------
# MinHash + LSH (scale path)
# --------------------------------------------------------------------------

def minhash_signatures(
    df: DataFrame, key_col: str, text_col: str, num_hashes: int = 32, ngram: int = 3
) -> DataFrame:
    """k min-hashes per doc, computed by a vectorized Arrow-batched kernel
    (see ``_hashing`` for why not a Column expression). One map pass, no
    shuffle; signature is an array<long>; the shingle set rides along for
    exact verification."""
    import pandas as pd

    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType, LongType

    from ._hashing import minhash_batch

    def _sig(texts):
        return minhash_batch(texts, num_hashes, ngram)

    _sig.__annotations__ = {"texts": pd.Series, "return": pd.Series}
    sig_udf = pandas_udf(_sig, ArrayType(LongType()))
    sh = _word_shingles(F.col(text_col), ngram)
    # spread here, the shared entry point: every consumer (within-corpus
    # pairs, cross-corpus batches, the persisted-table build) gets a
    # parallel kernel on single-file inputs.
    # Empty shingle sets (empty/whitespace-only docs, docs shorter than the
    # n-gram) are EXCLUDED: Jaccard is undefined on empty sets, their
    # constant signatures collide in every band (an all-empty-docs bucket is
    # a quadratic blowup AND a 0/0 in the verify join under ANSI mode —
    # found by the degenerate-corpus regression test), and the exact
    # inverted-index path drops them identically (no shingles -> no index
    # rows -> no pairs). Empty docs are exact-dedup's job, not near-dup's.
    return (
        _spread(df)
        .select(
            F.col(key_col).alias("k"), sig_udf(F.col(text_col)).alias("sig"), sh.alias("sh")
        )
        .where(F.size("sh") > 0)
    )


def _check_sig_width(sigs: DataFrame, num_hashes: int) -> None:
    """A caller-supplied signature table MUST be k-wide for the caller's
    ``num_hashes``: banding indexes sig[b*r+r'], and an out-of-range index
    resolves to NULL, which xxhash64 then IGNORES — short signatures make
    the tail bands hash a constant, i.e. one bucket containing EVERY doc
    (an accidental cross product), with no error raised. One-row probe."""
    if getattr(sigs, "_fsql_sig_width", None) == num_hashes:
        # table came straight from read_corpus_signatures, whose whole-table
        # config check already proved every row is num_hashes-wide — skip
        # the probe job (any transformation yields a NEW DataFrame object
        # without the tag, so a caller reshaping the table still gets probed)
        return
    row = sigs.select(F.size("sig").alias("w")).limit(1).collect()
    if row and row[0]["w"] != num_hashes:
        raise ValueError(
            f"signature table is {row[0]['w']}-wide but caller expects "
            f"num_hashes={num_hashes} — was it built with a different config?"
        )


def _banded_buckets(sigs: DataFrame, bands: int, rows_per_band: int) -> DataFrame:
    """(k, band, bucket) from a signature table — ONLY the narrow key triple
    rides the bucket-join shuffle, never signatures or shingle arrays."""
    return sigs.select(
        "k",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            *[F.col("sig")[b * rows_per_band + r] for r in range(rows_per_band)]
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("k", "bb.band", "bb.bucket")


def minhash_lsh_pairs(
    df: DataFrame | None,
    key_col: str,
    text_col: str,
    threshold: float = 0.7,
    num_hashes: int = 32,
    bands: int = 8,
    ngram: int = 3,
    sigs: DataFrame | None = None,
    collapse_exact: bool = False,
) -> DataFrame:
    """Near-dup pairs via banded MinHash-LSH with exact-Jaccard verification.

    bands×rows banding: docs agreeing on any band become candidates
    (P[candidate] = 1-(1-j^r)^b). The bucket join shuffles only
    (band_hash, doc) pairs — linear in corpus size for realistic dup rates.
    Candidates are then verified with exact Jaccard on their shingle sets, so
    the output has no false positives (recall is the LSH knob).

    ``sigs``: a precomputed (k, sig, sh) signature table (e.g. from
    :func:`read_corpus_signatures` / :func:`corpus_signatures_cached`) —
    the corpus text is then never touched; ``df`` may be None. At 100 TB the
    corpus is hashed exactly once and every consumer (near-dup pairs at any
    threshold, clustering, incremental batches) joins the slim table.

    ``collapse_exact``: collapse exact-duplicate texts to their canonical
    (min-key) representative BEFORE signing. A crawl's dup classes make
    near-dup output quadratic *by definition* (an m-copy class alone is
    m·(m-1)/2 pairs — at web scale a single boilerplate page is millions of
    copies, i.e. 10^12 pairs from ONE class); collapsing first makes the
    banding candidate count track DISTINCT contents. Returned pairs then
    relate representatives only — recover full classes with
    :func:`dedup_exact_keys` (one cheap hash-aggregate), which is how a real
    pipeline separates the exact-dup layer from the near-dup layer anyway."""
    if sigs is None and df is None:
        raise ValueError("pass either df or sigs")
    if collapse_exact and sigs is not None:
        # a signed table has no text left to collapse — silently ignoring the
        # flag would hand back the quadratic within-class pairs the caller
        # asked to suppress
        raise ValueError(
            "collapse_exact requires the raw corpus (df); it cannot be applied "
            "to a precomputed signature table — collapse before signing, or "
            "pass df instead of sigs"
        )
    if collapse_exact:
        df = dedup_exact(df, [text_col], key_col)
    rows_per_band = num_hashes // bands
    if sigs is not None:
        _check_sig_width(sigs, num_hashes)
        # defensive twin of the v3 build-time exclusion: a caller-supplied
        # signature frame (bypassing read_corpus_signatures' format gate)
        # may still carry empty-shingle rows — constant signatures that
        # collide in every band and 0/0 in the verify join
        sigs = sigs.where(F.size("sh") > 0)
    if sigs is None:
        # persist signatures: both sides of the self-join (and the verify
        # step) reuse them instead of recomputing k*|shingles| hashes per
        # reference. At scale this is a slim table: key + k longs + shingles.
        sigs = minhash_signatures(df, key_col, text_col, num_hashes, ngram).persist()
        # materialize before planning the self-join: AQE submits both band
        # sides' map stages concurrently and two racing cache-miss scans
        # each run the full signature kernel (same fix as the phash entry)
        sigs.count()
    banded = _banded_buckets(sigs, bands, rows_per_band)
    other = banded.select(
        F.col("k").alias("k2"), F.col("band").alias("band2"), F.col("bucket").alias("bucket2")
    )
    cand_keys = (
        banded.join(
            other,
            (banded.band == other.band2) & (banded.bucket == other.bucket2) & (banded.k < other.k2),
        )
        .select("k", "k2")
        .distinct()
    )
    # fetch shingle sets only for surviving candidate pairs
    s1 = sigs.select("k", "sh")
    s2 = sigs.select(F.col("k").alias("k2"), F.col("sh").alias("sh2"))
    cands = cand_keys.join(s1, "k").join(s2, "k2")
    inter = F.size(F.array_intersect("sh", "sh2"))
    union = F.size("sh") + F.size("sh2") - inter
    jac = inter / union
    return (
        cands.where(jac >= threshold)
        .select(F.col("k").alias("doc_a"), F.col("k2").alias("doc_b"), F.round(jac, 4).alias("jaccard"))
    )


# --------------------------------------------------------------------------
# incremental (cross-corpus) dedup: new batch vs existing corpus
# --------------------------------------------------------------------------

def _content_hash(content_cols: list[str], normalize: bool) -> Column:
    """Canonical 256-bit content hash shared by every incremental-dedup
    path (exact anti-join and bloom prefilter must agree bit-for-bit)."""
    from .text import normalize_text

    cols = [normalize_text(c) if normalize else F.col(c) for c in content_cols]
    return F.sha2(F.concat_ws("\x01", *cols), 256)


def dedup_against(
    df_new: DataFrame,
    corpus: DataFrame,
    content_cols: list[str],
    normalize: bool = False,
) -> DataFrame:
    """Rows of ``df_new`` whose content does NOT already appear in ``corpus``
    — the incremental-ingest dedup (new crawl vs training corpus).

    Scale shape: the corpus collapses to its DISTINCT content hashes first
    (map-side combinable aggregate — the 100 TB corpus becomes a hash set,
    never re-read per batch), then one left-anti hash join; only 32-byte
    hashes ride the shuffle. ``normalize=True`` applies the standard
    pre-dedup canonicalization (case/whitespace variants count as dups).
    Within-batch duplicates are NOT removed — compose with
    :func:`dedup_exact` for that."""
    h = _content_hash(content_cols, normalize)
    seen = corpus.select(h.alias("__h")).distinct()
    return df_new.withColumn("__h", h).join(seen, "__h", "left_anti").drop("__h")


def _bloom_params(n: int, fpp: float, max_bits: int) -> tuple[int, int]:
    """Standard sizing ``m = -n ln(p) / ln(2)^2``, ``j = (m/n) ln 2``,
    rounded to a byte multiple and capped at ``max_bits``."""
    import math

    n = max(int(n), 1)
    m = int(-n * math.log(fpp) / (math.log(2) ** 2))
    n_bits = min(max(((m + 7) // 8) * 8, 64), max_bits)
    n_hashes = max(int(round(n_bits / n * math.log(2))), 1)
    return n_bits, min(n_hashes, 8)  # sha2-256 yields 8 independent 32-bit words


def _bloom_from_hashes(hashed: DataFrame, n_bits: int, n_hashes: int) -> bytes:
    """Fold a DataFrame of 32-byte sha2 values (column ``hb``, binary) into
    one Bloom bitmap. Each task builds ONE local bitmap per Arrow stream;
    partials merge pairwise ON EXECUTORS via treeReduce (the one place an
    RDD op is the right tool: OR-merging opaque byte buffers is exactly the
    mergeable-sketch reduction), so the driver receives a single bitmap —
    not partitions x bitmap-size bytes. Bit positions come from the hash
    itself (j-th 32-bit big-endian word mod n_bits): deterministic, no RNG,
    no partitioning sensitivity."""
    import numpy as np
    import pandas as pd

    from pyspark.sql.types import BinaryType, StructField, StructType

    schema = StructType([StructField("bm", BinaryType())])

    def _partials(batches):
        bm = np.zeros(n_bits // 8, dtype=np.uint8)
        for pdf in batches:
            if not len(pdf):
                continue
            raw = np.frombuffer(b"".join(pdf["hb"]), dtype=">u4").reshape(-1, 8)
            for j in range(n_hashes):
                idx = raw[:, j] % n_bits
                np.bitwise_or.at(bm, idx >> 3, (1 << (idx & 7)).astype(np.uint8))
        yield pd.DataFrame({"bm": [bm.tobytes()]})

    def _or(a: bytes, b: bytes) -> bytes:
        return (
            np.frombuffer(a, dtype=np.uint8) | np.frombuffer(b, dtype=np.uint8)
        ).tobytes()

    parts = hashed.mapInPandas(_partials, schema).rdd.map(lambda r: r["bm"])
    # _partials yields one bitmap per partition unconditionally, so the RDD
    # is empty only for a zero-partition input (guarded WITHOUT a job —
    # isEmpty() would execute the whole fold a second time)
    if parts.getNumPartitions() == 0:
        return bytes(n_bits // 8)
    # bytes(): a single-partition RDD skips _or entirely and treeReduce
    # hands back the raw Row value (a bytearray) — honor the declared type
    return bytes(parts.treeReduce(_or, depth=2))


def bloom_build(
    corpus: DataFrame,
    content_cols: list[str],
    normalize: bool = False,
    expected_items: int | None = None,
    fpp: float = 0.01,
    max_bits: int = 1 << 30,
) -> tuple[bytes, int, int]:
    """Build a Bloom filter bitmap over the corpus' content hashes:
    ``(bitmap_bytes, n_bits, n_hash_functions)``. See
    :func:`_bloom_from_hashes` for the merge shape (executor-side
    treeReduce; the driver gets ONE bitmap). 2^30 bits = 128 MiB handles
    ~10^8 items at 1% — shard by content-hash prefix above that.

    Standalone convenience; :func:`dedup_against_bloom` builds from its
    cached distinct-hash relation instead so the corpus is scanned once."""
    if expected_items is None:
        expected_items = corpus.count()
    n_bits, n_hashes = _bloom_params(expected_items, fpp, max_bits)
    h = _content_hash(content_cols, normalize)
    hashed = corpus.select(F.unhex(h).alias("hb"))  # 32 raw bytes per row
    return _bloom_from_hashes(hashed, n_bits, n_hashes), n_bits, n_hashes


def write_bloom(path: str, bm_bytes: bytes, n_bits: int, n_hashes: int) -> None:
    """Persist a Bloom bitmap + its parameters — the sketch-as-ingest-
    artifact lifecycle (same idea as :func:`write_corpus_signatures`): at
    100 TB the corpus bitmap is built once at ingest time and every future
    batch/stream loads the megabytes-sized artifact instead of re-scanning
    the corpus."""
    import json
    import os

    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "bloom.bin"), "wb") as fd:
        fd.write(bm_bytes)
    with open(os.path.join(path, "meta.json"), "w") as fd:
        json.dump({"n_bits": n_bits, "n_hashes": n_hashes, "fmt": 1}, fd)


def read_bloom(path: str) -> tuple[bytes, int, int]:
    """Load a persisted Bloom bitmap written by :func:`write_bloom`."""
    import json
    import os

    with open(os.path.join(path, "meta.json")) as fd:
        meta = json.load(fd)
    if meta.get("fmt") != 1:
        raise ValueError(f"unknown bloom artifact format at {path}: {meta}")
    with open(os.path.join(path, "bloom.bin"), "rb") as fd:
        bm = fd.read()
    if len(bm) * 8 != meta["n_bits"]:
        raise ValueError(
            f"bloom artifact at {path} is {len(bm) * 8} bits but meta says {meta['n_bits']}"
        )
    return bm, meta["n_bits"], meta["n_hashes"]


def corpus_bloom_cached(
    spark: SparkSession,
    sf_dir: str,
    content_cols: tuple[str, ...] = ("text",),
    normalize: bool = True,
    fpp: float = 0.01,
    table: str = "documents",
) -> tuple[bytes, int, int]:
    """Compute-once corpus Bloom bitmap for a testdata sf dir (build-once
    /tmp cache keyed by source mtime + config, like the signature cache):
    the first caller folds the corpus; later callers load the bitmap file.
    This is the production lifecycle q_stream_ingest_dedup models — the
    stream never pays the corpus scan."""
    from ..fsql_catalog import _build_once, _tree_dir

    cfg = f"{'_'.join(content_cols)}_n{int(normalize)}_p{fpp}"

    def build(staging: str) -> None:
        docs = spark.read.parquet(f"{sf_dir}/{table}.parquet")
        bm, n_bits, n_hashes = bloom_build(docs, list(content_cols), normalize, fpp=fpp)
        write_bloom(staging, bm, n_bits, n_hashes)

    dest = _build_once(_tree_dir(sf_dir, f"bloom_{table}_{cfg}", table), build)
    return read_bloom(dest)


def dedup_against_bloom(
    df_new: DataFrame,
    corpus: DataFrame,
    content_cols: list[str],
    normalize: bool = False,
    expected_items: int | None = None,
    fpp: float = 0.01,
    max_bits: int = 1 << 30,
    cache_corpus_hashes: bool = True,
    bloom: tuple[bytes, int, int] | None = None,
) -> DataFrame:
    """Exact incremental dedup with a broadcast Bloom prefilter — the
    100 TB shape of :func:`dedup_against`: the corpus compresses to a
    megabytes-sized bitmap once, each ingest batch tests against the
    BROADCAST bitmap map-side, and only might-contain rows (true dups +
    ~fpp false positives) reach the exact anti-join. Rows the filter
    rejects are DEFINITELY novel (no false negatives), so the result is
    bit-identical to :func:`dedup_against` — approximation shrinks the
    join, never the answer.

    The corpus text is scanned/hashed ONCE: the distinct-hash relation is
    persisted, sized (its count is also a tighter bloom ``n`` than raw row
    count), folded into the bitmap, and reused as the anti-join's build
    side. That cache lives as long as the RETURNED DataFrame does (the
    result depends on it, so it cannot be unpersisted here) — a session
    looping over many corpora should ``spark.catalog.clearCache()``
    between them or pass ``cache_corpus_hashes=False`` (the hash relation
    is then recomputed by the anti-join: two corpus passes, zero pinned
    storage).

    Pass ``bloom`` (a :func:`read_bloom`/:func:`bloom_build` triple) to
    skip the build entirely — the persisted-artifact lifecycle: the bitmap
    was folded at corpus-ingest time and each batch/stream just loads it.
    The exact anti-join still consults the corpus, but only might-contain
    rows reach it."""
    import numpy as np
    import pandas as pd

    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import BooleanType

    h = _content_hash(content_cols, normalize)
    # one corpus pass: distinct hashes persist, then feed (a) the sizing
    # count, (b) the bitmap fold, (c) the exact anti-join build side
    seen = corpus.select(h.alias("__h")).distinct()
    if cache_corpus_hashes:
        seen = seen.persist()
    if bloom is not None:
        bm_bytes, n_bits, n_hashes = bloom
        # r15 A/B note: under a streaming df_new the micro-batch planner
        # re-runs this static subtree per batch; both an eager count (pin
        # the cache) and localCheckpoint (materialized blocks in-plan) were
        # tried on q_stream_ingest_dedup and LOST (3.34 s baseline vs 3.47
        # eager-count vs 4.69 checkpoint warm) — the per-batch rebuild is
        # not the floor, the lazy persist stays.
    else:
        n = seen.count() if expected_items is None else expected_items
        n_bits, n_hashes = _bloom_params(n, fpp, max_bits)
        bm_bytes = _bloom_from_hashes(
            seen.select(F.unhex("__h").alias("hb")), n_bits, n_hashes
        )
    spark = df_new.sparkSession
    bc = spark.sparkContext.broadcast(bm_bytes)

    def _might(hb):
        bm = np.frombuffer(bc.value, dtype=np.uint8)
        if not len(hb):
            return pd.Series([], dtype=bool)
        raw = np.frombuffer(b"".join(hb), dtype=">u4").reshape(-1, 8)
        ok = np.ones(len(hb), dtype=bool)
        for j in range(n_hashes):
            idx = raw[:, j] % n_bits
            ok &= (bm[idx >> 3] & (1 << (idx & 7)).astype(np.uint8)) != 0
        return pd.Series(ok)

    _might.__annotations__ = {"hb": pd.Series, "return": pd.Series}
    might_udf = pandas_udf(_might, BooleanType())

    flagged = df_new.withColumn("__h", h).withColumn("__might", might_udf(F.unhex(F.col("__h"))))
    definitely_novel = flagged.where(~F.col("__might"))
    survivors = flagged.where(F.col("__might")).join(seen, "__h", "left_anti")
    return definitely_novel.unionByName(survivors).drop("__h", "__might")


#: constant metadata columns stored with persisted signature tables so a
#: batch computed under a different (num_hashes, ngram) config fails loudly
#: instead of silently bucketing garbage
_SIG_META_COLS = ("__num_hashes", "__ngram", "__sig_fmt")

#: signature FORMAT version, bumped whenever the shingle/kernel definition
#: changes in a value-affecting way (the in-repo /tmp cache fingerprints the
#: kernel source, but a persisted table outlives the code that wrote it: a
#: format mismatch there would silently produce zero-recall bucket joins).
#: v2 = "\x01"-separated word shingles + per-seed xxhash minhash kernel.
#: v3 = v2 minus empty-shingle rows (empty/sub-ngram docs are excluded at
#: the signature entry point; a v2 table may contain constant-signature
#: empty rows that collide in every band — quadratic candidates + 0/0 in
#: the verify join — so v2 tables must be rebuilt, not silently accepted).
_SIG_FORMAT = 3


def write_corpus_signatures(
    corpus: DataFrame,
    key_col: str,
    text_col: str,
    url: str,
    num_hashes: int = 64,
    ngram: int = 3,
) -> None:
    """Materialize the corpus MinHash signature table (key, sig, shingles)
    to storage — the 100 TB incremental-dedup shape: the corpus text is
    hashed exactly ONCE, and every future ingest batch joins against this
    slim table (key + k longs + shingle set) instead of re-reading and
    re-hashing the corpus. The (num_hashes, ngram) config AND the signature
    format version are stored as constant columns and validated on read."""
    from ..api import write_table

    sigs = minhash_signatures(corpus, key_col, text_col, num_hashes, ngram)
    sigs = (
        sigs.withColumn("__num_hashes", F.lit(num_hashes))
        .withColumn("__ngram", F.lit(ngram))
        .withColumn("__sig_fmt", F.lit(_SIG_FORMAT))
    )
    write_table(sigs, url)


def read_corpus_signatures(
    spark: SparkSession, url: str, num_hashes: int, ngram: int
) -> DataFrame:
    """Read a persisted signature table, validating that EVERY row was built
    with the SAME (num_hashes, ngram) the caller's batch side will use —
    mixed configs (e.g. a table appended to under a different config)
    produce structurally-valid but meaningless bucket joins, so the check is
    an aggregate over the whole table, not a first-row sample. The distinct
    scan reads only the two dictionary-encoded constant columns (column
    pruning), so it stays metadata-cheap even on a large signature table."""
    from ..fs import get_url_and_fs

    path, fs = get_url_and_fs(url)
    df = spark.read.parquet(fs.spark_url(path))
    missing = [c for c in _SIG_META_COLS if c not in df.columns]
    if missing:
        # a table from before the format column existed predates the current
        # shingle/kernel definition: joining it against freshly-hashed batch
        # signatures would return ZERO matches with no error — refuse loudly
        raise ValueError(
            f"signature table at {url} lacks metadata column(s) {missing} — "
            f"it was written by an older signature format (current: "
            f"v{_SIG_FORMAT}); rebuild it with write_corpus_signatures"
        )
    configs = [tuple(r) for r in df.select(*_SIG_META_COLS).distinct().limit(3).collect()]
    if len(configs) != 1 or configs[0] != (num_hashes, ngram, _SIG_FORMAT):
        raise ValueError(
            f"signature table at {url} was built with (num_hashes, ngram, sig_fmt)="
            f"{configs if configs else None}, caller expects "
            f"({num_hashes}, {ngram}, {_SIG_FORMAT})"
            + (" — table contains MIXED configs" if len(configs) > 1 else "")
        )
    out = df.drop(*_SIG_META_COLS)
    # the config check above proves every row's width: let _check_sig_width
    # skip its one-row probe job for this exact DataFrame object
    out._fsql_sig_width = num_hashes
    return out


def corpus_signatures_cached(
    spark: SparkSession,
    sf_dir: str,
    num_hashes: int = 64,
    ngram: int = 3,
    table: str = "documents",
    key_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Compute-once corpus MinHash signatures for a testdata sf dir: the
    first caller materializes them via :func:`write_corpus_signatures` into
    a fingerprinted /tmp cache (same build-once/staging-rename discipline as
    the fsql partition trees; regenerated testdata invalidates by mtime);
    every later caller — near-dup pairs at any threshold, cluster
    resolution, incremental batches — reads the slim (key, sig, shingles)
    table instead of re-reading and re-hashing the corpus text. This is the
    100 TB signature lifecycle, exercised by the catalog itself."""
    from ..fsql_catalog import _build_once, _tree_dir

    # unlike the partition trees (pure relayouts of source data), cached
    # SIGNATURE VALUES depend on the hash kernels: fingerprint the kernel
    # code into the cache key so a kernel change invalidates the cache
    # instead of silently joining old-kernel corpus signatures against
    # new-kernel batch signatures (recall collapse with no error)
    import hashlib
    import inspect

    from . import _hashing

    # minhash_signatures itself is fingerprinted too: it owns row-set
    # semantics (e.g. the v3 empty-shingle exclusion), not just the hash
    # values (review find: a semantics change there must invalidate caches)
    kern = hashlib.md5(
        inspect.getsource(_hashing).encode()
        + inspect.getsource(_word_shingles).encode()
        + inspect.getsource(minhash_signatures).encode()
    ).hexdigest()[:8]

    def build(staging: str) -> None:
        # minhash_signatures spreads single-split inputs itself, so the
        # kernel and the parquet encode run across cores here too
        docs = spark.read.parquet(f"{sf_dir}/{table}.parquet")
        write_corpus_signatures(docs, key_col, text_col, staging, num_hashes, ngram)

    dest = _build_once(
        _tree_dir(sf_dir, f"sigs_{table}_nh{num_hashes}_ng{ngram}_k{kern}", table), build
    )
    return read_corpus_signatures(spark, dest, num_hashes, ngram)


def minhash_lsh_pairs_against(
    df_new: DataFrame,
    corpus: DataFrame | None,
    key_col: str,
    text_col: str,
    threshold: float = 0.7,
    num_hashes: int = 32,
    bands: int = 8,
    ngram: int = 3,
    corpus_sigs: DataFrame | None = None,
) -> DataFrame:
    """Near-dup pairs BETWEEN a new batch and an existing corpus (never
    within either side): banded MinHash buckets on both sides, bucket join,
    exact-Jaccard verify — same guarantees as :func:`minhash_lsh_pairs`
    (no false positives; recall is the banding knob).

    Scale shape: corpus signatures are a slim (key, sig, shingles) table —
    at 100 TB they are computed once via :func:`write_corpus_signatures` and
    each incoming batch joins against the materialized table (pass it as
    ``corpus_sigs``, from :func:`read_corpus_signatures`; ``corpus`` is then
    ignored and may be None). Without ``corpus_sigs`` both sides are derived
    in-plan. The bucket join shuffles narrow (band, bucket, key) triples;
    shingle sets are re-attached only to surviving candidates.

    Output: (new_key, corpus_key, jaccard)."""
    rows_per_band = num_hashes // bands
    new_sigs = minhash_signatures(df_new, key_col, text_col, num_hashes, ngram).persist()
    new_sigs.count()  # see minhash_lsh_pairs: un-built caches race under AQE
    if corpus_sigs is None:
        if corpus is None:
            raise ValueError("pass either corpus or corpus_sigs")
        corpus_sigs = minhash_signatures(corpus, key_col, text_col, num_hashes, ngram).persist()
        corpus_sigs.count()
    else:
        _check_sig_width(corpus_sigs, num_hashes)
        corpus_sigs = corpus_sigs.where(F.size("sh") > 0)  # see minhash_lsh_pairs
    new_banded = _banded_buckets(new_sigs, bands, rows_per_band)
    corpus_banded = _banded_buckets(corpus_sigs, bands, rows_per_band).select(
        F.col("k").alias("k2"), F.col("band").alias("band2"), F.col("bucket").alias("bucket2")
    )
    cand_keys = (
        new_banded.join(
            corpus_banded,
            (new_banded.band == corpus_banded.band2)
            & (new_banded.bucket == corpus_banded.bucket2),
        )
        .select("k", "k2")
        .distinct()
    )
    s1 = new_sigs.select("k", "sh")
    s2 = corpus_sigs.select(F.col("k").alias("k2"), F.col("sh").alias("sh2"))
    cands = cand_keys.join(s1, "k").join(s2, "k2")
    inter = F.size(F.array_intersect("sh", "sh2"))
    union = F.size("sh") + F.size("sh2") - inter
    jac = inter / union
    return cands.where(jac >= threshold).select(
        F.col("k").alias("new_key"),
        F.col("k2").alias("corpus_key"),
        F.round(jac, 4).alias("jaccard"),
    )


# --------------------------------------------------------------------------
# SimHash
# --------------------------------------------------------------------------

def simhash(text: Column, bits: int = 64, ngram: int = 1) -> Column:
    """64-bit frequency-weighted SimHash via a vectorized Arrow-batched
    kernel. (The pure-expression formulation needs 64 array passes per row,
    overflows whole-stage codegen's method limit and runs interpreted —
    measured ~50x slower; see ``_hashing``.)"""
    import pandas as pd

    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import LongType

    from ._hashing import simhash_batch

    if bits != 64:
        raise ValueError("simhash supports 64-bit signatures")

    def _sig(texts):
        return simhash_batch(texts, ngram)

    _sig.__annotations__ = {"texts": pd.Series, "return": pd.Series}
    return pandas_udf(_sig, LongType())(text)


def simhash_pairs(
    df: DataFrame,
    key_col: str,
    text_col: str,
    max_hamming: int = 3,
    bits: int = 64,
    collapse_exact: bool | str = False,
) -> DataFrame:
    """Pairs within Hamming distance d of SimHash signatures.

    Block-permutation bucketing: split the signature into (d+1) blocks — any
    pair within distance d agrees exactly on >=1 block (pigeonhole), so the
    join key is (block_idx, block_value): linear shuffle, exact verify after.

    ``collapse_exact``: collapse exact-duplicate texts to their canonical
    (min-key) representative BEFORE signing — same lever as
    :func:`minhash_lsh_pairs`. Exact copies have hamming distance 0 by
    definition, so an m-copy class alone emits m·(m-1)/2 qualifying pairs:
    the bucketing join is linear but the OUTPUT is quadratic in dup-class
    size (measured ~121x pair growth at 10x data on the sf1 corpus).
    Collapsing makes the output track DISTINCT contents; recover full
    classes with :func:`dedup_exact_keys` (one hash-aggregate).
    Three settings: ``False`` (no collapse), ``True`` (always collapse —
    no probing, for callers who know dup classes exist or want the
    representative semantics regardless), ``"auto"`` (probe first with a
    hashes-only duplicate-class check and skip the collapse on a dup-free
    corpus, where it is pure overhead — sf1 filler corpus: 8.38s vs
    3.23s plain). The probe is one extra eager scan of ``df``'s lineage;
    prefer ``True`` when the input pipeline is expensive and dup classes
    are expected."""
    if collapse_exact not in (False, True, "auto"):
        # a typo like "Auto"/"always" must not silently flip semantics via
        # plain truthiness — the three settings change what the output MEANS
        raise ValueError(
            f"collapse_exact must be False, True, or 'auto', got {collapse_exact!r}"
        )
    if collapse_exact == "auto":
        # exactness of the skip: equal texts always share a hash, so zero
        # duplicated hashes PROVES zero duplicated texts (a hash collision
        # between distinct texts only triggers a harmless collapse pass);
        # the probe shuffles 8 bytes/row, not text payloads
        has_dup_classes = not (
            df.groupBy(F.xxhash64(F.col(text_col)).alias("__h"))
            .count()
            .where(F.col("count") > 1)
            .limit(1)
            .isEmpty()
        )
        if has_dup_classes:
            df = dedup_exact(df, [text_col], key_col)
    elif collapse_exact:
        df = dedup_exact(df, [text_col], key_col)
    blocks = max_hamming + 1
    block_bits = bits // blocks
    # persist: the signature expression is heavy (64 bit-majority passes) and
    # would otherwise be recomputed on both sides of the self-join
    sigs = _spread(df).select(
        F.col(key_col).alias("k"), simhash(F.col(text_col)).alias("sig")
    ).persist()
    sigs.count()  # see minhash_lsh_pairs: un-built caches race under AQE

    def block(col: Column, i: int) -> Column:
        return F.shiftrightunsigned(col, i * block_bits).bitwiseAND(F.lit((1 << block_bits) - 1))

    exploded = sigs.select(
        "k", "sig",
        F.explode(F.array(*[F.struct(F.lit(i).alias("bi"), block(F.col("sig"), i).alias("bv")) for i in range(blocks)])).alias("b"),
    ).select("k", "sig", "b.bi", "b.bv")
    other = exploded.select(
        F.col("k").alias("k2"), F.col("sig").alias("sig2"), F.col("bi").alias("bi2"), F.col("bv").alias("bv2")
    )
    cands = (
        exploded.join(other, (exploded.bi == other.bi2) & (exploded.bv == other.bv2) & (exploded.k < other.k2))
        .select("k", "k2", "sig", "sig2")
        .dropDuplicates(["k", "k2"])
    )
    ham = F.bit_count(F.col("sig").bitwiseXOR(F.col("sig2")))
    return cands.where(ham <= max_hamming).select(
        F.col("k").alias("doc_a"), F.col("k2").alias("doc_b"), ham.cast("int").alias("hamming")
    )


def paragraph_dedup(
    df: DataFrame,
    key_col: str,
    text_col: str,
    para_words: int = 15,
    min_count: int = 2,
    boundary: str = "chunk",
    _plan: str = "agg_join",
) -> DataFrame:
    """CCNet-style paragraph-hash dedup (Wenzek et al. 2020): hash every
    paragraph, drop each duplicated paragraph occurrence EXCEPT its
    canonical copy (min (key, paragraph-index) per hash — the repo's
    min-key convention), and rewrite every document from its surviving
    paragraphs. Complements doc-level MinHash (whole-doc near-dups) and
    span dedup (substring granularity): boilerplate paragraphs repeated
    across a crawl vanish while each document otherwise survives.

    ``boundary`` picks the paragraph generator: ``"newline"`` splits on
    ``\\n`` (the CCNet-native boundary for real crawl text; empty lines
    carry no content and are skipped, and the rebuilt text joins surviving
    paragraphs with ``\\n``), ``"chunk"`` uses fixed ``para_words``-word
    chunks — the fallback for corpora whose newlines were already
    normalized away (this repo's testdata). Documents with no paragraphs
    are absent from the output (the repo-wide empty-bag convention).

    Returns (key, n_paras, n_dropped, text) with ``text`` rebuilt from
    surviving paragraphs in order.

    Scale shape (100 TB): paragraph extraction is a JVM-only linear
    explosion; the duplicate decision is a map-side-combined
    ``groupBy(hash)`` count+min collapsed to the duplicated hashes only,
    left-joined back to the paragraph stream (AQE broadcasts the dup set
    when it is small, skew-splits the probe join when it is not). The r13
    window formulation (ONE exchange, but every occurrence of a paragraph
    in ONE task — window functions have no partial aggregation) was A/B'd
    against this plan on planted boilerplate skew
    (PARA_SKEW_STRESS_r14.jsonl, 2M docs, local[32]): uniform data ties
    (4.8 vs 4.9 s — the extra pass costs ~1.5%), the window's single hot
    task is absolute-size-bound and survives to ~10^6 occurrences of one
    sha2 key (4.9 vs 6.3 s), the ranking flips at 10^7 (21.8 vs 21.0 s)
    and widens at 5x10^7 (129 vs 113 s — 96% of all paragraph rows on ONE
    key, a single task sorting ~6.5 GB). The operator's design target is
    killing crawl boilerplate that repeats 10^8-10^9x at 100 TB: there
    the window task must buffer tens of GB in one executor — an OOM, not
    a slowdown — while this plan concentrates nothing anywhere. ~2%
    uniform cost for an unbounded-downside hedge is the trade (``_plan``
    keeps the window formulation reachable for the A/B harness). The
    rebuild is one doc-keyed aggregate; only (hash, key, idx) triples
    plus paragraph text ride shuffles — nothing quadratic, no driver
    state."""
    if boundary not in ("chunk", "newline"):
        raise ValueError(f"boundary must be 'chunk' or 'newline', got {boundary!r}")
    if boundary == "newline":
        paras = F.filter(F.split(F.col(text_col), "\n"), lambda x: x != F.lit(""))
        chunked = (
            df.select(F.col(key_col).alias("k"), paras.alias("__ps"))
            .where(F.size("__ps") > 0)
            .select("k", F.posexplode("__ps").alias("idx", "para"))
        )
        joiner = "\n"
    else:
        words = F.filter(F.split(F.col(text_col), " "), lambda x: x != F.lit(""))
        n_chunks = F.ceil(F.size("__ws") / F.lit(para_words)).cast("int")
        chunked = (
            df.select(F.col(key_col).alias("k"), words.alias("__ws"))
            .where(F.size("__ws") > 0)
            .select(
                "k",
                F.posexplode(
                    F.transform(
                        F.sequence(F.lit(1), n_chunks),
                        lambda i: F.array_join(
                            F.slice("__ws", (i - F.lit(1)) * para_words + 1, para_words),
                            " ",
                        ),
                    )
                ).alias("idx", "para"),
            )
        )
        joiner = " "
    hashed = chunked.withColumn("__h", F.sha2(F.col("para"), 256))
    if _plan == "window":
        by_hash = Window.partitionBy("__h")
        flagged = hashed.select(
            "k",
            "idx",
            "para",
            (F.count(F.lit(1)).over(by_hash) >= min_count).alias("__dup"),
            F.min(F.struct("k", "idx")).over(by_hash).alias("__canon"),
        )
    else:
        # count+min have map-side partial aggregation, so a 10^9-occurrence
        # boilerplate hash collapses to one row per mapper before the
        # exchange; the join back is AQE territory (skew-split when the dup
        # set is big, broadcast when small). Non-duplicated hashes are
        # filtered out of the build side — they need no decision.
        dups = (
            hashed.groupBy("__h")
            .agg(
                F.count(F.lit(1)).alias("__cnt"),
                F.min(F.struct("k", "idx")).alias("__canon"),
            )
            .where(F.col("__cnt") >= min_count)
        )
        flagged = hashed.join(dups, "__h", "left").select(
            "k",
            "idx",
            "para",
            F.col("__cnt").isNotNull().alias("__dup"),
            "__canon",
        )
    kept_flag = (~F.col("__dup")) | (F.struct("k", "idx") == F.col("__canon"))
    return (
        flagged.withColumn("__kept", kept_flag)
        .groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("n_paras"),
            F.sum((~F.col("__kept")).cast("long")).alias("n_dropped"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(F.col("__kept"), F.struct("idx", "para"))
                        )
                    ),
                    lambda s: s.para,
                ),
                joiner,
            ).alias(text_col),
        )
        .select(F.col("k").alias(key_col), "n_paras", "n_dropped", text_col)
    )


# --------------------------------------------------------------------------
# catalog entries + oracles
# --------------------------------------------------------------------------

def q_dedup_exact(spark: SparkSession, sf: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    return dedup_exact_keys(docs, ["text"], "doc_id")


Q_DEDUP_EXACT_SQL = """
SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY text
"""


def q_dedup_stats(spark: SparkSession, sf: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    return docs.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("text").alias("n_distinct_texts"),
        (F.count(F.lit(1)) - F.countDistinct("text")).alias("n_exact_dups"),
    )


Q_DEDUP_STATS_SQL = """
SELECT COUNT(*)                         AS n_docs,
       COUNT(DISTINCT text)             AS n_distinct_texts,
       COUNT(*) - COUNT(DISTINCT text)  AS n_exact_dups
FROM documents
"""


def q_jaccard_near_dups(spark: SparkSession, sf: str) -> DataFrame:
    # exact all-pairs formulation — quadratic by nature, so the catalog entry
    # runs it on a bounded candidate slice (the scale path is
    # q_minhash_near_dups); the oracle applies the identical bound
    docs = spark.read.parquet(f"{sf}/documents.parquet").where(F.col("doc_id") < 500)
    return jaccard_pairs(
        docs, "doc_id", "text", threshold=0.95, ngram=1,
        # the doc_id slice already bounds the join; skip the guard's
        # candidate-estimation aggregate (one whole Spark job at bench time)
        max_candidate_pairs=None,
    )


Q_JACCARD_SQL = """
WITH tok AS (
  SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS w
  FROM documents WHERE doc_id < 500
),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM tok GROUP BY doc_id),
common AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS c
  FROM tok a JOIN tok b ON a.w = b.w AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b,
       ROUND(c * 1.0 / (s1.n + s2.n - c), 4) AS jaccard
FROM common
JOIN sizes s1 ON doc_a = s1.doc_id
JOIN sizes s2 ON doc_b = s2.doc_id
WHERE c * 1.0 / (s1.n + s2.n - c) >= 0.95
"""


def _incremental_batch(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic synthetic ingest batch: docs 0-49 as CASE VARIANTS of
    corpus docs (dups under normalization), docs 50-79 truncated to their
    first half (novel at any near-dup threshold >= 0.8)."""
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    dups = docs.where(F.col("doc_id") < 50).select(
        (F.col("doc_id") + 100000).alias("doc_id"), F.upper("text").alias("text")
    )
    words = F.split(F.col("text"), " ")
    half = F.concat_ws(
        " ", F.slice(words, 1, F.greatest(F.floor(F.size(words) / 2).cast("int"), F.lit(1)))
    )
    novel = docs.where((F.col("doc_id") >= 50) & (F.col("doc_id") < 80)).select(
        (F.col("doc_id") + 200000).alias("doc_id"), half.alias("text")
    )
    return dups.unionByName(novel)


def q_dedup_incremental(spark: SparkSession, sf: str) -> DataFrame:
    """Incremental exact dedup: anti-join the synthetic batch against the
    corpus on normalized content — case variants vanish, truncations survive."""
    corpus = spark.read.parquet(f"{sf}/documents.parquet")
    batch = _incremental_batch(spark, sf)
    return dedup_against(batch, corpus, ["text"], normalize=True).select("doc_id")


Q_DEDUP_INCREMENTAL_SQL = r"""
WITH batch AS (
  SELECT doc_id + 100000 AS doc_id, UPPER(text) AS text
  FROM documents WHERE doc_id < 50
  UNION ALL
  SELECT doc_id + 200000,
         array_to_string(
           list_slice(string_split(text, ' '), 1,
                      greatest(len(string_split(text, ' ')) // 2, 1)),
           ' ')
  FROM documents WHERE doc_id >= 50 AND doc_id < 80
),
corpus_keys AS (
  SELECT DISTINCT LOWER(TRIM(regexp_replace(text, '[ \t\n\f\r]+', ' ', 'g'))) AS norm
  FROM documents
)
SELECT doc_id FROM batch
WHERE LOWER(TRIM(regexp_replace(text, '[ \t\n\f\r]+', ' ', 'g'))) NOT IN
      (SELECT norm FROM corpus_keys)
"""


def q_dedup_incremental_bloom(spark: SparkSession, sf: str) -> DataFrame:
    """The bloom-prefiltered twin of q_dedup_incremental: identical batch,
    identical (exact) answer, but only might-contain rows reach the
    anti-join. Sharing q_dedup_incremental's oracle IS the point — the
    bloom stage must be invisible in the result."""
    corpus = spark.read.parquet(f"{sf}/documents.parquet")
    batch = _incremental_batch(spark, sf)
    return dedup_against_bloom(batch, corpus, ["text"], normalize=True).select("doc_id")


def q_minhash_incremental(spark: SparkSession, sf: str) -> DataFrame:
    """Cross-corpus near-dup on a batch of appended-token variants (docs
    0-24, J ~ 0.97 vs source) + half-truncations (docs 50-79, J ~ 0.5):
    only the variants may match at threshold 0.8.

    Oracle: the exact cross-corpus 3-gram-Jaccard twin. Valid because the
    LSH output is exact-verified (no false positives) and the 16-band x
    4-row banding makes a miss of any qualifying pair (J >= 0.8, and the
    data's qualifying pairs sit at J >= 0.89) a < 1e-6 event — the entry
    asserts recall 1, which the config makes near-certain rather than
    guaranteed; a mismatch here means the banding margin eroded."""
    corpus = spark.read.parquet(f"{sf}/documents.parquet")
    variants = corpus.where(F.col("doc_id") < 25).select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" zzqx")).alias("text"),
    )
    words = F.split(F.col("text"), " ")
    half = F.concat_ws(
        " ", F.slice(words, 1, F.greatest(F.floor(F.size(words) / 2).cast("int"), F.lit(1)))
    )
    truncs = corpus.where((F.col("doc_id") >= 50) & (F.col("doc_id") < 80)).select(
        (F.col("doc_id") + 200000).alias("doc_id"), half.alias("text")
    )
    batch = variants.unionByName(truncs)
    # corpus side reads the materialized signature table (compute-once flow)
    # — only the small batch is hashed per run
    sigs = corpus_signatures_cached(spark, sf, num_hashes=64, ngram=3)
    return minhash_lsh_pairs_against(
        batch, None, "doc_id", "text", threshold=0.8, num_hashes=64, bands=16, ngram=3,
        corpus_sigs=sigs,
    )


# exact cross-corpus twin of q_minhash_incremental: 3-gram shingles joined
# on chr(1), mirroring _word_shingles' concat_ws("\x01", slice(...)) exactly
# (an empty separator would only match by the no-cross-boundary-collision
# accident of this vocabulary; hash-bearing consumers like the KMV sketch
# need the strings themselves to agree)
Q_MINHASH_INCREMENTAL_SQL = """
WITH batch AS (
  SELECT doc_id + 100000 AS doc_id, text || ' zzqx' AS text
  FROM documents WHERE doc_id < 25
  UNION ALL
  SELECT doc_id + 200000,
         array_to_string(
           list_slice(string_split(text, ' '), 1,
                      greatest(len(string_split(text, ' ')) // 2, 1)),
           ' ')
  FROM documents WHERE doc_id >= 50 AND doc_id < 80
),
btok AS (
  SELECT doc_id, unnest(list_distinct(
    [array_to_string(ws[i:i+2], chr(1)) for i in range(1, len(ws) - 1)])) AS w
  FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM batch)
  WHERE len(ws) >= 3
),
ctok AS (
  SELECT doc_id, unnest(list_distinct(
    [array_to_string(ws[i:i+2], chr(1)) for i in range(1, len(ws) - 1)])) AS w
  FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)
  WHERE len(ws) >= 3
),
bsz AS (SELECT doc_id, COUNT(*) AS n FROM btok GROUP BY doc_id),
csz AS (SELECT doc_id, COUNT(*) AS n FROM ctok GROUP BY doc_id),
common AS (
  SELECT b.doc_id AS new_key, c.doc_id AS corpus_key, COUNT(*) AS c
  FROM btok b JOIN ctok c ON b.w = c.w
  GROUP BY 1, 2
)
SELECT new_key, corpus_key,
       ROUND(c * 1.0 / (b.n + cs.n - c), 4) AS jaccard
FROM common
JOIN bsz b  ON new_key = b.doc_id
JOIN csz cs ON corpus_key = cs.doc_id
WHERE c * 1.0 / (b.n + cs.n - c) >= 0.8
"""


def q_minhash_near_dups(spark: SparkSession, sf: str) -> DataFrame:
    """LSH-bucketed near-dup (scale path) with exact-Jaccard verification.

    Oracle: the exact all-pairs 3-gram-Jaccard query. The LSH stage has no
    false positives (exact verify) and the 16x4 banding bounds the
    probability of missing any J >= 0.8 pair below ~4e-4 per pair even at
    the threshold itself (< 1e-6 at the J >= 0.89 this data exhibits), so
    the entry asserts recall 1 as a checked property, not an assumption."""
    # 3-gram shingles: over a tiny vocabulary, unigram signatures collide en
    # masse (every doc shares most tokens) and the bucket join degenerates;
    # richer shingles keep candidate counts ~linear. Signatures come from the
    # materialized compute-once table shared with q_dedup_clusters /
    # q_minhash_incremental — the corpus text is hashed once per dataset.
    sigs = corpus_signatures_cached(spark, sf, num_hashes=64, ngram=3)
    return minhash_lsh_pairs(
        None, "doc_id", "text", threshold=0.8, num_hashes=64, bands=16, ngram=3, sigs=sigs
    )


Q_MINHASH_SQL = """
WITH words AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
tok AS (
  SELECT doc_id, unnest(list_distinct(
    [array_to_string(ws[i:i+2], chr(1)) for i in range(1, len(ws) - 1)])) AS w
  FROM words WHERE len(ws) >= 3
),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM tok GROUP BY doc_id),
common AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS c
  FROM tok a JOIN tok b ON a.w = b.w AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b, ROUND(c * 1.0 / (s1.n + s2.n - c), 4) AS jaccard
FROM common
JOIN sizes s1 ON doc_a = s1.doc_id
JOIN sizes s2 ON doc_b = s2.doc_id
WHERE c * 1.0 / (s1.n + s2.n - c) >= 0.8
"""


def q_simhash_near_dups(spark: SparkSession, sf: str) -> DataFrame:
    """Block-pigeonhole SimHash pairs. Oracle: a FULL DuckDB replica of the
    signature — FNV-1a(64) folded over token code points (bit-identical to
    the numpy kernel, see Q_TEXT_EMBED_KNN_SQL for the technique), 64
    bit-majority sums, then all-pairs popcount(xor) <= d. The operator's
    block bucketing is candidates-only (pigeonhole guarantees every
    qualifying pair shares a block; the Hamming verify is exact), so the
    all-pairs SQL formulation yields the identical result set."""
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    return simhash_pairs(docs, "doc_id", "text", max_hamming=3)


Q_SIMHASH_SQL = """
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
bits AS (
  SELECT doc_id, b.range AS bit,
         SUM(CAST((h >> b.range) & 1 AS BIGINT)) AS s, COUNT(*) AS c
  FROM hashed, range(0, 64) b
  GROUP BY 1, 2
),
sig AS (
  SELECT doc_id,
         CAST(SUM(CASE WHEN 2 * s > c THEN CAST(1 AS UBIGINT) << CAST(bit AS INTEGER)
                       ELSE CAST(0 AS UBIGINT) END) AS UBIGINT) AS sg
  FROM bits GROUP BY doc_id
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(a.sg, b.sg)) AS INTEGER) AS hamming
FROM sig a JOIN sig b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.sg, b.sg)) <= 3
"""


def q_simhash_collapsed(spark: SparkSession, sf: str) -> DataFrame:
    """simhash_pairs with the collapse_exact lever: exact-dup classes
    collapse to their min-key representative before signing, so the
    (quadratic-in-class-size) hamming-0 copy pairs never reach the output.
    Oracle: the same FNV-1a/bit-majority replica as Q_SIMHASH_SQL, computed
    over the min-key-per-distinct-text representatives."""
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    # "auto": the cheap-source case — the dup-class probe is one hashes-only
    # rescan of the parquet, and it skips the collapse on a dup-free corpus
    return simhash_pairs(docs, "doc_id", "text", max_hamming=3, collapse_exact="auto")


Q_SIMHASH_COLLAPSED_SQL = """
WITH reps AS (
  SELECT MIN(doc_id) AS doc_id, text FROM documents GROUP BY text
),
toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok
  FROM reps WHERE text IS NOT NULL AND text != ''
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
bits AS (
  SELECT doc_id, b.range AS bit,
         SUM(CAST((h >> b.range) & 1 AS BIGINT)) AS s, COUNT(*) AS c
  FROM hashed, range(0, 64) b
  GROUP BY 1, 2
),
sig AS (
  SELECT doc_id,
         CAST(SUM(CASE WHEN 2 * s > c THEN CAST(1 AS UBIGINT) << CAST(bit AS INTEGER)
                       ELSE CAST(0 AS UBIGINT) END) AS UBIGINT) AS sg
  FROM bits GROUP BY doc_id
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(a.sg, b.sg)) AS INTEGER) AS hamming
FROM sig a JOIN sig b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.sg, b.sg)) <= 3
"""


def q_jaccard_prefix_pairs(spark: SparkSession, sf: str) -> DataFrame:
    """Exact Jaccard near-dup pairs over the FULL corpus via prefix
    filtering, on 3-gram shingle sets (the discriminative set the MinHash
    entries use — UNIGRAM sets over this corpus's 31-word vocabulary are
    degenerate: most docs share most words, qualifying pairs alone hit
    ~190k at sf0.1 and grew 28x per decade, measured before this was
    switched) — no doc_id slice, no frequency cut, no candidate cap: the
    rarest-first prefixes make the exact join scale where
    q_jaccard_near_dups needs a bounded slice. The oracle is the unbounded
    all-pairs SQL over the same shingles."""
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    return prefix_filter_pairs(docs, "doc_id", "text", threshold=0.95, ngram=3)


Q_JACCARD_PREFIX_SQL = """
WITH words AS (
  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
),
tok AS (
  SELECT doc_id, unnest(list_distinct(
    [array_to_string(ws[i:i+2], chr(1)) for i in range(1, len(ws) - 1)])) AS w
  FROM words WHERE len(ws) >= 3
),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM tok GROUP BY doc_id),
common AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS c
  FROM tok a JOIN tok b ON a.w = b.w AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b,
       ROUND(c * 1.0 / (s1.n + s2.n - c), 4) AS jaccard
FROM common
JOIN sizes s1 ON doc_a = s1.doc_id
JOIN sizes s2 ON doc_b = s2.doc_id
WHERE c * 1.0 / (s1.n + s2.n - c) >= 0.95
"""


def q_paragraph_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """CCNet paragraph-hash dedup over the documents table at 15-word
    paragraphs: per doc, paragraph counts before/after plus the md5 of the
    rewritten text (the value-level proof the rebuild agrees
    byte-for-byte across engines, the q_strip_passages convention). The
    synthetic corpus repeats phrases enough for ~8% of paragraph
    occurrences to collide at sf0.01 — real drops, not a vacuous pass."""
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    out = paragraph_dedup(docs, "doc_id", "text", para_words=15, min_count=2)
    return out.select(
        "doc_id",
        F.col("n_paras").cast("long").alias("n_paras"),
        F.col("n_dropped").cast("long").alias("n_dropped"),
        F.md5("text").alias("cleaned_fp"),
    ).orderBy("doc_id")


def q_paragraph_dedup_newline(spark: SparkSession, sf: str) -> DataFrame:
    """The CCNet-NATIVE boundary path: the corpus text is first rebuilt
    with real ``\\n`` paragraph breaks (every 12 words — deterministic,
    SQL-replayable; the testdata normalized newlines away), then deduped
    with ``boundary='newline'`` so the documented split-on-newline
    contract is EXECUTED, not just described (r13 verdict task). 12-word
    paragraphs (vs the chunk entry's 15) make the two entries' duplicate
    graphs genuinely different."""
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    words = F.filter(F.split(F.col("text"), " "), lambda x: x != F.lit(""))
    n_chunks = F.ceil(F.size("__ws") / F.lit(12)).cast("int")
    nl_docs = (
        docs.select("doc_id", words.alias("__ws"))
        .where(F.size("__ws") > 0)
        .select(
            "doc_id",
            F.array_join(
                F.transform(
                    F.sequence(F.lit(1), n_chunks),
                    lambda i: F.array_join(
                        F.slice("__ws", (i - F.lit(1)) * 12 + 1, 12), " "
                    ),
                ),
                "\n",
            ).alias("text"),
        )
    )
    out = paragraph_dedup(nl_docs, "doc_id", "text", boundary="newline")
    return out.select(
        "doc_id",
        F.col("n_paras").cast("long").alias("n_paras"),
        F.col("n_dropped").cast("long").alias("n_dropped"),
        F.md5("text").alias("cleaned_fp"),
    ).orderBy("doc_id")


Q_PARAGRAPH_DEDUP_NEWLINE_SQL = """
WITH w AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS ws
  FROM documents
),
chunks AS (
  SELECT doc_id, i AS idx,
         array_to_string(ws[(i-1)*12+1:i*12], ' ') AS para
  FROM w, unnest(generate_series(1, CAST(ceil(len(ws) / 12.0) AS BIGINT))) AS t(i)
  WHERE len(ws) > 0
),
flagged AS (
  SELECT doc_id, idx, para,
         COUNT(*) OVER (PARTITION BY para) >= 2 AS dup,
         MIN(ROW(doc_id, idx)) OVER (PARTITION BY para) AS canon
  FROM chunks
),
kept AS (
  SELECT doc_id, idx, para,
         (NOT dup) OR ROW(doc_id, idx) = canon AS keep
  FROM flagged
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_paras,
       CAST(SUM(CASE WHEN keep THEN 0 ELSE 1 END) AS BIGINT) AS n_dropped,
       md5(COALESCE(string_agg(CASE WHEN keep THEN para END, chr(10) ORDER BY idx),
                    '')) AS cleaned_fp
FROM kept
GROUP BY doc_id
ORDER BY doc_id
"""


Q_PARAGRAPH_DEDUP_SQL = """
WITH w AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS ws
  FROM documents
),
chunks AS (
  SELECT doc_id, i AS idx,
         array_to_string(ws[(i-1)*15+1:i*15], ' ') AS para
  FROM w, unnest(generate_series(1, CAST(ceil(len(ws) / 15.0) AS BIGINT))) AS t(i)
  WHERE len(ws) > 0
),
flagged AS (
  SELECT doc_id, idx, para,
         COUNT(*) OVER (PARTITION BY para) >= 2 AS dup,
         MIN(ROW(doc_id, idx)) OVER (PARTITION BY para) AS canon
  FROM chunks
),
kept AS (
  SELECT doc_id, idx, para,
         (NOT dup) OR ROW(doc_id, idx) = canon AS keep
  FROM flagged
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_paras,
       CAST(SUM(CASE WHEN keep THEN 0 ELSE 1 END) AS BIGINT) AS n_dropped,
       md5(COALESCE(string_agg(CASE WHEN keep THEN para END, ' ' ORDER BY idx), ''))
         AS cleaned_fp
FROM kept
GROUP BY doc_id
ORDER BY doc_id
"""


DEDUP_QUERIES = {
    "q_dedup_exact": q_dedup_exact,
    "q_paragraph_dedup": q_paragraph_dedup,
    "q_paragraph_dedup_newline": q_paragraph_dedup_newline,
    "q_dedup_stats": q_dedup_stats,
    "q_jaccard_near_dups": q_jaccard_near_dups,
    "q_jaccard_prefix_pairs": q_jaccard_prefix_pairs,
    "q_minhash_near_dups": q_minhash_near_dups,
    "q_simhash_near_dups": q_simhash_near_dups,
    "q_simhash_collapsed": q_simhash_collapsed,
    "q_dedup_incremental": q_dedup_incremental,
    "q_dedup_incremental_bloom": q_dedup_incremental_bloom,
    "q_minhash_incremental": q_minhash_incremental,
}

DEDUP_ORACLES = {
    "q_dedup_exact": Q_DEDUP_EXACT_SQL,
    "q_paragraph_dedup": Q_PARAGRAPH_DEDUP_SQL,
    "q_paragraph_dedup_newline": Q_PARAGRAPH_DEDUP_NEWLINE_SQL,
    "q_dedup_stats": Q_DEDUP_STATS_SQL,
    "q_jaccard_near_dups": Q_JACCARD_SQL,
    "q_jaccard_prefix_pairs": Q_JACCARD_PREFIX_SQL,
    "q_dedup_incremental": Q_DEDUP_INCREMENTAL_SQL,
    # exact-by-construction: the bloom stage only prunes the anti-join's
    # left side (no false negatives), so the exact path's oracle applies
    "q_dedup_incremental_bloom": Q_DEDUP_INCREMENTAL_SQL,
    # exact-Jaccard twins: valid oracles because the LSH entries are
    # exact-verified (no false positives) and banded for ~recall-1 (see
    # the entries' docstrings). The simhash twin goes further: it replicates
    # the signature itself in SQL (FNV fold + bit-majority), bit-identical.
    "q_minhash_near_dups": Q_MINHASH_SQL,
    "q_minhash_incremental": Q_MINHASH_INCREMENTAL_SQL,
    "q_simhash_near_dups": Q_SIMHASH_SQL,
    "q_simhash_collapsed": Q_SIMHASH_COLLAPSED_SQL,
}
