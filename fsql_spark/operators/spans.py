"""Exact-substring duplicate spans: character-level k-gram anchoring with
maximal-span merging — the ExactSubstr side of "Deduplicating Training Data
Makes Language Models Better" (Lee et al., 2022). Where MinHash/SimHash
(``dedup.py``) answer "are these two DOCUMENTS near-identical?", this
operator answers "which exact CHARACTER RANGES of each document also occur
elsewhere in the corpus?" — the signal a pipeline uses to cut boilerplate,
license headers, and templated spans out of otherwise-unique pages.

Lee et al. build a corpus-wide suffix array; a suffix array is a single
global sorted order, which is exactly the thing a distributed engine should
not build. The standard distributed reformulation (used here) anchors on
fixed-length k-grams instead: a character range is flagged iff every
k-window inside it occurs >= 2 times corpus-wide, which equals Lee et al.'s
"duplicated substring of length >= k" up to the window quantization — and is
expressible as two keyed exchanges:

1. one gram-keyed exchange to count occurrences of each distinct k-gram
   (the explode itself is map-only: positions never leave their document's
   partition until keyed by gram);
2. one doc-keyed exchange to sort the surviving positions and merge
   overlapping windows into maximal spans (gaps-and-islands over a window
   function — position ``p`` extends the current span iff
   ``p <= prev_p + k``).

Scale posture at 100 TB: the gram exchange is the cost. It carries one
(gram, doc, pos) row per character of corpus — the same order of bytes as
the corpus itself, shuffled once, exactly like the tokenize-and-count pass
of every dedup family in this repo. Two standard levers, both deliberately
NOT taken in the oracle entry because they trade exactness: (a) key the
exchange by ``xxhash64(gram)`` so 8 bytes ride the wire instead of k
characters (collisions only ever ADD false duplicate flags; at ~1e12 grams
the birthday term is non-negligible, so a production run re-verifies
flagged spans with one string-equality pass); (b) stride/winnow the anchor
positions (``q_doc_winnow_fingerprints`` is that operator). The island
merge is per-document and streams.

No reference counterpart (the reference delegates row-level compute,
`/root/reference/src/fsql/deser.py:30-31`); driver-mandated extension
surface (SURVEY §2.6).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..session import shuffle_width

#: Target estimated bytes per gram-exchange sort partition. The r10 sf10
#: spot-bench mapped both sides: ~875 MB/partition (32 partitions on the
#: ~28 GB exploded stream) sat on the executor-memory sort-spill cliff
#: (157-632 s spread); ~219 MB/partition (128 partitions) ran the decade
#: linear (197 s). 192 MB sits at the measured-good point with ~4x margin
#: from the cliff, without paying the many-small-partitions overhead the
#: r10 A/B measured at sf1 (2.2x at 128 partitions on a ~2 GB stream).
_TARGET_PARTITION_BYTES = 192 << 20

#: Estimated per-row overhead of the exploded gram exchange beyond the gram
#: characters themselves: doc id + position + xxhash64 sort key + UnsafeRow
#: framing.
_ROW_OVERHEAD_BYTES = 48


#: Dictionary-flagged row groups need bounded driver-side calibration
#: sample reads (one per est-chars-per-row decade bucket per file); past
#: this many total sample reads the distributed exact scan is cheaper
#: than a driver-side file loop.
_MAX_CALIBRATION_READS = 64


def _footer_total_chars(df: DataFrame, text_col: str) -> int | None:
    """Total characters of ``text_col`` from parquet FOOTER metadata — no
    data scan in the common case. Parquet column chunks record their total
    uncompressed size; for a PLAIN-encoded string column that is the
    character bytes plus the offset/length framing, so subtracting
    ~4 bytes/value leaves a sizing-grade estimate of the character count
    (the width formula only needs the right decade).

    Dictionary-encoded chunks break that identity: their uncompressed size
    is the RLE index pages plus one dictionary page, which on a repetitive
    corpus undercounts characters by ORDERS of magnitude (measured: a
    5000-row single-value corpus reports 0 est vs 4.4M chars) and would
    undersize the gram exchange straight into the sort-spill cliff the
    probe exists to avoid (ADVICE r11). The footer can't say which row
    groups are REALLY dict-encoded: a chunk that merely ATTEMPTED
    dictionary encoding and fell back to PLAIN still lists RLE_DICTIONARY
    in ``encodings`` AND keeps its partial dictionary page (measured on
    pyarrow 16 — ``dictionary_page_offset`` is set on a
    fallen-back-to-PLAIN chunk), so neither flag alone discriminates, and
    one file can mix honest-PLAIN and degenerate-dict row groups (ADVICE
    r12: calibrating such a file from its PLAIN-ish row group 0 measures
    a ratio of ~1 and keeps the undercount). Instead, dictionary-flagged
    row groups are BUCKETED by the decade of their footer-estimated
    chars-per-row — row groups in the same decade share an encoding
    regime — and each bucket is calibrated by reading ONE sample row
    group (bounded: one row group, one column): exact characters vs the
    footer estimate gives the bucket's scale ratio (per-row extrapolation
    when the footer estimate is degenerate). Unflagged row groups keep
    their direct footer estimate. Exact when every bucket holds one row
    group; decade-grade otherwise — which is the contract. Past
    ``_MAX_CALIBRATION_READS`` total sample reads the driver-side loop
    loses to the distributed exact scan — return None.

    Applies only when the plan is a bare scan/filter/project over LOCAL
    parquet files (the plan-string check is the _spread technique);
    returns None otherwise — joins/aggregates would conflate unrelated
    sources, and remote filesystems take the exact-scan fallback."""
    from .dedup import _SHUFFLED_PLAN_NODES

    plan = df._jdf.queryExecution().analyzed().toString()
    if any(node in plan for node in _SHUFFLED_PLAN_NODES):
        return None
    try:
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        files = df.inputFiles()
        if not files:
            return None
        import math

        total_chars = 0
        sample_reads = 0
        for f in files:
            if f.startswith("file:"):
                f = f[5:]
            elif "://" in f:
                return None
            pf = pq.ParquetFile(f)
            meta = pf.metadata
            names = [meta.schema.column(i).name for i in range(len(meta.schema))]
            if text_col not in names:
                return None
            col_idx = names.index(text_col)
            # buckets: est-chars-per-row decade -> [(rg, est, rows), ...]
            buckets: dict[int, list[tuple[int, int, int]]] = {}
            for rg in range(meta.num_row_groups):
                grp = meta.row_group(rg)
                chunk = grp.column(col_idx)
                if grp.num_rows == 0:
                    # zero rows carry zero characters — a dictionary-flagged
                    # empty group's bytes are pure dictionary pages, not text
                    continue
                rg_est = max(chunk.total_uncompressed_size - 4 * grp.num_rows, 0)
                if chunk.dictionary_page_offset is None:
                    total_chars += rg_est
                    continue
                decade = math.floor(math.log10(max(rg_est / grp.num_rows, 0.1)))
                buckets.setdefault(decade, []).append((rg, rg_est, grp.num_rows))
            for members in buckets.values():
                sample_reads += 1
                if sample_reads > _MAX_CALIBRATION_READS:
                    return None
                # sample the bucket's largest row group (most rows -> the
                # ratio is measured where most of the bucket's mass is)
                calib_rg, est_c, rows_c = max(members, key=lambda m: m[2])
                exact_c = int(
                    pc.sum(
                        pc.utf8_length(
                            pf.read_row_group(calib_rg, columns=[text_col]).column(0)
                        )
                    ).as_py()
                    or 0
                )
                bucket_est = sum(m[1] for m in members)
                bucket_rows = sum(m[2] for m in members)
                if est_c > 0:
                    total_chars += int(bucket_est * (exact_c / est_c))
                else:
                    total_chars += int(exact_c * (bucket_rows / rows_c))
        return total_chars
    except Exception:
        return None


def _gram_exchange_width(df: DataFrame, text_col: str, k: int) -> int:
    """Shuffle width for the gram exchange, derived from the INPUT data:
    total characters of the corpus (from parquet footer metadata when the
    input is a bare local-parquet scan — zero data read; otherwise one
    exact ``sum(length(text))`` single-column scan, still trivial next to
    the main job, which explodes every character into a ~k+48-byte row)
    estimate the exploded stream's bytes, sized to
    ``_TARGET_PARTITION_BYTES`` per sort partition. Floored at the session
    shuffle width (small corpora keep the session plan — the r10 A/B showed
    128 partitions costing 2.2x at sf1) and capped at 65536 (at that width
    the job is scheduler-bound and a real cluster sizes executors instead)."""
    total_chars = _footer_total_chars(df, text_col)
    if total_chars is None:
        total_chars = (
            df.select(F.sum(F.length(text_col)).alias("c")).collect()[0]["c"] or 0
        )
    est_bytes = total_chars * (k + _ROW_OVERHEAD_BYTES)
    width = max(
        shuffle_width(df.sparkSession),
        math.ceil(est_bytes / _TARGET_PARTITION_BYTES),
    )
    return min(width, 65536)


def duplicated_kgram_positions(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 40,
    min_count: int = 2,
    gram_partitions: int | None = None,
) -> DataFrame:
    """(id, pos) for every 1-based character position whose exact k-gram
    occurs >= ``min_count`` times corpus-wide (occurrences in the SAME
    document count — a doc that repeats its own header is self-duplicated,
    matching Lee et al.'s any-second-occurrence rule).

    Plan shape — ONE gram-keyed exchange, counted with a window: the
    position rows and their occurrence counts materialize in a single
    pass of the gram stream. Two cost levers, both semantics-preserving:

    - the docs are spread before the ~chars-per-doc explode (the
      _spread_for_kernel lesson: a few-partition scan otherwise
      serializes the explode AND the exchange's map side onto one task;
      no-op on an already-parallel source);
    - the window keys on ``(xxhash64(gram), gram)`` — the SAME groups
      (the hash is a function of the gram; the gram stays in the key for
      exactness), but the exchange's sort resolves almost every
      comparison on the 8-byte hash instead of k-byte binary compares.

    The groupBy(gram)+join-back alternative was A/B'd at sf1/sf10 and
    REJECTED with numbers (r10 spot-bench): map-side combine cannot
    collapse duplicates that live in different input partitions (where
    real corpus duplicates live), the dup-gram frame exceeds the
    broadcast threshold on any dedup-heavy corpus, and the resulting
    sort-merge join sorts BOTH sides plus pays a second explode pass —
    sf1 33.5 s vs 9.6 s, sf10 629 s vs 157 s, strictly worse at both
    decades.

    The gram exchange SIZES ITSELF: its sort working set grows with
    corpus characters, not rows, so a session-wide shuffle width sized
    for ordinary tables hits a sort-spill cliff exactly when the corpus
    outgrows it (the r10 sf10 finding: 157-632 s unstable at 32
    partitions vs 197 s at 128). :func:`_gram_exchange_width` derives the
    width from a sum-of-lengths probe; pass ``gram_partitions`` to pin it
    explicitly (e.g. when the caller already knows the corpus size, or to
    skip the probe's extra scan over a complex upstream plan)."""
    from .dedup import _spread

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    base = df.select(id_col, text_col).where(F.length(text_col) >= k)
    width = (
        gram_partitions
        if gram_partitions is not None
        else _gram_exchange_width(base, text_col, k)
    )
    if width < 1:
        raise ValueError(f"gram_partitions must be >= 1, got {width}")
    grams = (
        _spread(base)
        .select(
            id_col,
            F.explode(F.sequence(F.lit(1), F.length(text_col) - (k - 1))).alias("pos"),
            F.col(text_col),
        )
        .select(id_col, "pos", F.expr(f"substring({text_col}, pos, {k})").alias("gram"))
    )
    # the explicit repartition IS the window's exchange: hashpartitioning on
    # the window's own partition expressions satisfies its required
    # distribution, so EnsureRequirements adds only the sort — one exchange
    # in the plan either way (asserted in tests/test_scale_plans.py), now at
    # a data-derived width AQE won't coalesce away.
    grams = grams.repartition(width, F.xxhash64("gram"), F.col("gram"))
    cnt = F.count(F.lit(1)).over(Window.partitionBy(F.xxhash64("gram"), F.col("gram")))
    return (
        grams.withColumn("_cnt", cnt)
        .where(F.col("_cnt") >= min_count)
        .select(id_col, "pos")
    )


def duplicated_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 40,
    min_count: int = 2,
    gram_partitions: int | None = None,
) -> DataFrame:
    """Maximal duplicated character spans per document: overlapping/adjacent
    flagged k-windows merged by gaps-and-islands. Returns one row per span:
    ``(id, span_start, span_chars, n_kgrams)`` with ``span_start`` 1-based.

    The merge is one doc-keyed window pass: position ``p`` starts a new
    island iff ``p > lag(p) + k`` (the previous window [lag, lag+k) ends
    before [p, p+k) begins); island ids are the running sum of start flags.
    Positions within a document are distinct, so the running sum's default
    RANGE frame equals ROWS — the SQL oracle relies on the same identity."""
    dup = duplicated_kgram_positions(
        df, id_col, text_col, k, min_count, gram_partitions
    )
    by_doc = Window.partitionBy(id_col).orderBy("pos")
    start_flag = F.when(
        F.col("pos") > F.lag("pos").over(by_doc) + k, F.lit(1)
    ).otherwise(F.lit(0))
    islands = dup.withColumn(
        "island", F.sum(start_flag).over(by_doc.rowsBetween(Window.unboundedPreceding, 0))
    )
    return islands.groupBy(id_col, "island").agg(
        F.min("pos").alias("span_start"),
        (F.max("pos") + k - F.min("pos")).alias("span_chars"),
        F.count(F.lit(1)).alias("n_kgrams"),
    ).drop("island")


# --------------------------------------------------------------------------
# catalog entry + oracle
# --------------------------------------------------------------------------

_K = 40  # Lee et al. use 50 BPE tokens; 40 chars is the same order on text


def q_substring_dup_spans(spark: SparkSession, sf: str) -> DataFrame:
    """Per-document exact-substring duplication profile at k=40: how many
    flagged k-grams, how many maximal spans they merge into, how many
    characters those spans cover, and the covered fraction of the document
    — the ExactSubstr cut signal. Docs with no duplicated span are absent
    (their fraction is identically 0)."""
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    spans = duplicated_spans(docs, k=_K)
    return (
        spans.groupBy("doc_id")
        .agg(
            F.sum("n_kgrams").cast("long").alias("n_dup_kgrams"),
            F.count(F.lit(1)).cast("long").alias("n_spans"),
            F.sum("span_chars").cast("long").alias("dup_chars"),
        )
        .join(docs.select("doc_id", "n_chars"), "doc_id")
        .select(
            "doc_id",
            "n_dup_kgrams",
            "n_spans",
            "dup_chars",
            F.round(F.col("dup_chars") / F.col("n_chars"), 4).alias("dup_frac"),
        )
        .orderBy("doc_id")
    )


Q_SUBSTRING_DUP_SPANS_SQL = f"""
WITH g AS (
  SELECT doc_id, n_chars,
         unnest(generate_series(1, n_chars - {_K - 1})) AS pos, text
  FROM documents WHERE n_chars >= {_K}
),
flagged AS (
  SELECT doc_id, n_chars, pos,
         COUNT(*) OVER (PARTITION BY substr(text, pos, {_K})) AS cnt
  FROM g
),
lagged AS (
  SELECT doc_id, n_chars, pos,
         CASE WHEN pos > LAG(pos) OVER (PARTITION BY doc_id ORDER BY pos) + {_K}
              THEN 1 ELSE 0 END AS starts
  FROM flagged WHERE cnt >= 2
),
isl AS (
  SELECT doc_id, n_chars, pos,
         SUM(starts) OVER (PARTITION BY doc_id ORDER BY pos) AS island
  FROM lagged
),
spans AS (
  SELECT doc_id, n_chars, island,
         COUNT(*) AS n_kgrams, MAX(pos) + {_K} - MIN(pos) AS span_chars
  FROM isl GROUP BY doc_id, n_chars, island
)
SELECT doc_id,
       CAST(SUM(n_kgrams) AS BIGINT)   AS n_dup_kgrams,
       CAST(COUNT(*) AS BIGINT)        AS n_spans,
       CAST(SUM(span_chars) AS BIGINT) AS dup_chars,
       ROUND(SUM(span_chars) * 1.0 / n_chars, 4) AS dup_frac
FROM spans GROUP BY doc_id, n_chars
ORDER BY doc_id
"""


SPAN_QUERIES = {"q_substring_dup_spans": q_substring_dup_spans}
SPAN_ORACLES = {"q_substring_dup_spans": Q_SUBSTRING_DUP_SPANS_SQL}
