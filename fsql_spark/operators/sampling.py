"""Deterministic sampling / data-mixing operators for training pipelines.

Dataset assembly at 100 TB needs reproducible sampling: the same corpus +
the same config must yield the SAME rows on any cluster layout, any restart.
Spark's ``df.sample`` is seed-stable only per partitioning, so both
operators here derive the decision from a content hash instead:

- :func:`hash_fraction_sample` — keep a row iff the hex-string prefix of
  ``md5(key)`` falls below the fraction threshold. MAP-ONLY: no shuffle, no
  state, linearly scan-bound — the right sampler for a 1000-executor scan.
  Per-stratum fractions give weighted dataset mixing (e.g. 100% wiki,
  10% crawl).
- :func:`sample_per_group` — exactly ``k`` rows per group, chosen by the
  same hash order (deterministic "random" top-k). One shuffle on the group
  key; row_number streams, so skewed groups don't blow memory.

Both are SQL-expressible (md5 agrees byte-for-byte across engines when fed
the same string), so the catalog entries are fully oracle-checked — unlike
seeded-RNG sampling, which no two engines reproduce identically.

No reference counterpart (the reference delegates all row-level compute,
`/root/reference/src/fsql/deser.py:30-31`); driver-mandated extension
surface (SURVEY §2.6).
"""

from __future__ import annotations

import math
from typing import Mapping, Optional, Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _hash_hex(key: Column) -> Column:
    """First 8 hex chars of md5(key-as-string): uniform in [0, 2^32) and
    identical in any engine that implements md5 (lexicographic comparison of
    lowercase hex == numeric comparison)."""
    return F.substring(F.md5(key.cast("string")), 1, 8)


def fraction_to_hex_threshold(fraction: float) -> str:
    """Map a fraction in [0, 1] to its threshold string for a strict
    ``md5_prefix < threshold`` comparison. fraction >= 1.0 returns ``"g"``,
    which is lexicographically above every hex string — a genuine keep-ALL
    (clamping to ``ffffffff`` would silently drop rows whose prefix is
    exactly ffffffff, ~1 per 4B keys: real losses at 100 TB)."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1]: {fraction}")
    if fraction >= 1.0:
        return "g"
    return format(int(fraction * 2**32), "08x")


def hash_fraction_sample(
    df: DataFrame,
    key_col: str,
    fraction: float | None = None,
    stratum_col: Optional[str] = None,
    fractions: Optional[Mapping[str, float]] = None,
) -> DataFrame:
    """Deterministic ~fraction sample, map-only (no shuffle).

    Either a global ``fraction``, or per-stratum ``fractions`` keyed by the
    values of ``stratum_col`` (strata absent from the mapping are dropped —
    the dataset-mixing contract: unlisted sources don't leak in).
    """
    h = _hash_hex(F.col(key_col))
    if fractions is not None:
        if stratum_col is None:
            raise ValueError("fractions requires stratum_col")
        thresh = F.create_map(
            *[F.lit(x) for kv in fractions.items() for x in (kv[0], fraction_to_hex_threshold(kv[1]))]
        )[F.col(stratum_col)]
        return df.where(thresh.isNotNull() & (h < thresh))
    if fraction is None:
        raise ValueError("pass fraction or fractions")
    return df.where(h < F.lit(fraction_to_hex_threshold(fraction)))


def replicate_by_weight(
    df: DataFrame,
    key_col: str,
    stratum_col: str,
    weights: Mapping[str, float],
    epoch_col: str = "epoch",
) -> DataFrame:
    """Domain-mixture replication with REAL-valued weights — the
    pretraining mixture op (Pile/DoReMi style): weight 2.5 means every row
    of that stratum appears twice and ~half appear a third time; weight
    0.25 means ~a quarter appear once (so one operator covers up- AND
    down-sampling). Strata absent from ``weights`` are dropped (the mixing
    contract of :func:`hash_fraction_sample`).

    Deterministic and map-only: ``floor(w)`` full copies via a literal
    sequence explode, plus one fractional copy kept where the row's md5
    hash fraction < ``w - floor(w)`` — the SAME hash convention as every
    sampler here, so the decision is reproducible across engines and runs.
    ``epoch_col`` (0-based copy index) rides along so downstream epoch
    shuffling can interleave copies instead of emitting them back-to-back.
    At 100 TB the output is weight-scaled input with zero shuffle; each row
    explodes to its OWN stratum's ceil(w) candidates (at most one of which
    the fractional filter drops), never to a global maximum or a cross
    join."""
    if not weights:
        raise ValueError("weights must be non-empty")
    for s, w in weights.items():
        if w < 0:
            raise ValueError(f"weight for {s!r} must be >= 0, got {w}")
    max_copies = max(int(math.ceil(w)) for w in weights.values())
    if max_copies == 0:
        return df.where(F.lit(False)).withColumn(epoch_col, F.lit(0))
    full = F.create_map(
        *[F.lit(x) for kv in weights.items() for x in (kv[0], int(kv[1]))]
    )[F.col(stratum_col)]
    frac_th = F.create_map(
        *[
            F.lit(x)
            for kv in weights.items()
            for x in (kv[0], fraction_to_hex_threshold(kv[1] - int(kv[1])))
        ]
    )[F.col(stratum_col)]
    # per-STRATUM explode bound: a 1.0-weight stratum must not generate (and
    # immediately filter) the heaviest stratum's copy count — with
    # {"books": 20, "web": 1} over a web-dominated corpus a global-max
    # formulation would 20x the dominant stratum's row generation
    ceil_copies = F.create_map(
        *[F.lit(x) for kv in weights.items() for x in (kv[0], int(math.ceil(kv[1])))]
    )[F.col(stratum_col)]
    h = _hash_hex(F.col(key_col))
    out = df.where(ceil_copies.isNotNull() & (ceil_copies > 0)).withColumn(
        epoch_col, F.explode(F.sequence(F.lit(0), ceil_copies - 1))
    )
    keep = (F.col(epoch_col) < full) | ((F.col(epoch_col) == full) & (h < frac_th))
    return out.where(keep)


def sample_per_group(
    df: DataFrame,
    group_cols: Sequence[str],
    key_col: str,
    k: int,
) -> DataFrame:
    """Exactly min(k, |group|) rows per group, hash-ordered (deterministic
    pseudo-random), ties broken by the key itself. One shuffle on the group
    columns; bounded state per group (streaming row_number)."""
    w = Window.partitionBy(*group_cols).orderBy(
        _hash_hex(F.col(key_col)).asc(), F.col(key_col).asc()
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .drop("__rn")
    )


def split_by_hash(
    df: DataFrame,
    key_col: str,
    splits: Mapping[str, float],
    split_col: str = "split",
) -> DataFrame:
    """Assign every row a deterministic train/val/test-style split label.

    ``splits`` maps label -> fraction (must sum to 1; insertion order defines
    the hash-space bands). Map-only like :func:`hash_fraction_sample`: the
    label is a pure function of ``md5(key)``, so the assignment is identical
    on any cluster layout, any engine, any day — the property a training
    pipeline needs so val rows can never drift into train between runs.
    The LAST split takes the open-ended remainder band (no float-gap rows)."""
    total = sum(splits.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split fractions must sum to 1, got {total}")
    if not splits:
        raise ValueError("splits must be non-empty")
    h = _hash_hex(F.col(key_col))
    names = list(splits)
    expr = None
    cum = 0.0
    for name in names[:-1]:
        cum += splits[name]
        cond = h < F.lit(fraction_to_hex_threshold(cum))
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    label = F.lit(names[-1]) if expr is None else expr.otherwise(F.lit(names[-1]))
    return df.withColumn(split_col, label)


def pack_shards(
    df: DataFrame,
    key_col: str,
    cost_col: str,
    budget: float,
    partition_cols: Sequence[str] = (),
    shard_col: str = "shard_id",
) -> DataFrame:
    """Greedy sequence packing: number rows into shards of ~``budget`` total
    cost (tokens/chars/bytes), in deterministic hash order.

    ``shard_id = floor(running_cost_before_row / budget)`` over a running-sum
    window — rows may straddle a boundary (classic greedy packing; shards are
    >= budget-minus-one-row full). With ``partition_cols`` the packing runs
    independently per partition — THE scale form: each partition sorts and
    streams its own running sum in parallel. An empty ``partition_cols``
    means one global ordered window (single-task sort at 100 TB) — only for
    small frames; pass a bucket/group column at scale."""
    # fail at plan-build time, not as a DIVIDE_BY_ZERO on an executor
    # mid-job (ANSI mode) after the sort already ran
    if not budget > 0:
        raise ValueError(f"shard budget must be > 0, got {budget}")
    order = [_hash_hex(F.col(key_col)).asc(), F.col(key_col).asc()]
    w = (
        Window.partitionBy(*partition_cols).orderBy(*order)
        if partition_cols
        else Window.orderBy(*order)
    )
    cum_before = F.sum(cost_col).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ) - F.col(cost_col)
    return df.withColumn(shard_col, F.floor(cum_before / F.lit(float(budget))))


def shuffle_deterministic(
    df: DataFrame,
    key_col: str,
    seed: int = 42,
    position_col: str = "shuffle_pos",
) -> DataFrame:
    """Assign every row a seeded global shuffle position (1-based) — the
    training-order shuffle: same corpus + same seed => the same permutation
    on any cluster layout, any engine, any restart; a new seed is a fresh
    epoch order.

    The order is ``md5(key || '-' || seed)`` (ties by key). A naive global
    ``row_number`` would funnel everything through ONE sort partition, so
    the rank decomposes by hash-prefix band: the first two hex chars split
    the space into 256 lexicographic bands; one tiny aggregate (256 rows)
    yields each band's global offset, and positions are
    ``offset[band] + rank within band`` — 256-way-parallel windows, no
    global sort. Identical to ``ROW_NUMBER() OVER (ORDER BY hash, key)``
    because the band is a PREFIX of the hash it ranks by. The count pass is
    one map-side-combinable scan; at 100 TB widen to 3-4 hex chars
    (4k-64k bands) to keep bands executor-sized.

    The input plan is evaluated TWICE (band counts, then the window pass) —
    ``df``'s lineage must therefore be deterministic, the same property
    Spark itself requires to recompute any lost partition. A plan with
    ``rand()``/seedless ``sample`` or a source mutating between the two
    jobs would yield offsets that no longer match band populations (a
    non-permutation with no error); persist such inputs first."""
    h = F.md5(F.concat_ws("-", F.col(key_col).cast("string"), F.lit(str(seed))))
    band = F.substring(h, 1, 2)
    counts = {
        r["b"]: r["n"]
        for r in df.select(band.alias("b")).groupBy("b").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    offsets: dict[str, int] = {}
    acc = 0
    for b in sorted(counts):
        offsets[b] = acc
        acc += counts[b]
    if offsets:
        off = F.create_map(
            *[F.lit(x) for kv in offsets.items() for x in kv]
        )[band]
    else:  # empty frame: no bands to offset
        off = F.lit(0)
    w = Window.partitionBy(band).orderBy(h.asc(), F.col(key_col).asc())
    return df.withColumn(
        position_col, (off + F.row_number().over(w)).cast("long")
    )


# --------------------------------------------------------------------------
# catalog entries + oracles
# --------------------------------------------------------------------------

def q_sample_per_lang(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic 20-doc sample per language (hash-ordered top-k)."""
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    return sample_per_group(docs, ["lang"], "doc_id", k=20).select("lang", "doc_id")


Q_SAMPLE_PER_LANG_SQL = """
SELECT lang, doc_id
FROM (
  SELECT lang, doc_id,
         ROW_NUMBER() OVER (PARTITION BY lang
                            ORDER BY substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) ASC,
                                     doc_id ASC) AS rn
  FROM documents
)
WHERE rn <= 20
"""


def q_sample_mix_weighted(spark: SparkSession, sf: str) -> DataFrame:
    """Weighted dataset mix: per-source keep-fractions, map-only decision
    (the 100 TB path: the sampler never shuffles)."""
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    mixed = hash_fraction_sample(
        docs,
        "doc_id",
        stratum_col="source",
        fractions={"src0": 1.0, "src1": 0.5, "src2": 0.25},
    )
    return mixed.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("sum_chars"),
    )


# CAST(SUM(..) AS BIGINT): DuckDB sums BIGINT into HUGEINT, which its
# pandas bridge renders as float64 — cast for schema parity with Spark's long
Q_SAMPLE_MIX_SQL = f"""
SELECT source,
       COUNT(*)                      AS n_docs,
       CAST(SUM(n_chars) AS BIGINT)  AS sum_chars
FROM documents
WHERE (source = 'src0' AND substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) < '{fraction_to_hex_threshold(1.0)}')
   OR (source = 'src1' AND substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) < '{fraction_to_hex_threshold(0.5)}')
   OR (source = 'src2' AND substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) < '{fraction_to_hex_threshold(0.25)}')
GROUP BY source
"""


def q_domain_upsample(spark: SparkSession, sf: str) -> DataFrame:
    """Real-weight mixture replication audit: src0 x2.5 (two full epochs +
    a hash-chosen half), src1 x1.0, src2 x0.25 (down-sample) — per source,
    resulting row count, distinct docs, and the max epoch index."""
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    rep = replicate_by_weight(
        docs, "doc_id", "source", {"src0": 2.5, "src1": 1.0, "src2": 0.25}
    )
    return rep.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("doc_id").alias("n_docs"),
        F.max("epoch").alias("max_epoch"),
    )


Q_DOMAIN_UPSAMPLE_SQL = f"""
WITH w AS (
  SELECT * FROM (VALUES ('src0', 2, '{fraction_to_hex_threshold(0.5)}'),
                        ('src1', 1, '{fraction_to_hex_threshold(0.0)}'),
                        ('src2', 0, '{fraction_to_hex_threshold(0.25)}'))
       AS t(source, n_full, frac_th)
),
rep AS (
  SELECT d.source, d.doc_id, e.i AS epoch
  FROM documents d
  JOIN w USING (source),
       unnest(generate_series(0, 2)) AS e(i)
  WHERE e.i < w.n_full
     OR (e.i = w.n_full AND substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8) < w.frac_th)
)
SELECT source,
       COUNT(*)                 AS n_rows,
       COUNT(DISTINCT doc_id)   AS n_docs,
       CAST(MAX(epoch) AS INTEGER) AS max_epoch
FROM rep
GROUP BY source
"""


def q_split_train_val_test(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic 90/5/5 split assignment, audited per (split, lang)."""
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    labeled = split_by_hash(docs, "doc_id", {"train": 0.9, "val": 0.05, "test": 0.05})
    return labeled.groupBy("split", "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("sum_chars"),
    )


Q_SPLIT_SQL = f"""
SELECT CASE
         WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) < '{fraction_to_hex_threshold(0.9)}'  THEN 'train'
         WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) < '{fraction_to_hex_threshold(0.95)}' THEN 'val'
         ELSE 'test'
       END AS split,
       lang,
       COUNT(*)                     AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars
FROM documents
GROUP BY 1, 2
"""


def q_pack_shards(spark: SparkSession, sf: str) -> DataFrame:
    """Token-budget shard packing (cost = n_chars, budget 20k) per language;
    per-shard fill audit. Per-lang windows = the parallel scale form."""
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    packed = pack_shards(docs, "doc_id", "n_chars", budget=20_000, partition_cols=["lang"])
    return packed.groupBy("lang", "shard_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("sum_chars"),
    )


Q_PACK_SQL = """
WITH ordered AS (
  SELECT lang, n_chars,
         SUM(n_chars) OVER (
           PARTITION BY lang
           ORDER BY substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) ASC, doc_id ASC
           ROWS UNBOUNDED PRECEDING
         ) - n_chars AS cum_before
  FROM documents
)
SELECT lang,
       CAST(FLOOR(cum_before / 20000.0) AS BIGINT) AS shard_id,
       COUNT(*)                     AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars
FROM ordered
GROUP BY 1, 2
"""


def q_shuffle_order(spark: SparkSession, sf: str) -> DataFrame:
    """First 100 positions of the seed-42 training-order shuffle of the
    documents table — the reproducible epoch permutation."""
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    out = shuffle_deterministic(docs, "doc_id", seed=42)
    return out.where(F.col("shuffle_pos") <= 100).select("doc_id", "shuffle_pos")


Q_SHUFFLE_SQL = """
SELECT doc_id, shuffle_pos
FROM (
  SELECT doc_id,
         ROW_NUMBER() OVER (ORDER BY md5(CAST(doc_id AS VARCHAR) || '-42'), doc_id) AS shuffle_pos
  FROM documents
)
WHERE shuffle_pos <= 100
"""


def weighted_sample_topk(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    k: int,
    seed: str = "42",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement (Efraimidis &
    Spirakis 2006): each row gets the key ``ln(u) / w`` with ``u`` a
    hash-derived uniform in (0, 1], and the k LARGEST keys are the sample —
    provably equivalent to sequentially drawing k rows with probability
    proportional to weight, the importance-sampling primitive a
    quality-weighted data-mix needs (vs replicate_by_weight's
    with-replacement upsampling).

    ``u`` comes from 13 hex chars (52 bits — exactly a double's mantissa)
    of md5(key || '-' || seed), so the draw is reproducible across engines
    and runs; the +1 keeps u > 0. Map-only scoring + TakeOrderedAndProject
    for the top-k — no shuffle, no global sort. Zero/negative weights are
    excluded (their inclusion probability is 0 in the limit)."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    v = F.conv(
        F.substring(F.md5(F.concat_ws("-", F.col(key_col).cast("string"), F.lit(seed))), 1, 13),
        16, 10,
    ).cast("double")
    es_key = F.log((v + 1.0) / F.lit(float(1 << 52))) / F.col(weight_col)
    return (
        df.where(F.col(weight_col) > 0)
        .withColumn("__es", es_key)
        .orderBy(F.desc("__es"), F.col(key_col))
        .limit(k)
        .drop("__es")
    )


_WS_K = 50


def q_sample_weighted_docs(spark: SparkSession, sf: str) -> DataFrame:
    """Length-weighted document sample: 50 docs drawn without replacement
    with probability proportional to n_chars (Efraimidis-Spirakis keys,
    seeded md5 uniforms) — longer documents proportionally more likely,
    every draw reproducible."""
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    out = weighted_sample_topk(docs, "doc_id", "n_chars", k=_WS_K)
    return out.select("doc_id", "lang", "source", "n_chars").orderBy("doc_id")


Q_SAMPLE_WEIGHTED_SQL = f"""
WITH scored AS (
  SELECT doc_id, lang, source, n_chars,
         LN((('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '-42'), 1, 13))::BIGINT + 1.0)
            / 4503599627370496.0) / n_chars AS es_key
  FROM documents
  WHERE n_chars > 0
)
SELECT doc_id, lang, source, n_chars
FROM scored
ORDER BY es_key DESC, doc_id
LIMIT {_WS_K}
"""


SAMPLING_QUERIES = {
    "q_sample_per_lang": q_sample_per_lang,
    "q_sample_weighted_docs": q_sample_weighted_docs,
    "q_sample_mix_weighted": q_sample_mix_weighted,
    "q_domain_upsample": q_domain_upsample,
    "q_shuffle_order": q_shuffle_order,
    "q_split_train_val_test": q_split_train_val_test,
    "q_pack_shards": q_pack_shards,
}

SAMPLING_ORACLES = {
    "q_sample_per_lang": Q_SAMPLE_PER_LANG_SQL,
    "q_sample_weighted_docs": Q_SAMPLE_WEIGHTED_SQL,
    "q_sample_mix_weighted": Q_SAMPLE_MIX_SQL,
    "q_domain_upsample": Q_DOMAIN_UPSAMPLE_SQL,
    "q_split_train_val_test": Q_SPLIT_SQL,
    "q_pack_shards": Q_PACK_SQL,
    # the banded rank == the global ROW_NUMBER because the band is a prefix
    # of the ranked hash — the oracle states the semantic contract directly
    "q_shuffle_order": Q_SHUFFLE_SQL,
}
