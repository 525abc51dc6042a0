"""Similarity search over embedding columns (``array<float>``).

- **brute-force cosine top-k / threshold**: exact baseline. The query set is
  broadcast; candidates stream through one codegen stage (higher-order
  functions ``zip_with``+``aggregate`` — no Python, no shuffle besides the
  final top-k window on the small result).
- **random-hyperplane LSH (ANN scale path)**: deterministic signed-projection
  bucket signature per vector (numpy planes from a fixed seed, Arrow-batched
  pandas_udf); candidate pairs share a bucket, then exact cosine refine.
  At 100 TB the bucket join replaces the quadratic cross product; recall is
  tuned by (n_planes, n_tables).

Norms are precomputed once per side; all arithmetic in float64.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, IntegerType, LongType
from pyspark.sql.window import Window


def _as_double(col) -> Column:
    return F.col(col).cast("array<double>") if isinstance(col, str) else col.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    """Element-wise dot product, JVM-side (zip_with + aggregate fold)."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x))


def cosine(a: Column, b: Column) -> Column:
    """NULL when either vector has zero norm (cosine is undefined there;
    try_divide keeps a stray all-zeros embedding from killing the job under
    ANSI mode — threshold filters then drop the NULL rows)."""
    return F.try_divide(dot(a, b), l2_norm(a) * l2_norm(b))


def _query_matrix(queries: DataFrame, key_col: str, vec_col: str):
    """Collect the (small) query set to a normalized float64 matrix.

    The query side of a brute-force scan must fit in memory anyway — this is
    the standard blocked-GEMM formulation: the corpus streams through
    mapInPandas in Arrow batches, each batch doing ONE BLAS matmul against
    the broadcast query matrix. (The pure Column formulation with
    zip_with+aggregate is interpreted per element — measured 25 s vs <1 s for
    2k x 2k x 64 at sf0.1.)"""
    import numpy as np

    rows = queries.select(key_col, vec_col).collect()
    keys = np.array([r[key_col] for r in rows], dtype=np.int64)
    mat = np.array([list(r[vec_col]) for r in rows], dtype=np.float64)
    mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
    return keys, mat


def brute_force_pairs(
    vectors: DataFrame,
    queries: DataFrame,
    key_col: str,
    vec_col: str,
    threshold: float,
) -> DataFrame:
    """All (query, candidate) pairs with cosine >= threshold — exact,
    BLAS-blocked: corpus never shuffles, queries broadcast in the closure."""
    import numpy as np
    import pandas as pd

    from pyspark.sql.types import LongType, StructField, StructType

    q_keys, q_mat = _query_matrix(queries, key_col, vec_col)
    schema = StructType(
        [StructField("query_id", LongType()), StructField("neighbor_id", LongType())]
    )

    def kernel(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            v = np.array([list(x) for x in pdf[vec_col]], dtype=np.float64)
            v = v / np.maximum(np.linalg.norm(v, axis=1, keepdims=True), 1e-12)
            sims = v @ q_mat.T  # (batch, nq)
            vi, qi = np.nonzero(sims >= threshold)
            n_ids = pdf[key_col].to_numpy()[vi]
            q_ids = q_keys[qi]
            keep = q_ids != n_ids
            yield pd.DataFrame({"query_id": q_ids[keep], "neighbor_id": n_ids[keep]})

    return vectors.select(key_col, vec_col).mapInPandas(kernel, schema)


def brute_force_topk(
    vectors: DataFrame,
    queries: DataFrame,
    key_col: str,
    vec_col: str,
    k: int,
    rounded: bool = False,
) -> DataFrame:
    """Exact top-k neighbors per query by cosine; deterministic tiebreak on
    neighbor key. Each Arrow batch emits its LOCAL top-k per query (the
    global top-k is a subset of the union under the same total order), then
    one small window finalizes — shuffle carries at most k * n_queries rows
    per batch.

    ``rounded=True`` ranks by the 4dp-ROUNDED cosine (ties broken by
    neighbor key) and emits the rounded cosine: the total order is then over
    the value a cross-engine oracle compares, so mathematically-near-equal
    cosines computed with different summation orders cannot flip ranks —
    the same robustness trade as :func:`ivf_ann_topk`. The kernel's local
    selection uses the identical (rounded cos, key) order, keeping the
    subset property exact."""
    import numpy as np
    import pandas as pd

    from pyspark.sql.types import DoubleType, LongType, StructField, StructType

    q_keys, q_mat = _query_matrix(queries, key_col, vec_col)
    schema = StructType(
        [
            StructField("query_id", LongType()),
            StructField("neighbor_id", LongType()),
            StructField("cos", DoubleType()),
        ]
    )

    def kernel(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            v = np.array([list(x) for x in pdf[vec_col]], dtype=np.float64)
            v = v / np.maximum(np.linalg.norm(v, axis=1, keepdims=True), 1e-12)
            sims = v @ q_mat.T  # (batch, nq)
            n_ids = pdf[key_col].to_numpy()
            out_q, out_n, out_c = [], [], []
            for j in range(sims.shape[1]):
                col = sims[:, j]
                mask = n_ids != q_keys[j]
                cand = np.nonzero(mask)[0]
                if not len(cand):
                    continue
                if rounded:
                    # same total order as the final window: lexsort is
                    # last-key-primary, so (-rounded cos, id). np.round is
                    # half-to-even on the binary double while Spark's
                    # F.round is HALF_UP on its shortest-decimal repr, so a
                    # value sitting exactly on a 4dp half boundary can land
                    # one 1e-4 step apart between the two rules — keep a
                    # one-step GUARD BAND below the local k-th rounded value
                    # (capped) so no candidate the JVM-side window could
                    # promote into the global top-k is cut here.
                    r = np.round(col[cand], 4)
                    order = np.lexsort((n_ids[cand], -r))
                    kth = r[order[min(k, len(order)) - 1]]
                    order = order[r[order] >= kth - 1.0001e-4][: k + 64]
                else:
                    order = np.argsort(-col[cand], kind="stable")[:k]
                top = cand[order]
                out_q.extend([q_keys[j]] * len(top))
                out_n.extend(n_ids[top])
                out_c.extend(col[top])
            yield pd.DataFrame({"query_id": out_q, "neighbor_id": out_n, "cos": out_c})

    scored = vectors.select(key_col, vec_col).mapInPandas(kernel, schema)
    if rounded:
        scored = scored.withColumn("cos", F.round("cos", 4))
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    ranked = scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)
    if rounded:
        return ranked.select("query_id", "neighbor_id", "rank", "cos")
    return ranked.select("query_id", "neighbor_id", "rank")


# --------------------------------------------------------------------------
# LSH-bucketed ANN (scale path)
# --------------------------------------------------------------------------

def lsh_ann_pairs(
    vectors: DataFrame,
    key_col: str,
    vec_col: str,
    threshold: float,
    n_planes: int = 12,
    n_tables: int = 6,
    dim: int | None = None,
    seed: int = 42,
) -> DataFrame:
    """Approximate cosine-similar pairs: random-hyperplane signatures bucket
    the vectors (n_tables independent tables of n_planes bits); same-bucket
    pairs are refined with exact cosine. Deterministic (seeded planes).

    ``dim`` defaults to the width of the FIRST row, probed on the driver (a
    limit-1 job — scans one row of one column) and then enforced per Arrow
    batch in every kernel task: the plane matrix is a pure function of
    (seed, n_tables, n_planes, dim), so tasks regenerate it identically
    with no broadcast, and a corpus whose widths differ BETWEEN files
    (partial re-embedding migration) fails LOUDLY instead of silently
    bucketing each width with an incompatible plane family — cross-width
    pairs would otherwise be unfindable. Pass ``dim`` explicitly to skip
    the probe or to pin a different expectation."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    if dim is None:
        # null-filtered: F.size(NULL) is -1 (non-ANSI), which would pin
        # dim=-1 and fail every batch with a confusing "expected -1-dim"
        probe = (
            vectors.where(F.col(vec_col).isNotNull())
            .select(F.size(F.col(vec_col)).alias("d"))
            .first()
        )
        if probe is not None:  # empty input: kernel never runs, no pin needed
            dim = int(probe["d"])
            if dim < 0:
                raise ValueError(f"{vec_col}: could not probe vector width (got {dim})")

    def _bucket(vecs, table):
        mat = np.stack(vecs.to_numpy())  # (batch, dim) Arrow-batched
        if dim is not None and mat.shape[1] != dim:
            raise ValueError(f"expected {dim}-dim vectors, got {mat.shape[1]}")
        planes = np.random.default_rng(seed).standard_normal(
            (n_tables, n_planes, mat.shape[1])
        )
        out = np.zeros(len(vecs), dtype=np.int64)
        for t in table.unique():
            mask = table.to_numpy() == t
            bits = (mat[mask] @ planes[int(t)].T) > 0  # (rows, n_planes)
            out[mask] = bits.dot(1 << np.arange(n_planes)).astype(np.int64) + (int(t) << n_planes)
        return pd.Series(out)

    # real (non-string) annotations: `from __future__ import annotations`
    # would stringify inline hints and break Spark's eval-type inference
    _bucket.__annotations__ = {"vecs": pd.Series, "table": pd.Series, "return": pd.Series}
    bucket_of = pandas_udf(_bucket, LongType())

    # NULL embeddings are unmatchable by definition — drop them here instead
    # of letting np.stack die inside the kernel (a handful of null vectors
    # must not kill a full-corpus job)
    base = vectors.where(F.col(vec_col).isNotNull()).select(
        F.col(key_col).alias("k"), _as_double(vec_col).alias("v")
    )
    tabled = base.withColumn("t", F.explode(F.array(*[F.lit(i) for i in range(n_tables)])))
    bucketed = tabled.withColumn("bucket", bucket_of(F.col("v"), F.col("t")))
    other = bucketed.select(
        F.col("k").alias("k2"), F.col("v").alias("v2"), F.col("bucket").alias("bucket2")
    )
    cands = (
        bucketed.join(other, (F.col("bucket") == F.col("bucket2")) & (F.col("k") < F.col("k2")))
        .select("k", "k2", "v", "v2")
        .dropDuplicates(["k", "k2"])
    )
    cos = cosine(F.col("v"), F.col("v2"))
    # the exact cosine rides along (rounded 4dp): candidate generation is
    # approximate, but every RETURNED pair carries its exactly-verified score
    # — value-level auditability for an op that has no SQL oracle
    return cands.where(cos >= threshold).select(
        F.col("k").alias("vec_a"), F.col("k2").alias("vec_b"), F.round(cos, 4).alias("cos")
    )


def _centroid_seed_hash(key: Column, seed: int) -> Column:
    """Engine-portable sampling hash for centroid init: md5 over
    ``"{key}-{seed}"``. Identical hex (and so identical lexicographic order)
    in Spark and DuckDB — which is what lets an oracle reproduce the
    sampled-centroid quantizer exactly (see Q_EMB_IVF_ANN_SQL)."""
    return F.md5(F.concat_ws("-", key.cast("string"), F.lit(str(seed))))


def _make_assigner(cents):
    """Arrow-batched argmax-cosine assigner over a driver-side centroid
    matrix (KBs, closure-broadcast). Map-only — the big table never
    shuffles to be assigned."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    norm = cents / np.maximum(np.linalg.norm(cents, axis=1, keepdims=True), 1e-12)

    def _assign(vecs):
        mat = np.stack(vecs.to_numpy()).astype(np.float64)
        mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
        return pd.Series((mat @ norm.T).argmax(axis=1).astype(np.int32))

    _assign.__annotations__ = {"vecs": pd.Series, "return": pd.Series}
    return pandas_udf(_assign, IntegerType())


def assign_with_centroids(
    vectors: DataFrame, key_col: str, vec_col: str, centroids
) -> DataFrame:
    """Assignment-only IVF path for a PRE-TRAINED quantizer (see
    :func:`read_ivf_centroids`): vectors + ``centroid_id``, one map-only
    pass — the train-once / assign-every-batch lifecycle."""
    base = vectors.select(F.col(key_col).alias("k"), _as_double(vec_col).alias("v"))
    return base.withColumn("centroid_id", _make_assigner(centroids)(F.col("v")))


#: bump when quantizer semantics (normalization, argmax tie-break) change —
#: assigning new batches with an old persisted quantizer must refuse loudly
_IVF_FORMAT = 1


def write_ivf_centroids(spark: SparkSession, centroids, url: str, seed: int, iterations: int) -> None:
    """Persist a trained coarse quantizer: (centroid_id, vector) rows plus
    constant metadata columns (config + format version, validated on read).
    The artifact is KBs — the corpus was scanned at training time; every
    future batch loads this table and assigns map-only."""
    import pandas as pd

    from ..api import write_table

    pdf = pd.DataFrame(
        {
            "centroid_id": range(len(centroids)),
            "vector": [list(map(float, c)) for c in centroids],
        }
    )
    df = (
        spark.createDataFrame(pdf)
        .withColumn("__seed", F.lit(int(seed)))
        .withColumn("__iterations", F.lit(int(iterations)))
        .withColumn("__ivf_fmt", F.lit(_IVF_FORMAT))
    )
    write_table(df, url)


def read_ivf_centroids(spark: SparkSession, url: str):
    """Load a persisted quantizer -> (centroids ndarray, seed, iterations).
    Refuses missing/mismatched format or mixed configs (aggregate check)."""
    import numpy as np

    from ..fs import get_url_and_fs

    path, fs = get_url_and_fs(url)
    df = spark.read.parquet(fs.spark_url(path))
    meta_cols = ["__seed", "__iterations", "__ivf_fmt"]
    missing = [c for c in meta_cols if c not in df.columns]
    if missing:
        raise ValueError(
            f"IVF centroid table at {url} lacks metadata column(s) {missing} — "
            f"rebuild with write_ivf_centroids (current format v{_IVF_FORMAT})"
        )
    configs = [tuple(r) for r in df.select(*meta_cols).distinct().limit(3).collect()]
    if len(configs) != 1 or configs[0][2] != _IVF_FORMAT:
        raise ValueError(
            f"IVF centroid table at {url} has config(s) {configs}, expected one "
            f"config at format v{_IVF_FORMAT} — rebuild it"
        )
    rows = df.select("centroid_id", "vector").orderBy("centroid_id").collect()
    # a same-config append passes the distinct-meta check but duplicates
    # centroid ids — assignment would then dot against a doubled codebook.
    # Ids are dense 0..k-1 by construction, so count == max_id + 1 exactly.
    ids = [r["centroid_id"] for r in rows]
    if len(ids) != len(set(ids)) or (ids and len(ids) != max(ids) + 1):
        raise ValueError(
            f"IVF centroid table at {url} has {len(ids)} rows for centroid "
            f"ids {min(ids)}..{max(ids)} — duplicated or missing centroids "
            "(appended-to table?); rebuild it"
        )
    cents = np.array([r["vector"] for r in rows], dtype=np.float64)
    return cents, int(configs[0][0]), int(configs[0][1])


def ivf_assign(
    vectors: DataFrame,
    key_col: str,
    vec_col: str,
    n_centroids: int = 16,
    iterations: int = 2,
    seed: int = 42,
) -> tuple[DataFrame, "object"]:
    """IVF coarse quantizer: deterministic k-means-lite.

    Centroid init = hash-ordered sample (md5 of the key — stable across
    runs, cluster layouts, AND engines; ``iterations=0`` is the
    sampled-centroid IVF-Flat baseline, fully reproducible in SQL); each
    Lloyd iteration is one distributed assign (Arrow-batched argmin) + one
    partial-sum reduction. Returns (assigned_df, centroids ndarray);
    ``assigned_df`` = vectors + ``centroid_id``.

    Scale: centroids live on the driver (n_centroids x dim floats — KBs) and
    broadcast inside the UDF closure; the big table is touched
    ``iterations+1`` times, and every pass is MAP-ONLY: the centroid update
    reduces to one (centroid, count, sum-vector) row per Arrow batch —
    partitions x n_centroids tiny rows to the driver — instead of exploding
    the corpus into per-dimension shuffle rows (the old posexplode/regroup
    exchanged corpus x dim rows per iteration).
    """
    import numpy as np

    from pyspark.sql.functions import pandas_udf

    import pandas as pd

    from pyspark.sql.types import (
        ArrayType,
        DoubleType,
        IntegerType as _Int,
        LongType as _Long,
        StructField,
        StructType,
    )

    base = vectors.select(F.col(key_col).alias("k"), _as_double(vec_col).alias("v"))
    init = (
        base.withColumn("__h", _centroid_seed_hash(F.col("k"), seed))
        .orderBy("__h", "k")
        .limit(n_centroids)
        .select("v")
        .collect()
    )
    centroids = np.array([r["v"] for r in init], dtype=np.float64)
    make_assigner = _make_assigner

    partial_schema = StructType(
        [
            StructField("centroid_id", _Int()),
            StructField("cnt", _Long()),
            StructField("sums", ArrayType(DoubleType())),
        ]
    )

    def _partials(batches):
        # one (centroid, count, sum-vector) row per centroid per TASK — the
        # classic treeAggregate shape; nothing corpus-sized leaves the map
        acc: dict[int, tuple[int, "np.ndarray"]] = {}
        for pdf in batches:
            if not len(pdf):
                continue
            mat = np.stack(pdf["v"].to_numpy()).astype(np.float64)
            cids = pdf["centroid_id"].to_numpy()
            for c in np.unique(cids):
                rows = mat[cids == c]
                cnt, s = acc.get(int(c), (0, np.zeros(mat.shape[1])))
                acc[int(c)] = (cnt + len(rows), s + rows.sum(axis=0))
        yield pd.DataFrame(
            {
                "centroid_id": list(acc),
                "cnt": [acc[c][0] for c in acc],
                "sums": [list(acc[c][1]) for c in acc],
            }
        )

    for _ in range(iterations):
        assigned = base.withColumn("centroid_id", make_assigner(centroids)(F.col("v")))
        partials = assigned.select("centroid_id", "v").mapInPandas(
            _partials, partial_schema
        ).collect()
        new = centroids.copy()
        agg: dict[int, tuple[int, "np.ndarray"]] = {}
        for r in partials:
            cnt, s = agg.get(r["centroid_id"], (0, np.zeros(centroids.shape[1])))
            agg[r["centroid_id"]] = (cnt + r["cnt"], s + np.array(r["sums"]))
        for cid, (cnt, s) in agg.items():
            if cnt:
                new[cid] = s / cnt
        centroids = new

    assigned = base.withColumn("centroid_id", make_assigner(centroids)(F.col("v")))
    return assigned, centroids


def ivf_ann_topk(
    vectors: DataFrame,
    queries: DataFrame,
    key_col: str,
    vec_col: str,
    k: int,
    n_centroids: int = 16,
    n_probe: int = 4,
    seed: int = 42,
    iterations: int = 2,
    _label_mask: tuple = (),
) -> DataFrame:
    """IVF approximate top-k: queries probe their ``n_probe`` nearest
    centroids; exact cosine runs only within the probed inverted lists
    (candidates ~ corpus * n_probe / n_centroids instead of the full cross
    product). ``_label_mask=(label_col,)`` (internal, used by
    :func:`hard_negative_topk_ivf`) drops same-label candidates BEFORE
    ranking: the query side carries its label in the probe relation and
    the neighbor label joins onto the bounded candidate stream."""
    import numpy as np

    from pyspark.sql.functions import pandas_udf

    import pandas as pd

    assigned, centroids = ivf_assign(
        vectors, key_col, vec_col, n_centroids=n_centroids, seed=seed, iterations=iterations
    )
    norm = centroids / np.maximum(np.linalg.norm(centroids, axis=1, keepdims=True), 1e-12)

    def _probe(vecs):
        mat = np.stack(vecs.to_numpy()).astype(np.float64)
        mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
        # stable sort: centroid ties (exact-equal cosines) break on ascending
        # centroid id — the same total order the SQL twin's window uses
        order = np.argsort(-(mat @ norm.T), axis=1, kind="stable")[:, :n_probe].astype(np.int32)
        return pd.Series(list(order))

    _probe.__annotations__ = {"vecs": pd.Series, "return": pd.Series}
    probe_udf = pandas_udf(_probe, ArrayType(IntegerType()))

    q_cols = [F.col(key_col).alias("query_id"), _as_double(vec_col).alias("q")]
    if _label_mask:
        q_cols.append(F.col(_label_mask[0]).alias("__ql"))
    qs = queries.select(*q_cols)
    probed = qs.withColumn("centroid_id", F.explode(probe_udf(F.col("q"))))
    cands = probed.join(
        assigned.withColumnRenamed("k", "neighbor_id"), "centroid_id"
    ).where(F.col("query_id") != F.col("neighbor_id"))
    if _label_mask:
        nlabels = vectors.select(
            F.col(key_col).alias("neighbor_id"), F.col(_label_mask[0]).alias("__nl")
        )
        cands = cands.join(nlabels, "neighbor_id").where(
            F.col("__nl") != F.col("__ql")
        ).drop("__nl", "__ql")
    scored = cands.withColumn(
        "cos", F.round(cosine(F.col("q"), F.col("v")), 4)
    ).dropDuplicates(["query_id", "neighbor_id"])
    # rank by the ROUNDED cosine (the value the oracle compares): Spark and
    # DuckDB sum dot products in different orders, so ranking full-precision
    # doubles lets ~1e-15 summation noise flip near-tied ranks cross-engine;
    # on the rounded value ties break deterministically on neighbor_id
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    # exact cosine (4dp) emitted per returned neighbor — value-level
    # auditability for the approximate op (see lsh_ann_pairs)
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos")
    )


def q_embedding_ivf_ann(spark: SparkSession, sf: str) -> DataFrame:
    """IVF top-k at PARTIAL probe (4 of 16 lists) — the honest approximate
    path: each query scores only ~1/4 of the corpus (the speed/recall trade,
    driver-visible). Quantizer config: sampled centroids (md5-ordered,
    ``iterations=0`` — the IVF-Flat random-centroid baseline), which makes
    the WHOLE pipeline engine-portable: the oracle re-derives the same
    centroid sample, the same argmax assignment, the same probed lists, and
    the same rounded-cosine ranking in SQL. The trained-k-means quantizer is
    exercised by q_embedding_ivf_knn (full probe = exact) and by the pytest
    recall-floor tests (a trained quantizer is not SQL-reproducible — its
    Lloyd means depend on engine summation order)."""
    emb = _emb(spark, sf)
    qs = emb.where(F.col("vec_id") < 10)
    return ivf_ann_topk(
        emb, qs, "vec_id", "embedding", k=10, n_centroids=16, n_probe=4, iterations=0
    )


# full replica of the sampled-centroid IVF pipeline (see q_embedding_ivf_ann):
# cent = the 16 lowest (md5("{id}-42"), id) keys, cid = position in that
# order (matching the Spark centroid array index); assignment = argmax
# normalized dot (ties -> lowest cid); queries probe their top-4 lists;
# exact cosine + rounded ranking over probed candidates only.
Q_EMB_IVF_ANN_SQL = """
WITH ex AS (
  SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS v,
         generate_subscripts(embedding, 1) AS i
  FROM embeddings
),
norms AS (SELECT vec_id, sqrt(SUM(v * v)) AS nrm FROM ex GROUP BY vec_id),
cent AS (
  SELECT vec_id AS cid_key,
         CAST(ROW_NUMBER() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR) || '-42'), vec_id) AS INTEGER) - 1 AS cid
  FROM embeddings
  QUALIFY ROW_NUMBER() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR) || '-42'), vec_id) <= 16
),
cvec AS (
  SELECT c.cid, e.i, e.v / GREATEST(n.nrm, 1e-12) AS cv
  FROM cent c JOIN ex e ON e.vec_id = c.cid_key JOIN norms n ON n.vec_id = c.cid_key
),
uvec AS (
  SELECT e.vec_id, e.i, e.v / GREATEST(n.nrm, 1e-12) AS uv
  FROM ex e JOIN norms n ON n.vec_id = e.vec_id
),
sim AS (
  SELECT u.vec_id, c.cid, SUM(u.uv * c.cv) AS s
  FROM uvec u JOIN cvec c ON u.i = c.i
  GROUP BY 1, 2
),
assign AS (
  SELECT vec_id, cid FROM (
    SELECT vec_id, cid, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY s DESC, cid ASC) AS rn
    FROM sim) WHERE rn = 1
),
probe AS (
  SELECT vec_id AS query_id, cid FROM (
    SELECT vec_id, cid, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY s DESC, cid ASC) AS rn
    FROM sim WHERE vec_id < 10) WHERE rn <= 4
),
cand AS (
  SELECT p.query_id, a.vec_id AS neighbor_id
  FROM probe p JOIN assign a ON a.cid = p.cid
  WHERE a.vec_id != p.query_id
),
dots AS (
  SELECT c.query_id, c.neighbor_id, SUM(ea.v * eb.v) AS d
  FROM cand c
  JOIN ex ea ON ea.vec_id = c.query_id
  JOIN ex eb ON eb.vec_id = c.neighbor_id AND eb.i = ea.i
  GROUP BY 1, 2
),
ranked AS (
  SELECT query_id, neighbor_id,
         CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                 ORDER BY ROUND(d / (na.nrm * nb.nrm), 4) DESC, neighbor_id ASC) AS INTEGER) AS rank,
         ROUND(d / (na.nrm * nb.nrm), 4) AS cos
  FROM dots
  JOIN norms na ON query_id = na.vec_id
  JOIN norms nb ON neighbor_id = nb.vec_id
)
SELECT query_id, neighbor_id, rank, cos FROM ranked WHERE rank <= 10
"""


def brute_force_self_pairs(
    vectors: DataFrame, key_col: str, vec_col: str, threshold: float
) -> DataFrame:
    """Exact all-pairs (vec_a < vec_b) with cosine >= threshold.

    O(N^2) with a driver-side collect of the full corpus — the ORACLE
    formulation only. At scale use :func:`lsh_ann_pairs` (bucketed)."""
    pairs = brute_force_pairs(vectors, vectors, key_col, vec_col, threshold).where(
        F.col("query_id") < F.col("neighbor_id")
    )
    return pairs.select(F.col("query_id").alias("vec_a"), F.col("neighbor_id").alias("vec_b"))


# --------------------------------------------------------------------------
# int8 quantization (ANN memory-scale path)
# --------------------------------------------------------------------------

def quantize_embeddings(
    vectors: DataFrame, key_col: str, vec_col: str,
    qvec_col: str = "qvec", scale_col: str = "scale",
) -> DataFrame:
    """Symmetric per-vector int8 quantization: ``scale = max|x| / 127``,
    ``q_i = floor(x_i * 127 / max|x| + 0.5)`` (round-half-up — the one
    rounding rule every SQL engine reproduces verbatim, unlike banker's
    rounding), clamped to [-127, 127]; the zero vector quantizes to zeros
    with scale 0. 4x memory reduction for a broadcast/cached ANN corpus —
    at 100 TB of embeddings the difference between a codebook that fits
    executor memory and one that doesn't. Approximate dot products on the
    int8 codes rank candidates; exact float re-rank recovers precision
    (see :func:`quantized_topk`). Entirely JVM expressions (transform /
    aggregate): no UDF, map-only, and exactly SQL-replayable — the
    determinism audit IS the catalog oracle."""
    v = _as_double(vec_col)
    amax = F.array_max(F.transform(v, lambda x: F.abs(x)))
    q = F.when(amax <= 0, F.transform(v, lambda x: F.lit(0).cast("int"))).otherwise(
        F.transform(
            v,
            lambda x: F.greatest(
                F.lit(-127),
                F.least(F.lit(127), F.floor(x * F.lit(127.0) / amax + F.lit(0.5)).cast("int")),
            ),
        )
    )
    return vectors.withColumn(qvec_col, q).withColumn(
        scale_col, (amax / F.lit(127.0)).cast("double")
    )


def _quantize_np(mat):
    """numpy twin of :func:`quantize_embeddings`'s rule: per-row symmetric
    int8, round-half-up, zero rows -> zero codes."""
    import numpy as np

    amax = np.abs(mat).max(axis=1, keepdims=True)
    safe = np.where(amax > 0, amax, 1.0)
    q = np.clip(np.floor(mat * 127.0 / safe + 0.5), -127, 127)
    return np.where(amax > 0, q, 0.0).astype(np.int32)


def quantized_topk(
    corpus: DataFrame,
    queries: DataFrame,
    key_col: str,
    vec_col: str,
    k: int = 10,
    rerank: int = 30,
) -> DataFrame:
    """Two-stage ANN: rank by APPROXIMATE cosine on int8 codes, keep the
    top ``rerank`` per query, then EXACT float cosine re-rank of the
    shortlist to the final ``k`` — the classic quantize-then-rerank recall
    recovery. Same blocked-kernel shape as :func:`brute_force_topk` (the
    corpus streams through mapInPandas, query CODES broadcast in the
    closure; integer matmul per Arrow batch), so the corpus never shuffles
    and no nested-loop join appears in the plan. The float vectors are
    touched only for the shortlist (k_rerank x n_queries rows) via two
    broadcast equi-joins."""
    import numpy as np
    import pandas as pd

    from pyspark.sql.types import DoubleType, LongType, StructField, StructType

    if not 0 < k <= rerank:
        raise ValueError(f"need 0 < k <= rerank, got k={k} rerank={rerank}")
    q_keys, q_mat = _query_matrix(queries, key_col, vec_col)
    q_codes = _quantize_np(q_mat)
    q_norms = np.sqrt((q_codes.astype(np.int64) ** 2).sum(axis=1))

    schema = StructType(
        [
            StructField("query_id", LongType()),
            StructField("neighbor_id", LongType()),
            StructField("approx", DoubleType()),
        ]
    )

    def kernel(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            v = np.array([list(x) for x in pdf[vec_col]], dtype=np.float64)
            codes = _quantize_np(v).astype(np.int64)
            norms = np.sqrt((codes**2).sum(axis=1))
            sims = (codes @ q_codes.T.astype(np.int64)).astype(np.float64)
            denom = np.maximum(norms[:, None] * q_norms[None, :], 1e-12)
            sims = sims / denom
            n_ids = pdf[key_col].to_numpy()
            out_q, out_n, out_c = [], [], []
            for j in range(sims.shape[1]):
                cand = np.nonzero(n_ids != q_keys[j])[0]
                if not len(cand):
                    continue
                order = np.lexsort((n_ids[cand], -sims[cand, j]))[:rerank]
                top = cand[order]
                out_q.extend([q_keys[j]] * len(top))
                out_n.extend(n_ids[top])
                out_c.extend(sims[top, j])
            yield pd.DataFrame({"query_id": out_q, "neighbor_id": out_n, "approx": out_c})

    scored = corpus.select(key_col, vec_col).mapInPandas(kernel, schema)
    w = Window.partitionBy("query_id").orderBy(F.desc("approx"), F.asc("neighbor_id"))
    shortlist = (
        scored.withColumn("__r", F.row_number().over(w))
        .where(F.col("__r") <= rerank)
        .select("query_id", "neighbor_id")
    )
    # exact re-rank: fetch float vectors for the shortlist only (broadcast
    # the tiny shortlist into the corpus scan, then the query vectors in)
    nvec = corpus.select(
        F.col(key_col).alias("neighbor_id"), _as_double(vec_col).alias("nv")
    )
    qvec = queries.select(
        F.col(key_col).alias("query_id"), _as_double(vec_col).alias("qv")
    )
    exact = (
        nvec.join(F.broadcast(shortlist), "neighbor_id")
        .join(F.broadcast(qvec), "query_id")
        .withColumn("cos", F.round(cosine(F.col("qv"), F.col("nv")), 4))
    )
    w2 = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        exact.withColumn("rank", F.row_number().over(w2))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )


def embedding_near_dup_keys(
    vectors: DataFrame,
    key_col: str,
    vec_col: str,
    threshold: float,
    pairs_fn=None,
) -> DataFrame:
    """Embedding-cosine near-dup dedup: drop every vector that is
    cosine-similar (>= threshold) to a LOWER-keyed vector; keep the rest.

    Greedy-by-key suppression (not connected components): deterministic, one
    pass over the pair relation.

    ``pairs_fn(vectors, key_col, vec_col, threshold) -> DataFrame`` supplies
    the similar-pair relation; its first two columns are the pair keys. The
    DEFAULT is :func:`lsh_ann_pairs` — bucketed candidate generation with
    exact-cosine verification, the 100 TB path (the corpus never collects to
    the driver and never cross-joins). Pass :func:`brute_force_self_pairs`
    only for exact/oracle runs on bounded data."""
    if pairs_fn is None:
        pairs_fn = lsh_ann_pairs
    pairs = pairs_fn(vectors, key_col, vec_col, threshold)
    a, b = pairs.columns[:2]
    # suppress the higher key of each pair, whatever orientation pairs_fn used
    dropped = pairs.select(F.greatest(F.col(a), F.col(b)).alias(key_col)).distinct()
    return vectors.select(key_col).join(dropped, key_col, "left_anti")


# --------------------------------------------------------------------------
# catalog entries + oracles
# --------------------------------------------------------------------------

def _emb(spark: SparkSession, sf: str) -> DataFrame:
    return spark.read.parquet(f"{sf}/embeddings.parquet")


def q_embedding_similar_pairs(spark: SparkSession, sf: str) -> DataFrame:
    emb = _emb(spark, sf)
    qs = emb.where(F.col("vec_id") < 10)
    return brute_force_pairs(emb, qs, "vec_id", "embedding", threshold=0.30)


# oracle does the cosine in explicit float64 (unnest + join on position) so
# both engines compute the same IEEE values; the output carries ids only, so
# summation-order noise (~1e-15) can't flip a hash unless a pair sits within
# float ulps of the threshold.
Q_EMB_PAIRS_SQL = """
WITH ex AS (
  SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS v,
         generate_subscripts(embedding, 1) AS i
  FROM embeddings
),
norms AS (SELECT vec_id, sqrt(SUM(v * v)) AS nrm FROM ex GROUP BY vec_id),
dots AS (
  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id, SUM(a.v * b.v) AS d
  FROM ex a JOIN ex b ON a.i = b.i AND b.vec_id != a.vec_id
  WHERE a.vec_id < 10
  GROUP BY 1, 2
)
SELECT query_id, neighbor_id
FROM dots
JOIN norms na ON query_id = na.vec_id
JOIN norms nb ON neighbor_id = nb.vec_id
WHERE d / (na.nrm * nb.nrm) >= 0.30
"""


def q_embedding_knn(spark: SparkSession, sf: str) -> DataFrame:
    emb = _emb(spark, sf)
    qs = emb.where(F.col("vec_id") < 10)
    return brute_force_topk(emb, qs, "vec_id", "embedding", k=10)


Q_EMB_KNN_SQL = """
WITH ex AS (
  SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS v,
         generate_subscripts(embedding, 1) AS i
  FROM embeddings
),
norms AS (SELECT vec_id, sqrt(SUM(v * v)) AS nrm FROM ex GROUP BY vec_id),
dots AS (
  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id, SUM(a.v * b.v) AS d
  FROM ex a JOIN ex b ON a.i = b.i AND b.vec_id != a.vec_id
  WHERE a.vec_id < 10
  GROUP BY 1, 2
),
ranked AS (
  SELECT query_id, neighbor_id,
         CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                 ORDER BY d / (na.nrm * nb.nrm) DESC, neighbor_id ASC) AS INTEGER) AS rank
  FROM dots
  JOIN norms na ON query_id = na.vec_id
  JOIN norms nb ON neighbor_id = nb.vec_id
)
SELECT query_id, neighbor_id, rank FROM ranked WHERE rank <= 10
"""


def q_embedding_near_dup_keys(spark: SparkSession, sf: str) -> DataFrame:
    # ORACLE formulation: exact pair relation (bounded data only) — the
    # operator's default is the LSH scale path, demonstrated by
    # q_embedding_near_dup_keys_lsh below
    emb = _emb(spark, sf)
    return embedding_near_dup_keys(
        emb, "vec_id", "embedding", threshold=0.30, pairs_fn=brute_force_self_pairs
    )


def q_embedding_near_dup_keys_lsh(spark: SparkSession, sf: str) -> DataFrame:
    # DEFAULT (scale) wiring: bucketed LSH candidates + exact-cosine verify.
    # Rows-only check (candidate recall is approximate by construction);
    # tests assert kept-set ⊇ exact kept-set + recall vs brute force.
    emb = _emb(spark, sf)
    return embedding_near_dup_keys(emb, "vec_id", "embedding", threshold=0.30)


Q_EMB_NEAR_DUP_SQL = """
WITH ex AS (
  SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS v,
         generate_subscripts(embedding, 1) AS i
  FROM embeddings
),
norms AS (SELECT vec_id, sqrt(SUM(v * v)) AS nrm FROM ex GROUP BY vec_id),
dots AS (
  SELECT a.vec_id AS qid, b.vec_id AS nid, SUM(a.v * b.v) AS d
  FROM ex a JOIN ex b ON a.i = b.i AND a.vec_id < b.vec_id
  GROUP BY 1, 2
),
dropped AS (
  SELECT DISTINCT nid AS vec_id
  FROM dots
  JOIN norms na ON qid = na.vec_id
  JOIN norms nb ON nid = nb.vec_id
  WHERE d / (na.nrm * nb.nrm) >= 0.30
)
SELECT vec_id FROM embeddings
WHERE vec_id NOT IN (SELECT vec_id FROM dropped)
"""


def q_embedding_ann_lsh(spark: SparkSession, sf: str) -> DataFrame:
    """Hyperplane-LSH ANN pairs. Oracle: an EXACT DuckDB replica of the
    whole approximate pipeline — the seeded plane matrix is inlined into the
    SQL as a literal, so DuckDB derives the same sign bits, the same bucket
    ids, the same candidate pairs, and the same exact-cosine refinement.
    Sub-recall-1 approximation is therefore no obstacle to a value-level
    oracle: determinism is (seeded planes + exact verify), and the twin
    checks every emitted pair AND that no extra pair appears. Cross-engine
    float risk is a sign flip of a near-zero projection (|dot| ~ 1e-15,
    probability negligible — same class as the accepted cosine-threshold
    entries)."""
    emb = _emb(spark, sf)
    return lsh_ann_pairs(emb, "vec_id", "embedding", threshold=0.30)


def _lsh_oracle_cte(
    n_planes: int = 12, n_tables: int = 6, dim: int = 64, seed: int = 42
) -> str:
    """DuckDB CTE prefix replicating lsh_ann_pairs' bucket + verify stages:
    the same np.random.default_rng(seed) planes the Spark kernel uses are
    emitted as a flat list literal (repr round-trips float64 exactly);
    bucket = sign-bit integer + (table << n_planes), exactly the kernel's
    ``bits.dot(1 << arange) + (t << n_planes)``."""
    import numpy as np

    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_tables, n_planes, dim))
    flat = ", ".join(repr(float(x)) for x in planes.ravel())
    return f"""
WITH flatp AS (SELECT [{flat}] AS w),
ex AS (
  SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS v,
         generate_subscripts(embedding, 1) AS i
  FROM embeddings
),
proj AS (
  SELECT e.vec_id, t.range AS t, p.range AS p,
         SUM(e.v * flatp.w[((t.range * {n_planes} + p.range) * {dim}) + e.i]) AS d
  FROM ex e, range(0, {n_tables}) t, range(0, {n_planes}) p, flatp
  GROUP BY 1, 2, 3
),
buckets AS (
  SELECT vec_id,
         SUM(CASE WHEN d > 0 THEN 1::BIGINT << p ELSE 0 END) + (t::BIGINT << {n_planes}) AS bucket
  FROM proj GROUP BY vec_id, t
),
cand AS (
  SELECT DISTINCT a.vec_id AS k, b.vec_id AS k2
  FROM buckets a JOIN buckets b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
),
norms AS (SELECT vec_id, sqrt(SUM(v * v)) AS nrm FROM ex GROUP BY vec_id),
pairdot AS (
  SELECT c.k, c.k2, SUM(ea.v * eb.v) AS d
  FROM cand c
  JOIN ex ea ON ea.vec_id = c.k
  JOIN ex eb ON eb.vec_id = c.k2 AND eb.i = ea.i
  GROUP BY 1, 2
)
"""


Q_EMB_ANN_LSH_SQL = _lsh_oracle_cte() + """
SELECT c.k AS vec_a, c.k2 AS vec_b, ROUND(c.d / (na.nrm * nb.nrm), 4) AS cos
FROM pairdot c
JOIN norms na ON c.k = na.vec_id
JOIN norms nb ON c.k2 = nb.vec_id
WHERE c.d / (na.nrm * nb.nrm) >= 0.30
"""


# kept-keys twin: same LSH replica; drop the GREATER key of every passing
# pair (pairs are oriented k < k2, so the dropped side is k2)
Q_EMB_NEAR_DUP_LSH_SQL = _lsh_oracle_cte() + """
, dropped AS (
  SELECT DISTINCT c.k2 AS vec_id
  FROM pairdot c
  JOIN norms na ON c.k = na.vec_id
  JOIN norms nb ON c.k2 = nb.vec_id
  WHERE c.d / (na.nrm * nb.nrm) >= 0.30
)
SELECT vec_id FROM embeddings
WHERE vec_id NOT IN (SELECT vec_id FROM dropped)
"""


def q_embedding_ivf_knn(spark: SparkSession, sf: str) -> DataFrame:
    """IVF top-k run at FULL probe (n_probe = n_centroids), which makes IVF
    exact — equal to a flat scan — so the whole machinery (k-means-lite
    assignment, inverted-list routing, per-list scoring, global merge) is
    byte-verifiable against the exact SQL twin. Production sets
    n_probe < n_centroids for the speed/recall trade; that approximate
    config's recall is asserted vs brute force in tests/test_operators.py."""
    emb = _emb(spark, sf)
    qs = emb.where(F.col("vec_id") < 10)
    return ivf_ann_topk(emb, qs, "vec_id", "embedding", k=10, n_centroids=16, n_probe=16)


Q_EMB_IVF_SQL = """
WITH ex AS (
  SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS v,
         generate_subscripts(embedding, 1) AS i
  FROM embeddings
),
norms AS (SELECT vec_id, sqrt(SUM(v * v)) AS nrm FROM ex GROUP BY vec_id),
dots AS (
  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id, SUM(a.v * b.v) AS d
  FROM ex a JOIN ex b ON a.i = b.i AND b.vec_id != a.vec_id
  WHERE a.vec_id < 10
  GROUP BY 1, 2
),
ranked AS (
  SELECT query_id, neighbor_id,
         CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                 ORDER BY ROUND(d / (na.nrm * nb.nrm), 4) DESC, neighbor_id ASC) AS INTEGER) AS rank,
         ROUND(d / (na.nrm * nb.nrm), 4) AS cos
  FROM dots
  JOIN norms na ON query_id = na.vec_id
  JOIN norms nb ON neighbor_id = nb.vec_id
)
SELECT query_id, neighbor_id, rank, cos FROM ranked WHERE rank <= 10
"""


def q_embedding_quantize(spark: SparkSession, sf: str) -> DataFrame:
    """int8 quantization determinism audit: per vector, the code sum /
    extremes and the reconstruction scale — exact integers once the
    round-half-up rule fixes each code, so the oracle replays the whole
    quantizer (the artifact an ANN serving tier ships) value-for-value."""
    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    q = quantize_embeddings(emb, "vec_id", "embedding")
    return q.select(
        "vec_id",
        F.round("scale", 6).alias("scale"),
        F.aggregate("qvec", F.lit(0).cast("long"), lambda a, x: a + x).alias("q_sum"),
        F.array_max("qvec").alias("q_max"),
        F.array_min("qvec").alias("q_min"),
    )


Q_EMBEDDING_QUANTIZE_SQL = """
WITH v AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS x FROM embeddings
),
m AS (
  SELECT vec_id, x, list_max(list_transform(x, e -> ABS(e))) AS amax FROM v
),
q AS (
  SELECT vec_id, amax,
         CASE WHEN amax <= 0 THEN list_transform(x, e -> 0)
              ELSE list_transform(x, e ->
                GREATEST(-127, LEAST(127, CAST(FLOOR(e * 127.0 / amax + 0.5) AS INTEGER))))
         END AS qv
  FROM m
)
SELECT vec_id,
       ROUND(amax / 127.0, 6)                       AS scale,
       CAST(list_aggregate(qv, 'sum') AS BIGINT)    AS q_sum,
       CAST(list_max(qv) AS INTEGER)                AS q_max,
       CAST(list_min(qv) AS INTEGER)                AS q_min
FROM q
"""


def q_embedding_label_centroids(spark: SparkSession, sf: str) -> DataFrame:
    """Per-label centroid norms — array aggregation via posexplode + regroup
    (the shuffle carries (label, pos, val) triples; at scale this is the
    standard map-reduce for dense vectors)."""
    emb = _emb(spark, sf)
    pos = emb.select("label", F.posexplode(F.col("embedding").cast("array<double>")).alias("i", "x"))
    cent = pos.groupBy("label", "i").agg(F.avg("x").alias("cx"))
    return (
        cent.groupBy("label")
        .agg(F.round(F.sqrt(F.sum(F.col("cx") * F.col("cx"))), 4).alias("centroid_norm"),
             F.count(F.lit(1)).alias("dim"))
    )


Q_EMB_CENTROIDS_SQL = """
WITH ex AS (
  SELECT label, generate_subscripts(embedding, 1) AS i,
         CAST(unnest(embedding) AS DOUBLE) AS x
  FROM embeddings
),
cent AS (SELECT label, i, AVG(x) AS cx FROM ex GROUP BY label, i)
SELECT label,
       ROUND(sqrt(SUM(cx * cx)), 4) AS centroid_norm,
       COUNT(*)                     AS dim
FROM cent
GROUP BY label
"""


def semantic_dedup(
    vectors: DataFrame,
    key_col: str,
    vec_col: str,
    n_centroids: int = 16,
    threshold: float = 0.95,
    seed: int = 42,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): cluster the
    embedding space with the deterministic sampled-centroid quantizer,
    then drop items that have a near-duplicate (cosine >= threshold,
    rounded 4dp) WITHIN their cluster, keeping the lowest key of each
    dominating pair — the "min-key dominance" rule, a deterministic
    instantiation of the paper's keep-one-per-near-dup-group heuristic.

    Returns (key, centroid_id, kept) for every input row (kept = 1/0).

    Scale posture: assignment is MAP-ONLY (centroid matrix is KBs,
    closure-broadcast — see :func:`_make_assigner`); the pairwise stage
    shuffles ONCE on ``centroid_id`` (groupBy, not the r11 self-join's
    two-sided exchange) and is quadratic ONLY within a cluster, the
    paper's own cost model — n_centroids grows with the corpus to bound
    cluster sizes (the 100 TB knob). Within a cluster the dominance scan
    is a TILED BLAS GEMM (``_cluster_dropped_keys``): 4096x4096 tiles
    cap the materialized similarity block at ~134 MB however large a
    cluster gets, replacing the interpreted zip_with/aggregate cosine the
    self-join paid per pair (the _query_matrix lesson: measured 25 s vs
    <1 s for 2k x 2k x 64; this entry's r12 A/B: 5.4 s -> 1.3 s at sf0.1,
    PERF.md). No all-pairs anywhere.

    Determinism (what makes the exact SQL oracle possible): centroid
    init is the md5-hash-ordered sample (engine-portable,
    :func:`_centroid_seed_hash`), argmax assignment breaks ties toward
    the lowest centroid id in BOTH engines, and the threshold compares a
    4dp-rounded cosine. The kernel's float64 GEMM sums in a different
    order than the old Column chain and the oracle's SUM — all three
    agree at 4dp except on exact rounding-boundary cosines, which the
    drop DECISION is insensitive to by construction (near-dups sit at
    ~1.0, non-dups far below any sane threshold; a corpus engineered to
    put pairs exactly at the 4dp boundary is outside the contract, as it
    already was between the two JVM/DuckDB sum orders)."""
    import numpy as np

    from pyspark.sql.types import StructField, StructType

    base = vectors.select(F.col(key_col).alias("k"), _as_double(vec_col).alias("v"))
    init = (
        base.withColumn("__h", _centroid_seed_hash(F.col("k"), seed))
        .orderBy("__h", "k")
        .limit(n_centroids)
        .select("v")
        .collect()
    )
    cents = np.array([r["v"] for r in init], dtype=np.float64)
    assigned = base.withColumn("centroid_id", _make_assigner(cents)(F.col("v")))
    dropped = (
        assigned.select("centroid_id", "k", "v")
        .groupBy("centroid_id")
        .applyInPandas(
            _cluster_dropped_keys(threshold),
            StructType([StructField("dk", assigned.schema["k"].dataType)]),
        )
        # duplicate keys are legal input: the same key can be dropped as
        # several rows (even across clusters, if its copies embed apart) and
        # a non-distinct dk would multiply the left join's kept-flag rows
        .distinct()
    )
    return assigned.join(dropped, assigned.k == F.col("dk"), "left").select(
        F.col("k").alias(key_col),
        "centroid_id",
        F.col("dk").isNull().cast("int").alias("kept"),
    )


def _cluster_dropped_keys(threshold: float, tile: int = 4096):
    """Per-cluster min-key dominance scan as a tiled float64 GEMM.

    Rows sorted by key; a row is DROPPED iff any STRICTLY-smaller key in
    the cluster has 4dp-rounded cosine >= threshold against it (the same
    rule the SQL oracle states as ``k < k2 AND round(cos, 4) >= t``).
    Tiling both GEMM dimensions at ``tile`` bounds the SIMILARITY BLOCK's
    peak memory at ~``tile**2 * 8`` bytes (~134 MB) regardless of cluster
    size, so a skewed cluster's GEMM degrades to more tiles, not a bigger
    block. The cluster's ROW data is still materialized whole in the task
    (the pandas frame plus the n x d float64 matrix, O(cluster_size x
    dim)) — ``n_centroids`` is the knob that sizes clusters to executor
    memory. Zero-norm
    vectors produce NaN cosines, which compare False against the
    threshold — exactly the oracle's NULL semantics (they neither
    dominate nor get dropped). Strict key inequality (not row index)
    guards duplicate keys: equal keys never dominate each other, matching
    ``<`` in both engines."""

    def run(pdf):
        import numpy as np
        import pandas as pd

        pdf = pdf.sort_values("k", ignore_index=True)
        n = len(pdf)
        if n < 2:
            return pd.DataFrame({"dk": pdf["k"][:0]})
        m = np.asarray(pdf["v"].tolist(), dtype=np.float64)
        norms = np.sqrt((m * m).sum(axis=1))
        keys = pdf["k"].to_numpy()
        # first row index of each key's equal-key run: strict dominance
        # means row i dominates column j only when i < first_idx[j]
        first_idx = np.searchsorted(keys, keys, side="left")
        dropped = np.zeros(n, dtype=bool)
        for j0 in range(1, n, tile):
            j1 = min(j0 + tile, n)
            cols = np.arange(j0, j1)
            limit = first_idx[j0:j1]  # rows strictly below this dominate
            acc = dropped[j0:j1]
            for i0 in range(0, int(limit.max()), tile):
                i1 = min(i0 + tile, int(limit.max()))
                with np.errstate(divide="ignore", invalid="ignore"):
                    sims = (m[i0:i1] @ m[cols].T) / np.outer(
                        norms[i0:i1], norms[cols]
                    )
                    # half-away-from-zero at 4dp: the F.round/DuckDB ROUND
                    # convention (np.round is half-even); NaN rides through
                    sims = np.floor(np.abs(sims) * 1e4 + 0.5) / 1e4 * np.sign(sims)
                rows = np.arange(i0, i1)[:, None]
                acc |= ((rows < limit[None, :]) & (sims >= threshold)).any(axis=0)
            dropped[j0:j1] = acc
        return pd.DataFrame({"dk": pdf["k"][dropped]})

    return run


def q_semantic_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """SemDeDup over the embeddings table with injected exact clones
    (every 20th vector re-appears as vec_id+100000): the synthetic
    corpus has no natural near-dups (max pairwise cosine ~0.49), so the
    clones are what exercises the drop rule at a realistic threshold —
    every clone must be dropped in favor of its lower-keyed original,
    every original kept. The oracle replicates the ENTIRE pipeline
    (augmentation, hash-sampled centroids, tie-broken argmax assignment,
    in-cluster 4dp-rounded cosine, min-key dominance) in SQL."""
    emb = spark.read.parquet(f"{sf}/embeddings.parquet").select("vec_id", "embedding")
    clones = emb.where(F.col("vec_id") % 20 == 0).withColumn(
        "vec_id", F.col("vec_id") + 100000
    )
    corpus = emb.unionByName(clones)
    return semantic_dedup(corpus, "vec_id", "embedding", n_centroids=16,
                          threshold=0.95, seed=42)


# full replica of q_semantic_dedup (augmented corpus -> hash-sampled
# centroids -> lowest-cid-tie argmax assignment -> in-cluster pairwise
# 4dp cosine -> min-key dominance drop rule)
Q_SEMANTIC_DEDUP_SQL = """
WITH corpus AS (
  SELECT vec_id, embedding FROM embeddings
  UNION ALL
  SELECT vec_id + 100000 AS vec_id, embedding FROM embeddings WHERE vec_id % 20 = 0
),
ex AS (
  SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS v,
         generate_subscripts(embedding, 1) AS i
  FROM corpus
),
norms AS (SELECT vec_id, sqrt(SUM(v * v)) AS nrm FROM ex GROUP BY vec_id),
cent AS (
  SELECT vec_id AS cid_key,
         CAST(ROW_NUMBER() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR) || '-42'), vec_id) AS INTEGER) - 1 AS cid
  FROM corpus
  QUALIFY ROW_NUMBER() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR) || '-42'), vec_id) <= 16
),
cvec AS (
  SELECT c.cid, e.i, e.v / GREATEST(n.nrm, 1e-12) AS cv
  FROM cent c JOIN ex e ON e.vec_id = c.cid_key JOIN norms n ON n.vec_id = c.cid_key
),
uvec AS (
  SELECT e.vec_id, e.i, e.v / GREATEST(n.nrm, 1e-12) AS uv
  FROM ex e JOIN norms n ON n.vec_id = e.vec_id
),
sim AS (
  SELECT u.vec_id, c.cid, SUM(u.uv * c.cv) AS s
  FROM uvec u JOIN cvec c ON u.i = c.i
  GROUP BY 1, 2
),
assign AS (
  SELECT vec_id, cid FROM (
    SELECT vec_id, cid, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY s DESC, cid ASC) AS rn
    FROM sim) WHERE rn = 1
),
pairs AS (
  SELECT a.vec_id AS ka, b.vec_id AS kb
  FROM assign a JOIN assign b ON a.cid = b.cid AND a.vec_id < b.vec_id
),
cos AS (
  SELECT p.ka, p.kb, ROUND(SUM(ea.v * eb.v) / (na.nrm * nb.nrm), 4) AS c
  FROM pairs p
  JOIN ex ea ON ea.vec_id = p.ka
  JOIN ex eb ON eb.vec_id = p.kb AND eb.i = ea.i
  JOIN norms na ON na.vec_id = p.ka
  JOIN norms nb ON nb.vec_id = p.kb
  GROUP BY p.ka, p.kb, na.nrm, nb.nrm
),
dropped AS (SELECT DISTINCT kb FROM cos WHERE c >= 0.95)
SELECT a.vec_id, a.cid AS centroid_id,
       CASE WHEN d.kb IS NULL THEN 1 ELSE 0 END AS kept
FROM assign a LEFT JOIN dropped d ON d.kb = a.vec_id
"""


#: bump when incremental-SemDeDup semantics (assignment, rounding, drop
#: rule) change — a persisted kept set written under old semantics must
#: refuse loudly instead of silently mis-deduping every future batch.
#: v2: centroid-matrix content fingerprint added to the metadata — two
#: different codebooks can share (n_centroids, seed) (re-sampled after
#: the kept corpus changed, or trained elsewhere), and a mismatched
#: quantizer passing the guard is exactly the silent-survival failure
#: the guard exists to stop (advice find).
_SEMDEDUP_FORMAT = 2

_SEMDEDUP_META_COLS = ("__n_centroids", "__seed", "__semdedup_fmt", "__centroid_md5")


def _centroid_fingerprint(centroids) -> str:
    """Content hash of the quantizer: md5 of the float64 centroid matrix
    rounded to 9 dp (absorbs sub-1e-9 serialization noise; any real
    codebook difference — a re-sample, a retrain, a precision downcast —
    changes the hash, which is the point: assignment geometry changed)."""
    import hashlib

    import numpy as np

    arr = np.ascontiguousarray(np.round(np.asarray(centroids, dtype="float64"), 9))
    return hashlib.md5(arr.tobytes()).hexdigest()


def write_semdedup_kept(
    kept: DataFrame,
    key_col: str,
    vec_col: str,
    url: str,
    *,
    centroids,
    seed: int,
) -> None:
    """Persist the KEPT corpus for incremental SemDeDup: rows assigned
    map-only with the same quantizer every future batch will use, written
    partitioned by ``centroid_id`` so a new batch's dominance scan reads
    ONLY the cluster directories it probes (partition pruning — at 100 TB
    the kept set is the big side and a crawl batch touches a subset of
    clusters). Config rides as constant metadata columns, validated on
    read (the ``_SIG_META_COLS`` pattern: a kept set and a batch assigned
    under different quantizers must never silently join)."""
    from ..api import write_table

    assigned = assign_with_centroids(kept, key_col, vec_col, centroids)
    df = (
        assigned.select(
            F.col("k").alias(key_col), F.col("v").alias(vec_col), "centroid_id"
        )
        .withColumn("__n_centroids", F.lit(int(len(centroids))))
        .withColumn("__seed", F.lit(int(seed)))
        .withColumn("__semdedup_fmt", F.lit(_SEMDEDUP_FORMAT))
        .withColumn("__centroid_md5", F.lit(_centroid_fingerprint(centroids)))
    )
    write_table(df, url, partition_by=["centroid_id"])


def read_semdedup_kept(
    spark: SparkSession, url: str, *, centroids, seed: int
) -> DataFrame:
    """Load a persisted kept set and REFUSE config mismatches: missing
    metadata, mixed configs (appended-to table), wrong format version, or
    a quantizer that differs from the one the caller is about to assign
    new batches with — n_centroids / seed AND the centroid matrix's
    content fingerprint, since two codebooks can share both scalars
    (re-sampled or retrained elsewhere with the same seed). Returns the
    kept rows with ``centroid_id`` intact — assignment is never
    recomputed."""
    from ..fs import get_url_and_fs

    path, fs = get_url_and_fs(url)
    df = spark.read.parquet(fs.spark_url(path))
    missing = [c for c in _SEMDEDUP_META_COLS if c not in df.columns]
    if missing:
        raise ValueError(
            f"SemDeDup kept table at {url} lacks metadata column(s) {missing} "
            f"— rebuild with write_semdedup_kept (format v{_SEMDEDUP_FORMAT})"
        )
    configs = [
        tuple(r) for r in df.select(*_SEMDEDUP_META_COLS).distinct().limit(3).collect()
    ]
    if len(configs) != 1:
        raise ValueError(
            f"SemDeDup kept table at {url} mixes configs {configs} "
            "(appended-to table?) — rebuild it"
        )
    n_cent, got_seed, fmt, got_md5 = configs[0]
    want_md5 = _centroid_fingerprint(centroids)
    if (
        fmt != _SEMDEDUP_FORMAT
        or n_cent != len(centroids)
        or got_seed != seed
        or got_md5 != want_md5
    ):
        raise ValueError(
            f"SemDeDup kept table at {url} was written with "
            f"(n_centroids={n_cent}, seed={got_seed}, fmt=v{fmt}, "
            f"centroid_md5={got_md5}); this batch assigns with "
            f"(n_centroids={len(centroids)}, seed={seed}, "
            f"fmt=v{_SEMDEDUP_FORMAT}, centroid_md5={want_md5}) — near-dups "
            "would land in different clusters and silently survive. Rebuild "
            "the kept table or load the matching quantizer."
        )
    return df.drop(*_SEMDEDUP_META_COLS)


def semantic_dedup_against(
    new: DataFrame,
    kept: DataFrame,
    key_col: str,
    vec_col: str,
    *,
    centroids,
    threshold: float = 0.95,
) -> DataFrame:
    """Incremental / cross-corpus SemDeDup — the production shape of the
    Abbas et al. pipeline: dedup the NEW crawl batch against the KEPT
    corpus. A new row is dropped iff some kept vector in its cluster has
    4dp-rounded cosine >= threshold against it; kept rows always win (the
    corpus is the prior — no min-key rule across sides), and new-vs-new
    duplicates are NOT removed, compose with :func:`semantic_dedup` for
    that (the :func:`~fsql_spark.operators.dedup.dedup_against` contract).

    ``kept`` may be the persisted assigned table (from
    :func:`read_semdedup_kept`, ``centroid_id`` present — assignment is
    trusted, not recomputed) or raw vectors (assigned in-plan with the
    same quantizer). Returns (key, centroid_id, kept) for every NEW row.

    Scale shape: both assignments are MAP-ONLY (broadcast centroid
    matrix); the kept side is pruned to the batch's clusters FIRST via a
    broadcast semi-join on the <= n_centroids distinct centroid_ids the
    batch probes (partition pruning when the kept table is written
    partitioned by centroid_id), then ONE shuffle co-groups both sides on
    ``centroid_id`` and the dominance scan is the tiled float64 GEMM of
    :func:`semantic_dedup` — kept x new, never kept x kept. Per task the
    cluster's row data is O(cluster_size x dim); ``n_centroids`` is the
    knob that sizes clusters to executor memory."""
    from pyspark.sql.types import StructField, StructType

    new_assigned = assign_with_centroids(new, key_col, vec_col, centroids)
    if "centroid_id" in kept.columns:
        kept_assigned = kept.select(
            F.col(key_col).alias("k"), _as_double(vec_col).alias("v"), "centroid_id"
        )
    else:
        kept_assigned = assign_with_centroids(kept, key_col, vec_col, centroids)

    probed = new_assigned.select("centroid_id").distinct()
    kept_pruned = kept_assigned.join(F.broadcast(probed), "centroid_id", "left_semi")

    # kept rows ride with a NULL key: the kernel only needs their vectors,
    # and a null key sidesteps any key-type mismatch between corpora
    both = new_assigned.select(
        "centroid_id", "k", "v", F.lit(1).alias("side")
    ).unionByName(
        kept_pruned.select(
            "centroid_id",
            F.lit(None).cast(new_assigned.schema["k"].dataType).alias("k"),
            "v",
            F.lit(0).alias("side"),
        )
    )
    dropped = (
        both.groupBy("centroid_id")
        .applyInPandas(
            _cluster_dropped_against(threshold),
            StructType([StructField("dk", new_assigned.schema["k"].dataType)]),
        )
        .distinct()
    )
    return new_assigned.join(dropped, new_assigned.k == F.col("dk"), "left").select(
        F.col("k").alias(key_col),
        "centroid_id",
        F.col("dk").isNull().cast("int").alias("kept"),
    )


def _cluster_dropped_against(threshold: float, tile: int = 4096):
    """Per-cluster cross-corpus dominance scan: a NEW row (side=1) is
    dropped iff ANY kept vector (side=0) in the cluster has 4dp-rounded
    cosine >= threshold against it. Same tiled float64 GEMM and rounding
    conventions as :func:`_cluster_dropped_keys`, but the GEMM is
    kept x new — the kept side never compares against itself, so a batch
    probe costs |kept_cluster| x |new_cluster|, not the square of either.
    Tiling bounds the similarity block at ~``tile**2 * 8`` bytes; the
    cluster's row data is O(cluster_size x dim) per task, sized via
    ``n_centroids``. Zero-norm vectors yield NaN cosines which compare
    False — they neither dominate nor get dropped, the oracle's NULL
    semantics."""

    def run(pdf):
        import numpy as np
        import pandas as pd

        new_pdf = pdf[pdf["side"] == 1]
        kept_pdf = pdf[pdf["side"] == 0]
        if not len(new_pdf) or not len(kept_pdf):
            return pd.DataFrame({"dk": new_pdf["k"][:0]})
        mn = np.asarray(new_pdf["v"].tolist(), dtype=np.float64)
        mk = np.asarray(kept_pdf["v"].tolist(), dtype=np.float64)
        nn = np.sqrt((mn * mn).sum(axis=1))
        nk = np.sqrt((mk * mk).sum(axis=1))
        n_new, n_kept = len(mn), len(mk)
        dropped = np.zeros(n_new, dtype=bool)
        for j0 in range(0, n_new, tile):
            j1 = min(j0 + tile, n_new)
            acc = dropped[j0:j1]
            for i0 in range(0, n_kept, tile):
                i1 = min(i0 + tile, n_kept)
                with np.errstate(divide="ignore", invalid="ignore"):
                    sims = (mk[i0:i1] @ mn[j0:j1].T) / np.outer(
                        nk[i0:i1], nn[j0:j1]
                    )
                    # half-away-from-zero at 4dp (F.round/DuckDB ROUND)
                    sims = np.floor(np.abs(sims) * 1e4 + 0.5) / 1e4 * np.sign(sims)
                acc |= (sims >= threshold).any(axis=0)
            dropped[j0:j1] = acc
        return pd.DataFrame({"dk": new_pdf["k"][dropped]})

    return run


def q_semantic_dedup_incremental(spark: SparkSession, sf: str) -> DataFrame:
    """Incremental SemDeDup: the KEPT corpus is the even-id half of the
    embeddings table; the NEW batch is the odd-id half plus exact clones
    of every 10th even id (vec_id+100000) — the clones hit cosine 1.0
    against their kept originals and must be dropped, the natural odd-id
    rows survive (max natural pairwise cosine ~0.49 << 0.95). Centroids
    are hash-sampled from the KEPT corpus only (the quantizer is trained
    once on the corpus, then every batch assigns map-only — the
    :func:`write_semdedup_kept` lifecycle, exercised with the persisted
    table in tests/test_operators.py)."""
    emb = spark.read.parquet(f"{sf}/embeddings.parquet").select("vec_id", "embedding")
    kept = emb.where(F.col("vec_id") % 2 == 0)
    clones = emb.where(F.col("vec_id") % 20 == 0).withColumn(
        "vec_id", F.col("vec_id") + 100000
    )
    new = emb.where(F.col("vec_id") % 2 == 1).unionByName(clones)
    base = kept.select(F.col("vec_id").alias("k"), _as_double("embedding").alias("v"))
    init = (
        base.withColumn("__h", _centroid_seed_hash(F.col("k"), 42))
        .orderBy("__h", "k")
        .limit(16)
        .select("v")
        .collect()
    )
    import numpy as np

    cents = np.array([r["v"] for r in init], dtype=np.float64)
    return semantic_dedup_against(
        new, kept, "vec_id", "embedding", centroids=cents, threshold=0.95
    )


# full replica of q_semantic_dedup_incremental: kept-corpus-sampled
# centroids -> tie-broken argmax assignment of BOTH sides -> cross-corpus
# in-cluster 4dp cosine -> any-kept-match drop rule (no min-key: kept wins)
Q_SEMANTIC_DEDUP_INCREMENTAL_SQL = """
WITH kept AS (
  SELECT vec_id, embedding FROM embeddings WHERE vec_id % 2 = 0
),
new_batch AS (
  SELECT vec_id, embedding FROM embeddings WHERE vec_id % 2 = 1
  UNION ALL
  SELECT vec_id + 100000 AS vec_id, embedding FROM embeddings WHERE vec_id % 20 = 0
),
corpus AS (
  SELECT vec_id, embedding, 0 AS side FROM kept
  UNION ALL
  SELECT vec_id, embedding, 1 AS side FROM new_batch
),
ex AS (
  SELECT vec_id, side, CAST(unnest(embedding) AS DOUBLE) AS v,
         generate_subscripts(embedding, 1) AS i
  FROM corpus
),
norms AS (SELECT vec_id, side, sqrt(SUM(v * v)) AS nrm FROM ex GROUP BY vec_id, side),
cent AS (
  SELECT vec_id AS cid_key,
         CAST(ROW_NUMBER() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR) || '-42'), vec_id) AS INTEGER) - 1 AS cid
  FROM kept
  QUALIFY ROW_NUMBER() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR) || '-42'), vec_id) <= 16
),
cvec AS (
  SELECT c.cid, e.i, e.v / GREATEST(n.nrm, 1e-12) AS cv
  FROM cent c
  JOIN ex e ON e.vec_id = c.cid_key AND e.side = 0
  JOIN norms n ON n.vec_id = c.cid_key AND n.side = 0
),
uvec AS (
  SELECT e.vec_id, e.side, e.i, e.v / GREATEST(n.nrm, 1e-12) AS uv
  FROM ex e JOIN norms n ON n.vec_id = e.vec_id AND n.side = e.side
),
sim AS (
  SELECT u.vec_id, u.side, c.cid, SUM(u.uv * c.cv) AS s
  FROM uvec u JOIN cvec c ON u.i = c.i
  GROUP BY 1, 2, 3
),
assign AS (
  SELECT vec_id, side, cid FROM (
    SELECT vec_id, side, cid,
           ROW_NUMBER() OVER (PARTITION BY vec_id, side ORDER BY s DESC, cid ASC) AS rn
    FROM sim) WHERE rn = 1
),
pairs AS (
  SELECT n.vec_id AS nk, k.vec_id AS kk
  FROM assign n JOIN assign k ON n.cid = k.cid AND n.side = 1 AND k.side = 0
),
cos AS (
  SELECT p.nk, ROUND(SUM(en.v * ek.v) / (nn.nrm * nk2.nrm), 4) AS c
  FROM pairs p
  JOIN ex en ON en.vec_id = p.nk AND en.side = 1
  JOIN ex ek ON ek.vec_id = p.kk AND ek.side = 0 AND ek.i = en.i
  JOIN norms nn ON nn.vec_id = p.nk AND nn.side = 1
  JOIN norms nk2 ON nk2.vec_id = p.kk AND nk2.side = 0
  GROUP BY p.nk, p.kk, nn.nrm, nk2.nrm
),
dropped AS (SELECT DISTINCT nk FROM cos WHERE c >= 0.95)
SELECT a.vec_id, a.cid AS centroid_id,
       CASE WHEN d.nk IS NULL THEN 1 ELSE 0 END AS kept
FROM assign a LEFT JOIN dropped d ON d.nk = a.vec_id
WHERE a.side = 1
"""


def hard_negative_topk(
    vectors: DataFrame,
    queries: DataFrame,
    key_col: str,
    vec_col: str,
    label_col: str,
    k: int,
) -> DataFrame:
    """Hard-negative mining for contrastive training (the DPR/SimCSE data
    prep step): for each anchor, the ``k`` most-cosine-similar corpus
    vectors whose LABEL DIFFERS — the negatives that sit closest to the
    decision boundary and teach an embedding model the most. Exact
    brute-force formulation (the same blocked-GEMM kernel posture as
    :func:`brute_force_topk`: corpus streams through Arrow batches, ONE
    BLAS matmul per batch against the broadcast anchor matrix; each batch
    emits its local label-masked top-k, a subset of which is the global
    top-k under the same total order, finalized by one small window).
    Scale path: swap the corpus stream for :func:`ivf_ann_topk`'s probed
    cells and apply the same label mask — negatives are near the anchor
    by construction, exactly where IVF probes."""
    import numpy as np
    import pandas as pd

    from pyspark.sql.types import DoubleType, LongType, StructField, StructType

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    rows = queries.select(key_col, vec_col, label_col).collect()
    q_keys = np.array([r[key_col] for r in rows], dtype=np.int64)
    q_labels = np.array([r[label_col] for r in rows], dtype=np.int64)
    q_mat = np.array([list(r[vec_col]) for r in rows], dtype=np.float64)
    q_mat = q_mat / np.maximum(np.linalg.norm(q_mat, axis=1, keepdims=True), 1e-12)

    schema = StructType(
        [
            StructField("anchor_id", LongType()),
            StructField("negative_id", LongType()),
            StructField("cos", DoubleType()),
        ]
    )

    def kernel(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            v = np.array([list(x) for x in pdf[vec_col]], dtype=np.float64)
            v = v / np.maximum(np.linalg.norm(v, axis=1, keepdims=True), 1e-12)
            sims = v @ q_mat.T
            n_ids = pdf[key_col].to_numpy()
            n_labels = pdf[label_col].to_numpy()
            out_q, out_n, out_c = [], [], []
            for j in range(sims.shape[1]):
                cand = np.nonzero(n_labels != q_labels[j])[0]
                if not len(cand):
                    continue
                col = sims[cand, j]
                order = np.argsort(-col, kind="stable")[:k]
                top = cand[order]
                out_q.extend([q_keys[j]] * len(top))
                out_n.extend(n_ids[top])
                out_c.extend(sims[top, j])
            yield pd.DataFrame({"anchor_id": out_q, "negative_id": out_n, "cos": out_c})

    scored = vectors.select(key_col, vec_col, label_col).mapInPandas(kernel, schema)
    w = Window.partitionBy("anchor_id").orderBy(F.desc("cos"), F.asc("negative_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("anchor_id", "negative_id", "rank")
    )


def hard_negative_topk_ivf(
    vectors: DataFrame,
    queries: DataFrame,
    key_col: str,
    vec_col: str,
    label_col: str,
    k: int,
    n_centroids: int = 16,
    n_probe: int = 4,
    seed: int = 42,
    iterations: int = 2,
) -> DataFrame:
    """The SCALE path for hard-negative mining: IVF-probed candidates with
    the label mask applied declaratively on the candidate stream — each
    anchor scores only its ``n_probe`` inverted lists (~corpus *
    n_probe / n_centroids candidates), which is exactly where hard
    negatives live (they are near the anchor by construction). Same
    ranked-output contract as :func:`ivf_ann_topk` (rounded-cosine total
    order); with ``n_probe == n_centroids`` the candidate set is the full
    corpus and the result is exact. The per-anchor label rides the
    broadcast query side; the neighbor label joins onto the BOUNDED
    candidate stream, never the full corpus cross product."""
    out = ivf_ann_topk(
        vectors, queries, key_col, vec_col,
        # over-fetch: the mask drops same-label candidates AFTER ranking
        # would otherwise have cut them — rank on the masked stream instead
        k=k, n_centroids=n_centroids, n_probe=n_probe, seed=seed,
        iterations=iterations, _label_mask=(label_col,),
    )
    return out.select(
        F.col("query_id").alias("anchor_id"),
        F.col("neighbor_id").alias("negative_id"),
        "rank",
        "cos",
    )


def q_embedding_hard_negatives(spark: SparkSession, sf: str) -> DataFrame:
    """Top-3 hard negatives (highest-cosine DIFFERENT-label vectors) for
    each of the first 20 anchors — the contrastive-training mining step,
    exact-brute oracle."""
    emb = _emb(spark, sf)
    qs = emb.where(F.col("vec_id") < 20)
    return hard_negative_topk(emb, qs, "vec_id", "embedding", "label", k=3)


Q_EMB_HARD_NEG_SQL = """
WITH ex AS (
  SELECT vec_id, label, CAST(unnest(embedding) AS DOUBLE) AS v,
         generate_subscripts(embedding, 1) AS i
  FROM embeddings
),
norms AS (SELECT vec_id, sqrt(SUM(v * v)) AS nrm FROM ex GROUP BY vec_id),
dots AS (
  SELECT a.vec_id AS anchor_id, b.vec_id AS negative_id, SUM(a.v * b.v) AS d
  FROM ex a JOIN ex b ON a.i = b.i AND b.label != a.label
  WHERE a.vec_id < 20
  GROUP BY 1, 2
),
ranked AS (
  SELECT anchor_id, negative_id,
         CAST(ROW_NUMBER() OVER (PARTITION BY anchor_id
                                 ORDER BY d / (na.nrm * nb.nrm) DESC, negative_id ASC) AS INTEGER) AS rank
  FROM dots
  JOIN norms na ON anchor_id = na.vec_id
  JOIN norms nb ON negative_id = nb.vec_id
)
SELECT anchor_id, negative_id, rank FROM ranked WHERE rank <= 3
"""


SIMILARITY_QUERIES = {
    "q_semantic_dedup": q_semantic_dedup,
    "q_semantic_dedup_incremental": q_semantic_dedup_incremental,
    "q_embedding_hard_negatives": q_embedding_hard_negatives,

    "q_embedding_similar_pairs": q_embedding_similar_pairs,
    "q_embedding_knn": q_embedding_knn,
    "q_embedding_ann_lsh": q_embedding_ann_lsh,
    "q_embedding_ivf_knn": q_embedding_ivf_knn,
    "q_embedding_ivf_ann": q_embedding_ivf_ann,
    "q_embedding_near_dup_keys": q_embedding_near_dup_keys,
    "q_embedding_near_dup_keys_lsh": q_embedding_near_dup_keys_lsh,
    "q_embedding_quantize": q_embedding_quantize,
    "q_embedding_label_centroids": q_embedding_label_centroids,
}

SIMILARITY_ORACLES = {
    "q_semantic_dedup": Q_SEMANTIC_DEDUP_SQL,  # full SemDeDup replica
    "q_semantic_dedup_incremental": Q_SEMANTIC_DEDUP_INCREMENTAL_SQL,
    "q_embedding_similar_pairs": Q_EMB_PAIRS_SQL,
    "q_embedding_knn": Q_EMB_KNN_SQL,
    "q_embedding_hard_negatives": Q_EMB_HARD_NEG_SQL,
    # the LSH entries' twins REPLICATE the approximate pipeline exactly in
    # SQL (inlined seeded plane matrix) — sub-recall-1 is no obstacle to a
    # value-level oracle because the pipeline is deterministic end-to-end
    "q_embedding_ann_lsh": Q_EMB_ANN_LSH_SQL,
    "q_embedding_near_dup_keys_lsh": Q_EMB_NEAR_DUP_LSH_SQL,
    "q_embedding_ivf_knn": Q_EMB_IVF_SQL,  # full-probe config => exact
    "q_embedding_ivf_ann": Q_EMB_IVF_ANN_SQL,  # sampled-centroid replica
    "q_embedding_near_dup_keys": Q_EMB_NEAR_DUP_SQL,
    "q_embedding_quantize": Q_EMBEDDING_QUANTIZE_SQL,
    "q_embedding_label_centroids": Q_EMB_CENTROIDS_SQL,
}
