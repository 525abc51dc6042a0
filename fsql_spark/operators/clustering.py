"""Near-dup cluster resolution: connected components over a pair relation.

Pair-level dedup (``jaccard_pairs`` / ``minhash_lsh_pairs`` / ``simhash_pairs``
/ ``embedding_near_dup_*``) emits EDGES; a training pipeline must then keep
one representative per connected CLUSTER — A~B and B~C must collapse to one
doc even when A~C was never emitted. This module closes that gap.

Scale design: iterative min-label propagation on the PAIR graph only —
|pairs| ~ O(duplicates), typically orders of magnitude smaller than the
corpus, so the loop's joins are narrow. Each round is one join + one
aggregate (2 shuffles) on (node, label) pairs; rounds needed = graph diameter
(near-dup clusters are dense, diameter is small — single digits in practice).
Lineage is truncated every round with ``localCheckpoint`` so the plan does
not grow unboundedly (the classic iterative-Spark failure). Convergence is
detected by the count of labels that changed (one action per round —
deliberate: at 100 TB the loop runs on the slim pair table, not the corpus).
For adversarial long-chain graphs, ``max_iterations`` bounds the loop and
raises rather than silently returning partial components.

No reference counterpart (the reference delegates all row-level compute,
`/root/reference/src/fsql/deser.py:30-31`); driver-mandated extension
surface (SURVEY §2.6). Oracle: DuckDB ``WITH RECURSIVE`` transitive closure
computes the identical min-reachable-key labels.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class ComponentsNotConverged(RuntimeError):
    """Label propagation hit max_iterations before reaching a fixpoint."""


def connected_components(
    pairs: DataFrame,
    key_a: str = "doc_a",
    key_b: str = "doc_b",
    max_iterations: int = 25,
    loop_partitions: int | None = None,
) -> DataFrame:
    """(node, cluster_id) for every node appearing in ``pairs``; cluster_id is
    the MINIMUM key reachable from the node — deterministic, stable across
    cluster layouts and restarts.

    Min-label propagation: every node starts labeled with itself; each round
    every node takes the min of its own and its neighbors' labels. Labels
    only ever decrease, so the fixpoint is exactly the per-component min key.
    Nodes not mentioned in ``pairs`` (singletons) are absent from the output
    by design — callers union them back as their own representatives (see
    :func:`cluster_representatives`).

    ``loop_partitions`` pins the shuffle width for the loop's joins/aggs:
    the pair graph is usually orders of magnitude smaller than the corpus,
    so session-wide widths (sized for the corpus) waste a task-launch per
    empty partition PER ROUND. None keeps the session setting."""
    from ..session import temp_conf

    conf = (
        {"spark.sql.shuffle.partitions": str(loop_partitions)}
        if loop_partitions
        else {}
    )
    with temp_conf(pairs.sparkSession, **conf):
        return _cc_loop(pairs, key_a, key_b, max_iterations)


def _cc_loop(
    pairs: DataFrame, key_a: str, key_b: str, max_iterations: int
) -> DataFrame:
    edges = pairs.select(F.col(key_a).alias("src"), F.col(key_b).alias("dst"))
    # symmetric closure: propagation must flow both directions
    edges = edges.union(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    edges = edges.distinct().persist()

    # seed with min(self, neighbors) — the first propagation round for free
    labels = (
        edges.groupBy("src")
        .agg(F.least(F.first("src"), F.min("dst")).alias("label"))
        .select(F.col("src").alias("node"), "label")
        .localCheckpoint()
    )
    for _ in range(max_iterations):
        nbr = edges.join(labels, edges.dst == labels.node).select(
            F.col("src").alias("node"), "label"
        )
        propagated = labels.union(nbr).groupBy("node").agg(F.min("label").alias("label"))
        # pointer jumping: label <- label(label). Halves the remaining chain
        # length every round, so convergence is O(log diameter) instead of
        # O(diameter) — the difference between 7 and 10^6 rounds on an
        # adversarial chain. Every label IS a node key (mins of node keys),
        # so the self-join always resolves; coalesce is belt-and-braces.
        jump = propagated.select(
            F.col("node").alias("label"), F.col("label").alias("label2")
        )
        new_labels = (
            propagated.join(jump, "label", "left")
            .select("node", F.coalesce("label2", "label").alias("label"))
        ).localCheckpoint()  # truncate lineage: plans must not grow per round
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .where(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            edges.unpersist()
            return labels.select("node", F.col("label").alias("cluster_id"))
    edges.unpersist()
    raise ComponentsNotConverged(
        f"connected_components did not converge in {max_iterations} rounds — "
        "the pair graph has a longer chain than expected; raise max_iterations"
    )


def cluster_representatives(
    df: DataFrame,
    key_col: str,
    components: DataFrame,
) -> DataFrame:
    """Keep one row per cluster (the min-key member) plus every singleton.

    ``components`` is the (node, cluster_id) output of
    :func:`connected_components`. A row survives unless its key appears in
    components with ``node != cluster_id`` — i.e. drop non-representative
    members, keep representatives and untouched rows. One anti-join against
    the slim members table (broadcastable whenever duplicates are rare)."""
    losers = components.where(F.col("node") != F.col("cluster_id")).select(
        F.col("node").alias(key_col)
    )
    return df.join(losers, key_col, "left_anti")


# --------------------------------------------------------------------------
# catalog entries + oracles
# --------------------------------------------------------------------------

def q_dedup_clusters(spark: SparkSession, sf: str) -> DataFrame:
    """Connected components over the exact-Jaccard near-dup pair graph (the
    oracle-able pair source; at scale feed minhash_lsh_pairs instead — the
    operator is pair-source-agnostic)."""
    from .dedup import jaccard_pairs

    docs = spark.read.parquet(f"{sf}/documents.parquet").where(F.col("doc_id") < 500)
    pairs = jaccard_pairs(docs, "doc_id", "text", threshold=0.95, ngram=1)
    # the pair graph is tiny relative to the corpus: narrow loop shuffles
    comps = connected_components(pairs, loop_partitions=8)
    return comps.select(F.col("node").alias("doc_id"), "cluster_id")


Q_DEDUP_CLUSTERS_SQL = """
WITH RECURSIVE tok AS (
  SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS w
  FROM documents WHERE doc_id < 500
),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM tok GROUP BY doc_id),
common AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS c
  FROM tok a JOIN tok b ON a.w = b.w AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
pair AS (
  SELECT doc_a, doc_b
  FROM common
  JOIN sizes s1 ON doc_a = s1.doc_id
  JOIN sizes s2 ON doc_b = s2.doc_id
  WHERE c * 1.0 / (s1.n + s2.n - c) >= 0.95
),
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM pair
  UNION
  SELECT doc_b, doc_a FROM pair
),
reach(node, lbl) AS (
  SELECT src, src FROM edges
  UNION
  SELECT e.src, r.lbl FROM edges e JOIN reach r ON e.dst = r.node
)
SELECT node AS doc_id, MIN(lbl) AS cluster_id FROM reach GROUP BY node
"""


CLUSTERING_QUERIES = {
    "q_dedup_clusters": q_dedup_clusters,
}

CLUSTERING_ORACLES = {
    "q_dedup_clusters": Q_DEDUP_CLUSTERS_SQL,
}
