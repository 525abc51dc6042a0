"""Connected-components cluster resolution: transitivity, determinism,
representative selection — the graph properties the SQL-oracle harness checks
only end-to-end (`q_dedup_clusters` vs a DuckDB recursive CTE)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fsql_spark.operators import cluster_representatives, connected_components
from fsql_spark.operators.clustering import ComponentsNotConverged


def _pairs(spark, rows):
    return spark.createDataFrame(rows, "doc_a long, doc_b long")


def test_transitive_chain_collapses_to_one_cluster(spark):
    # A~B, B~C, C~D: no direct A~D edge, yet all four must share a cluster
    comps = connected_components(_pairs(spark, [(1, 2), (2, 3), (3, 4)]))
    got = {(r.node, r.cluster_id) for r in comps.collect()}
    assert got == {(1, 1), (2, 1), (3, 1), (4, 1)}


def test_separate_components_stay_separate(spark):
    comps = connected_components(_pairs(spark, [(1, 2), (10, 11), (11, 12)]))
    by_node = {r.node: r.cluster_id for r in comps.collect()}
    assert by_node == {1: 1, 2: 1, 10: 10, 11: 10, 12: 10}


def test_edge_direction_irrelevant(spark):
    # min key appears on the RIGHT side: symmetric closure must still find it
    comps = connected_components(_pairs(spark, [(5, 1), (5, 9)]))
    by_node = {r.node: r.cluster_id for r in comps.collect()}
    assert by_node == {1: 1, 5: 1, 9: 1}


def test_empty_pairs_yield_empty_components(spark):
    comps = connected_components(_pairs(spark, []))
    assert comps.count() == 0
    assert comps.columns == ["node", "cluster_id"]


def test_representatives_keep_min_member_and_singletons(spark):
    df = spark.range(1, 8).select(F.col("id").alias("doc_id"))
    comps = connected_components(_pairs(spark, [(2, 3), (3, 4), (6, 7)]))
    kept = sorted(r.doc_id for r in cluster_representatives(df, "doc_id", comps).collect())
    # clusters {2,3,4}->2 and {6,7}->6; singletons 1,5 survive untouched
    assert kept == [1, 2, 5, 6]


def test_long_chain_converges_and_guard_raises(spark):
    # pointer jumping: a 30-link chain must converge in O(log n) rounds,
    # well under the default max_iterations (driver_edge_threshold=0 forces
    # the distributed loop — small graphs take the union-find path)
    chain = [(i, i + 1) for i in range(30)]
    comps = connected_components(_pairs(spark, chain), driver_edge_threshold=0)
    assert {r.cluster_id for r in comps.collect()} == {0}
    with pytest.raises(ComponentsNotConverged):
        connected_components(_pairs(spark, chain), max_iterations=1, driver_edge_threshold=0)


def test_driver_and_distributed_paths_agree(spark):
    # same graph through both execution paths => identical labeling
    edges = [(1, 2), (2, 3), (9, 3), (20, 21), (40, 21), (50, 51)]
    driver = {
        (r.node, r.cluster_id)
        for r in connected_components(_pairs(spark, edges)).collect()
    }
    dist = {
        (r.node, r.cluster_id)
        for r in connected_components(
            _pairs(spark, edges), driver_edge_threshold=0
        ).collect()
    }
    assert driver == dist
    assert {(1, 1), (9, 1), (40, 20), (51, 50)} <= driver
