"""Label propagation (labelprop.py): known-answer tests on constructed
graphs for the semantics the SQL-oracle harness can't isolate — seed
clamping, integer-vote argmax with tie-break, hop-by-hop reach across
rounds, and the kNN graph's rank/cap rules."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from fsql_spark.operators import knn_graph, propagate_labels


def _nodes(spark, pairs):
    return spark.createDataFrame(pairs, "vec_id long, label int")


def _graph(spark, edges):
    return spark.createDataFrame(edges, "node long, nbr long, wgt int")


def _run(spark, nodes, graph, seed_ids, rounds):
    seeds = nodes.where(F.col("vec_id").isin(seed_ids))
    out = propagate_labels(
        nodes, graph, "vec_id", "label", rounds=rounds, seeds=seeds
    )
    return {r["vec_id"]: (r["label_pred"], r["is_seed"]) for r in out.collect()}


def test_labels_spread_one_hop_per_round(spark):
    # chain 1 -> 2 -> 3 (edges point FROM the consumer TO its neighbor):
    # node 2 hears seed 1 in round 1; node 3 hears node 2 only in round 2
    nodes = _nodes(spark, [(1, 7), (2, 0), (3, 0)])
    graph = _graph(spark, [(2, 1, 100), (3, 2, 100)])
    after1 = _run(spark, nodes, graph, [1], rounds=1)
    assert after1 == {1: (7, True), 2: (7, False), 3: (None, False)}
    after2 = _run(spark, nodes, graph, [1], rounds=2)
    assert after2 == {1: (7, True), 2: (7, False), 3: (7, False)}


def test_seeds_stay_clamped_against_majority(spark):
    # seed node 1 is surrounded by label-9 voters but must keep label 7
    nodes = _nodes(spark, [(1, 7), (2, 9), (3, 9)])
    graph = _graph(spark, [(1, 2, 100), (1, 3, 100)])
    out = _run(spark, nodes, graph, [1, 2, 3], rounds=2)
    assert out[1] == (7, True)


def test_weight_majority_and_tie_break(spark):
    # node 0 hears label 5 (weight 60) vs label 3 (40+19=59): 5 wins;
    # node 9 hears an EXACT integer tie (50 vs 50): smaller label wins
    nodes = _nodes(spark, [(0, 0), (9, 0), (1, 5), (2, 3), (3, 3), (4, 8), (5, 2)])
    graph = _graph(
        spark,
        [(0, 1, 60), (0, 2, 40), (0, 3, 19), (9, 4, 50), (9, 5, 50)],
    )
    out = _run(spark, nodes, graph, [1, 2, 3, 4, 5], rounds=1)
    assert out[0] == (5, False)
    assert out[9] == (2, False)


def test_unreachable_node_stays_null(spark):
    nodes = _nodes(spark, [(1, 7), (2, 0), (3, 0)])
    graph = _graph(spark, [(2, 1, 100)])  # 3 has no edges
    out = _run(spark, nodes, graph, [1], rounds=3)
    assert out[3] == (None, False)


def test_knn_graph_caps_and_ranks(spark):
    # 4 identical-direction vectors + 1 opposite: cosines are +/-1 in pips,
    # so ranking falls to the nbr tie-break and k caps the out-degree
    rows = [(i, [1.0, 0.0]) for i in range(4)] + [(9, [-1.0, 0.0])]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    g = knn_graph(emb, "vec_id", "embedding", k=2, n_centroids=1)
    got = {(r["node"], r["nbr"]): r["wgt"] for r in g.collect()}
    # node 0's 2 nearest: nbr 1 and 2 (ties by ascending nbr), both +1.0
    assert got[(0, 1)] == 10000 and got[(0, 2)] == 10000
    assert (0, 3) not in got and (0, 9) not in got
    # the opposite vector scores -1.0 pips toward any kept neighbor
    nine = {k: v for k, v in got.items() if k[0] == 9}
    assert set(nine.values()) == {-10000} and len(nine) == 2
    # every node emits at most k edges
    from collections import Counter
    outdeg = Counter(n for n, _ in got)
    assert max(outdeg.values()) <= 2


def test_hash_seed_fraction_one_labels_everything(spark):
    nodes = _nodes(spark, [(i, i % 3) for i in range(10)])
    graph = _graph(spark, [(0, 1, 1)])
    out = propagate_labels(nodes, graph, "vec_id", "label", seed_fraction=1.0, rounds=1)
    rows = out.collect()
    assert all(r["is_seed"] for r in rows)
    assert {r["vec_id"]: r["label_pred"] for r in rows} == {i: i % 3 for i in range(10)}


# --------------------------------------------------------------------------
# property: random graphs + random seeds vs a pure-Python synchronous model
# --------------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

PROP = settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

edges_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=7),   # node
        st.integers(min_value=0, max_value=7),   # nbr
        st.integers(min_value=1, max_value=100),  # wgt
    ),
    min_size=0,
    max_size=14,
)


def _python_lp(node_labels, edges, seed_ids, rounds):
    """Independent synchronous model: seeds clamp; every other node takes
    argmax (vote sum desc, label asc) over labeled neighbors each round."""
    seeds = {n: node_labels[n] for n in seed_ids}
    lab = {n: seeds.get(n) for n in node_labels}
    for _ in range(rounds):
        votes = {}
        for node, nbr, w in edges:
            if node == nbr or lab.get(nbr) is None:
                continue
            votes.setdefault(node, {}).setdefault(lab[nbr], 0)
            votes[node][lab[nbr]] += w
        new = {}
        for n in node_labels:
            if n in seeds:
                new[n] = seeds[n]
            elif votes.get(n):
                new[n] = min(votes[n].items(), key=lambda kv: (-kv[1], kv[0]))[0]
            else:
                new[n] = None
        lab = new
    return lab


@PROP
@given(
    edges=edges_strategy,
    labels=st.lists(st.integers(min_value=0, max_value=2), min_size=8, max_size=8),
    seed_mask=st.lists(st.booleans(), min_size=8, max_size=8),
    rounds=st.integers(min_value=1, max_value=3),
)
def test_propagation_matches_python_on_random_graphs(
    spark, edges, labels, seed_mask, rounds
):
    node_labels = dict(enumerate(labels))
    seed_ids = [i for i, m in enumerate(seed_mask) if m]
    nodes = _nodes(spark, list(node_labels.items()))
    # self-edges never vote (the kNN builder excludes them); model skips too
    graph = _graph(spark, [e for e in edges if e[0] != e[1]])
    got = _run(spark, nodes, graph, seed_ids, rounds)
    want = _python_lp(node_labels, edges, seed_ids, rounds)
    assert {k: v[0] for k, v in got.items()} == want
    assert {k for k, v in got.items() if v[1]} == set(seed_ids)
