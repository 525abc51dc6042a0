"""Deterministic sketch operators: estimator accuracy, small-set exact
mode, and layout-invariance (the properties that make a hash-derived sketch
preferable to a seeded-RNG one)."""

from __future__ import annotations

from pyspark.sql import functions as F

from fsql_spark.operators import kmv_distinct, sampled_quantiles


def test_kmv_exact_below_k(spark):
    df = spark.createDataFrame([(i % 40,) for i in range(500)], "v long")
    row = kmv_distinct(df, "v", k=128).collect()[0]
    assert row["n_distinct_exact"] == 40
    assert row["kmv_estimate"] == 40.0  # sketch holds every value: exact mode


def test_kmv_estimate_within_tolerance(spark):
    # 5,000 distinct values, k=256: KMV relative error ~ 1/sqrt(k-1) ~ 6.3%;
    # assert a generous 4-sigma band so the test pins accuracy, not luck
    df = spark.range(5000).select(F.concat(F.lit("val-"), F.col("id")).alias("v"))
    row = kmv_distinct(df, "v", k=256).collect()[0]
    assert row["n_distinct_exact"] == 5000
    assert abs(row["kmv_estimate"] - 5000) / 5000 < 0.25


def test_kmv_layout_invariant(spark):
    df = spark.range(2000).select((F.col("id") % 700).alias("v"))
    a = kmv_distinct(df, "v", k=64).collect()[0]["kmv_estimate"]
    b = kmv_distinct(df.repartition(13), "v", k=64).collect()[0]["kmv_estimate"]
    assert a == b  # hash-derived: partitioning cannot change the answer


def test_kmv_grouped(spark):
    rows = [("a", i) for i in range(300)] + [("b", i) for i in range(10)]
    df = spark.createDataFrame(rows, "g string, v long")
    out = {r["g"]: r for r in kmv_distinct(df, "v", k=128, group_cols=["g"]).collect()}
    assert out["b"]["n_distinct_exact"] == 10 and out["b"]["kmv_estimate"] == 10.0
    assert out["a"]["n_distinct_exact"] == 300
    assert abs(out["a"]["kmv_estimate"] - 300) / 300 < 0.5


def test_shuffle_deterministic_is_a_permutation(spark):
    from pyspark.sql.window import Window

    from fsql_spark.operators import shuffle_deterministic

    df = spark.range(1000).select(F.col("id").alias("doc_id"))
    out = shuffle_deterministic(df, "doc_id", seed=7)
    positions = sorted(r["shuffle_pos"] for r in out.collect())
    assert positions == list(range(1, 1001))  # exact permutation, 1-based
    # layout-invariant: a different partitioning yields the identical order
    again = {
        r["doc_id"]: r["shuffle_pos"]
        for r in shuffle_deterministic(df.repartition(17), "doc_id", seed=7).collect()
    }
    first = {r["doc_id"]: r["shuffle_pos"] for r in out.collect()}
    assert first == again
    # banded rank == the naive single-partition ROW_NUMBER it decomposes
    h = F.md5(F.concat_ws("-", F.col("doc_id").cast("string"), F.lit("7")))
    naive = {
        r["doc_id"]: r["pos"]
        for r in df.withColumn(
            "pos", F.row_number().over(Window.orderBy(h.asc(), F.col("doc_id").asc()))
        ).collect()
    }
    assert first == naive
    # a different seed is a genuinely different epoch order
    other = {
        r["doc_id"]: r["shuffle_pos"]
        for r in shuffle_deterministic(df, "doc_id", seed=8).collect()
    }
    assert other != first


def test_sampled_quantiles_deterministic_and_ordered(spark):
    df = spark.range(10_000).select(
        F.col("id").alias("key"), (F.col("id") * 7 % 10_000).cast("double").alias("x")
    )
    a = sampled_quantiles(df, "x", "key", fraction=0.2, quantiles=(0.5, 0.9)).collect()[0]
    b = sampled_quantiles(
        df.repartition(11), "x", "key", fraction=0.2, quantiles=(0.5, 0.9)
    ).collect()[0]
    assert (a["q50_x"], a["q90_x"], a["n_sampled"]) == (b["q50_x"], b["q90_x"], b["n_sampled"])
    # a 20% uniform sample of 10k values: quantile estimates land near truth
    assert abs(a["q50_x"] - 5000) < 500
    assert abs(a["q90_x"] - 9000) < 500
    assert a["q50_x"] < a["q90_x"]
    assert 1600 < a["n_sampled"] < 2400


def test_hll_accuracy_and_layout_invariance(spark):
    from fsql_spark.operators.sketches import hll_distinct

    df = spark.range(20_000).select((F.col("id") % 12_345).cast("string").alias("v"))
    a = hll_distinct(df, "v", p=10).collect()[0]
    assert a["n_distinct_exact"] == 12_345
    # p=10 -> ~1.04/sqrt(1024) ~ 3.3% std err; 12% is a 3.5-sigma bound
    assert abs(a["hll_estimate"] - 12_345) / 12_345 < 0.12
    # partitioning must not change a content-hash sketch
    b = hll_distinct(df.repartition(17), "v", p=10).collect()[0]
    assert (a["n_distinct_exact"], a["hll_estimate"]) == (
        b["n_distinct_exact"], b["hll_estimate"]
    )


def test_hll_small_range_linear_counting(spark):
    from fsql_spark.operators.sketches import hll_distinct

    df = spark.range(50).select(F.col("id").cast("string").alias("v"))
    row = hll_distinct(df, "v", p=10).collect()[0]
    # 50 distinct <= 2.5m with empty registers -> linear counting, near-exact
    assert row["n_distinct_exact"] == 50
    assert abs(row["hll_estimate"] - 50) < 5


def test_hll_p_bounds(spark):
    import pytest as _pytest

    from fsql_spark.operators.sketches import hll_distinct

    df = spark.range(5).select(F.col("id").cast("string").alias("v"))
    for bad in (3, 17, 9):  # 9 leaves a 52-bit tail: 2^(51-rho) underflows
        with _pytest.raises(ValueError):
            hll_distinct(df, "v", p=bad)
