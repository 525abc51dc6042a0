"""Unit tests for the round-8 analytics additions: conversion funnel,
cohort retention, market-basket pairs, count-min sketch, BM25 scoring,
and video keyframe selection — semantics pinned on handcrafted inputs
(the catalog oracles already pin them against DuckDB at corpus scale)."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------- funnel

def _funnel(spark, rows):
    """rows: (user_id, seconds, event_type) -> {stage: n_users}."""
    from fsql_spark.relational import q_events_funnel  # noqa: F401 — import check

    pdf = pd.DataFrame(rows, columns=["user_id", "s", "event_type"])
    pdf["ts"] = pd.to_datetime("2024-01-01") + pd.to_timedelta(pdf.pop("s"), unit="s")
    pdf["event_id"] = range(len(pdf))
    pdf["value"] = 1.0
    pdf["props"] = "{}"
    df = spark.createDataFrame(pdf)

    # run the same window logic through the public entry by monkeypatching
    # the table loader is heavier than reimplementing; instead exercise the
    # underlying shape directly via a temp view + the entry's SQL oracle
    # equivalence is covered by the strict gate. Here: semantics on Spark.
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prior = w.rowsBetween(Window.unboundedPreceding, -1)
    is_view = F.when(F.col("event_type") == "view", 1).otherwise(0)
    stage2 = F.when(
        (F.col("event_type") == "click") & (F.max(is_view).over(prior) == 1), 1
    ).otherwise(0)
    flagged = df.select("user_id", "ts", "event_id", "event_type",
                        is_view.alias("s1"), stage2.alias("s2"))
    stage3 = F.when(
        (F.col("event_type") == "purchase") & (F.max("s2").over(prior) == 1), 1
    ).otherwise(0)
    per_user = (
        flagged.withColumn("s3", stage3)
        .groupBy("user_id")
        .agg(F.max("s1").alias("r1"), F.max("s2").alias("r2"), F.max("s3").alias("r3"))
        .collect()
    )
    out = {"view": 0, "click": 0, "purchase": 0}
    for r in per_user:
        out["view"] += r.r1
        out["click"] += r.r2
        out["purchase"] += r.r3
    return out


def test_funnel_requires_strict_order(spark):
    rows = [
        (1, 0, "view"), (1, 10, "click"), (1, 20, "purchase"),   # full funnel
        (2, 0, "click"), (2, 10, "view"), (2, 20, "purchase"),   # click BEFORE view: stage2 never
        (3, 0, "view"), (3, 10, "purchase"), (3, 20, "click"),   # reaches click, not purchase
        (4, 0, "purchase"),                                       # nothing
    ]
    out = _funnel(spark, rows)
    assert out == {"view": 3, "click": 2, "purchase": 1}


def test_funnel_same_timestamp_breaks_tie_on_event_id(spark):
    # view and click at the SAME ts: event_id order decides; the view row
    # is inserted first (lower event_id) so the click sees it as prior
    rows = [(1, 0, "view"), (1, 0, "click")]
    assert _funnel(spark, rows)["click"] == 1
    rows = [(1, 0, "click"), (1, 0, "view")]
    assert _funnel(spark, rows)["click"] == 0


# ------------------------------------------------------------ count-min

def test_count_min_never_underestimates(spark):
    from fsql_spark.operators.sketches import count_min_cells

    pdf = pd.DataFrame({
        "token": [f"tok{i}" for i in range(500)],
        "n": [(i * 7) % 13 + 1 for i in range(500)],
    })
    counts = spark.createDataFrame(pdf)
    cells = count_min_cells(counts, "token", "n", depth=4, width=64)
    grid = {(r.cms_row, r.cms_cell): r.cell_count for r in cells.collect()}
    assert len(grid) <= 4 * 64
    # total mass per row equals the true total
    total = int(pdf["n"].sum())
    for row in range(4):
        assert sum(v for (r, _), v in grid.items() if r == row) == total
    # estimate (min over rows) >= exact for EVERY token — the CMS guarantee
    import hashlib

    def cell(row, tok):
        return int(hashlib.md5(f"{row}:{tok}".encode()).hexdigest()[:15], 16) % 64

    for tok, n in zip(pdf["token"], pdf["n"]):
        est = min(grid[(r, cell(r, tok))] for r in range(4))
        assert est >= n


def test_count_min_rejects_degenerate_shape(spark):
    from fsql_spark.operators.sketches import count_min_cells

    df = spark.createDataFrame(pd.DataFrame({"t": ["a"], "n": [1]}))
    with pytest.raises(ValueError):
        count_min_cells(df, "t", "n", depth=0)
    with pytest.raises(ValueError):
        count_min_cells(df, "t", "n", width=0)


# ----------------------------------------------------------------- BM25

def test_bm25_matches_hand_computation(spark):
    from fsql_spark.operators.retrieval import bm25_scores

    docs = spark.createDataFrame(pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": ["cat dog cat", "dog dog dog fish", "bird"],
    }))
    out = {(r.doc_id, r.term): (r.tf, r.score_bm25)
           for r in bm25_scores(docs, ["cat", "dog"]).collect()}
    # N=3, total tokens = 3+4+1 = 8, avgdl = 8/3
    n, avgdl, k1, b = 3, 8 / 3, 1.2, 0.75

    def score(tf, df, dl):
        idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
        return round(idf * (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * dl / avgdl)), 4)

    assert out[(1, "cat")] == (2, pytest.approx(score(2, 1, 3)))
    assert out[(1, "dog")] == (1, pytest.approx(score(1, 2, 3)))
    assert out[(2, "dog")] == (3, pytest.approx(score(3, 2, 4)))
    assert (3, "cat") not in out and (3, "dog") not in out
    assert all(s > 0 for (_, s) in out.values())


def test_bm25_corpus_stats_param_is_lazy_and_equivalent(spark):
    """Passing precomputed (n_docs, total_tokens) skips the eager corpus
    scan at construction time (no job runs) and yields identical scores."""
    from fsql_spark.operators.retrieval import bm25_scores

    docs = spark.createDataFrame(pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": ["cat dog cat", "dog dog dog fish", "bird"],
    }))
    eager = {(r.doc_id, r.term): (r.tf, r.score_bm25)
             for r in bm25_scores(docs, ["cat", "dog"]).collect()}

    tracker = spark.sparkContext.statusTracker()
    before = len(tracker.getJobIdsForGroup(None) or [])
    lazy_df = bm25_scores(docs, ["cat", "dog"], corpus_stats=(3, 8))
    after = len(tracker.getJobIdsForGroup(None) or [])
    assert after == before, "corpus_stats construction must not run a job"
    lazy = {(r.doc_id, r.term): (r.tf, r.score_bm25) for r in lazy_df.collect()}
    assert lazy == eager


def test_bm25_rejects_bad_query(spark):
    from fsql_spark.operators.retrieval import bm25_scores

    docs = spark.createDataFrame(pd.DataFrame({"doc_id": [1], "text": ["x"]}))
    with pytest.raises(ValueError):
        bm25_scores(docs, [])
    with pytest.raises(ValueError):
        bm25_scores(docs, ["a", "a"])


# ------------------------------------------------------------ keyframes

def test_keyframes_selects_scene_changes_only(spark):
    from fsql_spark.operators.multimodal import select_keyframes
    from fsql_spark.operators.video import encode_y4m

    # 5 frames: constant 10, 10, 50, 50, 49 -> cuts at 0 (always), 2 (|40|),
    # and 4 only if min_diff <= 4 (|1| per pixel * 4 px)
    vals = [10, 10, 50, 50, 49]
    frames = np.stack([np.full((2, 2), v, dtype=np.uint8) for v in vals])
    media = spark.createDataFrame(
        pd.DataFrame({"media_id": [7], "content": [bytearray(encode_y4m(frames, fps=(25, 1)))]})
    )
    got = {r.frame_idx: r.diff_energy for r in select_keyframes(media, min_diff=5).collect()}
    assert got == {0: 0, 2: 160}
    got = {r.frame_idx: r.diff_energy for r in select_keyframes(media, min_diff=1).collect()}
    assert got == {0: 0, 2: 160, 4: 4}


def test_keyframes_single_frame_video(spark):
    from fsql_spark.operators.multimodal import select_keyframes
    from fsql_spark.operators.video import encode_y4m

    frames = np.full((1, 2, 2), 200, dtype=np.uint8)
    media = spark.createDataFrame(
        pd.DataFrame({"media_id": [1], "content": [bytearray(encode_y4m(frames, fps=(25, 1)))]})
    )
    got = select_keyframes(media, min_diff=1000).collect()
    assert [(r.frame_idx, r.diff_energy) for r in got] == [(0, 0)]


def test_keyframes_rejects_bad_min_diff(spark):
    from fsql_spark.operators.multimodal import select_keyframes

    media = spark.createDataFrame(pd.DataFrame({"media_id": [1], "content": [b""]}))
    with pytest.raises(ValueError):
        select_keyframes(media, min_diff=0)


def test_keyframes_refuses_foreign_container(spark):
    from fsql_spark.operators.multimodal import select_keyframes

    media = spark.createDataFrame(
        pd.DataFrame({"media_id": [9], "content": [b"\x00\x00\x00\x18ftypmp42"]})
    )
    with pytest.raises(Exception, match="media_id=9|media 9|9"):
        select_keyframes(media, min_diff=1).collect()


# --------------------------------------------- cohort retention (real entry)

def test_cohort_retention_triangle_exact(spark, tmp_path):
    """Drive the ACTUAL catalog entry against a handcrafted events table:
    cohort = ISO week (Monday-start) of a user's first event; same-week
    repeat activity counts the user once per (cohort, offset) cell."""
    from fsql_spark.relational import q_events_cohort_retention

    # 2024-01-01 is a Monday, so week boundaries are exactly 01-01 / 01-08 / 01-15
    rows = [
        (1, "2024-01-01 10:00:00"),  # u1 cohort 01-01
        (1, "2024-01-17 09:00:00"),  # u1 active at offset 2
        (2, "2024-01-09 12:00:00"),  # u2 cohort 01-08
        (3, "2024-01-02 08:00:00"),  # u3 cohort 01-01
        (3, "2024-01-08 23:00:00"),  # u3 offset 1
        (3, "2024-01-10 01:00:00"),  # u3 offset 1 AGAIN -> still one user
    ]
    pdf = pd.DataFrame(rows, columns=["user_id", "ts"])
    pdf["ts"] = pd.to_datetime(pdf["ts"])
    pdf["event_id"] = range(len(pdf))
    pdf["event_type"] = "view"
    pdf["value"] = 1.0
    pdf["props"] = "{}"
    sf = str(tmp_path)
    spark.createDataFrame(pdf).coalesce(1).write.parquet(f"{sf}/events.parquet")

    got = {
        (str(r.cohort_week), r.week_offset): r.n_active_users
        for r in q_events_cohort_retention(spark, sf).collect()
    }
    assert got == {
        ("2024-01-01", 0): 2,
        ("2024-01-01", 1): 1,
        ("2024-01-01", 2): 1,
        ("2024-01-08", 0): 1,
    }


# ------------------------------------------------ basket pairs (real entry)

def test_basket_pairs_dedup_order_and_threshold(spark, tmp_path):
    """Drive the ACTUAL catalog entry: duplicate parts in one order count the
    brand once, pairs come out lexicographically (brand_a < brand_b), and
    pairs under the n_orders >= 3 support threshold are dropped."""
    from fsql_spark.relational import q_basket_brand_pairs

    li = pd.DataFrame(
        [  # o1 holds p1 TWICE -> {B1,B2} once; o4 is a single-brand basket
            (1, 101), (1, 102), (1, 101),
            (2, 101), (2, 102),
            (3, 101), (3, 102), (3, 103),
            (4, 101),
        ],
        columns=["l_orderkey", "l_partkey"],
    )
    part = pd.DataFrame(
        [(101, "Brand#1"), (102, "Brand#2"), (103, "Brand#3")],
        columns=["p_partkey", "p_brand"],
    )
    sf = str(tmp_path)
    spark.createDataFrame(li).coalesce(1).write.parquet(f"{sf}/lineitem.parquet")
    spark.createDataFrame(part).coalesce(1).write.parquet(f"{sf}/part.parquet")

    got = [(r.brand_a, r.brand_b, r.n_orders)
           for r in q_basket_brand_pairs(spark, sf).collect()]
    # (B1,B3) and (B2,B3) appear in only one order each -> filtered
    assert got == [("Brand#1", "Brand#2", 3)]
