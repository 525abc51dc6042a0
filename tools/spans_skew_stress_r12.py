#!/usr/bin/env python
"""Round-12 skew stress: the spans gram exchange under a pathological
boilerplate gram.

The exact-substring window (count over partitionBy(xxhash64(gram), gram))
co-locates EVERY position of a gram in one task. On organic corpora that
is the measured-best plan (r10 A/B: join-back 33.5 s vs 9.6 s at sf1), but
a boilerplate gram occurring in a large fraction of documents — licence
headers, scraped nav chrome — concentrates that fraction of the whole
exploded stream on one task. This tool synthesizes corpora where one
40-char gram carries {1%, 10%, 30%} of all positions and times:

  window     — the production formulation (duplicated_kgram_positions)
  join-back  — groupBy(hash, gram).count() (hash-agg, skew-immune via
               map-side combiners) then joined back to the position stream

at sf1 scale (50k docs). The question is where (if anywhere) the skew
share flips the winner — the number a 100 TB deployment needs next to the
r10 rejection.

Run EXCLUSIVELY. Usage: python tools/spans_skew_stress_r12.py [out.jsonl]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

N_DOCS = 50_000
DOC_WORDS = 80  # ~480 chars/doc -> ~22M grams at k=40
K = 40


def build_corpus(spark, skew_pct: int, path: str):
    """50k docs of doc-unique text; ``skew_pct`` percent of the exploded
    gram stream comes from ONE shared 40-char boilerplate block prepended
    to a fraction of the docs."""
    from pyspark.sql import functions as F

    if os.path.exists(f"{path}/_SUCCESS"):
        return
    # per-doc unique filler: doc_id-salted tokens (no cross-doc dup grams)
    base = spark.range(N_DOCS).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            F.transform(
                F.sequence(F.lit(0), F.lit(DOC_WORDS - 1)),
                lambda i: F.concat(
                    F.lit("w"), F.col("id").cast("string"), F.lit("x"),
                    i.cast("string"),
                ),
            ),
        ).alias("body"),
    )
    # boilerplate: exactly one k-gram repeated per tagged doc would be a
    # single shared 40-char block; to hit the target SHARE of positions we
    # repeat the block so tagged docs contribute proportionally more
    # positions of the SAME gram set. A doc's chars -> positions are ~1:1.
    # share s: tagged docs get extra boilerplate chars such that
    # boiler_chars_total ~ s * total_chars. Tag 10% of docs.
    tagged_frac = 0.10
    body_chars = DOC_WORDS * 9  # rough avg chars/doc
    boiler_unit = "LICENSEHEADERBOILERPLATECHROMEBLOCK0042 "  # 41 chars
    share = skew_pct / 100.0
    # chars of boilerplate per tagged doc so that share holds:
    per_doc = int(share * body_chars / (tagged_frac * (1 - share) or 1e-9))
    reps = max(1, per_doc // len(boiler_unit))
    docs = base.select(
        "doc_id",
        F.when(
            F.col("doc_id") % int(1 / tagged_frac) == 0,
            F.concat(F.lit(boiler_unit * reps), F.col("body")),
        ).otherwise(F.col("body")).alias("text"),
    )
    docs.repartition(32).write.mode("overwrite").parquet(path)


def timed_window(spark, path: str) -> tuple[float, int]:
    from fsql_spark.operators.spans import duplicated_kgram_positions

    docs = spark.read.parquet(path)
    start = time.perf_counter()
    out = duplicated_kgram_positions(docs, "doc_id", "text", k=K)
    out.write.format("noop").mode("overwrite").save()
    wall = round(time.perf_counter() - start, 2)
    return wall, out.count()


def timed_joinback(spark, path: str) -> tuple[float, int]:
    from pyspark.sql import functions as F

    from fsql_spark.operators.dedup import _spread

    docs = spark.read.parquet(path)
    base = docs.select("doc_id", "text").where(F.length("text") >= K)
    grams = (
        _spread(base)
        .select(
            "doc_id",
            F.explode(F.sequence(F.lit(1), F.length("text") - (K - 1))).alias("pos"),
            F.col("text"),
        )
        .select(
            "doc_id", "pos",
            F.expr(f"substring(text, pos, {K})").alias("gram"),
        )
        .withColumn("h", F.xxhash64("gram"))
    )
    start = time.perf_counter()
    counts = (
        grams.groupBy("h", "gram")
        .count()
        .where(F.col("count") >= 2)
        .select(F.col("h").alias("ch"), F.col("gram").alias("cgram"))
    )
    out = grams.join(
        counts.hint("shuffle_hash"),
        (grams["h"] == counts["ch"]) & (grams["gram"] == counts["cgram"]),
    ).select("doc_id", "pos")
    out.write.format("noop").mode("overwrite").save()
    wall = round(time.perf_counter() - start, 2)
    return wall, out.count()


def main() -> None:
    from fsql_spark.session import get_spark

    out_path = sys.argv[1] if len(sys.argv) > 1 else "SPANS_SKEW_STRESS_r12.jsonl"
    spark = get_spark(master="local[32]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    rows = []
    for pct in (1, 10, 30):
        path = f"/tmp/fsql_spark_skew_{pct}pct"
        build_corpus(spark, pct, path)
        timed_window(spark, path)  # warm
        w_wall, w_rows = timed_window(spark, path)
        j_wall, j_rows = timed_joinback(spark, path)
        rows.append({
            "skew_pct_positions": pct,
            "window_wall_s": w_wall, "window_rows": w_rows,
            "joinback_wall_s": j_wall, "joinback_rows": j_rows,
            "rows_agree": w_rows == j_rows,
        })
        print(json.dumps(rows[-1]), flush=True)

    with open(out_path, "w") as f:
        f.write(json.dumps({
            "_note": "round-12 spans skew stress: one boilerplate 40-char "
                     "gram family carrying {1,10,30}% of all positions, "
                     "50k docs, window vs count+join-back, warm, exclusive "
                     "host."}) + "\n")
        for r in rows:
            f.write(json.dumps(r) + "\n")
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
