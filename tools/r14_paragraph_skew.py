#!/usr/bin/env python
"""Round-14 planted-skew stress for paragraph_dedup (r13 verdict's one
weak grade): one boilerplate paragraph duplicated across up to 10^6 rows,
window plan vs agg+join-back plan.

The r13 formulation decided duplicates with
``Window.partitionBy(sha2(para))`` — one exchange, but window functions
have NO map-side partial aggregation, so every occurrence of a paragraph
lands in ONE task. The operator's entire purpose is killing boilerplate
("subscribe to our newsletter") that repeats 10^8-10^9x at 100 TB, so the
hottest key is, by construction, the workload. The challenger is two-pass:
``groupBy(sha2(para)).agg(count, min(struct(k,idx)))`` (partial agg
collapses the hot key per mapper) filtered to duplicated hashes, LEFT
JOINed back to the paragraph stream (AQE skew-splits the probe side /
broadcasts a small dup set).

Corpus: 2M docs, each with one doc-unique 15-word paragraph;
``skew_pct`` percent of docs additionally carry the SAME 15-word
boilerplate paragraph (single-space text, so the 15-word chunk boundary
isolates it exactly). skew_pct=50 puts 10^6 occurrences on one sha2 key.
Both plans run end-to-end (chunk -> decide -> rebuild) to a noop sink,
warm JVM; agreement is checked on (n_docs, sum n_paras, sum n_dropped,
sum xxhash64(text)) — full value-level equality of the rebuilt corpus.

Run EXCLUSIVELY (PERF.md host contract).
Usage: python tools/r14_paragraph_skew.py [out.jsonl]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

N_DOCS = 2_000_000

BOILER = " ".join(f"boiler{i}" for i in range(15))


def build_corpus(spark, skew_pct: int, path: str, n_boiler: int = 1):
    """Tagged docs carry ``n_boiler`` copies of THE SAME boilerplate
    paragraph ahead of their unique one — n_boiler scales the hot key's
    absolute occurrence count without growing the doc count (the 100 TB
    regime: the hottest key's single-task size, not its share, is what
    kills a window)."""
    from pyspark.sql import functions as F

    if os.path.exists(f"{path}/_SUCCESS"):
        return
    unique = F.concat_ws(
        " ",
        F.transform(
            F.sequence(F.lit(0), F.lit(14)),
            lambda i: F.concat(
                F.lit("u"), F.col("id").cast("string"), F.lit("w"), i.cast("string")
            ),
        ),
    )
    tagged = (F.col("id") % 100) < skew_pct
    boiler_block = " ".join([BOILER] * n_boiler)
    df = spark.range(0, N_DOCS, 1, 32).select(
        F.col("id").alias("doc_id"),
        F.when(tagged, F.concat_ws(" ", F.lit(boiler_block), unique))
        .otherwise(unique)
        .alias("text"),
    )
    df.write.mode("overwrite").parquet(path)


def run_plan(spark, path: str, plan: str):
    from pyspark.sql import functions as F

    from fsql_spark.operators.dedup import paragraph_dedup

    docs = spark.read.parquet(path)
    t0 = time.perf_counter()
    out = paragraph_dedup(docs, "doc_id", "text", para_words=15, _plan=plan)
    agg = out.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_paras").alias("sum_paras"),
        F.sum("n_dropped").alias("sum_dropped"),
        F.sum(F.xxhash64("doc_id", "text").cast("decimal(38,0)")).alias("text_fp"),
    ).collect()[0]
    wall = round(time.perf_counter() - t0, 2)
    return wall, tuple(agg)


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "PARA_SKEW_STRESS_r14.jsonl"
    from fsql_spark.session import get_spark

    spark = get_spark()
    rows = [
        {
            "_note": (
                "r14 paragraph_dedup planted-skew stress: 2M docs, skew_pct% "
                "carry n_boiler copies of ONE shared boilerplate paragraph "
                "(up to 5e7 occurrences of one sha2 key = 96% of all "
                "paragraph rows); window vs agg+join-back, end-to-end "
                "rebuild, warm, exclusive host."
            )
        }
    ]
    # warmup: JVM + codegen + parquet writer, uncounted
    build_corpus(spark, 1, "/tmp/para_skew_warm")
    run_plan(spark, "/tmp/para_skew_warm", "agg_join")
    # (skew_pct, n_boiler): 0 = uniform overhead baseline; n_boiler=10 at
    # 50% puts 10^7 occurrences (~83% of all paragraph rows) on ONE key —
    # the crawl-boilerplate regime where a single window task must buffer
    # and sort the whole hot key
    for skew_pct, n_boiler in ((0, 0), (1, 1), (10, 1), (50, 1), (50, 10), (50, 50)):
        path = f"/tmp/para_skew_{skew_pct}_{n_boiler}"
        build_corpus(spark, skew_pct, path, n_boiler)
        w_wall, w_agg = run_plan(spark, path, "window")
        j_wall, j_agg = run_plan(spark, path, "agg_join")
        row = {
            "skew_pct_docs": skew_pct,
            "n_boiler": n_boiler,
            "hot_key_occurrences": N_DOCS * skew_pct * n_boiler // 100,
            "window_wall_s": w_wall,
            "joinback_wall_s": j_wall,
            "agree": w_agg == j_agg,
            "n_docs": w_agg[0],
            "sum_dropped": w_agg[2],
        }
        rows.append(row)
        print(json.dumps(row), flush=True)
    with open(out_path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


if __name__ == "__main__":
    main()
