#!/usr/bin/env python
"""Round-13 decade rows for the three new catalog entries (VERDICT r12
tasks 2 & 7): sf0.1 -> 10x wall ratios.

- q_paragraph_dedup / q_contamination_fraction run against the standard
  sf1 perf corpus (tools/sf1_spotbench.build_sf1: 10 doc copies with
  copy-specific filler so the dup/contamination graphs scale ~linearly,
  like a real crawl).
- q_semantic_dedup_incremental needs a SCALED embeddings table (the sf1
  corpus symlinks embeddings, so the old sweep's "sf1" row measured the
  SAME 2000 vectors). Built here: 10 copies, vec_id offset by 10M per
  copy so clone ids (vec_id+100000) stay
  disjoint from later copies, each copy CIRCULARLY SHIFTED by its copy
  index — a random 64-dim vector and its shift are ~orthogonal, so
  cross-copy cosines stay far below threshold and the near-dup graph
  scales linearly (the build_sf1 filler trick, embedding-space edition).

Warm paired runs in one JVM, noop sink. Run EXCLUSIVELY (PERF.md host
contract). Usage: python tools/r13_decade.py [out.jsonl]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

from sf1_spotbench import SF1, build_sf1  # noqa: E402

SF01 = "/root/testdata/sf0.1"
EMB10 = "/tmp/fsql_spark_sf1_emb"


def build_emb10(spark) -> None:
    from pyspark.sql import functions as F

    dst = f"{EMB10}/embeddings.parquet"
    if os.path.exists(dst):
        return
    os.makedirs(EMB10, exist_ok=True)
    emb = spark.read.parquet(f"{SF01}/embeddings.parquet")
    dim = len(emb.select("embedding").first()["embedding"])
    copies = []
    for c in range(10):
        shifted = F.transform(
            F.sequence(F.lit(1), F.lit(dim)),
            lambda i: F.element_at("embedding", ((i - 1 + F.lit(c)) % dim) + 1),
        )
        copies.append(
            emb.select(
                (F.col("vec_id") + c * 10_000_000).alias("vec_id"),
                shifted.cast("array<float>").alias("embedding"),
                "label",
            )
        )
    out = copies[0]
    for d in copies[1:]:
        out = out.unionByName(d)
    out.coalesce(1).write.mode("overwrite").parquet(dst)


def timed(fn, spark, sf: str) -> tuple[float, int]:
    start = time.perf_counter()
    df = fn(spark, sf)
    df.write.format("noop").mode("overwrite").save()
    wall = time.perf_counter() - start
    rows = df.count()
    try:
        spark.catalog.clearCache()
    except Exception:
        pass
    return wall, rows


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "R13_DECADE.jsonl"
    import fsql_spark as fq
    import __spark_entry__ as entry_mod

    spark = fq.get_spark(master="local[32]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    build_sf1(spark)
    build_emb10(spark)
    qs = entry_mod.queries()

    rows_out = []
    cases = [
        ("q_paragraph_dedup", SF1),
        ("q_contamination_fraction", SF1),
        ("q_semantic_dedup_incremental", EMB10),
    ]
    for name, big in cases:
        fn = qs[name]
        timed(fn, spark, SF01)  # warm both data + workers
        t_small, r_small = timed(fn, spark, SF01)
        timed(fn, spark, big)
        t_big, r_big = timed(fn, spark, big)
        row = {
            "query": name,
            "sf0.1": round(t_small, 2),
            "rows_sf0.1": r_small,
            "10x": round(t_big, 2),
            "rows_10x": r_big,
            "ratio_10x_data": round(t_big / t_small, 2),
        }
        rows_out.append(row)
        print(json.dumps(row), flush=True)
    with open(out_path, "w") as f:
        for row in rows_out:
            f.write(json.dumps(row) + "\n")


if __name__ == "__main__":
    main()
