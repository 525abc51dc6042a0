#!/usr/bin/env python
"""Round-14 mega-group A/B for topk_per_group: plain rank-filtered window
vs a hand-salted two-phase top-k.

Outcome (TOPK_SKEW_STRESS_r14.jsonl): the plain window WINS — Catalyst's
rank-limit pushdown inserts `WindowGroupLimit Partial` BEFORE the
exchange (map-side per-group top-k: the mega-group contributes <= k rows
per mapper), so the naive-looking plan is already skew-proof, and the
salted formulation duplicates that work plus an extra exchange + sort.
The operator therefore ships the plain window (with a plan test pinning
the Partial node); the salted variant lives HERE, inline, for the A/B
record. 20M rows, ONE group holding half (1e7 rows).

Run EXCLUSIVELY (PERF.md host contract).
Usage: python tools/r14_topk_skew.py [out.jsonl]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

N = 20_000_000
K = 20
SALT = 32


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "TOPK_SKEW_STRESS_r14.jsonl"
    import fsql_spark as fq
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from fsql_spark.operators.domains import topk_per_group

    spark = fq.get_spark(master="local[32]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    df = spark.range(0, N, 1, 32).select(
        F.when(F.col("id") % 2 == 0, F.lit("hot"))
        .otherwise(F.concat(F.lit("g"), (F.col("id") % 1000).cast("string")))
        .alias("grp"),
        F.col("id").alias("key"),
    )
    df.write.mode("overwrite").parquet("/tmp/topk_skew")
    data = spark.read.parquet("/tmp/topk_skew")

    def fingerprint(out):
        return tuple(
            out.agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.col("key").cast("decimal(38,0)")).alias("s"),
            ).collect()[0]
        )

    def salted(d):
        # the REJECTED formulation, kept for the A/B record: per-(group,
        # salt) local top-k, then a bounded second window over survivors
        order = [F.col("key").asc()]
        salt = F.pmod(F.xxhash64(F.col("key")), F.lit(SALT))
        w1 = Window.partitionBy(F.col("grp"), salt).orderBy(*order)
        local = (
            d.withColumn("__rn", F.row_number().over(w1))
            .where(F.col("__rn") <= K)
            .drop("__rn")
        )
        w2 = Window.partitionBy("grp").orderBy(*order)
        return (
            local.withColumn("__rn", F.row_number().over(w2))
            .where(F.col("__rn") <= K)
            .drop("__rn")
        )

    def run(build):
        t0 = time.perf_counter()
        agg = fingerprint(build())
        return round(time.perf_counter() - t0, 2), agg

    run(lambda: salted(data))  # warm
    s_wall, s_agg = run(lambda: salted(data))
    run(lambda: topk_per_group(data, "grp", ["key"], K))
    p_wall, p_agg = run(lambda: topk_per_group(data, "grp", ["key"], K))
    row = {
        "_note": (
            "20M rows, group 'hot' holds 1e7 (50%); k=20, salt=32. plain = "
            "shipped operator (WindowGroupLimit pushdown), salted = rejected "
            "hand-rolled two-phase"
        ),
        "salted_wall_s": s_wall,
        "plain_window_wall_s": p_wall,
        "agree": s_agg == p_agg,
        "n_kept": int(s_agg[0]),
    }
    print(json.dumps(row), flush=True)
    with open(out_path, "w") as f:
        f.write(json.dumps(row) + "\n")


if __name__ == "__main__":
    main()
