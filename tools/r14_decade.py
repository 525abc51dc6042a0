#!/usr/bin/env python
"""Round-14 decade rows for the six new catalog entries (#204-209):
sf0.1 -> 10x wall ratios against the standard sf1 perf corpus
(tools/sf1_spotbench.build_sf1 — 10 doc copies with copy-specific filler
so dup/contamination graphs scale ~linearly, like a real crawl).

All six are documents-driven, so the stock corpus suffices (no scaled
embeddings needed this round). The q_stream_* entries run genuine
file-source streams against the sf1 documents parquet.

Warm paired runs in one JVM, noop sink. Run EXCLUSIVELY (PERF.md host
contract). Usage: python tools/r14_decade.py [out.jsonl]
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

ENTRIES = [
    "q_paragraph_dedup_newline",
    "q_quality_classifier",
    "q_domain_stats",
    "q_domain_cap",
    "q_stream_contamination",
    "q_stream_quality_classifier",
]


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
    out_path = sys.argv[1] if len(sys.argv) > 1 else "R14_DECADE.jsonl"
    import fsql_spark as fq
    import __spark_entry__ as entry_mod

    spark = fq.get_spark(master="local[32]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    build_sf1(spark)
    qs = entry_mod.queries()

    rows_out = []
    for name in ENTRIES:
        fn = qs[name]
        timed(fn, spark, SF01)  # warm both data + workers
        t_small, r_small = timed(fn, spark, SF01)
        timed(fn, spark, SF1)
        t_big, r_big = timed(fn, spark, SF1)
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
