#!/usr/bin/env python
"""Bench-methodology timing of NAMED entries (r15 per-change A/B probe).

Same methodology as bench.py's timed loop — premateralized trees, noop
sink, median-of-3 for sub-3 s entries — restricted to the entries a change
touched, so a paired before/after costs seconds instead of a full 4-minute
catalog run. Prints one JSON line; NOT an artifact the driver reads.

Usage: [SPARK_GRAFT_SF_DIR=...] python tools/r15_time_entries.py name ...
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    names = [a for a in sys.argv[1:] if not a.startswith("-")]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    import __spark_entry__ as entry_mod
    import bench

    queries = entry_mod.queries()
    unknown = [n for n in names if n not in queries]
    if unknown:
        raise SystemExit(f"unknown entries: {unknown}")

    spark = bench._fresh_spark(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    bench._premateralize_trees(spark, sf_dir)
    warm = queries["q1_pricing_summary"](spark, sf_dir)
    warm.write.format("noop").mode("overwrite").save()

    out = {}
    for name in names:
        fn = queries[name]
        runs = []
        n_runs = int(os.environ.get("FSQL_TIME_RUNS", "3"))
        for _ in range(n_runs):
            spark.sparkContext.setJobDescription(f"time:{name}")
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            runs.append(round(time.perf_counter() - t0, 4))
            spark.sparkContext.setJobDescription(None)
            # match bench.py's timed loop: caches an entry persists must not
            # carry into its next sample (the bench clears per run, so a
            # cache-reusing second sample here would flatter the change)
            try:
                spark.catalog.clearCache()
            except Exception:
                pass
        out[name] = {
            "med": round(statistics.median(runs), 4),
            "min": round(min(runs), 4),
            "runs": runs,
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
