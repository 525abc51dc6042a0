#!/usr/bin/env python
"""Benchmark harness: run the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS], print ONE JSON
line: {"metric": ..., "value": total_sec, "unit": "sec", "queries": {...},
"sf": ...}.

Execution is measured with the noop sink (full distributed execution, no
driver-side materialization skew)."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from fsql_spark.session import get_spark

    spark = get_spark(
        app_name="fsql-spark-bench",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus) if cpus.isdigit() else 32,
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry_mod

    queries = entry_mod.queries()

    # warmup: JVM/codegen + file footers, not counted
    warm = queries["q1_pricing_summary"](spark, sf_dir)
    warm.write.format("noop").mode("overwrite").save()

    timings: dict[str, float] = {}
    for name in sorted(queries):
        fn = queries[name]
        start = time.perf_counter()
        try:
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
        except Exception as exc:  # a failing query must not hide the rest
            print(f"bench: {name} failed: {exc!r}", file=sys.stderr)
            timings[name] = float("nan")
            try:  # if the JVM died, restart so later queries still run
                spark.sql("SELECT 1").collect()
            except Exception:
                from pyspark.sql import SparkSession

                SparkSession._instantiatedSession = None
                SparkSession._activeSession = None
                spark = get_spark(
                    app_name="fsql-spark-bench",
                    master=f"local[{cpus}]",
                    shuffle_partitions=int(cpus) if cpus.isdigit() else 32,
                )
                spark.sparkContext.setLogLevel("ERROR")
            continue
        timings[name] = round(time.perf_counter() - start, 4)

    total = round(sum(v for v in timings.values() if v == v), 4)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_val: object = float(sf)
    except ValueError:
        sf_val = sf
    print(
        json.dumps(
            {
                "metric": "total_query_wall_time",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf_val,
            }
        )
    )


if __name__ == "__main__":
    main()
