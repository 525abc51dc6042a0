#!/usr/bin/env python
"""Paired flat-vs-tree layout comparison over the full catalog.

Two naive back-to-back bench runs confound layout cost with session
history (JVM warmup, GC pressure, code-cache state): the same entry can
swing 2x run-over-run at sub-second scale. This tool removes that
confound: ONE session, and for every catalog entry it alternates
flat/tree executions (3 each, interleaved) and reports per-layout
MEDIANS — a paired experiment in which session drift hits both layouts
equally.

Usage: python tools/layout_compare.py [flat_dir] [tree_dir]
 (defaults: /root/testdata/sf0.1 and /root/repo/.benchdata/sf0.1-tree;
  build the tree first with tools/build_tree_layout.py)
Prints one JSON line per entry: {"query", "flat", "tree", "ratio"} and a
final summary line with the geomean ratio and the >1.5x list.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    flat = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    tree = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/.benchdata/sf0.1-tree"
    from bench import _fresh_spark, _premateralize_trees

    import __spark_entry__ as entry_mod

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = _fresh_spark(cpus)
    qs = entry_mod.queries()
    for sf in (flat, tree):
        _premateralize_trees(spark, sf)

    # warmup both layouts (untimed): codegen + Arrow pool + first-use I/O
    for sf in (flat, tree):
        qs["q1_pricing_summary"](spark, sf).write.format("noop").mode("overwrite").save()

    results = []
    for name in sorted(qs):
        fn = qs[name]
        samples: dict[str, list[float]] = {"flat": [], "tree": []}
        try:
            for _round in range(3):
                for tag, sf in (("flat", flat), ("tree", tree)):
                    start = time.perf_counter()
                    fn(spark, sf).write.format("noop").mode("overwrite").save()
                    samples[tag].append(time.perf_counter() - start)
                    spark.catalog.clearCache()
        except Exception as exc:
            print(json.dumps({"query": name, "error": repr(exc)}), flush=True)
            continue
        med = {t: sorted(v)[1] for t, v in samples.items()}
        row = {
            "query": name,
            "flat": round(med["flat"], 3),
            "tree": round(med["tree"], 3),
            "ratio": round(med["tree"] / med["flat"], 3),
        }
        results.append(row)
        print(json.dumps(row), flush=True)

    geo = math.exp(sum(math.log(r["ratio"]) for r in results) / len(results))
    worse = sorted(
        (r for r in results if r["ratio"] > 1.5), key=lambda r: -r["ratio"]
    )
    better = sorted(
        (r for r in results if r["ratio"] < 1 / 1.5), key=lambda r: r["ratio"]
    )
    print(
        json.dumps(
            {
                "summary": "flat_vs_tree",
                "n": len(results),
                "geomean_ratio": round(geo, 3),
                "total_flat": round(sum(r["flat"] for r in results), 1),
                "total_tree": round(sum(r["tree"] for r in results), 1),
                "worse_1_5x": worse,
                "better_1_5x": better,
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
