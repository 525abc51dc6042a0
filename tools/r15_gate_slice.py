#!/usr/bin/env python
"""Strict driver-twin gate over a SUBSET of catalog entries — the per-change
oracle check of the r15 optimization round (the full-round artifact stays
tools/run_gate.py). Hash-compares each named entry against its DuckDB oracle
via tests/driver_mimic.compare at the given sf.

Usage: python tools/r15_gate_slice.py [--sf /root/testdata/sf0.01] name ...
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")


def main() -> None:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.01"
    if args and args[0] == "--sf":
        sf_dir = args[1]
        args = args[2:]
    names = args

    import __spark_entry__ as entry_mod
    import fsql_spark as fq
    from driver_mimic import compare, duck_connect

    qs = entry_mod.queries()
    unknown = [n for n in names if n not in qs]
    if unknown:
        raise SystemExit(f"unknown entries: {unknown}")

    spark = fq.get_spark(master="local[32]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    con = duck_connect(sf_dir)

    green = 0
    for name in names:
        t0 = time.perf_counter()
        try:
            r = compare(name, spark, sf_dir, con)
        except Exception as exc:
            r = {"name": name, "err": repr(exc)[:300]}
        ok = r.get("hash_match") is True
        green += ok
        print(f"{'GREEN' if ok else 'NOT GREEN'} {name} "
              f"({time.perf_counter() - t0:.1f}s)"
              + ("" if ok else f" {json.dumps(r)}"), flush=True)
        try:
            spark.catalog.clearCache()
        except Exception:
            pass
    print(f"{green}/{len(names)} green at {sf_dir}")
    if green != len(names):
        raise SystemExit(1)


if __name__ == "__main__":
    main()
