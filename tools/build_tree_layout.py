#!/usr/bin/env python
"""Rebuild the flat single-file bench testdata as REALISTIC partition trees.

Every sf0.1 driver table is one small parquet file, so listing, partition
pruning, scan parallelism, and the single-task-kernel trap are all invisible
to the bench (round-7 verdict, "What's missing" #1). This tool rewrites each
table as the layout a production corpus would actually have — Hive-style
partition dirs on existing low-cardinality columns, several files per
partition, ~400 files total — WITHOUT changing any value or column name:

    lineitem.parquet/l_returnflag=A/part-*.parquet        (3 dirs x 24)
    orders.parquet/o_orderpriority=.../part-*.parquet     (5 dirs x 12)
    events.parquet/event_type=.../part-*.parquet          (5 dirs x 8)
    documents.parquet/lang=../source=../part-*.parquet    (~100 dirs x 2)
    customer.parquet/c_mktsegment=.../part-*.parquet      (5 dirs x 2)
    part.parquet/p_brand=.../part-*.parquet               (25 dirs x 1)
    supplier/embeddings: flat multi-file; nation/region: single file

Partition columns are EXISTING table columns (never derived), so the read
schema matches the flat layout — partitioned reads re-add the dir column
with its inferred type, which matches because every partition key here is a
string. Directory names keep the `<table>.parquet` suffix so the catalog's
`{sf}/{t}.parquet` paths work unchanged (Spark reads a directory of that
name transparently; partition discovery kicks in underneath).

Usage:  python tools/build_tree_layout.py [src_sf_dir] [dest_dir]
Default: /root/testdata/sf0.1 -> /root/repo/.benchdata/sf0.1-tree
Then:    SPARK_GRAFT_SF_DIR=/root/repo/.benchdata/sf0.1-tree python bench.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

#: table -> (hive partition columns, pre-write repartition width)
LAYOUT: dict[str, tuple[tuple[str, ...], int]] = {
    "lineitem": (("l_returnflag",), 24),
    "orders": (("o_orderpriority",), 12),
    "events": (("event_type",), 8),
    # lang-only dirs: (lang, source) made 200 x 3KB leaves for a 584KB
    # table — fragmentation far beyond a real corpus (whose files are
    # MB-scale); 5 x 8 keeps the table many-file without modeling a
    # pathology the flat bench would then "lose" to
    "documents": (("lang",), 8),
    "customer": (("c_mktsegment",), 2),
    "part": (("p_brand",), 1),
    "supplier": ((), 4),
    "embeddings": ((), 4),
    "nation": ((), 1),
    "region": ((), 1),
}


def build(spark, src: str, dest: str) -> dict[str, int]:
    """Write the tree layout; returns {table: n_data_files}."""
    from fsql_spark.relational import _t

    counts: dict[str, int] = {}
    for table, (part_cols, width) in LAYOUT.items():
        df = _t(spark, src, table)
        out = f"{dest}/{table}.parquet"
        writer = df.repartition(width).write.mode("overwrite")
        if part_cols:
            writer = writer.partitionBy(*part_cols)
        writer.parquet(out)
        n = sum(
            1
            for root, _dirs, files in os.walk(out)
            for f in files
            if f.endswith(".parquet")
        )
        counts[table] = n
    return counts


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dest = (
        sys.argv[2]
        if len(sys.argv) > 2
        else f"/root/repo/.benchdata/{os.path.basename(src.rstrip('/'))}-tree"
    )
    from fsql_spark.session import get_spark

    spark = get_spark(app_name="fsql-tree-layout", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.perf_counter()
    counts = build(spark, src, dest)
    total = sum(counts.values())
    print(f"tree layout at {dest}: {total} data files in {time.perf_counter() - t0:.1f}s")
    for t, n in sorted(counts.items()):
        print(f"  {t}: {n}")
    spark.stop()


if __name__ == "__main__":
    main()
