"""Table maintenance: small-file compaction and layout stats.

The operational reality of 100 TB file-system tables: streaming sinks and
frequent small appends produce millions of tiny files, and scan throughput
collapses under per-file open/footer overhead. ``compact`` rewrites a
partitioned tree with right-sized files; ``file_stats`` measures the layout
so compaction can be triggered by policy (e.g. median file < 16 MB).
"""

from __future__ import annotations

import os
from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .fs import FileSystem, get_url_and_fs


def file_stats(spark: SparkSession, url: str, fs: Optional[FileSystem] = None) -> DataFrame:
    """Per-partition-directory file counts and byte sizes for a parquet tree.

    Driver-side metadata walk (O(#files) stat calls, no data I/O) — the same
    cost class as partition discovery."""
    path, fs = get_url_and_fs(url, fs)
    rows = []
    for dirpath, _dirnames, filenames in os.walk(path):
        data_files = [f for f in filenames if not f.startswith(("_", "."))]
        if not data_files:
            continue
        sizes = [os.path.getsize(os.path.join(dirpath, f)) for f in data_files]
        rel = os.path.relpath(dirpath, path)
        rows.append((rel if rel != "." else "", len(sizes), sum(sizes), min(sizes), max(sizes)))
    return spark.createDataFrame(
        rows, ["partition", "n_files", "total_bytes", "min_bytes", "max_bytes"]
    )


def compact(
    spark: SparkSession,
    url: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    partition_by: Optional[list[str]] = None,
    fs: Optional[FileSystem] = None,
) -> None:
    """Rewrite the tree with ~target-sized files.

    Reads the whole table, repartitions to ceil(total_bytes / target) tasks
    (per partition-key when ``partition_by`` is given, so each Hive partition
    compacts independently), and atomically swaps directories. At cluster
    scale run per-partition-subset to bound the rewrite working set."""
    import math
    import shutil
    import tempfile

    path, fs = get_url_and_fs(url, fs)
    stats = file_stats(spark, path, fs).agg(F.sum("total_bytes")).collect()[0][0] or 0
    n_out = max(1, math.ceil(stats / target_file_bytes))

    spark.conf.set("spark.sql.sources.partitionColumnTypeInference.enabled", "false")
    df = spark.read.parquet(fs.spark_url(path))
    staging = tempfile.mkdtemp(prefix="fsql_compact_", dir=os.path.dirname(os.path.abspath(path)))
    writer = df.repartition(n_out, *partition_by) if partition_by else df.repartition(n_out)
    out = writer.write.mode("overwrite")
    if partition_by:
        out = out.partitionBy(*partition_by)
    out.parquet(fs.spark_url(staging))

    backup = path.rstrip("/") + ".compact_backup"
    shutil.rmtree(backup, ignore_errors=True)
    os.rename(path.rstrip("/"), backup)
    os.rename(staging, path.rstrip("/"))
    shutil.rmtree(backup, ignore_errors=True)
