#!/usr/bin/env python
"""r15 verdict item 4: decompose the stream family's ~2 s/entry fixed cost.

Attaches a StreamingQueryListener and runs named q_stream_* entries twice
(cold, warm): per micro-batch it dumps Spark's own durationMs breakdown
(addBatch / getBatch / latestOffset / queryPlanning / walCommit /
commitOffsets), plus wall segments around the streaming query (entry call
to first progress, progress to termination, post-stream tail = the batch
side of the entry + the bench's noop write).

Usage: python tools/r15_stream_profile.py q_stream_hourly q_stream_join ...
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry_mod  # noqa: E402


def main() -> None:
    names = [a for a in sys.argv[1:] if not a.startswith("-")]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from fsql_spark.session import get_spark
    from pyspark.sql.streaming import StreamingQueryListener

    spark = get_spark(app_name="r15-stream-profile", master=f"local[{cpus}]",
                      shuffle_partitions=int(cpus) if cpus.isdigit() else 32)
    spark.sparkContext.setLogLevel("ERROR")

    events: list = []

    class L(StreamingQueryListener):
        def onQueryStarted(self, e):
            events.append(("started", time.perf_counter(), str(e.id), None))

        def onQueryProgress(self, e):
            p = e.progress
            events.append(("progress", time.perf_counter(), str(p.id), {
                "batchId": p.batchId,
                "numInputRows": p.numInputRows,
                "durationMs": dict(p.durationMs),
            }))

        def onQueryTerminated(self, e):
            events.append(("terminated", time.perf_counter(), str(e.id), None))

        def onQueryIdle(self, e):
            pass

    spark.streams.addListener(L())

    import bench
    bench._premateralize_trees(spark, sf_dir)

    qs = entry_mod.queries()
    for name in names:
        for run in ("cold", "warm"):
            events.clear()
            t0 = time.perf_counter()
            df = qs[name](spark, sf_dir)
            t_build = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t_end = time.perf_counter()
            try:
                spark.catalog.clearCache()
            except Exception:
                pass
            # allow stragglers of the listener queue to land
            time.sleep(0.3)
            segs = []
            for kind, ts, qid, payload in events:
                segs.append((round(ts - t0, 3), kind,
                             payload if payload else ""))
            print(f"{name} [{run}] wall={t_end - t0:.3f}s "
                  f"(entry={t_build - t0:.3f}s noop={t_end - t_build:.3f}s)")
            for off, kind, payload in segs:
                print(f"    +{off:6.3f} {kind} "
                      f"{json.dumps(payload) if payload else ''}")


if __name__ == "__main__":
    main()
