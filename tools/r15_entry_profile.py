#!/usr/bin/env python
"""Round-14 optimization: per-entry Spark job breakdown.

For each named entry: warm-run once (fixture trees/caches built), then a
timed run bracketed by job-id markers; afterwards pull the driver UI REST
API (/api/v1) for every job in the bracket and report name/duration/stage
breakdown. This answers "where do the seconds of q_X actually go" — eager
build-time probes (separate jobs), broadcast builds, AQE stage waves, the
final noop action — which .explain alone cannot.

Usage: python tools/r15_entry_profile.py q_graph_pagerank q_label_propagation
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod  # noqa: E402


def rest(base: str, path: str):
    with urllib.request.urlopen(base + path, timeout=30) as r:
        return json.loads(r.read())


def main() -> None:
    names = [a for a in sys.argv[1:] if not a.startswith("-")]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from fsql_spark.session import get_spark

    spark = get_spark(app_name="r15-entry-profile", master=f"local[{cpus}]",
                      shuffle_partitions=int(cpus) if cpus.isdigit() else 32)
    spark.sparkContext.setLogLevel("ERROR")

    import bench

    bench._premateralize_trees(spark, sf_dir)

    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    base = f"{ui}/api/v1/applications/{app_id}"

    qs = entry_mod.queries()
    out_path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                            "plans", "r15", "_entry_profile.jsonl")
    with open(out_path, "a") as out:
        for name in names:
            fn = qs[name]
            # warm run (builds caches the bench prematerializes; also JIT)
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            warm = time.perf_counter() - t0
            spark.catalog.clearCache()

            jobs_before = {j["jobId"] for j in rest(base, "/jobs")}
            spark.sparkContext.setJobDescription(f"profile:{name}")
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            t_build = time.perf_counter() - t0
            df.write.format("noop").mode("overwrite").save()
            t_total = time.perf_counter() - t0
            spark.sparkContext.setJobDescription(None)
            spark.catalog.clearCache()

            jobs = [j for j in rest(base, "/jobs") if j["jobId"] not in jobs_before]
            jobs.sort(key=lambda j: j["jobId"])
            job_rows = []
            for j in jobs:
                sub = j.get("submissionTime"); comp = j.get("completionTime")
                dur = None
                if sub and comp:
                    from datetime import datetime
                    fmt = "%Y-%m-%dT%H:%M:%S.%f%Z"
                    try:
                        dur = (datetime.strptime(comp.replace("GMT", ""), "%Y-%m-%dT%H:%M:%S.%f")
                               - datetime.strptime(sub.replace("GMT", ""), "%Y-%m-%dT%H:%M:%S.%f")).total_seconds()
                    except ValueError:
                        dur = None
                job_rows.append({
                    "jobId": j["jobId"],
                    "dur_sec": dur,
                    "stages": j.get("numCompletedStages"),
                    "tasks": j.get("numCompletedTasks"),
                    "desc": (j.get("description") or j.get("name") or "")[:140],
                })
            row = {"name": name, "warm_first_sec": round(warm, 3),
                   "build_sec": round(t_build, 3), "timed_sec": round(t_total, 3),
                   "n_jobs": len(jobs), "jobs": job_rows}
            out.write(json.dumps(row) + "\n")
            out.flush()
            gaps = round(t_total - sum(j["dur_sec"] or 0 for j in job_rows), 3)
            print(f"{name}: timed={t_total:.2f}s build(lazy)={t_build:.2f}s "
                  f"jobs={len(jobs)} job_time={sum(j['dur_sec'] or 0 for j in job_rows):.2f}s "
                  f"driver_gap={gaps}s")
            for j in job_rows:
                print(f"    job {j['jobId']:>4} {j['dur_sec'] if j['dur_sec'] is not None else '?':>6}s "
                      f"stages={j['stages']} tasks={j['tasks']} {j['desc'][:90]}")


if __name__ == "__main__":
    main()
