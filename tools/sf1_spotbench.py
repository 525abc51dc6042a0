#!/usr/bin/env python
"""One-off sf1-equivalent spot-bench of the heaviest catalog entries.

The driver ships testdata up to sf0.1 (5k docs / 676k events); this tool
extends the PERF.md sub-linearity table one more decade by synthesizing a
PERF-ONLY 10x dataset under /tmp (never used for correctness):

- documents_sf1: 10 copies of the sf0.1 corpus, doc_id offset per copy, and
  ~15 copy-specific filler tokens appended per doc so cross-copy Jaccard
  falls below every entry threshold (54-token docs -> J ~ 54/69 ~ 0.78 <
  0.8): the near-dup pair graph scales LINEARLY (x10), like a real corpus,
  instead of quadratically through artificial 10-way dup classes.
- events_sf1: 10 copies with user_id offset per copy (timestamps kept), so
  per-user joins/sessions scale linearly in users.

Caveats (read the ratios with the row counts):
- At the clusters entry's J>=0.95 threshold the filler suppresses most
  within-copy near-dup pairs too (boundary 3-grams shift), leaving ~exact
  dups — the sf1 pair graph is CONSERVATIVE (smaller than ideal x10).
- SimHash sees THROUGH the filler (frequency-majority is robust to a 15/69
  token suffix), so copies of the same doc are genuinely within Hamming 3
  of each other: the qualifying-pair OUTPUT grows ~x120, and wall time must
  be judged per output pair, not per input row. That is the workload, not
  the plan.

Usage: python tools/sf1_spotbench.py  (prints one JSON line per entry:
sf0.1/sf1 times, result rows at both scales, wall ratio; ratio <= 10 on 10x
data = sub-linear-or-linear per decade for output that scales ~linearly).

``--all`` sweeps the ENTIRE catalog instead of the heavy list (one isolated
full run per round closes the scaling story uniformly); ``--collapse-demo``
builds a SECOND perf corpus of 10 EXACT copies per doc (no filler — real
copy-classes, the web-boilerplate shape) and measures simhash_pairs with
and without collapse_exact: the plain output is quadratic in class size
(45 within-class pairs per 10-copy doc), the collapsed output tracks
distinct contents.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF01 = "/root/testdata/sf0.1"
SF1 = "/tmp/fsql_spark_sf1_perf"

HEAVIEST = [
    "q_dedup_clusters",
    "q_minhash_near_dups",
    "q_minhash_incremental",
    "q_simhash_near_dups",
    "q_stream_join",
    # round-5 additions: window-explosion, inverted-index join, bloom
    # build+filter, composed pipeline — the new ops with data-volume risk.
    # Passage-dup OUTPUT scales like the dup graph (10 copies share their
    # original's windows: the filler shifts only boundary windows), so read
    # those ratios per output row like simhash.
    "q_duplicated_passages",
    "q_passage_dup_fraction",
    "q_containment_pairs",
    "q_dedup_incremental_bloom",
    "q_corpus_pipeline",
    # round-5 continuation: the corpus-scale two-pass LM (tokenize -> model
    # -> broadcast rescore), the map-only quality filter, and the anomaly
    # scan (stats broadcast back over 10x events).
    "q_doc_perplexity",
    "q_quality_filter",
    "q_events_anomaly",
    # third-session additions: composed quality-gated build (two corpus
    # passes, one tokenization), sampled-tercile bucketing, representative
    # selection over the cached pair graph, compressed-json scan.
    "q_corpus_pipeline_v2",
    "q_perplexity_buckets",
    "q_dedup_representatives",
    "q_fsql_jsongz_scan",
    # binary container pipelines: synth + parse kernels over 10x payloads
    "q_multimodal_frame_sample",
    "q_multimodal_audio_energy",
]

# entries touch these tables; everything else symlinks to sf0.1 so the same
# sf-dir contract works unmodified
SCALED = {"documents", "events"}
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _write_single_file(df, dst: str) -> None:
    """Write a DataFrame as ONE parquet FILE at ``dst`` — the testdata
    layout (each table is a single file, not a directory), which the
    streaming source's symlink staging and the sf-dir contract expect."""
    import glob
    import shutil

    staging = dst + ".staging"
    df.coalesce(1).write.mode("overwrite").parquet(staging)
    part = glob.glob(f"{staging}/part-*.parquet")[0]
    shutil.move(part, dst)
    shutil.rmtree(staging, ignore_errors=True)


def build_sf1(spark) -> None:
    from pyspark.sql import functions as F

    if os.path.exists(f"{SF1}/_READY"):
        return
    os.makedirs(SF1, exist_ok=True)
    for t in [t for t in TABLES if t not in SCALED]:
        dst = f"{SF1}/{t}.parquet"
        if not os.path.exists(dst):
            os.symlink(f"{SF01}/{t}.parquet", dst)

    docs = spark.read.parquet(f"{SF01}/documents.parquet")
    copies = []
    for c in range(10):
        filler = " ".join(f"zcopy{c}tok{j}" for j in range(15))
        copies.append(
            docs.select(
                (F.col("doc_id") + c * 1_000_000).alias("doc_id"),
                F.concat(F.col("text"), F.lit(" " + filler)).alias("text"),
                *[col for col in docs.columns if col not in ("doc_id", "text")],
            )
        )
    out = copies[0]
    for d in copies[1:]:
        out = out.unionByName(d)
    _write_single_file(out, f"{SF1}/documents.parquet")

    ev = spark.read.parquet(f"{SF01}/events.parquet")
    ecopies = []
    for c in range(10):
        ecopies.append(
            ev.select(
                (F.col("event_id") + c * 100_000_000).alias("event_id"),
                "ts",
                (F.col("user_id") + c * 1_000_000).alias("user_id"),
                *[col for col in ev.columns if col not in ("event_id", "ts", "user_id")],
            )
        )
    eout = ecopies[0]
    for d in ecopies[1:]:
        eout = eout.unionByName(d)
    _write_single_file(eout, f"{SF1}/events.parquet")
    with open(f"{SF1}/_READY", "w") as fd:
        fd.write("ok")


SF1_DUP = "/tmp/fsql_spark_sf1_dup"


def build_sf1_dup(spark) -> None:
    """10 EXACT copies of every sf0.1 doc (doc_id offset, text unchanged):
    the copy-class corpus the collapse_exact lever targets. Never used for
    correctness."""
    from pyspark.sql import functions as F

    dst = f"{SF1_DUP}/documents.parquet"
    if os.path.exists(dst):
        return
    os.makedirs(SF1_DUP, exist_ok=True)
    docs = spark.read.parquet(f"{SF01}/documents.parquet")
    out = docs.select((F.col("doc_id")).alias("doc_id"), "text")
    for c in range(1, 10):
        out = out.unionByName(
            docs.select((F.col("doc_id") + c * 1_000_000).alias("doc_id"), "text")
        )
    _write_single_file(out, dst)


def collapse_demo(spark) -> None:
    """simhash_pairs on a real copy-class corpus, with and without the
    collapse lever. Expected shape: plain emits >= 45 within-class pairs
    per 10-copy doc (quadratic in class size); collapsed emits only
    representative pairs (the sf0.1 near-dup graph)."""
    from fsql_spark.operators.dedup import simhash_pairs

    build_sf1_dup(spark)
    docs = spark.read.parquet(f"{SF1_DUP}/documents.parquet")
    # warmup (untimed): signature kernel JIT + Arrow pool on this corpus
    simhash_pairs(docs.limit(500), "doc_id", "text", 3).write.format("noop").mode(
        "overwrite"
    ).save()
    spark.catalog.clearCache()
    row = {"query": "simhash_collapse_demo", "corpus": "10 exact copies of sf0.1 docs"}
    for tag, collapse in (("plain", False), ("collapsed", True)):
        start = time.perf_counter()
        df = simhash_pairs(docs, "doc_id", "text", 3, collapse_exact=collapse).persist()
        df.write.format("noop").mode("overwrite").save()
        row[tag] = round(time.perf_counter() - start, 2)
        row[f"pairs_{tag}"] = df.count()
        df.unpersist()
        spark.catalog.clearCache()
    row["wall_drop"] = round(row["plain"] / row["collapsed"], 2)
    row["pair_drop"] = round(row["pairs_plain"] / max(row["pairs_collapsed"], 1), 2)
    print(json.dumps(row))


def main() -> None:
    from fsql_spark.session import get_spark

    import __spark_entry__ as entry_mod

    spark = get_spark(app_name="fsql-sf1-spotbench")
    spark.sparkContext.setLogLevel("ERROR")

    if "--collapse-demo" in sys.argv:
        collapse_demo(spark)
        return

    qs = entry_mod.queries()
    if "--queries" in sys.argv:  # explicit subset: --queries a,b,c
        idx = sys.argv.index("--queries") + 1
        if idx >= len(sys.argv):
            sys.exit("usage: sf1_spotbench.py --queries name1,name2,...")
        names = sys.argv[idx].split(",")
        unknown = [n for n in names if n not in qs]
        if unknown:  # fail fast BEFORE the expensive sf1 build
            sys.exit(f"unknown catalog entries: {unknown}")
    elif "--all" in sys.argv:
        names = sorted(qs)
    else:
        names = HEAVIEST

    build_sf1(spark)
    # prematerialize trees + caches at both scales (untimed, like bench.py)
    from bench import _premateralize_trees

    for sf in (SF01, SF1):
        _premateralize_trees(spark, sf)

    # warmup pass (untimed): JVM codegen, Arrow worker pool, stream
    # checkpoint machinery — so the timed ratios compare data volumes, not
    # first-use environment setup
    for name in names:
        try:
            qs[name](spark, SF01).write.format("noop").mode("overwrite").save()
        except Exception as exc:
            print(f"warmup {name} failed: {exc!r}", file=sys.stderr)
        spark.catalog.clearCache()

    for name in names:
        row = {"query": name}
        try:
            for tag, sf in (("sf0.1", SF01), ("sf1", SF1)):
                start = time.perf_counter()
                # persist so the untimed row-count audit reads the cached
                # result instead of re-running the whole pipeline (~2x wall)
                df = qs[name](spark, sf).persist()
                df.write.format("noop").mode("overwrite").save()
                row[tag] = round(time.perf_counter() - start, 2)
                row[f"rows_{tag}"] = df.count()
                df.unpersist()
                spark.catalog.clearCache()
            row["ratio_10x_data"] = round(row["sf1"] / row["sf0.1"], 2)
        except Exception as exc:
            row["error"] = repr(exc)
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
