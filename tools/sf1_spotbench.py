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


def main() -> None:
    from fsql_spark.session import get_spark

    import __spark_entry__ as entry_mod

    spark = get_spark(app_name="fsql-sf1-spotbench")
    spark.sparkContext.setLogLevel("ERROR")
    build_sf1(spark)

    qs = entry_mod.queries()
    # prematerialize signature caches at both scales (untimed, like bench.py)
    from fsql_spark.operators.dedup import corpus_signatures_cached

    for sf in (SF01, SF1):
        corpus_signatures_cached(spark, sf, num_hashes=64, ngram=3)

    # warmup pass (untimed): JVM codegen, Arrow worker pool, stream
    # checkpoint machinery — so the timed ratios compare data volumes, not
    # first-use environment setup
    for name in HEAVIEST:
        qs[name](spark, SF01).write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()

    for name in HEAVIEST:
        row = {"query": name}
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
        print(json.dumps(row))


if __name__ == "__main__":
    main()
