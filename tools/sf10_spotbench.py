#!/usr/bin/env python
"""Third-decade (sf10-equivalent) spot-bench of the 5 heaviest families.

The sf1 sweep (tools/sf1_spotbench.py) gives two decades of scaling
evidence (sf0.1 -> sf1, 10x data). A term that is O(n log n) — or a
constant that only bites past a working-set cliff — can hide inside one
clean decade, so this tool synthesizes ONE more: a PERF-ONLY 100x corpus
(500k docs / 10M events) built from the sf1 perf corpus by the same
copy+filler construction, and times the heaviest family representatives at
sf1 AND sf10 in one session (paired samples, same JVM).

Filler algebra (why cross-copy near-dup pairs stay suppressed): an sf0.1
doc has ~54 tokens; its sf1 copies append 15 copy-specific `zcopy*` tokens
(J ~ 54/69 ~ 0.78 < 0.8); sf10 copies append 15 MORE `wcopy*` tokens, so
two sf10 copies of the same sf1 doc share 69 of 99 tokens (J ~ 0.70) and
two sf10 copies of the same ORIGINAL across sf1 lineages share 54/114
(J ~ 0.47). The near-dup/containment pair graph therefore scales ~linearly
with copies, like a real crawl, not quadratically through artificial dup
classes.

Families (round-7 verdict list): codecs (JPEG/GIF image, FLAC audio, Y4M
video), winnowing fingerprints (md5 oracle hash AND the xxhash64
production lever — pinning the ~4x claim with numbers), passage
containment, streaming state (stream-stream join + ingest dedup), and the
composed corpus pipeline.

Usage: python tools/sf10_spotbench.py   (one JSON line per entry:
sf1/sf10 wall seconds, result rows at both scales, wall ratio; ratio <= 10
on 10x data = linear-or-better per decade when output scales linearly —
read winnowing/Y4M per OUTPUT row, their row counts are in the line).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sf1_spotbench import SF1, TABLES, SCALED, _write_single_file, build_sf1  # noqa: E402

SF10 = "/tmp/fsql_spark_sf10_perf"

FAMILIES = {
    "codec_image_jpeg": "q_image_decode_jpeg",
    "codec_image_gif": "q_image_decode_gif",
    "codec_audio_flac": "q_audio_decode_flac",
    "codec_video_y4m": "q_video_frame_sample_y4m",
    "winnowing": "q_doc_winnow_fingerprints",
    "containment": "q_containment_pairs",
    "stream_state_join": "q_stream_join",
    "stream_state_dedup": "q_stream_ingest_dedup",
    "corpus_pipeline": "q_corpus_pipeline_v2",
}


def build_sf10(spark) -> None:
    from pyspark.sql import functions as F

    if os.path.exists(f"{SF10}/_READY"):
        return
    build_sf1(spark)
    os.makedirs(SF10, exist_ok=True)
    for t in [t for t in TABLES if t not in SCALED]:
        dst = f"{SF10}/{t}.parquet"
        if not os.path.exists(dst):
            os.symlink(f"{SF1}/{t}.parquet", dst)

    docs = spark.read.parquet(f"{SF1}/documents.parquet")
    copies = []
    for c in range(10):
        filler = " ".join(f"wcopy{c}tok{j}" for j in range(15))
        copies.append(
            docs.select(
                (F.col("doc_id") + c * 100_000_000).alias("doc_id"),
                F.concat(F.col("text"), F.lit(" " + filler)).alias("text"),
                *[col for col in docs.columns if col not in ("doc_id", "text")],
            )
        )
    out = copies[0]
    for d in copies[1:]:
        out = out.unionByName(d)
    _write_single_file(out, f"{SF10}/documents.parquet")

    ev = spark.read.parquet(f"{SF1}/events.parquet")
    ecopies = []
    for c in range(10):
        ecopies.append(
            ev.select(
                (F.col("event_id") + c * 10_000_000_000).alias("event_id"),
                "ts",
                (F.col("user_id") + c * 100_000_000).alias("user_id"),
                *[col for col in ev.columns if col not in ("event_id", "ts", "user_id")],
            )
        )
    eout = ecopies[0]
    for d in ecopies[1:]:
        eout = eout.unionByName(d)
    _write_single_file(eout, f"{SF10}/events.parquet")
    with open(f"{SF10}/_READY", "w") as fd:
        fd.write("ok")


def _timed(spark, fn, sf: str) -> tuple[float, int]:
    # no persist: at sf10 the biggest outputs (78M frame rows) overflow
    # even a large local heap when pinned; the untimed count re-runs the
    # pipeline instead — costs tool wall time, never correctness
    start = time.perf_counter()
    df = fn(spark, sf)
    df.write.format("noop").mode("overwrite").save()
    wall = round(time.perf_counter() - start, 2)
    rows = df.count()
    spark.catalog.clearCache()
    return wall, rows


def main() -> None:
    from fsql_spark.session import get_spark

    import __spark_entry__ as entry_mod

    spark = get_spark(app_name="fsql-sf10-spotbench")
    spark.sparkContext.setLogLevel("ERROR")

    qs = entry_mod.queries()
    build_sf10(spark)
    from bench import _premateralize_trees

    for sf in (SF1, SF10):
        _premateralize_trees(spark, sf)

    # warmup (untimed): codegen, Arrow pool, stream checkpoints at sf1
    for family, name in FAMILIES.items():
        try:
            qs[name](spark, SF1).write.format("noop").mode("overwrite").save()
        except Exception as exc:
            print(f"warmup {name} failed: {exc!r}", file=sys.stderr)
        spark.catalog.clearCache()

    def revive(spark):
        """Restart the session if the JVM died (one entry's OOM must not
        void the rest of the sweep, bench.py's lesson)."""
        try:
            spark.sql("SELECT 1").collect()
            return spark
        except Exception:
            # a DEAD local JVM (uncaught executor OOM -> System.exit) needs
            # the full gateway torn down, not just the session singletons —
            # otherwise get_spark reuses the half-dead SparkContext and every
            # py4j call raises ConnectionRefused (the r8 sweep died here)
            from pyspark import SparkContext
            from pyspark.sql import SparkSession

            # the whole reset touches pyspark PRIVATE internals — wrap it
            # all, so a pyspark upgrade renaming any of them degrades to
            # the plain-singleton reset instead of killing the sweep this
            # code exists to save
            try:
                if SparkContext._gateway is not None:
                    SparkContext._gateway.shutdown()
            except Exception:
                pass
            try:
                with SparkContext._lock:
                    SparkContext._active_spark_context = None
                    SparkContext._gateway = None
                    SparkContext._jvm = None
            except Exception:
                pass
            try:
                SparkSession._instantiatedSession = None
                SparkSession._activeSession = None
            except Exception:
                pass
            fresh = get_spark(app_name="fsql-sf10-spotbench")
            fresh.sparkContext.setLogLevel("ERROR")
            return fresh

    for family, name in FAMILIES.items():
        row = {"family": family, "query": name}
        try:
            for tag, sf in (("sf1", SF1), ("sf10", SF10)):
                row[tag], row[f"rows_{tag}"] = _timed(spark, qs[name], sf)
            row["ratio_10x_data"] = round(row["sf10"] / row["sf1"], 2)
        except Exception as exc:
            row["error"] = repr(exc)
            spark = revive(spark)
        print(json.dumps(row), flush=True)

    # the xxhash64 winnowing lever, same k/w as the catalog entry — pins
    # the "~4x cheaper than md5" claim with paired measurements (verdict
    # item: the claim was prose-only)
    from fsql_spark.operators.text import winnow_fingerprints

    for hash_fn in ("md5", "xxhash64"):
        row = {"family": "winnowing_lever", "query": f"winnow[{hash_fn}]"}
        try:
            for tag, sf in (("sf1", SF1), ("sf10", SF10)):
                def run(spark, sf_dir, _h=hash_fn):
                    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
                    return winnow_fingerprints(docs, k=5, w=4, hash_fn=_h)

                row[tag], row[f"rows_{tag}"] = _timed(spark, run, sf)
            row["ratio_10x_data"] = round(row["sf10"] / row["sf1"], 2)
        except Exception as exc:
            row["error"] = repr(exc)
            spark = revive(spark)
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
