#!/usr/bin/env python
"""Round-12 A/B: spans gram-exchange width — self-sized vs 1.5x (VERDICT
r11 item 3). The r11 decade row read 16.84x wall on ~13.6x chars; the
n*log n expectation for the exchange's sort is ~15x. Hypothesis (a): the
self-sized width (192 MB/partition target) still spills at sf10 and a
wider exchange recovers the log factor. This tool times
q_substring_dup_spans at sf1 and sf10 with the footer-derived width and
with 1.5x that width, warm paired runs in one JVM, noop sink.

Run EXCLUSIVELY (no concurrent Spark/pytest — PERF.md host contract).
Usage: python tools/spans_width_ab_r12.py [out.jsonl]
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sf1_spotbench import SF1, build_sf1  # noqa: E402
from sf10_spotbench import SF10, build_sf10  # noqa: E402


def timed(df) -> float:
    start = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return round(time.perf_counter() - start, 2)


def run(spark, sf: str, width_mult: float) -> tuple[float, int, int]:
    from pyspark.sql import functions as F

    from fsql_spark.operators.spans import (
        _K,
        _gram_exchange_width,
        duplicated_spans,
    )

    docs = spark.read.parquet(f"{sf}/documents.parquet")
    base = docs.select("doc_id", "text").where(F.length("text") >= _K)
    width = _gram_exchange_width(base, "text", _K)
    use = max(1, math.ceil(width * width_mult))
    spans = duplicated_spans(docs, "doc_id", "text", k=_K, gram_partitions=use)
    out = (
        spans.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_spans"),
            F.sum("span_chars").alias("dup_chars"),
        )
    )
    return timed(out), use, width


def main() -> None:
    from fsql_spark.session import get_spark

    out_path = sys.argv[1] if len(sys.argv) > 1 else "SPANS_WIDTH_AB_r12.jsonl"
    spark = get_spark(master="local[32]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    build_sf1(spark)
    build_sf10(spark)

    rows = []
    for sf_name, sf in [("sf1", SF1), ("sf10", SF10)]:
        # warm the scan cache / JIT once per scale
        run(spark, sf, 1.0)
        for mult in (1.0, 1.5):
            wall, used, probe = run(spark, sf, mult)
            rows.append(
                {"scale": sf_name, "width_mult": mult, "wall_s": wall,
                 "partitions_used": used, "probe_width": probe}
            )
            print(json.dumps(rows[-1]), flush=True)

    with open(out_path, "w") as f:
        f.write(json.dumps({
            "_note": "round-12 spans width A/B (VERDICT r11 item 3): "
                     "self-sized vs 1.5x gram-exchange width, warm paired "
                     "runs, one JVM, noop sink, exclusive host."}) + "\n")
        for r in rows:
            f.write(json.dumps(r) + "\n")
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
