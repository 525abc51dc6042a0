#!/usr/bin/env python
"""Round-12 second-decade rows (VERDICT r11 item 7): the r11 families have
one measured decade (sf1 -> sf10); this tool adds the sf0.1 -> sf1 point so
they carry the same three-point scale evidence as the older families.

sf0.1 = the driver testdata; sf1 = the copy+filler perf corpus the sf1/sf10
tools build (same construction as the r11 rows, so ratios compose).
Warm paired runs in one JVM, noop sink. Run EXCLUSIVELY (PERF.md host
contract). Usage: python tools/r12_second_decade.py [out.jsonl]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, "/root/repo")

from sf1_spotbench import SF1, build_sf1  # noqa: E402

SF01 = "/root/testdata/sf0.1"

FAMILIES = {
    "dsir": "q_dsir_selection",
    "bpe_apply": "q_bpe_tokenized_lengths",
    "bpe_pack": "q_pack_token_shards",
    "pipeline_v3": "q_corpus_pipeline_v3",
    "hard_negatives": "q_embedding_hard_negatives",
    "image_augment": "q_image_augment",
    "audio_augment": "q_audio_augment",
    "video_augment": "q_video_augment",
    "stream_dsir": "q_stream_dsir_score",
}


def timed(fn, spark, sf: str) -> tuple[float, int]:
    start = time.perf_counter()
    df = fn(spark, sf)
    df.write.format("noop").mode("overwrite").save()
    wall = round(time.perf_counter() - start, 2)
    rows = df.count()
    spark.catalog.clearCache()
    return wall, rows


def main() -> None:
    import __spark_entry__ as entry_mod
    from fsql_spark.session import get_spark

    out_path = sys.argv[1] if len(sys.argv) > 1 else "SF10_SPOTBENCH_r12.jsonl"
    spark = get_spark(master="local[32]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    build_sf1(spark)
    qs = entry_mod.queries()

    rows = []
    for family, name in FAMILIES.items():
        fn = qs[name]
        timed(fn, spark, SF01)  # warm scan/JIT once per family
        w01, r01 = timed(fn, spark, SF01)
        w1, r1 = timed(fn, spark, SF1)
        rows.append({
            "family": family, "query": name,
            "sf0.1": w01, "rows_sf0.1": r01,
            "sf1": w1, "rows_sf1": r1,
            "ratio_10x_data": round(w1 / w01, 2) if w01 else None,
        })
        print(json.dumps(rows[-1]), flush=True)

    mode = "a" if os.path.exists(out_path) else "w"
    with open(out_path, mode) as f:
        if mode == "w":
            f.write(json.dumps({
                "_note": "round-12 second-decade rows (VERDICT r11 item 7): "
                         "sf0.1 (driver testdata) -> sf1 (copy+filler perf "
                         "corpus), warm paired runs, one JVM, noop sink, "
                         "exclusive host."}) + "\n")
        for r in rows:
            f.write(json.dumps(r) + "\n")
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
