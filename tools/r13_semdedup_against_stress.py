#!/usr/bin/env python
"""Round-13 volume stress for semantic_dedup_against (the incremental
SemDeDup face): a 200k-vector KEPT corpus vs a 20k-vector NEW batch with
10% planted exact clones — the r12 batch-SemDeDup 210k stress, incremental
edition. Asserts exact clone semantics (every planted clone dropped, every
genuinely-novel row kept) and prints the wall.

Corpus construction mirrors tools/r13_decade.py: base vectors are random
normal (cross cosines ~0 at dim 64, far below any sane threshold), so the
only >=0.95 pairs are the planted clones — the assertion is exact, not
statistical. Run EXCLUSIVELY. Usage: python tools/r13_semdedup_against_stress.py
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main() -> None:
    import fsql_spark as fq
    from fsql_spark.operators.similarity import semantic_dedup_against

    spark = fq.get_spark(master="local[32]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    rng = np.random.default_rng(42)
    dim, n_kept, n_new, n_clones, n_cent = 64, 200_000, 20_000, 2_000, 64
    kept_m = rng.standard_normal((n_kept, dim)).astype(np.float64)
    new_m = rng.standard_normal((n_new, dim)).astype(np.float64)
    clone_src = rng.choice(n_kept, size=n_clones, replace=False)
    new_m[:n_clones] = kept_m[clone_src]
    cents = kept_m[rng.choice(n_kept, size=n_cent, replace=False)].copy()

    import pandas as pd

    kept_df = spark.createDataFrame(
        pd.DataFrame({"vec_id": range(n_kept), "embedding": list(map(list, kept_m))})
    ).repartition(32).persist()
    new_df = spark.createDataFrame(
        pd.DataFrame({"vec_id": range(n_new), "embedding": list(map(list, new_m))})
    ).persist()
    kept_df.count(), new_df.count()  # materialize outside the timed region

    t0 = time.perf_counter()
    out = semantic_dedup_against(
        new_df, kept_df, "vec_id", "embedding", centroids=cents, threshold=0.95
    ).collect()
    wall = time.perf_counter() - t0

    flags = {r["vec_id"]: r["kept"] for r in out}
    clones = [j for j in range(n_clones)]
    dropped_clones = sum(1 for j in clones if flags[j] == 0)
    kept_novel = sum(1 for j in range(n_clones, n_new) if flags[j] == 1)
    row = {
        "kept_corpus": n_kept,
        "new_batch": n_new,
        "n_centroids": n_cent,
        "planted_clones": n_clones,
        "dropped_clones": dropped_clones,
        "novel_kept": kept_novel,
        "novel_total": n_new - n_clones,
        "wall_sec": round(wall, 1),
    }
    print(json.dumps(row))
    assert dropped_clones == n_clones, row
    assert kept_novel == n_new - n_clones, row


if __name__ == "__main__":
    main()
