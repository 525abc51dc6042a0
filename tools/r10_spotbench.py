#!/usr/bin/env python
"""Third-decade spot-bench for the round-10 NEW families: exact-substring
duplicate spans, source JSD, and perceptual-hash image dedup — the same
paired sf1/sf10 protocol as tools/sf10_spotbench.py (one JVM, warm runs,
noop sink), against the cached perf corpora under /tmp.

Corpus note for the spans family: the sf1/sf10 perf corpora are built by
COPYING docs with per-copy filler suffixes (see sf10_spotbench.py's filler
algebra), so every copied document is ~fully exact-duplicated by
construction — the worst-case load for ExactSubstr (every k-gram flagged,
maximal spans cover whole docs). That's the right stress: the gram
exchange and the island merge both carry their maximum possible row count.

Usage: python tools/r10_spotbench.py   (one JSON line per family)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sf1_spotbench import SF1  # noqa: E402
from sf10_spotbench import SF10, build_sf10  # noqa: E402

FAMILIES = {
    "substring_spans": "q_substring_dup_spans",
    "source_jsd": "q_source_js_divergence",
    "image_phash": "q_image_phash_dups",
}


def _timed(spark, fn, sf: str) -> tuple[float, int]:
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

    spark = get_spark(app_name="fsql-r10-spotbench")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry_mod.queries()
    build_sf10(spark)

    # warmup (untimed): codegen + Arrow pool at sf1
    for name in FAMILIES.values():
        try:
            qs[name](spark, SF1).write.format("noop").mode("overwrite").save()
        except Exception as exc:
            print(f"warmup {name} failed: {exc!r}", file=sys.stderr)
        spark.catalog.clearCache()

    for family, name in FAMILIES.items():
        row = {"family": family, "query": name}
        try:
            for tag, sf in (("sf1", SF1), ("sf10", SF10)):
                row[tag], row[f"rows_{tag}"] = _timed(spark, qs[name], sf)
            row["ratio_10x_data"] = round(row["sf10"] / row["sf1"], 2)
            row["row_ratio"] = round(row["rows_sf10"] / max(row["rows_sf1"], 1), 2)
        except Exception as exc:
            row["error"] = repr(exc)
        print(json.dumps(row), flush=True)




# ---------------------------------------------------------------------------
# SemDeDup decade evidence (invoked as: python r10_spotbench.py semdedup)
#
# The perf corpora don't scale embeddings, so this builds its own: copy c of
# the sf0.1 table gets vec_id + c*1_000_000 and a CYCLIC SHIFT of the
# embedding by c positions — shifted copies of a random-ish vector are NOT
# near-dups (measured max cross-copy cosine << 0.95), so the near-dup pair
# structure stays ~linear in copies like a real crawl, and the knob the
# paper prescribes (n_centroids grows with the corpus, bounding cluster
# sizes) is applied exactly as the operator docstring directs.
# ---------------------------------------------------------------------------


def semdedup_decades() -> None:
    import time

    from pyspark.sql import functions as F

    from fsql_spark.operators.similarity import semantic_dedup
    from fsql_spark.session import get_spark

    spark = get_spark(app_name="fsql-r10-semdedup")
    spark.sparkContext.setLogLevel("ERROR")
    base = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet").select(
        "vec_id", "embedding"
    )

    def scaled(n_copies: int):
        parts = []
        for c in range(n_copies):
            parts.append(
                base.select(
                    (F.col("vec_id") + c * 1_000_000).alias("vec_id"),
                    F.expr(
                        f"transform(sequence(0, 63), i -> embedding[(i + {c}) % 64])"
                    ).alias("embedding"),
                )
            )
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    for n_copies, n_centroids in ((1, 16), (10, 160), (100, 1600)):
        # materialize the scaled corpus like the other perf tables (also
        # sidesteps a Catalyst attribute-resolution error when the
        # 100-branch union+transform lineage feeds the assigner UDF)
        dst = f"/tmp/fsql_spark_semdedup_{n_copies}x.parquet"
        if not os.path.exists(dst):
            scaled(n_copies).write.mode("overwrite").parquet(dst)
        corpus = spark.read.parquet(dst)
        corpus.write.format("noop").mode("overwrite").save()  # warm
        start = time.perf_counter()
        out = semantic_dedup(
            corpus, "vec_id", "embedding", n_centroids=n_centroids,
            threshold=0.95, seed=42,
        )
        out.write.format("noop").mode("overwrite").save()
        wall = round(time.perf_counter() - start, 2)
        rows = out.count()
        dropped = out.where("kept = 0").count()
        print(
            json.dumps(
                {
                    "family": "semantic_dedup",
                    "scale": f"{n_copies}x",
                    "n_vectors": rows,
                    "n_centroids": n_centroids,
                    "wall_s": wall,
                    "dropped": dropped,
                }
            ),
            flush=True,
        )
        spark.catalog.clearCache()


# ---------------------------------------------------------------------------
# Graph-family decade evidence (invoked as: python r10_spotbench.py graph)
#
# PageRank: the sf0.1 order graph (~1.1M symmetric edges) replicated with
# disjoint key offsets — 100 disjoint copies model a crawl of many hosts;
# PageRank's per-round cost is edges-linear regardless of connectivity, so
# disjoint replication is the honest load. Label propagation: the semdedup
# cyclic-shift embedding corpora with label = vec_id % 10 and the IVF
# n_centroids knob applied per decade exactly as the operator directs
# (bounding in-cluster quadratic work).
# ---------------------------------------------------------------------------


def graph_decades() -> None:
    import time

    from pyspark.sql import functions as F

    from fsql_spark.operators.graph import (
        order_graph_edges,
        pagerank,
        pagerank_graph_tables,
    )
    from fsql_spark.operators.labelprop import knn_graph, propagate_labels
    from fsql_spark.session import get_spark, temp_conf

    spark = get_spark(app_name="fsql-r10-graph")
    spark.sparkContext.setLogLevel("ERROR")

    # --- PageRank over replicated order graphs -----------------------------
    base_edges = order_graph_edges(spark, "/root/testdata/sf0.1")
    for n_copies in (1, 10, 100):
        dst = f"/tmp/fsql_spark_prgraph_{n_copies}x.parquet"
        if not os.path.exists(dst):
            copies = [
                base_edges.select(
                    (F.col("src") + c * 10_000_000).alias("src"),
                    (F.col("dst") + c * 10_000_000).alias("dst"),
                    "w",
                )
                for c in range(n_copies)
            ]
            out = copies[0]
            for p in copies[1:]:
                out = out.unionByName(p)
            out.write.mode("overwrite").parquet(dst)
        edges = spark.read.parquet(dst)
        edges.write.format("noop").mode("overwrite").save()  # warm
        start = time.perf_counter()
        ew, nodes = pagerank_graph_tables(edges)
        ew, nodes = ew.persist(), nodes.persist()
        n_nodes = nodes.count()
        # loop width follows the node table, not the corpus (entry pattern)
        width = str(max(8, min(64, n_nodes // 50_000 + 8)))
        with temp_conf(spark, **{"spark.sql.shuffle.partitions": width}):
            ranks, _ = pagerank(None, iterations=5, tables=(ew, nodes))
            ranks.write.format("noop").mode("overwrite").save()
        wall = round(time.perf_counter() - start, 2)
        ew.unpersist(); nodes.unpersist()
        print(
            json.dumps(
                {
                    "family": "pagerank",
                    "scale": f"{n_copies}x",
                    "n_edges": edges.count(),
                    "n_nodes": n_nodes,
                    "wall_s": wall,
                }
            ),
            flush=True,
        )
        spark.catalog.clearCache()

    # --- HITS over the replicated DIRECTED order graphs --------------------
    # the prgraph parquets hold the symmetric closure; the directed
    # customer->supplier half is exactly the even-src rows (node encoding:
    # customer = key*2, supplier = key*2+1)
    from pyspark.sql import functions as _F

    from fsql_spark.operators.graph import hits

    for n_copies in (1, 10, 100):
        dst = f"/tmp/fsql_spark_prgraph_{n_copies}x.parquet"
        if not os.path.exists(dst):
            print(json.dumps({"family": "hits", "scale": f"{n_copies}x",
                              "error": "run the pagerank block first"}), flush=True)
            continue
        edges = spark.read.parquet(dst).where(_F.col("src") % 2 == 0) \
                     .select("src", "dst", _F.col("w").cast("double").alias("w")) \
                     .persist()
        ne = edges.count()  # warm + materialize
        start = time.perf_counter()
        auth, _hub = hits(edges, iterations=3)
        auth.write.format("noop").mode("overwrite").save()
        wall = round(time.perf_counter() - start, 2)
        rows = auth.count()
        edges.unpersist()
        print(
            json.dumps(
                {
                    "family": "hits",
                    "scale": f"{n_copies}x",
                    "n_edges": ne,
                    "n_authorities": rows,
                    "wall_s": wall,
                }
            ),
            flush=True,
        )
        spark.catalog.clearCache()

    # --- Label propagation over scaled embedding corpora -------------------
    base = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    for n_copies, n_centroids in ((1, 32), (10, 320), (100, 3200)):
        dst = f"/tmp/fsql_spark_lpemb_{n_copies}x.parquet"
        if not os.path.exists(dst):
            parts = [
                base.select(
                    (F.col("vec_id") + c * 1_000_000).alias("vec_id"),
                    F.expr(
                        f"transform(sequence(0, 63), i -> embedding[(i + {c}) % 64])"
                    ).alias("embedding"),
                )
                for c in range(n_copies)
            ]
            out = parts[0]
            for p in parts[1:]:
                out = out.unionByName(p)
            out.withColumn("label", F.pmod(F.col("vec_id"), F.lit(10)).cast("int")) \
               .write.mode("overwrite").parquet(dst)
        corpus = spark.read.parquet(dst)
        corpus.write.format("noop").mode("overwrite").save()  # warm
        start = time.perf_counter()
        g = knn_graph(corpus, "vec_id", "embedding", k=5, n_centroids=n_centroids).persist()
        out = propagate_labels(corpus, g, "vec_id", "label", seed_fraction=0.3, rounds=2)
        out.write.format("noop").mode("overwrite").save()
        wall = round(time.perf_counter() - start, 2)
        labeled = out.where("label_pred IS NOT NULL").count()
        g.unpersist()
        print(
            json.dumps(
                {
                    "family": "label_propagation",
                    "scale": f"{n_copies}x",
                    "n_vectors": corpus.count(),
                    "n_centroids": n_centroids,
                    "wall_s": wall,
                    "labeled": labeled,
                }
            ),
            flush=True,
        )
        spark.catalog.clearCache()


# ---------------------------------------------------------------------------
# Decade evidence for the session-2 new families (invoked as:
# python r10_spotbench.py session2): interpolation resampling, sequence
# analytics, triangle counting, keyness/zipf, prefix-filter jaccard.
#
# The entries' own bounds are removed where they would hide scaling
# (q_events_interpolate caps user_id < 20 for oracle-size reasons — here the
# operator runs over ALL users so the grid scales with the corpus).
# ---------------------------------------------------------------------------


def session2_decades() -> None:
    from pyspark.sql import functions as F

    from fsql_spark.operators.asof import resample_interpolate
    from fsql_spark.session import get_spark

    import __spark_entry__ as entry_mod

    spark = get_spark(app_name="fsql-r10-session2-spotbench")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry_mod.queries()
    build_sf10(spark)

    def interpolate_all_users(spark, sf):
        from fsql_spark.relational import normalize_events_ts

        ev = normalize_events_ts(spark.read.parquet(f"{sf}/events.parquet"))
        out = resample_interpolate(
            ev, "user_id", "ts", "event_id", "value", every_seconds=3600
        )
        return out.select("user_id", "bin_start_us", "value")

    families = {
        "interpolate_all_users": interpolate_all_users,
        "attribution": qs["q_events_attribution"],
        "markov_transitions": qs["q_markov_transitions"],
        "graph_triangles": qs["q_graph_triangles"],
        "keyness": qs["q_keyness_terms"],
        "zipf_slopes": qs["q_zipf_slopes"],
        "jaccard_prefix": qs["q_jaccard_prefix_pairs"],
    }

    for name, fn in families.items():  # warmup untimed at sf0.1
        try:
            fn(spark, "/root/testdata/sf0.1").write.format("noop").mode(
                "overwrite"
            ).save()
        except Exception as exc:
            print(f"warmup {name} failed: {exc!r}", file=sys.stderr)
        spark.catalog.clearCache()

    for name, fn in families.items():
        row = {"family": name}
        try:
            for tag, sf in (
                ("sf01", "/root/testdata/sf0.1"), ("sf1", SF1), ("sf10", SF10)
            ):
                row[tag], row[f"rows_{tag}"] = _timed(spark, fn, sf)
            row["ratio_10x"] = round(row["sf1"] / max(row["sf01"], 0.01), 2)
            row["ratio_100x"] = round(row["sf10"] / max(row["sf01"], 0.01), 2)
        except Exception as exc:
            row["error"] = repr(exc)
        print(json.dumps(row), flush=True)


def session2b_decades() -> None:
    """Decade rows for the rest of the session-2 families (docs/events
    scale in the perf corpora; orders/lineitem are symlinked, so the
    relational entries are spot-checked at sf0.1 only by the main bench)."""
    from fsql_spark.session import get_spark

    import __spark_entry__ as entry_mod

    spark = get_spark(app_name="fsql-r10-session2b-spotbench")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry_mod.queries()
    build_sf10(spark)

    families = {
        "kcore": qs["q_graph_kcore"],
        "similar_pages": qs["q_graph_similar_pages"],
        "link_components": qs["q_link_graph_components"],
        "pmi": qs["q_pmi_collocations"],
        "rolling_z": qs["q_events_rolling_z"],
        "weighted_sample": qs["q_sample_weighted_docs"],
    }
    for name, fn in families.items():  # warmup untimed at sf0.1
        try:
            fn(spark, "/root/testdata/sf0.1").write.format("noop").mode(
                "overwrite"
            ).save()
        except Exception as exc:
            print(f"warmup {name} failed: {exc!r}", file=sys.stderr)
        spark.catalog.clearCache()

    for name, fn in families.items():
        row = {"family": name}
        try:
            for tag, sf in (
                ("sf01", "/root/testdata/sf0.1"), ("sf1", SF1), ("sf10", SF10)
            ):
                row[tag], row[f"rows_{tag}"] = _timed(spark, fn, sf)
            row["ratio_10x"] = round(row["sf1"] / max(row["sf01"], 0.01), 2)
            row["ratio_100x"] = round(row["sf10"] / max(row["sf01"], 0.01), 2)
        except Exception as exc:
            row["error"] = repr(exc)
        print(json.dumps(row), flush=True)


def session2c_decades() -> None:
    """Decade rows for the session-2 RELATIONAL entries (RFM, Pareto, brand
    cosine): the sf1/sf10 perf corpora symlink orders/customer/lineitem, so
    this builds its own replicas — copy c offsets every key by c * 10M,
    preserving per-customer order counts, per-nation populations (nation
    keys kept), and per-order baskets, so the workload scales linearly in
    customers/orders like a real market."""
    import time

    from pyspark.sql import functions as F

    from fsql_spark.session import get_spark

    import __spark_entry__ as entry_mod

    spark = get_spark(app_name="fsql-r10-session2c")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry_mod.queries()
    src = "/root/testdata/sf0.1"

    def build(n_copies: int) -> str:
        dst = f"/tmp/fsql_spark_rel_{n_copies}x"
        if os.path.exists(f"{dst}/_READY"):
            return dst
        os.makedirs(dst, exist_ok=True)
        for t in ("region", "nation", "part", "supplier",
                  "events", "documents", "embeddings"):
            link = f"{dst}/{t}.parquet"
            if not os.path.exists(link):
                os.symlink(f"{src}/{t}.parquet", link)
        off = lambda col, c: (F.col(col) + c * 10_000_000).alias(col)  # noqa: E731
        orders = spark.read.parquet(f"{src}/orders.parquet")
        cust = spark.read.parquet(f"{src}/customer.parquet")
        li = spark.read.parquet(f"{src}/lineitem.parquet")
        o_parts, c_parts, l_parts = [], [], []
        for c in range(n_copies):
            o_parts.append(orders.select(
                off("o_orderkey", c), off("o_custkey", c),
                *[x for x in orders.columns if x not in ("o_orderkey", "o_custkey")],
            ))
            c_parts.append(cust.select(
                off("c_custkey", c),
                *[x for x in cust.columns if x != "c_custkey"],
            ))
            l_parts.append(li.select(
                off("l_orderkey", c),
                *[x for x in li.columns if x != "l_orderkey"],
            ))
        for name, parts in (("orders", o_parts), ("customer", c_parts), ("lineitem", l_parts)):
            out = parts[0]
            for p in parts[1:]:
                out = out.unionByName(p)
            out.write.mode("overwrite").parquet(f"{dst}/{name}.parquet")
        open(f"{dst}/_READY", "w").close()
        return dst

    families = {
        "customer_rfm": qs["q_customer_rfm"],
        "customer_pareto": qs["q_customer_pareto"],
        "brand_cosine": qs["q_brand_cooccurrence_cosine"],
    }
    dirs = {"1x": src, "10x": build(10), "100x": build(100)}
    for name, fn in families.items():
        try:
            fn(spark, src).write.format("noop").mode("overwrite").save()  # warm
        except Exception as exc:
            print(f"warmup {name} failed: {exc!r}", file=sys.stderr)
        spark.catalog.clearCache()
    for name, fn in families.items():
        row = {"family": name}
        try:
            for tag, d in dirs.items():
                row[tag], row[f"rows_{tag}"] = _timed(spark, fn, d)
            row["ratio_100x"] = round(row["100x"] / max(row["1x"], 0.01), 2)
        except Exception as exc:
            row["error"] = repr(exc)
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "semdedup":
        semdedup_decades()
    elif len(sys.argv) > 1 and sys.argv[1] == "graph":
        graph_decades()
    elif len(sys.argv) > 1 and sys.argv[1] == "session2":
        session2_decades()
    elif len(sys.argv) > 1 and sys.argv[1] == "session2b":
        session2b_decades()
    elif len(sys.argv) > 1 and sys.argv[1] == "session2c":
        session2c_decades()
    else:
        main()
