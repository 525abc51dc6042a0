"""Structured Streaming tests: real readStream->writeStream execution with
availableNow over the events table, results checked against batch equivalents
computed by Spark itself (DuckDB cross-checks live in test_oracle_parity)."""

from __future__ import annotations

from pyspark.sql import functions as F

from fsql_spark.streaming import (
    events_stream,
    run_to_memory,
    session_aggregate,
    sliding_counts,
    stateful_user_totals,
    tumbling_counts,
)

SF = "/root/testdata/sf0.001"


def _batch_events(spark):
    from fsql_spark.relational import _t

    return _t(spark, SF, "events")


def test_stream_is_really_streaming(spark):
    s = events_stream(spark, SF)
    assert s.isStreaming


def test_tumbling_equals_batch(spark):
    streamed = run_to_memory(tumbling_counts(events_stream(spark, SF)), "complete").toPandas()
    batch = (
        _batch_events(spark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(F.col("w.start").alias("hour_start"), "event_type", "n_events", "sum_value")
        .toPandas()
    )
    key = ["hour_start", "event_type"]
    s = streamed.sort_values(key, ignore_index=True)
    b = batch.sort_values(key, ignore_index=True)
    assert s.equals(b)


def test_sliding_windows_overlap(spark):
    out = run_to_memory(sliding_counts(events_stream(spark, SF)), "complete").toPandas()
    # 1h windows sliding by 30min: every event is in exactly 2 windows
    total_events = _batch_events(spark).count()
    assert out["n_events"].sum() == 2 * total_events


def test_session_window_state(spark):
    out = run_to_memory(session_aggregate(events_stream(spark, SF)), "complete").toPandas()
    per_user_events = _batch_events(spark).groupBy("user_id").count().toPandas()
    merged = out.groupby("user_id")["n_events"].sum().reset_index()
    joined = merged.merge(per_user_events, on="user_id")
    assert (joined["n_events"] == joined["count"]).all()  # partition of events
    assert (out["n_events"] >= 1).all()


def test_stateful_totals(spark):
    raw = run_to_memory(stateful_user_totals(events_stream(spark, SF)), "update").toPandas()
    batch = _batch_events(spark).groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"), F.sum("value").alias("s")
    ).toPandas()
    final = raw.sort_values("n_events").groupby("user_id").last().reset_index()
    joined = final.merge(batch, on="user_id")
    assert (joined["n_events"] == joined["n"]).all()
    assert (abs(joined["sum_value"] - joined["s"]) < 1e-6).all()


def _staged_stream(spark, tmp_path, frames):
    """Stage multiple parquet files -> multiple micro-batches (one per file
    via maxFilesPerTrigger) for true incremental processing tests."""
    import os

    from pyspark.sql import functions as F
    from fsql_spark.streaming.windows import EVENT_SCHEMA

    stage = tmp_path / "stream_src"
    stage.mkdir()
    for i, pdf in enumerate(frames):
        target = stage / f"batch_{i}.parquet"
        pdf.to_parquet(target)
        # the file source orders pending files by modification time; equal
        # mtimes make batch order nondeterministic
        os.utime(target, (1_700_000_000 + i * 10, 1_700_000_000 + i * 10))
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    raw = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .format("parquet")
        .load(str(stage))
    )
    return raw.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))


def _mk_events(rows):
    import pandas as pd

    return pd.DataFrame(
        {
            "event_id": [r[0] for r in rows],
            "ts": pd.to_datetime([r[1] for r in rows]).astype("datetime64[ns]"),
            "user_id": [r[2] for r in rows],
            "event_type": ["click"] * len(rows),
            "value": [1.0] * len(rows),
            "props": ["{}"] * len(rows),
        }
    )


def test_stateful_totals_accumulate_across_batches(spark, tmp_path):
    """applyInPandasWithState must carry state across micro-batches: the same
    user appearing in two files ends with the combined total."""
    b0 = _mk_events([(1, "2024-01-01 10:00:00", 7), (2, "2024-01-01 10:01:00", 7)])
    b1 = _mk_events([(3, "2024-01-01 12:00:00", 7), (4, "2024-01-01 12:05:00", 8)])
    stream = _staged_stream(spark, tmp_path, [b0, b1])
    raw = run_to_memory(stateful_user_totals(stream), "update").toPandas()
    final = raw.sort_values("n_events").groupby("user_id").last()
    assert final.loc[7, "n_events"] == 3  # 2 from batch 0 + 1 from batch 1
    assert final.loc[8, "n_events"] == 1
    # and the intermediate (batch-0) emission for user 7 was 2
    assert sorted(raw[raw.index.isin(raw.index)][raw["user_id"] == 7]["n_events"]) == [2, 3]


def test_watermark_finalizes_windows_and_drops_very_late_events(spark, tmp_path):
    """Append-mode windowed agg with a 10-minute watermark across three
    micro-batches: windows are emitted exactly once when the watermark passes
    them, and an event arriving AFTER its window was finalized is dropped —
    no duplicate emission, no resurrected window.

    (Note: a late event landing in the same micro-batch in which its window
    is being finalized can still merge — Spark applies the late filter
    against the previous batch's watermark; the guarantee is about windows
    already evicted from state.)"""
    from pyspark.sql import functions as F

    b0 = _mk_events([(1, "2024-01-01 10:05:00", 1), (2, "2024-01-01 12:00:00", 1)])
    b1 = _mk_events([(3, "2024-01-01 14:00:00", 1)])  # watermark -> 13:50; 10:00 window evicted
    b2 = _mk_events([(4, "2024-01-01 10:06:00", 1), (5, "2024-01-01 16:00:00", 1)])  # 4 is 4h late
    stream = _staged_stream(spark, tmp_path, [b0, b1, b2])
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("start"), "n")
    )
    out = run_to_memory(agg, "append").toPandas()
    starts = [str(s) for s in out["start"]]
    # exactly ONE emission of the 10:00 window, with only the on-time event
    assert starts.count("2024-01-01 10:00:00") == 1, out.to_string()
    n_1000 = int(out[out["start"].astype(str) == "2024-01-01 10:00:00"]["n"].iloc[0])
    assert n_1000 == 1, out.to_string()  # the 4h-late event was dropped
    assert starts.count("2024-01-01 12:00:00") == 1  # finalized exactly once too


def test_stream_stream_interval_join(spark, tmp_path):
    """Stream-stream join: each click joined to same-user purchases within
    the preceding 30 minutes; verified against the equivalent batch join."""
    from pyspark.sql import functions as F
    from fsql_spark.streaming import stream_stream_join

    rows = [
        (1, "2024-01-01 10:00:00", 1),   # purchase u1
        (2, "2024-01-01 10:10:00", 1),   # click u1 -> joins 1
        (3, "2024-01-01 11:00:00", 1),   # click u1 -> too late for 1
        (4, "2024-01-01 10:05:00", 2),   # click u2 -> no purchase
    ]
    pdf = _mk_events(rows)
    pdf.loc[pdf.event_id.isin([1]), "event_type"] = "purchase"
    (tmp_path / "src").mkdir()
    pdf.to_parquet(tmp_path / "src" / "b0.parquet")

    from fsql_spark.streaming.windows import EVENT_SCHEMA

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = (
        spark.readStream.schema(EVENT_SCHEMA).format("parquet").load(str(tmp_path / "src"))
        .withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    )
    clicks = raw.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), F.col("user_id"), F.col("ts").alias("click_ts")
    )
    purchases = raw.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("purchase_ts"),
    ).withColumnRenamed("p_user", "user_id")
    joined = stream_stream_join(
        clicks, purchases, on="user_id", left_ts="click_ts", right_ts="purchase_ts"
    )
    out = run_to_memory(joined.select("click_id", "purchase_id"), "append").toPandas()
    assert {(r.click_id, r.purchase_id) for r in out.itertuples()} == {(2, 1)}


def test_stream_sink_feeds_read_partitioned_table(spark, tmp_path):
    """Integration of the two engine halves: a stream sinks into a
    Hive-partitioned tree; read_partitioned_table queries it back with
    partition pruning."""
    from pyspark.sql import functions as F
    from fsql_spark import Q_EQ, Q_TRUE, read_partitioned_table
    from fsql_spark.streaming import events_stream, stream_to_partitioned_table

    ev = events_stream(spark, SF)
    enriched = ev.withColumn("event_date", F.to_date("ts").cast("string"))
    target = str(tmp_path / "events_table")
    stream_to_partitioned_table(
        enriched.select("event_id", "user_id", "event_type", "value", "event_date"),
        target,
        partition_by=["event_date", "event_type"],
    )
    total = read_partitioned_table(target, Q_TRUE, spark=spark)
    assert total.count() == _batch_events(spark).count()
    clicks = read_partitioned_table(target, Q_EQ("event_type", "click"), spark=spark)
    expected = _batch_events(spark).where(F.col("event_type") == "click").count()
    assert clicks.count() == expected
    # partition cols surface as strings, per the engine contract
    assert dict(clicks.dtypes)["event_type"] == "string"
    assert dict(clicks.dtypes)["event_date"] == "string"


def test_stream_ingest_dedup_matches_batch_operator(spark, tmp_path):
    """The batch bloom-dedup operator runs UNMODIFIED on a document stream
    (stateless prefilter + stream-static anti-join) and yields the batch
    answer regardless of how the files split into micro-batches."""
    from fsql_spark.operators import dedup_against, dedup_against_bloom
    from fsql_spark.operators.dedup import _incremental_batch
    from fsql_spark.streaming.windows import run_to_memory

    corpus = spark.read.parquet(f"{SF}/documents.parquet")
    batch = _incremental_batch(spark, SF)
    src = str(tmp_path / "ingest")
    batch.repartition(4).write.parquet(src)  # 4 files -> 4 micro-batches
    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    streamed = run_to_memory(
        dedup_against_bloom(stream, corpus, ["text"], normalize=True).select("doc_id"),
        mode="append",
    )
    want = sorted(
        r["doc_id"]
        for r in dedup_against(batch, corpus, ["text"], normalize=True).select("doc_id").collect()
    )
    assert sorted(r["doc_id"] for r in streamed.collect()) == want and want


def test_stateful_transitions_pair_across_batches(spark, tmp_path):
    """A transition whose two events land in DIFFERENT micro-batches must
    still be counted: the state-carried last type pairs with the next
    batch's first event."""
    import json

    import pandas as pd

    from fsql_spark.streaming.windows import stateful_transitions

    def mk(rows):
        return pd.DataFrame(
            {
                "event_id": [r[0] for r in rows],
                "ts": pd.to_datetime([r[1] for r in rows]).astype("datetime64[ns]"),
                "user_id": [r[2] for r in rows],
                "event_type": [r[3] for r in rows],
                "value": [1.0] * len(rows),
                "props": ["{}"] * len(rows),
            }
        )

    b0 = mk([(1, "2024-01-01 10:00:00", 7, "view"),
             (2, "2024-01-01 10:01:00", 7, "click")])
    b1 = mk([(3, "2024-01-01 12:00:00", 7, "purchase"),
             (4, "2024-01-01 12:05:00", 8, "view")])
    stream = _staged_stream(spark, tmp_path, [b0, b1])
    raw = run_to_memory(stateful_transitions(stream), "update").toPandas()
    final = raw.sort_values("n_pairs").groupby("user_id").last()
    got = json.loads(final.loc[7, "pairs_json"])
    # view->click inside batch 0; click->purchase SPANS the batch boundary
    assert got == {"view\x01click": 1, "click\x01purchase": 1}
    assert final.loc[7, "n_pairs"] == 2
    assert final.loc[8, "n_pairs"] == 0


def test_stateful_attribution_credits_across_batches(spark, tmp_path):
    """A purchase in a later micro-batch credits the touch carried in state
    from an earlier one; a touch AFTER the purchase never back-credits."""
    import pandas as pd

    from fsql_spark.streaming.windows import stateful_attribution

    def mk(rows):
        return pd.DataFrame(
            {
                "event_id": [r[0] for r in rows],
                "ts": pd.to_datetime([r[1] for r in rows]).astype("datetime64[ns]"),
                "user_id": [r[2] for r in rows],
                "event_type": [r[3] for r in rows],
                "value": [r[4] for r in rows],
                "props": ["{}"] * len(rows),
            }
        )

    b0 = mk([(1, "2024-01-01 10:00:00", 7, "click", 0.0),
             (2, "2024-01-01 10:30:00", 8, "purchase", 5.0)])
    b1 = mk([(3, "2024-01-01 12:00:00", 7, "purchase", 10.0),
             (4, "2024-01-01 12:30:00", 7, "view", 0.0)])
    stream = _staged_stream(spark, tmp_path, [b0, b1])
    raw = run_to_memory(stateful_attribution(stream), "update").toPandas()
    final = (
        raw.sort_values("conversions")
        .groupby(["user_id", "channel"])
        .last()
        .reset_index()
    )
    got = {(r.user_id, r.channel): (r.conversions, r.revenue)
           for r in final.itertuples()}
    # user 7: purchase in batch 1 credits the batch-0 click (NOT the later view)
    assert got[(7, "click")] == (1, 10.0)
    # user 8: no prior touch -> direct
    assert got[(8, "direct")] == (1, 5.0)
    assert set(got) == {(7, "click"), (8, "direct")}


def test_dsir_stateless_on_rate_source_with_watermark(spark, tmp_path):
    """Close the last untested streaming-posture claim (VERDICT r11 item 8):
    the stateless DSIR kernel scoring a RATE-LIMITED readStream — a true
    unbounded source, not an availableNow file replay — with a watermarked
    windowed aggregate downstream. Per-doc (n_grams, llr) must equal the
    batch broadcast-join scorer's rows for the same documents (model fit
    offline on the batch corpus)."""
    import time as _time

    from pyspark.sql import functions as F

    from fsql_spark.operators.dsir import (
        dsir_fit,
        dsir_logratio_scores,
    )
    from fsql_spark.operators.dsir import dsir_score_stateless

    B = 256
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    sample = (
        docs.where(F.length("text") > 0).orderBy("doc_id").limit(40)
        .select("doc_id", "text").collect()
    )
    ids = [str(r["doc_id"]) for r in sample]
    texts = [r["text"] for r in sample]
    batch = {
        str(r["doc_id"]): (r["n_grams"], round(r["llr"], 9))
        for r in dsir_logratio_scores(
            docs, "doc_id", "text", F.col("lang") == "en", n_buckets=B
        ).collect()
        if str(r["doc_id"]) in set(ids)
    }
    ratio_rows = dsir_fit(docs, "text", F.col("lang") == "en", n_buckets=B)

    # rate source: value = 0,1,2,... at a limited rate; each row becomes one
    # of the sampled documents, scored in-flight by the SAME kernel.
    rate = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", 200)
        .option("numPartitions", 2)
        .load()
    )
    id_arr = F.array(*[F.lit(i) for i in ids])
    tx_arr = F.array(*[F.lit(t) for t in texts])
    idx = (F.col("value") + 1).cast("int")
    stream_docs = rate.where(F.col("value") < len(ids)).select(
        F.col("timestamp").alias("ts"),
        F.element_at(id_arr, idx).alias("doc_id"),
        F.element_at(tx_arr, idx).alias("text"),
    )
    scored = dsir_score_stateless(
        stream_docs, ratio_rows, n_buckets=B, carry_cols=("ts",)
    )
    assert scored.isStreaming

    name = "dsir_rate_scores"
    q1 = (
        scored.writeStream.format("memory").queryName(name)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck1"))
        .start()
    )
    # watermark + tumbling window over the kernel's carried event time:
    # proves the scored stream composes with watermarked stateful ops.
    windowed = (
        scored.withWatermark("ts", "5 seconds")
        .groupBy(F.window("ts", "10 seconds"))
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("n_grams").alias("grams"))
    )
    q2 = (
        windowed.writeStream.format("memory").queryName("dsir_rate_windows")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .start()
    )
    try:
        deadline = _time.time() + 90
        while _time.time() < deadline:
            if spark.table(name).count() >= len(ids):
                break
            _time.sleep(0.5)
        got = {
            str(r["doc_id"]): (r["n_grams"], round(r["llr"], 9))
            for r in spark.table(name).collect()
        }
        assert got == batch  # every sampled doc scored, values identical

        # let the watermark advance past the sampled rows, then check the
        # windowed totals cover every scored doc exactly once
        deadline = _time.time() + 60
        while _time.time() < deadline:
            agg = spark.table("dsir_rate_windows").agg(
                F.sum("n_docs").alias("d")).collect()[0]["d"]
            if agg == len(ids):
                break
            _time.sleep(0.5)
        rows = spark.table("dsir_rate_windows").collect()
        assert sum(r["n_docs"] for r in rows) == len(ids)
        assert sum(r["grams"] for r in rows) == sum(v[0] for v in batch.values())
    finally:
        q1.stop()
        q2.stop()


def test_checkpoint_state_partition_mismatch_refused(spark, tmp_path):
    """The state-partition count is immutable per checkpoint; a restart
    requesting the other value must refuse LOUDLY — Spark itself would
    silently keep the checkpoint's value and ignore the request (r13
    verdict task). Same-value restarts proceed; fresh dirs accept any."""
    import pytest

    from fsql_spark.streaming.windows import checkpoint_state_partitions

    ckpt = str(tmp_path / "ckpt")
    agg = tumbling_counts(events_stream(spark, SF))
    first = run_to_memory(agg, "complete", state_partitions=4, checkpoint=ckpt)
    assert first.count() > 0
    # the offsets log recorded the partitioning the state was built under
    assert checkpoint_state_partitions(ckpt) == 4

    with pytest.raises(ValueError, match="immutable"):
        run_to_memory(agg, "complete", state_partitions=16, checkpoint=ckpt)

    # matching count restarts cleanly (no new data -> empty incremental
    # result is fine; the point is it starts instead of refusing)
    run_to_memory(agg, "complete", state_partitions=4, checkpoint=ckpt)

    # a fresh checkpoint dir is unconstrained
    assert checkpoint_state_partitions(str(tmp_path / "nope")) is None


def test_auto_select_falls_back_when_plan_inspection_fails(spark):
    """Plan inspection during state-partition auto-select is an
    optimization, never a failure mode (advice find): if the internal
    _jdf handle cannot produce an analyzed plan, run_to_memory must fall
    back to the JVM-state profile and still execute the query."""
    stream = tumbling_counts(events_stream(spark, SF))

    class BoomQE:
        """Proxy that breaks ONLY plan inspection; everything else (the
        writeStream path) passes through to the real JVM handle."""

        def __init__(self, real):
            self.__dict__["_real"] = real

        def queryExecution(self):
            raise RuntimeError("no plan for you")

        def __getattr__(self, name):
            return getattr(self.__dict__["_real"], name)

    stream._jdf = BoomQE(stream._jdf)
    out = run_to_memory(stream, "complete")  # state_partitions=None -> auto
    assert out.count() > 0


def test_final_batch_skip_restores_conf_and_keeps_finalizing_aggregates(spark):
    """r15: run_to_memory skips availableNow's empty finalization
    micro-batch only for plans with nothing to finalize (complete/update
    mode, stateless/pass-through append); an append-mode WATERMARKED
    AGGREGATE — whose final windows are emitted BY that batch — must keep
    it, and the session conf must come back either way."""
    key = "spark.sql.streaming.noDataMicroBatches.enabled"
    before = spark.conf.get(key)

    # pass-through append (dedup): skip path exercised
    from fsql_spark.streaming.windows import stream_dedup

    ded = stream_dedup(events_stream(spark, SF), ["user_id", "event_type"])
    run_to_memory(ded, "append")
    assert spark.conf.get(key) == before

    # append-mode watermarked aggregate: the finalization batch must stay —
    # with it skipped this emits ZERO rows (every window is withheld until
    # the watermark passes, which for a single-batch source only the
    # closing no-data batch advances)
    agg = (
        events_stream(spark, SF)
        .withWatermark("ts", "1 minute")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("start"), "n")
    )
    out = run_to_memory(agg, "append")
    assert out.count() > 0  # finalized windows emitted
    assert spark.conf.get(key) == before
