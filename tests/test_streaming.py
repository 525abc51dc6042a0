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
