"""The events loader contract: ``ts`` normalizes to TIMESTAMP (LTZ, UTC
wall-clock preserved) for every physical parquet encoding the driver's
testdata generator has shipped — TIMESTAMP(NANOS) (Spark reads as long under
nanosAsLong), timestamp[us] isAdjustedToUTC=false (reads as TIMESTAMP_NTZ),
and timestamp[us] UTC-adjusted (reads as TIMESTAMP). The round-3 testdata
regeneration flipped nanos -> NTZ and silently broke 7 queries; this pins
the normalization so the next flip is a test failure, not a wrong answer."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from fsql_spark.relational import _fix_nanos, normalize_events_ts

TS = ["2024-01-01 10:00:00", "2024-01-01 10:30:00", "2024-03-05 23:59:59"]


def _base_table(ts_array: pa.Array) -> pa.Table:
    n = len(TS)
    return pa.table(
        {
            "event_id": pa.array(range(n), pa.int64()),
            "ts": ts_array,
            "user_id": pa.array([7] * n, pa.int64()),
            "event_type": pa.array(["click"] * n),
            "value": pa.array([1.0] * n),
            "props": pa.array(["{}"] * n),
        }
    )


@pytest.fixture(
    params=["nanos", "us_ntz", "us_utc"],
    ids=["timestamp-nanos", "timestamp-us-ntz", "timestamp-us-utc"],
)
def events_dir(request, tmp_path):
    ts = pd.to_datetime(TS)
    if request.param == "nanos":
        arr = pa.array(ts, pa.timestamp("ns"))
    elif request.param == "us_ntz":
        arr = pa.array(ts, pa.timestamp("us"))
    else:
        arr = pa.array(ts.tz_localize("UTC"), pa.timestamp("us", tz="UTC"))
    pq.write_table(_base_table(arr), tmp_path / "events.parquet")
    return str(tmp_path)


def test_loader_normalizes_every_encoding(spark, events_dir):
    df = _fix_nanos(spark, events_dir)
    assert dict(df.dtypes)["ts"] == "timestamp"
    got = [str(r.ts) for r in df.orderBy("event_id").collect()]
    assert got == TS  # UTC wall-clock preserved exactly
    # and unix_micros (what sessionize/asof/range-join build on) resolves
    from pyspark.sql import functions as F

    micros = [r.m for r in df.orderBy("event_id").select(F.unix_micros("ts").alias("m")).collect()]
    assert micros == [int(t.timestamp() * 1_000_000) for t in pd.to_datetime(TS, utc=True)]


def test_streaming_source_matches_batch(spark, events_dir):
    from fsql_spark.streaming import events_stream, run_to_memory

    out = run_to_memory(events_stream(spark, events_dir), mode="append")
    assert dict(out.dtypes)["ts"] == "timestamp"
    got = sorted(str(r.ts) for r in out.collect())
    assert got == TS


def test_normalize_passthrough_for_other_frames(spark):
    # frames without a ts column pass through untouched
    df = spark.range(3)
    assert normalize_events_ts(df) is df or normalize_events_ts(df).columns == ["id"]
