"""Structured Streaming surface over event streams.

The reference is batch-only (`/root/reference/src/fsql/api.py:33-36` even
disclaims read consistency); streaming is the one genuinely new semantic area
of this engine (SURVEY §2.5). Operators are built on Spark Structured
Streaming: ``readStream`` file sources, watermarks for late data, tumbling /
sliding / session windows, and ``applyInPandasWithState`` for custom stateful
logic.

The catalog entries run REAL streaming queries (file-stream source over the
events parquet, availableNow trigger, memory sink) and return the resulting
table, so the driver's oracle gate checks true end-to-end streaming output
against batch SQL semantics.
"""

from .windows import (  # noqa: F401
    STREAMING_ORACLES,
    STREAMING_QUERIES,
    events_stream,
    run_to_memory,
    session_aggregate,
    sliding_counts,
    stateful_user_totals,
    stream_dedup,
    stream_stream_join,
    stream_to_partitioned_table,
    tumbling_counts,
)
