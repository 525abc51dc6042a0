"""Incremental hourly rollup — the continuous-aggregate / hypertable
pattern: a stored (hour, keys) aggregate table that ingest batches MERGE
into, so the rollup is maintained by scanning each batch once instead of
re-aggregating the event history per refresh.

Scale shape (100 TB/day event volume):

- The stored rollup is (hours x key-cardinality)-sized — METADATA next to
  the event stream. Each update aggregates only the incoming batch (one
  map-side-combinable shuffle over the batch) and merges with the stored
  partials by key.
- The stored rows are MERGEABLE partials (count, sum): any DISJOINT batch
  split — by arrival time, by event time, out of order — produces the same
  final table as one full recompute (float sums agree to merge-order ulps;
  exact for the integer counts). That invariant IS the catalog entry's
  oracle: three arbitrary (mod-3) batches vs DuckDB's single-pass
  aggregate. The contract is exactly-once batches: a REPLAYED batch
  double-counts (additive partials are not idempotent). Streaming callers
  get this ENFORCED by passing ``foreachBatch``'s monotonic batch id to
  ``update_rollup(batch_id=...)`` — already-merged ids are skipped, the id
  committing atomically with the data in the swap. Ad-hoc batch callers
  that may retry without ids should restate whole hours via
  ``maintenance.overwrite_partitions`` semantics instead of re-merging.
- The rewrite commits via the staging + backup + swap discipline of
  ``maintenance.compact`` (atomic where FileSystem.move is; the rollup is
  small enough that the rewrite is trivially cheap — at extreme key
  cardinality partition the rollup by month and swap per partition).

No reference counterpart (the reference has no aggregation at all,
SURVEY §2.5); named as a driver-suggested custom operator ("hypertable
rollup").
"""

from __future__ import annotations

import uuid
from typing import Optional, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..fs import FileSystem, get_url_and_fs


def hourly_rollup(
    events: DataFrame,
    ts_col: str = "ts",
    key_cols: Sequence[str] = ("event_type",),
    value_col: str = "value",
) -> DataFrame:
    """One aggregate row per (hour, keys): mergeable (n_events, sum_value)
    partials."""
    return events.groupBy(
        F.date_trunc("hour", F.col(ts_col)).alias("hour_start"), *key_cols
    ).agg(F.count(F.lit(1)).alias("n_events"), F.sum(value_col).alias("sum_value"))


#: underscore-prefixed so parquet directory reads ignore it (like _SUCCESS);
#: lives INSIDE the rollup dir so the swap moves it atomically with the data
_BATCH_ID_FILE = "_last_batch_id"


def _last_merged_batch_id(fs: FileSystem, base: str) -> Optional[int]:
    marker = f"{base}/{_BATCH_ID_FILE}"
    if not fs.exists(marker):
        return None
    with fs.open(marker, "r") as fd:
        return int(fd.read().strip())


def update_rollup(
    spark: SparkSession,
    batch: DataFrame,
    url: str,
    ts_col: str = "ts",
    key_cols: Sequence[str] = ("event_type",),
    value_col: str = "value",
    fs: Optional[FileSystem] = None,
    batch_id: Optional[int] = None,
) -> None:
    """Merge ``batch``'s hourly partials into the rollup stored at ``url``
    (created on first call). The batch is scanned once; the stored table is
    rollup-sized. Mergeability of (count, sum) makes the result independent
    of how events were split into batches.

    ``batch_id``: pass the monotonic micro-batch id from a ``foreachBatch``
    callback and replayed batches become no-ops — a checkpoint restart
    re-delivers the last uncommitted batch, and additive partials are NOT
    idempotent, so without the guard a replay double-counts. The id is
    recorded inside the rollup directory itself (swapped atomically with
    the data: a crash between data-commit and id-commit is impossible), so
    the exactly-once contract the module docstring documents is ENFORCED
    for the streaming wiring, not just assumed. Single-writer per rollup,
    like the swap discipline itself."""
    path, fs = get_url_and_fs(url, fs)
    base = path.rstrip("/")
    _recover_interrupted_swap(fs, base)
    last = _last_merged_batch_id(fs, base) if fs.exists(base) else None
    if batch_id is not None and last is not None:
        if batch_id == last:
            return  # checkpoint replay: this batch's partials are already in
        if batch_id < last:
            # within one checkpoint, foreachBatch ids are monotonic and a
            # replay re-delivers at most the LAST batch — an id BELOW the
            # marker means the id space reset (fresh/relocated checkpoint
            # pointed at an existing rollup). Silently skipping would drop
            # genuinely new data forever; refuse so the operator restates.
            raise ValueError(
                f"rollup at {url} last merged batch id {last} but received "
                f"id {batch_id}: the stream's id space reset (new checkpoint "
                "against an existing rollup?) — restate the rollup or resume "
                "from the original checkpoint"
            )
    # an interleaved id-less (ad-hoc) merge must not ERASE the streaming
    # watermark — carry the recorded id through the rewrite
    marker_id = batch_id if batch_id is not None else last
    part = hourly_rollup(batch, ts_col, key_cols, value_col)
    keys = ["hour_start", *key_cols]
    if fs.exists(base):
        old = spark.read.parquet(fs.spark_url(base))
        merged = (
            old.unionByName(part)
            .groupBy(*keys)
            .agg(F.sum("n_events").alias("n_events"), F.sum("sum_value").alias("sum_value"))
        )
    else:
        merged = part
    tag = uuid.uuid4().hex[:8]
    staging = base + f".rollup_staging_{tag}"
    try:
        # staging write happens BEFORE the swap, so the merge plan can still
        # read the old files it references lazily
        merged.write.mode("overwrite").parquet(fs.spark_url(staging))
        if marker_id is not None:
            with fs.open(f"{staging}/{_BATCH_ID_FILE}", "w") as fd:
                fd.write(str(marker_id))
        if fs.exists(base):
            backup = base + f".rollup_backup_{tag}"
            fs.move(base, backup)
            fs.move(staging, base)
            fs.rmtree(backup)
        else:
            fs.move(staging, base)
    finally:
        fs.rmtree(staging)


def _recover_interrupted_swap(fs: FileSystem, base: str) -> None:
    """A crash in the swap window (after ``path -> backup``, before
    ``staging -> path``) leaves the only surviving copy of the rollup in a
    ``.rollup_backup_*`` sibling; without recovery the next update would
    quietly re-initialize from ONE batch and every later merge would
    compound the undercount (review find — unlike compact's backups, the
    partials are not re-derivable from the path). Restore the backup when
    the table is missing; drop stale backups when the table exists (the
    swap completed, the merged data is live). Orphaned staging dirs (a
    crash before the swap; their tag's ``finally`` never ran) are also
    removed — under the single-writer contract any sibling staging dir at
    entry time is dead weight. Only a MISSING parent skips recovery (then
    no backups can exist); other listing failures propagate rather than
    silently disabling the restore."""
    if "/" in base:
        parent, name = base.rsplit("/", 1)
        parent = parent or "/"  # root-level table
    else:
        parent, name = ".", base  # cwd-relative single segment
    try:
        _files, dir_names = fs.ls(parent)  # ls returns (files, dirs), bare names
    except FileNotFoundError:
        return  # parent not created yet: first-ever call, nothing to recover
    backups = sorted(f"{parent}/{d}" for d in dir_names if d.startswith(name + ".rollup_backup_"))
    for d in dir_names:
        if d.startswith(name + ".rollup_staging_"):
            fs.rmtree(f"{parent}/{d}")
    if not backups:
        return
    if fs.exists(base):
        for b in backups:  # completed swaps: merged data is live
            fs.rmtree(b)
    else:
        fs.move(backups[-1], base)  # interrupted swap: restore the rollup
        for b in backups[:-1]:
            fs.rmtree(b)


def read_rollup(spark: SparkSession, url: str, fs: Optional[FileSystem] = None) -> DataFrame:
    path, fs = get_url_and_fs(url, fs)
    return spark.read.parquet(fs.spark_url(path))


# --------------------------------------------------------------------------
# catalog entry + oracle
# --------------------------------------------------------------------------

def q_rollup_incremental(spark: SparkSession, sf: str) -> DataFrame:
    """The maintained rollup after THREE arbitrary (event_id mod 3) ingest
    batches must equal one full recompute — the mergeable-partials
    invariant, checked against DuckDB's single-pass hourly aggregate."""
    from ..fsql_catalog import _build_once, _tree_dir
    from ..relational import _t

    def build(staging: str) -> None:
        ev = _t(spark, sf, "events")
        for i in range(3):
            update_rollup(spark, ev.where(F.col("event_id") % 3 == i), staging)

    url = _build_once(_tree_dir(sf, "rollup_hourly_v1", "events"), build)
    out = read_rollup(spark, url)
    return out.select(
        "hour_start",
        "event_type",
        "n_events",
        F.round("sum_value", 2).alias("sum_value"),
    )


Q_ROLLUP_INCREMENTAL_SQL = """
SELECT date_trunc('hour', ts) AS hour_start,
       event_type,
       COUNT(*)               AS n_events,
       ROUND(SUM(value), 2)   AS sum_value
FROM events
GROUP BY 1, 2
"""


ROLLUP_QUERIES = {"q_rollup_incremental": q_rollup_incremental}
ROLLUP_ORACLES = {"q_rollup_incremental": Q_ROLLUP_INCREMENTAL_SQL}
