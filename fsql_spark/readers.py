"""Output representations: discovered partitions -> DataFrame / pandas / dict / listing.

Mirrors the reference's pluggable ``DataReader`` polymorphism
(``/root/reference/src/fsql/deser.py:98-162``) with a Spark-first default:

- :class:`SparkReader` — THE scale path. One distributed ``spark.read`` over
  all surviving files per schema-group; partition columns attached JVM-side
  (literals per partition group, or a broadcast path-join for high partition
  counts). This subsumes the reference's DaskReader (`deser_dask.py:18-56`):
  Spark is already lazy, one task per file split.
- :class:`PandasReader` — fsql-parity driver-side reader (32-thread pool,
  pandas per file, partition cols appended as str, ``lazy_errors`` partial
  results, kwargs passthrough incl. ``columns=`` projection) — reference
  `deser.py:165-237`. Small-data compatibility mode; also the xlsx path.
- :class:`EnumeratedDictReader` — whole-file JSON -> dict keyed by file order
  (reference `deser.py:240-270`).
- :class:`IdentityReader` — "fancy ls": FileInPartition records with a
  ``consume`` callback (reference `deser.py:273-303`).

``lazy_errors`` (reference `deser.py:101-110`): eager mode raises on the first
per-file failure; lazy mode returns ``(data, failures)`` with the readable
subset loaded.

DEVIATION (documented): an empty partition set returns an EMPTY result (empty
DataFrame / dict) instead of the reference's pandas concat crash
(`tests/test_lex_range_query.py:113-114`).
"""

from __future__ import annotations

import io
import json
from abc import ABC, abstractmethod
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass, field
from typing import Any, Callable, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from .discovery import Partition
from .formats import InputFormat
from .fs import FileSystem

def _hadoop_uri(url: str) -> str:
    """Percent-encode a path URL the way Hadoop ``Path.toUri`` does (RFC 2396
    path rules), to match what ``input_file_name()`` returns at scan time."""
    from urllib.parse import quote

    scheme = ""
    if "://" in url:
        scheme, _, url = url.partition("://")
        scheme += "://"
    # java.net.URI leaves RFC 2396 path characters and marks unescaped
    return scheme + quote(url, safe="/@:&=+$,;!'()*~-._")


_POOL_SIZE = 32  # reference `deser.py:153`
#: above this many distinct partition bindings the SparkReader switches from
#: per-group literal columns to a single scan + broadcast path-join. Each
#: per-binding branch costs its own load (schema inference + footer reads)
#: plus a union arm in the plan — measured ~60 ms/binding of pure driver
#: overhead on a local tree — while the join path is one scan whatever the
#: binding count. Literals only win while the plan is small enough for
#: Catalyst constant folding to matter, so the crossover sits low.
_LIT_GROUP_LIMIT = 8


@dataclass
class ReadFailure:
    """One unreadable file: (partition, error) — reference `deser.py:101-110`."""

    partition: Partition
    error: Exception


class DataReader(ABC):
    """Turn discovered terminal partitions into an output object."""

    lazy_errors: bool = False

    @abstractmethod
    def read(
        self, spark: SparkSession, partitions: list[Partition], fs: FileSystem, fmt: InputFormat
    ) -> Any: ...


def _detect(url: str, fmt: InputFormat) -> InputFormat:
    return InputFormat.from_url(url) if fmt is InputFormat.AUTO else fmt


class SparkReader(DataReader):
    """Distributed read: the engine's default output is a Spark DataFrame.

    Parameters
    ----------
    input_format: fixed format override (AUTO = detect per file suffix;
        all files must agree within one read).
    schema: explicit StructType (skips inference — recommended at scale).
    options: Spark reader options merged over the format defaults.
    columns: projection pushed into the scan (reference's ``columns=`` kwarg,
        `deser.py:170-176`; Catalyst prunes parquet columns natively).
    """

    def __init__(
        self,
        input_format: InputFormat = InputFormat.AUTO,
        schema: Optional[StructType] = None,
        options: Optional[dict[str, str]] = None,
        columns: Optional[list[str]] = None,
        lazy_errors: bool = False,
    ):
        self.input_format = input_format
        self.schema = schema
        self.options = options or {}
        self.columns = columns
        self.lazy_errors = lazy_errors

    def read(
        self, spark: SparkSession, partitions: list[Partition], fs: FileSystem, fmt: InputFormat
    ) -> Any:
        fmt = self.input_format if self.input_format is not InputFormat.AUTO else fmt
        parts = list(partitions)
        failures: list[ReadFailure] = []
        if self.lazy_errors:
            parts, failures = self._validate(parts, fs, fmt)
        df = self._load(spark, parts, fs, fmt)
        if self.columns:
            # projection pushdown (reference `deser.py:170-176`): requested
            # data columns + the partition-path columns, which are always kept
            part_keys = {k for p in parts for k in p.columns}
            df = df.select(
                *[c for c in self.columns if c in df.columns],
                *[c for c in df.columns if c in part_keys],
            )
        return (df, failures) if self.lazy_errors else df

    # -- internals ---------------------------------------------------------

    def _load(
        self, spark: SparkSession, parts: list[Partition], fs: FileSystem, fmt: InputFormat
    ) -> DataFrame:
        if not parts:
            return spark.createDataFrame([], self.schema or StructType([]))
        fmt = self.input_format if self.input_format is not InputFormat.AUTO else fmt
        # group by (partition-column key-set, per-file format): files at
        # different tree depths (the bare-AutoParser quirk, reference
        # `column_parser.py:106-110`) get NaN-padded union semantics like
        # pandas concat; mixed suffixes read with their own source each
        by_keys: dict[tuple, list[Partition]] = {}
        for p in parts:
            by_keys.setdefault((tuple(sorted(p.columns)), _detect(p.url, fmt)), []).append(p)

        frames = [
            self._load_key_group(spark, group, fs, key[1]) for key, group in by_keys.items()
        ]
        out = frames[0]
        for frame in frames[1:]:
            out = out.unionByName(frame, allowMissingColumns=True)
        return out

    def _load_key_group(
        self, spark: SparkSession, group: list[Partition], fs: FileSystem, fmt: InputFormat
    ) -> DataFrame:
        by_binding: dict[tuple[tuple[str, str], ...], list[str]] = {}
        for p in group:
            by_binding.setdefault(tuple(sorted(p.columns.items())), []).append(fs.spark_url(p.url))

        reader = spark.read.format(fmt.spark_format()).options(**{**fmt.spark_options(), **self.options})
        if self.schema is not None:
            reader = reader.schema(self.schema)

        if len(by_binding) <= _LIT_GROUP_LIMIT:
            # few partitions: per-binding scan with literal columns; Catalyst
            # folds the constants, plans stay small
            frames = []
            for binding, paths in by_binding.items():
                df = reader.load(paths)
                for key, value in binding:
                    df = df.withColumn(key, F.lit(value))
                frames.append(df)
            out = frames[0]
            for frame in frames[1:]:
                out = out.unionByName(frame, allowMissingColumns=True)
            return out

        # many partitions: ONE scan over all files + broadcast join on the
        # file path -> bindings mapping (mapping is metadata-sized).
        # input_file_name() returns the Hadoop Path.toUri form — PERCENT-
        # ENCODED — so the mapping side is encoded the same way; otherwise
        # paths with spaces/special chars silently miss the join and get NULL
        # partition columns.
        all_paths = [path for paths in by_binding.values() for path in paths]
        df = reader.load(all_paths).withColumn("__fsql_path", F.input_file_name())
        keys = sorted({k for binding in by_binding for k, _ in binding})
        rows = [
            (_hadoop_uri(path), *[dict(binding).get(k) for k in keys])
            for binding, paths in by_binding.items()
            for path in paths
        ]
        mapping = spark.createDataFrame(rows, ["__fsql_path", *keys])
        return (
            df.join(F.broadcast(mapping), "__fsql_path", "left").drop("__fsql_path")
        )

    def _validate(
        self, parts: list[Partition], fs: FileSystem, fmt: InputFormat
    ) -> tuple[list[Partition], list[ReadFailure]]:
        """Metadata-level per-file validation for lazy_errors mode.

        Parquet: footer readable + projected columns present (mirrors the
        reference's per-file schema-mismatch collection,
        `tests/test_pandasreader.py:41-56`). CSV/JSON: file openable; row-level
        corruption is handled by Spark's PERMISSIVE mode downstream.
        """
        ok: list[Partition] = []
        failures: list[ReadFailure] = []
        for p in parts:
            try:
                resolved = _detect(p.url, fmt)
                if resolved is InputFormat.PARQUET:
                    import pyarrow.parquet as pq

                    with fs.open(p.url, "rb") as fd:
                        names = set(pq.read_schema(fd).names)
                    missing = set(self.columns or []) - names
                    if missing:
                        raise KeyError(f"columns not found in {p.url}: {sorted(missing)}")
                else:
                    with fs.open(p.url, "rb") as fd:
                        fd.read(1)
                ok.append(p)
            except Exception as exc:  # noqa: BLE001 - collected, not swallowed
                failures.append(ReadFailure(p, exc))
        return ok, failures


class PandasReader(DataReader):
    """fsql-parity reader: pandas per file on the driver, 32-thread pool.

    Returns a pandas DataFrame (partition columns appended as strings —
    reference `deser.py:215-217`). Extra kwargs go verbatim to the pandas
    read function (`deser.py:208`), e.g. ``columns=[...]`` for parquet
    projection. xlsx is supported when openpyxl is importable;
    feather/arrow (Arrow IPC) reads via pyarrow.
    """

    def __init__(self, input_format: InputFormat = InputFormat.AUTO, lazy_errors: bool = False, **pdread_kwargs):
        self.input_format = input_format
        self.lazy_errors = lazy_errors
        self.kwargs = pdread_kwargs

    def _read_single(self, partition: Partition, fs: FileSystem, fallback: InputFormat = InputFormat.AUTO):
        # FileNotFound retry once: listing-cache staleness workaround
        # (reference `deser.py:224-230`)
        try:
            return self._read_single_once(partition, fs, fallback)
        except FileNotFoundError:
            return self._read_single_once(partition, fs, fallback)

    def _read_single_once(self, partition: Partition, fs: FileSystem, fallback: InputFormat):
        import pandas as pd

        fmt = self.input_format if self.input_format is not InputFormat.AUTO else fallback
        fmt = _detect(partition.url, fmt)
        with fs.open(partition.url, "rb") as fd:
            if fmt is InputFormat.PARQUET:
                frame = pd.read_parquet(fd, **self.kwargs)
            elif fmt is InputFormat.CSV:
                frame = pd.read_csv(fd, **self.kwargs)
            elif fmt is InputFormat.JSON:
                frame = pd.read_json(fd, lines=True, **self.kwargs)
            elif fmt is InputFormat.XLSX:
                frame = pd.read_excel(fd, engine="openpyxl", **self.kwargs)
            elif fmt is InputFormat.ORC:
                frame = pd.read_orc(fd, **self.kwargs)
            elif fmt is InputFormat.FEATHER:
                frame = pd.read_feather(fd, **self.kwargs)
            else:  # pragma: no cover
                raise ValueError(f"unreadable format: {fmt}")
        for key, value in partition.columns.items():
            frame[key] = value
        return frame

    def read(self, spark, partitions: list[Partition], fs: FileSystem, fmt: InputFormat):
        import pandas as pd

        parts = list(partitions)
        frames: list = []
        failures: list[ReadFailure] = []

        def safe(p: Partition):
            try:
                return self._read_single(p, fs, fallback=fmt), None
            except Exception as exc:  # noqa: BLE001
                return None, ReadFailure(p, exc)

        if parts:
            with ThreadPoolExecutor(min(_POOL_SIZE, len(parts))) as pool:
                outcomes = list(pool.map(safe, parts))
            for frame, failure in outcomes:
                if failure is not None:
                    if not self.lazy_errors:
                        raise failure.error
                    failures.append(failure)
                else:
                    frames.append(frame)
        data = pd.concat(frames, ignore_index=True) if frames else pd.DataFrame()
        return (data, failures) if self.lazy_errors else data


class EnumeratedDictReader(DataReader):
    """Whole-file JSON -> dict merged with partition cols; result keyed by the
    deterministic (sorted-listing) file order — reference `deser.py:240-270`."""

    def __init__(self, lazy_errors: bool = False):
        self.lazy_errors = lazy_errors

    def read(self, spark, partitions: list[Partition], fs: FileSystem, fmt: InputFormat):
        datas: list[dict] = []
        failures: list[ReadFailure] = []
        for p in partitions:
            try:
                with fs.open(p.url, "rb") as fd:
                    payload = json.load(fd)
                datas.append({**payload, **p.columns})
            except Exception as exc:  # noqa: BLE001
                if not self.lazy_errors:
                    raise
                failures.append(ReadFailure(p, exc))
        result = dict(enumerate(datas))
        return (result, failures) if self.lazy_errors else result


@dataclass
class FileInPartition:
    """One discovered file + its partition bindings — the "fancy ls" record
    (reference `deser.py:273-303`)."""

    file_url: str
    partition_values: dict[str, str]
    fs: FileSystem

    def consume(self, fd_consumer: Callable[[io.IOBase], Any]) -> Any:
        """Open the file and apply ``fd_consumer``; one retry on
        FileNotFoundError (listing-cache staleness, reference
        `deser.py:224-230`)."""
        try:
            with self.fs.open(self.file_url, "rb") as fd:
                return fd_consumer(fd)
        except FileNotFoundError:
            with self.fs.open(self.file_url, "rb") as fd:
                return fd_consumer(fd)


class IdentityReader(DataReader):
    """No data I/O: return FileInPartition records (reference `deser.py:273-303`)."""

    def read(self, spark, partitions: list[Partition], fs: FileSystem, fmt: InputFormat):
        return [FileInPartition(p.url, dict(p.columns), fs) for p in partitions]


class ListingReader(DataReader):
    """Spark-native fancy-ls: a small DataFrame of (path, partition cols) —
    feed selected paths back into ``spark.read`` to consume."""

    def read(self, spark, partitions: list[Partition], fs: FileSystem, fmt: InputFormat):
        parts = list(partitions)
        keys = sorted({k for p in parts for k in p.columns})
        rows = [(fs.spark_url(p.url), *[p.columns.get(k) for k in keys]) for p in parts]
        return spark.createDataFrame(rows, ["path", *keys]) if rows else spark.createDataFrame(
            [], StructType()
        )


SPARK_READER = SparkReader()
PANDAS_READER = PandasReader()
ENUMERATED_DICT_READER = EnumeratedDictReader()
IDENTITY_READER = IdentityReader()
