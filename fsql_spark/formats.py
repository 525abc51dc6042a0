"""Input format detection and Spark reader-option mapping.

Reference: ``InputFormat`` (``/root/reference/src/fsql/deser.py:78-95``) —
format from URL suffix (json / parquet / csv / xlsx), fixed override possible,
unknown suffix => KeyError, AUTO surviving to read time => ValueError.

Semantics carried over: ``json`` means JSON-LINES for tabular reads
(`deser.py:180-182`), which is exactly Spark's native JSON source. ``xlsx``
has no distributed Spark source; it is read via pandas on the driver
(`readers.py`) — same execution shape as the reference.
"""

from __future__ import annotations

from enum import Enum


class InputFormat(Enum):
    AUTO = "auto"
    PARQUET = "parquet"
    CSV = "csv"
    JSON = "json"
    XLSX = "xlsx"
    # EXTENSION beyond the reference's suffix set (`deser.py:78-95`): the
    # driver's stated target is "Spark SQL over Parquet/ORC partitions" —
    # ORC is a first-class columnar Spark source (vectorized reader,
    # predicate pushdown, partition pruning), one enum entry here.
    ORC = "orc"
    # EXTENSION: Arrow IPC / Feather V2 — the interchange file pipelines
    # hand around between Arrow-native tools. No distributed Spark source
    # (like xlsx); reads via pandas/pyarrow on the driver thread pool.
    FEATHER = "feather"

    @classmethod
    def from_url(cls, url: str) -> "InputFormat":
        # EXTENSION beyond the reference (`deser.py:78-95`): compression
        # suffixes are transparent — `events.json.gz` / `docs.csv.zst` etc.
        # detect as their inner format (Spark's text sources decompress by
        # file extension natively; crawl dumps arrive compressed). Unknown
        # suffixes keep the reference's KeyError semantics.
        name = url.rsplit("/", 1)[-1].lower()
        parts = name.split(".")
        while len(parts) > 1 and parts[-1] in _COMPRESSION_SUFFIXES:
            parts.pop()
        suffix = parts[-1]
        try:
            return _SUFFIXES[suffix]
        except KeyError:
            raise KeyError(f"cannot detect input format from url suffix: {url}")

    def spark_format(self) -> str:
        if self is InputFormat.AUTO:
            raise ValueError("AUTO format must be resolved before reading")
        if self in (InputFormat.XLSX, InputFormat.FEATHER):
            raise ValueError(
                f"{self.value} has no distributed source; use the pandas reader"
            )
        return self.value

    def spark_options(self) -> dict[str, str]:
        """Options aligning Spark's readers with the reference's pandas
        defaults (header row + dtype inference for csv)."""
        if self is InputFormat.CSV:
            return {"header": "true", "inferSchema": "true"}
        return {}


_SUFFIXES = {
    "parquet": InputFormat.PARQUET,
    "pq": InputFormat.PARQUET,
    "csv": InputFormat.CSV,
    "json": InputFormat.JSON,
    "jsonl": InputFormat.JSON,  # JSON-lines IS the tabular json semantics
    "xlsx": InputFormat.XLSX,
    "orc": InputFormat.ORC,
    "feather": InputFormat.FEATHER,
    "arrow": InputFormat.FEATHER,  # Arrow IPC file == Feather V2
}

#: codecs Spark's text sources (csv/json) decompress transparently by
#: extension; stripped before format detection
_COMPRESSION_SUFFIXES = {"gz", "gzip", "bz2", "zst", "zstd", "deflate", "lz4"}
