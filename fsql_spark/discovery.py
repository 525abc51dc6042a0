"""Driver-side partition discovery: crawl + prune for the non-Catalyst paths.

Reproduces the reference's recursive lazy crawl
(``/root/reference/src/fsql/partition_discovery.py:48-90``):

1. if the parser can ``generate()`` candidate segment names, synthesize the
   listing without touching the filesystem (static pruning, zero ``ls``);
2. otherwise list the directory (files/dirs, lexicographically sorted —
   determinism contract, `tests/test_listing_sorted.py`);
3. extend the partition bindings per subdirectory (duplicate key => error,
   `partition.py:15-21`);
4. prune subtrees whose bindings already falsify the query
   (``eval_available`` — the pruning oracle);
5. recurse with ``parser.tail()``; at terminal levels bind/filter files.

Scale positioning: this path is used ONLY where Catalyst cannot do the work —
black-box :class:`~fsql_spark.queries.AtomicQuery` predicates and non-Hive
layouts. It is O(#surviving-partitions) driver work over *metadata*, exactly
like the reference; the data scan that follows is one distributed
``spark.read.load(paths)``. Hive layouts with expressible queries never come
here (Catalyst's ``InMemoryFileIndex`` + ``PruneFileSourcePartitions`` does it
natively). Listing fan-out uses a thread pool per level, mirroring the
reference's noted "parallelisation opportunity" (`partition_discovery.py:71`).
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass, field
from typing import Iterable, Iterator

from .column_parser import ColumnParser
from .fs import FileSystem
from .queries import Query

_LIST_POOL_SIZE = 32  # reference uses a 32-thread fetch pool (`deser.py:153`)


@dataclass
class Partition:
    """A path prefix plus the partition-column bindings accumulated while
    descending (reference `partition.py:10-21`). Terminal partitions point at
    individual files."""

    url: str
    columns: dict[str, str] = field(default_factory=dict)

    def expand_by(self, segment: str, binding: tuple[str, str] | None) -> "Partition":
        columns = dict(self.columns)
        if binding is not None:
            key, value = binding
            if key in columns:
                raise ValueError(f"duplicate key inserted: {key}")
            columns[key] = value
        return Partition(self.url + segment, columns)


def discover_partitions(
    query: Query, parser: ColumnParser, root: Partition, fs: FileSystem
) -> Iterator[Partition]:
    """Yield terminal (file-level) partitions surviving the query."""
    if not root.url.endswith("/"):
        root = Partition(root.url + "/", root.columns)
    yield from _walk(query, parser, root, fs)


def _walk(query: Query, parser: ColumnParser, part: Partition, fs: FileSystem) -> Iterator[Partition]:
    generated = parser.generate()
    if generated is not None:
        if parser.is_terminal_level():
            files, dirs = list(generated), []
        else:
            files, dirs = [], list(generated)
    else:
        try:
            files, dirs = fs.ls(part.url)
        except FileNotFoundError:
            # a GENERATED parent (zero-ls candidate synthesis) may name a
            # partition that holds no data — e.g. a DateRangeGenerator day
            # with no files. Treat as empty instead of crashing; listings of
            # real (listed) parents can't hit this outside delete races.
            files, dirs = [], []
        # Spark/Hive convention: metadata paths (_spark_metadata, _SUCCESS,
        # .crc, ...) are invisible to table readers
        files = [f for f in files if not f.startswith(("_", "."))]
        dirs = [d for d in dirs if not d.startswith(("_", "."))]

    survivors = []
    for d in dirs:
        child = part.expand_by(d + "/", parser.parse(d))
        if query.eval_available(child.columns):
            survivors.append(child)

    if len(survivors) > 1:
        with ThreadPoolExecutor(min(_LIST_POOL_SIZE, len(survivors))) as pool:
            subtrees = list(
                pool.map(lambda c: list(_walk(query, parser.tail(c.columns), c, fs)), survivors)
            )
        for subtree in subtrees:
            yield from subtree
    else:
        for child in survivors:
            yield from _walk(query, parser.tail(child.columns), child, fs)

    if parser.is_terminal_level():
        if parser.parses_filenames():
            for f in files:
                candidate = part.expand_by(f, parser.parse(f))
                if query.eval_all(candidate.columns):
                    yield candidate
        elif query.eval_all(part.columns):
            for f in files:
                yield part.expand_by(f, None)
