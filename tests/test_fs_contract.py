"""Contract tests for the non-local filesystem path, without fsspec installed
(the reference covers this with moto, `/root/reference/tests/conftest.py:28-43`;
here a stub FileSystem exercises the same dispatch, discovery, and config
surfaces).

Also covers the round-2 ADVICE fixes: fast-path mixed-format guard, conf
save/restore, percent-encoded path join, DateRangeQuery.eval_available
leniency, LexRangeQuery wld/missing-column ordering.
"""

from __future__ import annotations

import io

import pytest

from fsql_spark.api import read_partitioned_table, write_table
from fsql_spark.fs import FileSystem, LocalFileSystem, get_url_and_fs, s3_spark_conf, set_default_config
from fsql_spark.queries import (
    ColumnComparator,
    ColumnRange,
    DateRangeQuery,
    LexRangeQuery,
    Q_EQ,
    Q_TRUE,
)
from fsql_spark.readers import EnumeratedDictReader, IdentityReader, PandasReader

from .conftest import assert_same


class DictFileSystem(FileSystem):
    """In-memory stub FS: {path: bytes} with '/'-delimited hierarchy.

    Stands in for any remote object store at the driver-side protocol level
    (ls / isdir / exists / open) — the surface discovery and the whole-file
    readers actually use."""

    def __init__(self, files: dict[str, bytes]):
        self.files = dict(files)
        self.ls_calls: list[str] = []

    def _children(self, url: str) -> tuple[list[str], list[str]]:
        prefix = url if url.endswith("/") else url + "/"
        files, dirs = set(), set()
        for path in self.files:
            if not path.startswith(prefix):
                continue
            rest = path[len(prefix):]
            (dirs if "/" in rest else files).add(rest.split("/", 1)[0])
        return sorted(files), sorted(dirs)

    def ls(self, url: str):
        self.ls_calls.append(url)
        files, dirs = self._children(url)
        if not files and not dirs and not self.exists(url):
            raise FileNotFoundError(url)
        return files, dirs

    def isdir(self, url: str) -> bool:
        return bool(self._children(url.rstrip("/"))[0] or self._children(url.rstrip("/"))[1])

    def exists(self, url: str) -> bool:
        return url in self.files or self.isdir(url)

    def open(self, url: str, mode: str = "rb"):
        if "w" in mode:
            buf = io.BytesIO()
            fsys, path = self, url

            class _W(io.BytesIO):
                def close(self_inner):
                    fsys.files[path] = self_inner.getvalue()
                    super().close()

            return _W()
        if url not in self.files:
            raise FileNotFoundError(url)
        return io.BytesIO(self.files[url])


def _csv(text: str) -> bytes:
    return text.encode()


@pytest.fixture()
def stub_fs():
    return DictFileSystem(
        {
            "bucket/table/c1=1/f1.csv": _csv("a,b\n1,x\n2,y\n"),
            "bucket/table/c1=1/f2.csv": _csv("a,b\n3,z\n"),
            "bucket/table/c1=2/f1.csv": _csv("a,b\n4,w\n"),
        }
    )


def test_protocol_dispatch_requires_fsspec_for_remote():
    # both URL grammars the reference accepts (`__init__.py:28-38`):
    # standard double-slash and fsql-style single-slash
    for url in ("s3://bucket/key", "s3:/bucket/key"):
        with pytest.raises(ValueError, match="fsspec"):
            get_url_and_fs(url)


def test_single_slash_url_parses_path(monkeypatch):
    # with fsspec "installed" (stubbed), the single-slash form must strip the
    # protocol exactly like the reference's partition(':/')
    import fsql_spark.fs as fsmod

    captured = {}

    class _FakeFsspec:
        @staticmethod
        def filesystem(protocol, **config):
            captured["protocol"] = protocol
            captured["config"] = config
            return object()

    monkeypatch.setattr(fsmod, "_HAS_FSSPEC", True)
    monkeypatch.setattr(fsmod, "fsspec", _FakeFsspec, raising=False)
    path, fs = fsmod.get_url_and_fs("s3:/bucket/key")
    assert path == "bucket/key"
    assert captured["protocol"] == "s3"
    path2, _ = fsmod.get_url_and_fs("s3://bucket/key")
    assert path2 == "bucket/key"


def test_explicit_fs_bypasses_dispatch(stub_fs):
    path, fs = get_url_and_fs("bucket/table", fs=stub_fs)
    assert path == "bucket/table"
    assert fs is stub_fs


def test_discovery_and_pandas_reader_over_stub_fs(stub_fs):
    out = read_partitioned_table(
        "bucket/table/", Q_TRUE, data_reader=PandasReader(), fs=stub_fs
    )
    assert sorted(out["a"]) == [1, 2, 3, 4]
    assert set(out["c1"]) == {"1", "2"}  # partition col, strings-only contract
    assert out["c1"].dtype == object


def test_discovery_prunes_subtrees_on_stub_fs(stub_fs):
    out = read_partitioned_table(
        "bucket/table/", Q_EQ("c1", "2"), data_reader=PandasReader(), fs=stub_fs
    )
    assert sorted(out["a"]) == [4]
    # pruning contract: the c1=1 subtree was never listed
    assert not any("c1=1" in u for u in stub_fs.ls_calls)


def test_identity_and_dict_readers_over_stub_fs(stub_fs):
    listing = read_partitioned_table(
        "bucket/table/", Q_TRUE, data_reader=IdentityReader(), fs=stub_fs
    )
    assert {f.file_url for f in listing} == set(stub_fs.files)
    assert all(f.partition_values["c1"] in {"1", "2"} for f in listing)
    # consume() round-trips through the stub's open()
    first = sorted(listing, key=lambda f: f.file_url)[0]
    assert first.consume(lambda fd: fd.read()) == stub_fs.files[first.file_url]

    json_fs = DictFileSystem(
        {
            "b/t/k=1/x.json": b'{"v": 1}',
            "b/t/k=2/y.json": b'{"v": 2}',
        }
    )
    d = read_partitioned_table("b/t/", Q_TRUE, data_reader=EnumeratedDictReader(), fs=json_fs)
    assert d == {0: {"v": 1, "k": "1"}, 1: {"v": 2, "k": "2"}}


def test_s3_spark_conf_endpoint_mapping(monkeypatch):
    monkeypatch.setenv("AWS_ACCESS_KEY_ID", "ak")
    monkeypatch.setenv("AWS_SECRET_ACCESS_KEY", "sk")
    monkeypatch.setenv("AWS_ENDPOINT_URL", "http://minio:9000")
    conf = s3_spark_conf()
    assert conf["spark.hadoop.fs.s3a.access.key"] == "ak"
    assert conf["spark.hadoop.fs.s3a.secret.key"] == "sk"
    assert conf["spark.hadoop.fs.s3a.endpoint"] == "http://minio:9000"
    assert conf["spark.hadoop.fs.s3a.path.style.access"] == "true"
    # programmatic config overrides env (reference set_default_config)
    set_default_config("s3", {"key": "override"})
    try:
        assert s3_spark_conf()["spark.hadoop.fs.s3a.access.key"] == "override"
    finally:
        set_default_config("s3", {})
        import fsql_spark.fs as fsmod

        fsmod._DEFAULT_CONFIGS["s3"].clear()


# --------------------------------------------------------------------------
# ADVICE-fix regressions
# --------------------------------------------------------------------------

def test_fast_path_falls_back_on_mixed_formats(spark, tmp_path):
    """A tree mixing csv+json under Hive dirs must NOT be parsed single-format
    by the fast path; the driver-discovery fallback reads each file with its
    own source (reference per-file dispatch)."""
    root = tmp_path / "mixed"
    (root / "p=1").mkdir(parents=True)
    (root / "p=2").mkdir(parents=True)
    (root / "p=1" / "a.csv").write_text("a,b\n1,x\n")
    (root / "p=2" / "b.json").write_text('{"a": 2, "b": "y"}\n')
    out = read_partitioned_table(str(root), Q_TRUE, spark=spark)
    import pandas as pd

    assert_same(out, pd.DataFrame({"a": [1, 2], "b": ["x", "y"], "p": ["1", "2"]}))


def test_fast_path_restores_caller_conf(spark, tmp_path):
    """The partition-type-inference conf must not leak into the caller's own
    spark.read behavior after a library call."""
    key = "spark.sql.sources.partitionColumnTypeInference.enabled"
    old = spark.conf.get(key)
    spark.conf.set(key, "true")
    try:
        from pyspark.sql import functions as F

        root = tmp_path / "t"
        df = spark.range(3).withColumn("p", (F.col("id") % 2).cast("int"))
        write_table(df, str(root), partition_by=["p"])
        out = read_partitioned_table(str(root), Q_TRUE, spark=spark)
        assert dict(out.dtypes)["p"] == "string"  # library contract: strings
        assert spark.conf.get(key) == "true"  # caller conf untouched
        # the caller's own reads keep inferring types
        own = spark.read.parquet(str(root))
        assert dict(own.dtypes)["p"] == "int"
    finally:
        spark.conf.set(key, old)


def test_broadcast_path_join_handles_spaces(spark, tmp_path):
    """>64 distinct bindings trigger the input_file_name() broadcast join;
    partition values with spaces/specials must still bind (percent-encoding
    fix) with no NULL partition columns."""
    import pandas as pd

    from fsql_spark.readers import _LIT_GROUP_LIMIT

    root = tmp_path / "spacey"
    n = _LIT_GROUP_LIMIT + 3
    for i in range(n):
        d = root / f"k=v {i} +q"  # space and plus in the value
        d.mkdir(parents=True)
        pd.DataFrame({"x": [i]}).to_csv(d / "f.csv", index=False)
    # AtomicQuery forces the driver-discovery path; one scan + path join
    from fsql_spark.queries import AtomicQuery

    out = read_partitioned_table(
        str(root), AtomicQuery(lambda k: True, columns={"k"}), spark=spark
    ).toPandas()
    assert len(out) == n
    assert out["k"].notna().all()
    assert set(out["k"]) == {f"v {i} +q" for i in range(n)}


def test_daterange_eval_available_lenient_on_invalid_dates():
    q = DateRangeQuery("2022/01/01", "2023/01/01")
    # fully-bound but impossible date: both paths agree on non-match
    bad = {"year": "2022", "month": "2", "day": "30"}
    assert q.eval_all(bad) is False
    assert q.eval_available(bad) is False
    # non-numeric binding: same
    assert q.eval_available({"year": "x"}) is False
    # valid partial binding still optimistic
    assert q.eval_available({"year": "2022", "month": "6"}) is True


def test_lexrange_missing_wld_column_early_stops():
    """Reference checks missing-column BEFORE the wld skip (`query.py:161-164`):
    a binding lacking a wld column returns the missing-column verdict."""
    q = LexRangeQuery(
        [
            ColumnRange("a", "1", "3", ColumnComparator.num),
            ColumnRange("w", "0", "0", ColumnComparator.wld),
            ColumnRange("b", "1", "3", ColumnComparator.num),
        ]
    )
    full = {"a": "2", "w": "anything", "b": "2"}
    assert q.eval_all(full) is True
    no_wld = {"a": "1", "b": "2"}  # still tied at min when reaching w
    assert q.eval_all(no_wld) is False  # reference: missing => False
    assert q.eval_available(no_wld) is True  # missing => optimistic
    # strictly inside before reaching the wld column: verdict already made
    inside = {"a": "2"}
    assert q.eval_all(inside) is True
