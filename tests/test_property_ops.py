"""Property tests (hypothesis): the hash-deterministic operators must equal
an independent pure-Python model on arbitrary corpora — not just on the
fixtures the oracle entries use. Few examples, whole-corpus cases: each
example is one Spark job, so the budget goes to input diversity (empty
docs, dup classes, short-vs-k docs), not example count."""

from __future__ import annotations

import hashlib
from collections import Counter, defaultdict

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

TOKENS = ["a", "bb", "ccc", "the", "x1"]

# a corpus: up to 12 docs, each up to 12 tokens (possibly empty); dup
# classes arise naturally from the tiny alphabet
corpus_strategy = st.lists(
    st.lists(st.sampled_from(TOKENS), min_size=0, max_size=12),
    min_size=1,
    max_size=12,
)

PROP = settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)


def _mk_docs(spark, corpus):
    rows = [(i, " ".join(toks)) for i, toks in enumerate(corpus)]
    return spark.createDataFrame(rows, "doc_id long, text string")


@PROP
@given(corpus=corpus_strategy, k=st.integers(min_value=2, max_value=4))
def test_duplicated_passages_matches_python_model(spark, corpus, k):
    from fsql_spark.operators import duplicated_passages

    # model: k-token windows over the SPLIT-BY-SPACE token list (an empty
    # string splits to [''], exactly like Spark's split)
    per_passage_docs = defaultdict(set)
    per_passage_occ = Counter()
    for i, toks in enumerate(corpus):
        toks = " ".join(toks).split(" ")
        for j in range(len(toks) - k + 1):
            p = " ".join(toks[j : j + k])
            per_passage_docs[p].add(i)
            per_passage_occ[p] += 1
    want = {
        p: (len(d), per_passage_occ[p])
        for p, d in per_passage_docs.items()
        if len(d) >= 2
    }
    got = {
        r["passage"]: (r["n_docs"], r["n_occurrences"])
        for r in duplicated_passages(_mk_docs(spark, corpus), "doc_id", "text", k=k).collect()
    }
    assert got == want


@PROP
@given(corpus=corpus_strategy, seed=st.integers(min_value=0, max_value=99))
def test_shuffle_matches_python_md5_rank(spark, corpus, seed):
    from fsql_spark.operators import shuffle_deterministic

    df = _mk_docs(spark, corpus)
    got = {
        r["doc_id"]: r["shuffle_pos"]
        for r in shuffle_deterministic(df, "doc_id", seed=seed).collect()
    }
    order = sorted(
        range(len(corpus)),
        key=lambda i: (hashlib.md5(f"{i}-{seed}".encode()).hexdigest(), i),
    )
    want = {doc: pos + 1 for pos, doc in enumerate(order)}
    assert got == want


@PROP
@given(
    keys=st.lists(st.integers(min_value=0, max_value=10_000), min_size=1, max_size=200, unique=True),
    fraction=st.sampled_from([0.0, 0.25, 0.5, 1.0]),
)
def test_hash_fraction_sample_matches_python_model(spark, keys, fraction):
    from fsql_spark.operators import hash_fraction_sample

    df = spark.createDataFrame([(v,) for v in keys], "key long")
    got = sorted(r["key"] for r in hash_fraction_sample(df, "key", fraction=fraction).collect())
    thresh = "g" if fraction >= 1.0 else format(int(fraction * 2**32), "08x")
    want = sorted(v for v in keys if hashlib.md5(str(v).encode()).hexdigest()[:8] < thresh)
    assert got == want


@PROP
@given(keys=st.lists(st.integers(min_value=0, max_value=10_000), min_size=1, max_size=200, unique=True))
def test_split_by_hash_matches_python_model(spark, keys):
    from fsql_spark.operators import split_by_hash

    df = spark.createDataFrame([(v,) for v in keys], "key long")
    got = {r["key"]: r["split"] for r in split_by_hash(df, "key", {"train": 0.9, "val": 0.05, "test": 0.05}).collect()}
    t90 = format(int(0.9 * 2**32), "08x")
    t95 = format(int(0.95 * 2**32), "08x")

    def model(v):
        h = hashlib.md5(str(v).encode()).hexdigest()[:8]
        return "train" if h < t90 else ("val" if h < t95 else "test")

    assert got == {v: model(v) for v in keys}


@PROP
@given(
    values=st.lists(st.integers(min_value=0, max_value=500), min_size=1, max_size=300),
    k=st.sampled_from([4, 16]),
)
def test_kmv_matches_python_model(spark, values, k):
    from fsql_spark.operators import kmv_distinct

    df = spark.createDataFrame([(v,) for v in values], "v long")
    row = kmv_distinct(df, "v", k=k).collect()[0]
    distinct = sorted({str(v) for v in values}, key=lambda s: (hashlib.md5(s.encode()).hexdigest(), s))
    assert row["n_distinct_exact"] == len(distinct)
    if len(distinct) < k:
        want = float(len(distinct))
    else:
        uk = int(hashlib.md5(distinct[k - 1].encode()).hexdigest()[:15], 16)
        want = round((k - 1) * float(1 << 60) / uk, 4)
    assert row["kmv_estimate"] == want
