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
@given(
    keys=st.lists(st.integers(min_value=0, max_value=10_000), min_size=1, max_size=60, unique=True),
    w0=st.sampled_from([0.0, 0.25, 1.0, 2.5]),
    w1=st.sampled_from([0.5, 1.0, 3.0]),
)
def test_replicate_by_weight_matches_python_model(spark, keys, w0, w1):
    """(key, epoch) multiset == the python model: floor(w) full epochs plus
    a hash-thresholded fractional epoch per stratum; strata outside the
    weight map never appear."""
    from fsql_spark.operators import replicate_by_weight

    rows = [(v, "s" + str(v % 3)) for v in keys]  # stratum s2 unlisted
    df = spark.createDataFrame(rows, "key long, src string")
    weights = {"s0": w0, "s1": w1}
    got = sorted(
        (r["key"], r["epoch"])
        for r in replicate_by_weight(df, "key", "src", weights).collect()
    )
    want = []
    for v, s in rows:
        w = weights.get(s)
        if w is None:
            continue
        full = int(w)
        frac = w - full  # always < 1.0: the keep-all branch is unreachable here
        thresh = format(int(frac * 2**32), "08x")
        copies = full + (
            1 if hashlib.md5(str(v).encode()).hexdigest()[:8] < thresh else 0
        )
        want.extend((v, e) for e in range(copies))
    assert got == sorted(want)


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


@PROP
@given(corpus=corpus_strategy, top_k=st.integers(min_value=1, max_value=4))
def test_unigram_lm_matches_python_model(spark, corpus, top_k):
    """Model + scoring vs pure Python on arbitrary corpora: top-K cut ties,
    all-OOV docs, empty docs (no tf rows — absent from the output, like the
    SQL oracle), single-token vocabularies."""
    import math

    from fsql_spark.operators.lm import doc_cross_entropy, unigram_model

    counts = Counter(t for toks in corpus for t in toks)
    df = _mk_docs(spark, corpus)
    model, oov_lp, total_tf, vocab_size = unigram_model(df, top_k=top_k)

    assert total_tf == sum(counts.values())
    assert vocab_size == min(top_k, len(counts))
    denom = total_tf + vocab_size + 1
    kept = dict(sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:top_k])
    exp_model = {w: math.log((c + 1) / denom) for w, c in kept.items()}
    got_model = {r["token"]: r["logprob"] for r in model.collect()}
    assert got_model.keys() == exp_model.keys()
    for w in exp_model:
        assert abs(got_model[w] - exp_model[w]) < 1e-12
    assert abs(oov_lp - math.log(1 / denom)) < 1e-12

    got = {r["doc_id"]: r for r in doc_cross_entropy(df, model, oov_lp).collect()}
    for i, toks in enumerate(corpus):
        if not toks:
            assert i not in got  # no tokens -> no tf rows -> no score row
            continue
        lps = [exp_model.get(t, oov_lp) for t in toks]
        ce = -sum(lps) / len(lps)
        assert got[i]["n_tokens"] == len(toks)
        assert got[i]["n_oov"] == sum(1 for t in toks if t not in exp_model)
        assert abs(got[i]["cross_entropy"] - ce) < 1e-9


@PROP
@given(corpus=corpus_strategy)
def test_gopher_rules_match_python_model(spark, corpus):
    """Rule booleans vs pure Python on arbitrary corpora (incl. empty docs:
    every band rule is False on zero tokens, passes False)."""
    from fsql_spark.operators import quality_filter

    got = {r["doc_id"]: r for r in quality_filter(_mk_docs(spark, corpus)).collect()}
    for i, toks in enumerate(corpus):
        n = len(toks)
        if n == 0:
            assert not got[i]["r_word_count"] and not got[i]["passes"]
            continue
        awl = sum(len(t) for t in toks) / n
        want = {
            "r_word_count": 20 <= n <= 90,
            "r_word_len": 2.5 <= awl <= 7.0,
            "r_stopword": "a" in toks or "the" in toks,
            "r_repetition": len(set(toks)) / n >= 0.3,
        }
        for k, v in want.items():
            assert bool(got[i][k]) == v, (i, k, toks)
        assert bool(got[i]["passes"]) == all(want.values())


@PROP
@given(
    assign=st.lists(st.integers(min_value=0, max_value=2), min_size=1, max_size=24),
    data=st.data(),
)
def test_rollup_merge_matches_python_model(spark, tmp_path_factory, assign, data):
    """The incremental rollup over ANY disjoint batch assignment equals a
    pure-Python single-pass aggregate (counts exact; sums to merge-order
    float noise) — the mergeable-partials invariant as a property, not just
    the fixed mod-3/mod-4 splits."""
    import datetime as dt
    from collections import defaultdict

    from fsql_spark.operators.rollup import read_rollup, update_rollup

    base = dt.datetime(2024, 1, 1)
    rows = []
    for i, b in enumerate(assign):
        ts = base + dt.timedelta(minutes=7 * i)
        key = "k" + str(i % 2)
        val = float(data.draw(st.integers(min_value=-50, max_value=50), label=f"v{i}"))
        rows.append((i, b, ts, key, val))

    want: dict = defaultdict(lambda: [0, 0.0])
    for _i, _b, ts, key, val in rows:
        hour = ts.replace(minute=0, second=0, microsecond=0)
        agg = want[(hour, key)]
        agg[0] += 1
        agg[1] += val

    df = spark.createDataFrame(
        [(r[0], r[1], r[2], r[3], r[4]) for r in rows],
        "id long, b int, ts timestamp, event_type string, value double",
    )
    url = str(tmp_path_factory.mktemp("rollup_prop") / "t")
    for b in range(3):
        batch = df.where(df.b == b)
        update_rollup(spark, batch, url)

    got = {
        (r["hour_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in read_rollup(spark, url).collect()
    }
    assert got.keys() == set(want.keys())
    for k, (n, s) in want.items():
        assert got[k][0] == n
        assert abs(got[k][1] - s) < 1e-9


@PROP
@given(corpus=corpus_strategy)
def test_bm25_matches_python_model(spark, corpus):
    """bm25_scores == the textbook Okapi formula computed in pure Python on
    arbitrary corpora (empty docs, all-query-term docs, dup classes)."""
    import math

    from fsql_spark.operators.retrieval import bm25_scores

    terms, k1, b = ["a", "ccc"], 1.2, 0.75
    docs = [(i, " ".join(toks)) for i, toks in enumerate(corpus)]
    dls = {i: len([t for t in text.split(" ") if t != ""]) for i, text in docs}
    n, total = len(docs), sum(dls.values())
    tf = {(i, t): [x for x in text.split(" ") if x != ""].count(t)
          for i, text in docs for t in terms}
    dfs = {t: sum(1 for i, _ in docs if tf[(i, t)] > 0) for t in terms}
    avgdl = total / n
    want = {}
    for (i, t), f in tf.items():
        if f == 0:
            continue
        idf = math.log((n - dfs[t] + 0.5) / (dfs[t] + 0.5) + 1.0)
        want[(i, t)] = (f, round(idf * (f * (k1 + 1.0)) / (f + k1 * (1.0 - b + b * dls[i] / avgdl)), 4))
    got = {
        (r.doc_id, r.term): (r.tf, r.score_bm25)
        for r in bm25_scores(
            spark.createDataFrame(docs, "doc_id long, text string"), terms, k1=k1, b=b
        ).collect()
    }
    assert got.keys() == want.keys()
    for key, (f, s) in want.items():
        assert got[key][0] == f
        assert abs(got[key][1] - s) < 1e-9, (key, got[key], (f, s))


@PROP
@given(
    events=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=4),   # user
            st.integers(min_value=0, max_value=20),  # seconds
            st.sampled_from(["view", "click", "purchase", "other"]),
        ),
        min_size=1,
        max_size=24,
    )
)
def test_funnel_matches_python_simulation(spark, events, tmp_path_factory):
    """q_events_funnel == a per-user forward simulation: a stage counts
    iff an event of its type occurs STRICTLY AFTER some event that
    completed the previous stage (ties broken by insertion order)."""
    import pandas as pd

    from fsql_spark.relational import q_events_funnel

    want = {"1_view": 0, "2_click_after_view": 0, "3_purchase_after_click": 0}
    by_user = {}
    for eid, (u, s, et) in enumerate(events):
        by_user.setdefault(u, []).append((s, eid, et))
    for u, evs in by_user.items():
        evs.sort()
        r1 = r2 = r3 = False
        seen_view = seen_click_after = False
        for _, _, et in evs:
            if et == "purchase" and seen_click_after:
                r3 = True
            if et == "click" and seen_view:
                r2 = True
                seen_click_after = True
            if et == "view":
                r1 = True
                seen_view = True
        want["1_view"] += r1
        want["2_click_after_view"] += r2
        want["3_purchase_after_click"] += r3

    pdf = pd.DataFrame(
        [(u, s, eid, et) for eid, (u, s, et) in enumerate(events)],
        columns=["user_id", "s", "event_id", "event_type"],
    )
    pdf["ts"] = pd.to_datetime("2024-01-01") + pd.to_timedelta(pdf.pop("s"), unit="s")
    pdf["value"] = 1.0
    pdf["props"] = "{}"
    sf = str(tmp_path_factory.mktemp("funnel"))
    spark.createDataFrame(pdf).coalesce(1).write.parquet(f"{sf}/events.parquet")
    got = {r.stage: r.n_users for r in q_events_funnel(spark, sf).collect()}
    assert got == want


@PROP
@given(
    events=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=4),   # user
            st.integers(min_value=0, max_value=35),  # day offset (~5 ISO weeks)
        ),
        min_size=1,
        max_size=24,
    )
)
def test_cohort_retention_matches_python_model(spark, events, tmp_path_factory):
    """q_events_cohort_retention == a Python model over Monday-start ISO
    weeks: cohort = week of the user's first event; one distinct user per
    (cohort, week offset) cell."""
    import datetime as dt

    import pandas as pd

    from fsql_spark.relational import q_events_cohort_retention

    base = dt.date(2024, 1, 1)  # a Monday: day offsets map cleanly to weeks
    week_of = lambda d: d - dt.timedelta(days=d.weekday())  # noqa: E731
    first = {}
    for u, off in events:
        d = base + dt.timedelta(days=off)
        first[u] = min(first.get(u, d), d)
    cells = set()
    for u, off in events:
        d = base + dt.timedelta(days=off)
        cw = week_of(first[u])
        cells.add((u, cw, (week_of(d) - cw).days // 7))
    want = {}
    for _, cw, woff in cells:
        want[(str(cw), woff)] = want.get((str(cw), woff), 0) + 1

    pdf = pd.DataFrame(
        [(u, off) for u, off in events], columns=["user_id", "off"]
    )
    pdf["ts"] = pd.to_datetime("2024-01-01") + pd.to_timedelta(pdf.pop("off"), unit="D")
    pdf["event_id"] = range(len(pdf))
    pdf["event_type"] = "view"
    pdf["value"] = 1.0
    pdf["props"] = "{}"
    sf = str(tmp_path_factory.mktemp("cohort"))
    spark.createDataFrame(pdf).coalesce(1).write.parquet(f"{sf}/events.parquet")
    got = {
        (str(r.cohort_week), r.week_offset): r.n_active_users
        for r in q_events_cohort_retention(spark, sf).collect()
    }
    assert got == want


@PROP
@given(
    frames=st.lists(st.integers(min_value=0, max_value=255), min_size=1, max_size=40),
    min_diff=st.integers(min_value=1, max_value=600),
)
def test_keyframes_match_numpy_model(spark, frames, min_diff):
    """select_keyframes == the definition: frame 0 plus every frame whose
    summed |luma diff| from the previous frame >= min_diff — on arbitrary
    constant-frame videos (2x2, so diff = 4*|delta|)."""
    import numpy as np
    import pandas as pd

    from fsql_spark.operators.multimodal import select_keyframes
    from fsql_spark.operators.video import encode_y4m

    arr = np.stack([np.full((2, 2), v, dtype=np.uint8) for v in frames])
    want = {0: 0}
    for i in range(1, len(frames)):
        d = 4 * abs(frames[i] - frames[i - 1])
        if d >= min_diff:
            want[i] = d
    media = spark.createDataFrame(
        pd.DataFrame({"media_id": [1], "content": [bytearray(encode_y4m(arr, fps=(25, 1)))]})
    )
    got = {r.frame_idx: r.diff_energy for r in select_keyframes(media, min_diff=min_diff).collect()}
    assert got == want


@PROP
@given(
    lines=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=6),   # orderkey
            st.integers(min_value=101, max_value=106),  # partkey -> brand 1:1
        ),
        min_size=1,
        max_size=30,
    ),
    support=st.integers(min_value=1, max_value=3),
)
def test_basket_pairs_match_python_model(spark, lines, support, tmp_path_factory):
    """basket_brand_pairs == itertools over per-order DISTINCT brand sets
    with the sampled support threshold — on arbitrary line sets (dup parts
    per order, single-brand baskets). The catalog entry is the same
    function pinned at support=3."""
    from collections import Counter
    from itertools import combinations

    import pandas as pd

    from fsql_spark.relational import basket_brand_pairs

    brands = {p: f"B{p - 100}" for p in range(101, 107)}
    per_order = {}
    for o, p in lines:
        per_order.setdefault(o, set()).add(brands[p])
    cnt = Counter()
    for bs in per_order.values():
        for a, b in combinations(sorted(bs), 2):
            cnt[(a, b)] += 1
    want = {k: v for k, v in cnt.items() if v >= support}

    li = spark.createDataFrame(
        pd.DataFrame(lines, columns=["l_orderkey", "l_partkey"])
    )
    part = spark.createDataFrame(
        pd.DataFrame(sorted(brands.items()), columns=["p_partkey", "p_brand"])
    )
    got = {
        (r.brand_a, r.brand_b): r.n_orders
        for r in basket_brand_pairs(li, part, support=support).collect()
    }
    assert got == want


@PROP
@given(
    stream=st.lists(st.sampled_from(TOKENS + ["zz", "q9"]), min_size=1, max_size=60),
    depth=st.integers(min_value=1, max_value=4),
    width=st.integers(min_value=2, max_value=16),
)
def test_count_min_matches_python_model(spark, stream, depth, width):
    """count_min_cells == the Python CMS on arbitrary streams and grid
    shapes: identical cells, per-row mass conservation, and the
    estimate >= exact guarantee even at width 2 (heavy collisions)."""
    from collections import Counter

    import pandas as pd

    from fsql_spark.operators.sketches import count_min_cells

    exact = Counter(stream)

    def cell(row, tok):
        return int(hashlib.md5(f"{row}:{tok}".encode()).hexdigest()[:15], 16) % width

    want = Counter()
    for tok, n in exact.items():
        for r in range(depth):
            want[(r, cell(r, tok))] += n

    counts = spark.createDataFrame(
        pd.DataFrame({"token": list(exact), "n": [exact[t] for t in exact]})
    )
    got = {
        (r.cms_row, r.cms_cell): r.cell_count
        for r in count_min_cells(counts, "token", "n", depth=depth, width=width).collect()
    }
    assert got == dict(want)
    for tok, n in exact.items():
        assert min(got[(r, cell(r, tok))] for r in range(depth)) >= n


def _lev(a, b):
    m, n = len(a), len(b)
    dp = list(range(n + 1))
    for i in range(1, m + 1):
        prev, dp[0] = dp[0], i
        for j in range(1, n + 1):
            cur = dp[j]
            dp[j] = min(dp[j] + 1, dp[j - 1] + 1, prev + (a[i - 1] != b[j - 1]))
            prev = cur
    return dp[n]


@PROP
@given(
    vocab=st.lists(
        st.text(alphabet="abcx", min_size=1, max_size=6), min_size=1, max_size=14
    ),
    d=st.integers(min_value=1, max_value=2),
)
def test_edit_pairs_match_bruteforce_levenshtein(spark, vocab, d):
    """FastSS deletion-neighborhood blocking is COMPLETE: on arbitrary
    vocabularies the operator returns exactly the brute-force all-pairs
    Levenshtein result for d in {1, 2} — no pair within distance d escapes
    the signature join (soundness of the blocking), and none outside
    survives the exact verify."""
    import itertools

    from fsql_spark.operators.vocab import vocab_edit_distance_pairs

    docs = spark.createDataFrame([(" ".join(vocab),)], "text string")
    got = sorted(
        (r["token_a"], r["token_b"], r["dist"])
        for r in vocab_edit_distance_pairs(docs, "text", max_distance=d).collect()
    )
    canon = sorted(set(vocab), key=lambda t: (len(t), t))
    want = sorted(
        (a, b, _lev(a, b))
        for a, b in itertools.combinations(canon, 2)
        if _lev(a, b) <= d
    )
    assert got == want


@PROP
@given(
    corpus=st.lists(
        st.lists(
            st.text(alphabet="abcd", min_size=1, max_size=7), min_size=0, max_size=10
        ),
        min_size=1,
        max_size=10,
    ),
    k=st.integers(min_value=1, max_value=8),
)
def test_bpe_merges_match_python_reference(spark, corpus, k):
    """bpe_learn_merges == an independent pure-Python BPE trainer on
    arbitrary corpora: same winning pair each round (max count, lex
    tie-break), same left-to-right non-overlapping application, same
    early stop when no pairs remain."""
    from collections import Counter

    from fsql_spark.operators.bpe import bpe_learn_merges

    words = Counter()
    for doc in corpus:
        for w in " ".join(doc).split(" "):
            if w:
                words[tuple(w)] += 1
    want = []
    vocab = dict(words)
    for rank in range(1, k + 1):
        counts = Counter()
        for toks, n in vocab.items():
            for a, b in zip(toks, toks[1:]):
                counts[(a, b)] += n
        if not counts:
            break
        top = max(counts.values())
        best = min(p for p, c in counts.items() if c == top)
        nxt = Counter()
        for toks, n in vocab.items():
            out, i = [], 0
            while i < len(toks):
                if i + 1 < len(toks) and (toks[i], toks[i + 1]) == best:
                    out.append(toks[i] + toks[i + 1])
                    i += 2
                else:
                    out.append(toks[i])
                    i += 1
            nxt[tuple(out)] += n
        vocab = dict(nxt)
        want.append((rank, best[0], best[1], best[0] + best[1], top))

    docs = _mk_docs(spark, corpus)
    got = [
        (r["rank"], r["left"], r["right"], r["merged"], r["pair_n"])
        for r in bpe_learn_merges(docs, "text", num_merges=k).orderBy("rank").collect()
    ]
    assert got == want


@settings(
    max_examples=60,  # the kernel is pure numpy/stdlib — 60 cases run in ~2 s
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(
    h=st.integers(min_value=1, max_value=9),
    w=st.integers(min_value=1, max_value=11),
    channels=st.sampled_from([0, 3, 4]),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
    use_lz77=st.booleans(),
    cache_bits=st.sampled_from([0, 1, 4, 8]),
    transform=st.sampled_from(
        [None, "palette", "meta"] + [("pred", m) for m in range(14)] + ["color"]
    ),
)
def test_webp_roundtrip_property(h, w, channels, seed, use_lz77, cache_bits, transform):
    """encode_webp_lossless |> decode_webp is the identity (modulo the
    documented channel-collapse rules) on arbitrary arrays under every
    option combination — the entire VP8L entropy layer and every
    transform path, driven by hypothesis instead of a fixed matrix."""
    import numpy as np

    from fsql_spark.operators.webp import decode_webp, encode_webp_lossless

    rng = np.random.default_rng(seed)
    shape = (h, w) if channels == 0 else (h, w, channels)
    # palette mode needs <= 256 distinct colors; a small value alphabet
    # also exercises bundling and the color cache harder
    arr = rng.integers(0, 6, shape).astype(np.uint8) * 40
    kw = {"use_lz77": use_lz77, "cache_bits": cache_bits}
    if transform == "palette":
        kw = {"palette": True}
    elif transform == "meta":
        kw["meta_groups"] = 2
    elif transform == "color":
        kw["color_spec"] = (int(rng.integers(256)), int(rng.integers(256)), int(rng.integers(256)))
    elif isinstance(transform, tuple):
        kw["predictor_mode"] = transform[1]
    out = decode_webp(encode_webp_lossless(arr, **kw))
    exp = arr
    if exp.ndim == 3 and exp.shape[2] == 4 and (exp[..., 3] == 255).all():
        exp = exp[..., :3]
    if exp.ndim == 3 and exp.shape[2] == 3 and (exp[..., 0] == exp[..., 1]).all() and (
        exp[..., 1] == exp[..., 2]
    ).all():
        exp = exp[..., 0]
    assert out.shape == exp.shape and (out == exp).all()


@PROP
@given(
    corpus=corpus_strategy,
    threshold=st.sampled_from([0.3, 0.5, 0.8, 0.95, 1.0]),
)
def test_prefix_filter_pairs_match_brute_force(spark, corpus, threshold):
    """Prefix filtering is EXACT: identical pair set + jaccard values to a
    pure-Python all-pairs scan, at any threshold (the tiny alphabet makes
    near-identical sets and exact-1.0 pairs common — the boundary cases
    the float guards exist for)."""
    from fsql_spark.operators import prefix_filter_pairs

    docs = _mk_docs(spark, corpus)
    got = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in prefix_filter_pairs(docs, "doc_id", "text", threshold).collect()
    }
    # engine tokenization: split(text, ' ') — empty text yields the {''}
    # singleton set (the Q_JACCARD_SQL convention), so empty docs pair
    # with each other at jaccard 1.0
    sets = {i: set(" ".join(toks).split(" ")) for i, toks in enumerate(corpus)}
    want = {}
    for a in sets:
        for b in sets:
            if a < b:
                inter = len(sets[a] & sets[b])
                jac = inter / (len(sets[a]) + len(sets[b]) - inter)
                if jac >= threshold:
                    want[(a, b)] = round(jac, 4)
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k] - want[k]) < 1e-9


# --------------------------------------------------------------------------
# sequence analytics: attribution + transitions vs pure-Python replay
# --------------------------------------------------------------------------

events_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),      # user
        st.integers(min_value=0, max_value=50),     # ts seconds (ties likely)
        st.sampled_from(["click", "view", "purchase", "error"]),
        st.integers(min_value=0, max_value=99),     # value cents
    ),
    min_size=1,
    max_size=30,
)


def _mk_events(spark, raw):
    from datetime import datetime, timezone

    rows = [
        (i, datetime(2024, 1, 1, 0, 0, s, tzinfo=timezone.utc), u, t, c / 1.0)
        for i, (u, s, t, c) in enumerate(raw)
    ]
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )


@PROP
@given(raw=events_strategy)
def test_attribution_matches_python_replay(spark, raw):
    """Last-touch attribution == a sequential replay of each user's
    (ts, event_id)-ordered stream carrying the last click/view."""
    from fsql_spark.operators.sequence import last_touch_attribution

    df = _mk_events(spark, raw)
    got = {r["event_id"]: r["channel"] for r in last_touch_attribution(
        df, "user_id", "ts", "event_id", "event_type",
        conversion_type="purchase", touch_types=["click", "view"],
    ).collect()}

    want = {}
    per_user = {}
    for i, (u, s, t, _c) in enumerate(raw):
        per_user.setdefault(u, []).append((s, i, t))
    for u, seq in per_user.items():
        last = None
        for s, i, t in sorted(seq):
            if t == "purchase":
                want[i] = last
            if t in ("click", "view"):
                last = t
    assert got == want


@PROP
@given(raw=events_strategy)
def test_transitions_match_python_replay(spark, raw):
    from collections import Counter

    from fsql_spark.operators.sequence import transition_matrix

    df = _mk_events(spark, raw)
    got = {(r["type"], r["next_type"]): r["n"] for r in transition_matrix(
        df, "user_id", "ts", "event_id", "event_type"
    ).collect()}

    per_user = {}
    for i, (u, s, t, _c) in enumerate(raw):
        per_user.setdefault(u, []).append((s, i, t))
    want = Counter()
    for u, seq in per_user.items():
        ordered = [t for _, _, t in sorted(seq)]
        for a, b in zip(ordered, ordered[1:]):
            want[(a, b)] += 1
    assert got == dict(want)


@PROP
@given(
    corpus=corpus_strategy,
    threshold=st.sampled_from([0.5, 0.95, 1.0]),
    ngram=st.sampled_from([2, 3]),
)
def test_prefix_filter_pairs_match_brute_force_ngrams(spark, corpus, threshold, ngram):
    """Same exactness property on SHINGLE sets (the catalog entry's actual
    configuration): model shingles mirror _word_shingles' chr(1) joiner
    and its short-doc empty-set rule."""
    from fsql_spark.operators import prefix_filter_pairs

    docs = _mk_docs(spark, corpus)
    got = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in prefix_filter_pairs(docs, "doc_id", "text", threshold, ngram=ngram).collect()
    }
    sets = {}
    for i, toks in enumerate(corpus):
        words = " ".join(toks).split(" ")
        if len(words) >= ngram:
            sets[i] = {
                "\x01".join(words[j : j + ngram])
                for j in range(len(words) - ngram + 1)
            }
    want = {}
    for a in sets:
        for b in sets:
            if a < b:
                inter = len(sets[a] & sets[b])
                jac = inter / (len(sets[a]) + len(sets[b]) - inter)
                if jac >= threshold:
                    want[(a, b)] = round(jac, 4)
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k] - want[k]) < 1e-9


# --------------------------------------------------------------------------
# DSIR property test vs an independent pure-Python replay (round 11)
# --------------------------------------------------------------------------

@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    corpus=st.lists(
        st.tuples(
            st.lists(st.sampled_from(["aa", "bb", "cc", "dd", "ee"]),
                     min_size=1, max_size=6),
            st.booleans(),
        ),
        min_size=2, max_size=12,
    ).filter(lambda c: any(t for _, t in c))
)
def test_dsir_scores_match_pure_python(spark, corpus):
    """dsir_logratio_scores == an independent pure-Python DSIR (own
    tokenizer, own md5 bucketing, own Laplace smoothing) on random small
    corpora — llr to 9dp, n_grams exactly."""
    import hashlib
    import math

    import pandas as pd
    from pyspark.sql import functions as F

    from fsql_spark.operators.dsir import dsir_logratio_scores

    B = 32
    docs = spark.createDataFrame(pd.DataFrame({
        "doc_id": list(range(len(corpus))),
        "text": [" ".join(ws) for ws, _ in corpus],
        "is_t": [t for _, t in corpus],
    }))
    got = {r["doc_id"]: (r["n_grams"], round(r["llr"], 9))
           for r in dsir_logratio_scores(docs, "doc_id", "text",
                                         F.col("is_t"), n_buckets=B).collect()}

    def grams(ws):
        return list(ws) + [f"{a} {b}" for a, b in zip(ws, ws[1:])]

    def bucket(g):
        return int(hashlib.md5(g.encode()).hexdigest()[:8], 16) % B

    r_cnt, t_cnt = {}, {}
    for ws, is_t in corpus:
        for g in grams(ws):
            b = bucket(g)
            r_cnt[b] = r_cnt.get(b, 0) + 1
            if is_t:
                t_cnt[b] = t_cnt.get(b, 0) + 1
    R, T = sum(r_cnt.values()), sum(t_cnt.values())
    want = {}
    for i, (ws, _) in enumerate(corpus):
        gs = grams(ws)
        llr = sum(
            math.log((t_cnt.get(bucket(g), 0) + 1.0) / (T + B))
            - math.log((r_cnt.get(bucket(g), 0) + 1.0) / (R + B))
            for g in gs
        )
        want[i] = (len(gs), round(llr, 9))
    assert got == want


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture,
                                 HealthCheck.too_slow])
@given(
    corpus=st.lists(
        st.lists(
            st.text(alphabet="abcd", min_size=1, max_size=7),
            min_size=0, max_size=10,
        ),
        min_size=1, max_size=10,
    ),
)
def test_bpe_apply_oracle_matches_engine_any_corpus(spark, corpus, tmp_path_factory):
    """The 15-round apply/pack oracle (unrolled CTEs) == the engine's
    learn+apply on ARBITRARY corpora — including ones whose merge loop
    dries out before the budget (the ADVICE r11 divergence: an empty
    per-round argmax must pass words through, not empty the corpus).
    DuckDB runs the committed oracle SQL verbatim on the same parquet."""
    import duckdb

    from fsql_spark.operators.bpe import Q_BPE_TOKENIZED_LENGTHS_SQL

    tmp = tmp_path_factory.mktemp("bpe_prop")
    docs = _mk_docs(spark, corpus)
    docs.toPandas().to_parquet(tmp / "documents.parquet", index=False)

    import __spark_entry__ as entry_mod

    got = {
        (r["doc_id"], r["n_words"], r["n_tokens"], r["n_chars"])
        for r in entry_mod.queries()["q_bpe_tokenized_lengths"](
            spark, str(tmp)
        ).collect()
    }
    con = duckdb.connect()
    try:
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM '{tmp}/documents.parquet'"
        )
        want = {tuple(r) for r in con.execute(Q_BPE_TOKENIZED_LENGTHS_SQL).fetchall()}
    finally:
        con.close()
    assert got == want


@settings(max_examples=120, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=12),          # key (dups likely)
            st.lists(st.integers(min_value=-3, max_value=3),  # small-grid vecs
                     min_size=3, max_size=3),
        ),
        min_size=0, max_size=24,
    ),
    tile=st.sampled_from([2, 3, 5, 4096]),
    threshold=st.sampled_from([0.5, 0.9, 0.95]),
)
def test_semdedup_kernel_matches_python_dominance_model(rows, tile, threshold):
    """The r12 tiled-GEMM dominance kernel == an independent O(n^2)
    pure-Python model on arbitrary clusters: duplicate keys, zero-norm
    vectors, any tile size. Model: drop key b iff some STRICTLY smaller
    key a has round-half-away(cos(a,b), 4) >= threshold; zero-norm
    cosines are undefined and never trigger."""
    import math

    import pandas as pd

    from fsql_spark.operators.similarity import _cluster_dropped_keys

    def cos(a, b):
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        if na == 0.0 or nb == 0.0:
            return None
        return sum(x * y for x, y in zip(a, b)) / (na * nb)

    def r4(x):
        return math.floor(abs(x) * 1e4 + 0.5) / 1e4 * (1 if x >= 0 else -1)

    want = set()
    for kb, vb in rows:
        for ka, va in rows:
            if ka >= kb:
                continue
            c = cos(va, vb)
            if c is not None and r4(c) >= threshold:
                want.add(kb)
                break

    pdf = pd.DataFrame({
        "k": [k for k, _ in rows],
        "v": [[float(x) for x in v] for _, v in rows],
    })
    got = set(_cluster_dropped_keys(threshold, tile=tile)(pdf)["dk"])
    assert got == want
