"""Golden-fixture BPE checks past the unrolled-oracle budget (round-12
item 6, the FLAC-fixture pattern).

The DuckDB oracle exactly checks the engine at <= 15 merges (the unroll
cap, operators/bpe.py). These fixtures extend the EXACT check to a
256-merge budget: tools/bpe_fixture_gen.py — an independent naive BPE
trainer + sequential tokenizer with zero fsql_spark imports — produced the
committed merge tables and tokenized-lengths hashes, and the engine must
reproduce them bit-for-bit.

Two corpora: the pinned driver corpus (31-word vocab, merge closure at 89
— the budget>closure dry-out path) and a committed 3000-word synthetic
corpus whose closure exceeds 256 (the full-budget path with a deep merge
hierarchy, Catalyst replace chain 256 expressions long).
"""

from __future__ import annotations

import hashlib
import json
import os

import pytest

FIXDIR = os.path.join(os.path.dirname(__file__), "fixtures", "bpe")


def _load(name):
    with open(os.path.join(FIXDIR, name)) as f:
        return json.load(f)


def _engine_check(spark, corpus_path: str, fixture: dict) -> None:
    from pyspark.sql import functions as F

    from fsql_spark.operators.bpe import bpe_apply_merges, bpe_learn_merges

    docs = spark.read.parquet(corpus_path)
    budget = fixture["num_merges_requested"]
    learned = bpe_learn_merges(docs, "text", num_merges=budget).orderBy("rank").collect()
    got_merges = [[r["rank"], r["left"], r["right"], r["merged"], r["pair_n"]]
                  for r in learned]
    assert got_merges == fixture["merges"]

    counts = bpe_apply_merges(
        docs, [(r["left"], r["right"]) for r in learned]
    ).collect()
    assert len(counts) == fixture["n_docs"]
    h = hashlib.sha256()
    rows = sorted(
        (str(r["doc_id"]), r["n_words"], r["n_tokens"], r["n_chars"])
        for r in counts
    )
    for row in rows:
        h.update(("%s,%d,%d,%d\n" % row).encode())
    assert h.hexdigest() == fixture["lengths_sha256"]


def test_bpe_256_budget_driver_corpus_dry_out(spark):
    """Driver corpus: budget 256, closure 89 — the engine must learn the
    COMPLETE merge table and stop, and the 89-merge apply must match the
    independent tokenizer's per-doc lengths exactly."""
    fx = _load("sf001_merges256.json")
    assert len(fx["merges"]) == 89  # the corpus's full merge closure
    _engine_check(spark, "/root/testdata/sf0.01/documents.parquet", fx)


def test_bpe_256_budget_full_hierarchy(spark):
    """Synthetic 3000-word corpus: all 256 budgeted merges learnable —
    learn + a 256-expression replace-chain apply, pinned to the
    independent trainer/tokenizer."""
    fx = _load("synth_merges256.json")
    assert len(fx["merges"]) == 256
    _engine_check(spark, os.path.join(FIXDIR, "synth_corpus.parquet"), fx)
