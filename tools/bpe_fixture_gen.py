"""Golden-fixture generator for the 256-merge BPE check (round-12 item 6).

INDEPENDENT of the engine by construction: no fsql_spark import anywhere —
a from-scratch naive BPE trainer (full pair rescan per round, max-count /
lexicographically-smallest winner) and a from-scratch sequential tokenizer
(merges applied in rank order, each left-to-right non-overlapping), both
straight from the algorithm definition (Sennrich et al. 2016, §3.2), over
the pinned driver corpus. The engine's unrolled-CTE DuckDB oracle exactly
checks budgets <= 15 (materialized-round cost caps the unroll); this
fixture extends the EXACT check to a realistic 256-merge budget the same
way tools/flac_assembler.py arbitrates the FLAC decoder — commit what an
independent implementation says, then pin the engine to it.

Usage:
    python tools/bpe_fixture_gen.py [corpus.parquet] [num_merges] [out.json]

Defaults: /root/testdata/sf0.01/documents.parquet, 256,
tests/fixtures/bpe/sf001_merges256.json
"""

from __future__ import annotations

import hashlib
import json
import sys
from collections import Counter


def train(word_freqs: dict, num_merges: int) -> list:
    """Naive BPE: per round, rescan the whole vocabulary for adjacent-pair
    counts, pick (max count, lexicographically smallest pair), rewrite.
    Returns [(rank, left, right, merged, pair_n), ...]; stops early when
    no adjacent pairs remain."""
    vocab = {tuple(w): n for w, n in word_freqs.items()}
    merges = []
    for rank in range(1, num_merges + 1):
        counts: Counter = Counter()
        for toks, n in vocab.items():
            for a, b in zip(toks, toks[1:]):
                counts[(a, b)] += n
        if not counts:
            break
        top = max(counts.values())
        best = min(p for p, c in counts.items() if c == top)
        merged = best[0] + best[1]
        nxt: Counter = Counter()
        for toks, n in vocab.items():
            out, i = [], 0
            while i < len(toks):
                if i + 1 < len(toks) and (toks[i], toks[i + 1]) == best:
                    out.append(merged)
                    i += 2
                else:
                    out.append(toks[i])
                    i += 1
            nxt[tuple(out)] += n
        vocab = dict(nxt)
        merges.append((rank, best[0], best[1], merged, top))
    return merges


def tokenize(word: str, merges: list) -> list:
    """Apply the learned merges to one word, rank order, each merge
    left-to-right non-overlapping over the whole token string."""
    toks = list(word)
    for _, left, right, merged, _ in merges:
        out, i = [], 0
        while i < len(toks):
            if i + 1 < len(toks) and toks[i] == left and toks[i + 1] == right:
                out.append(merged)
                i += 2
            else:
                out.append(toks[i])
                i += 1
        toks = out
    return toks


def doc_lengths(doc_words: list, tok_counts: dict) -> tuple:
    """(n_words, n_tokens, n_chars) for one document's word list."""
    return (
        len(doc_words),
        sum(tok_counts[w] for w in doc_words),
        sum(len(w) for w in doc_words),
    )


def lengths_sha256(rows: list) -> str:
    """Canonical hash over (doc_id, n_words, n_tokens, n_chars) rows,
    sorted by doc_id, one CSV line each."""
    h = hashlib.sha256()
    for row in sorted(rows):
        h.update(("%s,%d,%d,%d\n" % row).encode())
    return h.hexdigest()


def write_synth_corpus(path: str, n_docs: int = 1000, vocab_size: int = 3000,
                       seed: int = 12) -> None:
    """Deterministic richer-vocab corpus: the driver testdata carries only
    31 distinct words (its merge closure is 89), so a REAL 256-merge
    hierarchy needs a corpus with subword structure. Words are zipf-ranked
    syllable compounds (CV/CVC syllables recombined), giving the nested
    pair statistics a natural-language tokenizer fit sees."""
    import random

    import pandas as pd

    rng = random.Random(seed)
    onsets = list("bcdfghjklmnpqrstvwz")
    vowels = list("aeiou")
    codas = ["", "n", "r", "s", "t", "l", "m", "k"]
    syllables = [o + v + c for o in onsets for v in vowels for c in codas]
    rng.shuffle(syllables)
    vocab = []
    seen = set()
    while len(vocab) < vocab_size:
        w = "".join(rng.choice(syllables) for _ in range(rng.randint(1, 4)))
        if w not in seen:
            seen.add(w)
            vocab.append(w)
    # zipf weights over the shuffled vocab
    weights = [1.0 / (r + 1) for r in range(vocab_size)]
    docs = []
    for d in range(n_docs):
        n_words = rng.randint(40, 160)
        words = rng.choices(vocab, weights=weights, k=n_words)
        docs.append((f"synth-{d:05d}", " ".join(words)))
    pd.DataFrame(docs, columns=["doc_id", "text"]).to_parquet(path, index=False)
    print(f"wrote {path}: {n_docs} docs, {vocab_size} distinct words")


def main() -> None:
    import pandas as pd

    if len(sys.argv) > 1 and sys.argv[1] == "--synth":
        write_synth_corpus(sys.argv[2])
        return

    corpus = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01/documents.parquet"
    num_merges = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    out_path = (
        sys.argv[3]
        if len(sys.argv) > 3
        else "tests/fixtures/bpe/sf001_merges256.json"
    )

    pdf = pd.read_parquet(corpus, columns=["doc_id", "text"])
    word_freqs: Counter = Counter()
    docs = []
    for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
        words = [w for w in (text or "").split(" ") if w]
        if not words:
            continue
        docs.append((doc_id, words))
        word_freqs.update(words)

    merges = train(word_freqs, num_merges)
    tok_counts = {w: len(tokenize(w, merges)) for w in word_freqs}
    rows = [(str(doc_id), *doc_lengths(words, tok_counts)) for doc_id, words in docs]

    fixture = {
        "corpus": corpus,
        "num_merges_requested": num_merges,
        "merges": [list(m) for m in merges],
        "n_docs": len(rows),
        "lengths_sha256": lengths_sha256(rows),
        "generator": "tools/bpe_fixture_gen.py (independent naive BPE)",
    }
    with open(out_path, "w") as f:
        json.dump(fixture, f, indent=1)
    print(
        f"wrote {out_path}: {len(merges)} merges, {len(rows)} docs, "
        f"hash {fixture['lengths_sha256'][:16]}…"
    )


if __name__ == "__main__":
    main()
