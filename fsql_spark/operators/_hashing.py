"""Vectorized (numpy) signature kernels for SimHash / MinHash.

Why not pure Column expressions: a 64-bit-majority SimHash needs 64
array passes per row — the expression tree blows past the whole-stage-codegen
method limit and Spark falls back to interpreted evaluation (measured ~7 s for
5k docs). An Arrow-batched pandas_udf with flat-token numpy kernels does the
same work in milliseconds per batch; the Arrow transfer of the text column is
the only overhead, amortized across all signatures at once.

Hashes here are deterministic FNV-1a(64) + splitmix64 seed mixing — stable
across runs, batch sizes, and cluster layouts (signature algorithms only need
internal consistency, not cross-engine parity).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

_FNV_OFFSET = np.uint64(0xCBF29CE484222325)
_FNV_PRIME = np.uint64(0x100000001B3)
_SHIFTS = np.arange(64, dtype=np.uint64)
_WEIGHTS = (np.uint64(1) << _SHIFTS)


def fnv1a64(tokens: list[str]) -> np.ndarray:
    """Vectorized FNV-1a over a flat token list: pad to a byte matrix and
    fold position-wise (max-token-length iterations, each fully vectorized)."""
    if not tokens:
        return np.empty(0, np.uint64)
    encoded = [t.encode("utf-8") for t in tokens]
    lens = np.fromiter((len(b) for b in encoded), np.int64, len(encoded))
    maxlen = int(lens.max()) if len(lens) else 0
    # mask-scatter the concatenated byte stream instead of a per-token row
    # fill loop: the boolean mask enumerates ragged positions in row-major
    # order, exactly the order b"".join lays the bytes out (0.22s -> 0.03s
    # for 270k tokens)
    mat = np.zeros((len(encoded), maxlen), np.uint8)
    mat[np.arange(maxlen) < lens[:, None]] = np.frombuffer(b"".join(encoded), np.uint8)
    with np.errstate(over="ignore"):
        h = np.full(len(encoded), _FNV_OFFSET, np.uint64)
        for p in range(maxlen):
            active = lens > p
            h[active] = (h[active] ^ mat[active, p].astype(np.uint64)) * _FNV_PRIME
    return h


def _splitmix64(x: np.ndarray) -> np.ndarray:
    with np.errstate(over="ignore"):
        x = x + np.uint64(0x9E3779B97F4A7C15)
        x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return x ^ (x >> np.uint64(31))


def _flat_tokens(texts: pd.Series, ngram: int) -> tuple[list[str], np.ndarray]:
    """All docs' shingles flattened + per-doc counts (ngram>1 => word n-grams)."""
    counts = np.empty(len(texts), np.int64)
    flat: list[str] = []
    for j, t in enumerate(texts):
        words = t.split(" ") if isinstance(t, str) else []
        if ngram > 1:
            toks = ["\x01".join(words[i : i + ngram]) for i in range(max(0, len(words) - ngram + 1))]
        else:
            toks = words
        counts[j] = len(toks)
        flat.extend(toks)
    return flat, counts


def simhash_batch(texts: pd.Series, ngram: int = 1) -> pd.Series:
    """64-bit frequency-weighted SimHash per doc, one vectorized pass."""
    flat, counts = _flat_tokens(texts, ngram)
    h = fnv1a64(flat)
    # bit-expand via unpackbits on the little-endian byte view, NOT
    # (h[:, None] >> _SHIFTS) & 1: the broadcast form materializes three
    # (T, 64) uint64/int64 temporaries and measured ~10s for 270k tokens on
    # this host vs 0.33s for unpackbits (bit-exact equal; the astype('<u8')
    # is a no-op copy-guard on little-endian hosts)
    bits = np.unpackbits(
        h.astype("<u8", copy=False).view(np.uint8).reshape(-1, 8),
        axis=1, bitorder="little",
    )  # (T, 64) uint8
    offsets = np.zeros(len(counts), np.int64)
    np.cumsum(counts[:-1], out=offsets[1:])
    # reduceat needs nonempty segments: guard zero-token docs
    safe_offsets = np.minimum(offsets, max(len(flat) - 1, 0))
    # segment-sum the TRANSPOSED (64, T) int32 matrix along axis=1: the
    # row-major axis=0 reduceat strides 64 columns per step (0.34s) while
    # contiguous per-bit rows stream at memory speed (0.067s measured);
    # int32 because this host's int64 widening of large arrays is ~250x
    # slower (6.3s vs 0.024s for the same astype) — safe: a 2^30-token doc
    # in ONE Arrow batch would need >4 GB in a single row
    if len(flat):
        sums = np.add.reduceat(bits.T.astype(np.int32), safe_offsets, axis=1).T
    else:
        sums = np.zeros((len(counts), 64), np.int32)
    sums[counts == 0] = 0
    maj = (sums.astype(np.int64) * 2) > counts[:, None]
    sig = (maj.astype(np.uint64) * _WEIGHTS).sum(axis=1, dtype=np.uint64)
    return pd.Series(sig.view(np.int64))


def minhash_batch(texts: pd.Series, num_hashes: int, ngram: int) -> pd.Series:
    """k-minhash signature per doc (array<long>), vectorized: one FNV pass,
    k seed mixes, segmented min."""
    flat, counts = _flat_tokens(texts, ngram)
    base = fnv1a64(flat)
    seeds = _splitmix64(np.arange(1, num_hashes + 1, dtype=np.uint64) * np.uint64(0x9E3779B97F4A7C15))
    offsets = np.zeros(len(counts), np.int64)
    np.cumsum(counts[:-1], out=offsets[1:])
    out = np.full((len(counts), num_hashes), np.iinfo(np.int64).max, np.int64)
    if len(flat):
        safe_offsets = np.minimum(offsets, len(flat) - 1)
        # per-seed column loop, NOT a (T, k) broadcast: the broadcast form
        # materializes ~7 (T, k) uint64 temporaries inside _splitmix64
        # (memory-bandwidth-bound, measured 10x slower at k=64); per-column
        # temps are token-count-sized and stay in cache
        mins = np.empty((len(counts), num_hashes), np.int64)
        with np.errstate(over="ignore"):
            for j in range(num_hashes):
                col = _splitmix64(base ^ seeds[j]).view(np.int64)
                mins[:, j] = np.minimum.reduceat(col, safe_offsets)
        mins[counts == 0] = np.iinfo(np.int64).max
        out = mins
    return pd.Series(list(out))
