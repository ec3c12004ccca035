"""Deduplication kernels: exact hash, MinHash+LSH, SimHash, n-gram
Jaccard, embedding-cosine near-dup.

All kernels are per-batch/vectorized building blocks; the distributed
shapes live in pipelines/dataops.py:

- exact:     content hash -> hash-partition (groupby) -> per-group first
- MinHash:   shingles -> K permutation mins -> B bands of R rows ->
             groupby(band, band_hash) -> candidate pairs -> Jaccard verify
- SimHash:   64-bit sign-aggregated token hashes; near-dup = small
             Hamming distance (bucket by bit-chunks for scale)
- embedding: cosine >= threshold via blocked matmul

Hashing is FNV/affine-universal — stable across processes and nodes
(no Python builtin ``hash``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .text import fnv1a_batch, hash_token, to_i64

_MERSENNE = (1 << 61) - 1


def content_hash(texts: pd.Series) -> pd.Series:
    """Exact-dedup key: FNV-1a 64 of the raw text, as signed int64."""
    return texts.map(lambda t: to_i64(hash_token(t))).astype("int64")


# ---------------------------------------------------------------------------
# Shingles + MinHash
# ---------------------------------------------------------------------------

def word_shingles(text: str, k: int = 3) -> set[int]:
    """Hashed k-word shingles (64-bit; batch-vectorized FNV — same
    values as hashing each shingle with ``hash_token``)."""
    toks = text.split()
    if len(toks) < k:
        return {hash_token(" ".join(toks))} if toks else set()
    sh = [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
    return set(fnv1a_batch(sh).tolist())


def _perm_params(num_perm: int, seed: int = 1) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    # Odd multipliers: (a*x + b) mod 2^64 multiply-shift hashing, native
    # uint64 wraparound — orders of magnitude faster than object-dtype
    # mod-Mersenne arithmetic and equally suitable for MinHash.
    a = (rng.integers(0, 1 << 63, size=num_perm, dtype=np.uint64) << np.uint64(1)) | np.uint64(1)
    b = rng.integers(0, 1 << 63, size=num_perm, dtype=np.uint64)
    return a, b


_PERM_CACHE: dict[tuple[int, int], tuple[np.ndarray, np.ndarray]] = {}


def minhash_signature(shingles: set[int], num_perm: int = 128, seed: int = 1) -> np.ndarray:
    """K-permutation MinHash signature (uint64), multiply-shift affine
    hashing over 2^64 — mergeable, deterministic, vectorized."""
    key = (num_perm, seed)
    if key not in _PERM_CACHE:
        _PERM_CACHE[key] = _perm_params(num_perm, seed)
    a, b = _PERM_CACHE[key]
    if not shingles:
        return np.full(num_perm, np.iinfo(np.uint64).max, dtype=np.uint64)
    x = np.fromiter(shingles, dtype=np.uint64, count=len(shingles))
    with np.errstate(over="ignore"):
        vals = a[:, None] * x[None, :] + b[:, None]  # wraps mod 2^64
    return vals.min(axis=1)


def lsh_band_keys_batch(sigs: np.ndarray, bands: int = 16) -> np.ndarray:
    """Band bucket keys for a BATCH of signatures: ``sigs`` is
    (n_docs, num_perm) uint64; returns (n_docs, bands) int64.

    FNV-1a over each band chunk's little-endian bytes — identical values
    to hashing ``chunk.tobytes()`` byte-at-a-time, but vectorized over
    the (doc, band) axes: the Python loop is ``rows*8`` iterations per
    batch instead of per chunk."""
    n, num_perm = sigs.shape
    rows = num_perm // bands
    if rows * bands != num_perm:
        # Drop the trailing remainder rows (same keys as the scalar
        # per-doc implementation, which chunked floor(num_perm/bands)
        # rows per band and ignored the leftover).
        sigs = sigs[:, : rows * bands]
    # (n, bands, rows*8) uint8 view — C-order LE bytes per chunk.
    by = np.ascontiguousarray(sigs.reshape(n, bands, rows)).view(np.uint8)
    by = by.reshape(n, bands, rows * 8).astype(np.uint64)
    h = np.full((n, bands), 0xCBF29CE484222325, dtype=np.uint64)
    prime = np.uint64(0x100000001B3)
    with np.errstate(over="ignore"):
        for i in range(rows * 8):
            h = (h ^ by[:, :, i]) * prime
    return h.view(np.int64)


def lsh_band_keys(sig: np.ndarray, bands: int = 16) -> list[int]:
    """Split a signature into ``bands`` row-groups; each band hashes to
    one bucket key. Docs sharing any band key are candidates."""
    return lsh_band_keys_batch(sig[None, :], bands)[0].tolist()


def jaccard(a: set[int], b: set[int]) -> float:
    if not a and not b:
        return 1.0
    if not a or not b:
        return 0.0
    return len(a & b) / len(a | b)


def ngram_jaccard(text_a: str, text_b: str, k: int = 3) -> float:
    """Verified n-gram Jaccard similarity between two documents."""
    return jaccard(word_shingles(text_a, k), word_shingles(text_b, k))


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash(text: str, _cache: dict[str, int] | None = None) -> int:
    """64-bit SimHash over whitespace tokens (unweighted). Vectorized
    over the token axis: all token-hash bits unpacked at once, one
    column-sum instead of a per-token 64-wide op. ``_cache`` memoizes
    token hashes across calls (actors pass a per-actor dict)."""
    toks = text.split()
    if not toks:
        return 0
    if _cache is None:
        hs = fnv1a_batch(toks)
    else:
        misses = [t for t in toks if t not in _cache]
        if misses:
            _cache.update(zip(misses, fnv1a_batch(misses).tolist()))
        hs = np.fromiter((_cache[t] for t in toks), dtype=np.uint64,
                         count=len(toks))
    bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1))
    acc = (2 * bits.astype(np.int32) - 1).sum(axis=0)
    v = 0
    for i in np.nonzero(acc > 0)[0]:
        v |= 1 << int(i)
    return to_i64(v)


def hamming64(a: int, b: int) -> int:
    return int(bin((a ^ b) & 0xFFFFFFFFFFFFFFFF).count("1"))


def simhash_chunks(value: int, chunks: int = 4) -> list[int]:
    """Split a SimHash into ``chunks`` bit-slices. Two hashes within
    Hamming distance < chunks share at least one identical slice
    (pigeonhole) — the LSH bucketing key for SimHash near-dup."""
    u = value & 0xFFFFFFFFFFFFFFFF
    w = 64 // chunks
    return [(u >> (i * w)) & ((1 << w) - 1) for i in range(chunks)]


# ---------------------------------------------------------------------------
# Embedding near-dup
# ---------------------------------------------------------------------------

def normalize_rows(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def cosine_pairs(
    ids: np.ndarray, vecs: np.ndarray, threshold: float, block: int = 1024
) -> list[tuple[int, int, float]]:
    """All pairs (i<j) with cosine >= threshold, via blocked matmul —
    the verify step after LSH/IVF bucketing at scale."""
    m = normalize_rows(vecs.astype(np.float64))
    out = []
    n = len(ids)
    for s in range(0, n, block):
        sims = m[s : s + block] @ m.T
        for r in range(sims.shape[0]):
            gi = s + r
            js = np.nonzero(sims[r] >= threshold)[0]
            for j in js:
                if j > gi:
                    out.append((int(ids[gi]), int(ids[j]), float(sims[r, j])))
    return out
