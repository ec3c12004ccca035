"""Approximate-nearest-neighbor kernels over embedding columns.

Baseline: brute-force cosine top-k — per-batch numpy matmul against a
broadcast query matrix (the queries are ray.put once; each batch of
candidates is scored vectorized). Scale path: IVF — k-means coarse
centroids, candidates scored only within the ``nprobe`` nearest cells.
"""

from __future__ import annotations

import numpy as np

from .dedup import normalize_rows


def topk_merge(
    part_ids: np.ndarray, part_scores: np.ndarray, k: int
) -> tuple[np.ndarray, np.ndarray]:
    """Keep the k best (score desc, id asc tiebreak) of a candidate set."""
    order = np.lexsort((part_ids, -part_scores))[:k]
    return part_ids[order], part_scores[order]


def brute_force_scores(queries: np.ndarray, cand: np.ndarray) -> np.ndarray:
    """(Q, C) cosine scores, float64 (DuckDB list_cosine_similarity is
    double — keeping both sides in f64 makes the oracle comparison
    exact to rounding)."""
    return normalize_rows(queries.astype(np.float64)) @ normalize_rows(
        cand.astype(np.float64)
    ).T


def kmeans_fit(vecs: np.ndarray, n_cells: int, iters: int = 10, seed: int = 1) -> np.ndarray:
    """Plain Lloyd k-means on normalized vectors (IVF coarse quantizer).
    Deterministic: seeded init, ties to lowest index."""
    m = normalize_rows(vecs.astype(np.float64))
    rng = np.random.default_rng(seed)
    idx = rng.choice(len(m), size=min(n_cells, len(m)), replace=False)
    cents = m[np.sort(idx)].copy()
    for _ in range(iters):
        assign = np.argmax(m @ cents.T, axis=1)
        for c in range(len(cents)):
            sel = m[assign == c]
            if len(sel):
                v = sel.mean(axis=0)
                n = np.linalg.norm(v)
                if n > 0:
                    cents[c] = v / n
    return cents


def ivf_assign(vecs: np.ndarray, cents: np.ndarray) -> np.ndarray:
    return np.argmax(normalize_rows(vecs.astype(np.float64)) @ cents.T, axis=1)


def ivf_probe_cells(queries: np.ndarray, cents: np.ndarray, nprobe: int) -> np.ndarray:
    """(Q, nprobe) nearest-centroid cells per query."""
    sims = normalize_rows(queries.astype(np.float64)) @ cents.T
    return np.argsort(-sims, axis=1)[:, :nprobe]
