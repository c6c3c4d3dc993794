"""Match-graph filtering for ambiguous scenes.

Native numpy port of the reference's filter stage
(scripts/preprocess/hloc_mapping/filter_matches.py:37-131): given a
pairwise match-consistency score matrix, keep edges by fixed threshold,
per-node kNN, per-node percentile, or a minimum-spanning-tree skeleton
(min- or mean-symmetrized). The reference uses scipy/networkx; the MST
here is a 30-line Prim's — the graphs are image-count sized.
"""

from __future__ import annotations

import numpy as np


def _mst_edges(weights: np.ndarray) -> np.ndarray:
    """Prim's MST on a dense symmetric weight matrix (higher = stronger;
    zero = no edge). Returns a boolean adjacency of kept edges."""
    n = weights.shape[0]
    keep = np.zeros((n, n), bool)
    in_tree = np.zeros((n,), bool)
    in_tree[0] = True
    # best connection of each outside node to the tree
    best_w = weights[0].copy()
    best_from = np.zeros((n,), np.int64)
    for _ in range(n - 1):
        cand = np.where(~in_tree, best_w, -np.inf)
        j = int(np.argmax(cand))
        if not np.isfinite(cand[j]) or cand[j] <= 0:
            break  # disconnected graph: keep the reachable component
        i = int(best_from[j])
        keep[i, j] = keep[j, i] = True
        in_tree[j] = True
        upd = weights[j] > best_w
        best_w = np.where(upd, weights[j], best_w)
        best_from = np.where(upd, j, best_from)
    return keep


def filter_with_fixed_threshold(scores: np.ndarray, thres: float) -> np.ndarray:
    valid = scores >= thres
    scores[~valid] = 0.0
    return valid


def filter_with_knn(scores: np.ndarray, k: int) -> np.ndarray:
    valid = np.zeros_like(scores, dtype=bool)
    order = scores.argsort(axis=1)[:, -k:]
    for i in range(scores.shape[0]):
        valid[i, order[i]] = True
    scores[~valid] = 0.0
    return valid


def filter_with_percentile(scores: np.ndarray, percentile: float) -> np.ndarray:
    n = scores.shape[0]
    thres = np.zeros((n, 1))
    for i in range(n):
        nz = scores[i, scores[i].nonzero()]
        thres[i] = np.percentile(nz, percentile) if nz.size else np.inf
    valid = scores >= thres
    scores[~valid] = 0.0
    return valid


def filter_with_mst_min(scores: np.ndarray) -> np.ndarray:
    sym = np.minimum(scores, scores.T)
    valid = _mst_edges(sym)
    scores[~valid] = 0.0
    return valid


def filter_with_mst_mean(scores: np.ndarray) -> np.ndarray:
    sym = (scores + scores.T) / 2.0
    valid = _mst_edges(sym)
    scores[~valid] = 0.0
    return valid


def filter_scores(
    scores: np.ndarray,
    filter_type: str,
    threshold: float | None = None,
    topk: int | None = None,
    percentile: float | None = None,
) -> np.ndarray:
    """Dispatch matching the reference main() (filter_matches.py:95-131)."""
    scores = np.array(scores, np.float64)
    if filter_type == "threshold":
        assert threshold is not None
        return filter_with_fixed_threshold(scores, threshold)
    if filter_type == "knn":
        assert topk is not None
        return filter_with_knn(scores, topk)
    if filter_type == "percentile":
        assert percentile is not None
        return filter_with_percentile(scores, percentile)
    if filter_type == "mst_min":
        return filter_with_mst_min(scores)
    if filter_type == "mst_mean":
        return filter_with_mst_mean(scores)
    raise NotImplementedError(filter_type)
