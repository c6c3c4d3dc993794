"""Image-pair selection from global-descriptor retrieval.

Native numpy port of the reference's retrieval stage
(scripts/preprocess/hloc_mapping/pairs_from_retrieval.py:46-173): score
every query against every database descriptor (cosine/dot), mask
self-pairs, take top-k per query. The reference routes this through
torch/h5py; the math is one matmul."""

from __future__ import annotations

import numpy as np


def pairs_from_score_matrix(
    scores: np.ndarray,
    invalid: np.ndarray,
    num_select: int,
    min_score: float | None = None,
) -> list[tuple[int, int]]:
    """Top-`num_select` valid columns per row (pairs_from_retrieval.py:46-66)."""
    scores = np.array(scores, np.float64)
    invalid = np.asarray(invalid, bool)
    if min_score is not None:
        invalid = invalid | (scores < min_score)
    scores[invalid] = -np.inf
    k = min(num_select, scores.shape[1])
    idx = np.argpartition(-scores, k - 1, axis=1)[:, :k]
    pairs = []
    for i in range(scores.shape[0]):
        cols = idx[i][np.argsort(-scores[i, idx[i]])]
        for j in cols:
            if np.isfinite(scores[i, j]):
                pairs.append((i, int(j)))
    return pairs


def pairs_from_descriptors(
    query_desc: np.ndarray,
    db_desc: np.ndarray | None = None,
    num_matched: int = 30,
    min_score: float | None = None,
    normalize: bool = True,
) -> list[tuple[int, int]]:
    """Retrieval pairs from (N, D) global descriptors (e.g. NetVLAD).
    db_desc=None performs self-retrieval with the diagonal masked."""
    q = np.asarray(query_desc, np.float64)
    self_retrieval = db_desc is None
    d = q if self_retrieval else np.asarray(db_desc, np.float64)
    if normalize:
        q = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-12)
        d = d / np.maximum(np.linalg.norm(d, axis=1, keepdims=True), 1e-12)
    scores = q @ d.T
    invalid = np.zeros_like(scores, bool)
    if self_retrieval:
        np.fill_diagonal(invalid, True)
    return pairs_from_score_matrix(scores, invalid, num_matched, min_score)


def write_pairs(path: str, pairs: list[tuple[int, int]], names: list[str]) -> None:
    """hloc-format pairs file: one `name_i name_j` per line."""
    with open(path, "w") as f:
        for i, j in pairs:
            f.write(f"{names[i]} {names[j]}\n")
