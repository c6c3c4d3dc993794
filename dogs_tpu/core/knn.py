"""K-nearest-neighbor mean distance for Gaussian scale initialization.

TPU-native replacement for the reference's `simple_knn._C.distCUDA2`
(submodules/simple-knn/simple_knn.cu:63-147, spatial.cu:17-35): mean squared
distance from each point to its 3 nearest neighbors, used only to initialize
log-scales from a COLMAP point cloud (gaussian_splat_model.py:557-560).

The CUDA version is itself approximate (Morton sort + box-pruned search).
Here: exact chunked O(N^2) for small N, and Morton-sorted windowed search for
large N — same spirit, static shapes, pure XLA (sort + windowed top-k).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _part1by2(x: jnp.ndarray) -> jnp.ndarray:
    """Spread 10 bits to every 3rd bit position (Morton interleave helper)."""
    x = x & 0x3FF
    x = (x | (x << 16)) & 0x030000FF
    x = (x | (x << 8)) & 0x0300F00F
    x = (x | (x << 4)) & 0x030C30C3
    x = (x | (x << 2)) & 0x09249249
    return x


def morton_codes(points: jnp.ndarray, valid: jnp.ndarray | None = None) -> jnp.ndarray:
    """(N, 3) float points -> (N,) int32 Morton codes on a 1024^3 grid."""
    if valid is None:
        lo = jnp.min(points, axis=0)
        hi = jnp.max(points, axis=0)
    else:
        big = jnp.float32(1e30)
        v = valid[:, None]
        lo = jnp.min(jnp.where(v, points, big), axis=0)
        hi = jnp.max(jnp.where(v, points, -big), axis=0)
    q = (points - lo) / jnp.maximum(hi - lo, 1e-12)
    q = jnp.clip((q * 1023.0).astype(jnp.int32), 0, 1023)
    return _part1by2(q[:, 0]) | (_part1by2(q[:, 1]) << 1) | (_part1by2(q[:, 2]) << 2)


def _exact_knn_mean_sq(points: jnp.ndarray, valid: jnp.ndarray, k: int) -> jnp.ndarray:
    n = points.shape[0]
    d2 = jnp.sum((points[:, None, :] - points[None, :, :]) ** 2, axis=-1)
    big = jnp.float32(1e30)
    eye = jnp.eye(n, dtype=bool)
    d2 = jnp.where(eye | ~valid[None, :], big, d2)
    knn = -jax.lax.top_k(-d2, k)[0]  # k smallest
    knn = jnp.where(knn >= big, 0.0, knn)
    return jnp.mean(knn, axis=-1)


@functools.partial(jax.jit, static_argnames=("k", "window"))
def mean_knn_dist_sq(
    points: jnp.ndarray,
    valid: jnp.ndarray | None = None,
    k: int = 3,
    window: int = 32,
) -> jnp.ndarray:
    """Mean squared distance to the k nearest neighbors (distCUDA2 equivalent).

    Args:
      points: (N, 3).
      valid: optional (N,) bool mask; invalid points are excluded as neighbors
        and get a result of 0.
      k: neighbor count (reference uses 3).
      window: half-window in Morton order searched per point for large N.

    Returns:
      (N,) float32 mean squared kNN distance.
    """
    n = points.shape[0]
    points = points.astype(jnp.float32)
    if valid is None:
        valid = jnp.ones((n,), bool)
    if n <= 2048:
        out = _exact_knn_mean_sq(points, valid, k)
        return jnp.where(valid, out, 0.0)

    codes = morton_codes(points, valid)
    # Push invalid points to the end of the Morton order.
    codes = jnp.where(valid, codes, jnp.int32(2**30))
    order = jnp.argsort(codes)
    sorted_pts = points[order]
    sorted_valid = valid[order]

    # Candidate neighbors: +/- window in Morton order.
    offsets = jnp.concatenate(
        [jnp.arange(-window, 0), jnp.arange(1, window + 1)]
    )  # (2W,)
    idx = jnp.arange(n)[:, None] + offsets[None, :]
    in_range = (idx >= 0) & (idx < n)
    idx = jnp.clip(idx, 0, n - 1)

    def chunk_fn(chunk_idx, chunk_pts, chunk_ok):
        cand = sorted_pts[chunk_idx]  # (B, 2W, 3)
        cand_valid = sorted_valid[chunk_idx] & chunk_ok
        d2 = jnp.sum((chunk_pts[:, None, :] - cand) ** 2, axis=-1)
        d2 = jnp.where(cand_valid, d2, jnp.float32(1e30))
        knn = -jax.lax.top_k(-d2, k)[0]
        knn = jnp.where(knn >= 1e30, 0.0, knn)
        return jnp.mean(knn, axis=-1)

    chunk = 65536
    n_pad = ((n + chunk - 1) // chunk) * chunk
    pad = n_pad - n

    def pad0(a):
        return jnp.pad(a, [(0, pad)] + [(0, 0)] * (a.ndim - 1))

    res = jax.lax.map(
        lambda args: chunk_fn(*args),
        (
            pad0(idx).reshape(-1, chunk, idx.shape[1]),
            pad0(sorted_pts).reshape(-1, chunk, 3),
            pad0(in_range).reshape(-1, chunk, in_range.shape[1]),
        ),
    ).reshape(-1)[:n]

    out = jnp.zeros((n,), jnp.float32).at[order].set(res)
    return jnp.where(valid, out, 0.0)
