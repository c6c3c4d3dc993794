"""Unit tests for the windowed segment-sum kernel (raster/pallas_reduce.py).

The kernel is exercised end-to-end by every Pallas gradient-parity test
(it is the K->N placement of the bf16 reduce path), but those go through
the whole rasterizer; these pin the kernel's own contract directly —
window/chunk boundary sharing, empty windows, trash ids, padding.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dogs_tpu.raster.pallas_reduce import sorted_segment_sum_pallas


def _pack_pair(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Pack two f32 arrays as (bf16(a) << 16) | bf16(b) int32 — the same
    layout tiled.py's backward builds for the sort payload."""
    ai = (a.astype(jnp.bfloat16).view(np.uint16)).astype(np.uint32)
    bi = (b.astype(jnp.bfloat16).view(np.uint16)).astype(np.uint32)
    return ((ai << 16) | bi).view(np.int32)


def _reference(ids: np.ndarray, vals: np.ndarray, n_out: int) -> np.ndarray:
    """(n_out, 10) f32: per-id sum of bf16-quantized value rows."""
    out = np.zeros((n_out, vals.shape[1]), np.float32)
    q = np.asarray(vals.astype(jnp.bfloat16), np.float32)
    for i, g in enumerate(ids):
        if 0 <= g < n_out:
            out[g] += q[i]
    return out


def _run(ids, vals, n_out, **kw):
    order = np.argsort(ids, kind="stable")
    ids_s = ids[order].astype(np.int32)
    vals_s = vals[order]
    packed = tuple(
        jnp.asarray(_pack_pair(vals_s[:, 2 * i], vals_s[:, 2 * i + 1]))
        for i in range(5)
    )
    got = sorted_segment_sum_pallas(
        jnp.asarray(ids_s), packed, n_out, interpret=True, **kw
    )
    assert got.shape == (n_out, 16)
    np.testing.assert_array_equal(np.asarray(got[:, 10:]), 0.0)
    return np.asarray(got[:, :10])


@pytest.mark.parametrize("seed", [0, 1])
def test_random_runs_cross_window_and_chunk_boundaries(seed):
    """Heavy duplication, runs straddling the 256-id window edges AND the
    512-row chunk edges; k not a multiple of the chunk."""
    rng = np.random.RandomState(seed)
    k, n_out = 3001, 1000
    ids = rng.randint(0, n_out, size=k)
    vals = rng.randn(k, 10).astype(np.float32)
    got = _run(ids, vals, n_out)
    want = _reference(np.sort(ids), vals[np.argsort(ids, kind="stable")], n_out)
    # bf16 payloads and one-hot are exact; accumulation is f32 — identical
    # up to f32 summation order.
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_trash_ids_are_dropped():
    """Ids >= n_out (the rasterizer's trash rows / int32-max sort padding)
    must not contribute anywhere."""
    rng = np.random.RandomState(2)
    n_out = 300
    ids = np.concatenate(
        [
            rng.randint(0, n_out, size=500),
            np.full(100, n_out + 17),
            np.full(50, 2**31 - 1),
        ]
    )
    vals = rng.randn(len(ids), 10).astype(np.float32)
    got = _run(ids, vals, n_out)
    order = np.argsort(ids, kind="stable")
    want = _reference(ids[order], vals[order], n_out)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_sparse_ids_leave_empty_windows_zero():
    """Most windows see no rows at all; absent ids must read exactly 0."""
    ids = np.array([0, 0, 5, 1023, 1023, 1023], np.int32)
    vals = np.arange(60, dtype=np.float32).reshape(6, 10) - 30.0
    n_out = 1024
    got = _run(ids, vals, n_out)
    want = _reference(ids, vals, n_out)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)
    present = np.zeros(n_out, bool)
    present[[0, 5, 1023]] = True
    np.testing.assert_array_equal(got[~present], 0.0)


def test_single_id_long_run():
    """One id owning thousands of rows (far beyond any per-gaussian tile
    bound): the kernel has no run-length assumption."""
    k, n_out = 4096, 64
    rng = np.random.RandomState(3)
    ids = np.zeros(k, np.int32)
    vals = rng.randn(k, 10).astype(np.float32)
    got = _run(ids, vals, n_out)
    want = _reference(ids, vals, n_out)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)
