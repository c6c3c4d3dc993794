"""On-chip Pallas rasterizer parity: forward + backward vs the XLA blend
path on a 100k-gaussian scene, and zero budget truncation (SURVEY §4 tier-2
assertions, executed on the real kernels instead of interpret mode)."""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import pytest

N = 100_000
W, H = 640, 480


@pytest.fixture(scope="module")
def scene():
    from bench import bench_scene
    from dogs_tpu.core.camera import make_camera

    params = bench_scene(N, seed=3)
    cam = make_camera(
        R=np.eye(3), t=np.zeros(3), fx=520.0, fy=520.0,
        cx=W / 2, cy=H / 2, width=W, height=H,
    )
    return params, cam


def _cfg(use_pallas: bool):
    from dogs_tpu.raster.tiled import RasterConfig

    return RasterConfig(
        max_tiles_per_gaussian=12, use_pallas=use_pallas,
        base_tiles=4, overflow_capacity=N,
    )


def test_forward_parity_and_zero_truncation(scene):
    from dogs_tpu.raster.tiled import render_tiled

    params, cam = scene
    out_p = jax.jit(
        lambda p: render_tiled(p, cam, _cfg(True), active_sh_degree=3)
    )(params)
    out_x = jax.jit(
        lambda p: render_tiled(p, cam, _cfg(False), active_sh_degree=3)
    )(params)
    img_p = np.asarray(out_p.image)
    img_x = np.asarray(out_x.image)
    assert np.isfinite(img_p).all()
    np.testing.assert_allclose(img_p, img_x, atol=2e-3)
    np.testing.assert_allclose(
        np.asarray(out_p.alpha), np.asarray(out_x.alpha), atol=2e-3
    )
    # default budgets must not drop anything on this workload
    assert int(out_p.bin_pool_truncated) == 0
    assert int(out_p.bin_dropped) == 0


def test_backward_parity(scene):
    from dogs_tpu.raster.tiled import render_tiled

    params, cam = scene
    rng = np.random.RandomState(0)
    gt = jnp.asarray(rng.rand(H, W, 3), jnp.float32)

    def loss(p, use_pallas):
        out = render_tiled(p, cam, _cfg(use_pallas), active_sh_degree=3)
        return jnp.mean(jnp.abs(out.image - gt)) + 0.1 * jnp.mean(out.alpha)

    g_p = jax.jit(jax.grad(lambda p: loss(p, True)))(params)
    g_x = jax.jit(jax.grad(lambda p: loss(p, False)))(params)
    for name in ("xyz", "log_scale", "quat", "logit_opacity", "feat_dc"):
        a = np.asarray(getattr(g_p, name)).ravel()
        b = np.asarray(getattr(g_x, name)).ravel()
        assert np.isfinite(a).all(), name
        denom = max(float(np.abs(b).max()), 1e-8)
        err = float(np.abs(a - b).max()) / denom
        assert err < 5e-2, (name, err)
        cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))
        assert cos > 0.999, (name, cos)
