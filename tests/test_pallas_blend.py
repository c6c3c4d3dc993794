"""Pallas blend kernels vs the XLA blend path (interpret mode on CPU)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dogs_tpu.raster.tiled import RasterConfig, render_tiled
from tests.test_tiled_render import random_scene

XLA_CFG = RasterConfig(tile_size=16, max_tiles_per_gaussian=36, tile_batch=8, chunk=16)
# Kernel-parity tests pin reduce_dtype="f32" so they isolate the Pallas
# kernels; the bf16-packed reduction has its own quantization-bound test.
PALLAS_CFG = dataclasses.replace(XLA_CFG, use_pallas=True, reduce_dtype="f32")
# Flat chunk-stream kernels (pallas_stream.py): same parity bar.
STREAM_CFG = dataclasses.replace(PALLAS_CFG, pallas_stream=True)


@pytest.fixture(params=["pertile", "stream"])
def pallas_cfg(request):
    return PALLAS_CFG if request.param == "pertile" else STREAM_CFG


@pytest.mark.parametrize("seed", [0, 3])
def test_pallas_forward_matches_xla(seed, pallas_cfg):
    params, cam = random_scene(seed=seed)
    bg = jnp.asarray([0.15, 0.25, 0.35])
    a = render_tiled(params, cam, XLA_CFG, background=bg, active_sh_degree=2)
    b = render_tiled(params, cam, pallas_cfg, background=bg, active_sh_degree=2)
    np.testing.assert_allclose(b.image, a.image, atol=3e-4)
    np.testing.assert_allclose(b.alpha, a.alpha, atol=3e-4)
    np.testing.assert_allclose(b.invdepth, a.invdepth, atol=3e-4)


def test_pallas_grads_match_xla(pallas_cfg):
    params, cam = random_scene(n=40, seed=5)
    bg = jnp.asarray([0.1, 0.1, 0.1])
    rng = np.random.RandomState(0)
    target = jnp.asarray(rng.rand(cam.height, cam.width, 3).astype(np.float32))

    def loss(cfg, p, offset):
        out = render_tiled(
            p, cam, cfg, background=bg, active_sh_degree=2, means2d_offset=offset
        )
        return (
            jnp.sum((out.image - target) ** 2)
            + 0.3 * jnp.sum(out.alpha**2)
            + 0.1 * jnp.sum(out.invdepth**2)
        )

    offset0 = jnp.zeros((40, 2))
    g_x = jax.grad(lambda p, o: loss(XLA_CFG, p, o), argnums=(0, 1))(params, offset0)
    g_p = jax.grad(lambda p, o: loss(pallas_cfg, p, o), argnums=(0, 1))(params, offset0)
    for name in ["xyz", "feat_dc", "feat_rest", "log_scale", "quat", "logit_opacity"]:
        a = np.asarray(getattr(g_x[0], name))
        b = np.asarray(getattr(g_p[0], name))
        scale = np.abs(a).max() + 1e-6
        np.testing.assert_allclose(b / scale, a / scale, atol=2e-3, err_msg=name)
    a, b = np.asarray(g_x[1]), np.asarray(g_p[1])
    scale = np.abs(a).max() + 1e-6
    np.testing.assert_allclose(b / scale, a / scale, atol=2e-3)


def test_bf16_packed_reduce_close_to_f32():
    """The bf16-packed K->N reduction quantizes per-entry gradients to
    bf16 BEFORE the per-gaussian run summation. Assert the end-to-end
    parameter gradients stay within bf16 rounding (~0.4% relative) of the
    exact f32 reduction — far below SGD noise."""
    params, cam = random_scene(n=40, seed=5)
    bg = jnp.asarray([0.1, 0.1, 0.1])
    rng = np.random.RandomState(0)
    target = jnp.asarray(rng.rand(cam.height, cam.width, 3).astype(np.float32))
    bf16_cfg = dataclasses.replace(PALLAS_CFG, reduce_dtype="bf16")

    def loss(cfg, p):
        out = render_tiled(p, cam, cfg, background=bg, active_sh_degree=2)
        return jnp.sum((out.image - target) ** 2) + 0.3 * jnp.sum(out.alpha**2)

    g_f32 = jax.grad(lambda p: loss(PALLAS_CFG, p))(params)
    g_bf16 = jax.grad(lambda p: loss(bf16_cfg, p))(params)
    for name in ["xyz", "feat_dc", "log_scale", "quat", "logit_opacity"]:
        a = np.asarray(getattr(g_f32, name))
        b = np.asarray(getattr(g_bf16, name))
        scale = np.abs(a).max() + 1e-6
        np.testing.assert_allclose(b / scale, a / scale, atol=8e-3, err_msg=name)


def test_pallas_saturation_and_boundary_rmw(pallas_cfg):
    """Adversarial case for the compact-layout kernels: fully opaque
    overlapping gaussians drive tile saturation (the zero_tail path) while
    tiny per-tile runs force many tiles to SHARE entry chunks, exercising
    the backward's boundary read-modify-write. Gradients must still match
    the XLA path exactly."""
    import jax.numpy as jnp
    from dogs_tpu.core.gaussians import GaussianParams, inverse_sigmoid
    from dogs_tpu.core.sh import rgb_to_sh
    from dogs_tpu.core.camera import look_at_camera

    rng = np.random.RandomState(11)
    n = 64
    # dense stack of near-opaque gaussians in front of the camera
    xyz = np.concatenate(
        [
            rng.uniform(-0.6, 0.6, (n, 2)),
            rng.uniform(2.0, 2.5, (n, 1)),
        ],
        axis=1,
    ).astype(np.float32)
    params = GaussianParams(
        xyz=jnp.asarray(xyz),
        feat_dc=rgb_to_sh(jnp.asarray(rng.rand(n, 3), jnp.float32))[:, None, :],
        feat_rest=jnp.zeros((n, 8, 3), jnp.float32),
        # anisotropic: isotropic gaussians have ~zero quat gradients by
        # symmetry, which makes the relative comparison ill-conditioned
        log_scale=jnp.asarray(
            np.log(np.array([[0.3, 0.12, 0.2]]) * rng.uniform(0.8, 1.2, (n, 3))),
            jnp.float32,
        ),
        quat=jnp.asarray(rng.randn(n, 4), jnp.float32),
        logit_opacity=inverse_sigmoid(jnp.full((n, 1), 0.97, jnp.float32)),
    )
    cam = look_at_camera([0, 0, 0], [0, 0, 1], [0, -1, 0], 60, 60, 64, 64)
    bg = jnp.asarray([0.3, 0.2, 0.1])
    target = jnp.asarray(rng.rand(64, 64, 3).astype(np.float32))

    def loss(cfg, p):
        out = render_tiled(p, cam, cfg, background=bg, active_sh_degree=1)
        return jnp.sum((out.image - target) ** 2) + 0.2 * jnp.sum(out.alpha**2)

    fx = jax.jit(lambda p: render_tiled(p, cam, XLA_CFG, background=bg, active_sh_degree=1).image)
    fp = jax.jit(lambda p: render_tiled(p, cam, pallas_cfg, background=bg, active_sh_degree=1).image)
    np.testing.assert_allclose(np.asarray(fp(params)), np.asarray(fx(params)), atol=3e-4)

    g_x = jax.grad(lambda p: loss(XLA_CFG, p))(params)
    g_p = jax.grad(lambda p: loss(pallas_cfg, p))(params)
    for name in ["xyz", "feat_dc", "log_scale", "quat", "logit_opacity"]:
        a = np.asarray(getattr(g_x, name))
        b = np.asarray(getattr(g_p, name))
        scale = np.abs(a).max() + 1e-6
        np.testing.assert_allclose(b / scale, a / scale, atol=2e-3, err_msg=name)


def test_pallas_background_grad():
    params, cam = random_scene(n=16, seed=6)

    def loss(cfg, bg):
        return jnp.sum(
            render_tiled(params, cam, cfg, background=bg, active_sh_degree=2).image
        )

    bg0 = jnp.asarray([0.2, 0.4, 0.6])
    g_x = jax.grad(lambda b: loss(XLA_CFG, b))(bg0)
    g_p = jax.grad(lambda b: loss(PALLAS_CFG, b))(bg0)
    np.testing.assert_allclose(g_p, g_x, rtol=1e-3)
