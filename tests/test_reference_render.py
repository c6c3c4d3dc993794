"""Golden-behavior tests for the naive oracle renderer (SURVEY.md §4 tier 3)."""

import jax
import jax.numpy as jnp
import numpy as np

from dogs_tpu.core import GaussianParams, inverse_sigmoid, look_at_camera, rgb_to_sh
from dogs_tpu.raster.reference import render_reference


def make_params(xyz, rgb, scale, opacity, max_sh_degree=1):
    xyz = np.asarray(xyz, np.float32)
    rgb = np.asarray(rgb, np.float32)
    scale = np.asarray(scale, np.float32)
    opacity = np.asarray(opacity, np.float32)
    n = xyz.shape[0]
    k = (max_sh_degree + 1) ** 2
    return GaussianParams(
        xyz=jnp.asarray(xyz, jnp.float32),
        feat_dc=rgb_to_sh(jnp.asarray(rgb, jnp.float32))[:, None, :],
        feat_rest=jnp.zeros((n, k - 1, 3), jnp.float32),
        log_scale=jnp.log(jnp.asarray(scale, jnp.float32)),
        quat=jnp.tile(jnp.asarray([[1.0, 0, 0, 0]], jnp.float32), (n, 1)),
        logit_opacity=inverse_sigmoid(jnp.asarray(opacity, jnp.float32))[:, None],
    )


def simple_camera(w=64, h=64, f=60.0):
    return look_at_camera(
        eye=[0.0, 0.0, -4.0], target=[0.0, 0.0, 0.0], up=[0.0, -1.0, 0.0],
        fx=f, fy=f, width=w, height=h,
    )


def test_single_gaussian_peak_at_center():
    params = make_params(
        xyz=[[0.0, 0.0, 0.0]], rgb=[[1.0, 0.2, 0.2]], scale=[[0.3] * 3], opacity=[0.9]
    )
    cam = simple_camera()
    out = render_reference(params, cam, active_sh_degree=0)
    img = np.asarray(out.image)
    cy, cx = np.unravel_index(np.argmax(img[..., 0]), img[..., 0].shape)
    assert abs(cy - 32) <= 1 and abs(cx - 32) <= 1
    # Red channel dominates, center alpha near opacity.
    assert img[cy, cx, 0] > img[cy, cx, 1] * 2
    np.testing.assert_allclose(np.asarray(out.alpha)[cy, cx], 0.9, atol=0.02)
    assert np.asarray(out.radii)[0] > 0


def test_front_gaussian_occludes_back():
    params = make_params(
        xyz=[[0.0, 0.0, 0.0], [0.0, 0.0, 2.0]],
        rgb=[[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]],
        scale=[[0.5] * 3, [0.5] * 3],
        opacity=[0.99, 0.99],
    )
    cam = simple_camera()
    out = render_reference(params, cam, active_sh_degree=0)
    center = np.asarray(out.image)[32, 32]
    assert center[0] > 0.9  # front (red) wins
    assert center[1] < 0.1


def test_background_blending():
    params = make_params(
        xyz=[[0.0, 0.0, 0.0]], rgb=[[0.0, 0.0, 0.0]], scale=[[0.4] * 3], opacity=[0.5]
    )
    cam = simple_camera()
    bg = jnp.asarray([0.0, 0.0, 1.0])
    out = render_reference(params, cam, background=bg, active_sh_degree=0)
    img = np.asarray(out.image)
    # Far corner is pure background.
    np.testing.assert_allclose(img[0, 0], [0, 0, 1], atol=1e-3)
    # Center is half-occluded background.
    np.testing.assert_allclose(img[32, 32, 2], 0.5, atol=0.02)


def test_behind_camera_culled():
    params = make_params(
        xyz=[[0.0, 0.0, -10.0]], rgb=[[1.0, 1.0, 1.0]], scale=[[0.3] * 3], opacity=[0.9]
    )
    cam = simple_camera()
    out = render_reference(params, cam, active_sh_degree=0)
    assert np.asarray(out.radii)[0] == 0.0
    np.testing.assert_allclose(np.asarray(out.image), 0.0, atol=1e-6)


def test_alive_mask_culls():
    params = make_params(
        xyz=[[0.0, 0.0, 0.0], [0.2, 0.0, 0.0]],
        rgb=[[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]],
        scale=[[0.3] * 3] * 2,
        opacity=[0.9, 0.9],
    )
    cam = simple_camera()
    alive = jnp.asarray([True, False])
    out = render_reference(params, cam, alive=alive, active_sh_degree=0)
    img = np.asarray(out.image)
    assert img[..., 1].max() < 1e-4  # dead green Gaussian invisible
    assert img[..., 0].max() > 0.5


def test_render_is_differentiable():
    params = make_params(
        xyz=[[0.0, 0.0, 0.0]], rgb=[[0.8, 0.3, 0.3]], scale=[[0.3] * 3], opacity=[0.8]
    )
    cam = simple_camera(w=32, h=32)
    target = jnp.zeros((32, 32, 3))

    def loss(p):
        return jnp.mean((render_reference(p, cam, active_sh_degree=0).image - target) ** 2)

    g = jax.grad(loss)(params)
    assert np.isfinite(np.asarray(g.xyz)).all()
    assert np.abs(np.asarray(g.logit_opacity)).sum() > 0
    assert np.abs(np.asarray(g.feat_dc)).sum() > 0


def test_screen_space_grads_via_offset():
    params = make_params(
        xyz=[[0.3, 0.2, 0.0]], rgb=[[0.9, 0.9, 0.9]], scale=[[0.3] * 3], opacity=[0.8]
    )
    cam = simple_camera(w=32, h=32)
    target = jnp.zeros((32, 32, 3))

    def loss(offset):
        out = render_reference(params, cam, active_sh_degree=0, means2d_offset=offset)
        return jnp.mean((out.image - target) ** 2)

    g = jax.grad(loss)(jnp.zeros((1, 2)))
    assert np.abs(np.asarray(g)).sum() > 0
