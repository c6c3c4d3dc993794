"""Tiled production rasterizer vs the naive oracle (SURVEY.md §4 tier 2).

Forward images must match to float tolerance, and the hand-written VJP must
match `jax.grad` of the oracle renderer. The oracle gets the production
pipeline's tile membership so both renderers blend the exact same splat sets
(the tiled path, like the CUDA kernel, limits support to 3-sigma tile rects).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dogs_tpu.core import GaussianParams, inverse_sigmoid, look_at_camera, rgb_to_sh
from dogs_tpu.raster.binning import bins_membership, build_tile_bins
from dogs_tpu.raster.projection import project_gaussians
from dogs_tpu.raster.reference import render_reference
from dogs_tpu.raster.tiled import RasterConfig, render_tiled

CFG = RasterConfig(tile_size=16, max_tiles_per_gaussian=36, tile_batch=8, chunk=16)


def random_scene(n=64, seed=0, max_sh_degree=2, spread=1.2, w=72, h=56):
    rng = np.random.RandomState(seed)
    k = (max_sh_degree + 1) ** 2
    xyz = rng.uniform(-spread, spread, (n, 3)).astype(np.float32)
    rgb = rng.uniform(0.05, 0.95, (n, 3)).astype(np.float32)
    params = GaussianParams(
        xyz=jnp.asarray(xyz),
        feat_dc=rgb_to_sh(jnp.asarray(rgb))[:, None, :],
        feat_rest=jnp.asarray(rng.randn(n, k - 1, 3).astype(np.float32) * 0.05),
        log_scale=jnp.asarray(
            np.log(rng.uniform(0.05, 0.35, (n, 3))).astype(np.float32)
        ),
        quat=jnp.asarray(rng.randn(n, 4).astype(np.float32)),
        logit_opacity=inverse_sigmoid(
            jnp.asarray(rng.uniform(0.2, 0.95, (n, 1)).astype(np.float32))
        ),
    )
    cam = look_at_camera(
        eye=[0.3, -0.2, -4.0], target=[0.0, 0.0, 0.0], up=[0.0, -1.0, 0.0],
        fx=70.0, fy=70.0, width=w, height=h,  # not tile-aligned on purpose
    )
    return params, cam


def membership_for(params, cam, cfg, aa=False, offset=None):
    proj = project_gaussians(
        params, cam, active_sh_degree=2, antialiasing=aa, means2d_offset=offset
    )
    bins = build_tile_bins(
        proj,
        cam.height,
        cam.width,
        tile_size=cfg.tile_size,
        max_tiles_per_gaussian=cfg.max_tiles_per_gaussian,
        tile_culling=cfg.tile_culling,
    )
    return bins_membership(bins, params.capacity)


@pytest.mark.parametrize("seed", [0, 3])
def test_two_tier_binning_matches_flat(seed):
    """The two-tier candidate budget (base_tiles + overflow pool) must
    produce the SAME per-tile entry lists as the flat budget — only the key
    storage layout differs."""
    from dogs_tpu.raster.projection import project_gaussians as pg

    params, cam = random_scene(seed=seed)
    proj = pg(params, cam, active_sh_degree=2)
    kw = dict(
        tile_size=CFG.tile_size,
        max_tiles_per_gaussian=CFG.max_tiles_per_gaussian,
        tile_culling=True,
    )
    flat = build_tile_bins(proj, cam.height, cam.width, **kw)
    # pool sized for zero truncation -> exact equivalence
    two = build_tile_bins(
        proj, cam.height, cam.width, base_tiles=2,
        overflow_capacity=params.capacity * CFG.max_tiles_per_gaussian, **kw
    )
    assert int(flat.num_valid) == int(two.num_valid)
    assert int(flat.num_truncated) == int(two.num_truncated)
    np.testing.assert_array_equal(
        np.asarray(flat.tile_starts), np.asarray(two.tile_starts)
    )
    nv = int(flat.num_valid)
    # identical entries; ties in the quantized (tile, depth) key may permute,
    # so compare (key-position-independent) sorted (tile, idx) pairs per run
    f = np.stack(
        [np.asarray(flat.sorted_tile[:nv]), np.asarray(flat.sorted_idx[:nv])], 1
    )
    t = np.stack(
        [np.asarray(two.sorted_tile[:nv]), np.asarray(two.sorted_idx[:nv])], 1
    )
    np.testing.assert_array_equal(
        f[np.lexsort(f.T[::-1])], t[np.lexsort(t.T[::-1])]
    )


@pytest.mark.parametrize("two_tier", [False, True])
def test_invalid_candidates_carry_trash_payload(two_tier):
    """Invalid candidates must carry payload id == n (the trash row), never a
    real gaussian id: the K->N gradient reduction's suffix-doubling pass
    bound assumes every REAL id's sorted run is <= max_tiles_per_gaussian
    (tiled.py _blend_with_vjp_pallas)."""
    from dogs_tpu.raster.projection import project_gaussians as pg

    params, cam = random_scene(seed=1)
    proj = pg(params, cam, active_sh_degree=2)
    kw = dict(
        tile_size=CFG.tile_size,
        max_tiles_per_gaussian=CFG.max_tiles_per_gaussian,
    )
    if two_tier:
        kw.update(base_tiles=2, overflow_capacity=params.capacity)
    bins = build_tile_bins(proj, cam.height, cam.width, **kw)
    n = params.capacity
    n_tiles = bins.tile_starts.shape[0] - 1
    tile = np.asarray(bins.sorted_tile)
    idx = np.asarray(bins.sorted_idx)
    # invalid (sentinel-tile) entries all point at the trash id n
    assert (idx[tile == n_tiles] == n).all()
    # ... so every real id's run is bounded by the per-gaussian slot budget
    runs = np.bincount(idx[idx < n], minlength=n)
    assert runs.max() <= CFG.max_tiles_per_gaussian


def test_two_tier_pool_exhaustion_truncates():
    params, cam = random_scene(seed=2)
    from dogs_tpu.raster.projection import project_gaussians as pg

    proj = pg(params, cam, active_sh_degree=2)
    bins = build_tile_bins(
        proj, cam.height, cam.width,
        tile_size=CFG.tile_size,
        max_tiles_per_gaussian=CFG.max_tiles_per_gaussian,
        base_tiles=1, overflow_capacity=8,
    )
    # with an 8-slot pool almost every multi-tile gaussian truncates
    assert int(bins.num_pool_truncated) > 0
    assert int(bins.num_valid) <= params.capacity * 1 + 8


@pytest.mark.parametrize("seed", [0, 1])
@pytest.mark.parametrize("aa", [False, True])
def test_tiled_matches_reference_forward(seed, aa):
    params, cam = random_scene(seed=seed)
    bg = jnp.asarray([0.1, 0.2, 0.3])
    cfg = RasterConfig(
        tile_size=CFG.tile_size,
        max_tiles_per_gaussian=CFG.max_tiles_per_gaussian,
        tile_batch=CFG.tile_batch,
        chunk=CFG.chunk,
        antialiasing=aa,
    )
    member = membership_for(params, cam, cfg, aa=aa)
    ref = render_reference(
        params, cam, background=bg, active_sh_degree=2, antialiasing=aa,
        tile_membership=member, tile_size=cfg.tile_size,
    )
    out = render_tiled(params, cam, cfg, background=bg, active_sh_degree=2)
    np.testing.assert_allclose(out.image, ref.image, atol=3e-4)
    np.testing.assert_allclose(out.alpha, ref.alpha, atol=3e-4)
    np.testing.assert_allclose(out.invdepth, ref.invdepth, atol=3e-4)
    np.testing.assert_allclose(out.radii, ref.radii)


def test_tiled_close_to_unmasked_reference():
    # Without membership masking the difference is bounded by the 3-sigma
    # rect cutoff (alpha just outside the rect can reach ~0.01).
    params, cam = random_scene(seed=7)
    ref = render_reference(params, cam, active_sh_degree=2)
    out = render_tiled(params, cam, CFG, active_sh_degree=2)
    assert np.abs(np.asarray(out.image) - np.asarray(ref.image)).max() < 0.05


def test_tiled_matches_reference_grads():
    params, cam = random_scene(n=48, seed=2)
    bg = jnp.asarray([0.05, 0.05, 0.05])
    rng = np.random.RandomState(3)
    target = jnp.asarray(rng.rand(cam.height, cam.width, 3).astype(np.float32))
    member = membership_for(params, cam, CFG)

    def loss_ref(p, offset):
        out = render_reference(
            p, cam, background=bg, active_sh_degree=2, means2d_offset=offset,
            tile_membership=member, tile_size=CFG.tile_size,
        )
        return (
            jnp.sum((out.image - target) ** 2)
            + 0.3 * jnp.sum(out.alpha**2)
            + 0.1 * jnp.sum(out.invdepth**2)
        )

    def loss_tiled(p, offset):
        out = render_tiled(
            p, cam, CFG, background=bg, active_sh_degree=2, means2d_offset=offset
        )
        return (
            jnp.sum((out.image - target) ** 2)
            + 0.3 * jnp.sum(out.alpha**2)
            + 0.1 * jnp.sum(out.invdepth**2)
        )

    offset0 = jnp.zeros((48, 2))
    g_ref = jax.grad(loss_ref, argnums=(0, 1))(params, offset0)
    g_tiled = jax.grad(loss_tiled, argnums=(0, 1))(params, offset0)

    for name in ["xyz", "feat_dc", "feat_rest", "log_scale", "quat", "logit_opacity"]:
        a = np.asarray(getattr(g_tiled[0], name))
        b = np.asarray(getattr(g_ref[0], name))
        scale = np.abs(b).max() + 1e-6
        np.testing.assert_allclose(a / scale, b / scale, atol=1e-3, err_msg=name)
    # Screen-space gradients (densification signal).
    a, b = np.asarray(g_tiled[1]), np.asarray(g_ref[1])
    scale = np.abs(b).max() + 1e-6
    np.testing.assert_allclose(a / scale, b / scale, atol=1e-3)


def test_tiled_background_grad():
    params, cam = random_scene(n=16, seed=4)
    member = membership_for(params, cam, CFG)

    def loss_ref(bg):
        out = render_reference(
            params, cam, background=bg, active_sh_degree=2,
            tile_membership=member, tile_size=CFG.tile_size,
        )
        return jnp.sum(out.image)

    def loss_tiled(bg):
        return jnp.sum(
            render_tiled(params, cam, CFG, background=bg, active_sh_degree=2).image
        )

    bg0 = jnp.asarray([0.2, 0.4, 0.6])
    g_ref = jax.grad(loss_ref)(bg0)
    g_tiled = jax.grad(loss_tiled)(bg0)
    np.testing.assert_allclose(g_tiled, g_ref, rtol=1e-3)


def test_tiled_jits():
    params, cam = random_scene(n=32, seed=5)
    f = jax.jit(lambda p: render_tiled(p, cam, CFG, active_sh_degree=2).image)
    img = f(params)
    assert np.isfinite(np.asarray(img)).all()


@pytest.mark.parametrize("seed", [0, 4])
def test_exact_tile_cull_safety_and_render_neutrality(seed):
    """The per-tile max-alpha cull claims to be EXACT over pixel centers
    (binning.py cull): (a) safety — every candidate it drops must have
    brute-force max alpha over the tile's pixel centers below ALPHA_MIN,
    so culling can never change a rendered pixel; (b) neutrality — the
    rendered image with culling on equals culling off to 1-2 ULP (the
    blend masks sub-ALPHA_MIN alphas to zero either way; the residual is
    reduction-order noise — a different entry count regroups XLA's tree
    reductions)."""
    from dogs_tpu.raster.projection import ALPHA_MIN

    params, cam = random_scene(n=96, seed=seed)
    proj = project_gaussians(params, cam, active_sh_degree=2)
    kw = dict(
        tile_size=CFG.tile_size,
        max_tiles_per_gaussian=CFG.max_tiles_per_gaussian,
    )
    culled = build_tile_bins(proj, cam.height, cam.width, tile_culling=True, **kw)
    full = build_tile_bins(proj, cam.height, cam.width, tile_culling=False, **kw)
    m_cull = np.asarray(bins_membership(culled, params.capacity))
    m_full = np.asarray(bins_membership(full, params.capacity))
    # Culling only removes candidates, never adds.
    assert not (m_cull & ~m_full).any()

    ts = CFG.tile_size
    n_tiles_x = -(-cam.width // ts)
    means = np.asarray(proj.means2d)
    conic = np.asarray(proj.conic)
    opa = np.asarray(proj.opacity)
    vis = np.asarray(proj.radius) > 0
    dropped = np.argwhere(m_full & ~m_cull)
    assert len(dropped) > 0  # rotated splats: the cull must actually bite
    for t, g in dropped:
        if not vis[g]:
            continue
        tix, tiy = t % n_tiles_x, t // n_tiles_x
        px = tix * ts + 0.5 + np.arange(ts)[None, :]
        py = tiy * ts + 0.5 + np.arange(ts)[:, None]
        dx = px - means[g, 0]
        dy = py - means[g, 1]
        a, b, c = conic[g]
        q = 0.5 * (a * dx * dx + c * dy * dy) + b * dx * dy
        max_alpha = opa[g] * np.exp(-np.maximum(q, 0.0).min())
        assert max_alpha < ALPHA_MIN, (t, g, max_alpha)

    img_cull = render_tiled(params, cam, CFG, active_sh_degree=2).image
    import dataclasses

    cfg_nocull = dataclasses.replace(CFG, tile_culling=False)
    img_full = render_tiled(params, cam, cfg_nocull, active_sh_degree=2).image
    np.testing.assert_allclose(
        np.asarray(img_cull), np.asarray(img_full), atol=5e-7, rtol=0
    )
