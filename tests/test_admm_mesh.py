"""Distributed ADMM consensus on a virtual 8-device CPU mesh (tier 5)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from dogs_tpu.core.gaussians import GaussianParams
from dogs_tpu.data.synthetic import make_scene
from dogs_tpu.parallel.admm import (
    AdmmConfig,
    adapt_rho,
    build_admm_state,
    make_consensus_step,
    make_distributed_train_step,
)
from dogs_tpu.raster.tiled import RasterConfig
from dogs_tpu.train.trainer import TrainerConfig


pytestmark = pytest.mark.heavy  # multi-minute: full lane only (scripts/test_full.sh)

RASTER = RasterConfig(tile_batch=8, chunk=16)
N_DEV = 8


def _consensus(fn, state, rho):
    """Call the narrow-I/O consensus step on a full AdmmBlockState."""
    return fn(
        state.train.model.params, state.train.model.alive,
        state.slot_map, state.u, state.z_local, rho,
    )


@pytest.fixture(scope="module")
def mesh():
    return Mesh(np.asarray(jax.devices()[:N_DEV]), ("block",))


@pytest.fixture(scope="module")
def setup(mesh):
    scene = make_scene(
        n_gaussians=48, n_cams=N_DEV, width=48, height=48, seed=9, raster_cfg=RASTER
    )
    rng = np.random.RandomState(0)
    g = scene.points.shape[0]
    # Overlapping blocks: each owns 12 of the 48 global points.
    block_ids = [np.sort(rng.choice(g, 12, replace=False)) for _ in range(N_DEV)]
    cfg = TrainerConfig(
        max_iterations=100, min_capacity=16, densify_start_iter=10**9,
        max_sh_degree=2, sh_increase_interval=1,
    )
    state = build_admm_state(scene.points, scene.colors, block_ids, N_DEV, cfg)
    return scene, block_ids, cfg, state


def test_consensus_average_and_counts(mesh, setup):
    scene, block_ids, cfg, state = setup
    g = scene.points.shape[0]
    admm_cfg = AdmmConfig()
    consensus = make_consensus_step(mesh, g, admm_cfg)
    rho = admm_cfg.initial_rho(g)
    new_u, new_z, z, counts, primal, dual = _consensus(consensus, state, rho)

    # Counts = how many blocks contain each global point.
    expected_counts = np.zeros(g)
    for ids in block_ids:
        expected_counts[ids] += 1
    np.testing.assert_allclose(np.asarray(counts), expected_counts)

    # z = average of block xyz (all blocks hold identical copies at init).
    covered = expected_counts > 0
    np.testing.assert_allclose(
        np.asarray(z.xyz)[covered], scene.points[covered], atol=1e-5
    )
    # At init x == z, so primal residual ~ 0 and duals stay ~ 0.
    assert float(primal.xyz) < 1e-8
    assert np.abs(np.asarray(new_u.xyz)).max() < 1e-6


def test_distributed_train_step_runs(mesh, setup):
    scene, block_ids, cfg, state = setup
    g = scene.points.shape[0]
    admm_cfg = AdmmConfig()
    rho = admm_cfg.initial_rho(g)
    step = make_distributed_train_step(
        mesh, cfg, RASTER, spatial_lr_scale=4.0, active_sh_degree=2,
        admm_enabled=True,
    )
    cams = jax.tree.map(lambda *xs: jnp.stack(xs), *[c for c in scene.cameras])
    gts = jnp.stack([jnp.asarray(im) for im in scene.images])
    # chained layout: leading (k, B) dims — one dispatch scans k=2 steps
    cams2 = jax.tree.map(lambda a: jnp.stack([a, a]), cams)
    gts2 = jnp.stack([gts, gts])

    before = np.asarray(state.train.model.params.xyz).copy()
    state, metrics = step(state, cams2, gts2, rho)
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["psnr"]) > 5.0
    after = np.asarray(state.train.model.params.xyz)
    assert np.abs(after - before).max() > 0  # parameters moved
    assert int(state.train.step[0]) == 2

    # Consensus after divergence: primal residual > 0, duals move on shared.
    consensus = make_consensus_step(mesh, g, admm_cfg)
    new_u, new_z, z, counts, primal, dual = _consensus(consensus, state, rho)
    assert float(primal.xyz) > 0
    assert np.abs(np.asarray(new_u.xyz)).max() > 0


def test_adapt_rho_directions():
    cfg = AdmmConfig(mu=10.0, tau_inc=2.0, tau_dec=2.0)
    rho = cfg.initial_rho(100)
    ones = jax.tree.map(lambda r: jnp.float32(1.0), rho)
    tiny = jax.tree.map(lambda r: jnp.float32(1e-6), rho)
    up = adapt_rho(rho, ones, tiny, cfg)  # primal >> dual -> grow
    down = adapt_rho(rho, tiny, ones, cfg)  # dual >> primal -> shrink
    same = adapt_rho(rho, ones, ones, cfg)
    np.testing.assert_allclose(float(up.xyz), float(rho.xyz) * 2.0)
    np.testing.assert_allclose(float(down.xyz), float(rho.xyz) / 2.0)
    np.testing.assert_allclose(float(same.xyz), float(rho.xyz))


def test_admm_penalty_pulls_blocks_together(mesh, setup):
    """With a huge rho, shared Gaussians across blocks should converge toward
    the consensus faster than with rho=0."""
    scene, block_ids, cfg, state = setup
    g = scene.points.shape[0]
    admm_cfg = AdmmConfig()
    consensus = make_consensus_step(mesh, g, admm_cfg)
    step = make_distributed_train_step(
        mesh, cfg, RASTER, spatial_lr_scale=4.0, active_sh_degree=2,
        admm_enabled=True,
    )
    cams = jax.tree.map(lambda *xs: jnp.stack(xs), *[c for c in scene.cameras])
    gts = jnp.stack([jnp.asarray(im) for im in scene.images])

    cams1 = jax.tree.map(lambda a: a[None], cams)  # (k=1, B, ...)
    gts1 = gts[None]

    def run(rho_scale, n=6):
        rho = jax.tree.map(
            lambda r: jnp.float32(rho_scale), admm_cfg.initial_rho(g)
        )
        st = jax.tree.map(lambda a: a.copy(), state)
        for _ in range(n):
            st, _ = step(st, cams1, gts1, rho)
        _, _, _, _, primal, _ = _consensus(consensus, st, rho)
        return float(primal.xyz)

    spread_free = run(0.0)
    spread_tied = run(50.0)
    assert spread_tied < spread_free
