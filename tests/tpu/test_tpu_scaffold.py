"""Scaffold-GS on the real chip (VERDICT r4 weak #2: the anchor-MLP decode
+ voxel pipeline had never touched TPU hardware).

Parity bar: the full scaffold path — anchor frustum prefilter, MLP decode
to neural gaussians, color-override render — through the compiled Pallas
kernels must match the same path through the pure-XLA blend, both compiled
for TPU (reference workload shape: conerf/trainers/scaffold_gs_trainer.py
k=10 offsets, 32-d feats; conerf/render/scaffold_gs_render.py:17-105).
Plus: one scaffold train step at bench shapes with zero bin truncation.
"""

import dataclasses
import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from bench import _bench_cameras, bench_scene  # noqa: E402
from dogs_tpu.fields.scaffold import (  # noqa: E402
    ScaffoldConfig,
    ScaffoldGSTrainer,
    render_scaffold,
)
from dogs_tpu.raster.tiled import RasterConfig  # noqa: E402

N_POINTS = 60_000

XLA_CFG = RasterConfig(
    # Budgets sized for the UNTRAINED decode: fresh anchor MLPs emit wide
    # covariances, so per-gaussian tile demand far exceeds a converged
    # model's (first hardware run measured 28.6k truncated at a 600k pool).
    max_tiles_per_gaussian=12, bin_capacity=2_000_000,
    base_tiles=4, overflow_capacity=1_200_000,
)
PALLAS_CFG = dataclasses.replace(
    XLA_CFG, use_pallas=True, reduce_dtype="f32", pallas_stream=True
)


@pytest.fixture(scope="module")
def trainer():
    params = bench_scene(N_POINTS, seed=11)
    cams = _bench_cameras(2)
    from dogs_tpu.raster.tiled import render_tiled

    import jax

    t_render = jax.jit(
        lambda c: render_tiled(params, c, PALLAS_CFG, active_sh_degree=0).image
    )
    gts = [np.asarray(t_render(c)) for c in cams]
    scfg = ScaffoldConfig(
        max_iterations=100, voxel_size=0.25,
        stat_start_iter=1, densify_start_iter=10**9,
    )
    return ScaffoldGSTrainer(
        cameras=cams, images=gts, points=np.asarray(params.xyz),
        raster_cfg=PALLAS_CFG, scaffold_cfg=scfg,
    )


def _mostly_close(b, a, atol, frac=0.998, max_out=0.1, msg=""):
    a, b = np.asarray(a), np.asarray(b)
    scale = np.abs(a).max() + 1e-8
    d = np.abs(b - a) / scale
    ok = float(np.mean(d <= atol))
    assert ok >= frac, f"{msg}: only {ok:.5f} within {atol} (need {frac})"
    assert float(d.max()) <= max_out, f"{msg}: worst outlier {d.max():.4f}"


def test_scaffold_render_parity_pallas_vs_xla(trainer):
    """Decode+render through compiled Pallas kernels vs the pure-XLA blend,
    identical anchors — the scaffold analogue of test_forward_parity."""
    cam = trainer.cameras[0]
    sp, alive = trainer.state.params, trainer.state.alive
    img_p = np.asarray(
        render_scaffold(sp, cam, PALLAS_CFG, alive=alive).image
    )
    img_x = np.asarray(render_scaffold(sp, cam, XLA_CFG, alive=alive).image)
    _mostly_close(img_p, img_x, atol=5e-3, msg="scaffold fwd")


def test_scaffold_train_step_runs_truncation_zero(trainer):
    """One real train step at bench shapes: finite loss, params move,
    no bin-budget truncation (the budget-safety bar the single-splat lane
    pins for the GS trainer)."""
    before = np.asarray(trainer.state.params.anchor_feat).copy()
    m = trainer.train_iteration(int(trainer.state.step) + 1)
    assert np.isfinite(float(m["loss"]))
    trunc = int(m.get("bin_pool_truncated", 0) or 0) + int(
        m.get("bin_dropped", 0) or 0
    )
    assert trunc == 0
    after = np.asarray(trainer.state.params.anchor_feat)
    assert np.abs(after - before).max() > 0
