"""End-to-end trainer integration test (SURVEY.md §4 tier 4).

Fits a fresh Gaussian field to images rendered from a known ground-truth
field. A few hundred iterations must push train PSNR past a floor, and
densification must keep the model healthy.
"""

import numpy as np
import pytest

from dogs_tpu.data.synthetic import make_scene
from dogs_tpu.raster.tiled import RasterConfig
from dogs_tpu.train.trainer import GaussianSplatTrainer, TrainerConfig


pytestmark = pytest.mark.heavy  # multi-minute: full lane only (scripts/test_full.sh)

RASTER = RasterConfig(tile_batch=16, chunk=32)


@pytest.fixture(scope="module")
def scene():
    return make_scene(
        n_gaussians=80, n_cams=10, width=64, height=64, seed=3, raster_cfg=RASTER
    )


def make_trainer(scene, **overrides):
    cfg = TrainerConfig(
        max_iterations=400,
        position_lr_max_steps=400,
        densify_start_iter=100,
        densify_end_iter=350,
        densification_interval=100,
        opacity_reset_interval=10000,  # no reset in this short run
        sh_increase_interval=100,
        max_sh_degree=2,
        min_capacity=128,
        **overrides,
    )
    return GaussianSplatTrainer(
        cameras=scene.cameras[:8],
        images=scene.images[:8],
        points=scene.points,
        colors=scene.colors,
        cfg=cfg,
        raster_cfg=RASTER,
        val_cameras=scene.cameras[8:],
        val_images=scene.images[8:],
    )


def test_training_improves_psnr(scene):
    trainer = make_trainer(scene)
    first = trainer.train_iteration(1)
    start_psnr = float(first["psnr"])
    trainer.train(num_iterations=399, log_every=0)
    val = trainer.validate()
    assert val["val_psnr"] > start_psnr + 4.0, (start_psnr, val)
    assert val["val_psnr"] > 22.0, val


def test_chained_steps_match_host_loop(scene):
    """cfg.chain_steps scans k steps per dispatch; the training trajectory
    must match the per-step host loop (same camera order, same math — only
    the dispatch granularity differs)."""
    a = make_trainer(scene)
    b = make_trainer(scene, chain_steps=8)
    # 150 steps cross a densify event (100), an SH switch (100) and run
    # partial tail chunks — all the chunk-boundary cases.
    a.train(num_iterations=150, log_every=50)
    b.train(num_iterations=150, log_every=50)
    assert int(a.state.step) == int(b.state.step) == 150
    assert int(a.state.model.num_alive) == int(b.state.model.num_alive)
    xa = np.asarray(a.state.model.params.xyz)[np.asarray(a.state.model.alive)]
    xb = np.asarray(b.state.model.params.xyz)[np.asarray(b.state.model.alive)]
    np.testing.assert_allclose(xa, xb, rtol=1e-4, atol=1e-5)
    va, vb = a.validate(), b.validate()
    assert abs(va["val_psnr"] - vb["val_psnr"]) < 0.05, (va, vb)


def test_densify_keeps_state_consistent(scene):
    trainer = make_trainer(scene)
    trainer.train(num_iterations=220, log_every=0)
    st = trainer.state
    n_alive = int(st.model.num_alive)
    assert 0 < n_alive <= st.model.capacity
    # Params finite everywhere alive.
    alive = np.asarray(st.model.alive)
    assert np.isfinite(np.asarray(st.model.params.xyz)[alive]).all()
    assert np.isfinite(np.asarray(st.opt.mu.xyz)[alive]).all()
    assert int(st.step) == 220
