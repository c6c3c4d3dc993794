"""VastGaussian appearance embedding: module shapes + trainer integration."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dogs_tpu.fields.appearance import (
    apply_appearance,
    appearance_loss_terms,
    init_appearance_params,
)
from dogs_tpu.data.synthetic import make_scene
from dogs_tpu.raster.tiled import RasterConfig
from dogs_tpu.train.trainer import GaussianSplatTrainer, TrainerConfig

RASTER = RasterConfig(tile_batch=16, chunk=32)


def test_mask_shapes_and_identity_center():
    params = init_appearance_params(num_images=4)
    img = jnp.asarray(np.random.RandomState(0).rand(64, 96, 3), jnp.float32)
    mask = apply_appearance(params, img, jnp.int32(2))
    assert mask.shape == (64, 96, 3)
    # Small random init keeps the mask near the identity.
    assert abs(float(jnp.mean(mask)) - 1.0) < 0.5
    l1, reg = appearance_loss_terms(mask, img, img, lambda_mask=0.1)
    assert np.isfinite(float(l1)) and np.isfinite(float(reg))


def test_mask_differs_per_image_embedding():
    params = init_appearance_params(num_images=4)
    img = jnp.asarray(np.random.RandomState(1).rand(64, 64, 3), jnp.float32)
    m0 = apply_appearance(params, img, jnp.int32(0))
    m1 = apply_appearance(params, img, jnp.int32(1))
    assert np.abs(np.asarray(m0 - m1)).max() > 0


@pytest.mark.heavy
def test_trainer_with_appearance_mask_learns():
    scene = make_scene(n_gaussians=48, n_cams=6, width=64, height=64, seed=31,
                       raster_cfg=RASTER)
    # Per-image brightness variation the mask should absorb.
    images = [
        np.clip(im * (0.7 + 0.1 * i), 0, 1) for i, im in enumerate(scene.images)
    ]
    cfg = TrainerConfig(
        max_iterations=60, densify_start_iter=10**9, min_capacity=64,
        max_sh_degree=2, sh_increase_interval=1,
        use_appearance_mask=True, lambda_mask=0.1, mask_lr=1e-3,
    )
    trainer = GaussianSplatTrainer(
        cameras=scene.cameras, images=images,
        points=scene.points, colors=scene.colors,
        cfg=cfg, raster_cfg=RASTER,
    )
    first = trainer.train_iteration(1)
    trainer.train(num_iterations=59, log_every=0)
    last = trainer.metrics_history[-1] if trainer.metrics_history else None
    # Mask parameters moved and loss decreased.
    assert float(trainer.train_iteration(61)["loss"]) < float(first["loss"])
    e0 = np.asarray(trainer.state.mask_params["embed"])
    assert np.abs(e0).max() > 0


@pytest.mark.heavy
def test_pose_optimization_improves_with_perturbed_cameras():
    """Perturb training camera poses; pose refinement should recover some
    of the loss vs frozen poses."""
    import dataclasses as dc

    import jax.numpy as jnp

    from dogs_tpu.core.transforms import so3_exp

    scene = make_scene(n_gaussians=48, n_cams=6, width=64, height=64, seed=71,
                       raster_cfg=RASTER)
    rng = np.random.RandomState(0)
    pert_cams = []
    for i, cam in enumerate(scene.cameras):
        if i == 0:
            pert_cams.append(cam)
            continue
        dR = np.asarray(so3_exp(jnp.asarray(rng.randn(3) * 0.01, jnp.float32)))
        pert_cams.append(cam.replace(R=jnp.asarray(dR) @ cam.R))

    def run(optimize):
        cfg = TrainerConfig(
            max_iterations=120, densify_start_iter=10**9, min_capacity=64,
            max_sh_degree=2, sh_increase_interval=1,
            optimize_camera_poses=optimize, pose_lr=3e-4, opt_pose_start_iter=10,
        )
        tr = GaussianSplatTrainer(
            cameras=pert_cams, images=scene.images,
            points=scene.points, colors=scene.colors, cfg=cfg, raster_cfg=RASTER,
        )
        m = tr.train(num_iterations=120, log_every=0)
        return float(m["loss"]), tr

    loss_frozen, _ = run(False)
    loss_opt, tr = run(True)
    assert loss_opt < loss_frozen
    # Deltas moved for non-anchor cameras, camera 0 stays fixed (gauge).
    d = np.asarray(tr.state.pose_deltas)
    assert np.abs(d[0]).max() == 0.0
    assert np.abs(d[1:]).max() > 0.0
