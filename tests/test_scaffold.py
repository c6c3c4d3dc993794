"""Scaffold-GS: decode shapes, rendering, short training run."""

import jax.numpy as jnp
import numpy as np

from dogs_tpu.data.synthetic import make_scene
from dogs_tpu.fields.scaffold import (
    ScaffoldConfig,
    ScaffoldGSTrainer,
    generate_neural_gaussians,
    init_scaffold,
    render_scaffold,
    voxelize_points,
)
from dogs_tpu.raster.tiled import RasterConfig

RASTER = RasterConfig(tile_batch=16, chunk=32)


def test_voxelize_dedupes():
    pts = np.array([[0.01, 0.01, 0.01], [0.02, 0.02, 0.02], [0.9, 0.9, 0.9]])
    anchors = voxelize_points(pts, voxel_size=0.1)
    assert anchors.shape == (2, 3)


def test_decode_shapes_and_mask():
    rng = np.random.RandomState(0)
    sp = init_scaffold(rng.rand(50, 3).astype(np.float32), voxel_size=0.2, k_offsets=5)
    from dogs_tpu.core.camera import look_at_camera

    cam = look_at_camera([0, 0, -3], [0.5, 0.5, 0.5], [0, -1, 0], 50, 50, 48, 48)
    gauss, colors, alive = generate_neural_gaussians(sp, cam)
    a, k = sp.num_anchors, sp.k_offsets
    assert gauss.xyz.shape == (a * k, 3)
    assert colors.shape == (a * k, 3)
    assert alive.shape == (a * k,)
    assert (np.asarray(colors) >= 0).all() and (np.asarray(colors) <= 1).all()
    # Neural gaussians stay near their anchors.
    d = np.linalg.norm(
        np.asarray(gauss.xyz).reshape(a, k, 3) - np.asarray(sp.anchor_xyz)[:, None],
        axis=-1,
    )
    assert d.max() < 5 * 0.2


def test_scaffold_training_improves():
    scene = make_scene(n_gaussians=64, n_cams=8, width=64, height=64, seed=41,
                       raster_cfg=RASTER)
    trainer = ScaffoldGSTrainer(
        cameras=scene.cameras[:7], images=scene.images[:7],
        points=scene.points,
        raster_cfg=RASTER,
        val_cameras=scene.cameras[7:], val_images=scene.images[7:],
        scaffold_cfg=ScaffoldConfig(max_iterations=150, voxel_size=0.25, k_offsets=5),
    )
    first = float(trainer.train_iteration(1)["psnr"])
    trainer.train(num_iterations=149, log_every=0)
    val = trainer.validate()
    assert val["val_psnr"] > first + 2.0, (first, val)
    out = render_scaffold(trainer.state.params, scene.cameras[0], RASTER)
    assert np.isfinite(np.asarray(out.image)).all()
