"""Master phase driver: independent phase -> fusion -> ADMM phase (8-dev mesh)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from dogs_tpu.data.blocks import partition_scene
from dogs_tpu.data.synthetic import make_scene
from dogs_tpu.parallel.admm import AdmmConfig
from dogs_tpu.parallel.master import MasterTrainer, fuse_local_gaussians
from dogs_tpu.raster.tiled import RasterConfig
from dogs_tpu.train.trainer import TrainerConfig

RASTER = RasterConfig(tile_batch=8, chunk=16)
N_DEV = 4


@pytest.fixture(scope="module")
def setup():
    scene = make_scene(
        n_gaussians=64, n_cams=8, width=48, height=48, seed=51, raster_cfg=RASTER
    )
    cam_pos = np.stack([np.asarray(c.camera_center) for c in scene.cameras])
    part = partition_scene(cam_pos, scene.points, mx=2, my=2,
                           bbox_scale_factor=(1.6, 1.6))
    block_points, block_colors, block_cams, block_imgs = [], [], [], []
    for k in range(4):
        mask = part.point_masks[k]
        # Guarantee nonempty blocks for the tiny test scene.
        if mask.sum() < 4:
            mask = mask.copy()
            mask[:4] = True
        block_points.append(scene.points[mask])
        block_colors.append(scene.colors[mask])
        cams = [c for c, l in zip(scene.cameras, part.camera_labels) if l == k]
        imgs = [im for im, l in zip(scene.images, part.camera_labels) if l == k]
        if not cams:  # tiny scenes can leave a cell empty
            cams, imgs = [scene.cameras[k]], [scene.images[k]]
        block_cams.append(cams)
        block_imgs.append(imgs)
    mesh = Mesh(np.asarray(jax.devices()[:N_DEV]), ("block",))
    cfg = TrainerConfig(
        max_iterations=100, min_capacity=128, max_sh_degree=2,
        sh_increase_interval=1, densify_start_iter=2, densify_end_iter=8,
        densification_interval=4,
    )
    admm_cfg = AdmmConfig(consensus_interval=4)
    trainer = MasterTrainer(
        mesh, part, block_points, block_colors, block_cams, block_imgs,
        cfg, RASTER, admm_cfg, spatial_lr_scale=4.0,
    )
    return scene, part, trainer


def test_phases_run_and_admm_engages(setup):
    scene, part, trainer = setup
    # Chunk 1: independent phase with densification.
    m1 = trainer.train_iteration()
    assert not np.isnan(m1["loss"])
    # densify_end=8 < step=4+... after chunk 2 the fusion must have fired.
    m2 = trainer.train_iteration()
    assert trainer.admm_enabled
    assert trainer.n_global > 0
    # Chunk 3: ADMM phase produces residuals and finite loss.
    m3 = trainer.train_iteration()
    assert "primal_xyz" in m3 and np.isfinite(m3["primal_xyz"])
    assert np.isfinite(m3["loss"])
    val = trainer.validate(scene.cameras[:2], scene.images[:2])
    assert np.isfinite(val["val_psnr"])
    assert val["num_points"] == trainer.n_global


def test_fusion_dedup_and_coverage(setup):
    scene, part, trainer = setup
    from dogs_tpu.parallel.admm import AdmmBlockState
    from dogs_tpu.parallel.master import gather_block_models

    models = gather_block_models(trainer.state)
    fused, block_ids = fuse_local_gaussians(models, part)
    n = fused["xyz"].shape[0]
    # Every block's ids are valid and within the global range.
    for ids in block_ids:
        assert len(ids) > 0
        assert ids.max() < n
    # Every global gaussian belongs to at least one block.
    covered = np.zeros(n, bool)
    for ids in block_ids:
        covered[ids] = True
    assert covered.all()
    # Overlap exists (expanded boxes share boundary gaussians).
    assert sum(len(i) for i in block_ids) > n
