"""Trainer factory — parity with the reference's root utils.py:8-23.

`create_trainer(config)` keys on `neural_field_type`: "gs" builds the
single-device GaussianSplatTrainer (block-local training uses the same class
per shard); "scaffold_gs" builds the Scaffold-GS trainer.
Returns (trainer, checkpoint_manager, tensorboard_writer).
"""

from __future__ import annotations

import os

import numpy as np


def _build_dataset(config):
    """SceneData for real scenes or a synthetic teacher-splat scene."""
    from dogs_tpu.data.dataset import load_scene

    name = config.dataset.get("name", "synthetic")
    if name == "synthetic":
        from dogs_tpu.data.synthetic import make_scene

        scene = make_scene(
            n_gaussians=int(config.dataset.get("n_gaussians", 96)),
            n_cams=int(config.dataset.get("n_cams", 12)),
            width=int(config.dataset.get("width", 96)),
            height=int(config.dataset.get("height", 80)),
            seed=int(config.get("seed", 42)),
        )
        n_val = max(len(scene.cameras) // int(config.dataset.get("val_interval", 8)), 1)
        return dict(
            train_cameras=[c for c in scene.cameras[n_val:]],
            train_images=scene.images[n_val:],
            val_cameras=scene.cameras[:n_val],
            val_images=scene.images[:n_val],
            points=scene.points,
            colors=scene.colors,
        )

    root = os.path.join(config.dataset.root_dir, str(config.dataset.scene))
    data = load_scene(
        root,
        factor=int(config.dataset.get("factor", 1)),
        val_interval=int(config.dataset.get("val_interval", 8)),
        model_folder=config.dataset.get("model_folder", "sparse"),
        normalize=bool(config.dataset.get("scale", True)),
        use_manhattan_world=bool(
            config.dataset.get("use_manhattan_world", False)
        ),
        scene_name=str(config.dataset.scene),
        dataset_name=str(config.dataset.get("name", "")),
    )
    from dogs_tpu.data.reader import LazyImageList

    train_cams = [r.to_camera() for r in data.train_cameras]
    val_cams = [r.to_camera() for r in data.val_cameras]
    # Train images stream lazily with lookahead decode (rubble-scale scenes
    # don't fit in host RAM eagerly); the small val split loads up front.
    # Records decode at the record's exact resolution + undistorted.
    train_imgs = LazyImageList(data.train_cameras)
    val_imgs = [r.load() for r in data.val_cameras]
    return dict(
        train_cameras=train_cams,
        train_images=train_imgs,
        val_cameras=val_cams,
        val_images=val_imgs,
        points=data.points,
        colors=data.colors,
    )


def _trainer_config(config):
    from dogs_tpu.train.trainer import TrainerConfig

    lr = config.optimizer.lr
    geo = config.geometry
    return TrainerConfig(
        max_iterations=int(config.trainer.max_iterations),
        lambda_dssim=float(config.loss.get("lambda_dssim", 0.2)),
        lambda_scale=float(config.loss.get("lambda_scale", 0.01)),
        position_lr_init=float(lr.get("position_init", 1.6e-4)),
        position_lr_final=float(lr.get("position_final", 1.6e-6)),
        position_lr_delay_mult=float(lr.get("position_delay_mult", 0.01)),
        position_lr_max_steps=int(
            lr.get("position_max_iterations", config.trainer.max_iterations)
        ),
        feature_lr=float(lr.get("feature", 2.5e-3)),
        opacity_lr=float(lr.get("opacity", 0.025)),
        scaling_lr=float(lr.get("scaling", 5e-3)),
        quaternion_lr=float(lr.get("quaternion", 1e-3)),
        exposure_lr_init=float(lr.get("exposure_lr_init", 0.01)),
        exposure_lr_final=float(lr.get("exposure_lr_final", 0.001)),
        exposure_lr_delay_steps=int(lr.get("exposure_lr_delay_steps", 0)),
        exposure_lr_delay_mult=float(lr.get("exposure_lr_delay_mult", 0.0)),
        percent_dense=float(geo.get("percent_dense", 0.01)),
        densify_start_iter=int(geo.get("densify_start_iter", 500)),
        densify_end_iter=int(geo.get("densify_end_iter", 15000)),
        densification_interval=int(geo.get("densification_interval", 100)),
        opacity_reset_interval=int(geo.get("opacity_reset_interval", 3000)),
        densify_grad_threshold=float(geo.get("densify_grad_threshold", 2e-4)),
        coarse_to_fine=bool(geo.get("coarse-to-fine", False)),
        prune_iterations=tuple(config.get("prune", {}).get("iterations", []) or []),
        prune_v_pow=float(config.get("prune", {}).get("v_pow", 0.1)),
        prune_decay=float(config.get("prune", {}).get("prune_decay", 0.6)),
        prune_percent=float(config.get("prune", {}).get("prune_percent", 0.5)),
        max_sh_degree=int(config.texture.get("max_sh_degree", 3)),
        use_trained_exposure=bool(
            config.appearance.get("use_trained_exposure", False)
        ),
        # The reference keys the VastGaussian appearance mask on
        # geometry.mask (urban3d_admm.yaml:94); accept either spelling.
        use_appearance_mask=bool(
            config.appearance.get("use_appearance_mask", False)
            or geo.get("mask", False)
        ),
        lambda_mask=float(config.loss.get("lambda_mask", 0.0)),
        mask_lr=float(lr.get("mask", 1e-3)),
        optimize_camera_poses=bool(lr.get("pose", 0.0)),
        pose_lr=float(lr.get("pose", 0.0) or 1e-4),
        opt_pose_start_iter=int(config.geometry.get("opt_pose_start_iter", 3000)),
        white_background=bool(config.dataset.get("apply_mask", False)),
        spatial_lr_scale=float(geo.get("spatial_lr_scale", -1.0)),
        chain_steps=int(config.trainer.get("chain_steps", 1)),
        profile_start_step=int(
            config.trainer.get("profile", {}).get("start_step", 0)
        ),
        profile_num_steps=int(config.trainer.get("profile", {}).get("num_steps", 0)),
        profile_dir=str(config.trainer.get("profile", {}).get("dir", "profile")),
    )


def _raster_config(config):
    import jax

    from dogs_tpu.raster.tiled import RasterConfig

    pipe = config.get("pipeline", {})
    use_pallas = pipe.get("use_pallas", None)
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    # Flat chunk-stream kernels are the production default where Pallas is
    # on (chained headline 13.03 vs 12.44 it/s — docs/performance.md);
    # pipeline.pallas_stream: false keeps the per-tile family.
    stream = pipe.get("pallas_stream", None)
    if stream is None:
        stream = bool(use_pallas)
    kw = {"pallas_stream": bool(stream)}
    if pipe.get("tile_batch") is not None:
        kw["tile_batch"] = int(pipe.get("tile_batch"))
    if pipe.get("chunk") is not None:
        kw["chunk"] = int(pipe.get("chunk"))
    bt = pipe.get("base_tiles", None)
    oc = pipe.get("overflow_capacity", None)
    return RasterConfig(
        antialiasing=bool(config.texture.get("anti_aliasing", False)),
        depth_threshold=float(config.geometry.get("depth_threshold", 0.0)),
        max_tiles_per_gaussian=int(pipe.get("max_tiles_per_gaussian", 16)),
        bin_capacity=pipe.get("bin_capacity", None),
        use_pallas=bool(use_pallas),
        base_tiles=None if bt is None else int(bt),
        overflow_capacity=None if oc is None else int(oc),
        **kw,
    )


def create_trainer(config):
    """Factory keyed on neural_field_type (reference utils.py:16-21)."""
    field_type = config.get("neural_field_type", "gs")
    data = _build_dataset(config)

    out_root = os.path.join(config.get("root_dir", "out"), config.get("expname", "exp"))
    os.makedirs(out_root, exist_ok=True)
    from dogs_tpu.train.checkpoint import CheckpointManager

    ckpt_manager = CheckpointManager(
        os.path.join(out_root, "model"),
        max_to_keep=int(config.trainer.get("max_to_keep", 3)),
    )
    writer = None
    if bool(config.trainer.get("enable_tensorboard", False)):
        try:
            from tensorboardX import SummaryWriter

            writer = SummaryWriter(os.path.join(out_root, "logs"))
        except Exception:  # pragma: no cover - optional dependency
            writer = None

    if field_type == "scaffold_gs":
        from dogs_tpu.fields.scaffold import ScaffoldConfig, ScaffoldGSTrainer

        anchor = config.get("anchor", {})
        geo = config.geometry
        lr = config.optimizer.lr
        scfg = ScaffoldConfig(
            max_iterations=int(config.trainer.max_iterations),
            voxel_size=float(
                anchor.get("voxel_size", geo.get("voxel_size", 0.05))
            ),
            k_offsets=int(anchor.get("n_offsets", geo.get("num_offsets", 10))),
            lambda_dssim=float(config.loss.get("lambda_dssim", 0.2)),
            lambda_scale=float(config.loss.get("lambda_scale", 0.01)),
            anchor_lr_init=float(lr.get("position_init", 1.6e-4)),
            anchor_lr_final=float(lr.get("position_final", 1.6e-6)),
            feat_lr=float(lr.get("anchor_feat", lr.get("feature", 4e-3))),
            offset_lr_init=float(lr.get("offset_init", 1e-2)),
            offset_lr_final=float(lr.get("offset_final", 1e-4)),
            scaling_lr=float(lr.get("scaling", 7e-3)),
            mlp_lr_init=float(lr.get("mlp_opacity_init", 2e-3)),
            mlp_lr_final=float(lr.get("mlp_opacity_final", 2e-5)),
            app_lr=float(lr.get("app_embedding_init", 5e-2)),
            update_depth=int(geo.get("update_depth", 3)),
            update_init_factor=int(geo.get("update_init_factor", 16)),
            update_hierarchy_factor=int(geo.get("update_hierarchy_factor", 4)),
            stat_start_iter=int(geo.get("stat_start_iter", 500)),
            densify_start_iter=int(geo.get("densify_start_iter", 1500)),
            densify_end_iter=int(geo.get("densify_end_iter", 15000)),
            densification_interval=int(geo.get("densification_interval", 100)),
            densify_grad_threshold=float(geo.get("densify_grad_threshold", 2e-4)),
            use_feat_bank=bool(geo.get("use_feat_bank", False)),
            appearance_dim=int(config.texture.get("appearance_dim", 0)),
        )
        trainer = ScaffoldGSTrainer(
            cameras=data["train_cameras"],
            images=data["train_images"],
            points=data["points"],
            raster_cfg=_raster_config(config),
            val_cameras=data["val_cameras"],
            val_images=data["val_images"],
            seed=int(config.get("seed", 42)),
            scaffold_cfg=scfg,
        )
    else:
        from dogs_tpu.train.trainer import GaussianSplatTrainer

        trainer = GaussianSplatTrainer(
            cameras=data["train_cameras"],
            images=data["train_images"],
            points=data["points"],
            colors=data["colors"],
            cfg=_trainer_config(config),
            raster_cfg=_raster_config(config),
            val_cameras=data["val_cameras"],
            val_images=data["val_images"],
            seed=int(config.get("seed", 42)),
        )
    return trainer, ckpt_manager, writer
