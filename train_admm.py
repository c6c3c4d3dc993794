"""Distributed block-parallel ADMM training CLI.

The reference launches its flagship distributed mode with
`torchrun ... -m conerf.trainers.master_gaussian_trainer`
(conerf/trainers/master_gaussian_trainer.py:839-873,
scripts/train/train_admm_master.sh:35-44): a master process RPC-drives one
slave trainer per block/GPU. Here the same lifecycle is one process driving
a jax.sharding.Mesh: every block is a mesh shard; phase-1 independent
training, the one-time fusion (+ post-merge importance prune), and ADMM
consensus all run as compiled SPMD steps (dogs_tpu/parallel/).

Usage:
  python train_admm.py --config config/gaussian_splatting/urban3d_admm.yaml \
      [--scene rubble] [trainer.max_iterations=80000 ...]

Expects block manifests produced by preprocess_large_scale_data.py under
<root_dir>/<scene>/blocks_{mx}x{my}/. Checkpoints the FULL distributed state
(per-block models + optimizer, duals, slot maps, rho, step) and resumes.
"""

from __future__ import annotations

import copy
import logging
import os

import numpy as np

from dogs_tpu.utils.config import config_parser, load_config

logging.basicConfig(
    level=logging.INFO, format="%(asctime)s %(levelname)s %(name)s %(message)s"
)
logger = logging.getLogger("train_admm")


def build_mesh(num_blocks: int):
    import jax
    from jax.sharding import Mesh

    devices = jax.devices()
    if len(devices) < num_blocks:
        raise SystemExit(
            f"need {num_blocks} devices for {num_blocks} blocks, have "
            f"{len(devices)} — run with XLA_FLAGS="
            f"--xla_force_host_platform_device_count={num_blocks} on CPU, "
            f"or reduce dataset.mx/my"
        )
    return Mesh(np.asarray(devices[:num_blocks]), ("block",))


def admm_config(config):
    from dogs_tpu.parallel.admm import AdmmConfig

    a = config.trainer.get("admm", {})
    return AdmmConfig(
        enable=bool(a.get("enable", True)),
        consensus_interval=int(a.get("consensus_interval", 200)),
        chain_steps=int(a.get("chain_steps", 10)),
        gt_resident=bool(a.get("gt_resident", True)),
        gt_resident_max_bytes=int(a.get("gt_resident_max_bytes", 4 << 30)),
        gt_dtype=str(a.get("gt_dtype", "uint8")),
        over_relaxation_coeff=float(a.get("over_relaxation_coeff", 0.5)),
        alpha_xyz=float(a.get("alpha_xyz", 1e5)),
        alpha_fdc=float(a.get("alpha_fdc", 1e4)),
        alpha_fr=float(a.get("alpha_fr", 1e5)),
        alpha_s=float(a.get("alpha_s", 1e4)),
        alpha_q=float(a.get("alpha_q", 1e5)),
        alpha_o=float(a.get("alpha_o", 1e4)),
        stop_adapt_iter=int(a.get("stop_adapt_iter", 32000)),
        mu=float(a.get("mu", 10.0)),
        tau_inc=float(a.get("tau_inc", 2.0)),
        tau_dec=float(a.get("tau_dec", 2.0)),
    )


def load_val_split(config, scene: str):
    """(cameras, images) for fused-model validation (master:314
    load_val_dataset)."""
    if config.dataset.get("name", "") == "synthetic":
        from preprocess_large_scale_data import synthetic_block_scene

        sc, _, _, n_val = synthetic_block_scene(config)
        return sc.cameras[:n_val], [np.asarray(im) for im in sc.images[:n_val]]
    from dogs_tpu.data.dataset import load_scene

    root = os.path.join(config.dataset.root_dir, scene)
    data = load_scene(
        root,
        factor=int(config.dataset.get("factor", 1)),
        val_interval=int(config.dataset.get("val_interval", 8)),
        model_folder=config.dataset.get("model_folder", "sparse"),
        normalize=bool(config.dataset.get("scale", True)),
        use_manhattan_world=bool(
            config.dataset.get("use_manhattan_world", False)
        ),
        scene_name=scene,
        dataset_name=str(config.dataset.get("name", "")),
    )
    cams = [r.to_camera() for r in data.val_cameras]
    imgs = [r.load() for r in data.val_cameras]
    return cams, imgs


def train_scene(config, scene: str) -> dict:
    from utils import _raster_config, _trainer_config

    from dogs_tpu.parallel.master import MasterTrainer
    from dogs_tpu.train.checkpoint import CheckpointManager

    mx = int(config.dataset.get("mx", 2))
    my = int(config.dataset.get("my", 2))
    mesh = build_mesh(mx * my)
    root = os.path.join(config.dataset.root_dir, scene)

    master = MasterTrainer.from_manifests(
        mesh, root, mx, my,
        trainer_cfg=_trainer_config(config),
        raster_cfg=_raster_config(config),
        admm_cfg=admm_config(config),
        spatial_lr_scale=float(config.geometry.get("spatial_lr_scale", -1.0)),
        seed=int(config.get("seed", 42)),
    )

    out_root = os.path.join(
        config.get("root_dir", "out"), config.get("expname", "exp")
    )
    manager = CheckpointManager(
        os.path.join(out_root, "model"),
        max_to_keep=int(config.trainer.get("max_to_keep", 3)),
    )
    if config.trainer.get("ckpt_path", "") or config.trainer.get("resume", False):
        start = master.load_checkpoint(
            manager, config.trainer.get("ckpt_path") or None
        )
        if start:
            logger.info("resumed from step %d (admm=%s)", start, master.admm_enabled)

    max_iters = int(config.trainer.max_iterations)
    n_checkpoint = int(config.trainer.get("n_checkpoint", 0))
    n_validation = int(config.trainer.get("n_validation", 0))
    metrics = {}
    last_ckpt = last_val = master.step
    while master.step < max_iters:
        metrics = master.train_iteration()
        logger.info(
            "step %d %s%s",
            master.step,
            " ".join(f"{k}={v:.4g}" for k, v in sorted(metrics.items())),
            " [admm]" if master.admm_enabled else "",
        )
        if n_validation and master.step - last_val >= n_validation:
            cams, imgs = load_val_split(config, scene)
            val = master.validate(cams, imgs)
            logger.info("step %d val %s", master.step, val)
            last_val = master.step
        if n_checkpoint and master.step - last_ckpt >= n_checkpoint:
            master.save_checkpoint(manager)
            last_ckpt = master.step

    master.save_checkpoint(manager)
    cams, imgs = load_val_split(config, scene)
    val = master.validate(cams, imgs)
    logger.info("final val %s", val)

    # Export the fused global model so eval.py / the viewer can load it
    # (the reference evaluator merges per-block checkpoints,
    # conerf/evaluators/evaluator.py:213-259; we export at train end).
    from dogs_tpu.fields.io import save_gaussian_ply, save_splat

    export_dir = os.path.join(out_root, "export")
    os.makedirs(export_dir, exist_ok=True)
    model = master.global_model()
    save_gaussian_ply(
        os.path.join(export_dir, "point_cloud.ply"), model.params, model.alive
    )
    save_splat(os.path.join(export_dir, "model.splat"), model.params, model.alive)
    logger.info("exported fused model (%d gaussians) to %s",
                int(model.num_alive), export_dir)
    return val


def main():
    parser = config_parser()
    args = parser.parse_args()
    overrides = [o for o in args.opts if "=" in o]
    config = load_config(args.config, cli_overrides=overrides)

    scenes = config.dataset.scene
    if args.scene:
        scenes = [args.scene]
    elif isinstance(scenes, str):
        scenes = [scenes]

    for scene in scenes:
        cfg = copy.deepcopy(config)
        cfg.dataset.scene = scene
        expname = (
            f"{cfg.get('neural_field_type', 'gs')}_{cfg.get('task', 'nvs')}_"
            f"{cfg.dataset.name}_{scene}_admm"
        )
        if args.suffix:
            expname += f"_{args.suffix}"
        cfg.expname = expname
        logger.info("=== ADMM block training %s ===", expname)
        train_scene(cfg, scene)


if __name__ == "__main__":
    main()
