"""Eval CLI — parity with the reference's eval.py:44-96.

Loads the latest checkpoint of each scene's experiment, evaluates the val
split (PSNR/SSIM/LPIPS, metrics.json, renders) and exports
.splat/.ply/COLMAP artifacts.
"""

from __future__ import annotations

import copy
import logging
import os

from dogs_tpu.utils.config import config_parser, load_config
from utils import create_trainer

logging.basicConfig(level=logging.INFO)
logger = logging.getLogger("eval")


def create_evaluator(config, trainer):
    """Evaluator factory keyed on neural_field_type (eval.py:18-41)."""
    import numpy as np

    from dogs_tpu.eval.evaluator import EvalConfig, GaussianSplatEvaluator

    out_root = os.path.join(config.get("root_dir", "out"), config.get("expname", "exp"))
    cc = config.get("eval", {}).get("color_correct", None)
    cfg = EvalConfig(
        output_dir=os.path.join(out_root, "eval"),
        # default None = reference behavior (color-correct val, not test)
        apply_color_correction=None if cc is None else bool(cc),
        active_sh_degree=int(config.texture.get("max_sh_degree", 3)),
    )
    if config.get("neural_field_type", "gs") == "scaffold_gs":

        class ScaffoldEvaluator(GaussianSplatEvaluator):
            """Scaffold renders are view-dependent (MLP-decoded); rendering
            overrides the splat path, exports snapshot a canonical view's
            neural gaussians."""

            def __init__(self, sp, alive, raster_cfg, cfg, cameras):
                self.sp = sp
                self.alive = alive
                self.raster_cfg = raster_cfg
                self.cfg = cfg
                self._export_camera = cameras[0] if cameras else None

            def render(self, camera):
                from dogs_tpu.fields.scaffold import render_scaffold
                import jax.numpy as jnp

                out = render_scaffold(
                    self.sp, camera, self.raster_cfg,
                    background=jnp.asarray(self.cfg.background, jnp.float32),
                    alive=self.alive,
                )
                return np.clip(np.asarray(out.image), 0.0, 1.0)

            @property
            def model(self):
                from dogs_tpu.fields.model import GaussianModelState, fresh_stats
                from dogs_tpu.fields.scaffold import generate_neural_gaussians
                import jax.numpy as jnp

                g, colors, alive = generate_neural_gaussians(
                    self.sp, self._export_camera, alive=self.alive
                )
                from dogs_tpu.core.sh import rgb_to_sh

                params = g.replace(feat_dc=rgb_to_sh(colors)[:, None, :])
                ga, de, mr = fresh_stats(params.capacity)
                return GaussianModelState(
                    params=params, alive=alive, grad_accum=ga, denom=de,
                    max_radii2d=mr,
                )

        return ScaffoldEvaluator(
            trainer.state.params, trainer.state.alive, trainer.raster_cfg, cfg,
            trainer.val_cameras,
        )
    return GaussianSplatEvaluator(trainer.state.model, trainer.raster_cfg, cfg)


def evaluate_admm(config) -> None:
    """Evaluate a block-parallel ADMM run: reconstruct the fused global model
    from the distributed checkpoint on ONE device (the reference evaluator
    merges per-block checkpoints, conerf/evaluators/evaluator.py:213-259)."""
    from train_admm import load_val_split

    from dogs_tpu.eval.evaluator import EvalConfig, GaussianSplatEvaluator
    from dogs_tpu.parallel.master import (
        load_fused_from_checkpoint,
        load_manifest_partition,
    )
    from dogs_tpu.train.checkpoint import CheckpointManager
    from utils import _raster_config

    scene = config.dataset.scene
    root = os.path.join(config.dataset.root_dir, scene)
    mx = int(config.dataset.get("mx", 2))
    my = int(config.dataset.get("my", 2))
    _, partition = load_manifest_partition(root, mx, my)

    out_root = os.path.join(config.get("root_dir", "out"), config.get("expname", "exp"))
    manager = CheckpointManager(os.path.join(out_root, "model"))
    ckpt = config.trainer.get("ckpt_path", "") or manager.latest_path()
    if not ckpt:
        logger.warning("no ADMM checkpoint found for %s", config.expname)
        return
    model = load_fused_from_checkpoint(ckpt, partition)
    logger.info("fused model: %d gaussians from %s", int(model.num_alive), ckpt)

    cc = config.get("eval", {}).get("color_correct", None)
    evaluator = GaussianSplatEvaluator(
        model,
        _raster_config(config),
        EvalConfig(
            output_dir=os.path.join(out_root, "eval"),
            apply_color_correction=None if cc is None else bool(cc),
            active_sh_degree=int(config.texture.get("max_sh_degree", 3)),
        ),
    )
    cams, imgs = load_val_split(config, scene)
    result = evaluator.eval(cams, imgs, split="val")
    evaluator.export(os.path.join(out_root, "export"))
    logger.info("val mean: %s", result["mean"])


def evaluate(config) -> None:
    if bool(config.dataset.get("multi_blocks", False)):
        return evaluate_admm(config)
    trainer, ckpt_manager, _ = create_trainer(config)
    step = trainer.load_checkpoint(ckpt_manager)
    if step == 0:
        logger.warning("no checkpoint found for %s", config.expname)
    evaluator = create_evaluator(config, trainer)
    result = evaluator.eval(
        trainer.val_cameras, trainer.val_images, split="val", step=step
    )
    out_root = os.path.join(config.get("root_dir", "out"), config.get("expname", "exp"))
    evaluator.export(os.path.join(out_root, "export"))
    if trainer.val_cameras and bool(config.get("eval", {}).get("test_trajectory", True)):
        evaluator.eval_test_trajectory(
            trainer.val_cameras[0],
            n_poses=int(config.get("eval", {}).get("n_test_poses", 30)),
            radius=float(config.get("eval", {}).get("test_radius", 3.0)),
        )
    logger.info("val mean: %s", result["mean"])


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
            f"{cfg.dataset.name}_{scene}"
        )
        if bool(cfg.dataset.get("multi_blocks", False)):
            expname += "_admm"  # matches train_admm.py's experiment naming
        if args.suffix:
            expname += f"_{args.suffix}"
        cfg.expname = expname
        evaluate(cfg)


if __name__ == "__main__":
    main()
