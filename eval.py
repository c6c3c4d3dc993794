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
    cfg = EvalConfig(
        output_dir=os.path.join(out_root, "eval"),
        apply_color_correction=bool(config.get("eval", {}).get("color_correct", False)),
        active_sh_degree=int(config.texture.get("max_sh_degree", 3)),
    )
    if config.get("neural_field_type", "gs") == "scaffold_gs":

        class ScaffoldEvaluator(GaussianSplatEvaluator):
            """Scaffold renders are view-dependent (MLP-decoded); rendering
            overrides the splat path, exports snapshot a canonical view's
            neural gaussians."""

            def __init__(self, sp, raster_cfg, cfg, cameras):
                self.sp = sp
                self.raster_cfg = raster_cfg
                self.cfg = cfg
                self._export_camera = cameras[0] if cameras else None

            def render(self, camera):
                from dogs_tpu.fields.scaffold import render_scaffold
                import jax.numpy as jnp

                out = render_scaffold(
                    self.sp, camera, self.raster_cfg,
                    background=jnp.asarray(self.cfg.background, jnp.float32),
                )
                return np.clip(np.asarray(out.image), 0.0, 1.0)

            @property
            def model(self):
                from dogs_tpu.fields.model import GaussianModelState, fresh_stats
                from dogs_tpu.fields.scaffold import generate_neural_gaussians
                import jax.numpy as jnp

                g, colors, alive = generate_neural_gaussians(
                    self.sp, self._export_camera
                )
                from dogs_tpu.core.sh import rgb_to_sh

                params = g.replace(feat_dc=rgb_to_sh(colors)[:, None, :])
                ga, de, mr = fresh_stats(params.capacity)
                return GaussianModelState(
                    params=params, alive=alive, grad_accum=ga, denom=de,
                    max_radii2d=mr,
                )

        return ScaffoldEvaluator(
            trainer.state.params, trainer.raster_cfg, cfg, trainer.val_cameras
        )
    return GaussianSplatEvaluator(trainer.state.model, trainer.raster_cfg, cfg)


def evaluate(config) -> None:
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
        if args.suffix:
            expname += f"_{args.suffix}"
        cfg.expname = expname
        evaluate(cfg)


if __name__ == "__main__":
    main()
