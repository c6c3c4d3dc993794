"""Train CLI — parity with the reference's train.py:24-72.

Usage:
  python train.py --config config/gaussian_splatting/mipnerf360.yaml \
      [--scene garden] [--suffix run1] [dataset.factor=4 ...]

Per-scene loop over `dataset.scene`, builds the trainer via the factory in
utils.py, trains with the configured cadences, validates and checkpoints.
Scenes with `dataset.name: synthetic` train against a generated
teacher-splat scene (no data required — CI/smoke path).
"""

from __future__ import annotations

import copy
import logging
import os
import sys

from dogs_tpu.utils.config import config_parser, load_config
from utils import create_trainer

logging.basicConfig(
    level=logging.INFO, format="%(asctime)s %(levelname)s %(name)s %(message)s"
)
logger = logging.getLogger("train")


def train(config) -> None:
    trainer, ckpt_manager, writer = create_trainer(config)
    if config.trainer.get("ckpt_path", "") or config.trainer.get("resume", False):
        start = trainer.load_checkpoint(
            ckpt_manager, config.trainer.get("ckpt_path") or None
        )
        if start:
            logger.info("resumed from step %d", start)
    remaining = int(config.trainer.max_iterations) - int(trainer.state.step)
    if remaining <= 0:
        logger.info("nothing to do (max_iterations reached)")
        return
    trainer.train(
        num_iterations=remaining,
        log_every=int(config.trainer.get("n_tensorboard", 100)),
        validate_every=int(config.trainer.get("n_validation", 0)),
        checkpoint_every=int(config.trainer.get("n_checkpoint", 0)),
        checkpoint_manager=ckpt_manager,
        tensorboard_writer=writer,
    )
    trainer.save_checkpoint(ckpt_manager)
    val = trainer.validate()
    if val:
        logger.info("final val: %s", val)


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
        logger.info("=== training %s ===", expname)
        train(cfg)


if __name__ == "__main__":
    main()
