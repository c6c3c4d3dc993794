"""Evaluator: render val/test splits, compute metrics, export models.

Capability parity with the reference evaluator stack
(conerf/evaluators/evaluator.py:110-392 Evaluator +
conerf/evaluators/gaussian_splatting_evaluator.py:22-321): loads per-block
checkpoints from out/<expname>[/block_k], renders every val camera, applies
the optional color-correction warp, computes PSNR/SSIM/LPIPS + render time,
writes per-image and mean metrics to metrics.json, saves renders, and
exports .splat/.ply/COLMAP artifacts at the final iteration.
"""

from __future__ import annotations

import dataclasses
import json
import logging
import os
import time
from typing import Sequence

import jax.numpy as jnp
import numpy as np

from dogs_tpu.core.camera import Camera
from dogs_tpu.eval.metrics import color_correct, lpips, psnr, ssim
from dogs_tpu.fields.io import save_colmap_ply, save_gaussian_ply, save_splat
from dogs_tpu.fields.model import GaussianModelState
from dogs_tpu.raster.tiled import RasterConfig, render_tiled

logger = logging.getLogger(__name__)


def _device_peak_memory_mb() -> float | None:
    """Peak device memory in MB, or None when the backend doesn't report it
    (the CPU backend returns no allocator stats). TPU reports
    peak_bytes_in_use via device.memory_stats()."""
    import jax

    try:
        stats = jax.local_devices()[0].memory_stats()
    except Exception:  # pragma: no cover - backend without stats API
        return None
    if not stats or "peak_bytes_in_use" not in stats:
        return None
    return round(stats["peak_bytes_in_use"] / (1024.0 * 1024.0), 1)


@dataclasses.dataclass
class EvalConfig:
    output_dir: str = "eval"
    save_images: bool = True
    # None = reference behavior: color-correct the val split, not test
    # (gaussian_splatting_evaluator.py:294-299).
    apply_color_correction: bool | None = None
    compute_lpips: bool = True
    export_models: bool = True
    background: tuple = (0.0, 0.0, 0.0)
    active_sh_degree: int = 3


class GaussianSplatEvaluator:
    """Evaluates one (possibly multi-block-merged) Gaussian model."""

    def __init__(
        self,
        model: GaussianModelState,
        raster_cfg: RasterConfig = RasterConfig(),
        cfg: EvalConfig = EvalConfig(),
    ):
        self.model = model
        self.raster_cfg = raster_cfg
        self.cfg = cfg

    def render(self, camera: Camera) -> np.ndarray:
        out = render_tiled(
            self.model.params,
            camera,
            self.raster_cfg,
            background=jnp.asarray(self.cfg.background, jnp.float32),
            alive=self.model.alive,
            active_sh_degree=self.cfg.active_sh_degree,
        )
        return np.clip(np.asarray(out.image), 0.0, 1.0)

    def eval(
        self,
        cameras: Sequence[Camera],
        images: Sequence[np.ndarray],
        split: str = "val",
        step: int | None = None,
    ) -> dict:
        """Renders the split and writes metrics.json
        (gaussian_splatting_evaluator.py:138-251)."""
        out_dir = os.path.join(self.cfg.output_dir, split)
        os.makedirs(out_dir, exist_ok=True)
        cc = self.cfg.apply_color_correction
        if cc is None:
            cc = split == "val"
        per_image = []
        for i, (cam, gt) in enumerate(zip(cameras, images)):
            t0 = time.perf_counter()
            pred = self.render(cam)
            render_time = time.perf_counter() - t0
            gt = np.asarray(gt, np.float32)
            if cc:
                pred = np.asarray(color_correct(jnp.asarray(pred), jnp.asarray(gt)))
            entry = {
                "image": i,
                "psnr": float(psnr(jnp.asarray(pred), jnp.asarray(gt))),
                "ssim": float(ssim(jnp.asarray(pred), jnp.asarray(gt))),
                "render_time": render_time,
            }
            peak = _device_peak_memory_mb()
            if peak is not None:
                # Per-image peak device memory, the reference's per-image
                # peak-VRAM stat (gaussian_splatting_evaluator.py:267-280).
                entry["memory"] = peak
            if self.cfg.compute_lpips:
                val, calibrated = lpips(jnp.asarray(pred), jnp.asarray(gt))
                key = "lpips" if calibrated else "lpips_uncalibrated"
                entry[key] = float(val)
            per_image.append(entry)
            if self.cfg.save_images:
                self._save_image(os.path.join(out_dir, f"{i:05d}.png"), pred)
                self._save_image(os.path.join(out_dir, f"{i:05d}_gt.png"), gt)
        means = {
            k: float(np.mean([e[k] for e in per_image]))
            for k in per_image[0]
            if k != "image"
        }
        means["num_points"] = int(self.model.num_alive)
        if step is not None:
            means["step"] = int(step)
        result = {"mean": means, "per_image": per_image}
        with open(os.path.join(out_dir, "metrics.json"), "w") as f:
            json.dump(result, f, indent=2)
        logger.info("[%s] %s", split, means)
        return result

    def eval_test_trajectory(
        self,
        reference_camera: Camera,
        n_poses: int = 60,
        radius: float = 3.0,
        split: str = "test",
        fps: int = 15,
    ) -> str:
        """Render the spheric test trajectory and write frames + a GIF.

        The reference renders its spheric test split to an ffmpeg mp4
        (gaussian_splatting_evaluator.py:239-244, poses from
        load_colmap.py:677-699); this environment has no ffmpeg, so the
        trajectory exports as a PNG sequence plus an animated GIF.
        """
        import imageio.v2 as imageio

        from dogs_tpu.core.camera import make_camera
        from dogs_tpu.data.dataset import spheric_test_poses

        out_dir = os.path.join(self.cfg.output_dir, split)
        os.makedirs(out_dir, exist_ok=True)
        c2ws = spheric_test_poses(n_poses, radius)
        frames = []
        for i, c2w in enumerate(c2ws):
            R = c2w[:3, :3].T
            t = -R @ c2w[:3, 3]
            cam = make_camera(
                R, t,
                float(reference_camera.fx), float(reference_camera.fy),
                float(reference_camera.cx), float(reference_camera.cy),
                reference_camera.width, reference_camera.height,
            )
            img = (self.render(cam) * 255).astype(np.uint8)
            frames.append(img)
            if self.cfg.save_images:
                imageio.imwrite(os.path.join(out_dir, f"{i:05d}.png"), img)
        gif = os.path.join(out_dir, "trajectory.gif")
        imageio.mimwrite(gif, frames, duration=1000.0 / fps, loop=0)
        logger.info("[%s] wrote %d frames + %s", split, len(frames), gif)
        return gif

    def export(self, out_dir: str, name: str = "model") -> None:
        """.splat + 3DGS .ply + COLMAP-style point cloud
        (gaussian_splatting_evaluator.py:182-194)."""
        if not self.cfg.export_models:
            return
        os.makedirs(out_dir, exist_ok=True)
        alive = np.asarray(self.model.alive)
        save_splat(os.path.join(out_dir, f"{name}.splat"), self.model.params, alive)
        save_gaussian_ply(os.path.join(out_dir, f"{name}.ply"), self.model.params, alive)
        save_colmap_ply(
            os.path.join(out_dir, f"{name}_points.ply"), self.model.params, alive
        )

    @staticmethod
    def _save_image(path: str, img: np.ndarray) -> None:
        import imageio.v2 as imageio

        imageio.imwrite(path, (np.clip(img, 0, 1) * 255).astype(np.uint8))
