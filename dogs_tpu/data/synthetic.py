"""Synthetic Gaussian scenes for tests and benchmarks.

The environment has no COLMAP datasets, so integration tests and bench.py
fit a fresh model against images rendered from a known ground-truth Gaussian
field (the classic "teacher splat" setup). This stands in for the blender/
lego first-milestone slice of SURVEY.md §8.2 until real data is mounted.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from dogs_tpu.core.camera import Camera, look_at_camera
from dogs_tpu.core.gaussians import GaussianParams, inverse_sigmoid
from dogs_tpu.core.sh import rgb_to_sh
from dogs_tpu.raster.tiled import RasterConfig, render_tiled


@dataclasses.dataclass
class SyntheticScene:
    gt_params: GaussianParams
    cameras: list[Camera]
    images: list[np.ndarray]  # (H, W, 3) float32 in [0, 1]
    points: np.ndarray  # noisy init point cloud (N, 3)
    colors: np.ndarray  # (N, 3)


def make_gt_params(n: int, seed: int, max_sh_degree: int = 2, spread: float = 1.0):
    rng = np.random.RandomState(seed)
    k = (max_sh_degree + 1) ** 2
    xyz = rng.uniform(-spread, spread, (n, 3)).astype(np.float32)
    rgb = rng.uniform(0.1, 0.9, (n, 3)).astype(np.float32)
    return GaussianParams(
        xyz=jnp.asarray(xyz),
        feat_dc=rgb_to_sh(jnp.asarray(rgb))[:, None, :],
        feat_rest=jnp.asarray(rng.randn(n, k - 1, 3).astype(np.float32) * 0.02),
        log_scale=jnp.asarray(
            np.log(rng.uniform(0.08, 0.3, (n, 3))).astype(np.float32)
        ),
        quat=jnp.asarray(rng.randn(n, 4).astype(np.float32)),
        logit_opacity=inverse_sigmoid(
            jnp.asarray(rng.uniform(0.4, 0.95, (n, 1)).astype(np.float32))
        ),
    )


def ring_cameras(
    n_cams: int, radius: float, width: int, height: int, focal: float,
    elevation: float = -0.8,
) -> list[Camera]:
    cams = []
    for i in range(n_cams):
        theta = 2.0 * np.pi * i / n_cams
        eye = np.array(
            [radius * np.cos(theta), elevation, radius * np.sin(theta)]
        )
        cams.append(
            look_at_camera(
                eye=eye, target=[0.0, 0.0, 0.0], up=[0.0, -1.0, 0.0],
                fx=focal, fy=focal, width=width, height=height, image_index=i,
            )
        )
    return cams


def make_scene(
    n_gaussians: int = 96,
    n_cams: int = 12,
    width: int = 96,
    height: int = 80,
    seed: int = 0,
    max_sh_degree: int = 2,
    raster_cfg: RasterConfig | None = None,
) -> SyntheticScene:
    cfg = raster_cfg or RasterConfig(tile_batch=16, chunk=32)
    gt = make_gt_params(n_gaussians, seed, max_sh_degree)
    cams = ring_cameras(n_cams, radius=4.0, width=width, height=height, focal=width * 0.9)
    render = jax.jit(
        lambda p, c: render_tiled(p, c, cfg, active_sh_degree=max_sh_degree).image
    )
    images = [np.asarray(render(gt, c)) for c in cams]

    rng = np.random.RandomState(seed + 1)
    points = np.asarray(gt.xyz) + rng.randn(n_gaussians, 3).astype(np.float32) * 0.05
    # Mean color from the DC term as the init color.
    from dogs_tpu.core.sh import sh_to_rgb

    colors = np.clip(np.asarray(sh_to_rgb(gt.feat_dc[:, 0, :])), 0.0, 1.0)
    return SyntheticScene(
        gt_params=gt, cameras=cams, images=images, points=points, colors=colors
    )
