"""LightGaussian importance pruning.

Capability parity with the reference's prune module
(conerf/model/gaussian_fields/prune.py:13-65 prune_list +
calculate_v_imp_score, backed by the old rasterizer's f_count mode,
old_diff_gaussian_rasterization/__init__.py:100-147): accumulate each
Gaussian's total contribution over ALL training cameras, score it by
importance x normalized volume^v_pow, and drop the lowest percentile.

TPU design: no separate count kernel. A Gaussian's summed blend weight over
an image equals d(sum(invdepth)) / d(invd_i) — one extra cotangent through
the EXISTING rasterizer VJP (render_tiled's invd_offset hook), so the
importance render reuses the production Pallas backward.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

from dogs_tpu.core.camera import Camera
from dogs_tpu.fields.model import GaussianModelState, prune_only
from dogs_tpu.raster.tiled import RasterConfig, render_tiled


def importance_render(
    model: GaussianModelState,
    camera: Camera,
    raster_cfg: RasterConfig,
    active_sh_degree: int = 3,
) -> jnp.ndarray:
    """(C,) summed blend weights of every Gaussian for one view."""

    def total_invd(offset):
        out = render_tiled(
            model.params,
            camera,
            raster_cfg,
            alive=model.alive,
            active_sh_degree=active_sh_degree,
            invd_offset=offset,
        )
        return jnp.sum(out.invdepth)

    return jax.grad(total_invd)(jnp.zeros((model.capacity,), jnp.float32))


def prune_list(
    model: GaussianModelState,
    cameras: Sequence[Camera],
    raster_cfg: RasterConfig,
    active_sh_degree: int = 3,
) -> jnp.ndarray:
    """Accumulated importance over all training cameras (prune.py:13-33)."""
    imp = jnp.zeros((model.capacity,), jnp.float32)
    fn = jax.jit(
        lambda cam: importance_render(model, cam, raster_cfg, active_sh_degree)
    )
    for cam in cameras:
        imp = imp + fn(cam)
    return imp


def calculate_v_imp_score(
    model: GaussianModelState, importance: jnp.ndarray, v_pow: float
) -> jnp.ndarray:
    """importance x (volume / 90th-percentile-volume)^v_pow (prune.py:34-50)."""
    volume = jnp.prod(model.params.scale, axis=-1)
    alive_vol = jnp.where(model.alive, volume, jnp.nan)
    v90 = jnp.nanpercentile(alive_vol, 90)
    return importance * (volume / jnp.maximum(v90, 1e-12)) ** v_pow


def prune_gaussians(
    model: GaussianModelState, percent: float, scores: jnp.ndarray
) -> GaussianModelState:
    """Drop the lowest `percent` of ALIVE Gaussians by score
    (gaussian_splat_model.py:410-432)."""
    n_alive = jnp.sum(model.alive.astype(jnp.int32))
    k = (percent * (n_alive.astype(jnp.float32) - 1.0)).astype(jnp.int32)
    masked = jnp.where(model.alive, scores, jnp.inf)
    order = jnp.argsort(masked)
    threshold_val = masked[order[jnp.maximum(k, 0)]]
    prune_mask = model.alive & (scores <= threshold_val)
    return prune_only(model, prune_mask)
