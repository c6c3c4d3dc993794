"""Naive (but exact) jnp rasterizer — the correctness oracle.

This renders the same math as the CUDA tile pipeline
(cuda_rasterizer/forward.cu:350-501) with zero approximation tricks: sort ALL
Gaussians by depth, evaluate every (pixel, Gaussian) alpha, and composite with
an exclusive cumulative product of transmittance. O(H*W*N) memory — only for
tiny test scenes and for validating the production tiled renderer + its VJP
(SURVEY.md §4 test pyramid, tier 2).

Fully differentiable via autodiff; `jax.grad` of this renderer is the ground
truth for the tiled renderer's gradients.
"""

from __future__ import annotations

import flax.struct
import jax.numpy as jnp

from dogs_tpu.core.camera import Camera
from dogs_tpu.core.gaussians import GaussianParams
from dogs_tpu.core.transforms import HIGHEST
from dogs_tpu.raster.projection import gaussian_alpha, project_gaussians


@flax.struct.dataclass
class RenderOutput:
    image: jnp.ndarray  # (H, W, 3)
    alpha: jnp.ndarray  # (H, W) accumulated opacity
    invdepth: jnp.ndarray  # (H, W) expected inverse depth
    radii: jnp.ndarray  # (C,) screen radii; 0 = culled (densify bookkeeping)
    # Binning telemetry (tiled renderer only; None from the oracle). The
    # static key budgets (base_tiles / overflow pool / bin_capacity) can
    # silently drop splats — these scalars make that observable per step.
    bin_valid: jnp.ndarray | None = None  # () valid (tile, depth) entries
    bin_rect_truncated: jnp.ndarray | None = None  # () gaussians rect-clamped
    bin_pool_truncated: jnp.ndarray | None = None  # () gaussians past the pool
    bin_dropped: jnp.ndarray | None = None  # () valid entries cut by capacity
    bin_pool_need: jnp.ndarray | None = None  # () pool slots demanded


def render_reference(
    params: GaussianParams,
    camera: Camera,
    background: jnp.ndarray | None = None,
    alive: jnp.ndarray | None = None,
    active_sh_degree: int = 3,
    antialiasing: bool = False,
    means2d_offset: jnp.ndarray | None = None,
    tile_membership: jnp.ndarray | None = None,
    tile_size: int = 16,
) -> RenderOutput:
    """tile_membership: optional (n_tiles, N) bool from
    `dogs_tpu.raster.binning.bins_membership`; restricts each Gaussian's
    support to its binned tiles so comparisons against the tiled renderer are
    exact (the tiled path, like the CUDA kernel, only blends inside the
    3-sigma tile rect)."""
    h, w = camera.height, camera.width
    if background is None:
        background = jnp.zeros((3,), jnp.float32)

    proj = project_gaussians(
        params,
        camera,
        alive=alive,
        active_sh_degree=active_sh_degree,
        antialiasing=antialiasing,
        means2d_offset=means2d_offset,
    )
    visible = proj.radius > 0.0

    order = jnp.argsort(jnp.where(visible, proj.depth, jnp.float32(jnp.inf)))
    means2d = proj.means2d[order]
    conic = proj.conic[order]
    color = proj.color[order]
    opacity = jnp.where(visible, proj.opacity, 0.0)[order]
    depth = proj.depth[order]

    ys = jnp.arange(h, dtype=jnp.float32) + 0.5
    xs = jnp.arange(w, dtype=jnp.float32) + 0.5
    pix = jnp.stack(jnp.meshgrid(xs, ys, indexing="xy"), axis=-1)  # (H, W, 2)

    # alpha[h, w, n] for every Gaussian at every pixel.
    alphas = gaussian_alpha(
        conic[None, None],
        opacity[None, None],
        means2d[None, None],
        pix[:, :, None, :],
    )
    if tile_membership is not None:
        n_tiles_x = -(-w // tile_size)
        py = jnp.arange(h) // tile_size
        px = jnp.arange(w) // tile_size
        pix_tile = py[:, None] * n_tiles_x + px[None, :]  # (H, W)
        member = tile_membership[:, order]  # match sorted order
        alphas = jnp.where(member[pix_tile], alphas, 0.0)
    # Exclusive transmittance via cumulative log(1 - alpha); mirrors the CUDA
    # sequential T *= (1 - alpha) but as a parallel prefix op.
    log_t = jnp.cumsum(jnp.log1p(-alphas), axis=-1)
    trans_incl = jnp.exp(log_t)
    trans_excl = jnp.concatenate(
        [jnp.ones_like(log_t[..., :1]), trans_incl[..., :-1]], axis=-1
    )
    # CUDA early-out (forward.cu): a splat blends only while the would-be
    # transmittance stays >= 1e-4, and the cutoff is sticky (done flag).
    contributes = jnp.cumsum((trans_incl < 1e-4).astype(jnp.int32), axis=-1) == 0
    weight = jnp.where(contributes, alphas * trans_excl, 0.0)

    image = jnp.einsum("hwn,nc->hwc", weight, color, precision=HIGHEST)
    acc_alpha = jnp.sum(weight, axis=-1)
    invdepth = jnp.sum(weight / depth[None, None, :], axis=-1)
    image = image + (1.0 - acc_alpha)[..., None] * background

    return RenderOutput(image=image, alpha=acc_alpha, invdepth=invdepth, radii=proj.radius)
