"""Production tiled rasterizer: static-shape XLA pipeline with custom VJP.

TPU-native re-design of the CUDA tile rasterizer
(cuda_rasterizer/rasterizer_impl.cu:334-498 forward, backward.cu:454-790
backward). The CUDA design — ragged per-tile lists, shared-memory staging,
per-warp bucket replay — does not map to XLA; instead:

  forward:  project (XLA, see projection.py) -> bin+sort (binning.py) ->
            per-tile-batch chunked alpha blending. Transmittance is tracked
            in log space; the per-chunk inclusive cumsum of log(1-alpha)
            replaces the sequential `T *= (1-alpha)` loop with a parallel
            prefix op that the VPU eats whole. A `while_loop` gives each tile
            batch a DYNAMIC trip count (total work tracks actual splat
            counts, like the CUDA kernel) with batch-level saturation
            early-exit; this is legal because the backward is hand-written.

  backward: replays the same chunk schedule front-to-back (the classic 3DGS
            recompute-from-totals backward rather than Taming's bucket
            snapshots — zero per-splat residual memory). The only residuals
            are the forward outputs themselves. Per-splat gradients reduce
            over the tile's pixels then scatter-add into the N-space buffers
            (the XLA analogue of backward.cu's warp-reduction + atomicAdd).

Gradient identity used (per pixel, splats in blend order, w_i = a_i * T_i):
  dL/da_i = (gC.c_i + gA + gD d_i) T_i - (Gtot - prefixG_i) / (1 - a_i)
where G_j = (gC.c_j + gA + gD d_j) w_j and Gtot = gC.Ctot + gA Atot + gD Dtot.
The suffix sum over later splats becomes total-minus-prefix, so the backward
needs only ONE extra running accumulator.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp

from dogs_tpu.core.camera import Camera
from dogs_tpu.core.gaussians import GaussianParams
from dogs_tpu.raster.binning import TileBins, build_tile_bins
from dogs_tpu.raster.projection import ALPHA_MIN, project_gaussians
from dogs_tpu.raster.reference import RenderOutput

LOG_TMIN = math.log(1e-4)  # CUDA early-out threshold (forward.cu T < 1e-4)


@dataclasses.dataclass(frozen=True)
class RasterConfig:
    """Static rasterizer knobs (hashable; part of the jit cache key)."""

    tile_size: int = 16
    max_tiles_per_gaussian: int = 25
    tile_batch: int = 128  # tiles blended concurrently per loop step
    chunk: int = 64  # splats consumed per tile per loop step
    antialiasing: bool = False
    tile_culling: bool = True
    depth_threshold: float = 0.0  # near-Gaussian grad damping (see backward)


def _pixel_coords(tiles: jnp.ndarray, n_tiles_x: int, ts: int):
    """(TB,) tile ids -> (TB, P) pixel-center x/y coordinates."""
    ty = tiles // n_tiles_x
    tx = tiles - ty * n_tiles_x
    p = jnp.arange(ts * ts, dtype=jnp.int32)
    py_in = p // ts
    px_in = p - py_in * ts
    px = tx[:, None] * ts + px_in[None, :]
    py = ty[:, None] * ts + py_in[None, :]
    return px.astype(jnp.float32) + 0.5, py.astype(jnp.float32) + 0.5


def _chunk_alphas(mu, con, opa, px, py, valid):
    """Alpha for a gathered chunk. mu (TB,K,2) con (TB,K,3) opa (TB,K),
    px/py (TB,P), valid (TB,K) -> alpha (TB,K,P), plus (dx, dy, power)."""
    dx = px[:, None, :] - mu[:, :, 0:1]
    dy = py[:, None, :] - mu[:, :, 1:2]
    a = con[:, :, 0:1]
    b = con[:, :, 1:2]
    c = con[:, :, 2:3]
    power = -0.5 * (a * dx * dx + c * dy * dy) - b * dx * dy
    alpha = jnp.minimum(0.99, opa[:, :, None] * jnp.exp(jnp.minimum(power, 0.0)))
    alpha = jnp.where((alpha >= ALPHA_MIN) & valid[:, :, None], alpha, 0.0)
    return alpha, dx, dy, power


def _blend_with_vjp(
    bins: TileBins,
    means2d: jnp.ndarray,
    conic: jnp.ndarray,
    color: jnp.ndarray,
    opacity: jnp.ndarray,
    invd: jnp.ndarray,
    background: jnp.ndarray,
    depth: jnp.ndarray,
    n_tiles_y: int,
    n_tiles_x: int,
    cfg: RasterConfig,
):
    """Custom-VJP alpha blending over tiles. Returns (image_tiles, A, D) with
    image already background-composited; shapes (T_pad, P, 3)/(T_pad, P)x2.

    NOTE: every float array that gradients flow through is threaded
    explicitly through the custom_vjp; only the integer bin structure lives
    in the closure (custom_vjp forbids closing over differentiated tracers).
    """
    ts = cfg.tile_size
    p = ts * ts
    k = cfg.chunk
    tb = cfg.tile_batch
    n_tiles = n_tiles_y * n_tiles_x
    n_batches = -(-n_tiles // tb)
    n_pad = n_batches * tb
    m = bins.sorted_idx.shape[0]
    n = means2d.shape[0]

    sorted_idx = bins.sorted_idx  # int32 — safe to close over
    starts_all = bins.tile_starts  # int32 — safe to close over

    def batch_ranges(b):
        tiles = b * tb + jnp.arange(tb, dtype=jnp.int32)
        in_grid = tiles < n_tiles
        tiles_c = jnp.minimum(tiles, n_tiles - 1)
        s0 = starts_all[tiles_c]
        s1 = starts_all[tiles_c + 1]
        s1 = jnp.where(in_grid, s1, s0)  # padded tiles: empty range
        px, py = _pixel_coords(tiles_c, n_tiles_x, ts)
        return s0, s1, px, py

    def gather_chunk(s0, s1, step):
        pos = s0[:, None] + step * k + jnp.arange(k, dtype=jnp.int32)[None, :]
        valid = pos < s1[:, None]
        g = sorted_idx[jnp.minimum(pos, m - 1)]
        g = jnp.where(valid, g, 0)
        return g, valid

    def forward_batch(b, arrs):
        means2d_, conic_, color_, opacity_, invd_ = arrs
        s0, s1, px, py = batch_ranges(b)
        max_cnt = jnp.max(s1 - s0)

        def cond(st):
            step, log_t = st[0], st[1]
            alive = jnp.max(log_t) >= LOG_TMIN
            return (step * k < max_cnt) & alive

        def body(st):
            step, log_t, acc_c, acc_a, acc_d = st
            g, valid = gather_chunk(s0, s1, step)
            alpha, _, _, _ = _chunk_alphas(
                means2d_[g], conic_[g], opacity_[g], px, py, valid
            )
            lg = jnp.log1p(-alpha)
            cum = jnp.cumsum(lg, axis=1)
            log_t_incl = log_t[:, None, :] + cum
            w = jnp.where(
                log_t_incl >= LOG_TMIN, alpha * jnp.exp(log_t_incl - lg), 0.0
            )
            acc_c = acc_c + jnp.einsum(
                "tkp,tkc->tpc", w, color_[g], precision=jax.lax.Precision.HIGHEST
            )
            acc_a = acc_a + jnp.sum(w, axis=1)
            acc_d = acc_d + jnp.sum(w * invd_[g][:, :, None], axis=1)
            log_t = log_t + cum[:, -1, :]
            return step + 1, log_t, acc_c, acc_a, acc_d

        init = (
            jnp.int32(0),
            jnp.zeros((tb, p), jnp.float32),
            jnp.zeros((tb, p, 3), jnp.float32),
            jnp.zeros((tb, p), jnp.float32),
            jnp.zeros((tb, p), jnp.float32),
        )
        _, _, acc_c, acc_a, acc_d = jax.lax.while_loop(cond, body, init)
        return acc_c, acc_a, acc_d

    def fwd_impl(means2d_, conic_, color_, opacity_, invd_, background_):
        arrs = (means2d_, conic_, color_, opacity_, invd_)

        def step(b, bufs):
            img, aa, dd = bufs
            acc_c, acc_a, acc_d = forward_batch(b, arrs)
            img = jax.lax.dynamic_update_slice(img, acc_c, (b * tb, 0, 0))
            aa = jax.lax.dynamic_update_slice(aa, acc_a, (b * tb, 0))
            dd = jax.lax.dynamic_update_slice(dd, acc_d, (b * tb, 0))
            return img, aa, dd

        img = jnp.zeros((n_pad, p, 3), jnp.float32)
        aa = jnp.zeros((n_pad, p), jnp.float32)
        dd = jnp.zeros((n_pad, p), jnp.float32)
        img, aa, dd = jax.lax.fori_loop(0, n_batches, step, (img, aa, dd))
        img_out = img + (1.0 - aa)[..., None] * background_
        return img_out, aa, dd

    def backward_batch(b, arrs, cot_c, cot_a_eff, cot_d, tot_c, tot_a, tot_d, grads):
        """cot_* are (TB, P[,3]) effective cotangents for this batch;
        tot_* the forward splat-only totals. Accumulates into `grads` (N+1,10)."""
        means2d_, conic_, color_, opacity_, invd_, depth_ = arrs
        s0, s1, px, py = batch_ranges(b)
        max_cnt = jnp.max(s1 - s0)
        # Per-pixel total G (see module docstring).
        g_tot = (
            jnp.einsum("tpc,tpc->tp", cot_c, tot_c)
            + cot_a_eff * tot_a
            + cot_d * tot_d
        )

        def cond(st):
            step, log_t = st[0], st[1]
            alive = jnp.max(log_t) >= LOG_TMIN
            return (step * k < max_cnt) & alive

        def body(st):
            step, log_t, prefix_g, grads = st
            g, valid = gather_chunk(s0, s1, step)
            mu = means2d_[g]
            con = conic_[g]
            col = color_[g]
            opa = opacity_[g]
            dv = invd_[g]
            dep = depth_[g]
            alpha, dx, dy, power = _chunk_alphas(mu, con, opa, px, py, valid)
            lg = jnp.log1p(-alpha)
            cum = jnp.cumsum(lg, axis=1)
            log_t_incl = log_t[:, None, :] + cum
            contributes = log_t_incl >= LOG_TMIN
            t_excl = jnp.exp(log_t_incl - lg)
            w = jnp.where(contributes, alpha * t_excl, 0.0)

            # Per-splat per-pixel "direct" cotangent gC.c + gA + gD d.
            direct = (
                jnp.einsum(
                    "tpc,tkc->tkp", cot_c, col, precision=jax.lax.Precision.HIGHEST
                )
                + cot_a_eff[:, None, :]
                + cot_d[:, None, :] * dv[:, :, None]
            )
            g_term = direct * w  # = G_j per (tile, splat, pixel)
            prefix_incl = prefix_g[:, None, :] + jnp.cumsum(g_term, axis=1)
            suffix = g_tot[:, None, :] - prefix_incl
            d_alpha = jnp.where(
                contributes & (alpha > 0.0),
                direct * t_excl - suffix / (1.0 - alpha),
                0.0,
            )
            # Chain through alpha = min(0.99, opa * exp(power)).
            not_clamped = (alpha < 0.99) & (alpha > 0.0)
            d_alpha = jnp.where(not_clamped, d_alpha, 0.0)
            expp = jnp.exp(jnp.minimum(power, 0.0))
            d_opa = jnp.sum(d_alpha * expp, axis=2)  # (TB, K)
            d_power = d_alpha * alpha
            a_ = con[:, :, 0:1]
            b_ = con[:, :, 1:2]
            c_ = con[:, :, 2:3]
            d_ca = jnp.sum(d_power * (-0.5 * dx * dx), axis=2)
            d_cb = jnp.sum(d_power * (-dx * dy), axis=2)
            d_cc = jnp.sum(d_power * (-0.5 * dy * dy), axis=2)
            # power = -0.5(a dx^2 + c dy^2) - b dx dy with d = pix - mu, so
            # d(power)/d(mu_x) = a dx + b dy (sign flip through d).
            d_mux = jnp.sum(d_power * (a_ * dx + b_ * dy), axis=2)
            d_muy = jnp.sum(d_power * (c_ * dy + b_ * dx), axis=2)
            # Color / invdepth grads.
            d_col = jnp.einsum(
                "tkp,tpc->tkc", w, cot_c, precision=jax.lax.Precision.HIGHEST
            )
            d_dv = jnp.sum(w * cot_d[:, None, :], axis=2)

            if cfg.depth_threshold > 0.0:
                # Reference damps screen-space position grads for Gaussians
                # closer than depth_threshold x scene scale
                # (diff_gaussian_rasterization/__init__.py:171-185).
                damp = jnp.minimum(1.0, (dep / cfg.depth_threshold) ** 2)
                d_mux = d_mux * damp
                d_muy = d_muy * damp

            entry = jnp.stack(
                [
                    d_mux,
                    d_muy,
                    d_ca,
                    d_cb,
                    d_cc,
                    d_col[:, :, 0],
                    d_col[:, :, 1],
                    d_col[:, :, 2],
                    d_opa,
                    d_dv,
                ],
                axis=-1,
            )  # (TB, K, 10)
            idx = jnp.where(valid, g, n).reshape(-1)
            grads = grads.at[idx].add(entry.reshape(-1, 10))
            prefix_g = prefix_g + jnp.sum(g_term, axis=1)
            log_t = log_t + cum[:, -1, :]
            return step + 1, log_t, prefix_g, grads

        init = (
            jnp.int32(0),
            jnp.zeros((tb, p), jnp.float32),
            jnp.zeros((tb, p), jnp.float32),
            grads,
        )
        _, _, _, grads = jax.lax.while_loop(cond, body, init)
        return grads

    @jax.custom_vjp
    def blend(means2d_, conic_, color_, opacity_, invd_, background_, depth_):
        del depth_  # only used in the backward (grad damping)
        return fwd_impl(means2d_, conic_, color_, opacity_, invd_, background_)

    def blend_fwd(means2d_, conic_, color_, opacity_, invd_, background_, depth_):
        out = fwd_impl(means2d_, conic_, color_, opacity_, invd_, background_)
        img_out, aa, dd = out
        tot_c = img_out - (1.0 - aa)[..., None] * background_  # splat-only
        residual = (
            means2d_, conic_, color_, opacity_, invd_, background_, depth_,
            tot_c, aa, dd,
        )
        return out, residual

    def blend_bwd(res, cots):
        (
            means2d_, conic_, color_, opacity_, invd_, background_, depth_,
            tot_c_all, tot_a_all, tot_d_all,
        ) = res
        cot_img, cot_a, cot_d_in = cots
        # image = C + (1-A) bg  =>  effective gA = cot_a - bg . cot_img.
        cot_a_eff_all = cot_a - jnp.einsum("c,tpc->tp", background_, cot_img)
        d_bg = jnp.einsum("tpc,tp->c", cot_img, 1.0 - tot_a_all)
        arrs = (means2d_, conic_, color_, opacity_, invd_, depth_)

        def step(b, grads):
            sl = lambda arr: jax.lax.dynamic_slice_in_dim(arr, b * tb, tb, 0)
            return backward_batch(
                b,
                arrs,
                sl(cot_img),
                sl(cot_a_eff_all),
                sl(cot_d_in),
                sl(tot_c_all),
                sl(tot_a_all),
                sl(tot_d_all),
                grads,
            )

        grads = jnp.zeros((n + 1, 10), jnp.float32)
        grads = jax.lax.fori_loop(0, n_batches, step, grads)
        grads = grads[:n]
        return (
            grads[:, 0:2],  # means2d
            grads[:, 2:5],  # conic
            grads[:, 5:8],  # color
            grads[:, 8],  # opacity
            grads[:, 9],  # invd
            d_bg,
            jnp.zeros_like(depth),  # depth: backward-only input
        )

    blend.defvjp(blend_fwd, blend_bwd)
    return blend(means2d, conic, color, opacity, invd, background, depth)


def render_tiled(
    params: GaussianParams,
    camera: Camera,
    cfg: RasterConfig = RasterConfig(),
    background: jnp.ndarray | None = None,
    alive: jnp.ndarray | None = None,
    active_sh_degree: int = 3,
    scale_modifier: float = 1.0,
    means2d_offset: jnp.ndarray | None = None,
) -> RenderOutput:
    """Full tiled render: the production replacement for
    conerf/render/gaussian_render.py:18-158 `render()`."""
    h, w = camera.height, camera.width
    ts = cfg.tile_size
    n_tiles_y = -(-h // ts)
    n_tiles_x = -(-w // ts)
    n_tiles = n_tiles_y * n_tiles_x
    if background is None:
        background = jnp.zeros((3,), jnp.float32)

    proj = project_gaussians(
        params,
        camera,
        alive=alive,
        active_sh_degree=active_sh_degree,
        antialiasing=cfg.antialiasing,
        scale_modifier=scale_modifier,
        means2d_offset=means2d_offset,
    )
    bins = build_tile_bins(
        proj,
        h,
        w,
        tile_size=ts,
        max_tiles_per_gaussian=cfg.max_tiles_per_gaussian,
        tile_culling=cfg.tile_culling,
    )
    visible = proj.radius > 0.0
    opacity = jnp.where(visible, proj.opacity, 0.0)
    dsafe = jnp.where(visible, proj.depth, 1.0)
    invd = jnp.where(visible, 1.0 / dsafe, 0.0)

    img_tiles, a_tiles, d_tiles = _blend_with_vjp(
        bins,
        proj.means2d,
        proj.conic,
        proj.color,
        opacity,
        invd,
        background,
        jax.lax.stop_gradient(dsafe),
        n_tiles_y,
        n_tiles_x,
        cfg,
    )

    def untile(x):
        if x.ndim == 2:
            x = x[..., None]
        c = x.shape[-1]
        x = x[:n_tiles].reshape(n_tiles_y, n_tiles_x, ts, ts, c)
        x = x.transpose(0, 2, 1, 3, 4).reshape(n_tiles_y * ts, n_tiles_x * ts, c)
        return x[:h, :w]

    image = untile(img_tiles)
    alpha = untile(a_tiles)[..., 0]
    invdepth = untile(d_tiles)[..., 0]
    return RenderOutput(image=image, alpha=alpha, invdepth=invdepth, radii=proj.radius)
