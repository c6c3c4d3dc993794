"""Production tiled rasterizer: static-shape XLA pipeline with custom VJP.

TPU-native re-design of the CUDA tile rasterizer
(cuda_rasterizer/rasterizer_impl.cu:334-498 forward, backward.cu:454-790
backward). The CUDA design — ragged per-tile lists, shared-memory staging,
per-warp bucket replay — does not map to XLA; instead:

  binning:  project (XLA, projection.py) -> compact -> one lax.sort over
            (tile, depth) keys (binning.py), then ONE gather materializes the
            per-entry blend data in sorted order (the "entry matrix",
            K x 12 f32). The hot blend loops then only touch contiguous or
            near-contiguous rows of this matrix instead of random-gathering
            6 separate N-sized arrays per chunk. The gather's own VJP (a
            scatter-add back to the N-space parameters) is left to XLA
            autodiff.

  forward:  per-tile-batch chunked alpha blending. Transmittance is tracked
            in log space; the per-chunk inclusive cumsum of log(1-alpha)
            replaces the sequential `T *= (1-alpha)` loop with a parallel
            prefix op that the VPU eats whole. A `while_loop` gives each tile
            batch a DYNAMIC trip count (total work tracks actual splat
            counts, like the CUDA kernel) with batch-level saturation
            early-exit; this is legal because the backward is hand-written.

  backward: replays the same chunk schedule front-to-back (the classic 3DGS
            recompute-from-totals backward rather than Taming's bucket
            snapshots — zero per-splat residual memory). The only residuals
            are the forward outputs themselves. Per-entry gradients reduce
            over the tile's pixels and are written at UNIQUE entry positions
            (each sorted entry belongs to exactly one tile), so the backward
            has no atomics at all; the single K->N reduction happens in the
            autodiff of the entry gather.

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

# Entry-matrix columns.
_MUX, _MUY, _CA, _CB, _CC, _R, _G, _B, _OPA, _INVD, _DEPTH = range(11)
ENT_WIDTH = 16  # padded for sublane-aligned DMA in the Pallas kernels


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
    bin_capacity: int | None = None  # sorted-entry budget; None = N * max_tiles
    use_pallas: bool = False  # Pallas blend kernels (TPU; interpreted on CPU)
    pallas_chunk: int = 128  # entries per DMA chunk (lane-aligned)
    # Tiles blended per Pallas grid program: each program carries ~1.3 us of
    # fixed cost (scalar setup, out-block pipeline) — at 3888 tiles/frame
    # that is ~5 ms per kernel, so merging tiles amortizes it.
    pallas_tiles_per_program: int = 4
    # Flat chunk-stream kernels (pallas_stream.py): one while_loop walks the
    # whole sorted stream instead of per-tile loops — kills the per-TILE
    # fixed cost the per-tile kernels pay (loop entry + exposed chunk-0 DMA
    # wait). Identical numerics; PRODUCTION DEFAULT where Pallas is on
    # (utils.py:_raster_config flips this with use_pallas; chained A/B on
    # the chip: 13.03 vs 12.44 it/s — docs/performance.md). False here so
    # ad-hoc RasterConfig() still means the per-tile family explicitly.
    pallas_stream: bool = False
    # Two-tier candidate budget (binning.py): every gaussian owns base_tiles
    # key slots, bigger rects draw from a shared overflow pool. None = flat
    # max_tiles_per_gaussian budget.
    base_tiles: int | None = None
    overflow_capacity: int | None = None  # pool slots; None = 2 * N
    # K->N gradient reduction sort payload dtype: "bf16" packs grad pairs
    # into int32 (halves the dominant sort's payload bytes; per-entry grads
    # quantize to 8-bit mantissa BEFORE the <=max_tiles-run summation —
    # far below SGD noise); "f32" keeps exact payloads.
    reduce_dtype: str = "bf16"


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


def _chunk_alphas(rows, px, py, valid):
    """Alpha for a gathered entry chunk. rows (TB,K,12), px/py (TB,P),
    valid (TB,K) -> alpha (TB,K,P), plus (dx, dy, power)."""
    dx = px[:, None, :] - rows[:, :, _MUX, None]
    dy = py[:, None, :] - rows[:, :, _MUY, None]
    a = rows[:, :, _CA, None]
    b = rows[:, :, _CB, None]
    c = rows[:, :, _CC, None]
    power = -0.5 * (a * dx * dx + c * dy * dy) - b * dx * dy
    alpha = jnp.minimum(
        0.99, rows[:, :, _OPA, None] * jnp.exp(jnp.minimum(power, 0.0))
    )
    alpha = jnp.where((alpha >= ALPHA_MIN) & valid[:, :, None], alpha, 0.0)
    return alpha, dx, dy, power


def _blend_with_vjp(
    bins: TileBins,
    sorted_ent: jnp.ndarray,  # (K, ENT_WIDTH) entry matrix in sorted order
    background: jnp.ndarray,
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
    m = sorted_ent.shape[0]

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

    def chunk_positions(s0, s1, step):
        pos = s0[:, None] + step * k + jnp.arange(k, dtype=jnp.int32)[None, :]
        valid = pos < s1[:, None]
        return jnp.minimum(pos, m - 1), valid

    def forward_batch(b, ent):
        s0, s1, px, py = batch_ranges(b)
        max_cnt = jnp.max(s1 - s0)

        def cond(st):
            step, log_t = st[0], st[1]
            alive = jnp.max(log_t) >= LOG_TMIN
            return (step * k < max_cnt) & alive

        def body(st):
            step, log_t, acc_c, acc_a, acc_d = st
            pos, valid = chunk_positions(s0, s1, step)
            rows = ent[pos]
            alpha, _, _, _ = _chunk_alphas(rows, px, py, valid)
            lg = jnp.log1p(-alpha)
            cum = jnp.cumsum(lg, axis=1)
            log_t_incl = log_t[:, None, :] + cum
            w = jnp.where(
                log_t_incl >= LOG_TMIN, alpha * jnp.exp(log_t_incl - lg), 0.0
            )
            # Channel-split reduction: sum_k w * color_c. A (TB,K,P)x(TB,K,3)
            # einsum would hit the MXU with a size-3 output dim (40x padding
            # waste); three VPU reduce passes are far faster.
            acc_c = acc_c + jnp.stack(
                [
                    jnp.sum(w * rows[:, :, _R + c, None], axis=1)
                    for c in range(3)
                ],
                axis=-1,
            )
            acc_a = acc_a + jnp.sum(w, axis=1)
            acc_d = acc_d + jnp.sum(w * rows[:, :, _INVD, None], axis=1)
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

    def fwd_impl(ent, background_):
        def step(b, bufs):
            img, aa, dd = bufs
            acc_c, acc_a, acc_d = forward_batch(b, ent)
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

    def backward_batch(b, ent, cot_c, cot_a_eff, cot_d, tot_c, tot_a, tot_d, d_ent):
        """cot_* are (TB, P[,3]) effective cotangents for this batch;
        tot_* the forward splat-only totals. Writes rows of d_ent (M+1, 12)."""
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
            step, log_t, prefix_g, d_ent = st
            pos, valid = chunk_positions(s0, s1, step)
            rows = ent[pos]
            alpha, dx, dy, power = _chunk_alphas(rows, px, py, valid)
            lg = jnp.log1p(-alpha)
            cum = jnp.cumsum(lg, axis=1)
            log_t_incl = log_t[:, None, :] + cum
            contributes = log_t_incl >= LOG_TMIN
            t_excl = jnp.exp(log_t_incl - lg)
            w = jnp.where(contributes, alpha * t_excl, 0.0)

            # Per-splat per-pixel "direct" cotangent gC.c + gA + gD d,
            # channel-split for the same MXU-padding reason as the forward.
            direct = (
                rows[:, :, _R, None] * cot_c[:, None, :, 0]
                + rows[:, :, _G, None] * cot_c[:, None, :, 1]
                + rows[:, :, _B, None] * cot_c[:, None, :, 2]
                + cot_a_eff[:, None, :]
                + cot_d[:, None, :] * rows[:, :, _INVD, None]
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
            a_ = rows[:, :, _CA, None]
            b_ = rows[:, :, _CB, None]
            c_ = rows[:, :, _CC, None]
            d_ca = jnp.sum(d_power * (-0.5 * dx * dx), axis=2)
            d_cb = jnp.sum(d_power * (-dx * dy), axis=2)
            d_cc = jnp.sum(d_power * (-0.5 * dy * dy), axis=2)
            # power = -0.5(a dx^2 + c dy^2) - b dx dy with d = pix - mu, so
            # d(power)/d(mu_x) = a dx + b dy (sign flip through d).
            d_mux = jnp.sum(d_power * (a_ * dx + b_ * dy), axis=2)
            d_muy = jnp.sum(d_power * (c_ * dy + b_ * dx), axis=2)
            # Color / invdepth grads (channel-split, see forward).
            d_col = jnp.stack(
                [jnp.sum(w * cot_c[:, None, :, c], axis=2) for c in range(3)],
                axis=-1,
            )
            d_dv = jnp.sum(w * cot_d[:, None, :], axis=2)

            if cfg.depth_threshold > 0.0:
                # Reference damps screen-space position grads for Gaussians
                # closer than depth_threshold x scene scale
                # (diff_gaussian_rasterization/__init__.py:171-185).
                damp = jnp.minimum(
                    1.0, (rows[:, :, _DEPTH] / cfg.depth_threshold) ** 2
                )
                d_mux = d_mux * damp
                d_muy = d_muy * damp

            zeros = jnp.zeros_like(d_opa)
            entry = jnp.stack(
                [d_mux, d_muy, d_ca, d_cb, d_cc,
                 d_col[:, :, 0], d_col[:, :, 1], d_col[:, :, 2],
                 d_opa, d_dv] + [zeros] * (ENT_WIDTH - 10),
                axis=-1,
            )  # (TB, K, ENT_WIDTH)
            # Entry positions are globally unique (each sorted entry belongs
            # to one tile) -> plain set, no atomics.
            idx = jnp.where(valid, pos, m).reshape(-1)
            d_ent = d_ent.at[idx].set(
                entry.reshape(-1, ENT_WIDTH), mode="drop", unique_indices=True
            )
            prefix_g = prefix_g + jnp.sum(g_term, axis=1)
            log_t = log_t + cum[:, -1, :]
            return step + 1, log_t, prefix_g, d_ent

        init = (
            jnp.int32(0),
            jnp.zeros((tb, p), jnp.float32),
            jnp.zeros((tb, p), jnp.float32),
            d_ent,
        )
        _, _, _, d_ent = jax.lax.while_loop(cond, body, init)
        return d_ent

    @jax.custom_vjp
    def blend(ent, background_):
        return fwd_impl(ent, background_)

    def blend_fwd(ent, background_):
        out = fwd_impl(ent, background_)
        img_out, aa, dd = out
        tot_c = img_out - (1.0 - aa)[..., None] * background_  # splat-only
        return out, (ent, background_, tot_c, aa, dd)

    def blend_bwd(res, cots):
        ent, background_, tot_c_all, tot_a_all, tot_d_all = res
        cot_img, cot_a, cot_d_in = cots
        # image = C + (1-A) bg  =>  effective gA = cot_a - bg . cot_img.
        cot_a_eff_all = cot_a - jnp.einsum("c,tpc->tp", background_, cot_img)
        d_bg = jnp.einsum("tpc,tp->c", cot_img, 1.0 - tot_a_all)

        def step(b, d_ent):
            sl = lambda arr: jax.lax.dynamic_slice_in_dim(arr, b * tb, tb, 0)
            return backward_batch(
                b,
                ent,
                sl(cot_img),
                sl(cot_a_eff_all),
                sl(cot_d_in),
                sl(tot_c_all),
                sl(tot_a_all),
                sl(tot_d_all),
                d_ent,
            )

        d_ent = jnp.zeros((m + 1, ENT_WIDTH), jnp.float32)
        d_ent = jax.lax.fori_loop(0, n_batches, step, d_ent)
        return d_ent[:m], d_bg

    blend.defvjp(blend_fwd, blend_bwd)
    return blend(sorted_ent, background)


def _blend_with_vjp_pallas(
    aligned_idx: jnp.ndarray,  # (K_pad,) entry -> ent_ext row, sorted order
    aligned_starts: jnp.ndarray,  # (T+1,) compact tile ranges
    ent_ext: jnp.ndarray,  # (N + trash, ENT_WIDTH)
    background: jnp.ndarray,
    n_tiles_y: int,
    n_tiles_x: int,
    cfg: RasterConfig,
):
    """Pallas-kernel blend with the same output contract as the XLA path.
    Returns (image_tiles (T,P,3), A (T,P), D (T,P)), background composited.

    The entries are the COMPACT sorted order (chunk alignment + boundary
    masking happens inside the kernels); the backward reduces per-entry
    gradients to N-space itself with a sort + bounded-run suffix-doubling
    segmented sum. XLA's own scatter-add lowers at ~150M elem/s on v5e
    (~200ms for this reduction); one lax.sort with the live gradient
    columns as payload plus log2(max_tiles_per_gaussian) masked shift-adds
    does it in ~25ms.
    """
    from dogs_tpu.raster import pallas_blend

    ts = cfg.tile_size
    p = ts * ts
    k_al = aligned_idx.shape[0]
    n_ext = ent_ext.shape[0]
    n_tiles = n_tiles_y * n_tiles_x
    interpret = jax.default_backend() == "cpu"

    def fwd_impl(ent_e, background_):
        aligned_t = ent_e[aligned_idx].T  # (W, K_pad)
        if cfg.pallas_stream:
            from dogs_tpu.raster import pallas_stream

            out = pallas_stream.blend_forward_stream(
                aligned_t, aligned_starts, n_tiles_y, n_tiles_x, ts,
                ch=cfg.pallas_chunk, interpret=interpret,
            )  # (T, 8, P)
        else:
            out = pallas_blend.blend_forward_pallas(
                aligned_t, aligned_starts, n_tiles_y, n_tiles_x, ts,
                ch=cfg.pallas_chunk, g_tiles=cfg.pallas_tiles_per_program,
                interpret=interpret,
            )  # (T, 8, P)
        tot_c = jnp.moveaxis(out[:, 0:3, :], 1, 2)  # (T, P, 3)
        aa = out[:, 3, :]
        dd = out[:, 4, :]
        img = tot_c + (1.0 - aa)[..., None] * background_
        return (img, aa, dd), aligned_t

    @jax.custom_vjp
    def blend(ent_e, background_):
        return fwd_impl(ent_e, background_)[0]

    def blend_fwd(ent_e, background_):
        out, aligned_t = fwd_impl(ent_e, background_)
        img, aa, dd = out
        tot_c = img - (1.0 - aa)[..., None] * background_
        return out, (aligned_t, background_, tot_c, aa, dd)

    def blend_bwd(res, cots):
        aligned_t, background_, tot_c, aa, dd = res
        cot_img, cot_a, cot_d = cots
        cot_a_eff = cot_a - jnp.einsum("c,tpc->tp", background_, cot_img)
        d_bg = jnp.einsum("tpc,tp->c", cot_img, 1.0 - aa)
        g_tot = (
            jnp.einsum("tpc,tpc->tp", cot_img, tot_c)
            + cot_a_eff * aa
            + cot_d * dd
        )
        cot = jnp.concatenate(
            [
                jnp.moveaxis(cot_img, 2, 1),  # rows 0-2
                cot_a_eff[:, None, :],
                cot_d[:, None, :],
                g_tot[:, None, :],
                jnp.zeros((cot_img.shape[0], 2, p), jnp.float32),
            ],
            axis=1,
        )  # (T, 8, P)
        if cfg.pallas_stream:
            from dogs_tpu.raster import pallas_stream

            d_ent_t = pallas_stream.blend_backward_stream(
                aligned_t, aligned_starts, cot, n_tiles_y, n_tiles_x,
                ts, ch=cfg.pallas_chunk, depth_threshold=cfg.depth_threshold,
                interpret=interpret,
            )  # (W, K_pad)
        else:
            d_ent_t = pallas_blend.blend_backward_pallas(
                aligned_t, aligned_starts, cot, n_tiles_y, n_tiles_x,
                ts, ch=cfg.pallas_chunk, depth_threshold=cfg.depth_threshold,
                g_tiles=cfg.pallas_tiles_per_program, interpret=interpret,
            )  # (W, K_pad)
        # Columns past the last tile's stop were never written by the bwd
        # kernel (garbage HBM): zero them before the reduction (fuses into
        # the sort's operand reads). Their payload ids all point at trash
        # rows (binning sends invalid candidates to id n), but garbage can
        # be NaN and where(same, NaN, 0) poisons nothing only if zeroed.
        valid_end = aligned_starts[n_tiles]
        col_ok = jnp.arange(k_al, dtype=jnp.int32) < valid_end

        # ---- K_al -> N segmented reduction (sort is the TPU's scatter) ----
        # Only the 10 live gradient columns ride the sort; the padding
        # columns (incl. the stop-gradient depth) are zeros by construction.
        # (Three rejected-by-measurement variants: a 2-op sort + row-gather
        # microbenches 21.8 vs 40.4 ms but LOSES ~15 ms in the composite
        # step — transposing the bwd kernel's (W, K_al) output for the
        # gather is real data movement the multi-operand sort streams for
        # free (tools/micro_kn.py); a direct scatter-add costs 192 ms; and
        # a slot-space reduce — forward sort carries the candidate-slot id,
        # backward sorts grads by slot over kept+dropped candidates so the
        # result is a dense slot grid reduced by reshape-sum — microbenches
        # 12.8 vs 29.9 ms (tools/micro_slotreduce.py; partly sort-output
        # DCE flattering it) but is a composite WASH at best: the real sort
        # grows from K_al to ALL candidates (2.56M rows), -0.17 it/s.)
        n_live = 10
        grads = [jnp.where(col_ok, d_ent_t[i], 0.0) for i in range(n_live)]
        if cfg.reduce_dtype == "bf16":
            # Pack grad pairs as 2x bf16 in one int32 payload: 1 key + 5
            # payload operands instead of 1 + 10 (the sort streams ~45%
            # fewer bytes; measured the single biggest non-kernel stage).
            # pack/unpack + the pair-major PERM live in pallas_reduce.py.
            from dogs_tpu.raster.pallas_reduce import (
                pack_bf16_pairs,
                sorted_segment_sum_pallas,
            )

            ops = (aligned_idx,) + tuple(
                pack_bf16_pairs(grads[2 * i], grads[2 * i + 1])
                for i in range(5)
            )
            sorted_ops = jax.lax.sort(ops, num_keys=1)
            # Dense placement: windowed one-hot MXU matmuls over the sorted
            # runs (pallas_reduce.py). Replaces masked suffix doubling +
            # first-row scatter-min + stacked row gather — the scatter-min
            # alone cost ~12 ms/step (XLA scatter ~150M elem/s on v5e).

            d_rows = sorted_segment_sum_pallas(
                sorted_ops[0],
                sorted_ops[1:],
                n_out=n_ext,
                interpret=interpret,
            )
            return d_rows, d_bg
        else:
            sorted_ops = jax.lax.sort(tuple([aligned_idx] + grads), num_keys=1)
            sg = sorted_ops[0]
            cols = list(sorted_ops[1:])
        # Runs per REAL gaussian are <= max_tiles_per_gaussian (invalid
        # candidates carry the trash payload id, binning.py): masked
        # suffix-doubling turns each run's FIRST row into the run total.
        # Steps 1..2^p with 2^p the largest power below mt cover runs up to
        # 2^(p+1) >= mt — `step < mt` is the tight pass bound. (Trash-id
        # runs can be longer; their rows are never read.)
        #
        # The doubling runs on TEN SEPARATE 1-D columns, not a (K, 10)
        # matrix: a minor dim of 10 pads to the 128-lane tile, so matrix
        # passes would stream 12.8x the useful bytes (measured ~8 ms/step
        # slower at K=1.4M). Stack only once at the end for the row gather.
        step = 1
        while step < cfg.max_tiles_per_gaussian:
            same = sg[:-step] == sg[step:]
            cols = [
                jnp.concatenate(
                    [c[: k_al - step] + jnp.where(same, c[step:], 0.0),
                     c[k_al - step :]]
                )
                for c in cols
            ]
            step *= 2
        vals = jnp.stack(cols, axis=-1)  # (K_al, n_live)
        # First-row position of each gaussian's run.
        e = jnp.arange(k_al, dtype=jnp.int32)
        n_real = n_ext  # scatter over the full ext id space, slice later
        bpos = jnp.full((n_real + 1,), k_al, jnp.int32).at[sg].min(e)
        bpos = bpos[:n_real]
        present = bpos < k_al
        d_rows = jnp.where(
            present[:, None], vals[jnp.minimum(bpos, k_al - 1)], 0.0
        )
        d_rows = jnp.concatenate(
            [d_rows, jnp.zeros((n_real, ENT_WIDTH - n_live), jnp.float32)],
            axis=1,
        )
        return d_rows, d_bg

    blend.defvjp(blend_fwd, blend_bwd)
    return blend(ent_ext, background)


TRASH_ROWS = 4096  # zero rows fillers point at (spread to avoid collisions)


def render_tiled(
    params: GaussianParams,
    camera: Camera,
    cfg: RasterConfig = RasterConfig(),
    background: jnp.ndarray | None = None,
    alive: jnp.ndarray | None = None,
    active_sh_degree: int = 3,
    scale_modifier: float = 1.0,
    means2d_offset: jnp.ndarray | None = None,
    invd_offset: jnp.ndarray | None = None,
    color_override: jnp.ndarray | None = None,
) -> RenderOutput:
    """Full tiled render: the production replacement for
    conerf/render/gaussian_render.py:18-158 `render()`.

    invd_offset: optional (C,) zeros; the gradient of sum(invdepth) w.r.t.
    it equals each Gaussian's total blend weight over all pixels — the
    importance signal of the old count_render
    (old_diff_gaussian_rasterization f_count mode) without a second kernel.
    """
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
        color_override=color_override,
    )
    radii_out = proj.radius  # original order (densify stats / visibility)

    bins = build_tile_bins(
        proj,
        h,
        w,
        tile_size=ts,
        max_tiles_per_gaussian=cfg.max_tiles_per_gaussian,
        tile_culling=cfg.tile_culling,
        bin_capacity=cfg.bin_capacity,
        base_tiles=cfg.base_tiles,
        overflow_capacity=cfg.overflow_capacity,
    )
    visible = proj.radius > 0.0
    opacity = jnp.where(visible, proj.opacity, 0.0)
    dsafe = jnp.where(visible, proj.depth, 1.0)
    invd = jnp.where(visible, 1.0 / dsafe, 0.0)
    if invd_offset is not None:
        invd = invd + invd_offset

    # Entry matrix in N-space, then ONE gather into sorted order. The VJP of
    # this gather (scatter-add K -> N) is XLA autodiff's job.
    ent_n = jnp.concatenate(
        [
            proj.means2d,
            proj.conic,
            proj.color,
            opacity[:, None],
            invd[:, None],
            jax.lax.stop_gradient(dsafe)[:, None],
            # Column 11 (_ONE) is a constant 1.0: the Pallas forward folds
            # the alpha channel (sum of blend weights) into its entry @ w
            # matmul via this row. Constant => no gradient path.
            jnp.ones((params.capacity, 1), jnp.float32),
            jnp.zeros((params.capacity, ENT_WIDTH - 12), jnp.float32),
        ],
        axis=1,
    )

    if cfg.use_pallas:
        # COMPACT layout: the kernels consume the sorted entries directly
        # (chunk boundaries are handled in-kernel), so the only prep is
        # padding K to a chunk multiple with trash-pointing fillers.
        k = bins.sorted_idx.shape[0]
        ch = cfg.pallas_chunk
        k_pad = -(-k // ch) * ch
        idx = bins.sorted_idx
        if k_pad > k:
            filler = params.capacity + (
                jnp.arange(k_pad - k, dtype=jnp.int32) % TRASH_ROWS
            )
            idx = jnp.concatenate([idx, filler])
        ent_ext = jnp.concatenate(
            [ent_n, jnp.zeros((TRASH_ROWS, ENT_WIDTH), ent_n.dtype)], axis=0
        )
        img_tiles, a_tiles, d_tiles = _blend_with_vjp_pallas(
            idx, bins.tile_starts, ent_ext, background,
            n_tiles_y, n_tiles_x, cfg,
        )
    else:
        sorted_ent = ent_n[bins.sorted_idx]
        img_tiles, a_tiles, d_tiles = _blend_with_vjp(
            bins, sorted_ent, background, n_tiles_y, n_tiles_x, cfg
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
    # Telemetry: valid entries past the bin_capacity slice are silently cut
    # (invalid sentinels sort last, so the cut hits valid entries only once
    # num_valid exceeds the kept prefix).
    kept = bins.sorted_idx.shape[0]
    dropped = jnp.maximum(bins.num_valid - kept, 0)
    return RenderOutput(
        image=image, alpha=alpha, invdepth=invdepth, radii=radii_out,
        bin_valid=bins.num_valid,
        bin_rect_truncated=bins.num_truncated,
        bin_pool_truncated=bins.num_pool_truncated,
        bin_dropped=dropped,
        bin_pool_need=bins.num_pool_need,
    )
