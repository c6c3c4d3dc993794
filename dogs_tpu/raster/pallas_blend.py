"""Pallas TPU kernels for the per-tile alpha-blend (forward + backward).

The performance core of the rasterizer — the TPU counterpart of the CUDA
`renderCUDA` 16x16-tile kernel (forward.cu:350-501) and the Taming-3DGS
per-bucket backward (backward.cu:454-657). Design:

  * entries (one per (gaussian, tile) overlap, depth-sorted per tile) live in
    HBM as the COMPACT (16, K) sorted entry matrix — no aligned copy. Each
    tile DMAs full chunks from the chunk boundary at/below its start and
    masks rows outside [start, stop) to alpha=0; the backward read-modify-
    writes its first gradient chunk to preserve the predecessor tiles'
    already-written boundary rows (grid programs are sequential on the core,
    so the RMW is race-free). This removed the whole aligned-layout build +
    gather (~30 ms/step at 1.5M entries) that round 1 carried.
  * grid = one program per tile; per-tile entry counts are DYNAMIC (a
    while_loop over chunks with double-buffered HBM->VMEM DMA), with the
    CUDA kernel's T < 1e-4 saturation early-exit at tile granularity.
  * transmittance is tracked in log space; the in-chunk inclusive prefix of
    log(1-alpha) is ONE lower-triangular (CH x CH) matmul on the MXU instead
    of a sequential loop.
  * the backward replays chunks front-to-back using the forward totals
    (recompute-from-totals, zero per-splat residuals) and reduces per-entry
    gradients over the tile's 256 pixels in-register before one contiguous
    DMA per chunk back to HBM.

Layouts: HBM memrefs are (1,128)-tiled, so the entry matrix lives
TRANSPOSED as (16, K) and chunks are 128 entries wide — every DMA slice is
lane-aligned. Each chunk is transposed once in VMEM to (CH, 16) so the pixel
math runs as (CH sublanes, P=ts*ts lanes) blocks. See
dogs_tpu/raster/tiled.py for the XLA fallback with identical semantics (the
oracle for this kernel's tests).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LOG_TMIN = math.log(1e-4)
ALPHA_MIN = 1.0 / 255.0
ENT_WIDTH = 16
# Entry-matrix columns (padded to 16 for sublane-aligned DMA). _ONE is a
# constant 1.0 for every real entry: it lets sum(w) (the alpha channel) ride
# the forward kernel's entry @ w MXU matmul for free.
_MUX, _MUY, _CA, _CB, _CC, _R, _G, _B, _OPA, _INVD, _DEPTH, _ONE = range(12)
# Output rows per tile.
_OUT_R, _OUT_G, _OUT_B, _OUT_A, _OUT_D = range(5)
OUT_ROWS = 8


def _pixel_coords(t, n_tiles_x: int, ts: int, p: int):
    """Tile id (scalar) -> (1, P) pixel-center coords."""
    ty = t // n_tiles_x
    tx = t - ty * n_tiles_x
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, p), 1)
    py_in = lane // ts
    px_in = lane - py_in * ts
    px = (tx * ts + px_in).astype(jnp.float32) + 0.5
    py = (ty * ts + py_in).astype(jnp.float32) + 0.5
    return px, py


def _chunk_alpha(rows, px, py):
    """rows (CH, 16) -> alpha/(dx,dy,power) over (CH, P) pixels."""
    mux = rows[:, _MUX : _MUX + 1]
    muy = rows[:, _MUY : _MUY + 1]
    ca = rows[:, _CA : _CA + 1]
    cb = rows[:, _CB : _CB + 1]
    cc = rows[:, _CC : _CC + 1]
    opa = rows[:, _OPA : _OPA + 1]
    dx = px - mux  # (CH, P)
    dy = py - muy
    power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
    alpha = jnp.minimum(0.99, opa * jnp.exp(jnp.minimum(power, 0.0)))
    alpha = jnp.where(alpha >= ALPHA_MIN, alpha, 0.0)
    return alpha, dx, dy, power


def _lower_triangular(ch: int) -> jnp.ndarray:
    # Generated in-kernel (Pallas forbids closure constants): L[i,j] = i >= j.
    row = jax.lax.broadcasted_iota(jnp.int32, (ch, ch), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (ch, ch), 1)
    return (row >= col).astype(jnp.float32)


def _make_fwd_kernel(n_tiles_x: int, ts: int, ch: int, g_tiles: int):
    p = ts * ts

    def kernel(starts_ref, ent_hbm, out_ref, ent_buf, sems):
        pg = pl.program_id(0)
        ltri = _lower_triangular(ch)

        def tile_range(t):
            start = starts_ref[t]
            stop = starts_ref[t + 1]
            off0 = (start // ch) * ch
            n_chunks = jnp.where(stop > start, (stop - off0 + ch - 1) // ch, 0)
            return start, stop, off0, n_chunks

        def chunk_dma(slot, off0, ci):
            off = pl.multiple_of(off0 + ci * ch, ch)
            return pltpu.make_async_copy(
                ent_hbm.at[:, pl.ds(off, ch)],
                ent_buf.at[slot],
                sems.at[slot],
            )

        def do_tile(gt: int):
            # gt is a PYTHON int (unrolled): out_ref stores stay static and
            # the ~1.3 us/program fixed cost amortizes over g_tiles tiles.
            # (A cross-tile chunk-0 prefetch into dedicated head slots was
            # measured and REJECTED: the dynamic slot select it forces in the
            # loop body cost more than the ~1 us DMA latency it hid.)
            t = pg * g_tiles + gt
            start, stop, off0, n_chunks = tile_range(t)
            # COMPACT layout: per-tile runs are not chunk-aligned. DMA from
            # the chunk boundary at/below `start`; rows outside [start, stop)
            # are masked to alpha=0 (log1p(0)=0 keeps transmittance exact).
            px, py = _pixel_coords(t, n_tiles_x, ts, p)

            @pl.when(n_chunks > 0)
            def _():
                chunk_dma(0, off0, 0).start()

            def cond(state):
                ci, log_t = state[0], state[1]
                return (ci < n_chunks) & (jnp.max(log_t) >= LOG_TMIN)

            def body(state):
                ci, log_t, acc = state
                slot = ci % 2

                @pl.when(ci + 1 < n_chunks)
                def _():
                    chunk_dma((ci + 1) % 2, off0, ci + 1).start()

                chunk_dma(slot, off0, ci).wait()
                rows = ent_buf[slot].T  # (16, CH) -> (CH, 16)
                alpha, _, _, _ = _chunk_alpha(rows, px, py)
                rid = (
                    jax.lax.broadcasted_iota(jnp.int32, (ch, 1), 0)
                    + off0 + ci * ch
                )
                alpha = jnp.where((rid >= start) & (rid < stop), alpha, 0.0)
                lg = jnp.log1p(-alpha)
                # Inclusive prefix over the chunk via one MXU matmul.
                cum = jnp.dot(ltri, lg, preferred_element_type=jnp.float32)
                log_t_incl = log_t + cum  # (CH, P), log_t broadcasts (1, P)
                w = jnp.where(
                    log_t_incl >= LOG_TMIN, alpha * jnp.exp(log_t_incl - lg), 0.0
                )
                # ALL five weighted reductions (R,G,B,A,invD) ride ONE MXU
                # matmul: sum_k w[k,p] * ent[c,k] = ent_chunk @ w, with the
                # constant-1.0 entry row (_ONE) delivering sum(w) = A. The
                # five separate cross-sublane VPU reduces this replaces were
                # ~40% of the forward's per-chunk time. Masked/trash rows
                # have w = 0, so their (real, finite) values contribute 0.
                # Precision.HIGHEST (exact f32): DEFAULT's bf16 operand
                # rounding (~0.2% rel) tripped hardware parity vs the
                # exact-f32 XLA path. Mosaic only lowers DEFAULT or HIGHEST
                # in-kernel (HIGH rejects), and exact forward totals also
                # let the bwd w-family matmul stay at DEFAULT — net ~0.5
                # it/s composite vs ~0.8 for HIGHEST in both kernels.
                acc = acc + jnp.dot(
                    ent_buf[slot], w,
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )  # (16, P)
                log_t = log_t + cum[ch - 1 : ch, :]
                return ci + 1, log_t, acc

            init = (
                jnp.int32(0),
                jnp.zeros((1, p), jnp.float32),
                jnp.zeros((ENT_WIDTH, p), jnp.float32),
            )
            final_ci, _, acc = jax.lax.while_loop(cond, body, init)

            # Saturation early-exit leaves the prefetched chunk's DMA in
            # flight; drain it or the semaphore corrupts the next tile.
            # (final_ci >= 1 always when n_chunks > 0: chunk 0 is consumed.)
            @pl.when((final_ci > 0) & (final_ci < n_chunks))
            def _():
                chunk_dma(final_ci % 2, off0, final_ci).wait()

            # Reorder the accumulated entry-weighted sums into the output
            # row contract (R, G, B, A, invD, 0, 0, 0) once per tile.
            out_ref[0, gt] = jnp.concatenate(
                [
                    acc[_R : _B + 1],
                    acc[_ONE : _ONE + 1],
                    acc[_INVD : _INVD + 1],
                    jnp.zeros((OUT_ROWS - 5, p), jnp.float32),
                ],
                axis=0,
            )

        for gt in range(g_tiles):
            do_tile(gt)

    return kernel


def _pad_starts(aligned_starts: jnp.ndarray, n_tiles: int, g_tiles: int):
    """Pad tile ranges so the grid covers whole g_tiles groups; padded tiles
    get empty ranges (start == stop == K_end). One EXTRA sentinel tile is
    appended so the cross-tile head prefetch can read tile t+1's range even
    at the last real tile."""
    n_pg = -(-n_tiles // g_tiles)
    pad = n_pg * g_tiles - n_tiles + 1
    aligned_starts = jnp.concatenate(
        [aligned_starts, jnp.broadcast_to(aligned_starts[-1:], (pad,))]
    )
    return aligned_starts, n_pg


def blend_forward_pallas(
    aligned_ent: jnp.ndarray,  # (16, K_pad) TRANSPOSED sorted entries
    aligned_starts: jnp.ndarray,  # (T+1,) int32 compact tile ranges
    n_tiles_y: int,
    n_tiles_x: int,
    ts: int,
    ch: int = 32,
    g_tiles: int = 4,
    interpret: bool = False,
):
    """Returns (T, OUT_ROWS, P): rows R,G,B,A,invD per tile (no background)."""
    n_tiles = n_tiles_y * n_tiles_x
    p = ts * ts
    kernel = _make_fwd_kernel(n_tiles_x, ts, ch, g_tiles)
    starts_pad, n_pg = _pad_starts(aligned_starts, n_tiles, g_tiles)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_pg,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (1, g_tiles, OUT_ROWS, p),
            lambda t, starts: (t, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((2, ENT_WIDTH, ch), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_pg, g_tiles, OUT_ROWS, p), jnp.float32),
        interpret=interpret,
    )(starts_pad, aligned_ent)
    return out.reshape(n_pg * g_tiles, OUT_ROWS, p)[:n_tiles]


def _make_bwd_kernel(
    n_tiles_x: int, ts: int, ch: int, depth_threshold: float, g_tiles: int
):
    p = ts * ts

    def kernel(
        starts_ref, ent_hbm, cot_ref, dent_hbm,
        ent_buf, dent_buf, prev_buf, sems, osems, psem,
    ):
        pg = pl.program_id(0)
        ltri = _lower_triangular(ch)

        for gt in range(g_tiles):
            _bwd_tile(
                pg * g_tiles + gt, gt, starts_ref, ent_hbm, cot_ref, dent_hbm,
                ent_buf, dent_buf, prev_buf, sems, osems, psem,
                ltri, n_tiles_x, ts, ch, depth_threshold, p,
            )

    return kernel


def _bwd_tile(
    t, gt, starts_ref, ent_hbm, cot_ref, dent_hbm,
    ent_buf, dent_buf, prev_buf, sems, osems, psem,
    ltri, n_tiles_x, ts, ch, depth_threshold, p,
):
    if True:  # keep the body's original indentation (diff hygiene)
        start = starts_ref[t]
        stop = starts_ref[t + 1]
        # COMPACT layout (see fwd kernel). The first chunk may contain the
        # PREDECESSOR tiles' trailing entries whose gradients were already
        # written: read-modify-write it (tiles run sequentially on the core
        # and every put DMA is drained before the tile's body ends, so the
        # read sees the predecessor's completed writes).
        off0 = (start // ch) * ch
        n_chunks = jnp.where(stop > start, (stop - off0 + ch - 1) // ch, 0)
        px, py = _pixel_coords(t, n_tiles_x, ts, p)

        # cot rows: 0-2 gC(rgb), 3 gA_eff, 4 gD, 5 Gtot (precomputed outside).
        cot_r = cot_ref[0, gt, 0:1, :]
        cot_g = cot_ref[0, gt, 1:2, :]
        cot_b = cot_ref[0, gt, 2:3, :]
        cot_a = cot_ref[0, gt, 3:4, :]
        cot_d = cot_ref[0, gt, 4:5, :]
        g_tot = cot_ref[0, gt, 5:6, :]

        # Per-tile constant reduction basis for the w-family matmul below.
        basis4 = jnp.concatenate([cot_r, cot_g, cot_b, cot_d], axis=0).T

        def get_dma(slot, ci):
            off = pl.multiple_of(off0 + ci * ch, ch)
            return pltpu.make_async_copy(
                ent_hbm.at[:, pl.ds(off, ch)],
                ent_buf.at[slot],
                sems.at[slot],
            )

        def put_dma(slot, ci):
            off = pl.multiple_of(off0 + ci * ch, ch)
            return pltpu.make_async_copy(
                dent_buf.at[slot],
                dent_hbm.at[:, pl.ds(off, ch)],
                osems.at[slot],
            )

        def prev_dma():
            return pltpu.make_async_copy(
                dent_hbm.at[:, pl.ds(pl.multiple_of(off0, ch), ch)],
                prev_buf,
                psem,
            )

        # Predecessor gradients exist in our first chunk IFF start is not
        # chunk-aligned (then the previous nonempty tile's run — or its
        # zero_tail — wrote that chunk; chunk-aligned starts own the chunk
        # outright and the memory below is untouched garbage).
        rmw = (start % ch) != 0

        @pl.when(n_chunks > 0)
        def _():
            get_dma(0, 0).start()

        @pl.when((n_chunks > 0) & rmw)
        def _():
            prev_dma().start()

        def cond(state):
            ci, log_t = state[0], state[1]
            return (ci < n_chunks) & (jnp.max(log_t) >= LOG_TMIN)

        def body(state):
            ci, log_t, prefix_g = state
            slot = ci % 2

            @pl.when(ci + 1 < n_chunks)
            def _():
                get_dma((ci + 1) % 2, ci + 1).start()

            get_dma(slot, ci).wait()
            rows = ent_buf[slot].T  # (CH, 16)
            alpha, dx, dy, _ = _chunk_alpha(rows, px, py)
            rid = jax.lax.broadcasted_iota(jnp.int32, (ch, 1), 0) + off0 + ci * ch
            alpha = jnp.where((rid >= start) & (rid < stop), alpha, 0.0)
            lg = jnp.log1p(-alpha)
            cum = jnp.dot(ltri, lg, preferred_element_type=jnp.float32)
            log_t_incl = log_t + cum
            contributes = log_t_incl >= LOG_TMIN
            t_excl = jnp.exp(log_t_incl - lg)
            w = jnp.where(contributes, alpha * t_excl, 0.0)

            direct = (
                rows[:, _R : _R + 1] * cot_r
                + rows[:, _G : _G + 1] * cot_g
                + rows[:, _B : _B + 1] * cot_b
                + cot_a
                + rows[:, _INVD : _INVD + 1] * cot_d
            )  # (CH, P)
            g_term = direct * w
            prefix_incl = prefix_g + jnp.dot(
                ltri, g_term, preferred_element_type=jnp.float32
            )
            suffix = g_tot - prefix_incl
            d_alpha = jnp.where(
                contributes & (alpha > 0.0),
                direct * t_excl - suffix / (1.0 - alpha),
                0.0,
            )
            not_clamped = (alpha < 0.99) & (alpha > 0.0)
            d_alpha = jnp.where(not_clamped, d_alpha, 0.0)
            d_power = d_alpha * alpha

            ca = rows[:, _CA : _CA + 1]
            cb = rows[:, _CB : _CB + 1]
            cc = rows[:, _CC : _CC + 1]
            opa = rows[:, _OPA : _OPA + 1]
            # The four w-weighted pixel reductions (color + invdepth grads)
            # ride ONE MXU matmul against the per-tile cotangent basis:
            #   M1 = w @ [cot_r cot_g cot_b cot_d]  ->  (CH, 4)
            # DEFAULT precision is safe here: no cancellation-prone
            # recombination follows, and with the FORWARD's accumulate
            # matmul exact (HIGHEST) the real-TPU parity lane passes with
            # bf16-rounded operands on this one (~0.2% rel, far below the
            # 3e-3 gradient tolerance and SGD noise).
            m1 = jax.lax.dot_general(
                w, basis4, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (CH, 4): d_r, d_g, d_b, d_dv
            # (A moment-basis matmul for the d_power family — dp @ [1 pxl
            # pyl pxl^2 pxl*pyl pyl^2] + binomial recombination — was
            # measured and REJECTED even with tile-local coords: the
            # recombination cancellation forces Precision.HIGHEST on the
            # matmul, and the 6-pass lowering costs more than the five VPU
            # reduce chains it replaces: 12.6 -> 11.6 it/s composite.)
            red = lambda x: jnp.sum(x, axis=1, keepdims=True)  # (CH, 1)
            # On d_power's support alpha == opa * exp(power) exactly (the
            # 0.99 clamp is excluded by not_clamped), so
            # red(d_alpha * exp(power)) == red(d_power) / opa — drops the
            # per-pixel exp() recompute. Guard the masked-row opa=0 case.
            d_opa = red(d_power) / jnp.maximum(opa, 1e-12)
            d_ca = red(d_power * (-0.5 * dx * dx))
            d_cb = red(d_power * (-dx * dy))
            d_cc = red(d_power * (-0.5 * dy * dy))
            d_mux = red(d_power * (ca * dx + cb * dy))
            d_muy = red(d_power * (cc * dy + cb * dx))
            d_r = m1[:, 0:1]
            d_g = m1[:, 1:2]
            d_b = m1[:, 2:3]
            d_dv = m1[:, 3:4]

            if depth_threshold > 0.0:
                damp = jnp.minimum(
                    1.0, (rows[:, _DEPTH : _DEPTH + 1] / depth_threshold) ** 2
                )
                d_mux = d_mux * damp
                d_muy = d_muy * damp

            zero = jnp.zeros_like(d_opa)
            dent = jnp.concatenate(
                [d_mux, d_muy, d_ca, d_cb, d_cc, d_r, d_g, d_b, d_opa, d_dv,
                 zero, zero, zero, zero, zero, zero],
                axis=1,
            ).T  # (16, CH) for the lane-aligned write-back
            # First chunk: add the predecessors' already-written gradients
            # (our own masked rows contributed zeros, theirs are preserved).
            @pl.when((ci == 0) & rmw)
            def _():
                prev_dma().wait()

            dent = jnp.where((ci == 0) & rmw, dent + prev_buf[...], dent)
            # Wait for the previous write using this slot before reuse.
            @pl.when(ci >= 2)
            def _():
                put_dma(slot, ci - 2).wait()

            dent_buf[slot] = dent
            put_dma(slot, ci).start()

            # prefix_incl already holds prefix_g + ltri @ g_term; reuse its
            # last row instead of a second (CH, CH) @ (CH, P) matmul.
            prefix_g = prefix_incl[ch - 1 : ch, :]
            log_t = log_t + cum[ch - 1 : ch, :]
            return ci + 1, log_t, prefix_g

        init = (
            jnp.int32(0),
            jnp.zeros((1, p), jnp.float32),
            jnp.zeros((1, p), jnp.float32),
        )
        final_ci, _, _ = jax.lax.while_loop(cond, body, init)

        # Drain the outstanding input prefetch after an early exit.
        @pl.when((final_ci > 0) & (final_ci < n_chunks))
        def _():
            get_dma(final_ci % 2, final_ci).wait()

        # Drain outstanding writes.
        @pl.when(final_ci >= 2)
        def _():
            put_dma(final_ci % 2, final_ci - 2).wait()

        @pl.when(final_ci >= 1)
        def _():
            put_dma((final_ci - 1) % 2, final_ci - 1).wait()

        # Saturation early-exit can leave tail chunks unwritten; zero them so
        # the K->N scatter-add sees zeros, matching "no gradient past done".
        # Saturating tiles are the COMMON case on converged scenes (mean
        # alpha is high), so the tail covers most of the tile's chunks: keep
        # two zero-fill DMAs in flight instead of a serialized start+wait
        # per chunk (the buffers hold zeros throughout, so slot reuse only
        # needs the ci-2 wait; both real puts were drained above).
        @pl.when(final_ci < n_chunks)
        def _():
            dent_buf[0] = jnp.zeros((ENT_WIDTH, ch), jnp.float32)
            dent_buf[1] = jnp.zeros((ENT_WIDTH, ch), jnp.float32)

        def zero_tail(ci, _):
            @pl.when(ci >= final_ci + 2)
            def _():
                put_dma(ci % 2, ci - 2).wait()

            put_dma(ci % 2, ci).start()
            return 0

        jax.lax.fori_loop(final_ci, n_chunks, zero_tail, 0)

        @pl.when(n_chunks - 1 >= final_ci)
        def _():
            put_dma((n_chunks - 1) % 2, n_chunks - 1).wait()

        @pl.when(n_chunks - 2 >= final_ci)
        def _():
            put_dma((n_chunks - 2) % 2, n_chunks - 2).wait()


def blend_backward_pallas(
    aligned_ent: jnp.ndarray,  # (16, K_pad) transposed sorted entries
    aligned_starts: jnp.ndarray,  # (T+1,) int32 compact tile ranges
    cot: jnp.ndarray,  # (T, 8, P): gC rgb, gA_eff, gD, Gtot, 0, 0
    n_tiles_y: int,
    n_tiles_x: int,
    ts: int,
    ch: int = 32,
    depth_threshold: float = 0.0,
    g_tiles: int = 4,
    interpret: bool = False,
):
    """Returns d_ent (K_cap, 16) per-entry gradients (rows past each tile's
    valid range are zero)."""
    n_tiles = n_tiles_y * n_tiles_x
    p = ts * ts
    kernel = _make_bwd_kernel(n_tiles_x, ts, ch, depth_threshold, g_tiles)
    k_cap = aligned_ent.shape[1]
    starts_pad, n_pg = _pad_starts(aligned_starts, n_tiles, g_tiles)
    pad = n_pg * g_tiles - n_tiles
    if pad:
        cot = jnp.concatenate(
            [cot, jnp.zeros((pad,) + cot.shape[1:], cot.dtype)], axis=0
        )
    cot = cot.reshape(n_pg, g_tiles, *cot.shape[1:])
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_pg,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(
                (1, g_tiles, OUT_ROWS, p),
                lambda t, starts: (t, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, ENT_WIDTH, ch), jnp.float32),
            pltpu.VMEM((2, ENT_WIDTH, ch), jnp.float32),
            pltpu.VMEM((ENT_WIDTH, ch), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((ENT_WIDTH, k_cap), jnp.float32),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(starts_pad, aligned_ent, cot)
