"""Flat chunk-stream Pallas blend kernels (forward + backward).

Same contract as pallas_blend.py, different schedule. The per-tile kernels
there pay a measured ~1.3 us of fixed cost PER TILE (while_loop entry,
scalar setup, and an exposed chunk-0 DMA wait) — ~5 ms per kernel per step
at 3888 tiles, which dominates once the average tile consumes only 1-3
chunks (saturation exits after ~10 effective splats on converged scenes).

Here ONE while_loop walks the whole sorted entry stream as (tile, chunk)
visits, carried as scalar loop state — no per-tile loop entry, and the
input DMA pipeline stays primed ACROSS tile boundaries, so no visit but the
first ever waits on an unprefetched chunk:

  * state carries the current visit (t, off) and the DMA slot; the no-jump
    successor's chunk is prefetched before this visit's compute;
  * tile changes flush the (16, P) accumulator to the per-tile output row
    block in HBM through a double-buffered put pipeline;
  * the saturation early-exit becomes a JUMP to the next nonempty tile's
    first chunk: the in-flight prefetch is drained and the pipeline
    restarted (2 exposed DMA latencies per saturated tile, against the
    per-tile exposed wait the per-tile kernels pay for EVERY tile);
  * the backward defers each chunk's gradient write while the next visit
    targets the same chunk (adjacent by construction: tile runs are
    contiguous in the sorted stream), so boundary chunks shared by several
    tiles accumulate in VMEM and are written ONCE — no read-modify-write
    of HBM at all (pallas_blend.py's prev_dma RMW disappears);
  * on a backward jump, the skipped wholly-owned chunks are zero-filled
    through the same put pipeline (the shared trailing chunk, if any, is
    written by the next tile's visit — this tile's contribution to it is
    genuinely zero, it saturated).

The alpha/blend math is identical to pallas_blend.py (shared helpers).
Interpret mode runs on CPU for the parity tests; RasterConfig.pallas_stream
selects these kernels.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dogs_tpu.raster.pallas_blend import (
    ENT_WIDTH,
    LOG_TMIN,
    OUT_ROWS,
    _chunk_alpha,
    _lower_triangular,
    _pixel_coords,
    _B,
    _CA,
    _CB,
    _CC,
    _DEPTH,
    _G,
    _INVD,
    _MUX,
    _MUY,
    _ONE,
    _OPA,
    _R,
)


def _mk_next_tile(starts_ref, n_tiles):
    """Scalar helper: smallest nonempty tile index > t (n_tiles if none)."""

    def next_tile(t):
        def cond(t_):
            return (t_ < n_tiles) & (starts_ref[t_] >= starts_ref[t_ + 1])

        return jax.lax.while_loop(
            cond, lambda t_: t_ + 1, jnp.asarray(t + 1, jnp.int32)
        )

    return next_tile


def _mk_advance(starts_ref, next_tile, ch, n_tiles):
    """No-jump successor of visit (t, off): next chunk in-tile, else the
    next nonempty tile's first chunk. Returns (t', off'). The next_tile
    scan runs unconditionally (its while exits on the first check when the
    following tile is nonempty — cheaper and simpler under Mosaic than a
    value-returning cond around it)."""

    def off0(t):
        return (starts_ref[t] // ch) * ch

    def advance(t, off):
        stop = starts_ref[t + 1]
        nxt_off = off + ch
        in_tile = nxt_off < stop
        scan = next_tile(t)
        nt = jnp.where(in_tile, t, scan)
        no = jnp.where(in_tile, nxt_off, jnp.where(nt < n_tiles, off0(nt), 0))
        # scan is returned so the saturation jump reuses it (jump target ==
        # next nonempty tile, the same scalar while result).
        return nt, no, scan

    return advance, off0


def _make_fwd_kernel(n_tiles_x: int, n_tiles: int, ts: int, ch: int):
    p = ts * ts

    def kernel(starts_ref, ent_hbm, out_ref, ent_buf, out_buf, sems, osems):
        ltri = _lower_triangular(ch)
        next_tile = _mk_next_tile(starts_ref, n_tiles)
        advance, off0 = _mk_advance(starts_ref, next_tile, ch, n_tiles)

        def in_dma(slot, off):
            off = pl.multiple_of(off, ch)
            return pltpu.make_async_copy(
                ent_hbm.at[:, pl.ds(off, ch)], ent_buf.at[slot], sems.at[slot]
            )

        def out_dma(slot, t):
            return pltpu.make_async_copy(
                out_buf.at[slot], out_ref.at[t], osems.at[slot]
            )

        def flush(nf, cur, acc):
            """Write tile `cur`'s accumulator through the put pipeline."""
            slot = nf % 2

            @pl.when(nf >= 2)
            def _():
                out_dma(slot, 0).wait()

            out_buf[slot] = jnp.concatenate(
                [
                    acc[_R : _B + 1],
                    acc[_ONE : _ONE + 1],
                    acc[_INVD : _INVD + 1],
                    jnp.zeros((OUT_ROWS - 5, p), jnp.float32),
                ],
                axis=0,
            )
            out_dma(slot, cur).start()

        t0 = next_tile(-1)

        @pl.when(t0 < n_tiles)
        def _():
            in_dma(0, off0(t0)).start()

        def cond(state):
            return state[0] < n_tiles

        def body(state):
            t, off, slot, cur, nf, log_t, acc = state
            nxt_t, nxt_off, scan = advance(t, off)

            @pl.when(nxt_t < n_tiles)
            def _():
                in_dma(1 - slot, nxt_off).start()

            in_dma(slot, off).wait()
            changed = t != cur

            @pl.when(changed)
            def _():
                flush(nf, cur, acc)

            nf = nf + changed.astype(jnp.int32)
            log_t = jnp.where(changed, 0.0, log_t)
            acc = jnp.where(changed, 0.0, acc)

            start = starts_ref[t]
            stop = starts_ref[t + 1]
            px, py = _pixel_coords(t, n_tiles_x, ts, p)
            rows = ent_buf[slot].T  # (16, CH) -> (CH, 16)
            alpha, _, _, _ = _chunk_alpha(rows, px, py)
            rid = jax.lax.broadcasted_iota(jnp.int32, (ch, 1), 0) + off
            alpha = jnp.where((rid >= start) & (rid < stop), alpha, 0.0)
            lg = jnp.log1p(-alpha)
            cum = jnp.dot(ltri, lg, preferred_element_type=jnp.float32)
            log_t_incl = log_t + cum
            w = jnp.where(
                log_t_incl >= LOG_TMIN, alpha * jnp.exp(log_t_incl - lg), 0.0
            )
            # See pallas_blend.py for the precision rationale (HIGHEST here,
            # DEFAULT on the backward's w-family matmul).
            acc = acc + jnp.dot(
                ent_buf[slot], w,
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            log_t = log_t + cum[ch - 1 : ch, :]

            # Saturation: jump to the next nonempty tile (unless the no-jump
            # successor already leaves this tile).
            saturated = jnp.max(log_t) < LOG_TMIN
            jumped = saturated & (nxt_t == t)
            jt = jnp.where(jumped, scan, nxt_t)
            jo = jnp.where(
                jumped, jnp.where(jt < n_tiles, off0(jt), 0), nxt_off
            )

            @pl.when(jumped)
            def _():
                @pl.when(nxt_t < n_tiles)
                def _():
                    in_dma(1 - slot, nxt_off).wait()  # drain the stray

                @pl.when(jt < n_tiles)
                def _():
                    in_dma(1 - slot, jo).start()  # restart the pipeline

            return jt, jo, 1 - slot, t, nf, log_t, acc

        init = (
            t0,
            jnp.where(t0 < n_tiles, off0(t0), 0),
            jnp.int32(0),
            t0,
            jnp.int32(0),
            jnp.zeros((1, p), jnp.float32),
            jnp.zeros((ENT_WIDTH, p), jnp.float32),
        )
        _, _, _, cur, nf, _, acc = jax.lax.while_loop(cond, body, init)

        @pl.when(cur < n_tiles)
        def _():
            flush(nf, cur, acc)

        nf_end = nf + (cur < n_tiles).astype(jnp.int32)

        @pl.when(nf_end >= 2)
        def _():
            out_dma(nf_end % 2, 0).wait()

        @pl.when(nf_end >= 1)
        def _():
            out_dma((nf_end - 1) % 2, 0).wait()

    return kernel


def blend_forward_stream(
    aligned_ent: jnp.ndarray,  # (16, K_pad) TRANSPOSED sorted entries
    aligned_starts: jnp.ndarray,  # (T+1,) int32 compact tile ranges
    n_tiles_y: int,
    n_tiles_x: int,
    ts: int,
    ch: int = 128,
    interpret: bool = False,
):
    """Returns (T, OUT_ROWS, P): rows R,G,B,A,invD per tile (no background).
    Tiles with empty ranges are zeroed XLA-side (the kernel never visits
    them, so their HBM rows hold garbage)."""
    n_tiles = n_tiles_y * n_tiles_x
    p = ts * ts
    kernel = _make_fwd_kernel(n_tiles_x, n_tiles, ts, ch)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, ENT_WIDTH, ch), jnp.float32),
            pltpu.VMEM((2, OUT_ROWS, p), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_tiles, OUT_ROWS, p), jnp.float32),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(aligned_starts, aligned_ent)
    nonempty = aligned_starts[1 : n_tiles + 1] > aligned_starts[:n_tiles]
    return jnp.where(nonempty[:, None, None], out, 0.0)


def _make_bwd_kernel(
    n_tiles_x: int, n_tiles: int, ts: int, ch: int, depth_threshold: float
):
    p = ts * ts

    def kernel(
        starts_ref, ent_hbm, cot_hbm, dent_hbm,
        ent_buf, dent_buf, cot_buf, carry_buf, sems, osems, csems,
    ):
        ltri = _lower_triangular(ch)
        next_tile = _mk_next_tile(starts_ref, n_tiles)
        advance, off0 = _mk_advance(starts_ref, next_tile, ch, n_tiles)

        def in_dma(slot, off):
            off = pl.multiple_of(off, ch)
            return pltpu.make_async_copy(
                ent_hbm.at[:, pl.ds(off, ch)], ent_buf.at[slot], sems.at[slot]
            )

        def put_dma(slot, off):
            off = pl.multiple_of(off, ch)
            return pltpu.make_async_copy(
                dent_buf.at[slot], dent_hbm.at[:, pl.ds(off, ch)],
                osems.at[slot],
            )

        def cot_dma(slot, t):
            return pltpu.make_async_copy(
                cot_hbm.at[t], cot_buf.at[slot], csems.at[slot]
            )

        t0 = next_tile(-1)

        @pl.when(t0 < n_tiles)
        def _():
            in_dma(0, off0(t0)).start()
            cot_dma(0, t0).start()

        def cond(state):
            return state[0] < n_tiles

        def body(state):
            (t, off, slot, cur, nc, npw, carried, log_t, prefix_g) = state
            nxt_t, nxt_off, scan = advance(t, off)

            @pl.when(nxt_t < n_tiles)
            def _():
                in_dma(1 - slot, nxt_off).start()

            in_dma(slot, off).wait()
            changed = t != cur
            nc = nc + changed.astype(jnp.int32)

            @pl.when(changed)
            def _():
                cot_dma(nc % 2, 0).wait()

            log_t = jnp.where(changed, 0.0, log_t)
            prefix_g = jnp.where(changed, 0.0, prefix_g)

            cslot = nc % 2
            cot_r = cot_buf[cslot, 0:1, :]
            cot_g = cot_buf[cslot, 1:2, :]
            cot_b = cot_buf[cslot, 2:3, :]
            cot_a = cot_buf[cslot, 3:4, :]
            cot_d = cot_buf[cslot, 4:5, :]
            g_tot = cot_buf[cslot, 5:6, :]
            basis4 = jnp.concatenate([cot_r, cot_g, cot_b, cot_d], axis=0).T

            start = starts_ref[t]
            stop = starts_ref[t + 1]
            px, py = _pixel_coords(t, n_tiles_x, ts, p)
            rows = ent_buf[slot].T  # (CH, 16)
            alpha, dx, dy, _ = _chunk_alpha(rows, px, py)
            rid = jax.lax.broadcasted_iota(jnp.int32, (ch, 1), 0) + off
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
            )
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
            m1 = jax.lax.dot_general(
                w, basis4, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            red = lambda x: jnp.sum(x, axis=1, keepdims=True)
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
            ).T  # (16, CH)
            dent = dent + jnp.where(carried != 0, carry_buf[...], 0.0)

            prefix_g = prefix_incl[ch - 1 : ch, :]
            log_t = log_t + cum[ch - 1 : ch, :]

            saturated = jnp.max(log_t) < LOG_TMIN
            jumped = saturated & (nxt_t == t)
            jt = jnp.where(jumped, scan, nxt_t)
            jo = jnp.where(
                jumped, jnp.where(jt < n_tiles, off0(jt), 0), nxt_off
            )

            # Defer the write while the NEXT visit targets this same chunk
            # (a boundary chunk shared with the next tile): accumulate in
            # carry_buf, write once. Same-chunk revisits are adjacent.
            carry_next = (jt < n_tiles) & (jo == off)

            @pl.when(carry_next)
            def _():
                carry_buf[...] = dent

            @pl.when(~carry_next)
            def _():
                pslot = npw % 2

                @pl.when(npw >= 2)
                def _():
                    put_dma(pslot, 0).wait()

                dent_buf[pslot] = dent
                put_dma(pslot, off).start()

            npw = npw + (~carry_next).astype(jnp.int32)

            # Jump: zero-fill the skipped wholly-owned chunks, drain the
            # stray prefetch, restart the input pipeline, prefetch the
            # jump target's cot rows.
            @pl.when(jumped)
            def _():
                oz_end = (stop // ch) * ch

                def zfill(o, npw_):
                    pslot = npw_ % 2

                    @pl.when(npw_ >= 2)
                    def _():
                        put_dma(pslot, 0).wait()

                    dent_buf[pslot] = jnp.zeros(
                        (ENT_WIDTH, ch), jnp.float32
                    )
                    put_dma(pslot, o).start()
                    return npw_ + 1

                jax.lax.fori_loop(
                    0, jnp.maximum(oz_end - (off + ch), 0) // ch,
                    lambda i, n_: zfill(off + ch + i * ch, n_), npw,
                )

                @pl.when(nxt_t < n_tiles)
                def _():
                    in_dma(1 - slot, nxt_off).wait()  # drain stray

                @pl.when(jt < n_tiles)
                def _():
                    in_dma(1 - slot, jo).start()

            npw = npw + jnp.where(
                jumped,
                jnp.maximum((stop // ch) * ch - (off + ch), 0) // ch,
                0,
            )

            # Prefetch the next tile's cotangent rows the moment this visit
            # is the one that leaves tile t.
            @pl.when((jt != t) & (jt < n_tiles))
            def _():
                cot_dma((nc + 1) % 2, jt).start()

            return (jt, jo, 1 - slot, t, nc, npw,
                    carry_next.astype(jnp.int32), log_t, prefix_g)

        # cur/nc start at -1: the FIRST visit must register as a tile
        # change so it waits on the prologue's cot DMA (slot 0 == nc%2
        # after the first increment).
        init = (
            t0,
            jnp.where(t0 < n_tiles, off0(t0), 0),
            jnp.int32(0),
            jnp.int32(-1),
            jnp.int32(-1),
            jnp.int32(0),
            jnp.int32(0),
            jnp.zeros((1, p), jnp.float32),
            jnp.zeros((1, p), jnp.float32),
        )
        _, _, _, _, _, npw, _, _, _ = jax.lax.while_loop(cond, body, init)

        @pl.when(npw >= 2)
        def _():
            put_dma(npw % 2, 0).wait()

        @pl.when(npw >= 1)
        def _():
            put_dma((npw - 1) % 2, 0).wait()

    return kernel


def blend_backward_stream(
    aligned_ent: jnp.ndarray,  # (16, K_pad) transposed sorted entries
    aligned_starts: jnp.ndarray,  # (T+1,) int32 compact tile ranges
    cot: jnp.ndarray,  # (T, 8, P): gC rgb, gA_eff, gD, Gtot, 0, 0
    n_tiles_y: int,
    n_tiles_x: int,
    ts: int,
    ch: int = 128,
    depth_threshold: float = 0.0,
    interpret: bool = False,
):
    """Returns d_ent (16, K_cap) per-entry gradients (rows past each tile's
    valid range are zero; the global tail past the last tile is zeroed by
    the caller, same contract as blend_backward_pallas)."""
    n_tiles = n_tiles_y * n_tiles_x
    p = ts * ts
    kernel = _make_bwd_kernel(n_tiles_x, n_tiles, ts, ch, depth_threshold)
    k_cap = aligned_ent.shape[1]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, ENT_WIDTH, ch), jnp.float32),
            pltpu.VMEM((2, ENT_WIDTH, ch), jnp.float32),
            pltpu.VMEM((2, OUT_ROWS, p), jnp.float32),
            pltpu.VMEM((ENT_WIDTH, ch), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((ENT_WIDTH, k_cap), jnp.float32),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(aligned_starts, aligned_ent, cot)
