"""Pallas TPU kernel: dense segment-sum of id-sorted gradient rows.

The rasterizer backward reduces K ~ 1.4M per-entry gradients to N-space.
After the id-keyed `lax.sort`, the remaining work is "sum each id's run and
place it at row id of a dense (N, 16) output". The XLA formulation (masked
suffix doubling + first-row scatter-min + stacked row gather) spends
~17 ms/step ALMOST ENTIRELY in the scatter-min and the gather — XLA scatter
lowers at ~150M elem/s on v5e (see docs/performance.md).

This kernel replaces all of it with window-local MXU matmuls:

  * the output id space is cut into windows of W ids; window j's
    contributing rows live in the contiguous sorted range
    [searchsorted(ids, j*W), searchsorted(ids, (j+1)*W)) — the (n_win+1,)
    bounds array is a few thousand binary searches, computed in XLA and
    passed as scalar prefetch (like the blend kernels' tile starts);
  * each window streams its row range in (8, CH) int32 chunks (rows 0-4:
    bf16-packed gradient pairs, row 5: the sorted ids) and accumulates
      acc (16, W) += vals_bf16 (16, CH) @ onehot_bf16 (CH, W)
    where onehot[r, w] = (ids[r] == j*W + w). Ids outside the window give
    all-zero one-hot rows, so boundary chunks shared by two windows need no
    masking, and summing EVERY row of an id replaces the suffix-doubling
    run machinery outright (no run-length bound needed).
  * one-hot entries and bf16 payloads are exact in bf16, and the MXU
    accumulates in f32 — bit-identical totals to the XLA reduction of the
    same bf16-quantized gradients.

Output is (n_win * W, 16) f32 in PAIR-MAJOR column order (hi columns
0,2,4,6,8 then lo columns 1,3,5,7,9): the (16, W) accumulator layout keeps
the minor dim lane-dense; the caller un-permutes with one static column
take. CUDA counterpart: none — the reference scatters gradients with
atomicAdd inside the backward kernel (diff_gaussian_rasterization
backward.cu); this sort + windowed-matmul pipeline is the TPU-native
equivalent.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Output column order: grads [0,2,4,6,8] (pair-hi) then [1,3,5,7,9] (pair-lo).
PERM = (0, 2, 4, 6, 8, 1, 3, 5, 7, 9)
INV_PERM = (0, 5, 1, 6, 2, 7, 3, 8, 4, 9, 10, 11, 12, 13, 14, 15)
OUT_ROWS = 16


def pack_bf16_pairs(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """int32 carrying bf16(a) in the high 16 bits, bf16(b) in the low.

    THE pairing convention of the K->N reduce: tiled.py packs grad column
    pairs (2i, 2i+1) with this before the id-keyed sort, the kernel below
    unpacks them into pair-major rows (PERM order), and INV_PERM restores
    column order on the way out. Keep pack/unpack/PERM here, together —
    a drifted copy would land gradients in the wrong parameter columns
    with no error."""
    ai = jax.lax.bitcast_convert_type(
        a.astype(jnp.bfloat16), jnp.uint16
    ).astype(jnp.uint32)
    bi = jax.lax.bitcast_convert_type(
        b.astype(jnp.bfloat16), jnp.uint16
    ).astype(jnp.uint32)
    return jax.lax.bitcast_convert_type((ai << 16) | bi, jnp.int32)


def unpack_bf16_pairs(v: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Inverse of pack_bf16_pairs: (hi, lo) bf16 arrays (quantized)."""
    u = jax.lax.bitcast_convert_type(v, jnp.uint32)
    hi = jax.lax.bitcast_convert_type((u >> 16).astype(jnp.uint16), jnp.bfloat16)
    lo = jax.lax.bitcast_convert_type((u & 0xFFFF).astype(jnp.uint16), jnp.bfloat16)
    return hi, lo


def _make_kernel(window: int, ch: int, g_win: int):
    def kernel(wb_ref, mat_hbm, out_ref, buf, sems):
        pg = pl.program_id(0)

        def do_window(gw: int):
            j = pg * g_win + gw
            lb = wb_ref[j]
            ub = wb_ref[j + 1]
            c0 = (lb // ch) * ch
            n_chunks = jnp.where(ub > lb, (ub - c0 + ch - 1) // ch, 0)
            g0 = (j * window).astype(jnp.int32)

            def chunk_dma(slot, ci):
                off = pl.multiple_of(c0 + ci * ch, ch)
                return pltpu.make_async_copy(
                    mat_hbm.at[:, pl.ds(off, ch)],
                    buf.at[slot],
                    sems.at[slot],
                )

            @pl.when(n_chunks > 0)
            def _():
                chunk_dma(0, 0).start()

            wi = jax.lax.broadcasted_iota(jnp.int32, (ch, window), 1)

            def body(ci, acc):
                slot = ci % 2

                @pl.when(ci + 1 < n_chunks)
                def _():
                    chunk_dma((ci + 1) % 2, ci + 1).start()

                chunk_dma(slot, ci).wait()
                rows = buf[slot]  # (8, CH) int32
                hi, lo = unpack_bf16_pairs(rows[0:5])
                vals = jnp.concatenate(
                    [hi, lo, jnp.zeros((OUT_ROWS - 10, ch), jnp.bfloat16)],
                    axis=0,
                )  # (16, CH) bf16, pair-major rows
                ids = rows[5:6]  # (1, CH)
                onehot = (ids.T - g0 == wi).astype(jnp.bfloat16)  # (CH, W)
                return acc + jax.lax.dot_general(
                    vals,
                    onehot,
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )

            acc = jax.lax.fori_loop(
                0, n_chunks, body, jnp.zeros((OUT_ROWS, window), jnp.float32)
            )
            out_ref[0, gw] = acc

        for gw in range(g_win):
            do_window(gw)

    return kernel


def sorted_segment_sum_pallas(
    sorted_ids: jnp.ndarray,  # (K,) int32, ascending
    packed: tuple[jnp.ndarray, ...],  # 5 x (K,) int32 bf16-packed grad pairs
    n_out: int,
    window: int = 256,
    ch: int = 512,
    g_win: int = 4,
    interpret: bool = False,
) -> jnp.ndarray:
    """Returns (n_out, 16) f32: row g = sum of grad rows with id g, columns
    in natural grad order 0..9 (cols 10-15 zero). Ids >= n_out are summed
    into windows past n_out and sliced away (trash ids / padding)."""
    k = sorted_ids.shape[0]
    n_win = -(-n_out // window)
    n_pg = -(-n_win // g_win)
    k_pad = -(-k // ch) * ch
    pad = k_pad - k
    if pad:
        sorted_ids = jnp.concatenate(
            [sorted_ids, jnp.full((pad,), jnp.int32(2**31 - 1))]
        )
        packed = tuple(
            jnp.concatenate([c, jnp.zeros((pad,), jnp.int32)]) for c in packed
        )
    mat = jnp.stack(
        list(packed)
        + [sorted_ids, jnp.zeros_like(sorted_ids), jnp.zeros_like(sorted_ids)]
    )  # (8, K_pad) int32
    # Window bounds: a few thousand binary searches (cheap in XLA) replace
    # the 1.4M-source scatter-min of the old first-row extraction. The
    # bounds only say which chunk range to stream; in-window membership is
    # decided by the one-hot itself, so sentinel-padded tails are harmless.
    edges = (
        jnp.arange(n_pg * g_win + 1, dtype=jnp.int32) * window
    )
    wb = jnp.searchsorted(sorted_ids, edges, side="left").astype(jnp.int32)
    kernel = _make_kernel(window, ch, g_win)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_pg,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (1, g_win, OUT_ROWS, window),
            lambda j, wb: (j, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((2, 8, ch), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (n_pg, g_win, OUT_ROWS, window), jnp.float32
        ),
        interpret=interpret,
    )(wb, mat)
    # (n_pg, G, 16, W) -> (n_tot, 16) rows in id order, natural grad columns.
    out = out.transpose(0, 1, 3, 2).reshape(n_pg * g_win * window, OUT_ROWS)
    return jnp.take(out[:n_out], jnp.asarray(INV_PERM), axis=1)
