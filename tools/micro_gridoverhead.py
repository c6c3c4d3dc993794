"""Measure per-grid-program overhead of the Pallas blend kernels.

Runs the forward kernel on workloads with the SAME total entry count but
different tile counts (entries concentrated in few tiles vs spread over
all), isolating the fixed per-program cost (scalar setup, first-chunk DMA
latency not hidden across grid steps). If overhead ~ tiles, merging G tiles
per program is the lever.

Usage: python tools/micro_gridoverhead.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def run(n_tiles_used, k_total, n_tiles_y=54, n_tiles_x=72, ch=128, reps=20):
    import jax
    import jax.numpy as jnp

    from dogs_tpu.raster.pallas_blend import ENT_WIDTH, blend_forward_pallas

    n_tiles = n_tiles_y * n_tiles_x
    per = k_total // n_tiles_used
    k = per * n_tiles_used
    k_pad = -(-k // ch) * ch
    rng = np.random.RandomState(0)
    ent = np.zeros((ENT_WIDTH, k_pad), np.float32)
    # Entries centered in their tile with ~3px footprint, mid opacity.
    tile_of = np.repeat(np.arange(n_tiles_used), per)
    ty = tile_of // n_tiles_x
    tx = tile_of - ty * n_tiles_x
    ent[0, :k] = tx * 16 + 8 + rng.randn(k)
    ent[1, :k] = ty * 16 + 8 + rng.randn(k)
    ent[2, :k] = 0.1
    ent[4, :k] = 0.1
    ent[5:8, :k] = 0.5
    ent[8, :k] = 0.02  # low opacity: no saturation exit, full replay
    ent[9, :k] = 0.2
    starts = np.zeros(n_tiles + 1, np.int32)
    starts[1 : n_tiles_used + 1] = per
    starts = np.cumsum(starts).astype(np.int32)

    ent_d = jnp.asarray(ent)
    starts_d = jnp.asarray(starts)

    def f(e):
        out = blend_forward_pallas(e, starts_d, n_tiles_y, n_tiles_x, 16, ch=ch)
        return out

    def chained(e):
        def body(i, carry):
            out = f(e + carry * 0.0)
            return out[0, 0, 0]

        return jax.lax.fori_loop(0, reps, body, jnp.float32(0.0))

    g = jax.jit(chained)
    float(g(ent_d))
    t0 = time.perf_counter()
    float(g(ent_d))
    dt = (time.perf_counter() - t0) / reps
    print(
        f"tiles_used={n_tiles_used:5d} K={k:8d} chunks~{k // ch:6d} "
        f"-> {dt * 1e3:7.3f} ms"
    )
    return dt


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
    K = 1_400_000
    # All 3888 tiles busy (bench-like) vs concentrated in fewer tiles.
    for tiles in (3888, 1944, 972, 486, 128):
        run(tiles, K)
    # Pure overhead floor: tiny K spread over all tiles (1 chunk each).
    run(3888, 3888 * 4)


if __name__ == "__main__":
    main()
