"""Microbench: binning sub-stages at bench sizes on the real TPU.

DCE WARNING (learned the hard way): lax.sort with unused outputs gets
simplified away — every variant here must consume ALL TileBins leaves
(timeit reduces the first element of every output leaf), or the number
measures only the pre-sort key build.

Stage attribution is by subtraction: full two-tier minus sort-only minus
searchsorted approximates the candidate key/pool construction.

Usage: python tools/micro_binning.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def timeit(f, *args, reps=10, label=""):
    import jax
    import jax.numpy as jnp

    def scalarized(*a):
        out = f(*a)
        return sum(
            jnp.sum(leaf.reshape(-1)[:1].astype(jnp.float32))
            for leaf in jax.tree.leaves(out)
        )

    g = jax.jit(scalarized)
    float(g(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = g(*args)
    float(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{label:44s} {dt*1e3:8.2f} ms", flush=True)
    return dt


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from bench import N_GAUSSIANS, WIDTH, HEIGHT, bench_scene, _bench_cameras
    from dogs_tpu.raster import binning
    from dogs_tpu.raster.projection import project_gaussians

    n = N_GAUSSIANS
    params = bench_scene(n)
    cam = _bench_cameras(2)[1]
    proj = jax.jit(
        lambda p: project_gaussians(p, cam, active_sh_degree=3)
    )(params)

    ts = 16
    mt, mta, pool_cap, bin_cap = 12, 4, n, 1_400_000
    n_tx = -(-WIDTH // ts)
    n_ty = -(-HEIGHT // ts)
    n_tiles = n_tx * n_ty

    # Every lambda returns the full TileBins -> timeit consumes all leaves
    # (sorted_idx, sorted_tile, tile_starts, counters) so nothing is DCE'd.
    timeit(
        lambda pr: binning.build_tile_bins(
            pr, HEIGHT, WIDTH, tile_size=ts, max_tiles_per_gaussian=mt,
            base_tiles=mta, overflow_capacity=pool_cap, bin_capacity=bin_cap,
        ),
        proj, label="full two-tier (bt=4, pool=N, cap=1.4M)",
    )

    timeit(
        lambda pr: binning.build_tile_bins(
            pr, HEIGHT, WIDTH, tile_size=ts, max_tiles_per_gaussian=mt,
            bin_capacity=bin_cap,
        ),
        proj, label="full single-tier mt=12 (6M sort)",
    )

    # Sort-only at the two-tier candidate count (2.5M).
    rng = np.random.RandomState(0)
    m = n * mta + pool_cap
    key = jnp.asarray(rng.randint(0, 2**30, m, dtype=np.int32))
    pay = jnp.arange(m, dtype=jnp.int32)
    timeit(
        lambda k: jax.lax.sort((k, pay), num_keys=1), key,
        label="sort only 2.5M x 2 ops",
    )

    # searchsorted starts at kept size.
    sk = jnp.sort(jnp.asarray(rng.randint(0, n_tiles, bin_cap, dtype=np.int32)))
    q = jnp.arange(n_tiles + 1, dtype=jnp.int32)
    timeit(
        lambda s: jnp.searchsorted(s, q, side="left"), sk,
        label="searchsorted starts (3889 into 1.4M)",
    )

    # scatter-min alternative for tile_starts (bpos-style): scatter entry
    # iota at its tile id, then a reverse cummin fills empty tiles.
    def starts_scatter(sorted_tile):
        e = jnp.arange(bin_cap, dtype=jnp.int32)
        raw = jnp.full((n_tiles + 2,), bin_cap, jnp.int32).at[
            jnp.minimum(sorted_tile, n_tiles + 1)
        ].min(e)
        rev = jax.lax.cummin(raw[::-1])[::-1]
        return rev[: n_tiles + 1]

    timeit(starts_scatter, sk, label="starts via scatter-min + rev cummin")


if __name__ == "__main__":
    main()
