"""Microbench: lax.sort cost vs (rows, operand count) + gather/scatter costs.

Validates the round-2 perf plan assumptions on the real TPU:
  * sort cost scales with operand count (1-op key-embedded sort vs 2-op)
  * K->N reduce sort: 17 ops vs 11 ops
  * gather-form aligned-index build vs scatter-form
  * num_valid actually produced by the bench scene (sizes bin_capacity)
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def timeit(f, *args, reps=10, label=""):
    """Time f under jit, syncing via ONE in-jit scalar (fetching whole arrays
    through the axon tunnel costs seconds and poisons the measurement)."""
    import jax
    import jax.numpy as jnp

    def scalarized(*a):
        out = f(*a)
        return sum(
            jnp.sum(leaf[..., :1].astype(jnp.float32))
            for leaf in jax.tree.leaves(out)
        )

    g = jax.jit(scalarized)
    float(g(*args))  # compile + sync
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

    rng = np.random.RandomState(0)

    for m in (4_000_000, 6_000_000):
        keys = jnp.asarray(rng.randint(0, 2**31 - 1, m, dtype=np.int32))
        pay = jnp.arange(m, dtype=jnp.int32)
        timeit(lambda k: jax.lax.sort((k,), num_keys=1), keys,
               label=f"sort {m/1e6:.0f}M x 1 op")
        timeit(lambda k, p: jax.lax.sort((k, p), num_keys=1), keys, pay,
               label=f"sort {m/1e6:.0f}M x 2 ops")

    m = 2_100_000
    keys = jnp.asarray(rng.randint(0, 500_000, m, dtype=np.int32))
    cols_f = [jnp.asarray(rng.rand(m), np.float32) for _ in range(16)]
    timeit(
        lambda k, *cs: jax.lax.sort((k,) + cs, num_keys=1), keys, *cols_f,
        label="sort 2.1M x 17 ops (K->N now)")
    timeit(
        lambda k, *cs: jax.lax.sort((k,) + cs, num_keys=1), keys, *cols_f[:10],
        label="sort 2.1M x 11 ops (K->N trimmed)")
    m2 = 1_500_000
    timeit(
        lambda k, *cs: jax.lax.sort((k,) + cs, num_keys=1), keys[:m2],
        *[c[:m2] for c in cols_f[:10]],
        label="sort 1.5M x 11 ops")

    # presort of 500k gaussians by depth (2-op)
    n = 500_000
    depth = jnp.asarray(rng.rand(n), np.float32)
    timeit(lambda d: jax.lax.sort((d, jnp.arange(n, dtype=jnp.int32)), num_keys=1),
           depth, label="depth presort 500k x 2 ops")

    # gathers / scatters
    ent = jnp.asarray(rng.rand(n + 4096, 16), np.float32)
    idx21 = jnp.asarray(rng.randint(0, n, 2_100_000, dtype=np.int32))
    idx16 = idx21[:1_600_000]
    timeit(lambda e, i: e[i], ent, idx21, label="gather 2.1M x 16 f32 rows")
    timeit(lambda e, i: e[i].T, ent, idx21, label="gather 2.1M rows + transpose")
    timeit(lambda e, i: e[i], ent, idx16, label="gather 1.6M x 16 f32 rows")
    perm = jnp.asarray(rng.permutation(n).astype(np.int32))
    timeit(lambda e, p: e[:n][p], ent, perm, label="gather 500k rows (perm)")
    dd = jnp.asarray(rng.rand(n, 16), np.float32)
    timeit(
        lambda d, p: jnp.zeros((n, 16), jnp.float32).at[p].set(d, unique_indices=True),
        dd, perm, label="scatter-set 500k x 16 rows (perm)")

    # searchsorted over 2.1M queries / 3889 boundaries
    bounds = jnp.asarray(np.sort(rng.randint(0, 2_100_000, 3889)).astype(np.int32))
    q = jnp.arange(2_100_000, dtype=jnp.int32)
    timeit(lambda b, qq: jnp.searchsorted(b, qq), bounds, q,
           label="searchsorted 2.1M q / 3.9k bounds")

    # bench-scene num_valid (sizes bin_capacity)
    from bench import N_GAUSSIANS, WIDTH, HEIGHT, bench_scene
    from dogs_tpu.core.camera import make_camera
    from dogs_tpu.raster.binning import build_tile_bins
    from dogs_tpu.raster.projection import project_gaussians

    params = bench_scene(N_GAUSSIANS)
    cam = make_camera(R=np.eye(3), t=np.zeros(3), fx=1000.0, fy=1000.0,
                      cx=WIDTH / 2, cy=HEIGHT / 2, width=WIDTH, height=HEIGHT)
    proj = jax.jit(lambda p: project_gaussians(p, cam, active_sh_degree=3))(params)
    for mt in (8, 12):
        bins = jax.jit(
            lambda pr: build_tile_bins(pr, HEIGHT, WIDTH, tile_size=16,
                                       max_tiles_per_gaussian=mt)
        )(proj)
        print(f"mt={mt}: num_valid={int(bins.num_valid)} "
              f"truncated={int(bins.num_truncated)}", flush=True)


if __name__ == "__main__":
    main()
