"""Microbench: entry gather+transpose variants at bench sizes.

The production form is `ent[idx].T` — (N+trash, 16) f32 row-gather into
sorted order, then transpose to the kernels' (16, K) layout (~11 ms/step).
Variants probe where the time goes: the random row gather itself, the
transpose, or a lane-padded (K, 16) intermediate.

Every variant reduces over its full output (sort/gather outputs that nothing
consumes get DCE'd — see docs/performance.md).

Usage: python tools/micro_gather.py [k] [n]
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
            jnp.sum(leaf.astype(jnp.float32)) for leaf in jax.tree.leaves(out)
        )

    jf = jax.jit(scalarized)
    float(jf(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = jf(*args)
    float(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{label:52s} {dt*1e3:8.2f} ms", flush=True)
    return dt


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    k = int(sys.argv[1]) if len(sys.argv) > 1 else 1_400_064
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 504_096
    w = 16
    rng = np.random.RandomState(0)
    ent = jnp.asarray(rng.rand(n, w), jnp.float32)
    ent_t = jnp.asarray(np.asarray(ent).T)  # (16, N)
    idx = jnp.asarray(rng.randint(0, n, k), jnp.int32)

    timeit(lambda e, i: e[i].T, ent, idx, label="rowgather + T (production)")
    timeit(lambda e, i: e[i], ent, idx, label="rowgather only -> (K,16)")
    timeit(lambda e, i: e[i].T, ent[:, :8], idx, label="rowgather(8 cols) + T")
    timeit(
        lambda e, i: jnp.take(e, i, axis=1), ent_t, idx,
        label="lane gather from (16,N) -> (16,K)",
    )
    timeit(
        lambda e, i: e.reshape(n, 2, 8)[i].transpose(1, 2, 0), ent, idx,
        label="rowgather (N,2,8) + transpose",
    )
    # Transpose alone on a materialized (K, 16).
    g = jax.jit(lambda e, i: e[i])(ent, idx)
    timeit(lambda x: x.T, g, label="transpose (K,16) -> (16,K) alone")


if __name__ == "__main__":
    main()
