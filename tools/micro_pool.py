"""Microbench: tier-B (overflow pool) build variants at bench sizes.

The pool build = slot->gaussian mapping + one packed (N, 12) row gather +
per-slot key/cull math (binning.py). Candidates to beat the gather:

  gather   — current: marks scatter + cummax + (N,12) row gather
  u64fill  — scatter (rank<<32 | value_bits) u64 per column at pstart,
             cummax-fill, unpack: no gather at all, but one scatter+cummax
             per carried column

Honest timing: every variant reduces its full output set.

Usage: python tools/micro_pool.py
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

    n = 500_000
    pool = n
    rng = np.random.RandomState(0)
    # need distribution like the bench scene: ~115k big gaussians, 2-5 extra
    need_np = np.zeros(n, np.int32)
    big = rng.rand(n) < 0.23
    need_np[big] = rng.choice([2, 5], big.sum(), p=[0.7, 0.3])
    need = jnp.asarray(need_np)
    vals = jnp.asarray(rng.rand(n, 12).astype(np.float32))

    def build_map(need):
        pstart = jnp.cumsum(need) - need
        gid = jnp.arange(n, dtype=jnp.int32)
        marks = jnp.zeros((pool,), jnp.int32).at[pstart].max(
            jnp.where(need > 0, gid + 1, 0), mode="drop"
        )
        g = jax.lax.cummax(marks, axis=0) - 1
        return pstart, g

    def v_gather(need, vals):
        pstart, g = build_map(need)
        rows = vals[jnp.clip(g, 0, n - 1)]  # (pool, 12)
        return rows, g, pstart

    timeit(v_gather, need, vals, label="marks+cummax+(N,12) row gather (current)")

    def v_u64fill(need, vals):
        pstart = jnp.cumsum(need) - need
        gid = jnp.arange(n, dtype=jnp.int32)
        rank = jnp.where(need > 0, (gid + 1).astype(jnp.uint64), 0)
        outs = []
        for c in range(12):
            bits = jax.lax.bitcast_convert_type(vals[:, c], jnp.uint32)
            packed = (rank << 32) | bits.astype(jnp.uint64)
            col = jnp.zeros((pool,), jnp.uint64).at[pstart].max(
                packed, mode="drop"
            )
            filled = jax.lax.cummax(col, axis=0)
            outs.append(
                jax.lax.bitcast_convert_type(
                    (filled & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32),
                    jnp.float32,
                )
            )
        g = (jax.lax.cummax(
            jnp.zeros((pool,), jnp.uint64).at[pstart].max(rank, mode="drop")
        ) - 1).astype(jnp.int32)
        return outs, g

    timeit(v_u64fill, need, vals, label="u64 rank|bits scatter+cummax fill x12")

    # gather with fewer packed columns (how does gather scale with width?)
    for w in (6, 3, 1):
        vw = vals[:, :w]

        def v_gw(need, vw=vw, w=w):
            pstart, g = build_map(need)
            rows = vw[jnp.clip(g, 0, n - 1)]
            return rows, g, pstart

        timeit(v_gw, need, vw, label=f"row gather width {w}")


if __name__ == "__main__":
    main()
