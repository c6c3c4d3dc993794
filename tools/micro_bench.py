"""Micro-benchmarks isolating suspected rasterizer bottlenecks on TPU."""

import sys
import time

import numpy as np


def timeit(fn, *args, warmup=2, iters=20):
    import jax

    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp

    rng = np.random.RandomState(0)
    K = 2_000_000
    N = 500_000
    ent = jnp.asarray(rng.rand(N + 1, 12), jnp.float32)
    idx = jnp.asarray(rng.randint(0, N, K), jnp.int32)

    # 1. One big row gather (K rows from N).
    g = jax.jit(lambda e, i: e[i])
    print(f"big gather {K} rows: {timeit(g, ent, idx)*1e3:8.2f} ms")

    # 2. Chunked gather inside a loop (the current blend pattern):
    TB, CH, P = 256, 64, 256
    pos = jnp.asarray(rng.randint(0, K, (TB, CH)), jnp.int32)
    sorted_ent = jnp.asarray(rng.rand(K, 12), jnp.float32)

    def loop_gather(e, p0):
        def body(i, acc):
            rows = e[(p0 + i) % K]  # (TB, CH, 12)
            return acc + jnp.sum(rows)

        return jax.lax.fori_loop(0, 140, body, 0.0)

    print(f"140x chunked gather (TB*CH rows): {timeit(jax.jit(loop_gather), sorted_ent, pos)*1e3:8.2f} ms")

    # 3. Same loop but with pure compute on static slices (no gather).
    def loop_compute(e):
        px = jnp.asarray(rng.rand(TB, P), jnp.float32)

        def body(i, carry):
            logt, acc = carry
            rows = jax.lax.dynamic_slice(e, (i * 17 % 1000, 0), (TB * CH, 12)).reshape(TB, CH, 12)
            dx = px[:, None, :] - rows[:, :, 0, None]
            dy = px[:, None, :] - rows[:, :, 1, None]
            power = -0.5 * (rows[:, :, 2, None] * dx * dx + rows[:, :, 4, None] * dy * dy)
            alpha = jnp.minimum(0.99, rows[:, :, 8, None] * jnp.exp(power))
            lg = jnp.log1p(-alpha)
            cum = jnp.cumsum(lg, axis=1)
            w = jnp.where(logt[:, None, :] + cum >= -9.21, alpha * jnp.exp(cum - lg), 0.0)
            acc = acc + jnp.sum(w * rows[:, :, 5, None], axis=1)
            logt = logt + cum[:, -1, :]
            return logt, acc

        return jax.lax.fori_loop(
            0, 140, body, (jnp.zeros((TB, P)), jnp.zeros((TB, P)))
        )[1]

    print(f"140x compute-only (dyn slice): {timeit(jax.jit(loop_compute), sorted_ent)*1e3:8.2f} ms")

    # 4. The compaction scatter + sort from binning, isolated.
    mt = 16
    flatv = jnp.asarray(rng.rand(N * mt) < 0.17)
    tile_key = jnp.asarray(rng.randint(0, 3888, N * mt), jnp.int32)
    depth = jnp.asarray(rng.rand(N * mt), jnp.float32)

    def compact_and_sort(v, tk, d):
        rank = jnp.cumsum(v.astype(jnp.int32)) - 1
        p = jnp.where(v & (rank < K), rank, K)
        tkc = jnp.full((K + 1,), 3888, jnp.int32).at[p].set(tk)[:K]
        dc = jnp.zeros((K + 1,), d.dtype).at[p].set(d)[:K]
        pc = jnp.zeros((K + 1,), jnp.int32).at[p].set(jnp.arange(N * mt, dtype=jnp.int32))[:K]
        return jax.lax.sort((tkc, dc, pc), num_keys=2)[2]

    print(f"compact+scatter+sort: {timeit(jax.jit(compact_and_sort), flatv, tile_key, depth)*1e3:8.2f} ms")

    def sort_only(tk, d):
        pc = jnp.arange(K, dtype=jnp.int32)
        return jax.lax.sort((tk[:K], d[:K], pc), num_keys=2)[2]

    print(f"sort only (2M): {timeit(jax.jit(sort_only), tile_key, depth)*1e3:8.2f} ms")

    # 5. unique-index scatter of K rows (backward d_ent write pattern).
    vals = jnp.asarray(rng.rand(TB * CH, 12), jnp.float32)
    buf = jnp.zeros((K + 1, 12), jnp.float32)

    def loop_scatter(b, p0):
        def body(i, bb):
            return bb.at[(p0.reshape(-1) + i) % K].set(vals, unique_indices=True, mode="drop")

        return jax.lax.fori_loop(0, 140, body, b)

    print(f"140x chunked unique set: {timeit(jax.jit(loop_scatter), buf, pos)*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
