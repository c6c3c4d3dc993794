"""Decompose the CURRENT bf16-packed K->N reduction into stage costs.

Cumulative timings (each includes the previous stages; every output leaf is
reduced so nothing is DCE'd):
  1. 6-op sort (id key + 5 bf16-packed payloads)
  2. + unpack to 10 f32 columns
  3. + masked suffix doubling (steps 1,2,4,8)
  4. + bpos scatter-min (first-row position per id)
  5. + stack + row gather + where  (the full reduction)

Usage: python tools/micro_kn_stages.py [k_al] [n]
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def timeit(f, *args, reps=10, label=""):
    import jax

    jf = jax.jit(f)
    out = jf(*args)
    float(sum(jnp_leaf.sum() for jnp_leaf in jax.tree.leaves(out)))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = jf(*args)
    float(sum(jnp_leaf.sum() for jnp_leaf in jax.tree.leaves(out)))
    dt = (time.perf_counter() - t0) / reps
    print(f"{label:40s} {dt*1e3:8.2f} ms")
    return dt


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    k_al = int(sys.argv[1]) if len(sys.argv) > 1 else 1_400_064
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 500_000
    mt = 12

    rng = np.random.RandomState(0)
    ids = np.sort(rng.randint(0, n, size=k_al)).astype(np.int32)
    ai = jnp.asarray(ids)
    grads = jnp.asarray(rng.randn(10, k_al).astype(np.float32))

    def pack(a, b):
        a16 = jax.lax.bitcast_convert_type(a.astype(jnp.bfloat16), jnp.uint16)
        b16 = jax.lax.bitcast_convert_type(b.astype(jnp.bfloat16), jnp.uint16)
        return jax.lax.bitcast_convert_type(
            (a16.astype(jnp.uint32) << 16) | b16.astype(jnp.uint32), jnp.int32
        )

    packed = tuple(pack(grads[2 * i], grads[2 * i + 1]) for i in range(5))

    def unpack(v):
        u = jax.lax.bitcast_convert_type(v, jnp.uint32)
        hi = jax.lax.bitcast_convert_type(
            (u >> 16).astype(jnp.uint16), jnp.bfloat16
        ).astype(jnp.float32)
        lo = jax.lax.bitcast_convert_type(
            (u & 0xFFFF).astype(jnp.uint16), jnp.bfloat16
        ).astype(jnp.float32)
        return hi, lo

    def s1(ai, packed):
        return jax.lax.sort((ai,) + packed, num_keys=1)

    def s2(ai, packed):
        s = s1(ai, packed)
        cols = []
        for v in s[1:]:
            hi, lo = unpack(v)
            cols += [hi, lo]
        return [s[0]] + cols

    def doubling(sg, cols):
        step = 1
        while step < mt:
            same = sg[:-step] == sg[step:]
            cols = [
                jnp.concatenate(
                    [c[: k_al - step] + jnp.where(same, c[step:], 0.0),
                     c[k_al - step:]]
                )
                for c in cols
            ]
            step *= 2
        return cols

    def s3(ai, packed):
        out = s2(ai, packed)
        return [out[0]] + doubling(out[0], out[1:])

    def s4(ai, packed):
        out = s3(ai, packed)
        sg = out[0]
        e = jnp.arange(k_al, dtype=jnp.int32)
        bpos = jnp.full((n + 1,), k_al, jnp.int32).at[sg].min(e)[:n]
        return out + [bpos]

    def s5(ai, packed):
        out = s3(ai, packed)
        sg = out[0]
        e = jnp.arange(k_al, dtype=jnp.int32)
        bpos = jnp.full((n + 1,), k_al, jnp.int32).at[sg].min(e)[:n]
        present = bpos < k_al
        vals = jnp.stack(out[1:], axis=-1)
        return jnp.where(present[:, None], vals[jnp.minimum(bpos, k_al - 1)], 0.0)

    timeit(s1, ai, packed, label="1. sort (1 key + 5 packed)")
    timeit(s2, ai, packed, label="2. + unpack to 10 cols")
    timeit(s3, ai, packed, label="3. + suffix doubling x4")
    timeit(s4, ai, packed, label="4. + bpos scatter-min")
    timeit(s5, ai, packed, label="5. + stack/gather/where (full)")


if __name__ == "__main__":
    main()
