"""Microbench: K->N segmented-reduction variants at bench sizes.

Candidates for the rasterizer backward's gradient reduction
(tiled.py _blend_with_vjp_pallas blend_bwd):
  A. 11-operand sort + masked suffix doubling (current)
  B. 2-operand sort (idx, position) + row gather + suffix doubling
  C. scatter-add (.at[idx].add) straight into the (N, 10) output
  D. variant B but gathering through a (K, 10) matrix laid out row-major

Usage: python tools/micro_kn.py [k_al] [n]
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def timeit(f, *args, reps=5, label=""):
    import jax

    jf = jax.jit(f)
    out = jf(*args)
    float(jax.tree.leaves(out)[0].reshape(-1)[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = jf(*args)
    float(jax.tree.leaves(out)[0].reshape(-1)[0])
    dt = (time.perf_counter() - t0) / reps
    print(f"{label:44s} {dt*1e3:8.2f} ms")
    return dt


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    k_al = int(sys.argv[1]) if len(sys.argv) > 1 else 1_724_416
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 524_288
    n_live = 10
    max_run = 32  # 2 * max_tiles_per_gaussian bound on run length

    rng = np.random.RandomState(0)
    # realistic: ~25% fillers pointing at trash rows, runs of <= 12
    ids = rng.randint(0, n, size=k_al).astype(np.int32)
    ai = jnp.asarray(np.sort(ids))  # roughly grouped like aligned_idx
    d = jnp.asarray(rng.rand(16, k_al).astype(np.float32))

    def suffix_double(sg, vals):
        k = sg.shape[0]
        step = 1
        while step < max_run:
            same = sg[:-step] == sg[step:]
            shifted = jnp.where(same[:, None], vals[step:], 0.0)
            vals = jnp.concatenate(
                [vals[: k - step] + shifted, vals[k - step:]], axis=0
            )
            step *= 2
        return vals

    def first_rows(sg, vals, k):
        e = jnp.arange(k, dtype=jnp.int32)
        bpos = jnp.full((n + 4097,), k, jnp.int32).at[sg].min(e)[: n + 4096]
        present = bpos < k
        return jnp.where(present[:, None], vals[jnp.minimum(bpos, k - 1)], 0.0)

    def var_a(d):
        ops = (ai,) + tuple(d[i] for i in range(n_live))
        s = jax.lax.sort(ops, num_keys=1)
        vals = suffix_double(s[0], jnp.stack(s[1:], axis=-1))
        return first_rows(s[0], vals, k_al)

    timeit(var_a, d, label="A: 11-op sort + suffix-double")

    def var_b(d):
        pos = jnp.arange(k_al, dtype=jnp.int32)
        sg, spos = jax.lax.sort((ai, pos), num_keys=1)
        vals = d[:n_live].T[spos]  # (k_al, 10) row gather
        vals = suffix_double(sg, vals)
        return first_rows(sg, vals, k_al)

    timeit(var_b, d, label="B: 2-op sort + row gather")

    def var_c(d):
        rows = d[:n_live].T  # (k_al, 10)
        return jnp.zeros((n + 4096, n_live), jnp.float32).at[ai].add(rows)

    timeit(var_c, d, label="C: scatter-add")

    def var_c16(d):
        rows = d.T  # (k_al, 16)
        return jnp.zeros((n + 4096, 16), jnp.float32).at[ai].add(rows)

    timeit(var_c16, d, label="C16: scatter-add all 16 cols")

    # ---- sub-stage breakdown of the CURRENT (bf16-packed) variant ---------
    def pack(a, b):
        au = jax.lax.bitcast_convert_type(
            a.astype(jnp.bfloat16), jnp.uint16
        ).astype(jnp.uint32)
        bu = jax.lax.bitcast_convert_type(
            b.astype(jnp.bfloat16), jnp.uint16
        ).astype(jnp.uint32)
        return jax.lax.bitcast_convert_type((au << 16) | bu, jnp.int32)

    def unpack(v):
        u = jax.lax.bitcast_convert_type(v, jnp.uint32)
        hi = jax.lax.bitcast_convert_type(
            (u >> 16).astype(jnp.uint16), jnp.bfloat16
        ).astype(jnp.float32)
        lo = jax.lax.bitcast_convert_type(
            (u & 0xFFFF).astype(jnp.uint16), jnp.bfloat16
        ).astype(jnp.float32)
        return hi, lo

    def sort_only(d):
        ops = (ai,) + tuple(pack(d[2 * i], d[2 * i + 1]) for i in range(5))
        s = jax.lax.sort(ops, num_keys=1)
        return s[0]

    timeit(sort_only, d, label="cur/sort only (1 key + 5 packed)")

    sorted_full = jax.jit(
        lambda d: jax.lax.sort(
            (ai,) + tuple(pack(d[2 * i], d[2 * i + 1]) for i in range(5)),
            num_keys=1,
        )
    )(d)
    sg0 = sorted_full[0]
    vals0 = jnp.stack(
        [c for v in sorted_full[1:] for c in unpack(v)], axis=-1
    )

    def double_only(vals):
        return suffix_double(sg0, vals)

    timeit(double_only, vals0, label="cur/suffix-double only (5 passes)")

    def bpos_only(vals):
        e = jnp.arange(k_al, dtype=jnp.int32)
        bpos = jnp.full((n + 4097,), k_al, jnp.int32).at[sg0].min(e)[: n + 4096]
        return bpos + vals.shape[0] * 0

    timeit(bpos_only, vals0, label="cur/bpos scatter-min only")

    def final_gather_only(vals):
        e = jnp.arange(k_al, dtype=jnp.int32)
        bpos = jnp.full((n + 4097,), k_al, jnp.int32).at[sg0].min(e)[: n + 4096]
        present = bpos < k_al
        return jnp.where(
            present[:, None], vals[jnp.minimum(bpos, k_al - 1)], 0.0
        )

    timeit(final_gather_only, vals0, label="cur/bpos + final gather")

    def cur_full(d):
        ops = (ai,) + tuple(pack(d[2 * i], d[2 * i + 1]) for i in range(5))
        s = jax.lax.sort(ops, num_keys=1)
        sg = s[0]
        vals = jnp.stack([c for v in s[1:] for c in unpack(v)], axis=-1)
        vals = suffix_double(sg, vals)
        return first_rows(sg, vals, k_al)

    timeit(cur_full, d, label="cur/full bf16-packed reduce")


if __name__ == "__main__":
    main()
