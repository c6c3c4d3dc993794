"""Microbench: slot-space K->N reduce vs the current run-based reduce.

Design under test (round 3): the forward binning sort carries the SLOT id
as a second payload (slot = candidate index in the pre-sort layout: tier A
gaussian-major g*mta+j, then the overflow pool). Every candidate slot
appears exactly once across kept entries + the dropped tail, so sorting
per-entry gradients by slot id yields the slot GRID directly — the reduce
is then a fixed-stride reshape-sum (tier A) + cumsum-diff (pool) with no
suffix doubling, no bpos scatter-min, no final gather.

Costs measured:
  fwd2: binning-like sort, 1 key + 1 payload (current forward)
  fwd3: binning-like sort, 1 key + 2 payloads (new forward)
  new reduce: 6-op sort over (K_al + dropped tail) + reshape/cumsum epilogue
  (compare against tools/micro_kn.py "cur/full bf16-packed reduce")

Usage: python tools/micro_slotreduce.py
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
            jnp.sum(leaf[..., :1].astype(jnp.float32))
            for leaf in jax.tree.leaves(out)
        )

    g = jax.jit(scalarized)
    float(g(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = g(*args)
    float(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{label:48s} {dt*1e3:8.2f} ms", flush=True)
    return dt


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    n = 500_000
    mta = 4
    pool = n
    n_cand = n * mta + pool  # 2.5M candidate slots
    kept = 1_450_048  # bin_capacity (chunk-aligned)
    k_al = kept
    n_live = 10

    rng = np.random.RandomState(0)
    key = jnp.asarray(rng.randint(0, 2**30, n_cand, dtype=np.int32))
    gid = jnp.asarray(rng.randint(0, n, n_cand, dtype=np.int32))
    slot = jnp.arange(n_cand, dtype=jnp.int32)

    def fwd2(k):
        return jax.lax.sort((k, gid), num_keys=1)

    def fwd3(k):
        return jax.lax.sort((k, gid, slot), num_keys=1)

    timeit(fwd2, key, label="fwd sort 2.5M: key + gid (current)")
    timeit(fwd3, key, label="fwd sort 2.5M: key + gid + slot (new)")

    # Backward: kept entries carry packed grads; dropped tail rides zeros.
    perm = np.random.RandomState(1).permutation(n_cand).astype(np.int32)
    slot_kept = jnp.asarray(perm[:k_al])
    slot_dropped = jnp.asarray(np.sort(perm[k_al:]))
    d = jnp.asarray(rng.rand(16, k_al).astype(np.float32))
    pstart = jnp.asarray(
        np.sort(rng.randint(0, pool, n).astype(np.int32))
    )
    pend = jnp.minimum(pstart + 2, pool)

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

    def new_reduce(d):
        zeros_tail = jnp.zeros((slot_dropped.shape[0],), jnp.int32)
        keys = jnp.concatenate([slot_kept, slot_dropped])
        ops = (keys,) + tuple(
            jnp.concatenate([pack(d[2 * i], d[2 * i + 1]), zeros_tail])
            for i in range(5)
        )
        s = jax.lax.sort(ops, num_keys=1)
        # s[1:][p] is the packed grad of slot p. Tier A: (N, mta) slots.
        cols = []
        for v in s[1:]:
            hi, lo = unpack(v[: n * mta])
            cols += [hi, lo]
        tier_a = jnp.stack(cols, axis=-1).reshape(n, mta, n_live).sum(axis=1)
        pcols = []
        for v in s[1:]:
            hi, lo = unpack(v[n * mta :])
            pcols += [hi, lo]
        pv = jnp.stack(pcols, axis=-1)  # (pool, n_live)
        cs = jnp.cumsum(pv, axis=0)
        cs = jnp.concatenate([jnp.zeros((1, n_live), jnp.float32), cs], 0)
        pool_sum = cs[pend] - cs[pstart]
        return tier_a + pool_sum

    timeit(new_reduce, d, label="NEW slot-space reduce (sort+reshape+pool)")

    # Sub-stages
    def sort_only(d):
        zeros_tail = jnp.zeros((slot_dropped.shape[0],), jnp.int32)
        keys = jnp.concatenate([slot_kept, slot_dropped])
        ops = (keys,) + tuple(
            jnp.concatenate([pack(d[2 * i], d[2 * i + 1]), zeros_tail])
            for i in range(5)
        )
        return jax.lax.sort(ops, num_keys=1)[0]

    timeit(sort_only, d, label="new/sort only 2.56M x 6 ops")

    # Variant: per-op fused epilogue — never materialize (2M, 10); process
    # each packed operand independently so unpack fuses into the reduce read.
    def new_reduce_fused(d):
        zeros_tail = jnp.zeros((slot_dropped.shape[0],), jnp.int32)
        keys = jnp.concatenate([slot_kept, slot_dropped])
        ops = (keys,) + tuple(
            jnp.concatenate([pack(d[2 * i], d[2 * i + 1]), zeros_tail])
            for i in range(5)
        )
        s = jax.lax.sort(ops, num_keys=1)
        outs = []
        for v in s[1:]:
            a = v[: n * mta].reshape(n, mta)
            hi, lo = unpack(a)
            # pool: runs are [pstart, pend) with KNOWN boundaries — 3
            # suffix-doubling passes (need <= 8) + one gather at pstart.
            ph, pl = unpack(v[n * mta :])
            pv = jnp.stack([ph, pl], axis=-1)  # (pool, 2)
            step = 1
            while step < 8:
                pv = jnp.concatenate(
                    [pv[:-step] + pv[step:], pv[pool - step :]], axis=0
                )
                step *= 2
            # (runs shorter than 8 pull in neighbors' rows — in the real
            # kernel a segment mask guards this; cost model only here)
            first = pv[jnp.minimum(pstart, pool - 1)]
            outs.append(hi.sum(1) + first[:, 0])
            outs.append(lo.sum(1) + first[:, 1])
        return jnp.stack(outs, axis=-1)

    timeit(new_reduce_fused, d, label="NEW fused per-op epilogue")

    # Variant: plain f32 payloads (11-op sort), no pack/unpack anywhere.
    def new_reduce_f32(d):
        zt = jnp.zeros((slot_dropped.shape[0],), jnp.float32)
        keys = jnp.concatenate([slot_kept, slot_dropped])
        ops = (keys,) + tuple(
            jnp.concatenate([d[i], zt]) for i in range(n_live)
        )
        s = jax.lax.sort(ops, num_keys=1)
        outs = []
        pools = []
        for v in s[1:]:
            outs.append(v[: n * mta].reshape(n, mta).sum(1))
            pools.append(v[n * mta :])
        pv = jnp.stack(pools, axis=-1)  # (pool, 10)
        step = 1
        while step < 8:
            pv = jnp.concatenate(
                [pv[:-step] + pv[step:], pv[pool - step :]], axis=0
            )
            step *= 2
        first = pv[jnp.minimum(pstart, pool - 1)]
        return jnp.stack(outs, axis=-1) + first

    timeit(new_reduce_f32, d, label="NEW f32 11-op sort, fused epilogue")


if __name__ == "__main__":
    main()
