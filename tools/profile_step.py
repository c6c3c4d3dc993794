"""Per-stage device timing of the FULL bench train step (chained in-jit).

Every measurement chains the op `reps` times inside one jit with a tiny data
dependence (axon block_until_ready is a no-op; only value fetches sync), so
host/tunnel dispatch overhead amortizes away. Also measures the host-loop
step (the bench's own protocol) to expose per-dispatch overhead.

Usage: python tools/profile_step.py [n_gaussians]
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def chain(step_fn, init, reps, label):
    import jax

    f = jax.jit(lambda c: jax.lax.fori_loop(0, reps, lambda i, cc: step_fn(cc), c))
    out = f(init)
    s = jax.tree.leaves(out)[0]
    float(s.sum() if hasattr(s, "ndim") and s.ndim else s)
    t0 = time.perf_counter()
    out = f(init)
    s = jax.tree.leaves(out)[0]
    float(s.sum() if hasattr(s, "ndim") and s.ndim else s)
    dt = (time.perf_counter() - t0) / reps
    print(f"{label:34s} {dt*1e3:8.2f} ms")
    return dt


def main():
    import jax

    # Persistent compile cache: stage compiles dominate wall-clock through
    # the remote-TPU tunnel; cached executables make reruns near-instant.
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from bench import BASELINE_ITERS_PER_SEC, N_GAUSSIANS, WIDTH, HEIGHT, bench_scene
    from dogs_tpu.core.camera import make_camera
    from dogs_tpu.fields.model import GaussianModelState
    from dogs_tpu.raster.binning import build_tile_bins
    from dogs_tpu.raster.projection import project_gaussians
    from dogs_tpu.raster.tiled import (
        ENT_WIDTH,
        TRASH_ROWS,
        RasterConfig,
        render_tiled,
    )
    from dogs_tpu.train.trainer import (
        TrainerConfig,
        make_train_step,
        train_state_from_model,
    )

    n = int(sys.argv[1]) if len(sys.argv) > 1 else N_GAUSSIANS
    w, h = WIDTH, HEIGHT
    params = bench_scene(n)
    cam = make_camera(
        R=np.eye(3), t=np.zeros(3), fx=1000.0, fy=1000.0,
        cx=w / 2, cy=h / 2, width=w, height=h,
    )
    rng = np.random.RandomState(1)
    gt = jnp.asarray(rng.rand(h, w, 3), jnp.float32)
    cfg = RasterConfig(
        max_tiles_per_gaussian=12, bin_capacity=1_450_000, use_pallas=True,
        base_tiles=4, overflow_capacity=n,
    )
    ts_grid = cfg.tile_size
    n_tiles = (-(-h // ts_grid)) * (-(-w // ts_grid))

    # ---- stage timings -----------------------------------------------------
    def mk(step):
        return step, jnp.float32(0.0)

    def s_proj(c):
        p = params.replace(xyz=params.xyz + c * 1e-20)
        pr = project_gaussians(p, cam, active_sh_degree=3)
        return jnp.sum(pr.means2d) * 0.0 + c + 1.0

    chain(s_proj, jnp.float32(0), 20, "projection")

    proj = jax.jit(lambda p: project_gaussians(p, cam, active_sh_degree=3))(params)

    bin_kw = dict(
        tile_size=cfg.tile_size,
        max_tiles_per_gaussian=cfg.max_tiles_per_gaussian,
        bin_capacity=cfg.bin_capacity,
        base_tiles=cfg.base_tiles,
        overflow_capacity=cfg.overflow_capacity,
    )

    def s_bins(c):
        pr = proj.replace(depth=proj.depth + c * 1e-20)
        b = build_tile_bins(pr, h, w, **bin_kw)
        return jnp.sum(b.sorted_idx) * 0.0 + c + 1.0

    chain(s_bins, jnp.float32(0), 20, "binning keys+sort+starts")

    bins = jax.jit(lambda pr: build_tile_bins(pr, h, w, **bin_kw))(proj)

    k = bins.sorted_idx.shape[0]
    ch = cfg.pallas_chunk
    k_al = -(-k // ch) * ch  # compact layout: just chunk-pad K
    filler = n + (jnp.arange(k_al - k, dtype=jnp.int32) % TRASH_ROWS)
    ai = jnp.concatenate([bins.sorted_idx, filler]) if k_al > k else bins.sorted_idx
    ast = bins.tile_starts
    ent = jnp.zeros((n + 4096, ENT_WIDTH), jnp.float32)

    def s_gather(c):
        e = ent + c * 1e-20
        at = e[ai].T
        return jnp.sum(at[:, :8]) * 0.0 + c + 1.0

    chain(s_gather, jnp.float32(0), 20, "entry gather+T (compact)")

    # ---- kernel-only stages (pallas fwd / bwd, K->N reduce) ----------------
    from dogs_tpu.raster import pallas_blend

    n_ty, n_tx = -(-h // ts_grid), -(-w // ts_grid)
    ent_ext = jnp.zeros((n + 4096, ENT_WIDTH), jnp.float32)
    rngf = np.random.RandomState(2)
    aligned_t0 = jnp.asarray(
        rngf.rand(ENT_WIDTH, int(ai.shape[0])), jnp.float32
    ) * 0.01

    def s_fwdk(c):
        at = aligned_t0 + c * 1e-20
        out = pallas_blend.blend_forward_pallas(
            at, ast, n_ty, n_tx, ts_grid, ch=cfg.pallas_chunk
        )
        return jnp.sum(out[0]) * 0.0 + c + 1.0

    chain(s_fwdk, jnp.float32(0), 10, "pallas fwd kernel only")

    cot0 = jnp.asarray(rngf.rand(n_tiles, 8, ts_grid * ts_grid), jnp.float32)

    def s_bwdk(c):
        at = aligned_t0 + c * 1e-20
        de = pallas_blend.blend_backward_pallas(
            at, ast, cot0, n_ty, n_tx, ts_grid, ch=cfg.pallas_chunk
        )
        return jnp.sum(de[0, :8]) * 0.0 + c + 1.0

    chain(s_bwdk, jnp.float32(0), 10, "pallas bwd kernel only")

    d_ent_t0 = jnp.asarray(
        rngf.rand(ENT_WIDTH, int(ai.shape[0])), jnp.float32
    )

    def s_kn(c):
        d = d_ent_t0 + c * 1e-20
        k_al = d.shape[1]
        # Mirrors the production bf16 path in tiled.py: pack grad pairs into
        # int32 payloads (6-operand sort), unpack, 1-D suffix doubling.
        from dogs_tpu.raster.pallas_reduce import (
            pack_bf16_pairs,
            unpack_bf16_pairs,
        )

        ops = (ai,) + tuple(
            pack_bf16_pairs(d[2 * i], d[2 * i + 1]) for i in range(5)
        )
        sorted_ops = jax.lax.sort(ops, num_keys=1)
        sg = sorted_ops[0]
        cols = []
        for v in sorted_ops[1:]:
            hi, lo = unpack_bf16_pairs(v)
            cols += [hi.astype(jnp.float32), lo.astype(jnp.float32)]
        step_ = 1
        while step_ < cfg.max_tiles_per_gaussian:
            same = sg[:-step_] == sg[step_:]
            cols = [
                jnp.concatenate(
                    [cc[: k_al - step_] + jnp.where(same, cc[step_:], 0.0),
                     cc[k_al - step_:]]
                )
                for cc in cols
            ]
            step_ *= 2
        vals = jnp.stack(cols, axis=-1)
        e2 = jnp.arange(k_al, dtype=jnp.int32)
        bpos = jnp.full((n + 4097,), k_al, jnp.int32).at[sg].min(e2)[: n + 4096]
        present = bpos < k_al
        d_rows = jnp.where(present[:, None], vals[jnp.minimum(bpos, k_al - 1)], 0.0)
        return jnp.sum(d_rows[0]) * 0.0 + c + 1.0

    chain(s_kn, jnp.float32(0), 10, "K->N sort reduce only")

    from dogs_tpu.raster.ssim import ssim as ssim_fn

    img0 = jnp.asarray(rngf.rand(h, w, 3), jnp.float32)

    def s_ssim(c):
        im = img0 + c * 1e-20
        g = jax.grad(lambda x: 1.0 - ssim_fn(x, gt))(im)
        return jnp.sum(g[0, 0]) * 0.0 + c + 1.0

    chain(s_ssim, jnp.float32(0), 20, "ssim fwd+bwd")

    def s_fwd(c):
        p = params.replace(xyz=params.xyz + c * 1e-20)
        out = render_tiled(p, cam, cfg, active_sh_degree=3)
        return jnp.sum(out.image) * 0.0 + c + 1.0

    t_fwd = chain(s_fwd, jnp.float32(0), 10, "full forward")

    def s_fwdbwd(c):
        def loss(p):
            out = render_tiled(p, cam, cfg, active_sh_degree=3)
            return jnp.mean(out.image) + jnp.mean(out.alpha)

        p = params.replace(xyz=params.xyz + c * 1e-20)
        g = jax.grad(loss)(p)
        return jnp.sum(g.xyz) * 0.0 + c + 1.0

    t_fb = chain(s_fwdbwd, jnp.float32(0), 10, "full forward+backward")
    print(f"{'  => backward alone':34s} {(t_fb-t_fwd)*1e3:8.2f} ms")

    # ---- full train step: in-jit chain vs host loop -------------------------
    capacity = params.capacity
    model = GaussianModelState(
        params=params,
        alive=jnp.ones((capacity,), bool),
        grad_accum=jnp.zeros((capacity,)),
        denom=jnp.zeros((capacity,)),
        max_radii2d=jnp.zeros((capacity,)),
    )
    tcfg = TrainerConfig(max_iterations=30000)
    ts0 = train_state_from_model(model, n_images=1, cfg=tcfg)
    step = make_train_step(
        tcfg, cfg, spatial_lr_scale=5.0, active_sh_degree=3,
        background=(0.0, 0.0, 0.0), jit=False,
    )

    def s_train(ts):
        ts2, _ = step(ts, cam, gt)
        return ts2

    reps = 10
    f = jax.jit(
        lambda ts: jax.lax.fori_loop(0, reps, lambda i, t: s_train(t), ts)
    )
    out = f(ts0)
    float(out.step)
    t0 = time.perf_counter()
    out = f(ts0)
    float(out.step)
    t_chain = (time.perf_counter() - t0) / reps
    print(f"{'train step (in-jit chain)':34s} {t_chain*1e3:8.2f} ms")

    jstep = jax.jit(step, donate_argnums=(0,))
    ts = ts0
    for _ in range(3):
        ts, m = jstep(ts, cam, gt)
    float(m["loss"])
    t0 = time.perf_counter()
    for _ in range(10):
        ts, m = jstep(ts, cam, gt)
    float(m["loss"])
    t_host = (time.perf_counter() - t0) / 10
    print(f"{'train step (host loop, = bench)':34s} {t_host*1e3:8.2f} ms")
    print(f"dispatch overhead per step: {(t_host-t_chain)*1e3:.2f} ms")
    print(f"host-loop it/s: {1/t_host:.2f} (vs baseline {BASELINE_ITERS_PER_SEC})")


if __name__ == "__main__":
    main()
