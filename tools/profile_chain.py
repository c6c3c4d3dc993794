"""Accurate TPU stage timing: chain the op N times inside ONE jit so the
axon-tunnel round trip (~200ms) amortizes away. A tiny data dependence
between repetitions stops XLA from collapsing them."""

import sys
import time

import numpy as np


def chain_time(make_fn, reps=20, label=""):
    """make_fn() -> (step_fn, init_carry); step_fn(carry) -> carry (scalar-ish)."""
    import jax

    step_fn, init = make_fn()

    def chained(c):
        return jax.lax.fori_loop(0, reps, lambda i, cc: step_fn(cc), c)

    f = jax.jit(chained)
    out = f(init)  # compile + run
    r = float(jax.tree.leaves(out)[0].sum()) if hasattr(out, "sum") else None
    t0 = time.perf_counter()
    out = f(init)
    s = jax.tree.leaves(out)[0]
    float(s.sum() if s.ndim else s)
    dt = time.perf_counter() - t0
    print(f"{label}: {dt/reps*1e3:8.2f} ms/iter  ({reps} chained)")
    return dt / reps


def main():
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, ".")
    from bench import bench_scene
    from dogs_tpu.core.camera import make_camera
    from dogs_tpu.raster.binning import build_tile_bins
    from dogs_tpu.raster.projection import project_gaussians
    from dogs_tpu.raster.tiled import RasterConfig, render_tiled

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    w, h = 1152, 864
    params = bench_scene(n)
    cam = make_camera(
        R=np.eye(3), t=np.zeros(3), fx=1000.0, fy=1000.0,
        cx=w / 2, cy=h / 2, width=w, height=h,
    )
    cfg = RasterConfig(
        tile_batch=256, chunk=64, max_tiles_per_gaussian=16,
        bin_capacity=2_000_000,
    )

    def mk_proj():
        def step(c):
            p = params.replace(xyz=params.xyz + c * 1e-20)
            pr = project_gaussians(p, cam, active_sh_degree=3)
            return jnp.sum(pr.means2d) * 0.0 + c + 1.0

        return step, jnp.float32(0.0)

    chain_time(mk_proj, 20, "projection")

    proj = jax.jit(lambda p: project_gaussians(p, cam, active_sh_degree=3))(params)

    def mk_bins():
        def step(c):
            pr = proj.replace(depth=proj.depth + c * 1e-20)
            b = build_tile_bins(
                pr, h, w, tile_size=cfg.tile_size,
                max_tiles_per_gaussian=cfg.max_tiles_per_gaussian,
                bin_capacity=cfg.bin_capacity,
            )
            return jnp.sum(b.sorted_idx) * 0.0 + c + 1.0

        return step, jnp.float32(0.0)

    chain_time(mk_bins, 20, "binning+sort")

    def mk_fwd():
        def step(c):
            p = params.replace(xyz=params.xyz + c * 1e-20)
            out = render_tiled(p, cam, cfg, active_sh_degree=3)
            return jnp.sum(out.image) * 0.0 + c + 1.0

        return step, jnp.float32(0.0)

    chain_time(mk_fwd, 10, "full forward")

    def mk_bwd():
        def loss(p):
            out = render_tiled(p, cam, cfg, active_sh_degree=3)
            return jnp.mean(out.image) + jnp.mean(out.alpha)

        gf = jax.grad(loss)

        def step(c):
            p = params.replace(xyz=params.xyz + c * 1e-20)
            g = gf(p)
            return jnp.sum(g.xyz) * 0.0 + c + 1.0

        return step, jnp.float32(0.0)

    chain_time(mk_bwd, 10, "fwd+bwd")


if __name__ == "__main__":
    main()
