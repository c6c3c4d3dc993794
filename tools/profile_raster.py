"""Stage-by-stage rasterizer timing on the current backend.

Usage: python tools/profile_raster.py [n_gaussians] [width] [height]
Times projection, binning (sort), blend forward, full forward, and the
full train step independently to locate the bottleneck.
"""

import sys
import time

import numpy as np


def timeit(fn, *args, warmup=2, iters=10):
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

    sys.path.insert(0, ".")
    from bench import bench_scene
    from dogs_tpu.core.camera import make_camera
    from dogs_tpu.raster.binning import build_tile_bins
    from dogs_tpu.raster.projection import project_gaussians
    from dogs_tpu.raster.tiled import RasterConfig, render_tiled

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    w = int(sys.argv[2]) if len(sys.argv) > 2 else 1152
    h = int(sys.argv[3]) if len(sys.argv) > 3 else 864

    params = bench_scene(n)
    cam = make_camera(
        R=np.eye(3), t=np.zeros(3), fx=1000.0, fy=1000.0,
        cx=w / 2, cy=h / 2, width=w, height=h,
    )
    cfg = RasterConfig(tile_batch=256, chunk=64, max_tiles_per_gaussian=16, bin_capacity=2_000_000)

    proj_fn = jax.jit(lambda p: project_gaussians(p, cam, active_sh_degree=3))
    t_proj = timeit(lambda p: proj_fn(p).means2d, params)
    proj = proj_fn(params)
    print(f"projection: {t_proj*1e3:8.2f} ms")

    bins_fn = jax.jit(
        lambda pr: build_tile_bins(
            pr, h, w, tile_size=cfg.tile_size,
            max_tiles_per_gaussian=cfg.max_tiles_per_gaussian,
        )
    )
    t_bins = timeit(lambda pr: bins_fn(pr).sorted_idx, proj)
    bins = bins_fn(proj)
    print(f"binning+sort: {t_bins*1e3:8.2f} ms  (valid={int(bins.num_valid)}, trunc={int(bins.num_truncated)})")

    fwd_fn = jax.jit(lambda p: render_tiled(p, cam, cfg, active_sh_degree=3).image)
    t_fwd = timeit(fwd_fn, params)
    print(f"full forward: {t_fwd*1e3:8.2f} ms")

    def loss(p):
        out = render_tiled(p, cam, cfg, active_sh_degree=3)
        return jnp.mean(out.image) + jnp.mean(out.alpha)

    grad_fn = jax.jit(jax.grad(loss))
    t_bwd = timeit(lambda p: grad_fn(p).xyz, params)
    print(f"fwd+bwd: {t_bwd*1e3:8.2f} ms")

    counts = np.diff(np.asarray(bins.tile_starts))
    print(
        f"tiles: {counts.size}, splats/tile mean={counts.mean():.0f} "
        f"p50={np.percentile(counts,50):.0f} p99={np.percentile(counts,99):.0f} "
        f"max={counts.max()}"
    )


if __name__ == "__main__":
    main()
