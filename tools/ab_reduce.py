"""A/B the full train step across reduce_dtype variants on the real chip.

Usage: python tools/ab_reduce.py [variants...]   (default: bf16 bf16k)
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def measure(spec: str):
    # spec: "<reduce_dtype>[:ch=<pallas_chunk>]"
    reduce_dtype, _, opt = spec.partition(":")
    pallas_chunk = 128
    if opt.startswith("ch="):
        pallas_chunk = int(opt[3:])
    import jax
    import jax.numpy as jnp

    from bench import N_GAUSSIANS, WIDTH, HEIGHT, bench_scene, _bench_cameras
    from dogs_tpu.fields.model import GaussianModelState
    from dogs_tpu.raster.tiled import RasterConfig
    from dogs_tpu.train.trainer import (
        TrainerConfig,
        make_train_step,
        train_state_from_model,
    )

    n = N_GAUSSIANS
    params = bench_scene(n)
    cams = _bench_cameras(8)
    rng = np.random.RandomState(1)
    gts = [jnp.asarray(rng.rand(HEIGHT, WIDTH, 3), jnp.float32) for _ in cams]
    capacity = params.capacity
    model = GaussianModelState(
        params=params,
        alive=jnp.ones((capacity,), bool),
        grad_accum=jnp.zeros((capacity,)),
        denom=jnp.zeros((capacity,)),
        max_radii2d=jnp.zeros((capacity,)),
    )
    cfg = TrainerConfig(max_iterations=30000)
    ts = train_state_from_model(model, n_images=len(cams), cfg=cfg)
    raster_cfg = RasterConfig(
        max_tiles_per_gaussian=12, bin_capacity=1_400_000, use_pallas=True,
        base_tiles=4, overflow_capacity=n, reduce_dtype=reduce_dtype,
        pallas_chunk=pallas_chunk,
    )
    step = make_train_step(
        cfg, raster_cfg, spatial_lr_scale=5.0, active_sh_degree=3,
        background=(0.0, 0.0, 0.0),
    )
    for i in range(16):
        ts, metrics = step(ts, cams[i % 8], gts[i % 8])
    float(metrics["loss"])
    t0 = time.perf_counter()
    iters = 48
    for i in range(iters):
        ts, metrics = step(ts, cams[i % 8], gts[i % 8])
    float(metrics["loss"])
    dt = time.perf_counter() - t0
    print(f"{spec:12s} {iters / dt:7.3f} it/s  ({dt / iters * 1e3:.2f} ms)",
          flush=True)


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    variants = sys.argv[1:] or ["bf16", "bf16k"]
    for v in variants:
        measure(v)


if __name__ == "__main__":
    main()
