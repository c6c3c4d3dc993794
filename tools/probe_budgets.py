"""Probe the bench workload's true bin-budget needs as it evolves.

Replays the EXACT bench loop (same scene, cameras, warmup+iters, Adam
updates) with generous budgets (no dropping), and prints the running max of
`bin_valid` and the pool-exhaustion counter per step, so bin_capacity /
overflow_capacity headroom is set against the evolved workload rather than
the step-0 one (the cloud grows scales over the first ~50 steps and the
candidate count rises with it).

Usage: python tools/probe_budgets.py [steps]
"""

import sys

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import numpy as np

    import bench
    from dogs_tpu.fields.model import GaussianModelState
    from dogs_tpu.raster.tiled import RasterConfig
    from dogs_tpu.train.trainer import (
        TrainerConfig,
        make_train_step,
        train_state_from_model,
    )

    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    n = bench.N_GAUSSIANS
    params = bench.bench_scene(n)
    cams = bench._bench_cameras(8)
    rng = np.random.RandomState(1)
    gts = [
        jnp.asarray(rng.rand(bench.HEIGHT, bench.WIDTH, 3), jnp.float32)
        for _ in cams
    ]
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
        max_tiles_per_gaussian=12,
        bin_capacity=2_400_000,  # generous: nothing dropped
        use_pallas=True,
        base_tiles=4,
        overflow_capacity=900_000,
        pallas_chunk=128,
    )
    step = make_train_step(
        cfg, raster_cfg, spatial_lr_scale=5.0, active_sh_degree=3,
        background=(0.0, 0.0, 0.0),
    )
    peak_valid = 0
    peak_step = -1
    for i in range(steps):
        ts, metrics = step(ts, cams[i % 8], gts[i % 8])
        v = int(metrics["bin_valid"])
        pt = int(metrics["bin_pool_truncated"])
        if v > peak_valid:
            peak_valid, peak_step = v, i
        if i % 8 == 7 or pt:
            print(
                f"step {i:3d} cam {i % 8}: valid={v} pool_trunc={pt} "
                f"(peak {peak_valid} @ {peak_step})",
                flush=True,
            )
    print(f"PEAK bin_valid = {peak_valid} at step {peak_step}")


if __name__ == "__main__":
    main()
