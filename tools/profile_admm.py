"""Stage timing for the ADMM bench path: chained step vs consensus vs staging."""
import sys, time
sys.path.insert(0, ".")
import numpy as np

def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import bench
    from bench import bench_scene, _bench_cameras, N_GAUSSIANS, WIDTH, HEIGHT

    # Reuse bench_admm's construction by copy
    import jax.numpy as jnp
    from jax.sharding import Mesh
    from dogs_tpu.data.blocks import BlockPartition
    from dogs_tpu.fields.model import GaussianModelState
    from dogs_tpu.parallel.admm import AdmmBlockState, AdmmConfig
    from dogs_tpu.parallel.master import MasterTrainer
    from dogs_tpu.raster.tiled import RasterConfig
    from dogs_tpu.train.trainer import TrainerConfig, train_state_from_model

    n = N_GAUSSIANS
    params = bench_scene(n)
    cams = _bench_cameras(8)
    rng = np.random.RandomState(1)
    gts = [rng.rand(HEIGHT, WIDTH, 3).astype(np.float32) for _ in cams]
    mesh = Mesh(np.asarray(jax.devices()[:1]), ("block",))
    big = 1e8
    partition = BlockPartition(
        num_blocks=1, transform=np.eye(4),
        camera_labels=np.zeros(len(cams), np.int32),
        bounds=np.array([[[-big, -big], [big, big]]]),
        bounds_expanded=np.array([[[-big, -big], [big, big]]]),
        point_masks=[],
    )
    cfg = TrainerConfig(max_iterations=30000)
    raster_cfg = RasterConfig(
        max_tiles_per_gaussian=12, bin_capacity=1_400_000, use_pallas=True,
        base_tiles=4, overflow_capacity=n,
    )
    admm_cfg = AdmmConfig(consensus_interval=20, chain_steps=10)
    master = MasterTrainer(
        mesh, partition,
        [np.asarray(params.xyz[:1024])], [np.full((1024, 3), 0.5, np.float32)],
        [cams], [gts], cfg, raster_cfg, admm_cfg, spatial_lr_scale=5.0,
    )
    capacity = params.capacity
    model = GaussianModelState(
        params=params, alive=jnp.ones((capacity,), bool),
        grad_accum=jnp.zeros((capacity,)), denom=jnp.zeros((capacity,)),
        max_radii2d=jnp.zeros((capacity,)),
    )
    ts = train_state_from_model(model, n_images=len(cams), cfg=cfg)
    ex = lambda t: jax.tree.map(lambda a: a[None], t)
    master.state = AdmmBlockState(
        train=ex(ts), u=ex(jax.tree.map(jnp.zeros_like, params)),
        slot_map=jnp.arange(capacity, dtype=jnp.int32)[None],
        z_local=ex(jax.tree.map(lambda a: a.copy(), params)),
    )
    master.n_global = capacity
    master.admm_enabled = True
    master.rho = admm_cfg.initial_rho(capacity)
    master._build_steps()

    # stage chunk timing
    t0 = time.perf_counter(); chunk = master._stage_chunk(10, 1); t1 = time.perf_counter()
    print(f"stage_chunk(10): {(t1-t0)*1e3:.1f} ms (pool={master._gt_pool is not None})")

    step_fn = master._get_train_step(3, from_pool=master._gt_pool is not None)
    camera, gt = chunk
    # warm
    t0 = time.perf_counter()
    master.state, m = step_fn(master.state, camera, gt, master.rho)
    float(m["loss"]); t1 = time.perf_counter()
    print(f"chained step k=10 (compile+run): {(t1-t0):.1f} s")
    for rep in range(3):
        camera, gt = master._stage_chunk(10, 1)
        t0 = time.perf_counter()
        master.state, m = step_fn(master.state, camera, gt, master.rho)
        float(m["loss"]); t1 = time.perf_counter()
        print(f"chained step k=10: {(t1-t0)*1e3:.1f} ms -> {10/(t1-t0):.2f} it/s")
    # consensus
    t0 = time.perf_counter()
    master.state, z, counts, primal, dual = master.consensus_step(master.state, master.rho)
    float(primal.xyz); t1 = time.perf_counter()
    print(f"consensus (compile+run): {(t1-t0):.1f} s")
    for rep in range(2):
        t0 = time.perf_counter()
        master.state, z, counts, primal, dual = master.consensus_step(master.state, master.rho)
        float(primal.xyz); t1 = time.perf_counter()
        print(f"consensus: {(t1-t0)*1e3:.1f} ms")

if __name__ == "__main__":
    main()
