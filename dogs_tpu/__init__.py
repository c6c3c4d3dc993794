"""dogs_tpu — a TPU-native 3D Gaussian Splatting framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of DOGS
("Distributed-Oriented Gaussian Splatting for Large-Scale 3D Reconstruction
Via Gaussian Consensus", NeurIPS 2024): single-device 3DGS training,
Scaffold-GS, LightGaussian pruning, VastGaussian appearance embeddings, the
COLMAP data pipeline with OBB block partitioning, and distributed ADMM
consensus training mapped onto a `jax.sharding.Mesh` with XLA collectives
instead of torch.distributed RPC.

Layers (bottom-up):
  core/     pure-jnp math pytrees: gaussians, cameras, SH, quaternions, KNN
  raster/   the differentiable tile rasterizer (XLA + Pallas) and SSIM
  fields/   model-level ops: densify/prune, appearance, Scaffold-GS, pruning
  data/     COLMAP parsing, datasets, block partitioning, image prefetch
  train/    optimizers, LR schedules, single-device trainer, checkpointing
  parallel/ block-parallel ADMM consensus over a device mesh
  eval/     PSNR/SSIM/LPIPS evaluator
  utils/    YAML config system, logging
"""

__version__ = "0.1.0"
