"""Scaffold-GS: anchor-based neural Gaussians (minimal TPU-native core).

Capability parity (core) with the reference ScaffoldGS
(conerf/model/gaussian_fields/scaffold_gs.py:62-348 and
conerf/trainers/scaffold_gs_trainer.py:21-319): voxelized anchors carry a
32-d feature plus k learnable offsets; tiny MLP heads decode per-view
opacity / color / covariance for each anchor's k neural Gaussians, which are
rendered with precomputed colors through the SAME tiled rasterizer
(color_override path). The anchor MLPs are dense matmuls — exactly what the
MXU wants — so unlike the splat path nothing here needs a custom kernel.

Round-1 scope: anchor init from a voxelized point cloud, per-view neural
gaussian decode, and a trainer optimizing anchors + features + offsets +
MLPs. Anchor growing/pruning across hierarchy levels
(scaffold_gs.py:435-580) is round-2 work and noted in the trainer.
"""

from __future__ import annotations

import dataclasses
import logging
import time
from typing import Sequence

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from dogs_tpu.core.camera import Camera
from dogs_tpu.core.gaussians import GaussianParams
from dogs_tpu.raster.ssim import ssim
from dogs_tpu.raster.tiled import RasterConfig, render_tiled
from dogs_tpu.train.optim import adam_step, exponential_lr

logger = logging.getLogger(__name__)

FEAT_DIM = 32
HIDDEN = 64


@flax.struct.dataclass
class ScaffoldParams:
    """Anchors + per-anchor offsets + MLP heads (all optimizable)."""

    anchor_xyz: jnp.ndarray  # (A, 3)
    anchor_feat: jnp.ndarray  # (A, FEAT_DIM)
    offsets: jnp.ndarray  # (A, K, 3) in units of the offset extent
    log_scaling: jnp.ndarray  # (A, 6): [:3] offset extent, [3:] base scale
    mlp_opacity: dict
    mlp_color: dict
    mlp_cov: dict

    @property
    def num_anchors(self) -> int:
        return self.anchor_xyz.shape[0]

    @property
    def k_offsets(self) -> int:
        return self.offsets.shape[1]


def _mlp_init(rng, sizes):
    params = {}
    for i, (cin, cout) in enumerate(zip(sizes[:-1], sizes[1:])):
        params[f"w{i}"] = jnp.asarray(
            rng.randn(cin, cout).astype(np.float32) * np.sqrt(2.0 / cin)
        )
        params[f"b{i}"] = jnp.zeros((cout,), jnp.float32)
    return params


def _mlp_apply(p, x):
    n = len(p) // 2
    for i in range(n):
        x = jnp.matmul(x, p[f"w{i}"], precision=jax.lax.Precision.HIGHEST) + p[f"b{i}"]
        if i < n - 1:
            x = jax.nn.relu(x)
    return x


def voxelize_points(points: np.ndarray, voxel_size: float) -> np.ndarray:
    """Unique voxel centers of a point cloud (scaffold_gs.py anchor init)."""
    q = np.floor(points / voxel_size)
    uniq = np.unique(q, axis=0)
    return (uniq + 0.5) * voxel_size


def init_scaffold(
    points: np.ndarray,
    voxel_size: float = 0.05,
    k_offsets: int = 10,
    seed: int = 0,
) -> ScaffoldParams:
    rng = np.random.RandomState(seed)
    anchors = voxelize_points(np.asarray(points, np.float32), voxel_size)
    a = anchors.shape[0]
    return ScaffoldParams(
        anchor_xyz=jnp.asarray(anchors),
        anchor_feat=jnp.asarray(rng.randn(a, FEAT_DIM).astype(np.float32) * 0.01),
        offsets=jnp.asarray(
            rng.uniform(-0.5, 0.5, (a, k_offsets, 3)).astype(np.float32)
        ),
        log_scaling=jnp.tile(
            jnp.asarray(
                [np.log(voxel_size)] * 3 + [np.log(voxel_size * 0.5)] * 3,
                jnp.float32,
            )[None],
            (a, 1),
        ),
        mlp_opacity=_mlp_init(rng, [FEAT_DIM + 3, HIDDEN, k_offsets]),
        mlp_color=_mlp_init(rng, [FEAT_DIM + 3, HIDDEN, 3 * k_offsets]),
        mlp_cov=_mlp_init(rng, [FEAT_DIM + 3, HIDDEN, 7 * k_offsets]),
    )


def generate_neural_gaussians(
    sp: ScaffoldParams, camera: Camera
) -> tuple[GaussianParams, jnp.ndarray, jnp.ndarray]:
    """Per-view decode (scaffold_gs.py:271-348 generate_neural_gaussians).

    Returns (gaussians with capacity A*K, colors (A*K, 3), alive mask).
    Opacity head is tanh; neural gaussians with opacity <= 0 are masked out
    exactly like the reference's positive-opacity mask.
    """
    a, k = sp.num_anchors, sp.k_offsets
    view_dir = sp.anchor_xyz - camera.camera_center
    view_dir = view_dir / jnp.maximum(
        jnp.linalg.norm(view_dir, axis=-1, keepdims=True), 1e-12
    )
    feat = jnp.concatenate([sp.anchor_feat, view_dir], axis=-1)  # (A, F+3)

    opacity = jnp.tanh(_mlp_apply(sp.mlp_opacity, feat))  # (A, K)
    color = jax.nn.sigmoid(
        _mlp_apply(sp.mlp_color, feat).reshape(a, k, 3)
    )
    cov = _mlp_apply(sp.mlp_cov, feat).reshape(a, k, 7)

    offset_extent = jnp.exp(sp.log_scaling[:, None, 0:3])
    base_scale = jnp.exp(sp.log_scaling[:, None, 3:6])
    xyz = sp.anchor_xyz[:, None, :] + sp.offsets * offset_extent  # (A, K, 3)
    scale = base_scale * jax.nn.sigmoid(cov[..., 0:3]) * 2.0
    quat = cov[..., 3:7]

    alive = (opacity > 0.0).reshape(-1)
    op = jnp.clip(opacity.reshape(-1, 1), 1e-4, 1.0 - 1e-4)
    params = GaussianParams(
        xyz=xyz.reshape(-1, 3),
        feat_dc=jnp.zeros((a * k, 1, 3), jnp.float32),
        feat_rest=jnp.zeros((a * k, 0, 3), jnp.float32),
        log_scale=jnp.log(jnp.maximum(scale.reshape(-1, 3), 1e-8)),
        quat=quat.reshape(-1, 4),
        logit_opacity=jnp.log(op / (1.0 - op)),
    )
    return params, color.reshape(-1, 3), alive


def render_scaffold(
    sp: ScaffoldParams,
    camera: Camera,
    raster_cfg: RasterConfig,
    background: jnp.ndarray | None = None,
):
    """conerf/render/scaffold_gs_render.py:17-105 equivalent: decode then
    rasterize with precomputed colors."""
    gauss, colors, alive = generate_neural_gaussians(sp, camera)
    return render_tiled(
        gauss,
        camera,
        raster_cfg,
        background=background,
        alive=alive,
        active_sh_degree=0,
        color_override=colors,
    )


@dataclasses.dataclass(frozen=True)
class ScaffoldConfig:
    max_iterations: int = 30000
    voxel_size: float = 0.05
    k_offsets: int = 10
    lambda_dssim: float = 0.2
    anchor_lr_init: float = 1.6e-4
    anchor_lr_final: float = 1.6e-6
    feat_lr: float = 4e-3
    offset_lr: float = 4e-3
    scaling_lr: float = 7e-3
    mlp_lr: float = 2e-3


@flax.struct.dataclass
class ScaffoldTrainState:
    params: ScaffoldParams
    mu: ScaffoldParams
    nu: ScaffoldParams
    step: jnp.ndarray


class ScaffoldGSTrainer:
    """Anchor-based trainer (conerf/trainers/scaffold_gs_trainer.py:21-319).

    Round-1 scope: joint Adam over anchors/features/offsets/scalings/MLPs
    with per-group LRs and the exponential anchor-position schedule. Anchor
    growing/pruning stats (scaffold_gs_trainer.py:293-312) are round-2.
    """

    def __init__(
        self,
        cameras: Sequence[Camera],
        images: Sequence[np.ndarray],
        points: np.ndarray,
        colors: np.ndarray = None,
        cfg=None,
        raster_cfg: RasterConfig = RasterConfig(),
        val_cameras: Sequence[Camera] = (),
        val_images: Sequence[np.ndarray] = (),
        seed: int = 42,
        scaffold_cfg: ScaffoldConfig | None = None,
    ):
        del colors, cfg  # interface parity with GaussianSplatTrainer factory
        self.cameras = list(cameras)
        self.images = [np.asarray(im, np.float32) for im in images]
        self.val_cameras = list(val_cameras)
        self.val_images = [np.asarray(im, np.float32) for im in val_images]
        self.cfg = scaffold_cfg or ScaffoldConfig()
        self.raster_cfg = raster_cfg
        self.rng = np.random.RandomState(seed)
        sp = init_scaffold(
            points, self.cfg.voxel_size, self.cfg.k_offsets, seed
        )
        zeros = jax.tree.map(jnp.zeros_like, sp)
        self.state = ScaffoldTrainState(
            params=sp, mu=zeros, nu=jax.tree.map(jnp.zeros_like, sp),
            step=jnp.zeros((), jnp.int32),
        )
        self._order: list[int] = []
        self.metrics_history: list[dict] = []
        self._step_fn = self._make_step()
        logger.info("scaffold: %d anchors x %d offsets", sp.num_anchors, sp.k_offsets)

    def _lrs(self, sp: ScaffoldParams, step) -> ScaffoldParams:
        c = self.cfg
        anchor_lr = exponential_lr(
            c.anchor_lr_init, c.anchor_lr_final, c.max_iterations
        )(step)
        mlp = jax.tree.map(lambda _: jnp.float32(c.mlp_lr), sp.mlp_opacity)
        return ScaffoldParams(
            anchor_xyz=anchor_lr,
            anchor_feat=jnp.float32(c.feat_lr),
            offsets=jnp.float32(c.offset_lr),
            log_scaling=jnp.float32(c.scaling_lr),
            mlp_opacity=mlp,
            mlp_color=jax.tree.map(lambda _: jnp.float32(c.mlp_lr), sp.mlp_color),
            mlp_cov=jax.tree.map(lambda _: jnp.float32(c.mlp_lr), sp.mlp_cov),
        )

    def _make_step(self):
        cfg = self.cfg
        raster_cfg = self.raster_cfg

        def loss_fn(sp, camera, gt):
            out = render_scaffold(sp, camera, raster_cfg)
            img = jnp.clip(out.image, 0.0, 1.0)
            l1 = jnp.mean(jnp.abs(img - gt))
            s = ssim(img, gt)
            loss = (1.0 - cfg.lambda_dssim) * l1 + cfg.lambda_dssim * (1.0 - s)
            mse = jnp.mean((img - gt) ** 2)
            return loss, -10.0 * jnp.log(mse) / jnp.log(10.0)

        def step_fn(state: ScaffoldTrainState, camera, gt):
            (loss, psnr), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params, camera, gt
            )
            lrs = self._lrs(state.params, state.step)
            upd = jax.tree.map(
                lambda p, g, m, v, lr: adam_step(p, g, m, v, lr, state.step),
                state.params, grads, state.mu, state.nu, lrs,
            )
            pick = lambda i: jax.tree.map(
                lambda t: t[i], upd, is_leaf=lambda x: isinstance(x, tuple)
            )
            new = ScaffoldTrainState(
                params=pick(0), mu=pick(1), nu=pick(2), step=state.step + 1
            )
            return new, {"loss": loss, "psnr": psnr}

        return jax.jit(step_fn, donate_argnums=(0,))

    def _next_camera(self) -> int:
        if not self._order:
            self._order = list(self.rng.permutation(len(self.cameras)))
        return int(self._order.pop())

    def train_iteration(self, step: int) -> dict:
        idx = self._next_camera()
        self.state, metrics = self._step_fn(
            self.state, self.cameras[idx], jnp.asarray(self.images[idx])
        )
        return metrics

    def train(self, num_iterations=None, log_every=100, **_):
        n = num_iterations or self.cfg.max_iterations
        start = int(self.state.step)
        t0 = time.time()
        metrics = {}
        for step in range(start + 1, start + n + 1):
            metrics = self.train_iteration(step)
            if log_every and step % log_every == 0:
                m = {k: float(v) for k, v in metrics.items()}
                m["step"] = step
                m["iters_per_sec"] = (step - start) / (time.time() - t0)
                self.metrics_history.append(m)
                logger.info("scaffold step %d loss %.4f psnr %.2f", step, m["loss"], m["psnr"])
        return metrics

    def validate(self) -> dict:
        if not self.val_cameras:
            return {}
        psnrs = []
        for cam, gt in zip(self.val_cameras, self.val_images):
            out = render_scaffold(self.state.params, cam, self.raster_cfg)
            img = np.clip(np.asarray(out.image), 0, 1)
            mse = float(np.mean((img - gt) ** 2))
            psnrs.append(-10.0 * np.log10(max(mse, 1e-10)))
        return {"val_psnr": float(np.mean(psnrs))}

    # checkpoint interface parity with GaussianSplatTrainer
    def save_checkpoint(self, manager) -> str:
        return manager.save(int(self.state.step), self.state, {})

    def load_checkpoint(self, manager, path=None) -> int:
        state, _ = manager.load(self.state, path)
        if state is not None:
            self.state = state
        return int(self.state.step)
