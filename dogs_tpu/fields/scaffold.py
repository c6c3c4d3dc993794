"""Scaffold-GS: anchor-based neural Gaussians, TPU-native.

Capability parity with the reference ScaffoldGS
(conerf/model/gaussian_fields/scaffold_gs.py:60-625 and
conerf/trainers/scaffold_gs_trainer.py:21-319): voxelized anchors carry a
32-d feature plus k learnable offsets; tiny MLP heads decode per-view
opacity / color / covariance for each anchor's k neural Gaussians, which are
rendered with precomputed colors through the SAME tiled rasterizer
(color_override path). The anchor MLPs are dense matmuls — exactly what the
MXU wants — so unlike the splat path nothing here needs a custom kernel.

Anchor dynamics (the reference's voxel-based densification):
  * per-step stats accumulate INSIDE the jitted step (no host sync):
    screen-space gradient norms per neural gaussian via the means2d-offset
    trick, opacity accumulation per anchor, counts
    (scaffold_gs.py:407-434 add_densification_stats);
  * anchor GROWING runs host-side every densification_interval: three
    hierarchy levels with shrinking voxel size, per-level random keep mask,
    voxel-grid dedup against existing anchors, features max-pooled from the
    contributing parents (scaffold_gs.py:435-528 anchor_growing);
  * anchor PRUNING by accumulated opacity (scaffold_gs.py:530-580
    prune_anchors).
  * `prefilter_voxel` (scaffold_gs_render.py:108-171) culls anchors outside
    the frustum before decode. TPU-native design: the cull is an analytic
    in-frustum MASK computed inside the step (projected anchor center +
    conservative radius from the offset extent) — masks keep shapes static
    for XLA where the reference compacts tensors; the rasterizer's alive
    mask does the actual skipping.

Capacity model: fixed-size anchor buffers with an alive mask, grown in
power-of-two buckets (same design as fields/model.py for the splat path) —
jit shapes stay stable, recompilation only happens on bucket growth.

Optional heads, both off by default as in the reference config
(config/scaffold_gs/mipnerf360.yaml): the multi-resolution feature bank
(scaffold_gs.py:100-107, 294-305) and the per-camera appearance embedding
(scaffold_gs.py:91-95, 308-324).
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
from dogs_tpu.core.gaussians import GaussianParams, round_up_capacity
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
    # multi-resolution feature bank MLP (scaffold_gs.py:100-107); empty dict
    # when use_feat_bank is off.
    mlp_feat_bank: dict = flax.struct.field(default_factory=dict)
    # per-camera appearance embedding (scaffold_gs.py:91-95); (0, 0) when off.
    app_embedding: jnp.ndarray = flax.struct.field(
        default_factory=lambda: jnp.zeros((0, 0), jnp.float32)
    )

    @property
    def num_anchors(self) -> int:
        return self.anchor_xyz.shape[0]

    @property
    def k_offsets(self) -> int:
        return self.offsets.shape[1]

    @property
    def appearance_dim(self) -> int:
        return self.app_embedding.shape[1]


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
    capacity: int | None = None,
    use_feat_bank: bool = False,
    appearance_dim: int = 0,
    num_cameras: int = 0,
) -> tuple[ScaffoldParams, jnp.ndarray]:
    """Returns (params at fixed capacity, anchor alive mask)."""
    rng = np.random.RandomState(seed)
    anchors = voxelize_points(np.asarray(points, np.float32), voxel_size)
    a = anchors.shape[0]
    cap = capacity or round_up_capacity(a, 256)
    assert cap >= a, (cap, a)

    def padded(x, fill=0.0):
        out = np.full((cap,) + x.shape[1:], fill, np.float32)
        out[:a] = x
        return jnp.asarray(out)

    params = ScaffoldParams(
        anchor_xyz=padded(anchors),
        anchor_feat=padded(rng.randn(a, FEAT_DIM).astype(np.float32) * 0.01),
        offsets=padded(
            rng.uniform(-0.5, 0.5, (a, k_offsets, 3)).astype(np.float32)
        ),
        log_scaling=jnp.tile(
            jnp.asarray(
                [np.log(voxel_size)] * 3 + [np.log(voxel_size * 0.5)] * 3,
                jnp.float32,
            )[None],
            (cap, 1),
        ),
        mlp_opacity=_mlp_init(rng, [FEAT_DIM + 3, HIDDEN, k_offsets]),
        mlp_color=_mlp_init(
            rng, [FEAT_DIM + 3 + appearance_dim, HIDDEN, 3 * k_offsets]
        ),
        mlp_cov=_mlp_init(rng, [FEAT_DIM + 3, HIDDEN, 7 * k_offsets]),
        mlp_feat_bank=(
            _mlp_init(rng, [4, FEAT_DIM, 3]) if use_feat_bank else {}
        ),
        app_embedding=(
            jnp.asarray(
                rng.randn(num_cameras, appearance_dim).astype(np.float32) * 0.01
            )
            if appearance_dim
            else jnp.zeros((0, 0), jnp.float32)
        ),
    )
    alive = jnp.arange(cap) < a
    return params, alive


def anchor_frustum_mask(
    sp: ScaffoldParams, camera: Camera, margin_scale: float = 3.0
) -> jnp.ndarray:
    """TPU-native `prefilter_voxel` (scaffold_gs_render.py:108-171): an
    analytic in-frustum test for every anchor — camera-space depth > 0 and
    the projected center within the image expanded by a conservative pixel
    radius derived from the anchor's offset extent. The reference runs a
    full CUDA projection pass and compacts; here the result stays a MASK so
    jit shapes are static, and the rasterizer's alive mask skips the work.
    """
    p_cam = (
        jnp.matmul(sp.anchor_xyz, camera.R.T, precision=jax.lax.Precision.HIGHEST)
        + camera.t
    )
    z = p_cam[:, 2]
    r_world = margin_scale * jnp.max(jnp.exp(sp.log_scaling[:, 0:3]), axis=-1)
    safe_z = jnp.maximum(z, 1e-6)
    u = camera.fx * p_cam[:, 0] / safe_z + camera.cx
    v = camera.fy * p_cam[:, 1] / safe_z + camera.cy
    r_pix = camera.fx * r_world / safe_z
    return (
        (z > 0.01)
        & (u > -r_pix)
        & (u < camera.width + r_pix)
        & (v > -r_pix)
        & (v < camera.height + r_pix)
    )


def generate_neural_gaussians(
    sp: ScaffoldParams,
    camera: Camera,
    alive: jnp.ndarray | None = None,
    visible_mask: jnp.ndarray | None = None,
    with_aux: bool = False,
):
    """Per-view decode (scaffold_gs.py:271-348 generate_neural_gaussians).

    Returns (gaussians with capacity A*K, colors (A*K, 3), alive mask)
    [+ aux dict when with_aux]. Opacity head is tanh; neural gaussians with
    opacity <= 0 are masked out exactly like the reference's
    positive-opacity mask; dead/culled anchors mask all their K gaussians.
    """
    a, k = sp.num_anchors, sp.k_offsets
    view = sp.anchor_xyz - camera.camera_center
    dist = jnp.maximum(jnp.linalg.norm(view, axis=-1, keepdims=True), 1e-12)
    view_dir = view / dist

    feats = sp.anchor_feat
    if sp.mlp_feat_bank:
        # Multi-resolution mixing (scaffold_gs.py:294-305): stride-4 and
        # stride-2 channel subsets tiled back to full width, blended by a
        # softmax over 3 view-conditioned weights.
        bank_w = jax.nn.softmax(
            _mlp_apply(sp.mlp_feat_bank, jnp.concatenate([view_dir, dist], -1)),
            axis=-1,
        )  # (A, 3)
        c = feats.shape[1]
        f4 = jnp.tile(feats[:, :: 4], (1, 4))[:, :c]
        f2 = jnp.tile(feats[:, :: 2], (1, 2))[:, :c]
        feats = (
            f4 * bank_w[:, 0:1] + f2 * bank_w[:, 1:2] + feats * bank_w[:, 2:3]
        )

    feat = jnp.concatenate([feats, view_dir], axis=-1)  # (A, F+3)

    opacity = jnp.tanh(_mlp_apply(sp.mlp_opacity, feat))  # (A, K)
    color_in = feat
    if sp.appearance_dim:
        app = sp.app_embedding[camera.image_index]  # (app_dim,)
        color_in = jnp.concatenate(
            [feat, jnp.broadcast_to(app, (a, sp.appearance_dim))], axis=-1
        )
    color = jax.nn.sigmoid(_mlp_apply(sp.mlp_color, color_in).reshape(a, k, 3))
    cov = _mlp_apply(sp.mlp_cov, feat).reshape(a, k, 7)

    offset_extent = jnp.exp(sp.log_scaling[:, None, 0:3])
    base_scale = jnp.exp(sp.log_scaling[:, None, 3:6])
    xyz = sp.anchor_xyz[:, None, :] + sp.offsets * offset_extent  # (A, K, 3)
    scale = base_scale * jax.nn.sigmoid(cov[..., 0:3]) * 2.0
    quat = cov[..., 3:7]

    anchor_ok = jnp.ones((a,), bool)
    if alive is not None:
        anchor_ok &= alive
    if visible_mask is not None:
        anchor_ok &= visible_mask
    neural_alive = ((opacity > 0.0) & anchor_ok[:, None]).reshape(-1)
    op = jnp.clip(opacity.reshape(-1, 1), 1e-4, 1.0 - 1e-4)
    params = GaussianParams(
        xyz=xyz.reshape(-1, 3),
        feat_dc=jnp.zeros((a * k, 1, 3), jnp.float32),
        feat_rest=jnp.zeros((a * k, 0, 3), jnp.float32),
        log_scale=jnp.log(jnp.maximum(scale.reshape(-1, 3), 1e-8)),
        quat=quat.reshape(-1, 4),
        logit_opacity=jnp.log(op / (1.0 - op)),
    )
    colors = color.reshape(-1, 3)
    if with_aux:
        aux = {
            "neural_opacity": opacity,  # (A, K), pre-mask tanh output
            "anchor_ok": anchor_ok,  # (A,)
            "scale": scale,  # (A, K, 3)
        }
        return params, colors, neural_alive, aux
    return params, colors, neural_alive


def render_scaffold(
    sp: ScaffoldParams,
    camera: Camera,
    raster_cfg: RasterConfig,
    background: jnp.ndarray | None = None,
    alive: jnp.ndarray | None = None,
    prefilter: bool = True,
):
    """conerf/render/scaffold_gs_render.py:17-105 equivalent: frustum-cull
    anchors, decode, rasterize with precomputed colors."""
    visible = anchor_frustum_mask(sp, camera) if prefilter else None
    gauss, colors, neural_alive = generate_neural_gaussians(
        sp, camera, alive=alive, visible_mask=visible
    )
    return render_tiled(
        gauss,
        camera,
        raster_cfg,
        background=background,
        alive=neural_alive,
        active_sh_degree=0,
        color_override=colors,
    )


@dataclasses.dataclass(frozen=True)
class ScaffoldConfig:
    max_iterations: int = 30000
    voxel_size: float = 0.05
    k_offsets: int = 10
    lambda_dssim: float = 0.2
    lambda_scale: float = 0.01
    # per-group LRs (reference config optimizer.lr.* for scaffold)
    anchor_lr_init: float = 1.6e-4
    anchor_lr_final: float = 1.6e-6
    feat_lr: float = 4e-3
    offset_lr_init: float = 1e-2
    offset_lr_final: float = 1e-4
    scaling_lr: float = 7e-3
    mlp_lr_init: float = 2e-3
    mlp_lr_final: float = 2e-5
    app_lr: float = 5e-2
    # anchor dynamics (reference geometry.* block)
    update_depth: int = 3
    update_init_factor: int = 16
    update_hierarchy_factor: int = 4
    stat_start_iter: int = 500
    densify_start_iter: int = 1500
    densify_end_iter: int = 15000
    densification_interval: int = 100
    densify_grad_threshold: float = 2e-4
    check_interval: int = 100
    success_threshold: float = 0.8
    min_opacity: float = 0.005
    prune_anchors: bool = True
    # optional heads
    use_feat_bank: bool = False
    appearance_dim: int = 0


@flax.struct.dataclass
class ScaffoldTrainState:
    params: ScaffoldParams
    mu: ScaffoldParams
    nu: ScaffoldParams
    step: jnp.ndarray
    # anchor-capacity buffers (fixed shape, alive-masked)
    alive: jnp.ndarray = flax.struct.field(
        default_factory=lambda: jnp.zeros((0,), bool)
    )
    opacity_accum: jnp.ndarray = flax.struct.field(
        default_factory=lambda: jnp.zeros((0,), jnp.float32)
    )
    anchor_denom: jnp.ndarray = flax.struct.field(
        default_factory=lambda: jnp.zeros((0,), jnp.float32)
    )
    offset_grad_accum: jnp.ndarray = flax.struct.field(
        default_factory=lambda: jnp.zeros((0, 1), jnp.float32)
    )
    offset_denom: jnp.ndarray = flax.struct.field(
        default_factory=lambda: jnp.zeros((0, 1), jnp.float32)
    )

    @property
    def num_alive(self) -> jnp.ndarray:
        return jnp.sum(self.alive.astype(jnp.int32))


def grow_and_prune_anchors(
    state: ScaffoldTrainState,
    cfg: ScaffoldConfig,
    rng: np.random.RandomState,
    do_prune: bool,
) -> tuple[ScaffoldTrainState, dict]:
    """Host-side anchor dynamics, run every densification_interval
    (scaffold_gs.py:435-580 anchor_growing + prune_anchors, cadence from
    scaffold_gs_trainer.py:296-312).

    Growing: for each of update_depth hierarchy levels i, neural gaussians
    whose averaged screen-grad exceeds threshold*(f/2)^i (and survive a
    1 - 0.5^(i+1) random keep) become anchor candidates; candidate positions
    voxelize at cur_size = voxel_size * init_factor / hier_factor^i, dedup
    against the existing anchor grid, and new anchors inherit the max
    feature of their contributing parents. Pruning: anchors whose
    accumulated opacity stays below min_opacity * denom over a full check
    window die. Fixed-capacity: new anchors fill dead slots first; the
    buffer grows a power-of-two bucket when they run out.
    """
    k = state.params.k_offsets
    alive = np.array(state.alive)
    cap = alive.shape[0]
    anchor_xyz = np.array(state.params.anchor_xyz)
    anchor_feat = np.array(state.params.anchor_feat)
    offsets = np.array(state.params.offsets)
    log_scaling = np.array(state.params.log_scaling)
    grad_accum = np.array(state.offset_grad_accum)  # (cap, K)
    denom = np.array(state.offset_denom)  # (cap, K)
    grads = np.where(denom > 0, grad_accum / np.maximum(denom, 1.0), 0.0)
    offset_ok = (
        denom > cfg.check_interval * cfg.success_threshold * 0.5
    ) & alive[:, None]

    new_xyz, new_feat, new_scaling = [], [], []
    for i in range(cfg.update_depth):
        cur_threshold = cfg.densify_grad_threshold * (
            (cfg.update_hierarchy_factor // 2) ** i
        )
        candidate = (grads >= cur_threshold) & offset_ok
        candidate &= rng.rand(*candidate.shape) > 0.5 ** (i + 1)
        if not candidate.any():
            continue
        size_factor = max(
            cfg.update_init_factor // (cfg.update_hierarchy_factor**i), 1
        )
        cur_size = cfg.voxel_size * size_factor
        # candidate neural-gaussian world positions
        all_xyz = (
            anchor_xyz[:, None, :]
            + offsets * np.exp(log_scaling[:, None, 0:3])
        )
        sel = all_xyz[candidate]  # (M, 3)
        sel_grid = np.round(sel / cur_size).astype(np.int64)
        uniq_grid, inverse = np.unique(sel_grid, axis=0, return_inverse=True)
        # dedup against the EXISTING (alive) anchor grid at this level
        exist_grid = np.round(anchor_xyz[alive] / cur_size).astype(np.int64)
        exist_set = set(map(tuple, exist_grid))
        fresh = np.array(
            [tuple(g) not in exist_set for g in uniq_grid], bool
        )
        if not fresh.any():
            continue
        # feature: max over contributing parents per unique cell
        # (reference scatter_max, scaffold_gs.py:504-507)
        parent_feat = np.repeat(anchor_feat, k, axis=0).reshape(cap, k, -1)[
            candidate
        ]  # (M, F)
        pooled = np.full(
            (uniq_grid.shape[0], parent_feat.shape[1]), -np.inf, np.float32
        )
        np.maximum.at(pooled, inverse, parent_feat)
        new_xyz.append((uniq_grid[fresh] * cur_size).astype(np.float32))
        new_feat.append(pooled[fresh])
        n_new = int(fresh.sum())
        new_scaling.append(
            np.full((n_new, 6), np.log(cur_size), np.float32)
        )

    stats = {"grown": 0, "pruned": 0}
    # ---- prune (scaffold_gs.py:530-580) ----------------------------------
    opacity_accum = np.array(state.opacity_accum)
    anchor_denom = np.array(state.anchor_denom)
    if do_prune:
        checked = anchor_denom > cfg.check_interval * cfg.success_threshold
        prune = (
            (opacity_accum < cfg.min_opacity * anchor_denom) & checked & alive
        )
        alive = alive & ~prune
        stats["pruned"] = int(prune.sum())
        # reset the windows of anchors that completed a check interval
        opacity_accum = np.where(checked, 0.0, opacity_accum)
        anchor_denom = np.where(checked, 0.0, anchor_denom)

    grown = int(sum(x.shape[0] for x in new_xyz)) if new_xyz else 0
    stats["grown"] = grown
    if grown == 0 and stats["pruned"] == 0:
        return state, stats

    mu, nu = state.mu, state.nu
    if grown:
        gx = np.concatenate(new_xyz, 0)
        gf = np.concatenate(new_feat, 0)
        gs = np.concatenate(new_scaling, 0)
        free = np.flatnonzero(~alive)
        if len(free) < grown:
            new_cap = round_up_capacity(cap + grown - len(free), 256)
            pad = new_cap - cap

            def extend(a):
                return np.concatenate(
                    [a, np.zeros((pad,) + a.shape[1:], a.dtype)], axis=0
                )

            anchor_xyz = extend(anchor_xyz)
            anchor_feat = extend(anchor_feat)
            offsets = extend(offsets)
            log_scaling = extend(log_scaling)
            alive = extend(alive)
            grad_accum = extend(grad_accum)
            denom = extend(denom)
            opacity_accum = extend(opacity_accum)
            anchor_denom = extend(anchor_denom)

            def extend_tree(tree):
                def f(leaf, ref):
                    if leaf.ndim and leaf.shape[0] == cap:
                        z = jnp.zeros((pad,) + leaf.shape[1:], leaf.dtype)
                        return jnp.concatenate([leaf, z], axis=0)
                    return leaf

                return ScaffoldParams(
                    anchor_xyz=f(tree.anchor_xyz, None),
                    anchor_feat=f(tree.anchor_feat, None),
                    offsets=f(tree.offsets, None),
                    log_scaling=f(tree.log_scaling, None),
                    mlp_opacity=tree.mlp_opacity,
                    mlp_color=tree.mlp_color,
                    mlp_cov=tree.mlp_cov,
                    mlp_feat_bank=tree.mlp_feat_bank,
                    app_embedding=tree.app_embedding,
                )

            mu = extend_tree(mu)
            nu = extend_tree(nu)
            cap = new_cap
            free = np.flatnonzero(~alive)
            logger.info("anchor capacity grown to %d", cap)
        slots = free[:grown]
        anchor_xyz[slots] = gx
        anchor_feat[slots] = gf
        log_scaling[slots] = gs
        offsets[slots] = 0.0  # reference: new offsets start at zero
        alive[slots] = True
        grad_accum[slots] = 0.0
        denom[slots] = 0.0
        opacity_accum[slots] = 0.0
        anchor_denom[slots] = 0.0
        # zero the Adam moments of the filled slots (the reference's
        # densification_postfix zero-extends the optimizer state)
        slot_mask = np.zeros((cap,), bool)
        slot_mask[slots] = True
        sm = jnp.asarray(slot_mask)

        def zero_slots(tree):
            def f(leaf):
                if leaf.ndim and leaf.shape[0] == cap:
                    m = sm.reshape((cap,) + (1,) * (leaf.ndim - 1))
                    return jnp.where(m, 0.0, leaf)
                return leaf

            return jax.tree.map(f, tree)

        mu = zero_slots(mu)
        nu = zero_slots(nu)

    params = state.params.replace(
        anchor_xyz=jnp.asarray(anchor_xyz),
        anchor_feat=jnp.asarray(anchor_feat),
        offsets=jnp.asarray(offsets),
        log_scaling=jnp.asarray(log_scaling),
    )
    new_state = ScaffoldTrainState(
        params=params,
        mu=mu,
        nu=nu,
        step=state.step,
        alive=jnp.asarray(alive),
        opacity_accum=jnp.asarray(opacity_accum),
        anchor_denom=jnp.asarray(anchor_denom),
        offset_grad_accum=jnp.asarray(grad_accum),
        offset_denom=jnp.asarray(denom),
    )
    return new_state, stats


class ScaffoldGSTrainer:
    """Anchor-based trainer (conerf/trainers/scaffold_gs_trainer.py:21-319):
    joint Adam over anchors/features/offsets/scalings/MLPs with per-group
    exponential LR schedules, in-jit densification stats, and host-side
    anchor growing/pruning on the reference cadence."""

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
        sp, alive = init_scaffold(
            points,
            self.cfg.voxel_size,
            self.cfg.k_offsets,
            seed,
            use_feat_bank=self.cfg.use_feat_bank,
            appearance_dim=self.cfg.appearance_dim,
            num_cameras=len(self.cameras),
        )
        cap = sp.num_anchors
        zeros = jax.tree.map(jnp.zeros_like, sp)
        self.state = ScaffoldTrainState(
            params=sp,
            mu=zeros,
            nu=jax.tree.map(jnp.zeros_like, sp),
            step=jnp.zeros((), jnp.int32),
            alive=alive,
            opacity_accum=jnp.zeros((cap,), jnp.float32),
            anchor_denom=jnp.zeros((cap,), jnp.float32),
            offset_grad_accum=jnp.zeros((cap, self.cfg.k_offsets), jnp.float32),
            offset_denom=jnp.zeros((cap, self.cfg.k_offsets), jnp.float32),
        )
        self._order: list[int] = []
        self.metrics_history: list[dict] = []
        self._step_fn = self._make_step()
        logger.info(
            "scaffold: %d anchors (cap %d) x %d offsets",
            int(self.state.num_alive), cap, sp.k_offsets,
        )

    def _lrs(self, sp: ScaffoldParams, step) -> ScaffoldParams:
        c = self.cfg
        anchor_lr = exponential_lr(
            c.anchor_lr_init, c.anchor_lr_final, c.max_iterations
        )(step)
        offset_lr = exponential_lr(
            c.offset_lr_init, c.offset_lr_final, c.max_iterations
        )(step)
        mlp_lr = exponential_lr(
            c.mlp_lr_init, c.mlp_lr_final, c.max_iterations
        )(step)
        mk = lambda tree: jax.tree.map(lambda _: mlp_lr, tree)
        return ScaffoldParams(
            anchor_xyz=anchor_lr,
            anchor_feat=jnp.float32(c.feat_lr),
            offsets=offset_lr,
            log_scaling=jnp.float32(c.scaling_lr),
            mlp_opacity=mk(sp.mlp_opacity),
            mlp_color=mk(sp.mlp_color),
            mlp_cov=mk(sp.mlp_cov),
            mlp_feat_bank=mk(sp.mlp_feat_bank),
            app_embedding=jnp.float32(c.app_lr),
        )

    def _make_step(self):
        cfg = self.cfg
        raster_cfg = self.raster_cfg

        def loss_fn(sp, offset2d, camera, gt, alive):
            visible = anchor_frustum_mask(sp, camera)
            gauss, colors, neural_alive, aux = generate_neural_gaussians(
                sp, camera, alive=alive, visible_mask=visible, with_aux=True
            )
            out = render_tiled(
                gauss,
                camera,
                raster_cfg,
                alive=neural_alive,
                active_sh_degree=0,
                color_override=colors,
                means2d_offset=offset2d,
            )
            img = jnp.clip(out.image, 0.0, 1.0)
            l1 = jnp.mean(jnp.abs(img - gt))
            s = ssim(img, gt)
            # scale regularizer over alive neural gaussians
            # (scaffold_gs_trainer.py:273-276 loss_scaling)
            vol = jnp.prod(aux["scale"].reshape(-1, 3), axis=-1)
            n_alive = jnp.maximum(jnp.sum(neural_alive.astype(jnp.float32)), 1.0)
            loss_scaling = jnp.sum(jnp.where(neural_alive, vol, 0.0)) / n_alive
            loss = (
                (1.0 - cfg.lambda_dssim) * l1
                + cfg.lambda_dssim * (1.0 - s)
                + cfg.lambda_scale * loss_scaling
            )
            mse = jnp.mean((img - gt) ** 2)
            raux = dict(
                psnr=-10.0 * jnp.log(mse) / jnp.log(10.0),
                radii=out.radii,
                neural_opacity=aux["neural_opacity"],
                visible=visible & alive,
                # Bin-saturation telemetry, same no-silent-caps contract as
                # the GS trainer (trainer.py _react_to_bin_saturation).
                bin_pool_truncated=out.bin_pool_truncated,
                bin_dropped=out.bin_dropped,
            )
            return loss, raux

        def step_fn(state: ScaffoldTrainState, camera, gt):
            cap = state.alive.shape[0]
            k = state.params.k_offsets
            offset2d = jnp.zeros((cap * k, 2), jnp.float32)
            (loss, aux), (grads, g_off) = jax.value_and_grad(
                loss_fn, argnums=(0, 1), has_aux=True
            )(state.params, offset2d, camera, gt, state.alive)
            lrs = self._lrs(state.params, state.step)
            upd = jax.tree.map(
                lambda p, g, m, v, lr: adam_step(p, g, m, v, lr, state.step),
                state.params, grads, state.mu, state.nu, lrs,
            )
            pick = lambda i: jax.tree.map(
                lambda t: t[i], upd, is_leaf=lambda x: isinstance(x, tuple)
            )
            # ---- densification stats (scaffold_gs.py:407-434), in-jit ----
            in_window = (state.step >= cfg.stat_start_iter) & (
                state.step < cfg.densify_end_iter
            )
            op = aux["neural_opacity"]  # (cap, K)
            vis_anchor = aux["visible"]  # (cap,)
            sel = (op > 0.0) & vis_anchor[:, None]
            upd_filter = (aux["radii"].reshape(cap, k) > 0.0) & sel
            # screen-grad norm in pixels (update_densify_stats convention)
            gn = jnp.linalg.norm(
                g_off.reshape(cap, k, 2)
                * jnp.asarray(
                    [0.5 * camera.width, 0.5 * camera.height], jnp.float32
                ),
                axis=-1,
            )
            w = in_window.astype(jnp.float32)
            new_state = ScaffoldTrainState(
                params=pick(0),
                mu=pick(1),
                nu=pick(2),
                step=state.step + 1,
                alive=state.alive,
                opacity_accum=state.opacity_accum
                + w * jnp.where(
                    vis_anchor, jnp.sum(jnp.maximum(op, 0.0), axis=1), 0.0
                ),
                anchor_denom=state.anchor_denom
                + w * vis_anchor.astype(jnp.float32),
                offset_grad_accum=state.offset_grad_accum
                + w * jnp.where(upd_filter, gn, 0.0),
                offset_denom=state.offset_denom
                + w * upd_filter.astype(jnp.float32),
            )
            return new_state, {
                "loss": loss,
                "psnr": aux["psnr"],
                "bin_pool_truncated": aux["bin_pool_truncated"],
                "bin_dropped": aux["bin_dropped"],
            }

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
        cfg = self.cfg
        if (
            cfg.densify_start_iter < step <= cfg.densify_end_iter
            and step % cfg.densification_interval == 0
        ):
            cap_before = self.state.alive.shape[0]
            self.state, stats = grow_and_prune_anchors(
                self.state, cfg, self.rng, do_prune=cfg.prune_anchors
            )
            if stats["grown"] or stats["pruned"]:
                metrics["anchors_grown"] = stats["grown"]
                metrics["anchors_pruned"] = stats["pruned"]
                logger.info(
                    "step %d anchors +%d -%d (alive %d)",
                    step, stats["grown"], stats["pruned"],
                    int(self.state.num_alive),
                )
            if self.state.alive.shape[0] != cap_before:
                self._step_fn = self._make_step()  # capacity bucket changed
        return metrics

    def train(self, num_iterations=None, log_every=100, **_):
        n = num_iterations or self.cfg.max_iterations
        start = int(self.state.step)
        t0 = time.time()
        metrics = {}
        for step in range(start + 1, start + n + 1):
            metrics = self.train_iteration(step)
            if log_every and step % log_every == 0:
                # One device transfer per window (sequential float() fetches
                # bill a tunnel round trip each).
                m = {k: float(v) for k, v in jax.device_get(metrics).items()}
                m["step"] = step
                m["iters_per_sec"] = (step - start) / (time.time() - t0)
                m["n_anchors"] = int(self.state.num_alive)
                self.metrics_history.append(m)
                logger.info(
                    "scaffold step %d loss %.4f psnr %.2f anchors %d",
                    step, m["loss"], m["psnr"], m["n_anchors"],
                )
        return metrics

    def validate(self) -> dict:
        if not self.val_cameras:
            return {}
        psnrs = []
        for cam, gt in zip(self.val_cameras, self.val_images):
            out = render_scaffold(
                self.state.params, cam, self.raster_cfg, alive=self.state.alive
            )
            img = np.clip(np.asarray(out.image), 0, 1)
            mse = float(np.mean((img - gt) ** 2))
            psnrs.append(-10.0 * np.log10(max(mse, 1e-10)))
        return {"val_psnr": float(np.mean(psnrs))}

    # checkpoint interface parity with GaussianSplatTrainer
    def save_checkpoint(self, manager) -> str:
        return manager.save(
            int(self.state.step), self.state, {"np_rng": self.rng.get_state()[1].tolist()}
        )

    def load_checkpoint(self, manager, path=None) -> int:
        probe = path or manager.latest_path()
        if probe is None:
            return 0
        data = np.load(probe)
        key = next(
            (k for k in data.files if k.endswith(".params/.anchor_xyz")), None
        )
        if key is not None and data[key].shape[0] != self.state.alive.shape[0]:
            # rebuild the state at the stored capacity before loading
            stored_cap = data[key].shape[0]
            self.state = _resize_scaffold_state(self.state, stored_cap)
            self._step_fn = self._make_step()
        state, extra = manager.load(self.state, probe)
        if state is not None:
            self.state = state
        if "np_rng" in extra:
            st = self.rng.get_state()
            self.rng.set_state(
                (st[0], np.asarray(extra["np_rng"], np.uint32), 0, 0, 0.0)
            )
        return int(self.state.step)


def _resize_scaffold_state(
    state: ScaffoldTrainState, new_cap: int
) -> ScaffoldTrainState:
    """Resize every anchor-capacity buffer (checkpoint resume across
    capacity buckets)."""
    cap = state.alive.shape[0]

    def fit(leaf):
        if not hasattr(leaf, "ndim") or leaf.ndim == 0 or leaf.shape[0] != cap:
            return leaf
        if new_cap <= cap:
            return leaf[:new_cap]
        pad = jnp.zeros((new_cap - cap,) + leaf.shape[1:], leaf.dtype)
        return jnp.concatenate([leaf, pad], axis=0)

    return jax.tree.map(fit, state)
