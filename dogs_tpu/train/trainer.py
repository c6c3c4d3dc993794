"""Single-device 3DGS trainer: jitted functional step + host orchestration.

TPU-native re-design of the reference trainer stack
(conerf/trainers/trainer.py:27 BaseTrainer ->
conerf/trainers/implicit_recon_trainer.py:17 ->
conerf/trainers/gaussian_trainer.py:103-573 GaussianSplatTrainer). The torch
trainer mutates module state every iteration; here one pure `train_step` is
jit-compiled per (image-shape, SH-degree, capacity) bucket and everything
dynamic lives in an explicit `TrainState` pytree. Host-side code only:
picks cameras, runs the coarse-to-fine resolution schedule, grows Gaussian
capacity in power-of-two buckets, and triggers densify/prune/opacity-reset
at the reference cadences (gaussian_trainer.py:429-476).
"""

from __future__ import annotations

import dataclasses
import functools
import logging
import time
from collections import OrderedDict
from typing import Any, Callable, Sequence

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from dogs_tpu.core.camera import Camera
from dogs_tpu.core.gaussians import (
    GaussianParams,
    pad_to_capacity,
    round_up_capacity,
)
from dogs_tpu.fields.model import (
    GaussianModelState,
    densify_and_prune,
    init_from_points,
    required_slots,
    reset_opacity,
    update_densify_stats,
)
from dogs_tpu.raster.ssim import ssim
from dogs_tpu.raster.tiled import RasterConfig, render_tiled
from dogs_tpu.train import schedule
from dogs_tpu.train.optim import (
    SparseAdamState,
    adam_step,
    exponential_lr,
    init_sparse_adam,
    sparse_adam_step,
)

logger = logging.getLogger(__name__)

# Densify host events run OUTSIDE the train-step jit (they are rare and
# data-dependent), but must still be ONE dispatch each: eagerly they decay
# into dozens of op-by-op dispatches whose first-call compiles alone cost
# tens of seconds through a remote-TPU attachment (measured ~54 s per 100
# steps on the --quality bench at densification_interval=100). One compile
# per capacity bucket, one dispatch per event. The float hyperparameters
# trace as scalars (not static), so their values don't fragment the cache;
# the None-vs-value thresholds ARE python branches, hence static.
_required_slots_jit = jax.jit(required_slots)
_densify_and_prune_jit = jax.jit(
    densify_and_prune, static_argnames=("max_screen_size", "bbox_z_min")
)


@dataclasses.dataclass(frozen=True)
class TrainerConfig:
    """Static hyperparameters, defaults = reference mipnerf360.yaml."""

    max_iterations: int = 30000
    # loss (config/gaussian_splatting/*.yaml loss block)
    lambda_dssim: float = 0.2
    lambda_scale: float = 0.01
    # optimizer.lr block
    position_lr_init: float = 1.6e-4
    position_lr_final: float = 1.6e-6
    position_lr_delay_mult: float = 0.01
    position_lr_max_steps: int = 30000
    feature_lr: float = 2.5e-3
    opacity_lr: float = 0.025
    scaling_lr: float = 5e-3
    quaternion_lr: float = 1e-3
    exposure_lr_init: float = 0.01
    exposure_lr_final: float = 0.001
    exposure_lr_delay_steps: int = 0
    exposure_lr_delay_mult: float = 0.0
    # geometry block
    percent_dense: float = 0.01
    densify_start_iter: int = 500
    densify_end_iter: int = 15000
    densification_interval: int = 100
    opacity_reset_interval: int = 3000
    densify_grad_threshold: float = 2e-4
    min_opacity: float = 0.005
    size_threshold: float = 20.0
    coarse_to_fine: bool = False
    # prune block (LightGaussian, config prune.*)
    prune_iterations: tuple = ()
    prune_v_pow: float = 0.1
    prune_decay: float = 0.6
    prune_percent: float = 0.5
    # texture block
    max_sh_degree: int = 3
    sh_increase_interval: int = 1000
    # appearance
    use_trained_exposure: bool = False
    use_appearance_mask: bool = False  # VastGaussian decoupled appearance
    lambda_mask: float = 0.0
    mask_lr: float = 1e-3
    # camera pose refinement (reference: optimizer.lr_pose gates it,
    # implicit_recon_trainer.py:213-238; deltas start at identity)
    optimize_camera_poses: bool = False
    pose_lr: float = 1e-4
    opt_pose_start_iter: int = 3000
    # misc
    white_background: bool = False
    spatial_lr_scale: float = -1.0  # <0: compute nerf++ norm from cameras
    min_capacity: int = 4096
    # In-jit step chaining: scan up to chain_steps train steps per dispatch
    # (same trick as the ADMM master's chained scans, parallel/master.py) so
    # per-step host/tunnel dispatch overhead amortizes. Chunks never cross a
    # host event (densify / opacity reset / prune / log / val / checkpoint)
    # or a regime switch (SH degree, coarse-to-fine resolution). 1 = off.
    chain_steps: int = 1
    # Device-resident GT image cache budget in bytes (LRU): keeps recently
    # used training images in HBM so chained chunks stack them on-device
    # instead of re-staging host->device every dispatch. 0 disables.
    gt_cache_bytes: int = 2 << 30
    # Reaction to tile-bin saturation (overflow-pool exhaustion or entries
    # cut by bin_capacity — see raster/binning.py telemetry). "grow": widen
    # the saturated budget by bin_growth_factor and recompile; "error": fail
    # loudly; "ignore": warn only. SURVEY rule: no silent caps.
    on_bin_saturation: str = "grow"
    bin_growth_factor: float = 1.5
    # Budget SHRINK reaction (r5 densify-phase attack): auto-grown budgets
    # are a ratchet — the early-densify demand spike leaves the steady state
    # paying an oversized binning sort for the rest of the run. When "grow"
    # mode sees bin_shrink_patience consecutive log windows whose peak
    # demand (bin_valid / bin_pool_need window maxes) would still fit after
    # one shrink step with bin_shrink_margin headroom, budgets step back
    # down by bin_growth_factor — never below the configured initial values.
    # 0 disables.
    bin_shrink_patience: int = 3
    bin_shrink_margin: float = 1.15
    # Reactive capacity growth: skip the per-event required_slots fetch (a
    # host<->device sync that drains the dispatch pipeline — through the
    # remote-TPU tunnel that is most of a densify event's cost) and instead
    # densify into the current capacity, checking the PREVIOUS event's
    # overflow scalar (long computed by then, so reading it drains nothing)
    # to grow a pow2 bucket when candidates were dropped. Deviation from the
    # reference's grow-first protocol: under capacity pressure a clone/split
    # can be delayed by one densification_interval (its grad stats rebuild
    # and it re-qualifies next event); every drop is logged. False restores
    # the synchronous pre-grow.
    reactive_capacity_growth: bool = True
    # device profiling (SURVEY §5.1): capture a jax.profiler trace for
    # profile_num_steps steps starting at profile_start_step; view with
    # tensorboard --logdir <profile_dir> or xprof. 0 = disabled.
    profile_start_step: int = 0
    profile_num_steps: int = 0
    profile_dir: str = "profile"


@flax.struct.dataclass
class TrainState:
    model: GaussianModelState
    opt: SparseAdamState
    exposure: jnp.ndarray  # (n_images, 3, 4)
    exposure_mu: jnp.ndarray
    exposure_nu: jnp.ndarray
    step: jnp.ndarray  # () int32
    # VastGaussian appearance mask CNN (empty dicts when disabled).
    mask_params: dict = flax.struct.field(default_factory=dict)
    mask_mu: dict = flax.struct.field(default_factory=dict)
    mask_nu: dict = flax.struct.field(default_factory=dict)
    # SE(3) camera pose deltas (n_images, 6), zeros = no correction.
    pose_deltas: jnp.ndarray = dataclasses.field(
        default_factory=lambda: jnp.zeros((0, 6), jnp.float32)
    )
    pose_mu: jnp.ndarray = dataclasses.field(
        default_factory=lambda: jnp.zeros((0, 6), jnp.float32)
    )
    pose_nu: jnp.ndarray = dataclasses.field(
        default_factory=lambda: jnp.zeros((0, 6), jnp.float32)
    )


def compute_nerf_plus_plus_norm(cameras: Sequence[Camera]) -> float:
    """Scene extent = 1.1 * max camera distance from the camera centroid
    (conerf/datasets/utils.py:352-369)."""
    centers = np.stack([np.asarray(c.camera_center) for c in cameras])
    centroid = centers.mean(axis=0)
    radius = np.linalg.norm(centers - centroid, axis=-1).max()
    return float(radius * 1.1)


def train_state_from_model(
    model: GaussianModelState,
    n_images: int,
    cfg: TrainerConfig,
) -> TrainState:
    """Fill every non-model TrainState field for a given model.

    Single source of truth for the TrainState field set: anything that
    constructs a state by hand (bench.py, tools, tests) must go through here
    so that adding a field to TrainState cannot silently break them.
    """
    exposure = jnp.tile(
        jnp.eye(3, 4, dtype=jnp.float32)[None], (max(n_images, 1), 1, 1)
    )
    mask_params = {}
    if cfg.use_appearance_mask:
        from dogs_tpu.fields.appearance import init_appearance_params

        mask_params = init_appearance_params(max(n_images, 1))
    zeros_like_tree = lambda t: jax.tree.map(jnp.zeros_like, t)
    pose = jnp.zeros((max(n_images, 1), 6), jnp.float32)
    return TrainState(
        model=model,
        opt=init_sparse_adam(model.params),
        exposure=exposure,
        exposure_mu=jnp.zeros_like(exposure),
        exposure_nu=jnp.zeros_like(exposure),
        step=jnp.zeros((), jnp.int32),
        mask_params=mask_params,
        mask_mu=zeros_like_tree(mask_params),
        mask_nu=zeros_like_tree(mask_params),
        pose_deltas=pose,
        pose_mu=jnp.zeros_like(pose),
        pose_nu=jnp.zeros_like(pose),
    )


def init_train_state(
    points: np.ndarray,
    colors: np.ndarray,
    n_images: int,
    cfg: TrainerConfig,
) -> TrainState:
    capacity = round_up_capacity(points.shape[0], cfg.min_capacity)
    model = init_from_points(
        jnp.asarray(points), jnp.asarray(colors), capacity, cfg.max_sh_degree
    )
    return train_state_from_model(model, n_images, cfg)


def apply_exposure(image: jnp.ndarray, exposure: jnp.ndarray) -> jnp.ndarray:
    """img' = img @ E[:3,:3] + E[:3,3] (conerf/render/gaussian_render.py:139-144)."""
    return (
        jnp.einsum("hwc,cd->hwd", image, exposure[:3, :3]) + exposure[:3, 3]
    )


def make_lr_schedules(cfg: TrainerConfig, spatial_lr_scale: float):
    xyz_lr = exponential_lr(
        cfg.position_lr_init * spatial_lr_scale,
        cfg.position_lr_final * spatial_lr_scale,
        cfg.position_lr_max_steps,
        lr_delay_mult=cfg.position_lr_delay_mult,
        lr_delay_steps=0,
    )
    exposure_lr = exponential_lr(
        cfg.exposure_lr_init,
        cfg.exposure_lr_final,
        cfg.max_iterations,
        lr_delay_steps=cfg.exposure_lr_delay_steps,
        lr_delay_mult=cfg.exposure_lr_delay_mult,
    )

    def lrs(step):
        return GaussianParams(
            xyz=xyz_lr(step),
            feat_dc=jnp.float32(cfg.feature_lr),
            feat_rest=jnp.float32(cfg.feature_lr / 20.0),
            log_scale=jnp.float32(cfg.scaling_lr),
            quat=jnp.float32(cfg.quaternion_lr),
            logit_opacity=jnp.float32(cfg.opacity_lr),
        )

    return lrs, exposure_lr


def make_train_step(
    cfg: TrainerConfig,
    raster_cfg: RasterConfig,
    spatial_lr_scale: float,
    active_sh_degree: int,
    background: tuple[float, float, float],
    admm: bool = False,
    jit: bool = True,
) -> Callable:
    """Build the jitted train step for one (sh_degree, image-shape) bucket.

    The returned function is `train_step(ts, camera, gt_image) -> (ts, metrics)`
    and mirrors gaussian_trainer.py:324-513 train_iteration minus the host
    concerns (densify triggers, checkpointing, logging cadence).

    With `admm=True` the signature becomes
    `train_step(ts, camera, gt, u, z_local, rho)` and the scaled-dual ADMM
    penalty sum_p 0.5*rho_p*mean((x_p + u_p - z_p)^2) is added to the loss
    (slave_gaussian_trainer.py:161-202 add_admm_penalties); used by the
    block-parallel trainer (dogs_tpu/parallel/admm.py).
    """
    lrs_fn, exposure_lr_fn = make_lr_schedules(cfg, spatial_lr_scale)
    bg = jnp.asarray(background, jnp.float32)

    def loss_fn(params, offset, exposure_row, mask_params, pose_delta, camera, gt, alive, admm_args):
        if cfg.optimize_camera_poses:
            # Left-multiply the SE(3) correction onto world->camera
            # (camera.py:188-206 update_camera_pose equivalent).
            from dogs_tpu.core.transforms import se3_exp

            dR, dt = se3_exp(pose_delta)
            camera = camera.replace(
                R=jnp.matmul(dR, camera.R, precision=jax.lax.Precision.HIGHEST),
                t=jnp.matmul(dR, camera.t, precision=jax.lax.Precision.HIGHEST) + dt,
            )
        out = render_tiled(
            params,
            camera,
            raster_cfg,
            background=bg,
            alive=alive,
            active_sh_degree=active_sh_degree,
            means2d_offset=offset,
        )
        img = out.image
        if cfg.use_trained_exposure:
            img = apply_exposure(img, exposure_row)
        img = jnp.clip(img, 0.0, 1.0)
        mask_reg = jnp.float32(0.0)
        if cfg.use_appearance_mask:
            # VastGaussian: L1 on masked render, SSIM on the raw render
            # (gaussian_trainer.py:392-401).
            from dogs_tpu.fields.appearance import apply_appearance

            mask = apply_appearance(mask_params, img, camera.image_index)
            l1 = jnp.mean(jnp.abs(img * mask - gt))
            mask_reg = cfg.lambda_mask * jnp.mean((mask - 1.0) ** 2)
        else:
            l1 = jnp.mean(jnp.abs(img - gt))
        loss_ssim = ssim(img, gt)
        loss = (
            (1.0 - cfg.lambda_dssim) * l1
            + cfg.lambda_dssim * (1.0 - loss_ssim)
            + mask_reg
        )
        # Scale regularizer: mean over alive of prod(scale)
        # (gaussian_trainer.py:405-407).
        n_alive = jnp.maximum(jnp.sum(alive.astype(jnp.float32)), 1.0)
        vol = jnp.prod(params.scale, axis=-1)
        loss_scaling = jnp.sum(jnp.where(alive, vol, 0.0)) / n_alive
        loss = loss + cfg.lambda_scale * loss_scaling
        if admm_args is not None:
            u, z_local, rho = admm_args
            for x_p, u_p, z_p, rho_p in zip(
                params.astuple(), u.astuple(), z_local.astuple(), rho.astuple()
            ):
                mask = alive.reshape((-1,) + (1,) * (x_p.ndim - 1))
                sq = jnp.where(mask, (x_p + u_p - z_p) ** 2, 0.0)
                denom = jnp.maximum(
                    n_alive * float(np.prod(x_p.shape[1:])), 1.0
                )
                loss = loss + 0.5 * rho_p * jnp.sum(sq) / denom
        mse = jnp.mean((img - gt) ** 2)
        psnr = -10.0 * jnp.log(mse) / jnp.log(10.0)
        aux = dict(
            radii=out.radii, l1=l1, ssim=loss_ssim, psnr=psnr,
            scale_loss=loss_scaling,
            bin_valid=out.bin_valid,
            bin_rect_truncated=out.bin_rect_truncated,
            bin_pool_truncated=out.bin_pool_truncated,
            bin_dropped=out.bin_dropped,
            bin_pool_need=out.bin_pool_need,
        )
        return loss, aux

    def train_step(ts: TrainState, camera: Camera, gt: jnp.ndarray, *admm_in):
        admm_args = None
        if admm:
            u, z_local, rho = admm_in
            admm_args = (
                jax.lax.stop_gradient(u),
                jax.lax.stop_gradient(z_local),
                rho,
            )
        params = ts.model.params
        offset = jnp.zeros((params.capacity, 2), jnp.float32)
        exposure_row = ts.exposure[camera.image_index]
        # Only read the per-image pose delta when pose refinement is on —
        # states built without pose buffers (size-(0,6) defaults) must still
        # run (round-1 bench regression: indexing the empty default crashed).
        if cfg.optimize_camera_poses:
            pose_row = ts.pose_deltas[camera.image_index]
        else:
            pose_row = jnp.zeros((6,), jnp.float32)
        (loss, aux), grads = jax.value_and_grad(
            loss_fn, argnums=(0, 1, 2, 3, 4), has_aux=True
        )(
            params, offset, exposure_row, ts.mask_params, pose_row, camera,
            gt, ts.model.alive, admm_args,
        )
        g_params, g_offset, g_exposure, g_mask, g_pose = grads
        radii = aux["radii"]
        visible = (radii > 0.0) & ts.model.alive

        new_params, new_opt = sparse_adam_step(
            params, g_params, ts.opt, visible, lrs_fn(ts.step)
        )

        # Densification bookkeeping while the densify phase is on
        # (gaussian_trainer.py:429-447).
        in_densify = ts.step < cfg.densify_end_iter
        model = ts.model.replace(params=new_params)
        stats_model = update_densify_stats(
            model, g_offset, radii, camera.width, camera.height
        )
        model = jax.tree.map(
            lambda a, b: jnp.where(in_densify, a, b), stats_model, model
        )

        mask_params, mask_mu, mask_nu = ts.mask_params, ts.mask_mu, ts.mask_nu
        if cfg.use_appearance_mask:
            upd = jax.tree.map(
                lambda p_, g_, m_, v_: adam_step(
                    p_, g_, m_, v_, cfg.mask_lr, ts.step
                ),
                mask_params, g_mask, mask_mu, mask_nu,
            )
            mask_params = jax.tree.map(
                lambda t: t[0], upd, is_leaf=lambda x: isinstance(x, tuple)
            )
            mask_mu = jax.tree.map(
                lambda t: t[1], upd, is_leaf=lambda x: isinstance(x, tuple)
            )
            mask_nu = jax.tree.map(
                lambda t: t[2], upd, is_leaf=lambda x: isinstance(x, tuple)
            )

        exposure = ts.exposure
        exp_mu, exp_nu = ts.exposure_mu, ts.exposure_nu
        if cfg.use_trained_exposure:
            row, mu_row, nu_row = adam_step(
                exposure_row,
                g_exposure,
                exp_mu[camera.image_index],
                exp_nu[camera.image_index],
                exposure_lr_fn(ts.step),
                ts.step,
            )
            exposure = exposure.at[camera.image_index].set(row)
            exp_mu = exp_mu.at[camera.image_index].set(mu_row)
            exp_nu = exp_nu.at[camera.image_index].set(nu_row)

        pose_deltas, pose_mu, pose_nu = ts.pose_deltas, ts.pose_mu, ts.pose_nu
        if cfg.optimize_camera_poses:
            # Pose refinement engages after opt_pose_start_iter
            # (gaussian_trainer.py:366-370) and never moves camera 0 (gauge).
            lr_eff = jnp.where(
                (ts.step >= cfg.opt_pose_start_iter) & (camera.image_index != 0),
                cfg.pose_lr, 0.0,
            )
            row, mu_row, nu_row = adam_step(
                pose_row, g_pose,
                pose_mu[camera.image_index], pose_nu[camera.image_index],
                lr_eff, ts.step,
            )
            pose_deltas = pose_deltas.at[camera.image_index].set(row)
            pose_mu = pose_mu.at[camera.image_index].set(mu_row)
            pose_nu = pose_nu.at[camera.image_index].set(nu_row)

        new_ts = TrainState(
            model=model,
            opt=new_opt,
            exposure=exposure,
            exposure_mu=exp_mu,
            exposure_nu=exp_nu,
            step=ts.step + 1,
            mask_params=mask_params,
            mask_mu=mask_mu,
            mask_nu=mask_nu,
            pose_deltas=pose_deltas,
            pose_mu=pose_mu,
            pose_nu=pose_nu,
        )
        metrics = dict(
            loss=loss,
            l1=aux["l1"],
            ssim=aux["ssim"],
            psnr=aux["psnr"],
            scale_loss=aux["scale_loss"],
            n_visible=jnp.sum(visible.astype(jnp.int32)),
            n_alive=ts.model.num_alive,
            bin_valid=aux["bin_valid"],
            bin_rect_truncated=aux["bin_rect_truncated"],
            bin_pool_truncated=aux["bin_pool_truncated"],
            bin_dropped=aux["bin_dropped"],
            bin_pool_need=aux["bin_pool_need"],
        )
        return new_ts, metrics

    if not jit:
        return train_step
    return jax.jit(train_step, donate_argnums=(0,))


def make_chained_train_step(
    cfg: TrainerConfig,
    raster_cfg: RasterConfig,
    spatial_lr_scale: float,
    active_sh_degree: int,
    background: tuple[float, float, float],
) -> Callable:
    """k sequential train steps per dispatch: `(ts, cameras, gts) -> (ts,
    metrics)` where cameras is a stacked Camera pytree with leading dim k
    and gts is (k, H, W, 3). Semantics are IDENTICAL to k host-loop calls of
    the plain step (lax.scan, not gradient batching); only the dispatch
    count changes. Recompiles per k (jit specializes on the leading dim).

    Metrics are the last step's, except the bin saturation counters which
    report the chunk max so mid-chunk truncation can't hide from the
    trainer's no-silent-caps reaction.
    """
    step = make_train_step(
        cfg, raster_cfg, spatial_lr_scale, active_sh_degree, background,
        jit=False,
    )

    @functools.partial(jax.jit, donate_argnums=(0,))
    def chained(ts: TrainState, cameras: Camera, gts: jnp.ndarray):
        def body(carry, xs):
            cam, gt = xs
            return step(carry, cam, gt)

        ts, ms = jax.lax.scan(body, ts, (cameras, gts))
        out = jax.tree.map(lambda a: a[-1], ms)
        # Saturation counters AND utilization report the chunk max: mid-chunk
        # truncation can't hide, and the shrink reaction sees peak demand.
        for key in ("bin_pool_truncated", "bin_dropped", "bin_valid",
                    "bin_pool_need"):
            out[key] = jnp.max(ms[key])
        return ts, out

    return chained


def grow_capacity(ts: TrainState, new_capacity: int) -> TrainState:
    """Host-side capacity growth (power-of-two buckets bound recompiles)."""
    model = ts.model
    pad = new_capacity - model.capacity
    assert pad > 0

    def pad0(a):
        return jnp.concatenate(
            [a, jnp.zeros((pad,) + a.shape[1:], a.dtype)], axis=0
        )

    new_model = GaussianModelState(
        params=pad_to_capacity(model.params, new_capacity),
        alive=pad0(model.alive),
        grad_accum=pad0(model.grad_accum),
        denom=pad0(model.denom),
        max_radii2d=pad0(model.max_radii2d),
    )
    # Moments pad with ZEROS on every leaf (not the inert param defaults).
    zpad = lambda a: jnp.concatenate(
        [a, jnp.zeros((pad,) + a.shape[1:], a.dtype)], axis=0
    )
    new_opt = SparseAdamState(
        mu=jax.tree.map(zpad, ts.opt.mu), nu=jax.tree.map(zpad, ts.opt.nu)
    )
    return ts.replace(model=new_model, opt=new_opt)


def shrink_capacity(ts: TrainState, new_capacity: int) -> TrainState:
    """Host-side capacity shrink (resume from a smaller checkpoint): slice
    the capacity-indexed buffers; per-image state is untouched."""
    model = ts.model
    assert 0 < new_capacity < model.capacity
    cut = lambda a: a[:new_capacity]
    new_model = GaussianModelState(
        params=jax.tree.map(cut, model.params),
        alive=cut(model.alive),
        grad_accum=cut(model.grad_accum),
        denom=cut(model.denom),
        max_radii2d=cut(model.max_radii2d),
    )
    new_opt = SparseAdamState(
        mu=jax.tree.map(cut, ts.opt.mu), nu=jax.tree.map(cut, ts.opt.nu)
    )
    return ts.replace(model=new_model, opt=new_opt)


def zero_moments_at(opt: SparseAdamState, slots_mask: jnp.ndarray) -> SparseAdamState:
    """Zero Adam moments for newly allocated slots (the replacement for
    cat_tensors_to_optimizer's zero extension, gaussian_splat_model.py:60-108)."""

    def z(a):
        m = slots_mask.reshape((-1,) + (1,) * (a.ndim - 1))
        return jnp.where(m, 0.0, a)

    return SparseAdamState(mu=jax.tree.map(z, opt.mu), nu=jax.tree.map(z, opt.nu))


def zero_opacity_moments(opt: SparseAdamState) -> SparseAdamState:
    """After opacity reset, the reference zeroes the opacity group's moments
    (replace_tensor_to_optimizer, gaussian_splat_model.py:34-58)."""
    return SparseAdamState(
        mu=opt.mu.replace(logit_opacity=jnp.zeros_like(opt.mu.logit_opacity)),
        nu=opt.nu.replace(logit_opacity=jnp.zeros_like(opt.nu.logit_opacity)),
    )


class GaussianSplatTrainer:
    """Host-side training orchestrator (single device).

    Mirrors the reference loop cadence: SH annealing every 1000 iters,
    densify every 100 in [500, 15000], opacity reset every 3000, optional
    coarse-to-fine resolution schedule (gaussian_trainer.py:309-319).
    """

    def __init__(
        self,
        cameras: Sequence[Camera],
        images: Sequence[np.ndarray],
        points: np.ndarray,
        colors: np.ndarray,
        cfg: TrainerConfig = TrainerConfig(),
        raster_cfg: RasterConfig = RasterConfig(),
        val_cameras: Sequence[Camera] = (),
        val_images: Sequence[np.ndarray] = (),
        seed: int = 42,
    ):
        assert len(cameras) == len(images)
        self.cameras = list(cameras)
        # `images` may be a LazyImageList (real datasets) or in-memory arrays.
        if hasattr(images, "hint"):
            self.images = images
        else:
            self.images = [np.asarray(im, np.float32) for im in images]
        self.val_cameras = list(val_cameras)
        self.val_images = [np.asarray(im, np.float32) for im in val_images]
        self.cfg = cfg
        self.raster_cfg = raster_cfg
        self.rng = np.random.RandomState(seed)
        self.jax_key = jax.random.PRNGKey(seed)

        if cfg.spatial_lr_scale > 0:
            self.spatial_lr_scale = cfg.spatial_lr_scale
        else:
            self.spatial_lr_scale = compute_nerf_plus_plus_norm(self.cameras)
        self.background = (1.0, 1.0, 1.0) if cfg.white_background else (0.0, 0.0, 0.0)

        self.state = init_train_state(points, colors, len(cameras), cfg)
        self._step_cache: dict[Any, Callable] = {}
        self._order: list[int] = []
        self.metrics_history: list[dict] = []
        self.admm_penalty_fn = None  # hook used by the ADMM block trainer
        # Device-resident GT cache (single-device analogue of the ADMM
        # master's HBM-resident image pool): without it every chained chunk
        # re-stages its full-res GT stack host->device — ~285 MB per
        # 25-step chunk at 1152x864, which throttled a remote-TPU training
        # run to 1.3 it/s against a 12 it/s step time. LRU-bounded so huge
        # scenes streaming thousands of images from disk don't pin HBM.
        self._gt_cache: "OrderedDict[tuple, jnp.ndarray]" = OrderedDict()
        self._gt_cache_bytes = 0
        # Budget shrink bookkeeping: auto-grow may ratchet budgets up past
        # the configured values; the shrink reaction steps them back down
        # to (at lowest) these configured floors.
        self._initial_budgets = (
            raster_cfg.bin_capacity or 0,
            raster_cfg.overflow_capacity or 0,
        )
        self._shrink_windows = 0
        # Densify overflow device scalars awaiting a lazy host check (drained
        # at the log cadence; see _maybe_densify). _last_overflow holds the
        # most recent event's scalar as the reactive-growth signal.
        self._pending_overflow: list = []
        self._last_overflow = None

    # ---- jit-cache helpers -------------------------------------------------
    def _get_step_fn(self, active_sh_degree: int):
        key = active_sh_degree
        if key not in self._step_cache:
            self._step_cache[key] = make_train_step(
                self.cfg,
                self.raster_cfg,
                self.spatial_lr_scale,
                active_sh_degree,
                self.background,
            )
        return self._step_cache[key]

    def _get_chained_fn(self, active_sh_degree: int):
        key = ("chain", active_sh_degree)
        if key not in self._step_cache:
            self._step_cache[key] = make_chained_train_step(
                self.cfg,
                self.raster_cfg,
                self.spatial_lr_scale,
                active_sh_degree,
                self.background,
            )
        return self._step_cache[key]

    def active_sh_degree(self, step: int) -> int:
        return schedule.active_sh_degree(self.cfg, step)

    def training_resolution(self, step: int) -> int:
        """Coarse-to-fine factor (gaussian_trainer.py:309-319)."""
        return schedule.training_resolution(self.cfg, step)

    def _next_camera(self) -> int:
        if not self._order:
            self._order = list(self.rng.permutation(len(self.cameras)))
            if hasattr(self.images, "hint"):
                self.images.hint(list(reversed(self._order)))
        return int(self._order.pop())

    # ---- densification host logic ------------------------------------------
    def _maybe_densify(self, step: int):
        cfg = self.cfg
        if not (cfg.densify_start_iter < step < cfg.densify_end_iter):
            return
        if step % cfg.densification_interval != 0:
            return
        if cfg.reactive_capacity_growth:
            # Settle the previous event's overflow (no pipeline drain: its
            # value finished computing ~an interval ago) and grow a bucket
            # when allocation ran dry, so this event has room.
            ov = int(self._last_overflow) if self._last_overflow is not None else 0
            if ov > 0:
                new_cap = round_up_capacity(self.state.model.capacity + ov)
                logger.info(
                    "reactive capacity growth %d -> %d (%d dropped last event)",
                    self.state.model.capacity, new_cap, ov,
                )
                self.state = grow_capacity(self.state, new_cap)
        else:
            need = int(
                _required_slots_jit(
                    self.state.model,
                    cfg.densify_grad_threshold,
                    cfg.percent_dense,
                    self.spatial_lr_scale,
                )
            )
            if need > 0:
                new_cap = round_up_capacity(self.state.model.capacity + need)
                logger.info(
                    "growing capacity %d -> %d", self.state.model.capacity, new_cap
                )
                self.state = grow_capacity(self.state, new_cap)
        size_threshold = (
            cfg.size_threshold if step > cfg.opacity_reset_interval else None
        )
        self.jax_key, sub = jax.random.split(self.jax_key)
        new_model, allocated, overflow = _densify_and_prune_jit(
            self.state.model,
            sub,
            cfg.densify_grad_threshold,
            cfg.min_opacity,
            self.spatial_lr_scale,
            size_threshold,
            percent_dense=cfg.percent_dense,
        )
        self.state = self.state.replace(
            model=new_model, opt=zero_moments_at(self.state.opt, allocated)
        )
        # Deferred check: fetching overflow here would add a host<->device
        # roundtrip per densify event (the tunnel RTT bills per sync, not
        # per byte). Keep the device scalar: reactive mode reads it at the
        # NEXT event as its growth signal (_last_overflow, never cleared by
        # the log drain); the log cadence settles the warning either way.
        self._last_overflow = overflow
        self._pending_overflow.append(overflow)
        if len(self._pending_overflow) >= 32:
            # Callers driving train_iteration directly (no log cadence)
            # still get the check; old scalars are long computed, so the
            # int() here costs no pipeline drain.
            self._drain_overflow()

    def _drain_overflow(self):
        for ov in self._pending_overflow:
            ov = int(ov)
            if ov > 0:
                logger.warning("densify overflow: %d candidates dropped", ov)
        self._pending_overflow.clear()

    def _react_to_bin_saturation(self, m: dict):
        """No silent caps (SURVEY §7): when the overflow pool exhausts or
        bin_capacity cuts valid entries, warn and (per config) grow the
        saturated budget — a recompile, so only at the log cadence."""
        pool_t = int(m.get("bin_pool_truncated", 0) or 0)
        dropped = int(m.get("bin_dropped", 0) or 0)
        if pool_t <= 0 and dropped <= 0:
            self._maybe_shrink_budgets(m)
            return
        self._shrink_windows = 0
        msg = (
            f"tile-bin saturation: pool_truncated={pool_t} "
            f"dropped_entries={dropped} valid={int(m.get('bin_valid', 0))}"
        )
        if self.cfg.on_bin_saturation == "error":
            raise RuntimeError(msg)
        logger.warning(msg)
        if self.cfg.on_bin_saturation != "grow":
            return
        rc = self.raster_cfg
        changed = {}
        if pool_t > 0:
            cur = rc.overflow_capacity or 2 * self.state.model.capacity
            changed["overflow_capacity"] = int(cur * self.cfg.bin_growth_factor)
        if dropped > 0 and rc.bin_capacity is not None:
            changed["bin_capacity"] = int(
                rc.bin_capacity * self.cfg.bin_growth_factor
            )
        if changed:
            self.raster_cfg = dataclasses.replace(rc, **changed)
            self._step_cache.clear()
            logger.warning("grew bin budgets: %s", changed)

    def _maybe_shrink_budgets(self, m: dict):
        """Step auto-grown budgets back down once the demand spike passes
        (the early-densify transient otherwise ratchets the binning sort to
        its peak size for the whole run — measured 3.75M capacity against a
        ~1.6M steady demand on the densify bench). Shrinks one
        bin_growth_factor step after bin_shrink_patience consecutive
        underutilized log windows; floors at the configured initial budgets
        so user-oversized configs are respected."""
        cfg, rc = self.cfg, self.raster_cfg
        if (
            cfg.on_bin_saturation != "grow"
            or cfg.bin_shrink_patience <= 0
            or "bin_valid" not in m
        ):
            return
        floors = self._initial_budgets
        f, margin = cfg.bin_growth_factor, cfg.bin_shrink_margin
        want = {}
        if rc.bin_capacity is not None and rc.bin_capacity > floors[0]:
            target = max(int(rc.bin_capacity / f), floors[0])
            if float(m["bin_valid"]) * margin <= target:
                want["bin_capacity"] = target
        pool_need = m.get("bin_pool_need")
        if (
            pool_need is not None
            and rc.overflow_capacity
            and rc.overflow_capacity > floors[1]
        ):
            target = max(int(rc.overflow_capacity / f), floors[1])
            if float(pool_need) * margin <= target:
                want["overflow_capacity"] = target
        if not want:
            self._shrink_windows = 0
            return
        self._shrink_windows += 1
        if self._shrink_windows < cfg.bin_shrink_patience:
            return
        self._shrink_windows = 0
        self.raster_cfg = dataclasses.replace(rc, **want)
        self._step_cache.clear()
        logger.info("shrank bin budgets after demand spike passed: %s", want)

    def _maybe_reset_opacity(self, step: int):
        cfg = self.cfg
        hit = step % cfg.opacity_reset_interval == 0
        white_kick = cfg.white_background and step == cfg.densify_start_iter
        if step < cfg.densify_end_iter and (hit or white_kick):
            self.state = self.state.replace(
                model=reset_opacity(self.state.model),
                opt=zero_opacity_moments(self.state.opt),
            )

    # ---- in-jit step chaining (cfg.chain_steps > 1) --------------------------
    def _chunk_len(
        self, s0: int, end: int,
        log_every: int, validate_every: int, checkpoint_every: int,
    ) -> int:
        """Longest event-free, regime-uniform chain starting at s0 — shared
        rule in train/schedule.py (the ADMM master uses the same one)."""
        cfg = self.cfg
        boundaries = (
            (max(cfg.profile_start_step, 1),) if cfg.profile_num_steps else ()
        )
        return schedule.chunk_len(
            cfg, s0, end,
            chain_steps=cfg.chain_steps,
            extra_intervals=(log_every, validate_every, checkpoint_every),
            extra_boundaries=boundaries,
        )

    def _gt_on_device(self, idx: int, res: int) -> tuple[Camera, jnp.ndarray]:
        """Camera + device-resident GT for image `idx` at C2F factor `res`.
        LRU-bounded by cfg.gt_cache_bytes (see __init__)."""
        cam = self.cameras[idx]
        key = (idx, res)
        gt_dev = self._gt_cache.get(key)
        if res > 1:
            cam = cam.downsample(res)
        if gt_dev is None:
            gt = self.images[idx]
            if res > 1:
                from dogs_tpu.data.dataset import resize_image

                gt = resize_image(np.asarray(gt), cam.width, cam.height)
            gt_dev = jnp.asarray(gt, jnp.float32)
            if self.cfg.gt_cache_bytes:
                self._gt_cache[key] = gt_dev
                self._gt_cache_bytes += gt_dev.nbytes
                while self._gt_cache_bytes > self.cfg.gt_cache_bytes:
                    _, old = self._gt_cache.popitem(last=False)
                    self._gt_cache_bytes -= old.nbytes
        else:
            self._gt_cache.move_to_end(key)
        return cam, gt_dev

    def _train_chunk(self, s0: int, k: int) -> dict:
        """Run steps s0 .. s0+k-1 in one jit dispatch (the caller guarantees
        via _chunk_len that no host event or regime switch falls inside),
        then fire the chunk-end step's host events."""
        res = self.training_resolution(s0)
        cams, gts = [], []
        for _ in range(k):
            cam, gt_dev = self._gt_on_device(self._next_camera(), res)
            cams.append(cam)
            gts.append(gt_dev)
        deg = self.active_sh_degree(s0)
        if len({(c.width, c.height) for c in cams}) > 1:
            # Non-uniform image sizes can't stack into one scan; step the
            # chunk through the per-shape jitted step instead.
            step_fn = self._get_step_fn(deg)
            for cam, gt in zip(cams, gts):
                self.state, metrics = step_fn(self.state, cam, gt)
        else:
            camera = jax.tree.map(lambda *xs: jnp.stack(xs), *cams)
            # jnp.stack of device-resident arrays is a device-side concat —
            # no host->device staging in the steady state.
            self.state, metrics = self._get_chained_fn(deg)(
                self.state, camera, jnp.stack(gts)
            )
        end_step = s0 + k - 1
        self._maybe_densify(end_step)
        self._maybe_reset_opacity(end_step)
        self._maybe_lightgaussian_prune(end_step)
        return metrics

    # ---- main loop -----------------------------------------------------------
    def train_iteration(self, step: int) -> dict:
        # C2F supervision is area-resized like the reference's minify-backed
        # schedule (gaussian_trainer.py:309-319) inside _gt_on_device.
        camera, gt = self._gt_on_device(
            self._next_camera(), self.training_resolution(step)
        )
        step_fn = self._get_step_fn(self.active_sh_degree(step))
        self.state, metrics = step_fn(self.state, camera, gt)
        self._maybe_densify(step)
        self._maybe_reset_opacity(step)
        self._maybe_lightgaussian_prune(step)
        return metrics

    def _maybe_lightgaussian_prune(self, step: int):
        """LightGaussian importance prune at prune.iterations
        (gaussian_trainer.py:457-469)."""
        if step not in self.cfg.prune_iterations:
            return
        from dogs_tpu.fields.lightgaussian import (
            calculate_v_imp_score,
            prune_gaussians,
            prune_list,
        )

        imp = prune_list(
            self.state.model, self.cameras, self.raster_cfg,
            self.active_sh_degree(step),
        )
        scores = calculate_v_imp_score(self.state.model, imp, self.cfg.prune_v_pow)
        i = list(self.cfg.prune_iterations).index(step)
        percent = (self.cfg.prune_decay**i) * self.cfg.prune_percent
        before = int(self.state.model.num_alive)
        self.state = self.state.replace(
            model=prune_gaussians(self.state.model, percent, scores)
        )
        logger.info(
            "lightgaussian prune @%d: %d -> %d gaussians",
            step, before, int(self.state.model.num_alive),
        )

    def train(
        self,
        num_iterations: int | None = None,
        log_every: int = 100,
        validate_every: int = 0,
        checkpoint_every: int = 0,
        checkpoint_manager=None,
        tensorboard_writer=None,
    ):
        """Main loop with the reference cadences: tensorboard every
        n_tensorboard, validation every n_validation, checkpoints every
        n_checkpoint (implicit_recon_trainer.py:296-353)."""
        n = num_iterations or self.cfg.max_iterations
        start_step = int(self.state.step)
        end = start_step + n
        t0 = time.time()
        metrics = {}
        # Bin-saturation counters accumulate across EVERY chunk in a log
        # window (as lazy device maxes — no per-chunk host sync), so a
        # transient overflow in a chunk that doesn't end on a log step
        # still reaches _react_to_bin_saturation.
        sat_accum = {"bin_pool_truncated": None, "bin_dropped": None,
                     "bin_valid": None, "bin_pool_need": None}
        tracing = False
        trace_until = 0
        step = start_step
        while step < end:
            s0 = step + 1
            if (
                self.cfg.profile_num_steps
                and s0 == max(self.cfg.profile_start_step, 1)
                and not tracing
            ):
                jax.profiler.start_trace(self.cfg.profile_dir)
                tracing = True
                trace_until = s0 + self.cfg.profile_num_steps
            # Per-step dispatch while tracing (per-step trace spans), else
            # chain up to cfg.chain_steps steps into one dispatch.
            k = 1
            if self.cfg.chain_steps > 1 and not tracing:
                k = self._chunk_len(
                    s0, end, log_every, validate_every, checkpoint_every
                )
            if k <= 1:
                metrics = self.train_iteration(s0)
            else:
                metrics = self._train_chunk(s0, k)
            for key in sat_accum:
                v = metrics.get(key)
                if v is not None:
                    a = sat_accum[key]
                    sat_accum[key] = v if a is None else jnp.maximum(a, v)
            step = s0 + k - 1
            if tracing and step + 1 >= trace_until:
                jax.tree.map(
                    lambda a: a.block_until_ready() if hasattr(a, "block_until_ready") else a,
                    self.state.model.params.xyz,
                )
                jax.profiler.stop_trace()
                tracing = False
                logger.info("profiler trace written to %s", self.cfg.profile_dir)
            if log_every and step % log_every == 0:
                self._drain_overflow()
                # ONE device transfer for the whole metrics dict: sequential
                # float() fetches bill a tunnel round trip each (~15/window).
                fetched = jax.device_get(
                    {
                        **metrics,
                        **{k: v for k, v in sat_accum.items() if v is not None},
                    }
                )
                m = {k: float(v) for k, v in fetched.items()}
                m["iters_per_sec"] = (step - start_step) / (time.time() - t0)
                m["step"] = step
                sat_accum = dict.fromkeys(sat_accum)
                self.metrics_history.append(m)
                self._react_to_bin_saturation(m)
                logger.info(
                    "step %d loss %.4f psnr %.2f alive %d (%.1f it/s)",
                    step, m["loss"], m["psnr"], int(m["n_alive"]), m["iters_per_sec"],
                )
                if tensorboard_writer is not None:
                    for k, v in m.items():
                        tensorboard_writer.add_scalar(f"train/{k}", v, step)
            if validate_every and step % validate_every == 0:
                val = self.validate()
                if val:
                    logger.info("step %d val_psnr %.2f", step, val["val_psnr"])
                    if tensorboard_writer is not None:
                        tensorboard_writer.add_scalar("val/psnr", val["val_psnr"], step)
            if checkpoint_every and checkpoint_manager and step % checkpoint_every == 0:
                self.save_checkpoint(checkpoint_manager)
        if tracing:
            jax.profiler.stop_trace()
        self._drain_overflow()
        return metrics

    # ---- checkpointing --------------------------------------------------------
    def save_checkpoint(self, manager) -> str:
        """Stores the raw TrainState pytree + RNG, mirroring the reference's
        raw-tensor meta_data checkpoints (gaussian_trainer.py:515-547)."""
        extra = {
            "np_rng": self.rng.get_state()[1].tolist(),
            "spatial_lr_scale": self.spatial_lr_scale,
        }
        return manager.save(int(self.state.step), self.state, extra)

    def load_checkpoint(self, manager, path: str | None = None) -> int:
        """Resume; returns the restored step (gaussian_trainer.py:549-573).
        Capacities must match — the manager stores padded buffers verbatim."""
        # Template must match on-disk capacity; probe the stored shape first.
        probe_path = path or manager.latest_path()
        if probe_path is None:
            return 0
        import numpy as _np

        data = _np.load(probe_path)
        xyz_key = next(
            (k for k in data.files if k.endswith("xyz") and "model" in k and "params" in k),
            None,
        )
        cap = data[xyz_key].shape[0] if xyz_key else None
        if cap is not None and cap != self.state.model.capacity:
            if cap > self.state.model.capacity:
                self.state = grow_capacity(self.state, cap)
            else:
                self.state = shrink_capacity(self.state, cap)
        state, extra = manager.load(self.state, probe_path)
        if state is not None:
            self.state = state
        if "np_rng" in extra:
            st = self.rng.get_state()
            self.rng.set_state((st[0], _np.asarray(extra["np_rng"], _np.uint32), 0, 0, 0.0))
        return int(self.state.step)

    # ---- validation -----------------------------------------------------------
    def validate(self) -> dict:
        """PSNR over the val split (implicit_recon_trainer.py:358-375).

        The reference's validate() routes through the evaluator, which
        color-corrects val renders before metrics
        (gaussian_splatting_evaluator.py:294-299) — the correction absorbs
        the global appearance/exposure shift a raw render can't represent,
        so val PSNR stays meaningful when use_trained_exposure or the
        appearance mask is on.
        """
        if not self.val_cameras:
            return {}
        from dogs_tpu.eval.metrics import color_correct

        psnrs = []
        deg = self.active_sh_degree(int(self.state.step))
        for cam, gt in zip(self.val_cameras, self.val_images):
            out = render_tiled(
                self.state.model.params,
                cam,
                self.raster_cfg,
                background=jnp.asarray(self.background),
                alive=self.state.model.alive,
                active_sh_degree=deg,
            )
            img = jnp.clip(out.image, 0.0, 1.0)
            img = np.asarray(color_correct(img, jnp.asarray(gt, jnp.float32)))
            mse = float(np.mean((img - gt) ** 2))
            psnrs.append(-10.0 * np.log10(max(mse, 1e-10)))
        return {"val_psnr": float(np.mean(psnrs))}
