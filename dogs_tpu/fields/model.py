"""Gaussian field dynamics: init, densify, split, clone, prune — jit-safe.

TPU-native re-design of the reference's dynamic-count model surgery
(conerf/model/gaussian_fields/gaussian_splat_model.py:411-541: clone/split/
prune + `replace/cat/prune_tensor_to_optimizer` Adam-moment surgery). Torch
reallocates tensors every densify step; XLA needs static shapes, so here the
model lives in FIXED-CAPACITY padded buffers with an `alive` mask:

  * clone/split write into free (dead) slots via scatter;
  * prune just clears `alive` bits;
  * Adam moments and densify stats are zeroed at allocated slots (the
    moral equivalent of cat_tensors_to_optimizer's zero-extension);
  * when free slots run out the trainer grows capacity on the host in
    power-of-two buckets (bounded recompiles) — see train/trainer.py.

Recipe parity (gaussian_splat_model.py:434-531):
  clone: grad >= thresh and max(scale) <= percent_dense * extent -> copy.
  split: grad >= thresh and max(scale) >  percent_dense * extent ->
         2 replicas at x + R(q) @ N(0, scale), scale /= (0.8 * 2); kill parent.
  prune: opacity < min_opacity | screen radius > max_screen | world scale >
         0.1 * extent | below bbox z.
"""

from __future__ import annotations

import flax.struct
import jax
import jax.numpy as jnp

from dogs_tpu.core.gaussians import GaussianParams, empty_params, inverse_sigmoid
from dogs_tpu.core.knn import mean_knn_dist_sq
from dogs_tpu.core.sh import rgb_to_sh
from dogs_tpu.core.transforms import quat_to_rotmat


@flax.struct.dataclass
class GaussianModelState:
    """Padded model + alive mask + densification bookkeeping."""

    params: GaussianParams
    alive: jnp.ndarray  # (C,) bool
    grad_accum: jnp.ndarray  # (C,) sum of screen-space grad norms
    denom: jnp.ndarray  # (C,) number of accumulation events
    max_radii2d: jnp.ndarray  # (C,) running max screen radius

    @property
    def capacity(self) -> int:
        return self.params.capacity

    @property
    def num_alive(self) -> jnp.ndarray:
        return jnp.sum(self.alive.astype(jnp.int32))


def fresh_stats(capacity: int):
    return (
        jnp.zeros((capacity,), jnp.float32),
        jnp.zeros((capacity,), jnp.float32),
        jnp.zeros((capacity,), jnp.float32),
    )


def init_from_points(
    points: jnp.ndarray,
    colors: jnp.ndarray,
    capacity: int,
    max_sh_degree: int = 3,
) -> GaussianModelState:
    """Initialize from a COLMAP point cloud
    (gaussian_splat_model.py:543-587 init_from_colmap_pcd): DC SH from RGB,
    isotropic log-scale from sqrt(mean 3-NN squared distance), identity
    quats, opacity 0.1."""
    n = points.shape[0]
    assert n <= capacity, (n, capacity)
    params = empty_params(capacity, max_sh_degree, jnp.float32)
    alive = jnp.arange(capacity) < n

    pad = capacity - n
    xyz = jnp.pad(points.astype(jnp.float32), ((0, pad), (0, 0)))
    rgb = jnp.pad(colors.astype(jnp.float32), ((0, pad), (0, 0)))

    dist2 = jnp.maximum(mean_knn_dist_sq(xyz, valid=alive), 1e-7)
    log_scale = jnp.log(jnp.sqrt(dist2))[:, None].repeat(3, axis=1)
    params = params.replace(
        xyz=xyz,
        feat_dc=rgb_to_sh(rgb)[:, None, :],
        log_scale=jnp.where(alive[:, None], log_scale, -10.0),
        logit_opacity=jnp.where(
            alive[:, None], inverse_sigmoid(jnp.full((capacity, 1), 0.1)), -10.0
        ),
    )
    ga, de, mr = fresh_stats(capacity)
    return GaussianModelState(
        params=params, alive=alive, grad_accum=ga, denom=de, max_radii2d=mr
    )


def update_densify_stats(
    state: GaussianModelState,
    means2d_grad: jnp.ndarray,
    radii: jnp.ndarray,
    width: int,
    height: int,
) -> GaussianModelState:
    """Accumulate screen-space gradient stats
    (gaussian_splat_model.py:533-541 add_densification_stats).

    means2d_grad is in PIXELS (grad of the loss w.r.t. the means2d_offset
    dummy); the reference thresholds are calibrated for NDC-scale gradients
    (the CUDA backward multiplies by 0.5*W/H), so convert here.
    """
    visible = radii > 0.0
    g_ndc = means2d_grad * jnp.asarray(
        [0.5 * width, 0.5 * height], means2d_grad.dtype
    )
    norm = jnp.linalg.norm(g_ndc, axis=-1)
    return state.replace(
        grad_accum=jnp.where(visible, state.grad_accum + norm, state.grad_accum),
        denom=jnp.where(visible, state.denom + 1.0, state.denom),
        max_radii2d=jnp.where(
            visible, jnp.maximum(state.max_radii2d, radii), state.max_radii2d
        ),
    )


def densify_masks(
    state: GaussianModelState,
    grad_threshold: float,
    percent_dense: float,
    scene_extent,
):
    """Clone/split selection masks (shared by the host-side capacity check)."""
    grads = jnp.where(state.denom > 0, state.grad_accum / state.denom, 0.0)
    max_scale = jnp.max(state.params.scale, axis=-1)
    hot = (grads >= grad_threshold) & state.alive
    clone = hot & (max_scale <= percent_dense * scene_extent)
    split = hot & (max_scale > percent_dense * scene_extent)
    return clone, split


def required_slots(
    state: GaussianModelState,
    grad_threshold: float,
    percent_dense: float,
    scene_extent,
) -> jnp.ndarray:
    """Upper bound on slots needed by the next densify (host capacity check)."""
    clone, split = densify_masks(state, grad_threshold, percent_dense, scene_extent)
    n_new = jnp.sum(clone.astype(jnp.int32)) + 2 * jnp.sum(split.astype(jnp.int32))
    n_freed = jnp.sum(split.astype(jnp.int32))  # split parents die
    n_free = jnp.sum((~state.alive).astype(jnp.int32))
    return n_new - n_freed - n_free  # > 0 means grow capacity first


def _scatter_params(params: GaussianParams, slots: jnp.ndarray, new: GaussianParams):
    """Write candidate rows into `slots` (row index == capacity drops)."""
    return jax.tree.map(lambda buf, val: buf.at[slots].set(val, mode="drop"), params, new)


def _gather_params(params: GaussianParams, idx: jnp.ndarray) -> GaussianParams:
    return jax.tree.map(lambda buf: buf[idx], params)


def densify_and_prune(
    state: GaussianModelState,
    rng: jax.Array,
    grad_threshold: float,
    min_opacity: float,
    scene_extent,
    max_screen_size: float | None,
    percent_dense: float = 0.01,
    bbox_z_min: float | None = None,
):
    """One densify+prune round under fixed capacity.

    Returns (new_state, allocated_slot_mask, n_overflow). The slot mask marks
    slots whose content changed (new Gaussians) — the trainer zeroes Adam
    moments there. Overflow counts candidates dropped for lack of capacity.
    """
    c = state.capacity
    params = state.params
    clone, split = densify_masks(state, grad_threshold, percent_dense, scene_extent)

    # Prune selection on the CURRENT population
    # (gaussian_splat_model.py:501-531): children inherit their parent's
    # opacity/scale, so folding the parent prune into candidate validity
    # matches the reference's prune-after-densify.
    opacity = state.params.opacity[:, 0]
    prune = (opacity < min_opacity) & state.alive
    if max_screen_size is not None:
        big_vs = state.max_radii2d > max_screen_size
        big_ws = jnp.max(state.params.scale, axis=-1) > 0.1 * scene_extent
        prune = prune | ((big_vs | big_ws) & state.alive)
    if bbox_z_min is not None:
        prune = prune | ((state.params.xyz[:, 2] < bbox_z_min) & state.alive)

    clone = clone & ~prune
    split = split & ~prune

    # Survivors: everyone alive, minus pruned, minus split parents.
    alive_after = state.alive & ~prune & ~split

    # ---- Candidate list: C clone rows + 2C split rows. ----
    clone_cand = params
    noise = jax.random.normal(rng, (2 * c, 3), params.xyz.dtype)
    rep = lambda a: jnp.concatenate([a, a], axis=0)
    scale2 = rep(params.scale)
    quat2 = rep(params.quat)
    xyz2 = rep(params.xyz)
    R = quat_to_rotmat(quat2)
    offs = jnp.einsum("nij,nj->ni", R, noise * scale2)
    split_cand = GaussianParams(
        xyz=xyz2 + offs,
        feat_dc=rep(params.feat_dc),
        feat_rest=rep(params.feat_rest),
        log_scale=rep(params.log_scale) - jnp.log(1.6),  # scale /= 0.8 * 2
        quat=quat2,
        logit_opacity=rep(params.logit_opacity),
    )
    cand = jax.tree.map(
        lambda a, b: jnp.concatenate([a, b], axis=0), clone_cand, split_cand
    )
    cand_valid = jnp.concatenate([clone, split, split])  # (3C,)

    # ---- Slot allocation: k-th valid candidate -> k-th free slot. ----
    free = ~alive_after
    n_free = jnp.sum(free.astype(jnp.int32))
    # Free slot ids in ascending order (argsort of alive puts False first).
    free_slots = jnp.argsort(alive_after, stable=True).astype(jnp.int32)
    rank = jnp.cumsum(cand_valid.astype(jnp.int32)) - 1  # rank among valid
    ok = cand_valid & (rank < n_free)
    slots = jnp.where(ok, free_slots[jnp.clip(rank, 0, c - 1)], c)

    new_params = _scatter_params(params, slots, cand)
    allocated = jnp.zeros((c,), bool).at[slots].set(True, mode="drop")
    alive_new = alive_after | allocated

    n_valid = jnp.sum(cand_valid.astype(jnp.int32))
    overflow = jnp.maximum(n_valid - n_free, 0)

    ga, de, mr = fresh_stats(c)  # reference zeroes stats after densify
    new_state = GaussianModelState(
        params=new_params,
        alive=alive_new,
        grad_accum=ga,
        denom=de,
        max_radii2d=mr,
    )
    return new_state, allocated, overflow


def prune_only(state: GaussianModelState, prune_mask: jnp.ndarray) -> GaussianModelState:
    """Kill Gaussians by mask (LightGaussian percentile prune path,
    gaussian_splat_model.py:411-432)."""
    return state.replace(alive=state.alive & ~prune_mask)


def reset_opacity(state: GaussianModelState, ceiling: float = 0.01):
    """Clamp all opacities to <= ceiling (the periodic opacity reset of 3DGS;
    reference resets via replace_tensor_to_optimizer, zeroing Adam moments —
    the trainer zeroes the opacity moments using the returned mask)."""
    new_op = inverse_sigmoid(
        jnp.minimum(state.params.opacity, ceiling).clip(1e-6, 1.0 - 1e-6)
    )
    params = state.params.replace(
        logit_opacity=jnp.where(state.alive[:, None], new_op, state.params.logit_opacity)
    )
    return state.replace(params=params)
