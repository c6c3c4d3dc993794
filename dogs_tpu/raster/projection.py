"""Per-Gaussian rasterization preprocess: project, EWA, conic, color.

TPU-native equivalent of the reference CUDA `preprocessCUDA`
(submodules/diff-gaussian-rasterization/cuda_rasterizer/forward.cu:157-276)
and `computeCov2D` (forward.cu:79-153): frustum cull, 3D covariance from
quat/scale, EWA projection to 2D covariance with the 0.3px low-pass and
optional antialiasing opacity rescale, conic + 3-sigma radius, and SH->RGB.

Pure jnp, vectorized over all Gaussians — this is embarrassingly parallel and
XLA fuses it into one pass over the parameter arrays. Differentiable by
autodiff (the CUDA backward.cu:149-452 chain rules come for free).
"""

from __future__ import annotations

import flax.struct
import jax
import jax.numpy as jnp

from dogs_tpu.core.camera import Camera
from dogs_tpu.core.gaussians import GaussianParams
from dogs_tpu.core.sh import eval_sh
from dogs_tpu.core.transforms import HIGHEST, covariance_sym6

# Matches the CUDA kernel's constants (auxiliary.h / forward.cu).
LOW_PASS_FILTER = 0.3
NEAR_PLANE = 0.2
ALPHA_MIN = 1.0 / 255.0


@flax.struct.dataclass
class ProjectedGaussians:
    """Screen-space Gaussians ready for binning + blending. All (C, ...)."""

    means2d: jnp.ndarray  # (C, 2) pixel coords
    depth: jnp.ndarray  # (C,) camera-space z
    conic: jnp.ndarray  # (C, 3) inverse 2D covariance (a, b, c)
    color: jnp.ndarray  # (C, 3) view-dependent RGB (>= 0)
    opacity: jnp.ndarray  # (C,) post-antialiasing opacity
    radius: jnp.ndarray  # (C,) 3-sigma screen radius in pixels (0 = culled)


def compute_cov2d(
    cov3d: jnp.ndarray,
    p_cam: jnp.ndarray,
    fx: jnp.ndarray,
    fy: jnp.ndarray,
    tan_fovx: jnp.ndarray,
    tan_fovy: jnp.ndarray,
    R_w2c: jnp.ndarray,
) -> jnp.ndarray:
    """EWA projection of 3D covariance to screen space (forward.cu:79-117).

    Args:
      cov3d: 6-tuple (s11, s12, s13, s22, s23, s33) from
        `dogs_tpu.core.transforms.covariance_sym6`.

    Returns (C, 2, 2) BEFORE the low-pass blur is added.

    Written as explicit per-component VPU math rather than tiny batched 3x3
    matmuls: XLA lowers (N,2,3)@(N,3,3) chains to an awkward batched-matmul
    pattern on TPU, while the expanded form fuses into one elementwise pass.
    """
    z = p_cam[..., 2]
    limx = 1.3 * tan_fovx
    limy = 1.3 * tan_fovy
    txtz = jnp.clip(p_cam[..., 0] / z, -limx, limx)
    tytz = jnp.clip(p_cam[..., 1] / z, -limy, limy)

    inv_z = 1.0 / z
    j00 = fx * inv_z
    j02 = -fx * txtz * inv_z
    j11 = fy * inv_z
    j12 = -fy * tytz * inv_z

    # T = J @ W, rows t0 (from j00,j02) and t1 (from j11,j12); W = R_w2c.
    w0 = R_w2c[0]
    w1 = R_w2c[1]
    w2 = R_w2c[2]
    t0 = j00[:, None] * w0 + j02[:, None] * w2  # (C, 3)
    t1 = j11[:, None] * w1 + j12[:, None] * w2  # (C, 3)

    s11, s12, s13, s22, s23, s33 = cov3d

    def quad(u, v):
        # u . Sigma . v with symmetric Sigma in 6-component form.
        return (
            u[:, 0] * v[:, 0] * s11
            + u[:, 1] * v[:, 1] * s22
            + u[:, 2] * v[:, 2] * s33
            + (u[:, 0] * v[:, 1] + u[:, 1] * v[:, 0]) * s12
            + (u[:, 0] * v[:, 2] + u[:, 2] * v[:, 0]) * s13
            + (u[:, 1] * v[:, 2] + u[:, 2] * v[:, 1]) * s23
        )

    a = quad(t0, t0)
    b = quad(t0, t1)
    c = quad(t1, t1)
    row0 = jnp.stack([a, b], axis=-1)
    row1 = jnp.stack([b, c], axis=-1)
    return jnp.stack([row0, row1], axis=-2)


def project_gaussians(
    params: GaussianParams,
    camera: Camera,
    alive: jnp.ndarray | None = None,
    active_sh_degree: int = 3,
    antialiasing: bool = False,
    scale_modifier: float = 1.0,
    means2d_offset: jnp.ndarray | None = None,
    color_override: jnp.ndarray | None = None,
) -> ProjectedGaussians:
    """Vectorized preprocess over all (padded) Gaussians.

    Args:
      params: padded Gaussian buffers.
      camera: target view.
      alive: (C,) bool mask of live Gaussians (padding slots get radius 0).
      active_sh_degree: SH annealing degree (static; gaussian_trainer.py:329).
      antialiasing: apply the Mip-Splatting opacity rescale
        sqrt(det(cov)/det(cov+blur)) (forward.cu:221-229).
      scale_modifier: global scale multiplier (rasterization settings).
      means2d_offset: optional (C, 2) zeros; gradients w.r.t. it are the
        screen-space position gradients used for densification bookkeeping
        (replaces the reference's retain_grad screen_space_points trick,
        conerf/render/gaussian_render.py:33-42).
    """
    xyz = params.xyz
    p_cam = jnp.matmul(xyz, camera.R.T, precision=HIGHEST) + camera.t
    z = p_cam[..., 2]
    in_front = z > NEAR_PLANE
    zsafe = jnp.where(in_front, z, 1.0)

    u = camera.fx * p_cam[..., 0] / zsafe + camera.cx
    v = camera.fy * p_cam[..., 1] / zsafe + camera.cy
    means2d = jnp.stack([u, v], axis=-1)
    if means2d_offset is not None:
        means2d = means2d + means2d_offset

    scale = params.scale * scale_modifier
    cov3d = covariance_sym6(scale, params.quat)
    p_cam_safe = jnp.where(in_front[:, None], p_cam, jnp.ones_like(p_cam))
    cov2d_raw = compute_cov2d(
        cov3d,
        p_cam_safe,
        camera.fx,
        camera.fy,
        camera.tan_half_fov_x,
        camera.tan_half_fov_y,
        camera.R,
    )
    a = cov2d_raw[..., 0, 0] + LOW_PASS_FILTER
    b = cov2d_raw[..., 0, 1]
    c = cov2d_raw[..., 1, 1] + LOW_PASS_FILTER
    det = a * c - b * b
    det_safe = jnp.where(det > 0.0, det, 1.0)
    inv_det = 1.0 / det_safe
    conic = jnp.stack([c * inv_det, -b * inv_det, a * inv_det], axis=-1)

    opacity = params.opacity[..., 0]
    if antialiasing:
        det_raw = (
            cov2d_raw[..., 0, 0] * cov2d_raw[..., 1, 1] - cov2d_raw[..., 0, 1] ** 2
        )
        h_factor = jnp.sqrt(jnp.maximum(det_raw / det_safe, 0.0) + 1e-12)
        opacity = opacity * h_factor

    # 3-sigma extent from the larger eigenvalue (forward.cu:231-238).
    mid = 0.5 * (a + c)
    lam_max = mid + jnp.sqrt(jnp.maximum(mid * mid - det, 0.1))
    radius = jnp.ceil(3.0 * jnp.sqrt(lam_max))

    visible = in_front & (det > 0.0) & (opacity > ALPHA_MIN)
    if alive is not None:
        visible = visible & alive
    radius = jnp.where(visible, radius, 0.0)

    if color_override is not None:
        # Precomputed per-view colors (the Scaffold-GS neural-gaussian path,
        # conerf/render/scaffold_gs_render.py:17-105 passes colors_precomp).
        color = jnp.maximum(color_override, 0.0)
    else:
        # View-dependent color (forward.cu:157-230 computeColorFromSH): SH
        # along the normalized direction, shifted +0.5 and clamped at 0.
        dirs = xyz - camera.camera_center
        dirs = dirs / jnp.maximum(
            jnp.linalg.norm(dirs, axis=-1, keepdims=True), 1e-12
        )
        color = eval_sh(active_sh_degree, params.features, dirs) + 0.5
        color = jnp.maximum(color, 0.0)

    return ProjectedGaussians(
        means2d=means2d,
        depth=z,
        conic=conic,
        color=color,
        opacity=opacity,
        radius=radius,
    )


def gaussian_alpha(
    conic: jnp.ndarray,
    opacity: jnp.ndarray,
    means2d: jnp.ndarray,
    pixel_xy: jnp.ndarray,
) -> jnp.ndarray:
    """Per-(gaussian, pixel) alpha (forward.cu:350-501 inner loop math).

    Shapes broadcast: conic (..., 3), opacity (...,), means2d (..., 2),
    pixel_xy (..., 2) -> alpha (...,). Alpha is clamped to <= 0.99 and to 0
    below 1/255, matching the CUDA skip rules.
    """
    d = pixel_xy - means2d
    power = -0.5 * (
        conic[..., 0] * d[..., 0] * d[..., 0]
        + conic[..., 2] * d[..., 1] * d[..., 1]
    ) - conic[..., 1] * d[..., 0] * d[..., 1]
    alpha = jnp.minimum(0.99, opacity * jnp.exp(jnp.minimum(power, 0.0)))
    return jnp.where(alpha < ALPHA_MIN, 0.0, alpha)
