"""Quaternion / rotation / 3D-covariance math for Gaussian fields.

Capability parity with the reference's quaternion+covariance utilities
(conerf/model/gaussian_fields/utils.py:6-94 and the cov3D construction in
cuda_rasterizer/forward.cu:119-153). Everything is pure jnp, batched over the
leading dimension, and differentiable.

Conventions:
  * quaternions are (w, x, y, z), not necessarily normalized (normalization
    happens at point of use, matching the reference's activation).
  * scales passed to covariance builders are LINEAR (post-exp).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Small-matrix geometry math must be exact f32: JAX's default matmul
# precision lowers to bf16-class on TPU, which is catastrophic for
# covariance/projection chains. Use this everywhere in geometry code.
HIGHEST = jax.lax.Precision.HIGHEST


def normalize(v: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """L2-normalize along the last axis."""
    return v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), eps)


def quat_to_rotmat(q: jnp.ndarray) -> jnp.ndarray:
    """(..., 4) wxyz quaternion -> (..., 3, 3) rotation matrix.

    Normalizes internally (reference normalizes via the model activation
    before building covariance, gaussian_splat_model.py:147-153).
    """
    q = normalize(q)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r00 = 1.0 - 2.0 * (y * y + z * z)
    r01 = 2.0 * (x * y - w * z)
    r02 = 2.0 * (x * z + w * y)
    r10 = 2.0 * (x * y + w * z)
    r11 = 1.0 - 2.0 * (x * x + z * z)
    r12 = 2.0 * (y * z - w * x)
    r20 = 2.0 * (x * z - w * y)
    r21 = 2.0 * (y * z + w * x)
    r22 = 1.0 - 2.0 * (x * x + y * y)
    return jnp.stack(
        [
            jnp.stack([r00, r01, r02], axis=-1),
            jnp.stack([r10, r11, r12], axis=-1),
            jnp.stack([r20, r21, r22], axis=-1),
        ],
        axis=-2,
    )


def rotmat_to_quat(R: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, 3) rotation matrix -> (..., 4) wxyz quaternion.

    Branch-free Shepperd-style conversion (safe under jit; picks the largest
    pivot via where-selects instead of data-dependent control flow).
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    # Four candidate formulations, each stable in a different regime.
    def cand_w():
        s = jnp.sqrt(jnp.maximum(tr + 1.0, 1e-12)) * 2.0
        return jnp.stack([0.25 * s, (m21 - m12) / s, (m02 - m20) / s, (m10 - m01) / s], -1)

    def cand_x():
        s = jnp.sqrt(jnp.maximum(1.0 + m00 - m11 - m22, 1e-12)) * 2.0
        return jnp.stack([(m21 - m12) / s, 0.25 * s, (m01 + m10) / s, (m02 + m20) / s], -1)

    def cand_y():
        s = jnp.sqrt(jnp.maximum(1.0 + m11 - m00 - m22, 1e-12)) * 2.0
        return jnp.stack([(m02 - m20) / s, (m01 + m10) / s, 0.25 * s, (m12 + m21) / s], -1)

    def cand_z():
        s = jnp.sqrt(jnp.maximum(1.0 + m22 - m00 - m11, 1e-12)) * 2.0
        return jnp.stack([(m10 - m01) / s, (m02 + m20) / s, (m12 + m21) / s, 0.25 * s], -1)

    qw, qx, qy, qz = cand_w(), cand_x(), cand_y(), cand_z()
    use_w = tr > 0.0
    use_x = (~use_w) & (m00 >= m11) & (m00 >= m22)
    use_y = (~use_w) & (~use_x) & (m11 >= m22)
    q = jnp.where(
        use_w[..., None], qw, jnp.where(use_x[..., None], qx, jnp.where(use_y[..., None], qy, qz))
    )
    return normalize(q)


def quat_multiply(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product of wxyz quaternions."""
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def quat_rotate(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate vectors (..., 3) by wxyz quaternions (..., 4)."""
    R = quat_to_rotmat(q)
    return jnp.einsum("...ij,...j->...i", R, v, precision=HIGHEST)


def so3_exp(w: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues: (..., 3) axis-angle -> (..., 3, 3) rotation.

    Pose-optimization building block (the reference's se3 utilities,
    conerf/geometry/pose_util.py / pytorch3d.se3 usage in camera.py:188-206).
    Written in the sinc form R = I + a[w]x + b[w]x^2 with series fallbacks so
    gradients stay finite at w = 0 (pose deltas START at zero — the naive
    normalize-then-rotate form produces NaN grads exactly there).
    """
    theta_sq = jnp.sum(w * w, axis=-1, keepdims=True)
    small = theta_sq < 1e-8
    # Both where-branches must be finite AND have finite grads at w=0, so
    # every division uses the safe (branch-switched) denominator.
    theta_sq_safe = jnp.where(small, 1.0, theta_sq)
    theta = jnp.sqrt(theta_sq_safe)
    a = jnp.where(small, 1.0 - theta_sq / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(
        small, 0.5 - theta_sq / 24.0, (1.0 - jnp.cos(theta)) / theta_sq_safe
    )
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    zero = jnp.zeros_like(wx)
    K = jnp.stack(
        [
            jnp.stack([zero, -wz, wy], -1),
            jnp.stack([wz, zero, -wx], -1),
            jnp.stack([-wy, wx, zero], -1),
        ],
        -2,
    )
    eye = jnp.broadcast_to(jnp.eye(3), K.shape)
    return (
        eye
        + a[..., None] * K
        + b[..., None] * jnp.matmul(K, K, precision=HIGHEST)
    )


def se3_exp(xi: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(..., 6) twist [rho, w] -> (R (...,3,3), t (...,3)) with the first-order
    translation (sufficient for the small pose corrections of camera
    refinement; the reference's deltas start at zero)."""
    rho = xi[..., 0:3]
    w = xi[..., 3:6]
    return so3_exp(w), rho


def build_covariance_3d(scale: jnp.ndarray, quat: jnp.ndarray) -> jnp.ndarray:
    """Sigma = R S S^T R^T, (..., 3, 3) full symmetric covariance.

    Mirrors build_covariance_from_scaling_rotation
    (conerf/model/gaussian_fields/utils.py / forward.cu:119-153) but returns
    the full matrix — XLA fuses the symmetric structure fine and the full
    matrix keeps downstream math simple.
    """
    R = quat_to_rotmat(quat)
    M = R * scale[..., None, :]  # R @ diag(s)
    return jnp.matmul(M, jnp.swapaxes(M, -1, -2), precision=HIGHEST)


def covariance_sym6(scale: jnp.ndarray, quat: jnp.ndarray) -> tuple:
    """Sigma = R S S^T R^T as its 6 unique components, fully scalarized.

    Returns (s11, s12, s13, s22, s23, s33), each (...,). Identical math to
    build_covariance_3d but lowers to one fused elementwise VPU pass instead
    of tiny batched 3x3 matmuls (the rasterizer preprocess hot path).
    """
    q = normalize(quat)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    sx, sy, sz = scale[..., 0], scale[..., 1], scale[..., 2]
    # Rotation matrix rows scaled by the per-axis scales: M = R diag(s).
    m00 = (1.0 - 2.0 * (y * y + z * z)) * sx
    m01 = (2.0 * (x * y - w * z)) * sy
    m02 = (2.0 * (x * z + w * y)) * sz
    m10 = (2.0 * (x * y + w * z)) * sx
    m11 = (1.0 - 2.0 * (x * x + z * z)) * sy
    m12 = (2.0 * (y * z - w * x)) * sz
    m20 = (2.0 * (x * z - w * y)) * sx
    m21 = (2.0 * (y * z + w * x)) * sy
    m22 = (1.0 - 2.0 * (x * x + y * y)) * sz
    s11 = m00 * m00 + m01 * m01 + m02 * m02
    s12 = m00 * m10 + m01 * m11 + m02 * m12
    s13 = m00 * m20 + m01 * m21 + m02 * m22
    s22 = m10 * m10 + m11 * m11 + m12 * m12
    s23 = m10 * m20 + m11 * m21 + m12 * m22
    s33 = m20 * m20 + m21 * m21 + m22 * m22
    return s11, s12, s13, s22, s23, s33


def covariance_to_symmetric6(cov: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, 3) -> (..., 6) upper-triangular strip (strip_symmetric)."""
    return jnp.stack(
        [
            cov[..., 0, 0],
            cov[..., 0, 1],
            cov[..., 0, 2],
            cov[..., 1, 1],
            cov[..., 1, 2],
            cov[..., 2, 2],
        ],
        axis=-1,
    )


def symmetric6_to_covariance(six: jnp.ndarray) -> jnp.ndarray:
    """(..., 6) strip -> (..., 3, 3) symmetric matrix."""
    a, b, c, d, e, f = (six[..., i] for i in range(6))
    row0 = jnp.stack([a, b, c], -1)
    row1 = jnp.stack([b, d, e], -1)
    row2 = jnp.stack([c, e, f], -1)
    return jnp.stack([row0, row1, row2], -2)
