"""Camera pytree and projection helpers.

TPU-native replacement for the reference `Camera` nn.Module
(conerf/geometry/camera.py:83-368) and its OpenGL projection helper
(conerf/geometry/pose_util.py:428). Instead of an object holding torch
buffers, `Camera` is an immutable flax.struct pytree that flows through jit;
width/height are static fields so image shapes stay compile-time constants.

Convention: COLMAP world-to-camera, x_cam = R @ x_world + t, +z looking
forward, y down (as parsed by the reference's pycolmap SceneManager).
"""

from __future__ import annotations

import dataclasses

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np


@flax.struct.dataclass
class Camera:
    """Pinhole camera. Array fields are jnp scalars/arrays; shape fields static."""

    R: jnp.ndarray  # (3, 3) world->camera rotation
    t: jnp.ndarray  # (3,) world->camera translation
    fx: jnp.ndarray  # () focal, pixels
    fy: jnp.ndarray
    cx: jnp.ndarray  # () principal point, pixels
    cy: jnp.ndarray
    width: int = flax.struct.field(pytree_node=False)
    height: int = flax.struct.field(pytree_node=False)
    near: float = flax.struct.field(pytree_node=False, default=0.01)
    far: float = flax.struct.field(pytree_node=False, default=100.0)
    image_index: jnp.ndarray = dataclasses.field(
        default_factory=lambda: jnp.zeros((), jnp.int32)
    )  # index into per-image exposure/appearance tables

    @property
    def camera_center(self) -> jnp.ndarray:
        """Camera origin in world coordinates (camera.py:135)."""
        return -jnp.matmul(self.R.T, self.t, precision=jax.lax.Precision.HIGHEST)

    @property
    def world_to_camera(self) -> jnp.ndarray:
        """(4, 4) view matrix."""
        m = jnp.eye(4, dtype=self.R.dtype)
        m = m.at[:3, :3].set(self.R)
        m = m.at[:3, 3].set(self.t)
        return m

    @property
    def camera_to_world(self) -> jnp.ndarray:
        m = jnp.eye(4, dtype=self.R.dtype)
        m = m.at[:3, :3].set(self.R.T)
        m = m.at[:3, 3].set(self.camera_center)
        return m

    @property
    def tan_half_fov_x(self) -> jnp.ndarray:
        return 0.5 * self.width / self.fx

    @property
    def tan_half_fov_y(self) -> jnp.ndarray:
        return 0.5 * self.height / self.fy

    def downsample(self, factor: float) -> "Camera":
        """Rescaled copy for the coarse-to-fine schedule (camera.py:145-163).

        Static-shape friendly: factor must be a python number.
        """
        new_w = max(int(round(self.width / factor)), 1)
        new_h = max(int(round(self.height / factor)), 1)
        sx = new_w / self.width
        sy = new_h / self.height
        return self.replace(
            fx=self.fx * sx,
            fy=self.fy * sy,
            cx=self.cx * sx,
            cy=self.cy * sy,
            width=new_w,
            height=new_h,
        )

    def project(self, xyz_world: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
        """World points (..., 3) -> pixel coords (..., 2) and camera depth (...,)."""
        p_cam = jnp.matmul(xyz_world, self.R.T, precision=jax.lax.Precision.HIGHEST) + self.t
        z = p_cam[..., 2]
        u = self.fx * p_cam[..., 0] / z + self.cx
        v = self.fy * p_cam[..., 1] / z + self.cy
        return jnp.stack([u, v], axis=-1), z


def make_camera(
    R: np.ndarray,
    t: np.ndarray,
    fx: float,
    fy: float,
    cx: float,
    cy: float,
    width: int,
    height: int,
    image_index: int = 0,
    near: float = 0.01,
    far: float = 100.0,
    dtype=jnp.float32,
) -> Camera:
    """Build a Camera pytree from host-side numpy/pose data."""
    return Camera(
        R=jnp.asarray(R, dtype),
        t=jnp.asarray(t, dtype),
        fx=jnp.asarray(fx, dtype),
        fy=jnp.asarray(fy, dtype),
        cx=jnp.asarray(cx, dtype),
        cy=jnp.asarray(cy, dtype),
        width=int(width),
        height=int(height),
        near=near,
        far=far,
        image_index=jnp.asarray(image_index, jnp.int32),
    )


def look_at_camera(
    eye: np.ndarray,
    target: np.ndarray,
    up: np.ndarray,
    fx: float,
    fy: float,
    width: int,
    height: int,
    **kwargs,
) -> Camera:
    """Convenience constructor for synthetic test scenes."""
    eye = np.asarray(eye, np.float64)
    forward = np.asarray(target, np.float64) - eye
    forward /= np.linalg.norm(forward)
    right = np.cross(forward, np.asarray(up, np.float64))
    right /= np.linalg.norm(right)
    down = np.cross(forward, right)
    R_c2w = np.stack([right, down, forward], axis=1)  # columns = camera axes in world
    R = R_c2w.T
    t = -R @ eye
    return make_camera(
        R, t, fx, fy, width / 2.0, height / 2.0, width, height, **kwargs
    )
