"""MatrixCity -> COLMAP converter.

Capability parity with the reference converter
(scripts/preprocess/matrix_city_to_colmap.py, ~371 LoC, small_city path):
reads MatrixCity `transforms.json` pose files (nerfstudio-style frames with
fl_x/fl_y/cx/cy/w/h + per-frame transform_matrix), applies the
MatrixCity->COLMAP camera-axis flip and the Manhattan-world alignment, and
writes a COLMAP model. Optionally voxel-downsamples a provided dense point
cloud for the initialization ply.

Usage:
  python scripts/preprocess/matrix_city_to_colmap.py <scene_dir> \
      [pose_json ...]           # default: <scene_dir>/pose/**/transforms.json
"""

from __future__ import annotations

import glob
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from dogs_tpu.data.colmap import (  # noqa: E402
    ColmapCamera,
    ColmapImage,
    write_cameras_bin,
    write_images_bin,
    write_points3d_bin,
)

# MatrixCity camera axes -> COLMAP camera axes (flip y/z, like Blender).
MATRIX_CITY_TO_COLMAP = np.diag([1.0, -1.0, -1.0])
# z-up Manhattan alignment used by the reference for the whole scene.
TO_MANHATTAN_WORLD = np.array(
    [[1.0, 0.0, 0.0], [0.0, 0.0, 1.0], [0.0, -1.0, 0.0]]
)


def _rotmat_to_qvec(R: np.ndarray) -> np.ndarray:
    import jax.numpy as jnp

    from dogs_tpu.core.transforms import rotmat_to_quat

    return np.asarray(rotmat_to_quat(jnp.asarray(R, jnp.float32)), np.float64)


def convert(scene_dir: str, pose_jsons: list[str] | None = None) -> None:
    if not pose_jsons:
        pose_jsons = sorted(
            glob.glob(os.path.join(scene_dir, "pose", "**", "transforms*.json"),
                      recursive=True)
        ) or sorted(glob.glob(os.path.join(scene_dir, "transforms*.json")))
    assert pose_jsons, f"no transforms.json under {scene_dir}"

    cameras: dict[int, ColmapCamera] = {}
    images: dict[int, ColmapImage] = {}
    cam_key_to_id: dict[tuple, int] = {}
    image_id = 0

    for jpath in pose_jsons:
        with open(jpath) as f:
            meta = json.load(f)
        fx = float(meta["fl_x"])
        cx, cy = float(meta["cx"]), float(meta["cy"])
        w, h = int(meta["w"]), int(meta["h"])
        key = (round(fx, 3), w, h)
        if key not in cam_key_to_id:
            cam_id = len(cam_key_to_id) + 1
            cam_key_to_id[key] = cam_id
            cameras[cam_id] = ColmapCamera(
                cam_id, "SIMPLE_PINHOLE", w, h, np.asarray([fx, cx, cy])
            )
        for frame in meta["frames"]:
            c2w = np.asarray(frame["transform_matrix"], np.float64)
            c2w[:3, :3] = TO_MANHATTAN_WORLD @ (c2w[:3, :3] @ MATRIX_CITY_TO_COLMAP)
            c2w[:3, 3] = TO_MANHATTAN_WORLD @ c2w[:3, 3]
            w2c = np.linalg.inv(c2w)
            image_id += 1
            path = frame["file_path"]
            name = path[path.rfind("..") + 3 :] if ".." in path else path.lstrip("./")
            images[image_id] = ColmapImage(
                image_id,
                _rotmat_to_qvec(w2c[:3, :3]),
                w2c[:3, 3],
                cam_key_to_id[key],
                name,
            )

    colmap_dir = os.path.join(scene_dir, "sparse", "0")
    os.makedirs(colmap_dir, exist_ok=True)
    write_cameras_bin(os.path.join(colmap_dir, "cameras.bin"), cameras)
    write_images_bin(os.path.join(colmap_dir, "images.bin"), images)

    # Point cloud: voxel-downsample a provided dense ply, else seed with
    # camera centers (reference downsamples MatrixCity's depth-fused cloud,
    # matrix_city_to_colmap.py:58-73).
    ply_in = os.path.join(scene_dir, "point_cloud.ply")
    if os.path.exists(ply_in):
        from dogs_tpu.data.ply import read_point_cloud

        xyz, rgb = read_point_cloud(ply_in)
        xyz = (TO_MANHATTAN_WORLD @ xyz.T).T
        vox = np.floor(xyz / 0.5)
        _, keep = np.unique(vox, axis=0, return_index=True)
        xyz, rgb = xyz[keep], (rgb[keep] * 255).astype(np.uint8)
    else:
        xyz = np.stack([-(im.rotation().T @ im.tvec) for im in images.values()])
        rgb = np.full((len(xyz), 3), 128, np.uint8)
    write_points3d_bin(os.path.join(colmap_dir, "points3D.bin"), xyz, rgb)
    print(f"{scene_dir}: {len(images)} images, {len(cameras)} cameras, "
          f"{len(xyz)} points -> {colmap_dir}")


if __name__ == "__main__":
    convert(sys.argv[1], sys.argv[2:] or None)
