"""Mega-NeRF -> COLMAP converter.

Capability parity with the reference converter
(scripts/preprocess/meganerf_to_colmap.py, ~205 LoC): reads Mega-NeRF's
per-image torch metadata (`train/metadata/*.pt` + `val/metadata/*.pt`, each
holding a DRB-convention c2w (3,4) and intrinsics [fx, fy, cx, cy]) plus the
`mappings.txt` (image name <-> metadata file), converts poses to COLMAP's
RDF world-to-camera convention, and writes a COLMAP model to sparse/0.

Mill-19 scenes (building, rubble) and UrbanScene3D follow this layout. The
val split is recorded to val_images.txt, which the dataset loader can use
as the Mega-NeRF-defined split (load_colmap.py:374-382 equivalent).

Usage: python scripts/preprocess/meganerf_to_colmap.py <data_dir> <scene>
"""

from __future__ import annotations

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

# Mega-NeRF stores poses in DRB (down-right-back); COLMAP wants RDF.
DRB_TO_RDF = np.array([[0, 1, 0], [1, 0, 0], [0, 0, -1]], np.float64)


def _rotmat_to_qvec(R: np.ndarray) -> np.ndarray:
    """(3,3) -> wxyz quaternion (no scipy dependency)."""
    import jax.numpy as jnp

    from dogs_tpu.core.transforms import rotmat_to_quat

    return np.asarray(rotmat_to_quat(jnp.asarray(R, jnp.float32)), np.float64)


def meganerf_c2w_to_colmap_w2c(c2w34: np.ndarray):
    """Apply the reference's axis shuffle then invert to world-to-camera."""
    c2w = np.eye(4)
    # Column swap: colmap x = -meganerf y, colmap y = meganerf x.
    c2w[:3, 0:1] = -c2w34[:, 1:2]
    c2w[:3, 1:2] = c2w34[:, 0:1]
    c2w[:3, 2:4] = c2w34[:, 2:4]
    c2w[:3, :3] = DRB_TO_RDF @ c2w[:3, :3] @ DRB_TO_RDF
    c2w[:3, 3:] = DRB_TO_RDF @ c2w[:3, 3:]
    w2c = np.linalg.inv(c2w)
    return _rotmat_to_qvec(w2c[:3, :3]), w2c[:3, 3]


def read_mappings(path: str) -> dict[str, str]:
    """mappings.txt lines: '<image_name>,<metadata_name>'."""
    out = {}
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            img, meta = line.split(",")
            out[meta.strip()] = img.strip()
    return out


def convert(data_dir: str, scene: str) -> None:
    import torch

    scene_dir = os.path.join(data_dir, scene)
    colmap_dir = os.path.join(scene_dir, "sparse", "0")
    os.makedirs(colmap_dir, exist_ok=True)
    meta_to_image = read_mappings(os.path.join(scene_dir, "mappings.txt"))

    cameras: dict[int, ColmapCamera] = {}
    images: dict[int, ColmapImage] = {}
    val_names: list[str] = []
    image_id = 0
    cam_key_to_id: dict[tuple, int] = {}

    for split in ["train", "val"]:
        meta_dir = os.path.join(scene_dir, split, "metadata")
        if not os.path.isdir(meta_dir):
            continue
        for fname in sorted(os.listdir(meta_dir)):
            if not fname.endswith(".pt"):
                continue
            md = torch.load(os.path.join(meta_dir, fname), map_location="cpu")
            c2w = np.asarray(md["c2w"], np.float64)
            fx, fy, cx, cy = (float(v) for v in md["intrinsics"])
            w, h = int(md["W"]), int(md["H"])
            key = (round(fx, 3), round(fy, 3), w, h)
            if key not in cam_key_to_id:
                cam_id = len(cam_key_to_id) + 1
                cam_key_to_id[key] = cam_id
                cameras[cam_id] = ColmapCamera(
                    cam_id, "PINHOLE", w, h, np.asarray([fx, fy, cx, cy])
                )
            qvec, tvec = meganerf_c2w_to_colmap_w2c(c2w)
            image_id += 1
            name = meta_to_image.get(fname.replace(".pt", ""), fname.replace(".pt", ".jpg"))
            images[image_id] = ColmapImage(
                image_id, qvec, tvec, cam_key_to_id[key], name
            )
            if split == "val":
                val_names.append(name)

    write_cameras_bin(os.path.join(colmap_dir, "cameras.bin"), cameras)
    write_images_bin(os.path.join(colmap_dir, "images.bin"), images)
    # Mega-NeRF ships no sparse points; seed with camera positions so scale
    # init has a cloud (users typically re-triangulate with COLMAP).
    centers = np.stack(
        [-(im.rotation().T @ im.tvec) for im in images.values()]
    )
    write_points3d_bin(
        os.path.join(colmap_dir, "points3D.bin"),
        centers,
        np.full((len(centers), 3), 128, np.uint8),
    )
    with open(os.path.join(scene_dir, "val_images.txt"), "w") as f:
        f.write("\n".join(val_names) + "\n")
    print(f"{scene}: {len(images)} images ({len(val_names)} val), "
          f"{len(cameras)} cameras -> {colmap_dir}")


if __name__ == "__main__":
    convert(sys.argv[1], sys.argv[2])
