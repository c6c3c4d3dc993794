"""Block preprocessing CLI — parity with the reference's
preprocess_large_scale_data.py:13-76.

Loads a COLMAP scene, partitions cameras/points into an OBB-aligned mx x my
grid (equal camera counts per cell, expanded overlapping boxes), and writes
each block's manifest to <root>/blocks_{mx}x{my}/block_k/ for the
block-parallel ADMM trainer.
"""

from __future__ import annotations

import logging
import os

import numpy as np

from dogs_tpu.data.blocks import block_dir, partition_scene, save_block
from dogs_tpu.data.dataset import load_scene
from dogs_tpu.utils.config import config_parser, load_config

logging.basicConfig(level=logging.INFO)
logger = logging.getLogger("preprocess")


def synthetic_block_scene(config):
    """Deterministic in-memory scene for the synthetic block path (the same
    generator train_admm.py rebuilds for its val split)."""
    from dogs_tpu.data.dataset import CameraRecord
    from dogs_tpu.data.synthetic import make_scene

    scene = make_scene(
        n_gaussians=int(config.dataset.get("n_gaussians", 96)),
        n_cams=int(config.dataset.get("n_cams", 12)),
        width=int(config.dataset.get("width", 96)),
        height=int(config.dataset.get("height", 80)),
        seed=int(config.get("seed", 42)),
    )
    n_val = max(
        len(scene.cameras) // int(config.dataset.get("val_interval", 8)), 1
    )
    records = [
        CameraRecord(
            R=np.asarray(c.R), t=np.asarray(c.t),
            fx=float(c.fx), fy=float(c.fy), cx=float(c.cx), cy=float(c.cy),
            width=c.width, height=c.height, image_path="", image_index=i,
        )
        for i, c in enumerate(scene.cameras[n_val:])
    ]
    return scene, records, scene.images[n_val:], n_val


def preprocess_synthetic(config, scene_name: str) -> None:
    """Partition + write block manifests for a generated scene — lets the
    whole preprocess -> phase1 -> fusion -> ADMM CLI chain run without any
    dataset on disk (reference equivalent: preprocess_large_scale_data.py on
    a tiny COLMAP model)."""
    root = os.path.join(config.dataset.root_dir, scene_name)
    mx = int(config.dataset.get("mx", 2))
    my = int(config.dataset.get("my", 2))
    sf = config.dataset.get("bbox_scale_factor", [1.4, 1.4, 1.4])
    sc, records, images, _ = synthetic_block_scene(config)
    cam_pos = np.stack([r.center for r in records])
    part = partition_scene(cam_pos, sc.points, mx, my, sf[:2])

    out_root = os.path.dirname(block_dir(root, mx, my, 0))
    os.makedirs(out_root, exist_ok=True)
    np.save(os.path.join(out_root, "world_to_obb_transform.npy"), part.transform)
    # Reference table format (load_colmap.py:425-429): camera boxes first,
    # point boxes after — fusion crops by the POINT half.
    pb = part.point_bounds if part.point_bounds is not None else part.bounds
    pbe = (
        part.point_bounds_expanded
        if part.point_bounds_expanded is not None
        else part.bounds_expanded
    )
    np.savetxt(
        os.path.join(out_root, "bounding_boxes_origin.txt"),
        np.concatenate([part.bounds, pb]).reshape(2 * part.num_blocks, -1),
    )
    np.savetxt(
        os.path.join(out_root, "bounding_boxes.txt"),
        np.concatenate([part.bounds_expanded, pbe]).reshape(
            2 * part.num_blocks, -1
        ),
    )
    for k in range(part.num_blocks):
        sel = [i for i, lbl in enumerate(part.camera_labels) if lbl == k]
        mask = part.point_masks[k]
        save_block(
            block_dir(root, mx, my, k),
            [records[i] for i in sel],
            sc.points[mask],
            sc.colors[mask],
            part.bounds[k],
            part.bounds_expanded[k],
            part.transform,
            images=[images[i] for i in sel],
        )
        logger.info(
            "block %d: %d cameras, %d points", k, len(sel), int(mask.sum())
        )


def preprocess_scene(config, scene: str) -> None:
    if config.dataset.get("name", "") == "synthetic":
        return preprocess_synthetic(config, scene)
    root = os.path.join(config.dataset.root_dir, scene)
    mx = int(config.dataset.get("mx", 2))
    my = int(config.dataset.get("my", 2))
    sf = config.dataset.get("bbox_scale_factor", [1.4, 1.4, 1.4])
    # Same dataset options as the val loader (train_admm.load_val_split) —
    # the block poses and the val poses MUST share one normalization.
    data = load_scene(
        root,
        factor=int(config.dataset.get("factor", 1)),
        val_interval=int(config.dataset.get("val_interval", 8)),
        model_folder=config.dataset.get("model_folder", "sparse"),
        normalize=bool(config.dataset.get("scale", True)),
        use_manhattan_world=bool(
            config.dataset.get("use_manhattan_world", False)
        ),
        scene_name=scene,
        dataset_name=str(config.dataset.get("name", "")),
    )
    cam_pos = np.stack([c.center for c in data.train_cameras])
    part = partition_scene(
        cam_pos, data.points, mx, my, sf[:2],
        method=str(config.dataset.get("partition_method", "grid")),
        seed=int(config.get("seed", 42)),
    )

    # Save per-block manifests + the OBB transform / bbox tables
    # (load_colmap.py:402-450 side outputs).
    out_root = os.path.dirname(block_dir(root, mx, my, 0))
    os.makedirs(out_root, exist_ok=True)
    np.save(os.path.join(out_root, "world_to_obb_transform.npy"), part.transform)
    # Reference table format (load_colmap.py:425-429): camera boxes first,
    # point boxes after — fusion crops by the POINT half.
    pb = part.point_bounds if part.point_bounds is not None else part.bounds
    pbe = (
        part.point_bounds_expanded
        if part.point_bounds_expanded is not None
        else part.bounds_expanded
    )
    np.savetxt(
        os.path.join(out_root, "bounding_boxes_origin.txt"),
        np.concatenate([part.bounds, pb]).reshape(2 * part.num_blocks, -1),
    )
    np.savetxt(
        os.path.join(out_root, "bounding_boxes.txt"),
        np.concatenate([part.bounds_expanded, pbe]).reshape(
            2 * part.num_blocks, -1
        ),
    )

    for k in range(part.num_blocks):
        cams = [
            c for c, lbl in zip(data.train_cameras, part.camera_labels) if lbl == k
        ]
        mask = part.point_masks[k]
        save_block(
            block_dir(root, mx, my, k),
            cams,
            data.points[mask],
            data.colors[mask],
            part.bounds[k],
            part.bounds_expanded[k],
            part.transform,
        )
        logger.info(
            "block %d: %d cameras, %d points", k, len(cams), int(mask.sum())
        )


def main():
    args = config_parser().parse_args()
    config = load_config(args.config, cli_overrides=[o for o in args.opts if "=" in o])
    scenes = config.dataset.scene
    if args.scene:
        scenes = [args.scene]
    elif isinstance(scenes, str):
        scenes = [scenes]
    for scene in scenes:
        logger.info("=== partitioning %s ===", scene)
        preprocess_scene(config, scene)


if __name__ == "__main__":
    main()
