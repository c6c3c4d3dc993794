"""Dataset converters: synthesize toy Mega-NeRF / MatrixCity inputs and
verify the emitted COLMAP model round-trips with consistent poses."""

import importlib.util
import json
import os
import sys

import numpy as np

from dogs_tpu.data.colmap import load_model

ROOT = os.path.join(os.path.dirname(__file__), "..")


def _load(name):
    path = os.path.join(ROOT, "scripts", "preprocess", f"{name}.py")
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_meganerf_converter(tmp_path):
    import torch

    conv = _load("meganerf_to_colmap")
    scene = tmp_path / "rubble"
    rng = np.random.RandomState(0)
    names = []
    for split, count in [("train", 4), ("val", 2)]:
        md = scene / split / "metadata"
        md.mkdir(parents=True)
        for i in range(count):
            # Random valid c2w in DRB convention.
            q = rng.randn(4)
            q /= np.linalg.norm(q)
            w, x, y, z = q
            R = np.array([
                [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
                [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
                [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
            ])
            c2w = np.concatenate([R, rng.randn(3, 1)], axis=1)
            torch.save(
                {
                    "c2w": torch.tensor(c2w, dtype=torch.float32),
                    "intrinsics": torch.tensor([500.0, 500.0, 320.0, 240.0]),
                    "W": 640, "H": 480,
                },
                md / f"{split}_{i:03d}.pt",
            )
            names.append((f"{split}_{i:03d}", f"{split}_{i:03d}.jpg"))
    with open(scene / "mappings.txt", "w") as f:
        for meta, img in names:
            f.write(f"{img},{meta}\n")

    conv.convert(str(tmp_path), "rubble")
    model = load_model(str(scene / "sparse" / "0"))
    assert len(model.images) == 6
    assert model.cameras[1].fx == 500.0
    # Rotations orthonormal after all the axis shuffles.
    for im in model.images.values():
        R = im.rotation()
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)
    val = (scene / "val_images.txt").read_text().split()
    assert len(val) == 2 and all(v.startswith("val") for v in val)


def test_matrix_city_converter(tmp_path):
    conv = _load("matrix_city_to_colmap")
    scene = tmp_path / "small_city"
    scene.mkdir()
    rng = np.random.RandomState(1)
    frames = []
    for i in range(5):
        c2w = np.eye(4)
        # Simple rotation about z + translation.
        th = rng.rand() * 2 * np.pi
        c2w[:2, :2] = [[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]]
        c2w[:3, 3] = rng.randn(3)
        frames.append(
            {"file_path": f"../../aerial/block_1/im_{i}.png",
             "transform_matrix": c2w.tolist()}
        )
    meta = {"fl_x": 400.0, "fl_y": 400.0, "cx": 250.0, "cy": 250.0,
            "w": 500, "h": 500, "frames": frames}
    with open(scene / "transforms.json", "w") as f:
        json.dump(meta, f)

    conv.convert(str(scene))
    model = load_model(str(scene / "sparse" / "0"))
    assert len(model.images) == 5
    assert model.cameras[1].model == "SIMPLE_PINHOLE"
    assert model.images[1].name == "aerial/block_1/im_0.png"
    for im in model.images.values():
        R = im.rotation()
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)
    # Seeded points exist (camera centers fallback).
    assert model.points_xyz.shape[0] == 5
