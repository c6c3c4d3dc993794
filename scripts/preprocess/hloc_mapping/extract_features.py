"""Feature-extraction preset wrappers for the learned SfM pipeline.

The reference bundles a full hloc-style extractor module with a `confs`
preset table and a `main()` entry
(/root/reference/scripts/preprocess/hloc_mapping/extract_features.py:1-301).
The network weights themselves (SuperPoint, NetVLAD, DISK, ...) are
pretrained downloads that cannot ship in an offline environment, so this
module owns the CONFIG surface — the same preset names with canonical
hyperparameters — and delegates the actual inference to an installed
`hloc` (optional dependency; `pip install hloc` pulls the weights).

Every conf is a plain dict in hloc's schema, so it can be handed straight
to `hloc.extract_features.main`.
"""

from __future__ import annotations

# Local-feature presets (keypoints + descriptors).
confs = {
    "superpoint_aachen": {
        "output": "feats-superpoint-n4096-r1024",
        "model": {"name": "superpoint", "nms_radius": 3, "max_keypoints": 4096},
        "preprocessing": {"grayscale": True, "resize_max": 1024},
    },
    "superpoint_max": {
        "output": "feats-superpoint-n4096-rmax1600",
        "model": {"name": "superpoint", "nms_radius": 3, "max_keypoints": 4096},
        "preprocessing": {
            "grayscale": True, "resize_max": 1600, "resize_force": True,
        },
    },
    "superpoint_inloc": {
        "output": "feats-superpoint-n4096-r1600",
        "model": {"name": "superpoint", "nms_radius": 4, "max_keypoints": 4096},
        "preprocessing": {"grayscale": True, "resize_max": 1600},
    },
    "disk": {
        "output": "feats-disk",
        "model": {"name": "disk", "max_keypoints": 5000},
        "preprocessing": {"grayscale": False, "resize_max": 1600},
    },
    "sift": {
        "output": "feats-sift",
        "model": {"name": "dog"},
        "preprocessing": {"grayscale": True, "resize_max": 1600},
    },
    # Global-descriptor presets (retrieval).
    "netvlad": {
        "output": "global-feats-netvlad",
        "model": {"name": "netvlad"},
        "preprocessing": {"resize_max": 1024},
    },
    "openibl": {
        "output": "global-feats-openibl",
        "model": {"name": "openibl"},
        "preprocessing": {"resize_max": 1024},
    },
}


def main(conf, image_dir, export_dir, as_half=True, image_list=None,
         feature_path=None, overwrite=False):
    """Run extraction with an installed hloc; returns the feature h5 path."""
    try:
        from hloc import extract_features as _hloc_extract
    except ImportError as e:  # pragma: no cover - exercised via mocks
        raise SystemExit(
            "feature extraction needs `pip install hloc` (pretrained "
            "weights); classical alternative: scripts/preprocess/"
            "colmap_mapping.sh"
        ) from e
    return _hloc_extract.main(
        conf, image_dir, export_dir, as_half=as_half,
        image_list=image_list, feature_path=feature_path,
        overwrite=overwrite,
    )
