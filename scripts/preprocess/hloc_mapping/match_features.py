"""Feature-matching preset wrappers for the learned SfM pipeline.

Same role as `extract_features.py` in this package: the reference bundles a
matcher module with a preset table
(/root/reference/scripts/preprocess/hloc_mapping/match_features.py:1-193);
here the presets live locally and the learned matchers run through an
installed `hloc` (optional dependency carrying the pretrained weights).
"""

from __future__ import annotations

confs = {
    "superglue": {
        "output": "matches-superglue",
        "model": {
            "name": "superglue",
            "weights": "outdoor",
            "sinkhorn_iterations": 50,
        },
    },
    "superglue-fast": {
        "output": "matches-superglue-it5",
        "model": {
            "name": "superglue",
            "weights": "outdoor",
            "sinkhorn_iterations": 5,
        },
    },
    "NN-superpoint": {
        "output": "matches-NN-mutual-dist.7",
        "model": {
            "name": "nearest_neighbor",
            "do_mutual_check": True,
            "distance_threshold": 0.7,
        },
    },
    "NN-ratio": {
        "output": "matches-NN-mutual-ratio.8",
        "model": {
            "name": "nearest_neighbor",
            "do_mutual_check": True,
            "ratio_threshold": 0.8,
        },
    },
    "NN-mutual": {
        "output": "matches-NN-mutual",
        "model": {"name": "nearest_neighbor", "do_mutual_check": True},
    },
    "adalam": {
        "output": "matches-adalam",
        "model": {"name": "adalam"},
    },
}


def main(conf, pairs, features, export_dir=None, matches=None,
         features_ref=None, overwrite=False):
    """Run matching with an installed hloc; returns the matches h5 path."""
    try:
        from hloc import match_features as _hloc_match
    except ImportError as e:  # pragma: no cover - exercised via mocks
        raise SystemExit(
            "feature matching needs `pip install hloc` (pretrained "
            "weights); classical alternative: scripts/preprocess/"
            "colmap_mapping.sh"
        ) from e
    return _hloc_match.main(
        conf, pairs, features, export_dir=export_dir, matches=matches,
        features_ref=features_ref, overwrite=overwrite,
    )
