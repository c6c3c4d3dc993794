"""Incremental-mapping wrapper for the learned SfM pipeline.

The reference bundles a reconstruction driver that imports keypoints and
matches into a COLMAP database and runs pycolmap's incremental mapper with
tuned options
(/root/reference/scripts/preprocess/hloc_mapping/reconstruction.py).
This wrapper delegates to an installed hloc/pycolmap, exposing the same
knobs the reference's driver sets (min track length / num_matches,
ba refinement toggles).
"""

from __future__ import annotations


def mapper_options(min_track_length: int = 3, min_num_matches: int = 15):
    """The reference driver's non-default mapper options as a plain dict
    (pycolmap.IncrementalMapperOptions schema)."""
    return {
        "min_num_matches": int(min_num_matches),
        "ba_refine_focal_length": True,
        "ba_refine_principal_point": False,
        "ba_refine_extra_params": True,
        "min_model_size": 3,
    } | ({"min_track_length": int(min_track_length)} if min_track_length else {})


def main(sfm_dir, image_dir, pairs, features, matches,
         camera_mode=None, verbose=False, min_track_length=3,
         min_num_matches=15):
    """Run hloc's reconstruction with the reference driver's options;
    returns the pycolmap Reconstruction."""
    try:
        from hloc import reconstruction as _hloc_recon
    except ImportError as e:  # pragma: no cover - exercised via mocks
        raise SystemExit(
            "reconstruction needs `pip install hloc pycolmap`; classical "
            "alternative: scripts/preprocess/colmap_mapping.sh"
        ) from e
    kwargs = {}
    if camera_mode is not None:
        kwargs["camera_mode"] = camera_mode
    return _hloc_recon.main(
        sfm_dir, image_dir, pairs, features, matches,
        mapper_options=mapper_options(min_track_length, min_num_matches),
        verbose=verbose, **kwargs,
    )
