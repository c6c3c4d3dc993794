"""Two-view geometry for the SfM pipeline: triangulation, cheirality,
essential-matrix decomposition, view-graph export.

Native numpy replacement for the geometry core of the reference hloc
pipeline (scripts/preprocess/hloc_mapping/utils.py:63-191 and
extract_relative_poses.py) — the reference leans on cv2.triangulatePoints
and torch; none of that is needed for host-side preprocessing math.
"""

from __future__ import annotations

import numpy as np


def triangulate_points(
    kps1: np.ndarray,
    kps2: np.ndarray,
    proj1: np.ndarray,
    proj2: np.ndarray,
) -> np.ndarray:
    """Linear (DLT) triangulation of matched pixel keypoints.

    kps1/kps2: (N, 2) pixel coords; proj1/proj2: (3, 4) projection
    matrices K[R|t]. Returns (N, 3) points."""
    n = kps1.shape[0]
    pts = np.empty((n, 3))
    for i in range(n):
        a = np.stack(
            [
                kps1[i, 0] * proj1[2] - proj1[0],
                kps1[i, 1] * proj1[2] - proj1[1],
                kps2[i, 0] * proj2[2] - proj2[0],
                kps2[i, 1] * proj2[2] - proj2[1],
            ]
        )
        _, _, vh = np.linalg.svd(a)
        x = vh[-1]
        pts[i] = x[:3] / x[3]
    return pts


def point_depth(extrinsic: np.ndarray, point3d: np.ndarray) -> float:
    """Signed depth of a world point in a camera (utils.py:91-96)."""
    homo = np.append(point3d, 1.0)
    proj_z = float(extrinsic[2] @ homo)
    return proj_z * float(np.linalg.norm(extrinsic[:, 2]))


def check_cheirality(
    kps1: np.ndarray,
    kps2: np.ndarray,
    extrinsic1: np.ndarray,
    extrinsic2: np.ndarray,
    k1: np.ndarray,
    k2: np.ndarray,
) -> np.ndarray:
    """Triangulate and keep points with positive bounded depth in BOTH
    cameras (utils.py:99-117)."""
    min_depth = 1e-16
    max_depth = 1000.0 * float(
        np.linalg.norm(extrinsic2[:3, :3].T @ extrinsic2[:, 3])
    )
    pts = triangulate_points(kps1, kps2, k1 @ extrinsic1, k2 @ extrinsic2)
    keep = []
    for p in pts:
        d1 = point_depth(extrinsic1, p)
        if not (min_depth < d1 < max_depth):
            continue
        d2 = point_depth(extrinsic2, p)
        if min_depth < d2 < max_depth:
            keep.append(p)
    return np.asarray(keep).reshape(-1, 3)


def decompose_essential_matrix(
    kps1: np.ndarray,
    kps2: np.ndarray,
    essential: np.ndarray,
    k1: np.ndarray,
    k2: np.ndarray,
) -> tuple[np.ndarray | None, np.ndarray | None]:
    """Recover the relative pose [R|t] (camera1 at [I|0]) from an essential
    matrix by testing the four candidate decompositions against cheirality
    (utils.py:120-191). Returns (extrinsic2 (3, 4), points3d) or (None, None).
    """
    w = np.array([[0.0, -1, 0], [1, 0, 0], [0, 0, 1]])
    u, _, vh = np.linalg.svd(essential)
    if np.linalg.det(u) < 0:
        u = -u
    if np.linalg.det(vh) < 0:
        vh = -vh
    r1 = u @ w @ vh
    r2 = u @ w.T @ vh
    t = u[:, 2] / np.linalg.norm(u[:, 2])

    ext1 = np.hstack([np.eye(3), np.zeros((3, 1))])
    best_pts, best_ext = np.zeros((0, 3)), None
    for r, tt in ((r1, t), (r2, t), (r1, -t), (r2, -t)):
        ext2 = np.hstack([r, tt[:, None]])
        pts = check_cheirality(kps1, kps2, ext1, ext2, k1, k2)
        if pts.shape[0] > best_pts.shape[0]:
            best_pts, best_ext = pts, ext2
    if best_ext is None or best_pts.shape[0] == 0:
        return None, None
    return best_ext, best_pts


def rotation_to_quaternion(r: np.ndarray) -> np.ndarray:
    """(3, 3) -> [qw, qx, qy, qz], unit norm."""
    tr = np.trace(r)
    if tr > 0:
        s = np.sqrt(tr + 1.0) * 2
        q = np.array(
            [0.25 * s, (r[2, 1] - r[1, 2]) / s, (r[0, 2] - r[2, 0]) / s,
             (r[1, 0] - r[0, 1]) / s]
        )
    elif r[0, 0] > r[1, 1] and r[0, 0] > r[2, 2]:
        s = np.sqrt(1.0 + r[0, 0] - r[1, 1] - r[2, 2]) * 2
        q = np.array(
            [(r[2, 1] - r[1, 2]) / s, 0.25 * s, (r[0, 1] + r[1, 0]) / s,
             (r[0, 2] + r[2, 0]) / s]
        )
    elif r[1, 1] > r[2, 2]:
        s = np.sqrt(1.0 + r[1, 1] - r[0, 0] - r[2, 2]) * 2
        q = np.array(
            [(r[0, 2] - r[2, 0]) / s, (r[0, 1] + r[1, 0]) / s, 0.25 * s,
             (r[1, 2] + r[2, 1]) / s]
        )
    else:
        s = np.sqrt(1.0 + r[2, 2] - r[0, 0] - r[1, 1]) * 2
        q = np.array(
            [(r[1, 0] - r[0, 1]) / s, (r[0, 2] + r[2, 0]) / s,
             (r[1, 2] + r[2, 1]) / s, 0.25 * s]
        )
    return q / np.linalg.norm(q)


def write_g2o_view_graph(
    path: str,
    relative_poses: dict[tuple[int, int], np.ndarray],
    num_images: int,
) -> None:
    """Write the pairwise view graph as a g2o file of VERTEX_SE3:QUAT
    (identity placeholders) + EDGE_SE3:QUAT rows — the artifact the
    reference's extract_relative_poses.main produces for pose-graph tools.
    relative_poses maps (i, j) -> (3, 4) extrinsic of j in i's frame."""
    with open(path, "w") as f:
        for i in range(num_images):
            f.write(f"VERTEX_SE3:QUAT {i} 0 0 0 0 0 0 1\n")
        info = " ".join(
            str(v)
            for v in np.triu(np.eye(6)).flatten()[
                np.triu_indices(6)[0] * 6 + np.triu_indices(6)[1]
            ]
        )
        for (i, j), ext in sorted(relative_poses.items()):
            q = rotation_to_quaternion(ext[:3, :3])
            t = ext[:, 3]
            # g2o order: tx ty tz qx qy qz qw
            f.write(
                f"EDGE_SE3:QUAT {i} {j} "
                f"{t[0]} {t[1]} {t[2]} {q[1]} {q[2]} {q[3]} {q[0]} {info}\n"
            )
