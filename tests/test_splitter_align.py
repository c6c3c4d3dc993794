"""SceneSplitter clustering variants + trajectory alignment/ATE."""

import numpy as np

from dogs_tpu.core.align import (
    absolute_trajectory_error,
    align_ate_c2b_use_a2b,
    align_umeyama,
)
from dogs_tpu.data.splitter import SceneSplitter, clustering, kmeans


def _blobs(seed=0, k=3, n=40, spread=0.1):
    rng = np.random.RandomState(seed)
    centers = rng.randn(k, 3) * 5
    pts = np.concatenate(
        [centers[i] + rng.randn(n, 3) * spread for i in range(k)]
    )
    truth = np.repeat(np.arange(k), n)
    return pts, truth


def _agreement(labels, truth, k):
    # label-permutation-invariant accuracy via greedy matching
    best = 0
    import itertools

    for perm in itertools.permutations(range(k)):
        mapped = np.asarray([perm[l] for l in labels])
        best = max(best, (mapped == truth).mean())
    return best


def test_kmeans_recovers_blobs():
    pts, truth = _blobs(seed=1)
    labels, centers = kmeans(pts, 3, seed=0)
    assert centers.shape == (3, 3)
    assert _agreement(labels, truth, 3) > 0.95


def test_spectral_recovers_blobs():
    pts, truth = _blobs(seed=2, n=25)
    labels = clustering(pts, 3, method="Spectral")
    assert _agreement(labels, truth, 3) > 0.95


def test_scene_splitter_camera_mode(tmp_path):
    pts, truth = _blobs(seed=3, k=2, n=20)
    c2w = np.tile(np.eye(4)[None], (pts.shape[0], 1, 1))
    c2w[:, :3, 3] = pts
    labels = SceneSplitter().split(
        camtoworlds=c2w, num_blocks=2, method="KMeans", save_dir=str(tmp_path)
    )
    assert len(labels) == pts.shape[0]
    assert (tmp_path / "cluster.txt").exists()
    arr = np.asarray([labels[i] for i in range(len(labels))])
    assert _agreement(arr, truth, 2) > 0.95


def test_scene_splitter_point_mode():
    pts, _ = _blobs(seed=4, k=2, n=10)
    # images 0..3; points alternate between image groups
    p2i = [np.asarray([i % 4]) for i in range(pts.shape[0])]
    labels = SceneSplitter(point3d_image_ids=p2i).split(
        points3d=pts, split_type="point", num_blocks=2
    )
    assert set(labels) == {0, 1, 2, 3}


def test_umeyama_exact_recovery():
    rng = np.random.RandomState(5)
    data = rng.randn(30, 3)
    # random similarity
    q = np.linalg.qr(rng.randn(3, 3))[0]
    if np.linalg.det(q) < 0:
        q[:, 2] *= -1
    s_true, t_true = 2.5, np.array([1.0, -2.0, 0.5])
    model = s_true * data @ q.T + t_true
    s, r, t = align_umeyama(model, data)
    assert abs(s - s_true) < 1e-6
    np.testing.assert_allclose(r, q, atol=1e-6)
    np.testing.assert_allclose(t, t_true, atol=1e-6)


def test_ate_after_alignment_is_zero():
    rng = np.random.RandomState(6)
    n = 20
    gt = np.tile(np.eye(4)[None], (n, 1, 1))
    gt[:, :3, 3] = rng.randn(n, 3)
    q = np.linalg.qr(rng.randn(3, 3))[0]
    if np.linalg.det(q) < 0:
        q[:, 2] *= -1
    est = gt.copy()
    est[:, :3, :3] = q.T[None] @ gt[:, :3, :3]
    est[:, :3, 3] = (gt[:, :3, 3] - 0.7) @ q * (1 / 1.3)
    aligned, s, r, t = align_ate_c2b_use_a2b(est, gt)
    np.testing.assert_allclose(aligned[:, :3, 3], gt[:, :3, 3], atol=1e-5)
    m = absolute_trajectory_error(est, gt, align=True)
    assert m["ate_rmse"] < 1e-5
    m_raw = absolute_trajectory_error(est, gt, align=False)
    assert m_raw["ate_rmse"] > 0.1
