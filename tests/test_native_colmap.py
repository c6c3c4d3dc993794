"""Native C COLMAP parser vs the pure-Python fallback (with real tracks)."""

import os
import struct

import numpy as np
import pytest

from dogs_tpu.data import native
from dogs_tpu.data.colmap import _Reader  # python fallback internals


def write_points3d_with_tracks(path, xyz, rgb, err, track_lens, rng):
    with open(path, "wb") as f:
        f.write(struct.pack("<Q", len(xyz)))
        for i in range(len(xyz)):
            f.write(struct.pack("<Q", i + 7))
            f.write(np.asarray(xyz[i], np.float64).tobytes())
            f.write(np.asarray(rgb[i], np.uint8).tobytes())
            f.write(struct.pack("<d", float(err[i])))
            tl = int(track_lens[i])
            f.write(struct.pack("<Q", tl))
            f.write(rng.randint(0, 100, 2 * tl).astype(np.int32).tobytes())


def write_images_with_obs(path, n, rng):
    with open(path, "wb") as f:
        f.write(struct.pack("<Q", n))
        for i in range(n):
            f.write(struct.pack("<i", i + 1))
            q = rng.randn(4)
            q /= np.linalg.norm(q)
            f.write(q.astype(np.float64).tobytes())
            f.write(rng.randn(3).astype(np.float64).tobytes())
            f.write(struct.pack("<i", 1 + i % 2))
            f.write(f"dir/im_{i:04d}.jpg".encode() + b"\x00")
            n_obs = int(rng.randint(0, 5))
            f.write(struct.pack("<Q", n_obs))
            f.write(rng.randn(n_obs * 3).astype(np.float64).tobytes())
    return [f"dir/im_{i:04d}.jpg" for i in range(n)]


@pytest.fixture()
def skip_without_native():
    if native._load() is None:
        pytest.skip("no C toolchain in this environment")


def test_native_points3d_matches_python(tmp_path, skip_without_native):
    rng = np.random.RandomState(0)
    n = 500
    xyz = rng.randn(n, 3)
    rgb = rng.randint(0, 255, (n, 3)).astype(np.uint8)
    err = rng.rand(n)
    tracks = rng.randint(0, 9, n)
    path = str(tmp_path / "points3D.bin")
    write_points3d_with_tracks(path, xyz, rgb, err, tracks, rng)

    fast = native.read_points3d_bin_fast(path)
    assert fast is not None
    fxyz, frgb, ferr = fast
    np.testing.assert_allclose(fxyz, xyz)
    np.testing.assert_array_equal(frgb, rgb)
    np.testing.assert_allclose(ferr, err)


def test_native_images_matches_written(tmp_path, skip_without_native):
    rng = np.random.RandomState(1)
    path = str(tmp_path / "images.bin")
    names = write_images_with_obs(path, 40, rng)
    fast = native.read_images_bin_fast(path)
    assert fast is not None
    assert len(fast) == 40
    for i in range(40):
        q, t, cid, name = fast[i + 1]
        assert name == names[i]
        assert cid == 1 + i % 2
        np.testing.assert_allclose(np.linalg.norm(q), 1.0, atol=1e-9)


def test_truncated_file_rejected(tmp_path, skip_without_native):
    rng = np.random.RandomState(2)
    path = str(tmp_path / "points3D.bin")
    write_points3d_with_tracks(
        path, rng.randn(10, 3), rng.randint(0, 255, (10, 3)).astype(np.uint8),
        rng.rand(10), rng.randint(1, 5, 10), rng,
    )
    data = open(path, "rb").read()
    with open(path, "wb") as f:
        f.write(data[:-9])  # chop mid-record
    assert native.read_points3d_bin_fast(path) is None
