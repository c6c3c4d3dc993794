"""ctypes bindings for the native COLMAP parser (dogs_tpu/native/colmap_fast.c).

Builds on demand with the system compiler (scripts/build_native.sh does the
same ahead of time); every entry point has a pure-Python fallback so the
framework works without a toolchain.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess

import numpy as np

logger = logging.getLogger(__name__)

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "native")
_SRC = os.path.join(_NATIVE_DIR, "colmap_fast.c")
_LIB = os.path.join(_NATIVE_DIR, "libcolmap_fast.so")
_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    try:
        if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
            subprocess.run(
                ["gcc", "-O3", "-shared", "-fPIC", "-o", _LIB, _SRC],
                check=True, capture_output=True,
            )
        lib = ctypes.CDLL(_LIB)
        lib.parse_points3d.restype = ctypes.c_long
        lib.parse_images.restype = ctypes.c_long
        _lib = lib
        logger.debug("native colmap parser loaded")
    except Exception as e:  # pragma: no cover - toolchain-less environments
        logger.info("native colmap parser unavailable (%s); using python path", e)
        _lib = None
    return _lib


def _as_ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.c_void_p)


def read_points3d_bin_fast(path: str):
    """(xyz f64 (P,3), rgb u8 (P,3), err f64 (P,)) or None if unavailable."""
    lib = _load()
    if lib is None:
        return None
    with open(path, "rb") as f:
        data = f.read()
    if len(data) < 8:
        return None
    n = int(np.frombuffer(data[:8], np.uint64)[0])
    xyz = np.empty((n, 3), np.float64)
    rgb = np.empty((n, 3), np.uint8)
    err = np.empty((n,), np.float64)
    buf = (ctypes.c_char * len(data)).from_buffer_copy(data)
    got = lib.parse_points3d(
        buf, ctypes.c_long(len(data)), ctypes.c_long(n),
        _as_ptr(xyz), _as_ptr(rgb), _as_ptr(err),
    )
    if got != n:
        logger.warning("native points3D parse mismatch (%d vs %d)", got, n)
        return None
    return xyz, rgb, err


def read_images_bin_fast(path: str):
    """dict[image_id -> (qvec, tvec, camera_id, name)] or None."""
    lib = _load()
    if lib is None:
        return None
    with open(path, "rb") as f:
        data = f.read()
    if len(data) < 8:
        return None
    n = int(np.frombuffer(data[:8], np.uint64)[0])
    qvec = np.empty((n, 4), np.float64)
    tvec = np.empty((n, 3), np.float64)
    cam_id = np.empty((n,), np.int32)
    img_id = np.empty((n,), np.int32)
    name_cap = len(data)  # upper bound
    name_buf = ctypes.create_string_buffer(name_cap)
    buf = (ctypes.c_char * len(data)).from_buffer_copy(data)
    got = lib.parse_images(
        buf, ctypes.c_long(len(data)), ctypes.c_long(n),
        _as_ptr(qvec), _as_ptr(tvec), _as_ptr(cam_id), _as_ptr(img_id),
        name_buf, ctypes.c_long(name_cap),
    )
    if got != n:
        logger.warning("native images parse mismatch (%d vs %d)", got, n)
        return None
    names = name_buf.raw.split(b"\x00")[:n]
    return {
        int(img_id[i]): (qvec[i].copy(), tvec[i].copy(), int(cam_id[i]),
                         names[i].decode("utf-8"))
        for i in range(n)
    }
