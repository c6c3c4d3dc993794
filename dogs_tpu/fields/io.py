"""Gaussian field import/export: 3DGS .ply, antimatter15 .splat, COLMAP ply.

Capability parity with the reference's exporters
(gaussian_splat_model.py:616-709: save_ply / save_colmap_ply / save_splat and
load_ply). The .splat export feeds the bundled web viewer
(webui/src/loaders/SplatLoader.js) — format: 32 bytes per splat
[pos 3xf32 | scale 3xf32 | rgba 4xu8 | quat 4xu8], splats sorted by
volume x opacity descending so progressive loading shows big splats first.
"""

from __future__ import annotations

import numpy as np

from dogs_tpu.core.gaussians import GaussianParams, inverse_sigmoid
from dogs_tpu.core.sh import C0
from dogs_tpu.data.ply import read_ply, write_ply, write_point_cloud


def _alive_arrays(params: GaussianParams, alive=None):
    import jax.numpy as jnp

    mask = np.asarray(alive) if alive is not None else np.ones(params.capacity, bool)
    get = lambda a: np.asarray(a)[mask]
    return (
        get(params.xyz),
        get(params.feat_dc),
        get(params.feat_rest),
        get(params.log_scale),
        get(params.quat),
        get(params.logit_opacity),
    )


def save_gaussian_ply(path: str, params: GaussianParams, alive=None) -> None:
    """Standard 3DGS PLY layout (x y z nx ny nz f_dc_* f_rest_* opacity
    scale_* rot_*), consumable by every 3DGS viewer/tool."""
    xyz, fdc, frest, log_scale, quat, logit_op = _alive_arrays(params, alive)
    n = xyz.shape[0]
    props: dict[str, np.ndarray] = {
        "x": xyz[:, 0], "y": xyz[:, 1], "z": xyz[:, 2],
        "nx": np.zeros(n), "ny": np.zeros(n), "nz": np.zeros(n),
    }
    for i in range(3):
        props[f"f_dc_{i}"] = fdc[:, 0, i]
    # 3DGS stores rest features channel-major: (3, K-1) flattened.
    rest = frest.transpose(0, 2, 1).reshape(n, -1)
    for i in range(rest.shape[1]):
        props[f"f_rest_{i}"] = rest[:, i]
    props["opacity"] = logit_op[:, 0]
    for i in range(3):
        props[f"scale_{i}"] = log_scale[:, i]
    for i in range(4):
        props[f"rot_{i}"] = quat[:, i]
    write_ply(path, props)


def load_gaussian_ply(path: str) -> GaussianParams:
    """Inverse of save_gaussian_ply (gaussian_splat_model.py load_ply path)."""
    import jax.numpy as jnp

    p = read_ply(path)
    n = p["x"].shape[0]
    xyz = np.stack([p["x"], p["y"], p["z"]], -1).astype(np.float32)
    fdc = np.stack([p["f_dc_0"], p["f_dc_1"], p["f_dc_2"]], -1)[:, None, :]
    rest_names = sorted(
        (k for k in p if k.startswith("f_rest_")), key=lambda s: int(s.split("_")[-1])
    )
    if rest_names:
        rest = np.stack([p[k] for k in rest_names], -1).astype(np.float32)
        k_minus_1 = rest.shape[1] // 3
        rest = rest.reshape(n, 3, k_minus_1).transpose(0, 2, 1)
    else:
        rest = np.zeros((n, 0, 3), np.float32)
    log_scale = np.stack([p["scale_0"], p["scale_1"], p["scale_2"]], -1)
    quat = np.stack([p[f"rot_{i}"] for i in range(4)], -1)
    return GaussianParams(
        xyz=jnp.asarray(xyz),
        feat_dc=jnp.asarray(fdc, jnp.float32),
        feat_rest=jnp.asarray(rest),
        log_scale=jnp.asarray(log_scale, jnp.float32),
        quat=jnp.asarray(quat, jnp.float32),
        logit_opacity=jnp.asarray(p["opacity"], jnp.float32)[:, None],
    )


def save_splat(path: str, params: GaussianParams, alive=None) -> None:
    """antimatter15 .splat export (gaussian_splat_model.py:668-709)."""
    xyz, fdc, _, log_scale, quat, logit_op = _alive_arrays(params, alive)
    n = xyz.shape[0]
    scale = np.exp(log_scale)
    opacity = 1.0 / (1.0 + np.exp(-logit_op[:, 0]))
    # Sort by volume x opacity, descending.
    order = np.argsort(-(scale.prod(axis=-1) * opacity))

    rgb = np.clip(0.5 + C0 * fdc[:, 0, :], 0.0, 1.0)
    q = quat / np.maximum(np.linalg.norm(quat, axis=-1, keepdims=True), 1e-9)

    buf = np.empty((n, 32), np.uint8)
    buf[:, 0:12] = xyz[order].astype(np.float32).view(np.uint8).reshape(n, 12)
    buf[:, 12:24] = scale[order].astype(np.float32).view(np.uint8).reshape(n, 12)
    buf[:, 24:27] = np.clip(rgb[order] * 255.0, 0, 255).astype(np.uint8)
    buf[:, 27] = np.clip(opacity[order] * 255.0, 0, 255).astype(np.uint8)
    buf[:, 28:32] = np.clip(q[order] * 128.0 + 128.0, 0, 255).astype(np.uint8)
    with open(path, "wb") as f:
        f.write(buf.tobytes())


def load_splat(path: str) -> dict[str, np.ndarray]:
    """Parse a .splat file back (round-trip tests / tooling)."""
    raw = np.fromfile(path, np.uint8).reshape(-1, 32)
    return {
        "xyz": raw[:, 0:12].copy().view(np.float32).reshape(-1, 3),
        "scale": raw[:, 12:24].copy().view(np.float32).reshape(-1, 3),
        "rgba": raw[:, 24:28].astype(np.float32) / 255.0,
        "quat": (raw[:, 28:32].astype(np.float32) - 128.0) / 128.0,
    }


_KSPLAT_HEADER = 4096
_KSPLAT_SECTION_HEADER = 1024
_KSPLAT_BUCKET_SIZE = 256
_KSPLAT_BLOCK = 5.0
_KSPLAT_CSR = 32767  # compression scale range (level 1)


def save_ksplat(path: str, params: GaussianParams, alive=None) -> None:
    """GaussianSplats3D .ksplat export, compression level 1 (uint16
    bucket-relative centers + float16 scale/rotation, RGBA u8 color,
    degree-0 SH): 24 bytes/splat vs .splat's 32, and the format the
    reference ecosystem distributes (webui/util/create-ksplat.js +
    webui/src/loaders/ksplat/KSplatLoader.js). Single section; splats are
    grouped into 256-splat spatial buckets of 5.0-unit blocks, full buckets
    stored before partial ones as SplatBuffer.getBucketIndex requires."""
    xyz, fdc, _, log_scale, quat, logit_op = _alive_arrays(params, alive)
    n = xyz.shape[0]
    xyz = xyz.astype(np.float32)
    scale = np.exp(log_scale).astype(np.float32)
    opacity = 1.0 / (1.0 + np.exp(-logit_op[:, 0]))
    rgb = np.clip(0.5 + C0 * fdc[:, 0, :], 0.0, 1.0)
    q = quat / np.maximum(np.linalg.norm(quat, axis=-1, keepdims=True), 1e-9)

    # Spatial bucketing: cell = floor(xyz / block); each cell's splats split
    # into <=256-splat buckets whose stored center is the CELL center, so
    # every member offset fits the half-block uint16 range.
    cell = np.floor(xyz / _KSPLAT_BLOCK).astype(np.int64)
    _, cell_key = np.unique(cell, axis=0, return_inverse=True)
    order0 = np.argsort(cell_key, kind="stable")
    full_idx, part_idx, full_centers, part_centers, part_lens = [], [], [], [], []
    i = 0
    while i < n:
        j = i
        while j < n and cell_key[order0[j]] == cell_key[order0[i]]:
            j += 1
        members = order0[i:j]
        center = (cell[members[0]] + 0.5) * _KSPLAT_BLOCK
        for k in range(0, len(members), _KSPLAT_BUCKET_SIZE):
            chunk = members[k:k + _KSPLAT_BUCKET_SIZE]
            if len(chunk) == _KSPLAT_BUCKET_SIZE:
                full_idx.append(chunk)
                full_centers.append(center)
            else:
                part_idx.append(chunk)
                part_centers.append(center)
                part_lens.append(len(chunk))
        i = j
    order = np.concatenate(
        [np.concatenate(full_idx) if full_idx else np.empty(0, np.int64)]
        + ([np.concatenate(part_idx)] if part_idx else [])
    ).astype(np.int64)
    bucket_centers = np.asarray(full_centers + part_centers, np.float32).reshape(
        -1, 3)
    n_full, n_part = len(full_idx), len(part_idx)

    header = np.zeros(_KSPLAT_HEADER, np.uint8)
    h32 = header.view(np.uint32)
    h16 = header.view(np.uint16)
    hf = header.view(np.float32)
    header[0], header[1] = 0, 1  # version 0.1
    h32[1] = 1  # maxSectionCount
    h32[2] = 1  # sectionCount
    h32[3] = n  # maxSplatCount
    h32[4] = n  # splatCount
    h16[10] = 1  # compressionLevel
    hf[6:9] = xyz.mean(axis=0) if n else 0.0  # sceneCenter

    sec = np.zeros(_KSPLAT_SECTION_HEADER, np.uint8)
    s32 = sec.view(np.uint32)
    s16 = sec.view(np.uint16)
    sf = sec.view(np.float32)
    s32[1] = n  # maxSplatCount
    s32[2] = _KSPLAT_BUCKET_SIZE
    s32[3] = n_full + n_part  # bucketCount
    sf[4] = _KSPLAT_BLOCK
    s16[10] = 12  # bucketStorageSizeBytes (3 x f32)
    s32[6] = _KSPLAT_CSR
    s32[8] = n_full
    s32[9] = n_part
    s16[20] = 0  # sphericalHarmonicsDegree

    # Per-splat records (24 B, level 1 / degree 0):
    # [cx cy cz u16 | sx sy sz f16 | qw qx qy qz f16 | r g b a u8]
    csf = (_KSPLAT_BLOCK / 2.0) / _KSPLAT_CSR
    bucket_of = np.empty(n, np.int64)
    pos = 0
    for b, chunk in enumerate(full_idx + part_idx):
        bucket_of[pos:pos + len(chunk)] = b
        pos += len(chunk)
    rel = xyz[order] - bucket_centers[bucket_of]
    c16 = np.clip(np.round(rel / csf) + _KSPLAT_CSR, 0, 65535).astype(np.uint16)
    rec = np.zeros((n, 24), np.uint8)
    rec[:, 0:6] = c16.view(np.uint8).reshape(n, 6)
    rec[:, 6:12] = scale[order].astype(np.float16).view(np.uint8).reshape(n, 6)
    wxyz = q[order].astype(np.float16)  # stored order (w, x, y, z)
    rec[:, 12:20] = wxyz.view(np.uint8).reshape(n, 8)
    rec[:, 20:23] = np.clip(rgb[order] * 255.0, 0, 255).astype(np.uint8)
    rec[:, 23] = np.clip(opacity[order] * 255.0, 0, 255).astype(np.uint8)

    with open(path, "wb") as f:
        f.write(header.tobytes())
        f.write(sec.tobytes())
        f.write(np.asarray(part_lens, np.uint32).tobytes())
        f.write(bucket_centers.tobytes())
        f.write(rec.tobytes())


def load_ksplat(path: str) -> dict[str, np.ndarray]:
    """Parse a level-0/1 degree-0 .ksplat back (round-trip tests / tooling;
    numpy mirror of the web viewer's ksplatToSplat decode)."""
    raw = np.fromfile(path, np.uint8)
    h32 = raw[:_KSPLAT_HEADER].view(np.uint32)
    h16 = raw[:_KSPLAT_HEADER].view(np.uint16)
    max_sections, sections = int(h32[1]), int(h32[2])
    total = int(h32[4])
    lvl = int(h16[10])
    assert lvl in (0, 1), f"unsupported compression level {lvl}"
    out_xyz = np.empty((total, 3), np.float32)
    out_scale = np.empty((total, 3), np.float32)
    out_quat = np.empty((total, 4), np.float32)
    out_rgba = np.empty((total, 4), np.float32)
    base = _KSPLAT_HEADER + max_sections * _KSPLAT_SECTION_HEADER
    o = 0
    for s in range(sections):
        sh = raw[_KSPLAT_HEADER + s * _KSPLAT_SECTION_HEADER:]
        s32 = sh[:_KSPLAT_SECTION_HEADER].view(np.uint32)
        s16 = sh[:_KSPLAT_SECTION_HEADER].view(np.uint16)
        sfl = sh[:_KSPLAT_SECTION_HEADER].view(np.float32)
        max_splat = int(s32[1])
        bucket_size, bucket_count = int(s32[2]), int(s32[3])
        block = float(sfl[4])
        bucket_bytes = int(s16[10])
        csr = int(s32[6]) or (_KSPLAT_CSR if lvl else 1)
        n_full, n_part = int(s32[8]), int(s32[9])
        sh_deg = int(s16[20])
        assert sh_deg == 0, "load_ksplat reads degree-0 exports"
        bps = 44 if lvl == 0 else 24
        meta = raw[base:base + n_part * 4].view(np.uint32)
        bstart = base + n_part * 4
        centers = raw[bstart:bstart + bucket_bytes * bucket_count].view(
            np.float32).reshape(-1, 3)
        dstart = bstart + bucket_bytes * bucket_count
        n_here = min(max_splat, total - o)
        rec = raw[dstart:dstart + bps * max_splat].reshape(max_splat, bps)[:n_here]
        if lvl == 0:
            out_xyz[o:o + n_here] = rec[:, 0:12].copy().view(np.float32)
            out_scale[o:o + n_here] = rec[:, 12:24].copy().view(np.float32)
            wxyz = rec[:, 24:40].copy().view(np.float32)
            out_rgba[o:o + n_here] = rec[:, 40:44].astype(np.float32) / 255.0
        else:
            lens = ([bucket_size] * n_full) + list(meta)
            bucket_of = np.repeat(np.arange(len(lens)), lens)[:n_here]
            c16 = rec[:, 0:6].copy().view(np.uint16).astype(np.float32)
            csf = (block / 2.0) / csr
            out_xyz[o:o + n_here] = (c16 - csr) * csf + centers[bucket_of]
            out_scale[o:o + n_here] = rec[:, 6:12].copy().view(np.float16)
            wxyz = rec[:, 12:20].copy().view(np.float16).astype(np.float32)
            out_rgba[o:o + n_here] = rec[:, 20:24].astype(np.float32) / 255.0
        out_quat[o:o + n_here] = wxyz.reshape(n_here, 4)
        o += n_here
        base += n_part * 4 + bucket_bytes * bucket_count + bps * max_splat
    return {"xyz": out_xyz, "scale": out_scale, "quat": out_quat,
            "rgba": out_rgba}


def save_colmap_ply(path: str, params: GaussianParams, alive=None) -> None:
    """Point-cloud-only export (positions + DC color),
    gaussian_splat_model.py:642-666."""
    xyz, fdc, *_ = _alive_arrays(params, alive)
    rgb = np.clip(0.5 + C0 * fdc[:, 0, :], 0.0, 1.0)
    write_point_cloud(path, xyz, rgb)
