"""Evaluation metrics: PSNR, SSIM, LPIPS, color correction.

Capability parity with the reference's metric stack
(conerf/evaluators/evaluator.py:22-107): PSNR/SSIM/LPIPS plus the
per-channel quadratic color-correction warp applied before metrics on
appearance-varying scenes.

LPIPS: the reference uses the `lpips` pip package (AlexNet). That package
and pretrained torchvision weights are unavailable offline, so this module
implements the LPIPS-AlexNet architecture in pure JAX and loads calibration
weights from an .npz when provided (`DOGS_TPU_LPIPS_WEIGHTS` env or
argument). Without weights it falls back to a normalized-feature distance
with random fixed filters — still a perceptual-ish distance, clearly flagged
as uncalibrated in the metric name.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from dogs_tpu.raster.ssim import ssim as ssim_fn


def psnr(pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    mse = jnp.mean((pred - gt) ** 2)
    return -10.0 * jnp.log(jnp.maximum(mse, 1e-12)) / jnp.log(10.0)


def ssim(pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    return ssim_fn(pred, gt)


def color_correct(
    img: jnp.ndarray, ref: jnp.ndarray, num_iters: int = 5, eps: float = 0.5 / 255
) -> jnp.ndarray:
    """Full quadratic cross-channel color warp fitted to the reference image,
    matching the semantics of conerf/evaluators/evaluator.py:22-66: the basis
    is [img_c * img_{c..C} (upper-triangular quadratic), img, 1] (10 terms
    for RGB), least-squares fitted per output channel with saturated pixels
    masked out of the fit — saturated meaning outside [eps, 1-eps] in the
    original input, the current estimate, or the reference. Because the
    saturation set changes as the estimate updates, fit+apply repeats
    num_iters times. Output is clipped to [0, 1] each iteration (so exactly
    0/1 pixels are representable, unlike an [eps, 1-eps] clamp)."""
    nc = img.shape[-1]
    if ref.shape[-1] != nc:
        raise ValueError(f"channel mismatch: img {nc} vs ref {ref.shape[-1]}")
    orig = img.reshape(-1, nc)
    ref_mat = ref.reshape(-1, nc)

    def unclipped(z):
        return (z >= eps) & (z <= 1.0 - eps)

    mask0 = unclipped(orig)
    cur = orig
    for _ in range(num_iters):
        basis = [cur[:, c : c + 1] * cur[:, c:] for c in range(nc)]
        basis.append(cur)
        basis.append(jnp.ones_like(cur[:, :1]))
        a = jnp.concatenate(basis, axis=-1)
        cols = []
        for c in range(nc):
            b = ref_mat[:, c]
            m = mask0[:, c] & unclipped(cur[:, c]) & unclipped(b)
            am = jnp.where(m[:, None], a, 0.0)
            bm = jnp.where(m, b, 0.0)
            w, *_ = jnp.linalg.lstsq(am, bm, rcond=-1)
            cols.append(w)
        warp = jnp.stack(cols, axis=-1)
        cur = jnp.clip(a @ warp, 0.0, 1.0)
    return cur.reshape(img.shape)


# ---------------------------------------------------------------------------
# LPIPS (AlexNet feature distance)
# ---------------------------------------------------------------------------

_ALEX_CFG = [
    # (out_channels, kernel, stride, padding)
    (64, 11, 4, 2),
    (192, 5, 1, 2),
    (384, 3, 1, 1),
    (256, 3, 1, 1),
    (256, 3, 1, 1),
]
_POOL_AFTER = {0, 1}  # maxpool after conv1 and conv2 (and 4, unused by lpips taps)
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def _default_lpips_params(seed: int = 0):
    """Random fixed filters (uncalibrated fallback)."""
    rng = np.random.RandomState(seed)
    params = []
    cin = 3
    for cout, k, _, _ in _ALEX_CFG:
        w = rng.randn(k, k, cin, cout).astype(np.float32) * np.sqrt(2.0 / (k * k * cin))
        params.append({"w": w, "b": np.zeros((cout,), np.float32)})
        cin = cout
    lins = [np.abs(rng.randn(c, 1).astype(np.float32)) * 0.1
            for c in (64, 192, 384, 256, 256)]
    return params, lins


@functools.lru_cache(maxsize=1)
def _load_lpips_params(weights_path: str | None):
    if weights_path and os.path.exists(weights_path):
        data = np.load(weights_path)
        params = []
        for i in range(5):
            params.append({"w": data[f"conv{i}_w"], "b": data[f"conv{i}_b"]})
        lins = [data[f"lin{i}"] for i in range(5)]
        return params, lins, True
    params, lins = _default_lpips_params()
    return params, lins, False


def _alex_features(x: jnp.ndarray, params) -> list[jnp.ndarray]:
    """x: (B, H, W, 3) in [-1, 1] (lpips scaling applied by caller)."""
    feats = []
    h = x
    for i, (cout, k, stride, pad) in enumerate(_ALEX_CFG):
        w = jnp.asarray(params[i]["w"])
        b = jnp.asarray(params[i]["b"])
        dn = jax.lax.conv_dimension_numbers(h.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
        h = jax.lax.conv_general_dilated(
            h, w, (stride, stride), [(pad, pad), (pad, pad)], dimension_numbers=dn
        ) + b
        h = jax.nn.relu(h)
        feats.append(h)
        if i in _POOL_AFTER:
            h = jax.lax.reduce_window(
                h, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1), "VALID"
            )
    return feats


def lpips(
    pred: jnp.ndarray,
    gt: jnp.ndarray,
    weights_path: str | None = None,
) -> tuple[jnp.ndarray, bool]:
    """LPIPS distance; returns (value, calibrated). Inputs (H, W, 3) in [0,1].

    calibrated=False means the fallback random-filter variant is in use
    (no pretrained weights available in this environment).
    """
    weights_path = weights_path or os.environ.get("DOGS_TPU_LPIPS_WEIGHTS")
    params, lins, calibrated = _load_lpips_params(weights_path)

    def prep(im):
        im = im * 2.0 - 1.0
        return ((im - _SHIFT) / _SCALE)[None]

    fa = _alex_features(prep(pred), params)
    fb = _alex_features(prep(gt), params)
    total = jnp.float32(0.0)
    for a, b, lin in zip(fa, fb, lins):
        a = a / jnp.maximum(jnp.linalg.norm(a, axis=-1, keepdims=True), 1e-10)
        b = b / jnp.maximum(jnp.linalg.norm(b, axis=-1, keepdims=True), 1e-10)
        d = (a - b) ** 2
        w = jnp.asarray(lin).reshape(1, 1, 1, -1)
        total = total + jnp.mean(jnp.sum(d * w, axis=-1))
    return total, calibrated
