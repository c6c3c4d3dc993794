"""SSIM with an 11x11 Gaussian window — the fused-ssim equivalent.

Replaces both CUDA fused-ssim copies in the reference
(submodules/fused-ssim/ssim.cu and the bundled conv.cu:935-1011) and the
torch fallback (conerf/loss/ssim_torch.py:11-90). On TPU there is nothing to
hand-fuse: the separable depthwise convolution lowers to two small convs that
XLA fuses with the elementwise SSIM map math, and autodiff provides the
backward (the CUDA version hand-saves dm/dmu1 for a one-pass backward; XLA's
remat of two 1-D convs is cheaper than storing those residuals).

Matches the reference numerics: window sigma 1.5, C1=0.01^2, C2=0.03^2,
'same' padding (fused-ssim's default train-path configuration).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

_C1 = 0.01**2
_C2 = 0.03**2


@functools.lru_cache(maxsize=4)
def _gaussian_window(window_size: int, sigma: float) -> np.ndarray:
    x = np.arange(window_size) - window_size // 2
    g = np.exp(-(x**2) / (2.0 * sigma**2))
    return (g / g.sum()).astype(np.float32)


def _blur(x: jnp.ndarray, window_size: int, sigma: float) -> jnp.ndarray:
    """Separable depthwise Gaussian blur. x: (B, H, W, C), 'same' padding.

    Implemented as shifted weighted adds rather than grouped convolutions:
    depthwise (feature_group_count=C) convs lower poorly on TPU, while the
    shift-and-add form fuses into a single elementwise pass per axis (and
    its autodiff transpose is the same shape). Numerically identical to the
    zero-padded 'same' conv."""
    pad = window_size // 2
    w = _gaussian_window(window_size, sigma)

    def axis_blur(x, axis):
        widths = [(0, 0)] * x.ndim
        widths[axis] = (pad, pad)
        xp = jnp.pad(x, widths)
        n = x.shape[axis]
        return sum(
            float(w[k]) * jax.lax.slice_in_dim(xp, k, k + n, axis=axis)
            for k in range(window_size)
        )

    return axis_blur(axis_blur(x, 1), 2)


def ssim_map(
    img1: jnp.ndarray,
    img2: jnp.ndarray,
    window_size: int = 11,
    sigma: float = 1.5,
) -> jnp.ndarray:
    """Per-pixel SSIM map. Inputs (H, W, C) or (B, H, W, C) in [0, 1]."""
    squeeze = img1.ndim == 3
    if squeeze:
        img1, img2 = img1[None], img2[None]
    mu1 = _blur(img1, window_size, sigma)
    mu2 = _blur(img2, window_size, sigma)
    mu1_sq = mu1 * mu1
    mu2_sq = mu2 * mu2
    mu12 = mu1 * mu2
    sigma1_sq = _blur(img1 * img1, window_size, sigma) - mu1_sq
    sigma2_sq = _blur(img2 * img2, window_size, sigma) - mu2_sq
    sigma12 = _blur(img1 * img2, window_size, sigma) - mu12
    num = (2.0 * mu12 + _C1) * (2.0 * sigma12 + _C2)
    den = (mu1_sq + mu2_sq + _C1) * (sigma1_sq + sigma2_sq + _C2)
    out = num / den
    return out[0] if squeeze else out


def ssim(img1: jnp.ndarray, img2: jnp.ndarray, window_size: int = 11) -> jnp.ndarray:
    """Mean SSIM (the training-loss entry point, fused_ssim/__init__.py:34-41)."""
    return jnp.mean(ssim_map(img1, img2, window_size))


def dssim_loss(pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    """(1 - SSIM) used in the 3DGS photometric loss (gaussian_trainer.py:391)."""
    return 1.0 - ssim(pred, gt)
