"""SSIM vs an independent scipy-based implementation."""

import jax
import jax.numpy as jnp
import numpy as np
from scipy.ndimage import gaussian_filter

from dogs_tpu.raster.ssim import dssim_loss, ssim, ssim_map


def _scipy_ssim(a, b, window_size=11, sigma=1.5):
    # Truncate the scipy gaussian to the same 11-tap support.
    trunc = (window_size // 2) / sigma

    def blur(x):
        return np.stack(
            [
                gaussian_filter(x[..., c], sigma, truncate=trunc, mode="constant")
                for c in range(x.shape[-1])
            ],
            -1,
        )

    c1, c2 = 0.01**2, 0.03**2
    mu1, mu2 = blur(a), blur(b)
    s1 = blur(a * a) - mu1 * mu1
    s2 = blur(b * b) - mu2 * mu2
    s12 = blur(a * b) - mu1 * mu2
    return ((2 * mu1 * mu2 + c1) * (2 * s12 + c2)) / (
        (mu1 * mu1 + mu2 * mu2 + c1) * (s1 + s2 + c2)
    )


def test_ssim_identical_images():
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(32, 48, 3).astype(np.float32))
    assert float(ssim(img, img)) > 0.9999
    assert abs(float(dssim_loss(img, img))) < 1e-4


def test_ssim_matches_scipy():
    rng = np.random.RandomState(1)
    a = rng.rand(40, 40, 3).astype(np.float32)
    b = np.clip(a + rng.randn(40, 40, 3).astype(np.float32) * 0.1, 0, 1)
    ours = np.asarray(ssim_map(jnp.asarray(a), jnp.asarray(b)))
    ref = _scipy_ssim(a, b)
    # Interior only (border handling differs: zero-pad both, but scipy's
    # normalized gaussian differs slightly at the margin).
    np.testing.assert_allclose(ours[8:-8, 8:-8], ref[8:-8, 8:-8], atol=1e-3)


def test_ssim_decreases_with_noise():
    rng = np.random.RandomState(2)
    a = jnp.asarray(rng.rand(64, 64, 3).astype(np.float32))
    noisy1 = jnp.clip(a + 0.05 * rng.randn(64, 64, 3).astype(np.float32), 0, 1)
    noisy2 = jnp.clip(a + 0.3 * rng.randn(64, 64, 3).astype(np.float32), 0, 1)
    assert float(ssim(a, noisy1)) > float(ssim(a, noisy2))


def test_ssim_differentiable():
    rng = np.random.RandomState(3)
    a = jnp.asarray(rng.rand(24, 24, 3).astype(np.float32))
    b = jnp.asarray(rng.rand(24, 24, 3).astype(np.float32))
    g = jax.grad(lambda x: dssim_loss(x, b))(a)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).sum() > 0
