"""VastGaussian decoupled appearance embedding ("mask" network).

Capability parity with the reference's AppearanceEmbedding
(conerf/model/gaussian_fields/masks.py:8-54, trained at
conerf/trainers/gaussian_trainer.py:392-401): a per-image 64-d embedding is
broadcast-concatenated onto the x32-downsampled render, pushed through a
small conv + PixelShuffle-upsample CNN, and produces a 3-channel
MULTIPLICATIVE transform map. The training loss uses
L1(render * mask, gt) + lambda_mask * mean((mask - 1)^2).

Implemented as a plain parameter pytree + pure apply function (jit/vmap/grad
friendly, no module framework): convs run in NHWC on the MXU; PixelShuffle is
a reshape/transpose.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

DOWNSAMPLE = 32
EMBED_DIM = 64
HIDDEN = 128
UPSTAGES = 4  # 4 x PixelShuffle(2) = x16, then bilinear x2 to full res


def init_appearance_params(
    num_images: int, rng: np.random.RandomState | None = None
) -> dict:
    rng = rng or np.random.RandomState(0)

    def conv(cin, cout, k=3):
        w = rng.randn(k, k, cin, cout).astype(np.float32) * np.sqrt(
            2.0 / (k * k * cin)
        )
        return {"w": jnp.asarray(w), "b": jnp.zeros((cout,), jnp.float32)}

    params = {
        "embed": jnp.asarray(
            rng.randn(num_images, EMBED_DIM).astype(np.float32) * 0.01
        ),
        "conv_in": conv(3 + EMBED_DIM, HIDDEN),
        "head": conv(HIDDEN, 3, k=1),
    }
    for i in range(UPSTAGES):
        params[f"up{i}"] = conv(HIDDEN, HIDDEN * 4)
    return params


def _conv(x, p, stride=1):
    dn = jax.lax.conv_dimension_numbers(
        x.shape, p["w"].shape, ("NHWC", "HWIO", "NHWC")
    )
    k = p["w"].shape[0]
    pad = k // 2
    return (
        jax.lax.conv_general_dilated(
            x, p["w"], (stride, stride), [(pad, pad), (pad, pad)],
            dimension_numbers=dn,
        )
        + p["b"]
    )


def _pixel_shuffle(x: jnp.ndarray, r: int = 2) -> jnp.ndarray:
    """(B, H, W, C*r^2) -> (B, H*r, W*r, C)."""
    b, h, w, c = x.shape
    c_out = c // (r * r)
    x = x.reshape(b, h, w, r, r, c_out)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h * r, w * r, c_out)


def apply_appearance(
    params: dict, image: jnp.ndarray, image_index: jnp.ndarray
) -> jnp.ndarray:
    """Render (H, W, 3) -> multiplicative mask (H, W, 3), centered at 1."""
    h, w, _ = image.shape
    hd, wd = max(h // DOWNSAMPLE, 1), max(w // DOWNSAMPLE, 1)
    ds = jax.image.resize(image, (hd, wd, 3), "bilinear")
    e = params["embed"][image_index]
    x = jnp.concatenate(
        [ds, jnp.broadcast_to(e, (hd, wd, EMBED_DIM))], axis=-1
    )[None]
    x = jax.nn.relu(_conv(x, params["conv_in"]))
    for i in range(UPSTAGES):
        x = _pixel_shuffle(_conv(x, params[f"up{i}"]))
        x = jax.nn.relu(x)
    x = _conv(x, params["head"])[0]
    x = jax.image.resize(x, (h, w, 3), "bilinear")
    # Residual around identity: regularizer mean((mask-1)^2) pulls to 1.
    return 1.0 + x


def appearance_loss_terms(
    mask: jnp.ndarray, render: jnp.ndarray, gt: jnp.ndarray, lambda_mask: float
):
    """(masked L1, mask regularizer) — gaussian_trainer.py:392-401."""
    l1 = jnp.mean(jnp.abs(render * mask - gt))
    reg = lambda_mask * jnp.mean((mask - 1.0) ** 2)
    return l1, reg
