"""The Gaussian field parameter pytree.

TPU-native replacement for the reference's `GaussianSplatModel` tensor
container (conerf/model/gaussian_fields/gaussian_splat_model.py:120-153): the
six optimizable SoA tensors live in an immutable flax.struct pytree with pure
activation functions. Dynamic Gaussian counts (densify/split/prune) are
handled with FIXED-CAPACITY padded buffers + an alive mask so every jitted
step has static shapes; capacity grows in power-of-two buckets at host sync
points (see dogs_tpu/fields/model.py).

Storage (pre-activation, matching the reference parameterization):
  xyz            (C, 3)      world position
  feat_dc        (C, 1, 3)   SH DC coefficients
  feat_rest      (C, K-1, 3) higher SH coefficients, K = (max_sh_degree+1)^2
  log_scale      (C, 3)      log of per-axis extent          -> exp
  quat           (C, 4)      wxyz rotation, unnormalized     -> normalize
  logit_opacity  (C, 1)      opacity logit                   -> sigmoid
"""

from __future__ import annotations

import flax.struct
import jax
import jax.numpy as jnp


@flax.struct.dataclass
class GaussianParams:
    xyz: jnp.ndarray
    feat_dc: jnp.ndarray
    feat_rest: jnp.ndarray
    log_scale: jnp.ndarray
    quat: jnp.ndarray
    logit_opacity: jnp.ndarray

    @property
    def capacity(self) -> int:
        return self.xyz.shape[0]

    @property
    def max_sh_degree(self) -> int:
        k = 1 + self.feat_rest.shape[1]
        return int(round(k**0.5)) - 1

    @property
    def scale(self) -> jnp.ndarray:
        """Linear per-axis scales (gaussian_splat_model.py:147 scaling_activation)."""
        return jnp.exp(self.log_scale)

    @property
    def opacity(self) -> jnp.ndarray:
        """Opacity in (0,1) (sigmoid activation, gaussian_splat_model.py:151)."""
        return jax.nn.sigmoid(self.logit_opacity)

    @property
    def features(self) -> jnp.ndarray:
        """(C, K, 3) full SH coefficient stack."""
        return jnp.concatenate([self.feat_dc, self.feat_rest], axis=1)

    def astuple(self):
        return (
            self.xyz,
            self.feat_dc,
            self.feat_rest,
            self.log_scale,
            self.quat,
            self.logit_opacity,
        )


def inverse_sigmoid(x: jnp.ndarray) -> jnp.ndarray:
    """Logit; used for opacity init/reset (gaussian_splat_model.py:26-31)."""
    return jnp.log(x / (1.0 - x))


def empty_params(capacity: int, max_sh_degree: int = 3, dtype=jnp.float32) -> GaussianParams:
    """Zero-initialized padded parameter buffers."""
    k = (max_sh_degree + 1) ** 2
    return GaussianParams(
        xyz=jnp.zeros((capacity, 3), dtype),
        feat_dc=jnp.zeros((capacity, 1, 3), dtype),
        feat_rest=jnp.zeros((capacity, k - 1, 3), dtype),
        log_scale=jnp.full((capacity, 3), -10.0, dtype),
        quat=jnp.concatenate(
            [jnp.ones((capacity, 1), dtype), jnp.zeros((capacity, 3), dtype)], axis=1
        ),
        logit_opacity=jnp.full((capacity, 1), -10.0, dtype),
    )


def round_up_capacity(n: int, min_capacity: int = 1024) -> int:
    """Quantize capacity to powers of two to bound recompilation count."""
    c = max(min_capacity, 1)
    while c < n:
        c *= 2
    return c


def pad_to_capacity(params: GaussianParams, capacity: int) -> GaussianParams:
    """Grow the padded buffers (new slots get inert defaults)."""
    cur = params.capacity
    assert capacity >= cur, (capacity, cur)
    if capacity == cur:
        return params
    pad = empty_params(capacity - cur, params.max_sh_degree, params.xyz.dtype)
    return jax.tree.map(lambda a, b: jnp.concatenate([a, b], axis=0), params, pad)
