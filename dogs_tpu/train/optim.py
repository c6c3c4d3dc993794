"""Optimizers and LR schedules for Gaussian training.

Replaces the reference's `SparseGaussianAdam` CUDA optimizer
(cuda_rasterizer/adam.cu:9-66, SparseGaussianAdam wrapper in
diff_gaussian_rasterization/__init__.py:303-332) and the per-property-group
ExponentialLR schedule machinery (conerf/trainers/gaussian_trainer.py:32-62,
199-259). On TPU the "sparse" update is a masked `where` that XLA fuses into
one pass — no kernel needed.

Semantics mirrored exactly from adam.cu: per-Gaussian visibility-masked Adam
with b1=0.9, b2=0.999 and NO bias correction; moments of invisible Gaussians
are untouched.
"""

from __future__ import annotations

import flax.struct
import jax
import jax.numpy as jnp

from dogs_tpu.core.gaussians import GaussianParams


def exponential_lr(
    lr_init: float,
    lr_final: float,
    max_steps: int,
    lr_delay_steps: int = 0,
    lr_delay_mult: float = 1.0,
):
    """Log-linear decay lr(step), the ExponentialLR gamma^step schedule
    (conerf/utils/config.py:26 calc_exp_lr_decay_rate = (final/init)^(1/n)).

    Returns a pure function of the (traced) step.
    """
    lr_init = float(lr_init)
    lr_final = float(max(lr_final, 1e-32))

    def lr(step):
        t = jnp.clip(step / max_steps, 0.0, 1.0)
        log_lerp = jnp.exp(
            (1.0 - t) * jnp.log(lr_init) + t * jnp.log(lr_final)
        )
        if lr_delay_steps > 0:
            delay = lr_delay_mult + (1.0 - lr_delay_mult) * jnp.sin(
                0.5 * jnp.pi * jnp.clip(step / lr_delay_steps, 0.0, 1.0)
            )
        else:
            delay = 1.0
        return delay * log_lerp

    return lr


def constant_lr(value: float):
    def lr(step):
        del step
        return jnp.float32(value)

    return lr


@flax.struct.dataclass
class SparseAdamState:
    """First/second moments per parameter leaf (same pytree as the params)."""

    mu: GaussianParams
    nu: GaussianParams


def init_sparse_adam(params: GaussianParams) -> SparseAdamState:
    # mu and nu must be DISTINCT buffers: sharing one zeros pytree makes a
    # donating jit see the same buffer twice ("donate(a), donate(a)").
    return SparseAdamState(
        mu=jax.tree.map(jnp.zeros_like, params),
        nu=jax.tree.map(jnp.zeros_like, params),
    )


def sparse_adam_step(
    params: GaussianParams,
    grads: GaussianParams,
    state: SparseAdamState,
    visible: jnp.ndarray,
    lrs: GaussianParams,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-15,
) -> tuple[GaussianParams, SparseAdamState]:
    """One visibility-masked Adam step over all Gaussian property leaves.

    Args:
      visible: (C,) bool — Gaussians whose radii > 0 this step
        (gaussian_trainer.py:474-475 gates the step on the same mask).
      lrs: pytree matching params whose leaves are scalar learning rates
        (traced — schedules evaluate outside).
      eps: reference uses 1e-15 for the Gaussian params
        (gaussian_trainer.py setup_optimizer).
    """

    def leaf(p, g, m, v, lr):
        mask = visible.reshape((-1,) + (1,) * (p.ndim - 1))
        m_new = b1 * m + (1.0 - b1) * g
        v_new = b2 * v + (1.0 - b2) * g * g
        step = -lr * m_new / (jnp.sqrt(v_new) + eps)
        p_new = jnp.where(mask, p + step, p)
        return p_new, jnp.where(mask, m_new, m), jnp.where(mask, v_new, v)

    out = jax.tree.map(leaf, params, grads, state.mu, state.nu, lrs)
    new_params = jax.tree.map(lambda t: t[0], out, is_leaf=lambda x: isinstance(x, tuple))
    new_mu = jax.tree.map(lambda t: t[1], out, is_leaf=lambda x: isinstance(x, tuple))
    new_nu = jax.tree.map(lambda t: t[2], out, is_leaf=lambda x: isinstance(x, tuple))
    return new_params, SparseAdamState(mu=new_mu, nu=new_nu)


def adam_step(
    param: jnp.ndarray,
    grad: jnp.ndarray,
    mu: jnp.ndarray,
    nu: jnp.ndarray,
    lr,
    step: jnp.ndarray,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
):
    """Plain bias-corrected Adam for auxiliary params (exposure, appearance,
    pose): the reference uses torch.optim.Adam for these groups."""
    mu = b1 * mu + (1.0 - b1) * grad
    nu = b2 * nu + (1.0 - b2) * grad * grad
    t = step.astype(jnp.float32) + 1.0
    mu_hat = mu / (1.0 - b1**t)
    nu_hat = nu / (1.0 - b2**t)
    param = param - lr * mu_hat / (jnp.sqrt(nu_hat) + eps)
    return param, mu, nu
