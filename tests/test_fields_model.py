"""Tests for fixed-capacity densify/split/clone/prune and sparse Adam."""

import jax
import jax.numpy as jnp
import numpy as np

from dogs_tpu.core.gaussians import GaussianParams, inverse_sigmoid
from dogs_tpu.fields.model import (
    GaussianModelState,
    densify_and_prune,
    init_from_points,
    prune_only,
    required_slots,
    reset_opacity,
    update_densify_stats,
)
from dogs_tpu.train.optim import (
    exponential_lr,
    init_sparse_adam,
    sparse_adam_step,
)


def small_state(n=8, capacity=32, opacity=0.5, scale=0.1):
    pts = jnp.asarray(np.random.RandomState(0).randn(n, 3), jnp.float32)
    state = init_from_points(pts, jnp.full((n, 3), 0.5), capacity, max_sh_degree=1)
    params = state.params.replace(
        log_scale=jnp.where(
            state.alive[:, None], jnp.log(jnp.full((capacity, 3), scale)),
            state.params.log_scale,
        ),
        logit_opacity=jnp.where(
            state.alive[:, None],
            inverse_sigmoid(jnp.full((capacity, 1), opacity)),
            state.params.logit_opacity,
        ),
    )
    return state.replace(params=params)


def test_init_from_points():
    pts = jnp.asarray([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]], jnp.float32)
    rgb = jnp.asarray([[1, 0, 0], [0, 1, 0], [0, 0, 1], [1, 1, 1]], jnp.float32)
    st = init_from_points(pts, rgb, capacity=16, max_sh_degree=2)
    assert int(st.num_alive) == 4
    # Scale = sqrt(mean 3NN dist^2): point 0 has 3 NN at distance 1.
    np.testing.assert_allclose(np.exp(st.params.log_scale[0]), 1.0, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(st.params.opacity[:4, 0]), 0.1, rtol=1e-5)


def test_stats_accumulation():
    st = small_state()
    g = jnp.ones((32, 2)) * 0.001
    radii = jnp.where(jnp.arange(32) < 4, 5.0, 0.0)
    st2 = update_densify_stats(st, g, radii, width=100, height=100)
    assert float(st2.denom[0]) == 1.0
    assert float(st2.denom[5]) == 0.0  # invisible
    # grad norm in NDC: 0.001 * 50 per axis -> norm = 0.0707
    np.testing.assert_allclose(float(st2.grad_accum[0]), np.hypot(0.05, 0.05), rtol=1e-5)
    assert float(st2.max_radii2d[0]) == 5.0


def test_clone_small_high_grad():
    st = small_state(n=8, capacity=32, scale=0.001)
    # Give gaussian 0 a high accumulated grad.
    st = st.replace(
        grad_accum=st.grad_accum.at[0].set(1.0), denom=st.denom.at[0].set(1.0)
    )
    st2, allocated, overflow = densify_and_prune(
        st, jax.random.PRNGKey(0), grad_threshold=0.5, min_opacity=0.005,
        scene_extent=1.0, max_screen_size=None,
    )
    assert int(overflow) == 0
    assert int(st2.num_alive) == 9  # one clone added
    slot = int(jnp.argmax(allocated))
    np.testing.assert_allclose(st2.params.xyz[slot], st.params.xyz[0], rtol=1e-6)


def test_split_large_high_grad():
    st = small_state(n=8, capacity=32, scale=0.5)  # large vs percent_dense*extent
    st = st.replace(
        grad_accum=st.grad_accum.at[1].set(1.0), denom=st.denom.at[1].set(1.0)
    )
    st2, allocated, overflow = densify_and_prune(
        st, jax.random.PRNGKey(1), grad_threshold=0.5, min_opacity=0.005,
        scene_extent=1.0, max_screen_size=None,
    )
    assert int(overflow) == 0
    # Parent killed, two children born: 8 - 1 + 2 = 9.
    assert int(st2.num_alive) == 9
    assert int(jnp.sum(allocated)) == 2
    slots = np.where(np.asarray(allocated))[0]
    # Children have scale / 1.6.
    np.testing.assert_allclose(
        np.exp(st2.params.log_scale[slots[0]]), 0.5 / 1.6, rtol=1e-4
    )
    # Children near parent (within 5 sigma).
    d = np.linalg.norm(
        np.asarray(st2.params.xyz[slots]) - np.asarray(st.params.xyz[1]), axis=-1
    )
    assert (d < 5 * 0.5 * np.sqrt(3)).all()


def test_prune_low_opacity():
    st = small_state(n=8, capacity=32, opacity=0.5)
    lo = st.params.logit_opacity.at[3].set(inverse_sigmoid(jnp.asarray([0.001])))
    st = st.replace(params=st.params.replace(logit_opacity=lo))
    st2, _, _ = densify_and_prune(
        st, jax.random.PRNGKey(2), grad_threshold=10.0, min_opacity=0.005,
        scene_extent=1.0, max_screen_size=None,
    )
    assert int(st2.num_alive) == 7
    assert not bool(st2.alive[3])


def test_prune_big_screen_and_world():
    st = small_state(n=8, capacity=32, scale=0.01)
    # Gaussian 2: huge screen radius; gaussian 4: huge world size.
    st = st.replace(max_radii2d=st.max_radii2d.at[2].set(500.0))
    ls = st.params.log_scale.at[4].set(jnp.log(jnp.full((3,), 5.0)))
    st = st.replace(params=st.params.replace(log_scale=ls))
    st2, _, _ = densify_and_prune(
        st, jax.random.PRNGKey(3), grad_threshold=10.0, min_opacity=0.005,
        scene_extent=1.0, max_screen_size=100.0,
    )
    assert not bool(st2.alive[2])
    assert not bool(st2.alive[4])
    assert int(st2.num_alive) == 6


def test_overflow_reported():
    st = small_state(n=30, capacity=32, scale=0.001)
    st = st.replace(grad_accum=jnp.ones((32,)), denom=jnp.ones((32,)))
    need = int(required_slots(st, 0.5, 0.01, 1.0))
    assert need > 0  # 30 clones needed, 2 free
    st2, allocated, overflow = densify_and_prune(
        st, jax.random.PRNGKey(4), grad_threshold=0.5, min_opacity=0.005,
        scene_extent=1.0, max_screen_size=None,
    )
    assert int(overflow) == 28
    assert int(st2.num_alive) == 32  # filled to capacity


def test_reset_opacity():
    st = small_state(n=8, capacity=32, opacity=0.7)
    st2 = reset_opacity(st, ceiling=0.01)
    op = np.asarray(st2.params.opacity[:8, 0])
    np.testing.assert_allclose(op, 0.01, rtol=1e-4)


def test_prune_only_mask():
    st = small_state(n=8, capacity=32)
    mask = jnp.zeros((32,), bool).at[jnp.asarray([0, 5])].set(True)
    st2 = prune_only(st, mask)
    assert int(st2.num_alive) == 6


def test_sparse_adam_only_updates_visible():
    st = small_state(n=8, capacity=32)
    params = st.params
    opt = init_sparse_adam(params)
    grads = jax.tree.map(jnp.ones_like, params)
    visible = jnp.arange(32) < 4
    lrs = GaussianParams(
        xyz=jnp.float32(0.01), feat_dc=jnp.float32(0.01), feat_rest=jnp.float32(0.01),
        log_scale=jnp.float32(0.01), quat=jnp.float32(0.01), logit_opacity=jnp.float32(0.01),
    )
    p2, opt2 = sparse_adam_step(params, grads, opt, visible, lrs)
    moved = np.abs(np.asarray(p2.xyz - params.xyz)).sum(axis=-1)
    assert (moved[:4] > 0).all()
    assert (moved[4:] == 0).all()
    # Moments untouched for invisible.
    assert np.abs(np.asarray(opt2.mu.xyz[4:])).sum() == 0
    # Adam step magnitude with fresh moments: lr * m / (sqrt(v) + eps)
    # = 0.01 * 0.1 / (sqrt(0.001) + eps) ~ 0.0316 per component.
    np.testing.assert_allclose(
        np.asarray(p2.xyz[0] - params.xyz[0]),
        -0.01 * 0.1 / (np.sqrt(0.001) + 1e-15),
        rtol=1e-4,
    )


def test_exponential_lr_schedule():
    lr = exponential_lr(1.6e-4, 1.6e-6, max_steps=30000)
    np.testing.assert_allclose(float(lr(0)), 1.6e-4, rtol=1e-3)
    np.testing.assert_allclose(float(lr(30000)), 1.6e-6, rtol=1e-3)
    np.testing.assert_allclose(float(lr(15000)), 1.6e-5, rtol=1e-3)
