"""Unit tests for core numerics: discounting, GAE, CG, flat utils.

Reference behaviors from mjrl/utils/process_samples.py and cg_solve.py,
cross-checked against straightforward numpy implementations.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mjrl_tpu.ops import (cg_solve, discount_sum, discounted_returns,
                          gae_advantages, tree_dot)
from mjrl_tpu.ops.gae import batched_gae, batched_returns, whiten


def np_discount_sum(x, gamma, terminal=0.0):
    y = []
    run = terminal
    for t in range(len(x) - 1, -1, -1):
        run = x[t] + gamma * run
        y.append(run)
    return np.array(y[::-1])


def test_discount_sum_matches_reference():
    rng = np.random.RandomState(0)
    x = rng.randn(37).astype(np.float32)
    for gamma in [0.0, 0.9, 0.995, 1.0]:
        got = discount_sum(jnp.asarray(x), gamma)
        want = np_discount_sum(x, gamma)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_discount_sum_terminal():
    x = np.ones(5, np.float32)
    got = discount_sum(jnp.asarray(x), 0.5, terminal=8.0)
    want = np_discount_sum(x, 0.5, terminal=8.0)
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_gae_matches_reference_formula():
    rng = np.random.RandomState(1)
    T = 25
    rewards = rng.randn(T)
    values = rng.randn(T)
    gamma, lam = 0.95, 0.97
    # reference: b1 = append(b, b[-1]) (not terminated), deltas, discount
    b1 = np.append(values, values[-1])
    deltas = rewards + gamma * b1[1:] - b1[:-1]
    want = np_discount_sum(deltas, gamma * lam)
    got = gae_advantages(jnp.asarray(rewards, jnp.float32),
                         jnp.asarray(values, jnp.float32),
                         gamma, lam, terminated=False)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    # terminated path bootstraps 0
    b1t = np.append(values, 0.0)
    deltas_t = rewards + gamma * b1t[1:] - b1t[:-1]
    want_t = np_discount_sum(deltas_t, gamma * lam)
    got_t = gae_advantages(jnp.asarray(rewards, jnp.float32),
                           jnp.asarray(values, jnp.float32),
                           gamma, lam, terminated=True)
    np.testing.assert_allclose(got_t, want_t, rtol=1e-4, atol=1e-5)


def test_gae_standard_mode_when_lambda_invalid():
    # gae_lambda None or outside [0,1] -> A = returns - values
    rng = np.random.RandomState(2)
    rewards = rng.randn(10).astype(np.float32)
    values = rng.randn(10).astype(np.float32)
    for lam in [None, -1.0, 2.0]:
        got = gae_advantages(jnp.asarray(rewards), jnp.asarray(values),
                             0.9, lam)
        want = np_discount_sum(rewards, 0.9) - values
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_batched_variants():
    rng = np.random.RandomState(3)
    r = rng.randn(4, 13).astype(np.float32)
    v = rng.randn(4, 13).astype(np.float32)
    term = np.array([True, False, True, False])
    rets = batched_returns(jnp.asarray(r), 0.9)
    advs = batched_gae(jnp.asarray(r), jnp.asarray(v), 0.9, 0.95,
                       jnp.asarray(term))
    for i in range(4):
        np.testing.assert_allclose(
            rets[i], np_discount_sum(r[i], 0.9), rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(
            advs[i],
            gae_advantages(jnp.asarray(r[i]), jnp.asarray(v[i]), 0.9, 0.95,
                           bool(term[i])),
            rtol=1e-5, atol=1e-6)


def test_masked_returns():
    r = jnp.asarray(np.ones(6, np.float32))
    mask = jnp.asarray([1, 1, 1, 0, 0, 0], jnp.float32)
    got = discounted_returns(r, 0.5, mask)
    want = np_discount_sum([1, 1, 1, 0, 0, 0], 0.5) * np.array(mask)
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_masked_gae_bootstraps_at_mask_boundary():
    """An episode shorter than the grid must bootstrap at its LAST VALID
    step: 0 when terminated, V(last valid obs) when truncated — not the
    value of the frozen post-terminal observation (reference
    process_samples.py:25-28)."""
    rng = np.random.RandomState(11)
    Tg, Tv = 5, 3                       # grid length, valid prefix
    rewards = np.zeros(Tg, np.float32)
    rewards[:Tv] = rng.randn(Tv)
    values = (rng.randn(Tg) + 10.0).astype(np.float32)  # large frozen V
    mask = np.array([1, 1, 1, 0, 0], np.float32)
    gamma, lam = 0.95, 0.97

    for terminated in (True, False):
        got = gae_advantages(jnp.asarray(rewards), jnp.asarray(values),
                             gamma, lam, terminated=terminated,
                             mask=jnp.asarray(mask))
        # reference computation on the valid prefix only
        boot = 0.0 if terminated else values[Tv - 1]
        b1 = np.append(values[:Tv], boot)
        deltas = rewards[:Tv] + gamma * b1[1:] - b1[:-1]
        want = np_discount_sum(deltas, gamma * lam)
        np.testing.assert_allclose(got[:Tv], want, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(got[Tv:], 0.0, atol=1e-7)

    # full-mask path must be unchanged vs the unmasked computation
    full = np.ones(Tg, np.float32)
    got_full = gae_advantages(jnp.asarray(rewards), jnp.asarray(values),
                              gamma, lam, terminated=False,
                              mask=jnp.asarray(full))
    want_full = gae_advantages(jnp.asarray(rewards), jnp.asarray(values),
                               gamma, lam, terminated=False)
    np.testing.assert_allclose(got_full, want_full, rtol=1e-6)


def test_whiten():
    rng = np.random.RandomState(4)
    a = rng.randn(100).astype(np.float32) * 3 + 2
    w = whiten(jnp.asarray(a))
    want = (a - a.mean()) / (a.std() + 1e-6)
    np.testing.assert_allclose(w, want, rtol=1e-4, atol=1e-5)


def test_cg_solves_spd_system():
    rng = np.random.RandomState(5)
    n = 12
    A = rng.randn(n, n)
    A = A @ A.T + n * np.eye(n)
    b = rng.randn(n)
    x_np = np.linalg.solve(A, b)
    Aj = jnp.asarray(A, jnp.float32)
    f_Ax = lambda v: Aj @ v
    x = cg_solve(f_Ax, jnp.asarray(b, jnp.float32), cg_iters=n * 4)
    np.testing.assert_allclose(x, x_np, rtol=1e-3, atol=1e-3)


def test_cg_honors_x0():
    rng = np.random.RandomState(6)
    n = 8
    A = rng.randn(n, n)
    A = A @ A.T + n * np.eye(n)
    b = rng.randn(n)
    x_np = np.linalg.solve(A, b)
    Aj = jnp.asarray(A, jnp.float32)
    # warm start at the exact solution -> should stay there with 1 iter
    x = cg_solve(lambda v: Aj @ v, jnp.asarray(b, jnp.float32),
                 x0=jnp.asarray(x_np, jnp.float32), cg_iters=1)
    np.testing.assert_allclose(x, x_np, rtol=1e-4, atol=1e-4)


def test_cg_on_pytrees():
    rng = np.random.RandomState(7)
    n = 6
    A = rng.randn(n, n)
    A = A @ A.T + n * np.eye(n)
    Aj = jnp.asarray(A, jnp.float32)
    b_flat = rng.randn(n).astype(np.float32)
    b_tree = {"a": jnp.asarray(b_flat[:2]), "b": jnp.asarray(b_flat[2:])}

    def f_Ax(tree):
        v = jnp.concatenate([tree["a"], tree["b"]])
        out = Aj @ v
        return {"a": out[:2], "b": out[2:]}

    x = cg_solve(f_Ax, b_tree, cg_iters=30)
    x_flat = np.concatenate([np.asarray(x["a"]), np.asarray(x["b"])])
    np.testing.assert_allclose(x_flat, np.linalg.solve(A, b_flat),
                               rtol=1e-3, atol=1e-3)


def test_cg_under_jit():
    A = jnp.eye(4) * 2.0
    b = jnp.ones(4)
    x = jax.jit(lambda b: cg_solve(lambda v: A @ v, b, cg_iters=5))(b)
    np.testing.assert_allclose(x, np.full(4, 0.5), rtol=1e-6)


def test_tree_dot():
    a = {"x": jnp.asarray([1.0, 2.0]), "y": jnp.asarray([[3.0]])}
    b = {"x": jnp.asarray([4.0, 5.0]), "y": jnp.asarray([[6.0]])}
    assert float(tree_dot(a, b)) == pytest.approx(1 * 4 + 2 * 5 + 3 * 6)
