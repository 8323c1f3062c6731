"""Tests for FC network, policies and baselines."""

import jax
import jax.numpy as jnp
import numpy as np

from mjrl_tpu.models import (GaussianLinear, GaussianMLP, LinearBaseline,
                             MLPBaseline, Policy, QuadraticBaseline,
                             ZeroBaseline)
from mjrl_tpu.models.fc_network import (init_mlp_params, make_transforms,
                                        identity_transforms, mlp_forward)
from mjrl_tpu.ops.gae import batched_returns


def test_mlp_forward_shapes_and_transforms():
    key = jax.random.PRNGKey(0)
    layers = init_mlp_params(key, 6, 2, (32, 32))
    tr = identity_transforms(6, 2)
    x = jnp.ones((5, 6))
    out = mlp_forward(layers, tr, x)
    assert out.shape == (5, 2)

    # output transforms: out*scale + shift
    tr2 = make_transforms(6, 2, out_shift=np.array([1.0, -1.0]),
                          out_scale=np.array([2.0, 3.0]))
    out2 = mlp_forward(layers, tr2, x)
    np.testing.assert_allclose(out2, out * jnp.asarray([2.0, 3.0])
                               + jnp.asarray([1.0, -1.0]), rtol=1e-5)

    # input transforms: (x - shift)/(scale + 1e-8)
    tr3 = make_transforms(6, 2, in_shift=np.ones(6), in_scale=2 * np.ones(6))
    out3 = mlp_forward(layers, tr3, x)
    out3_manual = mlp_forward(layers, tr, (x - 1.0) / (2.0 + 1e-8))
    np.testing.assert_allclose(out3, out3_manual, rtol=1e-5)


def test_policy_small_last_layer():
    cfg = GaussianMLP(obs_dim=4, act_dim=2, hidden_sizes=(32, 32))
    params, _ = cfg.init(jax.random.PRNGKey(1))
    # last layer scaled 1e-2 (gaussian_mlp.py:33-35)
    last_w = np.abs(np.asarray(params["layers"][-1]["w"])).max()
    first_w = np.abs(np.asarray(params["layers"][0]["w"])).max()
    assert last_w < first_w * 0.1


def test_policy_min_log_std_clamp():
    cfg = GaussianMLP(obs_dim=3, act_dim=2, min_log_std=-3.0)
    pol = Policy(cfg, seed=0)
    vals = pol.get_param_values()
    vals[-2:] = -10.0  # log_std entries are last in flat order
    pol.set_param_values(vals)
    assert np.all(np.asarray(pol.params["log_std"]) >= -3.0)


def test_policy_get_action_contract():
    cfg = GaussianMLP(obs_dim=3, act_dim=2, init_log_std=-1.0)
    pol = Policy(cfg, seed=0)
    act, info = pol.get_action(np.zeros(3))
    assert act.shape == (2,)
    assert set(info) == {"mean", "log_std", "evaluation"}
    np.testing.assert_allclose(info["evaluation"], info["mean"])


def test_policy_old_new_dist_and_ratio():
    cfg = GaussianMLP(obs_dim=3, act_dim=2)
    pol = Policy(cfg, seed=0)
    obs = np.random.RandomState(0).randn(10, 3)
    acts = np.random.RandomState(1).randn(10, 2)
    new = pol.new_dist_info(obs, acts)
    old = pol.old_dist_info(obs, acts)
    lr = pol.likelihood_ratio(new, old)
    np.testing.assert_allclose(np.asarray(lr), np.ones(10), rtol=1e-5)
    kl = pol.mean_kl(new, old)
    assert abs(float(kl)) < 1e-6
    # perturb new params -> ratio moves, KL > 0
    vals = pol.get_param_values()
    pol.set_param_values(vals + 0.05, set_new=True, set_old=False)
    new2 = pol.new_dist_info(obs, acts)
    assert float(pol.mean_kl(new2, old)) > 0.0


def test_gaussian_linear_is_one_layer():
    cfg = GaussianLinear(4, 2)
    params, _ = cfg.init(jax.random.PRNGKey(0))
    assert len(params["layers"]) == 1


def _fake_batch(N=8, T=20, obs_dim=5, seed=0):
    rng = np.random.RandomState(seed)
    obs = rng.randn(N, T, obs_dim).astype(np.float32)
    # returns correlated with obs so baselines can fit
    rets = (obs[..., 0] * 2.0 + obs[..., 1] + 0.1 * rng.randn(N, T)).astype(
        np.float32)
    return jnp.asarray(obs), jnp.asarray(rets)


def test_zero_baseline():
    obs, rets = _fake_batch()
    bl = ZeroBaseline(5)
    state = bl.init()
    np.testing.assert_allclose(bl.predict(state, obs), np.zeros(obs.shape[:2]))
    _, e0, e1 = bl.fit(state, obs, rets)
    assert float(e0) == 1.0 and float(e1) == 1.0


def test_linear_baseline_fits():
    obs, rets = _fake_batch()
    bl = LinearBaseline(5)
    coeffs = bl.init()
    new_coeffs, e0, e1 = bl.fit(coeffs, obs, rets)
    assert float(e1) < float(e0)
    assert float(e1) < 0.05  # linear target -> near-perfect fit
    pred = bl.predict(new_coeffs, obs)
    assert pred.shape == rets.shape


def test_linear_baseline_matches_numpy_lstsq():
    obs, rets = _fake_batch(N=4, T=10)
    bl = LinearBaseline(5, reg_coeff=1e-5)
    coeffs, _, _ = bl.fit(bl.init(), obs, rets)
    F = np.asarray(bl.features(obs)).reshape(-1, bl.num_features())
    R = np.asarray(rets).reshape(-1)
    want = np.linalg.solve(F.T @ F + 1e-5 * np.eye(F.shape[1]), F.T @ R)
    # f32 normal equations vs f64 numpy: coefficients on the ill-conditioned
    # time-power features can drift, so compare predictions, not coeffs.
    np.testing.assert_allclose(F @ np.asarray(coeffs), F @ want,
                               rtol=5e-2, atol=5e-2)


def test_quadratic_baseline_features():
    bl = QuadraticBaseline(3)
    obs = jnp.asarray(np.random.RandomState(0).randn(2, 4, 3), jnp.float32)
    feats = bl.features(obs)
    assert feats.shape == (2, 4, bl.num_features())
    # check one quad feature: o0*o1 at position n + 1 (pairs: 00,01,02,11,...)
    o = np.clip(np.asarray(obs), -10, 10) / 10.0
    np.testing.assert_allclose(feats[..., 3 + 1], o[..., 0] * o[..., 1],
                               rtol=1e-5)


def test_mlp_baseline_fits():
    obs, rets = _fake_batch(N=16, T=25)
    bl = MLPBaseline(5, hidden_sizes=(64, 64), epochs=10, batch_size=64)
    state = bl.init(jax.random.PRNGKey(0))
    state, e0, e1 = bl.fit(state, obs, rets, key=jax.random.PRNGKey(1))
    assert float(e1) < float(e0)
    pred = bl.predict(state, obs)
    assert pred.shape == rets.shape


def test_baselines_jit_safe():
    obs, rets = _fake_batch()
    bl = LinearBaseline(5)

    @jax.jit
    def run(obs, rets):
        c, e0, e1 = bl.fit(bl.init(), obs, rets)
        return bl.predict(c, obs)

    pred = run(obs, rets)
    assert pred.shape == rets.shape
