"""Tests for the model-based branch: world models, model-space rollouts,
MPPI planning, ModelAccelNPG, MBAC."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mjrl_tpu.algos import (MBAC, ModelAccelNPG, MPCPolicy, WorldModel,
                            WorldModelEnsemble)
from mjrl_tpu.algos.model_accel.reward_functions import (
    get_reward_function, point_mass_reward)
from mjrl_tpu.algos.model_accel.sampling import (
    enforce_bounds, generate_perturbed_actions,
    generate_perturbed_actions_batch, policy_rollout, trajectory_rollout)
from mjrl_tpu.baselines import LinearBaseline
from mjrl_tpu.envs import GymEnv
from mjrl_tpu.models import GaussianMLP, Policy
from mjrl_tpu.models.mpc_actor import MPCActor


def _toy_data(n=512, d=4, m=2, seed=0):
    """Linear dynamics s' = A s + B a + c."""
    rng = np.random.RandomState(seed)
    A = np.eye(d) + 0.05 * rng.randn(d, d)
    B = 0.1 * rng.randn(d, m)
    c = 0.01 * rng.randn(d)
    s = rng.randn(n, d).astype(np.float32)
    a = rng.randn(n, m).astype(np.float32)
    sp = (s @ A.T + a @ B.T + c).astype(np.float32)
    return s, a, sp


def test_world_model_fits_linear_dynamics():
    s, a, sp = _toy_data()
    wm = WorldModel(4, 2, hidden_size=(64, 64), seed=0, fit_lr=1e-3)
    loss0 = wm.compute_loss(s, a, sp)
    losses = wm.fit_dynamics(s, a, sp, fit_mb_size=64, fit_epochs=30)
    loss1 = wm.compute_loss(s, a, sp)
    assert loss1 < 0.1 * loss0
    assert losses[-1] < losses[0]
    # transforms installed from data
    assert not np.allclose(np.asarray(wm.dyn_tr["s_shift"]), 0.0)


def test_world_model_output_mask():
    s, a, sp = _toy_data()
    # dimension 0 has (nearly) no variation in the target residual
    sp = sp.copy()
    sp[:, 0] = s[:, 0]
    wm = WorldModel(4, 2, seed=0)
    wm.fit_dynamics(s, a, sp, fit_mb_size=64, fit_epochs=3)
    pred = wm.predict(s[:8], a[:8])
    # masked residual dim => prediction equals input state dim exactly
    np.testing.assert_allclose(pred[:, 0], s[:8, 0], atol=1e-5)


def test_world_model_reward_head():
    s, a, sp = _toy_data()
    r = (s[:, :1] ** 2).astype(np.float32)
    wm = WorldModel(4, 2, learn_reward=True, seed=0)
    wm.fit_dynamics(s, a, sp, fit_mb_size=64, fit_epochs=5)
    losses = wm.fit_reward(s, a, r, fit_mb_size=64, fit_epochs=10)
    assert losses[-1] < losses[0]
    paths = {"observations": np.tile(s[:4, None], (1, 3, 1)),
             "actions": np.tile(a[:4, None], (1, 3, 1))}
    wm.compute_path_rewards(paths)
    assert paths["rewards"].shape == (4, 3)


def test_ensemble_vmap_fit_and_disagreement():
    s, a, sp = _toy_data()
    ens = WorldModelEnsemble(3, 4, 2, seed=0)
    losses = ens.fit_dynamics(s, a, sp, fit_mb_size=64, fit_epochs=10)
    assert losses.shape == (3, 10)
    preds = ens.predict_all(s[:16], a[:16])
    assert preds.shape == (3, 16, 4)
    # members differ (different seeds/minibatch streams)
    assert not np.allclose(preds[0], preds[1])


def test_policy_and_trajectory_rollout():
    env = GymEnv("mjrl_point_mass-v0").env
    pol = Policy(GaussianMLP(6, 2, hidden_sizes=(8,)), seed=0)
    wm = WorldModel(6, 2, seed=0)
    ro = policy_rollout(num_traj=5, env=env, policy=pol, learned_model=wm,
                        horizon=7, seed=3)
    assert ro["observations"].shape == (5, 7, 6)
    assert ro["actions"].shape == (5, 7, 2)
    acts = np.random.RandomState(0).randn(4, 6, 2).astype(np.float32)
    tr = trajectory_rollout(acts, wm, np.zeros(6, np.float32))
    assert tr["observations"].shape == (4, 6, 6)


def test_perturbed_actions_filter():
    base = np.zeros((10, 2))
    coefs = [np.ones(2), 0.25, 0.8, 0.0]
    a1 = generate_perturbed_actions(base, coefs,
                                    np.random.RandomState(0))
    assert a1.shape == (10, 2)
    batch = generate_perturbed_actions_batch(
        jax.random.PRNGKey(0), jnp.zeros((10, 2)),
        (jnp.ones(2), 0.25, 0.8, 0.0), 6)
    assert batch.shape == (6, 10, 2)
    # smoothing reduces step-to-step jumps vs raw noise
    raw = jax.random.normal(jax.random.PRNGKey(0), (6, 10, 2))
    assert float(jnp.mean(jnp.abs(jnp.diff(batch, axis=1)))) < \
        float(jnp.mean(jnp.abs(jnp.diff(raw, axis=1))))


def test_mpc_policy_on_learned_model():
    env = GymEnv("mjrl_point_mass-v0")
    wm = WorldModel(6, 2, seed=0)
    mpc = MPCPolicy(env=env, plan_horizon=5, plan_paths=8, kappa=2.0,
                    gamma=0.95, fitted_model=wm, seed=0)
    a = mpc.get_action(np.zeros(6, np.float32))
    assert a.shape == (2,)
    # warm start shifted
    a2 = mpc.get_action(np.zeros(6, np.float32))
    assert np.isfinite(a2).all()


def test_mpc_policy_ensemble_disagreement():
    env = GymEnv("mjrl_point_mass-v0")
    ens = WorldModelEnsemble(2, 6, 2, seed=0)
    mpc = MPCPolicy(env=env, plan_horizon=4, plan_paths=6, omega=1.0,
                    fitted_model=ens, seed=0)
    a = mpc.get_action(np.zeros(6, np.float32))
    assert a.shape == (2,)


def test_model_accel_npg_train_step():
    env = GymEnv("mjrl_point_mass-v0")
    pol = Policy(GaussianMLP(6, 2, hidden_sizes=(16,)), seed=0)
    bl = LinearBaseline(env.spec)
    ens = WorldModelEnsemble(2, 6, 2, seed=1)
    # quick fit so the models are sane
    s, a, sp = _collect_transitions(env)
    ens.fit_dynamics(s, a, sp, fit_mb_size=32, fit_epochs=5)
    agent = ModelAccelNPG(learned_model=ens, env=env, policy=pol,
                          baseline=bl, normalized_step_size=0.05,
                          seed=0, save_logs=True,
                          reward_function=point_mass_reward)
    stats = agent.train_step(N=6, horizon=10, gamma=0.95, gae_lambda=0.97,
                             truncate_lim=1.0, truncate_reward=-1.0)
    assert len(stats) == 5
    log = agent.logger.get_current_log()
    assert np.isfinite(log["kl_dist"])


def _collect_transitions(env, n_paths=5):
    pol = Policy(GaussianMLP(6, 2, hidden_sizes=(8,)), seed=3)
    from mjrl_tpu.samplers import sample_paths
    paths = sample_paths(n_paths, env.env, pol, base_seed=0)
    s = np.concatenate([p["observations"][:-1] for p in paths])
    a = np.concatenate([p["actions"][:-1] for p in paths])
    sp = np.concatenate([p["observations"][1:] for p in paths])
    return s, a, sp


def test_mpc_actor_real_env():
    env = GymEnv("mjrl_point_mass-v0")
    actor = MPCActor(env=env, H=5, paths_per_cpu=8, kappa=5.0, gamma=0.95,
                     seed=0)
    env.reset(seed=0)
    s = env.get_env_state()
    a = actor.get_action(s)
    assert a.shape == (2,)
    assert np.isfinite(a).all()


def test_mbac_loop():
    pol = Policy(GaussianMLP(6, 2, hidden_sizes=(16,)), seed=0)
    mpc_params = dict(H=4, paths_per_cpu=6, num_cpu=1, kappa=5.0,
                      gamma=0.95)
    agent = MBAC("mjrl_point_mass-v0", pol, epochs=2, batch_size=16,
                 buffer_size=4, mpc_params=mpc_params)
    perf = agent.train_step(num_traj=2, suppress_fit_tqdm=True)
    assert np.isfinite(perf)
    assert len(agent.expert_paths) == 2
    agent.train_step(num_traj=2, suppress_fit_tqdm=True)
    agent.train_step(num_traj=2, suppress_fit_tqdm=True)
    assert len(agent.expert_paths) == 4  # FIFO cap


def test_reward_function_registry():
    fn = get_reward_function("mjrl_point_mass-v0")
    obs = jnp.asarray(np.random.RandomState(0).randn(2, 4, 6), jnp.float32)
    paths = fn({"observations": obs, "actions": jnp.zeros((2, 4, 2))})
    assert paths["rewards"].shape == (2, 4)
