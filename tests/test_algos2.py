"""Tests for TRPO, PPO, BC, DAPG."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mjrl_tpu.algos import BC, DAPG, PPO, TRPO
from mjrl_tpu.baselines import LinearBaseline
from mjrl_tpu.envs import GymEnv
from mjrl_tpu.models import GaussianMLP, Policy
from mjrl_tpu.samplers import sample_paths


@pytest.fixture(scope="module")
def pm_env():
    return GymEnv("mjrl_point_mass-v0")


def test_trpo_respects_kl_budget(pm_env):
    pol = Policy(GaussianMLP(6, 2, hidden_sizes=(16,)), seed=2)
    bl = LinearBaseline(pm_env.spec)
    agent = TRPO(pm_env, pol, bl, kl_dist=0.01, seed=1, save_logs=True)
    agent.train_step(N=10, gamma=0.95, gae_lambda=0.97)
    log = agent.logger.get_current_log()
    # backtracking guarantees kl < kl_dist (up to clamp effects)
    assert log["kl_dist"] < 0.02
    assert log["delta"] == pytest.approx(0.02)


def test_ppo_improves_surrogate(pm_env):
    pol = Policy(GaussianMLP(6, 2, hidden_sizes=(16,)), seed=2)
    bl = LinearBaseline(pm_env.spec)
    agent = PPO(pm_env, pol, bl, epochs=4, mb_size=64, learn_rate=3e-4,
                seed=1, save_logs=True)
    agent.train_step(N=10, gamma=0.95, gae_lambda=0.97)
    log = agent.logger.get_current_log()
    assert log["surr_improvement"] > 0.0
    assert "t_opt" in log
    # Adam state persists across iterations
    s1 = jax.tree_util.tree_leaves(agent.opt_state)
    agent.train_step(N=10, gamma=0.95, gae_lambda=0.97)
    s2 = jax.tree_util.tree_leaves(agent.opt_state)
    assert any(not np.allclose(a, b) for a, b in zip(s1, s2)
               if np.asarray(a).size)


def _expert_paths(env, seed=0, n=5):
    """Scripted 'expert': move straight toward the target."""
    rng = np.random.RandomState(seed)
    paths = []
    for _ in range(n):
        e = GymEnv("mjrl_point_mass-v0")
        obs = e.reset(seed=rng.randint(10000))
        O, A = [], []
        for _ in range(e.horizon):
            a = np.clip(3.0 * (obs[-2:] - obs[:2]) - 0.5 * obs[2:4], -1, 1)
            O.append(obs.copy())
            A.append(a.copy())
            obs, r, d, i = e.step(a)
        paths.append(dict(observations=np.array(O), actions=np.array(A),
                          rewards=np.zeros(len(O))))
    return paths


def test_bc_clones_expert(pm_env):
    paths = _expert_paths(pm_env)
    pol = Policy(GaussianMLP(6, 2, hidden_sizes=(32, 32)), seed=0)
    bc = BC(paths, pol, epochs=100, batch_size=32, lr=1e-3,
            loss_type="MSE", set_transforms=True)
    before = float(bc.loss(dict(
        observations=np.concatenate([p["observations"] for p in paths]),
        expert_actions=np.concatenate([p["actions"] for p in paths]))))
    bc.train(suppress_fit_tqdm=True)
    log = bc.logger.get_current_log()
    assert log["loss_after"] < log["loss_before"]
    assert log["loss_after"] < 0.5 * before
    # transforms installed
    assert not np.allclose(np.asarray(pol.transforms.in_shift), 0.0)


def test_bc_mle_loss(pm_env):
    paths = _expert_paths(pm_env, n=3)
    pol = Policy(GaussianMLP(6, 2, hidden_sizes=(16,)), seed=0)
    bc = BC(paths, pol, epochs=5, batch_size=32, loss_type="MLE")
    bc.train(suppress_fit_tqdm=True)
    assert bc.logger.get_current_log()["loss_after"] < \
        bc.logger.get_current_log()["loss_before"]


def test_dapg_with_demos(pm_env):
    demo_paths = _expert_paths(pm_env, n=3)
    pol = Policy(GaussianMLP(6, 2, hidden_sizes=(16,)), seed=2)
    bl = LinearBaseline(pm_env.spec)
    agent = DAPG(pm_env, pol, bl, demo_paths=demo_paths,
                 normalized_step_size=0.05, lam_0=1.0, lam_1=0.95,
                 seed=1, save_logs=True)
    agent.train_step(N=8, gamma=0.95, gae_lambda=0.97)
    assert agent.iter_count == 1.0
    agent.train_step(N=8, gamma=0.95, gae_lambda=0.97)
    assert agent.iter_count == 2.0
    log = agent.logger.get_current_log()
    assert np.isfinite(log["kl_dist"])


def test_dapg_without_demos_is_npg(pm_env):
    pol = Policy(GaussianMLP(6, 2, hidden_sizes=(16,)), seed=2)
    bl = LinearBaseline(pm_env.spec)
    agent = DAPG(pm_env, pol, bl, demo_paths=None, normalized_step_size=0.05,
                 seed=1, save_logs=True)
    stats = agent.train_step(N=6, gamma=0.95, gae_lambda=0.97)
    assert len(stats) == 5
