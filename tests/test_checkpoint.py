"""Orbax full-state checkpointing and the sandbox MPC runner."""

import numpy as np
import pytest

from mjrl_tpu.algos import NPG
from mjrl_tpu.baselines import LinearBaseline
from mjrl_tpu.envs import GymEnv
from mjrl_tpu.models import GaussianMLP, Policy
from mjrl_tpu.utils.checkpoint import (latest_checkpoint,
                                       restore_agent_checkpoint,
                                       save_agent_checkpoint)


def _agent(seed=3):
    e = GymEnv("mjrl_point_mass-v0")
    pol = Policy(GaussianMLP(6, 2, hidden_sizes=(8,)), seed=seed)
    bl = LinearBaseline(e.spec)
    return NPG(e, pol, bl, normalized_step_size=0.05, seed=seed,
               save_logs=False)


def test_orbax_roundtrip(tmp_path):
    agent = _agent()
    agent.train_step(N=4, gamma=0.95, gae_lambda=0.97, horizon=5)
    params_after = np.asarray(agent.policy.get_param_values())
    save_agent_checkpoint(str(tmp_path), agent, 7)
    assert latest_checkpoint(str(tmp_path)) == 7

    agent2 = _agent(seed=99)  # different init
    it = restore_agent_checkpoint(str(tmp_path), agent2)
    assert it == 7
    np.testing.assert_allclose(
        np.asarray(agent2.policy.get_param_values()), params_after,
        rtol=1e-6)
    np.testing.assert_allclose(np.asarray(agent2.baseline.state),
                               np.asarray(agent.baseline.state), rtol=1e-6)
    # restored agent can continue training
    stats = agent2.train_step(N=4, gamma=0.95, gae_lambda=0.97, horizon=5)
    assert np.isfinite(stats[0])


def test_mpc_sandbox_runner(tmp_path):
    from mjrl_tpu.algos.model_accel.run_experiments. \
        run_model_learning_mpc import run
    job = dict(env_name="mjrl_point_mass-v0", seed=0, num_iter=2,
               samples_per_iter=2, plan_horizon=4, plan_paths=8,
               hidden_size=(32, 32), fit_epochs=2, fit_mb_size=32,
               warmup_paths=3)
    model, mpc, logger = run(str(tmp_path / "mpc_job"), job)
    assert len(logger.log["rollout_score"]) == 2
    assert np.isfinite(logger.log["dyn_loss"][-1])


def test_agent_pickle_roundtrip(tmp_path):
    """Whole-agent pickling (reference run_model_accel_npg.py:247-253):
    agents carry envs, jitted caches and optimizers — all must survive."""
    import pickle
    agent = _agent()
    agent.train_step(N=4, gamma=0.95, gae_lambda=0.97, horizon=5)
    blob = pickle.dumps(agent)
    agent2 = pickle.loads(blob)
    np.testing.assert_allclose(agent2.policy.get_param_values(),
                               agent.policy.get_param_values())
    stats = agent2.train_step(N=4, gamma=0.95, gae_lambda=0.97, horizon=5)
    assert np.isfinite(stats[0])
