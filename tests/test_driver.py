"""Driver tests: train_agent loop, checkpoint/resume, logger, plots."""

import os
import pickle

import numpy as np
import pytest

from mjrl_tpu.algos import NPG
from mjrl_tpu.baselines import LinearBaseline
from mjrl_tpu.envs import GymEnv
from mjrl_tpu.models import GaussianMLP, Policy
from mjrl_tpu.utils.logger import DataLog
from mjrl_tpu.utils.train_agent import train_agent


def _make_agent(seed=7):
    e = GymEnv("mjrl_point_mass-v0")
    pol = Policy(GaussianMLP(6, 2, hidden_sizes=(16,)), seed=seed)
    bl = LinearBaseline(e.spec)
    return NPG(e, pol, bl, normalized_step_size=0.05, seed=seed,
               save_logs=True)


def test_logger_roundtrip(tmp_path):
    log = DataLog()
    for i in range(5):
        log.log_kv("iteration", i)
        log.log_kv("score", float(i) * 1.5)
    log.save_log(str(tmp_path))
    assert (tmp_path / "log.csv").exists()
    assert (tmp_path / "log.pickle").exists()
    log2 = DataLog()
    data = log2.read_log(str(tmp_path / "log.csv"))
    assert data["score"] == [0.0, 1.5, 3.0, 4.5, 6.0]
    log2.shrink_to(2)
    assert len(log2.log["score"]) == 2


def test_train_agent_end_to_end(tmp_path):
    job = str(tmp_path / "job1")
    agent = _make_agent()
    train_agent(job, agent, seed=1, niter=3, gamma=0.95, gae_lambda=0.97,
                num_traj=5, save_freq=2, evaluation_rollouts=2,
                plot_keys=["stoc_pol_mean"])
    assert os.path.exists(os.path.join(job, "logs", "log.csv"))
    assert os.path.exists(os.path.join(job, "iterations",
                                       "policy_2.pickle"))
    assert os.path.exists(os.path.join(job, "iterations",
                                       "best_policy.pickle"))
    assert os.path.exists(os.path.join(job, "results.txt"))
    assert os.path.exists(os.path.join(job, "logs", "stoc_pol_mean.png"))
    log = agent.logger.log
    assert "eval_score" in log and len(log["stoc_pol_mean"]) == 3
    # pickled policy is loadable and functional
    with open(os.path.join(job, "iterations", "policy_2.pickle"),
              "rb") as f:
        pol = pickle.load(f)
    a, info = pol.get_action(np.zeros(6))
    assert a.shape == (2,)


def test_train_agent_resume(tmp_path):
    job = str(tmp_path / "job2")
    agent = _make_agent()
    train_agent(job, agent, seed=1, niter=3, gamma=0.95, gae_lambda=0.97,
                num_traj=4, save_freq=2)
    # new agent resumes from the iteration-2 checkpoint
    agent2 = _make_agent()
    train_agent(job, agent2, seed=1, niter=5, gamma=0.95, gae_lambda=0.97,
                num_traj=4, save_freq=2)
    assert len(agent2.logger.log["stoc_pol_mean"]) == 5
