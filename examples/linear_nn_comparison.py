"""NN vs linear policy comparison on the swimmer
(reference examples/linear_nn_comparison.py)."""

import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__),
                                                "..")))

import time as timer

from mjrl_tpu.algos import NPG
from mjrl_tpu.baselines import MLPBaseline
from mjrl_tpu.envs import GymEnv
from mjrl_tpu.models.policies import MLP, LinearPolicy
from mjrl_tpu.utils.train_agent import train_agent

SEED = 500

# NN policy
# ==================================
e = GymEnv("mjrl_swimmer-v0")
policy = MLP(e.spec, hidden_sizes=(32, 32), seed=SEED)
baseline = MLPBaseline(e.spec, reg_coef=1e-3, batch_size=64, epochs=2,
                       learn_rate=1e-3)
agent = NPG(e, policy, baseline, normalized_step_size=0.1, seed=SEED,
            save_logs=True)
ts = timer.time()
train_agent(job_name="swimmer_nn_exp1", agent=agent, seed=SEED, niter=50,
            gamma=0.995, gae_lambda=0.97, num_cpu=1,
            sample_mode="trajectories", num_traj=10, save_freq=5,
            evaluation_rollouts=5)
print(f"time taken for NN policy training = {timer.time() - ts:.1f}s")

# Linear policy
# ==================================
e = GymEnv("mjrl_swimmer-v0")
policy = LinearPolicy(e.spec, seed=SEED)
baseline = MLPBaseline(e.spec, reg_coef=1e-3, batch_size=64, epochs=2,
                       learn_rate=1e-3)
agent = NPG(e, policy, baseline, normalized_step_size=0.1, seed=SEED,
            save_logs=True)
ts = timer.time()
train_agent(job_name="swimmer_linear_exp1", agent=agent, seed=SEED,
            niter=50, gamma=0.995, gae_lambda=0.97, num_cpu=1,
            sample_mode="trajectories", num_traj=10, save_freq=5,
            evaluation_rollouts=5)
print(f"time taken for linear policy training = {timer.time() - ts:.1f}s")
