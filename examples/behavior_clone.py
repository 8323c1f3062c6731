"""Expert training + behavior cloning demo
(reference examples/behavior_clone.py).

Trains an NPG expert on the swimmer, collects demonstrations, clones a
fresh policy with BC, and compares evaluation scores.
"""

import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__),
                                                "..")))

import pickle
import time as timer

from mjrl_tpu.algos import BC, NPG
from mjrl_tpu.baselines import MLPBaseline
from mjrl_tpu.envs import GymEnv
from mjrl_tpu.models.policies import MLP
from mjrl_tpu.samplers import sample_paths
from mjrl_tpu.utils.train_agent import train_agent

SEED = 500

# ------------------------------
# Train expert policy first
e = GymEnv("mjrl_swimmer-v0")
policy = MLP(e.spec, hidden_sizes=(32, 32), seed=SEED)
baseline = MLPBaseline(e.spec, reg_coef=1e-3, batch_size=64, epochs=5,
                       learn_rate=1e-3)
agent = NPG(e, policy, baseline, normalized_step_size=0.1, seed=SEED,
            save_logs=True)

ts = timer.time()
print("Training expert policy ...")
train_agent(job_name="swimmer_exp1", agent=agent, seed=SEED, niter=50,
            gamma=0.995, gae_lambda=0.97, num_cpu=1,
            sample_mode="trajectories", num_traj=10, save_freq=5,
            evaluation_rollouts=None)
print(f"expert training time = {timer.time() - ts:.1f}s")

# ------------------------------
# Get demonstrations
print("Collecting expert demonstrations ...")
with open("swimmer_exp1/iterations/best_policy.pickle", "rb") as f:
    expert_pol = pickle.load(f)
demo_paths = sample_paths(num_traj=5, policy=expert_pol, env=e.env)

# ------------------------------
# Train BC
policy = MLP(e.spec, hidden_sizes=(32, 32), seed=SEED)
bc_agent = BC(demo_paths, policy=policy, epochs=20, batch_size=64, lr=1e-3)
ts = timer.time()
print("Running BC with expert demonstrations ...")
bc_agent.train()
print(f"BC training time = {timer.time() - ts:.1f}s")

# ------------------------------
# Evaluate Policies
bc_pol_score = e.evaluate_policy(policy, num_episodes=5, mean_action=True)
expert_score = e.evaluate_policy(expert_pol, num_episodes=5,
                                 mean_action=True)
print(f"Expert policy performance (eval mode) = {expert_score[0][0]:.2f}")
print(f"BC policy performance (eval mode) = {bc_pol_score[0][0]:.2f}")
