"""Visualizer smoke script (reference tests/visualizer_test.py:11-29):
short NPG training on point_mass with a QuadraticBaseline, then offscreen
policy rendering (shaded-mesh mp4s instead of an interactive viewer)."""

import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__),
                                                "..")))

from mjrl_tpu.algos import NPG
from mjrl_tpu.baselines import QuadraticBaseline
from mjrl_tpu.envs import GymEnv
from mjrl_tpu.models.policies import MLP
from mjrl_tpu.utils.train_agent import train_agent

SEED = 500

e = GymEnv("mjrl_point_mass-v0")
policy = MLP(e.spec, hidden_sizes=(32, 32), seed=SEED)
baseline = QuadraticBaseline(e.spec)
agent = NPG(e, policy, baseline, normalized_step_size=0.05, seed=SEED,
            save_logs=True)

train_agent(job_name="point_mass_vis_exp",
            agent=agent,
            seed=SEED,
            niter=10,
            gamma=0.95,
            gae_lambda=0.97,
            num_cpu=1,
            sample_mode="trajectories",
            num_traj=40,
            save_freq=5,
            evaluation_rollouts=None)

n = e.visualize_policy(policy, num_episodes=2, horizon=e.horizon,
                       mode="evaluation",
                       save_dir="point_mass_vis_exp/vis")
print(f"rendered {n} frames to point_mass_vis_exp/vis")
