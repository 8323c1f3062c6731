"""The reference's smoke benchmark as a runnable script
(reference tests/point_mass_test.py:11-29): NPG on point_mass, 50 iters x
40 trajectories, MLP(32, 32), step 0.05, gamma 0.95, lambda 0.97,
seed 500 — expected to solve the task (success_rate -> 100%)."""

import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__),
                                                "..")))

from mjrl_tpu.algos import NPG
from mjrl_tpu.baselines import MLPBaseline
from mjrl_tpu.envs import GymEnv
from mjrl_tpu.models.policies import MLP
from mjrl_tpu.utils.train_agent import train_agent

SEED = 500

e = GymEnv("mjrl_point_mass-v0")
policy = MLP(e.spec, hidden_sizes=(32, 32), seed=SEED)
baseline = MLPBaseline(e.spec, reg_coef=1e-3, batch_size=64, epochs=2,
                       learn_rate=1e-3)
agent = NPG(e, policy, baseline, normalized_step_size=0.05, seed=SEED,
            save_logs=True)

train_agent(job_name="point_mass_exp1",
            agent=agent,
            seed=SEED,
            niter=50,
            gamma=0.95,
            gae_lambda=0.97,
            num_cpu=1,
            sample_mode="trajectories",
            num_traj=40,
            save_freq=25,
            evaluation_rollouts=None,
            plot_keys=["stoc_pol_mean", "running_score", "success_rate"])
print("final success rate:",
      agent.logger.log.get("success_rate", ["n/a"])[-1])
