"""Demo-augmented policy learning pipeline (the reference's DAPG workflow,
algos/dapg.py + hand_dapg examples): train an expert, collect
demonstrations, BC warm-start a fresh policy, then fine-tune with DAPG
mixing demo gradients into NPG."""

import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__),
                                                "..")))

import pickle
import numpy as np

from mjrl_tpu.algos import BC, DAPG, NPG
from mjrl_tpu.baselines import MLPBaseline
from mjrl_tpu.envs import GymEnv
from mjrl_tpu.models.policies import MLP
from mjrl_tpu.samplers import sample_paths
from mjrl_tpu.utils.train_agent import train_agent

SEED = 123

# ------------------------------ expert
e = GymEnv("mjrl_point_mass-v0")
expert = MLP(e.spec, hidden_sizes=(32, 32), seed=SEED)
baseline = MLPBaseline(e.spec, reg_coef=1e-3, batch_size=64, epochs=2,
                       learn_rate=1e-3)
agent = NPG(e, expert, baseline, normalized_step_size=0.1, seed=SEED,
            save_logs=True)
train_agent(job_name="pm_dapg_expert", agent=agent, seed=SEED, niter=30,
            gamma=0.95, gae_lambda=0.97, num_traj=40, save_freq=10)

with open("pm_dapg_expert/iterations/best_policy.pickle", "rb") as f:
    expert = pickle.load(f)

# ------------------------------ demos
demo_paths = sample_paths(num_traj=10, env=e.env, policy=expert,
                          eval_mode=True, base_seed=SEED)
print("demo mean return:",
      np.mean([p["rewards"].sum() for p in demo_paths]))

# ------------------------------ BC warm start
policy = MLP(e.spec, hidden_sizes=(32, 32), seed=SEED + 1)
bc = BC(demo_paths, policy=policy, epochs=20, batch_size=64, lr=1e-3,
        set_transforms=True)
bc.train(suppress_fit_tqdm=True)
bc_score = e.evaluate_policy(policy, num_episodes=10, mean_action=True)
print(f"BC policy score: {bc_score[0][0]:.2f}")

# ------------------------------ DAPG fine-tune
baseline2 = MLPBaseline(e.spec, reg_coef=1e-3, batch_size=64, epochs=2,
                        learn_rate=1e-3)
dapg = DAPG(e, policy, baseline2, demo_paths=demo_paths,
            normalized_step_size=0.05, lam_0=1.0, lam_1=0.95, seed=SEED,
            save_logs=True)
train_agent(job_name="pm_dapg_finetune", agent=dapg, seed=SEED, niter=20,
            gamma=0.95, gae_lambda=0.97, num_traj=40, save_freq=10)
final = e.evaluate_policy(policy, num_episodes=10, mean_action=True)
print(f"DAPG fine-tuned score: {final[0][0]:.2f}")
