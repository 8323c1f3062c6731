"""Policy-gradient job script (reference examples/policy_opt_job_script.py).

Runs NPG / VPG / NVPG / PPO from a config file.  Config formats: json,
yaml, or the reference's dict-literal .txt (parsed safely — no eval).

    python examples/policy_opt_job_script.py --output <dir> \
        --config examples/example_configs/swimmer_npg.json
"""

import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__),
                                                "..")))

import argparse
import time as timer

from mjrl_tpu.algos import NPG, PPO, BatchREINFORCE
from mjrl_tpu.baselines import MLPBaseline
from mjrl_tpu.envs import GymEnv
from mjrl_tpu.models.policies import MLP
from mjrl_tpu.utils.config import load_config, save_config
from mjrl_tpu.utils.train_agent import train_agent


def build_agent(job_data):
    e = GymEnv(job_data["env"])
    policy = MLP(e.spec, hidden_sizes=tuple(job_data["policy_size"]),
                 seed=job_data["seed"],
                 init_log_std=job_data.get("init_log_std", 0.0))
    baseline = MLPBaseline(
        e.spec, reg_coef=1e-3, batch_size=job_data["vf_batch_size"],
        hidden_sizes=tuple(job_data["vf_hidden_size"]),
        epochs=job_data["vf_epochs"], learn_rate=job_data["vf_learn_rate"])
    hp = job_data.get("alg_hyper_params") or {}
    alg = job_data["algorithm"]
    if alg == "NPG":
        return NPG(e, policy, baseline,
                   normalized_step_size=job_data["rl_step_size"],
                   seed=job_data["seed"], save_logs=True, **hp)
    if alg == "VPG":
        return BatchREINFORCE(e, policy, baseline,
                              learn_rate=job_data["rl_step_size"],
                              seed=job_data["seed"], save_logs=True, **hp)
    if alg == "NVPG":
        return BatchREINFORCE(e, policy, baseline,
                              desired_kl=job_data["rl_step_size"],
                              seed=job_data["seed"], save_logs=True, **hp)
    if alg == "PPO":
        return PPO(e, policy, baseline, save_logs=True,
                   seed=job_data["seed"], **hp)
    raise ValueError(f"unknown algorithm {alg!r} "
                     "(choose NPG, NVPG, VPG, or PPO)")


def main(output, config_path):
    job_data = load_config(config_path)
    assert job_data["sample_mode"] in ("trajectories", "samples")
    save_config(job_data, output)
    agent = build_agent(job_data)

    ts = timer.time()
    train_agent(job_name=output,
                agent=agent,
                seed=job_data["seed"],
                niter=job_data["rl_num_iter"],
                gamma=job_data["rl_gamma"],
                gae_lambda=job_data["rl_gae"],
                num_cpu=job_data.get("num_cpu", 1),
                sample_mode=job_data["sample_mode"],
                num_traj=job_data.get("rl_num_traj", 0),
                num_samples=job_data.get("rl_num_samples", 0),
                save_freq=job_data["save_freq"],
                evaluation_rollouts=job_data.get("eval_rollouts"))
    print(f"time taken = {timer.time() - ts:.2f}")


if __name__ == "__main__":
    parser = argparse.ArgumentParser(
        description="Policy gradient training on mjrl_tpu environments")
    parser.add_argument("--output", type=str, required=True)
    parser.add_argument("--config", type=str, required=True)
    args = parser.parse_args()
    main(args.output, args.config)
