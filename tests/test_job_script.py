"""Smoke tests for the example job script (config plumbing for every
algorithm — the reference exercises this via hydra on Hopper,
tests/hydra/hydra_policy_opt_job_script.py)."""

import json
import sys

import pytest


def _tiny_config(alg):
    return {
        "env": "mjrl_point_mass-v0", "algorithm": alg, "seed": 1,
        "sample_mode": "trajectories", "rl_num_traj": 4, "rl_num_iter": 2,
        "num_cpu": 1, "save_freq": 10, "eval_rollouts": None,
        "policy_size": [8, 8], "init_log_std": -0.3,
        "vf_hidden_size": [32, 32], "vf_batch_size": 32, "vf_epochs": 1,
        "vf_learn_rate": 1e-3, "rl_step_size": 0.05, "rl_gamma": 0.95,
        "rl_gae": 0.97, "alg_hyper_params": {},
    }


@pytest.mark.parametrize("alg", ["NPG", "VPG", "NVPG", "PPO"])
def test_job_script_all_algorithms(tmp_path, alg):
    sys.path.insert(0, "/root/repo/examples")
    import policy_opt_job_script as job
    cfg_path = tmp_path / "cfg.json"
    cfg = _tiny_config(alg)
    if alg == "PPO":
        cfg["alg_hyper_params"] = {"epochs": 2, "mb_size": 32}
    cfg_path.write_text(json.dumps(cfg))
    out = str(tmp_path / f"job_{alg}")
    job.main(out, str(cfg_path))
    import os
    assert os.path.exists(os.path.join(out, "logs", "log.csv"))
    assert os.path.exists(os.path.join(out, "job_config.json"))


def test_job_script_samples_mode(tmp_path):
    sys.path.insert(0, "/root/repo/examples")
    import policy_opt_job_script as job
    cfg = _tiny_config("NPG")
    cfg["sample_mode"] = "samples"
    cfg["rl_num_samples"] = 120
    del cfg["rl_num_traj"]
    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(json.dumps(cfg))
    job.main(str(tmp_path / "job_s"), str(cfg_path))
