"""Smoke test for the MBRL outer-loop runner and config loading."""

import json
import os

import numpy as np

from mjrl_tpu.utils.config import apply_overrides, load_config, save_config


def test_config_loaders(tmp_path):
    # json
    p = tmp_path / "c.json"
    p.write_text(json.dumps({"a": 1, "b": {"c": 2}}))
    assert load_config(str(p)) == {"a": 1, "b": {"c": 2}}
    # yaml
    p = tmp_path / "c.yaml"
    p.write_text("a: 1\nb:\n  c: 2\n")
    assert load_config(str(p)) == {"a": 1, "b": {"c": 2}}
    # dict-literal txt (the reference's format, parsed without eval)
    p = tmp_path / "c.txt"
    p.write_text("{\n'env_name': 'mjrl_point_mass-v0',\n'seed': 5,\n"
                 "'policy_size': (32, 32),\n}")
    cfg = load_config(str(p))
    assert cfg["seed"] == 5 and cfg["policy_size"] == (32, 32)
    # overrides
    cfg = apply_overrides(cfg, ["seed=9", "npg.step_size=0.1"])
    assert cfg["seed"] == 9 and cfg["npg"]["step_size"] == 0.1
    # echo
    save_config(cfg, str(tmp_path / "job"))
    assert os.path.exists(tmp_path / "job" / "job_config.json")


def test_mbrl_runner_smoke(tmp_path):
    from mjrl_tpu.algos.model_accel.run_experiments.run_model_accel_npg \
        import run
    job = dict(
        env_name="mjrl_point_mass-v0", seed=1, num_iter=2,
        iter_samples=50, eval_rollouts=2, num_models=2, save_freq=1,
        hidden_size=(32, 32), fit_lr=1e-3, buffer_size=2000,
        fit_mb_size=32, fit_epochs=2, init_log_std=-0.5,
        min_log_std=-2.5, init_samples=75, policy_size=(16, 16),
        inner_steps=1, step_size=0.05, update_paths=8,
        start_state="init", horizon=10)
    out = str(tmp_path / "mbrl_job")
    agent, logger = run(out, job)
    log = logger.log
    assert len(log["rollout_score"]) == 2
    assert "dyn_loss_0" in log and "policy_update_time" in log
    assert os.path.exists(os.path.join(out, "iterations",
                                       "policy_final.pickle"))
    assert os.path.exists(os.path.join(out, "logs", "log.csv"))
    assert np.isfinite(log["eval_score"][-1])


def test_sweep_grid_expansion_and_run(tmp_path):
    from mjrl_tpu.utils.sweep import expand_grid, run_sweep
    combos = expand_grid(["a=1,2", "b=x"])
    assert combos == [["a=1", "b=x"], ["a=2", "b=x"]]

    calls = []

    def entry(job_dir, cfg_path):
        calls.append(job_dir)
        import json
        with open(cfg_path) as f:
            cfg = json.load(f)
        assert "seed" in cfg

    run_sweep(str(tmp_path), {"seed": 0, "x": 1}, ["seed=1,2"], entry)
    assert len(calls) == 2
    import os
    assert os.path.exists(tmp_path / "seed=1" / "config.json")
