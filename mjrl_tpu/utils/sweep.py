"""Config sweeps (the role of the reference's hydra multirun launcher,
tests/hydra/config/hydra_npg_config.yaml:32-41 — without the hydra
dependency).

A sweep spec is a base config plus a grid of dotted-key overrides:

    python -m mjrl_tpu.utils.sweep --output /tmp/sweeps \
        --config examples/example_configs/swimmer_npg.json \
        --grid rl_step_size=0.05,0.1 seed=1,2,3 \
        --entry examples.policy_opt_job_script:main

Each grid point becomes a job directory ``<output>/<k=v,...>`` with its
own job_config.json.  The entry point is any ``fn(output, config_path)``
or ``fn(output, config_dict)`` callable (defaults to the policy-opt job
script's main).
"""

import argparse
import copy
import importlib
import itertools
import json
import os

from mjrl_tpu.utils.config import apply_overrides, load_config


def expand_grid(grid_args):
    """['a=1,2', 'b=x,y'] -> list of override lists covering the grid."""
    keys, values = [], []
    for item in grid_args:
        key, _, raw = item.partition("=")
        keys.append(key)
        values.append(raw.split(","))
    combos = []
    for point in itertools.product(*values):
        combos.append([f"{k}={v}" for k, v in zip(keys, point)])
    return combos


def run_sweep(output, base_config, grid, entry):
    """-> list of (job_dir, overrides).  ``entry(job_dir, config_path)``
    runs each point sequentially (one accelerator — the reference's local
    hydra launcher is also sequential)."""
    os.makedirs(output, exist_ok=True)
    results = []
    for overrides in expand_grid(grid):
        tag = ",".join(o.replace("/", "_") for o in overrides) or "base"
        job_dir = os.path.join(output, tag)
        os.makedirs(job_dir, exist_ok=True)
        cfg = apply_overrides(copy.deepcopy(base_config), overrides)
        cfg_path = os.path.join(job_dir, "config.json")
        with open(cfg_path, "w") as f:
            json.dump(cfg, f, indent=2, default=str)
        entry(job_dir, cfg_path)
        results.append((job_dir, overrides))
    return results


def _resolve_entry(spec):
    mod_name, _, fn_name = spec.partition(":")
    mod = importlib.import_module(mod_name)
    return getattr(mod, fn_name or "main")


def main():
    parser = argparse.ArgumentParser(description="Grid sweep runner")
    parser.add_argument("--output", type=str, required=True)
    parser.add_argument("--config", type=str, required=True)
    parser.add_argument("--grid", type=str, nargs="+", default=[],
                        help="key=v1,v2 ... (cartesian product)")
    parser.add_argument("--entry", type=str,
                        default="examples.policy_opt_job_script:main")
    args = parser.parse_args()
    run_sweep(args.output, load_config(args.config), args.grid,
              _resolve_entry(args.entry))


if __name__ == "__main__":
    main()
