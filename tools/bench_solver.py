"""Penalty vs implicit-Newton rollout throughput on one chip.

Measures batched control-steps/sec for an env under both solvers (same
policy weights), reporting the implicit solver's overhead — the
locomotion default-flip gate is <= ~30% (VERDICT round 1, item 1).

    python tools/bench_solver.py --env Walker2d-v3 --batch 1024 --steps 100
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402

try:
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(__file__), "..",
                                   ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
except Exception:
    pass


def measure(env_id, solver, batch, steps):
    from mjrl_tpu.envs import make
    from mjrl_tpu.models import GaussianMLP
    from mjrl_tpu.samplers import rollout_batch

    env = make(env_id, solver=solver)
    pol = GaussianMLP(env.observation_dim, env.action_dim,
                      hidden_sizes=(64, 64))
    params, transforms = pol.init(jax.random.PRNGKey(0))
    roll = jax.jit(lambda p, tr, k: rollout_batch(
        env, pol, p, tr, k, num_traj=batch, horizon=steps))
    out = roll(params, transforms, jax.random.PRNGKey(1))
    out["rewards"].block_until_ready()
    best = float("inf")
    for r in range(2):
        t0 = time.perf_counter()
        for i in range(3):
            out = roll(params, transforms, jax.random.PRNGKey(2 + 3 * r + i))
        out["rewards"].block_until_ready()
        best = min(best, (time.perf_counter() - t0) / 3)
    return batch * steps / best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--env", default="Walker2d-v3")
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--steps", type=int, default=100)
    args = ap.parse_args()
    pen = measure(args.env, "penalty", args.batch, args.steps)
    newt = measure(args.env, "newton", args.batch, args.steps)
    print(json.dumps({
        "env": args.env,
        "penalty_steps_per_sec": round(pen),
        "newton_steps_per_sec": round(newt),
        "newton_overhead_pct": round(100.0 * (pen / newt - 1.0), 1),
    }))


if __name__ == "__main__":
    main()
