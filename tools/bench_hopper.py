"""Secondary benchmark: wall-clock for Hopper-v3 NPG to reach reward 3000
(BASELINE.md target: < 5 minutes on one TPU chip).

Round-3 config: the env default is now the MuJoCo-faithful implicit
(newton) contact solver, step size 0.1 — the config whose trained
policy cross-evaluates at 3285 inside real MuJoCo (full 1000-step
episodes; docs/BENCHMARKS.md "Cross-simulator validation").  Round-3
measurement: crossed 3000 at iteration 27, ~61 s wall-clock (warm
compilation cache).

    python tools/bench_hopper.py
"""

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

from mjrl_tpu.algos import NPG  # noqa: E402
from mjrl_tpu.baselines import MLPBaseline  # noqa: E402
from mjrl_tpu.envs import GymEnv  # noqa: E402
from mjrl_tpu.models.policies import MLP  # noqa: E402


def main(target=3000.0, max_iters=200):
    e = GymEnv("Hopper-v3")
    policy = MLP(e.spec, hidden_sizes=(64, 64), seed=123,
                 init_log_std=-0.25)
    baseline = MLPBaseline(e.spec, reg_coef=1e-3, batch_size=64, epochs=2,
                           learn_rate=1e-3)
    agent = NPG(e, policy, baseline, normalized_step_size=0.1, seed=123,
                save_logs=True)
    t0 = time.time()
    reached = None
    for i in range(max_iters):
        stats = agent.train_step(N=100, sample_mode="trajectories",
                                 horizon=1000, gamma=0.995,
                                 gae_lambda=0.97)
        if stats[0] >= target:
            reached = time.time() - t0
            break
    elapsed = time.time() - t0
    print(json.dumps({
        "metric": "hopper_npg_seconds_to_3000",
        "value": round(reached if reached is not None else -1.0, 1),
        "unit": "s",
        "vs_baseline": round(300.0 / reached, 2) if reached else 0.0,
        "iters": i + 1,
        "final_return": round(float(stats[0]), 1),
        "total_elapsed": round(elapsed, 1),
    }))


if __name__ == "__main__":
    main()
