"""Headline benchmark: batched environment steps/sec on one chip.

Rolls a 64-64 gaussian MLP policy through B parallel swimmer environments
(the heaviest smooth-dynamics mjrl env: nv=7, 6-body kinematic chain,
viscous+density fluid model, 5 Euler sub-steps per control step) with
vmap(lax.scan) and reports *control* steps per second (1 control step = 1
policy forward + 5 physics sub-steps, matching the reference's sampler
throughput unit — mjrl/samplers/core.py:69-83 with frame_skip=5).

A contact-rich secondary metric (Hopper-v3: floor contacts, early
termination) is reported in the same JSON line so the constraint path is
tracked alongside the smooth headline.

Baseline: the driver-set rebuild target of 1,000,000 steps/sec/chip
(BASELINE.md).  Prints one JSON line.
"""

import json
import time

import jax

BATCH = 4096
STEPS = 100
CONTACT_BATCH = 4096   # measured sweet spot: 1.6M hopper steps/s vs 0.92M at 1024
CONTACT_STEPS = 100
BASELINE_STEPS_PER_SEC = 1_000_000.0


def _measure(env, batch, steps):
    from mjrl_tpu.models import GaussianMLP
    from mjrl_tpu.samplers import rollout_batch

    pol = GaussianMLP(env.observation_dim, env.action_dim,
                      hidden_sizes=(64, 64))
    params, transforms = pol.init(jax.random.PRNGKey(0))
    roll = jax.jit(lambda p, tr, k: rollout_batch(
        env, pol, p, tr, k, num_traj=batch, horizon=steps))

    # compile + warmup
    out = roll(params, transforms, jax.random.PRNGKey(1))
    out["rewards"].block_until_ready()

    # two rounds of 3 pipelined calls (dispatch overlaps compute, as in
    # real training loops); report the best round — robust to host-side
    # jitter on the shared axon tunnel
    best = float("inf")
    for r in range(2):
        t0 = time.perf_counter()
        for i in range(3):
            out = roll(params, transforms, jax.random.PRNGKey(2 + 3 * r + i))
        out["rewards"].block_until_ready()
        best = min(best, (time.perf_counter() - t0) / 3)
    return batch * steps / best


def main():
    from mjrl_tpu.envs import SwimmerEnv, make

    swimmer = _measure(SwimmerEnv(), BATCH, STEPS)
    try:
        hopper = _measure(make("Hopper-v3"), CONTACT_BATCH, CONTACT_STEPS)
    except Exception:
        hopper = None
    print(json.dumps({
        "metric": "swimmer_env_steps_per_sec",
        "value": round(swimmer),
        "unit": "control_steps/s/chip",
        "vs_baseline": round(swimmer / BASELINE_STEPS_PER_SEC, 3),
        "contact_rich": {"env": "Hopper-v3",
                         "steps_per_sec": round(hopper) if hopper else None},
    }))


if __name__ == "__main__":
    main()
