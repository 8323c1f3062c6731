"""Cross-simulator evaluation for Adroit relocate: roll an mjrl_tpu-trained
policy inside REAL MuJoCo via gymnasium-robotics' AdroitHandRelocate-v1.

Same obs layout as mjrl_tpu/envs/adroit.py (39-d: [qpos[:30], palm-obj,
palm-target, obj-target]) and the same normalized [-1,1]^30 action space,
so the policy transfers verbatim.  Success uses the original DAPG
criterion: goal_achieved (info['success']) on more than 25 steps of the
episode.

NOTE on reward scale: the installed gymnasium-robotics 1.4.1 dense reward
carries the Farama PR #220 sign bug (+0.1*||palm-obj|| instead of -), so
the dense return printed here is NOT comparable to our in-sim return;
success_rate is the transfer metric that matters (it's reward-free).

    python benchmarks/parity/cross_eval_relocate.py --policy relocate.pkl
"""

import argparse
import json
import os
import pickle
import sys

sys.path.insert(0, os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..", "..")))

import jax

jax.config.update("jax_platforms", "cpu")   # host eval loop; skip the TPU

import numpy as np


def cross_eval(policy, episodes=50, seed=0, stochastic=False, env=None):
    """Roll ``policy`` in real MuJoCo -> result dict.  ``env`` reuses an
    already-built shim env (callers evaluating several arms)."""
    if env is None:
        # the installed gymnasium-robotics XML breaks under mujoco >=
        # 3.3 (apirate schema removal) — load via the patched-asset shim
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from real_adroit import make_real_relocate
        env = make_real_relocate(max_episode_steps=200)
    returns, succ_steps, successes = [], [], 0
    for ep in range(episodes):
        o, _ = env.reset(seed=seed + ep)
        total, goal_steps = 0.0, 0
        while True:
            a, info = policy.get_action(np.asarray(o, np.float64))
            act = a if stochastic else info["evaluation"]
            o, r, terminated, truncated, step_info = env.step(
                np.clip(np.asarray(act), -1.0, 1.0))
            total += float(r)
            goal_steps += int(bool(step_info.get("success", False)))
            if terminated or truncated:
                break
        returns.append(total)
        succ_steps.append(goal_steps)
        successes += int(goal_steps > 25)
    return {
        "episodes": episodes,
        "mode": "stochastic" if stochastic else "mean",
        "success_rate_pct": round(100.0 * successes / episodes, 1),
        "mean_goal_steps": round(float(np.mean(succ_steps)), 1),
        "mean_return_buggy_dense": round(float(np.mean(returns)), 1),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--policy", required=True)
    ap.add_argument("--episodes", type=int, default=25)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--stochastic", action="store_true")
    ap.add_argument("--env", default="AdroitHandRelocate-v1")
    args = ap.parse_args()

    with open(args.policy, "rb") as f:
        policy = pickle.load(f)
    out = cross_eval(policy, episodes=args.episodes, seed=args.seed,
                     stochastic=args.stochastic)
    out.update(env=args.env, policy=os.path.basename(args.policy))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
