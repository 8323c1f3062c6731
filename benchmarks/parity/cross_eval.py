"""Cross-simulator evaluation: roll an mjrl_tpu-trained policy inside
REAL MuJoCo 3.10 (the shim envs the reference side of the harness runs
on).  If the score transfers, the training gain is genuine capability,
not an artifact of our physics being easier than MuJoCo's.

    python benchmarks/parity/cross_eval.py --env swimmer --seed 123
"""

import argparse
import os
import pickle
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(_HERE, "shims"))
sys.path.insert(0, os.path.abspath(os.path.join(_HERE, "..", "..")))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")   # host loop; don't hit the TPU

import numpy as np  # noqa: E402

ENV_CLS = {"point_mass": "PointMassRef", "swimmer": "SwimmerRef"}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--env", default="swimmer", choices=sorted(ENV_CLS))
    ap.add_argument("--seed", type=int, default=123)
    ap.add_argument("--episodes", type=int, default=20)
    ap.add_argument("--stochastic", action="store_true",
                    help="sample actions instead of using the mean")
    args = ap.parse_args()

    import mujoco310_envs
    env = getattr(mujoco310_envs, ENV_CLS[args.env])()

    ppath = os.path.join(_HERE, "curves",
                         f"mjrl_tpu_{args.env}_seed{args.seed}_policy.pkl")
    with open(ppath, "rb") as f:
        policy = pickle.load(f)

    horizon = env.spec.max_episode_steps
    returns = []
    for ep in range(args.episodes):
        env.seed(args.seed + ep)
        o = env.reset()
        total = 0.0
        for t in range(horizon):
            a, info = policy.get_action(np.asarray(o, np.float64))
            act = a if args.stochastic else info["evaluation"]
            o, r, done, _ = env.step(np.asarray(act))
            total += r
            if done:
                break
        returns.append(total)
    returns = np.asarray(returns)
    print({"env": args.env, "episodes": args.episodes,
           "mode": "stochastic" if args.stochastic else "mean",
           "mujoco310_return_mean": round(float(returns.mean()), 2),
           "mujoco310_return_std": round(float(returns.std()), 2),
           "min": round(float(returns.min()), 2),
           "max": round(float(returns.max()), 2)})


if __name__ == "__main__":
    main()
