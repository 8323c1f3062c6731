"""Run the UNMODIFIED reference mjrl (torch) on real MuJoCo 3.10 and dump
its learning curve — the ground truth our TPU rebuild is compared against.

The reference package is imported straight from /root/reference with two
shims on sys.path: a minimal ``gym`` module (shims/gym) and MuJoCo-3.10
envs implementing the reference env protocol (shims/mujoco310_envs.py).
The algorithm code (NPG, policy, baseline, sampler, GAE) is the
reference's own, untouched.

Configs mirror the reference smoke tests:
  point_mass — tests/point_mass_test.py:17-28 (50 it x 40 traj, MLP 32x32,
               step 0.05, gamma 0.95, lambda 0.97, seed 500)
  swimmer    — examples/example_configs/swimmer_npg.txt (50 it x 10 traj,
               MLP 64x64, step 0.1, gamma 0.995, lambda 0.97, seed 123)

    python benchmarks/parity/run_reference.py --env point_mass --seed 500
"""

import argparse
import json
import os
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(_HERE, "shims"))
sys.path.insert(0, "/root/reference")

import numpy as np  # noqa: E402

CONFIGS = {
    "point_mass": dict(env_cls="PointMassRef", hidden=(32, 32), niter=50,
                       num_traj=40, step=0.05, gamma=0.95, lam=0.97),
    "swimmer": dict(env_cls="SwimmerRef", hidden=(64, 64), niter=50,
                    num_traj=10, step=0.1, gamma=0.995, lam=0.97),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--env", default="point_mass", choices=sorted(CONFIGS))
    ap.add_argument("--seed", type=int, default=500)
    ap.add_argument("--niter", type=int, default=None)
    args = ap.parse_args()
    cfg = CONFIGS[args.env]
    niter = cfg["niter"] if args.niter is None else args.niter

    import mujoco310_envs
    from mjrl.algos.npg_cg import NPG
    from mjrl.baselines.mlp_baseline import MLPBaseline
    from mjrl.policies.gaussian_mlp import MLP
    from mjrl.utils.gym_env import GymEnv

    np.random.seed(args.seed)
    e = GymEnv(getattr(mujoco310_envs, cfg["env_cls"])())
    policy = MLP(e.spec, hidden_sizes=cfg["hidden"], seed=args.seed)
    baseline = MLPBaseline(e.spec, reg_coef=1e-3, batch_size=64, epochs=2,
                           learn_rate=1e-3)
    agent = NPG(e, policy, baseline, normalized_step_size=cfg["step"],
                seed=args.seed, save_logs=True)

    curve = {"impl": "reference", "env": args.env, "seed": args.seed,
             "stoc_pol_mean": [], "success_rate": [], "kl_dist": [],
             "log_std": []}
    for i in range(niter):
        stats = agent.train_step(N=cfg["num_traj"],
                                 sample_mode="trajectories",
                                 gamma=cfg["gamma"], gae_lambda=cfg["lam"],
                                 num_cpu=1)
        log = agent.logger.log
        curve["stoc_pol_mean"].append(float(stats[0]))
        curve["success_rate"].append(
            float(log["success_rate"][-1]) if "success_rate" in log
            else float("nan"))
        curve["kl_dist"].append(float(log["kl_dist"][-1]))
        curve["log_std"].append(
            np.asarray(policy.log_std.data.numpy()).tolist())
        print(f"iter {i:3d} ret {stats[0]:9.2f} "
              f"succ {curve['success_rate'][-1]:6.1f} "
              f"log_std {np.round(curve['log_std'][-1], 3)}", flush=True)

    out = os.path.join(_HERE, "curves",
                       f"reference_{args.env}_seed{args.seed}.json")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        json.dump(curve, f)
    print("wrote", out)


if __name__ == "__main__":
    main()
