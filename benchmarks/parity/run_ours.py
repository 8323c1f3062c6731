"""Run mjrl_tpu with the reference smoke configs and dump the learning
curve in the same JSON schema as run_reference.py, for side-by-side
comparison (compare.py).

    python benchmarks/parity/run_ours.py --env point_mass --seed 500
"""

import argparse
import json
import os
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.abspath(os.path.join(_HERE, "..", "..")))

import numpy as np  # noqa: E402

try:
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.abspath(os.path.join(_HERE, "..", "..",
                                                   ".jax_cache")))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
except Exception:
    pass

CONFIGS = {
    "point_mass": dict(env_id="mjrl_point_mass-v0", hidden=(32, 32),
                       niter=50, num_traj=40, step=0.05, gamma=0.95,
                       lam=0.97),
    "swimmer": dict(env_id="mjrl_swimmer-v0", hidden=(64, 64), niter=50,
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

    from mjrl_tpu.algos import NPG
    from mjrl_tpu.baselines import MLPBaseline
    from mjrl_tpu.envs import GymEnv
    from mjrl_tpu.models.policies import MLP

    e = GymEnv(cfg["env_id"])
    policy = MLP(e.spec, hidden_sizes=cfg["hidden"], seed=args.seed)
    baseline = MLPBaseline(e.spec, reg_coef=1e-3, batch_size=64, epochs=2,
                           learn_rate=1e-3)
    agent = NPG(e, policy, baseline, normalized_step_size=cfg["step"],
                seed=args.seed, save_logs=True)

    curve = {"impl": "mjrl_tpu", "env": args.env, "seed": args.seed,
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
            np.asarray(policy.params["log_std"]).tolist())
        print(f"iter {i:3d} ret {stats[0]:9.2f} "
              f"succ {curve['success_rate'][-1]:6.1f} "
              f"log_std {np.round(curve['log_std'][-1], 3)}", flush=True)

    out = os.path.join(_HERE, "curves",
                       f"mjrl_tpu_{args.env}_seed{args.seed}.json")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        json.dump(curve, f)
    print("wrote", out)

    import pickle
    ppath = os.path.join(_HERE, "curves",
                         f"mjrl_tpu_{args.env}_seed{args.seed}_policy.pkl")
    with open(ppath, "wb") as f:
        pickle.dump(policy, f)
    print("wrote", ppath)


if __name__ == "__main__":
    main()
