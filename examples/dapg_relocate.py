"""Adroit relocate via BC warm-start + DAPG fine-tune — the BASELINE.json
flagship config (reference pipeline shape:
/root/reference/examples/behavior_clone.py:47-58 warm start +
/root/reference/mjrl/algos/dapg.py:26-37 demo-augmented NPG; the original
task is hand_dapg's relocate-v0).

Demos come from the scripted pick-and-place expert
(tools/make_relocate_demos.py) — generate them first:

    python tools/make_relocate_demos.py --episodes 30 \
        --out relocate_demos.pkl
    python examples/dapg_relocate.py --demos relocate_demos.pkl
"""

import argparse
import json
import os
import pickle
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__),
                                                "..")))

import numpy as np

from mjrl_tpu.algos import BC, DAPG
from mjrl_tpu.baselines import MLPBaseline
from mjrl_tpu.envs import GymEnv
from mjrl_tpu.models.policies import MLP
from mjrl_tpu.samplers import sample_paths


def evaluate(env, policy, episodes=20, base_seed=7):
    paths = sample_paths(num_traj=episodes, env=env.env, policy=policy,
                         eval_mode=True, base_seed=base_seed)
    rets = [float(np.sum(p["rewards"])) for p in paths]
    succ = env.env.evaluate_success(paths)
    return float(np.mean(rets)), float(succ)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--demos", default="relocate_demos.pkl")
    ap.add_argument("--seed", type=int, default=123)
    ap.add_argument("--bc_epochs", type=int, default=50)
    ap.add_argument("--dapg_iters", type=int, default=30)
    ap.add_argument("--ntraj", type=int, default=50)
    ap.add_argument("--step_size", type=float, default=0.05)
    ap.add_argument("--lam_0", type=float, default=1e-2)
    ap.add_argument("--lam_1", type=float, default=0.95)
    ap.add_argument("--hidden", type=int, nargs="+", default=[64, 64])
    ap.add_argument("--save", default=None)
    ap.add_argument("--cross_eval_episodes", type=int, default=50,
                    help="built-in real-MuJoCo cross-eval episodes per "
                         "arm (mean + stochastic); 0 disables")
    args = ap.parse_args()

    with open(args.demos, "rb") as f:
        demo_paths = pickle.load(f)
    print(json.dumps({"demos": len(demo_paths),
                      "demo_return": round(float(np.mean(
                          [p["rewards"].sum() for p in demo_paths])), 1)}),
          flush=True)

    e = GymEnv("relocate-v0")
    policy = MLP(e.spec, hidden_sizes=tuple(args.hidden),
                 seed=args.seed, init_log_std=-0.5)

    # ---- BC warm start (reference behavior_clone.py:51-58)
    bc = BC(demo_paths, policy=policy, epochs=args.bc_epochs,
            batch_size=32, lr=1e-3, set_transforms=True)
    bc.train(suppress_fit_tqdm=True)
    bc_ret, bc_succ = evaluate(e, policy)
    print(json.dumps({"stage": "bc", "return": round(bc_ret, 1),
                      "success_rate": bc_succ}), flush=True)

    # ---- DAPG fine-tune (reference dapg.py:26-37)
    baseline = MLPBaseline(e.spec, reg_coef=1e-3, batch_size=64, epochs=2,
                           learn_rate=1e-3)
    agent = DAPG(e, policy, baseline, demo_paths=demo_paths,
                 normalized_step_size=args.step_size, lam_0=args.lam_0,
                 lam_1=args.lam_1, seed=args.seed, save_logs=True)
    best, best_params = -1e18, None
    for i in range(args.dapg_iters):
        stats = agent.train_step(N=args.ntraj,
                                 sample_mode="trajectories",
                                 horizon=e.horizon, gamma=0.995,
                                 gae_lambda=0.97)
        log = agent.logger.get_current_log()
        succ = log.get("success_rate", float("nan"))
        if float(stats[0]) > best:
            best = float(stats[0])
            best_params = policy.get_param_values()
        print(json.dumps({"iter": i,
                          "return": round(float(stats[0]), 1),
                          "success_rate": succ}), flush=True)
    ft_ret, ft_succ = evaluate(e, policy)
    print(json.dumps({"stage": "dapg", "return": round(ft_ret, 1),
                      "success_rate": ft_succ,
                      "bc_return": round(bc_ret, 1),
                      "bc_success_rate": bc_succ}), flush=True)
    if best_params is not None and ft_ret < best:
        policy.set_param_values(best_params)
    if args.save:
        with open(args.save, "wb") as f:
            pickle.dump(policy, f)
        print(json.dumps({"saved": args.save}), flush=True)

    # ---- built-in cross-eval stage: no in-sim Adroit headline without
    # its real-MuJoCo transfer twin (round-4 VERDICT weak #1/#6 — this
    # repo's own history shows in-sim success can overstate transfer).
    # Runs in a FRESH SUBPROCESS: this process's jax runtime is bound to
    # the TPU client, and a wedged tunnel (the known degraded-tunnel
    # stall) deadlocks in-process policy evaluation — a clean CPU
    # interpreter is immune.
    if args.cross_eval_episodes > 0:
        import subprocess
        tool = os.path.abspath(os.path.join(
            os.path.dirname(__file__), "..", "benchmarks", "parity",
            "cross_eval_relocate.py"))
        ppath = args.save or "/tmp/_dapg_relocate_policy.pkl"
        if not args.save:
            with open(ppath, "wb") as f:
                pickle.dump(policy, f)

        def arm(stochastic):
            cmd = [sys.executable, tool, "--policy", ppath,
                   "--episodes", str(args.cross_eval_episodes)]
            if stochastic:
                cmd.append("--stochastic")
            out = subprocess.run(cmd, capture_output=True, text=True,
                                 timeout=7200).stdout.strip().splitlines()
            return json.loads(out[-1])

        mean_arm = arm(False)
        stoc_arm = arm(True)
        print(json.dumps({
            "stage": "cross_eval",
            "in_sim_success_rate": ft_succ,
            "real_success_rate_mean": mean_arm["success_rate_pct"],
            "real_success_rate_stochastic": stoc_arm["success_rate_pct"],
            "real_mean_goal_steps": mean_arm["mean_goal_steps"],
            "episodes": args.cross_eval_episodes}), flush=True)


if __name__ == "__main__":
    main()
