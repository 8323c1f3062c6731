"""General NPG training CLI for any registered env — used for solver /
learning-curve validation runs (docs/BENCHMARKS.md "Task benchmarks").

    python tools/train_gym.py --env Walker2d-v3 --iters 50 --ntraj 100 \
        --horizon 1000 --solver pgs

Prints one JSON line per iteration and a final summary line.
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

from mjrl_tpu.algos import NPG, TRPO  # noqa: E402
from mjrl_tpu.baselines import MLPBaseline  # noqa: E402
from mjrl_tpu.envs import GymEnv  # noqa: E402
from mjrl_tpu.models.policies import MLP, LinearPolicy  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--env", default="Walker2d-v3")
    ap.add_argument("--solver", default=None,
                    help="penalty | pgs (env default when omitted)")
    ap.add_argument("--cone", default=None,
                    help="pyramidal | elliptic friction cone "
                         "(model default when omitted)")
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--ntraj", type=int, default=100)
    ap.add_argument("--horizon", type=int, default=1000)
    ap.add_argument("--step_size", type=float, default=0.05)
    ap.add_argument("--gamma", type=float, default=0.995)
    ap.add_argument("--gae", type=float, default=0.97)
    ap.add_argument("--seed", type=int, default=123)
    ap.add_argument("--init_log_std", type=float, default=-0.25)
    ap.add_argument("--min_log_std", type=float, default=-3.0,
                    help="entropy floor: log_std clamp applied on every "
                         "update (the Ant late-training-decay lever — "
                         "docs/BENCHMARKS.md round-5 decay study)")
    ap.add_argument("--hidden", type=int, nargs="+", default=[64, 64])
    ap.add_argument("--save", default=None,
                    help="pickle the trained policy here (for "
                         "benchmarks/parity/cross_eval.py)")
    ap.add_argument("--algo", default="npg", choices=("npg", "trpo"),
                    help="NPG (KL-guarded sqrt step) or TRPO "
                         "(backtracking line search)")
    ap.add_argument("--policy", default="mlp", choices=("mlp", "linear"),
                    help="MLP vs linear gaussian policy "
                         "(linear_nn_comparison.py sweep axis)")
    ap.add_argument("--ckpt", default=None,
                    help="iteration-checkpoint pickle; defaults to "
                         "<save>.ckpt when --save is given.  A wedged "
                         "TPU tunnel then costs minutes, not the run")
    ap.add_argument("--resume", action="store_true",
                    help="continue from --ckpt if it exists; previously "
                         "logged rows are reprinted so the jsonl stays "
                         "complete even when the wrapper truncates it")
    ap.add_argument("--ckpt_every", type=int, default=5)
    args = ap.parse_args()
    if args.ckpt is None and args.save:
        args.ckpt = args.save + ".ckpt"

    kw = {"solver": args.solver} if args.solver else {}
    if args.cone:
        kw["cone"] = args.cone
    e = GymEnv(args.env, env_kwargs=kw)
    if args.policy == "linear":
        policy = LinearPolicy(e.spec, seed=args.seed,
                              init_log_std=args.init_log_std,
                              min_log_std=args.min_log_std)
    else:
        policy = MLP(e.spec, hidden_sizes=tuple(args.hidden),
                     seed=args.seed, init_log_std=args.init_log_std,
                     min_log_std=args.min_log_std)
    baseline = MLPBaseline(e.spec, reg_coef=1e-3, batch_size=64, epochs=2,
                           learn_rate=1e-3)
    algo_cls = TRPO if args.algo == "trpo" else NPG
    agent = algo_cls(e, policy, baseline,
                     normalized_step_size=args.step_size, seed=args.seed,
                     save_logs=True)
    t0 = time.time()
    start_iter = 0
    best = -1e18
    best_params = None
    rows = []
    if args.resume and args.ckpt and os.path.exists(args.ckpt):
        import pickle
        with open(args.ckpt, "rb") as f:
            ck = pickle.load(f)
        policy.params = ck["policy_params"]
        policy.old_params = ck["policy_old_params"]
        policy.transforms = ck["policy_transforms"]
        baseline.state = ck["baseline_state"]
        agent.key = ck["rng_key"]
        start_iter = ck["iter"] + 1
        best = ck["best"]
        best_params = ck["best_params"]
        t0 = time.time() - ck["elapsed_s"]
        rows = ck["rows"]
        for row in rows:            # keep the (possibly truncated) jsonl whole
            print(json.dumps(row), flush=True)

    def save_ckpt(i):
        if not args.ckpt:
            return
        import pickle
        state = dict(policy_params=policy.params,
                     policy_old_params=policy.old_params,
                     policy_transforms=policy.transforms,
                     baseline_state=baseline.state,
                     rng_key=agent.key, iter=i, best=best,
                     best_params=best_params,
                     elapsed_s=time.time() - t0, rows=rows)
        tmp = args.ckpt + ".tmp"
        with open(tmp, "wb") as f:
            pickle.dump(state, f)
        os.replace(tmp, args.ckpt)

    for i in range(start_iter, args.iters):
        stats = agent.train_step(N=args.ntraj, sample_mode="trajectories",
                                 horizon=args.horizon, gamma=args.gamma,
                                 gae_lambda=args.gae)
        if float(stats[0]) > best:
            best = float(stats[0])
            best_params = policy.get_param_values()
        row = {"iter": i, "mean_return": round(float(stats[0]), 1),
               "elapsed_s": round(time.time() - t0, 1)}
        # per-iter training diagnostics (reference logs the same keys:
        # npg_cg.py:148-149, batch_reinforce.py:105-108; VF errors are
        # the late-training-decay instrumentation — round-4 VERDICT #5)
        log = agent.logger.log
        for k in ("alpha", "kl_dist", "surr_improvement", "num_samples",
                  "VF_error_before", "VF_error_after"):
            if k in log and log[k]:
                row[k] = round(float(log[k][-1]), 5)
        import numpy as _np
        row["log_std"] = round(
            float(_np.mean(_np.asarray(policy.params["log_std"]))), 3)
        if "num_samples" in row:
            row["ep_len"] = round(row["num_samples"] / args.ntraj, 1)
        rows.append(row)
        print(json.dumps(row), flush=True)
        if (i + 1) % args.ckpt_every == 0 or i == args.iters - 1:
            save_ckpt(i)
    print(json.dumps({
        "env": args.env, "solver": args.solver or "default",
        "cone": args.cone or "default",
        "final_return": round(float(stats[0]), 1),
        "best_return": round(best, 1),
        "iters": args.iters,
        "elapsed_s": round(time.time() - t0, 1),
    }), flush=True)
    if args.save:
        import pickle
        with open(args.save, "wb") as f:
            pickle.dump(policy, f)
        print(json.dumps({"saved_policy": args.save}), flush=True)
        # best-iterate snapshot alongside (train_agent.py:101-103's
        # best_policy tracking): hopper-class tasks can collapse after
        # peaking, and cross-eval should grade the best policy found
        if best_params is not None:
            policy.set_param_values(best_params)
            base, ext = os.path.splitext(args.save)
            with open(base + "_best" + ext, "wb") as f:
                pickle.dump(policy, f)
            print(json.dumps({"saved_best_policy": base + "_best" + ext,
                              "best_return": round(best, 1)}), flush=True)


if __name__ == "__main__":
    main()
