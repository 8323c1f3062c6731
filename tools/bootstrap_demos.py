"""Bootstrap relocate demos from a trained DAPG policy in REAL MuJoCo.

The scripted expert's ~2% yield makes demo regeneration a lottery
(round-4 VERDICT weak #2); the r4 DAPG policy already succeeds ~20% in
real MuJoCo, so rolling it and keeping the successful episodes is a far
cheaper demo source (reference demo role: pickles consumed at
/root/reference/mjrl/algos/dapg.py:33-37 — the original project used
human teleop, likewise recorded in the real simulator).

    python tools/bootstrap_demos.py --policy benchmarks/crosseval/\
policies/r4_relocate_dapg_long.pkl --target 100 --out demos_boot.pkl
"""

import argparse
import json
import os
import pickle
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                "benchmarks", "parity"))

import jax

jax.config.update("jax_platforms", "cpu")   # host eval loop

import numpy as np  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--policy", required=True)
    ap.add_argument("--target", type=int, default=100,
                    help="stop once this many successful demos collected")
    ap.add_argument("--max_episodes", type=int, default=1500)
    ap.add_argument("--seed", type=int, default=1000)
    ap.add_argument("--mode", choices=("mean", "stochastic", "both"),
                    default="both",
                    help="action mode; 'both' alternates (stochastic "
                         "adds state diversity, mean adds yield)")
    ap.add_argument("--out", default="relocate_demos_boot.pkl")
    args = ap.parse_args()

    from real_adroit import make_real_relocate
    env = make_real_relocate(max_episode_steps=200)
    with open(args.policy, "rb") as f:
        policy = pickle.load(f)

    demos, attempts, succ = [], 0, 0
    for ep in range(args.max_episodes):
        if len(demos) >= args.target:
            break
        stochastic = (args.mode == "stochastic"
                      or (args.mode == "both" and ep % 2 == 1))
        o, _ = env.reset(seed=args.seed + ep)
        obs_l, act_l, rew_l, goal_l = [], [], [], []
        goal_steps = 0
        while True:
            a, info = policy.get_action(np.asarray(o, np.float64))
            act = np.clip(np.asarray(a if stochastic
                                     else info["evaluation"]), -1.0, 1.0)
            obs_l.append(np.asarray(o))
            act_l.append(act)
            o, r, term, trunc, step_info = env.step(act)
            rew_l.append(float(r))
            ok = bool(step_info.get("success", False))
            goal_l.append(ok)
            goal_steps += int(ok)
            if term or trunc:
                break
        attempts += 1
        if goal_steps > 25:
            succ += 1
            demos.append(dict(
                observations=np.array(obs_l), actions=np.array(act_l),
                rewards=np.array(rew_l),
                env_infos={"goal_achieved": np.array(goal_l)},
                terminated=False))
        if attempts % 25 == 0:
            print(json.dumps({"attempts": attempts, "demos": len(demos),
                              "yield_pct": round(100.0 * succ / attempts,
                                                 1)}), flush=True)
    with open(args.out, "wb") as f:
        pickle.dump(demos, f)
    print(json.dumps({"saved": args.out, "demos": len(demos),
                      "attempts": attempts,
                      "yield_pct": round(100.0 * succ / max(attempts, 1),
                                         1)}), flush=True)


if __name__ == "__main__":
    main()
