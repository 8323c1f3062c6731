"""Compare reference-vs-mjrl_tpu learning curves and emit the parity
artifact: a side-by-side PNG + summary JSON under benchmarks/parity/.

    python benchmarks/parity/compare.py --env point_mass --seed 500
"""

import argparse
import json
import os

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))


def load(impl, env, seed):
    path = os.path.join(_HERE, "curves", f"{impl}_{env}_seed{seed}.json")
    with open(path) as f:
        return json.load(f)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--env", default="point_mass")
    ap.add_argument("--seed", type=int, default=500)
    args = ap.parse_args()

    ref = load("reference", args.env, args.seed)
    ours = load("mjrl_tpu", args.env, args.seed)
    n = min(len(ref["stoc_pol_mean"]), len(ours["stoc_pol_mean"]))

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(1, 3, figsize=(15, 4))
    for ax, key, title in zip(
            axes, ["stoc_pol_mean", "success_rate", "log_std"],
            ["mean return (stochastic)", "success rate (%)",
             "mean log_std"]):
        for curve, label, color in [(ref, "reference (torch+MuJoCo 3.10)",
                                     "tab:blue"),
                                    (ours, "mjrl_tpu (JAX)", "tab:orange")]:
            y = np.asarray(curve[key][:n], dtype=float)
            if key == "log_std":
                y = y.mean(axis=-1)
            ax.plot(y, label=label, color=color)
        ax.set_title(f"{args.env}: {title}")
        ax.set_xlabel("iteration")
        ax.grid(alpha=0.3)
    axes[0].legend()
    fig.tight_layout()
    png = os.path.join(_HERE, f"{args.env}_seed{args.seed}.png")
    fig.savefig(png, dpi=110)

    def tail(c, key, k=5):
        v = [x for x in c[key][:n][-k:] if not np.isnan(x)]
        return float(np.mean(v)) if v else float("nan")

    summary = {
        "env": args.env, "seed": args.seed, "iters": n,
        "final_return_reference": tail(ref, "stoc_pol_mean"),
        "final_return_mjrl_tpu": tail(ours, "stoc_pol_mean"),
        "final_success_reference": tail(ref, "success_rate"),
        "final_success_mjrl_tpu": tail(ours, "success_rate"),
        "plot": os.path.relpath(png, _HERE),
    }
    out = os.path.join(_HERE, f"{args.env}_seed{args.seed}_summary.json")
    with open(out, "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary, indent=2))


if __name__ == "__main__":
    main()
