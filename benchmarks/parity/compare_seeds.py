"""Multi-seed parity bands: aggregate reference-vs-mjrl_tpu learning
curves across seeds (VERDICT round-2 item 7 — one seed per env is not a
distribution) and emit mean +/- range bands plus final-5 summaries.

    python benchmarks/parity/compare_seeds.py --env point_mass \
        --seeds 500 501 502
    python benchmarks/parity/compare_seeds.py --env swimmer \
        --seeds 123 124 125

Writes curves/<env>_seeds_summary.json and <env>_seeds.png.
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


def band(curves, key):
    n = min(len(c[key]) for c in curves)
    arr = np.array([c[key][:n] for c in curves], float)
    return arr


def final5(arr):
    return float(np.mean(arr[:, -5:]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--env", default="point_mass")
    ap.add_argument("--seeds", type=int, nargs="+", required=True)
    args = ap.parse_args()

    ref = [load("reference", args.env, s) for s in args.seeds]
    ours = [load("mjrl_tpu", args.env, s) for s in args.seeds]

    summary = {"env": args.env, "seeds": args.seeds}
    for impl, curves in (("reference", ref), ("mjrl_tpu", ours)):
        arr = band(curves, "stoc_pol_mean")
        per_seed = [float(np.mean(a[-5:])) for a in arr]
        summary[impl] = {
            "final5_per_seed": [round(v, 2) for v in per_seed],
            "final5_mean": round(float(np.mean(per_seed)), 2),
            "final5_std": round(float(np.std(per_seed)), 2),
            "best_iter_mean": round(float(np.mean(arr.max(axis=1))), 2),
        }
        sr = band(curves, "success_rate")
        if np.isfinite(sr).any() and sr.max() > 0:
            summary[impl]["final5_success_pct"] = round(
                float(np.mean(sr[:, -5:])), 1)

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    fig, ax = plt.subplots(figsize=(7, 4.5))
    for impl, curves, color in (("reference", ref, "#555555"),
                                ("mjrl_tpu", ours, "#0b6e99")):
        arr = band(curves, "stoc_pol_mean")
        x = np.arange(arr.shape[1])
        ax.plot(x, arr.mean(0), label=f"{impl} (n={len(curves)})",
                color=color)
        ax.fill_between(x, arr.min(0), arr.max(0), alpha=0.2, color=color)
    ax.set_xlabel("iteration")
    ax.set_ylabel("stochastic mean return")
    ax.set_title(f"{args.env}: seed band "
                 f"(reference torch+MuJoCo vs mjrl_tpu)")
    ax.legend()
    fig.tight_layout()
    png = os.path.join(_HERE, "curves", f"{args.env}_seeds.png")
    fig.savefig(png, dpi=120)

    out = os.path.join(_HERE, "curves", f"{args.env}_seeds_summary.json")
    with open(out, "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary))
    print("wrote", out, "and", png)


if __name__ == "__main__":
    main()
