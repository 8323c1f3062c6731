"""Cross-simulator evaluation for the gym locomotion suite: roll an
mjrl_tpu-trained policy inside REAL MuJoCo 3.10 via gymnasium's v4
MuJoCo envs (same obs layout / reward / termination as
mjrl_tpu/envs/gym_suite.py — Ant 27-d, Walker2d/HalfCheetah 17-d,
Hopper 11-d).

Purpose: the contact solver is load-bearing for what gait NPG learns.
If a policy trained on our solver scores comparably in real MuJoCo, the
training gain is genuine capability; if it collapses, the solver let the
policy exploit non-physical contact response (this is how the penalty
swimmer thrash gait was caught — docs/BENCHMARKS.md "Cross-simulator
validation").

    python tools/train_gym.py --env Ant-v3 --solver pgs ... --save ant.pkl
    python benchmarks/parity/cross_eval_gym.py --policy ant.pkl --env Ant-v4
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--policy", required=True)
    ap.add_argument("--env", default="Ant-v4",
                    help="gymnasium MuJoCo env id (v4 matches our obs/"
                         "reward semantics)")
    ap.add_argument("--episodes", type=int, default=20)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--stochastic", action="store_true")
    ap.add_argument("--xml_option", default=None,
                    help="inject an <option> attribute into the env XML "
                         "before loading, e.g. cone=elliptic — the "
                         "cone-matched transfer arm for elliptic-trained "
                         "policies (docs/BENCHMARKS.md round-4 section)")
    args = ap.parse_args()

    import gymnasium
    kwargs = {}
    if args.xml_option:
        import re
        import tempfile
        from gymnasium.envs.mujoco import mujoco_env  # noqa: F401
        base = os.path.join(os.path.dirname(
            sys.modules["gymnasium.envs.mujoco"].__file__), "assets",
            args.env.split("-")[0].lower() + ".xml")
        txt = open(base).read()
        key, val = args.xml_option.split("=", 1)
        attr = f'{key}="{val}"'
        if "<option" in txt:
            txt = re.sub(r"<option", f"<option {attr}", txt, count=1)
        else:
            # no <option> element: add one right after the <mujoco ...> tag
            txt = txt.replace(">", f"><option {attr}/>", 1)
        fd, patched = tempfile.mkstemp(suffix=".xml")
        with os.fdopen(fd, "w") as f:
            f.write(txt)
        kwargs["xml_file"] = patched
        # only the v5 MujocoEnv generation accepts xml_file; the v5
        # default obs/reward match v4 for the locomotion suite
        args.env = args.env.split("-")[0] + "-v5"
    if args.env.startswith("Humanoid"):
        # Humanoid-v5 can drop the cinert/cvel/qfrc/cfrc obs blocks,
        # matching our 45-d [qpos[2:], qvel] observation
        kwargs = dict(include_cinert_in_observation=False,
                      include_cvel_in_observation=False,
                      include_qfrc_actuator_in_observation=False,
                      include_cfrc_ext_in_observation=False)
    env = gymnasium.make(args.env, **kwargs)

    with open(args.policy, "rb") as f:
        policy = pickle.load(f)

    returns, lengths = [], []
    for ep in range(args.episodes):
        o, _ = env.reset(seed=args.seed + ep)
        total, t = 0.0, 0
        while True:
            a, info = policy.get_action(np.asarray(o, np.float64))
            act = a if args.stochastic else info["evaluation"]
            o, r, terminated, truncated, _ = env.step(
                np.clip(np.asarray(act), env.action_space.low,
                        env.action_space.high))
            total += float(r)
            t += 1
            if terminated or truncated:
                break
        returns.append(total)
        lengths.append(t)
    returns = np.asarray(returns)
    print(json.dumps({
        "env": args.env, "policy": os.path.basename(args.policy),
        "episodes": args.episodes,
        "mode": "stochastic" if args.stochastic else "mean",
        "mean_return": round(float(returns.mean()), 1),
        "std_return": round(float(returns.std()), 1),
        "min_return": round(float(returns.min()), 1),
        "max_return": round(float(returns.max()), 1),
        "mean_length": round(float(np.mean(lengths)), 1),
    }))


if __name__ == "__main__":
    main()
