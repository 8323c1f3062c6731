"""Grasp parameter search for the relocate expert, in REAL MuJoCo.

Sweeps (pitch, cage_local, standoff mode, flex levels) over a few reset
seeds and scores each combo by (ball lifted off table, final
|ball - target|, goal steps).  The winning combo becomes the expert's
defaults.

    python tools/grasp_search.py
"""

import itertools
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                "benchmarks", "parity"))

import numpy as np


def run_combo(env, u, ids, expert, seed, horizon=200):
    import mujoco  # noqa: F401
    m = u.model
    sid, bid, tid = ids
    mid = 0.5 * (m.actuator_ctrlrange[:, 0] + m.actuator_ctrlrange[:, 1])
    half = 0.5 * (m.actuator_ctrlrange[:, 1] - m.actuator_ctrlrange[:, 0])
    o, _ = env.reset(seed=seed)
    expert.reset()
    d = u.data
    import mujoco

    def pose_and_jac(qpos):
        jacp = np.zeros((3, m.nv))
        jacr = np.zeros((3, m.nv))
        mujoco.mj_jacSite(m, d, jacp, jacr, sid)
        return (d.site_xpos[sid].copy(),
                d.site_xmat[sid].reshape(3, 3).copy(),
                jacp[:, :8], jacr[:, :8])

    goal_steps, max_ball_z = 0, 0.0
    for t in range(horizon):
        ctrl = expert.action(np.asarray(d.qpos), pose_and_jac,
                             d.xpos[bid], d.site_xpos[tid])
        a = np.clip((ctrl - mid) / np.maximum(half, 1e-8), -1, 1)
        o, r, term, trunc, info = env.step(a)
        goal_steps += int(bool(info.get("success", False)))
        max_ball_z = max(max_ball_z, float(d.xpos[bid][2]))
        if term or trunc:
            break
    final_dist = float(np.linalg.norm(d.xpos[bid] - d.site_xpos[tid]))
    return dict(goal_steps=goal_steps, max_ball_z=round(max_ball_z, 3),
                final_dist=round(final_dist, 3),
                success=goal_steps > 25)


def main():
    import mujoco
    from real_adroit import make_real_relocate
    from tools.relocate_expert import RelocateExpert

    env = make_real_relocate()
    u = env.unwrapped
    m = u.model
    ids = (mujoco.mj_name2id(m, mujoco.mjtObj.mjOBJ_SITE, "S_grasp"),
           mujoco.mj_name2id(m, mujoco.mjtObj.mjOBJ_BODY, "Object"),
           mujoco.mj_name2id(m, mujoco.mjtObj.mjOBJ_SITE, "target"))

    pitches = [0.7, 1.0, 1.25]
    cages = [(0.045, 0.0, 0.015), (0.055, -0.015, 0.02),
             (0.035, -0.01, 0.025)]
    stands = [("above", 0.09), ("axis", 0.09)]
    seeds = [0, 1, 2]

    results = []
    for pitch, cage, (smode, sdist) in itertools.product(
            pitches, cages, stands):
        scores = []
        for seed in seeds:
            ex = RelocateExpert(pitch=pitch, cage_local=cage,
                                standoff=smode, standoff_dist=sdist)
            scores.append(run_combo(env, u, ids, ex, seed))
        lifted = sum(s["max_ball_z"] > 0.08 for s in scores)
        succ = sum(s["success"] for s in scores)
        row = dict(pitch=pitch, cage=cage, standoff=smode,
                   lifted=lifted, successes=succ,
                   mean_final=round(float(np.mean(
                       [s["final_dist"] for s in scores])), 3),
                   mean_goal=round(float(np.mean(
                       [s["goal_steps"] for s in scores])), 1))
        results.append(row)
        print(json.dumps(row), flush=True)
    results.sort(key=lambda r: (-r["successes"], -r["lifted"],
                                r["mean_final"]))
    print("BEST:", json.dumps(results[0]))


if __name__ == "__main__":
    main()
