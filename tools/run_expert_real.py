"""Run the scripted relocate expert inside REAL MuJoCo
(AdroitHandRelocate-v1 via the apirate shim) — the ground-truth
test bench for the demo controller before it drives the JAX engine.

    python tools/run_expert_real.py --episodes 5 --verbose
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                "benchmarks", "parity"))

import numpy as np


class RealBackend:
    """pose_and_jac / fk_shadow callbacks over a live MjData plus a
    shadow MjData for IK (kinematics-only evaluations at candidate
    arm configurations, no sim stepping)."""

    def __init__(self, m, u, sid):
        import mujoco
        self._mj = mujoco
        self.m, self.u, self.sid = m, u, sid
        self.shadow = mujoco.MjData(m)

    def pose_and_jac(self, qpos):
        mujoco, m, d, sid = self._mj, self.m, self.u.data, self.sid
        jacp = np.zeros((3, m.nv))
        jacr = np.zeros((3, m.nv))
        mujoco.mj_jacSite(m, d, jacp, jacr, sid)
        return (d.site_xpos[sid].copy(),
                d.site_xmat[sid].reshape(3, 3).copy(),
                jacp[:, :8], jacr[:, :8])

    def fk_shadow(self, q8):
        mujoco, m, s, sid = self._mj, self.m, self.shadow, self.sid
        s.qpos[:] = self.u.data.qpos
        s.qpos[:8] = q8
        mujoco.mj_kinematics(m, s)
        mujoco.mj_comPos(m, s)
        jacp = np.zeros((3, m.nv))
        jacr = np.zeros((3, m.nv))
        mujoco.mj_jacSite(m, s, jacp, jacr, sid)
        return (s.site_xpos[sid].copy(),
                s.site_xmat[sid].reshape(3, 3).copy(),
                jacp[:, :8], jacr[:, :8])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--episodes", type=int, default=5)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--noise", type=float, default=0.0)
    ap.add_argument("--verbose", action="store_true")
    ap.add_argument("--out", default=None, help="pickle demo paths here")
    ap.add_argument("--horizon", type=int, default=200)
    args = ap.parse_args()

    import mujoco
    from real_adroit import make_real_relocate
    from tools.relocate_expert import RelocateExpert

    env = make_real_relocate(max_episode_steps=args.horizon)
    u = env.unwrapped
    m = u.model
    sid = mujoco.mj_name2id(m, mujoco.mjtObj.mjOBJ_SITE, "S_grasp")
    bid = mujoco.mj_name2id(m, mujoco.mjtObj.mjOBJ_BODY, "Object")
    tid = mujoco.mj_name2id(m, mujoco.mjtObj.mjOBJ_SITE, "target")
    mid = 0.5 * (m.actuator_ctrlrange[:, 0] + m.actuator_ctrlrange[:, 1])
    rng_half = 0.5 * (m.actuator_ctrlrange[:, 1] - m.actuator_ctrlrange[:, 0])
    backend = RealBackend(m, u, sid)
    pose_and_jac, fk_shadow = backend.pose_and_jac, backend.fk_shadow

    expert = RelocateExpert(noise=args.noise, seed=args.seed)
    demos, succ = [], 0
    for ep in range(args.episodes):
        o, _ = env.reset(seed=args.seed + ep)
        expert.reset()
        d = u.data
        obs_l, act_l, rew_l, goal_l = [], [], [], []
        goal_steps = 0
        for t in range(args.horizon):
            ctrl = expert.action(np.asarray(d.qpos), pose_and_jac,
                                 d.xpos[bid], d.site_xpos[tid],
                                 fk_shadow=fk_shadow,
                                 qfrc_bias=np.asarray(d.qfrc_bias))
            a = np.clip((ctrl - mid) / np.maximum(rng_half, 1e-8), -1, 1)
            obs_l.append(np.asarray(o))
            act_l.append(a)
            o, r, term, trunc, info = env.step(a)
            rew_l.append(float(r))
            ok = bool(info.get("success", False))
            goal_l.append(ok)
            goal_steps += int(ok)
            if args.verbose and t % 10 == 0:
                from tools.relocate_expert import CAGE_LOCAL
                ball = d.xpos[bid]
                R = d.site_xmat[sid].reshape(3, 3)
                cage = d.site_xpos[sid] + R @ CAGE_LOCAL
                print(f"  t={t:3d} ball={np.round(ball, 3)} "
                      f"cage={np.round(cage, 3)} pitch={R[2, 0]:+.2f} "
                      f"arm={np.round(d.qpos[:8], 2)} "
                      f"phase={expert._phase.get(0, '?')}:"
                      f"{expert._count.get(0, 0)}")
            if term or trunc:
                break
        success = goal_steps > 25
        succ += int(success)
        print(json.dumps({"ep": ep, "goal_steps": goal_steps,
                          "success": bool(success),
                          "ball_final": [round(float(x), 3)
                                         for x in d.xpos[bid]]}),
              flush=True)
        if success:
            demos.append(dict(
                observations=np.array(obs_l), actions=np.array(act_l),
                rewards=np.array(rew_l),
                env_infos={"goal_achieved": np.array(goal_l)},
                terminated=False))
    print(json.dumps({"episodes": args.episodes, "successes": succ,
                      "rate": round(100.0 * succ / args.episodes, 1)}),
          flush=True)
    if args.out and demos:
        import pickle
        with open(args.out, "wb") as f:
            pickle.dump(demos, f)
        print(json.dumps({"saved": args.out, "demos": len(demos)}))


if __name__ == "__main__":
    main()
