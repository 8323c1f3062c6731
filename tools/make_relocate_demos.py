"""Relocate demo generation on the mjrl_tpu JAX engine.

The demo source for the DAPG flagship pipeline (reference role:
/root/reference/examples/behavior_clone.py:47-50 samples expert paths;
the original DAPG project used human teleop).  The expert is the
IK-waypoint claw controller from tools/relocate_expert.py, developed
and validated against REAL MuJoCo (tools/run_expert_real.py) and driven
here through the mjrl_tpu engine: env steps run batched-lockstep on the
default JAX platform while the expert's FK/Jacobian/gravity oracles are
plain numpy chain kinematics (validated vs mj_jacSite/qfrc_bias to
~1e-8) — the per-step host control loop stays off the accelerator.

    python tools/make_relocate_demos.py --episodes 64 --out demos.pkl
"""

import argparse
import json
import os
import pickle
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def _vee(A):
    return 0.5 * np.array([A[2, 1] - A[1, 2], A[0, 2] - A[2, 0],
                           A[1, 0] - A[0, 1]])


def _quat_mat(q):
    w, x, y, z = q / np.linalg.norm(q)
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])


def _axis_mat(a, t):
    a = a / np.linalg.norm(a)
    K = np.array([[0, -a[2], a[1]], [a[2], 0, -a[0]], [-a[1], a[0], 0.0]])
    return np.eye(3) + np.sin(t) * K + (1 - np.cos(t)) * (K @ K)


class NumpyAdroitBackend:
    """Expert oracles (palm pose + analytic Jacobians, gravity bias) as
    plain numpy chain kinematics over the Model tables — microseconds
    per call, no XLA.  (The jax.jacobian-of-unrolled-FK variant took
    >20 min to compile on the single host core and starved the TPU
    dispatch loop.)  Adroit is all slide/hinge joints, so the classic
    revolute/prismatic Jacobian columns apply exactly; validated against
    mj_jacSite to 1e-10 on random configurations."""

    def __init__(self, env):
        from mjrl_tpu.physics.dynamics import ancestor_mask
        from mjrl_tpu.physics.model import HINGE, SLIDE
        m = env.model
        self.m = m
        self.HINGE, self.SLIDE = HINGE, SLIDE
        self.sid = env._palm_sid
        self.sb = m.site_body[self.sid]
        self.body_pos = np.asarray(m.body_pos, float)
        self.body_quat_mat = [
            _quat_mat(np.asarray(m.body_quat[b], float))
            for b in range(m.nbody)]
        self.site_pos = np.asarray(m.site_pos[self.sid], float)
        self.site_mat = _quat_mat(np.asarray(m.site_quat[self.sid],
                                             float))
        self.jnt_pos = np.asarray(m.jnt_pos, float)
        self.jnt_axis = np.asarray(m.jnt_axis, float)
        self.jnt_ref = np.asarray(m.jnt_ref, float)
        self.masses = np.asarray(m.body_mass, float)
        self.ipos = np.asarray(m.body_ipos, float)
        self.amask = ancestor_mask(m)          # (nbody, nv)
        self._qrest = None

    def _fk(self, qpos):
        """Full-body numpy FK -> (xpos, xmat, jnt anchor/axis world)."""
        m = self.m
        xpos = [np.zeros(3)]
        xmat = [np.eye(3)]
        anchor = [None] * m.njnt
        axis_w = [None] * m.njnt
        for b in range(1, m.nbody):
            p = m.body_parent[b]
            mat = xmat[p] @ self.body_quat_mat[b]
            pos = xpos[p] + xmat[p] @ self.body_pos[b]
            for j in m.body_jnts[b]:
                adr = m.jnt_qposadr[j]
                anc = pos + mat @ self.jnt_pos[j]
                ax = mat @ self.jnt_axis[j]
                anchor[j] = anc
                axis_w[j] = ax
                q = qpos[adr] - self.jnt_ref[j]
                if m.jnt_type[j] == self.SLIDE:
                    pos = pos + ax * q
                else:                          # HINGE
                    rot = _axis_mat(ax, q)
                    mat = rot @ mat
                    pos = anc - mat @ self.jnt_pos[j]
            xpos.append(pos)
            xmat.append(mat)
        return xpos, xmat, anchor, axis_w

    def set_state(self, qpos):
        self._qrest = np.asarray(qpos, float)[8:]

    def _oracle(self, q8):
        qpos = np.concatenate([np.asarray(q8, float), self._qrest])
        xpos, xmat, anchor, axis_w = self._fk(qpos)
        p = xpos[self.sb] + xmat[self.sb] @ self.site_pos
        R = xmat[self.sb] @ self.site_mat
        jp = np.zeros((3, 8))
        jr = np.zeros((3, 8))
        m = self.m
        for j in range(m.njnt):
            d = m.jnt_dofadr[j] if hasattr(m, "jnt_dofadr") else j
            if d >= 8:
                break
            if not self.amask[self.sb, d]:
                continue
            if m.jnt_type[j] == self.SLIDE:
                jp[:, d] = axis_w[j]
            else:
                jp[:, d] = np.cross(axis_w[j], p - anchor[j])
                jr[:, d] = axis_w[j]
        return p, R, jp, jr, xpos, xmat, anchor, axis_w

    def pose_and_jac(self, qpos):
        self.set_state(qpos)
        p, R, jp, jr, *_ = self._oracle(np.asarray(qpos, float)[:8])
        return p, R, jp, jr

    def fk_shadow(self, q8):
        p, R, jp, jr, *_ = self._oracle(q8)
        return p, R, jp, jr

    def qfrc_bias(self, qpos):
        """Gravity generalized force on the 8 pose dofs:
        G_d = sum_i m_i (-g) . dcom_i/dq_d (the droop load the servo
        feedforward cancels; Coriolis terms are negligible here)."""
        q = np.asarray(qpos, float)
        self.set_state(q)
        _, _, _, _, xpos, xmat, anchor, axis_w = self._oracle(q[:8])
        m = self.m
        coms = np.stack([xpos[b] + xmat[b] @ self.ipos[b]
                         for b in range(m.nbody)])
        g = np.array([0.0, 0.0, -9.81])
        out = np.zeros(8)
        for j in range(m.njnt):
            d = m.jnt_dofadr[j] if hasattr(m, "jnt_dofadr") else j
            if d >= 8:
                break
            ax, anc = axis_w[j], anchor[j]
            tot = np.zeros(3)
            for b in range(1, m.nbody):
                if not self.amask[b, d] or self.masses[b] == 0:
                    continue
                if m.jnt_type[j] == self.SLIDE:
                    dcom = ax
                else:
                    dcom = np.cross(ax, coms[b] - anc)
                tot += self.masses[b] * dcom
            out[d] = -np.dot(tot, g)
        return out


def run_batch(env, keys, horizon=200, noise=0.0, seed=0):
    """Lockstep batched episodes: ONE vmapped jitted env step per
    control step; the expert runs per-slot on the host."""
    import jax
    import jax.numpy as jnp
    from tools.relocate_expert import RelocateExpert

    B = len(keys)
    state = jax.jit(jax.vmap(env.reset))(jnp.stack(keys))
    step_b = jax.jit(jax.vmap(env.step))
    expert = RelocateExpert(noise=noise, seed=seed)
    backend = NumpyAdroitBackend(env)  # stateless between slots via
    backends = [backend] * B           # set_state per slot

    cr = env.model.ctrlrange
    mid = np.asarray(0.5 * (cr[:, 0] + cr[:, 1]))
    half = np.asarray(0.5 * (cr[:, 1] - cr[:, 0]))

    es0 = {k: np.asarray(v) for k, v in env.get_env_state(state).items()}
    obs_l, act_l, rew_l, goal_l = [], [], [], []
    for t in range(horizon):
        obs = np.asarray(state.obs)
        qpos = np.asarray(state.physics.qpos)
        # ball/target world positions from the obs layout:
        # obs = [qpos[:30], palm-obj, palm-target, obj-target]
        acts = np.zeros((B, 30))
        for b in range(B):
            be = backends[b]
            be.set_state(qpos[b])
            palm, _, _, _ = be.pose_and_jac(qpos[b])
            ball = palm - obs[b, 30:33]
            target = palm - obs[b, 33:36]
            ctrl = expert.action(qpos[b], be.pose_and_jac, ball, target,
                                 b=b, fk_shadow=be.fk_shadow,
                                 qfrc_bias=be.qfrc_bias(qpos[b]))
            acts[b] = np.clip((ctrl - mid) / np.maximum(half, 1e-8),
                              -1, 1)
        obs_l.append(obs)
        act_l.append(acts)
        state = step_b(state, jnp.asarray(acts, jnp.float32))
        rew_l.append(np.asarray(state.reward))
        goal_l.append(np.asarray(state.info["goal_achieved"]))
    obs_a = np.stack(obs_l, 1)
    act_a = np.stack(act_l, 1)
    rew_a = np.stack(rew_l, 1)
    goal_a = np.stack(goal_l, 1)
    return [dict(observations=obs_a[b], actions=act_a[b],
                 rewards=rew_a[b],
                 env_infos={"goal_achieved": goal_a[b]},
                 init_state={k: v[b] for k, v in es0.items()},
                 terminated=False)
            for b in range(B)]


def main():
    import jax
    if "--cpu" in sys.argv:
        sys.argv.remove("--cpu")
        jax.config.update("jax_platforms", "cpu")
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(os.path.dirname(__file__), "..",
                                       ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          2.0)
    except Exception:
        pass
    ap = argparse.ArgumentParser()
    ap.add_argument("--episodes", type=int, default=32)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--horizon", type=int, default=200)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default=None)
    ap.add_argument("--noise", type=float, default=0.0)
    args = ap.parse_args()

    from mjrl_tpu.envs.adroit import AdroitRelocateEnv
    env = AdroitRelocateEnv()

    demos, attempts, succ = [], 0, 0
    ep = 0
    while attempts < args.episodes:
        B = min(args.batch, args.episodes - attempts)
        keys = [jax.random.PRNGKey(args.seed * 100000 + attempts + i)
                for i in range(B)]
        paths = run_batch(env, keys, args.horizon, args.noise, args.seed)
        for path in paths:
            ok = int(np.sum(path["env_infos"]["goal_achieved"]) > 25)
            succ += ok
            print(json.dumps({
                "ep": ep,
                "return": round(float(path["rewards"].sum()), 1),
                "goal_steps": int(np.sum(
                    path["env_infos"]["goal_achieved"])),
                "success": bool(ok)}), flush=True)
            if ok:
                demos.append(path)
            ep += 1
        attempts += B
    print(json.dumps({"episodes": attempts, "successes": succ,
                      "rate": round(100.0 * succ / attempts, 1)}),
          flush=True)
    if args.out and demos:
        with open(args.out, "wb") as f:
            pickle.dump(demos, f)
        print(json.dumps({"saved": args.out, "demos": len(demos)}),
              flush=True)


if __name__ == "__main__":
    main()
