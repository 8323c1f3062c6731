"""Relocate demo generation on the mjrl_tpu JAX engine.

The demo source for the DAPG flagship pipeline (reference role:
/root/reference/examples/behavior_clone.py:47-50 samples expert paths;
the original DAPG project used human teleop).  The expert is the
IK-waypoint claw controller from tools/relocate_expert.py, developed
and validated against REAL MuJoCo (tools/run_expert_real.py) and driven
here through the mjrl_tpu engine: env steps run batched-lockstep on the
default JAX platform (TPU) while the expert's FK/Jacobian/gravity
oracles are jitted on the CPU backend (per-step host control loop —
dispatching 6 tiny FK programs per step to the TPU would be all
latency).

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


class JaxAdroitBackend:
    """Expert oracles (palm pose + Jacobians, gravity bias) evaluated
    with the mjrl_tpu engine's own FK, jitted on the host CPU backend."""

    def __init__(self, env):
        import jax
        import jax.numpy as jnp
        from mjrl_tpu.physics.kinematics import fwd_kinematics
        from mjrl_tpu.physics import math as pm

        model = env.model
        sid = env._palm_sid
        sb = model.site_body[sid]

        def palm_pose(q8, qrest):
            qpos = jnp.concatenate([q8, qrest])
            data = fwd_kinematics(model, qpos)
            R = pm.mat_mul(data.xmat[sb],
                           pm.quat_to_mat(model.site_quat[sid]))
            return data.site_xpos[sid], R

        jac = jax.jacobian(palm_pose, argnums=0)

        def pose_and_jac(q8, qrest):
            (p, R) = palm_pose(q8, qrest)
            (jp, jR) = jac(q8, qrest)
            return p, R, jp, jR

        self._pose_jac = jax.jit(pose_and_jac, backend="cpu")

        # gravity generalized force on the 8 pose dofs: d/dq of the
        # gravitational potential  V(q) = -sum_i m_i g . com_i(q)
        # (equals MuJoCo's qfrc_bias gravity term at zero velocity —
        # the dominant droop load the servo feedforward must cancel)
        gvec = jnp.asarray(model.gravity) if hasattr(model, "gravity") \
            else jnp.array([0.0, 0.0, -9.81])

        def potential(q8, qrest):
            qpos = jnp.concatenate([q8, qrest])
            data = fwd_kinematics(model, qpos)
            masses = jnp.asarray(model.body_mass)
            return -jnp.sum(masses * (data.xipos @ gvec))

        self._grav = jax.jit(jax.grad(potential, argnums=0),
                             backend="cpu")
        self._qrest = None

    def set_state(self, qpos):
        self._qrest = np.asarray(qpos)[8:]

    def pose_and_jac(self, qpos):
        import jax.numpy as jnp
        q8 = jnp.asarray(np.asarray(qpos)[:8], jnp.float32)
        p, R, jp, jR = self._pose_jac(q8, jnp.asarray(self._qrest,
                                                      jnp.float32))
        p, R, jp, jR = (np.asarray(p, float), np.asarray(R, float),
                        np.asarray(jp, float), np.asarray(jR, float))
        # rotational jacobian from dR: Jr[:, k] = vee(dR_k R^T)
        jr = np.stack([_vee(jR[:, :, k] @ R.T) for k in range(8)],
                      axis=1)
        return p, R, jp, jr

    def fk_shadow(self, q8):
        import jax.numpy as jnp
        p, R, jp, jR = self._pose_jac(
            jnp.asarray(np.asarray(q8, np.float32)),
            jnp.asarray(self._qrest, jnp.float32))
        p, R, jp, jR = (np.asarray(p, float), np.asarray(R, float),
                        np.asarray(jp, float), np.asarray(jR, float))
        jr = np.stack([_vee(jR[:, :, k] @ R.T) for k in range(8)],
                      axis=1)
        return p, R, jp, jr

    def qfrc_bias(self, qpos):
        import jax.numpy as jnp
        return np.asarray(self._grav(
            jnp.asarray(np.asarray(qpos)[:8], jnp.float32),
            jnp.asarray(self._qrest, jnp.float32)), float)


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
    backend = JaxAdroitBackend(env)   # one shared jit cache; state is
    backends = [backend] * B          # swapped per slot via set_state

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
