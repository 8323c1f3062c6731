"""Attribute the swimmer in-sim scoring gap (PARITY.md: the same
trained policy scores ~31.4 in our sim vs ~39.3 in real MuJoCo).

Method: roll the trained seed-123 policy (mean actions) inside REAL
MuJoCo, and at every visited state evaluate the mjrl_tpu engine's
dynamics against MuJoCo's ground truth:

  1. passive forces (qfrc_passive: viscous+density fluid drag, joint
     damping) — isolates the FLUID MODEL;
  2. smooth qacc (no limits active) vs full qacc — isolates the
     LIMIT RESPONSE;
  3. reward accounting: -10 * (x_{t-1} - x_t) on identical trajectories
     — isolates bookkeeping.

Buckets the qacc error by limit-active vs free states and prints a
JSON attribution summary.

    python benchmarks/parity/swimmer_gap.py
"""

import json
import os
import pickle
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(_HERE, "shims"))
sys.path.insert(0, os.path.abspath(os.path.join(_HERE, "..", "..")))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def main():
    import mujoco
    import mujoco310_envs
    env = mujoco310_envs.SwimmerRef()
    m, d = env.model, env.data

    with open(os.path.join(_HERE, "curves",
                           "mjrl_tpu_swimmer_seed123_policy.pkl"),
              "rb") as f:
        policy = pickle.load(f)

    from mjrl_tpu.envs.swimmer import SwimmerEnv
    ours = SwimmerEnv(dtype=jnp.float64)
    model = ours.model
    from mjrl_tpu.physics.step import qacc_smooth
    from mjrl_tpu.physics.model import State
    from mjrl_tpu.physics import dynamics as dyn
    from mjrl_tpu.physics.kinematics import fwd_kinematics
    acc = jax.jit(lambda q, v, u: qacc_smooth(
        model, State(qpos=q, qvel=v), u))

    def _passive(qpos, qvel):
        """Our damping + fluid generalized force (MuJoCo qfrc_passive
        analog; swimmer has no springs/tendons)."""
        data = fwd_kinematics(model, qpos)
        cdof = dyn.compute_cdof(model, data)
        cvel, _ = dyn.compute_velocities(model, data, cdof, qvel)
        out = dyn.damping_force(model, qvel)
        fluid = dyn.fluid_force(model, data, cvel)
        return out + dyn.project_body_forces(model, cdof, fluid)

    passive_qfrc = jax.jit(_passive)

    env.seed(123)
    o = env.reset()
    qacc_err_free, qacc_err_lim, passive_err = [], [], []
    rew_mj, rew_ours_formula = 0.0, 0.0
    lim_margin = 0.08
    for t in range(500):
        a, info = policy.get_action(np.asarray(o, np.float64))
        act = np.clip(info["evaluation"], -1, 1)
        qpos = d.qpos.copy()
        qvel = d.qvel.copy()
        x_before = d.qpos[0]
        # ground truth at this state with these controls
        d.ctrl[:] = act
        mujoco.mj_forward(m, d)
        qacc_mj = d.qacc.copy()
        qfrc_passive_mj = d.qfrc_passive.copy()
        # ours at the same state
        qacc_us = np.asarray(acc(jnp.asarray(qpos), jnp.asarray(qvel),
                                 jnp.asarray(act)))
        scale = max(np.abs(qacc_mj).max(), 1.0)
        err = np.abs(qacc_us - qacc_mj).max() / scale
        # limit-active if any actuated hinge is near its range edge
        lim = False
        for j in range(m.njnt):
            if m.jnt_limited[j]:
                adr = m.jnt_qposadr[j]
                lo, hi = m.jnt_range[j]
                if qpos[adr] < lo + lim_margin or \
                        qpos[adr] > hi - lim_margin:
                    lim = True
        (qacc_err_lim if lim else qacc_err_free).append(err)
        # passive-force comparison (fluid drag + joint damping)
        pf = np.asarray(passive_qfrc(jnp.asarray(qpos),
                                     jnp.asarray(qvel)))
        ps = max(np.abs(qfrc_passive_mj).max(), 1e-9)
        passive_err.append(np.abs(pf - qfrc_passive_mj).max() / ps)
        o, r, done, _ = env.step(act)
        rew_mj += float(r)
        rew_ours_formula += -10.0 * (x_before - d.qpos[0])
    out = dict(
        steps=500,
        return_mujoco=round(rew_mj, 2),
        return_same_traj_our_formula=round(rew_ours_formula, 2),
        qacc_err_free_median=round(float(np.median(qacc_err_free)), 5)
        if qacc_err_free else None,
        n_free=len(qacc_err_free),
        qacc_err_limit_median=round(float(np.median(qacc_err_lim)), 5)
        if qacc_err_lim else None,
        n_limit_active=len(qacc_err_lim),
        passive_force_err_median=round(float(np.median(passive_err)), 5)
        if passive_err else "n/a",
    )
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
