"""Generate golden physics data from MuJoCo for engine validation.

Runs the installed ``mujoco`` (3.x) on the reference MJCF assets and records
model tables + randomized-state dynamics quantities + stepped transitions.
Output: tests/golden/<env>.npz (committed, so the test suite is hermetic —
no mujoco or reference checkout needed at test time).

Usage: python tools/make_goldens.py [env ...]
"""

import os
import sys

import numpy as np

import mujoco

REF = "/root/reference/mjrl/envs/assets"
OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "golden")

ENVS = {
    "point_mass": dict(xml="point_mass.xml", frame_skip=5, qvel_scale=2.0),
    "swimmer": dict(xml="swimmer.xml", frame_skip=5, qvel_scale=1.0),
    "reacher": dict(xml="sawyer.xml", frame_skip=4, qvel_scale=1.0),
    "peg_insertion": dict(xml="peg_insertion.xml", frame_skip=4,
                          qvel_scale=0.5, home_scale=0.15),
}


def sample_state(model, rng, qvel_scale, home_scale=None):
    """Random interior state: qpos inside joint ranges (margin 20%),
    bounded qvel.  With ``home_scale``, sample near qpos0 instead (for
    models whose random configurations are always in contact)."""
    qpos = np.zeros(model.nq)
    for j in range(model.njnt):
        adr = model.jnt_qposadr[j]
        if home_scale is not None:
            qpos[adr] = rng.uniform(-home_scale, home_scale)
            if model.jnt_limited[j]:
                qpos[adr] = np.clip(qpos[adr], *model.jnt_range[j])
        elif model.jnt_limited[j]:
            lo, hi = model.jnt_range[j]
            mid, half = 0.5 * (lo + hi), 0.4 * (hi - lo)
            qpos[adr] = rng.uniform(mid - half, mid + half)
        else:
            qpos[adr] = rng.uniform(-1.0, 1.0)
    qvel = rng.uniform(-qvel_scale, qvel_scale, model.nv)
    return qpos, qvel


def make_golden(name, cfg, n_states=60, seed=0):
    model = mujoco.MjModel.from_xml_path(os.path.join(REF, cfg["xml"]))
    data = mujoco.MjData(model)
    rng = np.random.RandomState(seed)

    rec = {
        # model tables
        "nq": model.nq, "nv": model.nv, "nu": model.nu,
        "nbody": model.nbody, "njnt": model.njnt, "nsite": model.nsite,
        "body_parent": model.body_parentid.copy(),
        "body_pos": model.body_pos.copy(), "body_quat": model.body_quat.copy(),
        "body_mass": model.body_mass.copy(),
        "body_ipos": model.body_ipos.copy(),
        "body_iquat": model.body_iquat.copy(),
        "body_inertia": model.body_inertia.copy(),
        "jnt_axis": model.jnt_axis.copy(), "jnt_pos": model.jnt_pos.copy(),
        "jnt_range": model.jnt_range.copy(),
        "jnt_limited": model.jnt_limited.copy(),
        "dof_damping": model.dof_damping.copy(),
        "dof_armature": model.dof_armature.copy(),
        "gear": model.actuator_gear[:, 0].copy(),
        "ctrlrange": model.actuator_ctrlrange.copy(),
        "timestep": model.opt.timestep, "gravity": model.opt.gravity.copy(),
        "viscosity": model.opt.viscosity, "density": model.opt.density,
        "frame_skip": cfg["frame_skip"],
    }

    states_qpos, states_qvel, ctrls = [], [], []
    xpos, xipos, ximat, site_xpos, geom_xpos = [], [], [], [], []
    qM, qfrc_bias, qfrc_passive, qacc, qfrc_act = [], [], [], [], []
    nefc_list, ncon_list = [], []
    next_qpos, next_qvel = [], []

    for _ in range(n_states):
        qpos, qvel = sample_state(model, rng, cfg["qvel_scale"],
                                  cfg.get("home_scale"))
        ctrl = rng.uniform(-1, 1, model.nu)
        data.qpos[:] = qpos
        data.qvel[:] = qvel
        data.ctrl[:] = ctrl
        mujoco.mj_forward(model, data)

        states_qpos.append(qpos.copy())
        states_qvel.append(qvel.copy())
        ctrls.append(ctrl.copy())
        xpos.append(data.xpos.copy())
        xipos.append(data.xipos.copy())
        ximat.append(data.ximat.copy().reshape(-1, 3, 3))
        site_xpos.append(data.site_xpos.copy())
        geom_xpos.append(data.geom_xpos.copy())
        m_full = np.zeros((model.nv, model.nv))
        mujoco.mj_fullM(model, data, m_full)
        qM.append(m_full)
        qfrc_bias.append(data.qfrc_bias.copy())
        qfrc_passive.append(data.qfrc_passive.copy())
        qfrc_act.append(data.qfrc_actuator.copy())
        qacc.append(data.qacc.copy())
        nefc_list.append(data.nefc)
        ncon_list.append(data.ncon)

        # frame_skip steps with constant ctrl
        for _ in range(cfg["frame_skip"]):
            mujoco.mj_step(model, data)
        next_qpos.append(data.qpos.copy())
        next_qvel.append(data.qvel.copy())

    rec.update(
        qpos=np.array(states_qpos), qvel=np.array(states_qvel),
        ctrl=np.array(ctrls), xpos=np.array(xpos), xipos=np.array(xipos),
        ximat=np.array(ximat), site_xpos=np.array(site_xpos),
        geom_xpos=np.array(geom_xpos),
        qM=np.array(qM), qfrc_bias=np.array(qfrc_bias),
        qfrc_passive=np.array(qfrc_passive), qfrc_actuator=np.array(qfrc_act),
        qacc=np.array(qacc), nefc=np.array(nefc_list),
        ncon=np.array(ncon_list),
        next_qpos=np.array(next_qpos), next_qvel=np.array(next_qvel),
    )

    os.makedirs(OUT, exist_ok=True)
    path = os.path.join(OUT, f"{name}.npz")
    np.savez_compressed(path, **rec)
    n_clean = int(np.sum((rec["nefc"] == 0) & (rec["ncon"] == 0)))
    print(f"{name}: wrote {path} ({n_states} states, {n_clean} "
          f"constraint-free)")


if __name__ == "__main__":
    names = sys.argv[1:] or list(ENVS)
    for n in names:
        make_golden(n, ENVS[n])


def make_limit_golden(name="reacher_limits", n_states=20, seed=3):
    """States with joint limits ACTIVE (but no contacts): validates the
    implicit constraint solver against MuJoCo's."""
    model = mujoco.MjModel.from_xml_path(os.path.join(REF, "sawyer.xml"))
    data = mujoco.MjData(model)
    rng = np.random.RandomState(seed)
    recs = dict(qpos=[], qvel=[], ctrl=[], qacc=[], nefc=[], ncon=[])
    tries = 0
    while len(recs["qpos"]) < n_states and tries < 500:
        tries += 1
        qpos = np.zeros(model.nq)
        for j in range(model.njnt):
            adr = model.jnt_qposadr[j]
            lo, hi = model.jnt_range[j]
            if model.jnt_limited[j] and rng.rand() < 0.5:
                # slightly beyond a limit
                qpos[adr] = (lo - rng.uniform(0, 0.05)) if rng.rand() < 0.5 \
                    else (hi + rng.uniform(0, 0.05))
            else:
                mid, half = 0.5 * (lo + hi), 0.3 * (hi - lo)
                qpos[adr] = rng.uniform(mid - half, mid + half)
        data.qpos[:] = qpos
        data.qvel[:] = rng.uniform(-1, 1, model.nv)
        data.ctrl[:] = rng.uniform(-1, 1, model.nu)
        mujoco.mj_forward(model, data)
        if data.nefc == 0 or data.ncon > 0:
            continue
        recs["qpos"].append(data.qpos.copy())
        recs["qvel"].append(data.qvel.copy())
        recs["ctrl"].append(data.ctrl.copy())
        recs["qacc"].append(data.qacc.copy())
        recs["nefc"].append(data.nefc)
        recs["ncon"].append(data.ncon)
    out = {k: np.array(v) for k, v in recs.items()}
    path = os.path.join(OUT, f"{name}.npz")
    np.savez_compressed(path, **out)
    print(f"{name}: {len(out['qpos'])} limit-active states -> {path}")
