"""Golden contact-active dynamics data from MuJoCo.

Records (qpos, qvel, ctrl) -> qacc for states with ACTIVE contacts on the
locomotion suite (gymnasium assets) and the reference peg-insertion arm,
sampled around realistic touchdown configurations.  Validates the implicit
Newton constraint solver (mjrl_tpu/physics/solver.py) end to end:
collision manifold, pyramidal/frictionless rows, solimp impedance,
diagApprox regularization.

Output: tests/golden/contact_<name>.npz (committed; suite stays hermetic).
"""

import os

import numpy as np

import mujoco

OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "golden")
REF = "/root/reference/mjrl/envs/assets"


def _gym_asset(name):
    import gymnasium
    return os.path.join(os.path.dirname(gymnasium.__file__), "envs",
                        "mujoco", "assets", name)


def sample_touchdown(model, data, rng, z_adr=1, z_range=(-0.047, -0.040),
                     joint_noise=0.1, vel=1.5):
    data.qpos[:] = model.qpos0
    data.qpos[z_adr] += rng.uniform(*z_range)
    data.qpos[2:] += rng.uniform(-joint_noise, joint_noise, model.nq - 2)
    data.qvel[:] = rng.uniform(-vel, vel, model.nv)
    data.ctrl[:] = rng.uniform(-1, 1, model.nu)


def sample_peg(model, data, rng):
    """Arm configurations near the table/hole fixture (contacts active)."""
    data.qpos[:] = model.qpos0
    for j in range(model.njnt):
        adr = model.jnt_qposadr[j]
        lo, hi = model.jnt_range[j]
        data.qpos[adr] = rng.uniform(lo, hi) if model.jnt_limited[j] \
            else rng.uniform(-0.5, 0.5)
    data.qvel[:] = rng.uniform(-0.5, 0.5, model.nv)
    data.ctrl[:] = rng.uniform(-1, 1, model.nu)


def make(name, xml_path, sampler, n_states=40, seed=7, max_tries=4000):
    model = mujoco.MjModel.from_xml_path(xml_path)
    data = mujoco.MjData(model)
    rng = np.random.default_rng(seed)
    recs = dict(qpos=[], qvel=[], ctrl=[], qacc=[], ncon=[], nefc=[])
    tries = 0
    while len(recs["qpos"]) < n_states and tries < max_tries:
        tries += 1
        sampler(model, data, rng)
        mujoco.mj_forward(model, data)
        if data.ncon == 0:
            continue
        recs["qpos"].append(data.qpos.copy())
        recs["qvel"].append(data.qvel.copy())
        recs["ctrl"].append(data.ctrl.copy())
        recs["qacc"].append(data.qacc.copy())
        recs["ncon"].append(data.ncon)
        recs["nefc"].append(data.nefc)
    out = {k: np.array(v) for k, v in recs.items()}
    path = os.path.join(OUT, f"contact_{name}.npz")
    np.savez_compressed(path, **out)
    print(f"contact_{name}: {len(out['qpos'])} contact-active states "
          f"({tries} tries) -> {path}")


def sample_ant(model, data, rng):
    """Free-joint torso near touchdown; legs contact the floor."""
    data.qpos[:] = model.qpos0
    data.qpos[2] += rng.uniform(-0.62, -0.45)      # drop torso toward floor
    data.qpos[7:] += rng.uniform(-0.25, 0.25, model.nq - 7)
    data.qvel[:] = rng.uniform(-1.5, 1.5, model.nv)
    data.ctrl[:] = rng.uniform(-1, 1, model.nu)


def sample_humanoid(model, data, rng):
    """Free-joint torso lowered until the feet load the floor (deep
    two-leg contact states), joints jittered, tendons under tension."""
    data.qpos[:] = model.qpos0
    data.qpos[2] += rng.uniform(-0.22, -0.12)      # drop torso toward floor
    data.qpos[7:] += rng.uniform(-0.15, 0.15, model.nq - 7)
    data.qvel[:] = rng.uniform(-1.0, 1.0, model.nv)
    data.ctrl[:] = rng.uniform(-0.4, 0.4, model.nu)


def make_adroit(n_states=40, seed=11, max_tries=4000):
    """Grasp-state goldens for the Adroit relocate hand: claw poses with
    the ball seated in the fingertip cage (condim-4 hand-ball pairs
    active — the contact regime the DAPG flagship's grasp lives in).
    Requires the apirate-patched XML shim (mujoco >= 3.3 schema)."""
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "benchmarks", "parity"))
    from real_adroit import patched_relocate_xml
    model = mujoco.MjModel.from_xml_path(patched_relocate_xml())
    data = mujoco.MjData(model)
    rng = np.random.default_rng(seed)
    sid = mujoco.mj_name2id(model, mujoco.mjtObj.mjOBJ_SITE, "S_grasp")
    bid = mujoco.mj_name2id(model, mujoco.mjtObj.mjOBJ_BODY, "Object")
    sphere_g = mujoco.mj_name2id(model, mujoco.mjtObj.mjOBJ_GEOM,
                                 "sphere")
    jn = {mujoco.mj_id2name(model, mujoco.mjtObj.mjOBJ_JOINT, j): j
          for j in range(model.njnt)}
    flexj = [jn[f] for f in
             ("FFJ2", "FFJ1", "FFJ0", "MFJ2", "MFJ1", "MFJ0",
              "RFJ2", "RFJ1", "RFJ0", "LFJ2", "LFJ1", "LFJ0")]
    thumbj = [jn[t] for t in ("THJ4", "THJ3", "THJ2", "THJ1", "THJ0")]
    recs = dict(qpos=[], qvel=[], ctrl=[], qacc=[], ncon=[], nefc=[])
    tries = 0
    while len(recs["qpos"]) < n_states and tries < max_tries:
        tries += 1
        data.qpos[:] = 0.0
        # claw pose: pitched arm, flexed fingers, opposed thumb
        data.qpos[1] = rng.uniform(0.0, 0.15)          # ARTy
        data.qpos[3] = rng.uniform(0.2, 0.55)          # ARRx pitch
        data.qpos[6] = rng.uniform(-0.4, 0.1)          # WRJ1
        flex = rng.uniform(0.7, 1.4)
        for j in flexj:
            data.qpos[model.jnt_qposadr[j]] = flex + rng.uniform(-0.15,
                                                                 0.15)
        for j, v in zip(thumbj, (0.5, 1.1, 0.2, 0.4, -0.9)):
            data.qpos[model.jnt_qposadr[j]] = v + rng.uniform(-0.2, 0.2)
        mujoco.mj_kinematics(model, data)
        R = data.site_xmat[sid].reshape(3, 3)
        cage = data.site_xpos[sid] + R @ np.array([0.045, 0.0, 0.015])
        ball = cage + rng.uniform(-0.015, 0.015, 3)
        data.qpos[30:33] = ball - model.body_pos[bid]
        data.qpos[33:36] = rng.uniform(-0.3, 0.3, 3)
        data.qvel[:] = rng.uniform(-0.5, 0.5, model.nv)
        data.ctrl[:] = rng.uniform(model.actuator_ctrlrange[:, 0],
                                   model.actuator_ctrlrange[:, 1])
        mujoco.mj_forward(model, data)
        # require a hand-ball contact (the condim-4 pairs under test)
        hand_ball = any(
            sphere_g in (data.contact[i].geom1, data.contact[i].geom2)
            and data.contact[i].geom1 != 0 and data.contact[i].geom2 != 0
            for i in range(data.ncon))
        if not hand_ball:
            continue
        recs["qpos"].append(data.qpos.copy())
        recs["qvel"].append(data.qvel.copy())
        recs["ctrl"].append(data.ctrl.copy())
        recs["qacc"].append(data.qacc.copy())
        recs["ncon"].append(data.ncon)
        recs["nefc"].append(data.nefc)
    out = {k: np.array(v) for k, v in recs.items()}
    path = os.path.join(OUT, "contact_adroit.npz")
    np.savez_compressed(path, **out)
    print(f"contact_adroit: {len(out['qpos'])} grasp states "
          f"({tries} tries) -> {path}")


if __name__ == "__main__":
    import sys
    only = sys.argv[1] if len(sys.argv) > 1 else None
    if only in (None, "adroit"):
        make_adroit()
    if only is None:
        make("hopper", _gym_asset("hopper.xml"), sample_touchdown)
        make("walker2d", _gym_asset("walker2d.xml"), sample_touchdown)
        make("peg_insertion", os.path.join(REF, "peg_insertion.xml"),
             sample_peg)
        make("ant", _gym_asset("ant.xml"), sample_ant)
        make("humanoid", _gym_asset("humanoid.xml"), sample_humanoid)
