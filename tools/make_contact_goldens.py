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


if __name__ == "__main__":
    make("hopper", _gym_asset("hopper.xml"), sample_touchdown)
    make("walker2d", _gym_asset("walker2d.xml"), sample_touchdown)
    make("peg_insertion", os.path.join(REF, "peg_insertion.xml"),
         sample_peg)
    make("ant", _gym_asset("ant.xml"), sample_ant)
    make("humanoid", _gym_asset("humanoid.xml"), sample_humanoid)
