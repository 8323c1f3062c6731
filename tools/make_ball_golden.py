"""Golden MuJoCo data for ball-joint validation -> tests/golden/ball.npz.

A 3-body tree exercising ball joints composed with hinges (off-center
anchors, damping, armature, gravity), under Euler and RK4.  Records
forward quantities (FK, mass matrix, bias, qacc) on random states plus
frame-skipped transitions and a long trajectory endpoint per integrator.

Usage: python tools/make_ball_golden.py
"""
import os

import numpy as np
import mujoco

OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "golden")

XML = """
<mujoco>
  <option timestep="0.002" gravity="0 0 -9.81" integrator="{integrator}"/>
  <worldbody>
    <body name="b1" pos="0.1 0.2 0.5" quat="0.9 0.1 0.3 0.2">
      <joint name="ball1" type="ball" pos="0.05 -0.02 0.08"
             damping="0.12" armature="0.01"/>
      <geom type="capsule" fromto="0 0 0 0.3 0.1 -0.2" size="0.04"/>
      <body name="b2" pos="0.3 0.1 -0.2" euler="10 20 30">
        <joint name="h1" type="hinge" axis="0 1 0" pos="0.01 0.02 0.03"
               damping="0.05" armature="0.002"/>
        <geom type="sphere" size="0.05" pos="0.1 0 0"/>
        <body name="b3" pos="0.15 0 -0.05">
          <joint name="ball2" type="ball" pos="0 0.01 0" damping="0.08"/>
          <geom type="box" size="0.03 0.05 0.02" pos="0.05 0 -0.04"/>
        </body>
      </body>
    </body>
  </worldbody>
</mujoco>
"""


def rand_state(m, rng):
    qpos = np.zeros(m.nq)
    for j in range(m.njnt):
        adr = m.jnt_qposadr[j]
        if m.jnt_type[j] == mujoco.mjtJoint.mjJNT_BALL:
            q = rng.uniform(-1, 1, 4)
            qpos[adr:adr + 4] = q / np.linalg.norm(q)
        else:
            qpos[adr] = rng.uniform(-1.0, 1.0)
    return qpos, rng.uniform(-1.5, 1.5, m.nv)


def main(n_states=40, seed=0):
    rec = {}
    for integ in ("Euler", "RK4"):
        xml = XML.format(integrator=integ)
        m = mujoco.MjModel.from_xml_string(xml)
        d = mujoco.MjData(m)
        rng = np.random.RandomState(seed)
        if integ == "Euler":
            rec.update(xml=np.array(xml), nq=m.nq, nv=m.nv,
                       body_mass=m.body_mass.copy(),
                       body_inertia=m.body_inertia.copy(),
                       timestep=m.opt.timestep)
            cols = dict(qpos=[], qvel=[], xpos=[], ximat=[], xanchor=[],
                        qM=[], qfrc_bias=[], qacc=[], next_qpos=[],
                        next_qvel=[])
            for _ in range(n_states):
                qpos, qvel = rand_state(m, rng)
                d.qpos[:], d.qvel[:] = qpos, qvel
                mujoco.mj_forward(m, d)
                cols["qpos"].append(qpos.copy())
                cols["qvel"].append(qvel.copy())
                cols["xpos"].append(d.xpos.copy())
                cols["ximat"].append(d.ximat.copy().reshape(-1, 3, 3))
                cols["xanchor"].append(d.xanchor.copy())
                mfull = np.zeros((m.nv, m.nv))
                mujoco.mj_fullM(m, d, mfull)
                cols["qM"].append(mfull)
                cols["qfrc_bias"].append(d.qfrc_bias.copy())
                cols["qacc"].append(d.qacc.copy())
                for _ in range(5):
                    mujoco.mj_step(m, d)
                cols["next_qpos"].append(d.qpos.copy())
                cols["next_qvel"].append(d.qvel.copy())
            rec.update({k: np.array(v) for k, v in cols.items()})
        # long trajectory endpoint per integrator
        qpos, qvel = rand_state(m, np.random.RandomState(seed + 7))
        d.qpos[:], d.qvel[:] = qpos, qvel
        steps = 300
        for _ in range(steps):
            mujoco.mj_step(m, d)
        key = integ.lower()
        rec[f"traj_{key}_qpos0"] = qpos
        rec[f"traj_{key}_qvel0"] = qvel
        rec[f"traj_{key}_steps"] = steps
        rec[f"traj_{key}_qpos_end"] = d.qpos.copy()
        rec[f"traj_{key}_qvel_end"] = d.qvel.copy()

    os.makedirs(OUT, exist_ok=True)
    path = os.path.join(OUT, "ball.npz")
    np.savez_compressed(path, **rec)
    print(f"wrote {path}: nq={rec['nq']} nv={rec['nv']}, "
          f"{n_states} states + Euler/RK4 trajectories")


LIM_XML = """
<mujoco>
  <option timestep="0.002" gravity="0 0 -9.81"/>
  <worldbody>
    <body pos="0 0 1">
      <joint type="ball" limited="true" range="0 30" damping="0.05"
             armature="0.003" solreflimit="0.02 1"/>
      <geom type="capsule" fromto="0 0 0 0.35 0 0" size="0.035"/>
      <body pos="0.35 0 0">
        <joint type="hinge" axis="0 1 0" range="-60 60" damping="0.02"/>
        <geom type="sphere" size="0.05" pos="0.08 0 0"/>
      </body>
    </body>
  </worldbody>
</mujoco>
"""


def main_limited(n_states=25, seed=11):
    """Limit-ACTIVE ball states (rotation angle slightly beyond range[1]):
    validates the rotation-angle constraint against MuJoCo's solver."""
    m = mujoco.MjModel.from_xml_string(LIM_XML)
    d = mujoco.MjData(m)
    rng = np.random.RandomState(seed)
    recs = dict(qpos=[], qvel=[], qacc=[], nefc=[], ncon=[])
    tries = 0
    while len(recs["qpos"]) < n_states and tries < 400:
        tries += 1
        # rotation angle just beyond the 30 deg limit, random axis
        axis = rng.randn(3)
        axis /= np.linalg.norm(axis)
        ang = np.deg2rad(30.0) + rng.uniform(0.0, 0.1)
        if rng.rand() < 0.3:
            ang = rng.uniform(0.0, np.deg2rad(28.0))   # some inactive too
        q = np.concatenate([[np.cos(ang / 2)], axis * np.sin(ang / 2)])
        d.qpos[:4] = q
        d.qpos[4] = rng.uniform(-0.9, 0.9)
        d.qvel[:] = rng.uniform(-1.0, 1.0, m.nv)
        mujoco.mj_forward(m, d)
        if d.ncon > 0:
            continue
        recs["qpos"].append(d.qpos.copy())
        recs["qvel"].append(d.qvel.copy())
        recs["qacc"].append(d.qacc.copy())
        recs["nefc"].append(d.nefc)
        recs["ncon"].append(d.ncon)
    out = {k: np.array(v) for k, v in recs.items()}
    out["xml"] = np.array(LIM_XML)
    path = os.path.join(OUT, "ball_limits.npz")
    np.savez_compressed(path, **out)
    act = int(np.sum(out["nefc"] > 0))
    print(f"wrote {path}: {len(out['qpos'])} states, {act} limit-active")


if __name__ == "__main__":
    main()
    main_limited()
