"""Equality constraints (joint coupling + connect) vs live MuJoCo 3.10.
(Reference counterpart: equality constraints come for free from MuJoCo
in mjrl/envs/mujoco_env.py:11-15.)"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

mujoco = pytest.importorskip("mujoco")

from mjrl_tpu.physics.mjcf import load_mjcf  # noqa: E402
from mjrl_tpu.physics.model import State  # noqa: E402
from mjrl_tpu.physics.step import qacc_smooth, step_n  # noqa: E402

# two chains: a quartic joint coupling inside one, a connect closing a
# four-bar-style loop between them
_EQ_XML = """
<mujoco>
  <compiler angle="radian" inertiafromgeom="true"/>
  <option timestep="0.002" gravity="0 0 -9.81"/>
  <worldbody>
    <body name="A" pos="0 0 1">
      <joint name="ja" type="hinge" axis="0 1 0" damping="0.2"/>
      <geom type="capsule" fromto="0 0 0 0.4 0 0" size="0.04"
            contype="0" conaffinity="0"/>
      <body name="B" pos="0.4 0 0">
        <joint name="jb" type="hinge" axis="0 1 0" damping="0.1"/>
        <geom type="capsule" fromto="0 0 0 0.3 0 0" size="0.03"
              contype="0" conaffinity="0"/>
      </body>
    </body>
    <body name="C" pos="0.7 0 1">
      <joint name="jc" type="hinge" axis="0 1 0" damping="0.1"/>
      <geom type="capsule" fromto="0 0 0 0.2 0 0" size="0.03"
            contype="0" conaffinity="0"/>
    </body>
  </worldbody>
  <equality>
    <joint joint1="ja" joint2="jb" polycoef="0.1 0.5 0.2 0 0"/>
    <connect body1="B" body2="C" anchor="0.3 0 0"/>
  </equality>
  <actuator>
    <motor joint="ja" gear="1"/>
    <motor joint="jc" gear="1"/>
  </actuator>
</mujoco>
"""

_PIN_XML = """
<mujoco>
  <compiler angle="radian" inertiafromgeom="true"/>
  <option timestep="0.002" gravity="0 0 -9.81"/>
  <worldbody>
    <body name="A" pos="0 0 1">
      <joint name="ja" type="hinge" axis="0 1 0" damping="0.2"/>
      <geom type="capsule" fromto="0 0 0 0.4 0 0" size="0.04"
            contype="0" conaffinity="0"/>
    </body>
  </worldbody>
  <equality>
    <joint joint1="ja" polycoef="0.25"/>
  </equality>
</mujoco>
"""


def test_equality_tables_match_mujoco():
    mm = mujoco.MjModel.from_xml_string(_EQ_XML)
    ours = load_mjcf(xml_string=_EQ_XML).finalize(jnp.float64)
    assert ours.neq == mm.neq == 2
    assert list(ours.eq_kind) == list(mm.eq_type)
    assert list(ours.eq_obj1) == list(mm.eq_obj1id)
    assert list(ours.eq_obj2) == list(mm.eq_obj2id)
    np.testing.assert_allclose(np.asarray(ours.eq_data),
                               mm.eq_data[:, :11], atol=1e-10)


def test_equality_qacc_matches_mujoco_newton():
    """Implicit-solver qacc under active joint+connect equality rows
    tracks MuJoCo across random states."""
    mm = mujoco.MjModel.from_xml_string(_EQ_XML)
    md = mujoco.MjData(mm)
    ours = load_mjcf(xml_string=_EQ_XML).finalize(jnp.float64,
                                                 solver="newton")
    acc = jax.jit(lambda q, v, u: qacc_smooth(ours, State(qpos=q, qvel=v), u))
    rng = np.random.RandomState(11)
    errs = []
    for _ in range(16):
        qpos = rng.uniform(-0.4, 0.4, mm.nq)
        qvel = rng.uniform(-1.0, 1.0, mm.nv)
        ctrl = rng.uniform(-1.0, 1.0, mm.nu)
        md.qpos[:] = qpos
        md.qvel[:] = qvel
        md.ctrl[:] = ctrl
        mujoco.mj_forward(mm, md)
        mine = np.asarray(acc(jnp.asarray(qpos), jnp.asarray(qvel),
                              jnp.asarray(ctrl)))
        scale = max(np.abs(md.qacc).max(), 1.0)
        errs.append(np.abs(mine - md.qacc).max() / scale)
    assert np.median(errs) < 2e-2, (np.median(errs), sorted(errs))


def test_connect_holds_loop_closed_under_integration():
    """Integrating the closed chain keeps the connect residual small
    (both solver paths)."""
    tol = {"newton": 5e-3, "penalty": 5e-2}   # penalty: soft by design
    for solver in ("newton", "penalty"):
        ours = load_mjcf(xml_string=_EQ_XML).finalize(jnp.float64,
                                                      solver=solver)
        from mjrl_tpu.physics import dynamics as dyn
        from mjrl_tpu.physics.kinematics import fwd_kinematics
        s = State(qpos=jnp.zeros(3), qvel=jnp.zeros(3))
        ctrl = jnp.asarray([0.5, -0.3])
        stepper = jax.jit(lambda st: step_n(ours, st, ctrl, 5))
        for _ in range(40):
            s = stepper(s)
        assert np.isfinite(np.asarray(s.qpos)).all(), solver
        data = fwd_kinematics(ours, s.qpos)
        cdof = dyn.compute_cdof(ours, data)
        terms = dyn.equality_terms(ours, data, cdof, s.qpos)
        res_connect = np.asarray(terms[1][2])
        assert np.abs(res_connect).max() < tol[solver], (solver, res_connect)


_WELD_XML = """
<mujoco>
  <compiler angle="radian" inertiafromgeom="true"/>
  <option timestep="0.002" gravity="0 0 -9.81"/>
  <worldbody>
    <body name="A" pos="0 0 1">
      <joint name="fa" type="free"/>
      <geom type="box" size="0.1 0.08 0.06" contype="0" conaffinity="0"/>
    </body>
    <body name="B" pos="0.5 0 1">
      <joint name="fb" type="free"/>
      <geom type="box" size="0.1 0.08 0.06" contype="0" conaffinity="0"/>
    </body>
  </worldbody>
  <equality>
    <weld body1="A" body2="B" anchor="0.2 0 0" torquescale="0.7"/>
  </equality>
</mujoco>
"""


def test_weld_tables_match_mujoco():
    mm = mujoco.MjModel.from_xml_string(_WELD_XML)
    ours = load_mjcf(xml_string=_WELD_XML).finalize(jnp.float64)
    np.testing.assert_allclose(np.asarray(ours.eq_data),
                               mm.eq_data[:, :11], atol=1e-10)


def test_weld_qacc_matches_mujoco_newton():
    """6-dof weld (free-floating bodies): implicit-solver qacc tracks
    MuJoCo, including the orientation rows' relpose composition."""
    mm = mujoco.MjModel.from_xml_string(_WELD_XML)
    md = mujoco.MjData(mm)
    ours = load_mjcf(xml_string=_WELD_XML).finalize(jnp.float64,
                                                   solver="newton")
    acc = jax.jit(lambda q, v: qacc_smooth(
        ours, State(qpos=q, qvel=v), jnp.zeros((0,), jnp.float64)))
    rng = np.random.RandomState(17)
    errs = []
    for _ in range(16):
        qpos = np.array(mm.qpos0)
        qpos[:3] += rng.uniform(-0.1, 0.1, 3)
        qpos[7:10] += rng.uniform(-0.1, 0.1, 3)
        for qa in (3, 7 + 3):
            qpos[qa:qa + 4] = rng.uniform(-0.3, 0.3, 4) + [1, 0, 0, 0]
            qpos[qa:qa + 4] /= np.linalg.norm(qpos[qa:qa + 4])
        qvel = rng.uniform(-0.8, 0.8, mm.nv)
        md.qpos[:] = qpos
        md.qvel[:] = qvel
        mujoco.mj_forward(mm, md)
        mine = np.asarray(acc(jnp.asarray(qpos), jnp.asarray(qvel)))
        scale = max(np.abs(md.qacc).max(), 1.0)
        errs.append(np.abs(mine - md.qacc).max() / scale)
    assert np.median(errs) < 2e-2, (np.median(errs), sorted(errs))


def test_single_joint_pin_matches_mujoco():
    """joint equality without joint2 pins the joint at qpos0 + c0."""
    mm = mujoco.MjModel.from_xml_string(_PIN_XML)
    md = mujoco.MjData(mm)
    ours = load_mjcf(xml_string=_PIN_XML).finalize(jnp.float64,
                                                  solver="newton")
    acc = jax.jit(lambda q, v: qacc_smooth(
        ours, State(qpos=q, qvel=v), jnp.zeros((0,), jnp.float64)))
    rng = np.random.RandomState(5)
    errs = []
    for _ in range(8):
        qpos = rng.uniform(-0.5, 0.5, mm.nq)
        qvel = rng.uniform(-1.0, 1.0, mm.nv)
        md.qpos[:] = qpos
        md.qvel[:] = qvel
        md.ctrl[:] = 0
        mujoco.mj_forward(mm, md)
        mine = np.asarray(acc(jnp.asarray(qpos), jnp.asarray(qvel)))
        scale = max(np.abs(md.qacc).max(), 1.0)
        errs.append(np.abs(mine - md.qacc).max() / scale)
    assert np.median(errs) < 2e-2, (np.median(errs), sorted(errs))
