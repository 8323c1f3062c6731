"""Fixed tendons vs live MuJoCo 3.10: table parity, passive
spring/damper forces, tendon actuator transmission, and length limits
through the implicit solver.  (Reference counterpart: tendons come for
free from MuJoCo in mjrl/envs/mujoco_env.py:11-15.)"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

mujoco = pytest.importorskip("mujoco")

from mjrl_tpu.physics.mjcf import load_mjcf  # noqa: E402
from mjrl_tpu.physics.model import State  # noqa: E402
from mjrl_tpu.physics.step import qacc_smooth  # noqa: E402

# two-link arm with a coupling tendon: spring+damper with an asymmetric
# springlength deadband, driven by a tendon actuator
_PASSIVE_XML = """
<mujoco>
  <compiler angle="radian" inertiafromgeom="true"/>
  <option timestep="0.002" gravity="0 0 -9.81"/>
  <worldbody>
    <body name="upper" pos="0 0 1">
      <joint name="shoulder" type="hinge" axis="0 1 0" damping="0.2"/>
      <geom type="capsule" fromto="0 0 0 0.4 0 0" size="0.04"
            contype="0" conaffinity="0"/>
      <body name="lower" pos="0.4 0 0">
        <joint name="elbow" type="hinge" axis="0 1 0" damping="0.1"/>
        <geom type="capsule" fromto="0 0 0 0.3 0 0" size="0.03"
              contype="0" conaffinity="0"/>
        <body name="hand" pos="0.3 0 0">
          <joint name="wrist" type="slide" axis="1 0 0" damping="0.05"/>
          <geom type="sphere" size="0.03" contype="0" conaffinity="0"/>
        </body>
      </body>
    </body>
  </worldbody>
  <tendon>
    <fixed name="couple" stiffness="8" damping="0.5"
           springlength="-0.1 0.15">
      <joint joint="shoulder" coef="-1"/>
      <joint joint="elbow" coef="0.7"/>
      <joint joint="wrist" coef="2"/>
    </fixed>
  </tendon>
  <actuator>
    <motor tendon="couple" gear="1.5" ctrlrange="-2 2"
           ctrllimited="true"/>
  </actuator>
</mujoco>
"""

# limited tendon (no spring) -> constraint rows in the implicit solver
_LIMIT_XML = """
<mujoco>
  <compiler angle="radian" inertiafromgeom="true"/>
  <option timestep="0.002" gravity="0 0 -9.81"/>
  <worldbody>
    <body name="upper" pos="0 0 1">
      <joint name="hip" type="hinge" axis="0 1 0" damping="0.2"/>
      <geom type="capsule" fromto="0 0 0 0.4 0 0" size="0.04"
            contype="0" conaffinity="0"/>
      <body name="lower" pos="0.4 0 0">
        <joint name="knee" type="hinge" axis="0 1 0" damping="0.1"/>
        <geom type="capsule" fromto="0 0 0 0.3 0 0" size="0.03"
              contype="0" conaffinity="0"/>
      </body>
    </body>
  </worldbody>
  <tendon>
    <fixed name="hipknee" range="-0.3 0.5">
      <joint joint="hip" coef="-1"/>
      <joint joint="knee" coef="1"/>
    </fixed>
  </tendon>
  <actuator>
    <motor joint="hip" gear="1"/>
    <motor joint="knee" gear="1"/>
  </actuator>
</mujoco>
"""


def test_tendon_tables_match_mujoco():
    mm = mujoco.MjModel.from_xml_string(_PASSIVE_XML)
    ours = load_mjcf(xml_string=_PASSIVE_XML).finalize(jnp.float64)
    assert ours.ntendon == mm.ntendon == 1
    # constant fixed-tendon Jacobian == moment at any configuration
    md = mujoco.MjData(mm)
    mujoco.mj_forward(mm, md)
    np.testing.assert_allclose(np.asarray(ours.ten_J),
                               md.ten_J.reshape(mm.ntendon, mm.nv),
                               atol=1e-12)
    np.testing.assert_allclose(np.asarray(ours.ten_stiffness),
                               mm.tendon_stiffness, atol=1e-12)
    np.testing.assert_allclose(np.asarray(ours.ten_damping),
                               mm.tendon_damping, atol=1e-12)
    np.testing.assert_allclose(np.asarray(ours.ten_springlength),
                               mm.tendon_lengthspring, atol=1e-12)
    np.testing.assert_allclose(np.asarray(ours.ten_invweight0),
                               mm.tendon_invweight0, rtol=1e-9)


def test_tendon_springlength_default_resolves_to_zero():
    """springlength unset (MuJoCo's -1 -1 sentinel) -> (0, 0), matching
    the MuJoCo 3.10 compiler."""
    xml = _PASSIVE_XML.replace(' springlength="-0.1 0.15"', "")
    mm = mujoco.MjModel.from_xml_string(xml)
    ours = load_mjcf(xml_string=xml).finalize(jnp.float64)
    np.testing.assert_allclose(np.asarray(ours.ten_springlength),
                               mm.tendon_lengthspring, atol=1e-12)


def _states(mm, n, seed, spread=0.8):
    rng = np.random.RandomState(seed)
    for _ in range(n):
        yield (rng.uniform(-spread, spread, mm.nq),
               rng.uniform(-1.0, 1.0, mm.nv),
               rng.uniform(-1.5, 1.5, mm.nu))


def test_tendon_passive_and_actuator_match_mujoco():
    """Deadband spring + damper + tendon-transmission motor: smooth
    qacc matches MuJoCo to machine precision (f64)."""
    mm = mujoco.MjModel.from_xml_string(_PASSIVE_XML)
    md = mujoco.MjData(mm)
    ours = load_mjcf(xml_string=_PASSIVE_XML).finalize(jnp.float64)
    assert not ours.actuator_simple
    acc = jax.jit(lambda q, v, u: qacc_smooth(ours, State(qpos=q, qvel=v), u))
    for qpos, qvel, ctrl in _states(mm, 12, 3):
        md.qpos[:] = qpos
        md.qvel[:] = qvel
        md.ctrl[:] = ctrl
        mujoco.mj_forward(mm, md)
        mine = np.asarray(acc(jnp.asarray(qpos), jnp.asarray(qvel),
                              jnp.asarray(ctrl)))
        scale = max(np.abs(md.qacc).max(), 1.0)
        assert np.abs(mine - md.qacc).max() / scale < 1e-6, (mine, md.qacc)


def test_tendon_limits_match_mujoco_newton():
    """Length-limited tendon through the implicit solver: qacc on
    limit-active states tracks MuJoCo's constraint response."""
    mm = mujoco.MjModel.from_xml_string(_LIMIT_XML)
    md = mujoco.MjData(mm)
    ours = load_mjcf(xml_string=_LIMIT_XML).finalize(jnp.float64,
                                                    solver="newton")
    acc = jax.jit(lambda q, v, u: qacc_smooth(ours, State(qpos=q, qvel=v), u))
    errs, n_active = [], 0
    for qpos, qvel, ctrl in _states(mm, 24, 7, spread=0.9):
        md.qpos[:] = qpos
        md.qvel[:] = qvel
        md.ctrl[:] = ctrl
        mujoco.mj_forward(mm, md)
        mine = np.asarray(acc(jnp.asarray(qpos), jnp.asarray(qvel),
                              jnp.asarray(ctrl)))
        scale = max(np.abs(md.qacc).max(), 1.0)
        errs.append(np.abs(mine - md.qacc).max() / scale)
        if md.nefc:
            n_active += 1
    assert n_active >= 5, "test states never activate the tendon limit"
    assert np.median(errs) < 2e-2, (np.median(errs), sorted(errs))


def test_tendon_penalty_path_runs_and_respects_limits():
    """Penalty fallback: the limited tendon stays near its range under
    integration (approximate response, stability check)."""
    from mjrl_tpu.physics.step import step_n
    from mjrl_tpu.physics import dynamics as dyn
    ours = load_mjcf(xml_string=_LIMIT_XML).finalize(jnp.float64)
    s = State(qpos=jnp.asarray([0.0, 0.0]), qvel=jnp.asarray([0.0, 0.0]))
    # drive the joints apart so the tendon length grows past its limit
    ctrl = jnp.asarray([-1.0, 1.0])
    stepper = jax.jit(lambda st: step_n(ours, st, ctrl, 5))
    for _ in range(50):
        s = stepper(s)
    L = float(dyn.tendon_lengths(ours, s.qpos)[0])
    assert np.isfinite(np.asarray(s.qpos)).all()
    assert L < 0.5 + 0.1, L  # soft overshoot only


def test_gym_humanoid_tendons_parse():
    """gymnasium humanoid.xml's hipknee tendons parse into the tables
    (inert there: no stiffness/damping/limit/actuation)."""
    import os
    import gymnasium
    path = os.path.join(os.path.dirname(gymnasium.__file__),
                        "envs/mujoco/assets/humanoid.xml")
    mm = mujoco.MjModel.from_xml_path(path)
    ours = load_mjcf(path).finalize(jnp.float64)
    assert ours.ntendon == mm.ntendon == 2
    # humanoid.xml compiles with a sparse tendon Jacobian whose index
    # arrays the python binding doesn't expose — densify by finite
    # differences of ten_length (the coefs are integers, so eps error
    # is ~1e-10)
    md = mujoco.MjData(mm)
    md.qpos[:] = mm.qpos0
    mujoco.mj_forward(mm, md)
    base = md.ten_length.copy()
    eps = 1e-6
    dense = np.zeros((mm.ntendon, mm.nv))
    for d in range(mm.nv):
        md.qpos[:] = mm.qpos0
        qv = np.zeros(mm.nv)
        qv[d] = 1.0
        mujoco.mj_integratePos(mm, md.qpos, qv, eps)
        mujoco.mj_forward(mm, md)
        dense[:, d] = (md.ten_length - base) / eps
    np.testing.assert_allclose(np.asarray(ours.ten_J), dense, atol=1e-6)
