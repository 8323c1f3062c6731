"""Affine actuators (position/velocity/general servos), vector-gear
ball motors and quaternion springs vs live MuJoCo 3.10 (no stored
goldens: the reference engine is installed, so qacc is compared
directly)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

mujoco = pytest.importorskip("mujoco")

from mjrl_tpu.physics.mjcf import load_mjcf  # noqa: E402
from mjrl_tpu.physics.model import State  # noqa: E402
from mjrl_tpu.physics.step import qacc_smooth  # noqa: E402

_SERVO_XML = """
<mujoco>
  <compiler angle="radian" inertiafromgeom="true"/>
  <option timestep="0.002" gravity="0 0 -9.81"/>
  <worldbody>
    <body name="arm" pos="0 0 1">
      <joint name="shoulder" type="hinge" axis="0 1 0" damping="0.3"/>
      <geom type="capsule" fromto="0 0 0 0.4 0 0" size="0.04"
            contype="0" conaffinity="0"/>
      <body name="slider" pos="0.4 0 0">
        <joint name="ext" type="slide" axis="1 0 0" damping="0.1"/>
        <geom type="sphere" size="0.05" contype="0" conaffinity="0"/>
      </body>
    </body>
  </worldbody>
  <actuator>
    <position joint="shoulder" kp="50" kv="3" gear="2"/>
    <velocity joint="ext" kv="10"/>
  </actuator>
</mujoco>
"""

_BALL_XML = """
<mujoco>
  <compiler angle="radian" inertiafromgeom="true"/>
  <option timestep="0.002" gravity="0 0 -9.81"/>
  <worldbody>
    <body name="pend" pos="0 0 1">
      <joint name="b" type="ball" damping="0.2" stiffness="5"/>
      <geom type="capsule" fromto="0 0 0 0 0 -0.3" size="0.04"
            contype="0" conaffinity="0"/>
    </body>
  </worldbody>
  <actuator>
    <motor joint="b" gear="1 0.5 0.25" ctrlrange="-2 2"
           ctrllimited="true"/>
  </actuator>
</mujoco>
"""


def _compare_qacc(xml, n_states=12, seed=0, tol=1e-6):
    mm = mujoco.MjModel.from_xml_string(xml)
    md = mujoco.MjData(mm)
    ours = load_mjcf(xml_string=xml).finalize(jnp.float64)
    acc = jax.jit(lambda q, v, u: qacc_smooth(
        ours, State(qpos=q, qvel=v), u))
    rng = np.random.RandomState(seed)
    for _ in range(n_states):
        qpos = rng.uniform(-0.5, 0.5, mm.nq)
        # normalize any quaternion segments
        for j in range(mm.njnt):
            if mm.jnt_type[j] == mujoco.mjtJoint.mjJNT_BALL:
                qa = mm.jnt_qposadr[j]
                qpos[qa:qa + 4] /= np.linalg.norm(qpos[qa:qa + 4])
        qvel = rng.uniform(-1.0, 1.0, mm.nv)
        ctrl = rng.uniform(-1.5, 1.5, mm.nu)
        md.qpos[:] = qpos
        md.qvel[:] = qvel
        md.ctrl[:] = ctrl
        mujoco.mj_forward(mm, md)
        mine = np.asarray(acc(jnp.asarray(qpos), jnp.asarray(qvel),
                              jnp.asarray(ctrl)))
        scale = max(np.abs(md.qacc).max(), 1.0)
        assert np.abs(mine - md.qacc).max() / scale < tol, \
            (mine, md.qacc)


def test_position_velocity_servos_match_mujoco():
    _compare_qacc(_SERVO_XML)


def test_ball_vector_gear_and_quat_spring_match_mujoco():
    _compare_qacc(_BALL_XML)


def test_simple_motor_fast_path_unchanged():
    """Plain-motor models keep actuator_simple=True (the one-scatter
    path)."""
    from mjrl_tpu.envs.assets import swimmer_model
    m = swimmer_model().finalize(jnp.float64)
    assert m.actuator_simple
    ours = load_mjcf(xml_string=_SERVO_XML).finalize(jnp.float64)
    assert not ours.actuator_simple
