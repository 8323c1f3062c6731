"""Round-5 solver features vs live MuJoCo: joint-limit margin, dof
frictionloss rows, the noslip post-pass, and primal-Newton/APGD
agreement.  All were required for Adroit grasp fidelity
(docs/ROADMAP.md item 11); these scenes pin each in isolation."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mjrl_tpu.physics.mjcf import load_mjcf
from mjrl_tpu.physics.model import State
from mjrl_tpu.physics.step import qacc_smooth


def _qacc_vs_mujoco(xml, states, atol=1e-6):
    mujoco = pytest.importorskip("mujoco")
    m = mujoco.MjModel.from_xml_string(xml)
    d = mujoco.MjData(m)
    model = load_mjcf(xml_string=xml).finalize(jnp.float64, solver="newton")
    acc = jax.jit(lambda q, v: qacc_smooth(
        model, State(qpos=q, qvel=v), jnp.zeros(model.nu)))
    errs = []
    for qpos, qvel in states:
        d.qpos[:] = qpos
        d.qvel[:] = qvel
        d.ctrl[:] = 0
        mujoco.mj_forward(m, d)
        ours = np.asarray(acc(jnp.asarray(qpos), jnp.asarray(qvel)))
        scale = max(np.abs(d.qacc).max(), 1.0)
        errs.append(np.abs(ours - d.qacc).max() / scale)
    return np.asarray(errs)


PENDULUM = """
<mujoco><option timestep="0.002" gravity="0 0 -9.81"/>
<worldbody>
  <body pos="0 0 1">
    <joint name="h" type="hinge" axis="0 1 0" range="-0.5 0.5"
           margin="{margin}" damping="0.01"/>
    <geom type="capsule" fromto="0 0 0 0 0 -0.4" size="0.04"/>
  </body>
</worldbody></mujoco>"""


def test_joint_limit_margin_activates_before_the_bound():
    """MuJoCo activates a joint limit when dist < jnt_margin and
    measures the violation from the margin surface — q inside the
    bound but within the margin must already feel the limit."""
    xml = PENDULUM.format(margin=0.1)
    # q = 0.45: 0.05 from the bound, inside the 0.1 margin
    states = [(np.array([0.45]), np.array([0.8])),
              (np.array([-0.48]), np.array([-1.0])),
              (np.array([0.52]), np.array([0.3]))]   # violated outright
    errs = _qacc_vs_mujoco(xml, states)
    assert errs.max() < 1e-6, errs

    # control: without margin the in-bound states must NOT match the
    # margined model's response (proves the margin actually changes qacc)
    mujoco = pytest.importorskip("mujoco")
    m0 = mujoco.MjModel.from_xml_string(PENDULUM.format(margin=0))
    d0 = mujoco.MjData(m0)
    d0.qpos[:] = [0.45]
    d0.qvel[:] = [0.8]
    mujoco.mj_forward(m0, d0)
    m1 = mujoco.MjModel.from_xml_string(xml)
    d1 = mujoco.MjData(m1)
    d1.qpos[:] = [0.45]
    d1.qvel[:] = [0.8]
    mujoco.mj_forward(m1, d1)
    assert abs(d0.qacc[0] - d1.qacc[0]) > 1e-3


SLIDER = """
<mujoco><option timestep="0.002" gravity="0 0 -9.81"/>
<worldbody>
  <body pos="0 0 0.5">
    <joint name="s" type="slide" axis="1 0 0" frictionloss="{floss}"/>
    <geom type="box" size="0.1 0.1 0.1" mass="1"/>
  </body>
  <body pos="0 0 1.0">
    <joint type="slide" axis="1 0 0" frictionloss="{floss}"/>
    <joint type="slide" axis="0 0 1"/>
    <geom type="box" size="0.1 0.1 0.1" mass="1"/>
  </body>
</worldbody></mujoco>"""


def test_dof_frictionloss_rows_match_live_mujoco():
    """Dry joint friction: a moving dof is decelerated by at most
    frictionloss force; matches mjData.qacc on sliding states."""
    xml = SLIDER.format(floss=2.0)
    states = [(np.zeros(3), np.array([1.0, -0.5, 0.2])),
              (np.zeros(3), np.array([-2.0, 1.5, -0.1])),
              (np.zeros(3), np.array([0.001, 0.0, 0.0]))]
    errs = _qacc_vs_mujoco(xml, states)
    assert errs.max() < 1e-6, errs
    # the friction must actually brake: dof 0 decelerates toward zero
    model = load_mjcf(xml_string=SLIDER.format(floss=2.0)).finalize(
        jnp.float64, solver="newton")
    qacc = qacc_smooth(model, State(qpos=jnp.zeros(3),
                                    qvel=jnp.asarray([1.0, 0.0, 0.0])),
                       jnp.zeros(0))
    assert float(qacc[0]) < -1.5


INCLINE = """
<mujoco><option timestep="0.002" gravity="0 0 -9.81"
        noslip_iterations="{ns}"/>
<worldbody>
  <geom type="plane" size="2 2 0.1" euler="0 15 0" friction="1 0.005 0.0001"/>
  <body pos="0 0 0.12">
    <joint type="slide" axis="1 0 0"/><joint type="slide" axis="0 1 0"/>
    <joint type="slide" axis="0 0 1"/>
    {hinge}
    <geom type="sphere" size="0.05" condim="3" friction="1 0.005 0.0001"/>
  </body>
</worldbody></mujoco>"""
HINGE = '<joint type="hinge" axis="0 1 0"/>'


def test_noslip_post_pass_matches_live_mujoco():
    """<option noslip_iterations>: the friction post-pass removes the
    residual slip of regularized friction.  A sphere on a 15-degree
    incline (slide dofs only, so it cannot roll) must match MuJoCo's
    noslip qacc AND creep far less than the regularized solution."""
    mujoco = pytest.importorskip("mujoco")
    q0 = np.array([0.0, 0.0, -0.0702])
    errs = _qacc_vs_mujoco(INCLINE.format(ns=20, hinge=""),
                           [(q0, np.zeros(3))], atol=1e-5)
    assert errs.max() < 1e-4, errs
    # rolling variant still matches MuJoCo's noslip solution
    errs_r = _qacc_vs_mujoco(
        INCLINE.format(ns=20, hinge=HINGE),
        [(np.concatenate([q0, [0.0]]), np.zeros(4))], atol=1e-5)
    assert errs_r.max() < 1e-4, errs_r

    # slip elimination vs the plain regularized solve (both ours): the
    # TANGENTIAL acceleration (projection onto the downhill surface
    # tangent; the in-plane-of-qacc normal pushout is not slip) must
    # drop to ~zero — mu=1 static friction holds the non-rolling sphere
    m_ns = load_mjcf(xml_string=INCLINE.format(ns=20, hinge="")).finalize(
        jnp.float64, solver="newton")
    m_reg = load_mjcf(xml_string=INCLINE.format(ns=0, hinge="")).finalize(
        jnp.float64, solver="newton")
    st = State(qpos=jnp.asarray(q0), qvel=jnp.zeros(3))
    a_ns = np.asarray(qacc_smooth(m_ns, st, jnp.zeros(0)))
    a_reg = np.asarray(qacc_smooth(m_reg, st, jnp.zeros(0)))
    c15, s15 = np.cos(np.deg2rad(15)), np.sin(np.deg2rad(15))
    tang = np.array([c15, 0.0, -s15])
    slip_ns = abs(float(a_ns @ tang))
    slip_reg = abs(float(a_reg @ tang))
    assert slip_reg > 0.1          # regularized friction visibly creeps
    assert slip_ns < 0.05 * slip_reg, (slip_ns, slip_reg)


def test_primal_newton_agrees_with_apgd():
    """The primal Newton solver (Model.newton_iters) minimizes the same
    QP as the dual APGD — identical qacc on contact states."""
    xml = INCLINE.format(ns=0, hinge=HINGE)
    m_apgd = load_mjcf(xml_string=xml).finalize(jnp.float64,
                                                solver="newton")
    m_newt = load_mjcf(xml_string=xml).finalize(jnp.float64,
                                                solver="newton",
                                                newton_iters=30)
    rng = np.random.default_rng(3)
    for _ in range(5):
        qpos = np.array([0.0, 0.0, rng.uniform(-0.072, -0.068),
                         rng.normal()])
        qvel = rng.normal(0, 0.5, 4)
        st = State(qpos=jnp.asarray(qpos), qvel=jnp.asarray(qvel))
        a1 = np.asarray(qacc_smooth(m_apgd, st, jnp.zeros(0)))
        a2 = np.asarray(qacc_smooth(m_newt, st, jnp.zeros(0)))
        scale = max(np.abs(a1).max(), 1.0)
        assert np.abs(a1 - a2).max() / scale < 5e-4, (a1, a2)
