"""Forward dynamics + integrators: the pure ``step`` function.

``step(model, state, ctrl)`` advances one physics timestep and is the
TPU-native replacement for mujoco's ``sim.step()``
(reference mjrl/envs/mujoco_env.py:120-126).  It is pure, jit/vmap/scan
safe, and differentiable.

Integrators (matching MuJoCo):
- Euler: semi-implicit with implicit joint damping — velocity update solves
  (M + h diag(damping)) qacc = qfrc_total (engine_forward.c mj_Euler).
- RK4: classic 4-stage Runge-Kutta on (qpos, qvel).
"""

from functools import partial

import jax
import jax.numpy as jnp

from mjrl_tpu.physics import dynamics as dyn
from mjrl_tpu.physics.collision import contact_qfrc
from mjrl_tpu.ops.linalg import spd_solve
from mjrl_tpu.physics.kinematics import fwd_kinematics
from mjrl_tpu.physics.model import EULER, RK4, Model, State


def _forces_and_mass(model: Model, state: State, ctrl):
    """Everything needed for qacc: (M, qfrc_total, bias)."""
    data = fwd_kinematics(model, state.qpos)
    cdof = dyn.compute_cdof(model, data)
    cvel, cdofdot = dyn.compute_velocities(model, data, cdof, state.qvel)
    m, bias = dyn.mass_and_bias(model, data, cdof, cvel, cdofdot,
                                state.qvel)

    m_diag = jnp.diagonal(m)
    qfrc = dyn.actuator_force(model, ctrl)
    qfrc = qfrc + dyn.spring_force(model, state.qpos)
    qfrc = qfrc + dyn.damping_force(model, state.qvel)
    fluid = dyn.fluid_force(model, data, cvel)
    qfrc = qfrc + dyn.project_body_forces(model, cdof, fluid)
    if model.contact_pairs:
        m_mean = jnp.mean(m_diag)
        qfrc = qfrc + contact_qfrc(model, data, cdof, cvel, state.qvel, m_mean)
    # joint limits as a reference acceleration (see dynamics.limit_qacc)
    qacc_ref = dyn.limit_qacc(model, state.qpos, state.qvel)
    return m, qfrc, bias, qacc_ref


def qacc_smooth(model: Model, state: State, ctrl):
    """qacc = M^-1 (qfrc_total - bias) + limit reference acceleration."""
    m, qfrc, bias, qacc_ref = _forces_and_mass(model, state, ctrl)
    return spd_solve(m, qfrc - bias) + qacc_ref


def _euler_step(model: Model, state: State, ctrl):
    h = model.timestep
    m, qfrc, bias, qacc_ref = _forces_and_mass(model, state, ctrl)
    # implicit joint damping: M + h diag(B)
    mh = m + h * jnp.diag(model.dof_damping)
    qacc = spd_solve(mh, qfrc - bias) + qacc_ref
    qvel = state.qvel + h * qacc
    qpos = state.qpos + h * qvel
    return State(qpos=qpos, qvel=qvel)


def _rk4_step(model: Model, state: State, ctrl):
    h = model.timestep

    def deriv(s):
        return s.qvel, qacc_smooth(model, s, ctrl)

    k1_p, k1_v = deriv(state)
    s2 = State(qpos=state.qpos + 0.5 * h * k1_p,
               qvel=state.qvel + 0.5 * h * k1_v)
    k2_p, k2_v = deriv(s2)
    s3 = State(qpos=state.qpos + 0.5 * h * k2_p,
               qvel=state.qvel + 0.5 * h * k2_v)
    k3_p, k3_v = deriv(s3)
    s4 = State(qpos=state.qpos + h * k3_p, qvel=state.qvel + h * k3_v)
    k4_p, k4_v = deriv(s4)
    qpos = state.qpos + (h / 6.0) * (k1_p + 2 * k2_p + 2 * k3_p + k4_p)
    qvel = state.qvel + (h / 6.0) * (k1_v + 2 * k2_v + 2 * k3_v + k4_v)
    return State(qpos=qpos, qvel=qvel)


def step(model: Model, state: State, ctrl):
    """One physics timestep with the model's integrator."""
    if model.integrator == RK4:
        return _rk4_step(model, state, ctrl)
    return _euler_step(model, state, ctrl)


def step_n(model: Model, state: State, ctrl, n: int):
    """``frame_skip`` sub-steps with constant ctrl (mujoco_env.py:120-126's
    do_simulation).  Uses lax.scan to keep the HLO compact."""

    def body(s, _):
        return step(model, s, ctrl), ()

    out, _ = jax.lax.scan(body, state, None, length=n)
    return out
