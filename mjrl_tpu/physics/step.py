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

import jax
import jax.numpy as jnp

from mjrl_tpu.physics import dynamics as dyn
from mjrl_tpu.physics.collision import contact_qfrc
from mjrl_tpu.ops.linalg import spd_solve
from mjrl_tpu.physics import math as pm
from mjrl_tpu.physics.kinematics import fwd_kinematics
from mjrl_tpu.physics.model import BALL, FREE, PGS, RK4, Model, State


def integrate_pos(model: Model, qpos, qvel, h):
    """qpos' = qpos advanced by qvel for time h, per joint type.

    slide/hinge: linear.  ball/free: the quaternion right-multiplies
    exp(h * w_local / 2) (MuJoCo mju_integratePos convention: ball and
    free-joint angular velocities are local) and is renormalized; free
    position additionally integrates the world-frame linear velocity.
    """

    def quat_step(quat, w, h):
        wnorm = jnp.sqrt(jnp.sum(w * w) + 1e-18)
        axis = w / wnorm
        dq = pm.axis_angle_quat(axis, wnorm * h)
        new_quat = pm.quat_mul(quat, dq)
        return new_quat / jnp.sqrt(jnp.sum(new_quat * new_quat) + 1e-18)

    segments = []
    for j in range(model.njnt):
        qa, da = model.jnt_qposadr[j], model.jnt_dofadr[j]
        if model.jnt_type[j] == BALL:
            segments.append(quat_step(qpos[qa:qa + 4], qvel[da:da + 3], h))
        elif model.jnt_type[j] == FREE:
            pos = qpos[qa:qa + 3] + h * qvel[da:da + 3]
            segments.append(pos)
            segments.append(quat_step(qpos[qa + 3:qa + 7],
                                      qvel[da + 3:da + 6], h))
        else:
            segments.append(qpos[qa:qa + 1] + h * qvel[da:da + 1])
    if not segments:
        return qpos
    return jnp.concatenate(segments)


def _forces_and_mass(model: Model, state: State, ctrl):
    """Everything needed for qacc: (M, qfrc_total, bias)."""
    data = fwd_kinematics(model, state.qpos)
    cdof = dyn.compute_cdof(model, data)
    cvel, cdofdot = dyn.compute_velocities(model, data, cdof, state.qvel)
    m, bias = dyn.mass_and_bias(model, data, cdof, cvel, cdofdot,
                                state.qvel)

    m_diag = jnp.diagonal(m)
    qfrc = dyn.actuator_force(model, ctrl, state.qpos, state.qvel)
    qfrc = qfrc + dyn.spring_force(model, state.qpos)
    qfrc = qfrc + dyn.damping_force(model, state.qvel)
    if model.ntendon:
        qfrc = qfrc + dyn.tendon_passive_force(model, state.qpos,
                                               state.qvel)
    fluid = dyn.fluid_force(model, data, cvel)
    qfrc = qfrc + dyn.project_body_forces(model, cdof, fluid)
    if model.solver == PGS:
        # limits/contacts handled by the implicit dual (physics/solver.py)
        ctx = (data, cdof, cvel)
        return m, qfrc, bias, jnp.zeros_like(qfrc), ctx
    if model.contact_pairs:
        qfrc = qfrc + contact_qfrc(model, data, cdof, cvel, state.qvel,
                                   m_diag)
    # joint limits as a reference acceleration (see dynamics.limit_qacc)
    qacc_ref = dyn.limit_qacc(model, state.qpos, state.qvel)
    if BALL in model.jnt_type:
        qacc_ref = qacc_ref + dyn.ball_limit_qacc(model, state.qpos,
                                                  state.qvel)
    if model.ntendon:
        qacc_ref = qacc_ref + dyn.tendon_limit_qacc(model, state.qpos,
                                                    state.qvel)
    if model.neq:
        qacc_ref = qacc_ref + dyn.equality_qacc(model, data, cdof,
                                                state.qpos, state.qvel)
    return m, qfrc, bias, qacc_ref, None


def _qacc(model: Model, state: State, ctrl, warm=None, sweeps=None,
          rows=None):
    """Forward-dynamics acceleration -> (qacc, warm', rows').  ``warm``
    is the optional constraint-impulse vector seeding the implicit
    solver; warm' re-seeds the next substep/stage.  ``rows`` optionally
    reuses a frozen constraint-row context (RK4 stage amortization);
    rows' is the context built/reused (None on the penalty path)."""
    m, qfrc, bias, qacc_ref, ctx = _forces_and_mass(model, state, ctrl)
    if model.solver == PGS:
        from mjrl_tpu.physics.solver import constrained_qacc
        data, cdof, _ = ctx
        qacc, _, lam, rows = constrained_qacc(
            model, data, cdof, state.qpos, state.qvel, m, qfrc - bias,
            warm, sweeps=sweeps, ctx=rows)
        return qacc, lam, rows
    return spd_solve(m, qfrc - bias) + qacc_ref, None, None


def qacc_smooth(model: Model, state: State, ctrl):
    """qacc = M^-1 (qfrc_total - bias) + limit reference acceleration
    (penalty path) or the implicit constrained acceleration (Newton
    path) — MuJoCo's mj_forward qacc."""
    return _qacc(model, state, ctrl)[0]


def _euler_step(model: Model, state: State, ctrl, warm=None, sweeps=None):
    h = model.timestep
    m, qfrc, bias, qacc_ref, ctx = _forces_and_mass(model, state, ctrl)
    # implicit joint damping: M + h diag(B)
    mh = m + h * jnp.diag(model.dof_damping)
    if model.solver == PGS:
        from mjrl_tpu.physics.solver import constrained_qacc
        data, cdof, _ = ctx
        # constraint QP against M (matching mj_forward), then mj_Euler's
        # implicit damping integrates smooth + constraint force with M+hB
        qacc_c, a0, lam, _ = constrained_qacc(
            model, data, cdof, state.qpos, state.qvel, m, qfrc - bias,
            warm, sweeps=sweeps)
        qfrc_con = m @ (qacc_c - a0)
        qacc = spd_solve(mh, qfrc - bias + qfrc_con)
        warm_out = lam
    else:
        qacc = spd_solve(mh, qfrc - bias) + qacc_ref
        warm_out = None
    qvel = state.qvel + h * qacc
    qpos = integrate_pos(model, state.qpos, qvel, h)
    return State(qpos=qpos, qvel=qvel), warm_out


def _rk4_step(model: Model, state: State, ctrl, warm=None, sweeps=None,
              rows=None):
    h = model.timestep

    def deriv(s, w, sw, rws):
        qacc, w2, rws2 = _qacc(model, s, ctrl, w, sweeps=sw, rows=rws)
        return s.qvel, qacc, w2, rws2

    from mjrl_tpu.physics.solver import SWEEPS_WARM
    # constraint rows are rebuilt at EVERY stage by default, matching
    # MuJoCo's mj_RungeKutta (one full mj_forward — collision + row
    # assembly — per stage).  Freezing rows across stages was measured to
    # inject energy at impacts: a contact appearing or deepening during
    # the stage extrapolations is solved against stage-1 geometry, and
    # random-action ants bounced out of the healthy z-range through the
    # TOP (all 16/16 terminations at z>=1.0 vs MuJoCo's fall-dominated
    # mix; survival median 34 vs MuJoCo's 51).  Models that opt into
    # row_freeze_step=True (quasi-static contacts, e.g. peg insertion
    # where the 474-pair narrowphase dominates) keep the frozen context
    # across stages AND substeps.
    # Stages 2-4 run as ONE scanned body over per-stage (c, w) tables —
    # compile-time program diet: the dynamics evaluation is traced twice
    # (cold stage 1 + warm stage) instead of 4x, with op-for-op
    # identical arithmetic to the unrolled form (same left-associated
    # combination sums, same (h/6)*sum order).
    k1_p, k1_v, w, rows = deriv(state, warm, sweeps, rows)
    dt = state.qvel.dtype
    c_t = jnp.asarray([0.5, 0.5, 1.0], dt)
    w_t = jnp.asarray([2.0, 2.0, 1.0], dt)
    stage_rows = rows if model.row_freeze_step else None

    def stage(carry, xs):
        kp, kv, acc_p, acc_v, wc = carry
        c_i, w_i = xs
        s = State(qpos=integrate_pos(model, state.qpos, kp, c_i * h),
                  qvel=state.qvel + c_i * h * kv)
        kp2, kv2, wc, _ = deriv(s, wc, SWEEPS_WARM, stage_rows)
        return (kp2, kv2, acc_p + w_i * kp2, acc_v + w_i * kv2, wc), ()

    (_, _, acc_p, acc_v, w), _ = jax.lax.scan(
        stage, (k1_p, k1_v, k1_p, k1_v, w), (c_t, w_t))
    qpos = integrate_pos(model, state.qpos, acc_p / 6.0, h)
    qvel = state.qvel + (h / 6.0) * acc_v
    return State(qpos=qpos, qvel=qvel), w, rows


def step_warm(model: Model, state: State, ctrl, warm=None, sweeps=None,
              rows=None):
    """One physics timestep -> (state', warm', rows').  warm'/warm carry
    the implicit solver's constraint impulses across consecutive substeps
    (MuJoCo's warm start); rows'/rows carry the frozen constraint-row
    context for RK4 models; both None for the penalty path.  ``sweeps``
    overrides the dual-solver iteration count (None = cold default)."""
    if model.integrator == RK4:
        return _rk4_step(model, state, ctrl, warm, sweeps, rows)
    s2, w2 = _euler_step(model, state, ctrl, warm, sweeps)
    return s2, w2, None


def step(model: Model, state: State, ctrl):
    """One physics timestep with the model's integrator."""
    return step_warm(model, state, ctrl)[0]


def step_n(model: Model, state: State, ctrl, n: int):
    """``frame_skip`` sub-steps with constant ctrl (mujoco_env.py:120-126's
    do_simulation).  Uses lax.scan to keep the HLO compact; the implicit
    solver's qacc warm start is threaded through the scan carry."""
    if model.solver == PGS:
        from mjrl_tpu.physics.solver import SWEEPS_WARM
        # substep 0: cold solve (full iteration budget); remaining
        # substeps warm-start from the previous impulses with a smaller
        # budget — the contact configuration barely moves within a
        # control step.  RK4 rows are rebuilt at every stage (matching
        # MuJoCo's per-mj_forward rebuild: any coarser freeze was
        # measured to inject energy at impacts — see _rk4_step).  Models
        # with row_freeze_step=True (quasi-static contacts, e.g. peg:
        # row assembly is ~80% of a dynamics eval over 474 pairs) freeze
        # the substep-0 rows across the WHOLE control step.
        if not model.row_freeze_step:
            # rows rebuilt per substep (Euler always; RK4 default).
            # ONE scanned body serves both the cold substep (full
            # iteration budget) and the warm ones: sweeps is a TRACED
            # where(i == 0, ...) so the substep program is emitted once
            # instead of twice — at adroit scale (nv=36, 103 pairs) the
            # two-body trace was 8M HLO chars and the TPU compile never
            # landed.  Cold start = zero impulses with a sentinel slot
            # id (-2 never occurs: real ids are -1 or >=0), numerically
            # identical to the old warm=None path.
            from mjrl_tpu.physics.solver import SWEEPS, n_constraint_rows
            C = n_constraint_rows(model)
            warm0 = (jnp.zeros((C,), state.qvel.dtype),
                     jnp.full((C,), -2, jnp.int32))

            def body(carry, i):
                s, w = carry
                sw = jnp.where(i == 0, SWEEPS, SWEEPS_WARM)
                s2, w2, _ = step_warm(model, s, ctrl, w, sweeps=sw)
                return (s2, w2), ()

            (out, _), _ = jax.lax.scan(body, (state, warm0),
                                       jnp.arange(n))
            return out

        state, warm, rows = step_warm(model, state, ctrl, None, None)

        def body(carry, _):
            s, w, r = carry
            s2, w2, r2 = step_warm(model, s, ctrl, w, sweeps=SWEEPS_WARM,
                                   rows=r)
            return (s2, w2, r), ()      # keep the substep-0 rows frozen

        (out, _, _), _ = jax.lax.scan(body, (state, warm, rows), None,
                                      length=n - 1)
        return out

    def body(s, _):
        return step(model, s, ctrl), ()

    out, _ = jax.lax.scan(body, state, None, length=n)
    return out
