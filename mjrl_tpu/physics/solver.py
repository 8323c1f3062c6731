"""MuJoCo-grade implicit constraint solver: primal Newton on qacc.

This is the TPU-native replacement for the constraint solver inside the
reference's native sim boundary (reference mjrl/envs/mujoco_env.py:11-15,
120-126).  Selecting ``solver="newton"`` (aliases ``"pgs"``/``"implicit"``)
on the builder switches limits + contacts from the explicit penalty path
(dynamics.limit_qacc, collision.contact_qfrc) to MuJoCo's soft-constraint
formulation, solved exactly:

  qacc = argmin_a  1/2 (a - a_smooth)^T M (a - a_smooth)
                 + 1/2 sum_i active_i * min(J_i a - aref_i, 0)^2 / R_i

  aref_i = -B (J_i v) - K d(r_i) r_i        r_i = pos_i - margin_i (<= 0)
  K = 1/(dmax^2 tc^2 dr^2),  B = 2/(dmax tc)   from solref=(tc, dr),
      tc floored at 2*timestep (MuJoCo mj_makeImpedance)
  d(r) = solimp impedance ramp (d0 -> dwidth over |r| in [0, width],
      split-polynomial sigmoid with midpoint/power)
  R_i = (1 - d_i)/d_i * diagApprox_i        (MuJoCo mj_diagApprox:
      limits -> dof_invweight0[dof]; frictionless contacts -> iw1+iw2;
      pyramidal contacts -> (iw1+iw2) * 2 mu^2 (1 + mu^2))

Friction cone: pyramidal (MuJoCo default) — each contact point yields 4
facet rows  Jn ± mu Jt1, Jn ± mu Jt2, all with force >= 0; the tangent
frame follows MuJoCo's convention t1 ∝ (0, n_z, -n_y).

Every formula above was pinned down empirically against mjData.efc_*
probes (efc_KBIP, efc_R, efc_aref, efc_J) and the full solve validated to
machine precision against MuJoCo's Newton solver on hopper floor-contact
states (tests/test_solver.py golden data).

Solved with fixed-iteration Newton: exact Hessian M + J^T diag(s) J
(SPD, unrolled Cholesky — ops/linalg.py), vectorized parallel line
search over a static alpha grid (the 1-D restriction is piecewise
quadratic; a 14-point geometric grid plus alpha=0 never increases the
cost).  Warm-started on qacc across substeps and RK4 stages (step.py),
which cuts the iterations needed to converge after the first substep.
Constraint rows are static (trace-time) in count; inactive rows are
masked out of the cost.
"""

import numpy as np
import jax
import jax.numpy as jnp

from mjrl_tpu.physics import math as pm
from mjrl_tpu.physics.collision import contact_geom_ids, find_contacts
from mjrl_tpu.physics.dynamics import ancestor_mask, ball_limit_terms
from mjrl_tpu.physics.model import BALL, Model
from mjrl_tpu.ops.linalg import chol_solve_unrolled

NEWTON_ITERS = 8
# line-search grid: 0 guarantees monotone cost; 2.0 allows over-stepping
_ALPHAS = np.array([0.0, 1.0, 0.7, 0.5, 0.35, 0.25, 0.17, 0.12,
                    0.08, 0.05, 0.03, 0.02, 0.01, 2.0])


def impedance(solimp, violation):
    """MuJoCo solimp impedance ramp d(r) for violation r >= 0.

    solimp = (d0, dwidth, width, midpoint, power); the ramp interpolates
    d0 -> dwidth over |r| in [0, width] with a split polynomial sigmoid.
    Verified against mjData.efc_KBIP[2] across penetrations."""
    d0, dw, width, mid, power = (solimp[..., 0], solimp[..., 1],
                                 solimp[..., 2], solimp[..., 3],
                                 solimp[..., 4])
    x = jnp.clip(violation / jnp.maximum(width, 1e-12), 0.0, 1.0)
    mid = jnp.clip(mid, 1e-4, 1.0 - 1e-4)
    y_lo = mid * (x / mid) ** power
    y_hi = 1.0 - (1.0 - mid) * ((1.0 - x) / (1.0 - mid)) ** power
    y = jnp.where(x < mid, y_lo, y_hi)
    return jnp.clip(d0 + y * (dw - d0), 1e-4, 1.0 - 1e-4)


def _kb(solref, solimp, timestep):
    """Constraint stiffness/damping in acceleration units; the timeconst
    is floored at 2*timestep like MuJoCo's implicit solvers."""
    tc = jnp.maximum(solref[..., 0], 2.0 * timestep)
    dr = solref[..., 1]
    dmax = solimp[..., 1]
    k = 1.0 / jnp.maximum(dmax * dmax * tc * tc * dr * dr, 1e-12)
    b = 2.0 / jnp.maximum(dmax * tc, 1e-12)
    return k, b


def constraint_rows(model: Model, data, cdof, qpos, qvel):
    """Assemble the static constraint rows -> (J (C, nv), aref (C,),
    active (C,), R (C,)).

    Row layout: one signed row per limited scalar dof, one row per ball
    joint rotation limit, then 4 pyramidal facet rows per contact point.
    """
    dtype = qvel.dtype
    h = model.timestep
    rows, arefs, actives, regs = [], [], [], []

    # ---- scalar-dof joint limits ---------------------------------------
    nv = model.nv
    q = qpos[jnp.asarray(np.array(model.dof_qpos_idx, np.int32))]
    lo, hi = model.dof_range[:, 0], model.dof_range[:, 1]
    below = jnp.maximum(lo - q, 0.0)
    above = jnp.maximum(q - hi, 0.0)
    use_lower = below >= above
    sign = jnp.where(use_lower, 1.0, -1.0)
    dist = jnp.where(use_lower, q - lo, hi - q)   # feasible when > 0
    active_l = model.dof_limited * ((below > 0) | (above > 0))
    k_l, b_l = _kb(model.dof_solref, model.dof_solimp, h)
    imp_l = impedance(model.dof_solimp, jnp.maximum(-dist, 0.0))
    jv = sign * qvel
    rows.append(sign[:, None] * jnp.eye(nv, dtype=dtype))
    arefs.append(-b_l * jv - k_l * imp_l * dist)
    actives.append(active_l.astype(dtype))
    regs.append((1.0 - imp_l) / imp_l * model.dof_invweight0)

    # ---- ball-joint rotation-angle limits ------------------------------
    for bj, da, axis, bpos in _ball_rows(model, qpos):
        k_b, b_b = _kb(model.limit_solref[bj], model.limit_solimp[bj], h)
        imp_b = impedance(model.limit_solimp[bj], jnp.maximum(-bpos, 0.0))
        jrow = jnp.zeros((nv,), dtype).at[da:da + 3].set(-axis)
        jv_b = -(axis[0] * qvel[da] + axis[1] * qvel[da + 1]
                 + axis[2] * qvel[da + 2])
        rows.append(jrow[None])
        arefs.append((-b_b * jv_b - k_b * imp_b * bpos)[None])
        actives.append((model.jnt_limited[bj] * (bpos < 0)).astype(dtype)[None])
        regs.append(((1.0 - imp_b) / imp_b
                     * model.dof_invweight0[da])[None])

    # ---- contacts ------------------------------------------------------
    # condim 1 pairs -> one frictionless normal row (mjCNSTR_CONTACT_
    # FRICTIONLESS); condim 3 -> 4 pyramidal facet rows.  The pair condim
    # is max(geom condims) (MuJoCo rule) and is STATIC, so the split is
    # done with host-side index arrays at trace time.
    depths, points, normals, g1, g2 = find_contacts(model, data)
    C = int(depths.shape[0])
    if C:
        gb = jnp.asarray(np.array(model.geom_body, np.int32))
        b1, b2 = gb[g1], gb[g2]
        mask = jnp.asarray(ancestor_mask(model), dtype)
        coeff = mask[b2] - mask[b1]                       # (C, nv)
        pos_m = -depths                                   # dist - margin
        active_c = (depths > 0).astype(dtype)

        solref = 0.5 * (model.geom_solref[g1] + model.geom_solref[g2])
        solimp = 0.5 * (model.geom_solimp[g1] + model.geom_solimp[g2])
        k_c, b_c = _kb(solref, solimp, h)
        imp_c = impedance(solimp, jnp.maximum(depths, 0.0))
        mu = jnp.maximum(model.geom_friction[g1, 0],
                         model.geom_friction[g2, 0])
        iw = (model.body_invweight0[b1, 0] + model.body_invweight0[b2, 0])

        # MuJoCo tangent frame: t1 ∝ (0, n_z, -n_y), y-axis fallback
        t1_raw = jnp.stack([jnp.zeros_like(normals[:, 0]),
                            normals[:, 2], -normals[:, 1]], axis=-1)
        t1n = jnp.linalg.norm(t1_raw, axis=-1, keepdims=True)
        yhat = jnp.tile(jnp.asarray([0.0, 1.0, 0.0], dtype), (C, 1))
        t1 = jnp.where(t1n > 1e-8, t1_raw / jnp.maximum(t1n, 1e-12), yhat)
        t2 = pm.cross(normals, t1)

        def jac(dirs, pts, cf):
            u = jnp.concatenate([pm.cross(pts, dirs), dirs], axis=-1)
            return cf * sum(cdof[None, :, k] * u[:, None, k]
                            for k in range(6))

        g1_np, g2_np = contact_geom_ids(model)
        condim_np = np.array(model.geom_condim, np.int32)
        pair_condim = np.maximum(condim_np[g1_np], condim_np[g2_np])
        idx_n = np.where(pair_condim == 1)[0]
        idx_f = np.where(pair_condim >= 3)[0]

        if len(idx_n):         # frictionless: one normal row, R from iw
            s = jnp.asarray(idx_n)
            j_row = jac(normals[s], points[s], coeff[s])
            rows.append(j_row)
            arefs.append(-b_c[s] * (j_row @ qvel)
                         - k_c[s] * imp_c[s] * pos_m[s])
            actives.append(active_c[s])
            regs.append(jnp.maximum((1.0 - imp_c[s]) / imp_c[s] * iw[s],
                                    1e-12))

        if len(idx_f):         # pyramidal: 4 facets, mu-scaled diagApprox
            s = jnp.asarray(idx_f)
            mue = mu[s]
            diag_approx = iw[s] * 2.0 * mue * mue * (1.0 + mue * mue)
            r_f = jnp.maximum((1.0 - imp_c[s]) / imp_c[s] * diag_approx,
                              1e-12)
            j_n = jac(normals[s], points[s], coeff[s])
            j_t1 = jac(t1[s], points[s], coeff[s])
            j_t2 = jac(t2[s], points[s], coeff[s])
            for j_t in (j_t1, j_t2):
                for sign_f in (1.0, -1.0):
                    j_f = j_n + sign_f * mu[s][:, None] * j_t
                    rows.append(j_f)
                    arefs.append(-b_c[s] * (j_f @ qvel)
                                 - k_c[s] * imp_c[s] * pos_m[s])
                    actives.append(active_c[s])
                    regs.append(r_f)

    return (jnp.concatenate(rows), jnp.concatenate(arefs),
            jnp.concatenate(actives), jnp.concatenate(regs))


def _ball_rows(model: Model, qpos):
    """(joint, dofadr, axis, pos) per ball joint (static count)."""
    return [(bj, da, axis, bpos)
            for bj, da, axis, bpos, _, _ in ball_limit_terms(model, qpos)]


def solve_qacc(m, a0, j, aref, active, r, warm):
    """Newton solve of the primal soft-constraint QP; returns qacc."""
    dtype = a0.dtype
    rs = jnp.maximum(jnp.where(active > 0, r, 1.0), 1e-12)
    w = active / rs
    alphas = jnp.asarray(_ALPHAS, dtype)

    def body(a, _):
        x = j @ a - aref
        s = w * (x < 0)
        g = m @ (a - a0) + j.T @ (s * x)
        hess = m + (j.T * s) @ j
        da = chol_solve_unrolled(hess, -g)
        jda = j @ da
        c1 = da @ (m @ (a - a0))
        c2 = 0.5 * da @ (m @ da)
        xa = x[None, :] + alphas[:, None] * jda[None, :]
        cost = (c1 * alphas + c2 * alphas * alphas
                + 0.5 * jnp.sum(w[None, :] * jnp.minimum(xa, 0.0) ** 2,
                                axis=1))
        return a + alphas[jnp.argmin(cost)] * da, ()

    a, _ = jax.lax.scan(body, warm, None, length=NEWTON_ITERS)
    return a


def constrained_qacc(model: Model, data, cdof, qpos, qvel, m,
                     qfrc_minus_bias, warm=None):
    """qacc under the implicit solver -> (qacc, qacc_smooth).

    ``warm`` optionally seeds the Newton iteration (qacc from the previous
    substep / RK4 stage); defaults to the smooth acceleration."""
    a0 = chol_solve_unrolled(m, qfrc_minus_bias)
    j, aref, active, r = constraint_rows(model, data, cdof, qpos, qvel)
    if j.shape[0] == 0:
        return a0, a0
    if warm is None:
        start = a0
    else:
        arr, flag = warm
        start = flag * arr + (1.0 - flag) * a0
    return solve_qacc(m, a0, j, aref, active, r, start), a0
