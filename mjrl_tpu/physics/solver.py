"""Implicit constraint solver (opt-in): MuJoCo-style soft-constraint dual
with impedance regularization, solved by projected Jacobi iteration.

The default engine path handles joint limits and contacts with explicit
penalties (documented approximation — dynamics.limit_qacc,
collision.contact_qfrc).  Selecting ``solver="pgs"`` on the builder (or
``model.replace(solver=1)``) switches to the constraint formulation
MuJoCo uses (computation.rst "soft constraints"):

  per active constraint i with Jacobian row J_i, position residual
  pos_i (negative = violated), impedance d:
    aref_i = -b (J_i v) - k d pos_i,    b = 2/(d_max tau),
                                        k = 1/(d_max^2 tau^2 zeta^2)
  dual:  A lambda = aref - J qacc_smooth,
         A = J Mh^-1 J^T + R,  R_ii = (1 - d)/d * (J Mh^-1 J^T)_ii
  with lambda >= 0 (normals, limits) solved by projected Jacobi, then
    qacc = qacc_smooth + Mh^-1 J^T lambda.

Simplifications vs MuJoCo (documented): constant impedance d = d_max
(exact once penetration exceeds the solimp width, default 1 mm); the
friction cone is boxed per tangent direction (|lambda_t| <= mu lambda_n,
MuJoCo uses pyramidal/elliptic cones); Jacobi with under-relaxation
instead of sequential Gauss-Seidel.

Constraint rows are static: one row per limited dof, then one normal row
per collision contact point, then two tangential (friction) rows per
contact; inactive rows are masked to zero impulse.
"""

import numpy as np
import jax
import jax.numpy as jnp

from mjrl_tpu.physics import math as pm
from mjrl_tpu.physics.collision import find_contacts
from mjrl_tpu.physics.dynamics import ancestor_mask
from mjrl_tpu.physics.model import Model
from mjrl_tpu.ops.linalg import chol_solve_unrolled

D_MAX = 0.95          # MuJoCo default solimp d_max
JACOBI_ITERS = 30
RELAX = 0.7


def _gains(timeconst, dampratio):
    b = 2.0 / (D_MAX * jnp.maximum(timeconst, 1e-12))
    k = 1.0 / jnp.maximum(
        D_MAX * D_MAX * timeconst * timeconst * dampratio * dampratio,
        1e-12)
    return k, b


def constraint_rows(model: Model, data, cdof, cvel, qpos, qvel):
    """-> (J (C, nv), pos (C,), active (C,), k (C,), b (C,),
    mu (C,), parent (C,) int array).

    Rows: limited dofs (lower and upper merged into one signed row — at
    most one side can be violated), contact normals, then two friction
    rows per contact.  ``parent[i]`` is the index of the normal row a
    friction row couples to (-1 for non-friction rows); ``mu`` is its
    friction coefficient.
    """
    dtype = qvel.dtype
    rows, poss, actives, ks, bs = [], [], [], [], []
    mus, parents = [], []

    # ---- joint limits -------------------------------------------------
    nv = model.nv
    q = qpos[jnp.asarray(np.array(model.dof_qpos_idx, np.int32))]
    lo, hi = model.dof_range[:, 0], model.dof_range[:, 1]
    below = jnp.maximum(lo - q, 0.0)    # violation of the lower bound
    above = jnp.maximum(q - hi, 0.0)
    use_lower = below >= above
    sign = jnp.where(use_lower, 1.0, -1.0)
    dist = jnp.where(use_lower, q - lo, hi - q)   # >= 0 feasible
    active_l = model.dof_limited * ((below > 0) | (above > 0))
    j_l = sign[:, None] * jnp.eye(nv, dtype=dtype)
    k_l, b_l = _gains(model.dof_solref[:, 0], model.dof_solref[:, 1])
    rows.append(j_l)
    poss.append(dist)
    actives.append(active_l.astype(dtype))
    ks.append(k_l)
    bs.append(b_l)
    mus.append(jnp.zeros((nv,), dtype))
    parents.append(np.full(nv, -1, np.int32))

    # ---- ball-joint rotation-angle limits ------------------------------
    from mjrl_tpu.physics.dynamics import ball_limit_terms
    n_ball = 0
    for bj, da, axis, bpos, bk, bb in ball_limit_terms(model, qpos):
        n_ball += 1
        jrow = jnp.zeros((nv,), dtype).at[da:da + 3].set(-axis)
        rows.append(jrow[None])
        poss.append(bpos[None])
        actives.append((model.jnt_limited[bj]
                        * (bpos < 0)).astype(dtype)[None])
        ks.append(bk[None])
        bs.append(bb[None])
        mus.append(jnp.zeros((1,), dtype))
        parents.append(np.full(1, -1, np.int32))

    # ---- contact normals ----------------------------------------------
    depths, points, normals, g1, g2 = find_contacts(model, data)
    C = int(depths.shape[0])
    if C:
        gb = jnp.asarray(np.array(model.geom_body, np.int32))
        b1, b2 = gb[g1], gb[g2]
        mask = jnp.asarray(ancestor_mask(model), dtype)
        coeff = mask[b2] - mask[b1]
        u = jnp.concatenate([pm.cross(points, normals), normals], axis=-1)
        j_c = coeff * sum(cdof[None, :, k] * u[:, None, k]
                          for k in range(6))
        solref = jnp.maximum(model.geom_solref[g1], model.geom_solref[g2])
        k_c, b_c = _gains(solref[:, 0], solref[:, 1])
        active_c = (depths > 0).astype(dtype)
        rows.append(j_c)
        poss.append(-depths)            # feasible when separated
        actives.append(active_c)
        ks.append(k_c)
        bs.append(b_c)
        mus.append(jnp.zeros((C,), dtype))
        parents.append(np.full(C, -1, np.int32))

        # two tangential friction rows per contact (boxed cone)
        mu = jnp.maximum(model.geom_friction[g1, 0],
                         model.geom_friction[g2, 0])
        # tangent basis orthogonal to each normal
        ref = jnp.where(jnp.abs(normals[:, 2:3]) < 0.9,
                        jnp.tile(jnp.asarray([0.0, 0.0, 1.0], dtype),
                                 (C, 1)),
                        jnp.tile(jnp.asarray([1.0, 0.0, 0.0], dtype),
                                 (C, 1)))
        t1 = pm.cross(normals, ref)
        t1 = t1 / (jnp.linalg.norm(t1, axis=-1, keepdims=True) + 1e-12)
        t2 = pm.cross(normals, t1)
        # normals start after the per-dof limit rows and ball-limit rows
        normal_row0 = model.nv + n_ball
        for tdir in (t1, t2):
            u_t = jnp.concatenate([pm.cross(points, tdir), tdir], axis=-1)
            j_t = coeff * sum(cdof[None, :, k] * u_t[:, None, k]
                              for k in range(6))
            rows.append(j_t)
            poss.append(jnp.zeros((C,), dtype))   # no positional term
            actives.append(active_c * (mu > 0))
            ks.append(jnp.zeros((C,), dtype))
            bs.append(b_c)
            mus.append(mu)
            parents.append(np.arange(normal_row0, normal_row0 + C,
                                     dtype=np.int32))

    return (jnp.concatenate(rows), jnp.concatenate(poss),
            jnp.concatenate(actives), jnp.concatenate(ks),
            jnp.concatenate(bs), jnp.concatenate(mus),
            jnp.asarray(np.concatenate(parents)))


def solve_constraints(model: Model, mh, qacc_smooth, j, pos, active, k, b,
                      qvel, mu, parent):
    """Projected-Jacobi solve of the regularized dual; returns the
    constraint acceleration Mh^-1 J^T lambda.  Friction rows project into
    the box |lambda_t| <= mu * lambda_n(parent)."""
    jv = j @ qvel
    aref = -b * jv - k * D_MAX * jnp.minimum(pos, 0.0)

    # Minv J^T by column solves on the (already damped) mass matrix
    minv_jt = jax.vmap(lambda row: chol_solve_unrolled(mh, row))(j).T
    # A = J Minv J^T + diag(r) has rank <= nv, so it is NEVER materialized:
    # A @ lam = J (Minv J^T lam) + r*lam costs O(C nv) per Jacobi sweep
    # instead of O(C^2) — decisive for contact-rich models (peg insertion
    # has ~1.4k static rows but nv = 7).
    diag = jnp.sum(j * minv_jt.T, axis=-1)            # diag(J Minv J^T)
    r = (1.0 - D_MAX) / D_MAX * jnp.maximum(diag, 1e-10)
    diag_full = jnp.maximum(diag + r, 1e-10)

    rhs = aref - j @ qacc_smooth

    is_friction = parent >= 0
    parent_safe = jnp.maximum(parent, 0)

    def body(_, lam):
        resid = j @ (minv_jt @ lam) + r * lam - rhs
        lam = lam - RELAX * resid / diag_full
        # unilateral rows: lambda >= 0; friction rows: boxed cone
        lam_uni = jnp.maximum(lam, 0.0)
        bound = mu * lam_uni[parent_safe]
        lam_fric = jnp.clip(lam, -bound, bound)
        lam = jnp.where(is_friction, lam_fric, lam_uni) * active
        return lam

    lam0 = jnp.zeros_like(rhs)
    lam = jax.lax.fori_loop(0, JACOBI_ITERS, body, lam0)
    return minv_jt @ lam


def constrained_qacc(model: Model, data, cdof, cvel, qpos, qvel, mh,
                     qfrc_minus_bias):
    """qacc under the implicit solver: smooth solve + constraint dual."""
    qacc_smooth = chol_solve_unrolled(mh, qfrc_minus_bias)
    j, pos, active, k, b, mu, parent = constraint_rows(
        model, data, cdof, cvel, qpos, qvel)
    dacc = solve_constraints(model, mh, qacc_smooth, j, pos, active, k, b,
                             qvel, mu, parent)
    return qacc_smooth + dacc
