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
(exact once penetration exceeds the solimp width, default 1 mm);
frictionless contact rows (the mjrl arm/peg assets declare condim=1;
locomotion friction stays on the penalty path tangentially); Jacobi with
under-relaxation instead of sequential Gauss-Seidel.

Constraint rows are static: one row per limited dof + one per collision
contact point, with inactive rows masked to zero impulse.
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
    """-> (J (C, nv), pos (C,), active (C,), k (C,), b (C,)).

    Rows: limited dofs (lower and upper merged into one signed row — at
    most one side can be violated) followed by contact normals.
    """
    dtype = qvel.dtype
    rows, poss, actives, ks, bs = [], [], [], [], []

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
        rows.append(j_c)
        poss.append(-depths)            # feasible when separated
        actives.append((depths > 0).astype(dtype))
        ks.append(k_c)
        bs.append(b_c)

    return (jnp.concatenate(rows), jnp.concatenate(poss),
            jnp.concatenate(actives), jnp.concatenate(ks),
            jnp.concatenate(bs))


def solve_constraints(model: Model, mh, qacc_smooth, j, pos, active, k, b,
                      qvel):
    """Projected-Jacobi solve of the regularized dual; returns the
    constraint acceleration Mh^-1 J^T lambda."""
    jv = j @ qvel
    aref = -b * jv - k * D_MAX * jnp.minimum(pos, 0.0)

    # Minv J^T by column solves on the (already damped) mass matrix
    minv_jt = jax.vmap(lambda row: chol_solve_unrolled(mh, row))(j).T
    a = j @ minv_jt                                   # (C, C)
    diag = jnp.diagonal(a)
    r = (1.0 - D_MAX) / D_MAX * jnp.maximum(diag, 1e-10)
    a = a + jnp.diag(r)
    diag_full = jnp.maximum(diag + r, 1e-10)

    rhs = aref - j @ qacc_smooth

    def body(_, lam):
        resid = a @ lam - rhs
        lam = lam - RELAX * resid / diag_full
        lam = jnp.maximum(lam, 0.0) * active
        return lam

    lam0 = jnp.zeros_like(rhs)
    lam = jax.lax.fori_loop(0, JACOBI_ITERS, body, lam0)
    return minv_jt @ lam


def constrained_qacc(model: Model, data, cdof, cvel, qpos, qvel, mh,
                     qfrc_minus_bias):
    """qacc under the implicit solver: smooth solve + constraint dual."""
    qacc_smooth = chol_solve_unrolled(mh, qfrc_minus_bias)
    j, pos, active, k, b = constraint_rows(model, data, cdof, cvel, qpos,
                                           qvel)
    dacc = solve_constraints(model, mh, qacc_smooth, j, pos, active, k, b,
                             qvel)
    return qacc_smooth + dacc
