"""Smooth forward dynamics: mass matrix, bias forces, passive forces,
actuation — in world-origin spatial coordinates.

Replaces MuJoCo's mj_forward smooth pipeline (the reference's external C
engine).  TPU-first design notes:

- everything is straight-line unrolled vector math (pm.mat_vec / cross /
  rot_diag_rot_t) with no dot_general in the chain, so the whole dynamics
  evaluation fuses into a few elementwise XLA kernels over the env batch;
- spatial inertias are never materialized as 6x6 matrices: I_b v is
  applied directly from (mass, world inertia, CoM) — p = m (v + w x c),
  L0 = I_w w + c x p;
- the mass matrix is assembled as M[d, e] = sum_b mask[b,d] mask[b,e]
  S_d . (I_b S_e) over a static ancestor-dof mask — dense, vmap-friendly,
  no sequential composite-rigid-body recursion;
- nv <= ~20 for supported models, so the final solve is the unrolled
  Cholesky in ops.linalg.

Passive forces: joint spring/damping (dof_damping used implicitly by the
Euler integrator, matching MuJoCo's semi-implicit treatment), soft joint
limits derived from solref (timeconst, dampratio), and the MuJoCo
"equivalent inertia box" fluid model (viscosity + density) required by the
swimmer (reference assets/swimmer.xml:16).
"""

import jax
import numpy as np
import jax.numpy as jnp

from mjrl_tpu.physics import math as pm
from mjrl_tpu.physics.kinematics import Data
from mjrl_tpu.physics.model import (BALL, EQ_CONNECT, EQ_JOINT, EQ_WELD,
                                    EULER, FREE, HINGE, JNT_NV, SLIDE, Model)


# ---------------------------------------------------------------------------
# Static topology helpers (computed at trace time from static aux data)
# ---------------------------------------------------------------------------

def ancestor_mask(model: Model) -> np.ndarray:
    """(nbody, nv) float mask: mask[b, d] = 1 iff dof d is on the kinematic
    chain from the world to body b (inclusive)."""
    mask = np.zeros((model.nbody, model.nv), np.float32)
    for b in range(1, model.nbody):
        p = model.body_parent[b]
        mask[b] = mask[p]
        for j in model.body_jnts[b]:
            da = model.jnt_dofadr[j]
            mask[b, da:da + JNT_NV[model.jnt_type[j]]] = 1.0
    return mask


def joint_dofs(model: Model, j):
    """Static list of dof indices for joint j."""
    da = model.jnt_dofadr[j]
    return list(range(da, da + JNT_NV[model.jnt_type[j]]))


# ---------------------------------------------------------------------------
# Motion subspace and velocities
# ---------------------------------------------------------------------------

def compute_cdof(model: Model, data: Data):
    """(nv, 6) world-origin motion axes per dof.

    hinge: (axis, anchor x axis); slide: (0, axis); ball: the post-joint
    body frame's 3 axes anchored at the joint anchor (qvel = local angular
    velocity); free: 3 world translation axes followed by 3 body-frame
    rotation axes (MuJoCo convention: free-joint angular velocity is
    local, linear is world), anchored at the body origin.
    """
    cols = []
    zero3 = jnp.zeros(3, data.xpos.dtype)
    for j in range(model.njnt):
        if model.jnt_type[j] == HINGE:
            a = data.xaxis[j]
            cols.append(jnp.concatenate([a, pm.cross(data.xanchor[j], a)]))
        elif model.jnt_type[j] == SLIDE:
            a = data.xaxis[j]
            cols.append(jnp.concatenate([jnp.zeros_like(a), a]))
        elif model.jnt_type[j] == BALL:
            rot = data.xmat[model.jnt_body[j]]
            anchor = data.xanchor[j]
            for i in range(3):
                a = rot[:, i]
                cols.append(jnp.concatenate([a, pm.cross(anchor, a)]))
        elif model.jnt_type[j] == FREE:
            b = model.jnt_body[j]
            rot = data.xmat[b]
            anchor = data.xpos[b]
            for i in range(3):
                e = jnp.zeros(3, data.xpos.dtype).at[i].set(1.0)
                cols.append(jnp.concatenate([zero3, e]))
            for i in range(3):
                a = rot[:, i]
                cols.append(jnp.concatenate([a, pm.cross(anchor, a)]))
        else:
            raise NotImplementedError
    return (jnp.stack(cols) if cols
            else jnp.zeros((0, 6), data.xpos.dtype))


def compute_velocities(model: Model, data: Data, cdof, qvel):
    """Body spatial velocities (nbody, 6) and cdof time derivatives (nv, 6).

    cdofdot[d] = (velocity of the frame carrying dof d) x cdof[d], where
    that velocity includes preceding dofs of the same body (MuJoCo mj_comVel
    convention).
    """
    dtype = qvel.dtype
    cvel = [jnp.zeros(6, dtype)]
    cdofdot = [None] * model.nv
    for b in range(1, model.nbody):
        v = cvel[model.body_parent[b]]
        for j in model.body_jnts[b]:
            dofs = joint_dofs(model, j)
            if model.jnt_type[j] == FREE:
                # free joint (MuJoCo mj_comVel special case): build the
                # full 6-dof body velocity first; translation axes are
                # constant (cdofdot = 0); body-fixed rotation axes use the
                # FULL velocity, not the sequential partial.
                for d in dofs:
                    v = v + cdof[d] * qvel[d]
                for d in dofs[:3]:
                    cdofdot[d] = jnp.zeros(6, dtype)
                for d in dofs[3:]:
                    cdofdot[d] = pm.motion_cross(v, cdof[d])
                continue
            if model.jnt_type[j] == BALL:
                # MuJoCo mj_comVel: all 3 ball dofs use the velocity
                # BEFORE this joint's own contributions (probed: a
                # root-attached ball has cdofdot = 0 exactly)
                for d in dofs:
                    cdofdot[d] = pm.motion_cross(v, cdof[d])
                for d in dofs:
                    v = v + cdof[d] * qvel[d]
                continue
            for d in dofs:
                cdofdot[d] = pm.motion_cross(v, cdof[d])
                v = v + cdof[d] * qvel[d]
        cvel.append(v)
    cvel = jnp.stack(cvel)
    cdofdot = (jnp.stack(cdofdot) if model.nv
               else jnp.zeros((0, 6), dtype))
    return cvel, cdofdot


# ---------------------------------------------------------------------------
# Spatial inertia application (no 6x6 materialization)
# ---------------------------------------------------------------------------

def _inertia_ctx(model: Model, data: Data):
    """(mass (nbody,), I_world (nbody, 3, 3), com (nbody, 3))."""
    i_world = pm.rot_diag_rot_t(data.ximat, model.body_inertia)
    return model.body_mass, i_world, data.xipos


def _apply_inertia(mass, i_world, com, motion):
    """h = I motion for world-origin spatial motion vectors.

    motion (..., 6) = (omega, v0); returns (..., 6) = (L0, p):
    p = m (v0 + w x c);  L0 = I_w w + c x p.
    Shapes broadcast (mass (...,), i_world (..., 3, 3), com (..., 3)).
    """
    w, v = motion[..., :3], motion[..., 3:]
    p = mass[..., None] * (v + pm.cross(w, com))
    l0 = pm.mat_vec(i_world, w) + pm.cross(com, p)
    return jnp.concatenate([l0, p], axis=-1)


def body_spatial_inertias(model: Model, data: Data):
    """(nbody, 6, 6) world-origin spatial inertias (diagnostic/compat
    path; the hot path applies inertias directly)."""
    import jax
    mass, i_world, com = _inertia_ctx(model, data)
    return jax.vmap(pm.spatial_inertia)(mass, i_world, com)


# ---------------------------------------------------------------------------
# Mass matrix and bias
# ---------------------------------------------------------------------------

def mass_matrix(model: Model, data: Data, cdof):
    """Dense joint-space inertia M (nv, nv) including armature."""
    zeros = jnp.zeros((model.nv,), cdof.dtype)
    m, _ = mass_and_bias(model, data, cdof, jnp.zeros((model.nbody, 6),
                                                      cdof.dtype),
                         jnp.zeros_like(cdof), zeros)
    return m


def mass_and_bias(model: Model, data: Data, cdof, cvel, cdofdot, qvel):
    """(M, qfrc_bias) sharing one inertia context — the hot-path entry
    (mass_matrix/bias_force recompute it when called separately)."""
    mask = jnp.asarray(ancestor_mask(model), cdof.dtype)
    mass, i_world, com = _inertia_ctx(model, data)
    # mass matrix
    u = _apply_inertia(mass[:, None], i_world[:, None], com[:, None],
                       cdof[None, :, :])
    t = sum(cdof[None, :, None, k] * u[:, None, :, k] for k in range(6))
    m = jnp.sum(mask[:, :, None] * mask[:, None, :] * t, axis=0)
    m = m + jnp.diag(model.dof_armature)
    # bias
    avp = jnp.sum(mask[:, :, None] * cdofdot[None, :, :]
                  * qvel[None, :, None], axis=1)
    iv = _apply_inertia(mass, i_world, com, cvel)
    f = _apply_inertia(mass, i_world, com, avp) + pm.force_cross(cvel, iv)
    mg = mass[:, None] * model.gravity[None, :]
    f_grav = jnp.concatenate([pm.cross(data.xipos, mg), mg], axis=-1)
    f = f - f_grav
    tproj = sum(cdof[None, :, k] * f[:, None, k] for k in range(6))
    bias = jnp.sum(mask * tproj, axis=0)
    return m, bias


def bias_force(model: Model, data: Data, cdof, cvel, cdofdot, qvel):
    """qfrc_bias (nv,): Coriolis/centrifugal + gravity, such that
    M qacc + qfrc_bias = qfrc_applied."""
    _, bias = mass_and_bias(model, data, cdof, cvel, cdofdot, qvel)
    return bias


def project_body_forces(model: Model, cdof, forces):
    """Map per-body world-origin spatial forces (nbody, 6) to qfrc (nv,)."""
    mask = jnp.asarray(ancestor_mask(model), cdof.dtype)
    t = sum(cdof[None, :, k] * forces[:, None, k] for k in range(6))
    return jnp.sum(mask * t, axis=0)


# ---------------------------------------------------------------------------
# Passive forces
# ---------------------------------------------------------------------------

# saturation width for penalty limit response (rad or m)
LIMIT_WIDTH = 0.02

def spring_force(model: Model, qpos):
    """Joint springs: -stiffness * (qpos - springref) on slide/hinge
    dofs, and quaternion springs -stiffness * rotvec(q (x) ref^-1) on
    ball and free-joint orientations (MuJoCo mj_passive mju_subQuat
    semantics; the free joint's translational spring pulls toward
    qpos0)."""
    q = qpos[jnp.asarray(np.array(model.dof_qpos_idx, np.int32))]
    qfrc = -model.dof_stiffness * (q - model.dof_ref)
    for j in model.jnt_spring_quat:        # static: sprung ball/free jnts
        jt = model.jnt_type[j]
        k = model.jnt_stiffness[j]
        qa, da = model.jnt_qposadr[j], model.jnt_dofadr[j]
        if jt == BALL:
            ref = model.qpos0[qa:qa + 4]
            dq = pm.quat_mul(pm.quat_inv(ref), qpos[qa:qa + 4])
            qfrc = qfrc.at[da:da + 3].add(-k * pm.quat_to_rotvec(dq))
        else:
            qfrc = qfrc.at[da:da + 3].add(
                -k * (qpos[qa:qa + 3] - model.qpos0[qa:qa + 3]))
            ref = model.qpos0[qa + 3:qa + 7]
            dq = pm.quat_mul(pm.quat_inv(ref), qpos[qa + 3:qa + 7])
            qfrc = qfrc.at[da + 3:da + 6].add(-k * pm.quat_to_rotvec(dq))
    return qfrc


def damping_force(model: Model, qvel):
    return -model.dof_damping * qvel


def tendon_lengths(model: Model, qpos):
    """Fixed-tendon lengths L = ten_J @ qpos over scalar dofs (the
    Jacobian is constant — MuJoCo mj_tendon for mjWRAP_JOINT only).
    Ball/free columns of ten_J are structurally zero, so the dof->qpos
    gather is safe for every joint type."""
    q = qpos[jnp.asarray(np.array(model.dof_qpos_idx, np.int32))]
    return model.ten_J @ q


def tendon_passive_force(model: Model, qpos, qvel):
    """qfrc_passive contribution of fixed tendons: deadband spring
    (MuJoCo mj_passive tendon branch — zero force inside
    [springlength0, springlength1], linear outside) plus linear damping
    on the tendon velocity, mapped back through the constant Jacobian."""
    L = tendon_lengths(model, qpos)
    V = model.ten_J @ qvel
    lo, hi = model.ten_springlength[:, 0], model.ten_springlength[:, 1]
    displacement = jnp.where(L > hi, hi - L, jnp.where(L < lo, lo - L, 0.0))
    frc = model.ten_stiffness * displacement - model.ten_damping * V
    return model.ten_J.T @ frc


def tendon_limit_qacc(model: Model, qpos, qvel):
    """Penalty-path reference acceleration for fixed-tendon length
    limits (the tendon-row analog of limit_qacc; the implicit solver
    handles these exactly via solver.constraint_rows)."""
    L = tendon_lengths(model, qpos)
    V = model.ten_J @ qvel
    lo, hi = model.ten_range[:, 0], model.ten_range[:, 1]
    below = jnp.maximum(lo - L, 0.0)
    above = jnp.maximum(L - hi, 0.0)
    dist = below - above          # signed: positive pushes length up
    active = model.ten_limited * ((below > 0) | (above > 0)).astype(L.dtype)
    floor = (4.0 if model.integrator == EULER else 2.0) * model.timestep
    timeconst = jnp.maximum(model.ten_solref[:, 0], floor)
    dampratio = model.ten_solref[:, 1]
    k = 1.0 / jnp.maximum(timeconst * timeconst * dampratio * dampratio,
                          1e-12)
    b = 2.0 / jnp.maximum(timeconst, 1e-12)
    aref = (k * jnp.clip(dist, -LIMIT_WIDTH, LIMIT_WIDTH) - b * V) * active
    return model.ten_J.T @ aref


def limit_qacc(model: Model, qpos, qvel):
    """Soft joint-limit response as a reference ACCELERATION.

    MuJoCo resolves limits through its soft-constraint solver whose target
    is the reference acceleration aref = -b v - k dist (in acceleration
    units, from solref = (timeconst, dampratio)).  Adding aref to qacc is
    equivalent to the generalized force M @ aref — it couples through the
    mass matrix and is unconditionally stable at these timesteps
    (critically-damped unit-mass dynamics per violated dof), unlike a raw
    spring scaled by the dof inertia which over-stiffens coupled chains.
    Documented approximation: interior dynamics are exact, limit contact
    response is approximate.
    """
    # explicit-integration stability floor on the timeconst (see
    # collision.contact_qfrc for the rationale)
    from mjrl_tpu.physics.model import EULER
    floor = (4.0 if model.integrator == EULER else 2.0) * model.timestep
    timeconst = jnp.maximum(model.dof_solref[:, 0], floor)
    dampratio = model.dof_solref[:, 1]
    k = 1.0 / jnp.maximum(timeconst * timeconst * dampratio * dampratio, 1e-12)
    b = 2.0 / jnp.maximum(timeconst, 1e-12)
    lo, hi = model.dof_range[:, 0], model.dof_range[:, 1]
    q = qpos[jnp.asarray(np.array(model.dof_qpos_idx, np.int32))]
    # penetration beyond limits (positive when violated)
    below = jnp.maximum(lo - q, 0.0)
    above = jnp.maximum(q - hi, 0.0)
    dist = below - above  # signed: positive pushes up, negative pushes down
    active = ((below > 0) | (above > 0)).astype(q.dtype)
    # saturate the positional response (explicit integration of an
    # unbounded spring injects energy for large violations, e.g. models
    # whose rest pose starts outside a joint range like gym Ant ankles)
    dist = jnp.clip(dist, -LIMIT_WIDTH, LIMIT_WIDTH)
    aref = k * dist - b * qvel * active
    return model.dof_limited * active * aref


def ball_limit_terms(model: Model, qpos):
    """Rotation-angle limit terms for ball joints.

    MuJoCo's ball limit constrains the total rotation angle theta =
    2 atan2(|q_xyz|, |q_w|) to jnt_range[1]; the constraint Jacobian over
    the joint's 3 (local angular velocity) dofs is -axis, with axis the
    rotation axis flipped into the minimal-angle cover.

    Returns a list of (j, dofadr, axis (3,), pos, k, b) — one entry per
    ball joint (static count); ``pos`` = range[1] - theta is the feasible
    distance (negative when violated).  Activity masking via
    jnt_limited[j] is the caller's job (limitedness is a traced field).
    """
    out = []
    for j in range(model.njnt):
        if model.jnt_type[j] != BALL:
            continue
        qa = model.jnt_qposadr[j]
        q = qpos[qa:qa + 4]
        q = q / jnp.sqrt(jnp.sum(q * q) + 1e-18)
        vnorm = jnp.sqrt(jnp.sum(q[1:] * q[1:]) + 1e-18)
        theta = 2.0 * jnp.arctan2(vnorm, jnp.abs(q[0]))
        axis = q[1:] / vnorm * jnp.sign(q[0] + (q[0] == 0))
        pos = model.jnt_range[j, 1] - theta
        floor = (4.0 if model.integrator == EULER else 2.0) * model.timestep
        timeconst = jnp.maximum(model.limit_solref[j, 0], floor)
        dampratio = model.limit_solref[j, 1]
        k = 1.0 / jnp.maximum(
            timeconst * timeconst * dampratio * dampratio, 1e-12)
        b = 2.0 / jnp.maximum(timeconst, 1e-12)
        out.append((j, model.jnt_dofadr[j], axis, pos, k, b))
    return out


def ball_limit_qacc(model: Model, qpos, qvel):
    """Penalty-path reference acceleration for ball-joint limits
    (the 3-dof analog of limit_qacc's per-dof response)."""
    qacc = jnp.zeros((model.nv,), qvel.dtype)
    for j, da, axis, pos, k, b in ball_limit_terms(model, qpos):
        viol = jnp.minimum(pos, 0.0)                   # <= 0 when violated
        active = (pos < 0).astype(qvel.dtype) * model.jnt_limited[j]
        jrow = -axis                                    # J @ w = d(pos)/dt
        jv = jrow[0] * qvel[da] + jrow[1] * qvel[da + 1] \
            + jrow[2] * qvel[da + 2]
        aref = (-k * jnp.clip(viol, -LIMIT_WIDTH, 0.0) - b * jv) * active
        qacc = qacc.at[da:da + 3].add(jrow * aref)
    return qacc


def equality_terms(model: Model, data: Data, cdof, qpos):
    """Residuals + Jacobians for equality constraints (static count).

    Returns a list of (i, jrows (k, nv), res (k,), imppos, iw) — one
    entry per constraint: k = 1 row for a joint coupling, 3 for a
    connect, 6 for a weld.  ``imppos`` is the scalar impedance position
    (|res| / ||res||, MuJoCo's per-constraint impedance input) and
    ``iw`` the diagApprox inverse weight (scalar or (k,)).  Semantics
    verified against MuJoCo 3.10 (tests/test_equality.py): joint
    residual = (q1 - q1_0) - poly(q2 - q2_0) with quartic eq_data[:5];
    connect residual = world(anchor1 on body1) - world(anchor2 on
    body2); weld appends ts * vec(q2^-1 (x) q1 (x) relq)."""
    out = []
    dtype = qpos.dtype
    mask = ancestor_mask(model)                  # (nbody, nv) numpy
    for i in range(model.neq):
        kind = model.eq_kind[i]
        if kind == EQ_JOINT:
            j1, j2 = model.eq_obj1[i], model.eq_obj2[i]
            d1, qa1 = model.jnt_dofadr[j1], model.jnt_qposadr[j1]
            c = model.eq_data[i, :5]
            if j2 >= 0:
                d2, qa2 = model.jnt_dofadr[j2], model.jnt_qposadr[j2]
                dq = qpos[qa2] - model.qpos0[qa2]
                poly = c[0] + dq * (c[1] + dq * (c[2] + dq * (c[3]
                                                             + dq * c[4])))
                dpoly = c[1] + dq * (2 * c[2] + dq * (3 * c[3]
                                                      + dq * 4 * c[4]))
                res = (qpos[qa1] - model.qpos0[qa1]) - poly
                jrow = jnp.zeros((model.nv,), dtype).at[d1].set(1.0) \
                    .at[d2].add(-dpoly)
                iw = (model.dof_invweight0[d1] + model.dof_invweight0[d2])
            else:
                res = qpos[qa1] - model.qpos0[qa1] - c[0]
                jrow = jnp.zeros((model.nv,), dtype).at[d1].set(1.0)
                iw = model.dof_invweight0[d1]
            out.append((i, jrow[None], res[None], jnp.abs(res), iw))
        elif kind == EQ_CONNECT:
            b1, b2 = model.eq_obj1[i], model.eq_obj2[i]
            p1 = data.xpos[b1] + data.xmat[b1] @ model.eq_data[i, :3]
            p2 = data.xpos[b2] + data.xmat[b2] @ model.eq_data[i, 3:6]
            res = p1 - p2
            jrows = _point_diff_rows(model, cdof, mask, b1, b2, p1, p2,
                                     dtype)
            iw = (model.body_invweight0[b1, 0]
                  + model.body_invweight0[b2, 0])
            out.append((i, jrows, res,
                        jnp.sqrt(jnp.sum(res * res) + 1e-18), iw))
        elif kind == EQ_WELD:
            b1, b2 = model.eq_obj1[i], model.eq_obj2[i]
            a2 = model.eq_data[i, :3]
            a1 = model.eq_data[i, 3:6]
            relq = model.eq_data[i, 6:10]
            ts = model.eq_data[i, 10]
            p1 = data.xpos[b1] + data.xmat[b1] @ a1
            p2 = data.xpos[b2] + data.xmat[b2] @ a2
            res_pos = p1 - p2
            jpos = _point_diff_rows(model, cdof, mask, b1, b2, p1, p2,
                                    dtype)
            # orientation: res = ts * vec(q2^-1 (x) q1 (x) relq)
            # (composition verified against MuJoCo efc_pos); rows via
            # the exact derivative w.r.t. incremental WORLD rotations
            # phi, contracted with the cdof angular columns
            q1 = pm.mat_to_quat(data.xmat[b1])
            q2 = pm.mat_to_quat(data.xmat[b2])

            def rot_res(phi):
                dq1 = jnp.concatenate([jnp.ones((1,), dtype),
                                       0.5 * phi[:3]])
                dq2 = jnp.concatenate([jnp.ones((1,), dtype),
                                       0.5 * phi[3:]])
                q1p = pm.quat_mul(dq1, q1)
                q2p = pm.quat_mul(dq2, q2)
                return ts * pm.quat_mul(
                    pm.quat_mul(pm.quat_inv(q2p), q1p), relq)[1:]

            res_rot = rot_res(jnp.zeros((6,), dtype))
            A = jax.jacfwd(rot_res)(jnp.zeros((6,), dtype))   # (3, 6)
            ang = cdof[:, :3]
            m1 = jnp.asarray(mask[b1], dtype)
            m2 = jnp.asarray(mask[b2], dtype)
            jrot = (A[:, :3] @ (ang * m1[:, None]).T
                    + A[:, 3:] @ (ang * m2[:, None]).T)       # (3, nv)
            res = jnp.concatenate([res_pos, res_rot])
            jrows = jnp.concatenate([jpos, jrot])
            iw_t = (model.body_invweight0[b1, 0]
                    + model.body_invweight0[b2, 0])
            iw_r = (model.body_invweight0[b1, 1]
                    + model.body_invweight0[b2, 1])
            iw = jnp.stack([iw_t, iw_t, iw_t, iw_r, iw_r, iw_r])
            out.append((i, jrows, res,
                        jnp.sqrt(jnp.sum(res * res) + 1e-18), iw))
        else:
            raise NotImplementedError(f"equality kind {kind}")
    return out


def _point_diff_rows(model, cdof, mask, b1, b2, p1, p2, dtype):
    """(3, nv) Jacobian of the world-frame difference of point p1 on
    body b1 and point p2 on body b2 (shared by connect and weld)."""
    ang, lin = cdof[:, :3], cdof[:, 3:]
    m1 = jnp.asarray(mask[b1], dtype)
    m2 = jnp.asarray(mask[b2], dtype)
    v1 = lin + jnp.cross(ang, jnp.broadcast_to(p1, ang.shape))
    v2 = lin + jnp.cross(ang, jnp.broadcast_to(p2, ang.shape))
    return (m1[:, None] * v1 - m2[:, None] * v2).T


def equality_qacc(model: Model, data: Data, cdof, qpos, qvel):
    """Penalty-path reference acceleration for equality constraints
    (critically-damped bilateral response from eq_solref; the implicit
    solver handles these exactly via solver.constraint_rows)."""
    qacc = jnp.zeros((model.nv,), qvel.dtype)
    floor = (4.0 if model.integrator == EULER else 2.0) * model.timestep
    for i, jrows, res, _, _ in equality_terms(model, data, cdof, qpos):
        timeconst = jnp.maximum(model.eq_solref[i, 0], floor)
        dampratio = model.eq_solref[i, 1]
        k = 1.0 / jnp.maximum(
            timeconst * timeconst * dampratio * dampratio, 1e-12)
        b = 2.0 / jnp.maximum(timeconst, 1e-12)
        jv = jrows @ qvel
        # saturation 10x wider than the limit response: bilateral rows
        # restore from both sides (no fly-away mode), and the tighter
        # clip lets steady loads hold a visible residual open
        width = 10.0 * LIMIT_WIDTH
        aref = (-k * jnp.clip(res, -width, width) - b * jv) \
            * model.eq_active[i]
        qacc = qacc + jrows.T @ aref
    return qacc


def fluid_force(model: Model, data: Data, cvel):
    """MuJoCo 'equivalent inertia box' fluid model (viscosity + density),
    computed per body in the inertial (principal) frame and mapped back to
    world-origin spatial forces.  Constants validated against golden MuJoCo
    qfrc_passive data (tests/test_physics_golden.py)."""
    dtype = cvel.dtype
    # equivalent box SEMI-axes from principal inertia:
    # full size L_i = sqrt(6 (I_j + I_k - I_i) / m); semi = L/2
    i0 = model.body_inertia[:, 0]
    i1 = model.body_inertia[:, 1]
    i2 = model.body_inertia[:, 2]
    m = jnp.maximum(model.body_mass, 1e-12)
    lx = jnp.sqrt(jnp.maximum(6.0 * (i1 + i2 - i0) / m, 1e-12)) * 0.5
    ly = jnp.sqrt(jnp.maximum(6.0 * (i0 + i2 - i1) / m, 1e-12)) * 0.5
    lz = jnp.sqrt(jnp.maximum(6.0 * (i0 + i1 - i2) / m, 1e-12)) * 0.5
    box = jnp.stack([lx, ly, lz], axis=-1)  # (nbody, 3) semi-axes

    # body 6D velocity at CoM in the inertial frame
    w_world = cvel[..., :3]
    v_world = pm.point_velocity(cvel, data.xipos)
    w_l = pm.mat_t_vec(data.ximat, w_world)
    v_l = pm.mat_t_vec(data.ximat, v_world)

    # viscous drag (equivalent sphere, diameter = mean FULL box size)
    diam = jnp.sum(box, axis=-1) * 2.0 / 3.0
    t_visc = -jnp.pi * diam[:, None] ** 3 * model.viscosity * w_l
    f_visc = -3.0 * jnp.pi * diam[:, None] * model.viscosity * v_l

    # quadratic (density) drag over box faces
    b0, b1, b2 = box[:, 0], box[:, 1], box[:, 2]
    area = jnp.stack([b1 * b2, b0 * b2, b0 * b1], axis=-1) * 4.0
    f_dens = -0.5 * model.density * area * jnp.abs(v_l) * v_l
    # torque_i = -(1/2) rho b_i (b_j^4 + b_k^4) |w_i| w_i
    # (calibrated against MuJoCo with single-box probes; see
    # tests/test_physics_golden.py::test_passive_forces)
    tcoef = jnp.stack([b0 * (b1 ** 4 + b2 ** 4),
                       b1 * (b0 ** 4 + b2 ** 4),
                       b2 * (b0 ** 4 + b1 ** 4)], axis=-1)
    t_dens = -0.5 * model.density * tcoef * jnp.abs(w_l) * w_l

    # mass-0 bodies (world) get no fluid force
    has_mass = (model.body_mass > 1e-12).astype(dtype)[:, None]
    t_l = (t_visc + t_dens) * has_mass
    f_l = (f_visc + f_dens) * has_mass

    # back to world, as spatial force at origin: n0 = tau + c x f
    t_w = pm.mat_vec(data.ximat, t_l)
    f_w = pm.mat_vec(data.ximat, f_l)
    n0 = t_w + pm.cross(data.xipos, f_w)
    return jnp.concatenate([n0, f_w], axis=-1)  # (nbody, 6)


# ---------------------------------------------------------------------------
# Actuation
# ---------------------------------------------------------------------------

def actuator_force(model: Model, ctrl, qpos=None, qvel=None):
    """qfrc_actuator (nv,) under the affine actuator model
    f_act = gain * ctrl + b0 + b1*length + b2*velocity applied through
    the joint transmission (mujoco_env.py do_simulation sets ctrl;
    clipping per actuator ctrlrange).

    Plain motors on scalar joints (every reference env) take the
    one-scatter fast path; position/velocity servos and ball/free
    vector-gear transmissions go through a static per-actuator loop
    (nu <= ~20)."""
    if model.nu == 0:
        return jnp.zeros((model.nv,), ctrl.dtype)
    c = jnp.where(model.ctrllimited > 0,
                  jnp.clip(ctrl, model.ctrlrange[:, 0], model.ctrlrange[:, 1]),
                  ctrl)
    qfrc = jnp.zeros((model.nv,), ctrl.dtype)
    if model.actuator_simple:
        force = model.gear * c
        dof_idx = [model.jnt_dofadr[j] for j in model.actuator_joint]
        return qfrc.at[jnp.asarray(dof_idx)].add(force)

    for i, j in enumerate(model.actuator_joint):
        gain = model.actuator_gain[i]
        b0, b1, b2 = (model.actuator_bias[i, 0], model.actuator_bias[i, 1],
                      model.actuator_bias[i, 2])
        tid = model.actuator_tendon[i] if model.actuator_tendon else -1
        if tid >= 0:
            # tendon transmission: moment = gear * ten_J row, actuator
            # length = gear * tendon length (mj_transmission mjTRN_TENDON)
            g = model.gear[i]
            trow = model.ten_J[tid]
            length = g * tendon_lengths(model, qpos)[tid] \
                if qpos is not None else 0.0
            vel = g * jnp.dot(trow, qvel) if qvel is not None else 0.0
            f = gain * c[i] + b0 + b1 * length + b2 * vel
            qfrc = qfrc + g * trow * f
            continue
        da = model.jnt_dofadr[j]
        qa = model.jnt_qposadr[j]
        jt = model.jnt_type[j]
        if jt == BALL:
            gv = model.actuator_gearv[i, :3]
            rv = pm.quat_to_rotvec(qpos[qa:qa + 4]) if qpos is not None \
                else jnp.zeros(3, ctrl.dtype)
            length = jnp.dot(gv, rv)
            vel = jnp.dot(gv, qvel[da:da + 3]) if qvel is not None else 0.0
            f = gain * c[i] + b0 + b1 * length + b2 * vel
            qfrc = qfrc.at[da:da + 3].add(gv * f)
        elif jt == FREE:
            gv = model.actuator_gearv[i]
            vel = jnp.dot(gv, qvel[da:da + 6]) if qvel is not None else 0.0
            f = gain * c[i] + b0 + b2 * vel     # free: no length
            qfrc = qfrc.at[da:da + 6].add(gv * f)
        else:
            g = model.gear[i]
            length = g * qpos[qa] if qpos is not None else 0.0
            vel = g * qvel[da] if qvel is not None else 0.0
            f = gain * c[i] + b0 + b1 * length + b2 * vel
            qfrc = qfrc.at[da].add(g * f)
    return qfrc
