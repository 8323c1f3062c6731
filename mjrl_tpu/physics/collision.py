"""Penalty-based contacts for the static collision pairs of a model.

MuJoCo resolves contacts with a soft-constraint solver (PGS/Newton); here
contacts are spring-damper penalties in acceleration units with solref-
derived gains plus a smooth Coulomb-friction approximation.  Interior
(contact-free) dynamics are exact; contact response is approximate — the
documented round-1 deviation (SURVEY.md §7 "contacts last").

TPU-first structure: pairs are grouped *statically* by primitive type at
trace time, each group is evaluated with one vmapped primitive call, and
all contact forces fold into qfrc with a single einsum over the static
ancestor mask — no per-contact Python unrolling, so models with hundreds
of candidate pairs (peg-insertion: arm geoms x hole boxes) compile fast
and vectorize over env batches.

Supported primitive pairs (covers the reference envs + planar locomotion):
- sphere-plane / capsule-plane (reacher table, hopper floor)
- sphere-box; capsule-box / cylinder-box via spheres sampled along the axis
- capsule-capsule (swimmer self-contact)
"""

import numpy as np
import jax
import jax.numpy as jnp

from mjrl_tpu.physics import math as pm
from mjrl_tpu.physics.dynamics import ancestor_mask
from mjrl_tpu.physics.model import (BOX, CAPSULE, CYLINDER, EULER, PLANE,
                                    SPHERE, Model)

# samples along capsule/cylinder axes for box contacts
_AXIS_SAMPLES = 5

# penetration width where the penalty normal response saturates (m)
CONTACT_WIDTH = 0.02


# ---------------------------------------------------------------------------
# primitives: each returns (depth, point, normal); depth > 0 = penetrating,
# normal points from geom1 into geom2.
# ---------------------------------------------------------------------------

def _sphere_plane(c, r, p0, n):
    d = jnp.dot(c - p0, n)
    depth = r - d
    # MuJoCo convention: contact point midway between the two surfaces
    point = c - n * (0.5 * (d + r))
    return depth, point, n


def _segment_ends(xpos, xmat, half):
    axis = xmat[:, 2]
    return xpos - axis * half, xpos + axis * half


def _capsule_plane(xpos, xmat, r, half, p0, n, end):
    """End-sphere contact of a capsule with a plane.  MuJoCo's
    plane-capsule collider emits up to TWO contact points (one per end
    cap) — both are needed for foot/torso torque balance on locomotion
    models, so each pair contributes two static rows (end = 0 or 1)."""
    a, b = _segment_ends(xpos, xmat, half)
    c = jnp.where(end > 0.5, b, a)
    return _sphere_plane(c, r, p0, n)


def _sphere_box(c, r, bpos, bmat, bsize):
    cl = pm.mat_t_vec(bmat, c - bpos)
    clamped = jnp.clip(cl, -bsize, bsize)
    delta = cl - clamped
    dist = jnp.linalg.norm(delta) + 1e-12
    inside = jnp.all(jnp.abs(cl) <= bsize)
    pen_axis = jnp.argmin(bsize - jnp.abs(cl))
    sign = jnp.sign(cl[pen_axis]) + (cl[pen_axis] == 0)
    n_inside = jnp.zeros(3, c.dtype).at[pen_axis].set(sign)
    n_local = jnp.where(inside, n_inside, delta / dist)
    depth = jnp.where(inside, r + jnp.min(bsize - jnp.abs(cl)), r - dist)
    # contact point midway between the box surface and the sphere surface
    point_local = jnp.where(inside, cl, clamped) - 0.5 * depth * n_local
    # normal points from box into sphere; we emit (box=geom1, sphere=geom2)
    return depth, bmat @ point_local + bpos, bmat @ n_local


def _closest_segment_segment(p1, q1, p2, q2):
    d1 = q1 - p1
    d2 = q2 - p2
    r = p1 - p2
    a = jnp.dot(d1, d1) + 1e-12
    e = jnp.dot(d2, d2) + 1e-12
    f = jnp.dot(d2, r)
    c = jnp.dot(d1, r)
    b = jnp.dot(d1, d2)
    denom = a * e - b * b
    s = jnp.where(jnp.abs(denom) > 1e-12,
                  jnp.clip((b * f - c * e)
                           / jnp.where(jnp.abs(denom) > 1e-12, denom, 1.0),
                           0.0, 1.0),
                  0.0)
    t = jnp.clip((b * s + f) / e, 0.0, 1.0)
    s = jnp.clip((b * t - c) / a, 0.0, 1.0)
    return p1 + d1 * s, p2 + d2 * t


def _capsule_capsule(x1, m1, r1, h1, x2, m2, r2, h2):
    a1, b1 = _segment_ends(x1, m1, h1)
    a2, b2 = _segment_ends(x2, m2, h2)
    c1, c2 = _closest_segment_segment(a1, b1, a2, b2)
    d = c2 - c1
    dist = jnp.linalg.norm(d) + 1e-12
    n = d / dist
    # midpoint of the two surface points (exact when r1 != r2)
    point = 0.5 * ((c1 + n * r1) + (c2 - n * r2))
    return (r1 + r2) - dist, point, n


# ---------------------------------------------------------------------------
# static pair grouping
# ---------------------------------------------------------------------------

def _grouped_pairs(model: Model):
    """Split contact_pairs into per-primitive groups (host-side, static).
    Returns dict of lists of (g1, g2[, t]) with g1 the plane/box."""
    groups = {"plane_sphere": [], "plane_capsule": [], "box_sphere": [],
              "box_axis": [], "capsule_capsule": []}
    for (a, b) in model.contact_pairs:
        ta, tb = model.geom_type[a], model.geom_type[b]
        if (tb == PLANE) or (tb == BOX and ta != PLANE):
            a, b = b, a
            ta, tb = tb, ta
        if ta == PLANE and tb == SPHERE:
            groups["plane_sphere"].append((a, b))
        elif ta == PLANE and tb in (CAPSULE, CYLINDER):
            for k in (0, 1):    # one contact per end cap (MuJoCo manifold)
                groups["plane_capsule"].append((a, b, k))
        elif ta == BOX and tb == SPHERE:
            groups["box_sphere"].append((a, b))
        elif ta == BOX and tb in (CAPSULE, CYLINDER):
            for k in range(_AXIS_SAMPLES):
                groups["box_axis"].append((a, b, k))
        elif ta == CAPSULE and tb == CAPSULE:
            groups["capsule_capsule"].append((a, b))
        # unsupported pairs (e.g. static box-box) are skipped
    return groups


def contact_geom_ids(model: Model):
    """Static (g1, g2) numpy index arrays in the exact emission order of
    ``find_contacts`` — lets callers partition contact rows at trace time
    (e.g. by condim)."""
    groups = _grouped_pairs(model)
    order = []
    for key in ("plane_sphere", "plane_capsule", "box_sphere", "box_axis",
                "capsule_capsule"):
        order += [(p[0], p[1]) for p in groups[key]]
    if not order:
        return (np.zeros(0, np.int32), np.zeros(0, np.int32))
    return (np.array([p[0] for p in order], np.int32),
            np.array([p[1] for p in order], np.int32))


def find_contacts(model: Model, data):
    """Evaluate all supported pairs vectorized.

    Returns (depths (C,), points (C,3), normals (C,3), g1 (C,) idx array,
    g2 (C,) idx array) with C static.  depth <= 0 means inactive.
    """
    groups = _grouped_pairs(model)
    gx, gm = data.geom_xpos, data.geom_xmat
    size = model.geom_size
    out = []

    def idx(lst, k):
        return jnp.asarray(np.array([p[k] for p in lst], np.int32))

    if groups["plane_sphere"]:
        i1, i2 = idx(groups["plane_sphere"], 0), idx(groups["plane_sphere"], 1)
        d, p, n = jax.vmap(_sphere_plane)(
            gx[i2], size[i2, 0], gx[i1], gm[i1][..., :, 2])
        out.append((d, p, n, i1, i2))
    if groups["plane_capsule"]:
        i1, i2 = idx(groups["plane_capsule"], 0), idx(groups["plane_capsule"], 1)
        ends = jnp.asarray(np.array([p[2] for p in groups["plane_capsule"]],
                                    np.float32))
        d, p, n = jax.vmap(_capsule_plane)(
            gx[i2], gm[i2], size[i2, 0], size[i2, 1], gx[i1],
            gm[i1][..., :, 2], ends)
        out.append((d, p, n, i1, i2))
    if groups["box_sphere"]:
        i1, i2 = idx(groups["box_sphere"], 0), idx(groups["box_sphere"], 1)
        d, p, n = jax.vmap(_sphere_box)(
            gx[i2], size[i2, 0], gx[i1], gm[i1], size[i1])
        out.append((d, p, n, i1, i2))
    if groups["box_axis"]:
        i1, i2 = idx(groups["box_axis"], 0), idx(groups["box_axis"], 1)
        ks = jnp.asarray(np.array([p[2] for p in groups["box_axis"]],
                                  np.float32))
        t = (ks / (_AXIS_SAMPLES - 1))[:, None]
        a = gx[i2] - gm[i2][..., :, 2] * size[i2, 1:2]
        b = gx[i2] + gm[i2][..., :, 2] * size[i2, 1:2]
        centers = a * (1 - t) + b * t
        d, p, n = jax.vmap(_sphere_box)(
            centers, size[i2, 0], gx[i1], gm[i1], size[i1])
        out.append((d, p, n, i1, i2))
    if groups["capsule_capsule"]:
        i1, i2 = idx(groups["capsule_capsule"], 0), \
            idx(groups["capsule_capsule"], 1)
        d, p, n = jax.vmap(_capsule_capsule)(
            gx[i1], gm[i1], size[i1, 0], size[i1, 1],
            gx[i2], gm[i2], size[i2, 0], size[i2, 1])
        out.append((d, p, n, i1, i2))

    if not out:
        z = jnp.zeros((0,), data.xpos.dtype)
        z3 = jnp.zeros((0, 3), data.xpos.dtype)
        zi = jnp.zeros((0,), jnp.int32)
        return z, z3, z3, zi, zi

    depths = jnp.concatenate([o[0] for o in out])
    points = jnp.concatenate([o[1] for o in out])
    normals = jnp.concatenate([o[2] for o in out])
    g1 = jnp.concatenate([o[3] for o in out])
    g2 = jnp.concatenate([o[4] for o in out])
    # MuJoCo combines pair margins by SUM (includemargin = margin1 +
    # margin2, verified empirically); activation is dist < includemargin
    margin = model.geom_margin[g1] + model.geom_margin[g2]
    return depths + margin, points, normals, g1, g2


def contact_qfrc(model: Model, data, cdof, cvel, qvel, m_diag):
    """Generalized contact forces (nv,) from penalty contacts — fully
    vectorized over contacts.

    The normal force uses unit-impedance acceleration semantics,
    f_n = m_eff * (k * depth - b * v_n), with the per-contact effective
    mass from the diagonal approximation m_eff = 1 / sum_d J_nd^2 / M_dd.
    A mean-inertia scale (the previous approach) over-stiffens contacts
    whose normal direction has little inertia and destabilizes explicit
    integration (observed: the gym Ant launching itself off the floor).
    """
    depths, points, normals, g1, g2 = find_contacts(model, data)
    if depths.shape[0] == 0:
        return jnp.zeros((model.nv,), qvel.dtype)

    gb = jnp.asarray(np.array(model.geom_body, np.int32))
    b1, b2 = gb[g1], gb[g2]
    mask = jnp.asarray(ancestor_mask(model), qvel.dtype)  # (nbody, nv)
    coeff = mask[b2] - mask[b1]  # (C, nv); world rows are zero masks

    # relative velocity of body2 w.r.t. body1 at each contact point
    v1 = jax.vmap(pm.point_velocity)(cvel[b1], points)
    v2 = jax.vmap(pm.point_velocity)(cvel[b2], points)
    vrel = v2 - v1
    vn = jnp.sum(vrel * normals, axis=-1)
    vt = vrel - vn[:, None] * normals

    # per-contact effective mass along the normal (unrolled over the 6
    # spatial components — dot_general breaks XLA elementwise fusion)
    u = jnp.concatenate([pm.cross(points, normals), normals], axis=-1)
    jn = coeff * sum(cdof[None, :, k] * u[:, None, k]
                     for k in range(6))                  # (C, nv)
    m_eff = 1.0 / (jnp.sum(jn * jn / m_diag[None, :], axis=1) + 1e-8)

    # solref-style gains in acceleration units; positional response
    # saturates at CONTACT_WIDTH penetration (bounds the energy an
    # explicit penalty can inject on deep impacts).  Explicit integration
    # needs the damping eigenvalue b*h = 2h/timeconst well inside the
    # stability region: floor the timeconst at 4 timesteps under Euler
    # (MuJoCo's implicit solver only needs >= 2 timesteps).
    floor = 4.0 if model.integrator == EULER else 2.0
    timeconst = jnp.maximum(0.02, floor * model.timestep)
    k = 1.0 / (timeconst * timeconst)
    b = 2.0 / timeconst
    active = (depths > 0).astype(qvel.dtype)
    depths_c = jnp.clip(depths, 0.0, CONTACT_WIDTH)
    fn = jnp.maximum(m_eff * (k * depths_c - b * vn), 0.0) * active

    mu = jnp.maximum(model.geom_friction[g1, 0], model.geom_friction[g2, 0])
    vt_norm = jnp.linalg.norm(vt, axis=-1) + 1e-9
    ft_mag = jnp.minimum(mu * fn, m_eff * b * vt_norm)
    f_world = fn[:, None] * normals - ft_mag[:, None] * vt / vt_norm[:, None]

    # spatial force at world origin applied to body2 (+) and body1 (-)
    sf = jnp.concatenate([pm.cross(points, f_world), f_world], axis=-1)
    t = sum(cdof[None, :, k] * sf[:, None, k] for k in range(6))  # (C, nv)
    return jnp.sum(coeff * t, axis=0)
