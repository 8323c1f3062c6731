"""Penalty-based contacts for the static collision pairs of a model.

MuJoCo resolves contacts with a soft-constraint solver (PGS/Newton); here
contacts are spring-damper penalties in acceleration units with solref-
derived gains plus a smooth Coulomb-friction approximation.  Interior
(contact-free) dynamics are exact; contact response is approximate — the
documented round-1 deviation (SURVEY.md §7 "contacts last").

Supported primitive pairs (covers the reference envs + planar locomotion):
- sphere-plane, capsule-plane (reacher table, hopper floor)
- sphere-box
- capsule-box / cylinder-box via sphere sampling along the axis (peg task)
- capsule-capsule (swimmer self-contact)

Each contact produces (penetration depth, world point, world normal).  The
force is mapped to qfrc through point Jacobians built from the same cdof
axes as the dynamics, applied with opposite signs to both bodies.
"""

import numpy as np
import jax.numpy as jnp

from mjrl_tpu.physics import math as pm
from mjrl_tpu.physics.dynamics import ancestor_mask
from mjrl_tpu.physics.model import BOX, CAPSULE, CYLINDER, PLANE, SPHERE, Model

# samples along capsule/cylinder axes for box contacts
_AXIS_SAMPLES = 5


def _plane_frame(xmat):
    """Plane normal is the local +z axis."""
    return xmat[:, 2]


def _sphere_plane(c, r, p0, n):
    """-> (depth, point, normal). depth > 0 means penetration."""
    d = jnp.dot(c - p0, n)
    depth = r - d
    point = c - n * d
    return depth, point, n


def _segment_ends(xpos, xmat, half):
    axis = xmat[:, 2]
    return xpos - axis * half, xpos + axis * half, axis


def _capsule_plane(xpos, xmat, r, half, p0, n):
    a, b, _ = _segment_ends(xpos, xmat, half)
    da, db = jnp.dot(a - p0, n), jnp.dot(b - p0, n)
    # deepest endpoint
    c = jnp.where(da < db, a, b)
    return _sphere_plane(c, r, p0, n)


def _sphere_box(c, r, bpos, bmat, bsize):
    # closest point on box to sphere center, in box frame
    cl = bmat.T @ (c - bpos)
    clamped = jnp.clip(cl, -bsize, bsize)
    delta = cl - clamped
    dist = jnp.linalg.norm(delta) + 1e-12
    inside = jnp.all(jnp.abs(cl) <= bsize)
    # outside: normal from surface point to center; inside: push along
    # the axis of least penetration
    pen_axis = jnp.argmin(bsize - jnp.abs(cl))
    sign = jnp.sign(cl[pen_axis])
    n_inside = jnp.zeros(3, c.dtype).at[pen_axis].set(sign)
    n_local = jnp.where(inside, n_inside, delta / dist)
    depth = jnp.where(inside,
                      r + jnp.min(bsize - jnp.abs(cl)),
                      r - dist)
    point_local = jnp.where(inside, cl, clamped)
    n = bmat @ n_local
    point = bmat @ point_local + bpos
    return depth, point, n


def _closest_segment_segment(p1, q1, p2, q2):
    """Closest points between segments [p1,q1], [p2,q2]."""
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
                  jnp.clip((b * f - c * e) / jnp.where(
                      jnp.abs(denom) > 1e-12, denom, 1.0), 0.0, 1.0),
                  0.0)
    t = (b * s + f) / e
    t_cl = jnp.clip(t, 0.0, 1.0)
    s = jnp.clip((b * t_cl - c) / a, 0.0, 1.0)
    return p1 + d1 * s, p2 + d2 * t_cl


def _capsule_capsule(x1, m1, r1, h1, x2, m2, r2, h2):
    a1, b1, _ = _segment_ends(x1, m1, h1)
    a2, b2, _ = _segment_ends(x2, m2, h2)
    c1, c2 = _closest_segment_segment(a1, b1, a2, b2)
    d = c2 - c1
    dist = jnp.linalg.norm(d) + 1e-12
    n = d / dist
    depth = (r1 + r2) - dist
    point = 0.5 * (c1 + c2)
    return depth, point, n


def find_contacts(model: Model, data):
    """Evaluate every static collision pair.

    Returns (depths (ncon,), points (ncon, 3), normals (ncon, 3),
    body1 (ncon,), body2 (ncon,), friction (ncon,)) with fixed ncon
    (static), depth <= 0 meaning no contact.  Normals point from geom1
    into geom2.
    """
    depths, points, normals, b1s, b2s, fric = [], [], [], [], [], []

    def emit(d, p, n, g1, g2):
        depths.append(d)
        points.append(p)
        normals.append(n)
        b1s.append(model.geom_body[g1])
        b2s.append(model.geom_body[g2])
        fric.append(jnp.maximum(model.geom_friction[g1, 0],
                                model.geom_friction[g2, 0]))

    for (g1, g2) in model.contact_pairs:
        t1, t2 = model.geom_type[g1], model.geom_type[g2]
        # order: put plane/box first for dispatch
        if (t2 == PLANE) or (t2 == BOX and t1 != PLANE):
            g1, g2 = g2, g1
            t1, t2 = t2, t1
        x1, m1 = data.geom_xpos[g1], data.geom_xmat[g1]
        x2, m2 = data.geom_xpos[g2], data.geom_xmat[g2]
        s1, s2 = model.geom_size[g1], model.geom_size[g2]
        margin = jnp.maximum(model.geom_margin[g1], model.geom_margin[g2])

        if t1 == PLANE and t2 == SPHERE:
            d, p, n = _sphere_plane(x2, s2[0], x1, _plane_frame(m1))
            emit(d + margin, p, n, g1, g2)
        elif t1 == PLANE and t2 in (CAPSULE, CYLINDER):
            d, p, n = _capsule_plane(x2, m2, s2[0], s2[1], x1,
                                     _plane_frame(m1))
            emit(d + margin, p, n, g1, g2)
        elif t1 == BOX and t2 == SPHERE:
            d, p, n = _sphere_box(x2, s2[0], x1, m1, s1)
            emit(d + margin, p, n, g1, g2)
        elif t1 == BOX and t2 in (CAPSULE, CYLINDER):
            # sample spheres along the axis (cylinder rims approximated)
            a, b, _ = _segment_ends(x2, m2, s2[1])
            for k in range(_AXIS_SAMPLES):
                t = k / (_AXIS_SAMPLES - 1)
                c = a * (1 - t) + b * t
                d, p, n = _sphere_box(c, s2[0], x1, m1, s1)
                emit(d + margin, p, n, g1, g2)
        elif t1 == CAPSULE and t2 == CAPSULE:
            d, p, n = _capsule_capsule(x1, m1, s1[0], s1[1],
                                       x2, m2, s2[0], s2[1])
            emit(d + margin, p, n, g1, g2)
        else:
            # unsupported pair: skip statically (documented limitation)
            continue

    if not depths:
        z = jnp.zeros((0,), data.xpos.dtype)
        return (z, jnp.zeros((0, 3), data.xpos.dtype),
                jnp.zeros((0, 3), data.xpos.dtype), [], [], z)
    return (jnp.stack(depths), jnp.stack(points), jnp.stack(normals),
            b1s, b2s, jnp.stack(fric))


def contact_qfrc(model: Model, data, cdof, cvel, qvel, m_diag_mean):
    """Generalized contact forces (nv,) from penalty contacts."""
    depths, points, normals, b1s, b2s, fric = find_contacts(model, data)
    ncon = len(b1s)
    if ncon == 0:
        return jnp.zeros((model.nv,), qvel.dtype)

    mask = jnp.asarray(ancestor_mask(model), qvel.dtype)
    qfrc = jnp.zeros((model.nv,), qvel.dtype)

    # solref-style gains in acceleration units, scaled by a mean effective
    # inertia so the penalty stays stable across models.
    timeconst = 0.02
    k = 1.0 / (timeconst * timeconst)
    b = 2.0 / timeconst

    for i in range(ncon):
        depth, p, n = depths[i], points[i], normals[i]
        active = (depth > 0).astype(qvel.dtype)
        bod1, bod2 = b1s[i], b2s[i]
        # relative velocity of body2 w.r.t. body1 at the contact point
        v1 = pm.point_velocity(cvel[bod1], p)
        v2 = pm.point_velocity(cvel[bod2], p)
        vrel = v2 - v1
        vn = jnp.dot(vrel, n)
        vt = vrel - vn * n
        # normal force magnitude (pushes body2 along +n... normal points
        # from geom1 into geom2 -> force on body2 is along n? normal here
        # points from 1 to 2 surface; separating force on body2 is +n)
        fn = m_diag_mean * (k * depth - b * vn)
        fn = jnp.maximum(fn, 0.0) * active
        # smooth Coulomb friction
        mu = fric[i]
        vt_norm = jnp.linalg.norm(vt) + 1e-9
        ft = -jnp.minimum(mu * fn, m_diag_mean * b * vt_norm) * vt / vt_norm
        f_world = fn * n + ft
        # spatial force at origin on body2; reaction on body1
        sf2 = jnp.concatenate([jnp.cross(p, f_world), f_world])
        for bod, sgn in ((bod2, 1.0), (bod1, -1.0)):
            if bod == 0:
                continue  # world absorbs the reaction
            qfrc = qfrc + sgn * jnp.einsum(
                "d,dk,k->d", mask[bod], cdof, sf2)
    return qfrc
