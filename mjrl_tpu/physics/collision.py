"""Contact narrowphase + penalty contact forces, in structure-of-arrays
layout.

MuJoCo resolves contacts with a soft-constraint solver (PGS/Newton); the
penalty path here is spring-damper penalties in acceleration units with
solref-derived gains plus a smooth Coulomb-friction approximation, and
the implicit path (physics/solver.py) consumes the same narrowphase.

TPU-first structure: pairs are grouped *statically* by primitive type at
trace time and each group is evaluated with vectorized component
arithmetic.  All per-contact quantities are kept as SEPARATE (C,) arrays
per x/y/z component (structure of arrays) — never (C, 3) — because on
TPU the minor axis is padded to the 128-lane register width, so a
(batch, 474, 3) tensor physically occupies (batch, 474, 128): measured
25x slowdown of the whole narrowphase on peg insertion.  The same rule
keeps (C, nv) matrices out of this module (see contact_qfrc's static
nv-loop).

Supported primitive pairs (covers the reference envs + planar locomotion):
- sphere-plane / capsule-plane (reacher table, hopper floor)
- sphere-box; capsule-box / cylinder-box via spheres sampled along the axis
- capsule-capsule (swimmer self-contact)
"""

import numpy as np
import jax.numpy as jnp

from mjrl_tpu.physics.dynamics import ancestor_mask
from mjrl_tpu.physics.model import (BOX, CAPSULE, CYLINDER, EULER, PLANE,
                                    SPHERE, Model)

# samples along capsule/cylinder axes for box contacts
_AXIS_SAMPLES = 5

# penetration width where the penalty normal response saturates (m)
CONTACT_WIDTH = 0.02


# ---------------------------------------------------------------------------
# SoA vec3 helpers: a "vec" is a tuple (x, y, z) of same-shaped arrays.
# ---------------------------------------------------------------------------

def _dot(a, b):
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def _cross(a, b):
    return (a[1] * b[2] - a[2] * b[1],
            a[2] * b[0] - a[0] * b[2],
            a[0] * b[1] - a[1] * b[0])


def _add(a, b):
    return (a[0] + b[0], a[1] + b[1], a[2] + b[2])


def _sub(a, b):
    return (a[0] - b[0], a[1] - b[1], a[2] - b[2])


def _scale(a, s):
    return (a[0] * s, a[1] * s, a[2] * s)


def _where(c, a, b):
    return tuple(jnp.where(c, x, y) for x, y in zip(a, b))


def _norm(a):
    return jnp.sqrt(_dot(a, a) + 1e-24)


def _pos(gx, i):
    """World positions of geoms i as components."""
    return (gx[i, 0], gx[i, 1], gx[i, 2])


def _col(gm, i, k):
    """Column k (a world-frame axis) of the rotation matrices of geoms i."""
    return (gm[i, 0, k], gm[i, 1, k], gm[i, 2, k])


def _to_local(gm, i, v):
    """R^T v for the rotations of geoms i."""
    return (gm[i, 0, 0] * v[0] + gm[i, 1, 0] * v[1] + gm[i, 2, 0] * v[2],
            gm[i, 0, 1] * v[0] + gm[i, 1, 1] * v[1] + gm[i, 2, 1] * v[2],
            gm[i, 0, 2] * v[0] + gm[i, 1, 2] * v[1] + gm[i, 2, 2] * v[2])


def _to_world(gm, i, v):
    """R v for the rotations of geoms i."""
    return (gm[i, 0, 0] * v[0] + gm[i, 0, 1] * v[1] + gm[i, 0, 2] * v[2],
            gm[i, 1, 0] * v[0] + gm[i, 1, 1] * v[1] + gm[i, 1, 2] * v[2],
            gm[i, 2, 0] * v[0] + gm[i, 2, 1] * v[1] + gm[i, 2, 2] * v[2])


# ---------------------------------------------------------------------------
# primitives: each returns (depth, point, normal) with point/normal as
# component tuples; depth > 0 = penetrating, normal points from geom1
# into geom2.
# ---------------------------------------------------------------------------

def _sphere_plane(c, r, p0, n):
    d = _dot(_sub(c, p0), n)
    depth = r - d
    # MuJoCo convention: contact point midway between the two surfaces
    point = _sub(c, _scale(n, 0.5 * (d + r)))
    return depth, point, n


def _sphere_box(c, r, gm, i1, bpos, bs):
    """Sphere (center c components, radius r) vs oriented boxes i1 with
    half-sizes bs = (bx, by, bz) components."""
    cl = _to_local(gm, i1, _sub(c, bpos))
    bx, by, bz = bs
    q = (jnp.clip(cl[0], -bx, bx), jnp.clip(cl[1], -by, by),
         jnp.clip(cl[2], -bz, bz))
    e = _sub(cl, q)
    dist = _norm(e)
    inside = ((jnp.abs(cl[0]) <= bx) & (jnp.abs(cl[1]) <= by)
              & (jnp.abs(cl[2]) <= bz))
    m0, m1, m2 = bx - jnp.abs(cl[0]), by - jnp.abs(cl[1]), bz - jnp.abs(cl[2])
    use0 = (m0 <= m1) & (m0 <= m2)
    use1 = jnp.logical_not(use0) & (m1 <= m2)
    use2 = jnp.logical_not(use0 | use1)
    sgn = tuple(jnp.sign(x) + (x == 0) for x in cl)
    n_in = (use0 * sgn[0], use1 * sgn[1], use2 * sgn[2])
    n_loc = _where(inside, n_in, _scale(e, 1.0 / dist))
    depth = jnp.where(inside, r + jnp.minimum(m0, jnp.minimum(m1, m2)),
                      r - dist)
    # contact point midway between the box surface and the sphere surface
    p_loc = _sub(_where(inside, cl, q), _scale(n_loc, 0.5 * depth))
    return depth, _add(_to_world(gm, i1, p_loc), bpos), \
        _to_world(gm, i1, n_loc)


def _capsule_capsule(a1, b1, r1, a2, b2, r2):
    """Closest-point capsule-capsule for segments (a1,b1) and (a2,b2)."""
    d1 = _sub(b1, a1)
    d2 = _sub(b2, a2)
    r = _sub(a1, a2)
    a = _dot(d1, d1) + 1e-12
    e = _dot(d2, d2) + 1e-12
    f = _dot(d2, r)
    c = _dot(d1, r)
    b = _dot(d1, d2)
    denom = a * e - b * b
    s = jnp.where(jnp.abs(denom) > 1e-12,
                  jnp.clip((b * f - c * e)
                           / jnp.where(jnp.abs(denom) > 1e-12, denom, 1.0),
                           0.0, 1.0),
                  0.0)
    t = jnp.clip((b * s + f) / e, 0.0, 1.0)
    s = jnp.clip((b * t - c) / a, 0.0, 1.0)
    c1 = _add(a1, _scale(d1, s))
    c2 = _add(a2, _scale(d2, t))
    d = _sub(c2, c1)
    dist = _norm(d)
    n = _scale(d, 1.0 / dist)
    point = _scale(_add(_add(c1, _scale(n, r1)), _sub(c2, _scale(n, r2))),
                   0.5)
    return (r1 + r2) - dist, point, n


# ---------------------------------------------------------------------------
# static pair grouping
# ---------------------------------------------------------------------------

_GROUP_ORDER = ("plane_sphere", "plane_capsule", "box_sphere", "box_axis",
                "capsule_sphere", "capsule_capsule", "sphere_sphere")


def _grouped_pairs(model: Model):
    """Split contact_pairs into per-primitive groups (host-side, static).
    Returns dict of lists of (g1, g2, pair_idx[, t]) with g1 the
    plane/box/capsule reference geom; pair_idx indexes
    model.contact_pairs (-> contact_pair_condim)."""
    groups = {k: [] for k in _GROUP_ORDER}
    for pi, (a, b) in enumerate(model.contact_pairs):
        ta, tb = model.geom_type[a], model.geom_type[b]
        if (tb == PLANE) or (tb == BOX and ta != PLANE) or \
           (tb in (CAPSULE, CYLINDER) and ta == SPHERE):
            a, b = b, a
            ta, tb = tb, ta
        if ta == PLANE and tb == SPHERE:
            groups["plane_sphere"].append((a, b, pi))
        elif ta == PLANE and tb in (CAPSULE, CYLINDER):
            for k in (0, 1):    # one contact per end cap (MuJoCo manifold)
                groups["plane_capsule"].append((a, b, pi, k))
        elif ta == BOX and tb == SPHERE:
            groups["box_sphere"].append((a, b, pi))
        elif ta == BOX and tb in (CAPSULE, CYLINDER):
            for k in range(_AXIS_SAMPLES):
                groups["box_axis"].append((a, b, pi, k))
        elif ta in (CAPSULE, CYLINDER) and tb == SPHERE:
            # sphere = zero-length capsule (Adroit fingertips vs ball)
            groups["capsule_sphere"].append((a, b, pi))
        elif ta == CAPSULE and tb == CAPSULE:
            groups["capsule_capsule"].append((a, b, pi))
        elif ta == SPHERE and tb == SPHERE:
            # e.g. the gym humanoid's sphere feet against each other —
            # missing this pair type was the deep two-leg golden tail
            # (docs/ROADMAP.md item 9)
            groups["sphere_sphere"].append((a, b, pi))
        # unsupported pairs (e.g. static box-box) are skipped
    return groups


def contact_geom_ids(model: Model):
    """Static (g1, g2) numpy index arrays in the exact emission order of
    ``find_contacts`` — lets callers partition contact rows at trace time
    (e.g. by condim)."""
    groups = _grouped_pairs(model)
    order = []
    for key in _GROUP_ORDER:
        order += [(p[0], p[1]) for p in groups[key]]
    if not order:
        return (np.zeros(0, np.int32), np.zeros(0, np.int32))
    return (np.array([p[0] for p in order], np.int32),
            np.array([p[1] for p in order], np.int32))


def contact_pair_condims(model: Model):
    """Static per-emitted-contact condim array aligned with
    contact_geom_ids / find_contacts emission order, from the per-PAIR
    condim table (explicit <contact><pair> declarations override the
    geom-max rule).

    Under the ELLIPTIC cone option, condim 4/6 pairs are clamped to 3
    (documented scope limit: the SOC-coupled torsion/rolling terms are
    only implemented for the pyramidal path, which every condim>3 model
    in the suite — Adroit — uses by default)."""
    from mjrl_tpu.physics.model import ELLIPTIC
    groups = _grouped_pairs(model)
    cd = model.contact_pair_condim
    if not cd:   # builders predating the field: geom-max rule
        g1, g2 = contact_geom_ids(model)
        c = np.array(model.geom_condim, np.int32)
        out = (np.maximum(c[g1], c[g2]) if len(g1)
               else np.zeros(0, np.int32))
    else:
        order = []
        for key in _GROUP_ORDER:
            order += [cd[p[2]] for p in groups[key]]
        out = np.array(order, np.int32) if order else np.zeros(0, np.int32)
    if model.cone == ELLIPTIC:
        out = np.minimum(out, 3)
    return out


def find_contacts(model: Model, data):
    """Evaluate all supported pairs vectorized (SoA).

    Returns (depths (C,), point components ((C,),)x3, normal components
    ((C,),)x3, g1 (C,) idx array, g2 (C,) idx array) with C static.
    depth <= 0 means inactive.
    """
    groups = _grouped_pairs(model)
    gx, gm = data.geom_xpos, data.geom_xmat
    size = model.geom_size
    out = []

    def idx(lst, k):
        return jnp.asarray(np.array([p[k] for p in lst], np.int32))

    if groups["plane_sphere"]:
        i1 = idx(groups["plane_sphere"], 0)
        i2 = idx(groups["plane_sphere"], 1)
        d, p, n = _sphere_plane(_pos(gx, i2), size[i2, 0], _pos(gx, i1),
                                _col(gm, i1, 2))
        out.append((d, p, n, i1, i2))
    if groups["plane_capsule"]:
        i1 = idx(groups["plane_capsule"], 0)
        i2 = idx(groups["plane_capsule"], 1)
        ends = jnp.asarray(np.array(
            [p[3] for p in groups["plane_capsule"]], np.float32))
        sgn = 2.0 * ends - 1.0          # end 0 -> -axis, end 1 -> +axis
        c = _add(_pos(gx, i2), _scale(_col(gm, i2, 2), sgn * size[i2, 1]))
        d, p, n = _sphere_plane(c, size[i2, 0], _pos(gx, i1),
                                _col(gm, i1, 2))
        out.append((d, p, n, i1, i2))
    if groups["box_sphere"]:
        i1 = idx(groups["box_sphere"], 0)
        i2 = idx(groups["box_sphere"], 1)
        d, p, n = _sphere_box(_pos(gx, i2), size[i2, 0], gm, i1,
                              _pos(gx, i1),
                              (size[i1, 0], size[i1, 1], size[i1, 2]))
        out.append((d, p, n, i1, i2))
    if groups["box_axis"]:
        i1 = idx(groups["box_axis"], 0)
        i2 = idx(groups["box_axis"], 1)
        ks = jnp.asarray(np.array([p[3] for p in groups["box_axis"]],
                                  np.float32))
        t = 2.0 * ks / (_AXIS_SAMPLES - 1) - 1.0       # [-1, 1]
        c = _add(_pos(gx, i2), _scale(_col(gm, i2, 2), t * size[i2, 1]))
        d, p, n = _sphere_box(c, size[i2, 0], gm, i1, _pos(gx, i1),
                              (size[i1, 0], size[i1, 1], size[i1, 2]))
        out.append((d, p, n, i1, i2))
    if groups["capsule_sphere"]:
        i1 = idx(groups["capsule_sphere"], 0)
        i2 = idx(groups["capsule_sphere"], 1)
        ax1 = _scale(_col(gm, i1, 2), size[i1, 1])
        c2 = _pos(gx, i2)
        d, p, n = _capsule_capsule(
            _sub(_pos(gx, i1), ax1), _add(_pos(gx, i1), ax1), size[i1, 0],
            c2, c2, size[i2, 0])
        out.append((d, p, n, i1, i2))
    if groups["capsule_capsule"]:
        i1 = idx(groups["capsule_capsule"], 0)
        i2 = idx(groups["capsule_capsule"], 1)
        ax1 = _scale(_col(gm, i1, 2), size[i1, 1])
        ax2 = _scale(_col(gm, i2, 2), size[i2, 1])
        d, p, n = _capsule_capsule(
            _sub(_pos(gx, i1), ax1), _add(_pos(gx, i1), ax1), size[i1, 0],
            _sub(_pos(gx, i2), ax2), _add(_pos(gx, i2), ax2), size[i2, 0])
        out.append((d, p, n, i1, i2))
    if groups["sphere_sphere"]:
        i1 = idx(groups["sphere_sphere"], 0)
        i2 = idx(groups["sphere_sphere"], 1)
        c1, c2 = _pos(gx, i1), _pos(gx, i2)
        d, p, n = _capsule_capsule(c1, c1, size[i1, 0],
                                   c2, c2, size[i2, 0])
        out.append((d, p, n, i1, i2))

    if not out:
        z = jnp.zeros((0,), data.xpos.dtype)
        zi = jnp.zeros((0,), jnp.int32)
        return z, (z, z, z), (z, z, z), zi, zi

    depths = jnp.concatenate([o[0] for o in out])
    point = tuple(jnp.concatenate([o[1][k] for o in out]) for k in range(3))
    normal = tuple(jnp.concatenate([o[2][k] for o in out]) for k in range(3))
    g1 = jnp.concatenate([o[3] for o in out])
    g2 = jnp.concatenate([o[4] for o in out])
    # MuJoCo combines pair margins by SUM (includemargin = margin1 +
    # margin2, verified empirically); activation is dist < includemargin
    margin = model.geom_margin[g1] + model.geom_margin[g2]
    return depths + margin, point, normal, g1, g2


def contact_qfrc(model: Model, data, cdof, cvel, qvel, m_diag):
    """Generalized contact forces (nv,) from penalty contacts — fully
    vectorized over contacts, SoA throughout (no (C, 3) or (C, nv)
    intermediates; the nv axis is a static Python loop of nv <= ~20
    component passes).

    The normal force uses unit-impedance acceleration semantics,
    f_n = m_eff * (k * depth - b * v_n), with the per-contact effective
    mass from the diagonal approximation m_eff = 1 / sum_d J_nd^2 / M_dd.
    A mean-inertia scale over-stiffens contacts whose normal direction
    has little inertia and destabilizes explicit integration (observed:
    the gym Ant launching itself off the floor).
    """
    depths, point, normal, g1, g2 = find_contacts(model, data)
    if depths.shape[0] == 0:
        return jnp.zeros((model.nv,), qvel.dtype)
    nv = model.nv

    gb = jnp.asarray(np.array(model.geom_body, np.int32))
    b1, b2 = gb[g1], gb[g2]
    mask_np = ancestor_mask(model)                       # (nbody, nv) static

    # relative velocity of body2 w.r.t. body1 at each contact point:
    # v_body(p) = w x p + v0, per component (cvel rows gathered per k)
    def pvel(b):
        w = (cvel[b, 0], cvel[b, 1], cvel[b, 2])
        v0 = (cvel[b, 3], cvel[b, 4], cvel[b, 5])
        return _add(v0, _cross(w, point))

    vrel = _sub(pvel(b2), pvel(b1))
    vn = _dot(vrel, normal)
    vt = _sub(vrel, _scale(normal, vn))
    vt_norm = jnp.sqrt(_dot(vt, vt)) + 1e-9

    # 6-component test directions u = (p x n, n) for the normal rows
    un = _cross(point, normal) + normal                 # tuple of 6 (C,)

    # per-contact effective mass along the normal: sum_d (coeff_d * u.cdof_d)^2 / M_dd
    coeff_cols = []
    acc = 0.0
    for d in range(nv):
        col = jnp.asarray(mask_np[:, d], qvel.dtype)
        coeff_d = col[b2] - col[b1]                     # (C,)
        coeff_cols.append(coeff_d)
        jn_d = coeff_d * sum(cdof[d, k] * un[k] for k in range(6))
        acc = acc + jn_d * jn_d / m_diag[d]
    m_eff = 1.0 / (acc + 1e-8)

    # solref-style gains in acceleration units; positional response
    # saturates at CONTACT_WIDTH penetration (bounds the energy an
    # explicit penalty can inject on deep impacts).  Explicit integration
    # needs the damping eigenvalue b*h = 2h/timeconst well inside the
    # stability region: floor the timeconst at 4 timesteps under Euler
    # (MuJoCo's implicit solver only needs >= 2 timesteps).
    floor = 4.0 if model.integrator == EULER else 2.0
    timeconst = jnp.maximum(0.02, floor * model.timestep)
    k_gain = 1.0 / (timeconst * timeconst)
    b_gain = 2.0 / timeconst
    active = (depths > 0).astype(qvel.dtype)
    depths_c = jnp.clip(depths, 0.0, CONTACT_WIDTH)
    fn = jnp.maximum(m_eff * (k_gain * depths_c - b_gain * vn), 0.0) * active

    mu = jnp.maximum(model.geom_friction[g1, 0], model.geom_friction[g2, 0])
    ft_mag = jnp.minimum(mu * fn, m_eff * b_gain * vt_norm)
    f_world = _sub(_scale(normal, fn), _scale(vt, ft_mag / vt_norm))

    # spatial force at world origin applied to body2 (+) and body1 (-):
    # qfrc_d = sum_c coeff_cd * (cdof_d . (p x f, f))
    sf = _cross(point, f_world) + f_world               # tuple of 6 (C,)
    qfrc = [jnp.sum(coeff_cols[d] * sum(cdof[d, k] * sf[k]
                                        for k in range(6)))
            for d in range(nv)]
    return jnp.stack(qfrc)
