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

Supported primitive pairs (covers the reference envs + planar locomotion
+ the Adroit hand suite):
- sphere-plane / capsule-plane (reacher table, hopper floor)
- sphere-box; capsule-box analytic 2-point manifold (deepest clipped
  segment end + the opposite end when it also penetrates — MuJoCo
  mjc_CapsuleBox semantics, probed: a near-parallel capsule rests on 2
  points at the face-clipped segment ends, a tilted one on 1)
- cylinder-box via spheres sampled along the axis (MuJoCo uses 5-point
  convex MPR here; the 5 samples approximate its rim/side manifolds)
- box-box 4-point face manifold (incident-face corners clamped into the
  reference face, per-corner depths — MuJoCo mjc_BoxBox face semantics,
  probed; edge-edge configurations are approximated by the dominant
  face axis)
- capsule-capsule (swimmer self-contact), capsule/sphere variants
"""

import numpy as np
import jax
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
    m_min = jnp.minimum(m0, jnp.minimum(m1, m2))
    depth = jnp.where(inside, r + m_min, r - dist)
    # contact point midway between the box surface and the sphere
    # surface.  The box-surface anchor for an INSIDE center is its
    # projection onto the nearest face (center + slack along the face
    # normal), matching MuJoCo's deep-contact position — anchoring at
    # the center itself put deep contacts up to slack/2 too deep (wrong
    # lever arms on the Adroit press states; round-5 diagnosis)
    p_ref = _where(inside, _add(cl, _scale(n_loc, m_min)), q)
    p_loc = _sub(p_ref, _scale(n_loc, 0.5 * depth))
    return depth, _add(_to_world(gm, i1, p_loc), bpos), \
        _to_world(gm, i1, n_loc)


def _capsule_box_ends(gx, gm, size, i1, i2):
    """Clipped-segment-end candidates for capsule(i2)-box(i1) pairs ->
    (t0, t1, a_w, seg_w): the two t parameters plus the world segment
    (origin, direction) to evaluate sphere-box contacts at.

    MuJoCo mjc_CapsuleBox behavior (probed, see module docstring): the
    contact face is the one nearest the deepest segment point; the
    segment is clipped against that face's rectangle, and contacts sit
    at the clipped ends — both active only when both penetrate (the
    near-parallel manifold), else just the deepest."""
    half = size[i2, 1]
    bpos = _pos(gx, i1)
    bs = (size[i1, 0], size[i1, 1], size[i1, 2])
    axis = _col(gm, i2, 2)
    cw = _pos(gx, i2)
    a_w = _sub(cw, _scale(axis, half))
    b_w = _add(cw, _scale(axis, half))
    al = _to_local(gm, i1, _sub(a_w, bpos))
    d = _to_local(gm, i1, _sub(b_w, a_w))

    def seg(t):
        return tuple(al[k] + t * d[k] for k in range(3))

    def phi(t):
        """Signed distance of segment point to the box surface."""
        p = seg(t)
        q = tuple(jnp.clip(p[k], -bs[k], bs[k]) for k in range(3))
        e = _sub(p, q)
        m = jnp.minimum(jnp.minimum(bs[0] - jnp.abs(p[0]),
                                    bs[1] - jnp.abs(p[1])),
                        bs[2] - jnp.abs(p[2]))
        return jnp.where(m >= 0, -m, jnp.sqrt(_dot(e, e) + 1e-24))

    # deepest point: phi is unimodal along the segment in the shallow
    # regime — fixed-trip ternary search, fori_loop for a compact HLO
    def body(_, lh):
        lo, hi = lh
        m1 = lo + (hi - lo) / 3.0
        m2 = hi - (hi - lo) / 3.0
        take = phi(m1) > phi(m2)
        return (jnp.where(take, m1, lo), jnp.where(take, hi, m2))

    lo0 = jnp.zeros_like(al[0])
    lo, hi = jax.lax.fori_loop(0, 24, body, (lo0, 1.0 - lo0))
    ts = 0.5 * (lo + hi)

    # contact face at the deepest point (replicates _sphere_box's
    # normal selection): outside -> the clamp residual axis; inside ->
    # the min-slack axis
    p = seg(ts)
    q = tuple(jnp.clip(p[k], -bs[k], bs[k]) for k in range(3))
    e = _sub(p, q)
    m0, m1_, m2_ = (bs[0] - jnp.abs(p[0]), bs[1] - jnp.abs(p[1]),
                    bs[2] - jnp.abs(p[2]))
    inside = (m0 >= 0) & (m1_ >= 0) & (m2_ >= 0)
    slack = jnp.stack([m0, m1_, m2_])
    kidx = jnp.where(inside, jnp.argmin(slack, axis=0),
                     jnp.argmax(jnp.stack([jnp.abs(e[0]), jnp.abs(e[1]),
                                           jnp.abs(e[2])]), axis=0))

    # clip the segment t-interval to the face rectangle of the two
    # non-normal axes
    tlo = jnp.zeros_like(ts)
    thi = jnp.ones_like(ts)
    for j in range(3):
        dj, alj, sj = d[j], al[j], bs[j]
        degen = jnp.abs(dj) <= 1e-12
        safe = jnp.where(degen, 1.0, dj)
        ta = (-sj - alj) / safe
        tb = (sj - alj) / safe
        jlo = jnp.minimum(ta, tb)
        jhi = jnp.maximum(ta, tb)
        inside_j = jnp.abs(alj) <= sj
        jlo = jnp.where(degen, jnp.where(inside_j, 0.0, 1.0), jlo)
        jhi = jnp.where(degen, jnp.where(inside_j, 1.0, 0.0), jhi)
        skip = kidx == j
        tlo = jnp.where(skip, tlo, jnp.maximum(tlo, jlo))
        thi = jnp.where(skip, thi, jnp.minimum(thi, jhi))
    tlo = jnp.clip(tlo, 0.0, 1.0)
    thi = jnp.clip(thi, 0.0, 1.0)
    bad = thi < tlo
    tlo = jnp.where(bad, ts, tlo)
    thi = jnp.where(bad, ts, thi)
    seg_w = _sub(b_w, a_w)
    return tlo, thi, a_w, seg_w


def _box_box_manifold(gx, gm, size, i1, i2):
    """4-slot box-box face manifold -> (depths, points, normals), each
    a 4-list of component results for boxes i1 vs i2.

    Probed MuJoCo mjc_BoxBox face behavior: the reference face is the
    least-overlapping face axis over both boxes (SAT faces only; the
    rare edge-edge winner is approximated by the nearest face); the 4
    contacts are the incident face's corners clamped into the reference
    rectangle, each with its own penetration depth along the reference
    normal and MuJoCo's surface-midpoint position convention."""
    p1c, p2c = _pos(gx, i1), _pos(gx, i2)
    dpc = _sub(p2c, p1c)

    def sel_axis(i, kidx):
        cols = [_col(gm, i, k) for k in range(3)]
        return tuple(jnp.where(kidx == 0, cols[0][m],
                               jnp.where(kidx == 1, cols[1][m],
                                         cols[2][m])) for m in range(3))

    def sel_size(i, kidx):
        return jnp.where(kidx == 0, size[i, 0],
                         jnp.where(kidx == 1, size[i, 1], size[i, 2]))

    def face_overlap(ir, io, dvec):
        """Min face-axis overlap of ref box ir vs other box io ->
        (overlap, kidx).  dvec = other center - ref center."""
        overls = []
        for k in range(3):
            u = _col(gm, ir, k)
            rB = sum(size[io, j] * jnp.abs(_dot(u, _col(gm, io, j)))
                     for j in range(3))
            overls.append(size[ir, k] + rB - jnp.abs(_dot(dvec, u)))
        st = jnp.stack(overls)
        return jnp.min(st, axis=0), jnp.argmin(st, axis=0)

    def manifold(ir, io, irc, ioc, dvec):
        """4 (depth, point, normal) with normal outward from ref ir."""
        _, kidx = face_overlap(ir, io, dvec)
        u = sel_axis(ir, kidx)
        sgn = jnp.sign(_dot(dvec, u)) + (_dot(dvec, u) == 0)
        n = _scale(u, sgn)                       # ref face outward normal
        sk = sel_size(ir, kidx)
        # incident face of io: most anti-parallel axis
        dots = [_dot(n, _col(gm, io, j)) for j in range(3)]
        midx = jnp.argmax(jnp.stack([jnp.abs(t) for t in dots]), axis=0)
        vm = sel_axis(io, midx)
        sm = -(jnp.sign(jnp.where(midx == 0, dots[0],
                                  jnp.where(midx == 1, dots[1], dots[2])))
               + (jnp.where(midx == 0, dots[0],
                            jnp.where(midx == 1, dots[1], dots[2])) == 0))
        szm = sel_size(io, midx)
        # tangent axes of the incident face (the other two axes of io)
        aidx = jnp.where(midx == 0, 1, 0)
        bidx = jnp.where(midx == 2, 1, 2)
        va, vb = sel_axis(io, aidx), sel_axis(io, bidx)
        sza, szb = sel_size(io, aidx), sel_size(io, bidx)
        fc = _add(ioc, _scale(vm, sm * szm))     # incident face center
        out = []
        for sa in (-1.0, 1.0):
            for sb in (-1.0, 1.0):
                corner = _add(fc, _add(_scale(va, sa * sza),
                                       _scale(vb, sb * szb)))
                pl = _to_local(gm, ir, _sub(corner, irc))
                # clamp in-plane coords into the reference rectangle
                pl = tuple(jnp.where(kidx == k, pl[k],
                                     jnp.clip(pl[k], -size[ir, k],
                                              size[ir, k]))
                           for k in range(3))
                nc = jnp.where(kidx == 0, pl[0],
                               jnp.where(kidx == 1, pl[1], pl[2]))
                depth = sk - sgn * nc
                # surface-midpoint convention: halfway between the
                # corner and the reference face plane
                mid = sgn * (sk - 0.5 * depth)
                pw = tuple(jnp.where(kidx == k, mid, pl[k])
                           for k in range(3))
                out.append((depth, _add(_to_world(gm, ir, pw), irc), n))
        return out

    ov1, _ = face_overlap(i1, i2, dpc)
    ndpc = _scale(dpc, -1.0)
    ov2, _ = face_overlap(i2, i1, ndpc)
    man1 = manifold(i1, i2, p1c, p2c, dpc)
    man2 = manifold(i2, i1, p2c, p1c, ndpc)
    use1 = ov1 <= ov2
    out = []
    for (d1, pt1, n1), (d2, pt2, n2) in zip(man1, man2):
        d = jnp.where(use1, d1, d2)
        pt = _where(use1, pt1, pt2)
        # emitted normal must point from geom i1 into geom i2: ref=i1
        # normals already do; ref=i2 normals point toward i1 -> flip
        n = _where(use1, n1, _scale(n2, -1.0))
        out.append((d, pt, n))
    return out


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

_GROUP_ORDER = ("plane_sphere", "plane_capsule", "box_sphere",
                "box_capsule", "box_axis", "box_box",
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
        elif ta == BOX and tb == CAPSULE:
            # analytic 2-slot manifold (deepest clipped end + parallel
            # partner) — MuJoCo mjc_CapsuleBox semantics
            for k in (0, 1):
                groups["box_capsule"].append((a, b, pi, k))
        elif ta == BOX and tb == CYLINDER:
            # MuJoCo resolves cylinder-box with 5-point convex MPR; the
            # 5 axis samples approximate its side/rim manifolds
            for k in range(_AXIS_SAMPLES):
                groups["box_axis"].append((a, b, pi, k))
        elif ta == BOX and tb == BOX:
            for k in range(4):
                groups["box_box"].append((a, b, pi, k))
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
        # unsupported pairs (plane-box, ellipsoid, mesh) are skipped
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
    if groups["box_capsule"]:
        i1 = idx(groups["box_capsule"], 0)
        i2 = idx(groups["box_capsule"], 1)
        ks = jnp.asarray(np.array([p[3] for p in groups["box_capsule"]],
                                  np.float32))
        tlo, thi, a_w, seg_w = _capsule_box_ends(gx, gm, size, i1, i2)
        t = jnp.where(ks == 0, tlo, thi)
        c = _add(a_w, _scale(seg_w, t))
        bpos = _pos(gx, i1)
        bs = (size[i1, 0], size[i1, 1], size[i1, 2])
        d, p, n = _sphere_box(c, size[i2, 0], gm, i1, bpos, bs)
        # both end depths, for MuJoCo's deep-contact rule
        r_c = size[i2, 0]
        d_lo, _, _ = _sphere_box(_add(a_w, _scale(seg_w, tlo)), r_c,
                                 gm, i1, bpos, bs)
        d_hi, _, _ = _sphere_box(_add(a_w, _scale(seg_w, thi)), r_c,
                                 gm, i1, bpos, bs)
        # suppress a slot when (a) the clip interval collapsed (both
        # slots name the same point — double rows double the force;
        # keep slot 0) or (b) the deeper end's center is inside the
        # box: MuJoCo's submerged branch emits a single contact at the
        # deepest end (probed)
        collapse = thi - tlo < 1e-9
        submerged = jnp.maximum(d_lo, d_hi) > r_c
        hi_deeper = d_hi > d_lo
        d = jnp.where((ks == 0) & submerged & hi_deeper, -1.0, d)
        d = jnp.where((ks == 1) & (collapse
                                   | (submerged & ~hi_deeper)), -1.0, d)
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
    if groups["box_box"]:
        i1 = idx(groups["box_box"], 0)
        i2 = idx(groups["box_box"], 1)
        ks = jnp.asarray(np.array([p[3] for p in groups["box_box"]],
                                  np.int32))
        man = _box_box_manifold(gx, gm, size, i1, i2)
        d = sum((ks == k) * man[k][0] for k in range(4))
        p = tuple(sum((ks == k) * man[k][1][m] for k in range(4))
                  for m in range(3))
        n = tuple(sum((ks == k) * man[k][2][m] for k in range(4))
                  for m in range(3))
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
