"""Planar-chain fast path: specialized dynamics for swimmer-class models.

A large share of the headline benchmark's cost is generic 3D machinery
(quaternions, 6D spatial algebra) evaluated for a model that is strictly
planar.  This module specializes the full pipeline — FK, CRB mass
matrix, Coriolis bias, the MuJoCo inertia-box fluid model, joint-limit
penalties, actuation, semi-implicit Euler — to chains moving in the xy
plane: 3-component spatial algebra (omega_z, vx, vy), angles instead of
quaternions, static unrolling over the (tiny) chain.

Applicability is checked statically by ``extract_planar`` (root body
with slide-x + slide-y + hinge-z, descendants with one hinge-z each,
in-plane offsets/CoMs, z-gravity only, Euler integrator, penalty
solver); incompatible models return None and callers fall back to the
general engine.  Numerical agreement with the general engine is gated by
tests/test_planar.py.

Everything is written in SHAPE-AGNOSTIC component style: all state is
tuples/lists of scalar-shaped arrays, every op elementwise, no stacking
or trailing-axis indexing.  The same code therefore runs per-env under
``vmap`` (scalars) AND inside a Pallas kernel over (8, 128) env tiles
(the whole-rollout kernel experiment, docs/ROADMAP.md item 3).

Cited reference behavior: the swimmer asset (mjrl/envs/assets/
swimmer.xml — viscosity/density fluid, +-1.5 hinge limits, gear-20
motors) stepped by MuJoCo's mj_step through mjrl/envs/mujoco_env.py:
120-126.
"""

from typing import NamedTuple, Tuple

import numpy as np
import jax.numpy as jnp

from mjrl_tpu.physics.model import EULER, HINGE, PGS, SLIDE, Model


class PlanarParams(NamedTuple):
    """Static host-side description of a planar chain (python floats /
    numpy; baked into the trace as constants)."""
    nv: int
    nbody: int                   # moving bodies (world excluded)
    offsets: Tuple               # (nbody, 2) parent->body frame offset
    mass: Tuple                  # (nbody,)
    izz: Tuple                   # (nbody,) inertia about z through CoM
    com: Tuple                   # (nbody, 2) CoM in body frame
    # fluid constants per body
    box: Tuple                   # (nbody, 3) equivalent-box semi-axes
    r0: Tuple                    # (nbody, 3, 3) inertial frame at phi=0
    viscosity: float
    density: float
    # per-dof tables (nv; dof 0,1 slide, 2.. hinge)
    damping: Tuple
    armature: Tuple
    limited: Tuple
    lo: Tuple
    hi: Tuple
    limit_k: Tuple
    limit_b: Tuple
    solimp: Tuple                # (nv, 5) per-dof limit solimp
    invweight0: Tuple            # (nv,) diag(M^-1) at qpos0
    # actuators: (joint dof index, gear, lo, hi, limited)
    actuators: Tuple
    timestep: float
    body_dof: Tuple              # (nbody,) index of the body's hinge dof


def extract_planar(model: Model):
    """PlanarParams if the model is a supported planar chain, else None.

    Only implicit-solver (``solver="newton"``) models qualify: the fast
    path implements MuJoCo's soft-constraint limit response (the exact
    dual QP), not the penalty approximation."""
    if model.integrator != EULER or model.solver != PGS:
        return None
    if model.nq != model.nv or model.nbody < 2 or model.ntendon \
            or model.neq:
        return None
    g = np.asarray(model.gravity)
    if abs(g[0]) > 0 or abs(g[1]) > 0:
        return None
    jt = list(model.jnt_type)
    axes = np.asarray(model.jnt_axis)
    jpos = np.asarray(model.jnt_pos)
    # root: slide-x, slide-y, hinge-z at origin; children: one hinge-z
    if len(model.body_jnts[1]) != 3:
        return None
    j0, j1, j2 = model.body_jnts[1]
    ok = (jt[j0] == SLIDE and np.allclose(axes[j0], [1, 0, 0])
          and jt[j1] == SLIDE and np.allclose(axes[j1], [0, 1, 0])
          and jt[j2] == HINGE and np.allclose(axes[j2], [0, 0, 1]))
    if not ok:
        return None
    body_dof = [model.jnt_dofadr[j2]]
    for b in range(2, model.nbody):
        if model.body_parent[b] != b - 1:
            return None
        if len(model.body_jnts[b]) != 1:
            return None
        j = model.body_jnts[b][0]
        if jt[j] != HINGE or not np.allclose(axes[j], [0, 0, 1]) \
                or np.linalg.norm(jpos[j]) > 1e-6:
            return None
        body_dof.append(model.jnt_dofadr[j])
    bp = np.asarray(model.body_pos)
    ip = np.asarray(model.body_ipos)
    if np.abs(bp[2:, 2]).max(initial=0.0) > 1e-6 \
            or np.abs(ip[1:, 2]).max(initial=0.0) > 1e-6:
        return None
    if np.linalg.norm(np.asarray(model.jnt_pos)[j2]) > 1e-6:
        return None

    # inertial-frame constants (pure numpy: this runs lazily and may be
    # reached inside a jit trace, where any jnp op would stage a tracer)
    def np_quat_mat(q):
        w, x, y, z = q / np.linalg.norm(q)
        return np.array([
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z),
             2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z),
             2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x),
             1 - 2 * (x * x + y * y)]])

    iq = np.asarray(model.body_iquat)
    inertia = np.asarray(model.body_inertia)
    mass = np.asarray(model.body_mass)
    r0s, izzs, boxes = [], [], []
    for b in range(1, model.nbody):
        r0 = np_quat_mat(np.asarray(iq[b], np.float64))
        iw = r0 @ np.diag(inertia[b]) @ r0.T
        # rotation must keep z a principal-ish axis for Izz constancy
        if abs(iw[0, 2]) + abs(iw[1, 2]) > 1e-6 * max(iw[2, 2], 1e-9):
            return None
        izzs.append(float(iw[2, 2]))
        r0s.append(r0)
        i0, i1, i2 = inertia[b]
        m = max(float(mass[b]), 1e-12)
        boxes.append([
            float(0.5 * np.sqrt(max(6.0 * (i1 + i2 - i0) / m, 1e-12))),
            float(0.5 * np.sqrt(max(6.0 * (i0 + i2 - i1) / m, 1e-12))),
            float(0.5 * np.sqrt(max(6.0 * (i0 + i1 - i2) / m, 1e-12)))])

    h = float(model.timestep)
    solref = np.asarray(model.dof_solref)
    solimp = np.asarray(model.dof_solimp)
    # implicit-solver constants (solver.py _kb): tc floored at 2*timestep,
    # dmax from solimp
    tc = np.maximum(solref[:, 0], 2.0 * h)
    dr = solref[:, 1]
    dmax = solimp[:, 1]
    limit_k = 1.0 / np.maximum(dmax * dmax * tc * tc * dr * dr, 1e-12)
    limit_b = 2.0 / np.maximum(dmax * tc, 1e-12)
    rng = np.asarray(model.dof_range)
    acts = []
    for i, j in enumerate(model.actuator_joint):
        if not model.actuator_simple:
            return None
        acts.append((int(model.jnt_dofadr[j]),
                     float(np.asarray(model.gear)[i]),
                     float(np.asarray(model.ctrlrange)[i, 0]),
                     float(np.asarray(model.ctrlrange)[i, 1]),
                     float(np.asarray(model.ctrllimited)[i])))

    return PlanarParams(
        nv=model.nv, nbody=model.nbody - 1,
        offsets=tuple((float(bp[b][0]), float(bp[b][1]))
                      for b in range(1, model.nbody)),
        mass=tuple(float(m) for m in mass[1:]),
        izz=tuple(izzs),
        com=tuple((float(ip[b][0]), float(ip[b][1]))
                  for b in range(1, model.nbody)),
        box=tuple(tuple(bx) for bx in boxes),
        r0=tuple(tuple(tuple(float(x) for x in row) for row in r)
                 for r in r0s),
        viscosity=float(model.viscosity),
        density=float(model.density),
        damping=tuple(float(x) for x in np.asarray(model.dof_damping)),
        armature=tuple(float(x) for x in np.asarray(model.dof_armature)),
        limited=tuple(float(x) for x in np.asarray(model.dof_limited)),
        lo=tuple(float(x) for x in rng[:, 0]),
        hi=tuple(float(x) for x in rng[:, 1]),
        limit_k=tuple(float(x) for x in limit_k),
        limit_b=tuple(float(x) for x in limit_b),
        solimp=tuple(tuple(float(x) for x in row) for row in solimp),
        invweight0=tuple(float(x)
                         for x in np.asarray(model.dof_invweight0)),
        actuators=tuple(acts),
        timestep=h,
        body_dof=tuple(body_dof))


# ---------------------------------------------------------------------------
# component helpers (every value is a scalar-shaped array; tuples = vec2)
# ---------------------------------------------------------------------------

def _impedance_scalar(si, violation):
    """MuJoCo solimp impedance ramp with a STATIC (python float) solimp
    tuple and a traced scalar violation (solver.py impedance, scalar
    form)."""
    d0, dw, width, mid, power = si
    mid = min(max(mid, 1e-4), 1.0 - 1e-4)
    x = jnp.clip(violation / max(width, 1e-12), 0.0, 1.0)
    y_lo = mid * (x / mid) ** power
    y_hi = 1.0 - (1.0 - mid) * ((1.0 - x) / (1.0 - mid)) ** power
    y = jnp.where(x < mid, y_lo, y_hi)
    return jnp.clip(d0 + y * (dw - d0), 1e-4, 1.0 - 1e-4)


def _perp(v):
    return (-v[1], v[0])


def _dot2(a, b):
    return a[0] * b[0] + a[1] * b[1]


def _cross2(a, b):
    return a[0] * b[1] - a[1] * b[0]


def _planar_ctx(p: PlanarParams, q):
    """FK + per-dof motion axes.

    Returns (phi (nbody,), org (nbody, vec2), sdofs (nv, (omega, vec2)),
    coms (nbody, vec2 world CoM), chain mask (static)).
    """
    nb = p.nbody
    phi = [None] * nb
    org = [None] * nb
    x, y = q[0], q[1]
    phi[0] = q[2]
    org[0] = (p.offsets[0][0] + x, p.offsets[0][1] + y)
    for b in range(1, nb):
        c, s = jnp.cos(phi[b - 1]), jnp.sin(phi[b - 1])
        ox, oy = p.offsets[b]
        org[b] = (org[b - 1][0] + c * ox - s * oy,
                  org[b - 1][1] + s * ox + c * oy)
        phi[b] = phi[b - 1] + q[p.body_dof[b]]

    coms = []
    for b in range(nb):
        c, s = jnp.cos(phi[b]), jnp.sin(phi[b])
        cx, cy = p.com[b]
        coms.append((org[b][0] + c * cx - s * cy,
                     org[b][1] + s * cx + c * cy))

    zero = jnp.zeros_like(x)
    one = jnp.ones_like(x)
    sdofs = [None] * p.nv
    sdofs[0] = (zero, (one, zero))
    sdofs[1] = (zero, (zero, one))
    for b in range(nb):
        a = org[b]
        sdofs[p.body_dof[b]] = (one, (a[1], -a[0]))

    # chain[b][d] = 1 iff dof d drives body b (static)
    chain = [[0.0] * p.nv for _ in range(nb)]
    for b in range(nb):
        chain[b][0] = chain[b][1] = 1.0
        for b2 in range(b + 1):
            chain[b][p.body_dof[b2]] = 1.0
    return phi, org, sdofs, coms, chain


def _apply_inertia(p, b, com_w, mot):
    """h = I_b mot for planar motion (omega, u) -> (n_z, f)."""
    w, u = mot
    m = p.mass[b]
    pc = _perp(com_w)
    f = (m * (u[0] + w * pc[0]), m * (u[1] + w * pc[1]))
    n = p.izz[b] * w + _cross2(com_w, f)
    return n, f


def _fluid(p, b, phi, com_w, vel_b):
    """World-origin planar fluid force (n_z, f) on body b (the planar
    reduction of dynamics.fluid_force)."""
    w, u = vel_b
    # CoM linear velocity
    pc = _perp(com_w)
    vx = u[0] + w * pc[0]
    vy = u[1] + w * pc[1]
    c, s = jnp.cos(phi), jnp.sin(phi)
    # world -> inertial frame: R = Rz(phi) R0; v_l = R0^T Rz(-phi) v
    vrx = c * vx + s * vy
    vry = -s * vx + c * vy
    r0 = p.r0[b]
    v_l = [r0[0][i] * vrx + r0[1][i] * vry for i in range(3)]
    w_l = [r0[2][i] * w for i in range(3)]      # R0^T (0,0,w)

    bx = p.box[b]
    diam = (bx[0] + bx[1] + bx[2]) * 2.0 / 3.0
    area = [4.0 * bx[1] * bx[2], 4.0 * bx[0] * bx[2], 4.0 * bx[0] * bx[1]]
    tco = [bx[0] * (bx[1] ** 4 + bx[2] ** 4),
           bx[1] * (bx[0] ** 4 + bx[2] ** 4),
           bx[2] * (bx[0] ** 4 + bx[1] ** 4)]
    c_v = float(-3.0 * np.pi * diam * p.viscosity)
    c_w = float(-np.pi * diam ** 3 * p.viscosity)
    f_l = [c_v * v_l[i]
           - 0.5 * float(p.density * area[i]) * jnp.abs(v_l[i]) * v_l[i]
           for i in range(3)]
    t_l = [c_w * w_l[i]
           - 0.5 * float(p.density * tco[i]) * jnp.abs(w_l[i]) * w_l[i]
           for i in range(3)]

    # back to world: a_w = Rz(phi) R0 a_l; keep f xy and torque z
    fr = [sum(r0[i][k] * f_l[k] for k in range(3)) for i in range(3)]
    tr2 = sum(r0[2][k] * t_l[k] for k in range(3))
    f_w = (c * fr[0] - s * fr[1], s * fr[0] + c * fr[1])
    n_z = tr2 + _cross2(com_w, f_w)
    return n_z, f_w


def planar_substep(p: PlanarParams, q, v, ctrl):
    """One semi-implicit Euler physics step on component tuples
    (q (nv,), v (nv,), ctrl (nu,)) -> (q', v')."""
    nv = p.nv
    phi, org, sdofs, coms, chain = _planar_ctx(p, q)

    # body velocities (accumulate down the chain) + cdofdot
    vel = [None] * p.nbody
    sdot = [None] * nv
    zero = jnp.zeros_like(q[0])
    sdot[0] = sdot[1] = (zero, (zero, zero))
    # carrier velocity before the root hinge = the slide translations
    w_c, u_c = zero, (v[0], v[1])
    for b in range(p.nbody):
        d = p.body_dof[b]
        # cdofdot for hinge d: carrier velocity BEFORE this dof
        sd = sdofs[d]
        sdot[d] = (zero, (w_c * -sd[1][1] - sd[0] * -u_c[1],
                          w_c * sd[1][0] - sd[0] * u_c[0]))
        w_c = w_c + sd[0] * v[d]
        u_c = (u_c[0] + sd[1][0] * v[d], u_c[1] + sd[1][1] * v[d])
        vel[b] = (w_c, u_c)

    # mass matrix (upper triangle) + armature
    iu = {}
    for b in range(p.nbody):
        for d in range(nv):
            if chain[b][d]:
                iu[(b, d)] = _apply_inertia(p, b, coms[b], sdofs[d])
    m = {}
    for d in range(nv):
        for e in range(d, nv):
            acc = 0.0
            for b in range(p.nbody):
                if chain[b][d] and chain[b][e]:
                    n, f = iu[(b, e)]
                    acc = acc + sdofs[d][0] * n + _dot2(sdofs[d][1], f)
            m[(d, e)] = acc + (p.armature[d] if d == e else 0.0)

    # bias: f_b = I avp + v x* (I v); avp_b = sum_d sdot_d qd (chain)
    bias = [0.0] * nv
    for b in range(p.nbody):
        aw, aux, auy = zero, zero, zero
        for d in range(nv):
            if chain[b][d]:
                aw = aw + sdot[d][0] * v[d]
                aux = aux + sdot[d][1][0] * v[d]
                auy = auy + sdot[d][1][1] * v[d]
        n1, f1 = _apply_inertia(p, b, coms[b], (aw, (aux, auy)))
        nh, fh = _apply_inertia(p, b, coms[b], vel[b])
        w_b, u_b = vel[b]
        # force cross: (u x f, w * perp(f))
        n2 = _cross2(u_b, fh)
        f2 = (w_b * -fh[1], w_b * fh[0])
        nf, ff = _fluid(p, b, phi[b], coms[b], vel[b])
        n_tot = n1 + n2 - nf
        f_tot = (f1[0] + f2[0] - ff[0], f1[1] + f2[1] - ff[1])
        for d in range(nv):
            if chain[b][d]:
                bias[d] = bias[d] + sdofs[d][0] * n_tot \
                    + _dot2(sdofs[d][1], f_tot)

    # applied forces: actuators + joint damping
    qfrc = [-p.damping[d] * v[d] - bias[d] for d in range(nv)]
    for i, (d, gear, lo, hi, lim) in enumerate(p.actuators):
        c = jnp.clip(ctrl[i], lo, hi) if lim else ctrl[i]
        qfrc[d] = qfrc[d] + gear * c

    h = p.timestep

    def chol(mdict):
        low = {}
        for j in range(nv):
            for i in range(j, nv):
                s_ = mdict[(j, i)] if j <= i else mdict[(i, j)]
                for k in range(j):
                    s_ = s_ - low[(i, k)] * low[(j, k)]
                if i == j:
                    low[(j, j)] = jnp.sqrt(jnp.maximum(s_, 1e-12))
                else:
                    low[(i, j)] = s_ / low[(j, j)]
        return low

    def solve(low, rhs):
        yv = [None] * nv
        for i in range(nv):
            s_ = rhs[i]
            for k in range(i):
                s_ = s_ - low[(i, k)] * yv[k]
            yv[i] = s_ / low[(i, i)]
        out = [None] * nv
        for i in reversed(range(nv)):
            s_ = yv[i]
            for k in range(i + 1, nv):
                s_ = s_ - low[(k, i)] * out[k]
            out[i] = s_ / low[(i, i)]
        return out

    low = chol(m)

    # MuJoCo-grade IMPLICIT joint limits: the exact soft-constraint dual
    # over the limited dofs (J = +-e_d rows), solved with projected
    # Gauss-Seidel (n_l <= ~6 rows: GS converges in a few sweeps).  This
    # replaces the penalty reference-acceleration response, whose
    # saturated spring lets violent gaits swing far past the stops and
    # pump energy (observed: the swimmer learning a nonphysical 3 m/s
    # thrash gait that scores 7x MuJoCo's; see tests/test_planar.py's
    # limit-active agreement gate vs the general implicit solver).
    lim_dofs = [d for d in range(nv) if p.limited[d]]
    if lim_dofs:
        a0 = solve(low, qfrc)
        nl = len(lim_dofs)
        sign, aref, active, reg, adiag = [], [], [], [], []
        minv_cols = []
        zero = jnp.zeros_like(q[0])
        one = jnp.ones_like(q[0])
        for d in lim_dofs:
            below = jnp.maximum(p.lo[d] - q[d], 0.0)
            above = jnp.maximum(q[d] - p.hi[d], 0.0)
            use_lower = below >= above
            sg = jnp.where(use_lower, 1.0, -1.0)
            dist = jnp.where(use_lower, q[d] - p.lo[d], p.hi[d] - q[d])
            act = ((below > 0) | (above > 0)).astype(q[d].dtype)
            imp = _impedance_scalar(p.solimp[d], jnp.maximum(-dist, 0.0))
            aref.append(-p.limit_b[d] * sg * v[d]
                        - p.limit_k[d] * imp * dist)
            reg.append(jnp.maximum((1.0 - imp) / imp * p.invweight0[d],
                                   1e-12))
            sign.append(sg)
            active.append(act)
            e_d = [one if e == d else zero for e in range(nv)]
            minv_cols.append(solve(low, e_d))
        amat = [[sign[i] * sign[j] * minv_cols[j][lim_dofs[i]]
                 for j in range(nl)] for i in range(nl)]
        bvec = [aref[i] - sign[i] * a0[lim_dofs[i]] for i in range(nl)]
        lam = [zero] * nl
        for _ in range(12):              # projected Gauss-Seidel sweeps
            for i in range(nl):
                g = sum(amat[i][j] * lam[j] for j in range(nl)) \
                    + reg[i] * lam[i] - bvec[i]
                lam[i] = active[i] * jnp.maximum(
                    0.0, lam[i] - g / (amat[i][i] + reg[i]))
        for i in range(nl):              # qfrc += J^T lambda
            qfrc[lim_dofs[i]] = qfrc[lim_dofs[i]] + sign[i] * lam[i]

    # integrate with implicit joint damping: (M + h diag(B)) qacc = qfrc
    if any(p.damping):
        for d in range(nv):
            m[(d, d)] = m[(d, d)] + h * p.damping[d]
        low = chol(m)
    qacc = solve(low, qfrc)

    v2 = [v[d] + h * qacc[d] for d in range(nv)]
    q2 = [q[d] + h * v2[d] for d in range(nv)]
    return q2, v2


def planar_step_n(p: PlanarParams, q, v, ctrl, n: int):
    """n substeps (frame_skip); component tuples in/out.  The loop is
    unrolled — n is tiny and static, and unrolling keeps the whole
    control step a single fused region."""
    for _ in range(n):
        q, v = planar_substep(p, q, v, ctrl)
    return q, v


# ---------------------------------------------------------------------------
# array-facing wrappers (vmap over envs; (..., nv) arrays)
# ---------------------------------------------------------------------------

def step_n_arrays(p: PlanarParams, qpos, qvel, ctrl, n: int):
    """(nv,), (nv,), (nu,) arrays -> stepped arrays (vmap-friendly)."""
    q = [qpos[d] for d in range(p.nv)]
    v = [qvel[d] for d in range(p.nv)]
    u = [ctrl[i] for i in range(len(p.actuators))]
    q2, v2 = planar_step_n(p, q, v, u, n)
    return jnp.stack(q2), jnp.stack(v2)
