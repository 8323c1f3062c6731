"""MuJoCo-grade implicit constraint solver (dual APGD).

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

Friction cone: pyramidal (MuJoCo default) — each contact point yields
2*(condim-1) facet rows, all with force >= 0: condim 3 gives the slide
pairs Jn ± mu Jt1, Jn ± mu Jt2; condim 4 adds a torsional pair (torque
about the normal, mu = friction[1]); condim 6 adds rolling pairs
(torque about t1/t2, friction[2]).  The tangent frame follows MuJoCo's
convention t1 ∝ (0, n_z, -n_y).

Every formula above was pinned down empirically against mjData.efc_*
probes (efc_KBIP, efc_R, efc_aref, efc_J) and the full solve validated to
machine precision against MuJoCo's Newton solver on hopper floor-contact
states (tests/test_solver.py golden data).

Solved in the DUAL with warm-started accelerated projected gradient
descent (solve_qacc): every sweep is two O(C nv) matvecs (unrolled over
the static nv axis — no dot_general) plus elementwise projection, which
XLA fuses across the scan — no per-iteration factorization, no
while_loop synchronization — so it vmaps efficiently over large env
batches on TPU.  Contact-rich models cap the dual system with a top-k
active set (Model.contact_topk).  Impulses are warm-started across substeps and RK4
stages (step.py), MuJoCo's qacc_warmstart analog.  Constraint rows are
static (trace-time) in count; inactive rows are masked to zero impulse.
A 60-iteration primal-Newton reference solve (exact Hessian + line
search) was used to pin these semantics against MuJoCo and reproduces
its qacc to ~1e-7; the dual converges to the same solution (same QP) —
cold-start accuracy is gated by tests/test_solver.py's contact goldens.
"""

import numpy as np
import jax
import jax.numpy as jnp

from mjrl_tpu.physics.collision import (_norm, contact_geom_ids,
                                        contact_pair_condims, find_contacts)
from mjrl_tpu.physics.dynamics import (ancestor_mask, ball_limit_terms,
                                       equality_terms)
from mjrl_tpu.physics.model import BALL, ELLIPTIC, Model
from mjrl_tpu.ops.linalg import (chol_solve_unrolled, spd_solve,
                                 spd_solve_rows)

SWEEPS = 50      # APGD iterations for a cold (zero-impulse) solve
SWEEPS_WARM = 15  # iterations when warm-started from the previous substep
POWER_ITERS = 8   # power-iteration steps for the Lipschitz estimate


def impedance(solimp, violation):
    """MuJoCo solimp impedance ramp d(r) for violation r >= 0.

    solimp = (d0, dwidth, width, midpoint, power); the ramp interpolates
    d0 -> dwidth over |r| in [0, width] with a split polynomial sigmoid.
    Verified against mjData.efc_KBIP[2] across penetrations."""
    return _impedance_components(
        tuple(solimp[..., i] for i in range(5)), violation)


def _kb(solref, solimp, timestep):
    """Constraint stiffness/damping in acceleration units; the timeconst
    is floored at 2*timestep like MuJoCo's implicit solvers."""
    return _kb_components(solref[..., 0], solref[..., 1], solimp[..., 1],
                          timestep)


def _kb_components(tc, dr, dmax, timestep):
    """_kb on separate component arrays (SoA layout for contact rows)."""
    tc = jnp.maximum(tc, 2.0 * timestep)
    k = 1.0 / jnp.maximum(dmax * dmax * tc * tc * dr * dr, 1e-12)
    b = 2.0 / jnp.maximum(dmax * tc, 1e-12)
    return k, b


def _impedance_components(si, violation):
    """solimp impedance ramp on a 5-tuple of component arrays (the SoA
    variant of ``impedance``)."""
    d0, dw, width, mid, power = si
    x = jnp.clip(violation / jnp.maximum(width, 1e-12), 0.0, 1.0)
    mid = jnp.clip(mid, 1e-4, 1.0 - 1e-4)
    y_lo = mid * (x / mid) ** power
    y_hi = 1.0 - (1.0 - mid) * ((1.0 - x) / (1.0 - mid)) ** power
    y = jnp.where(x < mid, y_lo, y_hi)
    return jnp.clip(d0 + y * (dw - d0), 1e-4, 1.0 - 1e-4)


def constraint_rows(model: Model, data, cdof, qpos, qvel):
    """Assemble the static constraint rows -> (J (C, nv), aref_pos (C,),
    b_row (C,), active (C,), R (C,), lo (C,), hi (C,), soc_mu (K,),
    slot_ids (C,))
    — soc_mu is the per-contact friction of the elliptic cone triples
    (empty on pyramidal models); slot_ids identifies WHICH candidate
    occupies each padded row slot (-1 for rows whose identity is static),
    so a warm-start impulse vector can be invalidated per slot when the
    contact_topk active set changes between row rebuilds (RK4 stages /
    substeps) — see constrained_qacc.

    The velocity part of MuJoCo's reference acceleration is kept
    SEPARATE: aref(v) = aref_pos - b_row * (J v), so a frozen row
    context can be reused across RK4 stages / substeps with only the
    cheap J v matvec recomputed (see constrained_qacc ctx).

    Row layout (MuJoCo efc order): bilateral equality rows first
    (1 per joint coupling, 3 per connect; impulse lower bound lo =
    -inf), then one boxed dry-friction row per dof with frictionloss,
    then one signed row per limited scalar dof, one row per ball
    joint rotation limit, one per limited tendon, then contact rows
    (frictionless, or 2*(condim-1) pyramidal facets per point) — all
    with lo = 0.
    """
    dtype = qvel.dtype
    h = model.timestep
    rows, arefs, brows, actives, regs = [], [], [], [], []

    # ---- equality constraints (FIRST, matching MuJoCo's efc order) ----
    # bilateral rows: their impulses are unclamped (lo = -inf below)
    n_eq_rows = 0
    for i, jrows, res, imppos, iw in equality_terms(model, data, cdof,
                                                    qpos):
        k_e, b_e = _kb(model.eq_solref[i], model.eq_solimp[i], h)
        imp_e = impedance(model.eq_solimp[i], imppos)
        K = jrows.shape[0]
        n_eq_rows += K
        rows.append(jrows)
        arefs.append(-k_e * imp_e * res)
        brows.append(jnp.full((K,), 1.0, dtype) * b_e)
        actives.append(jnp.full((K,), 1.0, dtype) * model.eq_active[i])
        regs.append(jnp.full((K,), 1.0, dtype)
                    * ((1.0 - imp_e) / imp_e * iw))

    # ---- dof dry friction (mjCNSTR_FRICTION_DOF) -----------------------
    # one identity row per dof with frictionloss > 0, impulse bounded in
    # [-floss, +floss] (force units; box bounds ride the hi vector).
    # Probed semantics on the Adroit model: aref = -b qvel (no position
    # term), b/R from the default solref/solimp at zero violation.
    nv = model.nv
    n_fr_rows = 0
    fl = (np.asarray(model.dof_frictionloss)
          if model.dof_frictionloss is not None else np.zeros(nv))
    fr_idx = np.nonzero(fl > 0)[0]
    if fr_idx.size:
        n_fr_rows = len(fr_idx)
        fi = jnp.asarray(fr_idx, jnp.int32)
        k_f, b_f = _kb(model.dof_solref, model.dof_solimp, h)
        imp_f = impedance(model.dof_solimp, jnp.zeros((nv,), dtype))
        rows.append(jnp.eye(nv, dtype=dtype)[fi])
        arefs.append(jnp.zeros((n_fr_rows,), dtype))
        brows.append(b_f[fi])
        actives.append(jnp.ones((n_fr_rows,), dtype))
        regs.append(((1.0 - imp_f) / imp_f * model.dof_invweight0)[fi])

    # ---- scalar-dof joint limits ---------------------------------------
    q = qpos[jnp.asarray(np.array(model.dof_qpos_idx, np.int32))]
    lo, hi = model.dof_range[:, 0], model.dof_range[:, 1]
    # nearer bound (margin can activate a limit BEFORE violation, so
    # the side pick must use plain distance, not violation)
    use_lower = (q - lo) <= (hi - q)
    sign = jnp.where(use_lower, 1.0, -1.0)
    # distance to the margin surface (mjData.efc_pos - margin): MuJoCo
    # activates a joint limit when dist < jnt_margin and measures the
    # impedance violation from the margin (Adroit sets margin=0.01 on
    # every hand joint, with many joints resting exactly at a bound)
    margin = (model.dof_margin if model.dof_margin is not None
              else jnp.zeros_like(q))
    dist = jnp.where(use_lower, q - lo, hi - q) - margin
    active_l = model.dof_limited * (dist < 0)
    k_l, b_l = _kb(model.dof_solref, model.dof_solimp, h)
    imp_l = impedance(model.dof_solimp, jnp.maximum(-dist, 0.0))
    # statically drop never-limited dofs (e.g. the root dofs of every
    # locomotion model): their rows are permanently inactive, and while
    # they cannot change the dual's SOLUTION they inflate its Lipschitz
    # estimate and hence the finite-sweep trajectory (the planar fast
    # path drops them too — both solvers must agree at finite sweeps)
    lim_idx = np.nonzero(np.asarray(model.dof_limited) > 0)[0]
    if lim_idx.size:
        li = jnp.asarray(lim_idx, jnp.int32)
        rows.append((sign[:, None] * jnp.eye(nv, dtype=dtype))[li])
        arefs.append((-k_l * imp_l * dist)[li])
        brows.append(b_l[li])
        actives.append(active_l.astype(dtype)[li])
        regs.append(((1.0 - imp_l) / imp_l * model.dof_invweight0)[li])

    # ---- ball-joint rotation-angle limits ------------------------------
    for bj, da, axis, bpos in _ball_rows(model, qpos):
        k_b, b_b = _kb(model.limit_solref[bj], model.limit_solimp[bj], h)
        imp_b = impedance(model.limit_solimp[bj], jnp.maximum(-bpos, 0.0))
        jrow = jnp.zeros((nv,), dtype).at[da:da + 3].set(-axis)
        rows.append(jrow[None])
        arefs.append((-k_b * imp_b * bpos)[None])
        brows.append(jnp.asarray(b_b, dtype)[None])
        actives.append((model.jnt_limited[bj] * (bpos < 0)).astype(dtype)[None])
        regs.append(((1.0 - imp_b) / imp_b
                     * model.dof_invweight0[da])[None])

    # ---- fixed-tendon length limits ------------------------------------
    # one signed row per limited tendon with the constant Jacobian
    # ten_J (mjCNSTR_LIMIT_TENDON); R from diag(J M0^-1 J^T)
    if model.ntendon:
        L = model.ten_J @ q
        tlo, thi = model.ten_range[:, 0], model.ten_range[:, 1]
        t_below = jnp.maximum(tlo - L, 0.0)
        t_above = jnp.maximum(L - thi, 0.0)
        t_lower = t_below >= t_above
        t_sign = jnp.where(t_lower, 1.0, -1.0)
        t_dist = jnp.where(t_lower, L - tlo, thi - L)
        active_t = model.ten_limited * ((t_below > 0) | (t_above > 0))
        k_t, b_t = _kb(model.ten_solref, model.ten_solimp, h)
        imp_t = impedance(model.ten_solimp, jnp.maximum(-t_dist, 0.0))
        rows.append(t_sign[:, None] * model.ten_J)
        arefs.append(-k_t * imp_t * t_dist)
        brows.append(b_t)
        actives.append(active_t.astype(dtype))
        regs.append((1.0 - imp_t) / imp_t * model.ten_invweight0)

    # ---- contacts ------------------------------------------------------
    # condim 1 pairs -> one frictionless normal row (mjCNSTR_CONTACT_
    # FRICTIONLESS); condim 3 -> 4 pyramidal facet rows.  The pair condim
    # is max(geom condims) (MuJoCo rule) and is STATIC, so the split is
    # done with host-side index arrays at trace time.
    depths, point, normal, g1, g2 = find_contacts(model, data)
    C = int(depths.shape[0])
    id_parts = []
    soc_mu = jnp.zeros((0,), dtype)
    if C:
        gb = jnp.asarray(np.array(model.geom_body, np.int32))
        b1, b2 = gb[g1], gb[g2]
        mask_np = ancestor_mask(model)                    # (nbody, nv)
        pos_m = -depths                                   # dist - margin
        active_c = (depths > 0).astype(dtype)

        # component gathers: (C, 2)/(C, 5) gathered tables would be
        # lane-padded to (C, 128) on TPU (see collision.py's layout
        # rationale; measured 10 ms/eval on peg), so solref/solimp are
        # assembled per component
        def avg_col(tab, i):
            return 0.5 * (tab[g1, i] + tab[g2, i])

        tc_c = avg_col(model.geom_solref, 0)
        dr_c = avg_col(model.geom_solref, 1)
        si_c = tuple(avg_col(model.geom_solimp, i) for i in range(5))
        k_c, b_c = _kb_components(tc_c, dr_c, si_c[1], h)
        imp_c = _impedance_components(si_c, jnp.maximum(depths, 0.0))
        mu = jnp.maximum(model.geom_friction[g1, 0],
                         model.geom_friction[g2, 0])
        iw = (model.body_invweight0[b1, 0] + model.body_invweight0[b2, 0])

        # MuJoCo tangent frame (mju_makeFrame, pinned against con.frame
        # on the Adroit grasp states): seed (0,1,0) unless |n_y| >= 0.5
        # (then (0,0,1)), Gram-Schmidt against n, t2 = n x t1.  The
        # frame ORIENTATION matters: a rotated tangent basis yields a
        # rotated facet pyramid — a different discretized cone and a
        # different solution on sliding contacts (round-5 diagnosis:
        # the old (0, n_z, -n_y) rule only agreed for axis-aligned
        # normals, where the flip merely permutes facets)
        use_y = jnp.abs(normal[1]) < 0.5
        vy = jnp.where(use_y, 1.0, 0.0)
        vz = 1.0 - vy
        dotv = normal[1] * vy + normal[2] * vz
        t1r = (-normal[0] * dotv, vy - normal[1] * dotv,
               vz - normal[2] * dotv)
        t1nrm = _norm(t1r)
        t1 = tuple(c / t1nrm for c in t1r)
        t2 = (normal[1] * t1[2] - normal[2] * t1[1],
              normal[2] * t1[0] - normal[0] * t1[2],
              normal[0] * t1[1] - normal[1] * t1[0])

        def jac(dirs, pts, cf_cols):
            """(K, nv) constraint rows for test directions ``dirs`` at
            points ``pts`` (component tuples already reduced to the
            active set) — assembled per-dof so no (C, nv) tensor is ever
            minor-padded."""
            u = (pts[1] * dirs[2] - pts[2] * dirs[1],
                 pts[2] * dirs[0] - pts[0] * dirs[2],
                 pts[0] * dirs[1] - pts[1] * dirs[0]) + dirs
            cols = [cf_cols[d] * sum(cdof[d, k] * u[k] for k in range(6))
                    for d in range(model.nv)]
            return jnp.stack(cols, axis=-1)

        pair_condim = contact_pair_condims(model)
        idx_n = np.where(pair_condim == 1)[0]
        # friction classes (static): pyramidal emits 2*(condim-1) facet
        # rows per contact — condim 3: t1/t2 slide facets; condim 4 adds
        # a torsional pair (torque about the normal, mu = friction[1]);
        # condim 6 adds rolling pairs (torque about t1/t2, friction[2]).
        # Probed vs mjData.efc_J on condim-4/6 scenes: facet order is
        # (t1+-, t2+-, tors+-, roll1+-, roll2+-) and efc_R is IDENTICAL
        # across all facets of a contact (depends only on the slide mu).
        # Elliptic models see every class clamped to 3 by
        # contact_pair_condims (documented scope limit).
        f_classes = [(cd, np.where(pair_condim == cd)[0])
                     for cd in (3, 4, 6) if (pair_condim == cd).any()]

        def make_take(idx_np):
            """Active-set reduction (C,) -> (K,) for one condim class:
            static slice below the contact_topk cap, else top-k deepest
            via a ONE-HOT CONTRACTION — per-env dynamic row gathers
            lower catastrophically on this TPU (~0.7 ms each vs ~7 us
            for an extra one-hot matvec), so the sorted index set (row
            identity stable while the active set doesn't change — the
            warm-start contract) is applied as oh (K, C) @ comp (C,)."""
            k = model.contact_topk
            if not (k and len(idx_np) > k):
                idx = jnp.asarray(idx_np)
                # uncapped: slot identity is static -> ids never change
                return (lambda arr: arr[idx]), idx.astype(jnp.int32)
            _, li = jax.lax.top_k(depths[jnp.asarray(idx_np)], k)
            s = jnp.sort(jnp.asarray(idx_np)[li])
            c_all = depths.shape[0]
            oh = (s[:, None] == jnp.arange(c_all)[None, :]).astype(dtype)
            return (lambda arr: oh @ arr), s.astype(jnp.int32)

        def coeff_cols(take):
            """Per-dof chain coefficients of the selected contacts."""
            cols = []
            for d in range(model.nv):
                col = jnp.asarray(mask_np[:, d], dtype)
                cols.append(take(col[b2] - col[b1]))
            return cols

        def jac_rot(dirs, cf_cols):
            """(K, nv) rows for pure-torque test directions (moment =
            dir, force = 0) — the torsional / rolling friction rows."""
            cols = [cf_cols[d] * sum(cdof[d, k] * dirs[k] for k in range(3))
                    for d in range(model.nv)]
            return jnp.stack(cols, axis=-1)

        # friction coefficients by component: MuJoCo combines geom pairs
        # by elementwise max of (slide, torsion, roll) (probed via
        # mjContact.friction)
        mu_tors = jnp.maximum(model.geom_friction[g1, 1],
                              model.geom_friction[g2, 1])
        mu_roll = jnp.maximum(model.geom_friction[g1, 2],
                              model.geom_friction[g2, 2])

        if len(idx_n):         # frictionless: one normal row, R from iw
            take, ids_n = make_take(idx_n)
            id_parts.append(ids_n)
            pts = tuple(take(p) for p in point)
            j_row = jac(tuple(take(n) for n in normal), pts,
                        coeff_cols(take))
            rows.append(j_row)
            t_k, t_b, t_imp, t_pos = (take(k_c), take(b_c), take(imp_c),
                                      take(pos_m))
            arefs.append(-t_k * t_imp * t_pos)
            brows.append(t_b)
            actives.append(take(active_c))
            regs.append(jnp.maximum((1.0 - t_imp) / t_imp * take(iw),
                                    1e-12))

        for cls_cd, idx_f in f_classes:
            take, ids_f = make_take(idx_f)
            mue = take(mu)
            t_imp = take(imp_c)
            diag_approx = take(iw) * 2.0 * mue * mue * (1.0 + mue * mue)
            r_f = jnp.maximum((1.0 - t_imp) / t_imp * diag_approx, 1e-12)
            pts = tuple(take(p) for p in point)
            cfc = coeff_cols(take)
            j_n = jac(tuple(take(n) for n in normal), pts, cfc)
            j_t1 = jac(tuple(take(t) for t in t1), pts, cfc)
            j_t2 = jac(tuple(take(t) for t in t2), pts, cfc)
            t_k, t_b, t_pos = take(k_c), take(b_c), take(pos_m)
            t_active = take(active_c)
            if model.cone == ELLIPTIC:
                # 3 rows per contact [n, t1, t2] sharing the normal
                # row's impedance/regularizer (MuJoCo elliptic with
                # impratio 1: efc_R identical across the triple, tangent
                # aref has no position term — pinned vs mjData.efc_*
                # probes with <option cone="elliptic">); the dual solve
                # projects each triple onto mu*lam_n >= |lam_t|
                r_e = jnp.maximum((1.0 - t_imp) / t_imp * take(iw),
                                  1e-12)
                aref_n = -t_k * t_imp * t_pos
                zero_k = jnp.zeros_like(aref_n)
                for j_r, a_r in ((j_n, aref_n), (j_t1, zero_k),
                                 (j_t2, zero_k)):
                    rows.append(j_r)
                    arefs.append(a_r)
                    brows.append(t_b)
                    actives.append(t_active)
                    regs.append(r_e)
                id_parts.extend([ids_f] * 3)
                soc_mu = mue
            else:
                # facet directions in MuJoCo efc order: slide pairs,
                # then torsion (condim >= 4), then rolling (condim 6);
                # all facets share the slide-mu diagApprox r_f
                facet_dirs = [(j_t1, mue), (j_t2, mue)]
                if cls_cd >= 4:
                    j_rn = jac_rot(tuple(take(n) for n in normal), cfc)
                    facet_dirs.append((j_rn, take(mu_tors)))
                if cls_cd >= 6:
                    j_rt1 = jac_rot(tuple(take(t) for t in t1), cfc)
                    j_rt2 = jac_rot(tuple(take(t) for t in t2), cfc)
                    facet_dirs.append((j_rt1, take(mu_roll)))
                    facet_dirs.append((j_rt2, take(mu_roll)))
                for j_t, mu_i in facet_dirs:
                    for sign_f in (1.0, -1.0):
                        j_f = j_n + sign_f * mu_i[:, None] * j_t
                        rows.append(j_f)
                        arefs.append(-t_k * t_imp * t_pos)
                        brows.append(t_b)
                        actives.append(t_active)
                        regs.append(r_f)
                id_parts.extend([ids_f] * (2 * len(facet_dirs)))

    if not rows:          # a model with no limits/contacts/equalities
        z = jnp.zeros((0,), dtype)
        return (jnp.zeros((0, nv), dtype), z, z, z, z, z, z, z,
                jnp.zeros((0,), jnp.int32))
    j_all = jnp.concatenate(rows)
    # per-slot candidate identity: -1 (never changes) for the static
    # prefix (equality/limit/ball/tendon rows), the selected candidate id
    # for contact rows — id_parts repeats each class's candidate ids per
    # facet block (pyramidal appends 2*(condim-1) K-blocks per class,
    # elliptic 3)
    n_con_rows = sum(p.shape[0] for p in id_parts)
    slot_ids = jnp.concatenate(
        [jnp.full((j_all.shape[0] - n_con_rows,), -1, jnp.int32)]
        + id_parts)
    # impulse bounds: equality rows (the static prefix) are bilateral,
    # dof-friction rows are boxed in [-floss, +floss], every other row
    # is a unilateral force >= 0 — except elliptic contact triples,
    # whose componentwise clamp must pass everything through to the
    # cone projection (a triple with a negative normal iterate can
    # still project to a nonzero impulse)
    n_rest = j_all.shape[0] - n_eq_rows - n_fr_rows
    fl_b = jnp.asarray(fl[fr_idx], dtype) if n_fr_rows else \
        jnp.zeros((0,), dtype)
    lo = jnp.concatenate([jnp.full((n_eq_rows,), -jnp.inf, dtype),
                          -fl_b, jnp.zeros((n_rest,), dtype)])
    hi = jnp.concatenate([jnp.full((n_eq_rows,), jnp.inf, dtype),
                          fl_b, jnp.full((n_rest,), jnp.inf, dtype)])
    if model.cone == ELLIPTIC and soc_mu.shape[0]:
        st, K = _soc_layout(model)
        lo = lo.at[st:st + 3 * K].set(-jnp.inf)
    return (j_all, jnp.concatenate(arefs),
            jnp.concatenate(brows), jnp.concatenate(actives),
            jnp.concatenate(regs), lo, hi, soc_mu, slot_ids)


def _ball_rows(model: Model, qpos):
    """(joint, dofadr, axis, pos) per ball joint (static count)."""
    return [(bj, da, axis, bpos)
            for bj, da, axis, bpos, _, _ in ball_limit_terms(model, qpos)]


def _contact_counts(model: Model):
    """Static {condim: count} contact group sizes after the per-class
    contact_topk cap (keys 1/3/4/6; elliptic models only ever see 1/3
    via contact_pair_condims' clamp)."""
    pair_condim = contact_pair_condims(model)
    counts = {}
    for cd in (1, 3, 4, 6):
        n = int((np.asarray(pair_condim) == cd).sum()) \
            if len(pair_condim) else 0
        if model.contact_topk:
            n = min(n, model.contact_topk)
        counts[cd] = n
    return counts


def _n_friction_rows(model: Model):
    fl = model.dof_frictionloss
    return 0 if fl is None else int((np.asarray(fl) > 0).sum())


def _soc_layout(model: Model):
    """Static (start, K) of the elliptic contact triple block [n(K),
    t1(K), t2(K)] within the assembled rows (same layout arithmetic as
    n_constraint_rows)."""
    from mjrl_tpu.physics.model import EQ_CONNECT, EQ_WELD
    n_eq = sum({EQ_CONNECT: 3, EQ_WELD: 6}.get(k, 1)
               for k in model.eq_kind)
    n_ball = sum(1 for t in model.jnt_type if t == BALL)
    n_lim = int((np.asarray(model.dof_limited) > 0).sum())
    cc = _contact_counts(model)
    return (n_eq + _n_friction_rows(model) + n_lim + n_ball
            + model.ntendon + cc[1]), cc[3]


def n_constraint_rows(model: Model):
    """Static total row count (equality + limits + ball limits + tendon
    limits + contact rows) — the shape of the warm-start impulse vector
    threaded through step_n.  Accounts for the contact_topk active-set
    cap per condim class and the cone type (4 pyramidal facet rows vs
    3 elliptic rows per friction contact)."""
    from mjrl_tpu.physics.model import EQ_CONNECT, EQ_WELD
    n_eq = sum({EQ_CONNECT: 3, EQ_WELD: 6}.get(k, 1)
               for k in model.eq_kind)
    n_ball = sum(1 for t in model.jnt_type if t == BALL)
    cc = _contact_counts(model)
    if model.cone == ELLIPTIC:
        n_con = cc[1] + 3 * cc[3]      # condim>3 clamped to 3 for elliptic
    else:
        # pyramidal: 2*(condim-1) facet rows per contact
        n_con = cc[1] + 4 * cc[3] + 6 * cc[4] + 10 * cc[6]
    n_lim = int((np.asarray(model.dof_limited) > 0).sum())
    return (n_eq + _n_friction_rows(model) + n_lim + n_ball
            + model.ntendon + n_con)


def solve_qacc(m, a0, j, aref, active, r, lam0, sweeps=SWEEPS, lo=None,
               hi=None, soc=None):
    """Diagonally-preconditioned APGD solve of the regularized DUAL
    -> (qacc, lam).

    The dual of the primal QP above:  min_lam 1/2 lam^T (A + R) lam -
    lam^T (aref - J a0),  lam >= 0,  with A = J M^-1 J^T (never
    materialized: each iteration costs two O(C nv) matvecs).  Solved by
    Nesterov-accelerated projected gradient descent with adaptive
    restart in the diag(A+R)^(1/2)-scaled space, step 1/L with L from
    power iteration — convergence is guaranteed for any conditioning
    (plain projected Jacobi diverges on walker2d's coupled pyramid
    facets).  Chosen over primal Newton for the runtime path because
    every iteration is fused elementwise/matvec work (no per-iteration
    Cholesky, no while_loop sync), so it vmaps efficiently on TPU; the
    impulses warm-start the next substep (MuJoCo's warm start analog).
    Cold-start accuracy vs the contact goldens: median < 0.1% at 50
    iterations (tests/test_solver.py)."""
    # columns of M^-1 J^T: the Cholesky factor of m is loop-invariant
    # under the row vmap, so it is computed once and only the triangular
    # solves batch over rows.  (Tried: explicit chol inverse + j @ minv
    # matmul — 10x SLOWER under vmap; the (B, C, nv) @ (B, nv, nv)
    # batched matmul pads nv to 128 MXU lanes per env.)
    # (spd_solve_rows: large-nv models take ONE native Cholesky factor
    # + batched triangular solves instead of nv^3/6 unrolled ops — the
    # 36-dof Adroit step otherwise lowers to 13.5M HLO chars and the
    # TPU compile never lands)
    minv_jt = spd_solve_rows(m, j)                                  # (C,nv)
    diag = jnp.sum(j * minv_jt, axis=-1)
    ds = jnp.sqrt(jnp.maximum(diag + r, 1e-12))
    if soc is not None:
        # elliptic contact triples [n(K), t1(K), t2(K)] starting at st:
        # the normal row keeps its own ds and the tangent PAIR gets one
        # shared scale (their geometric mean), so the cone stays
        # circular in the preconditioned space with a modified opening
        # mu' = mu * d_t / d_n — closed-form SOC projection still
        # applies, and the 2-scales-per-triple preconditioning keeps
        # APGD convergence near the pyramidal path's (one uniform scale
        # per triple needed ~10x the sweeps on walker2d's 6-contact
        # states)
        st, K, mu_g = soc
        ds_n = ds[st:st + K]
        ds_t = jnp.sqrt(ds[st + K:st + 2 * K] * ds[st + 2 * K:st + 3 * K])
        ds = jnp.concatenate([ds[:st + K], ds_t, ds_t,
                              ds[st + 3 * K:]])
        mu_g = mu_g * ds_t / ds_n

    def op(v):     # preconditioned operator D^-1/2 (A + R) D^-1/2
        u = v / ds
        return (j @ (minv_jt.T @ u) + r * u) / ds

    # Lipschitz constant of the preconditioned dual via power iteration
    def power(carry, _):
        v, _ = carry
        w = op(v)
        n = jnp.maximum(jnp.linalg.norm(w), 1e-12)
        return (w / n, n), ()

    (_, lmax), _ = jax.lax.scan(
        power, (active / jnp.maximum(jnp.linalg.norm(active), 1e-12),
                jnp.ones((), a0.dtype)), None, length=POWER_ITERS)
    el = jnp.maximum(1.1 * lmax, 1e-8)

    rhs = (aref - j @ a0) / ds
    mu0 = lam0 * active * ds
    # impulse bounds in the scaled space (lo 0 = unilateral force>=0,
    # -inf = bilateral equality row / elliptic contact triple; finite
    # [lo, hi] boxes = dof dry-friction rows)
    mu_lo = jnp.zeros_like(ds) if lo is None else lo * ds
    mu_hi = None if hi is None else jnp.where(jnp.isinf(hi), hi, hi * ds)

    def project(z):
        """Feasible-set projection: componentwise clamp, then the SOC
        projection for elliptic contact triples (which their -inf lo
        passed through untouched)."""
        z = jnp.maximum(z, mu_lo)
        if mu_hi is not None:
            z = jnp.minimum(z, mu_hi)
        if soc is not None:
            n_i = z[st:st + K]
            t1_i = z[st + K:st + 2 * K]
            t2_i = z[st + 2 * K:st + 3 * K]
            s = jnp.sqrt(t1_i * t1_i + t2_i * t2_i)
            inside = s <= mu_g * n_i
            below = mu_g * s <= -n_i
            c = (mu_g * s + n_i) / (1.0 + mu_g * mu_g)
            n_p = jnp.where(inside, n_i, jnp.where(below, 0.0, c))
            tsc = jnp.where(inside, 1.0,
                            jnp.where(below, 0.0,
                                      mu_g * c / jnp.maximum(s, 1e-30)))
            z = z.at[st:st + K].set(n_p)
            z = z.at[st + K:st + 2 * K].set(t1_i * tsc)
            z = z.at[st + 2 * K:st + 3 * K].set(t2_i * tsc)
        return z * active

    def apgd(carry, _):
        mu, y, t = carry
        g = op(y) - rhs
        mu_new = project(y - g / el)
        # adaptive restart (gradient test): kill momentum when the
        # momentum direction opposes descent
        restart = jnp.sum((y - mu_new) * (mu_new - mu)) > 0
        t = jnp.where(restart, 1.0, t)
        y_base = jnp.where(restart, mu_new, mu_new)
        t_new = 0.5 * (1.0 + jnp.sqrt(1.0 + 4.0 * t * t))
        mom = jnp.where(restart, 0.0, (t - 1.0) / t_new)
        y = y_base + mom * (mu_new - mu)
        return (mu_new, y, t_new), ()

    if isinstance(sweeps, int):
        # static trip count: keep the scan (bit- and HLO-identical to
        # the historical path — the planar fast path and all goldens
        # ride this)
        (mu, _, _), _ = jax.lax.scan(
            apgd, (mu0, mu0, jnp.ones((), a0.dtype)), None, length=sweeps)
    else:
        # traced trip count (step_n's unified cold/warm substep body —
        # halves the traced program for big general-engine models)
        mu, _, _ = jax.lax.fori_loop(
            0, sweeps, lambda _, c: apgd(c, None)[0],
            (mu0, mu0, jnp.ones((), a0.dtype)))
    lam = mu / ds
    return a0 + minv_jt.T @ lam, lam


NEWTON_ITERS = 25        # outer Newton iterations (quadratic convergence)
NEWTON_LS_ITERS = 8      # exact 1D Newton line-search iterations
NOSLIP_SWEEPS = 100      # APGD sweeps for the noslip friction post-pass


def _noslip_layout(model: Model):
    """Static row-index arrays of the friction DIMENSIONS for the
    noslip post-pass -> (pair_plus, pair_minus, fr_rows): pyramidal
    facet-pair rows (each tangent/torsion/roll direction's +/- facets)
    and dof dry-friction rows (same layout arithmetic as
    n_constraint_rows)."""
    from mjrl_tpu.physics.model import EQ_CONNECT, EQ_WELD
    n_eq = sum({EQ_CONNECT: 3, EQ_WELD: 6}.get(k, 1)
               for k in model.eq_kind)
    n_fr = _n_friction_rows(model)
    n_ball = sum(1 for t in model.jnt_type if t == BALL)
    n_lim = int((np.asarray(model.dof_limited) > 0).sum())
    cc = _contact_counts(model)
    base = n_eq + n_fr + n_lim + n_ball + model.ntendon + cc[1]
    plus, minus = [], []
    for cd in (3, 4, 6):
        K = cc[cd]
        if not K:
            continue
        for f in range(cd - 1):
            plus += list(range(base + 2 * f * K, base + 2 * f * K + K))
            minus += list(range(base + (2 * f + 1) * K,
                                base + (2 * f + 1) * K + K))
        base += 2 * (cd - 1) * K
    return (np.asarray(plus, np.int32), np.asarray(minus, np.int32),
            np.arange(n_eq, n_eq + n_fr, dtype=np.int32))


def noslip_qacc(model: Model, m, j, aref, lam, lo, hi, qacc):
    """MuJoCo's noslip post-pass, TPU-native -> qacc'.

    MuJoCo (<option noslip_iterations>) reruns the FRICTION dimensions
    after the main solve with the constraint softening removed, holding
    the normal loads fixed — without it a grasped object creeps out of
    the hand (regularized friction always slips a little; the Adroit
    model ships noslip_iterations=20, and relocate grasps visibly leak
    without it — round-5 diagnosis).  Per pyramidal facet pair the
    tangent force is lam+ - lam- with the sum (the normal load share) s
    fixed, so the friction subproblem is a BOX QP: minimize the slip
    residual over d in [-s, s] (dof-friction rows: d in [-floss,
    +floss]).  MuJoCo runs sequential PGS — hostile to TPU — but the
    box QP is convex with the same fixed point, so we solve it with the
    same diagonally-preconditioned APGD used by the dual (all matvecs,
    vmappable).  Inactive pairs have s = 0, so their box collapses and
    no activation mask is needed."""
    ip, im, ifr = _noslip_layout(model)
    if len(ip) + len(ifr) == 0:
        return qacc
    ipj, imj, ifrj = jnp.asarray(ip), jnp.asarray(im), jnp.asarray(ifr)
    b_rows = jnp.concatenate([0.5 * (j[ipj] - j[imj]), j[ifrj]])
    d0 = jnp.concatenate([lam[ipj] - lam[imj], lam[ifrj]])
    s = lam[ipj] + lam[imj]
    d_lo = jnp.concatenate([-s, lo[ifrj]])
    d_hi = jnp.concatenate([s, hi[ifrj]])
    # slip targets: facet pairs share their aref, so the pair target is
    # exactly zero slip; dof-friction rows keep their -b*v target
    aref_f = jnp.concatenate([0.5 * (aref[ipj] - aref[imj]), aref[ifrj]])
    minv_bt = spd_solve_rows(m, b_rows)                       # (P, nv)
    a_base = qacc - minv_bt.T @ d0
    rhs = aref_f - b_rows @ a_base
    diag = jnp.sum(b_rows * minv_bt, axis=-1)
    ds = jnp.sqrt(jnp.maximum(diag, 1e-12))

    def op(v):
        u = v / ds
        return (b_rows @ (minv_bt.T @ u)) / ds

    def power(carry, _):
        v, _ = carry
        w = op(v)
        n = jnp.maximum(jnp.linalg.norm(w), 1e-12)
        return (w / n, n), ()

    v0 = jnp.ones_like(ds)
    (_, lmax), _ = jax.lax.scan(
        power, (v0 / jnp.maximum(jnp.linalg.norm(v0), 1e-12),
                jnp.ones((), qacc.dtype)), None, length=POWER_ITERS)
    el = jnp.maximum(1.1 * lmax, 1e-8)
    rhs_s = rhs / ds
    mu_lo, mu_hi = d_lo * ds, d_hi * ds

    def project(z):
        return jnp.clip(z, mu_lo, mu_hi)

    def apgd(carry, _):
        mu, y, t = carry
        g = op(y) - rhs_s
        mu_new = project(y - g / el)
        restart = jnp.sum((y - mu_new) * (mu_new - mu)) > 0
        t = jnp.where(restart, 1.0, t)
        t_new = 0.5 * (1.0 + jnp.sqrt(1.0 + 4.0 * t * t))
        mom = jnp.where(restart, 0.0, (t - 1.0) / t_new)
        y = mu_new + mom * (mu_new - mu)
        return (mu_new, y, t_new), ()

    mu0 = project(d0 * ds)
    (mu, _, _), _ = jax.lax.scan(apgd, (mu0, mu0, jnp.ones((), qacc.dtype)),
                                 None, length=NOSLIP_SWEEPS)
    return a_base + minv_bt.T @ (mu / ds)


def solve_qacc_newton(m, a0, j, aref, active, r, lo, hi,
                      iters=NEWTON_ITERS):
    """Primal Newton solve of the same soft-constraint QP -> (qacc, lam).

    MuJoCo's own Newton solver: minimize over a
        f(a) = 1/2 (a-a0)^T M (a-a0) + sum_i active_i * psi_i(J_i a - aref_i)
    with per-row cost psi from the impulse bounds —
        bilateral  (lo=-inf, hi=inf): x^2 / 2R           (equality rows)
        unilateral (lo=0,    hi=inf): min(x, 0)^2 / 2R   (contacts/limits)
        boxed      (finite lo/hi):    Huber with force clipped to
                                      [lo, hi]           (dof dry friction)
    Each iteration: exact Hessian H = M + J^T diag(w) J over the active
    quadratic rows (ONE (nv,C)@(C,nv) matmul — MXU-shaped), a Cholesky
    solve, and an exact line search (1D Newton on the piecewise-
    quadratic restriction).  Converges in ~10 iterations on the Adroit
    grasp states where the dual APGD needs thousands of sweeps (the
    170+-row coupled systems are too ill-conditioned for first-order
    sweeps at the production budget — round-5 diagnosis).  Elliptic
    cones keep the dual path (the SOC cost is not row-separable)."""
    bilateral = jnp.isneginf(lo) & jnp.isposinf(hi)
    boxed = jnp.isfinite(lo) & jnp.isfinite(hi)

    def row_terms(x):
        """Per-row force-gradient psi'(x) and Hessian weight psi''(x)."""
        xr = x / r
        g_row = jnp.where(bilateral, xr,
                          jnp.where(boxed, jnp.clip(xr, lo, hi),
                                    jnp.minimum(x, 0.0) / r))
        w = jnp.where(bilateral, 1.0,
                      jnp.where(boxed, (xr > lo) & (xr < hi),
                                x < 0.0).astype(x.dtype))
        return active * g_row, active * w / r

    def body(_, a):
        x = j @ a - aref
        g_row, w = row_terms(x)
        grad = m @ (a - a0) + j.T @ g_row
        jw = j * jnp.sqrt(w)[:, None]
        # tiny ridge: H is SPD in exact arithmetic (M SPD + PSD), but
        # the native Cholesky path has no pivot floor and f32 roundoff
        # on near-redundant facet rows can push an eigenvalue negative
        h = (m + jw.T @ jw
             + (1e-9 * jnp.trace(m) / m.shape[-1])
             * jnp.eye(m.shape[-1], dtype=a.dtype))
        step = -spd_solve(h, grad)
        dx = j @ step
        mdd = step @ (m @ step)
        mdr = step @ (m @ (a - a0))

        def ls(_, alpha):
            ga, wa = row_terms(x + alpha * dx)
            f1 = mdr + alpha * mdd + ga @ dx
            f2 = mdd + (wa * dx) @ dx
            return alpha - f1 / jnp.maximum(f2, 1e-12)

        alpha = jax.lax.fori_loop(0, NEWTON_LS_ITERS, ls,
                                  jnp.ones((), a.dtype))
        return a + jnp.clip(alpha, 0.0, 2.0) * step

    qacc = jax.lax.fori_loop(0, iters, body, a0)
    lam = -row_terms(j @ qacc - aref)[0]
    return qacc, lam


def constrained_qacc(model: Model, data, cdof, qpos, qvel, m,
                     qfrc_minus_bias, warm=None, sweeps=None, ctx=None):
    """qacc under the implicit solver -> (qacc, qacc_smooth, warm', ctx).

    ``warm``/``warm'`` is the (impulses, slot_ids) pair seeding the dual
    iteration from the previous substep's / RK4 stage's solve (MuJoCo's
    warm start); None = cold zeros.  When rows are rebuilt between
    solves and the contact_topk active set changed, impulses belonging
    to slots whose occupying candidate differs are zeroed — a stale
    seed only slows APGD convergence, but under the reduced SWEEPS_WARM
    budget the slowdown is observable (advisor finding, round 2).
    ``sweeps`` (static) overrides the APGD iteration count; None = the
    cold-start default.

    ``ctx`` (the returned 9-tuple of constraint_rows) reuses a FROZEN
    row context: J / positions / impedances / regularizers from an
    earlier evaluation, with only the velocity part of aref recomputed
    — the row-assembly amortization for RK4 models whose 16 dynamics
    evaluations per control step dominate (step.py threads it)."""
    a0 = spd_solve(m, qfrc_minus_bias)
    if ctx is None:
        ctx = constraint_rows(model, data, cdof, qpos, qvel)
    j, aref_pos, b_row, active, r, lo, hi, soc_mu, slot_ids = ctx
    if warm is None:
        lam0 = jnp.zeros(j.shape[:1], a0.dtype)
    else:
        lam_prev, ids_prev = warm
        lam0 = jnp.where(slot_ids == ids_prev, lam_prev, 0.0)
    if j.shape[0] == 0:
        return a0, a0, (lam0, slot_ids), ctx
    # primal Newton option (Model.newton_iters > 0, pyramidal only):
    # MuJoCo-grade convergence for contact-rich many-row models (the
    # Adroit class); the impulse warm start is unnecessary — Newton
    # reconverges from a0 quadratically — but lam is still returned in
    # the warm format so step_n's carry stays uniform
    if model.newton_iters and model.cone != ELLIPTIC:
        aref_n = aref_pos - b_row * (j @ qvel)
        qacc, lam = solve_qacc_newton(m, a0, j, aref_n, active, r, lo, hi,
                                      iters=model.newton_iters)
        if model.noslip_iters:
            qacc = noslip_qacc(model, m, j, aref_n, lam, lo, hi, qacc)
        return qacc, a0, (lam, slot_ids), ctx
    # elliptic cone: static block layout + the per-contact mu data ride
    # the frozen ctx (soc_mu has zero length on pyramidal models)
    soc = None
    sw = SWEEPS if sweeps is None else sweeps
    if model.cone == ELLIPTIC and soc_mu.shape[0]:
        st, K = _soc_layout(model)
        soc = (st, K, soc_mu)
        # the cone-coupled dual converges ~4x slower than the pyramidal
        # facet LCP (measured: walker2d 6-deep-contact states need 200
        # sweeps for <3e-4 vs MuJoCo; 50 suffice for pyramidal) — the
        # slowdown matches MuJoCo's own pyramidal-vs-elliptic guidance
        sw = 4 * sw
    aref = aref_pos - b_row * (j @ qvel)
    qacc, lam = solve_qacc(m, a0, j, aref, active, r, lam0,
                           sweeps=sw, lo=lo, hi=hi, soc=soc)
    if model.noslip_iters and model.cone != ELLIPTIC:
        qacc = noslip_qacc(model, m, j, aref, lam, lo, hi, qacc)
    return qacc, a0, (lam, slot_ids), ctx
