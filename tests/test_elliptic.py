"""Elliptic friction cone (<option cone="elliptic">) vs live MuJoCo 3.10.

The implicit solver emits 3 rows per friction contact [n, t1, t2]
sharing the normal row's impedance/regularizer, and the APGD dual
projects each triple onto the second-order cone mu*lam_n >= |lam_t|
(solver.py solve_qacc ``soc``).  Reference boundary being replaced:
/root/reference/mjrl/envs/mujoco_env.py:11-15 (MuJoCo owns the whole
cone machinery there; cone type is a model option the reference
inherits for free).
"""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mjrl_tpu.physics.mjcf import load_mjcf
from mjrl_tpu.physics.model import ELLIPTIC, State
from mjrl_tpu.physics.step import qacc_smooth, step_n


def _asset(name):
    import gymnasium
    return os.path.join(os.path.dirname(gymnasium.__file__),
                        "envs/mujoco/assets", name + ".xml")


def _mujoco_elliptic(name):
    mujoco = pytest.importorskip("mujoco")
    xml = open(_asset(name)).read().replace(
        "<option", '<option cone="elliptic" ', 1)
    mm = mujoco.MjModel.from_xml_string(xml)
    assert mm.opt.cone == mujoco.mjtCone.mjCONE_ELLIPTIC
    return mujoco, mm, mujoco.MjData(mm)


def _our_elliptic(name):
    b = load_mjcf(_asset(name))
    b.opt["cone"] = ELLIPTIC
    model = b.finalize(jnp.float64, solver="newton")
    assert model.cone == ELLIPTIC
    return model


@pytest.mark.parametrize("name,drop", [("hopper", 0.5), ("walker2d", 0.5),
                                       ("half_cheetah", 0.35)])
def test_elliptic_qacc_matches_mujoco(name, drop):
    """Contact-active constrained qacc under the elliptic cone matches
    mj_forward with <option cone="elliptic">."""
    mujoco, mm, md = _mujoco_elliptic(name)
    model = _our_elliptic(name)
    ours = jax.jit(lambda q, v, u: qacc_smooth(
        model, State(qpos=q, qvel=v), u))
    rng = np.random.RandomState(3)
    errs = []
    for _ in range(6):
        qpos = mm.qpos0.copy() + rng.uniform(-0.15, 0.15, mm.nq)
        qpos[1] -= drop
        qvel = rng.uniform(-1.0, 1.0, mm.nv)
        ctrl = rng.uniform(-1.0, 1.0, mm.nu)
        md.qpos[:] = qpos
        md.qvel[:] = qvel
        md.ctrl[:] = ctrl
        mujoco.mj_forward(mm, md)
        a = np.asarray(ours(jnp.asarray(qpos), jnp.asarray(qvel),
                            jnp.asarray(ctrl)))
        scale = max(np.abs(md.qacc).max(), 1.0)
        errs.append(np.abs(a - md.qacc).max() / scale)
    assert np.median(errs) < 5e-3, (name, np.median(errs), sorted(errs))


def test_elliptic_control_step_matches_mujoco():
    """Full frame_skip control steps (warm-started substeps) track
    mj_step under the elliptic cone on hopper."""
    mujoco, mm, md = _mujoco_elliptic("hopper")
    model = _our_elliptic("hopper")
    frame_skip = 4
    step = jax.jit(lambda q, v, u: step_n(
        model, State(qpos=q, qvel=v), u, frame_skip))
    rng = np.random.RandomState(11)
    qerrs = []
    for _ in range(5):
        qpos = mm.qpos0.copy() + rng.uniform(-0.1, 0.1, mm.nq)
        qpos[1] -= 0.35            # grazing/contact-active start
        qvel = rng.uniform(-0.5, 0.5, mm.nv)
        ctrl = rng.uniform(-1.0, 1.0, mm.nu)
        md.qpos[:] = qpos
        md.qvel[:] = qvel
        md.ctrl[:] = ctrl
        for _ in range(frame_skip):
            mujoco.mj_step(mm, md)
        out = step(jnp.asarray(qpos), jnp.asarray(qvel), jnp.asarray(ctrl))
        qerrs.append(np.abs(np.asarray(out.qpos) - md.qpos).max())
    assert np.median(qerrs) < 5e-3, (np.median(qerrs), sorted(qerrs))


def test_pyramidal_unchanged_by_cone_plumbing():
    """Default models keep cone=PYRAMIDAL and the 4-facet row count."""
    from mjrl_tpu.physics.solver import n_constraint_rows
    b = load_mjcf(_asset("hopper"))
    pyr = b.finalize(jnp.float64, solver="newton")
    assert pyr.cone == 0
    b2 = load_mjcf(_asset("hopper"))
    b2.opt["cone"] = ELLIPTIC
    ell = b2.finalize(jnp.float64, solver="newton")
    # same model, one fewer row per friction contact
    n_f = (n_constraint_rows(pyr) - n_constraint_rows(ell))
    assert n_f > 0 and n_f % 1 == 0


# ---------------------------------------------------------------------------
# planar fast path under the elliptic cone (round 3): the planar dual
# emits the same [n(K), t1(K), t2(K)] triple block as the 3D engine
# (t2, the out-of-plane tangent, is a structurally zero row kept so the
# shared tangent preconditioner scale matches), and both the stacked and
# component solvers project triples onto the second-order cone.
# ---------------------------------------------------------------------------

def test_elliptic_planar_qacc_matches_general_engine():
    """Cold constrained qacc: planar stacked dual vs the 3D implicit
    engine on contact-active hopper states, cone=elliptic."""
    from mjrl_tpu.physics.planar import (extract_planar, _contact_qacc,
                                         n_planar_rows)
    from mjrl_tpu.physics.solver import SWEEPS
    model = _our_elliptic("hopper")
    p = extract_planar(model)
    assert p is not None and p.cone == ELLIPTIC
    lam0 = jnp.zeros((n_planar_rows(p),), jnp.float64)
    fast = jax.jit(lambda q, v, u: _contact_qacc(p, q, v, u, lam0,
                                                 SWEEPS)[0])
    gen = jax.jit(lambda q, v, u: qacc_smooth(
        model, State(qpos=q, qvel=v), u))
    rng = np.random.RandomState(5)
    for drop in (0.0, 0.6):
        errs = []
        for _ in range(6):
            qpos = np.array(np.asarray(model.qpos0), np.float64)
            qpos += rng.uniform(-0.15, 0.15, model.nq)
            qpos[1] -= drop
            qvel = rng.uniform(-1.0, 1.0, model.nv)
            ctrl = rng.uniform(-1.0, 1.0, model.nu)
            a = np.asarray(fast(jnp.asarray(qpos), jnp.asarray(qvel),
                                jnp.asarray(ctrl)))
            b2 = np.asarray(gen(jnp.asarray(qpos), jnp.asarray(qvel),
                                jnp.asarray(ctrl)))
            scale = max(np.abs(b2).max(), 1.0)
            errs.append(np.abs(a - b2).max() / scale)
        assert np.median(errs) < 5e-3, (drop, np.median(errs),
                                        sorted(errs))


def test_elliptic_planar_control_step_matches_mujoco():
    """Full frame_skip control steps through the PLANAR fast path track
    mj_step under <option cone="elliptic"> on hopper."""
    from mjrl_tpu.physics.planar import extract_planar, step_n_arrays
    mujoco, mm, md = _mujoco_elliptic("hopper")
    model = _our_elliptic("hopper")
    p = extract_planar(model)
    assert p is not None and p.cone == ELLIPTIC
    frame_skip = 4
    step = jax.jit(lambda q, v, u: step_n_arrays(p, q, v, u, frame_skip))
    rng = np.random.RandomState(11)
    qerrs = []
    for _ in range(5):
        qpos = mm.qpos0.copy() + rng.uniform(-0.1, 0.1, mm.nq)
        qpos[1] -= 0.35
        qvel = rng.uniform(-0.5, 0.5, mm.nv)
        ctrl = rng.uniform(-1.0, 1.0, mm.nu)
        md.qpos[:] = qpos
        md.qvel[:] = qvel
        md.ctrl[:] = ctrl
        for _ in range(frame_skip):
            mujoco.mj_step(mm, md)
        q2, _ = step(jnp.asarray(qpos), jnp.asarray(qvel),
                     jnp.asarray(ctrl))
        qerrs.append(np.abs(np.asarray(q2) - md.qpos).max())
    assert np.median(qerrs) < 5e-3, (np.median(qerrs), sorted(qerrs))


def test_elliptic_planar_comp_matches_stacked():
    """Component-form elliptic contact step (the shared Pallas kernel
    body) agrees with the stacked planar dual to machine precision."""
    from mjrl_tpu.physics.planar import (extract_planar,
                                         planar_contact_step_n,
                                         planar_contact_step_n_comp)
    model = _our_elliptic("hopper")
    p = extract_planar(model)
    nv, nu = p.nv, len(p.actuators)
    rng = np.random.RandomState(7)
    B = 4
    q = np.tile(np.asarray(model.qpos0, np.float64), (B, 1))
    q += rng.uniform(-0.12, 0.12, (B, nv))
    q[:, 1] -= 0.4
    v = rng.uniform(-0.8, 0.8, (B, nv))
    u = rng.uniform(-1.0, 1.0, (B, nu))

    stacked = jax.jit(jax.vmap(
        lambda qq, vv, uu: planar_contact_step_n(p, qq, vv, uu, 1)))

    def comp_fn(qq, vv, uu):
        ql = [qq[:, d] for d in range(nv)]
        vl = [vv[:, d] for d in range(nv)]
        ul = [uu[:, i] for i in range(nu)]
        q2, v2 = planar_contact_step_n_comp(p, ql, vl, ul, 1)
        return jnp.stack(q2, -1), jnp.stack(v2, -1)

    qa, va = stacked(jnp.asarray(q), jnp.asarray(v), jnp.asarray(u))
    qb, vb = jax.jit(comp_fn)(jnp.asarray(q), jnp.asarray(v),
                              jnp.asarray(u))
    np.testing.assert_allclose(np.asarray(qb), np.asarray(qa),
                               rtol=1e-10, atol=1e-10)
    np.testing.assert_allclose(np.asarray(vb), np.asarray(va),
                               rtol=1e-9, atol=1e-9)
