"""Implicit (PGS) constraint solver tests.

The key measure: limit-active golden states — skipped by the smooth-path
tests because MuJoCo resolves them with its constraint solver — should
now reproduce MuJoCo's qacc much more closely than the penalty path.
"""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mjrl_tpu.envs.assets import reacher_model, swimmer_model
from mjrl_tpu.physics.model import State
from mjrl_tpu.physics.step import qacc_smooth, step_n

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


def _constrained_states(name):
    path = os.path.join(GOLDEN, f"{name}.npz")
    if not os.path.exists(path):
        pytest.skip(f"no golden {name}")
    g = np.load(path)
    idx = np.where((g["nefc"] > 0) & (g["ncon"] == 0))[0]
    if len(idx) == 0:
        pytest.skip(f"{name}: no limit-active golden states")
    return g, idx


def test_pgs_matches_mujoco_on_limit_active_states():
    g, idx = _constrained_states("reacher_limits")
    builder = reacher_model()
    m_pen = builder.finalize(jnp.float64)
    m_pgs = builder.finalize(jnp.float64, solver="pgs")

    acc_pen = jax.jit(lambda q, v, u: qacc_smooth(
        m_pen, State(qpos=q, qvel=v), u))
    acc_pgs = jax.jit(lambda q, v, u: qacc_smooth(
        m_pgs, State(qpos=q, qvel=v), u))

    err_pen, err_pgs = [], []
    for i in idx[:10]:
        q = jnp.asarray(g["qpos"][i])
        v = jnp.asarray(g["qvel"][i])
        u = jnp.asarray(g["ctrl"][i])
        scale = max(np.abs(g["qacc"][i]).max(), 1.0)
        err_pen.append(np.abs(np.asarray(acc_pen(q, v, u))
                              - g["qacc"][i]).max() / scale)
        err_pgs.append(np.abs(np.asarray(acc_pgs(q, v, u))
                              - g["qacc"][i]).max() / scale)
    # the implicit solver must be far closer to MuJoCo than the penalty
    assert np.median(err_pgs) < 0.05, (err_pgs, err_pen)
    assert np.median(err_pgs) < 0.3 * np.median(err_pen)


def test_pgs_matches_smooth_path_when_inactive():
    """With no active constraints the PGS path must equal the plain
    smooth solve."""
    builder = swimmer_model()
    m_pen = builder.finalize(jnp.float64)
    m_pgs = builder.finalize(jnp.float64, solver="pgs")
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.uniform(-0.5, 0.5, 7))
    v = jnp.asarray(rng.uniform(-0.5, 0.5, 7))
    u = jnp.asarray(rng.uniform(-1, 1, 4))
    a1 = qacc_smooth(m_pen, State(qpos=q, qvel=v), u)
    a2 = qacc_smooth(m_pgs, State(qpos=q, qvel=v), u)
    np.testing.assert_allclose(np.asarray(a1), np.asarray(a2), atol=1e-8)


def test_pgs_hopper_stands():
    """Contact handling through the dual: the hopper must still settle
    upright (qualitative contact behavior preserved)."""
    from mjrl_tpu.physics.mjcf import load_mjcf
    import gymnasium
    xml = os.path.join(os.path.dirname(gymnasium.__file__),
                       "envs/mujoco/assets/hopper.xml")
    model = load_mjcf(xml).finalize(jnp.float64, solver="pgs")
    qpos0 = jnp.asarray(np.asarray(model.qpos0))
    s = State(qpos=qpos0, qvel=jnp.zeros(model.nv))
    out = jax.jit(lambda s: step_n(model, s, jnp.zeros(3), 100))(s)
    z = float(out.qpos[1])
    assert 1.0 < z < 1.3
    assert bool(jnp.all(jnp.isfinite(out.qpos)))


def test_pgs_friction_sliding_sphere_matches_mujoco():
    """A sphere sliding on a plane decelerates until it rolls without
    slipping (MuJoCo: 2.0 -> 1.43 m/s).  The PGS friction rows must drive
    the slip velocity to the same rolling equilibrium."""
    from mjrl_tpu.physics.mjcf import load_mjcf
    g = np.load(os.path.join(GOLDEN, "sliding_sphere.npz"),
                allow_pickle=True)
    model = load_mjcf(xml_string=str(g["xml"])).finalize(jnp.float64,
                                                         solver="pgs")
    qvel0 = jnp.zeros(model.nv).at[0].set(float(g["v0"]))
    s = State(qpos=jnp.asarray(g["qpos0"]), qvel=qvel0)
    out = jax.jit(lambda s: step_n(model, s, jnp.zeros(0),
                                   int(g["steps"])))(s)
    vx = float(out.qvel[0])
    assert abs(vx - float(g["vx_end"])) < 0.15, vx
    # rolling: angular velocity about y matches v/r (r = 0.1)
    wy = float(out.qvel[4])
    assert abs(wy * 0.1 - vx) < 0.1, (wy, vx)


def _contact_golden_models():
    """(name, model) pairs whose golden contact states exist."""
    import gymnasium
    from mjrl_tpu.physics.mjcf import load_mjcf
    from mjrl_tpu.envs.assets import peg_insertion_model
    gympath = os.path.join(os.path.dirname(gymnasium.__file__),
                           "envs/mujoco/assets")
    return [
        ("hopper", lambda: load_mjcf(os.path.join(gympath, "hopper.xml"))
         .finalize(jnp.float64, solver="newton")),
        ("walker2d", lambda: load_mjcf(os.path.join(gympath, "walker2d.xml"))
         .finalize(jnp.float64, solver="newton")),
        ("peg_insertion", lambda: peg_insertion_model().finalize(jnp.float64,
                                                       solver="newton")),
        ("ant", lambda: load_mjcf(os.path.join(gympath, "ant.xml"))
         .finalize(jnp.float64, solver="newton")),
        ("humanoid", lambda: load_mjcf(os.path.join(gympath,
                                                    "humanoid.xml"))
         .finalize(jnp.float64, solver="newton")),
    ]


@pytest.mark.parametrize("name,make_model",
                         _contact_golden_models(),
                         ids=["hopper", "walker2d", "peg_insertion",
                              "ant", "humanoid"])
def test_newton_matches_mujoco_on_contact_states(name, make_model):
    """Contact-active qacc vs MuJoCo goldens (pyramidal/frictionless rows,
    solimp impedance, diagApprox regularization, Newton solve).  The
    round-2 acceptance gate: median relative error <= 2%."""
    path = os.path.join(GOLDEN, f"contact_{name}.npz")
    if not os.path.exists(path):
        pytest.skip(f"no golden contact_{name}")
    g = np.load(path)
    model = make_model()
    acc = jax.jit(lambda q, v, u: qacc_smooth(
        model, State(qpos=q, qvel=v), u))
    errs = []
    for i in range(min(len(g["qpos"]), 25)):
        ours = np.asarray(acc(jnp.asarray(g["qpos"][i]),
                              jnp.asarray(g["qvel"][i]),
                              jnp.asarray(g["ctrl"][i])))
        scale = max(np.abs(g["qacc"][i]).max(), 1.0)
        errs.append(np.abs(ours - g["qacc"][i]).max() / scale)
    errs = np.array(errs)
    assert np.median(errs) < 0.02, (np.median(errs), np.sort(errs)[-5:])
    # humanoid's deep two-leg states once sat at 25-45% error: the
    # narrowphase had no sphere-sphere pair support, so the sphere feet
    # never contacted EACH OTHER (docs/ROADMAP.md item 9, fixed round 3:
    # median 0.4%, p90 9.5%, max 20% on the 40-state golden set).  The
    # residual tail is deep multi-self-contact nonuniqueness; its p90
    # gate keeps 2x headroom over the measured 0.095
    p90_gate = 0.2 if name == "humanoid" else 0.12
    assert np.percentile(errs, 90) < p90_gate, np.sort(errs)[-5:]


def test_contact_topk_matches_full_active_set():
    """The contact_topk active-set cap (solver.py select) must not change
    qacc when fewer than topk contacts are active — peg golden states
    have <~20 simultaneously penetrating candidates out of 474."""
    path = os.path.join(GOLDEN, "contact_peg_insertion.npz")
    if not os.path.exists(path):
        pytest.skip("no golden contact_peg_insertion")
    from mjrl_tpu.envs.assets import peg_insertion_model
    g = np.load(path)
    m_full = peg_insertion_model().finalize(jnp.float64, solver="newton",
                                            contact_topk=0)
    m_topk = peg_insertion_model().finalize(jnp.float64, solver="newton")
    assert m_topk.contact_topk == 64
    acc_f = jax.jit(lambda q, v, u: qacc_smooth(
        m_full, State(qpos=q, qvel=v), u))
    acc_k = jax.jit(lambda q, v, u: qacc_smooth(
        m_topk, State(qpos=q, qvel=v), u))
    for i in range(min(len(g["qpos"]), 8)):
        q, v, u = (jnp.asarray(g["qpos"][i]), jnp.asarray(g["qvel"][i]),
                   jnp.asarray(g["ctrl"][i]))
        full = np.asarray(acc_f(q, v, u))
        topk = np.asarray(acc_k(q, v, u))
        scale = max(np.abs(full).max(), 1.0)
        assert np.abs(full - topk).max() / scale < 5e-3, i


def test_ant_settle_reaches_mujoco_fixed_point():
    """Zero-ctrl ant dropped from qpos0 settles to MuJoCo's exact
    rest state (z = 0.3825, ankles pinned at the 30-degree limit
    +-0.5236 — verified against MuJoCo 3.10 run to |qvel| = 0).
    Regression gate for RK4 row-freeze granularity: freezing contact
    rows across the whole control step injected energy at touchdown
    (bounce to z ~ 2.0) and this equilibrium was never reached."""
    from mjrl_tpu.envs.gym_suite import AntEnv
    env = AntEnv(dtype=jnp.float64, solver="newton")
    model = env.model
    ctrl = jnp.zeros(model.nu, jnp.float64)
    stepper = jax.jit(lambda s: step_n(model, s, ctrl, env.frame_skip))
    s = State(qpos=jnp.asarray(np.asarray(model.qpos0)),
              qvel=jnp.zeros((model.nv,), jnp.float64))
    zmax = 0.0
    for _ in range(300):
        s = stepper(s)
        zmax = max(zmax, float(s.qpos[2]))
    assert zmax < 1.0, zmax            # no touchdown bounce
    assert abs(float(s.qpos[2]) - 0.3825) < 0.01, float(s.qpos[2])
    ankles = np.asarray(s.qpos)[[8, 10, 12, 14]]
    np.testing.assert_allclose(np.abs(ankles), 0.5236, atol=0.01)
    assert float(jnp.abs(s.qvel).max()) < 0.01


def test_peg_frozen_rows_match_live_mujoco_control_steps():
    """The SHIPPED peg-insertion config (row_freeze_step=True: constraint
    rows assembled once per control step, amortizing the 474-pair
    narrowphase across frame_skip x RK4 stages) must still track live
    MuJoCo over FULL control steps — the quasi-static justification in
    envs/peg_insertion.py is gated here, not just asserted.  Measured on
    the golden contact-active states: median qpos err 4.8e-9 / qvel
    1.6e-7 (the freeze is exact wherever contact forces stay constant
    through the step); a few high-velocity arm-swing states legitimately
    diverge (max ~0.85), so the gates are medians, as in
    test_planar_contact.test_control_step_matches_mujoco."""
    mujoco = pytest.importorskip("mujoco")
    path = os.path.join(GOLDEN, "contact_peg_insertion.npz")
    if not os.path.exists(path):
        pytest.skip("no golden contact_peg_insertion")
    from mjrl_tpu.envs.assets import peg_insertion_model
    from mjrl_tpu.envs.peg_insertion import PegEnv

    g = np.load(path)
    mm = mujoco.MjModel.from_xml_path(
        "/root/reference/mjrl/envs/assets/peg_insertion.xml")
    md = mujoco.MjData(mm)
    env = PegEnv(dtype=jnp.float64)          # the shipped config
    assert env.model.row_freeze_step         # gate the config itself
    fs = env.frame_skip
    stepper = jax.jit(lambda q, v, u: step_n(
        env.model, State(qpos=q, qvel=v), u, fs))
    qerr, verr = [], []
    for i in range(len(g["qpos"])):
        q, v, u = g["qpos"][i], g["qvel"][i], g["ctrl"][i]
        md.qpos[:] = q
        md.qvel[:] = v
        md.ctrl[:] = u
        for _ in range(fs):
            mujoco.mj_step(mm, md)
        s = stepper(jnp.asarray(q), jnp.asarray(v), jnp.asarray(u))
        qerr.append(np.abs(np.asarray(s.qpos) - md.qpos).max())
        verr.append(np.abs(np.asarray(s.qvel) - md.qvel).max())
    assert np.median(qerr) < 1e-5, np.sort(qerr)[-5:]
    assert np.median(verr) < 1e-4, np.sort(verr)[-5:]
    # the tail must stay bounded (energy injection would blow past this)
    assert np.percentile(qerr, 75) < 0.2, np.sort(qerr)[-12:]
