"""Planar contact/RK4 fast path (physics/planar.py stacked dual) vs the
general implicit engine on the gym locomotion models."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mjrl_tpu.envs.gym_suite import (HalfCheetahEnv, HopperEnv,
                                     Walker2dEnv)
from mjrl_tpu.physics.model import State
from mjrl_tpu.physics.planar import (extract_planar, _contact_qacc,
                                     n_planar_rows, step_n_arrays)
from mjrl_tpu.physics.step import qacc_smooth, step_n


def _mk(cls):
    env = cls(dtype=jnp.float64, solver="newton")
    p = extract_planar(env.model)
    assert p is not None, f"{cls.__name__} must qualify for the planar path"
    return env.model, p


def _rand_states(model, n, seed, drop=0.0):
    """Random states; ``drop`` shifts the root down so floor contacts
    activate."""
    rng = np.random.RandomState(seed)
    for _ in range(n):
        qpos = np.array(np.asarray(model.qpos0), np.float64)
        qpos += rng.uniform(-0.15, 0.15, model.nq)
        qpos[1] -= drop
        qvel = rng.uniform(-1.0, 1.0, model.nv)
        ctrl = rng.uniform(-1.0, 1.0, model.nu)
        yield qpos, qvel, ctrl


@pytest.mark.parametrize("cls", [HopperEnv, Walker2dEnv, HalfCheetahEnv])
def test_contact_qacc_matches_general_engine(cls):
    """Cold constrained qacc agrees with the general implicit solver on
    both contact-free and contact-active states."""
    model, p = _mk(cls)
    from mjrl_tpu.physics.solver import SWEEPS
    lam0 = jnp.zeros((n_planar_rows(p),), jnp.float64)
    fast = jax.jit(lambda q, v, u: _contact_qacc(p, q, v, u, lam0,
                                                 SWEEPS)[0])
    gen = jax.jit(lambda q, v, u: qacc_smooth(
        model, State(qpos=q, qvel=v), u))
    for drop in (0.0, 0.6):        # airborne and floor-penetrating
        errs = []
        for qpos, qvel, ctrl in _rand_states(model, 6, 3, drop=drop):
            a = np.asarray(fast(jnp.asarray(qpos), jnp.asarray(qvel),
                                jnp.asarray(ctrl)))
            b = np.asarray(gen(jnp.asarray(qpos), jnp.asarray(qvel),
                               jnp.asarray(ctrl)))
            scale = max(np.abs(b).max(), 1.0)
            errs.append(np.abs(a - b).max() / scale)
        assert np.median(errs) < 5e-3, (cls.__name__, drop,
                                        np.median(errs), sorted(errs))


@pytest.mark.parametrize("cls", [HopperEnv, Walker2dEnv])
def test_control_step_matches_general_engine(cls):
    """A full frame_skip control step (incl. warm starts) stays close
    to the general engine's step_n."""
    model, p = _mk(cls)
    env = cls(dtype=jnp.float64, solver="newton")
    fast = jax.jit(lambda q, v, u: step_n_arrays(p, q, v, u,
                                                 env.frame_skip))
    gen = jax.jit(lambda q, v, u: step_n(
        model, State(qpos=q, qvel=v), u, env.frame_skip))
    # grazing-contact states (realistic penetration depths: the deep
    # drop=0.6 regime is covered by the single-eval qacc test; over a
    # full warm-started control step both engines are only partially
    # converged there and diverge legitimately)
    qerr, verr = [], []
    for qpos, qvel, ctrl in _rand_states(model, 8, 11, drop=0.05):
        fq, fv = fast(jnp.asarray(qpos), jnp.asarray(qvel),
                      jnp.asarray(ctrl))
        g = gen(jnp.asarray(qpos), jnp.asarray(qvel), jnp.asarray(ctrl))
        qerr.append(np.abs(np.asarray(fq) - np.asarray(g.qpos)).max())
        verr.append(np.abs(np.asarray(fv) - np.asarray(g.qvel)).max())
    # RK4 models: the general engine FREEZES constraint rows across the
    # 16 stage evaluations of a control step (step.py) while the planar
    # path rebuilds them per stage (matching MuJoCo's per-stage forward)
    # — so velocity agreement at contact states is bounded by the
    # general path's own approximation, not by this path's accuracy.
    # test_control_step_matches_mujoco below is the strict gate.
    from mjrl_tpu.physics.model import RK4
    rk4 = model.integrator == RK4
    v_med = 0.25 if rk4 else 5e-2
    assert np.median(qerr) < 2e-3, (cls.__name__, qerr)
    assert max(qerr) < 5e-2, (cls.__name__, qerr)
    assert np.median(verr) < v_med, (cls.__name__, verr)
    if not rk4:        # RK4 max error is the general path's, not ours
        assert max(verr) < 2.0, (cls.__name__, verr)


@pytest.mark.parametrize("cls,asset", [(HopperEnv, "hopper"),
                                       (Walker2dEnv, "walker2d"),
                                       (HalfCheetahEnv, "half_cheetah")])
def test_control_step_matches_mujoco(cls, asset):
    """A full frame_skip control step vs REAL MuJoCo 3.10 (RK4/Euler +
    Newton solver, fresh constraints every stage — exactly what the
    planar path implements)."""
    mujoco = pytest.importorskip("mujoco")
    import gymnasium, os
    path = os.path.join(os.path.dirname(gymnasium.__file__),
                        "envs/mujoco/assets", asset + ".xml")
    mm = mujoco.MjModel.from_xml_path(path)
    md = mujoco.MjData(mm)
    env = cls(dtype=jnp.float64, solver="newton")
    p = extract_planar(env.model)
    fast = jax.jit(lambda q, v, u: step_n_arrays(p, q, v, u,
                                                 env.frame_skip))
    qerr, verr = [], []
    for qpos, qvel, ctrl in _rand_states(env.model, 8, 23, drop=0.05):
        md.qpos[:] = qpos
        md.qvel[:] = qvel
        md.ctrl[:] = ctrl
        for _ in range(env.frame_skip):
            mujoco.mj_step(mm, md)
        fq, fv = fast(jnp.asarray(qpos), jnp.asarray(qvel),
                      jnp.asarray(ctrl))
        qerr.append(np.abs(np.asarray(fq) - md.qpos).max())
        verr.append(np.abs(np.asarray(fv) - md.qvel).max())
    assert np.median(qerr) < 2e-3, (cls.__name__, qerr)
    assert np.median(verr) < 5e-2, (cls.__name__, verr)


def test_walker_settles_on_floor():
    """Zero-ctrl walker dropped from qpos0 comes to rest with feet at
    the floor (no fall-through, no blow-up)."""
    env = Walker2dEnv(dtype=jnp.float64, solver="newton")
    p = extract_planar(env.model)
    qpos = jnp.asarray(np.asarray(env.model.qpos0))
    qvel = jnp.zeros((env.model.nv,), jnp.float64)
    ctrl = jnp.zeros((env.model.nu,), jnp.float64)
    stepper = jax.jit(lambda q, v: step_n_arrays(p, q, v, ctrl,
                                                 env.frame_skip))
    for _ in range(150):
        qpos, qvel = stepper(qpos, qvel)
    z = float(qpos[1])
    assert np.isfinite(np.asarray(qpos)).all()
    assert 0.1 < z < 1.3, z        # above floor, below start


def test_swimmer_path_unchanged():
    """The smooth Euler component path still handles the swimmer (no
    contacts, chain defaults)."""
    from mjrl_tpu.envs.assets import swimmer_model
    m = swimmer_model().finalize(jnp.float64, solver="newton")
    p = extract_planar(m)
    assert p is not None
    assert not p.contacts_pt and not p.contacts_cc
    assert p.parent == (-1, 0, 1, 2, 3)[:p.nbody]
    assert p.slide_dirs == ((1.0, 0.0), (0.0, 1.0))
