"""Planar-chain fast path vs the general 3D engine (physics/planar.py).

The planar path implements the IMPLICIT (MuJoCo soft-constraint) limit
response, so the general-engine comparison runs with solver="newton".
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mjrl_tpu.envs.assets import swimmer_model, point_mass_model
from mjrl_tpu.physics.model import State
from mjrl_tpu.physics.planar import extract_planar, step_n_arrays
from mjrl_tpu.physics.step import step_n


@pytest.fixture(scope="module")
def swimmer64():
    return swimmer_model().finalize(jnp.float64, solver="newton")


def test_extract_planar_swimmer(swimmer64):
    p = extract_planar(swimmer64)
    assert p is not None
    assert p.nv == 7 and p.nbody == 5
    assert len(p.actuators) == 4


def test_extract_planar_rejects_non_chain():
    m = point_mass_model().finalize(jnp.float64, solver="newton")
    # point_mass: 2 slides, no root hinge -> not the supported topology
    assert extract_planar(m) is None


def test_extract_planar_rejects_penalty():
    m = swimmer_model().finalize(jnp.float64)      # penalty default
    assert extract_planar(m) is None


def test_planar_matches_general_engine(swimmer64):
    """Random states (limits mostly inactive): tight agreement."""
    m = swimmer64
    p = extract_planar(m)
    rng = np.random.RandomState(0)
    gen = jax.jit(lambda q, v, u: step_n(m, State(qpos=q, qvel=v), u, 5))
    fast = jax.jit(lambda q, v, u: step_n_arrays(p, q, v, u, 5))
    for i in range(10):
        q = jnp.asarray(rng.uniform(-1.0, 1.0, m.nq))
        v = jnp.asarray(rng.uniform(-2.0, 2.0, m.nv))
        u = jnp.asarray(rng.uniform(-1.5, 1.5, m.nu))
        sg = gen(q, v, u)
        qf, vf = fast(q, v, u)
        np.testing.assert_allclose(np.asarray(qf), np.asarray(sg.qpos),
                                   rtol=1e-6, atol=1e-8)
        np.testing.assert_allclose(np.asarray(vf), np.asarray(sg.qvel),
                                   rtol=1e-6, atol=1e-6)


def test_planar_limit_active_matches_general(swimmer64):
    """Limit-VIOLATING states: the planar Gauss-Seidel dual must agree
    with the general APGD dual (same QP)."""
    m = swimmer64
    p = extract_planar(m)
    rng = np.random.RandomState(1)
    gen = jax.jit(lambda q, v, u: step_n(m, State(qpos=q, qvel=v), u, 1))
    fast = jax.jit(lambda q, v, u: step_n_arrays(p, q, v, u, 1))
    checked = 0
    for i in range(12):
        q = np.zeros(m.nq)
        q[2] = rng.uniform(-3, 3)
        q[3:] = rng.uniform(-1.9, 1.9, 4)       # some beyond +-1.5
        if not (np.abs(q[3:]) > 1.5).any():
            q[3] = 1.7
        v = rng.uniform(-8.0, 8.0, m.nv)
        u = rng.uniform(-1.0, 1.0, m.nu)
        sg = gen(jnp.asarray(q), jnp.asarray(v), jnp.asarray(u))
        qf, vf = fast(jnp.asarray(q), jnp.asarray(v), jnp.asarray(u))
        scale = max(np.abs(np.asarray(sg.qvel)).max(), 1.0)
        assert np.abs(np.asarray(vf) - np.asarray(sg.qvel)).max() / scale \
            < 2e-3, i
        checked += 1
    assert checked == 12


def test_planar_limits_bound_rotation(swimmer64):
    """Driving a hinge hard into its stop: the implicit limit must hold
    the angle near +-1.5 (the penalty path let it reach +-2.4)."""
    m = swimmer64
    p = extract_planar(m)
    q = jnp.zeros(7)
    v = jnp.zeros(7)
    u = jnp.asarray([1.0, 1.0, 1.0, 1.0])       # full torque into stops
    fast = jax.jit(lambda q, v: step_n_arrays(p, q, v, u, 5))
    for t in range(400):
        q, v = fast(q, v)
    angles = np.asarray(q)[3:]
    assert np.isfinite(np.asarray(q)).all()
    assert np.abs(angles).max() < 1.6, angles
