"""Pallas planar whole-substep kernel vs the vmapped planar path
(interpret mode on CPU; the real kernel is exercised by bench.py on
TPU)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mjrl_tpu.envs.assets import swimmer_model
from mjrl_tpu.physics.planar import extract_planar, step_n_arrays


@pytest.mark.slow
def test_pallas_step_matches_vmap_interpret():
    from jax.experimental import pallas as pl  # noqa: F401
    import mjrl_tpu.ops.pallas_planar as pp

    m = swimmer_model().finalize(jnp.float32, solver="newton")
    p = extract_planar(m)
    B = 1024
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.uniform(-0.5, 0.5, (B, m.nq)), jnp.float32)
    v = jnp.asarray(rng.uniform(-1.0, 1.0, (B, m.nv)), jnp.float32)
    u = jnp.asarray(rng.uniform(-1.0, 1.0, (B, m.nu)), jnp.float32)

    ref_q, ref_v = jax.vmap(lambda qq, vv, uu: step_n_arrays(
        p, qq, vv, uu, 5))(q, v, u)

    # interpret mode: run the pallas program without TPU lowering
    orig = pp.pl.pallas_call

    def interp_call(*args, **kwargs):
        kwargs["interpret"] = True
        return orig(*args, **kwargs)

    pp.pl.pallas_call = interp_call
    try:
        got_q, got_v = pp.pallas_step_n_batched(p, q, v, u, 5)
    finally:
        pp.pl.pallas_call = orig

    np.testing.assert_allclose(np.asarray(got_q), np.asarray(ref_q),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(got_v), np.asarray(ref_v),
                               rtol=2e-4, atol=2e-4)


def _hopper_states(B, nv, nu, qpos0, seed=0, drop=0.4):
    rng = np.random.RandomState(seed)
    q = np.tile(np.asarray(qpos0, np.float64), (B, 1)) \
        + rng.uniform(-0.15, 0.15, (B, nv))
    q[:, 1] -= drop          # root down: floor contacts active
    v = rng.uniform(-1.0, 1.0, (B, nv))
    u = rng.uniform(-1.0, 1.0, (B, nu))
    return q, v, u


@pytest.mark.slow
def test_contact_comp_matches_stacked():
    """Component-form contact step (the Pallas kernel body) agrees with
    the stacked dual path to machine precision (f64, one substep group:
    the full warm-start chain across substeps is identical code)."""
    from mjrl_tpu.envs.gym_suite import HopperEnv
    from mjrl_tpu.physics.planar import (extract_planar,
                                         planar_contact_step_n,
                                         planar_contact_step_n_comp)

    env = HopperEnv(dtype=jnp.float64, solver="newton")
    p = extract_planar(env.model)
    nv, nu = p.nv, len(p.actuators)
    B = 8
    q, v, u = _hopper_states(B, nv, nu, env.model.qpos0)

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


@pytest.mark.slow
def test_pallas_contact_step_matches_vmap_interpret():
    """Contact/RK4 whole-substep kernel (hopper, floor contacts active)
    vs the vmapped stacked path, interpret mode, f32."""
    import mjrl_tpu.ops.pallas_planar as pp
    from mjrl_tpu.envs.gym_suite import HopperEnv
    from mjrl_tpu.physics.planar import (extract_planar,
                                         planar_contact_step_n)

    env = HopperEnv(dtype=jnp.float32, solver="newton")
    p = extract_planar(env.model)
    nv, nu = p.nv, len(p.actuators)
    B = 1024
    q, v, u = _hopper_states(B, nv, nu, env.model.qpos0, seed=1)
    q, v, u = (jnp.asarray(q, jnp.float32), jnp.asarray(v, jnp.float32),
               jnp.asarray(u, jnp.float32))

    ref_q, ref_v = jax.jit(jax.vmap(
        lambda qq, vv, uu: planar_contact_step_n(p, qq, vv, uu, 1)))(
            q, v, u)

    orig = pp.pl.pallas_call

    def interp_call(*args, **kwargs):
        kwargs["interpret"] = True
        return orig(*args, **kwargs)

    pp.pl.pallas_call = interp_call
    try:
        got_q, got_v = pp.pallas_step_n_batched(p, q, v, u, 1)
    finally:
        pp.pl.pallas_call = orig

    # f32 dual solve: impulses amplify rounding; positions stay tight
    np.testing.assert_allclose(np.asarray(got_q), np.asarray(ref_q),
                               rtol=3e-4, atol=3e-4)
    np.testing.assert_allclose(np.asarray(got_v), np.asarray(ref_v),
                               rtol=3e-3, atol=3e-3)
