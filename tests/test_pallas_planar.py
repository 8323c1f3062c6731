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
