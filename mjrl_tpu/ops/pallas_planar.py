"""Pallas whole-substep kernel for planar-chain envs (ROADMAP item 3).

The planar fast path (physics/planar.py) still executes as hundreds of
separate fused VPU kernels per control step under XLA; the remaining
overhead is per-kernel fixed cost.  This module compiles the ENTIRE
frame_skip x substep chain into ONE Pallas kernel per control step:

- batch layout is LANE-MINOR: every physics component is an (8, 128)
  f32 tile of 1024 envs (the VPU's native register shape), so each of
  the ~2k elementwise ops in the chain is exactly one full-utilization
  VPU op — no lane padding, no kernel boundaries;
- physics/planar.py's component-style code is reused VERBATIM inside
  the kernel (it is shape-agnostic by design);
- the policy matmul stays outside in XLA (MXU-friendly batch-major
  layout); only the physics transposes in/out, (B, nv) <-> (nv, ..., 128)
  at ~100 KB per control step.

``rollout_batch_planar`` mirrors samplers/rollout.rollout_batch for the
non-terminating, non-autoreset case (the mjrl suite's envs).  RNG note:
action noise is drawn per (step, batch) from one key per step instead of
per-trajectory key chains — statistically equivalent, different stream.
"""

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mjrl_tpu.physics.model import State
from mjrl_tpu.physics.planar import PlanarParams, planar_step_n

_TILE_ENVS = 1024          # (8, 128) f32 tile


def _kernel(p: PlanarParams, n: int, nu: int, q_ref, v_ref, u_ref,
            qo_ref, vo_ref):
    q = [q_ref[d] for d in range(p.nv)]
    v = [v_ref[d] for d in range(p.nv)]
    u = [u_ref[i] for i in range(nu)]
    q2, v2 = planar_step_n(p, q, v, u, n)
    for d in range(p.nv):
        qo_ref[d] = q2[d]
        vo_ref[d] = v2[d]


def pallas_step_n_batched(p: PlanarParams, qpos, qvel, ctrl, n: int):
    """(B, nv), (B, nv), (B, nu) -> stepped (B, nv) x2, one fused kernel
    per 1024-env tile.  B must be a multiple of 1024."""
    B, nv = qpos.shape
    nu = ctrl.shape[1]
    assert B % _TILE_ENVS == 0, f"batch {B} not a multiple of {_TILE_ENVS}"
    rows = B // 128

    def to_tiles(x, width):
        # (B, w) -> (w, rows, 128)
        return x.T.reshape(width, rows, 128)

    def from_tiles(x, width):
        return x.reshape(width, B).T

    qt = to_tiles(qpos, nv)
    vt = to_tiles(qvel, nv)
    ut = to_tiles(ctrl, nu)

    grid = (rows // 8,)
    spec = lambda w: pl.BlockSpec((w, 8, 128), lambda i: (0, i, 0),
                                  memory_space=pltpu.VMEM)
    qo, vo = pl.pallas_call(
        lambda q_ref, v_ref, u_ref, qo_ref, vo_ref: _kernel(
            p, n, nu, q_ref, v_ref, u_ref, qo_ref, vo_ref),
        out_shape=(jax.ShapeDtypeStruct((nv, rows, 128), qpos.dtype),
                   jax.ShapeDtypeStruct((nv, rows, 128), qpos.dtype)),
        grid=grid,
        in_specs=[spec(nv), spec(nv), spec(nu)],
        out_specs=(spec(nv), spec(nv)),
    )(qt, vt, ut)
    return from_tiles(qo, nv), from_tiles(vo, nv)


def rollout_batch_planar(env, policy, params, transforms, key, num_traj,
                         horizon=None, eval_mode=False):
    """rollout_batch for planar non-terminating envs with the physics in
    one Pallas kernel per control step.  Same output dict schema as
    samplers/rollout.rollout_batch (non-autoreset)."""
    p = env._planar
    assert p is not None, "env has no planar fast path"
    T = env.horizon if horizon is None else min(int(horizon), env.horizon)
    B = num_traj

    k_reset, k_scan = jax.random.split(key)
    s0 = jax.vmap(env.reset)(jax.random.split(k_reset, B))

    def step_fn(s, kt):
        mean, log_std = policy.dist_info(params, transforms, s.obs)
        if eval_mode:
            action = mean
        else:
            noise = jax.random.normal(kt, mean.shape, mean.dtype)
            action = mean + jnp.exp(log_std) * noise
        qpos, qvel = pallas_step_n_batched(
            p, s.physics.qpos, s.physics.qvel, action, env.frame_skip)
        physics = State(qpos=qpos, qvel=qvel)
        obs = jax.vmap(lambda sc, ph: env._obs(None, sc, ph))(
            s.scenery, physics)
        reward = jax.vmap(env._reward)(obs, action, s, physics)
        info = jax.vmap(env._info)(obs, reward)
        ns = s.replace(physics=physics, obs=obs, reward=reward, info=info,
                       t=s.t + 1)
        out = dict(
            observations=s.obs,
            actions=action,
            rewards=reward,
            agent_mean=mean,
            agent_log_std=jnp.broadcast_to(log_std, mean.shape),
            mask=jnp.ones((B,), s.obs.dtype),
            env_infos=info,
        )
        return ns, out

    step_keys = jax.random.split(k_scan, T)
    last, outs = jax.lax.scan(step_fn, s0, step_keys)
    # (T, B, ...) -> (B, T, ...)
    outs = jax.tree_util.tree_map(lambda x: jnp.swapaxes(x, 0, 1), outs)
    outs["terminated"] = jnp.zeros((B,), bool)
    outs["last_obs"] = last.obs
    return outs
