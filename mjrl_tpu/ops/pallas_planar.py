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

from mjrl_tpu.physics.model import EULER, State
from mjrl_tpu.physics.planar import (PlanarParams,
                                     planar_contact_step_n_comp,
                                     planar_step_n)

_TILE_ENVS = 1024          # (8, 128) f32 tile


def _needs_contact_path(p: PlanarParams) -> bool:
    return bool(p.contacts_pt or p.contacts_cc or p.integrator != EULER)


def _kernel(p: PlanarParams, n: int, nu: int, q_ref, v_ref, u_ref,
            qo_ref, vo_ref):
    q = [q_ref[d] for d in range(p.nv)]
    v = [v_ref[d] for d in range(p.nv)]
    u = [u_ref[i] for i in range(nu)]
    if _needs_contact_path(p):
        # contact/RK4 models (hopper/walker2d/half_cheetah): the full
        # warm-started APGD dual solve runs on (8, 128) tiles inside
        # the kernel (physics/planar.planar_contact_step_n_comp)
        q2, v2 = planar_contact_step_n_comp(p, q, v, u, n)
    else:
        q2, v2 = planar_step_n(p, q, v, u, n)
    for d in range(p.nv):
        qo_ref[d] = q2[d]
        vo_ref[d] = v2[d]


def pallas_step_n_batched(p: PlanarParams, qpos, qvel, ctrl, n: int,
                          sublanes: int = 8):
    """(B, nv), (B, nv), (B, nu) -> stepped (B, nv) x2, one fused kernel
    per (sublanes*128)-env tile.  B must be a multiple of 1024."""
    B, nv = qpos.shape
    nu = ctrl.shape[1]
    assert B % _TILE_ENVS == 0, f"batch {B} not a multiple of {_TILE_ENVS}"
    rows = B // 128
    if rows % sublanes:
        sublanes = 8

    def to_tiles(x, width):
        # (B, w) -> (w, rows, 128)
        return x.T.reshape(width, rows, 128)

    def from_tiles(x, width):
        return x.reshape(width, B).T

    qt = to_tiles(qpos, nv)
    vt = to_tiles(qvel, nv)
    ut = to_tiles(ctrl, nu)

    grid = (rows // sublanes,)
    spec = lambda w: pl.BlockSpec((w, sublanes, 128),
                                  lambda i: (0, i, 0),
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
    """rollout_batch for planar envs with the physics in one Pallas
    kernel per control step.  Same output dict schema as
    samplers/rollout.rollout_batch (non-autoreset), including the
    freeze-after-done mask machinery for early-terminating envs
    (Hopper/Walker2d-style healthy checks)."""
    from mjrl_tpu.samplers.rollout import _never_terminates

    p = env._planar
    assert p is not None, "env has no planar fast path"
    T = env.horizon if horizon is None else min(int(horizon), env.horizon)
    B = num_traj
    terminating = not _never_terminates(env)

    k_reset, k_scan = jax.random.split(key)
    s0 = jax.vmap(env.reset)(jax.random.split(k_reset, B))

    def step_fn(carry, kt):
        s, alive = carry
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
        if terminating:
            done = jax.vmap(env._done)(obs, physics)
            # freeze the env after termination (rollout.py one_path):
            # padded tail steps stay at the terminal state
            ns = jax.tree_util.tree_map(
                lambda new, old: jnp.where(
                    alive.reshape((B,) + (1,) * (new.ndim - 1)) > 0,
                    new, old), ns, s)
            out_rewards = ns.reward * alive
            mask = alive
            next_alive = alive * (1.0 - done.astype(alive.dtype))
        else:
            out_rewards = reward
            mask = jnp.ones((B,), s.obs.dtype)
            next_alive = alive
        out = dict(
            observations=s.obs,
            actions=action,
            rewards=out_rewards,
            agent_mean=mean,
            agent_log_std=jnp.broadcast_to(log_std, mean.shape),
            mask=mask,
            env_infos=info,
        )
        return (ns, next_alive), out

    step_keys = jax.random.split(k_scan, T)
    (last, alive), outs = jax.lax.scan(
        step_fn, (s0, jnp.ones((B,), s0.obs.dtype)), step_keys)
    # (T, B, ...) -> (B, T, ...)
    outs = jax.tree_util.tree_map(lambda x: jnp.swapaxes(x, 0, 1), outs)
    outs["terminated"] = (alive == 0.0) if terminating \
        else jnp.zeros((B,), bool)
    outs["last_obs"] = last.obs
    return outs
