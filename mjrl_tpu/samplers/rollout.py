"""Batched on-device rollouts: ``vmap(lax.scan(policy ∘ env.step))``.

This module deletes the reference's entire multiprocessing sampling stack
(mjrl/samplers/core.py: mp.Pool fork/pickle/join, per-worker seed fan-out,
timeout-retry fault tolerance at core.py:189-210).  On TPU, thousands of
environment instances step in lockstep on the batch axis; the policy
forward is one batched matmul on the MXU per step; there is no process
boundary, no pickling, and nothing to time out.

Semantics parity:
- ``eval_mode``: actions = distribution mean (the reference's
  agent_info['evaluation'] convention, samplers/core.py:40-46).
- seed fan-out ``base_seed + i`` per trajectory (core.py:52-57) becomes
  ``jax.random.split(key, num_traj)`` — clean key splitting.
- path dict fields (observations, actions, rewards, agent_infos
  {mean, log_std}, env_infos, terminated) as in core.py:85-92, but batched
  and fixed-shape: (num_traj, horizon, ...) with a validity ``mask`` for
  early-terminating envs (mask stays 1 everywhere for the mjrl suite,
  whose envs never terminate early).
- ``sample_mode='samples'``: enough trajectories to reach ``num_samples``
  steps (core.py:151-186 semantics with fixed-shape batching).

The returned ``paths`` is a plain dict pytree, jit-transparent; use
``paths_to_list`` at the host boundary for the reference's list-of-dicts
format.
"""

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np



from mjrl_tpu.physics.model import EULER


def _never_terminates(env):
    """True when the env uses the base no-termination _done (the Pallas
    planar rollout has no freeze/mask machinery)."""
    from mjrl_tpu.envs.base import MujocoLikeEnv
    return type(env)._done is MujocoLikeEnv._done


def pallas_eligible(env, num_traj, mesh=None, autoreset=False,
                    backend=None):
    """Dispatch rule for the Pallas whole-substep planar kernel.

    The kernel owns its own (8, 128) env tiling, so it composes with
    neither mesh sharding (GSPMD can't partition inside a pallas_call's
    grid) nor autoreset/termination masks; under a mesh the rollout
    always takes the shardable vmap path (pinned by
    tests/test_parallel.py::test_pallas_dispatch_requires_no_mesh)."""
    planar = getattr(env, "_planar", None)
    backend = backend or jax.default_backend()
    return (mesh is None and not autoreset
            and planar is not None
            and not planar.contacts_pt and not planar.contacts_cc
            and planar.integrator == EULER
            and num_traj % 1024 == 0
            and backend not in ("cpu",)
            and _never_terminates(env))


def rollout_batch(env, policy, params, transforms, key, num_traj,
                  horizon=None, eval_mode=False, mesh=None,
                  autoreset=False):
    """Collect ``num_traj`` fixed-length paths fully on device.

    env: functional env; policy: GaussianMLP config; params/transforms:
    policy pytrees; key: PRNGKey.

    With ``autoreset`` (for early-terminating envs in 'samples' mode),
    the env resets inside the scan at episode ends, so every grid cell is
    a valid sample; episode boundaries are recorded in ``dones`` and the
    done-aware return/GAE scans (ops.gae.*_with_dones) consume them.
    Without it, paths are single episodes padded with a validity mask.

    Returns a dict pytree with leaves of shape (num_traj, T, ...).
    """
    T = env.horizon if horizon is None else min(int(horizon), env.horizon)

    # smooth planar envs at kernel-friendly batch sizes take the Pallas
    # whole-substep path (3x measured over vmap: 38M vs 13M swimmer
    # control-steps/s on one chip) — same output schema, noise drawn per
    # (step, batch) instead of per-trajectory key chains.  Contact/RK4
    # planar models deliberately stay on the vmapped stacked path: the
    # Pallas contact kernel (ops/pallas_planar.py, fully validated)
    # measured NO-GO for throughput — 1.52M vs 1.61M hopper
    # control-steps/s at 4096 envs — because the warm-started APGD dual
    # is matvec-dominated and the stacked path's dot_generals use the
    # MXU while in-kernel unrolled component math cannot.
    if pallas_eligible(env, num_traj, mesh=mesh, autoreset=autoreset):
        from mjrl_tpu.ops.pallas_planar import rollout_batch_planar
        return rollout_batch_planar(env, policy, params, transforms, key,
                                    num_traj, horizon=T,
                                    eval_mode=eval_mode)

    def one_path(k):
        k_reset, k_scan = jax.random.split(k)
        s0 = env.reset(k_reset)

        def step_fn(carry, kt):
            s, alive = carry
            mean, log_std = policy.dist_info(params, transforms, s.obs)
            if eval_mode:
                action = mean
            else:
                noise = jax.random.normal(kt, mean.shape, mean.dtype)
                action = mean + jnp.exp(log_std) * noise
            ns = env.step(s, action)
            if autoreset:
                done = ns.done
                fresh = env.reset(jax.random.fold_in(kt, 1))
                next_s = jax.tree_util.tree_map(
                    lambda a, b: jnp.where(done, a, b), fresh, ns)
                out = dict(
                    observations=s.obs,
                    actions=action,
                    rewards=ns.reward,
                    agent_mean=mean,
                    agent_log_std=jnp.broadcast_to(log_std, mean.shape),
                    mask=jnp.ones((), s.obs.dtype),
                    dones=done.astype(s.obs.dtype),
                    env_infos={k2: v for k2, v in ns.info.items()},
                )
                return (next_s, alive), out
            # freeze the env after termination: keeps padded tail steps
            # numerically safe (no NaNs from post-terminal physics)
            ns = jax.tree_util.tree_map(
                lambda new, old: jnp.where(alive > 0, new, old), ns, s)
            out = dict(
                observations=s.obs,
                actions=action,
                rewards=ns.reward * alive,
                agent_mean=mean,
                agent_log_std=jnp.broadcast_to(log_std, mean.shape),
                mask=alive,
                env_infos={k2: v for k2, v in ns.info.items()},
            )
            next_alive = alive * (1.0 - ns.done.astype(alive.dtype))
            return (ns, next_alive), out

        step_keys = jax.random.split(k_scan, T)
        (last, alive), outs = jax.lax.scan(
            step_fn, (s0, jnp.ones((), s0.obs.dtype)), step_keys)
        # terminated = episode ended by env before the horizon ran out
        outs["terminated"] = (outs["dones"][-1] > 0) if autoreset \
            else (alive == 0.0)
        outs["last_obs"] = last.obs
        return outs

    keys = jax.random.split(key, num_traj)
    if mesh is not None:
        from mjrl_tpu.parallel.mesh import shard_rollout_keys
        keys = shard_rollout_keys(keys, mesh)
    return jax.vmap(one_path)(keys)


def num_traj_for_samples(num_samples, horizon):
    """'samples' mode accounting: enough fixed-length paths to cover
    num_samples steps (core.py:151-186)."""
    return max(1, math.ceil(num_samples / horizon))


# jitted-rollout cache for the host parity APIs: one traced callable per
# (env, policy-config, shape) so repeated eval calls (train_agent.py runs
# one per iteration) never re-trace.  Keys hold strong refs to env/cfg so
# id() cannot be reused by a collected object; the cache is tiny (a
# handful of envs/policies per process).
_ROLLOUT_CACHE = {}


def _cached_rollout(env, cfg, num_traj, horizon, eval_mode,
                    autoreset=False):
    key = (id(env), id(cfg), int(num_traj), int(horizon), bool(eval_mode),
           bool(autoreset))
    hit = _ROLLOUT_CACHE.get(key)
    if hit is None:
        fn = jax.jit(partial(rollout_batch, env, cfg,
                             num_traj=int(num_traj), horizon=int(horizon),
                             eval_mode=bool(eval_mode),
                             autoreset=bool(autoreset)))
        hit = _ROLLOUT_CACHE[key] = (fn, env, cfg)
    return hit[0]


def _functional_env(env):
    """Accept either a functional env or a GymEnv wrapper (reference
    sample_paths takes the wrapper — samplers/core.py:99)."""
    if hasattr(env, "env") and hasattr(env.env, "reset"):
        return env.env
    return env


def sample_paths(num_traj, env, policy, eval_mode=False, horizon=1e6,
                 base_seed=None, num_cpu=1, key=None, **kwargs):
    """Host-facing parity API (samplers/core.py:99-111) -> list of path
    dicts.  ``num_cpu`` is accepted and ignored — batching replaces
    process parallelism."""
    if key is None:
        key = jax.random.PRNGKey(0 if base_seed is None else int(base_seed))
    env = _functional_env(env)
    params, transforms, cfg = _policy_parts(policy)
    T = env.horizon if horizon is None or horizon >= 1e6 else int(horizon)
    batch = _cached_rollout(env, cfg, num_traj, T, eval_mode)(
        params, transforms, key)
    return paths_to_list(batch)


def sample_data_batch(num_samples, env, policy, eval_mode=False, horizon=1e6,
                      base_seed=None, num_cpu=1, key=None, paths_per_call=None,
                      **kwargs):
    """'samples' mode parity API (samplers/core.py:151-161).

    Matches the reference's accounting exactly: keep collecting
    fixed-size batches until the total number of VALID steps reaches
    ``num_samples`` (core.py:173-177 loops with seed += 12345 per call).
    For non-terminating envs one batch suffices; with early termination
    (and autoreset off) masked-out padding cells don't count, so extra
    batches of the same shape run through the already-compiled rollout.
    """
    if key is None:
        key = jax.random.PRNGKey(0 if base_seed is None else int(base_seed))
    T = env.horizon if horizon is None or horizon >= 1e6 else int(horizon)
    n = num_traj_for_samples(int(num_samples), T)
    paths, total = [], 0
    for call in range(100):  # safety bound (reference loops unboundedly)
        batch = sample_paths(n, env, policy, eval_mode, T,
                             key=jax.random.fold_in(key, call))
        paths += batch
        total += sum(p["rewards"].shape[0] for p in batch)
        if total >= num_samples:
            break
    return paths


def _policy_parts(policy):
    """Accept either a stateful Policy wrapper or a (cfg, params,
    transforms) tuple."""
    from mjrl_tpu.models.policies import Policy
    if isinstance(policy, Policy):
        return policy.params, policy.transforms, policy.config
    cfg, params, transforms = policy
    return params, transforms, cfg


def paths_to_list(batch):
    """Batched paths pytree -> reference-format list of per-path dicts
    (numpy), truncated to each path's valid length.

    Autoreset batches (carrying a ``dones`` grid) are split on episode
    boundaries so every returned dict is ONE episode with a correct
    ``terminated`` flag — a grid row may contain several episodes plus a
    truncated tail."""
    batch = jax.tree_util.tree_map(np.asarray, batch)
    n = batch["rewards"].shape[0]
    autoreset = "dones" in batch
    out = []

    def slice_path(i, lo, hi, terminated):
        agent_infos = {
            "mean": batch["agent_mean"][i][lo:hi],
            "log_std": batch["agent_log_std"][i][0],
            "evaluation": batch["agent_mean"][i][lo:hi],
        }
        env_infos = {k: v[i][lo:hi] for k, v in batch["env_infos"].items()}
        return dict(
            observations=batch["observations"][i][lo:hi],
            actions=batch["actions"][i][lo:hi],
            rewards=batch["rewards"][i][lo:hi],
            agent_infos=agent_infos,
            env_infos=env_infos,
            terminated=bool(terminated),
        )

    for i in range(n):
        if autoreset:
            dones = batch["dones"][i]
            ends = np.flatnonzero(dones > 0)
            lo = 0
            for e in ends:
                out.append(slice_path(i, lo, int(e) + 1, True))
                lo = int(e) + 1
            if lo < dones.shape[0]:        # truncated trailing episode
                out.append(slice_path(i, lo, dones.shape[0], False))
        else:
            T = int(batch["mask"][i].sum())
            out.append(slice_path(i, 0, T, batch["terminated"][i]))
    return out
