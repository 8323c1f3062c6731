"""Structured checkpointing of full training state with orbax.

The reference's checkpointing is pickle-per-object and loses optimizer
and RNG state (train_agent.py:89-90, 123-131); the pickle path is kept
for API parity (utils/train_agent.py here), and this module adds the
TPU-native alternative: one orbax checkpoint holding the entire train
state pytree — policy params (new+old) + transforms, baseline state,
optimizer state, agent RNG key, running score, and iteration cursor —
restorable across processes and hosts.

    save_agent_checkpoint(dir, agent, iteration)
    iteration = restore_agent_checkpoint(dir, agent)

Also exposes ``enable_compilation_cache()`` — persistent jit-compilation
caching, which turns the multi-minute first-compile of long-horizon
rollouts into a one-time cost per machine.
"""

import os

import jax
import numpy as np


def enable_compilation_cache(path=None):
    """Persistent XLA compilation cache (safe to call repeatedly)."""
    path = path or os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                  os.path.expanduser("~/.mjrl_tpu_cache"))
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass
    return path


def _agent_state(agent, iteration):
    state = dict(
        policy_params=agent.policy.params,
        policy_old_params=agent.policy.old_params,
        policy_transforms=agent.policy.transforms,
        baseline_state=agent.baseline.state,
        rng_key=jax.random.key_data(agent.key)
        if hasattr(jax.random, "key_data") else np.asarray(agent.key),
        running_score=np.asarray(agent.running_score
                                 if agent.running_score is not None
                                 else np.nan),
        iteration=np.asarray(iteration),
    )
    if hasattr(agent, "opt_state"):
        state["opt_state"] = agent.opt_state
    return state


def save_agent_checkpoint(ckpt_dir, agent, iteration):
    import orbax.checkpoint as ocp
    ckpt_dir = os.path.abspath(ckpt_dir)
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(os.path.join(ckpt_dir, f"state_{iteration}"),
                   _agent_state(agent, iteration), force=True)
    return ckpt_dir


def latest_checkpoint(ckpt_dir):
    if not os.path.isdir(ckpt_dir):
        return None
    steps = []
    for name in os.listdir(ckpt_dir):
        if name.startswith("state_"):
            try:
                steps.append(int(name.split("_")[1]))
            except ValueError:
                pass
    return max(steps) if steps else None


def restore_agent_checkpoint(ckpt_dir, agent, iteration=None):
    """Restore in place; returns the checkpoint's iteration (or None)."""
    import orbax.checkpoint as ocp
    iteration = latest_checkpoint(ckpt_dir) if iteration is None \
        else iteration
    if iteration is None:
        return None
    template = _agent_state(agent, 0)
    with ocp.PyTreeCheckpointer() as ckptr:
        state = ckptr.restore(
            os.path.join(os.path.abspath(ckpt_dir), f"state_{iteration}"),
            item=template)
    agent.policy.params = state["policy_params"]
    agent.policy.old_params = state["policy_old_params"]
    agent.policy.transforms = jax.tree_util.tree_map(
        lambda x: x, state["policy_transforms"])
    agent.baseline.state = state["baseline_state"]
    key = state["rng_key"]
    agent.key = jax.random.wrap_key_data(key) \
        if hasattr(jax.random, "wrap_key_data") and key.dtype != np.uint32 \
        else jax.numpy.asarray(key)
    rs = float(state["running_score"])
    agent.running_score = None if np.isnan(rs) else rs
    if "opt_state" in state and hasattr(agent, "opt_state"):
        agent.opt_state = state["opt_state"]
    agent._cache = {}
    return int(state["iteration"])
