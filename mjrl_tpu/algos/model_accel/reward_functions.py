"""Reward-function plugins for model-based training (reference
mjrl/algos/model_accel/run_experiments/utils/reward_functions/
mjrl_point_mass.py).

A reward function takes a batched paths dict {'observations': (N, H, d),
'actions': (N, H, m)} and populates paths['rewards'] (N, H).  The runner
resolves them by env id (the reference exec-imports a file path —
run_model_accel_npg.py:97-108; here a registry keeps it jit-friendly and
safe).
"""

import jax.numpy as jnp

_REGISTRY = {}


def register(env_id, fn):
    _REGISTRY[env_id] = fn


def get_reward_function(env_id):
    return _REGISTRY.get(env_id)


def point_mass_reward(paths):
    """Batched point_mass reward with the r(s, a) = r(s') shift
    (reward_functions/mjrl_point_mass.py:8-16)."""
    from mjrl_tpu.envs.point_mass import PointMassEnv
    obs = paths["observations"]
    rewards = PointMassEnv.reward_fn(obs)
    rewards = rewards.at[..., :-1].set(rewards[..., 1:])
    paths["rewards"] = rewards
    return paths


def reacher_reward(paths):
    from mjrl_tpu.envs.reacher import Reacher7DOFEnv
    paths["rewards"] = Reacher7DOFEnv.reward_fn(paths["observations"])
    return paths


def peg_insertion_reward(paths):
    from mjrl_tpu.envs.peg_insertion import PegEnv
    paths["rewards"] = PegEnv.reward_fn(paths["observations"])
    return paths


register("mjrl_point_mass-v0", point_mass_reward)
register("mjrl_reacher_7dof-v0", reacher_reward)
register("mjrl_peg_insertion-v0", peg_insertion_reward)
