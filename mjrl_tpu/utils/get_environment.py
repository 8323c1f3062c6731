"""Env factory hook for procedural environment generation
(reference mjrl/utils/get_environment.py)."""

from mjrl_tpu.envs.gym_env import GymEnv


def get_environment(env_name=None, **kwargs):
    if env_name is None:
        print("Need to specify environment name")
        return None
    return GymEnv(env_name, **kwargs)
