"""Environment registry (reference mjrl/envs/__init__.py:7-29).

``make(env_id)`` returns a functional env; ``GymEnv(env_id)`` wraps it with
the reference's stateful host-side API (mjrl/utils/gym_env.py).
"""

from mjrl_tpu.envs.base import EnvSpec, EnvState, MujocoLikeEnv
from mjrl_tpu.envs.point_mass import PointMassEnv
from mjrl_tpu.envs.swimmer import SwimmerEnv
from mjrl_tpu.envs.reacher import Reacher7DOFEnv
from mjrl_tpu.envs.peg_insertion import PegEnv
from mjrl_tpu.envs.mjcf_env import MJCFEnv

_REGISTRY = {}


def register(env_id, cls, **kwargs):
    _REGISTRY[env_id] = (cls, kwargs)


def registered_ids():
    return sorted(_REGISTRY)


def make(env_id, **overrides):
    """Instantiate a functional env by id."""
    if env_id not in _REGISTRY:
        raise KeyError(
            f"unknown env id {env_id!r}; known: {registered_ids()}")
    cls, kwargs = _REGISTRY[env_id]
    return cls(**{**kwargs, **overrides})


# max_episode_steps from the reference registrations (envs/__init__.py:7-29)
register("mjrl_point_mass-v0", PointMassEnv)
register("mjrl_swimmer-v0", SwimmerEnv)
register("mjrl_reacher_7dof-v0", Reacher7DOFEnv)
register("mjrl_peg_insertion-v0", PegEnv)

# gym/MuJoCo-parity locomotion suite (models parsed from gymnasium's MJCF
# assets, stepped by the JAX engine)
from mjrl_tpu.envs.gym_suite import (AntEnv, HalfCheetahEnv,  # noqa: E402
                                     HopperEnv, HumanoidEnv,
                                     InvertedPendulumEnv, Walker2dEnv)

for _id in ("Hopper-v3", "Hopper-v4"):
    register(_id, HopperEnv)
for _id in ("HalfCheetah-v3", "HalfCheetah-v4"):
    register(_id, HalfCheetahEnv)
for _id in ("Walker2d-v3", "Walker2d-v4"):
    register(_id, Walker2dEnv)
for _id in ("InvertedPendulum-v2", "InvertedPendulum-v4"):
    register(_id, InvertedPendulumEnv)
for _id in ("Ant-v3", "Ant-v4"):
    register(_id, AntEnv)
for _id in ("Humanoid-v3", "Humanoid-v4"):
    register(_id, HumanoidEnv)

# Adroit dexterous manipulation (BASELINE.json flagship DAPG task; MJCF
# from the installed gymnasium_robotics assets).  Lazy: the asset package
# is optional and the 36-dof model is costly to build at import time.
def _make_relocate(**kwargs):
    from mjrl_tpu.envs.adroit import AdroitRelocateEnv
    return AdroitRelocateEnv(**kwargs)


register("relocate-v0", _make_relocate)
register("AdroitHandRelocate-v1", _make_relocate)

from mjrl_tpu.envs.gym_env import GymEnv  # noqa: E402  (needs _REGISTRY)
