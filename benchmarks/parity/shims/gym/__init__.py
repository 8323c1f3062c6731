"""Minimal ``gym`` stand-in so the UNMODIFIED reference mjrl package can
run on this box (the real gym 0.13 + mujoco-py are not installed).

Only the surface the reference actually imports is provided: ``gym.Env``
for the isinstance check in ``mjrl/utils/gym_env.py:23``, ``spaces.Box``
with low/high for action clipping (``gym_env.py:93``), ``error``,
``utils.EzPickle``/``utils.seeding`` and ``envs.registration.register``
(no-op — envs are supplied as instances, never via ``gym.make``; they are
implemented on MuJoCo 3.10 in ``mujoco310_envs.py``).
"""

from gym import envs, error, spaces, utils  # noqa: F401  (submodules)


class Env:
    """Base class; reference GymEnv only isinstance-checks against it."""

    spec = None
    action_space = None
    observation_space = None

    def seed(self, seed=None):
        raise NotImplementedError

    def reset(self):
        raise NotImplementedError

    def step(self, action):
        raise NotImplementedError


def make(env_id, **kwargs):
    """Resolve the mjrl env ids to the MuJoCo-3.10 parity envs (the
    reference sampler round-trips env_id strings through gym.make —
    mjrl/utils/gym_env.py:23, samplers/core.py:35)."""
    import mujoco310_envs as m
    registry = {"mjrl_point_mass-v0": m.PointMassRef,
                "mjrl_swimmer-v0": m.SwimmerRef}
    return registry[env_id](**kwargs)
