"""Swimmer environment (reference mjrl/envs/swimmer.py).

obs = [qpos[2:], qvel] (12,); reward = -10 * (x_after - x_before) — the
agent is rewarded for moving in the negative x direction (swimmer.py:12-18);
reset randomizes only the heading qpos[2] ~ U(-pi, pi) (swimmer.py:30-34).
"""

import jax
import jax.numpy as jnp

from mjrl_tpu.envs.assets import swimmer_model
from mjrl_tpu.envs.base import MujocoLikeEnv


class SwimmerEnv(MujocoLikeEnv):
    observation_dim = 12
    frame_skip = 5
    horizon = 500
    needs_fk_obs = False  # obs = qpos/qvel only

    # default = implicit solver: the +-1.5 hinge limits are load-bearing
    # (a penalty stop lets NPG learn a nonphysical thrash gait that
    # scores ~7x real MuJoCo — benchmarks/parity/cross_eval.py); with
    # solver="newton" the planar fast path (physics/planar.py) solves the
    # exact limit QP at ~20M steps/s
    def __init__(self, dtype=jnp.float32, solver="newton"):
        builder = swimmer_model()
        self.model = builder.finalize(dtype, solver=solver)
        self.dtype = dtype

    def _reset_scenery(self, key):
        return {}

    def _reset_qpos_qvel(self, key):
        qpos = jnp.zeros((7,), self.dtype)
        heading = jax.random.uniform(key, (), self.dtype, -jnp.pi, jnp.pi)
        qpos = qpos.at[2].set(heading)
        return qpos, jnp.zeros((7,), self.dtype)

    def _obs(self, data, scenery, physics):
        return jnp.concatenate([physics.qpos[2:], physics.qvel])

    def _reward(self, obs, action, prev_state, new_physics):
        # reward for moving in the negative x direction (swimmer.py:16-18)
        return -10.0 * (new_physics.qpos[0] - prev_state.physics.qpos[0])
