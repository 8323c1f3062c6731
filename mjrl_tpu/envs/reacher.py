"""7-DoF reacher environment (reference mjrl/envs/reacher_sawyer.py).

obs = [qpos (7), qvel * dt (7), finger site xyz, target site xyz] (20,)
(reacher_sawyer.py:23-29); reward = -l1 - 5 l2 between finger and target on
obs clipped to [-10, 10] (reacher_sawyer.py:31-46); reset zeroes the robot
and randomizes the target site within a box (reacher_sawyer.py:61-68);
batched path rewards have no time shift (reacher_sawyer.py:48-55).
"""

import jax
import jax.numpy as jnp

from mjrl_tpu.envs.assets import reacher_model
from mjrl_tpu.envs.base import MujocoLikeEnv


class Reacher7DOFEnv(MujocoLikeEnv):
    observation_dim = 20
    frame_skip = 4
    horizon = 50

    # default = implicit solver: the reacher works near its joint limits,
    # where PGS matches MuJoCo's qacc to ~1% (vs ~67% for the penalty)
    # at a measured ~17% rollout-throughput cost (docs/BENCHMARKS.md)
    def __init__(self, dtype=jnp.float32, solver="pgs"):
        builder = reacher_model()
        self._target_sid = builder.names["site"]["target"]
        self._finger_sid = builder.names["site"]["finger"]
        self.model = builder.finalize(dtype, solver=solver)
        self.dtype = dtype

    def _patched_model(self, scenery):
        return self.model.replace(
            site_pos=self.model.site_pos.at[self._target_sid].set(
                scenery["target_pos"]))

    def _reset_scenery(self, key):
        kx, ky, kz = jax.random.split(key, 3)
        target = jnp.stack([
            jax.random.uniform(kx, (), self.dtype, -0.3, 0.3),
            jax.random.uniform(ky, (), self.dtype, -0.2, 0.2),
            jax.random.uniform(kz, (), self.dtype, -0.25, 0.25)])
        return {"target_pos": target}

    def _reset_qpos_qvel(self, key):
        return (jnp.zeros((7,), self.dtype), jnp.zeros((7,), self.dtype))

    def _obs(self, data, scenery, physics):
        return jnp.concatenate([
            physics.qpos,
            physics.qvel * self.dt,  # delta_x instead of velocity
            data.site_xpos[self._finger_sid],
            data.site_xpos[self._target_sid]])

    @staticmethod
    def reward_fn(obs):
        obs = jnp.clip(obs, -10.0, 10.0)
        hand = obs[..., -6:-3]
        target = obs[..., -3:]
        l1 = jnp.sum(jnp.abs(hand - target), axis=-1)
        l2 = jnp.linalg.norm(hand - target, axis=-1)
        return -l1 - 5.0 * l2

    def _reward(self, obs, action, prev_state, new_physics):
        return self.reward_fn(obs)

    def batched_reward(self, obs):
        return self.reward_fn(obs)
