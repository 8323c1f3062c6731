"""PointMass environment (reference mjrl/envs/point_mass.py).

obs = [agent xy, qvel (2), target xy] (6,); reward = -l1 - 0.5 l2 between
agent and target (point_mass.py:27-41); solved flag = reward > -0.1
(point_mass.py:19); batched path rewards use the r(s,a)=r(s') shift
(point_mass.py:43-51); success = any of the last 4 steps solved, reported
as a percentage over paths (point_mass.py:67-80).
"""

import jax
import jax.numpy as jnp

from mjrl_tpu.envs.assets import point_mass_model
from mjrl_tpu.envs.base import MujocoLikeEnv


class PointMassEnv(MujocoLikeEnv):
    observation_dim = 6
    frame_skip = 5
    horizon = 25

    def __init__(self, dtype=jnp.float32, solver="penalty"):
        builder = point_mass_model()
        self._target_sid = builder.names["site"]["target"]
        self._agent_bid = builder.names["body"]["agent"]
        self.model = builder.finalize(dtype, solver=solver)
        self.dtype = dtype

    def _patched_model(self, scenery):
        return self.model.replace(
            site_pos=self.model.site_pos.at[self._target_sid].set(
                scenery["target_pos"]))

    def _reset_scenery(self, key):
        goal = jax.random.uniform(key, (2,), self.dtype, -1.0, 1.0)
        z = self.model.site_pos[self._target_sid, 2]
        return {"target_pos": jnp.concatenate([goal, z[None]])}

    def _reset_qpos_qvel(self, key):
        qpos = jax.random.uniform(key, (2,), self.dtype, -1.0, 1.0)
        return qpos, jnp.zeros((2,), self.dtype)

    def _obs(self, data, scenery, physics):
        agent = data.xpos[self._agent_bid, :2]
        target = data.site_xpos[self._target_sid, :2]
        return jnp.concatenate([agent, physics.qvel, target])

    @staticmethod
    def reward_fn(obs):
        """Works on (..., 6) observations (point_mass.py:27-41)."""
        agent = obs[..., :2]
        target = obs[..., -2:]
        l1 = jnp.sum(jnp.abs(agent - target), axis=-1)
        l2 = jnp.linalg.norm(agent - target, axis=-1)
        return -1.0 * l1 - 0.5 * l2

    def _reward(self, obs, action, prev_state, new_physics):
        return self.reward_fn(obs)

    def _info(self, obs, reward):
        return {"solved": reward > -0.1}

    def batched_reward(self, obs):
        return self.reward_fn(obs)

    def compute_path_rewards(self, paths):
        """r(s, a) = r(s') shift (point_mass.py:43-51)."""
        rewards = self.batched_reward(paths["observations"])
        rewards = rewards.at[..., :-1].set(rewards[..., 1:])
        paths["rewards"] = rewards
        return paths

    @staticmethod
    def evaluate_success(paths, logger=None):
        """Percentage of paths with any 'solved' in the last 4 steps
        (point_mass.py:67-80).  Accepts a list of path dicts or a batched
        info array."""
        import numpy as np
        if isinstance(paths, (list, tuple)):
            solved = np.array([
                np.mean(np.asarray(p["env_infos"]["solved"][-4:])) > 0.0
                for p in paths])
            rate = 100.0 * solved.mean()
        else:
            flags = np.asarray(paths)  # (N, T) boolean
            rate = 100.0 * np.mean(np.mean(flags[:, -4:], axis=1) > 0.0)
        if logger is None:
            return rate
        logger.log_kv("success_rate", rate)
        return None
