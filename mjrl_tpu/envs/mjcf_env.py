"""Generic environment over any MJCF model — no subclassing required.

The reference lets users point gym at any registered MuJoCo XML
(mjrl/envs/mujoco_env.py builds obs/ctrl spaces straight off the compiled
model); this is the functional counterpart: load an MJCF file, get a
jit/vmap/scan-safe env with obs = [qpos, qvel] and user-supplied reward /
termination callables.

    env = MJCFEnv("robot.xml", frame_skip=5,
                  reward_fn=lambda obs, act: -jnp.sum(obs[:2] ** 2))
    state = env.reset(key); state = env.step(state, action)

reward_fn/done_fn take (obs, action) and must be jax-traceable.  With
``reset_noise`` > 0, qpos gets additive uniform noise and qvel gaussian
noise scaled by it (quaternion qpos segments are renormalized by the
engine's FK, so small noise stays valid).
"""

import jax
import jax.numpy as jnp

from mjrl_tpu.envs.base import MujocoLikeEnv
from mjrl_tpu.physics.mjcf import load_mjcf


class MJCFEnv(MujocoLikeEnv):
    needs_fk_obs = False

    def __init__(self, path=None, xml_string=None, reward_fn=None,
                 done_fn=None, frame_skip=1, horizon=1000,
                 reset_noise=0.0, dtype=jnp.float32, solver="penalty"):
        builder = load_mjcf(path, xml_string=xml_string)
        self.model = builder.finalize(dtype, solver=solver)
        if self.model.nu == 0:
            raise ValueError(
                "MJCFEnv needs at least one actuator (the model has no "
                "controls to act on); add <actuator><motor .../> entries")
        self.names = builder.names
        self.frame_skip = int(frame_skip)
        self.horizon = int(horizon)
        self.dtype = dtype
        self.observation_dim = self.model.nq + self.model.nv
        self._reward_fn = reward_fn
        self._done_fn = done_fn
        self._reset_noise = float(reset_noise)

    # -- MujocoLikeEnv hooks --------------------------------------------
    def _reset_scenery(self, key):
        return {}

    def _reset_qpos_qvel(self, key):
        kq, kv = jax.random.split(key)
        qpos = self.model.qpos0
        qvel = jnp.zeros((self.model.nv,), self.dtype)
        if self._reset_noise > 0.0:
            qpos = qpos + jax.random.uniform(
                kq, qpos.shape, self.dtype,
                -self._reset_noise, self._reset_noise)
            qvel = qvel + self._reset_noise * jax.random.normal(
                kv, qvel.shape, self.dtype)
        return qpos, qvel

    def _obs(self, data, scenery, physics):
        return jnp.concatenate([physics.qpos, physics.qvel])

    def _reward(self, obs, action, prev_state, new_physics):
        if self._reward_fn is None:
            return jnp.zeros((), obs.dtype)
        return jnp.asarray(self._reward_fn(obs, action), obs.dtype)

    def _done(self, obs, physics):
        if self._done_fn is None:
            return jnp.zeros((), bool)
        obs_now = self._obs(None, None, physics)
        return jnp.asarray(self._done_fn(obs_now), bool)

    def batched_reward(self, obs):
        if self._reward_fn is None:
            return jnp.zeros(obs.shape[:-1], obs.dtype)
        # reward from observations only (action-independent), as the
        # reference's compute_path_rewards contract assumes
        zero_act = jnp.zeros(obs.shape[:-1] + (self.model.nu,), obs.dtype)
        return jax.vmap(jax.vmap(self._reward_fn))(obs, zero_act)
