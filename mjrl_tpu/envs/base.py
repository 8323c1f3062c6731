"""Functional environment API.

The reference wraps stateful gym/mujoco-py objects (mjrl/utils/gym_env.py);
here an environment is a static config object with pure functions:

    state = env.reset(key)                  # EnvState pytree
    state = env.step(state, action)         # one control step (frame_skip
                                            #   physics sub-steps inside)

so rollouts become ``vmap(lax.scan(step))`` on-device.  ``EnvState`` carries
everything the reference's env_infos/state dicts carry (qpos/qvel + movable
scenery like goal sites) so ``get_env_state``/``set_env_state`` parity holds
(reference point_mass.py:86-98).

Reward conventions mirrored from the reference:
- ``reward(obs, act)`` computed from observations so the batched
  (N, H, obs) ``compute_path_rewards`` variant works identically
  (point_mass.py:27-51);
- ``evaluate_success`` operates on rollout info flags
  (point_mass.py:67-80).
"""

from dataclasses import dataclass
from typing import Any, Dict

import jax
import jax.numpy as jnp
from flax import struct

from mjrl_tpu.physics.kinematics import fwd_kinematics
from mjrl_tpu.physics.model import Model, State
from mjrl_tpu.physics.step import step_n


# MuJoCo's engine_util_errmem mjMAXVAL: any |qpos|/|qvel| beyond this (or
# non-finite) triggers mj_warning + a state reset instead of propagating
# garbage (mujoco checks it in mj_checkPos/mj_checkVel each step).
_MJ_MAXVAL = 1e10


def _rescue_divergence(old: "State", new: "State") -> "State":
    """MuJoCo-parity divergence rescue for one control step.

    Real MuJoCo never hands NaN to the learner: mj_checkPos/mj_checkVel
    reset the simulation on non-finite or >mjMAXVAL state, so the
    reference's training loop (mujoco_env.py:120-126) always sees finite
    observations even under a destabilizing policy.  Without this, one
    exploded trajectory poisons a whole NPG update with NaN advantages
    and the policy never recovers (observed: peg-insertion NPG diverged
    at iter 18 and logged NaN for the remaining 82 iterations).  We keep
    the pre-step qpos and zero qvel (an emergency brake) rather than
    resetting to qpos0 — same finiteness guarantee, no reset-state
    plumbing through jit.
    """
    ok = jnp.all(jnp.isfinite(new.qpos) & (jnp.abs(new.qpos) < _MJ_MAXVAL)) \
        & jnp.all(jnp.isfinite(new.qvel) & (jnp.abs(new.qvel) < _MJ_MAXVAL))
    return State(qpos=jnp.where(ok, new.qpos, old.qpos),
                 qvel=jnp.where(ok, new.qvel, jnp.zeros_like(new.qvel)))


@dataclass(frozen=True)
class EnvSpec:
    """Matches the reference EnvSpec (gym_env.py:9-13)."""
    observation_dim: int
    action_dim: int
    horizon: int


class EnvState(struct.PyTreeNode):
    physics: State         # qpos, qvel
    scenery: Dict[str, Any]  # movable model overrides (e.g. target pos)
    obs: Any
    reward: Any
    done: Any
    info: Dict[str, Any]
    t: Any                 # step counter


class MujocoLikeEnv:
    """Base for physics-backed functional envs.

    Subclasses define: ``model`` (Model), ``frame_skip``, ``horizon``,
    ``_obs(data, scenery, physics)``, ``_reward(obs, action, prev_state,
    new_physics)``, ``_info(obs, reward)``, ``_reset_scenery(key)``,
    ``_reset_qpos_qvel(key)``.
    """

    model: Model
    frame_skip: int
    horizon: int
    # envs whose _obs ignores kinematic data (qpos/qvel-only observations)
    # set this False to skip the post-step FK entirely (perf)
    needs_fk_obs = True

    # -- model patching ------------------------------------------------
    def _patched_model(self, scenery):
        """Apply movable-scenery overrides to the model pytree (cheap array
        swaps under jit)."""
        return self.model

    # -- spec ----------------------------------------------------------
    @property
    def spec(self):
        return EnvSpec(self.observation_dim, self.action_dim, self.horizon)

    @property
    def action_dim(self):
        return self.model.nu

    @property
    def act_low(self):
        return self.model.ctrlrange[:, 0]

    @property
    def act_high(self):
        return self.model.ctrlrange[:, 1]

    # -- core API ------------------------------------------------------
    def reset(self, key) -> EnvState:
        k1, k2 = jax.random.split(key)
        scenery = self._reset_scenery(k1)
        qpos, qvel = self._reset_qpos_qvel(k2)
        physics = State(qpos=qpos, qvel=qvel)
        model = self._patched_model(scenery)
        data = fwd_kinematics(model, qpos)
        obs = self._obs(data, scenery, physics)
        reward = jnp.zeros((), obs.dtype)
        info = self._info(obs, reward)
        return EnvState(physics=physics, scenery=scenery, obs=obs,
                        reward=reward, done=jnp.zeros((), bool), info=info,
                        t=jnp.zeros((), jnp.int32))

    @property
    def _planar(self):
        """Planar-chain fast path (physics/planar.py) when the model
        qualifies AND the env never patches the model per-episode."""
        if "_planar_cache" not in self.__dict__:
            from mjrl_tpu.physics.planar import extract_planar
            static_model = (type(self)._patched_model
                            is MujocoLikeEnv._patched_model)
            self.__dict__["_planar_cache"] = \
                extract_planar(self.model) if static_model else None
        return self.__dict__["_planar_cache"]

    def step(self, state: EnvState, action) -> EnvState:
        model = self._patched_model(state.scenery)
        action = jnp.asarray(action, state.obs.dtype)
        # action clipping to the control range happens inside
        # actuator_force (parity with gym_env.py:93-103 clip-to-box)
        if self._planar is not None:
            from mjrl_tpu.physics.planar import step_n_arrays
            qpos, qvel = step_n_arrays(self._planar, state.physics.qpos,
                                       state.physics.qvel, action,
                                       self.frame_skip)
            physics = State(qpos=qpos, qvel=qvel)
        else:
            physics = step_n(model, state.physics, action, self.frame_skip)
        physics = _rescue_divergence(state.physics, physics)
        data = fwd_kinematics(model, physics.qpos) if self.needs_fk_obs \
            else None
        obs = self._obs(data, state.scenery, physics)
        reward = self._reward(obs, action, state, physics)
        info = self._info(obs, reward)
        return state.replace(physics=physics, obs=obs, reward=reward,
                             done=self._done(obs, physics), info=info,
                             t=state.t + 1)

    def _done(self, obs, physics):
        """mjrl envs never terminate early (point_mass.py step returns
        done=False)."""
        return jnp.zeros((), bool)

    def _info(self, obs, reward):
        return {}

    def _reward(self, obs, action, prev_state, new_physics):
        raise NotImplementedError

    @property
    def dt(self):
        """Control timestep (mujoco_env.py dt = opt.timestep * frame_skip)."""
        return float(self.model.timestep) * self.frame_skip

    # -- parity helpers ------------------------------------------------
    def get_env_state(self, state: EnvState):
        """dict {qp, qv, ...scenery} (reference point_mass.py:86-90)."""
        d = dict(qp=state.physics.qpos, qv=state.physics.qvel)
        d.update(state.scenery)
        return d

    def set_env_state(self, state: EnvState, env_state: dict) -> EnvState:
        scenery = {k: jnp.asarray(v) for k, v in env_state.items()
                   if k not in ("qp", "qv")}
        physics = State(qpos=jnp.asarray(env_state["qp"]),
                        qvel=jnp.asarray(env_state["qv"]))
        model = self._patched_model(scenery)
        data = fwd_kinematics(model, physics.qpos)
        obs = self._obs(data, scenery, physics)
        return state.replace(physics=physics, scenery=scenery, obs=obs)

    def compute_path_rewards(self, paths):
        """Batched reward recomputation on (N, H, obs) observation arrays —
        default: no r(s,a)=r(s') shift; envs override as the reference does
        (point_mass.py:43-51 shifts, reacher/peg do not)."""
        obs = paths["observations"]
        rewards = self.batched_reward(obs)
        paths["rewards"] = rewards
        return paths

    def batched_reward(self, obs):
        raise NotImplementedError
