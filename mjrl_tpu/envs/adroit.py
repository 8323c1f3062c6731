"""Adroit hand relocate — the BASELINE.json flagship DAPG task.

The reference pipeline (behavior_clone.py warm start + demo-augmented
NPG fine-tune, /root/reference/examples/behavior_clone.py:47-58 +
/root/reference/mjrl/algos/dapg.py:26-37) was built for the Adroit
dexterous-manipulation suite (Rajeswaran et al. 2018).  The MJCF model
here is the one shipped with the installed ``gymnasium_robotics``
package (30-actuator ShadowHand + 6-dof arm, 36 dof total with the
free-slide/hinge ball object), parsed by mjrl_tpu's own MJCF parser and
stepped by the JAX engine — tendon couplings, 103 declared contact
pairs and affine position servos included.

Task semantics follow the original DAPG relocate-v0 (which
gymnasium-robotics reimplements as AdroitHandRelocate-v1):

- action: a in [-1, 1]^30, mapped to ctrlrange via
  ``act_mid + a * act_rng`` (position-servo targets);
- obs (39,): [qpos[:30], palm - obj, palm - target, obj - target]
  (hand joints; the object pose coordinates are exposed only through
  the relative task vectors);
- dense reward: -0.1 ||palm-obj||; if the ball is off the table
  (obj_z > 0.04): +1 - 0.5 ||palm-target|| - 0.5 ||obj-target||;
  +10 if ||obj-target|| < 0.1, +20 more if < 0.05.  NOTE the installed
  gymnasium-robotics 1.4.1 dense variant carries a known sign bug
  (+0.1 ||palm-obj||, Farama PR #220) — we implement the original
  semantics;
- sparse reward: 10 if ||obj-target|| < 0.1 else -0.1;
- no early termination, horizon 200;
- success: goal_achieved (||obj-target|| < 0.1) on more than 25 steps
  of the episode.

Reset randomizes the ball's table position (body_pos x U(-0.15,0.15),
y U(-0.15,0.3)) and the target site (x,y U(-0.2,0.2), z U(0.15,0.35));
joints start at qpos0 = 0 exactly, as in the reference suite.
"""

import os

import jax
import jax.numpy as jnp

from mjrl_tpu.envs.base import EnvState, MujocoLikeEnv, _rescue_divergence
from mjrl_tpu.physics.kinematics import fwd_kinematics
from mjrl_tpu.physics.model import State
from mjrl_tpu.physics.step import step_n


def relocate_reward(palm, obj, target, sparse=False):
    """relocate-v0 reward from the three task vectors.  Dense: guide the
    palm to the ball, gate the target-shaping terms on the ball leaving
    the table (obj_z > 0.04), bonus 10/20 inside the 0.1/0.05 goal
    balls.  (The installed gymnasium-robotics 1.4.1 dense variant has a
    known +0.1||palm-obj|| sign bug, Farama PR #220 — this is the
    original semantics.)  Returns (reward, goal_achieved)."""
    goal_dist = jnp.linalg.norm(obj - target)
    goal_achieved = goal_dist < 0.1
    if sparse:
        return jnp.where(goal_achieved, 10.0, -0.1), goal_achieved
    reward = (-0.1 * jnp.linalg.norm(palm - obj)
              + jnp.where(obj[..., 2] > 0.04,
                          1.0 - 0.5 * jnp.linalg.norm(palm - target)
                          - 0.5 * goal_dist, 0.0)
              + jnp.where(goal_achieved, 10.0, 0.0)
              + jnp.where(goal_dist < 0.05, 20.0, 0.0))
    return reward, goal_achieved


def adroit_asset(name="adroit_relocate.xml"):
    """Path to an Adroit MJCF inside the installed gymnasium_robotics."""
    import gymnasium_robotics
    path = os.path.join(os.path.dirname(gymnasium_robotics.__file__),
                        "envs", "assets", "adroit_hand", name)
    if not os.path.exists(path):
        raise FileNotFoundError(f"Adroit MJCF asset not found: {path}")
    return path


class AdroitRelocateEnv(MujocoLikeEnv):
    observation_dim = 39
    frame_skip = 5
    horizon = 200
    needs_fk_obs = True

    def __init__(self, dtype=jnp.float32, solver="newton",
                 reward_type="dense"):
        from mjrl_tpu.physics.mjcf import load_mjcf
        builder = load_mjcf(adroit_asset())
        # primal Newton: the grasp states couple 170+ constraint rows,
        # which the dual APGD cannot converge at any production sweep
        # budget (round-5 diagnosis: 9.9% median qacc error at 50
        # sweeps, plateau 2.4% at 800); Newton reaches MuJoCo-grade
        # accuracy in 25 iterations
        self.model = builder.finalize(dtype, solver=solver,
                                      newton_iters=25)
        self.dtype = dtype
        self.sparse_reward = reward_type.lower() == "sparse"
        names = builder.names
        self._obj_bid = names["body"]["Object"]
        self._palm_sid = names["site"]["S_grasp"]
        self._target_sid = names["site"]["target"]
        cr = self.model.ctrlrange
        self._act_mid = 0.5 * (cr[:, 0] + cr[:, 1])
        self._act_rng = 0.5 * (cr[:, 1] - cr[:, 0])

    # normalized [-1, 1] action space (relocate-v0 semantics)
    @property
    def act_low(self):
        return -jnp.ones((self.model.nu,), self.dtype)

    @property
    def act_high(self):
        return jnp.ones((self.model.nu,), self.dtype)

    def _patched_model(self, scenery):
        return self.model.replace(
            body_pos=self.model.body_pos.at[self._obj_bid, :2].set(
                scenery["obj_pos"][:2]),
            site_pos=self.model.site_pos.at[self._target_sid].set(
                scenery["target_pos"]))

    def _reset_scenery(self, key):
        ko, kt = jax.random.split(key)
        obj_xy = jax.random.uniform(
            ko, (2,), self.dtype,
            jnp.array([-0.15, -0.15], self.dtype),
            jnp.array([0.15, 0.3], self.dtype))
        target = jax.random.uniform(
            kt, (3,), self.dtype,
            jnp.array([-0.2, -0.2, 0.15], self.dtype),
            jnp.array([0.2, 0.2, 0.35], self.dtype))
        z = self.model.body_pos[self._obj_bid, 2]
        return {"obj_pos": jnp.concatenate([obj_xy, z[None]]),
                "target_pos": target}

    def _reset_qpos_qvel(self, key):
        return self.model.qpos0, jnp.zeros((self.model.nv,), self.dtype)

    def _task_vectors(self, data):
        obj = data.xpos[self._obj_bid]
        palm = data.site_xpos[self._palm_sid]
        target = data.site_xpos[self._target_sid]
        return obj, palm, target

    def _obs(self, data, scenery, physics):
        obj, palm, target = self._task_vectors(data)
        return jnp.concatenate([physics.qpos[:-6], palm - obj,
                                palm - target, obj - target])

    def step(self, state: EnvState, action) -> EnvState:
        # relocate-v0 action convention: clip to [-1, 1], then scale to
        # the position-servo ctrlrange
        action = jnp.clip(jnp.asarray(action, self.dtype), -1.0, 1.0)
        ctrl = self._act_mid + action * self._act_rng
        model = self._patched_model(state.scenery)
        physics = step_n(model, state.physics, ctrl, self.frame_skip)
        physics = _rescue_divergence(state.physics, physics)
        data = fwd_kinematics(model, physics.qpos)
        obj, palm, target = self._task_vectors(data)
        obs = jnp.concatenate([physics.qpos[:-6], palm - obj,
                               palm - target, obj - target])
        reward, goal_achieved = relocate_reward(palm, obj, target,
                                                self.sparse_reward)
        reward = reward.astype(self.dtype)
        info = {"goal_achieved": goal_achieved}
        return state.replace(physics=physics, obs=obs, reward=reward,
                             done=jnp.zeros((), bool), info=info,
                             t=state.t + 1)

    def _info(self, obs, reward):
        return {"goal_achieved": jnp.zeros((), bool)}

    def _reward(self, obs, action, prev_state, new_physics):
        # step() computes the reward from kinematic data directly
        return jnp.zeros((), self.dtype)

    # -- parity helpers -------------------------------------------------
    def get_env_state(self, state: EnvState):
        """Matches gymnasium-robotics' state dict {qpos, qvel, obj_pos,
        target_pos} so demos replay across simulators."""
        return dict(qpos=state.physics.qpos, qvel=state.physics.qvel,
                    obj_pos=state.scenery["obj_pos"],
                    target_pos=state.scenery["target_pos"])

    def set_env_state(self, state: EnvState, env_state: dict) -> EnvState:
        scenery = {"obj_pos": jnp.asarray(env_state["obj_pos"], self.dtype),
                   "target_pos": jnp.asarray(env_state["target_pos"],
                                             self.dtype)}
        physics = State(qpos=jnp.asarray(env_state["qpos"], self.dtype),
                        qvel=jnp.asarray(env_state["qvel"], self.dtype))
        model = self._patched_model(scenery)
        data = fwd_kinematics(model, physics.qpos)
        obs = self._obs(data, scenery, physics)
        return state.replace(physics=physics, scenery=scenery, obs=obs)

    @staticmethod
    def evaluate_success(paths, logger=None):
        """Percentage of paths where the ball sat within 0.1 of the
        target for more than 25 steps (relocate-v0 rule)."""
        import numpy as np
        if isinstance(paths, (list, tuple)):
            ok = np.array([
                np.sum(np.asarray(p["env_infos"]["goal_achieved"])) > 25
                for p in paths])
            rate = 100.0 * ok.mean()
        else:
            flags = np.asarray(paths)  # (N, T) boolean
            rate = 100.0 * np.mean(np.sum(flags, axis=1) > 25)
        if logger is None:
            return rate
        logger.log_kv("success_rate", rate)
        return None
