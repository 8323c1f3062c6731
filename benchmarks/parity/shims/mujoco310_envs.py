"""Reference-protocol mjrl envs rebuilt on the installed MuJoCo 3.10.

These exist ONLY for the parity harness: they let the unmodified reference
mjrl algorithms (torch) run against the *real* MuJoCo engine on this box,
producing the ground-truth learning curves our TPU framework is compared
to.  Each env re-implements the behavioral contract of its reference
counterpart (obs layout, reward, reset distribution, frame_skip) with the
reference MJCF asset loaded at runtime from /root/reference — see
mjrl/envs/point_mass.py and mjrl/envs/swimmer.py for the contracts cited
per method.
"""

import os

import mujoco
import numpy as np

import gym  # the shim package next to this file

_ASSETS = "/root/reference/mjrl/envs/assets"


class _Mujoco310Env(gym.Env):
    """mujoco_py-free equivalent of mjrl/envs/mujoco_env.py: owns an
    MjModel/MjData pair, exposes do_simulation/set_state and the spec/
    space attributes the reference GymEnv wrapper reads."""

    def __init__(self, asset, frame_skip, env_id, horizon):
        self.model = mujoco.MjModel.from_xml_path(os.path.join(_ASSETS,
                                                               asset))
        self.data = mujoco.MjData(self.model)
        self.frame_skip = frame_skip
        self.np_random = np.random.RandomState()
        self.init_qpos = self.data.qpos.copy()
        self.init_qvel = self.data.qvel.copy()

        class _Spec:
            id = env_id
            max_episode_steps = horizon

        self.spec = _Spec()
        bounds = self.model.actuator_ctrlrange.copy()
        self.action_space = gym.spaces.Box(bounds[:, 0], bounds[:, 1],
                                           (self.model.nu,))
        obs = self.get_obs()
        self.observation_space = gym.spaces.Box(
            -np.inf * np.ones_like(obs), np.inf * np.ones_like(obs),
            obs.shape)

    # reference GymEnv reads env.env.* for the raw-env hooks
    @property
    def env(self):
        return self

    @property
    def _elapsed_steps(self):
        return 0

    @_elapsed_steps.setter
    def _elapsed_steps(self, v):
        pass

    def seed(self, seed=None):
        self.np_random = np.random.RandomState(seed)
        return [seed]

    def set_state(self, qpos, qvel):
        self.data.qpos[:] = qpos
        self.data.qvel[:] = qvel
        mujoco.mj_forward(self.model, self.data)

    def do_simulation(self, ctrl, n_frames):
        self.data.ctrl[:] = ctrl
        for _ in range(n_frames):
            mujoco.mj_step(self.model, self.data)

    def reset(self):
        mujoco.mj_resetData(self.model, self.data)
        return self.reset_model()

    def get_env_state(self):
        return dict(qp=self.data.qpos.copy(), qv=self.data.qvel.copy())

    def get_env_infos(self):
        return {}


class PointMassRef(_Mujoco310Env):
    """mjrl/envs/point_mass.py on MuJoCo 3.10 (obs :22-25, reward :27-41,
    reset :53-65, solved flag :19)."""

    def __init__(self):
        super().__init__("point_mass.xml", 5, "mjrl_point_mass-v0", 25)
        self._agent_bid = mujoco.mj_name2id(
            self.model, mujoco.mjtObj.mjOBJ_BODY, "agent")
        self._target_sid = mujoco.mj_name2id(
            self.model, mujoco.mjtObj.mjOBJ_SITE, "target")

    def get_obs(self):
        if not hasattr(self, "_agent_bid"):
            return np.zeros(6)
        agent = self.data.xpos[self._agent_bid]
        target = self.data.site_xpos[self._target_sid]
        return np.concatenate([agent[:2], self.data.qvel.ravel(),
                               target[:2]])

    def step(self, a):
        self.do_simulation(a, self.frame_skip)
        obs = self.get_obs()
        d = obs[:2] - obs[-2:]
        reward = -np.sum(np.abs(d)) - 0.5 * np.linalg.norm(d)
        return obs, reward, False, dict(solved=bool(reward > -0.1))

    def reset_model(self, seed=None):
        qp = self.np_random.uniform(-1.0, 1.0, 2)
        goal = self.np_random.uniform(-1.0, 1.0, 2)
        self.set_state(qp, self.init_qvel.copy())
        self.model.site_pos[self._target_sid][:2] = goal
        mujoco.mj_forward(self.model, self.data)
        return self.get_obs()

    def evaluate_success(self, paths, logger=None):
        ok = [np.mean(p["env_infos"]["solved"][-4:]) > 0.0 for p in paths]
        rate = 100.0 * np.mean(ok)
        if logger is None:
            return rate
        logger.log_kv("success_rate", rate)

    # returns {} so do_rollout keeps the per-step infos (with 'solved')
    # from env.step — the reference env returns {state: ...} here, which
    # makes do_rollout's env_info_base preference (samplers/core.py:73-76)
    # drop the solved flag and silently defeats its own success logging;
    # the parity harness keeps success observable on both sides


class SwimmerRef(_Mujoco310Env):
    """mjrl/envs/swimmer.py on MuJoCo 3.10 (reward = -10*dx toward -x
    :11-22, obs = qpos[2:] + qvel :24-28, heading randomized on reset
    :30-35)."""

    def __init__(self):
        super().__init__("swimmer.xml", 5, "mjrl_swimmer-v0", 500)

    def get_obs(self):
        return np.concatenate([self.data.qpos.ravel()[2:],
                               self.data.qvel.ravel()])

    def step(self, a):
        x_before = self.data.qpos[0]
        self.do_simulation(a, self.frame_skip)
        x_after = self.data.qpos[0]
        reward = -10.0 * (x_after - x_before)
        return self.get_obs(), reward, False, {}

    def reset_model(self, seed=None):
        qpos = self.init_qpos.copy()
        qpos[2] = self.np_random.uniform(-np.pi, np.pi)
        self.set_state(qpos, self.init_qvel.copy())
        return self.get_obs()
