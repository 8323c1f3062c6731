"""Host-side stateful wrapper with the reference GymEnv API
(mjrl/utils/gym_env.py).

Scripts / evaluation / pickling use this; jitted training code uses the
functional env directly.  Supports act_repeat (gym_env.py:36-42, 93-103:
horizon divided by act_repeat, rewards summed over repeats) and obs_mask
(gym_env.py:58).
"""

import jax
import jax.numpy as jnp
import numpy as np


class GymEnv:
    def __init__(self, env, env_kwargs=None, obs_mask=None, act_repeat=1,
                 horizon=None, *args, **kwargs):
        from mjrl_tpu import envs as registry
        if isinstance(env, str):
            self.env = registry.make(env, **(env_kwargs or {}))
            self.env_id = env
        elif callable(env) and not hasattr(env, "step"):
            self.env = env(**(env_kwargs or {}))
            self.env_id = type(self.env).__name__
        else:
            self.env = env
            self.env_id = type(env).__name__

        # external host-API envs (gymnasium / dmc2gym style: stateful
        # reset()/step(a), observation_space attributes) are supported
        # behind the same surface — the reference's dmc2gym escape hatch
        # (run_model_accel_npg.py:86-91) generalized to any host env
        self._external = (hasattr(self.env, "observation_space")
                          and not hasattr(self.env, "model"))

        self.act_repeat = act_repeat
        env_horizon = self._resolve_horizon(horizon)
        assert env_horizon % act_repeat == 0
        self._horizon = env_horizon // act_repeat
        self.obs_mask = np.ones(self.observation_dim) if obs_mask is None \
            else np.asarray(obs_mask)
        self.seeding = False
        self._key = jax.random.PRNGKey(123)
        self._state = None
        self._last_obs = None
        self._seed_int = None
        if not self._external:
            self._jit_step = jax.jit(self.env.step)
            self._jit_reset = jax.jit(self.env.reset)

    def _resolve_horizon(self, horizon):
        if horizon is not None:
            return horizon
        if not self._external:
            return self.env.horizon
        spec = getattr(self.env, "spec", None)
        for attr in ("max_episode_steps", "_horizon"):
            v = getattr(spec, attr, None)
            if v:
                return v
        v = getattr(self.env, "horizon", None) or \
            getattr(self.env, "_max_episode_steps", None)
        if v:
            return v
        raise ValueError("external env: pass horizon= explicitly")

    # -- pickling: jitted closures are rebuilt on load --------------------
    def __getstate__(self):
        state = self.__dict__.copy()
        state.pop("_jit_step", None)
        state.pop("_jit_reset", None)
        return state

    def __setstate__(self, state):
        self.__dict__.update(state)
        if not self._external:
            self._jit_step = jax.jit(self.env.step)
            self._jit_reset = jax.jit(self.env.reset)

    # -- spec ------------------------------------------------------------
    @property
    def spec(self):
        from mjrl_tpu.envs.base import EnvSpec
        return EnvSpec(self.env.observation_dim, self.env.action_dim,
                       self._horizon)

    @property
    def observation_dim(self):
        if self._external:
            return int(np.prod(self.env.observation_space.shape))
        return self.env.observation_dim

    @property
    def action_dim(self):
        if self._external:
            return int(np.prod(self.env.action_space.shape))
        return self.env.action_dim

    @property
    def horizon(self):
        return self._horizon

    @property
    def action_space(self):
        if self._external:
            return self.env.action_space
        low = np.asarray(self.env.act_low)
        high = np.asarray(self.env.act_high)
        return type("Box", (), {"low": low, "high": high})()

    # -- gym-like API ----------------------------------------------------
    def set_seed(self, seed=123):
        self._key = jax.random.PRNGKey(seed)

    def seed(self, seed=None):
        if seed is not None:
            self.set_seed(seed)

    def reset(self, seed=None):
        if seed is not None:
            self.set_seed(seed)
            self._seed_int = int(seed)
        if self._external:
            out = self.env.reset(seed=self._seed_int) \
                if self._seed_int is not None else self.env.reset()
            self._seed_int = None
            obs = out[0] if isinstance(out, tuple) else out
            self._last_obs = np.asarray(obs).ravel()
            return self.get_obs()
        self._key, sub = jax.random.split(self._key)
        self._state = self._jit_reset(sub)
        return self.get_obs()

    reset_model = reset

    def step(self, a):
        if self._external:
            total_r, done, ifo = 0.0, False, {}
            a = np.clip(np.asarray(a), self.env.action_space.low,
                        self.env.action_space.high)
            for _ in range(self.act_repeat):
                out = self.env.step(a)
                if len(out) == 5:       # gymnasium: terminated/truncated
                    obs, r, term, trunc, ifo = out
                    done = bool(term) or bool(trunc)
                else:
                    obs, r, done, ifo = out
                self._last_obs = np.asarray(obs).ravel()
                total_r += float(r)
                if done:
                    break
            return self.get_obs(), total_r, done, ifo
        a = np.clip(np.asarray(a), np.asarray(self.env.act_low),
                    np.asarray(self.env.act_high))
        a = jnp.asarray(a, self._state.obs.dtype)
        total_r = 0.0
        for _ in range(self.act_repeat):
            self._state = self._jit_step(self._state, a)
            total_r += float(self._state.reward)
        done = bool(self._state.done)
        return self.get_obs(), total_r, done, self.get_env_infos()

    def get_obs(self):
        if self._external:
            return self._last_obs * self.obs_mask
        return np.asarray(self._state.obs) * self.obs_mask

    def get_env_infos(self):
        if self._external:
            return {}
        info = {k: np.asarray(v) for k, v in self._state.info.items()}
        info["state"] = self.get_env_state()
        return info

    # -- state parity (gym_env.py:134-150) -------------------------------
    def get_env_state(self):
        if self._external:
            if hasattr(self.env, "get_env_state"):
                return self.env.get_env_state()
            raise NotImplementedError
        return {k: np.asarray(v)
                for k, v in self.env.get_env_state(self._state).items()}

    def set_env_state(self, state_dict):
        if self._external:
            if hasattr(self.env, "set_env_state"):
                return self.env.set_env_state(state_dict)
            raise NotImplementedError
        if self._state is None:
            self.reset()
        self._state = self.env.set_env_state(self._state, state_dict)

    def real_env_step(self, bool_val):
        pass  # no sim/real distinction: the engine is the env

    # -- rendering (offscreen; mujoco_env.py:128-135 viewer replacement) --
    def render(self, mode="rgb_array"):
        """Render the current state to an RGB array (matplotlib-based
        offscreen renderer; no interactive viewer on TPU hosts)."""
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        import numpy as _np
        from mjrl_tpu.utils.render import draw_model
        if self._external:
            return self.env.render()
        if self._state is None:
            self.reset()
        model = self.env._patched_model(self._state.scenery) \
            if hasattr(self.env, "_patched_model") else self.env.model
        fig = plt.figure(figsize=(4, 3))
        ax = fig.add_subplot(projection="3d")
        draw_model(ax, model, _np.asarray(self._state.physics.qpos))
        fig.canvas.draw()
        buf = _np.asarray(fig.canvas.buffer_rgba())[..., :3].copy()
        plt.close(fig)
        return buf

    def visualize_policy(self, policy, num_episodes=1, horizon=None,
                         mode="exploration", save_dir="policy_vis"):
        """Offscreen episode rendering (gym_env.py:154-169 parity)."""
        from mjrl_tpu.utils.render import visualize_policy as _vis
        return _vis(self, policy, num_episodes=num_episodes,
                    horizon=horizon, mean_action=(mode != "exploration"),
                    save_dir=save_dir)

    # -- evaluation (gym_env.py:171-211) ---------------------------------
    def evaluate_policy(self, policy, num_episodes=5, horizon=None, gamma=1,
                        visual=False, percentile=[], get_full_dist=False,
                        mean_action=False, init_env_state=None,
                        terminate_at_done=True, seed=123):
        self.set_seed(seed)
        horizon = self._horizon if horizon is None else horizon
        ep_returns = np.zeros(num_episodes)

        for ep in range(num_episodes):
            self.reset()
            if init_env_state is not None:
                self.set_env_state(init_env_state)
            t, done = 0, False
            while t < horizon and (done is False or not terminate_at_done):
                o = self.get_obs()
                a = policy.get_action(o)[1]["evaluation"] if mean_action \
                    else policy.get_action(o)[0]
                _, r, done, _ = self.step(a)
                ep_returns[ep] += (gamma ** t) * r
                t += 1

        mean_eval, std = np.mean(ep_returns), np.std(ep_returns)
        min_score, max_score = np.amin(ep_returns), np.amax(ep_returns)
        base_stats = [mean_eval, std, min_score, max_score]
        percentile_stats = [np.percentile(ep_returns, p) for p in percentile]
        full_dist = ep_returns if get_full_dist else None
        return [base_stats, percentile_stats, full_dist]

    def evaluate_success(self, paths, logger=None):
        if hasattr(self.env, "evaluate_success"):
            return self.env.evaluate_success(paths, logger)
        raise AttributeError(f"{self.env_id} has no evaluate_success")
