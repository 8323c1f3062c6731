"""Model-accelerated NPG (reference
mjrl/algos/model_accel/model_accel_npg.py).

``train_step`` rolls imagined trajectories through the learned model
ensemble from given init states (model_accel_npg.py:95-125), applies the
env/learned reward, optional termination, and ensemble-disagreement
truncation (max over members of per-step MSE > truncate_lim truncates the
path, adding ``truncate_reward`` at the cut — model_accel_npg.py:137-155),
then runs the standard returns/GAE/NPG update.

TPU-first: rollouts for ALL ensemble members are one vmapped jitted call;
truncation is computed vectorized on the batch and expressed through the
validity mask (fixed shapes, no per-path Python lists).  The reference's
"drop paths shorter than 5" rule becomes mask zeroing with a floor of 4
steps (model_accel_npg.py:131-134, 150).
"""

import time as timer

import jax
import jax.numpy as jnp
import numpy as np

from mjrl_tpu.algos.model_accel.sampling import policy_rollout
from mjrl_tpu.algos.npg_cg import NPG


class ModelAccelNPG(NPG):
    def __init__(self, learned_model=None,
                 refine=False,
                 kappa=5.0,
                 plan_horizon=10,
                 plan_paths=100,
                 reward_function=None,
                 termination_function=None,
                 **kwargs):
        super().__init__(**kwargs)
        if learned_model is None:
            raise ValueError(
                "Algorithm requires a (list of) learned dynamics model")
        if hasattr(learned_model, "members"):
            self.learned_model = list(learned_model.members)
        elif isinstance(learned_model, (list, tuple)):
            self.learned_model = list(learned_model)
        else:
            self.learned_model = [learned_model]
        self.refine = refine
        self.kappa, self.plan_horizon, self.plan_paths = (kappa,
                                                          plan_horizon,
                                                          plan_paths)
        self.reward_function = reward_function
        self.termination_function = termination_function

    # device-compat no-ops (reference model_accel_npg.py:43-56)
    def to(self, device):
        return self

    def is_cuda(self):
        return False

    def train_step(self, N,
                   env=None,
                   sample_mode="trajectories",
                   horizon=1e6,
                   gamma=0.995,
                   gae_lambda=0.97,
                   num_cpu="max",
                   env_kwargs=None,
                   init_states=None,
                   reward_function=None,
                   termination_function=None,
                   truncate_lim=None,
                   truncate_reward=0.0,
                   **kwargs):
        ts = timer.time()
        fenv = self.fenv
        reward_function = self.reward_function if reward_function is None \
            else reward_function
        termination_function = self.termination_function \
            if termination_function is None else termination_function

        T = int(min(horizon, fenv.horizon))

        # init states: env resets by default; replay-buffer states can be
        # passed in (model_accel_npg.py:101-103 — the reference asserts a
        # list; arrays are accepted here)
        if init_states is None:
            k = self._next_key()
            init_states = np.asarray(jax.vmap(
                lambda kk: fenv.reset(kk).obs)(jax.random.split(k, N)))
        else:
            init_states = np.asarray(init_states, np.float32)
        assert init_states.shape[0] == N

        # imagined rollouts through each ensemble member (same init states)
        all_obs, all_act = [], []
        for model in self.learned_model:
            k = self._next_key()
            ro = policy_rollout(num_traj=N, env=fenv, policy=self.policy,
                                learned_model=model, init_state=init_states,
                                eval_mode=False, horizon=T, key=k)
            all_obs.append(ro["observations"])
            all_act.append(ro["actions"])
        obs = jnp.concatenate(all_obs)     # (N * M, T, d)
        act = jnp.concatenate(all_act)

        # rewards: learned reward model or supplied reward function
        paths = {"observations": obs, "actions": act}
        if self.learned_model[0].learn_reward:
            self.learned_model[0].compute_path_rewards(paths)
            rewards = jnp.asarray(paths["rewards"])
        else:
            assert callable(reward_function), \
                "need a reward function when the model has no reward head"
            paths = reward_function(paths)
            rewards = jnp.asarray(paths["rewards"])

        mask = jnp.ones(rewards.shape, rewards.dtype)
        terminated = jnp.zeros((rewards.shape[0],), bool)

        if callable(termination_function):
            out = termination_function(
                dict(observations=obs, actions=act, rewards=rewards,
                     mask=mask, terminated=terminated))
            rewards = jnp.asarray(out.get("rewards", rewards))
            mask = jnp.asarray(out.get("mask", mask))
            terminated = jnp.asarray(out.get("terminated", terminated))

        # ensemble-disagreement truncation (model_accel_npg.py:137-155)
        if truncate_lim is not None and len(self.learned_model) > 1:
            rewards, mask, terminated = self._disagreement_truncation(
                obs, act, rewards, mask, terminated, float(truncate_lim),
                float(truncate_reward))

        if self.save_logs:
            self.logger.log_kv("time_sampling", timer.time() - ts)
        self.seed = self.seed + N if self.seed is not None else self.seed

        batch = dict(observations=obs, actions=act, rewards=rewards,
                     mask=mask, terminated=terminated, env_infos={})
        NM = int(obs.shape[0])
        _, process_fn, update_fn, fit_fn = self._get_phases(
            NM, T, gamma, gae_lambda)
        eval_statistics = self._train_from_batch(batch, process_fn,
                                                 update_fn)
        eval_statistics.append(N)
        if self.save_logs:
            self.logger.log_kv("num_samples",
                               int(np.sum(np.asarray(mask))))

        # baseline fit
        returns = self._last_returns
        ts = timer.time()
        k_fit = self._next_key()
        new_state, e0, e1 = fit_fn(self.baseline.state, batch["observations"],
                                   returns, batch["mask"], k_fit)
        self.baseline.state = new_state
        if self.save_logs:
            self.logger.log_kv("time_VF", timer.time() - ts)
            self.logger.log_kv("VF_error_before", float(e0))
            self.logger.log_kv("VF_error_after", float(e1))
        return eval_statistics

    def _disagreement_truncation(self, obs, act, rewards, mask, terminated,
                                 truncate_lim, truncate_reward):
        """Vectorized max-over-members MSE truncation."""
        s = obs[:, :-1].reshape(-1, obs.shape[-1])
        a = act[:, :-1].reshape(-1, act.shape[-1])
        s_next = obs[:, 1:].reshape(-1, obs.shape[-1])
        pred_err = None
        for model in self.learned_model:
            pred = model.forward(s, a)
            err = jnp.mean((s_next - pred) ** 2, axis=-1)
            pred_err = err if pred_err is None else jnp.maximum(pred_err,
                                                                err)
        NT = obs.shape[0]
        H1 = obs.shape[1] - 1
        pred_err = pred_err.reshape(NT, H1)
        violated = pred_err > truncate_lim
        any_violation = jnp.any(violated, axis=1)
        first = jnp.argmax(violated, axis=1)      # first violation index
        T_cut = jnp.where(any_violation, first + 1, obs.shape[1])
        T_cut = jnp.maximum(T_cut, 4)             # floor of 4 steps
        t_idx = jnp.arange(obs.shape[1])[None, :]
        new_mask = mask * (t_idx < T_cut[:, None])
        # bonus reward at the truncation step
        truncated_here = any_violation & (T_cut < obs.shape[1])
        bonus = jnp.where(
            (t_idx == (T_cut - 1)[:, None]) & truncated_here[:, None],
            truncate_reward, 0.0)
        new_rewards = rewards + bonus
        new_terminated = terminated | truncated_here
        return new_rewards, new_mask, new_terminated

    def get_action(self, observation):
        if self.refine is False:
            return self.policy.get_action(observation)
        return self.get_refined_action(observation)

    def get_refined_action(self, observation):
        # mirror of the reference placeholder (model_accel_npg.py:190-196)
        raise NotImplementedError
