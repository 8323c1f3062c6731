"""BatchREINFORCE agent — base class for the on-policy family
(reference mjrl/algos/batch_reinforce.py).

TPU-first structure: ``train_step`` runs three jitted phases —
(1) batched rollout (vmap+scan, replacing the mp.Pool sampler),
(2) returns/GAE/whitening + the policy update,
(3) baseline fit —
each timed host-side to preserve the reference's phase-timer log keys
(time_sampling / time_vpg / time_VF, batch_reinforce.py:88,105-108,
npg_cg.py:114-124).

API parity: ``train_step(N, env, sample_mode, horizon, gamma, gae_lambda,
num_cpu, env_kwargs) -> [mean, std, min, max, N]``
(batch_reinforce.py:61-114); ``train_from_paths(paths)`` for externally
collected paths; running-score EMA 0.9/0.1 (batch_reinforce.py:194-195);
advantage whitening with 1e-6 (batch_reinforce.py:185); optional
KL-targeted step-halving line search (batch_reinforce.py:136-148).
"""

import time as timer
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from mjrl_tpu.algos import functional as F
from mjrl_tpu.ops.gae import gae_advantages, discounted_returns, whiten
from mjrl_tpu.samplers.rollout import num_traj_for_samples, rollout_batch
from mjrl_tpu.utils.logger import DataLog


class BatchREINFORCE:
    def __init__(self, env, policy, baseline,
                 learn_rate=0.01,
                 seed=123,
                 desired_kl=None,
                 save_logs=False,
                 **kwargs):
        self.env = env
        self.policy = policy
        self.baseline = baseline
        self.alpha = learn_rate
        self.seed = seed if seed is not None else 123
        self.save_logs = save_logs
        self.running_score = None
        self.desired_kl = desired_kl
        self.key = jax.random.PRNGKey(self.seed)
        if save_logs:
            self.logger = DataLog()
        self._cache = {}
        # subclasses with a persistent optimizer (PPO) set this True and
        # maintain self.opt_state; _update_core then takes/returns it
        self._has_opt_state = False
        # optional jax.sharding.Mesh: shards the rollout batch axis across
        # devices; GSPMD inserts the update's cross-chip reductions
        self.mesh = kwargs.get("mesh", None)
        # autoreset rollouts: episodes reset inside the scan so every grid
        # cell is a valid sample (for early-terminating envs in 'samples'
        # mode); processing switches to done-aware return/GAE scans
        self.autoreset = bool(kwargs.get("autoreset", False))

    # -- pickling: jitted phase caches are rebuilt lazily ---------------
    def __getstate__(self):
        state = self.__dict__.copy()
        state["_cache"] = {}
        return state

    def __setstate__(self, state):
        self.__dict__.update(state)
        self._cache = {}

    # -- plumbing --------------------------------------------------------
    @property
    def fenv(self):
        """The functional env behind either a GymEnv wrapper or a raw
        functional env."""
        return self.env.env if hasattr(self.env, "env") and \
            hasattr(self.env.env, "reset") else self.env

    def _next_key(self, n=1):
        keys = jax.random.split(self.key, n + 1)
        self.key = keys[0]
        return keys[1] if n == 1 else keys[1:]

    # -- jitted phases ---------------------------------------------------
    def _get_phases(self, num_traj, T, gamma, gae_lambda):
        cache_key = (num_traj, T, gamma, gae_lambda)
        if cache_key in self._cache:
            return self._cache[cache_key]

        fenv = self.fenv
        pol = self.policy.config
        bl = self.baseline.cfg

        rollout_fn = jax.jit(partial(rollout_batch, fenv, pol,
                                     num_traj=num_traj, horizon=T,
                                     mesh=self.mesh,
                                     autoreset=self.autoreset))
        autoreset = self.autoreset

        def process(bl_state, batch):
            rewards = batch["rewards"]
            mask = batch["mask"]
            if autoreset:
                from mjrl_tpu.ops.gae import (batched_gae_dones,
                                              batched_returns_dones)
                dones = batch["dones"]
                returns = batched_returns_dones(rewards, dones, gamma)
                obs_ext = jnp.concatenate(
                    [batch["observations"], batch["last_obs"][:, None]],
                    axis=1)
                values_ext = bl.predict(bl_state, obs_ext)
                values, v_last = values_ext[:, :-1], values_ext[:, -1]
                if gae_lambda is None or gae_lambda < 0 or gae_lambda > 1:
                    adv = returns - values
                else:
                    adv = batched_gae_dones(rewards, values, dones, v_last,
                                            gamma, gae_lambda)
                adv_flat = whiten(adv.reshape(-1))
                # per-episode mean return: total reward / episode count
                n_eps = jnp.maximum(jnp.sum(dones, axis=1), 1.0)
                path_returns = jnp.sum(rewards, axis=1) / n_eps
                return returns, adv_flat, path_returns
            returns = jax.vmap(discounted_returns, (0, None, 0))(
                rewards, gamma, mask)
            values = bl.predict(bl_state, batch["observations"])
            if gae_lambda is None or gae_lambda < 0 or gae_lambda > 1:
                adv = (returns - values) * mask
            else:
                adv = jax.vmap(gae_advantages, (0, 0, None, None, 0, 0))(
                    rewards, values, gamma, gae_lambda, batch["terminated"],
                    mask)
            adv_flat = whiten(adv.reshape(-1), mask.reshape(-1))
            path_returns = jnp.sum(rewards * mask, axis=1)
            return returns, adv_flat, path_returns

        process_fn = jax.jit(process)
        update_fn = jax.jit(self._update_core)  # may take/return opt state
        if getattr(self.baseline, "needs_key", False):
            fit_fn = jax.jit(lambda s, o, r, m, k: bl.fit(s, o, r, m, k))
        else:
            fit_fn = jax.jit(lambda s, o, r, m, k: bl.fit(s, o, r, m))
        self._cache[cache_key] = (rollout_fn, process_fn, update_fn, fit_fn)
        return self._cache[cache_key]

    # -- algorithm core (overridden by subclasses) -----------------------
    def _update_core(self, params, transforms, obs, act, adv, mask, key):
        """REINFORCE ascent step, optional KL-targeted halving line search
        (batch_reinforce.py:122-148).  Returns (new_params, stats dict)."""
        pol = self.policy.config
        surr_before = F.cpi_surrogate(pol, params, params, transforms, obs,
                                      act, adv, mask)
        g = F.vpg_grad(pol, params, params, transforms, obs, act, adv, mask)

        if self.desired_kl is not None:
            def cond(carry):
                alpha, kl, it = carry
                return (kl > self.desired_kl) & (it < 100)

            def body(carry):
                alpha, _, it = carry
                alpha = alpha / 2.0
                new = F.apply_step(pol, params, g, alpha)
                kl = F.mean_kl(pol, new, params, transforms, obs, mask)
                return alpha, kl, it + 1

            new0 = F.apply_step(pol, params, g, self.alpha)
            kl0 = F.mean_kl(pol, new0, params, transforms, obs, mask)
            alpha, _, _ = jax.lax.while_loop(
                cond, body, (jnp.asarray(self.alpha), kl0, 0))
        else:
            alpha = jnp.asarray(self.alpha)

        new_params = F.apply_step(pol, params, g, alpha)
        surr_after = F.cpi_surrogate(pol, new_params, params, transforms,
                                     obs, act, adv, mask)
        kl = F.mean_kl(pol, new_params, params, transforms, obs, mask)
        stats = dict(alpha=alpha, surr_before=surr_before,
                     surr_after=surr_after, kl_dist=kl)
        return new_params, stats

    # -- main entry ------------------------------------------------------
    def train_step(self, N,
                   env=None,
                   sample_mode="trajectories",
                   horizon=1e6,
                   gamma=0.995,
                   gae_lambda=0.97,
                   num_cpu="max",
                   env_kwargs=None,
                   ):
        assert sample_mode in ("trajectories", "samples"), \
            "sample_mode must be 'trajectories' or 'samples'"
        fenv = self.fenv
        T = fenv.horizon if horizon is None or horizon >= 1e6 \
            else min(int(horizon), fenv.horizon)
        num_traj = N if sample_mode == "trajectories" \
            else num_traj_for_samples(N, T)
        self._last_gamma_lambda = (gamma, gae_lambda)

        rollout_fn, process_fn, update_fn, fit_fn = self._get_phases(
            num_traj, T, gamma, gae_lambda)

        # phase 1: sampling
        ts = timer.time()
        k_roll = self._next_key()
        batch = rollout_fn(self.policy.params, self.policy.transforms,
                           k_roll)
        batch["rewards"].block_until_ready()
        if self.save_logs:
            self.logger.log_kv("time_sampling", timer.time() - ts)

        # phase 2: process + update
        eval_statistics = self._train_from_batch(
            batch, process_fn, update_fn)
        eval_statistics.append(N)
        if self.save_logs:
            num_samples = int(np.sum(np.asarray(batch["mask"])))
            self.logger.log_kv("num_samples", num_samples)

        # phase 3: baseline fit on fresh returns
        returns = self._last_returns
        ts = timer.time()
        k_fit = self._next_key()
        new_state, e0, e1 = fit_fn(self.baseline.state,
                                   batch["observations"], returns,
                                   batch["mask"], k_fit)
        self.baseline.state = jax.tree_util.tree_map(lambda x: x, new_state)
        if self.save_logs:
            self.logger.log_kv("time_VF", timer.time() - ts)
            self.logger.log_kv("VF_error_before", float(e0))
            self.logger.log_kv("VF_error_after", float(e1))

        return eval_statistics

    def _train_from_batch(self, batch, process_fn, update_fn):
        ts = timer.time()
        returns, adv_flat, path_returns = process_fn(self.baseline.state,
                                                     batch)
        self._last_returns = returns

        obs = batch["observations"].reshape(-1,
                                            batch["observations"].shape[-1])
        act = batch["actions"].reshape(-1, batch["actions"].shape[-1])
        mask = batch["mask"].reshape(-1)

        k_up = self._next_key()
        if self._has_opt_state:
            new_params, stats, self.opt_state = update_fn(
                self.policy.params, self.policy.transforms, obs, act,
                adv_flat, mask, k_up, self.opt_state)
        else:
            new_params, stats = update_fn(self.policy.params,
                                          self.policy.transforms, obs, act,
                                          adv_flat, mask, k_up)
        t_update = timer.time() - ts

        # install new params (new and old copies, clamped)
        self.policy.params = new_params
        self.policy.old_params = new_params

        # score statistics
        pr = np.asarray(path_returns)
        base_stats = [float(pr.mean()), float(pr.std()), float(pr.min()),
                      float(pr.max())]
        self.running_score = base_stats[0] if self.running_score is None \
            else 0.9 * self.running_score + 0.1 * base_stats[0]

        if self.save_logs:
            self._log_update_stats(stats, t_update)
            self.logger.log_kv("stoc_pol_mean", base_stats[0])
            self.logger.log_kv("stoc_pol_std", base_stats[1])
            self.logger.log_kv("stoc_pol_min", base_stats[2])
            self.logger.log_kv("stoc_pol_max", base_stats[3])
            self.logger.log_kv("running_score", self.running_score)
            self._log_success(batch)
        return base_stats

    def _log_update_stats(self, stats, t_update):
        self.logger.log_kv("alpha", float(stats["alpha"]))
        self.logger.log_kv("time_vpg", t_update)
        self.logger.log_kv("kl_dist", float(stats["kl_dist"]))
        self.logger.log_kv("surr_improvement",
                           float(stats["surr_after"])
                           - float(stats["surr_before"]))

    def _log_success(self, batch):
        fenv = self.fenv
        infos = batch.get("env_infos", {})
        # per-env success flags: point_mass-family uses 'solved',
        # the Adroit suite uses 'goal_achieved' (relocate-v0 semantics)
        flag = next((k for k in ("solved", "goal_achieved")
                     if k in infos), None)
        if hasattr(fenv, "evaluate_success") and flag is not None:
            # a genuinely broken evaluate_success must surface, not be
            # silently unlogged; only absence of the capability is benign
            rate = fenv.evaluate_success(np.asarray(infos[flag]))
            self.logger.log_kv("success_rate", rate)

    # -- list-of-paths entry (for demo/BC flows and parity) --------------
    def train_from_paths(self, paths):
        batch = _list_to_batch(paths)
        num_traj, T = batch["rewards"].shape
        gamma, lam = self._last_gamma_lambda \
            if hasattr(self, "_last_gamma_lambda") else (0.995, 0.97)
        _, process_fn, update_fn, _ = self._get_phases(num_traj, T, gamma,
                                                       lam)
        stats = self._train_from_batch(batch, process_fn, update_fn)
        return stats

    def log_rollout_statistics(self, paths):
        path_returns = [float(np.sum(p["rewards"])) for p in paths]
        self.logger.log_kv("stoc_pol_mean", np.mean(path_returns))
        self.logger.log_kv("stoc_pol_std", np.std(path_returns))
        self.logger.log_kv("stoc_pol_max", np.max(path_returns))
        self.logger.log_kv("stoc_pol_min", np.min(path_returns))


def _list_to_batch(paths):
    """Reference-format list of path dicts -> padded batch pytree."""
    T = max(len(p["rewards"]) for p in paths)
    n_obs = paths[0]["observations"].shape[-1]
    n_act = paths[0]["actions"].shape[-1]
    N = len(paths)
    obs = np.zeros((N, T, n_obs), np.float32)
    act = np.zeros((N, T, n_act), np.float32)
    rew = np.zeros((N, T), np.float32)
    mask = np.zeros((N, T), np.float32)
    term = np.zeros((N,), bool)
    for i, p in enumerate(paths):
        t = len(p["rewards"])
        obs[i, :t] = p["observations"]
        act[i, :t] = p["actions"]
        rew[i, :t] = p["rewards"]
        mask[i, :t] = 1.0
        term[i] = bool(p.get("terminated", False))
    return dict(observations=jnp.asarray(obs), actions=jnp.asarray(act),
                rewards=jnp.asarray(rew), mask=jnp.asarray(mask),
                terminated=jnp.asarray(term), env_infos={})
