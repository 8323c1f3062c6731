"""MPPI-style MPC over learned models
(reference mjrl/algos/model_accel/model_learning_mpc.py).

Per get_action (model_learning_mpc.py:42-83):
- perturb the warm-started action sequence with filtered gaussian noise;
- roll each candidate through the learned model(s) (ensemble: same action
  set through every member);
- score with discounted return, plus omega * ensemble-disagreement bonus
  (std of member predictions summed over time and state dims,
  model_learning_mpc.py:85-99);
- MPPI weights softmax(kappa * (R - max R)); weighted-average sequence;
  execute the first action; warm-start shift with the mean appended.

The whole plan step (noise -> rollouts over plan_paths x ensemble ->
scores -> weighted average) is one jitted program; the reference loops in
numpy per trajectory and per model.

Note: the reference indexes the disagreement bonus with i // num_traj
(a model index, constant across candidates — model_learning_mpc.py:94);
here each candidate gets its own disagreement (capability intent, not
bug parity).
"""

import jax
import jax.numpy as jnp
import numpy as np

from mjrl_tpu.algos.model_accel.sampling import (
    generate_perturbed_actions_batch)


class MPCPolicy:
    def __init__(self, env,
                 plan_horizon,
                 plan_paths=10,
                 kappa=1.0,
                 gamma=1.0,
                 mean=None,
                 filter_coefs=None,
                 seed=123,
                 warmstart=True,
                 fitted_model=None,
                 omega=5.0,
                 **kwargs):
        self.env, self.seed = env, seed
        fenv = env.env if hasattr(env, "env") and hasattr(env.env, "reset") \
            else env
        self.fenv = fenv
        self.n, self.m = fenv.observation_dim, int(fenv.action_dim)
        self.plan_horizon, self.num_traj = plan_horizon, plan_paths

        if fitted_model is None:
            raise ValueError("Policy requires a fitted dynamics model")
        # normalize to a list of members (single model or ensemble)
        if hasattr(fitted_model, "members"):
            self.fitted_model = list(fitted_model.members)
        elif isinstance(fitted_model, (list, tuple)):
            self.fitted_model = list(fitted_model)
        else:
            self.fitted_model = [fitted_model]

        self.mean = np.zeros(self.m) if mean is None else np.asarray(mean)
        self.filter_coefs = [np.ones(self.m), 1.0, 0.0, 0.0] \
            if filter_coefs is None else filter_coefs
        self.kappa, self.gamma, self.omega = kappa, gamma, omega
        self.act_sequence = np.ones((self.plan_horizon, self.m)) * self.mean
        self.init_act_sequence = self.act_sequence.copy()
        self.warmstart = warmstart
        self._key = jax.random.PRNGKey(seed)
        self._plan = None

    # -- jitted planner --------------------------------------------------
    def _build_planner(self):
        dyn_cfg = self.fitted_model[0].dyn_cfg
        num_models = len(self.fitted_model)
        reward_fn = self._batched_reward_fn()
        filter_coefs = (jnp.asarray(self.filter_coefs[0], jnp.float32),
                        float(self.filter_coefs[1]),
                        float(self.filter_coefs[2]),
                        float(self.filter_coefs[3]))
        kappa, gamma, omega = self.kappa, self.gamma, self.omega
        H, num_traj = self.plan_horizon, self.num_traj

        def plan(dyn_params, dyn_trs, obs, base_act, key):
            acts = generate_perturbed_actions_batch(key, base_act,
                                                    filter_coefs, num_traj)

            def rollout_model(params, tr):
                def one(actions):
                    def step(s, a):
                        return dyn_cfg.forward(params, tr, s, a), s
                    _, ob = jax.lax.scan(step, obs, actions)
                    return ob
                return jax.vmap(one)(acts)   # (num_traj, H, d)

            all_obs = jax.vmap(rollout_model)(dyn_params, dyn_trs)
            # rewards per model per candidate
            rewards = reward_fn(
                all_obs.reshape(num_models * num_traj, H, -1),
                jnp.tile(acts, (num_models, 1, 1)))
            rewards = rewards.reshape(num_models, num_traj, H)
            disc = gamma ** jnp.arange(H)
            returns = jnp.sum(rewards * disc, axis=-1)  # (models, cands)
            if num_models > 1:
                disagreement = jnp.sum(jnp.std(all_obs, axis=0),
                                       axis=(1, 2))     # (num_traj,)
                scores = returns + omega * disagreement[None, :]
            else:
                scores = returns
            scores = scores.reshape(-1)
            s = jnp.exp(kappa * (scores - jnp.max(scores)))
            all_acts = jnp.tile(acts, (num_models, 1, 1))
            weighted = jnp.sum(all_acts * s[:, None, None], axis=0) \
                / (jnp.sum(s) + 1e-6)
            return weighted

        return jax.jit(plan)

    def _batched_reward_fn(self):
        fenv = self.fenv
        if hasattr(fenv, "compute_path_rewards"):
            def fn(obs, acts):
                paths = {"observations": obs, "actions": acts}
                paths = fenv.compute_path_rewards(paths)
                return paths["rewards"]
            return fn
        raise ValueError(
            "MPC requires env.compute_path_rewards or a learned reward")

    def _stacked_models(self):
        params = jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs),
            *[m.dyn_params for m in self.fitted_model])
        trs = jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs),
            *[m.dyn_tr for m in self.fitted_model])
        return params, trs

    # -- public API ------------------------------------------------------
    def get_action(self, obs):
        if self._plan is None:
            self._plan = self._build_planner()
        self._key, sub = jax.random.split(self._key)
        params, trs = self._stacked_models()
        act_sequence = np.asarray(self._plan(
            params, trs, jnp.asarray(obs, jnp.float32),
            jnp.asarray(self.act_sequence, jnp.float32), sub))
        action = act_sequence[0].copy()
        if self.warmstart:
            self.act_sequence[:-1] = act_sequence[1:]
            self.act_sequence[-1] = self.mean.copy()
        else:
            self.act_sequence = self.init_act_sequence.copy()
        return action

    # reference-API scoring helpers (host-side, for compatibility)
    def score_trajectory(self, paths):
        rewards = np.asarray(paths["rewards"])
        disc = self.gamma ** np.arange(rewards.shape[1])
        return np.sum(rewards * disc, axis=1)
