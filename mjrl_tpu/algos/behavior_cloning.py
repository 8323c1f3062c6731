"""Behavior cloning (reference mjrl/algos/behavior_cloning.py).

- loss types MLE (-mean log-likelihood) and MSE on the mean network output
  (behavior_cloning.py:74-105);
- data transforms computed from expert data and installed into the policy
  network (in/out shift-scale, behavior_cloning.py:52-67);
- policy log_std set from the action scale: log(out_scale + 1e-12)
  (behavior_cloning.py:68-72);
- Adam minibatch loop, minibatches sampled with replacement, epochs x
  (num_samples // batch_size) (behavior_cloning.py:120-129) — jitted as
  one lax.scan; the Adam state persists across fits.
"""

import time as timer

import jax
import jax.numpy as jnp
import numpy as np
import optax

from mjrl_tpu import distributions as dist
from mjrl_tpu.models.fc_network import mlp_forward
from mjrl_tpu.utils.logger import DataLog


class BC:
    def __init__(self, expert_paths,
                 policy,
                 epochs=5,
                 batch_size=64,
                 lr=1e-3,
                 optimizer=None,
                 loss_type="MSE",   # 'MLE' or 'MSE'
                 save_logs=True,
                 set_transforms=False,
                 **kwargs):
        self.policy = policy
        self.expert_paths = expert_paths
        self.epochs = epochs
        self.mb_size = batch_size
        self.loss_type = loss_type
        self.save_logs = save_logs
        self.logger = DataLog()

        if set_transforms:
            in_shift, in_scale, out_shift, out_scale = \
                self.compute_transformations()
            self.set_transformations(in_shift, in_scale, out_shift,
                                     out_scale)
            self.set_variance_with_data(out_scale)

        self._lr = lr
        self._optimizer = optimizer or optax.adam(lr)
        self.opt_state = self._optimizer.init(self.policy.params)
        self._key = jax.random.PRNGKey(kwargs.get("seed", 0))
        self._fit_cache = {}

    def __getstate__(self):
        state = self.__dict__.copy()
        state.pop("_fit_cache", None)
        state.pop("_optimizer", None)
        return state

    def __setstate__(self, state):
        self.__dict__.update(state)
        self._fit_cache = {}
        self._optimizer = optax.adam(getattr(self, "_lr", 1e-3))

    # -- transforms (behavior_cloning.py:52-72) --------------------------
    def compute_transformations(self):
        if not self.expert_paths:
            return None, None, None, None
        obs = np.concatenate([p["observations"] for p in self.expert_paths])
        act = np.concatenate([p["actions"] for p in self.expert_paths])
        return (obs.mean(axis=0), obs.std(axis=0),
                act.mean(axis=0), act.std(axis=0))

    def set_transformations(self, in_shift=None, in_scale=None,
                            out_shift=None, out_scale=None):
        self.policy.set_transformations(in_shift, in_scale, out_shift,
                                        out_scale)

    def set_variance_with_data(self, out_scale):
        if out_scale is None:
            return
        params = self.policy.params
        log_std = jnp.log(jnp.asarray(out_scale, jnp.float32) + 1e-12)
        params = self.policy.config.clamp({**params, "log_std": log_std})
        self.policy.params = params
        self.policy.old_params = params

    # -- losses (behavior_cloning.py:74-105) -----------------------------
    def _loss(self, params, transforms, obs, act):
        pol = self.policy.config
        if self.loss_type == "MLE":
            mu, ls = pol.dist_info(params, transforms, obs)
            return -jnp.mean(dist.log_likelihood(act, mu, ls))
        mu = mlp_forward(params["layers"], transforms, obs,
                         pol.nonlinearity)
        return jnp.mean((mu - act) ** 2)

    def loss(self, data, idx=None):
        obs = jnp.asarray(data["observations"], jnp.float32)
        act = jnp.asarray(data["expert_actions"], jnp.float32)
        if idx is not None:
            idx = np.asarray(idx)
            obs, act = obs[idx], act[idx]
        return self._loss(self.policy.params, self.policy.transforms, obs,
                          act)

    # -- fit (behavior_cloning.py:107-142) -------------------------------
    def _get_fit_fn(self, n):
        if n in self._fit_cache:
            return self._fit_cache[n]
        opt = self._optimizer
        pol = self.policy.config
        num_mb = max(int(n // self.mb_size), 1)
        total = self.epochs * num_mb

        def fit(params, transforms, opt_state, obs, act, key):
            def mb_step(carry, idx):
                p, os = carry
                g = jax.grad(self._loss)(p, transforms, obs[idx], act[idx])
                updates, os = opt.update(g, os, p)
                p = pol.clamp(optax.apply_updates(p, updates))
                return (p, os), ()

            idxs = jax.random.randint(key, (total, self.mb_size), 0, n)
            (params, opt_state), _ = jax.lax.scan(mb_step,
                                                  (params, opt_state), idxs)
            return params, opt_state

        self._fit_cache[n] = jax.jit(fit)
        return self._fit_cache[n]

    def fit(self, data, suppress_fit_tqdm=False, **kwargs):
        assert all(k in data for k in ("observations", "expert_actions"))
        ts = timer.time()
        obs = jnp.asarray(data["observations"], jnp.float32)
        act = jnp.asarray(data["expert_actions"], jnp.float32)
        n = obs.shape[0]

        if self.save_logs:
            self.logger.log_kv("loss_before", float(self.loss(data)))

        fit_fn = self._get_fit_fn(n)
        self._key, sub = jax.random.split(self._key)
        new_params, self.opt_state = fit_fn(
            self.policy.params, self.policy.transforms, self.opt_state,
            obs, act, sub)
        self.policy.params = new_params
        self.policy.old_params = new_params

        if self.save_logs:
            self.logger.log_kv("epoch", self.epochs)
            self.logger.log_kv("loss_after", float(self.loss(data)))
            self.logger.log_kv("time", timer.time() - ts)

    def train(self, **kwargs):
        obs = np.concatenate([p["observations"] for p in self.expert_paths])
        act = np.concatenate([p["actions"] for p in self.expert_paths])
        self.fit(dict(observations=obs, expert_actions=act), **kwargs)
