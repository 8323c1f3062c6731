"""PPO with clipped surrogate (reference mjrl/algos/ppo_clip.py).

- clipped objective mean(min(LR * A, clip(LR, 1±eps) * A))
  (ppo_clip.py:48-55);
- Adam over ``epochs`` x (num_samples // mb_size) minibatches, sampled
  with replacement (ppo_clip.py:86-97, np.random.choice semantics);
- defaults clip 0.2, 10 epochs, mb 64, lr 3e-4 (ppo_clip.py:24-28);
- the Adam state persists across training iterations like the reference's
  long-lived optimizer (ppo_clip.py:45).

The whole epoch/minibatch loop is one jitted ``lax.scan`` — no host
round-trips between minibatches.
"""

import jax
import jax.numpy as jnp
import optax

from mjrl_tpu.algos import functional as F
from mjrl_tpu.algos.batch_reinforce import BatchREINFORCE


class PPO(BatchREINFORCE):
    def __init__(self, env, policy, baseline,
                 clip_coef=0.2,
                 epochs=10,
                 mb_size=64,
                 learn_rate=3e-4,
                 seed=123,
                 save_logs=False,
                 **kwargs):
        super().__init__(env, policy, baseline, learn_rate=learn_rate,
                         seed=seed, save_logs=save_logs, **kwargs)
        self.clip_coef = clip_coef
        self.epochs = epochs
        self.mb_size = mb_size
        self.learn_rate = learn_rate
        self._optimizer = optax.adam(learn_rate)
        self.opt_state = self._optimizer.init(self.policy.params)
        self._has_opt_state = True

    def __getstate__(self):
        state = super().__getstate__()
        state.pop("_optimizer", None)
        return state

    def __setstate__(self, state):
        super().__setstate__(state)
        self._optimizer = optax.adam(self.learn_rate)

    def ppo_surrogate(self, params, params_old, transforms, obs, act, adv,
                      mask=None):
        pol = self.policy.config
        ll_new = F.log_likelihoods(pol, params, transforms, obs, act)
        ll_old = jax.lax.stop_gradient(
            F.log_likelihoods(pol, params_old, transforms, obs, act))
        lr = jnp.exp(ll_new - ll_old)
        lr_clip = jnp.clip(lr, 1.0 - self.clip_coef, 1.0 + self.clip_coef)
        obj = jnp.minimum(lr * adv, lr_clip * adv)
        if mask is None:
            return jnp.mean(obj)
        return jnp.sum(obj * mask) / jnp.maximum(jnp.sum(mask), 1.0)

    def _update_core(self, params, transforms, obs, act, adv, mask, key,
                     opt_state):
        pol = self.policy.config
        opt = self._optimizer
        n = obs.shape[0]
        num_mb = max(int(n // self.mb_size), 1)
        params_old = params

        surr_before = F.cpi_surrogate(pol, params, params, transforms, obs,
                                      act, adv, mask)

        def loss_fn(p, idx):
            return -self.ppo_surrogate(p, params_old, transforms, obs[idx],
                                       act[idx], adv[idx], mask[idx])

        def mb_step(carry, idx):
            p, os = carry
            grads = jax.grad(loss_fn)(p, idx)
            updates, os = opt.update(grads, os, p)
            p = optax.apply_updates(p, updates)
            p = pol.clamp(p)
            return (p, os), ()

        # with-replacement minibatch sampling (ppo_clip.py:89 choice)
        total = self.epochs * num_mb
        idxs = jax.random.randint(key, (total, self.mb_size), 0, n)
        (new_params, opt_state), _ = jax.lax.scan(mb_step,
                                                  (params, opt_state), idxs)

        surr_after = F.cpi_surrogate(pol, new_params, params_old, transforms,
                                     obs, act, adv, mask)
        kl = F.mean_kl(pol, new_params, params_old, transforms, obs, mask)
        stats = dict(alpha=jnp.asarray(self.learn_rate),
                     surr_before=surr_before, surr_after=surr_after,
                     kl_dist=kl)
        return new_params, stats, opt_state

    def _log_update_stats(self, stats, t_update):
        self.logger.log_kv("t_opt", t_update)
        self.logger.log_kv("kl_dist", float(stats["kl_dist"]))
        self.logger.log_kv("surr_improvement",
                           float(stats["surr_after"])
                           - float(stats["surr_before"]))
