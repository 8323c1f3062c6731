"""TRPO: NPG + backtracking line search (reference mjrl/algos/trpo.py).

Backtracking semantics (trpo.py:107-126): start from the NPG step size for
delta = 2 * kl_dist; while the measured KL(old, new) >= kl_dist, shrink
alpha by 0.9, up to 100 attempts; on failure alpha = 0.  Here the whole
search is a ``lax.while_loop`` inside the jitted update (the reference
loops on host with parameter set/get round trips each attempt).

Note the reference file is import-broken in its released snapshot (stale
``mjrl.samplers.batch_sampler`` import, trpo.py:15) — capability parity,
not bug parity.
"""

import jax
import jax.numpy as jnp

from mjrl_tpu.algos import functional as F
from mjrl_tpu.algos.npg_cg import NPG


class TRPO(NPG):
    def __init__(self, env, policy, baseline,
                 kl_dist=0.01,
                 FIM_invert_args={"iters": 10, "damping": 1e-4},
                 hvp_sample_frac=1.0,
                 seed=123,
                 save_logs=False,
                 normalized_step_size=0.01,
                 **kwargs):
        super().__init__(env, policy, baseline,
                         normalized_step_size=normalized_step_size,
                         FIM_invert_args=FIM_invert_args,
                         hvp_sample_frac=hvp_sample_frac, seed=seed,
                         save_logs=save_logs, **kwargs)
        self.kl_dist = kl_dist if kl_dist is not None \
            else 0.5 * normalized_step_size
        self.n_step_size = 2.0 * self.kl_dist

    def _update_core(self, params, transforms, obs, act, adv, mask, key):
        pol = self.policy.config
        damping = self.FIM_invert_args.get("damping", 1e-4)
        iters = self.FIM_invert_args.get("iters", 10)

        surr_before = F.cpi_surrogate(pol, params, params, transforms, obs,
                                      act, adv, mask)
        g, npg = F.npg_direction(
            pol, params, transforms, obs, act, adv, mask,
            damping=damping, cg_iters=iters, subsample_key=key,
            hvp_sample_frac=self.hvp_subsample)
        alpha0, delta = F.npg_step_size(g, npg, self.n_step_size)

        def kl_at(alpha):
            new = F.apply_step(pol, params, npg, alpha)
            return F.mean_kl(pol, new, params, transforms, obs, mask)

        def cond(carry):
            alpha, kl, k = carry
            return (kl >= self.kl_dist) & (k < 100)

        def body(carry):
            alpha, _, k = carry
            alpha = 0.9 * alpha
            return alpha, kl_at(alpha), k + 1

        alpha, kl, k = jax.lax.while_loop(cond, body,
                                          (alpha0, kl_at(alpha0), 0))
        alpha = jnp.where(k >= 100, 0.0, alpha)

        new_params = F.apply_step(pol, params, npg, alpha)
        surr_after = F.cpi_surrogate(pol, new_params, params, transforms,
                                     obs, act, adv, mask)
        kl = F.mean_kl(pol, new_params, params, transforms, obs, mask)
        return new_params, dict(alpha=alpha, delta=delta,
                                surr_before=surr_before,
                                surr_after=surr_after, kl_dist=kl)
