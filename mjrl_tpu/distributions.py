"""Diagonal-Gaussian policy distribution, closed forms.

Exact formula parity with the reference (mjrl/policies/gaussian_mlp.py:99-145):

- log-likelihood: -0.5 * sum(z^2) - sum(log_std) - 0.5 * d * log(2*pi)
- mean KL(old || new) per sample:
  sum(((mu_o - mu_n)^2 + s_o^2 - s_n^2) / (2 s_n^2 + 1e-8) + ls_n - ls_o)
- likelihood ratio: exp(LL_new - LL_old)

All functions broadcast over leading batch axes.
"""

import math

import jax.numpy as jnp

LOG_2PI = math.log(2.0 * math.pi)


def log_likelihood(actions, mean, log_std):
    """Diagonal-gaussian log density.  actions/mean: (..., d); log_std: (d,)
    or broadcastable.  Returns (...,)."""
    zs = (actions - mean) / jnp.exp(log_std)
    d = actions.shape[-1]
    return (-0.5 * jnp.sum(zs ** 2, axis=-1)
            - jnp.sum(log_std * jnp.ones_like(mean), axis=-1)
            - 0.5 * d * LOG_2PI)


def likelihood_ratio(ll_new, ll_old):
    return jnp.exp(ll_new - ll_old)


def kl_divergence(old_mean, old_log_std, new_mean, new_log_std):
    """Per-sample KL(old || new), summed over action dims. Returns (...,)."""
    old_std = jnp.exp(old_log_std)
    new_std = jnp.exp(new_log_std)
    nr = (old_mean - new_mean) ** 2 + old_std ** 2 - new_std ** 2
    dr = 2.0 * new_std ** 2 + 1e-8
    return jnp.sum(nr / dr + new_log_std - old_log_std, axis=-1)


def mean_kl(old_mean, old_log_std, new_mean, new_log_std):
    return jnp.mean(kl_divergence(old_mean, old_log_std, new_mean, new_log_std))


def sample(key, mean, log_std):
    """action = mean + exp(log_std) * N(0, I)  (gaussian_mlp.py:91-97)."""
    import jax
    noise = jax.random.normal(key, mean.shape, dtype=mean.dtype)
    return mean + jnp.exp(log_std) * noise


def entropy(log_std):
    d = log_std.shape[-1]
    return 0.5 * d * (1.0 + LOG_2PI) + jnp.sum(log_std, axis=-1)
