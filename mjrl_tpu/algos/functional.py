"""Pure functional algorithm cores — everything that runs under jit.

The reference's numerical core (batch_reinforce.py:40-58, npg_cg.py:62-133)
maps to:

- CPI surrogate: mean(likelihood_ratio * advantage) over valid steps.
- VPG gradient: ``jax.grad`` of the surrogate on the parameter pytree.
- Fisher-vector products: jvp-of-grad of the mean KL at the current
  parameters (+ damping) — the double-backprop HVP of npg_cg.py:62-81
  without flattening or host round-trips.
- NPG direction: pytree CG (fori_loop); step size
  alpha = sqrt(|2 delta / g.F^-1 g|) (npg_cg.py:128-133).
- Optional HVP subsampling (npg_cg.py:65-69) via a static-size random
  subset of rows.

All functions take a (policy config, params pytree, transforms) triple and
flat (batch, ...) data arrays with an optional validity mask.
"""

import jax
import jax.numpy as jnp

from mjrl_tpu import distributions as dist
from mjrl_tpu.ops.cg import cg_solve
from mjrl_tpu.ops.flat import tree_add_scaled, tree_dot


def _masked_mean(x, mask):
    if mask is None:
        return jnp.mean(x)
    return jnp.sum(x * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def log_likelihoods(policy, params, transforms, obs, act):
    mu, ls = policy.dist_info(params, transforms, obs)
    return dist.log_likelihood(act, mu, ls)


def cpi_surrogate(policy, params, params_old, transforms, obs, act, adv,
                  mask=None):
    """mean(LR * A) (batch_reinforce.py:40-46)."""
    ll_new = log_likelihoods(policy, params, transforms, obs, act)
    ll_old = jax.lax.stop_gradient(
        log_likelihoods(policy, params_old, transforms, obs, act))
    lr = jnp.exp(ll_new - ll_old)
    return _masked_mean(lr * adv, mask)


def mean_kl(policy, params_new, params_old, transforms, obs, mask=None):
    mu_n, ls_n = policy.dist_info(params_new, transforms, obs)
    mu_o, ls_o = policy.dist_info(params_old, transforms, obs)
    ls_n = jnp.broadcast_to(ls_n, mu_n.shape)
    ls_o = jnp.broadcast_to(ls_o, mu_o.shape)
    kl = dist.kl_divergence(mu_o, ls_o, mu_n, ls_n)
    return _masked_mean(kl, mask)


def vpg_grad(policy, params, params_old, transforms, obs, act, adv,
             mask=None):
    """Flat-free policy gradient (batch_reinforce.py:54-58)."""
    return jax.grad(
        lambda p: cpi_surrogate(policy, p, params_old, transforms, obs, act,
                                adv, mask))(params)


def make_hvp(policy, params, transforms, obs, mask=None, damping=1e-4,
             subsample_key=None, hvp_sample_frac=1.0):
    """Fisher-vector product at ``params``: F v + damping v.

    F is the Hessian of KL(new || old) in the new params at new = old =
    params (npg_cg.py:62-81).  With ``hvp_sample_frac`` < 1, a random
    static-size subset of rows is used (npg_cg.py:65-69).
    """
    if hvp_sample_frac < 0.99 and subsample_key is not None:
        n = obs.shape[0]
        k = max(1, int(n * hvp_sample_frac))
        idx = jax.random.permutation(subsample_key, n)[:k]
        obs = obs[idx]
        mask = None if mask is None else mask[idx]

    def kl_at(p):
        return mean_kl(policy, p, jax.lax.stop_gradient(params), transforms,
                       obs, mask)

    grad_kl = jax.grad(kl_at)

    def hvp(v):
        _, hv = jax.jvp(grad_kl, (params,), (v,))
        return tree_add_scaled(hv, v, damping)

    return hvp


def npg_direction(policy, params, transforms, obs, act, adv, mask=None,
                  damping=1e-4, cg_iters=10, subsample_key=None,
                  hvp_sample_frac=1.0):
    """-> (vpg_grad, F^-1 g) via CG (npg_cg.py:119-124)."""
    g = vpg_grad(policy, params, params, transforms, obs, act, adv, mask)
    hvp = make_hvp(policy, params, transforms, obs, mask, damping,
                   subsample_key, hvp_sample_frac)
    npg = cg_solve(hvp, g, x0=g, cg_iters=cg_iters)
    return g, npg


def npg_step_size(g, npg, n_step_size, const_alpha=None):
    """alpha = sqrt(|delta / (g . F^-1 g)|); or a constant learn rate with
    the implied delta (npg_cg.py:126-133)."""
    gng = tree_dot(g, npg)
    if const_alpha is not None:
        alpha = jnp.asarray(const_alpha)
        delta = alpha ** 2 * gng
    else:
        alpha = jnp.sqrt(jnp.abs(n_step_size / (gng + 1e-20)))
        delta = jnp.asarray(n_step_size)
    return alpha, delta


def apply_step(policy, params, direction, alpha):
    """params + alpha * direction, with the min_log_std clamp applied on
    every set (gaussian_mlp.py:74-87)."""
    new = tree_add_scaled(params, direction, alpha)
    return policy.clamp(new)
