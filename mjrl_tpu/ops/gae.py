"""Discounted returns and GAE as reverse `lax.scan`s.

Behavioral contract follows the reference (mjrl/utils/process_samples.py:3-44):

- ``discount_sum(x, gamma, terminal)``: reverse discounted cumulative sum.
- GAE advantages use TD deltas ``r_t + gamma * V_{t+1} - V_t`` where the
  bootstrap value ``V_T`` is ``V_{T-1}`` for a time-limit truncated path and
  ``0.0`` for a genuinely terminated path (process_samples.py:23-29).

All functions operate on a single path with time as the leading axis and are
written to be ``vmap``-ed over a batch axis; batched convenience wrappers are
provided.  Everything is jit-safe (static shapes, no host sync).
"""

import jax
import jax.numpy as jnp


def discount_sum(x, gamma, terminal=0.0):
    """Reverse discounted cumsum of ``x`` (T,) with terminal bootstrap.

    y_t = x_t + gamma * y_{t+1},  y_T = terminal.
    """

    def step(carry, xt):
        carry = xt + gamma * carry
        return carry, carry

    terminal = jnp.asarray(terminal, dtype=x.dtype)
    _, ys = jax.lax.scan(step, terminal, x, reverse=True)
    return ys


def discounted_returns(rewards, gamma, mask=None):
    """Per-step discounted returns for one path of shape (T,).

    ``mask`` (optional, (T,) in {0,1}) marks valid steps; invalid steps
    contribute zero reward and receive zero return.  The discount chain is
    *not* broken by the mask (valid steps are assumed to be a prefix,
    matching fixed-horizon rollouts with tail padding).
    """
    if mask is not None:
        rewards = rewards * mask
    ret = discount_sum(rewards, gamma)
    if mask is not None:
        ret = ret * mask
    return ret


def gae_advantages(rewards, values, gamma, lam, terminated=False, mask=None):
    """GAE(lambda) advantages for one path.

    rewards: (T,), values: (T,) baseline predictions for the path states.
    terminated: scalar bool — True if the episode genuinely ended (bootstrap
    value 0), False if time-limit truncated (bootstrap with ``values[-1]``,
    reference process_samples.py:23-25).

    When ``lam`` is None, or outside [0, 1], falls back to the reference's
    "standard mode": A = returns - values (process_samples.py:11-13).
    """
    if lam is None or (isinstance(lam, float) and (lam < 0.0 or lam > 1.0)):
        returns = discounted_returns(rewards, gamma, mask)
        adv = returns - values
        if mask is not None:
            adv = adv * mask
        return adv

    terminated = jnp.asarray(terminated)
    if mask is None:
        bootstrap = jnp.where(terminated, 0.0, values[-1]).astype(values.dtype)
        v_next = jnp.concatenate([values[1:], bootstrap[None]])
        deltas = rewards + gamma * v_next - values
    else:
        # The episode may end before the grid does (early termination with
        # freeze-after-done padding).  The bootstrap must apply at the MASK
        # boundary: the TD delta of the last VALID step uses 0 when
        # terminated (reference process_samples.py:25-28), or V(last valid
        # obs) when time-limit truncated — never V(frozen post-terminal
        # obs).
        idx_last = jnp.maximum(jnp.sum(mask).astype(jnp.int32) - 1, 0)
        v_lastvalid = values[idx_last]
        bootstrap = jnp.where(terminated, 0.0, v_lastvalid).astype(values.dtype)
        v_next = jnp.concatenate([
            jnp.where(mask[1:] > 0, values[1:], bootstrap), bootstrap[None]])
        deltas = (rewards + gamma * v_next - values) * mask
    adv = discount_sum(deltas, gamma * lam)
    if mask is not None:
        adv = adv * mask
    return adv


def returns_with_dones(rewards, dones, gamma):
    """Per-step discounted returns over an autoreset grid: the discount
    chain breaks at episode boundaries (done_t = 1 at each episode's last
    step).  rewards/dones: (T,)."""
    def step(carry, xs):
        r, d = xs
        carry = r + gamma * carry * (1.0 - d)
        return carry, carry

    _, ys = jax.lax.scan(step, jnp.zeros((), rewards.dtype),
                         (rewards, dones), reverse=True)
    return ys


def gae_with_dones(rewards, values, dones, v_last, gamma, lam):
    """GAE over an autoreset grid.  v_last = V(final next obs), used to
    bootstrap the trailing (time-limit truncated) episode; terminal steps
    (done=1) bootstrap 0."""
    v_next = jnp.concatenate([values[1:], v_last[None]])
    deltas = rewards + gamma * v_next * (1.0 - dones) - values

    def step(carry, xs):
        delta, d = xs
        carry = delta + gamma * lam * (1.0 - d) * carry
        return carry, carry

    _, ys = jax.lax.scan(step, jnp.zeros((), rewards.dtype),
                         (deltas, dones), reverse=True)
    return ys


# Batched variants: leading batch axis (N, T).
batched_returns = jax.vmap(discounted_returns, in_axes=(0, None))
batched_gae = jax.vmap(gae_advantages, in_axes=(0, 0, None, None, 0))
batched_returns_dones = jax.vmap(returns_with_dones, in_axes=(0, 0, None))
batched_gae_dones = jax.vmap(gae_with_dones,
                             in_axes=(0, 0, 0, 0, None, None))


def whiten(adv, mask=None, eps=1e-6):
    """Advantage whitening exactly as the reference (batch_reinforce.py:185):
    (a - mean) / (std + 1e-6), computed over valid entries only."""
    if mask is None:
        mean = jnp.mean(adv)
        std = jnp.std(adv)
    else:
        n = jnp.maximum(jnp.sum(mask), 1.0)
        mean = jnp.sum(adv * mask) / n
        var = jnp.sum(mask * (adv - mean) ** 2) / n
        std = jnp.sqrt(var)
    out = (adv - mean) / (std + eps)
    if mask is not None:
        out = out * mask
    return out
