"""Value-function baselines: zero / linear / quadratic lstsq, and MLP.

Capability parity with mjrl/baselines/*:

- Feature maps (linear_baseline.py:11-31, mlp_baseline.py:37-59):
  obs clipped to [-10, 10] and divided by 10; a 1.0 bias column (linear/quad
  only); time features (t/1000)^{1..4}.  Quadratic adds all pairwise
  products o_i * o_j for i <= j (quadratic_baseline.py:26-31).
- Fit: regularized least squares on Monte-Carlo returns with the reg
  coefficient multiplied by 10 on NaN, up to 10 attempts
  (linear_baseline.py:49-54).
- MLP: ReLU MLP on [obs-features, 4 time features] -> scalar, Adam + MSE
  (mlp_baseline.py:11-34), regressing MC returns.
- Errors reported as relative squared error sum(e^2)/sum(R^2)
  (linear_baseline.py:44-47; MLP adds 1e-8 to the denominator).

Everything here operates on *batched fixed-shape* paths — observations
(N, T, obs_dim), returns (N, T), optional validity mask (N, T) — and is
jit/vmap safe, so baseline fitting runs on-device inside the training step
(the reference's CPU-side numpy lstsq / torch loop disappears).
"""

from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp
import optax

from mjrl_tpu.models.fc_network import identity_transforms, init_mlp_params, mlp_forward


def time_features(T, dtype=jnp.float32):
    """(T, 4) matrix of (t/1000)^{1,2,3,4} (linear_baseline.py:27-31)."""
    al = jnp.arange(T, dtype=dtype) / 1000.0
    return jnp.stack([al, al ** 2, al ** 3, al ** 4], axis=-1)


def _clip_obs(obs):
    return jnp.clip(obs, -10.0, 10.0) / 10.0


def _masked_rel_error(pred, returns, mask, eps=0.0):
    err = (returns - pred) * mask
    return jnp.sum(err ** 2) / (jnp.sum((returns * mask) ** 2) + eps)


def _lstsq_with_retry(featmat, returns, reg_coeff):
    """Solve (F^T F + reg I) c = F^T R; on NaN multiply reg by 10, up to 10
    attempts (linear_baseline.py:49-54) — as a jit-safe fori_loop."""
    ftf = featmat.T @ featmat
    ftr = featmat.T @ returns
    eye = jnp.eye(featmat.shape[-1], dtype=featmat.dtype)

    def body(i, carry):
        coeffs, found, reg = carry
        new = jnp.linalg.solve(ftf + reg * eye, ftr)
        ok = jnp.logical_not(jnp.any(jnp.isnan(new)))
        coeffs = jnp.where(found, coeffs, jnp.where(ok, new, coeffs))
        return coeffs, found | ok, reg * 10.0

    coeffs0 = jnp.zeros((featmat.shape[-1],), featmat.dtype)
    coeffs, _, _ = jax.lax.fori_loop(
        0, 10, body, (coeffs0, jnp.asarray(False), jnp.asarray(reg_coeff, featmat.dtype)))
    return coeffs


@dataclass(frozen=True)
class ZeroBaseline:
    """Predicts zeros (zero_baseline.py:13-14)."""
    obs_dim: int = 0

    def init(self):
        return ()

    def predict(self, state, obs):
        return jnp.zeros(obs.shape[:-1], dtype=obs.dtype)

    def fit(self, state, obs, returns, mask=None):
        return state, jnp.asarray(1.0), jnp.asarray(1.0)


@dataclass(frozen=True)
class LinearBaseline:
    obs_dim: int
    reg_coeff: float = 1e-5

    def num_features(self):
        return self.obs_dim + 1 + 4

    def features(self, obs):
        """obs (..., T, n) -> (..., T, n + 5): [o, 1, t^1..t^4]."""
        o = _clip_obs(obs)
        T = obs.shape[-2]
        shape = obs.shape[:-1]
        ones = jnp.ones(shape + (1,), obs.dtype)
        tf = jnp.broadcast_to(time_features(T, obs.dtype), shape + (4,))
        return jnp.concatenate([o, ones, tf], axis=-1)

    def init(self):
        # zero coeffs predict zeros, matching the un-fitted reference
        # baseline (linear_baseline.py:62-63).
        return jnp.zeros((self.num_features(),), jnp.float32)

    def predict(self, coeffs, obs):
        return self.features(obs) @ coeffs

    def fit(self, coeffs, obs, returns, mask=None):
        """obs (N, T, n), returns (N, T) -> (new_coeffs, e_before, e_after)."""
        featmat = self.features(obs).reshape(-1, self.num_features())
        rets = returns.reshape(-1)
        m = jnp.ones_like(rets) if mask is None else mask.reshape(-1)
        featmat = featmat * m[:, None]
        rets_m = rets * m
        e_before = _masked_rel_error(featmat @ coeffs, rets, m)
        new_coeffs = _lstsq_with_retry(featmat, rets_m, self.reg_coeff)
        e_after = _masked_rel_error(featmat @ new_coeffs, rets, m)
        return new_coeffs, e_before, e_after


@dataclass(frozen=True)
class QuadraticBaseline:
    obs_dim: int
    reg_coeff: float = 1e-3

    def num_features(self):
        n = self.obs_dim
        return int(n + n * (n + 1) // 2 + 1 + 4)

    def features(self, obs):
        """[o, o_i*o_j (i<=j), 1, t^1..t^4] (quadratic_baseline.py:20-40)."""
        o = _clip_obs(obs)
        n = self.obs_dim
        iu, ju = jnp.triu_indices(n)
        quad = o[..., iu] * o[..., ju]
        T = obs.shape[-2]
        shape = obs.shape[:-1]
        ones = jnp.ones(shape + (1,), obs.dtype)
        tf = jnp.broadcast_to(time_features(T, obs.dtype), shape + (4,))
        return jnp.concatenate([o, quad, ones, tf], axis=-1)

    def init(self):
        return jnp.zeros((self.num_features(),), jnp.float32)

    def predict(self, coeffs, obs):
        return self.features(obs) @ coeffs

    def fit(self, coeffs, obs, returns, mask=None):
        return LinearBaseline.fit(self, coeffs, obs, returns, mask)


@dataclass(frozen=True)
class MLPBaseline:
    """ReLU MLP on [obs-features, time features] -> scalar value
    (mlp_baseline.py:11-34).  State = (params, opt_state); the Adam state
    persists across fits like the reference's long-lived optimizer."""
    obs_dim: int
    hidden_sizes: Tuple[int, ...] = (128, 128)
    learn_rate: float = 1e-3
    reg_coef: float = 0.0
    batch_size: int = 64
    epochs: int = 1

    def _optimizer(self):
        if self.reg_coef > 0.0:
            return optax.adamw(self.learn_rate, weight_decay=self.reg_coef)
        return optax.adam(self.learn_rate)

    def num_features(self):
        return self.obs_dim + 4

    def features(self, obs):
        o = _clip_obs(obs)
        T = obs.shape[-2]
        shape = obs.shape[:-1]
        tf = jnp.broadcast_to(time_features(T, obs.dtype), shape + (4,))
        return jnp.concatenate([o, tf], axis=-1)

    def init(self, key):
        params = init_mlp_params(key, self.num_features(), 1, self.hidden_sizes)
        opt_state = self._optimizer().init(params)
        return (params, opt_state)

    def predict(self, state, obs):
        params, _ = state
        tr = identity_transforms(self.num_features(), 1, jnp.float32)
        out = mlp_forward(params, tr, self.features(obs), "relu")
        return out[..., 0]

    def fit(self, state, obs, returns, mask=None, key=None):
        """Minibatch-Adam epochs over permuted samples (optimize_model.py:7-36,
        without the reference's last-batch drop).  Requires a PRNG ``key``
        for the permutation."""
        params, opt_state = state
        feats = self.features(obs).reshape(-1, self.num_features())
        rets = returns.reshape(-1)
        m = jnp.ones_like(rets) if mask is None else mask.reshape(-1)
        n_total = rets.shape[0]
        tr = identity_transforms(self.num_features(), 1, jnp.float32)
        opt = self._optimizer()

        pred0 = mlp_forward(params, tr, feats, "relu")[..., 0]
        e_before = _masked_rel_error(pred0, rets, m, eps=1e-8)

        bs = min(self.batch_size, n_total)
        num_steps = max(n_total // bs, 1)

        def loss_fn(p, bf, br, bm):
            pred = mlp_forward(p, tr, bf, "relu")[..., 0]
            return jnp.sum(bm * (pred - br) ** 2) / jnp.maximum(jnp.sum(bm), 1.0)

        def epoch(carry, ekey):
            p, os = carry
            perm = jax.random.permutation(ekey, n_total)

            def step(carry, idx):
                p, os = carry
                bf, br, bm = feats[idx], rets[idx], m[idx]
                g = jax.grad(loss_fn)(p, bf, br, bm)
                updates, os = opt.update(g, os, p)
                p = optax.apply_updates(p, updates)
                return (p, os), ()

            batches = perm[: num_steps * bs].reshape(num_steps, bs)
            (p, os), _ = jax.lax.scan(step, (p, os), batches)
            return (p, os), ()

        if key is None:
            key = jax.random.PRNGKey(0)
        ekeys = jax.random.split(key, self.epochs)
        (params, opt_state), _ = jax.lax.scan(epoch, (params, opt_state), ekeys)

        pred1 = mlp_forward(params, tr, feats, "relu")[..., 0]
        e_after = _masked_rel_error(pred1, rets, m, eps=1e-8)
        return (params, opt_state), e_before, e_after
