"""Diagonal-gaussian closed forms vs scipy/analytic references.

Formula parity targets: mjrl/policies/gaussian_mlp.py:99-145.
"""

import numpy as np
import jax.numpy as jnp
from scipy import stats

from mjrl_tpu import distributions as dist


def test_log_likelihood_matches_scipy():
    rng = np.random.RandomState(0)
    d = 5
    mean = rng.randn(7, d).astype(np.float32)
    log_std = rng.randn(d).astype(np.float32) * 0.3
    acts = rng.randn(7, d).astype(np.float32)
    got = dist.log_likelihood(jnp.asarray(acts), jnp.asarray(mean),
                              jnp.asarray(log_std))
    std = np.exp(log_std)
    want = np.array([
        stats.multivariate_normal.logpdf(acts[i], mean[i], np.diag(std ** 2))
        for i in range(7)])
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_kl_matches_analytic():
    rng = np.random.RandomState(1)
    d = 4
    mu0 = rng.randn(d)
    mu1 = rng.randn(d)
    ls0 = rng.randn(d) * 0.2
    ls1 = rng.randn(d) * 0.2
    got = dist.kl_divergence(jnp.asarray(mu0, jnp.float32),
                             jnp.asarray(ls0, jnp.float32),
                             jnp.asarray(mu1, jnp.float32),
                             jnp.asarray(ls1, jnp.float32))
    s0, s1 = np.exp(ls0), np.exp(ls1)
    want = np.sum(np.log(s1 / s0) + (s0 ** 2 + (mu0 - mu1) ** 2) / (2 * s1 ** 2)
                  - 0.5)
    np.testing.assert_allclose(float(got), want, rtol=1e-4, atol=1e-5)


def test_kl_zero_for_identical():
    mu = jnp.asarray([0.5, -0.2, 1.0])
    ls = jnp.asarray([0.1, 0.0, -0.3])
    kl = dist.kl_divergence(mu, ls, mu, ls)
    assert abs(float(kl)) < 1e-6


def test_likelihood_ratio():
    ll_new = jnp.asarray([1.0, 2.0])
    ll_old = jnp.asarray([0.5, 2.5])
    np.testing.assert_allclose(dist.likelihood_ratio(ll_new, ll_old),
                               np.exp([0.5, -0.5]), rtol=1e-5)


def test_sample_statistics():
    import jax
    key = jax.random.PRNGKey(0)
    mean = jnp.asarray([1.0, -2.0])
    log_std = jnp.asarray([0.0, 0.5])
    keys = jax.random.split(key, 20000)
    samples = jax.vmap(lambda k: dist.sample(k, mean, log_std))(keys)
    np.testing.assert_allclose(np.mean(samples, axis=0), [1.0, -2.0],
                               atol=0.05)
    np.testing.assert_allclose(np.std(samples, axis=0),
                               np.exp([0.0, 0.5]), atol=0.05)
