"""Host-side baseline objects with the reference protocol
(mjrl/baselines/*: ``fit(paths, return_errors) -> (e0, e1)``,
``predict(path) -> (T,)``).

Thin stateful wrappers over the functional cores in
mjrl_tpu.models.baselines; agents reach through ``.cfg`` / ``.state`` to
run the fit inside their jitted training step.  Constructors mirror the
reference signatures (env_spec first, e.g. mlp_baseline.py:11-13).
"""

import jax
import jax.numpy as jnp
import numpy as np

from mjrl_tpu.models import baselines as fb


def _paths_to_batch(paths):
    """list of path dicts (or an already-batched dict) -> (obs (N,T,n),
    returns (N,T), mask (N,T)) padded to the max length."""
    if isinstance(paths, dict):
        obs = jnp.asarray(paths["observations"])
        rets = jnp.asarray(paths["returns"])
        mask = jnp.asarray(paths.get("mask",
                                     jnp.ones(rets.shape, obs.dtype)))
        return obs, rets, mask
    T = max(len(p["rewards"]) for p in paths)
    n = paths[0]["observations"].shape[-1]
    obs = np.zeros((len(paths), T, n), np.float32)
    rets = np.zeros((len(paths), T), np.float32)
    mask = np.zeros((len(paths), T), np.float32)
    for i, p in enumerate(paths):
        t = len(p["rewards"])
        obs[i, :t] = p["observations"]
        rets[i, :t] = p["returns"]
        mask[i, :t] = 1.0
    return jnp.asarray(obs), jnp.asarray(rets), jnp.asarray(mask)


class _HostBaseline:
    needs_key = False

    def __init__(self, cfg, state):
        self.cfg = cfg
        self.state = state
        self._key = jax.random.PRNGKey(0)

    def fit(self, paths, return_errors=False):
        obs, rets, mask = _paths_to_batch(paths)
        if self.needs_key:
            self._key, sub = jax.random.split(self._key)
            self.state, e0, e1 = jax.jit(self.cfg.fit)(
                self.state, obs, rets, mask, sub)
        else:
            self.state, e0, e1 = jax.jit(self.cfg.fit)(
                self.state, obs, rets, mask)
        if return_errors:
            return float(e0), float(e1)

    def predict(self, path):
        obs = jnp.asarray(path["observations"])[None]
        return np.asarray(jax.jit(self.cfg.predict)(self.state, obs))[0]


class ZeroBaseline(_HostBaseline):
    def __init__(self, env_spec, **kwargs):
        cfg = fb.ZeroBaseline(env_spec.observation_dim)
        super().__init__(cfg, cfg.init())


class LinearBaseline(_HostBaseline):
    def __init__(self, env_spec, inp_dim=None, inp="obs", reg_coeff=1e-5):
        cfg = fb.LinearBaseline(inp_dim or env_spec.observation_dim,
                                reg_coeff=reg_coeff)
        super().__init__(cfg, cfg.init())


class QuadraticBaseline(_HostBaseline):
    def __init__(self, env_spec, inp_dim=None, inp="obs", reg_coeff=1e-3):
        cfg = fb.QuadraticBaseline(inp_dim or env_spec.observation_dim,
                                   reg_coeff=reg_coeff)
        super().__init__(cfg, cfg.init())


class MLPBaseline(_HostBaseline):
    needs_key = True

    def __init__(self, env_spec, inp_dim=None, inp="obs", learn_rate=1e-3,
                 reg_coef=0.0, batch_size=64, epochs=1, use_gpu=False,
                 hidden_sizes=(128, 128), seed=0):
        cfg = fb.MLPBaseline(inp_dim or env_spec.observation_dim,
                             hidden_sizes=tuple(hidden_sizes),
                             learn_rate=learn_rate, reg_coef=reg_coef,
                             batch_size=batch_size, epochs=epochs)
        super().__init__(cfg, cfg.init(jax.random.PRNGKey(seed)))
