"""Gaussian policies (MLP and linear) — functional core + stateful wrapper.

Capability parity with mjrl/policies/gaussian_mlp.py and gaussian_linear.py:

- MLP mean network + state-independent learnable ``log_std``.
- Last layer init scaled by 1e-2 (gaussian_mlp.py:33-35).
- ``min_log_std`` clamp applied on every parameter set (gaussian_mlp.py:74-87).
- A frozen "old" parameter copy for likelihood ratios / KL (gaussian_mlp.py:39-45).
- action = mean + exp(log_std) * N(0, I) (gaussian_mlp.py:91-97).

The functional core (``GaussianMLP`` static config + pure methods over
parameter pytrees) is what jitted training steps use; the ``Policy`` wrapper
gives the reference's stateful host-side API (get_action, get/set_param_values)
for scripts, pickling, and evaluation.
"""

from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mjrl_tpu import distributions as dist
from mjrl_tpu.models.fc_network import (
    identity_transforms, init_mlp_params, mlp_forward)
from mjrl_tpu.ops.flat import ravel


@dataclass(frozen=True)
class GaussianMLP:
    """Static policy configuration; all methods are pure."""
    obs_dim: int
    act_dim: int
    hidden_sizes: Tuple[int, ...] = (64, 64)
    min_log_std: float = -3.0
    init_log_std: float = 0.0
    nonlinearity: str = "tanh"

    # ---- init -------------------------------------------------------
    def init(self, key, dtype=jnp.float32):
        """Returns (params, transforms).  params = {'layers': [...],
        'log_std': (act_dim,)}."""
        layers = init_mlp_params(
            key, self.obs_dim, self.act_dim, self.hidden_sizes,
            last_layer_scale=1e-2, dtype=dtype)
        log_std = jnp.ones((self.act_dim,), dtype) * self.init_log_std
        params = {"layers": layers, "log_std": log_std}
        transforms = identity_transforms(self.obs_dim, self.act_dim, dtype)
        return params, transforms

    # ---- core functions ----------------------------------------------
    def mean(self, params, transforms, obs):
        return mlp_forward(params["layers"], transforms, obs, self.nonlinearity)

    def dist_info(self, params, transforms, obs):
        """-> (mean, log_std) with log_std broadcast over the batch."""
        mu = self.mean(params, transforms, obs)
        return mu, params["log_std"]

    def log_likelihood(self, params, transforms, obs, act):
        mu, log_std = self.dist_info(params, transforms, obs)
        return dist.log_likelihood(act, mu, log_std)

    def sample(self, params, transforms, obs, key):
        mu, log_std = self.dist_info(params, transforms, obs)
        return dist.sample(key, mu, log_std)

    def act(self, params, transforms, obs, key):
        """-> (action, info) matching get_action's agent_info contract
        (gaussian_mlp.py:91-97): info = {mean, log_std, evaluation}."""
        mu, log_std = self.dist_info(params, transforms, obs)
        action = dist.sample(key, mu, log_std)
        return action, {"mean": mu, "log_std": log_std, "evaluation": mu}

    def mean_kl(self, params_new, params_old, transforms, obs):
        mu_n, ls_n = self.dist_info(params_new, transforms, obs)
        mu_o, ls_o = self.dist_info(params_old, transforms, obs)
        ls_n = jnp.broadcast_to(ls_n, mu_n.shape)
        ls_o = jnp.broadcast_to(ls_o, mu_o.shape)
        return dist.mean_kl(mu_o, ls_o, mu_n, ls_n)

    def clamp(self, params):
        """Clamp log_std at min_log_std — applied on every parameter set
        (gaussian_mlp.py:74-77)."""
        return {**params,
                "log_std": jnp.maximum(params["log_std"], self.min_log_std)}


def GaussianLinear(obs_dim, act_dim, min_log_std=-3.0, init_log_std=0.0):
    """Linear gaussian policy = MLP with no hidden layers
    (mjrl/policies/gaussian_linear.py:32)."""
    return GaussianMLP(obs_dim, act_dim, hidden_sizes=(),
                       min_log_std=min_log_std, init_log_std=init_log_std)


def MLP(env_spec, hidden_sizes=(64, 64), min_log_std=-3.0, init_log_std=0.0,
        seed=None):
    """Reference-named convenience constructor (gaussian_mlp.py MLP):
    stateful Policy over a GaussianMLP from an EnvSpec."""
    cfg = GaussianMLP(env_spec.observation_dim, env_spec.action_dim,
                      tuple(hidden_sizes), min_log_std=min_log_std,
                      init_log_std=init_log_std)
    return Policy(cfg, seed=123 if seed is None else seed)


def LinearPolicy(env_spec, min_log_std=-3.0, init_log_std=0.0, seed=None):
    """Reference-named convenience constructor (gaussian_linear.py
    LinearPolicy)."""
    cfg = GaussianLinear(env_spec.observation_dim, env_spec.action_dim,
                         min_log_std=min_log_std,
                         init_log_std=init_log_std)
    return Policy(cfg, seed=123 if seed is None else seed)


class Policy:
    """Stateful host-side wrapper with the reference's policy protocol.

    Holds (params, old_params, transforms, rng key).  Used by scripts,
    evaluation rollouts and pickling; jitted training code uses the
    functional core directly.
    """

    def __init__(self, config: GaussianMLP, seed: int = 123):
        self.config = config
        key = jax.random.PRNGKey(seed)
        self.key, init_key = jax.random.split(key)
        self.params, self.transforms = config.init(init_key)
        self.old_params = jax.tree_util.tree_map(lambda x: x, self.params)
        self._flat, self._unravel = ravel(self.params)
        self.d = int(self._flat.size)

    # -- mjrl protocol --------------------------------------------------
    @property
    def m(self):
        return self.config.act_dim

    @property
    def n(self):
        return self.config.obs_dim

    def get_param_values(self):
        flat, _ = ravel(self.params)
        return np.asarray(flat, dtype=np.float64)

    def set_param_values(self, new_params, set_new=True, set_old=True):
        tree = self._unravel(jnp.asarray(new_params, jnp.float32))
        tree = self.config.clamp(tree)
        if set_new:
            self.params = tree
        if set_old:
            self.old_params = tree

    def set_transformations(self, in_shift=None, in_scale=None,
                            out_shift=None, out_scale=None):
        from mjrl_tpu.models.fc_network import make_transforms
        self.transforms = make_transforms(
            self.config.obs_dim, self.config.act_dim,
            in_shift, in_scale, out_shift, out_scale)

    def get_action(self, observation):
        obs = jnp.asarray(observation, jnp.float32).reshape(-1)
        self.key, sub = jax.random.split(self.key)
        action, info = self.config.act(self.params, self.transforms, obs, sub)
        return [np.asarray(action),
                {"mean": np.asarray(info["mean"]),
                 "log_std": np.asarray(info["log_std"]),
                 "evaluation": np.asarray(info["evaluation"])}]

    def old_dist_info(self, observations, actions):
        obs = jnp.asarray(observations, jnp.float32)
        mu, ls = self.config.dist_info(self.old_params, self.transforms, obs)
        ll = dist.log_likelihood(jnp.asarray(actions, jnp.float32), mu, ls)
        return [ll, mu, ls]

    def new_dist_info(self, observations, actions):
        obs = jnp.asarray(observations, jnp.float32)
        mu, ls = self.config.dist_info(self.params, self.transforms, obs)
        ll = dist.log_likelihood(jnp.asarray(actions, jnp.float32), mu, ls)
        return [ll, mu, ls]

    def likelihood_ratio(self, new_dist_info, old_dist_info):
        return dist.likelihood_ratio(new_dist_info[0], old_dist_info[0])

    def mean_kl(self, new_dist_info, old_dist_info):
        mu_n, mu_o = new_dist_info[1], old_dist_info[1]
        ls_n = jnp.broadcast_to(new_dist_info[2], mu_n.shape)
        ls_o = jnp.broadcast_to(old_dist_info[2], mu_o.shape)
        return dist.mean_kl(mu_o, ls_o, mu_n, ls_n)

    def log_likelihood(self, observations, actions):
        return np.asarray(self.new_dist_info(observations, actions)[0])
