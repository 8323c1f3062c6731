"""Learned dynamics and reward models (reference
mjrl/algos/model_accel/nn_dynamics.py).

Parity contracts:
- DynamicsNet: MLP on normalized (s, a); output de-normalized with
  out * (out_scale + 1e-8) + out_shift, masked where out_scale < 1e-8
  (dimensions with negligible variation are frozen), residual + s
  (nn_dynamics.py:230-245).
- fit_dynamics: shift = mean, scale = mean |x - shift| statistics from the
  data; trains in the normalized space with output transforms disabled;
  minibatch Adam over permuted samples with a ``max_steps`` early stop
  (nn_dynamics.py:87-116, 344-385).
- RewardNet: r = f(s, a, s'_pred) on normalized inputs
  (nn_dynamics.py:262-328).

TPU-first: the fit loop is one jitted ``lax.scan``; ``WorldModelEnsemble``
vmaps init/fit/predict over a stacked model axis, replacing the reference
runner's sequential per-model loop (run_model_accel_npg.py:170-178).
"""

from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax


@dataclass(frozen=True)
class DynamicsNetCfg:
    state_dim: int
    act_dim: int
    hidden_size: Tuple[int, ...] = (64, 64)
    activation: str = "relu"
    residual: bool = True
    use_mask: bool = True

    @property
    def out_dim(self):
        return self.state_dim

    def init(self, key):
        from mjrl_tpu.models.fc_network import init_mlp_params
        layers = init_mlp_params(key, self.state_dim + self.act_dim,
                                 self.out_dim, self.hidden_size)
        transforms = identity_model_transforms(self.state_dim, self.act_dim,
                                               self.out_dim)
        return layers, transforms

    def forward(self, layers, tr, s, a, apply_out_transforms=True):
        act_fn = jax.nn.relu if self.activation == "relu" else jnp.tanh
        s_in = (s - tr["s_shift"]) / (tr["s_scale"] + 1e-8)
        a_in = (a - tr["a_shift"]) / (tr["a_scale"] + 1e-8)
        out = jnp.concatenate([s_in, a_in], axis=-1)
        for layer in layers[:-1]:
            out = act_fn(out @ layer["w"] + layer["b"])
        out = out @ layers[-1]["w"] + layers[-1]["b"]
        if apply_out_transforms:
            out = out * (tr["out_scale"] + 1e-8) + tr["out_shift"]
            if self.use_mask:
                out = out * (tr["out_scale"] >= 1e-8)
            if self.residual:
                out = out + s
        return out


@dataclass(frozen=True)
class RewardNetCfg:
    state_dim: int
    act_dim: int
    hidden_size: Tuple[int, ...] = (100, 100)
    activation: str = "relu"

    def init(self, key):
        from mjrl_tpu.models.fc_network import init_mlp_params
        layers = init_mlp_params(
            key, 2 * self.state_dim + self.act_dim, 1, self.hidden_size)
        tr = identity_model_transforms(self.state_dim, self.act_dim, 1)
        tr["out_shift"] = jnp.zeros((), jnp.float32)
        tr["out_scale"] = jnp.ones((), jnp.float32)
        return layers, tr

    def forward(self, layers, tr, s, a, sp):
        act_fn = jax.nn.relu if self.activation == "relu" else jnp.tanh
        s_in = (s - tr["s_shift"]) / (tr["s_scale"] + 1e-8)
        a_in = (a - tr["a_shift"]) / (tr["a_scale"] + 1e-8)
        sp_in = (sp - tr["s_shift"]) / (tr["s_scale"] + 1e-8)
        out = jnp.concatenate([s_in, a_in, sp_in], axis=-1)
        for layer in layers[:-1]:
            out = act_fn(out @ layer["w"] + layer["b"])
        out = out @ layers[-1]["w"] + layers[-1]["b"]
        return out * (tr["out_scale"] + 1e-8) + tr["out_shift"]


def identity_model_transforms(state_dim, act_dim, out_dim,
                              dtype=jnp.float32):
    return {
        "s_shift": jnp.zeros(state_dim, dtype),
        "s_scale": jnp.ones(state_dim, dtype),
        "a_shift": jnp.zeros(act_dim, dtype),
        "a_scale": jnp.ones(act_dim, dtype),
        "out_shift": jnp.zeros(out_dim, dtype),
        "out_scale": jnp.ones(out_dim, dtype),
    }


def data_transforms(s, a, target):
    """shift = mean; scale = mean |x - shift| (nn_dynamics.py:100-104)."""
    s_shift, a_shift = jnp.mean(s, axis=0), jnp.mean(a, axis=0)
    s_scale = jnp.mean(jnp.abs(s - s_shift), axis=0)
    a_scale = jnp.mean(jnp.abs(a - a_shift), axis=0)
    out_shift = jnp.mean(target, axis=0)
    out_scale = jnp.mean(jnp.abs(target - out_shift), axis=0)
    return s_shift, s_scale, a_shift, a_scale, out_shift, out_scale


def fit_scan(loss_fn, params, opt, opt_state, n, mb_size, epochs, max_steps,
             key):
    """Generic jitted epoch/minibatch Adam loop (nn_dynamics.py:344-385):
    permutation WITHOUT replacement per epoch, early stop after max_steps
    total gradient steps (steps beyond the cap become no-ops)."""
    num_steps = max(int(n // mb_size), 1)
    total_allowed = int(min(epochs * num_steps, max_steps))

    def epoch_fn(carry, ekey):
        params, opt_state, steps = carry
        perm = jax.random.permutation(ekey, n)

        def mb_step(carry, idx):
            params, opt_state, steps = carry
            live = steps < total_allowed
            loss, g = jax.value_and_grad(loss_fn)(params, idx)
            updates, new_os = opt.update(g, opt_state, params)
            new_p = optax.apply_updates(params, updates)
            params = jax.tree_util.tree_map(
                lambda new, old: jnp.where(live, new, old), new_p, params)
            opt_state = jax.tree_util.tree_map(
                lambda new, old: jnp.where(live, new, old), new_os, opt_state)
            return (params, opt_state, steps + 1), loss * live

        batches = perm[: num_steps * mb_size].reshape(num_steps, mb_size)
        (params, opt_state, steps), losses = jax.lax.scan(
            mb_step, (params, opt_state, steps), batches)
        return (params, opt_state, steps), jnp.sum(losses) / num_steps

    ekeys = jax.random.split(key, epochs)
    (params, opt_state, _), epoch_losses = jax.lax.scan(
        epoch_fn, (params, opt_state, 0), ekeys)
    return params, opt_state, epoch_losses


class WorldModel:
    """Host-side wrapper with the reference WorldModel API
    (nn_dynamics.py:7-147): forward/predict/reward, fit_dynamics/fit_reward,
    compute_path_rewards, compute_loss."""

    def __init__(self, state_dim, act_dim,
                 learn_reward=False,
                 hidden_size=(64, 64),
                 seed=123,
                 fit_lr=1e-3,
                 fit_wd=0.0,
                 device="tpu",
                 activation="relu",
                 residual=True,
                 *args, **kwargs):
        self.state_dim, self.act_dim = state_dim, act_dim
        self.learn_reward = learn_reward
        self._fit_lr, self._fit_wd = fit_lr, fit_wd
        self.dyn_cfg = DynamicsNetCfg(state_dim, act_dim,
                                      tuple(hidden_size),
                                      activation=activation,
                                      residual=residual)
        key = jax.random.PRNGKey(seed)
        k_dyn, k_rew, self._key = jax.random.split(key, 3)
        self.dyn_params, self.dyn_tr = self.dyn_cfg.init(k_dyn)
        opt = optax.adamw(fit_lr, weight_decay=fit_wd) if fit_wd > 0 \
            else optax.adam(fit_lr)
        self._dyn_opt = opt
        self.dyn_opt_state = opt.init(self.dyn_params)
        if learn_reward:
            self.rew_cfg = RewardNetCfg(state_dim, act_dim,
                                        activation=activation)
            self.rew_params, self.rew_tr = self.rew_cfg.init(k_rew)
            self._rew_opt = optax.adamw(fit_lr, weight_decay=fit_wd) \
                if fit_wd > 0 else optax.adam(fit_lr)
            self.rew_opt_state = self._rew_opt.init(self.rew_params)
        else:
            self.rew_cfg = None
        self._fit_cache = {}

    # -- pickling: drop jitted caches and optimizer closures; rebuild on
    # load (the reference pickles WorldModels/agents routinely,
    # run_model_accel_npg.py:247-253) ---------------------------------
    def __getstate__(self):
        state = self.__dict__.copy()
        state.pop("_fit_cache", None)
        state.pop("_dyn_opt", None)
        state.pop("_rew_opt", None)
        return state

    def __setstate__(self, state):
        self.__dict__.update(state)
        self._fit_cache = {}
        opt = optax.adamw(self._fit_lr, weight_decay=self._fit_wd) \
            if self._fit_wd > 0 else optax.adam(self._fit_lr)
        self._dyn_opt = opt
        if self.learn_reward:
            self._rew_opt = optax.adamw(
                self._fit_lr, weight_decay=self._fit_wd) \
                if self._fit_wd > 0 else optax.adam(self._fit_lr)

    # -- device-compat no-ops (reference nn_dynamics.py:40-45) -----------
    def to(self, device):
        return self

    def is_cuda(self):
        return False

    # -- forward / predict ----------------------------------------------
    def forward(self, s, a):
        return self.dyn_cfg.forward(self.dyn_params, self.dyn_tr,
                                    jnp.asarray(s, jnp.float32),
                                    jnp.asarray(a, jnp.float32))

    def predict(self, s, a):
        return np.asarray(self.forward(s, a))

    def reward(self, s, a):
        if not self.learn_reward:
            print("Reward model is not learned. Use the reward function "
                  "from env.")
            return None
        s = jnp.asarray(s, jnp.float32)
        a = jnp.asarray(a, jnp.float32)
        sp = jax.lax.stop_gradient(
            self.dyn_cfg.forward(self.dyn_params, self.dyn_tr, s, a))
        return self.rew_cfg.forward(self.rew_params, self.rew_tr, s, a, sp)

    def compute_loss(self, s, a, s_next):
        pred = self.forward(s, a)
        return float(jnp.mean((pred - jnp.asarray(s_next, jnp.float32))
                              ** 2))

    # -- fitting ---------------------------------------------------------
    def fit_dynamics(self, s, a, sp, fit_mb_size, fit_epochs, max_steps=1e4,
                     set_transformations=True, *args, **kwargs):
        s = jnp.asarray(s, jnp.float32)
        a = jnp.asarray(a, jnp.float32)
        sp = jnp.asarray(sp, jnp.float32)
        target = sp - s if self.dyn_cfg.residual else sp
        if set_transformations:
            (s_sh, s_sc, a_sh, a_sc,
             out_sh, out_sc) = data_transforms(s, a, target)
            self.dyn_tr = dict(s_shift=s_sh, s_scale=s_sc, a_shift=a_sh,
                               a_scale=a_sc, out_shift=out_sh,
                               out_scale=out_sc)
        tr = self.dyn_tr
        y = (target - tr["out_shift"]) / (tr["out_scale"] + 1e-8)

        fit = self._get_fit_fn("dyn", int(s.shape[0]), int(fit_mb_size),
                               int(fit_epochs), int(max_steps))
        self._key, sub = jax.random.split(self._key)
        self.dyn_params, self.dyn_opt_state, losses = fit(
            self.dyn_params, self.dyn_opt_state, s, a, y, tr, sub)
        return [float(x) for x in np.asarray(losses)]

    def _get_fit_fn(self, kind, n, mb, epochs, max_steps):
        cache_key = (kind, n, mb, epochs, max_steps)
        if cache_key in self._fit_cache:
            return self._fit_cache[cache_key]
        if kind == "dyn":
            cfg, opt = self.dyn_cfg, self._dyn_opt

            def fit(params, opt_state, s, a, y, tr, key):
                def loss_fn(p, idx):
                    pred = cfg.forward(p, tr, s[idx], a[idx],
                                       apply_out_transforms=False)
                    return jnp.mean((pred - y[idx]) ** 2)
                return fit_scan(loss_fn, params, opt, opt_state, n, mb,
                                epochs, max_steps, key)
        else:
            cfg, opt = self.rew_cfg, self._rew_opt

            def fit(params, opt_state, s, a, sp_r, tr, key):
                sp, r = sp_r
                def loss_fn(p, idx):
                    pred = cfg.forward(p, tr, s[idx], a[idx], sp[idx])
                    return jnp.mean((pred - r[idx]) ** 2)
                return fit_scan(loss_fn, params, opt, opt_state, n, mb,
                                epochs, max_steps, key)
        self._fit_cache[cache_key] = jax.jit(fit)
        return self._fit_cache[cache_key]

    def fit_reward(self, s, a, r, fit_mb_size, fit_epochs, max_steps=1e4,
                   set_transformations=True, *args, **kwargs):
        if not self.learn_reward:
            print("Reward model was not initialized to be learnable.")
            return None
        r = np.asarray(r)
        assert r.ndim == 2 and r.shape[1] == 1, \
            "r should be a 2D tensor of shape (N, 1)"
        s = jnp.asarray(s, jnp.float32)
        a = jnp.asarray(a, jnp.float32)
        r = jnp.asarray(r, jnp.float32)
        if set_transformations:
            s_sh, s_sc, a_sh, a_sc, r_sh, r_sc = data_transforms(s, a, r)
            self.rew_tr = dict(s_shift=s_sh, s_scale=s_sc, a_shift=a_sh,
                               a_scale=a_sc, out_shift=r_sh[0],
                               out_scale=r_sc[0])
        tr = self.rew_tr
        sp = jax.lax.stop_gradient(
            self.dyn_cfg.forward(self.dyn_params, self.dyn_tr, s, a))
        fit = self._get_fit_fn("rew", int(s.shape[0]), int(fit_mb_size),
                               int(fit_epochs), int(max_steps))
        self._key, sub = jax.random.split(self._key)
        self.rew_params, self.rew_opt_state, losses = fit(
            self.rew_params, self.rew_opt_state, s, a, (sp, r), tr, sub)
        return [float(x) for x in np.asarray(losses)]

    def compute_path_rewards(self, paths):
        """paths['observations'] (N, H, d), ['actions'] (N, H, m) ->
        populates paths['rewards'] (N, H) (nn_dynamics.py:149-163)."""
        if not self.learn_reward:
            print("Reward model is not learned. Use the reward function "
                  "from env.")
            return None
        s, a = paths["observations"], paths["actions"]
        n, h, d = s.shape
        r = self.reward(s.reshape(-1, d), a.reshape(-1, a.shape[-1]))
        paths["rewards"] = np.asarray(r).reshape(n, h)
        return paths


class WorldModelEnsemble:
    """vmap-stacked ensemble of WorldModels: one fit/predict call trains
    and queries all members in parallel on device (replaces the sequential
    ensemble loop at run_model_accel_npg.py:170-178)."""

    def __init__(self, num_models, state_dim, act_dim, seed=123, mesh=None,
                 **kwargs):
        self.members = [WorldModel(state_dim, act_dim, seed=seed + i,
                                   **kwargs) for i in range(num_models)]
        self.num_models = num_models
        # optional jax.sharding.Mesh: the stacked model axis shards across
        # devices (ensemble parallelism) — each chip fits its members
        self.mesh = mesh
        self._fit_cache = {}

    def _shard_stacked(self, tree):
        if self.mesh is None:
            return tree
        from jax.sharding import NamedSharding, PartitionSpec as P
        sharding = NamedSharding(self.mesh, P(self.mesh.axis_names[0]))
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(x, sharding), tree)

    def __len__(self):
        return self.num_models

    def __iter__(self):
        return iter(self.members)

    def __getitem__(self, i):
        return self.members[i]

    def fit_dynamics(self, s, a, sp, fit_mb_size, fit_epochs, max_steps=1e4,
                     **kwargs):
        """Fit every member on the same data, each with its own minibatch
        stream.  Stacked-vmap execution."""
        cfg = self.members[0].dyn_cfg
        s = jnp.asarray(s, jnp.float32)
        a = jnp.asarray(a, jnp.float32)
        sp = jnp.asarray(sp, jnp.float32)
        target = sp - s if cfg.residual else sp
        (s_sh, s_sc, a_sh, a_sc, out_sh, out_sc) = \
            data_transforms(s, a, target)
        tr = dict(s_shift=s_sh, s_scale=s_sc, a_shift=a_sh, a_scale=a_sc,
                  out_shift=out_sh, out_scale=out_sc)
        y = (target - out_sh) / (out_sc + 1e-8)

        stacked = jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs), *[m.dyn_params for m in self.members])
        stacked_os = jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs),
            *[m.dyn_opt_state for m in self.members])
        opt = self.members[0]._dyn_opt

        cache_key = (int(s.shape[0]), int(fit_mb_size), int(fit_epochs),
                     int(max_steps))
        if cache_key not in self._fit_cache:
            n, mb, epochs, msteps = cache_key

            def fit_all(stacked, stacked_os, s, a, y, tr, keys):
                def loss_of(s, a, y):
                    def loss_fn(p, idx):
                        pred = cfg.forward(p, tr, s[idx], a[idx],
                                           apply_out_transforms=False)
                        return jnp.mean((pred - y[idx]) ** 2)
                    return loss_fn

                def fit_one(params, opt_state, key):
                    return fit_scan(loss_of(s, a, y), params, opt,
                                    opt_state, n, mb, epochs, msteps, key)

                return jax.vmap(fit_one)(stacked, stacked_os, keys)

            self._fit_cache[cache_key] = jax.jit(fit_all)

        keys = jnp.stack([jax.random.fold_in(m._key, 7)
                          for m in self.members])
        stacked = self._shard_stacked(stacked)
        stacked_os = self._shard_stacked(stacked_os)
        keys = self._shard_stacked(keys)
        new_params, new_os, losses = self._fit_cache[cache_key](
            stacked, stacked_os, s, a, y, tr, keys)
        for i, m in enumerate(self.members):
            m.dyn_params = jax.tree_util.tree_map(lambda x: x[i], new_params)
            m.dyn_opt_state = jax.tree_util.tree_map(lambda x: x[i], new_os)
            m.dyn_tr = tr
            m._key = jax.random.fold_in(m._key, 13)
        return np.asarray(losses)  # (num_models, epochs)

    def predict_all(self, s, a):
        """(num_models, N, d) stacked next-state predictions."""
        cfg = self.members[0].dyn_cfg
        s = jnp.asarray(s, jnp.float32)
        a = jnp.asarray(a, jnp.float32)
        stacked = jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs), *[m.dyn_params for m in self.members])
        trs = jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs), *[m.dyn_tr for m in self.members])
        return jax.vmap(lambda p, tr: cfg.forward(p, tr, s, a))(stacked, trs)
