"""Model-space rollouts and MPC helpers
(reference mjrl/algos/model_accel/sampling.py).

- ``policy_rollout``: batched H-step rollout of a gaussian policy through a
  learned model, noise = randn * exp(log_std), states/actions clamped to
  bounds (sampling.py:16-89) — one jitted vmap+scan.
- ``trajectory_rollout``: fixed action sequences through the model
  (sampling.py:96-123).
- ``generate_perturbed_actions``: MPPI noise with the 3-tap smoothing
  filter beta_0, beta_1, beta_2 (sampling.py:204-215).
- ``sample_paths``: real-env rollouts for MPC policies with uniform action
  noise (sampling.py:131-184).
- ``evaluate_policy`` with a real_step toggle (sampling.py:235-283).
- ``enforce_bounds`` (sampling.py:286-315).
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from mjrl_tpu.utils import tensor_utils


def enforce_bounds(x, min_val=None, max_val=None, large_value=1e4):
    """Clamp to Box[min_val, max_val], defaulting to +-large_value
    (sampling.py:286-315)."""
    lo = -large_value if min_val is None else min_val
    hi = large_value if max_val is None else max_val
    return jnp.clip(x, lo, hi)


@partial(jax.jit, static_argnums=(0, 1, 5, 6))
def _policy_rollout_core(dyn_cfg, pol_cfg, dyn_params, dyn_tr, pol_params,
                         horizon, eval_mode, pol_transforms, init_states,
                         key, bounds):
    s_min, s_max, a_min, a_max, large = bounds

    def one(s0, k):
        def step(s, kt):
            mean = pol_cfg.mean(pol_params, pol_transforms, s)
            if eval_mode:
                a = mean
            else:
                a = mean + jax.random.normal(kt, mean.shape, mean.dtype) \
                    * jnp.exp(pol_params["log_std"])
            a = enforce_bounds(a, a_min, a_max, large)
            sp = dyn_cfg.forward(dyn_params, dyn_tr, s, a)
            sp = enforce_bounds(sp, s_min, s_max, large)
            return sp, (s, a)

        ks = jax.random.split(k, horizon)
        _, (obs, act) = jax.lax.scan(step, s0, ks)
        return obs, act

    n = init_states.shape[0]
    keys = jax.random.split(key, n)
    obs, act = jax.vmap(one)(init_states, keys)
    return obs, act


def policy_rollout(num_traj, env, policy, learned_model, init_state=None,
                   eval_mode=False, horizon=1e6, env_kwargs=None, seed=None,
                   s_min=None, s_max=None, a_min=None, a_max=None,
                   large_value=1e2, key=None):
    """-> {'observations': (num_traj, H, d), 'actions': (num_traj, H, m)}
    (sampling.py:16-89)."""
    fenv = env.env if hasattr(env, "env") and hasattr(env.env, "reset") \
        else env
    if key is None:
        key = jax.random.PRNGKey(0 if seed is None else int(seed))
    if init_state is None:
        k_init, key = jax.random.split(key)
        init_states = jax.vmap(
            lambda k: fenv.reset(k).obs)(jax.random.split(k_init, num_traj))
    else:
        init_states = jnp.asarray(np.asarray(init_state), jnp.float32)
        if init_states.ndim == 1:
            init_states = jnp.tile(init_states, (num_traj, 1))
    horizon = int(min(horizon, fenv.horizon))

    from mjrl_tpu.models.policies import Policy
    if isinstance(policy, Policy):
        pol_cfg, pol_params, pol_tr = (policy.config, policy.params,
                                       policy.transforms)
    else:
        pol_cfg, pol_params, pol_tr = policy

    bounds = tuple(None if b is None else jnp.asarray(b, jnp.float32)
                   for b in (s_min, s_max, a_min, a_max)) + (
        float(large_value),)
    obs, act = _policy_rollout_core(
        learned_model.dyn_cfg, pol_cfg, learned_model.dyn_params,
        learned_model.dyn_tr, pol_params, horizon, bool(eval_mode), pol_tr,
        init_states, key, bounds)
    return dict(observations=obs, actions=act)


@partial(jax.jit, static_argnums=(0,))
def _trajectory_rollout_core(dyn_cfg, dyn_params, dyn_tr, actions,
                             init_states):
    def one(s0, acts):
        def step(s, a):
            sp = dyn_cfg.forward(dyn_params, dyn_tr, s, a)
            return sp, s

        _, obs = jax.lax.scan(step, s0, acts)
        return obs

    return jax.vmap(one)(init_states, actions)


def trajectory_rollout(actions, learned_model, init_states):
    """actions (num_traj, H, m); init_states (num_traj, d) or (d,) ->
    {'observations', 'actions'} (sampling.py:96-123)."""
    actions = jnp.asarray(np.asarray(actions), jnp.float32)
    init_states = jnp.asarray(np.asarray(init_states), jnp.float32)
    if init_states.ndim == 1:
        init_states = jnp.tile(init_states, (actions.shape[0], 1))
    obs = _trajectory_rollout_core(learned_model.dyn_cfg,
                                   learned_model.dyn_params,
                                   learned_model.dyn_tr, actions,
                                   init_states)
    return dict(observations=obs, actions=actions)


def discount_sum(x, gamma, discounted_terminal=0.0):
    y = np.zeros(len(x))
    run = discounted_terminal
    for t in range(len(x) - 1, -1, -1):
        run = x[t] + gamma * run
        y[t] = run
    return y


def generate_perturbed_actions(base_act, filter_coefs, rng=None):
    """Filtered gaussian perturbations around a base action sequence
    (sampling.py:204-215)."""
    rng = np.random if rng is None else rng
    sigma, beta_0, beta_1, beta_2 = filter_coefs
    eps = rng.normal(loc=0, scale=1.0, size=base_act.shape) * sigma
    eps = base_act + eps
    eps[0] = eps[0] * (beta_0 + beta_1 + beta_2)
    eps[1] = beta_0 * eps[1] + (beta_1 + beta_2) * eps[0]
    for i in range(2, eps.shape[0]):
        eps[i] = beta_0 * eps[i] + beta_1 * eps[i - 1] + beta_2 * eps[i - 2]
    return eps


def generate_perturbed_actions_batch(key, base_act, filter_coefs, num_traj):
    """Jax batched variant: (num_traj, H, m) filtered perturbations — used
    by the jitted MPPI planner."""
    sigma, beta_0, beta_1, beta_2 = filter_coefs
    h, m = base_act.shape
    eps = jax.random.normal(key, (num_traj, h, m), base_act.dtype) \
        * jnp.asarray(sigma, base_act.dtype)
    eps = base_act[None] + eps

    def smooth(acts):
        first = acts[0] * (beta_0 + beta_1 + beta_2)
        second = beta_0 * acts[1] + (beta_1 + beta_2) * first

        def body(carry, a):
            prev1, prev2 = carry
            cur = beta_0 * a + beta_1 * prev1 + beta_2 * prev2
            return (cur, prev1), cur

        if h <= 1:
            return first[None]
        _, rest = jax.lax.scan(body, (second, first), acts[2:])
        return jnp.concatenate([first[None], second[None], rest], axis=0)

    return jax.vmap(smooth)(eps)


def generate_paths(num_traj, learned_model, start_state, base_act,
                   filter_coefs, base_seed=None, **kwargs):
    """Perturb + rollout (sampling.py:218-232)."""
    rng = np.random.RandomState(base_seed) if base_seed is not None \
        else np.random
    act = np.array([generate_perturbed_actions(base_act, filter_coefs, rng)
                    for _ in range(num_traj)])
    return trajectory_rollout(act, learned_model, start_state)


def sample_paths(num_traj, env, policy, horizon=1e6, eval_mode=True,
                 base_seed=None, noise_level=0.1):
    """Real-env rollouts for MPC-style policies, with optional uniform
    action noise when not in eval mode (sampling.py:131-184)."""
    from mjrl_tpu.envs.gym_env import GymEnv
    if isinstance(env, str):
        env = GymEnv(env)
    elif callable(env) and not hasattr(env, "step"):
        env = env()
    if base_seed is not None:
        env.set_seed(base_seed)
    rng = np.random.RandomState(base_seed)
    horizon = int(min(horizon, env.horizon))
    paths = []
    for ep in range(num_traj):
        env.reset()
        observations, actions, rewards, env_infos = [], [], [], []
        t, done = 0, False
        while t < horizon and done is False:
            obs = env.get_obs()
            ifo = env.get_env_infos()
            act = policy.get_action(obs)
            if eval_mode is False and not isinstance(act, list):
                act = act + rng.uniform(-noise_level, noise_level,
                                        size=act.shape[0])
            if isinstance(act, list):
                act = act[0] if eval_mode is False else act[1]["evaluation"]
            next_obs, reward, done, _ = env.step(act)
            t += 1
            observations.append(obs)
            actions.append(act)
            rewards.append(reward)
            env_infos.append(ifo)
        paths.append(dict(
            observations=np.array(observations),
            actions=np.array(actions),
            rewards=np.array(rewards),
            terminated=done,
            env_infos=tensor_utils.stack_tensor_dict_list(env_infos)))
    return paths


def evaluate_policy(e, policy, learned_model, noise_level=0.0,
                    real_step=True, num_episodes=10, visualize=False,
                    seed=None):
    """Evaluate a policy's mean action on the real env (real_step=True) or
    by stepping the learned model and re-scoring with the env's batched
    reward (real_step=False) (sampling.py:235-283)."""
    rng = np.random.RandomState(seed)
    paths = []
    for ep in range(num_episodes):
        e.reset()
        observations, actions, rewards, env_infos = [], [], [], []
        o = e.get_obs()
        for t in range(e.horizon):
            a = policy.get_action(o)
            if isinstance(a, list):
                a = a[1]["evaluation"]
            if noise_level > 0.0:
                a = a + rng.uniform(-noise_level, noise_level,
                                    size=a.shape[0])
            if real_step:
                next_o, r, done, ifo = e.step(a)
            else:
                next_o = learned_model.predict(o.reshape(1, -1),
                                               np.asarray(a).reshape(1, -1)
                                               )[0]
                r, done, ifo = 0.0, False, {}
            observations.append(o)
            actions.append(np.asarray(a))
            rewards.append(r)
            env_infos.append(ifo)
            o = next_o
            if done:
                break
        path = dict(observations=np.array(observations),
                    actions=np.array(actions),
                    rewards=np.array(rewards))
        if real_step is False and hasattr(e.env, "compute_path_rewards"):
            batched = dict(
                observations=path["observations"][None],
                actions=path["actions"][None])
            e.env.compute_path_rewards(batched)
            path["rewards"] = np.asarray(batched["rewards"])[0]
        paths.append(path)
    return paths
