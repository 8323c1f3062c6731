"""MPPI actor shooting in the *real* physics engine
(reference mjrl/policies/mpc_actor.py).

The reference delegates trajectory shooting to the external ``trajopt``
package's multiprocess workers (mpc_actor.py:2, 44-51); here the candidate
action sequences roll through the batched JAX physics env in one jitted
vmap+scan — the "real simulator" and the planner share the same pure step
function.

Semantics: perturb the (non-warm-started) base sequence with filtered
noise, score with discounted return, return the softmax(kappa)-weighted
first action (mpc_actor.py:31-57).
"""

import jax
import jax.numpy as jnp
import numpy as np

from mjrl_tpu.algos.model_accel.sampling import (
    generate_perturbed_actions_batch)


class MPCActor:
    def __init__(self, env, H, paths_per_cpu,
                 num_cpu=1,
                 kappa=1.0,
                 gamma=1.0,
                 mean=None,
                 filter_coefs=None,
                 seed=123):
        fenv = env.env if hasattr(env, "env") and hasattr(env.env, "reset") \
            else env
        self.env = env
        self.fenv = fenv
        self.n, self.m = fenv.observation_dim, int(fenv.action_dim)
        # paths_per_cpu * num_cpu candidates (the reference fans them over
        # processes; here they are one batch axis)
        self.H, self.num_candidates = H, paths_per_cpu * max(num_cpu, 1)
        self.kappa, self.gamma = kappa, gamma
        self.mean = np.zeros(self.m) if mean is None else np.asarray(mean)
        self.filter_coefs = [np.ones(self.m), 1.0, 0.0, 0.0] \
            if filter_coefs is None else filter_coefs
        self.act_sequence = np.ones((self.H, self.m)) * self.mean
        self._key = jax.random.PRNGKey(seed)
        self._template_state = None
        self._plan = None
        self.ctr = 1

    def _build_planner(self):
        fenv = self.fenv
        filter_coefs = (jnp.asarray(self.filter_coefs[0], jnp.float32),
                        float(self.filter_coefs[1]),
                        float(self.filter_coefs[2]),
                        float(self.filter_coefs[3]))
        kappa, gamma = self.kappa, self.gamma
        H, P = self.H, self.num_candidates

        def plan(state, base_act, key):
            acts = generate_perturbed_actions_batch(key, base_act,
                                                    filter_coefs, P)

            def rollout(action_seq):
                def step(s, a):
                    ns = fenv.step(s, a)
                    return ns, ns.reward
                _, rewards = jax.lax.scan(step, state, action_seq)
                return jnp.sum(rewards * gamma ** jnp.arange(H))

            returns = jax.vmap(rollout)(acts)
            s = jnp.exp(kappa * (returns - jnp.max(returns)))
            act = jnp.sum(acts[:, 0, :] * s[:, None], axis=0) \
                / (jnp.sum(s) + 1e-6)
            return act

        return jax.jit(plan)

    def score_trajectory(self, paths):
        scores = np.zeros(len(paths))
        for i, p in enumerate(paths):
            disc = self.gamma ** np.arange(len(p["rewards"]))
            scores[i] = float(np.sum(p["rewards"] * disc))
        return scores

    def get_action(self, env_state):
        """env_state: the env-state dict ({qp, qv, ...}) of the current
        real-env state (mpc_actor.py:39-57 contract)."""
        if self._plan is None:
            self._plan = self._build_planner()
        if self._template_state is None:
            self._template_state = self.fenv.reset(jax.random.PRNGKey(0))
        state = self.fenv.set_env_state(self._template_state, env_state)
        self._key, sub = jax.random.split(self._key)
        self.ctr += 1
        act = self._plan(state, jnp.asarray(self.act_sequence, jnp.float32),
                         sub)
        return np.asarray(act)
