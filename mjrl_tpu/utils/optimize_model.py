"""Generic minibatch model fitting (reference mjrl/utils/optimize_model.py
``fit_data``).

The reference loops epochs x minibatches through a torch optimizer
(optimize_model.py:7-36, including an off-by-one that silently drops the
last minibatch — not replicated).  Here the loop is one jitted
``lax.scan`` over an optax optimizer; returns per-epoch mean losses.

``fit_data(loss_fn, params, x, y, optimizer, batch_size, epochs, key)``
where ``loss_fn(params, x_batch, y_batch) -> scalar``.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax


def fit_data(loss_fn, params, x, y, optimizer=None, opt_state=None,
             batch_size=64, epochs=1, key=None, learn_rate=1e-3):
    """-> (params, opt_state, epoch_losses list)."""
    x = jnp.asarray(x)
    y = jnp.asarray(y)
    n = x.shape[0]
    bs = min(int(batch_size), n)
    num_steps = max(n // bs, 1)
    opt = optimizer or optax.adam(learn_rate)
    if opt_state is None:
        opt_state = opt.init(params)
    if key is None:
        key = jax.random.PRNGKey(0)

    @jax.jit
    def run(params, opt_state, key):
        def epoch(carry, ekey):
            params, opt_state = carry
            perm = jax.random.permutation(ekey, n)

            def step(carry, idx):
                params, opt_state = carry
                loss, g = jax.value_and_grad(loss_fn)(params, x[idx], y[idx])
                updates, opt_state = opt.update(g, opt_state, params)
                params = optax.apply_updates(params, updates)
                return (params, opt_state), loss

            batches = perm[: num_steps * bs].reshape(num_steps, bs)
            (params, opt_state), losses = jax.lax.scan(
                step, (params, opt_state), batches)
            return (params, opt_state), jnp.mean(losses)

        ekeys = jax.random.split(key, epochs)
        (params, opt_state), epoch_losses = jax.lax.scan(
            epoch, (params, opt_state), ekeys)
        return params, opt_state, epoch_losses

    params, opt_state, losses = run(params, opt_state, key)
    return params, opt_state, [float(v) for v in np.asarray(losses)]
