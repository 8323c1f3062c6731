"""Fully-connected network with learnable-data input/output transforms.

Functional counterpart of the reference FCNetwork (mjrl/utils/fc_network.py):

    out = W_n(act(... W_1((x - in_shift) / (in_scale + 1e-8)) ...)) \
          * out_scale + out_shift

The shift/scale transforms are non-trainable buffers (fc_network.py:27-37);
they are load-bearing for behavior cloning and NPG input normalization, so
they live in a separate ``Transforms`` pytree that is carried alongside the
trainable parameters but excluded from gradients/flat parameter vectors.

Init matches torch.nn.Linear defaults: W, b ~ U(-1/sqrt(fan_in), +1/sqrt(fan_in)).
Forward is a chain of batched matmuls — dense MXU work under vmap/jit.
"""

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp


class Transforms(NamedTuple):
    in_shift: Any
    in_scale: Any
    out_shift: Any
    out_scale: Any


def identity_transforms(in_dim, out_dim, dtype=jnp.float32):
    return Transforms(
        in_shift=jnp.zeros((in_dim,), dtype),
        in_scale=jnp.ones((in_dim,), dtype),
        out_shift=jnp.zeros((out_dim,), dtype),
        out_scale=jnp.ones((out_dim,), dtype),
    )


def make_transforms(in_dim, out_dim, in_shift=None, in_scale=None,
                    out_shift=None, out_scale=None, dtype=jnp.float32):
    """Build a Transforms pytree, defaulting missing entries to identity
    (fc_network.py:26-37 semantics)."""
    def _or(x, default):
        return default if x is None else jnp.asarray(x, dtype)
    return Transforms(
        in_shift=_or(in_shift, jnp.zeros((in_dim,), dtype)),
        in_scale=_or(in_scale, jnp.ones((in_dim,), dtype)),
        out_shift=_or(out_shift, jnp.zeros((out_dim,), dtype)),
        out_scale=_or(out_scale, jnp.ones((out_dim,), dtype)),
    )


def init_linear(key, in_dim, out_dim, dtype=jnp.float32):
    """torch.nn.Linear default init: U(-k, k), k = 1/sqrt(in_dim)."""
    kw, kb = jax.random.split(key)
    k = 1.0 / jnp.sqrt(jnp.asarray(in_dim, jnp.float32))
    w = jax.random.uniform(kw, (in_dim, out_dim), dtype, -1.0, 1.0) * k
    b = jax.random.uniform(kb, (out_dim,), dtype, -1.0, 1.0) * k
    return {"w": w, "b": b}


def init_mlp_params(key, in_dim, out_dim, hidden_sizes=(64, 64),
                    last_layer_scale=1.0, dtype=jnp.float32):
    """Init the layer list.  ``last_layer_scale`` supports the policy's
    small final layer (gaussian_mlp.py:33-35: last W and b scaled 1e-2)."""
    sizes = (in_dim,) + tuple(hidden_sizes) + (out_dim,)
    keys = jax.random.split(key, len(sizes) - 1)
    layers = [init_linear(k, sizes[i], sizes[i + 1], dtype)
              for i, k in enumerate(keys)]
    if last_layer_scale != 1.0:
        layers[-1] = jax.tree_util.tree_map(
            lambda p: p * last_layer_scale, layers[-1])
    return layers


def mlp_forward(layers, transforms, x, nonlinearity="tanh"):
    """Forward pass.  x: (..., in_dim) -> (..., out_dim)."""
    act = jnp.tanh if nonlinearity == "tanh" else jax.nn.relu
    out = (x - transforms.in_shift) / (transforms.in_scale + 1e-8)
    for layer in layers[:-1]:
        out = act(out @ layer["w"] + layer["b"])
    out = out @ layers[-1]["w"] + layers[-1]["b"]
    return out * transforms.out_scale + transforms.out_shift
