"""Flat-vector <-> pytree parameter interop and pytree linear algebra.

The reference keeps policy parameters as a single flat float64 numpy vector
(mjrl/policies/gaussian_mlp.py:60-87).  On TPU we keep parameters as pytrees
(XLA-friendly, no host round-trips) and provide flat views only at the API
boundary for parity.
"""

import jax
import jax.numpy as jnp
from jax.flatten_util import ravel_pytree


def ravel(tree):
    """Pytree -> (flat 1-D array, unravel_fn)."""
    return ravel_pytree(tree)


def unravel_like(flat, tree):
    """Reshape a flat vector into the structure of ``tree``."""
    _, unravel = ravel_pytree(tree)
    return unravel(flat)


def tree_dot(a, b):
    """Sum of elementwise products over two matching pytrees (a scalar).

    Under shard_map this is the only cross-shard reduction the CG loop
    needs — a single psum per iteration.
    """
    leaves = jax.tree_util.tree_map(lambda x, y: jnp.vdot(x, y), a, b)
    return jax.tree_util.tree_reduce(jnp.add, leaves)


def tree_add_scaled(a, b, alpha):
    """a + alpha * b over pytrees."""
    return jax.tree_util.tree_map(lambda x, y: x + alpha * y, a, b)


def tree_scale(a, alpha):
    return jax.tree_util.tree_map(lambda x: alpha * x, a)


def tree_zeros_like(a):
    return jax.tree_util.tree_map(jnp.zeros_like, a)
