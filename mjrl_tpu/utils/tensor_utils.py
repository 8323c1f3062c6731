"""Host-side helpers for nested-dict path data.

The reference carries a 150-line module of hand-rolled recursion for
this (mjrl/utils/tensor_utils.py); here nested dicts are just pytrees,
so stacking/splitting is `jax.tree_util.tree_map` over numpy leaves.
Only the helpers actually used at host boundaries are kept — on-device
code never needs any of this (vmap + pytrees replace it).
"""

import jax
import numpy as np


def stack_tensor_dict_list(dicts):
    """List of (nested) dicts of arrays -> one dict of stacked arrays,
    new leading axis (reference sampler contract, core.py:89-90)."""
    return jax.tree_util.tree_map(lambda *xs: np.stack(xs), *dicts)


def concat_tensor_dict_list(dicts):
    """Like :func:`stack_tensor_dict_list` but concatenates along the
    existing leading axis."""
    return jax.tree_util.tree_map(
        lambda *xs: np.concatenate(xs, axis=0), *dicts)


def split_tensor_dict_list(tensor_dict):
    """Inverse of :func:`stack_tensor_dict_list`: dict of arrays with a
    common leading axis -> list of per-index dicts."""
    n = len(jax.tree_util.tree_leaves(tensor_dict)[0])
    return [jax.tree_util.tree_map(lambda x: x[i], tensor_dict)
            for i in range(n)]


def flatten_tensors(tensors):
    """Concatenate arbitrary-shape arrays into one flat f64 vector."""
    if not len(tensors):
        return np.asarray([])
    return np.concatenate([np.ravel(t) for t in tensors])


def unflatten_tensors(flat, shapes):
    """Inverse of :func:`flatten_tensors` given the original shapes."""
    sizes = np.cumsum([int(np.prod(s)) for s in shapes])[:-1]
    return [c.reshape(s) for c, s in zip(np.split(flat, sizes), shapes)]


def pad_tensor_n(xs, max_len):
    """Ragged list of (T_i, ...) arrays -> zero-padded (N, max_len, ...)."""
    out = np.zeros((len(xs), max_len) + xs[0].shape[1:], dtype=xs[0].dtype)
    for i, x in enumerate(xs):
        out[i, :len(x)] = x
    return out
