"""Nested dict/array stacking helpers (reference mjrl/utils/tensor_utils.py).

Used at host boundaries when converting between list-of-paths and batched
pytrees; on-device code never needs them (pytrees + vmap replace them).
"""

import numpy as np


def flatten_tensors(tensors):
    if len(tensors) > 0:
        return np.concatenate([np.reshape(t, [-1]) for t in tensors])
    return np.asarray([])


def unflatten_tensors(flattened, tensor_shapes):
    tensor_sizes = [int(np.prod(s)) for s in tensor_shapes]
    indices = np.cumsum(tensor_sizes)[:-1]
    return [np.reshape(pair[0], pair[1]) for pair in
            zip(np.split(flattened, indices), tensor_shapes)]


def pad_tensor(x, max_len, mode="zero"):
    padding = np.zeros_like(x[0]) if mode == "zero" else x[-1]
    return np.concatenate([x, np.tile(padding, (max_len - len(x),)
                                      + (1,) * (x.ndim - 1))])


def pad_tensor_n(xs, max_len):
    ret = np.zeros((len(xs), max_len) + xs[0].shape[1:], dtype=xs[0].dtype)
    for idx, x in enumerate(xs):
        ret[idx][:len(x)] = x
    return ret


def pad_tensor_dict(tensor_dict, max_len, mode="zero"):
    return {k: (pad_tensor_dict(v, max_len, mode) if isinstance(v, dict)
                else pad_tensor(v, max_len, mode))
            for k, v in tensor_dict.items()}


def stack_tensor_list(tensor_list):
    return np.array(tensor_list)


def stack_tensor_dict_list(tensor_dict_list):
    """list of nested dicts -> nested dict of stacked arrays
    (tensor_utils.py; used by the reference sampler core.py:89-90)."""
    keys = list(tensor_dict_list[0].keys())
    ret = {}
    for k in keys:
        example = tensor_dict_list[0][k]
        if isinstance(example, dict):
            v = stack_tensor_dict_list([x[k] for x in tensor_dict_list])
        else:
            v = stack_tensor_list([x[k] for x in tensor_dict_list])
        ret[k] = v
    return ret


def concat_tensor_list(tensor_list):
    return np.concatenate(tensor_list, axis=0)


def concat_tensor_dict_list(tensor_dict_list):
    keys = list(tensor_dict_list[0].keys())
    ret = {}
    for k in keys:
        example = tensor_dict_list[0][k]
        if isinstance(example, dict):
            v = concat_tensor_dict_list([x[k] for x in tensor_dict_list])
        else:
            v = concat_tensor_list([x[k] for x in tensor_dict_list])
        ret[k] = v
    return ret


def split_tensor_dict_list(tensor_dict):
    keys = list(tensor_dict.keys())
    ret = None
    for k in keys:
        vals = tensor_dict[k]
        if isinstance(vals, dict):
            vals = split_tensor_dict_list(vals)
        if ret is None:
            ret = [{k: v} for v in vals]
        else:
            for v, cur_dict in zip(vals, ret):
                cur_dict[k] = v
    return ret


def truncate_tensor_dict(tensor_dict, truncated_len):
    ret = {}
    for k, v in tensor_dict.items():
        if isinstance(v, dict):
            ret[k] = truncate_tensor_dict(v, truncated_len)
        else:
            ret[k] = v[:truncated_len]
    return ret
