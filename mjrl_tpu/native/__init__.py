"""Native (C++) host-side runtime ops with transparent numpy fallback.

Compiled lazily on first use with g++ into a per-repo shared object and
bound via ctypes (no pybind11 dependency).  If no toolchain is available
the pure-numpy fallbacks are used — results are identical.

Exposed ops (see src/pathops.cpp):
- ``pack_paths(list_of_2d_arrays) -> (padded (N,T,D), mask (N,T))``
- ``discount_sums(list_of_1d, gamma) -> list_of_1d``
- ``gae_advantages(rewards_list, values_list, terminated, gamma, lam)``
"""

import ctypes
import logging
import os
import subprocess
import tempfile

import numpy as np

_HERE = os.path.dirname(__file__)
_SRC = os.path.join(_HERE, "src", "pathops.cpp")
_SO = os.path.join(_HERE, "_pathops.so")

_lib = None
_tried = False
_log = logging.getLogger(__name__)


def _compile():
    """Compile to a temp file and atomically rename into place so that
    concurrent importers never dlopen a partially written .so."""
    fd, tmp = tempfile.mkstemp(suffix=".so", dir=_HERE)
    os.close(fd)
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", _SRC, "-o", tmp],
            check=True, capture_output=True)
        os.rename(tmp, _SO)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    try:
        if (not os.path.exists(_SO)
                or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
            _compile()
        lib = ctypes.CDLL(_SO)
        i64p = ctypes.POINTER(ctypes.c_int64)
        f32p = ctypes.POINTER(ctypes.c_float)
        f64p = ctypes.POINTER(ctypes.c_double)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        lib.pack_paths.argtypes = [f32p, i64p, ctypes.c_int64,
                                   ctypes.c_int64, ctypes.c_int64, f32p,
                                   f32p]
        lib.discount_sums.argtypes = [f64p, i64p, ctypes.c_int64,
                                      ctypes.c_double, f64p]
        lib.gae_advantages.argtypes = [f64p, f64p, i64p, u8p,
                                       ctypes.c_int64, ctypes.c_double,
                                       ctypes.c_double, f64p]
        _lib = lib
    except Exception as exc:
        _log.warning("native pathops unavailable (%s); using the numpy "
                     "fallback — results are identical, only slower", exc)
        _lib = None
    return _lib


def _ptr(arr, ctype):
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


def available():
    return _load() is not None


def pack_paths(arrays, max_len=None):
    """list of (len_i, D) float arrays -> ((N, T, D) f32, (N, T) f32
    mask)."""
    n = len(arrays)
    dim = arrays[0].shape[1] if arrays[0].ndim > 1 else 1
    lengths = np.array([a.shape[0] for a in arrays], np.int64)
    T = int(max_len or lengths.max())
    out = np.zeros((n, T, dim), np.float32)
    mask = np.zeros((n, T), np.float32)
    lib = _load()
    if lib is not None:
        flat = np.ascontiguousarray(
            np.concatenate([a.reshape(a.shape[0], dim) for a in arrays]),
            np.float32)
        lib.pack_paths(_ptr(flat, ctypes.c_float),
                       _ptr(lengths, ctypes.c_int64), n, T, dim,
                       _ptr(out, ctypes.c_float),
                       _ptr(mask, ctypes.c_float))
    else:
        for i, a in enumerate(arrays):
            t = min(a.shape[0], T)
            out[i, :t] = a.reshape(a.shape[0], dim)[:t]
            mask[i, :t] = 1.0
    return out, mask


def discount_sums(xs, gamma):
    """list of (len_i,) arrays -> list of same-shape reverse discounted
    sums."""
    lib = _load()
    lengths = np.array([len(x) for x in xs], np.int64)
    flat = np.ascontiguousarray(np.concatenate(xs), np.float64)
    out = np.empty_like(flat)
    if lib is not None:
        lib.discount_sums(_ptr(flat, ctypes.c_double),
                          _ptr(lengths, ctypes.c_int64), len(xs),
                          float(gamma), _ptr(out, ctypes.c_double))
    else:
        offset = 0
        for ln in lengths:
            run = 0.0
            for t in range(ln - 1, -1, -1):
                run = flat[offset + t] + gamma * run
                out[offset + t] = run
            offset += ln
    return np.split(out, np.cumsum(lengths)[:-1])


def gae_advantages(rewards, values, terminated, gamma, lam):
    """Ragged GAE: lists of (len_i,) rewards/values, terminated (n,) bools
    -> list of advantage arrays."""
    lib = _load()
    lengths = np.array([len(x) for x in rewards], np.int64)
    r = np.ascontiguousarray(np.concatenate(rewards), np.float64)
    v = np.ascontiguousarray(np.concatenate(values), np.float64)
    term = np.ascontiguousarray(np.asarray(terminated), np.uint8)
    out = np.empty_like(r)
    if lib is not None:
        lib.gae_advantages(_ptr(r, ctypes.c_double),
                           _ptr(v, ctypes.c_double),
                           _ptr(lengths, ctypes.c_int64),
                           _ptr(term, ctypes.c_uint8), len(rewards),
                           float(gamma), float(lam),
                           _ptr(out, ctypes.c_double))
    else:
        offset = 0
        for i, ln in enumerate(lengths):
            bootstrap = 0.0 if term[i] else v[offset + ln - 1]
            run = 0.0
            for t in range(ln - 1, -1, -1):
                v_next = v[offset + t + 1] if t + 1 < ln else bootstrap
                delta = r[offset + t] + gamma * v_next - v[offset + t]
                run = delta + gamma * lam * run
                out[offset + t] = run
            offset += ln
    return np.split(out, np.cumsum(lengths)[:-1])
