"""Native pathops: C++ vs numpy reference equality."""

import numpy as np
import pytest

from mjrl_tpu import native


def test_native_builds():
    # the toolchain is part of the image; the extension must compile
    assert native.available()


def test_pack_paths_matches_manual():
    rng = np.random.RandomState(0)
    arrays = [rng.randn(n, 3).astype(np.float32) for n in (5, 2, 7)]
    out, mask = native.pack_paths(arrays)
    assert out.shape == (3, 7, 3)
    for i, a in enumerate(arrays):
        np.testing.assert_allclose(out[i, :len(a)], a)
        assert mask[i, :len(a)].all()
        assert not mask[i, len(a):].any()
        np.testing.assert_allclose(out[i, len(a):], 0.0)


def test_discount_sums_match_numpy():
    rng = np.random.RandomState(1)
    xs = [rng.randn(n) for n in (4, 9, 1)]
    got = native.discount_sums(xs, 0.9)
    for x, g in zip(xs, got):
        want = np.zeros_like(x)
        run = 0.0
        for t in range(len(x) - 1, -1, -1):
            run = x[t] + 0.9 * run
            want[t] = run
        np.testing.assert_allclose(g, want, rtol=1e-12)


def test_gae_matches_reference_rule():
    rng = np.random.RandomState(2)
    rewards = [rng.randn(6), rng.randn(3)]
    values = [rng.randn(6), rng.randn(3)]
    term = [False, True]
    got = native.gae_advantages(rewards, values, term, 0.95, 0.97)
    for i in range(2):
        b = values[i]
        b1 = np.append(b, 0.0 if term[i] else b[-1])
        deltas = rewards[i] + 0.95 * b1[1:] - b1[:-1]
        want = np.zeros_like(deltas)
        run = 0.0
        for t in range(len(deltas) - 1, -1, -1):
            run = deltas[t] + 0.95 * 0.97 * run
            want[t] = run
        np.testing.assert_allclose(got[i], want, rtol=1e-12)
