"""External host-API envs behind GymEnv — the generalized dmc2gym hook
(reference run_model_accel_npg.py:86-91)."""

import numpy as np
import pytest

from mjrl_tpu.envs.gym_env import GymEnv


class ToyHostEnv:
    """Minimal gymnasium-style host env (5-tuple step)."""

    class _Space:
        def __init__(self, n):
            self.shape = (n,)
            self.low = -np.ones(n)
            self.high = np.ones(n)

    class _Spec:
        max_episode_steps = 40

    def __init__(self):
        self.observation_space = self._Space(3)
        self.action_space = self._Space(2)
        self.spec = self._Spec()
        self._x = np.zeros(3)
        self._t = 0

    def reset(self, seed=None):
        rng = np.random.RandomState(seed)
        self._x = rng.uniform(-1, 1, 3)
        self._t = 0
        return self._x.copy(), {}

    def step(self, a):
        self._x[:2] += 0.1 * np.asarray(a)
        self._t += 1
        r = -float(np.linalg.norm(self._x))
        return self._x.copy(), r, False, self._t >= 40, {}


def make_toy():
    return ToyHostEnv()


def test_external_env_basic():
    e = GymEnv(make_toy)
    assert e.observation_dim == 3
    assert e.action_dim == 2
    assert e.horizon == 40
    o = e.reset(seed=0)
    assert o.shape == (3,)
    o2, r, d, ifo = e.step([0.5, -0.5])
    assert o2.shape == (3,) and np.isfinite(r) and not d


def test_external_env_act_repeat_and_truncation():
    e = GymEnv(make_toy, act_repeat=2)
    assert e.horizon == 20
    e.reset(seed=1)
    done = False
    steps = 0
    while not done and steps < 50:
        _, _, done, _ = e.step([1.0, 0.0])
        steps += 1
    assert done and steps == 20   # truncation at 40 raw steps


def test_external_env_seed_reproducible():
    e = GymEnv(make_toy)
    o1 = e.reset(seed=7)
    o2 = e.reset(seed=7)
    np.testing.assert_allclose(o1, o2)


def test_runner_env_factory_hook(tmp_path):
    """run_model_accel_npg's env_factory dotted-path hook constructs the
    env through GymEnv's external backend."""
    import importlib
    mod, _, fn = "tests.test_external_env:make_toy".partition(":")
    factory = getattr(importlib.import_module(mod), fn)
    e = GymEnv(factory, act_repeat=1)
    assert e._external and e.horizon == 40


def test_gymnasium_env_if_available():
    gymnasium = pytest.importorskip("gymnasium")
    e = GymEnv(lambda: gymnasium.make("Pendulum-v1"))
    assert e.observation_dim == 3 and e.action_dim == 1
    e.reset(seed=0)
    o, r, d, _ = e.step([0.1])
    assert o.shape == (3,) and np.isfinite(r)
