"""Coverage for the remaining utility modules: tensor_utils,
optimize_model.fit_data, plots, process_samples host API, profiling."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from mjrl_tpu.utils import tensor_utils as tu
from mjrl_tpu.utils.optimize_model import fit_data
from mjrl_tpu.utils.process_samples import (compute_advantages,
                                            compute_returns, discount_sum)


def test_tensor_utils_stack_and_concat():
    dicts = [{"a": np.ones(3), "b": {"c": np.full(2, i)}} for i in range(4)]
    stacked = tu.stack_tensor_dict_list(dicts)
    assert stacked["a"].shape == (4, 3)
    assert stacked["b"]["c"].shape == (4, 2)
    np.testing.assert_allclose(stacked["b"]["c"][:, 0], [0, 1, 2, 3])
    cat = tu.concat_tensor_dict_list(dicts)
    assert cat["a"].shape == (12,)
    split = tu.split_tensor_dict_list(stacked)
    assert len(split) == 4 and split[2]["b"]["c"][0] == 2


def test_tensor_utils_padding():
    xs = [np.ones((2, 3)), np.ones((4, 3))]
    padded = tu.pad_tensor_n(xs, 5)
    assert padded.shape == (2, 5, 3)
    assert padded[0, 2:].sum() == 0
    flat = tu.flatten_tensors([np.ones((2, 2)), np.zeros(3)])
    assert flat.shape == (7,)
    back = tu.unflatten_tensors(flat, [(2, 2), (3,)])
    assert back[0].shape == (2, 2) and back[1].shape == (3,)


def test_fit_data_reduces_loss():
    rng = np.random.RandomState(0)
    w_true = rng.randn(4, 1)
    x = rng.randn(256, 4).astype(np.float32)
    y = (x @ w_true).astype(np.float32)
    params = {"w": jnp.zeros((4, 1))}

    def loss(p, xb, yb):
        return jnp.mean((xb @ p["w"] - yb) ** 2)

    params, _, losses = fit_data(loss, params, x, y, batch_size=64,
                                 epochs=20, learn_rate=0.05,
                                 key=jax.random.PRNGKey(0))
    assert losses[-1] < 0.05 * losses[0]
    np.testing.assert_allclose(np.asarray(params["w"]), w_true, atol=0.1)


def test_process_samples_host_api():
    rng = np.random.RandomState(1)
    paths = [dict(rewards=rng.randn(10), observations=rng.randn(10, 3)),
             dict(rewards=rng.randn(6), observations=rng.randn(6, 3),
                  terminated=True)]
    compute_returns(paths, 0.9)
    for p in paths:
        np.testing.assert_allclose(p["returns"],
                                   discount_sum(p["rewards"], 0.9),
                                   rtol=1e-10)

    class FakeBaseline:
        def predict(self, path):
            return np.zeros(len(path["rewards"]))

    compute_advantages(paths, FakeBaseline(), 0.9, 0.95)
    for p in paths:
        assert p["advantages"].shape == p["rewards"].shape
    # standard mode: A = R - V = R
    compute_advantages(paths, FakeBaseline(), 0.9, None)
    for p in paths:
        np.testing.assert_allclose(p["advantages"], p["returns"])


def test_plot_from_logs(tmp_path):
    import pickle
    from mjrl_tpu.utils.plot_from_logs import plot_from_logs
    data = {"a": [1.0, 2.0, 3.0], "b": [4, 5, 6], "names": ["x", "y", "z"]}
    p = tmp_path / "log.pickle"
    with open(p, "wb") as f:
        pickle.dump(data, f)
    out = str(tmp_path / "plot.png")
    plot_from_logs(str(p), out)
    assert os.path.getsize(out) > 1000


def test_profiling_time_jitted():
    from mjrl_tpu.utils.profiling import time_jitted
    f = jax.jit(lambda x: x * 2 + 1)
    t = time_jitted(f, jnp.ones(16), iters=3)
    assert t >= 0.0


def test_get_environment():
    from mjrl_tpu.utils.get_environment import get_environment
    e = get_environment("mjrl_point_mass-v0")
    assert e.horizon == 25
    assert get_environment() is None
