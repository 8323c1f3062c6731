"""Host-side sample processing for list-of-paths data
(reference mjrl/utils/process_samples.py).

The jitted training pipeline computes returns/GAE on batched pytrees
(mjrl_tpu.ops.gae); these helpers provide the reference's in-place
path-dict API for scripts, BC/DAPG flows and the model-based runner.
"""

import numpy as np

from mjrl_tpu import native


def discount_sum(x, gamma, terminal=0.0):
    """Reverse discounted cumsum (process_samples.py:37-44)."""
    if terminal == 0.0 and native.available():
        return native.discount_sums([np.asarray(x, np.float64)], gamma)[0]
    y = np.zeros_like(np.asarray(x, dtype=np.float64))
    run = terminal
    for t in range(len(x) - 1, -1, -1):
        run = x[t] + gamma * run
        y[t] = run
    return y


def compute_returns(paths, gamma):
    if native.available():
        rets = native.discount_sums(
            [np.asarray(p["rewards"], np.float64) for p in paths], gamma)
        for path, r in zip(paths, rets):
            path["returns"] = r
        return
    for path in paths:
        path["returns"] = discount_sum(path["rewards"], gamma)


def compute_advantages(paths, baseline, gamma, gae_lambda=None,
                       normalize=False):
    """Standard (A = R - V) or GAE(lambda) advantages with the reference's
    bootstrap rule: terminated -> 0, else baseline[-1]
    (process_samples.py:7-35)."""
    if gae_lambda is None or gae_lambda < 0.0 or gae_lambda > 1.0:
        for path in paths:
            path["baseline"] = baseline.predict(path)
            path["advantages"] = path["returns"] - path["baseline"]
    else:
        for path in paths:
            path["baseline"] = np.asarray(baseline.predict(path))
        if native.available():
            advs = native.gae_advantages(
                [np.asarray(p["rewards"], np.float64) for p in paths],
                [np.asarray(p["baseline"], np.float64) for p in paths],
                [bool(p.get("terminated", False)) for p in paths],
                gamma, gae_lambda)
            for path, a in zip(paths, advs):
                path["advantages"] = a
        else:
            for path in paths:
                b = path["baseline"]
                terminal = 0.0 if path.get("terminated", False) else b[-1]
                b1 = np.append(b, terminal)
                td_deltas = path["rewards"] + gamma * b1[1:] - b1[:-1]
                path["advantages"] = discount_sum(td_deltas,
                                                  gamma * gae_lambda)
    if normalize:
        alladv = np.concatenate([p["advantages"] for p in paths])
        mean_adv, std_adv = alladv.mean(), alladv.std()
        for path in paths:
            path["advantages"] = (path["advantages"] - mean_adv) \
                / (std_adv + 1e-8)
