"""Profiling helpers.

The reference's tracing is coarse wall-clock KV timers
(batch_reinforce.py:88-89, npg_cg.py:114-124) — preserved here via the
same log keys.  This module adds the TPU-native layer: a context manager
around ``jax.profiler`` trace capture (viewable in TensorBoard /
Perfetto) and a tiny timing utility for jitted callables.
"""

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(log_dir="/tmp/mjrl_tpu_trace", create_perfetto_link=False):
    """Capture a device trace around the enclosed block:

        with profiling.trace("/tmp/trace"):
            agent.train_step(...)
    """
    jax.profiler.start_trace(log_dir,
                             create_perfetto_link=create_perfetto_link)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def time_jitted(fn, *args, iters=10, warmup=1):
    """Median wall-clock of a jitted callable (blocks on outputs)."""
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2]
