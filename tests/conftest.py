"""Test configuration: run all tests on a virtual 8-device CPU mesh.

Multi-chip sharding is validated on CPU via virtual devices (the TPU-world
substitute for the reference's implicit multi-process sampler tests —
SURVEY.md §4).  Env vars must be set before jax initializes its backends;
in this jax build the XLA_FLAGS host-device-count flag is not honored when
a PJRT plugin is present, so the jax.config path is authoritative.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: outer env may select the TPU
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
# float64 for physics golden validation (TPU production path stays f32)
os.environ.setdefault("JAX_ENABLE_X64", "1")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", True)
# NOTE: the persistent compilation cache is deliberately NOT enabled for
# the CPU suite — XLA:CPU AOT artifacts are machine-feature sensitive and
# loading them on a slightly different host can abort the process
# (observed: 'prefer-no-scatter is not supported ... SIGILL').  The TPU
# scripts (bench, tools/) use the cache; TPU executables are not
# machine-feature sensitive this way.

assert jax.default_backend() == "cpu", jax.default_backend()
