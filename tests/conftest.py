"""Test configuration: run all tests on a virtual 8-device CPU mesh.

Multi-chip sharding is validated on CPU via
``--xla_force_host_platform_device_count=8`` (the TPU-world substitute for
the reference's implicit multi-process sampler tests — SURVEY.md §4).
Must set env vars before jax initializes its backends.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: outer env may select the TPU
# float64 for physics golden validation (TPU production path stays f32)
os.environ.setdefault("JAX_ENABLE_X64", "1")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

assert jax.default_backend() == "cpu", jax.default_backend()
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
