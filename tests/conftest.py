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
# persistent jit cache: repeat suite runs skip recompilation
try:
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(__file__), "..",
                                   ".jax_cache_tests"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

assert jax.default_backend() == "cpu", jax.default_backend()
