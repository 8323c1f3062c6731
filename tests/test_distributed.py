"""Multi-host (DCN) integration: two real OS processes, CPU backend,
jax.distributed coordination, one cross-host reduction.

This is the TPU-pod substitute test SURVEY.md §5 calls for — the
reference has no multi-node anything; here two processes form a global
2-device mesh and a GSPMD mean reduces across the process boundary.
"""

import os
import socket
import subprocess
import sys

_WORKER = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, os.environ["MJRL_REPO"])
from mjrl_tpu.parallel import distributed as dist
import numpy as np

ok = dist.initialize()
assert ok and jax.process_count() == 2, (ok, jax.process_count())
mesh = dist.global_mesh()
rank = jax.process_index()

# host-sharded array: each process contributes its own rows
local = np.full((4, 3), float(rank), np.float32)
arr = dist.host_sharded(mesh, local)
assert arr.shape == (8, 3), arr.shape

from jax.sharding import NamedSharding, PartitionSpec as P
total = jax.jit(lambda x: x.sum(),
                out_shardings=NamedSharding(mesh, P()))(arr)
# rows: 4*3 zeros from rank 0 + 4*3 ones from rank 1 -> 12
assert float(total) == 12.0, float(total)

m = dist.all_hosts_mean(mesh, 10.0 * (rank + 1))   # mean(10, 20) = 15
assert abs(m - 15.0) < 1e-6, m

buf = dist.HostShardedBuffer(max_steps=100, seed=rank)
path = {"observations": np.random.randn(6, 2).astype(np.float32),
        "actions": np.random.randn(6, 1).astype(np.float32),
        "rewards": np.random.randn(6).astype(np.float32)}
buf.add_paths([path])
gb = buf.global_batch(mesh, per_host_n=8)
assert gb["s"].shape == (16, 2), gb["s"].shape

print(f"WORKER_{rank}_OK", flush=True)
"""


def test_two_process_dcn_reduction(tmp_path):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    repo = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
    procs = []
    for rank in range(2):
        env = dict(os.environ,
                   MJRL_COORDINATOR=f"127.0.0.1:{port}",
                   MJRL_NUM_PROCS="2", MJRL_PROC_ID=str(rank),
                   MJRL_REPO=repo, JAX_PLATFORMS="cpu")
        # the conftest's 8-virtual-device XLA flag must not leak into the
        # workers: each worker is exactly one device of the global mesh
        env.pop("JAX_NUM_CPU_DEVICES", None)
        env["XLA_FLAGS"] = " ".join(
            f for f in env.get("XLA_FLAGS", "").split()
            if "xla_force_host_platform_device_count" not in f)
        procs.append(subprocess.Popen(
            [sys.executable, "-c", _WORKER], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    outs = []
    for rank, p in enumerate(procs):
        out, _ = p.communicate(timeout=280)
        outs.append(out)
        assert p.returncode == 0, f"rank {rank} failed:\n{out}"
        assert f"WORKER_{rank}_OK" in out, out
