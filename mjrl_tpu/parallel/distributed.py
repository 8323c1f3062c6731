"""Multi-host (DCN) data parallelism via jax.distributed.

The reference's cross-process story is fork + pickle over one machine
(mjrl/samplers/core.py:124-138).  The TPU-native multi-HOST equivalent:
each host process runs the same jitted training step over a GLOBAL mesh;
host-local data (rollout keys, replay shards) is assembled into globally
sharded arrays with ``jax.make_array_from_process_local_data``, and GSPMD
inserts the cross-host reductions (gradient sums, advantage-whitening
means, CG dots) over DCN exactly as it does over ICI in-host — no
NCCL/MPI code, the collectives come from sharding propagation.

Single-process use is the no-op default: every helper degrades to the
local path when jax.distributed was never initialized.

Typical pod launch (same script on every host)::

    from mjrl_tpu.parallel import distributed as dist
    dist.initialize()                    # env-driven; no-op single host
    mesh = dist.global_mesh()            # all devices, all hosts
    keys = dist.host_sharded(mesh, local_keys)   # (global_B, 2) sharded
    agent = NPG(..., mesh=mesh)
"""

import os

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mjrl_tpu.parallel.mesh import BATCH_AXIS

_initialized = False


def initialize(coordinator_address=None, num_processes=None,
               process_id=None, local_device_ids=None):
    """Bring up jax.distributed from args or environment.

    Environment fallbacks (set by the pod launcher):
      MJRL_COORDINATOR  host:port of process 0
      MJRL_NUM_PROCS    total process count
      MJRL_PROC_ID      this process's rank

    No-op (returns False) when neither args nor env vars are present —
    single-host runs never need to call this.
    """
    global _initialized
    if _initialized:
        return True
    coordinator_address = coordinator_address or os.environ.get(
        "MJRL_COORDINATOR")
    if coordinator_address is None:
        return False
    num_processes = num_processes if num_processes is not None else int(
        os.environ["MJRL_NUM_PROCS"])
    process_id = process_id if process_id is not None else int(
        os.environ["MJRL_PROC_ID"])
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id,
                               local_device_ids=local_device_ids)
    _initialized = True
    return True


def is_distributed():
    return jax.process_count() > 1


def global_mesh(axis_name=BATCH_AXIS):
    """1-D mesh over every device of every host."""
    return Mesh(np.asarray(jax.devices()), (axis_name,))


def host_sharded(mesh, local_array, axis_name=BATCH_AXIS):
    """Assemble per-host local data (local_B, ...) into one globally
    sharded array (global_B, ...) with the leading axis split across the
    mesh.  Single-process: returns the device_put local array unchanged
    in shape."""
    sharding = NamedSharding(mesh, P(axis_name))
    local_array = np.asarray(local_array)
    if jax.process_count() == 1:
        return jax.device_put(local_array, sharding)
    return jax.make_array_from_process_local_data(sharding, local_array)


def all_hosts_mean(mesh, local_scalar):
    """Mean of a host-local float across processes (logging/metrics) —
    one tiny psum over DCN."""
    arr = host_sharded(mesh, np.asarray([float(local_scalar)]))

    def mean(x):
        return jax.numpy.mean(x)

    out = jax.jit(mean, out_shardings=NamedSharding(mesh, P()))(arr)
    return float(out)


class HostShardedBuffer:
    """FIFO replay buffer whose storage lives per host (the MBRL real-data
    buffer, run_model_accel_npg.py:143-144, sharded over processes).

    Each host appends only the paths IT collected; ``global_batch`` draws
    a host-local minibatch and assembles the globally sharded training
    array, so WorldModel fits see the union of all hosts' data through
    GSPMD gradient reductions without any host ever materializing the
    full dataset.
    """

    def __init__(self, max_steps, seed=0):
        self.max_steps = int(max_steps)
        self._fields = None
        self._data = {}
        self._rng = np.random.RandomState(seed)

    def add_paths(self, paths):
        cols = {}
        for p in paths:
            s, a = np.asarray(p["observations"]), np.asarray(p["actions"])
            cols.setdefault("s", []).append(s[:-1])
            cols.setdefault("a", []).append(a[:-1])
            cols.setdefault("sp", []).append(s[1:])
            if "rewards" in p:
                cols.setdefault("r", []).append(
                    np.asarray(p["rewards"])[:-1])
        for k, v in cols.items():
            new = np.concatenate(v)
            old = self._data.get(k)
            cat = new if old is None else np.concatenate([old, new])
            self._data[k] = cat[-self.max_steps:]

    @property
    def local_steps(self):
        return 0 if not self._data else len(next(iter(self._data.values())))

    def local_batch(self, n):
        idx = self._rng.randint(0, max(self.local_steps, 1), size=n)
        return {k: v[idx] for k, v in self._data.items()}

    def global_batch(self, mesh, per_host_n):
        """(process_count * per_host_n, ...) globally sharded arrays."""
        local = self.local_batch(per_host_n)
        return {k: host_sharded(mesh, v) for k, v in local.items()}
