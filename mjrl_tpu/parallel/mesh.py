"""Multi-chip scaling via jax.sharding.Mesh (the reference's only
parallelism is rollout data-parallelism over CPU processes,
mjrl/samplers/core.py:124-138 — here the batch axis shards over ICI).

Design: the training step is a single jitted program; per-trajectory PRNG
keys carry a 'batch' sharding, so the vmapped rollout partitions across
devices with zero communication, and GSPMD inserts the cross-chip
reductions (advantage whitening means, gradient sums, the one scalar dot
per CG iteration) as psums over ICI.  No NCCL/MPI translation — the
collectives come from sharding propagation.

Agents accept ``mesh=``: BatchREINFORCE/NPG/... constrain rollout keys
with ``shard_rollout_keys`` and leave everything else to the partitioner.
"""

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

BATCH_AXIS = "batch"


def make_mesh(n_devices=None, devices=None, axis_name=BATCH_AXIS):
    """1-D device mesh over the batch axis."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh, axis_name=BATCH_AXIS):
    """Shard the leading axis across the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicated_sharding(mesh):
    return NamedSharding(mesh, P())


def shard_rollout_keys(keys, mesh, axis_name=BATCH_AXIS):
    """Constrain per-trajectory keys (num_traj, ...) to the batch axis;
    everything downstream of the vmapped rollout inherits the layout."""
    if mesh is None:
        return keys
    return jax.lax.with_sharding_constraint(
        keys, NamedSharding(mesh, P(axis_name)))
