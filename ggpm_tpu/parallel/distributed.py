"""Multi-process (multi-host) initialization and global-batch formation.

The reference is strictly single-process (SURVEY.md §2.6) — this is the
TPU-native multi-host layer it lacks.  One JAX process per host:

* ``init_distributed`` wires the process into the cluster
  (``jax.distributed.initialize``) from explicit args or ``GGPM_*`` env vars.
* Each process reads a DISJOINT input shard
  (``data.dataset.DataFolder(num_shards=process_count, shard_index=
  process_index)``) — the input pipeline rides DCN, per SURVEY §2.6.
* ``global_device_batch`` assembles the per-process local batch stacks into
  one global jax.Array sharded over the mesh's ``data`` axis
  (``jax.make_array_from_process_local_data``); the gradient psum inside the
  shard_map step then spans all hosts (ICI within a slice, DCN across).

Tested with two real processes on the CPU backend (Gloo collectives):
``tests/test_multihost.py``.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed(coordinator: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> int:
    """Join the multi-process cluster; returns this process's index.

    Falls back to ``GGPM_COORDINATOR`` / ``GGPM_NUM_PROCESSES`` /
    ``GGPM_PROCESS_ID`` env vars; a no-op (returns 0) when neither args nor
    env are set, so single-process runs need no changes.
    """
    coordinator = coordinator or os.environ.get('GGPM_COORDINATOR')
    if num_processes is None and 'GGPM_NUM_PROCESSES' in os.environ:
        num_processes = int(os.environ['GGPM_NUM_PROCESSES'])
    if process_id is None and 'GGPM_PROCESS_ID' in os.environ:
        process_id = int(os.environ['GGPM_PROCESS_ID'])
    if not coordinator:
        return 0
    jax.distributed.initialize(coordinator, num_processes=num_processes,
                               process_id=process_id)
    return jax.process_index()


def make_global_mesh(axis: str = 'data') -> Mesh:
    """A 1-D mesh over ALL devices in the cluster (every process sees the
    same global device list after ``init_distributed``)."""
    return Mesh(np.asarray(jax.devices()), (axis,))


def global_device_batch(local_stacked, mesh: Mesh, axis: str = 'data'):
    """Assemble per-process local batch stacks into one global array tree.

    ``local_stacked`` leaves carry this process's batches on the leading
    axis (``local_count = mesh.shape[axis] // process_count``); the result
    is a global jax.Array of leading extent ``mesh.shape[axis]`` sharded
    over ``axis``, exactly what ``make_dp_train_step`` consumes.
    """
    spec = NamedSharding(mesh, P(axis))
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(spec, np.asarray(x)),
        local_stacked)


def replicate_global(x, mesh: Mesh):
    """A fully-replicated global array from identical per-process host data
    (the vocab mask)."""
    return jax.make_array_from_process_local_data(
        NamedSharding(mesh, P()), np.asarray(x))
