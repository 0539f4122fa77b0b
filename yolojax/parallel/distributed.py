"""Multi-host (DCN) support: jax.distributed + process-local batch assembly.

The reference was single-process (SURVEY.md §2); single-host multi-chip is
handled entirely by ``yolojax.parallel.mesh``. This module adds the
multi-host layer the TPU-native way: every process runs the same program,
``jax.distributed.initialize`` wires them into one JAX runtime (global
device view), each process loads a disjoint shard of the data
(``LoaderConfig.shard_index/shard_count``), and
``jax.make_array_from_process_local_data`` assembles the global batch so
the *same* pjit'd train step runs unchanged — XLA routes gradient
all-reduce over ICI within a host and DCN across hosts.

Launch (one command per host):
  python cli/train.py -c config.ini \
      train.coordinator=host0:9999 train.num_processes=2 train.process_id=K
or via env: JAX_COORDINATOR / JAX_NUM_PROCESSES / JAX_PROCESS_ID.
"""

from __future__ import annotations

import logging
import os
from typing import Any

import jax

from yolojax.parallel.mesh import batch_sharding

log = logging.getLogger(__name__)


def maybe_initialize(
    coordinator: str = "",
    num_processes: int = 0,
    process_id: int = -1,
) -> bool:
    """Initialize jax.distributed when configured (args or env). Returns
    True when running multi-process. Must run before any backend use."""
    coordinator = coordinator or os.environ.get("JAX_COORDINATOR", "")
    num_processes = num_processes or int(
        os.environ.get("JAX_NUM_PROCESSES", "0")
    )
    if process_id < 0:
        process_id = int(os.environ.get("JAX_PROCESS_ID", "-1"))
    if not coordinator or num_processes <= 1:
        return False
    if process_id < 0:
        raise ValueError("multi-process run needs process_id (>= 0)")
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )
    log.info(
        "distributed: process %d/%d, %d local + %d global devices",
        process_id, num_processes,
        jax.local_device_count(), jax.device_count(),
    )
    return True


def global_batch(mesh, local_batch: Any) -> Any:
    """Assemble a globally-sharded batch from this process's local shard.

    Every process passes its own local arrays (leading dim = local batch);
    the result is one global jax.Array per leaf, batch-sharded over the
    mesh's "data" axis. Single-process: equivalent to shard_batch.
    """
    sharding = batch_sharding(mesh)

    def put(x):
        return jax.make_array_from_process_local_data(sharding, x)

    return jax.tree_util.tree_map(put, local_batch)
