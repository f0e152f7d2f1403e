"""Multi-host (multi-process) initialization for DCN-connected slices.

The reference imports ``DistributedDataParallel`` but never instantiates it
(/root/reference/train.py:7 — dead import; SURVEY §2.3). The TPU-native
story: every host runs the same SPMD program; ``jax.distributed.initialize``
wires the hosts into one runtime, ``jax.devices()`` then spans the full
slice, and the exact same ``shard_map`` train step scales across hosts —
gradient psums ride ICI within a slice and DCN across slices, chosen by the
compiler from the mesh layout.

Per-host input pipelines feed their local shard via
``make_host_local_batch``.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import numpy as np


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> Dict[str, Any]:
    """Join the multi-host runtime (no-op for single-process runs).

    On TPU pods the arguments are auto-detected from the environment;
    passing them explicitly supports manual bring-up.
    """
    if num_processes is not None and num_processes > 1 or (
        coordinator_address is not None
    ):
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": jax.local_device_count(),
        "global_devices": jax.device_count(),
    }


def make_host_local_batch(mesh, batch: Dict[str, np.ndarray]):
    """Assemble a globally-sharded batch from this host's local data.

    Each host supplies its own slice of the global batch (local batch =
    global / process_count); the result is a global jax.Array laid out over
    the mesh's data axis without any cross-host data movement.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ct_tpu.parallel.mesh import DATA_AXIS

    sharding = NamedSharding(mesh, P(DATA_AXIS))
    return {
        k: jax.make_array_from_process_local_data(sharding, v)
        for k, v in batch.items()
    }
