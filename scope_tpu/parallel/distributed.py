"""Multi-host runtime initialization.

The reference is strictly single-process (SURVEY.md §2.5).  For multi-host
TPU slices this wraps ``jax.distributed.initialize`` and builds the global
(data, model) mesh so that the model axis stays inside one ICI-connected
slice (collectives ride ICI) and the data axis spans hosts over DCN.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np

from scope_tpu.parallel.sharding import DATA_AXIS, MODEL_AXIS


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> None:
    """Initialize the multi-host runtime (no-op on single host).

    On TPU pods the arguments are auto-detected from the environment; pass
    them explicitly for CPU/GPU clusters."""
    if num_processes is not None and num_processes > 1 or \
            coordinator_address is not None:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes, process_id=process_id)
    elif os.environ.get("TPU_WORKER_HOSTNAMES"):
        jax.distributed.initialize()


def global_mesh(model_parallel: Optional[int] = None):
    """Build a (data, model) mesh over all global devices.

    ``model_parallel`` defaults to the devices-per-process count so the
    tensor-parallel axis never crosses a host (DCN) boundary."""
    from jax.sharding import Mesh

    devices = jax.devices()
    if model_parallel is None:
        model_parallel = max(1, jax.local_device_count())
        while len(devices) % model_parallel:
            model_parallel //= 2
    n_data = len(devices) // model_parallel
    # Order devices host-major so the model axis is intra-host/ICI.
    devices = sorted(devices, key=lambda d: (d.process_index, d.id))
    arr = np.asarray(devices).reshape(n_data, model_parallel)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))
