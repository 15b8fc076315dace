"""Multi-host initialization.

The reference inherits process management from accelerate/torchrun
(SURVEY §2 communication table); the TPU-native equivalent is
``jax.distributed.initialize`` — one call per host before any backend use,
after which ``jax.devices()`` spans the slice and the mesh in
:mod:`aat_tpu.parallel.mesh` covers all chips (XLA collectives ride ICI
within a slice, DCN across slices).
"""

from __future__ import annotations

import logging
import os
from typing import Optional

logger = logging.getLogger(__name__)


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize multi-host JAX. No-ops on single-host runs.

    On Cloud TPU the arguments are auto-detected from the metadata server;
    elsewhere pass them explicitly or via JAX_COORDINATOR_ADDRESS /
    JAX_NUM_PROCESSES / JAX_PROCESS_ID.
    """
    import jax

    if num_processes is None:
        num_processes = int(os.environ.get("JAX_NUM_PROCESSES", "1"))
    if num_processes <= 1 and coordinator_address is None:
        logger.info("single-process run; skipping jax.distributed.initialize")
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address
        or os.environ.get("JAX_COORDINATOR_ADDRESS"),
        num_processes=num_processes,
        process_id=(
            process_id
            if process_id is not None
            else int(os.environ.get("JAX_PROCESS_ID", "0"))
        ),
    )
    logger.info(
        "jax.distributed initialized: process %d/%d, %d local / %d global devices",
        jax.process_index(), jax.process_count(),
        jax.local_device_count(), jax.device_count(),
    )
