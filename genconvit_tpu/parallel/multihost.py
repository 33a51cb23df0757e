"""Multi-host entry helpers.

The reference has no distributed execution (SURVEY.md §2.4). Here multi-host
dataset eval / training follows the standard JAX recipe: every host calls
initialize_multihost() (jax.distributed.initialize — coordinator discovery via
env or args), builds the same global Mesh over jax.devices(), shards its local
slice of the input, and XLA collectives ride ICI within a slice / DCN across
slices.
"""

from __future__ import annotations

import logging
import os
from typing import Optional

import jax

log = logging.getLogger("genconvit_tpu")


def initialize_multihost(coordinator_address: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None) -> bool:
    """Initialize the JAX distributed runtime when running multi-host.

    No-ops (returns False) for single-process runs so all CLIs work unchanged
    on one host. TPU pod slices auto-discover when no args are given.
    """
    explicit = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    in_pod = bool(os.environ.get("TPU_WORKER_HOSTNAMES", "").count(",")) or \
        bool(os.environ.get("MEGASCALE_COORDINATOR_ADDRESS"))
    if not explicit and not in_pod:
        return False
    try:
        jax.distributed.initialize(
            coordinator_address=explicit,
            num_processes=num_processes,
            process_id=process_id)
        log.info("multihost: process %d/%d, %d local / %d global devices",
                 jax.process_index(), jax.process_count(),
                 jax.local_device_count(), jax.device_count())
        return True
    except Exception as e:  # pragma: no cover - environment dependent
        log.warning("jax.distributed.initialize failed: %s", e)
        return False
