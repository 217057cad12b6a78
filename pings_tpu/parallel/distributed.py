"""Multi-process (multi-host) runtime initialization.

The reference is single-process/single-GPU (SURVEY.md §2.3); this is the
TPU-native scale-out entry: ``jax.distributed.initialize`` wires the hosts
of a pod slice into one runtime, after which ``jax.devices()`` spans every
chip and the mesh/pjit layer in ``parallel.mesh`` shards across ICI
(intra-slice) and DCN (inter-host) with the same code path.

Usage (one command per host):

    python -m pings_tpu.cli ... --distributed
    # or env-driven:
    PINGS_COORDINATOR=host0:8476 PINGS_NUM_PROCESSES=4 PINGS_PROCESS_ID=0 ...

On Cloud TPU the three values are autodetected by jax.distributed and all
arguments may be omitted.
"""

from __future__ import annotations

import os
from typing import Optional

import jax


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize the multi-process JAX runtime (idempotent).

    Returns True if a multi-process runtime was initialized, False when
    running single-process (no coordinator configured and not on a
    TPU pod environment).
    """
    coordinator_address = coordinator_address or os.environ.get(
        "PINGS_COORDINATOR")
    num_processes = num_processes if num_processes is not None else (
        int(os.environ["PINGS_NUM_PROCESSES"])
        if "PINGS_NUM_PROCESSES" in os.environ else None)
    process_id = process_id if process_id is not None else (
        int(os.environ["PINGS_PROCESS_ID"])
        if "PINGS_PROCESS_ID" in os.environ else None)

    tpu_pod = os.environ.get("TPU_WORKER_HOSTNAMES") or os.environ.get(
        "MEGASCALE_COORDINATOR_ADDRESS")
    if coordinator_address is None and not tpu_pod:
        return False
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
        return jax.process_count() > 1
    except RuntimeError as e:  # already initialized
        if "already" in str(e).lower():
            return jax.process_count() > 1
        raise


def runtime_info() -> dict:
    """Process/device topology summary for logs and scaling reports."""
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_device_count": jax.local_device_count(),
        "global_device_count": jax.device_count(),
        "backend": jax.default_backend(),
        "device_kind": jax.devices()[0].device_kind if jax.devices() else "",
    }
