"""Multi-host bootstrap (reference: torchrun rdzv + NCCL env,
``train/scripts/train.sh:3-39,70``; mpi4py pinned but unused).

On TPU pods the runtime discovers peers itself; on CPU/GPU fleets,
coordinator-based init mirrors torchrun's c10d rendezvous.  Either way the
framework code above this never sees ranks — it sees one global mesh.
"""

from __future__ import annotations

import os
from typing import Optional

import jax

from pdec.runtime.logging import get_logger


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> dict:
    """Initialize multi-host JAX if the environment calls for it.

    Env fallbacks mirror the torchrun variables the reference exports
    (MASTER_ADDR/PORT-equivalents): ``PDEC_COORDINATOR``, ``PDEC_NUM_PROCS``,
    ``PDEC_PROC_ID``.  No-ops gracefully in single-process runs.
    """
    logger = get_logger("pdec.distributed")
    coordinator_address = coordinator_address or os.environ.get("PDEC_COORDINATOR")
    num_processes = num_processes or _int_env("PDEC_NUM_PROCS")
    process_id = process_id if process_id is not None else _int_env("PDEC_PROC_ID")

    if coordinator_address and num_processes and num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id or 0,
        )
        logger.info(
            "distributed init: %d processes, this is %d",
            num_processes, process_id or 0,
        )
    info = {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
    }
    logger.info("topology: %s", info)
    return info


def _int_env(name: str) -> Optional[int]:
    v = os.environ.get(name)
    return int(v) if v else None
