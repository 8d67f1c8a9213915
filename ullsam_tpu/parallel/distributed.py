"""Multi-host initialization and process utilities.

Replaces the reference's env-var NCCL rendezvous (init_distributed_mode,
train_joint_v2.py:1267-1277): jax.distributed.initialize discovers peers
from the TPU metadata (or coordinator env vars), and data sharding is by
process index (data/datasets.py) rather than DistributedSampler.
"""

from __future__ import annotations

import os
from typing import Optional

import jax


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Initialize multi-host JAX if running under a multi-process launcher.

    No-op for single-process runs. Env overrides: JAX_COORDINATOR_ADDRESS,
    JAX_NUM_PROCESSES, JAX_PROCESS_ID (torchrun-style RANK/WORLD_SIZE are
    also honored for drop-in launcher compat).
    """
    coordinator_address = (coordinator_address
                           or os.environ.get("JAX_COORDINATOR_ADDRESS"))
    num_processes = num_processes or _int_env("JAX_NUM_PROCESSES",
                                              _int_env("WORLD_SIZE", None))
    process_id = process_id if process_id is not None else _int_env(
        "JAX_PROCESS_ID", _int_env("RANK", None))

    if coordinator_address is None and num_processes in (None, 1):
        return  # single process
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def _int_env(name: str, default):
    v = os.environ.get(name)
    return int(v) if v is not None else default


def is_main_process() -> bool:
    """Rank-0 gating (the reference's dist.get_rank()==0 checks)."""
    return jax.process_index() == 0


def local_device_count() -> int:
    return jax.local_device_count()
