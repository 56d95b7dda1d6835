"""Multi-host bootstrap — the `jax.distributed` layer of the comm stack.

The reference has no distributed backend at all (no NCCL/MPI/Gloo;
SURVEY.md §2.3).  On TPU pods the transport is built into XLA (ICI within
a slice, DCN across slices); what a framework must provide is (1) process
bootstrap, (2) per-host manifest sharding for input pipelines, and
(3) host-0-only side effects.  This module is that layer.
"""
from __future__ import annotations

import os
from typing import Optional, Tuple

import jax


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> Tuple[int, int]:
    """Initialize jax.distributed when running multi-host (no-op on a
    single host).  Returns (process_index, process_count)."""
    explicit = coordinator_address or os.environ.get("COORDINATOR_ADDRESS")
    if explicit or os.environ.get("JAX_NUM_PROCESSES"):
        jax.distributed.initialize(
            coordinator_address=explicit,
            num_processes=num_processes
            or int(os.environ.get("JAX_NUM_PROCESSES", "1")),
            process_id=process_id
            if process_id is not None
            else int(os.environ.get("JAX_PROCESS_ID", "0")),
        )
    return jax.process_index(), jax.process_count()


def host_shard() -> Tuple[int, int]:
    """(index, count) for DataLoader(host_shard=...) manifest striding."""
    return jax.process_index(), jax.process_count()


def is_primary() -> bool:
    """True on the process that should write checkpoints/logs/images."""
    return jax.process_index() == 0
