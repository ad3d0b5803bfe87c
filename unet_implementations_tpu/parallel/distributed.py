"""Multi-host (DCN) runtime initialization.

The reference has no distributed support (SURVEY §2.8/§5.8). The TPU-native
scaling story: within a slice, ICI data-parallelism via the 1-D mesh
(``parallel/mesh.py``); across hosts, ``jax.distributed.initialize`` wires
the DCN control plane so every host sees the global device set. Input is
host-sharded by the loader (``PetDataset(process_index, process_count)``).

Call ``maybe_initialize_distributed()`` once at entry, BEFORE anything that
touches a JAX backend (``jax.devices()``/``jax.process_count()`` initialize
XLA, after which ``jax.distributed.initialize`` refuses to run). The CLI
calls it first thing for train/evaluate commands; it is a no-op for
single-process runs with no coordinator info in the environment.
"""

from __future__ import annotations

import os
from typing import Optional

import jax


def _already_initialized() -> bool:
    try:
        from jax._src import distributed as _dist  # no public probe exists

        return _dist.global_state.client is not None
    except Exception:  # pragma: no cover - jax-internal layout change
        return False


def maybe_initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize jax.distributed when multi-host info is available.

    Explicit args win; otherwise standard env vars
    (``JAX_COORDINATOR_ADDRESS``/``JAX_NUM_PROCESSES``/``JAX_PROCESS_ID`` or
    a TPU pod environment, which jax auto-detects). Returns True when the
    distributed runtime was (already or newly) initialized. Must run before
    the first backend use.
    """
    if _already_initialized():
        return True

    coordinator = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if coordinator is None and num_processes is None:
        # Single-host: nothing to do. (On real TPU pods, the launcher or
        # jax.distributed.initialize() with no args auto-detects — callers
        # running under a pod scheduler may call initialize() directly.)
        return False
    try:
        # `or`-defaulting would discard an explicit 0 (the coordinator's id).
        n = (num_processes if num_processes is not None
             else int(os.environ.get("JAX_NUM_PROCESSES", "1")))
        pid = (process_id if process_id is not None
               else int(os.environ.get("JAX_PROCESS_ID", "0")))
        jax.distributed.initialize(
            coordinator_address=coordinator, num_processes=n, process_id=pid
        )
        return True
    except Exception as e:  # pragma: no cover - environment-specific
        print(f"jax.distributed.initialize failed: {e}")
        return False
