"""Multi-host (DCN) runtime initialization.

The reference has no distributed support (SURVEY §2.8/§5.8). The TPU-native
scaling story: within a slice, ICI data-parallelism via the 1-D mesh
(``parallel/mesh.py``); across hosts, ``jax.distributed.initialize`` wires
the DCN control plane so every host sees the global device set. Input is
host-sharded by the loader (``PetDataset(process_index, process_count)``).

Call ``maybe_initialize_distributed()`` once at entry; it is a no-op for
single-process runs and when the environment provides no coordinator info.
"""

from __future__ import annotations

import os
from typing import Optional

import jax


def maybe_initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize jax.distributed when multi-host info is available.

    Explicit args win; otherwise standard env vars
    (``JAX_COORDINATOR_ADDRESS``/``JAX_NUM_PROCESSES``/``JAX_PROCESS_ID`` or
    a TPU pod environment, which jax auto-detects). Returns True when the
    distributed runtime was (already or newly) initialized.
    """
    if jax.process_count() > 1:
        return True  # already initialized (e.g. by the launcher)

    coordinator = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if coordinator is None and num_processes is None:
        # Single-host: nothing to do. (On real TPU pods, the launcher or
        # jax.distributed.initialize() with no args auto-detects — callers
        # running under a pod scheduler may call initialize() directly.)
        return False
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=num_processes
            or int(os.environ.get("JAX_NUM_PROCESSES", "1")),
            process_id=process_id or int(os.environ.get("JAX_PROCESS_ID", "0")),
        )
        return True
    except Exception as e:  # pragma: no cover - environment-specific
        print(f"jax.distributed.initialize failed: {e}")
        return False
