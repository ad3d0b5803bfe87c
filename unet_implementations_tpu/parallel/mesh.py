"""1-D data-parallel mesh utilities.

The reference is single-process single-GPU (``Our_UNet/src/train.py:760-763``;
no torch.distributed anywhere — SURVEY §2.8). The TPU-native scaling layer is
a 1-D ``jax.sharding.Mesh`` over ICI: batches are sharded on the ``data``
axis, parameters/optimizer state are replicated, and XLA inserts the gradient
all-reduce automatically from the sharded-batch jit program — no explicit
collectives needed. Multi-host DCN scaling composes on top via
``jax.distributed.initialize`` (see ``training/loop.py`` host-sharded input).

Model size (~30M params) makes TP/PP unnecessary; the single knob that
matters is batch sharding.
"""

from __future__ import annotations

import warnings
from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def create_mesh(n_devices: Optional[int] = None, axis: str = DATA_AXIS) -> Mesh:
    """A 1-D mesh over the first ``n_devices`` (default: all) devices."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis,))


def batch_sharding(mesh: Mesh, axis: str = DATA_AXIS) -> NamedSharding:
    """Shard the leading (batch) dimension across the mesh."""
    return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Optional[Mesh]) -> Any:
    """Device-put a host batch, sharding every leaf's leading dim on ``data``.

    A leading dim not divisible by the mesh size (e.g. the final partial
    validation batch — val loaders keep every image, ``drop_last=False``)
    cannot be laid out on the ``data`` axis; such leaves are REPLICATED
    instead. XLA then computes that batch redundantly on every device —
    identical numbers, no crash, negligible cost for one tail batch.
    """
    if mesh is None:
        return jax.device_put(batch)
    n = mesh.devices.size
    sharded = batch_sharding(mesh)
    replicated = replicated_sharding(mesh)

    if jax.process_count() > 1:
        # Each host holds only ITS stripe of the batch: assemble the global
        # array from per-process shards (a plain device_put with the global
        # sharding would treat the local rows as the whole global batch,
        # dropping most of the loaded data). The per-host rows must divide
        # the per-host device count — truncate the tail batch to the nearest
        # multiple (equal across hosts since the loader shards files into
        # equal stripes), padding up from the first sample if a tail is
        # smaller than one per-device row. Affects only the final partial
        # validation batch of multi-host runs (train uses drop_last).
        local_dev = max(1, n // jax.process_count())

        def put_global(x):
            x = np.asarray(x)
            if x.ndim >= 1 and x.shape[0] % local_dev != 0:
                keep = (x.shape[0] // local_dev) * local_dev
                if keep == 0:
                    reps = local_dev - x.shape[0]
                    warnings.warn(
                        f"multi-host tail batch: {reps} duplicated sample(s) "
                        "double-counted in batch-mean validation metrics",
                        stacklevel=2,
                    )
                    x = np.concatenate([x, np.repeat(x[:1], reps, axis=0)])
                else:
                    warnings.warn(
                        f"multi-host tail batch: {x.shape[0] - keep} "
                        "sample(s) dropped from validation metrics",
                        stacklevel=2,
                    )
                    x = x[:keep]
            return jax.make_array_from_process_local_data(sharded, x)

        return jax.tree.map(put_global, batch)

    def put(x):
        divisible = getattr(x, "ndim", 0) >= 1 and x.shape[0] % n == 0
        return jax.device_put(x, sharded if divisible else replicated)

    return jax.tree.map(put, batch)


def replicate(tree: Any, mesh: Optional[Mesh]) -> Any:
    """Replicate a pytree (params/opt state) across the mesh."""
    if mesh is None:
        return jax.device_put(tree)
    sharding = replicated_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def pad_to_multiple(n: int, k: int) -> int:
    return ((n + k - 1) // k) * k
