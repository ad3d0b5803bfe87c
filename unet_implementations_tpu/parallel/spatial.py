"""Spatial partitioning: shard the image H axis over a 2-D (data, space) mesh.

SURVEY §5.7 records that the reference has no sequence/spatial parallelism
(single-GPU torch throughout). For a convolutional UNet the TPU-native
analogue of sequence parallelism is SPATIAL partitioning: lay the batch on a
``data`` mesh axis and the image rows on a ``space`` axis, annotate the
input sharding, and let XLA's SPMD partitioner do the rest — it inserts
halo ``collective-permute``s for every conv window crossing a shard edge
and all-reduces for the InstanceNorm per-image spatial statistics (measured
on the 8-device CPU mesh: 268 collective-permutes, 3 all-gathers for the
full 6-stage forward — the program stays sharded end to end). No manual
collectives, no shard_map: annotate and compile, exactly the scaling-book
recipe.

What this buys over pure data parallelism:

- **Latency scaling**: a batch-1 512² forward uses ``n_space`` chips
  instead of one — serving latency drops with chip count where DP can only
  grow throughput.
- **Footprint scaling**: activations at 512² dominate HBM (~70 GB moved
  per b128 step); sharding H divides the live activation footprint, so
  images far larger than one chip's HBM (2048²+, the medical/satellite
  regime the reference's architecture targets but its runtime cannot hold)
  still run.

Numerics are exact up to XLA reassociation (tested ≤2e-4 f32 vs the
unsharded program, including the s2d levels and the folded decoder
upsample — see ``tests/test_spatial.py``).

TWO partitioner landmines are documented and designed around:

1. Convolutions with ASYMMETRIC spatial padding are miscompiled by XLA
   SPMD on a sharded dim under a 2-D mesh (max-abs error ~1.7 on the
   fold's border strips); ``models/s2d.py::_up_contrib_strip`` therefore
   pads symmetrically and selects the wanted line — identical values,
   partition-safe.
2. The BACKWARD pass is miscompiled when a deep level's spatial extent
   drops below the ``space`` axis size (measured on the 8-device CPU
   mesh, jax 0.9.0: full-model grads at 32² over space=4 — bottleneck
   H=1 — come out ~100% wrong on O(1) gradients while the forward and
   the loss stay exact; at bottleneck H ≥ n_space the worst grad delta
   falls to ≤3e-3, plain reassociation through the InstanceNorm
   backward's cancellations). ``spatial_train_step_jit`` therefore
   REFUSES degenerate configurations: image H/W must keep every level's
   extent ≥ the space-axis size (H / min_spatial_factor ≥ n_space). Real
   workloads sit far inside the envelope (512²/32 = 16 ≥ any practical
   n_space); the guard exists so the silent-wrong-gradients region is
   unreachable.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from unet_implementations_tpu.parallel.mesh import DATA_AXIS

SPACE_AXIS = "space"

__all__ = [
    "SPACE_AXIS",
    "create_mesh_dp_sp",
    "spatial_sharding",
    "shard_batch_spatial",
    "spatial_forward_jit",
    "spatial_train_step_jit",
]


def create_mesh_dp_sp(
    n_space: int, n_data: Optional[int] = None, devices=None
) -> Mesh:
    """A 2-D ``(data, space)`` mesh.

    ``n_space`` devices cooperate on each image's rows; ``n_data`` (default:
    all remaining) replicate that group over the batch. On real hardware
    pass a ``devices`` grid that keeps each space group ICI-contiguous —
    halo exchanges are nearest-neighbour traffic.
    """
    if devices is None:
        devices = jax.devices()
    if n_space < 1:
        raise ValueError(f"n_space must be >= 1, got {n_space}")
    if n_data is None:
        n_data = len(devices) // n_space
    if n_data < 1:
        raise ValueError(
            f"need at least n_space={n_space} devices for spatial "
            f"partitioning (have {len(devices)}; data={n_data})"
        )
    need = n_data * n_space
    assert need <= len(devices), (n_data, n_space, len(devices))
    grid = np.asarray(devices[:need]).reshape(n_data, n_space)
    return Mesh(grid, (DATA_AXIS, SPACE_AXIS))


def spatial_sharding(mesh: Mesh) -> NamedSharding:
    """Batch on ``data``, image rows (axis 1) on ``space``."""
    return NamedSharding(mesh, P(DATA_AXIS, SPACE_AXIS))


def shard_batch_spatial(batch: Any, mesh: Mesh) -> Any:
    """Device-put a host batch with (batch, H) sharded on (data, space).

    Leaves whose batch / row extent does not divide the respective mesh
    axis fall back to replication on that axis (correct, just redundant) —
    mirrors ``mesh.shard_batch``'s partial-batch contract. Leaves with
    fewer than 2 dims (e.g. scalars, per-image labels) replicate fully.
    """
    n_data, n_space = (mesh.shape[DATA_AXIS], mesh.shape[SPACE_AXIS])

    def put(x):
        ndim = getattr(x, "ndim", 0)
        batch_axis = DATA_AXIS if ndim >= 1 and x.shape[0] % n_data == 0 else None
        if ndim >= 2:
            row_axis = SPACE_AXIS if x.shape[1] % n_space == 0 else None
            spec = P(batch_axis, row_axis)
        elif ndim == 1:
            spec = P(batch_axis)
        else:
            spec = P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(put, batch)


def spatial_forward_jit(model, mesh: Mesh, **apply_kwargs):
    """Jit ``model``'s deterministic forward with spatially-sharded I/O.

    Returns ``fn(params, image) -> logits`` where ``image``/``logits`` are
    sharded ``P(data, space)`` and params are replicated. XLA inserts all
    halo exchanges and statistic reductions.
    """
    sh = spatial_sharding(mesh)
    rep = NamedSharding(mesh, P())

    def forward(params, image):
        return model.apply(
            {"params": params}, image, deterministic=True, **apply_kwargs
        )

    return jax.jit(
        forward, in_shardings=(rep, sh), out_shardings=sh
    )


def spatial_train_step_jit(
    mesh: Mesh,
    *,
    use_clip: bool = False,
    donate: bool = False,
    min_spatial_factor: int = 32,
    **loss_kwargs,
):
    """Jit the segmentation TRAIN step with spatially-sharded batch I/O.

    Returns ``step(state, batch, rng) -> (state, loss)`` where
    ``batch["image"]`` / ``batch["mask"]`` are sharded ``P(data, space)``
    (``clip_features``, if present, ``P(data)``) and the train state stays
    REPLICATED in and out — the partitioner therefore all-reduces the
    gradients over BOTH mesh axes (the ``space`` contributions of each
    image's row shards sum exactly like the ``data`` contributions of a
    batch shard; grad-parity vs the unsharded program is asserted in
    ``tests/test_spatial.py``). Backward-pass halo exchanges (the transpose
    of the forward's collective-permutes) and InstanceNorm statistic
    reductions are inserted by XLA from the same sharding annotations.

    This is the beyond-HBM TRAINING configuration: activation footprint per
    chip divides by ``n_space``, so images too large for one chip's HBM
    still fit a full loss+grads step.

    ``min_spatial_factor``: the model's total downsampling (2^5 for the
    6-stage UNet). The returned step REJECTS batches whose deepest level
    would be narrower than the ``space`` axis — XLA silently miscompiles
    the backward there (landmine 2 in the module docstring). The forward
    path (``spatial_forward_jit``) has no such restriction.

    ``loss_kwargs`` forward to
    ``training.steps.make_segmentation_train_step`` (class-weight policy).
    """
    from unet_implementations_tpu.training.steps import (
        make_segmentation_train_step,
    )

    raw = make_segmentation_train_step(
        use_clip=use_clip, donate=False, jit=False, **loss_kwargs
    )
    sh = spatial_sharding(mesh)
    rep = NamedSharding(mesh, P())
    batch_spec = {"image": sh, "mask": sh}
    if use_clip:
        batch_spec["clip_features"] = NamedSharding(mesh, P(DATA_AXIS))
    jitted = jax.jit(
        raw,
        in_shardings=(rep, batch_spec, rep),
        out_shardings=(rep, rep),
        donate_argnums=(0,) if donate else (),
    )
    n_space = mesh.shape[SPACE_AXIS]
    consumed = tuple(batch_spec)  # loader batches carry extra keys
                                  # (index, original_dims) the loss never
                                  # reads — drop them so the pinned
                                  # in_shardings pytree matches.

    def step(state, batch, rng):
        batch = {k: batch[k] for k in consumed}
        h = batch["image"].shape[1]  # only H (axis 1) shards on ``space``
        if h // min_spatial_factor < n_space:
            raise ValueError(
                f"spatial train step: H={h} images over space={n_space} "
                f"put the deepest level ({h // min_spatial_factor} rows) "
                f"below the shard count — XLA miscompiles the backward "
                f"there (parallel/spatial.py docstring). Use images with "
                f"H/{min_spatial_factor} >= {n_space}, or fewer space "
                f"shards."
            )
        return jitted(state, batch, rng)

    # Expose the underlying jit for AOT compile-only validation
    # (__graft_entry__.dryrun_multichip lowers the 512² SPMD program
    # without executing it); callers must pass exactly ``consumed`` keys.
    step.jitted = jitted
    return step
