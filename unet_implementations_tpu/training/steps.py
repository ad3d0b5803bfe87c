"""Jitted train/eval steps (single-device and data-parallel via shardings).

The reference hot loops (``Our_UNet/src/train.py:592-680`` train,
``:510-589`` validate) become fully fused XLA programs: forward + loss +
backward + optimizer update in one jit, with the loss's dynamic class weights
computed in-graph (no per-step module rebuilding). Validation fuses forward +
loss + the per-class batch Dice protocol. Data parallelism comes from the
caller sharding the batch leaves on the mesh's ``data`` axis — XLA inserts
the gradient all-reduce; there are no explicit collectives here.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp

from unet_implementations_tpu.ops.losses import (
    mse_loss,
    psnr,
    segmentation_loss,
)
from unet_implementations_tpu.ops.metrics import batch_dice_scores, confusion_matrix
from unet_implementations_tpu.ops.normalize import normalize_image
from unet_implementations_tpu.training.train_state import TrainState


def make_segmentation_loss_fn(
    *,
    weight_ce: float = 1.0,
    weight_dice: float = 1.0,
    dynamic_weights: bool = True,
    static_weights: Optional[jax.Array] = None,
    use_clip: bool = False,
) -> Callable:
    """``loss_fn(state, params, batch, rng) -> loss`` for the segmentation
    objective — shared by the plain train step and the gradient-accumulation
    wrapper so the two can never diverge."""

    def loss_fn(state, params, batch, rng):
        logits = state.apply_fn(
            {"params": params},
            normalize_image(batch["image"]),  # no-op unless the loader
            batch.get("clip_features") if use_clip else None,  # emits uint8
            deterministic=False,
            rngs={"dropout": rng},
        )
        return segmentation_loss(
            logits,
            batch["mask"],
            weight_ce=weight_ce,
            weight_dice=weight_dice,
            class_weights=static_weights,
            dynamic_weights=dynamic_weights and static_weights is None,
        )

    return loss_fn


def make_segmentation_train_step(
    *,
    weight_ce: float = 1.0,
    weight_dice: float = 1.0,
    dynamic_weights: bool = True,
    static_weights: Optional[jax.Array] = None,
    use_clip: bool = False,
    donate: bool = True,
    jit: bool = True,
) -> Callable:
    """Returns jitted ``(state, batch, rng) -> (state, loss)``.

    ``batch``: dict with ``image`` (B,H,W,3) and ``mask`` (B,H,W) int32; with
    ``use_clip`` also ``clip_features`` (B,512). ``rng`` drives dropout and is
    folded with the step counter by the caller.

    ``jit=False`` returns the raw step for callers that jit with explicit
    shardings (``parallel/spatial.py::spatial_train_step_jit``).
    """
    loss_fn = make_segmentation_loss_fn(
        weight_ce=weight_ce,
        weight_dice=weight_dice,
        dynamic_weights=dynamic_weights,
        static_weights=static_weights,
        use_clip=use_clip,
    )

    def train_step(state: TrainState, batch: Dict, rng: jax.Array):
        rng = jax.random.fold_in(rng, state.step)
        loss, grads = jax.value_and_grad(
            lambda p: loss_fn(state, p, batch, rng)
        )(state.params)
        return state.apply_gradients(grads), loss

    if not jit:
        return train_step
    return jax.jit(train_step, donate_argnums=(0,) if donate else ())


def make_accum_train_step(
    loss_fn: Callable,
    accum: int,
    *,
    donate: bool = True,
    jit: bool = True,
) -> Callable:
    """Gradient accumulation: one optimizer update from ``accum`` sequential
    microbatch passes inside a single jit (``lax.scan``).

    ``loss_fn(state, params, microbatch, rng) -> loss`` — the same callable
    the plain step factories use (``make_segmentation_loss_fn``,
    ``recipes.ae_recon.make_loss_fn``). The effective batch B must divide by
    ``accum``; each microbatch is B/accum. Gradients accumulate in f32 and
    are averaged before ``apply_gradients``; the reported loss is the mean of
    the microbatch losses.

    Semantics — identical to what a torch user gets from the standard
    ``loss.backward()``-per-microbatch accumulation loop, and therefore NOT
    bitwise the full-batch step where the objective couples across the batch
    (dynamic class weights, weighted-CE normalization, and the batch-mean
    dice are computed per MICRObatch; dropout draws a fresh mask per
    microbatch). The exact contract — accum step == sequential average of
    per-microbatch losses/grads of the plain step — is asserted in
    ``tests/test_accum.py``.

    Why it exists on TPU: the train step is HBM-capacity-bound (b32 ceiling
    at 512², docs/PERFORMANCE.md) — ``lax.scan`` keeps only ONE microbatch's
    activations live, so effective batches of b32*accum fit one chip with
    the optimizer/update math of the large batch.

    Composes with data parallelism: microbatch i is the STRIDED row subset
    ``batch[i::accum]`` — under a block-sharded ``data`` axis every
    microbatch then draws micro/n_devices rows from each device's block, so
    each scan iteration is itself a data-parallel microstep with XLA's usual
    gradient all-reduce. (A contiguous ``(accum, micro, ...)`` reshape would
    instead land whole microbatches on single devices.) Requires
    batch_size/accum to divide the device count for an even layout;
    asserted sharded==unsharded in ``tests/test_accum.py``.
    """
    if accum < 1:
        raise ValueError(f"accum must be >= 1, got {accum}")

    def train_step(state: TrainState, batch: Dict, rng: jax.Array):
        rng = jax.random.fold_in(rng, state.step)
        b = batch["image"].shape[0]
        if b % accum != 0:
            raise ValueError(
                f"gradient accumulation: batch size {b} does not divide "
                f"into accum={accum} equal microbatches"
            )
        micro = b // accum
        mb = jax.tree.map(
            lambda x: x.reshape(micro, accum, *x.shape[1:]).swapaxes(0, 1),
            batch,
        )

        def body(carry, microbatch):
            gacc, lacc, i = carry
            mrng = jax.random.fold_in(rng, i)
            loss, grads = jax.value_and_grad(
                lambda p: loss_fn(state, p, microbatch, mrng)
            )(state.params)
            gacc = jax.tree.map(
                lambda a, g: a + g.astype(jnp.float32), gacc, grads
            )
            return (gacc, lacc + loss, i + 1), None

        zeros = jax.tree.map(
            lambda p: jnp.zeros(p.shape, jnp.float32), state.params
        )
        (gacc, lsum, _), _ = jax.lax.scan(
            body, (zeros, jnp.float32(0.0), jnp.int32(0)), mb
        )
        grads = jax.tree.map(
            lambda g, p: (g / accum).astype(p.dtype), gacc, state.params
        )
        return state.apply_gradients(grads), lsum / accum

    if not jit:
        return train_step
    return jax.jit(train_step, donate_argnums=(0,) if donate else ())


def make_segmentation_eval_step(
    *,
    weight_ce: float = 1.0,
    weight_dice: float = 1.0,
    dynamic_weights: bool = True,
    static_weights: Optional[jax.Array] = None,
    use_clip: bool = False,
) -> Callable:
    """Returns jitted ``(state, batch) -> dict`` with loss, per-class batch
    dice (the validate() protocol), argmax predictions and a confusion matrix
    (the dataset-level eval protocol accumulates the latter host-side)."""

    def eval_step(state: TrainState, batch: Dict):
        logits = state.apply_fn(
            {"params": state.params},
            normalize_image(batch["image"]),
            batch.get("clip_features") if use_clip else None,
            deterministic=True,
        )
        loss = segmentation_loss(
            logits,
            batch["mask"],
            weight_ce=weight_ce,
            weight_dice=weight_dice,
            class_weights=static_weights,
            dynamic_weights=dynamic_weights and static_weights is None,
        )
        preds = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        return {
            "loss": loss,
            "dice": batch_dice_scores(preds, batch["mask"]),
            "preds": preds,
            "confusion": confusion_matrix(preds, batch["mask"]),
        }

    return jax.jit(eval_step)


def make_reconstruction_train_step(donate: bool = True) -> Callable:
    """AE train step: plain MSE, matching the reference's trained objective
    (``reconstruction/src/train.py:420-437`` returns nn.MSELoss despite the
    weight flags — documented quirk)."""

    def train_step(state: TrainState, batch: Dict, rng: jax.Array):
        rng = jax.random.fold_in(rng, state.step)

        def loss_fn(params):
            recon = state.apply_fn(
                {"params": params},
                normalize_image(batch["image"], mode="unit"),
                deterministic=False,
                rngs={"dropout": rng},
            )
            return mse_loss(recon, normalize_image(batch["target"], mode="unit"))

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        return state.apply_gradients(grads), loss

    return jax.jit(train_step, donate_argnums=(0,) if donate else ())


def make_reconstruction_eval_step() -> Callable:
    def eval_step(state: TrainState, batch: Dict):
        image = normalize_image(batch["image"], mode="unit")
        target = normalize_image(batch["target"], mode="unit")
        recon = state.apply_fn(
            {"params": state.params}, image, deterministic=True
        )
        diff = recon.astype(jnp.float32) - target.astype(jnp.float32)
        per_image_mse = jnp.mean(diff * diff, axis=(1, 2, 3))
        return {
            "loss": mse_loss(recon, target),
            "mse": per_image_mse,
            "psnr": psnr(recon, target),
            "recon": recon,
        }

    return jax.jit(eval_step)
