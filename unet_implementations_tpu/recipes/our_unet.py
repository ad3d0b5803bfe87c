"""Our_UNet recipe: 6-stage UNet trained from scratch on Pet segmentation.

Mirrors the reference entry points (``Our_UNet/src/train.py:742-987``,
``Our_UNet/src/evaluate.py:271-340``): SGD(5e-3, wd 1e-4, momentum .99,
nesterov) + polynomial LR decay, combined Dice + weighted-CE loss with
dynamic/static/unweighted class-weight modes, early stopping (patience 15) on
mean foreground Dice, checkpoints every 10 epochs + best model, and the
original-resolution test evaluation writing ``evaluation_results.json``.

Deliberate divergences from reference bugs (SURVEY §7.3): the CLI batch size
is honored (the reference force-overrides it to 32 post-parse,
``train.py:748``); default remains 32.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from unet_implementations_tpu.data.loader import PetDataset, batch_iterator
from unet_implementations_tpu.models.unet import UNet, unet_6stage
from unet_implementations_tpu.parallel import create_mesh
from unet_implementations_tpu.ops.normalize import normalize_image
from unet_implementations_tpu.ops.tuning import inference_jit
from unet_implementations_tpu.recipes.common import (
    check_grad_accum,
    evaluate_segmentation,
)
from unet_implementations_tpu.training import (
    create_train_state,
    make_segmentation_eval_step,
    make_segmentation_train_step,
    poly_lr,
    sgd_nesterov,
)
from unet_implementations_tpu.training.checkpoint import (
    restore_checkpoint,
    restore_params,
    save_checkpoint,
)
from unet_implementations_tpu.training.loop import train_loop, write_training_config

ARCH_CONFIG = {
    "num_classes": 3,
    "n_stages": 6,
    "features_per_stage": [32, 64, 128, 256, 512, 512],
    "strides": [1, 2, 2, 2, 2, 2],
    "encoder_dropout_rates": [0.0, 0.0, 0.1, 0.2, 0.3, 0.3],
    "decoder_dropout_rates": [0.3, 0.2, 0.2, 0.1, 0.0],
}


def build_model(dtype=jnp.bfloat16) -> UNet:
    return unet_6stage(dtype=dtype)


def compute_static_weights(dataset: PetDataset, batch_size: int = 32) -> np.ndarray:
    """Dataset-wide inverse-frequency weights (``Our_UNet/src/train.py:817-858``).

    Multi-host: the per-process dataset stripe would give each host DIFFERENT
    weights (a different loss than logged) — compute over the FULL file list.
    """
    if dataset.process_count > 1:
        dataset = PetDataset(
            dataset.images_dir, dataset.masks_dir,
            include_augmented=dataset.aug_masks_dir is not None,
            target_size=dataset.target_size, mode=dataset.mode,
            normalize=dataset.normalize,
        )
    counts = np.zeros(3, np.float64)
    total = 0.0
    for batch in batch_iterator(dataset, batch_size, shuffle=False):
        mask = batch["mask"]
        valid = mask != 255
        for c in range(3):
            counts[c] += ((mask == c) & valid).sum()
        total += valid.sum()
    counts = np.maximum(counts, 1.0)
    weights = total / counts
    return (weights * (3 / weights.sum())).astype(np.float32)


def make_datasets(
    data_dir: str | Path,
    include_augmented: bool = True,
    normalize_train: bool = True,
    emit_uint8: bool = True,
):
    """Train/val datasets for the training loop. ``emit_uint8`` (default ON
    for training — the steps normalize in-graph, ``ops/normalize.py``) skips
    all host float math; the 1-core-host starvation fix. Dataset-level eval
    paths build their own loaders with the host-float contract."""
    data_dir = Path(data_dir)
    train = PetDataset(
        data_dir / "Train" / "resized",
        data_dir / "Train" / "resized_label",
        include_augmented=include_augmented,
        normalize=normalize_train,
        process_index=jax.process_index(),
        process_count=jax.process_count(),
        emit_uint8=emit_uint8,
    )
    val = PetDataset(
        data_dir / "Val" / "resized",
        data_dir / "Val" / "processed_labels",
        include_augmented=False,
        emit_uint8=emit_uint8,
    )
    return train, val


def train(
    data_dir: str | Path,
    output_dir: str | Path,
    *,
    batch_size: int = 32,
    epochs: int = 100,
    lr: float = 5e-3,
    weight_decay: float = 1e-4,
    momentum: float = 0.99,
    weighted_ce: bool = True,
    static_weights: bool = False,
    dice_weight: float = 1.0,
    ce_weight: float = 1.0,
    patience: int = 15,
    save_every: int = 10,
    resume: Optional[str] = None,
    seed: int = 0,
    dtype=jnp.bfloat16,
    use_mesh: bool = True,
    num_threads: int = 8,
    online_augment: bool = False,
    spatial: int = 0,
    grad_accum: int = 1,
    verbose: bool = True,
) -> Dict:
    """``online_augment=True`` applies the class-balanced augmentation policy
    on device per batch (the XLA-fused pipeline) instead of reading the
    offline 5x/2x expansion from disk.

    ``spatial > 1`` trains over a 2-D (data, space) mesh: image rows shard
    over ``spatial`` devices, the batch over the rest
    (``parallel/spatial.py::spatial_train_step_jit``) — per-chip activation
    footprint divides by ``spatial``, so images beyond one chip's HBM still
    train. Requires image H/32 >= spatial (the step enforces it).

    ``grad_accum > 1`` splits each batch into that many sequential
    microbatches inside one jit (``training.steps.make_accum_train_step``) —
    the route past the b32 single-chip HBM train ceiling
    (docs/PERFORMANCE.md): effective batch = batch_size with the live
    activation footprint of batch_size/grad_accum."""
    check_grad_accum(batch_size, grad_accum, use_mesh=use_mesh)
    output_dir = Path(output_dir)
    write_training_config(output_dir, dict(
        data_dir=str(data_dir), output_dir=str(output_dir), batch_size=batch_size,
        epochs=epochs, lr=lr, weight_decay=weight_decay, momentum=momentum,
        weighted_ce=weighted_ce, static_weights=static_weights,
        dice_weight=dice_weight, ce_weight=ce_weight, patience=patience,
        save_every=save_every, seed=seed, dtype=str(dtype),
        online_augment=online_augment, spatial=spatial,
        grad_accum=grad_accum,
    ))

    train_ds, val_ds = make_datasets(
        data_dir,
        include_augmented=not online_augment,
        normalize_train=not online_augment,
    )
    if verbose:
        print(f"Training dataset size: {len(train_ds)}")
        print(f"Validation dataset size: {len(val_ds)}")

    if spatial and spatial > 1:
        if not use_mesh:
            raise ValueError(
                "--spatial requires the device mesh; drop --no_mesh or "
                "--spatial (they contradict)."
            )
        if grad_accum > 1:
            raise ValueError(
                "--grad_accum with --spatial is not supported: spatial "
                "partitioning already divides the activation footprint; "
                "use one or the other."
            )
        from unet_implementations_tpu.parallel import create_mesh_dp_sp

        mesh = create_mesh_dp_sp(spatial)
    else:
        mesh = create_mesh() if use_mesh and jax.device_count() > 1 else None

    model = build_model(dtype)
    tx = sgd_nesterov(lr, weight_decay, momentum)
    sample = next(batch_iterator(train_ds, min(2, batch_size)))
    state = create_train_state(
        model, jax.random.key(seed),
        normalize_image(jnp.asarray(sample["image"])), tx,
    )

    sw = None
    if weighted_ce and static_weights:
        sw = jnp.asarray(compute_static_weights(train_ds, batch_size))
        if verbose:
            print(f"Computed class weights: {np.asarray(sw)}")

    loss_kw = dict(
        weight_ce=ce_weight,
        weight_dice=dice_weight,
        dynamic_weights=weighted_ce and not static_weights,
        static_weights=sw if weighted_ce else None,
    )
    if spatial and spatial > 1:
        from unet_implementations_tpu.parallel import spatial_train_step_jit

        train_step = spatial_train_step_jit(mesh, donate=True, **loss_kw)
    elif grad_accum > 1:
        from unet_implementations_tpu.training.steps import (
            make_accum_train_step,
            make_segmentation_loss_fn,
        )

        train_step = make_accum_train_step(
            make_segmentation_loss_fn(**loss_kw), grad_accum
        )
    else:
        train_step = make_segmentation_train_step(**loss_kw)
    eval_step = make_segmentation_eval_step(**loss_kw)

    start_epoch, best, es_state = 0, None, None
    if resume:
        state, meta = restore_checkpoint(resume, state)
        start_epoch = meta.get("epoch", 0)
        best = meta.get("best_metric")
        es_state = meta.get("early_stopping")
        if verbose:
            print(f"Resumed from epoch {start_epoch}")

    def train_batches(epoch):
        it = batch_iterator(
            train_ds, batch_size, shuffle=True, seed=seed * 1000 + epoch,
            drop_last=True, num_threads=num_threads,
        )
        if not online_augment:
            return it
        from unet_implementations_tpu.recipes.common import wrap_online_augment

        return wrap_online_augment(it, epoch, seed)

    def val_batches():
        return batch_iterator(val_ds, batch_size, num_threads=num_threads)

    result = train_loop(
        state,
        train_step=train_step,
        eval_step=eval_step,
        train_batches=train_batches,
        val_batches=val_batches,
        lr_schedule=poly_lr(lr, epochs),
        epochs=epochs,
        output_dir=output_dir,
        task="segmentation",
        mesh=mesh,
        rng=jax.random.key(seed + 1),
        save_every=save_every,
        patience=patience,
        start_epoch=start_epoch,
        best_metric=best,
        early_stopping_state=es_state,
        arch_config=ARCH_CONFIG,
        verbose=verbose,
    )
    return result


def evaluate(
    model_path: str | Path,
    data_dir: str | Path,
    output_dir: str | Path,
    *,
    batch_size: int = 32,
    dtype=jnp.bfloat16,
    visualize_samples: int = 0,
    num_threads: int = 8,
    verbose: bool = True,
) -> Dict:
    model = build_model(dtype)
    abstract = model.init(jax.random.key(0), jnp.zeros((1, 64, 64, 3)))["params"]
    params = restore_params(model_path, abstract)

    test_ds = PetDataset(
        Path(data_dir) / "Test" / "resized",
        Path(data_dir) / "Test" / "processed_labels",
        include_augmented=False,
    )
    if verbose:
        print(f"Test dataset size: {len(test_ds)} images")

    @inference_jit
    def forward(params, images):
        logits = model.apply({"params": params}, images, deterministic=True)
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)

    @inference_jit
    def probs(params, images):
        logits = model.apply({"params": params}, images, deterministic=True)
        return jax.nn.softmax(logits, axis=-1)

    def predict_fn(batch):
        return forward(params, jnp.asarray(batch["image"], dtype))

    return evaluate_segmentation(
        predict_fn, test_ds, batch_size, output_dir,
        visualize_samples=visualize_samples,
        probs_fn=lambda b: probs(params, jnp.asarray(b["image"], dtype)),
        num_threads=num_threads, verbose=verbose,
    )
