"""AE_pretrained phase 2: segmentation with a frozen AE-pretrained encoder.

Mirrors ``AE_pretrained/transfer_learning/src/train.py`` +
``models/unet.py:409-453``: the 6-stage segmentation UNet whose encoder
params are grafted from a phase-1 AE checkpoint (a PyTree sub-tree copy —
the topology is identical) and frozen (the reference sets
``requires_grad=False``; here ``optax.multi_transform`` maps the encoder
sub-trees to ``set_to_zero``). Everything else is the Our_UNet recipe:
SGD+nesterov, poly LR, Dice+weighted-CE, early stop on mean foreground Dice.
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from unet_implementations_tpu.data.loader import batch_iterator
from unet_implementations_tpu.models.unet import encoder_param_names
from unet_implementations_tpu.ops.normalize import normalize_image
from unet_implementations_tpu.parallel import create_mesh
from unet_implementations_tpu.recipes import our_unet
from unet_implementations_tpu.recipes.common import check_grad_accum
from unet_implementations_tpu.recipes.our_unet import (
    ARCH_CONFIG as _SEG_ARCH,
    build_model,
    compute_static_weights,
    make_datasets,
)
from unet_implementations_tpu.training import (
    make_segmentation_eval_step,
    make_segmentation_train_step,
    poly_lr,
    sgd_nesterov,
)
from unet_implementations_tpu.training.checkpoint import (
    extract_encoder_params,
    restore_checkpoint,
)
from unet_implementations_tpu.training.loop import train_loop, write_training_config
from unet_implementations_tpu.training.train_state import (
    TrainState,
    with_frozen,
)

ARCH_CONFIG = dict(_SEG_ARCH, pretrained_encoder=True, frozen_encoder=True)

# Evaluation is identical to the plain recipe (same architecture).
evaluate = our_unet.evaluate


def train(
    data_dir: str | Path,
    output_dir: str | Path,
    *,
    pretrained_encoder: str | Path,
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
    grad_accum: int = 1,
    verbose: bool = True,
) -> Dict:
    check_grad_accum(batch_size, grad_accum, use_mesh=use_mesh)
    output_dir = Path(output_dir)
    write_training_config(output_dir, dict(
        data_dir=str(data_dir), output_dir=str(output_dir),
        pretrained_encoder=str(pretrained_encoder), batch_size=batch_size,
        epochs=epochs, lr=lr, weight_decay=weight_decay, momentum=momentum,
        weighted_ce=weighted_ce, static_weights=static_weights,
        dice_weight=dice_weight, ce_weight=ce_weight, patience=patience,
        save_every=save_every, seed=seed, dtype=str(dtype),
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
    mesh = create_mesh() if use_mesh and jax.device_count() > 1 else None

    model = build_model(dtype)
    sample = next(batch_iterator(train_ds, min(2, batch_size)))
    params = model.init(
        jax.random.key(seed),
        normalize_image(jnp.asarray(sample["image"])),
    )["params"]
    params = dict(params)

    # Graft + freeze the AE encoder (phase-2 contract, SURVEY §3.3).
    params = extract_encoder_params(pretrained_encoder, params, n_stages=6)
    if verbose:
        print(f"Loaded pretrained encoder from {pretrained_encoder}; frozen.")
    frozen = list(encoder_param_names(6))
    tx = with_frozen(sgd_nesterov(lr, weight_decay, momentum), params, frozen)
    state = TrainState(
        step=jnp.zeros((), jnp.int32), params=params,
        opt_state=tx.init(params), tx=tx, apply_fn=model.apply,
    )

    sw = None
    if weighted_ce and static_weights:
        sw = jnp.asarray(compute_static_weights(train_ds, batch_size))
    loss_kw = dict(
        weight_ce=ce_weight, weight_dice=dice_weight,
        dynamic_weights=weighted_ce and not static_weights,
        static_weights=sw if weighted_ce else None,
    )
    if grad_accum > 1:
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

    def train_batches(epoch):
        it = batch_iterator(
            train_ds, batch_size, shuffle=True, seed=seed * 1000 + epoch,
            drop_last=True, num_threads=num_threads)
        if not online_augment:
            return it
        from unet_implementations_tpu.recipes.common import wrap_online_augment

        return wrap_online_augment(it, epoch, seed)

    return train_loop(
        state,
        train_step=train_step,
        eval_step=eval_step,
        train_batches=train_batches,
        val_batches=lambda: batch_iterator(val_ds, batch_size, num_threads=num_threads),
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
